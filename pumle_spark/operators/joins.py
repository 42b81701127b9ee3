"""Join operators Spark lacks as single primitives (SURVEY §2.4).

- asof_join: "most recent right row at or before the left timestamp" per
  key. Implemented with the union + last_value(ignorenulls) window trick:
  one shuffle on (keys, ts), NO range-explosion. This is the scalable form
  — a naive t1 ≤ t2 theta join is quadratic per key; this is n log n.
- range_join: equi-keys + interval predicate with an explicit broadcast
  decision for a small build side (the J4 wells×layers shape).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window
from pyspark.sql.functions import broadcast


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str] | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    right_ts <= left_ts (direction='backward'; 'forward' = least >=).

    Union both sides tagged, sort within key by (ts, side-priority), and
    carry the right values forward with last(ignorenulls) — each left row
    then holds the nearest preceding right values. One shuffle; skew on hot
    keys is AQE's problem, not a cross product.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    value_cols = value_cols or [
        c for c in right.columns if c not in on and c != right_ts
    ]

    lcols = [c for c in left.columns]
    l_tagged = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in lcols if c not in on and c != left_ts],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in value_cols],
    )
    r_tagged = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in on and c != left_ts],
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    )
    unioned = l_tagged.unionByName(r_tagged)

    if direction == "backward":
        # right rows sort before left rows at equal ts → "at or before"
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col("_ts").asc(), F.col("_is_left").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col("_ts").desc(), F.col("_is_left").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )

    filled = unioned.select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_filled_{c}")
            for c in value_cols
        ],
    )
    out = filled.filter(F.col("_is_left") == 1).select(
        *on,
        F.col("_ts").alias(left_ts),
        *[F.col(c) for c in lcols if c not in on and c != left_ts],
        *[F.col(f"_filled_{c}").alias(c) for c in value_cols],
    )
    return out


def range_join(
    big: DataFrame,
    small: DataFrame,
    equi: list[tuple[str, str]],
    between: tuple[str, str, str],
    broadcast_small: bool = True,
) -> DataFrame:
    """J4 equi+range join: big ⋈ small ON big.a=small.b AND
    big.x BETWEEN small.lo AND small.hi.

    With a dim-sized `small`, broadcasting keeps the big side shuffle-free:
    the equi keys drive the hash probe and the range predicate filters
    matches in place (co2lab3DPUMLE.m:406-423 well-layer mapping).
    """
    cond = None
    for bcol, scol in equi:
        c = big[bcol] == small[scol]
        cond = c if cond is None else (cond & c)
    x, lo, hi = between
    cond = cond & big[x].between(small[lo], small[hi])
    rhs = broadcast(small) if broadcast_small else small
    return big.join(rhs, cond)
