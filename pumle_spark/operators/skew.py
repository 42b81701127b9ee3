"""Skew mitigation for large⋈large joins (100 TB posture).

AQE's skew-join splitting (on in session.py) handles most skew at runtime
by splitting oversized shuffle partitions. ``salted_join`` is the explicit
fallback for the pathological case AQE can't fix: ONE join key so hot that
a single key's rows exceed an executor (e.g. a null-like sentinel key or a
mega-customer). Mechanism:

  left:  key → (key, salt = pmod(hash(row-random-free cols), S))
  right: key → replicated S× with salt = 0..S-1
  join on (key, salt) → each hot key fans out over S reducers.

Replication multiplies the right side by S, so use it asymmetrically:
salt ONLY the skewed keys (`hot_keys`), pass the rest through a normal
join, union the results — the standard split-union plan.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    hot_keys: list,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join with per-hot-key salting; cold keys join normally.

    Result equals ``left.join(right, on, how)`` (verified in tests); only
    the physical distribution differs. `how` supports inner/left.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner'|'left'")

    hot = F.col(on).isin(hot_keys)
    l_hot, l_cold = left.filter(hot), left.filter(~hot | F.col(on).isNull())
    r_hot, r_cold = right.filter(hot), right.filter(~hot | F.col(on).isNull())

    # left side: random-free deterministic salt from the row content hash
    salt_cols = [c for c in left.columns if c != on]
    l_salted = l_hot.withColumn("_salt", F.pmod(F.hash(*salt_cols), F.lit(n_salts)))
    # right side: replicate each hot row across all salts
    r_salted = r_hot.withColumn(
        "_salt", F.explode(F.array(*[F.lit(s) for s in range(n_salts)]))
    )
    hot_joined = l_salted.join(r_salted, [on, "_salt"], how).drop("_salt")
    cold_joined = l_cold.join(r_cold, on, how)
    return hot_joined.unionByName(cold_joined)
