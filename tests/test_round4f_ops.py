"""Round-4 wave-3 operator tests (batch 4): point-in-time SCD2 join,
rolling 7-day distinct active users."""

from __future__ import annotations

from datetime import timedelta

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


def _mk_events(tmp_path, rows):
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "ts": pd.to_datetime([r[1] for r in rows]),
            "user_id": [r[2] for r in rows],
            "event_type": [r[3] for r in rows],
            "value": [r[4] for r in rows],
            "props": ["{}"] * len(rows),
        }
    )
    d = tmp_path / "fix"
    d.mkdir()
    pdf.to_parquet(d / "events.parquet")
    return str(d)


# --------------------------------------------------------------------------
# join_point_in_time_state
# --------------------------------------------------------------------------


def test_pit_no_leakage_on_planted_timeline(spark, tmp_path):
    """view @t1 → purchase @t2 → click @t3: the purchase must join to
    'view' (the state valid AT t2), never to 'click' (a later version —
    that would be feature leakage). A purchase before any activity lands
    in 'none'."""
    d = _mk_events(
        tmp_path,
        [
            (1, "2024-01-01 10:00:00", 7, "view", 0.0),
            (2, "2024-01-01 11:00:00", 7, "purchase", 5.0),
            (3, "2024-01-01 12:00:00", 7, "click", 0.0),
            (4, "2024-01-02 09:00:00", 9, "purchase", 3.0),  # no prior activity
        ],
    )
    from pumle_spark.workload.events import join_point_in_time_state

    got = {r.state: (r.n_purchases, r.total_value_micro) for r in join_point_in_time_state(spark, d).collect()}
    assert got == {"view": (1, 5_000_000), "none": (1, 3_000_000)}


def test_pit_asof_matches_interval_join(spark):
    """The as-of composition must equal a brute-force interval theta join
    over the same derived dimension, on real data."""
    from pumle_spark.tables import table
    from pumle_spark.workload.events import join_point_in_time_state
    from pyspark.sql import Window

    e = table(spark, SF, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("tus"),
        F.round(F.col("value") * 1_000_000).cast("bigint").alias("vmic"),
    )
    d = e.filter(F.col("event_type") != "purchase")
    w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    runs = d.withColumn(
        "chg",
        F.when(
            F.lag("event_type").over(w).isNull()
            | (F.lag("event_type").over(w) != F.col("event_type")),
            1,
        ).otherwise(0),
    ).withColumn(
        "version",
        F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    per = runs.groupBy("user_id", "version").agg(
        F.min("event_type").alias("state"), F.min("tus").alias("valid_from_us")
    )
    iv = per.withColumn(
        "valid_to_us",
        F.lead("valid_from_us").over(Window.partitionBy("user_id").orderBy("version")),
    )
    p = e.filter(F.col("event_type") == "purchase")
    j = p.join(
        iv,
        (p.user_id == iv.user_id)
        & (iv.valid_from_us <= p.tus)
        & (iv.valid_to_us.isNull() | (p.tus < iv.valid_to_us)),
        "left",
    )
    want = {
        (r.state, r.n, r.v)
        for r in j.groupBy(F.coalesce(iv.state, F.lit("none")).alias("state"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("vmic").alias("v"))
        .collect()
    }
    got = {
        (r.state, r.n_purchases, r.total_value_micro)
        for r in join_point_in_time_state(spark, SF).collect()
    }
    assert got == want
    assert got


# --------------------------------------------------------------------------
# events_rolling_active_users
# --------------------------------------------------------------------------


def test_rolling_wau_matches_python_replica(spark):
    from pumle_spark.tables import table
    from pumle_spark.workload.events import events_rolling_active_users

    pairs = {
        (r.day, r.user_id)
        for r in table(spark, SF, "events")
        .select(F.col("ts").cast("date").alias("day"), "user_id")
        .distinct()
        .collect()
    }
    days = sorted({d for d, _ in pairs})
    want = {}
    for day in days:
        dau = len({u for d, u in pairs if d == day})
        wau = len({u for d, u in pairs if day - timedelta(days=6) <= d <= day})
        want[day.strftime("%Y-%m-%d")] = (dau, wau, round(dau / wau, 6))

    got = {
        r.day: (r.dau, r.wau7, r.stickiness)
        for r in events_rolling_active_users(spark, SF).collect()
    }
    assert got == want
    assert all(d <= w for d, w, _ in got.values())  # DAU ≤ WAU always
