"""Drift + snapshot-diff invariants beyond the cross-engine hash check:
statistic bounds, partition invariance of the decimal-summed statistics,
and the CDC classification algebra."""

from __future__ import annotations

import pyspark.sql.functions as F

from pumle_spark.workload.drift import (
    drift_source_lang_profile,
    snapshot_diff_customer_state,
)

SF = "/root/testdata/sf0.001"


def test_drift_statistic_bounds(spark):
    rows = drift_source_lang_profile(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.chi2 >= 0.0, r.source
        assert 0.0 <= r.tvd <= 1.0, r.source


def test_drift_is_partition_invariant(spark):
    """The decimal-term-sum trick: chi2/tvd must not move by an ulp when
    the input partitioning changes (a plain double SUM would)."""
    from pumle_spark.tables import table

    base = drift_source_lang_profile(spark, SF).collect()

    docs = table(spark, SF, "documents").repartition(17)
    docs.createOrReplaceTempView("___drift_repart")
    # rebuild the same plan on the repartitioned input
    import pumle_spark.workload.drift as d

    orig_table = d.table
    try:
        d.table = lambda s, sf, name: docs if name == "documents" else orig_table(s, sf, name)
        repart = drift_source_lang_profile(spark, SF).collect()
    finally:
        d.table = orig_table
    assert sorted((r.source, r.chi2, r.tvd) for r in base) == sorted(
        (r.source, r.chi2, r.tvd) for r in repart
    )


def test_snapshot_diff_classification_algebra(spark):
    rows = snapshot_diff_customer_state(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.change_type != "REMOVED"  # snapshots are append-only here
        assert r.n_orders_t1 <= r.n_orders_t2
        if r.change_type == "ADDED":
            assert r.n_orders_t1 == 0
        if r.change_type == "UNCHANGED":
            assert (r.n_orders_t1, r.spend_t1) == (r.n_orders_t2, r.spend_t2)
        if r.change_type == "CHANGED":
            assert (r.n_orders_t1, r.spend_t1) != (r.n_orders_t2, r.spend_t2)


def test_snapshot_diff_covers_every_customer_with_orders(spark):
    from pumle_spark.tables import table

    out = snapshot_diff_customer_state(spark, SF)
    n_customers = (
        table(spark, SF, "orders").select("o_custkey").distinct().count()
    )
    assert out.count() == n_customers
    assert out.select("c_custkey").distinct().count() == n_customers
