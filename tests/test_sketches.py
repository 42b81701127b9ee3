"""Sketch-operator invariants. Cross-engine equality of the estimates is the
oracle gate's job; these pin the mathematical contracts the hash compare
can't see: the HLL error bound, CMS one-sided error, and the bloom filter's
no-false-negative guarantee."""

from __future__ import annotations

import pyspark.sql.functions as F

from pumle_spark.workload.sketches import (
    _HLL_M,
    sketch_bloom_membership,
    sketch_cms_frequency,
    sketch_hll_distinct,
)

SF = "/root/testdata/sf0.001"


def test_hll_estimate_within_sketch_error(spark):
    """HLL with m=256 has relative standard error 1.04/sqrt(m) ~ 6.5%;
    assert the measured error stays within 4 sigma of it for every group
    (the small-range linear-counting correction keeps this true even when
    n << m, as at this SF)."""
    rows = sketch_hll_distinct(spark, SF).collect()
    assert rows, "no status groups"
    bound_pct = 4 * 104.0 / (_HLL_M**0.5)
    for r in rows:
        assert abs(r.rel_err_pct) <= bound_pct, (r.status, r.rel_err_pct)
        assert r.hll_estimate > 0


def test_cms_never_undercounts(spark):
    rows = sketch_cms_frequency(spark, SF).collect()
    assert len(rows) == 20
    for r in rows:
        assert r.overcount >= 0, (r.l_partkey, r.overcount)
        assert r.cms_cnt == r.exact_cnt + r.overcount


def test_bloom_has_no_false_negatives(spark):
    """Every true member must probe positive: per segment,
    n_bloom_positive >= n_true_members and false positives are only
    counted among non-members."""
    rows = sketch_bloom_membership(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_bloom_positive >= r.n_true_members, r.c_mktsegment
        assert r.n_false_positive == r.n_bloom_positive - r.n_true_members
        assert r.n_false_positive <= r.n_customers - r.n_true_members


def test_bloom_sketch_is_broadcast_sized(spark):
    """The filter itself must stay tiny: at most 4096/32 = 128 words, so
    the probe-side join is broadcastable at any corpus size."""
    from pumle_spark.workload.sketches import _BLOOM_BITS, _BLOOM_WORD

    plan = sketch_bloom_membership(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert _BLOOM_BITS // _BLOOM_WORD == 128


def test_hll_registers_merge_associatively(spark):
    """Repartitioning the input must not change a single register value
    (max is associative+commutative) — the property that lets partial
    sketches combine map-side on a 1000-executor build."""
    from pumle_spark.tables import table

    o = table(spark, SF, "orders")
    key_md5 = F.md5(F.col("o_custkey").cast("string"))
    w32 = F.conv(F.substring(key_md5, 3, 8), 16, 10).cast("bigint")
    hashed = o.select(
        F.conv(F.substring(key_md5, 1, 2), 16, 10).cast("bigint").alias("bucket"),
        w32.alias("w32"),
    )
    rho = F.when(F.col("w32") == 0, F.lit(33)).otherwise(
        F.lit(33) - F.length(F.conv(F.col("w32").cast("string"), 10, 2))
    )
    a = hashed.groupBy("bucket").agg(F.max(rho).alias("m")).collect()
    b = hashed.repartition(13).groupBy("bucket").agg(F.max(rho).alias("m")).collect()
    assert sorted((r.bucket, r.m) for r in a) == sorted((r.bucket, r.m) for r in b)


def test_hll_union_equals_merged_registers(spark):
    """sketch(A UNION B) computed from the raw keys must equal the
    elementwise-max merge of sketch(A) and sketch(B) — the algebra the
    setops query relies on to avoid re-scanning inputs."""
    import pyspark.sql.functions as F

    from pumle_spark.tables import table
    from pumle_spark.workload.sketches import _hll_estimates, _hll_registers

    o = table(spark, SF, "orders")
    halves = o.select(
        F.when(F.col("o_orderkey") % 2 == 0, "even").otherwise("odd").alias("tag"),
        F.col("o_custkey"),
    )
    merged = (
        _hll_registers(halves)
        .groupBy("bucket")
        .agg(F.max("m_reg").alias("m_reg"))
        .select(F.lit("u").alias("tag"), "bucket", "m_reg")
    )
    direct = _hll_registers(o.select(F.lit("u").alias("tag"), F.col("o_custkey")))
    est_merged = _hll_estimates(spark, merged).collect()[0]
    est_direct = _hll_estimates(spark, direct).collect()[0]
    assert est_merged.chosen_est == est_direct.chosen_est  # bit-identical, not approx


def test_hll_setops_shape_and_bounds(spark):
    from pumle_spark.workload.sketches import sketch_hll_setops

    rows = {r.set_name: r for r in sketch_hll_setops(spark, SF).collect()}
    assert set(rows) == {"1995", "1996", "union", "intersection"}
    # union can't exceed the sum of the parts, and inclusion-exclusion must
    # reproduce the intersection row exactly
    assert rows["union"].hll_n <= rows["1995"].hll_n + rows["1996"].hll_n
    recomputed = rows["1995"].hll_n + rows["1996"].hll_n - rows["union"].hll_n
    assert abs(recomputed - rows["intersection"].hll_n) < 1e-2  # rounding at 3dp
