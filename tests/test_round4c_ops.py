"""Round-4 wave-3 operator tests: skyline, null-aware NOT IN, correlated
scalar subqueries, bloom semi-join reduction."""

from __future__ import annotations

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


# --------------------------------------------------------------------------
# skyline_parts_2d
# --------------------------------------------------------------------------


def test_skyline_matches_bruteforce_dominance(spark):
    """The sort-sweep skyline must equal the quadratic dominance check run
    driver-side over the full collected relation."""
    from pumle_spark.workload.relational3 import skyline_parts_2d

    got = {
        (r.p_partkey, r.price_cents, r.p_size)
        for r in skyline_parts_2d(spark, SF).collect()
    }

    pts = [
        (r.p_partkey, int(round(r.p_retailprice * 100)), r.p_size)
        for r in spark.read.parquet(f"{SF}/part.parquet").collect()
    ]
    want = set()
    for k, pc, sz in pts:
        dominated = any(
            (qc <= pc and qs >= sz and (qc < pc or qs > sz)) for _, qc, qs in pts
        )
        if not dominated:
            want.add((k, pc, sz))
    assert got == want
    assert got  # a non-degenerate corpus always has a frontier


def test_skyline_frontier_is_strictly_monotone(spark):
    """Frontier invariant: sorted by price, sizes strictly increase — a
    pricier frontier point must strictly beat every cheaper one on size,
    or the cheaper one would dominate it (duplicates share a (price, size)
    point, which is fine)."""
    from pumle_spark.workload.relational3 import skyline_parts_2d

    rows = skyline_parts_2d(spark, SF).collect()
    seen = {}
    for r in rows:
        seen.setdefault((r.price_cents, r.p_size), 0)
        seen[r.price_cents, r.p_size] += 1
    pts = sorted(seen)
    for (pc_a, sz_a), (pc_b, sz_b) in zip(pts, pts[1:]):
        assert pc_a < pc_b and sz_a < sz_b


# --------------------------------------------------------------------------
# join_null_aware_not_in
# --------------------------------------------------------------------------


def test_not_in_empties_when_subquery_has_null(spark, tmp_path):
    """Three-valued logic: one NULL in the NOT IN subquery empties the
    result. This is the semantics a plain LeftAnti would get wrong, and
    why Spark must plan the null-aware variant."""
    spark.createDataFrame(
        [(1, "A"), (2, "B")], "k bigint, name string"
    ).createOrReplaceTempView("__t_outer")
    spark.createDataFrame(
        [(1,), (None,)], "k bigint"
    ).createOrReplaceTempView("__t_inner")
    got = spark.sql(
        "SELECT * FROM __t_outer WHERE k NOT IN (SELECT k FROM __t_inner)"
    ).collect()
    assert got == []
    # sanity: without the NULL, key 2 survives
    spark.createDataFrame([(1,)], "k bigint").createOrReplaceTempView("__t_inner2")
    got2 = spark.sql(
        "SELECT * FROM __t_outer WHERE k NOT IN (SELECT k FROM __t_inner2)"
    ).collect()
    assert [r.k for r in got2] == [2]


def test_not_in_plan_is_null_aware(spark):
    """The registered query's physical plan must carry the null-aware anti
    join marker — proof Catalyst could NOT reduce it to a plain LeftAnti
    (the NULLIF keeps the inner column nullable on purpose)."""
    from pumle_spark.workload.relational3 import join_null_aware_not_in

    plan = join_null_aware_not_in(spark, SF)._jdf.queryExecution().executedPlan().toString()
    # BroadcastHashJoinExec prints its isNullAwareAntiJoin flag as the
    # trailing boolean: "BroadcastHashJoin [...], LeftAnti, BuildRight, true"
    assert "LeftAnti, BuildRight, true" in plan


def test_not_in_matches_manual_anti_semantics(spark):
    """On NULL-free actual data the query must coincide with the plain
    anti-join reformulation."""
    from pumle_spark.tables import table
    from pumle_spark.workload.relational3 import join_null_aware_not_in

    got = {
        (r.p_brand, r.n_parts, r.min_partkey)
        for r in join_null_aware_not_in(spark, SF).collect()
    }
    p = table(spark, SF, "part")
    hi = table(spark, SF, "lineitem").filter(F.col("l_quantity") >= 49).select(
        F.col("l_partkey").alias("p_partkey")
    )
    want = {
        (r.p_brand, r.n_parts, r.min_partkey)
        for r in p.join(hi, "p_partkey", "left_anti")
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.min("p_partkey").alias("min_partkey"),
        )
        .collect()
    }
    assert got == want


# --------------------------------------------------------------------------
# subquery_correlated_scalar
# --------------------------------------------------------------------------


def test_correlated_scalar_matches_groupby_join(spark):
    """The decorrelated subquery query must equal the hand-decorrelated
    groupBy + join formulation, column for column."""
    from pumle_spark.tables import table
    from pumle_spark.workload.relational3 import subquery_correlated_scalar

    got = {
        (r.p_partkey, r.n_brand, r.over_avg_scaled)
        for r in subquery_correlated_scalar(spark, SF).collect()
    }

    t = table(spark, SF, "part").select(
        "p_partkey",
        "p_brand",
        F.round(F.col("p_retailprice") * 100).cast("bigint").alias("price_cents"),
    )
    agg = t.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_brand"), F.sum("price_cents").alias("sum_c")
    )
    j = t.join(agg, "p_brand").filter(
        F.col("price_cents") * F.col("n_brand") > F.col("sum_c")
    )
    want = {
        (r.p_partkey, r.n_brand, r.over)
        for r in j.select(
            "p_partkey",
            "n_brand",
            (F.col("price_cents") * F.col("n_brand") - F.col("sum_c")).alias("over"),
        ).collect()
    }
    assert got == want
    assert got


# --------------------------------------------------------------------------
# join_bloom_semireduction
# --------------------------------------------------------------------------


def test_bloom_semireduction_is_semantics_preserving(spark):
    """Bucket collisions must never change the answer: the reduced plan's
    result equals the plain join's."""
    from pumle_spark.tables import table
    from pumle_spark.workload.relational3 import join_bloom_semireduction

    got = {
        (r.l_returnflag, r.l_linestatus, r.n_lines, r.revenue_cents)
        for r in join_bloom_semireduction(spark, SF).collect()
    }
    li = table(spark, SF, "lineitem")
    o = table(spark, SF, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    plain = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
                    "bigint"
                )
            ).alias("revenue_cents"),
        )
    )
    want = {
        (r.l_returnflag, r.l_linestatus, r.n_lines, r.revenue_cents)
        for r in plain.collect()
    }
    assert got == want
    assert got


def test_bloom_bucket_set_is_bounded(spark):
    """The broadcast reduction set must stay within the bucket space —
    that bound is the whole 100 TB argument."""
    from pumle_spark.tables import table
    from pumle_spark.workload.relational3 import _BLOOM_M

    o = table(spark, SF, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    n = (
        o.select(F.pmod(F.xxhash64("o_orderkey"), F.lit(_BLOOM_M)).alias("b"))
        .distinct()
        .count()
    )
    assert 0 < n <= _BLOOM_M
