"""Relational operator surface (SURVEY.md §2.4, §2.5, §2.9, §2.12).

TPC-H-style queries over the driver star schema. Each query exercises one
operator family the engine claims: hash aggregation, broadcast / sort-merge /
semi / anti / outer / theta joins, window functions, rollup, set ops, top-k.

Scale notes (100 TB posture):
- Dimension joins (region/nation/part/supplier) are explicitly broadcast —
  they are bounded-cardinality dims, so the fact table never shuffles for them.
- Fact-fact joins (orders⋈lineitem) shuffle on the join key; AQE handles skew.
- Aggregates are expressed as groupBy().agg() so Catalyst plans partial
  (map-side) aggregation before the exchange.
- Floating-point aggregates are rounded identically in the Spark plan and the
  DuckDB oracle: summation order differs across engines, so unrounded double
  sums are not bit-comparable.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql.functions import broadcast

from pumle_spark.functions import money
from pumle_spark.tables import table
from pumle_spark.workload import register

# --------------------------------------------------------------------------
# Aggregation core
# --------------------------------------------------------------------------


def _avg4(total: F.Column) -> F.Column:
    """Quantized group mean: exact total (integer-valued double or a
    DECIMAL sum cast to double) divided by the group count, then
    floor(x*10000+0.5)/10000 — the divergence-proof 4-decimal quantizer
    (pure IEEE on cross-engine-identical inputs; ROUND would re-introduce
    Spark's shortest-repr rounding vs DuckDB's binary rounding)."""
    return F.floor(
        (total / F.count(F.lit(1))) * F.lit(10000.0) + F.lit(0.5)
    ) / F.lit(10000.0)


@register(
    "q1_pricing_summary",
    sql=f"""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           {money.sql_money2("l_extendedprice", money.CENTS)} AS sum_base_price,
           {money.sql_money2("l_extendedprice * (1 - l_discount)", money.DP4)}
             AS sum_disc_price,
           {money.sql_money2("l_extendedprice * (1 - l_discount) * (1 + l_tax)", money.DP6)}
             AS sum_charge,
           FLOOR((SUM(l_quantity) / COUNT(*)) * 10000.0 + 0.5)
             / CAST(10000.0 AS DOUBLE) AS avg_qty,
           FLOOR(({money.sql_total_double("l_extendedprice", money.CENTS)}
                  / COUNT(*)) * 10000.0 + 0.5) / CAST(10000.0 AS DOUBLE) AS avg_price,
           FLOOR(({money.sql_total_double("l_discount", money.CENTS)}
                  / COUNT(*)) * 10000.0 + 0.5) / CAST(10000.0 AS DOUBLE) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg", "A-family"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary: filtered scan → partial+final hash agg.

    The shipdate predicate and the 7-column projection both push into the
    parquet scan (PushedFilters / ReadSchema in .explain). Money sums use
    functions.money BIGINT units at the lossless per-expression scale
    (cents / 1e4 for the 2x2-dp product / 1e6 for the 3-factor charge):
    value-identical to the previous DECIMAL(18,6) accumulation but the
    aggregation buffer stays a codegen long (the decimal sweep had cost
    this query 0.36->1.51 s at sf0.1)."""
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            money.sum_money2(F.col("l_extendedprice"), money.CENTS).alias("sum_base_price"),
            money.sum_money2(disc_price, money.DP4).alias("sum_disc_price"),
            money.sum_money2(disc_price * (1 + F.col("l_tax")), money.DP6).alias("sum_charge"),
            _avg4(F.sum("l_quantity")).alias("avg_qty"),
            _avg4(money.total_double(F.col("l_extendedprice"), money.CENTS)).alias("avg_price"),
            _avg4(money.total_double(F.col("l_discount"), money.CENTS)).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q3_top_revenue_orders",
    sql=f"""
    SELECT o.o_orderkey,
           {money.sql_money2("l.l_extendedprice * (1 - l.l_discount)", money.DP4)} AS revenue,
           STRFTIME(o.o_orderdate, '%Y-%m-%d')                   AS orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING' AND o.o_orderstatus <> 'F'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
    tags=("join", "agg", "topk"),
)
def q3_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join → agg → global top-k.

    customer is small relative to the fact tables → broadcast; the
    orders⋈lineitem equi-join stays a shuffle join on o_orderkey. The final
    top-k compiles to TakeOrderedAndProject (no full sort). Tiebreak on
    o_orderkey makes the limit deterministic across engines.
    """
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") != "F")
    li = table(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            money.sum_money2(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), money.DP4
            ).alias("revenue")
        )
        .select(
            "o_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@register(
    "q5_region_revenue",
    sql=f"""
    SELECT n.n_name,
           {money.sql_money2("l.l_extendedprice * (1 - l.l_discount)", money.DP4)} AS revenue
    FROM region r
    JOIN nation n   ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
    WHERE r.r_name IN ('ASIA', 'EUROPE')
    GROUP BY n.n_name
    """,
    tags=("join", "agg"),
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: snowflake join with a correlated nation constraint.

    region→nation→customer are broadcast dims; the supplier join carries the
    extra equi-condition s_nationkey = c_nationkey (local-supplier semantics).
    Revenue accumulates in exact BIGINT 1e-4 units (functions.money).
    """
    r = table(spark, sf_dir, "region").filter(F.col("r_name").isin("ASIA", "EUROPE"))
    n = table(spark, sf_dir, "nation")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(broadcast(c), o.o_custkey == c.c_custkey)
        .join(broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(
            broadcast(s),
            (s.s_suppkey == li.l_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .groupBy("n_name")
        .agg(
            money.sum_money2(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), money.DP4
            ).alias("revenue")
        )
    )


@register(
    "q4_order_priority",
    sql="""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
    GROUP BY o.o_orderpriority
    """,
    tags=("agg", "semi", "exists"),
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS with a correlated inequality.

    r11: the direct left-semi form forced Spark to build the BROADCAST side
    from lineitem (the fact table — fine at sf0.1, impossible at 100 TB).
    EXISTS(l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate) is
    exactly max(l_shipdate) per orderkey > o_orderdate (max ignores NULLs;
    an all-NULL group yields NULL > date = NULL = no match, same as EXISTS),
    so lineitem collapses to a map-side-combinable per-orderkey MAX — the
    shuffle carries |orderkeys| 16-byte rows and the join side sizes are
    known to AQE, which picks broadcast locally and a shuffle join at scale.
    """
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    # r12 (guide §2.3): a qualifying witness needs l_shipdate > o_orderdate
    # with o_orderdate >= 1996-01-01, so rows with l_shipdate <= 1996-01-01
    # can never witness ANY order in the window — drop them at the scan
    # (PushedFilters) before the MAX. The kept-set max exceeds o_orderdate
    # iff the full max does (the full max, when > o_orderdate >= 1996-01-01,
    # is itself in the kept set), and groups that become empty could not
    # match anyway; equivalence is exact.
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-01-01").cast("timestamp")
    )
    lmax = li.groupBy("l_orderkey").agg(F.max("l_shipdate").alias("_max_ship"))
    qualified = o.join(
        lmax,
        (lmax.l_orderkey == o.o_orderkey) & (lmax._max_ship > o.o_orderdate),
        "inner",  # lmax is unique per orderkey: inner ≡ the previous semi
    )
    return qualified.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@register(
    "q6_forecast_revenue",
    sql=f"""
    SELECT {money.sql_money2("l_extendedprice * l_discount", money.DP4)} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    tags=("agg", "filter", "pushdown"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure filtered aggregation — every predicate reaches the
    parquet scan (PushedFilters), the projection is 4 columns, and the agg
    is a single partial+final pass with no grouping key."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.03, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        money.sum_money2(
            F.col("l_extendedprice") * F.col("l_discount"), money.DP4
        ).alias("revenue")
    )


@register(
    "q17_small_quantity_revenue",
    sql=f"""
    WITH avgq AS (
      SELECT l_partkey, 0.5 * AVG(l_quantity) AS half_avg_qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT FLOOR({money.sql_sum_units("l.l_extendedprice", money.CENTS)} / CAST(7.0 AS DOUBLE) + 0.5)
             / CAST(100.0 AS DOUBLE) AS avg_yearly
    FROM lineitem l
    JOIN avgq a ON a.l_partkey = l.l_partkey
    WHERE l.l_quantity < a.half_avg_qty
    """,
    tags=("agg", "correlated-subquery", "join"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery (per-part average)
    decorrelated into aggregate-then-join — the same fact table feeds both
    sides, so Catalyst reuses the scan (ReusedExchange at scale)."""
    li = table(spark, sf_dir, "lineitem")
    avgq = li.groupBy("l_partkey").agg((0.5 * F.avg("l_quantity")).alias("half_avg_qty"))
    return (
        li.join(avgq, "l_partkey")
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(
            # cents/7.0 IS avg_yearly in cents: quantize half-up there, in
            # pure IEEE mirrored by the oracle — the previous
            # ROUND(DECIMAL/7.0, 2) promoted to DOUBLE before ROUND and
            # re-entered the shortest-repr divergence class (ADVICE r10).
            (
                F.floor(
                    money.sum_units(F.col("l_extendedprice"), money.CENTS) / F.lit(7.0)
                    + F.lit(0.5)
                )
                / F.lit(100.0)
            ).alias("avg_yearly")
        )
    )


@register(
    "q19_disjunctive_predicates",
    sql=f"""
    SELECT {money.sql_money2("l.l_extendedprice * (1 - l.l_discount)", money.DP4)} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#11' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 1 AND 25)
       OR (p.p_brand = 'Brand#20' AND p.p_size BETWEEN 10 AND 30 AND l.l_quantity BETWEEN 10 AND 40)
       OR (p.p_brand = 'Brand#7'  AND p.p_size BETWEEN 20 AND 50 AND l.l_quantity BETWEEN 20 AND 50)
    """,
    tags=("join", "filter", "disjunction"),
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR of AND-blocks spanning both join sides. Catalyst
    extracts the common per-side conjuncts (brand/size on part, quantity on
    lineitem) below the join as pre-filters — the disjunction itself
    evaluates post-join, but both inputs shrink first."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    j = li.join(broadcast(p), li.l_partkey == p.p_partkey)
    block = (
        ((F.col("p_brand") == "Brand#11") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 25))
        | ((F.col("p_brand") == "Brand#20") & F.col("p_size").between(10, 30) & F.col("l_quantity").between(10, 40))
        | ((F.col("p_brand") == "Brand#7") & F.col("p_size").between(20, 50) & F.col("l_quantity").between(20, 50))
    )
    return j.filter(block).agg(
        money.sum_money2(
            F.col("l_extendedprice") * (1 - F.col("l_discount")), money.DP4
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "agg_percentiles_by_status",
    sql="""
    SELECT o_orderstatus,
           ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
           ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90,
           ROUND(quantile_cont(o_totalprice, 0.99), 4) AS p99
    FROM orders
    GROUP BY o_orderstatus
    """,
    tags=("agg", "percentile"),
)
def agg_percentiles_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group — Spark's percentile() and
    DuckDB's quantile_cont share the linear-interpolation definition, so
    values hash-match. At 100 TB the approximate sketch
    (approx_percentile/t-digest) replaces this; exact is kept for the
    oracle gate."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(o_totalprice, 0.99)"), 4).alias("p99"),
    )


@register(
    "having_big_spenders",
    sql=f"""
    SELECT o_custkey,
           COUNT(*) AS n_orders,
           {money.sql_money2("o_totalprice", money.DP4)} AS total_spend
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 12
       AND {money.sql_sum_units("o_totalprice", money.DP4)} > 500000000
    """,
    tags=("agg", "having"),
)
def having_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY + HAVING: the post-aggregation filter stays after the agg
    (it references aggregates), everything in one shuffle. The HAVING
    threshold compares exact BIGINT 1e-4 units (> 50000 money units ==
    > 500_000_000 units) — integer comparison, no float boundary."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            money.sum_units(F.col("o_totalprice"), money.DP4).alias("_spend_units"),
        )
        .filter((F.col("n_orders") >= 12) & (F.col("_spend_units") > 500000000))
        .select(
            "o_custkey",
            "n_orders",
            money.money2(F.col("_spend_units"), money.DP4).alias("total_spend"),
        )
    )


@register(
    "window_dense_rank_ntile",
    sql="""
    SELECT c_custkey, c_nationkey,
           CAST(DENSE_RANK() OVER (PARTITION BY c_nationkey ORDER BY ROUND(c_acctbal, 2) DESC) AS INTEGER) AS bal_rank,
           CAST(NTILE(4) OVER (PARTITION BY c_nationkey ORDER BY ROUND(c_acctbal, 2) DESC, c_custkey) AS INTEGER) AS bal_quartile
    FROM customer
    """,
    tags=("window", "rank"),
)
def window_dense_rank_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dense_rank + ntile over the same partition spec — one shuffle serves
    both window functions. Ranking on the rounded balance keeps cross-engine
    float ties identical; ntile adds c_custkey for a total order."""
    from pyspark.sql import Window

    c = table(spark, sf_dir, "customer")
    bal = F.round("c_acctbal", 2)
    w_rank = Window.partitionBy("c_nationkey").orderBy(bal.desc())
    w_tile = Window.partitionBy("c_nationkey").orderBy(bal.desc(), F.col("c_custkey"))
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.dense_rank().over(w_rank).cast("int").alias("bal_rank"),
        F.ntile(4).over(w_tile).cast("int").alias("bal_quartile"),
    )


# --------------------------------------------------------------------------
# Join family (SURVEY §2.4 engine surface)
# --------------------------------------------------------------------------


@register(
    "join_broadcast_brand_volume",
    sql="""
    SELECT p.p_brand,
           ROUND(SUM(l.l_quantity), 2) AS sum_qty,
           COUNT(*)                    AS n_items
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_size <= 25
    GROUP BY p.p_brand
    """,
    tags=("join", "broadcast", "J3"),
)
def join_broadcast_brand_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast equi-join (J3 hash→params lookup shape): fact ⋈ broadcast(dim).

    Mirrors arrays.py:240-253 enriching golden outputs by sim_hash via a
    catalog lookup — re-expressed as lineitem enriched by broadcast part.
    """
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_size") <= 25)
    return (
        li.join(broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "join_left_outer_part_activity",
    sql="""
    SELECT p.p_partkey,
           COUNT(l.l_orderkey)         AS n_lineitems,
           ROUND(SUM(l.l_quantity), 2) AS sum_qty
    FROM part p
    LEFT JOIN lineitem l ON l.l_partkey = p.p_partkey
    GROUP BY p.p_partkey
    """,
    tags=("join", "outer", "J1"),
)
def join_left_outer_part_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer join preserving the dense domain (J1 scatter semantics).

    The sparse→dense scatter of arrays.py:94-135 — every global cell appears,
    missing measurements stay NULL — is exactly a left outer join from the
    dense key domain. Parts with no lineitems get NULL sum_qty / 0 count.
    """
    p = table(spark, sf_dir, "part")
    li = table(spark, sf_dir, "lineitem")
    # r11: aggregate lineitem per l_partkey BEFORE the outer join — the
    # per-key count/sum is map-side combinable, so the join (and any
    # shuffle/broadcast) carries |partkeys| slim rows instead of every
    # lineitem row. p_partkey is unique, so the post-join groupBy drops
    # entirely. l_quantity is integer-valued → the double sum is exact under
    # reassociation; unmatched parts keep count 0 / NULL sum as before.
    lagg = li.groupBy("l_partkey").agg(
        F.count("l_orderkey").alias("_n"),
        F.sum("l_quantity").alias("_sq"),
    )
    return p.join(lagg, lagg.l_partkey == p.p_partkey, "left").select(
        "p_partkey",
        F.coalesce("_n", F.lit(0).cast("bigint")).alias("n_lineitems"),
        F.round("_sq", 2).alias("sum_qty"),
    )


@register(
    "join_semi_active_customers",
    sql="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
    """,
    tags=("join", "semi"),
)
def join_semi_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: customers with ≥1 finished order (EXISTS semantics).

    Semi joins never duplicate the left side, so no post-join distinct —
    at scale this halves the shuffle vs join+dropDuplicates.
    """
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "join_anti_inactive_customers",
    sql="""
    SELECT c.c_custkey, c.c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
    """,
    tags=("join", "anti", "J5", "X2"),
)
def join_anti_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with no PENDING order (NOT EXISTS over a
    filtered probe side — every customer has SOME order in the testdata, so
    the unfiltered variant matched on an empty result, which checks
    nothing; this form returns a real row set at every sf).

    Same shape as the engine's idempotent-dispatch check (X2): configs
    anti-joined against status='COMPLETED' before work is scheduled.
    """
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_mktsegment")


@register(
    "join_full_outer_nation_counts",
    sql="""
    WITH cc AS (SELECT c_nationkey AS nk, COUNT(*) AS n_customers FROM customer GROUP BY 1),
         sc AS (SELECT s_nationkey AS nk, COUNT(*) AS n_suppliers FROM supplier GROUP BY 1)
    SELECT COALESCE(cc.nk, sc.nk) AS nationkey,
           COALESCE(cc.n_customers, 0) AS n_customers,
           COALESCE(sc.n_suppliers, 0) AS n_suppliers
    FROM cc FULL OUTER JOIN sc ON cc.nk = sc.nk
    """,
    tags=("join", "outer"),
)
def join_full_outer_nation_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer join of two pre-aggregated sides (aggregate-before-join).

    Aggregating each side first shrinks both inputs to dim cardinality before
    the join — the shuffle moves ~25 rows instead of the fact tables.
    """
    c = table(spark, sf_dir, "customer").groupBy(F.col("c_nationkey").alias("nk")).agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    s = table(spark, sf_dir, "supplier").groupBy(F.col("s_nationkey").alias("nk")).agg(
        F.count(F.lit(1)).alias("n_suppliers")
    )
    return (
        c.join(s, "nk", "full_outer")
        .select(
            F.col("nk").alias("nationkey"),
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        )
    )


@register(
    "join_theta_balance_dominance",
    sql="""
    SELECT s.s_suppkey,
           COUNT(*) AS n_poorer_customers
    FROM supplier s
    JOIN customer c ON c.c_acctbal < s.s_acctbal
    GROUP BY s.s_suppkey
    """,
    tags=("join", "theta", "cross"),
)
def join_theta_balance_dominance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta (non-equi) join: broadcast-nested-loop with a `<` predicate.

    The small side (supplier) is broadcast, so the big side streams once.
    At 100 TB you'd bin both sides on acctbal ranges first; here cardinality
    is supplier×customer which stays manageable because supplier is a dim.
    """
    s = table(spark, sf_dir, "supplier")
    c = table(spark, sf_dir, "customer")
    return (
        c.join(broadcast(s), c.c_acctbal < s.s_acctbal)
        .groupBy("s_suppkey")
        .agg(F.count(F.lit(1)).alias("n_poorer_customers"))
    )


# --------------------------------------------------------------------------
# Window functions (SURVEY §2.12)
# --------------------------------------------------------------------------


@register(
    "window_topk_orders_per_customer",
    sql="""
    SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS totalprice, CAST(rn AS INTEGER) AS rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    )
    WHERE rn <= 3
    """,
    tags=("window",),
)
def window_topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via row_number window — one shuffle on the partition key."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            F.col("rn").cast("int").alias("rn"),
        )
    )


@register(
    "window_running_customer_spend",
    sql="""
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
    FROM orders
    """,
    tags=("window",),
)
def window_running_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running aggregate over an ordered per-customer frame."""
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    )


@register(
    "window_order_gap_days",
    sql="""
    SELECT o_custkey, o_orderkey,
           CAST(date_diff('day',
                LAG(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
                o_orderdate) AS BIGINT) AS gap_days
    FROM orders
    """,
    tags=("window", "lag"),
)
def window_order_gap_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() over an ordered partition: days since the customer's previous order.

    Same shape as per-cell saturation deltas over t in the plume analytics
    (SURVEY §2.12): lag over Window.partitionBy(sim, cell).orderBy(t).
    """
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).cast("bigint").alias("gap_days"),
    )


# --------------------------------------------------------------------------
# Rollup / distinct / set ops / top-k / scalars
# --------------------------------------------------------------------------


@register(
    "agg_rollup_region_nation",
    sql="""
    SELECT COALESCE(r.r_name, 'ALL') AS region_name,
           COALESCE(n.n_name, 'ALL') AS nation_name,
           COUNT(c.c_custkey)        AS n_customers
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    GROUP BY ROLLUP(r.r_name, n.n_name)
    -- no-op on real data; drops the ANSI grand-total-on-empty-input row so
    -- the oracle matches Spark's rollup (empty relation -> empty output)
    HAVING COUNT(*) > 0
    """,
    tags=("agg", "rollup"),
)
def agg_rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup (region → nation → grand total) in one pass."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    joined = c.join(broadcast(n), c.c_nationkey == n.n_nationkey).join(
        broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(F.count("c_custkey").alias("n_customers"))
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region_name"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation_name"),
            "n_customers",
        )
    )


@register(
    "agg_distinct_customers_per_status",
    sql="""
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS n_distinct_customers,
           COUNT(*)                  AS n_orders
    FROM orders
    GROUP BY o_orderstatus
    """,
    tags=("agg", "distinct", "A5"),
)
def agg_distinct_customers_per_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation (expands to a two-phase agg under Catalyst).

    The approximate path (approx_count_distinct / HLL) is the 100 TB default;
    exact is kept for oracle parity (A5 distinct traps, co2lab3DPUMLE.m:143).
    """
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count_distinct("o_custkey").alias("n_distinct_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "set_except_customers",
    sql="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
    tags=("setop",),
)
def set_except_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct set difference): finished-only customers."""
    o = table(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    op = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    return f.subtract(op)  # EXCEPT DISTINCT


@register(
    "set_intersect_union",
    sql="""
    SELECT custkey, 'both_F_and_O' AS tag FROM (
      SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
      INTERSECT
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    )
    UNION ALL
    SELECT custkey, 'high_balance' AS tag FROM (
      SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 9000
    )
    """,
    tags=("setop",),
)
def set_intersect_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT + UNION ALL composition."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    f = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    op = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    both = f.intersect(op).withColumn("tag", F.lit("both_F_and_O"))
    high = (
        c.filter(F.col("c_acctbal") > 9000)
        .select(F.col("c_custkey").alias("custkey"))
        .withColumn("tag", F.lit("high_balance"))
    )
    return both.unionAll(high)


@register(
    "topk_global_lineitems",
    sql="""
    SELECT l_orderkey, l_linenumber, ROUND(l_extendedprice, 2) AS extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 20
    """,
    tags=("topk", "sort"),
)
def topk_global_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: orderBy().limit() → TakeOrderedAndProject (heap per
    partition + merge at driver; never a full sort at scale)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .limit(20)
        .select("l_orderkey", "l_linenumber", F.round("l_extendedprice", 2).alias("extendedprice"))
    )


@register(
    "scalar_string_math_part",
    sql="""
    SELECT p_partkey,
           UPPER(p_brand)                                   AS brand_upper,
           SUBSTR(p_name, 1, 8)                             AS name_prefix,
           LENGTH(p_name)                                   AS name_len,
           CONCAT(p_brand, ':', p_type)                     AS brand_type,
           REPLACE(p_type, ' ', '_')                        AS type_snake,
           ROUND(p_retailprice * 1.1, 2)                    AS price_with_tax,
           ROUND(SQRT(p_retailprice), 6)                    AS price_sqrt,
           ROUND(LN(p_retailprice + 1), 6)                  AS price_ln,
           CAST(p_size % 5 AS INTEGER)                      AS size_mod5
    FROM part
    WHERE p_retailprice > 0
    """,
    tags=("scalar", "F-family"),
)
def scalar_string_math_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar function surface (F2/F5/F6/F14 analogues): string + math exprs,
    all JVM-side inside whole-stage codegen — no Python in the hot path."""
    p = table(spark, sf_dir, "part")
    return p.filter(F.col("p_retailprice") > 0).select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.regexp_replace("p_type", " ", "_").alias("type_snake"),
        F.round(F.col("p_retailprice") * 1.1, 2).alias("price_with_tax"),
        F.round(F.sqrt("p_retailprice"), 6).alias("price_sqrt"),
        F.round(F.log(F.col("p_retailprice") + 1), 6).alias("price_ln"),
        (F.col("p_size") % 5).cast("int").alias("size_mod5"),
    )


@register(
    "scalar_dates_orders",
    sql=f"""
    SELECT CAST(year(o_orderdate) AS INTEGER)  AS order_year,
           CAST(month(o_orderdate) AS INTEGER) AS order_month,
           COUNT(*)                            AS n_orders,
           {money.sql_money2("o_totalprice", money.DP4)} AS sum_price
    FROM orders
    GROUP BY 1, 2
    """,
    tags=("scalar", "dates", "F13"),
)
def scalar_dates_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-part extraction + aggregation (F13 timestamp family)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").cast("int").alias("order_year"),
            F.month("o_orderdate").cast("int").alias("order_month"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            money.sum_money2(F.col("o_totalprice"), money.DP4).alias("sum_price"),
        )
    )


@register(
    "case_when_price_bands",
    sql=f"""
    SELECT CASE WHEN o_totalprice < 1000  THEN 'low'
                WHEN o_totalprice < 10000 THEN 'mid'
                ELSE 'high' END AS band,
           COUNT(*)            AS n_orders,
           FLOOR(({money.sql_total_double("o_totalprice", money.DP4)} / COUNT(*))
                 * 10000.0 + 0.5) / 10000.0 AS avg_price
    FROM orders
    GROUP BY 1
    """,
    tags=("scalar", "case", "G6"),
)
def case_when_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bucketing (G6 schedule-control assignment shape)."""
    o = table(spark, sf_dir, "orders")
    band = (
        F.when(F.col("o_totalprice") < 1000, "low")
        .when(F.col("o_totalprice") < 10000, "mid")
        .otherwise("high")
    )
    return (
        o.groupBy(band.alias("band"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _avg4(money.total_double(F.col("o_totalprice"), money.DP4)).alias("avg_price"),
        )
    )


@register(
    "pivot_status_by_year",
    sql="""
    SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS cnt_f,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS cnt_o,
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS cnt_p
    FROM orders
    GROUP BY 1
    """,
    tags=("pivot", "agg"),
)
def pivot_status_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot via conditional aggregation — single shuffle, no pivot-column
    discovery pass (the two-pass df.pivot() is avoidable when the domain is
    a known enum, F16)."""
    o = table(spark, sf_dir, "orders")

    def cnt(status: str):
        return F.count(F.when(F.col("o_orderstatus") == status, 1))

    return (
        o.groupBy(F.year("o_orderdate").cast("int").alias("order_year"))
        .agg(
            cnt("F").alias("cnt_f"),
            cnt("O").alias("cnt_o"),
            cnt("P").alias("cnt_p"),
        )
    )
