"""Second relational batch: the remaining classic TPC-H query shapes adapted
to the driver schema — nation-pair volume, returned items, distribution with
zero-preserving left join, conditional-agg ratio, NOT-IN, IN-subquery with
HAVING, scalar-avg subquery. Same conventions as relational.py: identical
aliases both sides, identical rounding, deterministic top-k."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql.functions import broadcast

from pumle_spark.functions import money
from pumle_spark.tables import table
from pumle_spark.workload import register


@register(
    "q7_nation_pair_volume",
    sql="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INTEGER) AS ship_year,
           CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100.0 + 0.5)
                         AS BIGINT)) AS BIGINT) / 100.0 AS volume
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    GROUP BY 1, 2, 3
    """,
    tags=("join", "agg"),
)
def q7_nation_pair_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: shipping volume between a nation pair, both directions —
    the nation dim joins twice under different roles (self-join of a
    broadcast dim costs nothing; the disjunctive pair filter evaluates
    post-join on dim columns only).

    Volume sums PER-ROW EXACT CENTS (floor(x*100+0.5) of bit-identical
    doubles, then BIGINT sum, then one division) instead of
    ROUND(SUM(double)): a double sum is partial-sum-order dependent, so
    Spark's 32-partition aggregate and DuckDB's sequential one drift a
    ulp apart and a cents-rounding boundary flips — the exact one-milli
    hash mismatch the round-10 sf1 probe caught on this query."""
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("nk1"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("cust_nation"))
    j = (
        li.join(broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(broadcast(c), o.o_custkey == c.c_custkey)
        .join(broadcast(n1), F.col("s_nationkey") == F.col("nk1"))
        .join(broadcast(n2), F.col("c_nationkey") == F.col("nk2"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return j.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("ship_year")
    ).agg(
        (
            F.sum(
                F.floor(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * F.lit(100.0)
                    + F.lit(0.5)
                ).cast("bigint")
            )
            / F.lit(100.0)
        ).alias("volume")
    )


@register(
    "q10_returned_items",
    sql=f"""
    SELECT c.c_custkey, c.c_name, n.n_name,
           {money.sql_money2("l.l_extendedprice * (1 - l.l_discount)", money.DP4)} AS revenue
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("join", "agg", "topk"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: customers who returned the most, one year window, top 20
    (deterministic via custkey tiebreak on the rounded revenue)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(broadcast(c), o.o_custkey == c.c_custkey)
        .join(broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            money.sum_money2(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), money.DP4
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "q13_order_count_distribution",
    sql="""
    WITH per_cust AS (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                        AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM per_cust
    GROUP BY c_count
    """,
    tags=("join", "outer", "agg"),
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: order-count distribution INCLUDING zero-order customers —
    the join predicate lives in the LEFT JOIN's ON clause (moving it to
    WHERE would silently drop the zeros), then a second aggregation over the
    first's result."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q14_promo_revenue_share",
    sql="""
    SELECT ROUND(100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                                  THEN l.l_extendedprice * (1 - l.l_discount)
                                  ELSE 0 END)
                 / SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_pct
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1996-07-01'
    """,
    tags=("agg", "conditional"),
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo revenue share — numerator and denominator in ONE agg
    pass via conditional aggregation (never two scans + a join)."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    p = table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))
    return (
        li.join(broadcast(p), li.l_partkey == p.p_partkey)
        .agg(F.round(100.0 * F.sum(promo) / F.sum(rev), 4).alias("promo_pct"))
    )


@register(
    "q16_part_supplier_counts",
    sql="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM part p
    JOIN lineitem l ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#13'
      AND p.p_type NOT IN ('PROMO', 'ECONOMY')
      AND p.p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
    GROUP BY 1, 2, 3
    """,
    tags=("agg", "distinct", "not-in"),
)
def q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (lineitem standing in for partsupp): distinct
    supplier counts per part class with <>/NOT IN/IN predicates — all three
    negative/positive membership forms pushed to the part scan."""
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & ~F.col("p_type").isin("PROMO", "ECONOMY")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    li = table(spark, sf_dir, "lineitem")
    return (
        li.join(broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q18_large_volume_orders",
    sql="""
    WITH big AS (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 250
    )
    SELECT c.c_custkey, o.o_orderkey,
           STRFTIME(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           ROUND(o.o_totalprice, 2) AS totalprice,
           ROUND(SUM(l.l_quantity), 2) AS sum_qty
    FROM orders o
    JOIN big    ON big.l_orderkey = o.o_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY 1, 2, 3, 4
    """,
    tags=("join", "having", "subquery"),
)
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: orders whose total quantity exceeds a threshold — the IN
    (GROUP BY … HAVING) subquery becomes an aggregate → semi-style join;
    the qualifying key set is tiny, so it broadcasts back onto orders."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_sq"))
        .filter(F.col("_sq") > 250)
        # alias away from the li lineage: li is joined again below and Spark
        # rejects the ambiguous self-join reference otherwise
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        o.join(broadcast(big), o.o_orderkey == big.big_orderkey)
        .join(broadcast(c), o.o_custkey == c.c_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
        )
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
    )


@register(
    "profile_orders_columns",
    sql="""
    SELECT 'o_orderkey' AS col_name, COUNT(*) AS n_rows,
           COUNT(o_orderkey) AS n_nonnull, COUNT(DISTINCT o_orderkey) AS n_distinct,
           CAST(MIN(o_orderkey) AS VARCHAR) AS min_str, CAST(MAX(o_orderkey) AS VARCHAR) AS max_str
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', COUNT(*), COUNT(o_orderstatus), COUNT(DISTINCT o_orderstatus),
           MIN(o_orderstatus), MAX(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', COUNT(*), COUNT(o_totalprice), COUNT(DISTINCT o_totalprice),
           printf('%.2f', MIN(o_totalprice)), printf('%.2f', MAX(o_totalprice))
    FROM orders
    """,
    tags=("profile", "stats"),
)
def profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data profiling: per-column row/non-null/distinct counts and min/max —
    the first pass any pipeline runs on a new table. All columns profile in
    one scan per projection; outputs are stringified so heterogeneous column
    types share one result schema."""
    o = table(spark, sf_dir, "orders")

    def prof(col: str, render):
        return o.agg(
            F.lit(col).alias("col_name"),
            F.count(F.lit(1)).alias("n_rows"),
            F.count(col).alias("n_nonnull"),
            F.count_distinct(col).alias("n_distinct"),
            render(F.min(col)).alias("min_str"),
            render(F.max(col)).alias("max_str"),
        )

    as_str = lambda c: c.cast("string")  # noqa: E731
    # explicit %.2f on BOTH sides: default double→string casts diverge
    # cross-engine past 1e7 (Spark '1.0E7' vs DuckDB '10000000.0')
    rounded = lambda c: F.format_string("%.2f", c)  # noqa: E731
    return (
        prof("o_orderkey", as_str)
        .unionByName(prof("o_orderstatus", as_str))
        .unionByName(prof("o_totalprice", rounded))
    )


@register(
    "join_right_outer_customer_orders",
    sql="""
    SELECT c.c_custkey,
           COUNT(o.o_orderkey) AS n_open_orders
    FROM orders o
    RIGHT JOIN customer c ON o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O'
    GROUP BY c.c_custkey
    """,
    tags=("join", "outer"),
)
def join_right_outer_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join preserving the full customer domain (zeros kept) —
    with the status predicate in the ON clause, not WHERE, so non-matching
    customers survive with count 0."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return (
        o.join(c, (o.o_custkey == c.c_custkey) & (o.o_orderstatus == "O"), "right")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_open_orders"))
    )


@register(
    "set_union_distinct",
    sql="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    UNION
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    """,
    tags=("setop",),
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) — completes the set-operator surface alongside
    UNION ALL / INTERSECT / EXCEPT."""
    o = table(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    p = o.filter(F.col("o_orderstatus") == "P").select(F.col("o_custkey").alias("custkey"))
    return f.union(p).distinct()


@register(
    "q2_min_cost_supplier",
    sql="""
    WITH ps AS (
      SELECT l_partkey, l_suppkey, MIN(l_extendedprice) AS supplycost
      FROM lineitem GROUP BY 1, 2
    ),
    eligible AS (
      SELECT ps.l_partkey, ps.supplycost, s.s_acctbal, s.s_name, n.n_name
      FROM ps
      JOIN supplier s ON s.s_suppkey = ps.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      JOIN region r   ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'
    )
    SELECT e.s_acctbal, e.s_name, e.n_name, p.p_partkey, p.p_name,
           ROUND(e.supplycost, 2) AS supplycost
    FROM eligible e
    JOIN part p ON p.p_partkey = e.l_partkey
    WHERE p.p_type = 'LARGE' AND p.p_size BETWEEN 1 AND 25
      AND e.supplycost = (SELECT MIN(e2.supplycost) FROM eligible e2
                          WHERE e2.l_partkey = e.l_partkey)
    ORDER BY e.s_acctbal DESC, e.n_name, e.s_name, p.p_partkey
    LIMIT 100
    """,
    tags=("join", "correlated-subquery", "topk"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (lineitem-derived partsupp: supplycost = MIN price per
    (part, supplier)): the correlated min-cost subquery becomes a per-part
    aggregate joined back on (partkey, cost) equality. supplycost is an exact
    parquet double (no arithmetic), so the equality join is engine-stable.
    All dims broadcast; the only shuffle is the partsupp derivation."""
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "LARGE") & F.col("p_size").between(1, 25)
    )
    ps = li.groupBy("l_partkey", "l_suppkey").agg(F.min("l_extendedprice").alias("supplycost"))
    sup_eur = (
        s.join(broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    eligible = ps.join(broadcast(sup_eur), ps.l_suppkey == sup_eur.s_suppkey)
    min_cost = eligible.groupBy(F.col("l_partkey").alias("mc_partkey")).agg(
        F.min("supplycost").alias("min_cost")
    )
    return (
        eligible.join(
            broadcast(min_cost),
            (eligible.l_partkey == min_cost.mc_partkey)
            & (eligible.supplycost == min_cost.min_cost),
        )
        .join(broadcast(p), eligible.l_partkey == p.p_partkey)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.round("supplycost", 2).alias("supplycost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "q8_national_market_share",
    sql="""
    WITH flat AS (
      SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             n2.n_name AS supp_nation
      FROM lineitem l
      JOIN part p     ON p.p_partkey = l.l_partkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
      JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
      JOIN region r   ON r.r_regionkey = n1.n_regionkey
      WHERE r.r_name = 'EUROPE' AND p.p_type = 'STANDARD'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate < TIMESTAMP '1998-01-01'
    )
    SELECT o_year,
           ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_5'
                               THEN CAST(volume AS DECIMAL(18, 6))
                               ELSE CAST(0 AS DECIMAL(18, 6)) END) AS DOUBLE)
                 / CAST(SUM(CAST(volume AS DECIMAL(18, 6))) AS DOUBLE), 4) AS mkt_share
    FROM flat GROUP BY o_year
    """,
    tags=("join", "agg", "conditional"),
)
def q8_national_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's share of regional order volume per year — a
    7-table star join where every dim broadcasts and the conditional share
    computes in a single agg pass (no self-join of the fact)."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    n1 = n.select(F.col("n_nationkey").alias("nk1"), F.col("n_regionkey").alias("rk1"))
    n2 = n.select(F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("supp_nation"))
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    flat = (
        li.join(broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(broadcast(c), o.o_custkey == c.c_custkey)
        .join(broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(broadcast(n1), F.col("c_nationkey") == F.col("nk1"))
        .join(broadcast(n2), F.col("s_nationkey") == F.col("nk2"))
        .join(broadcast(r), F.col("rk1") == F.col("r_regionkey"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            volume.alias("volume"),
            "supp_nation",
        )
    )
    dec = "decimal(18,6)"
    nat_vol = (
        F.when(F.col("supp_nation") == "NATION_5", F.col("volume").cast(dec))
        .otherwise(F.lit(0).cast(dec))
    )
    return flat.groupBy("o_year").agg(
        F.round(
            F.sum(nat_vol).cast("double") / F.sum(F.col("volume").cast(dec)).cast("double"), 4
        ).alias("mkt_share")
    )


@register(
    "q9_product_type_profit",
    sql="""
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
           CAST(ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                               - 0.1 * p.p_retailprice * l.l_quantity
                               AS DECIMAL(18, 6))), 2) AS DOUBLE) AS sum_profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY 1, 2
    """,
    tags=("join", "agg"),
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per supplier-nation per year over a 5-table
    mixed-size join (supplycost stands in as 10% of p_retailprice — the
    testdata has no partsupp). The part-name LIKE filter prunes the fact
    early via the broadcast part dim. Profit accumulates in DECIMAL(18,6) so
    the sum is exact and order-independent — double sums differ across
    engines in the last ulp and flip the cent rounding."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_name").contains("widget"))
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders")
    n = table(spark, sf_dir, "nation")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(broadcast(p), li.l_partkey == p.p_partkey)
        .join(broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(
            # round the EXACT decimal, cast to double after: casting first
            # puts Spark's shortest-repr HALF_UP against DuckDB's binary
            # rounding on half-cent sums (…0.665 → .67 vs .66)
            F.round(F.sum(profit.cast("decimal(18,6)")), 2).cast("double").alias("sum_profit")
        )
    )


@register(
    "q11_important_stock",
    sql="""
    WITH natps AS (
      SELECT l.l_partkey, l.l_extendedprice
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_3'
    )
    SELECT l_partkey AS partkey,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18, 6))), 2) AS DOUBLE) AS part_value
    FROM natps
    GROUP BY l_partkey
    HAVING SUM(CAST(l_extendedprice AS DECIMAL(18, 6)))
           > (SELECT SUM(CAST(l_extendedprice AS DECIMAL(18, 6))) * 0.001 FROM natps)
    """,
    tags=("agg", "scalar-subquery", "having"),
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part value within one nation's suppliers, kept
    only when above a fraction of the nation total — the scalar-subquery
    threshold is a single-row broadcast cross join, so the fact scans once
    for the groups and once for the total (both pre-filtered by the
    broadcast supplier dim)."""
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    nat_sup = s.join(broadcast(n), s.s_nationkey == n.n_nationkey).select("s_suppkey")
    natps = li.join(broadcast(nat_sup), li.l_suppkey == nat_sup.s_suppkey).select(
        "l_partkey", F.col("l_extendedprice").cast("decimal(18,6)").alias("price_dec")
    )
    # keep the HAVING comparison in exact decimal on BOTH engines: a part
    # value within one double ulp of the threshold must not flip membership
    threshold = natps.agg(
        (F.sum("price_dec") * F.lit(0.001).cast("decimal(4,3)")).alias("threshold")
    )
    return (
        natps.groupBy("l_partkey")
        .agg(F.sum("price_dec").alias("_raw_value"))
        .crossJoin(broadcast(threshold))
        .filter(F.col("_raw_value") > F.col("threshold"))
        .select(
            F.col("l_partkey").alias("partkey"),
            F.round(F.col("_raw_value"), 2).cast("double").alias("part_value"),
        )
    )


@register(
    "q12_shipmode_priority",
    sql="""
    SELECT l.l_returnflag AS ret_mode,
           COUNT(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS high_line_count,
           COUNT(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS low_line_count
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_returnflag IN ('A', 'R')
      AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY 1
    """,
    tags=("join", "conditional", "agg"),
)
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (l_returnflag stands in for l_shipmode; ship-lag > 30
    days stands in for the commit/receipt-date lag): priority split via
    conditional COUNT in one agg pass, with the date-window predicates pushed
    to the lineitem scan and the lag predicate evaluated in the join."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("A", "R")
        & (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        .groupBy(F.col("l_returnflag").alias("ret_mode"))
        .agg(
            F.count(F.when(hi, 1)).alias("high_line_count"),
            F.count(F.when(~hi, 1)).alias("low_line_count"),
        )
    )


@register(
    "q15_top_supplier",
    sql="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                                 AS DECIMAL(18, 6))), 2) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY 1
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s
    JOIN revenue r ON r.supplier_no = s.s_suppkey
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    tags=("cte", "scalar-subquery", "agg"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the maximum quarterly revenue — the view
    becomes a reused DataFrame, the max-of-agg a single-row broadcast. The
    max compares on the ROUNDED revenue on both sides so ties resolve
    identically across engines."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    s = table(spark, sf_dir, "supplier")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(rev), 2).cast("double").alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("_mx"))
    return (
        revenue.crossJoin(broadcast(mx))
        .filter(F.col("total_revenue") == F.col("_mx"))
        .join(broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q20_excess_stock_suppliers",
    sql="""
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             SUM(CAST(l_quantity AS DECIMAL(18, 6))) AS availqty,
             SUM(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01'
                       AND l_shipdate < TIMESTAMP '1997-01-01'
                      THEN CAST(l_quantity AS DECIMAL(18, 6))
                      ELSE CAST(0 AS DECIMAL(18, 6)) END) AS qty_1996
      FROM lineitem GROUP BY 1, 2
    )
    SELECT s.s_suppkey, s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_regionkey IN (SELECT r_regionkey FROM region WHERE r_name = 'ASIA')
      AND s.s_suppkey IN (
        SELECT ps.l_suppkey FROM ps
        WHERE ps.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
          AND ps.qty_1996 > 0
          AND ps.availqty > 2 * ps.qty_1996
      )
    """,
    tags=("nested-in", "semi", "subquery"),
)
def q20_excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested IN-subquery chain — suppliers in a region
    holding 'excess stock' of small parts (lifetime quantity > 2× the 1996
    shipped quantity, both from the lineitem-derived partsupp). Every IN
    becomes a semi join; the part and region filters broadcast."""
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    small = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_name").startswith("small"))
        .select("p_partkey")
    )
    in_1996 = (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp")) & (
        F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp")
    )
    dec = "decimal(18,6)"
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast(dec)).alias("availqty"),
        F.sum(
            F.when(in_1996, F.col("l_quantity").cast(dec)).otherwise(F.lit(0).cast(dec))
        ).alias("qty_1996"),
    )
    qual = (
        ps.join(broadcast(small), ps.l_partkey == small.p_partkey, "left_semi")
        .filter((F.col("qty_1996") > 0) & (F.col("availqty") > 2 * F.col("qty_1996")))
        .select("l_suppkey")
    )
    return (
        s.join(broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"), "left_semi")
        .join(qual, s.s_suppkey == qual.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name", "n_name")
    )


@register(
    "q21_waiting_suppliers",
    sql="""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o    ON o.o_orderkey = l1.l_orderkey
    JOIN nation n    ON n.n_nationkey = s.s_nationkey
    JOIN region r    ON r.r_regionkey = n.n_regionkey
    WHERE o.o_orderstatus = 'F' AND r.r_name = 'ASIA'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 100
    """,
    tags=("exists", "not-exists", "agg", "topk"),
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (late = shipped > 60 days after order date): suppliers
    who were the SOLE late supplier on a multi-supplier finished order. The
    EXISTS/NOT-EXISTS pair decorrelates into one per-order aggregate —
    n_supp >= 2 (another supplier exists) and n_late_supp == 1 (no OTHER
    late supplier, given l1 itself is late) — instead of two extra
    fact-to-fact joins."""
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = table(spark, sf_dir, "lineitem")

    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    lo = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "l_suppkey", late.alias("is_late")
    )
    per_order = lo.groupBy(F.col("l_orderkey").alias("po_orderkey")).agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(F.when(F.col("is_late"), F.col("l_suppkey"))).alias("n_late_supp"),
    )
    asia_sup = (
        s.join(broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"), "left_semi")
        .select("s_suppkey", "s_name")
    )
    return (
        lo.filter(F.col("is_late"))
        .join(per_order, F.col("l_orderkey") == F.col("po_orderkey"))
        .filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
        .join(broadcast(asia_sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


@register(
    "q22_global_sales_opportunity",
    sql=f"""
    WITH avg_bal AS (
      SELECT AVG(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0
    )
    SELECT CAST(c.c_custkey % 10 AS INTEGER) AS cust_group,
           COUNT(*) AS numcust,
           {money.sql_money2("c.c_acctbal", money.CENTS)} AS totacctbal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.ab
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
    GROUP BY 1
    """,
    tags=("agg", "scalar-subquery", "anti"),
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar-average subquery (broadcast single row as a
    cross join) + NOT EXISTS anti-join — rich customers who never ordered."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("ab"))
    return (
        c.crossJoin(broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy((F.col("c_custkey") % 10).cast("int").alias("cust_group"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            money.sum_money2(F.col("c_acctbal"), money.CENTS).alias("totacctbal"),
        )
    )


@register(
    "orders_retention_cohort",
    sql="""
    WITH om AS (
      SELECT o_custkey,
             CAST(year(o_orderdate) * 12 + month(o_orderdate) AS INTEGER) AS ym
      FROM orders
    ),
    first_ym AS (SELECT o_custkey, MIN(ym) AS cohort_ym FROM om GROUP BY 1),
    k AS (
      SELECT DISTINCT om.o_custkey, f.cohort_ym, om.ym - f.cohort_ym AS months_out
      FROM om JOIN first_ym f USING (o_custkey)
      WHERE om.ym - f.cohort_ym <= 3
    )
    SELECT cohort_ym, CAST(months_out AS INTEGER) AS months_out,
           COUNT(*) AS n_customers
    FROM k
    GROUP BY 1, 2
    """,
    tags=("agg", "cohort", "retention"),
)
def orders_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: customers grouped by first-order month; for each
    cohort, how many come back with an order 0-3 months out. Month math is
    explicit integer year*12+month on BOTH engines — no months_between /
    date_diff semantics to drift cross-engine.

    Shape at scale: one shuffle on custkey for the first-order min, the
    month-key join reuses it, then a distinct + groupBy on the (cohort,
    offset) pair — cohort cardinality is months², so the final agg is
    dim-sized no matter the fact size."""
    o = table(spark, sf_dir, "orders").select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).cast("int").alias("ym"),
    )
    first = o.groupBy("o_custkey").agg(F.min("ym").alias("cohort_ym"))
    k = (
        o.join(first, "o_custkey")
        .withColumn("months_out", F.col("ym") - F.col("cohort_ym"))
        .filter(F.col("months_out") <= 3)
        .select("o_custkey", "cohort_ym", "months_out")
        .distinct()
    )
    return k.groupBy("cohort_ym", F.col("months_out").cast("int").alias("months_out")).agg(
        F.count(F.lit(1)).alias("n_customers")
    )


@register(
    "window_range_frame_trailing_spend",
    sql="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18, 6))) OVER (
             PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
             RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS trailing_30d_spend
    FROM orders
    """,
    tags=("window", "range-frame"),
)
def window_range_frame_trailing_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-framed window (value-based, not row-based): per customer, the
    trailing-30-day spend at each order — same-timestamp orders fall in one
    frame regardless of row order, which is what makes the result
    deterministic without an orderkey tiebreak (and what ROWS frames cannot
    express). Spend sums in exact decimal before the double cast. One
    shuffle on o_custkey."""
    o = table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.unix_timestamp("o_orderdate").alias("ts_s"),
        F.col("o_totalprice").cast("decimal(18,6)").alias("price_dec"),
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("ts_s")
        .rangeBetween(-30 * 86400, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum("price_dec").over(w).cast("double").alias("trailing_30d_spend"),
    )


@register(
    "agg_grouping_sets_revenue",
    sql="""
    SELECT COALESCE(l_returnflag, 'ALL') AS ret_flag,
           COALESCE(l_linestatus, 'ALL') AS line_status,
           COUNT(*) AS n_lines,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18, 6))), 2) AS DOUBLE)
             AS revenue
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    -- no-op on real data; drops the ANSI grand-total-on-empty-input row so
    -- the oracle matches Spark's grouping-sets (empty relation -> empty output)
    HAVING COUNT(*) > 0
    """,
    tags=("agg", "grouping-sets"),
)
def agg_grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the shape ROLLUP/CUBE can't always express
    (an arbitrary subset of grouping combinations, here exactly the rollup
    lattice minus nothing, chosen explicitly). Spark evaluates all sets in
    ONE Expand+Aggregate pass over the scan — not one scan per set."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus",
        F.col("l_extendedprice").cast("decimal(18,6)").alias("price_dec"),
    )
    li.createOrReplaceTempView("_gs_lineitem")
    return spark.sql("""
        SELECT COALESCE(l_returnflag, 'ALL') AS ret_flag,
               COALESCE(l_linestatus, 'ALL') AS line_status,
               COUNT(*) AS n_lines,
               CAST(ROUND(SUM(price_dec), 2) AS DOUBLE) AS revenue
        FROM _gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """)


@register(
    "events_transition_bigrams",
    sql="""
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY epoch_us(ts), event_id) AS next_type
      FROM events
    )
    SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS n_transitions
    FROM seq
    WHERE next_type IS NOT NULL
    GROUP BY 1, 2
    """,
    tags=("events", "window", "sequence"),
)
def events_transition_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type transition counts (behavioral bigram model —
    the Markov-chain input for path/dropout analysis). lead() over the
    user's time-ordered stream, then a global bigram count: one shuffle on
    user_id for the window, one dim-sized agg on (from, to)."""
    e = table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("tus"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    seq = e.withColumn("next_type", F.lead("event_type").over(w))
    return (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy(F.col("event_type").alias("from_type"), F.col("next_type").alias("to_type"))
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


@register(
    "agg_price_histogram",
    sql="""
    WITH b AS (
      SELECT CAST(FLOOR(o_totalprice / 25000.0) AS INTEGER) AS bucket
      FROM orders
    )
    SELECT bucket,
           CAST(ROUND((bucket + 1) * 25000.0, 2) AS DOUBLE) AS bucket_hi,
           COUNT(*) AS n_orders
    FROM b GROUP BY bucket
    """,
    tags=("agg", "histogram"),
)
def agg_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram (25k bins) — the profiling primitive for
    choosing salting thresholds and partition splits. Bucketing is explicit
    floor division (identical IEEE arithmetic on both engines; DuckDB here
    ships no width_bucket). One partial-agg shuffle over ~26 buckets
    regardless of fact size."""
    o = table(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / 25000.0)
    return (
        o.select(bucket.cast("int").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .select(
            "bucket",
            F.round((F.col("bucket") + 1) * 25000.0, 2).cast("double").alias("bucket_hi"),
            "n_orders",
        )
    )


@register(
    "basket_brand_lift",
    sql="""
    WITH ob AS (  -- distinct brands per order
      SELECT DISTINCT l.l_orderkey, p.p_brand
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM ob),
    bf AS (SELECT p_brand, COUNT(*) AS n FROM ob GROUP BY 1),
    pairs AS (
      SELECT a.p_brand AS brand_a, b.p_brand AS brand_b, COUNT(*) AS n_both
      FROM ob a JOIN ob b ON a.l_orderkey = b.l_orderkey
                         AND a.p_brand < b.p_brand
      GROUP BY 1, 2
    )
    SELECT pr.brand_a, pr.brand_b, pr.n_both,
           ROUND((CAST(pr.n_both AS DOUBLE) / n.n_orders)
                 / ((CAST(fa.n AS DOUBLE) / n.n_orders)
                    * (CAST(fb.n AS DOUBLE) / n.n_orders)), 4) AS lift
    FROM pairs pr
    JOIN bf fa ON fa.p_brand = pr.brand_a
    JOIN bf fb ON fb.p_brand = pr.brand_b
    CROSS JOIN n
    WHERE pr.n_both >= 5
    """,
    tags=("basket", "join", "agg"),
)
def basket_brand_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence with lift: brand pairs appearing in the
    same order, scored by P(a,b)/(P(a)P(b)) — the association-rule primitive.

    Scale shape: the pair explosion is a SELF-JOIN ON THE ORDER KEY, so it
    is bounded by Σ_order (brands-per-order choose 2) — basket size, never
    catalog size. Brand frequencies and the order count are dim-sized
    broadcast sides; n_both >= 5 prunes the noise tail before the lift
    arithmetic."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    ob = (
        li.join(broadcast(p), li.l_partkey == p.p_partkey)
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    n = ob.agg(F.count_distinct("l_orderkey").alias("n_orders"))
    bf = ob.groupBy("p_brand").agg(F.count(F.lit(1)).alias("n"))
    a = ob.select(F.col("l_orderkey"), F.col("p_brand").alias("brand_a"))
    b = ob.select(F.col("l_orderkey"), F.col("p_brand").alias("brand_b"))
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("brand_a") < F.col("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
        .filter(F.col("n_both") >= 5)
    )
    fa = bf.select(F.col("p_brand").alias("brand_a"), F.col("n").alias("na"))
    fb = bf.select(F.col("p_brand").alias("brand_b"), F.col("n").alias("nb"))
    lift = (F.col("n_both").cast("double") / F.col("n_orders")) / (
        (F.col("na").cast("double") / F.col("n_orders"))
        * (F.col("nb").cast("double") / F.col("n_orders"))
    )
    return (
        pairs.join(broadcast(fa), "brand_a")
        .join(broadcast(fb), "brand_b")
        .crossJoin(broadcast(n))
        .select("brand_a", "brand_b", "n_both", F.round(lift, 4).alias("lift"))
    )


# --------------------------------------------------------------------------
# UNPIVOT (wide → long measure rotation)
# --------------------------------------------------------------------------


@register(
    "unpivot_lineitem_measures",
    sql="""
    WITH long AS (
      SELECT measure, value FROM (
        SELECT l_quantity, l_extendedprice, l_discount, l_tax FROM lineitem
      ) UNPIVOT (value FOR measure IN (l_quantity, l_extendedprice, l_discount, l_tax))
    )
    SELECT measure,
           CAST(COUNT(*) AS BIGINT) AS n_values,
           ROUND(MIN(value), 4) AS min_value,
           ROUND(MAX(value), 4) AS max_value,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_value
    FROM long GROUP BY measure
    """,
    tags=("relational", "unpivot", "reshape"),
)
def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT: rotate the four lineitem measure columns into (measure,
    value) rows, then profile each measure — the wide→long reshape that
    feeds any per-metric pipeline (R2's melt as a first-class relational
    operator, here via Spark's `stack`, DuckDB's native UNPIVOT).

    stack() is a pure per-row generator (no shuffle; the groupBy after it
    is 4 keys with map-side partials); the sum is decimal-exact before the
    final rounded double."""
    li = table(spark, sf_dir, "lineitem")
    long = li.select(
        F.expr(
            "stack(4, 'l_quantity', l_quantity, 'l_extendedprice', l_extendedprice,"
            " 'l_discount', l_discount, 'l_tax', l_tax) AS (measure, value)"
        )
    )
    return long.groupBy("measure").agg(
        F.count(F.lit(1)).alias("n_values"),
        F.round(F.min("value"), 4).alias("min_value"),
        F.round(F.max("value"), 4).alias("max_value"),
        F.round(F.sum(F.col("value").cast("decimal(18,4)")).cast("double"), 2).alias("sum_value"),
    )


# --------------------------------------------------------------------------
# incremental rollup maintenance (merge(state, delta) ≡ recompute)
# --------------------------------------------------------------------------

_INCR_CUTOFF = "1997-06-01"


@register(
    "incremental_rollup_merge",
    sql=f"""
    SELECT strftime(date_trunc('month', l_shipdate), '%Y-%m') AS ship_month,
           l_returnflag AS flag,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE), 2)
             AS revenue
    FROM lineitem
    GROUP BY 1, 2
    """,
    tags=("relational", "incremental", "materialized-view"),
)
def incremental_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: a monthly revenue rollup
    is kept as a STATE table of mergeable partials (count, exact decimal
    sum); a new delta batch (shipdate ≥ {_INCR_CUTOFF}) is aggregated to the
    same partial shape, unioned with the state, and merge-aggregated.

    THE ORACLE IS THE FULL RECOMPUTE — the single-pass DuckDB aggregate
    over all rows — so a green row is a cross-engine proof that
    merge(state, delta) ≡ recompute. That identity is exactly why the
    partials must be decimal (a double partial-sum would drift per merge
    order) and is the contract every incremental pipeline / streaming
    state store relies on.

    Scale: each side aggregates map-side before the union; the merge
    groupBy shuffles |months × flags| partial rows, not facts. At 100 TB
    the state table is read from storage instead of rebuilt — the plan
    from the union onward is unchanged."""
    li = table(spark, sf_dir, "lineitem").select(
        F.date_format(F.date_trunc("month", "l_shipdate"), "yyyy-MM").alias("ship_month"),
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").cast("decimal(18,4)").alias("price_dec"),
        F.col("l_shipdate").alias("sd"),
    )
    cutoff = F.lit(_INCR_CUTOFF).cast("timestamp")

    def partials(df):
        return df.groupBy("ship_month", "flag").agg(
            F.count(F.lit(1)).alias("pn"), F.sum("price_dec").alias("psum")
        )

    state = partials(li.filter(F.col("sd") < cutoff))  # yesterday's MV state
    delta = partials(li.filter(F.col("sd") >= cutoff))  # today's new batch
    return (
        state.unionAll(delta)
        .groupBy("ship_month", "flag")
        .agg(F.sum("pn").alias("n_items"), F.sum("psum").alias("rsum"))
        .select(
            "ship_month",
            "flag",
            F.col("n_items").cast("bigint").alias("n_items"),
            F.round(F.col("rsum").cast("double"), 2).alias("revenue"),
        )
    )


# --------------------------------------------------------------------------
# correlated LATERAL join (per-row dependent subquery)
# --------------------------------------------------------------------------


@register(
    "join_lateral_topk_orders",
    sql="""
    WITH top_cust AS (
      SELECT c_custkey, c_acctbal FROM customer
      ORDER BY c_acctbal DESC, c_custkey LIMIT 10
    )
    SELECT c.c_custkey AS custkey,
           ROUND(c.c_acctbal, 2) AS acctbal,
           l.o_orderkey AS orderkey,
           ROUND(l.o_totalprice, 2) AS total_price
    FROM top_cust c,
         LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) l
    """,
    tags=("relational", "lateral", "join"),
)
def join_lateral_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL join: for each of the 10 highest-balance
    customers, their top-2 orders by price — the per-row dependent
    subquery surface (SQL:1999 LATERAL), exercised through spark.sql so
    Catalyst's decorrelation machinery (rewrite to ranked join) is what
    runs, not a hand-written window. The window formulation exists
    elsewhere (window_topk_orders_per_customer); agreement between the
    two pins the decorrelation as semantics-preserving.

    Plan: Catalyst decorrelates the LIMIT-ed lateral into a partitioned
    rank over a broadcast-joined order subset — no per-row re-execution;
    at scale this is one keyed shuffle, identical economics to the
    explicit window form."""
    table(spark, sf_dir, "customer").createOrReplaceTempView("__lat_customer")
    table(spark, sf_dir, "orders").createOrReplaceTempView("__lat_orders")
    return spark.sql("""
        WITH top_cust AS (
          SELECT c_custkey, c_acctbal FROM __lat_customer
          ORDER BY c_acctbal DESC, c_custkey LIMIT 10
        )
        SELECT c.c_custkey AS custkey,
               ROUND(c.c_acctbal, 2) AS acctbal,
               l.o_orderkey AS orderkey,
               ROUND(l.o_totalprice, 2) AS total_price
        FROM top_cust c,
             LATERAL (SELECT o_orderkey, o_totalprice FROM __lat_orders o
                      WHERE o.o_custkey = c.c_custkey
                      ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) l
    """)


# --------------------------------------------------------------------------
# distribution window functions (percent_rank / cume_dist / nth_value)
# --------------------------------------------------------------------------


@register(
    "window_distribution_ranks",
    sql="""
    SELECT o_orderkey, o_orderpriority,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6)    AS cum_dist,
           NTH_VALUE(o_orderkey, 3) OVER w AS third_key
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY ROUND(o_totalprice, 2) DESC, o_orderkey)
    """,
    tags=("window", "distribution"),
)
def window_distribution_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The distribution window-function trio over one shared window spec:
    percent_rank (relative rank in [0,1]), cume_dist, and nth_value under
    the ANSI default frame (nth_value is NULL until the 3rd row of each
    partition — identical frame semantics on both engines). The order key
    is the rounded price with the unique o_orderkey tiebreak, so ranks and
    the running frame are a total order and both engines compute the same
    exact rationals (k/(n-1), k/n) before the 6-decimal round. One
    exchange serves all three functions."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.round("o_totalprice", 2).desc(), F.col("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cum_dist"),
        F.nth_value("o_orderkey", 3).over(w).alias("third_key"),
    )


# --------------------------------------------------------------------------
# closed-form OLS trend per group (decimal-stabilized)
# --------------------------------------------------------------------------


@register(
    "orders_linreg_by_priority",
    sql="""
    WITH t AS (
      SELECT o_orderpriority AS priority,
             CAST(DATEDIFF('day', DATE '1992-01-01', o_orderdate) AS DECIMAL(18,4)) AS x,
             CAST(o_totalprice AS DECIMAL(18,4)) AS y
      FROM orders
    ),
    s AS (
      SELECT priority, CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(x * y) AS DOUBLE) AS sxy, CAST(SUM(x * x) AS DOUBLE) AS sxx
      FROM t GROUP BY priority
    )
    SELECT priority, CAST(n AS BIGINT) AS n_orders,
           CASE WHEN n * sxx - sx * sx > 0 THEN
             ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
           END AS slope_per_day,
           CASE WHEN n * sxx - sx * sx > 0 THEN
             ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 2)
           END AS intercept
    FROM s
    """,
    tags=("regression", "statistics", "decimal-stabilized"),
)
def orders_linreg_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordinary-least-squares price trend per order priority — the
    closed-form regression every monitoring dashboard computes (is spend
    drifting per segment?), as pure aggregates: slope and intercept from
    the four moment sums over (days-since-epoch, total price).

    Same determinism contract as profile_numeric_correlations: moments are
    EXACT decimal sums (x and y cast to DECIMAL(18,4); products and sums
    never round), only the final slope/intercept formula runs in double as
    the same expression tree over bit-identical inputs on both engines.
    Degenerate groups (zero x-variance) yield NULL, guarded identically.
    One partial-aggregated groupBy — regression at 100 TB costs exactly
    one scan plus a 5-row reduce."""
    o = table(spark, sf_dir, "orders")
    t = o.select(
        F.col("o_orderpriority").alias("priority"),
        F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date"))
        .cast("decimal(18,4)")
        .alias("x"),
        F.col("o_totalprice").cast("decimal(18,4)").alias("y"),
    )
    s = t.groupBy("priority").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
    )
    var_x = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / var_x
    return s.select(
        "priority",
        F.col("n").cast("bigint").alias("n_orders"),
        F.when(var_x > 0, F.round(slope, 6)).alias("slope_per_day"),
        F.when(var_x > 0, F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 2)).alias(
            "intercept"
        ),
    )


# --------------------------------------------------------------------------
# ABC / Pareto cumulative-share classification
# --------------------------------------------------------------------------


@register(
    "pareto_abc_parts",
    sql="""
    WITH rev AS (
      SELECT l_partkey,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS revenue
      FROM lineitem GROUP BY l_partkey
    ),
    tot AS (SELECT CAST(SUM(revenue) AS DECIMAL(38,4)) AS total FROM rev),
    ranked AS (
      SELECT l_partkey, revenue,
             SUM(revenue) OVER (ORDER BY revenue DESC, l_partkey) AS cum_rev
      FROM rev
    )
    SELECT abc_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(ROUND(SUM(revenue), 2) AS DOUBLE) AS class_revenue
    FROM (
      SELECT l_partkey, revenue,
             -- integer cross-multiplication: cum*100 <= total*80 etc. keeps
             -- the class boundary exact decimal, no double division
             CASE WHEN cum_rev * 100 <= t.total * 80 THEN 'A'
                  WHEN cum_rev * 100 <= t.total * 95 THEN 'B'
                  ELSE 'C' END AS abc_class
      FROM ranked CROSS JOIN tot t
    )
    GROUP BY abc_class
    """,
    tags=("window", "pareto", "analytics"),
)
def pareto_abc_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto) classification of parts by revenue share: parts covering
    the first 80% of cumulative revenue are class A, the next 15% B, the
    tail C — the inventory-analytics classic, and the same cumulative-mass
    shape a data-curation budget uses (cf. select_top_mass_per_source).

    Determinism: revenues are exact decimal sums; the running total is a
    window over the total order (revenue DESC, partkey); class boundaries
    compare cum*100 <= total*k by exact decimal cross-multiplication — no
    double division anywhere before the final rounded class sums.

    Scale shape: one groupBy(partkey), then a global running sum. The
    ORDER BY window has no PARTITION BY, so Spark plans a single-partition
    window — correct and fine for the ~200k-part dimension here, while a
    100 TB fact table never enters the window (it was reduced by the
    groupBy first); for a billion-key dimension the two-pass equivalent
    (partition-local cumsums + broadcast prefix offsets) replaces it."""
    li = table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).cast("decimal(38,4)").alias("revenue")
    )
    tot = rev.agg(F.sum("revenue").cast("decimal(38,4)").alias("total"))
    w = Window.orderBy(F.desc("revenue"), F.col("l_partkey"))
    ranked = rev.withColumn("cum_rev", F.sum("revenue").over(w))
    classed = ranked.crossJoin(F.broadcast(tot)).select(
        "revenue",
        F.when(F.col("cum_rev") * 100 <= F.col("total") * 80, F.lit("A"))
        .when(F.col("cum_rev") * 100 <= F.col("total") * 95, F.lit("B"))
        .otherwise(F.lit("C"))
        .alias("abc_class"),
    )
    return classed.groupBy("abc_class").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.round(F.sum("revenue"), 2).cast("double").alias("class_revenue"),
    )


# --------------------------------------------------------------------------
# CUBE with GROUPING() disambiguation — completes the grouping lattice trio
# --------------------------------------------------------------------------


@register(
    "agg_cube_flag_status",
    sql="""
    SELECT COALESCE(l_returnflag, 'ALL') AS ret_flag,
           COALESCE(l_linestatus, 'ALL') AS line_status,
           -- GROUPING() bits distinguish a grouped-out NULL from a data
           -- NULL — the standard disambiguator the COALESCE alone can't be
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INTEGER)
             AS grouping_id,
           COUNT(*) AS n_lines,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18, 4))), 2) AS DOUBLE)
             AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    -- no-op on real data; drops the ANSI grand-total-on-empty-input row so
    -- the oracle matches Spark's cube (empty relation -> empty output)
    HAVING COUNT(*) > 0
    """,
    tags=("agg", "cube", "grouping-id"),
)
def agg_cube_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full CUBE over (return flag, line status) — all four grouping-set
    combinations in ONE Expand+Aggregate pass — completing the grouping
    lattice trio beside ROLLUP (`agg_rollup_region_nation`) and explicit
    GROUPING SETS (`agg_grouping_sets_revenue`). grouping_id carries the
    GROUPING() bit vector, the standard way to tell a grouped-out NULL
    from a data NULL; Spark's grouping_id() and the composed GROUPING()
    bits agree by construction. Quantities sum in exact decimal before the
    single rounded double cast."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum(F.col("l_quantity").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("sum_qty"),
            F.grouping_id().cast("int").alias("grouping_id"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("ret_flag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("line_status"),
            "grouping_id",
            "n_lines",
            "sum_qty",
        )
    )


# --------------------------------------------------------------------------
# argmax/argmin aggregates (MAX_BY / MIN_BY) with a deterministic ordinal
# --------------------------------------------------------------------------


@register(
    "agg_argmax_orders",
    sql="""
    WITH t AS (
      SELECT o_orderpriority, o_orderkey,
             -- composite integer ordinal: cents then key — makes the argmax
             -- TOTAL (price ties broken by key), so MAX_BY/MIN_BY are
             -- deterministic on both engines; key slot holds to ~1e8 orders
             CAST(ROUND(o_totalprice * 100) AS BIGINT) * 100000000 + o_orderkey
               AS ord
      FROM orders
    )
    SELECT o_orderpriority,
           COUNT(*)                          AS n_orders,
           CAST(MAX_BY(o_orderkey, ord) AS BIGINT) AS max_price_orderkey,
           CAST(MIN_BY(o_orderkey, ord) AS BIGINT) AS min_price_orderkey,
           CAST(MAX(ord) AS BIGINT)          AS max_ord,
           CAST(MIN(ord) AS BIGINT)          AS min_ord
    FROM t GROUP BY o_orderpriority
    """,
    tags=("agg", "argmax", "max_by"),
)
def agg_argmax_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The argmax/argmin aggregate surface (MAX_BY / MIN_BY): per priority,
    which order carries the highest and lowest total price — the
    "which row won" question that otherwise costs a window + filter pass.

    MAX_BY is nondeterministic under ties, so the ordering value is a
    composite integer ordinal (price cents · 1e8 + order key): a TOTAL
    order, making the winning key unique and the aggregate reproducible
    on both engines under any partitioning. One partial-aggregated
    groupBy — argmax at 100 TB costs exactly one scan, no window, no
    self-join."""
    o = table(spark, sf_dir, "orders")
    t = o.select(
        "o_orderpriority",
        "o_orderkey",
        (
            F.round(F.col("o_totalprice") * 100).cast("bigint") * 100000000
            + F.col("o_orderkey")
        ).alias("ord"),
    )
    return t.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.max_by("o_orderkey", "ord").cast("bigint").alias("max_price_orderkey"),
        F.min_by("o_orderkey", "ord").cast("bigint").alias("min_price_orderkey"),
        F.max("ord").alias("max_ord"),
        F.min("ord").alias("min_ord"),
    )


# --------------------------------------------------------------------------
# Apriori-style directional association rules at part level
# --------------------------------------------------------------------------

_AR_MINPAIR = 3  # minimum pair support (absolute orders)
_AR_TOPN = 40


@register(
    "basket_association_rules",
    sql=f"""
    WITH op AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    n AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
                 CAST(COUNT(*) AS BIGINT) AS n_rows,
                 CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts FROM op),
    pf AS (  -- mean-relative frequent prune: cnt >= corpus mean support
      SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM op GROUP BY 1
      HAVING COUNT(*) * (SELECT n_parts FROM n) >= (SELECT n_rows FROM n)
    ),
    fop AS (SELECT op.* FROM op JOIN pf USING (l_partkey)),
    pairs AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb,
             CAST(COUNT(*) AS BIGINT) AS n_both
      FROM fop a JOIN fop b ON a.l_orderkey = b.l_orderkey
                           AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING COUNT(*) >= {_AR_MINPAIR}
    ),
    rules AS (
      SELECT pa AS ante_part, pb AS cons_part, n_both FROM pairs
      UNION ALL
      SELECT pb, pa, n_both FROM pairs
    )
    SELECT r.ante_part, r.cons_part,
           fa.cnt AS n_ante, fb.cnt AS n_cons, r.n_both,
           CAST(r.n_both * 1000000 // n.n_orders AS BIGINT) AS supp_ppm,
           CAST(r.n_both * 1000000 // fa.cnt AS BIGINT) AS conf_ppm,
           CAST(r.n_both * n.n_orders * 1000000 // (fa.cnt * fb.cnt) AS BIGINT)
             AS lift_ppm
    FROM rules r
    JOIN pf fa ON fa.l_partkey = r.ante_part
    JOIN pf fb ON fb.l_partkey = r.cons_part
    CROSS JOIN n
    ORDER BY lift_ppm DESC, conf_ppm DESC, ante_part, cons_part
    LIMIT {_AR_TOPN}
    """,
    tags=("basket", "association", "apriori"),
)
def basket_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional association rules A→B over part baskets with the
    Apriori support discipline: parts below the corpus MEAN support are
    pruned BEFORE pair generation (the monotonicity bound — no pair can
    beat the support of its rarest member; mean-relative, so the prune
    keeps a stable candidate fraction as catalog and order count grow
    together, where a fixed order-share floor empties it), pairs below
    {_AR_MINPAIR} co-orders are dropped, and each surviving pair yields both rule directions with
    support/confidence/lift. Complements basket_brand_lift (symmetric,
    brand-level): rules are per-PART and directional, the actual
    recommender/planogram primitive.

    Integer discipline: supp/conf/lift are ppm floor divisions over exact
    BIGINT counts (lift sound while n_both·n_orders·1e6 < 2^63); the
    top-{_AR_TOPN} carries a total order (lift, conf, part ids) so both
    engines cut the same rows.

    Scale: the pair space is Σ_order (frequent-parts-per-order choose 2)
    — basket-bounded, never catalog²; the frequent-part table is a
    broadcastable dim; the global top-{_AR_TOPN} compiles to
    TakeOrderedAndProject (per-partition cut, no global sort)."""
    op = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    n = op.agg(
        F.count_distinct("l_orderkey").cast("bigint").alias("n_orders"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.count_distinct("l_partkey").cast("bigint").alias("n_parts"),
    )
    pf = (
        op.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .crossJoin(F.broadcast(n))
        .filter(F.col("cnt") * F.col("n_parts") >= F.col("n_rows"))
        .select("l_partkey", "cnt")
    )
    fop = op.join(F.broadcast(pf.select("l_partkey")), "l_partkey").select(
        "l_orderkey", "l_partkey"
    )
    a = fop.select("l_orderkey", F.col("l_partkey").alias("pa"))
    b = fop.select("l_orderkey", F.col("l_partkey").alias("pb"))
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_both"))
        .filter(F.col("n_both") >= _AR_MINPAIR)
    )
    rules = pairs.select(
        F.col("pa").alias("ante_part"), F.col("pb").alias("cons_part"), "n_both"
    ).unionAll(
        pairs.select(
            F.col("pb").alias("ante_part"), F.col("pa").alias("cons_part"), "n_both"
        )
    )
    fa = pf.select(F.col("l_partkey").alias("ante_part"), F.col("cnt").alias("n_ante"))
    fb = pf.select(F.col("l_partkey").alias("cons_part"), F.col("cnt").alias("n_cons"))
    return (
        rules.join(F.broadcast(fa), "ante_part")
        .join(F.broadcast(fb), "cons_part")
        .crossJoin(F.broadcast(n))
        .select(
            "ante_part",
            "cons_part",
            "n_ante",
            "n_cons",
            "n_both",
            F.expr("n_both * 1000000 div n_orders").cast("bigint").alias("supp_ppm"),
            F.expr("n_both * 1000000 div n_ante").cast("bigint").alias("conf_ppm"),
            F.expr("n_both * n_orders * 1000000 div (n_ante * n_cons)")
            .cast("bigint")
            .alias("lift_ppm"),
        )
        .orderBy(
            F.col("lift_ppm").desc(),
            F.col("conf_ppm").desc(),
            "ante_part",
            "cons_part",
        )
        .limit(_AR_TOPN)
    )
