"""Round-4 wave-3 relational surface: skyline (Pareto frontier), null-aware
NOT IN anti join, correlated scalar subqueries (Catalyst decorrelation), and
a bloom-style semi-join reduction.

These four close out classic analytic-SQL shapes the registry did not yet
exercise:

- ``skyline_parts_2d`` — the 2-D dominance skyline, computed in O(n log n)
  via a distinct-price reduction + running-max window instead of the
  textbook quadratic NOT EXISTS (which is kept as the oracle, so the two
  formulations cross-check each other).
- ``join_null_aware_not_in`` — ``NOT IN (subquery)`` over a column Catalyst
  cannot prove non-null. Spark must plan a null-aware anti join (a plain
  LeftAnti would be wrong the moment a NULL appears in the subquery); the
  pytest twin injects an actual NULL and asserts the empty-result semantics.
- ``subquery_correlated_scalar`` — scalar subqueries correlated on the outer
  row, in both WHERE and SELECT. Catalyst decorrelates them into one
  aggregate + join; the brand average is compared by integer
  cross-multiplication (price·n > Σprice) so no engine ever divides.
- ``join_bloom_semireduction`` — semi-join reduction: the probe side is
  pre-filtered by a broadcast set of hash buckets built from the dim side
  before the real join. False positives are removed by the join itself, so
  the result is bit-identical to the plain join (which is the oracle); the
  win is that at 100 TB the broadcast is bounded by the bucket-space size
  (``{_BLOOM_M}`` ints) no matter how wide or tall the build side is, and
  the big probe table is cut down BEFORE its shuffle.

Reference parity: the reference engine's join surface (PUMLE's catalog
lookup + membership filters) has no skyline/null-aware ops; these belong to
the LLM-pipeline extension surface the brief asks for (corpus curation
needs "best tradeoff" selection and never-matched audits at scale).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from pumle_spark.tables import table
from pumle_spark.workload import register

# bucket space for the semi-join reduction: caps the broadcast at 2^17
# distinct ints (~1 MiB serialized) regardless of build-side cardinality
_BLOOM_M = 1 << 17


# --------------------------------------------------------------------------
# 2-D skyline (Pareto frontier): minimize price, maximize size
# --------------------------------------------------------------------------


@register(
    "skyline_parts_2d",
    sql="""
    WITH t AS (
      SELECT p_partkey, p_brand,
             CAST(ROUND(p_retailprice * 100) AS BIGINT) AS price_cents,
             CAST(p_size AS INTEGER) AS p_size
      FROM part
    )
    SELECT p.p_partkey, p.p_brand, p.price_cents, p.p_size
    FROM t p
    WHERE NOT EXISTS (
      SELECT 1 FROM t q
      WHERE q.price_cents <= p.price_cents AND q.p_size >= p.p_size
        AND (q.price_cents < p.price_cents OR q.p_size > p.p_size)
    )
    ORDER BY p.price_cents, p.p_partkey
    """,
    tags=("skyline", "pareto", "window"),
)
def skyline_parts_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D dominance skyline over parts: the Pareto frontier of (price low,
    size high). A part is dominated iff some other part is no more
    expensive AND no smaller, with at least one strict. Equal (price, size)
    duplicates do not dominate each other — both survive.

    The oracle is the textbook quadratic NOT EXISTS; the Spark plan is the
    sort-sweep formulation: reduce to one row per distinct price (groupBy
    price → max size, a partial-aggregated shuffle of |distinct prices|
    rows), run ONE running-max window over that tiny relation (a price is
    on the frontier iff its max size strictly beats every strictly-cheaper
    price's), then broadcast the surviving (price, size) pairs back against
    the base table to recover all frontier rows. The only global sort
    touches the distinct-price relation — dimension-sized even when the
    fact side is 100 TB — and the fact table is scanned exactly twice with
    the second scan pruned by a broadcast join.
    """
    p = table(spark, sf_dir, "part").select(
        "p_partkey",
        "p_brand",
        F.round(F.col("p_retailprice") * 100).cast("bigint").alias("price_cents"),
        F.col("p_size").cast("int").alias("p_size"),
    )
    per_price = p.groupBy("price_cents").agg(F.max("p_size").alias("max_size"))
    # distinct prices: rows frame == range frame; strictly-cheaper = frame
    # ending 1 row before current
    w = Window.orderBy("price_cents").rowsBetween(Window.unboundedPreceding, -1)
    frontier = (
        per_price.withColumn("best_cheaper", F.max("max_size").over(w))
        .filter(F.col("best_cheaper").isNull() | (F.col("best_cheaper") < F.col("max_size")))
        .select("price_cents", F.col("max_size").alias("p_size"))
    )
    return (
        p.join(F.broadcast(frontier), ["price_cents", "p_size"])
        .select("p_partkey", "p_brand", "price_cents", "p_size")
        .orderBy("price_cents", "p_partkey")
    )


# --------------------------------------------------------------------------
# null-aware NOT IN anti join
# --------------------------------------------------------------------------

_NOT_IN_SQL = """
    SELECT p_brand,
           COUNT(*) AS n_parts,
           CAST(MIN(p_partkey) AS BIGINT) AS min_partkey,
           ROUND(MAX(p_retailprice), 2) AS max_price
    FROM part
    WHERE p_partkey NOT IN (
      SELECT NULLIF(l_partkey, -1) FROM lineitem WHERE l_quantity >= 49
    )
    GROUP BY p_brand
    ORDER BY p_brand
"""


@register(
    "join_null_aware_not_in",
    sql=_NOT_IN_SQL,
    tags=("join", "anti", "null-aware", "subquery"),
)
def join_null_aware_not_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts never shipped in a high-quantity (>= 49) line, per brand — via
    ``NOT IN (subquery)`` whose inner column is wrapped in NULLIF so
    Catalyst cannot prove it non-null. A plain LeftAnti would be WRONG
    here: three-valued logic says one NULL in the subquery empties the
    whole result (x NOT IN {..., NULL} is never TRUE). Spark therefore
    plans its null-aware anti join (single-column NAAJ, broadcast-only);
    the pytest twin injects a real NULL and asserts the empty result.

    NULLIF(l_partkey, -1) never actually fires on this data (keys are
    positive), so the query also has a meaningful non-empty answer the
    oracle hash-checks. Aggregates are MIN/MAX/COUNT — no double summation,
    nothing to stabilize. At scale the subquery's distinct-key set is what
    gets broadcast; NAAJ requires that anyway, and the distinct high-
    quantity partkey set is bounded by |part|, not |lineitem|.

    Ref: the reference's staging discovery does anti-join semantics on
    catalog keys (catalog.py); this is the null-aware SQL-surface twin.
    """
    table(spark, sf_dir, "part").createOrReplaceTempView("__naaj_part")
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("__naaj_lineitem")
    return spark.sql(
        _NOT_IN_SQL.replace("FROM part", "FROM __naaj_part").replace(
            "FROM lineitem", "FROM __naaj_lineitem"
        )
    )


# --------------------------------------------------------------------------
# correlated scalar subqueries (Catalyst decorrelation)
# --------------------------------------------------------------------------

_CORR_SQL = """
    WITH t AS (
      SELECT p_partkey, p_brand,
             CAST(ROUND(p_retailprice * 100) AS BIGINT) AS price_cents
      FROM part
    )
    SELECT p.p_partkey, p.p_brand, p.price_cents,
           CAST((SELECT COUNT(*) FROM t q WHERE q.p_brand = p.p_brand)
                AS BIGINT) AS n_brand,
           CAST(p.price_cents
                  * (SELECT COUNT(*) FROM t q WHERE q.p_brand = p.p_brand)
                - (SELECT CAST(SUM(q.price_cents) AS BIGINT) FROM t q
                   WHERE q.p_brand = p.p_brand)
                AS BIGINT) AS over_avg_scaled
    FROM t p
    WHERE p.price_cents
            * (SELECT COUNT(*) FROM t q WHERE q.p_brand = p.p_brand)
          > (SELECT CAST(SUM(q.price_cents) AS BIGINT) FROM t q
             WHERE q.p_brand = p.p_brand)
    ORDER BY p.p_partkey
"""


@register(
    "subquery_correlated_scalar",
    sql=_CORR_SQL,
    tags=("subquery", "correlated", "decorrelation"),
)
def subquery_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts priced above their brand average, written with correlated
    scalar subqueries in both WHERE and SELECT — the SQL shape users write
    and Catalyst must decorrelate (RewriteCorrelatedScalarSubquery turns
    each occurrence into a brand-level aggregate joined back by
    broadcast). Measured reality, pinned by test_plans: Spark 4 does NOT
    merge the identical subtrees — five occurrences mean five aggregate
    scans — so the pytest twin also pins the hand-decorrelated
    single-scan groupBy+join form; the semantic win of decorrelation is
    the broadcast join instead of per-row subquery execution, not
    common-subexpression elimination.

    No engine ever divides: "above average" is the integer cross-multiply
    price·n > Σprice in cents (BIGINT-safe to ~1e10 rows per brand at 2e5
    cents), and the reported margin is the same scaled integer — exact on
    both engines under any partitioning. DuckDB's SUM(BIGINT) widens to
    HUGEINT, so the inner SUM is cast back to BIGINT *inside* the subquery
    (the r03 lesson, enforced statically by test_oracle_types).

    Scale: after decorrelation this is one partial-aggregated groupBy on
    p_brand (bounded cardinality → broadcastable) + one broadcast join —
    the fact table is scanned once.
    """
    table(spark, sf_dir, "part").createOrReplaceTempView("__corr_part")
    return spark.sql(_CORR_SQL.replace("FROM part", "FROM __corr_part"))


# --------------------------------------------------------------------------
# bloom-style semi-join reduction
# --------------------------------------------------------------------------


@register(
    "join_bloom_semireduction",
    sql="""
    SELECT l.l_returnflag, l.l_linestatus,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100)
                         AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderpriority = '1-URGENT'
    GROUP BY l.l_returnflag, l.l_linestatus
    ORDER BY l.l_returnflag, l.l_linestatus
    """,
    tags=("join", "bloom", "semi-join-reduction"),
)
def join_bloom_semireduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Urgent-order revenue by return flag / line status, executed with an
    explicit semi-join reduction: the build side's join keys are hashed
    into {_BLOOM_M} buckets, the distinct-bucket set (a degenerate-width
    bloom filter with k=1 and exact membership per bucket) is broadcast,
    and the probe side is left-semi filtered on bucket membership BEFORE
    the real join. Bucket collisions only let extra rows through — the
    subsequent equi-join removes them — so the result is bit-identical to
    the plain join, which is exactly what the oracle computes.

    Why at 100 TB: when the filtered dim is too big to broadcast as rows,
    the reduction still broadcasts — the bucket set is capped at
    {_BLOOM_M} ints no matter the build cardinality — and the 100 TB probe
    table sheds its non-matching rows before paying the shuffle for the
    real join. This is the manual, plan-visible twin of Spark's runtime
    bloom-filter join (spark.sql.optimizer.runtime.bloomFilter.*), with
    xxhash64 free to be engine-private because the filter never affects
    results. Revenue is summed in exact integer cents (each term rounded
    once, same expression both engines).
    """
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    keys = o.select("o_orderkey")
    bucket_set = keys.select(
        F.pmod(F.xxhash64("o_orderkey"), F.lit(_BLOOM_M)).alias("b")
    ).distinct()
    li = table(spark, sf_dir, "lineitem")
    pruned = li.join(
        F.broadcast(bucket_set),
        F.pmod(F.xxhash64("l_orderkey"), F.lit(_BLOOM_M)) == F.col("b"),
        "left_semi",
    )
    return (
        pruned.join(keys.withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
                    "bigint"
                )
            )
            .cast("bigint")
            .alias("revenue_cents"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# conformed activity timeline (cross-domain union of orders + events)
# --------------------------------------------------------------------------


@register(
    "activity_timeline_union",
    sql="""
    WITH acts AS (
      SELECT date_trunc('month', o_orderdate) AS mon, 'order' AS kind,
             o_custkey AS actor_id,
             CAST(ROUND(o_totalprice * 1000000) AS BIGINT) AS value_micro
      FROM orders
      UNION ALL
      SELECT date_trunc('month', ts) AS mon, event_type AS kind,
             user_id AS actor_id,
             CAST(ROUND(value * 1000000) AS BIGINT) AS value_micro
      FROM events
    )
    SELECT CAST(mon AS DATE) AS mon, kind,
           CAST(COUNT(*) AS BIGINT) AS n_acts,
           CAST(COUNT(DISTINCT actor_id) AS BIGINT) AS n_actors,
           CAST(SUM(value_micro) AS BIGINT) AS value_micro
    FROM acts
    GROUP BY 1, 2
    ORDER BY mon, kind
    """,
    tags=("relational", "union", "conformed"),
)
def activity_timeline_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conformed cross-domain activity timeline: the transactional table
    (orders) and the behavioral stream (events) harmonized into one
    (month, kind, actor, value) schema — value normalized to micro-units
    on both branches — then rolled up per month and activity kind. The
    schema-conforming UNION every warehouse's unified-activity model
    ("one table of everything the user did") is built from.

    Exactness: both branches quantize value to integer micro-units per
    row before the union; counts and sums are exact integers.

    Scale shape: each branch is a pushed-down projection (three columns
    survive the scan); the union is free (no shuffle); one
    (month, kind)-keyed aggregation with map-side partials carries the
    exact distinct-actor state per small group. Nanosecond event
    timestamps truncate to months inside the scan projection."""
    o = table(spark, sf_dir, "orders").select(
        F.date_trunc("month", F.col("o_orderdate")).alias("mon"),
        F.lit("order").alias("kind"),
        F.col("o_custkey").alias("actor_id"),
        F.round(F.col("o_totalprice") * 1_000_000).cast("bigint").alias("value_micro"),
    )
    e = table(spark, sf_dir, "events").select(
        F.date_trunc("month", F.col("ts")).alias("mon"),
        F.col("event_type").alias("kind"),
        F.col("user_id").alias("actor_id"),
        F.round(F.col("value") * 1_000_000).cast("bigint").alias("value_micro"),
    )
    return (
        o.unionAll(e)
        .groupBy("mon", "kind")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_acts"),
            F.countDistinct("actor_id").cast("bigint").alias("n_actors"),
            F.sum("value_micro").cast("bigint").alias("value_micro"),
        )
        .select(
            F.col("mon").cast("date").alias("mon"),
            "kind",
            "n_acts",
            "n_actors",
            "value_micro",
        )
        .orderBy("mon", "kind")
    )


# --------------------------------------------------------------------------
# relational division (the "for all" join)
# --------------------------------------------------------------------------

_DIV_FROM, _DIV_TO = "1997-02-01", "1997-04-01"


@register(
    "join_relational_division",
    sql=f"""
    WITH need AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_need FROM region),
    cov AS (
      SELECT l.l_suppkey,
             COUNT(DISTINCT n.n_regionkey) AS n_regions,
             CAST(COUNT(*) AS BIGINT) AS n_lines
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      WHERE l.l_shipdate >= DATE '{_DIV_FROM}' AND l.l_shipdate < DATE '{_DIV_TO}'
      GROUP BY l.l_suppkey
    )
    SELECT CAST(l_suppkey AS BIGINT) AS suppkey,
           CAST(n_regions AS BIGINT) AS n_regions,
           n_lines
    FROM cov CROSS JOIN need
    WHERE n_regions = need.n_need
    ORDER BY suppkey
    """,
    tags=("relational", "division", "for-all"),
)
def join_relational_division(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational DIVISION — Codd's "for all" operator: suppliers whose
    {_DIV_FROM}..{_DIV_TO} shipments reached customers in EVERY region.
    SQL has no FOR ALL quantifier, so the classic double-NOT-EXISTS
    formulation is rewritten as the set-cover count test: a supplier
    divides the region set iff its DISTINCT covered-region count equals
    |region| — turning two correlated anti-joins into ONE keyed aggregate
    plus a broadcast scalar compare (the formulation that scales; nested
    NOT EXISTS plans as a correlated nested-loop anti-join).

    This closes the relational-algebra surface: selection, projection,
    joins of every flavor (inner/outer/semi/anti/theta/lateral/as-of),
    set ops, aggregation, and now division. The divisor is the fixed
    5-region dimension, so the operator stays non-degenerate at every
    scale factor; the date window keeps it discriminating (full-history
    coverage saturates).

    Scale: the region dimension broadcasts; the only wide shuffle is the
    per-supplier distinct-count; the ship-date predicate pushes to the
    lineitem scan."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    need = table(spark, sf_dir, "region").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_need")
    )
    cov = (
        li.filter(
            (F.col("l_shipdate") >= F.lit(_DIV_FROM).cast("date"))
            & (F.col("l_shipdate") < F.lit(_DIV_TO).cast("date"))
        )
        .join(o, o["o_orderkey"] == li["l_orderkey"])
        .join(c, c["c_custkey"] == o["o_custkey"])
        .join(F.broadcast(n), n["n_nationkey"] == c["c_nationkey"])
        .groupBy("l_suppkey")
        .agg(
            F.count_distinct("n_regionkey").alias("n_regions"),
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        )
    )
    return (
        cov.crossJoin(F.broadcast(need))
        .filter(F.col("n_regions") == F.col("n_need"))
        .select(
            F.col("l_suppkey").cast("bigint").alias("suppkey"),
            F.col("n_regions").cast("bigint").alias("n_regions"),
            "n_lines",
        )
        .orderBy("suppkey")
    )
