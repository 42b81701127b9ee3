"""Business/quality analytics operators: RFM segmentation, Benford's-law
digit audit, CUSUM changepoint detection.

Three more shapes a warehouse team migrating to this engine expects:

- ``orders_rfm_segments`` — recency/frequency/monetary quintile scoring,
  the canonical customer-segmentation rollup.
- ``audit_benford_totalprice`` — first-significant-digit distribution vs
  Benford's law with a chi-square score, the classic synthetic-data /
  fraud / ETL-corruption alarm (a generator or a unit bug shifts leading
  digits long before it shifts means).
- ``orders_cusum_changepoint`` — CUSUM upward-shift detection over the
  daily order-count series. The textbook CUSUM is a sequential recurrence
  s_t = max(0, s_{t-1} + x_t) — not a prefix sum — but it has a closed
  window form: s_t = P_t − min(0, min_{j≤t} P_j) where P is the plain
  prefix sum of deviations. That identity (s_t is the best partial sum
  ending at t) turns an "inherently sequential" statistic into two window
  passes over an already-aggregated daily series — exactly the kind of
  rewrite that keeps 100 TB pipelines out of applyInPandas.

Determinism: every statistic is built from exact integer counts; doubles
appear only inside single mirrored expressions (Benford's log10 terms,
summed under the repo-wide DECIMAL(28,9) contract). CUSUM never leaves
integers — deviations are scaled by n_days so the mean subtraction stays
exact (c − total/n becomes c·n − total).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from pumle_spark.tables import table
from pumle_spark.workload import register

_TERM_DEC = "decimal(28,9)"
_CUSUM_TOP = 20


# --------------------------------------------------------------------------
# RFM segmentation
# --------------------------------------------------------------------------


@register(
    "orders_rfm_segments",
    sql="""
    WITH mx AS (SELECT MAX(o_orderdate) AS maxd FROM orders),
    cust AS (
      SELECT o_custkey,
             DATE_DIFF('day', CAST(MAX(o_orderdate) AS DATE), CAST(mx.maxd AS DATE))
               AS recency_days,
             COUNT(*) AS freq,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS monetary_cents
      FROM orders CROSS JOIN mx GROUP BY o_custkey, mx.maxd
    ),
    scored AS (
      SELECT o_custkey, monetary_cents,
             CAST(NTILE(5) OVER (ORDER BY recency_days ASC, o_custkey) AS INTEGER)
               AS r_score,
             CAST(NTILE(5) OVER (ORDER BY freq DESC, o_custkey) AS INTEGER)
               AS f_score,
             CAST(NTILE(5) OVER (ORDER BY monetary_cents DESC, o_custkey) AS INTEGER)
               AS m_score
      FROM cust
    )
    SELECT r_score, f_score, m_score,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(MIN(o_custkey) AS BIGINT) AS min_custkey,
           CAST(SUM(monetary_cents) AS BIGINT) AS segment_cents
    FROM scored GROUP BY r_score, f_score, m_score
    ORDER BY r_score, f_score, m_score
    """,
    tags=("analytics", "rfm", "segmentation", "ntile"),
)
def orders_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: quintile scores for recency (days since
    last order, 1 = most recent), frequency (order count, 1 = most
    frequent) and monetary (lifetime cents, 1 = highest spend), rolled up
    to segment sizes — the marketing-warehouse workhorse.

    NTILE is made deterministic the same way agg_argmax_orders totalizes
    MAX_BY: every ordering carries o_custkey as the tie-breaker, so bucket
    boundaries are identical on both engines. Monetary is exact integer
    cents (one ROUND per order, summed as BIGINT).

    Scale: the per-customer rollup is one partial-aggregated groupBy of
    the fact table; the three NTILE windows then run over the CUSTOMER
    dimension (not the fact table) — a global sort each, but of
    dimension-sized data, and Spark's rangepartitioning keeps even that
    parallel. The final segment rollup is 125 rows.
    """
    o = table(spark, sf_dir, "orders")
    mx = o.agg(F.max("o_orderdate").alias("maxd"))
    cust = (
        o.crossJoin(F.broadcast(mx))
        .groupBy("o_custkey", "maxd")
        .agg(
            F.max("o_orderdate").alias("lastd"),
            F.count(F.lit(1)).alias("freq"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("monetary_cents"),
        )
        .select(
            "o_custkey",
            F.datediff(F.col("maxd").cast("date"), F.col("lastd").cast("date")).alias(
                "recency_days"
            ),
            "freq",
            "monetary_cents",
        )
    )
    scored = cust.select(
        "o_custkey",
        "monetary_cents",
        F.ntile(5)
        .over(Window.orderBy(F.asc("recency_days"), F.asc("o_custkey")))
        .cast("int")
        .alias("r_score"),
        F.ntile(5)
        .over(Window.orderBy(F.desc("freq"), F.asc("o_custkey")))
        .cast("int")
        .alias("f_score"),
        F.ntile(5)
        .over(Window.orderBy(F.desc("monetary_cents"), F.asc("o_custkey")))
        .cast("int")
        .alias("m_score"),
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.min("o_custkey").cast("bigint").alias("min_custkey"),
            F.sum("monetary_cents").cast("bigint").alias("segment_cents"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


# --------------------------------------------------------------------------
# Benford first-digit audit
# --------------------------------------------------------------------------


@register(
    "audit_benford_totalprice",
    sql="""
    WITH d AS (
      SELECT CAST(SUBSTRING(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                                 AS VARCHAR), 1, 1) AS INTEGER) AS digit
      FROM orders
    ),
    c AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_obs FROM d GROUP BY digit),
    t AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n FROM c),
    terms AS (
      SELECT digit, n_obs,
             CAST(n AS DOUBLE) * LOG10(1.0 + 1.0 / digit) AS e,
             (CAST(n_obs AS DOUBLE) - CAST(n AS DOUBLE) * LOG10(1.0 + 1.0 / digit))
               * (CAST(n_obs AS DOUBLE) - CAST(n AS DOUBLE) * LOG10(1.0 + 1.0 / digit))
               / (CAST(n AS DOUBLE) * LOG10(1.0 + 1.0 / digit)) AS term
      FROM c CROSS JOIN t
    )
    SELECT digit, n_obs,
           ROUND(e, 6) AS n_expected,
           ROUND(term, 9) AS chi2_term,
           ROUND(CAST(SUM(CAST(term AS DECIMAL(28,9))) OVER () AS DOUBLE), 6)
             AS chi2_total
    FROM terms
    ORDER BY digit
    """,
    tags=("analytics", "audit", "benford", "quality"),
)
def audit_benford_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law audit of order totals: the distribution of the first
    significant digit (of the integer cents value) against the expected
    log10(1 + 1/d), scored by chi-square. Natural multiplicative data
    follows Benford closely; uniform synthetic generators, unit mix-ups,
    and fabricated figures do not — which makes this the cheapest
    whole-table ETL-corruption alarm there is (one scan, nine rows out).

    Determinism: digits come from exact integer cents; each chi-square
    term is one mirrored double expression over (n_obs, n) and the total
    follows the DECIMAL(28,9) exact-sum contract, so the statistic is
    partition-count-invariant. The per-digit expected count and term are
    rounded independently of the total (never round a rounded value).

    Scale: map-side-combinable count per digit — nine groups — then a
    9-row window. Nothing else.
    """
    o = table(spark, sf_dir, "orders")
    d = o.select(
        F.substring(
            F.round(F.col("o_totalprice") * 100).cast("bigint").cast("string"), 1, 1
        )
        .cast("int")
        .alias("digit")
    )
    c = d.groupBy("digit").agg(F.count(F.lit(1)).cast("bigint").alias("n_obs"))
    t = c.agg(F.sum("n_obs").cast("bigint").alias("n"))
    e = F.col("n").cast("double") * F.log10(1.0 + 1.0 / F.col("digit"))
    terms = c.crossJoin(F.broadcast(t)).select(
        "digit",
        "n_obs",
        e.alias("e"),
        ((F.col("n_obs").cast("double") - e) * (F.col("n_obs").cast("double") - e) / e).alias(
            "term"
        ),
    )
    return terms.select(
        "digit",
        "n_obs",
        F.round(F.col("e"), 6).alias("n_expected"),
        F.round(F.col("term"), 9).alias("chi2_term"),
        F.round(
            F.sum(F.col("term").cast(_TERM_DEC))
            .over(Window.partitionBy(F.lit(1)))
            .cast("double"),
            6,
        ).alias("chi2_total"),
    ).orderBy("digit")


# --------------------------------------------------------------------------
# CUSUM changepoint over the daily order-count series
# --------------------------------------------------------------------------


@register(
    "orders_cusum_changepoint",
    sql=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS c
      FROM orders GROUP BY CAST(o_orderdate AS DATE)
    ),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd, CAST(SUM(c) AS BIGINT) AS total
           FROM daily),
    pfx AS (
      SELECT day, c,
             SUM(c * nd - total) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
      FROM daily CROSS JOIN nn
    ),
    cus AS (
      SELECT day, c,
             CAST(p - LEAST(0, MIN(p) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS BIGINT) AS s
      FROM pfx
    )
    SELECT strftime(day, '%Y-%m-%d') AS day, c AS n_orders,
           s AS cusum_scaled, CAST(rn AS INTEGER) AS rnk
    FROM (SELECT day, c, s, ROW_NUMBER() OVER (ORDER BY s DESC, day) AS rn FROM cus)
    WHERE rn <= {_CUSUM_TOP}
    """,
    tags=("analytics", "cusum", "changepoint", "window"),
)
def orders_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upward-shift CUSUM over daily order counts, reporting the
    {_CUSUM_TOP} highest-pressure days — where the cumulative excess over
    the series mean peaks, i.e. the end of the strongest sustained demand
    surge. The standard page-Hinkley/CUSUM recurrence
    s_t = max(0, s_(t-1) + x_t) looks sequential, but
    s_t = P_t − min(0, min_(j≤t) P_j) (the max-suffix-sum identity), so
    the whole statistic is ONE prefix-sum window plus ONE prefix-min
    window over the daily aggregate — no recursion, no stateful fold, no
    Python.

    Integer-exact: the mean subtraction is scaled by n_days
    (x_t = c_t·n − total), so s is an exact BIGINT in count·n_days units
    under any partitioning; DuckDB's HUGEINT widening of the window SUM is
    cast back at the boundary.

    Scale: the fact scan collapses to ~|distinct days| rows (bounded by
    the calendar, thousands even at 100 TB) before any window runs; the
    global-ordered windows therefore cost nothing regardless of fact size.
    """
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    nn = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("nd"),
        F.sum("c").cast("bigint").alias("total"),
    )
    wp = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pfx = daily.crossJoin(F.broadcast(nn)).withColumn(
        "p", F.sum(F.col("c") * F.col("nd") - F.col("total")).over(wp)
    )
    cus = pfx.select(
        "day",
        "c",
        (F.col("p") - F.least(F.lit(0), F.min("p").over(wp))).cast("bigint").alias("s"),
    )
    wr = Window.orderBy(F.desc("s"), F.asc("day"))
    return (
        cus.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= _CUSUM_TOP)
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("c").alias("n_orders"),
            F.col("s").alias("cusum_scaled"),
            F.col("rn").cast("int").alias("rnk"),
        )
    )


# --------------------------------------------------------------------------
# seasonal-naive forecast backtest over the daily order series
# --------------------------------------------------------------------------


@register(
    "orders_seasonal_naive_backtest",
    sql="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS c
      FROM orders GROUP BY CAST(o_orderdate AS DATE)
    ),
    scored AS (
      SELECT a.day, a.c, b.c AS f, ABS(a.c - b.c) AS abs_err
      FROM daily a JOIN daily b ON b.day = a.day - INTERVAL '7 days'
    )
    SELECT strftime(day, '%Y-%m') AS month,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(abs_err) AS BIGINT) AS total_abs_err,
           ROUND(CAST(SUM(abs_err) AS DOUBLE) / COUNT(*), 6) AS mae,
           ROUND(CAST(SUM(CAST(CAST(abs_err AS DOUBLE) / c AS DECIMAL(28,9)))
                      AS DOUBLE) * 100.0 / COUNT(*), 6) AS mape_pct
    FROM scored
    GROUP BY strftime(day, '%Y-%m')
    ORDER BY month
    """,
    tags=("analytics", "forecast", "backtest", "timeseries"),
)
def orders_seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backtest of the seasonal-naive forecaster (predict today = same
    weekday last week) over daily order counts, scored per month with MAE
    and MAPE — the baseline every demand-forecast model must beat, and
    the shape of any forecast-evaluation job (join actuals to lagged
    predictions, roll up error metrics).

    The lag is a calendar self-join on day − 7 (NOT LAG(c, 7): a row-
    offset silently misaligns the weekday the moment the series has a
    gap). Errors are exact integers; MAPE's per-day ratio follows the
    DECIMAL(28,9) exact-sum contract so the mean of ratios is partition-
    invariant; MAE divides two exact integers once.

    Scale: the fact table collapses to the calendar first; the self-join
    and rollup touch only |days| rows.
    """
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    a, b = daily.alias("a"), daily.alias("b")
    scored = a.join(b, F.col("b.day") == F.date_sub(F.col("a.day"), 7)).select(
        F.col("a.day").alias("day"),
        F.col("a.c").alias("c"),
        F.abs(F.col("a.c") - F.col("b.c")).alias("abs_err"),
    )
    return (
        scored.groupBy(F.date_format("day", "yyyy-MM").alias("month"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.sum("abs_err").cast("bigint").alias("total_abs_err"),
            F.round(
                F.sum("abs_err").cast("double") / F.count(F.lit(1)), 6
            ).alias("mae"),
            F.round(
                F.sum(
                    (F.col("abs_err").cast("double") / F.col("c")).cast(_TERM_DEC)
                ).cast("double")
                * 100.0
                / F.count(F.lit(1)),
                6,
            ).alias("mape_pct"),
        )
        .orderBy("month")
    )


# --------------------------------------------------------------------------
# order ↔ line-item monetary reconciliation audit
# --------------------------------------------------------------------------


@register(
    "audit_order_line_reconciliation",
    sql="""
    WITH l AS (
      SELECT l_orderkey,
             CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                                 * 100) AS BIGINT)) AS BIGINT) AS line_cents,
             CAST(COUNT(*) AS BIGINT) AS n_lines
      FROM lineitem GROUP BY l_orderkey
    ),
    j AS (
      SELECT CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS order_cents,
             COALESCE(l.line_cents, 0) AS line_cents,
             COALESCE(l.n_lines, 0) AS n_lines
      FROM orders o LEFT JOIN l ON l.l_orderkey = o.o_orderkey
    )
    SELECT CASE WHEN n_lines = 0 THEN 'no_lines'
                WHEN ABS(order_cents - line_cents) <= n_lines THEN 'reconciled'
                ELSE 'mismatch' END AS status,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(ABS(order_cents - line_cents)) AS BIGINT) AS total_drift_cents,
           CAST(MAX(ABS(order_cents - line_cents)) AS BIGINT) AS max_drift_cents
    FROM j
    GROUP BY CASE WHEN n_lines = 0 THEN 'no_lines'
                  WHEN ABS(order_cents - line_cents) <= n_lines THEN 'reconciled'
                  ELSE 'mismatch' END
    ORDER BY status
    """,
    tags=("analytics", "audit", "reconciliation", "quality"),
)
def audit_order_line_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table monetary reconciliation: does each order's header total
    equal the sum of its priced lines (extended · (1−discount) · (1+tax))?
    The financial-close audit every warehouse runs nightly; headers with
    no lines are called out separately, and a per-line cent of rounding
    tolerance separates float noise from real drift.

    All money is exact integer cents (one ROUND per line, summed as
    BIGINT), so the drift histogram is bit-stable. validate_fk_orphans
    audits key integrity; this audits the VALUES across the same
    relationship — the two halves of referential trust.

    Scale: one partial-aggregated groupBy of lineitem on its join key,
    one join against orders on that key (co-partitioned if both are
    bucketed by orderkey — the layout tables.py documents for the
    cluster), three output rows.
    """
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    l = li.groupBy("l_orderkey").agg(
        F.sum(
            F.round(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax"))
                * 100
            ).cast("bigint")
        )
        .cast("bigint")
        .alias("line_cents"),
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
    )
    j = o.join(l, o.o_orderkey == l.l_orderkey, "left").select(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("order_cents"),
        F.coalesce(F.col("line_cents"), F.lit(0)).alias("line_cents"),
        F.coalesce(F.col("n_lines"), F.lit(0)).alias("n_lines"),
    )
    drift = F.abs(F.col("order_cents") - F.col("line_cents"))
    status = (
        F.when(F.col("n_lines") == 0, "no_lines")
        .when(drift <= F.col("n_lines"), "reconciled")
        .otherwise("mismatch")
    )
    return (
        j.groupBy(status.alias("status"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(drift).cast("bigint").alias("total_drift_cents"),
            F.max(drift).cast("bigint").alias("max_drift_cents"),
        )
        .orderBy("status")
    )


# --------------------------------------------------------------------------
# ratio-to-parent shares down the region → nation hierarchy
# --------------------------------------------------------------------------


@register(
    "share_of_parent_revenue",
    sql="""
    WITH rev AS (
      SELECT r.r_name AS region, n.n_name AS nation,
             CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100)
                           AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      GROUP BY r.r_name, n.n_name
    )
    SELECT region, nation, cents,
           ROUND(100.0 * cents
                 / CAST(SUM(cents) OVER (PARTITION BY region) AS BIGINT), 6)
             AS pct_of_region,
           ROUND(100.0 * cents / CAST(SUM(cents) OVER () AS BIGINT), 6)
             AS pct_of_total,
           CAST(RANK() OVER (PARTITION BY region ORDER BY cents DESC, nation)
                AS INTEGER) AS rank_in_region
    FROM rev
    ORDER BY region, nation
    """,
    tags=("analytics", "ratio-to-report", "hierarchy", "window"),
)
def share_of_parent_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-parent report down the geography hierarchy: each nation's
    revenue as a share of its region and of the world, plus its rank
    within the region — the drill-down table behind every BI treemap,
    exercising the ratio_to_report window pattern (a windowed total used
    as a divisor) that agg_rollup_region_nation's additive rollup does
    not cover.

    Revenue is exact integer cents; each percentage is one double
    division of exact BIGINTs (the window SUM is cast back from DuckDB's
    HUGEINT widening before dividing so both engines divide identical
    64-bit values). RANK carries a nation tie-break for total order.

    Scale: the fact scan partial-aggregates to 25 (region, nation) rows
    before any window runs; dimension joins are broadcast
    (tables.ALWAYS_BROADCAST covers region/nation, customer prunes to
    two columns).
    """
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    rev = (
        li.select(
            "l_orderkey",
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
            .cast("bigint")
            .alias("cents"),
        )
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.sum("cents").cast("bigint").alias("cents"))
    )
    wr = Window.partitionBy("region")
    wt = Window.partitionBy(F.lit(1))
    return rev.select(
        "region",
        "nation",
        "cents",
        F.round(
            100.0 * F.col("cents") / F.sum("cents").over(wr).cast("bigint"), 6
        ).alias("pct_of_region"),
        F.round(
            100.0 * F.col("cents") / F.sum("cents").over(wt).cast("bigint"), 6
        ).alias("pct_of_total"),
        F.rank()
        .over(wr.orderBy(F.desc("cents"), F.asc("nation")))
        .cast("int")
        .alias("rank_in_region"),
    ).orderBy("region", "nation")


# --------------------------------------------------------------------------
# Gini concentration of customer spend per nation
# --------------------------------------------------------------------------


@register(
    "orders_gini_concentration",
    sql="""
    WITH cust AS (
      SELECT n.n_name AS nation, o.o_custkey,
             CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY n.n_name, o.o_custkey
    ),
    ranked AS (
      SELECT nation, cents,
             ROW_NUMBER() OVER (PARTITION BY nation
                                ORDER BY cents, o_custkey) AS rk
      FROM cust
    ),
    s AS (
      SELECT nation,
             CAST(COUNT(*) AS BIGINT) AS n_customers,
             CAST(SUM(cents) AS BIGINT) AS total_cents,
             CAST(SUM(CAST(rk AS HUGEINT) * cents) AS DECIMAL(38,0)) AS wsum
      FROM ranked GROUP BY nation
    )
    SELECT nation, n_customers, total_cents,
           ROUND(2.0 * CAST(wsum AS DOUBLE)
                   / (CAST(n_customers AS DOUBLE) * CAST(total_cents AS DOUBLE))
                 - (CAST(n_customers AS DOUBLE) + 1.0) / n_customers, 6) AS gini
    FROM s
    ORDER BY nation
    """,
    tags=("analytics", "gini", "concentration", "window"),
)
def orders_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer lifetime spend per nation — revenue-
    concentration analysis ("do five whales carry this market?"), the
    inequality statistic concentration dashboards and sampling designs
    (pareto_abc_parts' continuous sibling) are built on. G = 2·Σᵢ i·xᵢ /
    (n·Σx) − (n+1)/n over spend sorted ascending with rank tie-broken by
    custkey, so the rank-weighted sum is a TOTAL-order quantity both
    engines reproduce bit-for-bit (exact integer cents · exact ranks,
    accumulated in 128-bit: DECIMAL(38,0) on Spark, HUGEINT inside
    DuckDB's SUM — rank·cents already needs >64 bits at warehouse
    cardinalities). The only doubles are in the final mirrored formula.

    Scale: per-customer rollup (partial-agg on the fact table), rank
    window partitioned by nation over the customer dimension, 25-row
    output. Same window economics as orders_rfm_segments.
    """
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cust = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), "o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
    )
    ranked = cust.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("nation").orderBy(F.asc("cents"), F.asc("o_custkey"))
        ),
    )
    s = ranked.groupBy("nation").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum("cents").cast("bigint").alias("total_cents"),
        F.sum(F.col("rk").cast("decimal(38,0)") * F.col("cents")).alias("wsum"),
    )
    nn = F.col("n_customers").cast("double")
    return s.select(
        "nation",
        "n_customers",
        "total_cents",
        F.round(
            2.0 * F.col("wsum").cast("double") / (nn * F.col("total_cents").cast("double"))
            - (nn + 1.0) / F.col("n_customers"),
            6,
        ).alias("gini"),
    ).orderBy("nation")


# --------------------------------------------------------------------------
# exact weighted median via distinct-value collapse
# --------------------------------------------------------------------------


@register(
    "weighted_median_quantity",
    sql="""
    WITH l AS (
      SELECT l_returnflag AS flag,
             CAST(ROUND(l_quantity * 1000) AS BIGINT) AS qm,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS w
      FROM lineitem
    ),
    g AS (
      SELECT flag, qm, CAST(SUM(w) AS BIGINT) AS wsum,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM l GROUP BY flag, qm
    ),
    c AS (
      SELECT flag, qm,
             CAST(SUM(wsum) OVER (PARTITION BY flag ORDER BY qm
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum,
             CAST(SUM(wsum) OVER (PARTITION BY flag) AS BIGINT) AS tot,
             CAST(SUM(n) OVER (PARTITION BY flag) AS BIGINT) AS n_lines
      FROM g
    )
    SELECT flag, n_lines, tot AS total_weight_cents,
           ROUND(CAST(MIN(CASE WHEN 2 * cum >= tot THEN qm END) AS DOUBLE)
                 / 1000.0, 3) AS weighted_median_qty
    FROM c GROUP BY flag, n_lines, tot
    ORDER BY flag
    """,
    tags=("analytics", "weighted-median", "quantile"),
)
def weighted_median_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact revenue-weighted median quantity per return flag — the
    weighted quantile the plain percentile family
    (agg_percentiles_by_status) cannot express: "the quantity level at
    which half the MONEY sits below", the robust center for revenue-
    weighted distributions. Lower weighted median: the smallest value
    whose cumulative weight reaches half the total (2·cum ≥ tot in
    integer cross-multiplication — no division, no interpolation
    ambiguity between engines).

    Scale is the whole point of the formulation: the fact table first
    collapses to DISTINCT (flag, quantity) weight sums — a map-side-
    combinable groupBy onto a bounded value domain (quantities are
    ~50k distinct at any corpus size) — and the cumulative window then
    runs over that collapsed relation, never over fact rows. The naive
    per-row window would sort 100 TB into 3 hot partitions; the collapse
    makes the same answer dimension-cheap. Weights and cumulative sums
    are exact integer cents.
    """
    li = table(spark, sf_dir, "lineitem")
    l = li.select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_quantity") * 1000).cast("bigint").alias("qm"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("w"),
    )
    g = l.groupBy("flag", "qm").agg(
        F.sum("w").cast("bigint").alias("wsum"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    wcum = (
        Window.partitionBy("flag")
        .orderBy("qm")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("flag")
    c = g.select(
        "flag",
        "qm",
        F.sum("wsum").over(wcum).cast("bigint").alias("cum"),
        F.sum("wsum").over(wall).cast("bigint").alias("tot"),
        F.sum("n").over(wall).cast("bigint").alias("n_lines"),
    )
    return (
        c.groupBy("flag", "n_lines", F.col("tot").alias("total_weight_cents"))
        .agg(
            F.round(
                F.min(F.when(2 * F.col("cum") >= F.col("tot"), F.col("qm"))).cast(
                    "double"
                )
                / 1000.0,
                3,
            ).alias("weighted_median_qty")
        )
        .orderBy("flag")
    )


# --------------------------------------------------------------------------
# period-over-period: monthly revenue with YoY growth
# --------------------------------------------------------------------------


@register(
    "orders_yoy_growth",
    sql="""
    WITH m AS (
      SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev_cents,
             CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY date_trunc('month', o_orderdate)
    ),
    j AS (
      SELECT a.month, a.rev_cents, a.n_orders, b.rev_cents AS prev_cents
      FROM m a LEFT JOIN m b
        ON b.month = strftime(CAST(a.month || '-01' AS DATE)
                              - INTERVAL '12 months', '%Y-%m')
    )
    SELECT month, n_orders, rev_cents, prev_cents,
           ROUND(100.0 * (rev_cents - prev_cents) / prev_cents, 6) AS yoy_pct
    FROM j
    ORDER BY month
    """,
    tags=("analytics", "yoy", "period-over-period"),
)
def orders_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue with year-over-year growth — the first chart on
    every revenue dashboard. The comparison is a CALENDAR self-join on
    month − 12 (orders_seasonal_naive_backtest's rule: row-offset LAG
    silently misaligns across gaps; the calendar join cannot), left outer
    so the first year reports NULL growth rather than vanishing.

    Revenue is exact integer cents; the growth rate is one mirrored
    double division of two exact BIGINTs. Scale: the fact table collapses
    to ≤ |months| rows before the join; everything downstream is
    calendar-sized.
    """
    o = table(spark, sf_dir, "orders")
    m = o.groupBy(F.date_trunc("month", "o_orderdate").alias("mstart")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("rev_cents"),
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
    )
    a = m.select(
        F.col("mstart"), F.col("rev_cents"), F.col("n_orders")
    )
    b = m.select(
        F.add_months(F.col("mstart"), 12).alias("mstart"),
        F.col("rev_cents").alias("prev_cents"),
    )
    return (
        a.join(b, "mstart", "left")
        .select(
            F.date_format("mstart", "yyyy-MM").alias("month"),
            "n_orders",
            "rev_cents",
            "prev_cents",
            F.round(
                100.0 * (F.col("rev_cents") - F.col("prev_cents")) / F.col("prev_cents"),
                6,
            ).alias("yoy_pct"),
        )
        .orderBy("month")
    )


# --------------------------------------------------------------------------
# fulfillment-lag percentile profile (collapsed exact percentiles)
# --------------------------------------------------------------------------

_LAG_PCTS = ((25, "p25"), (50, "p50"), (90, "p90"))


@register(
    "lineitem_ship_lag_percentiles",
    sql="""
    WITH lag AS (
      SELECT o.o_orderpriority AS priority,
             CAST(DATE_DIFF('day', CAST(o.o_orderdate AS DATE),
                            CAST(l.l_shipdate AS DATE)) AS BIGINT) AS lag_days
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ),
    g AS (
      SELECT priority, lag_days, CAST(COUNT(*) AS BIGINT) AS n
      FROM lag GROUP BY priority, lag_days
    ),
    c AS (
      SELECT priority, lag_days,
             CAST(SUM(n) OVER (PARTITION BY priority ORDER BY lag_days
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum,
             CAST(SUM(n) OVER (PARTITION BY priority) AS BIGINT) AS tot
      FROM g
    )
    SELECT priority, tot AS n_lines,
           CAST(MIN(CASE WHEN 100 * cum >= 25 * tot THEN lag_days END) AS BIGINT)
             AS p25,
           CAST(MIN(CASE WHEN 100 * cum >= 50 * tot THEN lag_days END) AS BIGINT)
             AS p50,
           CAST(MIN(CASE WHEN 100 * cum >= 90 * tot THEN lag_days END) AS BIGINT)
             AS p90
    FROM c GROUP BY priority, tot
    ORDER BY priority
    """,
    tags=("analytics", "percentile", "sla", "fulfillment"),
)
def lineitem_ship_lag_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship fulfillment lag SLA profile: exact p25/p50/p90 of
    (ship date − order date) days per order priority — the latency-
    percentile report every fulfillment/SLA dashboard leads with, and the
    proof that urgent really ships faster.

    Exact discrete percentiles via the weighted_median_quantity pattern
    generalized to arbitrary ranks: collapse to DISTINCT (priority, lag)
    counts first (lag values are calendar-bounded — a few hundred
    distinct), run ONE cumulative window over the collapsed relation, and
    read each percentile as the smallest lag whose cumulative count
    crosses the cross-multiplied threshold (100·cum ≥ p·tot — integer,
    no interpolation, engine-identical). Three percentiles share one
    window pass, versus three separate percentile_disc sorts.

    Scale: the fact join shuffles once on orderkey (co-partitioned when
    bucketed); the window input is bounded by |priorities| × |distinct
    lags| regardless of corpus size.
    """
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    lag = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("o_orderpriority").alias("priority"),
        F.datediff(F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date"))
        .cast("bigint")
        .alias("lag_days"),
    )
    g = lag.groupBy("priority", "lag_days").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    wcum = (
        Window.partitionBy("priority")
        .orderBy("lag_days")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("priority")
    c = g.select(
        "priority",
        "lag_days",
        F.sum("n").over(wcum).cast("bigint").alias("cum"),
        F.sum("n").over(wall).cast("bigint").alias("tot"),
    )
    aggs = [
        F.min(
            F.when(100 * F.col("cum") >= p * F.col("tot"), F.col("lag_days"))
        )
        .cast("bigint")
        .alias(name)
        for p, name in _LAG_PCTS
    ]
    return (
        c.groupBy("priority", F.col("tot").alias("n_lines"))
        .agg(*aggs)
        .orderBy("priority")
    )


# --------------------------------------------------------------------------
# supplier concentration: Herfindahl–Hirschman index per part brand
# --------------------------------------------------------------------------


@register(
    "supplier_hhi_by_brand",
    sql="""
    WITH s AS (
      SELECT p.p_brand AS brand, l.l_suppkey,
             CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100)
                           AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY p.p_brand, l.l_suppkey
    ),
    agg AS (
      SELECT brand,
             CAST(COUNT(*) AS BIGINT) AS n_suppliers,
             CAST(SUM(cents) AS BIGINT) AS total_cents,
             SUM(CAST(cents AS HUGEINT) * cents) AS sq
      FROM s GROUP BY brand
    )
    SELECT brand, n_suppliers, total_cents,
           ROUND(10000.0 * CAST(sq AS DOUBLE)
                 / (CAST(total_cents AS DOUBLE) * CAST(total_cents AS DOUBLE)), 6)
             AS hhi
    FROM agg
    ORDER BY brand
    """,
    tags=("analytics", "hhi", "concentration"),
)
def supplier_hhi_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier-concentration HHI per part brand: 10000·Σ(shareᵢ²) of each
    supplier's revenue share — the antitrust/procurement-risk index
    (>2500 = highly concentrated: one supplier failure takes the brand's
    supply with it). Complements orders_gini_concentration: Gini measures
    inequality among participants, HHI measures how few of them matter.

    Σ(cᵢ²) accumulates in 128-bit integers (supplier cents² overflows 64
    bits at warehouse scale — DECIMAL(38,0) on Spark, HUGEINT inside
    DuckDB's SUM) and the index is ONE mirrored double expression over
    two exact totals. No per-supplier division: shares never materialize.

    Scale: one partial-aggregated groupBy per (brand, supplier) — the
    natural fact rollup — then a brand-level fold; output is brand-
    dimension-sized.
    """
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    s = (
        li.select(
            "l_partkey",
            "l_suppkey",
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
            .cast("bigint")
            .alias("cents"),
        )
        .join(p, li.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"), "l_suppkey")
        .agg(F.sum("cents").cast("bigint").alias("cents"))
    )
    agg = s.groupBy("brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
        F.sum("cents").cast("bigint").alias("total_cents"),
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents")).alias("sq"),
    )
    return agg.select(
        "brand",
        "n_suppliers",
        "total_cents",
        F.round(
            10000.0
            * F.col("sq").cast("double")
            / (F.col("total_cents").cast("double") * F.col("total_cents").cast("double")),
            6,
        ).alias("hhi"),
    ).orderBy("brand")


# --------------------------------------------------------------------------
# open-order backlog time series (interval stabbing via difference arrays)
# --------------------------------------------------------------------------


@register(
    "orders_backlog_timeseries",
    sql="""
    WITH closes AS (
      SELECT l_orderkey, CAST(MAX(CAST(l_shipdate AS DATE)) AS DATE) AS ship_day
      FROM lineitem GROUP BY l_orderkey
    ),
    closed AS (
      -- clamp: an order cannot close before it opens (generated data has
      -- ship dates preceding order dates; an inverted interval would push
      -- the difference array negative between the two)
      SELECT GREATEST(c.ship_day, CAST(o.o_orderdate AS DATE)) AS close_day
      FROM closes c JOIN orders o ON o.o_orderkey = c.l_orderkey
    ),
    deltas AS (
      SELECT CAST(o_orderdate AS DATE) AS day, 1 AS d FROM orders
      UNION ALL
      SELECT close_day + INTERVAL '1 day', -1 FROM closed
    ),
    daily AS (
      SELECT CAST(day AS DATE) AS day, CAST(SUM(d) AS BIGINT) AS delta,
             CAST(SUM(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_opened,
             CAST(SUM(CASE WHEN d = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_closed
      FROM deltas GROUP BY CAST(day AS DATE)
    ),
    level AS (
      SELECT day, n_opened, n_closed,
             CAST(SUM(delta) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS backlog
      FROM daily
    ),
    monthly AS (
      SELECT strftime(day, '%Y-%m') AS month,
             CAST(SUM(n_opened) AS BIGINT) AS n_opened,
             CAST(SUM(n_closed) AS BIGINT) AS n_closed,
             CAST(MAX(backlog) AS BIGINT) AS m_peak,
             CAST(MAX_BY(backlog, day) AS BIGINT) AS eom_backlog
      FROM level
      GROUP BY strftime(day, '%Y-%m')
    )
    SELECT month, n_opened, n_closed,
           CAST(GREATEST(m_peak,
                COALESCE(LAG(eom_backlog) OVER (ORDER BY month), 0))
             AS BIGINT) AS peak_backlog,
           eom_backlog
    FROM monthly
    ORDER BY month
    """,
    tags=("analytics", "backlog", "interval-stabbing", "difference-array"),
)
def orders_backlog_timeseries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order backlog over time: how many orders are open (placed,
    not yet fully shipped) on each day, rolled up per month to peak and
    end-of-month levels — the WIP/inventory-level question behind every
    operations dashboard, and a distinct TECHNIQUE: interval stabbing by
    difference array. Counting |{i : open_i ≤ t ≤ close_i}| for every t
    as an interval join is O(orders × days); emitting +1 at each open
    day and −1 the day after each close and prefix-summing is one
    calendar-sized window — the same rewrite that makes concurrent-
    sessions / room-occupancy / connection-count queries linear.

    An order's close day is its LAST line's ship date, clamped to no
    earlier than its open day (the generated data ships some lines
    before the order date; an inverted interval would dip the difference
    array negative); orders with no lines never emit a −1 and stay in
    the backlog forever (exactly what an ops team wants surfaced). The
    step function only changes on delta days, but a month whose FIRST
    delta is a decrease still holds the prior month's closing level up
    to that day — so the true peak is max(carry-in, max over the
    month's delta days), where carry-in is the previous emitted month's
    eom_backlog (months with no activity emit no row, so LAG over
    emitted months is exactly the last level before this month's first
    delta). eom_backlog is MAX_BY(backlog, day) — the level at the
    month's last delta day. Pure integers end to end.

    Scale: the fact tables collapse to per-order one-row events, then to
    per-day deltas (calendar-bounded) BEFORE the single global window —
    the CUSUM/weighted-median collapse discipline again.
    """
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    closes = li.groupBy("l_orderkey").agg(
        F.max(F.col("l_shipdate").cast("date")).alias("ship_day")
    )
    closed = closes.join(o, closes.l_orderkey == o.o_orderkey).select(
        F.greatest(F.col("ship_day"), F.col("o_orderdate").cast("date")).alias(
            "close_day"
        )
    )
    deltas = o.select(
        F.col("o_orderdate").cast("date").alias("day"), F.lit(1).alias("d")
    ).unionAll(
        closed.select(F.date_add("close_day", 1).alias("day"), F.lit(-1).alias("d"))
    )
    daily = deltas.groupBy("day").agg(
        F.sum("d").cast("bigint").alias("delta"),
        F.sum(F.when(F.col("d") == 1, 1).otherwise(0)).cast("bigint").alias("n_opened"),
        F.sum(F.when(F.col("d") == -1, 1).otherwise(0)).cast("bigint").alias("n_closed"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    level = daily.select(
        "day",
        "n_opened",
        "n_closed",
        F.sum("delta").over(w).cast("bigint").alias("backlog"),
    )
    monthly = level.groupBy(F.date_format("day", "yyyy-MM").alias("month")).agg(
        F.sum("n_opened").cast("bigint").alias("n_opened"),
        F.sum("n_closed").cast("bigint").alias("n_closed"),
        F.max("backlog").cast("bigint").alias("m_peak"),
        F.max_by("backlog", "day").cast("bigint").alias("eom_backlog"),
    )
    wm = Window.orderBy("month")
    return monthly.select(
        "month",
        "n_opened",
        "n_closed",
        F.greatest(
            F.col("m_peak"),
            F.coalesce(F.lag("eom_backlog").over(wm), F.lit(0).cast("bigint")),
        )
        .cast("bigint")
        .alias("peak_backlog"),
        "eom_backlog",
    ).orderBy("month")


# --------------------------------------------------------------------------
# fulfillment survival curve (Kaplan-Meier with administrative censoring)
# --------------------------------------------------------------------------

_KM_CUTOFF = 60  # administrative censoring horizon (days after order)
_KM_FLOOR = "1e-12"  # survival floor: keeps ln() defined when d = n_risk


@register(
    "orders_shiplag_survival",
    sql=f"""
    WITH lg AS (
      SELECT GREATEST(date_diff('day', CAST(o.o_orderdate AS DATE),
                                CAST(l.l_shipdate AS DATE)), 0) AS lag_d
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ),
    obs AS (
      SELECT CASE WHEN lag_d <= {_KM_CUTOFF} THEN lag_d ELSE {_KM_CUTOFF} END AS t,
             CASE WHEN lag_d <= {_KM_CUTOFF} THEN 1 ELSE 0 END AS ev
      FROM lg
    ),
    byday AS (
      SELECT t, CAST(SUM(ev) AS BIGINT) AS d,
             CAST(SUM(1 - ev) AS BIGINT) AS c
      FROM obs GROUP BY t
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM obs),
    steps AS (
      SELECT b.t, b.d,
             tot.n - COALESCE(SUM(b.d + b.c) OVER (ORDER BY b.t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
      FROM byday b CROSS JOIN tot
    ),
    km AS (
      SELECT t, n_risk, d,
             CAST(d * 1000000 // n_risk AS BIGINT) AS hazard_ppm,
             CAST(ROUND(ln(GREATEST(1.0 - CAST(d AS DOUBLE) / n_risk, {_KM_FLOOR}))
                        * 1000000) AS BIGINT) AS step_log
      FROM steps WHERE d > 0
    )
    SELECT CAST(t AS INTEGER) AS lag_day,
           CAST(n_risk AS BIGINT) AS n_risk,
           d AS n_events,
           hazard_ppm,
           CAST(SUM(step_log) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS cum_log_surv_micro
    FROM km
    ORDER BY lag_day
    """,
    tags=("analytics", "survival", "kaplan-meier"),
)
def orders_shiplag_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier fulfillment curve: P(order line still unshipped after
    d days), with administrative censoring at {_KM_CUTOFF} days — the
    survival-analysis formulation of the ship-lag question that
    lineitem_ship_lag_percentiles answers pointwise. KM handles the
    censored tail correctly (lines slower than the horizon leave the risk
    set without counting as events), which is what an operations team
    needs when the reporting window closes before every order ships.

    Determinism discipline: the risk set and event counts are exact
    integers via one cumulative window over per-day totals; each day's
    log survival factor ln(1 − d/n_risk) is quantized ONCE to micro-units
    (identical IEEE inputs both engines — the zipf/entropy rule) and the
    survival curve is then an exact integer running sum of quantized
    steps, never a cross-engine float product. A {_KM_FLOOR} floor keeps
    the log defined on a day that empties the risk set. hazard_ppm is
    pure integer DIV.

    Scale: the fact join collapses to ≤ {_KM_CUTOFF}+1 per-day rows
    BEFORE any window (the backlog/CUSUM collapse discipline); everything
    after is calendar-bounded."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    lag = F.greatest(
        F.datediff(F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")),
        F.lit(0),
    )
    obs = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.when(lag <= _KM_CUTOFF, lag).otherwise(F.lit(_KM_CUTOFF)).alias("t"),
        F.when(lag <= _KM_CUTOFF, 1).otherwise(0).alias("ev"),
    )
    byday = obs.groupBy("t").agg(
        F.sum("ev").cast("bigint").alias("d"),
        F.sum(1 - F.col("ev")).cast("bigint").alias("c"),
    )
    tot = obs.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    wprev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    steps = byday.crossJoin(F.broadcast(tot)).select(
        "t",
        "d",
        (
            F.col("n")
            - F.coalesce(F.sum(F.col("d") + F.col("c")).over(wprev), F.lit(0))
        ).alias("n_risk"),
    )
    frac = F.col("d").cast("double") / F.col("n_risk")
    km = steps.filter(F.col("d") > 0).select(
        "t",
        "n_risk",
        "d",
        F.expr("d * 1000000 div n_risk").cast("bigint").alias("hazard_ppm"),
        F.round(
            F.log(F.greatest(F.lit(1.0) - frac, F.expr(_KM_FLOOR))) * 1000000
        )
        .cast("bigint")
        .alias("step_log"),
    )
    wcum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        km.select(
            F.col("t").cast("int").alias("lag_day"),
            F.col("n_risk").cast("bigint").alias("n_risk"),
            F.col("d").alias("n_events"),
            "hazard_ppm",
            F.sum("step_log").over(wcum).cast("bigint").alias("cum_log_surv_micro"),
        )
        .orderBy("lag_day")
    )


# --------------------------------------------------------------------------
# classical additive seasonal decomposition of the monthly revenue series
# --------------------------------------------------------------------------


@register(
    "decomp_monthly_revenue",
    sql="""
    WITH oc AS (
      SELECT date_trunc('month', o_orderdate) AS m,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    series AS (
      SELECT m, CAST(SUM(cents) AS BIGINT) AS rev FROM oc GROUP BY m
    ),
    tr AS (
      SELECT m, rev,
             CASE WHEN COUNT(*) OVER (ORDER BY m ROWS BETWEEN 6 PRECEDING
                                      AND 6 FOLLOWING) = 13
                  THEN (LAG(rev, 6) OVER (ORDER BY m)
                        + LEAD(rev, 6) OVER (ORDER BY m)
                        + 2 * CAST(SUM(rev) OVER (ORDER BY m ROWS BETWEEN
                              5 PRECEDING AND 5 FOLLOWING) AS BIGINT)) // 24
                  END AS trend
      FROM series
    ),
    sraw AS (
      SELECT CAST(MONTH(m) AS INTEGER) AS moy,
             CAST(ROUND(CAST(SUM(rev - trend) AS DOUBLE) / COUNT(*)) AS BIGINT) AS s_raw
      FROM tr WHERE trend IS NOT NULL GROUP BY 1
    ),
    sadj AS (
      SELECT CAST(ROUND(CAST(SUM(s_raw) AS DOUBLE) / COUNT(*)) AS BIGINT) AS s_mean
      FROM sraw
    ),
    seas AS (
      SELECT moy, s_raw - s_mean AS seasonal FROM sraw CROSS JOIN sadj
    )
    SELECT CAST(tr.m AS DATE) AS month, tr.rev AS rev_cents,
           tr.trend AS trend_cents,
           seas.seasonal AS seasonal_cents,
           tr.rev - tr.trend - seas.seasonal AS remainder_cents
    FROM tr JOIN seas ON seas.moy = MONTH(tr.m)
    ORDER BY month
    """,
    tags=("analytics", "timeseries", "decomposition"),
)
def decomp_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive decomposition of monthly revenue into
    trend + seasonal + remainder: trend is the standard 2x12 centered
    moving average, the seasonal index is the per-calendar-month mean of
    the detrended series normalized to sum ~0, remainder is what's left —
    the decomposition a forecasting pipeline runs before anomaly gating
    (and the structured upgrade of orders_seasonal_naive_backtest).

    Integer discipline: revenue is quantized to cents PER ROW before any
    sum (never a cross-engine double sum); the 2x12 MA is the exact
    integer (x[-6] + x[+6] + 2*sum(x[-5..+5])) DIV 24 over positive
    BIGINTs; the two mean reductions (seasonal index, index centering)
    are each ONE double division of exact integer sums, rounded once back
    to integer cents. Edge months (< full 13-month window) carry NULL
    trend/remainder by construction.

    Scale (the backlog/CUSUM collapse discipline): the fact scan
    collapses to one row per month BEFORE any window; every window and
    join after that runs on a calendar-bounded series."""
    oc = table(spark, sf_dir, "orders").select(
        F.date_trunc("month", F.col("o_orderdate")).alias("m"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    series = oc.groupBy("m").agg(F.sum("cents").cast("bigint").alias("rev"))
    wo = Window.orderBy("m")
    wmid = wo.rowsBetween(-5, 5)
    wfull = wo.rowsBetween(-6, 6)
    tr = (
        series.select(
            "m",
            "rev",
            F.lag("rev", 6).over(wo).alias("lag6"),
            F.lead("rev", 6).over(wo).alias("lead6"),
            F.sum("rev").over(wmid).cast("bigint").alias("midsum"),
            F.count(F.lit(1)).over(wfull).alias("nw"),
        ).select(
            "m",
            "rev",
            F.when(
                F.col("nw") == 13, F.expr("(lag6 + lead6 + 2 * midsum) div 24")
            )
            .cast("bigint")
            .alias("trend"),
        )
    )
    sraw = (
        tr.filter(F.col("trend").isNotNull())
        .groupBy(F.month("m").cast("int").alias("moy"))
        .agg(
            F.round(
                F.sum(F.col("rev") - F.col("trend")).cast("double")
                / F.count(F.lit(1))
            )
            .cast("bigint")
            .alias("s_raw")
        )
    )
    sadj = sraw.agg(
        F.round(F.sum("s_raw").cast("double") / F.count(F.lit(1)))
        .cast("bigint")
        .alias("s_mean")
    )
    seas = sraw.crossJoin(F.broadcast(sadj)).select(
        "moy", (F.col("s_raw") - F.col("s_mean")).alias("seasonal")
    )
    return (
        tr.join(F.broadcast(seas), F.month(tr.m).cast("int") == seas.moy)
        .select(
            F.col("m").cast("date").alias("month"),
            F.col("rev").alias("rev_cents"),
            F.col("trend").alias("trend_cents"),
            F.col("seasonal").alias("seasonal_cents"),
            (F.col("rev") - F.col("trend") - F.col("seasonal")).alias(
                "remainder_cents"
            ),
        )
        .orderBy("month")
    )


# --------------------------------------------------------------------------
# exact exponentially-weighted forecast level (EWMA, alpha = 1/2)
# --------------------------------------------------------------------------

_EWMA_K = 24  # smooth the trailing 2 years of monthly revenue


@register(
    "forecast_ewma_revenue",
    sql=f"""
    WITH oc AS (
      SELECT date_trunc('month', o_orderdate) AS m,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    series AS (
      SELECT m, CAST(SUM(cents) AS BIGINT) AS rev FROM oc GROUP BY m
    ),
    rk AS (
      SELECT m, rev, CAST(ROW_NUMBER() OVER (ORDER BY m DESC) AS INTEGER) AS rdesc
      FROM series
    ),
    lastk AS (
      SELECT m, rev, CAST(ROW_NUMBER() OVER (ORDER BY m) AS INTEGER) AS t
      FROM rk WHERE rdesc <= {_EWMA_K}
    ),
    wsum AS (
      SELECT m, rev, t,
             CAST(SUM(CAST(CASE WHEN t = 1 THEN CAST(1 AS BIGINT)
                                ELSE CAST(1 AS BIGINT) << (t - 2) END
                           AS DECIMAL(19,0))
                      * CAST(rev AS DECIMAL(19,0)))
                  OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
                  AS DECIMAL(38,0)) AS num
      FROM lastk
    )
    SELECT CAST(m AS DATE) AS month, rev AS rev_cents, t,
           ROUND(CAST(num AS DOUBLE)
                 / CAST(CAST(1 AS BIGINT) << (t - 1) AS DOUBLE), 2) AS ewma_cents,
           ROUND(CAST(rev AS DOUBLE) - CAST(num AS DOUBLE)
                 / CAST(CAST(1 AS BIGINT) << (t - 1) AS DOUBLE), 2) AS resid_cents
    FROM wsum
    ORDER BY t
    """,
    tags=("analytics", "forecast", "timeseries"),
)
def forecast_ewma_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simple exponential smoothing of the trailing {_EWMA_K} months of
    revenue with α = 1/2 — the forecast level S_t = (S_(t-1) + r_t)/2 and
    its residuals, the baseline every forecasting stack is graded against
    (and the level decomp_monthly_revenue's anomaly gate would track).

    Exactness: the usual EWMA recurrence is a float accumulation whose
    error depends on evaluation order, but for α = 1/2 the scaled level
    N_t := 2^(t-1)·S_t satisfies N_t = N_(t-1) + 2^(t-2)·r_t — i.e. the
    EWMA **is a weighted prefix sum** with weights 1, 1, 2, 4, …, 2^(t-2)
    independent of t. N_t is summed exactly in DECIMAL(38,0) (2^22 ·
    monthly cents overflows BIGINT at warehouse scale), and S_t = N_t /
    2^(t-1) is ONE mirrored double division per row — division by a power
    of two, so even the float step is exact whenever N_t < 2^53.

    Scale (the decomp/backlog collapse discipline): the fact scan
    collapses to one row per month before anything else; ranking,
    windowing, and the prefix sum all run on a ≤{_EWMA_K}-row
    calendar-bounded series."""
    oc = table(spark, sf_dir, "orders").select(
        F.date_trunc("month", F.col("o_orderdate")).alias("m"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    series = oc.groupBy("m").agg(F.sum("cents").cast("bigint").alias("rev"))
    rk = series.withColumn(
        "rdesc", F.row_number().over(Window.orderBy(F.desc("m"))).cast("int")
    )
    lastk = (
        rk.filter(F.col("rdesc") <= _EWMA_K)
        .withColumn("t", F.row_number().over(Window.orderBy("m")).cast("int"))
        .drop("rdesc")
    )
    wpre = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    term = F.expr(
        "cast(CASE WHEN t = 1 THEN cast(1 AS bigint) "
        "ELSE shiftleft(cast(1 AS bigint), t - 2) END AS decimal(19,0))"
    ) * F.col("rev").cast("decimal(19,0)")
    wsum = lastk.withColumn("num", F.sum(term).over(wpre).cast("decimal(38,0)"))
    pow2 = F.expr("cast(shiftleft(cast(1 AS bigint), t - 1) AS double)")
    ewma = F.col("num").cast("double") / pow2
    return wsum.select(
        F.col("m").cast("date").alias("month"),
        F.col("rev").alias("rev_cents"),
        "t",
        F.round(ewma, 2).alias("ewma_cents"),
        F.round(F.col("rev").cast("double") - ewma, 2).alias("resid_cents"),
    ).orderBy("t")


# --------------------------------------------------------------------------
# price/volume bridge (YoY revenue decomposition)
# --------------------------------------------------------------------------

_PVM_Y1, _PVM_Y2 = 1997, 1998


@register(
    "revenue_pvm_bridge",
    sql=f"""
    WITH li AS (
      SELECT p.p_brand AS brand, year(l.l_shipdate) AS yr,
             CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT) AS rev_c,
             CAST(l.l_quantity AS BIGINT) AS qty
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE year(l.l_shipdate) IN ({_PVM_Y1}, {_PVM_Y2})
    ),
    g AS (
      SELECT brand,
             CAST(SUM(CASE WHEN yr = {_PVM_Y1} THEN rev_c ELSE 0 END) AS BIGINT) AS rev1_c,
             CAST(SUM(CASE WHEN yr = {_PVM_Y1} THEN qty   ELSE 0 END) AS BIGINT) AS qty1,
             CAST(SUM(CASE WHEN yr = {_PVM_Y2} THEN rev_c ELSE 0 END) AS BIGINT) AS rev2_c,
             CAST(SUM(CASE WHEN yr = {_PVM_Y2} THEN qty   ELSE 0 END) AS BIGINT) AS qty2
      FROM li GROUP BY brand
    ),
    pe AS (
      SELECT *, CAST(ROUND(CAST(rev2_c AS DOUBLE)
                           - CAST(qty2 AS DOUBLE) * rev1_c / qty1) AS BIGINT) AS price_effect_c
      FROM g WHERE qty1 > 0 AND qty2 > 0
    )
    SELECT brand, rev1_c, rev2_c, qty1, qty2,
           CAST(rev2_c - rev1_c AS BIGINT) AS delta_c,
           price_effect_c,
           CAST(rev2_c - rev1_c - price_effect_c AS BIGINT) AS volume_effect_c
    FROM pe ORDER BY brand
    """,
    tags=("analytics", "finance", "bridge"),
)
def revenue_pvm_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand price/volume revenue bridge between {_PVM_Y1} and
    {_PVM_Y2}: the YoY revenue delta decomposed exactly into a price
    effect ((p2 − p1)·q2, at new volume) and a volume effect
    ((q2 − q1)·p1, at old price) — the finance-team waterfall explaining
    WHY revenue moved, not just that it did.

    Exactness: revenue quantizes to integer cents per row; the identity
    Δrev = (p2−p1)·q2 + (q2−q1)·p1 is exact in rationals, so the price
    effect is the single mirrored double expression
    rev2 − q2·rev1/q1 rounded once, and the volume effect is defined as
    the integer remainder — price_effect_c + volume_effect_c == delta_c
    holds bit-for-bit by construction.

    Scale shape: one fact scan with the year filter pushed to parquet;
    part is a broadcast dim; a single brand-keyed groupBy with map-side
    partials does both years via conditional aggregation (no self-join
    of year slices, no second shuffle). Output is |brands| rows."""
    part = table(spark, sf_dir, "part").select("p_partkey", F.col("p_brand").alias("brand"))
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.year("l_shipdate").alias("yr"),
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
        .cast("bigint")
        .alias("rev_c"),
        F.col("l_quantity").cast("bigint").alias("qty"),
    ).filter(F.col("yr").isin(_PVM_Y1, _PVM_Y2))

    def _year_sum(col: str, yr: int):
        return F.sum(F.when(F.col("yr") == yr, F.col(col)).otherwise(0)).cast("bigint")

    g = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("brand")
        .agg(
            _year_sum("rev_c", _PVM_Y1).alias("rev1_c"),
            _year_sum("qty", _PVM_Y1).alias("qty1"),
            _year_sum("rev_c", _PVM_Y2).alias("rev2_c"),
            _year_sum("qty", _PVM_Y2).alias("qty2"),
        )
        .filter((F.col("qty1") > 0) & (F.col("qty2") > 0))
    )
    pe = F.round(
        F.col("rev2_c").cast("double")
        - F.col("qty2").cast("double") * F.col("rev1_c") / F.col("qty1")
    ).cast("bigint")
    return g.select(
        "brand",
        "rev1_c",
        "rev2_c",
        "qty1",
        "qty2",
        (F.col("rev2_c") - F.col("rev1_c")).cast("bigint").alias("delta_c"),
        pe.alias("price_effect_c"),
        (F.col("rev2_c") - F.col("rev1_c") - pe).cast("bigint").alias("volume_effect_c"),
    ).orderBy("brand")


# --------------------------------------------------------------------------
# price elasticity (log-log OLS per brand)
# --------------------------------------------------------------------------


@register(
    "orders_price_elasticity",
    sql="""
    WITH per_part AS (
      SELECT l.l_partkey, CAST(SUM(l.l_quantity) AS BIGINT) AS qty
      FROM lineitem l GROUP BY l.l_partkey
    ),
    pts AS (
      SELECT p.p_brand AS brand,
             CAST(ROUND(ln(p.p_retailprice) * 1000000) AS BIGINT) AS x,
             CAST(ROUND(ln(CAST(pp.qty AS DOUBLE)) * 1000000) AS BIGINT) AS y
      FROM per_part pp JOIN part p ON p.p_partkey = pp.l_partkey
      WHERE pp.qty > 0
    ),
    m AS (
      SELECT brand, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(x AS DECIMAL(38,0))) AS sx,
             SUM(CAST(y AS DECIMAL(38,0))) AS sy,
             SUM(CAST(x AS DECIMAL(38,0)) * y) AS sxy,
             SUM(CAST(x AS DECIMAL(38,0)) * x) AS sxx
      FROM pts GROUP BY brand
    )
    SELECT brand, n AS n_parts,
           ROUND((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / NULLIF(n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0),
                 6) AS elasticity_r6
    FROM m ORDER BY brand
    """,
    tags=("analytics", "econometrics", "regression"),
)
def orders_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Own-price elasticity proxy per brand: the OLS slope of
    ln(quantity sold) on ln(retail price) across the brand's parts —
    the log-log regression a pricing team runs before touching a price
    list (slope < −1 = elastic, raise revenue by cutting price).

    Exactness: the logs of exact inputs are quantized ONCE to micro-unit
    BIGINTs (the `text_zipf_slope` idiom); all four OLS moments are
    DECIMAL(38,0) sums of integer products (immune to the BIGINT
    overflow a 10⁷-part brand would hit); the slope is one mirrored
    double expression rounded once, NULL for a degenerate all-one-price
    brand.

    Scale shape: per-part demand is a partkey-keyed groupBy with
    map-side partials; part is dimension-sized so the brand lookup is a
    broadcast; the moment rollup groups on |brands| keys. One fact
    shuffle total."""
    pp = (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(F.sum("l_quantity").cast("bigint").alias("qty"))
        .filter(F.col("qty") > 0)
    )
    part = table(spark, sf_dir, "part").select(
        "p_partkey", F.col("p_brand").alias("brand"), "p_retailprice"
    )
    pts = pp.join(F.broadcast(part), pp.l_partkey == part.p_partkey).select(
        "brand",
        F.round(F.log("p_retailprice") * 1_000_000).cast("bigint").alias("x"),
        F.round(F.log(F.col("qty").cast("double")) * 1_000_000).cast("bigint").alias("y"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    m = pts.groupBy("brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(dec("x")).alias("sx"),
        F.sum(dec("y")).alias("sy"),
        F.sum(dec("x") * F.col("y")).alias("sxy"),
        F.sum(dec("x") * F.col("x")).alias("sxx"),
    )
    num = F.col("n") * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col(
        "sy"
    ).cast("double")
    den = F.col("n") * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col(
        "sx"
    ).cast("double")
    return m.select(
        "brand",
        F.col("n").alias("n_parts"),
        F.round(num / F.nullif(den, F.lit(0.0)), 6).alias("elasticity_r6"),
    ).orderBy("brand")


# --------------------------------------------------------------------------
# duplicate-payment audit (near-identical invoices, same customer)
# --------------------------------------------------------------------------

_DUP_WINDOW_DAYS = 7
_DUP_REL_PCT = 1  # |a - b| <= 1% of the smaller amount
_DUP_TOP = 100


@register(
    "audit_duplicate_payments",
    sql=f"""
    WITH o AS (
      SELECT o_custkey, o_orderkey, o_orderdate,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    pairs AS (
      SELECT a.o_custkey AS custkey,
             a.o_orderkey AS orderkey_a, b.o_orderkey AS orderkey_b,
             CAST(datediff('day', a.o_orderdate, b.o_orderdate) AS BIGINT) AS day_gap,
             a.cents AS cents_a, b.cents AS cents_b,
             abs(a.cents - b.cents) AS diff_c
      FROM o a JOIN o b
        ON b.o_custkey = a.o_custkey AND b.o_orderkey > a.o_orderkey
      WHERE abs(datediff('day', a.o_orderdate, b.o_orderdate)) <= {_DUP_WINDOW_DAYS}
        AND abs(a.cents - b.cents) * 100 <= LEAST(a.cents, b.cents) * {_DUP_REL_PCT}
    )
    SELECT custkey, orderkey_a, orderkey_b, day_gap, cents_a, cents_b,
           CAST(diff_c AS BIGINT) AS diff_c
    FROM pairs
    ORDER BY diff_c, custkey, orderkey_a, orderkey_b
    LIMIT {_DUP_TOP}
    """,
    tags=("audit", "finance", "dedup"),
)
def audit_duplicate_payments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-payment detector: pairs of orders by the SAME customer,
    placed within {_DUP_WINDOW_DAYS} days of each other, whose amounts
    agree to {_DUP_REL_PCT}% — the accounts-payable audit that catches
    double-submitted invoices (and, in synthetic data, generator
    artifacts). Top-{_DUP_TOP} closest pairs.

    Exactness: amounts quantize to integer cents per row; the relative
    tolerance is the cross-multiplied integer comparison
    |a−b|·100 ≤ min(a,b)·{_DUP_REL_PCT} (no float ever exists); day gaps
    are exact date arithmetic.

    Scale shape: the self-join is an equi-join on o_custkey — both sides
    hash to the same partitioning, so each customer's pair enumeration
    is local and bounded by that customer's order count squared (tens,
    not millions; a pathological mega-customer would be salted). The
    orderkey inequality halves the pair space and the date/amount bands
    prune the rest before anything leaves the join."""
    o = table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    a = o.alias("a")
    b = o.alias("b")
    gap = F.datediff(F.col("b.o_orderdate"), F.col("a.o_orderdate")).cast("bigint")
    diff = F.abs(F.col("a.cents") - F.col("b.cents"))
    pairs = (
        a.join(
            b,
            (F.col("b.o_custkey") == F.col("a.o_custkey"))
            & (F.col("b.o_orderkey") > F.col("a.o_orderkey")),
        )
        .filter(
            (F.abs(gap) <= _DUP_WINDOW_DAYS)
            & (diff * 100 <= F.least(F.col("a.cents"), F.col("b.cents")) * _DUP_REL_PCT)
        )
        .select(
            F.col("a.o_custkey").alias("custkey"),
            F.col("a.o_orderkey").alias("orderkey_a"),
            F.col("b.o_orderkey").alias("orderkey_b"),
            gap.alias("day_gap"),
            F.col("a.cents").alias("cents_a"),
            F.col("b.cents").alias("cents_b"),
            diff.cast("bigint").alias("diff_c"),
        )
    )
    return pairs.orderBy("diff_c", "custkey", "orderkey_a", "orderkey_b").limit(_DUP_TOP)


# --------------------------------------------------------------------------
# two-way mean decomposition (ANOVA-style cell effects)
# --------------------------------------------------------------------------


@register(
    "anova_twoway_cells",
    sql="""
    WITH o AS (
      SELECT o_orderpriority AS prio, year(o_orderdate) AS yr,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    cell AS (
      SELECT prio, yr, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS s
      FROM o GROUP BY prio, yr
    ),
    ra AS (SELECT prio, CAST(SUM(n) AS BIGINT) AS n_a, CAST(SUM(s) AS BIGINT) AS s_a
           FROM cell GROUP BY prio),
    rb AS (SELECT yr, CAST(SUM(n) AS BIGINT) AS n_b, CAST(SUM(s) AS BIGINT) AS s_b
           FROM cell GROUP BY yr),
    g AS (SELECT CAST(SUM(n) AS BIGINT) AS n_g, CAST(SUM(s) AS BIGINT) AS s_g FROM cell)
    SELECT c.prio AS prio, CAST(c.yr AS INTEGER) AS yr, c.n AS n_orders,
           ROUND(CAST(c.s AS DOUBLE) / c.n, 2) AS cell_mean_c,
           ROUND(CAST(ra.s_a AS DOUBLE) / ra.n_a - CAST(g.s_g AS DOUBLE) / g.n_g, 2)
             AS effect_prio_c,
           ROUND(CAST(rb.s_b AS DOUBLE) / rb.n_b - CAST(g.s_g AS DOUBLE) / g.n_g, 2)
             AS effect_year_c,
           ROUND(CAST(c.s AS DOUBLE) / c.n
                 - CAST(ra.s_a AS DOUBLE) / ra.n_a
                 - CAST(rb.s_b AS DOUBLE) / rb.n_b
                 + CAST(g.s_g AS DOUBLE) / g.n_g, 2) AS interaction_c
    FROM cell c
    JOIN ra ON ra.prio = c.prio
    JOIN rb ON rb.yr = c.yr
    CROSS JOIN g
    ORDER BY c.prio, yr
    """,
    tags=("analytics", "anova", "statistics"),
)
def anova_twoway_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-way mean decomposition of order value by (priority × year):
    each cell's mean split into the grand mean, a priority main effect,
    a year main effect, and the interaction residual
    (cell − row − col + grand) — the additive-model diagnostic that says
    whether "urgent orders are bigger" holds uniformly or only in some
    years. By construction cell_mean = grand + effect_prio + effect_year
    + interaction (before rounding).

    Exactness: all sums are exact integer cents; every reported value is
    a single mirrored double expression over those exact integers,
    rounded once.

    Scale shape: one fact scan into a (5 × |years|)-cell rollup with
    map-side partials; margins and the grand total derive from the cell
    table (never rescanning the fact), and the margin joins are
    broadcast-sized. Output is |cells| rows."""
    o = table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("prio"),
        F.year("o_orderdate").alias("yr"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    cell = o.groupBy("prio", "yr").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("s"),
    )
    ra = cell.groupBy("prio").agg(
        F.sum("n").cast("bigint").alias("n_a"), F.sum("s").cast("bigint").alias("s_a")
    )
    rb = cell.groupBy("yr").agg(
        F.sum("n").cast("bigint").alias("n_b"), F.sum("s").cast("bigint").alias("s_b")
    )
    g = cell.agg(
        F.sum("n").cast("bigint").alias("n_g"), F.sum("s").cast("bigint").alias("s_g")
    )
    mean = lambda s, n: F.col(s).cast("double") / F.col(n)  # noqa: E731
    return (
        cell.join(F.broadcast(ra), "prio")
        .join(F.broadcast(rb), "yr")
        .crossJoin(F.broadcast(g))
        .select(
            "prio",
            F.col("yr").cast("int").alias("yr"),
            F.col("n").alias("n_orders"),
            F.round(mean("s", "n"), 2).alias("cell_mean_c"),
            F.round(mean("s_a", "n_a") - mean("s_g", "n_g"), 2).alias("effect_prio_c"),
            F.round(mean("s_b", "n_b") - mean("s_g", "n_g"), 2).alias("effect_year_c"),
            F.round(
                mean("s", "n") - mean("s_a", "n_a") - mean("s_b", "n_b") + mean("s_g", "n_g"),
                2,
            ).alias("interaction_c"),
        )
        .orderBy("prio", "yr")
    )


# --------------------------------------------------------------------------
# Wilson confidence interval for per-brand return rates
# --------------------------------------------------------------------------

_WILSON_Z2 = 3.8416  # z^2 for the 95% interval (z = 1.96), exact double


@register(
    "returns_wilson_ci",
    sql=f"""
    WITH b AS (
      SELECT p.p_brand AS brand,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS r
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1
    )
    SELECT brand, n, r,
           ROUND(CAST(r AS DOUBLE) / n, 6) AS p_hat,
           ROUND((CAST(r AS DOUBLE) / n + {_WILSON_Z2} / (2.0 * n)
                  - sqrt({_WILSON_Z2}) * sqrt(CAST(r AS DOUBLE) / n
                        * (1.0 - CAST(r AS DOUBLE) / n) / n
                        + {_WILSON_Z2} / (4.0 * n * n)))
                 / (1.0 + {_WILSON_Z2} / n), 6) AS ci_lo,
           ROUND((CAST(r AS DOUBLE) / n + {_WILSON_Z2} / (2.0 * n)
                  + sqrt({_WILSON_Z2}) * sqrt(CAST(r AS DOUBLE) / n
                        * (1.0 - CAST(r AS DOUBLE) / n) / n
                        + {_WILSON_Z2} / (4.0 * n * n)))
                 / (1.0 + {_WILSON_Z2} / n), 6) AS ci_hi
    FROM b ORDER BY brand
    """,
    tags=("analytics", "statistics", "interval"),
)
def returns_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson-score 95% confidence interval for each brand's return rate
    — the closed-form uncertainty band (well-behaved at extreme rates
    and small n, unlike the naive normal interval) that turns "brand X
    returns 25.1%, brand Y 24.8%" into "indistinguishable". The cheap
    analytic counterpart of `stats_bootstrap_ci` — one aggregate versus
    a resampling fan-out — so dashboards use this and audits use that.

    Exactness: r and n are exact integers; p̂, and both interval bounds
    are single mirrored double expressions over (r, n) with z² entering
    as the exact double literal {_WILSON_Z2}, each rounded once.

    Scale shape: one fact scan, broadcast part dim, one brand-keyed
    groupBy with map-side partials. |brands| rows out."""
    part = table(spark, sf_dir, "part").select("p_partkey", F.col("p_brand").alias("brand"))
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_returnflag")
    b = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("brand")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
            .cast("bigint")
            .alias("r"),
        )
    )
    p = F.col("r").cast("double") / F.col("n")
    z2 = F.lit(_WILSON_Z2)
    center = p + z2 / (2.0 * F.col("n"))
    half = F.sqrt(z2) * F.sqrt(p * (1.0 - p) / F.col("n") + z2 / (4.0 * F.col("n") * F.col("n")))
    denom = 1.0 + z2 / F.col("n")
    return b.select(
        "brand",
        "n",
        "r",
        F.round(p, 6).alias("p_hat"),
        F.round((center - half) / denom, 6).alias("ci_lo"),
        F.round((center + half) / denom, 6).alias("ci_hi"),
    ).orderBy("brand")


# --------------------------------------------------------------------------
# supplier scorecard (min-max normalized composite KPI ranking)
# --------------------------------------------------------------------------

_SCORE_TOP = 50
# composite weights (x100): revenue 50, volume 30, speed 20
_SCORE_W_REV, _SCORE_W_CNT, _SCORE_W_LAG = 50, 30, 20


@register(
    "supplier_scorecard",
    sql=f"""
    WITH m AS (
      SELECT l.l_suppkey AS suppkey,
             CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT))
                  AS BIGINT) AS rev_c,
             CAST(COUNT(*) AS BIGINT) AS n_li,
             CAST(SUM(datediff('day', o.o_orderdate, l.l_shipdate)) AS BIGINT) AS lag_sum
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      GROUP BY 1
    ),
    lims AS (
      SELECT MIN(rev_c) AS rev_lo, MAX(rev_c) AS rev_hi,
             MIN(n_li) AS cnt_lo, MAX(n_li) AS cnt_hi,
             MIN(lag_sum * 1000 // n_li) AS lag_lo, MAX(lag_sum * 1000 // n_li) AS lag_hi
      FROM m
    ),
    norm AS (
      SELECT m.suppkey, m.rev_c, m.n_li,
             CAST(m.lag_sum * 1000 // m.n_li AS BIGINT) AS lag_milli,
             CASE WHEN l.rev_hi = l.rev_lo THEN 1000000
                  ELSE (m.rev_c - l.rev_lo) * 1000000 // (l.rev_hi - l.rev_lo) END AS rev_n,
             CASE WHEN l.cnt_hi = l.cnt_lo THEN 1000000
                  ELSE (m.n_li - l.cnt_lo) * 1000000 // (l.cnt_hi - l.cnt_lo) END AS cnt_n,
             CASE WHEN l.lag_hi = l.lag_lo THEN 1000000
                  ELSE (m.lag_sum * 1000 // m.n_li - l.lag_lo) * 1000000
                       // (l.lag_hi - l.lag_lo) END AS lag_n
      FROM m CROSS JOIN lims l
    ),
    scored AS (
      SELECT suppkey, rev_c, n_li, lag_milli,
             CAST(({_SCORE_W_REV} * rev_n + {_SCORE_W_CNT} * cnt_n
                   + {_SCORE_W_LAG} * (1000000 - lag_n)) // 100 AS BIGINT) AS composite
      FROM norm
    )
    SELECT suppkey, rev_c, n_li, lag_milli, composite,
           CAST(ROW_NUMBER() OVER (ORDER BY composite DESC, suppkey) AS INTEGER) AS rnk
    FROM scored
    ORDER BY rnk
    LIMIT {_SCORE_TOP}
    """,
    tags=("analytics", "scorecard", "ranking"),
)
def supplier_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vendor scorecard: each supplier's revenue, line volume, and mean
    order-to-ship lag min-max normalized to ppm across the supplier
    population, blended {_SCORE_W_REV}/{_SCORE_W_CNT}/{_SCORE_W_LAG}
    (speed inverted — lower lag is better) into one composite, ranked.
    The procurement dashboard every ERP migration asks for first.

    Exactness: all three KPIs are integers (mean lag held as exact
    milli-days via floor division BEFORE normalization — the same value
    feeds the limits and the normalization, so no re-derivation skew);
    min-max scaling is integer floor division with a constant-column
    degenerate guard; the composite never leaves integers.

    Scale shape: one fact shuffle on suppkey with map-side partials
    (the orders join is key-aligned on orderkey first); the limits are
    one single-row broadcast; the rank is a top-{_SCORE_TOP} window over
    the |suppliers| rollup."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        "l_orderkey",
        "l_shipdate",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
        .cast("bigint")
        .alias("rev_c"),
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    m = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(
            F.sum("rev_c").cast("bigint").alias("rev_c"),
            F.count(F.lit(1)).cast("bigint").alias("n_li"),
            F.sum(F.datediff("l_shipdate", "o_orderdate")).cast("bigint").alias("lag_sum"),
        )
        .withColumn("lag_milli", F.expr("lag_sum * 1000 div n_li").cast("bigint"))
    )
    lims = m.agg(
        F.min("rev_c").alias("rev_lo"),
        F.max("rev_c").alias("rev_hi"),
        F.min("n_li").alias("cnt_lo"),
        F.max("n_li").alias("cnt_hi"),
        F.min("lag_milli").alias("lag_lo"),
        F.max("lag_milli").alias("lag_hi"),
    )

    def _norm(x: str, lo: str, hi: str):
        return (
            F.when(F.col(hi) == F.col(lo), F.lit(1_000_000).cast("bigint"))
            .otherwise(
                F.expr(f"({x} - {lo}) * 1000000 div ({hi} - {lo})").cast("bigint")
            )
        )

    norm = m.crossJoin(F.broadcast(lims)).select(
        "suppkey",
        "rev_c",
        "n_li",
        "lag_milli",
        _norm("rev_c", "rev_lo", "rev_hi").alias("rev_n"),
        _norm("n_li", "cnt_lo", "cnt_hi").alias("cnt_n"),
        _norm("lag_milli", "lag_lo", "lag_hi").alias("lag_n"),
    )
    scored = norm.select(
        "suppkey",
        "rev_c",
        "n_li",
        "lag_milli",
        F.expr(
            f"({_SCORE_W_REV} * rev_n + {_SCORE_W_CNT} * cnt_n"
            f" + {_SCORE_W_LAG} * (1000000 - lag_n)) div 100"
        )
        .cast("bigint")
        .alias("composite"),
    )
    return (
        scored.withColumn(
            "rnk",
            F.row_number()
            .over(Window.orderBy(F.desc("composite"), "suppkey"))
            .cast("int"),
        )
        .filter(F.col("rnk") <= _SCORE_TOP)
        .orderBy("rnk")
    )


# --------------------------------------------------------------------------
# matched-basket price indices (Laspeyres / Paasche / Fisher)
# --------------------------------------------------------------------------

_IDX_BASE_YR = 1995


@register(
    "price_index_fisher",
    sql=f"""
    WITH py AS (
      SELECT l_partkey AS part, year(l_shipdate) AS yr,
             CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
                  * 1000 // SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS up_m,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
      FROM lineitem
      GROUP BY 1, 2
    ),
    base AS (SELECT part, up_m AS up0, qty AS q0 FROM py WHERE yr = {_IDX_BASE_YR}),
    m AS (
      SELECT p.yr,
             CAST(COUNT(*) AS BIGINT) AS n_parts,
             SUM(CAST(p.up_m AS HUGEINT) * b.q0) AS l_num,
             SUM(CAST(b.up0 AS HUGEINT) * b.q0) AS l_den,
             SUM(CAST(p.up_m AS HUGEINT) * p.qty) AS p_num,
             SUM(CAST(b.up0 AS HUGEINT) * p.qty) AS p_den
      FROM py p JOIN base b ON b.part = p.part
      GROUP BY p.yr
    )
    SELECT CAST(yr AS INTEGER) AS yr, n_parts,
           -- (a - a%b)/b: exact floor for positive HUGEINTs, mirrored in
           -- Spark's decimal arithmetic (whose plain division rounds at
           -- scale and would double-round near integer quotients)
           CAST((l_num * 1000000 - (l_num * 1000000) % l_den) / l_den AS BIGINT)
             AS laspeyres_ppm,
           CAST((p_num * 1000000 - (p_num * 1000000) % p_den) / p_den AS BIGINT)
             AS paasche_ppm,
           ROUND(sqrt((CAST(l_num AS DOUBLE) / CAST(l_den AS DOUBLE))
                      * (CAST(p_num AS DOUBLE) / CAST(p_den AS DOUBLE))), 6) AS fisher_r6
    FROM m ORDER BY yr
    """,
    tags=("analytics", "econometrics", "index"),
)
def price_index_fisher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matched-basket price indices per ship year against the
    {_IDX_BASE_YR} base: Laspeyres (base-weighted), Paasche
    (current-weighted), and their geometric mean, the Fisher ideal index
    — inflation measurement over the part basket, the macro companion
    to `revenue_pvm_bridge`'s micro bridge. Only parts traded in BOTH
    the base year and the measured year enter that year's basket
    (classic matched-sample index).

    Exactness: unit prices quantize ONCE to milli-cents (integer floor
    of exact cent/quantity sums); all four index sums are HUGEINT/
    DECIMAL(38) integer dot products; the ppm indices are integer floor
    divisions and Fisher is one mirrored double expression rounded
    once.

    Scale shape: one fact scan into a (part, year)-keyed rollup with
    map-side partials; the base-year slice joins back on partkey (the
    rollup's own key — co-partitioned); the index reduction groups on
    |years|. No fact re-scan, no window."""
    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("part"),
        F.year("l_shipdate").alias("yr"),
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
        .cast("bigint")
        .alias("rev_c"),
        F.col("l_quantity").cast("bigint").alias("q"),
    )
    py = (
        li.groupBy("part", "yr")
        .agg(
            F.expr("sum(rev_c) * 1000 div sum(q)").cast("bigint").alias("up_m"),
            F.sum("q").cast("bigint").alias("qty"),
        )
    )
    base = py.filter(F.col("yr") == _IDX_BASE_YR).select(
        "part", F.col("up_m").alias("up0"), F.col("qty").alias("q0")
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    m = (
        py.join(base, "part")
        .groupBy("yr")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.sum(dec("up_m") * F.col("q0")).alias("l_num"),
            F.sum(dec("up0") * F.col("q0")).alias("l_den"),
            F.sum(dec("up_m") * F.col("qty")).alias("p_num"),
            F.sum(dec("up0") * F.col("qty")).alias("p_den"),
        )
    )
    return m.select(
        F.col("yr").cast("int").alias("yr"),
        "n_parts",
        F.expr(
            "cast((l_num * 1000000 - (l_num * 1000000) % l_den) / l_den as bigint)"
        ).alias("laspeyres_ppm"),
        F.expr(
            "cast((p_num * 1000000 - (p_num * 1000000) % p_den) / p_den as bigint)"
        ).alias("paasche_ppm"),
        F.round(
            F.sqrt(
                (F.col("l_num").cast("double") / F.col("l_den").cast("double"))
                * (F.col("p_num").cast("double") / F.col("p_den").cast("double"))
            ),
            6,
        ).alias("fisher_r6"),
    ).orderBy("yr")


# --------------------------------------------------------------------------
# decline-streak pattern detection (gaps-and-islands sequence matching)
# --------------------------------------------------------------------------

_STREAK_MIN = 3
_STREAK_TOP = 50


@register(
    "pattern_decline_streaks",
    sql=f"""
    WITH ms AS (
      SELECT o_custkey AS cust, date_trunc('month', o_orderdate) AS mon,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM orders GROUP BY 1, 2
    ),
    flagged AS (
      SELECT cust, mon, cents,
             CASE WHEN cents < LAG(cents) OVER w THEN 0 ELSE 1 END AS brk
      FROM ms WINDOW w AS (PARTITION BY cust ORDER BY mon)
    ),
    isl AS (
      SELECT cust, mon, cents,
             SUM(brk) OVER (PARTITION BY cust ORDER BY mon
                            ROWS UNBOUNDED PRECEDING) AS grp
      FROM flagged
    ),
    streaks AS (
      SELECT cust, grp, CAST(COUNT(*) AS BIGINT) AS len,
             MIN(mon) AS from_mon, MAX(mon) AS to_mon,
             CAST(MAX(CASE WHEN rn = 1 THEN cents END) AS BIGINT) AS start_c,
             CAST(MAX(CASE WHEN rn_d = 1 THEN cents END) AS BIGINT) AS end_c
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY cust, grp ORDER BY mon) AS rn,
                     ROW_NUMBER() OVER (PARTITION BY cust, grp ORDER BY mon DESC) AS rn_d
            FROM isl)
      GROUP BY cust, grp
      HAVING COUNT(*) >= {_STREAK_MIN}
    )
    SELECT cust, len AS streak_len,
           CAST(from_mon AS DATE) AS from_mon, CAST(to_mon AS DATE) AS to_mon,
           start_c, end_c,
           CAST(start_c - end_c AS BIGINT) AS drop_c
    FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY len DESC, cust, from_mon) AS rnk
          FROM streaks)
    WHERE rnk <= {_STREAK_TOP}
    ORDER BY streak_len DESC, cust, from_mon
    """,
    tags=("analytics", "pattern", "sequence"),
)
def pattern_decline_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-pattern detection without MATCH_RECOGNIZE: maximal runs
    of ≥{_STREAK_MIN} strictly-declining consecutive activity months per
    customer (the churn-risk W-shape every CRM flags), via the classic
    gaps-and-islands rewrite — a decline flag, a running sum of breaks
    as the island id, one rollup per island. Top {_STREAK_TOP} longest
    streaks with their span and total drop.

    A streak is over the customer's OBSERVED activity months (month
    with any order), so an inactive gap does not fabricate a decline.

    Exactness: spend is exact integer cents; islands, lengths, and
    endpoint extraction (ROW_NUMBER from both ends, no FIRST_VALUE
    frame pitfalls) are all integer; no floats anywhere.

    Scale shape: one orders scan into a (customer, month) rollup; the
    lag, island sum, and endpoint windows all share the customer hash
    partitioning; only the ≥{_STREAK_MIN} streak survivors (a tiny
    fraction) reach the global top-k, which is a TakeOrdered heap, not
    a full sort."""
    ms = (
        table(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_custkey").alias("cust"),
            F.date_trunc("month", F.col("o_orderdate")).alias("mon"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
    )
    wm = Window.partitionBy("cust").orderBy("mon")
    flagged = ms.withColumn(
        "brk",
        F.when(F.col("cents") < F.lag("cents").over(wm), 0).otherwise(1),
    )
    isl = flagged.withColumn(
        "grp",
        F.sum("brk").over(wm.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    wg = Window.partitionBy("cust", "grp").orderBy("mon")
    wgd = Window.partitionBy("cust", "grp").orderBy(F.desc("mon"))
    ranked = isl.withColumn("rn", F.row_number().over(wg)).withColumn(
        "rn_d", F.row_number().over(wgd)
    )
    streaks = (
        ranked.groupBy("cust", "grp")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("len"),
            F.min("mon").alias("from_mon"),
            F.max("mon").alias("to_mon"),
            F.max(F.when(F.col("rn") == 1, F.col("cents"))).cast("bigint").alias("start_c"),
            F.max(F.when(F.col("rn_d") == 1, F.col("cents"))).cast("bigint").alias("end_c"),
        )
        .filter(F.col("len") >= _STREAK_MIN)
    )
    # top-k MEMBERSHIP only (rnk is not in the output): orderBy+limit plans
    # as TakeOrderedAndProject — per-partition top-k, one bounded merge —
    # instead of dragging every streak survivor through one partition as
    # the previous unpartitioned rank window did. (cust, from_mon) makes
    # the tiebreak a total order, so the set is deterministic.
    return (
        streaks.orderBy(F.desc("len"), "cust", "from_mon")
        .limit(_STREAK_TOP)
        .select(
            "cust",
            F.col("len").alias("streak_len"),
            F.col("from_mon").cast("date").alias("from_mon"),
            F.col("to_mon").cast("date").alias("to_mon"),
            "start_c",
            "end_c",
            (F.col("start_c") - F.col("end_c")).cast("bigint").alias("drop_c"),
        )
        .orderBy(F.desc("streak_len"), "cust", "from_mon")
    )


@register(
    "regress_theilsen_trend",
    sql="""
    WITH m AS (
      SELECT o_orderpriority AS priority,
             (year(o_orderdate) - 1992) * 12 + month(o_orderdate) - 1 AS mi,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev_cents
      FROM orders GROUP BY o_orderpriority, mi
    ),
    pairs AS (
      SELECT a.priority,
             ROUND(CAST(b.rev_cents - a.rev_cents AS DOUBLE)
                   / (b.mi - a.mi), 6) AS slope,
             a.mi AS mi1, b.mi AS mi2
      FROM m a JOIN m b ON b.priority = a.priority AND b.mi > a.mi
    ),
    ranked AS (
      SELECT priority, slope,
             ROW_NUMBER() OVER (PARTITION BY priority
                                ORDER BY slope, mi1, mi2) AS rn,
             COUNT(*) OVER (PARTITION BY priority) AS cnt
      FROM pairs
    )
    SELECT priority, CAST(cnt AS BIGINT) AS n_pairs,
           slope AS theilsen_slope_cents
    FROM ranked WHERE rn = (cnt + 1) // 2
    ORDER BY priority
    """,
    tags=("analytics", "regression", "robust"),
)
def regress_theilsen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend of monthly revenue per order priority: the
    MEDIAN of all pairwise month-to-month slopes. Unlike OLS
    (orders_linreg_by_priority), a single promotional-spike month cannot
    drag the estimate — the breakdown point is ~29%.

    Exactness: monthly revenue is exact integer cents (orders_yoy_growth's
    rule); each pairwise slope is ONE double division of two exact BIGINTs,
    rounded to 6 decimals before ranking; the median is the deterministic
    LOWER median — row (cnt+1)/2 under (slope, mi1, mi2) total order — so
    both engines pick the identical pair even when slopes tie. No
    double-summation anywhere: the only float op per pair is that single
    mirrored division.

    Scale: the fact table collapses to |priorities|·|months| rows BEFORE the
    pair join, so the pair space is calendar-bounded (≤ months² per group,
    ~3.5k pairs for 7 years) no matter how many orders feed it — the
    classic sketch-then-quadratic shape that stays flat at 100 TB."""
    o = table(spark, sf_dir, "orders")
    m = o.groupBy(
        F.col("o_orderpriority").alias("priority"),
        ((F.year("o_orderdate") - 1992) * 12 + F.month("o_orderdate") - 1).alias("mi"),
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("rev_cents")
    )
    a = m.select("priority", F.col("mi").alias("mi1"), F.col("rev_cents").alias("r1"))
    b = m.select(
        F.col("priority").alias("p2"), F.col("mi").alias("mi2"), F.col("rev_cents").alias("r2")
    )
    pairs = a.join(
        b, (F.col("p2") == F.col("priority")) & (F.col("mi2") > F.col("mi1"))
    ).select(
        "priority",
        F.round((F.col("r2") - F.col("r1")).cast("double") / (F.col("mi2") - F.col("mi1")), 6)
        .alias("slope"),
        "mi1",
        "mi2",
    )
    w = Window.partitionBy("priority")
    ranked = pairs.select(
        "priority",
        "slope",
        F.row_number().over(w.orderBy("slope", "mi1", "mi2")).alias("rn"),
        F.count(F.lit(1)).over(w).alias("cnt"),
    )
    return (
        ranked.filter(F.col("rn") == F.expr("(cnt + 1) div 2"))
        .select(
            "priority",
            F.col("cnt").cast("bigint").alias("n_pairs"),
            F.col("slope").alias("theilsen_slope_cents"),
        )
        .orderBy("priority")
    )


# --------------------------------------------------------------------------
# Holt linear-trend forecast as a broadcast convolution
# --------------------------------------------------------------------------

_HOLT_K = 24        # fit window: 1996-01 .. 1997-12 (month index 48..71)
_HOLT_BASE = 48
_HOLT_SCALE = 1_000_000          # micro-quantized weight fixed point
_HOLT_OFF = 10**15               # positivity offset (multiple of scale)
_HOLT_OFFD = _HOLT_OFF // _HOLT_SCALE


def _holt_weights(k: int) -> tuple[list[int], list[int]]:
    """Exact dyadic-rational Holt coefficients (alpha = beta = 1/2,
    l0 = y0, b0 = y1 - y0), micro-quantized to integers.

    Holt's recursion is LINEAR in the observations, so the final level and
    trend are fixed convolutions l_K = sum c_j y_j, b_K = sum d_j y_j. The
    c_j/d_j are derived here with exact Fractions (denominators are powers
    of two) and rounded once to 1e-6 fixed point; those integer literals
    are then embedded in BOTH the Spark plan and the DuckDB oracle, so the
    statistic is *defined* by the quantized weights — identical on every
    engine, no recursion at query time."""
    from fractions import Fraction

    zero = Fraction(0)
    lvl = {0: Fraction(1)}
    trd = {0: Fraction(-1), 1: Fraction(1)}
    for t in range(1, k):
        prev_l, prev_b = lvl, trd
        lvl = {j: (prev_l.get(j, zero) + prev_b.get(j, zero)) / 2 for j in set(prev_l) | set(prev_b)}
        lvl[t] = lvl.get(t, zero) + Fraction(1, 2)
        trd = {
            j: (lvl.get(j, zero) - prev_l.get(j, zero)) / 2 + prev_b.get(j, zero) / 2
            for j in set(lvl) | set(prev_l) | set(prev_b)
        }
    wl = [int(round(lvl.get(j, zero) * _HOLT_SCALE)) for j in range(k)]
    wb = [int(round(trd.get(j, zero) * _HOLT_SCALE)) for j in range(k)]
    return wl, wb


_HOLT_WL, _HOLT_WB = _holt_weights(_HOLT_K)


@register(
    "forecast_holt_linear",
    sql=f"""
    WITH m AS (
      SELECT o_orderpriority AS priority,
             (year(o_orderdate) - 1992) * 12 + month(o_orderdate) - 1
               - {_HOLT_BASE} AS pos,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev
      FROM orders
      WHERE (year(o_orderdate) - 1992) * 12 + month(o_orderdate) - 1
            BETWEEN {_HOLT_BASE} AND {_HOLT_BASE + _HOLT_K - 1}
      GROUP BY priority, pos
    ),
    p AS (SELECT DISTINCT o_orderpriority AS priority FROM orders),
    cal AS (SELECT p.priority, g.pos
            FROM p CROSS JOIN (SELECT unnest(range({_HOLT_K})) AS pos) g),
    y AS (SELECT c.priority, c.pos, COALESCE(m.rev, 0) AS rev
          FROM cal c LEFT JOIN m ON m.priority = c.priority AND m.pos = c.pos),
    s AS (SELECT priority,
                 CAST(SUM(rev * ({_HOLT_WL})[pos + 1]) AS BIGINT) AS ls,
                 CAST(SUM(rev * ({_HOLT_WB})[pos + 1]) AS BIGINT) AS bs
          FROM y GROUP BY priority)
    SELECT priority,
           CAST((ls + {_HOLT_OFF}) // {_HOLT_SCALE} - {_HOLT_OFFD} AS BIGINT)
             AS level_cents,
           CAST((bs + {_HOLT_OFF}) // {_HOLT_SCALE} - {_HOLT_OFFD} AS BIGINT)
             AS trend_cents,
           CAST((ls + 1 * bs + {_HOLT_OFF}) // {_HOLT_SCALE} - {_HOLT_OFFD}
                AS BIGINT) AS f1_cents,
           CAST((ls + 2 * bs + {_HOLT_OFF}) // {_HOLT_SCALE} - {_HOLT_OFFD}
                AS BIGINT) AS f2_cents,
           CAST((ls + 3 * bs + {_HOLT_OFF}) // {_HOLT_SCALE} - {_HOLT_OFFD}
                AS BIGINT) AS f3_cents
    FROM s ORDER BY priority
    """,
    tags=("analytics", "forecast", "holt"),
)
def forecast_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential-smoothing forecast (level + linear trend,
    alpha = beta = 1/2) of monthly revenue per priority, h = 1..3 months
    ahead — the trend-aware upgrade of forecast_ewma_revenue.

    The trick that makes it distributed-exact: Holt's recursion is linear,
    so instead of iterating state month-by-month (a serial scan), the final
    (level, trend) is a FIXED 24-tap convolution over the window — the
    exact dyadic coefficients are derived once at import (_holt_weights),
    micro-quantized, and embedded as literals in both engines. The query is
    then one groupBy + one weighted dot product: no recursion, no window
    scan, no state. Missing months enter as exact zero revenue via a
    calendar left join (gap = no sales, the backlog-timeseries rule).

    Integer discipline: monthly revenue is exact cents; ls/bs are exact
    BIGINT dot products (|w| <= 1e6, 24 taps — overflow headroom to ~4e11
    cents/month, documented); the final div is positivity-shifted by
    {_HOLT_OFF} so DuckDB's floor `//` and Spark's truncating `div` agree
    even when the trend is negative.

    Scale: the fact table collapses to |priorities|*24 rows before any
    arithmetic; the weight vectors ride inside the plan as literals. At
    100 TB this is a map-side partial agg plus a 120-row reduce."""
    o = table(spark, sf_dir, "orders")
    mi = (F.year("o_orderdate") - 1992) * 12 + F.month("o_orderdate") - 1
    m = (
        o.filter((mi >= _HOLT_BASE) & (mi <= _HOLT_BASE + _HOLT_K - 1))
        .groupBy(
            F.col("o_orderpriority").alias("priority"),
            (mi - _HOLT_BASE).alias("pos"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("rev")
        )
    )
    p = o.select(F.col("o_orderpriority").alias("priority")).distinct()
    cal = p.crossJoin(
        spark.range(_HOLT_K).select(F.col("id").cast("int").alias("pos"))
    )
    y = (
        cal.join(m, ["priority", "pos"], "left")
        .select("priority", "pos", F.coalesce("rev", F.lit(0)).alias("rev"))
    )
    wl_arr = "array(" + ",".join(str(w) for w in _HOLT_WL) + ")"
    wb_arr = "array(" + ",".join(str(w) for w in _HOLT_WB) + ")"
    s = y.groupBy("priority").agg(
        F.sum(F.expr(f"rev * {wl_arr}[pos]")).cast("bigint").alias("ls"),
        F.sum(F.expr(f"rev * {wb_arr}[pos]")).cast("bigint").alias("bs"),
    )
    def _q(expr: str) -> F.Column:
        return F.expr(f"({expr} + {_HOLT_OFF}) div {_HOLT_SCALE} - {_HOLT_OFFD}").cast("bigint")

    return s.select(
        "priority",
        _q("ls").alias("level_cents"),
        _q("bs").alias("trend_cents"),
        _q("ls + 1 * bs").alias("f1_cents"),
        _q("ls + 2 * bs").alias("f2_cents"),
        _q("ls + 3 * bs").alias("f3_cents"),
    ).orderBy("priority")


# --------------------------------------------------------------------------
# calendar gap audit (gaps-and-islands without a global sort)
# --------------------------------------------------------------------------

_GAP_BUCKET = 256  # day-number bucket width for the two-level island scan
_GAP_TOP = 20


@register(
    "audit_orderdate_gaps",
    sql=f"""
    WITH k AS (
      SELECT DISTINCT datediff('day', DATE '1970-01-01', o_orderdate) AS k,
             datediff('day', DATE '1970-01-01', o_orderdate) // {_GAP_BUCKET} AS b
      FROM orders
    ),
    intra AS (
      SELECT k + 1 AS gap_start, nxt - k - 1 AS gap_len
      FROM (SELECT k, LEAD(k) OVER (PARTITION BY b ORDER BY k) AS nxt FROM k)
      WHERE nxt - k > 1
    ),
    bkt AS (SELECT b, MIN(k) AS bmin, MAX(k) AS bmax FROM k GROUP BY b),
    inter AS (
      SELECT bmax + 1 AS gap_start, nmin - bmax - 1 AS gap_len
      FROM (SELECT bmax, LEAD(bmin) OVER (ORDER BY b) AS nmin FROM bkt)
      WHERE nmin - bmax > 1
    ),
    gaps AS (SELECT * FROM intra UNION ALL SELECT * FROM inter)
    SELECT DATE '1970-01-01' + CAST(gap_start AS INTEGER) AS gap_start_date,
           CAST(gap_len AS BIGINT) AS gap_days,
           CAST(rnk AS INTEGER) AS rnk
    FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY gap_len DESC, gap_start) AS rnk
          FROM gaps)
    WHERE rnk <= {_GAP_TOP}
    ORDER BY rnk
    """,
    tags=("audit", "gaps-islands", "two-level-prefix"),
)
def audit_orderdate_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{_GAP_TOP} runs of calendar days with ZERO orders — the outage
    audit that separates ordinary weekday noise from "ingestion was down
    for a week": a loader outage shows up as one anomalously long run.

    Gaps-and-islands WITHOUT a global sort: distinct active day-numbers
    bucket by {_GAP_BUCKET}-day ranges, LEAD() finds runs inside each
    bounded bucket partition, and cross-bucket runs come from a LEAD over
    the tiny present-bucket table (max of one bucket -> min of the next) —
    buckets with no active days fold into the inter-bucket run
    automatically. Runs before the first / after the last active day are
    undefined domain, not outage, and are excluded by construction.

    Scale: the fact table collapses to distinct active days first
    (calendar-bounded), so the island scan is over at most span-days rows
    regardless of order volume; the only unpartitioned state is the bucket
    summary (span/{_GAP_BUCKET} rows) and the final top-k (TakeOrdered)."""
    o = (
        table(spark, sf_dir, "orders")
        .select(F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date")).alias("k"))
        .distinct()
        .withColumn("b", F.expr(f"k div {_GAP_BUCKET}"))
    )
    wb = Window.partitionBy("b").orderBy("k")
    intra = (
        o.select("k", F.lead("k").over(wb).alias("nxt"))
        .filter(F.col("nxt") - F.col("k") > 1)
        .select((F.col("k") + 1).alias("gap_start"), (F.col("nxt") - F.col("k") - 1).alias("gap_len"))
    )
    bkt = o.groupBy("b").agg(F.min("k").alias("bmin"), F.max("k").alias("bmax"))
    inter = (
        bkt.select("bmax", F.lead("bmin").over(Window.orderBy("b")).alias("nmin"))
        .filter(F.col("nmin") - F.col("bmax") > 1)
        .select(
            (F.col("bmax") + 1).alias("gap_start"),
            (F.col("nmin") - F.col("bmax") - 1).alias("gap_len"),
        )
    )
    gaps = intra.unionAll(inter)
    top = gaps.orderBy(F.desc("gap_len"), "gap_start").limit(_GAP_TOP)
    w = Window.orderBy(F.desc("gap_len"), "gap_start")
    return (
        top.withColumn("rnk", F.row_number().over(w).cast("int"))
        .select(
            F.date_add(F.lit("1970-01-01").cast("date"), F.col("gap_start").cast("int"))
            .alias("gap_start_date"),
            F.col("gap_len").cast("bigint").alias("gap_days"),
            "rnk",
        )
        .orderBy("rnk")
    )


# --------------------------------------------------------------------------
# RFM segment-migration matrix (period-over-period customer movement)
# --------------------------------------------------------------------------

_MIG_Y1, _MIG_Y2 = 1997, 1998
_MIG_FREQ = 3                  # orders/period for the "frequent" tier
_MIG_SPEND = 300_000_00        # period spend (cents) for the "big ticket" tier


def _mig_seg_sql(n: str, s: str) -> str:
    return f"""CASE WHEN {n} IS NULL THEN 'inactive'
         WHEN {n} >= {_MIG_FREQ} AND {s} >= {_MIG_SPEND} THEN 'vip'
         WHEN {n} >= {_MIG_FREQ} THEN 'frequent'
         WHEN {s} >= {_MIG_SPEND} THEN 'big_ticket'
         ELSE 'casual' END"""


@register(
    "orders_rfm_migration",
    sql=f"""
    WITH p AS (
      SELECT o_custkey, year(o_orderdate) AS y, COUNT(*) AS n,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS s
      FROM orders
      WHERE year(o_orderdate) IN ({_MIG_Y1}, {_MIG_Y2})
      GROUP BY 1, 2
    ),
    a AS (SELECT o_custkey, n, s FROM p WHERE y = {_MIG_Y1}),
    b AS (SELECT o_custkey, n, s FROM p WHERE y = {_MIG_Y2}),
    m AS (
      SELECT {_mig_seg_sql("a.n", "a.s")} AS seg_from,
             {_mig_seg_sql("b.n", "b.s")} AS seg_to
      FROM a FULL JOIN b ON b.o_custkey = a.o_custkey
    ),
    cell AS (SELECT seg_from, seg_to, CAST(COUNT(*) AS BIGINT) AS n_customers
             FROM m GROUP BY 1, 2),
    rowt AS (SELECT seg_from, CAST(SUM(n_customers) AS BIGINT) AS row_total
             FROM cell GROUP BY 1)
    SELECT c.seg_from, c.seg_to, c.n_customers,
           CAST(c.n_customers * 1000000 // r.row_total AS BIGINT) AS share_of_from_ppm
    FROM cell c JOIN rowt r ON r.seg_from = c.seg_from
    ORDER BY c.seg_from, c.seg_to
    """,
    tags=("analytics", "rfm", "migration"),
)
def orders_rfm_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer segment-migration matrix between {_MIG_Y1} and {_MIG_Y2}:
    each customer lands in a fixed-threshold RFM tier per period (vip /
    frequent / big_ticket / casual, 'inactive' when absent), and the matrix
    counts movement — the lifecycle report behind churn alarms ("vip →
    inactive") and upsell targeting ("casual → frequent"). Fixed integer
    thresholds keep it deterministic where quantile tiers
    (orders_rfm_segments) would couple the tier boundary to the corpus.

    Only customers active in at least one period appear (a FULL JOIN of
    the two period aggregates); the all-inactive diagonal cell is
    structurally impossible, so every row is signal. Shares are exact
    integer ppm of the origin row.

    Scale: one year-filtered keyed agg (partition-prunable on date), one
    custkey full join, then the matrix is |tiers|² rows. Nothing beyond
    the per-period agg ever sees order volume."""
    o = table(spark, sf_dir, "orders")
    p = (
        o.filter(F.year("o_orderdate").isin(_MIG_Y1, _MIG_Y2))
        .groupBy("o_custkey", F.year("o_orderdate").alias("y"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("s"),
        )
    )
    a = p.filter(F.col("y") == _MIG_Y1).select(
        F.col("o_custkey").alias("ka"), F.col("n").alias("na"), F.col("s").alias("sa")
    )
    b = p.filter(F.col("y") == _MIG_Y2).select(
        F.col("o_custkey").alias("kb"), F.col("n").alias("nb"), F.col("s").alias("sb")
    )
    m = a.join(b, a["ka"] == b["kb"], "full").select(
        F.expr(_mig_seg_sql("na", "sa")).alias("seg_from"),
        F.expr(_mig_seg_sql("nb", "sb")).alias("seg_to"),
    )
    cell = m.groupBy("seg_from", "seg_to").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers")
    )
    roww = Window.partitionBy("seg_from")
    return (
        cell.withColumn("row_total", F.sum("n_customers").over(roww))
        .select(
            "seg_from",
            "seg_to",
            "n_customers",
            F.expr("n_customers * 1000000 div row_total").cast("bigint").alias("share_of_from_ppm"),
        )
        .orderBy("seg_from", "seg_to")
    )


# --------------------------------------------------------------------------
# Little's law conservation audit (L = lambda * W, exact integer forms)
# --------------------------------------------------------------------------

_LL_Y = 1997
_LL_OFF = 1_000_000_000  # positivity offset for the signed gap division


@register(
    "orders_littles_law_audit",
    sql=f"""
    WITH shipped AS (
      SELECT o.o_orderkey,
             datediff('day', DATE '1970-01-01', o.o_orderdate) AS d_ord,
             MAX(datediff('day', DATE '1970-01-01', l.l_shipdate)) AS d_ship
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2
    ),
    win AS (
      SELECT datediff('day', DATE '1970-01-01', DATE '{_LL_Y}-01-01') AS d0,
             datediff('day', DATE '1970-01-01', DATE '{_LL_Y + 1}-01-01') - 1 AS d1
    ),
    arr AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_arr,
             CAST(SUM(d_ship - d_ord) AS BIGINT) AS sum_w
      FROM shipped, win WHERE d_ord BETWEEN win.d0 AND win.d1
    ),
    occ AS (
      SELECT CAST(SUM(GREATEST(0, LEAST(d_ship - 1, win.d1) - GREATEST(d_ord, win.d0) + 1))
                  AS BIGINT) AS sum_open
      FROM shipped, win
    ),
    base AS (
      SELECT arr.n_arr, arr.sum_w, occ.sum_open,
             (win.d1 - win.d0 + 1) AS n_days
      FROM arr, occ, win
    )
    SELECT n_arr,
           CAST(n_arr * 1000000 // n_days AS BIGINT) AS lambda_micro,
           CAST(sum_w * 1000000 // n_arr AS BIGINT) AS w_days_micro,
           CAST(sum_w * 1000000 // n_days AS BIGINT) AS l_pred_micro,
           CAST(sum_open * 1000000 // n_days AS BIGINT) AS l_obs_micro,
           CAST(((sum_open - sum_w) * 1000000 + {_LL_OFF} * sum_w) // sum_w
                - {_LL_OFF} AS BIGINT) AS gap_ppm
    FROM base
    """,
    tags=("analytics", "queueing", "littles-law"),
)
def orders_littles_law_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Little's-law conservation audit over {_LL_Y}: time-averaged open
    orders L (exact interval-overlap day sum over the year) versus
    λ·W (arrival rate × mean days-to-fully-shipped of that year's
    arrivals). For a stationary system the two are EQUAL — the reported
    gap_ppm measures precisely the non-stationarity / boundary effects
    (orders open across the year edges), which is the sanity check
    operations teams run before trusting any queueing-model capacity
    plan. An order is "in system" from orderdate until its LAST line
    ships (the backlog-timeseries rule).

    Exactness: every quantity is an integer day sum; the three rates are
    single micro-divs; the signed gap uses the positivity-shifted div so
    floor and truncate agree when L_obs < L_pred. The identity
    L_pred = λ·W holds exactly in integers (both equal sum_w/days), so
    gap_ppm isolates ONLY the boundary term — no arithmetic noise.

    Scale: one order-keyed agg over lineitem (the ship-date max), then
    three scalar folds; the year window is a broadcast scalar pair."""
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.datediff("o_orderdate", F.lit("1970-01-01").cast("date")).alias("d_ord"),
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.datediff("l_shipdate", F.lit("1970-01-01").cast("date")).alias("d_shp"),
    )
    shipped = (
        o.join(li, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderkey", "d_ord")
        .agg(F.max("d_shp").alias("d_ship"))
    )
    from datetime import date

    d0 = (date(_LL_Y, 1, 1) - date(1970, 1, 1)).days
    d1 = (date(_LL_Y + 1, 1, 1) - date(1970, 1, 1)).days - 1
    n_days = d1 - d0 + 1
    arr = shipped.filter((F.col("d_ord") >= d0) & (F.col("d_ord") <= d1)).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_arr"),
        F.sum(F.col("d_ship") - F.col("d_ord")).cast("bigint").alias("sum_w"),
    )
    occ = shipped.agg(
        F.sum(
            F.greatest(
                F.lit(0),
                F.least(F.col("d_ship") - 1, F.lit(d1))
                - F.greatest(F.col("d_ord"), F.lit(d0))
                + 1,
            )
        )
        .cast("bigint")
        .alias("sum_open")
    )
    base = arr.crossJoin(occ)
    return base.select(
        "n_arr",
        F.expr(f"n_arr * 1000000 div {n_days}").cast("bigint").alias("lambda_micro"),
        F.expr("sum_w * 1000000 div n_arr").cast("bigint").alias("w_days_micro"),
        F.expr(f"sum_w * 1000000 div {n_days}").cast("bigint").alias("l_pred_micro"),
        F.expr(f"sum_open * 1000000 div {n_days}").cast("bigint").alias("l_obs_micro"),
        F.expr(
            f"((sum_open - sum_w) * 1000000 + {_LL_OFF} * sum_w) div sum_w - {_LL_OFF}"
        )
        .cast("bigint")
        .alias("gap_ppm"),
    )


# --------------------------------------------------------------------------
# SPC control chart (Shewhart 3-sigma + Western Electric run rule, exact)
# --------------------------------------------------------------------------

_SPC_BASE_Y = 1995       # baseline year: control limits frozen here
_SPC_EVAL_Y = (1996, 1997)
_SPC_RUN = 8             # run-rule length (consecutive same-side points)


@register(
    "orders_spc_control_chart",
    sql=f"""
    WITH wk AS (
      SELECT o_orderpriority AS priority,
             datediff('day', DATE '1970-01-01', o_orderdate) // 7 AS week,
             year(o_orderdate) AS y,
             COUNT(*) AS x
      FROM orders
      WHERE year(o_orderdate) IN ({_SPC_BASE_Y}, {", ".join(str(y) for y in _SPC_EVAL_Y)})
      GROUP BY 1, 2, 3
    ),
    base AS (
      SELECT priority, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS s, CAST(SUM(x * x) AS BIGINT) AS ss
      FROM wk WHERE y = {_SPC_BASE_Y} GROUP BY 1
    ),
    ev AS (
      SELECT w.priority, w.week, CAST(w.x AS BIGINT) AS x, b.n, b.s, b.ss,
             CASE WHEN w.x * b.n > b.s THEN 1 ELSE 0 END AS above
      FROM wk w JOIN base b ON b.priority = w.priority
      WHERE w.y IN ({", ".join(str(y) for y in _SPC_EVAL_Y)})
    ),
    sig AS (
      SELECT *,
             CASE WHEN (x * n - s) * (x * n - s) > 9 * n * (n * ss - s * s)
                  THEN 1 ELSE 0 END AS rule_3sigma
      FROM ev
    ),
    runs AS (
      SELECT *,
             week - ROW_NUMBER() OVER (PARTITION BY priority, above
                                       ORDER BY week) AS grp
      FROM sig
    ),
    runlen AS (
      SELECT *, COUNT(*) OVER (PARTITION BY priority, above, grp) AS rl,
             MIN(week) OVER (PARTITION BY priority, above, grp) AS run_start
      FROM runs
    ),
    flagged AS (
      SELECT priority, week, x, above,
             CAST(rule_3sigma AS INTEGER) AS rule_3sigma,
             CASE WHEN rl >= {_SPC_RUN} THEN 1 ELSE 0 END AS rule_run8
      FROM runlen
    )
    SELECT priority, CAST(week AS BIGINT) AS week, x,
           CAST(above AS INTEGER) AS above, rule_3sigma,
           CAST(rule_run8 AS INTEGER) AS rule_run8
    FROM flagged
    WHERE rule_3sigma = 1 OR rule_run8 = 1
    ORDER BY priority, week
    """,
    tags=("analytics", "spc", "control-chart"),
)
def orders_spc_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shewhart control chart over weekly order counts per priority:
    control limits are FROZEN on the {_SPC_BASE_Y} baseline (the SPC
    discipline — limits from a stable reference period, never refit on
    the data being judged), then {_SPC_EVAL_Y} weeks are flagged by two
    Western Electric rules: a point beyond 3σ, or {_SPC_RUN}+ consecutive
    points on the same side of the centerline (a mean SHIFT too small for
    the 3σ rule to see).

    Exactness without a single double: the 3σ test cross-multiplies to
    (x·n − S)² > 9·n·(n·Σx² − S²) — exact integers end to end; weeks are
    epoch-day div 7 (no ISO-week engine quirks); the run rule is the
    gaps-and-islands trick (week − ROW_NUMBER() per side) with an exact
    per-island length.

    Scale: one (priority, week) rollup — calendar-bounded — then windows
    partitioned by the 5-value priority key over ≤ 104 weeks each. The
    fact scan is the only data-sized stage, and it is partition-prunable
    on the year filter."""
    o = table(spark, sf_dir, "orders")
    wk = (
        o.filter(F.year("o_orderdate").isin(_SPC_BASE_Y, *_SPC_EVAL_Y))
        .groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.expr("datediff(o_orderdate, date '1970-01-01') div 7").alias("week"),
            F.year("o_orderdate").alias("y"),
        )
        .agg(F.count(F.lit(1)).alias("x"))
    )
    base = (
        wk.filter(F.col("y") == _SPC_BASE_Y)
        .groupBy("priority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("x").cast("bigint").alias("s"),
            F.sum(F.col("x") * F.col("x")).cast("bigint").alias("ss"),
        )
    )
    ev = (
        wk.filter(F.col("y").isin(*_SPC_EVAL_Y))
        .join(F.broadcast(base), "priority")
        .select(
            "priority",
            "week",
            F.col("x").cast("bigint").alias("x"),
            "n",
            "s",
            "ss",
            F.when(F.col("x") * F.col("n") > F.col("s"), 1).otherwise(0).alias("above"),
        )
    )
    sig = ev.withColumn(
        "rule_3sigma",
        F.when(
            (F.col("x") * F.col("n") - F.col("s")) * (F.col("x") * F.col("n") - F.col("s"))
            > 9 * F.col("n") * (F.col("n") * F.col("ss") - F.col("s") * F.col("s")),
            1,
        ).otherwise(0),
    )
    wrn = Window.partitionBy("priority", "above").orderBy("week")
    runs = sig.withColumn("grp", F.col("week") - F.row_number().over(wrn))
    wisland = Window.partitionBy("priority", "above", "grp")
    runlen = runs.withColumn("rl", F.count(F.lit(1)).over(wisland))
    return (
        runlen.select(
            "priority",
            F.col("week").cast("bigint").alias("week"),
            "x",
            F.col("above").cast("int").alias("above"),
            F.col("rule_3sigma").cast("int").alias("rule_3sigma"),
            F.when(F.col("rl") >= _SPC_RUN, 1).otherwise(0).cast("int").alias("rule_run8"),
        )
        .filter((F.col("rule_3sigma") == 1) | (F.col("rule_run8") == 1))
        .orderBy("priority", "week")
    )


@register(
    "forecast_hierarchy_reconcile",
    sql=f"""
    WITH m AS (
      SELECT o_orderpriority AS priority,
             (year(o_orderdate) - 1992) * 12 + month(o_orderdate) - 1
               - {_HOLT_BASE} AS pos,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev
      FROM orders
      WHERE (year(o_orderdate) - 1992) * 12 + month(o_orderdate) - 1
            BETWEEN {_HOLT_BASE} AND {_HOLT_BASE + _HOLT_K - 1}
      GROUP BY priority, pos
    ),
    p AS (SELECT DISTINCT o_orderpriority AS priority FROM orders),
    cal AS (SELECT p.priority, g.pos
            FROM p CROSS JOIN (SELECT unnest(range({_HOLT_K})) AS pos) g),
    y AS (SELECT c.priority, c.pos, COALESCE(m.rev, 0) AS rev
          FROM cal c LEFT JOIN m ON m.priority = c.priority AND m.pos = c.pos),
    s AS (SELECT priority,
                 CAST(SUM(rev * ({_HOLT_WL})[pos + 1]) AS BIGINT) AS ls,
                 CAST(SUM(rev * ({_HOLT_WB})[pos + 1]) AS BIGINT) AS bs,
                 CAST(SUM(rev) AS BIGINT) AS hist
          FROM y GROUP BY priority),
    f AS (SELECT priority, hist,
                 CAST((ls + bs + {_HOLT_OFF}) // {_HOLT_SCALE} - {_HOLT_OFFD}
                      AS BIGINT) AS f1
          FROM s),
    tot AS (SELECT CAST(SUM(f1) AS BIGINT) AS bu_total,
                   CAST(SUM(hist) AS BIGINT) AS hist_total FROM f),
    -- the DIRECT total forecast: Holt on the summed series. Linearity of
    -- the convolution makes it EQUAL to sum(ls)+sum(bs) before the shared
    -- quantizing div — so the only coherence gap is per-series rounding.
    direct AS (
      SELECT CAST((SUM(s.ls) + SUM(s.bs) + {_HOLT_OFF}) // {_HOLT_SCALE}
                  - {_HOLT_OFFD} AS BIGINT) AS direct_total
      FROM s
    )
    SELECT f.priority, f.f1 AS bottomup_cents,
           CAST(direct.direct_total * (f.hist * 1000000 // tot.hist_total)
                // 1000000 AS BIGINT) AS topdown_cents,
           tot.bu_total, direct.direct_total,
           CAST((tot.bu_total - direct.direct_total) * 1000000
                // direct.direct_total AS BIGINT) AS coherence_gap_ppm
    FROM f CROSS JOIN tot CROSS JOIN direct
    ORDER BY f.priority
    """,
    tags=("analytics", "forecast", "reconciliation"),
)
def forecast_hierarchy_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical forecast reconciliation over the priority hierarchy:
    BOTTOM-UP (sum of per-priority Holt forecasts) vs TOP-DOWN (the
    direct total forecast split by historical shares), with the
    coherence gap between the two totals. The punchline is structural:
    Holt is a LINEAR convolution (forecast_holt_linear), so the direct
    total forecast equals the sum of per-series forecasts up to the
    per-series quantizing division — the reported gap_ppm measures
    EXACTLY that rounding, proving the hierarchy is coherent by
    construction (nonlinear forecasters make this gap real, and this
    report is how you'd see it).

    Integer discipline inherited wholesale from forecast_holt_linear:
    exact cents, literal micro-weights, positivity-shifted divs;
    top-down shares quantize once to integer micro (hist·10⁶ div total)
    before the leaf multiply, keeping every product inside BIGINT.

    Scale: identical to the underlying forecast — |priorities|·24 rows
    after the first agg."""
    o = table(spark, sf_dir, "orders")
    mi = (F.year("o_orderdate") - 1992) * 12 + F.month("o_orderdate") - 1
    m = (
        o.filter((mi >= _HOLT_BASE) & (mi <= _HOLT_BASE + _HOLT_K - 1))
        .groupBy(
            F.col("o_orderpriority").alias("priority"),
            (mi - _HOLT_BASE).alias("pos"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("rev")
        )
    )
    p = o.select(F.col("o_orderpriority").alias("priority")).distinct()
    cal = p.crossJoin(spark.range(_HOLT_K).select(F.col("id").cast("int").alias("pos")))
    y = cal.join(m, ["priority", "pos"], "left").select(
        "priority", "pos", F.coalesce("rev", F.lit(0)).alias("rev")
    )
    wl_arr = "array(" + ",".join(str(w) for w in _HOLT_WL) + ")"
    wb_arr = "array(" + ",".join(str(w) for w in _HOLT_WB) + ")"
    s = y.groupBy("priority").agg(
        F.sum(F.expr(f"rev * {wl_arr}[pos]")).cast("bigint").alias("ls"),
        F.sum(F.expr(f"rev * {wb_arr}[pos]")).cast("bigint").alias("bs"),
        F.sum("rev").cast("bigint").alias("hist"),
    )
    f = s.select(
        "priority",
        "hist",
        F.expr(f"(ls + bs + {_HOLT_OFF}) div {_HOLT_SCALE} - {_HOLT_OFFD}")
        .cast("bigint")
        .alias("f1"),
    )
    tot = f.agg(
        F.sum("f1").cast("bigint").alias("bu_total"),
        F.sum("hist").cast("bigint").alias("hist_total"),
    )
    direct = s.agg(
        F.expr(f"(sum(ls) + sum(bs) + {_HOLT_OFF}) div {_HOLT_SCALE} - {_HOLT_OFFD}")
        .cast("bigint")
        .alias("direct_total")
    )
    return (
        f.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(direct))
        .select(
            "priority",
            F.col("f1").alias("bottomup_cents"),
            F.expr("direct_total * (hist * 1000000 div hist_total) div 1000000")
            .cast("bigint")
            .alias("topdown_cents"),
            "bu_total",
            "direct_total",
            F.expr("(bu_total - direct_total) * 1000000 div direct_total")
            .cast("bigint")
            .alias("coherence_gap_ppm"),
        )
        .orderBy("priority")
    )


@register(
    "orders_max_drawdown",
    sql="""
    WITH m AS (
      SELECT (year(o_orderdate) - 1992) * 12 + month(o_orderdate) - 1 AS mi,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev
      FROM orders GROUP BY mi
    ),
    d AS (
      SELECT mi, rev,
             MAX(rev) OVER (ORDER BY mi
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak_rev,
             MAX(rev) OVER (ORDER BY mi
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - rev
               AS drawdown,
             CAST((MAX(rev) OVER (ORDER BY mi
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - rev)
                  * 1000000
                  // MAX(rev) OVER (ORDER BY mi
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS drawdown_ppm
      FROM m
    )
    SELECT CAST(mi AS BIGINT) AS month_index, rev AS rev_cents,
           peak_rev AS peak_cents,
           CAST(drawdown AS BIGINT) AS drawdown_cents, drawdown_ppm,
           CAST(rnk AS INTEGER) AS rnk
    FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY drawdown_ppm DESC, mi) AS rnk FROM d)
    WHERE rnk <= 10
    ORDER BY rnk
    """,
    tags=("analytics", "drawdown", "risk"),
)
def orders_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of monthly revenue: each month's shortfall from
    the running historical peak, ranked — the risk metric that answers
    "how bad did it get, from the best month we'd ever had?" (finance's
    peak-to-trough measure applied to the revenue series; the drawdown
    complement of pattern_decline_streaks' run-length view: a streak
    says HOW LONG it fell, drawdown says HOW FAR below the high-water
    mark it sat).

    Exact integer cents; drawdown_ppm is one integer div against the
    running peak (both operands exact); top-10 by (ppm, month) total
    order.

    Scale: the fact table folds to ≤ |months| rows first; the running
    windows operate on the calendar-bounded series (the WindowExec
    single-partition warning applies to ~80 rows — the adjudicated
    two-level prefix pattern would replace it on an unbounded series)."""
    o = table(spark, sf_dir, "orders")
    m = o.groupBy(
        ((F.year("o_orderdate") - 1992) * 12 + F.month("o_orderdate") - 1).alias("mi")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("rev")
    )
    wrun = Window.orderBy("mi").rowsBetween(Window.unboundedPreceding, 0)
    d = m.select(
        "mi",
        "rev",
        F.max("rev").over(wrun).alias("peak_rev"),
    ).select(
        "mi",
        "rev",
        "peak_rev",
        (F.col("peak_rev") - F.col("rev")).alias("drawdown"),
        F.expr("(peak_rev - rev) * 1000000 div peak_rev").cast("bigint").alias("drawdown_ppm"),
    )
    wr = Window.orderBy(F.desc("drawdown_ppm"), "mi")
    return (
        d.withColumn("rnk", F.row_number().over(wr).cast("int"))
        .filter(F.col("rnk") <= 10)
        .select(
            F.col("mi").cast("bigint").alias("month_index"),
            F.col("rev").alias("rev_cents"),
            F.col("peak_rev").alias("peak_cents"),
            F.col("drawdown").cast("bigint").alias("drawdown_cents"),
            "drawdown_ppm",
            "rnk",
        )
        .orderBy("rnk")
    )
