"""Round-4 wave-3 operator tests (batch 2): time-weighted average, PSI
drift, Zipf slope, bounded weighted SSSP."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


# --------------------------------------------------------------------------
# events_time_weighted_value
# --------------------------------------------------------------------------


def test_twap_exact_on_fixture(spark, tmp_path):
    """Hand-computed step function: value 10 held for 3s, 2 for 1s →
    TWAP = (10*3 + 2*1) / 4 = 8.0. The trailing event contributes no
    interval."""
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "event_id": [1, 2, 3],
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:00", "2024-01-01 00:00:03", "2024-01-01 00:00:04"]
            ),
            "user_id": [7, 7, 7],
            "event_type": ["a", "a", "a"],
            "value": [10.0, 2.0, 99.0],
            "props": ["{}", "{}", "{}"],
        }
    )
    d = tmp_path / "fix"
    d.mkdir()
    pdf.to_parquet(d / "events.parquet")

    from pumle_spark.workload.events import events_time_weighted_value

    rows = events_time_weighted_value(spark, str(d)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.user_id == 7
    assert r.n_intervals == 2
    assert r.span_us == 4_000_000
    assert r.twap_value == 8.0


def test_twap_bounded_by_value_range(spark):
    """On real data every TWAP must sit inside [min(value), max(value)] of
    that user's non-final events — a weighted mean cannot escape its
    support."""
    from pumle_spark.tables import table
    from pumle_spark.workload.events import events_time_weighted_value
    from pyspark.sql import Window

    got = {r.user_id: r.twap_value for r in events_time_weighted_value(spark, SF).collect()}
    e = table(spark, SF, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    bounded = (
        e.withColumn("rn_desc", F.row_number().over(
            Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
        ))
        .filter(F.col("rn_desc") > 1)  # last event holds no interval
        .groupBy("user_id")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    )
    for r in bounded.collect():
        if r.user_id in got:
            assert r.lo - 1e-6 <= got[r.user_id] <= r.hi + 1e-6


# --------------------------------------------------------------------------
# drift_psi_totalprice
# --------------------------------------------------------------------------


def test_psi_total_matches_term_sum_and_is_nonnegative(spark):
    """PSI is a sum of (p-q)ln(p/q) terms, each of which is >= 0 (p-q and
    ln(p/q) share sign); the broadcast total must equal the term sum."""
    from pumle_spark.workload.drift import drift_psi_totalprice

    rows = drift_psi_totalprice(spark, SF).collect()
    assert rows
    totals = {r.psi_total for r in rows}
    assert len(totals) == 1  # same total on every row
    total = totals.pop()
    assert total >= 0
    assert abs(total - sum(r.psi_term for r in rows)) < 1e-5
    for r in rows:
        assert r.psi_term >= -1e-12


def test_psi_zero_on_identical_halves(spark, tmp_path):
    """If both halves draw the identical rows, every smoothed proportion
    matches and PSI is exactly 0."""
    import pandas as pd

    base = pd.DataFrame(
        {
            "o_orderkey": range(8),
            "o_custkey": [1] * 8,
            "o_orderstatus": ["O"] * 8,
            "o_totalprice": [10_000.0, 60_000.0, 120_000.0, 480_000.0] * 2,
            "o_orderdate": pd.to_datetime(["1996-06-01"] * 4 + ["1999-06-01"] * 4),
            "o_orderpriority": ["1-URGENT"] * 8,
        }
    )
    d = tmp_path / "fix"
    d.mkdir()
    # micros, not pandas' default nanos — the real orders table is micros
    base.to_parquet(d / "orders.parquet", coerce_timestamps="us")

    from pumle_spark.workload.drift import drift_psi_totalprice

    rows = drift_psi_totalprice(spark, str(d)).collect()
    assert rows
    for r in rows:
        assert r.psi_term == 0.0
        assert r.psi_total == 0.0


# --------------------------------------------------------------------------
# text_zipf_slope
# --------------------------------------------------------------------------


def test_zipf_slope_exact_on_planted_distribution(spark, tmp_path):
    """A corpus manufactured with count(rank r) = 64 >> (r-1) (halving —
    an exact Zipf law with exponent -log(2)-per-doubling) must fit the
    OLS slope computed by a plain python replica of the same quantized
    arithmetic."""
    import pandas as pd

    # token "t<r>" appears 2^(7-r) times, r = 1..6
    texts = []
    for r in range(1, 7):
        texts.extend([f"t{r}"] * (1 << (7 - r)))
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["planted"] * len(texts),
            "n_chars": [2] * len(texts),
        }
    )
    d = tmp_path / "fix"
    d.mkdir()
    pdf.to_parquet(d / "documents.parquet")

    from pumle_spark.workload.text import text_zipf_slope

    rows = text_zipf_slope(spark, str(d)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_points == 6
    assert r.top_count == 64

    xs = [round(math.log(k) * 1e6) for k in range(1, 7)]
    ys = [round(math.log(1 << (7 - k)) * 1e6) for k in range(1, 7)]
    n = 6
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    want = round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
    assert r.zipf_slope == want
    # halving counts over ranks ~ slope clearly negative
    assert r.zipf_slope < -0.5


def test_zipf_slope_negative_on_real_corpus(spark):
    from pumle_spark.workload.text import text_zipf_slope

    rows = text_zipf_slope(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.zipf_slope < 0  # natural-ish text always decays


# --------------------------------------------------------------------------
# graph_sssp_bounded
# --------------------------------------------------------------------------


def test_sssp_matches_driver_side_bellman_ford(spark):
    """Collect the weighted edge list (tiny at sf0.001) and run the same
    bounded relaxation in plain python; the top-k tables must agree
    exactly."""
    from pumle_spark.tables import table
    from pumle_spark.workload.graph import _SSSP_ITERS, _SSSP_TOP, graph_sssp_bounded

    o = table(spark, SF, "orders").select("o_orderkey", "o_custkey")
    li = table(spark, SF, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
    )
    wp = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .agg(F.min("cents").alias("w"))
        .collect()
    )
    edges = {}
    for r in wp:
        a, b = 2 * r.c, 2 * r.s + 1
        edges.setdefault(a, []).append((b, r.w))
        edges.setdefault(b, []).append((a, r.w))
    seed = min(2 * r.c for r in wp)
    dist = {seed: 0}
    for _ in range(_SSSP_ITERS):
        nxt = dict(dist)
        for u, du in dist.items():
            for v, w in edges.get(u, []):
                if du + w < nxt.get(v, float("inf")):
                    nxt[v] = du + w
        dist = nxt
    want = sorted(dist.items(), key=lambda kv: (kv[1], kv[0]))[:_SSSP_TOP]
    want_rows = [
        (node, "customer" if node % 2 == 0 else "supplier", d, i + 1)
        for i, (node, d) in enumerate(want)
    ]

    got = [
        (r.node_id, r.node_type, r.dist_cents, r.rnk)
        for r in graph_sssp_bounded(spark, SF).orderBy("rnk").collect()
    ]
    assert got == want_rows
    assert got[0][2] == 0  # the seed itself at distance 0
