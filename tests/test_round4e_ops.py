"""Round-4 wave-3 operator tests (batch 3): RFM segmentation, Benford
audit, CUSUM changepoint, KMV corpus-overlap Jaccard."""

from __future__ import annotations

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


# --------------------------------------------------------------------------
# orders_rfm_segments
# --------------------------------------------------------------------------


def test_rfm_conserves_customers_and_cents(spark):
    """Segments partition the customer base: sizes sum to the distinct
    customer count and segment cents sum to total order cents. Each score
    axis must also bucket near-evenly (NTILE property: sizes differ by at
    most 1 per axis)."""
    from pumle_spark.tables import table
    from pumle_spark.workload.analytics import orders_rfm_segments

    rows = orders_rfm_segments(spark, SF).collect()
    o = table(spark, SF, "orders")
    n_cust = o.select("o_custkey").distinct().count()
    total_cents = o.select(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("t")
    ).collect()[0].t

    assert sum(r.n_customers for r in rows) == n_cust
    assert sum(r.segment_cents for r in rows) == total_cents

    for axis in ("r_score", "f_score", "m_score"):
        per = {}
        for r in rows:
            per[getattr(r, axis)] = per.get(getattr(r, axis), 0) + r.n_customers
        assert set(per) == {1, 2, 3, 4, 5}
        assert max(per.values()) - min(per.values()) <= 1


def test_rfm_monetary_axis_orders_by_spend(spark):
    """m_score=1 customers must each out-spend every m_score=5 customer —
    NTILE over a total order is monotone."""
    from pumle_spark.tables import table
    from pyspark.sql import Window

    o = table(spark, SF, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("cents")
    )
    scored = cust.withColumn(
        "m",
        F.ntile(5).over(Window.orderBy(F.desc("cents"), F.asc("o_custkey"))),
    )
    top = scored.filter(F.col("m") == 1).agg(F.min("cents")).collect()[0][0]
    bot = scored.filter(F.col("m") == 5).agg(F.max("cents")).collect()[0][0]
    assert top >= bot


# --------------------------------------------------------------------------
# audit_benford_totalprice
# --------------------------------------------------------------------------


def test_benford_counts_and_expectations_reconcile(spark):
    from pumle_spark.tables import table
    from pumle_spark.workload.analytics import audit_benford_totalprice

    rows = audit_benford_totalprice(spark, SF).collect()
    n_orders = table(spark, SF, "orders").count()
    assert sum(r.n_obs for r in rows) == n_orders
    # Benford probabilities sum to 1 → expected counts sum to n
    assert abs(sum(r.n_expected for r in rows) - n_orders) < 1e-3
    assert all(1 <= r.digit <= 9 for r in rows)
    totals = {r.chi2_total for r in rows}
    assert len(totals) == 1
    assert totals.pop() >= 0
    for r in rows:
        assert r.chi2_term >= 0


# --------------------------------------------------------------------------
# orders_cusum_changepoint
# --------------------------------------------------------------------------


def test_cusum_matches_sequential_recurrence(spark):
    """The window-identity implementation must equal the textbook
    sequential fold s_t = max(0, s_{t-1} + (c_t*n - total)) replayed in
    python over the collected daily series."""
    from pumle_spark.tables import table
    from pumle_spark.workload.analytics import _CUSUM_TOP, orders_cusum_changepoint

    daily = (
        table(spark, SF, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy("day")
        .collect()
    )
    n = len(daily)
    total = sum(r.c for r in daily)
    s = 0
    series = []
    for r in daily:
        s = max(0, s + (r.c * n - total))
        series.append((r.day.strftime("%Y-%m-%d"), r.c, s))
    want = sorted(series, key=lambda t: (-t[2], t[0]))[:_CUSUM_TOP]
    want_rows = [(d, c, s, i + 1) for i, (d, c, s) in enumerate(want)]

    got = [
        (r.day, r.n_orders, r.cusum_scaled, r.rnk)
        for r in orders_cusum_changepoint(spark, SF).orderBy("rnk").collect()
    ]
    assert got == want_rows


# --------------------------------------------------------------------------
# sketch_kmv_corpus_jaccard
# --------------------------------------------------------------------------


def test_kmv_jaccard_exact_when_vocab_fits_in_sketch(spark, tmp_path):
    """When each source's vocabulary is smaller than k, the signature IS
    the vocabulary and the estimator degenerates to the exact Jaccard —
    a planted half-overlap pair must come out at exactly 1/3."""
    import pandas as pd

    # source A: tokens a0..a19 + shared s0..s9; source B: b0..b19 + s0..s9
    # |A|=|B|=30, |A∩B|=10, |A∪B|=50 → J = 0.2
    ta = " ".join([f"aa{i}" for i in range(20)] + [f"ss{i}" for i in range(10)])
    tb = " ".join([f"bb{i}" for i in range(20)] + [f"ss{i}" for i in range(10)])
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1],
            "text": [ta, tb],
            "lang": ["en", "en"],
            "source": ["srcA", "srcB"],
            "n_chars": [len(ta), len(tb)],
        }
    )
    d = tmp_path / "fix"
    d.mkdir()
    pdf.to_parquet(d / "documents.parquet")

    from pumle_spark.workload.sketches import sketch_kmv_corpus_jaccard

    rows = sketch_kmv_corpus_jaccard(spark, str(d)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.source_a, r.source_b) == ("srcA", "srcB")
    assert r.k_used == 50
    assert r.n_shared == 10
    assert r.jaccard_est == 0.2
    assert r.jaccard_exact == 0.2


def test_kmv_jaccard_estimates_track_exact_on_real_corpus(spark):
    """Sketch estimates at k=128 should correlate with the exact values:
    mean absolute error over all pairs well under the k^-1/2 noise
    envelope, and both columns bounded in [0, 1]."""
    from pumle_spark.workload.sketches import sketch_kmv_corpus_jaccard

    rows = sketch_kmv_corpus_jaccard(spark, SF).collect()
    assert rows
    errs = []
    for r in rows:
        assert 0.0 <= r.jaccard_est <= 1.0
        assert 0.0 <= r.jaccard_exact <= 1.0
        errs.append(abs(r.jaccard_est - r.jaccard_exact))
    assert sum(errs) / len(errs) < 0.15  # k=128 → sd ≈ 0.04-0.09 per pair
