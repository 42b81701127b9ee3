"""Round-5 batch-v operator tests: max drawdown, retention-bias audit."""

from __future__ import annotations

from collections import defaultdict
from datetime import datetime

SF = "/root/testdata/sf0.001"


def test_max_drawdown_matches_running_peak_replay(spark):
    """Running peak and shortfall replayed over the monthly series."""
    from pumle_spark.tables import table
    from pumle_spark.workload.analytics import orders_max_drawdown

    monthly = defaultdict(int)
    for r in table(spark, SF, "orders").select("o_orderdate", "o_totalprice").collect():
        d = r.o_orderdate.date() if isinstance(r.o_orderdate, datetime) else r.o_orderdate
        monthly[(d.year - 1992) * 12 + d.month - 1] += int(round(r.o_totalprice * 100))

    peak = 0
    rows = []
    for mi in sorted(monthly):
        peak = max(peak, monthly[mi])
        dd = peak - monthly[mi]
        rows.append((mi, monthly[mi], peak, dd, dd * 1_000_000 // peak))
    rows.sort(key=lambda t: (-t[4], t[0]))
    expect = [(i + 1, *t) for i, t in enumerate(rows[:10])]

    got = [
        (r.rnk, r.month_index, r.rev_cents, r.peak_cents, r.drawdown_cents, r.drawdown_ppm)
        for r in orders_max_drawdown(spark, SF).collect()
    ]
    assert got == expect
    # drawdown is always non-negative and bounded by the peak
    for _, _, rev, peak_, dd, ppm in got:
        assert 0 <= dd <= peak_ and rev + dd == peak_ and 0 <= ppm < 1_000_000


def test_retention_bias_audit_conserves_and_matches_keepbest(spark):
    """Survivor counts must equal documents minus keep-best losers, and
    shares/drift must be the exact ppm algebra."""
    from pumle_spark.tables import table
    from pumle_spark.workload.curation import (
        curation_retention_bias_audit,
        dedup_cluster_keep_best,
    )

    docs = {(r.doc_id, r.source) for r in table(spark, SF, "documents").select("doc_id", "source").collect()}
    n_docs = len(docs)
    kb = dedup_cluster_keep_best(spark, SF).collect()
    n_losers = sum(r.n_docs - 1 for r in kb)

    got = {r.source: r for r in curation_retention_bias_audit(spark, SF).collect()}
    tb = sum(r.n_before for r in got.values())
    ta = sum(r.n_after for r in got.values())
    assert tb == n_docs
    assert tb - ta == n_losers
    src_counts = defaultdict(int)
    for _, s in docs:
        src_counts[s] += 1
    for s, r in got.items():
        assert r.n_before == src_counts[s]
        assert r.n_dropped == r.n_before - r.n_after
        assert r.share_before_ppm == r.n_before * 1_000_000 // tb
        assert r.share_after_ppm == r.n_after * 1_000_000 // ta
        assert r.share_drift_ppm == r.share_after_ppm - r.share_before_ppm
