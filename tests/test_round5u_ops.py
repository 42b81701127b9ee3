"""Round-5 batch-u operator tests: MAUVE-style cluster JS."""

from __future__ import annotations

import math
from collections import defaultdict

SF = "/root/testdata/sf0.001"


def _tdiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def test_cluster_js_matches_pure_python_over_engine_assignments(spark):
    """Given the engine's (oracle-verified) k-means assignments, the JS
    algebra is replayed exactly; bounds and self-consistency asserted."""
    from pumle_spark.tables import table
    from pumle_spark.workload.clustering import _kmeans_final, text_cluster_js_mauve

    asg = {r.vec_id: r.cid for r in _kmeans_final(spark, SF).select("vec_id", "cid").collect()}
    src_of = {r.doc_id: r.source for r in table(spark, SF, "documents").collect()}

    hist = defaultdict(lambda: defaultdict(int))
    for vid, cid in asg.items():
        hist[src_of[vid]][cid] += 1
    ns = {s: sum(h.values()) for s, h in hist.items()}
    clusters = {c for h in hist.values() for c in h}

    def js(sa, sb):
        na, nb = ns[sa], ns[sb]
        ta = tb = 0
        for c in clusters:
            a_c, b_c = hist[sa].get(c, 0), hist[sb].get(c, 0)
            den = a_c * nb + b_c * na
            if a_c > 0:
                ta += a_c * round(math.log2(2.0 * a_c * nb / den) * 1_000_000)
            if b_c > 0:
                tb += b_c * round(math.log2(2.0 * b_c * na / den) * 1_000_000)
        # each KL half clamps at 0, matching the query (micro-rounding can
        # push a near-identical pair a few micro-bits negative)
        return _tdiv(max(_tdiv(ta, na), 0) + max(_tdiv(tb, nb), 0), 2)

    got = {(r.source_a, r.source_b): r for r in text_cluster_js_mauve(spark, SF).collect()}
    srcs = sorted(ns)
    assert set(got) == {(a, b) for i, a in enumerate(srcs) for b in srcs[i + 1 :]}
    for (sa, sb), r in got.items():
        assert (r.n_a, r.n_b) == (ns[sa], ns[sb])
        assert r.js_micro == js(sa, sb)
        assert 0 <= r.js_micro <= 1_000_000  # JS is bounded by 1 bit


def test_horvitz_thompson_matches_lottery_replay(spark):
    """The md5 lottery, the HT estimator, and the small-stratum exactness
    anchor (N_h <= k => err 0) replayed in pure python."""
    import hashlib
    from collections import defaultdict

    from pumle_spark.tables import table
    from pumle_spark.workload.sampling import _STRATUM_K, sample_horvitz_thompson

    rows = defaultdict(list)
    for r in table(spark, SF, "documents").select("doc_id", "lang", "n_chars").collect():
        rows[r.lang].append((hashlib.md5(str(r.doc_id).encode()).hexdigest(), r.doc_id, r.n_chars))

    got = {r.lang: r for r in sample_horvitz_thompson(spark, SF).collect()}
    assert set(got) == set(rows)
    for lang, docs in rows.items():
        docs.sort()
        n_h = len(docs)
        k_h = min(_STRATUM_K, n_h)
        exact = sum(x for _, _, x in docs)
        samp = sum(x for _, _, x in docs[:_STRATUM_K])
        est = samp * n_h // k_h
        r = got[lang]
        assert (r.n_h, r.k_h, r.exact_chars, r.ht_estimate) == (n_h, k_h, exact, est)
        assert r.err_ppm == _tdiv((est - exact) * 1_000_000, exact)
        if n_h <= _STRATUM_K:
            assert r.err_ppm == 0  # census stratum: HT is exact by design


def test_forecast_reconciliation_coherence(spark):
    """Bottom-up per-priority forecasts replayed with the shared weights;
    the coherence gap must be exactly the per-series rounding residue
    (|gap| bounded by |priorities| quantization steps)."""
    from collections import defaultdict
    from datetime import datetime

    from pumle_spark.tables import table
    from pumle_spark.workload.analytics import (
        _HOLT_BASE,
        _HOLT_K,
        _HOLT_OFF,
        _HOLT_OFFD,
        _HOLT_SCALE,
        _HOLT_WB,
        _HOLT_WL,
        forecast_hierarchy_reconcile,
    )

    series = defaultdict(lambda: [0] * _HOLT_K)
    hist = defaultdict(int)
    for r in table(spark, SF, "orders").collect():
        d = r.o_orderdate.date() if isinstance(r.o_orderdate, datetime) else r.o_orderdate
        mi = (d.year - 1992) * 12 + d.month - 1
        if _HOLT_BASE <= mi < _HOLT_BASE + _HOLT_K:
            cents = int(round(r.o_totalprice * 100))
            series[r.o_orderpriority][mi - _HOLT_BASE] += cents
            hist[r.o_orderpriority] += cents
        else:
            series[r.o_orderpriority]  # priority still exists with zero window
            hist.setdefault(r.o_orderpriority, 0)

    def q(x):
        return (x + _HOLT_OFF) // _HOLT_SCALE - _HOLT_OFFD

    f1 = {}
    ls_t = bs_t = 0
    for p, y in series.items():
        ls = sum(w * v for w, v in zip(_HOLT_WL, y))
        bs = sum(w * v for w, v in zip(_HOLT_WB, y))
        ls_t += ls
        bs_t += bs
        f1[p] = q(ls + bs)
    bu_total = sum(f1.values())
    direct = q(ls_t + bs_t)
    hist_total = sum(hist.values())

    got = {r.priority: r for r in forecast_hierarchy_reconcile(spark, SF).collect()}
    assert set(got) == set(series)
    for p, r in got.items():
        assert r.bottomup_cents == f1[p]
        share = hist[p] * 1_000_000 // hist_total
        assert r.topdown_cents == direct * share // 1_000_000
        assert r.bu_total == bu_total
        assert r.direct_total == direct
        assert abs(r.bu_total - r.direct_total) <= len(series)  # rounding only


def test_watermark_zscores_match_bigram_replay(spark):
    """Green fractions, z-scores, bins, and the binomial sanity (mean z
    near 0 for unwatermarked text) replayed in pure python."""
    import hashlib
    import math
    import re
    from collections import defaultdict

    from pumle_spark.tables import table
    from pumle_spark.workload.text import (
        _WM_BIN_MILLI,
        _WM_MIN_BIGRAMS,
        text_watermark_zscores,
    )

    bins = defaultdict(lambda: [0, 0])  # n_docs, n_flagged
    zs = []
    for r in table(spark, SF, "documents").select("text").collect():
        ws = re.sub(r"[^a-z0-9]+", " ", r.text.lower()).strip().split(" ")
        if len(ws) < _WM_MIN_BIGRAMS + 1:
            continue
        n = len(ws) - 1
        g = sum(
            1
            for a, b in zip(ws, ws[1:])
            if int(hashlib.md5(f"wm|{a}|{b}".encode()).hexdigest()[0], 16) % 2 == 0
        )
        zm = round((2.0 * g - n) / math.sqrt(n) * 1000)
        zs.append(zm)
        q = abs(zm) // _WM_BIN_MILLI
        b = q if zm >= 0 else -q
        bins[b][0] += 1
        bins[b][1] += 1 if zm >= 4000 else 0

    total = sum(v[0] for v in bins.values())
    got = {r.z_bin: (r.n_docs, r.share_ppm, r.n_flagged_4sigma) for r in text_watermark_zscores(spark, SF).collect()}
    assert got == {
        b: (v[0], v[0] * 1_000_000 // total, v[1]) for b, v in bins.items()
    }
    # unwatermarked corpus: mean z within 4/sqrt(n_docs) sigma of zero
    mean_z = sum(zs) / (1000 * len(zs))
    assert abs(mean_z) < 4 / math.sqrt(len(zs)) + 0.2
