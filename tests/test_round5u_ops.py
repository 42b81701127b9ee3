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
        return _tdiv(_tdiv(ta, na) + _tdiv(tb, nb), 2)

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
