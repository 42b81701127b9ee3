"""Round-6 operator tests: langid kappa, token fertility, nDCG@k, RBO,
DSIR weights. Pure-python re-derivations (independent of both engines)."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

SF = "/root/testdata/sf0.001"

_STOP = {
    "en": ("the", "a", "and", "of", "to", "in"),
    "es": ("la", "el", "de", "que", "y"),
    "fr": ("le", "la", "de", "et", "les"),
    "de": ("der", "die", "und", "das", "ist"),
}


def _toks(text: str) -> list[str]:
    s = re.sub(r"[^a-z0-9]+", " ", text.lower()).strip()
    return s.split(" ") if s else []


def _half_up(x: float) -> int:
    return int(Decimal(repr(x)).quantize(Decimal("1"), rounding=ROUND_HALF_UP))


def _tdiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _pred_lang(ws: list[str]) -> str:
    h = {lg: sum(1 for t in ws if t in _STOP[lg]) for lg in ("en", "es", "fr", "de")}
    if h["en"] >= h["es"] and h["en"] >= h["fr"] and h["en"] >= h["de"] and h["en"] > 0:
        return "en"
    if h["es"] >= h["fr"] and h["es"] >= h["de"] and h["es"] > 0:
        return "es"
    if h["fr"] >= h["de"] and h["fr"] > 0:
        return "fr"
    if h["de"] > 0:
        return "de"
    return "unknown"


def test_langid_kappa_matches_confusion_replay(spark):
    """Per-class P/R/F1 in exact ppm + Cohen's kappa via integer
    cross-multiplication, replayed from a python confusion matrix."""
    from pumle_spark.tables import table
    from pumle_spark.workload.text import text_langid_kappa

    cm = Counter()
    for r in table(spark, SF, "documents").select("lang", "text").collect():
        cm[(r.lang, _pred_lang(_toks(r.text)))] += 1

    n_true = Counter()
    n_pred = Counter()
    n_corr = Counter()
    for (g, p), n in cm.items():
        n_true[g] += n
        n_pred[p] += n
        if g == p:
            n_corr[g] += n
    classes = sorted(set(n_true) | set(n_pred))
    nn = sum(n_true.values())
    dd = sum(n_corr.values())
    ss = sum(n_true[c] * n_pred[c] for c in classes)
    kappa = _tdiv((nn * dd - ss) * 1_000_000, nn * nn - ss)

    got = {r.cls: r for r in text_langid_kappa(spark, SF).collect()}
    assert sorted(got) == classes
    for c in classes:
        r = got[c]
        assert (r.n_true, r.n_pred, r.n_correct) == (n_true[c], n_pred[c], n_corr[c])
        assert r.precision_ppm == (n_corr[c] * 1_000_000 // n_pred[c] if n_pred[c] else 0)
        assert r.recall_ppm == (n_corr[c] * 1_000_000 // n_true[c] if n_true[c] else 0)
        tot = n_true[c] + n_pred[c]
        assert r.f1_ppm == (2 * n_corr[c] * 1_000_000 // tot if tot else 0)
        assert r.kappa_micro == kappa
    # kappa must not exceed raw accuracy (chance correction only subtracts)
    assert kappa <= dd * 1_000_000 // nn


def test_token_fertility_matches_grouped_sums(spark):
    from pumle_spark.tables import table
    from pumle_spark.workload.text import text_token_fertility

    agg = defaultdict(lambda: [0, 0, 0, 0])  # docs, tokens, chars, tok_chars
    for r in table(spark, SF, "documents").select("source", "lang", "text").collect():
        ws = _toks(r.text)
        st = agg[(r.source, r.lang)]
        st[0] += 1
        st[1] += len(ws)
        st[2] += len(r.text)
        st[3] += sum(len(t) for t in ws)

    got = {(r.source, r.lang): r for r in text_token_fertility(spark, SF).collect()}
    assert set(got) == set(agg)
    for k, (nd, nt, nc, ntc) in agg.items():
        r = got[k]
        assert (r.n_docs, r.n_tokens, r.n_chars) == (nd, nt, nc)
        assert r.chars_per_token_micro == (ntc * 1_000_000 // nt if nt else 0)
        assert r.tokens_per_doc_micro == nt * 1_000_000 // nd
        assert r.overhead_ppm == ((nc - ntc) * 1_000_000 // nc if nc else 0)


def _bm25_scored_replay(rows):
    """(query_id, doc_id) -> (score_micro, rel, dl) under the engine's exact
    quantization contract, replayed with Decimal half-up rounding."""
    from pumle_spark.workload.text import _BM25_B, _BM25_K1, _BM25_QUERIES

    tf = defaultdict(Counter)  # doc -> term counts
    for doc_id, text in rows:
        for t in _toks(text):
            if t:
                tf[doc_id][t] += 1
    dl = {d: sum(c.values()) for d, c in tf.items()}
    nd, sdl = len(dl), sum(dl.values())
    qterms = {t for _, terms in _BM25_QUERIES for t in terms}
    dfreq = Counter()
    for d, c in tf.items():
        for t in qterms:
            if c[t]:
                dfreq[t] += 1

    scored = {}
    for qid, terms in _BM25_QUERIES:
        for d, c in tf.items():
            s, rel = 0, 0
            for t in terms:
                if not c[t]:
                    continue
                rel += 1
                idf = math.log(1.0 + (nd - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
                sat = (c[t] * (_BM25_K1 + 1.0)) / (
                    c[t] + _BM25_K1 * (1.0 - _BM25_B + _BM25_B * dl[d] / (sdl / nd))
                )
                s += _half_up(idf * sat * 1_000_000)
            if rel:
                scored[(qid, d)] = (s, rel, dl[d])
    return scored


def test_ndcg_matches_pure_python(spark):
    from pumle_spark.tables import table
    from pumle_spark.workload.text import _BM25_QUERIES, _NDCG_K, retrieval_ndcg_eval

    rows = [
        (r.doc_id, r.text)
        for r in table(spark, SF, "documents").select("doc_id", "text").collect()
    ]
    scored = _bm25_scored_replay(rows)

    got = {r.query_id: r for r in retrieval_ndcg_eval(spark, SF).collect()}
    for qid, _ in _BM25_QUERIES:
        cand = [(d, s, rel) for (q, d), (s, rel, _) in scored.items() if q == qid]
        by_score = sorted(cand, key=lambda x: (-x[1], x[0]))
        by_rel = sorted(cand, key=lambda x: (-x[2], x[0]))
        dcg = sum(
            _half_up((2.0 ** rel - 1.0) / math.log2(pos + 2) * 1_000_000)
            for pos, (_, _, rel) in enumerate(by_score[:_NDCG_K])
        )
        idcg = sum(
            _half_up((2.0 ** rel - 1.0) / math.log2(pos + 2) * 1_000_000)
            for pos, (_, _, rel) in enumerate(by_rel[:_NDCG_K])
        )
        r = got[qid]
        assert r.n_candidates == len(cand)
        assert (r.dcg_micro, r.idcg_micro) == (dcg, idcg)
        assert r.ndcg_ppm == (dcg * 1_000_000 // idcg if idcg else 0)
        assert 0 <= r.ndcg_ppm <= 1_000_000


def test_rbo_matches_integer_replay(spark):
    from pumle_spark.tables import table
    from pumle_spark.workload.text import _BM25_QUERIES, _RBO_K, retrieval_rbo_overlap

    rows = [
        (r.doc_id, r.text)
        for r in table(spark, SF, "documents").select("doc_id", "text").collect()
    ]
    scored = _bm25_scored_replay(rows)

    got = {r.query_id: r for r in retrieval_rbo_overlap(spark, SF).collect()}
    # identical-ranking upper bound: every doc at rank r contributes from r
    ub = sum(
        sum(10**12 // (d * 2**d) for d in range(r, _RBO_K + 1))
        for r in range(1, _RBO_K + 1)
    )
    for qid, _ in _BM25_QUERIES:
        cand = [(d, s, rel, dl) for (q, d), (s, rel, dl) in scored.items() if q == qid]
        top_a = [d for d, *_ in sorted(cand, key=lambda x: (-x[1], x[0]))[:_RBO_K]]
        top_b = [
            d for d, *_ in sorted(cand, key=lambda x: (-x[2], x[3], x[0]))[:_RBO_K]
        ]
        ra = {d: i + 1 for i, d in enumerate(top_a)}
        rb = {d: i + 1 for i, d in enumerate(top_b)}
        shared = set(ra) & set(rb)
        rbo = sum(
            10**12 // (d * 2**d)
            for doc in shared
            for d in range(max(ra[doc], rb[doc]), _RBO_K + 1)
        )
        r = got[qid]
        assert r.n_shared_topk == len(shared)
        assert r.overlap_ppm == len(shared) * 1_000_000 // _RBO_K
        assert r.rbo_pico == rbo
        assert 0 <= r.rbo_pico <= ub


def test_dsir_weights_match_bucket_lm_replay(spark):
    from pumle_spark.tables import table
    from pumle_spark.workload.curation import (
        _DSIR_BUCKETS,
        _DSIR_TARGET_SOURCE,
        curation_dsir_weights,
    )

    def bucket(t: str) -> int:
        return int(hashlib.md5(f"dsir|{t}".encode()).hexdigest()[:8], 16) % _DSIR_BUCKETS

    raw = Counter()
    tgt = Counter()
    doc_buckets = {}
    for r in table(spark, SF, "documents").select("doc_id", "source", "text").collect():
        bs = [bucket(t) for t in _toks(r.text) if t]
        doc_buckets[r.doc_id] = bs
        raw.update(bs)
        if r.source == _DSIR_TARGET_SOURCE:
            tgt.update(bs)

    nt1 = {b: tgt[b] + 1 for b in range(_DSIR_BUCKETS)}
    nr1 = {b: raw[b] + 1 for b in range(_DSIR_BUCKETS)}
    tt, rt = sum(nt1.values()), sum(nr1.values())
    w = {
        b: _half_up(math.log(nt1[b] * rt / (nr1[b] * tt)) * 1_000_000)
        for b in range(_DSIR_BUCKETS)
    }

    got = {r.doc_id: r for r in curation_dsir_weights(spark, SF).collect()}
    assert set(got) == set(doc_buckets)
    for d, bs in doc_buckets.items():
        r = got[d]
        assert r.n_tokens == len(bs)
        assert r.dsir_micro == sum(w[b] for b in bs)
    # the target exemplars must, in aggregate, score above the corpus on a
    # PER-TOKEN basis (they ARE the target distribution; raw per-doc sums
    # are dominated by doc-length variance, so normalize by token count)
    tgt_ids = {
        r.doc_id
        for r in table(spark, SF, "documents").select("doc_id", "source").collect()
        if r.source == _DSIR_TARGET_SOURCE
    }
    tok_all = sum(r.n_tokens for r in got.values())
    tok_tgt = sum(got[d].n_tokens for d in tgt_ids)
    per_tok_all = sum(r.dsir_micro for r in got.values()) / tok_all
    per_tok_tgt = sum(got[d].dsir_micro for d in tgt_ids) / tok_tgt
    assert per_tok_tgt > per_tok_all
