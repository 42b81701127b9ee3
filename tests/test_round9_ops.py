"""Round-9 operator tests: pure-python re-derivations against sf0.001,
following the round-4..8 replay-test pattern — each query's math is redone
row-by-row in python (exact integer arithmetic, micro-nat quantization)
and compared to the collected Spark result."""

from __future__ import annotations

import math
import re
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

SF = "/root/testdata/sf0.001"


def _toks(text: str) -> list[str]:
    s = re.sub(r"[^a-z0-9]+", " ", text.lower()).strip()
    return s.split(" ") if s else []


def _micro_nats(p: float) -> int:
    """round(1e6 * ln p) with halves away from zero — Spark round() on
    doubles and DuckDB both round halves away from zero, and python's
    bankers' round() does not."""
    return int(
        Decimal(repr(1000000 * math.log(p))).quantize(
            Decimal("1"), rounding=ROUND_HALF_UP
        )
    )


def _ulm_replay(
    wf: dict[str, int], rounds: int, maxp: int, seed_cap: int, steps: int
) -> tuple[list[tuple], dict[str, tuple[int, int]]]:
    """Reference hard-EM unigram-LM trainer: seed from substring counts,
    per round Viterbi-segment each word (dp over quantized micro-nat
    scores, tiebreak = (dp, last-piece-len, segmentation) lexicographic
    max — the struct-max order both engines pin) then re-estimate counts,
    floor chars to 1, cap multi-char pieces. Returns the per-round report
    rows and the final (piece -> (cnt, score)) inventory."""
    wf = {w: f for w, f in wf.items() if w and len(w) <= steps}
    pc: Counter[str] = Counter()
    for w, f in wf.items():
        for i in range(len(w)):
            for ln in range(1, min(maxp, len(w) - i) + 1):
                pc[w[i : i + ln]] += f
    chars = {p: c for p, c in pc.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in pc.items() if len(p) >= 2 and c >= 2),
        key=lambda x: (-x[1], x[0]),
    )[:seed_cap]
    invm = dict(chars)
    invm.update(dict(multi))
    reports = []
    for r in range(1, rounds + 1):
        tot = sum(invm.values())
        sc = {p: _micro_nats(c / tot) for p, c in invm.items()}
        vc: Counter[str] = Counter()
        corpus_tokens = corpus_pieces = nll = 0
        for w, f in wf.items():
            dp: list[tuple[int, int, str]] = [(0, 0, "")]
            for j in range(1, len(w) + 1):
                cands = []
                for ln in range(1, min(maxp, j) + 1):
                    piece = w[j - ln : j]
                    if piece in sc:
                        prev = dp[j - ln]
                        cands.append(
                            (prev[0] + sc[piece], ln, prev[2] + "|" + piece)
                        )
                dp.append(max(cands))
            best = dp[len(w)]
            pieces = best[2][1:].split("|")
            corpus_tokens += f
            corpus_pieces += f * len(pieces)
            nll += -f * best[0]
            for p in pieces:
                vc[p] += f
        reports.append(
            (
                r,
                len(invm),
                sum(1 for p in invm if len(p) >= 2),
                corpus_tokens,
                corpus_pieces,
                nll,
                corpus_pieces * 1000 // corpus_tokens,
            )
        )
        new = {p: max(vc.get(p, 0), 1) for p in chars}
        new.update(
            dict(
                sorted(
                    ((p, c) for p, c in vc.items() if len(p) >= 2),
                    key=lambda x: (-x[1], x[0]),
                )[:seed_cap]
            )
        )
        invm = new
    tot = sum(invm.values())
    return reports, {p: (c, _micro_nats(c / tot)) for p, c in invm.items()}


def _word_freq(spark) -> dict[str, int]:
    from pumle_spark.tables import table

    wf: Counter[str] = Counter()
    for r in table(spark, SF, "documents").select("text").collect():
        for w in _toks(r.text):
            wf[w] += 1
    return dict(wf)


def test_unigram_lm_train_matches_python_em(spark):
    """Replay: the full 3-round hard-EM trainer (seed counts, quantized
    scores, Viterbi with the pinned tiebreak, char-floored M-step) must
    reproduce every report row, and the NLL curve must be non-increasing
    (the EM objective — the docstring's contract)."""
    from pumle_spark.workload.text import (
        _ULM_MAXP,
        _ULM_ROUNDS,
        _ULM_SEED,
        _ULM_STEPS,
        text_unigram_lm_train,
    )

    reports, _ = _ulm_replay(
        _word_freq(spark), _ULM_ROUNDS, _ULM_MAXP, _ULM_SEED, _ULM_STEPS
    )
    got = [tuple(r) for r in text_unigram_lm_train(spark, SF).collect()]
    assert got == reports
    nlls = [r[5] for r in got]
    assert nlls == sorted(nlls, reverse=True), f"EM objective increased: {nlls}"
    # hard-EM with pruning must actually prune at this corpus size
    assert got[0][1] > got[-1][1]


def _doc_sizes(spark) -> list[tuple[str, int, int]]:
    from pumle_spark.tables import table

    return sorted(
        (r.source, r.doc_id, len(_toks(r.text)))
        for r in table(spark, SF, "documents")
        .select("source", "doc_id", "text")
        .collect()
    )


def _bfd_replay(sizes, cap):
    """Reference BFD: per source, docs by (n_tokens DESC, doc_id); fullest
    open bin that fits, first-maximal-fill tie rule, else a new bin."""
    out = {}
    by_src: dict[str, list[tuple[str, int, int]]] = {}
    for s, d, n in sizes:
        by_src.setdefault(s, []).append((s, d, n))
    for s, docs in by_src.items():
        fills: list[int] = []
        for _s, d, n in sorted(docs, key=lambda x: (-x[2], x[1])):
            best, best_fill = -1, -1
            for i, f in enumerate(fills):
                if f + n <= cap and f > best_fill:
                    best, best_fill = i, f
            if best < 0:
                fills.append(n)
                out[(s, d)] = (n, len(fills))
            else:
                fills[best] += n
                out[(s, d)] = (n, best + 1)
    return out


def test_bfd_packing_matches_python_and_beats_greedy_bins(spark):
    """Replay: the BFD assignment must match the reference scan exactly;
    every bin must respect capacity unless it holds a single oversize doc;
    and per source BFD must never use MORE bins than first-fit-in-order
    (it is the strictly better heuristic on sorted input)."""
    from pumle_spark.workload.curation import (
        _BIN_CAPACITY,
        pack_bfd_token_bins,
        pack_greedy_token_bins,
    )

    sizes = _doc_sizes(spark)
    expect = _bfd_replay(sizes, _BIN_CAPACITY)
    got = {
        (r.source, r.doc_id): (r.n_tokens, r.bin_id)
        for r in pack_bfd_token_bins(spark, SF).collect()
    }
    assert got == expect
    fills: dict[tuple[str, int], int] = {}
    counts: dict[tuple[str, int], int] = {}
    for (s, _d), (n, b) in got.items():
        fills[(s, b)] = fills.get((s, b), 0) + n
        counts[(s, b)] = counts.get((s, b), 0) + 1
    for (s, b), f in fills.items():
        assert f <= _BIN_CAPACITY or counts[(s, b)] == 1, (s, b, f)
    greedy_bins: dict[str, int] = {}
    for r in pack_greedy_token_bins(spark, SF).collect():
        greedy_bins[r.source] = max(greedy_bins.get(r.source, 0), r.bin_id)
    bfd_bins: dict[str, int] = {}
    for (s, _d), (_n, b) in got.items():
        bfd_bins[s] = max(bfd_bins.get(s, 0), b)
    for s in greedy_bins:
        assert bfd_bins[s] <= greedy_bins[s], s


def test_pack_efficiency_matches_both_packers(spark):
    """Replay: the efficiency report's bin counts and slack must equal what
    the two packers' own assignments imply — the report can never drift
    from the algorithms it audits."""
    from pumle_spark.workload.curation import (
        _BIN_CAPACITY,
        curation_pack_efficiency,
        pack_bfd_token_bins,
        pack_greedy_token_bins,
    )

    def stats(rows):
        fills: dict[tuple[str, int], int] = {}
        for r in rows:
            fills[(r.source, r.bin_id)] = (
                fills.get((r.source, r.bin_id), 0) + r.n_tokens
            )
        bins: dict[str, int] = {}
        slack: dict[str, int] = {}
        for (s, _b), f in fills.items():
            bins[s] = bins.get(s, 0) + 1
            slack[s] = slack.get(s, 0) + (
                _BIN_CAPACITY - f if f <= _BIN_CAPACITY else 0
            )
        return bins, slack

    gb, gs = stats(pack_greedy_token_bins(spark, SF).collect())
    bb, bs = stats(pack_bfd_token_bins(spark, SF).collect())
    for r in curation_pack_efficiency(spark, SF).collect():
        assert r.bins_greedy == gb[r.source]
        assert r.bins_bfd == bb[r.source]
        assert r.slack_greedy == gs[r.source]
        assert r.slack_bfd == bs[r.source]
        assert r.waste_greedy_ppm == gs[r.source] * 1_000_000 // (
            gb[r.source] * _BIN_CAPACITY
        )
        assert r.waste_bfd_ppm == bs[r.source] * 1_000_000 // (
            bb[r.source] * _BIN_CAPACITY
        )


def test_fim_audit_matches_python_md5_cuts(spark):
    """Replay: the md5 gate and the (a, b) cut-point arithmetic per doc,
    plus every span constraint (1 <= a < b <= n-1 — all three segments
    non-empty) and the exact-ppm rollups."""
    import hashlib

    from pumle_spark.tables import table
    from pumle_spark.workload.curation import (
        _FIM_SENTINELS,
        text_fim_transform_audit,
    )

    agg: dict[str, list[int]] = {}
    for r in (
        table(spark, SF, "documents").select("source", "text").collect()
    ):
        n = len(_toks(r.text))
        hx = hashlib.md5(r.text.encode()).hexdigest()
        h1, h2, h3 = (int(hx[i : i + 8], 16) for i in (0, 8, 16))
        a = agg.setdefault(r.source, [0, 0, 0, 0, 0, 0, 0])
        a[0] += 1
        a[3] += n
        if n >= 3:
            a[1] += 1
            if h1 % 2 == 0:
                a[2] += 1
                pa = 1 + h2 % (n - 2)
                pb = pa + 1 + h3 % (n - 1 - pa)
                assert 1 <= pa < pb <= n - 1
                a[4] += pa
                a[5] += pb - pa
                a[6] += n - pb
    got = {r.source: r for r in text_fim_transform_audit(spark, SF).collect()}
    assert set(got) == set(agg)
    for s, (nd, ne, nf, tt, pt, mt, st) in agg.items():
        r = got[s]
        assert (
            r.n_docs,
            r.n_eligible,
            r.n_fim,
            r.total_tokens,
            r.prefix_tokens,
            r.middle_tokens,
            r.suffix_tokens,
        ) == (nd, ne, nf, tt, pt, mt, st)
        assert r.sentinel_overhead_ppm == nf * _FIM_SENTINELS * 1_000_000 // tt
        denom = pt + mt + st
        if denom:
            assert r.middle_share_ppm == mt * 1_000_000 // denom


def test_doremi_weights_match_python_eg_rounds(spark):
    """Replay: the per-source excess loss (global vs in-domain unigram-LM
    avg NLL, micro-quantized per vocab entry) and all 4 exponentiated-
    gradient rounds (clip, quantized exp, integer normalize, uniform
    smoothing); plus the DRO sanity that weight mass moves TOWARD the
    max-excess source monotonically."""
    from pumle_spark.tables import table
    from pumle_spark.workload.sampling import (
        _DRM_CLIP,
        _DRM_ETA_PER_MICRO,
        _DRM_ROUNDS,
        _DRM_SMOOTH_PPM,
        mix_doremi_weights,
    )

    toks: list[tuple[str, str]] = []
    for r in table(spark, SF, "documents").select("source", "text").collect():
        for w in _toks(r.text):
            toks.append((r.source, w))
    gm = Counter(w for _s, w in toks)
    gn = sum(gm.values())
    gcost = {w: _micro_nats_neg(c / gn) for w, c in gm.items()}
    lm = Counter(toks)
    ln_ = Counter(s for s, _w in toks)
    lcost = {(s, w): _micro_nats_neg(c / ln_[s]) for (s, w), c in lm.items()}
    agg: dict[str, list[int]] = {}
    for s, w in toks:
        a = agg.setdefault(s, [0, 0, 0])
        a[0] += 1
        a[1] += gcost[w]
        a[2] += lcost[(s, w)]
    ex = {s: max(g // n - l // n, 0) for s, (n, g, l) in agg.items()}
    k = len(ex)
    alpha = {s: 1_000_000 // k for s in ex}
    expect = []
    for r in range(1, _DRM_ROUNDS + 1):
        avg = sum(alpha[s] * ex[s] for s in ex) // sum(alpha.values())
        q = {
            s: _round_away(
                1_000_000
                * math.exp(
                    min(
                        max((ex[s] - avg) * _DRM_ETA_PER_MICRO, -_DRM_CLIP),
                        _DRM_CLIP,
                    )
                )
            )
            for s in ex
        }
        tot = sum(alpha[s] * q[s] for s in ex)
        alpha = {
            s: (alpha[s] * q[s] * 1_000_000 // tot)
            * (1_000_000 - _DRM_SMOOTH_PPM)
            // 1_000_000
            + _DRM_SMOOTH_PPM // k
            for s in ex
        }
        for s in sorted(ex):
            expect.append((r, s, ex[s], alpha[s]))
    got = [tuple(r) for r in mix_doremi_weights(spark, SF).collect()]
    assert got == expect
    worst = max(ex, key=lambda s: (ex[s], s))
    traj = [a for r, s, _e, a in got if s == worst]
    assert traj == sorted(traj), f"worst-domain weight not monotone: {traj}"
    for r in range(1, _DRM_ROUNDS + 1):
        ssum = sum(a for rr, _s, _e, a in got if rr == r)
        assert 1_000_000 - 2 * k <= ssum <= 1_000_000


def _round_away(x: float) -> int:
    return int(
        Decimal(repr(x)).quantize(Decimal("1"), rounding=ROUND_HALF_UP)
    )


def _micro_nats_neg(p: float) -> int:
    """round(-1e6 * ln p), halves away from zero — the cost quantization."""
    return _round_away(-1000000 * math.log(p))


def test_tokenizer_shootout_matches_both_python_trainers(spark):
    """Replay: train BPE (greedy merge replay, round-8 test's algorithm)
    and unigram-LM (_ulm_replay) on the same length-filtered word table,
    encode per word, roll up per source, and match every report column —
    including the cross-family ppm ratio."""
    from pumle_spark.tables import table
    from pumle_spark.workload.text import (
        _BPE_MERGES,
        _ULM_MAXP,
        _ULM_ROUNDS,
        _ULM_SEED,
        _ULM_STEPS,
        text_tokenizer_shootout,
    )

    sw: Counter[tuple[str, str]] = Counter()
    for r in table(spark, SF, "documents").select("source", "text").collect():
        for w in _toks(r.text):
            if w and len(w) <= _ULM_STEPS:
                sw[(r.source, w)] += 1
    wf: Counter[str] = Counter()
    for (_s, w), c in sw.items():
        wf[w] += c

    # BPE: greedy merge-train then the per-word encoded length
    words: dict[str, list[str]] = {w: list(w) for w in wf}
    for _step in range(_BPE_MERGES):
        cnt: Counter[tuple[str, str]] = Counter()
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                cnt[(syms[i], syms[i + 1])] += wf[w]
        best = min(cnt, key=lambda p: (-cnt[p], p[0], p[1]))
        for w, syms in words.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    n_bpe = {w: len(syms) for w, syms in words.items()}

    # unigram-LM: the round-3 Viterbi piece counts per word
    reports, _ = _ulm_replay(dict(wf), _ULM_ROUNDS, _ULM_MAXP, _ULM_SEED, _ULM_STEPS)
    # _ulm_replay returns rollups; re-derive the per-word final segmentation
    # with one more E-step replay against the round-3 inventory scores
    # (cheaper: recompute inside a local copy)
    n_ulm = _ulm_final_segment_lens(dict(wf), _ULM_ROUNDS, _ULM_MAXP, _ULM_SEED, _ULM_STEPS)

    agg: dict[str, list[int]] = {}
    for (s, w), c in sw.items():
        a = agg.setdefault(s, [0, 0, 0, 0])
        a[0] += c
        a[1] += c * len(w)
        a[2] += c * n_bpe[w]
        a[3] += c * n_ulm[w]
    expect = [
        (
            s,
            t,
            ch,
            pb,
            pu,
            pb * 1000 // t,
            pu * 1000 // t,
            pu * 1_000_000 // pb,
        )
        for s, (t, ch, pb, pu) in sorted(agg.items())
    ]
    got = [tuple(r) for r in text_tokenizer_shootout(spark, SF).collect()]
    assert got == expect
    # sanity: both subword encoders must beat character splitting
    for _s, _t, ch, pb, pu, _fb, _fu, _ppm in got:
        assert pb < ch and pu < ch


def _ulm_final_segment_lens(
    wf: dict[str, int], rounds: int, maxp: int, seed_cap: int, steps: int
) -> dict[str, int]:
    """Per-word Viterbi piece count in the FINAL E-step round — the same
    EM replay as _ulm_replay, returning the last round's segmentations."""
    wf = {w: f for w, f in wf.items() if w and len(w) <= steps}
    pc: Counter[str] = Counter()
    for w, f in wf.items():
        for i in range(len(w)):
            for ln in range(1, min(maxp, len(w) - i) + 1):
                pc[w[i : i + ln]] += f
    chars = {p: c for p, c in pc.items() if len(p) == 1}
    invm = dict(chars)
    invm.update(
        dict(
            sorted(
                ((p, c) for p, c in pc.items() if len(p) >= 2 and c >= 2),
                key=lambda x: (-x[1], x[0]),
            )[:seed_cap]
        )
    )
    lens: dict[str, int] = {}
    for r in range(1, rounds + 1):
        tot = sum(invm.values())
        sc = {p: _micro_nats(c / tot) for p, c in invm.items()}
        vc: Counter[str] = Counter()
        for w, f in wf.items():
            dp: list[tuple[int, int, str]] = [(0, 0, "")]
            for j in range(1, len(w) + 1):
                cands = []
                for ln in range(1, min(maxp, j) + 1):
                    piece = w[j - ln : j]
                    if piece in sc:
                        prev = dp[j - ln]
                        cands.append(
                            (prev[0] + sc[piece], ln, prev[2] + "|" + piece)
                        )
                dp.append(max(cands))
            pieces = dp[len(w)][2][1:].split("|")
            lens[w] = len(pieces)
            for p in pieces:
                vc[p] += f
        new = {p: max(vc.get(p, 0), 1) for p in chars}
        new.update(
            dict(
                sorted(
                    ((p, c) for p, c in vc.items() if len(p) >= 2),
                    key=lambda x: (-x[1], x[0]),
                )[:seed_cap]
            )
        )
        invm = new
    return lens


def test_preference_pairs_match_python_extrema(spark):
    """Replay: per-(source, band) quality extrema with the pinned doc_id
    tiebreaks, the >= 2-doc and >= 1-milli-margin gates, and every
    invariant a DPO pair must satisfy (chosen != rejected, chosen quality
    strictly above rejected)."""
    from pumle_spark.tables import table
    from pumle_spark.workload.curation import (
        _PREF_BAND_TOK,
        _PREF_MIN_MARGIN,
        curation_preference_pairs,
    )

    strata: dict[tuple[str, int], list[tuple[int, int]]] = {}
    for r in (
        table(spark, SF, "documents").select("source", "doc_id", "text").collect()
    ):
        n = len(_toks(r.text))
        alnum = sum(ch.isalnum() for ch in r.text.lower())
        q = alnum * 1000 // len(r.text)
        strata.setdefault((r.source, n // _PREF_BAND_TOK), []).append(
            (q, r.doc_id)
        )
    expect = []
    for (s, band), docs in sorted(strata.items()):
        if len(docs) < 2:
            continue
        ch = max(docs, key=lambda x: (x[0], -x[1]))
        rj = min(docs)
        if ch[0] - rj[0] < _PREF_MIN_MARGIN:
            continue
        expect.append(
            (s, band, len(docs), ch[1], rj[1], ch[0], rj[0], ch[0] - rj[0])
        )
    got = [tuple(r) for r in curation_preference_pairs(spark, SF).collect()]
    assert got == expect
    for _s, _b, _n, cd, rd, cq, rq, m in got:
        assert cd != rd and cq > rq and m == cq - rq


def test_unigram_lm_pieces_matches_python_final_inventory(spark):
    """Replay: the shipped inventory's top-20 (count desc, piece asc) with
    final counts and micro-nat scores."""
    from pumle_spark.workload.text import (
        _ULM_MAXP,
        _ULM_ROUNDS,
        _ULM_SEED,
        _ULM_STEPS,
        _ULM_TOP,
        text_unigram_lm_pieces,
    )

    _, final = _ulm_replay(
        _word_freq(spark), _ULM_ROUNDS, _ULM_MAXP, _ULM_SEED, _ULM_STEPS
    )
    expect = [
        (rnk, p, len(p), c, s)
        for rnk, (p, (c, s)) in enumerate(
            sorted(final.items(), key=lambda x: (-x[1][0], x[0]))[:_ULM_TOP],
            start=1,
        )
    ]
    got = [tuple(r) for r in text_unigram_lm_pieces(spark, SF).collect()]
    assert got == expect
    # every shipped multi-char piece must be a substring the corpus contains
    corpus_words = set(_word_freq(spark))
    for _rnk, p, ln, _c, _s in got:
        if ln >= 2:
            assert any(p in w for w in corpus_words), p
