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
