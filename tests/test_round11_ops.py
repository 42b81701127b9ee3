"""Round-11 operator tests: pure-python re-derivations against sf0.001,
following the round-4..10 replay-test pattern — each query's math is redone
row-by-row in python (exact integer arithmetic) and compared to the
collected Spark result."""

from __future__ import annotations

import re
from collections import Counter, defaultdict

SF = "/root/testdata/sf0.001"

_STOP_EN = {"the", "a", "and", "of", "to", "in"}


def _toks(text: str) -> list[str]:
    s = re.sub(r"[^a-z0-9]+", " ", text.lower()).strip()
    return s.split(" ") if s else []


def _doc_rows(spark):
    from pumle_spark.tables import table

    return [
        (r.source, int(r.doc_id), _toks(r.text))
        for r in table(spark, SF, "documents")
        .select("source", "doc_id", "text")
        .collect()
    ]


def test_byte_fallback_audit_matches_python_replay(spark):
    """Independent re-derivation of the coverage audit: build the
    (source, char) occurrence counts from the raw text via the same
    whitespace tokenizer, pick the top-16 alphabet by (freq DESC, char ASC)
    on the GLOBAL counts, and re-derive every output column with python
    ints. Catches alphabet off-by-one (top-16 vs top-17), weighting bugs
    (distinct-word vs occurrence-weighted counts), and floor-division
    drift."""
    from pumle_spark.workload.text import _BF_ALPHABET, text_byte_fallback_audit

    rows = _doc_rows(spark)
    ch: Counter = Counter()  # (source, char) -> weighted count
    gf: Counter = Counter()  # char -> global weighted count
    for source, _doc_id, ws in rows:
        for w in ws:
            for c in w:
                ch[(source, c)] += 1
                gf[c] += 1
    alpha = {
        c for c, _ in sorted(gf.items(), key=lambda kv: (-kv[1], kv[0]))[:_BF_ALPHABET]
    }
    exp: dict[str, dict[str, int]] = defaultdict(lambda: defaultdict(int))
    for (source, c), cnt in ch.items():
        e = exp[source]
        e["n_char_occ"] += cnt
        if c in alpha:
            e["covered_occ"] += cnt
        else:
            e["fallback_occ"] += cnt
            e["fallback_bytes"] += cnt * len(c.encode("utf-8"))
    got = {r.source: r for r in text_byte_fallback_audit(spark, SF).collect()}
    assert set(got) == set(exp)
    for source, e in exp.items():
        g = got[source]
        assert g.n_char_occ == e["n_char_occ"], source
        assert g.covered_occ == e["covered_occ"], source
        assert g.fallback_occ == e["fallback_occ"], source
        assert g.fallback_bytes == e["fallback_bytes"], source
        assert g.coverage_ppm == e["covered_occ"] * 1_000_000 // e["n_char_occ"]
        assert (
            g.fallback_overhead_ppm
            == e["fallback_bytes"] * 1_000_000 // e["n_char_occ"]
        )


def test_curriculum_anneal_matches_python_replay(spark):
    """Independent re-derivation of the curriculum fill: per-document
    quality buckets from python ints, the (source, bucket) histogram, a
    descending-bucket cumulative fill against the REGISTERED schedule's
    budgets (taken from mix_anneal_schedule's own output — the consumer
    contract is 'same budgets', not 'same budget derivation'), and every
    report column. Catches boundary bugs (cum <= budget vs <), empty
    selections (must yield 0/NULL rows, not drop the (epoch, source)),
    and quality-score drift."""
    from pumle_spark.workload.sampling import (
        _CURRICULUM_BUCKET,
        curriculum_quality_anneal,
        mix_anneal_schedule,
    )

    rows = _doc_rows(spark)
    hist: dict[str, Counter] = defaultdict(Counter)  # source -> bucket -> toks
    dhist: dict[str, Counter] = defaultdict(Counter)  # source -> bucket -> docs
    for source, _doc_id, ws in rows:
        n = len(ws)
        if n == 0:
            continue
        stop = sum(1 for t in ws if t in _STOP_EN)
        q = (stop * 1_000_000 // n + len(set(ws)) * 1_000_000 // n) // _CURRICULUM_BUCKET
        hist[source][q] += n
        dhist[source][q] += 1

    budgets = {
        (r.epoch, r.source): int(r.tokens_budget)
        for r in mix_anneal_schedule(spark, SF).collect()
    }
    got = {(r.epoch, r.source): r for r in curriculum_quality_anneal(spark, SF).collect()}
    assert set(got) == set(budgets)
    for (epoch, source), budget in budgets.items():
        cum, toks_sel, docs_sel, cutoff = 0, 0, 0, None
        for q in sorted(hist[source], reverse=True):
            cum += hist[source][q]
            if cum > budget:
                break
            toks_sel += hist[source][q]
            docs_sel += dhist[source][q]
            cutoff = q
        g = got[(epoch, source)]
        assert g.tokens_budget == budget
        assert g.n_docs_sel == docs_sel, (epoch, source)
        assert g.tokens_sel == toks_sel, (epoch, source)
        if budget == 0:
            assert g.fill_ppm is None
        else:
            assert g.fill_ppm == toks_sel * 1_000_000 // budget
        assert g.cutoff_quality_milli == cutoff, (epoch, source)


def test_new_ops_plan_shape(spark):
    """Plan invariants for the round-11 operators: the byte-fallback
    alphabet is a TakeOrderedAndProject prune (never a global sort) and
    its corpus-side join is a BroadcastHashJoin; the curriculum budget
    join is an equi BroadcastHashJoin (the range conjunct that degraded
    it to BroadcastNestedLoopJoin lives in conditional aggregation now —
    the schedule chain's own single-row scalar crossJoins are the only
    BNLJ allowed to remain, adjudicated on mix_anneal_schedule)."""
    from pumle_spark.workload.sampling import curriculum_quality_anneal
    from pumle_spark.workload.text import text_byte_fallback_audit

    bf_plan = (
        text_byte_fallback_audit(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in bf_plan
    assert "BroadcastHashJoin" in bf_plan
    assert "BroadcastNestedLoopJoin" not in bf_plan
    assert "CartesianProduct" not in bf_plan

    cu_plan = (
        curriculum_quality_anneal(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in cu_plan
    assert "CartesianProduct" not in cu_plan
    # the ONLY BroadcastNestedLoopJoins are the schedule chain's scalar
    # crossJoins (bounded: single-row totals x |sources|, constant epoch
    # grid); the budget join itself must not contribute one. The chain
    # has exactly 3 (tot x ex, tgt-nat x tot, x epoch grid).
    assert cu_plan.count("BroadcastNestedLoopJoin") <= 3
