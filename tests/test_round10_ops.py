"""Round-10 operator tests: pure-python re-derivations against sf0.001,
following the round-4..9 replay-test pattern — each query's math is redone
row-by-row in python (exact integer arithmetic) and compared to the
collected Spark result."""

from __future__ import annotations

import re

SF = "/root/testdata/sf0.001"


def _toks(text: str) -> list[str]:
    s = re.sub(r"[^a-z0-9]+", " ", text.lower()).strip()
    return s.split(" ") if s else []


def _docs(spark):
    from pumle_spark.tables import table

    return [
        (r.source, int(r.doc_id), len(_toks(r.text)))
        for r in table(spark, SF, "documents").select(
            "source", "doc_id", "text"
        ).collect()
    ]


def _bfd_replay(items: list[tuple[int, int]], cap: int) -> dict[int, int]:
    """Reference best-fit-decreasing over (sort-ready) items [(size, id)]:
    each item to the fullest open bin it fits, ties -> lowest bin id, else
    a new bin. Independent re-statement of the packer's rule — NOT the
    module's _bfd_bins."""
    out: dict[int, int] = {}
    fills: list[int] = []
    for size, ident in sorted(items, key=lambda x: (-x[0], x[1])):
        best, best_fill = -1, -1
        for i, f in enumerate(fills):
            if f + size <= cap and f > best_fill:
                best, best_fill = i, f
        if best < 0:
            fills.append(size)
            out[ident] = len(fills)
        else:
            fills[best] += size
            out[ident] = best + 1
    return out


def test_conversation_pack_matches_python_replay(spark):
    """Replay: roll turns up to conversations (doc_id div _CONV_TURNS),
    BFD-pack whole conversations per source with an independently coded
    scan, and compare the full assignment; every bin must respect capacity
    unless it holds a single oversize conversation."""
    from pumle_spark.workload.curation import (
        _BIN_CAPACITY,
        _CONV_TURNS,
        pack_conversation_bins,
    )

    convs: dict[tuple[str, int], tuple[int, int]] = {}
    for source, doc_id, n in _docs(spark):
        key = (source, doc_id // _CONV_TURNS)
        turns, toks = convs.get(key, (0, 0))
        convs[key] = (turns + 1, toks + n)

    expect: dict[tuple[str, int], tuple[int, int, int]] = {}
    for source in {s for s, _c in convs}:
        items = [
            (toks, conv_id)
            for (s, conv_id), (_t, toks) in convs.items()
            if s == source
        ]
        bins = _bfd_replay(items, _BIN_CAPACITY)
        for (s, conv_id), (turns, toks) in convs.items():
            if s == source:
                expect[(s, conv_id)] = (turns, toks, bins[conv_id])

    got = {
        (r.source, r.conv_id): (r.n_turns, r.conv_tokens, r.bin_id)
        for r in pack_conversation_bins(spark, SF).collect()
    }
    assert got == expect

    fills: dict[tuple[str, int], int] = {}
    counts: dict[tuple[str, int], int] = {}
    for (s, _c), (_t, toks, b) in got.items():
        fills[(s, b)] = fills.get((s, b), 0) + toks
        counts[(s, b)] = counts.get((s, b), 0) + 1
    for (s, b), f in fills.items():
        assert f <= _BIN_CAPACITY or counts[(s, b)] == 1, (s, b, f)


def test_anneal_schedule_endpoints_interpolation_and_caps(spark):
    """Replay: epoch 1 must equal the natural ppm shares, the last epoch
    the DoReMi final-round alphas (from the registered trainer itself),
    middle epochs the exact integer interpolation; budgets, repeat factors
    and cap flags are recomputed independently."""
    from pumle_spark.workload.sampling import (
        _ANNEAL_EPOCHS,
        _ANNEAL_MAX_REPEAT,
        _DRM_ROUNDS,
        mix_anneal_schedule,
        mix_doremi_weights,
    )

    n_toks: dict[str, int] = {}
    for source, _doc_id, n in _docs(spark):
        n_toks[source] = n_toks.get(source, 0) + n
    b = sum(n_toks.values())
    nat = {s: s_toks * 1000000 // b for s, s_toks in n_toks.items()}
    tgt = {
        r.source: int(r.alpha_ppm)
        for r in mix_doremi_weights(spark, SF).collect()
        if r.round == _DRM_ROUNDS
    }

    rows = mix_anneal_schedule(spark, SF).collect()
    assert len(rows) == _ANNEAL_EPOCHS * len(n_toks)
    for r in rows:
        w = (
            nat[r.source] * (_ANNEAL_EPOCHS - r.epoch)
            + tgt[r.source] * (r.epoch - 1)
        ) // (_ANNEAL_EPOCHS - 1)
        assert r.weight_ppm == w, (r.epoch, r.source)
        budget = b * w // 1000000
        assert r.tokens_budget == budget
        repeat = budget * 1000 // n_toks[r.source]
        assert r.repeat_milli == repeat
        assert r.capped == int(repeat > _ANNEAL_MAX_REPEAT * 1000)
    e1 = {r.source: r.weight_ppm for r in rows if r.epoch == 1}
    eE = {r.source: r.weight_ppm for r in rows if r.epoch == _ANNEAL_EPOCHS}
    assert e1 == nat
    assert eE == tgt


def test_ranked_topk_operator_contract(spark):
    """Unit contract for the shared windowless top-k: exact (desc, asc-tie)
    order, 1-based dense ordinal, k larger than the input, empty input,
    and zero WindowExec in the executed plan."""
    import pyspark.sql.functions as F

    from pumle_spark.operators.topk import ranked_topk

    df = spark.createDataFrame(
        [("a", 3), ("b", 7), ("c", 3), ("d", 9)], "name string, score long"
    )
    got = [tuple(r) for r in ranked_topk(df, 3, "score", "name").collect()]
    assert got == [(1, "d", 9), (2, "b", 7), (3, "a", 3)]

    all_rows = [tuple(r) for r in ranked_topk(df, 10, "score", "name").collect()]
    assert all_rows == [(1, "d", 9), (2, "b", 7), (3, "a", 3), (4, "c", 3)]

    empty = ranked_topk(df.filter(F.col("score") > 100), 5, "score", "name")
    assert empty.count() == 0

    # ADVICE r10 contract: NULL desc keys are excluded (the two phases
    # would otherwise disagree on where NULL ranks), and the carried row
    # payload is NOT part of the phase-2 comparison — a map-typed column
    # (non-orderable) must survive.
    withnull = spark.createDataFrame(
        [("a", 3), ("x", None), ("d", 9)], "name string, score long"
    )
    got_n = [tuple(r) for r in ranked_topk(withnull, 5, "score", "name").collect()]
    assert got_n == [(1, "d", 9), (2, "a", 3)]

    mapped = df.withColumn("m", F.create_map(F.col("name"), F.col("score")))
    got_m = ranked_topk(mapped, 2, "score", "name").collect()
    assert [(r.rnk, r.name, r.score) for r in got_m] == [(1, "d", 9), (2, "b", 7)]
    assert got_m[0].m == {"d": 9}

    plan = (
        ranked_topk(df, 3, "score", "name")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window [" not in plan
    assert "TakeOrderedAndProject" in plan
