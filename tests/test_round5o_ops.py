"""Round-5 batch-o operator tests: importance weights + ESS, Markov-1
predictor accuracy. Pure-python re-derivations."""

from __future__ import annotations

from collections import defaultdict
from datetime import datetime

SF = "/root/testdata/sf0.001"


def test_importance_weights_match_pure_python(spark):
    """Cross-multiplied weights and the Kish ESS recomputed exactly."""
    from pumle_spark.tables import table
    from pumle_spark.workload.drift import _IW_Y_SRC, _IW_Y_TGT, drift_importance_weights

    src = defaultdict(int)
    tgt = defaultdict(int)
    for r in table(spark, SF, "orders").select("o_orderdate", "o_orderpriority").collect():
        d = r.o_orderdate.date() if isinstance(r.o_orderdate, datetime) else r.o_orderdate
        cell = (d.month, r.o_orderpriority)
        if d.year == _IW_Y_SRC:
            src[cell] += 1
        elif d.year == _IW_Y_TGT:
            tgt[cell] += 1

    s_tot, t_tot = sum(src.values()), sum(tgt.values())
    w = {c: tgt.get(c, 0) * s_tot * 1_000_000 // (ns * t_tot) for c, ns in src.items()}
    sw = sum(src[c] * w[c] for c in src)
    sww = sum(src[c] * w[c] * w[c] for c in src)
    ess = round(float(sw) * float(sw) / float(sww), 3)

    got = {(r.month, r.priority): r for r in drift_importance_weights(spark, SF).collect()}
    assert set(got) == set(src)
    for c, ns in src.items():
        r = got[c]
        assert r.n_src == ns
        assert r.n_tgt == tgt.get(c, 0)
        assert r.w_micro == w[c]
        assert r.ess_overall == ess
    # ESS sanity: bounded by the source size, positive
    assert 0 < ess <= s_tot


def test_markov_accuracy_matches_transition_replay(spark):
    """Per-state modal-successor accuracy replayed from ordered events."""
    from pumle_spark.tables import table
    from pumle_spark.workload.events import events_markov_accuracy

    per_user = defaultdict(list)
    for r in table(spark, SF, "events").select("user_id", "ts", "event_id", "event_type").collect():
        per_user[r.user_id].append((r.ts, r.event_id, r.event_type))

    trans = defaultdict(lambda: defaultdict(int))
    for evs in per_user.values():
        evs.sort()
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            trans[a][b] += 1

    got = {r.event_type: r for r in events_markov_accuracy(spark, SF).collect()}
    assert set(got) == set(trans)
    for a, nxts in trans.items():
        total = sum(nxts.values())
        pred, c = sorted(nxts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        r = got[a]
        assert r.predicted == pred
        assert r.n_transitions == total
        assert r.n_correct == c
        assert r.accuracy_ppm == c * 1_000_000 // total
