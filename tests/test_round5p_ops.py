"""Round-5 batch-p operator tests: water-filling mixture, sequential SPRT."""

from __future__ import annotations

import hashlib
import re
from collections import defaultdict

SF = "/root/testdata/sf0.001"


def test_waterfill_matches_closed_form_and_budget(spark):
    """q_s and the q²-proportional largest-remainder allocation replayed."""
    from pumle_spark.tables import table
    from pumle_spark.workload.sampling import _WF_BUDGET_TOKENS, mix_waterfill_budget

    per_src = defaultdict(lambda: [0, set()])
    for r in table(spark, SF, "documents").select("source", "text").collect():
        ws = re.sub(r"[^a-z0-9]+", " ", r.text.lower()).strip().split(" ")
        st = per_src[r.source]
        for w in ws:
            if w:
                st[0] += 1
                st[1].add(w)

    q = {s: (n, len(d) * 1_000_000 // n) for s, (n, d) in per_src.items()}
    qq = sum(v * v for _, v in q.values())
    base = {s: _WF_BUDGET_TOKENS * v * v // qq for s, (_, v) in q.items()}
    rem = {s: _WF_BUDGET_TOKENS * v * v % qq for s, (_, v) in q.items()}
    left = _WF_BUDGET_TOKENS - sum(base.values())
    for s in sorted(q, key=lambda s: (-rem[s], s))[:left]:
        base[s] += 1

    got = {r.source: r for r in mix_waterfill_budget(spark, SF).collect()}
    assert set(got) == set(q)
    for s, (n, v) in q.items():
        r = got[s]
        assert (r.avail_tokens, r.q_micro) == (n, v)
        assert r.alloc_tokens == base[s]
        assert r.share_ppm == base[s] * 1_000_000 // _WF_BUDGET_TOKENS
    assert sum(r.alloc_tokens for r in got.values()) == _WF_BUDGET_TOKENS


def test_sprt_matches_sequential_replay(spark):
    """The LLR trajectory replayed user by user in arrival order."""
    from pumle_spark.tables import table
    from pumle_spark.workload.experiments import (
        _SPRT_A,
        _SPRT_B,
        _SPRT_LOSE,
        _SPRT_WIN,
        abtest_sprt_sequential,
    )

    users = defaultdict(lambda: [None, 0, 0])  # first_tus, n_purch, n_ev
    for r in table(spark, SF, "events").select("user_id", "ts", "event_type").collect():
        tus = int(r.ts.timestamp() * 1_000_000)
        st = users[r.user_id]
        st[0] = tus if st[0] is None else min(st[0], tus)
        st[1] += 1 if r.event_type == "purchase" else 0
        st[2] += 1

    arms = defaultdict(list)
    for uid, (tus, np_, n) in users.items():
        h = int(hashlib.md5(f"did|{uid}".encode()).hexdigest()[:4], 16) % 100
        arm = "control" if h < 50 else "treatment"
        arms[arm].append((tus, uid, 1 if 5 * np_ > n else 0))

    got = {r.arm: r for r in abtest_sprt_sequential(spark, SF).collect()}
    assert set(got) == set(arms)
    for arm, seq in arms.items():
        seq.sort()
        llr, i_h1, i_h0 = 0, None, None
        for i, (_, _, heavy) in enumerate(seq, start=1):
            llr += _SPRT_WIN if heavy else _SPRT_LOSE
            if i_h1 is None and llr >= _SPRT_A:
                i_h1 = i
            if i_h0 is None and llr <= _SPRT_B:
                i_h0 = i
        if i_h1 is not None and (i_h0 is None or i_h1 < i_h0):
            decision, n_dec = "accept_h1", i_h1
        elif i_h0 is not None:
            decision, n_dec = "accept_h0", min(x for x in (i_h0, i_h1) if x is not None)
        else:
            decision, n_dec = "continue", 0
        r = got[arm]
        assert r.n_users == len(seq)
        assert r.n_heavy == sum(h for _, _, h in seq)
        assert r.decision == decision
        assert r.n_at_decision == (min(x for x in (i_h1, i_h0) if x is not None) if decision != "continue" else 0)
        assert r.llr_final_micro == llr
