"""Round-5 batch-s operator tests: growth accounting, walk corpus."""

from __future__ import annotations

import hashlib
from collections import defaultdict
from datetime import date

SF = "/root/testdata/sf0.001"


def test_growth_accounting_conservation_and_replay(spark):
    """States replayed per user-week; the conservation identities hold."""
    from pumle_spark.tables import table
    from pumle_spark.workload.events import events_growth_accounting

    weeks = defaultdict(set)
    for r in table(spark, SF, "events").select("user_id", "ts").collect():
        wk = (r.ts.date() - date(1970, 1, 1)).days // 7
        weeks[r.user_id].add(wk)

    expect = defaultdict(lambda: [0, 0, 0, 0])  # new, retained, resurrected, churned
    max_wk = max(w for ws in weeks.values() for w in ws)
    for ws in weeks.values():
        ordered = sorted(ws)
        for i, w in enumerate(ordered):
            if i == 0:
                expect[w][0] += 1
            elif ordered[i - 1] == w - 1:
                expect[w][1] += 1
            else:
                expect[w][2] += 1
        for w in ordered:
            if w < max_wk and (w + 1) not in ws:
                expect[w + 1][3] += 1

    got = {
        r.week: (r.n_new, r.n_retained, r.n_resurrected, r.n_churned)
        for r in events_growth_accounting(spark, SF).collect()
    }
    assert got == {w: tuple(v) for w, v in expect.items()}

    # conservation: active_w = new + retained + resurrected
    active = defaultdict(int)
    for ws in weeks.values():
        for w in ws:
            active[w] += 1
    for w, (n, ret, res, _) in got.items():
        assert n + ret + res == active.get(w, 0)


def test_walk_corpus_matches_hash_replay(spark):
    """Every walk replayed step by step with the md5-rank rule."""
    from pumle_spark.tables import table
    from pumle_spark.workload.graph import _WALK_LEN, _WALK_SEED_STRIDE, graph_walk_corpus

    o = {r.o_orderkey: r.o_custkey for r in table(spark, SF, "orders").collect()}
    pairs = {
        (o[r.l_orderkey] * 2, r.l_suppkey * 2 + 1)
        for r in table(spark, SF, "lineitem").collect()
    }
    adj = defaultdict(list)
    for c, s in pairs:
        adj[c].append(s)
        adj[s].append(c)
    for k in adj:
        adj[k].sort()

    seeds = sorted(
        r.s_suppkey * 2 + 1
        for r in table(spark, SF, "supplier").collect()
        if r.s_suppkey % _WALK_SEED_STRIDE == 0 and (r.s_suppkey * 2 + 1) in adj
    )
    expect = []
    for seed in seeds:
        node = seed
        expect.append((seed, 0, node))
        for k in range(1, _WALK_LEN + 1):
            h = int(hashlib.md5(f"walk|{node}|{k}".encode()).hexdigest()[:8], 16)
            node = adj[node][h % len(adj[node])]
            expect.append((seed, k, node))
    expect.sort()

    rows = graph_walk_corpus(spark, SF).collect()
    got = sorted((r.seed_node, r.step, r.node_id) for r in rows)
    assert got == expect
    for r in rows:
        assert r.node_type == ("customer" if r.node_id % 2 == 0 else "supplier")
        # bipartite: parity alternates every step
        assert (r.node_id % 2 == 1) == (r.step % 2 == 0)
