"""Round-5 batch-j operator tests: media pHash near-dup, personalized
PageRank, watermark-policy audit. Pure-python re-derivations."""

from __future__ import annotations

import hashlib
from collections import defaultdict

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_phash_neardup_matches_allpairs_bruteforce(spark):
    """Signatures and the near-dup pair set recomputed with python ints;
    the pigeonhole block join must lose no pair vs the all-pairs scan."""
    from pumle_spark.tables import table
    from pumle_spark.workload.multimodal import _PH_MAXH, multimodal_phash_neardup

    sigs = {}
    for r in table(spark, SF, "documents").select("doc_id", "text").collect():
        hx = r.text.encode().hex().upper()
        if len(hx) < 8:
            continue
        grams = {hx[p : p + 8] for p in range(0, len(hx) - 7, 4)}
        sig = 0
        for j in range(64):
            w = 0
            for g in grams:
                d = _md5(g)
                h = int(d[:8], 16) if j < 32 else int(d[8:16], 16)
                w += ((h >> (j % 32)) & 1) * 2 - 1
            if w > 0:
                sig |= 1 << j
        sigs[r.doc_id] = sig & (1 << 64) - 1

    ids = sorted(sigs)
    expect = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            h = bin(sigs[a] ^ sigs[b]).count("1")
            if h <= _PH_MAXH:
                expect[(a, b)] = h

    got = {
        (r.media_id_a, r.media_id_b): r.hamming
        for r in multimodal_phash_neardup(spark, SF).collect()
    }
    assert got == expect


def test_ppr_seeded_matches_pure_python(spark):
    """Personalized PageRank re-run with identical integer arithmetic;
    seeds must hold initial mass, and rows must match exactly."""
    from pumle_spark.tables import table
    from pumle_spark.workload.graph import _ITERS, _MASS, _PPR_REGION, _PPR_TOP, graph_ppr_seeded

    o = {r.o_orderkey: r.o_custkey for r in table(spark, SF, "orders").collect()}
    pairs = {
        (o[r.l_orderkey] * 2, r.l_suppkey * 2 + 1)
        for r in table(spark, SF, "lineitem").collect()
        if r.l_orderkey in o
    }
    edges = [(c, s) for c, s in pairs] + [(s, c) for c, s in pairs]
    deg = defaultdict(int)
    for s, _ in edges:
        deg[s] += 1

    nat = {r.n_nationkey: r.n_regionkey for r in table(spark, SF, "nation").collect()}
    reg = {r.r_regionkey: r.r_name for r in table(spark, SF, "region").collect()}
    seeds = {
        r.s_suppkey * 2 + 1
        for r in table(spark, SF, "supplier").collect()
        if reg[nat[r.s_nationkey]] == _PPR_REGION and (r.s_suppkey * 2 + 1) in deg
    }
    assert seeds, "seed set empty — region filter broke"
    k = len(seeds)
    r = {n: _MASS // k for n in seeds}
    for _ in range(_ITERS):
        inflow = defaultdict(int)
        for s, d in edges:
            if s in r:
                inflow[d] += r[s] // deg[s]
        nxt = defaultdict(int)
        for d, v in inflow.items():
            nxt[d] += (85 * v) // 100
        for n in seeds:
            nxt[n] += (15 * _MASS) // (100 * k)
        r = dict(nxt)
    expect = sorted(r.items(), key=lambda kv: (-kv[1], kv[0]))[:_PPR_TOP]

    rows = graph_ppr_seeded(spark, SF).collect()
    assert [(x.node_id, x.rank_micro) for x in rows] == expect
    for x in rows:
        assert x.is_seed == (1 if x.node_id in seeds else 0)
        assert x.node_type == ("customer" if x.node_id % 2 == 0 else "supplier")


def test_watermark_audit_matches_sorted_replay(spark):
    """Replay events in simulated arrival order with a running max and
    count drops per policy — must equal the two-level-prefix plan."""
    from pumle_spark.tables import table
    from pumle_spark.workload.events import (
        _WM_MAX_DELAY_US,
        _WM_POLICIES_S,
        stream_watermark_policy_audit,
    )

    evs = []
    for r in table(spark, SF, "events").select("event_id", "ts").collect():
        tus = int(r.ts.timestamp() * 1_000_000)
        delay = int(_md5(f"lat|{r.event_id}")[:8], 16) % _WM_MAX_DELAY_US
        evs.append((tus + delay, r.event_id, tus))
    evs.sort()

    lates = []
    rm = 0
    for _, _, tus in evs:
        lates.append(max(0, rm - tus))
        rm = max(rm, tus)

    got = {r.wm_seconds: r for r in stream_watermark_policy_audit(spark, SF).collect()}
    assert set(got) == set(_WM_POLICIES_S)
    for wm in _WM_POLICIES_S:
        dropped = sum(1 for v in lates if v > wm * 1_000_000)
        r = got[wm]
        assert r.n_events == len(evs)
        assert r.n_dropped == dropped
        assert r.dropped_ppm == dropped * 1_000_000 // len(evs)
        assert r.max_lateness_s == max(lates) // 1_000_000
