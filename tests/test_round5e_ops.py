"""Round-5 wave-E tests: regional modularity, Shapley attribution, and
MMR diversified retrieval vs brute-force Python oracles at sf0.001."""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from itertools import combinations

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


# --------------------------------------------------------------------------
# graph_region_modularity
# --------------------------------------------------------------------------


def test_region_modularity_matches_bruteforce(spark):
    """Strengths, intra weights, and Q must equal a Python replay of
    Newman weighted modularity on the nation flow matrix."""
    from pumle_spark.tables import table
    from pumle_spark.workload.graph import graph_region_modularity

    rows = {r.region: r for r in graph_region_modularity(spark, SF).collect()}

    li = (
        table(spark, SF, "lineitem")
        .select("l_suppkey", "l_orderkey", F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("c"))
        .collect()
    )
    sup = {r.s_suppkey: r.s_nationkey for r in table(spark, SF, "supplier").collect()}
    cus = {r.c_custkey: r.c_nationkey for r in table(spark, SF, "customer").collect()}
    ords = {r.o_orderkey: r.o_custkey for r in table(spark, SF, "orders").collect()}
    reg = {r.n_nationkey: r.n_regionkey for r in table(spark, SF, "nation").collect()}

    w = Counter()
    for r in li:
        w[(sup[r.l_suppkey], cus[ords[r.l_orderkey]])] += r.c
    t = sum(w.values())
    strength = Counter()
    intra = Counter()
    for (i, j), c in w.items():
        strength[reg[i]] += c
        strength[reg[j]] += c
        if reg[i] == reg[j]:
            intra[reg[i]] += c

    assert set(rows) == set(strength)
    q = 0
    for rg, s_c in strength.items():
        num = 4 * t * intra[rg] - s_c * s_c
        q += num
        r = rows[rg]
        assert r.strength_cents == s_c
        assert r.intra_cents == intra[rg]
        assert abs(r.contrib_r6 - round(num / (4.0 * t * t), 6)) < 1e-12
    for r in rows.values():
        assert abs(r.modularity_q - round(q / (4.0 * t * t), 6)) < 1e-12
    assert -0.5 <= rows[0].modularity_q <= 1.0


# --------------------------------------------------------------------------
# events_attribution_shapley
# --------------------------------------------------------------------------


def test_shapley_matches_bruteforce_and_axioms(spark):
    """phi must equal the exact permutation-free Shapley formula on the
    journey-mask histogram, and efficiency must hold exactly."""
    from pumle_spark.tables import table
    from pumle_spark.workload.events import _SHAP_CHANNELS, events_attribution_shapley

    rows = {r.channel: r for r in events_attribution_shapley(spark, SF).collect()}

    ev = (
        table(spark, SF, "events")
        .select("user_id", "event_type", F.unix_micros("ts").alias("us"))
        .collect()
    )
    buys = defaultdict(list)
    for r in ev:
        if r.event_type == "purchase":
            buys[r.user_id].append(r.us)
    bit = dict(_SHAP_CHANNELS)
    masks = Counter()
    for u, ts in buys.items():
        t_buy = min(ts)
        m = 0
        for r in ev:
            if r.user_id == u and r.us < t_buy:
                m |= bit.get(r.event_type, 0)
        masks[m] += 1

    def v(s: int) -> int:
        return sum(n for m, n in masks.items() if m & s == m)

    full = sum(b for _, b in _SHAP_CHANNELS)
    others = {n: [bb for nn, bb in _SHAP_CHANNELS if nn != n] for n, _ in _SHAP_CHANNELS}
    want = {}
    for name, b in _SHAP_CHANNELS:
        phi6 = 0
        rest = others[name]
        for k in range(len(rest) + 1):
            w = math.factorial(k) * math.factorial(len(rest) - k)
            for combo in combinations(rest, k):
                t = sum(combo)
                phi6 += w * (v(t | b) - v(t))
        want[name] = phi6

    span = v(full) - v(0)
    assert set(rows) == set(want)
    for name, phi6 in want.items():
        assert rows[name].phi_x6 == phi6
        assert rows[name].share_ppm == (phi6 * 1_000_000 // (6 * span) if span else 0)
    # efficiency axiom: sum phi = v(full) - v(empty), exactly (x6)
    assert sum(r.phi_x6 for r in rows.values()) == 6 * span


# --------------------------------------------------------------------------
# retrieval_mmr_diversified
# --------------------------------------------------------------------------


def test_mmr_matches_bruteforce_greedy(spark):
    """The picked sequence must equal a numpy greedy MMR replay, and
    every query must get K distinct results from its pool."""
    import numpy as np

    from pumle_spark.tables import table
    from pumle_spark.workload.similarity import (
        _MMR_K,
        _MMR_POOL,
        _MMR_WDIV,
        _MMR_WREL,
        _QUERY_STRIDE,
        retrieval_mmr_diversified,
    )

    got = defaultdict(list)
    for r in retrieval_mmr_diversified(spark, SF).collect():
        got[r.query_id].append((r.rnd, r.vec_id, r.rel_micro))

    emb = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in table(spark, SF, "embeddings").collect()
    }

    def cos_m(a, b) -> int:
        x = float(np.dot(emb[a], emb[b]))
        d = math.sqrt(float(np.dot(emb[a], emb[a])) * float(np.dot(emb[b], emb[b])))
        v = x / d * 1_000_000
        return int(math.copysign(math.floor(abs(v) + 0.5), v))

    qids = [i for i in emb if i % _QUERY_STRIDE == 0]
    assert set(got) == set(qids)
    for qid in qids:
        rel = sorted(
            ((cos_m(qid, c), c) for c in emb if c != qid),
            key=lambda t: (-t[0], t[1]),
        )[:_MMR_POOL]
        pool = {c: r for r, c in rel}
        picked = []
        first = min(pool, key=lambda c: (-pool[c], c))
        picked.append(first)
        for _ in range(2, _MMR_K + 1):
            remaining = [c for c in pool if c not in picked]
            if not remaining:
                break
            best = max(
                remaining,
                key=lambda c: (
                    _MMR_WREL * pool[c] - _MMR_WDIV * max(cos_m(c, z) for z in picked),
                    -c,
                ),
            )
            picked.append(best)
        want = [(i + 1, c, pool[c]) for i, c in enumerate(picked)]
        assert sorted(got[qid]) == want, qid
        assert len({c for _, c, _ in got[qid]}) == len(got[qid])
