"""Round-5 batch-l operator tests: t-closeness EMD, k-center coreset, RFM
migration matrix. Pure-python re-derivations."""

from __future__ import annotations

from collections import defaultdict

import numpy as np

SF = "/root/testdata/sf0.001"


def test_t_closeness_matches_pure_python_emd(spark):
    """Per-class ordered EMD recomputed with exact integer prefix sums."""
    from pumle_spark.tables import table
    from pumle_spark.workload.experiments import (
        _TC_BAND_CENTS,
        _TC_BANDS,
        _TC_THRESH_MICRO,
        privacy_t_closeness,
    )

    spend = defaultdict(int)
    for r in table(spark, SF, "orders").select("o_custkey", "o_totalprice").collect():
        spend[r.o_custkey] += int(round(r.o_totalprice * 100))

    def tdiv(a: int, b: int) -> int:
        # Spark `div` / DuckDB `//` on BIGINT truncate toward zero
        q = abs(a) // b
        return q if a >= 0 else -q

    classes = defaultdict(lambda: [0] * _TC_BANDS)
    for r in table(spark, SF, "customer").collect():
        sband = min(_TC_BANDS - 1, spend.get(r.c_custkey, 0) // _TC_BAND_CENTS)
        key = (r.c_nationkey, r.c_mktsegment, tdiv(int(round(r.c_acctbal * 100)), 100000))
        classes[key][sband] += 1

    g = [sum(c[i] for c in classes.values()) for i in range(_TC_BANDS)]
    n = sum(g)
    emds = {}
    for key, cnts in classes.items():
        n_c = sum(cnts)
        p = 0
        tot = 0
        for i in range(_TC_BANDS):
            p += n * cnts[i] - n_c * g[i]
            tot += abs(p)
        assert p == 0  # final prefix must vanish exactly
        emds[key] = (n_c, tot * 1_000_000 // ((_TC_BANDS - 1) * n_c * n))

    got = {r.t_micro: r for r in privacy_t_closeness(spark, SF).collect()}
    assert set(got) == set(_TC_THRESH_MICRO)
    for t in _TC_THRESH_MICRO:
        viol = [(nc, e) for nc, e in emds.values() if e > t]
        r = got[t]
        assert r.n_classes == len(emds)
        assert r.n_violating == len(viol)
        assert r.rows_at_risk == sum(nc for nc, _ in viol)
        assert r.risk_ppm == sum(nc for nc, _ in viol) * 1_000_000 // n
        assert r.max_emd_micro == max(e for _, e in emds.values())


def test_kcenter_matches_numpy_farthest_first(spark):
    """Greedy farthest-point traversal replayed with numpy; centers, order,
    and radii must match, and the radius curve must be non-increasing."""
    from pumle_spark.tables import table
    from pumle_spark.workload.similarity import _KC_K, sample_coreset_kcenter

    rows = table(spark, SF, "embeddings").collect()
    ids = np.array([r.vec_id for r in rows])
    V = np.array([r.embedding for r in rows], dtype=np.float64)
    nv = (V * V).sum(axis=1)

    order = np.argsort(ids)
    ids, V, nv = ids[order], V[order], nv[order]

    def d2m(i, j):
        return int(round((nv[i] + nv[j] - 2 * float(V[i] @ V[j])) * 1_000_000))

    sel = [0]  # min vec_id first
    expect = [(1, int(ids[0]), 0)]
    dmin = {i: d2m(i, 0) for i in range(1, len(ids))}
    for rnd in range(2, _KC_K + 1):
        pick = max(dmin, key=lambda i: (dmin[i], -ids[i]))
        # tiebreak: max dmin then MIN vec_id
        best = max(dmin.values())
        cands = [i for i, d in dmin.items() if d == best]
        pick = min(cands, key=lambda i: ids[i])
        expect.append((rnd, int(ids[pick]), dmin[pick]))
        del dmin[pick]
        for i in list(dmin):
            dmin[i] = min(dmin[i], d2m(i, pick))

    got = [(r.rnd, r.center_id, r.radius_micro) for r in sample_coreset_kcenter(spark, SF).collect()]
    assert got == expect
    radii = [r for _, _, r in got[1:]]
    assert radii == sorted(radii, reverse=True)


def test_rfm_migration_matches_pure_python(spark):
    """Matrix recomputed from raw orders; shares are exact origin-row ppm
    and origin rows sum to the active-customer universe."""
    from pumle_spark.tables import table
    from pumle_spark.workload.analytics import (
        _MIG_FREQ,
        _MIG_SPEND,
        _MIG_Y1,
        _MIG_Y2,
        orders_rfm_migration,
    )

    per = defaultdict(lambda: defaultdict(lambda: [0, 0]))
    for r in table(spark, SF, "orders").collect():
        y = r.o_orderdate.year
        if y in (_MIG_Y1, _MIG_Y2):
            c = per[y][r.o_custkey]
            c[0] += 1
            c[1] += int(round(r.o_totalprice * 100))

    def seg(c):
        if c is None:
            return "inactive"
        n, s = c
        if n >= _MIG_FREQ and s >= _MIG_SPEND:
            return "vip"
        if n >= _MIG_FREQ:
            return "frequent"
        if s >= _MIG_SPEND:
            return "big_ticket"
        return "casual"

    universe = set(per[_MIG_Y1]) | set(per[_MIG_Y2])
    cells = defaultdict(int)
    for k in universe:
        cells[(seg(per[_MIG_Y1].get(k)), seg(per[_MIG_Y2].get(k)))] += 1
    rowt = defaultdict(int)
    for (f, _), v in cells.items():
        rowt[f] += v

    got = {
        (r.seg_from, r.seg_to): (r.n_customers, r.share_of_from_ppm)
        for r in orders_rfm_migration(spark, SF).collect()
    }
    assert got == {
        k: (v, v * 1_000_000 // rowt[k[0]]) for k, v in cells.items()
    }
    assert ("inactive", "inactive") not in got
    assert sum(v for v, _ in got.values()) == len(universe)


def test_stream_trending_topk_invariants(spark):
    """The gated streaming query's emitted finals: per-window rank is
    1..k, counts non-increasing within a window, and window totals match
    the batch double-expansion of hourly counts."""
    from collections import defaultdict

    from pumle_spark.tables import table
    from pumle_spark.workload.events import _TREND_TOP, stream_trending_topk_final

    rows = stream_trending_topk_final(spark, SF).collect()
    assert rows
    per_w = defaultdict(list)
    for r in rows:
        per_w[r.window_start].append((r.rnk, r.n_events, r.event_type))
    for w, rs in per_w.items():
        rs.sort()
        assert [x[0] for x in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= _TREND_TOP
        counts = [x[1] for x in rs]
        assert counts == sorted(counts, reverse=True)

    # brute force: every event counts in exactly its two covering windows
    hourly = defaultdict(lambda: defaultdict(int))
    for r in table(spark, SF, "events").select("ts", "event_type").collect():
        h = r.ts.replace(minute=0, second=0, microsecond=0)
        hourly[h][r.event_type] += 1
    expect_top = {}
    win = defaultdict(lambda: defaultdict(int))
    from datetime import timedelta

    for h, cs in hourly.items():
        for et, c in cs.items():
            win[h][et] += c
            win[h - timedelta(hours=1)][et] += c
    for w, cs in win.items():
        ranked = sorted(cs.items(), key=lambda kv: (-kv[1], kv[0]))[:_TREND_TOP]
        expect_top[w.strftime("%Y-%m-%d %H:%M:%S")] = [
            (i + 1, n, et) for i, (et, n) in enumerate(ranked)
        ]
    assert {w: sorted(rs) for w, rs in per_w.items()} == expect_top
