"""Round-5 batch-i operator tests: Holt linear forecast, Fano burstiness,
TextRank keywords. Pure-python re-derivations, independent of the SQL
formulation shared with the DuckDB oracle."""

from __future__ import annotations

from collections import defaultdict

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


def _monthly_cents(spark):
    from pumle_spark.tables import table
    from pumle_spark.workload.analytics import _HOLT_BASE, _HOLT_K

    series = defaultdict(lambda: [0] * _HOLT_K)
    for r in table(spark, SF, "orders").collect():
        mi = (r.o_orderdate.year - 1992) * 12 + r.o_orderdate.month - 1
        if _HOLT_BASE <= mi < _HOLT_BASE + _HOLT_K:
            series[r.o_orderpriority][mi - _HOLT_BASE] += int(round(r.o_totalprice * 100))
    return series


def test_holt_exact_weights_and_close_to_float_recursion(spark):
    """The quantized-weight dot product must match the query exactly AND
    track the true float Holt recursion (proving the weights ARE Holt)."""
    from pumle_spark.workload.analytics import (
        _HOLT_OFF,
        _HOLT_OFFD,
        _HOLT_SCALE,
        _HOLT_WB,
        _HOLT_WL,
        forecast_holt_linear,
    )

    series = _monthly_cents(spark)
    got = {r.priority: r for r in forecast_holt_linear(spark, SF).collect()}
    assert set(got) == set(series)

    for prio, y in series.items():
        ls = sum(w * v for w, v in zip(_HOLT_WL, y))
        bs = sum(w * v for w, v in zip(_HOLT_WB, y))

        def q(x):
            return (x + _HOLT_OFF) // _HOLT_SCALE - _HOLT_OFFD

        r = got[prio]
        assert (r.level_cents, r.trend_cents) == (q(ls), q(bs))
        assert (r.f1_cents, r.f2_cents, r.f3_cents) == (
            q(ls + bs), q(ls + 2 * bs), q(ls + 3 * bs),
        )

        # float recursion: l0=y0, b0=y1-y0; alpha=beta=1/2
        lvl, trd = float(y[0]), float(y[1] - y[0])
        for t in range(1, len(y)):
            prev = lvl
            lvl = 0.5 * y[t] + 0.5 * (lvl + trd)
            trd = 0.5 * (lvl - prev) + 0.5 * trd
        # micro-quantized taps vs exact recursion: relative slack only
        scale = max(abs(lvl), 1.0)
        assert abs(r.level_cents - lvl) <= 2e-4 * scale + 2
        assert abs(r.trend_cents - trd) <= 2e-4 * scale + 2


def test_fano_brute_force_and_poisson_anchor(spark):
    """Recompute the dispersion index from raw events; Fano of hourly
    counts must be the exact integer formula over the global hour span."""
    from pumle_spark.tables import table
    from pumle_spark.workload.events import events_fano_burstiness

    hours = defaultdict(lambda: defaultdict(int))
    all_hours = set()
    for r in table(spark, SF, "events").select("event_type", "ts").collect():
        hr = r.ts.replace(minute=0, second=0, microsecond=0)
        hours[r.event_type][hr] += 1
        all_hours.add(hr)
    span = int((max(all_hours) - min(all_hours)).total_seconds()) // 3600 + 1

    got = {r.event_type: r for r in events_fano_burstiness(spark, SF).collect()}
    assert set(got) == set(hours)
    for et, cs in hours.items():
        t = sum(cs.values())
        s2 = sum(c * c for c in cs.values())
        r = got[et]
        assert r.n_events == t
        assert r.nonzero_hours == len(cs)
        assert r.span_hours == span
        assert r.fano_micro == 1_000_000 * (span * s2 - t * t) // (span * t)
        assert r.fano_micro >= 0


def test_textrank_matches_pure_python_pagerank(spark):
    """Rebuild the vocab-capped co-occurrence graph and run the identical
    integer PageRank in pure python; ranked terms and masses must match."""
    from pumle_spark.tables import table
    from pumle_spark.workload.text import (
        _TR_ITERS,
        _TR_MASS,
        _TR_MINLEN,
        _TR_STOP,
        _TR_TOP,
        _TR_VOCAB,
        text_keyword_textrank,
    )
    import re

    docs = [r.text for r in table(spark, SF, "documents").collect()]
    tf = defaultdict(int)
    adj = defaultdict(int)
    stop = set(_TR_STOP)
    for text in docs:
        ws = re.sub(r"[^a-z0-9]+", " ", text.lower()).strip().split(" ")
        for w in ws:
            if len(w) >= _TR_MINLEN and w not in stop:
                tf[w] += 1
        for a, b in zip(ws, ws[1:]):
            if (
                len(a) >= _TR_MINLEN and len(b) >= _TR_MINLEN
                and a != b and a not in stop and b not in stop
            ):
                adj[(a, b)] += 1
    vocab = {w for w, _ in sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))[:_TR_VOCAB]}
    ew = defaultdict(int)
    for (a, b), c in adj.items():
        if a in vocab and b in vocab:
            ew[(min(a, b), max(a, b))] += c
    edges = [(u, v, w) for (u, v), w in ew.items()] + [(v, u, w) for (u, v), w in ew.items()]
    deg = defaultdict(int)
    for s, _, w in edges:
        deg[s] += w
    n = len(deg)
    r = {u: _TR_MASS // n for u in deg}
    for _ in range(_TR_ITERS):
        inflow = defaultdict(int)
        for s, d, w in edges:
            inflow[d] += (r[s] * w) // deg[s]
        r = {d: (15 * _TR_MASS) // (100 * n) + (85 * s) // 100 for d, s in inflow.items()}
    expect = sorted(r.items(), key=lambda kv: (-kv[1], kv[0]))[:_TR_TOP]

    rows = text_keyword_textrank(spark, SF).collect()
    assert [(x.term, x.rank_micro) for x in rows] == expect
    assert [x.rnk for x in rows] == list(range(1, len(rows) + 1))
    assert all(x.wdeg == deg[x.term] for x in rows)
