"""Round-5 batch-r operator tests: interrupted time series, relational
division. Pure-python replays."""

from __future__ import annotations

from collections import defaultdict
from datetime import date, datetime

SF = "/root/testdata/sf0.001"


def test_interrupted_timeseries_matches_rational_ols(spark):
    """Pre-trend OLS kept rational, post extrapolation replayed exactly."""
    from pumle_spark.tables import table
    from pumle_spark.workload.events import (
        _ITS_CUT_FRAC_DEN,
        _ITS_CUT_FRAC_NUM,
        events_interrupted_timeseries,
    )

    daily = defaultdict(int)
    for r in table(spark, SF, "events").select("ts").collect():
        daily[(r.ts.date() - date(1970, 1, 1)).days] += 1

    d0, d1 = min(daily), max(daily)
    cut = d0 + (d1 - d0) * _ITS_CUT_FRAC_NUM // _ITS_CUT_FRAC_DEN
    pre = [(d - d0, y) for d, y in daily.items() if d <= cut]
    post = [(d - d0, y) for d, y in daily.items() if d > cut]

    n = len(pre)
    sx = sum(x for x, _ in pre)
    sy = sum(y for _, y in pre)
    sxx = sum(x * x for x, _ in pre)
    sxy = sum(x * y for x, y in pre)
    den = n * sxx - sx * sx
    yhat_num = sum(sy * sxx - sx * sxy + x * (n * sxy - sx * sy) for x, _ in post)
    actual = sum(y for _, y in post)

    r = events_interrupted_timeseries(spark, SF).collect()
    assert len(r) == 1
    r = r[0]
    assert r.n_post_days == len(post)
    assert r.actual_events == actual
    def tdiv(a: int, b: int) -> int:
        # engine integer division truncates toward zero
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    assert r.predicted_events == tdiv(yhat_num, den)
    assert r.lift_ppm == tdiv((actual * den - yhat_num) * 1_000_000, yhat_num)


def test_relational_division_for_all_semantics(spark):
    """Every returned supplier covers ALL regions in the window; every
    excluded one misses at least one. Recomputed from raw rows."""
    from pumle_spark.tables import table
    from pumle_spark.workload.relational3 import (
        _DIV_FROM,
        _DIV_TO,
        join_relational_division,
    )

    ords = {r.o_orderkey: r.o_custkey for r in table(spark, SF, "orders").collect()}
    cnat = {r.c_custkey: r.c_nationkey for r in table(spark, SF, "customer").collect()}
    nreg = {r.n_nationkey: r.n_regionkey for r in table(spark, SF, "nation").collect()}
    all_regions = {r.r_regionkey for r in table(spark, SF, "region").collect()}

    lo = date.fromisoformat(_DIV_FROM)
    hi = date.fromisoformat(_DIV_TO)
    cov = defaultdict(set)
    lines = defaultdict(int)
    for r in table(spark, SF, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate").collect():
        d = r.l_shipdate.date() if isinstance(r.l_shipdate, datetime) else r.l_shipdate
        if lo <= d < hi:
            reg = nreg[cnat[ords[r.l_orderkey]]]
            cov[r.l_suppkey].add(reg)
            lines[r.l_suppkey] += 1

    expect = {
        s: (len(rs), lines[s]) for s, rs in cov.items() if rs == all_regions
    }
    got = {r.suppkey: (r.n_regions, r.n_lines) for r in join_relational_division(spark, SF).collect()}
    assert got == expect
    assert got, "division must be non-degenerate at sf0.001"
    # at least one supplier in the window must NOT divide (discriminating)
    assert len(got) < len(cov)
