"""Round-5 wave-G tests: SLO burn alerts, Fisher price indices, and
decline-streak detection vs brute-force Python oracles at sf0.001."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


# --------------------------------------------------------------------------
# slo_burn_rate_alerts
# --------------------------------------------------------------------------


def test_slo_burn_alerts_match_bruteforce(spark):
    """Alert hours must equal a Python replay of the two-window policy
    with RANGE (clock-hour) long windows."""
    from pumle_spark.tables import table
    from pumle_spark.workload.events import (
        _SLO_BUDGET_PPM,
        _SLO_BURN_X,
        _SLO_LONG_H,
        slo_burn_rate_alerts,
    )

    got = {r.hr: r for r in slo_burn_rate_alerts(spark, SF).collect()}

    n = Counter()
    e = Counter()
    for r in (
        table(spark, SF, "events")
        .select(F.expr("unix_micros(ts) div 3600000000").alias("hr"), "event_type")
        .collect()
    ):
        n[r.hr] += 1
        e[r.hr] += r.event_type == "error"

    thresh = _SLO_BURN_X * _SLO_BUDGET_PPM
    want = {}
    for hr in n:
        nl = sum(n[h] for h in n if hr - (_SLO_LONG_H - 1) <= h <= hr)
        el = sum(e[h] for h in n if hr - (_SLO_LONG_H - 1) <= h <= hr)
        if e[hr] * 1_000_000 >= thresh * n[hr] and el * 1_000_000 >= thresh * nl:
            want[hr] = (n[hr], e[hr], nl, el)

    assert set(got) == set(want)
    for hr, (ns, es, nl, el) in want.items():
        r = got[hr]
        assert (r.n_short, r.e_short, r.n_long, r.e_long) == (ns, es, nl, el)
        assert r.short_ppm == es * 1_000_000 // ns
        assert r.long_ppm == el * 1_000_000 // nl
        assert r.short_ppm >= thresh and r.long_ppm >= thresh


# --------------------------------------------------------------------------
# price_index_fisher
# --------------------------------------------------------------------------


def test_fisher_index_matches_bruteforce(spark):
    """Indices must equal a Python replay of the matched-basket integer
    dot products, and the base year must index at exactly 1e6 ppm."""
    from pumle_spark.tables import table
    from pumle_spark.workload.analytics import _IDX_BASE_YR, price_index_fisher

    rows = {r.yr: r for r in price_index_fisher(spark, SF).collect()}

    agg = defaultdict(lambda: [0, 0])  # (part, yr) -> rev_c, qty
    for r in (
        table(spark, SF, "lineitem")
        .select(
            F.col("l_partkey").alias("part"),
            F.year("l_shipdate").alias("yr"),
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
            .cast("bigint")
            .alias("rev_c"),
            F.col("l_quantity").cast("bigint").alias("q"),
        )
        .collect()
    ):
        a = agg[(r.part, r.yr)]
        a[0] += r.rev_c
        a[1] += r.q

    up = {k: (rev * 1000 // q, q) for k, (rev, q) in agg.items()}
    base = {p: up[(p, y)] for (p, y) in up if y == _IDX_BASE_YR}
    want = {}
    for (p, y), (upm, qty) in up.items():
        if p not in base:
            continue
        up0, q0 = base[p]
        w = want.setdefault(y, [0, 0, 0, 0, 0])
        w[0] += 1
        w[1] += upm * q0
        w[2] += up0 * q0
        w[3] += upm * qty
        w[4] += up0 * qty

    assert set(rows) == set(want)
    for y, (np_, ln, ld, pn, pd) in want.items():
        r = rows[y]
        assert r.n_parts == np_
        assert r.laspeyres_ppm == ln * 1_000_000 // ld
        assert r.paasche_ppm == pn * 1_000_000 // pd
        assert abs(r.fisher_r6 - round(math.sqrt((ln / ld) * (pn / pd)), 6)) < 1e-12
    assert rows[_IDX_BASE_YR].laspeyres_ppm == 1_000_000
    assert rows[_IDX_BASE_YR].paasche_ppm == 1_000_000


# --------------------------------------------------------------------------
# pattern_decline_streaks
# --------------------------------------------------------------------------


def test_decline_streaks_match_bruteforce(spark):
    """The streak list must equal a Python gaps-and-islands replay over
    per-customer monthly spend, and every streak must strictly decline."""
    from pumle_spark.tables import table
    from pumle_spark.workload.analytics import (
        _STREAK_MIN,
        _STREAK_TOP,
        pattern_decline_streaks,
    )

    got = [tuple(r) for r in pattern_decline_streaks(spark, SF).collect()]

    ms = defaultdict(dict)
    for r in (
        table(spark, SF, "orders")
        .select(
            "o_custkey",
            F.date_trunc("month", "o_orderdate").alias("mon"),
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("c"),
        )
        .collect()
    ):
        ms[r.o_custkey][r.mon.date()] = ms[r.o_custkey].get(r.mon.date(), 0) + r.c

    streaks = []
    for cust, series in ms.items():
        mons = sorted(series)
        run = [mons[0]]
        for prev, cur in zip(mons, mons[1:]):
            if series[cur] < series[prev]:
                run.append(cur)
            else:
                if len(run) >= _STREAK_MIN:
                    streaks.append((cust, run[:]))
                run = [prev, cur] if series[cur] < series[prev] else [cur]
        if len(run) >= _STREAK_MIN:
            streaks.append((cust, run))

    want = []
    for cust, run in streaks:
        want.append(
            (
                cust,
                len(run),
                run[0],
                run[-1],
                ms[cust][run[0]],
                ms[cust][run[-1]],
                ms[cust][run[0]] - ms[cust][run[-1]],
            )
        )
    want.sort(key=lambda t: (-t[1], t[0], t[2]))
    assert got == want[:_STREAK_TOP]
    for cust, run in streaks:
        vals = [ms[cust][m] for m in run]
        assert all(a > b for a, b in zip(vals, vals[1:]))
