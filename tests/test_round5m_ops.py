"""Round-5 batch-m operator tests: Little's-law audit, SPC control chart.
Pure-python re-derivations from raw rows."""

from __future__ import annotations

from collections import defaultdict
from datetime import date, datetime

SF = "/root/testdata/sf0.001"


def _day(d) -> int:
    d = d.date() if isinstance(d, datetime) else d
    return (d - date(1970, 1, 1)).days


def test_littles_law_audit_matches_interval_replay(spark):
    """L_obs recomputed by day-level interval stabbing; L_pred must equal
    sum_w/days exactly (the identity the operator isolates)."""
    from pumle_spark.tables import table
    from pumle_spark.workload.analytics import _LL_Y, orders_littles_law_audit

    ords = {r.o_orderkey: _day(r.o_orderdate) for r in table(spark, SF, "orders").collect()}
    ship = defaultdict(int)
    for r in table(spark, SF, "lineitem").select("l_orderkey", "l_shipdate").collect():
        ship[r.l_orderkey] = max(ship[r.l_orderkey], _day(r.l_shipdate))

    d0 = (date(_LL_Y, 1, 1) - date(1970, 1, 1)).days
    d1 = (date(_LL_Y + 1, 1, 1) - date(1970, 1, 1)).days - 1
    n_days = d1 - d0 + 1

    n_arr = sum_w = sum_open = 0
    for ok, ds in ship.items():
        do = ords[ok]
        if d0 <= do <= d1:
            n_arr += 1
            sum_w += ds - do
        sum_open += max(0, min(ds - 1, d1) - max(do, d0) + 1)

    r = orders_littles_law_audit(spark, SF).collect()
    assert len(r) == 1
    r = r[0]
    assert r.n_arr == n_arr
    assert r.lambda_micro == n_arr * 1_000_000 // n_days
    assert r.w_days_micro == sum_w * 1_000_000 // n_arr
    assert r.l_pred_micro == sum_w * 1_000_000 // n_days
    assert r.l_obs_micro == sum_open * 1_000_000 // n_days
    off = 1_000_000_000
    assert r.gap_ppm == ((sum_open - sum_w) * 1_000_000 + off * sum_w) // sum_w - off


def test_spc_chart_matches_pure_python_rules(spark):
    """Both Western Electric rules replayed exactly: frozen baseline
    moments, cross-multiplied 3-sigma, and consecutive-week runs."""
    from pumle_spark.tables import table
    from pumle_spark.workload.analytics import (
        _SPC_BASE_Y,
        _SPC_EVAL_Y,
        _SPC_RUN,
        orders_spc_control_chart,
    )

    wk = defaultdict(int)
    for r in table(spark, SF, "orders").select("o_orderdate", "o_orderpriority").collect():
        d = r.o_orderdate.date() if isinstance(r.o_orderdate, datetime) else r.o_orderdate
        y = d.year
        if y in (_SPC_BASE_Y, *_SPC_EVAL_Y):
            wk[(r.o_orderpriority, _day(d) // 7, y)] += 1

    base = defaultdict(lambda: [0, 0, 0])  # n, s, ss
    for (p, _, y), x in wk.items():
        if y == _SPC_BASE_Y:
            b = base[p]
            b[0] += 1
            b[1] += x
            b[2] += x * x

    expect = {}
    per_p = defaultdict(list)
    for (p, w, y), x in wk.items():
        if y in _SPC_EVAL_Y:
            per_p[p].append((w, x))
    for p, rows in per_p.items():
        n, s, ss = base[p]
        rows.sort()
        sides = {w: (1 if x * n > s else 0) for w, x in rows}
        # consecutive same-side runs (a missing week breaks the run)
        run_flag = {}
        i = 0
        ws = [w for w, _ in rows]
        while i < len(ws):
            j = i
            while (
                j + 1 < len(ws)
                and ws[j + 1] == ws[j] + 1
                and sides[ws[j + 1]] == sides[ws[i]]
            ):
                j += 1
            flag = 1 if j - i + 1 >= _SPC_RUN else 0
            for k in range(i, j + 1):
                run_flag[ws[k]] = flag
            i = j + 1
        for w, x in rows:
            r3 = 1 if (x * n - s) ** 2 > 9 * n * (n * ss - s * s) else 0
            if r3 or run_flag[w]:
                expect[(p, w)] = (x, sides[w], r3, run_flag[w])

    got = {
        (r.priority, r.week): (r.x, r.above, r.rule_3sigma, r.rule_run8)
        for r in orders_spc_control_chart(spark, SF).collect()
    }
    assert got == expect
