"""Round-5 wave-D tests: peak session concurrency, duplicate-payment
audit, l-diversity, and two-way ANOVA cells vs brute-force Python
oracles at sf0.001."""

from __future__ import annotations

from collections import Counter, defaultdict

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


# --------------------------------------------------------------------------
# sessions_peak_concurrency
# --------------------------------------------------------------------------


def test_peak_concurrency_matches_sweepline(spark):
    """Daily peaks must equal a Python sweep line over the same
    gap-based sessions, including the carry-in-aware peak."""
    from pumle_spark.tables import table
    from pumle_spark.workload.events import (
        _DAY_US,
        _SESSION_GAP_US,
        sessions_peak_concurrency,
    )

    rows = {r.day_idx: r for r in sessions_peak_concurrency(spark, SF).collect()}

    ev = defaultdict(list)
    for r in (
        table(spark, SF, "events")
        .select("user_id", "event_id", F.unix_micros("ts").alias("us"))
        .collect()
    ):
        ev[r.user_id].append((r.us, r.event_id))
    intervals = []
    for u, ts in ev.items():
        ts.sort()
        start = prev = ts[0][0]
        for us, _ in ts[1:]:
            if us - prev > _SESSION_GAP_US:
                intervals.append((start, prev))
                start = us
            prev = us
        intervals.append((start, prev))

    deltas = [(s, 1) for s, _ in intervals] + [(e, -1) for _, e in intervals]
    # +1 before -1 at the same microsecond (inclusive session end)
    deltas.sort(key=lambda t: (t[0], -t[1]))
    level = 0
    day_stats = {}
    for us, d in deltas:
        day = us // _DAY_US
        if day not in day_stats:
            # carry-in level is itself a level held during the day
            day_stats[day] = {"starts": 0, "ends": 0, "peak": level}
        level += d
        st = day_stats[day]
        st["starts"] += d == 1
        st["ends"] += d == -1
        st["peak"] = max(st["peak"], level)
        st["eod"] = level

    assert set(rows) == set(day_stats)
    for day, st in day_stats.items():
        r = rows[day]
        assert (r.n_starts, r.n_ends) == (st["starts"], st["ends"])
        assert r.peak_concurrent == st["peak"], day
        assert r.eod_level == st["eod"]
    assert rows[max(rows)].eod_level == 0  # every session eventually closes


# --------------------------------------------------------------------------
# audit_duplicate_payments
# --------------------------------------------------------------------------


def test_duplicate_payments_match_bruteforce(spark):
    """The pair list must equal a Python scan over per-customer order
    pairs with the integer band predicates."""
    from pumle_spark.tables import table
    from pumle_spark.workload.analytics import (
        _DUP_REL_PCT,
        _DUP_TOP,
        _DUP_WINDOW_DAYS,
        audit_duplicate_payments,
    )

    got = [tuple(r) for r in audit_duplicate_payments(spark, SF).collect()]

    by_cust = defaultdict(list)
    for r in (
        table(spark, SF, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            F.datediff("o_orderdate", F.lit("1970-01-01")).alias("day"),
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        )
        .collect()
    ):
        by_cust[r.o_custkey].append((r.o_orderkey, r.day, r.cents))

    want = []
    for ck, orders in by_cust.items():
        for i, (ok_a, d_a, c_a) in enumerate(orders):
            for ok_b, d_b, c_b in orders:
                if ok_b <= ok_a:
                    continue
                if abs(d_b - d_a) > _DUP_WINDOW_DAYS:
                    continue
                if abs(c_a - c_b) * 100 > min(c_a, c_b) * _DUP_REL_PCT:
                    continue
                want.append((ck, ok_a, ok_b, d_b - d_a, c_a, c_b, abs(c_a - c_b)))
    want.sort(key=lambda t: (t[6], t[0], t[1], t[2]))
    assert got == want[:_DUP_TOP]


# --------------------------------------------------------------------------
# privacy_l_diversity
# --------------------------------------------------------------------------


def test_l_diversity_matches_bruteforce(spark):
    """Class diversity counts must equal a Python replay over the QI
    classes, and risk must be non-increasing in decreasing l."""
    from pumle_spark.tables import table
    from pumle_spark.workload.experiments import _LDIV_LS, privacy_l_diversity

    rows = {r.l: r for r in privacy_l_diversity(spark, SF).collect()}

    classes = defaultdict(lambda: [0, set()])
    for r in table(spark, SF, "customer").select(
        "c_nationkey", "c_acctbal", "c_mktsegment"
    ).collect():
        # Spark div / DuckDB // truncate toward zero (also on negatives)
        cents = round(r.c_acctbal * 100)
        band = cents // 100000 if cents >= 0 else -(-cents // 100000)
        cl = classes[(r.c_nationkey, band)]
        cl[0] += 1
        cl[1].add(r.c_mktsegment)

    n_rows = sum(c[0] for c in classes.values())
    assert set(rows) == set(_LDIV_LS)
    for l in _LDIV_LS:
        below = [c for c in classes.values() if len(c[1]) < l]
        r = rows[l]
        assert r.n_classes == len(classes)
        assert r.n_classes_below == len(below)
        assert r.rows_at_risk == sum(c[0] for c in below)
        assert r.risk_ppm == sum(c[0] for c in below) * 1_000_000 // n_rows
    ls = sorted(_LDIV_LS)
    assert all(rows[a].risk_ppm <= rows[b].risk_ppm for a, b in zip(ls, ls[1:]))


# --------------------------------------------------------------------------
# anova_twoway_cells
# --------------------------------------------------------------------------


def test_anova_cells_match_bruteforce(spark):
    """Cell effects must equal a Python replay, and the additive
    identity cell = grand + a + b + interaction must hold pre-rounding."""
    import math

    from pumle_spark.tables import table
    from pumle_spark.workload.analytics import anova_twoway_cells

    def _r2(x: float) -> float:  # engines round half AWAY from zero
        return math.copysign(math.floor(abs(x) * 100 + 0.5), x) / 100

    got = {(r.prio, r.yr): r for r in anova_twoway_cells(spark, SF).collect()}

    cn = Counter()
    cs = Counter()
    for r in (
        table(spark, SF, "orders")
        .select(
            F.col("o_orderpriority").alias("p"),
            F.year("o_orderdate").alias("y"),
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("c"),
        )
        .collect()
    ):
        cn[(r.p, r.y)] += 1
        cs[(r.p, r.y)] += r.c

    an = Counter()
    asum = Counter()
    bn = Counter()
    bsum = Counter()
    for (p, y), n in cn.items():
        an[p] += n
        asum[p] += cs[(p, y)]
        bn[y] += n
        bsum[y] += cs[(p, y)]
    ng = sum(cn.values())
    sg = sum(cs.values())

    assert set(got) == set(cn)
    for (p, y), n in cn.items():
        r = got[(p, y)]
        cell = cs[(p, y)] / n
        ea = asum[p] / an[p] - sg / ng
        eb = bsum[y] / bn[y] - sg / ng
        inter = cell - asum[p] / an[p] - bsum[y] / bn[y] + sg / ng
        assert r.n_orders == n
        assert abs(r.cell_mean_c - _r2(cell)) < 1e-9
        assert abs(r.effect_prio_c - _r2(ea)) < 1e-9
        assert abs(r.effect_year_c - _r2(eb)) < 1e-9
        assert abs(r.interaction_c - _r2(inter)) < 1e-9
        # additive identity before rounding
        assert abs((sg / ng + ea + eb + inter) - cell) < 1e-6
