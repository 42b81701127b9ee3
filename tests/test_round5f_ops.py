"""Round-5 wave-F tests: Wilson CI, supplier scorecard, and the
conformed activity timeline vs brute-force Python oracles at sf0.001."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


# --------------------------------------------------------------------------
# returns_wilson_ci
# --------------------------------------------------------------------------


def test_wilson_ci_matches_closed_form(spark):
    """Bounds must equal the textbook Wilson formula, bracket p_hat, and
    stay inside [0, 1]."""
    from pumle_spark.tables import table
    from pumle_spark.workload.analytics import _WILSON_Z2, returns_wilson_ci

    rows = {r.brand: r for r in returns_wilson_ci(spark, SF).collect()}

    part = {
        r.p_partkey: r.p_brand for r in table(spark, SF, "part").collect()
    }
    n = Counter()
    ret = Counter()
    for r in table(spark, SF, "lineitem").select("l_partkey", "l_returnflag").collect():
        b = part[r.l_partkey]
        n[b] += 1
        ret[b] += r.l_returnflag == "R"

    assert set(rows) == set(n)
    for b in n:
        p = ret[b] / n[b]
        z2 = _WILSON_Z2
        center = p + z2 / (2 * n[b])
        half = math.sqrt(z2) * math.sqrt(p * (1 - p) / n[b] + z2 / (4 * n[b] * n[b]))
        denom = 1 + z2 / n[b]
        r = rows[b]
        assert r.n == n[b] and r.r == ret[b]
        assert abs(r.p_hat - round(p, 6)) < 1e-12
        assert abs(r.ci_lo - round((center - half) / denom, 6)) < 1e-12
        assert abs(r.ci_hi - round((center + half) / denom, 6)) < 1e-12
        assert 0.0 <= r.ci_lo <= r.p_hat <= r.ci_hi <= 1.0


# --------------------------------------------------------------------------
# supplier_scorecard
# --------------------------------------------------------------------------


def test_scorecard_matches_bruteforce(spark):
    """Composite scores and ranks must equal a Python replay of the
    integer min-max normalization."""
    from pumle_spark.tables import table
    from pumle_spark.workload.analytics import (
        _SCORE_TOP,
        _SCORE_W_CNT,
        _SCORE_W_LAG,
        _SCORE_W_REV,
        supplier_scorecard,
    )

    got = [tuple(r) for r in supplier_scorecard(spark, SF).collect()]

    odate = {r.o_orderkey: r.o_orderdate for r in table(spark, SF, "orders").collect()}
    m = defaultdict(lambda: [0, 0, 0])  # rev_c, n_li, lag_sum
    for r in (
        table(spark, SF, "lineitem")
        .select(
            "l_suppkey",
            "l_orderkey",
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
            .cast("bigint")
            .alias("rev_c"),
            F.col("l_shipdate").cast("date").alias("ship"),
        )
        .collect()
    ):
        acc = m[r.l_suppkey]
        acc[0] += r.rev_c
        acc[1] += 1
        acc[2] += (r.ship - odate[r.l_orderkey].date()).days

    rows = {
        k: (rev, nli, lag * 1000 // nli) for k, (rev, nli, lag) in m.items()
    }
    lims = {
        "rev": (min(v[0] for v in rows.values()), max(v[0] for v in rows.values())),
        "cnt": (min(v[1] for v in rows.values()), max(v[1] for v in rows.values())),
        "lag": (min(v[2] for v in rows.values()), max(v[2] for v in rows.values())),
    }

    def norm(x, lo, hi):
        return 1_000_000 if hi == lo else (x - lo) * 1_000_000 // (hi - lo)

    scored = []
    for k, (rev, nli, lagm) in rows.items():
        comp = (
            _SCORE_W_REV * norm(rev, *lims["rev"])
            + _SCORE_W_CNT * norm(nli, *lims["cnt"])
            + _SCORE_W_LAG * (1_000_000 - norm(lagm, *lims["lag"]))
        ) // 100
        scored.append((k, rev, nli, lagm, comp))
    scored.sort(key=lambda t: (-t[4], t[0]))
    want = [t + (i + 1,) for i, t in enumerate(scored[:_SCORE_TOP])]
    assert got == want


# --------------------------------------------------------------------------
# activity_timeline_union
# --------------------------------------------------------------------------


def test_activity_timeline_matches_bruteforce(spark):
    """Monthly rollups must equal a Python replay over both branches,
    and totals must reconcile with the source tables."""
    from pumle_spark.tables import table
    from pumle_spark.workload.relational3 import activity_timeline_union

    got = {(str(r.mon), r.kind): r for r in activity_timeline_union(spark, SF).collect()}

    acts = defaultdict(lambda: [0, set(), 0])
    n_orders = 0
    for r in table(spark, SF, "orders").select(
        F.date_trunc("month", "o_orderdate").alias("m"), "o_custkey",
        F.round(F.col("o_totalprice") * 1_000_000).cast("bigint").alias("v"),
    ).collect():
        key = (str(r.m.date()), "order")
        acts[key][0] += 1
        acts[key][1].add(r.o_custkey)
        acts[key][2] += r.v
        n_orders += 1
    n_events = 0
    for r in table(spark, SF, "events").select(
        F.date_trunc("month", "ts").alias("m"), "event_type", "user_id",
        F.round(F.col("value") * 1_000_000).cast("bigint").alias("v"),
    ).collect():
        key = (str(r.m.date()), r.event_type)
        acts[key][0] += 1
        acts[key][1].add(r.user_id)
        acts[key][2] += r.v
        n_events += 1

    assert set(got) == set(acts)
    for key, (n, actors, v) in acts.items():
        r = got[key]
        assert (r.n_acts, r.n_actors, r.value_micro) == (n, len(actors), v)
    assert sum(r.n_acts for r in got.values()) == n_orders + n_events
