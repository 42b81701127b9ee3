"""Round-5 wave-C tests: price/volume bridge, Gopher rule report,
token JS divergence, and embedding effective dimensionality vs
brute-force Python oracles at sf0.001."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


def _tokens(text: str) -> list[str]:
    import re

    return re.sub(r"[^a-z0-9]+", " ", text.lower()).strip().split(" ")


# --------------------------------------------------------------------------
# revenue_pvm_bridge
# --------------------------------------------------------------------------


def test_pvm_bridge_matches_bruteforce(spark):
    """Per-brand effects must equal a Python replay, and the bridge
    identity price + volume == delta must hold exactly on every row."""
    from pumle_spark.tables import table
    from pumle_spark.workload.analytics import _PVM_Y1, _PVM_Y2, revenue_pvm_bridge

    rows = {r.brand: r for r in revenue_pvm_bridge(spark, SF).collect()}

    part = {
        r.p_partkey: r.p_brand
        for r in table(spark, SF, "part").select("p_partkey", "p_brand").collect()
    }
    acc = defaultdict(lambda: [0, 0, 0, 0])  # rev1, qty1, rev2, qty2
    for r in (
        table(spark, SF, "lineitem")
        .select(
            "l_partkey",
            F.year("l_shipdate").alias("yr"),
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
            .cast("bigint")
            .alias("rev_c"),
            F.col("l_quantity").cast("bigint").alias("qty"),
        )
        .collect()
    ):
        b = part[r.l_partkey]
        if r.yr == _PVM_Y1:
            acc[b][0] += r.rev_c
            acc[b][1] += r.qty
        elif r.yr == _PVM_Y2:
            acc[b][2] += r.rev_c
            acc[b][3] += r.qty

    want = {b: v for b, v in acc.items() if v[1] > 0 and v[3] > 0}
    assert set(rows) == set(want)
    for b, (r1, q1, r2, q2) in want.items():
        r = rows[b]
        assert (r.rev1_c, r.qty1, r.rev2_c, r.qty2) == (r1, q1, r2, q2)
        pe = round(r2 - q2 * r1 / q1)
        assert r.delta_c == r2 - r1
        assert r.price_effect_c == pe
        # the bridge identity holds bit-for-bit by construction
        assert r.price_effect_c + r.volume_effect_c == r.delta_c


# --------------------------------------------------------------------------
# text_gopher_rules
# --------------------------------------------------------------------------


def test_gopher_rules_match_bruteforce(spark):
    """Every rule's per-source failure count must equal a Python replay
    of the integer thresholds over the engine's own tokenization."""
    from pumle_spark.tables import table
    from pumle_spark.workload.text import (
        _GPH_MAX_TOK,
        _GPH_MIN_STOP,
        _GPH_MIN_TOK,
        _STOPWORDS,
        text_gopher_rules,
    )

    got = {(r.source, r.rule): r for r in text_gopher_rules(spark, SF).collect()}

    en = set(_STOPWORDS["en"])
    fails = defaultdict(Counter)
    ndocs = Counter()
    for r in table(spark, SF, "documents").select("source", "text").collect():
        ws = _tokens(r.text)
        n = len(ws)
        sumlen = sum(len(t) for t in ws)
        ndocs[r.source] += 1
        f = fails[r.source]
        f["too_short"] += n < _GPH_MIN_TOK
        f["too_long"] += n > _GPH_MAX_TOK
        f["mean_tok_len"] += 2 * sumlen > 9 * n or sumlen < 3 * n
        f["low_stopword"] += sum(t in en for t in ws) < _GPH_MIN_STOP
        f["digit_heavy"] += 10 * sum(any(c.isdigit() for c in t) for t in ws) > n

    rules = ("too_short", "too_long", "mean_tok_len", "low_stopword", "digit_heavy")
    assert set(got) == {(s, ru) for s in ndocs for ru in rules}
    for (s, ru), r in got.items():
        assert r.n_docs == ndocs[s]
        assert r.n_failed == fails[s][ru], (s, ru)
        assert r.fail_ppm == fails[s][ru] * 1_000_000 // ndocs[s]


# --------------------------------------------------------------------------
# drift_token_js
# --------------------------------------------------------------------------


def test_token_js_matches_bruteforce(spark):
    """JS divergence must equal a Python replay of the micro-quantized
    closed-form-remainder formulation, be non-negative, and be bounded
    by ln 2."""
    from pumle_spark.tables import table
    from pumle_spark.workload.drift import _JS_LN2_MICRO, drift_token_js

    rows = {r.source: r for r in drift_token_js(spark, SF).collect()}

    per_sw = Counter()
    for r in table(spark, SF, "documents").select("source", "text").collect():
        for w in _tokens(r.text):
            per_sw[(r.source, w)] += 1
    cw = Counter()
    ns = Counter()
    for (s, w), a in per_sw.items():
        cw[w] += a
        ns[s] += a
    nt = sum(cw.values())

    assert set(rows) == set(ns)
    for s in ns:
        s1 = s2 = b_sum = types = 0
        for (src, w), a in per_sw.items():
            if src != s:
                continue
            b = cw[w]
            denom = float(a) * nt + float(b) * ns[s]
            s1 += round(a * math.log(2.0 * a * nt / denom) * 1_000_000)
            s2 += round(b * math.log(2.0 * b * ns[s] / denom) * 1_000_000)
            b_sum += b
            types += 1
        js = 0.5 * s1 / (1_000_000.0 * ns[s]) + 0.5 * (
            s2 + _JS_LN2_MICRO * (nt - b_sum)
        ) / (1_000_000.0 * nt)
        r = rows[s]
        assert (r.n_tokens, r.n_types) == (ns[s], types)
        assert abs(r.js_r6 - round(js, 6)) < 1e-12
        assert -1e-6 <= r.js_r6 <= math.log(2) + 1e-6


# --------------------------------------------------------------------------
# embedding_effective_dim
# --------------------------------------------------------------------------


def test_effective_dim_matches_numpy(spark):
    """Per-dim variances, shares, the cumulative spectrum, and the
    participation ratio must equal a numpy replay of the nano-quantized
    pipeline."""
    import numpy as np

    from pumle_spark.tables import table
    from pumle_spark.workload.similarity import embedding_effective_dim

    out = embedding_effective_dim(spark, SF).collect()

    X = np.array(
        [r.embedding for r in table(spark, SF, "embeddings").select("embedding").collect()],
        dtype=np.float64,
    )
    n, dims = X.shape
    var_nano = {}
    for d in range(dims):
        sx = float(X[:, d].sum())
        sxx = float((X[:, d] * X[:, d]).sum())
        raw = (n * sxx - sx * sx) / (n * n)
        var_nano[d + 1] = round(raw * 1e9)
    total = sum(var_nano.values())
    sq = sum(float(v) * float(v) for v in var_nano.values())
    eff = round(float(total) * total / sq, 4)

    order = sorted(var_nano, key=lambda d: (-var_nano[d], d))
    assert [r.dim for r in out] == order
    cum = 0
    by_dim = {r.dim: r for r in out}
    for d in order:
        cum += var_nano[d]
        r = by_dim[d]
        # nano quantization: decimal-sum moments vs float sums can land a
        # hair apart; the quantized integers still must agree exactly here
        assert r.var_nano == var_nano[d]
        assert r.share_ppm == var_nano[d] * 1_000_000 // total
        assert r.cum_share_ppm == cum * 1_000_000 // total
        assert abs(r.effective_dim - eff) < 1e-9
    assert out[-1].cum_share_ppm == 1_000_000
    assert 1.0 <= out[0].effective_dim <= dims
