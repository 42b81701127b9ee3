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


# --------------------------------------------------------------------------
# events_funnel_latency
# --------------------------------------------------------------------------


def test_funnel_latency_matches_bruteforce(spark):
    """Stage latencies must equal a Python replay of the strict funnel,
    with discrete order-statistic percentiles."""
    from pumle_spark.tables import table
    from pumle_spark.workload.events import events_funnel_latency

    rows = {r.stage: r for r in events_funnel_latency(spark, SF).collect()}

    ev = (
        table(spark, SF, "events")
        .select("user_id", "event_type", F.unix_micros("ts").alias("us"))
        .collect()
    )
    by_user = defaultdict(list)
    for r in ev:
        by_user[r.user_id].append((r.us, r.event_type))
    lats = defaultdict(list)
    for u, es in by_user.items():
        views = [t for t, k in es if k == "view"]
        if not views:
            continue
        tv = min(views)
        clicks = [t for t, k in es if k == "click" and t > tv]
        if not clicks:
            continue
        tc = min(clicks)
        lats["view_to_click"].append(tc - tv)
        buys = [t for t, k in es if k == "purchase" and t > tc]
        if not buys:
            continue
        tb = min(buys)
        lats["click_to_purchase"].append(tb - tc)
        lats["view_to_purchase"].append(tb - tv)

    assert set(rows) == set(lats)
    for stage, xs in lats.items():
        xs.sort()
        n = len(xs)
        r = rows[stage]
        assert r.n_users == n
        assert r.mean_floor_s == sum(xs) // (n * 1_000_000)
        assert r.p50_s == xs[math.ceil(0.5 * n) - 1] // 1_000_000
        assert r.p90_s == xs[math.ceil(0.9 * n) - 1] // 1_000_000
        assert r.p50_s <= r.p90_s


# --------------------------------------------------------------------------
# orders_price_elasticity
# --------------------------------------------------------------------------


def test_price_elasticity_matches_bruteforce(spark):
    """Per-brand OLS slope must equal a Python replay of the
    micro-quantized log-log regression."""
    from pumle_spark.tables import table
    from pumle_spark.workload.analytics import orders_price_elasticity

    rows = {r.brand: r for r in orders_price_elasticity(spark, SF).collect()}

    qty = defaultdict(int)
    for r in table(spark, SF, "lineitem").select("l_partkey", "l_quantity").collect():
        qty[r.l_partkey] += int(r.l_quantity)
    pts = defaultdict(list)
    for r in table(spark, SF, "part").select("p_partkey", "p_brand", "p_retailprice").collect():
        if qty.get(r.p_partkey, 0) > 0:
            x = round(math.log(r.p_retailprice) * 1_000_000)
            y = round(math.log(float(qty[r.p_partkey])) * 1_000_000)
            pts[r.p_brand].append((x, y))

    assert set(rows) == set(pts)
    for b, xy in pts.items():
        n = len(xy)
        sx = sum(x for x, _ in xy)
        sy = sum(y for _, y in xy)
        sxy = sum(x * y for x, y in xy)
        sxx = sum(x * x for x, _ in xy)
        den = n * float(sxx) - float(sx) * sx
        r = rows[b]
        assert r.n_parts == n
        if den == 0:
            assert r.elasticity_r6 is None
        else:
            want = round((n * float(sxy) - float(sx) * sy) / den, 6)
            assert abs(r.elasticity_r6 - want) < 1e-12


# --------------------------------------------------------------------------
# layout_zonemap_skipping
# --------------------------------------------------------------------------


def test_zonemap_skipping_matches_bruteforce(spark):
    """Chunk stats and skip counts must equal a Python replay of both
    layouts, and the value-sorted layout must never scan more rows."""
    from pumle_spark.tables import table
    from pumle_spark.workload.layout import _ZM_CHUNKS, _ZM_THRESH_C, layout_zonemap_skipping

    got = {(r.layout, r.threshold_c): r for r in layout_zonemap_skipping(spark, SF).collect()}

    rows = [
        (round(r.o_totalprice * 100), r.mon, r.o_orderkey)
        for r in table(spark, SF, "orders")
        .select("o_totalprice", F.date_trunc("month", "o_orderdate").alias("mon"), "o_orderkey")
        .collect()
    ]
    # time layout: chunk = dense month index
    months = sorted({m for _, m, _ in rows})
    midx = {m: i + 1 for i, m in enumerate(months)}
    chunks = {"time": defaultdict(list), "sorted": defaultdict(list)}
    for c, m, _ in rows:
        chunks["time"][midx[m]].append(c)
    # sorted layout: NTILE over (cents, orderkey)
    srt = sorted(rows, key=lambda t: (t[0], t[2]))
    n = len(srt)
    base, extra = divmod(n, _ZM_CHUNKS)
    pos = 0
    for i in range(1, _ZM_CHUNKS + 1):
        size = base + (1 if i <= extra else 0)
        for c, _, _ in srt[pos : pos + size]:
            chunks["sorted"][i].append(c)
        pos += size

    for layout, by_chunk in chunks.items():
        for t in _ZM_THRESH_C:
            n_skipped = sum(1 for cs in by_chunk.values() if max(cs) <= t)
            scanned = sum(len(cs) for cs in by_chunk.values() if max(cs) > t)
            matched = sum(1 for c, _, _ in rows if c > t)
            r = got[(layout, t)]
            assert r.n_chunks == len(by_chunk)
            assert r.n_skipped == n_skipped
            assert r.rows_scanned == scanned
            assert r.rows_matched == matched
    for t in _ZM_THRESH_C:
        # the invariant the op exists to demonstrate
        assert got[("sorted", t)].rows_scanned <= got[("time", t)].rows_scanned
        assert got[("sorted", t)].rows_matched == got[("time", t)].rows_matched


# --------------------------------------------------------------------------
# split_leakage_neardup
# --------------------------------------------------------------------------


def test_split_leakage_matches_bruteforce(spark):
    """Leakage counts must equal a Python replay of winnow fingerprints,
    the stop-fp cap, and the md5 split assignment."""
    import hashlib

    from pumle_spark.tables import table
    from pumle_spark.workload.curation import (
        _LEAK_GRAM,
        _LEAK_MAXDF,
        _LEAK_MIN,
        _LEAK_WINNOW,
        split_leakage_neardup,
    )

    got = {r.split: r for r in split_leakage_neardup(spark, SF).collect()}

    docs = table(spark, SF, "documents").select("doc_id", "text").collect()
    split = {}
    for r in docs:
        b = int(hashlib.md5(f"split|{r.doc_id}".encode()).hexdigest()[:4], 16) % 100
        split[r.doc_id] = "train" if b < 80 else "val" if b < 90 else "test"

    fps = {}
    for r in docs:
        norm = " ".join(_tokens(r.text))
        hs = [
            hashlib.md5(norm[p : p + _LEAK_GRAM].encode()).hexdigest()[:8]
            for p in range(0, max(0, len(norm) - _LEAK_GRAM + 1))
        ]
        fps[r.doc_id] = {
            min(hs[p : p + _LEAK_WINNOW]) for p in range(len(hs))
        } if hs else set()

    df = Counter(fp for s in fps.values() for fp in s)
    keep = {fp for fp, c in df.items() if c <= _LEAK_MAXDF}
    fps = {d: s & keep for d, s in fps.items()}

    train = {d: s for d, s in fps.items() if split[d] == "train"}
    want = {"val": [0, 0], "test": [0, 0]}  # n_leaked, n_pairs
    ndocs = Counter(s for s in split.values() if s != "train")
    for d, s in fps.items():
        if split[d] == "train":
            continue
        partners = sum(1 for td, ts in train.items() if len(s & ts) >= _LEAK_MIN)
        if partners:
            want[split[d]][0] += 1
            want[split[d]][1] += partners

    assert set(got) == {"val", "test"}
    for sp in ("val", "test"):
        r = got[sp]
        assert r.n_docs == ndocs[sp]
        assert (r.n_leaked, r.n_pairs) == tuple(want[sp])
        assert r.leak_ppm == want[sp][0] * 1_000_000 // ndocs[sp]
