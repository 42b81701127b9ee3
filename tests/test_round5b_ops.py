"""Round-5 continuation tests: experimentation & privacy operators
(SRM chi-square, CUPED, Poisson bootstrap, k-anonymity) vs brute-force
Python oracles at sf0.001."""

from __future__ import annotations

import hashlib
import math

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


def _bucket(salt: str, key, mod: int = 100) -> int:
    return int(hashlib.md5(f"{salt}|{key}".encode()).hexdigest()[:4], 16) % mod


# --------------------------------------------------------------------------
# abtest_srm_check
# --------------------------------------------------------------------------


def test_srm_matches_bruteforce_chi_square(spark):
    """Arm counts must equal a Python replay of the md5 assignment, and the
    chi-square must match the textbook float formula to 1e-6."""
    from pumle_spark.tables import table
    from pumle_spark.workload.experiments import abtest_srm_check

    rows = {r.arm: r for r in abtest_srm_check(spark, SF).collect()}
    keys = [r.c_custkey for r in table(spark, SF, "customer").select("c_custkey").collect()]

    want = {"control": 0, "variant_a": 0, "variant_b": 0}
    for k in keys:
        b = _bucket("srm", k)
        want["control" if b < 50 else "variant_a" if b < 80 else "variant_b"] += 1

    n = len(keys)
    weights = {"control": 50, "variant_a": 30, "variant_b": 20}
    chi2 = sum((want[a] - n * w / 100) ** 2 / (n * w / 100) for a, w in weights.items())

    assert {a: r.n_units for a, r in rows.items()} == want
    for a, r in rows.items():
        assert abs(r.expected_units - n * weights[a] / 100) < 1e-6
        assert abs(r.chi2_total - chi2) < 1e-6
        assert r.srm_flag == (chi2 > 5.991464547107979)
    # hash assignment should be nowhere near an SRM at these sizes
    assert not rows["control"].srm_flag


# --------------------------------------------------------------------------
# abtest_cuped_adjusted
# --------------------------------------------------------------------------


def test_cuped_matches_numpy_theta_and_conserves_mean(spark):
    """θ must equal cov(X,Y)/var(X) from a per-customer pandas replay, and
    the unit-weighted mean of the adjusted arm means must equal the raw
    global mean of Y (the CUPED corrections cancel by construction)."""
    import numpy as np

    from pumle_spark.tables import table
    from pumle_spark.workload.experiments import _CUPED_SPLIT, abtest_cuped_adjusted

    rows = {r.arm: r for r in abtest_cuped_adjusted(spark, SF).collect()}

    o = table(spark, SF, "orders").select(
        "o_custkey",
        F.col("o_orderdate").cast("date").alias("d"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    ).toPandas()
    import datetime

    split = datetime.date.fromisoformat(_CUPED_SPLIT)
    o["x"] = o.cents.where(o.d < split, 0)
    o["y"] = o.cents.where(o.d >= split, 0)
    per = o.groupby("o_custkey")[["x", "y"]].sum()
    x, y = per.x.to_numpy(float), per.y.to_numpy(float)
    n = len(per)
    theta = ((n * (x * y).sum() - x.sum() * y.sum())) / (n * (x * x).sum() - x.sum() ** 2)

    assert abs(rows["control"].theta - theta) < 1e-6

    arms = np.array(["control" if _bucket("cuped", k) < 50 else "treatment" for k in per.index])
    for a in ("control", "treatment"):
        m = arms == a
        assert rows[a].n_units == int(m.sum())
        want_adj = y[m].mean() - theta * (x[m].mean() - x.mean())
        assert abs(rows[a].mean_y_cuped_cents - want_adj) < 0.02

    # conservation: Σ n_a · adjusted_a == Σ y (to rounding of the 2dp means)
    total_adj = sum(rows[a].n_units * rows[a].mean_y_cuped_cents for a in rows)
    assert abs(total_adj - y.sum()) < 0.01 * n


# --------------------------------------------------------------------------
# stats_bootstrap_ci
# --------------------------------------------------------------------------


def test_bootstrap_ci_matches_python_replay(spark):
    """Replicate weights, two replicate means, and the rank-selected CI
    bounds must match an exact Python replay of the md5-threshold draw."""
    from pumle_spark.tables import table
    from pumle_spark.workload.experiments import _BOOT_B, _BOOT_HI, _BOOT_LO, _POIS_T, stats_bootstrap_ci

    row = stats_bootstrap_ci(spark, SF).collect()[0]

    o = table(spark, SF, "orders").select("o_orderkey", F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents")).collect()
    cents = {r.o_orderkey: r.cents for r in o}

    from pumle_spark.workload.experiments import _BOOT_SLICES

    def weight(k, b):
        d, j = b // _BOOT_SLICES, b % _BOOT_SLICES
        dg = hashlib.md5(f"boot|{k}|{d}".encode()).hexdigest()
        u = int(dg[8 * j : 8 * j + 8], 16)
        for w, t in enumerate(_POIS_T):
            if u < t:
                return w
        return 6

    means = []
    for b in range(_BOOT_B):
        sw = sx = 0
        for k, c in cents.items():
            w = weight(k, b)
            sw += w
            sx += w * c
        means.append((sx / sw, b))
    means.sort()

    assert row.n_resamples == _BOOT_B
    assert row.n_rows == len(cents)
    assert abs(row.mean_obs_cents - sum(cents.values()) / len(cents)) < 0.01
    assert abs(row.ci_lo_cents - means[_BOOT_LO - 1][0]) < 0.01
    assert abs(row.ci_hi_cents - means[_BOOT_HI - 1][0]) < 0.01
    assert row.ci_lo_cents < row.mean_obs_cents < row.ci_hi_cents
    # a 95% CI of the mean of ~1.5k draws should be a few percent wide, not 0
    assert 0 < (row.ci_hi_cents - row.ci_lo_cents) / row.mean_obs_cents < 0.2

    # Poisson(1) sanity on the drawn weights: mean ≈ 1
    tot = sum(weight(k, 0) for k in cents)
    assert abs(tot / len(cents) - 1.0) < 0.2


# --------------------------------------------------------------------------
# privacy_k_anonymity
# --------------------------------------------------------------------------


def test_k_anonymity_matches_bruteforce_classes(spark):
    """Class counts and at-risk rows must equal a pandas groupby replay,
    and risk must be monotone non-decreasing in k."""
    from pumle_spark.tables import table
    from pumle_spark.workload.experiments import privacy_k_anonymity

    rows = sorted(privacy_k_anonymity(spark, SF).collect(), key=lambda r: r.k)

    c = table(spark, SF, "customer").select("c_nationkey", "c_mktsegment", "c_acctbal").toPandas()
    # truncating division toward zero (Spark div semantics), not floor
    cents = (c.c_acctbal * 100).round().astype("int64")
    c["band"] = (cents.abs() // 100000) * cents.apply(lambda v: -1 if v < 0 else 1)
    sizes = c.groupby(["c_nationkey", "c_mktsegment", "band"]).size()
    n_rows, n_classes = int(sizes.sum()), len(sizes)

    for r in rows:
        below = sizes[sizes < r.k]
        assert r.n_classes == n_classes
        assert r.n_classes_below == len(below)
        assert r.rows_at_risk == int(below.sum())
        assert r.risk_ppm == int(below.sum()) * 1000000 // n_rows

    risks = [r.rows_at_risk for r in rows]
    assert risks == sorted(risks)
    assert rows[0].n_classes > 25  # QI space actually fans out


# --------------------------------------------------------------------------
# graph_link_prediction
# --------------------------------------------------------------------------


def test_link_prediction_matches_bruteforce(spark):
    """CN / RA / Jaccard scores over the sparsified co-occurrence graph
    must equal a naive Python enumeration (adjacency dicts, numpy
    quantile threshold)."""
    import numpy as np
    from collections import Counter, defaultdict

    from pumle_spark.tables import table
    from pumle_spark.workload.graph import (
        _LP_RA_SCALE,
        _LP_TOP,
        graph_link_prediction,
    )

    got = [tuple(r) for r in graph_link_prediction(spark, SF).collect()]

    orders = defaultdict(set)
    for r in table(spark, SF, "lineitem").select("l_orderkey", "l_suppkey").collect():
        orders[r.l_orderkey].add(r.l_suppkey)
    pc = Counter()
    for ss in orders.values():
        ss = sorted(ss)
        for i, a in enumerate(ss):
            for b in ss[i + 1 :]:
                pc[(a, b)] += 1
    t = np.quantile(np.array(list(pc.values()), dtype=float), 0.9)
    edges = {p for p, c in pc.items() if c > t}
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    cn, ra = Counter(), Counter()
    for z, ns in adj.items():
        ns = sorted(ns)
        for i, u in enumerate(ns):
            for v in ns[i + 1 :]:
                cn[(u, v)] += 1
                ra[(u, v)] += _LP_RA_SCALE // len(adj[z])
    want = sorted(
        (
            (
                u,
                v,
                cn[(u, v)],
                ra[(u, v)],
                1_000_000 * cn[(u, v)] // (len(adj[u]) + len(adj[v]) - cn[(u, v)]),
            )
            for (u, v) in cn
            if (u, v) not in edges
        ),
        key=lambda r: (-r[2], -r[3], r[0], r[1]),
    )[:_LP_TOP]
    assert got == want


# --------------------------------------------------------------------------
# text_bpe_pair_stats
# --------------------------------------------------------------------------


def test_bpe_pair_stats_matches_bruteforce(spark):
    """Top merge candidates must equal a Python pair count over the
    engine's own tokenization."""
    from collections import Counter

    from pumle_spark.operators.dedup import normalize_text
    from pumle_spark.tables import table
    from pumle_spark.workload.text import _BPE_TOP, text_bpe_pair_stats

    got = [tuple(r) for r in text_bpe_pair_stats(spark, SF).collect()]

    wf = Counter()
    for r in (
        table(spark, SF, "documents").select(normalize_text("text").alias("ws")).collect()
    ):
        wf.update(r.ws)
    pt = Counter()
    for w, f in wf.items():
        for i in range(len(w) - 1):
            pt[(w[i], w[i + 1])] += f
    total = sum(pt.values())
    ranked = sorted(pt.items(), key=lambda kv: (-kv[1], kv[0]))[:_BPE_TOP]
    want = [
        (a, b, c, 1_000_000 * c // total, i)
        for i, ((a, b), c) in enumerate(ranked, 1)
    ]
    assert got == want


# --------------------------------------------------------------------------
# text_bigram_perplexity
# --------------------------------------------------------------------------


def test_bigram_perplexity_matches_bruteforce(spark):
    """Per-doc add-1 bigram NLL must equal the naive LM replay (same
    micro-nat quantization before summation)."""
    import math
    from collections import Counter

    from pumle_spark.operators.dedup import normalize_text
    from pumle_spark.tables import table
    from pumle_spark.workload.text import _PPL_TOP, text_bigram_perplexity

    got = [tuple(r) for r in text_bigram_perplexity(spark, SF).collect()]

    docs = {
        r.doc_id: r.ws
        for r in table(spark, SF, "documents")
        .select("doc_id", normalize_text("text").alias("ws"))
        .collect()
    }
    c2, c1, vocab = Counter(), Counter(), set()
    for ws in docs.values():
        vocab.update(ws)
        for i in range(len(ws) - 1):
            c2[(ws[i], ws[i + 1])] += 1
            c1[ws[i]] += 1
    v = len(vocab)
    per_doc = []
    for doc_id, ws in docs.items():
        if len(ws) < 2:
            continue
        nll = 0
        for i in range(len(ws) - 1):
            p = (c2[(ws[i], ws[i + 1])] + 1) / (c1[ws[i]] + v)
            nll += int(math.floor(-math.log(p) * 1_000_000 + 0.5))
        per_doc.append((doc_id, len(ws) - 1, nll, nll // (len(ws) - 1)))
    want = sorted(per_doc, key=lambda r: (-r[3], r[0]))[:_PPL_TOP]
    assert got == want


# --------------------------------------------------------------------------
# events_anomaly_mad
# --------------------------------------------------------------------------


def test_anomaly_mad_matches_bruteforce(spark):
    """Robust z-scores must equal the Python median/MAD replay in exact
    doubled-integer arithmetic."""
    import statistics
    from collections import Counter

    from pumle_spark.tables import table
    from pumle_spark.workload.events import _MAD_TOP, _MAD_Z_MILLI, events_anomaly_mad

    got = [tuple(r) for r in events_anomaly_mad(spark, SF).collect()]

    days = Counter(
        r.day
        for r in table(spark, SF, "events")
        .select(F.expr("unix_micros(ts) div 86400000000").alias("day"))
        .collect()
    )
    med2 = int(2 * statistics.median(days.values()))
    dev2 = {d: abs(2 * n - med2) for d, n in days.items()}
    mad4 = int(2 * statistics.median(dev2.values()))
    scored = [
        (
            d,
            n,
            0 if mad4 == 0 else (20_000_000 * dev2[d]) // (14_826 * mad4),
        )
        for d, n in days.items()
    ]
    ranked = sorted(scored, key=lambda r: (-r[2], r[0]))[:_MAD_TOP]
    want = [
        (d, n, z, z > _MAD_Z_MILLI, i) for i, (d, n, z) in enumerate(ranked, 1)
    ]
    assert got == want


# --------------------------------------------------------------------------
# forecast_ewma_revenue
# --------------------------------------------------------------------------


def test_ewma_matches_recurrence_replay(spark):
    """The scaled-prefix-sum EWMA must equal the textbook float recurrence
    S_t = (S_(t-1) + r_t)/2 replayed in Python over the same last-K monthly
    series."""
    from collections import defaultdict

    from pumle_spark.tables import table
    from pumle_spark.workload.analytics import _EWMA_K, forecast_ewma_revenue

    rows = forecast_ewma_revenue(spark, SF).collect()

    monthly = defaultdict(int)
    for r in (
        table(spark, SF, "orders").select("o_orderdate", "o_totalprice").collect()
    ):
        ym = (r.o_orderdate.year, r.o_orderdate.month)
        monthly[ym] += round(r.o_totalprice * 100)
    series = [monthly[k] for k in sorted(monthly)][-_EWMA_K:]

    # engines round half AWAY from zero; Python round() is half-even, so
    # mirror the engine mode (values like x.125 land exactly on the edge)
    def _r2(x: float) -> float:
        return math.copysign(math.floor(abs(x) * 100 + 0.5), x) / 100

    assert [r.rev_cents for r in rows] == series
    s = None
    for r, rev in zip(rows, series):
        s = rev if s is None else (s + rev) / 2
        assert abs(r.ewma_cents - _r2(s)) < 1e-9
        assert abs(r.resid_cents - _r2(rev - s)) < 1e-9


# --------------------------------------------------------------------------
# split_temporal_purged
# --------------------------------------------------------------------------


def test_purged_split_counts_and_disjointness(spark):
    """Fold counts must equal a Python replay; within a fold the
    train/purge/test windows partition the pre-test-end span."""
    from datetime import date

    from pumle_spark.tables import table
    from pumle_spark.workload.sampling import (
        _PURGE_GAP_DAYS,
        _WF_FOLDS,
        split_temporal_purged,
    )

    rows = split_temporal_purged(spark, SF).collect()
    assert [r.fold for r in rows] == list(range(1, _WF_FOLDS + 1))

    days = [
        (r.o_orderdate.date() - date(1970, 1, 1)).days
        for r in table(spark, SF, "orders").select("o_orderdate").collect()
    ]
    dmin, span = min(days), max(days) - min(days) + 1
    for r in rows:
        ts = dmin + (r.fold * span) // 5
        te = dmin + ((r.fold + 1) * span) // 5
        assert (r.test_start_day, r.test_end_day) == (ts, te)
        assert r.n_train == sum(1 for d in days if d < ts - _PURGE_GAP_DAYS)
        assert r.n_purged == sum(1 for d in days if ts - _PURGE_GAP_DAYS <= d < ts)
        assert r.n_test == sum(1 for d in days if ts <= d < te)


# --------------------------------------------------------------------------
# abtest_diff_in_diff
# --------------------------------------------------------------------------


def test_diff_in_diff_matches_bruteforce(spark):
    """Cell sums and the DiD contrast must equal a Python replay of the
    md5 assignment and the four-mean arithmetic."""
    from collections import defaultdict

    from pumle_spark.tables import table
    from pumle_spark.workload.experiments import _CUPED_SPLIT, abtest_diff_in_diff

    rows = {(r.arm, r.period): r for r in abtest_diff_in_diff(spark, SF).collect()}

    split = tuple(int(x) for x in _CUPED_SPLIT.split("-"))
    cells = defaultdict(lambda: [0, 0])
    for r in (
        table(spark, SF, "orders")
        .select("o_custkey", "o_orderdate", "o_totalprice")
        .collect()
    ):
        arm = "control" if _bucket("did", r.o_custkey) < 50 else "treatment"
        d = r.o_orderdate
        period = "pre" if (d.year, d.month, d.day) < split else "post"
        cell = cells[(arm, period)]
        cell[0] += 1
        cell[1] += round(r.o_totalprice * 100)

    m = {k: v[1] / v[0] for k, v in cells.items()}
    did = round(
        (m[("treatment", "post")] - m[("treatment", "pre")])
        - (m[("control", "post")] - m[("control", "pre")]),
        2,
    )
    assert set(rows) == set(cells)
    for k, (n, s) in cells.items():
        assert (rows[k].n_orders, rows[k].sum_cents) == (n, s)
        assert abs(rows[k].mean_cents - round(s / n, 2)) < 1e-9
        assert abs(rows[k].did_cents - did) < 1e-9


# --------------------------------------------------------------------------
# embedding_int8_quantization
# --------------------------------------------------------------------------


def test_int8_quantization_matches_numpy(spark):
    """Per-dim scales, saturation counts, and micro-quantized error sums
    must equal a numpy replay of the symmetric max-abs calibration."""
    import numpy as np

    from pumle_spark.tables import table
    from pumle_spark.workload.similarity import embedding_int8_quantization

    rows = {r.dim: r for r in embedding_int8_quantization(spark, SF).collect()}

    X = np.array(
        [r.embedding for r in table(spark, SF, "embeddings").select("embedding").collect()],
        dtype=np.float64,
    )
    n, dims = X.shape
    assert set(rows) == set(range(1, dims + 1))
    for d in range(dims):
        x = X[:, d]
        m = np.abs(x).max()
        q = np.floor(np.abs(x * 127 / m) + 0.5) * np.sign(x)  # round half away
        err = np.floor(np.abs(x - q * m / 127) * 1e6 + 0.5).astype(int)
        r = rows[d + 1]
        assert abs(r.maxabs_r6 - round(m, 6)) < 1e-9
        assert r.n_values == n
        assert r.n_saturated == int((np.abs(q) == 127).sum())
        assert r.sum_abs_err_micro == int(err.sum())
        assert r.max_err_micro == int(err.max())
        assert np.abs(q).max() <= 127  # symmetric calibration never clips


# --------------------------------------------------------------------------
# events_cohort_value_curve
# --------------------------------------------------------------------------


def test_cohort_value_curve_matches_bruteforce(spark):
    """Cohort sizes, activity, and cumulative LTV must equal a Python
    replay over (user, week, value-micro) rows."""
    from collections import defaultdict

    from pumle_spark.tables import table
    from pumle_spark.workload.events import _LTV_MAX_AGE_WK, events_cohort_value_curve

    rows = [tuple(r) for r in events_cohort_value_curve(spark, SF).collect()]

    ev = (
        table(spark, SF, "events")
        .select(
            "user_id",
            F.expr("unix_micros(ts) div (86400000000 * 7)").alias("wk"),
            F.round(F.col("value") * 1_000_000).cast("bigint").alias("vmicro"),
        )
        .collect()
    )
    first = {}
    for r in ev:
        first[r.user_id] = min(first.get(r.user_id, r.wk), r.wk)
    sz = defaultdict(int)
    for u, cw in first.items():
        sz[cw] += 1
    val = defaultdict(int)
    actives = defaultdict(set)
    for r in ev:
        age = r.wk - first[r.user_id]
        if 0 <= age <= _LTV_MAX_AGE_WK:
            val[(first[r.user_id], age)] += r.vmicro
            actives[(first[r.user_id], age)].add(r.user_id)
    want = []
    for cw in sorted(sz):
        cum = 0
        for age in sorted(a for (c, a) in val if c == cw):
            cum += val[(cw, age)]
            want.append(
                (cw, age, sz[cw], len(actives[(cw, age)]), val[(cw, age)], cum, cum // sz[cw])
            )
    assert rows == want


# --------------------------------------------------------------------------
# text_vocab_coverage
# --------------------------------------------------------------------------


def test_vocab_coverage_matches_bruteforce(spark):
    """Coverage at each K must equal a Python top-K-by-(count,token) scan
    over the engine's own tokenization, and OOV must be non-increasing."""
    from collections import Counter

    from pumle_spark.operators.dedup import normalize_text
    from pumle_spark.tables import table
    from pumle_spark.workload.text import _VOCAB_KS, text_vocab_coverage

    rows = {r.k: r for r in text_vocab_coverage(spark, SF).collect()}

    tf = Counter()
    for r in (
        table(spark, SF, "documents").select(normalize_text("text").alias("ws")).collect()
    ):
        tf.update(r.ws)
    ranked = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))
    n_total = sum(tf.values())
    assert set(rows) == set(_VOCAB_KS)
    for k in _VOCAB_KS:
        covered = sum(c for _, c in ranked[:k])
        r = rows[k]
        assert (r.n_vocab, r.n_total) == (len(tf), n_total)
        assert r.covered_occurrences == covered
        assert r.oov_ppm == (n_total - covered) * 1_000_000 // n_total
    oovs = [rows[k].oov_ppm for k in sorted(rows)]
    assert oovs == sorted(oovs, reverse=True)
