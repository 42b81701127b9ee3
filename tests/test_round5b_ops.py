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

    def weight(k, b):
        u = int(hashlib.md5(f"boot|{k}|{b}".encode()).hexdigest()[:12], 16)
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
