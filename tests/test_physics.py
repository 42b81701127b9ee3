"""F7/F8/F10/F11/F14 physical property expressions (co2lab3DPUMLE.m:334-402)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from pumle_spark.functions.physics import (
    GRAVITY,
    brine_density,
    capillary_pressure,
    hydrostatic_pressure,
    krw_scaled,
    mpa_to_pa,
    nacl_molality,
    water_viscosity,
    years_to_seconds,
)


def reference_brine_density(T, P_mpa, X, rho_h2o):
    """Stock-Python transcription of co2lab3DPUMLE.m:334-342 (the oracle)."""
    import math

    m0, m1, m2, m3, m4, m5 = 58443, 23.772, 0.018639, -1.9687e-6, -1.5259e-5, 5.5058e-8
    rho_nacl_0 = m0 / (m1 + m2 * T + m3 * T**2)
    c_nacl = m4 + m5 * T
    p_b = 10 * P_mpa
    rho_nacl = rho_nacl_0 / (1 - 0.1 * math.log(1 + 10 * p_b * c_nacl))
    return rho_h2o * (1 - X) + rho_nacl * X


def test_brine_density_matches_reference_formula(spark):
    cases = [(95.15, 35.0, 0.1, 1000.0), (60.0, 20.0, 0.05, 1020.0), (120.0, 50.0, 0.2, 980.0)]
    df = spark.createDataFrame(
        cases, "temp_c double, press_mpa double, x_nacl double, rho_h2o double"
    )
    got = [
        r.rho
        for r in df.select(
            brine_density(F.col("temp_c"), F.col("press_mpa"), F.col("x_nacl"), F.col("rho_h2o")).alias("rho")
        ).collect()
    ]
    for (t, p, x, rw), g in zip(cases, got):
        assert g == pytest.approx(reference_brine_density(t, p, x, rw), rel=1e-12)
        assert 900 < g < 1400


def test_brine_density_monotonic_in_salinity(spark):
    two = spark.createDataFrame(
        [(95.15, 35.0, 0.05, 1000.0), (95.15, 35.0, 0.15, 1000.0)],
        "temp_c double, press_mpa double, x_nacl double, rho_h2o double",
    )
    lo, hi = [
        r.rho
        for r in two.select(
            brine_density(F.col("temp_c"), F.col("press_mpa"), F.col("x_nacl"), F.col("rho_h2o")).alias("rho")
        ).collect()
    ]
    assert hi > lo  # more salt → denser


def test_water_viscosity_decreases_with_temperature(spark):
    df = spark.createDataFrame([(293.15, 1.0), (353.15, 1.0)], "t_k double, rho double")
    v20, v80 = [r.mu for r in df.select(water_viscosity(F.col("t_k"), F.col("rho")).alias("mu")).collect()]
    assert v20 > v80  # hot water flows easier
    assert 1e-4 < v20 < 5e-3  # ~1 mPa·s at 20°C order of magnitude


def test_molality_conversion(spark):
    df = spark.createDataFrame([(0.1,)], "x double")
    m = df.select(nacl_molality(F.col("x")).alias("m")).collect()[0].m
    # NaCl_mm = 58.44/1000, moly = X/(mm*(1-X)) — co2lab3DPUMLE.m:346-347
    assert m == pytest.approx(0.1 / (58.44e-3 * 0.9), rel=1e-12)


def test_krw_scaling_floors_at_zero(spark):
    df = spark.createDataFrame([(0.05, 0.11), (0.5, 0.11), (1.0, 0.11)], "s double, srw double")
    vals = [r.k for r in df.select(krw_scaled(F.col("s"), F.col("srw")).alias("k")).collect()]
    assert vals[0] == 0.0  # below residual → clamped (m:387-390)
    assert vals[1] == pytest.approx((0.5 - 0.11) / 0.89)
    assert vals[2] == pytest.approx(1.0)


def test_capillary_pressure_monotone_decreasing_with_sw(spark):
    df = spark.createDataFrame([(0.25, 5000.0), (1.0, 5000.0), (0.0, 5000.0)], "sw double, pe double")
    v = [r.pc for r in df.select(capillary_pressure(F.col("sw"), F.col("pe")).alias("pc")).collect()]
    assert v[0] == pytest.approx(5000.0 * 0.25**-0.5)  # pe·s^(-1/2)
    assert v[1] == pytest.approx(5000.0)
    # eps_sat=1e-6 floor (co2lab3DPUMLE.m:393): s=0 → pe·(1e-6)^(-1/2) = pe·1e3
    assert v[2] == pytest.approx(5000.0 * 1e3)
    assert v[2] > v[0] > v[1]


def test_hydrostatic_and_units(spark):
    df = spark.createDataFrame([(1000.0, 1000.0)], "z double, rho double")
    p = df.select(hydrostatic_pressure(F.col("z"), F.col("rho")).alias("p")).collect()[0].p
    assert p == pytest.approx(1000.0 * GRAVITY * 1000.0)
    u = spark.createDataFrame([(35.0, 1.0)], "mpa double, yr double")
    row = u.select(
        mpa_to_pa(F.col("mpa")).alias("pa"), years_to_seconds(F.col("yr")).alias("s")
    ).collect()[0]
    assert row.pa == 35.0e6 and row.s == pytest.approx(365.2425 * 86400)
