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


@pytest.fixture(scope="module")
def conditions(spark):
    # reservoir-ish conditions: T=95.15°C, P=35 MPa, XNaCl=0.1, rho_h2o=1000
    return spark.createDataFrame(
        [(95.15, 35.0e6, 0.1, 1000.0)],
        "temp_c double, press_pa double, x_nacl double, rho_h2o double",
    )


def test_brine_density_plausible_and_monotonic_in_salinity(spark, conditions):
    row = conditions.select(
        brine_density(F.col("temp_c"), F.col("press_pa"), F.col("x_nacl"), F.col("rho_h2o")).alias("rho")
    ).collect()[0]
    assert 900 < row.rho < 1400  # brine denser than fresh water, sane bounds

    two = spark.createDataFrame(
        [(95.15, 35.0e6, 0.05, 1000.0), (95.15, 35.0e6, 0.15, 1000.0)],
        "temp_c double, press_pa double, x_nacl double, rho_h2o double",
    )
    lo, hi = [
        r.rho
        for r in two.select(
            brine_density(F.col("temp_c"), F.col("press_pa"), F.col("x_nacl"), F.col("rho_h2o")).alias("rho")
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
    assert m == pytest.approx(0.1 / (0.9 * 58.443e-3), rel=1e-12)  # ≈1.9 mol/kg


def test_krw_scaling_floors_at_zero(spark):
    df = spark.createDataFrame([(0.05, 0.11), (0.5, 0.11), (1.0, 0.11)], "s double, srw double")
    vals = [r.k for r in df.select(krw_scaled(F.col("s"), F.col("srw")).alias("k")).collect()]
    assert vals[0] == 0.0  # below residual → clamped (m:387-390)
    assert vals[1] == pytest.approx((0.5 - 0.11) / 0.89)
    assert vals[2] == pytest.approx(1.0)


def test_capillary_pressure_monotone_decreasing_with_sw(spark):
    df = spark.createDataFrame([(0.25, 5000.0), (1.0, 5000.0), (0.0, 5000.0)], "sw double, pe double")
    v = [r.pc for r in df.select(capillary_pressure(F.col("sw"), F.col("pe")).alias("pc")).collect()]
    assert v[0] == pytest.approx(5000.0 * 0.25**-0.5)  # pe·sw^(-1/2)
    assert v[1] == pytest.approx(5000.0)
    assert v[2] > v[0] > v[1]  # ε-floor keeps sw=0 finite but huge


def test_hydrostatic_and_units(spark):
    df = spark.createDataFrame([(1000.0, 1000.0)], "z double, rho double")
    p = df.select(hydrostatic_pressure(F.col("z"), F.col("rho")).alias("p")).collect()[0].p
    assert p == pytest.approx(1000.0 * GRAVITY * 1000.0)
    u = spark.createDataFrame([(35.0, 1.0)], "mpa double, yr double")
    row = u.select(
        mpa_to_pa(F.col("mpa")).alias("pa"), years_to_seconds(F.col("yr")).alias("s")
    ).collect()[0]
    assert row.pa == 35.0e6 and row.s == pytest.approx(365.2425 * 86400)
