"""Physics workload query: the F7/F8/F10/F11 property expressions
(functions/physics.py — Driesner 2007 brine density, Mao & Duan 2009 brine
viscosity, rel-perm/capillary scaling, hydrostatic init) evaluated over a
deterministic (T, P, X_NaCl) grid and cross-checked against a DuckDB
transcription of the SAME formulas in the SAME operation order.

This moves the physics path from unit-test-only to the driver's oracle
gate: both engines run the identical arithmetic, so agreement at 6+
decimals catches any transcription drift in either direction. Outputs are
rounded because libm (DuckDB) and JVM Math (Spark) ln/exp/pow can differ
in the last ulp.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from pumle_spark.functions.physics import (
    GRAVITY,
    brine_density,
    brine_viscosity,
    capillary_pressure,
    krw_scaled,
    nacl_molality,
)
from pumle_spark.workload import register

_N_T, _N_P, _N_X = 8, 7, 4

_SQL_MU_TERMS = (
    "0.0 + 2885317.0 * power(temp_k, -2.0) + -11072.577 * power(temp_k, -1.0)"
    " + -9.0834095 * power(temp_k, 0.0) + 0.030925651 * power(temp_k, 1.0)"
    " + -2.74071e-05 * power(temp_k, 2.0)"
    " + rho_gcc * -1928385.1 * power(temp_k, -2.0)"
    " + rho_gcc * 5621.6046 * power(temp_k, -1.0)"
    " + rho_gcc * 13.82725 * power(temp_k, 0.0)"
    " + rho_gcc * -0.047609523 * power(temp_k, 1.0)"
    " + rho_gcc * 3.5545041e-05 * power(temp_k, 2.0)"
)


@register(
    "physics_brine_properties",
    sql=f"""
    WITH grid AS (
      SELECT CAST(30.0 + 10.0 * ti AS DOUBLE) AS temp_c,
             CAST(10.0 + 5.0 * pi AS DOUBLE) AS press_mpa,
             CAST(0.05 * xi AS DOUBLE) AS x_nacl,
             CAST(800.0 + 25.0 * ti AS DOUBLE) AS depth_m,
             CAST(0.3 + 0.1 * xi AS DOUBLE) AS sw
      FROM generate_series(0, {_N_T - 1}) a(ti)
      CROSS JOIN generate_series(0, {_N_P - 1}) b(pi)
      CROSS JOIN generate_series(0, {_N_X - 1}) c(xi)
    ),
    dens AS (
      SELECT *,
             1000.0 * (1 - x_nacl)
             + (58443.0 / (23.772 + 0.018639 * temp_c + -1.9687e-6 * temp_c * temp_c))
               / (1 - 0.1 * ln(1 + 10 * (10.0 * press_mpa)
                                   * (-1.5259e-5 + 5.5058e-8 * temp_c))) * x_nacl
               AS rho_brine,
             temp_c + 273.15 AS temp_k,
             x_nacl / (0.05844 * (1 - x_nacl)) AS molality
      FROM grid
    ),
    visc AS (
      SELECT *, rho_brine / 1000.0 AS rho_gcc FROM dens
    )
    SELECT temp_c, press_mpa, x_nacl,
           ROUND(rho_brine, 6) AS rho_brine,
           ROUND(exp({_SQL_MU_TERMS})
                 * exp((-0.21319213 + 0.13651589e-2 * temp_k + -0.12191756e-5 * temp_k * temp_k) * molality
                       + (0.69161945e-1 + -0.27292263e-3 * temp_k + 0.20852448e-6 * temp_k * temp_k) * molality * molality
                       + (-0.25988855e-2 + 0.77989227e-5 * temp_k) * molality * molality * molality)
                 * 1e6, 6) AS mu_brine_upas,
           ROUND(molality, 9) AS molality,
           ROUND(rho_brine * {GRAVITY!r} * depth_m / 1e6, 6) AS p_hydro_mpa,
           ROUND(5000.0 * power(GREATEST((sw - 0.11) / (1 - 0.11), 1e-6), -0.5) / 1000.0, 6)
             AS pc_kpa
    FROM visc
    """,
    tags=("physics", "F7", "F8", "F10", "F11"),
)
def physics_brine_properties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brine density/viscosity, molality, hydrostatic pressure, and scaled
    capillary pressure over an (8×7×4) T/P/X grid — every value from the
    pure-expression physics module, oracle-checked against the same
    correlations transcribed to SQL."""
    ti = F.col("ti").cast("double")
    pi = F.col("pi").cast("double")
    xi = F.col("xi").cast("double")
    grid = (
        spark.range(_N_T)
        .select(F.col("id").alias("ti"))
        .crossJoin(spark.range(_N_P).select(F.col("id").alias("pi")))
        .crossJoin(spark.range(_N_X).select(F.col("id").alias("xi")))
        .select(
            (30.0 + 10.0 * ti).alias("temp_c"),
            (10.0 + 5.0 * pi).alias("press_mpa"),
            (0.05 * xi).alias("x_nacl"),
            (800.0 + 25.0 * ti).alias("depth_m"),
            (0.3 + 0.1 * xi).alias("sw"),
        )
    )
    dens = grid.withColumn(
        "rho_brine",
        brine_density(F.col("temp_c"), F.col("press_mpa"), F.col("x_nacl"), F.lit(1000.0)),
    ).withColumn("temp_k", F.col("temp_c") + 273.15).withColumn(
        "molality", nacl_molality(F.col("x_nacl"))
    )
    mu = brine_viscosity(F.col("temp_k"), F.col("rho_brine") / 1000.0, F.col("molality"))
    pc = capillary_pressure(krw_scaled(F.col("sw"), F.lit(0.11)), F.lit(5000.0))
    return dens.select(
        "temp_c",
        "press_mpa",
        "x_nacl",
        F.round("rho_brine", 6).alias("rho_brine"),
        F.round(mu * 1e6, 6).alias("mu_brine_upas"),
        F.round("molality", 9).alias("molality"),
        F.round(F.col("rho_brine") * GRAVITY * F.col("depth_m") / 1e6, 6).alias("p_hydro_mpa"),
        F.round(pc / 1000.0, 6).alias("pc_kpa"),
    )


# --------------------------------------------------------------------------
# F9 — bilinear property interpolation (CO2props() table shape)
# --------------------------------------------------------------------------

_IN_X, _IN_Y = 10, 8  # property grid
_IN_GRID = (5.0, 2.5, 300.0, 5.0)  # x0, dx, y0, dy  (pressure MPa × temp K)
_N_PTS = 40


@register(
    "physics_bilinear_interp",
    sql=f"""
    WITH prop AS (
      SELECT ix, iy,
             CAST(0.1 * ix * ix + 0.5 * iy + 2.0 AS DOUBLE) AS value
      FROM generate_series(0, {_IN_X - 1}) a(ix)
      CROSS JOIN generate_series(0, {_IN_Y - 1}) b(iy)
    ),
    pts AS (
      SELECT CAST(i AS BIGINT) AS pt_id,
             CAST(3.4 + 0.73 * i AS DOUBLE) AS x,    -- starts below x0, ends past the max edge
             CAST(297.0 + 1.19 * i AS DOUBLE) AS y
      FROM generate_series(0, {_N_PTS - 1}) t(i)
    ),
    idx AS (
      SELECT pt_id, x, y,
             LEAST(GREATEST(CAST(floor((x - 5.0) / 2.5) AS INTEGER), 0), {_IN_X - 2}) AS ix,
             LEAST(GREATEST(CAST(floor((y - 300.0) / 5.0) AS INTEGER), 0), {_IN_Y - 2}) AS iy,
             (x - 5.0) / 2.5 AS fx,
             (y - 300.0) / 5.0 AS fy
      FROM pts
    ),
    w AS (SELECT *, fx - ix AS tx, fy - iy AS ty FROM idx)
    SELECT w.pt_id, w.x, w.y,
           ROUND(p00.value * (1 - tx) * (1 - ty)
                 + p10.value * tx * (1 - ty)
                 + p01.value * (1 - tx) * ty
                 + p11.value * tx * ty, 9) AS prop
    FROM w
    JOIN prop p00 ON p00.ix = w.ix     AND p00.iy = w.iy
    JOIN prop p10 ON p10.ix = w.ix + 1 AND p10.iy = w.iy
    JOIN prop p01 ON p01.ix = w.ix     AND p01.iy = w.iy + 1
    JOIN prop p11 ON p11.ix = w.ix + 1 AND p11.iy = w.iy + 1
    """,
    tags=("physics", "F9", "interpolation"),
)
def physics_bilinear_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9 bilinear interpolation against a broadcast regular-grid property
    table (the MRST CO2props() shape), including edge clamping for
    off-grid queries — oracle-checked against the same 4-corner blend in
    SQL. The probe points deliberately start below the grid and run past
    its max edge so the clamp path is exercised, not just the interior."""
    from pumle_spark.functions.physics import interpolate_bilinear

    x0, dx, y0, dy = _IN_GRID
    prop = (
        spark.range(_IN_X)
        .select(F.col("id").cast("int").alias("ix"))
        .crossJoin(spark.range(_IN_Y).select(F.col("id").cast("int").alias("iy")))
        .select(
            "ix",
            "iy",
            (0.1 * F.col("ix") * F.col("ix") + 0.5 * F.col("iy") + 2.0).alias("value"),
        )
    )
    pts = spark.range(_N_PTS).select(
        F.col("id").alias("pt_id"),
        (3.4 + 0.73 * F.col("id").cast("double")).alias("x"),
        (297.0 + 1.19 * F.col("id").cast("double")).alias("y"),
    )
    out = interpolate_bilinear(pts, prop, "x", "y", _IN_GRID, _IN_X, _IN_Y, value_name="prop")
    return out.select("pt_id", "x", "y", F.round("prop", 9).alias("prop"))
