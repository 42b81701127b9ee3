"""Simulation schedule generators (G5 ramp-up timesteps, G6 control
assignment; reference co2lab3DPUMLE.m:448-487).

MRST ``rampupTimesteps(time, dt, n)`` semantics (used at m:452 with the
default n=8): n geometrically doubling warm-up steps dt/2ⁿ … dt/2, then
⌊remaining/dt⌋ constant steps of dt, then one final remainder step (dropped
when zero). The migration phase appends constant steps (m:468-475), and the
control id is 1 during injection, 2 after shut-in (m:478-487).

Everything is closed-form column arithmetic over spark.range — the schedule
for a million-sim sweep is still a lazy plan, never a driver loop.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def rampup_timesteps(
    spark: SparkSession, time: float, dt: float, n: int = 8
) -> DataFrame:
    """(step_idx, dt_step): MRST-compatible ramp-up step sequence.

    step k < n:             dt / 2^(n-k)        (geometric warm-up)
    next m = ⌊left/dt⌋:     dt                  (constant)
    final (if remainder>0): time - covered      (remainder)
    """
    ramp_sum = dt * (1 - 2.0 ** (-n))  # Σ dt/2^k, k=1..n (exact powers of 2)
    left = time - ramp_sum
    if left < 0:
        raise ValueError(f"ramp-up alone exceeds total time ({ramp_sum} > {time})")
    m = int(left // dt)
    remainder = left - m * dt
    total_steps = n + m + (1 if remainder > 1e-12 else 0)

    step = F.col("id").cast("int")
    dt_step = (
        F.when(step < n, F.lit(dt) / F.pow(F.lit(2.0), (F.lit(n) - step).cast("double")))
        .when(step < n + m, F.lit(dt))
        .otherwise(F.lit(remainder))
    )
    return spark.range(total_steps).select(step.alias("step_idx"), dt_step.alias("dt_step"))


def full_schedule(
    spark: SparkSession,
    injection_time: float,
    migration_time: float,
    dt_init: float,
    migration_steps: int,
    n_rampup: int = 8,
) -> DataFrame:
    """Injection ramp-up + constant migration steps with control ids
    (G6: control 1 = injecting, control 2 = shut-in; m:478-487)."""
    inj = rampup_timesteps(spark, injection_time, dt_init, n_rampup).withColumn(
        "control", F.lit(1)
    )
    n_inj = inj.count()
    mig_dt = migration_time / migration_steps
    mig = spark.range(migration_steps).select(
        (F.col("id").cast("int") + F.lit(n_inj)).alias("step_idx"),
        F.lit(mig_dt).alias("dt_step"),
        F.lit(2).alias("control"),
    )
    return inj.unionByName(mig)
