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


def _rampup_shape(time: float, dt: float, n: int) -> tuple[int, int, float]:
    """(n_warm, m, remainder): the MRST rampupTimesteps shape — warm-up
    prefix truncated to cumsum < time, ⌊left/dt⌋ constant steps, remainder."""
    from itertools import accumulate

    warm = [dt / 2.0 ** (n - k) for k in range(n)]  # dt/2^n .. dt/2
    cums = list(accumulate(warm))
    if any(c > time for c in cums):
        warm = [w for w, c in zip(warm, cums) if c < time]
    left = time - sum(warm)
    m = int(left // dt) if left > 0 else 0
    return len(warm), m, left - m * dt


def rampup_timesteps(
    spark: SparkSession, time: float, dt: float, n: int = 8
) -> DataFrame:
    """(step_idx, dt_step): MRST-compatible ramp-up step sequence.

    MRST rampupTimesteps semantics, including the short-horizon case: the
    geometric warm-up dt/2ⁿ…dt/2 is TRUNCATED to the steps whose cumulative
    sum stays under `time` (MRST: dt_init = dt_init(cs_time < time)), then
    ⌊left/dt⌋ constant steps of dt, then one positive remainder step.
    """
    n_warm, m, remainder = _rampup_shape(time, dt, n)
    total_steps = n_warm + m + (1 if remainder > 1e-12 else 0)

    step = F.col("id").cast("int")
    # kept warm steps are always the SMALLEST prefix: dt/2^(n-k) for k<n_warm
    dt_step = (
        F.when(step < n_warm, F.lit(dt) / F.pow(F.lit(2.0), (F.lit(n) - step).cast("double")))
        .when(step < n_warm + m, F.lit(dt))
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
    # step count in closed form — no eager Spark job per schedule build
    n_warm, m, remainder = _rampup_shape(injection_time, dt_init, n_rampup)
    n_inj = n_warm + m + (1 if remainder > 1e-12 else 0)
    mig_dt = migration_time / migration_steps
    mig = spark.range(migration_steps).select(
        (F.col("id").cast("int") + F.lit(n_inj)).alias("step_idx"),
        F.lit(mig_dt).alias("dt_step"),
        F.lit(2).alias("control"),
    )
    return inj.unionByName(mig)
