"""SparkSession factory.

One place to encode the scale posture of the engine: AQE on (runtime
re-planning, skew-join splitting, partition coalescing), Arrow on (every
pandas-UDF boundary is vectorized), sensible shuffle-partition defaults that a
cluster deployment overrides via ``spark.sql.shuffle.partitions``.

The reference has no session concept — it is a single-process Python script
(reference main.py:144-197). Here the session IS the engine instance.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults chosen for the local[N] test/bench harness; a real cluster submit
# overrides master/partitions via spark-submit conf. At 100 TB you want
# shuffle partitions ~ 2-4x total executor cores with AQE coalescing down.
_DEFAULT_CONF = {
    # --- adaptive execution: runtime re-planning is the main scale lever ---
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # --- arrow for every python<->jvm columnar boundary ---
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # --- broadcast small dims aggressively (region/nation/part-scale) ---
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # --- parquet scan behavior ---
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    # partition discovery & pruning
    "spark.sql.optimizer.dynamicPartitionPruning.enabled": "true",
    # timestamps: keep parquet int96-free, stable across engines
    "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
    # driver testdata stores TIMESTAMP(NANOS) columns; read them as int64
    # nanos (tables.table() converts back to timestamp)
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # quieter driver in tests
    "spark.ui.showConsoleProgress": "false",
}


def default_parallelism() -> int:
    """CPU budget for local mode; the driver exports SPARK_GRAFT_CPUS."""
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def get_spark(
    app_name: str = "pumle_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``master=None`` respects an existing session / spark-submit master and
    falls back to ``local[$SPARK_GRAFT_CPUS]``.
    """
    cpus = default_parallelism()
    builder = SparkSession.builder.appName(app_name)
    if master is None and SparkSession.getActiveSession() is None:
        master = f"local[{cpus}]"
    if master is not None:
        builder = builder.master(master)
    conf = dict(_DEFAULT_CONF)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions or cpus)
    conf.setdefault("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
