"""Test-table access layer.

The driver generates a TPC-H-ish star schema plus ``events``, ``documents``,
``embeddings`` at /root/testdata/sf*/ (TESTDATA.md). All workload queries read
through here so the physical layout (parquet today; bucketed/partitioned
tables on a cluster) is swapped in one place.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at ANY scale factor: these are
# bounded-cardinality dims (25 nations, 5 regions), not fact tables.
ALWAYS_BROADCAST = {"region", "nation"}

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver table.

    SESSION SIDE EFFECT: reading ``events`` pins two session confs for the
    LIFETIME of the session — ``nanosAsLong`` (required before the scan) and
    ``session.timeZone=UTC`` (required for driver/oracle parity of every
    events-derived timestamp). In a non-UTC interactive session this changes
    how unrelated timestamp columns RENDER afterwards; restore
    ``spark.sql.session.timeZone`` manually if that matters to you. The pin
    stays session-wide on purpose: events queries are lazy DataFrames, so
    the conf must still be UTC at ACTION time, not just inside this call.
    """
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; known: {TABLE_NAMES}")
    if name == "events":
        # events.parquet uses TIMESTAMP(NANOS); must be set before the read
        # even on sessions not built by pumle_spark.session (e.g. the driver's)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # the nanos are naive timestamps; timestamp_micros() interprets them
        # as UTC epoch, so rendering must be UTC too or a non-UTC session
        # would shift every hour/rollup boundary vs the (naive) oracle
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        # events.parquet stores TIMESTAMP(NANOS) which the vectorized parquet
        # reader rejects; the session set nanosAsLong above so ts arrives as
        # int64 nanos — convert with integer div (float division of ~1e18
        # nanos loses µs precision), truncating to micros like DuckDB ns→us.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    for field in df.schema.fields:
        if isinstance(field.dataType, TimestampNTZType):
            # driver testdata regenerations have flipped physical encodings
            # before (events: NANOS → naive MICROS, which Spark 4 reads as
            # TIMESTAMP_NTZ) — normalize ANY naive column: its wall-clock IS
            # the UTC instant (same convention as the nanos path above), so
            # with the session tz pinned UTC the plain cast re-interprets it
            # losslessly as TIMESTAMP_LTZ and every downstream
            # unix_micros()/window()/date_format() stays identical across
            # encodings.
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so spark.sql() works on the same
    names the DuckDB oracle uses."""
    for name in TABLE_NAMES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
