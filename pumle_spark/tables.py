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

# (session, sf_dir, name) -> (DataFrame, needs_tz_pin). A DataFrame is an
# immutable logical plan, so handing the same object to every query is safe
# and skips the per-call file listing + parquet footer read (a driver-side
# job each time: ~50-100 ms x 2-3 tables x 135 queries of pure overhead in
# a bench pass). Keyed on the session object so a stopped/restarted session
# (tests) never sees a stale plan. needs_tz_pin remembers whether the build
# applied a lazy NTZ→LTZ cast, because the normalized schema no longer
# shows NTZ.
_CACHE: dict[tuple[SparkSession, str, str], tuple[DataFrame, bool]] = {}


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver table.

    SESSION SIDE EFFECT: reading ``events`` — or ANY table with a
    TIMESTAMP_NTZ column (driver regenerations have flipped encodings
    before) — pins session confs for the LIFETIME of the session:
    ``nanosAsLong`` (required before a NANOS scan) and
    ``session.timeZone=UTC`` (required for driver/oracle parity of every
    naive-timestamp-derived column). In a non-UTC interactive session this
    changes how unrelated timestamp columns RENDER afterwards; restore
    ``spark.sql.session.timeZone`` manually if that matters to you. The pin
    stays session-wide on purpose: queries are lazy DataFrames and the
    NTZ→LTZ cast below resolves against the session tz at ACTION time, so
    the conf must still be UTC when the job runs, not just inside this
    call. (A truly tz-independent rewrite was measured and rejected:
    ``to_utc_timestamp`` implicit-casts NTZ through the session zone first,
    so no built-in expresses "wall clock IS the UTC instant" without a
    string round-trip.) Do not reset the tz between building and running a
    workload query.
    """
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; known: {TABLE_NAMES}")
    key = (spark, sf_dir, name)
    cached = _CACHE.get(key)
    if cached is not None:
        df, needs_tz_pin = cached
        # re-assert the conf side effects a fresh read would have applied:
        # cache hits must not depend on no one having reset the session tz
        if needs_tz_pin:
            spark.conf.set("spark.sql.session.timeZone", "UTC")
        return df
    needs_tz_pin = False
    if name == "events":
        # events.parquet uses TIMESTAMP(NANOS); must be set before the read
        # even on sessions not built by pumle_spark.session (e.g. the driver's)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # the nanos are naive timestamps; timestamp_micros() interprets them
        # as UTC epoch, so rendering must be UTC too or a non-UTC session
        # would shift every hour/rollup boundary vs the (naive) oracle
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        needs_tz_pin = True
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
            needs_tz_pin = True
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    _CACHE[key] = (df, needs_tz_pin)
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so spark.sql() works on the same
    names the DuckDB oracle uses."""
    for name in TABLE_NAMES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
