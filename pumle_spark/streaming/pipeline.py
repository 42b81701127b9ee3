"""Streaming pipelines: file-arrival bronze ingest and event analytics.

Two streams mirror the batch engine:

1. ``stream_bronze_states``: readStream over the bronze landing directory —
   the streaming twin of sources.bronze.read_states. Each arriving
   states_*.json file becomes long (sim_hash, t, row_idx, pressure, sw, sg)
   rows; the query appends to golden Parquet, turning the reference's
   "menu option 2" manual persist (main.py:108-122) into a continuous,
   exactly-once ingestion (checkpointed file-source offsets).

2. ``stream_events_hourly``: watermarked tumbling-window aggregation over an
   event stream — the streaming twin of workload.events.events_hourly_rollup
   (same results on the same closed windows, late data dropped past the
   watermark).

Tests drive both with real micro-batches (file source / processAllAvailable).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from pumle_spark.sources.bronze import STATE_SCHEMA
from pyspark.sql.types import ArrayType

_HASH_FROM_STATES = r"states_[^_/]+_([0-9a-f]+)\.json$"


def stream_bronze_states(spark: SparkSession, landing_dir: str) -> DataFrame:
    """readStream file source over bronze states JSON → long rows.

    wholetext keeps one file per row so posexplode assigns exact timestep
    indices, identical to the batch scan — the batch/streaming plans share
    the same operators, which is the point of Structured Streaming.
    """
    raw = (
        spark.readStream.format("text")
        .option("wholetext", "true")
        .option("maxFilesPerTrigger", 8)  # bounded micro-batches under burst
        .load(landing_dir)
    )
    parsed = raw.select(
        F.regexp_extract(F.input_file_name(), _HASH_FROM_STATES, 1).alias("sim_hash"),
        F.from_json("value", ArrayType(STATE_SCHEMA)).alias("states"),
    )
    long = parsed.select("sim_hash", F.posexplode("states").alias("t", "state")).select(
        "sim_hash",
        "t",
        F.posexplode(F.arrays_zip(F.col("state.pressure"), F.col("state.s"))).alias("row_idx", "z"),
    )
    return long.select(
        "sim_hash",
        "t",
        "row_idx",
        F.col("z.pressure").alias("pressure"),
        F.col("z.s").getItem(0).alias("sw"),
        F.col("z.s").getItem(1).alias("sg"),
    )


def start_bronze_to_golden(
    spark: SparkSession, landing_dir: str, out_dir: str, checkpoint_dir: str
) -> StreamingQuery:
    """Append stream → golden-observations Parquet partitioned by sim_hash.

    File-source offsets + parquet sink give exactly-once per input file; the
    dense scatter (J1) stays a batch view over this observations table.
    """
    return (
        stream_bronze_states(spark, landing_dir)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("sim_hash")
        .outputMode("append")
        .start()
    )


def start_plume_monitor(
    spark: SparkSession,
    landing_dir: str,
    actnum_glob: str,
    out_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.05,
) -> StreamingQuery:
    """Continuous plume monitoring: as each simulation's states JSON lands,
    emit (sim_hash, t, n_plume_cells) — the reference's headline metric
    (SURVEY §7.2), computed the moment results arrive instead of in a
    nightly batch.

    The streaming rows join the STATIC active-cell index (stream-static
    join) so the P3 bounds guard applies identically to batch ingest —
    oversized state arrays drop the same rows in both paths. One bronze
    file carries a sim's complete state series, so every per-(sim, t)
    aggregate closes within its micro-batch; foreachBatch runs the batch
    aggregation and appends. Exactly-once per input file comes from the
    checkpointed file source; a mid-write crash can duplicate a batch's
    output rows on restart (standard foreachBatch at-least-once residue),
    so downstream readers key by (sim_hash, t)."""
    from pumle_spark.ingest import active_index
    from pumle_spark.plume import plume_predicate
    from pumle_spark.sources.bronze import read_actnum

    act_idx = active_index(read_actnum(spark, actnum_glob))

    def emit(batch_df: DataFrame, batch_id: int) -> None:
        out = (
            batch_df.join(act_idx, ["sim_hash", "row_idx"])
            .filter(plume_predicate(threshold))
            .groupBy("sim_hash", "t")
            .agg(F.count(F.lit(1)).alias("n_plume_cells"))
        )
        out.write.mode("append").parquet(out_dir)

    return (
        stream_bronze_states(spark, landing_dir)
        .writeStream.foreachBatch(emit)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def stream_dedup_events(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup by event_id with bounded state — the streaming
    twin of dedup_exact (X3 idempotence for event streams).

    Uses dropDuplicatesWithinWatermark: state for a seen id is evicted once
    the watermark passes it. Plain dropDuplicates([id]) would NOT evict —
    the watermark only bounds dedup state when the event-time column is part
    of the key — so that variant grows state forever on a real stream.
    Duplicates within the watermark horizon are dropped exactly; a dup
    arriving later than the horizon is the documented at-least-once residue
    every bounded-state streaming dedup accepts.
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def stream_events_hourly(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling 1-hour rollup per event_type.

    Late rows beyond the watermark are dropped and closed windows emit
    finalized aggregates — the streaming semantics of
    workload.events.events_hourly_rollup.

    sum_value accumulates per-row exact BIGINT cents (functions.money), not
    SUM(double): a double sum is partial-sum-order dependent, and in a
    stream the "order" is additionally the micro-batch arrival order, so
    the final aggregate of the SAME input could differ run to run. The
    cents state is also a plain long in the state store — cheaper per key
    per micro-batch than a boxed decimal.
    """
    from pumle_spark.functions import money

    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money.sum_money2(F.col("value"), money.CENTS).alias("sum_value"),
        )
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("hour_ts"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def stream_click_attribution(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked stream-stream interval join: attribute each purchase to
    every click by the same user within the preceding ``horizon``.

    The canonical Structured Streaming two-stream join: both sides carry an
    event-time watermark and the join predicate bounds purchase time to
    [click.ts, click.ts + horizon], so the state store retains each side
    only for watermark + horizon — bounded state at any input rate. Inner
    join ⇒ matches emit as soon as both rows have arrived; the watermark
    exists for state eviction, not emission.

    Batch equivalence (the gate): once all input is processed, the emitted
    pairs equal the batch interval join — workload.events registers the
    driver-checked twin.
    """
    c = clicks.withWatermark("ts", watermark).alias("c")
    p = purchases.withWatermark("ts", watermark).alias("p")
    joined = c.join(
        p,
        F.expr(
            f"p.user_id = c.user_id AND p.ts >= c.ts AND p.ts <= c.ts + interval {horizon}"
        ),
    )
    return joined.select(
        F.col("c.user_id").alias("user_id"),
        F.col("c.event_id").alias("click_event_id"),
        F.col("p.event_id").alias("purchase_event_id"),
        (F.unix_micros(F.col("p.ts")) - F.unix_micros(F.col("c.ts"))).alias("lag_us"),
    )
