"""Golden-store maintenance: the table-layout ops a 100 TB deployment runs
nightly, expressed over the plain-Parquet golden layout (ingest.write_golden:
partitioned by sim_hash, (t, cell_id)-sorted within partitions).

Why this exists: streaming ingest (streaming/pipeline.start_bronze_to_golden)
and per-sim appends accrete one-file-per-micro-batch; thousands of small files
per partition tax every scan (footer reads, task scheduling) and defeat
row-group skipping. Compaction rewrites each partition into row-group-sized
files and restores the in-partition (t, cell_id) sort order.

The rewrite is swap-atomic the same way the catalog's overwrite is: write the
compacted tree next to the live one, then two renames. Readers racing the
swap see the old tree or the new tree, never a mix; the path-missing window
is two rename syscalls. Single maintainer at a time (same single-writer
contract as the catalog — use a transactional table format for multi-writer).
"""

from __future__ import annotations

import os
import shutil

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def golden_file_stats(spark: SparkSession, path: str) -> DataFrame:
    """(sim_hash, n_files, n_rows, avg_rows_per_file): the compaction
    trigger metric, computed from the data itself (input_file_name), so it
    is scheme-transparent — no filesystem listing code to port per store."""
    g = spark.read.parquet(path).select("sim_hash", F.input_file_name().alias("f"))
    per_file = g.groupBy("sim_hash", "f").agg(F.count(F.lit(1)).alias("rows"))
    return per_file.groupBy("sim_hash").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("rows").alias("n_rows"),
        F.round(F.avg("rows"), 1).alias("avg_rows_per_file"),
    )


def compact_golden(
    spark: SparkSession,
    path: str,
    max_records_per_file: int = 4_000_000,
) -> None:
    """Rewrite the golden store: one balanced write per sim_hash partition
    with the (t, cell_id) sort restored, swapped in atomically.

    `maxRecordsPerFile` (not a fixed file count) sizes output files, so a
    10x-bigger partition produces 10x the files instead of 10x-bigger files
    — the property that keeps row groups within executor memory at any SF.
    """
    golden = spark.read.parquet(path)
    tmp = path.rstrip("/") + "._compacting"
    old = path.rstrip("/") + "._old"
    shutil.rmtree(tmp, ignore_errors=True)
    (
        golden.repartition("sim_hash")
        .sortWithinPartitions("t", "cell_id")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy("sim_hash")
        .parquet(tmp)
    )
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
