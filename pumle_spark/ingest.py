"""Bronze → golden ingest (SURVEY §3.2 — the heart of the engine).

Reference pipeline (eager, per-sim Python loop; sim_results_parser.py:260-328
+ arrays.py:56-147): read JSON states → project pressure/s → bounds-filter →
gather at active-cell indices → scatter into dense (i,j,k,t) NumPy tensors
with NaN for inactive cells.

Spark redesign (ONE lazy plan for the whole fleet):

    states ─ posexplode ─┐
                         ├─ J2 positional zip (arrays_zip + posexplode)
    actnum ─ filter ─────┤
                         ├─ P3 bounds filter (row_idx < n_active)
                         ├─ J1 scatter = dense cells LEFT JOIN values
    dims ─ literals ─────┘
                         └─ F12 (i,j,k) from cell_id → golden long Parquet
                             partitioned by sim_hash

The canonical store is the LONG format (sim_hash, t, cell_id, i, j, k,
pressure, sw, sg); NULL = inactive cell (the reference's NaN). Dense
tensors exist only in export sinks (exports.py). Partitioning by sim_hash
makes per-sim queries partition-pruned scans; within a partition rows are
sorted by (t, cell_id) for row-group skipping on timestep predicates.

Scale: no driver-side loops, no collect; the scatter join is a shuffle on
(sim_hash, t, row-position) whose skew (sims with varying active counts) is
handled by AQE skew-join splitting (session.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from pumle_spark.functions.grid import ijk_exprs
from pumle_spark.sources.bronze import read_actnum, read_grid_dims, read_states


def active_index(actnum: DataFrame) -> DataFrame:
    """P2: (sim_hash, cell_id, row_idx) for active cells.

    row_idx is the cell's position among the sim's active cells in cell_id
    order — exactly np.where(actnum)[0] (sim_results_parser.py:216): the
    simulator emits state arrays in this order, so row_idx is the positional
    join key between compacted state rows and global cell ids.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("sim_hash").orderBy("cell_id")
    return (
        actnum.filter(F.col("active"))
        .withColumn("row_idx", F.row_number().over(w) - 1)
        .select("sim_hash", "cell_id", "row_idx")
    )


def states_long(states: DataFrame) -> DataFrame:
    """J2: positional zip of pressure[i] with s[i] → long rows.

    arrays_zip + one posexplode pairs pressure with [sw, sg] by position
    without the position ever leaving the row (SURVEY §2.4 J2) — the
    reference's Python zip loop (sim_results_parser.py:284-304).
    """
    zipped = states.select(
        "sim_hash",
        "t",
        F.posexplode(F.arrays_zip("pressure", "s")).alias("row_idx", "z"),
    )
    return zipped.select(
        "sim_hash",
        "t",
        "row_idx",
        F.col("z.pressure").alias("pressure"),
        F.col("z.s").getItem(0).alias("sw"),
        F.col("z.s").getItem(1).alias("sg"),
    )


def ingest_golden(
    spark: SparkSession,
    states_glob: str,
    actnum_glob: str,
    dims_path: str,
) -> DataFrame:
    """Full bronze→golden plan. Returns the golden long DataFrame:
    (sim_hash, t, cell_id, i, j, k, pressure, sw, sg) — dense over cells ×
    timesteps per sim, NULL-valued at inactive cells (arrays.py:90-92 NaN).
    """
    ni, nj, nk = read_grid_dims(spark, dims_path)
    ncells = ni * nj * nk

    actnum = read_actnum(spark, actnum_glob)
    act_idx = active_index(actnum)
    values = states_long(read_states(spark, states_glob))

    # P3 bounds guard (arrays.py:106-110, sim_results_parser.py:295-300):
    # drop state rows beyond the sim's active count and active indices
    # beyond the grid — an inner join on (sim_hash, row_idx) does both:
    # unmatched positions on either side vanish, matching the reference's
    # "skip with warning" semantics declaratively.
    obs = values.join(act_idx, ["sim_hash", "row_idx"]).select(
        "sim_hash", "t", "cell_id", "pressure", "sw", "sg"
    )

    # J1 scatter: dense (sim_hash × t × cell_id) domain LEFT JOIN observations.
    sims_t = values.select("sim_hash", "t").distinct()
    all_cells = spark.range(ncells).select(F.col("id").alias("cell_id"))
    dense = sims_t.crossJoin(all_cells)

    golden = dense.join(obs, ["sim_hash", "t", "cell_id"], "left")

    i, j, k = ijk_exprs(F.col("cell_id"), ni, nj)
    return golden.select("sim_hash", "t", "cell_id", i, j, k, "pressure", "sw", "sg")


def write_golden(golden: DataFrame, path: str) -> None:
    """Persist golden as Parquet partitioned by sim_hash, sorted within
    partitions by (t, cell_id) → partition pruning on sim_hash, row-group
    skipping on t."""
    (
        golden.repartition("sim_hash")
        .sortWithinPartitions("t", "cell_id")
        .write.mode("overwrite")
        .partitionBy("sim_hash")
        .parquet(path)
    )


def read_golden(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
