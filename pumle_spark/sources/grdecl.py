"""S9: GRDECL / ECLIPSE keyword-file reader.

The reference delegates to MRST's readGRDECL (co2lab3DPUMLE.m:101-129); the
engine reads the text format natively into DataFrames. Format (see
reference benchmark/unisim-1-d/PETRO_0.INC, SO.INC, KR_0.INC):

    KEYWORD
      v1 v2 3*v4 ...          -- values, with N*V run-length encoding
    /                          -- slash terminates the keyword block
    -- comment lines

Grid property keywords (PORO, NTG, ACTNUM, SO, ...) carry one value per
cell in F-order — exactly the engine's cell_id order.

Spark-first design: the file is read once with spark.read.text, keyword
blocks are reassembled per-file on the executor side via split/explode
expressions, and the N*V run-length expansion is a sequence+explode — no
Python loop touches cell data. For multi-GB GRDECL decks the per-keyword
explode parallelizes; for typical deck sizes this is a one-time ingest to
Parquet `grid_cells` anyway (SURVEY §2.1 S9).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def read_grdecl_keywords(spark: SparkSession, path: str) -> DataFrame:
    """Parse a GRDECL file into (keyword, pos, value) long form.

    - strips '--' comments
    - splits on '/'-terminated keyword blocks
    - expands N*V run-length tokens (e.g. '3*0.25' → three 0.25s)
    - pos is the 0-based value index within the keyword = F-order cell_id
      for per-cell properties
    """
    body = spark.read.text(path, wholetext=True).select(
        # strip comments, normalize whitespace
        F.regexp_replace("value", r"(?m)--[^\n]*", " ").alias("body")
    )
    # each block: "KEYWORD v v v ... /" — split the file on '/' then peel the
    # leading token of each block as the keyword
    blocks = (
        body.select(F.posexplode(F.split("body", "/")).alias("block_idx", "block"))
        # split on ANY whitespace then drop empties (trim() leaves newlines)
        .select("block_idx", F.filter(F.split("block", r"\s+"), lambda x: x != "").alias("toks"))
        .filter(F.size("toks") > 0)
    )

    kw = blocks.select(
        "block_idx",
        # null-tolerant get(): ANSI mode errors on getItem of an empty array
        # even behind a size() filter once Catalyst fuses the stages
        F.get("toks", 0).alias("keyword"),
        F.slice("toks", 2, F.greatest(F.size("toks") - 1, F.lit(0))).alias("vals"),
    ).filter(F.col("keyword").isNotNull())

    # run-length expansion: token 'N*V' → N copies of V; plain token → itself
    tok = kw.select(
        "keyword",
        "block_idx",
        F.posexplode("vals").alias("tok_idx", "tok"),
    ).select(
        "keyword",
        "block_idx",
        "tok_idx",
        F.when(
            F.col("tok").contains("*"),
            F.struct(
                F.split("tok", r"\*").getItem(0).cast("int").alias("n"),
                F.split("tok", r"\*").getItem(1).alias("v"),
            ),
        )
        .otherwise(F.struct(F.lit(1).alias("n"), F.col("tok").alias("v")))
        .alias("rle"),
    )
    expanded = tok.select(
        "keyword",
        "block_idx",
        "tok_idx",
        F.posexplode(F.expr("array_repeat(rle.v, rle.n)")).alias("rep_idx", "value_str"),
    )
    # global position within the KEYWORD (not the block): a deck may split
    # one keyword across several '/' blocks (INCLUDE-style continuation);
    # pos must continue across them or downstream cell_id joins silently
    # multiply rows. Partitioning by keyword serializes each keyword's
    # numbering into one task — fine for deck-sized inputs (ingest is a
    # one-time write to Parquet); a per-block count + cumulative-offset join
    # is the scale-out form if a single keyword ever spans GBs.
    from pyspark.sql import Window

    w = Window.partitionBy("keyword").orderBy("block_idx", "tok_idx", "rep_idx")
    return expanded.select(
        "keyword",
        (F.row_number().over(w) - 1).cast("bigint").alias("pos"),
        F.col("value_str").cast("double").alias("value"),
        "value_str",
    )


def repair_zcorn(zcorn_long: DataFrame, dims: tuple[int, int, int]) -> DataFrame:
    """MRST-style ZCORN repair (processGRDECL 'RepairZCORN',
    co2lab3DPUMLE.m:108-124): corner-point depths must be NON-DECREASING
    down every vertical corner line; violations (negative cell thickness /
    interleaved layers from sloppy exports) are clamped to the running max
    above them — exactly what RepairZCORN's monotonicity pass does.

    Input: the ZCORN keyword in long form (pos, value) with 8·nx·ny·nz
    values laid out as a (2nx, 2ny, 2nz) F-order lattice. Output adds
    (ci, cj, ck) lattice coords, value_repaired, and was_repaired.

    Distribution: one window per vertical corner line (partition key
    (ci, cj) — 4·nx·ny independent lines, each only 2·nz values long), so
    the repair scales out with the areal grid size and no line ever
    exceeds a partition."""
    nx, ny, _ = dims
    ci = F.col("pos") % (2 * nx)
    cj = (F.col("pos") / (2 * nx)).cast("bigint") % (2 * ny)
    ck = (F.col("pos") / (4 * nx * ny)).cast("bigint")
    from pyspark.sql import Window

    lat = zcorn_long.select(
        "pos",
        "value",
        ci.alias("ci"),
        cj.alias("cj"),
        ck.alias("ck"),
    )
    line = Window.partitionBy("ci", "cj").orderBy("ck").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return lat.select(
        "pos",
        "ci",
        "cj",
        "ck",
        "value",
        F.max("value").over(line).alias("value_repaired"),
    ).withColumn("was_repaired", F.col("value_repaired") != F.col("value"))


def read_zcorn(
    spark: SparkSession, path: str, dims: tuple[int, int, int], repair: bool = False
) -> DataFrame:
    """Scan the ZCORN keyword from a deck, optionally applying the
    RepairZCORN monotonicity clamp (the reference's PARAMS.Grid.repair_flag
    surfaced as a typed argument). Validates the expected 8·nx·ny·nz value
    count loudly — a short ZCORN block means a truncated deck."""
    nx, ny, nz = dims
    expected = 8 * nx * ny * nz
    z = read_grdecl_keywords(spark, path).filter(F.col("keyword") == "ZCORN")
    n = z.count()
    if n != expected:
        raise ValueError(f"ZCORN has {n} values, expected 8*{nx}*{ny}*{nz}={expected}")
    if not repair:
        return z.select("pos", "value")
    return repair_zcorn(z, dims).select(
        "pos", F.col("value_repaired").alias("value"), "was_repaired"
    )


def grid_cells(spark: SparkSession, path: str, keywords: list[str]) -> DataFrame:
    """Pivot selected per-cell keywords into grid_cells(cell_id, <kw>...).

    One-time ingest product (write it to Parquet); each keyword column is a
    filtered view of the long form joined on pos=cell_id.
    """
    long = read_grdecl_keywords(spark, path).filter(F.col("keyword").isin(keywords))
    out = None
    for kw in keywords:
        col = (
            long.filter(F.col("keyword") == kw)
            .select(F.col("pos").alias("cell_id"), F.col("value").alias(kw.lower()))
        )
        out = col if out is None else out.join(col, "cell_id", "full_outer")
    return out
