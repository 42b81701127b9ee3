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
    # global position within the keyword block: window over (block, tok, rep)
    from pyspark.sql import Window

    w = Window.partitionBy("keyword", "block_idx").orderBy("tok_idx", "rep_idx")
    return expanded.select(
        "keyword",
        (F.row_number().over(w) - 1).cast("bigint").alias("pos"),
        F.col("value_str").cast("double").alias("value"),
        "value_str",
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
