"""Driver-gated query for the Z-order layout key (`pumle_spark/layout.py`).

The key computation is registered as a workload query so the Morton
interleave — the part that decides which rows co-locate — is cross-engine
hash-verified; the *effect* of the layout (row-group pruning for 2-D box
predicates) is measured deterministically in tests/test_layout.py by
counting overlapping row groups against a single-column sort.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from pumle_spark.layout import DEFAULT_BITS, bucketize, zorder_key
from pumle_spark.tables import table
from pumle_spark.workload import register

_BITS = DEFAULT_BITS
_EPOCH = "1970-01-01"


def _sql_zorder_terms(xb: str, yb: str) -> str:
    terms = []
    for i in range(_BITS):
        terms.append(f"(({xb} >> {i}) & 1) * {1 << (2 * i)}")
        terms.append(f"(({yb} >> {i}) & 1) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


@register(
    "layout_zorder_orders",
    sql=f"""
    WITH src AS (
      SELECT o_orderkey, o_custkey,
             date_diff('day', DATE '{_EPOCH}', CAST(o_orderdate AS DATE)) AS dday
      FROM orders
    ),
    bounds AS (
      SELECT MIN(o_custkey) AS xmin, MAX(o_custkey) AS xmax,
             MIN(dday) AS ymin, MAX(dday) AS ymax
      FROM src
    ),
    bucketed AS (
      SELECT s.o_orderkey,
             ((s.o_custkey - b.xmin) * {1 << _BITS}) // (b.xmax - b.xmin + 1) AS xb,
             ((s.dday - b.ymin) * {1 << _BITS}) // (b.ymax - b.ymin + 1) AS yb
      FROM src s CROSS JOIN bounds b
    )
    SELECT o_orderkey, xb, yb,
           CAST({_sql_zorder_terms("xb", "yb")} AS BIGINT) AS zkey
    FROM bucketed
    """,
    tags=("layout", "zorder"),
)
def layout_zorder_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering key for orders over (customer, order day): both
    dimensions bucketized to 2^{_BITS} cells against their observed bounds
    (single-row broadcast scalar), bits interleaved into one BIGINT sort
    key. Writing the table range-partitioned + sorted on this key is what
    `pumle_spark.layout.write_zordered` does; rows close on the key are
    close in BOTH customer and time, so min/max chunk stats prune 2-D box
    predicates. All arithmetic is integer (bucket = scaled DIV span), hence
    bit-identical in the DuckDB transcription."""
    src = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.datediff(F.to_date("o_orderdate"), F.lit(_EPOCH).cast("date")).alias("dday"),
    )
    bounds = src.select(
        F.min("o_custkey").alias("xmin"),
        F.max("o_custkey").alias("xmax"),
        F.min("dday").alias("ymin"),
        F.max("dday").alias("ymax"),
    )
    xb = bucketize(F.col("o_custkey"), F.col("xmin"), F.col("xmax"), _BITS)
    yb = bucketize(F.col("dday").cast("long"), F.col("ymin").cast("long"), F.col("ymax").cast("long"), _BITS)
    return (
        src.crossJoin(F.broadcast(bounds))
        .withColumn("xb", xb)
        .withColumn("yb", yb)
        .select(
            "o_orderkey",
            "xb",
            "yb",
            zorder_key(F.col("xb"), F.col("yb"), _BITS).alias("zkey"),
        )
    )
