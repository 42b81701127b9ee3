"""Record linkage / entity resolution: blocked fuzzy matching.

Beyond-reference surface (SURVEY.md §2.13): the classic dedup-across-sources
problem — find records that *almost* agree — solved the only way that scales:

1. **block** on cheap equality keys (here `(p_brand, p_type)`), an equi-join
   Catalyst shuffles hash-partitioned — candidate pairs are Σ_b |b|²/2, never
   n²/2;
2. **guard** with a necessary condition (|len(a)−len(b)| ≤ θ) that costs a
   subtraction and prunes most of the block before any string work;
3. **verify** with the real metric — Levenshtein with an early-exit
   threshold (`levenshtein(a, b, θ)` short-circuits the DP as soon as the
   distance must exceed θ, turning O(|a|·|b|) into O(θ·min(|a|,|b|))).

Skew note (100 TB): block sizes follow the data; a hot block (one brand-type
dominating) concentrates its quadratic work on one reducer. The fix is the
measured salting pattern in `operators/skew.py` — split the hot block's left
side over salt replicas — or a finer composite block key. The heavy-hitter
profile (`heavy_hitters_lineitem_parts`) is the diagnostic that decides.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from pumle_spark.tables import table
from pumle_spark.workload import register

_EDIT_MAX = 2  # match threshold
_LEN_GUARD = _EDIT_MAX  # |len(a)-len(b)| > θ ⇒ levenshtein > θ


@register(
    "link_fuzzy_part_names",
    sql=f"""
    SELECT a.p_partkey AS part_a, b.p_partkey AS part_b,
           a.p_brand, a.p_type,
           CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS edit_dist
    FROM part a JOIN part b
      ON a.p_brand = b.p_brand AND a.p_type = b.p_type
     AND a.p_partkey < b.p_partkey
    WHERE abs(length(a.p_name) - length(b.p_name)) <= {_LEN_GUARD}
      AND levenshtein(a.p_name, b.p_name) <= {_EDIT_MAX}
    """,
    tags=("linkage", "fuzzy", "dedup"),
)
def link_fuzzy_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy self-join over part names: pairs in the same
    (brand, type) block whose names are within {_EDIT_MAX} edits — exact
    duplicates (distance 0) and near-misses both surface. The Spark side
    passes the threshold straight into ``levenshtein(l, r, θ)`` so the JVM
    DP early-exits; the DuckDB oracle states the same predicate without the
    hint (same result set, oracle pays full price)."""
    p = table(spark, sf_dir, "part").select("p_partkey", "p_name", "p_brand", "p_type")
    a = p.select(
        F.col("p_partkey").alias("part_a"),
        F.col("p_name").alias("name_a"),
        "p_brand",
        "p_type",
    )
    b = p.select(
        F.col("p_partkey").alias("part_b"),
        F.col("p_name").alias("name_b"),
        F.col("p_brand").alias("brand_b"),
        F.col("p_type").alias("type_b"),
    )
    # thresholded levenshtein returns -1 when the distance exceeds θ
    dist = F.levenshtein(F.col("name_a"), F.col("name_b"), _EDIT_MAX)
    return (
        a.join(
            b,
            (F.col("p_brand") == F.col("brand_b"))
            & (F.col("p_type") == F.col("type_b"))
            & (F.col("part_a") < F.col("part_b")),
        )
        .filter(F.abs(F.length("name_a") - F.length("name_b")) <= _LEN_GUARD)
        .withColumn("edit_dist", dist)
        .filter(F.col("edit_dist") >= 0)
        .select("part_a", "part_b", "p_brand", "p_type", F.col("edit_dist").cast("int").alias("edit_dist"))
    )
