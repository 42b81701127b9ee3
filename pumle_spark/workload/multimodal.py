"""Multimodal workload queries (driver north-star: media as binary columns).

The container ships no media files and no codecs, so the media table is
DERIVED deterministically from `documents` (content = utf8 bytes of the
text, typed metadata from doc_id) — identical construction on both
engines. That makes the pure-JVM metadata path (`media_stats`) fully
oracle-checkable, while the decode path runs the honestly-stubbed
deterministic fake codec (operators/multimodal.py) as a rows-only entry.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from pumle_spark.tables import table
from pumle_spark.workload import register


def _media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (media_id, content BINARY, mime, width, height): the
    deterministic stand-in for a real media corpus (same derivation as the
    oracle SQL)."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("content"),
        F.element_at(
            F.array(F.lit("image/png"), F.lit("image/jpeg"), F.lit("video/mp4")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("mime"),
        (16 + F.col("doc_id") % 32).cast("int").alias("width"),
        (16 + (F.col("doc_id") * 7) % 32).cast("int").alias("height"),
    )


@register(
    "multimodal_media_stats",
    sql="""
    SELECT doc_id AS media_id,
           CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image/png'
                WHEN 1 THEN 'image/jpeg' ELSE 'video/mp4' END AS mime,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST((16 + doc_id % 32) * (16 + (doc_id * 7) % 32) AS BIGINT) AS n_pixels,
           ROUND(CAST(16 + doc_id % 32 AS DOUBLE)
                 / CAST(16 + (doc_id * 7) % 32 AS DOUBLE), 4) AS aspect
    FROM documents
    """,
    tags=("multimodal", "metadata"),
)
def multimodal_media_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure-JVM media metadata pass (operators/multimodal.media_stats): byte
    sizes, pixel counts, aspect ratios — the cheap pre-filter every media
    pipeline runs BEFORE any decode stage touches Python. Fully
    oracle-checked because no codec is involved."""
    from pumle_spark.operators.multimodal import media_stats

    m = media_stats(_media_table(spark, sf_dir))
    return m.select(
        "media_id",
        "mime",
        "n_bytes",
        F.col("n_pixels").cast("bigint").alias("n_pixels"),
        "aspect",
    )


@register(
    "multimodal_feature_rollup",
    sql=None,  # fake-codec decode is Python-side by design → rows-only check
    tags=("multimodal", "features", "rows-only"),
)
def multimodal_feature_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fake-codec feature extraction + per-mime rollup: decode every media
    payload through the Arrow-batched mapInPandas kernel (deterministic
    md5-seeded fake pixels — the container has no codec; plumbing is the
    real pattern), pool a 16-dim feature, then aggregate per mime type.
    Deterministic across runs/executors, so the driver's rows+schema check
    is stable."""
    from pumle_spark.operators.multimodal import image_features

    media = _media_table(spark, sf_dir)
    feats = image_features(media, dim=16, allow_fake=True)
    return (
        feats.join(media.select("media_id", "mime"), "media_id")
        .select(
            "mime",
            "decode_ok",
            F.round(F.element_at("feat", 1).cast("double"), 4).alias("f0"),
            F.round(
                F.aggregate(
                    F.transform("feat", lambda x: x.cast("double") * x.cast("double")),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                4,
            ).alias("feat_sq_norm"),
        )
        .groupBy("mime")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.sum(F.when(F.col("decode_ok"), 1).otherwise(0)).cast("bigint").alias("n_real_decodes"),
            F.round(F.avg("f0"), 4).alias("avg_f0"),
            F.round(F.avg("feat_sq_norm"), 4).alias("avg_feat_sq_norm"),
        )
    )
