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


# the 16-dim feature is [m0,m1,m2,s0,s1,s2] tiled to 16 entries; the squared
# norm folds the (float32-truncated) components in array order, so the SQL
# reproduces the exact left-associated addition chain
_TILE = ([0, 1, 2, 3, 4, 5] * 3)[:16]
_SQ_CHAIN = " + ".join(f"d{i}*d{i}" for i in _TILE)

_FEATURE_ROLLUP_SQL = f"""
WITH m AS (
  SELECT doc_id AS media_id,
         CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image/png'
              WHEN 1 THEN 'image/jpeg' ELSE 'video/mp4' END AS mime,
         md5(text) AS key,
         CAST(16 + doc_id % 32 AS BIGINT) * CAST(16 + (doc_id * 7) % 32 AS BIGINT) * 3
           AS n_px
  FROM documents
),
px AS (  -- fake codec in SQL: pixel i = byte (i % 16) of md5(key || '_' || i // 16)
  SELECT m.media_id, m.mime, g.i % 3 AS c,
         CAST(('0x' || substr(md5(m.key || '_' || CAST(g.i // 16 AS VARCHAR)),
                              CAST(2 * (g.i % 16) + 1 AS INTEGER), 2))::UBIGINT AS BIGINT)
           AS val
  FROM m CROSS JOIN generate_series(0, 47 * 47 * 3 - 1) AS g(i)  -- max w,h = 47
  WHERE g.i < m.n_px
),
chan AS (
  SELECT media_id, mime, c,
         SUM(val) AS s1, SUM(val * val) AS s2, COUNT(*) AS n
  FROM px GROUP BY 1, 2, 3
),
pooled AS (
  SELECT media_id, mime,
         MAX(CASE WHEN c = 0 THEN CAST(s1 AS DOUBLE) / n END) AS m0,
         MAX(CASE WHEN c = 1 THEN CAST(s1 AS DOUBLE) / n END) AS m1,
         MAX(CASE WHEN c = 2 THEN CAST(s1 AS DOUBLE) / n END) AS m2,
         MAX(CASE WHEN c = 0 THEN CAST(s2 AS DOUBLE) / n END) AS q0,
         MAX(CASE WHEN c = 1 THEN CAST(s2 AS DOUBLE) / n END) AS q1,
         MAX(CASE WHEN c = 2 THEN CAST(s2 AS DOUBLE) / n END) AS q2
  FROM chan GROUP BY 1, 2
),
f32 AS (  -- float32 truncation exactly where the Python kernel truncates
  SELECT media_id, mime,
         CAST(CAST(m0 AS FLOAT) AS DOUBLE) AS d0,
         CAST(CAST(m1 AS FLOAT) AS DOUBLE) AS d1,
         CAST(CAST(m2 AS FLOAT) AS DOUBLE) AS d2,
         CAST(CAST(sqrt(GREATEST(0.0, q0 - m0 * m0)) AS FLOAT) AS DOUBLE) AS d3,
         CAST(CAST(sqrt(GREATEST(0.0, q1 - m1 * m1)) AS FLOAT) AS DOUBLE) AS d4,
         CAST(CAST(sqrt(GREATEST(0.0, q2 - m2 * m2)) AS FLOAT) AS DOUBLE) AS d5
  FROM pooled
),
per_media AS (
  SELECT mime,
         ROUND(d0, 4) AS f0,
         ROUND({_SQ_CHAIN}, 4) AS feat_sq_norm
  FROM f32
)
SELECT mime,
       COUNT(*) AS n_media,
       CAST(0 AS BIGINT) AS n_real_decodes,
       ROUND(AVG(f0), 4) AS avg_f0,
       ROUND(AVG(feat_sq_norm), 4) AS avg_feat_sq_norm
FROM per_media
GROUP BY mime
"""


@register(
    "multimodal_feature_rollup",
    sql=_FEATURE_ROLLUP_SQL,
    tags=("multimodal", "features"),
)
def multimodal_feature_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fake-codec feature extraction + per-mime rollup: decode every media
    payload through the Arrow-batched mapInPandas kernel (deterministic
    md5-counter fake pixels — the container has no codec; plumbing is the
    real pattern), pool a 16-dim feature, then aggregate per mime type.

    Fully oracle-checked: the fake codec is pure md5 arithmetic and the
    pooling uses exact-integer channel sums, so the DuckDB SQL reproduces
    every pixel byte and every IEEE-double expression bit-identically (the
    same trick ann_lsh_codes uses for md5-derived hyperplanes). The oracle
    pins n_real_decodes = 0 — true whenever the real codec is absent, which
    is exactly the environment the fake path exists for."""
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
