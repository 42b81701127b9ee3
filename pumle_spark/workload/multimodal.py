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
from pyspark.sql import DataFrame, SparkSession, Window

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
    # repartition before the codec-bound kernel: the r08 oracle-able fake
    # codec is ~415 md5 blocks per row of Python CPU, so the single
    # byte-sized input split under-parallelized it (the pHash /
    # winnow_fp_array lesson — measured 1.67s -> sub-second at sf0.1)
    feats = image_features(
        media.repartition(spark.sparkContext.defaultParallelism),
        dim=16,
        allow_fake=True,
    )
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


@register(
    "multimodal_frame_sample",
    sql="""
    WITH m AS (SELECT doc_id AS media_id, text, length(text) AS len FROM documents),
    p AS (SELECT media_id, text, len,
                 LEAST(4, GREATEST(1, len // 10)) AS n
          FROM m),
    q AS (SELECT media_id, text, len, n, GREATEST(1, len // n) AS step FROM p),
    f AS (SELECT media_id, i AS frame_idx,
                 substring(text, i * step + 1, step) AS frame
          FROM q, generate_series(0, 3) t(i) WHERE i < n)
    SELECT media_id,
           CAST(frame_idx AS INTEGER) AS frame_idx,
           CAST(length(frame) AS BIGINT) AS frame_len,
           md5(frame) AS frame_md5
    FROM f
    """,
    tags=("multimodal", "frame-sample", "python-interop"),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plumbing under the driver's hash gate: the
    Arrow-batched one-row-to-many mapInPandas fan-out
    (operators/multimodal.sample_frames — stride-sliced fake frames, since
    the container ships no video codec) with each emitted frame audited by
    byte length and md5. The oracle re-derives the identical slicing in
    SQL; character positions equal byte positions because the synthetic
    corpus is pure ASCII (asserted: octet_length == length corpus-wide),
    so DuckDB's VARCHAR md5 hashes the same bytes Spark's binary md5 sees.

    This closes the fourth multimodal verb (decode / feature-extract /
    resize / frame-sample) as a driver-checked row; the fan-out ratio is
    bounded (<= 4 frames/row), so the Arrow batch shape is stable at any
    corpus size."""
    from pumle_spark.operators.multimodal import sample_frames

    frames = sample_frames(_media_table(spark, sf_dir), every_n=10, max_frames=4)
    return frames.select(
        "media_id",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        F.length("frame").cast("bigint").alias("frame_len"),
        F.md5("frame").alias("frame_md5"),
    )


# --------------------------------------------------------------------------
# training-shard manifest (WebDataset-style packing of media blobs)
# --------------------------------------------------------------------------

_SHARD_BYTES = 4096


@register(
    "multimodal_shard_manifest",
    sql=f"""
    WITH m AS (
      SELECT doc_id AS media_id,
             CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image/png'
                  WHEN 1 THEN 'image/jpeg' ELSE 'video/mp4' END AS mime,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
      FROM documents
    ),
    placed AS (
      SELECT media_id, mime, n_bytes,
             CAST((GREATEST(SUM(n_bytes) OVER (PARTITION BY mime ORDER BY media_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1, 0))
                  // {_SHARD_BYTES} AS BIGINT) AS shard_id
      FROM m
    )
    SELECT mime, shard_id,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(n_bytes) AS BIGINT) AS shard_bytes,
           CAST(MIN(media_id) AS BIGINT) AS min_media_id,
           CAST(MAX(media_id) AS BIGINT) AS max_media_id,
           md5(string_agg(CAST(media_id AS VARCHAR), ',' ORDER BY media_id))
             AS member_checksum
    FROM placed
    GROUP BY mime, shard_id
    ORDER BY mime, shard_id
    """,
    tags=("multimodal", "sharding", "manifest", "training-infra"),
)
def multimodal_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset-style shard manifest: pack each modality's media blobs,
    in deterministic media_id order, into ~{_SHARD_BYTES}-byte shards by
    byte-budget prefix sum, and emit the manifest a training loader
    consumes — items, bytes, id range, and an md5 member checksum per
    shard, so a resumed or re-run packing job can PROVE it produced the
    identical sharding (the manifest hash is the contract, not the file
    listing).

    Same prefix-sum block math as pack_concat_fixed_blocks (with its
    zero-dividend GREATEST guard), applied to byte budgets per modality;
    the member checksum hashes the ordered id list via the sort_array
    struct-fold idiom (events_session_paths) so it never depends on
    collect order. A shard can exceed the budget only by its last item
    (split-forbidden packing — blobs are atomic).

    Scale: one shuffle per modality partition for the window, one for
    the rollup; manifests are tiny. The blobs themselves are never
    moved — this plans the layout; the writer streams bytes per shard.
    """
    m = _media_table(spark, sf_dir).select(
        "media_id", "mime", F.octet_length("content").cast("bigint").alias("n_bytes")
    )
    w = (
        Window.partitionBy("mime")
        .orderBy("media_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    placed = m.withColumn(
        "shard_id",
        F.floor(
            F.greatest(F.sum("n_bytes").over(w) - 1, F.lit(0)) / _SHARD_BYTES
        ).cast("bigint"),
    )
    return (
        placed.groupBy("mime", "shard_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            F.sum("n_bytes").cast("bigint").alias("shard_bytes"),
            F.min("media_id").cast("bigint").alias("min_media_id"),
            F.max("media_id").cast("bigint").alias("max_media_id"),
            F.md5(
                F.encode(
                    F.array_join(
                        F.expr(
                            "transform(array_sort(collect_list(struct(media_id))),"
                            " s -> cast(s.media_id as string))"
                        ),
                        ",",
                    ),
                    "UTF-8",
                )
            ).alias("member_checksum"),
        )
        .orderBy("mime", "shard_id")
    )


# --------------------------------------------------------------------------
# aspect-ratio bucketing (SDXL-style batch-homogeneity assignment)
# --------------------------------------------------------------------------

# centi-aspect bucket ladder (width/height · 100): portrait → square → wide
_ASPECT_BUCKETS = (50, 75, 100, 133, 200)


@register(
    "multimodal_aspect_buckets",
    sql=f"""
    WITH m AS (
      SELECT doc_id AS media_id,
             CAST(16 + doc_id % 32 AS BIGINT) AS w,
             CAST(16 + (doc_id * 7) % 32 AS BIGINT) AS h
      FROM documents
    ),
    scored AS (
      SELECT media_id, w, h, b.b AS bucket,
             ABS(100 * w - b.b * h) AS dist,
             ROW_NUMBER() OVER (PARTITION BY media_id
                                ORDER BY ABS(100 * w - b.b * h), b.b) AS rn
      FROM m CROSS JOIN (VALUES {", ".join(f"({b})" for b in _ASPECT_BUCKETS)}) b(b)
    ),
    placed AS (
      SELECT media_id, w, h, CAST(bucket AS INTEGER) AS bucket,
             CASE WHEN 100 * w >= bucket * h
                  THEN CAST(100 * w - bucket * h AS DOUBLE) / (100 * w)
                  ELSE CAST(bucket * h - 100 * w AS DOUBLE) / (bucket * h)
             END AS pad_waste
      FROM scored WHERE rn = 1
    )
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           ROUND(CAST(SUM(CAST(pad_waste AS DECIMAL(28,9))) AS DOUBLE)
                 / COUNT(*), 6) AS mean_pad_waste,
           ROUND(MAX(pad_waste), 6) AS max_pad_waste
    FROM placed GROUP BY bucket
    ORDER BY bucket
    """,
    tags=("multimodal", "aspect-bucketing", "training-infra"),
)
def multimodal_aspect_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-ratio bucketing for batch homogeneity (the SDXL training
    recipe): every image is assigned to the nearest bucket of the fixed
    aspect ladder {_ASPECT_BUCKETS} (centi-aspect), and the report scores
    each bucket's fill and padding waste — the fraction of pixels a
    crop/pad to the bucket shape would discard, i.e. the price of batch
    uniformity the ladder designer is trading against.

    No floating-point geometry: nearest bucket minimizes |100·w − b·h| —
    every candidate shares the denominator 100·h, so the comparison is
    pure integers with the smaller bucket as tie-break — and the waste
    ratio is one double division of exact integers, pooled under the
    DECIMAL(28,9) exact-sum contract.

    Scale: a per-row map against a {len(_ASPECT_BUCKETS)}-entry constant
    ladder (codegen'd CASE, no join needed for the sizes the plan shows),
    then a ladder-sized rollup. The Arrow decode stage never runs —
    bucketing needs only metadata, which is the point of keeping width/
    height as typed columns beside the opaque binary.
    """
    m = _media_table(spark, sf_dir).select(
        "media_id",
        F.col("width").cast("bigint").alias("w"),
        F.col("height").cast("bigint").alias("h"),
    )
    ladder = F.explode(F.array(*[F.lit(b) for b in _ASPECT_BUCKETS])).alias("bucket")
    scored = m.select("media_id", "w", "h", ladder).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("media_id").orderBy(
                F.abs(100 * F.col("w") - F.col("bucket") * F.col("h")), F.col("bucket")
            )
        ),
    )
    wide = 100 * F.col("w") >= F.col("bucket") * F.col("h")
    pad = F.when(
        wide,
        (100 * F.col("w") - F.col("bucket") * F.col("h")).cast("double")
        / (100 * F.col("w")),
    ).otherwise(
        (F.col("bucket") * F.col("h") - 100 * F.col("w")).cast("double")
        / (F.col("bucket") * F.col("h"))
    )
    placed = scored.filter(F.col("rn") == 1).select(
        F.col("bucket").cast("int").alias("bucket"), pad.alias("pad_waste")
    )
    return (
        placed.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            F.round(
                F.sum(F.col("pad_waste").cast("decimal(28,9)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_pad_waste"),
            F.round(F.max("pad_waste"), 6).alias("max_pad_waste"),
        )
        .orderBy("bucket")
    )


_PH_MAXH = 3  # Hamming radius for near-dup media pairs (4-block pigeonhole)


@register(
    "multimodal_phash_neardup",
    sql=f"""
    WITH d AS (SELECT doc_id AS media_id, hex(encode(text)) AS hx FROM documents),
    grams AS (
      SELECT DISTINCT media_id, substr(hx, p, 8) AS g
      FROM (SELECT media_id, hx, unnest(range(1, length(hx) - 6, 4)) AS p
            FROM d WHERE length(hx) >= 8)
    ),
    bits AS (
      SELECT media_id, b.bit,
             SUM(CASE WHEN b.bit < 32
                  THEN CASE WHEN ((('0x' || substr(md5(g), 1, 8))::UBIGINT >> b.bit) & 1) = 1
                            THEN 1 ELSE -1 END
                  ELSE CASE WHEN ((('0x' || substr(md5(g), 9, 8))::UBIGINT >> (b.bit - 32)) & 1) = 1
                            THEN 1 ELSE -1 END END) AS w
      FROM grams CROSS JOIN generate_series(0, 63) b(bit)
      GROUP BY 1, 2
    ),
    sig AS (
      SELECT media_id,
             CAST(SUM(CASE WHEN w > 0 THEN
                    CASE WHEN bit = 63 THEN -9223372036854775807 - 1
                         ELSE (1::BIGINT << bit) END
                  ELSE 0 END) AS BIGINT) AS sig
      FROM bits GROUP BY 1
    )
    SELECT a.media_id AS media_id_a, b.media_id AS media_id_b,
           CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
    FROM sig a JOIN sig b ON a.media_id < b.media_id
    WHERE bit_count(xor(a.sig, b.sig)) <= {_PH_MAXH}
    ORDER BY media_id_a, media_id_b
    """,
    tags=("multimodal", "dedup", "phash"),
)
def multimodal_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-duplicate detection over the media corpus: a
    64-bit content signature per media blob, then all pairs within Hamming
    distance {_PH_MAXH} via pigeonhole block joins — the image-dedup
    counterpart of dedup_simhash32 for a multimodal training set.

    Honest-stub contract (module docstring): a REAL pHash is a DCT over
    decoded pixels and needs codecs this container doesn't ship; the
    deterministic stand-in is a SimHash over the blob's 4-byte grams
    (stride 2 bytes over the hex encoding), which preserves exactly the
    property the Spark-side plumbing must handle — near-identical bytes →
    near-identical signatures. The signature fold, the 4-block pigeonhole
    retrieval (operators.dedup.hamming_pairs: any pair within distance
    {_PH_MAXH} agrees on >= 1 of 4 blocks), and the exact popcount verify
    are the production components; swapping the kernel for a codec-backed
    DCT changes one projection.

    The DuckDB oracle is the ALL-PAIRS join — so the hash comparison
    genuinely verifies the pigeonhole blocking loses no pair. Scale: the
    signature is one map pass (per-row gram fold, zero exchanges, the
    dedup_simhash32 idiom); retrieval joins on (block, 16-bit value)
    buckets, cost Σ_bucket c² instead of n²."""
    from pumle_spark.operators.dedup import hamming_pairs

    # repartition before the hash-heavy signature map: 64 bit-folds over
    # ~len/2 gram hashes per row is CPU-bound per byte, so byte-sized input
    # splits under-parallelize it (the winnow_fp_array lesson)
    media = (
        _media_table(spark, sf_dir)
        .repartition(spark.sparkContext.defaultParallelism)
        .select("media_id", F.hex("content").alias("hx"))
    )
    hs = media.filter(F.length("hx") >= 8).select(
        F.col("media_id").alias("key"),
        F.expr(
            "transform(array_distinct(transform(sequence(1, length(hx) - 7, 4), "
            "p -> substr(hx, p, 8))), "
            "g -> struct(cast(conv(substring(md5(g), 1, 8), 16, 10) as bigint) AS lo, "
            "cast(conv(substring(md5(g), 9, 8), 16, 10) as bigint) AS hi))"
        ).alias("hs"),
    )
    bit_terms = " + ".join(
        (
            f"(CASE WHEN aggregate(hs, 0L, (acc, x) -> acc + "
            f"(shiftright(x.{'lo' if j < 32 else 'hi'}, {j if j < 32 else j - 32}) & 1) * 2 - 1) > 0 "
            f"THEN shiftleft(1L, {j}) ELSE 0L END)"
        )
        for j in range(64)
    )
    sig = hs.select("key", F.expr(bit_terms).cast("bigint").alias("simhash"))
    return (
        hamming_pairs(sig, max_distance=_PH_MAXH)
        .select(
            F.col("key_a").alias("media_id_a"),
            F.col("key_b").alias("media_id_b"),
            "hamming",
        )
        .orderBy("media_id_a", "media_id_b")
    )
