"""Multimodal column support: image/audio/video as opaque binary columns
with typed metadata (driver north-star component).

Design: a media table is
    (media_id BIGINT, content BINARY, mime STRING, meta STRUCT<...>)
Binary payloads ride Parquet/Arrow untouched; all decode / feature-extract
/ resize / frame-sample operators are Arrow-batched ``mapInPandas`` stages
so the bytes cross the JVM↔Python boundary exactly once per batch.

The actual codecs (PIL/opencv/ffmpeg) are NOT in this container, so the
decode kernels are STUBBED behind ``_decode_image_real`` raising
NotImplementedError, with a deterministic fake (content-hash-derived) used
when ``allow_fake=True`` — the Spark-side plumbing (schemas, batch
iteration, partitioning) is real and tested either way.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

MEDIA_SCHEMA = "media_id bigint, content binary, mime string, width int, height int"

IMAGE_FEATURE_SCHEMA = "media_id bigint, feat array<float>, decode_ok boolean"
THUMBNAIL_SCHEMA = "media_id bigint, thumb binary, thumb_w int, thumb_h int"
FRAME_SAMPLE_SCHEMA = "media_id bigint, frame_idx int, frame binary"


def _decode_image_real(content: bytes) -> np.ndarray:
    """Real decode path — requires an image codec library.

    On a production cluster this is `PIL.Image.open(io.BytesIO(content))`;
    this container ships no codec, so the stub raises and callers fall back
    to the deterministic fake when allowed.
    """
    raise NotImplementedError("image codec not available in this environment")


_FAKE_BLOCK_SUFFIXES: list[bytes] = []


def _fake_pixels(content: bytes, w: int, h: int) -> np.ndarray:
    """Deterministic stand-in 'decoded image': pixels derived from the
    content digest in counter mode — stable across runs/executors,
    shape-correct, and (deliberately) pure hash arithmetic so a SQL oracle
    can reproduce every byte: pixel i of the flattened (h, w, 3) C-order
    array is byte (i % 16) of md5(hexdigest(content) + '_' + str(i // 16))."""
    key = hashlib.md5(content).hexdigest()
    n = h * w * 3
    n_blocks = (n + 15) // 16
    # the "_<b>" suffixes are shared by every image (counter mode starts at
    # 0); cache their utf-8 bytes so the per-block work is one md5 over a
    # concatenation, not an f-string format + encode (measured ~35% of the
    # kernel's CPU at sf0.1 before caching)
    while len(_FAKE_BLOCK_SUFFIXES) < n_blocks:
        _FAKE_BLOCK_SUFFIXES.append(f"_{len(_FAKE_BLOCK_SUFFIXES)}".encode())
    kb = key.encode()
    md5 = hashlib.md5
    raw = b"".join(md5(kb + s).digest() for s in _FAKE_BLOCK_SUFFIXES[:n_blocks])
    return np.frombuffer(raw[:n], dtype=np.uint8).reshape(h, w, 3).copy()


def image_features(media: DataFrame, dim: int = 16, allow_fake: bool = True) -> DataFrame:
    """Decode + global feature vector per image (mean/std pooled channels →
    `dim` floats). mapInPandas: one Arrow batch in, one out."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, oks = [], []
            for content, w, h in zip(pdf["content"], pdf["width"], pdf["height"]):
                try:
                    px = _decode_image_real(bytes(content))
                    ok = True
                except NotImplementedError:
                    if not allow_fake:
                        raise
                    px = _fake_pixels(bytes(content), int(w), int(h))
                    ok = False
                # exact-integer pooling: channel sums and sum-of-squares are
                # exact int64, so mean = s1/n and std = sqrt(s2/n - mean²)
                # are single IEEE-double expressions — bit-identical when a
                # SQL engine evaluates the same expression on the same ints
                # (np.mean/np.std pairwise summation would not be)
                flat = px.reshape(-1, 3).astype(np.int64)
                n = flat.shape[0]
                s1 = flat.sum(axis=0).tolist()
                s2 = (flat * flat).sum(axis=0).tolist()
                means = [s / n for s in s1]
                stds = [
                    math.sqrt(max(0.0, q / n - m * m)) for q, m in zip(s2, means)
                ]
                pooled = np.array(means + stds, dtype=np.float64)
                reps = int(np.ceil(dim / pooled.size))
                feats.append(np.tile(pooled, reps)[:dim].astype(np.float32).tolist())
                oks.append(ok)
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "feat": feats, "decode_ok": oks}
            )

    return media.select("media_id", "content", "width", "height").mapInPandas(
        run, schema=IMAGE_FEATURE_SCHEMA
    )


def thumbnails(media: DataFrame, max_side: int = 8, allow_fake: bool = True) -> DataFrame:
    """Resize path: decode → downscale (stride sampling) → re-encode (raw
    bytes here; a real deployment plugs an encoder into the same kernel)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_b, out_w, out_h = [], [], []
            for content, w, h in zip(pdf["content"], pdf["width"], pdf["height"]):
                try:
                    px = _decode_image_real(bytes(content))
                except NotImplementedError:
                    if not allow_fake:
                        raise
                    px = _fake_pixels(bytes(content), int(w), int(h))
                sy = max(1, px.shape[0] // max_side)
                sx = max(1, px.shape[1] // max_side)
                small = px[::sy, ::sx]
                out_b.append(small.tobytes())
                out_h.append(small.shape[0])
                out_w.append(small.shape[1])
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "thumb": out_b, "thumb_w": out_w, "thumb_h": out_h}
            )

    return media.select("media_id", "content", "width", "height").mapInPandas(
        run, schema=THUMBNAIL_SCHEMA
    )


def sample_frames(media: DataFrame, every_n: int = 10, max_frames: int = 4) -> DataFrame:
    """Video frame sampling plumbing: emits (media_id, frame_idx, frame).

    The decoder is stubbed (content sliced into fake 'frames'); the shape —
    one input row fanning out to multiple output rows inside mapInPandas —
    is the real pattern a video pipeline needs.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "frame_idx": [], "frame": []}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                data = bytes(content)
                n = min(max_frames, max(1, len(data) // max(every_n, 1)))
                step = max(1, len(data) // max(n, 1))
                for i in range(n):
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(i)
                    rows["frame"].append(data[i * step : i * step + step])
            yield pd.DataFrame(rows)

    return media.select("media_id", "content").mapInPandas(run, schema=FRAME_SAMPLE_SCHEMA)


def media_stats(media: DataFrame) -> DataFrame:
    """Pure-JVM metadata pass: sizes and aspect ratios without touching
    Python — the cheap pre-filter before any decode stage."""
    return media.select(
        "media_id",
        "mime",
        F.length("content").alias("n_bytes"),
        (F.col("width") * F.col("height")).alias("n_pixels"),
        F.round(F.col("width") / F.col("height"), 4).alias("aspect"),
    )
