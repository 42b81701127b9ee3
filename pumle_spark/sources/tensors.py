"""Dense-tensor scans (S5 .npy, S6 zarr) — the inverse of exports.py.

The reference reloads golden tensors with np.load / zarr.open in a Python
loop (tabular.py:74-98). Here .npy files are a DataFrame source: binaryFile
scan → Arrow-batched mapInPandas parsing each payload with NumPy → long
rows (sim_hash, t, cell_id, value), F-order semantics preserved. The
preferred native path remains Parquet golden; these scans exist for
round-tripping externally produced tensors into the engine.

Scale: one file = one task; the melt to long form happens executor-side per
file, so a directory of per-sim tensors parallelizes across the cluster.
"""

from __future__ import annotations

import io
import os
import re
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

NPY_LONG_SCHEMA = "sim_hash string, t int, cell_id bigint, value double"

_HASH_FROM_NPY = re.compile(r"_([0-9a-f]{8})\.npy$")


def read_npy_tensors(spark: SparkSession, glob: str) -> DataFrame:
    """S5: scan {attr}_{hash}.npy 4D tensors → long (sim_hash, t, cell_id,
    value) with NaN→NULL (inactive cells), exactly undoing exports.py's
    F-order consolidation."""
    files = spark.read.format("binaryFile").load(glob)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path, content in zip(pdf["path"], pdf["content"]):
                m = _HASH_FROM_NPY.search(path)
                sim_hash = m.group(1) if m else path.rsplit("/", 1)[-1]
                tensor = np.load(io.BytesIO(bytes(content)))
                if tensor.ndim != 4:
                    raise ValueError(f"{path}: expected 4D (i,j,k,t), got {tensor.shape}")
                ni, nj, nk, nt = tensor.shape
                # F-order flatten of (i,j,k) restores cell_id order
                flat = tensor.reshape((ni * nj * nk, nt), order="F")
                cells = np.arange(ni * nj * nk, dtype=np.int64)
                out = pd.DataFrame(
                    {
                        "sim_hash": np.repeat(sim_hash, flat.size),
                        "t": np.tile(np.arange(nt, dtype=np.int32), ni * nj * nk),
                        "cell_id": np.repeat(cells, nt),
                        "value": flat.ravel(order="C"),
                    }
                )
                out.loc[np.isnan(out["value"]), "value"] = None
                yield out

    return files.select("path", "content").mapInPandas(parse, schema=NPY_LONG_SCHEMA)


_HASH_FROM_ZARR = re.compile(r"_([0-9a-f]{8})\.zarr$")

_SUPPORTED_COMPRESSORS = (None, "zlib", "gzip")


def read_zarr_tensors(spark: SparkSession, glob: str) -> DataFrame:
    """S6: scan zarr-v2 directory stores ({attr}_{hash}.zarr) → long
    (sim_hash, t, cell_id, value), the zarr twin of read_npy_tensors and the
    inverse of exports.write_zarr_v2 (reference: arrays.py:171-197 write,
    tabular.py:84 read-back).

    Pure-Python v2 protocol — no zarr dependency: `.zarray` JSON metadata is
    parsed driver-side during store discovery (metadata is dim-sized and
    Spark's file listing skips dotfiles anyway), then the CHUNK files fan
    out through a binaryFile scan + Arrow-batched decode — one task per
    chunk, so a store chunked along t parallelizes across the cluster.
    Supports raw/zlib/gzip chunk compression, C or F chunk order, and
    edge-chunk truncation per the v2 spec; blosc et al. raise cleanly.
    """
    import glob as globmod
    import json

    stores = sorted(
        d for d in globmod.glob(glob) if os.path.isfile(os.path.join(d, ".zarray"))
    )
    if not stores:
        raise FileNotFoundError(f"no zarr-v2 stores (dirs with .zarray) match {glob!r}")

    metas: dict[str, dict] = {}
    for store in stores:
        with open(os.path.join(store, ".zarray")) as fh:
            z = json.load(fh)
        if z.get("zarr_format") != 2:
            raise ValueError(f"{store}: only zarr v2 supported, got {z.get('zarr_format')}")
        comp = (z.get("compressor") or {}).get("id") if z.get("compressor") else None
        if comp not in _SUPPORTED_COMPRESSORS:
            raise ValueError(f"{store}: unsupported compressor {comp!r} (need raw/zlib/gzip)")
        if z.get("filters"):
            raise ValueError(f"{store}: zarr filters not supported")
        if len(z["shape"]) != 4:
            raise ValueError(f"{store}: expected 4D (i,j,k,t), got shape {z['shape']}")
        m = _HASH_FROM_ZARR.search(store)
        metas[os.path.abspath(store)] = {
            "sim_hash": m.group(1) if m else os.path.basename(store),
            "shape": tuple(z["shape"]),
            "chunks": tuple(z["chunks"]),
            "dtype": z["dtype"],
            "order": z.get("order", "C"),
            "comp": comp,
        }

    files = spark.read.format("binaryFile").load([f"{s}/*" for s in metas])

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import zlib

        for pdf in batches:
            for path, content in zip(pdf["path"], pdf["content"]):
                local = path[len("file:") :] if path.startswith("file:") else path
                store_dir, chunk_name = os.path.split(local)
                meta = metas[os.path.abspath(store_dir)]
                idx = tuple(int(x) for x in chunk_name.split("."))
                shape, chunks = meta["shape"], meta["chunks"]
                ni, nj, nk, _ = shape
                raw = bytes(content)
                if meta["comp"] in ("zlib", "gzip"):
                    raw = zlib.decompress(raw, zlib.MAX_WBITS | 32 if meta["comp"] == "gzip" else zlib.MAX_WBITS)
                block = np.frombuffer(raw, dtype=np.dtype(meta["dtype"])).reshape(
                    chunks, order=meta["order"]
                )
                # edge chunks: drop padding beyond the array bounds
                off = [idx[d] * chunks[d] for d in range(4)]
                n = [min(chunks[d], shape[d] - off[d]) for d in range(4)]
                block = block[: n[0], : n[1], : n[2], : n[3]]
                # F-order cell ids for the chunk's (i,j,k) extent
                ii = np.arange(off[0], off[0] + n[0], dtype=np.int64)
                jj = np.arange(off[1], off[1] + n[1], dtype=np.int64)
                kk = np.arange(off[2], off[2] + n[2], dtype=np.int64)
                cells = (
                    ii[:, None, None] + ni * jj[None, :, None] + ni * nj * kk[None, None, :]
                ).ravel(order="F")
                flat = block.reshape((n[0] * n[1] * n[2], n[3]), order="F")
                out = pd.DataFrame(
                    {
                        "sim_hash": np.repeat(meta["sim_hash"], flat.size),
                        "t": np.tile(np.arange(off[3], off[3] + n[3], dtype=np.int32), len(cells)),
                        "cell_id": np.repeat(cells, n[3]),
                        "value": flat.astype(np.float64).ravel(order="C"),
                    }
                )
                out.loc[np.isnan(out["value"]), "value"] = None
                yield out

    return files.select("path", "content").mapInPandas(parse, schema=NPY_LONG_SCHEMA)
