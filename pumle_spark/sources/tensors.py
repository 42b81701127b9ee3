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


def read_zarr_tensors(spark: SparkSession, glob: str) -> DataFrame:
    """S6: zarr variant — gated on the zarr package (not in this container;
    chunk files would parallelize naturally via binaryFile over the chunk
    glob)."""
    try:
        import zarr  # noqa: F401
    except ImportError as exc:  # pragma: no cover - env-dependent
        raise NotImplementedError(
            "zarr is not installed in this environment; use read_npy_tensors "
            "or the Parquet golden store"
        ) from exc
    raise NotImplementedError("zarr scan: implement chunk-glob reader when zarr is present")
