"""Export sinks (M3 / SURVEY §2.2, §2.8): tabular CSV, flattened metadata,
dense-tensor .npy / zarr.

Design stance (SURVEY §7.0): the LONG golden DataFrame is canonical; dense
(i, j, k, t) tensors exist only at the export boundary. Tensorization is an
``applyInPandas`` per sim_hash group — each simulation's tensor is built on
an executor (never the driver) with the exact reference semantics:
Fortran-order reshape, NaN at inactive cells (arrays.py:88-147).

The reference's tabular exporter loops (sim, t) with pd.concat in a loop —
O(n²) (tabular.py:131-135) — and its melt step disappears entirely here
because the canonical layout already IS the melted form (SURVEY §2.8 R2).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# --------------------------------------------------------------------------
# R2 → K4: tabular CSV export
# --------------------------------------------------------------------------


def tabular(golden: DataFrame, attr: str) -> DataFrame:
    """(simulation, timestamp, x, y, z, values) of nonzero cells for one
    attribute (tabular.py:117-135, 161) — a select+filter on the long form;
    the reference's 5D melt is gone by construction."""
    return (
        golden.select(
            F.col("sim_hash").alias("simulation"),
            F.col("t").alias("timestamp"),
            F.col("i").alias("x"),
            F.col("j").alias("y"),
            F.col("k").alias("z"),
            F.col(attr).alias("values"),
        )
        # NaN-aware nonzero filter (P4): reference keeps nonzero, and NaN
        # (inactive) cells are not exported
        .filter(F.col("values").isNotNull() & ~F.isnan("values") & (F.col("values") != 0))
    )


def write_tabular_csv(golden: DataFrame, attr: str, path: str) -> None:
    tabular(golden, attr).write.mode("overwrite").option("header", True).csv(path)


# --------------------------------------------------------------------------
# R3/R4 → K5: metadata flatten + constant augmentation + CSV
# --------------------------------------------------------------------------


def flatten_metadata(
    configs: DataFrame,
    section_map: dict[str, list[str]],
    dims: tuple[int, int, int] | None = None,
    timestamps: int | None = None,
) -> DataFrame:
    """Flatten per-section params to `section__param` columns
    (metadata.py:119-129 naming: lower, spaces/hyphens → '_', '__' join)
    and add dims/timestamps constants (metadata.py:257-300)."""

    def norm(s: str) -> str:
        return s.lower().replace(" ", "_").replace("-", "_")

    cols = [F.col("sim_hash"), F.col("sim_id").cast("string").alias("sim_id")]
    for section, params in section_map.items():
        for p in params:
            cols.append(F.col(p).alias(f"{norm(section)}__{norm(p)}"))
    out = configs.select(*cols)
    if dims is not None:
        for name, v in zip(("dimension_x", "dimension_y", "dimension_z"), dims):
            out = out.withColumn(name, F.lit(int(v)))
    if timestamps is not None:
        out = out.withColumn("timestamps", F.lit(int(timestamps)))
    return out


def write_metadata_csv(metadata: DataFrame, path: str) -> None:
    metadata.coalesce(1).write.mode("overwrite").option("header", True).csv(path)


# --------------------------------------------------------------------------
# R1 → K2/K3: dense tensor export (npy / zarr)
# --------------------------------------------------------------------------


def _tensor_writer(out_dir: str, dims: tuple[int, int, int], attr: str, fmt: str):
    ni, nj, nk = dims

    def build(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        (sim_hash,) = key
        n_t = int(pdf["t"].max()) + 1
        # scatter into (ncells, T) with NaN placeholder, then F-order reshape
        # — bit-for-bit the reference consolidation (arrays.py:88-143, esp.
        # :138-140 order='F')
        flat = np.full((ni * nj * nk, n_t), np.nan, dtype=np.float64)
        vals = pdf[attr].to_numpy(dtype=np.float64)
        mask = ~np.isnan(vals)
        flat[pdf["cell_id"].to_numpy()[mask], pdf["t"].to_numpy()[mask]] = vals[mask]
        tensor = flat.reshape((ni, nj, nk, n_t), order="F")

        os.makedirs(out_dir, exist_ok=True)
        path = os.path.join(out_dir, f"{attr}_{sim_hash}.{ 'npy' if fmt == 'npy' else 'zarr'}")
        if fmt == "npy":
            np.save(path, tensor)  # K2 (arrays.py:149-169)
        else:  # K3 (arrays.py:171-197)
            write_zarr_v2(path, tensor)
        return pd.DataFrame({"sim_hash": [sim_hash], "path": [path], "n_t": [n_t]})

    return build


def write_zarr_v2(store_dir: str, tensor: np.ndarray, chunk_t: int = 1, zlib_level: int = 5) -> None:
    """Spec-conformant zarr-v2 directory store, written with no zarr
    dependency: `.zarray` JSON metadata + one zlib-compressed C-order chunk
    file per `chunk_t` timesteps (chunk key "0.0.0.<ct>"). Chunking along t
    means the companion scan (sources/tensors.py read_zarr_tensors)
    parallelizes one task per timestep chunk. Any standard zarr client can
    open the result (compressor {"id": "zlib"} is zarr-core)."""
    import json
    import zlib

    os.makedirs(store_dir, exist_ok=True)
    ni, nj, nk, n_t = tensor.shape
    chunks = (ni, nj, nk, chunk_t)
    meta = {
        "zarr_format": 2,
        "shape": [ni, nj, nk, n_t],
        "chunks": list(chunks),
        "dtype": tensor.dtype.str,
        "compressor": {"id": "zlib", "level": zlib_level},
        "fill_value": "NaN" if tensor.dtype.kind == "f" else 0,
        "order": "C",
        "filters": None,
    }
    with open(os.path.join(store_dir, ".zarray"), "w") as fh:
        json.dump(meta, fh)
    for ct in range((n_t + chunk_t - 1) // chunk_t):
        block = tensor[:, :, :, ct * chunk_t : (ct + 1) * chunk_t]
        if block.shape[3] < chunk_t:  # edge chunk: pad to full chunk shape
            fill = np.nan if tensor.dtype.kind == "f" else 0  # match fill_value branch
            pad = np.full((ni, nj, nk, chunk_t - block.shape[3]), fill, dtype=tensor.dtype)
            block = np.concatenate([block, pad], axis=3)
        payload = zlib.compress(np.ascontiguousarray(block).tobytes(), zlib_level)
        with open(os.path.join(store_dir, f"0.0.0.{ct}"), "wb") as fh:
            fh.write(payload)


def export_tensors(
    golden: DataFrame,
    dims: tuple[int, int, int],
    attr: str,
    out_dir: str,
    fmt: str = "npy",
) -> DataFrame:
    """K2/K3: per-sim dense (i, j, k, t) tensor written from executors via
    applyInPandas over groupBy(sim_hash).

    One simulation = one group = one tensor = one file; the shuffle is the
    groupBy on sim_hash (already the golden partition key, so with a
    partitioned source AQE elides most movement). Returns a manifest
    DataFrame (sim_hash, path, n_t).

    NaN semantics: the long form stores NULL at inactive cells; to_numpy
    maps those to NaN and the scatter skips them, leaving the prefilled NaN
    — exactly arrays.py:90-92.
    """
    manifest_schema = "sim_hash string, path string, n_t int"
    return (
        golden.select("sim_hash", "t", "cell_id", attr)
        .groupBy("sim_hash")
        .applyInPandas(_tensor_writer(out_dir, dims, attr, fmt), schema=manifest_schema)
    )
