"""M3 export sinks: tensor F-order/NaN parity, tabular row-set, metadata
flatten (SURVEY §5.2 item 2)."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
import pytest

from pumle_spark.exports import export_tensors, flatten_metadata, tabular
from pumle_spark.ingest import ingest_golden
from tests.fixtures import CASE, DIMS, make_bronze, numpy_golden_oracle

N_T = 3


@pytest.fixture(scope="module")
def golden(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("bronze_exp")
    sims = make_bronze(root, n_sims=2, n_t=N_T, seed=11)
    df = ingest_golden(
        spark,
        states_glob=str(root / f"states_{CASE}_*.json"),
        actnum_glob=str(root / f"grdecl_{CASE}_*.json"),
        dims_path=str(root / f"g_{CASE}.json"),
    ).cache()
    return df, sims


def test_tensor_export_bitwise_matches_reference_consolidation(spark, golden, tmp_path):
    df, sims = golden
    out = str(tmp_path / "tensors")
    manifest = export_tensors(df, DIMS, "pressure", out, fmt="npy").collect()
    oracle = numpy_golden_oracle(sims, N_T)
    assert len(manifest) == len(sims)
    for m in manifest:
        got = np.load(m.path)
        want = oracle[m.sim_hash]["pressure"].reshape((*DIMS, N_T), order="F")
        assert got.shape == want.shape
        # NaN-equal elementwise comparison (np.allclose with equal_nan)
        assert np.allclose(got, want, rtol=0, atol=0, equal_nan=True)


def test_tabular_matches_reference_rowset(golden):
    df, sims = golden
    tab = tabular(df, "sg").collect()
    oracle = numpy_golden_oracle(sims, N_T)
    want = set()
    ni, nj, _ = DIMS
    for h, arrs in oracle.items():
        sg = arrs["sg"]
        nz = np.argwhere(~np.isnan(sg) & (sg != 0))
        for cell_id, t in nz:
            i = cell_id % ni
            j = (cell_id // ni) % nj
            k = cell_id // (ni * nj)
            want.add((h, int(t), int(i), int(j), int(k), round(float(sg[cell_id, t]), 9)))
    got = {(r.simulation, r.timestamp, r.x, r.y, r.z, round(r["values"], 9)) for r in tab}
    assert got == want


def test_metadata_flatten_naming_and_constants(spark):
    configs = spark.createDataFrame(
        [("h1", 1, 35.0, 0.11)], "sim_hash string, sim_id int, pres_ref double, srw double"
    )
    md = flatten_metadata(
        configs,
        {"Fluid": ["pres_ref", "srw"]},
        dims=DIMS,
        timestamps=N_T,
    )
    assert md.columns == [
        "sim_hash",
        "sim_id",
        "fluid__pres_ref",
        "fluid__srw",
        "dimension_x",
        "dimension_y",
        "dimension_z",
        "timestamps",
    ]
    row = md.collect()[0]
    assert (row.dimension_x, row.dimension_y, row.dimension_z) == DIMS
    assert row.sim_id == "1"  # stringified for the regex check (metadata.py:32)


def test_tabular_excludes_nulls_and_zeros(spark):
    g = spark.createDataFrame(
        [("h", 0, 0, 0, 0, 0, None), ("h", 0, 1, 1, 0, 0, 0.0), ("h", 0, 2, 2, 0, 0, 0.5)],
        "sim_hash string, t int, cell_id long, i int, j int, k int, sg double",
    )
    rows = tabular(g, "sg").collect()
    assert len(rows) == 1 and rows[0]["values"] == 0.5
