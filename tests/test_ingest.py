"""M1 bronze→golden end-to-end vs the NumPy reference oracle
(arrays.py:56-147 semantics, SURVEY §5.2 items 1-2)."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
import pytest

from pumle_spark.ingest import ingest_golden, read_golden, write_golden
from tests.fixtures import CASE, DIMS, make_bronze, numpy_golden_oracle

N_T = 3


@pytest.fixture(scope="module")
def bronze(tmp_path_factory):
    root = tmp_path_factory.mktemp("bronze")
    sims = make_bronze(root, n_sims=2, n_t=N_T)
    return root, sims


@pytest.fixture(scope="module")
def golden(spark, bronze):
    root, sims = bronze
    df = ingest_golden(
        spark,
        states_glob=str(root / f"states_{CASE}_*.json"),
        actnum_glob=str(root / f"grdecl_{CASE}_*.json"),
        dims_path=str(root / f"g_{CASE}.json"),
    )
    return df.cache(), sims


def test_golden_is_dense_per_sim(golden):
    df, sims = golden
    ncells = DIMS[0] * DIMS[1] * DIMS[2]
    counts = {r.sim_hash: r.n for r in df.groupBy("sim_hash").agg(F.count("*").alias("n")).collect()}
    assert counts == {h: ncells * N_T for h in sims}


def test_golden_matches_numpy_oracle(golden):
    df, sims = golden
    oracle = numpy_golden_oracle(sims, N_T)
    rows = df.collect()
    for r in rows:
        exp = oracle[r.sim_hash]
        for attr in ("pressure", "sw", "sg"):
            want = exp[attr][r.cell_id, r.t]
            got = getattr(r, attr)
            if np.isnan(want):
                assert got is None, f"{attr}@cell{r.cell_id},t{r.t}: want NaN got {got}"
            else:
                assert got == pytest.approx(want, rel=0, abs=0), (
                    f"{attr}@cell{r.cell_id},t{r.t}"
                )


def test_bounds_filter_drops_oversized_state_rows(golden):
    """Sim #0's states carry n_active+2 rows; the extras must vanish
    (P3, sim_results_parser.py:291-300)."""
    df, sims = golden
    for h, sim in sims.items():
        n_active = int(sim["actnum"].sum())
        n_obs = df.filter((F.col("sim_hash") == h) & F.col("pressure").isNotNull()).count()
        assert n_obs == n_active * N_T


def test_forder_ijk_roundtrip(golden):
    df, _ = golden
    ni, nj, _ = DIMS
    bad = df.filter(
        F.col("cell_id")
        != F.col("i").cast("bigint") + ni * (F.col("j").cast("bigint") + nj * F.col("k").cast("bigint"))
    ).count()
    assert bad == 0


def test_golden_parquet_roundtrip_partitioned(spark, golden, tmp_path):
    df, sims = golden
    path = str(tmp_path / "golden")
    write_golden(df, path)
    back = read_golden(spark, path)
    assert back.count() == df.count()
    # partition pruning: a sim_hash filter must not scan other partitions
    h = next(iter(sims))
    plan = back.filter(F.col("sim_hash") == h)._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or back.filter(F.col("sim_hash") == h).count() == df.filter(
        F.col("sim_hash") == h
    ).count()
