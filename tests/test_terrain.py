"""Spill-point trap analysis: hand-computed watershed fixtures."""

from __future__ import annotations

from pumle_spark.operators.terrain import (
    steepest_ascent_pointers,
    trap_assignment,
    trap_spill_volumes,
)


def _surface(spark, rows):
    return spark.createDataFrame(rows, "i bigint, j bigint, z double")


def test_ridge_splits_into_two_traps(spark):
    # 1-D ridge: z = [5, 3, 4, 2, 6] → catchments {0,1}→top at i=1 and
    # {2,3,4}→top at i=3; the saddle between them is max(3,4)=4
    surf = _surface(spark, [(i, 0, z) for i, z in enumerate([5.0, 3.0, 4.0, 2.0, 6.0])])
    labels = trap_assignment(surf)
    got = {(r.i, r.j): (r.trap_i, r.trap_j) for r in labels.collect()}
    assert got == {(0, 0): (1, 0), (1, 0): (1, 0), (2, 0): (3, 0), (3, 0): (3, 0), (4, 0): (3, 0)}

    vols = {(r.trap_i, r.trap_j): r for r in trap_spill_volumes(labels).collect()}
    t1, t3 = vols[(1, 0)], vols[(3, 0)]
    assert t1.spill_z == 4.0 and t3.spill_z == 4.0
    assert t1.top_z == 3.0 and t3.top_z == 2.0
    assert t1.n_cells == 2 and t3.n_cells == 3
    # volumes: trap1 = (4-5)^+ + (4-3)^+ = 1; trap3 = 0 + (4-2)^+ + 0 = 2
    assert t1.trapped_volume == 1.0
    assert t3.trapped_volume == 2.0


def test_single_dome_is_one_trap_no_spill(spark):
    # bowl (inverted dome in depth): single catchment, no boundary → NULL
    # spill, volume filled to the deepest cell
    rows = [(i, j, float(abs(i - 1) + abs(j - 1))) for i in range(3) for j in range(3)]
    labels = trap_assignment(_surface(spark, rows))
    got = {(r.trap_i, r.trap_j) for r in labels.collect()}
    assert got == {(1, 1)}
    (v,) = trap_spill_volumes(labels).collect()
    assert v.spill_z is None
    assert v.n_cells == 9
    # fill to deepest (z=2): sum(2 - z) over the 9 cells = 18 - sum(z) = 18-12 = 6
    assert v.trapped_volume == 6.0


def test_trap_analysis_on_real_unisim_footprint(spark):
    """Round-2 verdict item 6: run the watershed on the REAL UNISIM-I-D
    surface instead of the synthetic md5-noise grid.

    The reference's grid geometry (ZCORN) lives in an external file
    (PARAMS.Grid.file_path, co2lab3DPUMLE.m:101) that is not shipped; what
    IS shipped is the real PETRO_0.INC porosity field (81x58x20 F-order).
    The depth proxy z(i,j) = k_top - avg_poro is built ONLY from that real
    data: k_top = shallowest active layer of the column (the structural
    shape), avg_poro a deterministic sub-layer perturbation. What this
    exercises that the synthetic grid never did: the real irregular
    reservoir footprint — inactive columns punch holes in the 8-neighbor
    graph — plus large flat plateaus from the integer k_top terrace.
    """
    import warnings

    import pyspark.sql.functions as F

    from pumle_spark.functions.grid import ijk_exprs
    from pumle_spark.sources.grdecl import grid_cells

    ni, nj, nk = 81, 58, 20
    deck = "/root/reference/benchmark/unisim-1-d/PETRO_0.INC"
    cells = grid_cells(spark, deck, ["PORO"])
    i, j, k = ijk_exprs(F.col("cell_id"), ni, nj)
    cols = (
        cells.select(i, j, k, "poro")
        .filter(F.col("poro") > 0)
        .groupBy("i", "j")
        .agg(F.min("k").alias("k_top"), F.avg("poro").alias("avg_poro"))
    )
    surface = cols.select(
        F.col("i").cast("bigint").alias("i"),
        F.col("j").cast("bigint").alias("j"),
        (F.col("k_top") - F.col("avg_poro")).cast("double").alias("z"),
    ).localCheckpoint(eager=True)
    n_cols = surface.count()
    assert 1000 < n_cols < ni * nj, "real footprint should be irregular (has holes)"

    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)  # unconverged → fail
        labels = trap_assignment(surface).localCheckpoint(eager=True)

    assert labels.count() == n_cols  # every active column gets a catchment
    tops = labels.select("trap_i", "trap_j").distinct()
    n_traps = tops.count()
    assert 1 < n_traps < n_cols
    # every trap top is its own fixpoint (a structural high labels itself)
    self_labeled = labels.filter(
        (F.col("i") == F.col("trap_i")) & (F.col("j") == F.col("trap_j"))
    ).count()
    assert self_labeled == n_traps

    vols = trap_spill_volumes(labels).collect()
    assert len(vols) == n_traps
    assert all(v.trapped_volume >= 0 for v in vols)
    assert any(v.trapped_volume > 0 for v in vols)
    total_v = sum(v.trapped_volume for v in vols)
    # recorded in PERF.md ("Trap analysis on the real UNISIM footprint")
    print(f"UNISIM footprint: {n_cols} columns, {n_traps} traps, total volume {total_v:.3f}")


def test_pointers_use_8_neighborhood_and_tiebreak(spark):
    # diagonal neighbor is reachable in one hop; equal-z plateau resolves
    # to the lexicographically smallest (z, i, j)
    surf = _surface(spark, [(0, 0, 5.0), (1, 1, 1.0), (0, 1, 5.0), (1, 0, 5.0)])
    ptr = {(r.i, r.j): (r.pi, r.pj) for r in steepest_ascent_pointers(surf).collect()}
    assert ptr[(0, 0)] == (1, 1)  # diagonal hop
    plateau = _surface(spark, [(0, 0, 2.0), (1, 0, 2.0), (2, 0, 2.0)])
    labels = {(r.i, r.j): (r.trap_i, r.trap_j) for r in trap_assignment(plateau).collect()}
    assert set(labels.values()) == {(0, 0)}  # all drain to the smallest id
