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


def test_pointers_use_8_neighborhood_and_tiebreak(spark):
    # diagonal neighbor is reachable in one hop; equal-z plateau resolves
    # to the lexicographically smallest (z, i, j)
    surf = _surface(spark, [(0, 0, 5.0), (1, 1, 1.0), (0, 1, 5.0), (1, 0, 5.0)])
    ptr = {(r.i, r.j): (r.pi, r.pj) for r in steepest_ascent_pointers(surf).collect()}
    assert ptr[(0, 0)] == (1, 1)  # diagonal hop
    plateau = _surface(spark, [(0, 0, 2.0), (1, 0, 2.0), (2, 0, 2.0)])
    labels = {(r.i, r.j): (r.trap_i, r.trap_j) for r in trap_assignment(plateau).collect()}
    assert set(labels.values()) == {(0, 0)}  # all drain to the smallest id
