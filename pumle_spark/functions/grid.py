"""F-order grid index math (F12) and grid-derived columns.

cell_id is the 0-based Fortran-order linear index into (i, j, k):
    cell_id = i + I*(j + J*k)
(reference arrays.py:138-140 reshape(order='F'); co2lab3DPUMLE.m:415
sub2ind). Pure integer column expressions — deriving coordinates from the
key costs nothing at any scale, so (i, j, k) are never stored redundantly.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def cell_id_expr(i: Column, j: Column, k: Column, ni: int, nj: int) -> Column:
    """(i, j, k) → F-order cell_id."""
    return (i.cast("bigint") + ni * (j.cast("bigint") + nj * k.cast("bigint"))).alias("cell_id")


def ijk_exprs(cell_id: Column, ni: int, nj: int) -> tuple[Column, Column, Column]:
    """cell_id → (i, j, k) F-order coordinates."""
    i = (cell_id % ni).cast("int").alias("i")
    j = ((cell_id / ni).cast("bigint") % nj).cast("int").alias("j")
    k = (cell_id / (ni * nj)).cast("bigint").cast("int").alias("k")
    return i, j, k
