"""S9 GRDECL reader: keyword framing, comments, N*V run-length expansion
(reference format: benchmark/unisim-1-d/*.INC; MRST readGRDECL semantics)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from pumle_spark.sources.grdecl import grid_cells, read_grdecl_keywords

SAMPLE = """-- test deck (format like benchmark/unisim-1-d/PETRO_0.INC)
PORO
  0.25 0.30
  3*0.10 0.05
/
-- actnum block
ACTNUM
 1 1 0 2*1 0
/
NTG
 6*0.9
/
"""


@pytest.fixture(scope="module")
def deck(tmp_path_factory):
    p = tmp_path_factory.mktemp("grdecl") / "deck.inc"
    p.write_text(SAMPLE)
    return str(p)


def test_rle_expansion_and_order(spark, deck):
    long = read_grdecl_keywords(spark, deck)
    poro = [r.value for r in long.filter(F.col("keyword") == "PORO").orderBy("pos").collect()]
    assert poro == [0.25, 0.30, 0.10, 0.10, 0.10, 0.05]
    act = [r.value for r in long.filter(F.col("keyword") == "ACTNUM").orderBy("pos").collect()]
    assert act == [1, 1, 0, 1, 1, 0]


def test_comments_stripped(spark, deck):
    kws = {r.keyword for r in read_grdecl_keywords(spark, deck).select("keyword").distinct().collect()}
    assert kws == {"PORO", "ACTNUM", "NTG"}


def test_grid_cells_pivot(spark, deck):
    cells = grid_cells(spark, deck, ["PORO", "ACTNUM", "NTG"]).orderBy("cell_id")
    rows = cells.collect()
    assert len(rows) == 6
    assert rows[0].poro == 0.25 and rows[0].actnum == 1 and rows[0].ntg == 0.9
    assert rows[2].actnum == 0
