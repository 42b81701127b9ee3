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


def test_split_keyword_blocks_continue_pos(spark, tmp_path):
    """ADVICE fix: the same keyword split across several '/' blocks
    (INCLUDE-style continuation) numbers pos cumulatively — no duplicate
    cell ids, no silent row multiplication in grid_cells."""
    deck = tmp_path / "split.inc"
    deck.write_text("PORO\n 0.1 0.2\n/\nPORO\n 0.3 2*0.4\n/\n")
    long = read_grdecl_keywords(spark, str(deck)).filter(F.col("keyword") == "PORO")
    rows = long.orderBy("pos").collect()
    assert [r.pos for r in rows] == [0, 1, 2, 3, 4]
    assert [r.value for r in rows] == [0.1, 0.2, 0.3, 0.4, 0.4]
    cells = grid_cells(spark, str(deck), ["PORO"])
    assert cells.count() == 5  # would be duplicated under per-block numbering


def test_repair_zcorn_clamps_nonmonotone_lines(spark, tmp_path):
    """RepairZCORN semantics (co2lab3DPUMLE.m:108-124): depths along each
    vertical corner line become non-decreasing via a running-max clamp."""
    from pumle_spark.sources.grdecl import read_zcorn

    # 1x1x2 grid → 16 ZCORN values in a (2,2,4) F-order lattice; make the
    # (0,0) line dip at ck=2 and the (1,1) line dip at ck=1
    line = {  # (ci,cj) -> [z at ck=0..3]
        (0, 0): [1000.0, 1100.0, 1090.0, 1200.0],
        (1, 0): [1000.0, 1100.0, 1100.0, 1200.0],
        (0, 1): [1000.0, 1100.0, 1100.0, 1200.0],
        (1, 1): [1000.0, 1050.0, 1100.0, 1200.0],
    }
    vals = [line[(ci, cj)][ck] for ck in range(4) for cj in range(2) for ci in range(2)]
    deck = tmp_path / "z.inc"
    deck.write_text("ZCORN\n" + " ".join(str(v) for v in vals) + "\n/\n")

    repaired = read_zcorn(spark, str(deck), dims=(1, 1, 2), repair=True).collect()
    assert len(repaired) == 16
    fixed = [r for r in repaired if r.was_repaired]
    assert len(fixed) == 1
    assert fixed[0].value == 1100.0  # clamped up to the running max
    # without repair the raw dip survives
    raw = {r.value for r in read_zcorn(spark, str(deck), dims=(1, 1, 2), repair=False).collect()}
    assert 1090.0 in raw  # the dip survives without repair

    with pytest.raises(ValueError, match="ZCORN has"):
        read_zcorn(spark, str(deck), dims=(2, 1, 2))
