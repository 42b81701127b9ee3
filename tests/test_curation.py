"""Edge-case tests for the corpus-curation operators (workload/curation.py)
and the banded interval-overlap join — boundaries the sf0.01 oracle data
never hits: exact-fit bins, oversize documents, chunk windows landing
exactly on the token count, and session pairs that only meet at a bucket
boundary.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from pumle_spark.workload.curation import (
    _BIN_CAPACITY,
    _CHUNK_S,
    _CHUNK_W,
    _PACK_SCHEMA,
    _pack_group,
)


# -- greedy packing scan (pure pandas — no Spark needed) ---------------------


def _pack(rows):
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=["source", "doc_id", "n_tokens"])
    out = _pack_group(pdf)
    return list(zip(out["doc_id"], out["bin_id"]))


def test_pack_exact_fit_stays_in_bin():
    # two docs summing exactly to capacity share a bin (<=, not <)
    half = _BIN_CAPACITY // 2
    rows = [("s", 1, half), ("s", 2, _BIN_CAPACITY - half), ("s", 3, 1)]
    assert _pack(rows) == [(1, 1), (2, 1), (3, 2)]


def test_pack_oversize_doc_gets_own_bin():
    rows = [("s", 1, _BIN_CAPACITY + 50), ("s", 2, 10), ("s", 3, _BIN_CAPACITY * 3)]
    # oversize opens (and monopolizes) a bin; the small doc can't join it
    assert _pack(rows) == [(1, 1), (2, 2), (3, 3)]


def test_pack_sorts_by_doc_id_not_arrival_order():
    rows = [("s", 3, 10), ("s", 1, _BIN_CAPACITY), ("s", 2, 5)]
    # scan order is doc_id: 1 fills a bin, 2 and 3 share the next
    assert sorted(_pack(rows)) == [(1, 1), (2, 2), (3, 2)]


def test_pack_spark_groups_independent(spark):
    # two sources pack independently: same doc sizes → same bin sequence
    rows = [("a", i, 100) for i in range(1, 6)] + [("b", i, 100) for i in range(1, 6)]
    df = spark.createDataFrame(rows, "source string, doc_id long, n_tokens long")
    out = df.groupBy("source").applyInPandas(_pack_group, _PACK_SCHEMA).collect()
    by_source = {}
    for r in out:
        by_source.setdefault(r.source, []).append((r.doc_id, r.bin_id))
    assert sorted(by_source["a"]) == sorted(by_source["b"])
    # 100+100 fits 256, +100 doesn't: bins of 2,2,1
    assert [b for _, b in sorted(by_source["a"])] == [1, 1, 2, 2, 3]


# -- sliding-window chunking --------------------------------------------------


@pytest.mark.parametrize(
    "n_tokens,expected_chunks",
    [
        (1, 1),  # tiny doc → single chunk
        (_CHUNK_W, 1),  # exactly one window
        (_CHUNK_W + 1, 2),  # one token past → second window
        (_CHUNK_W + (_CHUNK_S - 1), 2),
        (_CHUNK_W + _CHUNK_S, 2),  # second window ends exactly at n
        (_CHUNK_W + _CHUNK_S + 1, 3),
    ],
)
def test_chunk_count_boundaries(spark, n_tokens, expected_chunks):
    from pumle_spark.workload.curation import chunk_sliding_windows

    text = " ".join(f"t{i}" for i in range(n_tokens))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    df.createOrReplaceTempView("___chunk_probe")
    # drive the same expression chain directly over a probe frame
    d = df.select("doc_id", F.split(F.trim(F.lower(F.col("text"))), " ").alias("ws"))
    d = d.withColumn("n", F.size("ws"))
    k = F.expr(
        f"CASE WHEN n <= {_CHUNK_W} THEN 0 "
        f"ELSE (n - {_CHUNK_W} + {_CHUNK_S} - 1) div {_CHUNK_S} END"
    )
    rows = d.select(F.explode(F.sequence(F.lit(0), k.cast("int"))).alias("ci")).collect()
    assert len(rows) == expected_chunks
    # every token is covered: last window start + W >= n
    last_start = max(r.ci for r in rows) * _CHUNK_S
    assert last_start + _CHUNK_W >= n_tokens
    assert last_start < n_tokens  # no fully-empty trailing window


def test_chunks_overlap_by_w_minus_s(spark):
    from pumle_spark.workload.curation import chunk_sliding_windows  # noqa: F401

    n = _CHUNK_W + _CHUNK_S  # two windows
    toks = [f"t{i}" for i in range(n)]
    w0 = toks[:_CHUNK_W]
    w1 = toks[_CHUNK_S : _CHUNK_S + _CHUNK_W]
    assert w0[_CHUNK_S:] == w1[: _CHUNK_W - _CHUNK_S]  # shared overlap region


# -- banded interval overlap vs brute force ------------------------------------


def test_interval_overlap_banding_matches_bruteforce(spark, tmp_path):
    """Sessions engineered around bucket boundaries: overlap entirely inside
    one bucket, overlap spanning a boundary, touching endpoints (zero-width
    overlap counts), and disjoint-but-same-bucket pairs."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ev(user, eid, sec):
        return (eid, base + dt.timedelta(seconds=sec), user, "click", 1.0, "{}")

    h = 3600
    rows = [
        # user 1: one session [0, 100]
        ev(1, 1, 0), ev(1, 2, 100),
        # user 2: [50, 150] — overlaps u1 inside bucket 0 by 50s
        ev(2, 3, 50), ev(2, 4, 150),
        # user 3: [h-10, h+10] — spans the bucket boundary
        ev(3, 5, h - 10), ev(3, 6, h + 10),
        # user 4: [h+10, h+20] — touches u3 at exactly h+10 (zero-width)
        ev(4, 7, h + 10), ev(4, 8, h + 20),
        # user 5: [200, 300] — same bucket as u1/u2 but disjoint
        ev(5, 9, 200), ev(5, 10, 300),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    out_dir = str(tmp_path / "events.parquet")
    df.write.parquet(out_dir)
    sf_dir = str(tmp_path)

    from pumle_spark.workload.events import interval_overlap_sessions

    got = {
        (r.user_a, r.user_b): (r.n_overlaps, r.overlap_us_total)
        for r in interval_overlap_sessions(spark, sf_dir).collect()
    }
    assert got == {
        (1, 2): (1, 50_000_000),
        (3, 4): (1, 0),  # touching endpoints: closed-interval overlap of zero
    }


# -- concat-and-cut block packing ---------------------------------------------


def test_concat_blocks_span_math(spark, tmp_path):
    """Block-boundary cases: a doc ending exactly at a block cut (last_block
    stays in its own block, next doc starts at offset 0 of the next), a doc
    straddling a cut, and per-source independence of the token stream."""
    from pumle_spark.workload.curation import _BIN_CAPACITY

    C = _BIN_CAPACITY
    # source "a": 3 docs of C, C//2, C tokens → doc1 fills block 0 exactly;
    # doc2 starts block 1 offset 0; doc3 straddles blocks 1→2
    rows = []
    for src_name, sizes in [("a", [C, C // 2, C]), ("b", [5])]:
        for i, n in enumerate(sizes, start=1):
            rows.append((src_name, i, " ".join(f"t{j}" for j in range(n))))
    df = spark.createDataFrame(rows, "source string, doc_id long, text string")
    df.write.parquet(str(tmp_path / "documents.parquet"))

    from pumle_spark.workload.curation import pack_concat_fixed_blocks

    got = {
        (r.source, r.doc_id): (r.first_block, r.last_block, r.offset_in_block)
        for r in pack_concat_fixed_blocks(spark, str(tmp_path)).collect()
    }
    assert got[("a", 1)] == (0, 0, 0)          # exactly fills block 0
    assert got[("a", 2)] == (1, 1, 0)          # next doc opens block 1 at 0
    assert got[("a", 3)] == (1, 2, C // 2)     # straddles the 1→2 cut
    assert got[("b", 1)] == (0, 0, 0)          # sources pack independently


def test_concat_blocks_zero_dividend_guard(spark):
    """The last_block formula divides cum_tokens - 1, which is negative when
    cum_tokens = 0. Pin the negative-dividend semantics: BOTH engines
    truncate toward zero (-1 div C == -1 // C == 0; measured — DuckDB's //
    is trunc-division, not Python-style floor), so the GREATEST(..., 0)
    guard in the query is pure defense against an engine/version that
    floors. Assert raw agreement AND guarded agreement across the
    boundary."""
    import duckdb

    C = _BIN_CAPACITY
    spark_raw = spark.sql(f"SELECT CAST(-1 AS BIGINT) div {C} AS v").collect()[0].v
    duck_raw = duckdb.sql(f"SELECT -1 // {C} AS v").fetchone()[0]
    assert spark_raw == duck_raw == 0  # both truncate toward zero

    for cum in (0, 1, C, C + 1):
        s = spark.sql(
            f"SELECT greatest(CAST({cum} AS BIGINT) - 1, 0L) div {C} AS v"
        ).collect()[0].v
        d = duckdb.sql(f"SELECT GREATEST({cum} - 1, 0) // {C} AS v").fetchone()[0]
        assert s == d, f"cum_tokens={cum}: spark {s} != duckdb {d}"


def test_concat_blocks_empty_text_leading_doc_matches_oracle(spark, tmp_path):
    """Adversarial fixture: the LEADING document of a source has empty /
    punctuation-only text (the normalizer still yields one '' token, the
    minimum cum_tokens the tokenizer can produce). The Spark plan and the
    registered DuckDB oracle must agree cell-for-cell, and every block id
    must be non-negative (the un-guarded formula would emit -1 on a true
    zero-token stream)."""
    import duckdb

    from pumle_spark.workload import REGISTRY
    from pumle_spark.workload.curation import pack_concat_fixed_blocks

    rows = [("a", 1, ""), ("a", 2, "x " * 7), ("b", 1, "!!! ???"), ("b", 2, "y")]
    df = spark.createDataFrame(rows, "source string, doc_id long, text string")
    pq = str(tmp_path / "documents.parquet")
    df.write.parquet(pq)

    got = sorted(
        (r.source, r.doc_id, r.n_tokens, r.first_block, r.last_block, r.offset_in_block)
        for r in pack_concat_fixed_blocks(spark, str(tmp_path)).collect()
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{pq}/*.parquet')")
    want = sorted(map(tuple, con.execute(REGISTRY["pack_concat_fixed_blocks"].sql).fetchall()))
    assert got == want
    assert all(r[3] >= 0 and r[4] >= 0 and r[5] >= 0 for r in got)


# -- top-mass selection boundary ------------------------------------------------


def test_top_mass_keeps_exact_boundary_doc(spark, tmp_path):
    """The keep rule is cum*100 <= tot*PCT (inclusive): a doc whose
    cumulative mass lands EXACTLY on the threshold stays; quota math is
    pure BIGINT cross-multiplication (no float share)."""
    # doc1: high alnum ratio (long clean tokens), 70 tokens → ranks first,
    # cum=70 of tot=100 → 70*100 == 100*70 → kept (inclusive boundary);
    # doc2: punctuation-heavy (low ratio), 30 tokens → cum=100 → dropped
    rows = [
        ("s", 1, " ".join("aaaaaaaaaa" for _ in range(70))),
        ("s", 2, " ".join("a!!!!" for _ in range(30))),
    ]
    df = spark.createDataFrame(rows, "source string, doc_id long, text string")
    df.write.parquet(str(tmp_path / "documents.parquet"))

    from pumle_spark.workload.curation import select_top_mass_per_source

    kept = {r.doc_id for r in select_top_mass_per_source(spark, str(tmp_path)).collect()}
    assert kept == {1}
