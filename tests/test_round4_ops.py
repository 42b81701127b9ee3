"""Round-4 operator tests: prefix-filtered set-similarity join, BFS
reachability, FK-orphan audit, unigram-LM scoring."""

from __future__ import annotations

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


# --------------------------------------------------------------------------
# dedup_prefix_filter_jaccard — exactness vs the all-pairs baseline
# --------------------------------------------------------------------------


def test_prefix_filter_matches_allpairs_baseline(spark):
    """The prefix-filtered join must return EXACTLY the pairs the all-pairs
    shingle join finds at the same threshold — prefix filtering is a
    pruning strategy, not an approximation (no false negatives by the
    SSJoin lemma, no false positives because candidates are re-verified)."""
    from pumle_spark.workload.dedup import (
        _PF_DEN,
        _PF_NUM,
        _shingles,
        dedup_prefix_filter_jaccard,
    )

    got = {
        (r.doc_a, r.doc_b, r.n_common)
        for r in dedup_prefix_filter_jaccard(spark, SF).collect()
    }

    # brute force, straight from the shingle sets
    sh = _shingles(spark, SF)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "sh")
    b = sh.select(F.col("doc_id").alias("doc_b"), "sh")
    pairs = (
        a.join(b, "sh")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("c"))
        .join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")), "doc_b")
        .filter(
            _PF_DEN * F.col("c") >= _PF_NUM * (F.col("na") + F.col("nb") - F.col("c"))
        )
    )
    want = {(r.doc_a, r.doc_b, r.c) for r in pairs.collect()}
    assert got == want
    assert len(got) > 0  # the corpus has planted near-dups; empty = broken


def test_prefix_filter_actually_prunes(spark):
    """The prefix join must carry strictly fewer rows per document than the
    full shingle set (the whole point of the technique): prefix length is
    n - ceil(t*n) + 1 < n for every doc with >= 2 shingles."""
    from pumle_spark.workload.dedup import _PF_DEN, _PF_NUM, _shingles

    sh = _shingles(spark, SF)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    stats = sizes.agg(
        F.sum("n_sh").alias("full"),
        F.sum(
            F.col("n_sh")
            - F.expr(f"({_PF_NUM} * n_sh + {_PF_DEN} - 1) div {_PF_DEN}")
            + F.lit(1)
        ).alias("prefix"),
    ).first()
    assert stats.prefix < stats.full
    # at t = 1/2 the prefix is about half the shingles
    assert stats.prefix <= stats.full * 0.6


# --------------------------------------------------------------------------
# graph_bfs_reach — structural invariants of the bipartite BFS
# --------------------------------------------------------------------------


def test_bfs_reach_bipartite_parity(spark):
    """Seed is a customer (even node id); the graph is strictly bipartite,
    so every even hop contains only customers and every odd hop only
    suppliers, and hop 0 is exactly the seed."""
    from pumle_spark.workload.graph import graph_bfs_reach

    rows = {r.hops: r for r in graph_bfs_reach(spark, SF).collect()}
    assert rows[0].n_nodes == 1 and rows[0].n_customers == 1
    for hops, r in rows.items():
        if hops % 2 == 0:
            assert r.n_suppliers == 0, f"supplier at even hop {hops}"
        else:
            assert r.n_customers == 0, f"customer at odd hop {hops}"
    # hops present form a prefix of 0..depth (a level can be empty only if
    # the graph was exhausted earlier, never in the middle)
    assert set(rows) == set(range(len(rows)))
    assert {0, 1} <= set(rows)


# --------------------------------------------------------------------------
# validate_fk_orphans — clean data audits clean; injected orphans surface
# --------------------------------------------------------------------------


def test_fk_orphans_zero_on_generated_data(spark):
    from pumle_spark.workload.pipeline import _FK_EDGES, validate_fk_orphans

    rows = validate_fk_orphans(spark, SF).collect()
    assert len(rows) == len(_FK_EDGES)
    for r in rows:
        assert r.n_child_rows > 0
        assert r.n_orphans == 0, f"{r.relationship}: {r.n_orphans} orphans"


def test_fk_orphans_detects_injected_orphan(spark, tmp_path):
    """Miniature warehouse with one dangling o_custkey and one NULL FK:
    the dangling row is an orphan, the NULL row is not (SQL FK semantics:
    NULL references are exempt, not violations)."""
    from pumle_spark.workload.pipeline import validate_fk_orphans

    sf = str(tmp_path)
    frames = {
        "region": ([(0, "R0")], "r_regionkey long, r_name string"),
        "nation": ([(0, "N0", 0)], "n_nationkey long, n_name string, n_regionkey long"),
        "customer": (
            [(1, "C1", 0), (2, "C2", 0)],
            "c_custkey long, c_name string, c_nationkey long",
        ),
        "supplier": ([(1, "S1", 0)], "s_suppkey long, s_name string, s_nationkey long"),
        "part": ([(1, "P1")], "p_partkey long, p_name string"),
        "orders": (
            [(10, 1), (11, 999), (12, None)],  # 999 dangles; NULL is exempt
            "o_orderkey long, o_custkey long",
        ),
        "lineitem": ([(10, 1, 1)], "l_orderkey long, l_partkey long, l_suppkey long"),
    }
    for name, (data, schema) in frames.items():
        spark.createDataFrame(data, schema).write.parquet(f"{sf}/{name}.parquet")

    rows = {r.relationship: r for r in validate_fk_orphans(spark, sf).collect()}
    oc = rows["orders.o_custkey->customer"]
    assert oc.n_child_rows == 3
    assert oc.n_orphans == 1  # only the dangling 999, not the NULL
    assert all(
        r.n_orphans == 0 for k, r in rows.items() if k != "orders.o_custkey->customer"
    )


# --------------------------------------------------------------------------
# text_unigram_logprob — model math on a controlled corpus
# --------------------------------------------------------------------------


def test_unigram_logprob_exact_on_fixture(spark, tmp_path):
    """4-doc corpus with known token counts: scores must equal the
    hand-computed quantized bits, and the rare-token doc must score
    strictly higher than the common-token doc (the quality-filter
    contract)."""
    import math

    from pumle_spark.workload.text import text_unigram_logprob

    sf = str(tmp_path)
    docs = [
        (1, "aa aa aa aa"),  # 4× 'aa'
        (2, "aa aa bb bb"),  # 2× 'aa', 2× 'bb'
        (3, "zz"),  # 1× 'zz' — the rare one
        (4, "aa bb aa"),  # 2× 'aa', 1× 'bb'
    ]
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        f"{sf}/documents.parquet"
    )
    # corpus: N=12, c(aa)=8, c(bb)=3, c(zz)=1
    bits = {w: round(-math.log2(c / 12.0) * 1_000_000) for w, c in {"aa": 8, "bb": 3, "zz": 1}.items()}
    expect = {
        1: (4, (4 * bits["aa"]) // 4),
        2: (4, (2 * bits["aa"] + 2 * bits["bb"]) // 4),
        3: (1, bits["zz"]),
        4: (3, (2 * bits["aa"] + bits["bb"]) // 3),
    }
    got = {
        r.doc_id: (r.n_tokens, r.bits_micro_per_token)
        for r in text_unigram_logprob(spark, sf).collect()
    }
    assert got == expect
    assert got[3][1] > got[1][1]  # rare doc scores higher than common doc
