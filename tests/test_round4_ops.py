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


# --------------------------------------------------------------------------
# events_ewma_smoothing — exact integer fold on a controlled sequence
# --------------------------------------------------------------------------


def test_ewma_exact_on_fixture(spark, tmp_path):
    """Hand-computed EWMA recurrence, including a same-timestamp tie broken
    by event_id — the order the sort contract guarantees."""
    import datetime as dt

    from pumle_spark.workload.events import events_ewma_smoothing

    sf = str(tmp_path)
    t = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        # user 1: values 4.0, 8.0, 8.0 (last two share a ts; ids order them)
        (1, t, 7, "click", 4.0),
        (2, t + dt.timedelta(hours=1), 7, "click", 8.0),
        (3, t + dt.timedelta(hours=1), 7, "click", 8.0),
        # user 2: single event
        (4, t, 9, "view", 2.5),
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    ).write.parquet(f"{sf}/events.parquet")

    s1 = 4_000_000
    s1 = (3 * s1 + 8_000_000) // 4  # 5_000_000
    s1 = (3 * s1 + 8_000_000) // 4  # 5_750_000
    got = {r.user_id: (r.n_events, r.ewma_micro) for r in events_ewma_smoothing(spark, sf).collect()}
    assert got == {7: (3, s1), 9: (1, 2_500_000)}


# --------------------------------------------------------------------------
# embedding_power_iteration — semantic check against numpy's eigenvector
# --------------------------------------------------------------------------


def test_power_iteration_matches_numpy_replica_bit_exact(spark):
    """The operator's contract is the deterministic integer recurrence, so
    a numpy replica of the exact same quantize → Gram-downscale → iterate
    steps must agree BIT-FOR-BIT with the distributed result. (Alignment
    with the true eigenvector is a data property: this synthetic corpus is
    near-isotropic — eigengap ratio ~0.93 — so no small iteration count
    converges; the kernel, not the spectrum, is under test.) The Rayleigh
    quotient must still improve materially over the start vector — each
    power step provably increases it for a PSD Gram matrix."""
    import numpy as np
    import pyarrow.parquet as pq

    from pumle_spark.workload.clustering import _PI_FP, _PI_ITERS, embedding_power_iteration

    got = embedding_power_iteration(spark, SF).collect()
    v_spark = np.zeros(64, dtype=np.int64)
    for r in got:
        v_spark[r.dim - 1] = r.component_micro

    emb = np.array(pq.read_table(f"{SF}/embeddings.parquet").column("embedding").to_pylist())
    x = np.round(emb.astype(np.float64) * _PI_FP).astype(np.int64)
    gram_raw = x.T.astype(object) @ x.astype(object)  # exact int (beyond int64 at scale)
    gram = np.array(
        [[int(abs(s)) // _PI_FP * (1 if s >= 0 else -1) for s in row] for row in gram_raw],
        dtype=np.int64,
    )
    v = np.full(64, _PI_FP, dtype=np.int64)
    for _ in range(_PI_ITERS):
        w = gram @ v
        m = max(int(np.abs(w).max()) // _PI_FP, 1)
        v = np.sign(w) * (np.abs(w) // m)

    assert np.array_equal(v_spark, v), f"first diff at {np.argmax(v_spark != v)}"

    def rayleigh(u):
        u = u.astype(np.float64)
        return (u @ gram.astype(np.float64) @ u) / (u @ u)

    assert rayleigh(v_spark) >= 1.2 * rayleigh(np.full(64, _PI_FP))


# --------------------------------------------------------------------------
# dedup_containment_pairs — exactness vs the all-pairs baseline
# --------------------------------------------------------------------------


def test_containment_matches_allpairs_baseline(spark):
    """Prefix filtering for containment restricts only the CONTAINED side;
    the result must equal the all-pairs computation exactly, and
    containment must surface every Jaccard pair in both directions (a
    high-Jaccard pair is mutually containing at these thresholds)."""
    from pumle_spark.workload.dedup import (
        _CT_DEN,
        _CT_NUM,
        _shingles,
        dedup_containment_pairs,
    )

    got = {
        (r.doc_a, r.doc_b, r.n_common)
        for r in dedup_containment_pairs(spark, SF).collect()
    }

    sh = _shingles(spark, SF)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "sh")
    b = sh.select(F.col("doc_id").alias("doc_b"), "sh")
    pairs = (
        a.join(b, "sh")
        .filter(F.col("doc_a") != F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("c"))
        .join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")), "doc_a")
        .filter(_CT_DEN * F.col("c") >= _CT_NUM * F.col("na"))
    )
    want = {(r.doc_a, r.doc_b, r.c) for r in pairs.collect()}
    assert got == want
    assert len(got) > 0
