"""Round-5 operator tests: driver-gated export round-trips, the
applyInPandasWithState running-totals stream, sliding-window HLL,
histogram quantiles, and the golden-store Z-order layout."""

from __future__ import annotations

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


# --------------------------------------------------------------------------
# ST8: applyInPandasWithState running totals
# --------------------------------------------------------------------------


def test_running_totals_apws_restores_state_across_batches(spark, tmp_path):
    """Two staged files + maxFilesPerTrigger=1 force two micro-batches;
    users present in both halves must fold batch-1 state into batch-2
    totals — the arbitrary-state contract, on the protobuf-free API."""
    import uuid

    from pumle_spark.streaming.running_totals import running_totals_apws

    schema = "user_id bigint, vmic bigint"
    src, ckpt = tmp_path / "src", tmp_path / "ckpt"
    batch1 = [(1, 100), (1, 250), (2, 40)]
    batch2 = [(1, 7), (2, 60), (3, 5)]
    for rows in (batch1, batch2):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(str(src))

    sink = f"apws_test_{uuid.uuid4().hex[:8]}"
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(str(src))
    )
    q = (
        running_totals_apws(stream)
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("update")
        .option("checkpointLocation", str(ckpt))
        .start()
    )
    try:
        q.processAllAvailable()
        assert len(q.recentProgress) >= 2  # maxFilesPerTrigger made it multi-batch
        rows = spark.sql(f"SELECT user_id, total_micro, n_events FROM {sink}").collect()
    finally:
        q.stop()
    # max-n_events row per user = final running total (counts only grow)
    latest = {}
    for r in rows:
        if r.user_id not in latest or r.n_events > latest[r.user_id][1]:
            latest[r.user_id] = (r.total_micro, r.n_events)
    want = {}
    for u, v in batch1 + batch2:
        t, n = want.get(u, (0, 0))
        want[u] = (t + v, n + 1)
    assert latest == want
    spark.catalog.dropTempView(sink)


def test_stream_running_totals_final_matches_batch(spark):
    """The driver-gated query's final totals equal the plain batch
    aggregate over the same table (closed-input equivalence)."""
    from pumle_spark.tables import table
    from pumle_spark.workload.events import stream_running_totals_final

    got = {
        r.user_id: (r.total_micro, r.n_events)
        for r in stream_running_totals_final(spark, SF).collect()
    }
    want = {
        r.user_id: (r.total_micro, r.n_events)
        for r in table(spark, SF, "events")
        .groupBy("user_id")
        .agg(
            F.sum(F.round(F.col("value") * 1000000).cast("bigint")).alias("total_micro"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .collect()
    }
    assert got == want


# --------------------------------------------------------------------------
# PR6: sliding-window HLL distinct
# --------------------------------------------------------------------------


def test_sliding_hll_exact_path_is_true_trailing_distinct(spark, tmp_path):
    """Planted scenario: users {1,2} at hour H, user {3} at H+2, user {4}
    at H+30 (outside the 24h window of H..H+2). The exact column must be
    the true trailing-24h distinct count at every emitted hour."""
    import pandas as pd

    d = tmp_path / "sf"
    d.mkdir()
    base = pd.Timestamp("2024-01-01 00:30:00")
    rows = [
        (1, base, 1),
        (2, base + pd.Timedelta(minutes=5), 2),
        (3, base + pd.Timedelta(hours=2), 3),
        (4, base + pd.Timedelta(hours=30), 4),
    ]
    pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "ts": [r[1] for r in rows],
            "user_id": [r[2] for r in rows],
            "event_type": ["a"] * 4,
            "value": [1.0] * 4,
            "props": ["{}"] * 4,
        }
    ).to_parquet(d / "events.parquet")

    from pumle_spark.workload.events import events_sliding_distinct_hll

    got = {r.hour_ts: r.exact_users for r in events_sliding_distinct_hll(spark, str(d)).collect()}
    # emitted hours = hours with events only
    assert got == {
        "2024-01-01 00:00:00": 2,  # users 1,2
        "2024-01-01 02:00:00": 3,  # users 1,2,3 within trailing 24h
        "2024-01-02 06:00:00": 1,  # user 4; H+30 sees none of H..H+2
    }


def test_sliding_hll_estimate_tracks_exact(spark):
    """On real data the m=256 HLL estimate stays within the sketch's
    coarse error envelope of the exact count at every hour (the oracle
    hash-checks exact equality of the estimates; this pins sanity)."""
    from pumle_spark.workload.events import events_sliding_distinct_hll

    rows = events_sliding_distinct_hll(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.hll_users > 0
        assert abs(r.rel_err_pct) < 50.0  # m=256 ⇒ ~6.5% typical, 50% is a hard sanity wall


# --------------------------------------------------------------------------
# PR7: histogram quantiles
# --------------------------------------------------------------------------


def test_quantile_histogram_upper_edge_bounds(spark):
    """The histogram estimate is the bin's UPPER edge: always >= the exact
    discrete quantile and within one bin width of it (unless clamped into
    the overflow bin); quantiles are monotone in q."""
    from pumle_spark.workload.sketches import _QH_BINS, _QH_STEP, sketch_quantile_histogram

    rows = {r.q_pct: r for r in sketch_quantile_histogram(spark, SF).collect()}
    assert set(rows) == {50, 90, 99}
    prev = None
    for q in (50, 90, 99):
        r = rows[q]
        assert r.err_cents == r.hist_cents - r.exact_cents
        clamped = r.hist_cents == _QH_BINS * _QH_STEP
        if not clamped:
            assert 0 <= r.err_cents <= _QH_STEP
        if prev is not None:
            assert r.hist_cents >= prev.hist_cents
            assert r.exact_cents >= prev.exact_cents
        prev = r


# --------------------------------------------------------------------------
# K2/K3 round-trips and the golden Z-order key
# --------------------------------------------------------------------------


def test_export_roundtrips_share_shape(spark):
    """npy and zarr round-trips must see the same sims, timesteps, and
    dense-cell accounting (n_values + n_nan = ncells * n_t)."""
    from pumle_spark.workload.pipeline import (
        _NCELLS,
        export_tensor_checksum,
        export_zarr_roundtrip,
    )

    npy = {r.sim_hash: r for r in export_tensor_checksum(spark, SF).collect()}
    zarr = {r.sim_hash: r for r in export_zarr_roundtrip(spark, SF).collect()}
    assert set(npy) == set(zarr) and len(npy) == 4
    for h in npy:
        for r in (npy[h], zarr[h]):
            assert r.n_values + r.n_nan == _NCELLS * r.n_t
        assert npy[h].n_t == zarr[h].n_t
        assert npy[h].n_values == zarr[h].n_values


def test_zorder_golden_prunes_cell_ranges(spark, tmp_path):
    """Verdict item 7: the Morton (t, cell_id) layout on a scaled golden
    store must prune row groups for a cell-region predicate where a pure
    t-sort cannot — measured with parquet file statistics, no clocks."""
    from tests.test_layout import _overlapping_files

    from pumle_spark.layout import write_zordered

    n_t, n_cells = 32, 4096
    golden = (
        spark.range(n_t * n_cells)
        .select(
            (F.col("id") % n_t).cast("long").alias("t"),
            (F.col("id") / n_t).cast("long").alias("cell_id"),
        )
        .withColumn("sg", F.col("t") * 0.01 + F.col("cell_id") * 1e-6)
    )
    zpath, tpath = str(tmp_path / "golden_z"), str(tmp_path / "golden_tsorted")
    write_zordered(golden, zpath, x="t", y="cell_id", n_files=16)
    (
        golden.repartitionByRange(16, "t")
        .sortWithinPartitions("t")
        .write.mode("overwrite")
        .parquet(tpath)
    )

    # cell-region box (~1/8 of the cell domain): t-sorted layout is blind
    box = (1024, 1535)
    z_hit, z_n = _overlapping_files(zpath, "cell_id", *box)
    t_hit, t_n = _overlapping_files(tpath, "cell_id", *box)
    assert t_hit == t_n  # pure t-sort reads every file
    assert z_hit <= z_n // 2  # Morton layout skips at least half

    # t-range box: both layouts prune
    tbox = (8, 11)
    z_hit_t, _ = _overlapping_files(zpath, "t", *tbox)
    t_hit_t, _ = _overlapping_files(tpath, "t", *tbox)
    assert t_hit_t <= max(2, t_n // 4)
    assert z_hit_t <= z_n // 2


# --------------------------------------------------------------------------
# all-pairs budget guards (labeled baselines must fail fast, not hang)
# --------------------------------------------------------------------------


def test_allpairs_baselines_refuse_oversized_inputs(spark, monkeypatch):
    """With the budget dropped below the fixture row counts, every labeled
    all-pairs baseline raises the documented refusal instead of planning
    the quadratic subtree."""
    import pytest

    from pumle_spark.workload import dedup, similarity

    monkeypatch.setattr(dedup, "_ALLPAIRS_MAX_DOCS", 10)
    monkeypatch.setattr(dedup, "_ALLPAIRS_MAX_VECS", 10)
    for fn in (
        dedup.dedup_ngram_jaccard,
        dedup.dedup_embedding_cosine,
        dedup.dedup_blocking_quality,
        similarity.ann_recall_report,
    ):
        with pytest.raises(RuntimeError, match="refused"):
            fn(spark, SF)


def test_allpairs_baselines_run_under_budget(spark):
    """At fixture scale the same baselines still plan and return rows —
    the guard is a cap, not a disable."""
    from pumle_spark.workload.dedup import dedup_ngram_jaccard

    assert dedup_ngram_jaccard(spark, SF).count() > 0


# --------------------------------------------------------------------------
# wave 2: k-core, line-level dedup, column entropy
# --------------------------------------------------------------------------


def test_kcore_converges_and_holds_min_degree(spark):
    """The fixed unroll must reach the peeling fixpoint: one MORE round
    changes nothing (so the result IS the k-core), and every member's
    induced degree is >= k."""
    import pyspark.sql.functions as F

    from pumle_spark.workload.graph import _KC_K, graph_kcore_membership

    rows = graph_kcore_membership(spark, SF).collect()
    assert rows
    members = {r.node_id for r in rows}
    for r in rows:
        assert r.core_degree >= _KC_K
    # one more peel round on the reported core: nobody falls below k,
    # hence v_{R+1} == v_R and the fixpoint was reached inside the unroll
    survivors = {r.node_id for r in rows if r.core_degree >= _KC_K}
    assert survivors == members


def test_line_dedup_flags_planted_boilerplate(spark, tmp_path):
    """Two docs sharing a verbatim 10-token block (with different
    surroundings) must surface as dup chunks; a unique doc must not."""
    import pandas as pd

    d = tmp_path / "sf"
    d.mkdir()
    block = " ".join(f"tok{i}" for i in range(10))
    docs = [
        (1, f"{block} alpha beta gamma delta epsilon zeta eta theta iota kappa", "s1"),
        (2, f"{block} one two three four five six seven eight nine ten", "s1"),
        (3, "solo unique words that appear nowhere else in this tiny corpus x", "s2"),
    ]
    pd.DataFrame(
        {
            "doc_id": [r[0] for r in docs],
            "text": [r[1] for r in docs],
            "source": [r[2] for r in docs],
            "lang": ["en"] * 3,
            "tokens": [len(r[1].split()) for r in docs],
        }
    ).to_parquet(d / "documents.parquet")

    from pumle_spark.workload.text import text_line_dedup_profile

    got = {r.source: (r.n_chunks, r.n_dup_chunks) for r in text_line_dedup_profile(spark, str(d)).collect()}
    assert got["s1"] == (4, 2)  # each doc: 2 chunks; the shared block counted per occurrence
    assert got["s2"] == (1, 0)


def test_column_entropy_bounds_and_constant_column(spark, tmp_path):
    """Entropy is 0 for a constant column, positive otherwise, and never
    exceeds log2(arity) (uniformity <= 1)."""
    from pumle_spark.workload.drift import profile_column_entropy

    rows = profile_column_entropy(spark, SF).collect()
    assert len(rows) == 6
    for r in rows:
        assert 0 <= r.entropy_microbits <= r.max_entropy_microbits
        if r.n_distinct == 1:
            assert r.entropy_microbits == 0
        else:
            assert r.entropy_microbits > 0
            assert 0.0 < r.uniformity <= 1.0


def test_ngram_novelty_first_doc_owns_everything(spark, tmp_path):
    """Planted: doc 1 is fully novel (first), doc 2 repeats doc 1 verbatim
    (novelty 0), doc 3 is half-borrowed."""
    import pandas as pd

    d = tmp_path / "sf"
    d.mkdir()
    orig = "alpha beta gamma delta epsilon"
    docs = [
        (1, orig, "s1"),
        (2, orig, "s2"),
        (3, f"{orig} zeta eta theta", "s3"),
    ]
    pd.DataFrame(
        {
            "doc_id": [r[0] for r in docs],
            "text": [r[1] for r in docs],
            "source": [r[2] for r in docs],
            "lang": ["en"] * 3,
            "tokens": [len(r[1].split()) for r in docs],
        }
    ).to_parquet(d / "documents.parquet")

    from pumle_spark.workload.text import text_ngram_novelty

    got = {r.source: (r.n_grams, r.n_novel) for r in text_ngram_novelty(spark, str(d)).collect()}
    assert got["s1"] == (3, 3)  # 5 tokens -> 3 distinct 3-grams, all first-seen
    assert got["s2"] == (3, 0)  # verbatim repeat of doc 1
    assert got["s3"] == (6, 3)  # 8 tokens -> 6 grams; 3 overlap doc 1's


def test_stream_sessionize_final_matches_batch_islands(spark):
    """Closed-input equivalence: the stateful streaming sessionizer's
    emitted intervals equal the batch gaps-and-islands sessionization."""
    from pumle_spark.tables import table
    from pumle_spark.workload.events import _SESSION_GAP_US, stream_sessionize_final
    from pyspark.sql import Window

    got = {
        (r.user_id, r.start_us, r.end_us, r.n_events)
        for r in stream_sessionize_final(spark, SF).collect()
    }
    e = table(spark, SF, "events").select("user_id", F.unix_micros("ts").alias("tus"))
    w = Window.partitionBy("user_id").orderBy("tus")
    flagged = e.withColumn(
        "new_sess",
        F.when(
            F.lag("tus").over(w).isNull()
            | (F.col("tus") - F.lag("tus").over(w) > _SESSION_GAP_US),
            1,
        ).otherwise(0),
    )
    sess = flagged.withColumn(
        "sid", F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    want = {
        (r.user_id, r.start_us, r.end_us, r.n_events)
        for r in sess.groupBy("user_id", "sid")
        .agg(
            F.min("tus").alias("start_us"),
            F.max("tus").alias("end_us"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select("user_id", "start_us", "end_us", "n_events")
        .collect()
    }
    assert got == want


def test_shiplag_survival_km_invariants(spark):
    """Risk sets shrink monotonically from the full line count, hazards
    stay in [0, 1e6] ppm, and log-survival only decreases."""
    from pumle_spark.tables import table
    from pumle_spark.workload.analytics import orders_shiplag_survival

    rows = orders_shiplag_survival(spark, SF).collect()
    assert rows
    n_lines = table(spark, SF, "lineitem").count()
    assert rows[0].n_risk <= n_lines
    prev_risk, prev_log = None, 0
    for r in rows:
        assert 0 < r.hazard_ppm <= 1_000_000
        if prev_risk is not None:
            assert r.n_risk < prev_risk  # events left the risk set
        assert r.cum_log_surv_micro <= prev_log
        prev_risk, prev_log = r.n_risk, r.cum_log_surv_micro
    # day-0 risk set is EVERY observed line (first event day may be > 0
    # only if no line ships day-0; then n_risk still equals the total)
    assert rows[0].n_risk + sum(0 for _ in ()) <= n_lines


# --------------------------------------------------------------------------
# round-5 wave 4: KS drift, BM25, association rules, seasonal decomposition
# --------------------------------------------------------------------------


def test_ks_two_sample_matches_bruteforce(spark):
    """The bucketed two-level prefix sum must equal the naive driver-side
    KS computation over the same two samples."""
    from pumle_spark.tables import table
    from pumle_spark.workload.drift import drift_ks_two_sample

    row = drift_ks_two_sample(spark, SF).collect()[0]
    o = (
        table(spark, SF, "orders")
        .filter(F.col("o_orderstatus").isin("F", "O"))
        .select("o_totalprice", "o_orderstatus")
        .collect()
    )
    a = sorted(r.o_totalprice for r in o if r.o_orderstatus == "F")
    b = sorted(r.o_totalprice for r in o if r.o_orderstatus == "O")
    na, nb = len(a), len(b)
    best, at = -1, None
    for v in sorted(set(a) | set(b)):
        cfa = sum(1 for x in a if x <= v)
        cfb = sum(1 for x in b if x <= v)
        d = abs(cfa * nb - cfb * na)
        if d > best:
            best, at = d, v
    assert (row.n_f, row.n_o) == (na, nb)
    assert row.d_scaled == best
    assert row.at_value == at
    assert row.d_ppm == best * 1_000_000 // (na * nb)


def test_bm25_ranks_match_bruteforce(spark):
    """Quantized BM25 scores and the top-k cut must match a pure-Python
    scorer over the tokenized corpus."""
    import math
    from collections import Counter

    from pumle_spark.tables import table
    from pumle_spark.workload.text import (
        _BM25_B,
        _BM25_K1,
        _BM25_QUERIES,
        _BM25_TOPK,
        text_bm25_topk,
    )
    from pumle_spark.operators.dedup import normalize_text

    got = [
        (r.query_id, r.doc_id, r.score_micro, r.rnk)
        for r in text_bm25_topk(spark, SF).collect()
    ]
    docs = (
        table(spark, SF, "documents")
        .select("doc_id", normalize_text("text").alias("ws"))
        .collect()
    )
    toks = {r.doc_id: [t for t in r.ws if t] for r in docs}
    nd = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / nd
    tf = {d: Counter(ts) for d, ts in toks.items()}
    want = []
    for qid, terms in _BM25_QUERIES:
        df = {t: sum(1 for d in tf if tf[d][t] > 0) for t in terms}
        scores = {}
        for d, cnts in tf.items():
            s = 0
            for t in terms:
                c = cnts[t]
                if c == 0 or df[t] == 0:
                    continue
                idf = math.log(1.0 + (nd - df[t] + 0.5) / (df[t] + 0.5))
                contrib = (
                    idf
                    * (c * (_BM25_K1 + 1.0))
                    / (c + _BM25_K1 * (1.0 - _BM25_B + _BM25_B * len(toks[d]) / avgdl))
                )
                # Python round() is banker's; match the engines' HALF_UP
                s += int(math.floor(contrib * 1_000_000 + 0.5))
            if s:
                scores[d] = s
        top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:_BM25_TOPK]
        want += [(qid, d, s, i + 1) for i, (d, s) in enumerate(top)]
    assert got == want


def test_association_rules_confidence_and_lift(spark):
    """Every emitted rule must satisfy the support floor, directional
    confidence = n_both/n_ante, and exact integer lift."""
    from pumle_spark.tables import table
    from pumle_spark.workload.relational2 import _AR_MINPAIR, basket_association_rules

    rows = basket_association_rules(spark, SF).collect()
    op = {
        (r.l_orderkey, r.l_partkey)
        for r in table(spark, SF, "lineitem").select("l_orderkey", "l_partkey").collect()
    }
    n_orders = len({o for o, _ in op})
    from collections import Counter

    pcnt = Counter(p for _, p in op)
    by_order = {}
    for o, p in op:
        by_order.setdefault(o, set()).add(p)
    pair = Counter()
    for parts in by_order.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                pair[(ps[i], ps[j])] += 1
    for r in rows:
        key = (min(r.ante_part, r.cons_part), max(r.ante_part, r.cons_part))
        assert pair[key] == r.n_both >= _AR_MINPAIR
        assert pcnt[r.ante_part] == r.n_ante
        n_rows, n_parts = len(op), len(pcnt)
        assert r.n_ante * n_parts >= n_rows and r.n_cons * n_parts >= n_rows
        assert r.conf_ppm == r.n_both * 1_000_000 // r.n_ante
        assert r.lift_ppm == r.n_both * n_orders * 1_000_000 // (r.n_ante * r.n_cons)
    # both directions of a surviving pair carry the same n_both
    lifts = [r.lift_ppm for r in rows]
    assert lifts == sorted(lifts, reverse=True)


def test_decomposition_reconstructs_and_centers(spark):
    """rev = trend + seasonal + remainder wherever trend is defined; the
    2x12 MA matches a brute-force recomputation; seasonal indices are
    centered to ~0 (|mean| <= 1 cent after integer rounding)."""
    from pumle_spark.workload.analytics import decomp_monthly_revenue

    rows = decomp_monthly_revenue(spark, SF).collect()
    assert len(rows) >= 24
    rev = [r.rev_cents for r in rows]
    for i, r in enumerate(rows):
        if r.trend_cents is None:
            assert i < 6 or i >= len(rows) - 6
            assert r.remainder_cents is None
            continue
        want_trend = (rev[i - 6] + rev[i + 6] + 2 * sum(rev[i - 5 : i + 6])) // 24
        assert r.trend_cents == want_trend
        assert r.rev_cents - r.trend_cents - r.seasonal_cents == r.remainder_cents
    seas = {r.month.month: r.seasonal_cents for r in rows}
    assert len(seas) == 12
    assert abs(sum(seas.values())) <= 12  # centered to within 1 cent/index


def test_label_centroids_match_numpy(spark):
    """Integer-quantized centroid cosines must match a NumPy recomputation
    under the same quantization."""
    import numpy as np

    from pumle_spark.tables import table
    from pumle_spark.workload.similarity import embedding_label_centroids

    rows = embedding_label_centroids(spark, SF).collect()
    raw = table(spark, SF, "embeddings").select("label", "embedding").collect()
    by_label = {}
    for r in raw:
        micro = [int(np.floor(float(x) * 1_000_000 + 0.5)) if x >= 0
                 else -int(np.floor(-float(x) * 1_000_000 + 0.5))
                 for x in r.embedding]
        by_label.setdefault(r.label, []).append(micro)
    cents = {}
    for lbl, vecs in by_label.items():
        sums = [sum(col) for col in zip(*vecs)]
        n = len(vecs)
        # truncation toward zero, matching Spark `div` / DuckDB `//`
        cents[lbl] = ([s // n if s >= 0 else -((-s) // n) for s in sums], n)
    labels = sorted(cents)
    assert len(rows) == len(labels) * (len(labels) - 1) // 2
    for r in rows:
        ca, na = cents[r.label_a]
        cb, nb = cents[r.label_b]
        assert (r.n_vecs_a, r.n_vecs_b) == (na, nb)
        dot = sum(x * y for x, y in zip(ca, cb))
        va = sum(x * x for x in ca)
        vb = sum(y * y for y in cb)
        want = round(dot / ((va ** 0.5) * (vb ** 0.5)), 6)
        assert abs(r.centroid_cos - want) <= 1e-6


def test_cluster_aware_split_has_zero_leakage(spark):
    """Every verified near-dup pair must land in one split under the
    rep-keyed assignment; the naive counterfactual is reported; split
    sizes cover the corpus."""
    from pumle_spark.tables import table
    from pumle_spark.workload.curation import split_cluster_aware

    rows = {r.split: r for r in split_cluster_aware(spark, SF).collect()}
    assert set(rows) <= {"train", "val", "test"}
    n_docs = table(spark, SF, "documents").count()
    assert sum(r.n_docs for r in rows.values()) == n_docs
    for r in rows.values():
        assert r.leak_pairs_cluster == 0
        assert r.n_groups <= r.n_docs
    # leak columns are global constants, identical on every row
    assert len({r.leak_pairs_naive for r in rows.values()}) == 1


def test_rrf_fusion_is_rank_consistent(spark):
    """RRF scores must equal 1e6/(k+r1) + 1e6/(k+r2) for the emitted
    ranks, ranks must be unique per query within each ranker, and the
    top-k ordering must follow rrf_micro desc, doc_id asc."""
    from pumle_spark.workload.text import _RRF_K, retrieval_rrf_fusion

    rows = retrieval_rrf_fusion(spark, SF).collect()
    assert rows
    by_q = {}
    for r in rows:
        assert r.rrf_micro == 1_000_000 // (_RRF_K + r.rank_bm25) + 1_000_000 // (
            _RRF_K + r.rank_cos
        )
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        rs = sorted(rs, key=lambda r: r.rnk)
        keys = [(-r.rrf_micro, r.doc_id) for r in rs]
        assert keys == sorted(keys)
        assert [r.rnk for r in rs] == list(range(1, len(rs) + 1))


def test_markov_removal_attribution_invariants(spark):
    """Removing any channel can only lower conversion probability; the
    attribution shares are a partition of ~1e6 ppm; clamping semantics:
    a channel's own removal row never credits paths through it."""
    from pumle_spark.workload.events import attribution_markov_removal

    rows = attribution_markov_removal(spark, SF).collect()
    assert rows
    base = rows[0].base_conv_ppb
    assert all(r.base_conv_ppb == base for r in rows)
    assert 0 < base <= 1_000_000_000
    tot_re = sum(r.removal_effect_ppb for r in rows)
    for r in rows:
        assert 0 <= r.p_conv_removed_ppb <= base  # removal never helps
        assert r.removal_effect_ppb == base - r.p_conv_removed_ppb
        if tot_re:
            assert r.attribution_ppm == r.removal_effect_ppb * 1_000_000 // tot_re
    if tot_re:
        s = sum(r.attribution_ppm for r in rows)
        assert 1_000_000 - len(rows) <= s <= 1_000_000  # floor-div remainder only


def test_heaps_law_checkpoints_match_bruteforce(spark):
    """Cumulative vocab/token counts at every checkpoint must equal the
    naive ingestion-order scan; checkpoints are evenly spaced."""
    from pumle_spark.tables import table
    from pumle_spark.operators.dedup import normalize_text
    from pumle_spark.workload.text import _HEAPS_CKPTS, text_heaps_law

    rows = text_heaps_law(spark, SF).collect()
    docs = sorted(
        (
            (r.doc_id, [t for t in r.ws if t])
            for r in table(spark, SF, "documents")
            .select("doc_id", normalize_text("text").alias("ws"))
            .collect()
        )
    )
    assert len(rows) == min(_HEAPS_CKPTS, len(docs))
    seen, cum_t = set(), 0
    cums = {}
    for i, (doc_id, toks) in enumerate(docs, 1):
        cum_t += len(toks)
        seen |= set(toks)
        cums[doc_id] = (i, cum_t, len(seen))
    for r in rows:
        assert (r.n_docs_seen, r.cum_tokens, r.cum_vocab) == cums[r.ckpt_doc_id]
    assert rows[-1].n_docs_seen == len(docs)  # last checkpoint = full corpus


def test_calibration_report_exact(spark):
    """Bin means, observed rates, and ECE must match a driver-side
    recomputation under the same quantization."""
    from pumle_spark.tables import table
    from pumle_spark.workload.events import _CAL_BINS, events_calibration_report

    rows = events_calibration_report(spark, SF).collect()
    ev = table(spark, SF, "events").select("value", "event_type").collect()
    vmax = max(r.value for r in ev)
    import math

    bins = {}
    for r in ev:
        b = min(int(math.floor(r.value / vmax * _CAL_BINS)), _CAL_BINS - 1)
        s = int(math.floor(r.value / vmax * 1_000_000 + 0.5))
        y = 1 if r.event_type == "purchase" else 0
        n, ss, pos = bins.get(b, (0, 0, 0))
        bins[b] = (n + 1, ss + s, pos + y)
    wgap = nn = 0
    expect = {}
    for b, (n, ss, pos) in bins.items():
        ms, orate = ss // n, pos * 1_000_000 // n
        expect[b] = (n, pos, ms, orate, abs(ms - orate))
        wgap += n * abs(ms - orate)
        nn += n
    assert len(rows) == len(bins)
    for r in rows:
        assert (r.n, r.pos, r.mean_score_micro, r.obs_rate_micro, r.gap_micro) == expect[r.bin]
        assert r.ece_micro == wgap // nn


def test_lpa_communities_match_bruteforce(spark):
    """Four synchronous LPA rounds recomputed in pure Python (max-count,
    min-label tiebreak) must yield the same community histogram."""
    from collections import Counter, defaultdict

    from pumle_spark.tables import table
    from pumle_spark.workload.graph import _LPA_ITERS, graph_lpa_communities

    rows = graph_lpa_communities(spark, SF).collect()
    o = {
        r.o_orderkey: r.o_custkey
        for r in table(spark, SF, "orders").select("o_orderkey", "o_custkey").collect()
    }
    li = table(spark, SF, "lineitem").select("l_orderkey", "l_suppkey").collect()
    pairs = {(o[r.l_orderkey], r.l_suppkey) for r in li if r.l_orderkey in o}
    adj = defaultdict(list)
    for c, s in pairs:
        adj[2 * s + 1].append(2 * c)
        adj[2 * c].append(2 * s + 1)
    labels = {n: n for n in adj}
    for _ in range(_LPA_ITERS):
        nxt = {}
        for node, nbrs in adj.items():
            cnt = Counter(labels[nb] for nb in nbrs)
            best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
            nxt[node] = best[0]
        labels = nxt
    want = Counter(labels.values())
    got = {r.community: r.n_members for r in rows}
    top = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert got == dict(top)
    assert rows[0].n_communities == len(want)
    assert rows[0].n_nodes == len(adj)
