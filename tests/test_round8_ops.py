"""Round-8 operator tests: pure-python re-derivations against sf0.001,
following the round-4..7 replay-test pattern — each query's math is redone
row-by-row in python (hashlib md5, exact integer arithmetic) and compared
to the collected Spark result."""

from __future__ import annotations

import hashlib
import math
import re

SF = "/root/testdata/sf0.001"


def _toks(text: str) -> list[str]:
    s = re.sub(r"[^a-z0-9]+", " ", text.lower()).strip()
    return s.split(" ") if s else []


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_exact_substring_spans_match_python_islands(spark):
    """Replay: k-gram hashes per doc, cross-doc duplicated grams, island
    merge — the span set must match exactly, and every span must really
    occur verbatim in >= 2 documents."""
    from pumle_spark.tables import table
    from pumle_spark.workload.dedup import _ES_GRAM, dedup_exact_substring

    docs = {
        r.doc_id: _toks(r.text)
        for r in table(spark, SF, "documents").select("doc_id", "text").collect()
    }
    k = _ES_GRAM
    gram_docs: dict[str, set[int]] = {}
    positions: dict[int, list[int]] = {}
    for did, ws in docs.items():
        for i in range(len(ws) - k + 1):
            h = _md5(" ".join(ws[i : i + k]))
            gram_docs.setdefault(h, set()).add(did)
    for did, ws in docs.items():
        pos = [
            i + 1
            for i in range(len(ws) - k + 1)
            if len(gram_docs[_md5(" ".join(ws[i : i + k]))]) >= 2
        ]
        if pos:
            positions[did] = pos
    expect = set()
    for did, pos in positions.items():
        start = prev = pos[0]
        for p in pos[1:]:
            if p == prev + 1:
                prev = p
                continue
            expect.add((did, start, prev - start + k))
            start = prev = p
        expect.add((did, start, prev - start + k))

    got = {
        (r.doc_id, r.span_start, r.span_tokens)
        for r in dedup_exact_substring(spark, SF).collect()
    }
    assert got == expect
    # spot-check: a reported span really is a verbatim cross-doc substring
    did, start, length = sorted(got)[0]
    span = " ".join(docs[did][start - 1 : start - 1 + k])  # leading k-gram
    holders = {d for d, ws in docs.items() if span in " ".join(ws)}
    assert len(holders) >= 2


def test_kneser_ney_matches_python_lm(spark):
    """Replay the interpolated-KN bigram model and the micro-quantization
    contract; the top-25 rows must match exactly."""
    from pumle_spark.tables import table
    from pumle_spark.workload.text import _KN_D, _KN_TOP, text_kneser_ney_logprob

    docs = {
        r.doc_id: _toks(r.text)
        for r in table(spark, SF, "documents").select("doc_id", "text").collect()
    }
    c2: dict[tuple[str, str], int] = {}
    for ws in docs.values():
        for a, b in zip(ws, ws[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
    c1: dict[str, int] = {}
    n1p: dict[str, int] = {}
    cont: dict[str, int] = {}
    for (a, b), c in c2.items():
        c1[a] = c1.get(a, 0) + c
        n1p[a] = n1p.get(a, 0) + 1
        cont[b] = cont.get(b, 0) + 1
    n_types = len(c2)

    expect = {}
    for did, ws in docs.items():
        if len(ws) < 2:
            continue
        nll = 0
        for a, b in zip(ws, ws[1:]):
            p = (c2[(a, b)] - _KN_D) / c1[a] + (_KN_D * n1p[a] / c1[a]) * (cont[b] / n_types)
            nll += round(-math.log(p) * 1_000_000)
        nb = len(ws) - 1
        expect[did] = (nb, nll, nll // nb)

    rows = text_kneser_ney_logprob(spark, SF).collect()
    assert len(rows) == _KN_TOP
    order = sorted(expect.items(), key=lambda kv: (-kv[1][2], kv[0]))[:_KN_TOP]
    assert [(r.doc_id, r.n_bigrams, r.nll_micro, r.avg_nll_micro) for r in rows] == [
        (did, nb, nll, avg) for did, (nb, nll, avg) in order
    ]
    # KN probabilities are a proper distribution per context (sums to 1)
    some_prev = next(iter(c1))
    mass = sum(
        (c2[(a, b)] - _KN_D) / c1[a] + (_KN_D * n1p[a] / c1[a]) * (cont[b] / n_types)
        for (a, b) in c2
        if a == some_prev
    )
    assert abs(mass - 1.0) < 1e-9


def test_fdr_bh_replays_and_satisfies_stepup(spark):
    """Replay arms/moments in python; z must match to 6dp, and the
    rejected set must equal the BH step-up rule applied to the p-values."""
    from pumle_spark.tables import table
    from pumle_spark.workload.experiments import _BH_ALPHA, _BH_CONV_CENTS, abtest_fdr_bh

    events = table(spark, SF, "events").select("user_id", "event_type", "value").collect()
    users = sorted({r.user_id for r in events})
    arm = {
        u: ("control" if int(_md5(f"fdr|{u}")[:4], 16) % 100 < 50 else "treatment")
        for u in users
    }
    n_arm = {a: sum(1 for u in users if arm[u] == a) for a in ("control", "treatment")}
    pu: dict[tuple[str, str, int], int] = {}
    for r in events:
        key = (r.event_type, arm[r.user_id], r.user_id)
        pu[key] = pu.get(key, 0) + round(r.value * 100)
    cells: dict[tuple[str, str], tuple[int, int, int]] = {}
    for (et, a, _u), v in pu.items():
        u0, s1, s2 = cells.get((et, a), (0, 0, 0))
        cells[(et, a)] = (u0 + (1 if v > _BH_CONV_CENTS else 0), s1 + v, s2 + v * v)

    def var(s1, s2, n):
        return (n * s2 - s1 * s1) / (n * n)

    expect_z = {}
    for et in sorted({k[0] for k in cells}):
        ut, s1t, s2t = cells[(et, "treatment")]
        uc, s1c, s2c = cells[(et, "control")]
        nt, nc = n_arm["treatment"], n_arm["control"]
        se2 = var(s1t, s2t, nt) / nt + var(s1c, s2c, nc) / nc
        if se2 > 0:
            expect_z[("mean_value", et)] = (s1t / nt - s1c / nc) / math.sqrt(se2)
        if 0 < ut + uc < nt + nc:
            pooled = (ut + uc) / (nt + nc)
            expect_z[("conversion", et)] = (ut / nt - uc / nc) / math.sqrt(
                pooled * (1 - pooled) * (1 / nt + 1 / nc)
            )

    rows = abtest_fdr_bh(spark, SF).collect()
    assert {(r.metric_kind, r.event_type) for r in rows} == set(expect_z)
    for r in rows:
        assert abs(r.z - expect_z[(r.metric_kind, r.event_type)]) < 1e-5
        # p is the erfc table value at the quantized |z|
        zq = min(round(abs(expect_z[(r.metric_kind, r.event_type)]) * 50), 300)
        assert abs(r.p_two - math.erfc((zq / 50.0) / math.sqrt(2))) < 1e-7
    # BH step-up on the reported p-values reproduces the rejected set
    ps = sorted((r.p_two, r.metric_kind, r.event_type) for r in rows)
    m = len(ps)
    kstar = max(
        (i + 1 for i, (p, *_k) in enumerate(ps) if p * m <= _BH_ALPHA * (i + 1)),
        default=0,
    )
    rejected = {(mk, et) for p, mk, et in ps[:kstar]}
    assert {(r.metric_kind, r.event_type) for r in rows if r.rejected} == rejected


def test_mann_whitney_matches_naive_rank_sum(spark):
    """Replay with the NAIVE per-row average-rank definition — the
    histogram formulation must agree exactly on U, and on z to 6dp."""
    from pumle_spark.tables import table
    from pumle_spark.workload.experiments import _MW_A, _MW_B, stats_mann_whitney

    li = (
        table(spark, SF, "lineitem")
        .select("l_quantity", "l_returnflag")
        .collect()
    )
    xs = [(int(r.l_quantity), r.l_returnflag) for r in li if r.l_returnflag in (_MW_A, _MW_B)]
    vals = sorted(v for v, _g in xs)
    # average rank per value (1-based)
    first = {}
    for i, v in enumerate(vals):
        first.setdefault(v, i + 1)
    count = {}
    for v, _g in xs:
        count[v] = count.get(v, 0) + 1
    avg_rank = {v: first[v] + (count[v] - 1) / 2 for v in count}
    n1 = sum(1 for _v, g in xs if g == _MW_A)
    n2 = len(xs) - n1
    w1 = sum(avg_rank[v] for v, g in xs if g == _MW_A)
    u1 = w1 - n1 * (n1 + 1) / 2
    n = n1 + n2
    ties = sum(t**3 - t for t in count.values())
    var_u = (n1 * n2 / 12) * ((n + 1) - ties / (n * (n - 1)))
    z = (u1 - n1 * n2 / 2) / math.sqrt(var_u)

    row = stats_mann_whitney(spark, SF).collect()[0]
    assert (row.n1, row.n2) == (n1, n2)
    assert row.u1 == int(u1)  # exact: 2*W1 is always an integer
    assert abs(row.z - z) < 1e-5
    assert row.significant == (abs(z) > 1.96)


def test_randomized_response_mechanism_and_estimator(spark):
    """Replay the forced-response mechanism per customer and the debiased
    estimator identity π̂ = (8·yes − n)/(6n)."""
    from pumle_spark.tables import table
    from pumle_spark.workload.experiments import _RR_TRUTH_PCT, privacy_randomized_response

    cust = table(spark, SF, "customer").select("c_custkey", "c_acctbal", "c_nationkey").collect()
    nat = {r.n_nationkey: r.n_name for r in table(spark, SF, "nation").collect()}
    agg: dict[str, list[int]] = {}
    for r in cust:
        h = _md5(f"rr|{r.c_custkey}")
        truth = 1 if r.c_acctbal < 0 else 0
        if int(h[:4], 16) % 100 < _RR_TRUTH_PCT:
            rep = truth
        else:
            rep = int(h[4], 16) % 2
        a = agg.setdefault(nat[r.c_nationkey], [0, 0, 0])
        a[0] += 1
        a[1] += truth
        a[2] += rep
    rows = privacy_randomized_response(spark, SF).collect()
    assert {r.n_name for r in rows} == set(agg)
    for r in rows:
        n, ty, ry = agg[r.n_name]
        assert (r.n, r.true_yes, r.reported_yes) == (n, ty, ry)
        assert abs(r.est_pi - (8 * ry - n) / (6 * n)) < 5e-7  # 6dp rounding
        assert abs(r.est_err - (r.est_pi - r.true_pi)) < 2e-6


def test_group_kfold_is_leakage_safe_and_balanced(spark):
    """Every order of a customer lands in one fold (replayed hash), folds
    partition the rows, and the audit columns are the exact integer ppm."""
    from pumle_spark.tables import table
    from pumle_spark.workload.sampling import _GKF_K, split_group_kfold

    orders = table(spark, SF, "orders").select("o_custkey", "o_totalprice").collect()
    fold_of = lambda ck: int(_md5(f"gkf|{ck}")[:8], 16) % _GKF_K  # noqa: E731
    per_fold: dict[int, list[int]] = {}
    groups: dict[int, set[int]] = {}
    for r in orders:
        f = fold_of(r.o_custkey)
        a = per_fold.setdefault(f, [0, 0])
        a[0] += 1
        a[1] += round(r.o_totalprice * 100)
        groups.setdefault(f, set()).add(r.o_custkey)
    all_rows = sum(a[0] for a in per_fold.values())
    all_cents = sum(a[1] for a in per_fold.values())

    rows = {r.fold: r for r in split_group_kfold(spark, SF).collect()}
    assert set(rows) == set(per_fold)
    for f, r in rows.items():
        assert r.n_rows == per_fold[f][0]
        assert r.n_groups == len(groups[f])
        assert r.row_share_ppm == per_fold[f][0] * 1_000_000 // all_rows
        assert r.value_share_ppm == per_fold[f][1] * 1_000_000 // all_cents
        assert r.row_excess_vs_uniform == per_fold[f][0] * _GKF_K - all_rows
    assert sum(r.n_rows for r in rows.values()) == all_rows


def test_bloom_skipping_invariants_and_truth(spark):
    """Bloom filters admit false positives only: for every probe,
    true_files <= bloom_scan <= zonemap_scan <= n_files, and the truth
    column matches a python replay of per-file key sets."""
    from pumle_spark.tables import table
    from pumle_spark.workload.layout import _LBS_FILES, _LBS_PROBE_STRIDE, layout_bloom_skipping

    li = table(spark, SF, "lineitem").select("l_orderkey", "l_partkey", "l_suppkey").collect()
    mo = max(r.l_orderkey for r in li)
    span = mo // _LBS_FILES + 1
    file_keys: dict[int, set[tuple[int, int]]] = {}
    for r in li:
        file_keys.setdefault(r.l_orderkey // span, set()).add((r.l_partkey, r.l_suppkey))
    ns = max(r.s_suppkey for r in table(spark, SF, "supplier").collect())
    probes = {
        (pk, (pk * 7) % ns + 1)
        for pk in (r.p_partkey for r in table(spark, SF, "part").collect())
        if pk % _LBS_PROBE_STRIDE == 0
    }

    rows = layout_bloom_skipping(spark, SF).collect()
    assert {(r.probe_partkey, r.probe_suppkey) for r in rows} == probes
    for r in rows:
        truth = sum(
            1 for ks in file_keys.values() if (r.probe_partkey, r.probe_suppkey) in ks
        )
        assert r.true_files == truth
        assert truth <= r.bloom_scan_files <= r.zonemap_scan_files <= r.n_files
        assert r.files_saved == r.zonemap_scan_files - r.bloom_scan_files


def test_adc_rerank_refines_candidates_exactly(spark):
    """The reranked top-k must be exactly the best-k BY TRUE DISTANCE among
    the ADC top-C candidates, and exact_d2 must match a python recompute
    from the raw embeddings."""
    from pumle_spark.tables import table
    from pumle_spark.workload.similarity import (
        _RERANK_C,
        _TOP_K,
        _adc_scored,
        ann_adc_rerank,
    )

    emb = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in table(spark, SF, "embeddings").collect()
    }
    adc = _adc_scored(spark, SF).collect()
    cands: dict[int, list] = {}
    for r in adc:
        cands.setdefault(r.query_id, []).append((r.adc_d2, r.neighbor_id))
    expect = {}
    for q, lst in cands.items():
        top_c = [nid for _d, nid in sorted(lst)[:_RERANK_C]]
        scored = sorted(
            (
                round(sum((a - b) * (a - b) for a, b in zip(emb[q], emb[nid])), 6),
                nid,
            )
            for nid in top_c
        )
        expect[q] = scored[:_TOP_K]

    rows = ann_adc_rerank(spark, SF).collect()
    got: dict[int, list] = {}
    for r in rows:
        got.setdefault(r.query_id, []).append((r.rnk, r.exact_d2, r.neighbor_id))
    assert set(got) == set(expect)
    for q in expect:
        ordered = [(d, nid) for _rk, d, nid in sorted(got[q])]
        assert [nid for _d, nid in ordered] == [nid for _d, nid in expect[q]]
        for (dg, _ng), (de, _ne) in zip(ordered, expect[q]):
            assert abs(dg - de) < 2e-6  # both 6dp-rounded folds


def test_quality_funnel_first_fail_partition(spark):
    """Replay the first-fail staging per document; stage counts must
    partition each source exactly once (unlike the marginal per-rule
    dashboard), and token/doc shares must be exact ppm."""
    from pumle_spark.tables import table
    from pumle_spark.workload.text import (
        _GPH_MIN_STOP,
        _GPH_MIN_TOK,
        _GPH_MAX_TOK,
        _STOPWORDS,
        curation_quality_funnel,
    )

    en = set(_STOPWORDS["en"])
    agg: dict[tuple[str, str], list[int]] = {}
    src_tot: dict[str, list[int]] = {}
    for r in table(spark, SF, "documents").select("source", "text").collect():
        ws = _toks(r.text)
        n = len(ws)
        sumlen = sum(len(t) for t in ws)
        n_stop = sum(1 for t in ws if t in en)
        n_digit = sum(1 for t in ws if re.search(r"[0-9]", t))
        if n < _GPH_MIN_TOK:
            stage = "1_too_short"
        elif n > _GPH_MAX_TOK:
            stage = "2_too_long"
        elif 2 * sumlen > 9 * n or sumlen < 3 * n:
            stage = "3_mean_tok_len"
        elif n_stop < _GPH_MIN_STOP:
            stage = "4_low_stopword"
        elif 10 * n_digit > n:
            stage = "5_digit_heavy"
        else:
            stage = "6_kept"
        a = agg.setdefault((r.source, stage), [0, 0])
        a[0] += 1
        a[1] += n
        t = src_tot.setdefault(r.source, [0, 0])
        t[0] += 1
        t[1] += n

    rows = curation_quality_funnel(spark, SF).collect()
    assert {(r.source, r.stage) for r in rows} == set(agg)
    for r in rows:
        nd, nt = agg[(r.source, r.stage)]
        td, tt = src_tot[r.source]
        assert (r.n_docs, r.n_tokens) == (nd, nt)
        assert r.doc_share_ppm == nd * 1_000_000 // td
        assert r.token_share_ppm == nt * 1_000_000 // tt
    # partition property: per-source doc counts sum to the source total
    for src, (td, _tt) in src_tot.items():
        assert sum(r.n_docs for r in rows if r.source == src) == td


def test_cdc_chunking_matches_python_boundaries(spark):
    """Replay the rolling-hash boundaries and chunk hashes; per-source
    chunk/dup stats must match, and the content-anchoring property must
    hold: two docs sharing a long token run share interior chunks."""
    from pumle_spark.tables import table
    from pumle_spark.workload.dedup import _CDC_MASK, _CDC_W, dedup_cdc_chunking

    docs = [
        (r.doc_id, r.source, _toks(r.text))
        for r in table(spark, SF, "documents").select("doc_id", "source", "text").collect()
    ]
    chunk_count: dict[str, int] = {}
    per_chunk: list[tuple[str, str, int]] = []  # (source, hash, n_tokens)
    for _did, src, ws in docs:
        cur: list[str] = []
        chunks: list[list[str]] = []
        for i, w in enumerate(ws, start=1):
            cur.append(w)
            if i >= _CDC_W:
                roll = f"{ws[i - 3]} {ws[i - 2]} {w}|cdc"
                if int(_md5(roll)[:8], 16) % _CDC_MASK == 0:
                    chunks.append(cur)
                    cur = []
        if cur:
            chunks.append(cur)
        for ch in chunks:
            h = _md5(" ".join(ch))
            chunk_count[h] = chunk_count.get(h, 0) + 1
            per_chunk.append((src, h, len(ch)))

    expect: dict[str, list[int]] = {}
    for src, h, n in per_chunk:
        a = expect.setdefault(src, [0, 0, 0, 0])
        a[0] += 1
        a[1] += n
        if chunk_count[h] >= 2:
            a[2] += 1
            a[3] += n

    rows = {r.source: r for r in dedup_cdc_chunking(spark, SF).collect()}
    assert set(rows) == set(expect)
    for src, (nc, nt, dc, dt) in expect.items():
        r = rows[src]
        assert (r.n_chunks, r.n_tokens, r.dup_chunks, r.dup_tokens) == (nc, nt, dc, dt)
        assert r.dup_token_ppm == dt * 1_000_000 // nt


def test_dp_quantile_gumbel_argmax_and_accuracy_ordering(spark):
    """Replay the exponential-mechanism argmax per (eps, q) cell; the true
    quantile must match the exact empirical quantile, and the released
    value must equal the Gumbel-max replay."""
    from pumle_spark.tables import table
    from pumle_spark.workload.experiments import (
        _DPQ_EPS_MILLI,
        _DPQ_Q_MILLI,
        _GUM,
        privacy_dp_quantile,
    )

    qty = sorted(
        int(r.l_quantity) for r in table(spark, SF, "lineitem").select("l_quantity").collect()
    )
    n = len(qty)
    vals = sorted(set(qty))
    cum = {}
    run = 0
    cnt = {v: 0 for v in vals}
    for v in qty:
        cnt[v] += 1
    for v in vals:
        run += cnt[v]
        cum[v] = run
    gum = dict(_GUM)

    rows = {(r.eps_milli, r.q_milli): r for r in privacy_dp_quantile(spark, SF).collect()}
    assert set(rows) == {(e, q) for e in _DPQ_EPS_MILLI for q in _DPQ_Q_MILLI}
    for (e, q), r in rows.items():
        best = min(vals, key=lambda v: (abs(1000 * cum[v] - q * n), v))
        assert r.true_v == best
        scored = []
        for v in vals:
            u = -abs(1000 * cum[v] - q * n)
            g = gum[int(_md5(f"{v}|{e}|{q}|dpq")[:2], 16)]
            scored.append(((e / 1000.0) * (u / 1000.0) / 2.0 + g, -v))
        released = -max(scored)[1]
        assert r.released_v == released
        assert r.value_err == abs(released - best)
        assert r.n_rows == n


def test_permutation_test_replays_and_p_is_add_one(spark):
    """Replay all B+1 assignments; the observed diff, extreme count, and
    add-one Monte-Carlo p must match exactly."""
    from pumle_spark.tables import table
    from pumle_spark.workload.experiments import _PERM_B, stats_permutation_test

    per_cust: dict[int, int] = {}
    for r in table(spark, SF, "orders").select("o_custkey", "o_totalprice").collect():
        per_cust[r.o_custkey] = per_cust.get(r.o_custkey, 0) + round(r.o_totalprice * 100)

    def diff(b: int) -> float:
        st = sc = nt = nc = 0
        for ck, cents in per_cust.items():
            if int(_md5(f"perm|{b}|{ck}")[:4], 16) % 100 < 50:
                st += cents
                nt += 1
            else:
                sc += cents
                nc += 1
        return st / nt - sc / nc

    obs = diff(0)
    extreme = sum(1 for b in range(1, _PERM_B + 1) if abs(diff(b)) >= abs(obs))
    row = stats_permutation_test(spark, SF).collect()[0]
    assert abs(row.obs_diff_cents - obs) < 1e-3
    assert row.n_perms == _PERM_B
    assert row.n_extreme == extreme
    assert row.p_milli == (1 + extreme) * 1000 // (_PERM_B + 1)


def test_minhash_neighbors_candidates_and_exact_jaccard(spark):
    """Replay signatures, banding, candidate generation and the exact
    neighborhood Jaccard in python; the reported pair set and ppm values
    must match, and every reported pair must clear the threshold."""
    from pumle_spark.tables import table
    from pumle_spark.workload.graph import (
        _GMN_HASHES,
        _GMN_JACC_MIN_PPM,
        _GMN_ROWS,
        graph_minhash_neighbors,
    )

    o = {r.o_orderkey: r.o_custkey for r in table(spark, SF, "orders").collect()}
    adj: dict[int, set[int]] = {}
    for r in table(spark, SF, "lineitem").select("l_orderkey", "l_partkey").collect():
        ck = o[r.l_orderkey]
        adj.setdefault(ck, set()).add(r.l_partkey)

    def sig(ck):
        out = []
        for s in range(_GMN_HASHES):
            out.append(
                min(_md5(f"{s // 4}|{pk}")[8 * (s % 4) : 8 * (s % 4) + 8] for pk in adj[ck])
            )
        return out

    sigs = {ck: sig(ck) for ck in adj}
    buckets: dict[tuple[int, str], list[int]] = {}
    for ck, sg in sigs.items():
        for b in range(_GMN_HASHES // _GMN_ROWS):
            seeds = range(b * _GMN_ROWS, (b + 1) * _GMN_ROWS)
            key = _md5("|".join(f"{s}:{sg[s]}" for s in seeds))
            buckets.setdefault((b, key), []).append(ck)
    cand = set()
    for members in buckets.values():
        for i, a in enumerate(members):
            for b in members[i + 1 :]:
                cand.add((min(a, b), max(a, b)))
    expect = {}
    for a, b in cand:
        inter = len(adj[a] & adj[b])
        if inter == 0:
            continue
        ppm = inter * 1_000_000 // (len(adj[a]) + len(adj[b]) - inter)
        if ppm >= _GMN_JACC_MIN_PPM:
            expect[(a, b)] = (inter, len(adj[a]), len(adj[b]), ppm)

    rows = graph_minhash_neighbors(spark, SF).collect()
    got = {(r.cust_a, r.cust_b): (r.n_common, r.deg_a, r.deg_b, r.jaccard_ppm) for r in rows}
    assert got == expect
    assert all(v[3] >= _GMN_JACC_MIN_PPM for v in got.values())


def test_cms_heavy_change_never_underestimates_and_ranks_match(spark):
    """CMS min-over-rows per period must dominate the exact count
    (overcount-only invariant, per period) and the reported top-k must be
    the python replay's |est change| ranking."""
    from pumle_spark.tables import table
    from pumle_spark.workload.sketches import (
        _CMS_D,
        _CMS_W,
        _HC_TOPK,
        _HC_YEAR_A,
        _HC_YEAR_B,
        sketch_cms_heavy_change,
    )

    cells_a: dict[tuple[int, int], int] = {}
    cells_b: dict[tuple[int, int], int] = {}
    exact_a: dict[int, int] = {}
    exact_b: dict[int, int] = {}

    def cols(pk):
        h = _md5(str(pk))
        return [int(h[8 * i : 8 * i + 8], 16) % _CMS_W for i in range(_CMS_D)]

    for r in table(spark, SF, "lineitem").select("l_partkey", "l_shipdate").collect():
        y = r.l_shipdate.year
        if y == _HC_YEAR_A:
            tgt_c, tgt_e = cells_a, exact_a
        elif y == _HC_YEAR_B:
            tgt_c, tgt_e = cells_b, exact_b
        else:
            continue
        tgt_e[r.l_partkey] = tgt_e.get(r.l_partkey, 0) + 1
        for i, c in enumerate(cols(r.l_partkey)):
            tgt_c[(i, c)] = tgt_c.get((i, c), 0) + 1

    parts = [r.p_partkey for r in table(spark, SF, "part").collect()]
    est = {}
    for pk in parts:
        cs = cols(pk)
        ea = min(cells_a.get((i, c), 0) for i, c in enumerate(cs))
        eb = min(cells_b.get((i, c), 0) for i, c in enumerate(cs))
        est[pk] = (ea, eb)
        assert ea >= exact_a.get(pk, 0) and eb >= exact_b.get(pk, 0)  # overcount-only

    order = sorted(parts, key=lambda p: (-abs(est[p][1] - est[p][0]), p))[:_HC_TOPK]
    rows = sketch_cms_heavy_change(spark, SF).collect()
    assert [r.p_partkey for r in sorted(rows, key=lambda r: r.rnk)] == order
    for r in rows:
        ea, eb = est[r.p_partkey]
        assert (r.est_a, r.est_b) == (ea, eb)
        assert r.exact_a == exact_a.get(r.p_partkey, 0)
        assert r.exact_b == exact_b.get(r.p_partkey, 0)
        assert r.est_abs_err == abs(r.est_change - r.exact_change)


def test_wasserstein_matches_python_integral(spark):
    """Replay W1 = ∫|F_A − F_B| over the cent grid in python; the exact
    rational must match to the 4dp output rounding, and W1 must be
    bounded by the mean absolute difference of the supports."""
    from pumle_spark.tables import table
    from pumle_spark.workload.drift import drift_wasserstein_1d

    a, b = [], []
    for r in table(spark, SF, "orders").select("o_totalprice", "o_orderstatus").collect():
        if r.o_orderstatus == "F":
            a.append(round(r.o_totalprice * 100))
        elif r.o_orderstatus == "O":
            b.append(round(r.o_totalprice * 100))
    vals = sorted(set(a) | set(b))
    from collections import Counter

    ca, cb = Counter(a), Counter(b)
    na, nb = len(a), len(b)
    cum_a = cum_b = 0
    numer = 0
    for v, nxt in zip(vals, vals[1:]):
        cum_a += ca.get(v, 0)
        cum_b += cb.get(v, 0)
        numer += abs(cum_a * nb - cum_b * na) * (nxt - v)

    row = drift_wasserstein_1d(spark, SF).collect()[0]
    assert (row.na, row.nb, row.n_values) == (na, nb, len(vals))
    assert abs(row.w1_cents - numer / (na * nb)) < 1e-3
    # sanity: W1 can't exceed the support span
    assert 0 <= row.w1_cents <= vals[-1] - vals[0]


def test_dedup_cascade_stages_partition_and_match_replay(spark):
    """Replay both stages in python (exact-normalized keep-lowest, then
    LSH candidates + exact Jaccard with the anchor-wins rule); the three
    stage rows must match exactly and partition the corpus."""
    from pumle_spark.tables import table
    from pumle_spark.workload.curation import _CSC_J_PPM, curation_dedup_cascade

    docs = {
        r.doc_id: _toks(r.text)
        for r in table(spark, SF, "documents").select("doc_id", "text").collect()
    }
    norm_h: dict[str, list[int]] = {}
    for did, ws in docs.items():
        norm_h.setdefault(_md5(" ".join(ws)), []).append(did)
    removed_exact = {d for grp in norm_h.values() for d in grp if d != min(grp)}

    sh = {
        did: {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}
        for did, ws in docs.items()
        if len(ws) >= 3
    }

    def sig(did):
        return [
            min(_md5(f"{s // 4}|{x}")[8 * (s % 4) : 8 * (s % 4) + 8] for x in sh[did])
            for s in range(8)
        ]

    sigs = {d: sig(d) for d in sh}
    buckets: dict[tuple[int, str], list[int]] = {}
    for d, sg in sigs.items():
        for bband in range(4):
            seeds = range(bband * 2, bband * 2 + 2)
            buckets.setdefault(
                (bband, _md5("|".join(f"{s}:{sg[s]}" for s in seeds))), []
            ).append(d)
    survivors = set(docs) - removed_exact
    removed_near = set()
    for members in buckets.values():
        for i, x in enumerate(members):
            for y in members[i + 1 :]:
                lo, hi = min(x, y), max(x, y)
                if lo not in survivors or hi not in survivors:
                    continue
                inter = len(sh[lo] & sh[hi])
                if inter and inter * 1_000_000 // (len(sh[lo]) + len(sh[hi]) - inter) >= _CSC_J_PPM:
                    removed_near.add(hi)

    expect = {"1_exact_dup": [0, 0], "2_near_dup": [0, 0], "3_kept": [0, 0]}
    for did, ws in docs.items():
        stage = (
            "1_exact_dup"
            if did in removed_exact
            else "2_near_dup"
            if did in removed_near
            else "3_kept"
        )
        expect[stage][0] += 1
        expect[stage][1] += len(ws)

    rows = {r.stage: r for r in curation_dedup_cascade(spark, SF).collect()}
    assert set(rows) == set(expect)
    all_docs = len(docs)
    all_tokens = sum(len(ws) for ws in docs.values())
    for stage, (nd, nt) in expect.items():
        r = rows[stage]
        assert (r.n_docs, r.n_tokens) == (nd, nt), stage
        assert r.doc_share_ppm == nd * 1_000_000 // all_docs
        assert r.token_share_ppm == nt * 1_000_000 // all_tokens
    assert sum(r.n_docs for r in rows.values()) == all_docs


def test_bpe_train_merges_matches_python_trainer(spark):
    """Replay: Sennrich Algorithm-1 BPE trainer in pure python (word-freq
    table, count→argmax→greedy-merge for {k} rounds) — the merge SEQUENCE,
    each pair's selection-time count, and the post-merge corpus symbol
    totals must all match exactly. Also locks the greedy non-overlap rule
    the doubled-delimiter replace() encodes (self-pair 'aaa' → ['aa','a'])."""
    from collections import Counter

    from pumle_spark.tables import table
    from pumle_spark.workload.text import _BPE_MERGES, text_bpe_train_merges

    wf: Counter[str] = Counter()
    for r in table(spark, SF, "documents").select("text").collect():
        for w in _toks(r.text):
            if w:
                wf[w] += 1

    words: dict[str, list[str]] = {w: list(w) for w in wf}
    expect = []
    for step in range(1, _BPE_MERGES + 1):
        cnt: Counter[tuple[str, str]] = Counter()
        for w, syms in words.items():
            f = wf[w]
            for i in range(len(syms) - 1):
                cnt[(syms[i], syms[i + 1])] += f
        best = min(cnt, key=lambda p: (-cnt[p], p[0], p[1]))
        for w, syms in words.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
        total = sum(wf[w] * len(syms) for w, syms in words.items())
        expect.append(
            (step, best[0], best[1], best[0] + best[1], cnt[best], total)
        )

    got = [tuple(r) for r in text_bpe_train_merges(spark, SF).collect()]
    assert got == expect
    # the greedy rule itself, in isolation: overlapping self-pairs merge
    # left-to-right without reuse
    syms, out, i = list("aaa"), [], 0
    while i < len(syms):
        if i + 1 < len(syms) and (syms[i], syms[i + 1]) == ("a", "a"):
            out.append("aa")
            i += 2
        else:
            out.append(syms[i])
            i += 1
    assert out == ["aa", "a"]


def test_repeated_ngrams_matches_python_census(spark):
    """Replay: the full 8-gram census in pure python — counts, distinct
    docs, source ownership with lexicographic tiebreak, ppm share, and
    the (count DESC, span ASC) report cut must match exactly."""
    from collections import Counter, defaultdict

    from pumle_spark.tables import table
    from pumle_spark.workload.text import _RNG_N, _RNG_TOP, text_repeated_ngrams

    occ: Counter[str] = Counter()
    docs_of: dict[str, set[int]] = defaultdict(set)
    by_src: dict[str, Counter] = defaultdict(Counter)
    for r in (
        table(spark, SF, "documents").select("doc_id", "source", "text").collect()
    ):
        ws = _toks(r.text)
        for i in range(len(ws) - _RNG_N + 1):
            g = " ".join(ws[i : i + _RNG_N])
            occ[g] += 1
            docs_of[g].add(r.doc_id)
            by_src[g][r.source] += 1

    expect = []
    for g, c in occ.items():
        if c < 2:
            continue
        top_src = min(by_src[g], key=lambda s: (-by_src[g][s], s))
        tc = by_src[g][top_src]
        expect.append(
            (g, c, len(docs_of[g]), len(by_src[g]), top_src, tc, tc * 1_000_000 // c)
        )
    expect.sort(key=lambda t: (-t[1], t[0]))
    expect = expect[:_RNG_TOP]

    got = [tuple(r) for r in text_repeated_ngrams(spark, SF).collect()]
    assert got == expect


def test_bpe_encode_fertility_matches_python_apply(spark):
    """Replay: train the 8 merges in pure python (same trainer as the
    text_bpe_train_merges replay), apply them to every distinct word, and
    re-derive the per-source token/char/symbol rollups and both quantized
    ratios exactly."""
    from collections import Counter, defaultdict

    from pumle_spark.tables import table
    from pumle_spark.workload.text import _BPE_MERGES, text_bpe_encode_fertility

    wf: Counter[str] = Counter()
    per_src: dict[str, Counter] = defaultdict(Counter)
    for r in table(spark, SF, "documents").select("source", "text").collect():
        for w in _toks(r.text):
            if w:
                wf[w] += 1
                per_src[r.source][w] += 1

    words: dict[str, list[str]] = {w: list(w) for w in wf}
    for _ in range(_BPE_MERGES):
        cnt: Counter[tuple[str, str]] = Counter()
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                cnt[(syms[i], syms[i + 1])] += wf[w]
        best = min(cnt, key=lambda p: (-cnt[p], p[0], p[1]))
        for w, syms in words.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out

    expect = []
    for src in sorted(per_src):
        c = per_src[src]
        n_tok = sum(c.values())
        n_chr = sum(f * len(w) for w, f in c.items())
        n_sym = sum(f * len(words[w]) for w, f in c.items())
        expect.append(
            (src, n_tok, n_chr, n_sym, n_sym * 1000 // n_tok, n_sym * 1_000_000 // n_chr)
        )

    got = [tuple(r) for r in text_bpe_encode_fertility(spark, SF).collect()]
    assert got == expect
    # the trained vocabulary compresses: fewer symbols than characters
    for row in got:
        assert row[3] < row[2]


def test_subword_greedy_vs_merge_matches_python_encoders(spark):
    """Replay: train the merges in python, then encode every word BOTH
    ways — merge-order application and greedy longest-match-first over
    the chars+merges inventory (incl. the [UNK] long-word rule) — and
    re-derive the per-source comparison exactly."""
    from collections import Counter, defaultdict

    from pumle_spark.tables import table
    from pumle_spark.workload.text import (
        _BPE_MERGES,
        _SGM_MAXPIECE,
        _SGM_STEPS,
        text_subword_greedy_vs_merge,
    )

    wf: Counter[str] = Counter()
    per_src: dict[str, Counter] = defaultdict(Counter)
    for r in table(spark, SF, "documents").select("source", "text").collect():
        for w in _toks(r.text):
            if w:
                wf[w] += 1
                per_src[r.source][w] += 1

    words: dict[str, list[str]] = {w: list(w) for w in wf}
    merges: list[str] = []
    for _ in range(_BPE_MERGES):
        cnt: Counter[tuple[str, str]] = Counter()
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                cnt[(syms[i], syms[i + 1])] += wf[w]
        best = min(cnt, key=lambda p: (-cnt[p], p[0], p[1]))
        merges.append(best[0] + best[1])
        for w, syms in words.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out

    vocab = {c for w in wf for c in w} | set(merges)

    def greedy(w: str) -> int:
        if len(w) > _SGM_STEPS:
            return 1  # [UNK]
        n, sfx = 0, w
        while sfx:
            bl = max(
                l
                for l in range(1, min(len(sfx), _SGM_MAXPIECE) + 1)
                if sfx[:l] in vocab
            )
            sfx = sfx[bl:]
            n += 1
        return n

    expect = []
    for src in sorted(per_src):
        c = per_src[src]
        n_tok = sum(c.values())
        pm = sum(f * len(words[w]) for w, f in c.items())
        pg = sum(f * greedy(w) for w, f in c.items())
        dt = sum(f for w, f in c.items() if len(words[w]) != greedy(w))
        expect.append((src, n_tok, pm, pg, dt, pg * 1_000_000 // pm))

    got = [tuple(r) for r in text_subword_greedy_vs_merge(spark, SF).collect()]
    assert got == expect


def test_jl_distortion_matches_python_projection(spark):
    """Replay: the md5 sign matrix, the difference-vector projection, the
    k-scaling, the once-quantized ratio, and the bucketed histogram
    re-derived in pure python — exact. Also checks the distribution is a
    sane JL outcome: the modal mass sits around ratio 1.0."""
    from collections import Counter
    from decimal import ROUND_HALF_UP, Decimal

    from pumle_spark.tables import table
    from pumle_spark.workload.similarity import (
        _JL_BUCKET,
        _JL_K,
        _JL_SIGNS,
        embedding_jl_distortion,
    )

    vecs = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in table(spark, SF, "embeddings").collect()
    }
    hist: Counter[int] = Counter()
    ratios = []
    for vid, v in vecs.items():
        w = vecs.get(vid + 1)
        if w is None:
            continue
        dd = [a - b for a, b in zip(v, w)]
        d_orig2 = sum(x * x for x in dd)
        if d_orig2 <= 0:
            continue
        d_proj2 = (
            sum(sum(s * x for s, x in zip(row, dd)) ** 2 for row in _JL_SIGNS) / _JL_K
        )
        ratio = float(
            Decimal(repr(d_proj2 / d_orig2)).quantize(
                Decimal("0.000001"), rounding=ROUND_HALF_UP  # Spark round() on doubles and DuckDB both round halves away from zero
            )
        )
        ratios.append(ratio)
        hist[int(ratio * 1000 // _JL_BUCKET) * _JL_BUCKET] += 1

    n = sum(hist.values())
    expect = [
        (b, c, c * 1_000_000 // n) for b, c in sorted(hist.items())
    ]
    got = [tuple(r) for r in embedding_jl_distortion(spark, SF).collect()]
    assert got == expect
    # JL sanity: the mean squared-distance ratio concentrates near 1
    assert 0.7 < sum(ratios) / len(ratios) < 1.3
