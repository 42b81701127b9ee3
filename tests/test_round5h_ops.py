"""Round-5 batch-h operator tests: hard-negative mining, Theil–Sen robust
trend, functional-dependency profiling. Each is re-derived here with an
independent pure-python/numpy brute force — the DuckDB oracle shares the SQL
formulation, so these tests are the second, formulation-independent check."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


def test_hard_negatives_match_numpy_bruteforce(spark):
    """Top-k different-label cosine neighbors recomputed with numpy GEMM;
    the ranked ids and 6-dp sims must match exactly."""
    from pumle_spark.tables import table
    from pumle_spark.workload.similarity import _QUERY_STRIDE, _TOP_K, mine_hard_negatives

    emb = table(spark, SF, "embeddings").collect()
    ids = np.array([r.vec_id for r in emb])
    labels = np.array([r.label for r in emb])
    V = np.array([r.embedding for r in emb], dtype=np.float64)
    norms = np.sqrt((V * V).sum(axis=1))

    expect = {}
    for qi in np.where(ids % _QUERY_STRIDE == 0)[0]:
        mask = labels != labels[qi]
        sims = np.round(V[mask] @ V[qi] / (norms[mask] * norms[qi]), 6)
        cand = sorted(
            zip(sims.tolist(), ids[mask].tolist()), key=lambda t: (-t[0], t[1])
        )[:_TOP_K]
        expect[int(ids[qi])] = [(int(i), s) for s, i in cand]

    got = {}
    for r in mine_hard_negatives(spark, SF).collect():
        got.setdefault(r.anchor_id, []).append((r.negative_id, r.cos_sim))
        assert r.anchor_label != r.negative_label  # the defining invariant
    assert got == expect


def test_theilsen_matches_pure_python_median_of_slopes(spark):
    """Lower-median of pairwise slopes recomputed from the raw orders rows."""
    from collections import defaultdict

    from pumle_spark.tables import table
    from pumle_spark.workload.analytics import regress_theilsen_trend

    monthly = defaultdict(lambda: defaultdict(int))
    for r in table(spark, SF, "orders").collect():
        mi = (r.o_orderdate.year - 1992) * 12 + r.o_orderdate.month - 1
        monthly[r.o_orderpriority][mi] += int(round(r.o_totalprice * 100))

    expect = {}
    for prio, series in monthly.items():
        mis = sorted(series)
        slopes = [
            (round((series[m2] - series[m1]) / (m2 - m1), 6), m1, m2)
            for i, m1 in enumerate(mis)
            for m2 in mis[i + 1 :]
        ]
        slopes.sort()
        expect[prio] = (len(slopes), slopes[(len(slopes) + 1) // 2 - 1][0])

    got = {
        r.priority: (r.n_pairs, r.theilsen_slope_cents)
        for r in regress_theilsen_trend(spark, SF).collect()
    }
    assert got == expect


def test_fd_profile_brute_force_and_known_fds(spark):
    """Every candidate's stats recomputed with python dicts; the
    nation.n_name→n_regionkey FD must hold (0 ppm) and the
    lineitem.l_partkey→l_suppkey one must be violated at this SF."""
    from collections import defaultdict

    from pumle_spark.tables import table
    from pumle_spark.workload.drift import _FD_CANDIDATES, profile_fd_candidates

    got = {r.fd: r for r in profile_fd_candidates(spark, SF).collect()}
    assert set(got) == {f"{t}.{l}->{r}" for t, l, r in _FD_CANDIDATES}

    for tbl, lhs, rhs in _FD_CANDIDATES:
        groups = defaultdict(set)
        counts = defaultdict(int)
        for row in table(spark, SF, tbl).select(lhs, rhs).collect():
            groups[row[0]].add(row[1])
            counts[row[0]] += 1
        n_rows = sum(counts.values())
        viol_groups = [k for k, s in groups.items() if len(s) > 1]
        viol_rows = sum(counts[k] for k in viol_groups)
        r = got[f"{tbl}.{lhs}->{rhs}"]
        assert r.n_rows == n_rows
        assert r.n_groups == len(groups)
        assert r.n_violating_groups == len(viol_groups)
        assert r.violating_rows == viol_rows
        assert r.violation_ppm == viol_rows * 1_000_000 // n_rows

    assert got["nation.n_name->n_regionkey"].violation_ppm == 0
    assert got["lineitem.l_partkey->l_suppkey"].violation_ppm > 0
