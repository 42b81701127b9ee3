"""Round-5 batch-n operator tests: 1-NN label audit, Neyman allocation."""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np

SF = "/root/testdata/sf0.001"


def test_knn_label_audit_matches_numpy(spark):
    """Nearest positive vs nearest impostor recomputed with numpy GEMM."""
    from pumle_spark.tables import table
    from pumle_spark.workload.similarity import _LNA_STRIDE, embedding_knn_label_audit

    rows = table(spark, SF, "embeddings").collect()
    ids = np.array([r.vec_id for r in rows])
    labels = np.array([r.label for r in rows])
    V = np.array([r.embedding for r in rows], dtype=np.float64)
    norms = np.sqrt((V * V).sum(axis=1))

    per_label = defaultdict(lambda: [0, 0, 0])  # n, wrong, margin_sum
    for qi in np.where(ids % _LNA_STRIDE == 0)[0]:
        sims = np.round(V @ V[qi] / (norms * norms[qi]) * 1_000_000).astype(np.int64)
        sims[qi] = np.iinfo(np.int64).min  # exclude self
        same = labels == labels[qi]
        same[qi] = False
        pos = int(sims[same].max())
        neg = int(sims[~same].max())
        st = per_label[int(labels[qi])]
        st[0] += 1
        st[1] += 1 if neg > pos else 0
        st[2] += pos - neg

    def tdiv(a, b):
        q = abs(a) // b
        return q if a >= 0 else -q

    got = {r.label: r for r in embedding_knn_label_audit(spark, SF).collect()}
    assert set(got) == set(per_label)
    for lab, (n, wrong, msum) in per_label.items():
        r = got[lab]
        assert r.n_anchors == n
        assert r.n_wrong_nn == wrong
        assert r.err_ppm == wrong * 1_000_000 // n
        assert r.mean_margin_micro == tdiv(msum, n)


def test_neyman_allocation_exact_and_budget_conserving(spark):
    """Allocations recomputed with the largest-remainder method; both
    columns must sum exactly to the budget, and Neyman must oversample
    the highest-variance stratum relative to proportional."""
    from pumle_spark.tables import table
    from pumle_spark.workload.sampling import _NEY_BUDGET, sample_neyman_allocation

    strata = defaultdict(lambda: [0, 0, 0])  # n, sx, sxx
    for r in table(spark, SF, "orders").select("o_orderpriority", "o_totalprice").collect():
        x = int(round(r.o_totalprice * 100))
        st = strata[r.o_orderpriority]
        st[0] += 1
        st[1] += x
        st[2] += x * x

    sd = {
        p: (n, int(round(math.sqrt(n * sxx - sx * sx) / n)))
        for p, (n, sx, sxx) in strata.items()
    }

    def largest_remainder(weights):
        wtot = sum(weights.values())
        base = {p: _NEY_BUDGET * w // wtot for p, w in weights.items()}
        rem = {p: _NEY_BUDGET * w % wtot for p, w in weights.items()}
        left = _NEY_BUDGET - sum(base.values())
        order = sorted(weights, key=lambda p: (-rem[p], p))
        for p in order[:left]:
            base[p] += 1
        return base

    ney = largest_remainder({p: n * s for p, (n, s) in sd.items()})
    prop = largest_remainder({p: n for p, (n, _) in sd.items()})

    got = {r.priority: r for r in sample_neyman_allocation(spark, SF).collect()}
    assert set(got) == set(sd)
    for p, (n, s) in sd.items():
        r = got[p]
        assert (r.n_h, r.sd_cents) == (n, s)
        assert r.alloc_neyman == ney[p]
        assert r.alloc_proportional == prop[p]
    assert sum(r.alloc_neyman for r in got.values()) == _NEY_BUDGET
    assert sum(r.alloc_proportional for r in got.values()) == _NEY_BUDGET
