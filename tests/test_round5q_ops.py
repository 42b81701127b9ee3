"""Round-5 batch-q operator tests: contrastive batches, DP budget plan."""

from __future__ import annotations

import hashlib
from collections import defaultdict

SF = "/root/testdata/sf0.001"


def test_contrastive_batches_match_permutation_replay(spark):
    """Deterministic md5 permutation → batches of 32 → collision pairs."""
    from pumle_spark.tables import table
    from pumle_spark.workload.curation import _CB_BATCH, curation_contrastive_batches

    rows = [
        (int(hashlib.md5(f"cb|{r.vec_id}".encode()).hexdigest()[:8], 16), r.vec_id, r.label)
        for r in table(spark, SF, "embeddings").select("vec_id", "label").collect()
    ]
    rows.sort()
    expect = {}
    for b in range(0, len(rows), _CB_BATCH):
        batch = rows[b : b + _CB_BATCH]
        labels = defaultdict(int)
        for _, _, lab in batch:
            labels[lab] += 1
        size = len(batch)
        pairs = sum(c * (c - 1) // 2 for c in labels.values())
        # a 1-row tail batch has zero pairs; the query defines its share as 0
        total_pairs = size * (size - 1) // 2
        expect[b // _CB_BATCH] = (
            size,
            len(labels),
            pairs,
            pairs * 1_000_000 // total_pairs if total_pairs else 0,
        )

    got = {
        r.batch_id: (r.batch_size, r.n_labels, r.collision_pairs, r.collision_ppm)
        for r in curation_contrastive_batches(spark, SF).collect()
    }
    assert got == expect
    assert sum(v[0] for v in got.values()) == len(rows)


def test_dp_budget_plan_matches_pure_python(spark):
    """Sensitivities (max user contribution) and Laplace scales replayed."""
    from pumle_spark.tables import table
    from pumle_spark.workload.experiments import _DP_EPS_MICRO, privacy_dp_budget_plan

    nat_of = {r.c_custkey: r.c_nationkey for r in table(spark, SF, "customer").collect()}
    names = {r.n_nationkey: r.n_name for r in table(spark, SF, "nation").collect()}
    user = defaultdict(int)
    for r in table(spark, SF, "orders").select("o_custkey", "o_totalprice").collect():
        user[r.o_custkey] += int(round(r.o_totalprice * 100))

    nat = defaultdict(lambda: [0, 0, 0])  # n_users, sum, max
    for ck, cents in user.items():
        st = nat[nat_of[ck]]
        st[0] += 1
        st[1] += cents
        st[2] = max(st[2], cents)

    got = {
        (r.nation, r.eps_micro): r for r in privacy_dp_budget_plan(spark, SF).collect()
    }
    assert set(got) == {(names[k], e) for k in nat for e in _DP_EPS_MICRO}
    for k, (n, s, mx) in nat.items():
        for e in _DP_EPS_MICRO:
            r = got[(names[k], e)]
            assert (r.n_users, r.sum_cents, r.sens_cents) == (n, s, mx)
            scale = mx * 1_000_000 // e
            assert r.laplace_scale_cents == scale
            assert r.noise_to_signal_ppm == scale * 1_000_000 // s
            # lower epsilon must demand at least as much noise
    for k in nat:
        lo = got[(names[k], _DP_EPS_MICRO[0])].laplace_scale_cents
        hi = got[(names[k], _DP_EPS_MICRO[-1])].laplace_scale_cents
        assert lo >= hi
