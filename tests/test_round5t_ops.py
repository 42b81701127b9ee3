"""Round-5 batch-t operator tests: AMS F2 sketch, entropy rate."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

SF = "/root/testdata/sf0.001"


def _tdiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def test_ams_f2_matches_sign_replay(spark):
    """All 16 tug-of-war counters replayed; the estimator must be within
    a loose relative band of the exact F2 (it is unbiased, k=16)."""
    from pumle_spark.tables import table
    from pumle_spark.workload.sketches import _AMS_K, sketch_ams_f2

    keys = [r.l_partkey for r in table(spark, SF, "lineitem").select("l_partkey").collect()]
    z = [0] * _AMS_K
    freq = defaultdict(int)
    for k in keys:
        hb = int(hashlib.md5(f"ams|{k}".encode()).hexdigest()[:8], 16)
        for i in range(_AMS_K):
            z[i] += ((hb >> i) & 1) * 2 - 1
        freq[k] += 1
    f2 = sum(c * c for c in freq.values())
    est = sum(x * x for x in z) // _AMS_K

    r = sketch_ams_f2(spark, SF).collect()
    assert len(r) == 1
    r = r[0]
    assert r.n_rows == len(keys)
    assert r.exact_f2 == f2
    assert r.ams_estimate == est
    assert r.err_ppm == _tdiv((est - f2) * 1_000_000, f2)
    # unbiased estimator with k=16: generous 3/sqrt(16) relative band
    assert abs(est - f2) <= f2  # within 100% — catches sign/scale bugs


def test_entropy_rate_matches_pure_python(spark):
    """Per-state conditional entropies and the mixture rate replayed."""
    from pumle_spark.tables import table
    from pumle_spark.workload.events import events_entropy_rate

    per_user = defaultdict(list)
    for r in table(spark, SF, "events").select("user_id", "ts", "event_id", "event_type").collect():
        per_user[r.user_id].append((r.ts, r.event_id, r.event_type))
    trans = defaultdict(lambda: defaultdict(int))
    for evs in per_user.values():
        evs.sort()
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            trans[a][b] += 1

    t = sum(sum(nx.values()) for nx in trans.values())
    total_term = 0
    expect = {}
    for a, nx in trans.items():
        ca = sum(nx.values())
        s = sum(c * round(math.log2(c / ca) * 1_000_000) for c in nx.values())
        total_term += s
        expect[a] = (ca, _tdiv(-s, ca), ca * 1_000_000 // t)
    rate = _tdiv(-total_term, t)

    got = {r.state: r for r in events_entropy_rate(spark, SF).collect()}
    assert set(got) == set(expect)
    for a, (ca, h, wppm) in expect.items():
        r = got[a]
        assert (r.n_transitions, r.h_cond_micro, r.weight_ppm) == (ca, h, wppm)
        assert r.entropy_rate_micro == rate
        assert r.h_cond_micro >= 0
