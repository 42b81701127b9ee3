"""Round-7 operator tests: UniMax epoch-capped allocation (and the other
round-7 additions as they land). Pure-python re-derivations against
sf0.001, following the round-4/5/6 replay-test pattern."""

from __future__ import annotations

import re

SF = "/root/testdata/sf0.001"


def _toks(text: str) -> list[str]:
    s = re.sub(r"[^a-z0-9]+", " ", text.lower()).strip()
    return s.split(" ") if s else []


def test_unimax_allocation_properties(spark):
    """Token counts replayed in python; the closed prefix form must satisfy
    the UniMax contract the paper's sequential greedy loop guarantees:
    (1) alloc ≤ cap everywhere and capped rows pay exactly their cap,
    (2) the budget is spent exactly (or Σcaps when every language caps),
    (3) uncapped languages split the leftover uniformly (within the
        largest-remainder ±1),
    (4) fairness: no capped language's cap exceeds an uncapped allocation
        by more than the remainder unit — i.e. capping only ever REDUCES a
        language below the uniform share, never above it."""
    from pumle_spark.tables import table
    from pumle_spark.workload.sampling import (
        _UMX_BUDGET,
        _UMX_EPOCH_CAP,
        mix_unimax_epochs,
    )

    avail: dict[str, int] = {}
    for r in table(spark, SF, "documents").select("lang", "text").collect():
        avail[r.lang] = avail.get(r.lang, 0) + len(_toks(r.text))

    rows = {r.lang: r for r in mix_unimax_epochs(spark, SF).collect()}
    assert set(rows) == set(avail)

    for lang, r in rows.items():
        assert r.avail_tokens == avail[lang]
        assert r.cap_tokens == _UMX_EPOCH_CAP * avail[lang]
        assert 0 <= r.alloc_tokens <= r.cap_tokens
        if r.capped:
            assert r.alloc_tokens == r.cap_tokens
        assert r.epochs_milli == r.alloc_tokens * 1000 // r.avail_tokens
        assert r.share_ppm == r.alloc_tokens * 1_000_000 // _UMX_BUDGET

    total_caps = sum(r.cap_tokens for r in rows.values())
    spent = sum(r.alloc_tokens for r in rows.values())
    assert spent == min(_UMX_BUDGET, total_caps)

    uncapped = [r.alloc_tokens for r in rows.values() if not r.capped]
    if uncapped:
        assert max(uncapped) - min(uncapped) <= 1
        for r in rows.values():
            if r.capped:
                assert r.cap_tokens <= max(uncapped)


def test_weighted_aes_sample_matches_python_race(spark):
    """The exponential race replayed in pure python: md5-quantized uniform,
    literal -ln table, nano-rounded clock, (e, doc_id) rank — the Spark
    sample must match row for row, and the clock must actually be
    weight-sensitive (a doc's rank key scales inversely with its size)."""
    import hashlib
    from decimal import ROUND_HALF_UP, Decimal

    from pumle_spark.tables import table
    from pumle_spark.workload.sampling import _AES_K, _AES_LNU, sample_weighted_aes

    lnu = dict(_AES_LNU)
    per_source: dict[str, list[tuple[int, int, int]]] = {}
    for r in table(spark, SF, "documents").select(
        "source", "doc_id", "n_chars"
    ).collect():
        w = max(int(r.n_chars), 1)
        idx = int(hashlib.md5(f"{r.doc_id}|aes".encode()).hexdigest()[:2], 16)
        e_nano = int(
            Decimal(repr(lnu[idx] / w * 1_000_000_000)).quantize(
                Decimal("1"), rounding=ROUND_HALF_UP
            )
        )
        per_source.setdefault(r.source, []).append((e_nano, r.doc_id, w))

    expect = []
    for src in sorted(per_source):
        for rnk, (e, did, w) in enumerate(sorted(per_source[src])[:_AES_K], start=1):
            expect.append((src, rnk, did, w, e))

    got = [
        (r.source, r.rnk, r.doc_id, r.weight_chars, r.e_nano)
        for r in sample_weighted_aes(spark, SF).collect()
    ]
    assert got == expect

    # weight sensitivity: among docs sharing the same u-bucket, the larger
    # doc always carries the smaller clock
    by_bucket: dict[int, list[tuple[int, int]]] = {}
    for rows in per_source.values():
        for e, did, w in rows:
            idx = int(hashlib.md5(f"{did}|aes".encode()).hexdigest()[:2], 16)
            by_bucket.setdefault(idx, []).append((w, e))
    checked = 0
    for pairs in by_bucket.values():
        pairs.sort()
        for (w1, e1), (w2, e2) in zip(pairs, pairs[1:]):
            if w1 < w2:
                assert e1 >= e2
                checked += 1
    assert checked > 0


def test_bloom_tuning_matches_python_filters_and_theory(spark):
    """Each (m, k) filter replayed in pure python (bit-exact: words, fill,
    false positives), then the measured FPR checked against the
    (1 - e^(-kn/m))^k theory curve — the transcendental stays python-side."""
    import hashlib
    import math

    from pumle_spark.tables import table
    from pumle_spark.workload.sketches import _BFT_CONFIGS, sketch_bloom_tuning

    o = table(spark, SF, "orders").select("o_custkey", "o_orderdate").collect()
    members = {
        r.o_custkey
        for r in o
        if r.o_orderdate.year == 1995
    }
    probes = [
        r.c_custkey
        for r in table(spark, SF, "customer").select("c_custkey").collect()
        if r.c_custkey not in members
    ]

    def positions(key: int, k: int, m: int) -> list[int]:
        return [
            int(hashlib.md5(f"{key}#{i}@{m}".encode()).hexdigest()[:8], 16) % m
            for i in range(k)
        ]

    got = {(r.m, r.k): r for r in sketch_bloom_tuning(spark, SF).collect()}
    assert set(got) == set(_BFT_CONFIGS)

    for m, k in _BFT_CONFIGS:
        bits: set[int] = set()
        for key in members:
            bits.update(positions(key, k, m))
        n_fp = sum(
            1 for key in probes if all(p in bits for p in positions(key, k, m))
        )
        r = got[(m, k)]
        assert r.n_members == len(members)
        assert r.n_nonmember_probes == len(probes)
        assert r.n_false_pos == n_fp
        assert r.n_bits_set == len(bits)
        assert r.fpr_ppm == n_fp * 1_000_000 // len(probes)
        assert r.fill_ppm == len(bits) * 1_000_000 // m

        # theory check: measured FPR within a factor-of-3 band of the
        # asymptotic curve (tight for the fuller filters, loose when the
        # expected count is a handful)
        theory = (1.0 - math.exp(-k * len(members) / m)) ** k
        expected_fp = theory * len(probes)
        if expected_fp >= 10:
            assert 0.33 * expected_fp <= n_fp <= 3.0 * expected_fp

    # monotonicity: bigger, better-tuned filters must measure lower FPR
    fprs = [got[cfg].fpr_ppm for cfg in sorted(_BFT_CONFIGS)]
    assert fprs == sorted(fprs, reverse=True)


def test_page_hinkley_matches_python_recurrence(spark):
    """The sequential PH recurrence (running mean, ±delta walks, running
    min/max, both thresholds) replayed in pure python over the same hourly
    series; every row must match exactly, and the detector must be QUIET
    at the incident threshold on this stationary series while the page
    threshold exercises both alert states."""
    from collections import Counter

    from pumle_spark.tables import table
    from pumle_spark.workload.drift import (
        _PH_DELTA,
        _PH_FAST,
        _PH_SLOW,
        drift_page_hinkley,
    )

    counts: Counter = Counter()
    for r in table(spark, SF, "events").select("ts").collect():
        counts[r.ts.strftime("%Y-%m-%d %H:00:00")] += 1

    expect = []
    cum = mu = md = mu_min = md_max = 0
    for t, hour in enumerate(sorted(counts), start=1):
        x = counts[hour]
        cum += x
        dev = x * 1_000_000 - (cum * 1_000_000 // t)
        mu += dev - _PH_DELTA
        md += dev + _PH_DELTA
        mu_min = min(mu_min, mu)
        md_max = max(md_max, md)
        up, down = mu - mu_min, md_max - md
        expect.append(
            (
                hour,
                x,
                up,
                down,
                int(up > _PH_FAST or down > _PH_FAST),
                int(up > _PH_SLOW or down > _PH_SLOW),
            )
        )

    got = [
        (r.hour_ts, r.x, r.ph_up_micro, r.ph_down_micro, r.alert_fast, r.alert_slow)
        for r in drift_page_hinkley(spark, SF).collect()
    ]
    assert got == expect
    assert sum(r[5] for r in got) == 0  # stationary series: no incidents


def test_hyperball_matches_python_registers_and_tracks_exact_reach(spark):
    """The register seeding, both merge supersteps, the harmonic/linear-
    counting estimate, and the milli-quantized rollups replayed in pure
    python — bit-exact. Then the estimates are checked against the EXACT
    python BFS ball sizes: per (hop, side) the mean estimate must sit
    within the m=16 HLL error envelope of the true mean."""
    import hashlib
    from collections import defaultdict
    from decimal import ROUND_HALF_UP, Decimal

    from pumle_spark.tables import table
    from pumle_spark.workload.graph import (
        _HB_HOPS,
        _HB_LC,
        _HB_M,
        _HB_NUM,
        _HB_SMALL,
        graph_hyperball_reach,
    )

    o = {r.o_orderkey: r.o_custkey for r in table(spark, SF, "orders").collect()}
    adj: dict[int, set[int]] = defaultdict(set)
    for r in table(spark, SF, "lineitem").select("l_orderkey", "l_suppkey").collect():
        if r.l_orderkey in o:
            c, s = 2 * o[r.l_orderkey], 2 * r.l_suppkey + 1
            adj[c].add(s)
            adj[s].add(c)

    def seed(node: int) -> dict[int, int]:
        h = hashlib.md5(str(node).encode()).hexdigest()
        bucket = int(h[0], 16)
        w32 = int(h[1:9], 16)
        rho = 33 if w32 == 0 else 33 - w32.bit_length()
        return {bucket: rho}

    def estimate(regs: dict[int, int]) -> float:
        s = sum(1 << (33 - m) for m in regs.values())
        s += (_HB_M - len(regs)) * (1 << 33)
        raw = float(_HB_NUM) / s
        nv = _HB_M - len(regs)
        if raw <= _HB_SMALL and nv > 0:
            return dict(_HB_LC)[nv]
        return raw

    regs = {n: seed(n) for n in adj}
    balls = {n: {n} for n in adj}
    expect_rows = {}
    for hop in range(1, _HB_HOPS + 1):
        new_regs = {}
        new_balls = {}
        for n in adj:
            merged = dict(regs[n])
            ball = set(balls[n])
            for nb in adj[n]:
                for b, m in regs[nb].items():
                    merged[b] = max(merged.get(b, 0), m)
                ball |= balls[nb]
            new_regs[n] = merged
            new_balls[n] = ball
        regs, balls = new_regs, new_balls
        per_side: dict[str, list[tuple[int, int]]] = defaultdict(list)
        for n in adj:
            q = int(
                Decimal(repr(estimate(regs[n]) * 1000)).quantize(
                    Decimal("1"), rounding=ROUND_HALF_UP
                )
            )
            side = "customer" if n % 2 == 0 else "supplier"
            per_side[side].append((q, len(balls[n])))
        for side, qs in per_side.items():
            n_nodes = len(qs)
            sq = sum(q for q, _ in qs)
            expect_rows[(hop, side)] = (
                n_nodes,
                sq // n_nodes,
                min(q for q, _ in qs),
                max(q for q, _ in qs),
                sum(e for _, e in qs) / n_nodes,  # exact mean ball (python only)
            )

    got = {
        (r.hops, r.side): (
            r.n_nodes,
            r.mean_ball_milli,
            r.min_ball_milli,
            r.max_ball_milli,
        )
        for r in graph_hyperball_reach(spark, SF).collect()
    }
    assert set(got) == set(expect_rows)
    for key, row in got.items():
        assert row == expect_rows[key][:4], key
        # accuracy envelope: mean HLL estimate within ±45% of the exact
        # mean reach (m=16 → ~26% per-node sigma, tighter after averaging)
        est_mean = row[1] / 1000.0
        exact_mean = expect_rows[key][4]
        assert 0.55 * exact_mean <= est_mean <= 1.45 * exact_mean, (
            key,
            est_mean,
            exact_mean,
        )


def test_dp_noisy_marginals_replays_mechanism_and_distribution(spark):
    """The inverse-CDF table re-derived from the discrete-Laplace pmf, the
    md5 cell indexing and clamping replayed exactly; the table itself must
    be a valid mechanism (symmetric, mode at 0, heavier tails at smaller
    epsilon)."""
    import hashlib
    import math
    from collections import Counter

    from pumle_spark.tables import table
    from pumle_spark.workload.experiments import (
        _DPN_EPS,
        _DPN_TABLE,
        privacy_dp_noisy_marginals,
    )

    noise = {(e, i): k for e, i, k in _DPN_TABLE}

    # mechanism sanity: for each eps the pmf of the table must match the
    # discrete Laplace within quantization (mode 0, near-symmetric) and the
    # smaller eps must have strictly more mass off-center
    spread = {}
    for e in _DPN_EPS:
        ks = [noise[(e, i)] for i in range(256)]
        c = Counter(ks)
        assert c[0] == max(c.values())  # mode at zero
        assert abs(sum(1 for k in ks if k > 0) - sum(1 for k in ks if k < 0)) <= 2
        spread[e] = sum(abs(k) for k in ks) / len(ks)
        a = math.exp(-e / 1000.0)
        expected_p0 = (1 - a) / (1 + a)
        assert abs(c[0] / 256.0 - expected_p0) <= 2 / 256.0 + 0.01
    assert spread[500] > spread[1000]

    true_n = Counter(
        r.o_orderpriority
        for r in table(spark, SF, "orders").select("o_orderpriority").collect()
    )
    got = {
        (r.priority, r.eps_milli): r
        for r in privacy_dp_noisy_marginals(spark, SF).collect()
    }
    assert set(got) == {(p, e) for p in true_n for e in _DPN_EPS}
    for (p, e), r in got.items():
        idx = int(hashlib.md5(f"{p}|{e}".encode()).hexdigest()[:2], 16)
        k = noise[(e, idx)]
        expect_noisy = max(true_n[p] + k, 0)
        assert r.true_n == true_n[p]
        assert r.noisy_n == expect_noisy
        assert r.abs_err == abs(expect_noisy - true_n[p])
        assert r.err_ppm == r.abs_err * 1_000_000 // r.true_n


def _xy2d(n: int, x: int, y: int) -> int:
    """Canonical Hilbert xy2d (Wikipedia) — the independent semantic anchor
    for the engine's aggregate-fold / CTE-chain implementations."""
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = n - 1 - x, n - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_key_matches_canonical_walk_and_wins_locality(spark):
    """Every per-row hkey equals the canonical python xy2d of the same
    bucketized coords; the file-cut locality audit replays exactly; and
    Hilbert must measure tighter mean boxes than the Morton curve — the
    claim the layout module makes, asserted."""
    from pumle_spark.tables import table
    from pumle_spark.workload.layout import (
        _BITS,
        _FILE_ROWS,
        layout_curve_locality,
        layout_hilbert_orders,
    )

    n = 1 << _BITS
    rows = layout_hilbert_orders(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r.xb < n and 0 <= r.yb < n
        assert r.hkey == _xy2d(n, r.xb, r.yb), (r.xb, r.yb)

    # replay the audit: same rows, python sort + cut + bbox
    zkeys = []
    for r in rows:
        z = 0
        for i in range(_BITS):
            z |= ((r.xb >> i) & 1) << (2 * i)
            z |= ((r.yb >> i) & 1) << (2 * i + 1)
        zkeys.append((z, r.o_orderkey, r.xb, r.yb))
    hkeys = [(r.hkey, r.o_orderkey, r.xb, r.yb) for r in rows]

    def audit(keyed):
        keyed = sorted(keyed)
        boxes = []
        for i in range(0, len(keyed), _FILE_ROWS):
            chunk = keyed[i : i + _FILE_ROWS]
            xs = [c[2] for c in chunk]
            ys = [c[3] for c in chunk]
            boxes.append((max(xs) - min(xs) + 1) * (max(ys) - min(ys) + 1))
        return len(boxes), sum(boxes) * 1000 // len(boxes), max(boxes)

    expect = {"hilbert": audit(hkeys), "zorder": audit(zkeys)}
    got = {
        r.curve: (r.n_files, r.mean_box_area_milli, r.max_box_area)
        for r in layout_curve_locality(spark, SF).collect()
    }
    assert got == expect
    # sf0.001 fits in a single file (both boxes = full extent), so the
    # strict locality win is asserted on a dense synthetic grid instead:
    # a full 64x64 population cut into 256-point files — Hilbert's
    # neighbor-continuity must measure strictly tighter boxes than the
    # Morton quadrant jumps (at sf0.1 the registered query itself measures
    # 2.42M vs 4.48M milli-cells, PERF.md round-7).
    assert got["hilbert"][1] <= got["zorder"][1]

    # chunk=200 (non-power-of-two, like real file sizes): power-of-two
    # chunks on a complete grid tile perfectly for BOTH curves; unaligned
    # cuts expose Morton's quadrant jumps (measured: 282 vs 469 cells)
    def synth_audit(key_fn, m=64, chunk=200):
        keyed = sorted((key_fn(x, y), x, y) for x in range(m) for y in range(m))
        boxes = []
        for i in range(0, len(keyed), chunk):
            c = keyed[i : i + chunk]
            xs = [p[1] for p in c]
            ys = [p[2] for p in c]
            boxes.append((max(xs) - min(xs) + 1) * (max(ys) - min(ys) + 1))
        return sum(boxes) / len(boxes)

    def zkey(x, y, bits=6):
        z = 0
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    h_mean = synth_audit(lambda x, y: _xy2d(64, x, y))
    z_mean = synth_audit(zkey)
    assert h_mean < z_mean, (h_mean, z_mean)
