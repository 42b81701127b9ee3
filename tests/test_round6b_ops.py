"""Round-6 batch-b operator tests: LSH tuning grid, SoftDeDup weights,
ROUGE cluster pairs, power/MDE planning, sign-Hamming agreement,
per-dim embedding PSI. Pure-python/numpy re-derivations."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

SF = "/root/testdata/sf0.001"


def _toks(text: str) -> list[str]:
    s = re.sub(r"[^a-z0-9]+", " ", text.lower()).strip()
    return s.split(" ") if s else []


def _q(x: float, places: str) -> Decimal:
    return Decimal(repr(x)).quantize(Decimal(places), rounding=ROUND_HALF_UP)


def _shingle_set(text: str) -> set[str]:
    ws = _toks(text)
    return {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}


def test_lsh_tuning_report_matches_python_grid(spark):
    """Minhash signatures, three band regroupings, exact truth pairs, and
    both ppm ratios replayed in pure python."""
    from pumle_spark.tables import table
    from pumle_spark.workload.dedup import (
        _JACCARD_MIN,
        _N_HASHES,
        _TUNE_ROWS,
        dedup_lsh_tuning_report,
    )

    docs = {
        r.doc_id: _shingle_set(r.text)
        for r in table(spark, SF, "documents").select("doc_id", "text").collect()
    }
    docs_sh = {d: s for d, s in docs.items() if s}

    def mh(sh_set):
        sig = []
        for s in range(_N_HASHES):
            vals = [
                hashlib.md5(f"{s // 4}|{sh}".encode()).hexdigest()[
                    8 * (s % 4) : 8 * (s % 4) + 8
                ]
                for sh in sh_set
            ]
            sig.append(min(vals))
        return sig

    sigs = {d: mh(s) for d, s in docs_sh.items()}

    truth = set()
    ids = sorted(docs_sh)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(docs_sh[a] & docs_sh[b])
            if inter and inter / len(docs_sh[a] | docs_sh[b]) >= _JACCARD_MIN:
                truth.add((a, b))

    got = {r.rows_per_band: r for r in dedup_lsh_tuning_report(spark, SF).collect()}
    assert sorted(got) == sorted(_TUNE_ROWS)
    n_docs = len(docs)
    for rpb in _TUNE_ROWS:
        buckets = defaultdict(list)
        for d, sig in sigs.items():
            for band in range(_N_HASHES // rpb):
                seeds = range(band * rpb, (band + 1) * rpb)
                key = hashlib.md5(
                    "|".join(f"{s}:{sig[s]}" for s in seeds).encode()
                ).hexdigest()
                buckets[(band, key)].append(d)
        cand = set()
        for members in buckets.values():
            members.sort()
            for i, a in enumerate(members):
                for b in members[i + 1 :]:
                    cand.add((a, b))
        hits = len(cand & truth)
        r = got[rpb]
        assert r.n_bands == _N_HASHES // rpb
        assert (r.n_truth, r.n_candidates, r.n_hits) == (len(truth), len(cand), hits)
        assert r.completeness_ppm == (
            hits * 1_000_000 // len(truth) if truth else 1_000_000
        )
        assert r.reduction_ppm == 1_000_000 - len(cand) * 1_000_000 // (
            n_docs * (n_docs - 1) // 2
        )
    # fewer rows per band = more bands of shorter keys = recall can only grow
    assert got[1].n_hits >= got[2].n_hits >= got[4].n_hits


def test_softdedup_weights_conserve_cluster_mass(spark):
    """Weights replayed from the (oracle-verified) cluster assignment; a
    cluster's total weight is one doc-equivalent up to truncation."""
    from pumle_spark.tables import table
    from pumle_spark.workload.curation import curation_softdedup_weights
    from pumle_spark.workload.dedup import dedup_minhash_clusters

    sizes = {
        r.doc_id: r.n_docs for r in dedup_minhash_clusters(spark, SF).collect()
    }
    all_ids = {r.doc_id for r in table(spark, SF, "documents").select("doc_id").collect()}

    got = {r.doc_id: r for r in curation_softdedup_weights(spark, SF).collect()}
    assert set(got) == all_ids
    for d, r in got.items():
        expect_size = sizes.get(d, 1)
        assert r.cluster_size == expect_size
        assert r.weight_micro == 1_000_000 // expect_size
    # conservation: a cluster's total weight is size * (1e6 // size) — one
    # doc-equivalent up to integer truncation, never more
    cluster_of = {
        r.doc_id: r.cluster_id for r in dedup_minhash_clusters(spark, SF).collect()
    }
    totals = defaultdict(int)
    for d, r in got.items():
        if d in cluster_of:
            totals[cluster_of[d]] += r.weight_micro
    for cid, tot in totals.items():
        size = next(s for d, s in sizes.items() if cluster_of[d] == cid)
        assert tot == size * (1_000_000 // size)
        assert tot <= 1_000_000


def test_rouge_cluster_pairs_match_counter_replay(spark):
    from pumle_spark.tables import table
    from pumle_spark.workload.curation import text_rouge_cluster_pairs
    from pumle_spark.workload.dedup import dedup_minhash_clusters

    text_of = {
        r.doc_id: r.text
        for r in table(spark, SF, "documents").select("doc_id", "text").collect()
    }
    clusters = defaultdict(list)
    for r in dedup_minhash_clusters(spark, SF).collect():
        clusters[r.cluster_id].append(r.doc_id)

    def cnt(d):
        return Counter(t for t in _toks(text_of[d]) if t)

    expect = {}
    for cid, members in clusters.items():
        toks = {d: cnt(d) for d in members}
        lens = {d: sum(c.values()) for d, c in toks.items()}
        kept = sorted(members, key=lambda d: (-lens[d], d))[0]
        for d in members:
            if d == kept:
                continue
            overlap = sum((toks[kept] & toks[d]).values())
            if overlap == 0:
                continue  # inner join on shared terms: pair absent
            nk, nd = lens[kept], lens[d]
            expect[(cid, kept, d)] = (
                overlap,
                overlap * 1_000_000 // nd if nd else 0,
                2 * overlap * 1_000_000 // (nk + nd) if nk + nd else 0,
            )

    got = {
        (r.cluster_id, r.kept_doc_id, r.dropped_doc_id): (
            r.n_overlap,
            r.rouge1_recall_ppm,
            r.rouge1_f1_ppm,
        )
        for r in text_rouge_cluster_pairs(spark, SF).collect()
    }
    assert got == expect
    # near-dup clusters should mostly preserve content
    assert all(v[1] > 0 for v in got.values())


def test_power_mde_matches_moment_replay(spark):
    from pumle_spark.tables import table
    from pumle_spark.workload.experiments import _MDE_PM, abtest_power_mde

    def arm_of(ck: int) -> str:
        b = int(hashlib.md5(f"srm|{ck}".encode()).hexdigest()[:4], 16) % 100
        return "control" if b < 50 else ("variant_a" if b < 80 else "variant_b")

    spend = defaultdict(int)
    for r in table(spark, SF, "orders").select("o_custkey", "o_totalprice").collect():
        spend[r.o_custkey] += int(_q(r.o_totalprice * 100, "1"))

    arms = defaultdict(list)
    for r in table(spark, SF, "customer").select("c_custkey").collect():
        arms[arm_of(r.c_custkey)].append(spend.get(r.c_custkey, 0))

    got = {(r.arm, r.mde_pm): r for r in abtest_power_mde(spark, SF).collect()}
    assert set(got) == {(a, m) for a in arms for m in _MDE_PM}
    for a, xs in arms.items():
        n, sx, sxx = len(xs), sum(xs), sum(x * x for x in xs)
        for m in _MDE_PM:
            r = got[(a, m)]
            assert r.n_units == n
            assert r.mean_cents == sx // n
            req = math.ceil(
                float(16_000_000 * (n * sxx - sx * sx)) / float(m * m * sx * sx)
            )
            assert r.required_n == req
            assert r.sufficient == (n >= req)
        # a smaller detectable effect can only demand more samples
        assert got[(a, _MDE_PM[0])].required_n >= got[(a, _MDE_PM[-1])].required_n


def test_sign_hamming_agreement_matches_numpy(spark):
    import numpy as np

    from pumle_spark.tables import table
    from pumle_spark.workload.similarity import (
        _QUERY_STRIDE,
        _TOP_K,
        embedding_sign_hamming_agreement,
    )

    vecs = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in table(spark, SF, "embeddings").collect()
    }
    codes = {d: tuple(1 if x > 0 else 0 for x in v) for d, v in vecs.items()}

    def cos6(a, b):
        dot = nq = nv = 0.0
        for x, y in zip(a, b):
            dot += x * y
        for x in a:
            nq += x * x
        for y in b:
            nv += y * y
        return _q(dot / math.sqrt(nq * nv), "1e-6")

    got = {r.query_id: r for r in embedding_sign_hamming_agreement(spark, SF).collect()}
    queries = [d for d in vecs if d % _QUERY_STRIDE == 0]
    assert sorted(got) == sorted(queries)
    for qid in queries:
        others = [d for d in vecs if d != qid]
        ham = sorted(
            others,
            key=lambda d: (
                sum(x != y for x, y in zip(codes[qid], codes[d])),
                d,
            ),
        )[:_TOP_K]
        cos = sorted(others, key=lambda d: (-cos6(vecs[qid], vecs[d]), d))[:_TOP_K]
        overlap = len(set(ham) & set(cos))
        r = got[qid]
        assert r.n_overlap == overlap
        assert r.agreement_ppm == overlap * 1_000_000 // _TOP_K


def test_dim_psi_matches_binned_replay(spark):
    from pumle_spark.tables import table
    from pumle_spark.workload.drift import _DPSI_EDGES, _DPSI_FLAG, drift_embedding_dim_psi

    def bin_of(x: float) -> int:
        for i, e in enumerate(_DPSI_EDGES):
            if x <= e:
                return i
        return len(_DPSI_EDGES)

    counts = defaultdict(lambda: [0, 0])  # (dim, bin) -> [ref, cur]
    for r in table(spark, SF, "embeddings").collect():
        pop = r.label % 2
        for dim, x in enumerate(r.embedding):
            counts[(dim, bin_of(float(x)))][pop] += 1

    per_dim = defaultdict(list)
    for (dim, b), (ca, cb) in counts.items():
        per_dim[dim].append((b, ca + 1, cb + 1))

    got = {r.dim: r for r in drift_embedding_dim_psi(spark, SF).collect()}
    assert sorted(got) == list(range(64))
    for dim, cells in per_dim.items():
        ta = sum(a for _, a, _ in cells)
        tb = sum(b for _, _, b in cells)
        tot = Decimal(0)
        for _, a, b in cells:
            term = (a / ta - b / tb) * math.log((a / ta) / (b / tb))
            tot += _q(term, "1e-9")
        r = got[dim]
        assert r.n_bins == len(cells)
        assert abs(Decimal(repr(r.psi)) - _q(float(tot), "1e-6")) <= Decimal("1e-6")
        assert r.drift_flag == (float(tot) > _DPSI_FLAG)
        assert r.psi >= 0.0 or abs(r.psi) < 1e-6  # PSI is nonnegative up to rounding
