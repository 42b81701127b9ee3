"""Round-4 wave-3 operator tests (batch 6): blocking quality, incremental
delta dedup, class-balanced sampling."""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


def _split_bucket(doc_id: int) -> int:
    return int(hashlib.md5(f"split|{doc_id}".encode()).hexdigest()[:4], 16) % 100


# --------------------------------------------------------------------------
# dedup_blocking_quality
# --------------------------------------------------------------------------


def test_blocking_quality_metrics_are_consistent(spark):
    from pumle_spark.workload.dedup import dedup_blocking_quality

    rows = dedup_blocking_quality(spark, SF).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_docs > 0 and r.n_truth > 0
    assert r.n_hits <= r.n_truth
    assert r.n_hits <= r.n_candidates
    assert 0.0 <= r.pair_completeness <= 1.0
    assert 0.0 <= r.reduction_ratio <= 1.0
    # the planted corpus: LSH banding must recall most true pairs while
    # pruning essentially the whole pair space
    assert r.pair_completeness >= 0.5
    assert r.reduction_ratio >= 0.99


# --------------------------------------------------------------------------
# dedup_incremental_delta
# --------------------------------------------------------------------------


def test_incremental_delta_classifies_planted_docs(spark, tmp_path):
    """Construct doc ids whose split hash lands them on the intended side,
    then plant: an exact copy, a near copy (half overlapping text), and a
    fresh doc in the delta. Classes must come out exactly."""
    import pandas as pd

    existing_ids = [i for i in range(1000) if _split_bucket(i) < 90]
    delta_ids = [i for i in range(1000) if _split_bucket(i) >= 90]
    base_id, other_id = existing_ids[0], existing_ids[1]
    exact_id, near_id, clean_id = delta_ids[0], delta_ids[1], delta_ids[2]

    base = " ".join(f"alpha{i} beta{i} gamma{i}" for i in range(30))
    near = base[: len(base) * 3 // 4] + " " + " ".join(f"zz{i}" for i in range(8))
    clean = " ".join(f"omega{i} theta{i}" for i in range(40))
    other = " ".join(f"misc{i}" for i in range(40))

    pdf = pd.DataFrame(
        {
            "doc_id": [base_id, other_id, exact_id, near_id, clean_id],
            "text": [base, other, base, near, clean],
            "lang": ["en"] * 5,
            "source": ["s"] * 5,
            "n_chars": [len(t) for t in [base, other, base, near, clean]],
        }
    )
    d = tmp_path / "fix"
    d.mkdir()
    pdf.to_parquet(d / "documents.parquet")

    from pumle_spark.workload.dedup import dedup_incremental_delta

    by = {r.status: r for r in dedup_incremental_delta(spark, str(d)).collect()}
    assert by["exact_dup"].n_docs == 1 and by["exact_dup"].min_doc_id == exact_id
    assert by["near_dup"].n_docs == 1 and by["near_dup"].min_doc_id == near_id
    assert by["clean"].n_docs == 1 and by["clean"].min_doc_id == clean_id


def test_incremental_delta_separates_planted_dups_on_real_corpus(spark):
    """The sf corpus plants near-dup families; the delta bucket must not
    classify everything one way (the absolute-count threshold failure
    mode this operator was tuned against)."""
    from pumle_spark.workload.dedup import dedup_incremental_delta

    rows = dedup_incremental_delta(spark, SF).collect()
    by = {r.status: r.n_docs for r in rows}
    assert by.get("clean", 0) > 0
    assert by.get("near_dup", 0) + by.get("exact_dup", 0) > 0


# --------------------------------------------------------------------------
# sample_balanced_labels
# --------------------------------------------------------------------------


def test_balanced_sampling_equalizes_all_classes(spark):
    from pumle_spark.tables import table
    from pumle_spark.workload.sampling import sample_balanced_labels

    rows = sample_balanced_labels(spark, SF).collect()
    assert rows
    quotas = {r.n_kept for r in rows}
    assert len(quotas) == 1
    quota = quotas.pop()
    assert quota == min(r.n_total for r in rows)
    em = table(spark, SF, "embeddings")
    n_labels = em.select("label").distinct().count()
    assert len(rows) == n_labels


def test_balanced_sampling_selection_is_stable(spark):
    """md5-rank selection: the kept id-sum must be identical across runs
    and across partition counts (rerun on a repartitioned session view)."""
    from pumle_spark.workload.sampling import sample_balanced_labels

    a = {(r.label, r.kept_id_sum) for r in sample_balanced_labels(spark, SF).collect()}
    b = {(r.label, r.kept_id_sum) for r in sample_balanced_labels(spark, SF).collect()}
    assert a == b
