"""Clustering + SemDeDup invariants (cross-engine equality is the oracle
gate's job; these tests pin the engine-side contracts the oracle can't see:
partition-order independence of the fixed-point update, assignment totality,
and the keeper rule)."""

from __future__ import annotations

import pyspark.sql.functions as F

from pumle_spark.workload.clustering import (
    _K,
    _SEM_THRESHOLD,
    _assign,
    _corpus,
    _init_centroids,
    _update,
    cluster_kmeans_embeddings,
    cluster_semdedup_pairs,
)

SF = "/root/testdata/sf0.001"


def test_kmeans_assignment_total_and_unique(spark):
    out = cluster_kmeans_embeddings(spark, SF)
    n_vecs = _corpus(spark, SF).count()
    assert out.count() == n_vecs  # every vector assigned exactly once
    assert out.select("vec_id").distinct().count() == n_vecs
    assert out.select("cluster_id").distinct().count() <= _K
    # cosine of a vector with a mean of unit-ish embeddings stays in [-1, 1]
    bad = out.filter((F.col("cos_sim") < -1.0) | (F.col("cos_sim") > 1.0)).count()
    assert bad == 0


def test_fixed_point_update_is_partition_order_independent(spark):
    """The determinism claim: BIGINT coordinate sums make the Lloyd update
    bit-identical no matter how the corpus is partitioned (double sums would
    differ in the last ulp between fold orders)."""
    v = _corpus(spark, SF)
    cents = _init_centroids(v)
    asg = _assign(v, cents)

    def centroids_with(npart: int):
        vp = v.repartition(npart, "vec_id")
        rows = _update(vp, asg, cents).orderBy("cid").collect()
        return [(r["cid"], tuple(r["cemb"])) for r in rows]

    a = centroids_with(1)
    b = centroids_with(7)
    assert a == b  # exact tuple equality, not approx


def test_empty_cluster_keeps_previous_centroid(spark):
    v = _corpus(spark, SF)
    cents = _init_centroids(v)
    # force-empty a cluster: assign everything to centroid 0
    asg = v.select("vec_id", F.lit(0).cast("long").alias("cid"), F.lit(1.0).alias("cos_sim"))
    updated = _update(v, asg, cents)
    assert updated.count() == _K  # the 7 empty clusters survived
    prev = {r["cid"]: tuple(r["cemb"]) for r in cents.collect()}
    new = {r["cid"]: tuple(r["cemb"]) for r in updated.collect()}
    for cid in prev:
        if cid != 0:
            assert new[cid] == prev[cid]  # untouched, bit-for-bit


def test_semdedup_keeper_rule(spark):
    out = cluster_semdedup_pairs(spark, SF).collect()
    assigned = {
        r["vec_id"]: r["cluster_id"] for r in cluster_kmeans_embeddings(spark, SF).collect()
    }
    dropped = {r["vec_id"] for r in out}
    for r in out:
        # keeper is a smaller id in the SAME cluster, above threshold
        assert r["keeper_id"] < r["vec_id"]
        assert assigned[r["keeper_id"]] == r["cluster_id"] == assigned[r["vec_id"]]
        assert r["cos_sim"] >= _SEM_THRESHOLD - 1e-6
    # one row per dropped vector (the min-keeper representative)
    assert len(dropped) == len(out)
