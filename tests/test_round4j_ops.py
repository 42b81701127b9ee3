"""Round-4 wave-3 operator tests (batch 8): Matryoshka truncation audit,
shard manifest packing, weighted median."""

from __future__ import annotations

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


def test_matryoshka_error_shrinks_with_dimension(spark):
    from pumle_spark.workload.similarity import embedding_matryoshka_error

    rows = {r.trunc_dim: r for r in embedding_matryoshka_error(spark, SF).collect()}
    assert set(rows) == {8, 16, 32}
    n = {r.n_pairs for r in rows.values()}
    assert len(n) == 1 and n.pop() > 0
    for r in rows.values():
        assert 0.0 <= r.mean_abs_dev <= r.max_abs_dev <= 2.0
    # keeping more dimensions must not hurt on average
    assert rows[8].mean_abs_dev >= rows[16].mean_abs_dev >= rows[32].mean_abs_dev


def test_shard_manifest_partitions_and_respects_budget(spark):
    from pumle_spark.workload.multimodal import _SHARD_BYTES, _media_table, multimodal_shard_manifest

    rows = multimodal_shard_manifest(spark, SF).collect()
    media = _media_table(spark, SF).select(
        "media_id", "mime", F.octet_length("content").alias("b")
    ).collect()
    n_media = len(media)
    assert sum(r.n_items for r in rows) == n_media

    max_item = {}
    for m in media:
        max_item[m.mime] = max(max_item.get(m.mime, 0), m.b)
    for r in rows:
        # split-forbidden packing: a shard overflows by at most one item
        assert r.shard_bytes < _SHARD_BYTES + max_item[r.mime]
        assert r.min_media_id <= r.max_media_id
    # shards within a mime must be contiguous, non-overlapping id ranges
    by_mime = {}
    for r in rows:
        by_mime.setdefault(r.mime, []).append(r)
    for rs in by_mime.values():
        rs.sort(key=lambda r: r.shard_id)
        for a, b in zip(rs, rs[1:]):
            assert a.max_media_id < b.min_media_id


def test_shard_manifest_checksum_is_stable(spark):
    from pumle_spark.workload.multimodal import multimodal_shard_manifest

    a = {(r.mime, r.shard_id): r.member_checksum for r in multimodal_shard_manifest(spark, SF).collect()}
    b = {(r.mime, r.shard_id): r.member_checksum for r in multimodal_shard_manifest(spark, SF).collect()}
    assert a == b


def test_weighted_median_matches_python_replica(spark):
    from pumle_spark.tables import table
    from pumle_spark.workload.analytics import weighted_median_quantity

    got = {r.flag: r for r in weighted_median_quantity(spark, SF).collect()}
    li = table(spark, SF, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_quantity") * 1000).cast("bigint").alias("qm"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("w"),
    ).collect()
    per = {}
    for r in li:
        per.setdefault(r.flag, []).append((r.qm, r.w))
    for flag, xs in per.items():
        xs.sort()
        tot = sum(w for _, w in xs)
        cum = 0
        med = None
        for qm, w in xs:
            cum += w
            if 2 * cum >= tot:
                med = qm
                break
        g = got[flag]
        assert g.n_lines == len(xs)
        assert g.total_weight_cents == tot
        assert g.weighted_median_qty == round(med / 1000.0, 3)
