"""Structured Streaming pipelines driven with real micro-batches."""

from __future__ import annotations

import json
import time

import pyspark.sql.functions as F
import pytest

from pumle_spark.functions import money
from pumle_spark.streaming.pipeline import start_bronze_to_golden, stream_events_hourly
from tests.fixtures import CASE, make_bronze


def test_bronze_stream_ingests_incrementally(spark, tmp_path):
    landing = tmp_path / "landing"
    out = tmp_path / "golden_obs"
    ckpt = tmp_path / "ckpt"
    landing.mkdir()

    # batch 1: two sims arrive
    sims = make_bronze(landing, n_sims=2, n_t=2, seed=21)
    q = start_bronze_to_golden(spark, str(landing), str(out), str(ckpt))
    try:
        q.processAllAvailable()
        got1 = spark.read.parquet(str(out))
        n1 = got1.count()
        expected1 = sum(
            sum(len(st["pressure"]) for st in sim["states"]) for sim in sims.values()
        )
        assert n1 == expected1
        assert set(got1.columns) == {"sim_hash", "t", "row_idx", "pressure", "sw", "sg"}

        # batch 2: a THIRD sim lands later → incremental, exactly-once
        more = make_bronze(tmp_path / "stage2", n_sims=3, n_t=2, seed=22)
        newest = list(more)[-1]
        src = tmp_path / "stage2" / f"states_{CASE}_{newest}.json"
        # write-then-rename: the running stream must never list a
        # partially-written JSON file
        staged = tmp_path / "stage2" / f".incoming_{src.name}"
        staged.write_text(src.read_text())
        staged.rename(landing / src.name)
        q.processAllAvailable()
        n2 = spark.read.parquet(str(out)).count()
        extra = sum(len(st["pressure"]) for st in more[newest]["states"])
        assert n2 == n1 + extra

        # re-trigger with no new files: no duplicates (checkpointed offsets)
        q.processAllAvailable()
        assert spark.read.parquet(str(out)).count() == n2
    finally:
        q.stop()


def test_events_hourly_stream_matches_batch(spark, tmp_path):
    src = tmp_path / "events_src"
    rows = [
        (i, f"2024-01-01 0{h}:1{i % 6}:00", "click" if i % 2 else "view", float(i))
        for h in range(3)
        for i in range(6)
    ]
    df = spark.createDataFrame(rows, "event_id long, ts_s string, event_type string, value double")
    df = df.select("event_id", F.to_timestamp("ts_s").alias("ts"), "event_type", "value")
    df.write.mode("overwrite").parquet(str(src))

    stream = spark.readStream.schema(df.schema).parquet(str(src))
    agg = stream_events_hourly(stream, watermark="10 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("hourly_test")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        # update-mode memory sink may hold one row per UPDATE for a key (a
        # batch can split / a task can retry) — the final state per key is
        # the max-count update, since counts only grow
        got = {}
        for r in spark.sql("SELECT * FROM hourly_test").collect():
            key = (r.hour_ts, r.event_type)
            cur = got.get(key)
            if cur is None or r.n_events > cur[0]:
                got[key] = (r.n_events, r.sum_value)
        want = {
            (r.hour_ts, r.event_type): (r.n_events, r.sum_value)
            for r in df.groupBy(
                F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour_ts"),
                "event_type",
            )
            .agg(F.count(F.lit(1)).alias("n_events"), money.sum_money2(F.col("value"), money.CENTS).alias("sum_value"))
            .collect()
        }
        assert got == want
    finally:
        q.stop()


def test_stateful_sessionize_closes_on_gap_across_batches(spark, tmp_path):
    """applyInPandasWithState: session state survives micro-batches; a gap
    arriving in a LATER batch closes the session opened in an earlier one.

    Deflaked (round-2 verdict item 2): the streaming query runs in its OWN
    SparkSession (isolated temp-view catalog and query namespace — the
    shared session fixture also hosts other tests' streams), the memory sink
    name is unique per run, and every append asserts the source actually
    delivered the written rows via recentProgress before the sink is read —
    a listing miss fails loudly at the append that lost rows instead of as a
    downstream set mismatch."""
    import uuid

    from pumle_spark.streaming.sessions import sessionize_stateful

    sess = spark.newSession()
    src = tmp_path / "sess_src"
    src.mkdir()
    ckpt = tmp_path / "sess_ckpt"
    gap_us = 1000
    sink = f"sessions_test_{uuid.uuid4().hex[:8]}"

    schema = "user_id bigint, tus bigint"
    stream = sess.readStream.schema(schema).parquet(str(src))
    out = sessionize_stateful(stream, gap_us=gap_us)
    q = (
        out.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .start()
    )

    total_in = 0

    def append_and_drain(rows):
        # coalesce(1): ONE data file per append. A multi-file append commits
        # via sequential renames, and the running stream can list mid-commit
        # — splitting the append across micro-batches in arbitrary file
        # order, which reorders events ACROSS batches and legitimately
        # shifts the session start (the operator's contract is in-order
        # arrival across batches; only within-batch disorder is sorted).
        # This was the actual root cause of the round-2 flake.
        nonlocal total_in
        sess.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(str(src))
        q.processAllAvailable()
        total_in += len(rows)
        seen = sum(p.numInputRows for p in q.recentProgress)
        assert seen == total_in, f"source delivered {seen} of {total_in} written rows"

    try:
        # batch 1: user 7 has a tight burst; nothing closes yet
        append_and_drain([(7, 100), (7, 200), (7, 300)])
        assert sess.sql(f"SELECT * FROM {sink}").count() == 0

        # batch 2: far-future event → closes session (100..300, 3 events);
        # also a second user bursting (stays open)
        append_and_drain([(7, 5000), (9, 100)])
        rows = sess.sql(f"SELECT * FROM {sink}").collect()
        got2 = {(r.user_id, r.start_us, r.end_us, r.n_events) for r in rows}
        assert got2 == {(7, 100, 300, 3)}, f"unexpected closures: {sorted(got2)}"

        # batch 3: two gaps in ONE batch for user 9 → two closures at once
        append_and_drain([(9, 3000), (9, 9000)])
        got = {
            (r.user_id, r.start_us, r.end_us, r.n_events)
            for r in sess.sql(f"SELECT * FROM {sink}").collect()
        }
        assert (9, 100, 100, 1) in got and (9, 3000, 3000, 1) in got
    finally:
        q.stop()


def test_stream_dedup_drops_cross_batch_duplicates(spark, tmp_path):
    from pumle_spark.streaming.pipeline import stream_dedup_events

    src = tmp_path / "dedup_src"
    src.mkdir()
    schema = "event_id bigint, ts timestamp, value double"
    stream = spark.readStream.schema(schema).parquet(str(src))
    out = stream_dedup_events(stream, watermark="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "dedup_ckpt"))
        .start()
    )
    try:
        import datetime

        t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)

        def ts(mins):
            return t0 + datetime.timedelta(minutes=mins)

        spark.createDataFrame(
            [(1, ts(0), 1.0), (2, ts(1), 2.0), (1, ts(0), 1.0)], schema
        ).write.mode("append").parquet(str(src))
        q.processAllAvailable()
        assert spark.sql("SELECT count(*) FROM dedup_test").collect()[0][0] == 2

        # same ids replayed in a LATER batch (within watermark): still dropped
        spark.createDataFrame([(2, ts(1), 2.0), (3, ts(2), 3.0)], schema).write.mode(
            "append"
        ).parquet(str(src))
        q.processAllAvailable()
        rows = spark.sql("SELECT event_id FROM dedup_test").collect()
        assert sorted(r.event_id for r in rows) == [1, 2, 3]
    finally:
        q.stop()


def test_stream_hourly_rollup_matches_batch(spark, tmp_path):
    """Batch/stream equivalence gate: stream_events_hourly driven to
    completion over the real events table produces EXACTLY the batch
    events_hourly_rollup aggregates for every closed window (same hour_ts,
    event_type, n_events, sum_value). A far-future sentinel event pushes
    the watermark past the last real window so append mode emits them all."""
    from pumle_spark.tables import table

    src = tmp_path / "ev_src"
    src.mkdir()
    ckpt = tmp_path / "ev_ckpt"
    cols = ["event_id", "ts", "event_type", "value"]
    events = (
        table(spark, "/root/testdata/sf0.001", "events").select(*cols).cache()
    )

    # land the table as 3 TIME-ORDERED chunks (roughly in-order arrival —
    # random chunking would advance the watermark past later-arriving
    # windows and legitimately drop them as late), then a sentinel far
    # beyond max(ts) + watermark to close every real window
    with_us = events.withColumn("_us", F.unix_micros("ts"))
    q1, q2 = with_us.approxQuantile("_us", [0.33, 0.66], 0.0)
    chunks = [
        with_us.filter(F.col("_us") < q1),
        with_us.filter((F.col("_us") >= q1) & (F.col("_us") < q2)),
        with_us.filter(F.col("_us") >= q2),
    ]
    schema = "event_id bigint, ts timestamp, event_type string, value double"
    stream = spark.readStream.schema(schema).parquet(str(src))
    out = stream_events_hourly(stream, watermark="2 hours")
    q = (
        out.writeStream.format("memory")
        .queryName("hourly_equiv")
        .outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .start()
    )
    try:
        for chunk in chunks:
            # one file per chunk: a multi-file append can be listed
            # mid-commit and split across micro-batches out of order,
            # advancing the watermark past the chunk's earlier rows
            chunk.select(*cols).coalesce(1).write.mode("append").parquet(str(src))
            q.processAllAvailable()
        sentinel = events.agg(
            (F.lit(10**9) + F.max_by(F.col("event_id"), F.col("event_id"))).alias("event_id"),
            (F.max("ts") + F.expr("INTERVAL 100 DAYS")).alias("ts"),
            F.lit("sentinel").alias("event_type"),
            F.lit(0.0).alias("value"),
        )
        sentinel.select(*cols).write.mode("append").parquet(str(src))
        q.processAllAvailable()

        got = {
            (r.hour_ts, r.event_type, r.n_events, r.sum_value)
            for r in spark.sql("SELECT * FROM hourly_equiv").collect()
            if r.event_type != "sentinel"
        }
    finally:
        q.stop()

    batch = {
        (r.hour_ts, r.event_type, r.n_events, r.sum_value)
        for r in events.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour_ts"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n_events"), money.sum_money2(F.col("value"), money.CENTS).alias("sum_value"))
        .collect()
    }
    assert got == batch


def test_plume_monitor_matches_batch_pipeline(spark, tmp_path):
    """Streaming plume monitor == batch plume_size_over_time on the same
    bronze set (bounds guard included — sim #0's oversized state rows drop
    in both paths)."""
    from pumle_spark.ingest import ingest_golden
    from pumle_spark.plume import plume_size_over_time
    from pumle_spark.streaming.pipeline import start_plume_monitor

    landing = tmp_path / "plm_landing"
    out = tmp_path / "plm_out"
    ckpt = tmp_path / "plm_ckpt"
    landing.mkdir()
    make_bronze(landing, n_sims=3, n_t=4, seed=77)

    q = start_plume_monitor(
        spark,
        str(landing),
        actnum_glob=str(landing / f"grdecl_{CASE}_*.json"),
        out_dir=str(out),
        checkpoint_dir=str(ckpt),
        threshold=0.05,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r.sim_hash, r.t): r.n_plume_cells
        for r in spark.read.parquet(str(out)).collect()
    }
    golden = ingest_golden(
        spark,
        str(landing / f"states_{CASE}_*.json"),
        str(landing / f"grdecl_{CASE}_*.json"),
        str(landing / f"g_{CASE}.json"),
    )
    want = {
        (r.sim_hash, r.t): r.n_plume_cells
        for r in plume_size_over_time(golden, threshold=0.05).collect()
    }
    assert got == want and len(got) > 0


def test_stateful_sessionize_matches_batch_windows(spark, tmp_path):
    """Equivalence gate for the custom stateful operator: driving
    sessionize_stateful over the real events table (time-ordered chunks +
    per-user far-future sentinels to flush every open session) yields
    exactly the session set the batch lag/running-sum formulation computes
    (same user, start, end, event count)."""
    from pumle_spark.streaming.sessions import sessionize_stateful
    from pumle_spark.tables import table

    gap_us = 1800 * 1_000_000
    src = tmp_path / "sess_eq_src"
    src.mkdir()
    ckpt = tmp_path / "sess_eq_ckpt"
    events = (
        table(spark, "/root/testdata/sf0.001", "events")
        .select("user_id", F.unix_micros("ts").alias("tus"))
        .cache()
    )

    q1, q2 = events.approxQuantile("tus", [0.33, 0.66], 0.0)
    chunks = [
        events.filter(F.col("tus") < q1),
        events.filter((F.col("tus") >= q1) & (F.col("tus") < q2)),
        events.filter(F.col("tus") >= q2),
    ]
    schema = "user_id bigint, tus bigint"
    stream = spark.readStream.schema(schema).parquet(str(src))
    out = sessionize_stateful(stream, gap_us=gap_us)
    q = (
        out.writeStream.format("memory")
        .queryName("sess_equiv")
        .outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .start()
    )
    try:
        for chunk in chunks:
            # one file per chunk: mid-commit listing of a multi-file append
            # reorders events across micro-batches (see gap test above)
            chunk.coalesce(1).write.mode("append").parquet(str(src))
            q.processAllAvailable()
        # flush: one sentinel per user, far beyond every real event
        sentinels = events.groupBy("user_id").agg(
            (F.max("tus") + 100 * gap_us).alias("tus")
        )
        events.agg(F.max("tus")).collect()  # force cache before reuse
        sentinels.coalesce(1).write.mode("append").parquet(str(src))
        q.processAllAvailable()
        got = {
            (r.user_id, r.start_us, r.end_us, r.n_events)
            for r in spark.sql("SELECT * FROM sess_equiv").collect()
        }
    finally:
        q.stop()

    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("tus")
    flagged = events.withColumn(
        "new_sess",
        F.when(
            F.lag("tus").over(w).isNull() | ((F.col("tus") - F.lag("tus").over(w)) > gap_us), 1
        ).otherwise(0),
    )
    sess = flagged.withColumn(
        "session_id", F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    want = {
        (r.user_id, r.start_us, r.end_us, r.n_events)
        for r in sess.groupBy("user_id", "session_id")
        .agg(
            F.min("tus").alias("start_us"),
            F.max("tus").alias("end_us"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .collect()
    }
    assert got == want and len(got) > 100


def test_stream_join_boundary_semantics(spark, tmp_path):
    """Stream-stream interval join boundaries the sf-data oracle can't
    guarantee to hit: a purchase exactly at click + 1h (inclusive), one
    1µs past it (excluded), one before the click (excluded), and a
    same-times pair on a different user (user key respected)."""
    import datetime as dt
    import uuid

    from pumle_spark.streaming.pipeline import stream_click_attribution

    base = dt.datetime(2024, 3, 1, 12, 0, 0)
    h = dt.timedelta(hours=1)
    us = dt.timedelta(microseconds=1)
    clicks = [
        (1, base, 10, "click"),
        (2, base, 20, "click"),
    ]
    purchases = [
        (100, base + h, 10, "purchase"),        # exactly +1h → kept
        (101, base + h + us, 10, "purchase"),   # 1µs past → dropped
        (102, base - us, 10, "purchase"),       # before click → dropped
        (103, base + h, 20, "purchase"),        # other user's click only
    ]
    schema = "event_id long, ts timestamp, user_id long, event_type string"
    cdir, pdir = str(tmp_path / "c"), str(tmp_path / "p")
    spark.createDataFrame(clicks, schema).coalesce(1).write.parquet(cdir)
    spark.createDataFrame(purchases, schema).coalesce(1).write.parquet(pdir)

    sink = f"sj_boundary_{uuid.uuid4().hex[:8]}"
    q = (
        stream_click_attribution(
            spark.readStream.schema(schema).parquet(cdir),
            spark.readStream.schema(schema).parquet(pdir),
        )
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r.user_id, r.click_event_id, r.purchase_event_id, r.lag_us)
        for r in spark.table(sink).collect()
    }
    spark.catalog.dropTempView(sink)
    assert got == {
        (10, 1, 100, 3_600_000_000),
        (20, 2, 103, 3_600_000_000),
    }


def test_bronze_stream_restart_is_exactly_once(spark, tmp_path):
    """The docstring claim 'exactly-once per input file (checkpointed
    file-source offsets)' across a PROCESS RESTART: stop the query, start a
    NEW query from the same checkpoint, and verify the already-ingested
    files are not reprocessed while a file that landed during the outage
    is. This is the recovery path a production deploy actually exercises."""
    landing = tmp_path / "landing"
    out = tmp_path / "golden_obs"
    ckpt = tmp_path / "ckpt"
    landing.mkdir()

    sims = make_bronze(landing, n_sims=2, n_t=2, seed=31)
    q1 = start_bronze_to_golden(spark, str(landing), str(out), str(ckpt))
    try:
        q1.processAllAvailable()
    finally:
        q1.stop()
    n1 = spark.read.parquet(str(out)).count()
    assert n1 == sum(
        sum(len(st["pressure"]) for st in sim["states"]) for sim in sims.values()
    )

    # a file lands while no query is running (the outage window)
    more = make_bronze(tmp_path / "stage2", n_sims=3, n_t=2, seed=32)
    newest = list(more)[-1]
    src = tmp_path / "stage2" / f"states_{CASE}_{newest}.json"
    (landing / src.name).write_text(src.read_text())

    # restart from the SAME checkpoint: old offsets honored, new file picked up
    q2 = start_bronze_to_golden(spark, str(landing), str(out), str(ckpt))
    try:
        q2.processAllAvailable()
        n2 = spark.read.parquet(str(out)).count()
        extra = sum(len(st["pressure"]) for st in more[newest]["states"])
        assert n2 == n1 + extra  # no duplicates of batch-1 files, outage file ingested

        # idempotent re-trigger after restart
        q2.processAllAvailable()
        assert spark.read.parquet(str(out)).count() == n2
    finally:
        q2.stop()


def test_transform_with_state_gate_detects_protobuf():
    """The availability gate must agree with an actual import probe —
    the operator is only claimed where its worker can run."""
    from pumle_spark.streaming.running_totals import transform_with_state_available

    try:
        from google.protobuf import descriptor  # noqa: F401

        expected = True
    except ImportError:
        expected = False
    assert transform_with_state_available() is expected


def test_transform_with_state_running_totals(spark, tmp_path):
    """Spark 4 transformWithStateInPandas: ValueState survives micro-
    batches and the final running totals equal the batch aggregation of
    everything fed in (the exactly-once state contract). Harness rules
    follow the sessionize test: own session, unique memory sink,
    one-file-per-append, recentProgress delivery asserts. Skipped where
    google.protobuf is absent (the TWS python worker requires it)."""
    import uuid

    import pytest as _pytest

    from pumle_spark.streaming.running_totals import (
        running_totals,
        transform_with_state_available,
    )

    if not transform_with_state_available():
        _pytest.skip("google.protobuf absent: transformWithState worker cannot start")

    sess = spark.newSession()
    # transformWithState requires the RocksDB state store provider
    sess.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    src = tmp_path / "tot_src"
    src.mkdir()
    ckpt = tmp_path / "tot_ckpt"
    sink = f"totals_test_{uuid.uuid4().hex[:8]}"

    schema = "user_id bigint, vmic bigint"
    stream = sess.readStream.schema(schema).parquet(str(src))
    out = running_totals(stream)
    q = (
        out.writeStream.format("memory")
        .queryName(sink)
        .outputMode("update")
        .option("checkpointLocation", str(ckpt))
        .start()
    )

    total_in = 0
    fed: list[tuple[int, int]] = []

    def append_and_drain(rows):
        nonlocal total_in
        sess.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(str(src))
        q.processAllAvailable()
        total_in += len(rows)
        fed.extend(rows)
        seen = sum(p.numInputRows for p in q.recentProgress)
        assert seen == total_in, f"source delivered {seen} of {total_in} written rows"

    try:
        append_and_drain([(1, 100), (1, 250), (2, 40)])
        append_and_drain([(1, 7), (2, 60), (3, 5)])

        # the LAST update row per user is the running total
        rows = sess.sql(
            f"SELECT user_id, total_micro, n_events FROM {sink}"
        ).collect()
        # collect() row order is not a contract — counts only grow, so the
        # max-n_events row per user IS that user's final running total
        latest = {}
        for r in rows:
            if r.user_id not in latest or r.n_events > latest[r.user_id][1]:
                latest[r.user_id] = (r.total_micro, r.n_events)

        want = {}
        for u, v in fed:
            t, n = want.get(u, (0, 0))
            want[u] = (t + v, n + 1)
        assert latest == want
    finally:
        q.stop()
