"""Structured Streaming execution tests: the streaming twins of the
batch-checked window aggregations, plus the custom stateful operator."""

from __future__ import annotations

from pyspark.sql import functions as F

from core2_spark.catalog import load_table
from core2_spark.queries.util import dsum
from core2_spark.streaming.events import (
    _event_stream,
    run_stream_to_memory,
    tumbling_agg,
)
from core2_spark.streaming.stateful import running_user_profile

SF = "/root/testdata/sf0.001"


def test_event_stream_relative_sf_dir(spark):
    """A RELATIVE sf_dir must stream the same rows as the absolute
    spelling: the shim's symlink target is absolutized, otherwise it
    resolves against the /tmp link directory and dangles — the stream
    then silently reads zero files (r9 sf1 sweep regression)."""
    import os

    rel = os.path.relpath(SF)  # cwd is the repo root under pytest
    assert not os.path.isabs(rel)
    sink = run_stream_to_memory(
        tumbling_agg(_event_stream(spark, rel)), mode="complete"
    )
    n_rel = spark.table(sink).count()
    assert n_rel > 0
    sink2 = run_stream_to_memory(
        tumbling_agg(_event_stream(spark, SF)), mode="complete"
    )
    assert n_rel == spark.table(sink2).count()


def test_streaming_tumbling_matches_batch(spark):
    """The streaming tumbling aggregation must equal the batch result
    once the bounded stream drains (exactly-once semantics)."""
    sink = run_stream_to_memory(tumbling_agg(_event_stream(spark, SF)), mode="complete")
    streamed = {
        (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in spark.table(sink).collect()
    }
    batch = {
        (r["w"]["start"], r["event_type"]): (r["n"], r["tv"])
        for r in (
            load_table(spark, SF, "events")
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count("*").alias("n"), dsum("value").alias("tv"))
            .collect()
        )
    }
    assert streamed == batch


def test_stateful_running_profile(spark):
    """applyInPandasWithState: final per-user state equals the batch
    aggregate after the stream drains."""
    sink = run_stream_to_memory(
        running_user_profile(_event_stream(spark, SF)), mode="update"
    )
    # update mode emits one row per user per micro-batch; the final
    # emission per user carries the converged running state.
    final = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in spark.sql(
            f"""
            SELECT user_id, n_events, total_value FROM (
              SELECT *, ROW_NUMBER() OVER
                (PARTITION BY user_id ORDER BY n_events DESC) AS rn
              FROM {sink}
            ) WHERE rn = 1
            """
        ).collect()
    }
    batch = {
        r["user_id"]: (r["n"], r["tv"])
        for r in (
            load_table(spark, SF, "events")
            .groupBy("user_id")
            .agg(F.count("*").alias("n"), F.sum("value").alias("tv"))
            .collect()
        )
    }
    assert set(final) == set(batch)
    for uid, (n, total) in final.items():
        bn, btv = batch[uid]
        assert n == bn
        assert abs(total - btv) < 1e-3


def test_foreachbatch_streaming_ingest_to_bitemporal(spark, tmp_path):
    """Continuous ingest (core2's tx-log consumption) emulated with
    foreachBatch: each micro-batch is a transaction appended as
    version rows; the final current-state equals the batch answer."""
    from core2_spark import temporal as bt

    table_dir = str(tmp_path / "events_versions")

    def ingest(batch_df, epoch_id):
        rows = batch_df.select(
            F.col("event_id").alias("id"), "user_id", "value", "ts"
        )
        # tx_time = a deterministic per-epoch instant
        bt.put(rows, tx_time=f"2024-06-01 00:00:{epoch_id % 60:02d}").write.mode(
            "append"
        ).parquet(table_dir)

    q = (
        _event_stream(spark, SF)
        .writeStream.outputMode("append")
        .foreachBatch(ingest)
        .start()
    )
    q.processAllAvailable()
    q.stop()

    versions = bt.close_system_versions(spark.read.parquet(table_dir), "id")
    current = bt.latest_versions(versions, "id")
    assert current.count() == load_table(spark, SF, "events").count()


def test_streaming_session_windows_emit_prefix_of_batch(spark):
    """Append-mode streaming session windows: every emitted session
    must match a batch-computed session exactly; trailing sessions
    inside the watermark horizon stay unflushed on a bounded replay."""
    from core2_spark.streaming.events import session_agg

    sink = run_stream_to_memory(
        session_agg(_event_stream(spark, SF)), mode="append"
    )
    streamed = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.table(sink).collect()
    }
    batch = {
        (r["user_id"], r["w"]["start"], r["w"]["end"], r["n"])
        for r in (
            load_table(spark, SF, "events")
            .groupBy(F.session_window("ts", "10 minutes").alias("w"), "user_id")
            .agg(F.count("*").alias("n"))
            .collect()
        )
    }
    assert streamed, "no sessions emitted"
    assert streamed <= batch


def test_watermark_drops_late_rows(spark, tmp_path):
    """Late-data policy: rows older than the watermark when their
    micro-batch arrives are excluded from append-mode aggregates.
    Deterministic construction: batch 1 advances event time to 12:00,
    batch 2 carries an hour-1 straggler — beyond the 10-minute
    watermark, so its window never re-emits."""
    import time

    src = str(tmp_path / "late_src")
    os_mk = __import__("os").makedirs(src, exist_ok=True)  # noqa: F841
    on_time = [(i, f"2024-01-01 {h:02d}:00:01", 1.0) for i, h in enumerate(range(12))]
    late = [(99, "2024-01-01 01:00:02", 1.0)]  # hour-1 straggler
    schema = "event_id long, ts timestamp, value double"

    spark.createDataFrame(
        [(i, __import__("datetime").datetime.fromisoformat(t), v) for i, t, v in on_time],
        schema,
    ).coalesce(1).write.mode("overwrite").parquet(f"{src}/batch1")
    spark.createDataFrame(
        [(i, __import__("datetime").datetime.fromisoformat(t), v) for i, t, v in late],
        schema,
    ).coalesce(1).write.mode("overwrite").parquet(f"{src}/batch2")

    # stage the two batches as separate files arriving in order
    stream_dir = str(tmp_path / "late_stream")
    __import__("os").makedirs(stream_dir)
    import glob as _glob
    import shutil as _shutil

    # guarantee two micro-batches: the straggler file only appears
    # after the first processAllAvailable() has advanced the watermark
    _shutil.copy(_glob.glob(f"{src}/batch1/*.parquet")[0], f"{stream_dir}/00.parquet")

    stream = spark.readStream.schema(schema).parquet(stream_dir)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("late_data_sink")
        .start()
    )
    q.processAllAvailable()  # batch 1: watermark advances to 11:50
    _shutil.copy(_glob.glob(f"{src}/batch2/*.parquet")[0], f"{stream_dir}/01.parquet")
    time.sleep(0.1)
    q.processAllAvailable()  # batch 2: straggler is beyond the watermark
    dropped = sum(
        op.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for op in p.get("stateOperators", [])
    )
    q.stop()
    emitted = {
        (r["ws"].hour, r["n"]) for r in spark.sql("SELECT * FROM late_data_sink").collect()
    }
    # the straggler was dropped by the watermark, never aggregated
    assert dropped >= 1, [p for p in q.recentProgress]
    assert all(n == 1 for _h, n in emitted), emitted


def test_stream_stream_join_matches_batch(spark):
    """Stream-stream inner join with event-time bounds: purchases
    joined to the same user's errors within the preceding 10 minutes.
    On a bounded replay the result must equal the batch join."""
    left = (
        _event_stream(spark, SF)
        .filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").alias("p_ts"), F.col("event_id").alias("p_id"))
        .withWatermark("p_ts", "30 minutes")
    )
    right = (
        _event_stream(spark, SF)
        .filter(F.col("event_type") == "error")
        .select(
            F.col("user_id").alias("e_user"), F.col("ts").alias("e_ts"),
            F.col("event_id").alias("e_id"),
        )
        .withWatermark("e_ts", "30 minutes")
    )
    joined = left.join(
        right,
        (F.col("user_id") == F.col("e_user"))
        & (F.col("e_ts") <= F.col("p_ts"))
        & (F.col("e_ts") > F.col("p_ts") - F.expr("INTERVAL 10 MINUTES")),
        "inner",
    ).select("p_id", "e_id")
    sink = run_stream_to_memory(joined, mode="append")
    streamed = {(r["p_id"], r["e_id"]) for r in spark.table(sink).collect()}

    ev = load_table(spark, SF, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts"), F.col("event_id").alias("p_id")
    )
    e = ev.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("e_user"), F.col("ts").alias("e_ts"),
        F.col("event_id").alias("e_id"),
    )
    batch = {
        (r["p_id"], r["e_id"])
        for r in p.join(
            e,
            (F.col("user_id") == F.col("e_user"))
            & (F.col("e_ts") <= F.col("p_ts"))
            & (F.col("e_ts") > F.col("p_ts") - F.expr("INTERVAL 10 MINUTES")),
        ).select("p_id", "e_id").collect()
    }
    assert streamed == batch and len(batch) > 0


def test_kafka_transport_raises_with_guidance(spark):
    """The real Kafka source needs the connector jar (absent here) —
    the error must say so and name the file twin."""
    import pytest

    from core2_spark.streaming.log_transport import kafka_log_stream

    with pytest.raises(RuntimeError, match="spark-sql-kafka"):
        kafka_log_stream(spark, "t", "localhost:9092")


def test_file_log_transport_wire_schema_and_decode(spark):
    """The file twin must present Kafka's exact wire schema, and the
    consumer-style decode must recover every event."""
    from core2_spark.streaming.log_transport import (
        WIRE_SCHEMA,
        parse_log_records,
        read_log_stream,
    )

    wire = read_log_stream(spark, "auto", sf_dir=SF)  # auto → file fallback
    assert wire.isStreaming
    got = {(f.name, f.dataType.simpleString()) for f in wire.schema.fields}
    want = {(f.name, f.dataType.simpleString()) for f in WIRE_SCHEMA.fields}
    assert got == want

    parsed = parse_log_records(wire)
    sink = run_stream_to_memory(parsed, mode="append")
    decoded = spark.table(sink)
    batch = load_table(spark, SF, "events")
    assert decoded.count() == batch.count()
    # offsets are the event ids; decode round-trips the payload
    row = decoded.orderBy("offset").first()
    assert row["offset"] == row["event_id"]
    assert row["event_type"] is not None and row["partition"] in (0, 1, 2, 3)


def test_stream_into_engine_batches_become_transactions(spark, tmp_path):
    """foreachBatch ingest: each micro-batch commits as one engine
    transaction; time-travel sees batch boundaries as system-time
    versions (the reference's log-consumer/indexer loop)."""
    import os

    from core2_spark.engine import Engine
    from core2_spark.streaming.ingest import stream_into_engine

    ev = load_table(spark, SF, "events").select(
        F.col("event_id").alias("id"), "user_id", "event_type", "value"
    )
    first = ev.filter(F.col("id") % 2 == 0)
    second = ev.filter(F.col("id") % 2 == 1)
    src = str(tmp_path / "src")
    os.makedirs(src)
    # two files → two micro-batches at maxFilesPerTrigger=1
    first.coalesce(1).write.parquet(src + "/b0")
    second.coalesce(1).write.parquet(src + "/b1")

    root = str(tmp_path / "db")
    eng = Engine(spark, root)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    q = stream_into_engine(stream, eng, "events_bt")
    q.processAllAvailable()
    q.stop()

    total = ev.count()
    db = eng.db()
    assert db.table("events_bt").count() == total
    # batch boundaries are system-time versions
    n_versions = (
        db.history("events_bt").select("system_time_start").distinct().count()
    )
    assert n_versions == 2
    # time-travel to the first batch's clock sees only that batch
    at_b0 = db.sql(
        "SELECT COUNT(*) AS n FROM events_bt FOR SYSTEM_TIME AS OF "
        "TIMESTAMP '2024-06-01 00:00:01'"
    ).collect()[0]["n"]
    assert at_b0 in (first.count(), second.count())
    assert at_b0 < total


def test_kafka_connector_contract_or_skip(spark):
    """VERDICT r3 #8: when the spark-sql-kafka connector is on the
    classpath this round-trips the EXACT Kafka record schema
    (key/value/timestamp/headers) through format("kafka"); in a
    container without the connector it must SKIP visibly, never be
    silently absent.  The file twin's wire-schema identity is asserted
    unconditionally either way."""
    import pytest as _pytest

    from core2_spark.streaming.log_transport import WIRE_SCHEMA, file_log_stream

    # unconditional: the file twin presents exactly Kafka's columns
    twin = file_log_stream(spark, "/root/testdata/sf0.001")
    assert {(f.name, f.dataType.simpleString()) for f in twin.schema.fields} >= {
        (f.name, f.dataType.simpleString()) for f in WIRE_SCHEMA.fields
    }

    # connector-dependent: resolvable only with spark-sql-kafka jars
    try:
        spark.read.format("kafka").option(
            "kafka.bootstrap.servers", "localhost:1"
        ).option("subscribe", "t").option("startingOffsets", "earliest").load()
        connector = True
    except Exception as exc:
        msg = str(exc)
        if "Failed to find" in msg or "DATA_SOURCE_NOT_FOUND" in msg or "ClassNotFound" in msg:
            connector = False
        else:
            # connector resolved but no broker at localhost:1 — the
            # schema contract is still checkable from the relation
            connector = True
    if not connector:
        _pytest.skip(
            "spark-sql-kafka connector not on the classpath; on a real "
            "cluster this test round-trips the Kafka wire schema "
            "(submit with --packages org.apache.spark:spark-sql-kafka-0-10_2.13)"
        )
    # with the connector present, the source's schema must equal the
    # wire schema the file twin mirrors (minus headers, which appear
    # only with includeHeaders=true)
    src = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", "localhost:1")
        .option("subscribe", "t")
        .load()
    )
    assert {(f.name, f.dataType.simpleString()) for f in src.schema.fields} == {
        (f.name, f.dataType.simpleString()) for f in WIRE_SCHEMA.fields
    }


def test_cdc_changes_stream_matches_batch_and_resumes(spark, tmp_path):
    """changes_stream is the streaming twin of Snapshot.changes: a full
    availableNow pass sees every change record with correct put/delete
    tags, a `since` bound replays only the unseen suffix, and a fresh
    stream started after a new transaction picks it up."""
    from core2_spark.engine import Delete, Engine, Put
    from core2_spark.streaming.cdc import changes_stream

    root = str(tmp_path / "cdc")
    eng = Engine(spark, root)
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    eng.submit_tx([Put("t", df)], tx_time="2024-03-01T00:00:00")
    ids = spark.createDataFrame([(2,)], "id long")
    eng.submit_tx([Delete("t", ids)], tx_time="2024-04-01T00:00:00")

    def drain(stream, name):
        q = (
            stream.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.sql(
            f"SELECT id, _change FROM {name} ORDER BY system_time_start, id"
        ).collect()

    got = drain(changes_stream(spark, root, "t"), "cdc_all")
    assert [(r["id"], r["_change"]) for r in got] == [
        (1, "put"), (2, "put"), (2, "delete"),
    ]
    # matches the batch feed over the same span
    batch = eng.db().changes("t", since="2024-01-01")
    assert batch.count() == 3

    # a `since` bound tails only the unseen suffix
    tail = drain(
        changes_stream(spark, root, "t", since="2024-03-15"), "cdc_tail"
    )
    assert [(r["id"], r["_change"]) for r in tail] == [(2, "delete")]

    # new transaction → a fresh tail sees it
    eng2 = Engine(spark, root)
    eng2.submit_tx(
        [Put("t", spark.createDataFrame([(3, "c")], "id long, v string"))],
        tx_time="2024-06-01T00:00:00",
    )
    again = drain(changes_stream(spark, root, "t", since="2024-05-01"), "cdc_new")
    assert [(r["id"], r["_change"]) for r in again] == [(3, "put")]


def test_replicate_stream_converges_and_resumes(spark, tmp_path):
    """Continuous replication (round-5): tail the source engine's CDC
    stream into a replica via foreachBatch → apply_changes.  The
    replica converges to the source's bitemporal state, and a SECOND
    run from the same checkpoint replays only the unseen suffix
    (exactly-once across restarts)."""
    from core2_spark.engine import Delete, Engine, Put
    from core2_spark.streaming.cdc import replicate_stream

    src_root = str(tmp_path / "src")
    dst_root = str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    src = Engine(spark, src_root)
    dst = Engine(spark, dst_root)

    src.submit_tx(
        [Put("t", spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"))],
        tx_time="2024-01-10 00:00:00",
    )
    src.submit_tx(
        [Put("t", spark.createDataFrame([(1, "a2")], "id long, v string"))],
        tx_time="2024-02-10 00:00:00",
    )

    q = replicate_stream(spark, src_root, "t", dst, ckpt)
    q.awaitTermination(120)
    cur = lambda db: {(r["id"], r["v"]) for r in db.table("t").collect()}
    assert cur(dst.db()) == cur(src.db()) == {(1, "a2"), (2, "b")}

    # new source transactions; resume from the same checkpoint — the
    # stream applies only the suffix, so history has no duplicates
    src.submit_tx(
        [Delete("t", spark.createDataFrame([(2,)], "id long"))],
        tx_time="2024-03-10 00:00:00",
    )
    dst.refresh()  # the replica engine re-reads its own log head
    q2 = replicate_stream(spark, src_root, "t", dst, ckpt)
    q2.awaitTermination(120)
    assert cur(dst.db()) == cur(src.db()) == {(1, "a2")}
    assert dst.db().history("t").count() == src.db().history("t").count() == 4


def test_maintain_views_stream_refreshes_on_commits(spark, tmp_path):
    """Continuous incremental view maintenance: a maintainer process
    tails the change feed and refreshes materialized views after each
    micro-batch; triggers are idempotent (refresh noops at the head),
    so redelivery cannot double-apply."""
    from core2_spark.engine import Engine, Put
    from core2_spark.streaming.cdc import maintain_views_stream

    root = str(tmp_path / "mv_src")
    writer = Engine(spark, root)

    def rows(data):
        return spark.createDataFrame(data, "id long, grp string, v double")

    writer.submit_tx([Put("t", rows([(i, f"g{i % 2}", float(i)) for i in range(8)]))])
    writer.create_materialized_view(
        "agg", "t", ["grp"], {"n": ("count", "*"), "total": ("sum", "v")}
    )

    # maintainer: a separate Engine object over the same root
    maintainer = Engine(spark, root)
    ckpt = str(tmp_path / "ckpt")

    writer.submit_tx([Put("t", rows([(0, "gX", 5.0), (100, "g1", 2.0)]))])
    q = maintain_views_stream(spark, maintainer, "t", ckpt)
    q.awaitTermination(120)

    got = sorted(tuple(r) for r in writer.materialized_view("agg").collect())
    want = sorted(
        tuple(r)
        for r in writer.db()
        .table("t")
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("total"))
        .collect()
    )
    assert got == want

    # second round: more commits, resume from the same checkpoint
    writer.submit_tx([Put("t", rows([(1, "gX", 7.0)]))])
    q2 = maintain_views_stream(spark, maintainer, "t", ckpt)
    q2.awaitTermination(120)
    got2 = sorted(tuple(r) for r in writer.materialized_view("agg").collect())
    want2 = sorted(
        tuple(r)
        for r in writer.db()
        .table("t")
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("total"))
        .collect()
    )
    assert got2 == want2


def test_stream_upsert_cdc_apply(spark, tmp_path):
    """CDC apply via streaming upsert: batch 0 seeds three ids, batch 1
    updates one, deletes one (tombstone), inserts one, with an in-batch
    duplicate collapsed by _seq.  History keeps the pre-update
    versions; current state reflects the merge."""
    import os

    from core2_spark.engine import Engine
    from core2_spark.streaming.ingest import stream_upsert_into_engine

    schema = "id long, name string, v double, _seq long, _del boolean"
    b0 = spark.createDataFrame(
        [(1, "a", 10.0, 0, False), (2, "b", 20.0, 0, False),
         (3, "c", 30.0, 0, False)],
        schema,
    )
    b1 = spark.createDataFrame(
        [(2, "B_mid", 21.0, 1, False), (2, "B", 22.0, 2, False),  # dup: _seq 2 wins
         (3, "c", 0.0, 1, True),                                   # delete
         (4, "d", 40.0, 1, False)],                                # insert
        schema,
    )
    src = str(tmp_path / "cdc_src")
    os.makedirs(src)
    b0.coalesce(1).write.parquet(src + "/b0")
    b1.coalesce(1).write.parquet(src + "/b1")

    eng = Engine(spark, str(tmp_path / "cdc_db"))
    stream = (
        spark.readStream.schema(b0.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    q = stream_upsert_into_engine(stream, eng, "accounts", delete_col="_del")
    q.processAllAvailable()
    q.stop()

    got = sorted(
        tuple(r)
        for r in eng.db().sql("SELECT id, name, v FROM accounts").collect()
    )
    assert got == [(1, "a", 10.0), (2, "B", 22.0), (4, "d", 40.0)]
    # the pre-update version of id=2 is still in history at batch-0 time
    hist = eng.db().sql(
        "SELECT name FROM accounts FOR SYSTEM_TIME AS OF "
        "TIMESTAMP '2024-06-01 00:00:01' WHERE id = 2"
    ).collect()
    assert [r[0] for r in hist] == ["b"]


def test_stream_upsert_refuses_unordered_duplicates(spark, tmp_path):
    import os

    from core2_spark.engine import Engine
    from core2_spark.streaming.ingest import stream_upsert_into_engine

    b0 = spark.createDataFrame(
        [(1, "x"), (1, "y")], "id long, name string"
    )
    src = str(tmp_path / "dup_src")
    os.makedirs(src)
    b0.coalesce(1).write.parquet(src + "/b0")
    eng = Engine(spark, str(tmp_path / "dup_db"))
    stream = (
        spark.readStream.schema(b0.schema)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    import pytest as _pytest

    q = stream_upsert_into_engine(stream, eng, "t")
    try:
        with _pytest.raises(Exception, match="duplicate id"):
            q.processAllAvailable()
    finally:
        q.stop()
    # nothing committed
    assert "t" not in eng.db().basis.manifests


def test_stream_upsert_null_delete_flag_is_upsert(spark, tmp_path):
    """A NULL delete flag means 'not a delete' — the row must reach
    the Put branch, never be silently dropped by 3VL filtering.
    r7 review finding #3."""
    import os

    from core2_spark.engine import Engine
    from core2_spark.streaming.ingest import stream_upsert_into_engine

    b0 = spark.createDataFrame(
        [(1, "a", None), (2, "b", True)],
        "id long, name string, _del boolean",
    )
    src = str(tmp_path / "nullflag_src")
    os.makedirs(src)
    b0.coalesce(1).write.parquet(src + "/b0")
    eng = Engine(spark, str(tmp_path / "nullflag_db"))
    stream = (
        spark.readStream.schema(b0.schema)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    q = stream_upsert_into_engine(stream, eng, "t", delete_col="_del")
    q.processAllAvailable()
    q.stop()
    got = [tuple(r) for r in eng.db().sql("SELECT id, name FROM t").collect()]
    assert got == [(1, "a")]


def test_stateful_sessionize_state_spans_micro_batches(spark, tmp_path):
    """sessionize_stateful's GroupState hand-off across micro-batches:
    a session open at the end of batch 1 must MERGE with batch 2's
    continuation (one emission, combined counts), a gap at the batch
    boundary must close it, and each closed session is emitted exactly
    once.  The driver-gated oracle runs single-batch, so this is the
    only check of the cross-batch stitch."""
    import os
    import time
    from datetime import datetime

    from core2_spark.streaming.stateful import sessionize_stateful

    def ts(m):
        return datetime(2024, 1, 1, 10, m)

    batch1 = [(1, ts(0), 1.00), (1, ts(5), 2.00), (2, ts(0), 5.00)]
    # user 1: 10:08 continues the open session (3 min after 10:05);
    # 10:30 closes it (22 min gap); 10:45 closes [10:30] (15 min gap)
    # and stays open in state.  user 2: 10:20 closes [10:00].
    batch2 = [
        (1, ts(8), 4.00),
        (1, ts(30), 8.00),
        (1, ts(45), 16.00),
        (2, ts(20), 32.00),
    ]
    src = str(tmp_path / "stream_src")
    os.makedirs(src)
    schema = "user_id long, ts timestamp, value double"
    for i, rows in enumerate((batch1, batch2)):
        f = str(tmp_path / f"b{i}")
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(f)
        part = [n for n in os.listdir(f) if n.endswith(".parquet")][0]
        dst = os.path.join(src, f"batch{i}.parquet")
        os.rename(os.path.join(f, part), dst)
        # file source ingests oldest-mtime first; force the order
        os.utime(dst, (1000 + i * 100, 1000 + i * 100))
        time.sleep(0.05)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    sink = run_stream_to_memory(sessionize_stateful(stream), mode="update")
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"], r["value_cents"])
        for r in spark.table(sink).collect()
    }
    assert got == {
        (1, ts(0), ts(18), 3, 700),    # 10:00+10:05 stitched with 10:08
        (1, ts(30), ts(40), 1, 800),   # closed by 10:45 within batch 2
        (2, ts(0), ts(10), 1, 500),    # closed by 10:20 at the boundary
    }
    assert spark.table(sink).count() == 3, "each closed session emits once"
