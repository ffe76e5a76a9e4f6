"""Streaming layer tests: file-sourced Structured Streaming runs
compared against the batch forms of the same queries (shared
expression logic), plus stateful-operator semantics on hand-built
scenarios.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from flink_wsr_project_spark.operators.topn import topn_per_group
from flink_wsr_project_spark.sources.readers import load_table
from flink_wsr_project_spark.streaming.sources import market_event_source
from flink_wsr_project_spark.streaming.stateful import (
    blacklist_filter,
    login_fail_detector,
    order_timeout_monitor,
)
from flink_wsr_project_spark.streaming.topn import stream_topn
from flink_wsr_project_spark.streaming.windows import streaming_windowed_agg
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def events_stream_dir(spark, tmp_path_factory):
    """events (sf0.001) rewritten as a streamable parquet dir."""
    d = str(tmp_path_factory.mktemp("events_stream"))
    load_table(spark, "events", SF_DIR).write.mode("overwrite").parquet(d)
    return d


def _read_stream(spark, d):
    schema = spark.read.parquet(d).schema
    return spark.readStream.schema(schema).parquet(d)


def test_streaming_windowed_agg_matches_batch(spark, events_stream_dir):
    stream = _read_stream(spark, events_stream_dir)
    agg = streaming_windowed_agg(
        stream.filter(F.col("event_type") == "view"),
        "ts",
        "1 hour",
        watermark="1 second",
        allowed_lateness="60 seconds",
        aggs=[F.count("*").alias("cnt")],
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("pv_stream")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r.window_end, r.cnt)
        for r in spark.sql("SELECT window_end, cnt FROM pv_stream").collect()
    }
    from flink_wsr_project_spark.plans.registry import all_queries

    want = {(r.window_end, r.cnt) for r in all_queries()["pv_hourly"](spark, SF_DIR).collect()}
    assert got == want


def test_stream_topn_matches_batch(spark, events_stream_dir):
    stream = _read_stream(spark, events_stream_dir)
    agg = streaming_windowed_agg(
        stream.filter(F.col("event_type") == "view"),
        "ts",
        "1 hour",
        "5 minutes",
        keys=[F.col("user_id").alias("item_id")],
        aggs=[F.count("*").alias("cnt")],
        watermark="1 second",
    )
    # update-mode upserts keyed by (window_end, rank) — keep the latest
    latest: dict[tuple, tuple] = {}

    def sink(ranked_df, epoch_id):
        for r in ranked_df.collect():
            latest[(r.window_end, r.rank)] = (r.item_id, r.cnt)

    q = stream_topn(agg, ["window_end"], "cnt", 5, sink, tiebreakers=["item_id"])
    q.processAllAvailable()
    q.stop()

    from flink_wsr_project_spark.plans.registry import all_queries

    want = {
        (r.window_end, r.rank): (r.item_id, r.cnt)
        for r in all_queries()["hot_items_topn"](spark, SF_DIR).collect()
    }
    assert latest == want


def test_market_rate_source(spark):
    stream = market_event_source(spark, rows_per_second=50)
    q = stream.writeStream.outputMode("append").format("memory").queryName("mkt").start()
    import time

    time.sleep(2.5)
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT * FROM mkt").collect()
    assert {f.name for f in stream.schema.fields} == {"user_id", "behavior", "channel", "ts"}
    if rows:  # rate source warm-up can be slow on loaded CI boxes
        assert {r.behavior for r in rows} <= {"CLICK", "DOWNLOAD", "INSTALL", "UNINSTALL"}
        assert {r.channel for r in rows} <= {"appstore", "huweistore", "weibo", "wechat"}


def test_login_fail_detector_matches_batch(spark, events_stream_dir):
    stream = _read_stream(spark, events_stream_dir)
    warnings = login_fail_detector(stream, max_gap_s=1800.0)
    q = warnings.writeStream.outputMode("append").format("memory").queryName("lf").start()
    q.processAllAvailable()
    q.stop()
    got = {
        (r.user_id, r.first_fail, r.last_fail)
        for r in spark.sql("SELECT * FROM lf").collect()
    }
    from flink_wsr_project_spark.plans.registry import all_queries

    want = {
        (r.user_id, r.first_fail, r.last_fail)
        for r in all_queries()["login_fail_detect"](spark, SF_DIR).collect()
    }
    assert got == want


def test_order_timeout_monitor_semantics(spark, tmp_path):
    # hand-built scenario: in-deadline pay, late pay, pay-before-create,
    # never-paid (times out via watermark advance from later events)
    rows = [
        (1, "create", "2024-01-01 00:00:00"),
        (1, "pay", "2024-01-01 00:05:00"),        # within 15 min
        (2, "create", "2024-01-01 00:00:00"),
        (2, "pay", "2024-01-01 00:30:00"),        # beyond 15 min
        (3, "pay", "2024-01-01 00:02:00"),        # pay before create
        (3, "create", "2024-01-01 00:01:00"),
        (4, "create", "2024-01-01 00:00:00"),     # never paid → timeout
        (6, "pay", "2024-01-01 00:00:30"),        # pay, create never arrives
        (5, "create", "2024-01-01 02:00:00"),     # watermark pusher
        (5, "pay", "2024-01-01 02:00:01"),
    ]
    pdf = pd.DataFrame(rows, columns=["order_id", "event_type", "ts_str"])
    df = spark.createDataFrame(pdf).withColumn("ts", F.to_timestamp("ts_str")).drop("ts_str")
    d = str(tmp_path / "orders_stream")
    df.coalesce(1).write.parquet(d)
    stream = spark.readStream.schema(spark.read.parquet(d).schema).parquet(d)
    out = order_timeout_monitor(stream, deadline_s=900)
    q = out.writeStream.outputMode("append").format("memory").queryName("ot").start()
    q.processAllAvailable()
    # second trigger past the watermark so the event-time timers fire
    late = pd.DataFrame(
        [(7, "create", "2024-01-01 03:00:00")],
        columns=["order_id", "event_type", "ts_str"],
    )
    (
        spark.createDataFrame(late)
        .withColumn("ts", F.to_timestamp("ts_str"))
        .drop("ts_str")
        .coalesce(1)
        .write.mode("append")
        .parquet(d)
    )
    q.processAllAvailable()
    q.stop()
    got = {r.order_id: r.status for r in spark.sql("SELECT * FROM ot").collect()}
    assert got[1] == "payed successfully"
    assert got[2] == "payed but already timeout"
    assert got[3] == "payed successfully"  # out-of-order handled (PF :109-115)
    assert got[5] == "payed successfully"
    assert got[4] == "order timeout"
    assert got[6] == "already payed but not found created log"


def test_blacklist_filter_semantics(spark, events_stream_dir):
    stream = _read_stream(spark, events_stream_dir)
    clicks = stream.filter(F.col("event_type") == "click").withColumn(
        "ad_id", (F.col("user_id") % 5).cast("long")
    )
    out = blacklist_filter(clicks, threshold=2)
    q = out.writeStream.outputMode("append").format("memory").queryName("bl").start()
    q.processAllAvailable()
    q.stop()
    got = {
        (r.user_id, r.ad_id, r.day) for r in spark.sql("SELECT * FROM bl").collect()
    }
    # recompute expectation in pandas: first crossing of >2 clicks per (user, ad, day)
    pdf = (
        load_table(spark, "events", SF_DIR)
        .filter(F.col("event_type") == "click")
        .withColumn("ad_id", (F.col("user_id") % 5).cast("long"))
        .select("user_id", "ad_id", F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"))
        .toPandas()
    )
    counts = pdf.groupby(["user_id", "ad_id", "day"]).size()
    want = {k for k, n in counts.items() if n > 2}
    assert got == want


def test_streaming_session_agg_matches_batch(spark, events_stream_dir):
    from flink_wsr_project_spark.streaming.windows import streaming_session_agg

    stream = _read_stream(spark, events_stream_dir)
    sess = streaming_session_agg(
        stream, "ts", "30 minutes",
        keys=["user_id"], aggs=[F.count("*").alias("n_events")],
    )
    q = (
        sess.writeStream.outputMode("complete")
        .format("memory").queryName("sess_stream").start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.sql("SELECT * FROM sess_stream").collect()
    }
    batch = streaming_session_agg(
        spark.read.parquet(events_stream_dir), "ts", "30 minutes",
        keys=["user_id"], aggs=[F.count("*").alias("n_events")],
    )
    want = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in batch.collect()
    }
    assert got == want and len(want) > 0


def test_streaming_dedup_exact(spark, tmp_path_factory):
    from flink_wsr_project_spark.streaming.dedup import dedup_stream_exact

    d = str(tmp_path_factory.mktemp("dup_docs"))
    rows = [
        (1, "alpha text", "2024-01-01 00:00:01"),
        (2, "beta text", "2024-01-01 00:00:02"),
        (3, "alpha text", "2024-01-01 00:00:03"),  # dup of 1
        (4, "gamma text", "2024-01-01 00:00:04"),
        (5, "beta text", "2024-01-01 00:00:05"),   # dup of 2
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "ts_str"]).withColumn(
        "ts", F.to_timestamp("ts_str")
    ).drop("ts_str")
    df.write.mode("overwrite").parquet(d)

    stream = _read_stream(spark, d)
    deduped = dedup_stream_exact(stream, "text", "ts")
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory").queryName("dedup_stream").start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.sql("SELECT text FROM dedup_stream").collect()
    # one row per distinct content; exact survivor depends on batch order
    assert sorted(r.text for r in got) == ["alpha text", "beta text", "gamma text"]

    batch = dedup_stream_exact(spark.read.parquet(d), "text", "ts")
    assert batch.count() == 3


def test_idempotent_parquet_sink(spark, tmp_path_factory):
    from flink_wsr_project_spark.streaming.sinks import idempotent_parquet_sink

    src = str(tmp_path_factory.mktemp("sink_src"))
    out = str(tmp_path_factory.mktemp("sink_out")) + "/data"
    cp = str(tmp_path_factory.mktemp("sink_cp"))
    df = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], ["k", "v"])
    df.write.mode("overwrite").parquet(src)

    stream = _read_stream(spark, src)
    q = idempotent_parquet_sink(stream, out, cp)
    q.processAllAvailable()
    q.stop()
    first = spark.read.parquet(out)
    assert first.count() == 3

    # replaying the same epoch (sink retry) must not duplicate rows
    from pyspark.sql import functions as F2

    epoch = first.select(F2.max("_epoch")).collect()[0][0]
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            spark.read.parquet(src)
            .withColumn("_epoch", F2.lit(epoch))
            .write.mode("overwrite")
            .partitionBy("_epoch")
            .parquet(out)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
    assert spark.read.parquet(out).count() == 3


def test_login_fail_state_across_microbatches(spark, tmp_path):
    """State must persist across micro-batches: the two fails arrive in
    SEPARATE triggers; the warning can only come from carried state."""
    d = str(tmp_path / "login_stream")
    rows_a = [(9, "error", "2024-01-01 00:00:00")]
    rows_b = [(9, "error", "2024-01-01 00:00:01")]

    def write(rows):
        (
            spark.createDataFrame(rows, ["user_id", "event_type", "ts_str"])
            .withColumn("ts", F.to_timestamp("ts_str"))
            .drop("ts_str")
            .coalesce(1)
            .write.mode("append")
            .parquet(d)
        )

    write(rows_a)
    stream = spark.readStream.schema(spark.read.parquet(d).schema).parquet(d)
    out = login_fail_detector(stream, max_gap_s=2.0)
    q = out.writeStream.outputMode("append").format("memory").queryName("lf2").start()
    q.processAllAvailable()
    assert spark.sql("SELECT * FROM lf2").count() == 0  # one fail so far

    write(rows_b)
    q.processAllAvailable()
    q.stop()
    got = [
        (r.user_id, r.first_fail, r.last_fail)
        for r in spark.sql("SELECT * FROM lf2").collect()
    ]
    t0 = int(pd.Timestamp("2024-01-01 00:00:00").timestamp())
    assert got == [(9, t0, t0 + 1)]


def test_order_timeout_state_across_microbatches(spark, tmp_path):
    """create in batch 1, pay (within deadline) in batch 2 → success
    emitted only once the second trigger runs."""
    d = str(tmp_path / "orders_stream2")

    def write(rows):
        (
            spark.createDataFrame(rows, ["order_id", "event_type", "ts_str"])
            .withColumn("ts", F.to_timestamp("ts_str"))
            .drop("ts_str")
            .coalesce(1)
            .write.mode("append")
            .parquet(d)
        )

    write([(7, "create", "2024-01-01 00:00:00")])
    stream = spark.readStream.schema(spark.read.parquet(d).schema).parquet(d)
    out = order_timeout_monitor(stream, deadline_s=900)
    q = out.writeStream.outputMode("append").format("memory").queryName("ot2").start()
    q.processAllAvailable()
    assert spark.sql("SELECT * FROM ot2").count() == 0

    write([(7, "pay", "2024-01-01 00:05:00")])
    q.processAllAvailable()
    q.stop()
    got = {r.order_id: r.status for r in spark.sql("SELECT * FROM ot2").collect()}
    assert got == {7: "payed successfully"}


def test_side_output_sink_routes_labels(spark, tmp_path):
    """K4: one labeled stream fans out to per-label sinks + catch-all."""
    from flink_wsr_project_spark.streaming.sinks import side_output_sink

    d = str(tmp_path / "labeled")
    rows = [(1, "matched"), (2, "unmatched_left"), (3, "matched"), (4, "weird")]
    spark.createDataFrame(rows, ["id", "status"]).write.parquet(d)
    stream = _read_stream(spark, d)

    got: dict[str, list] = {"matched": [], "unmatched_left": [], "rest": []}

    def mk(key):
        def fn(batch_df, epoch_id):
            got[key].extend(r.id for r in batch_df.collect())
        return fn

    q = side_output_sink(
        stream, "status",
        {"matched": mk("matched"), "unmatched_left": mk("unmatched_left"), "*": mk("rest")},
    )
    q.processAllAvailable()
    q.stop()
    assert sorted(got["matched"]) == [1, 3]
    assert got["unmatched_left"] == [2]
    assert got["rest"] == [4]


def test_streaming_approx_distinct_matches_batch(spark, events_stream_dir):
    """A10 streaming: HLL++ windowed distinct under readStream equals
    the same aggregation run in batch (same rsd → same sketch)."""
    stream = _read_stream(spark, events_stream_dir)
    agg = streaming_windowed_agg(
        stream, "ts", "1 hour", watermark="1 second",
        aggs=[F.approx_count_distinct("user_id", 0.01).alias("uv")],
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory").queryName("uv_stream").start()
    )
    q.processAllAvailable()
    q.stop()
    got = {(r.window_end, r.uv) for r in spark.sql("SELECT * FROM uv_stream").collect()}
    from flink_wsr_project_spark.operators.windows import windowed_agg as batch_agg
    from flink_wsr_project_spark.sources.readers import load_table

    want = {
        (r.window_end, r.uv)
        for r in batch_agg(
            load_table(spark, "events", SF_DIR), "ts", "1 hour",
            aggs=[F.approx_count_distinct("user_id", 0.01).alias("uv")],
        ).collect()
    }
    assert got == want and len(want) > 0


def test_stream_topn_retract_updates_across_triggers(spark, tmp_path):
    """K2 retract analogue: when a later trigger changes the leader,
    the new epoch re-emits the (window_end, rank) key with the new
    item — consumers treat output as upserts."""
    d = str(tmp_path / "retract_src")

    def write(rows):
        (
            spark.createDataFrame(rows, ["item_id", "ts_str"])
            .withColumn("ts", F.to_timestamp("ts_str"))
            .drop("ts_str")
            .coalesce(1)
            .write.mode("append")
            .parquet(d)
        )

    write([(101, "2024-01-01 00:10:00")] * 2 + [(202, "2024-01-01 00:10:00")])
    stream = spark.readStream.schema(spark.read.parquet(d).schema).parquet(d)
    counts = streaming_windowed_agg(
        stream, "ts", "1 hour", keys=["item_id"],
        aggs=[F.count("*").alias("cnt")], watermark="1 second",
    )
    epochs: dict[int, dict] = {}

    def sink(ranked, epoch_id):
        for r in ranked.collect():
            epochs.setdefault(epoch_id, {})[(r.window_end, r.rank)] = (r.item_id, r.cnt)

    q = stream_topn(counts, ["window_end"], "cnt", 1, sink, tiebreakers=["item_id"])
    q.processAllAvailable()
    write([(202, "2024-01-01 00:20:00")] * 3)  # 202 overtakes: 4 > 2
    q.processAllAvailable()
    q.stop()

    nonempty = [e for e in sorted(epochs) if epochs[e]]
    assert len(nonempty) >= 2
    first, last = epochs[nonempty[0]], epochs[nonempty[-1]]
    we = next(iter(first))[0]
    assert first[(we, 1)][0] == 101          # 101 leads after trigger 1
    assert last[(we, 1)] == (202, 4)         # upsert: 202 leads after trigger 2


def test_per_element_trigger_envelope_update_mode(spark, tmp_path):
    """C6 (per-element FIRE_AND_PURGE trigger) divergence envelope.

    The reference (UniqueVisitor_03_Bloom.scala:62-92) registers a
    trigger that FIREs after EVERY element, emitting the running window
    count continuously. The documented Spark approximation
    (SURVEY §7.4.4; streaming/windows.py) is update mode + micro-batch
    triggers: one emission per CHANGED window per trigger. This test
    pins the exact divergence envelope instead of just claiming it:

    1. every emitted count is a value from the reference's per-element
       running sequence (emissions are boundary SAMPLES of the
       reference stream — never an invented value);
    2. per-window emissions increase monotonically (no retractions);
    3. the final emission equals the reference's final value
       (convergence at stream end);
    4. emissions ≤ elements — the only divergence is the *omitted*
       intermediate values between two trigger boundaries.
    """
    d = str(tmp_path / "c6_src")

    def write(rows):
        (
            spark.createDataFrame(rows, ["user_id", "ts_str"])
            .withColumn("ts", F.to_timestamp("ts_str"))
            .drop("ts_str")
            .coalesce(1)
            .write.mode("append")
            .parquet(d)
        )

    # 5 elements, one 1-hour window; reference emits [1, 2, 3, 4, 5]
    write([(1, "2024-01-01 00:05:00"), (2, "2024-01-01 00:10:00"),
           (3, "2024-01-01 00:15:00")])
    stream = spark.readStream.schema(spark.read.parquet(d).schema).parquet(d)
    agg = streaming_windowed_agg(
        stream, "ts", "1 hour", aggs=[F.count("*").alias("cnt")],
        watermark="1 second",
    )
    emitted: list[tuple[int, int, int]] = []

    def sink(batch_df, epoch_id):
        for r in batch_df.collect():
            emitted.append((epoch_id, r.window_end, r.cnt))

    q = agg.writeStream.outputMode("update").foreachBatch(sink).start()
    q.processAllAvailable()
    write([(4, "2024-01-01 00:20:00"), (5, "2024-01-01 00:25:00")])
    q.processAllAvailable()
    q.stop()

    ref_seq = [1, 2, 3, 4, 5]  # per-element FIRE emissions
    got = [c for (_e, _w, c) in sorted(emitted)]
    assert got, "update mode emitted nothing"
    assert all(c in ref_seq for c in got)  # (1) boundary samples only
    assert got == sorted(set(got))         # (2) monotone, no retraction
    assert got[-1] == ref_seq[-1] == 5     # (3) convergence
    assert len(got) <= len(ref_seq)        # (4) strictly fewer emissions
    assert 3 in got  # the trigger-1 boundary sample was observed


def test_streaming_checkpoint_recovery_exactly_once(spark, tmp_path):
    """Stop → restart from checkpoint: the restarted query resumes from
    the committed offset and the sink stays exactly-once (no dup/loss)."""
    from flink_wsr_project_spark.streaming.sinks import idempotent_parquet_sink

    src = str(tmp_path / "ck_src")
    out = str(tmp_path / "ck_out")
    cp = str(tmp_path / "ck_cp")

    def write(rows):
        spark.createDataFrame(rows, ["k", "v"]).coalesce(1).write.mode("append").parquet(src)

    def start():
        stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
        return idempotent_parquet_sink(stream, out, cp, query_name="ck_sink")

    write([(1, "a"), (2, "b")])
    q = start()
    q.processAllAvailable()
    q.stop()

    write([(3, "c")])
    q = start()          # restart from the same checkpoint
    q.processAllAvailable()
    q.stop()

    got = sorted(r.k for r in spark.read.parquet(out).select("k").collect())
    assert got == [1, 2, 3]  # each row exactly once across the restart


def test_streaming_to_incremental_state_bridge(spark, tmp_path):
    """foreachBatch + update_aggregate_table: a stream maintains a
    persisted mergeable aggregate; final state equals batch recompute."""
    from flink_wsr_project_spark.operators.incremental import update_aggregate_table

    src = str(tmp_path / "inc_src")
    state = str(tmp_path / "inc_state")

    def write(rows):
        spark.createDataFrame(rows, ["k", "v"]).coalesce(1).write.mode("append").parquet(src)

    write([("a", 1), ("b", 2)])
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)

    def process(batch_df, epoch_id):
        if batch_df.count():
            update_aggregate_table(
                batch_df.sparkSession, state, batch_df, ["k"],
                {"n": F.count("*"), "total": F.sum("v")},
                {"n": "sum", "total": "sum"},
            )

    q = stream.writeStream.outputMode("append").foreachBatch(process).start()
    q.processAllAvailable()
    write([("a", 10), ("c", 5)])
    q.processAllAvailable()
    q.stop()

    got = {(r.k, r.n, r.total) for r in spark.read.parquet(state).collect()}
    assert got == {("a", 2, 11), ("b", 1, 2), ("c", 1, 5)}


def test_uv_per_element_bloom_exact_fire_sequence(spark, tmp_path):
    """C6 EXACT form: uv_per_element_bloom emits one row PER ELEMENT
    with the post-element count — the reference's FIRE_AND_PURGE
    sequence itself, not a trigger-boundary sample. Cross-checked
    against a plain-Python simulation of the reference's Bloom
    (polynomial hash seed 61, Int wrap, mask bits-1) over the same
    arrival order, across TWO micro-batches (state — count AND bitmap —
    must survive the batch boundary: user 7 repeats in batch 2 and must
    NOT increment)."""
    from flink_wsr_project_spark.streaming.stateful import uv_per_element_bloom

    d = str(tmp_path / "uv_bloom_src")

    def write(rows):
        (
            spark.createDataFrame(rows, ["user_id", "ts_str"])
            .withColumn("ts", F.to_timestamp("ts_str"))
            .drop("ts_str")
            .coalesce(1)
            .write.mode("append")
            .parquet(d)
        )

    # -8 and -12345 pin the sign path: the vectorized digit-fold must
    # start h at ord('-') for negative ids, exactly like str(uid)
    batch1 = [(7, "2024-01-01 00:05:00"), (8, "2024-01-01 00:10:00"),
              (7, "2024-01-01 00:15:00"), (9, "2024-01-01 00:20:00"),
              (-8, "2024-01-01 00:21:00"), (-12345, "2024-01-01 00:22:00")]
    batch2 = [(7, "2024-01-01 00:25:00"), (10, "2024-01-01 00:30:00"),
              (-8, "2024-01-01 00:31:00"),  # repeat: must NOT increment
              (11, "2024-01-01 01:05:00")]  # second window opens
    write(batch1)
    stream = _read_stream(spark, d)
    out = uv_per_element_bloom(stream, bits=1 << 16)

    rows: list[tuple[int, int, int, int]] = []

    def sink(batch_df, epoch_id):
        for r in batch_df.collect():
            rows.append((epoch_id, r.window_end, r.user_id, r.uv))

    q = out.writeStream.outputMode("append").foreachBatch(sink).start()
    q.processAllAvailable()
    write(batch2)
    q.processAllAvailable()
    q.stop()

    # plain-Python reference simulation (same hash, same arrival order)
    def simulate(batches):
        state: dict[int, tuple[int, bytearray]] = {}
        emitted = []
        for batch in batches:
            for uid, ts in sorted(batch, key=lambda r: (r[1], r[0])):
                import datetime as dt

                epoch = int(dt.datetime.fromisoformat(ts + "+00:00").timestamp())
                we = (epoch // 3600 + 1) * 3600
                count, bloom = state.get(we, (0, bytearray(1 << 13)))
                h = 0
                for ch in str(uid):
                    h = (h * 61 + ord(ch)) & 0xFFFFFFFF
                off = h & ((1 << 16) - 1)
                if not bloom[off >> 3] & (1 << (off & 7)):
                    bloom[off >> 3] |= 1 << (off & 7)
                    count += 1
                state[we] = (count, bloom)
                emitted.append((we, uid, count))
        return emitted

    want = simulate([batch1, batch2])
    got = [(w, u, c) for (_e, w, u, c) in sorted(rows)]
    assert len(got) == len(batch1) + len(batch2)  # one FIRE per element
    assert sorted(got) == sorted(want)
    # the per-window FIRE sequences match the reference exactly
    by_window: dict[int, list[int]] = {}
    for _e, w, _u, c in sorted(rows):
        by_window.setdefault(w, []).append(c)
    assert by_window[max(by_window)] == [1]        # window 2: first element
    assert max(by_window[min(by_window)]) == 6     # window 1: 6 distinct users


def test_stateful_operator_state_survives_restart(spark, tmp_path):
    """applyInPandasWithState state (the Bloom bitmap AND the count)
    recovers from the checkpointed state store across a full query
    stop/restart — not just source offsets: a user seen before the
    restart must NOT re-increment the unique-visitor count after it."""
    from flink_wsr_project_spark.streaming.stateful import uv_per_element_bloom

    src = str(tmp_path / "uvck_src")
    cp = str(tmp_path / "uvck_cp")
    rows: list[tuple[int, int]] = []

    def write(data):
        (
            spark.createDataFrame(data, ["user_id", "ts_str"])
            .withColumn("ts", F.to_timestamp("ts_str"))
            .drop("ts_str")
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )

    def sink(batch_df, epoch_id):
        for r in batch_df.collect():
            rows.append((r.user_id, r.uv))

    def start():
        stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
        return (
            uv_per_element_bloom(stream, bits=1 << 16)
            .writeStream.outputMode("append")
            .option("checkpointLocation", cp)
            .foreachBatch(sink)
            .start()
        )

    write([(7, "2024-01-01 00:05:00"), (8, "2024-01-01 00:10:00")])
    q = start()
    q.processAllAvailable()
    q.stop()
    assert rows == [(7, 1), (8, 2)]

    # user 7 repeats AFTER the restart: only recovered bloom state can
    # know it was already counted
    write([(7, "2024-01-01 00:15:00"), (9, "2024-01-01 00:20:00")])
    q = start()
    q.processAllAvailable()
    q.stop()
    assert rows == [(7, 1), (8, 2), (7, 2), (9, 3)]


def test_streaming_continuous_ingest(spark, tmp_path):
    """Continuous corpus curation: a document stream drained through
    foreachBatch + ingest_batch(batch_id=epoch) — each micro-batch
    dedups against the persisted signature state of everything admitted
    before it; an exact copy arriving in a later batch is rejected."""
    from flink_wsr_project_spark.pipeline import ingest_batch

    src = str(tmp_path / "ing_src")
    state = str(tmp_path / "ing_state")

    def write(rows):
        spark.createDataFrame(rows, ["doc_id", "text"]).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    t1 = "the quick brown fox jumps over the lazy dog again and again"
    t2 = "a completely different document about spark window aggregation"
    write([(1, t1), (2, t2)])
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    admitted: list[int] = []

    def sink(batch_df, epoch_id):
        if batch_df.isEmpty():
            return
        r = ingest_batch(spark, state, batch_df, f"epoch{epoch_id}")
        admitted.extend(x.doc_id for x in r["admitted"].collect())

    q = stream.writeStream.outputMode("append").foreachBatch(sink).start()
    q.processAllAvailable()
    write([(3, t1), (4, "yet another unrelated document mentioning join physics")])
    q.processAllAvailable()
    q.stop()

    assert sorted(admitted) == [1, 2, 4]  # doc 3 == doc 1's text: rejected


def test_rate_limited_sink_caps_rows_and_paces_trigger(spark, tmp_path):
    """K5: the trigger paces emission (no Thread.sleep on a task
    thread) and the per-epoch cap is a deterministic ordered limit."""
    from flink_wsr_project_spark.streaming.sinks import rate_limited_sink

    d = str(tmp_path / "k5src")
    rows = [(i, 100 - i) for i in range(20)]
    spark.createDataFrame(rows, ["id", "score"]).write.parquet(d)
    stream = _read_stream(spark, d)

    emitted: list[list] = []

    def fn(batch_df, epoch_id):
        got = [r.id for r in batch_df.collect()]
        if got:
            emitted.append(got)

    q = rate_limited_sink(
        stream,
        fn,
        interval="1 second",
        max_rows_per_trigger=5,
        order_by=["id"],
        query_name="k5_test",
    )
    q.processAllAvailable()
    q.stop()
    # one micro-batch from the static source: capped at 5, lowest ids first
    assert emitted == [[0, 1, 2, 3, 4]]


def test_late_data_refire_within_lateness_then_drop(spark, tmp_path):
    """L2 (NetworkFlowTopNPage…scala:54): a late row arriving while the
    window is inside watermark+allowedLateness re-fires an AMENDED count
    in update mode; a row arriving after the combined bound is dropped
    (the documented divergence envelope: Spark folds allowedLateness
    into the watermark delay instead of keeping a side output)."""
    d = str(tmp_path / "late_refire")

    def write(ts_list):
        (
            spark.createDataFrame([(t,) for t in ts_list], ["t"])
            .select(F.timestamp_seconds("t").alias("ts"))
            .coalesce(1)
            .write.mode("append")
            .parquet(d)
        )

    write([100, 200, 3000])  # window [0, 3600), sets watermark to 3000-61
    stream = spark.readStream.schema(spark.read.parquet(d).schema).parquet(d)
    agg = streaming_windowed_agg(
        stream,
        "ts",
        "1 hour",
        watermark="1 second",
        allowed_lateness="60 seconds",
        aggs=[F.count("*").alias("cnt")],
    )
    q = (
        agg.writeStream.outputMode("update")
        .format("memory")
        .queryName("late_refire")
        .start()
    )
    q.processAllAvailable()
    emitted = lambda: sorted(  # noqa: E731
        r.cnt for r in spark.sql("SELECT cnt FROM late_refire WHERE window_end = 3600").collect()
    )
    assert emitted() == [3]

    write([500])  # late, but window end 3600 is still ≥ watermark → amended re-fire
    q.processAllAvailable()
    assert emitted() == [3, 4]

    write([10000])  # advances watermark past 3600+61 → state evicted
    q.processAllAvailable()
    write([3500])  # beyond the combined bound → dropped, NO re-fire
    q.processAllAvailable()
    q.stop()
    assert emitted() == [3, 4]


def test_stream_topn_upsert_overwrite_across_epochs(spark, tmp_path):
    """K2 (HotItems_2_Table.scala:63 retract stream): stream_topn's
    update-mode output is keyed (window_end, rank); when the ranking
    changes in a later epoch the re-emitted rows OVERWRITE the earlier
    keys, and each epoch emits at most one row per key."""
    d = str(tmp_path / "retract_topn")

    def write(rows):
        (
            spark.createDataFrame(rows, ["item_id", "t"])
            .select("item_id", F.timestamp_seconds("t").alias("ts"))
            .coalesce(1)
            .write.mode("append")
            .parquet(d)
        )

    write([(1, 100), (1, 200), (1, 300), (2, 400)])  # epoch 1: item1=3, item2=1
    stream = spark.readStream.schema(spark.read.parquet(d).schema).parquet(d)
    agg = streaming_windowed_agg(
        stream,
        "ts",
        "1 hour",
        keys=[F.col("item_id")],
        aggs=[F.count("*").alias("cnt")],
        watermark="1 second",
    )
    epochs: list[dict[tuple, tuple]] = []

    def sink(ranked_df, epoch_id):
        rows = ranked_df.collect()
        if rows:
            epochs.append({(r.window_end, r.rank): (r.item_id, r.cnt) for r in rows})
            # per-epoch key uniqueness: one row per (window_end, rank)
            assert len(rows) == len(epochs[-1])

    q = stream_topn(agg, ["window_end"], "cnt", 5, sink, tiebreakers=["item_id"])
    q.processAllAvailable()
    # epoch 2: both items change → item2 overtakes item1 for rank 1
    write([(1, 500), (2, 600), (2, 700), (2, 800), (2, 900)])
    q.processAllAvailable()
    q.stop()

    assert len(epochs) >= 2
    first, last = epochs[0], epochs[-1]
    assert first[(3600, 1)] == (1, 3) and first[(3600, 2)] == (2, 1)
    # overwrite semantics: same keys, new owners/counts
    assert last[(3600, 1)] == (2, 5) and last[(3600, 2)] == (1, 4)
    # merging upserts by key reproduces the batch recompute on all data
    merged: dict[tuple, tuple] = {}
    for e in epochs:
        merged.update(e)
    batch = spark.read.parquet(d)
    from flink_wsr_project_spark.operators.windows import windowed_agg

    full = windowed_agg(batch, "ts", "1 hour", keys=[F.col("item_id")], aggs=[F.count("*").alias("cnt")])
    want = {
        (r.window_end, r.rank): (r.item_id, r.cnt)
        for r in topn_per_group(full, ["window_end"], "cnt", 5, tiebreakers=["item_id"]).collect()
    }
    assert merged == want


def test_external_kv_sink_upserts_by_key_across_epochs(spark, tmp_path):
    """K3 (UniqueVisitor_03_Bloom.scala:136-149): the external-store
    sink upserts (key, value) per epoch — a re-fired window OVERWRITES
    its key (Redis hset semantics), never duplicates."""
    from flink_wsr_project_spark.streaming.sinks import DictStore, external_kv_sink_demo

    d = str(tmp_path / "kv_sink")

    def write(ts_list):
        (
            spark.createDataFrame([(t,) for t in ts_list], ["t"])
            .select(F.timestamp_seconds("t").alias("ts"))
            .coalesce(1)
            .write.mode("append")
            .parquet(d)
        )

    write([100, 200, 3000])
    stream = spark.readStream.schema(spark.read.parquet(d).schema).parquet(d)
    agg = streaming_windowed_agg(
        stream, "ts", "1 hour", watermark="1 second",
        allowed_lateness="60 seconds", aggs=[F.count("*").alias("cnt")],
    )
    store = DictStore()
    q = external_kv_sink_demo(agg, ["window_end"], "cnt", store)
    q.processAllAvailable()
    assert store.data == {"3600": "3"}
    write([500])  # late re-fire → overwrite, not duplicate
    q.processAllAvailable()
    q.stop()
    assert store.data == {"3600": "4"}
    assert len(store.epochs) >= 2


def test_external_kv_sink_distributed_matches_collect_sink(spark, tmp_path):
    """VERDICT r11 #5: the 100 TB KV writer — foreachPartition, one
    store connection per PARTITION, driver never in the data path —
    must reach the same final state as the collect-based demo sink
    under the same epochs, late re-fires included. The driver's
    no-materialize contract is enforced mechanically: DataFrame.collect
    / toPandas / toLocalIterator are poisoned for the duration of the
    distributed run (foreachPartition ships rows executor-side, so the
    sink never needs them)."""
    from unittest import mock

    from pyspark.sql import DataFrame as _DF

    from flink_wsr_project_spark.streaming.sinks import (
        DictStore,
        DirStore,
        external_kv_sink_demo,
        external_kv_sink_distributed,
    )

    d = str(tmp_path / "kv_src")

    def write(ts_list):
        (
            spark.createDataFrame([(t,) for t in ts_list], ["t"])
            .select(F.timestamp_seconds("t").alias("ts"))
            .coalesce(1)
            .write.mode("append")
            .parquet(d)
        )

    def agg_stream():
        stream = spark.readStream.schema(spark.read.parquet(d).schema).parquet(d)
        return streaming_windowed_agg(
            stream, "ts", "1 hour", watermark="1 second",
            allowed_lateness="60 seconds", aggs=[F.count("*").alias("cnt")],
        )

    write([100, 200, 3000])

    def poisoned(self, *a, **k):  # pragma: no cover - must never run
        raise AssertionError("driver materialized the batch in the hot path")

    dir_store = DirStore(str(tmp_path / "kv_dist"))
    with mock.patch.object(_DF, "collect", poisoned), \
         mock.patch.object(_DF, "toPandas", poisoned), \
         mock.patch.object(_DF, "toLocalIterator", poisoned):
        q = external_kv_sink_distributed(
            agg_stream(), ["window_end"], "cnt", lambda: dir_store
        )
        q.processAllAvailable()
        write([500])  # late re-fire -> same key re-mset with the new value
        q.processAllAvailable()
        write([7300])  # a second window key (watermark jump goes LAST —
        q.processAllAvailable()  # earlier it would age 500 past lateness)
        q.stop()

    # replaying an epoch's worth of input through a FRESH query (the
    # at-least-once redelivery shape) leaves the store unchanged
    before = dir_store.data
    q2 = external_kv_sink_distributed(
        agg_stream(), ["window_end"], "cnt", lambda: dir_store
    )
    q2.processAllAvailable()
    q2.stop()
    assert dir_store.data == before

    dict_store = DictStore()
    q3 = external_kv_sink_demo(agg_stream(), ["window_end"], "cnt", dict_store)
    q3.processAllAvailable()
    q3.stop()
    assert dir_store.data == dict_store.data == {"3600": "4", "10800": "1"}


# ---------------------------------------------------------------------------
# r5: the vectorized stateful folds must equal the per-row reference fold
# when a key's micro-batch spans MULTIPLE Arrow chunks and arrives out of
# event-time order (chunk-local sorting was the r4-advice bug class).
# ---------------------------------------------------------------------------


@pytest.fixture()
def tiny_arrow_batches(spark):
    """Force multi-chunk groups: every Arrow record batch carries ≤4 rows,
    so a 20-row key arrives as ≥5 chunks inside one micro-batch."""
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    spark.conf.set(key, "4")
    yield
    spark.conf.set(key, old)


def _write_shuffled(spark, tmp_path, rows, cols, name):
    """Write rows to parquet in a deliberately NON-time-sorted order."""
    import random

    rng = random.Random(17)
    rows = list(rows)
    rng.shuffle(rows)
    d = str(tmp_path / name)
    (
        spark.createDataFrame(rows, cols)
        .withColumn("ts", F.to_timestamp("ts_str"))
        .drop("ts_str")
        .coalesce(1)
        .write.parquet(d)
    )
    return d


def _run_to_memory(df, qname):
    q = df.writeStream.outputMode("append").format("memory").queryName(qname).start()
    q.processAllAvailable()
    q.stop()


def test_login_fail_vectorized_matches_rowfold_out_of_order(
    spark, tmp_path, tiny_arrow_batches
):
    base = pd.Timestamp("2024-01-01 00:00:00")
    rows, expect = [], set()
    # user 1: 20 events, fail-streaks with mixed gaps; user 2: all fails 1s apart
    seq = ["error", "error", "ok", "error", "error", "error", "ok", "ok",
           "error", "error"] * 2
    gaps = [0, 1, 2, 5, 6, 7, 9, 30, 31, 33, 60, 61, 63, 64, 90, 91, 100, 101, 102, 200]
    last_fail = None
    for g, ev in zip(gaps, seq):
        t = base + pd.Timedelta(seconds=g)
        rows.append((1, ev, str(t)))
        if ev == "error":
            if last_fail is not None and g - last_fail <= 2:
                expect.add((1, int(base.timestamp()) + last_fail, int(base.timestamp()) + g))
            last_fail = g
        else:
            last_fail = None
    for i in range(8):
        rows.append((2, "error", str(base + pd.Timedelta(seconds=i))))
        if i:
            expect.add((2, int(base.timestamp()) + i - 1, int(base.timestamp()) + i))
    d = _write_shuffled(spark, tmp_path, rows, ["user_id", "event_type", "ts_str"], "lf_ooo")
    out = login_fail_detector(_read_stream(spark, d), max_gap_s=2.0)
    _run_to_memory(out, "lf_ooo")
    got = {
        (r.user_id, r.first_fail, r.last_fail)
        for r in spark.sql("SELECT * FROM lf_ooo").collect()
    }
    assert got == expect


def test_order_timeout_vectorized_matches_rowfold_out_of_order(
    spark, tmp_path, tiny_arrow_batches
):
    base = pd.Timestamp("2024-01-01 00:00:00")
    rows = []
    # order 1: C C P P C P → three emissions incl. re-arm after a consumed run
    for g, ev in [(0, "create"), (10, "create"), (20, "pay"), (30, "pay"),
                  (40, "create"), (50, "pay")]:
        rows.append((1, ev, str(base + pd.Timedelta(seconds=g))))
    # order 2: pay-before-create, late beyond deadline
    rows.append((2, "pay", str(base + pd.Timedelta(seconds=5))))
    rows.append((2, "create", str(base + pd.Timedelta(seconds=1000))))
    # order 3: single create+pay within deadline, 14 filler creates first
    # (so the key spans multiple 4-row Arrow chunks)
    for i in range(14):
        rows.append((3, "create", str(base + pd.Timedelta(seconds=i))))
    rows.append((3, "pay", str(base + pd.Timedelta(seconds=100))))
    d = _write_shuffled(spark, tmp_path, rows, ["order_id", "event_type", "ts_str"], "ot_ooo")
    out = order_timeout_monitor(_read_stream(spark, d), deadline_s=900)
    _run_to_memory(out, "ot_ooo")
    got = sorted(
        (r.order_id, r.status, r.create_ts, r.pay_ts)
        for r in spark.sql("SELECT * FROM ot_ooo").collect()
    )
    b = int(base.timestamp())
    assert got == sorted(
        [
            (1, "payed successfully", b + 10, b + 20),  # latest C pairs first P
            (1, "payed successfully", b + 40, b + 30),  # re-armed P30 meets C40
            # dangling P50 times out once order 2's ts pushes the watermark
            # past 50+900 (no-data batch fires the event-time timer)
            (1, "already payed but not found created log", None, b + 50),
            (2, "payed successfully", b + 1000, b + 5),  # pay-before-create
            (3, "payed successfully", b + 13, b + 100),
        ]
    )


def test_blacklist_vectorized_matches_rowfold_out_of_order(
    spark, tmp_path, tiny_arrow_batches
):
    rows = []
    # user 1 / ad 1: 12 clicks on day 1 (crossing at 6th), 3 on day 2 (no cross)
    for i in range(12):
        rows.append((1, 1, f"2024-01-01 00:{i:02d}:00"))
    for i in range(3):
        rows.append((1, 1, f"2024-01-02 00:{i:02d}:00"))
    # user 2 / ad 1: exactly threshold clicks → no warning
    for i in range(5):
        rows.append((2, 1, f"2024-01-01 01:{i:02d}:00"))
    d = _write_shuffled(spark, tmp_path, rows, ["user_id", "ad_id", "ts_str"], "bl_ooo")
    out = blacklist_filter(_read_stream(spark, d), threshold=5)
    _run_to_memory(out, "bl_ooo")
    got = [
        (r.user_id, r.ad_id, r.day, r.click_count)
        for r in spark.sql("SELECT * FROM bl_ooo").collect()
    ]
    assert got == [(1, 1, "2024-01-01", 6)]


def test_value_ohlc_stream_matches_batch(spark, events_stream_dir):
    """r4-verdict item 8: the streaming OHLC twin must reproduce the
    batch bar compaction exactly (open/close order via the composite
    key survives watermarked streaming aggregation)."""
    from flink_wsr_project_spark.streaming.windows import value_ohlc_stream

    out = value_ohlc_stream(_read_stream(spark, events_stream_dir))
    q = out.writeStream.outputMode("complete").format("memory").queryName("ohlc_s").start()
    q.processAllAvailable()
    q.stop()
    got = {
        tuple(r) for r in spark.sql("SELECT * FROM ohlc_s").collect()
    }
    from flink_wsr_project_spark.plans.registry import all_queries

    want = {tuple(r) for r in all_queries()["value_ohlc_hourly"](spark, SF_DIR).collect()}
    assert got == want and len(want) > 0


def test_value_vwap_stream_matches_batch(spark, events_stream_dir):
    """r4-verdict item 8: streaming VWAP twin vs the batch form —
    integer turnover/volume sums are order-independent, so the
    streaming result is bit-identical."""
    from flink_wsr_project_spark.streaming.windows import value_vwap_stream

    out = value_vwap_stream(_read_stream(spark, events_stream_dir))
    q = out.writeStream.outputMode("complete").format("memory").queryName("vwap_s").start()
    q.processAllAvailable()
    q.stop()
    got = {tuple(r) for r in spark.sql("SELECT * FROM vwap_s").collect()}
    from flink_wsr_project_spark.plans.registry import all_queries

    want = {tuple(r) for r in all_queries()["value_vwap_hourly"](spark, SF_DIR).collect()}
    assert got == want and len(want) > 0


def test_kmv_stream_matches_batch(spark, events_stream_dir):
    """Streaming KMV sketch: the per-window bottom-k state converges to
    the batch uv_daily_kmv estimate once all rows arrive — the sketch
    merge is associative, so micro-batch arrival order cannot change
    the final k smallest hashes."""
    from flink_wsr_project_spark.streaming.stateful import kmv_distinct_stream

    out = kmv_distinct_stream(
        _read_stream(spark, events_stream_dir).filter(F.col("event_type") == "view"),
        k=8,  # small k so sf0.001 daily windows exercise the estimator
    )
    q = out.writeStream.outputMode("append").format("memory").queryName("kmv_s").start()
    q.processAllAvailable()
    q.stop()
    # last emission per window is the converged sketch
    got = {
        r.window_end: r.uv_kmv
        for r in spark.sql(
            """SELECT window_end, uv_kmv FROM (
                 SELECT *, row_number() OVER (
                   PARTITION BY window_end
                   ORDER BY n_sketch DESC, uv_kmv DESC) rn FROM kmv_s
               ) WHERE rn = 1"""
        ).collect()
    }

    # batch expectation: an INDEPENDENT per-row reimplementation of the
    # sketch arithmetic (same h28 hash / bottom-k / estimator as the
    # registered uv_daily_kmv, at k=8) over the full distinct set
    import hashlib

    rows = (
        load_table(spark, "events", SF_DIR)
        .filter(F.col("event_type") == "view")
        .select(((F.floor(F.unix_timestamp("ts") / 86400) + 1) * 86400).cast("long").alias("w"), "user_id")
        .collect()
    )
    per_w: dict[int, set] = {}
    for r in rows:
        h = int(hashlib.md5(f"uv:{r.user_id}".encode()).hexdigest()[:7], 16)
        per_w.setdefault(r.w, set()).add(h)
    expect = {}
    for w, hset in per_w.items():
        hs = sorted(hset)[:8]
        expect[w] = len(hs) if len(hs) < 8 else (7 * (1 << 28)) // hs[7]
    assert got == expect


def test_ewma_stream_matches_batch(spark, events_stream_dir):
    """Streaming EWMA: the per-user (n, acc) state converges to the
    batch user_value_ewma result once all rows arrive — the third plan
    of the same semantics (in-row fold, secondary sort, incremental
    stream) must agree with the other two."""
    from flink_wsr_project_spark.plans.registry import get
    from flink_wsr_project_spark.streaming.stateful import ewma_stream

    out = ewma_stream(_read_stream(spark, events_stream_dir))
    q = out.writeStream.outputMode("append").format("memory").queryName("ewma_s").start()
    q.processAllAvailable()
    q.stop()
    # last emission per user (n_events is monotone) is the converged fold
    got = {
        r.user_id: (r.n_events, r.ewma_milli)
        for r in spark.sql(
            """SELECT user_id, n_events, ewma_milli FROM (
                 SELECT *, row_number() OVER (
                   PARTITION BY user_id ORDER BY n_events DESC) rn FROM ewma_s
               ) WHERE rn = 1"""
        ).collect()
    }
    want = {
        r.user_id: (r.n_events, r.ewma_milli)
        for r in get("user_value_ewma").spark_fn(spark, SF_DIR).collect()
    }
    assert got == want


def test_locf_stream_matches_batch(spark, events_stream_dir):
    """Streaming LOCF: append-mode grid points over all arrived rows
    must equal the batch user_value_locf result exactly — same grid
    bounds (floor of each user's first/last observation), same carried
    values, same NULL-before-first-observation rows. Each grid point
    is emitted ONCE, so the memory sink IS the result set (no
    last-emission dedup needed)."""
    from flink_wsr_project_spark.plans.registry import get
    from flink_wsr_project_spark.streaming.stateful import locf_stream

    out = locf_stream(_read_stream(spark, events_stream_dir))
    q = out.writeStream.outputMode("append").format("memory").queryName("locf_s").start()
    q.processAllAvailable()
    q.stop()
    got = {
        (r.user_id, r.grid_ts): r.locf_milli
        for r in spark.sql("SELECT * FROM locf_s").collect()
    }
    want = {
        (r.user_id, r.grid_ts): r.locf_milli
        for r in get("user_value_locf").spark_fn(spark, SF_DIR).collect()
    }
    assert got == want


def test_kv_sink_final_state_matches_batch(spark, tmp_path):
    """The registered ``kv_upsert_final_state`` query IS the K3 sink's
    final-state contract: driving the REAL external_kv_sink_demo (update
    mode, running count per (user_id, event_type)) over the same rows
    in TWO micro-batches leaves the DictStore holding exactly the
    query's (kv_key -> kv_value) map — every key was rewritten across
    epochs (upsert), never duplicated."""
    from flink_wsr_project_spark.plans.registry import get
    from flink_wsr_project_spark.streaming.sinks import DictStore, external_kv_sink_demo

    d = str(tmp_path / "kv_events")
    ev = load_table(spark, "events", SF_DIR).select("user_id", "event_type", "ts")
    split_ts = ev.selectExpr("percentile_approx(cast(ts as long), 0.5)").first()[0]
    ev.filter(F.col("ts").cast("long") <= split_ts).coalesce(1).write.mode(
        "append"
    ).parquet(d)

    stream = spark.readStream.schema(spark.read.parquet(d).schema).parquet(d)
    agg = (
        stream.groupBy("user_id", "event_type")
        .count()
        .select(
            F.col("user_id"),
            F.col("event_type"),
            F.col("count").alias("cnt"),
        )
    )
    store = DictStore()
    q = external_kv_sink_demo(agg, ["user_id", "event_type"], "cnt", store)
    q.processAllAvailable()
    mid_state = dict(store.data)
    # second epoch: the rest of the rows — running counts OVERWRITE
    ev.filter(F.col("ts").cast("long") > split_ts).coalesce(1).write.mode(
        "append"
    ).parquet(d)
    q.processAllAvailable()
    q.stop()

    want = {
        r.kv_key: r.kv_value
        for r in get("kv_upsert_final_state").spark_fn(spark, SF_DIR).collect()
    }
    assert store.data == want
    assert len(store.epochs) >= 2
    # the second epoch genuinely rewrote keys (upsert, not append-only)
    rewritten = {k for k, v in mid_state.items() if store.data.get(k) != v}
    assert rewritten, "no key was overwritten across epochs"


def test_state_rows_bounded_by_keys_not_events(spark, tmp_path):
    """Mechanical pin of the O(1)-state-per-key claim (SCALE.md
    streaming layer): after folding many events for few users, the
    state store holds exactly one row PER KEY — numRowsTotal tracks
    keys, never events."""
    import pandas as pd

    d = str(tmp_path / "state_rows")
    n, users = 2000, 10
    pdf = pd.DataFrame(
        {
            "ts": pd.to_datetime(range(1000, 1000 + n), unit="s").astype("datetime64[us]"),
            "user_id": pd.array([i % users for i in range(n)], dtype="int64"),
            "event_type": ["error", "ok"] * (n // 2),
            "event_id": pd.array(range(n), dtype="int64"),
        }
    )
    import os

    os.makedirs(d, exist_ok=True)
    pdf.to_parquet(f"{d}/p.parquet", index=False)
    stream = spark.readStream.schema(spark.read.parquet(d).schema).parquet(d)
    out = login_fail_detector(stream, max_gap_s=2.0)
    q = out.writeStream.outputMode("append").format("memory").queryName("srows").start()
    q.processAllAvailable()
    state = q.lastProgress["stateOperators"][0]
    q.stop()
    assert state["numRowsTotal"] == users  # 10 keys, not 2000 events


def test_kmv_state_evicts_closed_windows(spark, tmp_path):
    """Mechanical pin of the KMV event-time eviction (L4): a day
    window's sketch row is REMOVED from the state store once the
    watermark passes window_end + ttl — closed days do not accumulate."""
    import os

    import pandas as pd

    from flink_wsr_project_spark.streaming.stateful import kmv_distinct_stream

    d = str(tmp_path / "kmv_evict")
    os.makedirs(d, exist_ok=True)

    def write(epochs, tag):
        pdf = pd.DataFrame(
            {
                "ts": pd.to_datetime(epochs, unit="s").astype("datetime64[us]"),
                "user_id": pd.array(range(len(epochs)), dtype="int64"),
                "event_id": pd.array(range(len(epochs)), dtype="int64"),
            }
        )
        pdf.to_parquet(f"{d}/{tag}.parquet", index=False)

    write([100, 200, 300], "b1")  # day-0 window (window_end 86400)
    stream = spark.readStream.schema(
        spark.read.parquet(d).schema
    ).option("maxFilesPerTrigger", "1").parquet(d)
    out = kmv_distinct_stream(stream, k=4, watermark="3 seconds")
    q = out.writeStream.outputMode("append").format("memory").queryName("kmv_ev").start()
    q.processAllAvailable()
    assert q.lastProgress["stateOperators"][0]["numRowsTotal"] == 1
    # day-2 rows push the watermark far past day-0's end + ttl …
    write([2 * 86400 + 100, 2 * 86400 + 200], "b2")
    q.processAllAvailable()
    # … and the NEXT trigger (watermark updated at batch end) evicts it
    write([2 * 86400 + 300], "b3")
    q.processAllAvailable()
    state = q.lastProgress["stateOperators"][0]
    q.stop()
    assert state["numRowsTotal"] == 1  # only the live day-2 window remains


def test_cms_stream_matches_batch(spark, events_stream_dir):
    """Streaming Count-Min sketch: the per-window cell array converges
    to an independent per-row reimplementation of the batch sketch
    arithmetic (same salted h28 hashes as token_cms_heavy_hitters,
    keyed by daily window over user_id) once all rows arrive —
    counting is commutative, so micro-batch boundaries cannot change
    the final cells."""
    from flink_wsr_project_spark.streaming.stateful import cms_user_cells_stream

    DEPTH, WIDTH = 4, 64  # small width so sf0.001 windows collide
    out = cms_user_cells_stream(
        _read_stream(spark, events_stream_dir).filter(F.col("event_type") == "view"),
        depth=DEPTH,
        width=WIDTH,
    )
    q = out.writeStream.outputMode("append").format("memory").queryName("cms_s").start()
    q.processAllAvailable()
    q.stop()
    # last emission per window (n_folded is monotone) is the converged sketch
    got = {
        r.window_end: (r.n_folded, r.nonzero, tuple(r.cells))
        for r in spark.sql(
            """SELECT * FROM (
                 SELECT *, row_number() OVER (
                   PARTITION BY window_end ORDER BY n_folded DESC) rn FROM cms_s
               ) WHERE rn = 1"""
        ).collect()
    }

    # batch expectation: independent per-row reimplementation
    import hashlib

    import numpy as np

    rows = (
        load_table(spark, "events", SF_DIR)
        .filter(F.col("event_type") == "view")
        .select(
            ((F.floor(F.unix_timestamp("ts") / 86400) + 1) * 86400)
            .cast("long")
            .alias("w"),
            "user_id",
        )
        .collect()
    )
    per_w: dict[int, np.ndarray] = {}
    for r in rows:
        cells = per_w.setdefault(r.w, np.zeros(DEPTH * WIDTH, dtype=np.int64))
        for d in range(DEPTH):
            h = int(hashlib.md5(f"r{d}:{r.user_id}".encode()).hexdigest()[:7], 16)
            cells[d * WIDTH + h % WIDTH] += 1
    expect = {
        w: (int(c.sum()) // DEPTH, int(np.count_nonzero(c)), tuple(c.tolist()))
        for w, c in per_w.items()
    }
    assert got == expect


def test_cms_state_evicts_closed_windows(spark, tmp_path):
    """Mechanical pin of the CMS event-time eviction: a closed day
    window's cell array is REMOVED from the state store once the
    watermark passes window_end + ttl — in-flight state is (live
    windows) × (depth·width longs), never all-history."""
    import os

    import pandas as pd

    from flink_wsr_project_spark.streaming.stateful import cms_user_cells_stream

    d = str(tmp_path / "cms_evict")
    os.makedirs(d, exist_ok=True)

    def write(epochs, tag):
        pdf = pd.DataFrame(
            {
                "ts": pd.to_datetime(epochs, unit="s").astype("datetime64[us]"),
                "user_id": pd.array(range(len(epochs)), dtype="int64"),
                "event_id": pd.array(range(len(epochs)), dtype="int64"),
            }
        )
        pdf.to_parquet(f"{d}/{tag}.parquet", index=False)

    write([100, 200, 300], "b1")  # day-0 window (window_end 86400)
    stream = spark.readStream.schema(
        spark.read.parquet(d).schema
    ).option("maxFilesPerTrigger", "1").parquet(d)
    out = cms_user_cells_stream(stream, depth=2, width=8, watermark="3 seconds")
    q = out.writeStream.outputMode("append").format("memory").queryName("cms_ev").start()
    q.processAllAvailable()
    assert q.lastProgress["stateOperators"][0]["numRowsTotal"] == 1
    write([2 * 86400 + 100, 2 * 86400 + 200], "b2")
    q.processAllAvailable()
    write([2 * 86400 + 300], "b3")
    q.processAllAvailable()
    state = q.lastProgress["stateOperators"][0]
    q.stop()
    assert state["numRowsTotal"] == 1  # only the live day-2 window remains


def test_pattern_corr_stream_matches_batch(spark, events_stream_dir):
    """Streaming subsequence-correlation scorer: ranking the append-mode
    per-window emissions with the batch ordering must reproduce
    series_pattern_topk's global top-50 exactly — same integer sums,
    same IEEE normalization, same milli-floor, same tie-breakers."""
    from flink_wsr_project_spark.plans.analytics_queries import _SP_PATTERN
    from flink_wsr_project_spark.plans.registry import get
    from flink_wsr_project_spark.streaming.stateful import pattern_corr_stream

    out = pattern_corr_stream(_read_stream(spark, events_stream_dir), _SP_PATTERN)
    q = out.writeStream.outputMode("append").format("memory").queryName("pat_s").start()
    q.processAllAvailable()
    q.stop()
    got = [
        (r.user_id, r.event_id, r.window_end_ts, r.corr_milli)
        for r in spark.sql(
            """SELECT * FROM pat_s
               ORDER BY corr_milli DESC, user_id, window_end_ts, event_id
               LIMIT 50"""
        ).collect()
    ]
    want = [
        (r.user_id, r.event_id, r.window_end_ts, r.corr_milli)
        for r in get("series_pattern_topk").spark_fn(spark, SF_DIR).collect()
    ]
    assert got == want


def test_pattern_corr_stream_across_microbatches(spark, tmp_path):
    """Cross-batch carry in REAL Spark (not just the fold harness):
    events split into three time-ordered files (cut at strict second
    boundaries so no (t, event_id) tie spans a batch) and streamed one
    file per trigger must reproduce the batch top-50 exactly — the
    trailing k−1 buffer carries windows across micro-batch seams."""
    import os

    from flink_wsr_project_spark.plans.analytics_queries import _SP_PATTERN
    from flink_wsr_project_spark.plans.registry import get
    from flink_wsr_project_spark.streaming.stateful import pattern_corr_stream

    ev = load_table(spark, "events", SF_DIR).orderBy("ts", "event_id").toPandas()
    # micro-second parquet timestamps (nanos would read back as LONG
    # under the session's nanosAsLong setting)
    ev["ts"] = ev["ts"].astype("datetime64[us]")
    # cut points: indices where the floored second strictly increases
    t = ev["ts"].astype("int64") // 1_000_000
    n = len(ev)
    cuts = [i for i in (n // 3, 2 * n // 3)]
    cuts = [next(j for j in range(c, n) if t[j] > t[j - 1]) for c in cuts]
    d = str(tmp_path / "pat_batches")
    os.makedirs(d, exist_ok=True)
    bounds = [0, *cuts, n]
    for i, (a, b) in enumerate(zip(bounds, bounds[1:])):
        ev.iloc[a:b].to_parquet(f"{d}/part-{i}.parquet", index=False)
    stream = (
        spark.readStream.schema(spark.read.parquet(d).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
    )
    out = pattern_corr_stream(stream, _SP_PATTERN)
    q = out.writeStream.outputMode("append").format("memory").queryName("pat_mb").start()
    q.processAllAvailable()
    q.stop()
    got = [
        (r.user_id, r.event_id, r.window_end_ts, r.corr_milli)
        for r in spark.sql(
            """SELECT * FROM pat_mb
               ORDER BY corr_milli DESC, user_id, window_end_ts, event_id
               LIMIT 50"""
        ).collect()
    ]
    want = [
        (r.user_id, r.event_id, r.window_end_ts, r.corr_milli)
        for r in get("series_pattern_topk").spark_fn(spark, SF_DIR).collect()
    ]
    assert got == want


def test_dedup_stream_near(spark, tmp_path):
    """Streaming LSH near-dup suppression: band-bucket claims across
    two micro-batches must mark a later near-duplicate (any band
    colliding with an earlier doc's bucket) and an exact copy (all
    bands colliding) while novel docs claim fresh buckets — and the
    collision structure must agree with the batch LSH: a doc-pair
    sharing a stream band bucket iff the batch signature table gives
    them an equal band hash."""
    import os

    from flink_wsr_project_spark.operators.dedup import signature_sql
    from flink_wsr_project_spark.streaming.dedup import dedup_stream_near

    w = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
        "kilo lima mike november oscar papa quebec romeo sierra tango"
    ).split()
    a_text = " ".join(w)                       # doc 1
    b_text = " ".join(w[:19]) + " zebra"       # doc 2: near-dup of 1
    c_text = "quartz raven slate topaz umber velvet walnut xenon yucca zephyr"
    d = str(tmp_path / "near_stream")
    os.makedirs(d, exist_ok=True)

    def write(rows, tag):
        pdf = pd.DataFrame(rows, columns=["doc_id", "ts", "text"])
        pdf["ts"] = pd.to_datetime(pdf["ts"], unit="s").astype("datetime64[us]")
        pdf.to_parquet(f"{d}/{tag}.parquet", index=False)

    write([(1, 1000, a_text), (3, 1001, c_text)], "b1")
    stream = (
        spark.readStream.schema(spark.read.parquet(d).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
    )
    out = dedup_stream_near(stream, watermark="10 minutes")
    q = out.writeStream.outputMode("append").format("memory").queryName("near_s").start()
    q.processAllAvailable()
    write([(2, 1100, b_text), (4, 1200, a_text)], "b2")
    q.processAllAvailable()
    q.stop()

    rows = spark.sql("SELECT * FROM near_s").collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # batch-1 docs claim every bucket they touch
    assert all(r.is_new_bucket and r.keeper_doc_id == 1 for r in by_doc[1])
    assert all(r.is_new_bucket and r.keeper_doc_id == 3 for r in by_doc[3])
    # exact copy: every band collides with doc 1's buckets
    assert all(not r.is_new_bucket and r.keeper_doc_id == 1 for r in by_doc[4])
    # near-dup: the any-band rollup marks it a dup of doc 1 …
    dup_bands = {r.band for r in by_doc[2] if not r.is_new_bucket and r.keeper_doc_id == 1}
    assert dup_bands
    # … and the colliding-band SET equals the batch signature table's
    pdf = pd.DataFrame(
        {"doc_id": [1, 2], "text": [a_text, b_text]}
    )
    pdf.to_parquet(str(tmp_path / "documents.parquet"), index=False)
    spark.read.parquet(str(tmp_path / "documents.parquet")).createOrReplaceTempView(
        "documents"
    )
    sig = {r.doc_id: r for r in spark.sql(signature_sql("spark")).collect()}
    batch_bands = {
        b for b in range(4) if sig[1][f"band{b}"] == sig[2][f"band{b}"]
    }
    assert dup_bands == batch_bands


def test_near_dedup_state_evicts_idle_buckets(spark, tmp_path):
    """Band buckets idle past the watermark horizon are REMOVED from
    the state store — the near-dup suppressor's state is bounded by
    live buckets within the horizon, not the stream's history."""
    import os

    from flink_wsr_project_spark.streaming.dedup import dedup_stream_near

    d = str(tmp_path / "near_evict")
    os.makedirs(d, exist_ok=True)

    def write(doc_id, epoch, text, tag):
        pdf = pd.DataFrame({"doc_id": [doc_id], "ts": [epoch], "text": [text]})
        pdf["ts"] = pd.to_datetime(pdf["ts"], unit="s").astype("datetime64[us]")
        pdf.to_parquet(f"{d}/{tag}.parquet", index=False)

    write(1, 1000, "alpha bravo charlie delta echo foxtrot", "b1")
    stream = (
        spark.readStream.schema(spark.read.parquet(d).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
    )
    out = dedup_stream_near(stream, watermark="3 seconds")
    q = out.writeStream.outputMode("append").format("memory").queryName("near_ev").start()
    q.processAllAvailable()
    assert q.lastProgress["stateOperators"][0]["numRowsTotal"] == 4  # doc 1's bands
    # a far-future doc pushes the watermark past doc 1's buckets …
    write(2, 86400, "quartz raven slate topaz umber velvet", "b2")
    q.processAllAvailable()
    # … and the next trigger evicts them, leaving only doc 2's bands
    write(3, 86401, "unrelated words entirely different here now", "b3")
    q.processAllAvailable()
    state = q.lastProgress["stateOperators"][0]
    q.stop()
    assert state["numRowsTotal"] == 8  # docs 2 and 3 live, doc 1 evicted


def test_dedup_stream_near_matches_batch_form(spark, events_stream_dir, tmp_path):
    """The near-dup suppressor's batch twin (window keep-first per
    bucket) and the streaming fold must agree row-for-row when the
    stream arrives in event-time order — same keepers, same claiming
    rows, bucket-for-bucket, on a corpus with real near-dup structure
    (clone pairs at varying overlap)."""
    import os

    from flink_wsr_project_spark.streaming.dedup import dedup_stream_near

    w = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
        "kilo lima mike november oscar papa quebec romeo sierra tango "
        "amber birch cedar dunes ember frost grove haven ivory jasper"
    ).split()
    docs = []
    did = 0
    for overlap in (30, 25, 20, 15, 10):
        base = " ".join(w[:overlap])
        docs.append((did, 1000 + did, base)); did += 1
        docs.append((did, 1000 + did, base + " zzz"), ); did += 1
    pdf = pd.DataFrame(docs, columns=["doc_id", "ts", "text"])
    pdf["ts"] = pd.to_datetime(pdf["ts"], unit="s").astype("datetime64[us]")
    d = str(tmp_path / "near_mb")
    os.makedirs(d, exist_ok=True)
    # three time-ordered files → three micro-batches
    for i, (a, b) in enumerate(((0, 4), (4, 7), (7, 10))):
        pdf.iloc[a:b].to_parquet(f"{d}/part-{i}.parquet", index=False)
    batch_df = spark.read.parquet(d)
    want = {
        (r.doc_id, r.band): (r.keeper_doc_id, r.is_new_bucket)
        for r in dedup_stream_near(batch_df).collect()
    }
    stream = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
    )
    q = (
        dedup_stream_near(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("near_eq")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r.doc_id, r.band): (r.keeper_doc_id, r.is_new_bucket)
        for r in spark.sql("SELECT * FROM near_eq").collect()
    }
    assert got == want


def test_decontaminate_stream(spark, tmp_path):
    """In-stream benchmark decontamination: a streamed doc sharing any
    8-token gram with the static benchmark emits contaminated=true
    with the exact leaked-gram count once its window finalizes; clean
    and shorter-than-n docs emit clean verdicts. The broadcast
    stream-static join + windowed rollup is the whole plan — no
    stream-side join state."""
    import os

    from flink_wsr_project_spark.streaming.dedup import decontaminate_stream

    bench_text = (
        "uniform victor whiskey xray yankee zulu amber birch cedar dunes"
    )  # 10 tokens → 3 distinct 8-grams
    benchmark = spark.createDataFrame([(100, bench_text)], "doc_id long, text string")

    leak = "uniform victor whiskey xray yankee zulu amber birch ember frost"
    clean = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    short = "tiny doc"
    d = str(tmp_path / "decon_stream")
    os.makedirs(d, exist_ok=True)

    def write(rows, tag):
        pdf = pd.DataFrame(rows, columns=["doc_id", "ts", "text"])
        pdf["ts"] = pd.to_datetime(pdf["ts"], unit="s").astype("datetime64[us]")
        pdf.to_parquet(f"{d}/{tag}.parquet", index=False)

    write([(1, 1000, leak), (2, 1010, clean), (3, 1020, short)], "b1")
    stream = (
        spark.readStream.schema(spark.read.parquet(d).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
    )
    out = decontaminate_stream(stream, benchmark, watermark="3 seconds")
    q = out.writeStream.outputMode("append").format("memory").queryName("decon_s").start()
    q.processAllAvailable()
    # push the watermark far past the first window so its rows finalize
    write([(9, 90000, "pusher doc far in the future pushes watermark")], "b2")
    q.processAllAvailable()
    q.stop()
    got = {r.doc_id: (r.n_grams, r.n_leaked, r.contaminated)
           for r in spark.sql("SELECT * FROM decon_s WHERE doc_id < 9").collect()}
    # leak doc: 10 tokens → 3 grams, first gram identical to benchmark's
    assert got == {1: (3, 1, True), 2: (3, 0, False), 3: (0, 0, False)}


def test_decontaminate_batch_form_matches_stream(spark, tmp_path):
    """The same decontaminate_stream plan runs on a batch frame (no
    watermark, same windowed rollup) — verdicts must match the
    streamed run row-for-row for finalized windows."""
    import os

    from flink_wsr_project_spark.streaming.dedup import decontaminate_stream

    bench = spark.createDataFrame(
        [(100, "uniform victor whiskey xray yankee zulu amber birch cedar dunes")],
        "doc_id long, text string",
    )
    rows = [
        (1, 1000, "uniform victor whiskey xray yankee zulu amber birch ember frost"),
        (2, 1010, "alpha bravo charlie delta echo foxtrot golf hotel india juliet"),
        (3, 1020, "tiny doc"),
    ]
    d = str(tmp_path / "decon_eq")
    os.makedirs(d, exist_ok=True)
    pdf = pd.DataFrame(rows, columns=["doc_id", "ts", "text"])
    pdf["ts"] = pd.to_datetime(pdf["ts"], unit="s").astype("datetime64[us]")
    pdf.to_parquet(f"{d}/b1.parquet", index=False)
    batch = spark.read.parquet(d)
    want = {
        (r.window_end, r.doc_id): (r.n_grams, r.n_leaked, r.contaminated)
        for r in decontaminate_stream(batch, bench).collect()
    }
    stream = spark.readStream.schema(batch.schema).parquet(d)
    q = (
        decontaminate_stream(stream, bench, watermark="3 seconds")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("decon_eq")
        .start()
    )
    q.processAllAvailable()
    pd.DataFrame(
        {"doc_id": [9], "ts": pd.to_datetime([90000], unit="s").astype("datetime64[us]"),
         "text": ["pusher"]}
    ).to_parquet(f"{d}/b2.parquet", index=False)
    q.processAllAvailable()
    q.stop()
    got = {
        (r.window_end, r.doc_id): (r.n_grams, r.n_leaked, r.contaminated)
        for r in spark.sql("SELECT * FROM decon_eq WHERE doc_id < 9").collect()
    }
    want = {k: v for k, v in want.items() if k[1] < 9}
    assert got == want


def test_ann_probe_stream_matches_batch_form(spark, tmp_path):
    """Streaming ANN probe: streamed query embeddings (real sf0.001
    vectors, two micro-batches) probing the static embeddings corpus
    must produce exactly the batch form's per-query top-5 — same
    SRP-bucket candidates, same micro-cosine scores, same tie order."""
    import os

    from flink_wsr_project_spark.streaming.similarity import ann_probe_stream

    corpus = load_table(spark, "embeddings", SF_DIR)
    qpdf = corpus.limit(6).toPandas().rename(columns={"vec_id": "query_id"})
    qpdf["ts"] = pd.to_datetime([1000 + i for i in range(len(qpdf))], unit="s").astype(
        "datetime64[us]"
    )
    qpdf = qpdf[["query_id", "ts", "embedding"]]
    d = str(tmp_path / "ann_stream")
    os.makedirs(d, exist_ok=True)
    qpdf.iloc[:3].to_parquet(f"{d}/b1.parquet", index=False)
    qpdf.iloc[3:].to_parquet(f"{d}/b2.parquet", index=False)
    batch_q = spark.read.parquet(d)
    want = {
        (r.window_end, r.query_id): [(s.neighbor_id, s.score_micro) for s in r.topk]
        for r in ann_probe_stream(batch_q, corpus, k=5).collect()
    }
    stream = (
        spark.readStream.schema(batch_q.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
    )
    q = (
        ann_probe_stream(stream, corpus, k=5, watermark="3 seconds")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ann_s")
        .start()
    )
    q.processAllAvailable()
    # pusher advances the watermark so the query windows finalize
    push = qpdf.iloc[:1].copy()
    push["query_id"] = 999
    push["ts"] = pd.to_datetime([90000], unit="s").astype("datetime64[us]")
    push.to_parquet(f"{d}/b3.parquet", index=False)
    q.processAllAvailable()
    q.stop()
    got = {
        (r.window_end, r.query_id): [(s.neighbor_id, s.score_micro) for s in r.topk]
        for r in spark.sql("SELECT * FROM ann_s WHERE query_id < 999").collect()
    }
    want = {kk: v for kk, v in want.items() if kk[1] < 999}
    assert got == want and len(got) == 6
    # self-retrieval sanity: each query's own vector is its top hit
    # (999999 allowed: floor(cos·10⁶) lands one below when the IEEE
    # sqrt product rounds one ulp above the dot product)
    for (_, qid), top in got.items():
        assert top[0][0] == qid and top[0][1] in (999999, 1000000)


def test_ann_probe_empty_bucket_emits_empty_topk(spark):
    """A query hashing to a bucket with no corpus vector must still
    emit its row with an EMPTY topk — 'no neighbors found' is a
    verdict, not silence. Negating a vector flips every SRP
    projection, so corpus {v} and query {-v} land in complementary
    buckets by construction."""
    from flink_wsr_project_spark.streaming.similarity import ann_probe_stream

    v = [0.5, -1.25, 2.0, 0.75]
    corpus = spark.createDataFrame([(1, v)], "vec_id long, embedding array<float>")
    qpdf = pd.DataFrame(
        {
            "query_id": pd.array([10], dtype="int64"),
            "ts": pd.to_datetime([1000], unit="s").astype("datetime64[us]"),
            "embedding": [[-x for x in v]],
        }
    )
    queries = spark.createDataFrame(qpdf)
    rows = ann_probe_stream(queries, corpus, k=3).collect()
    assert len(rows) == 1 and rows[0].query_id == 10 and rows[0].topk == []


def test_ann_probe_zero_norm_vector_never_ranks(spark):
    """A zero-norm corpus vector in the query's bucket yields a NULL
    cosine (0/0); the NULL-scored struct used to sort FIRST in the
    ascending sort_array and displace real neighbors from the top-k.
    The all-zero vector projects to the all-zero SRP bucket-bit
    pattern... so pick a query in the same bucket as a real vector
    plus the zero vector and assert only the real one ranks. A
    zero-norm QUERY likewise emits an empty topk, not NULL rows."""
    from flink_wsr_project_spark.streaming.similarity import ann_probe_stream

    from flink_wsr_project_spark.operators.similarity import srp_bucket_expr

    # 16-dim vector chosen (searched offline) to land in SRP bucket 0 —
    # the zero vector's bucket (every projection of zero is 0, and the
    # bucket bits use a strict `> 0`), so the two MUST collide
    v = [-0.938, 1.905, 1.991, 0.191, -0.492, -1.459, 1.264, -0.704,
         0.058, -1.926, 0.586, -0.172, 0.33, -1.931, -1.224, -0.313]
    zero = [0.0] * 16
    corpus_z = spark.createDataFrame(
        [(1, v), (7, zero)], "vec_id long, embedding array<float>"
    )
    # precondition for the displacement claim: the zero vector must
    # share v's SRP bucket (otherwise this test silently degrades to
    # "guard is harmless"); assert it so a bucket-expr change that
    # separates them is caught here rather than masking the regression
    b_v, b_zero = [
        r.b
        for r in corpus_z.withColumnRenamed("embedding", "_v")
        .selectExpr("vec_id", srp_bucket_expr("_v", "spark") + " AS b")
        .orderBy("vec_id")
        .collect()
    ]
    assert b_v == b_zero, "fixture drift: pick a v sharing the zero vector's bucket"
    qpdf = pd.DataFrame(
        {
            "query_id": pd.array([10], dtype="int64"),
            "ts": pd.to_datetime([1000], unit="s").astype("datetime64[us]"),
            "embedding": [v],
        }
    )
    rows = ann_probe_stream(spark.createDataFrame(qpdf), corpus_z, k=3).collect()
    assert len(rows) == 1
    ids = [s.neighbor_id for s in rows[0].topk]
    assert 7 not in ids and 1 in ids
    assert all(s.score_micro is not None for s in rows[0].topk)
    # zero-norm QUERY: every cosine NULL → empty topk, no NULL structs
    qz = qpdf.copy()
    qz["embedding"] = [zero]
    rows = ann_probe_stream(spark.createDataFrame(qz), corpus_z, k=3).collect()
    assert len(rows) == 1 and rows[0].topk == []


def test_near_dedup_survives_subsecond_watermark(spark, tmp_path):
    """Regression: the band-claim eviction timer is millisecond-
    granular. With a sub-second watermark delay (a value _interval_ms
    and withWatermark both accept), a second-batch row for an existing
    bucket arriving within the same second used to floor its timeout
    below the current watermark and kill the query with
    IllegalArgumentException — both batches must process cleanly and
    the duplicate must still be marked."""
    import os

    from flink_wsr_project_spark.streaming.dedup import dedup_stream_near

    text = "alpha bravo charlie delta echo foxtrot golf hotel"
    d = str(tmp_path / "near_subsec")
    os.makedirs(d, exist_ok=True)

    def write(doc_id, epoch_float, tag):
        pdf = pd.DataFrame({"doc_id": [doc_id], "ts": [epoch_float], "text": [text]})
        pdf["ts"] = pd.to_datetime(pdf["ts"], unit="s").astype("datetime64[us]")
        pdf.to_parquet(f"{d}/{tag}.parquet", index=False)

    write(1, 100.100, "b1")
    stream = (
        spark.readStream.schema(spark.read.parquet(d).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
    )
    out = dedup_stream_near(stream, watermark="500 milliseconds")
    q = out.writeStream.outputMode("append").format("memory").queryName("near_ss").start()
    q.processAllAvailable()
    # watermark is now 100.100 - 0.5 = 99.6 s; this row (same second,
    # later millisecond) must arm a timeout >= the watermark, not crash
    write(2, 100.900, "b2")
    q.processAllAvailable()
    assert q.exception() is None
    q.stop()
    rows = spark.sql("SELECT * FROM near_ss WHERE doc_id = 2").collect()
    assert rows and all(not r.is_new_bucket and r.keeper_doc_id == 1 for r in rows)


def test_stratified_sample_is_stream_safe(spark, tmp_path):
    """The hash-gated sampling family's core claim is that it needs no
    RNG state — `keep iff h28(text) % 100 < rate(source)` is a pure
    map, so the SAME docs are kept whether the corpus is scanned in
    batch or streamed in arbitrary micro-batches. Pin it: the batch
    stratified_sample decisions and a streamed application of the
    identical expression agree doc-for-doc."""
    import os

    from flink_wsr_project_spark.plans.registry import get

    docs = load_table(spark, "documents", SF_DIR).limit(60).toPandas()
    d = str(tmp_path / "sample_stream")
    os.makedirs(d, exist_ok=True)
    for i, (a, b) in enumerate(((0, 20), (20, 40), (40, 60))):
        docs.iloc[a:b].to_parquet(f"{d}/part-{i}.parquet", index=False)
    batch_dir = str(tmp_path)
    docs.to_parquet(f"{batch_dir}/documents.parquet", index=False)
    want = {
        r.doc_id: r.sampled
        for r in get("stratified_sample").spark_fn(spark, batch_dir).collect()
    }
    # stream the same docs through the same keep/drop expression
    from flink_wsr_project_spark.operators.dedup import h28

    rate = "CASE source WHEN 'cc' THEN 20 WHEN 'wiki' THEN 80 WHEN 'books' THEN 60 ELSE 10 END"
    stream = (
        spark.readStream.schema(spark.read.parquet(d).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
        .selectExpr(
            "doc_id", f"CAST({h28('text', 'spark')} % 100 < {rate} AS BOOLEAN) AS sampled"
        )
    )
    q = stream.writeStream.outputMode("append").format("memory").queryName("samp_s").start()
    q.processAllAvailable()
    q.stop()
    got = {r.doc_id: r.sampled for r in spark.sql("SELECT * FROM samp_s").collect()}
    assert got == want and len(got) == 60 and any(got.values()) and not all(got.values())


def test_ann_probe_recall(spark):
    """Multi-probe (Hamming-1) must measurably beat the single-bucket
    probe on recall@10 vs exact brute force — the r6-verdict gap: the
    probe's recall was never measured, so its coverage cost was
    unknown. Ground truth is the numpy exact cosine top-10 with the
    probe's own tie rule (micro-cosine desc, id asc). All inputs and
    the SRP weights are deterministic, so the two recalls are stable
    constants: ~0.128 single-bucket, ~0.241 at radius 1 on the 500-
    vector corpus (sf0.001, 60 queries ~0.13/0.24) — asserted as
    floors with slack, plus the strict improvement that justifies the
    9x probe-side row cost."""
    import numpy as np

    from flink_wsr_project_spark.streaming.similarity import ann_probe_stream

    corpus = load_table(spark, "embeddings", SF_DIR)
    cp = corpus.toPandas()
    qpdf = cp.iloc[:60].rename(columns={"vec_id": "query_id"}).copy()
    qpdf["ts"] = pd.to_datetime([1000] * len(qpdf), unit="s").astype("datetime64[us]")
    queries = spark.createDataFrame(qpdf[["query_id", "ts", "embedding"]])

    M = np.vstack(cp["embedding"].to_numpy()).astype("float64")
    ids = cp["vec_id"].to_numpy()
    norms = np.linalg.norm(M, axis=1)
    norms[norms == 0] = np.nan
    qM = np.vstack(qpdf["embedding"].to_numpy()).astype("float64")
    qn = np.linalg.norm(qM, axis=1)
    qn[qn == 0] = np.nan
    sim = (qM @ M.T) / np.outer(qn, norms)
    k = 10
    truth = {}
    for i, qid in enumerate(qpdf["query_id"]):
        micro = np.floor(np.nan_to_num(sim[i], nan=-2.0) * 1e6).astype("int64")
        order = sorted(zip(micro, ids), key=lambda t: (-t[0], t[1]))
        truth[qid] = {v for _, v in order[:k]}

    def recall(radius, n_tables=1):
        rows = ann_probe_stream(
            queries, corpus, k=k, hamming_probe=radius, n_tables=n_tables
        ).collect()
        assert len(rows) == len(qpdf)
        return sum(
            len({s.neighbor_id for s in r.topk} & truth[r.query_id]) / k for r in rows
        ) / len(rows)

    r0, r1 = recall(0), recall(1)
    assert r1 > r0 + 0.05, f"multi-probe must beat single-bucket: {r0=} {r1=}"
    assert r0 >= 0.08 and r1 >= 0.18, f"recall floor regressed: {r0=} {r1=}"
    # r9: the second recall dial — L independent hyperplane tables.
    # sf0.01 measured radius-1 curve: 0.223 / 0.314 / 0.386 / 0.447
    # at 1/2/3/4 tables (sf0.001: smaller corpus, same ordering).
    r1t2 = recall(1, n_tables=2)
    assert r1t2 > r1 + 0.04, f"second table must lift recall: {r1=} {r1t2=}"


def test_ewma_state_evicts_idle_users_and_reseeds(spark, tmp_path):
    """Mechanical pin of the per-USER idle-state eviction (r6 verdict
    item 4, the 100 TB key-cardinality bound): a user idle past
    ``idle_ttl`` is REMOVED from the state store once the watermark
    passes their frontier + ttl (observable in numRowsTotal), and a
    post-eviction arrival re-seeds the fold — n_events restarts at 1,
    the documented revival semantics of evicting a whole-history
    fold."""
    import os

    from flink_wsr_project_spark.streaming.stateful import ewma_stream

    d = str(tmp_path / "ewma_evict")
    os.makedirs(d, exist_ok=True)

    def write(rows, tag):  # rows: (epoch_s, user_id, value)
        pdf = pd.DataFrame(
            {
                "ts": pd.to_datetime([r[0] for r in rows], unit="s").astype(
                    "datetime64[us]"
                ),
                "user_id": pd.array([r[1] for r in rows], dtype="int64"),
                "event_id": pd.array(range(len(rows)), dtype="int64"),
                "value": [float(r[2]) for r in rows],
            }
        )
        pdf.to_parquet(f"{d}/{tag}.parquet", index=False)

    write([(100, 7, 1.0)], "b1")
    stream = spark.readStream.schema(
        spark.read.parquet(d).schema
    ).option("maxFilesPerTrigger", "1").parquet(d)
    # ttl == watermark delay: the smallest configuration the build-time
    # guard admits (a ttl below the delay could evict state admissible
    # late rows still need — rejected since r9)
    out = ewma_stream(stream, idle_ttl="3 seconds")
    q = out.writeStream.outputMode("append").format("memory").queryName("ewma_ev").start()
    q.processAllAvailable()
    assert q.lastProgress["stateOperators"][0]["numRowsTotal"] == 1
    # user 8 far in the future advances the watermark past 100 + 3 s …
    write([(100000, 8, 2.0)], "b2")
    q.processAllAvailable()
    # … and the NEXT trigger (watermark updated at batch end) fires
    # user 7's timer: only users 8 and 9 remain in the store
    write([(100001, 9, 3.0)], "b3")
    q.processAllAvailable()
    assert q.lastProgress["stateOperators"][0]["numRowsTotal"] == 2
    # revival: user 7 re-seeds fresh — n_events restarts at 1
    write([(100005, 7, 5.0)], "b4")
    q.processAllAvailable()
    q.stop()
    rows = spark.sql(
        "SELECT * FROM ewma_ev WHERE user_id = 7 ORDER BY n_events"
    ).collect()
    assert [(r.n_events, r.ewma_milli) for r in rows] == [(1, 1000), (1, 5000)]


def test_dedup_incremental_stream_against_store(spark, tmp_path):
    """Stream-vs-store incremental dedup: a document stream is checked
    against the persisted corpus signature store via stream-static
    joins (no custom state; one dropDuplicatesWithinWatermark for pair
    uniqueness). A streamed clone and a near-dup of a corpus doc must
    emit a verified match attributed to that corpus doc, a band-level
    hash collision below Jaccard 0.5 must NOT pass the verify, novel
    docs emit nothing, and a pair colliding in several bands emits
    exactly once."""
    import os
    import shutil

    from flink_wsr_project_spark.operators.incremental_dedup import (
        write_signature_store,
    )
    from flink_wsr_project_spark.streaming.dedup import dedup_incremental_stream

    for t in ("incrstream_longsigs", "incrstream_hashed"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)

    w = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
        "kilo lima mike november oscar papa quebec romeo sierra tango"
    ).split()
    corpus_a = " ".join(w)  # corpus doc 100
    corpus_b = "red orange yellow green blue indigo violet crimson amber teal"
    corpus = spark.createDataFrame(
        [(100, corpus_a), (101, corpus_b)], "doc_id long, text string"
    )
    write_signature_store(spark, corpus, "incrstream", num_buckets=4)

    clone = corpus_a                                  # doc 1: exact clone of 100
    near = " ".join(w[:19]) + " zebra"                # doc 2: near-dup of 100
    novel = "quartz raven slate topaz umber velvet walnut xenon yucca zephyr"

    d = str(tmp_path / "incr_stream")
    os.makedirs(d, exist_ok=True)

    def write(rows, tag):
        pdf = pd.DataFrame(rows, columns=["doc_id", "ts", "text"])
        pdf["ts"] = pd.to_datetime(pdf["ts"], unit="s").astype("datetime64[us]")
        pdf.to_parquet(f"{d}/{tag}.parquet", index=False)

    write([(1, 1000, clone), (3, 1001, novel)], "b1")
    stream = (
        spark.readStream.schema(spark.read.parquet(d).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
    )
    out = dedup_incremental_stream(stream, spark, "incrstream", watermark="10 minutes")
    q = out.writeStream.outputMode("append").format("memory").queryName("incr_s").start()
    q.processAllAvailable()
    write([(2, 1100, near)], "b2")
    q.processAllAvailable()
    q.stop()

    rows = spark.sql("SELECT * FROM incr_s").collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)

    # the exact clone collides in all 4 bands but emits ONE verified
    # match (pair-dedup), jaccard exactly 1.0, attributed to doc 100
    assert len(by_doc[1]) == 1
    assert by_doc[1][0].corpus_dup_of == 100 and by_doc[1][0].jaccard == 1.0
    # the near-dup verifies against doc 100 (J ≈ 0.86 ≥ 0.5), once
    assert len(by_doc[2]) == 1
    assert by_doc[2][0].corpus_dup_of == 100 and 0.5 <= by_doc[2][0].jaccard < 1.0
    # the novel doc matches nothing
    assert 3 not in by_doc

    # batch mode of the same function (stream-static joins are plain
    # joins in batch) agrees with the streamed result
    batch_docs = spark.createDataFrame(
        [(1, 1000, clone), (2, 1100, near), (3, 1001, novel)],
        "doc_id long, ts long, text string",
    ).withColumn("ts", F.expr("timestamp_seconds(ts)"))
    got_batch = {
        (r.doc_id, r.corpus_dup_of)
        for r in dedup_incremental_stream(batch_docs, spark, "incrstream").collect()
    }
    assert got_batch == {(1, 100), (2, 100)}


def test_dedup_absorb_foreach_batch_grows_corpus_live(spark, tmp_path):
    """The foreachBatch absorb loop: micro-batch 2 must see micro-batch
    1's KEPT doc as corpus WITHOUT a stream restart — the capability a
    stream-static plan cannot have (it snapshots the store at query
    start). Also pins the failure contract: replaying a micro-batch
    re-emits decisions with the SAME partner (label may shift
    within-batch → corpus) and absorbs nothing (idempotent absorb)."""
    import os
    import shutil

    from flink_wsr_project_spark.operators.incremental_dedup import (
        write_signature_store,
    )
    from flink_wsr_project_spark.streaming.dedup import dedup_absorb_foreach_batch

    for t in ("fbabs_longsigs", "fbabs_hashed"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)

    A = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima mike november oscar papa"
    B = "red orange yellow green blue indigo violet crimson amber teal navy maroon olive silver gold bronze"
    write_signature_store(
        spark,
        spark.createDataFrame([(3, B)], "doc_id long, text string"),
        "fbabs",
        num_buckets=4,
        hash_partitions=8,  # the loop takes the pruned path
    )

    d = str(tmp_path / "fb_stream")
    os.makedirs(d, exist_ok=True)

    def write(rows, tag):
        pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
        pdf.to_parquet(f"{d}/{tag}.parquet", index=False)

    seen: dict[int, set] = {}

    def sink(decisions, batch_id):
        seen[batch_id] = {(r.doc_id, r.decision, r.dup_of) for r in decisions.collect()}

    write([(2, A), (5, A)], "b1")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
    )
    q = (
        stream.writeStream.foreachBatch(
            dedup_absorb_foreach_batch("fbabs", sink, num_buckets=4)
        )
        .start()
    )
    q.processAllAvailable()
    write([(11, A)], "b2")
    q.processAllAvailable()
    q.stop()

    assert seen[0] == {(2, "keep", None), (5, "dup_within_batch", 2)}
    # the live absorb is what makes this possible mid-query:
    assert seen[1] == {(11, "dup_of_corpus", 2)}

    # replay micro-batch 1 (at-least-once): same partner, absorb no-op
    hashed_before = spark.table("fbabs_hashed").count()
    body = dedup_absorb_foreach_batch("fbabs", sink, num_buckets=4)
    body(spark.createDataFrame([(2, A), (5, A)], "doc_id long, text string"), 0)
    assert spark.table("fbabs_hashed").count() == hashed_before
    # doc 2 does not match itself (self-exclusion); doc 5's partner is
    # still 2, now via the corpus
    assert seen[0] == {(2, "keep", None), (5, "dup_of_corpus", 2)}

    # the loop's BUCKETED-store arm (regular probe instead of pruned):
    # same body, direct batch-mode call
    for t in ("fbabs2_longsigs", "fbabs2_hashed"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    write_signature_store(
        spark, spark.createDataFrame([(3, B)], "doc_id long, text string"),
        "fbabs2", num_buckets=4,
    )
    seen2: dict[int, set] = {}

    def sink2(decisions, batch_id):
        seen2[batch_id] = {
            (r.doc_id, r.decision, r.dup_of) for r in decisions.collect()
        }

    body2 = dedup_absorb_foreach_batch("fbabs2", sink2, num_buckets=4)
    body2(spark.createDataFrame([(2, A), (5, A)], "doc_id long, text string"), 0)
    body2(spark.createDataFrame([(11, A)], "doc_id long, text string"), 1)
    assert seen2[0] == {(2, "keep", None), (5, "dup_within_batch", 2)}
    assert seen2[1] == {(11, "dup_of_corpus", 2)}


def test_ann_probe_foreach_batch_matches_batch_probe(spark, tmp_path):
    """The foreachBatch ANN driver: each micro-batch's top-k against
    the persisted partitioned index must equal the batch pruned probe
    on the same query vectors, per micro-batch."""
    import os
    import shutil

    from flink_wsr_project_spark.operators.ann_index import (
        ann_topk_from_index_pruned,
        write_ann_index,
    )
    from flink_wsr_project_spark.sources.readers import load_table
    from flink_wsr_project_spark.streaming.similarity import ann_probe_foreach_batch
    from tests.conftest import SF_DIR

    for t in ("fbann_centroids", "fbann_lists"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)

    emb = load_table(spark, "embeddings", SF_DIR)
    write_ann_index(spark, emb, "fbann", partition_lists=True)

    q1 = emb.where("vec_id % 50 = 0").limit(3).select("vec_id", "embedding").toPandas()
    q2 = emb.where("vec_id % 50 = 7").limit(2).select("vec_id", "embedding").toPandas()

    d = str(tmp_path / "ann_stream")
    os.makedirs(d, exist_ok=True)
    seen: dict[int, set] = {}

    def sink(results, batch_id):
        seen[batch_id] = {
            (r.query_id, r.neighbor_id, r.rank) for r in results.collect()
        }

    q1.to_parquet(f"{d}/b1.parquet", index=False)
    stream = (
        spark.readStream.schema(emb.select("vec_id", "embedding").schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
    )
    q = (
        stream.writeStream.foreachBatch(
            ann_probe_foreach_batch("fbann", sink, k=5, nprobe=2)
        )
        .start()
    )
    q.processAllAvailable()
    q2.to_parquet(f"{d}/b2.parquet", index=False)
    q.processAllAvailable()
    q.stop()

    def batch_expect(pdf):
        qdf = spark.createDataFrame(pdf).selectExpr(
            "vec_id AS query_id", "embedding AS qv"
        )
        return {
            (r.query_id, r.neighbor_id, r.rank)
            for r in ann_topk_from_index_pruned(
                spark, qdf, "fbann", k=5, nprobe=2
            ).collect()
        }

    assert seen[0] == batch_expect(q1) and len(seen[0]) > 0
    assert seen[1] == batch_expect(q2) and len(seen[1]) > 0


def test_ann_probe_foreach_batch_rejects_nprobe_on_bucketed_index(spark):
    """The bucketed probe is nprobe=1 only; asking the foreachBatch
    driver for nprobe>1 against a bucketed index must fail loudly
    instead of silently changing recall."""
    import shutil

    import pytest

    from flink_wsr_project_spark.operators.ann_index import write_ann_index
    from flink_wsr_project_spark.sources.readers import load_table
    from flink_wsr_project_spark.streaming.similarity import ann_probe_foreach_batch
    from tests.conftest import SF_DIR

    for t in ("npb_centroids", "npb_lists"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    emb = load_table(spark, "embeddings", SF_DIR)
    write_ann_index(spark, emb, "npb", num_buckets=4)

    body = ann_probe_foreach_batch("npb", lambda df, i: None, nprobe=2)
    batch = emb.limit(1).select("vec_id", "embedding")
    with pytest.raises(ValueError, match="partitioned index"):
        body(batch, 0)


def test_image_dedup_foreach_batch_grows_corpus_live(spark, tmp_path):
    """The image loop's live-growth contract, through a REAL stream
    (not a direct body call): micro-batch 2's clone must come back
    dup_of_corpus of micro-batch 1's KEPT image without a restart —
    the dHash block store's absorb happening mid-query, exactly like
    the text loop's test above. Clones share a width class (id % 4)
    by construction, since the render width is id-derived."""
    import os
    import shutil

    from flink_wsr_project_spark.operators.image_dedup import write_dhash_store
    from flink_wsr_project_spark.operators.multimodal import synthesize_image_renders
    from flink_wsr_project_spark.streaming.dedup import image_dedup_foreach_batch

    spark.sql("DROP TABLE IF EXISTS fbimg_blocks")
    shutil.rmtree("spark-warehouse/fbimg_blocks", ignore_errors=True)

    A = ("alpha bravo charlie delta echo foxtrot golf hotel india juliet"
         " kilo lima mike november oscar papa quebec romeo sierra tango")
    B = ("zero nine eight seven six five four three two one plus minus"
         " times divided equals approximately infinity sum product union")

    def render(rows, tag):
        pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source", "n_chars"])
        dd = tmp_path / f"fbimg_docs_{tag}"
        dd.mkdir(exist_ok=True)
        pdf.to_parquet(dd / "documents.parquet", index=False)
        return synthesize_image_renders(spark, str(dd))

    write_dhash_store(spark, render([(3, B, "en", "s", len(B))], "c"), "fbimg",
                      num_buckets=4)

    d = str(tmp_path / "fbimg_stream")
    os.makedirs(d, exist_ok=True)
    seen: dict[int, set] = {}

    def sink(decisions, batch_id):
        seen[batch_id] = {(r.asset_id, r.decision, r.dup_of) for r in decisions.collect()}

    # one part file per logical batch → one micro-batch per write
    render([(2, A, "en", "s", len(A)), (6, A, "en", "s", len(A))], "b1").coalesce(
        1
    ).write.mode("append").parquet(d)
    stream = (
        spark.readStream.schema("asset_id long, payload binary")
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
    )
    q = (
        stream.writeStream.foreachBatch(
            image_dedup_foreach_batch("fbimg", sink, num_buckets=4)
        )
        .start()
    )
    q.processAllAvailable()
    render([(10, A, "en", "s", len(A))], "b2").coalesce(1).write.mode(
        "append"
    ).parquet(d)
    q.processAllAvailable()
    q.stop()

    assert seen[0] == {(2, "keep", None), (6, "dup_within_batch", 2)}
    assert seen[1] == {(10, "dup_of_corpus", 2)}  # live absorb, no restart

    # replay micro-batch 1: idempotent absorb, partner-stable decisions
    blocks_before = spark.table("fbimg_blocks").count()
    body = image_dedup_foreach_batch("fbimg", sink, num_buckets=4)
    body(render([(2, A, "en", "s", len(A)), (6, A, "en", "s", len(A))], "rp"), 0)
    assert spark.table("fbimg_blocks").count() == blocks_before
    assert {(i, p) for i, _, p in seen[0]} == {(2, None), (6, 2)}
