"""Pattern API tests (operators/cep.py) — strict and relaxed
contiguity, within-bounds, multi-step chains, on planted scenarios."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_wsr_project_spark.operators.cep import Pattern, match_pattern
from flink_wsr_project_spark.sources.readers import epoch_to_ts


def _df(spark, rows):
    return spark.createDataFrame(rows, ["user_id", "event_type", "t"]).withColumn(
        "ts", epoch_to_ts("t")
    )


def test_strict_two_step_all_matches(spark):
    rows = [
        (1, "fail", 100), (1, "fail", 101), (1, "fail", 102),   # two adjacent pairs
        (2, "fail", 100), (2, "success", 101), (2, "fail", 102),  # interleaved → none
        (3, "fail", 100), (3, "fail", 103),                     # gap 3 > within 2
    ]
    p = (
        Pattern.begin("first", F.col("event_type") == "fail")
        .next("second", F.col("event_type") == "fail")
        .within(2)
    )
    out = match_pattern(_df(spark, rows), ["user_id"], "ts", p)
    got = {(r.user_id, r.first_ts, r.second_ts) for r in out.collect()}
    assert got == {(1, 100, 101), (1, 101, 102)}  # every adjacent run, like FlinkCEP


def test_strict_three_step_chain(spark):
    rows = [
        (1, "a", 10), (1, "b", 11), (1, "c", 12),   # full chain
        (2, "a", 10), (2, "x", 11), (2, "b", 12), (2, "c", 13),  # broken adjacency
    ]
    p = (
        Pattern.begin("s1", F.col("event_type") == "a")
        .next("s2", F.col("event_type") == "b")
        .next("s3", F.col("event_type") == "c")
        .within(5)
    )
    out = match_pattern(_df(spark, rows), ["user_id"], "ts", p)
    got = {(r.user_id, r.s1_ts, r.s2_ts, r.s3_ts) for r in out.collect()}
    assert got == {(1, 10, 11, 12)}


def test_relaxed_followed_by_with_timeout(spark):
    rows = [
        (1, "create", 100), (1, "noise", 150), (1, "pay", 200),   # within 900
        (2, "create", 100), (2, "pay", 2000),                     # beyond 900
        (3, "pay", 100),                                          # no create
        (4, "create", 100), (4, "pay", 90),                       # pay BEFORE create
    ]
    p = (
        Pattern.begin("create", F.col("event_type") == "create")
        .followedBy("pay", F.col("event_type") == "pay")
        .within(900)
    )
    out = match_pattern(_df(spark, rows), ["user_id"], "ts", p)
    got = {(r.user_id, r.create_ts, r.pay_ts) for r in out.collect()}
    assert got == {(1, 100, 200)}


def test_relaxed_binds_earliest(spark):
    rows = [
        (1, "view", 10), (1, "click", 20), (1, "click", 30), (1, "buy", 40),
    ]
    p = (
        Pattern.begin("view", F.col("event_type") == "view")
        .followedBy("click", F.col("event_type") == "click")
        .followedBy("buy", F.col("event_type") == "buy")
    )
    out = match_pattern(_df(spark, rows), ["user_id"], "ts", p).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.view_ts, r.click_ts, r.buy_ts) == (10, 20, 40)  # earliest click binds


def test_pattern_must_begin(spark):
    with pytest.raises(ValueError):
        match_pattern(_df(spark, [(1, "a", 1)]), ["user_id"], "ts", Pattern())


def test_stream_pattern_adjacency_across_batches(spark, tmp_path):
    """A strict pair split across micro-batches still matches — the
    trailing-row state carries adjacency over the trigger boundary."""
    from flink_wsr_project_spark.operators.cep import match_pattern_stream

    d = str(tmp_path / "cep_stream")

    def write(rows):
        (
            _df(spark, rows)
            .coalesce(1)
            .write.mode("append")
            .parquet(d)
        )

    write([(1, "fail", 100)])
    stream = spark.readStream.schema(spark.read.parquet(d).schema).parquet(d)
    p = (
        Pattern.begin("first", F.col("event_type") == "fail")
        .next("second", F.col("event_type") == "fail")
        .within(2)
    )
    out = match_pattern_stream(stream, ["user_id"], "ts", p)
    q = out.writeStream.outputMode("append").format("memory").queryName("cep_s").start()
    q.processAllAvailable()
    assert spark.sql("SELECT * FROM cep_s").count() == 0

    write([(1, "fail", 101), (1, "success", 102), (1, "fail", 103)])
    q.processAllAvailable()
    q.stop()
    got = {
        (r.user_id, r.first_ts, r.second_ts)
        for r in spark.sql("SELECT * FROM cep_s").collect()
    }
    # keys keep their input type (long), not a stringified copy
    assert got == {(1, 100, 101)}  # cross-batch pair; 102/103 broken by success


def test_stream_pattern_matches_batch(spark, tmp_path):
    from flink_wsr_project_spark.operators.cep import match_pattern_stream

    rows = [
        (1, "fail", 100), (1, "fail", 101), (1, "fail", 102),
        (2, "fail", 100), (2, "success", 101), (2, "fail", 102),
    ]
    d = str(tmp_path / "cep_stream_b")
    _df(spark, rows).write.parquet(d)
    stream = spark.readStream.schema(spark.read.parquet(d).schema).parquet(d)
    p = (
        Pattern.begin("first", F.col("event_type") == "fail")
        .next("second", F.col("event_type") == "fail")
        .within(2)
    )
    out = match_pattern_stream(stream, ["user_id"], "ts", p)
    q = out.writeStream.outputMode("append").format("memory").queryName("cep_b").start()
    q.processAllAvailable()
    q.stop()
    got = {
        (r.user_id, r.first_ts, r.second_ts)
        for r in spark.sql("SELECT * FROM cep_b").collect()
    }
    batch = match_pattern(_df(spark, rows), ["user_id"], "ts", p)
    want = {(r.user_id, r.first_ts, r.second_ts) for r in batch.collect()}
    assert got == want == {(1, 100, 101), (1, 101, 102)}
    # schema parity with the batch operator: key column type preserved
    assert dict(spark.sql("SELECT * FROM cep_b").dtypes)["user_id"] == dict(batch.dtypes)["user_id"]


def test_stream_pattern_matches_batch_out_of_order(spark, tmp_path):
    """LoginFail_CEP.scala:31-46 semantics under disorder: rows arrive
    out of event-time order inside a micro-batch; the streaming matcher
    (batch-wide event-time sort + vectorized rolling match) must agree
    with the batch operator exactly."""
    from flink_wsr_project_spark.operators.cep import match_pattern_stream

    rows = [
        (1, "fail", 102), (1, "fail", 100), (1, "fail", 101),  # shuffled adjacent run
        (2, "fail", 102), (2, "success", 101), (2, "fail", 100),
        (3, "fail", 105), (3, "fail", 100),                    # gap 5 > within 2
    ]
    d = str(tmp_path / "cep_ooo")
    _df(spark, rows).coalesce(1).write.parquet(d)
    stream = spark.readStream.schema(spark.read.parquet(d).schema).parquet(d)
    p = (
        Pattern.begin("first", F.col("event_type") == "fail")
        .next("second", F.col("event_type") == "fail")
        .within(2)
    )
    out = match_pattern_stream(stream, ["user_id"], "ts", p)
    q = out.writeStream.outputMode("append").format("memory").queryName("cep_ooo").start()
    q.processAllAvailable()
    q.stop()
    got = {
        (r.user_id, r.first_ts, r.second_ts)
        for r in spark.sql("SELECT * FROM cep_ooo").collect()
    }
    batch = match_pattern(_df(spark, rows), ["user_id"], "ts", p)
    want = {(r.user_id, r.first_ts, r.second_ts) for r in batch.collect()}
    assert got == want == {(1, 100, 101), (1, 101, 102)}
