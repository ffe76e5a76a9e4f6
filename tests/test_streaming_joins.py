"""Stream-stream join tests (J1/J2 streaming forms) — two file-sourced
streams joined with watermarks + time bounds, vs the same join run in
batch on identical data."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from flink_wsr_project_spark.streaming.joins import interval_join, reconcile_full_outer

_PAYS = [
    (1, "tx_a", "2024-01-01 00:00:10"),
    (2, "tx_b", "2024-01-01 00:00:20"),
    (3, "tx_c", "2024-01-01 00:00:30"),  # receipt too late (+9s)
    (4, "tx_d", "2024-01-01 00:00:40"),  # no receipt at all
]
_RECEIPTS = [
    ("tx_a", "wechat", "2024-01-01 00:00:12"),   # +2s → match
    ("tx_b", "alipay", "2024-01-01 00:00:18"),   # -2s → match
    ("tx_c", "wechat", "2024-01-01 00:00:39"),   # +9s → outside [-3, +5]
    ("tx_e", "alipay", "2024-01-01 00:00:50"),   # receipt-only
]


@pytest.fixture(scope="module")
def two_stream_dirs(spark, tmp_path_factory):
    d1 = str(tmp_path_factory.mktemp("pays"))
    d2 = str(tmp_path_factory.mktemp("receipts"))
    pays = spark.createDataFrame(
        pd.DataFrame(_PAYS, columns=["order_id", "tx_id", "ts_str"])
    ).withColumn("pay_ts", F.to_timestamp("ts_str")).drop("ts_str")
    receipts = spark.createDataFrame(
        pd.DataFrame(_RECEIPTS, columns=["tx_id", "pay_channel", "ts_str"])
    ).withColumn("receipt_ts", F.to_timestamp("ts_str")).drop("ts_str")
    pays.write.mode("overwrite").parquet(d1)
    receipts.write.mode("overwrite").parquet(d2)
    return d1, d2


def _stream(spark, d):
    return spark.readStream.schema(spark.read.parquet(d).schema).parquet(d)


def test_interval_join_stream(spark, two_stream_dirs):
    d1, d2 = two_stream_dirs
    pays, receipts = _stream(spark, d1), _stream(spark, d2).withColumnRenamed("tx_id", "r_tx_id")
    joined = interval_join(
        pays, receipts.withColumnRenamed("r_tx_id", "tx_id"), "tx_id",
        "pay_ts", "receipt_ts", lower_s=-3, upper_s=5,
    ).select(F.col("l.order_id"), F.col("l.tx_id"), F.col("r.pay_channel"))
    q = joined.writeStream.outputMode("append").format("memory").queryName("ij").start()
    q.processAllAvailable()
    q.stop()
    got = {(r.order_id, r.tx_id, r.pay_channel) for r in spark.sql("SELECT * FROM ij").collect()}
    assert got == {(1, "tx_a", "wechat"), (2, "tx_b", "alipay")}


def test_reconcile_full_outer_batch(spark, two_stream_dirs):
    # same operator on batch frames: NULL sides are the unmatched channels
    d1, d2 = two_stream_dirs
    pays, receipts = spark.read.parquet(d1), spark.read.parquet(d2)
    out = reconcile_full_outer(
        pays, receipts, "tx_id", "pay_ts", "receipt_ts", tolerance_s=5
    )
    rows = out.select(
        F.coalesce(F.col("l.tx_id"), F.col("r.tx_id")).alias("tx"), "status"
    ).collect()
    status = {}
    for r in rows:
        status.setdefault(r.tx, set()).add(r.status)
    assert "matched" in status["tx_a"] and "matched" in status["tx_b"]
    assert status["tx_d"] == {"unmatched_left"}       # pay with no receipt
    assert status["tx_e"] == {"unmatched_right"}      # receipt with no pay
    assert "unmatched_left" in status["tx_c"] and "unmatched_right" in status["tx_c"]


def test_reconcile_full_outer_stream_emits_unmatched(spark, tmp_path):
    """J2 streaming: the full-outer stream-stream join emits matched
    rows immediately and unmatched rows once the watermark passes their
    join window (driven here by a later watermark-pusher row)."""
    d1 = str(tmp_path / "pays_s")
    d2 = str(tmp_path / "receipts_s")

    def write(d, rows, cols, ts_col):
        (
            spark.createDataFrame(rows, cols)
            .withColumn(ts_col, F.to_timestamp("ts_str"))
            .drop("ts_str")
            .coalesce(1)
            .write.mode("append")
            .parquet(d)
        )

    write(d1, [(1, "tx_a", "2024-01-01 00:00:10"),
               (2, "tx_b", "2024-01-01 00:00:20")],  # tx_b: no receipt
          ["order_id", "tx_id", "ts_str"], "pay_ts")
    write(d2, [("tx_a", "wechat", "2024-01-01 00:00:12")],
          ["tx_id", "pay_channel", "ts_str"], "receipt_ts")

    pays = spark.readStream.schema(spark.read.parquet(d1).schema).parquet(d1)
    receipts = (
        spark.readStream.schema(spark.read.parquet(d2).schema).parquet(d2)
        .withColumnRenamed("tx_id", "r_tx_id")
        .withColumnRenamed("r_tx_id", "tx_id")
    )
    out = reconcile_full_outer(
        pays, receipts, "tx_id", "pay_ts", "receipt_ts", tolerance_s=5,
        left_watermark="2 seconds", right_watermark="2 seconds",
    ).select(
        F.coalesce(F.col("l.tx_id"), F.col("r.tx_id")).alias("tx"), "status"
    )
    q = out.writeStream.outputMode("append").format("memory").queryName("rec").start()
    q.processAllAvailable()

    # push the watermark far past tx_b's window on both sides
    write(d1, [(9, "tx_z", "2024-01-01 01:00:00")],
          ["order_id", "tx_id", "ts_str"], "pay_ts")
    write(d2, [("tx_z", "alipay", "2024-01-01 01:00:01")],
          ["tx_id", "pay_channel", "ts_str"], "receipt_ts")
    q.processAllAvailable()
    # one more empty-ish trigger lets the state store evict + emit
    write(d1, [(10, "tx_y", "2024-01-01 02:00:00")],
          ["order_id", "tx_id", "ts_str"], "pay_ts")
    q.processAllAvailable()
    q.stop()

    rows = {(r.tx, r.status) for r in spark.sql("SELECT * FROM rec").collect()}
    assert ("tx_a", "matched") in rows
    assert ("tx_b", "unmatched_left") in rows


def test_enrich_stream_matches_batch_join(spark, tmp_path):
    """Stream-static broadcast enrichment via the foreachBatch
    temporal-join pattern: the streamed result equals the batch join,
    and because the dimension is re-read per micro-batch, an updated
    dimension IS visible to the next trigger (the updatable-dim
    contract documented on ``enrich_stream``)."""
    from flink_wsr_project_spark.streaming.joins import enrich_stream

    d = str(tmp_path / "enrich_src")
    dim_dir = str(tmp_path / "dim")
    spark.createDataFrame(
        [(1, "gold"), (2, "silver")], ["user_id", "tier"]
    ).coalesce(1).write.mode("overwrite").parquet(dim_dir)

    def write(rows):
        spark.createDataFrame(rows, ["user_id", "amount"]).coalesce(1).write.mode(
            "append"
        ).parquet(d)

    write([(1, 10), (2, 20), (3, 30)])
    stream = spark.readStream.schema(spark.read.parquet(d).schema).parquet(d)

    rows: list[tuple] = []

    def sink(batch_df, epoch_id):
        enriched = enrich_stream(batch_df, spark.read.parquet(dim_dir), "user_id")
        for r in enriched.collect():
            rows.append((epoch_id, r.user_id, r.amount, r.tier))

    q = stream.writeStream.outputMode("append").foreachBatch(sink).start()
    q.processAllAvailable()

    got1 = {(u, a, t) for (_e, u, a, t) in rows}
    assert got1 == {(1, 10, "gold"), (2, 20, "silver"), (3, 30, None)}

    # dimension update: user 3 gains a tier; the per-batch re-read
    # surfaces it at the very next trigger
    spark.createDataFrame(
        [(1, "gold"), (2, "silver"), (3, "bronze")], ["user_id", "tier"]
    ).coalesce(1).write.mode("overwrite").parquet(dim_dir)
    write([(3, 31)])
    q.processAllAvailable()
    q.stop()
    assert (3, 31, "bronze") in {(u, a, t) for (_e, u, a, t) in rows}
