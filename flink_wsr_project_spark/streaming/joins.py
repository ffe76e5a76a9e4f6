"""Stream-stream joins (SURVEY.md §2.5 streaming forms).

J1 — interval join. Reference:
``orderpay_detect/OrderPayTxMatch_2Flow_Join.scala:46-66`` —
``orders.keyBy(txId).intervalJoin(receipts).between(-3s, +5s)``. Spark:
inner stream-stream join on the equi-key plus a time-range condition;
watermarks on both sides bound the join state exactly like Flink's
interval-relative buffers.

J2 — full-outer match with unmatched side channels. Reference:
``OrderPayTxMatch_2Flow_Co.scala:48-124`` (CoProcessFunction, per-side
ValueState + timeout timers → 'unmatched-pays'/'unmatched-receipts'
side outputs). Spark: full-outer stream-stream join with watermark +
time constraint; rows whose other side stays NULL after the watermark
passes ARE the unmatched channels — split with filters (or route via
``sinks.side_output_sink``).

State scale: join state is bounded by (watermark delay + interval
width) × arrival rate per side — O(1) per key over time, matching the
reference's explicit per-side cleanup timers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from flink_wsr_project_spark.operators.windows import ensure_event_time


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lower_s: int,
    upper_s: int,
    left_watermark: str = "3 seconds",
    right_watermark: str = "5 seconds",
) -> DataFrame:
    """Inner join where ``right_ts ∈ [left_ts + lower_s, left_ts + upper_s]``.

    Works identically on batch DataFrames (watermarks become no-ops).
    The reference's between(-3 s, +5 s) maps to lower_s=-3, upper_s=5
    *relative to the left (order) side's view of the receipt*.
    """
    left, right = ensure_event_time(left, left_ts), ensure_event_time(right, right_ts)
    lw = left.withWatermark(left_ts, left_watermark) if left.isStreaming else left
    rw = right.withWatermark(right_ts, right_watermark) if right.isStreaming else right
    l_, r_ = lw.alias("l"), rw.alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {lower_s} SECONDS"))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {upper_s} SECONDS"))
    )
    return l_.join(r_, cond, "inner")


def reconcile_full_outer(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    tolerance_s: int,
    left_watermark: str = "3 seconds",
    right_watermark: str = "5 seconds",
    status_col: str = "status",
) -> DataFrame:
    """Full-outer keyed match within ± tolerance; NULL sides labeled as
    the reference's unmatched side outputs."""
    left, right = ensure_event_time(left, left_ts), ensure_event_time(right, right_ts)
    lw = left.withWatermark(left_ts, left_watermark) if left.isStreaming else left
    rw = right.withWatermark(right_ts, right_watermark) if right.isStreaming else right
    l_, r_ = lw.alias("l"), rw.alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}") - F.expr(f"INTERVAL {tolerance_s} SECONDS"))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {tolerance_s} SECONDS"))
    )
    joined = l_.join(r_, cond, "full_outer")
    status = (
        F.when(F.col(f"l.{key}").isNull(), F.lit("unmatched_right"))
        .when(F.col(f"r.{key}").isNull(), F.lit("unmatched_left"))
        .otherwise(F.lit("matched"))
    )
    return joined.withColumn(status_col, status)


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    how: str = "left",
) -> DataFrame:
    """Stream-static dimension enrichment — the most common streaming
    join in practice (Flink's lookup/temporal-table join against a
    bounded side; the reference joins every click stream to static
    channel/province attributes it carries inline).

    The static side is BROADCAST: each micro-batch probes an
    executor-local hash map, no shuffle of the stream, no join state at
    all (unlike stream-stream joins there is nothing to buffer). A
    plan-embedded static side is FROZEN at query start (its file
    listing lives in the running query's analyzed plan — even
    ``refreshByPath`` cannot reach it, and rewriting the files fails
    the query on the stale listing). For a dimension that UPDATES
    mid-stream, call this inside ``foreachBatch`` on a freshly-read
    dim — the Flink temporal-join pattern — as pinned by
    tests/test_streaming_joins.py. At 100 TB stream volume this is the
    only join shape whose cost is independent of stream history.
    """
    return stream.join(F.broadcast(dim), on, how)
