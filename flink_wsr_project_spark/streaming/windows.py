"""Structured Streaming windowed aggregation (SURVEY.md §2.3 + §2.7
streaming forms).

The reference assigns watermarks per stream (ascending for in-order
CSVs, bounded out-of-orderness 1-3 s — ``HotItems.scala:61``,
``LoginFail.scala:27-29``) and aggregates per event-time window.
Spark: ``withWatermark`` + the same ``window()`` groupBy used in batch
— the batch and streaming plans share expression logic by design.

``allowedLateness`` (L2, ``NetworkFlowTopNPage…scala:54``) has no
direct Spark knob: the policy (SURVEY §7.4.1) folds the lateness into
the watermark (delay = out-of-orderness + allowed lateness) and runs in
``update`` mode, which re-emits amended aggregates exactly like the
reference's late re-fires. Rows later than that combined bound are
dropped (the reference's side-output channel is reproduced in batch by
``late_data_classify`` in plans/reference_queries).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F

from flink_wsr_project_spark.operators.windows import ensure_event_time, epoch_seconds


def streaming_windowed_agg(
    stream: DataFrame,
    ts_col: str,
    duration: str,
    slide: str | None = None,
    keys: Sequence[str | Column] = (),
    aggs: Sequence[Column] = (),
    watermark: str = "3 seconds",
    allowed_lateness: str | None = None,
    window_end_alias: str = "window_end",
) -> DataFrame:
    """Watermarked tumbling/sliding aggregation over a streaming DF.

    ``allowed_lateness`` folds into the watermark delay per the L2
    policy (e.g. 1 s out-of-orderness + 60 s lateness → 61 s watermark).
    """
    if allowed_lateness:
        n1, u1 = watermark.split(" ", 1)
        n2, u2 = allowed_lateness.split(" ", 1)
        if u1.rstrip("s") == u2.rstrip("s"):
            watermark = f"{int(n1) + int(n2)} {u1}"
        else:  # mixed units: express both in seconds
            to_s = {"second": 1, "minute": 60, "hour": 3600}
            secs = int(n1) * to_s[u1.rstrip("s")] + int(n2) * to_s[u2.rstrip("s")]
            watermark = f"{secs} seconds"
    w = F.window(ts_col, duration, slide) if slide else F.window(ts_col, duration)
    out = (
        ensure_event_time(stream, ts_col).withWatermark(ts_col, watermark)
        .groupBy(w.alias("_w"), *keys)
        .agg(*aggs)
    )
    return out.withColumn(window_end_alias, epoch_seconds(F.col("_w.end"))).drop("_w")


def streaming_session_agg(
    stream: DataFrame,
    ts_col: str,
    gap: str,
    keys: Sequence[str | Column] = (),
    aggs: Sequence[Column] = (),
    watermark: str = "3 seconds",
) -> DataFrame:
    """Watermarked session-window aggregation (dynamic-gap windows the
    reference never had — Flink 1.10 session windows existed but are
    unused there; included for completeness of the window family).

    Emits ``session_start``/``session_end`` epoch-second bounds of the
    *observed* events (min/max ts), not the gap-padded window end, so
    batch runs of the same builder agree with the lag-gap formulation
    (plans/analytics_queries.user_sessions).
    """
    sw = F.session_window(ts_col, gap)
    stream = ensure_event_time(stream, ts_col)
    src = stream.withWatermark(ts_col, watermark) if stream.isStreaming else stream
    return (
        src.groupBy(sw.alias("_sw"), *keys)
        .agg(
            epoch_seconds(F.min(ts_col)).alias("session_start"),
            epoch_seconds(F.max(ts_col)).alias("session_end"),
            *aggs,
        )
        .drop("_sw")
    )
