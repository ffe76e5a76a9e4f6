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

from flink_wsr_project_spark.operators.windows import (
    arrival_ord_key,
    ensure_event_time,
    epoch_seconds,
    milli_value,
    ohlc_aggs,
    props_qty,
    vwap_aggs,
)


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


def value_ohlc_stream(
    stream: DataFrame, ts_col: str = "ts", watermark: str = "3 seconds"
) -> DataFrame:
    """Streaming twin of ``plans.analytics_queries.value_ohlc_hourly``
    (r4-verdict item 8): identical expressions — open/close via
    min_by/max_by on the zero-padded (ts, event_id) composite key,
    exact milli-unit extrema — through the watermarked hourly window.
    All five aggregates are single-pass mergeable, so the streaming
    state per bar is five scalars, never a buffer of ticks (the same
    property that makes the batch bar compaction scale)."""
    pre = ensure_event_time(stream, ts_col)
    base = pre.select(
        F.col(ts_col),
        milli_value("value").alias("v_milli"),
        arrival_ord_key(ts_col).alias("ord_key"),
    )
    return streaming_windowed_agg(
        base,
        ts_col,
        "1 hour",
        watermark=watermark,
        aggs=ohlc_aggs(),
    ).select("window_end", "open_milli", "high_milli", "low_milli", "close_milli", "n_events")


def value_vwap_stream(
    stream: DataFrame, ts_col: str = "ts", watermark: str = "3 seconds"
) -> DataFrame:
    """Streaming twin of ``plans.analytics_queries.value_vwap_hourly``
    (r4-verdict item 8): JSON-extracted quantity, exact integer
    turnover/volume sums, floored VWAP ratio — the state per window is
    two Long sums, and the qty>0 filter runs before the watermark
    aggregation so non-trades never enter state."""
    pre = ensure_event_time(stream, ts_col)
    base = pre.select(
        F.col(ts_col),
        milli_value("value").alias("p_milli"),
        props_qty().alias("qty"),
    ).filter(F.col("qty") > 0)
    return streaming_windowed_agg(
        base,
        ts_col,
        "1 hour",
        watermark=watermark,
        aggs=vwap_aggs(),
    ).select("window_end", "turnover_milli", "volume", "vwap_milli")
