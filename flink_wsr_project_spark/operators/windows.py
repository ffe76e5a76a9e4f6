"""Event-time windowed aggregation builders (SURVEY.md §2.3, A2-A13).

The reference hand-rolls every windowed count as a Flink
``AggregateFunction`` + ``WindowFunction`` pair (incremental
pre-aggregation to avoid O(window) state — rationale comments at
``/root/reference/src/main/scala/com/hong/hotItems/HotItems.scala:89-92``)
and even adds manual two-stage salting for hot keys
(``networkflow/analysis/PageView.scala:42-68``).

Spark-first: ``groupBy(window(ts, dur, slide), *keys).agg(...)``.
Catalyst's HashAggregate already does partial (map-side) + final
aggregation, so the incremental-accumulator and salting tricks are
subsumed; AQE handles residual skew at scale. ``window.end`` comes for
free where the reference needed a ``WindowFunction`` to attach it.

Scale note: the only shuffle is the single hash exchange on
(window, keys); with slide windows each input row expands to
``dur/slide`` (window, key) pairs *after* the map-side partial
aggregation, so shuffled volume is bounded by distinct keys ×
windows, not input rows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F, types as T


def pin_session_utc(spark) -> None:
    """Pin ``spark.sql.session.timeZone`` to UTC — LOUD GLOBAL EFFECT.

    This engine's data contract is UTC throughout: NTZ parquet
    wall-clocks are UTC instants, every oracle compares epoch seconds,
    and every window boundary is computed in UTC. The pin is therefore
    applied at EVERY entry point — session construction
    (``session.get_spark``), every ``load_table`` call, and every
    ``ensure_event_time`` call (streaming paths reach the latter
    without ``load_table``) — and is deliberately NOT restored: results
    are computed lazily after these functions return, so restoring the
    caller's TZ would silently corrupt every downstream instant cast.
    A caller embedding this engine in a non-UTC session must treat that
    session as UTC-configured from the first engine call on (or use a
    dedicated session). Unconditional on purpose: pinning only when an
    NTZ column happens to be seen made the effect load-order-dependent
    (an LTZ-typed read path under a non-UTC session was never pinned).
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def ensure_event_time(df: DataFrame, ts_col: str) -> DataFrame:
    """Normalize an event-time column to TimestampType (LTZ).

    Spark 4 infers parquet ``timestamp[us]`` (no timezone annotation —
    how the driver currently writes ``events.ts``) as TIMESTAMP_NTZ,
    which ``withWatermark`` rejects outright
    (``EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE``) and which raw SQL can't
    ``CAST(... AS BIGINT)``. The cast is instant-exact ONLY under a
    UTC session TZ (NTZ wall-clock values are UTC by data contract), so
    the session TZ is pinned — unconditionally, see
    ``pin_session_utc`` — before casting. With that pin the NTZ→LTZ
    cast is exact (identical wall-clock instant), so one cast here
    keeps batch SQL, DataFrame ops, and streaming watermarks on a
    single timestamp type regardless of how the source parquet was
    written. Column no-op (returns ``df`` unchanged) for any
    non-NTZ type; the TZ pin still applies.
    """
    pin_session_utc(df.sparkSession)
    for f_ in df.schema.fields:
        if f_.name == ts_col and isinstance(f_.dataType, T.TimestampNTZType):
            return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def epoch_seconds(col: Column | str) -> Column:
    """Epoch seconds (Long, floor) from TIMESTAMP or TIMESTAMP_NTZ.

    Parquet NTZ timestamps can't cast straight to numeric; routing
    through an LTZ cast is exact because the session TZ is pinned UTC.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("timestamp").cast("long")


def epoch_double(col: Column | str) -> Column:
    """Epoch seconds with fractional part (Double), TZ-safe as above."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("timestamp").cast("double")


def windowed_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str | None = None,
    keys: Sequence[str | Column] = (),
    aggs: Sequence[Column] = (),
    window_end_alias: str = "window_end",
) -> DataFrame:
    """Tumbling (``slide=None``) or sliding event-time window aggregation.

    Emits ``window_end`` as epoch-seconds Long (matching the reference's
    ``windowEnd: Long`` output fields, e.g. ``ItemViewCount`` at
    ``HotItems.scala:220``) — and keeping the oracle comparison
    timestamp-precision-free.
    """
    w = F.window(ts_col, duration, slide) if slide else F.window(ts_col, duration)
    grouped = df.groupBy(w.alias("_w"), *keys)
    out = grouped.agg(*aggs)
    return out.withColumn(window_end_alias, epoch_seconds(F.col("_w.end"))).drop("_w")


def cents(col: Column | str, scale: int = 100) -> Column:
    """Deterministic money/measure arithmetic: double → integer
    hundredths BEFORE summation.

    Summing doubles is order-dependent (and Spark partition order is
    nondeterministic), which breaks bit-exact oracle comparison and is
    generally unsound for reconciliation workloads. Converting each row
    to an integer number of cents and summing Longs is exact,
    order-independent, and overflow-safe up to ~9e16 cents (100 TB scale
    still fits for per-group sums).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * scale).cast("long")


def money_sum(col: Column | str, alias: str, scale: int = 100) -> Column:
    """Exact sum of a double measure, returned as double(2dp):
    sum(cents)/100.0."""
    return (F.sum(cents(col, scale)) / float(scale)).alias(alias)


def milli_value(col: Column | str = "value") -> Column:
    """OHLC/VWAP price units: ``floor(x*1000 + 0.5)`` as LONG — exact
    integer milli-units. Definitionally shared by the batch bars
    (``plans.analytics_queries``) and their streaming twins
    (``streaming.windows``), and mirrored literally in the DuckDB
    oracles. Deliberately the floor form, not ``round()``: HALF_UP
    rounds negative halves away from zero while ``floor(x+0.5)``
    rounds them up, and both engines must use the same convention."""
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * 1000 + F.lit(0.5)).cast("long")


# epoch-second bias making the ord-key's padded field non-negative for
# any timestamp back to ~year -1200 (see arrival_ord_key docstring)
_ORD_KEY_TS_BIAS = 100_000_000_000


def arrival_ord_key(ts_col: str = "ts", id_col: str = "event_id") -> Column:
    """Deterministic arrival-order key for first/last-in-bar
    aggregates: zero-padded (epoch-second, event_id) composite string.
    Scalar, so DuckDB's ``arg_min``/``arg_max`` (scalar keys only) and
    Spark's ``min_by``/``max_by`` order by the identical value. The
    epoch is biased by +10^11 before padding so pre-1970 (negative)
    seconds still order lexicographically == numerically (a bare lpad
    of "-29" sorts AFTER "-20"); lpad-12 then holds through roughly
    year -1200..30500 and non-negative event ids < 10^12 (ids are
    non-negative by data contract). Mirrored literally in the DuckDB
    OHLC oracle — change both together."""
    ts_s = F.col(ts_col).cast("timestamp").cast("long") + _ORD_KEY_TS_BIAS
    return F.concat(
        F.lpad(ts_s.cast("string"), 12, "0"),
        F.lpad(F.col(id_col).cast("string"), 12, "0"),
    )


def ohlc_aggs(v: str = "v_milli", ord_key: str = "ord_key") -> list[Column]:
    """The five OHLC bar aggregates (open/high/low/close/count), all
    single-pass mergeable — per-bar state is five scalars, never a
    buffer of ticks, in both the batch and streaming forms."""
    return [
        F.min_by(v, ord_key).alias("open_milli"),
        F.max(v).alias("high_milli"),
        F.min(v).alias("low_milli"),
        F.max_by(v, ord_key).alias("close_milli"),
        F.count("*").alias("n_events"),
    ]


def vwap_aggs(p: str = "p_milli", qty: str = "qty") -> list[Column]:
    """Exact-integer VWAP aggregates: Long turnover/volume sums
    (order-independent) and their floored ratio."""
    turnover = F.sum(F.col(p) * F.col(qty))
    return [
        turnover.alias("turnover_milli"),
        F.sum(qty).alias("volume"),
        F.floor(turnover * F.lit(1.0) / F.sum(qty)).cast("long").alias("vwap_milli"),
    ]


def props_qty(col: str = "props", field: str = "$.k") -> Column:
    """The VWAP quantity: the ``k`` field JSON-extracted from props."""
    return F.get_json_object(col, field).cast("long")


def sliding_count_two_stage(
    df: DataFrame,
    ts_col: str,
    dur_s: int,
    slide_s: int,
    keys: Sequence[str | Column] = (),
    count_alias: str = "cnt",
    window_end_alias: str = "window_end",
) -> DataFrame:
    """Sliding-window count via tumble-then-roll — the shuffle-minimal
    form for fine slides.

    ``window(ts, dur, slide)`` expands every RAW row into dur/slide
    window replicas before the partial aggregate, and the one exchange
    carries (key, window) groups — dur/slide× more groups than (key,
    bucket). This variant aggregates to slide-granularity buckets
    first (exchange 1 carries one row per (key, bucket) partial), then
    explodes only the AGGREGATED rows into their dur/slide windows and
    merges (exchange 2, input already globally deduped). For the
    reference's 1h/5min hot-items shape that is 12× less exchange-1
    volume at 100 TB, at the cost of one extra (cheap) exchange.

    Semantics are identical to ``windowed_agg`` (epoch-aligned windows,
    ``window_end`` as epoch-second Long); counts are mergeable so the
    two-stage split is exact.
    """
    dur_s, slide_s = int(dur_s), int(slide_s)
    if dur_s % slide_s:
        raise ValueError("duration must be a multiple of slide")
    bucket = ((epoch_seconds(ts_col) / slide_s).cast("long") * slide_s).alias("_bucket")
    s1 = df.groupBy(bucket, *keys).agg(F.count("*").alias("_partial"))
    wend = F.explode(
        F.sequence(
            F.col("_bucket") + slide_s, F.col("_bucket") + dur_s, F.lit(slide_s)
        )
    ).alias(window_end_alias)
    key_names = [c for c in s1.columns if c not in ("_bucket", "_partial")]
    # Repartition the exploded partials by window_end ALONE: hash
    # partitioning on window_end satisfies the roll-up's clustering
    # requirement on (window_end, keys) AND the downstream per-window
    # rank's partitionBy(window_end), so the whole tail runs on ONE
    # exchange instead of two (measured 1.5x on the hot-pages shape).
    # Scale-safe: a partition holds |keys| aggregated rows per window
    # and windows are numerous (dur/slide buckets over the stream's
    # span), so no single window_end concentrates raw data.
    return (
        s1.select(wend, "_partial", *key_names)
        .repartition(window_end_alias)
        .groupBy(window_end_alias, *key_names)
        .agg(F.sum("_partial").alias(count_alias))
    )


def cumulate_count(
    df: DataFrame,
    ts_col: str,
    max_s: int,
    step_s: int,
    keys: Sequence[str | Column] = (),
    count_alias: str = "cnt",
) -> DataFrame:
    """Flink's CUMULATE window TVF (early-firing partial results of a
    tumbling window) as a batch operator: windows share a start aligned
    to ``max_s`` and their ends grow by ``step_s`` —
    ``[H, H+step), [H, H+2·step), …, [H, H+max)`` — so each row lands
    in every cumulate window that closes at or after it within its
    tumble span.

    Same two-stage physics as :func:`sliding_count_two_stage`: tumble
    to step-granularity buckets first (exchange 1 carries one partial
    per (key, bucket)), then explode only AGGREGATED rows into the
    remaining window ends of their span and merge. Expansion factor is
    (max/step − position), ≤ max/step, applied after the partial
    aggregate — never to raw rows.

    Emits ``window_start``/``window_end`` epoch-second Longs.
    """
    max_s, step_s = int(max_s), int(step_s)
    if max_s % step_s:
        raise ValueError("max size must be a multiple of step")
    start = ((epoch_seconds(ts_col) / max_s).cast("long") * max_s).alias("window_start")
    bucket = ((epoch_seconds(ts_col) / step_s).cast("long") * step_s).alias("_bucket")
    s1 = df.groupBy(start, bucket, *keys).agg(F.count("*").alias("_partial"))
    wend = F.explode(
        F.sequence(
            F.col("_bucket") + step_s,
            F.col("window_start") + max_s,
            F.lit(step_s),
        )
    ).alias("window_end")
    key_names = [c for c in s1.columns if c not in ("window_start", "_bucket", "_partial")]
    return (
        s1.select("window_start", wend, "_partial", *key_names)
        .repartition("window_end")
        .groupBy("window_start", "window_end", *key_names)
        .agg(F.sum("_partial").alias(count_alias))
    )
