"""Analytics breadth queries: sessionization, as-of attribution,
running windows, pivot — standard large-scale event-analytics shapes
built from the same operator kit (SURVEY.md §7.3 M7 breadth; all
oracle-checked).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from flink_wsr_project_spark.operators.windows import (
    _ORD_KEY_TS_BIAS,
    arrival_ord_key,
    epoch_seconds,
    milli_value,
    ohlc_aggs,
    props_qty,
    vwap_aggs,
)
from flink_wsr_project_spark.plans.registry import register
from flink_wsr_project_spark.sources.readers import load_table

# ---------------------------------------------------------------------------
# Sessionization: gap > 30 min starts a new session
# ---------------------------------------------------------------------------

_SESSIONS_ORACLE = """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER w) >= 1800 THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
numbered AS (
  SELECT user_id, ts, event_id,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start,
       CAST(floor(epoch(max(ts))) AS BIGINT) AS session_end,
       count(*) AS n_events
FROM numbered GROUP BY user_id, session_id
"""


@register("user_sessions", oracle=_SESSIONS_ORACLE, tags=("session",))
def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via lag-gap + running sum (the batch form of
    streaming ``session_window``): one shuffle on user_id, reused by
    both window functions and the final aggregate.

    Boundary semantics: a gap of EXACTLY the 1800 s threshold starts a
    new session (``>=``), matching Spark's half-open
    ``session_window`` interval [start, last_ts + gap) — so this form,
    ``user_sessions_swf``, and the shared oracle agree on
    second-granularity boundary gaps."""
    events = load_table(spark, "events", sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = events.withColumn(
        "new_sess",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.col("ts").cast("timestamp").cast("double")
               - F.lag("ts").over(w).cast("timestamp").cast("double") >= 1800),
            1,
        ).otherwise(0),
    )
    numbered = flagged.withColumn(
        "session_id", F.sum("new_sess").over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
    )
    return numbered.groupBy("user_id", "session_id").agg(
        epoch_seconds(F.min("ts")).alias("session_start"),
        epoch_seconds(F.max("ts")).alias("session_end"),
        F.count("*").alias("n_events"),
    )


# ---------------------------------------------------------------------------
# As-of attribution: most recent prior view for each purchase
# ---------------------------------------------------------------------------

_ASOF_ORACLE = """
WITH vp AS (
  SELECT event_id, user_id, event_type, ts,
         last_value(CASE WHEN event_type = 'view' THEN ts END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_view_ts
  FROM events WHERE event_type IN ('view', 'purchase')
)
SELECT event_id AS purchase_event_id, user_id,
       CAST(floor(epoch(ts)) AS BIGINT) AS purchase_ts,
       CAST(floor(epoch(last_view_ts)) AS BIGINT) AS last_view_ts
FROM vp WHERE event_type = 'purchase'
"""


@register("purchase_attribution_asof", oracle=_ASOF_ORACLE, tags=("asof", "J1"))
def purchase_attribution_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join expressed as a carry-forward window (Spark lacks a
    native ASOF): union the two event kinds, sort once per user, take
    ``last(view_ts) IGNORE NULLS`` strictly before each purchase.
    Equivalent to DuckDB's ASOF JOIN but with a single shuffle and no
    per-row probe."""
    events = load_table(spark, "events", sf_dir).filter(
        F.col("event_type").isin("view", "purchase")
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    vp = events.withColumn(
        "last_view_ts",
        F.last(F.when(F.col("event_type") == "view", F.col("ts")), ignorenulls=True).over(w),
    )
    return vp.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_event_id"),
        "user_id",
        epoch_seconds("ts").alias("purchase_ts"),
        epoch_seconds("last_view_ts").alias("last_view_ts"),
    )


# ---------------------------------------------------------------------------
# Running / moving aggregates
# ---------------------------------------------------------------------------

_RUNNING_ORACLE = """
SELECT event_id, user_id,
       sum(CAST(round(value * 100) AS BIGINT))
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0 AS running_value,
       sum(CAST(round(value * 100) AS BIGINT))
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
       / count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) / 100.0 AS moving_avg_7
FROM events
"""


@register("user_running_value", oracle=_RUNNING_ORACLE, tags=("window-fn",))
def user_running_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running cumulative sum + 7-row moving average per user (integer
    cents → exact), one shuffle shared by all three frames."""
    events = load_table(spark, "events", sf_dir)
    cents = F.round(F.col("value") * 100).cast("long")
    base = W.partitionBy("user_id").orderBy("ts", "event_id")
    run = base.rowsBetween(W.unboundedPreceding, W.currentRow)
    mov = base.rowsBetween(-6, W.currentRow)
    return events.select(
        "event_id",
        "user_id",
        (F.sum(cents).over(run) / 100.0).alias("running_value"),
        (F.sum(cents).over(mov) / F.count("*").over(mov) / 100.0).alias("moving_avg_7"),
    )


# ---------------------------------------------------------------------------
# Pivot
# ---------------------------------------------------------------------------

_PIVOT_ORACLE = """
SELECT user_id,
       count(*) FILTER (event_type = 'view') AS n_view,
       count(*) FILTER (event_type = 'click') AS n_click,
       count(*) FILTER (event_type = 'purchase') AS n_purchase,
       count(*) FILTER (event_type = 'signup') AS n_signup,
       count(*) FILTER (event_type = 'error') AS n_error
FROM events GROUP BY user_id
"""

_EVENT_TYPES = ("view", "click", "purchase", "signup", "error")


@register("event_type_pivot", oracle=_PIVOT_ORACLE, tags=("pivot",))
def event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user counts pivoted by event_type (explicit value list so the
    plan needs no distinct-scan pre-pass — required at scale)."""
    events = load_table(spark, "events", sf_dir)
    out = (
        events.groupBy("user_id")
        .pivot("event_type", list(_EVENT_TYPES))
        .agg(F.count(F.lit(1)))
    )
    return out.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in _EVENT_TYPES],
    )


# ---------------------------------------------------------------------------
# Exact percentiles (interpolated — identical linear formula both engines)
# ---------------------------------------------------------------------------

_PERCENTILES_ORACLE = """
WITH c AS (
  SELECT event_type, CAST(round(CAST(value AS DOUBLE) * 100) AS BIGINT) AS cents FROM events
)
SELECT event_type,
       quantile_cont(cents, 0.25) / 100.0 AS p25,
       quantile_cont(cents, 0.50) / 100.0 AS p50,
       quantile_cont(cents, 0.75) / 100.0 AS p75,
       quantile_cont(cents, 0.95) / 100.0 AS p95,
       count(*) AS n
FROM c GROUP BY event_type
"""


@register("value_percentiles", oracle=_PERCENTILES_ORACLE, tags=("percentile",))
def value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles of value per event_type, on
    integer cents so both engines interpolate between the same exact
    ranks. (At 100 TB the same query swaps percentile →
    approx_percentile, trading exactness for a mergeable sketch.)"""
    events = load_table(spark, "events", sf_dir)
    c = events.select(
        "event_type", F.round(F.col("value").cast("double") * 100).cast("long").alias("cents")
    )
    return c.groupBy("event_type").agg(
        (F.expr("percentile(cents, 0.25)") / 100.0).alias("p25"),
        (F.expr("percentile(cents, 0.50)") / 100.0).alias("p50"),
        (F.expr("percentile(cents, 0.75)") / 100.0).alias("p75"),
        (F.expr("percentile(cents, 0.95)") / 100.0).alias("p95"),
        F.count("*").alias("n"),
    )


# ---------------------------------------------------------------------------
# Semi-structured: JSON property extraction
# ---------------------------------------------------------------------------

_JSON_ORACLE = """
SELECT event_type,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
       count(*) AS n
FROM events GROUP BY event_type
"""


@register("json_props_stats", oracle=_JSON_ORACLE, tags=("json",))
def json_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: pull a typed field out of the JSON
    props column and aggregate. get_json_object is JVM-side (Jackson);
    at scale prefer from_json with an explicit schema once the shape is
    known — same plan, vectorizable, and the scan still prunes to the
    single props column."""
    events = load_table(spark, "events", sf_dir)
    k = F.get_json_object("props", "$.k").cast("long")
    return events.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"), F.max(k).alias("max_k"), F.count("*").alias("n")
    )


@register("json_props_stats_variant", oracle=_JSON_ORACLE, tags=("json", "variant"))
def json_props_stats_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same extraction through Spark 4's VARIANT type:
    ``parse_json`` shreds the string once into the binary variant
    encoding and ``variant_get`` does a typed path read — the engine's
    preferred semi-structured path when fields are accessed repeatedly
    (one parse, many typed reads; columnar-friendly). Shares
    ``json_props_stats``'s oracle, proving the two formulations agree
    (same twin pattern as user_sessions / user_sessions_swf)."""
    events = load_table(spark, "events", sf_dir)
    k = F.expr("variant_get(parse_json(props), '$.k', 'bigint')")
    return events.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"), F.max(k).alias("max_k"), F.count("*").alias("n")
    )


# ---------------------------------------------------------------------------
# Sessionization via built-in session_window (same oracle as user_sessions)
# ---------------------------------------------------------------------------


@register("user_sessions_swf", oracle=_SESSIONS_ORACLE, tags=("session",))
def user_sessions_swf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same 30-min-gap sessionization through Spark's native
    ``session_window`` (the operator the streaming layer uses), proving
    the two formulations agree. Per-user session ordinals come from one
    extra rank over the already-aggregated (tiny) session rows."""
    events = load_table(spark, "events", sf_dir)
    sessions = events.groupBy(
        F.session_window("ts", "30 minutes").alias("sw"), "user_id"
    ).agg(
        epoch_seconds(F.min("ts")).alias("session_start"),
        epoch_seconds(F.max("ts")).alias("session_end"),
        F.count("*").alias("n_events"),
    )
    w = W.partitionBy("user_id").orderBy("session_start")
    return sessions.select(
        "user_id",
        F.row_number().over(w).cast("long").alias("session_id"),
        "session_start",
        "session_end",
        "n_events",
    )


# ---------------------------------------------------------------------------
# Time-range window frames (RANGE BETWEEN n PRECEDING)
# ---------------------------------------------------------------------------

_RANGE_FRAME_ORACLE = """
WITH e AS (
  SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
)
SELECT event_id, user_id,
       sum(cents) OVER (PARTITION BY user_id ORDER BY ts_s
                        RANGE BETWEEN 600 PRECEDING AND CURRENT ROW) / 100.0
         AS value_10m,
       count(*) OVER (PARTITION BY user_id ORDER BY ts_s
                      RANGE BETWEEN 600 PRECEDING AND CURRENT ROW) AS n_10m
FROM e
"""


@register("user_trailing_10m", oracle=_RANGE_FRAME_ORACLE, tags=("window-fn", "range-frame"))
def user_trailing_10m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-10-minute per-user totals via a RANGE (time-value)
    frame — the window-function form of a sliding window that emits one
    row per event instead of one per (window, key). Same single shuffle
    on user_id; the frame bound is resolved by the sort, no expansion."""
    events = load_table(spark, "events", sf_dir)
    e = events.select(
        "event_id",
        "user_id",
        epoch_seconds("ts").alias("ts_s"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    w = W.partitionBy("user_id").orderBy("ts_s").rangeBetween(-600, W.currentRow)
    return e.select(
        "event_id",
        "user_id",
        (F.sum("cents").over(w) / 100.0).alias("value_10m"),
        F.count("*").over(w).alias("n_10m"),
    )


# ---------------------------------------------------------------------------
# Exact second moments (variance/stddev via integer sums)
# ---------------------------------------------------------------------------

_VARIANCE_ORACLE = """
WITH c AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents FROM events
),
m AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(cents) AS BIGINT) AS s1,
         CAST(sum(cents * cents) AS BIGINT) AS s2
  FROM c GROUP BY event_type
)
SELECT event_type, n,
       (n * s2 - s1 * s1) / (n * n * 10000.0) AS var_value,
       sqrt((n * s2 - s1 * s1) / (n * n * 10000.0)) AS std_value
FROM m
"""


@register("value_variance", oracle=_VARIANCE_ORACLE, tags=("moments",))
def value_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact population variance/stddev per event_type: both moments
    accumulate as integers (order-independent under any partitioning),
    with a single double division at the end — the same mergeable
    (n, Σx, Σx²) shape a distributed sketch would ship between
    executors."""
    events = load_table(spark, "events", sf_dir)
    cents = F.round(F.col("value") * 100).cast("long")
    m = events.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(cents).alias("s1"),
        F.sum(cents * cents).alias("s2"),
    )
    var = (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")) / (
        F.col("n") * F.col("n") * 10000.0
    )
    return m.select(
        "event_type", "n", var.alias("var_value"), F.sqrt(var).alias("std_value")
    )


# ---------------------------------------------------------------------------
# Dense time series: gap-filled hourly counts
# ---------------------------------------------------------------------------

_DENSE_ORACLE = """
WITH counts AS (
  SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600 + 3600 AS window_end,
         count(*) AS cnt
  FROM events WHERE event_type = 'view' GROUP BY 1
),
bounds AS (SELECT min(window_end) AS lo, max(window_end) AS hi FROM counts),
hours AS (SELECT unnest(generate_series(lo, hi, 3600)) AS window_end FROM bounds)
SELECT h.window_end, coalesce(c.cnt, 0) AS cnt
FROM hours h LEFT JOIN counts c ON c.window_end = h.window_end
"""


@register("pv_hourly_dense", oracle=_DENSE_ORACLE, tags=("timeseries",))
def pv_hourly_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly PV: empty hours appear as zero rows. The hour
    spine is generated from a 1-row bounds aggregate (sequence +
    explode — no driver loop), broadcast-joined back to the counts;
    at 100 TB the spine is |hours|, trivially small."""
    events = load_table(spark, "events", sf_dir)
    counts = (
        events.filter(F.col("event_type") == "view")
        .groupBy(
            ((epoch_seconds("ts") / 3600).cast("long") * 3600 + 3600).alias("window_end")
        )
        .agg(F.count("*").alias("cnt"))
    )
    bounds = counts.agg(
        F.min("window_end").alias("lo"), F.max("window_end").alias("hi")
    )
    hours = bounds.select(
        F.explode(F.sequence("lo", "hi", F.lit(3600))).alias("window_end")
    )
    return hours.join(counts, "window_end", "left").select(
        "window_end", F.coalesce("cnt", F.lit(0)).alias("cnt")
    )


# ---------------------------------------------------------------------------
# CUMULATE window (Flink window-TVF parity: early-firing tumble partials)
# ---------------------------------------------------------------------------

_CUMULATE_ORACLE = """
WITH e AS (
  SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600 AS window_start,
         (CAST(floor(epoch(ts)) AS BIGINT) // 900) * 900 AS bucket
  FROM events WHERE event_type = 'view'
),
x AS (
  SELECT window_start,
         unnest(generate_series(bucket + 900, window_start + 3600, 900)) AS window_end
  FROM e
)
SELECT window_start, window_end, count(*) AS cnt
FROM x GROUP BY 1, 2
"""


@register("pv_hourly_cumulate", oracle=_CUMULATE_ORACLE, tags=("cumulate", "A2"))
def pv_hourly_cumulate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flink's CUMULATE window TVF (hourly tumble with 15-min
    early-firing partials) — ``operators.windows.cumulate_count``.
    Two-stage physics: tumble to 15-min buckets first, explode only
    the AGGREGATED partials into the remaining window ends of their
    hour, merge. Exchange 1 carries one row per bucket; expansion
    (≤ max/step = 4×) applies only to aggregated rows — the same
    discipline as the sliding-window headline plans."""
    from flink_wsr_project_spark.operators.windows import cumulate_count

    events = load_table(spark, "events", sf_dir)
    return cumulate_count(
        events.filter(F.col("event_type") == "view"), "ts", max_s=3600, step_s=900
    )


# ---------------------------------------------------------------------------
# SCD2 dimension build (warehouse-style change capture from an event log)
# ---------------------------------------------------------------------------

_SCD2_SENTINEL = 253402300800  # 9999-12-31T00:00:00Z: open-ended validity

_SCD2_ORACLE = f"""
WITH ordered AS (
  SELECT user_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS ts_s, event_id,
         lag(event_type) OVER w AS prev_type
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
changes AS (
  SELECT user_id, event_type AS segment, ts_s AS valid_from, event_id
  FROM ordered WHERE prev_type IS NULL OR prev_type <> event_type
)
SELECT user_id, segment, valid_from,
       coalesce(lead(valid_from) OVER w2, {_SCD2_SENTINEL}) AS valid_to,
       CAST(lead(valid_from) OVER w2 IS NULL AS BOOLEAN) AS is_current
FROM changes
WINDOW w2 AS (PARTITION BY user_id ORDER BY valid_from, event_id)
"""


_PIT_ORACLE = f"""
WITH scd AS ({_SCD2_ORACLE})
SELECT e.event_id, e.user_id,
       CAST(floor(epoch(e.ts)) AS BIGINT) AS ts_s,
       s.segment AS segment_at_event
FROM events e
JOIN scd s
  ON e.user_id = s.user_id
 AND s.valid_from <= CAST(floor(epoch(e.ts)) AS BIGINT)
 AND CAST(floor(epoch(e.ts)) AS BIGINT) < s.valid_to
"""


@register("events_segment_pit", oracle=_PIT_ORACLE, tags=("scd2", "asof", "J1"))
def events_segment_pit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time enrichment against the SCD2 dimension built by
    ``user_segment_scd2``: each event joins the ONE segment version
    whose half-open validity interval [valid_from, valid_to) contains
    its timestamp — the temporal-join correctness contract that makes
    training-data snapshots reproducible (no leakage from future
    versions). Equi-join on user_id with a residual range predicate;
    per-user version counts are small, so the range filter runs inside
    co-partitioned joins, never as a nested loop. Every event matches
    exactly once (the intervals tile each user's timeline; degenerate
    same-second intervals are excluded by the half-open bound)."""
    events = load_table(spark, "events", sf_dir)
    scd = user_segment_scd2(spark, sf_dir).select(
        F.col("user_id").alias("s_user"), "segment", "valid_from", "valid_to"
    )
    ts_s = epoch_seconds("ts")
    return (
        events.join(
            scd,
            (F.col("user_id") == F.col("s_user"))
            & (F.col("valid_from") <= ts_s)
            & (ts_s < F.col("valid_to")),
        )
        .select(
            "event_id",
            "user_id",
            ts_s.alias("ts_s"),
            F.col("segment").alias("segment_at_event"),
        )
    )


@register("user_segment_scd2", oracle=_SCD2_ORACLE, tags=("scd2", "cdc"))
def user_segment_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) build from the raw event log:
    each user's event_type acts as the tracked attribute; consecutive
    repeats collapse, each change opens a validity interval
    [valid_from, valid_to) closed by the next change (open-ended rows
    carry the year-9999 sentinel and is_current=true). ONE shuffle on
    user_id shared by the change-detection lag and the interval-closing
    lead — the batch form of a CDC/changelog materialization."""
    events = load_table(spark, "events", sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = events.withColumn("prev_type", F.lag("event_type").over(w))
    changes = ordered.filter(
        F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type"))
    ).select(
        "user_id",
        F.col("event_type").alias("segment"),
        epoch_seconds("ts").alias("valid_from"),
        "event_id",
    )
    w2 = W.partitionBy("user_id").orderBy("valid_from", "event_id")
    nxt = F.lead("valid_from").over(w2)
    return changes.select(
        "user_id",
        "segment",
        "valid_from",
        F.coalesce(nxt, F.lit(_SCD2_SENTINEL)).alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


# ---------------------------------------------------------------------------
# Cohort retention (weekly)
# ---------------------------------------------------------------------------

_RETENTION_ORACLE = """
WITH w AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) // 604800 AS wk FROM events
),
cohort AS (SELECT user_id, min(wk) AS cohort_week FROM w GROUP BY user_id),
activity AS (SELECT DISTINCT user_id, wk FROM w)
SELECT c.cohort_week, a.wk - c.cohort_week AS weeks_since, count(*) AS n_users
FROM activity a JOIN cohort c ON a.user_id = c.user_id
GROUP BY 1, 2
"""


@register("weekly_retention", oracle=_RETENTION_ORACLE, tags=("cohort",))
def weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users bucketed by first-seen week, counted per
    weeks-since-cohort. Three aggregations all keyed on user_id — one
    shuffle sets up the partitioning, the cohort side joins co-located."""
    events = load_table(spark, "events", sf_dir)
    w = events.select(
        "user_id", (epoch_seconds("ts") / 604800).cast("long").alias("wk")
    )
    cohort = w.groupBy("user_id").agg(F.min("wk").alias("cohort_week"))
    activity = w.distinct()
    return (
        activity.join(cohort, "user_id")
        .groupBy("cohort_week", (F.col("wk") - F.col("cohort_week")).alias("weeks_since"))
        .agg(F.count("*").alias("n_users"))
    )


# ---------------------------------------------------------------------------
# Conversion funnel (sequential pattern: view → click → purchase ≤ 1 h)
# ---------------------------------------------------------------------------

_FUNNEL_ORACLE = """
WITH v AS (
  SELECT user_id, min(ts) AS view_ts FROM events WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(e.ts) AS click_ts
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.view_ts
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(e.ts) AS purchase_ts
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.click_ts
  GROUP BY e.user_id
),
f AS (
  SELECT v.user_id,
         CASE WHEN p.purchase_ts IS NOT NULL
                AND CAST(floor(epoch(p.purchase_ts)) AS BIGINT)
                  - CAST(floor(epoch(v.view_ts)) AS BIGINT) <= 3600 THEN 3
              WHEN c.click_ts IS NOT NULL
                AND CAST(floor(epoch(c.click_ts)) AS BIGINT)
                  - CAST(floor(epoch(v.view_ts)) AS BIGINT) <= 3600 THEN 2
              ELSE 1 END AS reached
  FROM v LEFT JOIN c ON v.user_id = c.user_id
         LEFT JOIN p ON v.user_id = p.user_id
)
SELECT stage, count(*) AS n_users FROM (
  SELECT user_id, 1 AS stage FROM f
  UNION ALL SELECT user_id, 2 FROM f WHERE reached >= 2
  UNION ALL SELECT user_id, 3 FROM f WHERE reached >= 3
) GROUP BY stage
"""


@register("conversion_funnel", oracle=_FUNNEL_ORACLE, tags=("funnel", "cep"))
def conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-pattern funnel (the relational form of CEP
    ``view followedBy click followedBy purchase within 1h``): each
    stage is a per-user min-timestamp aggregate constrained to follow
    the previous stage. All three aggregates and both joins are keyed
    on user_id — one partitioning reused throughout."""
    events = load_table(spark, "events", sf_dir)

    def first_after(event_type: str, after: DataFrame, after_col: str, alias: str) -> DataFrame:
        e = events.filter(F.col("event_type") == event_type).alias("e")
        a = after.alias("a")
        return (
            e.join(a, F.col("e.user_id") == F.col("a.user_id"))
            .filter(F.col("e.ts") > F.col(f"a.{after_col}"))
            .groupBy(F.col("e.user_id").alias("user_id"))
            .agg(F.min("e.ts").alias(alias))
        )

    v = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("view_ts"))
    )
    c = first_after("click", v, "view_ts", "click_ts")
    p = first_after("purchase", c, "click_ts", "purchase_ts")

    f = (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            F.when(
                F.col("purchase_ts").isNotNull()
                & (
                    epoch_seconds("purchase_ts") - epoch_seconds("view_ts")
                    <= 3600
                ),
                3,
            )
            .when(
                F.col("click_ts").isNotNull()
                & (epoch_seconds("click_ts") - epoch_seconds("view_ts") <= 3600),
                2,
            )
            .otherwise(1)
            .alias("reached"),
        )
    )
    stages = (
        f.select(F.lit(1).alias("stage"))
        .unionAll(f.filter(F.col("reached") >= 2).select(F.lit(2).alias("stage")))
        .unionAll(f.filter(F.col("reached") >= 3).select(F.lit(3).alias("stage")))
    )
    return stages.groupBy("stage").agg(F.count("*").alias("n_users"))


# ---------------------------------------------------------------------------
# Pattern-API (CEP) form of the login-fail query
# ---------------------------------------------------------------------------

_CEP_LOGIN_ORACLE = """
WITH l AS (
  SELECT user_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS t,
         lag(event_type) OVER w AS pt,
         lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER w AS pf
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, pf AS first_ts, t AS second_ts
FROM l WHERE event_type = 'error' AND pt = 'error' AND t - pf <= 1800
"""


@register("login_fail_cep_pattern", oracle=_CEP_LOGIN_ORACLE, tags=("C1", "cep"))
def login_fail_cep_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The C1 query expressed through the generic Pattern API
    (operators/cep.py) — ``begin(error).next(error).within(1800)`` —
    proving the FlinkCEP-surface operator reproduces the hand-built
    lag query (strict contiguity, all matches)."""
    from flink_wsr_project_spark.operators.cep import Pattern, match_pattern

    events = load_table(spark, "events", sf_dir)
    p = (
        Pattern.begin("first", F.col("event_type") == "error")
        .next("second", F.col("event_type") == "error")
        .within(1800)
    )
    return match_pattern(events, ["user_id"], "ts", p, tiebreakers=["event_id"])


# ---------------------------------------------------------------------------
# Data-quality report (declarative expectations, one aggregate pass)
# ---------------------------------------------------------------------------

_QUALITY_REPORT_ORACLE = """
WITH m AS (
  SELECT count(*) AS n,
         sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS v_user_not_null,
         sum(CASE WHEN value BETWEEN 0 AND 1000000 THEN 0 ELSE 1 END) AS v_value_range,
         sum(CASE WHEN event_type IN ('view','click','purchase','signup','error')
                  THEN 0 ELSE 1 END) AS v_known_type
  FROM events
)
SELECT 'user_not_null' AS rule, CAST(v_user_not_null AS BIGINT) AS violations,
       n AS rows_checked,
       CAST(1.0 - v_user_not_null / n AS DOUBLE) AS pass_rate FROM m
UNION ALL
SELECT 'value_range', CAST(v_value_range AS BIGINT), n,
       CAST(1.0 - v_value_range / n AS DOUBLE) FROM m
UNION ALL
SELECT 'known_type', CAST(v_known_type AS BIGINT), n,
       CAST(1.0 - v_known_type / n AS DOUBLE) FROM m
"""


@register("events_quality_report", oracle=_QUALITY_REPORT_ORACLE, tags=("quality",))
def events_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality rules evaluated in ONE aggregate pass
    (operators/quality.py): each rule is a conditional sum sharing the
    same scan — the cheapest shape for rule suites at corpus scale."""
    from flink_wsr_project_spark.operators.quality import (
        in_range,
        not_null,
        one_of,
        quality_report,
    )

    events = load_table(spark, "events", sf_dir)
    return quality_report(
        events,
        {
            "user_not_null": not_null("user_id"),
            "value_range": in_range("value", 0, 1000000),
            "known_type": one_of("event_type", ["view", "click", "purchase", "signup", "error"]),
        },
    )


# ---------------------------------------------------------------------------
# Anomaly detection: z-score outliers per event_type
# ---------------------------------------------------------------------------

_OUTLIERS_ORACLE = """
WITH c AS (
  SELECT event_id, event_type, CAST(round(value * 100) AS BIGINT) AS cents FROM events
),
m AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(cents) AS BIGINT) AS s1, CAST(sum(cents * cents) AS BIGINT) AS s2
  FROM c GROUP BY event_type
),
s AS (
  SELECT event_type, s1 * 1.0 / n AS mean_c,
         sqrt((n * s2 - s1 * s1) * 1.0 / (n * n)) AS std_c
  FROM m
)
SELECT c.event_type, count(*) AS n_outliers
FROM c JOIN s ON c.event_type = s.event_type
WHERE abs(c.cents - s.mean_c) > 3 * s.std_c
GROUP BY c.event_type
"""


@register("value_outliers", oracle=_OUTLIERS_ORACLE, tags=("anomaly",))
def value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3σ outlier counts per event_type. Moments come from exact
    integer sums (one aggregate), broadcast back onto the rows — two
    passes over the scan, no shuffle of the fact rows themselves."""
    events = load_table(spark, "events", sf_dir)
    c = events.select(
        "event_id", "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    m = c.groupBy("event_type").agg(
        F.count("*").alias("n"), F.sum("cents").alias("s1"),
        F.sum(F.col("cents") * F.col("cents")).alias("s2"),
    )
    s = m.select(
        "event_type",
        (F.col("s1") * 1.0 / F.col("n")).alias("mean_c"),
        F.sqrt((F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")) * 1.0
               / (F.col("n") * F.col("n"))).alias("std_c"),
    )
    joined = c.join(F.broadcast(s), "event_type")
    return (
        joined.filter(F.abs(F.col("cents") - F.col("mean_c")) > 3 * F.col("std_c"))
        .groupBy("event_type")
        .agg(F.count("*").alias("n_outliers"))
    )


@register("value_quantiles_approx", oracle=None, tags=("percentile", "sketch"))
def value_quantiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate p50/p90/p99 of value per event_type via
    ``approx_percentile`` (KLL-style mergeable quantile sketch, relative
    accuracy 1/10000). The sketch is the 100 TB path: fixed-size state
    merged map-side, one shuffle, no sort of the full column — the
    exact twin (``value_percentiles``) needs a per-group sort that a
    quantile over 10^11 rows cannot afford. Rows-only check: sketch
    internals differ across engines by design."""
    ev = load_table(spark, "events", sf_dir)
    pct = F.percentile_approx(F.col("value"), [0.5, 0.9, 0.99], 10000)
    return ev.groupBy("event_type").agg(
        pct.getItem(0).alias("p50_approx"),
        pct.getItem(1).alias("p90_approx"),
        pct.getItem(2).alias("p99_approx"),
        F.count("*").alias("n"),
    )


# ---------------------------------------------------------------------------
# UNPIVOT / melt: hourly wide metrics to long (metric, value) rows
# ---------------------------------------------------------------------------

_METRICS_LONG_ORACLE = """
WITH agg AS (
  SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600 + 3600 AS window_end,
         count(*) AS n_events,
         count(DISTINCT user_id) AS n_users,
         sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS value_sum
  FROM events GROUP BY 1
)
SELECT window_end, 'n_events' AS metric, CAST(n_events AS DOUBLE) AS metric_value FROM agg
UNION ALL
SELECT window_end, 'n_users', CAST(n_users AS DOUBLE) FROM agg
UNION ALL
SELECT window_end, 'value_sum', value_sum FROM agg
"""


@register("hourly_metrics_long", oracle=_METRICS_LONG_ORACLE, tags=("unpivot",))
def hourly_metrics_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide → long melt), the inverse of event_type_pivot:
    hourly (events, users, value) metrics emitted as one
    (window_end, metric, metric_value) row per measure via ``stack`` —
    a single Generate over the aggregate, where the naive UNION-ALL
    form (the oracle's spelling) re-reads the aggregate once per
    metric. Long-format metric tables are the schema-stable way to add
    measures without migrations at warehouse scale."""
    from flink_wsr_project_spark.operators.windows import cents, windowed_agg

    events = load_table(spark, "events", sf_dir)
    agg = windowed_agg(
        events,
        "ts",
        "1 hour",
        aggs=[
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            (F.sum(cents("value")) / 100.0).alias("value_sum"),
        ],
    )
    return agg.select(
        "window_end",
        F.expr(
            "stack(3, 'n_events', CAST(n_events AS DOUBLE),"
            " 'n_users', CAST(n_users AS DOUBLE),"
            " 'value_sum', value_sum) AS (metric, metric_value)"
        ),
    )


# ---------------------------------------------------------------------------
# Time-hierarchy ROLLUP: hypertable-style day/hour continuous aggregate
# ---------------------------------------------------------------------------

_TIME_ROLLUP_ORACLE = """
SELECT coalesce(CAST(day_bucket AS VARCHAR), 'ALL') AS day_key,
       coalesce(CAST(hour_bucket AS VARCHAR), 'ALL') AS hour_key,
       count(*) AS n_events,
       sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS value_sum
FROM (
  SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 86400) * 86400 AS day_bucket,
         (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600 AS hour_bucket,
         value
  FROM events
)
GROUP BY ROLLUP (day_bucket, hour_bucket)
"""


@register("events_time_rollup", oracle=_TIME_ROLLUP_ORACLE, tags=("rollup", "hypertable"))
def events_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: hourly, daily, and grand
    totals in ONE scan + ONE shuffle via ROLLUP over (day, hour)
    epoch buckets — the batch form of a TimescaleDB/Druid time rollup.
    NULL rollup levels surface as 'ALL' string keys so the three
    granularities are one stable schema (the long-format analog of
    materializing each level separately)."""
    events = load_table(spark, "events", sf_dir)
    epoch = F.floor(F.unix_timestamp("ts")).cast("long")
    bucketed = events.select(
        ((epoch / 86400).cast("long") * 86400).alias("day_bucket"),
        ((epoch / 3600).cast("long") * 3600).alias("hour_bucket"),
        "value",
    )
    from flink_wsr_project_spark.operators.windows import cents

    return (
        bucketed.rollup("day_bucket", "hour_bucket")
        .agg(F.count("*").alias("n_events"), (F.sum(cents("value")) / 100.0).alias("value_sum"))
        .select(
            F.coalesce(F.col("day_bucket").cast("string"), F.lit("ALL")).alias("day_key"),
            F.coalesce(F.col("hour_bucket").cast("string"), F.lit("ALL")).alias("hour_key"),
            "n_events",
            "value_sum",
        )
    )


# ---------------------------------------------------------------------------
# Skew-resistant salted join (operators.skew)
# ---------------------------------------------------------------------------

_SALTED_JOIN_ORACLE = """
SELECT c_mktsegment AS segment,
       count(*) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events JOIN customer ON user_id = c_custkey
GROUP BY c_mktsegment
"""


@register("segment_value_salted", oracle=_SALTED_JOIN_ORACLE, tags=("skew", "J1"))
def segment_value_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event value per customer segment through an 8-way SALTED
    sort-merge join (operators.skew.salted_join): the fact side's hot
    keys are spread over 8 (key, salt) sub-partitions, the customer
    side is replicated once per salt. Same rows as the plain equi-join
    (the oracle IS the plain join) — what changes is that no single
    task can be pinned by one hot user_id at 100 TB. The reference
    hand-rolled this trick for aggregation (PageView.scala:41-52);
    join salting is the case Spark still needs it for.
    """
    from flink_wsr_project_spark.operators.skew import salted_join
    from flink_wsr_project_spark.operators.windows import cents

    events = load_table(spark, "events", sf_dir).select("user_id", "value")
    cust = load_table(spark, "customer", sf_dir).select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    j = salted_join(events, cust, "user_id", n_salts=8)
    return (
        j.groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(cents("value")).alias("value_cents"),
        )
        .select("segment", "n_events", "value_cents")
    )


# ---------------------------------------------------------------------------
# Banded range join (operators.rangejoin): pure point-in-interval match
# ---------------------------------------------------------------------------

_LAUNCH_WINDOW_ORACLE = """
WITH launch AS (
  SELECT event_type AS launch_type,
         CAST(floor(epoch(min(ts))) AS BIGINT) AS w_start,
         CAST(floor(epoch(min(ts))) AS BIGINT) + 172800 AS w_end
  FROM events GROUP BY event_type
)
SELECT launch_type, count(*) AS n_events, count(DISTINCT user_id) AS n_users
FROM launch JOIN events
  ON CAST(floor(epoch(ts)) AS BIGINT) BETWEEN w_start AND w_end
GROUP BY launch_type
"""


@register("launch_window_traffic", oracle=_LAUNCH_WINDOW_ORACLE, tags=("rangejoin", "J1"))
def launch_window_traffic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total traffic (all types) during each event type's 48 h launch
    window — a join with NO equi-key, only ``ts BETWEEN start AND end``.
    Naively that plans BroadcastNestedLoopJoin (points × intervals);
    operators.rangejoin.banded_range_join quantizes time into 1 h
    buckets so it runs as an equi-join on the bucket id: the interval
    side replicates ≤ 49×, the 100 TB point side not at all, and no
    cartesian/nested-loop node appears in the plan (mechanically
    asserted by the registry-wide plan audit).
    """
    from flink_wsr_project_spark.operators.rangejoin import banded_range_join

    events = load_table(spark, "events", sf_dir)
    epoch = F.floor(F.unix_timestamp("ts")).cast("long")
    launch = (
        events.groupBy(F.col("event_type").alias("launch_type"))
        .agg(F.min(epoch).alias("w_start"))
        .withColumn("w_end", F.col("w_start") + 172800)
    )
    points = events.select("user_id", epoch.alias("ts_epoch"))
    j = banded_range_join(points, launch, "ts_epoch", "w_start", "w_end", bucket_s=3600)
    return (
        j.groupBy("launch_type")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select("launch_type", "n_events", "n_users")
    )


# ---------------------------------------------------------------------------
# Generalized as-of join (operators.asofjoin) vs DuckDB's NATIVE ASOF JOIN
# ---------------------------------------------------------------------------

_SIGNUP_ASOF_ORACLE = """
WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
     s AS (SELECT DISTINCT user_id, ts FROM events WHERE event_type = 'signup')
SELECT p.event_id AS purchase_event_id, p.user_id,
       CAST(floor(epoch(p.ts)) AS BIGINT) AS purchase_ts,
       CAST(floor(epoch(s.ts)) AS BIGINT) AS signup_ts
FROM p ASOF LEFT JOIN s ON p.user_id = s.user_id AND p.ts >= s.ts
"""


@register("purchase_signup_asof", oracle=_SIGNUP_ASOF_ORACLE, tags=("asof", "J1"))
def purchase_signup_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each purchase joined to the user's most recent signup at or
    before it — the generalized ``operators.asofjoin.asof_join`` (one
    shuffle, union + carry-forward, no per-row probe), cross-checked
    against DuckDB's NATIVE ``ASOF LEFT JOIN`` implementation rather
    than a window-function paraphrase: two independent engines, two
    independent algorithms, same rows."""
    from flink_wsr_project_spark.operators.asofjoin import asof_join

    events = load_table(spark, "events", sf_dir)
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    signups = (
        events.filter(F.col("event_type") == "signup")
        .select("user_id", F.col("ts").alias("signup_raw"))
        .distinct()
    )
    j = asof_join(
        purchases,
        signups,
        on=["user_id"],
        left_ts="ts",
        right_ts="signup_raw",
        right_cols=[],
        matched_ts_alias="signup_ts_raw",
    )
    return j.select(
        F.col("event_id").alias("purchase_event_id"),
        "user_id",
        epoch_seconds("ts").alias("purchase_ts"),
        epoch_seconds("signup_ts_raw").alias("signup_ts"),
    )


# ---------------------------------------------------------------------------
# Keyed dedup keep-first (operators.keepfirst) — the Flink SQL dedup idiom
# ---------------------------------------------------------------------------

_FIRST_TOUCH_ORACLE = """
SELECT user_id, day, event_id, event_type, ts_epoch FROM (
  SELECT user_id, strftime(ts, '%Y-%m-%d') AS day, event_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch,
         row_number() OVER (PARTITION BY user_id, strftime(ts, '%Y-%m-%d')
                            ORDER BY ts, event_id) AS rn
  FROM events
) WHERE rn = 1
"""


@register("first_touch_per_user_day", oracle=_FIRST_TOUCH_ORACLE, tags=("dedup", "R3"))
def first_touch_per_user_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First event per (user, day) — the Flink SQL deduplication idiom
    (ROW_NUMBER() = 1, which the reference engine would run as keyed
    state keeping the first element). Spark-first:
    ``operators.keepfirst.dedup_keep_first`` — Spark 4 plants a
    ``WindowGroupLimit(Partial)`` below the exchange, so every map task
    pre-prunes to one row per key and the wire carries ~|keys| rows,
    not the table (the min_by aggregation alternative ships the same
    rows but 35% slower — see operators/keepfirst.py)."""
    from flink_wsr_project_spark.operators.keepfirst import dedup_keep_first

    events = load_table(spark, "events", sf_dir).select(
        "user_id",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        "event_id",
        "event_type",
        epoch_seconds("ts").alias("ts_epoch"),
    )
    return dedup_keep_first(
        events, ["user_id", "day"], order_by=["ts_epoch", "event_id"]
    )


# ---------------------------------------------------------------------------
# Mergeable-sketch rollup: hourly HLL sketches unioned to daily UV
# ---------------------------------------------------------------------------


@register("uv_daily_sketch_rollup", oracle=None, tags=("A10", "sketch"))
def uv_daily_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily unique visitors computed by UNIONING hourly HLL sketches —
    the pre-aggregation pattern a 100 TB rollup pipeline runs: sketch
    once at the finest grain (hour), answer every coarser grain (day,
    week, ad-hoc ranges) by merging kilobyte sketches instead of
    re-scanning raw data. ``hll_sketch_agg``/``hll_union_agg`` are
    Apache DataSketches HLL (mergeable without error inflation).
    No SQL oracle (sketch binaries are engine-specific — driver records
    the rows-only check); tests/test_properties.py pins the
    merge-invariance property (hourly→union == direct daily sketch,
    bit-exact) and the estimate's error envelope vs exact."""
    events = load_table(spark, "events", sf_dir)
    hourly = (
        events.filter(F.col("event_type") == "view")
        .groupBy(
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            F.hour("ts").alias("hour"),
        )
        .agg(F.hll_sketch_agg("user_id").alias("sketch"))
    )
    return (
        hourly.groupBy("day")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("uv_estimate"))
        .select("day", "uv_estimate")
    )

_EWMA_ORACLE = """
WITH seq AS (
  SELECT user_id,
         list(CAST(floor(value * 1000 + 0.5) AS BIGINT) ORDER BY ts, event_id) AS vs
  FROM events GROUP BY user_id
)
SELECT user_id,
       CAST(len(vs) AS BIGINT) AS n_events,
       CAST(list_reduce(vs, (acc, v) -> (acc + v) // 2) AS BIGINT) AS ewma_milli
FROM seq
"""


@register("user_value_ewma", oracle=_EWMA_ORACLE, tags=("session", "ordered-fold"))
def user_value_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially weighted value (alpha = 1/2) over the
    event-time-ordered stream — the ORDER-DEPENDENT fold no window
    frame can express (each step halves the accumulated state:
    e := (e + v) div 2, seeded by the first value). Integer milli-units
    with truncating division make the recursion bit-exact across
    engines; (ts, event_id) ordering makes it deterministic.

    Plan: one shuffle on user_id; the per-user sequence is assembled
    with array_sort(collect_list(...)) and folded by the codegen'd
    ``aggregate`` higher-order function — state is O(events per user)
    in the collect, which is the honest cost of any ordered fold. At
    100 TB the same semantics move to repartition(user_id) +
    sortWithinPartitions(user_id, ts, event_id) + a streaming
    ``mapInPandas`` fold (secondary-sort pattern) so no single user's
    history must fit in one array; the testdata's per-user cardinality
    (~hundreds) keeps the in-row form optimal here.
    """
    load_table(spark, "events", sf_dir).createOrReplaceTempView("events")
    return spark.sql(
        """
WITH seq AS (
  SELECT user_id,
         transform(
           array_sort(collect_list(struct(ts, event_id,
             CAST(floor(value * 1000 + 0.5) AS BIGINT) AS v))),
           x -> x.v
         ) AS vs
  FROM events GROUP BY user_id
)
SELECT user_id,
       CAST(size(vs) AS BIGINT) AS n_events,
       aggregate(slice(vs, 2, greatest(size(vs) - 1, 0)), vs[1],
                 (acc, v) -> (acc + v) div 2) AS ewma_milli
FROM seq
"""
    )

@register("user_value_ewma_partitioned", oracle=_EWMA_ORACLE, tags=("session", "ordered-fold"))
def user_value_ewma_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The unbounded-history twin of :func:`user_value_ewma`: identical
    semantics (per-user e := (e + v) div 2 fold over (ts, event_id)
    order, integer milli-units), but NO per-user array — the
    secondary-sort pattern promised in user_value_ewma's docstring,
    proven here against the same oracle.

    Plan: ``repartition(user_id)`` (the one shuffle) +
    ``sortWithinPartitions(user_id, ts, event_id)`` + a streaming
    ``mapInPandas`` fold that carries (user, count, accumulator) — three
    scalars — across Arrow chunks. A user's history never materializes
    as a single array anywhere, so a 100 TB user with a billion events
    folds in O(1) memory; the in-row form would need the whole history
    in one collect_list. The fold itself is sequential by definition
    (each step's floor depends on the previous), so the inner loop is
    the algorithm, not overhead.
    """
    events = load_table(spark, "events", sf_dir)
    src = (
        events.select(
            F.col("user_id").cast("long").alias("user_id"),
            F.col("ts").cast("timestamp").alias("_ts"),
            F.col("event_id").cast("long").alias("_eid"),
            milli_value("value").alias("v_milli"),
        )
        .repartition("user_id")
        .sortWithinPartitions("user_id", "_ts", "_eid")
    )

    return src.mapInPandas(
        build_ewma_fold(), "user_id long, n_events long, ewma_milli long"
    )


def build_ewma_fold():
    """The secondary-sort EWMA fold for :func:`user_value_ewma_partitioned`,
    exposed at module level so the property suite (tests/
    test_stateful_folds.py) can drive it directly over random chunkings.
    The returned closure is serialized by value by cloudpickle, so the
    worker self-containment of the inline form is preserved."""

    def fold(iterator):
        import numpy as np
        import pandas as pd

        cur_uid, cur_n, cur_acc = None, 0, 0
        for pdf in iterator:
            if not len(pdf):
                continue
            uids = pdf["user_id"].to_numpy(np.int64)
            vs = pdf["v_milli"].to_numpy(np.int64)
            out_u: list[int] = []
            out_n: list[int] = []
            out_e: list[int] = []
            starts = np.concatenate(([0], np.nonzero(uids[1:] != uids[:-1])[0] + 1))
            ends = np.concatenate((starts[1:], [len(uids)]))
            for s_, e_ in zip(starts, ends):
                u = int(uids[s_])
                if u != cur_uid:
                    if cur_uid is not None:
                        out_u.append(cur_uid)
                        out_n.append(cur_n)
                        out_e.append(cur_acc)
                    cur_uid, cur_n, cur_acc = u, 0, 0
                for v in vs[s_:e_].tolist():
                    # values are non-negative milli-units, so Python //
                    # matches SQL `div` (truncation) exactly
                    cur_acc = v if cur_n == 0 else (cur_acc + v) // 2
                    cur_n += 1
            if out_u:
                yield pd.DataFrame(
                    {"user_id": out_u, "n_events": out_n, "ewma_milli": out_e}
                )
        if cur_uid is not None:
            yield pd.DataFrame(
                {"user_id": [cur_uid], "n_events": [cur_n], "ewma_milli": [cur_acc]}
            )

    return fold


_LOCF_ORACLE = """
WITH bounds AS (
  SELECT user_id,
         CAST(floor(epoch(min(ts)) / 1800) AS BIGINT) * 1800 AS lo,
         CAST(floor(epoch(max(ts)) / 1800) AS BIGINT) * 1800 AS hi
  FROM events GROUP BY user_id
),
grid AS (
  SELECT user_id, unnest(range(lo, hi + 1800, 1800)) AS grid_ts FROM bounds
),
obs AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t,
         CAST(floor(value * 1000 + 0.5) AS BIGINT) AS v_milli,
         1 AS is_obs, CAST(event_id AS BIGINT) AS ord_id
  FROM events
),
unioned AS (
  SELECT user_id, t, v_milli, is_obs, ord_id FROM obs
  UNION ALL
  SELECT user_id, grid_ts AS t, NULL AS v_milli, 0 AS is_obs,
         CAST(-1 AS BIGINT) AS ord_id
  FROM grid
),
filled AS (
  SELECT user_id, t, is_obs,
         last_value(v_milli IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY t, is_obs DESC, ord_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS locf_milli
  FROM unioned
)
SELECT user_id, t AS grid_ts, locf_milli
FROM filled WHERE is_obs = 0
"""


@register("user_value_locf", oracle=_LOCF_ORACLE, tags=("timeseries", "resample"))
def user_value_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling: each user's value series sampled onto a
    30-minute grid with last-observation-carried-forward — the gap-fill
    primitive behind dashboards and feature snapshots (distinct from
    windowed aggregation: it EMITS at grid points, not event times).

    Plan shape: the observation rows and the generated grid rows union
    into ONE frame, and a single `last_value IGNORE NULLS` window pass
    per user fills the grid — one shuffle on user_id, no per-grid-point
    join. Ordering is (t ASC, is_obs DESC, event_id ASC): at equal t
    observations sort BEFORE the grid row, so a grid point landing
    exactly on an observation emits THAT observation's value, and among
    same-second observations the largest event_id wins (deterministic
    across engines — same discipline as user_value_ewma). Integer
    milli-units keep the carried values bit-exact.
    """
    events = load_table(spark, "events", sf_dir)
    ts_s = F.col("ts").cast("timestamp").cast("long")
    bounds = events.groupBy("user_id").agg(
        ((F.floor(F.min(ts_s) / 1800)) * 1800).cast("long").alias("lo"),
        ((F.floor(F.max(ts_s) / 1800)) * 1800).cast("long").alias("hi"),
    )
    grid = bounds.select(
        "user_id",
        F.explode(F.sequence("lo", F.col("hi"), F.lit(1800))).alias("t"),
    ).select(
        "user_id",
        "t",
        F.lit(None).cast("long").alias("v_milli"),
        F.lit(0).alias("is_obs"),
        F.lit(-1).cast("long").alias("ord_id"),
    )
    obs = events.select(
        "user_id",
        ts_s.alias("t"),
        milli_value("value").alias("v_milli"),
        F.lit(1).alias("is_obs"),
        F.col("event_id").cast("long").alias("ord_id"),
    )
    unioned = obs.unionByName(grid)
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("t").asc(), F.col("is_obs").desc(), F.col("ord_id").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = unioned.withColumn(
        "locf_milli", F.last("v_milli", ignorenulls=True).over(w)
    )
    return filled.filter(F.col("is_obs") == 0).select(
        "user_id", F.col("t").alias("grid_ts"), "locf_milli"
    )

# the +10^11 bias is interpolated from the SAME constant the Spark
# plan reads (operators/windows.py:_ORD_KEY_TS_BIAS) — one source of
# truth, so a future change cannot desync the plan from its oracle
_OHLC_ORACLE = f"""
WITH v AS (
  SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600 + 3600 AS window_end,
         CAST(floor(value * 1000 + 0.5) AS BIGINT) AS v_milli,
         lpad(CAST(CAST(floor(epoch(ts)) AS BIGINT) + {_ORD_KEY_TS_BIAS} AS VARCHAR), 12, '0')
           || lpad(CAST(event_id AS VARCHAR), 12, '0') AS ord_key
  FROM events
)
SELECT window_end,
       arg_min(v_milli, ord_key) AS open_milli,
       CAST(max(v_milli) AS BIGINT) AS high_milli,
       CAST(min(v_milli) AS BIGINT) AS low_milli,
       arg_max(v_milli, ord_key) AS close_milli,
       count(*) AS n_events
FROM v GROUP BY window_end
"""


@register("value_ohlc_hourly", oracle=_OHLC_ORACLE, tags=("timeseries", "market"))
def value_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars over the value stream — the market-data
    compaction the reference's market package implies but never built:
    open/close are the FIRST/LAST observation in the bar (deterministic
    (ts, event_id) arrival order via min_by/max_by on a zero-padded
    composite key — DuckDB's arg_min takes scalar keys only, so both
    engines order by the identical string), high/low are extrema.
    One hash shuffle on the bar; min_by/max_by are single-pass
    mergeable aggregates — no window function, no per-bar sort, which
    is what makes the bar compaction scale to unbounded ticks/bar."""
    events = load_table(spark, "events", sf_dir)
    ts_s = F.col("ts").cast("timestamp").cast("long")
    base = events.select(
        ((F.floor(ts_s / 3600)) * 3600 + 3600).cast("long").alias("window_end"),
        milli_value("value").alias("v_milli"),
        arrival_ord_key().alias("ord_key"),
    )
    return base.groupBy("window_end").agg(*ohlc_aggs())

_VWAP_ORACLE = """
WITH v AS (
  SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600 + 3600 AS window_end,
         CAST(floor(value * 1000 + 0.5) AS BIGINT) AS p_milli,
         CAST(json_extract(props, '$.k') AS BIGINT) AS qty
  FROM events
)
SELECT window_end,
       CAST(sum(p_milli * qty) AS BIGINT) AS turnover_milli,
       CAST(sum(qty) AS BIGINT) AS volume,
       CAST(floor(sum(p_milli * qty) * 1.0 / sum(qty)) AS BIGINT) AS vwap_milli
FROM v WHERE qty > 0 GROUP BY window_end
"""


@register("value_vwap_hourly", oracle=_VWAP_ORACLE, tags=("timeseries", "market", "json"))
def value_vwap_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly volume-weighted average value: price = the value column
    in exact milli-units, quantity = the ``k`` field pulled out of the
    JSON props — the classic VWAP shape, exercising semi-structured
    extraction INSIDE an exact-integer aggregate. turnover and volume
    are plain Long sums (order-independent); vwap is their floored
    ratio, computed identically by both engines. One shuffle."""
    events = load_table(spark, "events", sf_dir)
    ts_s = F.col("ts").cast("timestamp").cast("long")
    base = events.select(
        ((F.floor(ts_s / 3600)) * 3600 + 3600).cast("long").alias("window_end"),
        milli_value("value").alias("p_milli"),
        props_qty().alias("qty"),
    ).filter(F.col("qty") > 0)
    return base.groupBy("window_end").agg(*vwap_aggs())



# ---------------------------------------------------------------------------
# Time-series pattern search (subsequence similarity, streaming-research
# family — cf. "Time Series Similarity Search for Streaming Data in
# Distributed Systems", EDBT 2019): correlation of every length-8
# per-user sliding window against a fixed query pattern.
# ---------------------------------------------------------------------------

# spike-shaped query pattern in milli-units; correlation is
# shift/scale-invariant, so this matches the SHAPE (z-normalized
# subsequence matching), not absolute levels
_SP_PATTERN = (0, 100, 300, 600, 1000, 600, 300, 100)
_SP_K = len(_SP_PATTERN)
_SP_SUM = sum(_SP_PATTERN)
_SP_DEN = _SP_K * sum(p * p for p in _SP_PATTERN) - _SP_SUM * _SP_SUM


def _series_pattern_sql(engine: str) -> str:
    """Global top-50 spike-shaped windows across all user value series.

    One partitioned window pass materializes the 8 trailing values as
    lag columns (whole-stage codegen, no arrays, no UDF); the
    correlation's sums are exact BIGINTs (v_milli ≤ 5×10^5 ⇒ k·Σxx ≤
    1.6×10^13, far inside int64), and only the final normalization is
    IEEE double — sqrt and division are correctly-rounded single
    expressions, bit-identical across engines, then floored to
    milli-units so ranking and hashing stay integer-stable. Ties are
    fully broken by (corr desc, user, t, event_id) ⇒ the top-50 SET is
    deterministic.

    100 TB shape: one shuffle on user_id serves the lag pass; the
    global top-K is ORDER BY + LIMIT ⇒ TakeOrderedAndProject (per-task
    50-row heaps merged at the driver), never an unpartitioned rank.
    A streaming form is the same expressions over
    applyInPandasWithState's trailing-k buffer (the CEP executor
    already keeps exactly that state shape).
    """
    epoch = "unix_timestamp(ts)" if engine == "spark" else "epoch(ts)"
    over = "OVER (PARTITION BY user_id ORDER BY t, event_id)"
    xs = ", ".join(
        f"lag(x, {_SP_K - 1 - j}) {over} AS x{j}" for j in range(_SP_K - 1)
    ) + f", x AS x{_SP_K - 1}"
    sx = " + ".join(f"x{j}" for j in range(_SP_K))
    sxx = " + ".join(f"x{j} * x{j}" for j in range(_SP_K))
    sxy = " + ".join(f"{p} * x{j}" for j, p in enumerate(_SP_PATTERN))
    return f"""
WITH v AS (
  SELECT user_id, event_id,
         CAST(floor({epoch}) AS BIGINT) AS t,
         CAST(floor(value * 1000 + 0.5) AS BIGINT) AS x
  FROM events
),
lagged AS (
  SELECT user_id, event_id, t, {xs} FROM v
),
scored AS (
  SELECT user_id, event_id, t,
         ({sx}) AS sx, ({sxx}) AS sxx, ({sxy}) AS sxy
  FROM lagged WHERE x0 IS NOT NULL
)
SELECT user_id, event_id, t AS window_end_ts,
       CAST(floor(1000.0 * ({_SP_K} * sxy - sx * {_SP_SUM})
            / (sqrt(CAST({_SP_K} * sxx - sx * sx AS DOUBLE))
               * sqrt({float(_SP_DEN)}))) AS BIGINT) AS corr_milli
FROM scored
WHERE {_SP_K} * sxx - sx * sx > 0
ORDER BY corr_milli DESC, user_id, window_end_ts, event_id
LIMIT 50
"""


@register(
    "series_pattern_topk",
    oracle=_series_pattern_sql("duckdb"),
    tags=("timeseries", "similarity"),
)
def series_pattern_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, "events", sf_dir).createOrReplaceTempView("events")
    return spark.sql(_series_pattern_sql("spark"))


from flink_wsr_project_spark.plans.registry import set_doc as _set_doc  # noqa: E402

_set_doc("series_pattern_topk", _series_pattern_sql.__doc__)
