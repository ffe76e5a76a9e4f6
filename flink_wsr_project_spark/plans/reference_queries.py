"""Reference-domain queries (SURVEY.md §2) mapped onto the driver's
``events`` + star-schema testdata.

Each query is the Spark-first re-expression of one reference job, with
the testdata analogue documented (events.user_id plays the
itemId/userId key roles; event_type plays behavior/channel/url roles;
orders+lineitem play the create/pay two-stream roles). Constants
(window sizes, thresholds, deadlines) are scaled to the testdata's
30-day span where the reference's seconds-scale constants would
degenerate to empty results; the operator shape is unchanged.

All oracles are DuckDB ANSI SQL over the same parquet views. Sliding
windows are expanded arithmetically (a row belongs to dur/slide
epoch-aligned windows), matching Spark's ``window()`` alignment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from flink_wsr_project_spark.operators.topn import topn_per_group
from flink_wsr_project_spark.operators.windows import (
    epoch_double,
    epoch_seconds,
    money_sum,
    sliding_count_two_stage,
    windowed_agg,
)
from flink_wsr_project_spark.plans.registry import register
from flink_wsr_project_spark.sources.readers import load_table


def _hop_expand(slide_s: int, dur_s: int, table: str = "events", where: str = "") -> str:
    """DuckDB fragment: expand each row into its dur/slide sliding
    windows; emits ``window_end`` (epoch s) alongside all columns."""
    n = dur_s // slide_s
    w = f" WHERE {where}" if where else ""
    return (
        f"SELECT {table}.*, (CAST(floor(epoch(ts)) AS BIGINT) // {slide_s}) * {slide_s}"
        f" - g.i * {slide_s} + {dur_s} AS window_end"
        f" FROM {table}, generate_series(0, {n - 1}) AS g(i){w}"
    )


_TUMBLE_END = "(CAST(floor(epoch({ts})) AS BIGINT) // {dur}) * {dur} + {dur}"


# ---------------------------------------------------------------------------
# hotItems: top-5 items per 1 h window sliding 5 min
# (HotItems.scala — A2 sliding agg + R1 rank; HotItems_3_SQL.scala — R3)
# ---------------------------------------------------------------------------

_HOT_ITEMS_ORACLE = f"""
WITH hopped AS ({_hop_expand(300, 3600, where="event_type = 'view'")}),
counts AS (
  SELECT window_end, user_id AS item_id, count(*) AS cnt
  FROM hopped GROUP BY 1, 2
)
SELECT window_end, item_id, cnt, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY window_end ORDER BY cnt DESC, item_id) AS rank
  FROM counts
) WHERE rank <= 5
"""


@register("hot_items_topn", oracle=_HOT_ITEMS_ORACLE, tags=("A2", "R1"))
def hot_items_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 most-viewed items per 1 h window sliding every 5 min.

    Reference: hotItems/HotItems.scala:42-82 (filter 'pv' → keyBy itemId
    → 1h/5m window count → keyBy windowEnd → ListState+timer sort top-5).
    Spark: tumble-then-roll sliding count (exchange 1 carries (item,
    5-min bucket) partials — 12× fewer groups than the naive
    ``window()`` expand ships at 100 TB) + row_number per window_end —
    the ListState/timer machinery is subsumed by the rank window
    function. The built-in ``window()`` single-expand shape is kept as
    ``hot_items_topn_expand`` for comparison.
    """
    events = load_table(spark, "events", sf_dir)
    counts = sliding_count_two_stage(
        events.filter(F.col("event_type") == "view"),
        "ts",
        3600,
        300,
        keys=[F.col("user_id").alias("item_id")],
    )
    return topn_per_group(counts, ["window_end"], "cnt", 5, tiebreakers=["item_id"]).select(
        "window_end", "item_id", "cnt", "rank"
    )


@register("hot_items_topn_sql", oracle=_HOT_ITEMS_ORACLE, tags=("A12", "A13", "R3"))
def hot_items_topn_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same query through the pure-SQL entry point.

    Reference: hotItems/HotItems_3_SQL.scala:45-64 (HOP window + ROW_NUMBER
    retract stream); HotItems_2_Table.scala:43-63 (Table API Slide window).
    Spark SQL's window()/ROW_NUMBER is the direct analogue; batch output
    makes the retract stream moot.
    """
    load_table(spark, "events", sf_dir).createOrReplaceTempView("events")
    return spark.sql(
        """
        SELECT window_end, item_id, cnt, rank FROM (
          SELECT *, CAST(row_number() OVER (
                     PARTITION BY window_end ORDER BY cnt DESC, item_id) AS BIGINT) AS rank
          FROM (
            SELECT user_id AS item_id,
                   CAST(window.end AS BIGINT) AS window_end,
                   count(*) AS cnt
            FROM events
            WHERE event_type = 'view'
            GROUP BY window(ts, '1 hour', '5 minutes'), user_id
          )
        ) WHERE rank <= 5
        """
    )


# ---------------------------------------------------------------------------
# networkflow: top-3 hot pages per 10 min window sliding 5 s
# (NetworkFlowTopNPage_经典演示迟到数据.scala — A3 + R2, late-data variant)
# ---------------------------------------------------------------------------

_HOT_PAGES_ORACLE = f"""
WITH src AS (
  SELECT '/page/' || CAST(user_id % 20 AS VARCHAR) AS url, ts FROM events
  WHERE event_type IN ('view', 'click')
),
hopped AS ({_hop_expand(60, 600, table="src")}),
counts AS (SELECT window_end, url, count(*) AS cnt FROM hopped GROUP BY 1, 2)
SELECT window_end, url, cnt, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY window_end ORDER BY cnt DESC, url) AS rank
  FROM counts
) WHERE rank <= 3
"""


@register("hot_pages_topn", oracle=_HOT_PAGES_ORACLE, tags=("A3", "R2", "P2"))
def hot_pages_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 hot URLs per 10 min window sliding 1 min.

    Reference: networkflow/analysis/NetworkFlowTopNPage_经典演示迟到数据.scala:52-70
    (keyBy url → 10m/5s window count → MapState/dual-timer top-3). The
    MapState idempotent-upsert machinery (:99-176) existed only to make
    late re-fires safe; batch recomputation removes the hazard. Slide
    scaled 5s→1min for the testdata's 30-day span. URL derived
    deterministically from user_id (testdata has no url column).
    Two-stage sliding count (tumble to 1-min buckets, roll 10 into each
    window): exchange 1 carries (url, bucket) partials, 10× fewer
    groups than the ``window()`` expand ships.
    """
    events = load_table(spark, "events", sf_dir)
    src = events.filter(F.col("event_type").isin("view", "click")).select(
        F.concat(F.lit("/page/"), (F.col("user_id") % 20).cast("string")).alias("url"),
        "ts",
    )
    counts = sliding_count_two_stage(src, "ts", 600, 60, keys=["url"])
    return topn_per_group(counts, ["window_end"], "cnt", 3, tiebreakers=["url"]).select(
        "window_end", "url", "cnt", "rank"
    )


# ---------------------------------------------------------------------------
# networkflow: hourly PV / UV
# (PageView.scala — A4; UniqueVisitor_01/02 — A8/A9; UniqueVisitor_03_Bloom — A10)
# ---------------------------------------------------------------------------

_PV_ORACLE = f"""
SELECT {_TUMBLE_END.format(ts="ts", dur=3600)} AS window_end, count(*) AS cnt
FROM events WHERE event_type = 'view' GROUP BY 1
"""


@register("pv_hourly", oracle=_PV_ORACLE, tags=("A4",))
def pv_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly page-view count (1 h tumbling).

    Reference: networkflow/analysis/PageView.scala:41-52 — which
    manually salts the constant key into 4 random subkeys and re-merges
    per windowEnd with keyed state (:63-109) to dodge the single-reducer
    bottleneck. Spark's HashAggregate does partial (map-side) + final
    aggregation natively, so the salting stage is deliberately absent.
    """
    events = load_table(spark, "events", sf_dir)
    return windowed_agg(
        events.filter(F.col("event_type") == "view"),
        "ts",
        "1 hour",
        aggs=[F.count("*").alias("cnt")],
    ).select("window_end", "cnt")


_UV_ORACLE = f"""
SELECT {_TUMBLE_END.format(ts="ts", dur=3600)} AS window_end,
       count(DISTINCT user_id) AS uv
FROM events WHERE event_type = 'view' GROUP BY 1
"""


@register("uv_hourly", oracle=_UV_ORACLE, tags=("A8", "A9"))
def uv_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly unique visitors — exact windowed COUNT DISTINCT.

    Reference: networkflow/analysis/UniqueVisitor_01_Set.scala:34-61
    (full-window Set buffer at parallelism 1) and
    UniqueVisitor_02_Set.scala:41-72 (incremental Set accumulator).
    Spark expands countDistinct to a two-phase distinct aggregate
    (partial per-partition dedup → final) automatically — the
    incremental/mergeable concern is built in.
    """
    events = load_table(spark, "events", sf_dir)
    return windowed_agg(
        events.filter(F.col("event_type") == "view"),
        "ts",
        "1 hour",
        aggs=[F.countDistinct("user_id").alias("uv")],
    ).select("window_end", "uv")


@register("uv_hourly_approx", oracle=None, tags=("A10",))
def uv_hourly_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly unique visitors — approximate (HyperLogLog++).

    Reference: networkflow/analysis/UniqueVisitor_03_Bloom.scala:44-176 —
    a hand-rolled Bloom filter over a 2^30-bit Redis bitmap with a
    per-element FIRE_AND_PURGE trigger. ``approx_count_distinct`` (HLL++,
    2% rsd here) is strictly better: mergeable, bounded-memory, no
    external store. No SQL oracle: HLL estimates are engine-specific
    (driver records the rows-only check); exactness is covered by
    ``uv_hourly``.
    """
    events = load_table(spark, "events", sf_dir)
    return windowed_agg(
        events.filter(F.col("event_type") == "view"),
        "ts",
        "1 hour",
        aggs=[F.approx_count_distinct("user_id", 0.02).alias("uv_approx")],
    ).select("window_end", "uv_approx")


_KMV_K = 32
_KMV_M = 1 << 28  # h28 hash space


def _uv_kmv_sql(engine: str) -> str:
    """KMV (k-minimum-values) distinct sketch per DAILY window, with
    its error against the exact count as a measured output column.

    Unlike HLL (engine-specific registers → rows-only checkable, see
    ``uv_hourly_approx``), a KMV sketch is EXACTLY oracle-able: the
    sketch is the k=32 smallest 28-bit md5 hashes of the distinct user
    ids, and the estimator ``(k-1) * M / h_(k)`` (h_(k) = k-th smallest
    hash, M = 2^28) is pure integer-derived arithmetic both engines
    compute bit-identically. Windows holding fewer than k=32 distinct
    hashes are exact by construction (the sketch IS the value set).
    Daily tumble + k=32 makes BOTH branches externally exercised:
    sf0.001 days hold <32 distinct viewers (exact branch), sf0.01+
    days hold >=42 (estimator branch) — the driver checks at sf0.01.

    100 TB shape: bottom-k of a hash is an associative, mergeable
    partial aggregate — each partition keeps its k smallest, merges
    keep the k smallest of the union (the same two-phase shape Spark
    already runs for countDistinct, but with O(k) state instead of
    O(distinct)). Here the per-window k-th order statistic comes from
    one rank over the DISTINCT hashes — the per-window distinct set is
    already the shuffle countDistinct pays; the sketch adds no extra
    pass. The error column makes the k/M accuracy trade-off a measured
    quantity (same evaluation-layer discipline as ``ann_ivf_recall``
    and ``minhash_jaccard_error``).
    """
    from flink_wsr_project_spark.operators.dedup import h28

    k, m = _KMV_K, _KMV_M
    str_t = "STRING" if engine == "spark" else "VARCHAR"
    if engine == "spark":
        wend = "(CAST(floor(unix_timestamp(ts)) AS BIGINT) div 86400) * 86400 + 86400"
    else:
        wend = _TUMBLE_END.format(ts="ts", dur=86400)
    h = h28(f"concat('uv:', CAST(user_id AS {str_t}))", engine)
    return f"""
WITH src AS (
  SELECT {wend} AS window_end, user_id FROM events WHERE event_type = 'view'
),
exact AS (SELECT window_end, count(DISTINCT user_id) AS uv_exact FROM src GROUP BY window_end),
hashes AS (SELECT DISTINCT window_end, {h} AS h FROM src),
ranked AS (
  SELECT window_end, h,
         row_number() OVER (PARTITION BY window_end ORDER BY h) AS rn,
         count(*) OVER (PARTITION BY window_end) AS n_hashes
  FROM hashes
),
est AS (
  SELECT window_end,
         CASE WHEN n_hashes < {k} THEN n_hashes
              ELSE CAST(FLOOR({(k - 1) * m} * 1.0 / h) AS BIGINT) END AS uv_kmv
  FROM ranked
  WHERE rn = CASE WHEN n_hashes < {k} THEN n_hashes ELSE {k} END
)
SELECT e.window_end AS window_end, e.uv_exact AS uv_exact, s.uv_kmv AS uv_kmv,
       ABS(s.uv_kmv - e.uv_exact) AS abs_err
FROM exact e JOIN est s ON e.window_end = s.window_end
"""


@register(
    "uv_daily_kmv",
    oracle=_uv_kmv_sql("duckdb"),
    doc=_uv_kmv_sql.__doc__,
    tags=("A10", "sketch", "evaluation"),
)
def uv_daily_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, "events", sf_dir).createOrReplaceTempView("events")
    return spark.sql(_uv_kmv_sql("spark"))


# ---------------------------------------------------------------------------
# market: app-marketing counts by channel/behavior + total
# (AppMarketingByChannel.scala — A5; AppMarketingAllChannel.scala — A6)
# ---------------------------------------------------------------------------

_MARKET_CHANNEL_ORACLE = f"""
WITH hopped AS ({_hop_expand(300, 3600, where="event_type <> 'error'")})
SELECT window_end - 3600 AS window_start, window_end,
       event_type AS channel, count(*) AS cnt
FROM hopped GROUP BY 1, 2, 3
"""


@register("market_by_channel", oracle=_MARKET_CHANNEL_ORACLE, tags=("A5",))
def market_by_channel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Install/click counts per (channel) per 1 h window sliding 5 min.

    Reference: market/AppMarketingByChannel.scala:28-57 (filter
    UNINSTALL — here: event_type <> 'error' — → keyBy (channel,
    behavior) → 1h/5s window →
    full-window ProcessWindowFunction counting elements.size). Spark:
    tumble-then-roll two-stage sliding count (same builder as
    hot_items_topn — exchange 1 carries one (channel, 5-min bucket)
    partial per group, 12× fewer rows than the naive ``window()``
    expand ships; the r1-r4 naive-expand form crept to 1.32× baseline
    and was replaced in r5). event_type plays the channel role;
    windowStart is emitted like the reference's MarketCount (:60-64).
    """
    events = load_table(spark, "events", sf_dir).filter(F.col("event_type") != "error")
    counts = sliding_count_two_stage(
        events, "ts", 3600, 300, keys=[F.col("event_type").alias("channel")]
    )
    return counts.select(
        (F.col("window_end") - 3600).alias("window_start"), "window_end", "channel", "cnt"
    )


_MARKET_TOTAL_ORACLE = f"""
WITH hopped AS ({_hop_expand(300, 3600)})
SELECT window_end, count(*) AS cnt FROM hopped GROUP BY 1
"""


@register("market_total", oracle=_MARKET_TOTAL_ORACLE, tags=("A6", "P5"))
def market_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total marketing events per 1 h window sliding 5 min (no key).

    Reference: market/AppMarketingAllChannel.scala:26-57 — maps every
    row to a constant ("total", 1) key then window-counts. Spark: a
    global windowed count; the constant key is unnecessary (partial
    aggregation removes the single-reducer bottleneck, SURVEY §4 O2).
    Two-stage tumble-then-roll (r5, with market_by_channel): the
    keyless form benefits identically — exchange 1 carries one row per
    5-min bucket partial instead of 12 window replicas per raw row.
    """
    events = load_table(spark, "events", sf_dir)
    return sliding_count_two_stage(events, "ts", 3600, 300).select("window_end", "cnt")


_VALUE_STATS_ORACLE = f"""
SELECT {_TUMBLE_END.format(ts="ts", dur=3600)} AS window_end, event_type,
       sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS sum_value,
       sum(CAST(round(value * 100) AS BIGINT)) / count(*) / 100.0 AS avg_value,
       count(*) AS cnt
FROM events GROUP BY 1, 2
"""


@register("value_stats_hourly", oracle=_VALUE_STATS_ORACLE, tags=("A11",))
def value_stats_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly sum/avg of the value measure per event_type.

    Reference: hotItems/HotItems.scala:116-128 (didactic (sum,count)
    AVG accumulator). Spark's sum/avg are built-in; double measures go
    through integer-cents (operators.windows.cents) so the sums are
    order-independent and bit-exact vs the oracle.
    """
    events = load_table(spark, "events", sf_dir)
    out = windowed_agg(
        events,
        "ts",
        "1 hour",
        keys=["event_type"],
        aggs=[
            money_sum("value", "sum_value"),
            (F.sum((F.round(F.col("value") * 100)).cast("long")) / F.count("*") / 100.0).alias(
                "avg_value"
            ),
            F.count("*").alias("cnt"),
        ],
    )
    return out.select("window_end", "event_type", "sum_value", "avg_value", "cnt")


# ---------------------------------------------------------------------------
# market: ad clicks by province + click-fraud blacklist
# (AdAnalysisByProvince_BlackList.scala — A7; z_FilterBlackListUser.scala — C5)
# ---------------------------------------------------------------------------

_AD_PROVINCE_ORACLE = """
SELECT (CAST(floor(epoch(o_orderdate)) AS BIGINT) // 2592000) * 2592000 + 2592000 AS window_end,
       n_name AS province, count(*) AS cnt
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY 1, 2
"""


@register("ad_clicks_by_province", oracle=_AD_PROVINCE_ORACLE, tags=("A7", "A1"))
def ad_clicks_by_province(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-province windowed counts (30-day tumble on orders, nation as
    province) — the star-schema analogue of ad-click-by-province.

    Reference: market/AdAnalysisByProvince_BlackList.scala:41-52
    (keyBy province → 1h/5s window count). Here the categorical key
    comes from a dimension join; nation (25 rows) and customer are
    broadcast so the only shuffle is the final aggregation.
    """
    orders = load_table(spark, "orders", sf_dir)
    customer = load_table(spark, "customer", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    joined = (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .select(F.col("o_orderdate").alias("ts"), F.col("n_name").alias("province"))
    )
    return windowed_agg(
        joined, "ts", "30 days", keys=["province"], aggs=[F.count("*").alias("cnt")]
    ).select("window_end", "province", "cnt")


_BLACKLIST_WARN_ORACLE = """
SELECT user_id, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       count(*) AS click_count,
       'WARNING: click count over 3 today' AS msg
FROM events WHERE event_type = 'click'
GROUP BY 1, 2 HAVING count(*) > 3
"""


@register("blacklist_warnings", oracle=_BLACKLIST_WARN_ORACLE, tags=("C5",))
def blacklist_warnings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click-fraud blacklist warnings: users exceeding N clicks on one
    day (threshold 3, scaled from the reference's 100 to the testdata's
    click density).

    Reference: market/z_FilterBlackListUser.scala:8-43 — per-(user,ad)
    ValueState counter, one-time side-output warning past 100, cleared
    by a processing-time midnight timer (:20-22). Batch form re-keys on
    the event date (deterministic daily reset — SURVEY §7.4.5) and the
    side output becomes a HAVING filter.
    """
    events = load_table(spark, "events", sf_dir)
    return (
        events.filter(F.col("event_type") == "click")
        .groupBy(
            "user_id", F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias("day")
        )
        .agg(F.count("*").alias("click_count"))
        .filter(F.col("click_count") > 3)
        .withColumn("msg", F.lit("WARNING: click count over 3 today"))
        .select("user_id", "day", "click_count", "msg")
    )


_BLACKLIST_FILTER_ORACLE = """
SELECT event_id, user_id, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, rn
FROM (
  SELECT event_id, user_id, ts,
         row_number() OVER (PARTITION BY user_id, date_trunc('day', ts)
                            ORDER BY ts, event_id) AS rn
  FROM events WHERE event_type = 'click'
) WHERE rn <= 3
"""


@register("blacklist_filtered_clicks", oracle=_BLACKLIST_FILTER_ORACLE, tags=("C5",))
def blacklist_filtered_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pass-through side of the blacklist: at most the first 3
    clicks per (user, day) survive.

    Reference: the suppress path of z_FilterBlackListUser.scala:25-34
    (count ≤ threshold → collect, else drop). Batch: row_number over
    (user, day) ordered by (ts, event_id).
    """
    events = load_table(spark, "events", sf_dir)
    w = W.partitionBy("user_id", F.date_trunc("day", F.col("ts"))).orderBy("ts", "event_id")
    return (
        events.filter(F.col("event_type") == "click")
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select(
            "event_id",
            "user_id",
            F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias("day"),
            "rn",
        )
    )


# ---------------------------------------------------------------------------
# loginmonitor: consecutive login failures within a bound
# (LoginFail_CEP.scala — C1 strict contiguity; LoginFail.scala — C2)
# ---------------------------------------------------------------------------

_LOGIN_FAIL_ORACLE = """
SELECT user_id,
       CAST(floor(epoch(prev_ts)) AS BIGINT) AS first_fail,
       CAST(floor(epoch(ts)) AS BIGINT) AS last_fail,
       'login fail 2 times in 30min' AS msg
FROM (
  SELECT user_id, event_type, ts,
         lag(event_type) OVER w AS prev_type,
         lag(ts) OVER w AS prev_ts
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
WHERE event_type = 'error' AND prev_type = 'error'
  AND epoch(ts) - epoch(prev_ts) <= 1800
"""


@register("login_fail_detect", oracle=_LOGIN_FAIL_ORACLE, tags=("C1", "C2"))
def login_fail_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two *consecutive* failures per user within 30 min → warning.

    Reference: loginmonitor/LoginFail_CEP.scala:31-46 —
    ``Pattern.begin("firstFail").next("secondFail").within(2 s)`` (strict
    contiguity: `next`, not `followedBy`). The hand-rolled twin
    (LoginFail.scala:38-98) under-reports on interleaved successes —
    the CEP semantics are authoritative (SURVEY §2.9 Q3). Batch: lag()
    per user ordered by (ts, event_id); strict adjacency = consecutive
    rows. Bound scaled 2s→30min for testdata density; 'error' plays
    'fail'.
    """
    events = load_table(spark, "events", sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = (
        events.withColumn("prev_type", F.lag("event_type").over(w))
        .withColumn("prev_ts", F.lag("ts").over(w))
        .filter(
            (F.col("event_type") == "error")
            & (F.col("prev_type") == "error")
            & (epoch_double("ts") - epoch_double("prev_ts") <= 1800)
        )
    )
    return flagged.select(
        "user_id",
        epoch_seconds("prev_ts").alias("first_fail"),
        epoch_seconds("ts").alias("last_fail"),
        F.lit("login fail 2 times in 30min").alias("msg"),
    )


# ---------------------------------------------------------------------------
# orderpay_detect: order-timeout detection
# (OrderTimeout_CEP.scala — C3; OrderTimeout_PF.scala — C4 four-label variant)
# ---------------------------------------------------------------------------

_ORDER_TIMEOUT_ORACLE = """
SELECT user_id,
       CAST(floor(epoch(min(ts) FILTER (event_type = 'signup'))) AS BIGINT) AS create_ts,
       CAST(floor(epoch(min(ts) FILTER (event_type = 'purchase'))) AS BIGINT) AS pay_ts,
       CASE
         WHEN count(*) FILTER (event_type = 'purchase') = 0 THEN 'order timeout'
         WHEN count(*) FILTER (event_type = 'signup') = 0
           THEN 'already payed but not found created log'
         WHEN epoch(min(ts) FILTER (event_type = 'purchase'))
              <= epoch(min(ts) FILTER (event_type = 'signup')) + 86400
           THEN 'payed successfully'
         ELSE 'payed but already timeout'
       END AS status
FROM events
WHERE event_type IN ('signup', 'purchase')
GROUP BY user_id
"""


@register("order_timeout", oracle=_ORDER_TIMEOUT_ORACLE, tags=("C3", "C4"))
def order_timeout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Created-but-unpaid detection with the process-function variant's
    four outcome labels.

    Reference: orderpay_detect/OrderTimeout_CEP.scala:35-57 (CEP
    create→pay within 15 s, timeout side output) and
    OrderTimeout_PF.scala:50-131 (ValueState machine handling
    pay-before-create; 15 min deadline at :85; the four labels at
    :72-115). Batch: conditional min-FILTER aggregation per key
    reproduces all outcomes in one pass. events analogue: per user_id,
    'signup' plays create, 'purchase' plays pay; deadline 1 day.
    """
    events = load_table(spark, "events", sf_dir)
    sig = F.min(F.when(F.col("event_type") == "signup", F.col("ts")))
    pay = F.min(F.when(F.col("event_type") == "purchase", F.col("ts")))
    n_sig = F.count(F.when(F.col("event_type") == "signup", 1))
    n_pay = F.count(F.when(F.col("event_type") == "purchase", 1))
    agg = (
        events.filter(F.col("event_type").isin("signup", "purchase"))
        .groupBy("user_id")
        .agg(
            epoch_seconds(sig).alias("create_ts"),
            epoch_seconds(pay).alias("pay_ts"),
            n_sig.alias("_ns"),
            n_pay.alias("_np"),
            epoch_double(sig).alias("_sig_d"),
            epoch_double(pay).alias("_pay_d"),
        )
    )
    status = (
        F.when(F.col("_np") == 0, "order timeout")
        .when(F.col("_ns") == 0, "already payed but not found created log")
        .when(F.col("_pay_d") <= F.col("_sig_d") + 86400, "payed successfully")
        .otherwise("payed but already timeout")
    )
    return agg.select("user_id", "create_ts", "pay_ts", status.alias("status"))


# ---------------------------------------------------------------------------
# orderpay_detect: pay ↔ receipt reconciliation
# (OrderPayTxMatch_2Flow_Join.scala — J1 interval join;
#  OrderPayTxMatch_2Flow_Co.scala — J2 full-outer match + unmatched channels)
# ---------------------------------------------------------------------------

_TX_INTERVAL_JOIN_ORACLE = """
SELECT o_orderkey AS order_id, l_linenumber AS line_no,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       strftime(l_shipdate, '%Y-%m-%d') AS ship_date,
       CAST(round(l_extendedprice * 100) AS BIGINT) / 100.0 AS amount
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= o_orderdate
  AND l_shipdate <= o_orderdate + INTERVAL 30 DAY
"""


@register("tx_interval_join", oracle=_TX_INTERVAL_JOIN_ORACLE, tags=("J1",))
def tx_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (time-range) equi-join: ship events within [create,
    create+30 d] of their order.

    Reference: orderpay_detect/OrderPayTxMatch_2Flow_Join.scala:46-66 —
    ``orderEvents.keyBy(txId).intervalJoin(receiptEvents).between(-3s, +5s)``.
    Spark: equi-join on the key + range predicate; Catalyst plans a
    single shuffle on the equi-key with the range as a post-join filter
    (no nested-loop). orders/lineitem play pay/receipt.
    """
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    j = orders.join(li, orders.o_orderkey == li.l_orderkey).filter(
        (F.col("l_shipdate") >= F.col("o_orderdate"))
        & (F.col("l_shipdate") <= F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
    )
    return j.select(
        F.col("o_orderkey").alias("order_id"),
        F.col("l_linenumber").alias("line_no"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_date"),
        ((F.round(F.col("l_extendedprice") * 100)).cast("long") / 100.0).alias("amount"),
    )


# ---------------------------------------------------------------------------
# networkflow: late-data classification (L2/L3 batch reproduction)
# ---------------------------------------------------------------------------

# Arrival-order prefix-max segment width (event_id units). Each task scans
# at most one segment; the segment directory is |events| / width rows.
_LATE_SEGMENT_WIDTH = 100_000

_LATE_DATA_ORACLE = """
WITH w AS (
  SELECT event_id, user_id, ts,
         max(ts) OVER (ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS max_ts
  FROM events
)
SELECT event_id, user_id,
       CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch,
       CASE
         WHEN epoch(ts) >= epoch(max_ts) - 60 THEN 'on_time'
         WHEN epoch(ts) >= epoch(max_ts) - 120 THEN 'late_within_lateness'
         ELSE 'too_late_side_output'
       END AS lateness
FROM w
"""


@register("late_data_classify", oracle=_LATE_DATA_ORACLE, tags=("L1", "L2", "L3"))
def late_data_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch reproduction of the watermark / allowedLateness / side-output
    trichotomy.

    Reference: NetworkFlowTopNPage_经典演示迟到数据.scala:43-58 — 1 s
    bounded out-of-orderness watermark, allowedLateness(1 min),
    sideOutputLateData. Arrival order = event_id; the running-max ts is
    the watermark source. Rows within watermark−60 s are on time, within
    the extra lateness window they re-fire aggregates (L2), and beyond
    it they'd hit the late side output (L3). Bounds scaled (60/120 s)
    to testdata density. Streaming policy: SURVEY §7.4.1 — lateness
    folds into the watermark (streaming/windows.py).

    Scale: the arrival-order running max is a prefix scan, which a
    single unpartitioned window would serialize onto one task. Instead
    it is computed segmented: a per-segment running max (partitioned
    window over contiguous event_id ranges), a tiny per-segment max
    table whose exclusive prefix-max is taken over |segments| rows, and
    a broadcast join back — the classic two-level scan decomposition,
    so no stage ever holds more than one segment or the segment
    directory.
    """
    events = load_table(spark, "events", sf_dir)
    seg = (F.col("event_id") / F.lit(_LATE_SEGMENT_WIDTH)).cast("long").alias("seg")
    within_w = (
        W.partitionBy("seg").orderBy("event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    within = events.select("*", seg).withColumn(
        "seg_run_max", F.max("ts").over(within_w)
    )
    seg_max = within.groupBy("seg").agg(F.max("ts").alias("seg_max"))
    # Exclusive prefix max over the segment directory (|segments| rows —
    # a one-group non-foldable key keeps the plan free of unpartitioned
    # WindowExec; see operators.topn.one_group).
    from flink_wsr_project_spark.operators.topn import one_group

    prefix_w = (
        W.partitionBy(one_group("seg")).orderBy("seg")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    prefix = seg_max.select(
        "seg", F.max("seg_max").over(prefix_w).alias("prev_max")
    )
    classified = within.join(F.broadcast(prefix), "seg").withColumn(
        "max_ts",
        F.greatest("seg_run_max", F.coalesce("prev_max", "seg_run_max")),
    )
    lateness = (
        F.when(epoch_double("ts") >= epoch_double("max_ts") - 60, "on_time")
        .when(epoch_double("ts") >= epoch_double("max_ts") - 120, "late_within_lateness")
        .otherwise("too_late_side_output")
    )
    return classified.select(
        "event_id", "user_id", epoch_seconds("ts").alias("ts_epoch"), lateness.alias("lateness")
    )


_TX_RECONCILE_ORACLE = """
WITH pays AS (
  SELECT o_orderkey AS order_id, o_orderdate FROM orders WHERE o_orderstatus <> 'F'
),
receipts AS (
  SELECT l_orderkey AS order_id, min(l_shipdate) AS first_ship, count(*) AS n_lines
  FROM lineitem GROUP BY 1
)
SELECT coalesce(p.order_id, r.order_id) AS order_id,
       CASE WHEN p.order_id IS NULL THEN 'unmatched receipt'
            WHEN r.order_id IS NULL THEN 'unmatched pay'
            ELSE 'matched' END AS status,
       strftime(p.o_orderdate, '%Y-%m-%d') AS order_date,
       strftime(r.first_ship, '%Y-%m-%d') AS first_ship,
       coalesce(r.n_lines, 0) AS n_lines
FROM pays p FULL OUTER JOIN receipts r ON p.order_id = r.order_id
"""


@register("tx_reconcile", oracle=_TX_RECONCILE_ORACLE, tags=("J2", "K4"))
def tx_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stream full-outer reconciliation with unmatched side channels.

    Reference: orderpay_detect/OrderPayTxMatch_2Flow_Co.scala:48-124 —
    connect + CoProcessFunction buffering each side in ValueState,
    emitting matches on the main output and per-side timeout timers to
    'unmatched-pays'/'unmatched-receipts' side outputs. Batch: full
    outer join; NULL sides *are* the unmatched channels, labeled in one
    status column (split into three DataFrames by filter if separate
    sinks are wanted — operators expose exactly that in streaming/).
    Non-final orders play pays; per-order lineitem rollups play receipts.
    """
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    pays = orders.filter(F.col("o_orderstatus") != "F").select(
        F.col("o_orderkey").alias("p_order_id"), "o_orderdate"
    )
    receipts = li.groupBy(F.col("l_orderkey").alias("r_order_id")).agg(
        F.min("l_shipdate").alias("first_ship"), F.count("*").alias("n_lines")
    )
    j = pays.join(receipts, pays.p_order_id == receipts.r_order_id, "full_outer")
    status = (
        F.when(F.col("p_order_id").isNull(), "unmatched receipt")
        .when(F.col("r_order_id").isNull(), "unmatched pay")
        .otherwise("matched")
    )
    return j.select(
        F.coalesce("p_order_id", "r_order_id").alias("order_id"),
        status.alias("status"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        F.date_format("first_ship", "yyyy-MM-dd").alias("first_ship"),
        F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
    )


@register("hot_items_topn_expand", oracle=_HOT_ITEMS_ORACLE, tags=("A2", "R1", "opt"))
def hot_items_topn_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-expand variant of ``hot_items_topn`` (same oracle, same
    rows) using the built-in ``window(ts, '1 hour', '5 minutes')``
    sliding window: every raw row is replicated into its 12 windows
    BEFORE the partial aggregate, so exchange 1 carries (item, window)
    groups — 12× the volume of the headline's tumble-then-roll plan.
    Kept registered as the reference shape for the built-in API; use
    the headline for anything at scale."""
    events = load_table(spark, "events", sf_dir)
    counts = windowed_agg(
        events.filter(F.col("event_type") == "view"),
        "ts",
        "1 hour",
        "5 minutes",
        keys=[F.col("user_id").alias("item_id")],
        aggs=[F.count("*").alias("cnt")],
    )
    return topn_per_group(counts, ["window_end"], "cnt", 5, tiebreakers=["item_id"]).select(
        "window_end", "item_id", "cnt", "rank"
    )


_KV_STATE_ORACLE = """
WITH keyed AS (
  SELECT CAST(user_id AS VARCHAR) || '|' || event_type AS kv_key,
         (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600 + 3600 AS window_end
  FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
)
SELECT kv_key,
       CAST(count(*) AS VARCHAR) AS kv_value,
       count(DISTINCT window_end) AS n_upsert_epochs
FROM keyed GROUP BY kv_key
"""


@register("kv_upsert_final_state", oracle=_KV_STATE_ORACLE, tags=("K3",))
def kv_upsert_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final external-KV state under the K3 sink's upsert contract —
    the batch materialization of what ``streaming.sinks.external_kv_sink_distributed``
    leaves in the store after all micro-batches: one row per key with
    the LAST written value (update-mode re-fires and failure replays
    OVERWRITE, never duplicate — the reference's Redis ``hset``
    discipline, UniqueVisitor_03_Bloom.scala:136-149).

    Keys use the sink's exact serialization (``'|'.join(key_cols)``)
    and values its ``str(value)``; for a running count per
    (user_id, event_type) the last write IS the total, so the final
    state is exactly this one hash aggregate. ``n_upsert_epochs``
    (distinct active hours) is the number of times the key's row would
    be rewritten under hourly re-fires — the write churn the upsert
    contract absorbs that an append-style sink would duplicate.
    tests/test_streaming.py::test_kv_sink_final_state_matches_batch
    drives the REAL sink over multiple micro-batches against a
    DictStore and asserts its final state equals this query row-for-row.

    100 TB shape: one hash shuffle on the composite key; the distinct
    epoch count rides the standard two-phase distinct aggregate. The
    sink side stays bounded because update-mode output per trigger is
    |changed groups|, not |input rows|.
    """
    events = load_table(spark, "events", sf_dir)
    hour_end = (F.floor(epoch_seconds(F.col("ts")) / 3600) * 3600 + 3600).cast("long")
    # NULL key columns are excluded in BOTH engines: the sink's
    # '|'.join cannot serialize None (it raises), Spark's concat_ws
    # SKIPS NULL fields while DuckDB's || NULL-propagates — three
    # different behaviors, so the only consistent contract is "a row
    # with a NULL key column never reaches the KV store". Pinned by
    # tests/test_synthetic_parity.py::test_kv_upsert_null_key_rows_excluded.
    return (
        events.filter(F.col("user_id").isNotNull() & F.col("event_type").isNotNull())
        .select(
            F.concat_ws("|", F.col("user_id"), F.col("event_type")).alias("kv_key"),
            hour_end.alias("window_end"),
        )
        .groupBy("kv_key")
        .agg(
            F.count("*").cast("string").alias("kv_value"),
            F.countDistinct("window_end").alias("n_upsert_epochs"),
        )
    )
