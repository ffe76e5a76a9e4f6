"""Job-level entry points — one per reference job, same inputs.

A user of the reference runs Scala mains over replay CSVs
(UserBehavior.csv, apache.log, AdClickLog.csv, LoginLog.csv,
OrderLog.csv, ReceiptLog.csv). These functions are the drop-in
equivalents: same file formats, same constants, same outputs — but
declarative Spark plans instead of hand-rolled keyed-state operators.

Batch-first (finite replay files — exactly what the reference jobs
consume); every building block here (parse_csv_lines, windowed_agg,
topn_per_group) is the same code the streaming layer composes with
readStream, so the streaming form of each job is the same expression
logic behind ``withWatermark`` (see flink_wsr_project_spark.streaming).

Reference mains (all under /root/reference/src/main/scala/com/hong/):
hotItems/HotItems.scala, networkflow/analysis/{NetworkFlowTopNPage…,
PageView,UniqueVisitor_*}.scala, market/{AppMarketingByChannel,
AdAnalysisByProvince_BlackList}.scala, loginmonitor/LoginFail*.scala,
orderpay_detect/{OrderTimeout_*,OrderPayTxMatch_*}.scala.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from flink_wsr_project_spark import schemas
from flink_wsr_project_spark.operators.topn import topn_per_group
from flink_wsr_project_spark.operators.windows import epoch_seconds, windowed_agg
from flink_wsr_project_spark.sources.readers import (
    epoch_to_ts,
    parse_apache_log_lines,
    parse_csv_lines,
)


def _read_csv(spark: SparkSession, path: str, schema) -> DataFrame:
    """S2 text-file source + P1 typed CSV parse (shared with the Kafka
    and socket paths, which feed the same one-string-column shape)."""
    return parse_csv_lines(spark.read.text(path), schema)


# ---------------------------------------------------------------------------
# hotItems — HotItems.scala:42-85 (A2 + R1): top-5 items / 1 h window / 5 min
# ---------------------------------------------------------------------------


def hot_items(spark: SparkSession, user_behavior_csv: str, n: int = 5) -> DataFrame:
    """filter 'pv' → sliding 1 h/5 min count per item → top-N per window."""
    ub = _read_csv(spark, user_behavior_csv, schemas.USER_BEHAVIOR)
    counts = windowed_agg(
        ub.filter(F.col("behavior") == "pv").withColumn("ts", epoch_to_ts("ts_epoch")),
        "ts",
        "1 hour",
        "5 minutes",
        keys=["item_id"],
        aggs=[F.count("*").alias("cnt")],
    )
    return topn_per_group(counts, ["window_end"], "cnt", n, tiebreakers=["item_id"]).select(
        "window_end", "item_id", "cnt", "rank"
    )


# ---------------------------------------------------------------------------
# networkflow — NetworkFlowTopNPage…scala (A3 + R2): top-3 urls / 10 min / 5 s
# ---------------------------------------------------------------------------


def hot_pages(spark: SparkSession, apache_log_path: str, n: int = 3) -> DataFrame:
    logs = parse_apache_log_lines(spark.read.text(apache_log_path))
    counts = windowed_agg(
        logs,
        "event_time",
        "10 minutes",
        "5 seconds",
        keys=["url"],
        aggs=[F.count("*").alias("cnt")],
    )
    return topn_per_group(counts, ["window_end"], "cnt", n, tiebreakers=["url"]).select(
        "window_end", "url", "cnt", "rank"
    )


# ---------------------------------------------------------------------------
# networkflow — PageView.scala (A4) / UniqueVisitor_*.scala (A8-A10)
# ---------------------------------------------------------------------------


def page_view(spark: SparkSession, user_behavior_csv: str) -> DataFrame:
    """Hourly PV count. The reference's manual salt-and-remerge
    (PageView.scala:42-68) is subsumed by partial aggregation."""
    ub = _read_csv(spark, user_behavior_csv, schemas.USER_BEHAVIOR)
    return windowed_agg(
        ub.filter(F.col("behavior") == "pv").withColumn("ts", epoch_to_ts("ts_epoch")),
        "ts",
        "1 hour",
        aggs=[F.count("*").alias("cnt")],
    ).select("window_end", "cnt")


def unique_visitor(
    spark: SparkSession, user_behavior_csv: str, approx: bool = False, rsd: float = 0.01
) -> DataFrame:
    """Hourly UV. exact = UniqueVisitor_01/02 (Set state); approx =
    UniqueVisitor_03's Bloom-in-Redis intent via HyperLogLog++."""
    ub = _read_csv(spark, user_behavior_csv, schemas.USER_BEHAVIOR)
    agg = (
        F.approx_count_distinct("user_id", rsd) if approx else F.countDistinct("user_id")
    ).alias("uv")
    return windowed_agg(
        ub.filter(F.col("behavior") == "pv").withColumn("ts", epoch_to_ts("ts_epoch")),
        "ts",
        "1 hour",
        aggs=[agg],
    ).select("window_end", "uv")


# ---------------------------------------------------------------------------
# market — AppMarketingByChannel.scala (A5/A6)
# ---------------------------------------------------------------------------


def app_marketing_by_channel(
    spark: SparkSession, market_events: DataFrame, by_channel: bool = True
) -> DataFrame:
    """1 h/5 s sliding install/click counts, UNINSTALL dropped.
    ``market_events`` is any DataFrame in MARKET_USER_BEHAVIOR shape —
    batch, or the rate-source simulator (streaming.sources) live."""
    filtered = market_events.filter(F.col("behavior") != "UNINSTALL")
    keys = ["channel", "behavior"] if by_channel else []
    out = windowed_agg(
        filtered, "ts", "1 hour", "5 seconds", keys=keys, aggs=[F.count("*").alias("cnt")]
    )
    return out.select(
        (F.col("window_end") - 3600).alias("window_start"), "window_end", *keys, "cnt"
    )


# ---------------------------------------------------------------------------
# market — AdAnalysisByProvince_BlackList.scala (A7 + C5)
# ---------------------------------------------------------------------------


def ad_analysis_by_province(
    spark: SparkSession, ad_click_csv: str, click_threshold: int = 100
) -> dict[str, DataFrame]:
    """Returns the three outputs of the reference job: per-province
    windowed counts (blacklist-filtered), the blacklist warnings side
    output, and the filtered click stream itself.

    C5 batch form: clicks ranked per (user, ad, event-date); rank ≤
    threshold passes, the first row past it emits one warning. The
    reference's wall-clock midnight timer becomes the event-date key —
    deterministic and oracle-friendly (SURVEY §7.4.5)."""
    clicks = _read_csv(spark, ad_click_csv, schemas.AD_CLICK_EVENT).withColumn(
        "ts", epoch_to_ts("ts_epoch")
    )
    w = W.partitionBy("user_id", "ad_id", F.to_date("ts")).orderBy("ts", "city")
    ranked = clicks.withColumn("click_seq", F.row_number().over(w))
    passed = ranked.filter(F.col("click_seq") <= click_threshold)
    warnings = ranked.filter(F.col("click_seq") == click_threshold + 1).select(
        "user_id",
        "ad_id",
        F.lit(f"click over {click_threshold} times today").alias("msg"),
    )
    counts = windowed_agg(
        passed, "ts", "1 hour", "5 seconds", keys=["province"],
        aggs=[F.count("*").alias("cnt")],
    ).select("window_end", "province", "cnt")
    return {"counts": counts, "warnings": warnings, "filtered": passed.drop("click_seq")}


# ---------------------------------------------------------------------------
# loginmonitor — LoginFail_CEP.scala (C1): 2 consecutive fails within 2 s
# ---------------------------------------------------------------------------


def login_fail_warnings(
    spark: SparkSession, login_csv: str, within_s: int = 2
) -> DataFrame:
    """CEP ``fail next fail within 2s`` as a lag window: strictly
    consecutive per user (CEP `next` = adjacent rows), Δt ≤ within_s."""
    logins = _read_csv(spark, login_csv, schemas.LOGIN_EVENT)
    w = W.partitionBy("user_id").orderBy("ts_epoch", "ip")
    lagged = logins.select(
        "user_id",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lag("ts_epoch").over(w).alias("first_fail_ts"),
        F.col("event_type").alias("curr_type"),
        F.col("ts_epoch").alias("last_fail_ts"),
    )
    return lagged.filter(
        (F.col("prev_type") == "fail")
        & (F.col("curr_type") == "fail")
        & (F.col("last_fail_ts") - F.col("first_fail_ts") <= within_s)
    ).select(
        "user_id",
        "first_fail_ts",
        "last_fail_ts",
        F.lit("login fail 2 times in 2s").alias("warning_msg"),
    )


# ---------------------------------------------------------------------------
# orderpay_detect — OrderTimeout_PF.scala (C4): 15 min pay deadline, 4 labels
# ---------------------------------------------------------------------------


def order_timeout_results(
    spark: SparkSession, order_csv: str, timeout_s: int = 900
) -> DataFrame:
    """Per-order conditional aggregation reproducing the process
    function's four outcomes (OrderTimeout_PF.scala:50-131):
    payed successfully / payed but already timeout / payed without
    create / order timeout."""
    orders = _read_csv(spark, order_csv, schemas.ORDER_EVENT)
    per_order = orders.groupBy("order_id").agg(
        F.min(F.when(F.col("event_type") == "create", F.col("ts_epoch"))).alias("create_ts"),
        F.min(F.when(F.col("event_type") == "pay", F.col("ts_epoch"))).alias("pay_ts"),
    )
    return per_order.select(
        "order_id",
        "create_ts",
        "pay_ts",
        F.when(
            F.col("create_ts").isNotNull()
            & F.col("pay_ts").isNotNull()
            & (F.col("pay_ts") <= F.col("create_ts") + timeout_s),
            "payed successfully",
        )
        .when(
            F.col("create_ts").isNotNull()
            & F.col("pay_ts").isNotNull()
            & (F.col("pay_ts") > F.col("create_ts") + timeout_s),
            "payed but already timeout",
        )
        .when(
            F.col("create_ts").isNull() & F.col("pay_ts").isNotNull(),
            "already payed but not found created log",
        )
        .otherwise("order timeout")
        .alias("result_msg"),
    )


# ---------------------------------------------------------------------------
# orderpay_detect — OrderPayTxMatch (J1/J2): pay ↔ receipt reconciliation
# ---------------------------------------------------------------------------


def tx_match(
    spark: SparkSession,
    order_csv: str,
    receipt_csv: str,
    lower_s: int = -3,
    upper_s: int = 5,
) -> dict[str, DataFrame]:
    """Interval-join matches plus both unmatched side outputs
    (OrderPayTxMatch_2Flow_Co.scala:48-124) from one full-outer join."""
    pays = (
        _read_csv(spark, order_csv, schemas.ORDER_EVENT)
        .filter((F.col("event_type") == "pay") & F.col("tx_id").isNotNull())
        .select("order_id", "tx_id", F.col("ts_epoch").alias("pay_ts"))
    )
    receipts = _read_csv(spark, receipt_csv, schemas.RECEIPT_EVENT).select(
        F.col("tx_id").alias("r_tx_id"),
        "pay_channel",
        F.col("ts_epoch").alias("receipt_ts"),
    )
    cond = (
        (pays.tx_id == receipts.r_tx_id)
        & (receipts.receipt_ts >= pays.pay_ts + lower_s)
        & (receipts.receipt_ts <= pays.pay_ts + upper_s)
    )
    joined = pays.join(receipts, cond, "full_outer")
    matched = joined.filter(
        F.col("tx_id").isNotNull() & F.col("r_tx_id").isNotNull()
    ).select("order_id", "tx_id", "pay_ts", "pay_channel", "receipt_ts")
    unmatched_pays = joined.filter(F.col("r_tx_id").isNull()).select(
        "order_id", "tx_id", "pay_ts"
    )
    unmatched_receipts = joined.filter(F.col("tx_id").isNull()).select(
        F.col("r_tx_id").alias("tx_id"), "pay_channel", "receipt_ts"
    )
    return {
        "matched": matched,
        "unmatched_pays": unmatched_pays,
        "unmatched_receipts": unmatched_receipts,
    }


# ---------------------------------------------------------------------------
# hotItems streaming form — the full reference chain under readStream
# (S2 stream → P1 parse → P6 watermark → A2 window agg → R1 rank)
# ---------------------------------------------------------------------------


def hot_items_stream(
    spark: SparkSession,
    csv_dir: str,
    sink,
    n: int = 5,
    watermark: str = "3 seconds",
):
    """Streaming hot-items: watch ``csv_dir`` for UserBehavior-format
    CSV files, maintain the sliding 1 h/5 min counts incrementally, and
    rank per micro-batch in foreachBatch (the reference's
    ListState+timer stage). ``sink(ranked_df, epoch_id)`` receives the
    top-N rows each trigger. Returns the StreamingQuery."""
    from flink_wsr_project_spark.streaming.topn import stream_topn
    from flink_wsr_project_spark.streaming.windows import streaming_windowed_agg

    lines = spark.readStream.text(csv_dir)
    ub = parse_csv_lines(lines, schemas.USER_BEHAVIOR)
    counts = streaming_windowed_agg(
        ub.filter(F.col("behavior") == "pv").withColumn("ts", epoch_to_ts("ts_epoch")),
        "ts",
        "1 hour",
        "5 minutes",
        keys=["item_id"],
        aggs=[F.count("*").alias("cnt")],
        watermark=watermark,
    )
    return stream_topn(
        counts, ["window_end"], "cnt", n, sink, tiebreakers=["item_id"],
        query_name="hot_items_stream",
    )


def unique_visitor_stream(
    spark: SparkSession,
    csv_dir: str,
    sink,
    bits: int = 1 << 20,
):
    """Streaming UV with the reference's EXACT per-element semantics:
    watch ``csv_dir`` for UserBehavior-format CSVs and emit one updated
    (window_end, uv) row per pv element through the Bloom-deduped
    FIRE_AND_PURGE operator (UniqueVisitor_03_Bloom.scala end-to-end —
    trigger `:62-92`, Bloom process fn `:96-154` — with the state store
    in place of Redis). ``sink(batch_df, epoch_id)`` receives the
    per-element emissions each trigger. Returns the StreamingQuery."""
    from flink_wsr_project_spark.streaming.stateful import uv_per_element_bloom

    lines = spark.readStream.text(csv_dir)
    ub = parse_csv_lines(lines, schemas.USER_BEHAVIOR)
    pv = ub.filter(F.col("behavior") == "pv").withColumn(
        "ts", epoch_to_ts("ts_epoch")
    ).select("user_id", "ts")
    out = uv_per_element_bloom(pv, bits=bits)
    return (
        out.writeStream.outputMode("append")
        .queryName("unique_visitor_stream")
        .foreachBatch(sink)
        .start()
    )
