"""Explicit schemas for every record type in the engine.

Two families:

1. The reference's record types (SURVEY.md §1.1) — Scala case classes in
   the reference (e.g. ``UserBehavior`` at
   ``/root/reference/src/main/scala/com/hong/hotItems/HotItems.scala:211-217``),
   declared here as ``StructType`` so CSV/Kafka sources parse without
   inference.
2. The driver testdata star schema (``/root/testdata/sf*/``), declared
   so streaming file sources (which require a schema) and tests share
   one definition.

Timestamps: the reference stores epoch seconds (sometimes ms) as Long
and multiplies at watermark assignment (``HotItems.scala:61``); here a
raw ``*_epoch`` Long column is parsed then normalized to TimestampType
via ``timestamp_seconds``/``timestamp_millis`` by the source readers.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Reference record types (epoch columns kept as Long; readers normalize)
# ---------------------------------------------------------------------------

# UserBehavior — HotItems.scala:211-217 (userId, itemId, categoryId, behavior, ts sec)
USER_BEHAVIOR = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("item_id", T.LongType(), False),
        T.StructField("category_id", T.IntegerType(), False),
        T.StructField("behavior", T.StringType(), False),
        T.StructField("ts_epoch", T.LongType(), False),
    ]
)

# ApacheLogEvent — NetworkFlowTopNPage…scala:178-182 (ip, userId, eventTime ms, method, url)
APACHE_LOG_EVENT = T.StructType(
    [
        T.StructField("ip", T.StringType(), False),
        T.StructField("user_id", T.StringType(), True),
        T.StructField("event_time", T.TimestampType(), False),
        T.StructField("method", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
    ]
)

# MarketUserBehavior — market/SimulateMarketEvenSource.scala:44-47
MARKET_USER_BEHAVIOR = T.StructType(
    [
        T.StructField("user_id", T.StringType(), False),
        T.StructField("behavior", T.StringType(), False),
        T.StructField("channel", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

# AdClickEvent — market/AdAnalysisByProvince_BlackList.scala:158-162
AD_CLICK_EVENT = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("ad_id", T.LongType(), False),
        T.StructField("province", T.StringType(), False),
        T.StructField("city", T.StringType(), False),
        T.StructField("ts_epoch", T.LongType(), False),
    ]
)

# LoginEvent — loginmonitor/LoginFail.scala:104
LOGIN_EVENT = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("ip", T.StringType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("ts_epoch", T.LongType(), False),
    ]
)

# OrderEvent — orderpay_detect/OrderTimeout_CEP.scala:102
ORDER_EVENT = T.StructType(
    [
        T.StructField("order_id", T.LongType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("tx_id", T.StringType(), True),
        T.StructField("ts_epoch", T.LongType(), False),
    ]
)

# ReceiptEvent — orderpay_detect/OrderPayTxMatch_2Flow_Co.scala:131
RECEIPT_EVENT = T.StructType(
    [
        T.StructField("tx_id", T.StringType(), False),
        T.StructField("pay_channel", T.StringType(), False),
        T.StructField("ts_epoch", T.LongType(), False),
    ]
)

# ---------------------------------------------------------------------------
# Driver testdata star schema (/root/testdata/sf*/)
# ---------------------------------------------------------------------------

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("value", T.DoubleType(), False),
        T.StructField("props", T.StringType(), True),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), False),
        T.StructField("label", T.IntegerType(), True),
    ]
)

# Multimodal assets: opaque binary payload + typed metadata (SURVEY.md §7 /
# driver mandate). No file exists in testdata; the streaming/multimodal
# plumbing synthesizes deterministic fakes with this schema.
MEDIA_ASSET = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
