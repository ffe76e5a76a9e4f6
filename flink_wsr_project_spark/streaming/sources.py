"""Streaming sources (SURVEY.md §2.1).

S4 — the market-event simulator. The reference's
``RichParallelSourceFunction`` emits a random MarketUserBehavior every
100 ms (``market/SimulateMarketEvenSource.scala:10-41``: UUID user,
behavior ∈ {CLICK, DOWNLOAD, INSTALL, UNINSTALL}, channel ∈ {appstore,
huweistore, weibo, wechat}). Spark: the ``rate`` source supplies
(timestamp, value) at a configured rows/sec; deterministic column
mapping turns it into the same schema — no custom Receiver needed, and
it scales by ``numPartitions`` instead of source parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

BEHAVIORS = ("CLICK", "DOWNLOAD", "INSTALL", "UNINSTALL")
CHANNELS = ("appstore", "huweistore", "weibo", "wechat")


def market_event_source(
    spark: SparkSession, rows_per_second: int = 10, num_partitions: int = 1
) -> DataFrame:
    """rate-source market simulator: MarketUserBehavior-shaped stream."""
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .option("numPartitions", num_partitions)
        .load()
    )
    behavior = F.element_at(
        F.array(*[F.lit(b) for b in BEHAVIORS]), (F.pmod(F.col("value"), 4) + 1).cast("int")
    )
    channel = F.element_at(
        F.array(*[F.lit(c) for c in CHANNELS]),
        (F.pmod(F.xxhash64(F.col("value")), 4) + 1).cast("int"),
    )
    return rate.select(
        F.expr("uuid()").alias("user_id"),
        behavior.alias("behavior"),
        channel.alias("channel"),
        F.col("timestamp").alias("ts"),
    )
