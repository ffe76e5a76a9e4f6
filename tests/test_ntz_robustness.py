"""TIMESTAMP_NTZ robustness (round-2 regression).

The driver regenerates the testdata between rounds and has already
shipped ``events.ts`` in two physical shapes: int64 nanoseconds (round
1) and tz-less ``timestamp[us]`` (round 2), which Spark 4 infers as
TIMESTAMP_NTZ. NTZ broke ``withWatermark`` (the entire streaming
layer) and raw-SQL ``CAST(window.end AS BIGINT)``. These tests pin the
contract: WHATEVER timestamp encoding the parquet carries, ``load_table``
hands every query a plain TimestampType column, and every watermark
entry point accepts an NTZ stream.

The fixtures construct NTZ parquet EXPLICITLY with pyarrow, so the
tests keep guarding even if a future regeneration changes the physical
type of /root/testdata again.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F, types as T

from flink_wsr_project_spark.operators.windows import ensure_event_time
from flink_wsr_project_spark.plans import registry
from flink_wsr_project_spark.sources.readers import load_table, register_views
from flink_wsr_project_spark.streaming.windows import streaming_windowed_agg

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def ntz_sf_dir(tmp_path_factory):
    """A miniature sf dir whose events.parquet has ts as timestamp[us]
    WITHOUT timezone (forced NTZ on read), full events schema."""
    d = tmp_path_factory.mktemp("ntz_sf")
    src = pq.read_table(f"{SF_DIR}/events.parquet").slice(0, 2000)
    fields = []
    for f_ in src.schema:
        if pa.types.is_timestamp(f_.type):
            fields.append(pa.field(f_.name, pa.timestamp("us")))  # tz=None
        else:
            fields.append(f_)
    pq.write_table(src.cast(pa.schema(fields)), str(d / "events.parquet"))
    return str(d)


def test_load_table_normalizes_ntz_to_timestamp(spark, ntz_sf_dir):
    df = load_table(spark, "events", ntz_sf_dir)
    assert isinstance(df.schema["ts"].dataType, T.TimestampType)
    # values survive the cast exactly (UTC session TZ): epoch seconds
    # computed pre- and post-normalization agree
    raw = spark.read.parquet(f"{ntz_sf_dir}/events.parquet")
    # NTZ can't cast straight to long (the original bug) — route the raw
    # side through the epoch_seconds pattern for the value comparison
    a = sorted(r[0] for r in raw.select(F.col("ts").cast("timestamp").cast("long")).collect())
    b = sorted(r[0] for r in df.select(F.col("ts").cast("long")).collect())
    assert a == b


def test_raw_sql_window_cast_on_ntz_source(spark, ntz_sf_dir):
    """The exact round-2 failure shape: raw SQL CAST(window.end AS
    BIGINT) over a view registered from an NTZ parquet."""
    register_views(spark, ntz_sf_dir, names=["events"])
    out = spark.sql(
        """
        SELECT CAST(window.end AS BIGINT) AS window_end, COUNT(*) AS cnt
        FROM (SELECT window(ts, '1 hour') AS window FROM events)
        GROUP BY window_end
        """
    )
    assert out.count() > 0


def test_hot_items_topn_sql_builds_on_ntz_source(spark, ntz_sf_dir):
    """The red driver row of round 2, rebuilt against a forced-NTZ dir."""
    q = registry.get("hot_items_topn_sql")
    assert q.spark_fn(spark, ntz_sf_dir).count() >= 0


def test_watermark_accepts_ntz_stream(spark, ntz_sf_dir):
    """withWatermark over a stream whose inferred schema is NTZ — the
    shape that broke all four match-batch tests in round 2."""
    schema = spark.read.parquet(f"{ntz_sf_dir}/events.parquet").schema
    assert isinstance(schema["ts"].dataType, T.TimestampNTZType)  # fixture sanity
    stream = spark.readStream.schema(schema).parquet(ntz_sf_dir)
    out = streaming_windowed_agg(
        stream, "ts", "1 hour", keys=[F.col("event_type")],
        aggs=[F.count("*").alias("cnt")], watermark="3 seconds",
    )
    q = (
        out.writeStream.outputMode("update").format("memory")
        .queryName("ntz_stream_agg").start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert spark.sql("SELECT * FROM ntz_stream_agg").count() > 0


def test_ensure_event_time_is_noop_on_ltz_and_missing(spark):
    df = spark.createDataFrame([(1,)], ["x"]).withColumn(
        "ts", F.to_timestamp(F.lit("2024-01-01 00:00:00"))
    )
    assert ensure_event_time(df, "ts") is df or isinstance(
        ensure_event_time(df, "ts").schema["ts"].dataType, T.TimestampType
    )
    no_ts = spark.createDataFrame([(1,)], ["x"])
    assert ensure_event_time(no_ts, "ts") is no_ts


@pytest.mark.parametrize("name", sorted(registry.all_queries()))
def test_all_plans_build_on_current_testdata(spark, name):
    """Analysis-time sweep: every registered query must BUILD (schema
    resolve, no AnalysisException) against the CURRENT testdata parquet
    — whatever timestamp physical type the driver last wrote. Catches
    the round-2 class of breakage for all queries, not just hot_items."""
    df = registry.all_queries()[name](spark, SF_DIR)
    assert df.schema is not None


def test_ensure_event_time_pins_utc_under_foreign_session_tz(spark, ntz_sf_dir):
    """Round-3 advice: an NTZ stream normalized under a non-UTC caller
    session (the driver may run America/New_York) must yield the same
    instants/epochs as under UTC — ensure_event_time pins the TZ itself."""
    raw_schema = spark.read.parquet(f"{ntz_sf_dir}/events.parquet").schema
    assert isinstance(raw_schema["ts"].dataType, T.TimestampNTZType)
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        raw = spark.read.parquet(f"{ntz_sf_dir}/events.parquet")
        got = sorted(
            r[0]
            for r in ensure_event_time(raw, "ts").select(F.col("ts").cast("long")).collect()
        )
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    want = sorted(
        r[0] for r in load_table(spark, "events", ntz_sf_dir).select(F.col("ts").cast("long")).collect()
    )
    assert got == want
