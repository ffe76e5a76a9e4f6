"""Sources & parsers (SURVEY.md §2.1-2.2).

The reference reads CSV text files line-by-line and splits/casts by hand
(``env.readTextFile`` + ``map(split(","))``, e.g.
``/root/reference/src/main/scala/com/hong/hotItems/HotItems.scala:50-60``)
or parses apache log lines with ``SimpleDateFormat``
(``networkflow/analysis/NetworkFlowTopNPage_经典演示迟到数据.scala:34-42``).

Spark-first: parquet scans with explicit schemas (column pruning +
predicate pushdown reach the scan), ``from_csv`` for line parsing (stays
JVM-side inside whole-stage codegen — no Python in the parse path), and
``to_timestamp`` for the log date format.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F, types as T

from flink_wsr_project_spark import schemas
from flink_wsr_project_spark.operators.windows import pin_session_utc

_DEFAULT_SF_DIR = "/root/testdata/sf0.001"

# Analyzed-DataFrame cache keyed by (session, dir, table) — the role a
# metastore/catalog plays at scale: schema + file listing resolved once
# per session instead of re-reading parquet footers on every query
# construction. Safe because the testdata directories are immutable;
# a mutable source would need an invalidation hook here.
_TABLE_CACHE: dict[tuple, DataFrame] = {}


def load_table(spark: SparkSession, name: str, sf_dir: str = _DEFAULT_SF_DIR) -> DataFrame:
    """Parquet scan of one testdata table. Columnar, prunable.

    Session-agnostic hardening (the driver runs queries in its own
    session): pin UTC (oracle timestamps are UTC-naive) and read
    nanosecond parquet timestamps (events.ts) as Long, normalizing to
    TimestampType at microsecond precision — the same truncation DuckDB
    applies when it scans the file. Both confs re-pin on EVERY call —
    the caller's session may have been reconfigured between queries.
    """
    pin_session_utc(spark)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    key = (spark, sf_dir, name)
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for f_ in df.schema.fields:
        if f_.name == "ts" and f_.dataType.simpleString() == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(f_.dataType, T.TimestampNTZType):
            # Spark 4 reads tz-less parquet timestamps as TIMESTAMP_NTZ,
            # which breaks withWatermark and raw-SQL numeric casts. UTC
            # session TZ is pinned above, so LTZ normalization is exact.
            # Covers every timestamp column, every driver regeneration
            # shape (int64-nanos → the branch above; us/ns-NTZ → here).
            df = df.withColumn(f_.name, F.col(f_.name).cast("timestamp"))
    _TABLE_CACHE[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str = _DEFAULT_SF_DIR, names=None) -> dict[str, DataFrame]:
    names = names or schemas.TESTDATA_TABLES
    return {n: load_table(spark, n, sf_dir) for n in names}


def register_views(spark: SparkSession, sf_dir: str = _DEFAULT_SF_DIR, names=None) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for name, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(name)


def parse_csv_lines(lines: DataFrame, schema: T.StructType, value_col: str = "value") -> DataFrame:
    """P1: typed CSV-line parse (split+cast in the reference,
    ``HotItems.scala:50-60``) via ``from_csv`` — JVM-side, codegen'd.

    ``lines`` is a one-string-column DataFrame (text file / Kafka value /
    socket). Works identically on batch and streaming inputs.
    """
    ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in schema.fields)
    return lines.select(F.from_csv(F.col(value_col), ddl).alias("r")).select("r.*")


def epoch_to_ts(col: Column | str, unit: str = "s") -> Column:
    """P6: epoch Long → TimestampType (reference multiplies sec→ms at
    watermark assignment, ``HotItems.scala:61``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_seconds(c) if unit == "s" else F.timestamp_millis(c)


_APACHE_LOG_PATTERN = r"^(\S+) (\S+) (\S+) (\S+) (\S+) (\S+) (\S+)"


def parse_apache_log_lines(lines: DataFrame, value_col: str = "value") -> DataFrame:
    """P2: apache-log line parse (space-split + ``dd/MM/yyyy:HH:mm:ss``
    date, ``NetworkFlowTopNPage…scala:34-42``) with built-in regexp +
    ``to_timestamp`` — no Python UDF.
    """
    v = F.col(value_col)
    return lines.select(
        F.regexp_extract(v, _APACHE_LOG_PATTERN, 1).alias("ip"),
        F.regexp_extract(v, _APACHE_LOG_PATTERN, 3).alias("user_id"),
        F.to_timestamp(
            F.regexp_extract(v, _APACHE_LOG_PATTERN, 4), "dd/MM/yyyy:HH:mm:ss"
        ).alias("event_time"),
        F.regexp_extract(v, _APACHE_LOG_PATTERN, 6).alias("method"),
        F.regexp_extract(v, _APACHE_LOG_PATTERN, 7).alias("url"),
    )


def read_csv_file(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """S2+P1 for finite files: direct schema'd CSV scan."""
    return spark.read.csv(path, schema=schema)


def kafka_source_options(topic: str, servers: str = "localhost:9092") -> dict[str, str]:
    """S1 wiring: the exact reader options ``kafka_stream`` passes to the
    ``kafka`` data source (mirrors the reference's consumer properties at
    ``HotItems.scala:33-41``). Exposed separately so the plan-level test
    can assert the wiring even when the spark-sql-kafka package (and a
    broker) are absent from the environment."""
    return {
        "kafka.bootstrap.servers": servers,
        "subscribe": topic,
        "startingOffsets": "latest",
    }


def kafka_stream(spark: SparkSession, topic: str, servers: str = "localhost:9092") -> DataFrame:
    """S1: Kafka consumer source (``HotItems.scala:33-46``). Returns the
    raw value as string; pipe through :func:`parse_csv_lines`.

    Requires the spark-sql-kafka package on the classpath; at test time
    we exercise the parse path via memory/file sources instead.
    """
    return (
        spark.readStream.format("kafka")
        .options(**kafka_source_options(topic, servers))
        .load()
        .select(F.col("value").cast("string").alias("value"))
    )


def socket_stream(spark: SparkSession, host: str, port: int) -> DataFrame:
    """S3: socket line source (``NetworkFlowTopNPage…scala:31``)."""
    return spark.readStream.format("socket").option("host", host).option("port", port).load()


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """JSON-lines source with an EXPLICIT schema — at 100 TB schema
    inference is a second full scan, so it is never allowed; malformed
    rows surface in the standard ``_corrupt_record``-free PERMISSIVE
    mode as nulls rather than failing the pipeline."""
    return spark.read.schema(schema).json(path)


def jsonl_stream(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Streaming JSON-lines directory source (same explicit-schema rule)."""
    return spark.readStream.schema(schema).json(path)
