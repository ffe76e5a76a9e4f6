"""Parser-path tests (SURVEY.md §2.2 P1/P2): CSV-line and apache-log
parsing through the JVM-side from_csv / regexp route."""

from __future__ import annotations

import datetime

from flink_wsr_project_spark import schemas
from flink_wsr_project_spark.sources.readers import (
    parse_apache_log_lines,
    parse_csv_lines,
)
from flink_wsr_project_spark.streaming.sinks import kafka_sink


def test_parse_user_behavior_csv(spark):
    # UserBehavior.csv format (HotItems.scala:50-60)
    lines = spark.createDataFrame(
        [("543462,1715,1464116,pv,1511658000",), ("662867,2244074,1575622,buy,1511658060",)],
        ["value"],
    )
    rows = parse_csv_lines(lines, schemas.USER_BEHAVIOR).collect()
    assert rows[0].user_id == 543462
    assert rows[0].item_id == 1715
    assert rows[0].behavior == "pv"
    assert rows[0].ts_epoch == 1511658000
    assert rows[1].behavior == "buy"


def test_parse_order_event_csv_empty_txid(spark):
    # OrderLog.csv: create rows carry an empty txId (OrderPayTxMatch…:30)
    lines = spark.createDataFrame(
        [("34729,create,,1558430842",), ("34730,pay,3sab34fd,1558430844",)], ["value"]
    )
    rows = parse_csv_lines(lines, schemas.ORDER_EVENT).collect()
    assert rows[0].event_type == "create" and rows[0].tx_id is None
    assert rows[1].tx_id == "3sab34fd"


def test_parse_apache_log(spark):
    # apache.log format (NetworkFlowTopNPage…scala:34-42)
    line = "83.149.9.216 - - 17/05/2015:10:05:03 +0000 GET /presentations/logstash/"
    df = parse_apache_log_lines(spark.createDataFrame([(line,)], ["value"]))
    r = df.collect()[0]
    assert r.ip == "83.149.9.216"
    assert r.method == "GET"
    assert r.url == "/presentations/logstash/"
    assert r.event_time == datetime.datetime(2015, 5, 17, 10, 5, 3)


def test_kafka_sink_serialization(spark):
    # serialization projection only (no broker in the container)
    df = spark.createDataFrame([(1, "a", 2.5)], ["x", "y", "z"])
    writer = kafka_sink(df, topic="t")
    # the writer is configured for kafka; verify the value projection
    from flink_wsr_project_spark.streaming import sinks as _s  # noqa: F401

    from pyspark.sql import functions as F

    payload = df.select(
        F.concat_ws(",", *[F.col(c).cast("string") for c in df.columns]).alias("value")
    ).collect()
    assert payload[0].value == "1,a,2.5"


def test_read_jsonl(spark, tmp_path):
    from flink_wsr_project_spark.sources.readers import read_jsonl

    p = tmp_path / "events.jsonl"
    p.write_text(
        '{"event_id": 1, "user_id": 7, "event_type": "view", "value": 1.5}\n'
        '{"event_id": 2, "user_id": 8, "event_type": "click", "value": 0.25}\n'
    )
    import pyspark.sql.types as T

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    rows = read_jsonl(spark, str(p), schema).orderBy("event_id").collect()
    assert [(r.event_id, r.event_type) for r in rows] == [(1, "view"), (2, "click")]


def test_parse_csv_malformed_rows_dont_fail(spark):
    """PERMISSIVE parse: garbage lines become nulls, never exceptions —
    at 100 TB a single bad row must not kill the pipeline."""
    lines = spark.createDataFrame(
        [
            ("543462,1715,1464116,pv,1511658000",),   # good
            ("not,a,number,row,xxx",),                 # bad types
            ("too,few",),                              # missing fields
            ("",),                                     # empty
        ],
        ["value"],
    )
    rows = parse_csv_lines(lines, schemas.USER_BEHAVIOR).collect()
    assert len(rows) == 4
    good = [r for r in rows if r.user_id is not None]
    assert len(good) == 1 and good[0].item_id == 1715


def test_cli_list_and_unknown():
    from flink_wsr_project_spark.__main__ import main

    assert main(["list"]) == 0
    assert main(["run", "no_such_query"]) == 2


def test_cli_run_and_explain(spark, capsys):
    from flink_wsr_project_spark.__main__ import main

    assert main(["run", "market_total", "--sf-dir", "/root/testdata/sf0.001",
                 "--limit", "3", "--cpus", "8"]) == 0
    out = capsys.readouterr().out
    assert "window_end" in out
    assert main(["explain", "pv_hourly", "--sf-dir", "/root/testdata/sf0.001",
                 "--cpus", "8"]) == 0
    out = capsys.readouterr().out
    assert "HashAggregate" in out or "AdaptiveSparkPlan" in out


def test_python_datasource_batch_partitioned(spark):
    """market_sim as a Spark-4 Python DataSource: batch read splits into
    row-range partitions, rows are a pure function of index (two reads
    identical), and the mapped columns hit the declared domains."""
    from flink_wsr_project_spark.sources.python_datasource import (
        BEHAVIORS,
        CHANNELS,
        MarketSimDataSource,
        _row,
    )

    spark.dataSource.register(MarketSimDataSource)
    df = (
        spark.read.format("market_sim")
        .option("numRows", 1000)
        .option("numPartitions", 4)
        .load()
    )
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 1000
    rows = {r.event_id: r for r in df.collect()}
    assert sorted(rows) == list(range(1000))
    for i in (0, 1, 999):
        want = _row(i)
        got = rows[i]
        assert (got.event_id, got.user_id, got.behavior, got.channel,
                got.ts_offset_s) == want
    assert {r.behavior for r in rows.values()} <= set(BEHAVIORS)
    assert {r.channel for r in rows.values()} <= set(CHANNELS)


def test_python_datasource_stream_offsets(spark, tmp_path):
    """market_sim streaming: offsets advance by rowsPerBatch, rows are
    deterministic continuations across micro-batches (index-range
    offsets make recovery replay exact by construction)."""
    from flink_wsr_project_spark.sources.python_datasource import (
        MarketSimDataSource,
        _row,
    )

    spark.dataSource.register(MarketSimDataSource)
    stream = (
        spark.readStream.format("market_sim")
        .option("rowsPerBatch", 50)
        .load()
    )
    seen: list[tuple[int, int]] = []

    def sink(batch_df, epoch_id):
        for r in batch_df.collect():
            seen.append((epoch_id, r.event_id))

    q = (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ms_cp"))
        .foreachBatch(sink)
        .start()
    )
    import time

    deadline = time.time() + 60
    while time.time() < deadline and len({e for e, _ in seen}) < 2:
        time.sleep(1)
    q.stop()
    epochs = sorted({e for e, _ in seen})
    assert len(epochs) >= 2
    first_two = [i for e, i in sorted(seen) if e in epochs[:2]]
    assert first_two == list(range(len(first_two)))  # contiguous indices
    assert _row(first_two[0])[0] == first_two[0]  # index-determined rows


def test_schema_evolution_merge_read(spark, tmp_path):
    """Schema evolution across parquet files (the 100 TB reality: a
    column added mid-corpus): mergeSchema unions the schemas, old files
    surface NULL for the new column, and filters on the new column
    still push down to the scan."""
    d = str(tmp_path / "evolve")
    spark.createDataFrame([(1, "a")], ["id", "v"]).coalesce(1).write.mode(
        "append"
    ).parquet(d)
    spark.createDataFrame(
        [(2, "b", "extra")], ["id", "v", "tag"]
    ).coalesce(1).write.mode("append").parquet(d)

    df = spark.read.option("mergeSchema", "true").parquet(d)
    assert set(df.columns) == {"id", "v", "tag"}
    rows = {r.id: r.tag for r in df.collect()}
    assert rows == {1: None, 2: "extra"}
    assert df.filter(df.tag == "extra").count() == 1
    assert df.filter(df.tag.isNull()).count() == 1


def test_socket_source_end_to_end(spark):
    """S3 (NetworkFlowTopNPage…scala:31 `env.socketTextStream`): a real
    localhost TCP server feeds CSV lines through the socket source into
    the standard parse path — the first live exercise of the socket
    wiring (no peer existed in earlier rounds)."""
    import socket
    import threading

    from flink_wsr_project_spark import schemas
    from flink_wsr_project_spark.sources.readers import parse_csv_lines, socket_stream

    lines = [b"1,10,100,pv,1511658000\n", b"2,20,200,buy,1511658001\n"]
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]

    def serve():
        conn, _ = srv.accept()
        with conn:
            for ln in lines:
                conn.sendall(ln)
            # keep the connection open long enough for a micro-batch
            import time

            time.sleep(3)

    t = threading.Thread(target=serve, daemon=True)
    t.start()
    stream = socket_stream(spark, "127.0.0.1", port)
    parsed = parse_csv_lines(stream, schemas.USER_BEHAVIOR)
    q = (
        parsed.writeStream.outputMode("append")
        .format("memory")
        .queryName("socket_src")
        .start()
    )
    try:
        import time

        deadline = time.time() + 20
        rows = []
        while time.time() < deadline and len(rows) < 2:
            q.processAllAvailable()
            rows = spark.sql("SELECT * FROM socket_src").collect()
            time.sleep(0.2)
    finally:
        q.stop()
        srv.close()
    got = {(r.user_id, r.item_id, r.behavior) for r in rows}
    assert got == {(1, 10, "pv"), (2, 20, "buy")}
