"""Custom Spark 4 Python DataSource: the market-event simulator as a
FIRST-CLASS source (batch + streaming), registered under
``format("market_sim")``.

The reference implements its simulator as a Flink
``RichParallelSourceFunction``
(``market/SimulateMarketEvenSource.scala:10-41`` — random
MarketUserBehavior every 100 ms). The rate-source mapping
(``streaming/sources.market_event_source``) already covers the
semantics; THIS module is the idiomatic Spark-4 counterpart of writing
a custom source: the Python DataSource API gives a planner-visible
source with its own schema, options, batch partitioning, and streaming
offset tracking — no Receiver, no rate-source shim.

Determinism: row i is a pure function of i (house-style md5-free
integer mixing), so batch reads, streaming reads, and recovery replays
(``readBetweenOffsets``) all see byte-identical data — which is what
makes the source testable and the streaming exactly-once story
provable (offsets are row indices; replaying [start, end) regenerates
the same rows).

Scale: batch reads split into ``numPartitions`` row-range
``InputPartition``s — executors generate their ranges independently
(embarrassingly parallel, no driver data). The streaming reader is the
SIMPLE variant (driver-side generation, prefetched/cached per batch by
Spark) — appropriate for a simulator; a partition-parallel
``DataSourceStreamReader`` drops in if a real feed ever replaces it.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

BEHAVIORS = ("CLICK", "DOWNLOAD", "INSTALL", "UNINSTALL")
CHANNELS = ("appstore", "huweistore", "weibo", "wechat")

_SCHEMA = "event_id long, user_id long, behavior string, channel string, ts_offset_s long"
_BASE_TS = 1704067200  # 2024-01-01T00:00:00Z


def _mix(i: int) -> int:
    """Deterministic 64-bit integer mix (splitmix64 finalizer — public
    domain constants), so adjacent indices decorrelate."""
    z = (i + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return z ^ (z >> 31)


def _row(i: int) -> tuple:
    m = _mix(i)
    return (
        i,
        m % 1000,
        BEHAVIORS[(m >> 10) % 4],
        CHANNELS[(m >> 12) % 4],
        i // 10,  # 10 events per simulated second
    )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class _MarketBatchReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("numrows", 1000))
        self.parts = int(options.get("numpartitions", 4))

    def partitions(self) -> Sequence[InputPartition]:
        step = max(1, -(-self.n // self.parts))
        return [
            _RangePartition(lo, min(lo + step, self.n))
            for lo in range(0, self.n, step)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield _row(i)


class _MarketStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.batch_rows = int(options.get("rowsperbatch", 100))

    def initialOffset(self) -> dict:
        return {"index": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        lo = int(start["index"])
        hi = lo + self.batch_rows
        return iter([_row(i) for i in range(lo, hi)]), {"index": hi}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # recovery replay: regenerate exactly [start, end)
        return iter([_row(i) for i in range(int(start["index"]), int(end["index"]))])


class MarketSimDataSource(DataSource):
    """``spark.dataSource.register(MarketSimDataSource)`` then
    ``spark.read.format("market_sim").option("numRows", n).load()`` or
    ``spark.readStream.format("market_sim").load()``."""

    @classmethod
    def name(cls) -> str:
        return "market_sim"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _MarketBatchReader(self.options)

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return _MarketStreamReader(self.options)
