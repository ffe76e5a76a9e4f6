"""Streaming per-window top-N via ``foreachBatch`` (SURVEY.md §4
custom-work item 2; R1-R3 streaming forms).

Structured Streaming forbids rank window functions on streaming
DataFrames, so the rank stage runs as a *batch* window function over
each micro-batch of the (update-mode) windowed aggregate — exactly the
split the reference hand-built with ListState + timers
(``HotItems.scala:145-208``): Flink's timer-at-windowEnd+100ms is
Spark's per-trigger recompute; the MapState idempotency trick
(``NetworkFlowTopNPage…scala:101-114``) is unnecessary because each
trigger recomputes the rank from the current aggregate state.

Downstream consumers see ``update``-style upserts keyed by
(window_end, rank) — the Spark analogue of the reference's retract
stream (``HotItems_2_Table.scala:63``).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from flink_wsr_project_spark.operators.topn import topn_per_group


def stream_topn(
    windowed_agg_stream: DataFrame,
    partition_cols: Sequence[str],
    order_col: str,
    n: int,
    sink: Callable[[DataFrame, int], None],
    tiebreakers: Sequence[str] = (),
    trigger_seconds: int | None = None,
    query_name: str = "stream_topn",
) -> StreamingQuery:
    """Rank each micro-batch of a windowed aggregate and hand the
    top-N rows to ``sink(batch_df, epoch_id)``."""

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        ranked = topn_per_group(
            batch_df, partition_cols, order_col, n, tiebreakers=tiebreakers
        )
        sink(ranked, epoch_id)

    writer = (
        windowed_agg_stream.writeStream.outputMode("update")
        .queryName(query_name)
        .foreachBatch(process)
    )
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
