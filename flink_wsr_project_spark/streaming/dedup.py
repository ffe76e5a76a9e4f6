"""Streaming deduplication — the streaming arm of the dedup family
(operators/dedup.py is the batch side).

The reference has no streaming dedup operator; this covers the
training-data-pipeline mandate: exact-duplicate suppression on a
document stream. Spark-first: ``dropDuplicatesWithinWatermark`` keys
the state store on the content hash and evicts state as the watermark
passes — O(unique-keys-within-delay) state, not O(stream).

For id-keyed streams (exactly-once upsert semantics on event_id),
plain ``dropDuplicates`` + watermark gives the same bounded-state
behavior.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from flink_wsr_project_spark.operators.windows import ensure_event_time


def dedup_stream_exact(
    stream: DataFrame,
    content_col: str,
    ts_col: str,
    watermark: str = "10 minutes",
    hash_alias: str = "content_hash",
) -> DataFrame:
    """Keep the first-seen row per content hash within the watermark
    horizon. Hashing first (md5, JVM-side) means the state store keys
    on 32 bytes, never on the document text itself."""
    hashed = ensure_event_time(stream, ts_col).withColumn(hash_alias, F.md5(F.col(content_col)))
    if stream.isStreaming:
        return hashed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            [hash_alias]
        )
    return hashed.dropDuplicates([hash_alias])


def dedup_stream_by_key(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Exactly-once by business key (e.g. event_id) within the
    watermark horizon."""
    stream = ensure_event_time(stream, ts_col)
    if stream.isStreaming:
        return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            key_cols
        )
    return stream.dropDuplicates(key_cols)
