"""Continuous indexing for the persisted search index
(operators/search_index.py) — the ingest loop that keeps BM25 current
as documents stream in. Unlike the dedup loops there is no decision
gate: every live, not-yet-indexed document absorbs."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def search_ingest_foreach_batch(
    table_prefix: str,
    num_buckets: int = 8,
    content_col: str = "text",
    id_col: str = "doc_id",
    on_batch=None,
    max_files_per_bucket: int | None = None,
):
    """foreachBatch body: absorb each micro-batch with
    ``exclude_existing=True`` (an at-least-once replay appends nothing
    and credits the stats row nothing), report the absorbed count via
    ``on_batch(n, batch_id)``, and — with ``max_files_per_bucket`` set
    — run ``compact_search_index`` when the postings file dial fires
    (which also reclaims takedowns/retention physically and recomputes
    the stats row exactly). Run ``recover_search_index`` at loop
    startup: it completes interrupted swaps AND heals any stats drift
    a crash between an absorb's appends and its stats credit left."""
    from flink_wsr_project_spark.operators.search_index import (
        absorb_docs_into_index,
        compact_search_index,
    )
    from flink_wsr_project_spark.sources.writers import should_compact

    def body(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession
        docs = batch_df.select(
            F.col(id_col).alias("doc_id"), F.col(content_col).alias("text")
        )
        n = absorb_docs_into_index(
            s, docs, table_prefix, num_buckets, exclude_existing=True
        )
        if on_batch is not None:
            on_batch(n, batch_id)
        if max_files_per_bucket is not None and should_compact(
            s, f"{table_prefix}_postings", max_files_per_bucket
        ):
            compact_search_index(s, table_prefix)

    return body
