"""Operational health report for the persisted stores — the
observability completion of the lifecycle verbs (write / probe /
absorb / compact / recover / delete / retain): ONE driver-side call
answering what a 100 TB operator pages about at 3am — how fragmented
is the store (files per bucket slot vs the compaction dial), how much
deletion mass is the probe broadcast carrying (tombstones vs the
volume dial), where is the retention watermark, and which layout
properties is the store actually running under (hash partitions,
extractor identity, quantization).

Everything reads catalog metadata and the bounded side tables —
NO store-table scan (counts come from the file index and the
tombstone/retention tables, which are bounded by deletions and O(1)
respectively), so the report is safe to poll from a monitoring loop
at any corpus size. Row counts of the store tables themselves are
deliberately OMITTED: counting 100 TB to fill a dashboard tile is the
kind of accidental full scan this module exists to prevent; a
deployment that wants them should maintain them incrementally at
absorb time.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _table_report(spark: SparkSession, table: str) -> dict:
    from flink_wsr_project_spark.sources.writers import (
        table_data_file_stats,
        table_num_buckets,
    )

    n_files, n_dirs = table_data_file_stats(spark, table)
    buckets = table_num_buckets(spark, table)
    slots = max(1, buckets) * n_dirs
    return {
        "table": table,
        "data_files": n_files,
        "leaf_dirs": n_dirs,
        "num_buckets": buckets,
        "files_per_slot": round(n_files / slots, 2) if slots else 0.0,
    }


def store_health(
    spark: SparkSession,
    table_prefix: str,
    tables: list[str],
    max_files_per_bucket: int = 4,
    max_tombstones: int = 100_000,
) -> dict:
    """Health report for a store under ``table_prefix`` whose data
    tables are ``{prefix}_{suffix}`` for each suffix in ``tables``.
    Returns a plain dict (driver-side operational surface, not a
    registered query): per-table fragmentation, the two maintenance
    dials evaluated (``needs_compaction`` per table via
    ``should_compact``; ``needs_tombstone_compaction`` via
    ``should_compact_tombstones``), deletion/retention state, and the
    ``spark_graft.*`` layout properties of each table."""
    from flink_wsr_project_spark.operators.retention import retention_watermark
    from flink_wsr_project_spark.operators.tombstones import (
        should_compact_tombstones,
        tombstone_count,
    )
    from flink_wsr_project_spark.sources.writers import should_compact

    report: dict = {"prefix": table_prefix, "tables": []}
    for suffix in tables:
        table = f"{table_prefix}_{suffix}"
        t = _table_report(spark, table)
        t["needs_compaction"] = should_compact(spark, table, max_files_per_bucket)
        t["properties"] = {
            r.key: r.value
            for r in spark.sql(f"SHOW TBLPROPERTIES {table}").collect()
            if r.key.startswith("spark_graft.")
        }
        report["tables"].append(t)
    report["tombstones"] = tombstone_count(spark, table_prefix)
    report["needs_tombstone_compaction"] = should_compact_tombstones(
        spark, table_prefix, max_tombstones
    )
    report["retention_watermark"] = retention_watermark(spark, table_prefix)
    return report


def signature_store_health(spark: SparkSession, table_prefix: str, **kw) -> dict:
    """The text signature store's report (longsigs + hashed tables)."""
    return store_health(spark, table_prefix, ["longsigs", "hashed"], **kw)


def dhash_store_health(spark: SparkSession, table_prefix: str, **kw) -> dict:
    """The perceptual-hash block store's report (blocks table; the
    extractor/format identity appears under its spark_graft.*
    properties — the mixed-hash guard's source of truth)."""
    return store_health(spark, table_prefix, ["blocks"], **kw)


def ann_index_health(spark: SparkSession, table_prefix: str, **kw) -> dict:
    """The IVF index's report (centroids + lists; quantization and
    partitioned-lists layout appear under spark_graft.* properties)."""
    return store_health(spark, table_prefix, ["centroids", "lists"], **kw)


def span_store_health(spark: SparkSession, table_prefix: str, **kw) -> dict:
    """The span store's report (posgrams + docs tables — the
    positional gram index and the absorb roster)."""
    return store_health(spark, table_prefix, ["posgrams", "docs"], **kw)


def search_index_health(spark: SparkSession, table_prefix: str, **kw) -> dict:
    """The search index's report (postings + docstats tables), plus
    the maintained corpus-stats row — the one store whose scoring
    depends on incrementally-maintained state, so the dashboard shows
    it next to the fragmentation/tombstone dials."""
    from flink_wsr_project_spark.operators.search_index import search_stats

    h = store_health(spark, table_prefix, ["postings", "docstats"], **kw)
    n, tt = search_stats(spark, table_prefix)
    h["corpus_stats"] = {"n_docs": n, "total_tokens": tt}
    return h
