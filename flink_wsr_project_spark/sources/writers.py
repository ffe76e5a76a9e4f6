"""Batch write path — partitioned and bucketed parquet output.

The reference only prints to console/Redis/Kafka (SURVEY §2.8); a
100 TB pipeline's primary sink is columnar files laid out for the NEXT
query:

* **partitionBy** → directory-level partition pruning for readers
  filtering on the partition key (PartitionFilters in their scans);
* **bucketBy** → pre-shuffled, co-located layout: equi-joins and
  aggregations on the bucket key run with ZERO exchange at read time
  (asserted in tests/test_writers.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    mode: str = "overwrite",
) -> None:
    """Hive-style partitioned parquet. Partition columns should be
    low-cardinality (date, type, lang); high-cardinality keys belong in
    bucketBy instead (small-files problem)."""
    df.write.partitionBy(*partition_cols).mode(mode).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int,
    sort_cols: Sequence[str] = (),
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table (metastore-backed). Joins/aggs keyed on
    ``bucket_cols`` against another table with the same bucketing skip
    their shuffle entirely."""
    w = df.write.bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.mode(mode).format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def table_num_buckets(spark: SparkSession, table: str) -> int:
    """Bucket count of a bucketed table, from the catalog (0 = not
    bucketed). Compactions must use THIS, never a parameter: the
    rewrite goes through an overwrite of a temp table, which bypasses
    Spark's append-time bucket-spec validation, so a parameter that
    drifted from the original spec would silently re-bucket the store
    and make every LATER append (which IS validated) fail."""
    for r in spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect():
        if r.col_name == "Num Buckets":
            return int(r.data_type)
    return 0


def table_bucket_spec(spark: SparkSession, table: str) -> tuple[int, list[str]]:
    """(bucket count, bucket columns) from the catalog — (0, []) when
    the table is not bucketed."""
    num, cols = 0, []
    for r in spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect():
        if r.col_name == "Num Buckets":
            num = int(r.data_type)
        elif r.col_name == "Bucket Columns":
            cols = [c.strip(" `") for c in r.data_type.strip("[]").split(",") if c.strip()]
    return num, cols


def compact_bucketed_table(spark: SparkSession, table: str, transform=None) -> int:
    """Generic file-count compaction for any bucketed managed table:
    discover the bucket spec (and partition columns) from the catalog,
    pin the rows (localCheckpoint — the source is about to be
    dropped), rewrite one file per bucket slot under ``<table>__compact``,
    swap via DROP + RENAME. The same crash windows as the store
    compactions, recovered by :func:`finish_table_swap` at startup.
    Returns the row count.

    ``transform`` (optional ``DataFrame -> DataFrame``) is applied to
    the source rows before the rewrite — the hook store-specific
    compactors use for rewrite-time healing that belongs IN the
    rewrite (e.g. the dHash store's tombstone reclamation,
    ``operators.image_dedup.compact_dhash_store``). It must preserve
    the schema; partition/bucket layout is reapplied on write either
    way.

    Stores that need multi-table coordination (the signature store)
    or non-generic layout logic (the ANN index's partitioned-lists
    variant) keep their own compactors; THIS is the plain path.
    ``spark_graft.*`` table properties (layout contracts probes
    dispatch on) are copied across the swap — a rewrite that silently
    dropped them would demote a partitioned store to "looks
    bucketed-only" and break its pruned probe."""
    from flink_wsr_project_spark.operators.iterative import (
        local_checkpoint_tracked,
        release_persistent_rdds,
    )

    num, cols = table_bucket_spec(spark, table)
    if num <= 0 or not cols:
        raise ValueError(f"{table} carries no bucket spec in the catalog")
    part_cols = [c.name for c in spark.catalog.listColumns(table) if c.isPartition]
    props = {
        r.key: r.value
        for r in spark.sql(f"SHOW TBLPROPERTIES {table}").collect()
        if r.key.startswith("spark_graft.")
    }
    tmp = f"{table}__compact"
    spark.sql(f"DROP TABLE IF EXISTS {tmp}")
    source = spark.table(table)
    if transform is not None:
        source = transform(source)
    pinned, ckpt_ids = local_checkpoint_tracked(source)
    try:
        n = pinned.count()
        w = pinned.repartition(num, *cols).write
        if part_cols:
            w = w.partitionBy(*part_cols)
        w.bucketBy(num, *cols).mode("overwrite").format("parquet").saveAsTable(tmp)
        if props:
            kv = ", ".join(f"'{k}'='{v}'" for k, v in sorted(props.items()))
            spark.sql(f"ALTER TABLE {tmp} SET TBLPROPERTIES ({kv})")
        spark.sql(f"DROP TABLE {table}")
        spark.sql(f"ALTER TABLE {tmp} RENAME TO {table}")
        if part_cols:
            spark.sql(f"MSCK REPAIR TABLE {table} SYNC PARTITIONS")
    finally:
        release_persistent_rdds(spark, ckpt_ids)
    return n


def table_data_file_stats(spark: SparkSession, table: str) -> tuple[int, int]:
    """(data file count, leaf directory count) for a managed table —
    the inputs to the compaction trigger. Uses the catalog's file
    index (``inputFiles``), so it reflects exactly what a scan would
    open; the leaf-directory count is the partition-directory count
    for a partitioned table (1 for unpartitioned)."""
    files = spark.table(table).inputFiles()
    dirs = {f.rsplit("/", 1)[0] for f in files}
    return len(files), max(1, len(dirs))


def should_compact(
    spark: SparkSession, table: str, max_files_per_bucket: int = 4
) -> bool:
    """Compaction trigger as code: True when the table's scan would
    open more than ``max_files_per_bucket`` files per bucket slot
    (bucket × partition directory). Every bucketed append adds one
    file per non-empty bucket, so a long-running absorb loop crosses
    this threshold linearly with increments; after a compaction
    (one file per slot) it is False again. For an unbucketed
    (partitioned-only) table the slot is the partition directory."""
    if max_files_per_bucket < 1:
        raise ValueError(
            f"max_files_per_bucket must be >= 1, got {max_files_per_bucket}"
        )
    n_files, n_dirs = table_data_file_stats(spark, table)
    buckets = table_num_buckets(spark, table) or 1
    return n_files > max_files_per_bucket * buckets * n_dirs


def atomic_swap_dir(live: str, tmp: str) -> None:
    """Replace directory ``live`` with sibling ``tmp`` so that EVERY
    intermediate crash point leaves a recoverable copy:

        live -> live__old_xxxx   (rename, atomic on one filesystem)
        tmp  -> live             (rename)
        rm   live__old_xxxx      (cleanup; stale __old dirs are safe to
                                  delete on recovery)

    The naive rmtree(live); move(tmp, live) sequence has a window where
    a crash loses the state entirely and readers see a missing path.
    On an object store, map the two renames to the store's atomic
    rename/commit primitive (e.g. a metadata-catalog pointer swap).
    """
    import os
    import shutil
    import uuid as _uuid

    import time as _time

    # Monotonic ns timestamp FIRST in the suffix so recovery can order
    # multiple leftover __old dirs (two crashes with no recovery
    # between) and restore the NEWEST — the pre-op state of the most
    # recent interrupted swap. A bare random uuid made the
    # lexicographically-last dir win, which could be the oldest state.
    old = f"{live.rstrip('/')}__old_{_time.time_ns():020d}_{_uuid.uuid4().hex[:8]}"
    if os.path.exists(live):
        os.rename(live, old)
    os.rename(tmp, live)
    if os.path.exists(old):
        shutil.rmtree(old)


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_files: int,
    sort_cols: Sequence[str] = (),
) -> int:
    """Small-file compaction: rewrite a parquet dataset into
    ``target_files`` files (optionally sorted for better min/max
    pruning). Writes to a sibling temp dir then swaps via
    :func:`atomic_swap_dir` (rename-aside), so a crash at any point
    leaves a recoverable copy of the source. Returns the row count.
    """
    import uuid as _uuid

    df = spark.read.parquet(path)
    out = df.repartition(target_files)
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    tmp = f"{path.rstrip('/')}__compact_{_uuid.uuid4().hex[:8]}"
    out.write.mode("overwrite").parquet(tmp)
    n = spark.read.parquet(tmp).count()
    atomic_swap_dir(path, tmp)
    return n


def write_range_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: Sequence[str],
    num_files: int,
    mode: str = "overwrite",
) -> None:
    """Range-clustered parquet: ``repartitionByRange`` (sampled range
    exchange → near-disjoint per-file key ranges) + in-file sort (tight
    per-row-group min/max). A reader filtering on the leading cluster
    column prunes to ~1/num_files of the data from footer stats alone —
    at 100 TB the difference between touching one file and scanning the
    dataset. Disjointness is verified mechanically from parquet footer
    statistics in tests/test_writers.py."""
    (
        df.repartitionByRange(num_files, *cluster_cols)
        .sortWithinPartitions(*cluster_cols)
        .write.mode(mode)
        .parquet(path)
    )


def zorder_key(x, y, bits: int = 16):
    """Morton (Z-order) interleave of two non-negative int columns into
    one Long — built-in shift/or expressions only (codegen, no UDF).
    Sorting by this key clusters data in BOTH dimensions at once, so a
    2-D box predicate prunes files/row-groups on either column —
    lexicographic sort can only serve its leading column.
    ``bits`` caps each coordinate at 2^bits - 1 (values are clamped)."""
    from pyspark.sql import Column, functions as F

    def _col(c):
        return F.col(c) if isinstance(c, str) else c

    cap = (1 << bits) - 1
    xs = F.least(F.greatest(_col(x), F.lit(0)), F.lit(cap)).cast("long")
    ys = F.least(F.greatest(_col(y), F.lit(0)), F.lit(cap)).cast("long")
    key = F.lit(0).cast("long")
    for i in range(bits):
        key = (
            key
            .bitwiseOR(F.shiftleft(F.shiftright(xs, i).bitwiseAND(F.lit(1)), 2 * i))
            .bitwiseOR(F.shiftleft(F.shiftright(ys, i).bitwiseAND(F.lit(1)), 2 * i + 1))
        )
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    num_files: int,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Z-order-clustered parquet over two int dimensions: range-
    partition + sort on the Morton key, drop the key on write. Readers
    filtering a box on (x, y) prune most files via footer min/max on
    EITHER column."""
    keyed = df.withColumn("_zkey", zorder_key(x_col, y_col, bits))
    (
        keyed.repartitionByRange(num_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode(mode)
        .parquet(path)
    )


def finish_table_swap(spark: SparkSession, table: str) -> bool:
    """Finish an interrupted compact/rewrite swap for ``table``.

    The swap pattern used by the store/index compactions is: write
    ``<table>__compact``, DROP the live table, RENAME the temp into
    place. A crash between the DROP and the RENAME leaves only the
    temp — this completes the rename (re-syncing partition metadata
    when the temp is partitioned, since RENAME moves the root dir but
    not the catalog's per-partition locations). Returns True if a
    recovery was performed; False if the live table already exists
    (including the crash-before-DROP window, where BOTH exist and the
    live one is authoritative — the stale temp is dropped)."""
    tmp = f"{table}__compact"
    if spark.catalog.tableExists(table):
        if spark.catalog.tableExists(tmp):
            spark.sql(f"DROP TABLE {tmp}")
        return False
    if not spark.catalog.tableExists(tmp):
        raise ValueError(f"neither {table} nor {tmp} exists — nothing to recover")
    spark.sql(f"ALTER TABLE {tmp} RENAME TO {table}")
    if any(c.isPartition for c in spark.catalog.listColumns(table)):
        spark.sql(f"MSCK REPAIR TABLE {table} SYNC PARTITIONS")
    return True
