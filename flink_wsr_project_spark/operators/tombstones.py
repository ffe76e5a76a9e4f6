"""Deletion (tombstones) for the persisted stores — the lifecycle verb
a real training-data pipeline cannot ship without (VERDICT r12 #3):
takedown/compliance requests must remove a document, image/clip, or
embedding from the corpus such that (a) probes stop matching it
IMMEDIATELY, (b) at-least-once replays of old absorb batches cannot
resurrect it, and (c) its physical rows are reclaimed at the next
compaction — without rewriting a 100 TB store at delete time.

The shape, shared by all three stores (text signature store, dHash
block store, ANN index):

* ``<prefix>_tombstones`` — ONE plain managed parquet table holding the
  deleted ids. Appends are the delete operation: O(|deleted ids|),
  never touching the store tables. The table is bounded by deletions
  (≪ corpus), so it broadcasts.
* Probes LEFT ANTI-join their store scan against the broadcast
  tombstone set — the store side stays exchange-free (the broadcast
  exchange is on the Δ-bounded tombstone side; the plan-walk tests
  whitelist ``_tombstones`` scans for exactly this reason), and the
  probe-time cost is one broadcast hash lookup per store row scanned.
* Absorbs anti-join their incoming rows against the tombstones
  UNCONDITIONALLY (not just under ``exclude_existing``): a deleted id
  is dead until explicitly re-admitted, so a replayed micro-batch that
  contains it appends nothing — which is what keeps delete → replay
  idempotent even AFTER compaction has physically dropped the rows the
  ``exclude_existing`` anti-join would otherwise have matched.
* Compactions apply the tombstones physically (the rewrite the
  compactor was already paying) and then REWRITE the tombstone table
  deduplicated — but never drop it: the ids must keep masking replays
  forever. Dropping a tombstone is an explicit re-admission
  (:func:`clear_tombstones`), a human decision, not a lifecycle side
  effect.

A note on released claims: a deleted doc that was some other doc's
dedup KEEPER stops matching probes the moment its tombstone lands, so
it can never again claim an incoming duplicate — the "deleted keeper
releases its claims" semantics falls out of the anti-join with no
bookkeeping. Decisions already emitted are history (an output, not
store state) and are the downstream keep-list's concern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def tombstones_table(table_prefix: str) -> str:
    return f"{table_prefix}_tombstones"


def add_tombstones(
    spark: SparkSession, table_prefix: str, ids: DataFrame, id_col: str
) -> int:
    """Record ids as deleted: one distinct-projected append to the
    tombstone table (created on first use). O(|ids|); the store tables
    are not touched — physical removal happens at the next compaction.
    Re-deleting an id is harmless (the table is read distinct and
    deduplicated at compaction). Returns the number of ids appended."""
    rows = ids.select(F.col(id_col).cast("long").alias(id_col)).distinct()
    n = rows.count()
    if n:
        rows.write.mode("append").format("parquet").saveAsTable(
            tombstones_table(table_prefix)
        )
    return n


def has_tombstones(spark: SparkSession, table_prefix: str) -> bool:
    return spark.catalog.tableExists(tombstones_table(table_prefix))


def tombstone_ids(
    spark: SparkSession, table_prefix: str, id_col: str
) -> DataFrame:
    """The distinct deleted-id set, columns = [id_col]."""
    return spark.table(tombstones_table(table_prefix)).toDF(id_col).distinct()


def apply_tombstones(
    spark: SparkSession, df: DataFrame, table_prefix: str, id_col: str
) -> DataFrame:
    """``df`` minus the deleted ids — a broadcast LEFT ANTI join (the
    tombstone set is bounded by deletions, never by the corpus), or
    ``df`` unchanged when the store has no tombstone table (the common
    case pays one catalog lookup and zero plan nodes). ``df``'s id
    column must be named ``id_col``."""
    if not has_tombstones(spark, table_prefix):
        return df
    return df.join(
        F.broadcast(tombstone_ids(spark, table_prefix, id_col)), id_col, "left_anti"
    )


def rewrite_tombstones_deduped(spark: SparkSession, table_prefix: str) -> int:
    """Compaction's tombstone step: rewrite the tombstone table
    DISTINCT under the standard ``__compact`` DROP→RENAME swap (crash
    window recovered by :func:`recover_tombstones`). The table is kept
    — deletions must keep masking replays after the data rows are
    physically gone. No-op (returns 0) when the store has none."""
    t = tombstones_table(table_prefix)
    if not spark.catalog.tableExists(t):
        return 0
    tmp = f"{t}__compact"
    spark.sql(f"DROP TABLE IF EXISTS {tmp}")
    from flink_wsr_project_spark.operators.iterative import (
        local_checkpoint_tracked,
        release_persistent_rdds,
    )

    pinned, _ids = local_checkpoint_tracked(spark.table(t).distinct())
    try:
        n = pinned.count()
        pinned.coalesce(1).write.mode("overwrite").format("parquet").saveAsTable(tmp)
        spark.sql(f"DROP TABLE {t}")
        spark.sql(f"ALTER TABLE {tmp} RENAME TO {t}")
        return n
    finally:
        release_persistent_rdds(spark, _ids)


def recover_tombstones(spark: SparkSession, table_prefix: str) -> bool:
    """Finish an interrupted tombstone rewrite swap — idempotent, run
    at store startup alongside the store's own recover. Returns True
    when a recovery ran; False when there is nothing to do (including
    stores that never had tombstones)."""
    from flink_wsr_project_spark.sources.writers import finish_table_swap

    t = tombstones_table(table_prefix)
    if not (
        spark.catalog.tableExists(t) or spark.catalog.tableExists(f"{t}__compact")
    ):
        return False
    return finish_table_swap(spark, t)


def tombstone_count(spark: SparkSession, table_prefix: str) -> int:
    """Distinct deleted ids a store currently masks (0 when none)."""
    if not has_tombstones(spark, table_prefix):
        return 0
    return spark.table(tombstones_table(table_prefix)).distinct().count()


def should_compact_tombstones(
    spark: SparkSession, table_prefix: str, max_tombstones: int = 100_000
) -> bool:
    """The deletion-volume compaction dial: the probe-side anti-join
    FORCES a broadcast of the deleted-id set (anything else would
    re-shuffle the store — the exact exchange the store contract
    forbids), which is only sound while that set stays bounded.
    Compaction is what keeps it bounded — it folds the deletions into
    the data files and rewrites the tombstone list deduplicated — so a
    pipeline taking heavy deletion traffic should schedule compaction
    by THIS dial (ids masked), not only by the file-count dial.
    100k longs ≈ 800 KB broadcast — far below any broadcast limit; the
    default fires long before the mask is a memory concern."""
    if max_tombstones < 1:
        raise ValueError(f"max_tombstones must be >= 1, got {max_tombstones}")
    return tombstone_count(spark, table_prefix) > max_tombstones


def clear_tombstones(
    spark: SparkSession, table_prefix: str, ids: DataFrame | None = None, id_col: str = "id"
) -> None:
    """Explicit RE-ADMISSION: drop the whole tombstone table (``ids``
    is None) or rewrite it without the given ids. After this, the
    cleared ids can be absorbed again as new corpus members (their old
    physical rows are already gone if a compaction ran; if not, they
    become visible to probes again). This is deliberately a separate,
    loud verb — no lifecycle operation ever clears tombstones as a
    side effect."""
    t = tombstones_table(table_prefix)
    if not spark.catalog.tableExists(t):
        return
    if ids is None:
        spark.sql(f"DROP TABLE {t}")
        return
    from flink_wsr_project_spark.operators.iterative import (
        local_checkpoint_tracked,
        release_persistent_rdds,
    )

    keep, _kids = local_checkpoint_tracked(
        spark.table(t)
        .toDF(id_col)
        .join(F.broadcast(ids.select(id_col).distinct()), id_col, "left_anti")
        .distinct()
    )
    try:
        tmp = f"{t}__compact"
        spark.sql(f"DROP TABLE IF EXISTS {tmp}")
        keep.coalesce(1).write.mode("overwrite").format("parquet").saveAsTable(tmp)
        spark.sql(f"DROP TABLE {t}")
        spark.sql(f"ALTER TABLE {tmp} RENAME TO {t}")
    finally:
        release_persistent_rdds(spark, _kids)
