"""Retention (age-out) for the persisted stores — the lifecycle verb
that complements tombstones (operators/tombstones.py). Tombstones are
the TARGETED delete: a bounded id set, broadcast anti-joined, O(|ids|)
to record. Retention is the BULK delete: "everything older than X is
expired" — and routing that through tombstones would be wrong at
100 TB, because an age-out of 30% of the corpus is a corpus-sized id
set, which breaks the tombstone contract's load-bearing assumption
(the mask stays small enough to broadcast).

The scalable shape is a WATERMARK, not a set: store ids are assigned
monotonically by ingest (doc_id / asset_id / vec_id — the convention
every absorb loop in this repo already follows), so "expire everything
ingested before X" is the single predicate ``id >= min_live_id``.

* Recording retention is O(1): one single-row table
  (``<prefix>_retention``) rewritten under the standard crash-safe
  ``__compact`` DROP→RENAME swap.
* Probes read the watermark at PLAN time (one 1-row scan) and apply it
  as a LITERAL filter — no join, no broadcast, and the predicate
  reaches the parquet scan where min/max row-group pruning can skip
  whole expired files (an id-correlated layout makes this free; even
  without it the cost is a codegen'd comparison per row, strictly
  cheaper than the tombstone anti-join).
* Absorbs drop incoming rows below the watermark, so an at-least-once
  replay of a pre-expiry micro-batch cannot resurrect expired rows —
  the same idempotence contract tombstones give targeted deletes.
* Compaction applies the watermark physically (the rewrite it was
  already paying) and keeps the retention table: the watermark must
  keep masking replays forever.
* The watermark is MONOTONIC. Raising it is the retention operation;
  lowering it is refused loudly — rows below the old watermark may
  already be physically gone, so a lowered watermark would not
  "un-expire" anything; it would just make the store's contents
  silently dependent on compaction timing. Re-admitting old data is
  an absorb of fresh rows under NEW ids, not a watermark rollback.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def retention_table(table_prefix: str) -> str:
    return f"{table_prefix}_retention"


def retention_watermark(spark: SparkSession, table_prefix: str) -> int | None:
    """The store's min-live id, or None when no retention is set (the
    common case pays one catalog lookup and zero plan nodes)."""
    t = retention_table(table_prefix)
    if not spark.catalog.tableExists(t):
        return None
    rows = spark.table(t).collect()
    return rows[0].min_live_id if rows else None


def set_retention_watermark(
    spark: SparkSession, table_prefix: str, min_live_id: int
) -> None:
    """Raise the store's retention watermark: ids < ``min_live_id``
    are expired. Refuses to lower an existing watermark (see module
    docstring). Crash-safe via the standard ``__compact`` swap —
    :func:`recover_retention` finishes an interrupted one."""
    current = retention_watermark(spark, table_prefix)
    if current is not None and min_live_id < current:
        raise ValueError(
            f"retention watermark for '{table_prefix}' is {current}; "
            f"lowering it to {min_live_id} is refused — rows below the "
            "current watermark may already be compacted away, so a "
            "rollback cannot restore them and would only make store "
            "contents depend on compaction timing. Re-admit old data "
            "by absorbing it under new ids."
        )
    t = retention_table(table_prefix)
    row = spark.createDataFrame(
        [(int(min_live_id),)], "min_live_id BIGINT"
    )
    if current is None:
        row.coalesce(1).write.mode("overwrite").format("parquet").saveAsTable(t)
        return
    tmp = f"{t}__compact"
    spark.sql(f"DROP TABLE IF EXISTS {tmp}")
    row.coalesce(1).write.mode("overwrite").format("parquet").saveAsTable(tmp)
    spark.sql(f"DROP TABLE {t}")
    spark.sql(f"ALTER TABLE {tmp} RENAME TO {t}")


def recover_retention(spark: SparkSession, table_prefix: str) -> bool:
    """Finish an interrupted watermark swap — idempotent, run at store
    startup alongside the store's own recover. Returns True when a
    recovery ran."""
    from flink_wsr_project_spark.sources.writers import finish_table_swap

    t = retention_table(table_prefix)
    if not (
        spark.catalog.tableExists(t) or spark.catalog.tableExists(f"{t}__compact")
    ):
        return False
    return finish_table_swap(spark, t)


def apply_retention(
    spark: SparkSession, df: DataFrame, table_prefix: str, id_col: str
) -> DataFrame:
    """``df`` minus expired rows: a literal ``id >= watermark`` filter
    (pushed to the scan), or ``df`` unchanged when the store has no
    retention set."""
    wm = retention_watermark(spark, table_prefix)
    if wm is None:
        return df
    return df.where(F.col(id_col) >= F.lit(int(wm)))


def live_rows(
    spark: SparkSession, df: DataFrame, table_prefix: str, id_col: str
) -> DataFrame:
    """The store-read mask every probe/absorb/compact path applies:
    tombstones (targeted deletes, broadcast anti-join) AND retention
    (bulk age-out, literal filter) composed. New lifecycle verbs that
    subtract rows chain here so no read path can forget one."""
    from flink_wsr_project_spark.operators.tombstones import apply_tombstones

    return apply_retention(
        spark, apply_tombstones(spark, df, table_prefix, id_col), table_prefix, id_col
    )
