"""Batch MERGE / upsert (warehouse-style CDC apply) without a table
format.

``MERGE INTO target USING changes`` is the operation every
lakehouse format (Delta/Iceberg/Hudi) implements on top of exactly
this relational core: collapse the change stream to one winning row
per key, full-outer-join it against the current snapshot, and emit
insert/update/delete/keep decisions. Expressing it as a plain
DataFrame op keeps the engine format-agnostic — the same plan rewrites
a parquet snapshot directory (see ``operators.incremental`` for the
crash-safe swap) or feeds ``foreachBatch`` in a streaming CDC apply.

Scale shape: ONE shuffle of the changes on the key (the keep-last
window, WindowGroupLimit pre-prunes map-side), one co-partitioned
full-outer join against the snapshot. No driver-side state; ties are
broken by explicit ``order_by`` so the winner is deterministic under
any partitioning.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F

from flink_wsr_project_spark.operators.keepfirst import dedup_keep_first


def merge_upsert(
    base: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str | Column],
    delete_predicate: Column | None = None,
    op_alias: str = "op",
) -> DataFrame:
    """Apply a change set onto a snapshot with MERGE semantics.

    * the LATEST change per key wins (``order_by`` descending, ties
      resolved by its trailing columns — pass a unique id last);
    * a winning change satisfying ``delete_predicate`` — a plain
      boolean ``Column`` over the change row's natural column names
      (e.g. ``F.col("op_type") == "D"``), evaluated on the winning
      change BEFORE the join — removes the key (whether or not it
      existed in ``base``); NULL predicate values are treated as
      not-a-delete;
    * keys only in ``base`` pass through (``op='kept'``), keys only in
      the changes insert (``'insert'``), both sides update
      (``'update'``).

    Returns ``base``'s columns plus ``op``. ``base`` and ``changes``
    must share the schema (the snapshot IS a collapsed change stream).
    """
    keys = list(keys)
    value_cols = [c for c in base.columns if c not in keys]
    latest = dedup_keep_first(changes, keys, order_by, keep="last")
    if delete_predicate is not None:
        # Resolve against the change row's own columns, pre-rename: a
        # delete marker must win even when base has the key.
        latest = latest.withColumn("_c_delete", delete_predicate)

    b = base.withColumn("_b_present", F.lit(1))
    c = latest.select(
        *keys,
        *[F.col(col).alias(f"_c_{col}") for col in value_cols],
        F.lit(1).alias("_c_present"),
        *([F.col("_c_delete")] if delete_predicate is not None else []),
    )
    j = b.join(c, keys, "full_outer")
    if delete_predicate is not None:
        j = j.filter(~F.coalesce(F.col("_c_delete"), F.lit(False)))

    take_change = F.col("_c_present").isNotNull()
    merged_vals = [
        F.when(take_change, F.col(f"_c_{v}")).otherwise(F.col(v)).alias(v)
        for v in value_cols
    ]
    op = (
        F.when(F.col("_c_present").isNull(), F.lit("kept"))
        .when(F.col("_b_present").isNull(), F.lit("insert"))
        .otherwise(F.lit("update"))
        .alias(op_alias)
    )
    return j.select(*keys, *merged_vals, op)
