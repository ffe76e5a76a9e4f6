"""Incremental aggregate maintenance — merge a delta batch into a
persisted running aggregate without recomputing history.

The batch counterpart of a streaming aggregation: works for any
MERGEABLE aggregate state (count, sum, min, max — and by extension
avg = (sum, count), variance = (n, Σx, Σx²), approx-distinct sketches).
The merge is one shuffle on the keys over |existing agg| + |delta|
rows — history's raw data is never re-read.

    state_0 = aggregate(day_0)
    state_1 = merge(state_0, aggregate(day_1))      # == aggregate(day_0 ∪ day_1)

The swap is rename-aside (sources.writers.atomic_swap_dir): every
intermediate crash state leaves a recoverable copy — either the old
state dir, its ``__old`` rename, or both the new and ``__old`` dirs.
"""

from __future__ import annotations

import os
import uuid as _uuid
from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

# merge function per aggregate column: how two partial states combine
MERGE_FNS: Mapping[str, str] = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}


def aggregate_delta(
    delta: DataFrame, keys: list[str], aggs: Mapping[str, Column]
) -> DataFrame:
    """Partial aggregate of one new batch: {out_col: agg expression}."""
    return delta.groupBy(*keys).agg(*[c.alias(n) for n, c in aggs.items()])


def merge_aggregate_state(
    existing: DataFrame | None,
    delta_state: DataFrame,
    keys: list[str],
    merge_fns: Mapping[str, str],
) -> DataFrame:
    """Combine two aggregate states; ``merge_fns`` maps each state
    column to its combiner ('sum'|'min'|'max')."""
    if existing is None:
        return delta_state
    unioned = existing.unionByName(delta_state)
    aggs = [getattr(F, fn)(col).alias(col) for col, fn in merge_fns.items()]
    return unioned.groupBy(*keys).agg(*aggs)


def update_aggregate_table(
    spark: SparkSession,
    state_path: str,
    delta: DataFrame,
    keys: list[str],
    aggs: Mapping[str, Column],
    merge_fns: Mapping[str, str],
) -> DataFrame:
    """Read state (if any) → merge the delta's partial aggregate →
    replace the state dir via rename-aside (crash-recoverable at every
    intermediate point). Returns the new state."""
    from flink_wsr_project_spark.sources.writers import atomic_swap_dir

    delta_state = aggregate_delta(delta, keys, aggs)
    existing = spark.read.parquet(state_path) if os.path.exists(state_path) else None
    new_state = merge_aggregate_state(existing, delta_state, keys, merge_fns)
    tmp = f"{state_path.rstrip('/')}__merge_{_uuid.uuid4().hex[:8]}"
    new_state.write.mode("overwrite").parquet(tmp)
    atomic_swap_dir(state_path, tmp)
    return spark.read.parquet(state_path)
