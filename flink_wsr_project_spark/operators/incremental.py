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
    op_token: str | None = None,
) -> DataFrame:
    """Read state (if any) → merge the delta's partial aggregate →
    replace the state dir via rename-aside (crash-recoverable at every
    intermediate point). Returns the new state.

    ``op_token`` makes the merge EXACTLY-ONCE per state: a token
    identifying the operation (deterministic across replays — e.g.
    derived from the delta's key set) is written as an ``_applied_op``
    marker file INSIDE the new state dir before the swap, so marker
    and data commit atomically together. A call whose token equals the
    state's marker is a no-op — a replay after a crash PART-WAY
    through a multi-state update (bigram counts merged, vocabulary
    not) re-applies only the states that missed it. The marker holds
    only the LAST op, so recovery must replay an interrupted op before
    admitting new ones — exactly what foreachBatch restart semantics
    guarantee."""
    from flink_wsr_project_spark.sources.writers import atomic_swap_dir

    if op_token is not None and applied_op(state_path) == op_token:
        return spark.read.parquet(state_path)
    delta_state = aggregate_delta(delta, keys, aggs)
    existing = spark.read.parquet(state_path) if os.path.exists(state_path) else None
    new_state = merge_aggregate_state(existing, delta_state, keys, merge_fns)
    tmp = f"{state_path.rstrip('/')}__merge_{_uuid.uuid4().hex[:8]}"
    new_state.write.mode("overwrite").parquet(tmp)
    if op_token is not None:
        with open(os.path.join(tmp, "_applied_op"), "w") as f:
            f.write(op_token)
    atomic_swap_dir(state_path, tmp)
    return spark.read.parquet(state_path)


def applied_op(state_path: str) -> str | None:
    """The state's ``_applied_op`` marker (None when the state doesn't
    exist, predates the marker protocol, or was rewritten without
    one). Underscore-prefixed files are invisible to parquet reads."""
    marker = os.path.join(state_path, "_applied_op")
    try:
        with open(marker) as f:
            return f.read()
    except OSError:
        return None


def recover_aggregate_state(state_path: str) -> bool:
    """Finish an interrupted rename-aside swap on a path state —
    idempotent, run at startup. Always rolls BACK: if the live dir is
    missing but a ``__old`` copy exists, the old state is restored;
    every leftover ``__old``/``__merge``/``__new`` sibling is removed.
    Roll-back is provably consistent with the op-token protocol: the
    interrupted op replays against the pre-op state and marker, so it
    re-applies exactly once (rolling FORWARD would need to prove the
    tmp dir's write completed — roll-back needs no such proof).
    Returns True when anything was repaired."""
    import glob
    import logging
    import shutil

    def _old_key(path: str) -> int:
        # __old_<ns-timestamp>_<uuid> sorts by the embedded monotonic
        # timestamp; legacy uuid-only suffixes fall back to dir mtime
        # (rename preserves it — it reflects when the state's files
        # were written, so newer state -> larger key either way).
        tag = path.rsplit("__old_", 1)[1].split("_", 1)[0]
        if tag.isdigit() and len(tag) >= 15:
            return int(tag)
        return int(os.path.getmtime(path) * 1e9)

    base = state_path.rstrip("/")
    olds = sorted(glob.glob(base + "__old_*"), key=_old_key)
    tmps = sorted(glob.glob(base + "__merge_*")) + (
        [base + "__new"] if os.path.exists(base + "__new") else []
    )
    ran = False
    if not os.path.exists(base) and olds:
        # Restore the NEWEST pre-op copy (the state the interrupted op
        # will replay against). With more than one __old the situation
        # is abnormal (two crashes, no recovery between): QUARANTINE
        # the older copies instead of deleting them — an operator can
        # inspect and remove __stale_* dirs, the engine never reads
        # them (underscore-suffixed siblings are invisible to state
        # reads, which go through the exact live path).
        os.rename(olds.pop(), base)
        ran = True
        for d in olds:
            stale = base + "__stale_" + d.rsplit("__old_", 1)[1]
            os.rename(d, stale)
            logging.getLogger(__name__).warning(
                "recover_aggregate_state: multiple __old copies for %s; "
                "restored the newest, quarantined %s", base, stale,
            )
        olds = []
    # live exists: every __old is the pre-op copy of a COMPLETED swap
    # (crash after the tmp->live rename, before cleanup) — safe to drop.
    for d in olds + tmps:
        if os.path.exists(d):
            shutil.rmtree(d)
            ran = True
    return ran
