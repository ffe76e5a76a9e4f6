"""Lineage-truncation helpers for iterative DataFrame loops.

Iterative algorithms (connected components, PageRank) must
``localCheckpoint`` each round to keep the logical plan one join deep —
but ``Dataset.localCheckpoint`` persists its blocks through an internal
RDD that is NOT reachable from the returned DataFrame's public handles:
``df.unpersist()``, ``df.rdd.unpersist()`` and even
``queryExecution.toRdd().unpersist()`` are all no-ops on it (verified
against Spark 4.1 — the checkpointed RDD is a private ``map`` of
``toRdd``). Without an explicit release, block-manager usage grows
O(rounds × |frame|) over a long loop.

These helpers track the persistent-RDD ids a checkpoint creates (by
diffing ``SparkContext.getPersistentRDDs`` around the call) so a loop
can release the superseded round's blocks by id. Two hazards are
handled: (1) the eager checkpoint job may be the FIRST materialization
of an unrelated ``.cache()`` in its input plan (e.g. the edges cache a
connected-components loop joins every round), whose InMemoryRelation
RDD would land in a naive diff and get wrongly released a round later
— so the diff keeps only RDDs whose ``checkpointData`` is defined,
which caches never have; (2) concurrent persists from OTHER threads
between the snapshots — not possible in this engine's
single-driver-thread query builders, but a multi-tenant driver would
need a lock around ``local_checkpoint_tracked``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _persistent_ids(sc) -> set[int]:
    return set(sc._jsc.getPersistentRDDs().keySet())


def local_checkpoint_tracked(
    df: DataFrame, eager: bool = True
) -> tuple[DataFrame, set[int]]:
    """``localCheckpoint`` returning (checkpointed_df, new_rdd_ids).

    ``new_rdd_ids`` are the persistent-RDD ids this CHECKPOINT created
    (ids persisted by the same job for plain caches are excluded via
    the checkpointData marker); pass them to
    :func:`release_persistent_rdds` once the frame is superseded.

    ``eager=False`` defers materialization to the FIRST action that
    consumes the returned frame (guide §5: one action instead of a
    dedicated checkpoint job — the r17 BPE-loop shape). The persist
    registration and checkpoint marker are still set at call time, so
    id tracking is identical; but the parent frame's blocks back the
    lazy computation, so a loop must defer releasing the superseded
    round until the new round has actually materialized.
    """
    sc = df.sparkSession.sparkContext
    before = _persistent_ids(sc)
    out = df.localCheckpoint(eager=eager)
    new = _persistent_ids(sc) - before
    if not new:
        return out, new
    jmap = sc._jsc.getPersistentRDDs()
    ckpt_ids = set()
    for jid in list(jmap.keySet()):
        if jid in new and jmap[jid].rdd().checkpointData().isDefined():
            ckpt_ids.add(jid)
    return out, ckpt_ids


def release_persistent_rdds(spark, ids: set[int]) -> None:
    """Unpersist (non-blocking) the persistent RDDs with the given ids.

    Ids already evicted or unknown are skipped silently — release is
    idempotent and safe to call with a stale set.
    """
    if not ids:
        return
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for jid in list(jmap.keySet()):
        if jid in ids:
            # non-blocking: racing Spark's ContextCleaner on a block
            # already being dropped must not stall (or log-error) the loop
            jmap[jid].unpersist(False)
