"""The composed curation loop — every persisted store driven by ONE
foreachBatch chain, with cross-store crash consistency (r13 verdict
task 1). A real training-data pipeline does not run its stores in
separate jobs: each micro-batch is gated (quality → dedup → span →
LM) and the admitted docs update the signature store, the span store,
the LM, and the search index together. The hard part is a crash
BETWEEN store updates inside one batch: the signature store absorbed,
the span store did not — replay must converge every store with no doc
double-admitted and no claim lost.

Crash-consistency design — a write-ahead DECISION LOG:

1. **Decide** (read-only): all gates probe the stores as they stood
   BEFORE this batch. The per-doc decisions are written to
   ``<decision_log>/batch=<id>`` via write-to-tmp + atomic rename —
   one commit point. A crash before the rename leaves no store
   touched (recompute is trivially identical); a crash after it means
   the decisions are pinned forever.
2. **Apply** (idempotent per store): absorbs run in a fixed order
   (signature → span → LM → search → image → ANN), each individually
   replay-safe
   (anti-join against the store's own roster, or the LM's op-token
   markers). A replayed batch loads the logged decisions instead of
   recomputing — so it does not matter that the stores now already
   contain some of the batch (the read-your-writes hazard the WAL
   exists to kill: recomputing after a partial apply would see the
   batch claiming itself).

Replay ordering contract (same as the LM op-token protocol): a failed
batch must replay before new batches are admitted — exactly what
Spark's foreachBatch restart semantics guarantee.

Why decisions, not effects, are logged: every store absorb is already
idempotent, but the DECISION is a function of store state, and store
state moves as the batch applies. Pinning the decision makes the
entire chain a pure replay of deterministic effects.

At 100 TB: the decide phase is the stores' bounded probe plans (Δ-side
shuffles only; directory-pruned scans); the log write is |Δ| rows of
a few integers; the apply phase is the stores' bounded absorbs. The
chain adds NO new shuffle over any store.

The REMOVAL complement (:func:`curate_takedown`, r15) closes the
lifecycle: one verb takes a document set out of every store family —
pinned to the same log (``takedown=<id>``) before any store is
touched, each member delete replay-safe, with its own 7-point kill
matrix. Admission and takedown together keep the invariant in both
directions: store contents ARE the curated corpus.

Reference anchor: the engine-level analogue of the reference's
end-to-end jobs (orderpay_detect/OrderPayTxMatch_2Flow_Co.scala:48-57
— one pipeline, several stateful outcomes per element), recast as a
multi-store curation chain.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

# chaos-injection points, in apply order (test surface for the
# kill-point matrix: raise after the named step completes)
KILL_POINTS = ("decide", "sig", "span", "lm", "search", "image", "ann")

_DECISION_SCHEMA = (
    "doc_id bigint, stage string, decision string, dup_of bigint, "
    "coverage_permille bigint, ccnet_bucket string"
)


def _quality_ok() -> F.Column:
    """The funnel's Gopher-style bounds (pipeline.curate_corpus /
    curation_funnel's quality stage) — stateless, so it gates first."""
    toks = F.split(F.trim(F.col("text")), r"\s+")
    return F.size(toks).between(10, 10000) & (
        F.length("text") / F.size(toks)
    ).between(3, 15)


def _batch_log_dir(decision_log: str, batch_id) -> str:
    return os.path.join(decision_log, f"batch={batch_id}")


def _decide(
    spark: SparkSession,
    docs: DataFrame,
    sig_prefix: str,
    span_prefix: str,
    lm_prefix: str | None,
    span_cap: int | None,
    span_threshold_permille: int,
    lm_gate: bool,
    ckpt_ids: set[int],
) -> DataFrame:
    """Compute one decision row per batch doc against the CURRENT
    store states (read-only). Stage attribution is first-drop-wins in
    the funnel's order: quality → dup → span → lm → kept. Checkpoint
    ids are accumulated into ``ckpt_ids``; the caller releases them
    once the decisions have committed to the log — a long-running
    loop must not pin one RDD set per batch forever."""
    from flink_wsr_project_spark.operators.incremental_dedup import (
        dedup_incremental_from_store,
    )
    from flink_wsr_project_spark.operators.iterative import (
        local_checkpoint_tracked,
    )
    from flink_wsr_project_spark.operators.span_store import (
        span_dedup_from_store,
    )

    def pin(df: DataFrame) -> DataFrame:
        out, ids = local_checkpoint_tracked(df)
        ckpt_ids.update(ids)  # .update, not |=: |= would rebind a local
        return out

    quality = pin(docs.select("doc_id", _quality_ok().alias("q_ok")))
    q_pass = docs.join(quality.where("q_ok").select("doc_id"), "doc_id")

    dup = pin(dedup_incremental_from_store(spark, q_pass, sig_prefix))
    d_pass = q_pass.join(
        dup.where(F.col("decision") == "keep").select("doc_id"), "doc_id"
    )

    span = pin(
        span_dedup_from_store(
            spark,
            d_pass,
            span_prefix,
            cap=span_cap,
            threshold_permille=span_threshold_permille,
            ckpt_ids=ckpt_ids,  # the probe's own gram pin releases with ours
        )
    )
    s_pass = d_pass.join(
        span.where(F.col("decision") == "keep").select("doc_id"), "doc_id"
    )

    lm_scores = None
    if lm_prefix is not None:
        from flink_wsr_project_spark.operators.lm_store import (
            lm_store_exists,
            score_docs_against_lm,
        )

        if lm_store_exists(lm_prefix):
            lm_scores = pin(
                score_docs_against_lm(spark, s_pass, lm_prefix).select(
                    "doc_id", "ccnet_bucket"
                )
            )

    out = (
        docs.select("doc_id")
        .join(quality, "doc_id", "left")
        .join(
            dup.select(
                "doc_id",
                F.col("decision").alias("dup_decision"),
                "dup_of",
            ),
            "doc_id",
            "left",
        )
        .join(
            span.select(
                "doc_id",
                F.col("decision").alias("span_decision"),
                "coverage_permille",
            ),
            "doc_id",
            "left",
        )
    )
    if lm_scores is not None:
        out = out.join(lm_scores, "doc_id", "left")
    else:
        out = out.withColumn("ccnet_bucket", F.lit(None).cast("string"))
    lm_drops = (
        (F.col("ccnet_bucket") == "tail") if lm_gate else F.lit(False)
    )
    return out.select(
        "doc_id",
        F.when(~F.col("q_ok"), F.lit("quality"))
        .when(F.col("dup_decision") != "keep", F.lit("dup"))
        .when(F.col("span_decision") != "keep", F.lit("span"))
        .when(lm_drops, F.lit("lm"))
        .otherwise(F.lit("kept"))
        .alias("stage"),
        F.when(~F.col("q_ok"), F.lit("drop"))
        .when(F.col("dup_decision") != "keep", F.lit("drop"))
        .when(F.col("span_decision") != "keep", F.lit("drop"))
        .when(lm_drops, F.lit("drop"))
        .otherwise(F.lit("keep"))
        .alias("decision"),
        "dup_of",
        F.col("coverage_permille").cast("bigint").alias("coverage_permille"),
        "ccnet_bucket",
    )


_UNSET = object()


def curate_foreach_batch(
    decision_log: str,
    sig_prefix: str,
    span_prefix: str,
    lm_prefix: str | None = None,
    search_prefix: str | None = None,
    num_buckets: int = 8,
    span_cap: int | None = _UNSET,  # type: ignore[assignment]
    span_threshold_permille: int = 500,
    lm_gate: bool = False,
    content_col: str = "text",
    id_col: str = "doc_id",
    on_batch=None,
    fail_after: str | None = None,
    image_prefix: str | None = None,
    ann_prefix: str | None = None,
    embedding_col: str = "embedding",
    ann_bootstrap_k: int = 8,
):
    """foreachBatch body for the composed curation chain. Gates each
    micro-batch (quality → signature-store dedup → span coverage →
    optional LM tail gate), commits the per-doc decisions to the
    write-ahead decision log, then absorbs the ADMITTED docs into
    every store: signature, span, LM (record-only unless ``lm_gate``),
    the BM25 index when ``search_prefix`` is given (so the curated
    corpus is immediately searchable), the perceptual image-block
    store when ``image_prefix`` is given (the admitted docs' renders
    are hashed and their block rows appended — the multimodal dedup
    state tracks the curated corpus instead of drifting from it), and
    the ANN/IVF index when ``ann_prefix`` is given (the batch must
    then carry ``embedding_col``; admitted docs' vectors are assigned
    to their nearest existing centroid and appended). An ABSENT index
    is bootstrapped from the first batch's admitted vectors
    (``bootstrap_ann_index`` with ``ann_bootstrap_k`` seed lists —
    r16, closing the last manual step of a from-zero deployment; the
    LM-store pattern: the fit is a full overwrite, so a replayed or
    half-written first batch refits the same).

    Only the final admitted set absorbs anywhere: every store's
    contents ARE the curated corpus, the invariant that makes the
    stores agree with each other and with the batch funnel — r15
    closes it for the last two families (image, ANN), so a
    ``modal_dedup_consensus``-style probe over the stores sees exactly
    the corpus the text gates admitted.

    ``on_batch(decisions_df, batch_id, replayed)`` receives the logged
    decision frame. ``fail_after`` (one of ``KILL_POINTS``) raises
    RuntimeError after the named step completes — the chaos hook the
    kill-point test matrix drives; never set it in production.

    ``span_cap`` defaults to the registered queries' env-dialed gram
    cap — the 100 TB posture: an UNCAPPED span probe (``None``) would
    enumerate every occurrence pair of a degenerate boilerplate gram;
    pass ``None`` only deliberately (exhaustive audit runs)."""
    if span_cap is _UNSET:
        from flink_wsr_project_spark.plans.pipeline_queries import (
            _SPAN_GRAM_CAP,
        )

        span_cap = _SPAN_GRAM_CAP

    def body(batch_df: DataFrame, batch_id) -> None:
        from flink_wsr_project_spark.operators.iterative import (
            local_checkpoint_tracked,
            release_persistent_rdds,
        )

        spark = batch_df.sparkSession
        ckpt_ids: set[int] = set()
        cols = [F.col(id_col).alias("doc_id"), F.col(content_col).alias("text")]
        if ann_prefix is not None:
            if embedding_col not in batch_df.columns:
                raise ValueError(
                    f"ann_prefix set but batch carries no '{embedding_col}' "
                    "column — the ANN absorb needs each doc's vector"
                )
            cols.append(F.col(embedding_col).alias("embedding"))
        docs, dids = local_checkpoint_tracked(
            batch_df.select(*cols).dropDuplicates(["doc_id"])
        )
        ckpt_ids |= dids
        try:
            _body_inner(spark, docs.select("doc_id", "text"), batch_id, ckpt_ids,
                        docs if ann_prefix is not None else None)
        finally:
            # every checkpoint this batch pinned is superseded the
            # moment the decisions committed and the absorbs ran (or
            # the chaos hook fired) — a continuous loop must not grow
            # one pinned RDD set per micro-batch
            release_persistent_rdds(spark, ckpt_ids)

    def _body_inner(
        spark: SparkSession,
        docs: DataFrame,
        batch_id,
        ckpt_ids: set[int],
        docs_with_vecs: DataFrame | None = None,
    ) -> None:
        log_dir = _batch_log_dir(decision_log, batch_id)
        replayed = os.path.isdir(log_dir)
        if replayed:
            decisions = spark.read.parquet(log_dir)
        else:
            decisions = _decide(
                spark, docs, sig_prefix, span_prefix, lm_prefix,
                span_cap, span_threshold_permille, lm_gate, ckpt_ids,
            )
            # one atomic commit point: a crash mid-write leaves only
            # the tmp dir (cleaned by recover_curation_stores), never
            # a half-readable log
            tmp = log_dir + "__tmp"
            decisions.write.mode("overwrite").parquet(tmp)
            os.makedirs(decision_log, exist_ok=True)
            os.rename(tmp, log_dir)
            decisions = spark.read.parquet(log_dir)
        if fail_after == "decide":
            raise RuntimeError("chaos: crash after decide")

        # ---- apply phase: idempotent absorbs in fixed order --------
        from flink_wsr_project_spark.operators.incremental_dedup import (
            absorb_kept_into_store,
        )
        from flink_wsr_project_spark.operators.span_store import (
            absorb_spans_into_store,
        )

        admitted = decisions.where(F.col("decision") == "keep").select("doc_id")
        # the absorb helpers filter on decision == 'keep'
        keeps = admitted.withColumn("decision", F.lit("keep"))

        absorb_kept_into_store(
            spark, docs, keeps, sig_prefix, num_buckets, exclude_existing=True
        )
        if fail_after == "sig":
            raise RuntimeError("chaos: crash after sig absorb")

        absorb_spans_into_store(
            spark, docs, keeps, span_prefix, num_buckets, exclude_existing=True
        )
        if fail_after == "span":
            raise RuntimeError("chaos: crash after span absorb")

        if lm_prefix is not None:
            from flink_wsr_project_spark.operators.lm_store import (
                absorb_docs_into_lm,
                fit_lm_store,
                lm_store_exists,
            )

            admitted_docs = docs.join(admitted, "doc_id")
            if lm_store_exists(lm_prefix):
                absorb_docs_into_lm(spark, admitted_docs, lm_prefix)
            else:
                # bootstrap: the first batch's admitted set IS the
                # corpus fit (full overwrite — replay refits the same)
                from flink_wsr_project_spark.operators.iterative import (
                    local_checkpoint_tracked,
                )

                pinned, ids = local_checkpoint_tracked(admitted_docs)
                ckpt_ids |= ids
                fit_lm_store(spark, pinned, lm_prefix)
        if fail_after == "lm":
            raise RuntimeError("chaos: crash after lm absorb")

        if search_prefix is not None:
            from flink_wsr_project_spark.operators.search_index import (
                absorb_docs_into_index,
            )

            absorb_docs_into_index(
                spark,
                docs.join(admitted, "doc_id"),
                search_prefix,
                num_buckets,
                exclude_existing=True,
            )
        if fail_after == "search":
            raise RuntimeError("chaos: crash after search absorb")

        if image_prefix is not None:
            from flink_wsr_project_spark.operators.image_dedup import (
                absorb_kept_into_dhash_store,
            )
            from flink_wsr_project_spark.operators.multimodal import (
                synthesize_image_renders_from_docs,
            )

            # the admitted docs' RENDERS (deterministic from (doc_id,
            # text) — the repo's stubbed decode discipline: the Spark
            # plumbing is real, the pixels are synthetic); the absorb
            # is replay-idempotent via the store's own asset roster
            absorb_kept_into_dhash_store(
                spark,
                synthesize_image_renders_from_docs(docs.join(admitted, "doc_id")),
                keeps.withColumnRenamed("doc_id", "asset_id"),
                image_prefix,
                num_buckets,
                exclude_existing=True,
            )
        if fail_after == "image":
            raise RuntimeError("chaos: crash after image absorb")

        if ann_prefix is not None:
            from flink_wsr_project_spark.operators.ann_index import (
                absorb_vectors_into_index,
                ann_index_exists,
                bootstrap_ann_index,
            )

            admitted_vecs = (
                docs_with_vecs.join(admitted, "doc_id")
                .where(F.col("embedding").isNotNull())
                .selectExpr("doc_id AS vec_id", "embedding")
            )
            if ann_index_exists(spark, ann_prefix):
                absorb_vectors_into_index(
                    spark, admitted_vecs, ann_prefix, num_buckets,
                    exclude_existing=True,
                )
            else:
                # cold start (r16): the first batch's admitted vectors
                # ARE the centroid fit — the LM-store bootstrap pattern
                # (full overwrite, so a replayed or half-written first
                # batch refits the same); later batches absorb against
                # the fitted centroids
                from flink_wsr_project_spark.operators.iterative import (
                    local_checkpoint_tracked,
                )

                pinned, ids = local_checkpoint_tracked(admitted_vecs)
                ckpt_ids |= ids
                bootstrap_ann_index(
                    spark, pinned, ann_prefix,
                    k=ann_bootstrap_k, num_buckets=num_buckets,
                )
        if fail_after == "ann":
            raise RuntimeError("chaos: crash after ann absorb")

        if on_batch is not None:
            on_batch(decisions, batch_id, replayed)

    return body


# chaos points of the composed takedown, in apply order. SEARCH leads
# on purpose: its stats debit is computed against the still-live
# docstats, and in a shared-prefix deployment (sig/span/search on one
# table prefix — the loop tests' shape) the sig/span deletes write the
# SAME tombstone table the search live-mask reads, so running them
# first would zero the debit and leave the stats row counting dead
# docs (found by the stats-vs-recompute pin).
#
# CONCURRENCY CONTRACT (r16): takedowns are serialized WITH batch
# commits by the decision-log WAL — run ``curate_takedown`` between
# batches (foreachBatch bodies complete before the next fires, so
# calling it from the same driver thread as the stream's processing
# gives this for free), never concurrently with an in-flight batch's
# apply phase: a batch absorbing while a takedown tombstones the same
# prefix could interleave a member absorb between the takedown's
# member deletes, leaving the victim present in stores the takedown
# had already passed. Under that ordering the result is exact: a
# takedown between batches leaves every store and every later batch's
# decisions IDENTICAL to a corpus that never contained the victims
# (tombstone masks, the LM's inverse merge and the search stats debit
# are all exact logical removals — pinned by
# test_takedown_between_live_batches_matches_never_present_control).
TAKEDOWN_KILL_POINTS = ("log", "search", "sig", "span", "lm", "image", "ann")


def curate_takedown(
    spark: SparkSession,
    docs: DataFrame,
    takedown_id,
    decision_log: str,
    sig_prefix: str,
    span_prefix: str,
    lm_prefix: str | None = None,
    search_prefix: str | None = None,
    image_prefix: str | None = None,
    ann_prefix: str | None = None,
    fail_after: str | None = None,
) -> dict[str, int]:
    """The REMOVAL complement of :func:`curate_foreach_batch`: take a
    set of documents out of EVERY store family in one verb — a
    takedown that misses one store silently breaks the loop's "store
    contents ARE the curated corpus" invariant in reverse (the doc is
    gone from search but still claims dedup victims, or vice versa).

    ``docs`` must carry (doc_id, text): the LM's inverse count merge
    needs the text (counts have no per-doc rows to mask, only
    contributions to cancel); every other member deletes by id.

    Crash consistency mirrors the admit chain: the takedown set is
    pinned to ``<decision_log>/takedown=<id>`` via write-to-tmp +
    atomic rename BEFORE any store is touched, and a replay (the dir
    already exists) reads the PINNED set instead of the caller's frame
    — so a crash between member deletes re-applies exactly the same
    removal, and each member verb is individually replay-safe
    (tombstone adds are distinct-append + read-distinct; the LM's
    inverse merge subtracts only roster-present docs under its op
    token; the search stats debit is computed against the still-live
    docstats, and ``recover_curation_stores``' member recovery
    recomputes the stats row either way). The search debit LEADS the
    chain — see ``TAKEDOWN_KILL_POINTS``. Returns {store: ids
    affected}.

    At 100 TB: every member is O(|takedown|) — tombstone appends and
    a Δ-sized inverse aggregate; no store rewrite (physical reclaim
    belongs to each store's compaction)."""
    from flink_wsr_project_spark.operators.iterative import (
        local_checkpoint_tracked,
        release_persistent_rdds,
    )

    log_dir = os.path.join(decision_log, f"takedown={takedown_id}")
    ckpt_ids: set[int] = set()
    try:
        if os.path.isdir(log_dir):
            pinned = spark.read.parquet(log_dir)
        else:
            staged, sids = local_checkpoint_tracked(
                docs.select("doc_id", "text").dropDuplicates(["doc_id"])
            )
            ckpt_ids |= sids
            tmp = log_dir + "__tmp"
            staged.write.mode("overwrite").parquet(tmp)
            os.makedirs(decision_log, exist_ok=True)
            os.rename(tmp, log_dir)
            pinned = spark.read.parquet(log_dir)
        if fail_after == "log":
            raise RuntimeError("chaos: crash after takedown log")
        ids = pinned.select("doc_id")

        out: dict[str, int] = {}
        from flink_wsr_project_spark.operators.incremental_dedup import (
            delete_from_signature_store,
        )
        from flink_wsr_project_spark.operators.span_store import (
            delete_from_span_store,
        )

        # search FIRST — see TAKEDOWN_KILL_POINTS: its live-docstats
        # stats debit must run before any member that may write the
        # same prefix's tombstone table
        if search_prefix is not None:
            from flink_wsr_project_spark.operators.search_index import (
                delete_from_search_index,
            )

            out["search"] = delete_from_search_index(spark, search_prefix, ids)
        if fail_after == "search":
            raise RuntimeError("chaos: crash after search takedown")
        out["sig"] = delete_from_signature_store(spark, sig_prefix, ids)
        if fail_after == "sig":
            raise RuntimeError("chaos: crash after sig takedown")
        out["span"] = delete_from_span_store(spark, span_prefix, ids)
        if fail_after == "span":
            raise RuntimeError("chaos: crash after span takedown")
        if lm_prefix is not None:
            from flink_wsr_project_spark.operators.lm_store import (
                lm_store_exists,
                remove_docs_from_lm,
            )

            if lm_store_exists(lm_prefix):
                out["lm"] = remove_docs_from_lm(spark, pinned, lm_prefix)
        if fail_after == "lm":
            raise RuntimeError("chaos: crash after lm takedown")
        if image_prefix is not None:
            from flink_wsr_project_spark.operators.image_dedup import (
                delete_from_dhash_store,
            )

            out["image"] = delete_from_dhash_store(
                spark, image_prefix, ids.withColumnRenamed("doc_id", "asset_id")
            )
        if fail_after == "image":
            raise RuntimeError("chaos: crash after image takedown")
        if ann_prefix is not None:
            from flink_wsr_project_spark.operators.ann_index import (
                delete_from_ann_index,
            )

            out["ann"] = delete_from_ann_index(
                spark, ann_prefix, ids.withColumnRenamed("doc_id", "vec_id")
            )
        if fail_after == "ann":
            raise RuntimeError("chaos: crash after ann takedown")
        return out
    finally:
        release_persistent_rdds(spark, ckpt_ids)


def prune_decision_log(
    decision_log: str,
    keep_last: int | None = 16,
    max_age_sec: float | None = None,
    now: float | None = None,
    takedown_keep_last: int | None = None,
) -> list[str]:
    """Retention verb for committed decision-log dirs — without it a
    long-running loop grows one parquet directory per micro-batch
    forever, even though replay only ever needs the batch being
    restarted (foreachBatch replays AT MOST the last uncommitted
    batch, never history). Keeps the ``keep_last`` highest batch ids
    (and, when ``max_age_sec`` is given, everything younger than
    that), removes the rest, and returns the pruned dir names.

    RETENTION ASYMMETRY, deliberate: ``batch=`` dirs are replay
    plumbing and prune by default; ``takedown=`` dirs are the removal
    AUDIT TRAIL (who was removed, when, with what pinned victim set)
    and are permanent by default — a takedown record is usually the
    artifact a compliance request is answered from. A loop that has
    offloaded its audit trail elsewhere can opt in with
    ``takedown_keep_last=N``: keeps the N newest takedown dirs by
    mtime (minimum 1 — the newest is the crash-recovery replay
    target; ``recover_curation_stores`` re-applies it from the pinned
    set, so it must survive any prune).

    The pinned-forever default behavior is still available as the
    audit-retention escape hatch: ``keep_last=None, max_age_sec=None``
    prunes nothing on the batch side. Run it from the loop's
    maintenance cadence (e.g. alongside store compaction), never
    concurrently with an in-flight batch commit for the ids being
    pruned — which is guaranteed by keeping ``keep_last >= 1``."""
    import shutil
    import time

    # validate EVERY knob before the first rmtree — a bad batch knob
    # must not leave a half-applied takedown prune behind
    if takedown_keep_last is not None and takedown_keep_last < 1:
        raise ValueError(
            "takedown_keep_last must be >= 1 (the newest takedown is "
            "the crash-recovery replay target)"
        )
    if keep_last is not None and keep_last < 1:
        raise ValueError("keep_last must be >= 1 (the replay batch)")
    pruned_takedowns: list[str] = []
    if takedown_keep_last is not None:
        if os.path.isdir(decision_log):
            tds = sorted(
                (
                    (os.path.getmtime(os.path.join(decision_log, e)), e)
                    for e in os.listdir(decision_log)
                    if e.startswith("takedown=") and not e.endswith("__tmp")
                ),
            )
            for _, entry in tds[: max(0, len(tds) - takedown_keep_last)]:
                shutil.rmtree(os.path.join(decision_log, entry))
                pruned_takedowns.append(entry)
    if keep_last is None and max_age_sec is None:
        return pruned_takedowns
    if not os.path.isdir(decision_log):
        return pruned_takedowns
    batches = []
    for entry in os.listdir(decision_log):
        if entry.startswith("batch=") and not entry.endswith("__tmp"):
            tag = entry.split("=", 1)[1]
            if tag.lstrip("-").isdigit():
                batches.append((int(tag), entry))
    batches.sort()
    keep_ids = set()
    if keep_last is not None:
        keep_ids |= {b for b, _ in batches[-keep_last:]}
    if max_age_sec is not None:
        cutoff = (time.time() if now is None else now) - max_age_sec
        keep_ids |= {
            b
            for b, entry in batches
            if os.path.getmtime(os.path.join(decision_log, entry)) >= cutoff
        }
        if keep_last is None and batches:
            # never prune the newest batch — it is the replay target
            keep_ids.add(batches[-1][0])
    pruned = []
    for b, entry in batches:
        if b not in keep_ids:
            shutil.rmtree(os.path.join(decision_log, entry))
            pruned.append(entry)
    return pruned_takedowns + pruned


def recover_curation_stores(
    spark: SparkSession,
    decision_log: str,
    sig_prefix: str,
    span_prefix: str,
    lm_prefix: str | None = None,
    search_prefix: str | None = None,
    image_prefix: str | None = None,
    ann_prefix: str | None = None,
) -> dict[str, bool]:
    """Run every member store's recovery verb and sweep half-written
    decision-log tmp dirs — idempotent, run once at loop startup
    before any batch. Committed decision logs are never touched: they
    are the replay's source of truth."""
    import shutil

    from flink_wsr_project_spark.operators.incremental_dedup import (
        recover_store_compaction,
    )
    from flink_wsr_project_spark.operators.span_store import recover_span_store
    from flink_wsr_project_spark.operators.tombstones import recover_tombstones

    out: dict[str, bool] = {}
    swept = False
    if os.path.isdir(decision_log):
        for entry in os.listdir(decision_log):
            if entry.endswith("__tmp"):
                shutil.rmtree(os.path.join(decision_log, entry))
                swept = True
    out["decision_log"] = swept
    out["sig"] = bool(recover_store_compaction(spark, sig_prefix)) or bool(
        recover_tombstones(spark, sig_prefix)
    )
    out["span"] = recover_span_store(spark, span_prefix)
    if lm_prefix is not None:
        from flink_wsr_project_spark.operators.lm_store import recover_lm_store

        out["lm"] = recover_lm_store(spark, lm_prefix)
    if search_prefix is not None:
        from flink_wsr_project_spark.operators.search_index import (
            recover_search_index,
        )

        out["search"] = recover_search_index(spark, search_prefix)
    if image_prefix is not None:
        from flink_wsr_project_spark.operators.image_dedup import (
            recover_dhash_store,
        )

        out["image"] = recover_dhash_store(spark, image_prefix)
    if ann_prefix is not None:
        from flink_wsr_project_spark.operators.ann_index import (
            recover_index_compaction,
            recover_index_retrain,
        )

        out["ann"] = bool(recover_index_compaction(spark, ann_prefix)) or bool(
            recover_index_retrain(spark, ann_prefix)
        )
    return out


def curation_health(
    spark: SparkSession,
    decision_log: str,
    sig_prefix: str,
    span_prefix: str,
    lm_prefix: str | None = None,
    search_prefix: str | None = None,
    image_prefix: str | None = None,
    ann_prefix: str | None = None,
) -> dict:
    """One operational report for the COMPOSITION (r14 verdict task 7):
    each member store's health verb side by side, plus the write-ahead
    decision log's depth — committed batch count, last committed batch
    id, and any half-written ``__tmp`` dirs (a nonzero count after a
    clean startup means ``recover_curation_stores`` has not run).
    Metadata-only: every member verb reads catalogs/file listings and
    1-row stats tables, no data-sized scan — safe to call on a
    maintenance cadence from the live loop."""
    from flink_wsr_project_spark.operators.store_health import (
        signature_store_health,
        span_store_health,
    )

    report: dict = {
        "sig": signature_store_health(spark, sig_prefix),
        "span": span_store_health(spark, span_prefix),
    }
    if lm_prefix is not None:
        from flink_wsr_project_spark.operators.lm_store import lm_store_health

        report["lm"] = lm_store_health(spark, lm_prefix)
    if search_prefix is not None:
        from flink_wsr_project_spark.operators.store_health import (
            search_index_health,
        )

        report["search"] = search_index_health(spark, search_prefix)
    if image_prefix is not None:
        from flink_wsr_project_spark.operators.store_health import (
            dhash_store_health,
        )

        report["image"] = dhash_store_health(spark, image_prefix)
    if ann_prefix is not None:
        from flink_wsr_project_spark.operators.store_health import (
            ann_index_health,
        )

        report["ann"] = ann_index_health(spark, ann_prefix)

    committed: list[int] = []
    takedowns = 0
    tmp = 0
    if os.path.isdir(decision_log):
        for entry in os.listdir(decision_log):
            if entry.endswith("__tmp"):
                tmp += 1
            elif entry.startswith("batch="):
                tag = entry.split("=", 1)[1]
                if tag.lstrip("-").isdigit():
                    committed.append(int(tag))
            elif entry.startswith("takedown="):
                takedowns += 1
    report["decision_log"] = {
        "committed_batches": len(committed),
        "last_committed_batch": max(committed) if committed else None,
        "committed_takedowns": takedowns,
        "pending_tmp_dirs": tmp,
    }
    return report
