"""End-to-end corpus curation — the operators composed the way a
training-data pipeline actually runs them:

    raw documents
      → exact dedup (content-hash keep list)
      → near-dup dedup (MinHash-LSH pairs → connected components →
        keep the canonical doc per component)
      → quality gate (Gopher-style length / chars-per-token bounds)
      → curated corpus + per-stage accounting

Everything is DataFrame-composed: one Spark job graph per output, no
intermediate materialization required (callers may cache/write the
curated frame). The invariant — re-running near-dup detection on the
curated output finds nothing — is asserted in tests/test_pipeline.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from flink_wsr_project_spark.plans.pipeline_queries import (
    _dedup_minhash_lsh_sql,
    dedup_components,
)
from flink_wsr_project_spark.sources.readers import load_table

JACCARD_KEEP = 0.5


def curate_corpus(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Run the full curation chain; returns the curated corpus plus
    per-stage frames for accounting/audit."""
    docs = load_table(spark, "documents", sf_dir)

    # 1. exact dedup: smallest doc_id survives per content hash
    exact_keep = (
        docs.groupBy(F.md5("text").alias("h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    after_exact = docs.join(exact_keep, "doc_id", "left_semi")

    # 2. near-dup dedup: canonical (min doc_id) per connected component
    labels = dedup_components(spark, sf_dir)  # (doc_id, component_id)
    canonical = labels.filter(F.col("doc_id") == F.col("component_id")).select("doc_id")
    after_neardup = after_exact.join(canonical, "doc_id", "left_semi")

    # 3. quality gate (same bounds as doc_quality_score)
    toks = F.split(F.trim(F.col("text")), r"\s+")
    passes = F.size(toks).between(10, 10000) & (
        F.length("text") / F.size(toks)
    ).between(3, 15)
    curated = after_neardup.filter(passes)
    rejected = after_neardup.filter(~passes)

    return {
        "raw": docs,
        "after_exact": after_exact,
        "after_neardup": after_neardup,
        "curated": curated,
        "rejected_quality": rejected,
    }


def curation_report(stages: dict[str, DataFrame]) -> DataFrame:
    """One-row accounting frame (counts per stage)."""
    spark = stages["raw"].sparkSession
    row = {name: df.count() for name, df in stages.items()}
    return spark.createDataFrame([row])


def recheck_neardups(spark: SparkSession, curated: DataFrame) -> DataFrame:
    """Re-run MinHash-LSH over an arbitrary curated frame — the
    pipeline's self-check (empty result ⟺ dedup actually converged)."""
    curated.select("doc_id", "text").createOrReplaceTempView("documents")
    return spark.sql(_dedup_minhash_lsh_sql("spark")).filter(
        F.col("jaccard") >= JACCARD_KEEP
    )


# ---------------------------------------------------------------------------
# Incremental ingest: admit new batches against persisted dedup state
# ---------------------------------------------------------------------------

_STATE_COLS = ("doc_id", "text_hash", "band0", "band1", "band2", "band3", "sh")


def _doc_state_frame(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """Dedup state rows for a document frame: content hash + LSH bands +
    shingle set. One scan; the raw text never enters the state.

    Uses the FRAME's own session for view + SQL: inside ``foreachBatch``
    the batch DataFrame belongs to a cloned microbatch session, and a
    temp view registered there is invisible to the outer session."""
    from flink_wsr_project_spark.operators.dedup import signature_sql, shingled_cte

    sess = docs.sparkSession
    docs.select("doc_id", "text").createOrReplaceTempView("documents")
    sig = signature_sql("spark")
    return sess.sql(
        f"""
WITH banded AS ({sig}),
{shingled_cte("spark")}
SELECT d.doc_id, md5(d.text) AS text_hash,
       b.band0, b.band1, b.band2, b.band3, s.sh
FROM documents d
JOIN banded b ON d.doc_id = b.doc_id
JOIN shingled s ON d.doc_id = s.doc_id
"""
    )


def _check_ingest_sig_format(state_path: str, have_state: bool) -> None:
    """Validate the directory state's recorded signature-hash scheme
    against the code's (``operators.dedup.SIG_HASH_FORMAT``) — the
    catalog stores' stamp discipline on the ingest pipeline's
    directory state. Band values hashed under one scheme never match
    another's, so probing blind would silently admit every true dup.
    State written before the marker existed (pre-r16) fails loudly
    until rebuilt."""
    import os

    from flink_wsr_project_spark.operators.dedup import SIG_HASH_FORMAT

    marker = os.path.join(state_path, "_sig_format")
    if os.path.exists(marker):
        with open(marker) as f:
            fmt = f.read().strip()
        if fmt != SIG_HASH_FORMAT:
            raise ValueError(
                f"ingest state '{state_path}' was written under signature "
                f"hash format '{fmt}' but this code produces "
                f"'{SIG_HASH_FORMAT}' — rebuild the state (re-ingest) "
                "before admitting batches"
            )
    elif have_state:
        raise ValueError(
            f"ingest state '{state_path}' carries no recorded signature "
            "hash format (_sig_format marker missing — written by a "
            "pre-r16 scheme or an interrupted first commit); rebuild "
            "the state before admitting batches (probing blind would "
            "silently admit every true dup)"
        )


def _write_ingest_sig_format(state_path: str) -> None:
    """Record the signature scheme on first commit (tmp+rename so a
    crash never leaves a truncated marker)."""
    import os

    from flink_wsr_project_spark.operators.dedup import SIG_HASH_FORMAT

    marker = os.path.join(state_path, "_sig_format")
    if os.path.exists(marker):
        return
    tmp = marker + ".tmp"
    with open(tmp, "w") as f:
        f.write(SIG_HASH_FORMAT + "\n")
    os.replace(tmp, marker)


def delete_from_ingest_state(
    spark: SparkSession, state_path: str, doc_ids: DataFrame
) -> int:
    """Takedown for the DIRECTORY-state ingest pipeline — the fourth
    persisted-state surface, same contract as the catalog stores
    (operators/tombstones.py): one O(|ids|) parquet append under
    ``<state_path>/_tombstones/`` (the underscore prefix makes the dir
    INVISIBLE to the state read's partition discovery — Spark skips
    underscore-prefixed paths — so no read-path change can ever leak
    tombstone rows as state rows). Deleted docs stop claiming incoming
    duplicates on the next ``ingest_batch``; a replayed batch_id stays
    the committed no-op it always was; ``compact_ingest_state``
    physically reclaims their state rows. Returns the number of ids
    recorded."""
    import os
    import uuid

    d = os.path.join(state_path, "_tombstones")
    os.makedirs(d, exist_ok=True)
    rows = doc_ids.select(F.col("doc_id").cast("long")).distinct()
    n = rows.count()
    if n:
        rows.coalesce(1).write.mode("append").parquet(
            os.path.join(d, f"del_{uuid.uuid4().hex[:8]}")
        )
    return n


def _ingest_tombstones(spark: SparkSession, state_path: str) -> DataFrame | None:
    import os

    d = os.path.join(state_path, "_tombstones")
    if not os.path.isdir(d) or not os.listdir(d):
        return None
    return spark.read.parquet(f"{d}/*").select("doc_id").distinct()


def set_ingest_retention(
    spark: SparkSession, state_path: str, min_live_id: int
) -> None:
    """Retention for the DIRECTORY-state ingest pipeline — the bulk
    age-out twin of :func:`delete_from_ingest_state`, same watermark
    contract as the catalog stores (operators/retention.py): docs with
    ``doc_id < min_live_id`` are expired — they stop claiming incoming
    duplicates on the next ``ingest_batch``, expired ids arriving in
    ``new_docs`` are refused admission, and ``compact_ingest_state``
    physically reclaims their state rows. One single-row parquet under
    ``<state_path>/_retention/`` (underscore prefix: invisible to the
    state read's partition discovery); MONOTONIC — lowering is refused
    for the same compaction-timing reason as the catalog watermark."""
    import os

    current = _ingest_retention(spark, state_path)
    if current is not None and min_live_id < current:
        raise ValueError(
            f"ingest-state retention watermark is {current}; lowering it "
            f"to {min_live_id} is refused — expired rows may already be "
            "compacted away. Re-admit old data under new ids."
        )
    from flink_wsr_project_spark.sources.writers import atomic_swap_dir

    d = os.path.join(state_path, "_retention")
    row = spark.createDataFrame([(int(min_live_id),)], "min_live_id BIGINT")
    if current is None:
        os.makedirs(state_path, exist_ok=True)
        row.coalesce(1).write.mode("overwrite").parquet(d)
        return
    tmp = f"{d}__rewrite"
    row.coalesce(1).write.mode("overwrite").parquet(tmp)
    atomic_swap_dir(d, tmp)


def _ingest_retention(spark: SparkSession, state_path: str) -> int | None:
    import os

    d = os.path.join(state_path, "_retention")
    if not os.path.isdir(d) or not os.listdir(d):
        return None
    rows = spark.read.parquet(d).collect()
    return rows[0].min_live_id if rows else None


def compact_ingest_state(spark: SparkSession, state_path: str) -> int:
    """Physically reclaim tombstoned docs' state rows: rewrite each
    ``batch=`` directory minus the deleted ids through the rename-aside
    swap (``sources.writers.atomic_swap_dir`` — every crash point
    leaves a recoverable copy), then rewrite the tombstone dir
    deduplicated but KEEP it (deleted ids must keep masking; the
    shared-store rule). Returns surviving state-row count."""
    import os

    from flink_wsr_project_spark.operators.iterative import (
        local_checkpoint_tracked,
        release_persistent_rdds,
    )
    from flink_wsr_project_spark.sources.writers import atomic_swap_dir

    tombs = _ingest_tombstones(spark, state_path)
    wm = _ingest_retention(spark, state_path)
    total = 0
    for entry in sorted(os.listdir(state_path)):
        if not entry.startswith("batch="):
            continue
        bdir = os.path.join(state_path, entry)
        live = spark.read.parquet(bdir)
        if tombs is not None:
            live = live.join(F.broadcast(tombs), "doc_id", "left_anti")
        if wm is not None:
            # the watermark applies physically here, like tombstones;
            # the _retention dir itself is kept — it must keep masking
            live = live.where(F.col("doc_id") >= F.lit(int(wm)))
        pinned, _ids = local_checkpoint_tracked(live)
        try:
            total += pinned.count()
            tmp = f"{bdir}__rewrite"
            pinned.coalesce(1).write.mode("overwrite").parquet(tmp)
            atomic_swap_dir(bdir, tmp)
        finally:
            release_persistent_rdds(spark, _ids)
    if tombs is not None:
        d = os.path.join(state_path, "_tombstones")
        pinned, _ids = local_checkpoint_tracked(tombs)
        try:
            tmp = f"{d}__rewrite"
            pinned.coalesce(1).write.mode("overwrite").parquet(tmp)
            atomic_swap_dir(d, tmp)
        finally:
            release_persistent_rdds(spark, _ids)
    return total


def ingest_batch(
    spark: SparkSession,
    state_path: str,
    new_docs: DataFrame,
    batch_id: str,
    jaccard_keep: float = JACCARD_KEEP,
) -> dict[str, DataFrame]:
    """Admit ``new_docs`` against the persisted dedup state — the
    continuous form of ``curate_corpus``: history is represented ONLY by
    its hashes/signatures/shingle sets (never re-read, never re-scanned
    at text level).

        1. exact: drop docs whose content hash exists in state or
           repeats within the batch (min doc_id survives);
        2. near-dup: LSH candidates = banded equi-join of the batch's
           signatures against state + within the batch, verified by
           exact shingle Jaccard ≥ ``jaccard_keep``; matched new docs
           drop (against state: state doc wins; within batch: smaller
           doc_id wins — the greedy pair rule, consistent with the
           batch pipeline's min-canonical convention);
        3. admitted docs' state rows append to ``state_path`` under
           ``batch=<batch_id>`` — append-only (no O(corpus) rewrite),
           and IDEMPOTENT: re-running a batch_id that already committed
           is a no-op (exactly-once admission per batch id, the
           foreachBatch contract).

    Scale: per batch, one signature scan of the new docs + 4 banded
    equi-joins against a state whose rows are ~100 bytes of integers
    per admitted document; the candidate space is Σ|bucket|², never
    |state| × |batch|.

    Deletion: ids recorded by :func:`delete_from_ingest_state` are
    masked from BOTH sides — deleted state docs stop claiming incoming
    duplicates, and a deleted id arriving in ``new_docs`` is refused
    admission (returned under ``dropped_deleted``);
    :func:`compact_ingest_state` reclaims the physical rows.

    Relation to ``streaming.dedup.dedup_absorb_foreach_batch``: this
    function owns its OWN directory state and gives exactly-once
    admission per batch_id (re-running a committed id is a no-op) —
    the self-contained ingest pipeline. The absorb loop instead drives
    the SHARED catalog signature store that batch jobs and lookups
    probe (same decision contract as the registered
    ``dedup_incremental`` query, pruned small-Δ path on partitioned
    layouts) with at-least-once replay made safe by an idempotent
    absorb. Pick by who else needs to read the state.
    """
    import os

    from pyspark.sql import Window as W

    batch_dir = os.path.join(state_path, f"batch={batch_id}")
    have_state = os.path.isdir(state_path) and any(
        e.startswith("batch=") for e in os.listdir(state_path)
    )
    _check_ingest_sig_format(state_path, have_state)
    if os.path.isdir(batch_dir):  # idempotent re-run
        return {
            "admitted": new_docs.sparkSession.read.parquet(batch_dir).select("doc_id"),
            "dropped_exact": None,
            "dropped_neardup": None,
            "replayed": True,
        }

    # tombstone mask (delete_from_ingest_state): deleted STATE docs no
    # longer claim incoming duplicates, and deleted ids in the NEW
    # batch are refused admission (reported under ``dropped_deleted``)
    # — the catalog stores' exact deletion contract, on directory state
    tombs = _ingest_tombstones(spark, state_path)
    wm = _ingest_retention(spark, state_path)
    masked_new = new_docs
    if tombs is not None:
        masked_new = masked_new.join(F.broadcast(tombs), "doc_id", "left_anti")
    if wm is not None:
        # expired ids are refused admission — a replayed pre-expiry
        # batch cannot resurrect them (the catalog stores' contract)
        masked_new = masked_new.where(F.col("doc_id") >= F.lit(int(wm)))
    new_state = _doc_state_frame(spark, masked_new).cache()
    state = (
        new_docs.sparkSession.read.parquet(state_path).select(*_STATE_COLS)
        if have_state
        else None
    )
    if state is not None and tombs is not None:
        state = state.join(F.broadcast(tombs), "doc_id", "left_anti")
    if state is not None and wm is not None:
        # expired state docs stop claiming incoming duplicates
        state = state.where(F.col("doc_id") >= F.lit(int(wm)))

    # 1. exact dedup
    w = W.partitionBy("text_hash").orderBy("doc_id")
    first_in_batch = new_state.withColumn(
        "_rn", F.row_number().over(w)
    ).filter(F.col("_rn") == 1).drop("_rn")
    if state is not None:
        survivors = first_in_batch.join(
            state.select("text_hash").distinct(), "text_hash", "left_anti"
        )
    else:
        survivors = first_in_batch
    dropped_exact = new_state.select("doc_id").subtract(survivors.select("doc_id"))

    # 2. near-dup vs state then within batch (banded candidates + verify)
    def lsh_pairs(left: DataFrame, right: DataFrame) -> DataFrame:
        cands = None
        for b in range(4):
            c = left.alias("a").join(
                right.alias("b"), F.col(f"a.band{b}") == F.col(f"b.band{b}")
            ).select(
                F.col("a.doc_id").alias("new_id"),
                F.col("b.doc_id").alias("old_id"),
                F.col("a.sh").alias("sh_a"),
                F.col("b.sh").alias("sh_b"),
            )
            cands = c if cands is None else cands.unionByName(c)
        cands = cands.distinct()
        inter = F.size(F.array_intersect("sh_a", "sh_b"))
        union = F.size(F.array_union("sh_a", "sh_b"))
        return cands.withColumn("jaccard", inter / union).filter(
            F.col("jaccard") >= jaccard_keep
        )

    if state is not None:
        vs_state = lsh_pairs(survivors, state).select("new_id").distinct()
        survivors = survivors.join(
            vs_state, survivors.doc_id == vs_state.new_id, "left_anti"
        )
    within = (
        lsh_pairs(survivors, survivors)
        .filter(F.col("new_id") > F.col("old_id"))
        .select("new_id")
        .distinct()
    )
    survivors = survivors.join(
        within, survivors.doc_id == within.new_id, "left_anti"
    ).cache()
    dropped_neardup = (
        new_state.select("doc_id")
        .subtract(survivors.select("doc_id"))
        .subtract(dropped_exact)
    )

    # 3. commit admitted state rows for this batch (append-only dir)
    survivors.select(*_STATE_COLS).write.mode("errorifexists").parquet(batch_dir)
    _write_ingest_sig_format(state_path)
    new_state.unpersist()
    return {
        "admitted": survivors.select("doc_id"),
        "dropped_exact": dropped_exact,
        "dropped_neardup": dropped_neardup,
        "dropped_deleted": (
            new_docs.select("doc_id").join(F.broadcast(tombs), "doc_id")
            if tombs is not None
            else None
        ),
        "replayed": False,
    }
