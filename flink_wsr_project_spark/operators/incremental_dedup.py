"""Incremental dedup against a persisted signature store.

The registered ``dedup_incremental`` query (plans/pipeline_queries.py)
models the increment-vs-corpus split with a predicate over one table so
the whole path stays a single oracle-checkable SQL statement. THIS
module is the deployment shape that query's docstring describes: the
corpus's signatures are written ONCE, bucketed on the join keys, and
every future increment joins against the store without the corpus ever
being re-scanned, re-hashed, or re-shuffled.

Store layout (two bucketed tables):

* ``<prefix>_longsigs``  (doc_id, b, h)  bucketed by ``(b, h)`` — the
  LSH band index the increment's candidate join probes. The bucket
  key is the candidate join's EXACT key set: bucketing by ``h`` alone
  leaves Spark re-shuffling the store to ``(b, h)`` whenever the
  optimizer does not broadcast it (subset partitioning does not
  satisfy co-partitioning under the default
  ``spark.sql.requireAllClusterKeysForCoPartition=true``) — measured
  in tests/test_writers.py's broadcast-disabled plan walk;
* ``<prefix>_hashed``    (doc_id, hv array<bigint>)  bucketed by
  ``doc_id`` — the polynomial shingle-hash arrays the Jaccard verify
  needs (ints, not shingle strings: the store must not hold a second
  copy of the corpus text).

The hashing scheme's identity is stamped on the store at write time
(``SIG_HASH_FORMAT_PROP`` — the span/image store discipline) and
validated on every probe/absorb/compact: a store hashed under one
scheme and probed under another would silently match nothing and
decide 'keep' for every true dup. Stores written before r16 (the
md5-per-shingle-string scheme) fail loudly until rebuilt with
``write_signature_store``.

At 100 TB the cost of an increment is: one signature scan over Δ only,
one equi-join of Δ's N_BANDS·|Δ| band rows against the bucketed store
(only the Δ side shuffles — asserted in tests/test_writers.py), and one
verify join per candidate against the bucketed hash arrays (again only
the Δ side shuffles). The corpus×corpus work was paid once, when the
corpus itself was deduped.

Verify parity note: the store verifies Jaccard over the hashed
shingle SETS (31-bit polynomial hashes) while the one-statement query
verifies over the shingle strings themselves — identical unless two
distinct shingles of a candidate pair collide in 31 bits, which would
shift that pair's Jaccard by ~1/|union|. The equivalence on real data
is asserted (store decisions == registered-query decisions) in the
writer tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from flink_wsr_project_spark.operators.dedup import (
    SIG_HASH_FORMAT,
    jaccard_expr,
    longsigs_select,
    shingle_hash_array_expr,
    signature_sql,
    toks_expr,
)
from flink_wsr_project_spark.sources.writers import write_bucketed

# Jaccard verify threshold — same evidence bar as the batch chain
# (_neardup_edges_ctes) and the registered dedup_incremental query.
VERIFY_JACCARD = 0.5

# Table property recording the store's hash-prefix partition count, so
# probes and absorbs discover the layout from the catalog instead of a
# parameter that could drift from what was written.
HASH_PARTITIONS_PROP = "spark_graft.hash_partitions"

# Catalog property carrying the signature hashing scheme's identity
# (r16 — the span store's SPAN_HASH_FORMAT discipline applied here
# when the scheme changed from md5-per-shingle-string to the
# polynomial token-code chain). Stamped on the longsigs table at
# write time, validated by every probe/absorb/compact.
SIG_HASH_FORMAT_PROP = "spark_graft.sig_hash_format"


def _check_sig_hash_format(spark: SparkSession, table_prefix: str) -> None:
    rows = spark.sql(f"SHOW TBLPROPERTIES {table_prefix}_longsigs").collect()
    fmt = {r.key: r.value for r in rows}.get(SIG_HASH_FORMAT_PROP)
    if fmt is None:
        raise ValueError(
            f"signature store '{table_prefix}' carries no recorded hash "
            f"format ({SIG_HASH_FORMAT_PROP} missing) — written by an "
            "older scheme (pre-r16 md5 shingle strings) or an "
            "interrupted write; rebuild it with write_signature_store "
            "(probing blind would silently match nothing and keep "
            "every true dup)"
        )
    if fmt != SIG_HASH_FORMAT:
        raise ValueError(
            f"signature store '{table_prefix}' was written under hash "
            f"format '{fmt}' but this code produces '{SIG_HASH_FORMAT}' "
            "— rebuild the store with write_signature_store"
        )


def _store_hash_partitions(spark: SparkSession, table: str) -> int:
    """Partition count a partitioned store was written with (0 = the
    store is bucketed-only)."""
    rows = spark.sql(f"SHOW TBLPROPERTIES {table}").collect()
    for r in rows:
        if r.key == HASH_PARTITIONS_PROP:
            return int(r.value)
    return 0


def _longsigs_df(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """(doc_id, b, h) band rows for ``docs`` — one in-row posexplode,
    no shuffle."""
    docs.createOrReplaceTempView("_sig_input")
    return spark.sql(
        f"WITH sigs AS ({signature_sql('spark', '_sig_input')})\n"
        f"{longsigs_select('spark')}"
    )


def _hashed_df(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """(doc_id, hv) polynomial shingle-hash arrays for ``docs`` — the
    in-row form (``shingle_hash_array_expr``), value-identical to the
    batch signature path's exploded shingle hashes. Two selects so the
    token array binds to a column before the lambda indexes it."""
    return docs.selectExpr(
        "doc_id",
        f"{toks_expr('text', 'spark')} AS _t",
        "trim(text) AS _txt",
    ).selectExpr(
        "doc_id",
        f"{shingle_hash_array_expr('_t', '_txt', 'spark')} AS hv",
    )


def write_signature_store(
    spark: SparkSession,
    corpus_docs: DataFrame,
    table_prefix: str,
    num_buckets: int = 8,
    hash_partitions: int = 0,
) -> None:
    """One-time (or per-compaction) corpus signature write: band rows
    bucketed by the candidate-join key ``h``, hash arrays bucketed by
    the verify-join key ``doc_id``. After this, increments never touch
    the corpus text again.

    With ``hash_partitions = P > 0`` each table additionally gets a
    hash-prefix PARTITION column (``hp = pmod(xxhash64(h), P)`` on the band rows,
    ``dp = pmod(doc_id, P)`` on the hash arrays) under the bucketing.
    Partitioning is what makes the SMALL-Δ fast path
    (:func:`dedup_incremental_from_store_pruned`) possible: a probe
    whose band rows touch only a few of the P prefixes reads only those
    directories (directory-level partition pruning), instead of
    scanning the whole store the way the bucketed-only layout must. P
    is recorded as a table property so probes/absorbs discover the
    layout from the catalog. Keep P modest (tens): files per write =
    P × num_buckets, and the pruned probe's driver-side partition list
    is bounded by P."""
    if hash_partitions < 0:
        raise ValueError(
            f"hash_partitions must be >= 0, got {hash_partitions} "
            "(0 = bucketed-only layout)"
        )
    ls = _longsigs_df(spark, corpus_docs)
    hd = _hashed_df(spark, corpus_docs)
    if hash_partitions:
        _write_partitioned_bucketed(
            ls.withColumn("hp", F.pmod(F.xxhash64("h"), F.lit(hash_partitions))),
            f"{table_prefix}_longsigs", "hp", ["b", "h"], num_buckets,
        )
        _write_partitioned_bucketed(
            hd.withColumn("dp", F.pmod("doc_id", F.lit(hash_partitions))),
            f"{table_prefix}_hashed", "dp", ["doc_id"], num_buckets,
        )
        for t in (f"{table_prefix}_longsigs", f"{table_prefix}_hashed"):
            spark.sql(
                f"ALTER TABLE {t} SET TBLPROPERTIES "
                f"('{HASH_PARTITIONS_PROP}'='{hash_partitions}')"
            )
    else:
        write_bucketed(ls, f"{table_prefix}_longsigs", ["b", "h"], num_buckets)
        write_bucketed(hd, f"{table_prefix}_hashed", ["doc_id"], num_buckets)
    spark.sql(
        f"ALTER TABLE {table_prefix}_longsigs SET TBLPROPERTIES "
        f"('{SIG_HASH_FORMAT_PROP}'='{SIG_HASH_FORMAT}')"
    )


def _write_partitioned_bucketed(
    df: DataFrame, table: str, part_col: str, bucket_cols: list[str], num_buckets: int
) -> None:
    (
        df.write.partitionBy(part_col)
        .bucketBy(num_buckets, *bucket_cols)
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(table)
    )


def delete_from_signature_store(
    spark: SparkSession, table_prefix: str, doc_ids: DataFrame
) -> int:
    """Takedown: mark docs deleted (operators/tombstones.py — one
    O(|ids|) append, no store rewrite). Effects: probes stop matching
    the deleted docs immediately (their candidate rows anti-join away,
    so a deleted KEEPER releases its dup claims); absorbs — replays
    included — refuse to re-add them even after compaction has
    physically dropped their rows; the next
    :func:`compact_signature_store` reclaims the physical rows.
    Re-admission is the explicit ``clear_tombstones``. Returns the
    number of ids recorded."""
    from flink_wsr_project_spark.operators.tombstones import add_tombstones

    return add_tombstones(spark, table_prefix, doc_ids, "doc_id")


def absorb_kept_into_store(
    spark: SparkSession,
    batch_docs: DataFrame,
    decisions: DataFrame,
    table_prefix: str,
    num_buckets: int = 8,
    exclude_existing: bool = False,
) -> int:
    """Fold an increment's KEPT docs into the store so the NEXT
    increment sees them as corpus — the day-over-day loop. One append
    of the kept docs' signature rows to each bucketed table (bucketed
    appends add files per bucket; no corpus rewrite, no shuffle of
    existing data). Dropped docs are deliberately NOT absorbed: their
    keeper already represents them, so absorbing them would only grow
    buckets without adding recall — the same reason the batch chain's
    drop set never re-enters candidate generation. Returns the number
    of docs absorbed.

    At 100 TB the append-files-per-bucket pattern eventually fragments
    the store; the remedy is the standard compaction pass
    (``sources.writers.compact_parquet`` per bucket, or a periodic
    full ``write_signature_store`` rewrite), scheduled by file count —
    the store stays correct at any fragmentation level.

    ``exclude_existing=True`` anti-joins the kept docs against the
    store's own doc_ids before appending, making the absorb IDEMPOTENT
    under replay — the contract a ``foreachBatch`` absorb loop needs,
    where a crashed micro-batch is re-run at-least-once and must not
    double-append docs it already absorbed. The anti-join probes the
    ``doc_id``-bucketed hash table, so the store side stays
    shuffle-free; cost is one extra |Δ|-sized pass.
    """
    from flink_wsr_project_spark.operators.iterative import (
        local_checkpoint_tracked,
        release_persistent_rdds,
    )

    _check_sig_hash_format(spark, table_prefix)
    # MATERIALIZE the kept set before the first append: ``decisions``
    # is a lazy plan that READS the store tables, so executing it after
    # the store has been appended to would re-evaluate against the
    # mutated store — an already-absorbed doc becomes its own corpus
    # dup, flips to non-keep, and silently drops out of the SECOND
    # append, leaving the store with band rows but no hash array for
    # it (every later verify against it fails). localCheckpoint pins
    # the pre-append answer (sized by |Δ|, executor-distributed).
    from flink_wsr_project_spark.operators.retention import live_rows

    kept_plan = batch_docs.join(
        decisions.where(F.col("decision") == "keep").select("doc_id"), "doc_id"
    )
    # tombstones AND the retention watermark mask UNCONDITIONALLY (not
    # just exclude_existing): a deleted or expired doc must not
    # re-enter via any absorb — including a replayed batch arriving
    # AFTER compaction physically dropped the rows the
    # exclude_existing anti-join would have matched
    kept_plan = live_rows(spark, kept_plan, table_prefix, "doc_id")
    if exclude_existing:
        kept_plan = kept_plan.join(
            spark.table(f"{table_prefix}_hashed").select("doc_id"),
            "doc_id",
            "left_anti",
        )
    kept, ckpt_ids = local_checkpoint_tracked(kept_plan)
    try:
        n = kept.count()
        p = _store_hash_partitions(spark, f"{table_prefix}_longsigs")
        ls, hd = _longsigs_df(spark, kept), _hashed_df(spark, kept)
        if p:
            ls = ls.withColumn("hp", F.pmod(F.xxhash64("h"), F.lit(p)))
            hd = hd.withColumn("dp", F.pmod("doc_id", F.lit(p)))
        _append_bucketed(
            ls, f"{table_prefix}_longsigs", "hp" if p else None, ["b", "h"], num_buckets
        )
        _append_bucketed(
            hd, f"{table_prefix}_hashed", "dp" if p else None, ["doc_id"], num_buckets
        )
    finally:
        release_persistent_rdds(spark, ckpt_ids)
    return n


def _append_bucketed(
    df: DataFrame,
    table: str,
    part_col: str | None,
    bucket_cols: list[str],
    num_buckets: int,
) -> None:
    """Append to an existing bucketed table with the SAME bucket spec —
    Spark validates the spec against the metastore entry, so a drifted
    bucket count fails loudly instead of silently corrupting layout."""
    w = df.write
    if part_col:
        w = w.partitionBy(part_col)
    w.bucketBy(num_buckets, *bucket_cols).mode("append").format("parquet").saveAsTable(table)


def compact_signature_store(
    spark: SparkSession,
    table_prefix: str,
) -> dict[str, int]:
    """Rewrite the store tables to one file per bucket (per hp/dp
    partition for a hash-partitioned store). Every
    ``absorb_kept_into_store`` appends one file set per bucket, so a
    long-running store accumulates files linearly with increments —
    correctness is unaffected (bucket membership is by hash, not by
    file) but scan/open cost grows. Compaction reads each table,
    pins the rows (localCheckpoint — the source table is about to be
    dropped, so the plan must not reference it lazily; the same
    read-your-writes discipline as the absorb path), rewrites it
    bucketed under a temp name, and swaps via DROP + ALTER TABLE
    RENAME. Crash recovery: until the DROP, the original is intact;
    between DROP and RENAME the ``<table>__compact`` temp holds the
    full data — both states are recoverable by
    :func:`recover_store_compaction` (idempotent; run at store
    startup). Returns {table: row_count after compaction}.

    The bucket count is discovered from the catalog, never passed in:
    the overwrite-to-temp rewrite bypasses append-time spec
    validation, so a drifted parameter would silently re-bucket the
    store and break every later (validated) absorb append.

    The longsigs rewrite applies ``dropDuplicates`` — the table is a
    set by construction, but a crash BETWEEN absorb's two appends
    (longsigs lands first; the replay idempotency anti-join checks
    only the hashed table) replays the band rows, so compaction is
    where replay-duplicated longsigs rows get healed. Decisions were
    already immune (the probe distincts its candidates); this stops
    the store bloat and duplicate stream emissions.

    TOMBSTONES are applied physically here (r13): both tables rewrite
    MINUS the deleted ids — the reclamation the delete itself deferred
    — and the tombstone table is then rewritten deduplicated but KEPT
    (deleted ids must keep masking absorb replays forever; re-admission
    is the explicit ``clear_tombstones``).
    """
    from flink_wsr_project_spark.operators.iterative import (
        local_checkpoint_tracked,
        release_persistent_rdds,
    )
    from flink_wsr_project_spark.operators.retention import live_rows
    from flink_wsr_project_spark.operators.tombstones import (
        rewrite_tombstones_deduped,
    )
    from flink_wsr_project_spark.sources.writers import table_bucket_spec

    _check_sig_hash_format(spark, table_prefix)
    out: dict[str, int] = {}
    for suffix, part_col, bucket_cols in (
        ("longsigs", "hp", ["b", "h"]),
        ("hashed", "dp", ["doc_id"]),
    ):
        table = f"{table_prefix}_{suffix}"
        tmp = f"{table}__compact"
        p = _store_hash_partitions(spark, table)
        num_buckets, actual_cols = table_bucket_spec(spark, table)
        if num_buckets <= 0:
            raise ValueError(
                f"{table} carries no bucket spec in the catalog — not a "
                "signature-store table written by write_signature_store"
            )
        if actual_cols != bucket_cols:
            # refuse rather than silently re-bucket: the rewrite goes
            # through an overwrite, which would change the physical
            # spec under the operator (e.g. a store persisted before
            # longsigs moved from [h] to [b, h] bucketing)
            raise ValueError(
                f"{table} is bucketed by {actual_cols}, this code writes "
                f"{bucket_cols} — the store predates the current layout; "
                "rebuild it with write_signature_store before absorbing "
                "or compacting"
            )
        spark.sql(f"DROP TABLE IF EXISTS {tmp}")
        source = live_rows(spark, spark.table(table), table_prefix, "doc_id")
        if suffix == "longsigs":
            source = source.dropDuplicates()
        pinned, ckpt_ids = local_checkpoint_tracked(source)
        try:
            out[table] = pinned.count()
            w = pinned.repartition(num_buckets, *bucket_cols).write
            if p:
                # preserve the partitioned layout (and its recorded P)
                # through the rewrite — compaction must not silently
                # demote a partitioned store to bucketed-only
                w = w.partitionBy(part_col)
            (
                w.bucketBy(num_buckets, *bucket_cols)
                .mode("overwrite")
                .format("parquet")
                .saveAsTable(tmp)
            )
            if p:
                spark.sql(
                    f"ALTER TABLE {tmp} SET TBLPROPERTIES "
                    f"('{HASH_PARTITIONS_PROP}'='{p}')"
                )
            if suffix == "longsigs":
                # re-stamp the hash-format identity BEFORE the swap so
                # every crash state (original intact, or tmp-only) still
                # carries it — recovery must never produce an unstamped
                # store
                spark.sql(
                    f"ALTER TABLE {tmp} SET TBLPROPERTIES "
                    f"('{SIG_HASH_FORMAT_PROP}'='{SIG_HASH_FORMAT}')"
                )
            spark.sql(f"DROP TABLE {table}")
            spark.sql(f"ALTER TABLE {tmp} RENAME TO {table}")
            if p:
                # RENAME moves the managed root dir but the catalog's
                # per-partition locations still point at the old path —
                # resync them from the directory layout
                spark.sql(f"MSCK REPAIR TABLE {table} SYNC PARTITIONS")
        finally:
            release_persistent_rdds(spark, ckpt_ids)
    rewrite_tombstones_deduped(spark, table_prefix)
    return out


def dedup_incremental_from_store(
    spark: SparkSession,
    batch_docs: DataFrame,
    table_prefix: str,
) -> DataFrame:
    """Dedup ``batch_docs`` (the increment Δ) against the persisted
    corpus signature store + within Δ itself. Returns one row per batch
    doc: (doc_id, decision ∈ keep | dup_of_corpus | dup_within_batch,
    dup_of) — the same decision contract as the registered
    ``dedup_incremental`` query (corpus claims outrank batch claims;
    within the batch the smaller doc_id wins; ``dup_of`` is the
    smallest claiming partner on the winning side).

    Plan shape: Δ's band rows shuffle once to the store's ``(b, h)``
    bucketing for the candidate join — the FULL join key, the r11 fix:
    bucketing by the subset ``h`` alone does not co-partition a
    ``(b, h)`` equi-join, so every increment would have re-shuffled
    the corpus wherever broadcast is impossible (the layout the
    compactor now refuses to deviate from, ``tests/test_writers.py``'s
    plan-tree walk). Candidates then verify against the
    ``doc_id``-bucketed hash arrays (store side shuffle-free both
    times); the within-batch arm is a self-join of Δ's own band rows —
    all candidate work is linear in |Δ| for a fixed corpus bucket-size
    distribution."""
    from flink_wsr_project_spark.operators.retention import live_rows

    _check_sig_hash_format(spark, table_prefix)
    bls = _longsigs_df(spark, batch_docs)
    batch_longsigs = bls.alias("bl")
    batch_hashed = _hashed_df(spark, batch_docs)
    # explicit selects: a partitioned store carries hp/dp layout columns
    # that must not leak into the unions below. Tombstoned docs
    # anti-join away at candidate generation (broadcast of the bounded
    # deleted-id set — the store side stays exchange-free), so a
    # deleted doc neither matches nor claims; the hashed table needs no
    # mask — it is only ever joined BY surviving candidates' ids.
    store_longsigs = live_rows(
        spark,
        spark.table(f"{table_prefix}_longsigs").select("doc_id", "b", "h"),
        table_prefix,
        "doc_id",
    )
    store_hashed = spark.table(f"{table_prefix}_hashed").select("doc_id", "hv")

    jac = F.expr(jaccard_expr("sa.hv", "sb.hv", "spark"))

    corpus_cand = (
        batch_longsigs.join(
            store_longsigs.alias("cl"),
            (F.col("bl.b") == F.col("cl.b"))
            & (F.col("bl.h") == F.col("cl.h"))
            # self-exclusion: a no-op while corpus ∩ batch = ∅, but a
            # replayed micro-batch (at-least-once foreachBatch absorb)
            # probes docs the store already holds — they must not
            # become corpus-dups of themselves
            & (F.col("bl.doc_id") != F.col("cl.doc_id")),
        )
        .select(
            F.col("bl.doc_id").alias("doc_a"),
            F.col("cl.doc_id").alias("doc_b"),
            F.lit("corpus").alias("side"),
        )
        .distinct()
    )
    batch_cand = (
        batch_longsigs.join(
            bls.alias("bm"),
            (F.col("bl.b") == F.col("bm.b"))
            & (F.col("bl.h") == F.col("bm.h"))
            & (F.col("bm.doc_id") < F.col("bl.doc_id")),
        )
        .select(
            F.col("bl.doc_id").alias("doc_a"),
            F.col("bm.doc_id").alias("doc_b"),
            F.lit("batch").alias("side"),
        )
        .distinct()
    )

    # Verify each candidate arm against ITS OWN partner table instead
    # of one union: a store_hashed ∪ batch_hashed union would discard
    # the store's doc_id bucketing, so absent a (stats-dependent)
    # broadcast the corpus-sized hashed table would shuffle — the exact
    # store-side exchange this module's contract forbids. Split, the
    # corpus arm's partners come from the bucketed table (only the
    # Δ-bounded cand side exchanges) and the batch arm never touches
    # the store at all. The arms carry disjoint ``side`` literals, so
    # per-arm distinct() above equals distinct() over the old union.
    def _verify(arm: DataFrame, partner: DataFrame) -> DataFrame:
        return (
            arm.join(batch_hashed.alias("sa"), arm.doc_a == F.col("sa.doc_id"))
            .join(partner.alias("sb"), arm.doc_b == F.col("sb.doc_id"))
            .where(jac >= VERIFY_JACCARD)
            .select("doc_a", "doc_b", "side")
        )

    verified = _verify(corpus_cand, store_hashed).unionByName(
        _verify(batch_cand, batch_hashed)
    )

    return _decisions(batch_docs, verified)


def _decisions(batch_docs: DataFrame, verified: DataFrame) -> DataFrame:
    """Verified (doc_a, doc_b, side) edges → one decision row per batch
    doc. Corpus claims outrank batch claims; ``dup_of`` is the smallest
    claiming partner on the winning side."""
    dup_partner = verified.groupBy(F.col("doc_a").alias("doc_id")).agg(
        F.min(F.when(F.col("side") == "corpus", F.col("doc_b"))).alias("corpus_dup"),
        F.min(F.when(F.col("side") == "batch", F.col("doc_b"))).alias("batch_dup"),
    )

    return (
        batch_docs.select("doc_id")
        .join(dup_partner, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("corpus_dup").isNotNull(), F.lit("dup_of_corpus"))
            .when(F.col("batch_dup").isNotNull(), F.lit("dup_within_batch"))
            .otherwise(F.lit("keep"))
            .alias("decision"),
            F.coalesce("corpus_dup", "batch_dup").alias("dup_of"),
        )
    )


def dedup_incremental_from_store_pruned(
    spark: SparkSession,
    batch_docs: DataFrame,
    table_prefix: str,
) -> DataFrame:
    """SMALL-Δ fast path over a PARTITIONED store (written with
    ``hash_partitions = P > 0``): same decision contract as
    :func:`dedup_incremental_from_store`, but the store is neither
    shuffled NOR fully scanned.

    How: Δ's band rows are materialized once (localCheckpoint, sized by
    |Δ|), their distinct hash prefixes ``pmod(xxhash64(h), P)`` are collected —
    a driver list bounded by the CONSTANT P, not by data — and pushed
    into the band-table scan as a literal ``hp IN (...)`` filter, which
    prunes at the directory level (PartitionFilters). The candidate
    join then BROADCASTS the Δ side, so the pruned store scan streams
    through map-side. Verify repeats the trick on the hash-array table:
    the candidate set (small, Δ-bounded) is materialized, its corpus
    partners' ``pmod(doc_id, P)`` prefixes prune the ``dp`` partitions,
    and the candidates broadcast into the verify join.

    When Δ touches most of the P prefixes the IN-list prunes nothing
    and this degrades gracefully to the regular probe's scan cost plus
    two Δ-bounded collects — use the regular (bucketed-join) path for
    bulk increments; THIS path is for straggler micro-batches and
    "is this doc already in the corpus?" lookups, where reading P
    directories to answer one doc is the difference that matters at
    100 TB."""
    _check_sig_hash_format(spark, table_prefix)
    p = _store_hash_partitions(spark, f"{table_prefix}_longsigs")
    if p <= 0:
        raise ValueError(
            f"store '{table_prefix}' is not hash-partitioned; write it with "
            "hash_partitions > 0 or use dedup_incremental_from_store"
        )
    jac = F.expr(jaccard_expr("sa.hv", "sb.hv", "spark"))

    # No checkpoints here: unlike the absorb path, nothing mutates the
    # store between these steps, so the Δ-sized subtrees that get
    # re-executed for the two bounded collects are deterministic and
    # cheap — and the returned frame stays a lazy, inspectable plan.
    bls = _longsigs_df(spark, batch_docs)
    hps = [
        r.hp for r in bls.select(F.pmod(F.xxhash64("h"), F.lit(p)).alias("hp")).distinct().collect()
    ]  # ≤ P values — bounded by the layout constant, not by |Δ|

    from flink_wsr_project_spark.operators.retention import live_rows

    store_ls = live_rows(
        spark,
        spark.table(f"{table_prefix}_longsigs")
        .where(F.col("hp").isin(hps))
        .select("doc_id", "b", "h"),
        table_prefix,
        "doc_id",
    )
    corpus_cand = (
        store_ls.alias("cl")
        .join(
            F.broadcast(bls.alias("bl")),
            (F.col("bl.b") == F.col("cl.b"))
            & (F.col("bl.h") == F.col("cl.h"))
            # self-exclusion — same replayed-micro-batch rationale as
            # the regular probe
            & (F.col("bl.doc_id") != F.col("cl.doc_id")),
        )
        .select(
            F.col("bl.doc_id").alias("doc_a"),
            F.col("cl.doc_id").alias("doc_b"),
            F.lit("corpus").alias("side"),
        )
    )
    batch_cand = (
        bls.alias("bl")
        .join(
            F.broadcast(bls.alias("bm")),
            (F.col("bl.b") == F.col("bm.b"))
            & (F.col("bl.h") == F.col("bm.h"))
            & (F.col("bm.doc_id") < F.col("bl.doc_id")),
        )
        .select(
            F.col("bl.doc_id").alias("doc_a"),
            F.col("bm.doc_id").alias("doc_b"),
            F.lit("batch").alias("side"),
        )
    )
    cand = corpus_cand.unionByName(batch_cand).distinct()
    dps = [
        r.dp
        for r in cand.where(F.col("side") == "corpus")
        .select(F.pmod("doc_b", F.lit(p)).alias("dp"))
        .distinct()
        .collect()
    ]  # ≤ P values again

    batch_hashed = _hashed_df(spark, batch_docs)
    store_hd = (
        spark.table(f"{table_prefix}_hashed")
        .where(F.col("dp").isin(dps) if dps else F.lit(False))
        .select("doc_id", "hv")
    )
    partner_hashed = store_hd.unionByName(batch_hashed)
    verified = (
        partner_hashed.alias("sb")
        .join(F.broadcast(cand), cand.doc_b == F.col("sb.doc_id"))
        .join(F.broadcast(batch_hashed.alias("sa")), cand.doc_a == F.col("sa.doc_id"))
        .where(jac >= VERIFY_JACCARD)
        .select("doc_a", "doc_b", "side")
    )
    return _decisions(batch_docs, verified)


def recover_store_compaction(spark: SparkSession, table_prefix: str) -> list[str]:
    """Complete an interrupted ``compact_signature_store`` swap: for
    each store table caught in the DROP→RENAME crash window (only the
    ``__compact`` temp exists), rename the temp into place; stale
    temps next to a live table are dropped. Idempotent — run it
    unconditionally at store startup. Returns the recovered table
    names."""
    from flink_wsr_project_spark.sources.writers import finish_table_swap

    from flink_wsr_project_spark.operators.retention import recover_retention
    from flink_wsr_project_spark.operators.tombstones import recover_tombstones

    recovered = []
    for suffix in ("longsigs", "hashed"):
        table = f"{table_prefix}_{suffix}"
        if finish_table_swap(spark, table):
            recovered.append(table)
    if recover_tombstones(spark, table_prefix):
        recovered.append(f"{table_prefix}_tombstones")
    if recover_retention(spark, table_prefix):
        recovered.append(f"{table_prefix}_retention")
    return recovered
