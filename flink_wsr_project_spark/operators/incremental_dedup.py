"""Incremental dedup against a persisted signature store.

The registered ``dedup_incremental`` query (plans/pipeline_queries.py)
models the increment-vs-corpus split with a predicate over one table so
the whole path stays a single oracle-checkable SQL statement. THIS
module is the deployment shape that query's docstring describes: the
corpus's signatures are written ONCE, bucketed on the join keys, and
every future increment joins against the store without the corpus ever
being re-scanned, re-hashed, or re-shuffled.

Store layout (two bucketed tables):

* ``<prefix>_longsigs``  (doc_id, b, h)  bucketed by ``h``   — the LSH
  band index the increment's candidate join probes;
* ``<prefix>_hashed``    (doc_id, hv array<bigint>)  bucketed by
  ``doc_id`` — the 28-bit shingle-hash arrays the Jaccard verify needs
  (ints, not shingle strings: the store must not hold a second copy of
  the corpus text).

At 100 TB the cost of an increment is: one signature scan over Δ only,
one equi-join of Δ's N_BANDS·|Δ| band rows against the bucketed store
(only the Δ side shuffles — asserted in tests/test_writers.py), and one
verify join per candidate against the bucketed hash arrays (again only
the Δ side shuffles). The corpus×corpus work was paid once, when the
corpus itself was deduped.

Verify parity note: the store verifies Jaccard over the 28-bit hashed
shingle SETS while the one-statement query verifies over the shingle
strings themselves — identical unless two distinct shingles of a
candidate pair collide in 28 bits, which would shift that pair's
Jaccard by ~1/|union|. The equivalence on real data is asserted
(store decisions == registered-query decisions) in the writer tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from flink_wsr_project_spark.operators.dedup import (
    hashed_cte,
    jaccard_expr,
    longsigs_select,
    shingled_cte,
    signature_sql,
)
from flink_wsr_project_spark.sources.writers import write_bucketed

# Jaccard verify threshold — same evidence bar as the batch chain
# (_neardup_edges_ctes) and the registered dedup_incremental query.
VERIFY_JACCARD = 0.5


def _longsigs_df(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """(doc_id, b, h) band rows for ``docs`` — one in-row posexplode,
    no shuffle."""
    docs.createOrReplaceTempView("_sig_input")
    return spark.sql(
        f"WITH sigs AS ({signature_sql('spark', '_sig_input')})\n"
        f"{longsigs_select('spark')}"
    )


def _hashed_df(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """(doc_id, hv) 28-bit shingle-hash arrays for ``docs``."""
    docs.createOrReplaceTempView("_sig_input")
    return spark.sql(
        f"WITH {shingled_cte('spark', '_sig_input')},\n"
        f"{hashed_cte('spark')}\n"
        f"SELECT doc_id, hv FROM hashed"
    )


def write_signature_store(
    spark: SparkSession,
    corpus_docs: DataFrame,
    table_prefix: str,
    num_buckets: int = 8,
) -> None:
    """One-time (or per-compaction) corpus signature write: band rows
    bucketed by the candidate-join key ``h``, hash arrays bucketed by
    the verify-join key ``doc_id``. After this, increments never touch
    the corpus text again."""
    write_bucketed(_longsigs_df(spark, corpus_docs), f"{table_prefix}_longsigs", ["h"], num_buckets)
    write_bucketed(_hashed_df(spark, corpus_docs), f"{table_prefix}_hashed", ["doc_id"], num_buckets)


def absorb_kept_into_store(
    spark: SparkSession,
    batch_docs: DataFrame,
    decisions: DataFrame,
    table_prefix: str,
    num_buckets: int = 8,
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
    """
    from flink_wsr_project_spark.operators.iterative import (
        local_checkpoint_tracked,
        release_persistent_rdds,
    )

    # MATERIALIZE the kept set before the first append: ``decisions``
    # is a lazy plan that READS the store tables, so executing it after
    # the store has been appended to would re-evaluate against the
    # mutated store — an already-absorbed doc becomes its own corpus
    # dup, flips to non-keep, and silently drops out of the SECOND
    # append, leaving the store with band rows but no hash array for
    # it (every later verify against it fails). localCheckpoint pins
    # the pre-append answer (sized by |Δ|, executor-distributed).
    kept, ckpt_ids = local_checkpoint_tracked(
        batch_docs.join(
            decisions.where(F.col("decision") == "keep").select("doc_id"), "doc_id"
        )
    )
    try:
        n = kept.count()
        _append_bucketed(
            _longsigs_df(spark, kept), f"{table_prefix}_longsigs", ["h"], num_buckets
        )
        _append_bucketed(
            _hashed_df(spark, kept), f"{table_prefix}_hashed", ["doc_id"], num_buckets
        )
    finally:
        release_persistent_rdds(spark, ckpt_ids)
    return n


def _append_bucketed(df: DataFrame, table: str, bucket_cols: list[str], num_buckets: int) -> None:
    """Append to an existing bucketed table with the SAME bucket spec —
    Spark validates the spec against the metastore entry, so a drifted
    bucket count fails loudly instead of silently corrupting layout."""
    df.write.bucketBy(num_buckets, *bucket_cols).mode("append").format("parquet").saveAsTable(
        table
    )


def compact_signature_store(
    spark: SparkSession,
    table_prefix: str,
    num_buckets: int = 8,
) -> dict[str, int]:
    """Rewrite the store tables to one file per bucket. Every
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
    full data — both states are recoverable by hand or by re-running.
    Returns {table: row_count}.
    """
    from flink_wsr_project_spark.operators.iterative import (
        local_checkpoint_tracked,
        release_persistent_rdds,
    )

    out: dict[str, int] = {}
    for suffix, bucket_cols in (("longsigs", ["h"]), ("hashed", ["doc_id"])):
        table = f"{table_prefix}_{suffix}"
        tmp = f"{table}__compact"
        spark.sql(f"DROP TABLE IF EXISTS {tmp}")
        pinned, ckpt_ids = local_checkpoint_tracked(spark.table(table))
        try:
            out[table] = pinned.count()
            (
                pinned.repartition(num_buckets, *bucket_cols)
                .write.bucketBy(num_buckets, *bucket_cols)
                .mode("overwrite")
                .format("parquet")
                .saveAsTable(tmp)
            )
            spark.sql(f"DROP TABLE {table}")
            spark.sql(f"ALTER TABLE {tmp} RENAME TO {table}")
        finally:
            release_persistent_rdds(spark, ckpt_ids)
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

    Plan shape: Δ's band rows shuffle once to the store's ``h``
    bucketing for the candidate join; candidates then verify against
    the ``doc_id``-bucketed hash arrays (store side shuffle-free both
    times); the within-batch arm is a self-join of Δ's own band rows —
    all candidate work is linear in |Δ| for a fixed corpus bucket-size
    distribution."""
    bls = _longsigs_df(spark, batch_docs)
    batch_longsigs = bls.alias("bl")
    batch_hashed = _hashed_df(spark, batch_docs)
    store_longsigs = spark.table(f"{table_prefix}_longsigs")
    store_hashed = spark.table(f"{table_prefix}_hashed")

    jac = F.expr(jaccard_expr("sa.hv", "sb.hv", "spark"))

    corpus_cand = (
        batch_longsigs.join(
            store_longsigs.alias("cl"),
            (F.col("bl.b") == F.col("cl.b")) & (F.col("bl.h") == F.col("cl.h")),
        )
        .select(
            F.col("bl.doc_id").alias("doc_a"),
            F.col("cl.doc_id").alias("doc_b"),
            F.lit("corpus").alias("side"),
        )
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
    )
    cand = corpus_cand.unionByName(batch_cand).distinct()

    partner_hashed = store_hashed.unionByName(batch_hashed)
    verified = (
        cand.join(batch_hashed.alias("sa"), cand.doc_a == F.col("sa.doc_id"))
        .join(partner_hashed.alias("sb"), cand.doc_b == F.col("sb.doc_id"))
        .where(jac >= VERIFY_JACCARD)
        .select("doc_a", "doc_b", "side")
    )

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
