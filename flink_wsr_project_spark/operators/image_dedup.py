"""Incremental image dedup against a persisted dHash block store —
the image twin of the text signature store
(operators/incremental_dedup.py), built on the perceptual hash the
registered ``image_dhash_neardup`` query verifies externally.

Store layout (ONE bucketed table — deliberately simpler than the
text store's two):

* ``<prefix>_blocks`` (asset_id, blk, bv, dhash) bucketed by
  ``(blk, bv)`` — four rows per image, one per byte-block of its
  32-bit dHash, with the FULL hash denormalized onto every row.

The denormalization is the design choice worth the 8 bytes/row: the
Hamming verify needs only the two full hashes, so carrying ``dhash``
on the block row folds the verify INTO the candidate join — one
co-located equi-join total, no second verify table, and therefore no
two-append crash window (the text store's absorb can crash between
its longsigs and hashed appends and needs compaction to heal; this
store's absorb is one atomic-enough append of block rows).

Bucketing is the candidate join's FULL key set ``(blk, bv)`` — the
r11 lesson from the signature store: bucketing by a subset leaves
Spark re-shuffling the corpus whenever it cannot broadcast it
(tests/test_writers.py's plan-tree walk, asserted here too).

At 100 TB: a probe batch Δ costs one Arrow pass to hash Δ's images
(no shuffle), one equi-join of 4·|Δ| block rows against the bucketed
store (only Δ shuffles), and an in-join bit_count — the corpus is
never re-decoded, re-hashed, or re-shuffled. Candidate volume is
Σ|block bucket|² bounded, never |Δ|×|corpus| (byte blocks have ≤256
values per blk, so bucket sizes track the hash distribution measured
in SCALE.md r11: ~8× below exhaustive at sf0.01 and widening with
corpus size).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from flink_wsr_project_spark.operators.dedup import hamming_expr
from flink_wsr_project_spark.sources.writers import write_bucketed

# Hamming acceptance bound. 4 byte-blocks pigeonhole-cover Hamming <= 3
# exactly (any pair within 3 flipped bits agrees on >= 1 untouched
# block), so the block join is LOSSLESS for this bound — the same
# guarantee the registered query's exhaustive oracle proves.
MAX_HAMMING = 3


def _block_rows(assets_dhash: DataFrame) -> DataFrame:
    """(asset_id, blk, bv, dhash) — four in-row byte-block projections
    of each 32-bit hash; posexplode only, no shuffle."""
    return assets_dhash.select(
        "asset_id",
        "dhash",
        F.posexplode(
            F.expr(
                "transform(sequence(0, 3), b -> shiftright(dhash, 8 * b) & 255)"
            )
        ).alias("blk", "bv"),
    ).select("asset_id", "blk", "bv", "dhash")


def _dhash_df(spark: SparkSession, assets: DataFrame) -> DataFrame:
    """(asset_id, dhash) via the Arrow decode path."""
    from flink_wsr_project_spark.operators.multimodal import extract_image_dhash

    return extract_image_dhash(assets)


def write_dhash_store(
    spark: SparkSession,
    corpus_assets: DataFrame,
    table_prefix: str,
    num_buckets: int = 8,
) -> None:
    """One-time corpus hash write: decode + dHash every corpus image
    once (Arrow-batched), store the block rows bucketed on the
    candidate-join key. After this, increments never touch the corpus
    payload bytes again."""
    write_bucketed(
        _block_rows(_dhash_df(spark, corpus_assets)),
        f"{table_prefix}_blocks",
        ["blk", "bv"],
        num_buckets,
    )


def image_dedup_from_store(
    spark: SparkSession,
    batch_assets: DataFrame,
    table_prefix: str,
) -> DataFrame:
    """Dedup a batch of images (asset_id, payload) against the
    persisted corpus store + within the batch itself. Returns one row
    per batch asset: (asset_id, decision ∈ keep | dup_of_corpus |
    dup_within_batch, dup_of) — the signature store's exact decision
    contract (corpus claims outrank batch claims; within the batch
    the smaller asset_id wins; ``dup_of`` is the smallest claiming
    partner on the winning side), so downstream keep-list consumers
    are interchangeable between the two stores.

    Plan: batch hashes ONCE through Arrow — the (asset_id, dhash)
    frame is localCheckpointed so the decode subtree is not
    re-executed for each of its four consumers (corpus join, both
    sides of the self-join, final left join); the checkpoint is
    |Δ|-sized and released by Spark's ContextCleaner when the
    decision frame goes out of scope (an explicit tracked release is
    impossible here — the returned frame still references it). The
    4·|Δ| block rows shuffle to the store's (blk, bv) bucketing;
    Hamming verifies in-join on the denormalized hashes (no second
    join); the within-batch arm is a self-join of Δ's own block rows.
    The store side is exchange-free (plan-tree-walk pinned)."""
    bd = _dhash_df(spark, batch_assets).localCheckpoint()
    blocks = _block_rows(bd)
    store = spark.table(f"{table_prefix}_blocks")
    ham = F.expr(hamming_expr("bl.dhash", "st.dhash", "spark"))

    corpus_cand = (
        blocks.alias("bl")
        .join(
            store.alias("st"),
            (F.col("bl.blk") == F.col("st.blk"))
            & (F.col("bl.bv") == F.col("st.bv"))
            # self-exclusion: replayed micro-batches probe assets the
            # store already absorbed — they must not match themselves
            & (F.col("bl.asset_id") != F.col("st.asset_id")),
        )
        .where(ham <= MAX_HAMMING)
        .select(
            F.col("bl.asset_id").alias("doc_a"),
            F.col("st.asset_id").alias("doc_b"),
            F.lit("corpus").alias("side"),
        )
        .distinct()
    )
    ham_b = F.expr(hamming_expr("bl.dhash", "bm.dhash", "spark"))
    batch_cand = (
        blocks.alias("bl")
        .join(
            blocks.alias("bm"),
            (F.col("bl.blk") == F.col("bm.blk"))
            & (F.col("bl.bv") == F.col("bm.bv"))
            & (F.col("bm.asset_id") < F.col("bl.asset_id")),
        )
        .where(ham_b <= MAX_HAMMING)
        .select(
            F.col("bl.asset_id").alias("doc_a"),
            F.col("bm.asset_id").alias("doc_b"),
            F.lit("batch").alias("side"),
        )
        .distinct()
    )

    # the decision contract is the signature store's, by the same
    # code — not a copy that could drift (the docstring's "keep-list
    # consumers are interchangeable" promise)
    from flink_wsr_project_spark.operators.incremental_dedup import _decisions

    verified = corpus_cand.unionByName(batch_cand)
    return _decisions(
        bd.select(F.col("asset_id").alias("doc_id")), verified
    ).withColumnRenamed("doc_id", "asset_id")


def absorb_kept_into_dhash_store(
    spark: SparkSession,
    batch_assets: DataFrame,
    decisions: DataFrame,
    table_prefix: str,
    num_buckets: int = 8,
    exclude_existing: bool = False,
) -> int:
    """Fold the batch's KEPT images into the store (the day-over-day
    loop): one bucketed append of their block rows. Dropped images are
    not absorbed — their keeper already represents them. Because the
    store is ONE table, there is no partial-absorb crash window;
    ``exclude_existing=True`` still anti-joins against the store's
    asset_ids so an at-least-once replay appends nothing twice.
    Returns the number of images absorbed.

    The decision frame READS the store this append mutates —
    localCheckpoint pins the pre-append answer (the read-your-writes
    discipline every absorb in this repo follows)."""
    from flink_wsr_project_spark.operators.iterative import (
        local_checkpoint_tracked,
        release_persistent_rdds,
    )

    kept_plan = batch_assets.join(
        decisions.where(F.col("decision") == "keep").select("asset_id"), "asset_id"
    )
    if exclude_existing:
        kept_plan = kept_plan.join(
            spark.table(f"{table_prefix}_blocks").select("asset_id").distinct(),
            "asset_id",
            "left_anti",
        )
    kept, ckpt_ids = local_checkpoint_tracked(kept_plan)
    try:
        n = kept.count()
        (
            _block_rows(_dhash_df(spark, kept))
            .write.bucketBy(num_buckets, "blk", "bv")
            .mode("append")
            .format("parquet")
            .saveAsTable(f"{table_prefix}_blocks")
        )
    finally:
        release_persistent_rdds(spark, ckpt_ids)
    return n


def recover_dhash_store(spark: SparkSession, table_prefix: str) -> bool:
    """Complete an interrupted block-table compaction swap (the
    generic compactor's DROP→RENAME crash window) — idempotent, run
    at loop startup like its text/ANN siblings. Returns True when a
    recovery ran."""
    from flink_wsr_project_spark.sources.writers import finish_table_swap

    return finish_table_swap(spark, f"{table_prefix}_blocks")
