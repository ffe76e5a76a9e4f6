"""Incremental image dedup against a persisted dHash block store —
the image twin of the text signature store
(operators/incremental_dedup.py), built on the perceptual hash the
registered ``image_dhash_neardup`` query verifies externally.

Store layout (ONE bucketed table — deliberately simpler than the
text store's two):

* ``<prefix>_blocks`` (asset_id, blk, bv, dhash) bucketed by
  ``(blk, bv)`` — four rows per image, one per 16-BIT block of its
  64-bit dHash, with the FULL hash denormalized onto every row.

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
never re-decoded, re-hashed, or re-shuffled. Candidate volume:
16-bit block keys make UNRELATED images collide on a block with
p = 1/65536 (the r11 8-bit keys collided at 1/256 — an all-pairs job
with a constant discount; SCALE.md r12 measures the difference), so
background candidate volume is n²/16384 ≈ negligible and real
candidates track true near-dup clusters — EXCEPT degenerate blocks
(uniform image regions: all-padding rows hash to bv = 0), whose
buckets grow with the corpus. That residual is handled the text
path's way: ``bucket_cap`` star-collapses over-cap buckets to their
min-id representative (Hamming-verified, so no false dups) and
``dhash_block_skew`` reports what the cap rerouted — no silent
truncation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from flink_wsr_project_spark.operators.dedup import hamming_expr
from flink_wsr_project_spark.sources.writers import write_bucketed

# Hamming acceptance bound. 4 16-bit blocks pigeonhole-cover
# Hamming <= 3 exactly (any pair within 3 flipped bits agrees on >= 1
# untouched block), so the block join is LOSSLESS for this bound —
# the same guarantee the registered query's exhaustive oracle proves.
MAX_HAMMING = 3

# Partition count of a hash-partitioned block store (0/absent =
# bucketed-only) — the catalog-recorded layout contract, exactly the
# signature store's HASH_PARTITIONS_PROP discipline: probes and
# absorbs discover the layout instead of trusting a parameter that
# could drift from what was written.
BLOCK_PARTITIONS_PROP = "spark_graft.block_partitions"


def _store_block_partitions(spark: SparkSession, table_prefix: str) -> int:
    rows = spark.sql(f"SHOW TBLPROPERTIES {table_prefix}_blocks").collect()
    for r in rows:
        if r.key == BLOCK_PARTITIONS_PROP:
            return int(r.value)
    return 0


def _bp_expr(p: int):
    """Partition prefix of a block row: a mixed hash of the FULL
    candidate-join key (blk, bv) mod P, so each (blk, bv) bucket lives
    entirely inside one partition directory — which is what makes the
    pruned probe's per-bucket cap statistics exact over the pruned
    slice."""
    return F.pmod(F.xxhash64("blk", "bv"), F.lit(p))


def _block_rows(assets_dhash: DataFrame) -> DataFrame:
    """(asset_id, blk, bv, dhash) — four in-row 16-bit-block
    projections of each 64-bit hash (mask AFTER the arithmetic shift,
    so the signed int64 form is handled exactly); posexplode only, no
    shuffle."""
    return assets_dhash.select(
        "asset_id",
        "dhash",
        F.posexplode(
            F.expr(
                "transform(sequence(0, 3), b -> shiftright(dhash, 16 * b) & 65535)"
            )
        ).alias("blk", "bv"),
    ).select("asset_id", "blk", "bv", "dhash")


# Hash-extractor identity of a block store, recorded at write time.
# The store machinery is hash-agnostic (any 64-bit perceptual hash
# blocks the same way — image dHash, the audio windowed-energy
# fingerprint, the video temporal fingerprint), but a store written
# with one extractor and probed with another would return garbage
# DECISIONS, silently — so the identity is a catalog contract that
# probes and absorbs validate.
EXTRACTOR_PROP = "spark_graft.hash_extractor"

# Hash-FORMAT version of a block store: hash width / block width /
# scheme revision, stamped at write time and validated with the
# extractor identity. The name alone is not enough (ADVICE r12): a
# store written by the r11 32-bit/8-bit code carries the SAME function
# name 'extract_image_dhash', so a name-only check would probe it with
# 64-bit hashes, match near-nothing, and decide 'keep' for every true
# dup — silent garbage. Bump this constant whenever the hash or
# blocking scheme changes; old stores then fail loudly until rebuilt.
HASH_FORMAT_PROP = "spark_graft.hash_format"
HASH_FORMAT = "h64b16v1"


def _default_extractor():
    from flink_wsr_project_spark.operators.multimodal import extract_image_dhash

    return extract_image_dhash


def _check_extractor(spark: SparkSession, table_prefix: str, extractor) -> None:
    """Hard identity gate on every probe/absorb: the store must carry
    BOTH the extractor name and the hash-format version, and both must
    match the probing code. Absence is a failure, not a pass (ADVICE
    r12): a store with no recorded identity is either pre-r13 (written
    under an older or unknown scheme) or a crashed write — both cases
    where silently probing would return near-zero matches and decide
    'keep' for every true dup. Rebuild with :func:`write_dhash_store`."""
    rows = spark.sql(f"SHOW TBLPROPERTIES {table_prefix}_blocks").collect()
    props = {r.key: r.value for r in rows}
    recorded, fmt = props.get(EXTRACTOR_PROP), props.get(HASH_FORMAT_PROP)
    name = (extractor or _default_extractor()).__name__
    if recorded is None or fmt is None:
        raise ValueError(
            f"store '{table_prefix}' carries no recorded hash identity "
            f"({EXTRACTOR_PROP}/{HASH_FORMAT_PROP} missing) — written by "
            "an older scheme or an interrupted write; rebuild it with "
            "write_dhash_store (probing blind would silently match "
            "nothing and mark every true dup 'keep')"
        )
    if recorded != name:
        raise ValueError(
            f"store '{table_prefix}' was written with hash extractor "
            f"'{recorded}' but is being probed/absorbed with '{name}' — "
            "hashes from different extractors never match; pass the "
            "extractor the store was built with"
        )
    if fmt != HASH_FORMAT:
        raise ValueError(
            f"store '{table_prefix}' was written under hash format "
            f"'{fmt}' but this code produces '{HASH_FORMAT}' — same "
            "extractor name, different scheme; rebuild the store"
        )


def _dhash_df(spark: SparkSession, assets: DataFrame, extractor=None) -> DataFrame:
    """(asset_id, dhash) via the Arrow decode path — ``extractor`` is
    any (asset_id, payload) → (asset_id, <64-bit hash>) frame fn
    (default: the image dHash); the hash column is normalized to
    ``dhash`` so the store layout is extractor-agnostic."""
    fn = extractor or _default_extractor()
    out = fn(assets)
    hcol = [c for c in out.columns if c != "asset_id"][0]
    return out.select("asset_id", F.col(hcol).alias("dhash"))


def write_dhash_store(
    spark: SparkSession,
    corpus_assets: DataFrame,
    table_prefix: str,
    num_buckets: int = 8,
    hash_partitions: int = 0,
    extractor=None,
) -> None:
    """One-time corpus hash write: decode + dHash every corpus image
    once (Arrow-batched), store the block rows bucketed on the
    candidate-join key. After this, increments never touch the corpus
    payload bytes again.

    With ``hash_partitions = P > 0`` the table additionally gets a
    hash-prefix PARTITION column ``bp = pmod(xxhash64(blk, bv), P)``
    under the bucketing — the signature store's small-Δ layout
    applied to images: a probe whose 4·|Δ| block rows touch only a
    few of the P prefixes reads only those directories
    (:func:`image_dedup_from_store_pruned`), instead of scanning the
    whole store the way the bucketed-only layout must. P is recorded
    as a table property; keep it modest (tens) — files per write =
    P × num_buckets.

    ``extractor`` is the perceptual-hash fn (default: the image
    dHash; pass ``extract_audio_fingerprint`` for an audio store —
    the block machinery is 64-bit-hash-agnostic). Its identity is
    recorded as a table property and validated by every probe/absorb,
    so a mixed-extractor store cannot happen silently."""
    if hash_partitions < 0:
        raise ValueError(
            f"hash_partitions must be >= 0, got {hash_partitions} "
            "(0 = bucketed-only layout)"
        )
    blocks = _block_rows(_dhash_df(spark, corpus_assets, extractor))
    if hash_partitions:
        (
            blocks.withColumn("bp", _bp_expr(hash_partitions))
            .write.partitionBy("bp")
            .bucketBy(num_buckets, "blk", "bv")
            .mode("overwrite")
            .format("parquet")
            .saveAsTable(f"{table_prefix}_blocks")
        )
    else:
        write_bucketed(
            blocks,
            f"{table_prefix}_blocks",
            ["blk", "bv"],
            num_buckets,
        )
    # ALL identity/layout properties in ONE statement (ADVICE r12): a
    # crash between two ALTERs used to leave a partitioned store that
    # reported p=0 with a recorded extractor — a half-valid identity.
    # Now the store is either fully stamped or carries no identity at
    # all, and _check_extractor fails the latter loudly. P=0 is
    # recorded explicitly so "bucketed-only" and "never stamped" are
    # distinguishable states.
    props = {
        EXTRACTOR_PROP: (extractor or _default_extractor()).__name__,
        HASH_FORMAT_PROP: HASH_FORMAT,
        BLOCK_PARTITIONS_PROP: str(hash_partitions),
    }
    spark.sql(
        f"ALTER TABLE {table_prefix}_blocks SET TBLPROPERTIES ("
        + ", ".join(f"'{k}'='{v}'" for k, v in props.items())
        + ")"
    )


def delete_from_dhash_store(
    spark: SparkSession, table_prefix: str, asset_ids: DataFrame
) -> int:
    """Takedown for the block store (any modality — image/audio/video
    stores share the machinery): record the ids as tombstones
    (operators/tombstones.py; O(|ids|), no store rewrite). Probes stop
    matching the deleted assets immediately — including their role as
    dedup keepers and as bucket-cap star REPRESENTATIVES (the over-cap
    stats are computed on the live, tombstone-masked store, so a
    deleted representative is replaced by the bucket's next min-id on
    the very next probe); absorbs and their replays refuse to re-add
    them; :func:`compact_dhash_store` reclaims the physical rows.
    Returns the number of ids recorded."""
    from flink_wsr_project_spark.operators.tombstones import add_tombstones

    return add_tombstones(spark, table_prefix, asset_ids, "asset_id")


def _pin_dhash(spark, batch_assets, extractor, ckpt_ids):
    """Checkpoint the batch hash frame; the returned decision plan
    references it, so loop callers pass ``ckpt_ids`` and release after
    consuming — otherwise one pinned RDD leaks per micro-batch."""
    if ckpt_ids is not None:
        from flink_wsr_project_spark.operators.iterative import (
            local_checkpoint_tracked,
        )

        bd, _ids = local_checkpoint_tracked(_dhash_df(spark, batch_assets, extractor))
        ckpt_ids.update(_ids)
        return bd
    return _dhash_df(spark, batch_assets, extractor).localCheckpoint()


def image_dedup_from_store(
    spark: SparkSession,
    batch_assets: DataFrame,
    table_prefix: str,
    bucket_cap: int | None = None,
    extractor=None,
    ckpt_ids: set[int] | None = None,
) -> DataFrame:
    """Dedup a batch of images (asset_id, payload) against the
    persisted corpus store + within the batch itself. Returns one row
    per batch asset: (asset_id, decision ∈ keep | dup_of_corpus |
    dup_within_batch, dup_of) — the signature store's exact decision
    contract (corpus claims outrank batch claims; within the batch
    the smaller asset_id wins; ``dup_of`` is the smallest claiming
    partner on the winning side), so downstream keep-list consumers
    are interchangeable between the two stores.

    ``bucket_cap`` is the skew valve (the text path's
    ``_LSH_BUCKET_CAP`` discipline applied to the block join): store
    buckets holding more than ``bucket_cap`` images — degenerate
    blocks, e.g. the all-padding bv=0 rows of uniform image regions —
    are star-collapsed instead of enumerated: a probe row landing in
    one compares ONLY against the bucket's min-id representative
    (Hamming-verified, so no false dup claims; a true dup whose
    nearest partner is a non-representative member of an over-cap
    bucket may be missed through that block — the bounded residual
    ``dhash_block_skew`` reports). ``None`` (the default) keeps the
    exact join everywhere.

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
    The store side is exchange-free (plan-tree-walk pinned): with a
    cap, the per-bucket stats aggregate groups BY THE BUCKET KEYS
    (partial+final both ride the bucketed scan) and the over-cap
    bucket list broadcasts — the store still never shuffles."""
    from flink_wsr_project_spark.operators.retention import live_rows

    if bucket_cap is not None and bucket_cap < 1:
        raise ValueError(f"bucket_cap must be >= 1 or None, got {bucket_cap}")
    _check_extractor(spark, table_prefix, extractor)
    bd = _pin_dhash(spark, batch_assets, extractor, ckpt_ids)
    blocks = _block_rows(bd)
    # explicit select: a partitioned store carries the bp layout
    # column, which must not leak into candidate/decision frames.
    # Tombstoned assets anti-join away HERE, before both the candidate
    # join and the bucket-cap stats — deleted keepers stop claiming and
    # deleted star representatives stop representing, in one mask.
    store = live_rows(
        spark,
        spark.table(f"{table_prefix}_blocks").select("asset_id", "blk", "bv", "dhash"),
        table_prefix,
        "asset_id",
    )
    ham = F.expr(hamming_expr("bl.dhash", "st.dhash", "spark"))

    probe_blocks = blocks
    star_cand = None
    if bucket_cap is not None:
        # one grouping pass on the store's own bucket keys (no
        # exchange: grouping keys == bucket spec), kept rows bounded
        # by the over-cap bucket count — broadcast both ways
        over = (
            store.groupBy("blk", "bv")
            .agg(
                F.count("*").alias("n"),
                F.min("asset_id").alias("rep_id"),
                F.min_by("dhash", "asset_id").alias("rep_hash"),
            )
            .where(F.col("n") > bucket_cap)
            .select("blk", "bv", "rep_id", "rep_hash")
        )
        probe_blocks = blocks.join(
            F.broadcast(over.select("blk", "bv")), ["blk", "bv"], "left_anti"
        )
        ham_rep = F.expr(hamming_expr("bl.dhash", "ov.rep_hash", "spark"))
        star_cand = (
            blocks.alias("bl")
            .join(F.broadcast(over.alias("ov")), ["blk", "bv"])
            .where(F.col("bl.asset_id") != F.col("ov.rep_id"))
            .where(ham_rep <= MAX_HAMMING)
            .select(
                F.col("bl.asset_id").alias("doc_a"),
                F.col("ov.rep_id").alias("doc_b"),
                F.lit("corpus").alias("side"),
            )
        )

    corpus_cand = (
        probe_blocks.alias("bl")
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
    )
    if star_cand is not None:
        corpus_cand = corpus_cand.unionByName(star_cand)
    corpus_cand = corpus_cand.distinct()
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


def image_dedup_from_store_pruned(
    spark: SparkSession,
    batch_assets: DataFrame,
    table_prefix: str,
    bucket_cap: int | None = None,
    extractor=None,
    ckpt_ids: set[int] | None = None,
) -> DataFrame:
    """SMALL-Δ fast path over a PARTITIONED block store (written with
    ``hash_partitions = P > 0``): same decision contract as
    :func:`image_dedup_from_store`, but the store is neither shuffled
    NOR fully scanned — the signature store's pruned probe, for
    images. Δ hashes once (the localCheckpoint pins the Arrow decode
    for its several consumers); the distinct ``bp`` prefixes of its
    4·|Δ| block rows are collected — ≤ P values, a layout constant —
    and pushed into the block-table scan as a literal partition
    filter; the candidate join then BROADCASTS the Δ side, so the
    pruned store scan streams through map-side with the Hamming
    verify in-join. A one-image probe reads 4 of the P directories.

    ``bucket_cap`` works as in the full probe, and its per-bucket
    statistics stay EXACT over the pruned slice: ``bp`` is a function
    of the full (blk, bv) key, so every bucket the probe touches lives
    entirely inside the pruned directories. Use the full probe for
    bulk batches that touch most prefixes anyway."""
    if bucket_cap is not None and bucket_cap < 1:
        raise ValueError(f"bucket_cap must be >= 1 or None, got {bucket_cap}")
    from flink_wsr_project_spark.operators.retention import live_rows

    p = _store_block_partitions(spark, table_prefix)
    if p <= 0:
        raise ValueError(
            f"store '{table_prefix}' is not hash-partitioned; write it with "
            "hash_partitions > 0 or use image_dedup_from_store"
        )
    _check_extractor(spark, table_prefix, extractor)
    bd = _pin_dhash(spark, batch_assets, extractor, ckpt_ids)
    blocks = _block_rows(bd)
    bps = [
        r.bp for r in blocks.select(_bp_expr(p).alias("bp")).distinct().collect()
    ]  # <= P values — bounded by the layout constant, not |Δ|
    # tombstone mask AFTER the partition filter: pruning still reads
    # only Δ's directories, the anti-join just drops deleted rows from
    # the pruned stream (bucket-cap stats stay exact over the LIVE
    # pruned slice)
    store = live_rows(
        spark,
        spark.table(f"{table_prefix}_blocks")
        .where(F.col("bp").isin(bps))
        .select("asset_id", "blk", "bv", "dhash"),
        table_prefix,
        "asset_id",
    )
    ham = F.expr(hamming_expr("bl.dhash", "st.dhash", "spark"))

    probe_blocks = blocks
    star_cand = None
    if bucket_cap is not None:
        over = (
            store.groupBy("blk", "bv")
            .agg(
                F.count("*").alias("n"),
                F.min("asset_id").alias("rep_id"),
                F.min_by("dhash", "asset_id").alias("rep_hash"),
            )
            .where(F.col("n") > bucket_cap)
            .select("blk", "bv", "rep_id", "rep_hash")
        )
        probe_blocks = blocks.join(
            F.broadcast(over.select("blk", "bv")), ["blk", "bv"], "left_anti"
        )
        ham_rep = F.expr(hamming_expr("bl.dhash", "ov.rep_hash", "spark"))
        star_cand = (
            blocks.alias("bl")
            .join(F.broadcast(over.alias("ov")), ["blk", "bv"])
            .where(F.col("bl.asset_id") != F.col("ov.rep_id"))
            .where(ham_rep <= MAX_HAMMING)
            .select(
                F.col("bl.asset_id").alias("doc_a"),
                F.col("ov.rep_id").alias("doc_b"),
                F.lit("corpus").alias("side"),
            )
        )

    corpus_cand = (
        store.alias("st")
        .join(
            F.broadcast(probe_blocks.alias("bl")),
            (F.col("bl.blk") == F.col("st.blk"))
            & (F.col("bl.bv") == F.col("st.bv"))
            & (F.col("bl.asset_id") != F.col("st.asset_id")),
        )
        .where(ham <= MAX_HAMMING)
        .select(
            F.col("bl.asset_id").alias("doc_a"),
            F.col("st.asset_id").alias("doc_b"),
            F.lit("corpus").alias("side"),
        )
    )
    if star_cand is not None:
        corpus_cand = corpus_cand.unionByName(star_cand)

    ham_b = F.expr(hamming_expr("bl.dhash", "bm.dhash", "spark"))
    batch_cand = (
        blocks.alias("bl")
        .join(
            F.broadcast(blocks.alias("bm")),
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
    )

    from flink_wsr_project_spark.operators.incremental_dedup import _decisions

    verified = corpus_cand.unionByName(batch_cand).distinct()
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
    extractor=None,
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

    from flink_wsr_project_spark.operators.retention import live_rows

    _check_extractor(spark, table_prefix, extractor)
    kept_plan = batch_assets.join(
        decisions.where(F.col("decision") == "keep").select("asset_id"), "asset_id"
    )
    # unconditional tombstone mask — a deleted asset never re-enters,
    # replays included, even after compaction dropped its rows (see
    # operators/tombstones.py)
    kept_plan = live_rows(spark, kept_plan, table_prefix, "asset_id")
    if exclude_existing:
        kept_plan = kept_plan.join(
            spark.table(f"{table_prefix}_blocks").select("asset_id").distinct(),
            "asset_id",
            "left_anti",
        )
    kept, ckpt_ids = local_checkpoint_tracked(kept_plan)
    try:
        n = kept.count()
        rows = _block_rows(_dhash_df(spark, kept, extractor))
        # match the layout the store was written with (catalog-
        # discovered, like the signature store's absorb)
        p = _store_block_partitions(spark, table_prefix)
        w = rows.withColumn("bp", _bp_expr(p)).write.partitionBy("bp") if p else rows.write
        (
            w.bucketBy(num_buckets, "blk", "bv")
            .mode("append")
            .format("parquet")
            .saveAsTable(f"{table_prefix}_blocks")
        )
    finally:
        release_persistent_rdds(spark, ckpt_ids)
    return n


def dhash_block_skew(
    spark: SparkSession, table_prefix: str, bucket_cap: int
) -> DataFrame:
    """The store-side twin of the registered ``image_block_skew``
    query — the "no silent caps" dashboard row for a deployed dHash
    store: per block index, the bucket count, the largest bucket, how
    many buckets a ``bucket_cap`` would star-collapse, and the
    candidate pairs that saves (Σ n·(n−1)/2 − (n−1) over over-cap
    buckets). One grouping pass on the store's own bucket keys (no
    exchange) + one 4-row rollup."""
    from flink_wsr_project_spark.operators.retention import live_rows

    if bucket_cap < 1:
        raise ValueError(f"bucket_cap must be >= 1, got {bucket_cap}")
    sizes = (
        live_rows(
            spark, spark.table(f"{table_prefix}_blocks"), table_prefix, "asset_id"
        )
        .groupBy("blk", "bv")
        .agg(F.count("*").alias("n"))
    )
    over = F.col("n") > bucket_cap
    return (
        sizes.groupBy("blk")
        .agg(
            F.count("*").alias("n_buckets"),
            F.max("n").alias("max_bucket"),
            F.sum(over.cast("long")).alias("buckets_capped"),
            # integer div, not float-/2-then-cast (ADVICE r12): exact
            # for very large buckets and arithmetic-identical to the
            # registered _img_block_skew_sql's `div`
            F.sum(
                F.when(
                    over,
                    F.expr("(n * (n - 1)) div 2") - (F.col("n") - 1),
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("pairs_saved"),
        )
        .orderBy("blk")
    )


def compact_dhash_store(spark: SparkSession, table_prefix: str) -> int:
    """Block-store compaction: the generic catalog-driven rewrite
    (one file per bucket slot, properties preserved) with the
    TOMBSTONES applied physically — deleted assets' block rows are
    reclaimed by the rewrite the compactor was paying anyway, and the
    tombstone table is then rewritten deduplicated but kept (the ids
    must keep masking absorb replays; re-admission is the explicit
    ``clear_tombstones``). Use THIS instead of the bare
    ``compact_bucketed_table`` for block stores — the generic one
    defragments but cannot know about deletions. Returns the surviving
    row count."""
    from flink_wsr_project_spark.operators.retention import live_rows
    from flink_wsr_project_spark.operators.tombstones import (
        rewrite_tombstones_deduped,
    )
    from flink_wsr_project_spark.sources.writers import compact_bucketed_table

    n = compact_bucketed_table(
        spark,
        f"{table_prefix}_blocks",
        transform=lambda df: live_rows(spark, df, table_prefix, "asset_id"),
    )
    rewrite_tombstones_deduped(spark, table_prefix)
    return n


def recover_dhash_store(spark: SparkSession, table_prefix: str) -> bool:
    """Complete an interrupted block-table compaction swap (the
    generic compactor's DROP→RENAME crash window) and any interrupted
    tombstone rewrite — idempotent, run at loop startup like its
    text/ANN siblings. Returns True when a recovery ran."""
    from flink_wsr_project_spark.operators.retention import recover_retention
    from flink_wsr_project_spark.operators.tombstones import recover_tombstones
    from flink_wsr_project_spark.sources.writers import finish_table_swap

    recovered = finish_table_swap(spark, f"{table_prefix}_blocks")
    return (
        recover_tombstones(spark, table_prefix)
        or recover_retention(spark, table_prefix)
        or recovered
    )
