"""Incremental span-level dedup against a persisted positional-gram
store — the span family's store-backed deployment shape, completing
the pattern every dedup modality here carries (text signatures, image/
audio/video fingerprint blocks, ANN lists: batch query + persisted
store + absorb/compact/tombstone/retention lifecycle + streaming loop).

The registered ``shared_span_pairs``/``span_dedup_keep_list`` queries
re-hash the whole corpus every run. THIS module writes the positional
gram index ONCE — (doc_id, pos, gh, vh), ~12 bytes/token, the
distributed stand-in for a suffix array — bucketed on the candidate
join key ``gh``, so every future increment Δ probes the corpus without
the corpus being re-scanned, re-tokenized, or re-shuffled.

Store layout (two bucketed tables):

* ``<prefix>_posgrams`` (doc_id, pos, gh, vh) bucketed by ``gh`` — the
  gram index the candidate join probes. Single-column bucket key =
  the join's exact key set, so the store side is co-partitioned for
  free.
* ``<prefix>_docs`` (doc_id, n_tokens) bucketed by ``doc_id`` — one
  row per absorbed document: the replay-idempotence anti-join target
  (the posgrams table is keyed by gh, so an anti-join against IT would
  shuffle the store). The probe computes the BATCH's denominators from
  the batch text (batch docs are by definition not in the roster);
  n_tokens is carried as absorbed-doc metadata for corpus-side
  reporting, not read by any decision path today.

Per-increment cost: one tokenize+hash pass over Δ, one broadcast of
Δ's distinct grams to semi-join the store (store side exchange-free),
one Δ-vs-matched-store-rows join, one Δ×Δ arm, and the diagonal-merge
windows — all bounded by |Δ| and the matched store mass, never the
corpus.

Degenerate valve, incremental form: the store-side stats (df, keeper,
keeper_pos) are computed PER PROBE over exactly the grams Δ carries —
an aggregate over matched store rows (map-side combinable, never a
join explosion) — and over-cap grams route Δ occurrences to star rows
against the store's min-id keeper's OWN occurrences, so a boilerplate
gram with a million corpus occurrences costs the probe
|Δ occ|·|keeper occ| rows (keeper occurrence counts are per-document,
i.e. small), not |Δ|×1M.
The store-side cap counts CORPUS occurrences only (the batch arm caps
its own df independently); a replayed batch doc sees itself in the
store and is self-excluded from matching, but does inflate its grams'
store df by one — the same self-inclusion nuance the LSH bucket caps
carry.

Decision contract (the incremental siblings' precedence, coverage
form): ``dup_of_corpus`` when corpus-span coverage alone clears the
permille bar, else ``dup_within_batch`` when adding spans shared with
LOWER-id batch mates clears it, else ``keep``. No ``dup_of`` partner
column — coverage is an aggregate over many partners by construction
(unions of intervals), unlike the single-best-partner contracts of the
signature/semdedup stores.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from flink_wsr_project_spark.operators.spans import (
    SPAN_DROP_PERMILLE,
    SPAN_GRAM_TOKENS,
    SPAN_MIN_TOKENS,
    span_pairs_sql,
)
from flink_wsr_project_spark.sources.writers import write_bucketed


def _posgrams_df(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """(doc_id, pos, gh, vh) positional gram rows. Pure DataFrame API
    on purpose, NOT the shared SQL CTEs: this frame's subtree appears
    several times inside one composed probe plan (gram set, stats
    annotation, within-cap arm), and Spark's DeduplicateRelations
    mis-renews duplicated WithCTE subtrees (the second occurrence's
    CTE refs end up merging positionally shifted outputs — found as a
    CANNOT_MERGE ARRAY<STRING>/BIGINT error on the composed plan).
    The expressions are identical to ``span_posgram_ctes``'s (r15
    scheme: 60-bit md5 token codes, lead-window columns, flat Horner
    chains — all codegen); the store-vs-registered parity test pins
    that they cannot drift."""
    from pyspark.sql import Window

    from flink_wsr_project_spark.operators.dedup import toks_expr
    from flink_wsr_project_spark.operators.spans import (
        span_gram_hash_exprs,
        span_token_code_expr,
    )

    w = SPAN_GRAM_TOKENS
    gh, vh = span_gram_hash_exprs(w)
    win = Window.partitionBy("doc_id").orderBy("pos")
    ct = (
        docs.selectExpr("doc_id", f"{toks_expr('text', 'spark')} AS t")
        .where(F.expr(f"size(t) >= {w}"))
        .select("doc_id", F.posexplode("t").alias("pos", "tok"))
        .selectExpr("doc_id", "pos", f"{span_token_code_expr('tok', 'spark')} AS c")
    )
    cw = ct.select(
        "doc_id",
        "pos",
        F.col("c").alias("c0"),
        *[F.lead("c", j).over(win).alias(f"c{j}") for j in range(1, w)],
    )
    return cw.where(F.col(f"c{w - 1}").isNotNull()).selectExpr(
        "doc_id", "pos", f"{gh} AS gh", f"{vh} AS vh"
    )


# Catalog property carrying the gram-hash scheme identity (the
# image-block store's HASH_FORMAT discipline): a store hashed under
# one scheme and probed under another would silently match nothing —
# every true dup decided 'keep'. Stamped at write time, validated on
# every probe/absorb; stores written before the stamp (or under the
# r14 md5-per-gram scheme) fail loudly until rebuilt.
SPAN_HASH_FORMAT_PROP = "spark_graft.span_hash_format"


def _check_span_hash_format(spark: SparkSession, table_prefix: str) -> None:
    from flink_wsr_project_spark.operators.spans import SPAN_HASH_FORMAT

    rows = spark.sql(f"SHOW TBLPROPERTIES {table_prefix}_posgrams").collect()
    fmt = {r.key: r.value for r in rows}.get(SPAN_HASH_FORMAT_PROP)
    if fmt is None:
        raise ValueError(
            f"span store '{table_prefix}' carries no recorded gram-hash "
            f"format ({SPAN_HASH_FORMAT_PROP} missing) — written by an "
            "older scheme (pre-r15 md5 grams) or an interrupted write; "
            "rebuild it with write_span_store (probing blind would "
            "silently match nothing and keep every true dup)"
        )
    if fmt != SPAN_HASH_FORMAT:
        raise ValueError(
            f"span store '{table_prefix}' was written under gram-hash "
            f"format '{fmt}' but this code produces '{SPAN_HASH_FORMAT}' "
            "— rebuild the store"
        )


def _ntokens_df(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens) for every doc — including those shorter than
    the gram width (they carry no grams but still need denominators).
    DataFrame API for the same DeduplicateRelations reason as
    :func:`_posgrams_df`."""
    from flink_wsr_project_spark.operators.dedup import toks_expr

    return docs.selectExpr(
        "doc_id",
        f"CAST(size({toks_expr('text', 'spark')}) AS BIGINT) AS n_tokens",
    )


def write_span_store(
    spark: SparkSession,
    corpus_docs: DataFrame,
    table_prefix: str,
    num_buckets: int = 8,
    hash_partitions: int = 0,
) -> None:
    """One-time corpus index write: tokenize + hash every corpus doc
    once, store the positional gram rows bucketed on ``gh`` and the
    doc roster bucketed on ``doc_id``. After this, increments never
    touch the corpus text again.

    With ``hash_partitions = P > 0`` the gram table additionally gets
    a hash-prefix PARTITION column ``gp = pmod(xxhash64(gh), P)``
    under the bucketing — the signature store's small-Δ layout: a
    probe whose grams touch only a few of the P prefixes reads only
    those directories (the probe prunes AUTOMATICALLY when the
    recorded layout allows — unlike the siblings it needs no separate
    pruned entry point, because the Δ side is already broadcast
    either way, so pruning is purely a scan filter). P is recorded as
    a table property; keep it modest (tens) — files per write =
    P × num_buckets. The roster stays bucketed-only (it is only ever
    anti-joined whole)."""
    if hash_partitions < 0:
        raise ValueError(
            f"hash_partitions must be >= 0, got {hash_partitions} "
            "(0 = bucketed-only layout)"
        )
    from flink_wsr_project_spark.operators.incremental_dedup import (
        HASH_PARTITIONS_PROP,
    )

    pg = _posgrams_df(spark, corpus_docs)
    if hash_partitions:
        (
            pg.withColumn("gp", F.pmod(F.xxhash64("gh"), F.lit(hash_partitions)))
            .write.partitionBy("gp")
            .bucketBy(num_buckets, "gh")
            .mode("overwrite")
            .format("parquet")
            .saveAsTable(f"{table_prefix}_posgrams")
        )
        spark.sql(
            f"ALTER TABLE {table_prefix}_posgrams SET TBLPROPERTIES "
            f"('{HASH_PARTITIONS_PROP}'='{hash_partitions}')"
        )
    else:
        write_bucketed(pg, f"{table_prefix}_posgrams", ["gh"], num_buckets)
    from flink_wsr_project_spark.operators.spans import SPAN_HASH_FORMAT

    spark.sql(
        f"ALTER TABLE {table_prefix}_posgrams SET TBLPROPERTIES "
        f"('{SPAN_HASH_FORMAT_PROP}'='{SPAN_HASH_FORMAT}')"
    )
    write_bucketed(
        _ntokens_df(spark, corpus_docs),
        f"{table_prefix}_docs",
        ["doc_id"],
        num_buckets,
    )


def delete_from_span_store(
    spark: SparkSession, table_prefix: str, doc_ids: DataFrame
) -> int:
    """Takedown: record ids as tombstones (O(|ids|), no store
    rewrite). Probes stop matching the deleted docs immediately —
    including their role as over-cap star KEEPERS (stats are computed
    on the live, masked store, so a deleted keeper is replaced by the
    gram's next min-id corpus doc on the very next probe); absorbs and
    their replays refuse to re-add them; ``compact_span_store``
    reclaims the physical rows."""
    from flink_wsr_project_spark.operators.tombstones import add_tombstones

    return add_tombstones(spark, table_prefix, doc_ids, "doc_id")


def _merge_cand_to_spans(
    spark: SparkSession, cand: DataFrame, min_span: int
) -> DataFrame:
    """Diagonal-merge a candidate frame (doc_a, pos_a, doc_b, pos_b)
    into maximal spans >= min_span — the registered queries'
    ``_span_merge_ctes`` arithmetic in DataFrame form (no WithCTE: see
    :func:`_posgrams_df`; the parity test pins equivalence)."""
    from pyspark.sql import Window

    w = SPAN_GRAM_TOKENS
    isl = cand.withColumn("diag", F.col("pos_a") - F.col("pos_b")).withColumn(
        "grp",
        F.col("pos_a")
        - F.row_number().over(
            Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pos_a")
        ),
    )
    return (
        isl.groupBy("doc_a", "doc_b", "diag", "grp")
        .agg(
            F.min("pos_a").cast("bigint").alias("a_start"),
            (F.count(F.lit(1)) + F.lit(w - 1)).cast("bigint").alias("span_tokens"),
        )
        .withColumn("b_start", (F.col("a_start") - F.col("diag")).cast("bigint"))
        .where(F.col("span_tokens") >= min_span)
        .select("doc_a", "doc_b", "a_start", "b_start", "span_tokens")
    )


def _coverage(spark: SparkSession, intervals: DataFrame) -> DataFrame:
    """(doc_id, covered) — interval-union coverage per document over an
    intervals frame (doc_id, s, e); the registered keep-list's
    ``interval_union_ctes`` arithmetic in DataFrame form (no WithCTE:
    see :func:`_posgrams_df`; the parity test pins equivalence)."""
    from pyspark.sql import Window

    ordered = Window.partitionBy("doc_id").orderBy("s", "e")
    mk = intervals.withColumn(
        "prev_e",
        F.max("e").over(ordered.rowsBetween(Window.unboundedPreceding, -1)),
    )
    gr = mk.withColumn(
        "grp",
        F.sum(
            F.when(F.col("prev_e").isNull() | (F.col("s") > F.col("prev_e")), 1)
            .otherwise(0)
        ).over(ordered),
    )
    return (
        gr.groupBy("doc_id", "grp")
        .agg((F.max("e") - F.min("s") + 1).alias("len"))
        .groupBy("doc_id")
        .agg(F.sum("len").cast("bigint").alias("covered"))
    )


def span_dedup_from_store(
    spark: SparkSession,
    batch_docs: DataFrame,
    table_prefix: str,
    cap: int | None = None,
    min_span: int = SPAN_MIN_TOKENS,
    threshold_permille: int = SPAN_DROP_PERMILLE,
    ckpt_ids: set[int] | None = None,
) -> DataFrame:
    """Span-dedup the increment Δ against the persisted corpus index +
    within Δ itself. One row per batch doc: (doc_id, n_tokens,
    covered_corpus, covered_total, coverage_permille, decision ∈
    dup_of_corpus | dup_within_batch | keep).

    ``covered_corpus`` is the interval-union coverage from spans
    shared with LIVE corpus docs; ``covered_total`` adds spans shared
    with lower-id batch mates (the min-keeper convention within Δ).
    Corpus claims take precedence regardless of id order — the store
    IS the kept corpus, the incremental siblings' contract.

    ``cap=None`` enumerates every matched gram exactly; an integer cap
    star-collapses grams whose LIVE store df exceeds it onto the
    store's min-id keeper at the keeper's own positions (claims by the
    keeper — the evidence coverage consumes — are preserved exactly;
    see the batch query's pinned property), and caps the batch arm's
    own df identically via the registered capped SQL."""
    # refresh before reading: probes may run in a different session
    # than the loop's foreachBatch clones append from, and the
    # table-relation cache is per-session (the search index found
    # this the hard way; metadata-only re-listing)
    for t in ("posgrams", "docs"):
        spark.catalog.refreshTable(f"{table_prefix}_{t}")
    _check_span_hash_format(spark, table_prefix)
    # pin Δ's gram frame: one tokenize+hash pass total (the subtree is
    # consumed by the prefix collect, the gram broadcast, the stats
    # annotation and both candidate arms — unpinned, a large
    # micro-batch would pay the hash pass 4-6×; the dHash probe's
    # localCheckpoint discipline, image_dedup.py)
    # the returned plan references this checkpoint, so the function
    # cannot release it itself; a LOOP caller passes ``ckpt_ids`` and
    # releases after consuming the decisions — without it, one pinned
    # RDD leaks per micro-batch for the life of the loop (r14)
    if ckpt_ids is not None:
        from flink_wsr_project_spark.operators.iterative import (
            local_checkpoint_tracked,
        )

        bp, _ids = local_checkpoint_tracked(_posgrams_df(spark, batch_docs))
        ckpt_ids.update(_ids)
    else:
        bp = _posgrams_df(spark, batch_docs).localCheckpoint()
    bnt = _ntokens_df(spark, batch_docs)
    from flink_wsr_project_spark.operators.incremental_dedup import (
        _store_hash_partitions,
    )
    from flink_wsr_project_spark.operators.retention import live_rows

    scan = spark.table(f"{table_prefix}_posgrams")
    p = _store_hash_partitions(spark, f"{table_prefix}_posgrams")
    if p:
        # small-Δ directory pruning: Δ's distinct hash prefixes are a
        # driver list bounded by the layout constant P, pushed as a
        # literal IN filter the scan prunes on (PartitionFilters).
        # When Δ touches most prefixes this degrades gracefully to the
        # full scan plus one Δ-bounded collect.
        gps = [
            r.gp
            for r in bp.select(
                F.pmod(F.xxhash64("gh"), F.lit(p)).alias("gp")
            )
            .distinct()
            .collect()
        ]
        scan = scan.where(F.col("gp").isin(gps) if gps else F.lit(False))
    sp = live_rows(
        spark,
        scan.select("doc_id", "pos", "gh", "vh"),
        table_prefix,
        "doc_id",
    )

    # store-side stats for exactly Δ's grams: broadcast the bounded
    # distinct-gram set so the bucketed store is semi-joined without
    # an exchange; the stats aggregates are duplicate-immune by
    # construction (df counts distinct (gh, doc_id) groups, minpos is
    # a min), which matters because a crash between absorb's two
    # appends can leave physically double-appended gram rows until
    # compaction heals them
    bg = bp.select("gh").distinct()
    hit = sp.join(F.broadcast(bg), "gh")
    g1 = hit.groupBy("gh", "doc_id").agg(F.min("pos").alias("minpos"))
    stats = g1.groupBy("gh").agg(
        F.count(F.lit(1)).alias("df"),
        F.min("doc_id").alias("keeper"),
    )

    # annotate Δ rows with their grams' store stats (inner join: grams
    # absent from the store have no corpus evidence by definition)
    bpa = bp.join(F.broadcast(stats), "gh")

    # within-cap arm joins the CAP-FILTERED matched subset, not the
    # raw store: the shuffled mass is bounded by within-cap occurrence
    # counts (over-cap boilerplate never enters the join), and the
    # dropDuplicates makes the candidate arm duplicate-immune — a
    # duplicated (doc, pos) store row would otherwise break the
    # diagonal merge's row_number uniqueness and inflate span lengths
    within_stats = stats if cap is None else stats.where(F.col("df") <= cap)
    hit_w = hit.join(
        F.broadcast(within_stats.select("gh")), "gh"
    ).dropDuplicates(["gh", "doc_id", "pos"])
    within = (
        bpa.join(hit_w.alias("cs"), ["gh"])
        .where(
            (F.col("cs.vh") == bpa["vh"]) & (F.col("cs.doc_id") != bpa["doc_id"])
        )
        .select(
            F.col("cs.doc_id").alias("doc_a"),
            F.col("cs.pos").alias("pos_a"),
            bpa["doc_id"].alias("doc_b"),
            bpa["pos"].alias("pos_b"),
        )
    )
    if cap is None:
        corpus_cand = within
    else:
        # star arm: over-cap Δ rows join the KEEPER'S OWN occurrence
        # rows of the gram (not a single precomputed keeper position —
        # a keeper with a stray extra copy of a gram would pull it
        # onto the wrong diagonal and fragment the keeper-side span;
        # r13 review finding, same fix as the batch SQL). hit_k is
        # deduped like hit_w, and star rows carry the full two-hash
        # verify. Row count per over-cap gram: |Δ occ|·|keeper occ|.
        over_keepers = stats.where(F.col("df") > cap).select("gh", "keeper")
        hit_k = (
            hit.join(F.broadcast(over_keepers), "gh")
            .where(F.col("doc_id") == F.col("keeper"))
            .select("gh", "doc_id", "pos", "vh")
            .dropDuplicates(["gh", "doc_id", "pos"])
        )
        star = (
            bpa.where((F.col("df") > cap) & (F.col("keeper") != F.col("doc_id")))
            .select(
                "gh",
                F.col("vh").alias("b_vh"),
                F.col("doc_id").alias("b_doc"),
                F.col("pos").alias("b_pos"),
            )
            .join(hit_k, "gh")
            .where(F.col("vh") == F.col("b_vh"))
            .select(
                F.col("doc_id").alias("doc_a"),
                F.col("pos").alias("pos_a"),
                F.col("b_doc").alias("doc_b"),
                F.col("b_pos").alias("pos_b"),
            )
        )
        corpus_cand = within.unionByName(star)

    # NOT pinned on purpose: the corpus-span subtree executes twice
    # (corpus-only and total coverage — bounded by matched rows, the
    # arms' verified joins), which is the price of the returned frame
    # remaining a LAZY plan that still contains the store scan — the
    # shuffle-freeness plan-walk tests (and any operator explaining
    # the probe) inspect exactly that.
    corpus_spans = _merge_cand_to_spans(spark, corpus_cand, min_span)

    # within-batch arm: the registered capped pair SQL over Δ only —
    # the same generated body the external oracle gate pins
    batch_spans = spark.sql(
        span_pairs_sql("spark", cap, min_span, source="{batch}"),
        batch=batch_docs,
    )

    ivc = corpus_spans.select(
        F.col("doc_b").alias("doc_id"),
        F.col("b_start").alias("s"),
        (F.col("b_start") + F.col("span_tokens") - 1).alias("e"),
    )
    ivb = batch_spans.select(
        F.col("doc_b").alias("doc_id"),
        F.col("b_start").alias("s"),
        (F.col("b_start") + F.col("span_tokens") - 1).alias("e"),
    )
    cov_c = _coverage(spark, ivc).withColumnRenamed("covered", "covered_corpus")
    cov_t = _coverage(spark, ivc.unionByName(ivb)).withColumnRenamed(
        "covered", "covered_total"
    )

    out = (
        bnt.join(cov_c, "doc_id", "left")
        .join(cov_t, "doc_id", "left")
        .na.fill({"covered_corpus": 0, "covered_total": 0})
    )
    thr = F.lit(threshold_permille) * F.col("n_tokens")
    return out.select(
        "doc_id",
        "n_tokens",
        "covered_corpus",
        "covered_total",
        (F.col("covered_total") * 1000 / F.col("n_tokens"))
        .cast("bigint")
        .alias("coverage_permille"),
        F.when(F.col("covered_corpus") * 1000 >= thr, F.lit("dup_of_corpus"))
        .when(F.col("covered_total") * 1000 >= thr, F.lit("dup_within_batch"))
        .otherwise(F.lit("keep"))
        .alias("decision"),
    )


def absorb_spans_into_store(
    spark: SparkSession,
    batch_docs: DataFrame,
    decisions: DataFrame,
    table_prefix: str,
    num_buckets: int = 8,
    exclude_existing: bool = False,
) -> int:
    """Fold the increment's KEPT docs into the index so the next
    increment sees them as corpus. Dropped docs are deliberately not
    absorbed (their covered content survives in its keepers). Deleted/
    expired ids are masked unconditionally; ``exclude_existing=True``
    anti-joins against the ``doc_id``-bucketed roster (NOT the
    gh-keyed gram table) for replay idempotence. The kept set is
    pinned before the first append — the decision plan reads the store
    the appends mutate (the siblings' read-your-writes discipline).
    Returns the number of docs absorbed."""
    from flink_wsr_project_spark.operators.iterative import (
        local_checkpoint_tracked,
        release_persistent_rdds,
    )
    from flink_wsr_project_spark.operators.retention import live_rows

    _check_span_hash_format(spark, table_prefix)
    kept_plan = batch_docs.join(
        decisions.where(F.col("decision") == "keep").select("doc_id"), "doc_id"
    )
    kept_plan = live_rows(spark, kept_plan, table_prefix, "doc_id")
    if exclude_existing:
        kept_plan = kept_plan.join(
            spark.table(f"{table_prefix}_docs").select("doc_id"),
            "doc_id",
            "left_anti",
        )
    kept, ckpt_ids = local_checkpoint_tracked(kept_plan)
    try:
        n = kept.count()
        from flink_wsr_project_spark.operators.incremental_dedup import (
            _store_hash_partitions,
        )

        p = _store_hash_partitions(spark, f"{table_prefix}_posgrams")
        pg = _posgrams_df(spark, kept)
        w = pg.write
        if p:
            w = pg.withColumn(
                "gp", F.pmod(F.xxhash64("gh"), F.lit(p))
            ).write.partitionBy("gp")
        (
            w.bucketBy(num_buckets, "gh")
            .mode("append")
            .format("parquet")
            .saveAsTable(f"{table_prefix}_posgrams")
        )
        (
            _ntokens_df(spark, kept)
            .write.bucketBy(num_buckets, "doc_id")
            .mode("append")
            .format("parquet")
            .saveAsTable(f"{table_prefix}_docs")
        )
    finally:
        release_persistent_rdds(spark, ckpt_ids)
    return n


def compact_span_store(spark: SparkSession, table_prefix: str) -> dict[str, int]:
    """Rewrite both tables to one file per bucket slot with TOMBSTONES
    and RETENTION applied physically (the generic catalog-driven
    rewrite; crash-recoverable swap — run :func:`recover_span_store`
    at loop startup). The posgrams dropDuplicates heals the one
    physical-duplication window: absorb appends posgrams BEFORE the
    roster (the replay anti-join checks the roster, so a crash between
    the appends makes the replay re-append the gram rows). Decisions
    are already immune — the probe's stats are duplicate-tolerant
    aggregates and its candidate arm dropDuplicates on (gh, doc, pos)
    — so the rewrite removes bloat, not wrongness. Returns
    {table: surviving rows}."""
    from flink_wsr_project_spark.operators.retention import live_rows
    from flink_wsr_project_spark.operators.tombstones import (
        rewrite_tombstones_deduped,
    )
    from flink_wsr_project_spark.sources.writers import compact_bucketed_table

    out: dict[str, int] = {}
    for suffix in ("posgrams", "docs"):
        table = f"{table_prefix}_{suffix}"
        out[table] = compact_bucketed_table(
            spark,
            table,
            transform=lambda df: live_rows(
                spark, df.dropDuplicates(), table_prefix, "doc_id"
            ),
        )
    rewrite_tombstones_deduped(spark, table_prefix)
    return out


def recover_span_store(spark: SparkSession, table_prefix: str) -> bool:
    """Complete any interrupted compaction swap or tombstone/retention
    rewrite — idempotent, run at loop startup like the siblings.
    Returns True when a recovery ran."""
    from flink_wsr_project_spark.operators.retention import recover_retention
    from flink_wsr_project_spark.operators.tombstones import recover_tombstones
    from flink_wsr_project_spark.sources.writers import finish_table_swap

    ran = False
    for suffix in ("posgrams", "docs"):
        ran = finish_table_swap(spark, f"{table_prefix}_{suffix}") or ran
    ran = recover_tombstones(spark, table_prefix) or ran
    ran = recover_retention(spark, table_prefix) or ran
    return ran
