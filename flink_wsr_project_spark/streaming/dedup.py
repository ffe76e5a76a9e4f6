"""Streaming deduplication — the streaming arm of the dedup family
(operators/dedup.py is the batch side).

The reference has no streaming dedup operator; this covers the
training-data-pipeline mandate: exact-duplicate suppression on a
document stream. Spark-first: ``dropDuplicatesWithinWatermark`` keys
the state store on the content hash and evicts state as the watermark
passes — O(unique-keys-within-delay) state, not O(stream).

For id-keyed streams (exactly-once upsert semantics on event_id),
plain ``dropDuplicates`` + watermark gives the same bounded-state
behavior.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from flink_wsr_project_spark.operators.windows import ensure_event_time


def dedup_stream_exact(
    stream: DataFrame,
    content_col: str,
    ts_col: str,
    watermark: str = "10 minutes",
    hash_alias: str = "content_hash",
) -> DataFrame:
    """Keep the first-seen row per content hash within the watermark
    horizon. Hashing first (md5, JVM-side) means the state store keys
    on 32 bytes, never on the document text itself."""
    hashed = ensure_event_time(stream, ts_col).withColumn(hash_alias, F.md5(F.col(content_col)))
    if stream.isStreaming:
        return hashed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            [hash_alias]
        )
    return hashed.dropDuplicates([hash_alias])


def dedup_stream_by_key(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Exactly-once by business key (e.g. event_id) within the
    watermark horizon."""
    stream = ensure_event_time(stream, ts_col)
    if stream.isStreaming:
        return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            key_cols
        )
    return stream.dropDuplicates(key_cols)


def build_band_claim_fold(ttl_ms: int):
    """Fold for :func:`dedup_stream_near`: state per (band, band_hash)
    bucket is the KEEPER — the first document to claim the bucket —
    plus the newest event time seen (drives eviction). Keep-first is
    arrival-order semantics by definition (the same discipline as the
    reference's per-element Bloom FIRE_AND_PURGE sequence and
    ``dropDuplicatesWithinWatermark``): a late-arriving older document
    does NOT steal an already-claimed bucket, so no frontier bookkeeping
    is needed — every row simply compares against the keeper.

    Vectorized trivially: the keeper is the carried state or the
    micro-batch's first row in (t, doc_id) order; every row emits
    (doc_id, band, keeper_doc_id, is_new_bucket) where is_new_bucket
    is true only for the single claiming row. State is two longs per
    LIVE bucket, evicted (event-time timeout) once the watermark
    passes last-seen + ``ttl_ms`` — exactly the
    O(unique-keys-within-horizon) budget of the exact-dedup path."""

    def fn(key, pdfs, state):
        import pandas as pd

        cols = ["doc_id", "band", "keeper_doc_id", "is_new_bucket"]
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame([], columns=cols)
            return
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if not len(pdf):
            yield pd.DataFrame([], columns=cols)
            return
        pdf = pdf.sort_values(["t", "doc_id"], kind="mergesort")
        if state.exists:
            keeper, last_t = int(state.get[0]), float(state.get[1])
            new_mask = [False] * len(pdf)
        else:
            keeper, last_t = int(pdf["doc_id"].iloc[0]), float("-inf")
            new_mask = [True] + [False] * (len(pdf) - 1)
        last_t = max(last_t, float(pdf["t"].max()))
        state.update((keeper, last_t))
        # t is MILLISECOND-granular (unix_millis upstream): flooring to
        # seconds here could set a timeout below the current watermark
        # under a sub-second delay and kill the query
        state.setTimeoutTimestamp(int(last_t) + ttl_ms)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].to_numpy(),
                "band": pdf["band"].to_numpy(),
                "keeper_doc_id": keeper,
                "is_new_bucket": new_mask,
            },
            columns=cols,
        )

    return fn


def _band_signature_rows(
    stream: DataFrame,
    content_col: str,
    id_col: str,
    ts_col: str,
    keep_hv: bool = False,
) -> DataFrame:
    """Shared in-row signature prep for the streaming dedup arms: one
    row per (doc, band) with the batch pipeline's EXACT band-hash
    VALUES (operators/dedup.py — the r16 polynomial token-code
    scheme), every step JVM-side. A micro-batch cannot run the batch
    path's explode + aggregate shape, so the shingle hashes compute
    in-row (``shingle_hash_array_expr``; equality with the batch form
    is pinned in tests/test_properties.py) and the 16 permutation
    folds are pure arithmetic over that array. ``keep_hv``
    additionally carries the shingle-hash array through (the
    incremental arm's verify needs it in-row)."""
    from flink_wsr_project_spark.operators.dedup import (
        BAND_SIZE,
        N_BANDS,
        N_PERMS,
        band_hash_expr,
        minhash_from_hashed_expr,
        shingle_hash_array_expr,
        toks_expr,
    )

    pre = ensure_event_time(stream, ts_col)
    pre = pre.withColumn("_t", F.expr(toks_expr(content_col, "spark")))
    pre = pre.withColumn(
        "_hv",
        F.expr(shingle_hash_array_expr("_t", f"trim({content_col})", "spark")),
    )
    # ONE projection for all 16 minhashes (chained withColumn nests a
    # Project per call — needless per-trigger analyzer work)
    pre = pre.withColumns(
        {
            f"_mh{k}": F.expr(minhash_from_hashed_expr(k, "spark", arr="_hv"))
            for k in range(N_PERMS)
        }
    )
    # Explode a LITERAL band-index array and compute each row's band
    # hash from the _mh attribute columns AFTER the explode (r16).
    # The previous shape — posexplode of a computed `_bands` array —
    # triggered InferFiltersFromGenerate: the optimizer infers
    # `size(_bands) > 0 AND _bands IS NOT NULL` from the generator and
    # predicate pushdown inlines the FULL signature chain (tokenize ×
    # shingle folds × 16 permutations, alias substitution ignores
    # expression cost) into a per-row Filter at the scan —
    # neardup_bucket_claims measured 138 s at sf0.1 from a query whose
    # projections alone cost ~3 s. A literal generator input makes the
    # inferred filter foldable (constant-folded away); the per-band
    # CASE touches only already-computed _mh attributes, and Generate
    # is a CollapseProject barrier so nothing re-inlines. Values are
    # bit-identical (same band_hash_expr over the same minhashes).
    band_case = "CASE band " + " ".join(
        "WHEN {b} THEN {h}".format(
            b=b,
            h=band_hash_expr(
                [f"_mh{b * BAND_SIZE + j}" for j in range(BAND_SIZE)], "spark"
            ),
        )
        for b in range(N_BANDS)
    ) + " END"
    cols = [
        F.col(id_col).alias("doc_id"),
        F.col(ts_col),
        # millisecond epoch: the fold's eviction timer must not be
        # coarser than the watermark granularity
        F.expr(f"unix_millis({ts_col})").alias("t"),
    ]
    if keep_hv:
        cols.append(F.col("_hv"))
    band_lits = ", ".join(str(b) for b in range(N_BANDS))
    exploded = pre.select(
        *cols,
        F.explode(F.expr(f"array({band_lits})")).alias("band"),
        *[F.col(f"_mh{k}") for k in range(N_PERMS)],
    )
    return exploded.withColumn("band_hash", F.expr(band_case)).drop(
        *[f"_mh{k}" for k in range(N_PERMS)]
    )


def dedup_stream_near(
    stream: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming NEAR-duplicate suppression — the streaming arm of the
    MinHash-LSH family (batch: ``dedup_minhash_lsh``). Each document's
    16 minhashes fold over its in-row shingle array and collapse to 4
    band keys — the batch pipeline's EXACT expressions
    (operators/dedup.py), all JVM-side in whole-stage codegen — then
    one stateful op keyed by (band, band_hash) marks every arrival
    against the bucket's keeper. A document is a near-duplicate of the
    stream's recent past iff ANY of its bands lands in a claimed
    bucket (emissions are per-band; the any-band rollup is one
    groupBy on the consumer side — Structured Streaming disallows a
    second stateful op in the same query, and the rollup needs no
    state).

    Scale: state is two longs per live band bucket within the
    watermark horizon (event-time eviction pinned in tests), the
    shuffle key is a 32-char band hash — never text — and the only
    per-document cost is the signature fold the batch path already
    pays. Pinned by tests/test_streaming.py::test_dedup_stream_near
    (band collisions agree with the batch LSH pair set) and fold
    properties in tests/test_stateful_folds.py."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from flink_wsr_project_spark.streaming.stateful import _interval_ms

    keyed = _band_signature_rows(stream, content_col, id_col, ts_col)
    if not stream.isStreaming:
        # batch twin of the same contract (applyInPandasWithState is
        # streaming-only): keep-first by (t, doc_id) per bucket via one
        # partitioned window — lets tests prove stream == batch when
        # the stream arrives in event-time order
        from pyspark.sql import Window as W

        win = W.partitionBy("band", "band_hash").orderBy("t", "doc_id")
        return (
            keyed.withColumn("_rn", F.row_number().over(win))
            .withColumn("keeper_doc_id", F.first("doc_id").over(win))
            .select(
                "doc_id",
                F.col("band").cast("int").alias("band"),
                "keeper_doc_id",
                (F.col("_rn") == 1).alias("is_new_bucket"),
            )
        )
    keyed = keyed.withWatermark(ts_col, watermark)
    fn = build_band_claim_fold(_interval_ms(watermark))
    return keyed.select("band", "band_hash", "doc_id", "t", ts_col).groupBy(
        "band", "band_hash"
    ).applyInPandasWithState(
        fn,
        "doc_id long, band int, keeper_doc_id long, is_new_bucket boolean",
        "keeper long, last_t double",
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )


def decontaminate_stream(
    stream: DataFrame,
    benchmark: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str = "ts",
    n: int | None = None,  # defaults to the batch pipeline's DECON_N
    window: str = "1 minute",
    watermark: str = "10 minutes",
) -> DataFrame:
    """In-stream benchmark decontamination — the deploy shape of the
    batch ``benchmark_decontaminate`` query: incoming training
    documents are checked for any shared sliding ``n``-token gram with
    a STATIC benchmark corpus, and a per-document verdict is emitted
    once its event-time window finalizes.

    Spark-first plan: the benchmark side collapses to a DISTINCT
    md5(gram) table ONCE (batch) and is BROADCAST — each micro-batch
    probes an executor-local hash relation, zero stream-side join
    state; the stream side tokenizes and grams JVM-side (the batch
    query's exact expressions), explodes to (doc, gram-hash), LEFT
    OUTER joins the broadcast side, then one watermarked windowed
    aggregation rolls the verdict up per document: ``n_grams``,
    ``n_leaked`` (distinct grams also in the benchmark), and
    ``contaminated`` (any leak). Documents shorter than ``n`` tokens
    have zero grams and emit a clean verdict (outer explode keeps
    them).

    At 100 TB the benchmark gram table is the tiny side by
    construction (eval sets, not the crawl); if it ever outgrows a
    broadcast, the same plan runs as a shuffled join — nothing else
    changes."""
    from flink_wsr_project_spark.operators.text import (
        DECON_N,
        gram_hashes_expr,
        passage_tokens_expr,
    )

    if n is None:
        n = DECON_N
    # the batch decontamination's tokenizer and gram length, imported —
    # not copied — so the twins cannot silently diverge (the tokenizer
    # expression references the column literally as `text`)
    tk = passage_tokens_expr("spark").replace("lower(text)", f"lower({content_col})")
    grams = gram_hashes_expr("_tk", n, "spark")
    bench_gh = (
        benchmark.withColumn("_tk", F.expr(tk))
        .select(F.explode(F.expr(grams)).alias("gh"))
        .distinct()
    )
    pre = (
        ensure_event_time(stream, ts_col)
        .withColumn("_tk", F.expr(tk))
        .select(
            F.col(id_col).alias("doc_id"),
            F.col(ts_col),
            # in-row array_distinct BEFORE the explode: per-doc gram
            # hashes are then unique, so the windowed rollup needs only
            # plain count() — streaming aggregation forbids
            # count(DISTINCT) and this removes the need for it
            F.explode_outer(F.array_distinct(F.expr(grams))).alias("gh"),
        )
    )
    if stream.isStreaming:
        pre = pre.withWatermark(ts_col, watermark)
    joined = pre.join(
        F.broadcast(bench_gh.withColumnRenamed("gh", "bench_gh")),
        pre["gh"] == F.col("bench_gh"),
        "left_outer",
    )
    return (
        joined.groupBy(F.window(ts_col, window).alias("w"), "doc_id")
        .agg(
            F.count("gh").alias("n_grams"),
            F.count("bench_gh").alias("n_leaked"),
            (F.count("bench_gh") > 0).alias("contaminated"),
        )
        .select(
            F.col("w.end").cast("long").alias("window_end"),
            "doc_id",
            "n_grams",
            "n_leaked",
            "contaminated",
        )
    )


def dedup_incremental_stream(
    stream: DataFrame,
    spark,
    table_prefix: str,
    content_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    dedup_pairs: bool = True,
) -> DataFrame:
    """Streaming arm of the incremental-dedup store
    (operators/incremental_dedup.py): incoming documents are checked
    for verified near-duplicates in the PERSISTED corpus signature
    store, emitting (doc_id, ts, corpus_dup_of, jaccard) per verified
    corpus partner.

    Spark-first plan — stream-STATIC joins, ZERO custom state: the
    stream side computes its band rows in-row (the batch pipeline's
    exact expressions via ``_band_signature_rows``, shingle-hash array
    kept in-row for the verify), equi-joins the store's bucketed
    ``<prefix>_longsigs`` on (band, hash) — the static side arrives
    pre-bucketed, so only stream rows shuffle — then joins the
    candidate's hash array from ``<prefix>_hashed`` and verifies exact
    hash-set Jaccard ≥ 0.5 in-row. With ``dedup_pairs`` (default) a
    (doc, partner) pair colliding in several bands emits once —
    ``dropDuplicatesWithinWatermark`` keyed on the pair, the query's
    only stateful op, O(verified pairs within the horizon) state;
    with it off the query is fully stateless and consumers roll up.

    Within-STREAM duplicates are deliberately out of scope here:
    compose ``dedup_stream_near`` upstream for that (same signature
    prep, one fold) — mirroring the batch split where the store
    answers "seen in the corpus?" and the chain answers "seen in this
    batch?". The store grows between restarts via
    ``absorb_kept_into_store``; a RUNNING query reads the static side
    as of query start (Spark snapshots static relations per query) —
    restart the stream to pick up absorbed increments."""
    sigs = _band_signature_rows(stream, content_col, id_col, ts_col, keep_hv=True)
    store_longsigs = spark.table(f"{table_prefix}_longsigs")
    store_hashed = spark.table(f"{table_prefix}_hashed")

    from flink_wsr_project_spark.operators.dedup import jaccard_expr

    cand = sigs.join(
        store_longsigs.select(
            F.col("doc_id").alias("corpus_doc_id"),
            F.col("b").cast("int").alias("band"),
            F.col("h").alias("band_hash"),
        ),
        ["band", "band_hash"],
    )
    verified = (
        cand.join(
            store_hashed.select(
                F.col("doc_id").alias("corpus_doc_id"), F.col("hv").alias("_corpus_hv")
            ),
            "corpus_doc_id",
        )
        .withColumn("jaccard", F.expr(jaccard_expr("_hv", "_corpus_hv", "spark")))
        .where(F.col("jaccard") >= 0.5)
        .select(
            F.col("doc_id"),
            F.col(ts_col),
            F.col("corpus_doc_id").alias("corpus_dup_of"),
            "jaccard",
        )
    )
    if not dedup_pairs:
        return verified
    if verified.isStreaming:
        return verified.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            ["doc_id", "corpus_dup_of"]
        )
    return verified.dropDuplicates(["doc_id", "corpus_dup_of"])


def dedup_absorb_foreach_batch(
    table_prefix: str,
    decisions_sink,
    num_buckets: int = 8,
    content_col: str = "text",
    id_col: str = "doc_id",
    max_files_per_bucket: int | None = None,
):
    """foreachBatch body for CONTINUOUS incremental dedup with corpus
    growth — the capability ``dedup_incremental_stream``'s stream-static
    plan cannot have (a running stream-static join snapshots the store
    at query start; absorbed docs only appear on restart). Each
    micro-batch here runs as a BATCH plan, so it reads the store as of
    ITS OWN execution:

        probe (pruned path when the store is hash-partitioned, else the
        bucketed join) → hand the |Δ|-sized, pinned decision frame to
        ``decisions_sink(decisions_df, batch_id)`` → absorb kept docs
        with ``exclude_existing=True``.

    Failure contract (foreachBatch is at-least-once): a replayed
    micro-batch re-emits its decisions (sinks must tolerate replay, the
    standard Spark contract) and re-runs the absorb, which the
    anti-join makes a no-op for docs already in the store — the store
    never double-absorbs regardless of where the previous attempt
    crashed. One replay nuance, deliberate: a doc kept-and-absorbed by
    the crashed attempt is self-excluded from matching ITSELF, but a
    batch-mate that originally claimed it within-batch now finds it in
    the CORPUS — same ``dup_of`` partner, label shifts from
    dup_within_batch to dup_of_corpus. Partner identity, not label, is
    the replay-stable part of the contract.

    At 100 TB the per-micro-batch cost is the pruned probe's (touched
    partitions + broadcast Δ); absorb appends one file set per batch.
    With ``max_files_per_bucket`` set, the file-count compaction
    schedule is CODE, not advice: after each absorb the body checks
    ``sources.writers.should_compact`` against the longsigs table and
    runs ``compact_signature_store`` when the threshold is crossed —
    so a long-running loop's scan cost is bounded by the dial instead
    of growing linearly with batches. The check is two catalog file
    listings per batch; the compaction itself is the crash-recoverable
    swap (run ``recover_store_compaction`` at loop startup). Left
    ``None``, compaction stays an external scheduling concern.
    (``pipeline.ingest_batch`` is the sibling surface with its OWN
    directory state and exactly-once admission per batch_id; THIS loop
    exists to keep the shared catalog store — the one batch jobs and
    doc-lookups probe — current.)

    Usage::

        q = (stream.writeStream
             .foreachBatch(dedup_absorb_foreach_batch("store", sink))
             .start())
    """
    from flink_wsr_project_spark.operators.incremental_dedup import (
        _store_hash_partitions,
        absorb_kept_into_store,
        compact_signature_store,
        dedup_incremental_from_store,
        dedup_incremental_from_store_pruned,
    )
    from flink_wsr_project_spark.operators.iterative import (
        local_checkpoint_tracked,
        release_persistent_rdds,
    )
    from flink_wsr_project_spark.sources.writers import should_compact

    def body(batch_df: DataFrame, batch_id: int) -> None:
        # foreachBatch hands the body a frame bound to a CLONED session;
        # temp views are session-scoped, so every step must run on the
        # batch frame's own session or view registrations silently
        # resolve against stale outer-session state
        s = batch_df.sparkSession
        docs = batch_df.select(
            F.col(id_col).alias("doc_id"), F.col(content_col).alias("text")
        )
        pruned = _store_hash_partitions(s, f"{table_prefix}_longsigs") > 0
        probe = (
            dedup_incremental_from_store_pruned if pruned else dedup_incremental_from_store
        )
        # pin BEFORE the sink and the absorb: the decision plan reads
        # the store, and the absorb below mutates it (the same
        # read-your-writes discipline absorb itself documents)
        decisions, ids = local_checkpoint_tracked(probe(s, docs, table_prefix))
        try:
            decisions_sink(decisions, batch_id)
            absorb_kept_into_store(
                s, docs, decisions, table_prefix, num_buckets, exclude_existing=True
            )
        finally:
            release_persistent_rdds(s, ids)
        if max_files_per_bucket is not None and should_compact(
            s, f"{table_prefix}_longsigs", max_files_per_bucket
        ):
            compact_signature_store(s, table_prefix)

    return body


def image_dedup_foreach_batch(
    table_prefix: str,
    decisions_sink,
    num_buckets: int = 8,
    id_col: str = "asset_id",
    payload_col: str = "payload",
    max_files_per_bucket: int | None = None,
    bucket_cap: int | None = None,
    pruned: bool = False,
    extractor=None,
):
    """foreachBatch body for CONTINUOUS incremental image dedup — the
    multimodal sibling of ``dedup_absorb_foreach_batch``, over the
    persisted dHash block store (operators/image_dedup.py). Each
    micro-batch of (asset_id, payload) images probes the store as a
    batch plan (Arrow decode + dHash, one co-located block join),
    hands the |Δ|-pinned decisions to ``decisions_sink(df, batch_id)``,
    absorbs the kept images with ``exclude_existing=True`` (replay
    appends nothing), and — with ``max_files_per_bucket`` set —
    compacts the single block table through ``compact_dhash_store``
    (the generic catalog-driven rewrite + physical tombstone
    reclamation, so in-loop compaction also applies any takedowns
    recorded since the last one) when the file dial fires. The store
    being ONE table
    means replay has no partial-absorb window to heal; the compaction
    swap's DROP→RENAME window is healed by
    ``operators.image_dedup.recover_dhash_store`` — run it at loop
    startup, exactly like the text loop's ``recover_store_compaction``.
    ``bucket_cap`` forwards to the probe — the skew valve a
    long-running loop over a real corpus should set (degenerate blocks
    grow with the absorbed corpus; see
    ``operators.image_dedup.dhash_block_skew``). ``pruned=True``
    routes each micro-batch through the partition-pruned probe
    (``image_dedup_from_store_pruned``; the store must have been
    written with ``hash_partitions > 0``) — the small-Δ setting where
    a trickle of images should read 4/P directories, not the store.
    ``extractor`` swaps the perceptual hash (default image dHash; pass
    ``extract_audio_fingerprint`` for a continuous AUDIO dedup loop —
    the store validates the identity it was written with, so the
    wrong loop config dies loudly on its first batch).
    """
    from flink_wsr_project_spark.operators.image_dedup import (
        absorb_kept_into_dhash_store,
        compact_dhash_store,
        image_dedup_from_store,
        image_dedup_from_store_pruned,
    )
    from flink_wsr_project_spark.operators.iterative import (
        local_checkpoint_tracked,
        release_persistent_rdds,
    )
    from flink_wsr_project_spark.sources.writers import should_compact

    def body(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession
        assets = batch_df.select(
            F.col(id_col).alias("asset_id"), F.col(payload_col).alias("payload")
        )
        probe = image_dedup_from_store_pruned if pruned else image_dedup_from_store
        ids: set[int] = set()
        decisions, _dids = local_checkpoint_tracked(
            probe(
                s, assets, table_prefix, bucket_cap=bucket_cap,
                extractor=extractor, ckpt_ids=ids,
            )
        )
        ids |= _dids
        try:
            decisions_sink(decisions, batch_id)
            absorb_kept_into_dhash_store(
                s, assets, decisions, table_prefix, num_buckets,
                exclude_existing=True, extractor=extractor,
            )
        finally:
            release_persistent_rdds(s, ids)
        if max_files_per_bucket is not None and should_compact(
            s, f"{table_prefix}_blocks", max_files_per_bucket
        ):
            compact_dhash_store(s, table_prefix)

    return body


def span_dedup_foreach_batch(
    table_prefix: str,
    decisions_sink,
    num_buckets: int = 8,
    content_col: str = "text",
    id_col: str = "doc_id",
    cap: int | None = None,
    min_span: int | None = None,
    threshold_permille: int | None = None,
    max_files_per_bucket: int | None = None,
):
    """foreachBatch body for CONTINUOUS span-level dedup with corpus
    growth — the span family's loop over the persisted positional-gram
    store (operators/span_store.py), same lifecycle contract as its
    text/image/embedding siblings: each micro-batch probes the store
    as a batch plan (one broadcast of Δ's grams, the corpus never
    re-shuffles), hands the |Δ|-pinned coverage decisions to
    ``decisions_sink(df, batch_id)``, absorbs kept docs with
    ``exclude_existing=True`` (replay appends nothing), and — with
    ``max_files_per_bucket`` set — runs ``compact_span_store`` when
    the file dial fires (which also applies recorded takedowns and
    retention physically). Run ``recover_span_store`` at loop startup.
    Replay label nuance (shared with the text loop): a doc
    kept-and-absorbed by a crashed attempt re-probes as corpus — its
    batch-mates' evidence shifts from within-batch to corpus spans,
    with the covered REGIONS stable; coverage, not label, is the
    replay-stable part of the coverage contract. ``cap`` is the
    store-df star valve a long-running loop over a real corpus should
    set (boilerplate gram df grows with the absorbed corpus;
    ``span_gram_skew`` is the dashboard)."""
    from flink_wsr_project_spark.operators.iterative import (
        local_checkpoint_tracked,
        release_persistent_rdds,
    )
    from flink_wsr_project_spark.operators.span_store import (
        absorb_spans_into_store,
        compact_span_store,
        span_dedup_from_store,
    )
    from flink_wsr_project_spark.operators.spans import (
        SPAN_DROP_PERMILLE,
        SPAN_MIN_TOKENS,
    )
    from flink_wsr_project_spark.sources.writers import should_compact

    ms = SPAN_MIN_TOKENS if min_span is None else min_span
    thr = SPAN_DROP_PERMILLE if threshold_permille is None else threshold_permille

    def body(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession
        docs = batch_df.select(
            F.col(id_col).alias("doc_id"), F.col(content_col).alias("text")
        )
        ids: set[int] = set()
        decisions, _dids = local_checkpoint_tracked(
            span_dedup_from_store(
                s, docs, table_prefix, cap=cap, min_span=ms,
                threshold_permille=thr, ckpt_ids=ids,
            )
        )
        ids |= _dids
        try:
            decisions_sink(decisions, batch_id)
            absorb_spans_into_store(
                s, docs, decisions, table_prefix, num_buckets, exclude_existing=True
            )
        finally:
            release_persistent_rdds(s, ids)
        if max_files_per_bucket is not None and should_compact(
            s, f"{table_prefix}_posgrams", max_files_per_bucket
        ):
            compact_span_store(s, table_prefix)

    return body
