"""Persisted full-text search index — BM25 ranked retrieval as a
STORE, the fifth member of the persisted-store lifecycle family (text
signatures, dHash blocks, ANN lists, span posgrams, now search
postings). The registered ``bm25_search_topk`` re-tokenizes the whole
corpus per query; THIS module writes the inverted index once and
answers queries from it: at 100 TB a query's cost must be bounded by
its matched postings, never the corpus.

Store layout (two bucketed tables + one single-row state table):

* ``<prefix>_postings`` (tok, doc_id, tf) bucketed by ``tok`` — the
  inverted index. A query is a literal ``tok IN (...)`` pushed into
  the parquet scan (string min/max row-group pruning), so the probe
  reads the matched posting lists, not the index.
* ``<prefix>_docstats`` (doc_id, dl) bucketed by ``doc_id`` — per-doc
  token lengths for the BM25 length normalization (the score join's
  store side is co-partitioned) and the replay-idempotence anti-join
  target. Docs with zero tokens carry no row — the same exclusion the
  registered query's dl aggregate applies, so index and corpus
  recompute agree exactly.
* ``<prefix>_sstats`` single-row (n_docs, total_tokens) — the corpus
  stats BM25's idf/avgdl need. Scanning docstats per query to derive
  them would be a corpus-sized read on every search, so the row is
  maintained INCREMENTALLY by the verbs that change the corpus
  (write / absorb add; takedown / retention subtract — both deltas
  are bounded: the deleted-id join and the expired-slice aggregate),
  under the retention table's crash-safe swap. Drift windows (a crash
  between a table append and the stats update) are healed by
  compaction and recovery, which RECOMPUTE the row exactly from the
  surviving docstats — the mergeable-aggregate maintenance pattern
  (operators/incremental.py) applied to search.

Probe cost model: postings scan pruned to the query's terms, df from
a duplicate-immune aggregate over those matched rows, one doc_id join
against the bucketed docstats (matched side shuffles, store side is
co-partitioned), integer-micros scoring (order-independent — the
registered query's discipline, shared via ``bm25_contrib_expr`` so
index and corpus-recompute scores are bit-identical), and a global
top-k planned as TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from flink_wsr_project_spark.sources.writers import write_bucketed

# Okapi BM25 constants — the single source for the registered
# bm25_search_topk query AND the index probe.
BM25_K1 = 1.2
BM25_B = 0.75


def bm25_contrib_expr(
    tf: str, dfq: str, dl: str, n_docs: str, avgdl: str
) -> str:
    """The per-(doc, term) BM25 contribution in integer MICROS, as a
    SQL text fragment valid in Spark SQL and DuckDB alike — ONE
    formula string shared by the registered query, its oracle, and the
    index probe, so all three are bit-identical by construction
    (integer-quantized before the per-doc sum: immune to summation
    order; ln's last ulp is the only cross-engine exposure)."""
    k1, b = BM25_K1, BM25_B
    return (
        f"CAST(round(ln(1 + ({n_docs} - {dfq} + 0.5) / ({dfq} + 0.5))"
        f" * ({tf} * {k1 + 1}) / ({tf} + {k1} * (1 - {b} + {b} * {dl} / {avgdl}))"
        f" * 1000000) AS BIGINT)"
    )


def _toks_df(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """(doc_id, tok) exploded token rows — the registered query's
    tokenizer, DataFrame API (multiply-referenced frames must not be
    WithCTE subtrees; see operators/span_store.py::_posgrams_df)."""
    return docs.select(
        "doc_id",
        F.explode(
            F.expr("filter(split(lower(text), '[^a-z0-9]+'), x -> x <> '')")
        ).alias("tok"),
    )


def _postings_df(spark: SparkSession, docs: DataFrame) -> DataFrame:
    return (
        _toks_df(spark, docs)
        .groupBy("tok", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def _docstats_df(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """(doc_id, dl); zero-token docs carry no row — matching the
    registered query's dl aggregate exactly."""
    return (
        _toks_df(spark, docs)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("dl"))
    )


def _stats_table(table_prefix: str) -> str:
    return f"{table_prefix}_sstats"


def search_stats(spark: SparkSession, table_prefix: str) -> tuple[int, int]:
    """(n_docs, total_tokens) of the LIVE corpus, from the maintained
    single-row table."""
    rows = spark.table(_stats_table(table_prefix)).collect()
    return (rows[0].n_docs, rows[0].total_tokens) if rows else (0, 0)


def _write_stats(
    spark: SparkSession, table_prefix: str, n_docs: int, total_tokens: int
) -> None:
    """Crash-safe single-row rewrite (the retention table's swap)."""
    t = _stats_table(table_prefix)
    row = spark.createDataFrame(
        [(int(n_docs), int(total_tokens))], "n_docs BIGINT, total_tokens BIGINT"
    )
    if not spark.catalog.tableExists(t):
        row.coalesce(1).write.mode("overwrite").format("parquet").saveAsTable(t)
        return
    tmp = f"{t}__compact"
    spark.sql(f"DROP TABLE IF EXISTS {tmp}")
    row.coalesce(1).write.mode("overwrite").format("parquet").saveAsTable(tmp)
    spark.sql(f"DROP TABLE {t}")
    spark.sql(f"ALTER TABLE {tmp} RENAME TO {t}")


def _bump_stats(
    spark: SparkSession, table_prefix: str, d_docs: int, d_tokens: int
) -> None:
    n, tt = search_stats(spark, table_prefix)
    _write_stats(spark, table_prefix, n + d_docs, tt + d_tokens)


def recompute_search_stats(spark: SparkSession, table_prefix: str) -> tuple[int, int]:
    """Exact stats from the LIVE docstats — the drift healer
    compaction and recovery run (one pass over the 2-column docstats
    table; a recovery-time cost, never a query-time one)."""
    from flink_wsr_project_spark.operators.retention import live_rows

    spark.catalog.refreshTable(f"{table_prefix}_docstats")
    row = (
        live_rows(
            spark, spark.table(f"{table_prefix}_docstats"), table_prefix, "doc_id"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum("dl"), F.lit(0)).alias("tt"),
        )
        .collect()[0]
    )
    _write_stats(spark, table_prefix, row.n, row.tt)
    return (row.n, row.tt)


def write_search_index(
    spark: SparkSession,
    corpus_docs: DataFrame,
    table_prefix: str,
    num_buckets: int = 8,
    hash_partitions: int = 0,
) -> None:
    """One-time corpus index write: tokenize every doc once, store the
    posting lists bucketed on ``tok``, the doc lengths bucketed on
    ``doc_id``, and the exact corpus stats row.

    With ``hash_partitions = P > 0`` the postings additionally get a
    hash-prefix PARTITION column ``pp = pmod(xxhash64(tok), P)`` under
    the bucketing — the store family's small-probe layout: a query's
    few terms map to at most |terms| of the P directories, so the scan
    is directory-pruned on top of the IN-filter's row-group pruning
    (the probe detects the recorded layout and prunes automatically).
    P is recorded as a table property; keep it modest (tens)."""
    if hash_partitions < 0:
        raise ValueError(
            f"hash_partitions must be >= 0, got {hash_partitions} "
            "(0 = bucketed-only layout)"
        )
    from flink_wsr_project_spark.operators.incremental_dedup import (
        HASH_PARTITIONS_PROP,
    )

    pg = _postings_df(spark, corpus_docs)
    if hash_partitions:
        (
            pg.withColumn("pp", F.pmod(F.xxhash64("tok"), F.lit(hash_partitions)))
            .write.partitionBy("pp")
            .bucketBy(num_buckets, "tok")
            .mode("overwrite")
            .format("parquet")
            .saveAsTable(f"{table_prefix}_postings")
        )
        spark.sql(
            f"ALTER TABLE {table_prefix}_postings SET TBLPROPERTIES "
            f"('{HASH_PARTITIONS_PROP}'='{hash_partitions}')"
        )
    else:
        write_bucketed(
            pg,
            f"{table_prefix}_postings",
            ["tok"],
            num_buckets,
        )
    write_bucketed(
        _docstats_df(spark, corpus_docs),
        f"{table_prefix}_docstats",
        ["doc_id"],
        num_buckets,
    )
    recompute_search_stats(spark, table_prefix)


def bm25_from_index(
    spark: SparkSession,
    table_prefix: str,
    terms: list[str] | tuple[str, ...],
    k: int = 10,
    require_all: bool = False,
) -> DataFrame:
    """Rank the LIVE corpus for ``terms``, top-``k`` by BM25 — the
    registered ``bm25_search_topk`` answered from the index instead of
    a corpus re-tokenize (bit-identical scores: same contribution
    fragment, same integer-micros discipline; the parity test runs
    both on the same corpus). Deleted/expired docs neither match nor
    count — tombstones/retention mask the postings, and the stats row
    was debited when the verb ran.

    ``require_all=True`` switches OR semantics to AND: only documents
    matching EVERY distinct query term rank (scores unchanged for the
    survivors — the filter is a HAVING on matched-term count over the
    same contribution rows, df/idf still count every matching doc the
    way BM25 defines them)."""
    from flink_wsr_project_spark.operators.retention import live_rows

    if not terms:
        raise ValueError("terms must be a non-empty list of query tokens")
    # refresh before reading: searches come from ARBITRARY sessions
    # while the ingest loop appends from foreachBatch CLONES, and
    # Spark's table-relation cache is per-session — a session that
    # read these tables before an append would otherwise silently
    # score against the stale file list (found as rest-docs missing
    # from rankings in the streaming-loop test; a metadata-only
    # re-listing, not a data read)
    for t in ("postings", "docstats", "sstats"):
        spark.catalog.refreshTable(f"{table_prefix}_{t}")
    n_docs, total_tokens = search_stats(spark, table_prefix)
    if n_docs <= 0:
        raise ValueError(
            f"search index '{table_prefix}' has an empty/zero stats row — "
            "write or recover the index before querying"
        )
    avgdl = total_tokens / n_docs
    in_list = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    scan = spark.table(f"{table_prefix}_postings").where(
        F.expr(f"tok IN ({in_list})")
    )
    from flink_wsr_project_spark.operators.incremental_dedup import (
        _store_hash_partitions,
    )

    p = _store_hash_partitions(spark, f"{table_prefix}_postings")
    if p:
        # directory pruning on top of the IN filter: the query's few
        # terms map to at most |terms| of the P prefix directories —
        # computed driver-side from the literal terms, no data read
        pps = list(
            {
                r.pp
                for r in spark.sql(
                    f"SELECT pmod(xxhash64(t), {p}) AS pp "
                    f"FROM (SELECT explode(array({in_list})) AS t)"
                ).collect()
            }
        )
        scan = scan.where(F.col("pp").isin(pps))
    matched = live_rows(
        spark,
        scan.select("tok", "doc_id", "tf"),
        table_prefix,
        "doc_id",
    ).dropDuplicates(["tok", "doc_id", "tf"])
    # duplicate-immune df: postings are unique per (tok, doc) by
    # construction, but a crash between absorb's appends can
    # double-append until compaction heals — the dropDuplicates above
    # restores uniqueness (duplicates are exact row copies), so this
    # count is exact
    dfreq = matched.groupBy("tok").agg(F.count(F.lit(1)).alias("dfq"))
    dl = live_rows(
        spark,
        spark.table(f"{table_prefix}_docstats").select("doc_id", "dl"),
        table_prefix,
        "doc_id",
    )
    # literals must be DOUBLE-typed: Spark parses a bare decimal
    # literal as DECIMAL, whose arithmetic rounds differently from the
    # registered query's double pipeline (found as a one-micro score
    # drift in the parity test); repr() round-trips the exact double
    # through the string cast
    nd_lit = f"CAST('{float(n_docs)!r}' AS DOUBLE)"
    avgdl_lit = f"CAST('{avgdl!r}' AS DOUBLE)"
    contrib = (
        matched.join(F.broadcast(dfreq), "tok")
        .join(dl, "doc_id")
        .select(
            "doc_id",
            F.expr(bm25_contrib_expr("tf", "dfq", "dl", nd_lit, avgdl_lit)).alias("c"),
        )
    )
    scored = contrib.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("score_micros"),
        F.count(F.lit(1)).alias("_n_terms"),
    )
    if require_all:
        scored = scored.where(F.col("_n_terms") >= len(set(terms)))
    return (
        scored.select("doc_id", "score_micros")
        .orderBy(F.col("score_micros").desc(), "doc_id")
        .limit(k)
    )


def absorb_docs_into_index(
    spark: SparkSession,
    batch_docs: DataFrame,
    table_prefix: str,
    num_buckets: int = 8,
    exclude_existing: bool = False,
) -> int:
    """Fold new documents into the index (continuous indexing — every
    doc absorbs; search has no keep/drop gate). Deleted/expired ids
    are masked unconditionally; ``exclude_existing=True`` anti-joins
    the ``doc_id``-bucketed docstats for replay idempotence. Appends
    postings first, docstats second (the anti-join target lands last,
    so a replay after a crash between the appends re-appends postings
    — exact duplicates the probe's dropDuplicates tolerates and
    compaction heals), then credits the stats row. Returns docs
    absorbed."""
    from flink_wsr_project_spark.operators.iterative import (
        local_checkpoint_tracked,
        release_persistent_rdds,
    )
    from flink_wsr_project_spark.operators.retention import live_rows

    plan = live_rows(spark, batch_docs, table_prefix, "doc_id")
    if exclude_existing:
        plan = plan.join(
            spark.table(f"{table_prefix}_docstats").select("doc_id"),
            "doc_id",
            "left_anti",
        )
    kept, ckpt_ids = local_checkpoint_tracked(plan)
    try:
        # tracked too: ds is fully consumed by the appends below, and
        # the ingest loop calls this every micro-batch (r14 leak fix)
        ds, _dsids = local_checkpoint_tracked(_docstats_df(spark, kept))
        ckpt_ids |= _dsids
        agg = ds.agg(
            F.count(F.lit(1)).alias("n"), F.coalesce(F.sum("dl"), F.lit(0)).alias("tt")
        ).collect()[0]
        from flink_wsr_project_spark.operators.incremental_dedup import (
            _store_hash_partitions,
        )

        p = _store_hash_partitions(spark, f"{table_prefix}_postings")
        pg = _postings_df(spark, kept)
        w = pg.write
        if p:
            w = pg.withColumn(
                "pp", F.pmod(F.xxhash64("tok"), F.lit(p))
            ).write.partitionBy("pp")
        (
            w.bucketBy(num_buckets, "tok")
            .mode("append")
            .format("parquet")
            .saveAsTable(f"{table_prefix}_postings")
        )
        (
            ds.write.bucketBy(num_buckets, "doc_id")
            .mode("append")
            .format("parquet")
            .saveAsTable(f"{table_prefix}_docstats")
        )
        if agg.n:
            _bump_stats(spark, table_prefix, agg.n, agg.tt)
        return agg.n
    finally:
        release_persistent_rdds(spark, ckpt_ids)


def delete_from_search_index(
    spark: SparkSession, table_prefix: str, doc_ids: DataFrame
) -> int:
    """Takedown: the deleted docs leave the RANKING immediately (the
    probe's live mask) and leave the SCORING immediately too — their
    (count, Σdl) is debited from the stats row before the tombstones
    land, computed against the still-live docstats so re-deleting an
    id cannot double-debit. Physical rows reclaim at compaction.
    Returns ids recorded."""
    from flink_wsr_project_spark.operators.retention import live_rows
    from flink_wsr_project_spark.operators.tombstones import add_tombstones

    ids = doc_ids.select("doc_id")
    delta = (
        live_rows(
            spark, spark.table(f"{table_prefix}_docstats"), table_prefix, "doc_id"
        )
        .join(ids, "doc_id")
        .agg(
            F.count(F.lit(1)).alias("n"), F.coalesce(F.sum("dl"), F.lit(0)).alias("tt")
        )
        .collect()[0]
    )
    n = add_tombstones(spark, table_prefix, ids, "doc_id")
    if delta.n:
        _bump_stats(spark, table_prefix, -delta.n, -delta.tt)
    return n


def set_search_retention(
    spark: SparkSession, table_prefix: str, min_live_id: int
) -> None:
    """Retention with the stats debit this store needs: the expired
    slice's (count, Σdl) — a pushed-down range aggregate over the
    still-live docstats, bounded by the expired mass — is subtracted
    as the watermark is raised, so idf/avgdl track the live corpus
    immediately, not at the next compaction."""
    from flink_wsr_project_spark.operators.retention import (
        live_rows,
        set_retention_watermark,
    )

    delta = (
        live_rows(
            spark, spark.table(f"{table_prefix}_docstats"), table_prefix, "doc_id"
        )
        .where(F.col("doc_id") < min_live_id)
        .agg(
            F.count(F.lit(1)).alias("n"), F.coalesce(F.sum("dl"), F.lit(0)).alias("tt")
        )
        .collect()[0]
    )
    set_retention_watermark(spark, table_prefix, min_live_id)
    if delta.n:
        _bump_stats(spark, table_prefix, -delta.n, -delta.tt)


def compact_search_index(spark: SparkSession, table_prefix: str) -> dict[str, int]:
    """Rewrite both tables (tombstones + retention applied physically,
    replay-duplicated rows deduplicated) and RECOMPUTE the stats row
    from the surviving docstats — the drift healer for any crash
    window the incremental maintenance left. Docstats compacts FIRST
    and the postings rewrite is additionally semi-joined against the
    surviving docstats roster: an absorb that crashed between the
    postings append and the docstats append (and was never replayed)
    leaves orphan postings rows that are neither duplicates nor
    tombstoned — without the roster join they would never reclaim and
    would permanently inflate df for their terms. Returns
    {table: surviving rows}."""
    from flink_wsr_project_spark.operators.retention import live_rows
    from flink_wsr_project_spark.operators.tombstones import (
        rewrite_tombstones_deduped,
    )
    from flink_wsr_project_spark.sources.writers import compact_bucketed_table

    out: dict[str, int] = {}
    docstats = f"{table_prefix}_docstats"
    out[docstats] = compact_bucketed_table(
        spark,
        docstats,
        transform=lambda df: live_rows(
            spark, df.dropDuplicates(), table_prefix, "doc_id"
        ),
    )
    postings = f"{table_prefix}_postings"
    roster = spark.table(docstats).select("doc_id")
    out[postings] = compact_bucketed_table(
        spark,
        postings,
        transform=lambda df: live_rows(
            spark, df.dropDuplicates(), table_prefix, "doc_id"
        ).join(roster, "doc_id", "left_semi"),
    )
    rewrite_tombstones_deduped(spark, table_prefix)
    recompute_search_stats(spark, table_prefix)
    return out


def recover_search_index(spark: SparkSession, table_prefix: str) -> bool:
    """Finish interrupted swaps (tables, tombstones, retention, stats)
    and recompute the stats row — idempotent, run at startup; the
    recompute unconditionally heals any incremental-maintenance drift
    a crash left behind. Returns True when a swap recovery ran."""
    from flink_wsr_project_spark.operators.retention import recover_retention
    from flink_wsr_project_spark.operators.tombstones import recover_tombstones
    from flink_wsr_project_spark.sources.writers import finish_table_swap

    ran = False
    for suffix in ("postings", "docstats", "sstats"):
        ran = finish_table_swap(spark, f"{table_prefix}_{suffix}") or ran
    ran = recover_tombstones(spark, table_prefix) or ran
    ran = recover_retention(spark, table_prefix) or ran
    recompute_search_stats(spark, table_prefix)
    return ran
