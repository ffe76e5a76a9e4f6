"""Persisted BM25 search index (operators/search_index.py +
streaming/search.py) — the fifth store's lifecycle: index-vs-registered
score parity (bit-identical micros), absorb growth + replay
idempotence, takedown and retention debiting the scoring stats
immediately (verified against a corpus recompute on the SURVIVING
docs), duplicate-immune probing with compaction healing, stats-drift
recovery, pushdown into the postings scan, and the docstats side
staying exchange-free."""

from __future__ import annotations

import shutil

import pandas as pd
from pyspark.sql import functions as F

from flink_wsr_project_spark.plans.pipeline_queries import _BM25_QUERY
from tests.test_writers import _assert_store_unshuffled

SF = "/root/testdata/sf0.001"


def _drop(spark, prefix):
    for t in (
        f"{prefix}_postings",
        f"{prefix}_docstats",
        f"{prefix}_sstats",
        f"{prefix}_tombstones",
        f"{prefix}_retention",
    ):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        spark.sql(f"DROP TABLE IF EXISTS {t}__compact")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
        shutil.rmtree(f"spark-warehouse/{t}__compact", ignore_errors=True)


def _corpus(spark, sf_dir=SF):
    from flink_wsr_project_spark.sources.readers import load_table

    return load_table(spark, "documents", sf_dir).select("doc_id", "text")


def _registered_on(spark, docs_df, tmp_path, name):
    """Run the registered bm25_search_topk over an arbitrary doc set
    (written as a parquet sf dir) — the corpus-recompute baseline the
    index must match bit-for-bit."""
    from flink_wsr_project_spark.plans.registry import get

    pdf = docs_df.toPandas()
    pdf["lang"], pdf["source"], pdf["n_chars"] = "en", "web", pdf.text.str.len()
    d = tmp_path / name
    d.mkdir()
    pdf.to_parquet(d / "documents.parquet", index=False)
    return {
        (r.doc_id, r.score_micros)
        for r in get("bm25_search_topk").spark_fn(spark, str(d)).collect()
    }


def _ranked(df):
    return {(r.doc_id, r.score_micros) for r in df.collect()}


def test_index_matches_registered_query(spark, tmp_path):
    from flink_wsr_project_spark.operators.search_index import (
        bm25_from_index,
        write_search_index,
    )

    _drop(spark, "sidx")
    corpus = _corpus(spark)
    write_search_index(spark, corpus, "sidx", num_buckets=2)
    got = _ranked(bm25_from_index(spark, "sidx", list(_BM25_QUERY)))
    want = _registered_on(spark, corpus, tmp_path, "full")
    assert got == want and len(got) == 10


def test_absorb_grows_and_replay_is_idempotent(spark, tmp_path):
    from flink_wsr_project_spark.operators.search_index import (
        absorb_docs_into_index,
        bm25_from_index,
        search_stats,
        write_search_index,
    )

    _drop(spark, "sidx_ab")
    corpus = _corpus(spark)
    half = corpus.where(F.col("doc_id") % 2 == 0)
    rest = corpus.where(F.col("doc_id") % 2 == 1)
    write_search_index(spark, half, "sidx_ab", num_buckets=2)
    n = absorb_docs_into_index(
        spark, rest, "sidx_ab", num_buckets=2, exclude_existing=True
    )
    assert n == rest.count()
    got = _ranked(bm25_from_index(spark, "sidx_ab", list(_BM25_QUERY)))
    want = _registered_on(spark, corpus, tmp_path, "full_ab")
    assert got == want

    # replay: nothing appends, nothing credits
    stats_before = search_stats(spark, "sidx_ab")
    rows_before = spark.table("sidx_ab_postings").count()
    nr = absorb_docs_into_index(
        spark, rest, "sidx_ab", num_buckets=2, exclude_existing=True
    )
    assert nr == 0
    assert search_stats(spark, "sidx_ab") == stats_before
    assert spark.table("sidx_ab_postings").count() == rows_before


def test_takedown_debits_scoring_immediately(spark, tmp_path):
    """Deleting docs must shift idf/avgdl/df for every LATER query,
    before any compaction — the ranking must equal the registered
    query recomputed on the surviving corpus."""
    from flink_wsr_project_spark.operators.search_index import (
        bm25_from_index,
        delete_from_search_index,
        write_search_index,
    )

    _drop(spark, "sidx_del")
    corpus = _corpus(spark)
    write_search_index(spark, corpus, "sidx_del", num_buckets=2)
    top = bm25_from_index(spark, "sidx_del", list(_BM25_QUERY)).collect()
    victims = [top[0].doc_id, top[2].doc_id]
    delete_from_search_index(
        spark, "sidx_del",
        spark.createDataFrame([(v,) for v in victims], "doc_id long"),
    )
    got = _ranked(bm25_from_index(spark, "sidx_del", list(_BM25_QUERY)))
    surviving = corpus.where(~F.col("doc_id").isin(victims))
    want = _registered_on(spark, surviving, tmp_path, "survivors")
    assert got == want
    assert not any(d in victims for d, _ in got)

    # re-deleting must not double-debit
    from flink_wsr_project_spark.operators.search_index import search_stats

    before = search_stats(spark, "sidx_del")
    delete_from_search_index(
        spark, "sidx_del",
        spark.createDataFrame([(victims[0],)], "doc_id long"),
    )
    assert search_stats(spark, "sidx_del") == before


def test_retention_debits_scoring_immediately(spark, tmp_path):
    from flink_wsr_project_spark.operators.search_index import (
        bm25_from_index,
        set_search_retention,
        write_search_index,
    )

    _drop(spark, "sidx_ret")
    corpus = _corpus(spark)
    cutoff = 12
    write_search_index(spark, corpus, "sidx_ret", num_buckets=2)
    set_search_retention(spark, "sidx_ret", cutoff)
    got = _ranked(bm25_from_index(spark, "sidx_ret", list(_BM25_QUERY)))
    want = _registered_on(
        spark, corpus.where(F.col("doc_id") >= cutoff), tmp_path, "retained"
    )
    assert got == want


def test_probe_duplicate_immune_and_compaction_heals(spark, tmp_path):
    """Physically double-appended postings (the crash-between-appends
    replay at its worst, emulated by a raw double write) must not
    change df or scores; compaction heals the bloat and the recompute
    keeps stats exact."""
    from flink_wsr_project_spark.operators.search_index import (
        _postings_df,
        bm25_from_index,
        compact_search_index,
        search_stats,
        write_search_index,
    )

    _drop(spark, "sidx_dup")
    corpus = _corpus(spark)
    write_search_index(spark, corpus, "sidx_dup", num_buckets=2)
    clean = spark.table("sidx_dup_postings").count()
    want = _ranked(bm25_from_index(spark, "sidx_dup", list(_BM25_QUERY)))

    # raw duplicate append of one doc's postings (no stats credit —
    # exactly the crash window's on-disk state)
    one = corpus.where(F.col("doc_id") == corpus.agg(F.min("doc_id")).collect()[0][0])
    (
        _postings_df(spark, one)
        .write.bucketBy(2, "tok").mode("append").format("parquet")
        .saveAsTable("sidx_dup_postings")
    )
    assert spark.table("sidx_dup_postings").count() > clean
    got = _ranked(bm25_from_index(spark, "sidx_dup", list(_BM25_QUERY)))
    assert got == want  # duplicate-immune

    stats = search_stats(spark, "sidx_dup")
    compact_search_index(spark, "sidx_dup")
    assert spark.table("sidx_dup_postings").count() == clean
    assert search_stats(spark, "sidx_dup") == stats
    assert _ranked(bm25_from_index(spark, "sidx_dup", list(_BM25_QUERY))) == want


def test_compaction_reclaims_orphan_postings(spark, tmp_path):
    """An absorb that crashes BETWEEN the postings append and the
    docstats append, and is never replayed, leaves orphan postings —
    a doc present in postings but absent from docstats. They are
    neither exact duplicates nor tombstoned, so only the compaction
    roster semi-join can reclaim them; left behind they permanently
    inflate df for their terms (the doc itself never ranks — the dl
    join is inner)."""
    from flink_wsr_project_spark.operators.search_index import (
        _postings_df,
        bm25_from_index,
        compact_search_index,
        search_stats,
        write_search_index,
    )

    _drop(spark, "sidx_orph")
    corpus = _corpus(spark)
    write_search_index(spark, corpus, "sidx_orph", num_buckets=2)
    clean = spark.table("sidx_orph_postings").count()
    want = _ranked(bm25_from_index(spark, "sidx_orph", list(_BM25_QUERY)))

    # the crash window: postings landed for a NEW doc, docstats never
    # did (no stats credit either — absorb credits after both appends)
    ghost_id = corpus.agg(F.max("doc_id")).collect()[0][0] + 1
    ghost = spark.createDataFrame(
        [(ghost_id, " ".join(_BM25_QUERY))], "doc_id bigint, text string"
    )
    (
        _postings_df(spark, ghost)
        .write.bucketBy(2, "tok").mode("append").format("parquet")
        .saveAsTable("sidx_orph_postings")
    )
    orphaned = spark.table("sidx_orph_postings").count()
    assert orphaned > clean

    stats = search_stats(spark, "sidx_orph")
    compact_search_index(spark, "sidx_orph")
    assert spark.table("sidx_orph_postings").count() == clean
    assert search_stats(spark, "sidx_orph") == stats
    assert _ranked(bm25_from_index(spark, "sidx_orph", list(_BM25_QUERY))) == want


def test_recover_heals_stats_drift(spark):
    from flink_wsr_project_spark.operators.search_index import (
        _write_stats,
        recover_search_index,
        search_stats,
        write_search_index,
    )

    _drop(spark, "sidx_rec")
    write_search_index(spark, _corpus(spark), "sidx_rec", num_buckets=2)
    good = search_stats(spark, "sidx_rec")
    _write_stats(spark, "sidx_rec", 1, 1)  # simulated crash drift
    assert search_stats(spark, "sidx_rec") == (1, 1)
    recover_search_index(spark, "sidx_rec")
    assert search_stats(spark, "sidx_rec") == good


def test_pushdown_and_docstats_unshuffled(spark):
    """The query's terms must reach the postings parquet scan as a
    pushed IN filter, and the docstats side of the score join must
    arrive pre-bucketed (no exchange) with broadcast detection off —
    the matched side is the one that shuffles, by design."""
    from flink_wsr_project_spark.operators.search_index import (
        bm25_from_index,
        write_search_index,
    )

    _drop(spark, "sidx_plan")
    write_search_index(spark, _corpus(spark), "sidx_plan", num_buckets=2)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = bm25_from_index(spark, "sidx_plan", list(_BM25_QUERY))
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert any(
            "sidx_plan_postings" in ln and "PushedFilters:" in ln and "In(tok" in ln
            for ln in plan.splitlines()
        ), "query terms not pushed into the postings scan"
        _assert_store_unshuffled(df, "sidx_plan_docstats")
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )


def test_streaming_search_ingest_loop(spark, tmp_path):
    """The continuous-indexing loop end-to-end: two micro-batches
    absorb, a replayed batch credits nothing, and the final ranking
    equals the registered query over everything ingested."""
    from flink_wsr_project_spark.operators.search_index import (
        bm25_from_index,
        recover_search_index,
        search_stats,
        write_search_index,
    )
    from flink_wsr_project_spark.streaming.search import (
        search_ingest_foreach_batch,
    )

    _drop(spark, "sidx_loop")
    corpus = _corpus(spark)
    seed = corpus.where(F.col("doc_id") < 10)
    write_search_index(spark, seed, "sidx_loop", num_buckets=2)
    recover_search_index(spark, "sidx_loop")

    src = tmp_path / "stream_src"
    src.mkdir()
    absorbed = []

    def on_batch(n, batch_id):
        absorbed.append((batch_id, n))

    rest = corpus.where(F.col("doc_id") >= 10).toPandas()
    mid = len(rest) // 2
    rest.iloc[:mid].to_parquet(src / "b1.parquet", index=False)
    q = (
        spark.readStream.schema("doc_id long, text string").parquet(str(src))
        .writeStream.trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(
            search_ingest_foreach_batch("sidx_loop", num_buckets=2, on_batch=on_batch)
        )
        .start()
    )
    q.awaitTermination(120)
    rest.iloc[mid:].to_parquet(src / "b2.parquet", index=False)
    q = (
        spark.readStream.schema("doc_id long, text string").parquet(str(src))
        .writeStream.trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(
            search_ingest_foreach_batch("sidx_loop", num_buckets=2, on_batch=on_batch)
        )
        .start()
    )
    q.awaitTermination(120)
    assert sum(n for _, n in absorbed) == len(rest)
    n_docs, _ = search_stats(spark, "sidx_loop")
    got = _ranked(bm25_from_index(spark, "sidx_loop", list(_BM25_QUERY)))
    want = _ranked(
        __import__(
            "flink_wsr_project_spark.plans.registry", fromlist=["get"]
        ).get("bm25_search_topk").spark_fn(spark, SF)
    )
    assert got == want


def test_search_index_health(spark):
    from flink_wsr_project_spark.operators.search_index import (
        search_stats,
        write_search_index,
    )
    from flink_wsr_project_spark.operators.store_health import search_index_health

    _drop(spark, "sidx_hl")
    write_search_index(spark, _corpus(spark), "sidx_hl", num_buckets=2)
    h = search_index_health(spark, "sidx_hl")
    assert {t["table"] for t in h["tables"]} == {
        "sidx_hl_postings",
        "sidx_hl_docstats",
    }
    assert h["corpus_stats"]["n_docs"] == search_stats(spark, "sidx_hl")[0] > 0


def test_conjunctive_mode_filters_not_rescores(spark):
    """require_all=True keeps only docs matching every query term, at
    UNCHANGED scores (a filter over the same contribution rows, not a
    different scoring function) — verified against the raw text."""
    from flink_wsr_project_spark.operators.search_index import (
        bm25_from_index,
        write_search_index,
    )

    _drop(spark, "sidx_and")
    corpus = _corpus(spark)
    write_search_index(spark, corpus, "sidx_and", num_buckets=2)
    disj = {
        r.doc_id: r.score_micros
        for r in bm25_from_index(spark, "sidx_and", list(_BM25_QUERY), k=500).collect()
    }
    conj = {
        r.doc_id: r.score_micros
        for r in bm25_from_index(
            spark, "sidx_and", list(_BM25_QUERY), k=500, require_all=True
        ).collect()
    }
    assert conj and set(conj) < set(disj)
    assert all(conj[d] == disj[d] for d in conj)  # filter, not rescore
    texts = {
        r.doc_id: r.text.lower()
        for r in corpus.where(F.col("doc_id").isin(list(conj))).collect()
    }
    import re

    for d, txt in texts.items():
        toks = set(re.split(r"[^a-z0-9]+", txt))
        assert all(t in toks for t in _BM25_QUERY), d
    # and at least one disjunctive hit is genuinely missing a term
    some_partial = next(d for d in disj if d not in conj)
    assert some_partial is not None


def test_partitioned_postings_prune_and_match(spark, tmp_path):
    """The small-probe layout: a store written with hash_partitions=P
    probes with a pp IN-list that prunes directories (PartitionFilters
    in the scan), ranks identically to the bucketed-only layout,
    absorbs under the right directories, and keeps layout + property
    through compaction."""
    from flink_wsr_project_spark.operators.incremental_dedup import (
        _store_hash_partitions,
    )
    from flink_wsr_project_spark.operators.search_index import (
        absorb_docs_into_index,
        bm25_from_index,
        compact_search_index,
        write_search_index,
    )

    corpus = _corpus(spark)
    half = corpus.where(F.col("doc_id") % 2 == 0)
    rest = corpus.where(F.col("doc_id") % 2 == 1)
    _drop(spark, "sidx_pp")
    write_search_index(spark, half, "sidx_pp", num_buckets=2, hash_partitions=4)
    assert _store_hash_partitions(spark, "sidx_pp_postings") == 4
    _drop(spark, "sidx_pb")
    write_search_index(spark, half, "sidx_pb", num_buckets=2)

    dp = bm25_from_index(spark, "sidx_pp", list(_BM25_QUERY))
    db = bm25_from_index(spark, "sidx_pb", list(_BM25_QUERY))
    assert _ranked(dp) == _ranked(db)
    plan = dp._jdf.queryExecution().executedPlan().toString()
    assert any(
        "sidx_pp_postings" in ln and "PartitionFilters: [pp" in ln
        for ln in plan.splitlines()
    ), "no pp partition filter reached the postings scan"

    absorb_docs_into_index(
        spark, rest, "sidx_pp", num_buckets=2, exclude_existing=True
    )
    got = _ranked(bm25_from_index(spark, "sidx_pp", list(_BM25_QUERY)))
    want = _registered_on(spark, corpus, tmp_path, "pp_full")
    assert got == want

    compact_search_index(spark, "sidx_pp")
    assert _store_hash_partitions(spark, "sidx_pp_postings") == 4
    assert _ranked(bm25_from_index(spark, "sidx_pp", list(_BM25_QUERY))) == want
