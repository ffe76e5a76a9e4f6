"""The composed curation loop (streaming/curation.py) — every persisted
store driven by one foreachBatch chain, with cross-store crash
consistency:

* end-to-end: each gate fires on crafted docs (quality, signature-store
  dup, span coverage, LM tail), every store's contents equal the
  admitted corpus, and the curated docs are immediately searchable;
* decision parity against the batch ``curation_funnel`` /
  ``dedup_keep_list`` on the full sf0.001 corpus;
* the kill-point matrix: for a crash after EVERY step of the chain
  (seven points from r15 — decide, sig, span, lm, search, image, ann),
  recover-all + replay converges every store and the final decisions
  are identical to an uncrashed control run;
* multimodal closure (r15): the image-block store and ANN index track
  the same curated corpus as the text stores, the image store is an
  exact materialization of the consensus query's image arm, and
  curation_health unifies the members' ops reports.
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _drop_tables(spark, prefix):
    for suffix in (
        "longsigs", "hashed",            # signature store
        "posgrams", "docs",              # span store
        "postings", "docstats", "sstats",  # search index
        "blocks",                        # image-block store
        "centroids", "lists",            # ANN index
        "tombstones", "retention",
    ):
        t = f"{prefix}_{suffix}"
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        spark.sql(f"DROP TABLE IF EXISTS {t}__compact")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
        shutil.rmtree(f"spark-warehouse/{t}__compact", ignore_errors=True)


def _corpus(spark):
    from flink_wsr_project_spark.sources.readers import load_table

    return load_table(spark, "documents", SF).select("doc_id", "text")


def _init_stores(spark, prefix, seed_docs, with_search=True, with_media=False):
    from flink_wsr_project_spark.operators.incremental_dedup import (
        write_signature_store,
    )
    from flink_wsr_project_spark.operators.search_index import write_search_index
    from flink_wsr_project_spark.operators.span_store import write_span_store

    _drop_tables(spark, prefix)
    write_signature_store(spark, seed_docs, prefix, num_buckets=2)
    write_span_store(spark, seed_docs, prefix, num_buckets=2)
    if with_search:
        write_search_index(spark, seed_docs, prefix, num_buckets=2)
    if with_media:
        from flink_wsr_project_spark.operators.ann_index import write_ann_index
        from flink_wsr_project_spark.operators.image_dedup import (
            write_dhash_store,
        )
        from flink_wsr_project_spark.operators.multimodal import (
            synthesize_image_renders_from_docs,
        )
        from flink_wsr_project_spark.sources.readers import load_table

        _drop_tables(spark, prefix + "img")
        _drop_tables(spark, prefix + "ann")
        write_dhash_store(
            spark,
            synthesize_image_renders_from_docs(seed_docs),
            prefix + "img",
            num_buckets=2,
        )
        seed_vecs = (
            load_table(spark, "embeddings", SF)
            .join(
                seed_docs.selectExpr("doc_id AS vec_id").distinct(), "vec_id"
            )
            .select("vec_id", "embedding", "label")
        )
        write_ann_index(spark, seed_vecs, prefix + "ann", num_buckets=2)


def _with_vecs(spark, docs):
    """Attach each doc's embedding (the testdata embeddings table is
    1:1 with documents on id); crafted ids outside the table get a
    deterministic synthetic vector so the column is total."""
    from flink_wsr_project_spark.sources.readers import load_table

    emb = load_table(spark, "embeddings", SF).selectExpr(
        "vec_id AS doc_id", "embedding"
    )
    return (
        docs.join(emb, "doc_id", "left")
        .selectExpr(
            "doc_id",
            "text",
            "coalesce(embedding, transform(sequence(1, 64),"
            " i -> CAST((doc_id % 97 + i * 13) % 31 AS FLOAT))) AS embedding",
        )
        .localCheckpoint()
    )


def _tok_prefix(text, n):
    """First n tokens under the pipeline tokenizer ([^a-z0-9]+)."""
    import re

    toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
    return " ".join(toks[:n])


def _store_state(spark, prefix, lm_prefix, probe_docs):
    """Everything the convergence assertions compare: per-store doc
    rosters plus an LM score probe (counts are state, not just ids)."""
    from flink_wsr_project_spark.operators.lm_store import (
        lm_store_exists,
        score_docs_against_lm,
    )
    from flink_wsr_project_spark.operators.search_index import search_stats

    def ids(t, c, table=None):
        # a real stream's foreachBatch appends from a CLONED session;
        # the table-relation cache is per-session (the search index's
        # probe refreshes for the same reason) — metadata-only
        table = table or f"{prefix}_{t}"
        spark.catalog.refreshTable(table)
        return frozenset(
            r[0] for r in spark.table(table).select(c).distinct().collect()
        )
    lm_scores = None
    if lm_store_exists(lm_prefix):
        lm_scores = frozenset(
            (r.doc_id, r.nll_micros, r.ccnet_bucket)
            for r in score_docs_against_lm(
                spark, probe_docs, lm_prefix
            ).collect()
        )
    spark.catalog.refreshTable(f"{prefix}_sstats")
    out = {
        "sig": ids("hashed", "doc_id"),
        "span": ids("docs", "doc_id"),
        "search": ids("docstats", "doc_id"),
        "search_stats": search_stats(spark, prefix),
        "lm": lm_scores,
    }
    if spark.catalog.tableExists(f"{prefix}img_blocks"):
        out["image"] = ids("", "asset_id", table=f"{prefix}img_blocks")
    if spark.catalog.tableExists(f"{prefix}ann_lists"):
        out["ann"] = ids("", "vec_id", table=f"{prefix}ann_lists")
    return out


def _decision_set(decisions_df):
    return frozenset(
        (r.doc_id, r.stage, r.decision, r.dup_of)
        for r in decisions_df.collect()
    )


def _batches(spark, tmp_path):
    """Seed + two batches; batch 2 carries one doc per gate:
    an exact corpus copy, a near-dup, a quality failure, a doc
    span-covered by a seed doc but below minhash similarity, and an
    out-of-vocabulary doc for the LM tail gate."""
    corpus = _corpus(spark)
    seed = corpus.where("doc_id < 40").localCheckpoint()
    b1 = corpus.where("doc_id >= 40 AND doc_id < 100").localCheckpoint()
    rows = {r.doc_id: r.text for r in corpus.where("doc_id IN (5, 7, 9)").collect()}
    span_src = _tok_prefix(rows[9], 20)
    crafted = [
        (100001, rows[5]),                                # exact dup of seed
        (100002, rows[7] + " tail"),                      # near-dup of seed
        (100003, "a b c"),                                # quality fail
        (100004, span_src + " " + " ".join(f"uq{i}word" for i in range(15))),
        (100005, " ".join(f"zq{i}xgib" for i in range(30))),  # LM tail
    ]
    b2 = (
        corpus.where("doc_id >= 100 AND doc_id < 130")
        .unionByName(spark.createDataFrame(crafted, "doc_id long, text string"))
        .localCheckpoint()
    )
    return seed, b1, b2


def _run_chain(spark, tmp_path, tag, fail_after_on_b2=None):
    """Seed all SEVEN store families, run batch 1 clean, run batch 2
    (optionally crashing after the given step), and return the loop
    handles. The batches carry embeddings (the ANN absorb's input);
    the image/ANN stores live under sibling prefixes so their
    tombstone tables stay per-key-type."""
    from flink_wsr_project_spark.streaming.curation import (
        curate_foreach_batch,
        recover_curation_stores,
    )

    prefix = f"cur_{tag}"
    lm_prefix = str(tmp_path / f"lm_{tag}")
    log = str(tmp_path / f"log_{tag}")
    seed, b1, b2 = _batches(spark, tmp_path)
    b1, b2 = _with_vecs(spark, b1), _with_vecs(spark, b2)
    _init_stores(spark, prefix, seed, with_media=True)
    recover_curation_stores(
        spark, log, prefix, prefix, lm_prefix, prefix,
        image_prefix=prefix + "img", ann_prefix=prefix + "ann",
    )

    seen = []

    def mk(fail_after=None):
        return curate_foreach_batch(
            log, prefix, prefix, lm_prefix, prefix,
            num_buckets=2, lm_gate=True,
            on_batch=lambda d, b, rep: seen.append((b, _decision_set(d), rep)),
            fail_after=fail_after,
            image_prefix=prefix + "img", ann_prefix=prefix + "ann",
        )

    mk()(b1, 1)
    if fail_after_on_b2 is None:
        mk()(b2, 2)
        return prefix, lm_prefix, log, b2, seen, mk
    with pytest.raises(RuntimeError, match="chaos"):
        mk(fail_after_on_b2)(b2, 2)
    return prefix, lm_prefix, log, b2, seen, mk


def test_curation_loop_end_to_end(spark, tmp_path):
    from flink_wsr_project_spark.operators.search_index import bm25_from_index

    prefix, lm_prefix, log, b2, seen, _ = _run_chain(spark, tmp_path, "e2e")
    assert [b for b, _, _ in seen] == [1, 2]
    d2 = {doc: (stage, dec) for doc, stage, dec, _ in seen[1][1]}

    # each gate fired on its crafted doc, first-drop-wins attribution
    assert d2[100001] == ("dup", "drop")
    assert d2[100002] == ("dup", "drop")
    assert d2[100003] == ("quality", "drop")
    assert d2[100004] == ("span", "drop")
    assert d2[100005] == ("lm", "drop")
    dup_of = {doc: dup for doc, _, _, dup in seen[1][1]}
    assert dup_of[100001] == 5 and dup_of[100002] == 7

    # every store's contents == seed + all admitted docs (the stores
    # agree with each other: one curated corpus)
    admitted = {d for d, (s, dec) in d2.items() if dec == "keep"}
    b1_admitted = {doc for doc, _, dec, _ in seen[0][1] if dec == "keep"}
    expect = set(range(40)) | b1_admitted | admitted
    st = _store_state(spark, prefix, lm_prefix, b2.where("doc_id = 100005"))
    assert st["sig"] == expect
    assert st["span"] == expect
    assert st["search"] == expect
    assert st["search_stats"][0] == len(expect)
    # r15: the image-block store and the ANN index track the SAME
    # curated corpus — the two families the r14 chain left out
    assert st["image"] == expect
    assert st["ann"] == expect
    # LM roster: bootstrapped from batch-1 admits, grown by batch 2
    roster = {
        r.doc_id for r in spark.read.parquet(lm_prefix + "_lm_docs").collect()
    }
    assert roster == b1_admitted | admitted

    # the curated corpus is immediately searchable: a batch-2 fresh
    # doc's own tokens rank it, and ONLY curated docs ever rank
    probe = next(iter(admitted - {100001, 100002, 100004, 100005}))
    text = {r.doc_id: r.text for r in b2.collect()}[probe]
    import re

    toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t][:3]
    hits = {
        r.doc_id
        for r in bm25_from_index(
            spark, prefix, toks, k=len(expect), require_all=True
        ).collect()
    }
    assert probe in hits and hits <= expect


def test_curation_decision_parity_with_batch_funnel(spark, tmp_path):
    """The loop over the FULL corpus in ascending batches, from empty
    stores, must reproduce the batch funnel's attribution: kept set =
    funnel kept ∪ contaminated (the loop has no benchmark-contamination
    gate — its span gate is the stronger span-level tool, disabled here
    for exactness), dup set = funnel exact_dup ∪ near_dup (doc-level
    against the registered keep-list), quality set = funnel quality."""
    import duckdb

    from flink_wsr_project_spark.plans.pipeline_queries import (
        _curation_funnel_sql,
        _dedup_keep_list_sql,
    )
    from flink_wsr_project_spark.streaming.curation import curate_foreach_batch

    prefix = "cur_par"
    log = str(tmp_path / "log_par")
    corpus = _corpus(spark)
    empty = spark.createDataFrame([], "doc_id long, text string")
    _init_stores(spark, prefix, empty, with_search=False)

    seen = []
    body = curate_foreach_batch(
        log, prefix, prefix, lm_prefix=None, search_prefix=None,
        num_buckets=2,
        span_threshold_permille=1001,  # span gate off: >1000‰ impossible
        on_batch=lambda d, b, rep: seen.append(_decision_set(d)),
    )
    for i, (lo, hi) in enumerate([(0, 170), (170, 340), (340, 10**9)]):
        body(corpus.where(f"doc_id >= {lo} AND doc_id < {hi}"), i)

    by_stage: dict[str, set] = {}
    for dset in seen:
        for doc, stage, dec, _ in dset:
            by_stage.setdefault(stage, set()).add(doc)

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    funnel = {
        (r[0], r[1]): r[2]
        for r in con.sql(_curation_funnel_sql("duckdb")).fetchall()
    }
    fun_stage: dict[str, int] = {}
    for (_, stage), n in funnel.items():
        fun_stage[stage] = fun_stage.get(stage, 0) + n
    kl_drop = {
        r[0]
        for r in con.sql(
            f"SELECT doc_id FROM ({_dedup_keep_list_sql('duckdb')}) WHERE action = 'drop'"
        ).fetchall()
    }

    assert len(by_stage.get("quality", set())) == fun_stage.get("quality", 0)
    assert by_stage.get("dup", set()) == kl_drop  # doc-level dedup parity
    assert len(by_stage["kept"]) == fun_stage.get("kept", 0) + fun_stage.get(
        "contaminated", 0
    )
    assert "span" not in by_stage and "lm" not in by_stage


_CONTROL: dict = {}


def _control(spark, tmp_path):
    """The uncrashed control run, computed once for the whole matrix —
    every compared value (decision tuples, store doc-id rosters, stats,
    LM score micros) is prefix-independent, so one control serves all
    five kill points."""
    if not _CONTROL:
        cp, clm, _, b2, cseen, _ = _run_chain(spark, tmp_path, "okctl")
        probe = b2.where("doc_id = 100005").localCheckpoint()
        _CONTROL["dec"] = cseen[1][1]
        _CONTROL["state"] = _store_state(spark, cp, clm, probe)
    return _CONTROL


@pytest.mark.parametrize(
    "kill", ["decide", "sig", "span", "lm", "search", "image", "ann"]
)
def test_kill_point_matrix(spark, tmp_path, kill):
    """Crash after EVERY step of the chain, then recover-all + replay:
    the final decisions AND every store's contents must equal the
    uncrashed control run — no doc double-admitted, no claim lost."""
    from flink_wsr_project_spark.streaming.curation import (
        recover_curation_stores,
    )

    ctl = _control(spark, tmp_path)

    # crashed run: kill after `kill`, recover, replay
    prefix, lm_prefix, log, b2k, seen, mk = _run_chain(
        spark, tmp_path, f"kp{kill[:2]}", fail_after_on_b2=kill
    )
    recover_curation_stores(
        spark, log, prefix, prefix, lm_prefix, prefix,
        image_prefix=prefix + "img", ann_prefix=prefix + "ann",
    )
    mk()(b2k, 2)  # foreachBatch restart: same batch id, same contents

    assert seen[-1][0] == 2
    assert seen[-1][1] == ctl["dec"]  # decisions identical
    # the WAL committed before every kill point, so the replay always
    # resumes from the logged decisions, never a recompute
    assert seen[-1][2] is True
    probe = b2k.where("doc_id = 100005").localCheckpoint()
    assert _store_state(spark, prefix, lm_prefix, probe) == ctl["state"]


def test_curation_loop_through_real_stream(spark, tmp_path):
    """The chain in its deployment shape: a readStream over a growing
    parquet dir, availableNow restarts sharing one checkpoint, the
    foreachBatch body from curate_foreach_batch. Final decisions and
    store contents must equal the direct-body run over the same
    batches (the matrix tests exercise crash windows; this pins that
    the REAL streaming harness drives the same code path)."""
    from flink_wsr_project_spark.streaming.curation import (
        curate_foreach_batch,
        recover_curation_stores,
    )

    prefix = "cur_stream"
    lm_prefix = str(tmp_path / "lm_stream")
    log = str(tmp_path / "log_stream")
    seed, b1, b2 = _batches(spark, tmp_path)
    b1, b2 = _with_vecs(spark, b1), _with_vecs(spark, b2)
    _init_stores(spark, prefix, seed, with_media=True)
    recover_curation_stores(
        spark, log, prefix, prefix, lm_prefix, prefix,
        image_prefix=prefix + "img", ann_prefix=prefix + "ann",
    )

    seen = []
    body = curate_foreach_batch(
        log, prefix, prefix, lm_prefix, prefix,
        num_buckets=2, lm_gate=True,
        on_batch=lambda d, b, rep: seen.append((b, _decision_set(d))),
        image_prefix=prefix + "img", ann_prefix=prefix + "ann",
    )
    src = tmp_path / "cur_src"
    src.mkdir()

    def run():
        q = (
            spark.readStream.schema(
                "doc_id long, text string, embedding array<float>"
            ).parquet(str(src))
            .writeStream.trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "cur_ckpt"))
            .foreachBatch(body)
            .start()
        )
        q.awaitTermination(180)

    b1.toPandas().to_parquet(src / "b1.parquet", index=False)
    run()
    b2.toPandas().to_parquet(src / "b2.parquet", index=False)
    run()

    assert len(seen) == 2
    d2 = {doc: (stage, dec) for doc, stage, dec, _ in seen[1][1]}
    assert d2[100001] == ("dup", "drop")
    assert d2[100003] == ("quality", "drop")
    assert d2[100004] == ("span", "drop")
    assert d2[100005] == ("lm", "drop")
    ctl = _control(spark, tmp_path)
    # streaming batch ids are 0-based; decisions themselves must match
    # the direct-body control run exactly
    assert seen[1][1] == ctl["dec"]
    probe = b2.where("doc_id = 100005").localCheckpoint()
    assert _store_state(spark, prefix, lm_prefix, probe) == ctl["state"]


def test_curation_image_store_supports_modal_consensus(spark, tmp_path):
    """Decision parity extended to the multimodal consensus (r14
    verdict task 1): after the loop curates the full corpus with the
    image/ANN absorbs on, the image-block STORE is an exact
    materialization of the consensus query's image arm over the
    admitted corpus — the capped near-dup pairs computed from the
    store's persisted (asset_id, dhash) rows equal the pairs computed
    from freshly synthesized renders of the admitted docs, so
    ``modal_dedup_consensus``'s ``idrop`` flags over the curated
    corpus come out identical whether fed inline hashes or the store.
    The ANN index is probe-consistent on the same corpus: an admitted
    doc's own embedding retrieves it at rank 1."""
    from flink_wsr_project_spark.operators.ann_index import ann_topk_from_index
    from flink_wsr_project_spark.operators.image_dedup import EXTRACTOR_PROP
    from flink_wsr_project_spark.operators.multimodal import (
        extract_image_dhash,
        synthesize_image_renders_from_docs,
    )
    from flink_wsr_project_spark.plans.pipeline_queries import (
        _IMG_BUCKET_CAP,
        _img_capped_body,
    )
    from flink_wsr_project_spark.streaming.curation import curate_foreach_batch

    from flink_wsr_project_spark.operators.ann_index import write_ann_index
    from flink_wsr_project_spark.operators.image_dedup import write_dhash_store
    from flink_wsr_project_spark.sources.readers import load_table

    prefix = "cur_mc"
    log = str(tmp_path / "log_mc")
    corpus = _corpus(spark)
    empty = spark.createDataFrame([], "doc_id long, text string")
    _init_stores(spark, prefix, empty, with_search=False)
    _drop_tables(spark, prefix + "img")
    _drop_tables(spark, prefix + "ann")
    # image store starts EMPTY (so its final roster is exactly the
    # admitted corpus); the ANN index needs >= 1 centroid to assign
    # absorbs against, so it is seeded with two corpus vectors — both
    # ids re-enter through batch 0 and the absorb's roster anti-join
    # keeps them single-copy
    write_dhash_store(
        spark,
        synthesize_image_renders_from_docs(empty),
        prefix + "img",
        num_buckets=2,
    )
    write_ann_index(
        spark,
        load_table(spark, "embeddings", SF)
        .where("vec_id < 2")
        .select("vec_id", "embedding", "label"),
        prefix + "ann",
        num_buckets=2,
    )

    kept: set = set()
    body = curate_foreach_batch(
        log, prefix, prefix, lm_prefix=None, search_prefix=None,
        num_buckets=2,
        span_threshold_permille=1001,  # text-gate shape of the funnel test
        on_batch=lambda d, b, rep: kept.update(
            doc for doc, _, dec, _ in _decision_set(d) if dec == "keep"
        ),
        image_prefix=prefix + "img", ann_prefix=prefix + "ann",
    )
    for i, (lo, hi) in enumerate([(0, 170), (170, 340), (340, 10**9)]):
        body(_with_vecs(spark, corpus.where(f"doc_id >= {lo} AND doc_id < {hi}")), i)

    # the store's identity survived the loop's appends
    props = {
        r.key: r.value
        for r in spark.sql(f"SHOW TBLPROPERTIES {prefix}img_blocks").collect()
    }
    assert props[EXTRACTOR_PROP] == "extract_image_dhash"

    # image arm: store hashes vs inline hashes of the SAME corpus
    spark.catalog.refreshTable(f"{prefix}img_blocks")
    spark.table(f"{prefix}img_blocks").select(
        F.col("asset_id").alias("doc_id"), "dhash"
    ).distinct().createOrReplaceTempView("_mcp_store_h")
    admitted = corpus.where(
        F.col("doc_id").isin([int(d) for d in kept])
    ).localCheckpoint()
    extract_image_dhash(synthesize_image_renders_from_docs(admitted)).select(
        F.col("asset_id").alias("doc_id"), "dhash"
    ).createOrReplaceTempView("_mcp_inline_h")

    def pairs(view):
        return {
            (r.doc_a, r.doc_b, r.hamming)
            for r in spark.sql(
                f"WITH hsrc AS (SELECT doc_id, dhash FROM {view}),\n"
                + _img_capped_body("spark", "hsrc", cap=_IMG_BUCKET_CAP)
            ).collect()
        }

    store_pairs = pairs("_mcp_store_h")
    assert store_pairs == pairs("_mcp_inline_h")
    assert store_pairs  # non-vacuous: the corpus has image near-dups

    # ANN arm: an admitted doc's own vector (probed under a fresh
    # query id — self-matches are excluded by id) retrieves the
    # absorbed doc at rank 1 with cosine 1 (spot-check a handful)
    some = sorted(kept)[:3]
    probes = _with_vecs(
        spark, admitted.where(F.col("doc_id").isin(some))
    ).selectExpr("doc_id + 1000000 AS query_id", "embedding AS qv")
    top1 = {
        (r.query_id - 1000000, r.neighbor_id)
        for r in ann_topk_from_index(spark, probes, prefix + "ann", k=1).collect()
    }
    assert top1 == {(d, d) for d in some}


def test_curation_health_report(spark, tmp_path):
    """The composition's ops surface (r14 verdict task 7): one
    metadata-only report unifying every member store's health plus the
    decision log's depth — committed batch count, last committed id,
    pending __tmp dirs."""
    import os

    from flink_wsr_project_spark.streaming.curation import curation_health

    prefix, lm_prefix, log, _, _, _ = _run_chain(spark, tmp_path, "hlth")
    report = curation_health(
        spark, log, prefix, prefix, lm_prefix, prefix,
        image_prefix=prefix + "img", ann_prefix=prefix + "ann",
    )
    assert set(report) == {
        "sig", "span", "lm", "search", "image", "ann", "decision_log",
    }
    dl = report["decision_log"]
    assert dl == {
        "committed_batches": 2,
        "last_committed_batch": 2,
        "committed_takedowns": 0,
        "pending_tmp_dirs": 0,
    }
    # member reports carry their identity/layout contracts
    img_tables = {t["table"]: t for t in report["image"]["tables"]}
    assert "spark_graft.hash_format" in img_tables[
        f"{prefix}img_blocks"
    ]["properties"]
    span_tables = {t["table"]: t for t in report["span"]["tables"]}
    assert "spark_graft.span_hash_format" in span_tables[
        f"{prefix}_posgrams"
    ]["properties"]
    assert report["lm"]["pending_recovery"] is False
    # a half-written log dir surfaces as pending
    os.makedirs(os.path.join(log, "batch=9__tmp"))
    assert curation_health(spark, log, prefix, prefix)["decision_log"][
        "pending_tmp_dirs"
    ] == 1


def _takedown_state(spark, prefix, lm_prefix):
    """What the takedown convergence assertions compare: LIVE id sets
    (tombstone-masked — deletes are logical until compaction), the
    search stats row, the LM roster, and an LM score probe."""
    from flink_wsr_project_spark.operators.lm_store import (
        lm_store_exists,
        score_docs_against_lm,
    )
    from flink_wsr_project_spark.operators.retention import live_rows
    from flink_wsr_project_spark.operators.search_index import search_stats

    def live(table, col, tp):
        spark.catalog.refreshTable(table)
        return frozenset(
            r[0]
            for r in live_rows(spark, spark.table(table), tp, col)
            .select(col)
            .distinct()
            .collect()
        )

    spark.catalog.refreshTable(f"{prefix}_sstats")
    probe = spark.createDataFrame(
        [(424242, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    lm_scores = None
    if lm_store_exists(lm_prefix):
        lm_scores = frozenset(
            (r.doc_id, r.nll_micros, r.ccnet_bucket)
            for r in score_docs_against_lm(spark, probe, lm_prefix).collect()
        )
        lm_roster = frozenset(
            r.doc_id
            for r in spark.read.parquet(lm_prefix + "_lm_docs").collect()
        )
    else:
        lm_roster = frozenset()
    out = {
        "sig": live(f"{prefix}_hashed", "doc_id", prefix),
        "span": live(f"{prefix}_docs", "doc_id", prefix),
        "search": live(f"{prefix}_docstats", "doc_id", prefix),
        "search_stats": search_stats(spark, prefix),
        "lm_roster": lm_roster,
    }
    # media stores only when the loop shape configured them (the
    # interleaved-takedown test runs the text-only shape)
    if spark.catalog.tableExists(f"{prefix}img_blocks"):
        out["image"] = live(f"{prefix}img_blocks", "asset_id", prefix + "img")
    if spark.catalog.tableExists(f"{prefix}ann_lists"):
        out["ann"] = live(f"{prefix}ann_lists", "vec_id", prefix + "ann")
    return {
        **out,
        "lm_scores": lm_scores,
    }


_TD_CONTROL: dict = {}


def _run_takedown(spark, tmp_path, tag, fail_after=None):
    """Populate all seven stores via the admit chain, then take down
    three admitted docs (two seed-era, one batch-2) through the
    composed verb."""
    from flink_wsr_project_spark.streaming.curation import curate_takedown

    prefix, lm_prefix, log, b2, seen, _ = _run_chain(spark, tmp_path, tag)
    # two LM-roster docs (loop-admitted, so EVERY store holds them —
    # the LM only ever holds loop admits, never the seed) plus seed
    # doc 5 (absent from the LM roster — exercises the inverse
    # merge's roster-miss path)
    roster = sorted(
        r.doc_id for r in spark.read.parquet(lm_prefix + "_lm_docs").collect()
    )[:2]
    victims = _corpus(spark).where(
        f"doc_id IN (5, {roster[0]}, {roster[1]})"
    )
    kw = dict(
        lm_prefix=lm_prefix, search_prefix=prefix,
        image_prefix=prefix + "img", ann_prefix=prefix + "ann",
    )
    if fail_after is None:
        out = curate_takedown(
            spark, victims, 1, log, prefix, prefix, **kw
        )
        return prefix, lm_prefix, log, victims, out
    with pytest.raises(RuntimeError, match="chaos"):
        curate_takedown(
            spark, victims, 1, log, prefix, prefix, fail_after=fail_after, **kw
        )
    return prefix, lm_prefix, log, victims, None


def _td_control(spark, tmp_path):
    if not _TD_CONTROL:
        prefix, lm_prefix, _, victims, out = _run_takedown(spark, tmp_path, "tdctl")
        _TD_CONTROL["state"] = _takedown_state(spark, prefix, lm_prefix)
        _TD_CONTROL["out"] = out
        _TD_CONTROL["victims"] = frozenset(
            r.doc_id for r in victims.select("doc_id").collect()
        )
    return _TD_CONTROL


def test_takedown_removes_from_every_store(spark, tmp_path):
    """The composed takedown's base contract: the victims leave every
    store family's LIVE view at once (dedup claims, span claims, BM25
    ranking + scoring stats, image blocks, ANN lists, LM counts), and
    re-running the same takedown id is a no-op on every member."""
    from flink_wsr_project_spark.streaming.curation import curate_takedown

    ctl = _td_control(spark, tmp_path)
    victims = ctl["victims"]
    st = ctl["state"]
    for store in ("sig", "span", "search", "image", "ann"):
        assert st[store] & victims == frozenset(), store
        assert st[store], store  # survivors remain
    assert st["lm_roster"] & victims == frozenset()
    # all three tombstoned everywhere; only the two roster docs
    # inverse-merge out of the LM (doc 5 is a roster miss, a no-op)
    assert ctl["out"]["sig"] == 3 and ctl["out"]["lm"] == 2


def test_takedown_search_stats_match_recompute(spark, tmp_path):
    """The incremental stats debit equals a from-scratch recompute
    over the live docstats (the drift healer's answer)."""
    from flink_wsr_project_spark.operators.search_index import (
        recompute_search_stats,
        search_stats,
    )

    ctl = _td_control(spark, tmp_path)
    prefix = "cur_tdctl"
    before = search_stats(spark, prefix)
    assert before == recompute_search_stats(spark, prefix)


@pytest.mark.parametrize(
    "kill", ["log", "search", "sig", "span", "lm", "image", "ann"]
)
def test_takedown_kill_matrix(spark, tmp_path, kill):
    """Crash after EVERY step of the composed takedown, then
    recover-all + replay of the same takedown id: every store's live
    state (and the LM's exact inverse-merged counts, via the score
    probe) must equal the uncrashed control."""
    from flink_wsr_project_spark.streaming.curation import (
        curate_takedown,
        recover_curation_stores,
    )

    ctl = _td_control(spark, tmp_path)
    prefix, lm_prefix, log, victims, _ = _run_takedown(
        spark, tmp_path, f"td{kill[:2]}", fail_after=kill
    )
    recover_curation_stores(
        spark, log, prefix, prefix, lm_prefix, prefix,
        image_prefix=prefix + "img", ann_prefix=prefix + "ann",
    )
    out = curate_takedown(
        spark, victims, 1, log, prefix, prefix,
        lm_prefix=lm_prefix, search_prefix=prefix,
        image_prefix=prefix + "img", ann_prefix=prefix + "ann",
    )
    got = _takedown_state(spark, prefix, lm_prefix)
    assert got == ctl["state"]
    assert out["sig"] == 3  # tombstone append is distinct-projected


def test_ann_cold_start_bootstrap_in_loop(spark, tmp_path):
    """r16 (verdict #4): a loop configured with ``ann_prefix`` but NO
    pre-fitted index bootstraps the index from batch 1's admitted
    vectors (deterministic seed labels → Lloyd fixed point) and
    absorbs from batch 2 on — the from-zero deployment has no manual
    step left. Pins: (a) batch 1 fits (index exists, contents = b1
    admitted, fresh_centroid_mismatch == 0 — a bootstrapped index is
    indistinguishable from an externally trained one); (b) batch 2
    absorbs without refitting (centroids unchanged); (c) the
    bootstrap crash windows heal — chaos AFTER the fit replays into
    the absorb no-op path, and a half-written pair (lists dropped)
    re-fits on replay — both converging to the uncrashed control;
    (d) a probe equal to an absorbed vector returns itself top-1."""
    import shutil

    from flink_wsr_project_spark.operators.ann_index import (
        ann_index_exists,
        ann_topk_from_index,
        measure_index_drift,
    )
    from flink_wsr_project_spark.streaming.curation import (
        curate_foreach_batch,
    )

    seedless_tags = ["annboot", "annbootctl", "annbootcrash"]
    runs = {}
    for tag in seedless_tags:
        prefix = f"cur_{tag}"
        lm_prefix = str(tmp_path / f"lm_{tag}")
        log = str(tmp_path / f"log_{tag}")
        seed, b1, b2 = _batches(spark, tmp_path)
        b1, b2 = _with_vecs(spark, b1), _with_vecs(spark, b2)
        _init_stores(spark, prefix, seed)  # text stores only — NO ann
        _drop_tables(spark, prefix + "ann")
        assert not ann_index_exists(spark, prefix + "ann")

        def mk(fail_after=None, prefix=prefix, log=log, lm_prefix=lm_prefix):
            return curate_foreach_batch(
                log, prefix, prefix, lm_prefix, prefix,
                num_buckets=2, fail_after=fail_after,
                ann_prefix=prefix + "ann", ann_bootstrap_k=4,
            )

        if tag == "annbootcrash":
            # chaos fires AFTER the bootstrap fit completed
            with pytest.raises(RuntimeError, match="chaos"):
                mk("ann")(b1, 1)
            assert ann_index_exists(spark, prefix + "ann")
            mk()(b1, 1)  # replay: index exists -> absorb no-op path
        else:
            mk()(b1, 1)
            if tag == "annboot":
                # half-written pair: lists lost inside the fit window —
                # exists() reports absent, replay re-fits the same
                spark.sql(f"DROP TABLE {prefix}ann_lists")
                shutil.rmtree(f"spark-warehouse/{prefix}ann_lists", ignore_errors=True)
                assert not ann_index_exists(spark, prefix + "ann")
                mk()(b1, 1)

        drift1 = measure_index_drift(spark, prefix + "ann")
        cent1 = sorted(
            (r.label, tuple(round(x, 9) for x in r.cv))
            for r in spark.table(f"{prefix}ann_centroids").collect()
        )
        mk()(b2, 2)
        cent2 = sorted(
            (r.label, tuple(round(x, 9) for x in r.cv))
            for r in spark.table(f"{prefix}ann_centroids").collect()
        )
        runs[tag] = {
            "drift1": drift1,
            "cent1": cent1,
            "cent2": cent2,
            "lists": sorted(
                r.vec_id for r in spark.table(f"{prefix}ann_lists").collect()
            ),
        }

    ctl = runs["annbootctl"]
    # (a) fresh bootstrap is Lloyd-consistent
    assert ctl["drift1"]["fresh_centroid_mismatch"] == 0.0
    assert 1 <= ctl["drift1"]["n_lists"] <= 4
    # (b) batch 2 absorbed without refit
    assert ctl["cent1"] == ctl["cent2"]
    # (c) both crash paths converge to the control, row-exact
    for tag in ("annboot", "annbootcrash"):
        assert runs[tag]["lists"] == ctl["lists"], tag
        assert runs[tag]["cent2"] == ctl["cent2"], tag
    # (d) an absorbed vector probes back to itself (rank-1, cosine ~1)
    some_id = ctl["lists"][0]
    probe = spark.table("cur_annbootctl" + "ann_lists").where(
        F.col("vec_id") == some_id
    ).selectExpr("vec_id AS query_id", "embedding AS qv")
    # self-matches are excluded, so probe under a DIFFERENT id
    probe = probe.selectExpr("query_id + 1000000 AS query_id", "qv")
    top = ann_topk_from_index(spark, probe, "cur_annbootctl" + "ann", k=1).first()
    assert top.neighbor_id == some_id and top.cosine > 0.999999


def test_takedown_between_live_batches_matches_never_present_control(spark, tmp_path):
    """r16 (verdict #5): a takedown interleaved BETWEEN batches of a
    live loop must leave the loop indistinguishable from a control
    whose corpus NEVER contained the victims — provable because every
    member delete is an exact logical removal (tombstone masks for
    sig/span/search, the LM's exact inverse merge, the stats debit).
    The WAL gives the ordering: batch 1 commits, the takedown pins its
    victim set, batch 2 decides against the post-takedown stores.

    Victims are the seed claimers of batch 2's crafted dups (docs 5,
    7, 9) — so the assertion has teeth: in BOTH runs the crafted
    exact-dup/near-dup/span docs flip to 'keep' (their claimers are
    gone), and the full batch-2 decision sets and live store states
    match row-exact. This also documents the concurrency contract on
    TAKEDOWN_KILL_POINTS: takedowns run BETWEEN batch commits (the
    decision-log WAL serializes them), never concurrently with an
    in-flight batch's apply phase."""
    from flink_wsr_project_spark.streaming.curation import (
        curate_foreach_batch,
        curate_takedown,
    )

    victims = (5, 7, 9)
    corpus = _corpus(spark)
    victim_docs = corpus.where(F.col("doc_id").isin(*victims)).localCheckpoint()
    results = {}
    for tag, interleave in (("tdl", True), ("tdlctl", False)):
        prefix = f"cur_{tag}"
        lm_prefix = str(tmp_path / f"lm_{tag}")
        log = str(tmp_path / f"log_{tag}")
        seed, b1, b2 = _batches(spark, tmp_path)
        if not interleave:
            seed = seed.join(
                victim_docs.select("doc_id"), "doc_id", "left_anti"
            ).localCheckpoint()
        _init_stores(spark, prefix, seed)
        seen = []
        # lm_gate OFF: the LM fits on only ~60 batch-1 docs here, and
        # a gate that aggressive would re-drop the released dups at the
        # lm stage, hiding the takedown's effect; the LM still fits,
        # absorbs, and inverse-merges record-only, and its state is
        # compared below
        body = curate_foreach_batch(
            log, prefix, prefix, lm_prefix, prefix,
            num_buckets=2, lm_gate=False,
            on_batch=lambda d, b, rep: seen.append((b, _decision_set(d))),
        )
        body(b1, 1)
        if interleave:
            curate_takedown(
                spark, victim_docs, "t1", log, prefix, prefix,
                lm_prefix=lm_prefix, search_prefix=prefix,
            )
        body(b2, 2)
        results[tag] = {
            "b1": seen[0][1],
            "b2": seen[1][1],
            "state": _takedown_state(spark, prefix, lm_prefix),
        }

    live, ctl = results["tdl"], results["tdlctl"]
    # premise: batch 1 is unaffected by the victims in this corpus
    assert live["b1"] == ctl["b1"]
    # the headline: post-takedown batch-2 decisions == never-present
    assert live["b2"] == ctl["b2"]
    d2 = {doc: (stage, dec) for doc, stage, dec, _ in live["b2"]}
    # the released claims have real effect: the crafted dups now keep
    assert d2[100001][1] == "keep"
    assert d2[100002][1] == "keep"
    assert d2[100004][1] == "keep"
    # live store state converges too (tombstone-masked vs never-there);
    # image/ann are not configured in this loop shape
    for k in ("sig", "span", "search", "search_stats", "lm_roster", "lm_scores"):
        if k in live["state"] or k in ctl["state"]:
            assert live["state"].get(k) == ctl["state"].get(k), k
