"""The composed curation loop (streaming/curation.py) — every persisted
store driven by one foreachBatch chain, with cross-store crash
consistency:

* end-to-end: each gate fires on crafted docs (quality, signature-store
  dup, span coverage, LM tail), every store's contents equal the
  admitted corpus, and the curated docs are immediately searchable;
* decision parity against the batch ``curation_funnel`` /
  ``dedup_keep_list`` on the full sf0.001 corpus;
* the kill-point matrix: for a crash after EVERY step of the chain,
  recover-all + replay converges every store and the final decisions
  are identical to an uncrashed control run.
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


def _init_stores(spark, prefix, seed_docs, with_search=True):
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

    def ids(t, c):
        # a real stream's foreachBatch appends from a CLONED session;
        # the table-relation cache is per-session (the search index's
        # probe refreshes for the same reason) — metadata-only
        spark.catalog.refreshTable(f"{prefix}_{t}")
        return frozenset(
            r[0] for r in spark.table(f"{prefix}_{t}").select(c).distinct().collect()
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
    return {
        "sig": ids("hashed", "doc_id"),
        "span": ids("docs", "doc_id"),
        "search": ids("docstats", "doc_id"),
        "search_stats": search_stats(spark, prefix),
        "lm": lm_scores,
    }


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
    """Seed stores, run batch 1 clean, run batch 2 (optionally crashing
    after the given step), and return the loop handles."""
    from flink_wsr_project_spark.streaming.curation import (
        curate_foreach_batch,
        recover_curation_stores,
    )

    prefix = f"cur_{tag}"
    lm_prefix = str(tmp_path / f"lm_{tag}")
    log = str(tmp_path / f"log_{tag}")
    seed, b1, b2 = _batches(spark, tmp_path)
    _init_stores(spark, prefix, seed)
    recover_curation_stores(spark, log, prefix, prefix, lm_prefix, prefix)

    seen = []

    def mk(fail_after=None):
        return curate_foreach_batch(
            log, prefix, prefix, lm_prefix, prefix,
            num_buckets=2, lm_gate=True,
            on_batch=lambda d, b, rep: seen.append((b, _decision_set(d), rep)),
            fail_after=fail_after,
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


@pytest.mark.parametrize("kill", ["decide", "sig", "span", "lm", "search"])
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
    recover_curation_stores(spark, log, prefix, prefix, lm_prefix, prefix)
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
    _init_stores(spark, prefix, seed)
    recover_curation_stores(spark, log, prefix, prefix, lm_prefix, prefix)

    seen = []
    body = curate_foreach_batch(
        log, prefix, prefix, lm_prefix, prefix,
        num_buckets=2, lm_gate=True,
        on_batch=lambda d, b, rep: seen.append((b, _decision_set(d))),
    )
    src = tmp_path / "cur_src"
    src.mkdir()

    def run():
        q = (
            spark.readStream.schema("doc_id long, text string").parquet(str(src))
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
