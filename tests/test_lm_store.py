"""Persisted bigram LM (operators/lm_store.py) — the quality family's
store-backed member on the mergeable-aggregate machinery: fit+score
reproduces the registered doc_lm_perplexity bit-for-bit, absorb merges
count deltas (replay-idempotent via the roster), takedown subtracts by
INVERSE merge (counts form a group), and out-of-corpus text floors
into the tail bucket."""

from __future__ import annotations

from pyspark.sql import functions as F


def _corpus(spark, sf_dir="/root/testdata/sf0.001"):
    from flink_wsr_project_spark.sources.readers import load_table

    return load_table(spark, "documents", sf_dir).select("doc_id", "text")


def _prefix(tmp_path, name):
    """LM-state prefixes are PATHS (dir-swapped states, not catalog
    tables) — keep them under the test tmp dir, never the repo root."""
    return str(tmp_path / name)


def _registered(spark, docs_df, tmp_path, name):
    import pandas as pd

    from flink_wsr_project_spark.plans.registry import get

    pdf = docs_df.toPandas()
    pdf["lang"], pdf["source"], pdf["n_chars"] = "en", "web", pdf.text.str.len()
    d = tmp_path / name
    d.mkdir()
    pdf.to_parquet(d / "documents.parquet", index=False)
    return {
        r.doc_id: (r.n_bigrams, r.nll_micros, r.avg_nll_micros, r.ccnet_bucket)
        for r in get("doc_lm_perplexity").spark_fn(spark, str(d)).collect()
    }


def _scores(df):
    return {
        r.doc_id: (r.n_bigrams, r.nll_micros, r.avg_nll_micros, r.ccnet_bucket)
        for r in df.collect()
    }


def test_fit_score_matches_registered_query(spark, tmp_path):
    from flink_wsr_project_spark.operators.lm_store import (
        fit_lm_store,
        score_docs_against_lm,
    )

    lmst = _prefix(tmp_path, "lmst")
    corpus = _corpus(spark)
    fit_lm_store(spark, corpus, lmst)
    got = _scores(score_docs_against_lm(spark, corpus, lmst))
    want = _registered(spark, corpus, tmp_path, "full")
    assert got == want


def test_absorb_merges_and_replay_is_noop(spark, tmp_path):
    from flink_wsr_project_spark.operators.lm_store import (
        absorb_docs_into_lm,
        fit_lm_store,
        score_docs_against_lm,
    )

    lmst_ab = _prefix(tmp_path, "lmst_ab")
    corpus = _corpus(spark)
    half = corpus.where(F.col("doc_id") % 2 == 0)
    rest = corpus.where(F.col("doc_id") % 2 == 1)
    fit_lm_store(spark, half, lmst_ab)
    assert absorb_docs_into_lm(spark, rest, lmst_ab) == rest.count()
    got = _scores(score_docs_against_lm(spark, corpus, lmst_ab))
    want = _registered(spark, corpus, tmp_path, "full_ab")
    assert got == want
    # replay merges nothing — scores stay bit-identical
    assert absorb_docs_into_lm(spark, rest, lmst_ab) == 0
    assert _scores(score_docs_against_lm(spark, corpus, lmst_ab)) == want


def test_takedown_is_exact_inverse_merge(spark, tmp_path):
    """Removing docs must leave counts IDENTICAL to a model never
    fitted on them — scored output equals the registered query over
    the surviving corpus (idf-analogue shifts included), and a
    replayed removal subtracts nothing."""
    from flink_wsr_project_spark.operators.lm_store import (
        fit_lm_store,
        remove_docs_from_lm,
        score_docs_against_lm,
    )

    lmst_del = _prefix(tmp_path, "lmst_del")
    corpus = _corpus(spark)
    victims = corpus.where(F.col("doc_id") < 5).localCheckpoint()
    fit_lm_store(spark, corpus, lmst_del)
    assert remove_docs_from_lm(spark, victims, lmst_del) == victims.count()
    survivors = corpus.where(F.col("doc_id") >= 5)
    got = _scores(score_docs_against_lm(spark, survivors, lmst_del))
    want = _registered(spark, survivors, tmp_path, "survivors")
    assert got == want
    # replayed removal: roster no longer holds them — nothing subtracts
    assert remove_docs_from_lm(spark, victims, lmst_del) == 0
    assert _scores(score_docs_against_lm(spark, survivors, lmst_del)) == want


def test_duplicate_input_rows_merge_once(spark, tmp_path):
    """Duplicate doc_id rows inside ONE absorb/remove input must count
    once — without the input dedup, an absorb double-merges the doc's
    counts (and writes duplicate roster rows that make every later
    removal subtract twice), and a remove subtracts twice, corrupting
    unigram/bigram counts shared with surviving documents."""
    from flink_wsr_project_spark.operators.lm_store import (
        absorb_docs_into_lm,
        fit_lm_store,
        remove_docs_from_lm,
        score_docs_against_lm,
    )

    lmst_dup = _prefix(tmp_path, "lmst_dup")
    corpus = _corpus(spark)
    half = corpus.where(F.col("doc_id") % 2 == 0)
    rest = corpus.where(F.col("doc_id") % 2 == 1)
    fit_lm_store(spark, half, lmst_dup)
    doubled = rest.unionAll(rest)
    assert absorb_docs_into_lm(spark, doubled, lmst_dup) == rest.count()
    want_full = _registered(spark, corpus, tmp_path, "dup_full")
    assert _scores(score_docs_against_lm(spark, corpus, lmst_dup)) == want_full
    # duplicated removal input subtracts each victim exactly once
    victims = corpus.where(F.col("doc_id") < 5).localCheckpoint()
    assert (
        remove_docs_from_lm(spark, victims.unionAll(victims), lmst_dup)
        == victims.count()
    )
    survivors = corpus.where(F.col("doc_id") >= 5)
    got = _scores(score_docs_against_lm(spark, survivors, lmst_dup))
    assert got == _registered(spark, survivors, tmp_path, "dup_survivors")


def test_out_of_corpus_text_floors_into_tail(spark, tmp_path):
    from flink_wsr_project_spark.operators.lm_store import (
        fit_lm_store,
        score_docs_against_lm,
    )

    lmst_ood = _prefix(tmp_path, "lmst_ood")
    fit_lm_store(spark, _corpus(spark), lmst_ood)
    alien = spark.createDataFrame(
        [(9001, " ".join(f"zq{i}x" for i in range(30)))], "doc_id long, text string"
    )
    row = score_docs_against_lm(spark, alien, lmst_ood).collect()[0]
    assert row.ccnet_bucket == "tail"
    # every bigram at the unseen floor: -ln(1/V) exactly, V = vocab
    from flink_wsr_project_spark.operators.lm_store import lm_vocab_size
    import math

    v = lm_vocab_size(spark, lmst_ood)
    assert row.avg_nll_micros == round(-math.log(1.0 / v) * 1_000_000)


def test_streaming_lm_ingest_loop(spark, tmp_path):
    """The continuous-fitting loop end-to-end through a real stream
    (availableNow restarts over a growing parquet dir): the first
    micro-batch bootstraps the fit, the second absorbs, a replayed
    batch merges nothing, and the final scores equal the registered
    query fitted on everything ingested."""
    from flink_wsr_project_spark.operators.lm_store import (
        recover_lm_store,
        score_docs_against_lm,
    )
    from flink_wsr_project_spark.streaming.lm import lm_ingest_foreach_batch

    lmst = _prefix(tmp_path, "lmst_loop")
    recover_lm_store(spark, lmst)  # startup verb is a no-op on a fresh store
    corpus = _corpus(spark)
    pdf = corpus.toPandas()
    src = tmp_path / "lm_src"
    src.mkdir()
    absorbed = []

    def run():
        q = (
            spark.readStream.schema("doc_id long, text string").parquet(str(src))
            .writeStream.trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "lm_ckpt"))
            .foreachBatch(
                lm_ingest_foreach_batch(lmst, on_batch=lambda n, b: absorbed.append(n))
            )
            .start()
        )
        q.awaitTermination(120)

    mid = len(pdf) // 2
    pdf.iloc[:mid][["doc_id", "text"]].to_parquet(src / "b1.parquet", index=False)
    run()
    pdf.iloc[mid:][["doc_id", "text"]].to_parquet(src / "b2.parquet", index=False)
    run()
    assert sum(absorbed) == len(pdf)
    got = _scores(score_docs_against_lm(spark, corpus, lmst))
    assert got == _registered(spark, corpus, tmp_path, "loop_full")


def test_lm_loop_takedown_mid_stream(spark, tmp_path):
    """Takedown in the deployment shape: an inverse merge lands
    BETWEEN micro-batches of the live fitting loop. The next batch
    absorbs against the subtracted counts, and the final model is
    bit-identical to one never fitted on the victims — the group
    property holding under a live loop."""
    from flink_wsr_project_spark.operators.lm_store import (
        remove_docs_from_lm,
        score_docs_against_lm,
    )
    from flink_wsr_project_spark.streaming.lm import lm_ingest_foreach_batch

    lmst = _prefix(tmp_path, "lmst_mid")
    corpus = _corpus(spark)
    b1 = corpus.where(F.col("doc_id") < 200)
    b2 = corpus.where(F.col("doc_id") >= 200)
    victims = corpus.where(F.col("doc_id") < 5).localCheckpoint()

    body = lm_ingest_foreach_batch(lmst)
    body(b1, 0)  # bootstrap fit
    # takedown lands between micro-batches, against the live loop's states
    assert remove_docs_from_lm(spark, victims, lmst) == victims.count()
    body(b2, 1)

    survivors = corpus.where(F.col("doc_id") >= 5)
    got = _scores(score_docs_against_lm(spark, survivors, lmst))
    assert got == _registered(spark, survivors, tmp_path, "mid_survivors")
    # the removed doc may re-enter later — the roster released it
    body(victims, 2)
    got = _scores(score_docs_against_lm(spark, corpus, lmst))
    assert got == _registered(spark, corpus, tmp_path, "mid_readmit")


def test_crash_between_state_merges_replays_exactly_once(spark, tmp_path):
    """The r13 design accepted a double merge when a crash landed
    between the unigram/bigram/vocab merges ("heal by refitting");
    the op-token markers close it. Simulate the torn write — apply
    ONLY the unigram merge with the op's token, exactly the on-disk
    state a crash after the first merge leaves — then replay the full
    absorb: uni must skip, bi/vocab must apply, and the final scores
    equal an uncrashed fit."""
    from flink_wsr_project_spark.operators.incremental import (
        applied_op,
        update_aggregate_table,
    )
    from flink_wsr_project_spark.operators.lm_store import (
        _bigrams,
        _op_token,
        _paths,
        absorb_docs_into_lm,
        fit_lm_store,
        score_docs_against_lm,
    )

    lmst = _prefix(tmp_path, "lmst_torn")
    corpus = _corpus(spark)
    half = corpus.where(F.col("doc_id") % 2 == 0)
    rest = corpus.where(F.col("doc_id") % 2 == 1).localCheckpoint()
    fit_lm_store(spark, half, lmst)

    # torn write: the absorb's uni merge landed, bi/vocab/roster did not
    tok = _op_token(rest, 1)
    update_aggregate_table(
        spark, _paths(lmst)["uni"], _bigrams(rest), ["w1"],
        {"c1": F.count(F.lit(1)).cast("long")}, {"c1": "sum"}, op_token=tok,
    )
    assert applied_op(_paths(lmst)["uni"]) == tok
    assert applied_op(_paths(lmst)["bi"]) != tok

    # replay converges every state exactly once
    assert absorb_docs_into_lm(spark, rest, lmst) == rest.count()
    got = _scores(score_docs_against_lm(spark, corpus, lmst))
    assert got == _registered(spark, corpus, tmp_path, "torn_full")
    assert applied_op(_paths(lmst)["bi"]) == tok


def test_recover_lm_store_finishes_interrupted_swap(spark, tmp_path):
    """Crash BETWEEN atomic_swap_dir's two renames: the live state dir
    is gone, only its __old copy remains (plus the new tmp). Recovery
    rolls back; the interrupted op then replays exactly-once via the
    markers — final scores equal an uncrashed run."""
    import os
    import shutil

    from flink_wsr_project_spark.operators.lm_store import (
        _paths,
        absorb_docs_into_lm,
        fit_lm_store,
        lm_store_exists,
        recover_lm_store,
        score_docs_against_lm,
    )

    lmst = _prefix(tmp_path, "lmst_rec")
    corpus = _corpus(spark)
    half = corpus.where(F.col("doc_id") % 2 == 0)
    rest = corpus.where(F.col("doc_id") % 2 == 1).localCheckpoint()
    fit_lm_store(spark, half, lmst)

    # simulate the mid-swap crash on the bigram state
    bi = _paths(lmst)["bi"]
    os.rename(bi, bi + "__old_deadbeef")
    shutil.copytree(bi + "__old_deadbeef", bi + "__merge_deadbeef")
    assert not lm_store_exists(lmst)
    assert recover_lm_store(spark, lmst)
    assert lm_store_exists(lmst)
    assert not os.path.exists(bi + "__merge_deadbeef")
    assert not recover_lm_store(spark, lmst)  # idempotent

    assert absorb_docs_into_lm(spark, rest, lmst) == rest.count()
    got = _scores(score_docs_against_lm(spark, corpus, lmst))
    assert got == _registered(spark, corpus, tmp_path, "rec_full")


def test_lm_store_health_and_compaction(spark, tmp_path):
    """The observability verb: a healthy store reports synced markers
    and no pending recovery; an inverse merge surfaces dead vocab
    rows; compact_lm_store reclaims them WITHOUT changing scores or
    losing the op marker (losing it would re-admit a replay)."""
    from flink_wsr_project_spark.operators.incremental import applied_op
    from flink_wsr_project_spark.operators.lm_store import (
        _paths,
        compact_lm_store,
        fit_lm_store,
        lm_store_health,
        remove_docs_from_lm,
        score_docs_against_lm,
    )

    lmst = _prefix(tmp_path, "lmst_hl")
    # an alien doc whose vocabulary appears NOWHERE else: its removal
    # is what actually zeroes rows (sf0.001 docs share their words)
    alien = spark.createDataFrame(
        [(9001, " ".join(f"zq{i}x" for i in range(30)))], "doc_id long, text string"
    ).localCheckpoint()
    survivors = _corpus(spark)
    corpus = survivors.unionByName(alien)
    fit_lm_store(spark, corpus, lmst)
    h = lm_store_health(spark, lmst)
    assert {s["state"] for s in h["states"]} == {"uni", "bi", "vocab", "docs"}
    assert h["states_in_sync"] and not h["pending_recovery"]
    assert h["vocab_rows"] > 0 and h["dead_vocab_rows"] == 0

    remove_docs_from_lm(spark, alien, lmst)
    h = lm_store_health(spark, lmst)
    assert h["dead_vocab_rows"] >= 30  # alien-only words at c = 0
    want = _scores(score_docs_against_lm(spark, survivors, lmst))
    marker = applied_op(_paths(lmst)["vocab"])
    out = compact_lm_store(spark, lmst)
    assert out["vocab"] == h["vocab_rows"] - h["dead_vocab_rows"]
    assert applied_op(_paths(lmst)["vocab"]) == marker  # marker preserved
    assert _scores(score_docs_against_lm(spark, survivors, lmst)) == want
    h = lm_store_health(spark, lmst)
    assert h["dead_vocab_rows"] == 0 and not h["pending_recovery"]
