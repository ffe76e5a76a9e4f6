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
