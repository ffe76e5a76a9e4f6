"""Persisted bigram language model — the LM perplexity filter
(``doc_lm_perplexity``) as maintained STATE, so a long-running
pipeline scores every incoming batch against the corpus model without
ever re-reading history. Built entirely on the mergeable-aggregate
machinery (operators/incremental.py): unigram, bigram and vocabulary
counts are each a running aggregate merged with per-batch deltas —
one shuffle on the count keys over |state| + |delta| rows.

The algebra is what makes every lifecycle verb cheap:

* FIT / ABSORB: counts merge additively (``update_aggregate_table``);
  a replay is excluded by the doc roster before the delta aggregate.
* TAKEDOWN (``remove_docs_from_lm``): a document's contribution is
  subtracted by merging its counts NEGATED — the inverse element the
  other stores don't have (hashes and postings can only be masked;
  counts form a group). Zero/negative rows are dropped at scoring and
  compacted away by the next merge's aggregate.
* SCORING: add-one smoothing over the persisted counts; bigrams and
  head words unseen by the model get the smoothed floor (c = 0), so
  out-of-corpus text scores high NLL — exactly the drift signal a
  quality gate wants.

Fitting the store on a corpus and scoring that same corpus reproduces
the registered ``doc_lm_perplexity`` output bit-for-bit (same
micro-nat quantization, same thresholds — pinned by the parity test):
the registered query IS this store's fit+score collapsed into one
statement.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from flink_wsr_project_spark.plans.pipeline_queries import (
    _LM_HEAD_MAX_MICROS,
    _LM_TAIL_MIN_MICROS,
)


def _paths(prefix: str) -> dict[str, str]:
    return {
        "uni": f"{prefix}_lm_uni",
        "bi": f"{prefix}_lm_bi",
        "vocab": f"{prefix}_lm_vocab",
        "docs": f"{prefix}_lm_docs",
    }


def _toks(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id",
        F.posexplode(
            F.expr("filter(split(lower(text), '[^a-z0-9]+'), x -> x <> '')")
        ).alias("pos", "tok"),
    )


def _bigrams(docs: DataFrame) -> DataFrame:
    from pyspark.sql import Window

    t = _toks(docs)
    w = Window.partitionBy("doc_id").orderBy("pos")
    return (
        t.withColumn("w1", F.lag("tok").over(w))
        .where(F.col("w1").isNotNull())
        .select("doc_id", "w1", F.col("tok").alias("w2"))
    )


def _merge_counts(
    spark: SparkSession, prefix: str, docs: DataFrame, sign: int
) -> None:
    """Merge ``docs``' counts into the three states, multiplied by
    ``sign`` (+1 absorb, -1 takedown) — the group operation."""
    from flink_wsr_project_spark.operators.incremental import (
        update_aggregate_table,
    )

    p = _paths(prefix)
    bg = _bigrams(docs)
    update_aggregate_table(
        spark, p["uni"], bg, ["w1"],
        {"c1": (F.count(F.lit(1)) * sign).cast("long")}, {"c1": "sum"},
    )
    update_aggregate_table(
        spark, p["bi"], bg, ["w1", "w2"],
        {"c2": (F.count(F.lit(1)) * sign).cast("long")}, {"c2": "sum"},
    )
    update_aggregate_table(
        spark, p["vocab"], _toks(docs), ["tok"],
        {"c": (F.count(F.lit(1)) * sign).cast("long")}, {"c": "sum"},
    )


def fit_lm_store(spark: SparkSession, corpus_docs: DataFrame, prefix: str) -> None:
    """First fit — the corpus is batch zero. ``prefix`` is a path
    prefix (the mergeable states are directory-swapped, not catalog
    tables)."""
    import shutil

    for path in _paths(prefix).values():
        shutil.rmtree(path, ignore_errors=True)
    _merge_counts(spark, prefix, corpus_docs, 1)
    corpus_docs.select("doc_id").write.mode("overwrite").parquet(_paths(prefix)["docs"])


def absorb_docs_into_lm(
    spark: SparkSession, batch_docs: DataFrame, prefix: str
) -> int:
    """Merge a batch's counts into the model. Replay-idempotent: docs
    already in the roster are excluded before the delta aggregate, and
    the roster is appended AFTER the merges (a crash between leaves
    the counts double-merge-able — heal by refitting; the roster-last
    order at least guarantees a clean replay never UNDER-counts).
    The input is deduplicated by doc_id first — duplicate rows in one
    batch would otherwise double-merge a document's counts and write
    duplicate roster rows. Returns docs absorbed."""
    p = _paths(prefix)
    roster = spark.read.parquet(p["docs"]).select("doc_id")
    fresh = (
        batch_docs.dropDuplicates(["doc_id"])
        .join(roster, "doc_id", "left_anti")
        .localCheckpoint()
    )
    n = fresh.count()
    if n:
        _merge_counts(spark, prefix, fresh, 1)
        fresh.select("doc_id").write.mode("append").parquet(p["docs"])
    return n


def remove_docs_from_lm(
    spark: SparkSession, removed_docs: DataFrame, prefix: str
) -> int:
    """Takedown by inverse merge: the documents' counts are subtracted
    (requires the TEXT, which the takedown caller holds — counts have
    no per-doc rows to mask, only contributions to cancel). Only docs
    actually in the roster subtract (a replayed removal is a no-op);
    the roster rewrite drops them so a later absorb may re-add. The
    input is deduplicated by doc_id first — a duplicate row would
    survive the roster join twice and subtract the document's counts
    twice, silently corrupting counts shared with surviving docs."""
    p = _paths(prefix)
    roster = spark.read.parquet(p["docs"]).select("doc_id")
    present = (
        removed_docs.dropDuplicates(["doc_id"])
        .join(roster, "doc_id")
        .localCheckpoint()
    )
    n = present.count()
    if n:
        _merge_counts(spark, prefix, present, -1)
        survivors = roster.join(
            present.select("doc_id"), "doc_id", "left_anti"
        ).localCheckpoint()
        survivors.write.mode("overwrite").parquet(p["docs"] + "__new")
        from flink_wsr_project_spark.sources.writers import atomic_swap_dir

        atomic_swap_dir(p["docs"], p["docs"] + "__new")
    return n


def lm_vocab_size(spark: SparkSession, prefix: str) -> int:
    """V = live vocabulary rows (count > 0 survives inverse merges)."""
    return (
        spark.read.parquet(_paths(prefix)["vocab"]).where(F.col("c") > 0).count()
    )


def score_docs_against_lm(
    spark: SparkSession, batch_docs: DataFrame, prefix: str
) -> DataFrame:
    """Per-doc average NLL under the PERSISTED model — the registered
    query's scoring arithmetic (integer micro-nats, add-one smoothing,
    head/middle/tail buckets) with unseen-event floors: a bigram or
    head word the model has never counted contributes
    -ln(1 / (c1 + V)) resp. -ln(1 / V) — out-of-corpus text scores
    into the tail, the drift signal a streaming quality gate wants."""
    p = _paths(prefix)
    v = lm_vocab_size(spark, prefix)
    if v <= 0:
        raise ValueError(f"LM store '{prefix}' has an empty vocabulary — fit it first")
    uni = spark.read.parquet(p["uni"]).where(F.col("c1") > 0)
    bi = spark.read.parquet(p["bi"]).where(F.col("c2") > 0)
    bg = _bigrams(batch_docs)
    scored = (
        bg.join(uni, "w1", "left")
        .join(bi, ["w1", "w2"], "left")
        .select(
            "doc_id",
            F.expr(
                f"CAST(round(-ln((coalesce(c2, 0) + 1.0) / (coalesce(c1, 0) + {v}))"
                " * 1000000) AS BIGINT)"
            ).alias("nll"),
        )
    )
    avg = "CAST(sum(nll) div count(*) AS BIGINT)"
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.sum("nll").cast("long").alias("nll_micros"),
        F.expr(avg).alias("avg_nll_micros"),
        F.expr(
            f"CASE WHEN sum(nll) div count(*) < {_LM_HEAD_MAX_MICROS} THEN 'head' "
            f"WHEN sum(nll) div count(*) >= {_LM_TAIL_MIN_MICROS} THEN 'tail' "
            "ELSE 'middle' END"
        ).alias("ccnet_bucket"),
    )


def lm_store_exists(prefix: str) -> bool:
    return all(os.path.exists(path) for path in _paths(prefix).values())
