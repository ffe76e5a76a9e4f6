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


def _op_token(docs: DataFrame, sign: int) -> str:
    """Deterministic identity of one merge operation: the sign, the
    doc count, and an order-independent 64-bit fold of the doc_id set
    (``bit_xor`` — overflow-free under ANSI mode, and the input is
    already deduplicated by doc_id so no pair cancels). A replay of
    the same logical operation reproduces the same token; one bounded
    aggregate, no data-sized collect."""
    row = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.expr("bit_xor(xxhash64(doc_id))"), F.lit(0)).alias("h"),
    ).collect()[0]
    return f"{sign}:{row.n}:{row.h}"


def _merge_counts(
    spark: SparkSession, prefix: str, docs: DataFrame, sign: int
) -> None:
    """Merge ``docs``' counts into the three states, multiplied by
    ``sign`` (+1 absorb, -1 takedown) — the group operation. Each
    state merge carries the operation's token (see
    ``incremental.update_aggregate_table``), so a replay after a
    crash BETWEEN state merges re-applies only the states that missed
    it — never a double merge. The r13 design accepted double-merge
    on that window ("heal by refitting"); the marker closes it."""
    from flink_wsr_project_spark.operators.incremental import (
        update_aggregate_table,
    )

    p = _paths(prefix)
    tok = _op_token(docs, sign)
    bg = _bigrams(docs)
    update_aggregate_table(
        spark, p["uni"], bg, ["w1"],
        {"c1": (F.count(F.lit(1)) * sign).cast("long")}, {"c1": "sum"},
        op_token=tok,
    )
    update_aggregate_table(
        spark, p["bi"], bg, ["w1", "w2"],
        {"c2": (F.count(F.lit(1)) * sign).cast("long")}, {"c2": "sum"},
        op_token=tok,
    )
    update_aggregate_table(
        spark, p["vocab"], _toks(docs), ["tok"],
        {"c": (F.count(F.lit(1)) * sign).cast("long")}, {"c": "sum"},
        op_token=tok,
    )


def fit_lm_store(spark: SparkSession, corpus_docs: DataFrame, prefix: str) -> None:
    """First fit — the corpus is batch zero. ``prefix`` is a path
    prefix (the mergeable states are directory-swapped, not catalog
    tables). Input is deduplicated by doc_id like every other entry
    point: duplicate ids would XOR-cancel in the op token (violating
    the no-pair-cancels invariant the exactly-once protocol assumes),
    double-count the fitted states, and write duplicate roster rows."""
    import shutil

    for path in _paths(prefix).values():
        shutil.rmtree(path, ignore_errors=True)
    docs = corpus_docs.dropDuplicates(["doc_id"])
    _merge_counts(spark, prefix, docs, 1)
    docs.select("doc_id").write.mode("overwrite").parquet(_paths(prefix)["docs"])


def absorb_docs_into_lm(
    spark: SparkSession, batch_docs: DataFrame, prefix: str
) -> int:
    """Merge a batch's counts into the model. Replay-idempotent at
    BOTH granularities: docs already in the roster are excluded before
    the delta aggregate (whole-batch replay), and each state merge
    carries the operation token (crash between the uni/bi/vocab merges
    or before the roster append — the replay re-applies exactly the
    states that missed it, because the roster only lands after all
    three, so the recomputed delta and token are identical). The input
    is deduplicated by doc_id first — duplicate rows in one batch
    would otherwise double-merge a document's counts and write
    duplicate roster rows. Returns docs absorbed."""
    from flink_wsr_project_spark.operators.iterative import (
        local_checkpoint_tracked,
        release_persistent_rdds,
    )

    p = _paths(prefix)
    roster = spark.read.parquet(p["docs"]).select("doc_id")
    fresh, ckpt_ids = local_checkpoint_tracked(
        batch_docs.dropDuplicates(["doc_id"]).join(roster, "doc_id", "left_anti")
    )
    try:
        n = fresh.count()
        if n:
            _merge_counts(spark, prefix, fresh, 1)
            fresh.select("doc_id").write.mode("append").parquet(p["docs"])
        return n
    finally:
        # a long-running ingest loop calls this every micro-batch — an
        # untracked localCheckpoint would pin one RDD per batch forever
        release_persistent_rdds(spark, ckpt_ids)


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
    from flink_wsr_project_spark.operators.iterative import (
        local_checkpoint_tracked,
        release_persistent_rdds,
    )

    p = _paths(prefix)
    roster = spark.read.parquet(p["docs"]).select("doc_id")
    present, ckpt_ids = local_checkpoint_tracked(
        removed_docs.dropDuplicates(["doc_id"]).join(roster, "doc_id")
    )
    try:
        n = present.count()
        if n:
            _merge_counts(spark, prefix, present, -1)
            survivors, sids = local_checkpoint_tracked(
                roster.join(present.select("doc_id"), "doc_id", "left_anti")
            )
            ckpt_ids |= sids
            survivors.write.mode("overwrite").parquet(p["docs"] + "__new")
            from flink_wsr_project_spark.sources.writers import atomic_swap_dir

            atomic_swap_dir(p["docs"], p["docs"] + "__new")
        return n
    finally:
        release_persistent_rdds(spark, ckpt_ids)


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


def recover_lm_store(spark: SparkSession, prefix: str) -> bool:
    """Finish interrupted rename-aside swaps on all four states —
    idempotent, run at loop startup. Always rolls BACK (see
    ``incremental.recover_aggregate_state``); the interrupted
    operation then replays exactly-once per state via the op-token
    markers. Returns True when anything was repaired."""
    from flink_wsr_project_spark.operators.incremental import (
        recover_aggregate_state,
    )

    ran = False
    for path in _paths(prefix).values():
        ran = recover_aggregate_state(path) or ran
    return ran


def compact_lm_store(spark: SparkSession, prefix: str) -> dict[str, int]:
    """Physically drop the zero/negative-count rows inverse merges
    leave behind (scoring already filters them; this reclaims the
    bytes). Each state rewrites via rename-aside WITH its current
    op marker preserved — losing the marker would let a replay of the
    last operation double-merge. Returns {state: surviving rows}."""
    import uuid as _uuid

    from flink_wsr_project_spark.operators.incremental import applied_op
    from flink_wsr_project_spark.sources.writers import atomic_swap_dir

    p = _paths(prefix)
    out: dict[str, int] = {}
    for name, cnt in (("uni", "c1"), ("bi", "c2"), ("vocab", "c")):
        path = p[name]
        live = spark.read.parquet(path).where(F.col(cnt) > 0)
        marker = applied_op(path)
        tmp = f"{path.rstrip('/')}__merge_{_uuid.uuid4().hex[:8]}"
        live.write.mode("overwrite").parquet(tmp)
        if marker is not None:
            with open(os.path.join(tmp, "_applied_op"), "w") as f:
                f.write(marker)
        atomic_swap_dir(path, tmp)
        out[name] = spark.read.parquet(path).count()
    return out


def lm_store_health(spark: SparkSession, prefix: str) -> dict:
    """Operational report for the LM store — the path-state sibling of
    ``store_health.store_health`` (this store is directory-swapped
    parquet, not catalog tables). Reads file metadata, the op markers,
    and the VOCAB state only — O(V), bounded by vocabulary size, never
    by the corpus (the bigram state, the one that grows, is not
    scanned). ``pending_recovery`` flags leftover swap siblings that
    ``recover_lm_store`` would repair; ``dead_vocab_rows`` counts the
    zero/negative rows a ``compact_lm_store`` would reclaim."""
    import glob

    from flink_wsr_project_spark.operators.incremental import applied_op

    report: dict = {"prefix": prefix, "states": []}
    pending = False
    for name, path in _paths(prefix).items():
        exists = os.path.exists(path)
        files = (
            [f for f in os.listdir(path) if not f.startswith(("_", "."))]
            if exists
            else []
        )
        leftovers = (
            glob.glob(path.rstrip("/") + "__old_*")
            + glob.glob(path.rstrip("/") + "__merge_*")
            + glob.glob(path.rstrip("/") + "__new")
        )
        pending = pending or (bool(leftovers) or not exists)
        report["states"].append(
            {
                "state": name,
                "exists": exists,
                "data_files": len(files),
                "bytes": sum(os.path.getsize(os.path.join(path, f)) for f in files),
                "applied_op": applied_op(path),
                "swap_leftovers": len(leftovers),
            }
        )
    report["pending_recovery"] = pending
    markers = {s["applied_op"] for s in report["states"] if s["state"] != "docs"}
    # a partially-applied operation (crash between state merges) shows
    # as disagreeing markers; the op's replay converges them
    report["states_in_sync"] = len(markers) == 1
    if os.path.exists(_paths(prefix)["vocab"]):
        vocab = spark.read.parquet(_paths(prefix)["vocab"])
        report["vocab_rows"] = vocab.count()
        report["dead_vocab_rows"] = vocab.where(F.col("c") <= 0).count()
    return report
