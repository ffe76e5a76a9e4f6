"""Continuous fitting for the persisted bigram LM
(operators/lm_store.py) — the ingest loop that keeps the perplexity
filter's model current as documents stream in, completing the store's
lifecycle parity with the other five families (r13 verdict task 3).

Crash story (the part a foreachBatch loop actually needs): Spark
replays a failed micro-batch with the SAME batch contents, so the two
idempotence layers in ``absorb_docs_into_lm`` — the doc roster for
whole-batch replays and the per-state op-token markers for crashes
BETWEEN the unigram/bigram/vocab merges — make the loop exactly-once
end to end. Run ``recover_lm_store`` once at loop startup to finish
any interrupted directory swap first (roll-back + marker replay).

Takedown composes mid-stream: ``remove_docs_from_lm`` between
micro-batches is an inverse merge against the same states the loop is
feeding; the next batch's scores reflect the subtraction immediately
(pinned in tests/test_lm_store.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def lm_ingest_foreach_batch(
    prefix: str,
    content_col: str = "text",
    id_col: str = "doc_id",
    on_batch=None,
    max_dead_vocab_rows: int | None = None,
):
    """foreachBatch body: absorb each micro-batch into the LM (fit
    delta merge — one shuffle per count state over |state| + |delta|
    rows; history is never re-read), report the absorbed count via
    ``on_batch(n, batch_id)``, and — with ``max_dead_vocab_rows`` set —
    run ``compact_lm_store`` when inverse merges have left more than
    that many zero/negative vocabulary rows (the store's analogue of
    the file-count compaction dial; the check is O(V), never corpus)."""
    from flink_wsr_project_spark.operators.lm_store import (
        absorb_docs_into_lm,
        compact_lm_store,
        fit_lm_store,
        lm_store_exists,
    )

    def body(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession
        docs = batch_df.select(
            F.col(id_col).alias("doc_id"), F.col(content_col).alias("text")
        ).dropDuplicates(["doc_id"])
        if not lm_store_exists(prefix):
            # self-bootstrapping: the first batch IS the corpus fit
            # (a replayed first batch refits identically — fit is a
            # full overwrite, so this path is replay-idempotent too)
            from flink_wsr_project_spark.operators.iterative import (
                local_checkpoint_tracked,
                release_persistent_rdds,
            )

            docs, ckpt_ids = local_checkpoint_tracked(docs)
            try:
                fit_lm_store(s, docs, prefix)
                n = docs.count()
            finally:
                release_persistent_rdds(s, ckpt_ids)
        else:
            n = absorb_docs_into_lm(s, docs, prefix)
        if on_batch is not None:
            on_batch(n, batch_id)
        if max_dead_vocab_rows is not None:
            from flink_wsr_project_spark.operators.lm_store import (
                _paths,
            )

            dead = (
                s.read.parquet(_paths(prefix)["vocab"])
                .where(F.col("c") <= 0)
                .count()
            )
            if dead > max_dead_vocab_rows:
                compact_lm_store(s, prefix)

    return body
