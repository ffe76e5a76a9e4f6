#!/usr/bin/env python
"""LM-store merge-cost probe: the per-batch cost curve the other
stores carry in SCALE.md, for the bigram LM. Fit on a seed corpus,
then absorb N batches of fresh documents and time each merge while
the persisted states grow — the mergeable-aggregate claim is that a
merge costs one shuffle over |state| + |delta| rows, so the per-batch
time should grow with STATE size (the unioned aggregate re-writes the
state), not with total corpus history re-read.

Also times the score pass per step (model lookup joins — should be
flat once vocabulary saturates) and reports state row counts so the
growth driver is visible in the numbers.

Run: python scripts/lm_merge_cost_probe.py [n_batches] [batch_docs]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from flink_wsr_project_spark.session import get_spark  # noqa: E402


def _mk_docs(spark, first_id: int, n: int):
    """n docs of ~60 tokens drawn from a 5k-word zipfy vocabulary, so
    the unigram state saturates while the bigram state keeps growing —
    the realistic shape (bigram is the state that scales)."""
    rows = []
    for i in range(n):
        doc_id = first_id + i
        toks = [f"w{(doc_id * 61 + j * 7919) % (200 + 24 * j % 4800)}" for j in range(60)]
        rows.append((doc_id, " ".join(toks)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def main() -> None:
    from flink_wsr_project_spark.operators.lm_store import (
        _paths,
        absorb_docs_into_lm,
        fit_lm_store,
        score_docs_against_lm,
    )

    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    batch_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 500

    spark = get_spark("lm-merge-probe")
    prefix = "/tmp/lm_probe_store"
    fit_lm_store(spark, _mk_docs(spark, 0, batch_docs), prefix)

    print(f"{'batch':>5} {'absorb_s':>9} {'score_s':>8} {'uni_rows':>9} {'bi_rows':>9}")
    first = last = None
    for b in range(1, n_batches + 1):
        docs = _mk_docs(spark, b * batch_docs, batch_docs).localCheckpoint()
        t0 = time.perf_counter()
        absorb_docs_into_lm(spark, docs, prefix)
        absorb_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        score_docs_against_lm(spark, docs, prefix).write.format("noop").mode(
            "overwrite"
        ).save()
        score_s = time.perf_counter() - t0
        uni = spark.read.parquet(_paths(prefix)["uni"]).count()
        bi = spark.read.parquet(_paths(prefix)["bi"]).count()
        print(f"{b:>5} {absorb_s:>9.3f} {score_s:>8.3f} {uni:>9} {bi:>9}")
        if first is None:
            first = absorb_s
        last = absorb_s
    print(f"absorb last/first ratio: {last / first:.2f} "
          f"(state grew {n_batches + 1}x in docs)")


if __name__ == "__main__":
    main()
