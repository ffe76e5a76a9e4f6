#!/usr/bin/env python
"""Composed-curation-loop cost probe: the per-batch cost curve for the
FULL chain (quality → signature dedup → span coverage → LM gate →
4-store absorb), measured as the stores grow. The claim under test is
the composition's: each member's probe/absorb is bounded by |Δ| for a
fixed corpus layout, so chaining them stays flat batch-over-batch —
a growing per-batch time would mean some member is re-reading history.

Fresh synthetic docs per batch (20% clones of earlier admits so the
dup gate does real work), fixed batch size; reports decide+apply wall
time per batch plus the decisions mix. Run:
python scripts/curation_loop_probe.py [n_batches] [batch_docs]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from flink_wsr_project_spark.session import get_spark  # noqa: E402


def _mk_docs(spark, first_id: int, n: int):
    rows = []
    for i in range(n):
        doc_id = first_id + i
        if i % 5 == 0 and first_id > 0:
            base = (doc_id * 7919) % first_id
            toks = [f"t{base}_{j}" for j in range(60)]
        else:
            toks = [f"t{doc_id}_{j}" for j in range(60)]
        rows.append((doc_id, " ".join(toks)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def main() -> None:
    from flink_wsr_project_spark.operators.incremental_dedup import (
        write_signature_store,
    )
    from flink_wsr_project_spark.operators.search_index import write_search_index
    from flink_wsr_project_spark.operators.span_store import write_span_store
    from flink_wsr_project_spark.streaming.curation import (
        curate_foreach_batch,
        curation_health,
        prune_decision_log,
        recover_curation_stores,
    )

    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    batch_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 500

    spark = get_spark("curation-probe")
    prefix = "curprobe"
    lm_prefix = "/tmp/curprobe_lm"
    log = "/tmp/curprobe_log"
    for p in (lm_prefix + "_lm_uni", lm_prefix + "_lm_bi",
              lm_prefix + "_lm_vocab", lm_prefix + "_lm_docs", log):
        shutil.rmtree(p, ignore_errors=True)
    for suffix in ("longsigs", "hashed", "posgrams", "docs",
                   "postings", "docstats", "sstats", "tombstones", "retention"):
        spark.sql(f"DROP TABLE IF EXISTS {prefix}_{suffix}")
        shutil.rmtree(f"spark-warehouse/{prefix}_{suffix}", ignore_errors=True)

    seed = _mk_docs(spark, 0, batch_docs).localCheckpoint()
    write_signature_store(spark, seed, prefix, num_buckets=4)
    write_span_store(spark, seed, prefix, num_buckets=4)
    write_search_index(spark, seed, prefix, num_buckets=4)
    recover_curation_stores(spark, log, prefix, prefix, lm_prefix, prefix)

    mix = {}

    def on_batch(d, b, rep):
        rows = d.groupBy("stage").count().collect()
        mix[b] = {r.stage: r["count"] for r in rows}

    body = curate_foreach_batch(
        log, prefix, prefix, lm_prefix, prefix, num_buckets=4, on_batch=on_batch
    )
    print(f"{'batch':>5} {'loop_s':>7}  decisions")
    first = last = None
    for b in range(1, n_batches + 1):
        docs = _mk_docs(spark, b * batch_docs, batch_docs).localCheckpoint()
        t0 = time.perf_counter()
        body(docs, b)
        loop_s = time.perf_counter() - t0
        print(f"{b:>5} {loop_s:>7.2f}  {mix.get(b)}")
        if first is None:
            first = loop_s
        last = loop_s
        # maintenance cadence: retention on the WAL (replay only ever
        # needs the batch being restarted; keep a short audit window)
        pruned = prune_decision_log(log, keep_last=4)
        if pruned:
            print(f"      pruned decision-log dirs: {pruned}")
    print(f"loop last/first ratio: {last / first:.2f} "
          f"(corpus grew {n_batches + 1}x)")
    hl = curation_health(spark, log, prefix, prefix, lm_prefix, prefix)
    print("health:", {k: (v if k == "decision_log" else "ok")
                      for k, v in hl.items()})


if __name__ == "__main__":
    main()
