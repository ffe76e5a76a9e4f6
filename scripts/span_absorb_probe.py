#!/usr/bin/env python
"""Span-store absorb-loop probe: the per-batch cost curve the other
stores carry in SCALE.md — fix a probe batch size, absorb N batches of
fresh documents into the positional-gram store, and measure the
store-backed decision (`span_dedup_from_store`) plus the full loop
pass (probe + absorb) at each step. A flat decide column = the
"only the increment shuffles" claim, measured; loop-pass drift =
file-count growth, the thing the `max_files_per_bucket` dial bounds.

Run: python scripts/span_absorb_probe.py [n_batches] [batch_docs]
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from flink_wsr_project_spark.session import get_spark  # noqa: E402


def _mk_docs(spark, first_id: int, n: int, shared_frac: float = 0.2):
    """n docs of ~40 tokens; shared_frac of them clone a rotating
    earlier doc's run (so decisions exercise both branches)."""
    rows = []
    for i in range(n):
        doc_id = first_id + i
        if i % int(1 / shared_frac) == 0 and first_id > 0:
            base = (doc_id * 7919) % first_id  # clone someone absorbed earlier
            toks = [f"t{base}_{j}" for j in range(40)]
        else:
            toks = [f"t{doc_id}_{j}" for j in range(40)]
        rows.append((doc_id, " ".join(toks)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def main() -> None:
    from flink_wsr_project_spark.operators.span_store import (
        absorb_spans_into_store,
        span_dedup_from_store,
        write_span_store,
    )

    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    batch_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 250
    spark = get_spark("span-absorb-probe")
    prefix = "span_probe"
    for t in (f"{prefix}_posgrams", f"{prefix}_docs", f"{prefix}_tombstones"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)

    write_span_store(spark, _mk_docs(spark, 0, batch_docs), prefix)
    probe_batch = _mk_docs(spark, 10_000_000, 150).localCheckpoint()

    decid, loops = [], []
    next_id = batch_docs
    for b in range(n_batches):
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            span_dedup_from_store(spark, probe_batch, prefix).count()
            reps.append(time.perf_counter() - t0)
        decid.append(statistics.median(reps))

        t0 = time.perf_counter()
        batch = _mk_docs(spark, next_id, batch_docs)
        d = span_dedup_from_store(spark, batch, prefix).localCheckpoint()
        absorb_spans_into_store(
            spark, batch, d, prefix, exclude_existing=True
        )
        loops.append(time.perf_counter() - t0)
        next_id += batch_docs
        n_corpus = spark.table(f"{prefix}_docs").count()
        print(
            f"batch {b}: corpus={n_corpus} decide={decid[-1]:.3f}s "
            f"loop={loops[-1]:.3f}s",
            flush=True,
        )

    print(
        f"decide first_vs_last: {decid[-1] / decid[0]:.2f} "
        f"({decid[0]:.3f}s -> {decid[-1]:.3f}s over "
        f"{n_batches}x{batch_docs}-doc absorbs)"
    )
    print(f"loop first_vs_last: {loops[-1] / loops[0]:.2f}")


if __name__ == "__main__":
    main()
