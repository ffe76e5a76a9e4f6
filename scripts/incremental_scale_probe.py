#!/usr/bin/env python
"""Incremental-dedup scale probe: measure the claim that deduping an
increment against the persisted signature store costs O(|Δ|), not
O(|corpus ∪ Δ|) — the number behind SCALE.md's round-10 section.

On the clone corpus from gen_scale_probe.py (every doc a 10-clone
near-dup cluster — the adversarial direction for LSH bucket joins):

* corpus  = docs with doc_id % 3 != 2 (~2/3), signature store written
  once (one-time cost, reported separately);
* Δ-small = 1/10th of the batch third (~3% of all docs);
* Δ-large = the full batch third (~33% of all docs);
* full    = ``dedup_keep_list`` over corpus ∪ Δ-large — what a
  pipeline WITHOUT an incremental path must re-run per increment.

Reported: steady medians for the store-based increment at both Δ
sizes (linearity check: Δ-large/Δ-small ≈ 10 on ~10× the docs ⇒ the
increment is linear in |Δ|), the one-statement ``dedup_incremental``
query at the same split (what the store saves: the corpus side's
signature recompute), and the full re-dedup. Prints one JSON line.

Usage: python scripts/gen_scale_probe.py /tmp/spark_graft_sf1 10
       python scripts/incremental_scale_probe.py /tmp/spark_graft_sf1
"""

from __future__ import annotations

import json
import os
import sys
import time
from statistics import median

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from flink_wsr_project_spark.operators.incremental_dedup import (  # noqa: E402
    dedup_incremental_from_store,
    dedup_incremental_from_store_pruned,
    write_signature_store,
)
from flink_wsr_project_spark.plans.registry import all_queries  # noqa: E402
from flink_wsr_project_spark.session import get_spark  # noqa: E402
from flink_wsr_project_spark.sources.readers import load_table  # noqa: E402

STEADY_RUNS = 3
PREFIX = "incr_probe"


def _steady(fn) -> float:
    fn()  # warm (codegen + footer caches)
    samples = []
    for _ in range(STEADY_RUNS):
        t0 = time.perf_counter()
        fn()
        samples.append(time.perf_counter() - t0)
    return round(median(samples), 3)


def main(probe_dir: str) -> None:
    spark = get_spark("incr-scale-probe")
    docs = load_table(spark, "documents", probe_dir)
    corpus = docs.where(~F.expr("doc_id % 3 = 2"))
    batch_large = docs.where(F.expr("doc_id % 3 = 2"))
    # Δ-small divisor: at probe copies=C pass SPARK_GRAFT_INCR_SMALL_DIV=C
    # to hold |Δ-small| FIXED (~1,667 docs) across corpus scales — the
    # corpus-independence measurement (increment cost must track Δ and
    # bucket width, never corpus row count).
    small_div = int(os.environ.get("SPARK_GRAFT_INCR_SMALL_DIV", "10"))
    batch_small = batch_large.where(F.expr(f"(doc_id div 3) % {small_div} = 0"))

    # DROP alone is not enough across processes: the session catalog is
    # in-memory, so a previous run's table is unknown to DROP but its
    # warehouse directory still exists and blocks saveAsTable.
    import shutil

    for t in (f"{PREFIX}_longsigs", f"{PREFIX}_hashed"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)

    t0 = time.perf_counter()
    write_signature_store(spark, corpus, PREFIX, num_buckets=32)
    store_write_s = round(time.perf_counter() - t0, 3)

    # tiny Δ (~0.1% of the batch third): the straggler-micro-batch /
    # doc-lookup operating point the PARTITIONED layout exists for
    tiny_div = int(os.environ.get("SPARK_GRAFT_INCR_TINY_DIV", "1000"))
    batch_tiny = batch_large.where(F.expr(f"(doc_id div 3) % {tiny_div} = 0"))
    for t in (f"{PREFIX}_p_longsigs", f"{PREFIX}_p_hashed"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    write_signature_store(
        spark, corpus, f"{PREFIX}_p", num_buckets=4, hash_partitions=64
    )

    def run_store(batch):
        return lambda: dedup_incremental_from_store(spark, batch, PREFIX).write.format(
            "noop"
        ).mode("overwrite").save()

    def run_pruned(batch):
        return lambda: dedup_incremental_from_store_pruned(
            spark, batch, f"{PREFIX}_p"
        ).write.format("noop").mode("overwrite").save()

    reg = all_queries()

    def run_query(name):
        return lambda: reg[name](spark, probe_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    out = {
        "dir": probe_dir,
        "rows": {
            "corpus": corpus.count(),
            "batch_tiny": batch_tiny.count(),
            "batch_small": batch_small.count(),
            "batch_large": batch_large.count(),
        },
        "store_write_s": store_write_s,
        "increment_tiny_regular_s": _steady(run_store(batch_tiny)),
        "increment_tiny_pruned_s": _steady(run_pruned(batch_tiny)),
        # the pruning effect itself, measured as files read (bytes-read
        # is the lever at 100 TB; wall-time only shows it once the
        # store scan dwarfs the two bounded-collect round-trips)
        "onedoc_longsig_files_pruned": len(
            [
                f
                for f in dedup_incremental_from_store_pruned(
                    spark, batch_tiny.limit(1), f"{PREFIX}_p"
                ).inputFiles()
                if "_p_longsigs" in f
            ]
        ),
        "onedoc_longsig_files_total": len(
            spark.table(f"{PREFIX}_p_longsigs").inputFiles()
        ),
        "increment_small_s": _steady(run_store(batch_small)),
        "increment_large_s": _steady(run_store(batch_large)),
        "inline_query_s": _steady(run_query("dedup_incremental")),
        "full_keep_list_s": _steady(run_query("dedup_keep_list")),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1")
