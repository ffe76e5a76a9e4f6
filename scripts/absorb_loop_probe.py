#!/usr/bin/env python
"""Absorb-loop probe: per-micro-batch cost of the continuous
incremental-dedup loop (streaming/dedup.py::dedup_absorb_foreach_batch)
as the store GROWS — the number behind the claim that a micro-batch
pays for its own size plus bucket width, not for the corpus.

On the clone corpus (gen_scale_probe.py), the batch third is split
into N sequential micro-batches driven through the foreachBatch body
against a hash-partitioned store; each batch's decisions execute and
its kept docs absorb, so batch i sees batches 0..i-1 as corpus.
Prints one JSON line with per-batch seconds and decision counts.
Flat per-batch seconds across the run = the loop does not re-pay the
growing corpus.

With a third argument the loop runs with the in-band compaction dial
(``max_files_per_bucket``) armed: the output then also reports the
longsigs file count after every batch (bounded by dial×buckets when
the trigger works) and the per-batch seconds INCLUDE the amortized
compaction rewrites — the measured cost of keeping the store's scan
fan-in bounded from inside the loop.

Usage: python scripts/absorb_loop_probe.py /tmp/spark_graft_sf1 10 [max_files_per_bucket]
"""

from __future__ import annotations

import json
import shutil
import sys
import time

REPO = __file__.rsplit("/", 2)[0]
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from flink_wsr_project_spark.operators.incremental_dedup import (  # noqa: E402
    write_signature_store,
)
from flink_wsr_project_spark.session import get_spark  # noqa: E402
from flink_wsr_project_spark.sources.readers import load_table  # noqa: E402
from flink_wsr_project_spark.streaming.dedup import (  # noqa: E402
    dedup_absorb_foreach_batch,
)

PREFIX = "absorb_probe"


def main(
    probe_dir: str, n_batches: int, max_files_per_bucket: int | None = None
) -> None:
    spark = get_spark("absorb-loop-probe")
    docs = load_table(spark, "documents", probe_dir)
    corpus = docs.where(~F.expr("doc_id % 3 = 2"))
    batch_all = docs.where(F.expr("doc_id % 3 = 2"))

    for t in (f"{PREFIX}_longsigs", f"{PREFIX}_hashed"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)

    t0 = time.perf_counter()
    write_signature_store(spark, corpus, PREFIX, num_buckets=8, hash_partitions=64)
    store_write_s = round(time.perf_counter() - t0, 3)

    counts: list[dict] = []

    def sink(decisions, batch_id):
        by = {
            r["decision"]: r["n"]
            for r in decisions.groupBy("decision").agg(F.count("*").alias("n")).collect()
        }
        counts.append(by)

    from flink_wsr_project_spark.sources.writers import table_data_file_stats

    body = dedup_absorb_foreach_batch(
        PREFIX, sink, num_buckets=8, max_files_per_bucket=max_files_per_bucket
    )

    per_batch_s: list[float] = []
    files_per_batch: list[int] = []
    for i in range(n_batches):
        clones = batch_all.where(F.expr(f"pmod(doc_id div 3, {n_batches}) = {i}"))
        # the clone corpus makes every raw batch doc a corpus dup, so
        # the absorb arm would never fire; synthesize an equal-sized
        # NOVEL half (20 unique tokens per doc) so each batch both
        # dedups against and GROWS the store — the property under test
        novel = clones.select(
            (F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"),
            F.expr(
                "concat_ws(' ', transform(sequence(1, 20),"
                " j -> concat('w', CAST(doc_id AS STRING), 'x', CAST(j AS STRING))))"
            ).alias("text"),
        )
        mb = clones.select("doc_id", "text").unionByName(novel)
        t0 = time.perf_counter()
        body(mb, i)
        per_batch_s.append(round(time.perf_counter() - t0, 3))
        files_per_batch.append(table_data_file_stats(spark, f"{PREFIX}_longsigs")[0])

    out = {
        "dir": probe_dir,
        "n_batches": n_batches,
        "max_files_per_bucket": max_files_per_bucket,
        "corpus_rows": corpus.count(),
        "batch_rows_total": batch_all.count(),
        "store_write_s": store_write_s,
        "per_batch_s": per_batch_s,
        "first_vs_last": round(per_batch_s[-1] / per_batch_s[0], 3)
        if per_batch_s[0]
        else None,
        "longsig_files_after_each_batch": files_per_batch,
        "decisions_per_batch": counts,
        "store_rows_end": spark.table(f"{PREFIX}_longsigs").count(),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main(
        sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1",
        int(sys.argv[2]) if len(sys.argv) > 2 else 10,
        int(sys.argv[3]) if len(sys.argv) > 3 else None,
    )
