#!/usr/bin/env python
"""Measure the incremental semantic-dedup DECISION cost as the index
grows under FIXED centroids (the slope the semdedup loop's 100 TB
claim is conditioned on).

The probe searches the batch's assigned IVF list; under fixed
centroids that list grows linearly with the absorbed corpus, so
per-batch decision cost has a linear component with slope
Δ·(growth/k). This probe measures it directly: decide a FIXED
150-vector batch against the index at 1×, 2×, 4×, 8× corpus (growth
driven by raw absorbs, so the store size is controlled, not
decision-dependent), median of 3 runs each. SCALE.md states the
resulting dial: size k for the TARGET corpus at build (or retrain to
a finer grid at milestones) — same conditioning as every store's
"only the increment shuffles" claim.

Also drives one full loop pass (decisions → keeper-only absorb) at
each size so the loop path itself is exercised, not just the probe.

Usage: python scripts/semdedup_absorb_probe.py
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from flink_wsr_project_spark.operators.ann_index import (  # noqa: E402
    absorb_vectors_into_index,
    semdedup_from_index,
    write_ann_index,
)
from flink_wsr_project_spark.session import get_spark  # noqa: E402
from flink_wsr_project_spark.sources.readers import load_table  # noqa: E402
from flink_wsr_project_spark.streaming.similarity import (  # noqa: E402
    semdedup_foreach_batch,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
PREFIX = "sdprobe"


def main() -> None:
    spark = get_spark("semdedup-probe", cpus="8", shuffle_partitions=8)
    for t in (f"{PREFIX}_centroids", f"{PREFIX}_lists"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)

    emb = load_table(spark, "embeddings", SF_DIR)
    write_ann_index(spark, emb, PREFIX, num_buckets=4, reassign=False)
    base = emb.count()

    # fixed probe batch: half dup bait (perturbed corpus), half negated
    probe = (
        emb.limit(150)
        .select(
            (F.col("vec_id") + 900_000).alias("vec_id"),
            F.when(
                F.col("vec_id") % 2 == 0,
                F.expr("transform(embedding, x -> CAST(x * 1.001 AS FLOAT))"),
            )
            .otherwise(F.expr("transform(embedding, x -> CAST(-x AS FLOAT))"))
            .alias("embedding"),
        )
        .localCheckpoint()
    )

    def decide_sec() -> float:
        runs = []
        for _ in range(3):
            t0 = time.time()
            semdedup_from_index(spark, probe, PREFIX).count()
            runs.append(time.time() - t0)
        return round(statistics.median(runs), 3)

    def loop_pass_sec(batch_id: int) -> float:
        body = semdedup_foreach_batch(PREFIX, lambda d, b: d.count(), num_buckets=4)
        t0 = time.time()
        body(
            probe.select(
                (F.col("vec_id") + batch_id * 10_000_000).alias("vec_id"), "embedding"
            ),
            batch_id,
        )
        return round(time.time() - t0, 3)

    points = []
    grow_step = 0
    for target_mult in (1, 2, 4, 8):
        target = base * target_mult
        while spark.table(f"{PREFIX}_lists").count() < target:
            grow_step += 1
            filler = emb.select(
                (F.col("vec_id") + grow_step * 1_000_000).alias("vec_id"),
                F.expr(
                    f"transform(embedding, x -> CAST(x * (1.0 + 0.0001 * {grow_step}) AS FLOAT))"
                ).alias("embedding"),
            )
            absorb_vectors_into_index(spark, filler, PREFIX, num_buckets=4)
        n = spark.table(f"{PREFIX}_lists").count()
        points.append(
            {
                "corpus": n,
                "mult": target_mult,
                "decide_median_sec": decide_sec(),
                "loop_pass_sec": loop_pass_sec(target_mult),
            }
        )

    first, last = points[0], points[-1]
    print(
        json.dumps(
            {
                "metric": "semdedup_decision_cost_vs_corpus",
                "points": points,
                "decide_slope_8x": round(
                    last["decide_median_sec"] / first["decide_median_sec"], 3
                ),
                "sf_dir": SF_DIR,
            }
        )
    )


if __name__ == "__main__":
    main()
