#!/usr/bin/env python
"""Locate the two-stage vs single-expand crossover EMPIRICALLY.

The r6 scale probe measured the two plans' slopes at 10× and
extrapolated the absolute-time crossover to ~10M events (SCALE.md
§Round-6 scale probe). Extrapolation is not measurement: this script
generates events-only datasets at chosen multipliers (same
deterministic replication semantics as gen_scale_probe.py — key/window
group count fixed, rows ×C, ts jitter < the 5-min bucket) and measures
both hot-items plans' steady medians at each point, so SCALE.md can
state WHERE the two-stage plan starts winning instead of predicting it.

Usage: python scripts/crossover_probe.py [C1 C2 ...]   (default 10 30 100)
Writes datasets to /tmp/spark_graft_events_{C}x (events only — both
queries scan nothing else); prints one table.
"""

from __future__ import annotations

import os
import sys
import time
from statistics import median

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from flink_wsr_project_spark.plans.registry import all_queries  # noqa: E402
from flink_wsr_project_spark.session import get_spark  # noqa: E402
from flink_wsr_project_spark.sources.readers import load_table  # noqa: E402

SRC = "/root/testdata/sf0.1"
QUERIES = ["hot_items_topn", "hot_items_topn_expand"]
STEADY_RUNS = 3


def gen_events(spark, copies: int, out_dir: str) -> int:
    ev = load_table(spark, "events", SRC)
    out = (
        ev.crossJoin(F.broadcast(spark.range(copies).select(F.col("id").alias("_i"))))
        .withColumn("event_id", F.expr(f"event_id * {copies} + _i"))
        # jitter < one 5-min bucket width for copies <= 300, so the
        # (key, window) group count stays APPROXIMATELY fixed while rows
        # grow x C: replicas of events within copies-1 seconds of a
        # bucket end spill into the adjacent bucket, adding at most one
        # extra group per (key, boundary) — second-order against the
        # C-fold row growth the probe measures
        .withColumn("ts", F.col("ts") + F.make_interval(secs=F.col("_i").cast("int")))
        .drop("_i")
        .select(ev.columns)
    )
    out.write.mode("overwrite").parquet(f"{out_dir}/events.parquet")
    return spark.read.parquet(f"{out_dir}/events.parquet").count()


def measure(spark, sf_dir: str) -> dict[str, float]:
    reg = all_queries()
    res: dict[str, float] = {}
    for name in QUERIES:
        reg[name](spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
        samples = []
        for _ in range(STEADY_RUNS):
            t0 = time.perf_counter()
            reg[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        res[name] = round(median(samples), 3)
    return res


def main(multipliers: list[int]) -> None:
    spark = get_spark("crossover-probe")
    points: list[tuple[int, int, dict[str, float]]] = []
    base_n = load_table(spark, "events", SRC).count()
    points.append((1, base_n, measure(spark, SRC)))
    for c in multipliers:
        d = f"/tmp/spark_graft_events_{c}x"
        os.makedirs(d, exist_ok=True)
        n = gen_events(spark, c, d)
        points.append((c, n, measure(spark, d)))
    print(f"\n{'copies':>7s} {'events':>10s} {'two-stage':>10s} {'expand':>9s} {'winner':>10s}")
    for c, n, r in points:
        two, exp = r["hot_items_topn"], r["hot_items_topn_expand"]
        print(
            f"{c:>7d} {n:>10,} {two:>10.3f} {exp:>9.3f} "
            f"{'two-stage' if two < exp else 'expand':>10s}"
        )


if __name__ == "__main__":
    main([int(a) for a in sys.argv[1:]] or [10, 30, 100])
