#!/usr/bin/env python
"""Scale probe: measure the most expensive queries at sf0.1 vs the
10× dataset from gen_scale_probe.py and report per-query scaling
ratios (steady medians, same discipline as bench.py).

The falsifiable prediction under test (SCALE.md §Windowed
aggregation): with rows ×10 and the (key, window) group count fixed,
the two-stage sliding plan (`hot_items_topn`) should scale closer to
linear-in-rows for its SCAN but sublinearly for its exchange, while
the single-expand plan (`hot_items_topn_expand`) replicates every raw
row 12× before the shuffle and should scale at least linearly. Any
query scaling >10× on 10× data gets a root cause in SCALE.md.

Usage: python scripts/scale_probe.py [ten_x_dir]
Prints one JSON line per dataset plus a ratio table.
"""

from __future__ import annotations

import json
import os
import sys
import time
from statistics import median

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from flink_wsr_project_spark.plans.registry import all_queries  # noqa: E402
from flink_wsr_project_spark.session import get_spark  # noqa: E402

PROBE_QUERIES = [
    # 5 most expensive headline queries (BENCH_r05 first-run order)
    "hot_items_topn",
    "hot_pages_topn",
    "tx_interval_join",
    "shipping_priority_topn",
    "market_by_channel",
    # the crossover twin
    "hot_items_topn_expand",
    # the dedup chain (r5 verdict item 2)
    "dedup_minhash_lsh",
    "dedup_components",
]

STEADY_RUNS = 3


def measure(spark, sf_dir: str) -> dict[str, float]:
    reg = all_queries()
    out: dict[str, float] = {}
    for name in PROBE_QUERIES:
        reg[name](spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
        samples = []
        for _ in range(STEADY_RUNS):
            t0 = time.perf_counter()
            reg[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        out[name] = round(median(samples), 3)
    return out


def main(ten_x_dir: str) -> None:
    spark = get_spark("scale-probe")
    base = measure(spark, "/root/testdata/sf0.1")
    print(json.dumps({"sf": 0.1, "steady": base}))
    big = measure(spark, ten_x_dir)
    print(json.dumps({"sf": 1.0, "steady": big}))
    print(f"\n{'query':28s} {'sf0.1':>8s} {'sf1':>8s} {'ratio':>7s}")
    for name in PROBE_QUERIES:
        r = big[name] / base[name] if base[name] else float("nan")
        print(f"{name:28s} {base[name]:8.3f} {big[name]:8.3f} {r:7.2f}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1")
