#!/usr/bin/env python
"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Queries are fully materialized through the noop sink (no driver-side
collect; measures scan → shuffle → agg end to end).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from statistics import median

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from flink_wsr_project_spark.plans.registry import all_queries  # noqa: E402
from flink_wsr_project_spark.session import get_spark  # noqa: E402

# Headline set: one per operator family (sliding topN, tumble agg,
# distinct, sequence, joins, star-schema, pipeline).
HEADLINE = [
    "hot_items_topn",
    "hot_pages_topn",
    "pv_hourly",
    "uv_hourly",
    "market_by_channel",
    "login_fail_detect",
    "order_timeout",
    "tx_interval_join",
    "tx_reconcile",
    "pricing_summary",
    "shipping_priority_topn",
    "nation_volume",
    "top_customers_per_nation",
    "dedup_exact",
    "doc_token_count",
    "doc_quality_score",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark("bench")

    registry = all_queries()
    names = [n for n in HEADLINE if n in registry]

    # warm the JVM + parquet footer caches once (excluded from timing)
    registry["pv_hourly"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        registry[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    # Steady-state passes (plans/codegen already compiled). The
    # headline metric stays the first-run pass for round-over-round
    # continuity; the steady numbers isolate execution cost from the
    # one-time JIT/compile overhead that dominates small-SF first runs
    # (and is amortized to nothing in any real job). r4 verdict: one
    # steady run per query made jitter indistinguishable from
    # regression — run ≥3 and report the per-query MEDIAN, with the
    # run count recorded so the JSON is self-describing.
    # default 3 (the decision-grade minimum); an explicit override is
    # respected as given — a developer asking for 1 debugging pass gets 1
    steady_runs = max(1, int(os.environ.get("SPARK_GRAFT_STEADY_RUNS", "3")))
    samples: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(steady_runs):
        for name in names:
            t0 = time.perf_counter()
            registry[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples[name].append(time.perf_counter() - t0)

    steady = {n: round(median(v), 3) for n, v in samples.items()}

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "steady_total": round(sum(steady.values()), 3),
                "queries_steady": steady,
                "steady_runs": steady_runs,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
