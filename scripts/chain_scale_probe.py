#!/usr/bin/env python
"""Composed dedup-chain scale probe (the SCALE.md measurement rounds
7-8 owed): run the four chain consumers — dedup_keep_list,
dedup_components, dedup_keep_best, curation_funnel — on the clone
corpus from gen_scale_probe.py and report steady medians, under the
bucket cap currently in force.

The r6 measurement covered only the STANDALONE capped-pairs query
(uncapped 20.66 s / capped 8.87 s on the 10x clone corpus); the chain
— the query a real curation run executes — was never measured. The
cap is baked into the SQL at module import (``_LSH_BUCKET_CAP``
interpolates ``SPARK_GRAFT_LSH_BUCKET_CAP``), so one process measures
ONE cap setting; compare configurations by invoking this script twice:

    python scripts/gen_scale_probe.py /tmp/spark_graft_sf1 10
    SPARK_GRAFT_LSH_BUCKET_CAP=2 python scripts/chain_scale_probe.py /tmp/spark_graft_sf1
    SPARK_GRAFT_LSH_BUCKET_CAP=1000000000 python scripts/chain_scale_probe.py /tmp/spark_graft_sf1

(cap=10^9 >= any bucket => pure within-cap pairs = the pre-r7
uncapped chain; cap=2 on the clone corpus => every bucket over-cap =>
pure star-collapse + verify.) Prints one JSON line:
{"dir": ..., "cap": N, "steady": {q: sec}, "rows": {q: n}}.
"""

from __future__ import annotations

import json
import os
import sys
import time
from statistics import median

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from flink_wsr_project_spark.plans import pipeline_queries  # noqa: E402
from flink_wsr_project_spark.plans.registry import all_queries  # noqa: E402
from flink_wsr_project_spark.session import get_spark  # noqa: E402

CHAIN = [
    "dedup_keep_list",
    "dedup_components",
    "dedup_keep_best",
    "curation_funnel",
]

STEADY_RUNS = 3


def main(probe_dir: str) -> None:
    spark = get_spark("chain-scale-probe")
    reg = all_queries()
    steady: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name in CHAIN:
        rows[name] = reg[name](spark, probe_dir).count()  # warm + row count
        samples = []
        for _ in range(STEADY_RUNS):
            t0 = time.perf_counter()
            reg[name](spark, probe_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        steady[name] = round(median(samples), 3)
    print(
        json.dumps(
            {
                "dir": probe_dir,
                "cap": pipeline_queries._LSH_BUCKET_CAP,
                "steady": steady,
                "rows": rows,
            }
        )
    )


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1")
