#!/usr/bin/env python
"""Bucketed-join probe: measure the Write-path claim ("bucketing the
fact tables on their join keys removes the dominant shuffle") on the
10× dataset instead of asserting it from the plan.

The claim concerns the 100 TB regime where NEITHER side broadcasts, so
the probe disables autoBroadcastJoinThreshold for both measurements
(at sf1 the 2-column orders projection is ~24 MB and would broadcast
under the session's 64 MB threshold — a regime that disappears at real
scale). It then times the orders⋈lineitem equi-join (tx_interval_join's
shape) over plain parquet (sort-merge join, both sides shuffle) vs
bucketed-on-orderkey tables (sort-merge join, ZERO shuffles) and
verifies the exchange counts it is claiming to remove. Bucketed tables
live in the session's in-memory catalog — creation is part of the run.

Usage: python scripts/bucketed_join_probe.py [ten_x_dir]
"""

from __future__ import annotations

import os
import sys
import time
from statistics import median

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from flink_wsr_project_spark.session import get_spark  # noqa: E402
from flink_wsr_project_spark.sources.readers import load_table  # noqa: E402
from flink_wsr_project_spark.sources.writers import write_bucketed  # noqa: E402

STEADY_RUNS = 3
BUCKETS = 32


def _join(orders, li):
    j = orders.join(li, orders.o_orderkey == li.l_orderkey).filter(
        (F.col("l_shipdate") >= F.col("o_orderdate"))
        & (F.col("l_shipdate") <= F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
    )
    return j.select("o_orderkey", "l_linenumber", "o_orderdate", "l_shipdate")


def _measure(df) -> float:
    df.write.format("noop").mode("overwrite").save()  # warm
    s = []
    for _ in range(STEADY_RUNS):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        s.append(time.perf_counter() - t0)
    return round(median(s), 3)


def _shuffles(df) -> int:
    return (
        df._jdf.queryExecution()
        .executedPlan()
        .toString()
        .count("Exchange hashpartitioning")
    )


def main(ten_x_dir: str) -> None:
    spark = get_spark("bucket-probe")
    # the 100 TB regime: no side fits a broadcast
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    orders = load_table(spark, "orders", ten_x_dir)
    li = load_table(spark, "lineitem", ten_x_dir)

    plain = _join(orders, li)
    t_plain = _measure(plain)
    x_plain = _shuffles(plain)

    # idempotence: a previous run's managed-table location survives the
    # in-memory catalog, so clear both (DROP is a no-op catalog-side)
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("probe_orders_b", "probe_lineitem_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(os.path.join(warehouse, t), ignore_errors=True)

    write_bucketed(orders, "probe_orders_b", ["o_orderkey"], BUCKETS,
                   sort_cols=["o_orderkey"])
    write_bucketed(li, "probe_lineitem_b", ["l_orderkey"], BUCKETS,
                   sort_cols=["l_orderkey"])
    bucketed = _join(spark.table("probe_orders_b"), spark.table("probe_lineitem_b"))
    t_bucketed = _measure(bucketed)
    x_bucketed = _shuffles(bucketed)

    print(f"plain:    steady {t_plain:6.3f}s  shuffle exchanges {x_plain}")
    print(f"bucketed: steady {t_bucketed:6.3f}s  shuffle exchanges {x_bucketed}")
    print(f"speedup:  {t_plain / t_bucketed:0.2f}x")
    assert x_plain >= 2 and x_bucketed == 0, (x_plain, x_bucketed)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1")
