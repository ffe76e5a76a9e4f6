#!/usr/bin/env python
"""Generate a 10×-sf0.1 (sf1-equivalent) dataset for the scale probe.

SCALE.md's "survives 100 TB" statements are plan-shape arguments; this
script manufactures the data to test the one that makes a falsifiable
prediction at reachable scale (two-stage vs single-expand sliding
windows, SCALE.md §Windowed aggregation): every FACT table is
replicated 10× deterministically (no RNG — the probe must be
reproducible) while dimension tables stay 1×, giving ~6M lineitem /
1M events / 50k documents.

Replication semantics, chosen to preserve each query's scaling
regime:

* events: event_id' = event_id*10 + i (unique), ts' = ts + i seconds
  (≤9 s — window/bucket structure intact), user_id/event_type
  UNCHANGED. Rows grow 10× while the (key, window) group count stays
  ~fixed — exactly the asymmetry the two-stage crossover argument
  rests on.
* orders/lineitem: orderkey' = orderkey*10 + i on BOTH tables, so the
  order↔lineitem join fans out 10×10-consistently (10× rows AND 10×
  join groups — ordinary TPC-H scaling).
* documents/embeddings: id' = id*10 + i, payload unchanged — every
  doc becomes a 10-clone near-dup cluster, a deliberate stress for
  the LSH bucket-join and the label-propagation loop.

Usage: python scripts/gen_scale_probe.py [out_dir] [copies]   (default
/tmp/spark_graft_sf1, 10 copies). Idempotent: existing tables are
overwritten.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from flink_wsr_project_spark.session import get_spark  # noqa: E402
from flink_wsr_project_spark.sources.readers import load_table  # noqa: E402

SRC = "/root/testdata/sf0.1"
COPIES = 10

DIMS = ["region", "nation", "customer", "supplier", "part"]


def _replicate(df, id_exprs: dict[str, str], ts_jitter: list[str] = ()):
    """Cross the frame with i∈[0,COPIES) and rewrite keys/timestamps.

    Note: ts jitter is +i seconds, so with copies>60 jittered rows can
    cross minute-bucket boundaries — fine for the dedup-chain probes
    (documents/embeddings carry no windows), but re-check the window
    queries' group-count argument before trusting an events probe at
    copies>10.
    """
    out = df.crossJoin(F.broadcast(
        df.sparkSession.range(COPIES).select(F.col("id").alias("_i"))
    ))
    for col, expr in id_exprs.items():
        out = out.withColumn(col, F.expr(expr))
    for col in ts_jitter:
        out = out.withColumn(
            col, F.col(col) + F.make_interval(secs=F.col("_i").cast("int"))
        )
    return out.drop("_i").select(df.columns)


def main(out_dir: str, copies: int = COPIES) -> None:
    global COPIES
    COPIES = copies
    spark = get_spark("scale-probe-gen")
    os.makedirs(out_dir, exist_ok=True)

    for t in DIMS:
        load_table(spark, t, SRC).write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")

    ev = load_table(spark, "events", SRC)
    _replicate(
        ev, {"event_id": f"event_id * {copies} + _i"}, ts_jitter=["ts"]
    ).write.mode("overwrite").parquet(f"{out_dir}/events.parquet")

    orders = load_table(spark, "orders", SRC)
    _replicate(orders, {"o_orderkey": f"o_orderkey * {copies} + _i"}).write.mode(
        "overwrite"
    ).parquet(f"{out_dir}/orders.parquet")

    li = load_table(spark, "lineitem", SRC)
    _replicate(li, {"l_orderkey": f"l_orderkey * {copies} + _i"}).write.mode(
        "overwrite"
    ).parquet(f"{out_dir}/lineitem.parquet")

    docs = load_table(spark, "documents", SRC)
    _replicate(docs, {"doc_id": f"doc_id * {copies} + _i"}).write.mode(
        "overwrite"
    ).parquet(f"{out_dir}/documents.parquet")

    emb = load_table(spark, "embeddings", SRC)
    _replicate(emb, {"vec_id": f"vec_id * {copies} + _i"}).write.mode(
        "overwrite"
    ).parquet(f"{out_dir}/embeddings.parquet")

    for t in [*DIMS, "events", "orders", "lineitem", "documents", "embeddings"]:
        n = spark.read.parquet(f"{out_dir}/{t}.parquet").count()
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main(
        sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1",
        int(sys.argv[2]) if len(sys.argv) > 2 else COPIES,
    )
