#!/usr/bin/env python
"""Sustained-absorb retrain sawtooth on the QUANTIZED index (VERDICT
r12 #6): the in-loop retrain (streaming/similarity.py::
ann_ingest_foreach_batch with max_fresh_mismatch + retrain_source_fn)
runs ONE Lloyd step per trigger — unlike the build's
iterate-to-fixed-point pass — so the open question is whether the
mismatch SAWTOOTH under continuous drift injection ratchets upward
(one step per trigger cannot keep up → recall decays) or stays
bounded (each trigger collapses the accumulated drift → recall holds).

Drives ``n_batches`` (default 20) absorb batches of boundary-
straddling vectors (the ann_drift_probe cluster shape) through the
exact operator sequence the foreachBatch body runs per micro-batch:
absorb → measure drift → retrain if mismatch > dial (source = the
CURRENT float corpus, as retrain_source_fn hands it). Records per
batch: fresh mismatch BEFORE any retrain, whether the trigger fired,
mismatch AFTER the retrain when it did, and (every ``recall_every``
batches and after every retrain) recall@5 of the pruned quantized
nprobe=1 probe for ALL absorbed queries vs exact FLOAT brute force
over the grown corpus.

Prints ONE JSON line; the curve lives in SCALE.md round 13.

Usage: python scripts/ann_retrain_sawtooth_probe.py \
           [sf_dir] [n_batches] [batch_size] [dial] [recall_every]
"""

from __future__ import annotations

import json
import shutil
import sys

REPO = __file__.rsplit("/", 2)[0]
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from flink_wsr_project_spark.operators.ann_index import (  # noqa: E402
    absorb_vectors_into_index,
    ann_topk_from_index_pruned,
    measure_index_drift,
    retrain_ann_index,
    write_ann_index,
)
from flink_wsr_project_spark.operators.similarity import cosine_expr  # noqa: E402
from flink_wsr_project_spark.session import get_spark  # noqa: E402
from flink_wsr_project_spark.sources.readers import load_table  # noqa: E402

PREFIX = "sawprobe"


def _recall_at_5(spark, queries, source) -> float:
    """Pruned quantized nprobe=1 probe vs exact FLOAT brute force over
    the current float corpus (the recall a user of the quantized index
    experiences before any rerank stage)."""
    queries.createOrReplaceTempView("_sp_q")
    source.createOrReplaceTempView("_sp_c")
    exact = spark.sql(
        f"""
SELECT query_id, neighbor_id FROM (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         row_number() OVER (PARTITION BY q.query_id
           ORDER BY {cosine_expr('q.qv', 'e.embedding', 'spark')} DESC, e.vec_id
         ) AS rank
  FROM _sp_q q JOIN _sp_c e ON e.vec_id <> q.query_id
) WHERE rank <= 5"""
    )
    truth: dict = {}
    for r in exact.collect():
        truth.setdefault(r.query_id, set()).add(r.neighbor_id)
    got: dict = {}
    for r in ann_topk_from_index_pruned(spark, queries, PREFIX, k=5).collect():
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(len(got.get(q, set()) & t) for q, t in truth.items())
    total = sum(len(t) for t in truth.values())
    return round(hits / total, 4) if total else 1.0


def main(
    sf_dir: str,
    n_batches: int,
    batch_size: int,
    dial: float,
    recall_every: int,
    moving: bool = False,
    settle: int = 0,
) -> None:
    spark = get_spark("ann-retrain-sawtooth")
    for t in (f"{PREFIX}_centroids", f"{PREFIX}_lists", f"{PREFIX}_retrain_src"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)

    emb = load_table(spark, "embeddings", sf_dir)
    write_ann_index(spark, emb, PREFIX, partition_lists=True, quantize=True)

    sizes = {
        r.label: r.n
        for r in spark.table(f"{PREFIX}_lists")
        .groupBy("label")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    big = sorted(sizes, key=lambda lb: (-sizes[lb], lb))[:2]
    cents = {
        r.label: [float(x) for x in r.cv]
        for r in spark.table(f"{PREFIX}_centroids")
        .where(F.col("label").isin([int(b) for b in big]))
        .collect()
    }
    ca, cb = cents[big[0]], cents[big[1]]
    d = len(ca)

    def member(i: int, batch: int) -> list[float]:
        wa = 0.96 if i % 5 == 0 else 1.04
        if moving:
            # the cluster CENTER ITSELF migrates from near-A to near-B
            # across the run (one Lloyd step per trigger must keep
            # chasing it — the regime where a stationary cluster's
            # single tooth is not representative)
            t = batch / max(n_batches - 1, 1)
            wa *= 1.5 - t
        v = [wa * a + b for a, b in zip(ca, cb)]
        v[(i * 7) % d] += 0.01 * (i % 11 + 1)
        return v

    base_id = 9_000_000
    all_members: list[tuple[int, list[float]]] = []
    source = emb.select("vec_id", "embedding")  # the growing float corpus
    ticks = []
    n_retrains = 0
    # ``settle`` extra batches run AFTER the trajectory with the
    # cluster center FROZEN at its final position — the frames that
    # show whether consecutive dial-triggered steps converge after a
    # sharp shift (the cadence-coupled iteration the one-step-per-
    # trigger design relies on)
    for bi in range(n_batches + settle):
        traj = min(bi, n_batches - 1)
        batch = [
            (base_id + bi * batch_size + j, member(bi * batch_size + j, traj))
            for j in range(batch_size)
        ]
        all_members.extend(batch)
        bdf = spark.createDataFrame(batch, "vec_id long, embedding array<float>")
        # the foreachBatch sequence: absorb (idempotent), grow source,
        # measure, retrain on trigger with the CURRENT corpus
        absorb_vectors_into_index(spark, bdf, PREFIX, exclude_existing=True)
        source = source.unionByName(
            bdf.select("vec_id", F.col("embedding").cast("array<float>"))
        ).localCheckpoint()
        pre = measure_index_drift(spark, PREFIX)["fresh_centroid_mismatch"]
        tick = {"batch": bi + 1, "absorbed": len(all_members),
                "mismatch": round(pre, 4), "retrained": False}
        if pre > dial:
            post = retrain_ann_index(spark, PREFIX, source=source)
            n_retrains += 1
            tick["retrained"] = True
            tick["mismatch_after"] = round(post["fresh_centroid_mismatch"], 4)
        if (
            tick["retrained"]
            or (bi + 1) % recall_every == 0
            or bi >= n_batches - 1
        ):
            queries = spark.createDataFrame(
                all_members, "vec_id long, embedding array<float>"
            ).selectExpr("vec_id AS query_id", "embedding AS qv")
            tick["recall_at_5"] = _recall_at_5(spark, queries, source)
        ticks.append(tick)

    peak = max(t["mismatch"] for t in ticks)
    floor_after = [t.get("mismatch_after") for t in ticks if t["retrained"]]
    recalls = [t["recall_at_5"] for t in ticks if "recall_at_5" in t]
    out = {
        "dir": sf_dir,
        "corpus_rows": emb.count(),
        "n_batches": n_batches,
        "batch_size": batch_size,
        "dial": dial,
        "moving": moving,
        "n_retrains": n_retrains,
        "ticks": ticks,
        "peak_mismatch": round(peak, 4),
        "post_retrain_floors": floor_after,
        "min_recall": min(recalls) if recalls else None,
        "final_recall": recalls[-1] if recalls else None,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main(
        sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01",
        int(sys.argv[2]) if len(sys.argv) > 2 else 20,
        int(sys.argv[3]) if len(sys.argv) > 3 else 20,
        float(sys.argv[4]) if len(sys.argv) > 4 else 0.03,
        int(sys.argv[5]) if len(sys.argv) > 5 else 4,
        len(sys.argv) > 6 and sys.argv[6] == "moving",
        int(sys.argv[7]) if len(sys.argv) > 7 else 0,
    )
