#!/usr/bin/env python
"""ANN drift probe: the drift → recall operating curve behind the
retrain trigger (operators/ann_index.py::should_retrain).

Builds the persisted IVF index over the real embeddings table, then
drives an absorb loop of boundary-straddling vectors (synthesized at
the midpoint direction of the two largest lists' centroids, slightly
biased toward one list with every 5th member biased past the
boundary — the classic drift shape: new mass mostly belongs to one
list, stragglers leak to a neighbor). After each absorbed batch it
records:

* ``fresh_centroid_mismatch`` — the trigger quantity (stored label vs
  would-be-retrained centroid);
* ``stored_centroid_mismatch`` — the flat health number (absorbs
  assign BY nearest persisted centroid, so this cannot move);
* recall@5 of the pruned nprobe=1 probe for the absorbed queries vs
  exact brute-force cosine over the grown corpus.

Then retrains (one Lloyd step: re-assign to fresh means + rebuild)
and records the same numbers once more. Prints ONE JSON line; the
curve lives in SCALE.md round 11.

Usage: python scripts/ann_drift_probe.py /root/testdata/sf0.01 5 20
       (sf_dir, n_batches, batch_size)
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
    should_retrain,
    write_ann_index,
)
from flink_wsr_project_spark.operators.similarity import cosine_expr  # noqa: E402
from flink_wsr_project_spark.session import get_spark  # noqa: E402
from flink_wsr_project_spark.sources.readers import load_table  # noqa: E402

PREFIX = "driftprobe"


def _recall_at_5(spark, queries) -> float:
    corpus = spark.table(f"{PREFIX}_lists").select("vec_id", "embedding")
    queries.createOrReplaceTempView("_dp_q")
    corpus.createOrReplaceTempView("_dp_c")
    exact = spark.sql(
        f"""
SELECT query_id, neighbor_id FROM (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         row_number() OVER (PARTITION BY q.query_id
           ORDER BY {cosine_expr('q.qv', 'e.embedding', 'spark')} DESC, e.vec_id
         ) AS rank
  FROM _dp_q q JOIN _dp_c e ON e.vec_id <> q.query_id
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


def main(sf_dir: str, n_batches: int, batch_size: int) -> None:
    spark = get_spark("ann-drift-probe")
    for t in (f"{PREFIX}_centroids", f"{PREFIX}_lists"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)

    emb = load_table(spark, "embeddings", sf_dir)
    write_ann_index(spark, emb, PREFIX, partition_lists=True)

    # midpoint direction of the two largest lists' centroids — where a
    # boundary-straddling cluster actually straddles
    sizes = {
        r.label: r.n
        for r in spark.table(f"{PREFIX}_lists").groupBy("label").agg(
            F.count("*").alias("n")
        ).collect()
    }
    big = sorted(sizes, key=lambda lb: (-sizes[lb], lb))[:2]
    cents = {
        r.label: [float(x) for x in r.cv]
        for r in spark.table(f"{PREFIX}_centroids").where(
            F.col("label").isin([int(b) for b in big])
        ).collect()
    }
    ca, cb = cents[big[0]], cents[big[1]]
    d = len(ca)

    def member(i: int) -> list[float]:
        # biased toward list A; every 5th member biased past the
        # boundary toward B; tiny per-member jitter keeps rows distinct
        wa = 0.96 if i % 5 == 0 else 1.04
        v = [wa * a + b for a, b in zip(ca, cb)]
        v[(i * 7) % d] += 0.01 * (i % 11 + 1)
        return v

    d_base = measure_index_drift(spark, PREFIX)
    checkpoints = [
        {
            "absorbed": 0,
            "fresh_mismatch": round(d_base["fresh_centroid_mismatch"], 4),
            "stored_mismatch": round(d_base["stored_centroid_mismatch"], 4),
            "recall_at_5": None,  # no drift queries exist yet
        }
    ]
    base_id = 9_000_000
    all_members: list[tuple[int, list[float]]] = []
    for bi in range(n_batches):
        batch = [
            (base_id + bi * batch_size + j, member(bi * batch_size + j))
            for j in range(batch_size)
        ]
        all_members.extend(batch)
        bdf = spark.createDataFrame(batch, "vec_id long, embedding array<float>")
        absorb_vectors_into_index(spark, bdf, PREFIX)
        drift = measure_index_drift(spark, PREFIX)
        queries = spark.createDataFrame(
            all_members, "vec_id long, embedding array<float>"
        ).selectExpr("vec_id AS query_id", "embedding AS qv")
        checkpoints.append(
            {
                "absorbed": len(all_members),
                "fresh_mismatch": round(drift["fresh_centroid_mismatch"], 4),
                "stored_mismatch": round(drift["stored_centroid_mismatch"], 4),
                "recall_at_5": _recall_at_5(spark, queries),
            }
        )

    fire = should_retrain(spark, PREFIX, max_fresh_mismatch=0.02)
    post = retrain_ann_index(spark, PREFIX)
    queries = spark.createDataFrame(
        all_members, "vec_id long, embedding array<float>"
    ).selectExpr("vec_id AS query_id", "embedding AS qv")
    out = {
        "dir": sf_dir,
        "corpus_rows": emb.count(),
        "lists": len(sizes),
        "cluster_lists": [int(b) for b in big],
        "checkpoints": checkpoints,
        "trigger_fired_at_0.02": fire,
        "post_retrain": {
            "fresh_mismatch": round(post["fresh_centroid_mismatch"], 4),
            "stored_mismatch": round(post["stored_centroid_mismatch"], 4),
            "recall_at_5": _recall_at_5(spark, queries),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main(
        sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01",
        int(sys.argv[2]) if len(sys.argv) > 2 else 5,
        int(sys.argv[3]) if len(sys.argv) > 3 else 20,
    )
