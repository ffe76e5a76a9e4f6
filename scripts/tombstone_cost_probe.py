#!/usr/bin/env python
"""Probe-time tombstone cost (VERDICT r12 #3 done-criteria): what a
deployed store pays per probe for the deletion mask. The anti-join
broadcasts the deleted-id set, so the expected cost model is one
broadcast build (|tombstones| rows) plus one hash lookup per store row
scanned — flat in corpus size, linear in deletions only through the
(tiny) broadcast build.

Measures the signature store and the dHash block store at sf0.01:
batch-probe wall seconds with 0 / 100 / 10,000 tombstoned ids (ids
beyond the live corpus — the mask must be paid whether or not the ids
match), 3 timed runs each after a warm-up. Prints ONE JSON line; the
numbers live in SCALE.md round 13.

Usage: python scripts/tombstone_cost_probe.py [sf_dir]
"""

from __future__ import annotations

import json
import shutil
import sys
import time

REPO = __file__.rsplit("/", 2)[0]
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from flink_wsr_project_spark.operators.image_dedup import (  # noqa: E402
    image_dedup_from_store,
    write_dhash_store,
)
from flink_wsr_project_spark.operators.incremental_dedup import (  # noqa: E402
    dedup_incremental_from_store,
    write_signature_store,
)
from flink_wsr_project_spark.operators.multimodal import (  # noqa: E402
    synthesize_image_renders,
)
from flink_wsr_project_spark.operators.tombstones import (  # noqa: E402
    add_tombstones,
    clear_tombstones,
)
from flink_wsr_project_spark.session import get_spark  # noqa: E402
from flink_wsr_project_spark.sources.readers import load_table  # noqa: E402


def _timed(fn, runs: int = 3) -> float:
    fn()  # warm-up
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return round(sorted(ts)[len(ts) // 2], 3)  # median


def main(sf_dir: str) -> None:
    spark = get_spark("tombstone-cost-probe")
    out = {"dir": sf_dir}

    # --- signature store ---
    for t in ("tcost_longsigs", "tcost_hashed", "tcost_tombstones"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    docs = load_table(spark, "documents", sf_dir)
    corpus = docs.where("doc_id % 3 != 2")
    batch = docs.where("doc_id % 3 = 2")
    write_signature_store(spark, corpus, "tcost", num_buckets=8)

    def probe_sig():
        dedup_incremental_from_store(spark, batch, "tcost").count()

    sig = {"t0": _timed(probe_sig)}
    for n in (100, 10_000):
        clear_tombstones(spark, "tcost")
        ids = spark.range(5_000_000, 5_000_000 + n).selectExpr("id AS doc_id")
        add_tombstones(spark, "tcost", ids, "doc_id")
        sig[f"t{n}"] = _timed(probe_sig)
    out["signature_store_probe_s"] = sig

    # --- dHash block store ---
    for t in ("bcost_blocks", "bcost_tombstones"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    renders = synthesize_image_renders(spark, sf_dir)
    write_dhash_store(spark, renders.where("asset_id % 3 != 2"), "bcost", 8)
    img_batch = renders.where("asset_id % 3 = 2")

    def probe_blk():
        image_dedup_from_store(spark, img_batch, "bcost", bucket_cap=8).count()

    blk = {"t0": _timed(probe_blk)}
    for n in (100, 10_000):
        clear_tombstones(spark, "bcost")
        ids = spark.range(5_000_000, 5_000_000 + n).selectExpr("id AS asset_id")
        add_tombstones(spark, "bcost", ids, "asset_id")
        blk[f"t{n}"] = _timed(probe_blk)
    out["block_store_probe_s"] = blk

    print(json.dumps(out))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
