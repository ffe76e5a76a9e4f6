#!/usr/bin/env python
"""Image absorb-loop probe: per-micro-batch cost of the continuous
image-dedup loop (streaming/dedup.py::image_dedup_foreach_batch) as
the dHash block store GROWS, plus the candidate-volume scaling table
behind the r12 key-width fix (VERDICT r11 #1).

Drives N micro-batches of novel synthetic renders (md5-derived texts —
mutually far in dHash space — with one exact clone per batch so the
dup arm fires) through the foreachBatch body against a growing store,
recording per batch: seconds, decision counts, block-table file count
(the compaction dial), and the block-bucket size distribution.

At two store sizes (after the first batch and at the end) it computes
the candidate join volume Σ n·(n−1)/2 over the store's buckets under
THREE schemes on the SAME hashes:

* ``cand16``   — the shipped 4×16-bit blocks;
* ``cand8``    — the r11 4×8-bit blocks over the low 32 bits (the
  old scheme reconstructed on this corpus);
* ``cand16_cap`` — 16-bit blocks with the ``bucket_cap`` star
  collapse (over-cap buckets contribute n−1 star rows).

Growth ratios between the two snapshots are the proof: cand8 tracks
~(n2/n1)² (quadratic — the r11 scale-killer), cand16_cap tracks
~n2/n1 (linear).

Usage: python scripts/image_absorb_probe.py /root/testdata/sf0.01 10 500 [max_files_per_bucket] [bucket_cap]
       (sf_dir, n_batches, batch_size, compaction dial, skew cap)
"""

from __future__ import annotations

import hashlib
import json
import shutil
import sys
import time

REPO = __file__.rsplit("/", 2)[0]
sys.path.insert(0, REPO)

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from flink_wsr_project_spark.operators.image_dedup import (  # noqa: E402
    write_dhash_store,
)
from flink_wsr_project_spark.operators.multimodal import (  # noqa: E402
    synthesize_image_renders,
)
from flink_wsr_project_spark.session import get_spark  # noqa: E402
from flink_wsr_project_spark.sources.writers import (  # noqa: E402
    table_data_file_stats,
)
from flink_wsr_project_spark.streaming.dedup import (  # noqa: E402
    image_dedup_foreach_batch,
)

PREFIX = "imgprobe"


def _texts(batch: int, size: int, clone_of: tuple[int, int] | None):
    """(doc_id, text) rows for one batch: md5-derived texts (far apart
    in dHash space); row 0 optionally clones a previous batch's row so
    the dup_of_corpus arm fires every batch."""
    rows = []
    for j in range(size):
        src = (batch, j)
        if j == 0 and clone_of is not None:
            src = clone_of
        h = hashlib.md5(f"imgprobe-{src[0]}-{src[1]}".encode()).hexdigest() * 12
        text = " ".join(h[k * 8 : (k + 1) * 8] for k in range(48))
        rows.append((1_000_000 + batch * size + j, text))
    return rows


def _renders(spark, tmp_dir: str, rows):
    pdf = pd.DataFrame(
        [(i, t, "en", "probe", len(t)) for i, t in rows],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )
    import os

    os.makedirs(tmp_dir, exist_ok=True)
    pdf.to_parquet(f"{tmp_dir}/documents.parquet", index=False)
    return synthesize_image_renders(spark, tmp_dir)


def _cand_volumes(spark, cap: int) -> dict:
    """Candidate-volume Σ n(n−1)/2 for 16-bit, 8-bit(r11), and capped
    16-bit blockings over the store's distinct hashes, plus bucket
    stats. One scan + small aggregates."""
    h = spark.table(f"{PREFIX}_blocks").select("asset_id", "dhash").distinct()
    h.createOrReplaceTempView("_ip_h")
    out = {"n_images": h.count()}
    for name, width, nblk in (("cand16", 16, 4), ("cand8", 8, 4)):
        mask = (1 << width) - 1
        blocks = " UNION ALL ".join(
            f"SELECT {b} AS blk, (shiftright(dhash, {width * b}) & {mask}) AS bv"
            f" FROM _ip_h"
            for b in range(nblk)
        )
        row = spark.sql(
            f"""
SELECT CAST(sum(n * (n - 1) / 2) AS BIGINT) AS cand,
       max(n) AS max_bucket, count(*) AS n_buckets,
       CAST(sum(CASE WHEN n > {cap} THEN n - 1 ELSE n * (n - 1) / 2 END)
            AS BIGINT) AS cand_capped
FROM (SELECT blk, bv, count(*) AS n FROM ({blocks}) GROUP BY blk, bv)
"""
        ).first()
        out[name] = int(row.cand)
        out[f"{name}_max_bucket"] = int(row.max_bucket)
        out[f"{name}_n_buckets"] = int(row.n_buckets)
        if name == "cand16":
            out["cand16_cap"] = int(row.cand_capped)
    n = out["n_images"]
    out["exhaustive"] = n * (n - 1) // 2
    return out


def main(
    sf_dir: str,
    n_batches: int,
    batch_size: int,
    max_files_per_bucket: int | None,
    bucket_cap: int,
) -> None:
    spark = get_spark("image-absorb-probe")
    spark.sql(f"DROP TABLE IF EXISTS {PREFIX}_blocks")
    shutil.rmtree(f"spark-warehouse/{PREFIX}_blocks", ignore_errors=True)

    # seed corpus: the real documents' renders
    t0 = time.perf_counter()
    write_dhash_store(
        spark, synthesize_image_renders(spark, sf_dir), PREFIX, num_buckets=8
    )
    store_write_s = round(time.perf_counter() - t0, 3)

    counts: list[dict] = []

    def sink(decisions, batch_id):
        by = {
            r["decision"]: r["n"]
            for r in decisions.groupBy("decision").agg(F.count("*").alias("n")).collect()
        }
        counts.append(by)

    body = image_dedup_foreach_batch(
        PREFIX,
        sink,
        num_buckets=8,
        max_files_per_bucket=max_files_per_bucket,
        bucket_cap=bucket_cap,
    )

    per_batch_s: list[float] = []
    files_per_batch: list[int] = []
    snapshots: list[dict] = []
    for i in range(n_batches):
        rows = _texts(i, batch_size, clone_of=(i - 1, 1) if i > 0 else None)
        mb = _renders(spark, f"/tmp/{PREFIX}_{i}", rows).select(
            F.col("asset_id"), F.col("payload")
        )
        t0 = time.perf_counter()
        body(mb, i)
        per_batch_s.append(round(time.perf_counter() - t0, 3))
        files_per_batch.append(table_data_file_stats(spark, f"{PREFIX}_blocks")[0])
        if i in (0, n_batches - 1):
            snapshots.append({"after_batch": i, **_cand_volumes(spark, bucket_cap)})

    s0, s1 = snapshots[0], snapshots[-1]
    n_ratio = s1["n_images"] / s0["n_images"]
    out = {
        "dir": sf_dir,
        "n_batches": n_batches,
        "batch_size": batch_size,
        "max_files_per_bucket": max_files_per_bucket,
        "bucket_cap": bucket_cap,
        "store_write_s": store_write_s,
        "per_batch_s": per_batch_s,
        "first_vs_last": round(per_batch_s[-1] / per_batch_s[0], 3)
        if per_batch_s[0]
        else None,
        "block_files_after_each_batch": files_per_batch,
        "decisions_per_batch": counts,
        "snapshots": snapshots,
        "growth": {
            "n": round(n_ratio, 3),
            "n_sq": round(n_ratio * n_ratio, 3),
            "cand8": round(s1["cand8"] / max(s0["cand8"], 1), 3),
            "cand16": round(s1["cand16"] / max(s0["cand16"], 1), 3),
            "cand16_cap": round(s1["cand16_cap"] / max(s0["cand16_cap"], 1), 3),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main(
        sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01",
        int(sys.argv[2]) if len(sys.argv) > 2 else 10,
        int(sys.argv[3]) if len(sys.argv) > 3 else 500,
        int(sys.argv[4]) if len(sys.argv) > 4 else 4,
        int(sys.argv[5]) if len(sys.argv) > 5 else 8,
    )
