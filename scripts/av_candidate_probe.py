#!/usr/bin/env python
"""Audio/video candidate-volume probe at two corpus sizes — the
measurement behind the r13 capped pair queries (VERDICT r12 #1): the
image path's two-size table (SCALE.md r12), instantiated for the
audio windowed-energy and video temporal fingerprints.

For each modality it fingerprints the gated sf corpus, then GROWS the
corpus with novel synthetic documents (md5-derived texts — mutually
far in hash space — at VARIED lengths spanning the gate..canvas range,
so the grown corpus keeps the realistic mixture of full-canvas clips
and padding-tail clips; the padding tail is exactly where the
degenerate block-3 bucket comes from, so growth that avoided it would
measure nothing). At both sizes it records, over the SAME hashes:

* ``exhaustive``  — all-pairs n(n−1)/2 (what a blind self-join costs);
* ``cand16``      — Σ n(n−1)/2 over the shipped 4×16-bit blocks;
* ``cand16_cap``  — the capped volume (over-cap buckets contribute
  n−1 star rows, within-cap buckets enumerate);
* ``max_bucket``  — the degenerate bucket's size (corpus-bound unless
  capped).

The growth ratios are the verdict: cand16 alone tracks the degenerate
bucket's QUADRATIC (the bucket is a constant FRACTION of the corpus —
silence/static tails — unlike the image store's distribution-bound
max of 126), cand16_cap tracks ~linear. That difference is why the
audio/video pair queries now ship capped by default dial.

Usage: python scripts/av_candidate_probe.py [sf_dir] [n_extra] [cap]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

REPO = __file__.rsplit("/", 2)[0]
sys.path.insert(0, REPO)

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from flink_wsr_project_spark.operators.multimodal import (  # noqa: E402
    AUDIO_FP_MIN_CHARS,
    AUDIO_RENDER_FRAMES,
    VIDEO_FP_MIN_CHARS,
    VIDEO_FRAME_BYTES,
    VIDEO_RENDER_FRAMES,
    extract_audio_fingerprint,
    extract_video_fingerprint,
    synthesize_audio_renders,
    synthesize_video_renders,
)
from flink_wsr_project_spark.session import get_spark  # noqa: E402


def _novel_docs(n: int, min_chars: int, canvas: int) -> pd.DataFrame:
    """Novel md5-derived documents at lengths cycling gate..beyond-canvas
    (step = an eighth of the span), so the grown corpus keeps both
    full-canvas clips and padding-tail clips — the degenerate-bucket
    population grows with the corpus exactly as real silence/static
    tails would."""
    # lengths spread continuously over [gate, 1.25·canvas] via an
    # md5-derived draw — a real corpus's duration distribution has no
    # length atoms, and artificial length classes would create
    # mid-size buckets that measure the synthesizer, not the scheme
    span = canvas + canvas // 4 - min_chars
    rows = []
    for j in range(n):
        # non-periodic body: chained md5 blocks (a repeated digest would
        # make the PCM periodic at 32 chars = a whole number of
        # fingerprint windows, hashing blocks to 0xAAAA/0x5555-style
        # values — artificial buckets that measure the synthesizer)
        chunk, parts = f"avprobe-{j}", []
        while sum(len(p) for p in parts) < canvas * 2:
            chunk = hashlib.md5(chunk.encode()).hexdigest()
            parts.append(chunk)
        h = "".join(parts)
        length = min_chars + int(h[:8], 16) % span
        rows.append((2_000_000 + j, h[:length]))
    return pd.DataFrame(
        [(i, t, "en", "probe", len(t)) for i, t in rows],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )


def _volumes(spark, hashes, cap: int) -> dict:
    hashes.createOrReplaceTempView("_av_h")
    n = hashes.count()
    blocks = " UNION ALL ".join(
        f"SELECT {b} AS blk, (shiftright(h, {16 * b}) & 65535) AS bv FROM _av_h"
        for b in range(4)
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
    return {
        "n_clips": n,
        "exhaustive": n * (n - 1) // 2,
        "cand16": int(row.cand),
        "cand16_cap": int(row.cand_capped),
        "max_bucket": int(row.max_bucket),
        "n_buckets": int(row.n_buckets),
    }


def main(sf_dir: str, n_extra: int, cap: int) -> None:
    spark = get_spark("av-candidate-probe")
    out = {"dir": sf_dir, "n_extra": n_extra, "cap": cap}
    for name, synth, ext, col, min_chars, canvas in (
        (
            "audio",
            synthesize_audio_renders,
            extract_audio_fingerprint,
            "afp",
            AUDIO_FP_MIN_CHARS,
            AUDIO_RENDER_FRAMES,
        ),
        (
            "video",
            synthesize_video_renders,
            extract_video_fingerprint,
            "vfp",
            VIDEO_FP_MIN_CHARS,
            VIDEO_RENDER_FRAMES * VIDEO_FRAME_BYTES,
        ),
    ):
        tmp = f"/tmp/avprobe_{name}"
        os.makedirs(tmp, exist_ok=True)
        base = load = pd.read_parquet(f"{sf_dir}/documents.parquet")
        grown = pd.concat(
            [base, _novel_docs(n_extra, min_chars, canvas)], ignore_index=True
        )
        grown.to_parquet(f"{tmp}/documents.parquet", index=False)

        h1 = ext(synth(spark, sf_dir)).select(F.col(col).alias("h"))
        h2 = ext(synth(spark, tmp)).select(F.col(col).alias("h"))
        v1, v2 = _volumes(spark, h1, cap), _volumes(spark, h2, cap)
        ratio = v2["n_clips"] / v1["n_clips"]
        out[name] = {
            "size1": v1,
            "size2": v2,
            "growth": {
                "n": round(ratio, 3),
                "n_sq": round(ratio * ratio, 3),
                "exhaustive": round(v2["exhaustive"] / max(v1["exhaustive"], 1), 3),
                "cand16": round(v2["cand16"] / max(v1["cand16"], 1), 3),
                "cand16_cap": round(v2["cand16_cap"] / max(v1["cand16_cap"], 1), 3),
            },
        }
        del load
    print(json.dumps(out))


if __name__ == "__main__":
    main(
        sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01",
        int(sys.argv[2]) if len(sys.argv) > 2 else 400,
        int(sys.argv[3]) if len(sys.argv) > 3 else 8,
    )
