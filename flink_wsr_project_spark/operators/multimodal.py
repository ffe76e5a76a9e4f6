"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched Pandas UDFs
over ``mapInPandas``.

The container has no image/audio codecs, so the DECODE step is a
clearly-marked stub (``decode_media`` raises NotImplementedError; the
default feature extractor uses a deterministic fake instead). What IS
real and tested: the schema, the binary payload handling, the
mapInPandas batch shape (pandas DataFrames in/out, Arrow transfer),
and the partition-parallel execution — i.e. everything Spark-side that
a production decode would plug into.

At 100 TB: payloads stay in executor memory one Arrow batch at a time
(``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch bytes);
nothing is collected to the driver; feature extraction is
embarrassingly parallel over input partitions (no shuffle at all).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

MEDIA_KINDS = ("image", "audio", "video")
_MIME = {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}

FEATURE_SCHEMA = (
    "asset_id long, kind string, n_bytes long, payload_md5 string, "
    "thumb_w int, thumb_h int, n_frames_sampled int, decode_status string"
)


def decode_media(payload: bytes, kind: str):
    """STUB — real deployments plug a codec here (PIL/ffmpeg/soundfile).

    Not available in this container; the feature extractor catches this
    and falls back to the deterministic fake path.
    """
    raise NotImplementedError(
        f"media decode for kind={kind!r} requires codec libraries not present in this build"
    )


def synthesize_media_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fake media table derived from ``documents``:
    payload = utf-8 bytes of the text, kind round-robins by doc_id.
    Exercises BinaryType end to end with oracle-checkable metadata."""
    from flink_wsr_project_spark.sources.readers import load_table

    docs = load_table(spark, "documents", sf_dir)
    kind = F.element_at(F.array(*[F.lit(k) for k in MEDIA_KINDS]), (F.col("doc_id") % 3 + 1).cast("int"))
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        kind.alias("_k"),
        (F.col("n_chars") % 1920).cast("int").alias("width"),
        (F.col("n_chars") % 1080).cast("int").alias("height"),
        (F.col("n_chars") * 40).cast("long").alias("duration_ms"),
    ).withColumn("mime", F.element_at(
        F.create_map(*[x for k in MEDIA_KINDS for x in (F.lit(k), F.lit(_MIME[k]))]), F.col("_k")
    )).drop("_k")


def extract_features(assets: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Decode is attempted through :func:`decode_media` (stub) and falls
    back to deterministic fake features (payload md5, byte length,
    fixed thumbnail geometry, 1 frame/sec sampling plan) so the full
    Arrow batch path runs and is verifiable.
    """

    # NOTE: the closure must be self-contained (no references to this
    # module) — Spark's Python workers unpickle it in processes that may
    # not have the package on PYTHONPATH (the driver harness imports us
    # by path). Imports happen inside; the decode stub is local.
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import pandas as pd

        def _decode_stub(payload, kind):
            raise NotImplementedError("media codecs not present in this build")

        for pdf in it:
            out = {
                "asset_id": pdf["asset_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
                "payload_md5": pdf["payload"].map(
                    lambda b: _hashlib.md5(b).hexdigest() if b is not None else None
                ),
            }
            status = []
            for k, p in zip(pdf["kind"], pdf["payload"]):
                try:
                    _decode_stub(p, k)
                    status.append("decoded")
                except NotImplementedError:
                    status.append("stub")
            out["thumb_w"] = (pdf["width"].fillna(0).astype(int).clip(upper=256)).astype("int32")
            out["thumb_h"] = (pdf["height"].fillna(0).astype(int).clip(upper=256)).astype("int32")
            out["n_frames_sampled"] = (
                (pdf["duration_ms"].fillna(0) // 1000).clip(lower=1).astype("int32")
            )
            out["decode_status"] = status
            yield pd.DataFrame(out)[
                [
                    "asset_id",
                    "kind",
                    "n_bytes",
                    "payload_md5",
                    "thumb_w",
                    "thumb_h",
                    "n_frames_sampled",
                    "decode_status",
                ]
            ]

    return assets.mapInPandas(batches, FEATURE_SCHEMA)
