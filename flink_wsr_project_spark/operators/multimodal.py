"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched Pandas UDFs
over ``mapInPandas``.

Decode is PROBE-BASED per modality:

* **audio** — REAL decode via the stdlib ``wave`` codec. The synthetic
  assets carry genuine RIFF/WAVE payloads (44-byte header + 8-bit mono
  PCM), constructed JVM-side from constants + ``doc_id``, so the
  decode path parses actual bytes and its outputs (frame count, sample
  rate → sampling plan) are oracle-checked exactly.
* **image / video** — probe PIL / PyAV / cv2 and fall back to a
  clearly-marked ``NotImplementedError`` when absent (this container
  ships no image/video codecs). The Spark-side plumbing — schema,
  binary payloads, Arrow batch shape, partition-parallel execution —
  is identical to the audio path and therefore fully exercised.

At 100 TB: payloads stay in executor memory one Arrow batch at a time
(``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch bytes);
nothing is collected to the driver; feature extraction is
embarrassingly parallel over input partitions (no shuffle at all).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

MEDIA_KINDS = ("image", "audio", "video")
_MIME = {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}

# Synthetic WAV geometry: 8-bit mono PCM, 8 kHz, 128 frames (16 ms).
WAV_RATE = 8000
WAV_FRAMES = 128
_WAV_HEADER = (
    b"RIFF"
    + struct.pack("<I", 36 + WAV_FRAMES)
    + b"WAVE"
    + b"fmt "
    + struct.pack("<IHHIIHH", 16, 1, 1, WAV_RATE, WAV_RATE, 1, 8)
    + b"data"
    + struct.pack("<I", WAV_FRAMES)
)
WAV_HEADER_HEX = _WAV_HEADER.hex().upper()
WAV_PCM_BYTES = 128  # PCM body: doc_id zero-padded to 128 ASCII bytes

FEATURE_SCHEMA = (
    "asset_id long, kind string, n_bytes long, payload_md5 string, "
    "thumb_w int, thumb_h int, n_frames_sampled int, decode_status string"
)


def decode_media(payload: bytes, kind: str) -> dict:
    """Probe-based decode. Audio is REAL (stdlib ``wave``); image and
    video raise ``NotImplementedError`` unless a codec library (PIL /
    av / cv2) is importable — none are present in this build, and the
    caller treats that as the documented stub path.
    """
    if kind == "audio":
        import io
        import wave

        with wave.open(io.BytesIO(payload)) as w:
            n, rate = w.getnframes(), w.getframerate()
            return {
                "channels": w.getnchannels(),
                "sample_rate": rate,
                "n_frames": n,
                "duration_ms": int(n * 1000 / rate),
            }
    if kind == "image":
        try:
            from PIL import Image  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "image decode requires PIL, not present in this build"
            ) from e
        import io

        from PIL import Image

        im = Image.open(io.BytesIO(payload))
        return {"width": im.width, "height": im.height, "mode": im.mode}
    if kind == "video":
        try:
            import av  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "video decode requires PyAV/ffmpeg, not present in this build"
            ) from e
        raise NotImplementedError("video decode path not wired")
    raise ValueError(f"unknown media kind {kind!r}")


def synthesize_media_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fake media table derived from ``documents``: kind
    round-robins by doc_id; AUDIO payloads are real 172-byte WAV files
    (constant header + doc_id-derived PCM — built with JVM expressions,
    no UDF), image/video payloads are utf-8 bytes of the text.
    Exercises BinaryType end to end with oracle-checkable metadata."""
    from flink_wsr_project_spark.sources.readers import load_table

    docs = load_table(spark, "documents", sf_dir)
    kind = F.element_at(
        F.array(*[F.lit(k) for k in MEDIA_KINDS]), (F.col("doc_id") % 3 + 1).cast("int")
    )
    wav_payload = F.concat(
        F.unhex(F.lit(WAV_HEADER_HEX)),
        F.encode(F.rpad(F.col("doc_id").cast("string"), WAV_PCM_BYTES, "0"), "UTF-8"),
    )
    payload = F.when(kind == "audio", wav_payload).otherwise(
        F.encode(F.col("text"), "UTF-8")
    )
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        kind.alias("_k"),
        (F.col("n_chars") % 1920).cast("int").alias("width"),
        (F.col("n_chars") % 1080).cast("int").alias("height"),
        (F.col("n_chars") * 40).cast("long").alias("duration_ms"),
    ).withColumn("mime", F.element_at(
        F.create_map(*[x for k in MEDIA_KINDS for x in (F.lit(k), F.lit(_MIME[k]))]), F.col("_k")
    )).drop("_k")


def extract_features(assets: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Audio payloads are decoded for real (``wave``): the sampling plan
    (1 frame per started second of DECODED duration) and
    ``decode_status='decoded'`` come from parsing actual bytes.
    Image/video probe their codecs and fall back to metadata-derived
    fake features with ``decode_status='stub'`` — so the full Arrow
    batch path runs for every modality and stays verifiable.

    ``payload_md5`` is the md5 of the UPPERCASE HEX of the payload
    (not of the raw bytes) so the same fingerprint is expressible in
    engines whose md5 only accepts strings (DuckDB).
    """

    # NOTE: the closure must be self-contained (no references to this
    # module) — Spark's Python workers unpickle it in processes that may
    # not have the package on PYTHONPATH (the driver harness imports us
    # by path). Imports happen inside; the probes are local.
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib
        import io as _io
        import wave as _wave

        import pandas as pd

        def _decode(payload, kind):
            """Returns decoded duration_ms, raising when no codec."""
            if kind == "audio":
                with _wave.open(_io.BytesIO(bytes(payload))) as w:
                    return int(w.getnframes() * 1000 / w.getframerate())
            if kind == "image":
                from PIL import Image  # ImportError -> stub path

                Image.open(_io.BytesIO(bytes(payload)))
                return 0
            raise NotImplementedError(f"no codec for kind={kind!r}")

        for pdf in it:
            out = {
                "asset_id": pdf["asset_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
                "payload_md5": pdf["payload"].map(
                    lambda b: _hashlib.md5(bytes(b).hex().upper().encode()).hexdigest()
                    if b is not None
                    else None
                ),
            }
            status, frames = [], []
            for k, p, meta_ms in zip(pdf["kind"], pdf["payload"], pdf["duration_ms"]):
                try:
                    ms = _decode(p, k)
                    status.append("decoded")
                    frames.append(max(1, int(ms // 1000)))
                except (NotImplementedError, ImportError):
                    status.append("stub")
                    ms = int(meta_ms) if meta_ms is not None else 0
                    frames.append(max(1, ms // 1000))
            out["thumb_w"] = (pdf["width"].fillna(0).astype(int).clip(upper=256)).astype("int32")
            out["thumb_h"] = (pdf["height"].fillna(0).astype(int).clip(upper=256)).astype("int32")
            out["n_frames_sampled"] = pd.Series(frames, index=pdf.index, dtype="int32")
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
