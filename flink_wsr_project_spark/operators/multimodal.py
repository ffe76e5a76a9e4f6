"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched Pandas UDFs
over ``mapInPandas``.

Decode is REAL for every modality, using only public container formats
parseable with the stdlib (this build ships no codec libraries):

* **audio** — stdlib ``wave``: genuine RIFF/WAVE payloads (44-byte
  header + 8-bit mono PCM), frame count / sample rate / duration come
  from parsing actual bytes.
* **image** — Windows BMP (BITMAPINFOHEADER, 24 bpp): the magic,
  file size, data offset, dimensions, and bit depth are struct-parsed
  from the payload; thumbnail dims derive from the DECODED geometry.
* **video** — YUV4MPEG2 (Y4M): stream parameters (W/H/fps) parsed
  from the header line, frames counted by their ``FRAME\\n`` markers,
  payload length validated against W×H×3/2 per 4:2:0 frame; the
  frame-sampling plan (every 2nd frame) runs over decoded frames.

Compressed formats (PNG/JPEG, MP4/H.264) need codec libraries; the
probe for PIL/PyAV is kept ahead of the stdlib parsers so richer
codecs are used when the environment provides them — the container
formats above make the decode path REAL either way.

At 100 TB: payloads stay in executor memory one Arrow batch at a time
(``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch bytes);
nothing is collected to the driver; feature extraction is
embarrassingly parallel over input partitions (no shuffle at all).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession, functions as F

if TYPE_CHECKING:  # the batches closures import pandas at execution
    import pandas as pd  # time; keeping it out of module scope keeps
    # registry import (driver contract + bench first-run) pandas-free

MEDIA_KINDS = ("image", "audio", "video")
_MIME = {"image": "image/bmp", "audio": "audio/wav", "video": "video/x-yuv4mpeg"}

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

# Synthetic BMP geometry: 24 bpp, height 4, width 4/8/12/16 by doc_id%4.
# Widths are multiples of 4 so each 3·w-byte pixel row needs no padding:
# body = 12·w bytes (doc_id zero-padded ASCII), file = 54 + 12·w bytes.
BMP_WIDTHS = (4, 8, 12, 16)
BMP_HEIGHT = 4


def _bmp_header(w: int, h: int = BMP_HEIGHT) -> bytes:
    body = 3 * w * h
    return (
        b"BM"
        + struct.pack("<IHHI", 54 + body, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, body, 0, 0, 0, 0)
    )


BMP_HEADER_HEX = {w: _bmp_header(w).hex().upper() for w in BMP_WIDTHS}

# Document-render geometry (synthesize_image_renders): height 8 — NOT
# the media-asset height 4 — so the 9x8 dHash grid samples eight
# DISTINCT pixel rows and all 64 hash bits are independent. (On a
# 4-row image, nearest-neighbor row sampling duplicates each row into
# two grid rows, which collapses every 16-bit block to <= 256 distinct
# values — exactly the 8-bit-key candidate blow-up the 64-bit hash
# exists to fix.) Widths stay multiples of 4, so 3·w is 4-byte aligned
# and the synthetic bodies need no BMP row padding.
RENDER_HEIGHT = 8
RENDER_HEADER_HEX = {w: _bmp_header(w, RENDER_HEIGHT).hex().upper() for w in BMP_WIDTHS}

# Synthetic Y4M geometry: 4x4 4:2:0 at 25 fps -> 24 bytes per frame
# (16 Y + 4 Cb + 4 Cr), 1-5 frames by doc_id%5. Frame bodies are the
# doc_id zero-padded to 24 ASCII chars ('z' pad), so the FRAME marker
# cannot occur inside a body.
Y4M_HEADER = "YUV4MPEG2 W4 H4 F25:1 Ip A0:0 C420\n"
Y4M_FRAME_BODY = 4 * 4 + 2 * (2 * 2)
Y4M_FPS = 25

FEATURE_SCHEMA = (
    "asset_id long, kind string, n_bytes long, payload_md5 string, "
    "thumb_w int, thumb_h int, n_frames_sampled int, decode_status string"
)


def _parse_bmp(payload: bytes) -> dict:
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (file_size,) = struct.unpack_from("<I", payload, 2)
    (data_offset,) = struct.unpack_from("<I", payload, 10)
    width, height = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    if file_size != len(payload):
        raise ValueError("BMP size field does not match payload length")
    return {
        "width": width,
        "height": abs(height),
        "bpp": bpp,
        "data_offset": data_offset,
    }


def _parse_y4m(payload: bytes) -> dict:
    if not payload.startswith(b"YUV4MPEG2 "):
        raise ValueError("not a Y4M payload")
    header, _, rest = payload.partition(b"\n")
    params = {p[:1]: p[1:] for p in header.split(b" ")[1:] if p}
    w, h = int(params[b"W"]), int(params[b"H"])
    num, den = (int(x) for x in params.get(b"F", b"25:1").split(b":"))
    n_frames = rest.count(b"FRAME\n")
    frame_bytes = w * h * 3 // 2
    if len(rest) != n_frames * (6 + frame_bytes):
        raise ValueError("Y4M frame payload length mismatch")
    return {
        "width": w,
        "height": h,
        "fps": num / den,
        "n_frames": n_frames,
        "duration_ms": int(n_frames * 1000 * den / num),
    }


def decode_media(payload: bytes, kind: str) -> dict:
    """Real decode per modality. Audio: stdlib ``wave``. Image: PIL if
    present, else the stdlib BMP parser. Video: the stdlib Y4M struct
    parser (uncompressed YUV4MPEG2 — a richer container format, e.g.
    mp4 via PyAV/ffmpeg, would slot in here; only the per-row decode
    body changes, the Spark plumbing — binary column in, typed struct
    out, Arrow-batched — is format-agnostic). Raises ``ValueError``
    for bytes that match no parsable container."""
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
            import io

            from PIL import Image

            im = Image.open(io.BytesIO(payload))
            return {"width": im.width, "height": im.height, "mode": im.mode}
        except ImportError:
            return _parse_bmp(payload)
    if kind == "video":
        return _parse_y4m(payload)
    raise ValueError(f"unknown media kind {kind!r}")


def synthesize_media_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic media table derived from ``documents``: kind
    round-robins by doc_id; every payload is a GENUINE container —
    172-byte WAV (audio), 24 bpp BMP with doc_id-dependent width
    (image), multi-frame 4x4 Y4M stream with doc_id-dependent frame
    count (video) — all built with JVM expressions (constant headers +
    doc_id-derived bodies), no UDF. Exercises BinaryType end to end
    with byte-exact oracle-checkable payloads."""
    from flink_wsr_project_spark.sources.readers import load_table

    docs = load_table(spark, "documents", sf_dir)
    kind = F.element_at(
        F.array(*[F.lit(k) for k in MEDIA_KINDS]), (F.col("doc_id") % 3 + 1).cast("int")
    )
    wav_payload = F.concat(
        F.unhex(F.lit(WAV_HEADER_HEX)),
        F.encode(F.rpad(F.col("doc_id").cast("string"), WAV_PCM_BYTES, "0"), "UTF-8"),
    )
    bmp_header = F.element_at(
        F.array(*[F.lit(BMP_HEADER_HEX[w]) for w in BMP_WIDTHS]),
        (F.col("doc_id") % 4 + 1).cast("int"),
    )
    bmp_payload = F.concat(
        F.unhex(bmp_header),
        F.encode(
            F.expr(
                "rpad(cast(doc_id as string), 12 * 4 * cast(doc_id % 4 + 1 as int), '0')"
            ),
            "UTF-8",
        ),
    )
    y4m_payload = F.encode(
        F.concat(
            F.lit(Y4M_HEADER),
            F.expr(
                "repeat(concat('FRAME', char(10), "
                f"rpad(cast(doc_id as string), {Y4M_FRAME_BODY}, 'z')), "
                "cast(doc_id % 5 + 1 as int))"
            ),
        ),
        "UTF-8",
    )
    payload = (
        F.when(kind == "audio", wav_payload)
        .when(kind == "image", bmp_payload)
        .otherwise(y4m_payload)
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


def synthesize_image_renders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One genuine 24 bpp BMP per DOCUMENT whose pixel bytes are the
    document's TEXT (truncated/zero-padded to the 3·w·8-byte body,
    width 4·(doc_id%4+1), height ``RENDER_HEIGHT`` = 8 so the 9x8
    dHash grid gets eight distinct pixel rows) — the "render of the
    document" table the image-dedup query needs: near-duplicate texts
    produce near-identical pixels, so perceptual-hash dedup over these
    images mirrors the corpus's real duplicate structure instead of
    hashing uniform synthetic fill. All JVM expressions, no UDF;
    byte-exactly reconstructible from (doc_id, text), which is what
    makes the dHash query DuckDB-oracle-able. Short documents leave
    their tail rows all-'0' padding — deliberate: uniform regions are
    the realistic skew case (flat images share hash blocks), and the
    capped block join + ``image_block_skew`` report are how the
    pipeline handles it."""
    from flink_wsr_project_spark.sources.readers import load_table

    return synthesize_image_renders_from_docs(load_table(spark, "documents", sf_dir))


def synthesize_image_renders_from_docs(docs: DataFrame) -> DataFrame:
    """:func:`synthesize_image_renders` over an in-hand (doc_id, text)
    frame instead of a table path — the curation loop's per-batch
    image path (the batch's admitted docs are a DataFrame, not a
    directory)."""
    bmp_header = F.element_at(
        F.array(*[F.lit(RENDER_HEADER_HEX[w]) for w in BMP_WIDTHS]),
        (F.col("doc_id") % 4 + 1).cast("int"),
    )
    # non-printable-ASCII chars are folded to '0' BEFORE sizing: the
    # body is sized in characters but encoded as UTF-8, so a multibyte
    # codepoint would make the payload longer than the header-declared
    # 24·w bytes (an invalid BMP) and split the oracle's character
    # arithmetic from the decoder's byte reads. '[^ -~]' is the
    # printable-ASCII complement written without escapes, so the regex
    # is byte-identical in Spark and DuckDB.
    body = F.expr(
        "rpad(substring(regexp_replace(text, '[^ -~]', '0'), 1, "
        "CAST(24 * 4 * (doc_id % 4 + 1) AS INT)), "
        "CAST(24 * 4 * (doc_id % 4 + 1) AS INT), '0')"
    )
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.concat(F.unhex(bmp_header), F.encode(body, "UTF-8")).alias("payload"),
    )


# Audio-render geometry (synthesize_audio_renders): 8-bit mono PCM at
# 8 kHz, exactly 520 frames = 65 fingerprint windows × 8 frames
# (65 ms clips). 520 is the FIXED canvas the fingerprint compares on —
# clips are truncated/zero-padded to it, the aligned-window discipline
# real acoustic fingerprints use.
AUDIO_RENDER_FRAMES = 520
AUDIO_FP_WINDOWS = 65
_AR_HEADER = (
    b"RIFF"
    + struct.pack("<I", 36 + AUDIO_RENDER_FRAMES)
    + b"WAVE"
    + b"fmt "
    + struct.pack("<IHHIIHH", 16, 1, 1, WAV_RATE, WAV_RATE, 1, 8)
    + b"data"
    + struct.pack("<I", AUDIO_RENDER_FRAMES)
)
AUDIO_RENDER_HEADER_HEX = _AR_HEADER.hex().upper()

# Minimum signal length to fingerprint: half the canvas. Shorter clips
# are mostly padding — their window energies degenerate and everything
# short "sounds like" everything short (measured: dropping the gate
# takes the sf0.01 pair count 12 → 403, 367 of them involving a short
# clip). Real fingerprinting applies the same minimum-duration rule.
AUDIO_FP_MIN_CHARS = AUDIO_RENDER_FRAMES // 2


def synthesize_audio_renders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One genuine 8-bit mono WAV per FINGERPRINTABLE document (signal
    fills ≥ half the 520-frame canvas — see ``AUDIO_FP_MIN_CHARS``):
    the PCM samples are the document's TEXT bytes (printable-ASCII
    folded, truncated/zero-padded to the canvas), the audio sibling of
    :func:`synthesize_image_renders` — near-duplicate texts produce
    near-identical waveforms, so acoustic-fingerprint dedup over these
    clips mirrors the corpus's real duplicate structure. All JVM
    expressions, no UDF; byte-exactly reconstructible from (doc_id,
    text), which is what makes the fingerprint query oracle-able."""
    from flink_wsr_project_spark.sources.readers import load_table

    docs = load_table(spark, "documents", sf_dir).where(
        F.col("n_chars") >= AUDIO_FP_MIN_CHARS
    )
    body = F.expr(
        f"rpad(substring(regexp_replace(text, '[^ -~]', '0'), 1, "
        f"{AUDIO_RENDER_FRAMES}), {AUDIO_RENDER_FRAMES}, '0')"
    )
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.concat(
            F.unhex(F.lit(AUDIO_RENDER_HEADER_HEX)), F.encode(body, "UTF-8")
        ).alias("payload"),
    )


def extract_audio_fingerprint(assets: DataFrame) -> DataFrame:
    """(asset_id, afp) via mapInPandas over REAL WAV bytes — the
    acoustic-fingerprint step of the audio-dedup pipeline, decoded
    with the stdlib ``wave`` codec (genuine RIFF parse, not header
    skipping).

    The fingerprint is a 64-bit windowed-energy difference hash — the
    1-D sibling of the image dHash and a deliberately simplified
    member of the chromaprint family (energy deltas over aligned time
    windows; a spectral front-end would slot in where the window-sum
    is computed without changing the Spark plumbing): the decoded
    8-bit PCM splits into ``AUDIO_FP_WINDOWS`` = 65 consecutive
    windows of ``n_frames // 65`` samples, window ENERGY is the
    integer SUM of sample bytes (deterministic, SQL-reconstructible),
    and bit ``i`` is set when energy(i+1) > energy(i). Returned as a
    signed int64 (bit 63 = sign; consumers mask after shifting, as
    with the image hash). No shuffle, no driver collect; payloads
    stream one Arrow batch at a time."""

    # self-contained closure — see the NOTE in extract_features
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io as _io
        import wave as _wave

        import pandas as pd

        def _afp(payload) -> int:
            with _wave.open(_io.BytesIO(bytes(payload))) as w:
                if w.getsampwidth() != 1 or w.getnchannels() != 1:
                    raise ValueError("fingerprint expects 8-bit mono PCM")
                n = w.getnframes()
                frames = w.readframes(n)
            win = n // 65
            if win < 1:
                raise ValueError(f"clip too short to fingerprint: {n} frames")
            sums = [sum(frames[k * win : (k + 1) * win]) for k in range(65)]
            h = 0
            for i in range(64):
                if sums[i + 1] > sums[i]:
                    h |= 1 << i
            return h - (1 << 64) if h >= 1 << 63 else h

        for pdf in it:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "afp": pdf["payload"].map(_afp).astype("int64"),
                }
            )

    return assets.mapInPandas(batches, "asset_id long, afp long")


# Video-render geometry (synthesize_video_renders): 2x2 4:2:0 Y4M at
# 25 fps, exactly 65 frames (one fingerprint window per frame; 2.6 s
# clips). Frame payload = 4 Y + 1 Cb + 1 Cr = 6 bytes, so the fixed
# canvas is 390 signal bytes; clips with less than half that are not
# fingerprintable (the audio gate's rationale).
VIDEO_RENDER_FRAMES = 65
VIDEO_FRAME_BYTES = 6
VIDEO_RENDER_HEADER = "YUV4MPEG2 W2 H2 F25:1 Ip A0:0 C420\n"
VIDEO_FP_MIN_CHARS = VIDEO_RENDER_FRAMES * VIDEO_FRAME_BYTES // 2


def synthesize_video_renders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One genuine Y4M stream per FINGERPRINTABLE document: 65 2x2
    4:2:0 frames whose 6 payload bytes each are consecutive chunks of
    the document's TEXT (printable-ASCII folded, truncated/zero-padded
    to the 390-byte canvas) — the video sibling of the image/audio
    renders: near-duplicate texts produce near-identical frame
    sequences. All JVM expressions (header literal + per-frame FRAME
    markers from one in-row transform), no UDF; byte-exactly
    reconstructible from (doc_id, text). '\\n' cannot occur inside a
    frame body (non-printables fold to '0'), so the FRAME markers are
    unambiguous."""
    from flink_wsr_project_spark.sources.readers import load_table

    canvas = VIDEO_RENDER_FRAMES * VIDEO_FRAME_BYTES
    docs = load_table(spark, "documents", sf_dir).where(
        F.col("n_chars") >= VIDEO_FP_MIN_CHARS
    )
    frames = F.expr(
        f"array_join(transform(sequence(0, {VIDEO_RENDER_FRAMES - 1}), "
        f"f -> concat('FRAME', char(10), "
        f"substring(rpad(substring(regexp_replace(text, '[^ -~]', '0'), 1, {canvas}), "
        f"{canvas}, '0'), CAST({VIDEO_FRAME_BYTES} * f + 1 AS INT), "
        f"{VIDEO_FRAME_BYTES}))), '')"
    )
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.encode(F.concat(F.lit(VIDEO_RENDER_HEADER), frames), "UTF-8").alias(
            "payload"
        ),
    )


def extract_video_fingerprint(assets: DataFrame) -> DataFrame:
    """(asset_id, vfp) via mapInPandas over REAL Y4M bytes — the
    temporal-activity fingerprint of the video-dedup pipeline: parse
    the stream header (W/H → frame payload size), validate the frame
    structure, take each frame's ENERGY as the integer sum of its
    payload bytes, and set bit ``i`` of the 64-bit hash when
    energy(frame i+1) > energy(frame i) over the first 65 frames —
    the per-frame sibling of the audio windowed-energy hash (a real
    codec's per-frame luma mean would slot in at the energy step
    without changing the plumbing). Clips with fewer than 65 frames
    are rejected (the fixed-canvas discipline). Signed int64 like the
    other 64-bit hashes; no shuffle, no driver collect."""

    # self-contained closure — see the NOTE in extract_features
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as pd

        def _vfp(payload) -> int:
            b = bytes(payload)
            if not b.startswith(b"YUV4MPEG2 "):
                raise ValueError("not a Y4M payload")
            header, _, rest = b.partition(b"\n")
            params = {p[:1]: p[1:] for p in header.split(b" ")[1:] if p}
            w, hh = int(params[b"W"]), int(params[b"H"])
            fb = w * hh * 3 // 2
            step = 6 + fb  # b"FRAME\n" + payload
            n = len(rest) // step
            if len(rest) != n * step:
                raise ValueError("Y4M frame payload length mismatch")
            if n < 65:
                raise ValueError(f"clip too short to fingerprint: {n} frames")
            sums = []
            for f in range(65):
                if rest[f * step : f * step + 6] != b"FRAME\n":
                    raise ValueError(f"missing FRAME marker at frame {f}")
                sums.append(sum(rest[f * step + 6 : (f + 1) * step]))
            h = 0
            for i in range(64):
                if sums[i + 1] > sums[i]:
                    h |= 1 << i
            return h - (1 << 64) if h >= 1 << 63 else h

        for pdf in it:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "vfp": pdf["payload"].map(_vfp).astype("int64"),
                }
            )

    return assets.mapInPandas(batches, "asset_id long, vfp long")


def extract_image_dhash(assets: DataFrame) -> DataFrame:
    """(asset_id, dhash) via mapInPandas over REAL BMP bytes — the
    Arrow-batched perceptual-hash step of the image-dedup pipeline.

    The hash is the standard 64-bit difference hash (dHash): parse
    width/height and the pixel-data offset from the BMP header, sample
    a 9-wide × 8-tall grid of pixels (nearest-neighbor sampling —
    column ``min(c·w/9, w−1)``, row ``min(y·h/8, h−1)`` — integer
    math, no interpolation, so the hash is deterministic and
    SQL-reconstructible), take per-pixel gray as the SUM of the three
    channel bytes (monotone in intensity; the /3 of true luminance
    cancels in the > comparison), and set bit ``y·8 + x`` when
    gray(x+1, y) > gray(x, y). The result is returned as a SIGNED
    int64 (bit 63 is the sign bit — block extraction masks after the
    shift, so the two's-complement form is transparent to consumers).
    Rows are hashed in BMP STORAGE order (bottom-up) — a fixed
    permutation of image rows, irrelevant to near-dup semantics and
    identical on both compare sides. Pixel rows are addressed with the
    BMP spec's 4-byte row stride ``((3·w + 3) // 4) · 4``, so widths
    that are not a multiple of 4 decode correctly too (the synthetic
    renders are all aligned; real-world BMPs need the padding). No
    shuffle, no driver collect; payloads stream one Arrow batch at a
    time like :func:`extract_features`."""

    # self-contained closure — see the NOTE in extract_features
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct

        import pandas as pd

        def _dhash(payload) -> int:
            b = bytes(payload)
            if b[:2] != b"BM":
                raise ValueError("not a BMP payload")
            (off,) = _struct.unpack_from("<I", b, 10)
            w, h_rows = _struct.unpack_from("<ii", b, 18)
            rows = abs(h_rows)
            stride = (3 * w + 3) // 4 * 4  # 24bpp rows pad to 4 bytes
            h = 0
            for gy in range(8):
                y = min(gy * rows // 8, rows - 1)
                prev = None
                for c in range(9):
                    px = min(c * w // 9, w - 1)
                    base = off + stride * y + 3 * px
                    s = b[base] + b[base + 1] + b[base + 2]
                    if prev is not None and s > prev:
                        h |= 1 << (gy * 8 + (c - 1))
                    prev = s
            return h - (1 << 64) if h >= 1 << 63 else h

        for pdf in it:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "dhash": pdf["payload"].map(_dhash).astype("int64"),
                }
            )

    return assets.mapInPandas(batches, "asset_id long, dhash long")


def extract_features(assets: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads — every
    modality decoded for real:

    * audio — ``wave``; sampling plan = 1 frame per started second of
      DECODED duration;
    * image — BMP struct parse; thumbnail dims = decoded geometry
      clipped to 256;
    * video — Y4M parse; sampling plan = every 2nd DECODED frame
      (ceil(n/2)); thumbnail dims = decoded geometry.

    Audio thumbnails are 0×0 (no visual plane). Unparseable payloads
    fall back to metadata-derived features with
    ``decode_status='stub'`` — the error path stays observable rather
    than throwing away the batch.

    ``payload_md5`` is the md5 of the UPPERCASE HEX of the payload
    (not of the raw bytes) so the same fingerprint is expressible in
    engines whose md5 only accepts strings (DuckDB).
    """

    # NOTE: the closure must be self-contained (no references to this
    # module) — Spark's Python workers unpickle it in processes that may
    # not have the package on PYTHONPATH (the driver harness imports us
    # by path). Imports happen inside; the parsers are local.
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib
        import io as _io
        import struct as _struct
        import wave as _wave

        import pandas as pd

        def _decode(payload, kind):
            """(thumb_w, thumb_h, n_frames_sampled) from real bytes."""
            b = bytes(payload)
            if kind == "audio":
                with _wave.open(_io.BytesIO(b)) as w:
                    ms = int(w.getnframes() * 1000 / w.getframerate())
                return 0, 0, max(1, ms // 1000)
            if kind == "image":
                if b[:2] != b"BM":
                    raise ValueError("not BMP")
                (fsz,) = _struct.unpack_from("<I", b, 2)
                w, h = _struct.unpack_from("<ii", b, 18)
                if fsz != len(b):
                    raise ValueError("BMP size mismatch")
                return min(w, 256), min(abs(h), 256), 1
            if kind == "video":
                if not b.startswith(b"YUV4MPEG2 "):
                    raise ValueError("not Y4M")
                header, _, rest = b.partition(b"\n")
                params = {p[:1]: p[1:] for p in header.split(b" ")[1:] if p}
                w, h = int(params[b"W"]), int(params[b"H"])
                n = rest.count(b"FRAME\n")
                if len(rest) != n * (6 + w * h * 3 // 2):
                    raise ValueError("Y4M length mismatch")
                return min(w, 256), min(h, 256), (n + 1) // 2
            raise ValueError(f"unknown kind {kind!r}")

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
            status, tws, ths, frames = [], [], [], []
            for k, p, mw, mh, meta_ms in zip(
                pdf["kind"], pdf["payload"], pdf["width"], pdf["height"],
                pdf["duration_ms"],
            ):
                try:
                    tw, th, nf = _decode(p, k)
                    status.append("decoded")
                except (ValueError, EOFError, KeyError, _struct.error, _wave.Error):
                    status.append("stub")
                    tw = min(int(mw) if mw is not None else 0, 256)
                    th = min(int(mh) if mh is not None else 0, 256)
                    ms = int(meta_ms) if meta_ms is not None else 0
                    nf = max(1, ms // 1000)
                tws.append(tw)
                ths.append(th)
                frames.append(nf)
            out["thumb_w"] = pd.Series(tws, index=pdf.index, dtype="int32")
            out["thumb_h"] = pd.Series(ths, index=pdf.index, dtype="int32")
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
