"""End-to-end curation pipeline: stage monotonicity, canonical-doc
survival, and the closure property (no near-dups remain after dedup)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_wsr_project_spark.pipeline import curate_corpus, curation_report, recheck_neardups
from tests.conftest import SF_DIR


def test_curation_pipeline(spark):
    stages = curate_corpus(spark, SF_DIR)
    counts = {k: v.count() for k, v in stages.items()}

    # monotone shrinking through the stages
    assert counts["raw"] >= counts["after_exact"] >= counts["after_neardup"]
    assert counts["after_neardup"] == counts["curated"] + counts["rejected_quality"]
    assert counts["curated"] > 0

    # near-dup stage actually dropped the known duplicates at this SF
    assert counts["after_neardup"] < counts["raw"]

    # closure: re-running near-dup detection on the curated corpus
    # finds nothing at/above the keep threshold
    assert recheck_neardups(spark, stages["curated"]).count() == 0

    report = curation_report(stages).collect()[0]
    assert report["raw"] == counts["raw"]


def test_media_decode_is_real(spark):
    """Every modality decodes ACTUAL bytes in this codec-less
    container: WAV through the stdlib wave codec, BMP through struct
    parsing, Y4M through stream-marker parsing. Dimensions and frame
    counts must come from the parsed payloads, and corrupt bytes must
    be rejected — not silently passed through."""
    from flink_wsr_project_spark.operators.multimodal import (
        BMP_HEIGHT,
        WAV_FRAMES,
        WAV_RATE,
        Y4M_FPS,
        decode_media,
        extract_features,
        synthesize_media_assets,
    )

    assets = synthesize_media_assets(spark, SF_DIR)
    one = {
        r.kind: r
        for r in assets.dropDuplicates(["kind"]).collect()
    }
    meta = decode_media(bytes(one["audio"].payload), "audio")
    assert meta == {
        "channels": 1,
        "sample_rate": WAV_RATE,
        "n_frames": WAV_FRAMES,
        "duration_ms": int(WAV_FRAMES * 1000 / WAV_RATE),
    }
    img_id = one["image"].asset_id
    img = decode_media(bytes(one["image"].payload), "image")
    assert img["width"] == 4 * (img_id % 4 + 1)  # geometry parsed from bytes
    assert img["height"] == BMP_HEIGHT and img["bpp"] == 24

    vid_id = one["video"].asset_id
    vid = decode_media(bytes(one["video"].payload), "video")
    assert vid["n_frames"] == vid_id % 5 + 1  # frame markers counted
    assert (vid["width"], vid["height"], vid["fps"]) == (4, 4, float(Y4M_FPS))

    import pytest as _pytest

    with _pytest.raises(ValueError):
        decode_media(b"\x89PNG\r\n" + b"\x00" * 64, "image")
    with _pytest.raises(ValueError):
        decode_media(b"RIFFnot-a-y4m" + b"\x00" * 64, "video")

    feats = {
        r.kind: r
        for r in extract_features(assets).dropDuplicates(["kind"]).collect()
    }
    assert {f.decode_status for f in feats.values()} == {"decoded"}
    assert feats["audio"].n_frames_sampled == 1  # ceil(16 ms) -> 1 s plan
    assert feats["audio"].n_bytes == 44 + WAV_FRAMES
    assert (feats["image"].thumb_w, feats["image"].thumb_h) == (
        4 * (feats["image"].asset_id % 4 + 1), BMP_HEIGHT,
    )
    assert feats["video"].n_frames_sampled == (feats["video"].asset_id % 5 + 1 + 1) // 2

    # corrupt payloads take the observable stub path, not an exception
    bad = assets.withColumn(
        "payload", F.encode(F.lit("corrupt"), "UTF-8")
    )
    bad_feats = extract_features(bad).dropDuplicates(["kind"]).collect()
    assert {r.decode_status for r in bad_feats} == {"stub"}


def test_incremental_ingest_dedups_against_state(spark, tmp_path):
    """ingest_batch: batch 2's exact copies and near-dups of batch-1
    docs are rejected by the persisted signature state (history text is
    never re-read), fresh docs are admitted, and re-running a committed
    batch_id is a no-op (idempotent exactly-once admission)."""
    from flink_wsr_project_spark.pipeline import ingest_batch
    from flink_wsr_project_spark.sources.readers import load_table

    state = str(tmp_path / "ingest_state")
    docs = load_table(spark, "documents", SF_DIR).select("doc_id", "text")
    b1 = docs.filter("doc_id < 60")
    r1 = ingest_batch(spark, state, b1, "b1")
    admitted1 = {r.doc_id for r in r1["admitted"].collect()}
    assert admitted1  # batch 1 admits its canonical docs
    assert not r1["replayed"]

    # batch 2: fresh docs + exact copies + a near-dup of an admitted doc
    some = min(admitted1)
    base = docs.filter("doc_id >= 60 AND doc_id < 100")
    copies = (
        docs.filter(F.col("doc_id").isin(*sorted(admitted1)[:3]))
        .select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    )
    neardup = (
        docs.filter(F.col("doc_id") == some)
        .select(
            (F.col("doc_id") + 200000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" tail")).alias("text"),
        )
    )
    b2 = base.unionByName(copies).unionByName(neardup)
    r2 = ingest_batch(spark, state, b2, "b2")
    admitted2 = {r.doc_id for r in r2["admitted"].collect()}
    de = {r.doc_id for r in r2["dropped_exact"].collect()}
    dn = {r.doc_id for r in r2["dropped_neardup"].collect()}

    assert {d + 100000 for d in sorted(admitted1)[:3]} <= de  # exact copies rejected
    assert some + 200000 in dn                                # near-dup rejected
    assert admitted2 and all(d < 100000 for d in admitted2)
    assert admitted2 | de | dn == {r.doc_id for r in b2.collect()}

    # idempotent replay
    r2b = ingest_batch(spark, state, b2, "b2")
    assert r2b["replayed"]
    assert {r.doc_id for r in r2b["admitted"].collect()} == admitted2


def test_ingest_state_sig_format_marker(spark, tmp_path):
    """The r16 signature-scheme stamp on DIRECTORY state: the first
    commit records the scheme in a ``_sig_format`` marker; state with
    a MISSING marker (pre-r16) or a mismatched one is refused loudly —
    band values hashed under another scheme never match, so probing
    blind would silently admit every true dup (the catalog stores'
    identity discipline)."""
    import os

    import pytest

    from flink_wsr_project_spark.operators.dedup import SIG_HASH_FORMAT
    from flink_wsr_project_spark.pipeline import ingest_batch
    from flink_wsr_project_spark.sources.readers import load_table

    state = str(tmp_path / "stamped_state")
    docs = load_table(spark, "documents", SF_DIR).select("doc_id", "text")
    ingest_batch(spark, state, docs.filter("doc_id < 20"), "b1")
    marker = os.path.join(state, "_sig_format")
    with open(marker) as f:
        assert f.read().strip() == SIG_HASH_FORMAT

    # mismatched scheme -> refused (even a replayed batch id)
    with open(marker, "w") as f:
        f.write("md5sh28v1\n")
    with pytest.raises(ValueError, match="md5sh28v1"):
        ingest_batch(spark, state, docs.filter("doc_id < 20"), "b1")
    with pytest.raises(ValueError, match="md5sh28v1"):
        ingest_batch(spark, state, docs.filter("doc_id >= 20 AND doc_id < 25"), "b2")

    # missing marker over existing state (pre-r16 dir) -> refused
    os.remove(marker)
    with pytest.raises(ValueError, match="no recorded signature"):
        ingest_batch(spark, state, docs.filter("doc_id >= 20 AND doc_id < 25"), "b2")

    # restored marker -> batches admit again
    with open(marker, "w") as f:
        f.write(SIG_HASH_FORMAT + "\n")
    r = ingest_batch(spark, state, docs.filter("doc_id >= 20 AND doc_id < 25"), "b2")
    assert not r["replayed"]
