"""End-to-end curation pipeline: stage monotonicity, canonical-doc
survival, and the closure property (no near-dups remain after dedup)."""

from __future__ import annotations

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


def test_wav_decode_is_real(spark):
    """The audio path decodes ACTUAL bytes: a synthesized asset's WAV
    payload parses with the stdlib wave codec to the advertised
    geometry, and the feature extractor reports decoded status with a
    duration-derived sampling plan. Image/video stay on the probe-stub
    path in this codec-less container."""
    from flink_wsr_project_spark.operators.multimodal import (
        WAV_FRAMES,
        WAV_RATE,
        decode_media,
        extract_features,
        synthesize_media_assets,
    )

    assets = synthesize_media_assets(spark, SF_DIR)
    one_audio = assets.filter("kind = 'audio'").limit(1).collect()[0]
    meta = decode_media(bytes(one_audio.payload), "audio")
    assert meta == {
        "channels": 1,
        "sample_rate": WAV_RATE,
        "n_frames": WAV_FRAMES,
        "duration_ms": int(WAV_FRAMES * 1000 / WAV_RATE),
    }

    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        decode_media(b"\x89PNG\r\n", "image")

    feats = {
        r.kind: r
        for r in extract_features(assets).dropDuplicates(["kind"]).collect()
    }
    assert feats["audio"].decode_status == "decoded"
    assert feats["audio"].n_frames_sampled == 1  # ceil(16 ms) -> 1 s plan
    assert feats["audio"].n_bytes == 44 + WAV_FRAMES
    assert feats["image"].decode_status == "stub"
    assert feats["video"].decode_status == "stub"
