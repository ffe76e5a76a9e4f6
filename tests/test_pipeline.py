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
