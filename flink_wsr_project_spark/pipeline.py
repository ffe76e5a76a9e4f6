"""End-to-end corpus curation — the operators composed the way a
training-data pipeline actually runs them:

    raw documents
      → exact dedup (content-hash keep list)
      → near-dup dedup (MinHash-LSH pairs → connected components →
        keep the canonical doc per component)
      → quality gate (Gopher-style length / chars-per-token bounds)
      → curated corpus + per-stage accounting

Everything is DataFrame-composed: one Spark job graph per output, no
intermediate materialization required (callers may cache/write the
curated frame). The invariant — re-running near-dup detection on the
curated output finds nothing — is asserted in tests/test_pipeline.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from flink_wsr_project_spark.plans.pipeline_queries import (
    _dedup_minhash_lsh_sql,
    dedup_components,
)
from flink_wsr_project_spark.sources.readers import load_table

JACCARD_KEEP = 0.5


def curate_corpus(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Run the full curation chain; returns the curated corpus plus
    per-stage frames for accounting/audit."""
    docs = load_table(spark, "documents", sf_dir)

    # 1. exact dedup: smallest doc_id survives per content hash
    exact_keep = (
        docs.groupBy(F.md5("text").alias("h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    after_exact = docs.join(exact_keep, "doc_id", "left_semi")

    # 2. near-dup dedup: canonical (min doc_id) per connected component
    labels = dedup_components(spark, sf_dir)  # (doc_id, component_id)
    canonical = labels.filter(F.col("doc_id") == F.col("component_id")).select("doc_id")
    after_neardup = after_exact.join(canonical, "doc_id", "left_semi")

    # 3. quality gate (same bounds as doc_quality_score)
    toks = F.split(F.trim(F.col("text")), r"\s+")
    passes = F.size(toks).between(10, 10000) & (
        F.length("text") / F.size(toks)
    ).between(3, 15)
    curated = after_neardup.filter(passes)
    rejected = after_neardup.filter(~passes)

    return {
        "raw": docs,
        "after_exact": after_exact,
        "after_neardup": after_neardup,
        "curated": curated,
        "rejected_quality": rejected,
    }


def curation_report(stages: dict[str, DataFrame]) -> DataFrame:
    """One-row accounting frame (counts per stage)."""
    spark = stages["raw"].sparkSession
    row = {name: df.count() for name, df in stages.items()}
    return spark.createDataFrame([row])


def recheck_neardups(spark: SparkSession, curated: DataFrame) -> DataFrame:
    """Re-run MinHash-LSH over an arbitrary curated frame — the
    pipeline's self-check (empty result ⟺ dedup actually converged)."""
    curated.select("doc_id", "text").createOrReplaceTempView("documents")
    return spark.sql(_dedup_minhash_lsh_sql("spark")).filter(
        F.col("jaccard") >= JACCARD_KEEP
    )
