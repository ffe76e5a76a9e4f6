"""Training-data pipeline queries (driver mandate; SURVEY.md §7.3 M7):
deduplication, similarity search, and text analysis over the
``documents`` and ``embeddings`` tables.

Cross-engine determinism: shared hash primitive is
``bigint(substr(md5(s), 1, 15))`` (60 bits, positive) — md5 is
identical in Spark and DuckDB, so minhash/fingerprint oracles are
exact. All float math is either single IEEE expressions (deterministic)
or integer-scaled before aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from flink_wsr_project_spark.plans.registry import register
from flink_wsr_project_spark.sources.readers import load_table

# stopword list shared by quality scoring and language-id heuristics
_STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "on", "for", "with")
_SW_SQL = ", ".join(f"'{w}'" for w in _STOPWORDS)


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

_TOKEN_COUNT_ORACLE = r"""
SELECT doc_id,
       len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
       length(text) AS text_len,
       len(regexp_split_to_array(trim(text), '[^0-9A-Za-z]+')) AS n_words_bpeish
FROM documents
"""


@register("doc_token_count", oracle=_TOKEN_COUNT_ORACLE, tags=("pipeline", "text"))
def doc_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish alnum-run split.
    Pure built-in string functions — stays in whole-stage codegen."""
    docs = load_table(spark, "documents", sf_dir)
    return docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("text_len"),
        F.size(F.split(F.trim(F.col("text")), r"[^0-9A-Za-z]+")).cast("long").alias(
            "n_words_bpeish"
        ),
    )


_QUALITY_ORACLE = rf"""
WITH t AS (
  SELECT doc_id, text, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents
)
SELECT doc_id,
       len(toks) AS n_tokens,
       length(text) / len(toks) AS chars_per_token,
       len(list_filter(toks, x -> x IN ({_SW_SQL}))) / len(toks) AS stopword_ratio,
       CAST(len(toks) BETWEEN 10 AND 10000
            AND length(text) / len(toks) BETWEEN 3 AND 15 AS BOOLEAN) AS passes_quality
FROM t
"""


@register("doc_quality_score", oracle=_QUALITY_ORACLE, tags=("pipeline", "text"))
def doc_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality scoring: length / chars-per-token / stopword
    ratio + a Gopher-style pass/fail gate. All built-in higher-order
    array functions (no Python in the row path)."""
    docs = load_table(spark, "documents", sf_dir)
    toks = F.split(F.trim(F.col("text")), r"\s+")
    n_tokens = F.size(toks).cast("long")
    chars_per_token = F.length("text") / F.size(toks)
    stopword_ratio = F.size(F.filter(toks, lambda x: x.isin(*_STOPWORDS))) / F.size(toks)
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        chars_per_token.alias("chars_per_token"),
        stopword_ratio.alias("stopword_ratio"),
        (n_tokens.between(10, 10000) & chars_per_token.between(3, 15)).alias("passes_quality"),
    )


# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------

_DEDUP_EXACT_ORACLE = """
SELECT md5(text) AS text_hash, min(doc_id) AS keep_doc_id, count(*) AS n_copies
FROM documents GROUP BY 1
"""


@register("dedup_exact", oracle=_DEDUP_EXACT_ORACLE, tags=("pipeline", "dedup"))
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact deduplication: hash-groupBy on content, keep the smallest
    doc_id per group. At 100 TB this is one shuffle on the 128-bit
    content hash (never on the text itself)."""
    docs = load_table(spark, "documents", sf_dir)
    return (
        docs.groupBy(F.md5("text").alias("text_hash"))
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_copies"))
    )
