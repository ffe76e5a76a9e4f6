"""Query registry — the single source of truth consumed by
``__spark_entry__.py`` (driver contract) and the parity tests.

Every implemented operator from SURVEY.md §2 registers here as a named
query: a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus, when
the semantics are ANSI-expressible, the DuckDB oracle SQL string the
driver runs side-by-side. Column names/aliases MUST match between the
two (the driver sorts columns by name before value-hashing).

Determinism rules every registered query follows:
  * window boundaries emitted as epoch-second Longs, dates as strings;
  * double aggregations go through integer-cents (see
    ``operators.windows.cents``) so sums are order-independent and
    bit-exact across engines;
  * every ranking has explicit tie-breakers.
"""

from __future__ import annotations

import json
import re
from collections.abc import Callable
from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    spark_fn: SparkQuery
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, Query] = {}


def register(
    name: str, oracle: str | None = None, doc: str = "", tags: tuple[str, ...] = ()
) -> Callable[[SparkQuery], SparkQuery]:
    """Decorator: register a query (and optionally its DuckDB oracle)."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(name, fn, oracle, doc or (fn.__doc__ or ""), tags)
        return fn

    return deco


def set_doc(name: str, doc: str | None) -> None:
    """Attach a docstring to a registered query (used by thin SQL-wrapper
    registrations whose documentation lives on the SQL builder)."""
    if name in _REGISTRY and doc:
        _REGISTRY[name].doc = doc


def _load_all() -> None:
    """Import every plan module so its ``@register`` calls run."""
    from flink_wsr_project_spark.plans import (  # noqa: F401
        pipeline_queries,
        reference_queries,
        tpch_queries,
        analytics_queries,
    )


# Queries whose shared operators were modified in the CURRENT round.
# They are pinned near the front of the external-verification window even
# if recently verified, so a regression in changed code is caught by the
# external harness, not just the local parity suite. Update each round.
_CHANGED_OPERATOR_CANARIES: tuple[str, ...] = (
    # r17 (optimization round 2/2): queries whose SPARK-side SQL or
    # execution shape changed this session (results proven identical
    # by the local sweep + hostile-session drives; the external window
    # re-earns green on the new shapes). The span family swapped the
    # lead-window gram build for the fused in-row generator (values
    # bit-identical, window exchange gone); the BPE trio moved to lazy
    # per-round checkpoints; the iterative loops read convergence
    # scalars via observe(); the agreement diagnostics / takedown /
    # curation_funnel materialize independent members concurrently
    # (Spark SQL now reads pre-materialized relations); kmeans derives
    # its dimension from the seed collect. chunk_containment and
    # modal_dedup_consensus represent the materialize-once sites whose
    # block-release bookkeeping changed (values untouched). All 47
    # r16-displaced queries (last green r15 or earlier) sort ahead of
    # the r16-verified set automatically — the "residue rotates r17"
    # stagger the r16 verdict endorsed.
    "shared_span_pairs",
    "shared_span_pairs_capped",
    "shared_span_pairs_gapped",
    "span_gram_skew",
    "span_dedup_keep_list",
    "span_scrub",
    "cross_source_span_leakage",
    "benchmark_span_decontaminate",
    "bpe_merges_topk",
    "bpe_vocab_fertility",
    "bpe_doc_tokens",
    "dedup_components",
    "dedup_keep_best",
    "doc_pagerank",
    "semdedup_label_agreement",
    "modal_dedup_agreement",
    "dedup_method_agreement",
    "takedown_blast_radius",
    "curation_funnel",
    "embedding_kmeans",
    "semdedup_keep_list",
    "semdedup_cluster_skew",
    "chunk_containment",
    "modal_dedup_consensus",
    # r15 canaries (span polynomial hashing ×8, BPE LEFT-JOIN CTE ×3,
    # PCA power-iteration oracle ×1) all re-earned external green in
    # CORRECTNESS_r15 (12/12) and rotate back to natural order.
    # r13: empty on purpose. All six r12 canaries re-earned external
    # green in CORRECTNESS_r12 on their changed results. No r13 change
    # alters any REGISTERED query's SQL or results: the capped-builder
    # refactor (`_img_capped_body`/`_img_block_skew_sql` gained a cap
    # parameter) leaves the image queries' generated SQL byte-identical
    # at the default; tombstones/identity-gate/KV-rename touch only the
    # persisted-store operators, which are not registered. The four NEW
    # queries (audio_fp_neardup_capped, audio_block_skew,
    # video_fp_neardup_capped, video_block_skew) are tier-0 (never
    # verified) and enter the external window automatically, ahead of
    # the natural r8/r10-vintage rotation.
    #
    # r13 session 2: still empty. The kmeans-oracle CTE extraction
    # (`_kmeans_assign_ctes`) reproduces the registered
    # embedding_kmeans oracle byte-for-byte and leaves its Spark body
    # untouched; retention (operators/retention.py) chains only into
    # the unregistered store operators. The six new queries
    # (semdedup_keep_list, semdedup_cluster_skew,
    # semdedup_label_agreement, chunk_containment,
    # containment_keep_list, quality_classifier_score) are tier-0 and
    # lead the window automatically.
    #
    # r13 session 3: still empty. The span family (operators/spans.py
    # + operators/span_store.py), BM25, and the search index
    # (operators/search_index.py) are entirely new code — no shared
    # operator used by a previously-green query changed (the
    # interval_union_ctes extraction, the star-arm keeper-occurrence
    # fix, and the bm25_contrib_expr extraction each rewrote only
    # queries registered THIS session, all tier-0). The ten new
    # queries (shared_span_pairs, shared_span_pairs_capped,
    # span_gram_skew, span_dedup_keep_list, span_scrub,
    # shared_span_pairs_gapped, bm25_search_topk,
    # cross_source_span_leakage, benchmark_span_decontaminate — plus
    # sessions 1-2's ten) are tier-0 and lead the 50-query window
    # automatically, ahead of the natural r8/r10-vintage rotation.
)


def _last_verified_round() -> dict[str, int]:
    """Per-query round number of the most recent external correctness row.

    The driver writes ``CORRECTNESS_r{N}.json`` at the repo root after each
    round but only checks the first 50 entries of ``queries()``. To make
    sure EVERY query keeps earning external green rows (not just local
    parity), ``all_queries()`` orders by least-recently-verified so the
    50-query window rotates automatically: never-verified queries first,
    then oldest-verified, with the original registration order as the
    deterministic tie-break. Queries never seen externally map to 0 —
    and so does a query whose last row was red (mismatch/error): it
    stays in the window until it earns a green row.
    """
    repo_root = Path(__file__).resolve().parents[2]
    last: dict[str, int] = {}
    for p in sorted(repo_root.glob("CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", p.name)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            rows = json.loads(p.read_text())
        except (OSError, json.JSONDecodeError):
            continue
        if isinstance(rows, dict):
            for name, row in rows.items():
                if not isinstance(row, dict):
                    continue
                green = bool(
                    row.get("rows_match")
                    and row.get("schema_match")
                    and row.get("hash_match")
                ) or (
                    # genuinely non-SQL-expressible queries get the
                    # driver's weaker rows-only check; a completed one
                    # still counts as externally exercised
                    row.get("err") == "no_oracle"
                    and row.get("spark_rows") is not None
                )
                if green:
                    last[name] = max(last.get(name, 0), rnd)
    return last


def _ordered() -> list[Query]:
    """Registry values in external-verification priority order.

    Sort key: (0 for this round's changed-operator canaries and
    never-verified queries stay ahead via round=0, last-verified round
    ascending, registration index). Falls back to pure registration order
    when no CORRECTNESS files exist (fresh checkout).
    """
    _load_all()
    queries = list(_REGISTRY.values())
    last = _last_verified_round()
    if not last:
        return queries
    reg_index = {q.name: i for i, q in enumerate(queries)}
    return sorted(queries, key=lambda q: (
        0 if (q.name in _CHANGED_OPERATOR_CANARIES or last.get(q.name, 0) == 0) else 1,
        last.get(q.name, 0),
        reg_index[q.name],
    ))


def all_queries() -> dict[str, SparkQuery]:
    return {q.name: q.spark_fn for q in _ordered()}


def all_oracles() -> dict[str, str]:
    return {q.name: q.oracle for q in _ordered() if q.oracle is not None}


def get(name: str) -> Query:
    _load_all()
    return _REGISTRY[name]
