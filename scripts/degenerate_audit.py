#!/usr/bin/env python
"""Degenerate-output audit: find queries whose defining computation
never departs from a trivial value on the GENERATED testdata.

An externally green query can still be untested where it matters: at
sf0.01 the generated corpus had zero exact duplicates (dedup_exact
never deduplicated), every doc passed every quality gate, every LSH
pair had edit distance 0, no CMS heavy hitter ever collided
(overestimate always 0), and oov_ratio was 0.0 corpus-wide. This
script runs every DuckDB oracle at the gate SF and flags numeric
output columns that are CONSTANT across a multi-row result — the
signature of a branch or subtraction that never executes.

Every hit either gets a crafted-input test in
tests/test_synthetic_parity.py (see the r6 batch: quality-report
violations, dedup-agreement n_both, Gopher-gate fail side, funnel
stage 3, K4 triangles, nonzero OOV/Levenshtein/overestimate,
multi-copy dedup groups) or a note here explaining why the constant
is benign:

  * n_docs = 25 per source — the generator allocates docs uniformly;
    the queries aggregate it, nothing branches on it.
  * pii_scrub n_emails/n_phones/n_ips = 1 — every generated doc
    embeds exactly one of each; the redaction path itself runs on
    every row (counts 0 and >1 are format variations of the same
    regexp_extract_all, not separate branches).
  * lang_id es/de/fr scores 0 on the generated corpus — pinned
    separately by the crafted marker-word test.

Usage: python scripts/degenerate_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from flink_wsr_project_spark.plans import registry  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# constants documented as benign (query, column) — see module docstring
KNOWN_BENIGN = {
    ("data_mix_weights", "n_docs"),
    ("mix_resample", "n_docs"),
    ("source_quality_summary", "n_docs"),
    ("tokenizer_fertility", "n_docs"),
    ("pii_scrub", "n_emails"),
    ("pii_scrub", "n_phones"),
    ("pii_scrub", "n_ips"),
}

# constants whose non-trivial side IS pinned by a crafted-input test in
# tests/test_synthetic_parity.py (query, column) -> test name
KNOWN_PINNED = {
    ("dedup_exact", "n_copies"): "test_dedup_exact_multi_copy_groups",
    ("doc_oov_ratio", "oov_ratio"): "test_doc_oov_ratio_nonzero",
    ("doc_quality_score", "passes_quality"): "test_doc_quality_score_fail_side",
    ("fuzzy_prefix_pairs", "prefix_edit_distance"): "test_fuzzy_prefix_nonzero_distance",
    ("lang_id", "es_score"): "test_lang_id_every_language_and_tie_order",
    ("lang_id", "de_score"): "test_lang_id_every_language_and_tie_order",
    ("lang_id", "fr_score"): "test_lang_id_every_language_and_tie_order",
    ("source_quality_summary", "n_pass"): "test_source_quality_summary_fail_modes",
    ("source_quality_summary", "pass_rate"): "test_source_quality_summary_fail_modes",
    ("token_cms_heavy_hitters", "overestimate"): "test_cms_nonzero_overestimate",
    # quantized recall is 1.0 on the generated embeddings (int8 cosine
    # preserves the top-5 there); the loss side is crafted explicitly
    ("ann_quantized_recall", "n_hit"): "test_quantized_recall_loses_a_neighbor",
    ("ann_quantized_recall", "recall_ppm"): "test_quantized_recall_loses_a_neighbor",
    # the generated corpus' clones are prefix-truncations, so every
    # span starts at offset 0 there; nonzero offsets on both sides are
    # pinned by the crafted-offset tests
    ("shared_span_pairs", "a_start"): "test_shared_span_pairs_exact_offsets",
    ("shared_span_pairs", "b_start"): "test_span_two_diagonals_two_rows",
    ("shared_span_pairs_capped", "a_start"): "test_span_cap_star_preserves_keeper_claims_exactly",
    ("shared_span_pairs_capped", "b_start"): "test_span_cap_star_preserves_keeper_claims_exactly",
    ("shared_span_pairs_gapped", "a_start"): "test_span_gapped_bridges_one_substitution",
    ("shared_span_pairs_gapped", "b_start"): "test_span_gapped_bridges_one_substitution",
    ("cross_source_span_leakage", "n_spans"): "test_span_leakage_multi_span_pair",
}


def main(sf_dir: str) -> int:
    registry._load_all()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    hits = []
    for name, q in sorted(registry._REGISTRY.items()):
        if not q.oracle:
            continue
        try:
            df = con.sql(q.oracle).df()
        except Exception as ex:  # oracle needs a table this dir lacks
            print(f"skip {name}: {str(ex)[:60]}")
            continue
        if len(df) < 10:
            continue
        for c in df.columns:
            if df[c].dtype == object:
                continue
            if df[c].nunique(dropna=False) == 1:
                if (name, c) in KNOWN_BENIGN:
                    tag = "benign"
                elif (name, c) in KNOWN_PINNED:
                    tag = f"pinned:{KNOWN_PINNED[(name, c)]}"
                else:
                    tag = "AUDIT"
                hits.append((name, c, df[c].iloc[0], len(df), tag))
    unpinned = sum(1 for h in hits if h[4] == "AUDIT")
    for name, c, v, n, tag in hits:
        print(f"[{tag}] {name:32s} {c:24s} const={v} rows={n}")
    print(f"\n{len(hits)} constant columns, {unpinned} needing a synthetic test or a benign note")
    return 1 if unpinned else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"))
