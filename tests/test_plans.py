"""Physical-plan audits — the 100 TB posture, enforced.

Correctness tests prove the small-SF answer; these prove the *shape*
of every plan survives a 1000× scale-up: no row-at-a-time Python in
any hot path, filters pushed into the parquet scan, column pruning,
dimension joins broadcast, and no accidental cartesian products.
"""

from __future__ import annotations

import pytest

from flink_wsr_project_spark.plans.registry import all_queries
from tests.conftest import SF_DIR

_QUERIES = all_queries()

# Arrow-batched Pandas paths are allowed only where declared.
_PANDAS_OK = {
    "media_features",
    "image_dhash_neardup",
    "image_dhash_keep_list",
    "image_dhash_neardup_capped",
    "image_block_skew",
    "modal_dedup_agreement",
    "modal_dedup_consensus",
    "audio_fp_neardup",
    "audio_fp_neardup_capped",
    "audio_block_skew",
    "video_fp_neardup",
    "video_fp_neardup_capped",
    "video_block_skew",
    "embedding_gram_upper",
    "user_value_ewma_partitioned",
}

# Deliberate tiny-side cross joins (1-row scalar subquery / ≤10-row
# centroid table); everything else must never be cartesian.
_CROSS_OK = {"ann_ivf_topk", "idle_rich_customers"}


def _plan(spark, name: str) -> str:
    df = _QUERIES[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_no_row_python_udf(spark, name):
    """Row-at-a-time Python UDFs (BatchEvalPython) are banned outright;
    Arrow paths (ArrowEvalPython / MapInPandas) only where declared."""
    plan = _plan(spark, name)
    assert "BatchEvalPython" not in plan, f"{name}: row-wise Python UDF in plan"
    if name not in _PANDAS_OK:
        assert "MapInPandas" not in plan and "ArrowEvalPython" not in plan, (
            f"{name}: undeclared Pandas path"
        )


@pytest.mark.parametrize("name", sorted(set(_QUERIES) - _CROSS_OK))
def test_no_cartesian_product(spark, name):
    plan = _plan(spark, name)
    assert "CartesianProduct" not in plan, f"{name}: cartesian product in plan"


def _unpartitioned_windows(spark, name: str) -> list[str]:
    """Window nodes in the optimized logical plan whose partitionSpec is
    EMPTY — at scale these move the entire input to one task (Spark
    4.1's InferWindowGroupLimit does NOT prune rank windows without a
    partition spec). Global top-K must go through
    operators.topn.global_topn (TakeOrderedAndProject) instead; tiny
    deliberate single-group windows use a constant partition key."""
    df = _QUERIES[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().optimizedPlan()
    bad: list[str] = []
    stack = [plan]
    while stack:
        node = stack.pop()
        if node.nodeName() == "Window" and node.partitionSpec().isEmpty():
            bad.append(node.simpleString(80))
        children = node.children()
        for i in range(children.size()):
            stack.append(children.apply(i))
    return bad


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_no_unpartitioned_window(spark, name):
    bad = _unpartitioned_windows(spark, name)
    assert not bad, f"{name}: unpartitioned Window (single-partition at scale): {bad}"


@pytest.mark.parametrize(
    ("name", "pushed_fragment"),
    [
        ("hot_items_topn", "EqualTo(event_type,view)"),
        ("order_priority_check", "GreaterThanOrEqual(o_orderdate"),
        ("market_by_channel", "Not(EqualTo(event_type,error))"),
    ],
)
def test_filter_pushdown_reaches_scan(spark, name, pushed_fragment):
    """Predicates must reach the parquet reader (storage-level skip),
    not just a post-scan Filter node."""
    assert pushed_fragment in _plan(spark, name), f"{name}: filter not pushed to scan"


@pytest.mark.parametrize(
    ("name", "table", "max_cols"),
    [
        ("pv_hourly", "events", 2),          # ts + event_type only
        ("hot_items_topn", "events", 3),     # ts, user_id, event_type
        ("dedup_exact", "documents", 2),     # doc_id, text
    ],
)
def test_column_pruning(spark, name, table, max_cols):
    """The scan must read only the referenced columns (ReadSchema
    appears once per scan; check the narrowest mention)."""
    import re

    plan = _plan(spark, name)
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert schemas, f"{name}: no ReadSchema in plan"
    n_cols = min(len([c for c in s.split(",") if c]) for s in schemas)
    assert n_cols <= max_cols, f"{name}: scan reads {n_cols} cols, want <= {max_cols}"


@pytest.mark.parametrize(
    "name",
    ["nation_volume", "promo_revenue", "top_customers_per_nation", "orders_rollup"],
)
def test_dimension_join_broadcasts(spark, name):
    """Dimension-table joins must be broadcast (no fact-side shuffle
    for the join itself)."""
    plan = _plan(spark, name)
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, (
        f"{name}: dimension join is not broadcast"
    )


@pytest.mark.parametrize(
    ("name", "max_exchanges"),
    [
        ("pricing_summary", 1),   # one agg shuffle, nothing else
        ("pv_hourly", 1),
        ("promo_revenue", 2),     # broadcast build + one agg shuffle
        ("user_sessions", 1),     # one shuffle reused by both window fns + agg
        ("hot_items_topn", 2),    # bucket agg + window_end repartition (reused by roll-up AND rank)
        ("hot_pages_topn", 2),    # bucket agg + window_end repartition (reused by roll-up AND rank)
        ("uv_hourly", 2),         # two-phase distinct
        ("market_by_channel", 2),  # bucket partial agg + window_end roll-up (r5 two-stage)
        ("market_total", 2),       # same shape, keyless
        ("tx_reconcile", 2),      # both sides keyed on tx
        ("dedup_exact", 1),
        ("token_vocab_topk", 2),  # token count + global-rank partition
        ("bigram_topk", 2),
        ("shipping_priority_topn", 1),
        ("nation_volume", 1),     # dims broadcast; single fact agg
        ("top_customers_per_nation", 2),
        ("order_priority_check", 1),
        ("orders_cube", 1),       # CUBE = one Expand, one shuffle
        ("customer_order_histogram", 2),
        ("value_percentiles", 1),
        ("event_type_pivot", 2),
        ("json_props_stats", 1),
        ("user_trailing_10m", 1),
        ("purchase_attribution_asof", 1),
        ("idle_rich_customers", 2),  # scalar-subquery agg + final agg
        ("bilateral_trade_volume", 3),  # fact-fact join (2) + agg
        ("market_share", 3),
        ("late_shipment_priority", 3),  # sort-merge at scale; broadcast at test SF
        ("large_volume_customers", 2),  # qty agg; HAVING result broadcasts into orders
        ("doc_repetition_ratio", 0),  # pure in-row array ops, no shuffle at all
        ("seq_packing", 2),           # window on source (+ rollup may reuse)
        ("data_mix_weights", 2),      # per-source agg + tiny single-partition total
        ("doc_length_histogram", 1),
        ("orders_grouping_sets", 1),  # Expand + one shuffle
        ("hot_items_topn_expand", 2),  # single-expand window agg + rank
        ("segment_value_salted", 3),  # probe + replicated-build shuffles + agg
        ("supplier_variety", 2),  # two-phase distinct agg
        ("value_quantiles_approx", 1),  # mergeable sketch, one shuffle
        ("product_profit", 3),   # dims broadcast; orders join broadcasts at test SF
        ("min_price_supplier", 2),  # catalog agg + per-part rank
        ("important_parts", 3),  # value agg + 1-row total broadcast + reuse
        ("top_revenue_supplier", 3),  # rev agg + 1-row max broadcast
        ("small_qty_revenue", 2),  # partkey window + global agg
        ("brand_size_revenue", 1),  # broadcast join + single agg
        ("waiting_suppliers", 3),  # orderkey join/agg + s_name agg + rank
        ("concentrated_suppliers", 3),  # pair agg + part window + s_name agg
        ("label_centroids", 1),  # explode + one (label, dim) hash agg
        ("nearest_centroid_confusion", 4),  # centroid agg + score agg + rank + confusion
        # Static plan shows 5, but the scalar-total subquery duplicates the
        # (source, token) agg subtree, and AQE's stage cache reuses it at
        # runtime (verified: final adaptive plan has 2 ReusedExchange) —
        # true runtime cost: agg + 2 window re-partitions + one 1-row total.
        ("token_source_lift", 5),
        ("dataset_splits", 1),  # row-local hash assignment + one rollup
        ("hourly_metrics_long", 2),  # two-phase distinct agg; melt is shuffle-free
        ("events_time_rollup", 1),  # ROLLUP = one Expand, one shuffle
        ("tokenizer_fertility", 1),  # row-local projection + per-source rollup
        ("boilerplate_passages", 3),  # segment freq agg + join + per-doc agg
        ("benchmark_decontaminate", 4),  # per-split distinct grams + hash join + 2-phase distinct agg
        ("embedding_kmeans", 0),  # assignment pass is scan-only: centroids are literals
        ("embedding_gram_upper", 1),  # one-row-per-task partials + d^2-group merge
        ("mix_resample", 3),  # shares rollup + broadcast-joined selection + final agg
        ("curriculum_order", 1),  # bucket-partitioned rank; offsets are literals
        ("doc_hash_features", 1),  # tokenize in-row + one (doc, dim) count
        ("ann_ivf_recall", 7),  # composes both ANN pipelines + the recall join
        ("ann_ivf_recall_nprobe2", 7),  # same shape; probes CTE keeps 2 rows/query
        ("ann_quantized_recall", 5),  # two brute-force rank passes + recall join
        ("shard_manifest", 2),  # bucket-partitioned rank + per-shard rollup
        ("user_value_ewma", 1),  # one user_id shuffle; fold is in-row
        ("user_value_ewma_partitioned", 1),  # one user_id shuffle; secondary-sort fold
        # LSH pairs member (its sig aggregate + (b,h) self-join, sides
        # ReusedExchange at runtime) + blocked cosine pairs + pair-key
        # full-outer join (r16: +2 for the aggregate-shaped signature —
        # the sig doc_id exchange and the (b,h) exchange, each ONCE)
        ("dedup_method_agreement", 5),
        # Measured member costs: quality 0 (row-local) + exact-dedup md5
        # agg 1 + near-dup chain 5 (one (b,h) window shuffle per self-join
        # side + pair-dedup + drops distinct + doc_id join) + decontam 3
        # + attribution join 1 + final (source, stage) agg 1. The r6 pin
        # of 9 predated the cap-aware verified chain (r7/r8 regressed it
        # to 17/18 via per-band aggregate-join-back; the r9 long-format
        # window layout is the lean shape at the chain's current
        # semantics).
        ("curation_funnel", 15),
        # sig doc_id aggregate + (b,h) window ×3 static (ONE runs, two
        # ReusedExchange at runtime — the redundant-predicate identity,
        # pinned in test_lsh_runtime_plan_shares_one_band_exchange) +
        # pair-dedup + drops distinct + docs join ×2 (left scan + agg)
        ("dedup_keep_list", 9),
        ("dedup_incremental", 3),  # one (b,h) self-join + pair-dedup + partner agg
        ("user_value_locf", 2),  # bounds agg + one user_id window pass over obs∪grid
        ("value_ohlc_hourly", 1),  # single-pass mergeable min_by/max_by bar compaction
        ("value_vwap_hourly", 1),  # JSON-extract inside one exact-integer agg
        ("kv_upsert_final_state", 2),  # two-phase distinct agg on the composite key
        # r16 long-format shape: sig aggregate + (b,h) size window ×2
        # static (one runs, one ReusedExchange) + pair-dedup (the
        # pre-r16 per-band HAVING layout re-ran the signature chain 12×
        # under the aggregate-shaped signature — static was 16)
        ("dedup_minhash_lsh_capped", 5),
        ("lsh_bucket_skew", 3),  # sig aggregate + one (b,h) bucket agg + 4-row band rollup
        ("series_pattern_topk", 1),  # one user_id lag pass; top-K is TakeOrderedAndProject
        ("image_dhash_neardup", 1),  # 4 block self-joins fold into one pair-dedup shuffle
        ("image_dhash_keep_list", 2),  # pair-dedup + claim agg; final join broadcasts
        # one (blk,bv) window shuffle carries all 4 blocks; self-join
        # reuses its partitioning; + pair-dedup UNION + star-arm dedup
        ("image_dhash_neardup_capped", 3),
        ("image_block_skew", 2),  # (blk,bv) bucket-size agg + 4-row blk rollup
        # text keep-list member (9 — the r16 aggregate-shaped
        # signature, see dedup_keep_list) + image pair-dedup + 1-row agg
        ("modal_dedup_agreement", 11),
        # text keep-list member (9) + the CAPPED candidate shape per
        # perceptual modality (3 each: (blk,bv) window shuffle +
        # pair-dedup UNION + star-arm dedup — never the uncapped block
        # self-join); claim sets broadcast into the final per-doc join
        ("modal_dedup_consensus", 18),
        ("audio_fp_neardup", 1),  # 4 block self-joins fold into one pair-dedup shuffle
        ("video_fp_neardup", 1),  # same shape over the Y4M fingerprint
        # the image capped shape instantiated per modality (r13): one
        # (blk,bv) window shuffle carries all 4 blocks; + pair-dedup
        # UNION + star-arm dedup
        ("audio_fp_neardup_capped", 3),
        ("video_fp_neardup_capped", 3),
        ("audio_block_skew", 2),  # (blk,bv) bucket-size agg + 4-row blk rollup
        ("video_block_skew", 2),
        # kmeans assignment is scan-only (0); sizes agg + vec_id join +
        # cluster pair join + drops distinct + final vec_id join
        ("semdedup_keep_list", 6),
        ("semdedup_cluster_skew", 1),  # one k-group agg over the assignment
        # Static plan duplicates the hdoc/df subtrees (CTE inlining);
        # AQE reuses them at runtime (verified: 3 ReusedExchange in the
        # final adaptive plan). True cost: doc+chunk shingle scans, one
        # h-keyed inverted-index shuffle, match agg, denominator join.
        ("chunk_containment", 11),
        ("quality_classifier_score", 0),  # pure in-row hash/fold/threshold scan
        # the two member pair pipelines + the pair-key full-outer join
        ("semdedup_label_agreement", 7),
        # containment CTE chain + judged-chunk rollup + per-doc rollup +
        # final doc join; 3 ReusedExchange at runtime (AQE dedups the
        # inlined hdoc/df subtrees, same as chunk_containment)
        ("containment_keep_list", 14),
        # span family (r14 rebudget, r15 +1 per sp_pg reference): both
        # sides of both candidate arms carry the FULL window stack
        # (identical subtrees so the gram hashing shares ONE gh
        # exchange at runtime — sf0.1 steady 16.1 s → 8.8 s under md5;
        # the broadcast of the raw corpus-sized gram relation is
        # gone). r15's polynomial gram hash adds a doc_id LEAD window
        # under each side (token codes line up as lead columns — all
        # hashing whole-stage codegen, ~6× cheaper than md5-per-gram),
        # so the STATIC count rises by one doc_id exchange per side;
        # the runtime plan has exactly ONE doc_id + ONE gh exchange
        # with 3 ReusedExchange (verified in the executed adaptive
        # plan), the chunk_containment precedent.
        ("shared_span_pairs", 6),
        ("shared_span_pairs_capped", 10),  # + the star-arm's two sides
        ("span_gram_skew", 4),  # + lead window; occ agg + gh window + 1-row agg
        # capped pairs (10) + per-doc interval-merge window + coverage
        # agg; the final doc join broadcasts
        ("span_dedup_keep_list", 12),
        # capped pairs (10) + interval merge + token-explode⋈intervals
        # doc-equi join + reassembly agg
        ("span_scrub", 13),
        # the capped shape with the lag-gap island break — the lag and
        # running-sum windows stack on the same diagonal partitioning
        ("shared_span_pairs_gapped", 10),
        # dl agg + 1-row stats + tf agg + 3-row df + the dl/df joins +
        # final doc agg; top-10 is TakeOrderedAndProject (pinned below)
        ("bm25_search_topk", 7),
        # capped span chain (10) + the (source_a, source_b) rollup; the
        # doc->source roster joins broadcast
        ("cross_source_span_leakage", 11),
        # gh window stack (df filter) + cross-split join + islands agg
        # + the two sides' lead windows
        ("benchmark_span_decontaminate", 5),
        # the capped span chain (10) + the capped LSH edge chain (9 —
        # r16 aggregate-shaped signature) + victim joins + six 1-row
        # scalar-subquery aggregates (SinglePartition exchanges of one
        # row each); the span AND signature subtrees share exchanges at
        # runtime as in the pair queries (15 ReusedExchange measured)
        ("takedown_blast_radius", 33),
        # doc-window lag pass + unigram/bigram count shuffles + the
        # score joins keyed on them + per-doc agg; vocab is a 1-row
        # broadcast
        ("doc_lm_perplexity", 7),
        # the returned relation is the driver-assembled merge table
        # (one row per round); the per-round cluster plans are pinned
        # separately in test_bpe_round_plans
        ("bpe_merges_topk", 0),
        ("bpe_vocab_fertility", 0),  # driver-assembled 1-row stats table
        # learned merges replayed as a lazy projection stack; the
        # vocab-bounded segmentation BROADCASTS into the word join —
        # word-count agg + seg-side aggs + final doc agg
        ("bpe_doc_tokens", 4),
    ],
)
def test_shuffle_budget(spark, name, max_exchanges):
    """Exchange (shuffle) count is the scale cost driver — pin it."""
    plan = _plan(spark, name)
    n = sum(
        1
        for line in plan.splitlines()
        if "Exchange hashpartitioning" in line or "Exchange rangepartitioning" in line
        or "Exchange SinglePartition" in line
    )
    assert n <= max_exchanges, f"{name}: {n} shuffles, budget {max_exchanges}"


def test_span_runtime_plan_shares_one_gram_exchange(spark):
    """The r14 scale fix, pinned at RUNTIME: all four candidate-join
    sides of the capped span query must canonicalize to ONE gh
    exchange, with the other sides ReusedExchange — the failure mode
    was Catalyst BROADCASTING the corpus-sized raw gram relation when
    the subtrees diverged, a silent 100 TB killer the static budget
    cannot see. r17: the fused gram generator computes gh/vh in-row
    from a per-document code array, so the upstream doc_id
    lead-window exchange r15 needed is GONE — pinned at ZERO (a
    reappearing doc_id exchange means the fused generator regressed
    to the window form)."""
    from flink_wsr_project_spark.plans.registry import get

    df = get("shared_span_pairs_capped").spark_fn(spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("Initial Plan")[0]
    # count exchange NODES only: a ReusedExchange line repeats the
    # referenced exchange's text, so a bare substring count over-counts
    nodes = [
        line.strip().lstrip("+-*: ")
        for line in final.splitlines()
    ]
    gh_ex = sum(n.startswith("Exchange hashpartitioning(gh#") for n in nodes)
    doc_ex = sum(n.startswith("Exchange hashpartitioning(doc_id#") for n in nodes)
    reused = sum(n.startswith("ReusedExchange") for n in nodes)
    assert gh_ex == 1, f"expected ONE gh exchange, got {gh_ex}"
    assert doc_ex == 0, f"expected NO doc_id lead-window exchange, got {doc_ex}"
    assert reused >= 3, f"expected >=3 ReusedExchange, got {reused}"


def test_lsh_runtime_plan_shares_one_band_exchange(spark):
    """The r16 signature-rewrite scale pin, at RUNTIME: the composed
    LSH chain (dedup_keep_list) must hash the corpus ONCE — exactly
    one token-explode Generate and one (b, h) exchange in the final
    adaptive plan, with every other ``marked`` reference a
    ReusedExchange. The failure mode (observed while building r16,
    before the redundant-but-true n/keeper predicates were added to
    both join sides): Catalyst column-prunes the bucket window off the
    unfiltered side, the subtrees diverge, and the whole
    scan→hash→aggregate signature chain is recomputed AND broadcast
    per side — the span family's r14 hazard reborn, invisible to the
    static budget."""
    from flink_wsr_project_spark.plans.registry import get

    df = get("dedup_keep_list").spark_fn(spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("Initial Plan")[0]
    nodes = [line.strip().lstrip("+-*: ") for line in final.splitlines()]
    band_ex = sum(n.startswith("Exchange hashpartitioning(b#") for n in nodes)
    # Generate prints inside a WholeStageCodegen span (``*(n) Generate``)
    explodes = sum("Generate explode(sequence(" in n for n in nodes)
    reused = sum(n.startswith("ReusedExchange") for n in nodes)
    assert band_ex == 1, f"expected ONE (b,h) exchange, got {band_ex}"
    assert explodes == 1, f"expected ONE signature token explode, got {explodes}"
    assert reused >= 2, f"expected >=2 ReusedExchange, got {reused}"


@pytest.mark.parametrize("name", ["market_by_channel", "market_total", "hot_items_topn"])
def test_two_stage_sliding_rollup_shape(spark, name):
    """r4-verdict item 3: the sliding-count queries must keep the
    tumble-then-roll shape — a PARTIAL HashAggregate (map-side bucket
    combine) strictly BEFORE the first exchange, so exchange 1 carries
    (key, 5-min-bucket) partials, never window-expanded raw rows."""
    plan = _plan(spark, name)
    lines = plan.splitlines()
    # The tree prints top-down: the LAST-printed exchange is the
    # first-executed one — the (key, bucket) shuffle.
    exchange_lines = [
        i for i, l in enumerate(lines) if "Exchange hashpartitioning" in l
    ]
    assert exchange_lines, f"{name}: no hash exchange in plan"
    bucket_exchange = max(exchange_lines)
    assert any(
        "HashAggregate" in l for l in lines[bucket_exchange:]
    ), f"{name}: no partial (map-side) aggregate feeding the bucket exchange"
    # The dur/slide expand must run on AGGREGATED bucket rows (printed
    # above the bucket exchange), never on raw pre-shuffle rows.
    expand_lines = [i for i, l in enumerate(lines) if "Generate explode" in l]
    assert expand_lines and all(i < bucket_exchange for i in expand_lines), (
        f"{name}: window expand is on the raw-row side of the bucket exchange"
    )


def test_semdedup_cap_prunes_before_pair_join(spark):
    """The SemDeDup cluster cap must be STRUCTURAL: the
    ``n <= cap OR vec_id = exemplar`` prune has to execute below the
    cluster-keyed pair join, so an over-cap cluster contributes one
    left-side row (its exemplar) to the join, never n_c rows — the
    n_c² enumeration the cap exists to kill. A post-join WHERE would
    pass every correctness test and still be quadratic."""
    plan = _plan(spark, "semdedup_keep_list")
    lines = plan.splitlines()
    # The pair join is the only join whose condition carries the cosine
    # fold (zip_with); the tree prints top-down, children below.
    pair_join = [
        i for i, l in enumerate(lines) if "Join [cluster_id" in l and "zip_with" in l
    ]
    assert pair_join, "pair join with inline cosine condition not found"
    prune = [
        i
        for i, l in enumerate(lines)
        if "exemplar" in l and "OR (vec_id" in l
    ]
    assert prune, "exemplar-or-within-cap prune not in plan"
    assert min(prune) > max(pair_join), (
        "cap prune executes above the pair join — over-cap clusters "
        "would enumerate n_c² candidates"
    )


def test_bpe_round_plans(spark):
    """The BPE loop's per-round cluster work, pinned: the pair count is
    ONE vocab-bounded shuffle (the groupBy — with a map-side partial
    aggregate so the exchange carries combined counts, not raw pair
    rows), and the re-segmentation is a pure map over the checkpointed
    vocab (ZERO exchanges). The word-frequency build is the single
    corpus-sized aggregate the whole loop ever runs."""
    from flink_wsr_project_spark.operators.bpe import (
        _initial_seg,
        _merge_pair_expr,
        _pair_counts,
        word_freqs,
    )
    from flink_wsr_project_spark.sources.readers import load_table

    docs = load_table(spark, "documents", SF_DIR).select("doc_id", "text")
    seg = _initial_seg(word_freqs(docs)).localCheckpoint()

    def shuffles(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        return plan, sum(1 for ln in plan.splitlines() if "Exchange " in ln)

    plan, n = shuffles(_pair_counts(seg))
    assert n == 1, f"pair count: {n} shuffles\n{plan}"
    assert "partial_sum" in plan or "partial sum" in plan.lower(), (
        "pair count lost its map-side combine"
    )

    _, n = shuffles(seg.selectExpr("word", "freq", f"{_merge_pair_expr('e', 'r')} AS syms"))
    assert n == 0, f"re-segmentation shuffles: {n}"
    seg.unpersist()
