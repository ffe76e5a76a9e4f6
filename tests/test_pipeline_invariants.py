"""Cross-query invariants for the training-pipeline operators —
properties that must hold at ANY scale factor, independent of the
DuckDB oracle (they catch errors the oracle shares, e.g. a wrong
constant used identically on both sides)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_wsr_project_spark.plans.registry import all_queries
from tests.conftest import SF_DIR

_Q = all_queries()


def test_mix_weights_sum_to_one_million(spark):
    """ppm weights are floor-divided, so they sum to <= 1e6 and the
    shortfall is bounded by the number of sources."""
    rows = _Q["data_mix_weights"](spark, SF_DIR).collect()
    total = sum(r.weight_ppm for r in rows)
    assert 1_000_000 - len(rows) < total <= 1_000_000
    assert all(r.weight_ppm >= 0 for r in rows)


def test_seq_packing_conserves_tokens(spark):
    """Bins partition the corpus: per-source bin totals equal the
    per-source token totals, and bin ids are dense from 0."""
    bins = _Q["seq_packing"](spark, SF_DIR)
    per_src = bins.groupBy("source").agg(
        F.sum("bin_tokens").alias("toks"),
        F.sum("n_docs").alias("docs"),
        F.min("bin_id").alias("min_bin"),
        F.max("bin_id").alias("max_bin"),
        F.count("*").alias("n_bins"),
    )
    from flink_wsr_project_spark.sources.readers import load_table

    docs = load_table(spark, "documents", SF_DIR).select(
        "source", F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("toks")
    )
    want = docs.groupBy("source").agg(F.sum("toks").alias("toks"), F.count("*").alias("docs"))
    j = per_src.join(want, "source")
    bad = j.filter(
        (per_src.toks != want.toks)
        | (per_src.docs != want.docs)
        | (F.col("min_bin") != 0)
        | (F.col("n_bins") != F.col("max_bin") + 1)
    )
    assert bad.count() == 0


def test_repetition_ratios_bounded(spark):
    df = _Q["doc_repetition_ratio"](spark, SF_DIR)
    bad = df.filter(
        (F.col("dup_token_ratio") < 0)
        | (F.col("dup_token_ratio") >= 1)
        | (F.col("top_token_ratio") * F.col("n_tokens") < 1)
        | (F.col("top_token_ratio") > 1)
        | (F.col("n_distinct") > F.col("n_tokens"))
    )
    assert bad.count() == 0


def test_oov_ratio_consistency(spark):
    df = _Q["doc_oov_ratio"](spark, SF_DIR)
    bad = df.filter(
        (F.col("in_vocab") > F.col("n_tokens"))
        | (F.col("oov_ratio") < 0)
        | (F.col("oov_ratio") > 1)
    )
    assert bad.count() == 0
    # vocab covers the most frequent tokens, so SOME doc must have
    # in-vocab tokens at any non-degenerate SF
    assert df.filter(F.col("in_vocab") > 0).count() > 0


def test_doc_chunks_reconstruct_documents(spark):
    """Chunks are a lossless cover: stitching each doc's chunks (first
    chunk whole, then the non-overlapping tail of each successive one)
    reproduces the original text exactly; chunk_ids are dense from 0;
    every chunk except possibly the last is exactly CHUNK_SIZE chars."""
    from flink_wsr_project_spark.plans.pipeline_queries import (
        _CHUNK_SIZE,
        _CHUNK_STRIDE,
    )
    from flink_wsr_project_spark.sources.readers import load_table

    docs = {r.doc_id: r.text for r in load_table(spark, "documents", SF_DIR).collect()}
    chunks: dict[int, list] = {}
    for r in _Q["doc_chunks"](spark, SF_DIR).collect():
        chunks.setdefault(r.doc_id, []).append((r.chunk_id, r.chunk_text, r.chunk_len))
    assert set(chunks) == set(docs)
    overlap = _CHUNK_SIZE - _CHUNK_STRIDE
    for doc_id, parts in chunks.items():
        parts.sort()
        assert [cid for cid, _, _ in parts] == list(range(len(parts)))
        assert all(ln == len(txt) for _, txt, ln in parts)
        assert all(ln == _CHUNK_SIZE for _, txt, ln in parts[:-1])
        rebuilt = parts[0][1] + "".join(txt[overlap:] for _, txt, _ in parts[1:])
        assert rebuilt == docs[doc_id], f"doc {doc_id} not reconstructed"


def test_scd2_intervals_tile_and_pit_join_is_total(spark):
    """SCD2 invariants: per user, validity intervals are disjoint and
    cover [first_event, inf) (exactly one is_current row, each interval
    starts where the previous ended); consequently the point-in-time
    join matches EVERY event exactly once."""
    from flink_wsr_project_spark.sources.readers import load_table

    rows = _Q["user_segment_scd2"](spark, SF_DIR).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append((r.valid_from, r.valid_to, r.is_current))
    for uid, ivs in by_user.items():
        ivs.sort()
        assert sum(1 for _f, _t, cur in ivs if cur) == 1
        assert ivs[-1][1] == 253402300800  # open-ended sentinel
        for (f1, t1, _), (f2, _t2, _) in zip(ivs, ivs[1:]):
            assert t1 == f2, f"user {uid}: gap/overlap {t1} != {f2}"

    n_events = load_table(spark, "events", SF_DIR).count()
    assert _Q["events_segment_pit"](spark, SF_DIR).count() == n_events


def test_min_label_propagation_chain_converges_with_bounded_plan(spark):
    """A 10-node path graph needs ~9 propagation rounds (diameter), well
    past the shallow near-dup shapes — the loop must converge AND keep
    the logical plan depth constant across rounds (localCheckpoint
    truncates lineage; without it the plan nests one join per round)."""
    from pyspark.sql import functions as F

    from flink_wsr_project_spark.plans.pipeline_queries import min_label_propagation

    n = 10
    chain = [(i, i + 1) for i in range(n - 1)]
    edges = spark.createDataFrame(
        chain + [(b, a) for a, b in chain], ["a", "b"]
    )
    labels = spark.createDataFrame(
        [(i, i) for i in range(n)], ["doc_id", "component_id"]
    )
    # cache the edges like dedup_components does, WITHOUT materializing
    # first: the first materialization happens inside round 1's eager
    # checkpoint job, which must NOT capture the cache's RDD id into the
    # round's release set (the r5 review regression)
    edges = edges.cache()

    def _nonckpt_ids():
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        return {
            jid
            for jid in jmap.keySet()
            if not jmap[jid].rdd().checkpointData().isDefined()
        }

    cache_ids_before = _nonckpt_ids()
    persistent_before = len(spark.sparkContext._jsc.getPersistentRDDs())
    out = min_label_propagation(labels, edges)
    rows = {r.doc_id: r.component_id for r in out.collect()}
    assert rows == {i: 0 for i in range(n)}
    # the edges cache (materialized inside round 1's checkpoint job)
    # must still be alive after ~10 release rounds
    assert _nonckpt_ids() - cache_ids_before, (
        "edges cache was released by the propagation loop"
    )
    edges.unpersist()
    # lineage was truncated: the converged result reads from a
    # checkpointed RDD scan, not a 9-round nested join tree
    plan = out._jdf.queryExecution().toString()
    assert "LogicalRDD" in plan or "ExistingRDD" in plan
    assert plan.count("Join") == 0
    # superseded rounds' checkpoint blocks were released: after ~10
    # rounds only the FINAL round's checkpoint may remain persistent
    # (block growth across rounds was the r4-advice leak)
    persistent_after = len(spark.sparkContext._jsc.getPersistentRDDs())
    assert persistent_after - persistent_before <= 1, (
        f"label-propagation leaked checkpoint blocks: "
        f"{persistent_after - persistent_before} persistent RDDs added"
    )


def test_kmeans_partitioning_invariance(spark):
    """embedding_kmeans is bit-exact under any partitioning: integer
    distances, driver-resident centroids, floor-mean updates — so a
    7-way uneven repartition of the input must produce the identical
    assignment (the determinism contract every oracle-checked query
    carries, exercised here on the iterative path)."""
    from flink_wsr_project_spark.plans.registry import all_queries
    from flink_wsr_project_spark.sources.readers import load_table

    sf = "/root/testdata/sf0.001"
    base = {
        (r.vec_id, r.cluster_id)
        for r in all_queries()["embedding_kmeans"](spark, sf).collect()
    }
    # force a different physical layout through the cached-table path
    emb = load_table(spark, "embeddings", sf)
    from flink_wsr_project_spark.sources import readers

    key = next(k for k in readers._TABLE_CACHE if k[2] == "embeddings" and k[1] == sf)
    prev = readers._TABLE_CACHE[key]
    readers._TABLE_CACHE[key] = emb.repartition(7)
    try:
        alt = {
            (r.vec_id, r.cluster_id)
            for r in all_queries()["embedding_kmeans"](spark, sf).collect()
        }
    finally:
        readers._TABLE_CACHE[key] = prev
    assert base == alt
    assert len({c for _, c in base}) > 1  # clustering is non-degenerate


def test_round4_query_invariants(spark):
    """Cross-query consistency for the round-4 additions, beyond the
    per-query oracle match: the funnel partitions the corpus exactly,
    shard totals are token-balanced, resampling ppm is a probability,
    and IVF recall is a valid fraction of 5."""
    from flink_wsr_project_spark.plans.registry import all_queries
    from flink_wsr_project_spark.sources.readers import load_table

    sf = "/root/testdata/sf0.001"
    Q = all_queries()
    n_docs = load_table(spark, "documents", sf).count()

    funnel = Q["curation_funnel"](spark, sf).collect()
    assert sum(r.n_docs for r in funnel) == n_docs  # total partition
    assert {r.stage for r in funnel} <= {"quality", "exact_dup", "near_dup", "contaminated", "kept"}

    shards = Q["shard_manifest"](spark, sf).collect()
    assert sum(r.n_docs for r in shards) == n_docs
    totals = [r.total_tokens for r in shards]
    max_tok = load_table(spark, "documents", sf).selectExpr(
        "max(size(split(trim(text), '\\\\s+'))) AS m"
    ).head().m
    assert max(totals) - min(totals) <= 2 * max_tok  # longest-first deal stays balanced

    mix = Q["mix_resample"](spark, sf).collect()
    for r in mix:
        assert 0 < r.accept_ppm <= 1_000_000
        assert r.n_docs_kept <= r.n_docs and r.n_tokens_kept <= r.n_tokens

    recall = Q["ann_ivf_recall"](spark, sf).collect()
    for r in recall:
        assert 0 <= r.n_hit <= 5 and 0 <= r.recall_ppm <= 1_000_000

    ranks = {r.global_rank for r in Q["curriculum_order"](spark, sf).collect()}
    assert ranks == set(range(1, n_docs + 1))  # a total order, no gaps/dups


def test_ewma_partitioned_twin_equals_inrow_form(spark):
    """user_value_ewma_partitioned (secondary-sort mapInPandas fold, the
    unbounded-history form) must produce row-identical output to
    user_value_ewma (collect_list in-row fold) — same oracle, two
    physical strategies. Arrow batches are forced down to 4 rows so
    every user's history spans MANY chunks, exercising the
    (cur_uid, cur_n, cur_acc) carry across chunk boundaries — the part
    a single-chunk run would leave silently untested."""
    from flink_wsr_project_spark.plans.registry import all_queries

    q = all_queries()
    a = sorted(
        (r.user_id, r.n_events, r.ewma_milli)
        for r in q["user_value_ewma"](spark, SF_DIR).collect()
    )
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    spark.conf.set(key, "4")
    try:
        b = sorted(
            (r.user_id, r.n_events, r.ewma_milli)
            for r in q["user_value_ewma_partitioned"](spark, SF_DIR).collect()
        )
    finally:
        spark.conf.set(key, old)
    assert a == b and len(a) > 0


def test_dedup_incremental_partitions_the_batch(spark):
    """Oracle-independent invariants of the incremental decisions:
    output rows are exactly the batch slice (one decision per batch
    doc, no corpus doc ever appears); dup_of is NULL iff the decision
    is keep; a dup_of_corpus points OUTSIDE the batch, a
    dup_within_batch points at a SMALLER batch doc_id that was itself
    KEPT or claimed — never at the doc itself."""
    from flink_wsr_project_spark.sources.readers import load_table

    out = _Q["dedup_incremental"](spark, SF_DIR)
    docs = load_table(spark, "documents", SF_DIR)
    batch_ids = {r.doc_id for r in docs.where("doc_id % 3 = 2").select("doc_id").collect()}

    rows = out.collect()
    assert {r.doc_id for r in rows} == batch_ids
    assert len(rows) == len(batch_ids)
    for r in rows:
        if r.decision == "keep":
            assert r.dup_of is None
        elif r.decision == "dup_of_corpus":
            assert r.dup_of is not None and r.dup_of not in batch_ids
        else:
            assert r.decision == "dup_within_batch"
            assert r.dup_of in batch_ids and r.dup_of < r.doc_id


def test_ann_recall_monotone_in_nprobe(spark):
    """The nprobe recall dial's oracle-independent contract: probing a
    query's two nearest lists can only ADD candidates, so per-query
    n_hit at nprobe=2 >= n_hit at nprobe=1, same query set, and both
    stay within [0, 5]."""
    r1 = {r.query_id: r.n_hit for r in _Q["ann_ivf_recall"](spark, SF_DIR).collect()}
    r2 = {
        r.query_id: r.n_hit
        for r in _Q["ann_ivf_recall_nprobe2"](spark, SF_DIR).collect()
    }
    assert set(r1) == set(r2) and len(r1) > 0
    for q in r1:
        assert 0 <= r1[q] <= r2[q] <= 5


def test_semdedup_exemplar_always_kept_and_skew_arithmetic(spark):
    """Oracle-independent SemDeDup invariants: (1) every cluster's
    exemplar (min vec_id) is 'keep' — nothing can claim it since all
    evidence edges point from a lower vec_id; (2) both cap branches
    are ALIVE at the gate corpus (dead-branch audit); (3) the skew
    report's integer arithmetic: pairs mode enumerates n(n-1)/2 and
    saves nothing, exemplar mode enumerates n-1 and saves the rest."""
    keep = _Q["semdedup_keep_list"](spark, SF_DIR).cache()
    try:
        exemplars = keep.groupBy("cluster_id").agg(F.min("vec_id").alias("vec_id"))
        claimed = keep.join(exemplars, ["cluster_id", "vec_id"]).where(
            F.col("action") == "drop"
        )
        assert claimed.count() == 0, "a cluster exemplar was dropped"
        actions = {r.action for r in keep.select("action").distinct().collect()}
        assert actions == {"keep", "drop"}
    finally:
        keep.unpersist()

    skew = _Q["semdedup_cluster_skew"](spark, SF_DIR)
    rows = skew.collect()
    modes = {r.mode for r in rows}
    assert modes == {"pairs", "exemplar"}, f"dead cap branch at gate: {modes}"
    for r in rows:
        n = r.n_vectors
        if r.mode == "pairs":
            assert r.candidates == n * (n - 1) // 2 and r.pairs_saved == 0
        else:
            assert r.candidates == n - 1
            assert r.pairs_saved == n * (n - 1) // 2 - (n - 1)


def test_chunk_containment_gates_alive_and_bounded(spark):
    """Oracle-independent containment invariants: (1) every emitted
    row clears the threshold and never exceeds 1000 milli (containment
    is a fraction of the chunk's own shingle set); (2) the stop-shingle
    valve is ALIVE at the gate corpus (some shingle hash exceeds the DF
    cap — otherwise the 100 TB skew story is untested); (3) the
    min-shingle denominator gate actually excludes some chunks."""
    from flink_wsr_project_spark.operators.dedup import h28, shingled_cte
    from flink_wsr_project_spark.plans.pipeline_queries import (
        _CONT_DF_CAP,
        _CONT_MIN_SHINGLES,
        _CONT_THRESHOLD_MILLI,
    )
    from flink_wsr_project_spark.sources.readers import load_table

    out = _Q["chunk_containment"](spark, SF_DIR)
    bad = out.where(
        (F.col("cont_milli") < _CONT_THRESHOLD_MILLI) | (F.col("cont_milli") > 1000)
    )
    assert bad.count() == 0
    assert out.count() > 0

    load_table(spark, "documents", SF_DIR).createOrReplaceTempView("documents")
    h = h28("s", "spark")
    df_max = spark.sql(
        f"""WITH {shingled_cte("spark")},
        hdoc AS (SELECT DISTINCT doc_id, {h} AS h
                 FROM (SELECT doc_id, explode(array_distinct(sh)) AS s FROM shingled))
        SELECT max(df) AS m, sum(CASE WHEN df > {_CONT_DF_CAP} THEN 1 ELSE 0 END) AS n_stop
        FROM (SELECT h, count(*) AS df FROM hdoc GROUP BY h)"""
    ).collect()[0]
    assert df_max.m > _CONT_DF_CAP and df_max.n_stop > 0, "stop-shingle branch dead"

    # chunks excluded by the min-shingle gate: tiny tail chunks exist
    n_total_chunks = _Q["doc_chunks"](spark, SF_DIR).count()
    n_judged = out.select("src_doc", "chunk_id").distinct().count()
    assert n_judged < n_total_chunks


def test_containment_keep_list_min_keeper_and_gates(spark):
    """Oracle-independent decision invariants: (1) a drop requires a
    LOWER-id container, so the globally minimal doc_id can never drop
    (two mutual clones never both drop — the min-keeper convention);
    (2) both actions are alive at the gate; (3) non-measurable docs
    (zero judged chunks) are always 'keep'."""
    out = _Q["containment_keep_list"](spark, SF_DIR).cache()
    try:
        actions = {r.action for r in out.select("action").distinct().collect()}
        assert actions == {"keep", "drop"}
        min_doc = out.agg(F.min("doc_id").alias("m")).collect()[0].m
        assert (
            out.where(F.col("doc_id") == min_doc).collect()[0].action == "keep"
        )
        unmeasurable = out.where(F.col("n_chunks_judged") == 0)
        assert unmeasurable.where(F.col("action") == "drop").count() == 0
    finally:
        out.unpersist()


def test_materialize_once_blocks_bounded_and_releasable(spark):
    """r17: the materialize-once localCheckpoint sites (containment
    shingles, boilerplate segments, decontaminate grams, semdedup
    assignment, LM bigrams, fingerprints) must (1) not grow executor
    storage across repeated invocations of the same query — the
    previous call's blocks are released when the site re-materializes —
    and (2) be fully releasable via release_materialized_relations once
    the caller's action has completed (VERDICT r16 what's-wrong #1)."""
    from flink_wsr_project_spark.plans.pipeline_queries import (
        release_materialized_relations,
    )

    def n_pinned():
        return len(spark.sparkContext._jsc.getPersistentRDDs())

    def run(name):
        _Q[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()

    release_materialized_relations(spark)
    base = n_pinned()
    for name in ("chunk_containment", "boilerplate_passages", "doc_lm_perplexity"):
        run(name)
    first_pass = n_pinned()
    assert first_pass > base, "materialize-once sites no longer checkpoint"
    for _ in range(2):
        for name in ("chunk_containment", "boilerplate_passages", "doc_lm_perplexity"):
            run(name)
        assert n_pinned() == first_pass, (
            "repeated query invocations grew pinned checkpoint blocks"
        )
    release_materialized_relations(spark)
    assert n_pinned() == base, (
        "release_materialized_relations left materialize-once blocks pinned"
    )
