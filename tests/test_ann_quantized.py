"""Quantized (IVF-SQ8) lists in the persisted ANN index: int8 arrays
instead of float embeddings — the 100 TB bandwidth lever, with
exactness pinned against the float path rather than hoped.

The quantization math is byte-identical to the externally-verified
``ann_quantized_recall`` query (r10 green), so this file pins the
STORE plumbing: write → probe (both layouts) → two-stage float
re-rank → absorb → compact → retrain, plus the measured parquet byte
reduction that is the feature's whole point.
"""

from __future__ import annotations

import glob
import shutil

import pytest
from pyspark.sql import functions as F

from flink_wsr_project_spark.operators.ann_index import (
    _lists_props,
    absorb_vectors_into_index,
    ann_topk_from_index,
    ann_topk_from_index_pruned,
    compact_ann_index,
    measure_index_drift,
    quantized_expr,
    retrain_ann_index,
    write_ann_index,
)
from flink_wsr_project_spark.operators.similarity import cosine_expr
from flink_wsr_project_spark.sources.readers import load_table
from tests.conftest import SF_DIR

COLS = ("query_id", "probe_label", "neighbor_id", "cosine", "rank")


def _drop(spark, *prefixes):
    for p in prefixes:
        for t in (f"{p}_centroids", f"{p}_lists"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
            shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)


def _rows(df):
    return {tuple(getattr(r, c) for c in COLS) for r in df.collect()}


def test_quantized_probes_agree_and_rerank_recovers_float_exactness(spark):
    _drop(spark, "qann", "qbann")
    emb = load_table(spark, "embeddings", SF_DIR)
    write_ann_index(spark, emb, "qann", partition_lists=True, quantize=True)
    write_ann_index(spark, emb, "qbann", num_buckets=4, quantize=True)
    assert _lists_props(spark, "qann") == (True, True)
    assert "eq" in spark.table("qann_lists").columns
    assert "embedding" not in spark.table("qann_lists").columns

    queries = emb.where("vec_id % 50 = 0").selectExpr(
        "vec_id AS query_id", "embedding AS qv"
    )
    # both probe paths score the same int8 cosine with the same
    # tie-breaks — row-for-row agreement, like the float layout test
    got_p = _rows(ann_topk_from_index_pruned(spark, queries, "qann", k=5))
    got_b = _rows(ann_topk_from_index(spark, queries, "qbann", k=5))
    assert got_p == got_b and len(got_p) > 0

    n_lists = spark.table("qann_centroids").count()

    # nprobe = all lists == BRUTE-FORCE int8 ranking (the registered
    # ann_quantized_recall math, inlined here over the same corpus)
    emb.createOrReplaceTempView("_q_emb")
    q8 = spark.sql(
        f"SELECT vec_id, {quantized_expr('embedding')} AS q8 FROM _q_emb"
    )
    q8.createOrReplaceTempView("_q8")
    brute = spark.sql(
        f"""
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         {cosine_expr('q.q8', 'e.q8', 'spark')} AS cosine,
         CAST(row_number() OVER (PARTITION BY q.query_id
           ORDER BY {cosine_expr('q.q8', 'e.q8', 'spark')} DESC, e.vec_id
         ) AS BIGINT) AS rank
  FROM (SELECT vec_id AS query_id, q8 FROM _q8 WHERE vec_id % 50 = 0) q
  JOIN _q8 e ON e.vec_id <> q.query_id
) WHERE rank <= 5"""
    )
    want = {(r.query_id, r.neighbor_id, r.cosine, r.rank) for r in brute.collect()}
    got_all = {
        (r.query_id, r.neighbor_id, r.cosine, r.rank)
        for r in ann_topk_from_index_pruned(
            spark, queries, "qann", k=5, nprobe=int(n_lists)
        ).collect()
    }
    assert got_all == want

    # two-stage search at full width == exact FLOAT brute force: the
    # int8 stage proposes, the float re-rank disposes
    corpus_n = emb.count()
    float_exact = spark.sql(
        f"""
SELECT query_id, neighbor_id, rank FROM (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         CAST(row_number() OVER (PARTITION BY q.query_id
           ORDER BY {cosine_expr('q.qv', 'e.embedding', 'spark')} DESC, e.vec_id
         ) AS BIGINT) AS rank
  FROM (SELECT vec_id AS query_id, embedding AS qv FROM _q_emb
        WHERE vec_id % 50 = 0) q
  JOIN _q_emb e ON e.vec_id <> q.query_id
) WHERE rank <= 5"""
    )
    want_f = {(r.query_id, r.neighbor_id, r.rank) for r in float_exact.collect()}
    reranked = ann_topk_from_index_pruned(
        spark, queries, "qann", k=5, nprobe=int(n_lists),
        rerank_from=emb, rerank_m=int(corpus_n),
    )
    got_f = {(r.query_id, r.neighbor_id, r.rank) for r in reranked.collect()}
    assert got_f == want_f

    # dial validation fails loudly, never as silently-wrong results
    _drop(spark, "fann")
    write_ann_index(spark, emb, "fann", partition_lists=True)
    with pytest.raises(ValueError, match="QUANTIZED"):
        ann_topk_from_index_pruned(spark, queries, "fann", rerank_from=emb)
    with pytest.raises(ValueError, match="rerank_m"):
        ann_topk_from_index_pruned(spark, queries, "qann", rerank_m=10)
    with pytest.raises(ValueError, match="rerank_m"):
        ann_topk_from_index_pruned(
            spark, queries, "qann", k=5, rerank_from=emb, rerank_m=3
        )


def test_quantized_lists_bytes_are_at_least_3x_smaller(spark):
    """The feature's point, measured from parquet footers: the int8
    vector column's compressed bytes vs the float column's, same
    corpus, same layout. Measured 3.85× at sf0.01 (SCALE.md r11);
    pinned conservatively at ≥ 3×."""
    import pyarrow.parquet as pq

    _drop(spark, "bfann", "bqann")
    emb = load_table(spark, "embeddings", SF_DIR)
    write_ann_index(spark, emb, "bfann", partition_lists=True)
    write_ann_index(spark, emb, "bqann", partition_lists=True, quantize=True)

    def vec_col_bytes(table: str, col: str) -> int:
        total = 0
        for f in glob.glob(f"spark-warehouse/{table}/*/part-*.parquet"):
            md = pq.ParquetFile(f).metadata
            for rg in range(md.num_row_groups):
                for ci in range(md.row_group(rg).num_columns):
                    c = md.row_group(rg).column(ci)
                    if c.path_in_schema.split(".")[0] == col:
                        total += c.total_compressed_size
        return total

    fb = vec_col_bytes("bfann_lists", "embedding")
    qb = vec_col_bytes("bqann_lists", "eq")
    assert fb > 0 and qb > 0
    assert fb / qb >= 3.0, f"float {fb} B vs int8 {qb} B = {fb / qb:.2f}x"


def test_quantized_index_lifecycle_absorb_compact_retrain(spark):
    _drop(spark, "lqann")
    emb = load_table(spark, "embeddings", SF_DIR)
    write_ann_index(spark, emb, "lqann", partition_lists=True, quantize=True)

    v0 = emb.where("vec_id = 0").select("embedding").first().embedding
    newvec = spark.createDataFrame(
        [(950001, v0)], "vec_id long, embedding array<float>"
    )
    assert absorb_vectors_into_index(spark, newvec, "lqann") == 1
    assert (
        absorb_vectors_into_index(spark, newvec, "lqann", exclude_existing=True) == 0
    )
    probe = spark.createDataFrame([(960000, v0)], "query_id long, qv array<float>")
    got = _rows(ann_topk_from_index_pruned(spark, probe, "lqann", k=5))
    # identical float vectors quantize identically → int8 cosine 1.0.
    # The build-time Lloyd pass guarantees vec 0's stored list IS its
    # nearest-centroid list, so the nprobe=1 probe (same assignment
    # expression) finds BOTH vec 0 and its absorbed clone: cosine ties
    # break on id — vec 0 rank 1, clone rank 2
    top2 = {(n, r) for _, _, n, _, r in got if r <= 2}
    assert top2 == {(0, 1), (950001, 2)}

    rows_before = spark.table("lqann_lists").count()
    assert compact_ann_index(spark, "lqann") == rows_before
    assert _lists_props(spark, "lqann") == (True, True)  # both props survive
    assert _rows(ann_topk_from_index_pruned(spark, probe, "lqann", k=5)) == got

    # drift is measurable over the int8 arrays; self-retrain is
    # rejected (means over mixed per-vector scales would distort the
    # geometry) and source-retrain re-quantizes
    d = measure_index_drift(spark, "lqann")
    assert d["n_rows"] == rows_before and 0.0 <= d["fresh_centroid_mismatch"] <= 1.0
    with pytest.raises(ValueError, match="float corpus"):
        retrain_ann_index(spark, "lqann")
    source = emb.unionByName(newvec.withColumn("label", F.lit(0)).select(emb.columns))
    retrain_ann_index(spark, "lqann", source=source.select("vec_id", "embedding"))
    assert _lists_props(spark, "lqann") == (True, True)
    assert spark.table("lqann_lists").count() == rows_before
    assert "eq" in spark.table("lqann_lists").columns  # re-quantized
    # nprobe=1 find-the-clone is NOT guaranteed post-retrain (one Lloyd
    # step can leave v0's region straddling a list boundary — the IVF
    # asymmetry test_ann_drift models); the deterministic contract is
    # the exhaustive probe: at nprobe=all the clone is int8-identical
    # to the query and must rank first
    n_lists = int(spark.table("lqann_centroids").count())
    got2 = _rows(
        ann_topk_from_index_pruned(spark, probe, "lqann", k=5, nprobe=n_lists)
    )
    # vec 0 and its clone are both int8-identical to the query (cosine
    # exactly 1.0); ids break the tie, so they must be ranks 1 and 2
    top2 = {(n, r) for _, _, n, _, r in got2 if r <= 2}
    assert top2 == {(0, 1), (950001, 2)}

    # a float index rejects a shadowing source
    _drop(spark, "lfann")
    write_ann_index(spark, emb, "lfann", partition_lists=True)
    with pytest.raises(ValueError, match="shadow"):
        retrain_ann_index(spark, "lfann", source=emb)


def test_rerank_source_never_shuffles(spark):
    """ADVICE r11: F.broadcast on the RIGHT of a right_outer join is
    unsupported by Spark — the hint was silently dropped, so the float
    source either shipped whole or sort-merged (shuffling the corpus
    per probe batch, the opposite of the two-stage contract). Pin the
    fixed shape the store joins' way: with auto-broadcast disabled,
    every SOURCE scan in the re-rank plan reaches its join with no
    Exchange above it (the |m·k|-sized candidate/matched frames are
    what broadcasts), and no sort-merge join appears anywhere."""
    from tests.test_writers import _store_reshuffle_violations

    _drop(spark, "psq")
    emb = load_table(spark, "embeddings", SF_DIR)
    write_ann_index(spark, emb, "psq", partition_lists=True, quantize=True)
    v0 = emb.where("vec_id = 0").select("embedding").first().embedding
    probe = spark.createDataFrame([(980000, v0)], "query_id long, qv array<float>")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = ann_topk_from_index_pruned(
            spark, probe, "psq", k=3, rerank_from=emb, rerank_m=9
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        viol = _store_reshuffle_violations(plan, "embeddings")
        assert not viol, f"source-side shuffle/ship-whole: {viol}"
        assert "SortMergeJoin" not in plan
        # non-vacuity: the hint actually produced broadcast joins
        assert "BroadcastHashJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_rerank_surfaces_missing_source_ids_instead_of_dropping(spark):
    """A candidate the quantized stage proposes but the float source
    does not contain must stay VISIBLE as a NULL-cosine row ranking
    last — an inner join would silently remove it from the top-k (the
    absorbed-after-snapshot scenario). Craft: absorb a clone of vec 0
    into the quantized index, then re-rank against the ORIGINAL
    corpus (which lacks the clone)."""
    _drop(spark, "msq")
    emb = load_table(spark, "embeddings", SF_DIR)
    write_ann_index(spark, emb, "msq", partition_lists=True, quantize=True)
    v0 = emb.where("vec_id = 0").select("embedding").first().embedding
    assert absorb_vectors_into_index(
        spark,
        spark.createDataFrame([(970001, v0)], "vec_id long, embedding array<float>"),
        "msq",
    ) == 1

    probe = spark.createDataFrame([(980000, v0)], "query_id long, qv array<float>")
    n_lists = int(spark.table("msq_centroids").count())
    rows = ann_topk_from_index_pruned(
        spark, probe, "msq", k=int(emb.count()) + 1, nprobe=n_lists,
        rerank_from=emb, rerank_m=int(emb.count()) + 1,
    ).collect()
    by_id = {r.neighbor_id: r for r in rows}
    assert 970001 in by_id, "missing-source candidate was silently dropped"
    assert by_id[970001].cosine is None  # the audit trail
    # NULL cosine ranks after every real candidate
    assert by_id[970001].rank == max(r.rank for r in rows)
