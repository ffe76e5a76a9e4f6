"""ANN index drift: the retrain trigger's measurement and the proof
that retraining actually restores what drift costs.

The r10 index module asserted "re-training centroids is ... scheduled
by drift" without anything computing drift (ann_index.py r10:33). This
file pins the whole closed loop on a crafted, fully deterministic
geometry:

    build (drift 0) → absorb a boundary-straddling cluster (the lists
    SPLIT it, fresh-centroid mismatch rises, nprobe=1 recall falls) →
    ``should_retrain`` fires → one Lloyd-step ``retrain_ann_index``
    (re-assign to fresh means + rebuild) reunifies the cluster →
    drift back to 0, recall back to 1.0, trigger clears.

Why the two drift numbers differ by construction: absorbs assign BY
nearest persisted centroid, so ``stored_centroid_mismatch`` stays flat
over the loop (asserted 0 here) — it measures the upstream
partitioner's asymmetry, not absorb drift. ``fresh_centroid_mismatch``
is the k-means unstable-assignment rate against the lists' CURRENT
means, which absorbed off-center mass drags — the trigger quantity.
Measured operating curve on the sf0.01 corpus: SCALE.md round 11
(scripts/ann_drift_probe.py).
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from flink_wsr_project_spark.operators.ann_index import (
    absorb_vectors_into_index,
    ann_topk_from_index_pruned,
    measure_index_drift,
    retrain_ann_index,
    should_retrain,
    write_ann_index,
)
from flink_wsr_project_spark.operators.similarity import cosine_expr

D = 64


def _vec(**kv):
    v = [0.0] * D
    for k, x in kv.items():
        v[int(k)] = x
    return v


def _recall_at_5(spark, queries, prefix: str) -> float:
    """recall@5 of the pruned nprobe=1 probe vs exact brute-force
    cosine over the index's own corpus (same tie-breaks)."""
    corpus = spark.table(f"{prefix}_lists").select("vec_id", "embedding")
    queries.createOrReplaceTempView("_drift_q")
    corpus.createOrReplaceTempView("_drift_c")
    exact = spark.sql(
        f"""
SELECT query_id, neighbor_id FROM (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         row_number() OVER (PARTITION BY q.query_id
           ORDER BY {cosine_expr('q.qv', 'e.embedding', 'spark')} DESC, e.vec_id
         ) AS rank
  FROM _drift_q q JOIN _drift_c e ON e.vec_id <> q.query_id
) WHERE rank <= 5"""
    )
    truth: dict = {}
    for r in exact.collect():
        truth.setdefault(r.query_id, set()).add(r.neighbor_id)
    got: dict = {}
    for r in ann_topk_from_index_pruned(spark, queries, prefix, k=5).collect():
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(len(got.get(q, set()) & t) for q, t in truth.items())
    return hits / sum(len(t) for t in truth.values())


def test_absorb_drift_is_measured_and_retrain_restores_recall(spark):
    for t in ("drift_centroids", "drift_lists"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)

    # organic lists: 20 vectors around e0 (label 0), 20 around e1
    # (label 1); per-vector jitter lives in disjoint high dims so the
    # two lists are cleanly separated and every number is deterministic
    rows = []
    for i in range(20):
        rows.append((i, 0, _vec(**{"0": 1.0, str(20 + (i % 8)): 0.02 * (i + 1)})))
    for i in range(20):
        rows.append(
            (100 + i, 1, _vec(**{"1": 1.0, str(28 + (i % 8)): 0.02 * (i + 1)}))
        )
    org = spark.createDataFrame(rows, "vec_id long, label bigint, embedding array<float>")
    write_ann_index(spark, org, "drift", partition_lists=True)

    d0 = measure_index_drift(spark, "drift")
    assert d0 == {
        "n_rows": 40,
        "n_lists": 2,
        "stored_centroid_mismatch": 0.0,
        "fresh_centroid_mismatch": 0.0,
    }

    # a 50-vector cluster near the list-0/list-1 boundary, biased
    # toward list 0 — every 5th member biased just past the boundary,
    # so absorb (nearest PERSISTED centroid, the probes' rule) splits
    # it 40/10 across the two lists: the classic drift shape where new
    # mass mostly belongs to one list but stragglers leak over
    cl = []
    for i in range(50):
        base = {"0": 1.04, "1": 1.0, str(10 + (i % 6)): 0.01 * (i + 1)}
        if i % 5 == 0:
            base["0"] = 0.96
        cl.append((1000 + i, _vec(**base)))
    clus = spark.createDataFrame(cl, "vec_id long, embedding array<float>")
    assert absorb_vectors_into_index(spark, clus, "drift") == 50
    split = {
        r.label: r.n
        for r in spark.table("drift_lists")
        .where("vec_id >= 1000")
        .groupBy("label")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert split == {0: 40, 1: 10}

    d1 = measure_index_drift(spark, "drift")
    # absorbs assign by nearest persisted centroid → the stored number
    # stays flat; the fresh number is exactly the leaked minority: the
    # cluster mass drags list 0's true mean onto the cluster, so the
    # 10 strays' nearest FRESH centroid flips to list 0
    assert d1["stored_centroid_mismatch"] == 0.0
    assert abs(d1["fresh_centroid_mismatch"] - 10 / 90) < 1e-12

    queries = clus.selectExpr("vec_id AS query_id", "embedding AS qv")
    r_pre = _recall_at_5(spark, queries, "drift")
    # split cluster: nprobe=1 queries see only their own side's members
    assert 0.5 <= r_pre <= 0.9

    # the trigger, as code: fires on the drifted index, clears after
    assert should_retrain(spark, "drift", max_fresh_mismatch=0.05) is True

    d2 = retrain_ann_index(spark, "drift")
    assert d2["fresh_centroid_mismatch"] == 0.0
    assert d2["stored_centroid_mismatch"] == 0.0
    split2 = {
        r.label: r.n
        for r in spark.table("drift_lists")
        .where("vec_id >= 1000")
        .groupBy("label")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert split2 == {0: 50}  # one Lloyd step reunified the cluster

    r_post = _recall_at_5(spark, queries, "drift")
    assert r_post == 1.0 > r_pre
    assert should_retrain(spark, "drift", max_fresh_mismatch=0.05) is False

    with pytest.raises(ValueError, match="max_fresh_mismatch"):
        should_retrain(spark, "drift", max_fresh_mismatch=0.0)


def test_fresh_index_is_nearest_centroid_consistent(spark):
    """VERDICT r11 #2: a freshly-written index must not start
    inconsistent. On the REAL corpus — whose as-given labels are ~59%
    away from their nearest would-be centroid — the default build now
    drives assignments to a Lloyd fixed point: fresh mismatch is
    EXACTLY 0 (the drift measurement uses the same centroid-mean and
    nearest-label expressions the build converged), ``should_retrain``
    does not fire on a brand-new index, and ``reassign=False``
    preserves the labels-as-given mode (where the old headline
    inconsistency is still measurable — the controlled-geometry tests'
    and the inline-parity test's contract)."""
    from flink_wsr_project_spark.sources.readers import load_table
    from tests.conftest import SF_DIR

    for t in ("fresh_centroids", "fresh_lists", "freshraw_centroids",
              "freshraw_lists"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)

    emb = load_table(spark, "embeddings", SF_DIR)
    write_ann_index(spark, emb, "fresh", partition_lists=True)
    d = measure_index_drift(spark, "fresh")
    assert d["n_rows"] == emb.count()
    assert d["fresh_centroid_mismatch"] == 0.0
    assert d["stored_centroid_mismatch"] == 0.0
    assert should_retrain(spark, "fresh") is False

    write_ann_index(spark, emb, "freshraw", partition_lists=True, reassign=False)
    d_raw = measure_index_drift(spark, "freshraw")
    # the r11 headline number: as-given labels start far from their
    # nearest would-be-retrained centroid (~0.59 on this corpus)
    assert d_raw["fresh_centroid_mismatch"] > 0.4
    assert should_retrain(spark, "freshraw") is True

    # a fresh QUANTIZED index measures drift on the int8 geometry —
    # not exactly 0 (means over mixed per-vector scales carry rounding
    # noise; measured 0.008 on this corpus) but far under the dial:
    # the no-fire-at-birth guarantee holds for both layouts
    for t in ("freshq_centroids", "freshq_lists"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    write_ann_index(spark, emb, "freshq", partition_lists=True, quantize=True)
    dq = measure_index_drift(spark, "freshq")
    assert dq["stored_centroid_mismatch"] == 0.0
    assert dq["fresh_centroid_mismatch"] < 0.05
    assert should_retrain(spark, "freshq") is False


def test_retrain_preserves_layout_and_probe_parity(spark):
    """Retraining must keep the index layout (partitioned lists +
    property, or bucketed spec) and leave a clean-index probe
    unchanged: with zero drift, the Lloyd step is a fixed point —
    assignments don't move, so probes return identical rows."""
    for t in ("rtl_centroids", "rtl_lists"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)

    rows = []
    for i in range(10):
        rows.append((i, 0, _vec(**{"0": 1.0, str(20 + i): 0.02 * (i + 1)})))
    for i in range(10):
        rows.append((100 + i, 1, _vec(**{"1": 1.0, str(40 + i): 0.02 * (i + 1)})))
    org = spark.createDataFrame(rows, "vec_id long, label bigint, embedding array<float>")
    write_ann_index(spark, org, "rtl", partition_lists=True)

    queries = org.where("vec_id < 3").selectExpr(
        "vec_id AS query_id", "embedding AS qv"
    )
    cols = ("query_id", "probe_label", "neighbor_id", "cosine", "rank")
    want = {
        tuple(getattr(r, c) for c in cols)
        for r in ann_topk_from_index_pruned(spark, queries, "rtl", k=5).collect()
    }

    d = retrain_ann_index(spark, "rtl")
    assert d["fresh_centroid_mismatch"] == 0.0
    rows_p = spark.sql("SHOW TBLPROPERTIES rtl_lists").collect()
    assert any(
        r.key == "spark_graft.partitioned_lists" and r.value == "true" for r in rows_p
    )
    got = {
        tuple(getattr(r, c) for c in cols)
        for r in ann_topk_from_index_pruned(spark, queries, "rtl", k=5).collect()
    }
    assert got == want and len(got) > 0


def test_maintain_ann_index_runs_both_remedies_behind_their_triggers(spark):
    """The cron-shaped maintenance entry point: recover → compact (by
    file count) → retrain (by measured drift), each behind its dial,
    one report dict out. Reuses the drift geometry; fragmentation
    comes from absorbing the cluster one vector at a time."""
    import glob

    from flink_wsr_project_spark.operators.ann_index import maintain_ann_index

    for t in ("mnt_centroids", "mnt_lists"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        spark.sql(f"DROP TABLE IF EXISTS {t}__compact")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
        shutil.rmtree(f"spark-warehouse/{t}__compact", ignore_errors=True)

    rows = []
    for i in range(20):
        rows.append((i, 0, _vec(**{"0": 1.0, str(20 + (i % 8)): 0.02 * (i + 1)})))
    for i in range(20):
        rows.append(
            (100 + i, 1, _vec(**{"1": 1.0, str(28 + (i % 8)): 0.02 * (i + 1)}))
        )
    org = spark.createDataFrame(rows, "vec_id long, label bigint, embedding array<float>")
    write_ann_index(spark, org, "mnt", partition_lists=True)

    # healthy index: nothing fires
    rep0 = maintain_ann_index(spark, "mnt")
    assert (rep0["recovered"], rep0["compacted"], rep0["retrained"]) == (
        False, False, False,
    )

    # fragment + drift: one absorb per cluster member
    for i in range(24):
        base = {"0": 1.04, "1": 1.0, str(10 + (i % 6)): 0.01 * (i + 1)}
        if i % 5 == 0:
            base["0"] = 0.96
        v = spark.createDataFrame(
            [(1000 + i, _vec(**base))], "vec_id long, embedding array<float>"
        )
        assert absorb_vectors_into_index(spark, v, "mnt") == 1

    files_before = len(glob.glob("spark-warehouse/mnt_lists/*/part-*"))
    rep1 = maintain_ann_index(
        spark, "mnt", max_files_per_bucket=2, max_fresh_mismatch=0.02
    )
    assert rep1["compacted"] is True
    assert rep1["retrained"] is True
    assert rep1["drift_before"]["fresh_centroid_mismatch"] > 0.02
    assert rep1["drift_after"]["fresh_centroid_mismatch"] <= 0.02
    assert len(glob.glob("spark-warehouse/mnt_lists/*/part-*")) < files_before

    # second tick is a no-op — both dials are back under threshold
    rep2 = maintain_ann_index(
        spark, "mnt", max_files_per_bucket=2, max_fresh_mismatch=0.02
    )
    assert (rep2["recovered"], rep2["compacted"], rep2["retrained"]) == (
        False, False, False,
    )

    # crash-window recovery is step 1: temp-only state gets repaired
    spark.table("mnt_lists").write.partitionBy("label").saveAsTable(
        "mnt_lists__compact"
    )
    spark.sql("ALTER TABLE mnt_lists__compact SET TBLPROPERTIES "
              "('spark_graft.partitioned_lists'='true')")
    spark.sql("DROP TABLE mnt_lists")
    rep3 = maintain_ann_index(
        spark, "mnt", max_files_per_bucket=2, max_fresh_mismatch=0.02
    )
    assert rep3["recovered"] is True
    assert spark.table("mnt_lists").count() == rep2["drift_after"]["n_rows"]

    with pytest.raises(ValueError, match="max_fresh_mismatch"):
        maintain_ann_index(spark, "mnt", max_fresh_mismatch=1.5)


def test_retrain_is_crash_recoverable_and_validates_source_coverage(spark):
    """Review fixes, pinned: (a) retrain stages the re-assigned rows
    durably before touching either index table, so the crash window
    (staging exists, index possibly mid-overwrite) recovers by code;
    (b) a quantized-index retrain whose source is missing stored
    vec_ids is rejected LOUDLY instead of silently shrinking the
    index; (c) maintain_ann_index rejects a quantized index without a
    source UP FRONT, not at the first drift-triggered retrain."""
    from flink_wsr_project_spark.operators.ann_index import (
        maintain_ann_index,
        recover_index_retrain,
    )
    from flink_wsr_project_spark.sources.readers import load_table
    from tests.conftest import SF_DIR

    for t in ("rcvr_centroids", "rcvr_lists", "rcvr_retrain_src",
              "rcvq_centroids", "rcvq_lists"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)

    rows = []
    for i in range(10):
        rows.append((i, 0, _vec(**{"0": 1.0, str(20 + i): 0.02 * (i + 1)})))
    for i in range(10):
        rows.append((100 + i, 1, _vec(**{"1": 1.0, str(40 + i): 0.02 * (i + 1)})))
    org = spark.createDataFrame(rows, "vec_id long, label bigint, embedding array<float>")
    write_ann_index(spark, org, "rcvr", partition_lists=True)
    assert recover_index_retrain(spark, "rcvr") is False  # nothing staged

    queries = org.where("vec_id < 3").selectExpr("vec_id AS query_id", "embedding AS qv")
    cols = ("query_id", "probe_label", "neighbor_id", "cosine", "rank")
    want = {tuple(getattr(r, c) for c in cols)
            for r in ann_topk_from_index_pruned(spark, queries, "rcvr", k=5).collect()}

    # simulate the crash: staging written (as retrain would), then the
    # rebuild died — here we even drop the lists table entirely, the
    # worst mid-overwrite state
    org.write.mode("overwrite").format("parquet").saveAsTable("rcvr_retrain_src")
    spark.sql("ALTER TABLE rcvr_retrain_src SET TBLPROPERTIES ("
              "'spark_graft.retrain_partitioned'='true', "
              "'spark_graft.retrain_quantized'='false', "
              "'spark_graft.retrain_buckets'='8')")
    spark.sql("DROP TABLE rcvr_lists")
    assert recover_index_retrain(spark, "rcvr") is True
    assert not spark.catalog.tableExists("rcvr_retrain_src")
    got = {tuple(getattr(r, c) for c in cols)
           for r in ann_topk_from_index_pruned(spark, queries, "rcvr", k=5).collect()}
    assert got == want
    assert recover_index_retrain(spark, "rcvr") is False  # idempotent

    # (b) + (c): quantized index, incomplete source
    emb = load_table(spark, "embeddings", SF_DIR)
    write_ann_index(spark, emb, "rcvq", partition_lists=True, quantize=True)
    partial = emb.where("vec_id % 2 = 0").select("vec_id", "embedding")
    with pytest.raises(ValueError, match="missing"):
        retrain_ann_index(spark, "rcvq", source=partial)
    with pytest.raises(ValueError, match="needs"):
        maintain_ann_index(spark, "rcvq")  # quantized without source: up-front
    with pytest.raises(ValueError, match="shadow"):
        maintain_ann_index(spark, "rcvr", source=org)  # float with source
