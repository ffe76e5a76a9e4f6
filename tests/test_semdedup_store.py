"""Incremental semantic dedup against the persisted IVF index
(operators/ann_index.py::semdedup_from_index + the
streaming/similarity.py::semdedup_foreach_batch loop) — the embedding
modality's store-backed dedup path, completing the pattern: text,
image, audio, video AND embeddings each have a registered batch query
(`semdedup_keep_list`) and an incremental store loop with the same
decision contract (dup_of_corpus ≻ dup_within_batch ≻ keep, min
claiming partner, corpus never re-scanned) and the same lifecycle
verbs (takedown releases claims, retention expires them, replays are
idempotent)."""

from __future__ import annotations

import shutil


def _basis(i: int, dim: int = 8) -> list[float]:
    v = [0.0] * dim
    v[i] = 1.0
    return v


def _emb(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label long"
    )


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _drop(spark, prefix):
    for t in (
        f"{prefix}_centroids",
        f"{prefix}_lists",
        f"{prefix}_tombstones",
        f"{prefix}_retention",
    ):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        spark.sql(f"DROP TABLE IF EXISTS {t}__compact")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
        shutil.rmtree(f"spark-warehouse/{t}__compact", ignore_errors=True)


def _write_corpus(spark, prefix, quantize=False):
    from flink_wsr_project_spark.operators.ann_index import write_ann_index

    _drop(spark, prefix)
    corpus = _emb(
        spark,
        [
            (1, _basis(0), 0),
            (2, _basis(1), 0),
            (3, _basis(2), 1),
            (4, _basis(3), 1),
        ],
    )
    write_ann_index(
        spark, corpus, prefix, num_buckets=2, reassign=False, quantize=quantize
    )


def test_semdedup_from_index_decision_contract(spark):
    from flink_wsr_project_spark.operators.ann_index import (
        delete_from_ann_index,
        semdedup_from_index,
    )
    from flink_wsr_project_spark.operators.retention import (
        set_retention_watermark,
    )

    _write_corpus(spark, "sdst")

    # corpus claim + within-batch claim + novelty, in one batch
    batch1 = _vecs(
        spark,
        [(100, _basis(0)), (201, _basis(5)), (202, _basis(5))],
    )
    d1 = {
        r.vec_id: (r.decision, r.dup_of)
        for r in semdedup_from_index(spark, batch1, "sdst").collect()
    }
    assert d1 == {
        100: ("dup_of_corpus", 1),
        201: ("keep", None),
        202: ("dup_within_batch", 201),
    }

    # takedown: the corpus keeper's claim releases immediately
    delete_from_ann_index(
        spark, "sdst", spark.createDataFrame([(1,)], "vec_id long")
    )
    d2 = {
        r.vec_id: r.decision
        for r in semdedup_from_index(
            spark, _vecs(spark, [(400, _basis(0))]), "sdst"
        ).collect()
    }
    assert d2 == {400: "keep"}

    # retention: expiring ids < 3 releases keeper 2's claims too,
    # while keeper 3 (above the watermark) still claims
    set_retention_watermark(spark, "sdst", 3)
    d3 = {
        r.vec_id: (r.decision, r.dup_of)
        for r in semdedup_from_index(
            spark, _vecs(spark, [(500, _basis(1)), (501, _basis(2))]), "sdst"
        ).collect()
    }
    assert d3 == {500: ("keep", None), 501: ("dup_of_corpus", 3)}


def test_semdedup_from_index_quantized(spark):
    from flink_wsr_project_spark.operators.ann_index import semdedup_from_index

    _write_corpus(spark, "sdsq", quantize=True)
    d = {
        r.vec_id: (r.decision, r.dup_of)
        for r in semdedup_from_index(
            spark, _vecs(spark, [(100, _basis(0)), (101, _basis(6))]), "sdsq"
        ).collect()
    }
    assert d == {100: ("dup_of_corpus", 1), 101: ("keep", None)}


def test_semdedup_loop_grows_corpus_live_and_replays_idempotent(spark, tmp_path):
    """Micro-batch 2 must see micro-batch 1's KEPT vector as corpus
    without a stream restart; a replayed batch re-emits decisions with
    the SAME partner (label may shift within-batch → corpus) and
    absorbs nothing."""
    import os

    from flink_wsr_project_spark.streaming.similarity import semdedup_foreach_batch

    _write_corpus(spark, "sdlp")

    d = str(tmp_path / "semdedup_stream")
    os.makedirs(d, exist_ok=True)

    def write(rows, tag):
        # explicit float32 — pandas would write DOUBLE and the stream
        # schema (array<float>, matching the index) would refuse it
        import pyarrow as pa
        import pyarrow.parquet as pq

        t = pa.table(
            {
                "vec_id": pa.array([r[0] for r in rows], pa.int64()),
                "embedding": pa.array(
                    [r[1] for r in rows], pa.list_(pa.float32())
                ),
            }
        )
        pq.write_table(t, f"{d}/{tag}.parquet")

    seen: dict[int, set] = {}

    def sink(decisions, batch_id):
        seen[batch_id] = {
            (r.vec_id, r.decision, r.dup_of) for r in decisions.collect()
        }

    write([(100, _basis(0)), (201, _basis(5)), (202, _basis(5))], "b1")
    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
    )
    q = (
        stream.writeStream.foreachBatch(
            semdedup_foreach_batch("sdlp", sink, num_buckets=2)
        )
        .start()
    )
    q.processAllAvailable()
    write([(300, _basis(5))], "b2")
    q.processAllAvailable()
    q.stop()

    assert seen[0] == {
        (100, "dup_of_corpus", 1),
        (201, "keep", None),
        (202, "dup_within_batch", 201),
    }
    # the live absorb is what makes this claim possible mid-query:
    assert seen[1] == {(300, "dup_of_corpus", 201)}

    # replay micro-batch 1: same partners, absorb no-op
    lists_before = spark.table("sdlp_lists").count()
    body = semdedup_foreach_batch("sdlp", sink, num_buckets=2)
    body(
        _vecs(spark, [(100, _basis(0)), (201, _basis(5)), (202, _basis(5))]), 0
    )
    assert spark.table("sdlp_lists").count() == lists_before
    # 201 self-excludes from matching itself; 202's partner is still
    # 201, now via the corpus
    assert seen[0] == {
        (100, "dup_of_corpus", 1),
        (201, "keep", None),
        (202, "dup_of_corpus", 201),
    }


def test_semdedup_loop_cold_start_from_empty(spark):
    """r16: with NO index, batch 1 decides WITHIN-BATCH ONLY against
    centroids fitted from the batch itself and the index is written
    from the KEEPERS (store contents == curated corpus from batch 1);
    batch 2 takes the normal probe path and claims against batch-1
    keepers. A crash anywhere in batch 1 replays to the same state
    (deterministic fit + overwrite), and naive concerns are pinned
    absent: no dropped vector is in the index, and a near-dup pair
    loses exactly its HIGHER id (no symmetric corpus self-claim)."""
    from flink_wsr_project_spark.operators.ann_index import ann_index_exists
    from flink_wsr_project_spark.streaming.similarity import semdedup_foreach_batch

    _drop(spark, "sdcold")
    assert not ann_index_exists(spark, "sdcold")

    seen: dict[int, set] = {}

    def sink(decisions, batch_id):
        seen[batch_id] = {
            (r.vec_id, r.decision, r.dup_of) for r in decisions.collect()
        }

    body = semdedup_foreach_batch("sdcold", sink, num_buckets=2)
    b1 = [(10, _basis(0)), (21, _basis(5)), (22, _basis(5))]
    body(_vecs(spark, b1), 0)
    # within-batch-only contract; the near-dup pair loses its higher id
    assert seen[0] == {
        (10, "keep", None),
        (21, "keep", None),
        (22, "dup_within_batch", 21),
    }
    assert ann_index_exists(spark, "sdcold")
    # the index holds exactly the keepers
    assert {r.vec_id for r in spark.table("sdcold_lists").collect()} == {10, 21}

    # batch 2 probes normally and claims against a batch-1 keeper
    body(_vecs(spark, [(30, _basis(5)), (31, _basis(2))]), 1)
    assert seen[1] == {
        (30, "dup_of_corpus", 21),
        (31, "keep", None),
    }
    assert {r.vec_id for r in spark.table("sdcold_lists").collect()} == {
        10, 21, 31,
    }

    # replay batch 1 on the now-existing index: 22's partner is still
    # 21 (label shifts to corpus), keepers self-exclude, absorb no-op
    body(_vecs(spark, b1), 0)
    assert seen[0] == {
        (10, "keep", None),
        (21, "keep", None),
        (22, "dup_of_corpus", 21),
    }
    assert {r.vec_id for r in spark.table("sdcold_lists").collect()} == {
        10, 21, 31,
    }


def test_ann_ingest_loop_cold_start_from_empty(spark):
    """r16: the pure ingest loop bootstraps an absent index from its
    first batch (full overwrite — replay refits the same) and absorbs
    from batch 2 on; a probe equal to a bootstrapped vector returns
    it."""
    from flink_wsr_project_spark.operators.ann_index import (
        ann_index_exists,
        ann_topk_from_index,
        measure_index_drift,
    )
    from flink_wsr_project_spark.streaming.similarity import (
        ann_ingest_foreach_batch,
    )

    _drop(spark, "ingcold")
    assert not ann_index_exists(spark, "ingcold")
    absorbed = []
    body = ann_ingest_foreach_batch(
        "ingcold", num_buckets=2, on_batch=lambda n, b: absorbed.append((b, n))
    )
    b1 = [(1, _basis(0)), (2, _basis(3)), (3, _basis(6))]
    body(_vecs(spark, b1), 0)
    assert ann_index_exists(spark, "ingcold")
    assert measure_index_drift(spark, "ingcold")["fresh_centroid_mismatch"] == 0.0
    body(_vecs(spark, [(4, _basis(6))]), 1)
    assert {r.vec_id for r in spark.table("ingcold_lists").collect()} == {1, 2, 3, 4}
    assert absorbed == [(0, 3), (1, 1)]

    # replay batch 1: index exists -> exclude_existing absorb no-op
    body(_vecs(spark, b1), 0)
    assert spark.table("ingcold_lists").count() == 4

    probe = _vecs(spark, [(99, _basis(6))]).selectExpr(
        "vec_id AS query_id", "embedding AS qv"
    )
    top = {
        (r.neighbor_id, r.rank)
        for r in ann_topk_from_index(spark, probe, "ingcold", k=2).collect()
    }
    assert (3, 1) in top or (4, 1) in top
