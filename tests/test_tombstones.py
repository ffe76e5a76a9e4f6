"""Deletion/tombstones across the three persisted stores (VERDICT r12
#3 — the takedown/compliance lifecycle verb): delete → probes stop
matching immediately (a deleted KEEPER releases its dup claims) →
absorb replays cannot resurrect the id, even AFTER compaction has
physically dropped its rows → compaction reclaims the physical rows
while keeping the (deduplicated) tombstone list → the tombstone
rewrite's own swap crash window recovers at startup. The store side
stays exchange-free with tombstones present: the deleted-id set is
bounded by deletions, so it BROADCASTS into a left-anti join
(operators/tombstones.py)."""

from __future__ import annotations

import shutil

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from tests.test_writers import _assert_store_unshuffled

A = ("alpha bravo charlie delta echo foxtrot golf hotel india juliet"
     " kilo lima mike november oscar papa quebec romeo sierra tango")
B = ("zero nine eight seven six five four three two one plus minus"
     " times divided equals approximately infinity sum product union")


def _drop_tables(spark, *tables):
    for t in tables:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        spark.sql(f"DROP TABLE IF EXISTS {t}__compact")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
        shutil.rmtree(f"spark-warehouse/{t}__compact", ignore_errors=True)


def _simulate_tombstone_swap_crash(spark, prefix):
    """Reproduce the DROP→RENAME crash window of the tombstone rewrite:
    only the __compact temp exists."""
    t = f"{prefix}_tombstones"
    spark.sql(f"DROP TABLE IF EXISTS {t}__compact")
    spark.table(t).distinct().write.format("parquet").saveAsTable(f"{t}__compact")
    spark.sql(f"DROP TABLE {t}")


def test_signature_store_delete_lifecycle(spark):
    from flink_wsr_project_spark.operators.incremental_dedup import (
        absorb_kept_into_store,
        compact_signature_store,
        dedup_incremental_from_store,
        delete_from_signature_store,
        recover_store_compaction,
        write_signature_store,
    )

    _drop_tables(
        spark, "tsig_longsigs", "tsig_hashed", "tsig_tombstones"
    )

    def docs(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    write_signature_store(spark, docs([(2, A), (3, B)]), "tsig", num_buckets=4)

    # before any delete: the clone is claimed by the corpus keeper
    d1 = {
        r.doc_id: (r.decision, r.dup_of)
        for r in dedup_incremental_from_store(spark, docs([(11, A)]), "tsig").collect()
    }
    assert d1 == {11: ("dup_of_corpus", 2)}

    # delete the keeper → probe stops matching it, its claim releases
    assert delete_from_signature_store(spark, "tsig", docs([(2, A)])) == 1
    dec2 = dedup_incremental_from_store(spark, docs([(11, A)]), "tsig")
    d2 = {r.doc_id: (r.decision, r.dup_of) for r in dec2.collect()}
    assert d2 == {11: ("keep", None)}

    # the store side stays exchange-free WITH the tombstone anti-join
    # in the plan (broadcast of the bounded deleted-id set only)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        _assert_store_unshuffled(
            dedup_incremental_from_store(spark, docs([(11, A)]), "tsig"), "tsig"
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))

    # the same content re-enters under a NEW id (kept, then absorbed);
    # a later clone is claimed by the new keeper, not the deleted one
    assert absorb_kept_into_store(spark, docs([(11, A)]), dec2, "tsig", 4) == 1
    d3 = {
        r.doc_id: (r.decision, r.dup_of)
        for r in dedup_incremental_from_store(spark, docs([(21, A)]), "tsig").collect()
    }
    assert d3 == {21: ("dup_of_corpus", 11)}

    # delete the new keeper too, then compact: physical rows of BOTH
    # deleted docs are reclaimed, the tombstone table survives deduped
    delete_from_signature_store(spark, "tsig", docs([(11, A)]))
    delete_from_signature_store(spark, "tsig", docs([(11, A)]))  # re-delete is harmless
    compact_signature_store(spark, "tsig")
    live_ids = {
        r.doc_id for r in spark.table("tsig_hashed").select("doc_id").collect()
    }
    assert live_ids == {3}
    assert {
        r.doc_id for r in spark.table("tsig_longsigs").select("doc_id").distinct().collect()
    } == {3}
    assert spark.table("tsig_tombstones").count() == 2  # deduped

    # replay of the old absorb AFTER compaction: the hashed rows that
    # exclude_existing would have matched are gone — the tombstone
    # mask alone must keep the replay a no-op
    dec_replay = dedup_incremental_from_store(spark, docs([(11, A)]), "tsig")
    assert {r.decision for r in dec_replay.collect()} == {"keep"}
    assert absorb_kept_into_store(
        spark, docs([(11, A)]), dec_replay, "tsig", 4, exclude_existing=True
    ) == 0
    assert absorb_kept_into_store(spark, docs([(11, A)]), dec_replay, "tsig", 4) == 0

    # crash mid tombstone-rewrite swap → startup recovery completes it
    _simulate_tombstone_swap_crash(spark, "tsig")
    assert "tsig_tombstones" in recover_store_compaction(spark, "tsig")
    d4 = {
        r.doc_id: r.decision
        for r in dedup_incremental_from_store(spark, docs([(31, A)]), "tsig").collect()
    }
    assert d4 == {31: "keep"}


def test_dhash_store_delete_lifecycle(spark, tmp_path):
    from flink_wsr_project_spark.operators.image_dedup import (
        absorb_kept_into_dhash_store,
        compact_dhash_store,
        delete_from_dhash_store,
        dhash_block_skew,
        image_dedup_from_store,
        recover_dhash_store,
        write_dhash_store,
    )
    from flink_wsr_project_spark.operators.multimodal import synthesize_image_renders

    def render(rows):
        pdf = pd.DataFrame(
            rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
        )
        d = tmp_path / f"tomb_{rows[0][0]}"
        d.mkdir(exist_ok=True)
        pdf.to_parquet(d / "documents.parquet", index=False)
        return synthesize_image_renders(spark, str(d))

    def ids(*vals):
        return spark.createDataFrame([(v,) for v in vals], "asset_id long")

    _drop_tables(spark, "tblk_blocks", "tblk_tombstones")
    # corpus: doc 2 renders A at width 12, doc 3 renders B at width 16
    write_dhash_store(
        spark,
        render([(2, A, "en", "s", len(A)), (3, B, "en", "s", len(B))]),
        "tblk",
        num_buckets=4,
    )

    day1 = render([(10, A, "en", "s", len(A))])  # clone of 2 (10 % 4 == 2)
    d1 = {
        r.asset_id: (r.decision, r.dup_of)
        for r in image_dedup_from_store(spark, day1, "tblk").collect()
    }
    assert d1 == {10: ("dup_of_corpus", 2)}

    assert delete_from_dhash_store(spark, "tblk", ids(2)) == 1
    dec2 = image_dedup_from_store(spark, day1, "tblk")
    d2 = {r.asset_id: (r.decision, r.dup_of) for r in dec2.collect()}
    assert d2 == {10: ("keep", None)}

    # exchange-free with the tombstone mask in the plan (and the
    # bucket-cap stats path on the LIVE store)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        _assert_store_unshuffled(
            image_dedup_from_store(spark, day1, "tblk", bucket_cap=8), "tblk"
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))

    assert absorb_kept_into_dhash_store(spark, day1, dec2, "tblk", 4) == 1
    day2 = render([(14, A, "en", "s", len(A))])
    d3 = {
        r.asset_id: (r.decision, r.dup_of)
        for r in image_dedup_from_store(spark, day2, "tblk").collect()
    }
    assert d3 == {14: ("dup_of_corpus", 10)}

    # delete the absorbed keeper too; compact reclaims both ids' rows
    delete_from_dhash_store(spark, "tblk", ids(10, 10))
    compact_dhash_store(spark, "tblk")
    assert {
        r.asset_id for r in spark.table("tblk_blocks").select("asset_id").distinct().collect()
    } == {3}
    assert spark.table("tblk_blocks").count() == 4
    assert spark.table("tblk_tombstones").count() == 2

    # post-compaction replay: tombstone mask alone keeps it a no-op
    dec_replay = image_dedup_from_store(spark, day1, "tblk")
    assert {r.decision for r in dec_replay.collect()} == {"keep"}
    assert absorb_kept_into_dhash_store(
        spark, day1, dec_replay, "tblk", 4, exclude_existing=True
    ) == 0
    assert absorb_kept_into_dhash_store(spark, day1, dec_replay, "tblk", 4) == 0

    # the skew report runs over the live store
    assert dhash_block_skew(spark, "tblk", bucket_cap=8).count() == 4

    # crash mid tombstone-rewrite swap → recover completes it
    _simulate_tombstone_swap_crash(spark, "tblk")
    assert recover_dhash_store(spark, "tblk") is True
    d4 = {
        r.asset_id: r.decision
        for r in image_dedup_from_store(spark, day2, "tblk").collect()
    }
    assert d4 == {14: "keep"}


def test_ann_index_delete_lifecycle(spark):
    from flink_wsr_project_spark.operators.ann_index import (
        absorb_vectors_into_index,
        ann_topk_from_index,
        ann_topk_from_index_pruned,
        compact_ann_index,
        delete_from_ann_index,
        measure_index_drift,
        recover_index_compaction,
        write_ann_index,
    )
    from flink_wsr_project_spark.sources.readers import load_table

    _drop_tables(spark, "tann_centroids", "tann_lists", "tann_tombstones")
    emb = load_table(spark, "embeddings", SF_DIR)
    write_ann_index(
        spark, emb, "tann", num_buckets=4, partition_lists=True, reassign=False
    )

    # a fresh query at vec 0's position; whatever ranks FIRST in its
    # probed list is the takedown target (reassign=False keeps the
    # upstream labels, so the probed list need not contain vec 0)
    q = emb.where("vec_id = 0").selectExpr("999999 AS query_id", "embedding AS qv")
    top_before = ann_topk_from_index(spark, q, "tann", k=5).collect()
    target = top_before[0].neighbor_id

    vid = spark.createDataFrame([(target,)], "vec_id long")
    assert delete_from_ann_index(spark, "tann", vid) == 1

    # BOTH probe paths stop returning the deleted vector immediately
    top_after = ann_topk_from_index(spark, q, "tann", k=5).collect()
    assert all(r.neighbor_id != target for r in top_after)
    assert top_after[0].neighbor_id == top_before[1].neighbor_id
    pruned_after = ann_topk_from_index_pruned(spark, q, "tann", k=5, nprobe=2).collect()
    assert all(r.neighbor_id != target for r in pruned_after)

    # absorb (and any replay) refuses the deleted id
    assert absorb_vectors_into_index(
        spark, emb.where(f"vec_id = {target}"), "tann", num_buckets=4
    ) == 0

    # drift measurement runs over the live rows
    d = measure_index_drift(spark, "tann")
    assert d["n_rows"] == emb.count() - 1

    # compaction physically reclaims the row; tombstones survive deduped
    delete_from_ann_index(spark, "tann", vid)  # re-delete is harmless
    compact_ann_index(spark, "tann")
    assert spark.table("tann_lists").where(f"vec_id = {target}").count() == 0
    assert spark.table("tann_tombstones").count() == 1

    # post-compaction replay still a no-op (exclude_existing finds no
    # row to match — the tombstone mask is what stops it)
    assert absorb_vectors_into_index(
        spark, emb.where(f"vec_id = {target}"), "tann", num_buckets=4,
        exclude_existing=True,
    ) == 0

    # crash mid tombstone-rewrite swap → recover completes it
    _simulate_tombstone_swap_crash(spark, "tann")
    assert recover_index_compaction(spark, "tann") is True
    assert all(
        r.neighbor_id != target
        for r in ann_topk_from_index(spark, q, "tann", k=5).collect()
    )


def test_image_loop_takedown_mid_stream(spark, tmp_path):
    """Takedown in the DEPLOYMENT shape: a delete lands BETWEEN
    micro-batches of the continuous image-dedup loop. The next batch's
    clone of the deleted keeper comes back 'keep' (and is absorbed as
    the new keeper); the loop's in-loop compaction dial — now
    compact_dhash_store — physically reclaims the deleted rows while
    the loop keeps running."""
    from flink_wsr_project_spark.operators.image_dedup import (
        delete_from_dhash_store,
        image_dedup_from_store,
        write_dhash_store,
    )
    from flink_wsr_project_spark.operators.multimodal import synthesize_image_renders
    from flink_wsr_project_spark.streaming.dedup import image_dedup_foreach_batch

    def render(rows):
        pdf = pd.DataFrame(
            rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
        )
        d = tmp_path / f"ltomb_{rows[0][0]}"
        d.mkdir(exist_ok=True)
        pdf.to_parquet(d / "documents.parquet", index=False)
        return synthesize_image_renders(spark, str(d))

    _drop_tables(spark, "ltomb_blocks", "ltomb_tombstones")
    write_dhash_store(
        spark, render([(2, A, "en", "s", len(A))]), "ltomb", num_buckets=2
    )

    seen = []
    body = image_dedup_foreach_batch(
        "ltomb",
        lambda d, i: seen.append({r.asset_id: (r.decision, r.dup_of) for r in d.collect()}),
        num_buckets=2,
        max_files_per_bucket=1,  # dial fires on the first absorb append
    )
    # batch 1: a clone of the corpus keeper — claimed, nothing absorbed
    body(render([(6, A, "en", "s", len(A))]), 1)
    assert seen[-1] == {6: ("dup_of_corpus", 2)}

    # takedown lands between micro-batches
    delete_from_dhash_store(
        spark, "ltomb", spark.createDataFrame([(2,)], "asset_id long")
    )

    # batch 2: the same content is now unclaimed → kept and absorbed;
    # the absorb append trips the dial, so the in-loop
    # compact_dhash_store runs and physically drops the deleted rows
    body(render([(10, A, "en", "s", len(A))]), 2)
    assert seen[-1] == {10: ("keep", None)}
    assert {
        r.asset_id
        for r in spark.table("ltomb_blocks").select("asset_id").distinct().collect()
    } == {10}
    assert spark.table("ltomb_tombstones").count() == 1

    # batch 3: a further clone is claimed by the NEW keeper
    body(render([(14, A, "en", "s", len(A))]), 3)
    assert seen[-1] == {14: ("dup_of_corpus", 10)}

    # replay of batch 2 against the compacted store appends nothing
    dec = image_dedup_from_store(
        spark, render([(10, A, "en", "s", len(A))]), "ltomb"
    )
    assert {r.decision for r in dec.collect()} == {"keep"}  # self-excluded probe
    before = spark.table("ltomb_blocks").count()
    body(render([(10, A, "en", "s", len(A))]), 2)  # at-least-once redelivery
    assert spark.table("ltomb_blocks").count() == before


def test_text_loop_takedown_mid_stream(spark):
    """The text twin of the image loop takedown: a delete lands
    between micro-batches of dedup_absorb_foreach_batch — the next
    clone of the deleted keeper is kept (and absorbed as the new
    keeper), and the loop's in-loop compaction (signature compactor)
    physically reclaims the deleted docs' rows mid-stream."""
    from flink_wsr_project_spark.operators.incremental_dedup import (
        delete_from_signature_store,
        write_signature_store,
    )
    from flink_wsr_project_spark.streaming.dedup import dedup_absorb_foreach_batch

    _drop_tables(spark, "stomb_longsigs", "stomb_hashed", "stomb_tombstones")

    def docs(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    write_signature_store(spark, docs([(2, A)]), "stomb", num_buckets=2)

    seen = []
    body = dedup_absorb_foreach_batch(
        "stomb",
        lambda d, i: seen.append({r.doc_id: (r.decision, r.dup_of) for r in d.collect()}),
        num_buckets=2,
        max_files_per_bucket=1,
    )
    body(docs([(6, A)]), 1)
    assert seen[-1] == {6: ("dup_of_corpus", 2)}

    delete_from_signature_store(spark, "stomb", docs([(2, A)]))

    # the clone is now unclaimed → kept + absorbed; the absorb append
    # trips the dial, so the in-loop compact_signature_store runs and
    # physically drops the deleted doc's rows
    body(docs([(10, A)]), 2)
    assert seen[-1] == {10: ("keep", None)}
    assert {
        r.doc_id for r in spark.table("stomb_hashed").select("doc_id").collect()
    } == {10}
    assert spark.table("stomb_tombstones").count() == 1

    body(docs([(14, A)]), 3)
    assert seen[-1] == {14: ("dup_of_corpus", 10)}

    # at-least-once redelivery of batch 2 against the compacted store
    before = spark.table("stomb_hashed").count()
    body(docs([(10, A)]), 2)
    assert spark.table("stomb_hashed").count() == before


def test_ann_probe_loop_sees_takedown_between_batches(spark):
    """The similarity loop's takedown visibility: each micro-batch of
    ann_probe_foreach_batch runs as a batch plan against the index AS
    OF ITS OWN execution, so a delete landing between batches drops
    out of the NEXT batch's results with no restart — unlike a
    stream-static join, which snapshots at query start."""
    from flink_wsr_project_spark.operators.ann_index import (
        delete_from_ann_index,
        write_ann_index,
    )
    from flink_wsr_project_spark.sources.readers import load_table
    from flink_wsr_project_spark.streaming.similarity import ann_probe_foreach_batch

    _drop_tables(spark, "ptomb_centroids", "ptomb_lists", "ptomb_tombstones")
    emb = load_table(spark, "embeddings", SF_DIR)
    write_ann_index(
        spark, emb, "ptomb", num_buckets=4, partition_lists=True, reassign=False
    )

    results = []
    body = ann_probe_foreach_batch(
        "ptomb", lambda df, i: results.append(df.collect()), k=5
    )
    q = emb.where("vec_id = 0").selectExpr("999999 AS vec_id", "embedding")
    body(q, 1)
    target = sorted(results[-1], key=lambda r: r.rank)[0].neighbor_id

    delete_from_ann_index(
        spark, "ptomb", spark.createDataFrame([(int(target),)], "vec_id long")
    )
    body(q, 2)
    after = sorted(results[-1], key=lambda r: r.rank)
    assert all(r.neighbor_id != target for r in after)
    assert len(after) == 5  # the list still yields a full top-k


def test_ingest_state_delete_lifecycle(spark, tmp_path):
    """The directory-state ingest pipeline (pipeline.ingest_batch)
    gets the same deletion contract as the catalog stores: a deleted
    state doc stops claiming incoming duplicates, a deleted id in a
    NEW batch is refused admission (dropped_deleted), compaction
    physically reclaims the rows while the tombstones survive, and
    committed batch_ids stay replay-no-ops."""
    from flink_wsr_project_spark.pipeline import (
        compact_ingest_state,
        delete_from_ingest_state,
        ingest_batch,
    )

    state = str(tmp_path / "ingest_state")

    def docs(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    r1 = ingest_batch(spark, state, docs([(2, A), (3, B)]), "b1")
    assert {r.doc_id for r in r1["admitted"].collect()} == {2, 3}

    # clone of 2 is blocked by state
    r2 = ingest_batch(spark, state, docs([(11, A)]), "b2")
    assert r2["admitted"].count() == 0

    # takedown of 2: the next clone is admitted (claim released)
    assert delete_from_ingest_state(spark, state, docs([(2, A)]).select("doc_id")) == 1
    r3 = ingest_batch(spark, state, docs([(21, A)]), "b3")
    assert {r.doc_id for r in r3["admitted"].collect()} == {21}

    # the deleted id itself is refused re-admission
    r4 = ingest_batch(spark, state, docs([(2, A + " tail")]), "b4")
    assert r4["admitted"].count() == 0
    assert {r.doc_id for r in r4["dropped_deleted"].collect()} == {2}

    # compaction reclaims 2's state rows; 21 (the new keeper) survives
    # and keeps blocking clones; tombstones persist
    compact_ingest_state(spark, state)
    remaining = spark.read.parquet(state).select("doc_id").collect()
    assert {r.doc_id for r in remaining} == {3, 21}
    r5 = ingest_batch(spark, state, docs([(31, A)]), "b5")
    assert r5["admitted"].count() == 0

    # committed batch ids stay replay-no-ops after all of the above
    assert ingest_batch(spark, state, docs([(21, A)]), "b3")["replayed"] is True


def test_tombstone_volume_dial(spark):
    """should_compact_tombstones: the deletion-volume compaction dial —
    fires once the masked-id count crosses the threshold, resets after
    the compaction folds the deletions in (the rewrite keeps the
    deduped ids, so the count itself is unchanged by dedup alone; the
    dial is against unbounded GROWTH, rechecked here across a
    re-delete)."""
    from flink_wsr_project_spark.operators.incremental_dedup import (
        delete_from_signature_store,
        write_signature_store,
    )
    from flink_wsr_project_spark.operators.tombstones import (
        should_compact_tombstones,
        tombstone_count,
    )

    _drop_tables(spark, "tdial_longsigs", "tdial_hashed", "tdial_tombstones")

    def docs(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    write_signature_store(spark, docs([(3, B)]), "tdial", num_buckets=2)
    assert tombstone_count(spark, "tdial") == 0
    assert should_compact_tombstones(spark, "tdial", max_tombstones=2) is False

    ids = spark.range(100, 104).selectExpr("id AS doc_id", "'x' AS text")
    delete_from_signature_store(spark, "tdial", ids)
    assert tombstone_count(spark, "tdial") == 4
    assert should_compact_tombstones(spark, "tdial", max_tombstones=2) is True
    assert should_compact_tombstones(spark, "tdial", max_tombstones=10) is False
    # re-deleting the same ids does not inflate the dial (distinct)
    delete_from_signature_store(spark, "tdial", ids)
    assert tombstone_count(spark, "tdial") == 4


def test_clear_tombstones_readmits(spark):
    """Re-admission is the explicit verb: after clear_tombstones the
    id can be absorbed again as a new corpus member."""
    from flink_wsr_project_spark.operators.incremental_dedup import (
        absorb_kept_into_store,
        dedup_incremental_from_store,
        delete_from_signature_store,
        write_signature_store,
    )
    from flink_wsr_project_spark.operators.tombstones import clear_tombstones

    _drop_tables(spark, "tclr_longsigs", "tclr_hashed", "tclr_tombstones")

    def docs(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    write_signature_store(spark, docs([(3, B)]), "tclr", num_buckets=2)
    delete_from_signature_store(spark, "tclr", docs([(7, A)]))
    dec = dedup_incremental_from_store(spark, docs([(7, A)]), "tclr")
    # tombstoned: the keep decision exists but absorb refuses it
    assert absorb_kept_into_store(spark, docs([(7, A)]), dec, "tclr", 2) == 0

    clear_tombstones(spark, "tclr", docs([(7, A)]).selectExpr("doc_id"), "doc_id")
    dec2 = dedup_incremental_from_store(spark, docs([(7, A)]), "tclr")
    assert absorb_kept_into_store(spark, docs([(7, A)]), dec2, "tclr", 2) == 1
    probe = {
        r.doc_id: (r.decision, r.dup_of)
        for r in dedup_incremental_from_store(spark, docs([(9, A)]), "tclr").collect()
    }
    assert probe == {9: ("dup_of_corpus", 7)}
