"""Retention (bulk age-out) across the three persisted stores — the
watermark complement to targeted tombstones (operators/retention.py):
raise watermark → probes stop matching expired ids IMMEDIATELY (an
expired KEEPER releases its dup claims) → absorb replays of
pre-expiry batches cannot resurrect expired rows → compaction
physically reclaims them while keeping the watermark → the watermark
swap's crash window recovers at startup → lowering the watermark is
refused loudly. Unlike tombstones the mask is a LITERAL filter (no
join, no broadcast): an age-out of 30% of a 100 TB corpus is a
corpus-sized id set, which would break the tombstone contract's
bounded-broadcast assumption — the watermark costs one pushed-down
comparison regardless of how much it expires."""

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
C = ("red orange yellow green blue indigo violet crimson amber teal"
     " magenta cyan maroon olive navy coral salmon ivory pearl jade")


def _drop_tables(spark, *tables):
    for t in tables:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        spark.sql(f"DROP TABLE IF EXISTS {t}__compact")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
        shutil.rmtree(f"spark-warehouse/{t}__compact", ignore_errors=True)


def _simulate_retention_swap_crash(spark, prefix):
    """Reproduce the DROP→RENAME crash window of the watermark rewrite:
    only the __compact temp exists."""
    t = f"{prefix}_retention"
    spark.sql(f"DROP TABLE IF EXISTS {t}__compact")
    spark.table(t).write.format("parquet").saveAsTable(f"{t}__compact")
    spark.sql(f"DROP TABLE {t}")


def test_signature_store_retention_lifecycle(spark):
    from flink_wsr_project_spark.operators.incremental_dedup import (
        absorb_kept_into_store,
        compact_signature_store,
        dedup_incremental_from_store,
        recover_store_compaction,
        write_signature_store,
    )
    from flink_wsr_project_spark.operators.retention import (
        retention_watermark,
        set_retention_watermark,
    )

    _drop_tables(spark, "rsig_longsigs", "rsig_hashed", "rsig_retention")

    def docs(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    write_signature_store(spark, docs([(2, A), (3, B)]), "rsig", num_buckets=4)

    # before retention: clone of A claimed by corpus keeper 2
    d1 = {
        r.doc_id: (r.decision, r.dup_of)
        for r in dedup_incremental_from_store(spark, docs([(11, A)]), "rsig").collect()
    }
    assert d1 == {11: ("dup_of_corpus", 2)}

    # expire everything below 3 → keeper 2's claim releases; 3 still claims
    set_retention_watermark(spark, "rsig", 3)
    d2 = {
        r.doc_id: r.decision
        for r in dedup_incremental_from_store(spark, docs([(11, A)]), "rsig").collect()
    }
    assert d2 == {11: "keep"}
    d2b = {
        r.doc_id: (r.decision, r.dup_of)
        for r in dedup_incremental_from_store(spark, docs([(12, B)]), "rsig").collect()
    }
    assert d2b == {12: ("dup_of_corpus", 3)}

    # the store side stays exchange-free with the literal watermark
    # filter in the plan (broadcast off — no join is even present)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        _assert_store_unshuffled(
            dedup_incremental_from_store(spark, docs([(11, A)]), "rsig"), "rsig"
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))

    # an at-least-once replay of a PRE-EXPIRY batch appends nothing:
    # doc 1 sits below the watermark, whatever its decision says
    dec_old = dedup_incremental_from_store(spark, docs([(1, C)]), "rsig")
    assert {r.decision for r in dec_old.collect()} == {"keep"}
    assert absorb_kept_into_store(spark, docs([(1, C)]), dec_old, "rsig", 4) == 0

    # compaction physically reclaims the expired rows, watermark stays
    compact_signature_store(spark, "rsig")
    assert {
        r.doc_id for r in spark.table("rsig_hashed").select("doc_id").collect()
    } == {3}
    assert retention_watermark(spark, "rsig") == 3

    # raising is the retention operation; lowering is refused
    set_retention_watermark(spark, "rsig", 4)
    assert {
        r.doc_id: r.decision
        for r in dedup_incremental_from_store(spark, docs([(12, B)]), "rsig").collect()
    } == {12: "keep"}
    with pytest.raises(ValueError, match="refused"):
        set_retention_watermark(spark, "rsig", 2)

    # crash mid watermark-swap → store recover completes it
    _simulate_retention_swap_crash(spark, "rsig")
    assert "rsig_retention" in recover_store_compaction(spark, "rsig")
    assert retention_watermark(spark, "rsig") == 4


def test_dhash_store_retention_lifecycle(spark, tmp_path):
    from flink_wsr_project_spark.operators.image_dedup import (
        absorb_kept_into_dhash_store,
        compact_dhash_store,
        dhash_block_skew,
        image_dedup_from_store,
        recover_dhash_store,
        write_dhash_store,
    )
    from flink_wsr_project_spark.operators.multimodal import synthesize_image_renders
    from flink_wsr_project_spark.operators.retention import (
        retention_watermark,
        set_retention_watermark,
    )

    def render(rows):
        pdf = pd.DataFrame(
            rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
        )
        d = tmp_path / f"ret_{rows[0][0]}"
        d.mkdir(exist_ok=True)
        pdf.to_parquet(d / "documents.parquet", index=False)
        return synthesize_image_renders(spark, str(d))

    _drop_tables(spark, "rblk_blocks", "rblk_retention")
    write_dhash_store(
        spark,
        render([(2, A, "en", "s", len(A)), (3, B, "en", "s", len(B))]),
        "rblk",
        num_buckets=4,
    )

    day1 = render([(10, A, "en", "s", len(A))])  # clone of 2 (10 % 4 == 2)
    d1 = {
        r.asset_id: (r.decision, r.dup_of)
        for r in image_dedup_from_store(spark, day1, "rblk").collect()
    }
    assert d1 == {10: ("dup_of_corpus", 2)}

    # expire asset 2 → its claim releases immediately
    set_retention_watermark(spark, "rblk", 3)
    dec2 = image_dedup_from_store(spark, day1, "rblk")
    assert {r.asset_id: r.decision for r in dec2.collect()} == {10: "keep"}

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        _assert_store_unshuffled(
            image_dedup_from_store(spark, day1, "rblk", bucket_cap=8), "rblk"
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))

    # pre-expiry replay refused at absorb (asset 1 < watermark)
    day0 = render([(1, C, "en", "s", len(C))])
    dec_old = image_dedup_from_store(spark, day0, "rblk")
    assert {r.decision for r in dec_old.collect()} == {"keep"}
    assert absorb_kept_into_dhash_store(spark, day0, dec_old, "rblk", 4) == 0

    # fresh content under a live id absorbs fine
    assert absorb_kept_into_dhash_store(spark, day1, dec2, "rblk", 4) == 1

    # compact reclaims expired rows; skew report runs over the live store
    compact_dhash_store(spark, "rblk")
    assert {
        r.asset_id
        for r in spark.table("rblk_blocks").select("asset_id").distinct().collect()
    } == {3, 10}
    assert dhash_block_skew(spark, "rblk", bucket_cap=8).count() == 4

    # crash mid watermark-swap → recover completes it, watermark intact
    _simulate_retention_swap_crash(spark, "rblk")
    assert recover_dhash_store(spark, "rblk") is True
    assert retention_watermark(spark, "rblk") == 3


def test_ann_index_retention_lifecycle(spark):
    from flink_wsr_project_spark.operators.ann_index import (
        absorb_vectors_into_index,
        ann_topk_from_index,
        ann_topk_from_index_pruned,
        compact_ann_index,
        measure_index_drift,
        recover_index_compaction,
        write_ann_index,
    )
    from flink_wsr_project_spark.operators.retention import (
        retention_watermark,
        set_retention_watermark,
    )
    from flink_wsr_project_spark.sources.readers import load_table

    _drop_tables(spark, "rann_centroids", "rann_lists", "rann_retention")
    emb = load_table(spark, "embeddings", SF_DIR)
    write_ann_index(
        spark, emb, "rann", num_buckets=4, partition_lists=True, reassign=False
    )

    q = emb.where("vec_id = 0").selectExpr("999999 AS query_id", "embedding AS qv")
    assert any(
        r.neighbor_id < 100 for r in ann_topk_from_index(spark, q, "rann", k=5).collect()
    )

    # expire the first 100 ids: BOTH probe paths exclude them at once
    set_retention_watermark(spark, "rann", 100)
    top_after = ann_topk_from_index(spark, q, "rann", k=5).collect()
    assert top_after and all(r.neighbor_id >= 100 for r in top_after)
    pruned_after = ann_topk_from_index_pruned(spark, q, "rann", k=5, nprobe=2).collect()
    assert pruned_after and all(r.neighbor_id >= 100 for r in pruned_after)

    # replaying a pre-expiry vector appends nothing; a live id absorbs
    old = emb.where("vec_id = 50").select("vec_id", "embedding")
    assert absorb_vectors_into_index(spark, old, "rann", num_buckets=4) == 0
    fresh = emb.where("vec_id = 50").selectExpr(
        "CAST(600 AS LONG) AS vec_id", "embedding"
    )
    assert absorb_vectors_into_index(spark, fresh, "rann", num_buckets=4) == 1

    # compaction physically reclaims the expired 0..99
    compact_ann_index(spark, "rann")
    assert spark.table("rann_lists").where("vec_id < 100").count() == 0
    assert spark.table("rann_lists").count() == 401  # 100..499 + 600

    # drift measurement runs over the live rows only
    assert measure_index_drift(spark, "rann")["n_rows"] == 401

    # crash mid watermark-swap → recover completes it
    _simulate_retention_swap_crash(spark, "rann")
    assert recover_index_compaction(spark, "rann") is True
    assert retention_watermark(spark, "rann") == 100


def test_retention_composes_with_tombstones(spark):
    """Both masks apply at once: the watermark expires the old tail,
    a tombstone deletes a live id above it — probes see neither, and
    the absorb replay of either appends nothing."""
    from flink_wsr_project_spark.operators.incremental_dedup import (
        absorb_kept_into_store,
        dedup_incremental_from_store,
        delete_from_signature_store,
        write_signature_store,
    )
    from flink_wsr_project_spark.operators.retention import set_retention_watermark

    _drop_tables(
        spark, "rcmb_longsigs", "rcmb_hashed", "rcmb_tombstones", "rcmb_retention"
    )

    def docs(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    write_signature_store(
        spark, docs([(2, A), (5, B), (7, C)]), "rcmb", num_buckets=4
    )
    set_retention_watermark(spark, "rcmb", 5)   # expires 2
    delete_from_signature_store(spark, "rcmb", docs([(5, B)]))  # deletes 5

    dec = {
        r.doc_id: r.decision
        for r in dedup_incremental_from_store(
            spark, docs([(11, A), (12, B), (13, C)]), "rcmb"
        ).collect()
    }
    assert dec == {11: "keep", 12: "keep", 13: "dup_of_corpus"}
    # replays of the expired id and the deleted id both refuse
    for old_id, text in ((2, A), (5, B)):
        d = dedup_incremental_from_store(spark, docs([(old_id, text)]), "rcmb")
        assert absorb_kept_into_store(spark, docs([(old_id, text)]), d, "rcmb", 4) == 0


def test_ingest_state_retention_lifecycle(spark, tmp_path):
    """The directory-state ingest pipeline gets the same retention
    contract as the catalog stores: an expired state doc stops
    claiming incoming duplicates, an expired id in a NEW batch is
    refused admission, compaction physically reclaims expired rows
    while the watermark survives, lowering is refused, and committed
    batch_ids stay replay-no-ops."""
    from flink_wsr_project_spark.pipeline import (
        compact_ingest_state,
        ingest_batch,
        set_ingest_retention,
    )

    state = str(tmp_path / "ingest_ret_state")

    def docs(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    r1 = ingest_batch(spark, state, docs([(2, A), (3, B)]), "b1")
    assert {r.doc_id for r in r1["admitted"].collect()} == {2, 3}
    assert ingest_batch(spark, state, docs([(11, A)]), "b2")["admitted"].count() == 0

    # expire ids < 3: doc 2's claim releases, the next clone is admitted
    set_ingest_retention(spark, state, 3)
    r3 = ingest_batch(spark, state, docs([(21, A)]), "b3")
    assert {r.doc_id for r in r3["admitted"].collect()} == {21}
    # B is still claimed by the live doc 3
    assert ingest_batch(spark, state, docs([(22, B)]), "b4")["admitted"].count() == 0

    # an expired id arriving fresh is refused admission
    r5 = ingest_batch(spark, state, docs([(1, B + " tail")]), "b5")
    assert r5["admitted"].count() == 0

    # compaction reclaims expired rows; watermark keeps masking
    compact_ingest_state(spark, state)
    assert {r.doc_id for r in spark.read.parquet(state).collect()} == {3, 21}
    assert ingest_batch(spark, state, docs([(31, A)]), "b6")["admitted"].count() == 0

    # monotonic: lowering refused; raising expires 3 as well
    import pytest as _pytest

    with _pytest.raises(ValueError, match="refused"):
        set_ingest_retention(spark, state, 2)
    set_ingest_retention(spark, state, 4)
    r7 = ingest_batch(spark, state, docs([(41, B)]), "b7")
    assert {r.doc_id for r in r7["admitted"].collect()} == {41}

    # committed batch ids stay replay-no-ops
    assert ingest_batch(spark, state, docs([(21, A)]), "b3")["replayed"] is True


def test_store_health_reports_all_three_stores(spark):
    """The observability surface (operators/store_health.py): one
    metadata-only call per store reporting fragmentation vs the
    compaction dial, deletion mass vs the tombstone dial, the
    retention watermark, and the spark_graft.* layout properties —
    asserted against stores whose state this suite just manipulated."""
    from flink_wsr_project_spark.operators.incremental_dedup import (
        delete_from_signature_store,
        write_signature_store,
    )
    from flink_wsr_project_spark.operators.retention import set_retention_watermark
    from flink_wsr_project_spark.operators.store_health import (
        ann_index_health,
        dhash_store_health,
        signature_store_health,
    )

    _drop_tables(spark, "rhl_longsigs", "rhl_hashed", "rhl_tombstones", "rhl_retention")

    def docs(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    write_signature_store(
        spark, docs([(2, A), (3, B)]), "rhl", num_buckets=4, hash_partitions=8
    )
    delete_from_signature_store(spark, "rhl", docs([(2, A)]))
    set_retention_watermark(spark, "rhl", 3)

    h = signature_store_health(spark, "rhl")
    assert h["prefix"] == "rhl"
    assert h["tombstones"] == 1
    assert h["needs_tombstone_compaction"] is False
    assert h["retention_watermark"] == 3
    by_table = {t["table"]: t for t in h["tables"]}
    assert by_table["rhl_longsigs"]["num_buckets"] == 4
    assert by_table["rhl_longsigs"]["properties"]["spark_graft.hash_partitions"] == "8"
    assert by_table["rhl_longsigs"]["data_files"] > 0
    # freshly written single-file-per-slot layout: no compaction needed
    assert by_table["rhl_longsigs"]["needs_compaction"] is False

    # the other two stores, against state earlier tests in this module
    # (or this one) built — rblk from the dhash lifecycle, rann from
    # the ANN lifecycle; guard for isolated runs
    if spark.catalog.tableExists("rblk_blocks"):
        hb = dhash_store_health(spark, "rblk")
        props = {t["table"]: t["properties"] for t in hb["tables"]}
        assert "spark_graft.hash_extractor" in props["rblk_blocks"]
        assert hb["retention_watermark"] == 3
    if spark.catalog.tableExists("rann_lists"):
        ha = ann_index_health(spark, "rann")
        assert ha["retention_watermark"] == 100
        assert {t["table"] for t in ha["tables"]} == {"rann_centroids", "rann_lists"}


def test_recover_aggregate_state_multi_old_restores_newest(tmp_path):
    """Two crashes with no recovery between leave TWO __old copies.
    Recovery must restore the NEWEST (the pre-op state of the most
    recent interrupted swap — ordered by the monotonic ns timestamp
    atomic_swap_dir now embeds in the suffix) and QUARANTINE the older
    copy as __stale_* instead of silently deleting it (r14 ADVICE:
    the old uuid-only suffix made the lexicographically-last dir win,
    which could be the stale state, destroying the true one)."""
    import os

    from flink_wsr_project_spark.operators.incremental import (
        recover_aggregate_state,
    )

    base = str(tmp_path / "state")
    old_a = base + "__old_00000000000000000001_aaaaaaaa"  # ancient
    old_b = base + "__old_00000000000000000002_ffffffff"  # newest
    for d, payload in ((old_a, "stale"), (old_b, "true")):
        os.makedirs(d)
        with open(os.path.join(d, "part-0.parquet"), "w") as f:
            f.write(payload)

    assert recover_aggregate_state(base)
    with open(os.path.join(base, "part-0.parquet")) as f:
        assert f.read() == "true"
    stale = [e for e in os.listdir(tmp_path) if "__stale_" in e]
    assert stale == ["state__stale_00000000000000000001_aaaaaaaa"]
    # idempotent: a second run touches nothing (stale is not swept)
    assert not recover_aggregate_state(base)
    assert os.path.isdir(base)


def test_recover_aggregate_state_legacy_uuid_suffix_uses_mtime(tmp_path):
    """Pre-r15 __old dirs carry a bare uuid suffix; ordering falls
    back to directory mtime so mixed legacy/new leftovers still pick
    the newest state."""
    import os
    import time

    from flink_wsr_project_spark.operators.incremental import (
        recover_aggregate_state,
    )

    base = str(tmp_path / "state")
    legacy_old = base + "__old_deadbeef"
    legacy_new = base + "__old_cafebabe"
    now = time.time()
    for d, payload, age in ((legacy_old, "stale", 1000), (legacy_new, "true", 0)):
        os.makedirs(d)
        with open(os.path.join(d, "part-0.parquet"), "w") as f:
            f.write(payload)
        os.utime(d, (now - age, now - age))

    assert recover_aggregate_state(base)
    with open(os.path.join(base, "part-0.parquet")) as f:
        assert f.read() == "true"


def test_prune_decision_log_keeps_last_and_young(tmp_path):
    """Committed decision-log dirs accumulate one-per-micro-batch
    forever without a retention verb (r14 ADVICE). keep_last keeps the
    N highest batch ids; max_age_sec additionally protects young dirs;
    keep_last=None, max_age_sec=None is the audit escape hatch (prunes
    nothing); __tmp dirs and foreign entries are never touched."""
    import os
    import time

    from flink_wsr_project_spark.streaming.curation import prune_decision_log

    log = str(tmp_path / "declog")
    os.makedirs(log)
    for b in range(5):
        os.makedirs(os.path.join(log, f"batch={b}"))
    os.makedirs(os.path.join(log, "batch=9__tmp"))
    os.makedirs(os.path.join(log, "notes"))

    assert prune_decision_log(log, keep_last=None, max_age_sec=None) == []
    assert sorted(prune_decision_log(log, keep_last=2)) == [
        "batch=0", "batch=1", "batch=2",
    ]
    left = sorted(os.listdir(log))
    assert left == ["batch=3", "batch=4", "batch=9__tmp", "notes"]

    # age protection: batch=3 made old, batch=4 young; keep_last=1
    # would drop 3 but max_age_sec protects nothing older — 3 goes
    now = time.time()
    os.utime(os.path.join(log, "batch=3"), (now - 9999, now - 9999))
    assert prune_decision_log(log, keep_last=1, max_age_sec=3600, now=now) == [
        "batch=3"
    ]
    import pytest

    with pytest.raises(ValueError):
        prune_decision_log(log, keep_last=0)
    assert prune_decision_log(str(tmp_path / "absent")) == []


def test_prune_decision_log_takedown_retention_opt_in(tmp_path):
    """takedown= dirs are permanent audit records by DEFAULT (the
    retention asymmetry is deliberate — they answer compliance
    requests); takedown_keep_last=N is the opt-in for loops that have
    offloaded the audit trail: keeps the N newest by mtime, never
    fewer than 1 (the newest is the crash-recovery replay target),
    and composes with the batch-side knobs in one call (r15 ADVICE)."""
    import os
    import time

    import pytest

    from flink_wsr_project_spark.streaming.curation import prune_decision_log

    log = str(tmp_path / "declog")
    os.makedirs(log)
    now = time.time()
    for i, td in enumerate(["t1", "t2", "t3"]):
        d = os.path.join(log, f"takedown={td}")
        os.makedirs(d)
        os.utime(d, (now - 100 + i, now - 100 + i))  # t1 oldest
    os.makedirs(os.path.join(log, "takedown=t9__tmp"))
    for b in range(3):
        os.makedirs(os.path.join(log, f"batch={b}"))

    # default: takedowns untouched even while batches prune
    assert prune_decision_log(log, keep_last=1) == ["batch=0", "batch=1"]
    assert sorted(e for e in os.listdir(log) if e.startswith("takedown=")) == [
        "takedown=t1", "takedown=t2", "takedown=t3", "takedown=t9__tmp",
    ]

    # opt-in: oldest pruned, newest kept, __tmp never touched
    assert prune_decision_log(
        log, keep_last=None, max_age_sec=None, takedown_keep_last=2
    ) == ["takedown=t1"]
    assert sorted(e for e in os.listdir(log) if e.startswith("takedown=")) == [
        "takedown=t2", "takedown=t3", "takedown=t9__tmp",
    ]

    # composes with batch pruning in one call; floor of 1 enforced
    os.makedirs(os.path.join(log, "batch=3"))
    assert prune_decision_log(log, keep_last=1, takedown_keep_last=1) == [
        "takedown=t2", "batch=2",
    ]
    with pytest.raises(ValueError):
        prune_decision_log(log, takedown_keep_last=0)
