"""Incremental span dedup against the persisted positional-gram store
(operators/span_store.py + streaming/dedup.py::span_dedup_foreach_batch)
— the span family's store-backed lifecycle, same contract as its
text/image/embedding siblings: probe-vs-registered-query parity, the
coverage decision precedence (dup_of_corpus ≻ dup_within_batch ≻
keep), idempotent absorb under replay, takedown releasing claims
mid-loop, retention, duplicate-immune probing, compaction with
physical reclamation, and the store side staying exchange-free with
broadcast disabled."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from tests.test_writers import _assert_store_unshuffled


def _docs(spark, rows):
    """rows: (doc_id, text)."""
    return spark.createDataFrame(rows, "doc_id long, text string")


def _toks(prefix, a, b):
    return [f"{prefix}{i}" for i in range(a, b)]


def _drop(spark, prefix):
    for t in (
        f"{prefix}_posgrams",
        f"{prefix}_docs",
        f"{prefix}_tombstones",
        f"{prefix}_retention",
    ):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        spark.sql(f"DROP TABLE IF EXISTS {t}__compact")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
        shutil.rmtree(f"spark-warehouse/{t}__compact", ignore_errors=True)


S = _toks("s", 0, 20)  # the shared 20-token run most tests reuse


def _write_corpus(spark, prefix):
    from flink_wsr_project_spark.operators.span_store import write_span_store

    _drop(spark, prefix)
    corpus = _docs(
        spark,
        [
            (1, " ".join(_toks("f", 0, 4) + S)),        # holds S at pos 4
            (2, " ".join(_toks("g", 0, 30))),            # unrelated
        ],
    )
    write_span_store(spark, corpus, prefix, num_buckets=2)


def test_probe_matches_registered_keep_list(spark, tmp_path):
    """Store-probe parity with the registered query: corpus ids below
    batch ids, uncapped — for every batch doc, the store decision is
    drop-iff the registered ``span_dedup_keep_list`` over corpus∪batch
    drops it, with IDENTICAL covered token counts."""
    import pandas as pd

    from flink_wsr_project_spark.operators.span_store import (
        span_dedup_from_store,
        write_span_store,
    )
    from flink_wsr_project_spark.plans.registry import get

    _drop(spark, "spst_par")
    corpus_rows = [
        (1, " ".join(_toks("f", 0, 4) + S)),
        (2, " ".join(_toks("g", 0, 30))),
    ]
    batch_rows = [
        (100, " ".join(S + _toks("u", 0, 2))),          # corpus clone → drop
        (101, " ".join(_toks("n", 0, 25))),              # novel → keep
        (102, " ".join(_toks("n", 0, 25))),              # clone of 101 → drop
        (103, " ".join(S[:10] + _toks("m", 0, 30))),     # sub-min-span → keep
    ]
    write_span_store(spark, _docs(spark, corpus_rows), "spst_par", num_buckets=2)
    got = {
        r.doc_id: r
        for r in span_dedup_from_store(
            spark, _docs(spark, batch_rows), "spst_par"
        ).collect()
    }

    # registered query over the union, written as a parquet sf dir
    pdf = pd.DataFrame(
        [(i, t, "en", "web", len(t)) for i, t in corpus_rows + batch_rows],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )
    d = tmp_path / "span_union_sf"
    d.mkdir()
    pdf.to_parquet(d / "documents.parquet", index=False)
    want = {
        r.doc_id: r
        for r in get("span_dedup_keep_list").spark_fn(spark, str(d)).collect()
        if r.doc_id >= 100
    }
    assert set(got) == set(want)
    for i in got:
        assert (got[i].decision != "keep") == (want[i].action == "drop"), i
        assert got[i].covered_total == want[i].covered_tokens, i
        assert got[i].n_tokens == want[i].n_tokens, i


def test_decision_precedence_and_coverage_split(spark):
    from flink_wsr_project_spark.operators.span_store import span_dedup_from_store

    _write_corpus(spark, "spst_dec")
    batch = _docs(
        spark,
        [
            (100, " ".join(S + _toks("u", 0, 2))),   # corpus-covered → dup_of_corpus
            (101, " ".join(_toks("n", 0, 25))),      # novel, lower id → keep
            (102, " ".join(_toks("n", 0, 25))),      # 101's clone → dup_within_batch
        ],
    )
    got = {
        r.doc_id: r
        for r in span_dedup_from_store(spark, batch, "spst_dec").collect()
    }
    assert got[100].decision == "dup_of_corpus"
    assert got[100].covered_corpus == 20 and got[100].n_tokens == 22
    assert got[101].decision == "keep" and got[101].covered_total == 0
    assert got[102].decision == "dup_within_batch"
    assert got[102].covered_corpus == 0 and got[102].covered_total == 25


def test_absorb_grows_corpus_replay_idempotent_label_shift(spark):
    from flink_wsr_project_spark.operators.span_store import (
        absorb_spans_into_store,
        span_dedup_from_store,
    )

    _write_corpus(spark, "spst_ab")
    batch = _docs(
        spark,
        [
            (101, " ".join(_toks("n", 0, 25))),
            (102, " ".join(_toks("n", 0, 25))),
        ],
    )
    d1 = span_dedup_from_store(spark, batch, "spst_ab").localCheckpoint()
    n = absorb_spans_into_store(
        spark, batch, d1, "spst_ab", num_buckets=2, exclude_existing=True
    )
    assert n == 1  # only the kept 101; the within-batch dup is not absorbed
    rows_before = spark.table("spst_ab_posgrams").count()

    # next increment: 101's content is now CORPUS
    batch2 = _docs(spark, [(200, " ".join(_toks("n", 0, 25)))])
    d2 = {r.doc_id: r for r in span_dedup_from_store(spark, batch2, "spst_ab").collect()}
    assert d2[200].decision == "dup_of_corpus" and d2[200].covered_corpus == 25

    # replay of batch 1 (at-least-once): absorb appends nothing...
    d1r = span_dedup_from_store(spark, batch, "spst_ab").localCheckpoint()
    nr = absorb_spans_into_store(
        spark, batch, d1r, "spst_ab", num_buckets=2, exclude_existing=True
    )
    assert nr == 0
    assert spark.table("spst_ab_posgrams").count() == rows_before
    # ...and the label-shift contract: 101 self-excludes (still keep),
    # 102's evidence moved from within-batch to corpus — same regions
    got = {r.doc_id: r for r in d1r.collect()}
    assert got[101].decision == "keep"
    assert got[102].decision == "dup_of_corpus"
    assert got[102].covered_corpus == got[102].covered_total == 25


def test_takedown_releases_claims_and_blocks_reabsorb(spark):
    from flink_wsr_project_spark.operators.span_store import (
        absorb_spans_into_store,
        compact_span_store,
        delete_from_span_store,
        span_dedup_from_store,
    )

    _write_corpus(spark, "spst_del")
    batch = _docs(spark, [(100, " ".join(S + _toks("u", 0, 2)))])
    before = {
        r.doc_id: r.decision
        for r in span_dedup_from_store(spark, batch, "spst_del").collect()
    }
    assert before[100] == "dup_of_corpus"

    delete_from_span_store(
        spark, "spst_del", spark.createDataFrame([(1,)], "doc_id long")
    )
    after = {
        r.doc_id: r.decision
        for r in span_dedup_from_store(spark, batch, "spst_del").collect()
    }
    assert after[100] == "keep"  # the deleted keeper's claims released

    # a replayed absorb must not re-admit the deleted doc
    dead_batch = _docs(spark, [(1, " ".join(_toks("f", 0, 4) + S))])
    dd = span_dedup_from_store(spark, dead_batch, "spst_del").localCheckpoint()
    n = absorb_spans_into_store(
        spark, dead_batch, dd, "spst_del", num_buckets=2, exclude_existing=True
    )
    assert n == 0

    # compaction reclaims the physical rows
    out = compact_span_store(spark, "spst_del")
    assert (
        spark.table("spst_del_posgrams").where(F.col("doc_id") == 1).count() == 0
    )
    assert out["spst_del_docs"] == 1  # only doc 2 survives


def test_store_cap_star_preserves_keeper_claims(spark):
    """Over-cap gram in the STORE (3 corpus docs share S, cap=2): the
    probe still finds the full corpus claim via star rows against the
    store's min-id keeper, at exactly the uncapped coverage; deleting
    the keeper promotes the next min-id corpus doc in the stats, so
    the claim survives takedown of the representative."""
    from flink_wsr_project_spark.operators.span_store import (
        delete_from_span_store,
        span_dedup_from_store,
        write_span_store,
    )

    _drop(spark, "spst_cap")
    corpus = _docs(
        spark,
        [
            (1, " ".join(_toks("f", 0, 3) + S)),
            (2, " ".join(S + _toks("g", 0, 2))),
            (3, " ".join(_toks("h", 0, 5) + S)),
        ],
    )
    write_span_store(spark, corpus, "spst_cap", num_buckets=2)
    batch = _docs(spark, [(100, " ".join(S + _toks("u", 0, 4)))])

    capped = {
        r.doc_id: r
        for r in span_dedup_from_store(spark, batch, "spst_cap", cap=2).collect()
    }
    uncapped = {
        r.doc_id: r
        for r in span_dedup_from_store(spark, batch, "spst_cap").collect()
    }
    assert capped[100].decision == "dup_of_corpus"
    assert capped[100].covered_corpus == uncapped[100].covered_corpus == 20

    delete_from_span_store(
        spark, "spst_cap", spark.createDataFrame([(1,)], "doc_id long")
    )
    after = {
        r.doc_id: r
        for r in span_dedup_from_store(spark, batch, "spst_cap", cap=2).collect()
    }
    assert after[100].decision == "dup_of_corpus"
    assert after[100].covered_corpus == 20


def test_probe_is_duplicate_immune_and_compaction_heals(spark):
    """Absorb the same batch twice WITHOUT the idempotence anti-join
    (the crash-between-appends double-append, at its worst): the probe
    must return bit-identical coverage over the physically duplicated
    store (duplicate-tolerant stats + candidate dropDuplicates — a
    naive probe would inflate span lengths via broken row_number
    islands), and compaction heals the physical bloat."""
    from flink_wsr_project_spark.operators.span_store import (
        absorb_spans_into_store,
        compact_span_store,
        span_dedup_from_store,
    )

    _write_corpus(spark, "spst_dup")
    batch = _docs(spark, [(101, " ".join(_toks("n", 0, 25)))])
    d = span_dedup_from_store(spark, batch, "spst_dup").localCheckpoint()
    absorb_spans_into_store(spark, batch, d, "spst_dup", num_buckets=2)
    clean = spark.table("spst_dup_posgrams").count()
    absorb_spans_into_store(spark, batch, d, "spst_dup", num_buckets=2)
    assert spark.table("spst_dup_posgrams").count() > clean  # really duplicated

    probe = {
        r.doc_id: r
        for r in span_dedup_from_store(
            spark, _docs(spark, [(200, " ".join(_toks("n", 0, 25)))]), "spst_dup"
        ).collect()
    }
    assert probe[200].decision == "dup_of_corpus"
    assert probe[200].covered_corpus == 25  # not inflated by duplicates

    compact_span_store(spark, "spst_dup")
    assert spark.table("spst_dup_posgrams").count() == clean
    assert spark.table("spst_dup_docs").where("doc_id = 101").count() == 1


def test_retention_expires_claims_and_blocks_absorb(spark):
    from flink_wsr_project_spark.operators.retention import (
        set_retention_watermark,
    )
    from flink_wsr_project_spark.operators.span_store import (
        absorb_spans_into_store,
        span_dedup_from_store,
    )

    _write_corpus(spark, "spst_ret")
    batch = _docs(spark, [(100, " ".join(S + _toks("u", 0, 2)))])
    assert (
        span_dedup_from_store(spark, batch, "spst_ret").collect()[0].decision
        == "dup_of_corpus"
    )
    set_retention_watermark(spark, "spst_ret", 2)  # doc 1 expires
    d = span_dedup_from_store(spark, batch, "spst_ret").localCheckpoint()
    assert d.collect()[0].decision == "keep"

    # an expired id is refused absorption even when 'keep'
    old = _docs(spark, [(0, " ".join(_toks("q", 0, 30)))])
    dd = span_dedup_from_store(spark, old, "spst_ret").localCheckpoint()
    n = absorb_spans_into_store(spark, old, dd, "spst_ret", num_buckets=2)
    assert n == 0


def test_store_side_stays_exchange_free(spark):
    """With broadcast auto-detection OFF, the posgrams store scan must
    reach its join un-exchanged (the explicit Δ-gram broadcast is the
    designed shape); only Δ-bounded subtrees may shuffle."""
    from flink_wsr_project_spark.operators.span_store import span_dedup_from_store

    _write_corpus(spark, "spst_plan")
    batch = _docs(spark, [(100, " ".join(S + _toks("u", 0, 2)))])
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        d = span_dedup_from_store(spark, batch, "spst_plan")
        _assert_store_unshuffled(d, "spst_plan_posgrams")
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )


def test_streaming_span_loop(spark, tmp_path):
    """The foreachBatch loop end-to-end over a real stream: batch 1
    absorbs a kept doc, batch 2 sees it as corpus, decisions land in
    the sink per batch, and a mid-stream takedown releases a corpus
    claim between micro-batches."""
    import pandas as pd

    from flink_wsr_project_spark.operators.span_store import (
        delete_from_span_store,
        recover_span_store,
    )
    from flink_wsr_project_spark.streaming.dedup import span_dedup_foreach_batch

    _write_corpus(spark, "spst_loop")
    assert recover_span_store(spark, "spst_loop") is False  # clean start

    src = tmp_path / "stream_src"
    src.mkdir()
    sink: dict[int, dict] = {}

    def decisions_sink(df, batch_id):
        sink[batch_id] = {r.doc_id: r.decision for r in df.collect()}

    def _emit(name, rows):
        pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(
            src / name, index=False
        )

    _emit("b1.parquet", [(101, " ".join(_toks("n", 0, 25)))])
    stream = (
        spark.readStream.schema("doc_id long, text string").parquet(str(src))
    )
    q = (
        stream.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(
            span_dedup_foreach_batch("spst_loop", decisions_sink, num_buckets=2)
        )
        .start()
    )
    q.awaitTermination(120)
    assert sink[0] == {101: "keep"}

    # takedown of the ORIGINAL corpus keeper between batches, plus a
    # clone of the absorbed doc — batch 2 must see 101 as corpus and
    # doc 1's claims released
    delete_from_span_store(
        spark, "spst_loop", spark.createDataFrame([(1,)], "doc_id long")
    )
    _emit(
        "b2.parquet",
        [
            (201, " ".join(_toks("n", 0, 25))),          # clone of absorbed 101
            (202, " ".join(S + _toks("u", 0, 2))),       # was corpus-covered by 1
        ],
    )
    q = (
        spark.readStream.schema("doc_id long, text string")
        .parquet(str(src))
        .writeStream.trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(
            span_dedup_foreach_batch("spst_loop", decisions_sink, num_buckets=2)
        )
        .start()
    )
    q.awaitTermination(120)
    last = sink[max(sink)]
    assert last[201] == "dup_of_corpus"
    assert last[202] == "keep"


def test_span_store_health_report(spark):
    """The observability surface extended to the fourth store: one
    metadata-only call reporting fragmentation, deletion mass, the
    retention watermark and layout for the posgrams + docs tables."""
    from flink_wsr_project_spark.operators.retention import (
        set_retention_watermark,
    )
    from flink_wsr_project_spark.operators.span_store import (
        delete_from_span_store,
        write_span_store,
    )
    from flink_wsr_project_spark.operators.store_health import span_store_health

    _write_corpus(spark, "spst_hl")
    delete_from_span_store(
        spark, "spst_hl", spark.createDataFrame([(1,)], "doc_id long")
    )
    set_retention_watermark(spark, "spst_hl", 1)

    h = span_store_health(spark, "spst_hl")
    assert h["prefix"] == "spst_hl"
    assert h["tombstones"] == 1
    assert h["retention_watermark"] == 1
    by_table = {t["table"]: t for t in h["tables"]}
    assert set(by_table) == {"spst_hl_posgrams", "spst_hl_docs"}
    assert by_table["spst_hl_posgrams"]["num_buckets"] == 2
    assert by_table["spst_hl_posgrams"]["needs_compaction"] is False


def test_partitioned_layout_prunes_and_matches(spark):
    """The small-Δ layout: a store written with hash_partitions=P
    probes with a literal gp IN-list that prunes at the directory
    level (PartitionFilters in the scan), returns decisions identical
    to the bucketed-only layout, survives absorb (appends land under
    their gp directories and the NEXT probe sees them), and keeps its
    layout + property through compaction."""
    from flink_wsr_project_spark.operators.incremental_dedup import (
        _store_hash_partitions,
    )
    from flink_wsr_project_spark.operators.span_store import (
        absorb_spans_into_store,
        compact_span_store,
        span_dedup_from_store,
        write_span_store,
    )

    corpus = [
        (1, " ".join(_toks("f", 0, 4) + S)),
        (2, " ".join(_toks("g", 0, 30))),
    ]
    _drop(spark, "spst_pp")
    write_span_store(
        spark, _docs(spark, corpus), "spst_pp", num_buckets=2, hash_partitions=4
    )
    assert _store_hash_partitions(spark, "spst_pp_posgrams") == 4
    _drop(spark, "spst_pb")
    write_span_store(spark, _docs(spark, corpus), "spst_pb", num_buckets=2)

    batch = _docs(
        spark,
        [(100, " ".join(S + _toks("u", 0, 2))), (101, " ".join(_toks("n", 0, 25)))],
    )
    dp = span_dedup_from_store(spark, batch, "spst_pp")
    db = span_dedup_from_store(spark, batch, "spst_pb")
    assert sorted(map(tuple, dp.collect())) == sorted(map(tuple, db.collect()))

    # directory pruning is visible in the scan
    plan = dp._jdf.queryExecution().executedPlan().toString()
    assert any(
        "spst_pp_posgrams" in ln and "PartitionFilters: [gp" in ln
        for ln in plan.splitlines()
    ), "no gp partition filter reached the posgrams scan"

    # absorb preserves the layout; the next probe sees the new corpus
    d1 = dp.localCheckpoint()
    absorb_spans_into_store(
        spark, batch, d1, "spst_pp", num_buckets=2, exclude_existing=True
    )
    d2 = {
        r.doc_id: r.decision
        for r in span_dedup_from_store(
            spark, _docs(spark, [(200, " ".join(_toks("n", 0, 25)))]), "spst_pp"
        ).collect()
    }
    assert d2[200] == "dup_of_corpus"

    # compaction keeps the partition column and the recorded P
    compact_span_store(spark, "spst_pp")
    assert _store_hash_partitions(spark, "spst_pp_posgrams") == 4
    assert "gp" in spark.table("spst_pp_posgrams").columns
    d3 = {
        r.doc_id: r.decision
        for r in span_dedup_from_store(
            spark, _docs(spark, [(201, " ".join(_toks("n", 0, 25)))]), "spst_pp"
        ).collect()
    }
    assert d3[201] == "dup_of_corpus"


def test_store_star_survives_stray_keeper_gram_copy(spark):
    """The store twin of the stray-keeper-copy regression: the corpus
    keeper holds a stray copy of the run's first gram outside the run;
    with the run's grams over-cap, the probe's star arm must still
    recover the FULL 20-token keeper claim (it joins the keeper's own
    occurrence rows, not one precomputed position)."""
    from flink_wsr_project_spark.operators.span_store import (
        span_dedup_from_store,
        write_span_store,
    )

    _drop(spark, "spst_stray")
    corpus = _docs(
        spark,
        [
            (1, " ".join(S[0:8] + _toks("u", 0, 4) + S)),  # stray @0, run @12
            (2, " ".join(S + _toks("v", 0, 3))),
            (3, " ".join(_toks("w", 0, 2) + S)),
        ],
    )
    write_span_store(spark, corpus, "spst_stray", num_buckets=2)
    batch = _docs(spark, [(100, " ".join(S + _toks("y", 0, 4)))])
    capped = span_dedup_from_store(spark, batch, "spst_stray", cap=2).collect()[0]
    uncapped = span_dedup_from_store(spark, batch, "spst_stray").collect()[0]
    assert capped.covered_corpus == uncapped.covered_corpus == 20
    assert capped.decision == "dup_of_corpus"
