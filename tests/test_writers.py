"""Write-path tests: partition pruning and shuffle-free bucketed joins
— the layout features a 100 TB pipeline depends on."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_wsr_project_spark.sources.readers import load_table
from flink_wsr_project_spark.sources.writers import (
    read_table,
    write_bucketed,
    write_partitioned,
)
from tests.conftest import SF_DIR


def _shuffles(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange hashpartitioning" in line
        or "Exchange rangepartitioning" in line
        or "Exchange SinglePartition" in line
    )


def _store_reshuffle_violations(plan: str, marker: str) -> list[str]:
    """Store-side-shuffle check that actually walks the plan TREE: for
    every FileScan of a ``marker`` store table, climb its ancestor
    chain (nearest line above with smaller tree-drawing indent) and
    flag an Exchange/BroadcastExchange encountered BEFORE the first
    Join — i.e. the store being re-shuffled (or shipped whole) on its
    way into its join. Exchanges ABOVE a join are downstream of Δ-sized
    results and fine. The old substring check ("Exchange" and marker on
    ONE line) was vacuous — Spark Exchange lines never name a table."""
    import re as _re

    lines = plan.splitlines()
    depths = [_re.match(r"^[\s:+|-]*", ln).end() for ln in lines]
    bad = []
    for i, ln in enumerate(lines):
        if "_tombstones" in ln:
            # the tombstone side-table (deleted ids) is bounded by
            # deletions, never by the corpus — broadcasting it into the
            # store's anti-join is the designed shape, not a store
            # reshuffle (operators/tombstones.py)
            continue
        if "Scan" in ln and marker in ln:
            d = depths[i]
            agg_seen = False
            for j in range(i - 1, -1, -1):
                if depths[j] < d:
                    d = depths[j]
                    node = lines[j].strip()
                    if "Join" in node or "CartesianProduct" in node:
                        break
                    if "HashAggregate" in node or "ObjectHashAggregate" in node:
                        agg_seen = True
                    if "Exchange" in node:
                        # one allowance: BROADCASTING an AGGREGATED
                        # store subtree (bucket-stats pattern: scan →
                        # bucket-key agg, no exchange → broadcast of the
                        # per-bucket rollup) ships group rows, not the
                        # store. A hash exchange after a partial agg
                        # (non-bucket-key grouping) still flags, as does
                        # broadcasting the raw store.
                        if agg_seen and "BroadcastExchange" in node:
                            break
                        bad.append(f"{node[:100]}  <- over ->  {ln.strip()[:80]}")
                        break
    return bad


def _assert_store_unshuffled(df, marker: str) -> None:
    plan = df._jdf.queryExecution().executedPlan().toString()
    # non-vacuity: the store scan must actually appear in the plan
    assert any(
        "Scan" in ln and marker in ln for ln in plan.splitlines()
    ), f"no {marker} scan in plan — check is vacuous"
    viol = _store_reshuffle_violations(plan, marker)
    assert not viol, f"store-side shuffle: {viol}"


def test_partitioned_write_prunes(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("events_part")) + "/out"
    events = load_table(spark, "events", SF_DIR)
    write_partitioned(events, d, ["event_type"])

    back = spark.read.parquet(d).filter(F.col("event_type") == "view")
    plan = back._jdf.queryExecution().executedPlan().toString()
    # the filter must become a directory-level PartitionFilter, not a scan filter
    assert "PartitionFilters: [isnotnull(event_type" in plan
    assert back.count() == events.filter("event_type = 'view'").count()


def test_bucketed_join_no_shuffle(spark):
    import shutil

    for t in ("orders_b", "lineitem_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    orders = load_table(spark, "orders", SF_DIR)
    lineitem = load_table(spark, "lineitem", SF_DIR)
    write_bucketed(orders, "orders_b", ["o_orderkey"], 8, sort_cols=["o_orderkey"])
    write_bucketed(lineitem, "lineitem_b", ["l_orderkey"], 8, sort_cols=["l_orderkey"])

    ob, lb = read_table(spark, "orders_b"), read_table(spark, "lineitem_b")
    # force the sort-merge path (tiny test tables would broadcast,
    # which also avoids the shuffle but proves nothing about layout)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = ob.join(lb, ob.o_orderkey == lb.l_orderkey)
        # co-located layout: the equi-join runs with zero shuffles
        assert _shuffles(joined) == 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        expected = orders.join(
            lineitem, orders.o_orderkey == lineitem.l_orderkey
        ).count()
        assert joined.count() == expected


def test_bucketed_agg_no_shuffle(spark):
    lb = read_table(spark, "lineitem_b")
    agg = lb.groupBy("l_orderkey").agg(F.count("*").alias("n"))
    assert _shuffles(agg) == 0
    assert agg.count() == load_table(spark, "lineitem", SF_DIR).select("l_orderkey").distinct().count()


def test_compact_parquet(spark, tmp_path):
    from flink_wsr_project_spark.sources.writers import compact_parquet

    d = str(tmp_path / "frag")
    df = spark.range(1000).withColumn("g", F.col("id") % 7)
    df.repartition(50).write.parquet(d)  # fragment into 50 files
    import glob

    assert len(glob.glob(d + "/part-*")) == 50
    n = compact_parquet(spark, d, target_files=4, sort_cols=["id"])
    assert n == 1000
    assert len(glob.glob(d + "/part-*")) == 4
    assert spark.read.parquet(d).count() == 1000


def test_incremental_aggregate_matches_full_recompute(spark, tmp_path):
    """merge(agg(day0), agg(day1)) == agg(day0 ∪ day1) for mergeable
    aggregates — history never re-read."""
    from flink_wsr_project_spark.operators.incremental import update_aggregate_table

    state = str(tmp_path / "agg_state")
    day0 = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 5)], ["k", "v"]
    )
    day1 = spark.createDataFrame(
        [("a", 10), ("c", 7)], ["k", "v"]
    )
    aggs = {
        "n": F.count("*"),
        "total": F.sum("v"),
        "vmin": F.min("v"),
        "vmax": F.max("v"),
    }
    merge_fns = {"n": "sum", "total": "sum", "vmin": "min", "vmax": "max"}

    update_aggregate_table(spark, state, day0, ["k"], aggs, merge_fns)
    got = update_aggregate_table(spark, state, day1, ["k"], aggs, merge_fns)

    full = day0.unionByName(day1).groupBy("k").agg(
        *[c.alias(n) for n, c in aggs.items()]
    )
    want = {(r.k, r.n, r.total, r.vmin, r.vmax) for r in full.collect()}
    assert {(r.k, r.n, r.total, r.vmin, r.vmax) for r in got.collect()} == want


def test_schema_evolution_merge(spark, tmp_path):
    """Long-lived datasets grow columns: mergeSchema unifies old and
    new files; old rows surface NULL for added columns."""
    d = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "x")], ["id", "a"]).write.mode("append").parquet(d)
    spark.createDataFrame([(2, "y", 9.5)], ["id", "a", "score"]).write.mode(
        "append"
    ).parquet(d)
    df = spark.read.option("mergeSchema", "true").parquet(d)
    assert set(df.columns) == {"id", "a", "score"}
    rows = {r.id: r.score for r in df.collect()}
    assert rows[1] is None and rows[2] == 9.5


def _file_stats(path, col):
    """Per-file (min, max) for one column from parquet footer stats."""
    import os

    import pyarrow.parquet as pq

    out = []
    for f in sorted(os.listdir(path)):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, f)).metadata
        idx = md.schema.names.index(col)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        out.append((min(mins), max(maxs)))
    return out


def test_range_clustered_write_prunes_from_footer_stats(spark, tmp_path):
    """Range-clustered files have pairwise-disjoint key ranges, so a
    point/range predicate overlaps exactly one file (footer-stat
    pruning) — an unsorted write overlaps all of them."""
    from flink_wsr_project_spark.sources.writers import write_range_clustered

    df = spark.range(0, 100_000).withColumn("k", (F.col("id") * 7919) % 100_000)
    clustered = str(tmp_path / "clustered")
    naive = str(tmp_path / "naive")
    write_range_clustered(df, clustered, ["k"], num_files=8)
    df.repartition(8).write.parquet(naive)

    stats = _file_stats(clustered, "k")
    assert len(stats) == 8

    def overlapping(stats, point):
        return sum(1 for lo, hi in stats if lo <= point <= hi)

    naive_stats = _file_stats(naive, "k")
    for probe in (5, 31_337, 50_000, 99_999):
        assert overlapping(stats, probe) == 1, f"clustered probe {probe}"
    # mid-domain probes hit every unsorted file (each spans ~the domain)
    assert overlapping(naive_stats, 50_000) == len(naive_stats) > 1


def test_zorder_write_prunes_boxes_on_both_dims(spark, tmp_path):
    """Morton-key clustering bounds BOTH dimensions per file: a small
    2-D box prunes most files via footer stats on either column, and a
    lexicographic (x, y) sort cannot serve a y-only filter — its y
    ranges span the domain in every file."""
    from flink_wsr_project_spark.sources.writers import write_zordered, zorder_key

    n, files = 1 << 16, 16
    df = (
        spark.range(0, n)
        .withColumn("x", (F.col("id") * 48271) % 256)
        .withColumn("y", (F.col("id") * 16807) % 256)
    )
    zpath, lexpath = str(tmp_path / "zord"), str(tmp_path / "lex")
    write_zordered(df, zpath, "x", "y", num_files=files, bits=8)
    (
        df.repartitionByRange(files, "x", "y")
        .sortWithinPartitions("x", "y")
        .write.parquet(lexpath)
    )

    def overlapping(stats, lo, hi):
        return sum(1 for fmin, fmax in stats if not (hi < fmin or lo > fmax))

    # y-only filter: z-order bounds y per file; lexicographic does not
    zy = overlapping(_file_stats(zpath, "y"), 0, 31)
    lexy = overlapping(_file_stats(lexpath, "y"), 0, 31)
    assert zy <= files // 2, f"z-order should prune y-filter, touched {zy}/{files}"
    assert lexy == files, "lex layout serves only its leading column"
    # x-filter: both layouts prune
    assert overlapping(_file_stats(zpath, "x"), 0, 31) <= files // 2
    assert overlapping(_file_stats(lexpath, "x"), 0, 31) <= files // 2

    # the Morton key itself is the documented interleave
    import itertools

    rows = spark.createDataFrame(
        [(x, y) for x, y in itertools.product([0, 1, 2, 255], repeat=2)], ["x", "y"]
    ).select("x", "y", zorder_key("x", "y", bits=8).alias("z")).collect()
    for r in rows:
        want = sum(((r.x >> i) & 1) << (2 * i) | ((r.y >> i) & 1) << (2 * i + 1)
                   for i in range(8))
        assert r.z == want


def test_dynamic_partition_pruning_through_join(spark, tmp_path):
    """At 100 TB the fact scan must not read partitions the dim filter
    eliminates — Spark's dynamic partition pruning injects the dim-side
    values into the fact scan's PartitionFilters at runtime. Proven
    here on a partitionBy(event_type) layout: the plan carries a
    dynamicpruning subquery and the scan reads only the joined key's
    partitions."""
    from pyspark.sql import functions as F

    from flink_wsr_project_spark.sources.readers import load_table

    d = str(tmp_path / "dpp_fact")
    ev = load_table(spark, "events", SF_DIR)
    ev.write.partitionBy("event_type").mode("overwrite").parquet(d)
    fact = spark.read.parquet(d)
    dim = spark.createDataFrame([("view", 1)], ["event_type", "flag"]).filter(
        F.col("flag") == 1
    )
    j = fact.join(dim, "event_type").groupBy("event_type").count()
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()
    rows = j.collect()
    assert len(rows) == 1 and rows[0]["event_type"] == "view"
    want = ev.filter(F.col("event_type") == "view").count()
    assert rows[0]["count"] == want


def test_observed_metrics_come_from_the_write_pass(spark, tmp_path):
    """operators.quality.observed: metrics materialize during the ONE
    action that consumes the frame (here a parquet write) — no second
    scan — and match a direct recompute."""
    from flink_wsr_project_spark.operators.quality import observed

    ev = load_table(spark, "events", SF_DIR)
    df, obs = observed(
        ev,
        "write_metrics",
        {
            "n_rows": F.count(F.lit(1)),
            "n_null_user": F.sum(F.col("user_id").isNull().cast("long")),
            "max_value": F.max("value"),
        },
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "observed_out"))
    got = obs.get
    assert got["n_rows"] == ev.count()
    assert got["n_null_user"] == 0
    assert abs(got["max_value"] - ev.agg(F.max("value")).head()[0]) < 1e-9


def test_incremental_dedup_from_signature_store(spark):
    """The deployment shape of ``dedup_incremental``: corpus signatures
    are written ONCE into bucketed store tables, and the increment
    joins against them. Asserts (a) decision-for-decision equality with
    the one-statement registered query on the same batch/corpus split,
    and (b) the store sides of both joins are shuffle-free — only the
    Δ side exchanges (the property that makes the increment linear in
    |Δ| at 100 TB: the corpus is never re-scanned or re-shuffled)."""
    import shutil

    from flink_wsr_project_spark.operators.incremental_dedup import (
        dedup_incremental_from_store,
        write_signature_store,
    )
    from flink_wsr_project_spark.plans.registry import get

    for t in ("sigstore_longsigs", "sigstore_hashed"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)

    docs = load_table(spark, "documents", SF_DIR)
    corpus = docs.where(~F.expr("doc_id % 3 = 2"))
    batch = docs.where(F.expr("doc_id % 3 = 2"))

    write_signature_store(spark, corpus, "sigstore", num_buckets=8)
    got = dedup_incremental_from_store(spark, batch, "sigstore")

    # the store side must arrive pre-bucketed: no Exchange between a
    # sigstore scan and its join. Asserted with auto-broadcast OFF —
    # at test SF the optimizer would otherwise broadcast the tiny
    # store, which hides exactly the layout property under test (at
    # 100 TB the store cannot be broadcast; bucketing is what saves
    # the shuffle). The (b, h) bucket key must cover the candidate
    # join's FULL key set — bucketing by h alone re-shuffles here.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        _assert_store_unshuffled(
            dedup_incremental_from_store(spark, batch, "sigstore"), "sigstore"
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "SelectedBucketsCount" in plan or "Bucketed: true" in plan

    expected = {
        (r.doc_id, r.decision, r.dup_of)
        for r in get("dedup_incremental").spark_fn(spark, SF_DIR).collect()
    }
    assert {(r.doc_id, r.decision, r.dup_of) for r in got.collect()} == expected
    # non-degenerate: all three decisions appear at this SF
    assert {d for _, d, _ in expected} == {"keep", "dup_of_corpus", "dup_within_batch"}


def test_signature_store_absorbs_kept_docs_across_increments(spark):
    """The day-over-day loop: after an increment's KEPT docs are
    absorbed into the store, the NEXT increment must see them as
    corpus. Day-1 keeps doc 2 and drops its clone 5; day-2's doc 11
    (a clone of 2) must come back dup_of_corpus OF 2 — which can only
    happen if absorption worked (the initial store never contained 2).
    Dropped docs must NOT be absorbed: nothing may ever be attributed
    to 5."""
    import shutil

    from flink_wsr_project_spark.operators.incremental_dedup import (
        absorb_kept_into_store,
        dedup_incremental_from_store,
        write_signature_store,
    )

    for t in ("absorb_longsigs", "absorb_hashed"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)

    A = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima mike november oscar papa"
    B = "red orange yellow green blue indigo violet crimson amber teal navy maroon olive silver gold bronze"
    B2 = B.rsplit(" ", 1)[0] + " copper"

    def docs(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    write_signature_store(spark, docs([(3, B)]), "absorb", num_buckets=4)

    day1 = docs([(2, A), (5, A)])
    dec1 = dedup_incremental_from_store(spark, day1, "absorb")
    got1 = {r.doc_id: (r.decision, r.dup_of) for r in dec1.collect()}
    assert got1 == {2: ("keep", None), 5: ("dup_within_batch", 2)}
    assert absorb_kept_into_store(spark, day1, dec1, "absorb", num_buckets=4) == 1

    day2 = docs([(8, B2), (11, A)])
    got2 = {
        r.doc_id: (r.decision, r.dup_of)
        for r in dedup_incremental_from_store(spark, day2, "absorb").collect()
    }
    assert got2 == {8: ("dup_of_corpus", 3), 11: ("dup_of_corpus", 2)}


def test_ann_index_probe_matches_inline_ivf(spark):
    """The persisted-IVF deployment shape of ``ann_ivf_topk``: index
    written once (centroids + label-bucketed lists), probe batches
    join against it. Asserts (a) row-for-row equality with the inline
    one-statement query on the same probe set (same centroid math,
    same tie-breaks), and (b) the lists side of the search join is
    shuffle-free — only the probe side exchanges."""
    import shutil

    from flink_wsr_project_spark.operators.ann_index import (
        ann_topk_from_index,
        write_ann_index,
    )
    from flink_wsr_project_spark.plans.registry import get

    for t in ("annidx_centroids", "annidx_lists"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)

    emb = load_table(spark, "embeddings", SF_DIR)
    # reassign=False: the labels-as-given mode is what reproduces the
    # inline ann_ivf_topk query bit-for-bit (the inline query trains
    # on and searches the upstream labels; the default build-time
    # Lloyd pass would re-list ~59% of this corpus)
    write_ann_index(spark, emb, "annidx", num_buckets=8, reassign=False)

    queries = emb.where("vec_id % 50 = 0").selectExpr(
        "vec_id AS query_id", "embedding AS qv"
    )
    got = ann_topk_from_index(spark, queries, "annidx", k=5)

    # lists-side shuffle-free, with auto-broadcast off so the tiny test
    # corpus cannot hide the bucketing property behind a broadcast
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        _assert_store_unshuffled(
            ann_topk_from_index(spark, queries, "annidx", k=5), "annidx_lists"
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))

    cols = ("query_id", "probe_label", "neighbor_id", "cosine", "rank")
    want = {tuple(getattr(r, c) for c in cols)
            for r in get("ann_ivf_topk").spark_fn(spark, SF_DIR).collect()}
    assert {tuple(getattr(r, c) for c in cols) for r in got.collect()} == want
    assert len(want) > 0


def test_compact_signature_store_preserves_results(spark):
    """Store lifecycle end: every absorb appends a file set per bucket,
    so after several increments the store is fragmented; compaction
    must shrink the file count, preserve every row, keep the tables
    bucketed (probe join still exchange-free on the store side), and
    leave probe decisions identical."""
    import glob
    import shutil

    from flink_wsr_project_spark.operators.incremental_dedup import (
        absorb_kept_into_store,
        compact_signature_store,
        dedup_incremental_from_store,
        write_signature_store,
    )

    for t in ("cmpst_longsigs", "cmpst_hashed"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)

    def doc(i):
        # disjoint per-doc vocabulary: nothing is a near-dup of anything
        return " ".join(f"word{i}x{j}" for j in range(12))

    docs = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    write_signature_store(spark, docs([(0, doc(0))]), "cmpst", num_buckets=4)

    for day in range(1, 4):
        batch = docs([(day * 10 + j, doc(day * 10 + j)) for j in range(2)])
        dec = dedup_incremental_from_store(spark, batch, "cmpst")
        assert absorb_kept_into_store(spark, batch, dec, "cmpst", num_buckets=4) == 2

    files_before = len(glob.glob("spark-warehouse/cmpst_longsigs/part-*"))
    rows_before = spark.table("cmpst_longsigs").count()
    probe = docs([(99, doc(0)), (98, doc(31))])  # clone of day-0 + clone of day-3
    want = {(r.doc_id, r.decision, r.dup_of)
            for r in dedup_incremental_from_store(spark, probe, "cmpst").collect()}
    assert want == {(99, "dup_of_corpus", 0), (98, "dup_of_corpus", 31)}

    counts = compact_signature_store(spark, "cmpst")
    assert counts["cmpst_longsigs"] == rows_before
    files_after = len(glob.glob("spark-warehouse/cmpst_longsigs/part-*"))
    assert files_after < files_before
    # the rewrite must preserve the catalog bucket spec it discovered
    from flink_wsr_project_spark.sources.writers import table_num_buckets

    assert table_num_buckets(spark, "cmpst_longsigs") == 4

    got = dedup_incremental_from_store(spark, probe, "cmpst")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        _assert_store_unshuffled(
            dedup_incremental_from_store(spark, probe, "cmpst"), "cmpst"
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    assert {(r.doc_id, r.decision, r.dup_of) for r in got.collect()} == want


def test_compaction_heals_replay_duplicated_longsigs(spark):
    """The absorb crash window between its two appends: longsigs lands
    first, the replay idempotency anti-join checks only the hashed
    table — so a crash there leaves the replay re-appending band rows.
    Decisions are immune (the probe distincts candidates) but the
    store bloats and pair-stream consumers see duplicates; compaction
    must HEAL it (the longsigs table is a set by construction, so the
    rewrite dropDuplicates is always sound)."""
    import shutil

    from flink_wsr_project_spark.operators.incremental_dedup import (
        _longsigs_df,
        absorb_kept_into_store,
        compact_signature_store,
        dedup_incremental_from_store,
        write_signature_store,
    )

    for t in ("heal_longsigs", "heal_hashed"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)

    docs = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    A = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    write_signature_store(spark, docs([(1, A)]), "heal", num_buckets=4)

    day = docs([(2, "one two three four five six seven eight nine ten")])
    dec = dedup_incremental_from_store(spark, day, "heal")
    assert absorb_kept_into_store(spark, day, dec, "heal", num_buckets=4) == 1

    # simulate the crashed-then-replayed first append: the band rows of
    # doc 2 land a second time (the anti-join never saw its hashed row)
    _longsigs_df(spark, day).write.bucketBy(4, "b", "h").mode("append").format(
        "parquet"
    ).saveAsTable("heal_longsigs")
    distinct_rows = spark.table("heal_longsigs").distinct().count()
    assert spark.table("heal_longsigs").count() > distinct_rows

    probe = docs([(9, A)])
    want = {(r.doc_id, r.decision, r.dup_of)
            for r in dedup_incremental_from_store(spark, probe, "heal").collect()}

    counts = compact_signature_store(spark, "heal")
    assert counts["heal_longsigs"] == distinct_rows
    assert spark.table("heal_longsigs").count() == distinct_rows
    got = {(r.doc_id, r.decision, r.dup_of)
           for r in dedup_incremental_from_store(spark, probe, "heal").collect()}
    assert got == want == {(9, "dup_of_corpus", 1)}


def test_should_compact_trigger_fires_and_resets_in_absorb_loop(spark):
    """VERDICT r10 task: compaction scheduling as code. The
    ``should_compact`` check must stay False on a fresh store, cross
    its threshold after enough absorb appends, and the loop-integrated
    trigger (dedup_absorb_foreach_batch(max_files_per_bucket=...))
    must then compact so the next check is False again — with probe
    decisions preserved across the whole lifecycle."""
    import shutil

    from flink_wsr_project_spark.operators.incremental_dedup import (
        dedup_incremental_from_store,
        write_signature_store,
    )
    from flink_wsr_project_spark.sources.writers import should_compact
    from flink_wsr_project_spark.streaming.dedup import dedup_absorb_foreach_batch

    for t in ("trig_longsigs", "trig_hashed"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)

    def doc(i):
        return " ".join(f"trg{i}w{j}" for j in range(12))

    docs = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    write_signature_store(spark, docs([(0, doc(0))]), "trig", num_buckets=2)
    assert should_compact(spark, "trig_longsigs", max_files_per_bucket=2) is False

    seen = []
    body = dedup_absorb_foreach_batch(
        "trig", lambda d, i: seen.append(d.count()), num_buckets=2,
        max_files_per_bucket=2,
    )
    from flink_wsr_project_spark.sources.writers import table_data_file_stats

    for day in range(1, 7):
        body(docs([(day * 10, doc(day * 10))]), day)
        # the in-loop trigger bounds the scan cost INVARIANTLY: after
        # every batch the store holds at most dial × buckets files
        n_files, _ = table_data_file_stats(spark, "trig_longsigs")
        assert n_files <= 2 * 2, f"day {day}: {n_files} files — trigger never fired"
    # 7 write ops (initial + 6 appends) each created >= 1 file, so a
    # bounded end state proves at least one consolidating rewrite ran
    assert should_compact(spark, "trig_longsigs", max_files_per_bucket=2) is False
    assert len(seen) == 6

    # every absorbed doc is still probe-visible after the compactions
    got = {(r.doc_id, r.decision, r.dup_of)
           for r in dedup_incremental_from_store(
               spark, docs([(99, doc(30))]), "trig").collect()}
    assert got == {(99, "dup_of_corpus", 30)}

    import pytest

    with pytest.raises(ValueError, match="max_files_per_bucket"):
        should_compact(spark, "trig_longsigs", max_files_per_bucket=0)


def test_ann_ingest_loop_absorbs_and_compacts(spark):
    """The ANN ingest loop (streaming/similarity.py): vectors fold in
    per micro-batch (replay-idempotent), the file-count trigger
    compacts the lists table, and probes see every absorbed vector
    afterwards."""
    import shutil

    from flink_wsr_project_spark.operators.ann_index import (
        ann_topk_from_index_pruned,
        write_ann_index,
    )
    from flink_wsr_project_spark.sources.writers import should_compact
    from flink_wsr_project_spark.streaming.similarity import ann_ingest_foreach_batch
    from flink_wsr_project_spark.sources.readers import load_table

    for t in ("aing_centroids", "aing_lists"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)

    emb = load_table(spark, "embeddings", SF_DIR)
    write_ann_index(spark, emb, "aing", partition_lists=True)
    v0 = emb.where("vec_id = 0").select("embedding").first().embedding

    absorbed = []
    body = ann_ingest_foreach_batch(
        "aing", max_files_per_bucket=2, on_batch=lambda n, i: absorbed.append(n)
    )
    for i in range(5):
        newvec = spark.createDataFrame(
            [(930000 + i, v0)], "vec_id long, embedding array<float>"
        )
        body(newvec, i)
    # replay of the last batch is a no-op
    body(spark.createDataFrame([(930004, v0)], "vec_id long, embedding array<float>"), 5)
    assert absorbed == [1, 1, 1, 1, 1, 0]
    assert should_compact(spark, "aing_lists", max_files_per_bucket=2) is False

    probe = spark.createDataFrame([(940000, v0)], "query_id long, qv array<float>")
    # the build-time Lloyd pass means vec 0 ITSELF now lives in the
    # probed list (pre-r12, the as-given labels were 59% inconsistent
    # and vec 0 often wasn't); it ties every clone at cosine 1.0 and
    # wins on id, so top-6 = vec 0 + all five absorbed clones
    got = {r.neighbor_id
           for r in ann_topk_from_index_pruned(spark, probe, "aing", k=6).collect()}
    assert got == {0, 930000, 930001, 930002, 930003, 930004}


def test_ann_ingest_loop_retrains_quantized_when_drift_crosses_dial(spark):
    """VERDICT r11 #6: a QUANTIZED index in the streaming ingest loop
    must be able to EXECUTE its retrain when the drift dial fires —
    retrain_ann_index rejects int8 self-training, so the loop hands
    the float corpus through ``retrain_source_fn``. Drive the
    controlled drift geometry through one micro-batch: the absorbed
    boundary cluster splits 40/10 (fresh mismatch 10/90 > dial 0.05),
    the in-loop trigger retrains from the source, the cluster is
    reunified into ONE list (the proof a retrain actually ran — an
    absorb alone leaves the 40/10 split), the index stays quantized,
    and the two-stage rerank probe returns float-exact top-5 for the
    cluster members. Misconfigured pairings die on the FIRST batch."""
    import shutil

    import pytest

    from flink_wsr_project_spark.operators.ann_index import (
        QUANTIZED_LISTS_PROP,
        ann_topk_from_index_pruned,
        write_ann_index,
    )
    from flink_wsr_project_spark.streaming.similarity import ann_ingest_foreach_batch
    from tests.test_ann_drift import _vec

    for t in ("qing_centroids", "qing_lists", "qing_retrain_src",
              "fing_centroids", "fing_lists"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)

    rows = []
    for i in range(20):
        rows.append((i, 0, _vec(**{"0": 1.0, str(20 + (i % 8)): 0.02 * (i + 1)})))
    for i in range(20):
        rows.append(
            (100 + i, 1, _vec(**{"1": 1.0, str(28 + (i % 8)): 0.02 * (i + 1)}))
        )
    org = spark.createDataFrame(rows, "vec_id long, label bigint, embedding array<float>")
    write_ann_index(spark, org, "qing", partition_lists=True, quantize=True)

    cl = []
    for i in range(50):
        base = {"0": 1.04, "1": 1.0, str(10 + (i % 6)): 0.01 * (i + 1)}
        if i % 5 == 0:
            base["0"] = 0.96
        cl.append((1000 + i, _vec(**base)))

    # the source of truth grows with the loop: org + everything absorbed
    source_rows = [(v, e) for v, _, e in rows] + cl

    def source_fn(s):
        return s.createDataFrame(source_rows, "vec_id long, embedding array<float>")

    body = ann_ingest_foreach_batch(
        "qing", max_fresh_mismatch=0.05, retrain_source_fn=source_fn
    )
    body(spark.createDataFrame(cl, "vec_id long, embedding array<float>"), 0)

    split = {
        r.label: r.n
        for r in spark.table("qing_lists").where("vec_id >= 1000")
        .groupBy("label").agg(F.count("*").alias("n")).collect()
    }
    assert list(split.values()) == [50], f"cluster not reunified: {split}"
    props = {r.key: r.value
             for r in spark.sql("SHOW TBLPROPERTIES qing_lists").collect()}
    assert props.get(QUANTIZED_LISTS_PROP) == "true"
    assert "eq" in spark.table("qing_lists").columns

    # float-exact top-5 via the two-stage rerank: every cluster query's
    # neighbors are the brute-force float top-5 (one list holds them all)
    queries = spark.createDataFrame(
        cl[:10], "vec_id long, embedding array<float>"
    ).selectExpr("vec_id AS query_id", "embedding AS qv")
    src = source_fn(spark)
    got = {}
    for r in ann_topk_from_index_pruned(
        spark, queries, "qing", k=5, rerank_from=src, rerank_m=200
    ).collect():
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    queries.createOrReplaceTempView("_qing_q")
    src.createOrReplaceTempView("_qing_c")
    from flink_wsr_project_spark.operators.similarity import cosine_expr
    exact = spark.sql(f"""
SELECT query_id, neighbor_id FROM (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         row_number() OVER (PARTITION BY q.query_id
           ORDER BY {cosine_expr('q.qv', 'e.embedding', 'spark')} DESC, e.vec_id
         ) AS rank
  FROM _qing_q q JOIN _qing_c e ON e.vec_id <> q.query_id
) WHERE rank <= 5""")
    truth = {}
    for r in exact.collect():
        truth.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert got == truth

    # misconfigured pairings die on batch 0, not at the drift crossing
    one = spark.createDataFrame([(5000, _vec(**{"0": 1.0}))],
                                "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="retrain_source_fn"):
        ann_ingest_foreach_batch("qing", max_fresh_mismatch=0.05)(one, 0)
    write_ann_index(spark, org, "fing", partition_lists=True)
    with pytest.raises(ValueError, match="shadow"):
        ann_ingest_foreach_batch(
            "fing", max_fresh_mismatch=0.05, retrain_source_fn=source_fn
        )(one, 0)


def test_pruned_probe_matches_full_on_partitioned_store(spark):
    """The SMALL-Δ fast path over a hash-partitioned store. Asserts
    (a) decision-for-decision equality with the regular bucketed-join
    probe on the same full batch/corpus split (all three decisions
    non-degenerate), (b) on a tiny Δ the band-table scan is pruned at
    the directory level (PartitionFilters carries the hp IN-list and
    the scan reads fewer partitions than the store holds), and (c) the
    candidate join broadcasts the Δ side — the store is neither
    shuffled nor, thanks to (b), fully scanned."""
    import shutil

    from flink_wsr_project_spark.operators.incremental_dedup import (
        dedup_incremental_from_store,
        dedup_incremental_from_store_pruned,
        write_signature_store,
    )

    for t in ("psig_longsigs", "psig_hashed"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)

    docs = load_table(spark, "documents", SF_DIR)
    corpus = docs.where(~F.expr("doc_id % 3 = 2"))
    batch = docs.where(F.expr("doc_id % 3 = 2"))

    write_signature_store(spark, corpus, "psig", num_buckets=4, hash_partitions=16)

    want = {
        (r.doc_id, r.decision, r.dup_of)
        for r in dedup_incremental_from_store(spark, batch, "psig").collect()
    }
    assert {d for _, d, _ in want} == {"keep", "dup_of_corpus", "dup_within_batch"}
    got_full = {
        (r.doc_id, r.decision, r.dup_of)
        for r in dedup_incremental_from_store_pruned(spark, batch, "psig").collect()
    }
    assert got_full == want

    # tiny Δ: one doc that IS in-corpus duplicated, one that is not —
    # its 4 band hashes touch ≤ 8 of the 16 hp partitions, so the
    # IN-list must actually prune
    dup_id = min(d for d, dec, _ in want if dec == "dup_of_corpus")
    keep_id = min(d for d, dec, _ in want if dec == "keep")
    tiny = docs.where(F.col("doc_id").isin([dup_id, keep_id]))
    pruned = dedup_incremental_from_store_pruned(spark, tiny, "psig")

    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    ls_scan = [
        ln for ln in plan.splitlines() if "psig_longsigs" in ln and "PartitionFilters" in ln
    ]
    assert ls_scan and any("hp" in ln for ln in ls_scan), plan
    _assert_store_unshuffled(pruned, "psig")

    got_tiny = {(r.doc_id, r.decision) for r in pruned.collect()}
    assert got_tiny == {(dup_id, "dup_of_corpus"), (keep_id, "keep")}


def test_absorb_and_compact_preserve_partitioned_layout(spark):
    """Absorbing into and compacting a PARTITIONED store must keep the
    hp/dp layout columns, the recorded partition count, and the pruned
    probe's answers — compaction must not silently demote the store to
    bucketed-only."""
    import shutil

    from flink_wsr_project_spark.operators.incremental_dedup import (
        _store_hash_partitions,
        absorb_kept_into_store,
        compact_signature_store,
        dedup_incremental_from_store,
        dedup_incremental_from_store_pruned,
        write_signature_store,
    )

    for t in ("pabs_longsigs", "pabs_hashed"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)

    A = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima mike november oscar papa"
    B = "red orange yellow green blue indigo violet crimson amber teal navy maroon olive silver gold bronze"

    def mk(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    write_signature_store(spark, mk([(3, B)]), "pabs", num_buckets=4, hash_partitions=8)

    day1 = mk([(2, A), (5, A)])
    dec1 = dedup_incremental_from_store(spark, day1, "pabs")
    assert absorb_kept_into_store(spark, day1, dec1, "pabs", num_buckets=4) == 1
    assert _store_hash_partitions(spark, "pabs_longsigs") == 8

    day2 = mk([(11, A)])
    got2 = {
        (r.doc_id, r.decision, r.dup_of)
        for r in dedup_incremental_from_store_pruned(spark, day2, "pabs").collect()
    }
    assert got2 == {(11, "dup_of_corpus", 2)}

    compact_signature_store(spark, "pabs")
    assert _store_hash_partitions(spark, "pabs_longsigs") == 8
    assert "hp" in spark.table("pabs_longsigs").columns
    assert "dp" in spark.table("pabs_hashed").columns
    got3 = {
        (r.doc_id, r.decision, r.dup_of)
        for r in dedup_incremental_from_store_pruned(spark, day2, "pabs").collect()
    }
    assert got3 == got2


def test_pruned_ann_probe_matches_bucketed_index(spark):
    """The partitioned-lists ANN layout: directory per inverted list,
    probe batch reads only its assigned lists. Asserts row-for-row
    equality with the bucketed index probe (same centroid math, same
    tie-breaks), label PartitionFilters on the lists scan, broadcast
    probe side, and no lists-side shuffle."""
    import shutil

    from flink_wsr_project_spark.operators.ann_index import (
        ann_topk_from_index,
        ann_topk_from_index_pruned,
        write_ann_index,
    )

    for t in ("pann_centroids", "pann_lists", "bann_centroids", "bann_lists"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)

    emb = load_table(spark, "embeddings", SF_DIR)
    write_ann_index(spark, emb, "bann", num_buckets=8)
    write_ann_index(spark, emb, "pann", partition_lists=True)

    queries = emb.where("vec_id % 50 = 0").selectExpr(
        "vec_id AS query_id", "embedding AS qv"
    )
    got = ann_topk_from_index_pruned(spark, queries, "pann", k=5)

    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    scan = [
        ln for ln in plan.splitlines() if "pann_lists" in ln and "PartitionFilters" in ln
    ]
    assert scan and any("label" in ln for ln in scan), plan
    _assert_store_unshuffled(got, "pann_lists")

    cols = ("query_id", "probe_label", "neighbor_id", "cosine", "rank")
    want = {tuple(getattr(r, c) for c in cols)
            for r in ann_topk_from_index(spark, queries, "bann", k=5).collect()}
    assert {tuple(getattr(r, c) for c in cols) for r in got.collect()} == want
    assert len(want) > 0

    # a single-query probe must touch exactly one list directory
    one = ann_topk_from_index_pruned(
        spark, queries.limit(1), "pann", k=5
    )
    plan1 = one._jdf.queryExecution().executedPlan().toString()
    import re as _re
    m = [ln for ln in plan1.splitlines() if "pann_lists" in ln and "PartitionFilters" in ln]
    # one assigned list → a single-partition filter (Catalyst folds a
    # 1-element IN to equality); the label is BIGINT since the r12
    # build-time Lloyd pass (attribute prints with an L suffix)
    assert m and _re.search(r"label#\d+L? (= \S+|IN \([^,)]+\))", m[0]), m


def test_pruned_ann_nprobe_recall_is_monotone(spark):
    """The pruned probe's nprobe recall dial: recall@5 against exact
    brute-force cosine must be monotone in nprobe (the candidate set
    only grows), and nprobe = number-of-lists must BE exact
    brute-force (every list searched). Reuses the partitioned index
    from the layout test's prefix, rebuilt fresh."""
    import shutil

    from flink_wsr_project_spark.operators.ann_index import (
        ann_topk_from_index_pruned,
        write_ann_index,
    )

    for t in ("nann_centroids", "nann_lists"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)

    emb = load_table(spark, "embeddings", SF_DIR)
    write_ann_index(spark, emb, "nann", partition_lists=True)
    n_lists = spark.table("nann_centroids").count()
    queries = emb.where("vec_id % 50 = 0").selectExpr(
        "vec_id AS query_id", "embedding AS qv"
    )

    # exact top-5: brute-force cosine over the whole corpus, same
    # tie-break (cosine DESC, neighbor_id), self-matches excluded
    from flink_wsr_project_spark.operators.similarity import cosine_expr

    exact = spark.sql(
        f"""
SELECT query_id, neighbor_id FROM (
  SELECT a.query_id, e.vec_id AS neighbor_id,
         row_number() OVER (
           PARTITION BY a.query_id
           ORDER BY {cosine_expr('a.qv', 'e.embedding', 'spark')} DESC, e.vec_id
         ) AS rank
  FROM (SELECT vec_id AS query_id, embedding AS qv
        FROM {{emb}} WHERE vec_id % 50 = 0) a
  JOIN {{emb}} e ON e.vec_id <> a.query_id
) WHERE rank <= 5
""",
        emb=emb,
    )
    truth = {}
    for r in exact.collect():
        truth.setdefault(r.query_id, set()).add(r.neighbor_id)

    def recall(nprobe):
        got = {}
        rows = ann_topk_from_index_pruned(
            spark, queries, "nann", k=5, nprobe=nprobe
        ).collect()
        for r in rows:
            got.setdefault(r.query_id, set()).add(r.neighbor_id)
        hits = sum(len(got.get(q, set()) & t) for q, t in truth.items())
        total = sum(len(t) for t in truth.values())
        return hits / total

    r1, r2, rall = recall(1), recall(2), recall(int(n_lists))
    assert r1 <= r2 <= rall
    assert rall == 1.0  # all lists probed == exact brute force
    assert r1 > 0


def test_store_and_index_reject_invalid_layout_params(spark):
    """Build-time validation: bad layout constants fail loudly at the
    call site, never as a silently-degenerate store (same discipline
    as the KMV k<2 and TTL-vs-watermark rejections)."""
    import pytest

    from flink_wsr_project_spark.operators.ann_index import (
        ann_topk_from_index_pruned,
    )
    from flink_wsr_project_spark.operators.incremental_dedup import (
        dedup_incremental_from_store_pruned,
        write_signature_store,
    )

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="hash_partitions"):
        write_signature_store(spark, docs, "badstore", hash_partitions=-1)
    with pytest.raises(ValueError, match="nprobe"):
        ann_topk_from_index_pruned(
            spark, docs.selectExpr("doc_id AS query_id"), "nann", nprobe=0
        )
    # a bucketed-only store rejects the pruned probe with guidance
    import shutil

    for t in ("bonly_longsigs", "bonly_hashed"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    write_signature_store(spark, docs, "bonly", num_buckets=2)
    with pytest.raises(ValueError, match="not hash-partitioned"):
        dedup_incremental_from_store_pruned(spark, docs, "bonly")


def test_absorb_vectors_into_index_and_probe_sees_them(spark):
    """Index lifecycle: new vectors fold into the persisted index under
    their nearest existing centroid; probes then find them (same
    assignment rule on both sides), replay with exclude_existing
    absorbs nothing, and both layouts (partitioned and bucketed lists)
    take their append path."""
    import shutil

    from flink_wsr_project_spark.operators.ann_index import (
        absorb_vectors_into_index,
        ann_topk_from_index,
        ann_topk_from_index_pruned,
        write_ann_index,
    )

    for t in ("vabs_centroids", "vabs_lists", "vabsb_centroids", "vabsb_lists"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)

    emb = load_table(spark, "embeddings", SF_DIR)
    write_ann_index(spark, emb, "vabs", partition_lists=True)

    v0 = emb.where("vec_id = 0").select("embedding").first().embedding
    newvec = spark.createDataFrame(
        [(900001, v0)], "vec_id long, embedding array<float>"
    )
    assert absorb_vectors_into_index(spark, newvec, "vabs") == 1
    # replay is a no-op with exclude_existing
    assert (
        absorb_vectors_into_index(spark, newvec, "vabs", exclude_existing=True) == 0
    )

    probe = spark.createDataFrame(
        [(900002, v0)], "query_id long, qv array<float>"
    )
    got = {
        (r.neighbor_id, r.rank)
        for r in ann_topk_from_index_pruned(spark, probe, "vabs", k=5).collect()
    }
    # probe, absorb, and (since r12) the BUILD all share the
    # nearest-centroid rule, so the probed list is guaranteed to hold
    # BOTH vec 0 and its absorbed clone: cosine 1.0 ties break on id —
    # vec 0 rank 1, the clone rank 2. (Pre-r12 vec 0's upstream label
    # could put it in a different list; that build-time asymmetry is
    # what write_ann_index's Lloyd pass removed.)
    assert {(0, 1), (900001, 2)} <= got

    # bucketed-layout arm
    write_ann_index(spark, emb, "vabsb", num_buckets=4)
    assert absorb_vectors_into_index(spark, newvec, "vabsb", num_buckets=4) == 1
    got_b = {
        (r.neighbor_id, r.rank)
        for r in ann_topk_from_index(spark, probe, "vabsb", k=5).collect()
    }
    assert {(0, 1), (900001, 2)} <= got_b


def test_compact_ann_index_preserves_probe_results(spark):
    """ANN lifecycle end: repeated vector absorbs fragment the lists
    table; compaction must shrink files, preserve rows and the
    partitioned layout, and leave probe results identical."""
    import glob
    import shutil

    from flink_wsr_project_spark.operators.ann_index import (
        absorb_vectors_into_index,
        ann_topk_from_index_pruned,
        compact_ann_index,
        write_ann_index,
    )

    for t in ("cann_centroids", "cann_lists"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)

    emb = load_table(spark, "embeddings", SF_DIR)
    write_ann_index(spark, emb, "cann", partition_lists=True)
    v0 = emb.where("vec_id = 0").select("embedding").first().embedding
    for i in range(3):
        newvec = spark.createDataFrame(
            [(910000 + i, v0)], "vec_id long, embedding array<float>"
        )
        assert absorb_vectors_into_index(spark, newvec, "cann") == 1

    probe = spark.createDataFrame([(920000, v0)], "query_id long, qv array<float>")
    want = {
        (r.neighbor_id, r.rank)
        for r in ann_topk_from_index_pruned(spark, probe, "cann", k=5).collect()
    }
    assert {910000, 910001, 910002} <= {n for n, _ in want}

    files_before = len(glob.glob("spark-warehouse/cann_lists/*/part-*"))
    rows_before = spark.table("cann_lists").count()
    assert compact_ann_index(spark, "cann") == rows_before
    files_after = len(glob.glob("spark-warehouse/cann_lists/*/part-*"))
    assert files_after < files_before
    assert "label" in spark.table("cann_lists").columns

    got = {
        (r.neighbor_id, r.rank)
        for r in ann_topk_from_index_pruned(spark, probe, "cann", k=5).collect()
    }
    assert got == want


def test_recover_interrupted_compaction_swaps(spark):
    """The compact swap's crash windows are RECOVERABLE BY CODE, not by
    hand: simulate the crash between DROP and RENAME (only the
    __compact temp exists) and the crash before the DROP (both exist,
    live is authoritative) for the signature store, and the temp-only
    window for the ANN index; recovery restores identical probe
    results and is idempotent."""
    import shutil

    from flink_wsr_project_spark.operators.ann_index import (
        ann_topk_from_index_pruned,
        recover_index_compaction,
        write_ann_index,
    )
    from flink_wsr_project_spark.operators.incremental_dedup import (
        dedup_incremental_from_store,
        recover_store_compaction,
        write_signature_store,
    )

    for t in ("rcv_longsigs", "rcv_hashed", "rcvann_centroids", "rcvann_lists"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        spark.sql(f"DROP TABLE IF EXISTS {t}__compact")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
        shutil.rmtree(f"spark-warehouse/{t}__compact", ignore_errors=True)

    docs = load_table(spark, "documents", SF_DIR)
    corpus = docs.where(~F.expr("doc_id % 3 = 2"))
    batch = docs.where(F.expr("doc_id % 3 = 2")).limit(20)
    write_signature_store(spark, corpus, "rcv", num_buckets=4, hash_partitions=8)
    want = {
        (r.doc_id, r.decision, r.dup_of)
        for r in dedup_incremental_from_store(spark, batch, "rcv").collect()
    }

    # crash window A: temp written, live dropped, rename never ran.
    # The real compact stamps the hash-format identity on the temp
    # BEFORE the drop (so no crash state is ever unstamped) — the
    # simulation mirrors that order.
    from flink_wsr_project_spark.operators.dedup import SIG_HASH_FORMAT
    from flink_wsr_project_spark.operators.incremental_dedup import (
        SIG_HASH_FORMAT_PROP,
    )

    for t in ("rcv_longsigs", "rcv_hashed"):
        spark.table(t).write.saveAsTable(f"{t}__compact")  # layout-agnostic copy
        if t == "rcv_longsigs":
            spark.sql(
                f"ALTER TABLE {t}__compact SET TBLPROPERTIES "
                f"('{SIG_HASH_FORMAT_PROP}'='{SIG_HASH_FORMAT}')"
            )
        spark.sql(f"DROP TABLE {t}")
    assert sorted(recover_store_compaction(spark, "rcv")) == [
        "rcv_hashed",
        "rcv_longsigs",
    ]
    got = {
        (r.doc_id, r.decision, r.dup_of)
        for r in dedup_incremental_from_store(spark, batch, "rcv").collect()
    }
    assert got == want
    # idempotent re-run: nothing left to recover
    assert recover_store_compaction(spark, "rcv") == []

    # crash window B: temp written, DROP never ran — live stays, temp goes
    spark.table("rcv_longsigs").write.saveAsTable("rcv_longsigs__compact")
    assert recover_store_compaction(spark, "rcv") == []
    assert not spark.catalog.tableExists("rcv_longsigs__compact")

    # ANN index, window A
    emb = load_table(spark, "embeddings", SF_DIR)
    write_ann_index(spark, emb, "rcvann", partition_lists=True)
    probe = spark.createDataFrame(
        [(1, emb.where("vec_id = 0").select("embedding").first().embedding)],
        "query_id long, qv array<float>",
    )
    want_ann = {
        (r.neighbor_id, r.rank)
        for r in ann_topk_from_index_pruned(spark, probe, "rcvann", k=5).collect()
    }
    spark.table("rcvann_lists").write.partitionBy("label").saveAsTable(
        "rcvann_lists__compact"
    )
    spark.sql("ALTER TABLE rcvann_lists__compact SET TBLPROPERTIES "
              "('spark_graft.partitioned_lists'='true')")
    spark.sql("DROP TABLE rcvann_lists")
    assert recover_index_compaction(spark, "rcvann") is True
    got_ann = {
        (r.neighbor_id, r.rank)
        for r in ann_topk_from_index_pruned(spark, probe, "rcvann", k=5).collect()
    }
    assert got_ann == want_ann


def test_compaction_refuses_legacy_bucket_columns(spark):
    """A store persisted under an older bucket layout (longsigs
    bucketed by [h] alone, pre-(b,h)) must be REFUSED by compaction
    with a rebuild hint — the overwrite-to-temp rewrite would
    otherwise silently re-bucket the table under the operator."""
    import pytest

    from flink_wsr_project_spark.operators.incremental_dedup import (
        _longsigs_df,
        compact_signature_store,
    )

    for t in ("legacy_longsigs", "legacy_hashed"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil_rmtree(f"spark-warehouse/{t}")
    docs = spark.createDataFrame([(1, "a b c d e f")], "doc_id long, text string")
    # hand-write the PRE-r11 layout: longsigs bucketed by h alone
    _longsigs_df(spark, docs).write.bucketBy(4, "h").mode("overwrite").format(
        "parquet"
    ).saveAsTable("legacy_longsigs")
    spark.createDataFrame([(1, [1, 2, 3])], "doc_id long, hv array<bigint>").write.bucketBy(
        4, "doc_id"
    ).mode("overwrite").format("parquet").saveAsTable("legacy_hashed")

    # unstamped, the (earlier) hash-format gate fires — that rejection
    # is exercised on its own in test_store_rejects_wrong_hash_format;
    # stamp the table so the BUCKET-LAYOUT refusal is what this test
    # pins
    from flink_wsr_project_spark.operators.dedup import SIG_HASH_FORMAT
    from flink_wsr_project_spark.operators.incremental_dedup import (
        SIG_HASH_FORMAT_PROP,
    )

    spark.sql(
        "ALTER TABLE legacy_longsigs SET TBLPROPERTIES "
        f"('{SIG_HASH_FORMAT_PROP}'='{SIG_HASH_FORMAT}')"
    )
    with pytest.raises(ValueError, match="predates"):
        compact_signature_store(spark, "legacy")


def test_store_rejects_wrong_hash_format(spark):
    """The signature store's r16 identity stamp: a store with no
    recorded hash format (pre-r16 md5-shingle-string scheme) or a
    MISMATCHED one is refused by probe, absorb and compact with a
    rebuild hint — probing blind would silently match nothing and
    keep every true dup (the span/image store discipline)."""
    import pytest

    from flink_wsr_project_spark.operators.incremental_dedup import (
        SIG_HASH_FORMAT_PROP,
        absorb_kept_into_store,
        compact_signature_store,
        dedup_incremental_from_store,
        dedup_incremental_from_store_pruned,
        write_signature_store,
    )

    for t in ("fmtchk_longsigs", "fmtchk_hashed"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil_rmtree(f"spark-warehouse/{t}")
    docs = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "g h i j k l")], "doc_id long, text string"
    )
    write_signature_store(spark, docs, "fmtchk", num_buckets=2)
    # a fresh write IS stamped and probes fine
    assert dedup_incremental_from_store(spark, docs.limit(1), "fmtchk").count() == 1

    # mismatched stamp (a future/past scheme) → every surface refuses
    spark.sql(
        "ALTER TABLE fmtchk_longsigs SET TBLPROPERTIES "
        f"('{SIG_HASH_FORMAT_PROP}'='md5sh28v1')"
    )
    decisions = spark.createDataFrame(
        [(1, "keep", None)], "doc_id long, decision string, dup_of long"
    )
    for fn in (
        lambda: dedup_incremental_from_store(spark, docs, "fmtchk"),
        lambda: dedup_incremental_from_store_pruned(spark, docs, "fmtchk"),
        lambda: absorb_kept_into_store(spark, docs, decisions, "fmtchk", 2),
        lambda: compact_signature_store(spark, "fmtchk"),
    ):
        with pytest.raises(ValueError, match="md5sh28v1"):
            fn()

    # missing stamp (pre-r16 store) → refused with the rebuild hint
    spark.sql(
        f"ALTER TABLE fmtchk_longsigs UNSET TBLPROPERTIES ('{SIG_HASH_FORMAT_PROP}')"
    )
    with pytest.raises(ValueError, match="no recorded hash format"):
        dedup_incremental_from_store(spark, docs, "fmtchk")


def shutil_rmtree(path):
    import shutil

    shutil.rmtree(path, ignore_errors=True)
