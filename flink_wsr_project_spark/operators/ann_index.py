"""Persisted IVF index for approximate-nearest-neighbor search.

The registered ``ann_ivf_topk`` query (plans/pipeline_queries.py)
trains centroids and searches in one statement so the whole path is
oracle-checkable. THIS module is the deployment shape: the index —
per-list centroids plus the inverted lists themselves — is written
ONCE, bucketed on the list key, and every probe batch afterwards
costs: one broadcast of the (tiny) centroid table, one nearest-list
assignment over the probe rows only, and one equi-join against the
bucketed lists where ONLY the probe side shuffles. The corpus
embeddings are never re-scanned or re-shuffled per query batch — the
same store discipline as the dedup signature store
(operators/incremental_dedup.py), applied to similarity search.

Index layout (two tables):

* ``<prefix>_centroids`` (label, cv array<double>) — one row per
  inverted list; small by construction (lists ≪ corpus), always
  broadcast;
* ``<prefix>_lists``     (vec_id, label, embedding) bucketed by
  ``label`` — the inverted lists the probe join targets.

Centroid math is byte-identical to ``ann_ivf_topk``'s (component-wise
mean via integer-scaled sums — order-independent under any
parallelism), and the probe reproduces its assignment and ranking
tie-breaks exactly, so index-vs-inline equality is assertable
row-for-row (tests/test_writers.py).

At 100 TB: lists are the partition unit — nprobe-1 search touches
~1/n_lists of the corpus per query, and because the lists are
bucketed, that touch is a co-located join, not a shuffle. Growing the
corpus re-buckets nothing (bucketed appends); re-training centroids is
the periodic compaction analogue, scheduled by drift, not by size.

Recall note: a vector whose stored ``label`` (the upstream
partitioner's assignment) differs from its nearest CENTROID is
invisible to an nprobe=1 probe landing on that centroid — inherent to
IVF whenever list assignment and centroid geometry drift apart, and
exactly what the registered recall queries measure and the ``nprobe``
dial recovers. ``absorb_vectors_into_index`` assigns by nearest
centroid (the probes' own rule), so absorbed vectors never add to
this asymmetry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from flink_wsr_project_spark.operators.similarity import cosine_expr
from flink_wsr_project_spark.sources.writers import write_bucketed

# Table property marking a lists table as PARTITIONED BY label (the
# directory-per-inverted-list layout the pruned probe needs).
PARTITIONED_LISTS_PROP = "spark_graft.partitioned_lists"

# Table property marking a lists table as int8-QUANTIZED (IVF-SQ8):
# the lists store `eq array<tinyint>` INSTEAD of the float embedding —
# measured 3.85× fewer compressed parquet bytes per vector column at
# sf0.01 (SCALE.md round 11), which at 100 TB is the difference
# between a feasible and an infeasible list scan. Probes score cosine
# over the int arrays (the per-vector 127/max|x| scale CANCELS in
# cosine, so no scale column is stored); recall of that scoring is the
# externally-verified ann_quantized_recall result. Float re-rank
# fetches original vectors from the SOURCE corpus by id — the index
# deliberately does not hold a second float copy.
QUANTIZED_LISTS_PROP = "spark_graft.quantized_lists"


def quantized_expr(vec: str) -> str:
    """Per-vector symmetric int8 quantization of a float array —
    byte-identical math to the registered ``ann_quantized_recall``
    query (plans/pipeline_queries.py::_quantized_recall_sql): scale
    127 / max|x| (NULL elements for a zero vector — its cosine is NULL
    and ranks last, the float path's zero-norm contract), explicit
    ``floor(v + 0.5)`` rounding. TINYINT holds the full [-127, 127]
    range; the scoring promotes to double either way, so the values
    are identical to the query's INT variant."""
    maxabs = (
        f"aggregate({vec}, CAST(0.0 AS DOUBLE), "
        f"(acc, x) -> greatest(acc, abs(CAST(x AS DOUBLE))))"
    )
    return (
        f"transform({vec}, x -> CAST(floor(CAST(x AS DOUBLE) * 127.0 / "
        f"nullif({maxabs}, 0.0) + 0.5) AS TINYINT))"
    )


def _lists_props(spark: SparkSession, table_prefix: str) -> tuple[bool, bool]:
    """(partitioned, quantized) flags of an index's lists table."""
    rows = spark.sql(f"SHOW TBLPROPERTIES {table_prefix}_lists").collect()
    props = {r.key: r.value for r in rows}
    return (
        props.get(PARTITIONED_LISTS_PROP) == "true",
        props.get(QUANTIZED_LISTS_PROP) == "true",
    )


def _centroid_sql(view: str) -> str:
    """Per-label centroid over (label, embedding) rows in ``view`` —
    integer-scaled component means (order-independent under any
    parallelism), the exact expression ``ann_ivf_topk`` trains."""
    return f"""
WITH exploded AS (
  SELECT label, pos, CAST(x AS DOUBLE) AS x
  FROM {view} LATERAL VIEW posexplode(embedding) t AS pos, x
),
comp AS (
  SELECT label, pos,
         sum(CAST(round(x * 1000000) AS BIGINT)) / (count(*) * 1000000.0) AS val
  FROM exploded GROUP BY label, pos
)
SELECT label,
       transform(array_sort(collect_list(struct(pos, val))), s -> s.val) AS cv
FROM comp GROUP BY label
"""


def _lloyd_consistent_labels(
    spark: SparkSession, rows: DataFrame, max_iters: int
) -> DataFrame:
    """Assign-to-nearest-mean iterated from the input's labels until no
    assignment changes (or ``max_iters``) — the classic Lloyd loop with
    centroids as driver literals (k·d scalars ride the plan; the data
    never shuffles for assignment, the ``embedding_kmeans`` shape).
    Returns (vec_id, label, embedding) at a fixed point where every
    row's label IS its nearest fresh-centroid label. Build-time cost:
    two scans of the input per pass (means aggregate + changed count);
    k-means training is inherently iterative — paying it ONCE at build
    is what keeps ``should_retrain`` quiet until real absorb drift,
    instead of firing on a brand-new index (VERDICT r11 #2: the
    as-given labels of the test corpus start 0.59 inconsistent; the
    loop reaches changed=0 on that corpus at iteration 22). Cosine
    assignment over plain means is not monotone like Euclidean Lloyd,
    so convergence within ``max_iters`` is not guaranteed in general —
    a residual is bounded by the final changed fraction and lands in
    ``fresh_centroid_mismatch``, where ``should_retrain``'s dial
    judges it like any other drift.

    Convergence is detected by MEANS equality, not a changed-count
    job: assignments are a deterministic function of the means and
    vice versa, so identical consecutive means ⇔ a fixed point — one
    k·d collect per pass instead of two jobs."""
    cur = rows
    prev: tuple | None = None
    for _ in range(max_iters):
        cur.createOrReplaceTempView("_ann_build_rows")
        means = spark.sql(_centroid_sql("_ann_build_rows")).collect()
        key = _centroid_literals(means)
        if key == prev:
            break
        prev = key
        labels, arrs = key
        cur = rows.select(
            "vec_id",
            F.expr(_nearest_label_expr("embedding", labels, arrs)).alias("label"),
            "embedding",
        )
    return cur


def ann_index_exists(spark: SparkSession, table_prefix: str) -> bool:
    """True iff BOTH index tables exist. A partial state (centroids
    written, lists missing — the crash window inside a first-batch
    bootstrap) reports False on purpose: the healing move is a full
    re-fit (``write_ann_index``/``bootstrap_ann_index`` overwrite both
    tables), and a replayed bootstrap batch does exactly that."""
    return spark.catalog.tableExists(
        f"{table_prefix}_centroids"
    ) and spark.catalog.tableExists(f"{table_prefix}_lists")


def bootstrap_ann_index(
    spark: SparkSession,
    vectors: DataFrame,
    table_prefix: str,
    k: int = 8,
    num_buckets: int = 8,
    partition_lists: bool = False,
    quantize: bool = False,
    max_reassign_iters: int = 40,
) -> None:
    """Cold-start fit from UNLABELED (vec_id, embedding) rows — the
    verb that makes an ANN-bearing curation loop deployable from zero
    (r15 verdict #3: every other store family bootstraps from its
    first batch; centroid training is a corpus fit the absorb path
    cannot do). Labels are seeded deterministically (``pmod(vec_id,
    k)`` — replay-stable, no RNG) and ``write_ann_index``'s Lloyd
    reassignment drives them to the usual fixed point, so a
    bootstrapped index is indistinguishable from one written with
    externally trained labels: fresh_centroid_mismatch starts at 0
    and probes reproduce the inline query bit-for-bit.

    ``k`` caps the list count; fewer than ``k`` distinct vec_ids
    simply yields fewer lists (empty seed labels vanish at the first
    means step). Crash posture: both tables are overwritten, so any
    partial state heals on re-run; ``ann_index_exists`` treats a
    half-written pair as absent for exactly this reason."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    seeded = vectors.select(
        "vec_id", F.pmod("vec_id", F.lit(k)).alias("label"), "embedding"
    )
    write_ann_index(
        spark,
        seeded,
        table_prefix,
        num_buckets=num_buckets,
        partition_lists=partition_lists,
        quantize=quantize,
        reassign=True,
        max_reassign_iters=max_reassign_iters,
    )


def write_ann_index(
    spark: SparkSession,
    embeddings: DataFrame,
    table_prefix: str,
    num_buckets: int = 8,
    partition_lists: bool = False,
    quantize: bool = False,
    reassign: bool = True,
    max_reassign_iters: int = 40,
) -> None:
    """One-time index build from (vec_id, embedding, label) rows: the
    ``label`` column seeds the inverted-list assignment (k-means or any
    other partitioner upstream); centroids are the per-list
    integer-scaled component means — the exact expression
    ``ann_ivf_topk`` trains, so probes against the store reproduce the
    inline query bit-for-bit.

    With ``reassign=True`` (the default) the seed labels are first
    driven to a Lloyd fixed point (:func:`_lloyd_consistent_labels`):
    every stored vector's list IS its nearest-centroid list, so a
    freshly written index measures ``fresh_centroid_mismatch`` = 0 and
    does not trip ``should_retrain`` — drift then measures only what
    absorbs accumulate. ``reassign=False`` stores the labels AS GIVEN
    (whatever asymmetry they carry included): the mode that reproduces
    the inline ``ann_ivf_topk`` query bit-for-bit and the mode
    controlled-geometry drift tests use.

    With ``partition_lists=True`` the lists table is written
    PARTITIONED BY ``label`` — one directory per inverted list — which
    is what lets the pruned probe (:func:`ann_topk_from_index_pruned`)
    read ONLY the lists a probe batch is assigned to, instead of
    scanning the whole corpus the way the bucketed layout must. The
    IVF list is the natural partition unit: its cardinality is the
    (small, constant) number of lists, and nprobe-style multi-probe
    just widens the pruned set.

    With ``quantize=True`` the lists table stores the int8-quantized
    ``eq array<tinyint>`` INSTEAD of the float embedding (IVF-SQ8 —
    see ``QUANTIZED_LISTS_PROP``); centroids are still trained on the
    floats, so probe-to-list assignment is unchanged and only the
    in-list scoring moves to integer cosine."""
    rows = embeddings.select("vec_id", "label", "embedding")
    if reassign:
        rows = _lloyd_consistent_labels(spark, rows, max_reassign_iters)
    rows.createOrReplaceTempView("_ann_index_input")
    centroids = spark.sql(_centroid_sql("_ann_index_input"))
    write_bucketed(centroids, f"{table_prefix}_centroids", ["label"], 1)
    if quantize:
        lists = rows.select(
            "vec_id", "label", F.expr(quantized_expr("embedding")).alias("eq")
        )
    else:
        lists = rows.select("vec_id", "label", "embedding")
    if partition_lists:
        (
            lists.write.partitionBy("label")
            .mode("overwrite")
            .format("parquet")
            .saveAsTable(f"{table_prefix}_lists")
        )
        spark.sql(
            f"ALTER TABLE {table_prefix}_lists SET TBLPROPERTIES "
            f"('{PARTITIONED_LISTS_PROP}'='true')"
        )
    else:
        write_bucketed(lists, f"{table_prefix}_lists", ["label"], num_buckets)
    if quantize:
        spark.sql(
            f"ALTER TABLE {table_prefix}_lists SET TBLPROPERTIES "
            f"('{QUANTIZED_LISTS_PROP}'='true')"
        )


def delete_from_ann_index(
    spark: SparkSession, table_prefix: str, vec_ids: DataFrame
) -> int:
    """Takedown for the index: record vec_ids as tombstones
    (operators/tombstones.py; O(|ids|), no list rewrite). Probes —
    bucketed, pruned, and two-stage reranked — stop returning the
    deleted vectors immediately; absorbs and replays refuse to re-add
    them; drift measurement and retrain run over the live rows only;
    :func:`compact_ann_index` (or the next retrain's rebuild) reclaims
    the physical rows. Returns the number of ids recorded."""
    from flink_wsr_project_spark.operators.tombstones import add_tombstones

    return add_tombstones(spark, table_prefix, vec_ids, "vec_id")


def _live_lists(spark: SparkSession, table_prefix: str) -> DataFrame:
    """The lists table minus tombstoned vec_ids — the frame every read
    path (probes, drift, retrain, compaction) must use. The anti-join
    broadcasts the bounded deleted-id set; the lists side keeps its
    bucketed/partitioned layout and stays exchange-free."""
    from flink_wsr_project_spark.operators.retention import live_rows

    return live_rows(
        spark, spark.table(f"{table_prefix}_lists"), table_prefix, "vec_id"
    )


def ann_topk_from_index(
    spark: SparkSession,
    queries: DataFrame,
    table_prefix: str,
    k: int = 5,
) -> DataFrame:
    """Top-k cosine neighbors for each (query_id, qv) probe row using
    the persisted index, nprobe=1: broadcast the centroid table, assign
    each query to its nearest list (ties by smallest label, matching
    ``ann_ivf_topk``), search only that bucketed list. Self-matches
    (neighbor_id == query_id) are excluded, matching the inline query.
    Returns (query_id, probe_label, neighbor_id, cosine, rank).

    Against a QUANTIZED index the query vector is quantized in-row
    with the write path's exact scheme and ``cosine`` is the integer
    cosine — the scoring whose recall ``ann_quantized_recall``
    verifies externally."""
    _, quantized = _lists_props(spark, table_prefix)
    queries.createOrReplaceTempView("_ann_query_input")
    spark.table(f"{table_prefix}_centroids").createOrReplaceTempView("_ann_centroids")
    _live_lists(spark, table_prefix).createOrReplaceTempView("_ann_lists")
    if quantized:
        # quantize in a projection BELOW the centroid cross join so the
        # max|x| + transform pass runs once per QUERY, not once per
        # (query × centroid) row; assignment still scores on the float
        # form (centroids are float-trained)
        probe_src = (
            f"(SELECT query_id, qv AS fqv, {quantized_expr('qv')} AS qv8 "
            f"FROM _ann_query_input) q"
        )
        probe_vec = "q.qv8 AS qv"
        cos_qc = cosine_expr("q.fqv", "c.cv", "spark")
        cos_qe = cosine_expr("a.qv", "e.eq", "spark")
    else:
        probe_src = "_ann_query_input q"
        probe_vec = "q.qv"
        cos_qc = cosine_expr("q.qv", "c.cv", "spark")
        cos_qe = cosine_expr("a.qv", "e.embedding", "spark")
    return spark.sql(
        f"""
WITH probes AS (
  SELECT query_id, qv, probe_label FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY cos_c DESC, probe_label
    ) AS rn FROM (
      SELECT /*+ BROADCAST(c) */ q.query_id, {probe_vec}, c.label AS probe_label,
             {cos_qc} AS cos_c
      FROM {probe_src} CROSS JOIN _ann_centroids c
    )
  ) WHERE rn = 1
),
pairs AS (
  SELECT a.query_id, a.probe_label, e.vec_id AS neighbor_id, {cos_qe} AS cosine
  FROM probes a JOIN _ann_lists e
    ON e.label = a.probe_label AND e.vec_id <> a.query_id
)
SELECT query_id, probe_label, neighbor_id, cosine, rank FROM (
  SELECT *, CAST(row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
  ) AS BIGINT) AS rank FROM pairs
) WHERE rank <= {int(k)}
"""
    )


def ann_topk_from_index_pruned(
    spark: SparkSession,
    queries: DataFrame,
    table_prefix: str,
    k: int = 5,
    nprobe: int = 1,
    rerank_from: DataFrame | None = None,
    rerank_m: int | None = None,
) -> DataFrame:
    """Small-batch fast path over a PARTITIONED index (written with
    ``partition_lists=True``): same results as
    :func:`ann_topk_from_index`, but the lists table is neither
    shuffled nor fully scanned. The probe batch is assigned to lists
    (broadcast centroids, same tie-break), the distinct assigned
    labels are collected — a driver list bounded by the number of
    inverted lists, a layout constant — and pushed into the lists scan
    as a literal partition filter; the probe side then BROADCASTS into
    the search join. A one-query probe reads exactly one list
    directory. Use the bucketed layout + regular probe for bulk query
    batches that touch most lists anyway.

    ``nprobe`` is the recall dial: each query searches its ``nprobe``
    nearest lists instead of one. Recall@k is monotone in nprobe (the
    candidate set only grows), the scan cost is nprobe directories per
    query, and nprobe = number-of-lists degenerates to exact
    brute-force. ``probe_label`` in the output is the list the
    neighbor was FOUND in. nprobe=1 is row-for-row identical to
    :func:`ann_topk_from_index`.

    Against a QUANTIZED index (IVF-SQ8 lists) the in-list scoring is
    integer cosine over the stored int8 arrays, reading the 3.85×-
    smaller ``eq`` column. ``rerank_from`` (a float (vec_id,
    embedding) frame — the SOURCE corpus, not the index) turns that
    into the standard two-stage search: the quantized stage keeps the
    top ``rerank_m`` (default 3k) candidates per query, then the small
    candidate set BROADCASTS into one equi-join against the source
    and the final top-k ranks by exact float cosine — the source
    never shuffles, and with ``rerank_m`` = corpus size the result
    equals exact float brute force (pinned in tests). Re-rank against
    a float index is rejected (nothing to refine)."""
    from pyspark.sql.window import Window

    if nprobe < 1:
        raise ValueError(f"nprobe must be >= 1, got {nprobe}")
    partitioned, quantized = _lists_props(spark, table_prefix)
    if not partitioned:
        raise ValueError(
            f"index '{table_prefix}' has no partitioned lists table; write it "
            "with partition_lists=True or use ann_topk_from_index"
        )
    if rerank_from is not None and not quantized:
        raise ValueError(
            "rerank_from is the float refinement of a QUANTIZED index; "
            f"'{table_prefix}' already stores float embeddings"
        )
    if rerank_m is not None and rerank_from is None:
        raise ValueError("rerank_m without rerank_from does nothing")
    m = rerank_m if rerank_m is not None else 3 * k
    if rerank_from is not None and m < k:
        raise ValueError(f"rerank_m ({m}) must be >= k ({k})")

    queries.createOrReplaceTempView("_ann_query_input")
    spark.table(f"{table_prefix}_centroids").createOrReplaceTempView("_ann_centroids")
    cos_qc = cosine_expr("q.qv", "c.cv", "spark")
    probes = spark.sql(
        f"""
SELECT query_id, qv, probe_label FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cos_c DESC, probe_label
  ) AS rn FROM (
    SELECT /*+ BROADCAST(c) */ q.query_id, q.qv, c.label AS probe_label,
           {cos_qc} AS cos_c
    FROM _ann_query_input q CROSS JOIN _ann_centroids c
  )
) WHERE rn <= {int(nprobe)}
"""
    )
    labels = [
        r.probe_label for r in probes.select("probe_label").distinct().collect()
    ]  # bounded by the number of inverted lists

    if quantized:
        probes = probes.select(
            "query_id",
            F.col("qv").alias("fqv"),
            F.expr(quantized_expr("qv")).alias("qv"),
            "probe_label",
        )
    # tombstone/retention mask AFTER the partition filter — pruning
    # still reads only the probed list directories
    from flink_wsr_project_spark.operators.retention import live_rows

    lists = live_rows(
        spark,
        spark.table(f"{table_prefix}_lists").where(F.col("label").isin(labels)),
        table_prefix,
        "vec_id",
    )
    list_vec = "e.eq" if quantized else "e.embedding"
    cos_qe = F.expr(cosine_expr("a.qv", list_vec, "spark"))
    pairs = (
        lists.alias("e")
        .join(
            F.broadcast(probes.alias("a")),
            (F.col("e.label") == F.col("a.probe_label"))
            & (F.col("e.vec_id") != F.col("a.query_id")),
        )
        .select(
            "a.query_id",
            *(["a.fqv"] if quantized and rerank_from is not None else []),
            "a.probe_label",
            F.col("e.vec_id").alias("neighbor_id"),
            cos_qe.alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("neighbor_id"))
    out_cols = ["query_id", "probe_label", "neighbor_id", "cosine", "rank"]
    if rerank_from is None:
        return (
            pairs.withColumn("rank", F.row_number().over(w).cast("bigint"))
            .where(F.col("rank") <= k)
            .select(*out_cols)
        )
    cands = (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= m)
        .drop("rank", "cosine")
    )
    cos_f = F.expr(cosine_expr("c.fqv", "s.embedding", "spark"))
    # INNER join with the broadcast candidates as the BUILD side —
    # BuildRight inner is the shape Spark actually supports for a
    # broadcast right operand (the r11 right_outer form silently
    # DROPPED the broadcast hint: "build right for right outer join"
    # is unsupported, so the source either broadcast whole or
    # sort-merged — shuffling the float corpus per probe batch, the
    # opposite of this docstring's contract; ADVICE r11). The
    # audit-trail semantics survive via the anti arm below: a
    # candidate whose vec_id is MISSING from the source (e.g.
    # absorbed after the source snapshot) must stay visible as a
    # NULL-cosine row that ranks last — silently dropping it from
    # the top-k is the wrong-results mode the dial validation
    # prevents. A complete source is still the operator contract;
    # NULL cosines in the output are the audit trail that it was
    # violated.
    matched = (
        rerank_from.select("vec_id", "embedding")
        .alias("s")
        .join(
            F.broadcast(cands.alias("c")),
            F.col("s.vec_id") == F.col("c.neighbor_id"),
        )
        .select("c.query_id", "c.probe_label", "c.neighbor_id", cos_f.alias("cosine"))
    )
    # cands-vs-matched left_anti: both sides are |m·k|-sized (the
    # matched arm re-executes its broadcast join subtree — a second
    # exchange-free source scan, never a shuffle), so the anti join
    # broadcasts too. In the expected complete-source case it is
    # empty.
    missing = (
        cands.join(
            F.broadcast(matched.select("query_id", "neighbor_id")),
            ["query_id", "neighbor_id"],
            "left_anti",
        )
        .select(
            "query_id",
            "probe_label",
            "neighbor_id",
            F.lit(None).cast("double").alias("cosine"),
        )
    )
    return (
        matched.unionByName(missing)
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
        .select(*out_cols)
    )


def semdedup_from_index(
    spark: SparkSession,
    batch_vecs: DataFrame,
    table_prefix: str,
    tau: float = 0.35,
) -> DataFrame:
    """Semantic-dedup decisions for a batch of (vec_id, embedding)
    rows against the persisted IVF index — the store-backed twin of
    the registered ``semdedup_keep_list`` (plans/pipeline_queries.py)
    and the embedding sibling of ``dedup_incremental_from_store`` /
    ``image_dedup_from_store``: the corpus never re-scans itself, only
    the increment probes it. Returns one row per batch vector:
    (vec_id, decision ∈ dup_of_corpus | dup_within_batch | keep,
    dup_of), corpus claims outranking batch claims and ``dup_of`` the
    smallest claiming partner on the winning side — the exact decision
    contract of the text and image stores.

    Shape: the batch assigns to its nearest centroid (broadcast
    centroid table, min-label tie-break — identical to
    ``ann_topk_from_index``); the corpus arm searches ONLY the
    assigned live list for cosine ≥ τ (tombstoned/expired corpus
    vectors release their claims via ``_live_lists``); the
    within-batch arm is a self-join of the batch's assignments. Like
    its nprobe=1 probe sibling, a near-dup sitting in an ADJACENT
    list is missed — the recall dial the externally-measured
    ``ann_ivf_recall``/nprobe trade-off quantifies; raise the bar by
    absorbing with a finer centroid grid, not by widening this probe.
    Self-exclusion (``e.vec_id <> a.vec_id``) keeps a replayed
    micro-batch from claiming itself. Against a QUANTIZED index the
    corpus cosine runs over the int8 arrays (the externally-verified
    ``ann_quantized_recall`` scoring); the within-batch arm is float
    either way."""
    _, quantized = _lists_props(spark, table_prefix)
    batch_vecs.select("vec_id", "embedding").createOrReplaceTempView(
        "_semdedup_batch"
    )
    spark.table(f"{table_prefix}_centroids").createOrReplaceTempView(
        "_ann_centroids"
    )
    _live_lists(spark, table_prefix).createOrReplaceTempView("_ann_lists")
    cos_qc = cosine_expr("q.embedding", "c.cv", "spark")
    if quantized:
        probe_cols = (
            f"q.vec_id, q.embedding, {quantized_expr('q.embedding')} AS qv8"
        )
        carry = ", qv8"
        cos_ce = cosine_expr("a.qv8", "e.eq", "spark")
    else:
        probe_cols = "q.vec_id, q.embedding"
        carry = ""
        cos_ce = cosine_expr("a.embedding", "e.embedding", "spark")
    cos_bb = cosine_expr("a.embedding", "b.embedding", "spark")
    return spark.sql(
        f"""
WITH probes AS (
  SELECT vec_id, embedding{carry}, probe_label FROM (
    SELECT *, row_number() OVER (
      PARTITION BY vec_id ORDER BY cos_c DESC, probe_label
    ) AS rn FROM (
      SELECT /*+ BROADCAST(c) */ {probe_cols}, c.label AS probe_label,
             {cos_qc} AS cos_c
      FROM _semdedup_batch q CROSS JOIN _ann_centroids c
    )
  ) WHERE rn = 1
),
edges AS (
  SELECT a.vec_id AS vec_a, e.vec_id AS vec_b, 'corpus' AS side
  FROM probes a JOIN _ann_lists e
    ON e.label = a.probe_label AND e.vec_id <> a.vec_id
  WHERE {cos_ce} >= {tau}
  UNION ALL
  SELECT b.vec_id AS vec_a, a.vec_id AS vec_b, 'batch' AS side
  FROM probes a JOIN probes b
    ON a.probe_label = b.probe_label AND a.vec_id < b.vec_id
  WHERE {cos_bb} >= {tau}
)
SELECT q.vec_id,
       CASE WHEN d.corpus_dup IS NOT NULL THEN 'dup_of_corpus'
            WHEN d.batch_dup IS NOT NULL THEN 'dup_within_batch'
            ELSE 'keep' END AS decision,
       COALESCE(d.corpus_dup, d.batch_dup) AS dup_of
FROM _semdedup_batch q LEFT JOIN (
  SELECT vec_a AS vec_id,
         MIN(CASE WHEN side = 'corpus' THEN vec_b END) AS corpus_dup,
         MIN(CASE WHEN side = 'batch' THEN vec_b END) AS batch_dup
  FROM edges GROUP BY vec_a
) d ON d.vec_id = q.vec_id
"""
    )


def absorb_vectors_into_index(
    spark: SparkSession,
    vectors: DataFrame,
    table_prefix: str,
    num_buckets: int = 8,
    exclude_existing: bool = False,
) -> int:
    """Fold new (vec_id, embedding) rows into the persisted index —
    the ANN twin of ``absorb_kept_into_store``. Each vector is
    assigned to its nearest EXISTING centroid (broadcast centroid
    table, the probes' exact tie-break: cosine DESC, smallest label),
    then appended into the lists table under that label — one bucketed
    (or partitioned, matching the layout the index was written with)
    append, no rewrite of existing lists. Because probes assign
    queries with the same rule, a query near an absorbed vector probes
    the list that now holds it.

    Centroids are deliberately NOT retrained per absorb: assignment
    drift accumulates until the periodic retrain
    (``write_ann_index`` over the grown corpus — the compaction
    analogue, scheduled by drift, not size).

    ``exclude_existing=True`` anti-joins against the lists' own
    vec_ids first, making the absorb idempotent under replay — the
    contract a ``foreachBatch`` ingest loop needs. Returns the number
    of vectors absorbed."""
    from flink_wsr_project_spark.operators.iterative import (
        local_checkpoint_tracked,
        release_persistent_rdds,
    )

    from flink_wsr_project_spark.operators.retention import live_rows

    lists_table = f"{table_prefix}_lists"
    partitioned, quantized = _lists_props(spark, table_prefix)

    # unconditional tombstone/retention mask — a deleted or expired
    # vector never re-enters, replays included, even after
    # compaction/retrain dropped its rows
    vecs = live_rows(
        spark, vectors.select("vec_id", "embedding"), table_prefix, "vec_id"
    )
    if exclude_existing:
        vecs = vecs.join(
            spark.table(lists_table).select("vec_id"), "vec_id", "left_anti"
        )

    vecs.createOrReplaceTempView("_ann_absorb_input")
    spark.table(f"{table_prefix}_centroids").createOrReplaceTempView("_ann_centroids")
    cos_vc = cosine_expr("v.embedding", "c.cv", "spark")
    assigned = spark.sql(
        f"""
SELECT vec_id, label, embedding FROM (
  SELECT *, row_number() OVER (
    PARTITION BY vec_id ORDER BY cos_c DESC, label
  ) AS rn FROM (
    SELECT /*+ BROADCAST(c) */ v.vec_id, v.embedding,
           c.label, {cos_vc} AS cos_c
    FROM _ann_absorb_input v CROSS JOIN _ann_centroids c
  )
) WHERE rn = 1
"""
    ).select("vec_id", "label", "embedding")
    if quantized:
        # incoming vectors are float; the stored representation is the
        # write path's exact int8 scheme (assignment above already used
        # the float form against the float-trained centroids)
        assigned = assigned.select(
            "vec_id", "label", F.expr(quantized_expr("embedding")).alias("eq")
        )

    # pin before the append: with exclude_existing the plan READS the
    # lists table the append is about to mutate (the same
    # read-your-writes discipline as the signature store's absorb)
    assigned, ckpt_ids = local_checkpoint_tracked(assigned)
    try:
        n = assigned.count()
        w = assigned.write
        if partitioned:
            w = w.partitionBy("label")
            w.mode("append").format("parquet").saveAsTable(lists_table)
        else:
            w.bucketBy(num_buckets, "label").mode("append").format(
                "parquet"
            ).saveAsTable(lists_table)
    finally:
        release_persistent_rdds(spark, ckpt_ids)
    return n


def compact_ann_index(
    spark: SparkSession,
    table_prefix: str,
) -> int:
    """Rewrite the lists table to one file per bucket (per label
    partition for a partitioned-lists index) — the fragmentation
    remedy after repeated ``absorb_vectors_into_index`` appends, same
    pattern as ``compact_signature_store``: pin the rows
    (localCheckpoint — the source table is about to be dropped),
    rewrite under a temp name, swap via DROP + RENAME, and re-sync
    partition metadata after the rename for the partitioned layout.
    The bucket count for a bucketed layout is discovered from the
    catalog (the overwrite-to-temp rewrite bypasses append-time spec
    validation, so a drifted parameter would silently re-bucket the
    lists and break later absorbs). Centroids are untouched —
    compaction defragments, RETRAINING (``write_ann_index`` over the
    grown corpus) is the separate, drift-scheduled operation; see
    :func:`measure_index_drift` for the trigger. Returns the row
    count."""
    from flink_wsr_project_spark.operators.iterative import (
        local_checkpoint_tracked,
        release_persistent_rdds,
    )
    from flink_wsr_project_spark.sources.writers import table_num_buckets

    table = f"{table_prefix}_lists"
    tmp = f"{table}__compact"
    partitioned, quantized = _lists_props(spark, table_prefix)
    num_buckets = 0 if partitioned else table_num_buckets(spark, table)
    if not partitioned and num_buckets <= 0:
        raise ValueError(
            f"{table} is neither partitioned-lists nor bucketed in the "
            "catalog — not an index written by write_ann_index"
        )
    spark.sql(f"DROP TABLE IF EXISTS {tmp}")
    # tombstones applied physically by the rewrite (the tombstone table
    # itself is rewritten deduplicated — and KEPT — after the swap)
    pinned, ckpt_ids = local_checkpoint_tracked(_live_lists(spark, table_prefix))
    try:
        n = pinned.count()
        if partitioned:
            (
                pinned.repartition("label")
                .write.partitionBy("label")
                .mode("overwrite")
                .format("parquet")
                .saveAsTable(tmp)
            )
            spark.sql(
                f"ALTER TABLE {tmp} SET TBLPROPERTIES "
                f"('{PARTITIONED_LISTS_PROP}'='true')"
            )
        else:
            (
                pinned.repartition(num_buckets, "label")
                .write.bucketBy(num_buckets, "label")
                .mode("overwrite")
                .format("parquet")
                .saveAsTable(tmp)
            )
        if quantized:
            # the rewrite must not silently demote a quantized index
            # to "looks float" — probes dispatch on this property
            spark.sql(
                f"ALTER TABLE {tmp} SET TBLPROPERTIES "
                f"('{QUANTIZED_LISTS_PROP}'='true')"
            )
        spark.sql(f"DROP TABLE {table}")
        spark.sql(f"ALTER TABLE {tmp} RENAME TO {table}")
        if partitioned:
            spark.sql(f"MSCK REPAIR TABLE {table} SYNC PARTITIONS")
    finally:
        release_persistent_rdds(spark, ckpt_ids)
    from flink_wsr_project_spark.operators.tombstones import (
        rewrite_tombstones_deduped,
    )

    rewrite_tombstones_deduped(spark, table_prefix)
    return n


def recover_index_compaction(spark: SparkSession, table_prefix: str) -> bool:
    """Complete an interrupted ``compact_ann_index`` swap (the
    DROP→RENAME crash window) and any interrupted tombstone rewrite —
    idempotent, run at index startup."""
    from flink_wsr_project_spark.operators.retention import recover_retention
    from flink_wsr_project_spark.operators.tombstones import recover_tombstones
    from flink_wsr_project_spark.sources.writers import finish_table_swap

    recovered = finish_table_swap(spark, f"{table_prefix}_lists")
    return (
        recover_tombstones(spark, table_prefix)
        or recover_retention(spark, table_prefix)
        or recovered
    )


def maintain_ann_index(
    spark: SparkSession,
    table_prefix: str,
    max_files_per_bucket: int = 4,
    max_fresh_mismatch: float = 0.1,
    source: DataFrame | None = None,
) -> dict:
    """The index's scheduled-maintenance entry point — ONE call that
    runs both lifecycle remedies behind their measured triggers, in
    the order that matters:

    1. recover any interrupted compaction swap (idempotent);
    2. ``compact_ann_index`` if ``should_compact`` (file count per
       bucket/partition slot crossed the dial);
    3. ``retrain_ann_index`` if ``should_retrain`` (fresh-centroid
       mismatch crossed the dial; ``source`` is required for a
       quantized index and forwarded).

    Compaction precedes the drift check so the retrain's full scan
    reads the defragmented layout. Returns a report dict
    ``{recovered, compacted, drift_before, retrained, drift_after}``
    — the row an operations dashboard logs per maintenance tick.
    Probes and ingest loops never call this; it is the cron-shaped
    sibling of the in-loop ``max_files_per_bucket`` trigger, for
    deployments that prefer maintenance windows over in-band
    compaction.

    The source/layout pairing is validated UP FRONT (a quantized
    index without ``source`` would otherwise tick green for months
    and die mid-maintenance the first time drift crosses the dial —
    a late, state-dependent failure for a statically-knowable
    misconfiguration)."""
    from flink_wsr_project_spark.sources.writers import should_compact

    if not 0.0 < max_fresh_mismatch < 1.0:
        raise ValueError(
            f"max_fresh_mismatch must be in (0, 1), got {max_fresh_mismatch}"
        )
    # recovery FIRST — a crash-window index has no lists table to
    # inspect until the swap/rebuild completes; the source/layout
    # validation follows immediately, still ahead of every expensive
    # step (compaction scan, drift scan)
    recovered = recover_index_compaction(spark, table_prefix)
    recovered = recover_index_retrain(spark, table_prefix) or recovered
    _, quantized = _lists_props(spark, table_prefix)
    if quantized and source is None:
        raise ValueError(
            f"index '{table_prefix}' is quantized: maintain_ann_index needs "
            "source=(vec_id, embedding) so a drift-triggered retrain can run"
        )
    if not quantized and source is not None:
        raise ValueError(
            f"index '{table_prefix}' stores float embeddings; retrain reads "
            "them directly — source would silently shadow the index contents"
        )
    compacted = False
    if should_compact(spark, f"{table_prefix}_lists", max_files_per_bucket):
        compact_ann_index(spark, table_prefix)
        compacted = True
    drift_before = measure_index_drift(spark, table_prefix)
    retrained = False
    drift_after = drift_before
    if drift_before["fresh_centroid_mismatch"] > max_fresh_mismatch:
        drift_after = retrain_ann_index(spark, table_prefix, source=source)
        retrained = True
    return {
        "recovered": recovered,
        "compacted": compacted,
        "drift_before": drift_before,
        "retrained": retrained,
        "drift_after": drift_after,
    }


def _centroid_literals(rows) -> tuple[list, list[str]]:
    """(labels sorted ascending, double-literal array SQL per label)
    from collected centroid rows. The stored ``cv`` is DECIMAL(38,17)
    (the integer-scaled mean divides by a decimal literal), but every
    probe-side cosine casts it to DOUBLE before scoring (``dot_expr``),
    so Python ``float()`` — the IEEE double nearest the decimal — plus
    ``repr()`` (exact double round-trip) makes the literal fold score
    the SAME cosine as a join against the centroid table would."""
    pairs = sorted((r.label, [float(x) for x in r.cv]) for r in rows)
    labels = [lb for lb, _ in pairs]
    arrs = [
        "array(" + ",".join(f"CAST({v!r} AS DOUBLE)" for v in vec) + ")"
        for _, vec in pairs
    ]
    return labels, arrs


def _nearest_label_expr(vec_col: str, labels: list, arrs: list[str]) -> str:
    """In-row nearest-centroid label over DRIVER-LITERAL centroids —
    the probes' exact tie-break (cosine DESC, smallest label: the
    labels array is sorted ascending and array_position returns the
    FIRST index of the max). Zero-norm vectors coalesce every cosine
    to -2 and deterministically land on the smallest label. Same
    centroids-as-literals iteration shape as embedding_kmeans: k·d
    scalars ride the plan, the data never shuffles for assignment."""
    from flink_wsr_project_spark.operators.similarity import cosine_expr

    cos_arr = "array(" + ",".join(
        f"coalesce({cosine_expr(vec_col, a, 'spark')}, CAST(-2.0 AS DOUBLE))"
        for a in arrs
    ) + ")"
    lab_arr = "array(" + ",".join(f"CAST({lb} AS BIGINT)" for lb in labels) + ")"
    return (
        f"element_at({lab_arr}, "
        f"CAST(array_position({cos_arr}, array_max({cos_arr})) AS INT))"
    )


def measure_index_drift(spark: SparkSession, table_prefix: str) -> dict:
    """The retrain trigger's MEASUREMENT — the number the module
    docstring's "scheduled by drift" promise needs to actually fire.
    Two fractions over one full scan of the lists table:

    * ``stored_centroid_mismatch`` — rows whose stored ``label`` ≠
      nearest PERSISTED centroid. This is the IVF assignment asymmetry
      the recall notes describe; absorbs never add to it (they assign
      BY nearest persisted centroid), so it is flat over the absorb
      loop — a health check, not a trigger.
    * ``fresh_centroid_mismatch`` — rows whose stored ``label`` ≠
      nearest WOULD-BE-RETRAINED centroid (per-list means recomputed
      from the lists table as they are NOW). This is the k-means
      unstable-assignment fraction: absorbed off-center mass drags the
      true list means away from the persisted centroids, so it GROWS
      with absorbs and falls back after ``retrain_ann_index`` — the
      trigger ``should_retrain`` thresholds.

    Plan shape: fresh means are one (label, pos) aggregate over the
    lists (k·d scalars back to the driver — the bounded-collect
    discipline); both assignments are in-row literal folds (no
    shuffle, no window); the two fractions come from one scalar
    aggregate. Cost: one scan + one k·d aggregate, at any corpus
    size.

    On a QUANTIZED index the measurement runs over the stored int8
    arrays: nearest-PERSISTED-centroid assignment is scale-invariant
    (cosine), so the stored number matches the float measurement up
    to rounding; the fresh means mix per-vector scales (mean of
    scaled vectors ≠ scaled mean), so the fresh number is the drift
    of the quantized geometry itself — consistent within itself,
    which is all a threshold needs."""
    _, quantized = _lists_props(spark, table_prefix)
    lists = _live_lists(spark, table_prefix)
    if quantized:
        lists = lists.select("vec_id", "label", F.col("eq").alias("embedding"))
    stored = spark.table(f"{table_prefix}_centroids").collect()
    lists.createOrReplaceTempView("_ann_drift_lists")
    fresh = spark.sql(_centroid_sql("_ann_drift_lists")).collect()

    s_labels, s_arrs = _centroid_literals(stored)
    f_labels, f_arrs = _centroid_literals(fresh)
    row = (
        lists.select(
            F.col("label").cast("bigint").alias("label"),
            F.expr(_nearest_label_expr("embedding", s_labels, s_arrs)).alias("ns"),
            F.expr(_nearest_label_expr("embedding", f_labels, f_arrs)).alias("nf"),
        )
        .agg(
            F.count("*").alias("n"),
            F.sum((F.col("label") != F.col("ns")).cast("long")).alias("ms"),
            F.sum((F.col("label") != F.col("nf")).cast("long")).alias("mf"),
        )
        .first()
    )
    n = row.n or 0
    return {
        "n_rows": n,
        "n_lists": len(s_labels),
        "stored_centroid_mismatch": (row.ms / n) if n else 0.0,
        "fresh_centroid_mismatch": (row.mf / n) if n else 0.0,
    }


def should_retrain(
    spark: SparkSession, table_prefix: str, max_fresh_mismatch: float = 0.1
) -> bool:
    """True when the fresh-centroid mismatch fraction (the k-means
    unstable-assignment rate the absorb loop accumulates) exceeds the
    dial — the drift-scheduled retrain trigger, as code. The measured
    operating curve (drift vs recall across an absorb loop) is in
    SCALE.md; 0.1 sits below the point where nprobe=1 recall on the
    drifted region starts to fall."""
    if not 0.0 < max_fresh_mismatch < 1.0:
        raise ValueError(
            f"max_fresh_mismatch must be in (0, 1), got {max_fresh_mismatch}"
        )
    d = measure_index_drift(spark, table_prefix)
    return d["fresh_centroid_mismatch"] > max_fresh_mismatch


def retrain_ann_index(
    spark: SparkSession, table_prefix: str, source: DataFrame | None = None
) -> dict:
    """Retrain the index over its own grown corpus — one Lloyd step:
    re-assign every stored vector to its nearest FRESH centroid (the
    per-list means of the lists as they are now, in-row literal fold,
    no shuffle), then rebuild the index from those assignments with
    :func:`write_ann_index` (which recomputes the persisted centroids
    as the means of the NEW lists — the update half of the step).
    Layout (partitioned vs bucketed, bucket count) is discovered from
    the catalog and preserved. Repeated retrains are exactly repeated
    Lloyd steps and converge; one step is what collapses the absorb
    loop's accumulated drift (measured in SCALE.md — fresh mismatch
    back to ~0, recall on the drifted region restored).

    The re-assignment plan READS the tables the rebuild overwrites, so
    the assigned rows are pinned first (localCheckpoint — the same
    read-your-writes discipline as absorb/compaction). Returns
    ``measure_index_drift`` of the rebuilt index.

    A QUANTIZED index cannot retrain from itself — centroid means over
    the int8 arrays would fold each vector's own scale into the
    geometry (quantization is deliberately lossy the one way that
    doesn't matter for cosine but does for means). Pass ``source``,
    the float (vec_id, embedding) corpus the index was built from:
    current list membership joins the source by id (one bucketed/
    broadcastable equi-join — the source never shuffles), means and
    re-assignment run on floats, and the rebuild re-quantizes. A
    source missing any stored vec_id is rejected LOUDLY — an
    inner-join would silently shrink the index (absorbed-but-not-yet-
    in-source vectors would vanish from probes forever).

    Crash safety: unlike compaction (a single-table swap), the
    rebuild overwrites BOTH index tables, and the lists table is the
    only copy of the corpus for a float index — so the re-assigned
    rows are STAGED to a durable ``<prefix>_retrain_src`` table (with
    the layout recorded as properties) before any index table is
    touched. A crash mid-rebuild leaves the staging table, and
    :func:`recover_index_retrain` (idempotent; run at startup, and
    run by ``maintain_ann_index``) re-executes the rebuild from it.
    The staging table is dropped only after the rebuild completes."""
    lists_table = f"{table_prefix}_lists"
    partitioned, quantized = _lists_props(spark, table_prefix)

    # retrain rebuilds from the LIVE rows only — deleted vectors are
    # physically reclaimed by the rebuild (their tombstones stay, so
    # replayed absorbs still cannot resurrect them), and a tombstoned
    # vec_id missing from a quantized retrain's source is NOT an error
    live = _live_lists(spark, table_prefix)
    if quantized:
        if source is None:
            raise ValueError(
                f"index '{table_prefix}' stores int8-quantized lists; retrain "
                "needs the float corpus — pass source=(vec_id, embedding)"
            )
        src = source.select("vec_id", "embedding")
        missing = (
            live.select("vec_id")
            .join(src.select("vec_id"), "vec_id", "left_anti")
            .count()
        )
        if missing:
            raise ValueError(
                f"source is missing {missing} vec_ids the index holds "
                "(absorbed vectors not yet in the source corpus?) — a "
                "rebuild from it would silently drop them from probes"
            )
        lists = live.select("vec_id", "label").join(src, "vec_id")
    elif source is not None:
        raise ValueError(
            f"index '{table_prefix}' stores float embeddings; retrain reads "
            "them directly — source would silently shadow the index contents"
        )
    else:
        lists = live
    lists.createOrReplaceTempView("_ann_retrain_lists")
    fresh = spark.sql(_centroid_sql("_ann_retrain_lists")).collect()
    f_labels, f_arrs = _centroid_literals(fresh)
    assigned = lists.select(
        "vec_id",
        F.expr(_nearest_label_expr("embedding", f_labels, f_arrs)).alias("label"),
        "embedding",
    )

    from flink_wsr_project_spark.sources.writers import table_num_buckets

    staging = f"{table_prefix}_retrain_src"
    num_buckets = 0 if partitioned else table_num_buckets(spark, lists_table)
    spark.sql(f"DROP TABLE IF EXISTS {staging}")
    assigned.write.mode("overwrite").format("parquet").saveAsTable(staging)
    spark.sql(
        f"ALTER TABLE {staging} SET TBLPROPERTIES ("
        f"'{_RETRAIN_PARTITIONED_PROP}'='{str(partitioned).lower()}', "
        f"'{_RETRAIN_QUANTIZED_PROP}'='{str(quantized).lower()}', "
        f"'{_RETRAIN_BUCKETS_PROP}'='{num_buckets or 8}')"
    )
    _finish_retrain(spark, table_prefix)
    return measure_index_drift(spark, table_prefix)


# staging-table properties recording the layout a retrain must rebuild
_RETRAIN_PARTITIONED_PROP = "spark_graft.retrain_partitioned"
_RETRAIN_QUANTIZED_PROP = "spark_graft.retrain_quantized"
_RETRAIN_BUCKETS_PROP = "spark_graft.retrain_buckets"


def _finish_retrain(spark: SparkSession, table_prefix: str) -> None:
    """Rebuild both index tables from the durable staging table, then
    drop it. Idempotent from the staging table's perspective: the
    rebuild is a deterministic overwrite, so re-running after any
    crash point yields the same index."""
    staging = f"{table_prefix}_retrain_src"
    props = {r.key: r.value for r in spark.sql(f"SHOW TBLPROPERTIES {staging}").collect()}
    write_ann_index(
        spark,
        spark.table(staging),
        table_prefix,
        num_buckets=int(props.get(_RETRAIN_BUCKETS_PROP, "8")),
        partition_lists=props.get(_RETRAIN_PARTITIONED_PROP) == "true",
        quantize=props.get(_RETRAIN_QUANTIZED_PROP) == "true",
        # the staged rows ARE the Lloyd step's output (retrain
        # re-assigned on the float geometry already); re-iterating
        # here would silently turn retrain's documented "one Lloyd
        # step per call" into "converge per call"
        reassign=False,
    )
    spark.sql(f"DROP TABLE {staging}")


def recover_index_retrain(spark: SparkSession, table_prefix: str) -> bool:
    """Complete an interrupted :func:`retrain_ann_index`: if the
    durable staging table exists, the rebuild crashed somewhere after
    staging (possibly mid-overwrite of either index table) — re-run
    it from the staging rows and drop them. Idempotent; run at index
    startup alongside :func:`recover_index_compaction`. Returns True
    when a recovery ran."""
    if not spark.catalog.tableExists(f"{table_prefix}_retrain_src"):
        return False
    _finish_retrain(spark, table_prefix)
    return True
