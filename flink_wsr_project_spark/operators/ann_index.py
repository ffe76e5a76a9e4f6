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


def write_ann_index(
    spark: SparkSession,
    embeddings: DataFrame,
    table_prefix: str,
    num_buckets: int = 8,
    partition_lists: bool = False,
) -> None:
    """One-time index build from (vec_id, embedding, label) rows: the
    ``label`` column is the inverted-list assignment (k-means or any
    other partitioner upstream); centroids are the per-list
    integer-scaled component means — the exact expression
    ``ann_ivf_topk`` trains, so probes against the store reproduce the
    inline query bit-for-bit.

    With ``partition_lists=True`` the lists table is written
    PARTITIONED BY ``label`` — one directory per inverted list — which
    is what lets the pruned probe (:func:`ann_topk_from_index_pruned`)
    read ONLY the lists a probe batch is assigned to, instead of
    scanning the whole corpus the way the bucketed layout must. The
    IVF list is the natural partition unit: its cardinality is the
    (small, constant) number of lists, and nprobe-style multi-probe
    just widens the pruned set."""
    embeddings.createOrReplaceTempView("_ann_index_input")
    centroids = spark.sql(
        """
WITH exploded AS (
  SELECT label, pos, CAST(x AS DOUBLE) AS x
  FROM _ann_index_input LATERAL VIEW posexplode(embedding) t AS pos, x
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
    )
    write_bucketed(centroids, f"{table_prefix}_centroids", ["label"], 1)
    lists = embeddings.select("vec_id", "label", "embedding")
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
    Returns (query_id, probe_label, neighbor_id, cosine, rank)."""
    queries.createOrReplaceTempView("_ann_query_input")
    spark.table(f"{table_prefix}_centroids").createOrReplaceTempView("_ann_centroids")
    spark.table(f"{table_prefix}_lists").createOrReplaceTempView("_ann_lists")
    cos_qc = cosine_expr("q.qv", "c.cv", "spark")
    cos_qe = cosine_expr("a.qv", "e.embedding", "spark")
    return spark.sql(
        f"""
WITH probes AS (
  SELECT query_id, qv, probe_label FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY cos_c DESC, probe_label
    ) AS rn FROM (
      SELECT /*+ BROADCAST(c) */ q.query_id, q.qv, c.label AS probe_label,
             {cos_qc} AS cos_c
      FROM _ann_query_input q CROSS JOIN _ann_centroids c
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
    :func:`ann_topk_from_index`."""
    from pyspark.sql.window import Window

    if nprobe < 1:
        raise ValueError(f"nprobe must be >= 1, got {nprobe}")
    rows = spark.sql(f"SHOW TBLPROPERTIES {table_prefix}_lists").collect()
    if not any(r.key == PARTITIONED_LISTS_PROP and r.value == "true" for r in rows):
        raise ValueError(
            f"index '{table_prefix}' has no partitioned lists table; write it "
            "with partition_lists=True or use ann_topk_from_index"
        )

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

    lists = spark.table(f"{table_prefix}_lists").where(F.col("label").isin(labels))
    cos_qe = F.expr(cosine_expr("a.qv", "e.embedding", "spark"))
    pairs = (
        lists.alias("e")
        .join(
            F.broadcast(probes.alias("a")),
            (F.col("e.label") == F.col("a.probe_label"))
            & (F.col("e.vec_id") != F.col("a.query_id")),
        )
        .select(
            "a.query_id",
            "a.probe_label",
            F.col("e.vec_id").alias("neighbor_id"),
            cos_qe.alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
        .select("query_id", "probe_label", "neighbor_id", "cosine", "rank")
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

    lists_table = f"{table_prefix}_lists"
    rows = spark.sql(f"SHOW TBLPROPERTIES {lists_table}").collect()
    partitioned = any(
        r.key == PARTITIONED_LISTS_PROP and r.value == "true" for r in rows
    )

    vecs = vectors.select("vec_id", "embedding")
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
    rows = spark.sql(f"SHOW TBLPROPERTIES {table}").collect()
    partitioned = any(
        r.key == PARTITIONED_LISTS_PROP and r.value == "true" for r in rows
    )
    num_buckets = 0 if partitioned else table_num_buckets(spark, table)
    if not partitioned and num_buckets <= 0:
        raise ValueError(
            f"{table} is neither partitioned-lists nor bucketed in the "
            "catalog — not an index written by write_ann_index"
        )
    spark.sql(f"DROP TABLE IF EXISTS {tmp}")
    pinned, ckpt_ids = local_checkpoint_tracked(spark.table(table))
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
        spark.sql(f"DROP TABLE {table}")
        spark.sql(f"ALTER TABLE {tmp} RENAME TO {table}")
        if partitioned:
            spark.sql(f"MSCK REPAIR TABLE {table} SYNC PARTITIONS")
    finally:
        release_persistent_rdds(spark, ckpt_ids)
    return n


def recover_index_compaction(spark: SparkSession, table_prefix: str) -> bool:
    """Complete an interrupted ``compact_ann_index`` swap (the
    DROP→RENAME crash window) — idempotent, run at index startup."""
    from flink_wsr_project_spark.sources.writers import finish_table_swap

    return finish_table_swap(spark, f"{table_prefix}_lists")
