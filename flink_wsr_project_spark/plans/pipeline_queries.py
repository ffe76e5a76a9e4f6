"""Training-data pipeline queries (driver mandate; SURVEY.md §7.3 M7):
deduplication, similarity search, and text analysis over the
``documents`` and ``embeddings`` tables.

Cross-engine determinism: shared hash primitive is
``bigint(substr(md5(s), 1, 15))`` (60 bits, positive) — md5 is
identical in Spark and DuckDB, so minhash/fingerprint oracles are
exact. All float math is either single IEEE expressions (deterministic)
or integer-scaled before aggregation.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from flink_wsr_project_spark.operators.dedup import (
    N_PERMS,
    h28,
    toks_expr,
    hamming_expr,
    jaccard_expr,
    longsigs_select,
    minhash_from_hashed_expr,
    shingle_hash_array_expr,
    shingled_cte,
    shingles_from_toks,
    signature_sql,
    simhash_sql,
)
from flink_wsr_project_spark.operators.iterative import (
    local_checkpoint_tracked,
    release_persistent_rdds,
)
from flink_wsr_project_spark.operators.similarity import (
    cosine_expr,
    cosine_prenorm_expr,
    dot_expr,
    srp_bucket_expr,
)
from flink_wsr_project_spark.operators.text import (
    DECON_N,
    fingerprint_sql,
    lang_id_sql,
    passage_tokens_expr,
)
from flink_wsr_project_spark.plans.registry import register
from flink_wsr_project_spark.sources.readers import load_table


# stopword list shared by quality scoring and language-id heuristics
_STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "on", "for", "with")
_SW_SQL = ", ".join(f"'{w}'" for w in _STOPWORDS)


# ---------------------------------------------------------------------------
# Materialize-once discipline (r17). The r16 materialize-once sites
# (fingerprints, containment shingles, semdedup assignment, boilerplate
# segments, decontaminate grams, LM bigrams) each localCheckpoint a
# derived relation INSIDE the query call — recomputed from parquet on
# every invocation, nothing cached across runs — but a bare
# ``localCheckpoint`` pins its blocks until session end (the returned
# DataFrame's public unpersist handles cannot reach them; see
# operators/iterative.py). Over a long-lived session running many
# queries that accumulates corpus-derived blocks in executor storage
# (guide §5). Every site now routes through ``_materialize_once``:
# the checkpoint ids are tracked per (session, site-key) and the
# PREVIOUS invocation's blocks are released when the same site
# re-materializes — the caller's action on the previous result is long
# finished by then (query calls are build-then-act, sequential per
# session). ``release_materialized_relations`` frees everything
# explicitly for sessions that want a clean block manager between
# queries.
#
# Thread-safety: sibling relations built concurrently from one query
# (consensus members, the two containment shingle views) may
# mis-attribute a checkpoint id to the sibling key when their
# persistent-RDD diffs interleave; since sibling sites always
# re-materialize together in the next call and release is idempotent,
# the release semantics are unchanged — no id is ever released while a
# returned DataFrame still needs it.

_MATERIALIZED_IDS: dict[tuple[str, str], set[int]] = {}


def _materialize_once(df: DataFrame, key: str) -> DataFrame:
    """Eager tracked ``localCheckpoint`` of a per-call derived relation;
    releases the blocks the same ``key`` pinned in a previous call."""
    spark = df.sparkSession
    map_key = (spark.sparkContext.applicationId, key)
    prev = _MATERIALIZED_IDS.pop(map_key, None)
    if prev:
        release_persistent_rdds(spark, prev)
    out, ids = local_checkpoint_tracked(df)
    if ids:
        _MATERIALIZED_IDS[map_key] = ids
    return out


def release_materialized_relations(spark: SparkSession) -> None:
    """Release every materialize-once relation pinned by past query
    calls in this session. Safe whenever no previously returned query
    DataFrame is still awaiting its first action (the blocks are not
    recomputable — lineage is truncated)."""
    app = spark.sparkContext.applicationId
    for map_key in [k for k in _MATERIALIZED_IDS if k[0] == app]:
        release_persistent_rdds(spark, _MATERIALIZED_IDS.pop(map_key))


def _run_view_builders(spark: SparkSession, builders) -> None:
    """Build independent relations concurrently (guide §2.6 "overlap
    independent jobs") and bind each as a temp view named by its key.
    Completion order, not submission order (r16 ADVICE): the first
    builder exception surfaces as soon as it lands instead of after
    blocking on every earlier future. Sibling builders already running
    drain in the pool's shutdown; views are recreated per invocation,
    so partial state is benign."""
    from concurrent.futures import ThreadPoolExecutor, as_completed

    with ThreadPoolExecutor(max_workers=len(builders)) as pool:
        futures = {pool.submit(fn): name for name, fn in builders.items()}
        try:
            for fut in as_completed(futures):
                fut.result().createOrReplaceTempView(futures[fut])
        except BaseException:
            for f in futures:
                f.cancel()
            raise


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

_TOKEN_COUNT_ORACLE = r"""
SELECT doc_id,
       len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
       length(text) AS text_len,
       len(regexp_split_to_array(trim(text), '[^0-9A-Za-z]+')) AS n_words_bpeish
FROM documents
"""


@register("doc_token_count", oracle=_TOKEN_COUNT_ORACLE, tags=("pipeline", "text"))
def doc_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish alnum-run split.
    Pure built-in string functions — stays in whole-stage codegen."""
    docs = load_table(spark, "documents", sf_dir)
    return docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("text_len"),
        F.size(F.split(F.trim(F.col("text")), r"[^0-9A-Za-z]+")).cast("long").alias(
            "n_words_bpeish"
        ),
    )


_QUALITY_ORACLE = rf"""
WITH t AS (
  SELECT doc_id, text, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents
)
SELECT doc_id,
       len(toks) AS n_tokens,
       length(text) / len(toks) AS chars_per_token,
       len(list_filter(toks, x -> x IN ({_SW_SQL}))) / len(toks) AS stopword_ratio,
       CAST(len(toks) BETWEEN 10 AND 10000
            AND length(text) / len(toks) BETWEEN 3 AND 15 AS BOOLEAN) AS passes_quality
FROM t
"""


@register("doc_quality_score", oracle=_QUALITY_ORACLE, tags=("pipeline", "text"))
def doc_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality scoring: length / chars-per-token / stopword
    ratio + a Gopher-style pass/fail gate. All built-in higher-order
    array functions (no Python in the row path)."""
    docs = load_table(spark, "documents", sf_dir)
    toks = F.split(F.trim(F.col("text")), r"\s+")
    n_tokens = F.size(toks).cast("long")
    chars_per_token = F.length("text") / F.size(toks)
    stopword_ratio = F.size(F.filter(toks, lambda x: x.isin(*_STOPWORDS))) / F.size(toks)
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        chars_per_token.alias("chars_per_token"),
        stopword_ratio.alias("stopword_ratio"),
        (n_tokens.between(10, 10000) & chars_per_token.between(3, 15)).alias("passes_quality"),
    )


# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------

_DEDUP_EXACT_ORACLE = """
SELECT md5(text) AS text_hash, min(doc_id) AS keep_doc_id, count(*) AS n_copies
FROM documents GROUP BY 1
"""


@register("dedup_exact", oracle=_DEDUP_EXACT_ORACLE, tags=("pipeline", "dedup"))
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact deduplication: hash-groupBy on content, keep the smallest
    doc_id per group. At 100 TB this is one shuffle on the 128-bit
    content hash (never on the text itself)."""
    docs = load_table(spark, "documents", sf_dir)
    return (
        docs.groupBy(F.md5("text").alias("text_hash"))
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_copies"))
    )


# ---------------------------------------------------------------------------
# MinHash + LSH near-duplicate detection
# ---------------------------------------------------------------------------


def _minhash_signatures_sql(engine: str) -> str:
    """Per-doc MinHash band signatures (16 perms, 4 bands of 4) —
    single scan, signature folds over the in-row shingle array (no
    explode, no shuffle)."""
    return signature_sql(engine)


@register(
    "minhash_signatures", oracle=_minhash_signatures_sql("duckdb"), tags=("pipeline", "dedup")
)
def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, "documents", sf_dir).createOrReplaceTempView("documents")
    return spark.sql(_minhash_signatures_sql("spark"))


def _dedup_minhash_lsh_sql(engine: str) -> str:
    """MinHash-LSH near-dup pairs: band-equality candidates → exact
    3-gram Jaccard verify ≥ 0.4. The pair space is only within-band —
    never O(n²).

    Plan shape (r16): the four band columns explode to LONG format
    ``(doc_id, b, h)`` and the candidate join is ONE self-equi-join on
    ``(b, h)`` with UNION-dedup — both join sides are the identical
    subtree, so the signature aggregate and the (b, h) exchange each
    run ONCE and the other side is a ReusedExchange (pinned in
    test_plans). The per-band wide join this replaced referenced
    ``sigs`` once per band per side; under the r16 aggregate-shaped
    signature, column pruning made each reference its own
    scan+hash+aggregate chain — 8 corpus scans where one suffices."""
    sig = signature_sql(engine)
    jac = jaccard_expr("sa.sh", "sb.sh", engine)
    return f"""
WITH sigs AS ({sig}),
{shingled_cte(engine)},
longsigs AS (
{longsigs_select(engine)}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM longsigs a JOIN longsigs b
    ON a.b = b.b AND a.h = b.h AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, jaccard FROM (
  SELECT c.doc_a, c.doc_b, {jac} AS jaccard
  FROM cand c
  JOIN shingled sa ON sa.doc_id = c.doc_a
  JOIN shingled sb ON sb.doc_id = c.doc_b
) WHERE jaccard >= 0.4
"""


@register("dedup_minhash_lsh", oracle=_dedup_minhash_lsh_sql("duckdb"), tags=("pipeline", "dedup"))
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, "documents", sf_dir).createOrReplaceTempView("documents")
    return spark.sql(_dedup_minhash_lsh_sql("spark"))


# Per-(band, hash) candidate cap for the capped LSH variant. At
# production scale this is O(1000) (a bucket of n docs contributes
# n(n-1)/2 candidate pairs — giant near-dup clusters would otherwise
# dominate the join) — override via SPARK_GRAFT_LSH_BUCKET_CAP for a
# real deployment. The shipped default of 2 is the sf0.01 gate
# setting: it makes BOTH branches execute (dead-branch discipline,
# SCALE.md r5 audit) — the 3-doc buckets (the testdata's "giant
# cluster" analogue) are capped, the twenty 2-doc buckets pass.
# Since r8 star edges are Jaccard-verified, so a small cap costs plan
# routing, never correctness.
def _parse_bucket_cap(raw: str, name: str = "SPARK_GRAFT_LSH_BUCKET_CAP") -> int:
    """Validate the env override at import (the SQL interpolates the
    value, so a bad cap would otherwise surface as a confusing parse
    or — worse, for cap < 1 — silently route EVERY bucket through
    star-collapse, since ``n <= 0`` never holds). ``name`` is the env
    var being parsed, so the error points at the variable the operator
    actually set (r13 ADVICE-class fix: the helper now has several cap
    call sites)."""
    try:
        cap = int(raw)
    except ValueError:
        raise ValueError(
            f"{name}={raw!r} is not an integer; "
            "expected a plain int >= 1 (e.g. 2 for the test gate, 1000 "
            "for a production deployment)"
        ) from None
    if cap < 1:
        raise ValueError(
            f"{name}={cap} is degenerate: a cap < 1 "
            "makes the within-cap branch unreachable (bucket sizes are "
            ">= 1), silently star-collapsing every bucket. Use >= 1."
        )
    return cap


_LSH_BUCKET_CAP = _parse_bucket_cap(os.environ.get("SPARK_GRAFT_LSH_BUCKET_CAP", "2"), "SPARK_GRAFT_LSH_BUCKET_CAP")


def _capped_cands_ctes() -> str:
    """CTEs ``sized`` + ``cand`` for the STANDALONE capped-pairs
    query: long-format band rows annotated with their bucket size by
    ONE (b, h) window, then a self-equi-join restricted to buckets ≤
    ``_LSH_BUCKET_CAP`` — over-cap buckets are EXCLUDED (no star
    collapse here; that is the composed chain's richer contract in
    ``_neardup_edges_ctes``, which selects a superset — the
    capped-pairs⊆chain relationship is pinned in the synthetic parity
    tests). Expects ``longsigs`` upstream. Engine-independent (plain
    ANSI), hence no engine arg.

    The size predicate appears on BOTH join sides (redundant-but-true:
    n is constant per bucket, and the equi-join keeps sides in one
    bucket) — the span-family discipline: without it Catalyst prunes
    the window off the unfiltered side, the two join inputs stop being
    identical subtrees, and the whole signature chain is recomputed
    (and at small sizes broadcast) per side. With it, one signature
    aggregate + one (b, h) exchange feed both sides (ReusedExchange,
    pinned in test_plans)."""
    cap = _LSH_BUCKET_CAP
    return f"""sized AS (
  SELECT doc_id, b, h, count(*) OVER (PARTITION BY b, h) AS n
  FROM longsigs
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, m.doc_id AS doc_b
  FROM sized a JOIN sized m
    ON a.b = m.b AND a.h = m.h AND a.doc_id < m.doc_id
  WHERE a.n <= {cap} AND m.n <= {cap}
)"""


# re-exported under the old private name for in-module callers; the
# shared definition lives with the other cross-engine SQL fragments
_longsigs_select = longsigs_select


def _neardup_edges_ctes(engine: str) -> str:
    """The composed chain's shared WITH-body: per-band bucket stats →
    ONE candidate set (within-cap pairs ∪ over-cap star rows) → ONE
    exact-Jaccard verify pass (≥ 0.5) → ``edges``, always
    (doc_a < doc_b).

    This is the skew-safe edge contract ``dedup_keep_list``,
    ``dedup_components``, ``dedup_keep_best`` and ``curation_funnel``
    all build on (identical SQL in both engines, so every consumer
    stays hash-checkable). Within-cap behavior is exactly the r1–r6
    chain; over-cap buckets contribute at most |B|−1 star edges to
    their bucket-min keeper instead of |B|(|B|−1)/2 enumerated pairs,
    so a 10⁶-clone cluster costs 10⁶−1 edge rows, not 5·10¹¹
    candidate pairs, and NO document is dropped silently — members
    stay in the drop/edge set, attributed to their keeper.
    ``lsh_bucket_skew`` reports what the cap rerouted.

    Over-cap members face the SAME evidence bar as within-cap pairs:
    a band-hash collision is only a candidate signal (that is exactly
    why within-cap pairs verify), so each (keeper, member) star edge
    is kept only if exact Jaccard(member, keeper) ≥ 0.5. The verify
    is O(|B|) rows per over-cap bucket — one shingle join per member,
    never per pair — so the skew bound is unchanged; it just stops a
    hash-collision false positive (or a small production cap) from
    collapsing genuinely distinct docs. A member that fails the
    verify is simply not claimed and stays kept.

    Quantified recall residual (r11; was prose until then): star
    edges verify member-vs-KEEPER only, so a bucket whose MIN doc is
    a band-hash false positive contributes NOTHING — measured on the
    adversarial corpus (FP crafted to collide in one band AND hold
    the min id): the poisoned band loses 3/3 of its star candidates,
    while each of the other three bands supplies its 2/2 keeper
    edges, leaving the drop set EQUAL to the uncapped reference
    (tests/test_synthetic_parity.py::
    test_star_collapse_residual_quantified_when_keeper_is_false_positive).
    Total loss would require the FP to collide in ALL bands and hold
    the min id everywhere — a full 16-value signature collision,
    i.e. a minhash duplicate, not a false positive. That bound is
    why re-anchoring failed members (a second verify pass per
    bucket) stays rejected.

    Plan shape (the r8 lesson, re-architected): the 4 band columns
    EXPLODE to long format ``(doc_id, b, h)`` so all four bands ride
    ONE ``(b, h)`` shuffle instead of four per-band shuffles; bucket
    size and bucket-min keeper come from window functions over that
    same partitioning (no aggregate-plus-join-back — the exchange the
    window creates already co-locates each bucket, so the within-cap
    self-join and the over-cap star projection both consume it
    without re-shuffling). Within-cap pairs and over-cap star pairs
    then union into a SINGLE ``cand`` set verified by ONE shingle
    join per side — one Jaccard filter total. The r7/r8 per-band
    aggregate-join layout cost 8 band exchanges in the funnel plan
    (caught by ``test_shuffle_budget``); this layout costs 2.

    BOTH sides of the within-cap join carry redundant-but-true
    predicates on n/keeper (r16 — the span family's discipline: n is
    constant per bucket so m.n ≤ cap is implied by a.n ≤ cap on a
    (b, h)-equi join; keeper ≤ doc_id always holds). NOT decoration:
    under the r16 aggregate-shaped signature, a side that references
    neither window output gets its window stack pruned, stops being
    the identical subtree, and the whole scan→hash→aggregate signature
    chain is recomputed (and, at stats-friendly sizes, BROADCAST) for
    that side — a 100 TB hazard. With them, one signature aggregate +
    one (b, h) exchange feed every marked reference (ReusedExchange,
    pinned in test_plans)."""
    sig = signature_sql(engine)
    jac = jaccard_expr("sa.sh", "sb.sh", engine)
    cap = _LSH_BUCKET_CAP
    longsigs = _longsigs_select(engine)
    return f"""sigs AS ({sig}),
{shingled_cte(engine)},
longsigs AS (
{longsigs}
),
marked AS (
  SELECT doc_id, b, h,
         count(*) OVER (PARTITION BY b, h) AS n,
         min(doc_id) OVER (PARTITION BY b, h) AS keeper
  FROM longsigs
),
cand AS (
  SELECT a.doc_id AS doc_a, m.doc_id AS doc_b
  FROM marked a JOIN marked m ON a.b = m.b AND a.h = m.h AND a.doc_id < m.doc_id
  WHERE a.n <= {cap} AND m.n <= {cap}
    AND a.keeper <= a.doc_id AND m.keeper <= m.doc_id
  UNION
  SELECT keeper AS doc_a, doc_id AS doc_b FROM marked
  WHERE n > {cap} AND doc_id > keeper
),
edges AS (
  SELECT doc_a, doc_b FROM (
    SELECT c.doc_a, c.doc_b, {jac} AS jaccard
    FROM cand c
    JOIN shingled sa ON sa.doc_id = c.doc_a
    JOIN shingled sb ON sb.doc_id = c.doc_b
  ) WHERE jaccard >= 0.5
)"""


def _dedup_minhash_lsh_capped_sql(engine: str) -> str:
    """Bucket-capped MinHash-LSH: identical to ``dedup_minhash_lsh``
    except that (band, hash) buckets holding more than
    ``_LSH_BUCKET_CAP`` signatures are EXCLUDED from candidate
    generation — the SCALE.md skew mitigation ("bucket-size capping")
    as tested code instead of a documented intention. Oversized
    buckets are near-certain duplicate clusters; production pipelines
    route them to the exact-hash dedup / cluster handler rather than
    enumerating their O(n²) pairs inside the join. The cap is applied
    identically in both engines (a per-band HAVING aggregate joined
    back), so the result stays exactly oracle-checkable.

    100 TB shape: one (b, h) window annotates every band row with its
    bucket size (the exchange both join sides then reuse), and the
    pair space drops from Σ|bucket|² to Σ_{|b|≤cap}|b|², making the
    worst case cap²·|buckets| instead of data-dependent. Measured on
    the 10×-clone probe dataset: see SCALE.md round-6 notes.
    ``lsh_bucket_skew`` reports what the cap dropped (no silent
    truncation)."""
    sig = signature_sql(engine)
    jac = jaccard_expr("sa.sh", "sb.sh", engine)
    return f"""
WITH sigs AS ({sig}),
{shingled_cte(engine)},
longsigs AS (
{longsigs_select(engine)}
),
{_capped_cands_ctes()}
SELECT doc_a, doc_b, jaccard FROM (
  SELECT c.doc_a, c.doc_b, {jac} AS jaccard
  FROM cand c
  JOIN shingled sa ON sa.doc_id = c.doc_a
  JOIN shingled sb ON sb.doc_id = c.doc_b
) WHERE jaccard >= 0.4
"""


@register(
    "dedup_minhash_lsh_capped",
    oracle=_dedup_minhash_lsh_capped_sql("duckdb"),
    tags=("pipeline", "dedup", "skew"),
)
def dedup_minhash_lsh_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, "documents", sf_dir).createOrReplaceTempView("documents")
    return spark.sql(_dedup_minhash_lsh_capped_sql("spark"))


def _lsh_bucket_skew_sql(engine: str) -> str:
    """The cap's coverage cost, measured (the "no silent caps"
    discipline): per band, the bucket count, the largest bucket, how
    many buckets the ``_LSH_BUCKET_CAP`` drops, and the candidate
    pairs saved (Σ n(n-1)/2 over capped buckets). At scale this is the
    dashboard row that tells you whether cap tuning is costing recall
    or just skipping duplicate clusters.

    Plan shape (r16): long-format band rows → ONE (b, h) bucket-size
    aggregate → a 4-row per-band rollup — the per-band UNION ALL this
    replaced referenced ``sigs`` once per band, which under the
    aggregate-shaped signature meant four scan+hash+aggregate chains
    for what one exchange now carries."""
    sig = signature_sql(engine)
    cap = _LSH_BUCKET_CAP
    div = "div" if engine == "spark" else "//"
    return f"""
WITH sigs AS ({sig}),
longsigs AS (
{longsigs_select(engine)}
),
buckets AS (
  SELECT b AS band, h, count(*) AS n FROM longsigs GROUP BY b, h
)
SELECT band, count(*) AS n_buckets,
       max(n) AS max_bucket,
       CAST(sum(CASE WHEN n > {cap} THEN 1 ELSE 0 END) AS BIGINT) AS buckets_capped,
       CAST(sum(CASE WHEN n > {cap} THEN (n * (n - 1)) {div} 2 ELSE 0 END) AS BIGINT) AS pairs_saved
FROM buckets GROUP BY band
"""


@register(
    "lsh_bucket_skew",
    oracle=_lsh_bucket_skew_sql("duckdb"),
    tags=("pipeline", "dedup", "skew"),
)
def lsh_bucket_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, "documents", sf_dir).createOrReplaceTempView("documents")
    return spark.sql(_lsh_bucket_skew_sql("spark"))


def _neardup_bucket_claims_oracle() -> str:
    """DuckDB twin of the streaming band-claim contract at doc_id
    arrival order: per (band, band_hash) bucket the keeper is the
    first arrival (= min doc_id when arrival order IS doc_id) and
    exactly that row is the bucket-opening claim."""
    sig = signature_sql("duckdb")
    longsigs = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, {b_} AS band, band{b_} AS band_hash FROM sigs"
        for b_ in range(4)
    )
    return f"""
WITH sigs AS ({sig}),
longsigs AS (
{longsigs}
)
SELECT doc_id, band,
       min(doc_id) OVER (PARTITION BY band, band_hash) AS keeper_doc_id,
       doc_id = min(doc_id) OVER (PARTITION BY band, band_hash) AS is_new_bucket
FROM longsigs
"""


@register(
    "neardup_bucket_claims",
    oracle=_neardup_bucket_claims_oracle(),
    tags=("pipeline", "dedup", "streaming"),
)
def neardup_bucket_claims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming near-dup suppressor's per-band bucket claims,
    driver-checkable: routes the documents table through the REAL
    ``dedup_stream_near`` batch branch (streaming/dedup.py — the same
    signature fold, band keys, and keep-first-per-bucket contract the
    applyInPandasWithState fold implements), with arrival order =
    doc_id (event time derived from it). One row per (doc, band):
    the bucket's keeper and whether this row opened the bucket. The
    oracle re-derives the contract relationally (keeper = min doc_id
    per bucket at this arrival order), so the external gate now pins
    the streaming arm's semantics, not just local stream==batch tests.

    Scale shape: identical to the stream — one shuffle on the 32-char
    band hash, state/window bounded per bucket; nothing quadratic.
    """
    from flink_wsr_project_spark.streaming.dedup import dedup_stream_near

    docs = load_table(spark, "documents", sf_dir).withColumn(
        "ts", F.timestamp_seconds(F.col("doc_id"))
    )
    return dedup_stream_near(docs)


def _ngram_jaccard_sql(engine: str) -> str:
    """Exact all-pairs n-gram Jaccard on a bounded id range (the
    exactness baseline the LSH path approximates)."""
    jac = jaccard_expr("a.sh", "b.sh", engine)
    return f"""
WITH {shingled_cte(engine)}
SELECT doc_a, doc_b, jaccard FROM (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, {jac} AS jaccard
  FROM shingled a JOIN shingled b ON a.doc_id < b.doc_id
  WHERE a.doc_id < 150 AND b.doc_id < 150
) WHERE jaccard >= 0.2
"""


@register("ngram_jaccard_pairs", oracle=_ngram_jaccard_sql("duckdb"), tags=("pipeline", "dedup"))
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, "documents", sf_dir).createOrReplaceTempView("documents")
    return spark.sql(_ngram_jaccard_sql("spark"))


def _minhash_jaccard_error_sql(engine: str) -> str:
    """MinHash estimation error, measured (the dedup analogue of
    ``ann_ivf_recall``): over the bounded exactness baseline
    (doc_id < 150, the same pair space as ``ngram_jaccard_pairs``),
    compare the 16-permutation MinHash estimate Ĵ = matches/16 against
    the exact shingle-set Jaccard J, pair by pair.

    The ``jaccard >= 0.05 OR jaccard_est >= 0.05`` keep-filter retains
    both error directions: pairs the estimator under-rates (potential
    LSH false negatives) AND pairs it over-rates (false positives the
    verify stage must reject). Estimate and exact value are integer
    milli-units (matches/16 and |∩|/|∪| are exact rationals — one
    integer multiply + floor-div per side, bit-identical cross-engine).

    100 TB path: the all-pairs baseline is the bounded evaluation
    harness only; at scale the same two expressions run over a SAMPLE
    of LSH candidate pairs (band-join output), giving the measured
    precision/recall trade-off for the chosen (n_perms, band) config
    without any quadratic term.
    """
    mh_cols = ", ".join(
        f"{minhash_from_hashed_expr(k, engine)} AS mh{k}" for k in range(N_PERMS)
    )
    toks = toks_expr("text", engine)
    hv = shingle_hash_array_expr("t", "trim(text)", engine)
    matches = " + ".join(
        f"CASE WHEN a.mh{k} = b.mh{k} THEN 1 ELSE 0 END" for k in range(N_PERMS)
    )
    if engine == "spark":
        na, nb = "size(array_distinct(a.sh))", "size(array_distinct(b.sh))"
        inter = "size(array_intersect(a.sh, b.sh))"
    else:
        na, nb = "len(list_distinct(a.sh))", "len(list_distinct(b.sh))"
        inter = "len(list_intersect(a.sh, b.sh))"
    return f"""
WITH mje_tok AS (
  SELECT doc_id, text, {toks} AS t FROM documents WHERE doc_id < 150
),
hashed AS (
  SELECT doc_id, {shingles_from_toks('t', 'text', engine)} AS sh, {hv} AS hv
  FROM mje_tok
),
sigs AS (SELECT doc_id, sh, {mh_cols} FROM hashed),
scored AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(FLOOR(({inter} * 1000) / ({na} + {nb} - {inter})) AS BIGINT) AS jaccard_milli,
         CAST(FLOOR((({matches}) * 1000) / {N_PERMS}) AS BIGINT) AS jaccard_est_milli
  FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, jaccard_milli, jaccard_est_milli,
       ABS(jaccard_est_milli - jaccard_milli) AS abs_err_milli
FROM scored
WHERE jaccard_milli >= 50 OR jaccard_est_milli >= 50
"""


@register(
    "minhash_jaccard_error",
    oracle=_minhash_jaccard_error_sql("duckdb"),
    tags=("pipeline", "dedup", "evaluation"),
)
def minhash_jaccard_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, "documents", sf_dir).createOrReplaceTempView("documents")
    return spark.sql(_minhash_jaccard_error_sql("spark"))


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def _simhash_sql(engine: str) -> str:
    """32-bit SimHash per document (±1 vote per token-hash bit)."""
    return simhash_sql(engine)


@register("dedup_simhash", oracle=_simhash_sql("duckdb"), tags=("pipeline", "dedup"))
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, "documents", sf_dir).createOrReplaceTempView("documents")
    return spark.sql(_simhash_sql("spark"))


def _simhash_neardup_sql(engine: str) -> str:
    """SimHash near-dup pairs: Hamming distance ≤ 3 of the 60-bit
    hash. The self-join is bounded here (≤5k docs); the 100 TB path
    blocks on 15-bit simhash blocks (simhash_neardup_blocked) before
    the Hamming check."""
    ham = hamming_expr("a.simhash", "b.simhash", engine)
    return f"""
WITH s AS ({simhash_sql(engine)})
SELECT doc_a, doc_b, hamming FROM (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, {ham} AS hamming
  FROM s a JOIN s b ON a.doc_id < b.doc_id
) WHERE hamming <= 3
"""


@register("simhash_neardup_pairs", oracle=_simhash_neardup_sql("duckdb"), tags=("pipeline", "dedup"))
def simhash_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, "documents", sf_dir).createOrReplaceTempView("documents")
    return spark.sql(_simhash_neardup_sql("spark"))


# ---------------------------------------------------------------------------
# Language ID / fingerprinting
# ---------------------------------------------------------------------------


@register("lang_id", oracle=lang_id_sql("duckdb"), tags=("pipeline", "text"))
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID: marker-word counts per language, argmax
    with fixed tie order. Dictionary literals shared with the oracle."""
    load_table(spark, "documents", sf_dir).createOrReplaceTempView("documents")
    return spark.sql(lang_id_sql("spark"))


@register("doc_fingerprint", oracle=fingerprint_sql("duckdb"), tags=("pipeline", "text"))
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprints: full md5 + min-shingle-hash."""
    load_table(spark, "documents", sf_dir).createOrReplaceTempView("documents")
    return spark.sql(fingerprint_sql("spark"))


# ---------------------------------------------------------------------------
# Similarity search over embeddings
# ---------------------------------------------------------------------------


def _ann_brute_force_sql(engine: str) -> str:
    """Brute-force cosine top-10: query set (vec_id % 50 = 0) ×
    corpus; Spark broadcasts the query side so the corpus streams
    through a single nested-loop stage with no shuffle."""
    rn = "row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id)"
    if engine == "spark":
        rn = f"CAST({rn} AS BIGINT)"
        ndq = dot_expr("embedding", "embedding", "spark")
        cos = cosine_prenorm_expr("q.qv", "e.embedding", "q.nd", "e.nd", "spark")
        return f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv, {ndq} AS nd FROM embeddings WHERE vec_id % 50 = 0),
e AS (SELECT vec_id, embedding, {ndq} AS nd FROM embeddings),
pairs AS (
  SELECT q.query_id, e.vec_id AS neighbor_id, {cos} AS cosine
  FROM q JOIN e ON e.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT *, {rn} AS rank FROM pairs
) WHERE rank <= 10
"""
    cos = cosine_expr("q.qv", "e.embedding", engine)
    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id % 50 = 0),
pairs AS (
  SELECT q.query_id, e.vec_id AS neighbor_id, {cos} AS cosine
  FROM q JOIN embeddings e ON e.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT *, {rn} AS rank FROM pairs
) WHERE rank <= 10
"""


@register(
    "ann_cosine_topk",
    oracle=_ann_brute_force_sql("duckdb"),
    tags=("pipeline", "similarity"),
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, "embeddings", sf_dir).createOrReplaceTempView("embeddings")
    return spark.sql(_ann_brute_force_sql("spark"))


def _ann_srp_sql(engine: str) -> str:
    """SRP-LSH candidate pairs: 8-bit signed-random-projection bucket
    per vector; pairs form only within a bucket, then cosine ≥ 0.3
    verify. The scale path: pair space is per-bucket, not O(n²)."""
    bucket = srp_bucket_expr("embedding", engine)
    if engine == "spark":
        nd = dot_expr("embedding", "embedding", "spark")
        cos = cosine_prenorm_expr("a.embedding", "b.embedding", "a.nd", "b.nd", "spark")
        return f"""
WITH bucketed AS (SELECT vec_id, embedding, {nd} AS nd, {bucket} AS bucket FROM embeddings)
SELECT vec_a, vec_b, bucket, cosine FROM (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.bucket, {cos} AS cosine
  FROM bucketed a JOIN bucketed b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
) WHERE cosine >= 0.3
"""
    cos = cosine_expr("a.embedding", "b.embedding", engine)
    return f"""
WITH bucketed AS (SELECT vec_id, embedding, {bucket} AS bucket FROM embeddings)
SELECT vec_a, vec_b, bucket, cosine FROM (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.bucket, {cos} AS cosine
  FROM bucketed a JOIN bucketed b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
) WHERE cosine >= 0.3
"""


@register("ann_srp_lsh_pairs", oracle=_ann_srp_sql("duckdb"), tags=("pipeline", "similarity"))
def ann_srp_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, "embeddings", sf_dir).createOrReplaceTempView("embeddings")
    return spark.sql(_ann_srp_sql("spark"))


def _embedding_neardup_sql(engine: str) -> str:
    """Embedding-cosine near-dup pairs within a blocking key (label).

    Spark side (r16): self-dots are hoisted to a per-row ``nd`` on
    each join input (``cosine_prenorm_expr`` — one interpreted fold
    per pair instead of three-plus; measured 5.4 s → 2.2 s on this
    join at sf0.1, identical pairs). The oracle string is unchanged."""
    if engine == "spark":
        nd = dot_expr("embedding", "embedding", "spark")
        cos = cosine_prenorm_expr("a.embedding", "b.embedding", "a.nd", "b.nd", "spark")
        side = f"(SELECT vec_id, label, embedding, {nd} AS nd FROM embeddings)"
        return f"""
SELECT vec_a, vec_b, label, cosine FROM (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label, {cos} AS cosine
  FROM {side} a JOIN {side} b ON a.label = b.label AND a.vec_id < b.vec_id
) WHERE cosine >= 0.35
"""
    cos = cosine_expr("a.embedding", "b.embedding", engine)
    return f"""
SELECT vec_a, vec_b, label, cosine FROM (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label, {cos} AS cosine
  FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
) WHERE cosine >= 0.35
"""


@register(
    "embedding_cosine_neardup",
    oracle=_embedding_neardup_sql("duckdb"),
    tags=("pipeline", "dedup", "similarity"),
)
def embedding_cosine_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, "embeddings", sf_dir).createOrReplaceTempView("embeddings")
    return spark.sql(_embedding_neardup_sql("spark"))




def _dedup_agreement_sql(
    engine: str, text_rel: str | None = None, emb_rel: str | None = None
) -> str:
    """Cross-modal dedup agreement: the text-based near-dup pairs
    (MinHash-LSH, Jaccard >= 0.5) against the embedding-based pairs
    (cosine >= 0.35, label-blocked) — both member pipelines are the
    registered, verified queries. Joining on the (lo, hi) pair key
    yields the method-comparison every dedup rollout needs: how many
    pairs each method finds, and how many both agree on. One row.

    Scale: cost is the two member pipelines + a full-outer join on
    pair keys (each side already bucketed/blocked — no new all-pairs
    work).

    ``text_rel``/``emb_rel`` (Spark side, r17): pre-materialized
    (lo, hi) member relations — the two pipelines are independent, so
    the query builder materializes them concurrently (guide §2.6).
    The oracle composes with both None — string unchanged."""
    if text_rel is not None:
        text_pairs = f"SELECT lo, hi FROM {text_rel}"
    else:
        text_pairs = (
            "SELECT doc_a AS lo, doc_b AS hi FROM "
            f"({_dedup_minhash_lsh_sql(engine)}) WHERE jaccard >= 0.5"
        )
    if emb_rel is not None:
        emb_pairs = f"SELECT lo, hi FROM {emb_rel}"
    else:
        emb_pairs = (
            f"SELECT vec_a AS lo, vec_b AS hi FROM ({_embedding_neardup_sql(engine)})"
        )
    return f"""
WITH text_pairs AS (
  {text_pairs}
),
emb_pairs AS (
  {emb_pairs}
),
joined AS (
  SELECT COALESCE(t.lo, e.lo) AS lo,
         CASE WHEN t.lo IS NOT NULL THEN 1 ELSE 0 END AS in_text,
         CASE WHEN e.lo IS NOT NULL THEN 1 ELSE 0 END AS in_emb
  FROM text_pairs t FULL OUTER JOIN emb_pairs e ON t.lo = e.lo AND t.hi = e.hi
)
SELECT CAST(sum(in_text) AS BIGINT) AS n_text_pairs,
       CAST(sum(in_emb) AS BIGINT) AS n_emb_pairs,
       CAST(sum(in_text * in_emb) AS BIGINT) AS n_both
FROM joined
"""


@register(
    "dedup_method_agreement",
    oracle=_dedup_agreement_sql("duckdb"),
    doc=_dedup_agreement_sql.__doc__,
    tags=("pipeline", "dedup", "similarity"),
)
def dedup_method_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, "documents", sf_dir).createOrReplaceTempView("documents")
    load_table(spark, "embeddings", sf_dir).createOrReplaceTempView("embeddings")
    # r17 (guide §2.6): the MinHash chain and the embedding pair join
    # are independent member pipelines — materialize concurrently.
    _run_view_builders(
        spark,
        {
            "_dma_text": lambda: _materialize_once(
                spark.sql(
                    "SELECT doc_a AS lo, doc_b AS hi FROM ("
                    + _dedup_minhash_lsh_sql("spark")
                    + ") WHERE jaccard >= 0.5"
                ),
                "_dma_text",
            ),
            "_dma_emb": lambda: _materialize_once(
                spark.sql(
                    "SELECT vec_a AS lo, vec_b AS hi FROM ("
                    + _embedding_neardup_sql("spark")
                    + ")"
                ),
                "_dma_emb",
            ),
        },
    )
    return spark.sql(_dedup_agreement_sql("spark", "_dma_text", "_dma_emb"))


def _dedup_keep_list_sql(engine: str) -> str:
    """End-to-end dedup decision: a doc is dropped iff some LOWER
    doc_id claims it — via an LSH-verified near-dup pair (Jaccard
    ≥ 0.5) from a within-cap bucket, or via membership in an over-cap
    (band, hash) bucket whose min doc_id is the keeper AND exact
    Jaccard vs that keeper ≥ 0.5 (same evidence bar as within-cap;
    the verify is one shingle join per member, never per pair).
    Everything else is kept.

    Cap-aware since r7 (the composed chain used to route through the
    UNCAPPED candidate join — exactly the Σ|bucket|² exposure the r6
    cap was built to kill, inherited by ``dedup_components`` and
    ``curation_funnel``): over-cap buckets now collapse to their
    bucket-min without pair enumeration, identical SQL both engines.
    On pure clone clusters the drop set equals the uncapped chain's
    (pinned by tests/test_synthetic_parity.py::
    test_capped_keep_list_matches_uncapped_on_clones)."""
    return f"""
WITH {_neardup_edges_ctes(engine)},
drops AS (SELECT DISTINCT doc_b AS doc_id FROM edges)
SELECT d.doc_id,
       CASE WHEN dr.doc_id IS NULL THEN 'keep' ELSE 'drop' END AS action
FROM documents d LEFT JOIN drops dr ON d.doc_id = dr.doc_id
"""


@register("dedup_keep_list", oracle=_dedup_keep_list_sql("duckdb"), tags=("pipeline", "dedup"))
def dedup_keep_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, "documents", sf_dir).createOrReplaceTempView("documents")
    return spark.sql(_dedup_keep_list_sql("spark"))


def _incr_is_batch(col: str) -> str:
    """Batch-membership predicate for the incremental dedup model: the
    'new arrivals' slice is the deterministic ``doc_id % 3 = 2`` third
    of the corpus (chosen so all three decision branches fire at the
    sf0.01 gate — dup_of_corpus, dup_within_batch AND keep are each
    non-empty; the dead-branch audit discipline)."""
    return f"{col} % 3 = 2"


def _dedup_incremental_sql(engine: str) -> str:
    """Incremental near-dup dedup: dedup a NEW batch of documents
    against an ALREADY-DEDUPED corpus without re-deduping the corpus —
    the operational mode of a 100 TB curation pipeline, where each
    day's crawl increment must not trigger a corpus×corpus re-shuffle.

    Semantics (consistent with ``dedup_keep_list``'s claim ordering):
    a batch doc is ``dup_of_corpus`` if it has a verified near-dup
    (exact 3-gram Jaccard ≥ 0.5 on an LSH band candidate) anywhere in
    the corpus — corpus docs are immutable and always outrank batch
    docs; else ``dup_within_batch`` if a SMALLER batch doc_id claims
    it; else ``keep``. ``dup_of`` is the smallest claiming partner
    (corpus partner preferred). Corpus↔corpus pairs are never formed —
    that work was paid when the corpus itself was deduped.

    100 TB shape: the corpus side of the (b, h) band join is, in a real
    deployment, a PERSISTED long-format signature store — written once
    by the initial dedup run (``minhash_signatures`` → posexplode →
    parquet bucketed by h) — so an increment costs: one signature scan
    over Δ only, one equi-join of Δ's 4·|Δ| band rows against the
    store (bucket-pruned to the band hashes Δ actually produces, never
    a corpus shuffle), and one Jaccard verify per candidate. Candidate
    volume is Σ_buckets |Δ∩b|·|b| — linear in |Δ|, bounded by the
    corpus bucket-size distribution; a skewed corpus bucket composes
    with the same cap/star-collapse contract as the batch chain
    (``_neardup_edges_ctes``). This query models the store with a
    deterministic partition of the one gate table so the whole path
    stays a single oracle-checkable statement; the self-join carries
    the batch/corpus routing in the join predicate, so there is ONE
    (b, h) shuffle, not separate batch- and corpus-side plans.
    """
    sig = signature_sql(engine)
    jac = jaccard_expr("sa.sh", "sb.sh", engine)
    a_batch = _incr_is_batch("a.doc_id")
    m_batch = _incr_is_batch("m.doc_id")
    return f"""
WITH sigs AS ({sig}),
{shingled_cte(engine)},
longsigs AS (
{_longsigs_select(engine)}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, m.doc_id AS doc_b,
         CASE WHEN {m_batch} THEN 'batch' ELSE 'corpus' END AS side
  FROM longsigs a JOIN longsigs m ON a.b = m.b AND a.h = m.h
  WHERE {a_batch}
    AND (NOT ({m_batch}) OR m.doc_id < a.doc_id)
),
verified AS (
  SELECT doc_a, doc_b, side FROM (
    SELECT c.doc_a, c.doc_b, c.side, {jac} AS jaccard
    FROM cand c
    JOIN shingled sa ON sa.doc_id = c.doc_a
    JOIN shingled sb ON sb.doc_id = c.doc_b
  ) WHERE jaccard >= 0.5
),
dup_partner AS (
  SELECT doc_a AS doc_id,
         min(CASE WHEN side = 'corpus' THEN doc_b END) AS corpus_dup,
         min(CASE WHEN side = 'batch' THEN doc_b END) AS batch_dup
  FROM verified GROUP BY doc_a
)
SELECT b.doc_id,
       CASE WHEN d.corpus_dup IS NOT NULL THEN 'dup_of_corpus'
            WHEN d.batch_dup IS NOT NULL THEN 'dup_within_batch'
            ELSE 'keep' END AS decision,
       coalesce(d.corpus_dup, d.batch_dup) AS dup_of
FROM (SELECT doc_id FROM documents WHERE {_incr_is_batch("doc_id")}) b
LEFT JOIN dup_partner d ON d.doc_id = b.doc_id
"""


@register(
    "dedup_incremental",
    oracle=_dedup_incremental_sql("duckdb"),
    doc=_dedup_incremental_sql.__doc__,
    tags=("pipeline", "dedup"),
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, "documents", sf_dir).createOrReplaceTempView("documents")
    return spark.sql(_dedup_incremental_sql("spark"))


def _dedup_components_oracle() -> str:
    """Transitive-closure oracle: reachability via recursive CTE over
    the cap-aware edge set (within-cap verified pairs + over-cap star
    edges — the same ``edges`` CTE the Spark side feeds to label
    propagation), then min reachable id per doc. Only viable at oracle
    scale — the Spark side uses distributed label propagation."""
    return f"""
WITH RECURSIVE {_neardup_edges_ctes("duckdb")},
bi AS (
  SELECT doc_a AS a, doc_b AS b FROM edges
  UNION
  SELECT doc_b AS a, doc_a AS b FROM edges
),
reach AS (
  SELECT doc_id AS src, doc_id AS dst FROM documents
  UNION
  SELECT r.src, e.b AS dst FROM reach r JOIN bi e ON r.dst = e.a
)
SELECT src AS doc_id, min(dst) AS component_id FROM reach GROUP BY src
"""


def min_label_propagation(labels: DataFrame, edges: DataFrame, max_rounds: int = 50) -> DataFrame:
    """Distributed connected components by iterative min-label
    propagation: each round every node takes the min of its own label
    and its neighbors' labels (one join + one groupBy, shuffled on the
    node id only). O(component diameter) rounds; convergence detected
    by the monotonically decreasing label sum — O(1) driver bytes per
    round, never a per-row collect.

    Each round's result is ``localCheckpoint``-ed (not just cached):
    checkpointing truncates lineage, so the logical plan stays one
    join deep regardless of round count — without it analysis/codegen
    cost grows superlinearly with iterations (same pattern as the
    ``doc_pagerank`` loop below).

    r17: ONE action per round instead of two (guide §5 driver
    discipline — the pagerank treatment applied to the convergence
    read). The label sum is an ``observe()`` metric computed DURING
    the checkpoint job that materializes the round, not a second
    aggregate job over the materialized blocks; the checkpointed
    frame's plan (LogicalRDD) drops the metrics node, so callers see
    the identical schema and rows.

    ``labels``: (doc_id, component_id) initial labels (usually
    component_id = doc_id). ``edges``: directed (a, b) pairs — pass
    both orientations for an undirected graph.
    """
    from pyspark.sql import Observation

    obs0 = Observation()
    labels, labels_ids = local_checkpoint_tracked(
        labels.observe(obs0, F.sum("component_id").alias("s"))
    )
    spark = labels.sparkSession
    prev_sum = obs0.get["s"]
    for _ in range(max_rounds):
        nbr_min = (
            edges.join(labels, edges.b == labels.doc_id)
            .groupBy("a")
            .agg(F.min("component_id").alias("nbr_min"))
        )
        obs = Observation()
        new_labels, new_ids = local_checkpoint_tracked(
            labels.join(nbr_min, labels.doc_id == nbr_min.a, "left")
            .select(
                "doc_id",
                F.least(
                    F.col("component_id"), F.coalesce("nbr_min", "component_id")
                ).alias("component_id"),
            )
            .observe(obs, F.sum("component_id").alias("s"))
        )
        new_sum = obs.get["s"]
        # Release the superseded round's checkpointed blocks once the new
        # round is materialized and its convergence sum read — otherwise
        # block-manager memory/disk grows O(rounds × |labels|) on deep
        # graphs. (The final round's checkpoint stays alive: callers
        # consume the returned frame.)
        release_persistent_rdds(spark, labels_ids)
        labels, labels_ids = new_labels, new_ids
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    return labels


@register("dedup_components", oracle=_dedup_components_oracle(), tags=("pipeline", "dedup"))
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clustering: connected components over LSH-verified pairs
    (Jaccard ≥ 0.5), canonical = min doc_id per component — the
    transitively-correct version of ``dedup_keep_list``.

    Spark-first CC: iterative min-label propagation (one join + one
    groupBy per round, O(component diameter) rounds — near-dup clusters
    are shallow). Each round is fully distributed; convergence is
    detected by the monotonically decreasing label sum, so no per-row
    driver collect. At 100 TB the same loop holds (labels/edges are
    shuffled on doc_id only); pathological diameters would call for
    large-star/small-star, which this loop structure accommodates.

    The edge set is the cap-aware chain contract
    (:func:`_neardup_edges_ctes`): over-cap LSH buckets contribute at
    most |B|−1 keeper-verified star edges (Jaccard ≥ 0.5 vs the
    bucket-min keeper) instead of |B|²/2 enumerated pairs. When every
    star edge passes the verify (the clone-cluster case the cap
    exists for) the star is connectivity-equivalent to the clique, so
    a giant clone cluster converges to one component in ONE
    propagation round while the candidate join stays Σ_{|b|≤cap}|b|².
    When individual star edges FAIL the verify (a band-hash
    false-positive keeper), the failed members lose this bucket's
    connectivity entirely — mutual member↔member duplicate edges are
    only recovered if another band re-buckets them (documented recall
    trade in :func:`_neardup_edges_ctes`).
    """
    docs = load_table(spark, "documents", sf_dir)
    docs.createOrReplaceTempView("documents")
    pairs = spark.sql(
        f"WITH {_neardup_edges_ctes('spark')} SELECT doc_a, doc_b FROM edges"
    )
    edges = (
        pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
        .union(pairs.select(F.col("doc_b").alias("a"), F.col("doc_a").alias("b")))
        .cache()
    )
    labels = docs.select("doc_id", F.col("doc_id").alias("component_id"))
    out = min_label_propagation(labels, edges)
    edges.unpersist()
    return out


# ---------------------------------------------------------------------------
# Token vocabulary (BPE-training-style corpus statistics)
# ---------------------------------------------------------------------------

_VOCAB_ORACLE = """
WITH toks AS (
  SELECT unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS token FROM documents
),
freqs AS (SELECT token, count(*) AS freq FROM toks WHERE token <> '' GROUP BY token)
SELECT token, freq, rank FROM (
  SELECT token, freq, row_number() OVER (ORDER BY freq DESC, token) AS rank FROM freqs
) WHERE rank <= 100
"""


@register("token_vocab_topk", oracle=_VOCAB_ORACLE, tags=("pipeline", "text"))
def token_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: top-100 tokens by frequency (the first step of
    BPE/vocab training). explode → count is one shuffle on token; the
    global top-100 plans TakeOrderedAndProject (per-task heaps merged at
    the driver — never a |vocab|-sized single-partition exchange, which
    is what an unpartitioned row_number() would do at corpus scale)."""
    from flink_wsr_project_spark.operators.topn import global_topn

    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(
        F.explode(F.split(F.lower(F.col("text")), "[^a-z0-9]+")).alias("token")
    ).filter(F.col("token") != "")
    freqs = toks.groupBy("token").agg(F.count("*").alias("freq"))
    return global_topn(freqs, "freq", 100, tiebreakers=["token"]).select(
        "token", "freq", "rank"
    )


# ---------------------------------------------------------------------------
# IVF approximate nearest-neighbor search
# ---------------------------------------------------------------------------


def _ann_ivf_sql(engine: str, nprobe: int = 1) -> str:
    """IVF top-5: train centroids (per-label component-wise mean via
    integer-scaled sums — order-independent, bit-exact), assign each
    query to its ``nprobe`` nearest centroids (default 1), then search
    only those inverted lists. The probed fraction is ~nprobe/n_lists
    of the corpus — the scale path vs the brute-force baseline, with
    nprobe as the recall dial (candidate set grows monotonically)."""
    if engine == "spark":
        exploded = (
            "SELECT label, pos, CAST(x AS DOUBLE) AS x "
            "FROM embeddings LATERAL VIEW posexplode(embedding) t AS pos, x"
        )
        centroid_list = (
            "transform(array_sort(collect_list(struct(pos, val))), s -> s.val)"
        )
        rank_cast = lambda rn: f"CAST({rn} AS BIGINT)"  # noqa: E731
    else:
        exploded = (
            "SELECT label, generate_subscripts(embedding, 1) AS pos, "
            "CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings"
        )
        centroid_list = "list(val ORDER BY pos)"
        rank_cast = lambda rn: rn  # noqa: E731
    cos_qc = cosine_expr("q.qv", "c.cv", engine)
    cos_qe = cosine_expr("a.qv", "e.embedding", engine)
    rn_probe = "row_number() OVER (PARTITION BY query_id ORDER BY cos_c DESC, probe_label)"
    rn_final = rank_cast(
        "row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id)"
    )
    # keep the registered nprobe=1 SQL textually unchanged
    probe_cond = "rn = 1" if nprobe == 1 else f"rn <= {int(nprobe)}"
    return f"""
WITH exploded AS ({exploded}),
comp AS (
  SELECT label, pos,
         sum(CAST(round(x * 1000000) AS BIGINT)) / (count(*) * 1000000.0) AS val
  FROM exploded GROUP BY label, pos
),
centroids AS (SELECT label, {centroid_list} AS cv FROM comp GROUP BY label),
q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id % 50 = 0),
probes AS (
  SELECT query_id, qv, probe_label FROM (
    SELECT *, {rn_probe} AS rn FROM (
      SELECT q.query_id, q.qv, c.label AS probe_label, {cos_qc} AS cos_c
      FROM q CROSS JOIN centroids c
    )
  ) WHERE {probe_cond}
),
pairs AS (
  SELECT a.query_id, a.probe_label, e.vec_id AS neighbor_id, {cos_qe} AS cosine
  FROM probes a JOIN embeddings e ON e.label = a.probe_label AND e.vec_id <> a.query_id
)
SELECT query_id, probe_label, neighbor_id, cosine, rank FROM (
  SELECT *, {rn_final} AS rank FROM pairs
) WHERE rank <= 5
"""


@register("ann_ivf_topk", oracle=_ann_ivf_sql("duckdb"), tags=("pipeline", "similarity"))
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, "embeddings", sf_dir).createOrReplaceTempView("embeddings")
    return spark.sql(_ann_ivf_sql("spark"))



def _ann_recall_sql(engine: str, nprobe: int = 1) -> str:
    """ANN quality evaluation: recall@5 of the IVF index against the
    exact brute-force neighbors, per query vector — the metric that
    decides whether an approximate index is good enough to replace the
    exact scan. Both member pipelines are the registered queries
    (`ann_cosine_topk`, `ann_ivf_topk`) verbatim, so this composes two
    already-verified plans; ties and ordering are deterministic in
    both, making recall itself exact. recall_ppm is floored ppm.

    Scale: cost is the two member pipelines + one (query_id,
    neighbor_id) equi-join over <= 10 rows per query."""
    exact = _ann_brute_force_sql(engine)
    ivf = _ann_ivf_sql(engine, nprobe)
    return f"""
WITH exact AS ({exact}),
ivf AS ({ivf})
SELECT e.query_id AS query_id,
       CAST(count(i.neighbor_id) AS BIGINT) AS n_hit,
       CAST(floor(count(i.neighbor_id) * 1000000.0 / count(*)) AS BIGINT) AS recall_ppm
FROM (SELECT * FROM exact WHERE rank <= 5) e
LEFT JOIN ivf i ON i.query_id = e.query_id AND i.neighbor_id = e.neighbor_id
GROUP BY e.query_id
"""


@register(
    "ann_ivf_recall",
    oracle=_ann_recall_sql("duckdb"),
    doc=_ann_recall_sql.__doc__,
    tags=("pipeline", "similarity"),
)
def ann_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, "embeddings", sf_dir).createOrReplaceTempView("embeddings")
    return spark.sql(_ann_recall_sql("spark"))


_NPROBE2_DOC = """Recall@5 of the IVF index probing each query's TWO
nearest lists (nprobe=2) vs the exact neighbors — the recall dial's
externally-checked point. The candidate set is a superset of
``ann_ivf_recall``'s (nprobe=1), so per-query recall is monotone:
n_hit here >= n_hit there, row for row (the deployment-shape twin is
``ann_topk_from_index_pruned(nprobe=...)``, where the dial costs
nprobe pruned directories per query). Scale: identical plan shape to
ann_ivf_recall — the probes CTE keeps two rows per query instead of
one, doubling only the searched-list volume."""


def _quantized_recall_sql(engine: str) -> str:
    """Recall@5 of BRUTE-FORCE cosine over int8-QUANTIZED embeddings vs
    exact float cosine — the quality gate for the standard large-scale
    ANN bandwidth lever (per-vector symmetric int8, the IVF-SQ8
    scheme): at 100 TB, 4× fewer bytes scanned/shuffled per vector is
    the difference between a feasible and an infeasible flat pass, IF
    recall holds; this query measures exactly that, per query vector.

    Quantization is deterministic and engine-identical by
    construction: scale = 127 / max(|x|) per vector (NULL for a
    zero vector — its cosine is NULL and it ranks last, matching the
    float path's zero-norm contract), and rounding is explicit
    ``floor(v + 0.5)`` (half-toward-+inf) rather than each engine's
    ``round`` (Spark HALF_UP vs DuckDB's differ on .5 ties). Cosine
    over the int arrays is exact-integer arithmetic in doubles, so the
    two engines agree bit-for-bit. Scale: same single broadcast
    nested-loop pass as ``ann_cosine_topk`` + one in-row quantization
    projection; recall join is <= 10 rows per query."""
    if engine == "spark":
        maxabs = (
            "aggregate(embedding, CAST(0.0 AS DOUBLE), "
            "(acc, x) -> greatest(acc, abs(CAST(x AS DOUBLE))))"
        )
        tf = (
            "transform(embedding, x -> "
            "CAST(floor(CAST(x AS DOUBLE) * 127.0 / m + 0.5) AS INT))"
        )
    else:
        maxabs = "list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))"
        tf = (
            "list_transform(embedding, x -> "
            "CAST(floor(CAST(x AS DOUBLE) * 127.0 / m + 0.5) AS INTEGER))"
        )
    exact = _ann_brute_force_sql(engine)
    cos8 = cosine_expr("q.qv8", "e.qv8", engine)
    rn = "row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id)"
    return f"""
WITH exact AS ({exact}),
qembed AS (
  SELECT vec_id, {tf} AS qv8
  FROM (SELECT vec_id, embedding, nullif({maxabs}, 0.0) AS m FROM embeddings)
),
qpairs AS (
  SELECT q.query_id, e.vec_id AS neighbor_id, {cos8} AS cosine
  FROM (SELECT vec_id AS query_id, qv8 FROM qembed WHERE vec_id % 50 = 0) q
  JOIN qembed e ON e.vec_id <> q.query_id
),
quant AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, {rn} AS rank FROM qpairs
  ) WHERE rank <= 5
)
SELECT e.query_id AS query_id,
       CAST(count(i.neighbor_id) AS BIGINT) AS n_hit,
       CAST(floor(count(i.neighbor_id) * 1000000.0 / count(*)) AS BIGINT) AS recall_ppm
FROM (SELECT * FROM exact WHERE rank <= 5) e
LEFT JOIN quant i ON i.query_id = e.query_id AND i.neighbor_id = e.neighbor_id
GROUP BY e.query_id
"""


@register(
    "ann_quantized_recall",
    oracle=_quantized_recall_sql("duckdb"),
    doc=_quantized_recall_sql.__doc__,
    tags=("pipeline", "similarity"),
)
def ann_quantized_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, "embeddings", sf_dir).createOrReplaceTempView("embeddings")
    return spark.sql(_quantized_recall_sql("spark"))


@register(
    "ann_ivf_recall_nprobe2",
    oracle=_ann_recall_sql("duckdb", nprobe=2),
    doc=_NPROBE2_DOC,
    tags=("pipeline", "similarity"),
)
def ann_ivf_recall_nprobe2(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, "embeddings", sf_dir).createOrReplaceTempView("embeddings")
    return spark.sql(_ann_recall_sql("spark", nprobe=2))


# ---------------------------------------------------------------------------
# Multimodal (binary payload plumbing; decode stubbed — see operators.multimodal)
# ---------------------------------------------------------------------------


def _fingerprint_once(df: DataFrame, key: str) -> DataFrame:
    """Materialize a mapInPandas fingerprint relation ONCE per query
    call (r16). The 4-block pigeonhole self-joins reference the
    relation 8-12 times per query (36 in modal_dedup_consensus), and
    as a lazy view every reference re-ran the synthesize + Arrow
    decode chain - the static plans showed MapInPandas x8-36 where
    the data needs exactly one pass. localCheckpoint inside the timed
    call: recomputed from parquet on every invocation (the semdedup /
    decontaminate pattern), nothing persists across runs. At scale
    the fingerprint relation is (asset_id, 64-bit hash) - the
    cheapest relation in the query - while each decode pass is the
    most expensive; one-pass materialization is the guide Section 8
    decide-on-small-rows discipline. ``key`` names the call site for
    the r17 tracked-release discipline (the previous invocation's
    blocks are freed when the site re-materializes)."""
    return _materialize_once(df, key)

def _media_features_oracle() -> str:
    """Models the REAL decode of all three synthetic containers
    (operators/multimodal.py): 172-byte WAV (audio), 24 bpp BMP with
    doc_id-dependent width (image), multi-frame 4x4 Y4M (video).
    n_bytes and payload_md5 recompute the exact payload bytes; thumb
    dims and the sampling plan mirror what the parsers derive from
    those bytes; decode_status='decoded' everywhere asserts every
    parser ran. payload_md5 is md5(upper-hex(payload)) — expressible
    in both engines (DuckDB md5 is VARCHAR-only)."""
    from flink_wsr_project_spark.operators.multimodal import (
        BMP_HEADER_HEX,
        BMP_HEIGHT,
        BMP_WIDTHS,
        WAV_FRAMES,
        WAV_HEADER_HEX,
        WAV_PCM_BYTES,
        Y4M_FRAME_BODY,
        Y4M_HEADER,
    )

    wav_bytes = 44 + WAV_FRAMES
    bmp_header = "CASE doc_id % 4 " + " ".join(
        f"WHEN {i} THEN '{BMP_HEADER_HEX[w]}'" for i, w in enumerate(BMP_WIDTHS)
    ) + " END"
    y4m_head = Y4M_HEADER.rstrip("\n")
    return f"""
WITH m AS (
  SELECT doc_id, text, n_chars,
         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         4 * (doc_id % 4 + 1) AS bmp_w,
         doc_id % 5 + 1 AS y4m_n
  FROM documents
)
SELECT doc_id AS asset_id, kind,
       CASE kind WHEN 'audio' THEN {wav_bytes}
                 WHEN 'image' THEN 54 + 3 * {BMP_HEIGHT} * bmp_w
                 ELSE {len(Y4M_HEADER)} + y4m_n * (6 + {Y4M_FRAME_BODY}) END AS n_bytes,
       CASE kind
            WHEN 'audio'
            THEN md5(hex(from_hex('{WAV_HEADER_HEX}')
                         || encode(rpad(CAST(doc_id AS VARCHAR), {WAV_PCM_BYTES}, '0'))))
            WHEN 'image'
            THEN md5(hex(from_hex({bmp_header})
                         || encode(rpad(CAST(doc_id AS VARCHAR),
                                        CAST(3 * {BMP_HEIGHT} * bmp_w AS INTEGER), '0'))))
            ELSE md5(hex(encode('{y4m_head}' || chr(10)
                         || repeat('FRAME' || chr(10)
                                   || rpad(CAST(doc_id AS VARCHAR), {Y4M_FRAME_BODY}, 'z'),
                                   CAST(y4m_n AS INTEGER))))) END AS payload_md5,
       CAST(CASE kind WHEN 'audio' THEN 0 WHEN 'image' THEN bmp_w ELSE 4 END
            AS INTEGER) AS thumb_w,
       CAST(CASE kind WHEN 'audio' THEN 0 WHEN 'image' THEN {BMP_HEIGHT} ELSE 4 END
            AS INTEGER) AS thumb_h,
       CAST(CASE kind WHEN 'video' THEN (y4m_n + 1) // 2 ELSE 1 END
            AS INTEGER) AS n_frames_sampled,
       'decoded' AS decode_status
FROM m
"""


@register("media_features", oracle=_media_features_oracle(), tags=("pipeline", "multimodal"))
def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload feature extraction through the Arrow/mapInPandas
    path (operators.multimodal). ALL three modalities decode FOR REAL
    from genuine container bytes — WAV via the stdlib wave codec, BMP
    via struct parsing, Y4M via stream-marker parsing (public formats
    need no codec libraries; PIL/PyAV are probed first for compressed
    formats when present). Every emitted field — dimensions, frame
    counts, sampling plans — derives from parsed bytes and is
    deterministic, so even this Pandas-UDF operator is oracle-checked
    exactly."""
    from flink_wsr_project_spark.operators.multimodal import (
        extract_features,
        synthesize_media_assets,
    )

    return extract_features(synthesize_media_assets(spark, sf_dir))


def _image_dhash_oracle() -> str:
    """DuckDB oracle for ``image_dhash_neardup``: reconstructs the
    64-bit dHash ARITHMETICALLY from (doc_id, text) — the BMP pixel
    body is ``rpad(substring(text, 1, 24w), 24w, '0')`` with width
    ``w = 4·(doc_id%4+1)`` and height 8 (operators/multimodal.py::
    synthesize_image_renders), so per-pixel gray sums are ``ascii()``
    over substring positions and the 9×8 sample grid is pure integer
    math — then enumerates near-dup pairs EXHAUSTIVELY (Hamming ≤ 3
    over all n² pairs). The Spark side decodes the hash from REAL BMP
    bytes through the Arrow path and blocks candidates by 16-bit-block
    pigeonhole; the hash-exact match therefore proves BOTH that the
    binary decode is correct and that the blocking is lossless (the
    simhash_neardup_blocked pattern)."""
    ham = hamming_expr("a.dhash", "b.dhash", "duckdb")
    return f"""
WITH {_image_dhash_oracle_ctes()}
SELECT doc_a, doc_b, hamming FROM (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, {ham} AS hamming
  FROM h a JOIN h b ON a.doc_id < b.doc_id
) WHERE hamming <= 3
"""


def _image_dhash_oracle_ctes(p: str = "") -> str:
    """Shared DuckDB WITH-body reconstructing each document's render
    dHash arithmetically: ``{p}h`` ends as (doc_id, dhash). 72 gray
    samples (9 cols × 8 rows; the render height IS the grid height, so
    row sampling is the identity), 64 comparison bits. Bit 63 is the
    int64 SIGN bit: bits 0–62 sum as powers of two, bit 63 adds the
    minimum-int64 constant — reproducing the Spark closure's
    two's-complement wraparound exactly. See ``_image_dhash_oracle``
    for the derivation. ``p`` prefixes every CTE name so several
    modalities' reconstructions can share one WITH clause (the
    consensus oracle); the default "" keeps the single-modality
    oracles byte-identical."""
    base = "3 * ((i // 9) * w + least((i % 9) * w // 9, w - 1))"
    gray = " + ".join(
        f"ascii(substring(body, CAST({base} + {o} AS INT), 1))" for o in (1, 2, 3)
    )
    bit = (
        "CASE WHEN s[CAST((i // 8) * 9 + (i % 8) + 2 AS INT)]"
        " > s[CAST((i // 8) * 9 + (i % 8) + 1 AS INT)]"
        " THEN (CAST(1 AS BIGINT) << CAST(i AS INT)) ELSE CAST(0 AS BIGINT) END"
    )
    sign = (
        "CASE WHEN s[72] > s[71] THEN CAST(-9223372036854775807 AS BIGINT) - 1 "
        "ELSE CAST(0 AS BIGINT) END"
    )
    return f"""{p}img AS (
  SELECT doc_id, 4 * (doc_id % 4 + 1) AS w,
         rpad(substring(regexp_replace(text, '[^ -~]', '0', 'g'), 1,
                        CAST(24 * 4 * (doc_id % 4 + 1) AS INT)),
              CAST(24 * 4 * (doc_id % 4 + 1) AS INT), '0') AS body
  FROM documents
),
{p}samp AS (
  SELECT doc_id, list_transform(range(72), i -> {gray}) AS s FROM {p}img
),
{p}h AS (
  SELECT doc_id,
         CAST(list_sum(list_transform(range(63), i -> {bit})) AS BIGINT)
           + {sign} AS dhash
  FROM {p}samp
)"""


def _img_block_expr(col: str, b: int, engine: str) -> str:
    """16-bit block ``b`` of a signed-int64 dHash — mask AFTER the
    arithmetic shift, so both engines extract the same bits regardless
    of sign extension."""
    shift = (
        f"shiftright({col}, {16 * b})" if engine == "spark"
        else f"({col} >> {16 * b})"
    )
    return f"({shift} & 65535)"


@register(
    "image_dhash_neardup",
    oracle=_image_dhash_oracle(),
    tags=("pipeline", "multimodal", "dedup"),
)
def image_dhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-duplicate detection by perceptual hash — the
    multimodal extension of the dedup family: render table (one
    genuine 24 bpp BMP per document, pixel bytes = the text), 64-bit
    dHash decoded from the REAL payload bytes through the Arrow
    mapInPandas path (operators/multimodal.py::extract_image_dhash),
    then the 100 TB candidate shape: the hash splits into 4
    16-BIT blocks and any pair within Hamming ≤ 3 must agree on ≥ 1
    block (pigeonhole), so candidates come from 4 equi-joins on block
    values and the Hamming check runs only on candidates. Unrelated
    images collide on a block with p = 1/65536 (the r11 8-bit scheme
    collided at 1/256 — candidate volume ~n²/64, quadratic with a
    constant discount), so background candidates are ~n²/16384 ≈
    negligible and real ones track true near-dup clusters — except
    DEGENERATE blocks (all-padding rows of short documents hash to
    bv=0), which grow with the corpus; ``image_dhash_neardup_capped``
    is the skew-safe variant and ``image_block_skew`` the report.
    Oracle: exhaustive arithmetic reconstruction (see
    ``_image_dhash_oracle``), so the external hash match proves
    decode correctness AND lossless blocking at once."""
    from flink_wsr_project_spark.operators.multimodal import (
        extract_image_dhash,
        synthesize_image_renders,
    )

    d = _fingerprint_once(extract_image_dhash(synthesize_image_renders(spark, sf_dir)), "img_fp")
    d.createOrReplaceTempView("_img_dhash")
    blocks = "\n  UNION\n".join(
        f"  SELECT a.asset_id AS doc_a, b.asset_id AS doc_b,"
        f" a.dhash AS h_a, b.dhash AS h_b"
        f" FROM _img_dhash a JOIN _img_dhash b"
        f" ON {_img_block_expr('a.dhash', b_, 'spark')} = {_img_block_expr('b.dhash', b_, 'spark')}"
        f" AND a.asset_id < b.asset_id"
        for b_ in range(4)
    )
    ham = hamming_expr("h_a", "h_b", "spark")
    return spark.sql(
        f"""
WITH cand AS (
{blocks}
)
SELECT doc_a, doc_b, hamming FROM (
  SELECT doc_a, doc_b, {ham} AS hamming FROM cand
) WHERE hamming <= 3
"""
    )


def _image_keep_list_oracle() -> str:
    """Keep/drop per image from the dHash pairs — smallest claiming
    partner wins, exactly the text ``dedup_keep_list`` discipline, so
    the two keep-lists can be consumed by the same curation step.
    Exhaustive pair enumeration (the Spark side blocks by 16-bit-block
    pigeonhole; the match proves losslessness again)."""
    ham = hamming_expr("a.dhash", "b.dhash", "duckdb")
    return f"""
WITH {_image_dhash_oracle_ctes()},
pairs AS (
  SELECT doc_a, doc_b FROM (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, {ham} AS hamming
    FROM h a JOIN h b ON a.doc_id < b.doc_id
  ) WHERE hamming <= 3
),
claims AS (
  SELECT doc_b AS asset_id, min(doc_a) AS dup_of FROM pairs GROUP BY doc_b
)
SELECT d.doc_id AS asset_id,
       CASE WHEN c.dup_of IS NOT NULL THEN 'drop' ELSE 'keep' END AS action,
       c.dup_of AS dup_of
FROM h d LEFT JOIN claims c ON c.asset_id = d.doc_id
"""


@register(
    "image_dhash_keep_list",
    oracle=_image_keep_list_oracle(),
    tags=("pipeline", "multimodal", "dedup"),
)
def image_dhash_keep_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One keep/drop row per rendered image: an image is dropped iff a
    smaller-id image claims it within Hamming ≤ 3 of its dHash
    (``dup_of`` = the smallest claimer) — the image twin of
    ``dedup_keep_list``, same action contract, so curation steps
    consume either keep-list unchanged. Plan: the Arrow dHash pass,
    the 16-bit-block pigeonhole candidate join, one
    min-aggregate per claimed image, one left join back to all
    images. The oracle enumerates pairs exhaustively from the
    arithmetic hash reconstruction, so the external hash match proves
    decode + blocking + claim semantics in one check."""
    from flink_wsr_project_spark.operators.multimodal import (
        extract_image_dhash,
        synthesize_image_renders,
    )

    d = _fingerprint_once(extract_image_dhash(synthesize_image_renders(spark, sf_dir)), "img_fp")
    d.createOrReplaceTempView("_img_dhash_kl")
    blocks = "\n  UNION\n".join(
        f"  SELECT a.asset_id AS doc_a, b.asset_id AS doc_b,"
        f" a.dhash AS h_a, b.dhash AS h_b"
        f" FROM _img_dhash_kl a JOIN _img_dhash_kl b"
        f" ON {_img_block_expr('a.dhash', b_, 'spark')} = {_img_block_expr('b.dhash', b_, 'spark')}"
        f" AND a.asset_id < b.asset_id"
        for b_ in range(4)
    )
    ham = hamming_expr("h_a", "h_b", "spark")
    return spark.sql(
        f"""
WITH cand AS (
{blocks}
),
pairs AS (
  SELECT doc_a, doc_b FROM (
    SELECT doc_a, doc_b, {ham} AS hamming FROM cand
  ) WHERE hamming <= 3
),
claims AS (
  SELECT doc_b AS asset_id, min(doc_a) AS dup_of FROM pairs GROUP BY doc_b
)
SELECT d.asset_id,
       CASE WHEN c.dup_of IS NOT NULL THEN 'drop' ELSE 'keep' END AS action,
       c.dup_of AS dup_of
FROM _img_dhash_kl d LEFT JOIN claims c ON c.asset_id = d.asset_id
"""
    )


# Per-(blk, bv) candidate cap for the capped image-dedup variant —
# the dHash twin of ``_LSH_BUCKET_CAP``. Degenerate blocks (uniform
# image regions: short documents' all-padding rows hash every one of
# them to bv = 0) grow linearly with the corpus, so their buckets'
# pair enumeration is the one quadratic residual 16-bit keys leave;
# the cap star-collapses those buckets to their min-id representative
# (Hamming-verified — no false dups enter). The shipped default of 8
# is the sf0.01 gate setting: the padding buckets (up to ~126 docs)
# are capped, the small genuine buckets pass — both branches execute
# (dead-branch discipline). Production: O(1000), via the env var.
_IMG_BUCKET_CAP = _parse_bucket_cap(os.environ.get("SPARK_GRAFT_IMG_BUCKET_CAP", "8"), "SPARK_GRAFT_IMG_BUCKET_CAP")


def _img_capped_body(engine: str, h_src: str, cap: int | None = None) -> str:
    """Engine-shared body of the capped near-dup pair query, FROM a
    relation ``{h_src}`` of (doc_id, dhash): long-format block rows →
    per-(blk, bv) window stats (ONE (blk, bv) shuffle for all four
    blocks — the composed text chain's ``marked`` layout) → within-cap
    self-join ∪ over-cap star rows, every candidate Hamming-verified.
    Star rows carry the bucket-min keeper's hash via ``first_value``
    over the same window partitioning, so the verify needs no join
    back. Modality-agnostic (r13): any 64-bit perceptual hash aliased
    to ``dhash`` runs the same skew-safe shape — the image, audio and
    video capped queries all instantiate THIS builder with their own
    ``cap`` dial, so the discipline cannot drift between modalities."""
    cap = _IMG_BUCKET_CAP if cap is None else cap
    block_rows = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, dhash, {b_} AS blk,"
        f" {_img_block_expr('dhash', b_, engine)} AS bv FROM {h_src}"
        for b_ in range(4)
    )
    ham = hamming_expr("h_a", "h_b", engine)
    return f"""blocks AS (
{block_rows}
),
marked AS (
  SELECT doc_id, blk, bv, dhash,
         count(*) OVER (PARTITION BY blk, bv) AS n,
         min(doc_id) OVER (PARTITION BY blk, bv) AS keeper,
         first_value(dhash) OVER (PARTITION BY blk, bv ORDER BY doc_id) AS keeper_hash
  FROM blocks
),
cand AS (
  SELECT a.doc_id AS doc_a, m.doc_id AS doc_b, a.dhash AS h_a, m.dhash AS h_b
  FROM marked a JOIN marked m
    ON a.blk = m.blk AND a.bv = m.bv AND a.doc_id < m.doc_id
  WHERE a.n <= {cap}
  UNION
  SELECT keeper AS doc_a, doc_id AS doc_b, keeper_hash AS h_a, dhash AS h_b
  FROM marked WHERE n > {cap} AND doc_id > keeper
)
SELECT doc_a, doc_b, hamming FROM (
  SELECT doc_a, doc_b, {ham} AS hamming FROM cand
) WHERE hamming <= 3"""


def _image_capped_oracle() -> str:
    return (
        f"\nWITH {_image_dhash_oracle_ctes()},\n"
        + _img_capped_body("duckdb", "h")
        + "\n"
    )


@register(
    "image_dhash_neardup_capped",
    oracle=_image_capped_oracle(),
    tags=("pipeline", "multimodal", "dedup", "skew"),
)
def image_dhash_neardup_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-capped image near-dup pairs — ``image_dhash_neardup``
    with the text path's ``_LSH_BUCKET_CAP`` skew discipline applied
    to the block join: (blk, bv) buckets holding more than
    ``_IMG_BUCKET_CAP`` images (degenerate blocks — uniform regions /
    padding rows — whose size grows with the corpus) contribute
    |B|−1 star rows against their min-id keeper instead of
    |B|(|B|−1)/2 enumerated pairs, and every candidate (star rows
    included) still passes the exact Hamming ≤ 3 verify, so no false
    pair can enter — the cap only bounds, never invents. Within-cap
    buckets are exact. Plan: ONE (blk, bv) window shuffle carries all
    four blocks' stats (the composed text chain's ``marked`` layout);
    worst-case candidate volume is cap²·|buckets| + Σ(|B|−1), linear
    in the corpus instead of quadratic in the degenerate buckets.
    Oracle: identical SQL over the arithmetic hash reconstruction —
    cap semantics included — so the hash match pins the entire
    skew-safe path. ``image_block_skew`` reports what the cap
    rerouted."""
    from flink_wsr_project_spark.operators.multimodal import (
        extract_image_dhash,
        synthesize_image_renders,
    )

    d = _fingerprint_once(extract_image_dhash(synthesize_image_renders(spark, sf_dir)), "img_fp")
    d.select(F.col("asset_id").alias("doc_id"), "dhash").createOrReplaceTempView(
        "_img_dhash_cap"
    )
    return spark.sql(
        "\nWITH " + _img_capped_body("spark", "_img_dhash_cap") + "\n"
    )


def _img_block_skew_sql(engine: str, h_src: str, cap: int | None = None) -> str:
    """Per block index: bucket count, largest bucket, buckets the
    cap star-collapses, and the candidate pairs that saves
    (Σ n(n−1)/2 − (n−1) over capped buckets — star rows still
    run, so the saving is pairs minus stars). The dHash twin of
    ``lsh_bucket_skew``: the dashboard row that says whether the cap
    is skipping duplicate clusters or costing recall. Modality-
    agnostic like ``_img_capped_body`` — each capped pair query ships
    with its skew report instantiated from this builder."""
    cap = _IMG_BUCKET_CAP if cap is None else cap
    div = "div" if engine == "spark" else "//"
    block_rows = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, {b_} AS blk,"
        f" {_img_block_expr('dhash', b_, engine)} AS bv FROM {h_src}"
        for b_ in range(4)
    )
    return f"""blocks AS (
{block_rows}
),
sizes AS (
  SELECT blk, bv, count(*) AS n FROM blocks GROUP BY blk, bv
)
SELECT blk, count(*) AS n_buckets, max(n) AS max_bucket,
       CAST(sum(CASE WHEN n > {cap} THEN 1 ELSE 0 END) AS BIGINT) AS buckets_capped,
       CAST(sum(CASE WHEN n > {cap} THEN (n * (n - 1)) {div} 2 - (n - 1) ELSE 0 END) AS BIGINT) AS pairs_saved
FROM sizes GROUP BY blk"""


def _image_block_skew_oracle() -> str:
    return (
        f"\nWITH {_image_dhash_oracle_ctes()},\n"
        + _img_block_skew_sql("duckdb", "h")
        + "\n"
    )


@register(
    "image_block_skew",
    oracle=_image_block_skew_oracle(),
    tags=("pipeline", "multimodal", "dedup", "skew"),
    doc=_img_block_skew_sql.__doc__,
)
def image_block_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_wsr_project_spark.operators.multimodal import (
        extract_image_dhash,
        synthesize_image_renders,
    )

    d = _fingerprint_once(extract_image_dhash(synthesize_image_renders(spark, sf_dir)), "img_fp")
    d.select(F.col("asset_id").alias("doc_id"), "dhash").createOrReplaceTempView(
        "_img_dhash_skew"
    )
    return spark.sql(
        "\nWITH " + _img_block_skew_sql("spark", "_img_dhash_skew") + "\n"
    )


def _audio_fp_oracle_ctes(p: str = "") -> str:
    """DuckDB WITH-body reconstructing each audio render's 64-bit
    windowed-energy fingerprint arithmetically: the WAV PCM is the
    document's printable-ASCII text truncated/zero-padded to the
    520-byte canvas (operators/multimodal.py::synthesize_audio_renders,
    gated to clips whose signal fills ≥ half the canvas), so window
    energies are ``ascii()`` sums over 8-char substrings and the bit
    rule is pure integer comparison. Bit 63 is the int64 sign bit,
    handled as in the image oracle. ``{p}h`` ends as (doc_id, afp);
    ``p`` prefixes the CTE names for multi-modality composition."""
    from flink_wsr_project_spark.operators.multimodal import (
        AUDIO_FP_MIN_CHARS,
        AUDIO_FP_WINDOWS,
        AUDIO_RENDER_FRAMES,
    )

    w_len = AUDIO_RENDER_FRAMES // AUDIO_FP_WINDOWS
    gray = f"list_sum(list_transform(range({w_len}), j -> ascii(substring(pcm, CAST(w * {w_len} + j + 1 AS INT), 1))))"
    bit = (
        "CASE WHEN s[CAST(i + 2 AS INT)] > s[CAST(i + 1 AS INT)]"
        " THEN (CAST(1 AS BIGINT) << CAST(i AS INT)) ELSE CAST(0 AS BIGINT) END"
    )
    sign = (
        f"CASE WHEN s[{AUDIO_FP_WINDOWS}] > s[{AUDIO_FP_WINDOWS - 1}] "
        "THEN CAST(-9223372036854775807 AS BIGINT) - 1 ELSE CAST(0 AS BIGINT) END"
    )
    return f"""{p}pcm0 AS (
  SELECT doc_id,
         rpad(substring(regexp_replace(text, '[^ -~]', '0', 'g'), 1,
                        {AUDIO_RENDER_FRAMES}),
              {AUDIO_RENDER_FRAMES}, '0') AS pcm
  FROM documents WHERE n_chars >= {AUDIO_FP_MIN_CHARS}
),
{p}samp AS (
  SELECT doc_id, list_transform(range({AUDIO_FP_WINDOWS}), w -> {gray}) AS s
  FROM {p}pcm0
),
{p}h AS (
  SELECT doc_id,
         CAST(list_sum(list_transform(range(63), i -> {bit})) AS BIGINT)
           + {sign} AS afp
  FROM {p}samp
)"""


def _audio_fp_oracle() -> str:
    ham = hamming_expr("a.afp", "b.afp", "duckdb")
    return f"""
WITH {_audio_fp_oracle_ctes()}
SELECT doc_a, doc_b, hamming FROM (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, {ham} AS hamming
  FROM h a JOIN h b ON a.doc_id < b.doc_id
) WHERE hamming <= 3
"""


@register(
    "audio_fp_neardup",
    oracle=_audio_fp_oracle(),
    tags=("pipeline", "multimodal", "dedup"),
)
def audio_fp_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-duplicate detection by acoustic fingerprint — the
    third modality in the dedup family (text MinHash/SimHash, image
    dHash, now audio): render table (one genuine 8-bit mono WAV per
    fingerprintable document, PCM = the text bytes on a fixed 520-
    frame canvas, short clips gated out the way real fingerprinting
    requires a minimum duration), 64-bit windowed-energy difference
    hash decoded from the REAL WAV bytes through the Arrow mapInPandas
    path (stdlib ``wave`` — genuine RIFF parse), then the same 100 TB
    candidate shape as the image path: 4×16-bit block pigeonhole
    (lossless for Hamming ≤ 3), Hamming verify only on candidates.
    Oracle: exhaustive arithmetic reconstruction of the fingerprint
    from (doc_id, text), so the external hash match proves WAV decode
    correctness AND lossless blocking at once."""
    from flink_wsr_project_spark.operators.multimodal import (
        extract_audio_fingerprint,
        synthesize_audio_renders,
    )

    load_table(spark, "documents", sf_dir).createOrReplaceTempView("documents")
    d = _fingerprint_once(extract_audio_fingerprint(synthesize_audio_renders(spark, sf_dir)), "aud_fp")
    d.createOrReplaceTempView("_audio_fp")
    blocks = "\n  UNION\n".join(
        f"  SELECT a.asset_id AS doc_a, b.asset_id AS doc_b,"
        f" a.afp AS h_a, b.afp AS h_b"
        f" FROM _audio_fp a JOIN _audio_fp b"
        f" ON {_img_block_expr('a.afp', b_, 'spark')} = {_img_block_expr('b.afp', b_, 'spark')}"
        f" AND a.asset_id < b.asset_id"
        for b_ in range(4)
    )
    ham = hamming_expr("h_a", "h_b", "spark")
    return spark.sql(
        f"""
WITH cand AS (
{blocks}
)
SELECT doc_a, doc_b, hamming FROM (
  SELECT doc_a, doc_b, {ham} AS hamming FROM cand
) WHERE hamming <= 3
"""
    )


def _video_fp_oracle_ctes(p: str = "") -> str:
    """DuckDB WITH-body reconstructing the Y4M temporal fingerprint
    arithmetically: frame f's 6 payload bytes are chars [6f+1, 6f+6]
    of the 390-char canvas (operators/multimodal.py::
    synthesize_video_renders), so frame energies are ``ascii()`` sums
    and the bit rule is integer comparison. ``{p}h`` ends as
    (doc_id, vfp) over the gated clips; ``p`` prefixes the CTE names
    for multi-modality composition."""
    from flink_wsr_project_spark.operators.multimodal import (
        VIDEO_FP_MIN_CHARS,
        VIDEO_FRAME_BYTES,
        VIDEO_RENDER_FRAMES,
    )

    canvas = VIDEO_RENDER_FRAMES * VIDEO_FRAME_BYTES
    gray = (
        f"list_sum(list_transform(range({VIDEO_FRAME_BYTES}), "
        f"j -> ascii(substring(pcm, CAST(w * {VIDEO_FRAME_BYTES} + j + 1 AS INT), 1))))"
    )
    bit = (
        "CASE WHEN s[CAST(i + 2 AS INT)] > s[CAST(i + 1 AS INT)]"
        " THEN (CAST(1 AS BIGINT) << CAST(i AS INT)) ELSE CAST(0 AS BIGINT) END"
    )
    sign = (
        f"CASE WHEN s[{VIDEO_RENDER_FRAMES}] > s[{VIDEO_RENDER_FRAMES - 1}] "
        "THEN CAST(-9223372036854775807 AS BIGINT) - 1 ELSE CAST(0 AS BIGINT) END"
    )
    return f"""{p}pcm0 AS (
  SELECT doc_id,
         rpad(substring(regexp_replace(text, '[^ -~]', '0', 'g'), 1, {canvas}),
              {canvas}, '0') AS pcm
  FROM documents WHERE n_chars >= {VIDEO_FP_MIN_CHARS}
),
{p}samp AS (
  SELECT doc_id, list_transform(range({VIDEO_RENDER_FRAMES}), w -> {gray}) AS s
  FROM {p}pcm0
),
{p}h AS (
  SELECT doc_id,
         CAST(list_sum(list_transform(range(63), i -> {bit})) AS BIGINT)
           + {sign} AS vfp
  FROM {p}samp
)"""


def _video_fp_oracle() -> str:
    """Exhaustive Hamming ≤ 3 pairs over the arithmetically
    reconstructed fingerprints (see ``_video_fp_oracle_ctes``)."""
    ham = hamming_expr("a.vfp", "b.vfp", "duckdb")
    return f"""
WITH {_video_fp_oracle_ctes()}
SELECT doc_a, doc_b, hamming FROM (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, {ham} AS hamming
  FROM h a JOIN h b ON a.doc_id < b.doc_id
) WHERE hamming <= 3
"""


@register(
    "video_fp_neardup",
    oracle=_video_fp_oracle(),
    tags=("pipeline", "multimodal", "dedup"),
)
def video_fp_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video near-duplicate detection by temporal-activity fingerprint
    — completing the modality triple (text, image, audio, video all
    dedup through the same 64-bit-hash / 16-bit-block discipline):
    render table (one genuine 65-frame 2x2 Y4M stream per
    fingerprintable document, frame payloads = consecutive text
    chunks), per-frame energies decoded from the REAL stream bytes
    through the Arrow mapInPandas path (header parse + FRAME-marker
    validation), difference-hashed over consecutive frames, then the
    16-bit-block pigeonhole candidate join with the Hamming ≤ 3
    verify on candidates. The min-duration gate and fixed canvas are
    the audio path's measured lessons. Oracle: exhaustive arithmetic
    reconstruction, so the external hash match proves the Y4M decode
    AND lossless blocking at once."""
    from flink_wsr_project_spark.operators.multimodal import (
        extract_video_fingerprint,
        synthesize_video_renders,
    )

    load_table(spark, "documents", sf_dir).createOrReplaceTempView("documents")
    d = _fingerprint_once(extract_video_fingerprint(synthesize_video_renders(spark, sf_dir)), "vid_fp")
    d.createOrReplaceTempView("_video_fp")
    blocks = "\n  UNION\n".join(
        f"  SELECT a.asset_id AS doc_a, b.asset_id AS doc_b,"
        f" a.vfp AS h_a, b.vfp AS h_b"
        f" FROM _video_fp a JOIN _video_fp b"
        f" ON {_img_block_expr('a.vfp', b_, 'spark')} = {_img_block_expr('b.vfp', b_, 'spark')}"
        f" AND a.asset_id < b.asset_id"
        for b_ in range(4)
    )
    ham = hamming_expr("h_a", "h_b", "spark")
    return spark.sql(
        f"""
WITH cand AS (
{blocks}
)
SELECT doc_a, doc_b, hamming FROM (
  SELECT doc_a, doc_b, {ham} AS hamming FROM cand
) WHERE hamming <= 3
"""
    )


# Per-(blk, bv) caps for the audio/video capped pair queries — each
# modality gets its own dial (the degenerate-bucket mass is an input
# property: silence tails for audio, static scenes for video, padding
# rows for images — different distributions, one discipline). Measured
# at sf0.01 (scripts/av_candidate_probe.py): the audio block-3 bv=0
# bucket holds 142 of 284 gated clips (docs shorter than the 520-byte
# canvas have constant-zero energy deltas over their padding tail, so
# the TOP 16 hash bits collapse), contributing ~10k of the 10,277
# uncapped candidate pairs; video's twin bucket holds 102 of 358. The
# default 8 is the sf0.01 gate setting — 3 buckets cap, the small
# genuine buckets pass, both branches execute (dead-branch
# discipline). Production: O(1000), via the env vars.
_AUDIO_BUCKET_CAP = _parse_bucket_cap(os.environ.get("SPARK_GRAFT_AUDIO_BUCKET_CAP", "8"), "SPARK_GRAFT_AUDIO_BUCKET_CAP")
_VIDEO_BUCKET_CAP = _parse_bucket_cap(os.environ.get("SPARK_GRAFT_VIDEO_BUCKET_CAP", "8"), "SPARK_GRAFT_VIDEO_BUCKET_CAP")


def _audio_capped_oracle() -> str:
    return (
        f"\nWITH {_audio_fp_oracle_ctes()},\n"
        "ah AS (SELECT doc_id, afp AS dhash FROM h),\n"
        + _img_capped_body("duckdb", "ah", cap=_AUDIO_BUCKET_CAP)
        + "\n"
    )


@register(
    "audio_fp_neardup_capped",
    oracle=_audio_capped_oracle(),
    tags=("pipeline", "multimodal", "dedup", "skew"),
)
def audio_fp_neardup_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-capped audio near-dup pairs — ``audio_fp_neardup`` with
    the image path's proven skew discipline (r12's ``_IMG_BUCKET_CAP``
    rewrite, now modality-shared): (blk, bv) buckets holding more than
    ``_AUDIO_BUCKET_CAP`` clips contribute |B|−1 star rows against
    their min-id keeper instead of |B|(|B|−1)/2 enumerated pairs, every
    candidate still Hamming-verified, so the cap only bounds, never
    invents. The degenerate mass here is SILENCE-shaped: clips shorter
    than the 520-frame canvas have constant-zero energy deltas over the
    padding tail, so the top 16 fingerprint bits collapse and the
    block-3 bv=0 bucket grows with the corpus (measured at sf0.01: 142
    of 284 gated clips — one bucket carrying ~10k of the 10,277
    uncapped candidates; the min-duration gate bounds the DOMINANT mass
    but is an input-distribution argument, the cap is the structural
    valve). Plan: the Arrow WAV-decode pass, then ONE (blk, bv) window
    shuffle for all four blocks — `_img_capped_body` instantiated on
    the audio fingerprint. Oracle: identical SQL over the arithmetic
    reconstruction, cap semantics included. ``audio_block_skew``
    reports what the cap rerouted."""
    from flink_wsr_project_spark.operators.multimodal import (
        extract_audio_fingerprint,
        synthesize_audio_renders,
    )

    d = _fingerprint_once(extract_audio_fingerprint(synthesize_audio_renders(spark, sf_dir)), "aud_fp")
    d.select(
        F.col("asset_id").alias("doc_id"), F.col("afp").alias("dhash")
    ).createOrReplaceTempView("_audio_fp_cap")
    return spark.sql(
        "\nWITH "
        + _img_capped_body("spark", "_audio_fp_cap", cap=_AUDIO_BUCKET_CAP)
        + "\n"
    )


def _audio_block_skew_oracle() -> str:
    return (
        f"\nWITH {_audio_fp_oracle_ctes()},\n"
        "ah AS (SELECT doc_id, afp AS dhash FROM h),\n"
        + _img_block_skew_sql("duckdb", "ah", cap=_AUDIO_BUCKET_CAP)
        + "\n"
    )


@register(
    "audio_block_skew",
    oracle=_audio_block_skew_oracle(),
    tags=("pipeline", "multimodal", "dedup", "skew"),
)
def audio_block_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The audio twin of ``image_block_skew`` — per fingerprint block
    index: bucket count, largest bucket, buckets ``_AUDIO_BUCKET_CAP``
    star-collapses and the candidate pairs that saves. The dashboard
    row that keeps ``audio_fp_neardup_capped`` honest (no silent
    caps): block 3 is where the silence/padding degeneracy lives, and
    this is the report that shows it."""
    from flink_wsr_project_spark.operators.multimodal import (
        extract_audio_fingerprint,
        synthesize_audio_renders,
    )

    d = _fingerprint_once(extract_audio_fingerprint(synthesize_audio_renders(spark, sf_dir)), "aud_fp")
    d.select(
        F.col("asset_id").alias("doc_id"), F.col("afp").alias("dhash")
    ).createOrReplaceTempView("_audio_fp_skew")
    return spark.sql(
        "\nWITH "
        + _img_block_skew_sql("spark", "_audio_fp_skew", cap=_AUDIO_BUCKET_CAP)
        + "\n"
    )


def _video_capped_oracle() -> str:
    return (
        f"\nWITH {_video_fp_oracle_ctes()},\n"
        "vh AS (SELECT doc_id, vfp AS dhash FROM h),\n"
        + _img_capped_body("duckdb", "vh", cap=_VIDEO_BUCKET_CAP)
        + "\n"
    )


@register(
    "video_fp_neardup_capped",
    oracle=_video_capped_oracle(),
    tags=("pipeline", "multimodal", "dedup", "skew"),
)
def video_fp_neardup_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-capped video near-dup pairs — the last modality to get
    the structural skew valve (r12 shipped ``video_fp_neardup``
    uncapped; VERDICT r12 #1). STATIC-SCENE degeneracy: clips whose
    tail frames are canvas padding have constant frame energy, so the
    top fingerprint bits collapse and the block-3 bv=0 bucket grows
    with the corpus (measured at sf0.01: 102 of 358 gated clips —
    ~5.1k of the 5,448 uncapped candidates from one bucket). Same
    engine-shared ``_img_capped_body``: over-cap (blk, bv) buckets
    star-collapse to their min-id keeper, Hamming verify kept, ONE
    (blk, bv) window shuffle for all four blocks. Oracle: identical
    SQL over the arithmetic Y4M reconstruction, cap semantics
    included. ``video_block_skew`` reports what the cap rerouted."""
    from flink_wsr_project_spark.operators.multimodal import (
        extract_video_fingerprint,
        synthesize_video_renders,
    )

    d = _fingerprint_once(extract_video_fingerprint(synthesize_video_renders(spark, sf_dir)), "vid_fp")
    d.select(
        F.col("asset_id").alias("doc_id"), F.col("vfp").alias("dhash")
    ).createOrReplaceTempView("_video_fp_cap")
    return spark.sql(
        "\nWITH "
        + _img_capped_body("spark", "_video_fp_cap", cap=_VIDEO_BUCKET_CAP)
        + "\n"
    )


def _video_block_skew_oracle() -> str:
    return (
        f"\nWITH {_video_fp_oracle_ctes()},\n"
        "vh AS (SELECT doc_id, vfp AS dhash FROM h),\n"
        + _img_block_skew_sql("duckdb", "vh", cap=_VIDEO_BUCKET_CAP)
        + "\n"
    )


@register(
    "video_block_skew",
    oracle=_video_block_skew_oracle(),
    tags=("pipeline", "multimodal", "dedup", "skew"),
)
def video_block_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The video twin of ``image_block_skew`` — the no-silent-caps
    report for ``video_fp_neardup_capped``: per block index, buckets,
    max bucket, capped-bucket count and pairs saved under
    ``_VIDEO_BUCKET_CAP``."""
    from flink_wsr_project_spark.operators.multimodal import (
        extract_video_fingerprint,
        synthesize_video_renders,
    )

    d = _fingerprint_once(extract_video_fingerprint(synthesize_video_renders(spark, sf_dir)), "vid_fp")
    d.select(
        F.col("asset_id").alias("doc_id"), F.col("vfp").alias("dhash")
    ).createOrReplaceTempView("_video_fp_skew")
    return spark.sql(
        "\nWITH "
        + _img_block_skew_sql("spark", "_video_fp_skew", cap=_VIDEO_BUCKET_CAP)
        + "\n"
    )


# Document-frequency cap for the repeated-span gram match
# (operators/spans.py) — the span family's degenerate-bucket valve.
# Boilerplate grams (license headers, templated sentences) appear in
# thousands of documents at corpus scale and make the gram self-join
# quadratic in that document frequency; over-cap grams star-collapse
# onto their min-id document, which is exactly the evidence the
# keep-list consumes (min-keeper convention), so the decision layer
# survives the cap by construction. The shipped default of 2 is the
# sf0.01 gate setting: the corpus' worst df is 3, so 71 grams cap and
# 945 df=2 grams enumerate — both branches execute (dead-branch
# discipline). Production: O(1000), via the env var.
_SPAN_GRAM_CAP = _parse_bucket_cap(os.environ.get("SPARK_GRAFT_SPAN_GRAM_CAP", "2"), "SPARK_GRAFT_SPAN_GRAM_CAP")


def _span_pairs_impl(spark: SparkSession, sf_dir: str, cap: int | None) -> DataFrame:
    from flink_wsr_project_spark.operators.spans import span_pairs_sql

    load_table(spark, "documents", sf_dir).createOrReplaceTempView("documents")
    return spark.sql(span_pairs_sql("spark", cap))


def _span_pairs_oracle(cap: int | None) -> str:
    from flink_wsr_project_spark.operators.spans import span_pairs_sql

    return span_pairs_sql("duckdb", cap)


@register(
    "shared_span_pairs",
    oracle=_span_pairs_oracle(None),
    tags=("pipeline", "text", "dedup"),
)
def shared_span_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every MAXIMAL verbatim token span (>= 16 tokens) shared between
    two documents, with exact 0-based token offsets in both — the
    distributed analogue of suffix-array training-data dedup (Lee et
    al. 2022 remove repeated >= 50-token substrings found via a suffix
    array; a suffix array is a single-machine index, so at 100 TB the
    same evidence comes from three relational steps, each one shuffle:
    positional 8-token grams hashed to a 60-bit join key + independent
    32-bit verify key, a gram-hash self-equi-join, and a
    gaps-and-islands window over each (doc_a, doc_b, diagonal) that
    merges consecutive matching positions into maximal spans). Unlike
    every document-level dedup in this repo, the output names WHERE
    the duplication lives (a_start/b_start), so a downstream pass can
    cut the span out of the kept document — the memorization-removal
    primitive. This uncapped variant enumerates all df >= 2 grams
    exactly; ``shared_span_pairs_capped`` is the production path and
    ``span_gram_skew`` prices the difference. Oracle: the identical
    SQL body in DuckDB (md5 token codes bit-identical; the polynomial
    chains plain BIGINT arithmetic), so the external match pins
    tokenization, hashing, and the island arithmetic at once."""
    return _span_pairs_impl(spark, sf_dir, None)


@register(
    "shared_span_pairs_capped",
    oracle=_span_pairs_oracle(_SPAN_GRAM_CAP),
    tags=("pipeline", "text", "dedup", "skew"),
)
def shared_span_pairs_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``shared_span_pairs`` with the document-frequency valve — the
    span family's instance of the capped-bucket discipline every dedup
    modality here carries: grams appearing in more than
    ``_SPAN_GRAM_CAP`` documents (boilerplate — the mass that grows
    with the corpus and makes the gram join quadratic) contribute one
    star row per occurrence against the gram's min-id document instead
    of |B|(|B|-1)/2 enumerated pairs. Claims BY the minimum document
    are preserved exactly (that is what the keep-list consumes — the
    min-keeper convention), so capping bounds pair evidence among
    non-minimum documents, never the decision input. Spans assembled
    from star rows are still genuine shared runs (every candidate row
    pairs two real gram sites and carries the same 93-bit two-hash
    verify as the enumerated arm). Oracle: identical SQL with
    identical cap semantics, so the hash match pins the valve
    itself."""
    return _span_pairs_impl(spark, sf_dir, _SPAN_GRAM_CAP)


def _span_skew_oracle() -> str:
    from flink_wsr_project_spark.operators.spans import span_gram_skew_sql

    return span_gram_skew_sql("duckdb", _SPAN_GRAM_CAP)


@register(
    "span_gram_skew",
    oracle=_span_skew_oracle(),
    tags=("pipeline", "text", "dedup", "skew"),
)
def span_gram_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The span family's no-silent-cap dashboard row: total positional
    grams, matchable (df >= 2) grams, the worst document frequency,
    grams ``_SPAN_GRAM_CAP`` star-collapses, and the exact candidate
    rows that saves (integer arithmetic — (total² - Σocc²)/2 is
    exactly even — minus the star rows that still run). The report
    that says whether the valve is pruning boilerplate or eating
    genuine span evidence, same role as ``lsh_bucket_skew`` /
    ``image_block_skew`` in their families."""
    from flink_wsr_project_spark.operators.spans import span_gram_skew_sql

    load_table(spark, "documents", sf_dir).createOrReplaceTempView("documents")
    return spark.sql(span_gram_skew_sql("spark", _SPAN_GRAM_CAP))


def _span_keep_list_oracle() -> str:
    from flink_wsr_project_spark.operators.spans import span_keep_list_sql

    return span_keep_list_sql("duckdb", _SPAN_GRAM_CAP)


@register(
    "span_dedup_keep_list",
    oracle=_span_keep_list_oracle(),
    tags=("pipeline", "text", "dedup"),
)
def span_dedup_keep_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision layer over the capped span evidence: one row per
    document with its token count, the tokens covered by the UNION of
    spans shared with LOWER-id documents (classic interval merge per
    document), coverage in permille, and drop/keep at 500 permille —
    the span twin of ``containment_keep_list`` (that one judges chunk
    containment at 700 permille per chunk; this one judges exact
    verbatim coverage at token granularity). Min-keeper convention:
    only the higher id of a pair accrues coverage, so the globally
    minimal document provably never drops and mutual clones never both
    drop. Documents shorter than the 8-token gram width have no
    measurable spans and keep — "not measurable" never means "drop"
    (the A/V duration-gate stance). At the sf0.01 gate the corpus'
    evidence is bimodal (clones cover >= 958 permille, everything else
    0), so the 500 permille bar separates exactly the clone set: 23
    drops / 480 keeps."""
    from flink_wsr_project_spark.operators.spans import span_keep_list_sql

    load_table(spark, "documents", sf_dir).createOrReplaceTempView("documents")
    return spark.sql(span_keep_list_sql("spark", _SPAN_GRAM_CAP))


def _span_gapped_oracle() -> str:
    from flink_wsr_project_spark.operators.spans import span_pairs_gapped_sql

    return span_pairs_gapped_sql("duckdb", _SPAN_GRAM_CAP)


@register(
    "shared_span_pairs_gapped",
    oracle=_span_gapped_oracle(),
    tags=("pipeline", "text", "dedup"),
)
def shared_span_pairs_gapped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-verbatim spans: ``shared_span_pairs_capped`` with interior
    gaps of up to the gram width bridged along each diagonal — a
    point SUBSTITUTION kills the 8 grams covering it, so the exact
    variant reports the run as two spans while this one reports the
    full near-verbatim extent with a ``matched_grams`` density column
    (insertions/deletions shift the diagonal and are deliberately NOT
    bridged — a different diagonal is a different alignment). This is
    the variant memorization-removal actually wants at corpus scale:
    lightly-edited boilerplate and paraphrase-by-one-word survive
    exact dedup but not this. Honest gate note: the GENERATED corpus'
    near-dups are truncations, not substitutions, so at sf0.01 this
    returns exactly the capped variant's spans (measured — 23/23, no
    gap bridged); the bridging branch is exercised by the synthetic
    substitution test, which pins one mid-run edit merging the exact
    variant's two fragments into one 40-token near-verbatim span.
    Oracle: identical SQL in DuckDB — the lag-gap island break is
    pinned bit-for-bit."""
    from flink_wsr_project_spark.operators.spans import span_pairs_gapped_sql

    load_table(spark, "documents", sf_dir).createOrReplaceTempView("documents")
    return spark.sql(span_pairs_gapped_sql("spark", _SPAN_GRAM_CAP))


def _span_decon_oracle() -> str:
    from flink_wsr_project_spark.operators.spans import span_decontaminate_sql

    return span_decontaminate_sql("duckdb", _SPAN_GRAM_CAP)


@register(
    "benchmark_span_decontaminate",
    oracle=_span_decon_oracle(),
    tags=("pipeline", "text", "dedup", "decontamination"),
)
def benchmark_span_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level benchmark decontamination — every maximal verbatim
    span a TRAIN document shares with a TEST document, with exact
    positions on both sides (``benchmark_decontaminate`` flags WHICH
    train docs leak via 13-gram overlap; this says WHERE, so the
    remedy can be a targeted span scrub instead of dropping the
    document — the way production pipelines actually handle partial
    contamination). Same content-independent doc_id-hash split as
    ``dataset_splits``; grams in more than ``_SPAN_GRAM_CAP`` docs
    are EXCLUDED as evidence (boilerplate is not contamination — the
    containment DF-cap stance; there is no keeper to star onto across
    a split boundary). At sf0.01: 4 leaked spans, 36-80 tokens.
    Oracle: identical SQL."""
    from flink_wsr_project_spark.operators.spans import span_decontaminate_sql

    load_table(spark, "documents", sf_dir).createOrReplaceTempView("documents")
    return spark.sql(span_decontaminate_sql("spark", _SPAN_GRAM_CAP))


def _span_leakage_sql(engine: str) -> str:
    from flink_wsr_project_spark.operators.spans import (
        SPAN_MIN_TOKENS,
        _span_cand_ctes,
        _span_merge_ctes,
        span_posgram_ctes,
    )

    return f"""
WITH {span_posgram_ctes(engine)},
{_span_cand_ctes(engine, _SPAN_GRAM_CAP)},
{_span_merge_ctes()},
f AS (SELECT * FROM sp_spans WHERE span_tokens >= {SPAN_MIN_TOKENS}),
src AS (SELECT doc_id, source FROM documents)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(a.source <> b.source AS BOOLEAN) AS cross_source,
       CAST(count(*) AS BIGINT) AS n_spans,
       CAST(sum(span_tokens) AS BIGINT) AS leaked_tokens
FROM f JOIN src a ON a.doc_id = f.doc_a JOIN src b ON b.doc_id = f.doc_b
GROUP BY a.source, b.source
"""


@register(
    "cross_source_span_leakage",
    oracle=_span_leakage_sql("duckdb"),
    tags=("pipeline", "text", "dedup", "provenance"),
)
def cross_source_span_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Provenance rollup over the capped span evidence: per
    (source_a, source_b) pair, how many verbatim spans and how many
    tokens one source shares with another — the WHO-copies-FROM-whom
    dashboard (mirror-site detection, license-text tracing, and the
    span-granular counterpart of ``cross_source_contamination``'s
    near-dup view; ``cross_source`` separates intra-source
    duplication, which is dedup's business, from cross-source
    leakage, which is a provenance finding). At sf0.01: 23 span rows
    roll up to 22 cross-source pairs + 1 within-source (both flag
    branches execute). Plan: the capped pair chain + two broadcast
    joins to the (doc, source) roster + one (source_a, source_b)
    aggregate. Oracle: identical SQL."""
    load_table(spark, "documents", sf_dir).createOrReplaceTempView("documents")
    return spark.sql(_span_leakage_sql("spark"))


def _span_scrub_oracle() -> str:
    from flink_wsr_project_spark.operators.spans import span_scrub_sql

    return span_scrub_sql("duckdb", _SPAN_GRAM_CAP)


@register(
    "span_scrub",
    oracle=_span_scrub_oracle(),
    tags=("pipeline", "text", "dedup"),
)
def span_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The removal operator the span evidence exists for — Lee et
    al.'s actual operation, which document-level dedup cannot express:
    every token covered by a span shared with a LOWER-id document is
    cut out of the document (the keeper's copy survives untouched, so
    each repeated passage remains in the corpus exactly once). One row
    per document: original token count, tokens removed, and the
    scrubbed text rebuilt from the kept tokens in position order.
    Plan: capped span evidence → per-document interval union (merged
    DISJOINT ranges, so the positional token join matches each token
    at most once and cannot duplicate it) → one doc-equi join of the
    token explode against the bounded interval set → order-preserving
    reassembly (array_sort over (pos, tok) structs — no reliance on
    aggregation order). Oracle: identical SQL; the scrubbed TEXT
    itself is value-hashed, so the external match pins the whole
    cut-and-reassemble, not just the counts."""
    from flink_wsr_project_spark.operators.spans import span_scrub_sql

    load_table(spark, "documents", sf_dir).createOrReplaceTempView("documents")
    return spark.sql(span_scrub_sql("spark", _SPAN_GRAM_CAP))


_TAKEDOWN_PERMILLE = 100  # deterministic 10% victim set


def _takedown_blast_sql(
    engine: str, f_rel: str | None = None, edges_rel: str | None = None
) -> str:
    """Pre-takedown impact analysis — the batch companion of the
    composed ``curate_takedown`` verb (streaming/curation.py): for a
    deterministic victim set (content-independent doc_id hash, the
    ``dataset_splits`` discipline, ~10%), what each store family
    RELEASES or LOSES when the set is removed. One row of exact
    integers:

    * ``released_neardup_claims`` — verified near-dup claim edges
      (the capped LSH chain's ``edges``, lower id claims higher) whose
      CLAIMER is a victim and whose target survives: those drop
      verdicts are released and the next dedup pass re-elects keepers
      (the gate corpus has no md5-exact duplicates, so the near-dup
      edge set is the live claim structure);
    * ``released_span_claims`` / ``released_span_tokens`` — capped
      maximal spans claimed BY a victim (doc_a, the lower id) over a
      survivor: coverage evidence the span keep-list loses;
    * ``search_docs_removed`` / ``search_tokens_removed`` — the BM25
      corpus-stats debit the takedown's search member applies.

    Plan: the capped span chain (shared, one gh exchange at runtime) +
    the capped LSH edge chain + broadcast-sized victim joins; the
    victim flag is pure row-local hash arithmetic. Oracle: identical
    SQL.

    ``f_rel``/``edges_rel`` (Spark side, r17): pre-materialized span
    evidence / near-dup edge relations — the two chains are
    independent, so the query builder materializes them concurrently
    (guide §2.6). The oracle composes with both None — string
    unchanged."""
    from flink_wsr_project_spark.operators.spans import (
        SPAN_MIN_TOKENS,
        _span_cand_ctes,
        _span_merge_ctes,
        span_posgram_ctes,
    )

    str_t = "STRING" if engine == "spark" else "VARCHAR"
    h = h28(f"concat('takedown:', CAST(doc_id AS {str_t}))", engine)
    toks = toks_expr("text", engine)
    ln = "size" if engine == "spark" else "len"
    if f_rel is not None and edges_rel is not None:
        chains = f"f AS (SELECT * FROM {f_rel}),"
        edges_ctes = f"edges AS (SELECT * FROM {edges_rel}),"
    else:
        chains = f"""{span_posgram_ctes(engine)},
{_span_cand_ctes(engine, _SPAN_GRAM_CAP)},
{_span_merge_ctes()},
f AS (SELECT * FROM sp_spans WHERE span_tokens >= {SPAN_MIN_TOKENS}),"""
        edges_ctes = f"{_neardup_edges_ctes(engine)},"
    return f"""
WITH {chains}
vict AS (
  SELECT doc_id, {h} % 1000 < {_TAKEDOWN_PERMILLE} AS victim,
         CAST({ln}({toks}) AS BIGINT) AS n_tokens
  FROM documents
),
{edges_ctes}
rel_near AS (
  SELECT CAST(count(*) AS BIGINT) AS c
  FROM edges e
  JOIN vict va ON va.doc_id = e.doc_a AND va.victim
  JOIN vict vb ON vb.doc_id = e.doc_b AND NOT vb.victim
),
rel_span AS (
  SELECT CAST(count(*) AS BIGINT) AS c,
         CAST(coalesce(sum(span_tokens), 0) AS BIGINT) AS t
  FROM f
  JOIN vict va ON va.doc_id = f.doc_a AND va.victim
  JOIN vict vb ON vb.doc_id = f.doc_b AND NOT vb.victim
),
srch AS (
  SELECT CAST(count(*) AS BIGINT) AS c,
         CAST(coalesce(sum(n_tokens), 0) AS BIGINT) AS t
  FROM vict WHERE victim
)
SELECT (SELECT c FROM srch) AS n_victims,
       (SELECT c FROM rel_near) AS released_neardup_claims,
       (SELECT c FROM rel_span) AS released_span_claims,
       (SELECT t FROM rel_span) AS released_span_tokens,
       (SELECT c FROM srch) AS search_docs_removed,
       (SELECT t FROM srch) AS search_tokens_removed
"""


@register(
    "takedown_blast_radius",
    oracle=_takedown_blast_sql("duckdb"),
    doc=_takedown_blast_sql.__doc__,
    tags=("pipeline", "text", "dedup", "ops"),
)
def takedown_blast_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_wsr_project_spark.operators.spans import (
        SPAN_MIN_TOKENS,
        _span_cand_ctes,
        _span_merge_ctes,
        span_posgram_ctes,
    )

    load_table(spark, "documents", sf_dir).createOrReplaceTempView("documents")
    # r17 (guide §2.6): the span evidence chain and the LSH edge chain
    # are independent member pipelines — materialize both concurrently
    # instead of leaving them as serial subtrees of one composite plan.
    f_sql = f"""WITH {span_posgram_ctes("spark")},
{_span_cand_ctes("spark", _SPAN_GRAM_CAP)},
{_span_merge_ctes()}
SELECT * FROM sp_spans WHERE span_tokens >= {SPAN_MIN_TOKENS}"""
    edges_sql = (
        f"WITH {_neardup_edges_ctes('spark')} SELECT doc_a, doc_b FROM edges"
    )
    _run_view_builders(
        spark,
        {
            "_td_f": lambda: _materialize_once(spark.sql(f_sql), "_td_f"),
            "_td_edges": lambda: _materialize_once(
                spark.sql(edges_sql), "_td_edges"
            ),
        },
    )
    return spark.sql(_takedown_blast_sql("spark", "_td_f", "_td_edges"))


def _modal_consensus_sql(
    engine: str, img_src: str, aud_src: str, vid_src: str, tkl_src: str | None = None
) -> str:
    """Four-modality dedup CONSENSUS, one row per document: the text
    keep-list verdict (MinHash-LSH + Jaccard, cap-aware), the image
    dHash claim, the audio fingerprint claim, and the video fingerprint
    claim side by side — audio/video NULL where the document is below
    that modality's duration gate ("not measurable" and "not a dup"
    are different facts). ``n_flag`` counts the modalities that flag
    the doc (NULLs count zero), and ``consensus`` is the curation
    policy row a multimodal rollout actually wants: 'drop' on ≥ 2
    agreeing modalities, 'review' on exactly 1 (a single perceptual
    channel alone is the false-positive surface), 'keep' otherwise.
    Every perceptual claim set comes from the CAPPED candidate shape
    (``_img_capped_body`` with that modality's cap dial, embedded as a
    nested-WITH subquery so the CTE names scope per modality) — the
    consensus query must not reintroduce the uncapped degenerate-bucket
    self-join its member queries eliminated. Identical SQL in both
    engines over (doc_id, h) hash relations, cap semantics inside the
    oracle."""
    from flink_wsr_project_spark.operators.multimodal import (
        AUDIO_FP_MIN_CHARS,
        VIDEO_FP_MIN_CHARS,
    )

    # tkl_src (Spark path, r16): read the text keep-list from a
    # pre-materialized (doc_id, action) relation instead of inlining
    # the 9-exchange MinHash-LSH chain — the caller checkpoints it
    # concurrently with the three modality decodes. Default (oracle)
    # composes the member SQL inline, byte-identical to before.
    if tkl_src is None:
        tkl_body = f"SELECT doc_id, CAST(action = 'drop' AS INT) AS tdrop FROM ({_dedup_keep_list_sql(engine)})"
    else:
        tkl_body = f"SELECT doc_id, CAST(action = 'drop' AS INT) AS tdrop FROM {tkl_src}"

    def claimed(src: str, cap: int) -> str:
        # the capped body selects (doc_a, doc_b, hamming) FROM a
        # (doc_id, dhash) relation; a leading CTE of the NESTED with
        # (scoped — no cross-modality collisions) normalizes the hash
        # column name
        return f"""SELECT DISTINCT doc_b AS doc_id FROM (
    WITH hsrc AS (SELECT doc_id, h AS dhash FROM {src}),
    {_img_capped_body(engine, "hsrc", cap=cap)}
  )"""

    # flags are INTs (1/0/NULL), not booleans: a nullable boolean
    # canonicalizes differently across the engines' pandas bridges
    # (Spark None vs DuckDB NaN — same value, different string, so the
    # harness's row sort misaligns); nullable INTs land as float64/NaN
    # on BOTH sides, the repo's standard nullable-column discipline
    nf = "tdrop + idrop + coalesce(adrop, 0) + coalesce(vdrop, 0)"
    return f"""tkl AS (
  {tkl_body}
),
iclaim AS (
  {claimed(img_src, _IMG_BUCKET_CAP)}
),
aclaim AS (
  {claimed(aud_src, _AUDIO_BUCKET_CAP)}
),
vclaim AS (
  {claimed(vid_src, _VIDEO_BUCKET_CAP)}
),
flags AS (
  SELECT d.doc_id,
         t.tdrop,
         CAST(ic.doc_id IS NOT NULL AS INT) AS idrop,
         CASE WHEN d.n_chars >= {AUDIO_FP_MIN_CHARS}
              THEN CAST(ac.doc_id IS NOT NULL AS INT) END AS adrop,
         CASE WHEN d.n_chars >= {VIDEO_FP_MIN_CHARS}
              THEN CAST(vc.doc_id IS NOT NULL AS INT) END AS vdrop
  FROM documents d
  JOIN tkl t ON t.doc_id = d.doc_id
  LEFT JOIN iclaim ic ON ic.doc_id = d.doc_id
  LEFT JOIN aclaim ac ON ac.doc_id = d.doc_id
  LEFT JOIN vclaim vc ON vc.doc_id = d.doc_id
)
SELECT doc_id, tdrop, idrop, adrop, vdrop,
       CAST({nf} AS INT) AS n_flag,
       CASE WHEN {nf} >= 2 THEN 'drop'
            WHEN {nf} = 1 THEN 'review'
            ELSE 'keep' END AS consensus
FROM flags"""


def _modal_consensus_oracle() -> str:
    return (
        "\nWITH "
        + _image_dhash_oracle_ctes(p="ci_")
        + ",\n"
        + _audio_fp_oracle_ctes(p="ca_")
        + ",\n"
        + _video_fp_oracle_ctes(p="cv_")
        + ",\n"
        + "cih AS (SELECT doc_id, dhash AS h FROM ci_h),\n"
        + "cah AS (SELECT doc_id, afp AS h FROM ca_h),\n"
        + "cvh AS (SELECT doc_id, vfp AS h FROM cv_h),\n"
        + _modal_consensus_sql("duckdb", "cih", "cah", "cvh")
        + "\n"
    )


@register(
    "modal_dedup_consensus",
    oracle=_modal_consensus_oracle(),
    doc=_modal_consensus_sql.__doc__,
    tags=("pipeline", "multimodal", "dedup", "similarity"),
)
def modal_dedup_consensus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_wsr_project_spark.operators.multimodal import (
        extract_audio_fingerprint,
        extract_image_dhash,
        extract_video_fingerprint,
        synthesize_audio_renders,
        synthesize_image_renders,
        synthesize_video_renders,
    )

    load_table(spark, "documents", sf_dir).createOrReplaceTempView("documents")
    # The three modality decodes are independent single-pass jobs;
    # materialize them CONCURRENTLY (guide §2.6 "overlap independent
    # jobs") so the per-modality checkpoint latencies overlap instead
    # of serializing — each decode is mostly a one-task stage at gate
    # SFs, so the overlap is near-total.
    builders = {
        "_mc_img": lambda: _fingerprint_once(
            extract_image_dhash(synthesize_image_renders(spark, sf_dir)), "_mc_img"
        ).select(F.col("asset_id").alias("doc_id"), F.col("dhash").alias("h")),
        "_mc_aud": lambda: _fingerprint_once(
            extract_audio_fingerprint(synthesize_audio_renders(spark, sf_dir)), "_mc_aud"
        ).select(F.col("asset_id").alias("doc_id"), F.col("afp").alias("h")),
        "_mc_vid": lambda: _fingerprint_once(
            extract_video_fingerprint(synthesize_video_renders(spark, sf_dir)), "_mc_vid"
        ).select(F.col("asset_id").alias("doc_id"), F.col("vfp").alias("h")),
        # the text keep-list member is the tail's long pole (the full
        # MinHash-LSH chain); materialize it in the same overlapped
        # pass so the final query joins four small relations
        "_mc_tkl": lambda: _materialize_once(
            spark.sql(_dedup_keep_list_sql("spark")), "_mc_tkl"
        ),
    }
    _run_view_builders(spark, builders)
    return spark.sql(
        "\nWITH "
        + _modal_consensus_sql("spark", "_mc_img", "_mc_aud", "_mc_vid", "_mc_tkl")
        + "\n"
    )


def _modal_agreement_sql(engine: str, h_src: str, tkl_rel: str | None = None) -> str:
    """Cross-MODAL dedup agreement: the text keep-list (MinHash-LSH +
    Jaccard-verified, cap-aware — ``dedup_keep_list`` verbatim as a
    subquery) against the image keep-list derived from each document's
    RENDER (64-bit dHash, 16-bit-block candidates, Hamming ≤ 3 —
    ``image_dhash_keep_list``'s claim rule). One row: how many
    documents each modality drops, how many both drop, and how often
    the two methods agree — the method-comparison a multimodal
    curation rollout needs before trusting perceptual dedup to stand
    in for text dedup (the render samples only a pixel grid of the
    text, so image dedup is the coarser signal by construction).
    Identical SQL in both engines over ``{h_src}`` = (doc_id, dhash);
    the blocked candidate join is lossless (pigeonhole), so the
    oracle needs no exhaustive variant.

    ``tkl_rel`` (Spark side, r17): a pre-materialized (doc_id, action)
    text keep-list; the MinHash chain and the image-render decode are
    independent member pipelines, materialized concurrently by the
    query builder (guide §2.6 — the consensus pattern). The oracle
    composes with ``tkl_rel=None`` — string unchanged."""
    if tkl_rel is not None:
        text_kl = f"SELECT doc_id, action FROM {tkl_rel}"
    else:
        text_kl = _dedup_keep_list_sql(engine)
    ham = hamming_expr("h_a", "h_b", engine)
    blocks = "\n    UNION\n".join(
        f"    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,"
        f" a.dhash AS h_a, b.dhash AS h_b"
        f" FROM {h_src} a JOIN {h_src} b"
        f" ON {_img_block_expr('a.dhash', b_, engine)} = {_img_block_expr('b.dhash', b_, engine)}"
        f" AND a.doc_id < b.doc_id"
        for b_ in range(4)
    )
    return f"""tkl AS (
  SELECT doc_id, action = 'drop' AS tdrop FROM ({text_kl})
),
icl AS (
  SELECT DISTINCT doc_b AS doc_id FROM (
    SELECT doc_a, doc_b, {ham} AS hamming FROM (
{blocks}
    )
  ) WHERE hamming <= 3
),
j AS (
  SELECT t.doc_id, t.tdrop, (c.doc_id IS NOT NULL) AS idrop
  FROM tkl t LEFT JOIN icl c ON c.doc_id = t.doc_id
)
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN tdrop THEN 1 ELSE 0 END) AS BIGINT) AS text_drops,
       CAST(sum(CASE WHEN idrop THEN 1 ELSE 0 END) AS BIGINT) AS image_drops,
       CAST(sum(CASE WHEN tdrop AND idrop THEN 1 ELSE 0 END) AS BIGINT) AS both_drop,
       CAST(sum(CASE WHEN tdrop = idrop THEN 1 ELSE 0 END) AS BIGINT) AS agree
FROM j"""


def _modal_agreement_oracle() -> str:
    return (
        f"\nWITH {_image_dhash_oracle_ctes()},\n"
        + _modal_agreement_sql("duckdb", "h")
        + "\n"
    )


@register(
    "modal_dedup_agreement",
    oracle=_modal_agreement_oracle(),
    doc=_modal_agreement_sql.__doc__,
    tags=("pipeline", "multimodal", "dedup", "similarity"),
)
def modal_dedup_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_wsr_project_spark.operators.multimodal import (
        extract_image_dhash,
        synthesize_image_renders,
    )

    load_table(spark, "documents", sf_dir).createOrReplaceTempView("documents")
    # r17 (guide §2.6): the MinHash text keep-list and the image-render
    # decode are independent member pipelines — materialize both
    # concurrently (the consensus pattern, applied to the 2-member
    # diagnostic).
    _run_view_builders(
        spark,
        {
            "_img_dhash_agree": lambda: _fingerprint_once(
                extract_image_dhash(synthesize_image_renders(spark, sf_dir)),
                "img_fp",
            ).select(F.col("asset_id").alias("doc_id"), "dhash"),
            "_ma_tkl": lambda: _materialize_once(
                spark.sql(_dedup_keep_list_sql("spark")), "_ma_tkl"
            ),
        },
    )
    return spark.sql(
        "\nWITH "
        + _modal_agreement_sql("spark", "_img_dhash_agree", "_ma_tkl")
        + "\n"
    )


# ---------------------------------------------------------------------------
# Bigram statistics (n-gram LM-style corpus counts)
# ---------------------------------------------------------------------------


def _bigram_sql(engine: str) -> str:
    """Top-50 bigrams. Tokens stay in-row (array ops) until the single
    explode feeding one count shuffle — same discipline as the vocab
    query. The Spark variant stops at the frequency table; the global
    top-50 + rank is attached by ``global_topn`` (TakeOrderedAndProject,
    not an unpartitioned row_number over the full bigram vocabulary)."""
    if engine == "spark":
        toks = "filter(split(lower(text), '[^a-z0-9]+'), x -> x <> '')"
        bigrams = (
            "explode(zip_with(slice(t, 1, size(t) - 1), slice(t, 2, size(t) - 1), "
            "(a, b) -> concat(a, ' ', b)))"
        )
        guard = "size(t) >= 2"
        return f"""
WITH toks AS (SELECT {toks} AS t FROM documents),
bi AS (SELECT {bigrams} AS bigram FROM toks WHERE {guard})
SELECT bigram, count(*) AS freq FROM bi GROUP BY bigram
"""
    toks = "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')"
    bigrams = "unnest(list_transform(range(len(t) - 1), i -> t[i+1] || ' ' || t[i+2]))"
    guard = "len(t) >= 2"
    rn = "row_number() OVER (ORDER BY freq DESC, bigram)"
    return f"""
WITH toks AS (SELECT {toks} AS t FROM documents),
bi AS (SELECT {bigrams} AS bigram FROM toks WHERE {guard}),
freqs AS (SELECT bigram, count(*) AS freq FROM bi GROUP BY bigram)
SELECT bigram, freq, rank FROM (
  SELECT bigram, freq, {rn} AS rank FROM freqs
) WHERE rank <= 50
"""


@register("bigram_topk", oracle=_bigram_sql("duckdb"), tags=("pipeline", "text"))
def bigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_wsr_project_spark.operators.topn import global_topn

    load_table(spark, "documents", sf_dir).createOrReplaceTempView("documents")
    freqs = spark.sql(_bigram_sql("spark"))
    return global_topn(freqs, "freq", 50, tiebreakers=["bigram"]).select(
        "bigram", "freq", "rank"
    )


def _simhash_blocked_spark_sql() -> str:
    """The 100 TB SimHash path: pigeonhole blocking. The 60-bit
    simhash splits into 4 15-BIT blocks (r12 — the image-dedup
    key-width lesson applied to text: the old 32-bit hash's byte
    blocks had ≤256 values, and its 4th block ≤16 since the token
    hash was only 28 bits — an n²-with-constant candidate generator;
    15-bit keys have 32,768 values, measured 2.8k candidates vs the
    old 32k on the 500-doc corpus); any pair with Hamming ≤ 3 must
    agree on ≥ 1 block, so candidates come from 4 equi-joins on block
    values and the Hamming check only runs on candidates. Registered
    against the SAME oracle as the exhaustive self-join
    (simhash_neardup_pairs) — the match proves the blocking is
    lossless."""
    from flink_wsr_project_spark.operators.dedup import SIMHASH_BLOCK_BITS

    mask = (1 << SIMHASH_BLOCK_BITS) - 1
    blocks = "\n  UNION\n".join(
        f"  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,"
        f" a.simhash AS sh_a, b.simhash AS sh_b"
        f" FROM s a JOIN s b"
        f" ON (shiftright(a.simhash, {SIMHASH_BLOCK_BITS * b_}) & {mask})"
        f" = (shiftright(b.simhash, {SIMHASH_BLOCK_BITS * b_}) & {mask})"
        f" AND a.doc_id < b.doc_id"
        for b_ in range(4)
    )
    ham = hamming_expr("sh_a", "sh_b", "spark")
    return f"""
WITH s AS ({simhash_sql('spark')}),
cand AS (
{blocks}
)
SELECT doc_a, doc_b, hamming FROM (
  SELECT doc_a, doc_b, {ham} AS hamming FROM cand
) WHERE hamming <= 3
"""


@register(
    "simhash_neardup_blocked",
    oracle=_simhash_neardup_sql("duckdb"),
    tags=("pipeline", "dedup"),
)
def simhash_neardup_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, "documents", sf_dir).createOrReplaceTempView("documents")
    return spark.sql(_simhash_blocked_spark_sql())


# ---------------------------------------------------------------------------
# Per-source curation stats & cross-source contamination
# ---------------------------------------------------------------------------

_SOURCE_QUALITY_ORACLE = rf"""
WITH t AS (
  SELECT source, regexp_split_to_array(trim(text), '\s+') AS toks, length(text) AS n FROM documents
)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(len(toks)) AS BIGINT) AS total_tokens,
       CAST(sum(CASE WHEN len(toks) BETWEEN 10 AND 10000
                 AND n / len(toks) BETWEEN 3 AND 15 THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
       sum(CASE WHEN len(toks) BETWEEN 10 AND 10000
                 AND n / len(toks) BETWEEN 3 AND 15 THEN 1 ELSE 0 END) * 1.0 / count(*)
         AS pass_rate
FROM t GROUP BY source
"""


@register("source_quality_summary", oracle=_SOURCE_QUALITY_ORACLE, tags=("pipeline", "text"))
def source_quality_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source curation dashboard: doc/token counts and the Gopher
    gate pass-rate (the aggregate that drives keep/drop decisions per
    crawl/source at corpus scale). Single scan, one small shuffle."""
    docs = load_table(spark, "documents", sf_dir)
    toks = F.split(F.trim(F.col("text")), r"\s+")
    passes = (
        F.size(toks).between(10, 10000)
        & (F.length("text") / F.size(toks)).between(3, 15)
    ).cast("int")
    return docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(toks).cast("long")).alias("total_tokens"),
        F.sum(passes).cast("long").alias("n_pass"),
        (F.sum(passes) * 1.0 / F.count("*")).alias("pass_rate"),
    )


_CONTAMINATION_ORACLE = f"""
WITH pairs AS ({_dedup_minhash_lsh_sql("duckdb")})
SELECT p.doc_a, p.doc_b, a.source AS source_a, b.source AS source_b, p.jaccard
FROM pairs p
JOIN documents a ON a.doc_id = p.doc_a
JOIN documents b ON b.doc_id = p.doc_b
WHERE a.source <> b.source
"""


@register("cross_source_contamination", oracle=_CONTAMINATION_ORACLE, tags=("pipeline", "dedup"))
def cross_source_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval leakage check: near-duplicate content (LSH-verified,
    Jaccard >= 0.4) appearing under two different sources. At 100 TB
    the same shape runs against a benchmark-fingerprint table with the
    small benchmark side broadcast; the pair space stays within-band."""
    load_table(spark, "documents", sf_dir).createOrReplaceTempView("documents")
    return spark.sql(
        f"""
WITH pairs AS ({_dedup_minhash_lsh_sql("spark")})
SELECT p.doc_a, p.doc_b, a.source AS source_a, b.source AS source_b, p.jaccard
FROM pairs p
JOIN documents a ON a.doc_id = p.doc_a
JOIN documents b ON b.doc_id = p.doc_b
WHERE a.source <> b.source
"""
    )


# ---------------------------------------------------------------------------
# Deterministic (hash-based) sampling & stratified source mixing
# ---------------------------------------------------------------------------

_SOURCE_RATES = {"cc": 20, "wiki": 80, "books": 60}  # percent, else 10


def _stratified_sample_sql(engine: str) -> str:
    """Hash-gated sampling: keep iff h(doc) mod 100 < rate(source).
    Deterministic (same sample every run, any cluster size, no RNG
    state) — the property reservoir/random sampling loses under
    retries and repartitioning. Rates are literal per-source weights."""
    h = h28("text", engine)
    rate = "CASE source " + " ".join(
        f"WHEN '{s}' THEN {r}" for s, r in _SOURCE_RATES.items()
    ) + " ELSE 10 END"
    return f"""
SELECT doc_id, source, sampled FROM (
  SELECT doc_id, source,
         CAST({h} % 100 < {rate} AS BOOLEAN) AS sampled
  FROM documents
)
"""


@register("stratified_sample", oracle=_stratified_sample_sql("duckdb"), tags=("pipeline", "sampling"))
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, "documents", sf_dir).createOrReplaceTempView("documents")
    return spark.sql(_stratified_sample_sql("spark"))


# ---------------------------------------------------------------------------
# Edit-distance fuzzy matching (within LSH candidate buckets)
# ---------------------------------------------------------------------------


def _fuzzy_prefix_sql(engine: str) -> str:
    """Levenshtein over 40-char prefixes, but ONLY within MinHash-LSH
    candidate pairs — the blocking keeps the quadratic string-distance
    kernel off the full corpus (it runs on |candidates|, not n²)."""
    pairs = _dedup_minhash_lsh_sql(engine)
    lev = (
        "levenshtein(substr(a.text, 1, 40), substr(b.text, 1, 40))"
        if engine == "spark"
        else "levenshtein(substring(a.text, 1, 40), substring(b.text, 1, 40))"
    )
    return f"""
WITH pairs AS ({pairs})
SELECT p.doc_a, p.doc_b, CAST({lev} AS BIGINT) AS prefix_edit_distance, p.jaccard
FROM pairs p
JOIN documents a ON a.doc_id = p.doc_a
JOIN documents b ON b.doc_id = p.doc_b
"""


@register("fuzzy_prefix_pairs", oracle=_fuzzy_prefix_sql("duckdb"), tags=("pipeline", "dedup"))
def fuzzy_prefix_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, "documents", sf_dir).createOrReplaceTempView("documents")
    return spark.sql(_fuzzy_prefix_sql("spark"))


# ---------------------------------------------------------------------------
# Exact-k deterministic per-key sample (hash-order reservoir)
# ---------------------------------------------------------------------------

_SAMPLE_K = 50


def _per_source_sample_sql(engine: str) -> str:
    """Exactly min(k, n) documents per source, selected by content-hash
    order — a deterministic reservoir sample: uniform (hash order is
    independent of doc content ordering), exact-k (unlike rate-gating,
    which only hits the rate in expectation), and stable under retries,
    repartitioning, and cluster size. Spark plans the rank as
    WindowGroupLimit(Partial): each map task pre-prunes to k rows per
    source before the shuffle, so the wire carries O(k x sources x
    tasks), never the corpus."""
    h = h28("text", engine)
    return f"""
SELECT source, doc_id, sample_rank FROM (
  SELECT source, doc_id,
         CAST(row_number() OVER (PARTITION BY source ORDER BY {h}, doc_id) AS BIGINT)
           AS sample_rank
  FROM documents
) WHERE sample_rank <= {_SAMPLE_K}
"""


@register(
    "per_source_doc_sample", oracle=_per_source_sample_sql("duckdb"), tags=("pipeline", "sampling")
)
def per_source_doc_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, "documents", sf_dir).createOrReplaceTempView("documents")
    return spark.sql(_per_source_sample_sql("spark"))


# attach SQL-builder docstrings to the thin wrapper registrations
from flink_wsr_project_spark.plans.registry import set_doc as _set_doc  # noqa: E402

for _n, _b in {
    "minhash_signatures": _minhash_signatures_sql,
    "dedup_minhash_lsh": _dedup_minhash_lsh_sql,
    "ngram_jaccard_pairs": _ngram_jaccard_sql,
    "dedup_simhash": _simhash_sql,
    "simhash_neardup_pairs": _simhash_neardup_sql,
    "simhash_neardup_blocked": _simhash_blocked_spark_sql,
    "ann_cosine_topk": _ann_brute_force_sql,
    "ann_srp_lsh_pairs": _ann_srp_sql,
    "minhash_jaccard_error": _minhash_jaccard_error_sql,
    "embedding_cosine_neardup": _embedding_neardup_sql,
    "ann_ivf_topk": _ann_ivf_sql,
    "dedup_keep_list": _dedup_keep_list_sql,
    "stratified_sample": _stratified_sample_sql,
    "fuzzy_prefix_pairs": _fuzzy_prefix_sql,
    "bigram_topk": _bigram_sql,
    "dedup_minhash_lsh_capped": _dedup_minhash_lsh_capped_sql,
    "lsh_bucket_skew": _lsh_bucket_skew_sql,
}.items():
    _set_doc(_n, _b.__doc__)


# ---------------------------------------------------------------------------
# Repetition signals (the Gopher-style rep filters exact-dup misses)
# ---------------------------------------------------------------------------

_REPETITION_ORACLE = r"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents
)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
       (CAST(len(toks) AS BIGINT) - CAST(len(list_distinct(toks)) AS BIGINT))
         / CAST(len(toks) AS BIGINT) AS dup_token_ratio,
       CAST(list_max(list_transform(list_distinct(toks),
                                    t -> len(list_filter(toks, x -> x = t)))) AS BIGINT)
         / CAST(len(toks) AS BIGINT) AS top_token_ratio
FROM t
"""


@register("doc_repetition_ratio", oracle=_REPETITION_ORACLE, tags=("pipeline", "text"))
def doc_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition signals (Gopher-style): duplicate-token
    fraction and most-frequent-token fraction. Everything stays in-row
    (higher-order array functions, no explode, no shuffle) — per-doc
    cost is O(tokens x distinct) which is bounded by doc length, so the
    operator is embarrassingly parallel at 100 TB."""
    docs = load_table(spark, "documents", sf_dir)
    toks = F.split(F.trim(F.col("text")), r"\s+")
    nt = F.size(toks).cast("long")
    nd = F.size(F.array_distinct(toks)).cast("long")
    maxf = F.array_max(
        F.transform(F.array_distinct(toks), lambda t: F.size(F.filter(toks, lambda x: x == t)))
    ).cast("long")
    return docs.select(
        "doc_id",
        nt.alias("n_tokens"),
        nd.alias("n_distinct"),
        ((nt - nd) / nt).alias("dup_token_ratio"),
        (maxf / nt).alias("top_token_ratio"),
    )


# ---------------------------------------------------------------------------
# Sequence packing (training-batch assembly: fixed token budget per bin)
# ---------------------------------------------------------------------------

_SEQ_PACKING_ORACLE = r"""
WITH t AS (
  SELECT source, doc_id,
         CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS toks
  FROM documents
), c AS (
  SELECT source, doc_id, toks,
         sum(toks) OVER (PARTITION BY source ORDER BY doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM t
)
SELECT source, CAST((cum - toks) // 512 AS BIGINT) AS bin_id,
       count(*) AS n_docs, CAST(sum(toks) AS BIGINT) AS bin_tokens,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM c GROUP BY source, bin_id
"""


@register("seq_packing", oracle=_SEQ_PACKING_ORACLE, tags=("pipeline", "packing"))
def seq_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing: docs are laid out in deterministic
    (source, doc_id) order and cut into 512-token bins by the running
    token count — the batch-assembly step before training. One shuffle
    on source for the running sum; the (source, bin) rollup is a
    second, already-partial-aggregated exchange. Deterministic on any
    cluster (no wall-clock, no partition-order dependence)."""
    from pyspark.sql import Window

    docs = load_table(spark, "documents", sf_dir).select(
        "source",
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("toks"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = docs.withColumn("cum", F.sum("toks").over(w)).withColumn(
        "bin_id", F.expr("(cum - toks) div 512")
    )
    return packed.groupBy("source", "bin_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("toks").alias("bin_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


# ---------------------------------------------------------------------------
# Training-mix weights (per-source token share)
# ---------------------------------------------------------------------------

_MIX_WEIGHTS_ORACLE = r"""
WITH t AS (
  SELECT source,
         CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS toks
  FROM documents
)
SELECT source, count(*) AS n_docs, CAST(sum(toks) AS BIGINT) AS src_tokens,
       CAST(sum(toks) * 1000000 // (SELECT sum(toks) FROM t) AS BIGINT) AS weight_ppm
FROM t GROUP BY source
"""


@register("data_mix_weights", oracle=_MIX_WEIGHTS_ORACLE, tags=("pipeline", "sampling"))
def data_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source sampling weights for a training mix: each source's
    share of total tokens, in integer parts-per-million (exact — no
    float aggregation anywhere). One scan: the global total is a
    single-partition rollup OVER the tiny per-source aggregate (source
    cardinality is 10s-100s even at 100 TB), not a second pass over
    documents."""
    from pyspark.sql import Window

    docs = load_table(spark, "documents", sf_dir).select(
        "source",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("toks"),
    )
    per_src = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"), F.sum("toks").alias("src_tokens")
    )
    # One-group rollup over the tiny per-source aggregate via a
    # non-foldable constant key (an EMPTY spec would plan the warned-about
    # unpartitioned WindowExec; see operators.topn.one_group).
    from flink_wsr_project_spark.operators.topn import one_group

    total = F.sum("src_tokens").over(Window.partitionBy(one_group("source")))
    return per_src.select(
        "source",
        "n_docs",
        "src_tokens",
        F.expr("src_tokens * 1000000").cast("long").alias("_num"),
        total.alias("_tot"),
    ).select(
        "source",
        "n_docs",
        "src_tokens",
        F.expr("_num div _tot").alias("weight_ppm"),
    )


# ---------------------------------------------------------------------------
# Length histogram (power-of-two buckets per source)
# ---------------------------------------------------------------------------

_LENGTH_HIST_ORACLE = """
SELECT source, CAST(length(bin(n_chars)) AS BIGINT) AS bucket_bits,
       count(*) AS n_docs,
       min(n_chars) AS min_chars, max(n_chars) AS max_chars,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents
GROUP BY source, bucket_bits
"""


@register("doc_length_histogram", oracle=_LENGTH_HIST_ORACLE, tags=("pipeline", "text"))
def doc_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-length distribution in power-of-two buckets per source
    (bucket = bit-length of n_chars — integer-exact in both engines,
    no floating log2 at bucket boundaries). Single aggregation
    shuffle."""
    docs = load_table(spark, "documents", sf_dir)
    bucket = F.length(F.conv(F.col("n_chars").cast("string"), 10, 2)).cast("long")
    return docs.groupBy("source", bucket.alias("bucket_bits")).agg(
        F.count("*").alias("n_docs"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.sum("n_chars").alias("sum_chars"),
    )


# ---------------------------------------------------------------------------
# Out-of-vocabulary ratio (corpus-derived vocab, broadcast back)
# ---------------------------------------------------------------------------

_OOV_ORACLE = r"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS token
  FROM documents
), vocab AS (
  SELECT token FROM (
    SELECT token, row_number() OVER (ORDER BY count(*) DESC, token) AS rk
    FROM toks GROUP BY token
  ) WHERE rk <= 100
)
SELECT t.doc_id, count(*) AS n_tokens, count(v.token) AS in_vocab,
       (count(*) - count(v.token)) / CAST(count(*) AS DOUBLE) AS oov_ratio
FROM toks t LEFT JOIN vocab v ON t.token = v.token
GROUP BY t.doc_id
"""


@register("doc_oov_ratio", oracle=_OOV_ORACLE, tags=("pipeline", "text"))
def doc_oov_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document out-of-vocabulary ratio against the corpus's own
    top-100 token vocabulary (ties broken lexically). Two passes over
    documents by construction (vocab must exist before scoring), but
    the vocab result is tiny and BROADCAST back, so the scoring pass
    never shuffles for the join — only the per-doc rollup does."""
    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("token")
    )
    vocab = (
        toks.groupBy("token")
        .agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), "token")
        .limit(100)
        .select("token")
    )
    joined = toks.join(F.broadcast(vocab.withColumn("in_v", F.lit(1))), "token", "left")
    return joined.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.count("in_v").alias("in_vocab"),
        ((F.count("*") - F.count("in_v")) / F.count("*").cast("double")).alias("oov_ratio"),
    )


# ---------------------------------------------------------------------------
# Per-label embedding centroids (distributed element-wise vector mean)
# ---------------------------------------------------------------------------


def _label_centroid_sql(engine: str) -> str:
    """Per-(label, dimension) centroid components for the embedding
    corpus. The scale path for averaging 10^11 vectors: explode each
    vector to (label, dim, value) rows so the element-wise mean is ONE
    hash aggregate with map-side partial sums — no per-group vector
    buffering, no driver-side math, and the 64-wide accumulator state
    is (label × dim) rows regardless of corpus size. Values are
    quantized to 1e-6 integers before summing, so the sum is
    order-independent and bit-exact on any partitioning / any engine;
    the mean is one exact-integer / count division at the end."""
    if engine == "spark":
        exploded = """
  SELECT label, CAST(pos AS BIGINT) AS dim, val
  FROM embeddings LATERAL VIEW posexplode(embedding) t AS pos, val"""
    else:
        exploded = """
  SELECT label,
         CAST(unnest(generate_series(0, len(embedding) - 1)) AS BIGINT) AS dim,
         unnest(embedding) AS val
  FROM embeddings"""
    return f"""
SELECT label, dim, count(*) AS n_vecs,
       sum(CAST(round(CAST(val AS DOUBLE) * 1000000) AS BIGINT))
         / count(*) / 1000000.0 AS mean_val
FROM ({exploded})
GROUP BY label, dim
"""


@register("label_centroids", oracle=_label_centroid_sql("duckdb"), tags=("pipeline", "similarity"))
def label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, "embeddings", sf_dir).createOrReplaceTempView("embeddings")
    return spark.sql(_label_centroid_sql("spark"))


_set_doc("label_centroids", _label_centroid_sql.__doc__)


def _nearest_centroid_sql(engine: str) -> str:
    """Assign every vector to the label centroid with the highest dot
    product, then cross-tabulate true vs assigned label (one k-means
    classification step / embedding-quality confusion matrix). The
    centroid matrix stays as exact integer SUMS (not means): the
    per-vector score sum(q_val × q_sum) is a pure BIGINT fold, and the
    mean's 1/n_label scaling is applied once per candidate as a single
    exact-integer IEEE division — so the argmax is bit-identical on
    any engine and any partitioning. Centroids are k×d rows (tiny at
    any corpus size) joined on dim: the classic matrix-multiply-as-
    join-aggregate shape; the vector side never collects, and the only
    wide state is the (vec, candidate) partial-sum aggregate."""
    if engine == "spark":
        exploded = """
  SELECT vec_id, label, CAST(pos AS BIGINT) AS dim,
         CAST(round(CAST(val AS DOUBLE) * 1000000) AS BIGINT) AS qval
  FROM embeddings LATERAL VIEW posexplode(embedding) t AS pos, val"""
    else:
        exploded = """
  SELECT vec_id, label,
         CAST(unnest(generate_series(0, len(embedding) - 1)) AS BIGINT) AS dim,
         CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT) AS qval
  FROM embeddings"""
    return f"""
WITH exploded AS ({exploded}),
cent AS (
  SELECT label AS c_label, dim, sum(qval) AS sumq, count(*) AS n_label
  FROM exploded GROUP BY label, dim
),
scores AS (
  SELECT e.vec_id, e.label AS true_label, c.c_label,
         sum(e.qval * c.sumq) / c.n_label AS score
  FROM exploded e JOIN cent c ON e.dim = c.dim
  GROUP BY e.vec_id, e.label, c.c_label, c.n_label
),
best AS (
  SELECT vec_id, true_label, c_label AS assigned_label,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY score DESC, c_label) AS rn
  FROM scores
)
SELECT true_label, assigned_label, count(*) AS n_vecs
FROM best WHERE rn = 1
GROUP BY true_label, assigned_label
"""


@register(
    "nearest_centroid_confusion",
    oracle=_nearest_centroid_sql("duckdb"),
    tags=("pipeline", "similarity"),
)
def nearest_centroid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, "embeddings", sf_dir).createOrReplaceTempView("embeddings")
    return spark.sql(_nearest_centroid_sql("spark"))


_set_doc("nearest_centroid_confusion", _nearest_centroid_sql.__doc__)


# ---------------------------------------------------------------------------
# Per-source distinctive tokens (exact integer lift) + dataset splits
# ---------------------------------------------------------------------------


def _token_source_lift_sql(engine: str) -> str:
    """Top-5 tokens most distinctive of each source by lift =
    (freq in source) / (freq in corpus). Lift compares as
    (c_st × n_total) / (c_t × n_s): both sides are exact BIGINT
    products with ONE IEEE division at the end, so the per-source
    ranking is engine- and order-independent (token breaks ties).
    The shape is corpus-comparison at scale: one (source, token)
    aggregate, then token totals / source totals come from partitioned
    window sums OVER the aggregate and the corpus total from a 1-row
    scalar aggregate broadcast back (a global ``sum() OVER ()`` would
    single-partition the vocabulary-sized aggregate) — never a second
    corpus scan."""
    if engine == "spark":
        tok = r"""
  SELECT source, token FROM documents
  LATERAL VIEW explode(split(trim(text), '\\s+')) t AS token"""
        rn = "CAST(row_number() OVER (PARTITION BY source ORDER BY lift DESC, token) AS BIGINT)"
        total = "CROSS JOIN (SELECT sum(c_st) AS n_total FROM st) tot"
        n_total_col = ",\n         n_total"
    else:
        tok = r"""
  SELECT source, unnest(regexp_split_to_array(trim(text), '\s+')) AS token
  FROM documents"""
        rn = "row_number() OVER (PARTITION BY source ORDER BY lift DESC, token)"
        total = ""
        n_total_col = ",\n         sum(c_st) OVER () AS n_total"
    return f"""
WITH tok AS ({tok}),
st AS (SELECT source, token, count(*) AS c_st FROM tok GROUP BY source, token),
enriched AS (
  SELECT source, token, c_st,
         sum(c_st) OVER (PARTITION BY token) AS c_t,
         sum(c_st) OVER (PARTITION BY source) AS n_s{n_total_col}
  FROM st {total}
),
scored AS (
  SELECT source, token, c_st,
         (c_st * n_total) / CAST(c_t * n_s AS DOUBLE) AS lift
  FROM enriched WHERE c_st >= 20
)
SELECT source, token, c_st, lift, rank FROM (
  SELECT source, token, c_st, lift, {rn} AS rank FROM scored
) WHERE rank <= 5
"""


@register("token_source_lift", oracle=_token_source_lift_sql("duckdb"), tags=("pipeline", "text"))
def token_source_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, "documents", sf_dir).createOrReplaceTempView("documents")
    return spark.sql(_token_source_lift_sql("spark"))


_set_doc("token_source_lift", _token_source_lift_sql.__doc__)


def _dataset_splits_sql(engine: str) -> str:
    """Deterministic train/val/test assignment (80/10/10) by a stable
    content-independent hash of doc_id — reproducible on any cluster,
    any partitioning, any engine, and stable when the corpus grows
    (adding docs never reassigns existing ones). Reported as
    per-(source, split) counts with id bounds. One narrow scan +
    one tiny aggregate; the assignment itself is pure row-local
    expression work (zero shuffle before the rollup)."""
    str_t = "STRING" if engine == "spark" else "VARCHAR"
    h = h28(f"concat('split:', CAST(doc_id AS {str_t}))", engine)
    return f"""
SELECT source, split, count(*) AS n_docs,
       min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
FROM (
  SELECT source, doc_id,
         CASE WHEN {h} % 100 < 80 THEN 'train'
              WHEN {h} % 100 < 90 THEN 'val'
              ELSE 'test' END AS split
  FROM documents
)
GROUP BY source, split
"""


@register("dataset_splits", oracle=_dataset_splits_sql("duckdb"), tags=("pipeline", "sampling"))
def dataset_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, "documents", sf_dir).createOrReplaceTempView("documents")
    return spark.sql(_dataset_splits_sql("spark"))


_set_doc("dataset_splits", _dataset_splits_sql.__doc__)
_set_doc("per_source_doc_sample", _per_source_sample_sql.__doc__)


# ---------------------------------------------------------------------------
# Document chunking: fixed-size char windows with overlap
# ---------------------------------------------------------------------------

_CHUNK_SIZE = 200
_CHUNK_STRIDE = 150

_CHUNK_ORACLE = f"""
WITH exploded AS (
  SELECT doc_id, text,
         unnest(range(0, CASE WHEN length(text) <= {_CHUNK_SIZE} THEN 1
                              ELSE CAST(ceil((length(text) - {_CHUNK_SIZE}) / {_CHUNK_STRIDE}.0) AS BIGINT) + 1
                         END)) AS chunk_id
  FROM documents
)
SELECT doc_id, chunk_id,
       substr(text, CAST(chunk_id * {_CHUNK_STRIDE} + 1 AS BIGINT), {_CHUNK_SIZE}) AS chunk_text,
       length(substr(text, CAST(chunk_id * {_CHUNK_STRIDE} + 1 AS BIGINT), {_CHUNK_SIZE})) AS chunk_len
FROM exploded
"""


@register("doc_chunks", oracle=_CHUNK_ORACLE, tags=("pipeline", "chunking"))
def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-size chunks (size {size}, stride {stride}) —
    the context-window splitter every training pipeline runs before
    tokenization. NARROW plan: explode(sequence) + substring, all
    whole-stage codegen, zero shuffles — each 100 TB input split chunks
    independently; output row count is len/stride per doc with no skew
    amplification beyond document length itself (cap outlier docs
    upstream via doc_length_histogram's tail).
    """
    docs = load_table(spark, "documents", sf_dir)
    n = F.coalesce(F.length("text"), F.lit(0))
    n_chunks = (
        F.when(n <= _CHUNK_SIZE, F.lit(1))
        .otherwise(F.ceil((n - _CHUNK_SIZE) / F.lit(float(_CHUNK_STRIDE))) + 1)
        .cast("long")
    )
    chunk = F.substr(
        F.col("text"), F.col("chunk_id") * _CHUNK_STRIDE + 1, F.lit(_CHUNK_SIZE)
    )
    return (
        docs.select(
            "doc_id",
            "text",
            F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias("chunk_id"),
        )
        .select(
            "doc_id",
            "chunk_id",
            chunk.alias("chunk_text"),
            F.length(chunk).alias("chunk_len"),
        )
    )


doc_chunks.__doc__ = doc_chunks.__doc__.format(size=_CHUNK_SIZE, stride=_CHUNK_STRIDE)


# ---------------------------------------------------------------------------
# Chunk→document containment via an inverted shingle index
# ---------------------------------------------------------------------------

# Posting-list document-frequency cap: shingles appearing in more than
# this many documents are STOP-SHINGLES and leave the index (the
# prefix-filtering idea of PPJoin/AllPairs applied as a valve). At
# 100 TB a boilerplate 3-gram's posting list is millions of docs — the
# inverted-index join's shuffle key skew is exactly that list, so the
# cap bounds the worst key's fan-out. Containment becomes a
# conservative UNDER-estimate (matches can only be missed, never
# invented) — the safe direction for a drop decision. Default 5 keeps
# the branch alive on the gate corpora (max DF 7 at sf0.01, 9 at
# sf0.001).
_CONT_DF_CAP = _parse_bucket_cap(os.environ.get("SPARK_GRAFT_CONT_DF_CAP", "5"), "SPARK_GRAFT_CONT_DF_CAP")
# A chunk must retain at least this many distinct non-stop shingle
# hashes to be judged at all (a mostly-boilerplate chunk's denominator
# would otherwise be tiny and its containment pure noise) — the
# min-duration-gate lesson from the audio path, made structural.
_CONT_MIN_SHINGLES = 5
_CONT_THRESHOLD_MILLI = 700


def _chunk_containment_sql(engine: str) -> str:
    """Which chunks of which documents are CONTAINED in some other
    document — the asymmetric question (quotes, boilerplate inclusion,
    doc-inside-doc) that symmetric Jaccard near-dup misses. Containment
    of chunk c in doc d = |H(c) ∩ H(d)| / |H(c)| over 28-bit hashed
    3-gram shingle sets (hash-space containment: collisions overcount
    identically in both engines).

    Plan: chunk (row-local explode) → shingle+hash (row-local) →
    inverted-index join on the shingle hash (ONE equi-shuffle whose
    key skew is bounded by the DF cap) → (chunk, doc) match count →
    containment vs the chunk's non-stop denominator. Never any
    all-pairs term: cost is Σ posting-list² per shingle hash, and the
    DF cap bounds every list at {cap}. Integer milli-units end to end.
    """
    thr = _CONT_THRESHOLD_MILLI
    cont = (
        f"(m.m * 1000) div s.n_sh" if engine == "spark" else f"(m.m * 1000) // s.n_sh"
    )
    return f"""
WITH {_containment_ctes(engine)}
SELECT m.src_doc, m.chunk_id, m.match_doc,
       CAST({cont} AS BIGINT) AS cont_milli
FROM matches m
JOIN csize s ON s.src_doc = m.src_doc AND s.chunk_id = m.chunk_id
WHERE m.m * 1000 >= {thr} * s.n_sh
"""


def _containment_ctes(engine: str) -> str:
    """The inverted-index containment CTE chain (shingle postings with
    the DF cap → chunk shingle sets → match counts → judged-chunk
    denominators) — shared by the pair query and the keep-list so the
    two cannot drift."""
    size, stride = _CHUNK_SIZE, _CHUNK_STRIDE
    cap, min_sh = _CONT_DF_CAP, _CONT_MIN_SHINGLES
    h = h28("s", engine)
    if engine == "spark":
        doc_expl = "SELECT doc_id, explode(array_distinct(sh)) AS s FROM shingled"
        n_chunks = (
            f"CASE WHEN length(text) <= {size} THEN 1 "
            f"ELSE CAST(ceil((length(text) - {size}) / {stride}.0) AS BIGINT) + 1 END"
        )
        chunk_rows = (
            f"SELECT doc_id AS src_doc, explode(sequence(0, {n_chunks} - 1)) AS chunk_id, text "
            "FROM documents"
        )
        ct = f"substring(text, CAST(chunk_id * {stride} + 1 AS INT), {size})"
        ch_expl = "SELECT src_doc, chunk_id, explode(array_distinct(sh)) AS s FROM cshing"
    else:
        doc_expl = "SELECT doc_id, unnest(list_distinct(sh)) AS s FROM shingled"
        n_chunks = (
            f"CASE WHEN length(text) <= {size} THEN 1 "
            f"ELSE CAST(ceil((length(text) - {size}) / {stride}.0) AS BIGINT) + 1 END"
        )
        chunk_rows = (
            f"SELECT doc_id AS src_doc, unnest(range(0, {n_chunks})) AS chunk_id, text "
            "FROM documents"
        )
        ct = f"substr(text, CAST(chunk_id * {stride} + 1 AS BIGINT), {size})"
        ch_expl = "SELECT src_doc, chunk_id, unnest(list_distinct(sh)) AS s FROM cshing"
    return f"""{shingled_cte(engine)},
hdoc AS (SELECT DISTINCT doc_id, h FROM (SELECT doc_id, {h} AS h FROM ({doc_expl}))),
{_containment_df_post('hdoc', cap)},
chunks AS (SELECT src_doc, chunk_id, {ct} AS ct FROM ({chunk_rows})),
ctok AS (SELECT src_doc, chunk_id, ct, {toks_expr("ct", engine)} AS t FROM chunks),
cshing AS (SELECT src_doc, chunk_id, {shingles_from_toks("t", "ct", engine)} AS sh FROM ctok),
chsh AS (SELECT DISTINCT src_doc, chunk_id, h
         FROM (SELECT src_doc, chunk_id, {h} AS h FROM ({ch_expl}))),
{_containment_cpcm('chsh', cap, min_sh)}"""


def _containment_df_post(hdoc: str, cap: int) -> str:
    return f"""df AS (SELECT h, count(*) AS df FROM {hdoc} GROUP BY h),
post AS (SELECT {hdoc}.doc_id, {hdoc}.h FROM {hdoc} JOIN df ON df.h = {hdoc}.h AND df.df <= {cap})"""


def _containment_cpcm(chsh: str, cap: int, min_sh: int) -> str:
    return f"""cpost AS (SELECT c.src_doc, c.chunk_id, c.h
          FROM {chsh} c JOIN df ON df.h = c.h AND df.df <= {cap}),
csize AS (SELECT src_doc, chunk_id, count(*) AS n_sh
          FROM cpost GROUP BY src_doc, chunk_id HAVING count(*) >= {min_sh}),
matches AS (
  SELECT c.src_doc, c.chunk_id, p.doc_id AS match_doc, count(*) AS m
  FROM cpost c JOIN post p ON p.h = c.h AND p.doc_id <> c.src_doc
  GROUP BY c.src_doc, c.chunk_id, p.doc_id
)"""


def _containment_hdoc_sql() -> str:
    """Standalone (doc_id, h) distinct doc-shingle relation (Spark)."""
    full = _containment_ctes("spark")
    return "WITH " + full[: full.index(",\ndf AS")] + "\nSELECT * FROM hdoc"


def _containment_chsh_sql() -> str:
    """Standalone (src_doc, chunk_id, h) distinct chunk-shingle
    relation (Spark)."""
    full = _containment_ctes("spark")
    chunk_part = full[full.index("chunks AS") : full.index(",\ncpost AS")]
    return "WITH " + chunk_part + "\nSELECT * FROM chsh"


def _containment_ctes_materialized(hdoc: str, chsh: str) -> str:
    """The containment tail over PRE-MATERIALIZED shingle relations
    (r16, Spark only — the oracle composes ``_containment_ctes``
    unchanged). The lazy chain inlined the doc-side shingle build into
    every df/post reference and the chunk-side build into cpost —
    12 parquet scans in the executed plan for two passes of real
    work; the Spark queries checkpoint ``hdoc`` and ``chsh`` once per
    call (built concurrently) and this tail reads them."""
    return f"""{_containment_df_post(hdoc, _CONT_DF_CAP)},
{_containment_cpcm(chsh, _CONT_DF_CAP, _CONT_MIN_SHINGLES)}"""


def _containment_spark_sql(full_builder) -> str:
    """A containment query's Spark SQL with the lazy shingle chain
    swapped for the materialized-relation tail (one substring replace,
    so the two builders cannot drift). Raises if the swap did not
    occur (r16 ADVICE: a drifted composition would otherwise silently
    revert to the 12-scan lazy plan while still paying the two
    checkpoint jobs)."""
    full = full_builder("spark")
    out = full.replace(
        _containment_ctes("spark"),
        _containment_ctes_materialized("_cont_hdoc", "_cont_chsh"),
        1,
    )
    if "_cont_hdoc" not in out:
        raise AssertionError(
            "containment CTE swap no-opped — _containment_ctes drifted "
            "from the composed query SQL"
        )
    return out


def _containment_views(spark: SparkSession) -> None:
    """Materialize the two shingle relations concurrently (guide §2.6)
    and bind them as ``_cont_hdoc`` / ``_cont_chsh``."""
    _run_view_builders(
        spark,
        {
            "_cont_hdoc": lambda: _materialize_once(
                spark.sql(_containment_hdoc_sql()), "_cont_hdoc"
            ),
            "_cont_chsh": lambda: _materialize_once(
                spark.sql(_containment_chsh_sql()), "_cont_chsh"
            ),
        },
    )


@register(
    "chunk_containment",
    oracle=_chunk_containment_sql("duckdb"),
    doc=_chunk_containment_sql.__doc__,
    tags=("pipeline", "dedup", "chunking"),
)
def chunk_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, "documents", sf_dir).createOrReplaceTempView("documents")
    _containment_views(spark)
    return spark.sql(_containment_spark_sql(_chunk_containment_sql))


# A document is a containment-drop when at least this fraction (milli)
# of its JUDGED chunks are contained (≥ threshold) in a single
# lower-id document candidate pool — 500 = "half my measurable content
# appears in earlier documents".
_CONT_DOC_FRAC_MILLI = 500


def _containment_keep_sql(engine: str) -> str:
    """Per-document decision layer over the containment evidence: a
    doc DROPS when ≥ {frac}‰ of its judged chunks are contained
    (cont ≥ {thr}‰) in some LOWER-id document — the min-keeper
    convention every dedup path here follows, so two mutual clones
    never both drop (the lower id keeps). Docs with NO judged chunks
    (all below the min-shingle gate) are 'keep' — "not measurable"
    never means "drop", the same honest-null stance as the A/V
    duration gates. Shares the full CTE chain with
    ``chunk_containment``; the decision adds one judged-chunk rollup
    and one per-doc rollup on top."""
    thr, frac = _CONT_THRESHOLD_MILLI, _CONT_DOC_FRAC_MILLI
    return f"""
WITH {_containment_ctes(engine)},
scored AS (
  SELECT s.src_doc, s.chunk_id,
         max(CASE WHEN m.m * 1000 >= {thr} * s.n_sh
                   AND m.match_doc < s.src_doc THEN 1 ELSE 0 END) AS contained
  FROM csize s
  LEFT JOIN matches m ON m.src_doc = s.src_doc AND m.chunk_id = s.chunk_id
  GROUP BY s.src_doc, s.chunk_id
),
per_doc AS (
  SELECT src_doc, count(*) AS n_judged,
         CAST(sum(contained) AS BIGINT) AS n_contained
  FROM scored GROUP BY src_doc
)
SELECT d.doc_id,
       CAST(COALESCE(p.n_judged, 0) AS BIGINT) AS n_chunks_judged,
       CAST(COALESCE(p.n_contained, 0) AS BIGINT) AS n_chunks_contained,
       CASE WHEN p.src_doc IS NOT NULL
                 AND p.n_contained * 1000 >= {frac} * p.n_judged
            THEN 'drop' ELSE 'keep' END AS action
FROM documents d LEFT JOIN per_doc p ON p.src_doc = d.doc_id
"""


@register(
    "containment_keep_list",
    oracle=_containment_keep_sql("duckdb"),
    tags=("pipeline", "dedup", "chunking"),
)
def containment_keep_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, "documents", sf_dir).createOrReplaceTempView("documents")
    _containment_views(spark)
    return spark.sql(_containment_spark_sql(_containment_keep_sql))


_set_doc(
    "containment_keep_list",
    _containment_keep_sql.__doc__.format(
        frac=_CONT_DOC_FRAC_MILLI, thr=_CONT_THRESHOLD_MILLI
    ),
)


# ---------------------------------------------------------------------------
# Model-based quality filter: linear classifier over hashed tokens
# ---------------------------------------------------------------------------

_QCLS_DIMS = 256
# Deterministic stand-in weights (LCG over the hashed dimension) for
# the pretrained coefficient vector a real deployment broadcasts — the
# PLUMBING is the operator under test: per-token hash → dimension →
# weight lookup → in-row fold, the exact shape of a fasttext-style
# quality classifier (CCNet / LLaMA-pipeline filters), with the weight
# table entering the plan as literal arithmetic instead of a learned
# array. Swapping in learned weights changes one expression, not the
# plan.
_QCLS_A, _QCLS_C, _QCLS_M = 1_103_515_245, 12_345, 65_536


def _qcls_sql(engine: str) -> str:
    """Linear quality-classifier score: each whitespace token hashes to
    one of {d} dimensions (h28 % {d}); the document's raw score is the
    exact int64 sum of per-dimension weights w(dim) = LCG(dim) − M/2
    (symmetric around zero); score_milli is the per-token integer mean
    (×1000, floor division in BOTH engines) so length cancels; label
    thresholds at zero. ZERO shuffles — tokenize, hash, fold and
    threshold are all in-row; at 100 TB this is a pure scan, the
    cheapest possible model-based filter."""
    d, a, c, m = _QCLS_DIMS, _QCLS_A, _QCLS_C, _QCLS_M
    h = h28("tok", engine)
    w = f"(({a} * ({h} % {d}) + {c}) % {m}) - {m // 2}"
    if engine == "spark":
        fold = f"aggregate(transform(t, tok -> {w}), cast(0 as bigint), (s, x) -> s + x)"
        n_tok = "size(t)"
        milli = "(score_raw * 1000) div n_tok"
    else:
        fold = f"list_reduce(list_transform(t, tok -> {w}), (s, x) -> s + x)"
        n_tok = "len(t)"
        milli = "(score_raw * 1000) // n_tok"
    return f"""
WITH tokd AS (SELECT doc_id, {toks_expr("text", engine)} AS t FROM documents),
scored AS (
  SELECT doc_id, CAST({n_tok} AS BIGINT) AS n_tok, CAST({fold} AS BIGINT) AS score_raw
  FROM tokd
)
SELECT doc_id, n_tok,
       CAST({milli} AS BIGINT) AS score_milli,
       CASE WHEN {milli} >= 0 THEN 'keep' ELSE 'drop' END AS label
FROM scored
"""


@register(
    "quality_classifier_score",
    oracle=_qcls_sql("duckdb"),
    doc=_qcls_sql.__doc__,
    tags=("pipeline", "text", "quality"),
)
def quality_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, "documents", sf_dir).createOrReplaceTempView("documents")
    return spark.sql(_qcls_sql("spark"))



# ---------------------------------------------------------------------------
# Tokenizer fertility (corpus compression statistics per source)
# ---------------------------------------------------------------------------


def _fertility_sql(engine: str) -> str:
    """Tokenizer fertility per source: chars per whitespace token and per
    BPE-ish alnum-run token, in integer milli-units (floor) so the ratio
    is bit-exact across engines. The per-doc projection is row-local
    (whole-stage codegen); the only shuffle is the tiny per-source
    rollup — the 100 TB plan is a map-side partial over every split
    followed by |sources| final groups."""
    wt = toks_expr("text", engine)
    if engine == "spark":
        bpe = "split(trim(text), '[^0-9A-Za-z]+')"
        ln = "size"
    else:
        bpe = "regexp_split_to_array(trim(text), '[^0-9A-Za-z]+')"
        ln = "len"
    return f"""
WITH t AS (
  SELECT source, length(text) AS n_chars, {ln}({wt}) AS n_ws, {ln}({bpe}) AS n_bpe
  FROM documents
)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(sum(n_ws) AS BIGINT) AS total_ws_tokens,
       CAST(sum(n_bpe) AS BIGINT) AS total_bpeish_tokens,
       CAST(floor(sum(n_chars) * 1000.0 / sum(n_ws)) AS BIGINT) AS chars_per_ws_token_milli,
       CAST(floor(sum(n_chars) * 1000.0 / sum(n_bpe)) AS BIGINT) AS chars_per_bpeish_token_milli
FROM t GROUP BY source
"""


@register("tokenizer_fertility", oracle=_fertility_sql("duckdb"), tags=("pipeline", "text"))
def tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, "documents", sf_dir).createOrReplaceTempView("documents")
    return spark.sql(_fertility_sql("spark"))


_set_doc("tokenizer_fertility", _fertility_sql.__doc__)


# ---------------------------------------------------------------------------
# Passage-level (line-analogue) boilerplate dedup
# ---------------------------------------------------------------------------

_PASSAGE_N = 5  # tokens per non-overlapping segment
_PASSAGE_DOCS = 2  # boilerplate = segment present in > this many distinct docs


# one source of truth with the streaming twins (operators/text.py)
_passage_tokens = passage_tokens_expr


def _boilerplate_sql(engine: str) -> str:
    """Passage-level boilerplate detection — the corpus has no newlines,
    so the line-dedup trick (drop lines shared by many pages, a la
    CCNet/RefinedWeb) runs on fixed {n}-token non-overlapping segments:
    a segment appearing in more than {d} distinct documents is
    boilerplate; each document reports how much of it is boilerplate
    (ppm, floored — integer-exact cross-engine).

    Scale: tokenize + segment are row-local array ops; one shuffle
    keyed on segment for the frequency count, one keyed on doc_id for
    the report. Segment keys could hash (h28) at 100 TB to cut shuffle
    bytes; kept as text here so the oracle stays readable."""
    n, d = _PASSAGE_N, _PASSAGE_DOCS
    tk = _passage_tokens(engine)
    if engine == "spark":
        segs = (
            f"CASE WHEN size(tk) < {n} THEN array() "
            f"ELSE transform(sequence(0, CAST(floor(size(tk) / {n}) AS INT) - 1), "
            f"i -> concat_ws(' ', slice(tk, i * {n} + 1, {n}))) END"
        )
        expl = "explode(segs) AS seg"
        seg_src = f"SELECT doc_id, {expl} FROM segd"
    else:
        segs = (
            f"list_transform(range(CAST(floor(len(tk) / {n}) AS BIGINT)), "
            f"i -> array_to_string(tk[i * {n} + 1 : i * {n} + {n}], ' '))"
        )
        seg_src = "SELECT doc_id, unnest(segs) AS seg FROM segd"
    return f"""
WITH tokd AS (SELECT doc_id, {tk} AS tk FROM documents),
segd AS (SELECT doc_id, {segs} AS segs FROM tokd),
segs AS ({seg_src}),
{_boilerplate_tail('segs', d)}"""


def _boilerplate_segs_sql(engine: str) -> str:
    """Just the (doc_id, seg) exploded-segment relation — the prefix
    the Spark path materializes once (see ``boilerplate_passages``)."""
    full = _boilerplate_sql(engine)
    return full[: full.index(",\nfreq AS")] + "\nSELECT * FROM segs"


def _boilerplate_tail(rel: str, d: int) -> str:
    return f"""freq AS (SELECT seg, count(DISTINCT doc_id) AS nd FROM {rel} GROUP BY seg)
SELECT s.doc_id AS doc_id,
       count(*) AS n_segments,
       CAST(sum(CASE WHEN f.nd > {d} THEN 1 ELSE 0 END) AS BIGINT) AS n_boilerplate,
       CAST(floor(sum(CASE WHEN f.nd > {d} THEN 1 ELSE 0 END) * 1000000.0 / count(*)) AS BIGINT)
         AS boilerplate_ppm
FROM {rel} s JOIN freq f ON s.seg = f.seg
GROUP BY s.doc_id
"""


@register("boilerplate_passages", oracle=_boilerplate_sql("duckdb"), tags=("pipeline", "dedup", "text"))
def boilerplate_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r16: the segment relation is referenced twice (frequency count +
    # per-doc report) and as a CTE each reference re-ran the in-row
    # HOF segment build + explode on the scan's single task.
    # Materialize it once per call (the decontaminate pattern).
    load_table(spark, "documents", sf_dir).createOrReplaceTempView("documents")
    _materialize_once(
        spark.sql(_boilerplate_segs_sql("spark")), "_bp_segs"
    ).createOrReplaceTempView("_bp_segs")
    return spark.sql("WITH " + _boilerplate_tail("_bp_segs", _PASSAGE_DOCS))


_set_doc("boilerplate_passages", _boilerplate_sql.__doc__)


# ---------------------------------------------------------------------------
# Benchmark decontamination (train/test n-gram overlap)
# ---------------------------------------------------------------------------

_DECON_N = DECON_N  # sliding n-gram length — shared with decontaminate_stream


def _decontaminate_sql(engine: str) -> str:
    """Benchmark decontamination: a train-split document is contaminated
    if it shares any sliding {n}-token gram with any test-split document
    (the standard exact n-gram-overlap decontamination of LLM training
    sets). Splits reuse ``dataset_splits``' content-independent doc_id
    hash, so the partition is reproducible. Output: per contaminated
    train doc, how many distinct grams leak and from how many test docs.

    Scale: grams are DISTINCT-ed per doc before the join, the join key
    is md5(gram) (fixed 32 bytes regardless of n), and the shuffle is
    keyed on the gram hash — no all-pairs anywhere; test-side grams are
    a tiny fraction of the corpus (10% of docs)."""
    n = _DECON_N
    tk = _passage_tokens(engine)
    str_t = "STRING" if engine == "spark" else "VARCHAR"
    h = h28(f"concat('split:', CAST(doc_id AS {str_t}))", engine)
    tokd = f"""tokd AS (
  SELECT doc_id,
         CASE WHEN {h} % 100 < 80 THEN 'train'
              WHEN {h} % 100 < 90 THEN 'val'
              ELSE 'test' END AS split,
         {tk} AS tk
  FROM documents
)"""
    if engine == "spark":
        # r16 gram build (the r15 span template, hash UNCHANGED):
        # tokens posexplode, the n gram members line up as lead()
        # columns over one (doc_id, pos) window, and md5 hashes the
        # same space-joined string as before — identical gh values.
        # The prior in-row form (`transform(sequence, i ->
        # concat_ws(slice(tk,...)))` + explode) ran the whole gram
        # build as interpreted HOFs on the scan's single task:
        # measured 6.6 s of the query's 13.2 s at sf0.1; the window
        # form is whole-stage codegen and its doc_id exchange spreads
        # the hashing across every core. posexplode is OUTER so
        # InferFiltersFromGenerate cannot push an inferred size()
        # predicate into the scan (the neardup_bucket_claims
        # pathology); a doc shorter than n tokens yields no row with
        # l{last} non-null — exactly the old `array()` branch.
        leads = ",\n         ".join(
            f"lead(tok, {j}) OVER w AS l{j}" for j in range(1, n)
        )
        gram_args = ", ".join(["tok"] + [f"l{j}" for j in range(1, n)])
        body = f"""gpos AS (
  SELECT doc_id, split, pos, tok
  FROM (SELECT doc_id, split, tk FROM tokd WHERE split IN ('train', 'test')) _gd
  LATERAL VIEW OUTER posexplode(tk) _pe AS pos, tok
),
gled AS (
  SELECT doc_id, split, tok,
         {leads}
  FROM gpos
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
grams AS (
  SELECT DISTINCT doc_id, split, md5(concat_ws(' ', {gram_args})) AS gh
  FROM gled WHERE l{n - 1} IS NOT NULL
)"""
        return f"""
WITH {tokd},
{body}
{_decontaminate_tail('grams')}"""
    grams = (
        f"CASE WHEN len(tk) < {n} THEN [] "
        f"ELSE list_transform(range(len(tk) - {n} + 1), "
        f"i -> array_to_string(tk[i + 1 : i + {n}], ' ')) END"
    )
    gram_src = (
        "SELECT DISTINCT doc_id, split, gh FROM "
        "(SELECT doc_id, split, md5(unnest(grams)) AS gh FROM gramd)"
    )
    return f"""
WITH {tokd},
gramd AS (SELECT doc_id, split, {grams} AS grams FROM tokd WHERE split IN ('train', 'test')),
grams AS ({gram_src})
{_decontaminate_tail('grams')}"""


def _decontaminate_grams_sql(engine: str) -> str:
    """Just the (doc_id, split, gh) distinct-gram relation from
    ``_decontaminate_sql`` — the prefix the Spark path materializes
    once (see ``benchmark_decontaminate``)."""
    full = _decontaminate_sql(engine)
    return full[: full.index("\nSELECT t.doc_id")] + "\nSELECT * FROM grams"


def _decontaminate_tail(rel: str) -> str:
    return f"""SELECT t.doc_id AS doc_id,
       count(DISTINCT t.gh) AS n_contaminated_grams,
       count(DISTINCT e.doc_id) AS n_test_docs
FROM {rel} t JOIN {rel} e ON t.gh = e.gh AND t.split = 'train' AND e.split = 'test'
GROUP BY t.doc_id
"""


@register("benchmark_decontaminate", oracle=_decontaminate_sql("duckdb"), tags=("pipeline", "dedup"))
def benchmark_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r16: the self-join references the distinct-gram relation twice
    # with DISJOINT split filters, so the CTE inlines the whole
    # tokenize → HOF gram build → md5 → DISTINCT chain once per side
    # and nothing is exchange-reusable at runtime (different pushed
    # predicates ⇒ different subtrees). Materialize the grams ONCE per
    # call (localCheckpoint inside the timed call — the semdedup
    # pattern; recomputed from parquet every invocation) and self-join
    # the materialized relation. Oracle string unchanged.
    load_table(spark, "documents", sf_dir).createOrReplaceTempView("documents")
    _materialize_once(
        spark.sql(_decontaminate_grams_sql("spark")), "decon_grams"
    ).createOrReplaceTempView("decon_grams")
    return spark.sql(_decontaminate_tail("decon_grams"))


_set_doc("benchmark_decontaminate", _decontaminate_sql.__doc__)


# ---------------------------------------------------------------------------
# Distributed PCA over embeddings (operators.pca)
# ---------------------------------------------------------------------------


_GRAM_ORACLE = """
WITH q AS (
  SELECT vec_id,
         CAST(i - 1 AS BIGINT) AS i,
         CAST(floor(CAST(u AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS x
  FROM (
    SELECT vec_id,
           unnest(embedding) AS u,
           generate_subscripts(embedding, 1) AS i
    FROM embeddings
  )
)
SELECT a.i AS i, b.i AS j, CAST(sum(a.x * b.x) AS BIGINT) AS v
FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.i <= b.i
GROUP BY a.i, b.i
"""


_EMB_DIM_CACHE: dict[tuple, int] = {}


def _embedding_dim(spark: SparkSession, sf_dir: str) -> int:
    """Embedding width, probed from ONE row and cached per (session,
    dir) — the driver regenerates the testdata between rounds, so
    nothing hardcodes the current 64; the DuckDB oracles are already
    dimension-agnostic (generate_subscripts / unnest)."""
    key = (spark, sf_dir)
    if key not in _EMB_DIM_CACHE:
        row = load_table(spark, "embeddings", sf_dir).select(
            F.size("embedding").alias("d")
        ).head()
        _EMB_DIM_CACHE[key] = int(row.d)
    return _EMB_DIM_CACHE[key]


@register("embedding_gram_upper", oracle=_GRAM_ORACLE, tags=("pipeline", "embedding", "pca"))
def embedding_gram_upper(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper triangle of the corpus Gram matrix over integer-quantized
    embeddings (``floor(x*1000 + 0.5)`` in float64 — the exact
    quantization ``operators/pca.py`` feeds its covariance). This is the
    externally-checkable half of the PCA pipeline: the Gram/covariance
    accumulation is exact integer arithmetic (oracle-able in ANSI SQL),
    while the eigendecomposition + projection stay covered by the local
    numpy-parity test (``tests/test_properties.py``), which is not
    SQL-expressible.

    Scale: the mapInPandas partial emits ONE row per task (d + d^2
    integers); the merge shuffles O(tasks * d^2) values and the result
    is d(d+1)/2 = 2080 rows regardless of corpus size.
    """
    from flink_wsr_project_spark.operators.pca import gram_partials

    emb = load_table(spark, "embeddings", sf_dir)
    d = _embedding_dim(spark, sf_dir)
    parts = gram_partials(emb, "embedding", d)
    merged = (
        parts.select(F.posexplode("gram").alias("pos", "v"))
        .groupBy("pos")
        .agg(F.sum("v").alias("v"))
    )
    return (
        merged.select(
            (F.col("pos") / d).cast("long").alias("i"),
            (F.col("pos") % d).cast("long").alias("j"),
            "v",
        )
        .filter(F.col("i") <= F.col("j"))
    )


def _pca_oracle() -> str:
    # d=64 is the testdata embedding width; a different corpus would
    # need the oracle re-emitted for its d (the Spark side reads the
    # width from the data and would diverge loudly, not silently)
    from flink_wsr_project_spark.operators.pca import pca_power_oracle_sql

    return pca_power_oracle_sql(64)


@register(
    "embedding_pca_project",
    oracle=_pca_oracle(),
    tags=("pipeline", "embedding", "pca"),
)
def embedding_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every embedding projected onto the corpus's top-2 principal
    components — the dimensionality-reduction / visualization /
    whitening primitive of an embedding pipeline. Data never moves:
    per-task integer-scaled Gram partials (one row per task), an
    O(d^2)-group merge, a driver-side deterministic POWER ITERATION
    (r15 — replaced eigh, which no SQL engine can reproduce
    bit-for-bit), then a codegen'd zip_with projection. Every
    iteration op is either exact int64 arithmetic or a single IEEE
    double op, so the DuckDB oracle — the same 24 rounds unrolled as
    CTEs with Gram-Schmidt deflation and sign canonicalization
    (largest-|coordinate| positive, smallest index on ties) — lands on
    bit-identical components (operators/pca.py documents the full
    argument and the overflow budget). Output is integer micros (the
    house hashing discipline). tests/test_properties.py additionally
    pins the components against numpy eigh directionally (|cos| ≈ 1)
    and the covariance bit-exactly."""
    from flink_wsr_project_spark.operators.pca import pca_project_deterministic

    emb = load_table(spark, "embeddings", sf_dir)
    out = pca_project_deterministic(emb, "embedding", d=_embedding_dim(spark, sf_dir))
    return out.select(
        "vec_id",
        "label",
        F.expr("CAST(floor(pc1 * 1000000 + 0.5) AS BIGINT)").alias("pc1_micro"),
        F.expr("CAST(floor(pc2 * 1000000 + 0.5) AS BIGINT)").alias("pc2_micro"),
    )




# ---------------------------------------------------------------------------
# Importance resampling to a uniform source mix
# ---------------------------------------------------------------------------


def _mix_resample_sql(engine: str) -> str:
    """Deterministic importance resampling toward a UNIFORM per-source
    token mix: each source's acceptance probability is
    min(1, target_share / actual_share) in ppm (integer, floored), and
    a document is kept iff a content-independent hash of its doc_id
    falls under the source's acceptance threshold — the downsampling
    step that turns ``data_mix_weights``' diagnosis into an actual
    curated corpus, reproducible on any cluster/partitioning.

    Scale: two scans of per-doc token counts (one for shares, one for
    selection) joined on the tiny per-source table — broadcast join,
    no row-level shuffle; the decision itself is row-local hashing."""
    wt = toks_expr("text", engine)
    ln = "size" if engine == "spark" else "len"
    str_t = "STRING" if engine == "spark" else "VARCHAR"
    h = h28(f"concat('mix:', CAST(doc_id AS {str_t}))", engine)
    return f"""
WITH d AS (SELECT doc_id, source, {ln}({wt}) AS n_tok FROM documents),
shares AS (
  SELECT source, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens
  FROM d GROUP BY source
),
tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total, count(*) AS n_sources FROM shares),
p AS (
  SELECT s.source, s.n_docs, s.n_tokens,
         LEAST(1000000, CAST(floor(t.total * 1000000.0 / t.n_sources / s.n_tokens) AS BIGINT))
           AS accept_ppm
  FROM shares s CROSS JOIN tot t
)
SELECT d.source AS source,
       p.accept_ppm AS accept_ppm,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN {h} % 1000000 < p.accept_ppm THEN 1 ELSE 0 END) AS BIGINT)
         AS n_docs_kept,
       CAST(sum(d.n_tok) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN {h} % 1000000 < p.accept_ppm THEN d.n_tok ELSE 0 END) AS BIGINT)
         AS n_tokens_kept
FROM d JOIN p ON d.source = p.source
GROUP BY d.source, p.accept_ppm
"""


@register("mix_resample", oracle=_mix_resample_sql("duckdb"), tags=("pipeline", "sampling"))
def mix_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, "documents", sf_dir).createOrReplaceTempView("documents")
    return spark.sql(_mix_resample_sql("spark"))


_set_doc("mix_resample", _mix_resample_sql.__doc__)


# ---------------------------------------------------------------------------
# Curriculum ordering: global rank without a single-task window
# ---------------------------------------------------------------------------

_CURRICULUM_BUCKET = 500  # milli-units of chars-per-token per coarse bucket


_CURRICULUM_ORACLE = """
WITH scored AS (
  SELECT doc_id,
         CAST(floor(length(text) * 1000.0
              / len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT) AS score_milli
  FROM documents
)
SELECT doc_id, score_milli,
       CAST(row_number() OVER (ORDER BY score_milli, doc_id) AS BIGINT) AS global_rank
FROM scored
"""


@register("curriculum_order", oracle=_CURRICULUM_ORACLE, tags=("pipeline", "sampling", "ordering"))
def curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic curriculum: every document gets a GLOBAL training
    order (ascending chars-per-token milli-score, doc_id tie-break).

    The naive plan — ``row_number() OVER (ORDER BY ...)`` with no
    partition — moves the whole corpus through ONE task and is banned
    by tests/test_plans.py::test_no_unpartitioned_window. The scale
    pattern used instead is two-phase global numbering:

    1. rank WITHIN coarse score buckets (window partitioned by bucket —
       parallel, each bucket a slice of the score range);
    2. add each bucket's global offset, computed from the per-bucket
       counts (|buckets| rows — driver-side cumulative sum, broadcast
       back as a literal CASE map).

    Identical output to the single-task window (the oracle IS that
    window in DuckDB), but every stage is partition-parallel: this is
    how a 100 TB corpus gets a total training order.
    """
    docs = load_table(spark, "documents", sf_dir)
    scored = docs.select(
        "doc_id",
        F.floor(
            F.length("text") * 1000.0 / F.size(F.split(F.trim(F.col("text")), r"\s+"))
        ).cast("long").alias("score_milli"),
    ).withColumn("bucket", (F.col("score_milli") / _CURRICULUM_BUCKET).cast("long"))
    counts = sorted(
        (r.bucket, r.n)
        for r in scored.groupBy("bucket").agg(F.count("*").alias("n")).collect()
    )
    offsets, acc = {}, 0
    for b, n in counts:
        offsets[b] = acc
        acc += n
    offset_expr = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    )[F.col("bucket")]
    w = Window.partitionBy("bucket").orderBy("score_milli", "doc_id")
    return scored.select(
        "doc_id",
        "score_milli",
        (F.row_number().over(w) + offset_expr).cast("long").alias("global_rank"),
    )



# ---------------------------------------------------------------------------
# Hashing-trick featurization (text -> fixed-width integer vector)
# ---------------------------------------------------------------------------

_HASH_DIMS = 16


def _hash_features_sql(engine: str) -> str:
    """Hashing-trick bag-of-words: each token increments dimension
    ``h28(token) % {d}`` of a fixed {d}-wide integer count vector — the
    collision-accepting featurization (Weinberger et al.) that turns
    raw text into the vectors the clustering / ANN stack consumes, with
    no vocabulary to build or broadcast. Emitted long-form (doc_id,
    dim, cnt), zero dims omitted; exact integers, so the oracle is
    bit-for-bit.

    Scale: tokenize + hash are row-local; the one shuffle is the
    (doc_id, dim) count — and because dims per doc <= {d}, the
    output is bounded by {d} x docs regardless of document length."""
    d = _HASH_DIMS
    tk = _passage_tokens(engine)
    h = h28("tok", engine)
    if engine == "spark":
        expl = "SELECT doc_id, explode(tk) AS tok FROM tokd"
    else:
        expl = "SELECT doc_id, unnest(tk) AS tok FROM tokd"
    return f"""
WITH tokd AS (SELECT doc_id, {tk} AS tk FROM documents),
toks AS ({expl})
SELECT doc_id, CAST({h} % {d} AS BIGINT) AS dim, count(*) AS cnt
FROM toks
GROUP BY doc_id, {h} % {d}
"""


@register("doc_hash_features", oracle=_hash_features_sql("duckdb"), tags=("pipeline", "text", "embedding"))
def doc_hash_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, "documents", sf_dir).createOrReplaceTempView("documents")
    return spark.sql(_hash_features_sql("spark"))


_set_doc("doc_hash_features", _hash_features_sql.__doc__.format(d=_HASH_DIMS))



# ---------------------------------------------------------------------------
# Shard manifest: balanced training-file assignment
# ---------------------------------------------------------------------------

_N_SHARDS = 16
_SHARD_BUCKET = 50  # tokens per coarse rank bucket


_SHARD_ORACLE = f"""
WITH scored AS (
  SELECT doc_id,
         len(regexp_split_to_array(trim(text), '\\s+')) AS n_tok
  FROM documents
),
ranked AS (
  SELECT doc_id, n_tok,
         row_number() OVER (ORDER BY n_tok DESC, doc_id) AS rn
  FROM scored
)
SELECT CAST((rn - 1) % {_N_SHARDS} AS BIGINT) AS shard,
       count(*) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS total_tokens
FROM ranked GROUP BY 1
"""


@register("shard_manifest", oracle=_SHARD_ORACLE, tags=("pipeline", "sampling", "ordering"))
def shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced shard assignment for training-file output: documents
    sorted by token count (descending, doc_id tie-break) are dealt
    round-robin over {n} shards — the longest-first deal keeps every
    shard's token total within one document of the others, and the
    assignment is a pure function of the corpus (reproducible).

    Same scale pattern as ``curriculum_order``: the global rank that
    drives the deal comes from a bucket-partitioned window plus
    driver-computed bucket offsets (|buckets| scalars) — no
    single-task window anywhere, identical output to the oracle's
    global ORDER BY row_number.
    """
    docs = load_table(spark, "documents", sf_dir)
    scored = docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("n_tok"),
    ).withColumn("bucket", (F.col("n_tok") / _SHARD_BUCKET).cast("long"))
    counts = sorted(
        ((r.bucket, r.n) for r in scored.groupBy("bucket").agg(F.count("*").alias("n")).collect()),
        reverse=True,  # descending n_tok order -> descending buckets first
    )
    offsets, acc = {}, 0
    for b, n in counts:
        offsets[b] = acc
        acc += n
    offset_expr = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    )[F.col("bucket")]
    w = Window.partitionBy("bucket").orderBy(F.col("n_tok").desc(), "doc_id")
    ranked = scored.withColumn("rn", F.row_number().over(w) + offset_expr)
    return (
        ranked.groupBy(((F.col("rn") - 1) % _N_SHARDS).cast("long").alias("shard"))
        .agg(F.count("*").alias("n_docs"), F.sum("n_tok").alias("total_tokens"))
    )


shard_manifest.__doc__ = shard_manifest.__doc__.format(n=_N_SHARDS)
_set_doc("shard_manifest", shard_manifest.__doc__)


# ---------------------------------------------------------------------------
# K-means clustering over embeddings (iterative, exact integers)
# ---------------------------------------------------------------------------

_KM_K = 8
_KM_ASSIGNS = 5  # assignment passes; centroids update between passes


def _kmeans_assign_ctes() -> tuple[str, str]:
    """The kmeans oracle's CTE chain, reusable by downstream oracles
    (SemDeDup blocks on the learned clusters): returns the
    comma-joined CTE list and the name of the final assignment
    relation (columns ``vec_id, cid``). ``_kmeans_oracle`` composes
    the exact original string from these, so the registered
    ``embedding_kmeans`` oracle is byte-identical to pre-refactor."""
    k, n_assign = _KM_K, _KM_ASSIGNS
    parts = [
        """q AS (
  SELECT vec_id,
         CAST(i - 1 AS BIGINT) AS dim,
         CAST(floor(CAST(u AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS x
  FROM (
    SELECT vec_id, unnest(embedding) AS u, generate_subscripts(embedding, 1) AS i
    FROM embeddings
  )
)""",
        f"""seeds AS (
  SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid
  FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {k})
)""",
        "c0 AS (SELECT s.cid, q.dim, q.x AS c FROM seeds s JOIN q ON q.vec_id = s.vec_id)",
    ]
    for i in range(1, n_assign + 1):
        parts.append(
            f"""a{i} AS (
  SELECT vec_id, cid FROM (
    SELECT q.vec_id, c.cid,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY sum((q.x - c.c) * (q.x - c.c)), c.cid
           ) AS rn
    FROM q JOIN c{i - 1} c ON q.dim = c.dim
    GROUP BY q.vec_id, c.cid
  ) WHERE rn = 1
)"""
        )
        if i < n_assign:
            parts.append(
                f"""c{i} AS (
  SELECT a.cid, q.dim, CAST(floor(sum(q.x) * 1.0 / count(*)) AS BIGINT) AS c
  FROM a{i} a JOIN q ON q.vec_id = a.vec_id
  GROUP BY a.cid, q.dim
)"""
            )
    return ",\n".join(parts), f"a{n_assign}"


def _kmeans_oracle() -> str:
    """DuckDB oracle: the SAME Lloyd iterations fully unrolled as
    chained CTEs with identical integer arithmetic — embeddings
    quantized to milli-units (floor(x*1000+0.5), float64), distances
    are exact int64 sums of squares, centroid updates floor the mean
    back to milli-units, ties in assignment break to the smallest
    centroid id. Bit-exact across engines, like the pagerank oracle."""
    ctes, final = _kmeans_assign_ctes()
    return "WITH " + ctes + f"\nSELECT vec_id, cid AS cluster_id FROM {final}"


@register("embedding_kmeans", oracle=_kmeans_oracle(), tags=("pipeline", "embedding", "iterative"))
def embedding_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means (k={k}, {n} assignment passes) over integer-quantized
    embeddings — the corpus-clustering primitive behind data-mix
    curation and IVF coarse quantizers.

    Spark-first iteration shape: centroids are O(k*d) scalars, so they
    live on the DRIVER and enter each assignment pass as literal arrays
    inside a codegen'd ``aggregate(zip_with(...))`` distance fold — the
    data never shuffles for assignment (embarrassingly parallel scan).
    The update step is one (cid, dim) aggregate per pass: posexplode to
    (cid, dim, x), map-side partial sums, k*d scalars back to
    the driver. At 100 TB the same loop holds: per-pass cost is one
    scan + one k*d-group aggregate, with no growing lineage (each pass
    plans against the base scan with fresh literals). Exact integer
    arithmetic end to end — see the oracle docstring.
    """
    k, n_assign = _KM_K, _KM_ASSIGNS
    emb = load_table(spark, "embeddings", sf_dir)
    q = emb.select(
        "vec_id",
        F.expr(
            "transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE) * 1000 + 0.5) AS BIGINT))"
        ).alias("q"),
    )
    seeds = [
        (i, list(r.q))
        for i, r in enumerate(q.orderBy("vec_id").limit(k).collect())
    ]
    # r17: the embedding width falls out of the seed vectors — the
    # separate one-row _embedding_dim probe job is gone (guide §5
    # driver discipline; the dim cache still serves the PCA queries).
    d = len(seeds[0][1]) if seeds else 0
    cents: list[tuple[int, list[int]]] = seeds  # [(cid, vector)] sorted by cid

    def assign(cents):
        dist_exprs = []
        for _, vec in cents:
            arr = "array(" + ",".join(f"{int(v)}L" for v in vec) + ")"
            dist_exprs.append(
                f"aggregate(zip_with(q, {arr}, (a, b) -> (a - b) * (a - b)), 0L, (s, x) -> s + x)"
            )
        dists = "array(" + ",".join(dist_exprs) + ")"
        # Two-step projection so the k distance folds evaluate ONCE per
        # row: as a single `array_position(dists, array_min(dists))`
        # expression the dists array (k aggregate/zip_with folds, all
        # CodegenFallback) is inlined — and therefore EVALUATED — twice
        # per row, and the k·d centroid literals appear twice in every
        # plan that embeds the assignment. CollapseProject keeps the
        # split because the alias is non-cheap and referenced twice.
        # array_position returns the FIRST index of the min -> ties break
        # to the smallest centroid id (cents is sorted by cid).
        return (
            q.withColumn("dists", F.expr(dists))
            .withColumn(
                "ci",
                (F.expr("array_position(dists, array_min(dists))") - 1).cast("int"),
            )
            .drop("dists")
        )

    assigned = None
    for it in range(n_assign):
        assigned = assign(cents)
        if it < n_assign - 1:
            sums = (
                assigned.select("ci", F.posexplode("q").alias("dim", "x"))
                .groupBy("ci", "dim")
                .agg(F.sum("x").alias("s"), F.count("*").alias("n"))
                .collect()
            )
            by_cid: dict[int, list[int]] = {}
            counts: dict[int, int] = {}
            for r in sums:
                cid = cents[r.ci][0]
                by_cid.setdefault(cid, [0] * d)[r.dim] = r.s
                counts[cid] = r.n
            import math

            cents = sorted(
                (cid, [int(math.floor(v * 1.0 / counts[cid])) for v in vec])
                for cid, vec in by_cid.items()
            )
    cid_arr = "array(" + ",".join(str(c) for c, _ in cents) + ")"
    return assigned.select(
        "vec_id", F.expr(f"CAST({cid_arr}[ci] AS BIGINT)").alias("cluster_id")
    )


embedding_kmeans.__doc__ = embedding_kmeans.__doc__.format(
    k=_KM_K, n=_KM_ASSIGNS
)
_set_doc("embedding_kmeans", embedding_kmeans.__doc__)


# ---------------------------------------------------------------------------
# SemDeDup: semantic dedup blocked by learned k-means clusters
# ---------------------------------------------------------------------------

# Cosine bar for "semantic duplicate" — same τ as the label-blocked
# embedding_cosine_neardup, so the two paths are directly comparable.
_SEMDEDUP_TAU = "0.35"

# Per-cluster pair-enumeration cap. Clusters are the blocking key here,
# and unlike hash buckets they are GUARANTEED to exist at every size up
# to n/k — a skewed corpus (one dense semantic mode) concentrates in
# one cluster and its all-pairs join is that cluster's n², the exact
# degenerate-bucket disease the image/audio/video caps kill. Over-cap
# clusters fall back to exemplar evidence: each member is compared to
# the cluster's min-vec_id exemplar only (O(n) per cluster — the
# published SemDeDup efficiency argument applied as a valve, with the
# cosine verify kept). Default 60 makes BOTH branches execute against
# the 500-vector gate corpora (sf0.001 sizes 52–70, sf0.01 52–74 —
# dead-branch audit discipline); production would run O(1000).
_SEMDEDUP_CLUSTER_CAP = _parse_bucket_cap(os.environ.get("SPARK_GRAFT_SEMDEDUP_CLUSTER_CAP", "60"), "SPARK_GRAFT_SEMDEDUP_CLUSTER_CAP")


def _semdedup_assign_view(spark: SparkSession, sf_dir: str) -> None:
    """Bind the k-means assignment as the ``semdedup_assign`` temp
    view, materialized ONCE per query call via ``localCheckpoint``
    (eager). The semdedup tails reference the assignment up to three
    times (sizes agg, evidence join, final keep/drop join); as a lazy
    view each reference re-plans and re-executes the whole
    centroid-literal distance-fold subtree — the r16 before-plan shows
    the embeddings parquet scanned 7× under one query. Checkpointing
    collapses those to scans of a 2-column (vec_id, cluster_id) RDD
    (measured: keep-list tail 1.0 s → the checkpoint job + a ~0.3 s
    tail; plan 54 → ~30 nodes). Same rows every run — the checkpoint
    is created inside the query call (recomputed from parquet on every
    invocation, nothing persists across runs), the iterative-operator
    precedent of ``operators/iterative.py``. At 100 TB the assignment
    is n rows of two ints — the cheapest relation in the query — and
    materializing it once instead of recomputing the fold 3× is the
    same win, larger."""
    _materialize_once(
        embedding_kmeans(spark, sf_dir), "semdedup_assign"
    ).createOrReplaceTempView("semdedup_assign")


def _semdedup_tail(engine: str, assign_rel: str) -> str:
    """Engine-shared CTE tail: cluster-blocked cosine evidence → keep
    list. ``assign_rel`` is a relation with (vec_id, cluster_id) —
    the Spark side binds the driver-iterated ``embedding_kmeans``
    output as a temp view; the oracle chains the unrolled Lloyd CTEs.

    Within-cap clusters enumerate pairs (a.vec_id < b.vec_id, cosine
    ≥ τ ⇒ b dropped); over-cap clusters compare members to the
    exemplar (min vec_id) only. The cap is STRUCTURAL, not a
    post-filter: the pair join's left side keeps only within-cap
    members plus over-cap exemplars (``lhs``), so an over-cap cluster
    enumerates n_c candidates, never n_c² — the valve prunes BEFORE
    the join. Cosine is the bit-exact left-fold of
    operators.similarity, so both engines agree to the last ulp."""
    return f"""{_semdedup_pairs_ctes(engine, assign_rel)},
drops AS (SELECT DISTINCT hi AS vec_id FROM sem_pairs)
SELECT s.vec_id, CAST(s.cluster_id AS BIGINT) AS cluster_id,
       CASE WHEN d.vec_id IS NULL THEN 'keep' ELSE 'drop' END AS action
FROM {assign_rel} s LEFT JOIN drops d ON d.vec_id = s.vec_id"""


def _semdedup_pairs_ctes(engine: str, assign_rel: str) -> str:
    """The cap-aware SemDeDup evidence-pair CTE chain (sizes → j →
    lhs → sem_pairs of (lo, hi), lo claiming hi) — shared by the
    keep-list tail and the label-agreement diagnostic so the two
    cannot drift.

    Spark side (r16): ``j`` carries a per-row self-dot ``nd`` so the
    pair join folds only the cross dot (``cosine_prenorm_expr``);
    the oracle string is unchanged."""
    cap, tau = _SEMDEDUP_CLUSTER_CAP, _SEMDEDUP_TAU
    if engine == "spark":
        nd = dot_expr("e.embedding", "e.embedding", "spark")
        cos = cosine_prenorm_expr("a.embedding", "b.embedding", "a.nd", "b.nd", "spark")
        j_cols = f"e.vec_id, s.cluster_id, e.embedding, {nd} AS nd, z.n, z.exemplar"
    else:
        cos = cosine_expr("a.embedding", "b.embedding", engine)
        j_cols = "e.vec_id, s.cluster_id, e.embedding, z.n, z.exemplar"
    return f"""sizes AS (
  SELECT cluster_id, count(*) AS n, min(vec_id) AS exemplar
  FROM {assign_rel} GROUP BY cluster_id
),
j AS (
  SELECT {j_cols}
  FROM embeddings e
  JOIN {assign_rel} s ON e.vec_id = s.vec_id
  JOIN sizes z ON z.cluster_id = s.cluster_id
),
lhs AS (SELECT * FROM j WHERE n <= {cap} OR vec_id = exemplar),
sem_pairs AS (
  SELECT a.vec_id AS lo, b.vec_id AS hi
  FROM lhs a
  JOIN j b ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
  WHERE {cos} >= {tau}
)"""


def _semdedup_oracle() -> str:
    ctes, final = _kmeans_assign_ctes()
    return (
        "WITH " + ctes + ",\n"
        f"assign AS (SELECT vec_id, cid AS cluster_id FROM {final}),\n"
        + _semdedup_tail("duckdb", "assign")
    )


@register(
    "semdedup_keep_list",
    oracle=_semdedup_oracle(),
    tags=("pipeline", "dedup", "embedding", "similarity"),
)
def semdedup_keep_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup
    where the blocking key is a LEARNED k-means cluster instead of a
    given label — the scale path when no label exists. A vector is
    dropped iff a lower-vec_id vector in the SAME cluster has cosine
    ≥ {tau}; clusters over {cap} members use exemplar evidence only
    (see ``_semdedup_tail``).

    100 TB shape: assignment is the ``embedding_kmeans`` loop
    (scan-only passes, centroids as literals, k·d driver scalars);
    the evidence join is cluster-blocked — Σ n_c² within-cap, O(n_c)
    over-cap — never O(n²). k scales ∝ corpus so expected cluster
    size is a dial, and the cap is the valve for the skewed tail.
    The oracle unrolls the identical Lloyd iterations as CTEs
    (exact ints) and the identical cosine fold (bit-exact doubles).
    """
    load_table(spark, "embeddings", sf_dir).createOrReplaceTempView("embeddings")
    _semdedup_assign_view(spark, sf_dir)
    return spark.sql("WITH " + _semdedup_tail("spark", "semdedup_assign"))


semdedup_keep_list.__doc__ = semdedup_keep_list.__doc__.format(
    tau=_SEMDEDUP_TAU, cap=_SEMDEDUP_CLUSTER_CAP
)
_set_doc("semdedup_keep_list", semdedup_keep_list.__doc__)


def _semdedup_skew_sql(engine: str, assign_rel: str) -> str:
    """Per-cluster skew report for the SemDeDup valve — the no-silent-
    cap discipline (every capped query ships its skew observatory):
    cluster size, which evidence branch it routes through, candidates
    actually enumerated, and the pairs the exemplar fallback saved.
    Exact integer arithmetic; n(n-1)/2 via integer division in BOTH
    engines (ADVICE r12: a float divide here would drift from the
    store-side report on very large clusters)."""
    cap = _SEMDEDUP_CLUSTER_CAP
    half = "(n * (n - 1)) // 2" if engine == "duckdb" else "(n * (n - 1)) div 2"
    return f"""sizes AS (
  SELECT cluster_id, count(*) AS n FROM {assign_rel} GROUP BY cluster_id
)
SELECT CAST(cluster_id AS BIGINT) AS cluster_id,
       CAST(n AS BIGINT) AS n_vectors,
       CASE WHEN n <= {cap} THEN 'pairs' ELSE 'exemplar' END AS mode,
       CAST(CASE WHEN n <= {cap} THEN {half} ELSE n - 1 END AS BIGINT) AS candidates,
       CAST(CASE WHEN n <= {cap} THEN 0 ELSE {half} - (n - 1) END AS BIGINT) AS pairs_saved
FROM sizes"""


def _semdedup_skew_oracle() -> str:
    ctes, final = _kmeans_assign_ctes()
    return (
        "WITH " + ctes + ",\n"
        f"assign AS (SELECT vec_id, cid AS cluster_id FROM {final}),\n"
        + _semdedup_skew_sql("duckdb", "assign")
    )


@register(
    "semdedup_cluster_skew",
    oracle=_semdedup_skew_oracle(),
    doc=_semdedup_skew_sql.__doc__,
    tags=("pipeline", "dedup", "embedding"),
)
def semdedup_cluster_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, "embeddings", sf_dir).createOrReplaceTempView("embeddings")
    _semdedup_assign_view(spark, sf_dir)
    return spark.sql("WITH " + _semdedup_skew_sql("spark", "semdedup_assign"))


def _semdedup_agreement_tail(
    engine: str, assign_rel: str, lab_rel: str | None = None
) -> str:
    """Blocking-key A/B for embedding dedup, one row: the pair
    evidence found under the GIVEN label blocking
    (``embedding_cosine_neardup``, cosine ≥ 0.35 within a label)
    vs under the LEARNED k-means cluster blocking (the cap-aware
    ``sem_pairs`` chain — shared CTEs with the keep-list, so this
    diagnostic measures exactly what the decision path uses). Same τ
    on both sides, so the delta is PURELY what each blocking key lets
    the join see — the measurement that justifies (or indicts) a
    blocking choice before a 100 TB run: pairs found only under
    labels are what the learned clusters MISS (cluster-split false
    negatives + over-cap exemplar fallback), pairs found only under
    clusters are what labels miss (cross-label semantic dups).
    Cost: the two member pipelines + one pair-key full-outer join —
    no new all-pairs work.

    ``lab_rel`` (Spark side, r17): a pre-materialized (lo, hi) label
    pair relation; the label-blocked pair join is INDEPENDENT of the
    k-means construction's driver-iterated jobs, so the query builder
    materializes both members concurrently (guide §2.6) instead of
    serializing ~2 s of pair-fold behind ~1.5 s of k-means jobs. The
    oracle composes with ``lab_rel=None`` — string unchanged."""
    if lab_rel is not None:
        lab_pairs = f"SELECT lo, hi FROM {lab_rel}"
    else:
        lab_pairs = (
            f"SELECT vec_a AS lo, vec_b AS hi FROM ({_embedding_neardup_sql(engine)})"
        )
    return f"""{_semdedup_pairs_ctes(engine, assign_rel)},
lab_pairs AS ({lab_pairs}),
joined AS (
  SELECT CASE WHEN s.lo IS NOT NULL THEN 1 ELSE 0 END AS in_cluster,
         CASE WHEN l.lo IS NOT NULL THEN 1 ELSE 0 END AS in_label
  FROM sem_pairs s FULL OUTER JOIN lab_pairs l ON s.lo = l.lo AND s.hi = l.hi
)
SELECT CAST(sum(in_cluster) AS BIGINT) AS n_cluster_pairs,
       CAST(sum(in_label) AS BIGINT) AS n_label_pairs,
       CAST(sum(in_cluster * in_label) AS BIGINT) AS n_both
FROM joined"""


def _semdedup_agreement_oracle() -> str:
    ctes, final = _kmeans_assign_ctes()
    return (
        "WITH " + ctes + ",\n"
        f"assign AS (SELECT vec_id, cid AS cluster_id FROM {final}),\n"
        + _semdedup_agreement_tail("duckdb", "assign")
    )


@register(
    "semdedup_label_agreement",
    oracle=_semdedup_agreement_oracle(),
    doc=_semdedup_agreement_tail.__doc__,
    tags=("pipeline", "dedup", "embedding", "similarity"),
)
def semdedup_label_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, "embeddings", sf_dir).createOrReplaceTempView("embeddings")
    # r17 (guide §2.6): the label-blocked pair evidence and the k-means
    # assignment are independent member pipelines — materialize them
    # concurrently so the pair-join fold fills the idle slots of the
    # construction's serial driver jobs.
    _run_view_builders(
        spark,
        {
            "semdedup_assign": lambda: _materialize_once(
                embedding_kmeans(spark, sf_dir), "semdedup_assign"
            ),
            "_sem_lab": lambda: _materialize_once(
                spark.sql(
                    "SELECT vec_a AS lo, vec_b AS hi FROM ("
                    + _embedding_neardup_sql("spark")
                    + ")"
                ),
                "_sem_lab",
            ),
        },
    )
    return spark.sql(
        "WITH " + _semdedup_agreement_tail("spark", "semdedup_assign", "_sem_lab")
    )


# ---------------------------------------------------------------------------
# PageRank over the near-dup graph (iterative algorithm, exact integers)
# ---------------------------------------------------------------------------

_PR_ITERS = 10
_PR_INIT_US = 1_000_000  # per-node mass in micro-units


def _pagerank_edges_sql(engine: str) -> str:
    """Undirected near-dup edges (LSH-verified Jaccard >= 0.5), both
    directions."""
    pairs = _dedup_minhash_lsh_sql(engine)
    return f"""
WITH pairs AS ({pairs})
SELECT doc_a AS a, doc_b AS b FROM pairs WHERE jaccard >= 0.5
UNION
SELECT doc_b AS a, doc_a AS b FROM pairs WHERE jaccard >= 0.5
"""


def _pagerank_oracle() -> str:
    """DuckDB oracle: the SAME 10 iterations, fully unrolled as chained
    CTEs with identical integer arithmetic (floor division everywhere),
    so both engines are bit-exact — no float tolerance, no recursion."""
    edges = _pagerank_edges_sql("duckdb")
    # AS MATERIALIZED: DuckDB would otherwise inline the edges CTE (the
    # whole LSH pipeline) at each of its ~20 uses across the unrolled
    # iterations — hundreds of redundant scans.
    parts = [
        f"edges AS MATERIALIZED ({edges})",
        "outdeg AS MATERIALIZED (SELECT a, count(*) AS outdeg FROM edges GROUP BY a)",
        "nn AS MATERIALIZED (SELECT count(*) AS n FROM documents)",
        f"iter0 AS MATERIALIZED (SELECT doc_id, CAST({_PR_INIT_US} AS BIGINT) AS rank_us FROM documents)",
    ]
    for k in range(1, _PR_ITERS + 1):
        prev = f"iter{k - 1}"
        parts.append(f"""iter{k} AS MATERIALIZED (
  SELECT d.doc_id,
         CAST(150000 + (85 * (COALESCE(inc.s, 0) +
              (SELECT COALESCE(SUM(r.rank_us), 0) FROM {prev} r
               LEFT JOIN outdeg od ON r.doc_id = od.a WHERE od.a IS NULL)
              // (SELECT n FROM nn))) // 100 AS BIGINT) AS rank_us
  FROM documents d
  LEFT JOIN (
    SELECT e.b, SUM(r.rank_us // od.outdeg) AS s
    FROM edges e
    JOIN {prev} r ON e.a = r.doc_id
    JOIN outdeg od ON od.a = e.a
    GROUP BY e.b
  ) inc ON inc.b = d.doc_id
)""")
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT doc_id, rank_us FROM iter{_PR_ITERS}"
    )


@register("doc_pagerank", oracle=_pagerank_oracle(), tags=("pipeline", "graph", "iterative"))
def doc_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (damping 0.85, 10 iterations) over the LSH near-dup
    graph — the canonical iterative join-aggregate algorithm, with the
    house determinism rule applied to an ITERATIVE computation: ranks
    live in integer micro-units and every division floors, so partial
    sums are associative and the result is bit-identical on any
    partitioning AND matches the DuckDB oracle (the same 10 iterations
    unrolled as chained CTEs) exactly. Flooring leaks < outdeg micro-
    units per node per iteration — bounded and deterministic, unlike
    float summation order.

    Scale: each iteration is one equi-join on the edge source + one
    groupBy on the destination (both shuffle on doc_id), a broadcast of
    the new ranks' lineage truncated by localCheckpoint (checkpoint to
    durable storage on a real cluster). The only driver values are the
    dangling-mass scalar and the node count — O(1) per iteration, like
    dedup_components' convergence sum."""
    docs = load_table(spark, "documents", sf_dir)
    docs.createOrReplaceTempView("documents")
    edges = spark.sql(_pagerank_edges_sql("spark")).cache()
    outdeg = edges.groupBy("a").agg(F.count("*").alias("outdeg"))
    edges_deg = edges.join(outdeg, "a").select("a", "b", "outdeg").cache()
    # r16: ONE action per iteration instead of two. The dangling mass
    # used to be a separate collect per round (left-anti join + agg —
    # 10 extra driver jobs); the dangling SET is fixed, so it is now a
    # precomputed boolean carried on the checkpointed frame, and the
    # per-round scalar enters the update as a 1-row cross-joined
    # aggregate inside the SAME job that materializes the new ranks.
    # Arithmetic is identical: coalesce(sum,0) div n on non-negative
    # longs is the Python `// n_docs` the driver computed (parity-
    # pinned vs the unchanged oracle).
    # r17: the node count rides the initial checkpoint as an observe()
    # metric (one row per doc by construction) instead of a separate
    # docs.count() job — the min_label_propagation treatment.
    from pyspark.sql import Observation

    obs0 = Observation()
    ranks, ranks_ids = local_checkpoint_tracked(
        docs.select("doc_id")
        .join(outdeg, F.col("doc_id") == outdeg.a, "left")
        .select(
            "doc_id",
            F.lit(_PR_INIT_US).cast("long").alias("rank_us"),
            F.col("outdeg").isNull().alias("dang"),
        )
        .observe(obs0, F.count(F.lit(1)).alias("n"))
    )
    n_docs = obs0.get["n"]
    for _ in range(_PR_ITERS):
        share_df = ranks.where("dang").agg(
            F.expr(f"coalesce(sum(rank_us), 0L) div {n_docs}").alias("share")
        )
        inc = (
            edges_deg.join(ranks, edges_deg.a == ranks.doc_id)
            .select("b", F.expr("rank_us div outdeg").alias("c"))
            .groupBy("b")
            .agg(F.sum("c").alias("s"))
        )
        new_ranks, new_ids = local_checkpoint_tracked(
            ranks.select("doc_id", "dang")
            .join(inc, F.col("doc_id") == inc.b, "left")
            .crossJoin(share_df)
            .select(
                "doc_id",
                F.expr(
                    "CAST(150000 + (85 * (COALESCE(s, 0) + share)) div 100 AS BIGINT)"
                ).alias("rank_us"),
                "dang",
            )
        )
        # Same O(rounds × |frame|) block-release discipline as
        # min_label_propagation above.
        release_persistent_rdds(spark, ranks_ids)
        ranks, ranks_ids = new_ranks, new_ids
    edges.unpersist()
    edges_deg.unpersist()
    return ranks.select("doc_id", "rank_us")


# ---------------------------------------------------------------------------
# Triangle counting over the near-dup graph (oriented two-path + closure)
# ---------------------------------------------------------------------------


def _triangle_sql(engine: str) -> str:
    """Per-document triangle support in the LSH near-dup graph.

    Classic distributed triangle enumeration: edges are ORIENTED
    doc_a < doc_b (the LSH pair convention), so each triangle
    a<b<c is generated exactly once as the two-path (a->b, b->c)
    closed by the edge (a->c) — two equi-joins on node ids, no
    direction dedup, no double counting. At 100 TB scale the two-path
    join's skew is bounded by the max near-dup cluster degree; the
    standard refinement (orient by degree, not id) drops in without
    changing the closure join."""
    pairs = _dedup_minhash_lsh_sql(engine)
    return f"""
WITH pairs AS ({pairs}),
e AS (SELECT doc_a AS a, doc_b AS b FROM pairs WHERE jaccard >= 0.5),
tri AS (
  SELECT e1.a AS a, e1.b AS b, e2.b AS c
  FROM e e1
  JOIN e e2 ON e1.b = e2.a
  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
)
SELECT doc_id, count(*) AS n_triangles FROM (
  SELECT a AS doc_id FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
) GROUP BY doc_id
"""


@register("doc_triangles", oracle=_triangle_sql("duckdb"), tags=("pipeline", "graph"))
def doc_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, "documents", sf_dir).createOrReplaceTempView("documents")
    return spark.sql(_triangle_sql("spark"))


# ---------------------------------------------------------------------------
# TF-IDF: corpus-weighted top terms per document
# ---------------------------------------------------------------------------

_TFIDF_ORACLE = """
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                            x -> x <> '')) AS token
  FROM documents
),
tfc AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2),
dfreq AS (SELECT token, count(*) AS dfq FROM tfc GROUP BY 1),
n AS (SELECT count(*) AS n_docs FROM documents)
SELECT doc_id, token, tf, tfidf, rank FROM (
  SELECT t.doc_id, t.token, t.tf,
         round(t.tf * ln(CAST(n.n_docs AS DOUBLE) / d.dfq), 6) AS tfidf,
         CAST(row_number() OVER (PARTITION BY t.doc_id
              ORDER BY round(t.tf * ln(CAST(n.n_docs AS DOUBLE) / d.dfq), 6) DESC,
                       t.token) AS BIGINT) AS rank
  FROM tfc t JOIN dfreq d ON t.token = d.token CROSS JOIN n
) WHERE rank <= 3
"""


@register("doc_tfidf_topk", oracle=_TFIDF_ORACLE, tags=("pipeline", "text"))
def doc_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document. Tokens stay in-row until ONE
    explode feeds the (doc, token) count; document frequency reuses
    that aggregate (shuffle on token), idf's corpus size is a 1-row
    broadcast, and the per-doc rank partitions by doc_id (bounded
    groups — WindowGroupLimit prunes to 3 per map task). The score is
    rounded to 6 dp BEFORE ranking so both engines rank identical
    values (ln differs in the last ulp across libms)."""
    from flink_wsr_project_spark.operators.topn import topn_per_group

    docs = load_table(spark, "documents", sf_dir)
    toks = F.expr("filter(split(lower(text), '[^a-z0-9]+'), x -> x <> '')")
    tf = (
        docs.select("doc_id", F.explode(toks).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("token").agg(F.count("*").alias("dfq"))
    ndocs = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(ndocs))
        .select(
            "doc_id",
            "token",
            "tf",
            F.round(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("dfq")), 6
            ).alias("tfidf"),
        )
    )
    return topn_per_group(
        scored, ["doc_id"], "tfidf", 3, tiebreakers=["token"]
    ).select("doc_id", "token", "tf", "tfidf", "rank")


# ---------------------------------------------------------------------------
# PII scrubbing (regex redaction with per-class counts)
# ---------------------------------------------------------------------------

# Patterns avoid backslash classes ([0-9], not \d) so the SAME string is a
# valid Java regex (Spark) and RE2 regex (DuckDB) with no escape divergence.
_PII_EMAIL = "[a-z0-9.]+@[a-z0-9.-]+"
_PII_PHONE = "555-[0-9]{4}"
_PII_IP = "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"


def _pii_scrub_sql(engine: str) -> str:
    """Synthetic PII (email/phone/IPv4 derived from doc_id) is appended
    to each document, then redacted class-by-class; counts come from
    ``regexp_extract_all`` lengths and the scrubbed text is
    fingerprinted. Redaction order matters (emails contain dots like
    IPs) — both engines apply email → phone → ip."""
    n = "len" if engine == "duckdb" else "size"
    g = ", 'g'" if engine == "duckdb" else ""
    # Spark's regexp_extract_all defaults to capture group 1; group 0 is
    # the whole match (DuckDB's default).
    g0 = "" if engine == "duckdb" else ", 0"
    contaminated = (
        "text || ' contact user' || CAST(doc_id AS VARCHAR)"
        " || '@example.com or 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
        " || ' at 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.'"
        " || CAST(doc_id % 100 AS VARCHAR)"
        if engine == "duckdb"
        else
        "concat(text, ' contact user', CAST(doc_id AS STRING),"
        " '@example.com or 555-', lpad(CAST(doc_id % 10000 AS STRING), 4, '0'),"
        " ' at 10.0.', CAST(doc_id % 256 AS STRING), '.',"
        " CAST(doc_id % 100 AS STRING))"
    )
    return f"""
WITH raw AS (SELECT doc_id, {contaminated} AS dirty FROM documents),
scrubbed AS (
  SELECT doc_id, dirty,
         regexp_replace(
           regexp_replace(
             regexp_replace(dirty, '{_PII_EMAIL}', '<EMAIL>'{g}),
             '{_PII_PHONE}', '<PHONE>'{g}),
           '{_PII_IP}', '<IP>'{g}) AS clean
  FROM raw
)
SELECT doc_id,
       CAST({n}(regexp_extract_all(dirty, '{_PII_EMAIL}'{g0})) AS BIGINT) AS n_emails,
       CAST({n}(regexp_extract_all(dirty, '{_PII_PHONE}'{g0})) AS BIGINT) AS n_phones,
       CAST({n}(regexp_extract_all(clean, '<IP>'{g0})) AS BIGINT) AS n_ips,
       md5(clean) AS clean_md5
FROM scrubbed
"""


@register("pii_scrub", oracle=_pii_scrub_sql("duckdb"), tags=("pipeline", "text", "privacy"))
def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex PII redaction — the compliance pass every training-data
    pipeline runs before tokenization. All JVM-side regexp functions
    (whole-stage codegen, zero shuffles — a pure map over the corpus);
    per-class counts and a fingerprint of the scrubbed text make the
    redaction oracle-checkable byte-for-byte. At 100 TB this is the
    cheapest operator class there is: narrow, no exchange, bounded by
    scan bandwidth."""
    load_table(spark, "documents", sf_dir).createOrReplaceTempView("documents")
    return spark.sql(_pii_scrub_sql("spark"))


# ---------------------------------------------------------------------------
# Text normalization (canonical form for dedup/tokenization)
# ---------------------------------------------------------------------------


def _normalize_sql(engine: str) -> str:
    g = ", 'g'" if engine == "duckdb" else ""
    return f"""
WITH norm AS (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' '{g}),
                             '  +', ' '{g})) AS clean
  FROM documents
)
SELECT doc_id,
       md5(clean) AS norm_md5,
       CAST(length(clean) AS BIGINT) AS n_chars_norm
FROM norm
"""


@register("doc_normalize", oracle=_normalize_sql("duckdb"), tags=("pipeline", "text"))
def doc_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical text normalization (lowercase → non-alnum to space →
    whitespace collapse → trim): the preprocessing contract that makes
    exact-dedup hashes and shingle sets stable across crawls. Pure
    codegen string ops, no shuffle; the canonical form is
    fingerprinted, not materialized twice."""
    load_table(spark, "documents", sf_dir).createOrReplaceTempView("documents")
    return spark.sql(_normalize_sql("spark"))


# ---------------------------------------------------------------------------
# Count-Min sketch heavy hitters (fixed-memory mergeable frequency sketch)
# ---------------------------------------------------------------------------

_CMS_DEPTH = 4
_CMS_WIDTH = 1024


def _cms_sql(engine: str) -> str:
    """Count-Min heavy hitters, bit-identical in both engines.

    Sketch: depth=4 hash rows × width=1024 buckets; row r hashes a
    token as h28('r<r>:' || token) mod width — independent-enough rows
    from the one house md5 primitive. Cells build from the AGGREGATED
    (token, cnt) table (summing counts per cell ≡ per-occurrence
    increments, at |vocab| rows instead of corpus tokens). A token's
    estimate is MIN over its 4 cells — ≥ exact by construction; the
    top-20 exact tokens are emitted with exact count, estimate, and
    overestimate so the sketch error itself is oracle-checked.
    """
    if engine == "spark":
        toks = (
            "SELECT explode(split(lower(text), '[^a-z0-9]+')) AS token FROM documents"
        )
    else:
        toks = (
            "SELECT unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS token"
            " FROM documents"
        )
    salted = [h28(f"'r{r}:' || token", engine) for r in range(_CMS_DEPTH)]
    hashed = "\n  UNION ALL\n".join(
        f"  SELECT {r} AS r, token, cnt,"
        f" {salted[r]} % {_CMS_WIDTH} AS bucket FROM freq"
        for r in range(_CMS_DEPTH)
    )
    return f"""
WITH toks AS ({toks}),
freq AS (SELECT token, count(*) AS cnt FROM toks WHERE token <> '' GROUP BY token),
hashed AS (
{hashed}
),
cells AS (SELECT r, bucket, SUM(cnt) AS cell FROM hashed GROUP BY r, bucket),
top20 AS (SELECT token, cnt FROM freq ORDER BY cnt DESC, token LIMIT 20)
SELECT t.token, t.cnt AS exact_cnt,
       CAST(MIN(c.cell) AS BIGINT) AS cms_est,
       CAST(MIN(c.cell) - t.cnt AS BIGINT) AS overestimate
FROM top20 t
JOIN hashed h ON h.token = t.token
JOIN cells c ON c.r = h.r AND c.bucket = h.bucket
GROUP BY t.token, t.cnt
"""


@register("token_cms_heavy_hitters", oracle=_cms_sql("duckdb"), tags=("pipeline", "sketch"))
def token_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch frequency estimates for the corpus heavy
    hitters, next to their exact counts (overestimate included — the
    sketch's error is itself oracle-checked).

    100 TB story: the sketch is d×w = 4096 BIGINT cells REGARDLESS of
    vocabulary size — one token shuffle builds it, shards merge by
    cell-wise addition (sum-groupBy commutes), probes broadcast the
    4 KB cell table. The exact twin (token_vocab_topk) carries the
    full |vocab| aggregate; at extreme cardinality the sketch is the
    fixed-memory option, and this query pins exactly what that trade
    costs (min-of-cells ≥ exact, never under)."""
    load_table(spark, "documents", sf_dir).createOrReplaceTempView("documents")
    return spark.sql(_cms_sql("spark"))


# ---------------------------------------------------------------------------
# Vocabulary coverage curve (what fraction of the corpus the top-k covers)
# ---------------------------------------------------------------------------


def _vocab_coverage_sql(engine: str) -> str:
    if engine == "spark":
        toks = "SELECT explode(split(lower(text), '[^a-z0-9]+')) AS token FROM documents"
    else:
        toks = (
            "SELECT unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS token"
            " FROM documents"
        )
    fdiv = "//" if engine == "duckdb" else "div"
    return f"""
WITH toks AS ({toks}),
freq AS (SELECT token, count(*) AS cnt FROM toks WHERE token <> '' GROUP BY token),
total AS (SELECT SUM(cnt) AS n FROM freq),
top AS (SELECT token, cnt FROM freq ORDER BY cnt DESC, token LIMIT 100)
SELECT rank, token, cnt,
       CAST(cum * 1000000 {fdiv} n AS BIGINT) AS coverage_ppm
FROM (
  SELECT token, cnt,
         CAST(row_number() OVER (PARTITION BY n ORDER BY cnt DESC, token) AS BIGINT) AS rank,
         SUM(cnt) OVER (PARTITION BY n ORDER BY cnt DESC, token
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         n
  FROM top CROSS JOIN total
)
"""


@register("vocab_coverage_curve", oracle=_vocab_coverage_sql("duckdb"), tags=("pipeline", "text"))
def vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative corpus coverage of the top-100 tokens (the curve that
    sizes a tokenizer vocabulary): rank + running-sum window over the
    ALREADY-LIMITED top-100 (TakeOrderedAndProject first, window over
    ≤ 100 rows partitioned by the joined total — never an unpartitioned
    window over the vocabulary). Coverage is integer ppm with floored
    division — exact across engines."""
    load_table(spark, "documents", sf_dir).createOrReplaceTempView("documents")
    return spark.sql(_vocab_coverage_sql("spark"))


# ---------------------------------------------------------------------------
# Language-ID evaluation: confusion matrix of predicted vs labeled lang
# ---------------------------------------------------------------------------


def _lang_confusion_sql(engine: str) -> str:
    lid = lang_id_sql(engine)
    return f"""
WITH preds AS ({lid})
SELECT d.lang AS label_lang, p.predicted_lang, count(*) AS n_docs
FROM preds p JOIN documents d ON p.doc_id = d.doc_id
GROUP BY d.lang, p.predicted_lang
"""


@register("lang_id_confusion", oracle=_lang_confusion_sql("duckdb"), tags=("pipeline", "text", "eval"))
def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the n-gram language-ID heuristic against the
    dataset's language labels — the evaluation loop a corpus pipeline
    runs before trusting a classifier gate. One aggregate over the
    lang_id scores; |langs|² output rows."""
    load_table(spark, "documents", sf_dir).createOrReplaceTempView("documents")
    return spark.sql(_lang_confusion_sql("spark"))


# ---------------------------------------------------------------------------
# Keep-best dedup: near-dup components -> retain the highest-quality doc
# ---------------------------------------------------------------------------


def _keep_best_oracle() -> str:
    """Components via recursive CTE over the cap-aware edge contract
    (the same ``edges`` the Spark side's ``dedup_components`` call
    propagates — keep-best MUST see the clusters components sees),
    then one row_number per component ordered by quality (token count
    desc, doc_id asc). Oracle-scale only."""
    return rf"""
WITH RECURSIVE {_neardup_edges_ctes("duckdb")},
bi AS (
  SELECT doc_a AS a, doc_b AS b FROM edges
  UNION
  SELECT doc_b AS a, doc_a AS b FROM edges
),
reach AS (
  SELECT doc_id AS src, doc_id AS dst FROM documents
  UNION
  SELECT r.src, e.b AS dst FROM reach r JOIN bi e ON r.dst = e.a
),
comp AS (SELECT src AS doc_id, min(dst) AS component_id FROM reach GROUP BY src),
q AS (
  SELECT doc_id, len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens
  FROM documents
)
SELECT component_id, doc_id AS keep_doc_id, CAST(n_tokens AS BIGINT) AS keep_n_tokens,
       n_docs
FROM (
  SELECT c.component_id, c.doc_id, q.n_tokens,
         row_number() OVER (PARTITION BY c.component_id
                            ORDER BY q.n_tokens DESC, c.doc_id) AS rn,
         count(*) OVER (PARTITION BY c.component_id) AS n_docs
  FROM comp c JOIN q ON q.doc_id = c.doc_id
) WHERE rn = 1
"""


@register("dedup_keep_best", oracle=_keep_best_oracle(), tags=("pipeline", "dedup"))
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end near-dup curation: LSH pairs → connected components →
    keep ONE document per component, chosen by quality (here: most
    tokens, tie-broken by smallest doc_id) — the policy real corpus
    dedup runs (keep the longest/cleanest copy, not an arbitrary one).

    Spark-first: reuses ``dedup_components``' distributed min-label
    propagation, joins per-doc token counts (one shuffle on doc_id),
    and ranks within components via ``topn_per_group`` — partitioned
    window, so WindowGroupLimit pre-prunes to 1 row per component
    before the exchange. Component count ≪ doc count at any scale.
    """
    from flink_wsr_project_spark.operators.topn import topn_per_group

    labels = dedup_components(spark, sf_dir)
    docs = load_table(spark, "documents", sf_dir)
    ntok = docs.select(
        "doc_id", F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("n_tokens")
    )
    per_doc = labels.join(ntok, "doc_id")
    sized = per_doc.withColumn(
        "n_docs", F.count("*").over(Window.partitionBy("component_id"))
    )
    best = topn_per_group(
        sized, ["component_id"], "n_tokens", 1, tiebreakers=["doc_id"]
    )
    return best.select(
        "component_id",
        F.col("doc_id").alias("keep_doc_id"),
        F.col("n_tokens").alias("keep_n_tokens"),
        "n_docs",
    )


# ---------------------------------------------------------------------------
# Zipf fit over the vocabulary rank/frequency curve
# ---------------------------------------------------------------------------


def _zipf_fit_sql(engine: str) -> str:
    """Log-log OLS fit of the top-1000 token rank/frequency curve.

    Determinism discipline: ln(rank) and ln(freq) are scaled to
    integer micro-units BEFORE summing, so the four regression sums
    are exact integers on both engines (order-independent under any
    partitioning); slope/intercept/r² are then single double
    expressions over identical integers. (Summing raw doubles would be
    partition-order-dependent — the same reason every money aggregate
    here runs in integer cents.)"""
    if engine == "spark":
        toks = "SELECT explode(split(lower(text), '[^a-z0-9]+')) AS token FROM documents"
    else:
        toks = (
            "SELECT unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS token"
            " FROM documents"
        )
    return f"""
WITH toks AS ({toks}),
freq AS (SELECT token, count(*) AS cnt FROM toks WHERE token <> '' GROUP BY token),
top AS (SELECT token, cnt FROM freq ORDER BY cnt DESC, token LIMIT 1000),
ranked AS (
  SELECT CAST(round(ln(row_number() OVER (PARTITION BY n ORDER BY cnt DESC, token))
                    * 1000000) AS BIGINT) AS x,
         CAST(round(ln(cnt) * 1000000) AS BIGINT) AS y
  FROM top CROSS JOIN (SELECT count(*) AS n FROM top) t
),
s AS (
  SELECT CAST(count(*) AS DOUBLE) AS n, CAST(sum(x) AS DOUBLE) AS sx,
         CAST(sum(y) AS DOUBLE) AS sy, CAST(sum(x * y) AS DOUBLE) AS sxy,
         CAST(sum(x * x) AS DOUBLE) AS sxx, CAST(sum(y * y) AS DOUBLE) AS syy,
         count(*) AS n_points
  FROM ranked
)
SELECT CAST(n_points AS BIGINT) AS n_points,
       (n * sxy - sx * sy) / (n * sxx - sx * sx) AS zipf_slope,
       (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n / 1000000.0
         AS zipf_intercept_ln,
       (n * sxy - sx * sy) * (n * sxy - sx * sy)
         / ((n * sxx - sx * sx) * (n * syy - sy * sy)) AS r_squared
FROM s
"""


@register("vocab_zipf_fit", oracle=_zipf_fit_sql("duckdb"), tags=("pipeline", "text", "eval"))
def vocab_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the corpus vocabulary: OLS slope/intercept/r²
    of ln(freq) vs ln(rank) on the top-1000 tokens — the one-number
    corpus-health check (natural text ≈ −1; boilerplate/spam skews it).
    Rank comes from a window over the ALREADY-LIMITED top-1000
    (TakeOrderedAndProject first), sums are integer-exact, and the fit
    itself is a 1-row aggregate — nothing here grows with corpus size
    except the token count shuffle."""
    load_table(spark, "documents", sf_dir).createOrReplaceTempView("documents")
    return spark.sql(_zipf_fit_sql("spark"))


# ---------------------------------------------------------------------------
# CCNet-style quality terciles: percentile cutpoints -> head/middle/tail
# ---------------------------------------------------------------------------


def _quality_terciles_sql(engine: str) -> str:
    """Value-based tercile bucketing via interpolated percentile
    cutpoints broadcast back onto the rows — NOT ntile(): a global
    ntile needs a total order (single-partition window at corpus
    scale), while cutpoints are one tiny aggregate + a broadcast
    compare, and the bucket boundaries are stable under re-partition."""
    if engine == "spark":
        # NB: Spark SQL string literals treat backslash as an escape, so
        # the regex \s+ must be written \\s+ in the SQL text (DuckDB
        # literals are standard-SQL, no escaping).
        quantile, ntoks = "percentile", r"size(split(trim(text), '\\s+'))"
    else:
        quantile, ntoks = "quantile_cont", r"len(regexp_split_to_array(trim(text), '\s+'))"
    return f"""
WITH q AS (
  SELECT doc_id,
         CAST(round(length(text) * 1000.0 / {ntoks}) AS BIGINT) AS cpt_milli
  FROM documents
),
cuts AS (
  SELECT {quantile}(cpt_milli, 0.3333333333333333) AS c1,
         {quantile}(cpt_milli, 0.6666666666666666) AS c2
  FROM q
)
SELECT doc_id, cpt_milli,
       CASE WHEN cpt_milli <= c1 THEN 'head'
            WHEN cpt_milli <= c2 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM q CROSS JOIN cuts
"""


@register(
    "doc_quality_terciles", oracle=_quality_terciles_sql("duckdb"), tags=("pipeline", "text")
)
def doc_quality_terciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style head/middle/tail bucketing of documents by a quality
    proxy (chars-per-token, integer milli-units): cutpoints are the
    exact interpolated terciles (1-row aggregate, broadcast back), so
    at 100 TB the bucket assignment is a broadcast-hash compare over
    the scan — no global sort, no ntile. (The production swap-in is
    approx_percentile for the cutpoints; exact here for the oracle.)"""
    load_table(spark, "documents", sf_dir).createOrReplaceTempView("documents")
    return spark.sql(_quality_terciles_sql("spark"))


# ---------------------------------------------------------------------------
# Curation funnel (capstone: composes quality + dedup + decontamination)
# ---------------------------------------------------------------------------


def _curation_funnel_sql(
    engine: str, neardup_rel: str | None = None, contam_rel: str | None = None
) -> str:
    """The end-to-end curation funnel: every document is attributed to
    the FIRST stage that would drop it — quality gate (Gopher-style
    bounds), exact dedup (md5 keeper), near-dup dedup (LSH keep-list),
    benchmark contamination (8-gram overlap with the test split) — or
    'kept'. Per-(source, stage) counts; the four member stages are the
    registered queries' SQL verbatim, so the funnel composes verified
    plans into the one table a curation rollout reviews.

    Scale: each stage is its own bounded pipeline (see the member
    queries); the funnel adds only broadcast-sized joins of drop-lists
    back to the corpus.

    ``neardup_rel``/``contam_rel`` (Spark side, r17): pre-materialized
    member relations. The LSH keep-list and the contamination
    self-join are independent heavy members, materialized concurrently
    by the builder (guide §2.6); the contamination member additionally
    reads the materialized distinct-gram relation (``decon_grams``)
    the standalone query has used since r16, instead of inlining the
    gram build once per self-join side. The oracle composes with both
    None — string unchanged."""
    wt = toks_expr("text", engine)
    ln = "size" if engine == "spark" else "len"
    if neardup_rel is not None:
        keep_list = f"SELECT doc_id, action FROM {neardup_rel}"
    else:
        keep_list = _dedup_keep_list_sql(engine)
    if contam_rel is not None:
        contam = f"SELECT * FROM {contam_rel}"
    else:
        contam = _decontaminate_sql(engine)
    return f"""
WITH quality AS (
  SELECT doc_id,
         ({ln}({wt}) BETWEEN 10 AND 10000
          AND length(text) / {ln}({wt}) BETWEEN 3 AND 15) AS ok
  FROM documents
),
exact_keep AS (
  SELECT md5(text) AS h, min(doc_id) AS keep_doc_id FROM documents GROUP BY 1
),
neardup AS ({keep_list}),
contam AS ({contam})
SELECT d.source AS source, stage, count(*) AS n_docs FROM (
  SELECT d.doc_id,
         CASE WHEN NOT q.ok THEN 'quality'
              WHEN d.doc_id <> e.keep_doc_id THEN 'exact_dup'
              WHEN n.action = 'drop' THEN 'near_dup'
              WHEN c.doc_id IS NOT NULL THEN 'contaminated'
              ELSE 'kept' END AS stage
  FROM documents d
  JOIN quality q ON q.doc_id = d.doc_id
  JOIN exact_keep e ON e.h = md5(d.text)
  JOIN neardup n ON n.doc_id = d.doc_id
  LEFT JOIN contam c ON c.doc_id = d.doc_id
) f JOIN documents d ON d.doc_id = f.doc_id
GROUP BY d.source, stage
"""


@register(
    "curation_funnel",
    oracle=_curation_funnel_sql("duckdb"),
    doc=_curation_funnel_sql.__doc__,
    tags=("pipeline", "dedup", "text"),
)
def curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, "documents", sf_dir).createOrReplaceTempView("documents")

    # r17 (guide §2.6/§5): the LSH keep-list and the contamination
    # member are independent; the contamination member reads the
    # materialized gram relation (one gram build, not one per
    # self-join side — the r16 standalone-query treatment, now shared
    # by the funnel).
    def _contam() -> DataFrame:
        _materialize_once(
            spark.sql(_decontaminate_grams_sql("spark")), "decon_grams"
        ).createOrReplaceTempView("decon_grams")
        return _materialize_once(
            spark.sql(_decontaminate_tail("decon_grams")), "_cf_contam"
        )

    _run_view_builders(
        spark,
        {
            "_cf_neardup": lambda: _materialize_once(
                spark.sql(_dedup_keep_list_sql("spark")), "_cf_neardup"
            ),
            "_cf_contam": _contam,
        },
    )
    return spark.sql(_curation_funnel_sql("spark", "_cf_neardup", "_cf_contam"))


# ---------------------------------------------------------------------------
# BM25 ranked retrieval (full-text search over the corpus)
# ---------------------------------------------------------------------------

# Fixed query mixing common terms with a rare one (sf0.01 dfs:
# join 394, filter 393, dup 25 of 503 docs) so idf genuinely reorders
# documents — a common-terms-only query would rank by length
# normalization alone. Constants and the contribution formula live in
# operators/search_index.py, SHARED with the persisted-index probe so
# index scores are bit-identical to this corpus recompute.
_BM25_QUERY = ("join", "filter", "dup")
_BM25_TOPK = 10


def _bm25_sql(engine: str) -> str:
    """Engine-shared BM25: idf = ln(1 + (N - df + 0.5)/(df + 0.5)),
    per-term contribution idf·tf·(k1+1)/(tf + k1·(1-b+b·dl/avgdl)).
    Cross-engine float discipline, stricter than the tfidf round-6:
    each term's contribution is quantized to integer MICROS before the
    per-document sum, so the aggregate is integer arithmetic — immune
    to summation order, which doubles are not (ln's last ulp is the
    only residual exposure, the same one doc_tfidf_topk carries)."""
    terms = ", ".join(f"'{t}'" for t in _BM25_QUERY)
    if engine == "spark":
        toks = (
            "SELECT doc_id, tok FROM documents "
            "LATERAL VIEW explode(filter(split(lower(text), '[^a-z0-9]+'),"
            " x -> x <> '')) _t AS tok"
        )
    else:
        toks = (
            "SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text),"
            " '[^a-z0-9]+'), x -> x <> '')) AS tok FROM documents"
        )
    from flink_wsr_project_spark.operators.search_index import bm25_contrib_expr

    contrib = bm25_contrib_expr("t.tf", "d.dfq", "l.dl", "s.n_docs", "s.avgdl")
    return f"""
WITH toks AS ({toks}),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
stats AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_docs,
         CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
  FROM dl
),
tf AS (
  SELECT doc_id, tok, count(*) AS tf FROM toks
  WHERE tok IN ({terms}) GROUP BY doc_id, tok
),
dfreq AS (SELECT tok, count(*) AS dfq FROM tf GROUP BY tok),
contrib AS (
  SELECT t.doc_id, {contrib} AS c
  FROM tf t
  JOIN dfreq d ON t.tok = d.tok
  JOIN dl l ON l.doc_id = t.doc_id
  CROSS JOIN stats s
)
SELECT doc_id, CAST(sum(c) AS BIGINT) AS score_micros
FROM contrib GROUP BY doc_id
ORDER BY score_micros DESC, doc_id
LIMIT {_BM25_TOPK}
"""


@register(
    "bm25_search_topk",
    oracle=_bm25_sql("duckdb"),
    tags=("pipeline", "text", "search"),
)
def bm25_search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 ranked retrieval — the search primitive the text
    family lacked: global top-10 documents for a fixed 3-term query
    (two common terms + one rare, so idf does real work). Plan: one
    token explode feeds both the per-doc length and the query-term
    tf (the WHERE prunes the tf aggregate to query terms before its
    shuffle); df and the corpus stats are broadcast 1-row/3-row
    aggregates; the global top-10 is ORDER+LIMIT, which Spark plans
    as TakeOrderedAndProject — never an unpartitioned rank window.
    Scores are integer micros summed as BIGINT (order-independent;
    see ``_bm25_sql``), so the external value hash pins the whole
    scoring function. At 100 TB the same shape holds: the only
    corpus-sized shuffles are the doc-length agg and the tf agg, both
    map-side combinable."""
    load_table(spark, "documents", sf_dir).createOrReplaceTempView("documents")
    return spark.sql(_bm25_sql("spark"))


# ---------------------------------------------------------------------------
# CCNet-style LM perplexity filter (corpus bigram model)
# ---------------------------------------------------------------------------

# Avg-NLL bucket bounds in integer MICRO-nats, set at the sf0.01
# distribution's rough terciles (p33 ≈ 3,373,639; p66 ≈ 3,397,857) so
# all three CCNet buckets — head (likely text), middle, tail (noisy) —
# are populated at the gate (dead-branch discipline). Production: tune
# per corpus, as CCNet does per language.
_LM_HEAD_MAX_MICROS = 3_375_000
_LM_TAIL_MIN_MICROS = 3_400_000


_LM_TOKS_SPARK = (
    "SELECT doc_id, pos, tok FROM documents "
    "LATERAL VIEW posexplode(filter(split(lower(text), '[^a-z0-9]+'),"
    " x -> x <> '')) _t AS pos, tok"
)


def _lm_perplexity_sql(engine: str) -> str:
    """Engine-shared CCNet-style perplexity scoring: a bigram LM with
    add-one smoothing is fitted to the CORPUS ITSELF in one pass
    (unigram + bigram counts + vocabulary size), then every document
    is scored by its average negative log-likelihood under that model
    — the standard quality signal (CCNet filters by LM perplexity;
    here model and data are the same corpus, so the score measures
    how TYPICAL a document's word transitions are). Float discipline:
    per-bigram NLL is quantized to integer MICRO-nats before the
    per-doc sum (order-independent), and the average uses integer
    division — ln's last ulp is the only cross-engine exposure (the
    BM25/tfidf precedent). Bigrams come from a lag window per doc —
    no positional self-join."""
    if engine == "spark":
        toks = _LM_TOKS_SPARK
        div = "div"
    else:
        toks = (
            "SELECT doc_id,"
            " generate_subscripts(list_filter(regexp_split_to_array(lower(text),"
            " '[^a-z0-9]+'), x -> x <> ''), 1) AS pos,"
            " unnest(list_filter(regexp_split_to_array(lower(text),"
            " '[^a-z0-9]+'), x -> x <> '')) AS tok FROM documents"
        )
        div = "//"
    return f"""
WITH toks AS ({toks}),
b AS (
  SELECT doc_id, lag(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS w1,
         tok AS w2
  FROM toks
),
bg AS (SELECT doc_id, w1, w2 FROM b WHERE w1 IS NOT NULL),
{_lm_perplexity_tail('bg', 'toks', div)}"""


def _lm_bigrams_sql(engine: str) -> str:
    """Just the (doc_id, w1, w2) bigram relation from
    ``_lm_perplexity_sql`` — the prefix the Spark path materializes
    once (see ``doc_lm_perplexity``)."""
    full = _lm_perplexity_sql(engine)
    return full[: full.index(",\nuni AS")] + "\nSELECT * FROM bg"


def _lm_perplexity_tail(bg_rel: str, toks_rel: str, div: str) -> str:
    return f"""uni AS (SELECT w1, count(*) AS c1 FROM {bg_rel} GROUP BY w1),
bic AS (SELECT w1, w2, count(*) AS c2 FROM {bg_rel} GROUP BY w1, w2),
v AS (SELECT count(DISTINCT tok) AS vocab FROM {toks_rel}),
scored AS (
  SELECT g.doc_id,
         CAST(round(-ln((bic.c2 + 1.0) / (uni.c1 + v.vocab)) * 1000000) AS BIGINT) AS nll
  FROM {bg_rel} g
  JOIN bic ON bic.w1 = g.w1 AND bic.w2 = g.w2
  JOIN uni ON uni.w1 = g.w1
  CROSS JOIN v
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(sum(nll) AS BIGINT) AS nll_micros,
       CAST(sum(nll) {div} count(*) AS BIGINT) AS avg_nll_micros,
       CASE WHEN sum(nll) {div} count(*) < {_LM_HEAD_MAX_MICROS} THEN 'head'
            WHEN sum(nll) {div} count(*) >= {_LM_TAIL_MIN_MICROS} THEN 'tail'
            ELSE 'middle' END AS ccnet_bucket
FROM scored GROUP BY doc_id
"""


@register(
    "doc_lm_perplexity",
    oracle=_lm_perplexity_sql("duckdb"),
    tags=("pipeline", "text", "quality"),
)
def doc_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity filter — the standard LM quality signal
    the pipeline family lacked: fit a bigram model (add-one smoothing)
    to the corpus in one pass, score every document by average NLL in
    integer micro-nats, and bucket head/middle/tail the way CCNet
    keeps the head/middle of its perplexity distribution. Plan: the
    bigram stream is a lag window per doc (no positional self-join);
    unigram/bigram count shuffles are map-side combinable; the
    vocabulary size is a 1-row broadcast; scoring joins the bigram
    stream back to its own counts (shuffles keyed on the bigram/
    unigram), then one per-doc aggregate. All arithmetic
    order-independent (integer micro-nats; the BM25 discipline), so
    the external value hash pins model fitting AND scoring. At sf0.01:
    174 head / 164 middle / 162 tail — all three buckets populated.

    r16: the bigram relation is referenced three times (unigram
    counts, bigram counts, scoring join) and as a CTE each reference
    recomputed the lag window above the reused explode exchange;
    materialize it once per call (the semdedup pattern — recomputed
    from parquet every invocation). The vocabulary count keeps its own
    inline token scan (it needs first-per-doc tokens the bigram
    relation drops)."""
    load_table(spark, "documents", sf_dir).createOrReplaceTempView("documents")
    _materialize_once(
        spark.sql(_lm_bigrams_sql("spark")), "_lm_bg"
    ).createOrReplaceTempView("_lm_bg")
    return spark.sql(
        f"WITH toks AS ({_LM_TOKS_SPARK}),\n"
        + _lm_perplexity_tail("_lm_bg", "toks", "div")
    )


# ---------------------------------------------------------------------------
# BPE merge learning (tokenizer LEARNING — tokenizer_fertility measures
# an existing vocab; this learns one)
# ---------------------------------------------------------------------------

_BPE_ROUNDS = 8


def _bpe_oracle() -> str:
    from flink_wsr_project_spark.operators.bpe import bpe_unrolled_sql

    return bpe_unrolled_sql("duckdb", _BPE_ROUNDS)


@register(
    "bpe_merges_topk",
    oracle=_bpe_oracle(),
    tags=("pipeline", "text", "iterative"),
)
def bpe_merges_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE merge learning (operators/bpe.py), first
    {r} merges over the corpus: per round, count adjacent symbol
    pairs weighted by word frequency, take the most frequent
    (count DESC then lexicographic — the deterministic tie-break
    all later rounds inherit), merge greedily left-to-right, repeat.

    Spark-first iteration shape (the embedding_kmeans pattern): the
    winning pair is ONE driver row per round re-entering as literals
    in a codegen'd aggregate() fold; each round's segmentation is
    localCheckpoint-pinned (bounded plans). Pair-count state is
    VOCAB-bounded, not corpus-bounded — the corpus is scanned once
    for word frequencies; every round after that shuffles |vocab|
    rows. Oracle: the identical loop unrolled as {r} rounds of CTEs
    (DuckDB's list_reduce lifted to match Spark's aggregate fold
    exactly); the driver loop is additionally pinned against the
    unrolled SPARK SQL in tests."""
    from flink_wsr_project_spark.operators.bpe import learn_bpe_merges
    from flink_wsr_project_spark.operators.iterative import release_persistent_rdds

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    ids: set[int] = set()
    merges, _seg = learn_bpe_merges(spark, docs, _BPE_ROUNDS, ckpt_ids=ids)
    release_persistent_rdds(spark, ids)  # the merge list is already on the driver
    return spark.createDataFrame(
        merges, "merge_rank bigint, lhs string, rhs string, merged string, pair_count bigint"
    )


bpe_merges_topk.__doc__ = bpe_merges_topk.__doc__.format(r=_BPE_ROUNDS)
_set_doc("bpe_merges_topk", bpe_merges_topk.__doc__)


def _bpe_fertility_oracle() -> str:
    from flink_wsr_project_spark.operators.bpe import bpe_fertility_sql

    return bpe_fertility_sql("duckdb", _BPE_ROUNDS)


@register(
    "bpe_vocab_fertility",
    oracle=_bpe_fertility_oracle(),
    tags=("pipeline", "text", "iterative"),
)
def bpe_vocab_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus compression under the LEARNED vocabulary — the merges'
    downstream consumer (tokenizer_fertility measures a FIXED regex
    vocab; this measures the one bpe_merges_topk just learned): one
    exact-integer row over the post-merge segmentation —
    (vocab_words, word_occurrences, char_symbols, bpe_symbols,
    compression_permille), where char_symbols is the character-level
    baseline (length + end marker per occurrence) and the permille is
    an exact integer division. Spark side: the driver-iterated loop's
    final segmentation, one vocab-bounded aggregate; oracle: the same
    {r} rounds unrolled as CTEs with the re-segmentation carried
    through the last merge."""
    from flink_wsr_project_spark.operators.bpe import learn_bpe_merges
    from flink_wsr_project_spark.operators.iterative import release_persistent_rdds

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    ids: set[int] = set()
    _, seg = learn_bpe_merges(spark, docs, _BPE_ROUNDS, ckpt_ids=ids)
    row = seg.selectExpr(
        "freq",
        "CAST(freq * (length(word) + 1) AS BIGINT) AS cs",
        "CAST(freq * size(syms) AS BIGINT) AS bs",
    ).agg(
        F.count(F.lit(1)).cast("long").alias("vocab_words"),
        F.coalesce(F.sum("freq"), F.lit(0)).cast("long").alias("word_occurrences"),
        F.coalesce(F.sum("cs"), F.lit(0)).cast("long").alias("char_symbols"),
        F.coalesce(F.sum("bs"), F.lit(0)).cast("long").alias("bpe_symbols"),
    ).collect()[0]
    release_persistent_rdds(spark, ids)
    perm = (1000 * row.bpe_symbols) // row.char_symbols if row.char_symbols else 0
    return spark.createDataFrame(
        [(row.vocab_words, row.word_occurrences, row.char_symbols,
          row.bpe_symbols, perm)],
        "vocab_words bigint, word_occurrences bigint, char_symbols bigint,"
        " bpe_symbols bigint, compression_permille bigint",
    )


bpe_vocab_fertility.__doc__ = bpe_vocab_fertility.__doc__.format(r=_BPE_ROUNDS)
_set_doc("bpe_vocab_fertility", bpe_vocab_fertility.__doc__)


def _bpe_doc_tokens_oracle() -> str:
    from flink_wsr_project_spark.operators.bpe import bpe_doc_tokens_sql

    return bpe_doc_tokens_sql("duckdb", _BPE_ROUNDS)


@register(
    "bpe_doc_tokens",
    oracle=_bpe_doc_tokens_oracle(),
    tags=("pipeline", "text", "iterative"),
)
def bpe_doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token counts under the LEARNED vocabulary — the
    packing/cost-estimate consumer of the BPE family (seq_packing and
    shard manifests need tokens-per-doc under the tokenizer that will
    actually run): each doc's words join the post-merge segmentation,
    summing symbols per occurrence, with the character-level baseline
    alongside. Plan: the segmentation is VOCAB-bounded, so it
    BROADCASTS into the word join — per-doc cost is one explode + one
    broadcast join + one doc aggregate; no corpus-sized shuffle beyond
    the word count the learning itself needs. Oracle: the same {r}
    unrolled rounds with the re-segmentation carried through, joined
    to the exploded words."""
    from flink_wsr_project_spark.operators.bpe import (
        _WTOKS,
        _initial_seg,
        _merge_pair_expr,
        learn_bpe_merges,
        word_freqs,
    )
    from flink_wsr_project_spark.operators.iterative import release_persistent_rdds

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    ids: set[int] = set()
    merges, _seg = learn_bpe_merges(spark, docs, _BPE_ROUNDS, ckpt_ids=ids)
    release_persistent_rdds(spark, ids)  # only the R merge rows are kept

    # REPLAY the learned merges as a lazy projection stack (the kmeans
    # literal-centroids move): the returned plan must not reference a
    # checkpoint the query cannot release, and the result is
    # data-sized so a driver collect is off the table. Catalyst
    # collapses the stack into one nested fold per word; the
    # segmentation side stays vocabulary-bounded and broadcasts.
    seg = _initial_seg(word_freqs(docs)).select("word", "syms")
    for _, lhs, rhs, _, _ in merges:
        seg = seg.selectExpr("word", f"{_merge_pair_expr(lhs, rhs)} AS syms")
    dw = docs.selectExpr("doc_id", f"explode({_WTOKS}) AS word")
    return (
        dw.join(F.broadcast(seg), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum(F.size("syms")).cast("long").alias("bpe_tokens"),
            F.sum(F.length("word") + 1).cast("long").alias("char_tokens"),
        )
    )


bpe_doc_tokens.__doc__ = bpe_doc_tokens.__doc__.format(r=_BPE_ROUNDS)
_set_doc("bpe_doc_tokens", bpe_doc_tokens.__doc__)
