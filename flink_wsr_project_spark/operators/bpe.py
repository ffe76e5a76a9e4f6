"""Distributed BPE merge learning — the tokenizer-LEARNING stage of an
LLM data pipeline (``tokenizer_fertility`` measures an existing vocab;
this learns one). Classic Sennrich-style byte-pair encoding over the
word-frequency table:

    1. one corpus pass: word frequencies (the ONLY corpus-sized
       shuffle — afterwards everything is vocabulary-bounded);
    2. each word starts as its character sequence plus an end-of-word
       marker ``_`` (the tokenizer alphabet is [a-z0-9], so ``_`` is
       collision-free);
    3. per round: count adjacent symbol pairs weighted by word
       frequency (one vocab-bounded shuffle), take the most frequent
       pair (count DESC, then lexicographic (lhs, rhs) — the
       deterministic tie-break every later round depends on), merge
       its occurrences greedily left-to-right in every word, repeat.

Spark-first iteration shape (the ``embedding_kmeans`` pattern): the
winning pair is ONE driver row per round, re-entering the next round
as literals inside a codegen'd ``aggregate(...)`` fold — the greedy
left-to-right merge is a left fold over the symbol array whose
accumulator ends with the merged symbol, so an overlapping run
(``aaa`` under pair (a,a)) merges non-overlapping occurrences exactly
like the reference algorithm. Each round's segmentation is
``localCheckpoint``-pinned: bounded plans, no growing lineage.

At 100 TB: pair-count state is VOCAB-bounded, not corpus-bounded —
the corpus is touched once for word counts; every round after that
shuffles |vocab| rows and collects exactly one. This is the real
production shape of BPE training (word-level pre-counting), not a
toy: scaling the corpus 1000x changes the frequencies, not the cost
per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

BPE_MARKER = "_"
_WTOKS = "filter(split(lower(text), '[^a-z0-9]+'), x -> x <> '')"


def word_freqs(docs: DataFrame) -> DataFrame:
    """(word, freq) over the pipeline tokenizer — the one corpus-sized
    aggregate; its output is vocabulary-bounded."""
    return (
        docs.selectExpr(f"explode({_WTOKS}) AS word")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )


def _initial_seg(words: DataFrame) -> DataFrame:
    """Character-level start state: (word, freq, syms) with the
    end-of-word marker appended (so merges learned at word ends are
    distinct from word-internal ones — the classic formulation)."""
    return words.selectExpr(
        "word",
        "freq",
        "concat(transform(sequence(1, length(word)), i -> substring(word, i, 1)),"
        f" array('{BPE_MARKER}')) AS syms",
    )


def _pair_counts(seg: DataFrame) -> DataFrame:
    """Adjacent-pair counts weighted by word frequency. The CASE keeps
    the transform TOTAL (sequence(1, 0) would be descending — the
    span-store short-doc lesson); with the marker every word has >= 2
    symbols, but the guard costs nothing."""
    return (
        seg.selectExpr(
            "freq",
            "explode(CASE WHEN size(syms) >= 2 THEN"
            " transform(sequence(1, size(syms) - 1),"
            " i -> struct(element_at(syms, i) AS l, element_at(syms, i + 1) AS r))"
            " ELSE CAST(array() AS array<struct<l: string, r: string>>) END) AS pr"
        )
        .groupBy(F.col("pr.l").alias("lhs"), F.col("pr.r").alias("rhs"))
        .agg(F.sum("freq").cast("long").alias("pair_count"))
    )


def _sql_lit(s: str) -> str:
    """Spark SQL single-quoted literal for a corpus-derived symbol:
    backslashes and quotes escaped. The registered queries' word
    pre-tokenizer keeps [a-z0-9] only, but the operator accepts any
    ``docs`` frame — an apostrophe surviving a caller's tokenization
    would otherwise break the generated fold expression (r15 ADVICE),
    and the batched path widens the surface to 4k+8 candidates per
    round."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _merge_pair_expr(lhs: str, rhs: str) -> str:
    """Greedy left-to-right merge of (lhs, rhs) as a left fold: the
    accumulator's LAST symbol is lhs and the incoming symbol is rhs →
    replace the tail with the merged symbol. Non-overlap falls out:
    after a merge the tail IS the merged symbol, which only matches
    lhs again if a fresh lhs follows. Symbols are whole-string
    compared, so a single symbol that happens to spell lhs||rhs never
    conflates. Symbols embed as ESCAPED literals (``_sql_lit``)."""
    merged = lhs + rhs
    return (
        "aggregate(syms, CAST(array() AS array<string>), (acc, x) -> "
        f"CASE WHEN size(acc) > 0 AND element_at(acc, -1) = {_sql_lit(lhs)} "
        f"AND x = {_sql_lit(rhs)} "
        f"THEN concat(slice(acc, 1, size(acc) - 1), array({_sql_lit(merged)})) "
        "ELSE concat(acc, array(x)) END)"
    )


def _select_compatible(
    candidates: list[tuple[str, str, int]], k: int
) -> list[tuple[str, str, int]]:
    """Greedy compatible subset of up to ``k`` merges from candidates
    already ordered by (count DESC, lhs, rhs). Two merges are
    compatible when their symbol sets {lhs, rhs, merged} are DISJOINT
    — the merged output is included on purpose: a batch containing
    (a,b)->ab and (x,ab) would diverge between one-pass and
    sequential application (the fold consumes the freshly merged 'ab'
    before (x,ab) can see it — or vice versa, (ab,c) firing on 'ab's
    that did not exist when its count was taken). With full
    three-symbol disjointness no accepted rule consumes OR produces a
    symbol any other accepted rule references, so applying the batch
    in ONE left fold equals applying its members sequentially in any
    order."""
    used: set[str] = set()
    out: list[tuple[str, str, int]] = []
    for lhs, rhs, cnt in candidates:
        symbols = {lhs, rhs, lhs + rhs}
        if symbols & used:
            continue
        out.append((lhs, rhs, cnt))
        used |= symbols
        if len(out) >= k:
            break
    return out


def _merge_batch_expr(batch: list[tuple[str, str, int]]) -> str:
    """One greedy left fold applying EVERY merge in ``batch`` — a
    CASE branch per rule inside a single ``aggregate``. Valid only for
    a :func:`_select_compatible` batch (symbol-disjoint rules cannot
    interact, so one pass is exact); expression size is linear in the
    batch, never nested."""
    whens = "".join(
        f"WHEN size(acc) > 0 AND element_at(acc, -1) = {_sql_lit(lhs)} "
        f"AND x = {_sql_lit(rhs)} "
        f"THEN concat(slice(acc, 1, size(acc) - 1), array({_sql_lit(lhs + rhs)})) "
        for lhs, rhs, _ in batch
    )
    return (
        "aggregate(syms, CAST(array() AS array<string>), (acc, x) -> "
        f"CASE {whens}ELSE concat(acc, array(x)) END)"
    )


def learn_bpe_merges(
    spark: SparkSession,
    docs: DataFrame,
    rounds: int,
    ckpt_ids: set[int] | None = None,
    batch_k: int = 1,
) -> tuple[list[tuple[int, str, str, str, int]], DataFrame]:
    """Learn ``rounds`` BPE merges. Returns (merges, final segmentation)
    where merges rows are (merge_rank, lhs, rhs, merged, pair_count).

    ``batch_k=1`` (default, the registered queries' path) is exact
    sequential BPE: one merge per driver round, driver traffic one row
    per round. ``batch_k > 1`` is the standard BATCHED approximation a
    production vocabulary needs (r14 verdict: a 32k vocab at one merge
    per round is 32k sequential Spark jobs): per round, take the top-K
    PAIRWISE-COMPATIBLE merges (symbol-disjoint including merged
    outputs — see :func:`_select_compatible`) from the current counts
    and re-segment ONCE, so a 32k vocab needs ~32k/K rounds. Within a
    round the batch is applied with one fold, provably equal to
    applying its members sequentially; across rounds it differs from
    one-merge BPE only when a pair CREATED by an earlier member would
    have out-ranked a later member — the classic frequency-dominance
    condition, exact whenever counts strictly dominate created pairs
    (pinned by the parity test). Driver traffic per round is
    ``4*batch_k + 8`` candidate rows.

    r17: ONE action per round instead of two (guide §5 driver
    discipline). Each re-segmentation is a LAZY localCheckpoint — its
    fold materializes inside the NEXT round's pair-count collect (the
    only job that needs it) rather than in a dedicated eager
    checkpoint job, and the final segmentation materializes in the
    caller's consuming action (or never, for callers that only keep
    the merge list). Because a lazy checkpoint's computation reads the
    PARENT checkpoint's blocks until it materializes, the superseded
    round's ids are released one round late — after the collect that
    materialized its child — so at most two vocab-bounded
    segmentations are pinned at a time instead of one.
    The FINAL segmentation's (and its still-backing parent's)
    checkpoint ids go into ``ckpt_ids`` when given, so the caller can
    release them after consuming ``seg``."""
    from flink_wsr_project_spark.operators.iterative import (
        local_checkpoint_tracked,
        release_persistent_rdds,
    )

    if batch_k < 1:
        raise ValueError(f"batch_k must be >= 1, got {batch_k}")
    seg, seg_ids = local_checkpoint_tracked(
        _initial_seg(word_freqs(docs)), eager=False
    )
    # ids of the segmentation superseded LAST round: they may still back
    # the current (lazy, unmaterialized) ``seg``; released right after
    # the collect that materializes it.
    backing_ids: set[int] = set()
    merges: list[tuple[int, str, str, str, int]] = []
    while len(merges) < rounds:
        k = min(batch_k, rounds - len(merges))
        top = (
            _pair_counts(seg)
            .orderBy(F.col("pair_count").desc(), "lhs", "rhs")
            .limit(4 * k + 8)
            .collect()
        )
        release_persistent_rdds(spark, backing_ids)
        backing_ids = set()
        cands = [
            (r.lhs, r.rhs, r.pair_count) for r in top if r.pair_count > 0
        ]
        batch = _select_compatible(cands, k)
        if not batch:
            break
        for lhs, rhs, cnt in batch:
            merges.append((len(merges) + 1, lhs, rhs, lhs + rhs, cnt))
        nxt, nxt_ids = local_checkpoint_tracked(
            seg.selectExpr("word", "freq", f"{_merge_batch_expr(batch)} AS syms"),
            eager=False,
        )
        backing_ids = seg_ids
        seg, seg_ids = nxt, nxt_ids
    if ckpt_ids is not None:
        ckpt_ids.update(seg_ids | backing_ids)
    return merges, seg


def _bpe_cte_fragments(engine: str, source: str) -> dict[str, str]:
    """Engine-specific CTE templates shared by the unrolled merge
    query and the fertility rollup."""
    m = BPE_MARKER
    if engine == "spark":
        tok = f"explode({_WTOKS}) AS word"
        seg0 = (
            "SELECT word, freq, concat(transform(sequence(1, length(word)),"
            f" i -> substring(word, i, 1)), array('{m}')) AS syms FROM w0"
        )
        pairs = (
            "SELECT pr.l AS lhs, pr.r AS rhs, CAST(sum(freq) AS BIGINT) AS pair_count"
            " FROM s{prev} LATERAL VIEW explode(CASE WHEN size(syms) >= 2 THEN"
            " transform(sequence(1, size(syms) - 1), i -> struct(element_at(syms, i)"
            " AS l, element_at(syms, i + 1) AS r)) ELSE"
            " CAST(array() AS array<struct<l: string, r: string>>) END) _p AS pr"
            " GROUP BY 1, 2"
        )
        reseg = (
            "SELECT word, freq, aggregate(syms, CAST(array() AS array<string>),"
            " (acc, x) -> CASE WHEN size(acc) > 0 AND element_at(acc, -1) = m.lhs"
            " AND x = m.rhs THEN concat(slice(acc, 1, size(acc) - 1),"
            " array(concat(m.lhs, m.rhs))) ELSE concat(acc, array(x)) END) AS syms"
            # LEFT JOIN ON true, not CROSS JOIN: when pair merges
            # exhaust before `rounds` (degenerate corpus — every word
            # already one symbol), m{r} is EMPTY; a cross join would
            # empty s{r} and every later CTE (zero-row fertility /
            # doc-token oracles while the driver loop keeps the last
            # real segmentation). With the left join the merge columns
            # come back NULL, the fold's CASE condition is NULL ->
            # ELSE, and s{r} is the identity re-segmentation of
            # s{prev} — exactly the driver's break-keep-last behavior.
            " FROM s{prev} LEFT JOIN m{r} m ON true"
        )
    else:
        tok = (
            "unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),"
            " x -> x <> '')) AS word"
        )
        seg0 = (
            "SELECT word, freq, list_append(list_transform(range(1, length(word) + 1),"
            f" i -> substring(word, i, 1)), '{m}') AS syms FROM w0"
        )
        pairs = (
            "SELECT (pr).l AS lhs, (pr).r AS rhs, CAST(sum(freq) AS BIGINT)"
            " AS pair_count FROM (SELECT freq,"
            " unnest(list_transform(range(1, len(syms)),"
            " i -> struct_pack(l := syms[i], r := syms[i + 1]))) AS pr"
            " FROM s{prev}) GROUP BY 1, 2"
        )
        reseg = (
            "SELECT word, freq, list_reduce("
            "list_prepend(CAST([] AS VARCHAR[]), list_transform(syms, x -> [x])),"
            " (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = m.lhs AND x[1] = m.rhs"
            " THEN list_append(acc[1:len(acc) - 1], m.lhs || m.rhs)"
            " ELSE list_concat(acc, x) END) AS syms"
            " FROM s{prev} LEFT JOIN m{r} m ON true"
        )
    top1 = (
        "SELECT CAST({r} AS BIGINT) AS merge_rank, lhs, rhs,"
        " lhs || rhs AS merged, pair_count"
        " FROM p{r} ORDER BY pair_count DESC, lhs, rhs LIMIT 1"
    )
    return {
        "w0": (
            f"w0 AS (SELECT word, CAST(count(*) AS BIGINT) AS freq FROM"
            f" (SELECT {tok} FROM {source}) GROUP BY word)"
        ),
        "s0": f"s0 AS ({seg0})",
        "pairs": pairs,
        "top1": top1,
        "reseg": reseg,
    }


def _bpe_ctes(
    engine: str, rounds: int, source: str, final_seg: bool
) -> tuple[list[str], list[str]]:
    """The unrolled round CTEs: per round a pair-count CTE, a top-1
    CTE with the (count DESC, lhs, rhs) tie-break, and a
    re-segmentation CTE. ``final_seg=True`` additionally materializes
    s{rounds} (the segmentation AFTER the last merge — what the
    fertility rollup consumes)."""
    f = _bpe_cte_fragments(engine, source)
    ctes = [f["w0"], f["s0"]]
    merge_selects = []
    for r in range(1, rounds + 1):
        ctes.append(f"p{r} AS ({f['pairs'].format(prev=r - 1)})")
        ctes.append(f"m{r} AS ({f['top1'].format(r=r)})")
        if r < rounds or final_seg:
            ctes.append(f"s{r} AS ({f['reseg'].format(prev=r - 1, r=r)})")
        merge_selects.append(f"SELECT * FROM m{r}")
    return ctes, merge_selects


def bpe_unrolled_sql(engine: str, rounds: int, source: str = "documents") -> str:
    """The learning loop unrolled as one SQL query (the kmeans-oracle
    trick): per round, a pair-count CTE, a top-1 CTE with the same
    (count DESC, lhs, rhs) tie-break, and a re-segmentation CTE whose
    greedy fold is the engine's list-reduce — DuckDB's ``list_reduce``
    has no initial-accumulator form, so the element list is lifted to
    single-element lists with an empty list prepended, making the
    fold's types line up with Spark's ``aggregate`` exactly. Returns
    the merge table (merge_rank, lhs, rhs, merged, pair_count)."""
    ctes, merge_selects = _bpe_ctes(engine, rounds, source, final_seg=False)
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(merge_selects)


def bpe_fertility_sql(engine: str, rounds: int, source: str = "documents") -> str:
    """Corpus compression under the LEARNED vocabulary — the downstream
    consumer of the merges: one row of exact-integer stats over the
    segmentation after ``rounds`` merges. ``char_symbols`` is the
    character-level baseline (length + marker per occurrence),
    ``bpe_symbols`` the symbols actually left, ``compression_permille``
    their exact integer ratio. An empty-vocabulary corpus yields
    (0, 0, 0, 0, 0) rather than a division error."""
    ln = "size" if engine == "spark" else "len"
    div = "div" if engine == "spark" else "//"
    ctes, _ = _bpe_ctes(engine, rounds, source, final_seg=True)
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT CAST(count(*) AS BIGINT) AS vocab_words,
       CAST(coalesce(sum(freq), 0) AS BIGINT) AS word_occurrences,
       CAST(coalesce(sum(freq * (length(word) + 1)), 0) AS BIGINT) AS char_symbols,
       CAST(coalesce(sum(freq * {ln}(syms)), 0) AS BIGINT) AS bpe_symbols,
       CAST(CASE WHEN coalesce(sum(freq * (length(word) + 1)), 0) = 0 THEN 0
            ELSE (1000 * sum(freq * {ln}(syms))) {div} sum(freq * (length(word) + 1))
            END AS BIGINT) AS compression_permille
FROM s{rounds}
"""
    )


def bpe_doc_tokens_sql(engine: str, rounds: int, source: str = "documents") -> str:
    """Per-document token counts under the LEARNED vocabulary — the
    packing/cost-estimate consumer: each document's words join the
    post-merge segmentation (vocabulary-bounded — the broadcast side),
    summing symbols per occurrence. ``char_tokens`` is the
    character-level baseline for the same words; both exact integers.
    Documents with no [a-z0-9] words emit no row (no word, no join
    match) — matching the word-level explode on both engines."""
    ln = "size" if engine == "spark" else "len"
    ctes, _ = _bpe_ctes(engine, rounds, source, final_seg=True)
    if engine == "spark":
        dw = (
            f"SELECT doc_id, word FROM {source} "
            f"LATERAL VIEW explode({_WTOKS}) _w AS word"
        )
    else:
        dw = (
            "SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text),"
            f" '[^a-z0-9]+'), x -> x <> '')) AS word FROM {source}"
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
dw AS ({dw})
SELECT dw.doc_id AS doc_id,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum({ln}(s.syms)) AS BIGINT) AS bpe_tokens,
       CAST(sum(length(dw.word) + 1) AS BIGINT) AS char_tokens
FROM dw JOIN s{rounds} s ON s.word = dw.word
GROUP BY dw.doc_id
"""
    )
