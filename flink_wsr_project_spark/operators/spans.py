"""Cross-document repeated-SPAN detection — the distributed analogue of
suffix-array training-data dedup (find every maximal token span shared
verbatim between two documents), expressed as relational algebra so
Catalyst plans it instead of a driver-side suffix array.

Public-literature basis: span-level (not document-level) duplication is
the unit that matters for memorization removal — "Deduplicating
Training Data Makes Language Models Better" (Lee et al., 2022) removes
repeated substrings of >= 50 tokens found via a suffix array. A suffix
array is a single-machine index; at 100 TB the equivalent evidence is
recovered with three relational steps, each a standard shuffle:

1. POSITIONAL GRAMS: one row per token position — the ``w``-token
   gram starting at that position, keyed by a 62-bit join key ``gh``
   plus an INDEPENDENT 31-bit verify key ``vh``. Each token is coded
   ONCE (60-bit md5 prefix), then every gram hash is pure integer
   arithmetic: three independent polynomial (Horner) chains over the
   w codes in a LEAD window — all whole-stage codegen, no per-gram
   string building (r14: the md5-per-gram scheme was measured at
   ~7.8 s of the capped query's 16.8 s at sf0.1; this one is ~6×
   cheaper and bit-identical across engines). Collision posture: a
   FALSE span needs either two distinct tokens sharing a 60-bit code
   (~1e8-token vocab -> ~4e-3 expected colliding pairs) or one fixed
   base to be a root of the code-difference polynomial mod three
   independent 31-bit primes (~w^3/(M1*M2*M3) ~ 2e-26 per distinct
   gram pair) — both strictly bounded, and every reported pair still
   carries the 93-bit (gh, vh) double check.
   The positional index costs ~12 bytes/token — a constant factor of
   corpus size, not a blowup.
2. GRAM MATCH: self-equi-join on ``gh`` (one hash shuffle), verified
   on ``vh`` (93 effective bits — 62-bit ``gh`` + the independent
   31-bit ``vh`` — for every enumerated pair; the
   collision-verify analogue of the image path's Hamming verify), with
   the document-frequency cap valve below bounding the degenerate mass.
3. DIAGONAL MERGE: a run of consecutive matching positions between two
   documents lies on one diagonal (``pos_a - pos_b`` constant), so the
   classic gaps-and-islands window over (doc_a, doc_b, diag) recovers
   every MAXIMAL shared span with exact positions — count + w - 1
   tokens long. This is the suffix array's longest-common-extension
   step, done as one window shuffle.

Degenerate-bucket valve (the discipline every dedup family here
carries): boilerplate grams — headers, license text, templated
sentences — appear in THOUSANDS of documents, and the gram self-join
is quadratic in that document frequency. Grams whose df exceeds
``cap`` are star-collapsed: every occurrence matches only the gram's
MIN-id document (at that document's first occurrence position),
|B|·occ(keeper) rows instead of |B|(|B|-1)/2. The decision layer
survives the cap by construction — the min-keeper convention means
coverage claims BY the minimum document are exactly what the
keep-list consumes, and those are preserved EXACTLY (star rows pair
every member occurrence with every KEEPER occurrence of the gram, so
keeper-side diagonals are identical to the uncapped ones even when
the keeper holds stray extra copies of a gram; pinned by synthetic
test). Star rows carry the same 93-bit two-hash verify as the
enumerated arm.

Spans shorter than ``min_span`` tokens are noise (every ~5-token
phrase repeats somewhere); the reported unit is maximal spans >=
``min_span``, with exact (a_start, b_start) token offsets so a
downstream pass can cut the span out of the kept document — the
operation document-level dedup cannot express.

Cross-engine determinism: every fragment is emitted for both Spark SQL
and DuckDB from the same constants (md5 token codes are bit-identical
in both, the polynomial chains are plain BIGINT arithmetic on positive
operands — identical ``%`` semantics; window frames are pinned; all
island/coverage orderings are over keys proven unique per partition,
so row_number is deterministic).
"""

from __future__ import annotations

from flink_wsr_project_spark.operators.dedup import toks_expr

# w: tokens per positional gram. Small enough that any interesting
# span (>= min_span) contains many grams; large enough that a single
# gram is already a strong signal (8 tokens ~ 40+ chars).
SPAN_GRAM_TOKENS = 8

# Minimum maximal-span length to report, in tokens. Lee et al. use 50
# BPE tokens at web scale; the gate corpus' documents are tens of
# tokens long, so the shipped default is 16 — long enough that the
# sf0.01 corpus exercises BOTH branches (24 spans kept, 1 filtered).
SPAN_MIN_TOKENS = 16

# Coverage threshold for the keep-list, in permille of the document's
# tokens covered by spans shared with lower-id documents.
SPAN_DROP_PERMILLE = 500

# Polynomial gram-hash chains: three independent (base, modulus)
# pairs, all primes, modulus < 2^31 so one Horner step on a 60-bit
# token code stays far below 2^63 (h < M < 2^31, B < 2^21 ->
# h*B < 2^52; + c < 2^60 -> < 2^61). gh = chain0 * 2^31 + chain1
# (62 bits — birthday-safe as a join key at 100 TB gram counts);
# vh = chain2 (the independent 31-bit verify, the md5 scheme's
# two-hash discipline carried over).
SPAN_HASH_CHAINS = (
    (1000003, 2147483647),
    (999983, 2147483629),
    (1000033, 2147483587),
)

# Identity of the gram hashing scheme, recorded on persisted span
# stores (the image-block store's HASH_FORMAT discipline): a store
# hashed under one scheme must never be probed under another — the
# join keys would silently never match.
SPAN_HASH_FORMAT = "tok60poly31x3v1"


def _horner_expr(chain: int, w: int = SPAN_GRAM_TOKENS) -> str:
    """Unrolled Horner fold of one hash chain over the lead-window
    code columns c0..c{w-1} — plain positive BIGINT arithmetic, so
    Spark and DuckDB agree bit-for-bit and the whole expression stays
    inside whole-stage codegen (a lambda/HOF formulation is both
    interpreted AND blows up CollapseProject: the codes array gets
    inlined once per reference, ~35 s of optimizer time per submit —
    measured r15)."""
    b, m = SPAN_HASH_CHAINS[chain]
    h = f"(c0 % {m})"
    for j in range(1, w):
        h = f"(({h} * {b} + c{j}) % {m})"
    return h


def span_gram_hash_exprs(w: int = SPAN_GRAM_TOKENS) -> tuple[str, str]:
    """(gh_expr, vh_expr) over lead-window columns c0..c{w-1}."""
    gh = f"{_horner_expr(0, w)} * 2147483648 + {_horner_expr(1, w)}"
    vh = _horner_expr(2, w)
    return gh, vh


def span_token_code_expr(tok: str, engine: str) -> str:
    """60-bit per-token code: md5 prefix, computed ONCE per token
    occurrence (the only string hashing the span family pays). 60
    bits keeps vocabulary-level code collisions negligible (~1e8
    distinct tokens -> ~4e-3 expected colliding pairs); a colliding
    TOKEN pair is the only way two different grams can agree on all
    three chains at once."""
    if engine == "spark":
        return f"cast(conv(substr(md5({tok}), 1, 15), 16, 10) AS bigint)"
    return f"('0x' || substr(md5({tok}), 1, 15))::BIGINT"


def span_posgram_ctes(engine: str, source: str = "documents") -> str:
    """CTE chain ending in ``sp_pg(doc_id, pos, gh, vh)`` — one row per
    token position with the hashed ``w``-gram starting there. ``pos``
    is 0-based. Documents shorter than ``w`` tokens contribute no rows
    (they are still visible to the keep-list via ``sp_tok``).

    Spark shape (r17, the fused gram generator): each document's
    tokens are coded ONCE into an in-row array, and one generator
    emits (pos, w-code slice) structs — gh/vh are flat Horner
    arithmetic over ``element_at`` of the exploded slice. No window,
    so the (doc_id) exchange the lead() stack needed is GONE — gram
    building is now embarrassingly parallel over the scan (guide
    §2.4: remove shuffles outright). The two r15/r16 optimizer
    hazards are both structurally avoided: the codes array lives in a
    Project below the Generate (never inlined per reference — the
    r15 CollapseProject blowup), and the explode is OUTER so
    InferFiltersFromGenerate cannot push a computed-chain filter into
    the scan (the r16 neardup_bucket_claims pathology; the
    ``s IS NOT NULL`` filter above the generator keeps row parity
    with the inner explode). Values are bit-identical to the lead()
    form — same codes, same Horner chains (probe: 235,704 identical
    rows at sf0.1).

    DuckDB shape (unchanged — the oracle string must stay stable):
    tokens explode to (doc_id, pos, code) rows, the w codes of each
    gram line up as lead() columns over ONE (doc_id, pos) window, and
    gh/vh are the same flat-column Horner arithmetic."""
    w = SPAN_GRAM_TOKENS
    toks = toks_expr("text", engine)
    gh, vh = span_gram_hash_exprs(w)
    if engine == "spark":
        code = span_token_code_expr("x", engine)
        gh_s, vh_s = gh, vh
        for j in range(w - 1, -1, -1):
            gh_s = gh_s.replace(f"c{j}", f"element_at(s, {j + 1})")
            vh_s = vh_s.replace(f"c{j}", f"element_at(s, {j + 1})")
        return f"""sp_tok AS (
  SELECT doc_id, {toks} AS t FROM {source}
),
sp_codes AS (
  SELECT doc_id, transform(t, x -> {code}) AS codes
  FROM sp_tok WHERE size(t) >= {w}
),
sp_sl AS (
  SELECT doc_id, pos, s
  FROM sp_codes
  LATERAL VIEW OUTER posexplode(transform(sequence(0, size(codes) - {w}), p -> slice(codes, p + 1, {w}))) _pe AS pos, s
),
sp_pg AS (
  SELECT doc_id, pos,
         {gh_s} AS gh,
         {vh_s} AS vh
  FROM sp_sl WHERE s IS NOT NULL
)"""
    leads = ",\n         ".join(
        f"lead(c, {j}) OVER (PARTITION BY doc_id ORDER BY pos) AS c{j}"
        for j in range(1, w)
    )
    explode = f"""sp_ct AS (
  SELECT doc_id, i AS pos, {span_token_code_expr('t[i + 1]', engine)} AS c
  FROM sp_tok, unnest(range(len(t))) AS u(i)
  WHERE len(t) >= {w}
)"""
    return f"""sp_tok AS (
  SELECT doc_id, {toks} AS t FROM {source}
),
{explode},
sp_cw AS (
  SELECT doc_id, pos, c AS c0,
         {leads}
  FROM sp_ct
),
sp_pg AS (
  SELECT doc_id, pos,
         {gh} AS gh,
         {vh} AS vh
  FROM sp_cw WHERE c{w - 1} IS NOT NULL
)"""


def _span_cand_ctes(engine: str, cap: int | None) -> str:
    """CTEs ``sp_w1``/``sp_ann``/``sp_cand`` — the gram match with
    the df valve. ``cap=None`` enumerates every df >= 2 gram exactly
    (the uncapped variant whose volume the skew report prices); an
    integer cap star-collapses over-cap grams onto their min-id
    document (every keeper OCCURRENCE, so keeper-side claims are
    preserved exactly under any cap).

    Uniqueness proof for the downstream row_number: a position holds
    exactly one gram, so (doc_id, pos) determines gh, so every
    ``sp_cand`` row is unique in (doc_a, doc_b, pos_a, pos_b) — both
    branches pair two real gram sites, and the branches are
    df-disjoint (UNION ALL cannot double-count).

    BOTH sides of BOTH join arms carry redundant-but-true predicates
    on df/keeper (df is constant per gh, so b.df equals a.df on a
    gh-equi join; k IS the per-gh min, so k.doc_id = k.keeper) — NOT
    decoration: without them Catalyst column-prunes the window stack
    differently per side, the four join inputs stop being identical
    subtrees, and the gram hashing (the dominant cost — measured
    7.8 s of a 16.8 s total at sf0.1 under the r14 md5 scheme, ~6×
    cheaper under the r15 polynomial scheme but still the bulk) is
    recomputed per side, with the raw corpus-sized gram relation
    getting BROADCAST into the join (a 100 TB hazard). Identical
    sides share one gh exchange at runtime: sf0.1 measured
    16.8 s → 12.8 s first / 16.1 s → 8.8 s steady, and the broadcast
    of unshuffled posgrams is gone (r14)."""
    within = (
        "a.df >= 2 AND b.df >= 2 AND a.keeper <= a.doc_id AND b.keeper <= b.doc_id"
        if cap is None
        else f"a.df >= 2 AND a.df <= {cap} AND b.df >= 2 AND b.df <= {cap}"
        " AND a.keeper <= a.doc_id AND b.keeper <= b.doc_id"
    )
    # Star arm = the SAME self-join restricted to the keeper's own
    # rows: every member occurrence matches every KEEPER OCCURRENCE of
    # the gram (not a single precomputed keeper position — a keeper
    # holding a stray extra copy of a gram outside the shared run
    # would otherwise pull that gram onto the wrong diagonal and
    # fragment the keeper-side span, breaking the "keeper claims
    # preserved exactly" guarantee; r13 review finding). Row count per
    # over-cap gram: |members|·|keeper occurrences| — still linear in
    # the bucket, and star rows now carry the full 93-bit two-hash
    # verify like the enumerated arm.
    star = (
        ""
        if cap is None
        else f"""
  UNION ALL
  SELECT k.doc_id AS doc_a, k.pos AS pos_a, m.doc_id AS doc_b, m.pos AS pos_b
  FROM sp_ann m JOIN sp_ann k
    ON m.gh = k.gh AND k.doc_id = m.keeper AND m.vh = k.vh
  WHERE m.df > {cap} AND m.doc_id > m.keeper
    AND k.df > {cap} AND k.doc_id = k.keeper"""
    )
    # Gram stats as a WINDOW STACK on one partitioning, not
    # groupBy + window + join-back: every layer partitions by gh, so
    # Catalyst plans ONE gh exchange for both (df needs a distinct
    # doc count, which windows can't do directly — dense_rank over
    # doc_id then max of it is the standard identity). The self-joins'
    # sides are the identical subtree, so the runtime reuses that
    # exchange too.
    return f"""sp_w1 AS (
  SELECT doc_id, pos, gh, vh,
         min(doc_id) OVER (PARTITION BY gh) AS keeper,
         dense_rank() OVER (PARTITION BY gh ORDER BY doc_id) AS dr
  FROM sp_pg
),
sp_ann AS (
  SELECT doc_id, pos, gh, vh, keeper,
         max(dr) OVER (PARTITION BY gh) AS df
  FROM sp_w1
),
sp_cand AS (
  SELECT a.doc_id AS doc_a, a.pos AS pos_a, b.doc_id AS doc_b, b.pos AS pos_b
  FROM sp_ann a JOIN sp_ann b
    ON a.gh = b.gh AND a.doc_id < b.doc_id AND a.vh = b.vh
  WHERE {within}{star}
)"""


def _span_merge_ctes() -> str:
    """Engine-identical diagonal merge: gaps-and-islands over each
    (doc_a, doc_b, diagonal), yielding one row per MAXIMAL shared span
    with exact 0-based token offsets in both documents."""
    w = SPAN_GRAM_TOKENS
    return f"""sp_isl AS (
  SELECT doc_a, doc_b, pos_a - pos_b AS diag, pos_a,
         pos_a - row_number() OVER (
           PARTITION BY doc_a, doc_b, pos_a - pos_b ORDER BY pos_a) AS grp
  FROM sp_cand
),
sp_spans AS (
  SELECT doc_a, doc_b,
         CAST(min(pos_a) AS BIGINT) AS a_start,
         CAST(min(pos_a) - diag AS BIGINT) AS b_start,
         CAST(count(*) + {w - 1} AS BIGINT) AS span_tokens
  FROM sp_isl GROUP BY doc_a, doc_b, diag, grp
)"""


def span_pairs_sql(
    engine: str,
    cap: int | None,
    min_span: int = SPAN_MIN_TOKENS,
    source: str = "documents",
) -> str:
    """Full query: (doc_a, doc_b, a_start, b_start, span_tokens), one
    row per maximal shared span of >= ``min_span`` tokens. ``doc_a``
    is always the smaller id; offsets are 0-based token positions."""
    return f"""
WITH {span_posgram_ctes(engine, source)},
{_span_cand_ctes(engine, cap)},
{_span_merge_ctes()}
SELECT doc_a, doc_b, a_start, b_start, span_tokens
FROM sp_spans WHERE span_tokens >= {min_span}
"""


# Maximum matched-position gap the GAPPED variant bridges along a
# diagonal. A single token SUBSTITUTION at position p kills the w
# grams starting in (p-w+1 .. p) — the surviving neighbors are w+1
# apart — so gap = w bridges exactly the one-substitution case
# (insertions/deletions SHIFT the diagonal and are deliberately not
# bridged: a different diagonal is a different alignment).
SPAN_GAP_TOKENS = SPAN_GRAM_TOKENS


def span_pairs_gapped_sql(
    engine: str,
    cap: int | None,
    min_span: int = SPAN_MIN_TOKENS,
    gap: int = SPAN_GAP_TOKENS,
    source: str = "documents",
) -> str:
    """Near-verbatim variant of :func:`span_pairs_sql`: maximal spans
    whose matched gram positions may have interior gaps of up to
    ``gap`` along the same diagonal — bridging point substitutions
    that break the exact islands (each bridged gap of w is one edited
    token inside an otherwise verbatim run; the exact variant reports
    two spans, this one the full near-verbatim extent). Output adds
    ``matched_grams`` so consumers can see match density: for a span
    of t tokens with e substitutions, matched_grams ≈ t - w + 1 - e·w.
    Same candidate generation (cap valve included); the merge swaps
    the row_number identity for an explicit lag-gap island break —
    both engines, deterministic (positions are unique per diagonal)."""
    return f"""
WITH {span_posgram_ctes(engine, source)},
{_span_cand_ctes(engine, cap)},
sp_brk AS (
  SELECT doc_a, doc_b, pos_a - pos_b AS diag, pos_a,
         CASE WHEN lag(pos_a) OVER (
                PARTITION BY doc_a, doc_b, pos_a - pos_b ORDER BY pos_a
              ) IS NULL
              OR pos_a - lag(pos_a) OVER (
                PARTITION BY doc_a, doc_b, pos_a - pos_b ORDER BY pos_a
              ) > {gap + 1}
              THEN 1 ELSE 0 END AS brk
  FROM sp_cand
),
sp_gisl AS (
  SELECT doc_a, doc_b, diag, pos_a,
         sum(brk) OVER (
           PARTITION BY doc_a, doc_b, diag ORDER BY pos_a
         ) AS grp
  FROM sp_brk
),
sp_gspans AS (
  SELECT doc_a, doc_b, diag,
         CAST(min(pos_a) AS BIGINT) AS a_start,
         CAST(min(pos_a) - diag AS BIGINT) AS b_start,
         CAST(max(pos_a) - min(pos_a) + {SPAN_GRAM_TOKENS} AS BIGINT) AS span_tokens,
         CAST(count(*) AS BIGINT) AS matched_grams
  FROM sp_gisl GROUP BY doc_a, doc_b, diag, grp
)
SELECT doc_a, doc_b, a_start, b_start, span_tokens, matched_grams
FROM sp_gspans WHERE span_tokens >= {min_span}
"""


def span_decontaminate_sql(
    engine: str,
    cap: int,
    min_span: int = SPAN_MIN_TOKENS,
    source: str = "documents",
) -> str:
    """Span-level benchmark decontamination: every maximal verbatim
    span (>= min_span tokens) a TRAIN-split document shares with a
    TEST-split document, WITH positions on both sides — the upgrade
    over gram-overlap decontamination (``benchmark_decontaminate``
    says WHICH train docs leak; this says WHERE, so the remedy can be
    a span scrub instead of dropping the whole document). The split is
    ``dataset_splits``' content-independent doc_id hash (80/10/10;
    val plays no part), recomputable from doc_id alone, so no split
    column needs carrying through the gram index. Cap semantics differ
    from the dedup pair queries ON PURPOSE: grams in more than ``cap``
    documents are EXCLUDED rather than star-collapsed — ubiquitous
    boilerplate is not contamination evidence (the chunk-containment
    DF-cap stance: stop-shingles leave the index), and there is no
    keeper to collapse onto across the split boundary."""
    str_t = "STRING" if engine == "spark" else "VARCHAR"
    from flink_wsr_project_spark.operators.dedup import h28

    h = h28(f"concat('split:', CAST(doc_id AS {str_t}))", engine)
    w = SPAN_GRAM_TOKENS
    src = (
        f"(SELECT doc_id, text FROM {source} "
        f"WHERE {h} % 100 < 80 OR {h} % 100 >= 90)"
    )
    return f"""
WITH {span_posgram_ctes(engine, src)},
sp_spl AS (
  SELECT doc_id, pos, gh, vh,
         CASE WHEN {h} % 100 < 80 THEN 'train' ELSE 'test' END AS split
  FROM sp_pg
),
sp_w1 AS (
  SELECT doc_id, pos, gh, vh, split,
         dense_rank() OVER (PARTITION BY gh ORDER BY doc_id) AS dr
  FROM sp_spl
),
sp_okg AS (
  SELECT doc_id, pos, gh, vh, split,
         max(dr) OVER (PARTITION BY gh) AS df
  FROM sp_w1
),
sp_cand AS (
  SELECT t.doc_id AS test_doc, t.pos AS pos_t,
         r.doc_id AS train_doc, r.pos AS pos_r
  FROM sp_okg t JOIN sp_okg r
    ON t.gh = r.gh AND t.vh = r.vh
  WHERE t.split = 'test' AND r.split = 'train' AND t.df <= {cap}
),
sp_isl AS (
  SELECT test_doc, train_doc, pos_t - pos_r AS diag, pos_t,
         pos_t - row_number() OVER (
           PARTITION BY test_doc, train_doc, pos_t - pos_r ORDER BY pos_t) AS grp
  FROM sp_cand
),
sp_dspans AS (
  SELECT test_doc, train_doc,
         CAST(min(pos_t) AS BIGINT) AS test_start,
         CAST(min(pos_t) - diag AS BIGINT) AS train_start,
         CAST(count(*) + {w - 1} AS BIGINT) AS span_tokens
  FROM sp_isl GROUP BY test_doc, train_doc, diag, grp
)
SELECT test_doc, train_doc, test_start, train_start, span_tokens
FROM sp_dspans WHERE span_tokens >= {min_span}
"""


def span_gram_skew_sql(
    engine: str, cap: int, source: str = "documents"
) -> str:
    """One-row dashboard pricing the df valve — the family's
    no-silent-cap report: total grams, matchable (df >= 2) grams, the
    worst df, grams the cap star-collapses, and the exact match rows
    that saves (for an over-cap gram with per-doc occurrence counts
    occ_i: enumerated rows sum(occ_i*occ_j) over i<j =
    (total^2 - sum(occ^2)) / 2 — exactly even, so integer division is
    exact in both engines — minus the (total - keeper_occ) * keeper_occ
    star rows that still run: every member OCCURRENCE pairs with every
    keeper occurrence, matching the star arm in ``_span_cand_ctes``)."""
    div = "div" if engine == "spark" else "//"
    return f"""
WITH {span_posgram_ctes(engine, source)},
sp_go AS (
  SELECT gh, doc_id, count(*) AS occ FROM sp_pg GROUP BY gh, doc_id
),
sp_gw AS (
  SELECT gh, occ,
         count(*) OVER (PARTITION BY gh) AS df,
         first_value(occ) OVER (PARTITION BY gh ORDER BY doc_id) AS keeper_occ
  FROM sp_go
),
sp_gagg AS (
  SELECT gh, max(df) AS df, sum(occ) AS total_occ, sum(occ * occ) AS sq,
         max(keeper_occ) AS keeper_occ
  FROM sp_gw GROUP BY gh
)
SELECT CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS grams_matchable,
       CAST(max(df) AS BIGINT) AS max_df,
       CAST(sum(CASE WHEN df > {cap} THEN 1 ELSE 0 END) AS BIGINT) AS grams_capped,
       CAST(sum(CASE WHEN df > {cap}
                THEN (total_occ * total_occ - sq) {div} 2
                     - (total_occ - keeper_occ) * keeper_occ
                ELSE 0 END) AS BIGINT) AS match_rows_saved
FROM sp_gagg
"""


def interval_union_ctes() -> str:
    """Engine-identical interval-union CTEs (classic running-max
    island merge): expects ``sp_iv(doc_id, s, e)`` upstream; ends with
    ``sp_mg(doc_id, s, e)`` — the merged DISJOINT intervals per
    document. Deterministic under ties: two identical intervals (the
    same region claimed by two different partners) land in the same
    island whichever order the window visits them. Shared by the
    keep-list (coverage sum), the scrub (token cut), and the span
    store's probe (corpus/batch coverage split)."""
    return """sp_mk AS (
  SELECT doc_id, s, e,
         max(e) OVER (PARTITION BY doc_id ORDER BY s, e
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_e
  FROM sp_iv
),
sp_gr AS (
  SELECT doc_id, s, e,
         sum(CASE WHEN prev_e IS NULL OR s > prev_e THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY s, e) AS grp
  FROM sp_mk
),
sp_mg AS (
  SELECT doc_id, min(s) AS s, max(e) AS e FROM sp_gr GROUP BY doc_id, grp
)"""


def span_keep_list_sql(
    engine: str,
    cap: int | None,
    min_span: int = SPAN_MIN_TOKENS,
    threshold_permille: int = SPAN_DROP_PERMILLE,
    source: str = "documents",
) -> str:
    """Decision layer: one row per document with its token count, the
    tokens covered by the UNION of spans shared with lower-id
    documents (classic interval merge — running max of span ends per
    document, new island when a span starts past it), coverage in
    permille, and a drop/keep action at ``threshold_permille``. Only
    the HIGHER id of a pair accrues coverage (the min-keeper
    convention every dedup path here follows — the globally minimal
    document provably never drops). Documents shorter than the gram
    width have no measurable spans and keep: "not measurable" never
    means "drop" (the A/V duration-gate stance). The interval-merge
    running sum is deterministic under ties: two identical intervals
    (the same region claimed by two lower docs) land in the same
    island whichever order the window visits them."""
    div = "div" if engine == "spark" else "//"
    size_fn = "size" if engine == "spark" else "len"
    return f"""
WITH {span_posgram_ctes(engine, source)},
{_span_cand_ctes(engine, cap)},
{_span_merge_ctes()},
sp_f AS (
  SELECT * FROM sp_spans WHERE span_tokens >= {min_span}
),
sp_iv AS (
  SELECT doc_b AS doc_id, b_start AS s, b_start + span_tokens - 1 AS e FROM sp_f
),
{interval_union_ctes()},
sp_cv AS (
  SELECT doc_id, sum(e - s + 1) AS covered FROM sp_mg GROUP BY doc_id
),
sp_nt AS (
  SELECT doc_id, {size_fn}(t) AS n_tokens FROM sp_tok
)
SELECT n.doc_id,
       CAST(n.n_tokens AS BIGINT) AS n_tokens,
       CAST(coalesce(c.covered, 0) AS BIGINT) AS covered_tokens,
       CAST(coalesce(c.covered, 0) * 1000 {div} n.n_tokens AS BIGINT) AS coverage_permille,
       CASE WHEN coalesce(c.covered, 0) * 1000 >= {threshold_permille} * n.n_tokens
            THEN 'drop' ELSE 'keep' END AS action
FROM sp_nt n LEFT JOIN sp_cv c ON c.doc_id = n.doc_id
"""


def span_scrub_sql(
    engine: str,
    cap: int | None,
    min_span: int = SPAN_MIN_TOKENS,
    source: str = "documents",
) -> str:
    """The removal operator itself — what the span evidence exists
    for: cut every token covered by a span shared with a LOWER-id
    document out of the document, keeping the keeper's copy intact
    (Lee et al.'s actual operation: each repeated substring survives
    exactly once in the corpus). One row per document: original and
    removed token counts plus the scrubbed text, rebuilt from the kept
    tokens in position order with single spaces (tokenization is \\s+,
    so original whitespace runs are already canonicalized).

    Shape: the capped span evidence → merged disjoint intervals per
    document (the keep-list's interval union) → one positional token
    explode joined doc-equi against those intervals (disjoint, so a
    token matches at most one — the join cannot duplicate tokens) →
    order-preserving reassembly. The interval side is bounded by span
    count, not corpus size, and the explode is the same ~1 row/token
    scale the gram index already pays."""
    w = SPAN_GRAM_TOKENS
    if engine == "spark":
        tokpos = """sp_tp AS (
  SELECT doc_id, pos, tok FROM sp_tok LATERAL VIEW posexplode(t) _pe AS pos, tok
)"""
        # array_sort on an array of (pos, tok) structs orders by pos
        # (first field) — deterministic reassembly without relying on
        # aggregation order
        reassemble = (
            "concat_ws(' ', transform(array_sort(collect_list(named_struct("
            "'pos', pos, 'tok', tok))), s -> s.tok))"
        )
        size_fn = "size"
    else:
        tokpos = """sp_tp AS (
  SELECT doc_id, i AS pos, t[i + 1] AS tok FROM sp_tok, unnest(range(len(t))) AS u(i)
)"""
        reassemble = "string_agg(tok, ' ' ORDER BY pos)"
        size_fn = "len"
    return f"""
WITH {span_posgram_ctes(engine, source)},
{_span_cand_ctes(engine, cap)},
{_span_merge_ctes()},
sp_f AS (
  SELECT * FROM sp_spans WHERE span_tokens >= {min_span}
),
sp_iv AS (
  SELECT doc_b AS doc_id, b_start AS s, b_start + span_tokens - 1 AS e FROM sp_f
),
{interval_union_ctes()},
{tokpos},
sp_keep AS (
  SELECT tp.doc_id, tp.pos, tp.tok
  FROM sp_tp tp LEFT JOIN sp_mg m
    ON m.doc_id = tp.doc_id AND tp.pos >= m.s AND tp.pos <= m.e
  WHERE m.s IS NULL
),
sp_out AS (
  SELECT doc_id, count(*) AS n_kept, {reassemble} AS scrubbed_text
  FROM sp_keep GROUP BY doc_id
),
sp_nt AS (
  SELECT doc_id, {size_fn}(t) AS n_tokens FROM sp_tok
)
SELECT n.doc_id,
       CAST(n.n_tokens AS BIGINT) AS n_tokens,
       CAST(n.n_tokens - coalesce(o.n_kept, 0) AS BIGINT) AS tokens_removed,
       coalesce(o.scrubbed_text, '') AS scrubbed_text
FROM sp_nt n LEFT JOIN sp_out o ON o.doc_id = n.doc_id
"""
