"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Cross-engine determinism contract: every hash primitive is defined as a
pair of SQL fragments — one Spark SQL, one DuckDB — built from the SAME
Python constants, so the oracle comparison is bit-exact:

* shingle hash (r16): each TOKEN is coded once as a 60-bit md5 prefix
  (``tok_code_expr``; md5 is identical in both engines), and the
  3-token shingle hash is one Horner polynomial chain over the codes
  mod a 31-bit prime — pure BIGINT arithmetic after the per-token
  md5, so the whole signature path is whole-stage codegen on Spark
  (the span family's r15 template; before r16 each shingle was built
  as a ~15-30-char STRING per token position and md5-hashed, with the
  16 permutation folds interpreted per element — the last
  interpreted-expression hot spot, ~19% of the pipeline bench).
* MinHash permutation k: ``(a_k * shingle_hash + b_k) mod p`` with
  ``p = 2^31 - 1`` and fixed (a_k, b_k) literals (a·h + b < 2^63 for
  a, b, h < 2^31 — no int64 overflow in either engine).
* SimHash: 60-bit, ±1 vote per token hash bit, majority per bit.

Collision posture of the shingle hash: a FALSE shingle match needs
either two distinct tokens sharing a 60-bit code (vocab-level, ~4e-3
expected colliding pairs at a 1e8-token vocabulary) or a fixed base
hitting a root of the code-difference polynomial mod the 31-bit prime
(~n/2^31 per distinct shingle pair) — and minhash is an ESTIMATOR
whose candidates are re-verified with exact string-shingle Jaccard,
so a collision shifts one estimate, never a verified decision.

Scale design: the batch signature path explodes tokens and partially
aggregates the 16 permutation minima map-side, so the only exchange
carries ~one row per document (see ``signature_sql``); the streaming
clone computes the same values in-row (``shingle_hash_array_expr``).
LSH banding turns the O(n²) pair search into an equi-join on
(band_index, band_hash): candidates shuffle only on band keys, and
the exact-Jaccard verify runs per candidate pair. At 100 TB the only
quadratic term is within-bucket pairs, which banding bounds.
"""

from __future__ import annotations

MINHASH_P = 2_147_483_647  # 2^31 - 1 (prime)
N_PERMS = 16
BAND_SIZE = 4
N_BANDS = N_PERMS // BAND_SIZE

# fixed permutation coefficients (deterministic literals baked into both engines)
PERMS = [
    ((2 * k + 1) * 1_299_721 % MINHASH_P, (k * 15_485_863 + 32_452_843) % MINHASH_P)
    for k in range(N_PERMS)
]

# Shingle-hash polynomial chain (r16): one (base, modulus) prime pair,
# distinct from every span-family chain (operators/spans.py) so the
# two gram-hash families stay statistically independent. Bound proof
# (both engines are int64): h < M < 2^31, B < 2^20 → h·B < 2^51;
# + token code c < 2^60 → < 2^61. Permutation fold: a_k < p ≈ 2^31,
# h < M ≤ p → a_k·h + b_k < 2^63.
SIG_CHAIN_B = 1_000_033
SIG_CHAIN_M = 2_147_483_647

# Number of tokens per shingle (word 3-grams, unchanged since r1).
SHINGLE_N = 3

# Identity of the signature hashing scheme, recorded on persisted
# signature stores and ingest state (the span/image store HASH_FORMAT
# discipline): state hashed under one scheme must never be probed
# under another — the band keys would silently never match and every
# true dup would decide 'keep'. v1 was the md5-per-shingle-string
# scheme (r1–r15); v2 is the polynomial token-code scheme.
SIG_HASH_FORMAT = "tok60poly31v2"


def h28(s: str, engine: str) -> str:
    """28-bit md5-prefix hash of a string expression."""
    if engine == "spark":
        return f"cast(conv(substr(md5({s}),1,7),16,10) as bigint)"
    return f"('0x'||substr(md5({s}),1,7))::BIGINT"


def toks_expr(text: str, engine: str) -> str:
    """Whitespace tokenization."""
    if engine == "spark":
        return f"split(trim({text}), '\\\\s+')"
    return rf"regexp_split_to_array(trim({text}), '\s+')"


def shingles_from_toks(t: str, text: str, engine: str, n: int = 3) -> str:
    """Word n-gram shingles from a token-array column ``t`` (n=3);
    whole trimmed text if shorter than n tokens."""
    if engine == "spark":
        gram = ", ".join(f"{t}[i+{j}]" for j in range(n))
        return (
            f"CASE WHEN size({t}) < {n} THEN array(trim({text})) "
            f"ELSE transform(sequence(0, size({t})-{n}), i -> concat_ws(' ', {gram})) END"
        )
    gram = " || ' ' || ".join(f"{t}[i+{j}]" for j in range(1, n + 1))
    return (
        f"CASE WHEN len({t}) < {n} THEN [trim({text})] "
        f"ELSE list_transform(range(len({t})-{n - 1}), i -> {gram}) END"
    )


def shingled_cte(engine: str, source: str = "documents") -> str:
    """CTE producing (doc_id, sh): tokenize once, then shingle."""
    return (
        f"tokd AS (SELECT doc_id, text, {toks_expr('text', engine)} AS t FROM {source}),\n"
        f"shingled AS (SELECT doc_id, {shingles_from_toks('t', 'text', engine)} AS sh FROM tokd)"
    )


def minhash_expr(shingles: str, k: int, engine: str) -> str:
    """MinHash value for permutation k over a shingle-STRING-array
    expression, hashing each shingle inline with the legacy
    md5-per-shingle h28 — used where a single permutation is applied
    to an existing string-shingle array (the text fingerprint is the
    one production caller; its published fingerprint values
    deliberately did not change in the r16 signature rewrite).
    Multi-permutation SIGNATURE paths use the polynomial token-code
    scheme instead (``signature_sql`` / ``shingle_hash_array_expr``)."""
    a, b = PERMS[k]
    hv = h28("s", engine)
    body = f"({a} * {hv} + {b}) % {MINHASH_P}"
    if engine == "spark":
        return f"array_min(transform({shingles}, s -> {body}))"
    return f"list_min(list_transform({shingles}, s -> {body}))"


def tok_code_expr(tok: str, engine: str) -> str:
    """60-bit per-token code: md5 prefix, computed once per token
    occurrence — the only string hashing the signature path pays
    (same construction as the span family's token code; the two
    families then diverge on independent polynomial chains)."""
    if engine == "spark":
        return f"cast(conv(substr(md5({tok}), 1, 15), 16, 10) AS bigint)"
    return f"('0x' || substr(md5({tok}), 1, 15))::BIGINT"


def _shingle_horner(codes: list[str]) -> str:
    """Unrolled Horner fold of the signature chain over token-code
    expressions — plain positive BIGINT arithmetic, bit-identical in
    Spark and DuckDB, whole-stage codegen on Spark."""
    h = f"({codes[0]} % {SIG_CHAIN_M})"
    for c in codes[1:]:
        h = f"(({h} * {SIG_CHAIN_B} + {c}) % {SIG_CHAIN_M})"
    return h


def shingle_hash_array_expr(t: str, txt: str, engine: str, n: int = SHINGLE_N) -> str:
    """In-row array of shingle hashes for a token-array column ``t``
    (whole trimmed text ``txt`` as the single shingle when shorter
    than ``n`` tokens — the same fallback the string-shingle path
    uses). ``t`` and ``txt`` MUST be plain column references: the
    lambda indexes ``t`` once per gram position, so a full expression
    there would be re-evaluated per element.

    This is the STREAMING/in-row form (micro-batches cannot run the
    exploded window/aggregate shape); the batch ``signature_sql``
    computes the identical values via explode + partial aggregation.
    Equality of the two forms is pinned in tests/test_properties.py."""
    fallback = _shingle_horner([tok_code_expr(txt, engine)])
    if engine == "spark":
        gram = _shingle_horner(
            [tok_code_expr(f"{t}[i+{j}]", engine) for j in range(n)]
        )
        return (
            f"CASE WHEN size({t}) < {n} THEN array({fallback}) "
            f"ELSE transform(sequence(0, size({t})-{n}), i -> {gram}) END"
        )
    gram = _shingle_horner(
        [tok_code_expr(f"{t}[i+{j}]", engine) for j in range(1, n + 1)]
    )
    return (
        f"CASE WHEN len({t}) < {n} THEN [{fallback}] "
        f"ELSE list_transform(range(len({t})-{n - 1}), i -> {gram}) END"
    )


def sig_shingle_rows_ctes(engine: str, source: str = "documents") -> str:
    """CTE chain ending in ``mh_sh(doc_id, shh)`` — one row per shingle
    position with its polynomial hash. The names are ``mh_``-prefixed
    so consumers can compose this next to ``shingled_cte`` (the
    string-shingle CTE the Jaccard verify still uses) without CTE
    shadowing.

    Spark shape: explode ``sequence(0, size(t)-n)`` and index the
    in-row token array directly — each token is md5-coded ``n`` times
    (once per gram it participates in), but every expression is
    whole-stage codegen and, crucially, there is NO exchange of token
    rows: the 16 permutation minima partially aggregate map-side
    inside the same stage (see ``signature_sql``), so the only shuffle
    the signature pays carries ~one row per document. (The span family
    chose explode + lead() instead because its grams are w=8 wide —
    8× md5 would dominate; at n=3 the md5 repeat is cheaper than a
    corpus-sized token exchange.) Documents shorter than ``n`` tokens
    contribute their whole-text fallback row via the UNION arm, which
    also keeps ``sequence()`` away from negative spans."""
    n = SHINGLE_N
    toks = toks_expr("text", engine)
    fallback = _shingle_horner([tok_code_expr("txt", engine)])
    if engine == "spark":
        gram = _shingle_horner(
            [tok_code_expr(f"t[i+{j}]", "spark") for j in range(n)]
        )
        rows = f"""mh_sh AS (
  SELECT doc_id, {gram} AS shh
  FROM (SELECT doc_id, t FROM mh_tok WHERE size(t) >= {n}) _mt
  LATERAL VIEW explode(sequence(0, size(t) - {n})) _pe AS i
  UNION ALL
  SELECT doc_id, {fallback} AS shh FROM mh_tok WHERE size(t) < {n}
)"""
    else:
        rows = f"""mh_sha AS (
  SELECT doc_id, {shingle_hash_array_expr('t', 'txt', 'duckdb')} AS shs FROM mh_tok
),
mh_sh AS (
  SELECT doc_id, unnest(shs) AS shh FROM mh_sha
)"""
    return (
        f"mh_tok AS (SELECT doc_id, trim(text) AS txt, {toks} AS t FROM {source}),\n"
        f"{rows}"
    )


def minhash_from_hashed_expr(k: int, engine: str, arr: str = "hv") -> str:
    """MinHash value for permutation k over a pre-hashed int array
    ``arr`` (e.g. ``shingle_hash_array_expr``'s output) — pure
    arithmetic, no md5."""
    a, b = PERMS[k]
    body = f"({a} * v + {b}) % {MINHASH_P}"
    if engine == "spark":
        return f"array_min(transform({arr}, v -> {body}))"
    return f"list_min(list_transform({arr}, v -> {body}))"


def minhash_agg_expr(k: int) -> str:
    """MinHash value for permutation k as an AGGREGATE over per-row
    shingle hashes ``shh`` (the exploded form) — engine-identical SQL,
    codegen on Spark with map-side partial min."""
    a, b = PERMS[k]
    return f"min(({a} * shh + {b}) % {MINHASH_P})"


def band_hash_expr(mh_cols: list[str], engine: str) -> str:
    """Stable string hash of one band's minhash values."""
    if engine == "spark":
        inner = ", ".join(f"cast({c} as string)" for c in mh_cols)
        return f"md5(concat_ws('_', {inner}))"
    inner = " || '_' || ".join(f"{c}::VARCHAR" for c in mh_cols)
    return f"md5({inner})"


def signature_sql(engine: str, source: str = "documents") -> str:
    """Full signature projection: doc_id, band0..bandB-1.

    r16 shape (the span family's polynomial template): tokens explode
    in-place, each shingle hash is one Horner chain over 60-bit token
    codes, and the 16 permutation minima aggregate per document — ALL
    of it whole-stage codegen on Spark (the pre-r16 scheme built one
    shingle STRING per token position and folded 16 interpreted HOF
    lambdas over the md5 array). The hash aggregate partially combines
    map-side inside the explode's stage, so the single exchange this
    plan adds carries ~one 136-byte row per DOCUMENT (doc_id + 16
    minima), not per token — at 100 TB that is the cheapest shuffle in
    the family, and strictly cheaper than shipping text anywhere.
    Band hashes then collapse the 16 minima to 4 join keys in a final
    in-row projection."""
    mh_cols = ",\n       ".join(
        f"{minhash_agg_expr(k)} AS mh{k}" for k in range(N_PERMS)
    )
    bands = ",\n       ".join(
        band_hash_expr([f"mh{b * BAND_SIZE + j}" for j in range(BAND_SIZE)], engine)
        + f" AS band{b}"
        for b in range(N_BANDS)
    )
    return (
        f"WITH {sig_shingle_rows_ctes(engine, source)},\n"
        f"sigs AS (SELECT doc_id,\n       {mh_cols}\n  FROM mh_sh GROUP BY doc_id)\n"
        f"SELECT doc_id,\n       {bands}\n  FROM sigs"
    )


def longsigs_select(engine: str) -> str:
    """SELECT body turning the wide ``sigs`` signature row into long
    format ``(doc_id, b, h)`` — one row per (doc, band). Spark explodes
    in-row (``posexplode``, no shuffle); DuckDB lacks LATERAL VIEW so
    the oracle unions four projections (same rows, oracle-scale only).
    Shared by the composed-chain edge contract, the incremental dedup
    query, and the persisted signature store, so all three ride the
    identical long-format layout."""
    if engine == "spark":
        return (
            "SELECT doc_id, pe.pos AS b, pe.col AS h"
            " FROM sigs LATERAL VIEW posexplode(array(band0, band1, band2, band3))"
            " pe AS pos, col"
        )
    return "\n  UNION ALL\n".join(
        f"  SELECT doc_id, {b_} AS b, band{b_} AS h FROM sigs"
        for b_ in range(N_BANDS)
    )


def jaccard_expr(a: str, b: str, engine: str) -> str:
    """Exact Jaccard over two shingle-array expressions (distinct sets).

    int/int division → double in both engines; intersection/union sizes
    are integers, so the result is a single deterministic IEEE op.
    """
    if engine == "spark":
        na, nb = f"size(array_distinct({a}))", f"size(array_distinct({b}))"
        inter = f"size(array_intersect({a}, {b}))"
    else:
        na, nb = f"len(list_distinct({a}))", f"len(list_distinct({b}))"
        inter = f"len(list_intersect({a}, {b}))"
    return f"{inter} / ({na} + {nb} - {inter})"


# 60 SimHash bits (r12; was 32 until round 11). Two reasons, both the
# image-dedup lesson (VERDICT r11 #1) applied to text:
# (1) the token hash was h28, so bits 28-31 of the "32-bit" simhash
#     were CONSTANT ZERO — the blocked variant's 4th byte-block had
#     ≤16 distinct values, an n²/32 candidate generator on its own;
# (2) Hamming ≤ 3 of 32 bits tolerates ~9% bit noise — 1,387 "pairs"
#     in the 500-doc test corpus, mostly hash coincidence (measured;
#     the 60-bit hash finds 13, the true near-dup structure).
# 60 = 15 hex chars of md5 → positive BIGINT in both engines (16
# chars could set the sign bit, which DuckDB's '0x..'::BIGINT cast
# rejects); 4×15-bit blocks keep the pigeonhole cover of Hamming ≤ 3
# with 32,768 values per block key.
SIMHASH_BITS = 60
SIMHASH_BLOCK_BITS = SIMHASH_BITS // 4


def h60(s: str, engine: str) -> str:
    """60-bit md5-prefix hash of a string expression (the SimHash token
    hash — see SIMHASH_BITS; minhash keeps h28 so its a·h+b stays in
    int64)."""
    if engine == "spark":
        return f"cast(conv(substr(md5({s}),1,15),16,10) as bigint)"
    return f"('0x'||substr(md5({s}),1,15))::BIGINT"


def simhash_bit_sums(hv: str, engine: str) -> list[str]:
    """±1 vote per bit of a token-hash column; one SUM expr per bit."""
    out = []
    for b in range(SIMHASH_BITS):
        shifted = f"shiftright({hv}, {b})" if engine == "spark" else f"({hv} >> {b})"
        out.append(f"sum(CASE WHEN ({shifted} & 1) = 1 THEN 1 ELSE -1 END) AS bs{b}")
    return out


def simhash_combine(engine: str) -> str:
    """Fold the 60 bit-majority sums into one BIGINT (bit 59 < the
    sign bit, so no two's-complement handling is needed)."""
    terms = " + ".join(
        f"(CASE WHEN bs{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for b in range(SIMHASH_BITS)
    )
    return terms


def simhash_sql(engine: str, source: str = "documents") -> str:
    """doc_id → 60-bit SimHash over whitespace tokens (frequency-weighted
    via duplicate tokens)."""
    t = toks_expr("text", engine)
    if engine == "spark":
        tok = f"SELECT doc_id, explode({t}) AS tok FROM {source}"
    else:
        tok = f"SELECT doc_id, unnest({t}) AS tok FROM {source}"
    hv = h60("tok", engine)
    sums = ",\n       ".join(simhash_bit_sums("hv", engine))
    return (
        f"WITH tok AS ({tok}),\n"
        f"h AS (SELECT doc_id, {hv} AS hv FROM tok),\n"
        f"bits AS (SELECT doc_id,\n       {sums}\n  FROM h GROUP BY doc_id)\n"
        f"SELECT doc_id, {simhash_combine(engine)} AS simhash FROM bits"
    )


def hamming_expr(a: str, b: str, engine: str) -> str:
    if engine == "spark":
        return f"cast(bit_count({a} ^ {b}) as bigint)"
    return f"CAST(bit_count(CAST(xor({a}, {b}) AS BIGINT)) AS BIGINT)"
