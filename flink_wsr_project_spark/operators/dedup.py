"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Cross-engine determinism contract: every hash primitive is defined as a
pair of SQL fragments — one Spark SQL, one DuckDB — built from the SAME
Python constants, so the oracle comparison is bit-exact:

* ``h28(s)``: first 7 hex chars of md5 → 28-bit positive int
  (md5 is identical in both engines; 28 bits keeps ``a*h + b`` within
  int64 for 31-bit coefficients).
* MinHash permutation k: ``(a_k * h28(shingle) + b_k) mod p`` with
  ``p = 2^31 - 1`` and fixed (a_k, b_k) literals.
* SimHash: 32-bit, ±1 vote per token hash bit, majority per bit.

Scale design: signatures are computed in one pass per document (no
row explosion for minhash — higher-order array functions fold over the
shingle array in place). LSH banding turns the O(n²) pair search into
an equi-join on (band_index, band_hash): candidates shuffle only on
band keys, and the exact-Jaccard verify runs per candidate pair. At
100 TB the only quadratic term is within-bucket pairs, which banding
bounds.
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
    """MinHash value for permutation k over a shingle-array expression.

    Column-expression form (hashes the shingles inline) — used where a
    single permutation is applied (the text fingerprint is the one
    production caller). Multi-permutation paths — batch signatures AND
    the streaming fold's per-column exprs — go through
    ``hashed_cte`` + ``minhash_from_hashed_expr`` instead, which hash
    each shingle ONCE for all 16 permutations (same values, 16× fewer
    md5 calls — the md5 is the dominant cost of signature computation,
    measured at 40 s/50 k docs when recomputed per permutation)."""
    a, b = PERMS[k]
    hv = h28("s", engine)
    body = f"({a} * {hv} + {b}) % {MINHASH_P}"
    if engine == "spark":
        return f"array_min(transform({shingles}, s -> {body}))"
    return f"list_min(list_transform({shingles}, s -> {body}))"


def hashed_cte(engine: str) -> str:
    """CTE producing (doc_id, hv): the 28-bit hash of every shingle,
    computed once and folded by all permutations downstream."""
    hv = h28("s", engine)
    if engine == "spark":
        arr = f"transform(sh, s -> {hv})"
    else:
        arr = f"list_transform(sh, s -> {hv})"
    return f"hashed AS (SELECT doc_id, {arr} AS hv FROM shingled)"


def minhash_from_hashed_expr(k: int, engine: str, arr: str = "hv") -> str:
    """MinHash value for permutation k over a pre-hashed int array
    ``arr`` (see ``hashed_cte``) — pure arithmetic, no md5."""
    a, b = PERMS[k]
    body = f"({a} * v + {b}) % {MINHASH_P}"
    if engine == "spark":
        return f"array_min(transform({arr}, v -> {body}))"
    return f"list_min(list_transform({arr}, v -> {body}))"


def band_hash_expr(mh_cols: list[str], engine: str) -> str:
    """Stable string hash of one band's minhash values."""
    if engine == "spark":
        inner = ", ".join(f"cast({c} as string)" for c in mh_cols)
        return f"md5(concat_ws('_', {inner}))"
    inner = " || '_' || ".join(f"{c}::VARCHAR" for c in mh_cols)
    return f"md5({inner})"


def signature_sql(engine: str, source: str = "documents") -> str:
    """Full signature projection: doc_id, mh0..mhK-1, band0..bandB-1.

    Single scan, no explode: each shingle is md5-hashed ONCE
    (``hashed_cte``), then all 16 permutations fold pure arithmetic
    over the int array. Value-identical to hashing inside each fold
    but ~16× cheaper — md5 is the dominant signature cost.
    """
    mh_cols = ",\n       ".join(
        f"{minhash_from_hashed_expr(k, engine)} AS mh{k}" for k in range(N_PERMS)
    )
    bands = ",\n       ".join(
        band_hash_expr([f"mh{b * BAND_SIZE + j}" for j in range(BAND_SIZE)], engine)
        + f" AS band{b}"
        for b in range(N_BANDS)
    )
    return (
        f"WITH {shingled_cte(engine, source)},\n"
        f"{hashed_cte(engine)},\n"
        f"sigs AS (SELECT doc_id,\n       {mh_cols}\n  FROM hashed)\n"
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
