"""Similarity search over embedding columns (array<float>).

Two paths, per the scale mandate:

* **Brute-force cosine top-k** — the exactness baseline. Query set ×
  corpus join, cosine per pair, row_number per query. Correct at any
  k; O(|Q|·|C|·d) — fine for |Q| small, and the broadcast of the query
  side means the corpus is scanned exactly once with no shuffle.
* **SRP-LSH (signed random projection)** — the scale path. Each vector
  folds into an 8-bit bucket (sign of dot with 8 fixed deterministic
  hyperplanes); candidate pairs only form within a bucket, turning the
  O(n²) pair space into per-bucket blocks. Hyperplane weights come from
  an LCG formula, identical literals in both engines.

Determinism: dot products are explicit left folds over the array in
index order with element-wise float→double casts — both engines
perform the identical IEEE op sequence, so cosines are bit-exact and
oracle-checkable (no "approximately equal" needed).
"""

from __future__ import annotations

SRP_BITS = 8
# LCG-derived hyperplane weight in [-1, 1): w(j, i) deterministic literal math
_LCG_A, _LCG_C, _LCG_M = 1_103_515_245, 12_345, 65_536


def srp_weight_expr(j: int, i: str, engine: str) -> str:
    """Weight of hyperplane j at dimension i (expression in i)."""
    idx = f"CAST({j} * 64 + {i} AS BIGINT)"
    lcg = f"((CAST({_LCG_A} AS BIGINT) * {idx} + {_LCG_C}) % {_LCG_M})"
    return f"({lcg} / 32768.0 - 1.0)"


def dot_expr(a: str, b: str, engine: str) -> str:
    """Left-fold dot product of two float arrays, promoted to double."""
    if engine == "spark":
        return (
            f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), "
            f"cast(0.0 as double), (acc, v) -> acc + v)"
        )
    return (
        f"list_reduce(list_transform(range(len({a})), i -> "
        f"CAST({a}[i+1] AS DOUBLE) * CAST({b}[i+1] AS DOUBLE)), (x, y) -> x + y)"
    )


def cosine_expr(a: str, b: str, engine: str) -> str:
    """Cosine similarity, NULL when either vector has zero norm.

    The zero-norm guard is not cosmetic: under Spark 4's default ANSI
    mode a 0/0 division throws DIVIDE_BY_ZERO and kills the whole job
    (batch query or streaming probe) the moment one degenerate vector
    appears — at 100 TB a zero embedding somewhere is a certainty.
    NULL is the honest value ("similarity undefined"), and the same
    CASE runs identically in DuckDB so oracles stay byte-comparable.
    Consumers that rank must filter NULL scores (ann_probe_stream
    does); Catalyst's common-subexpression elimination collapses the
    repeated self-dot-products.
    """
    na, nb = dot_expr(a, a, engine), dot_expr(b, b, engine)
    return (
        f"(CASE WHEN ({na}) = 0.0 OR ({nb}) = 0.0 THEN NULL "
        f"ELSE {dot_expr(a, b, engine)} / (sqrt({na}) * sqrt({nb})) END)"
    )


def cosine_prenorm_expr(a: str, b: str, na: str, nb: str, engine: str) -> str:
    """Cosine with PRECOMPUTED self-dot-products (r16, optimization
    guide §1.2 "per-task work": hoist per-ROW quantities out of
    per-PAIR evaluation).

    ``cosine_expr`` inlines dot(a,a) and dot(b,b) next to the cross
    dot, and in a join condition every candidate PAIR re-folds both
    self-dots — the three interpreted-HOF folds (plus the CASE guard's
    repeats; CSE does not reliably collapse them inside join
    conditions) made the label-blocked pair join 5.4 s at sf0.1.
    Computing ``nd = dot(v, v)`` once per row on each join INPUT and
    passing the column names here leaves one fold per pair: measured
    2.2 s on the same join, identical match counts. Bit-exact: the
    per-row fold is the same left-fold ``dot_expr`` emits, so
    sqrt/division see the same doubles. The guard compares the same
    values, and NULL/zero-norm behavior is unchanged."""
    return (
        f"(CASE WHEN {na} = 0.0 OR {nb} = 0.0 THEN NULL "
        f"ELSE {dot_expr(a, b, engine)} / (sqrt({na}) * sqrt({nb})) END)"
    )


def srp_bucket_expr(v: str, engine: str, table: int = 0) -> str:
    """8-bit SRP bucket id of a vector expression.

    ``table`` selects an INDEPENDENT hyperplane set (standard
    L-tables LSH): table t draws its 8 hyperplanes from LCG rows
    t·SRP_BITS+j, so distinct tables share no weights (row stride is
    64 = the embedding dim, so (table, bit, dim) indices never
    collide). ``table=0`` is bit-identical to the original
    single-table expression — every existing batch query and oracle
    is unchanged."""
    terms = []
    for j_ in range(SRP_BITS):
        j = table * SRP_BITS + j_
        if engine == "spark":
            proj = (
                f"aggregate(transform({v}, (x, i) -> cast(x as double) * {srp_weight_expr(j, 'i', 'spark')}), "
                f"cast(0.0 as double), (acc, p) -> acc + p)"
            )
        else:
            proj = (
                f"list_reduce(list_transform(range(len({v})), i -> "
                f"CAST({v}[i+1] AS DOUBLE) * {srp_weight_expr(j, 'i', 'duckdb')}), (x, y) -> x + y)"
            )
        terms.append(f"(CASE WHEN {proj} > 0 THEN {1 << j_} ELSE 0 END)")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"
