"""Distributed PCA over an embedding column.

The 100 TB shape of principal-component analysis: the data never moves
— only a d x d Gram matrix does.

1. **Per-task Gram accumulation** (``mapInPandas``, Arrow-batched,
   BLAS ``X^T X`` — the one place Python beats codegen because the
   inner loop is a matrix multiply): each task folds ALL its batches
   into a single (count, column-sum, Gram) partial and emits ONE row.
   Values are integer-scaled (``floor(x*scale + 0.5)`` as int64, in
   float64, half-up — reproducible in ANSI SQL) before
   multiplication, so partial sums are ASSOCIATIVE AND EXACT — the
   result is bit-identical under any partitioning, per the house
   determinism rule. (Overflow budget: |x|<=1, scale=1e3 -> 1e6 per
   product; int64 holds ~9.2e18, so ~9e12 rows per dimension pair —
   beyond 100 TB of 64-dim vectors.)
2. **Element-wise merge**: partials explode to (pos, value) and sum
   per position — 1 row per task in, d^2 groups out, map-side partial
   aggregation makes the shuffle O(d^2) per task.
3. **Driver eigendecomposition**: the d x d covariance is KBs;
   ``numpy.linalg.eigh`` on the driver is the correct placement (cost
   is O(d^3), independent of data size). Component signs are
   canonicalized (largest-|coordinate| positive) so results don't
   flip run to run.
4. **Distributed projection**: each component becomes a literal array
   in a codegen'd ``aggregate(zip_with(...))`` fold — JVM-side,
   deterministic left-to-right order, no Python in the projection.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame, functions as F

_SCALE = 1000


def gram_partials(df: DataFrame, vec_col: str, d: int) -> DataFrame:
    """One row per task: (n, colsum[d], gram[d*d]) with integer-scaled
    exact sums."""

    def acc(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        n, colsum, gram = 0, None, None
        for pdf in batches:
            if not len(pdf):
                continue
            # float64 + explicit half-up: Arrow hands float32 arrays, and
            # single-precision *1000 rounds differently (0.3195f*1000 is
            # exactly 319.5 in float32); np.rint's banker's ties would also
            # diverge from SQL engines' half-away round. floor(x*s + 0.5)
            # in float64 is the one quantization both sides express exactly.
            x = np.floor(
                np.stack(pdf[vec_col].values).astype(np.float64) * _SCALE + 0.5
            ).astype(np.int64)
            n += len(x)
            colsum = x.sum(axis=0) if colsum is None else colsum + x.sum(axis=0)
            g = x.T @ x
            gram = g if gram is None else gram + g
        if n:
            yield pd.DataFrame(
                {"n": [n], "colsum": [colsum.tolist()], "gram": [gram.ravel().tolist()]}
            )

    return df.select(vec_col).mapInPandas(
        acc, schema="n long, colsum array<long>, gram array<long>"
    )


def integer_moments(df: DataFrame, vec_col: str, d: int):
    """Exact integer moments (colsum[d], gram[d][d], n) as plain
    Python ints — the deterministic substrate both the float
    covariance and the power-iteration oracle build on. Only O(tasks)
    rows ever reach the merge and only d + d*d scalars the driver."""
    parts = gram_partials(df, vec_col, d)
    merged = (
        parts.select(
            "n",
            F.posexplode(
                F.concat(F.col("colsum").cast("array<long>"), F.col("gram"))
            ).alias("pos", "v"),
        )
        .groupBy("pos")
        .agg(F.sum("v").alias("v"), F.sum(F.when(F.col("pos") == 0, F.col("n"))).alias("n"))
    )
    rows = merged.collect()  # d + d*d scalars — driver-safe at any data size
    total_n = int(next(r.n for r in rows if r.pos == 0))
    flat = [0] * (d + d * d)
    for r in rows:
        flat[r.pos] = int(r.v)
    colsum = flat[:d]
    gram = [flat[d + i * d : d + (i + 1) * d] for i in range(d)]
    return colsum, gram, total_n


def covariance(df: DataFrame, vec_col: str, d: int):
    """Exact (integer-scaled) covariance matrix + mean as numpy
    arrays."""
    import numpy as np

    colsum_l, gram_l, total_n = integer_moments(df, vec_col, d)
    colsum = np.array(colsum_l, dtype=np.int64)
    gram = np.array(gram_l, dtype=np.int64)
    mean = colsum / (total_n * _SCALE)
    cov = gram / (total_n * _SCALE**2) - np.outer(mean, mean)
    return cov, mean, total_n


def pca_components(cov, k: int):
    """Top-k eigenvectors (rows), descending eigenvalue, signs
    canonicalized: the coordinate with the largest |value| is
    positive."""
    import numpy as np

    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps, evs = [], []
    for i in order:
        v = vecs[:, i]
        j = int(np.argmax(np.abs(v)))
        if v[j] < 0:
            v = -v
        comps.append(v)
        evs.append(float(vals[i]))
    return np.stack(comps), np.array(evs)


def project_expr(vec_col: str, component, mean) -> Column:
    """Codegen'd centered dot product with a literal component vector:
    aggregate(zip_with(vec - mean, w, *), +) — JVM-side, sequential
    fold, no Python."""
    w = F.array(*[F.lit(float(c)) for c in component])
    m = F.array(*[F.lit(float(x)) for x in mean])
    centered = F.zip_with(F.col(vec_col).cast("array<double>"), m, lambda a, b: a - b)
    prod = F.zip_with(centered, w, lambda a, b: a * b)
    return F.aggregate(prod, F.lit(0.0), lambda s, x: s + x)


def pca_project(
    df: DataFrame, vec_col: str, d: int, k: int = 2, out_prefix: str = "pc"
) -> DataFrame:
    """End-to-end: covariance -> top-k components -> projected columns
    ``{prefix}1..{prefix}k`` appended to ``df``."""
    cov, mean, _ = covariance(df, vec_col, d)
    comps, _ = pca_components(cov, k)
    out = df
    for i, comp in enumerate(comps, start=1):
        out = out.withColumn(f"{out_prefix}{i}", project_expr(vec_col, comp, mean))
    return out


# ---------------------------------------------------------------------------
# Deterministic power-iteration PCA — the ORACLE-able variant (r15).
#
# numpy.linalg.eigh is not ANSI-expressible, and its float arithmetic
# (LAPACK, SIMD summation order) cannot be reproduced bit-for-bit in
# SQL. This variant restricts EVERY operation to one of two classes
# that ARE engine-identical: exact int64 arithmetic (order-free sums),
# and single IEEE-754 double ops (one cast / one divide / one multiply
# / one add / floor / sqrt — each individually specified by the
# standard, no re-associated summations). The iteration therefore
# produces bit-identical components in driver Python and in DuckDB's
# unrolled-CTE oracle — the kmeans/BPE unrolled-rounds pattern applied
# to eigenvectors.
#
# Shape: C_raw = n·gram − colsum⊗colsum (exact int64; ∝ covariance),
# pre-scaled to cq = floor(double(C_raw) / D) with D = max(1,
# (n·n) div 2^18) so |cq| ≤ scale²·2^18 ≈ 2.6e11 after the rescale —
# every matvec sum then stays exact in int64 (64·2.6e11·2^15 ≈ 5.5e17).
# Oracle validity bound (r15 ADVICE): the POST-rescale bound holds for
# any n, but DuckDB computes C_raw itself in BIGINT before the /D —
# |C_raw| ~ n²·scale² crosses int64 near n ≈ 3e6 vectors, where DuckDB
# raises Out of Range (loud, not silent). The driver-Python side uses
# exact bigints and is unaffected. Past that bound, move the oracle's
# C_raw arithmetic to HUGEINT and cast to DOUBLE only at the cq step.
# Per round: w = cq·v (exact ints); v' = floor(w/max|w|·2^15 + 0.5)
# (three float ops, re-quantized to ints). The 2nd component iterates
# jointly, Gram-Schmidt-orthogonalized against the UPDATED v1 each
# round with the ratio d12/d11 of two exact integer dots. Signs are
# canonicalized on the final quantized vectors (the max-|v| coordinate
# — smallest index on ties — made positive), then normalized by the
# exact-integer L2 norm's sqrt. A fixed ROUND COUNT (not a tolerance)
# keeps both engines on the same arithmetic path; convergence is
# (λ2/λ1)^R per round.
#
# MATRIX SQUARING (r15): the testdata embeddings' spectrum is nearly
# flat (λ2/λ1 ≈ 0.93), needing ~96 plain rounds for |cos| > 0.999
# against eigh — and the oracle's CTE-graph cost grows superlinearly
# in round count (measured 12/24/48/96 rounds → 0.8/1.5/5.5/63 s in
# DuckDB). Squaring the matrix TWICE before iterating raises the
# eigenvalue ratios to the 4th power ((0.93)^4 ≈ 0.75), so 24 rounds
# of C^4 converge like 96 of C at a quarter of the CTE graph. The
# matrix is first re-quantized to |value| ≤ 2^23 (max-abs scaled, the
# same floor(x/max·S + 0.5) discipline) so each squaring stays WELL
# inside int64 — products ≤ 2^46, 64-term sums ≤ 2^52 — and, being
# ≤ 2^52, every intermediate is also EXACTLY representable in double,
# making the re-quantization casts exact rather than merely
# deterministic. C, C², C⁴ share eigenvectors (covariance is PSD, so
# no even-power sign ambiguity); the 2^-23 matrix quantization
# perturbs the converged component by ~1e-6/gap — orders below the
# |cos| pin, and identical in both engines regardless. A still-flatter
# spectrum would give an ill-converged but bit-identical (and thus
# still hash-green) answer.
# ---------------------------------------------------------------------------

PCA_QUANT = 32768  # 2^15 quantization of the iterated vector
PCA_POWER_ROUNDS = 24
PCA_POWER_SQUARINGS = 2  # iterate C^(2^squarings)
_MAT_QUANT = 8388608  # 2^23 re-quantization scale of C, C², C⁴
_CQ_DIV_BASE = 262144  # 2^18: D = max(1, n*n div 2^18)


def _quantize(w: list, m) -> list[int]:
    import math

    # w/m, then *Q, then +0.5, then floor — four deterministic ops,
    # the exact sequence the oracle SQL spells out
    return [int(math.floor(x / m * PCA_QUANT + 0.5)) for x in w]


def _requantize_matrix(c: list[list[int]], d: int) -> list[list[int]]:
    """Max-abs re-quantization of an integer matrix to ≤ 2^23 —
    floor(x/max·S + 0.5), each float op a single IEEE op (and for
    inputs ≤ 2^52 every cast is exact)."""
    import math

    m = max(abs(c[i][j]) for i in range(d) for j in range(d))
    if m == 0:
        return [[0] * d for _ in range(d)]
    return [
        [
            int(math.floor(float(c[i][j]) / float(m) * _MAT_QUANT + 0.5))
            for j in range(d)
        ]
        for i in range(d)
    ]


def _square_and_requantize(cq: list[list[int]], d: int) -> list[list[int]]:
    """One matrix squaring — inputs ≤ 2^23, so products ≤ 2^46 and
    64-term sums ≤ 2^52, all comfortably int64 — re-quantized back to
    the 2^23 scale."""
    c2 = [
        [sum(cq[i][k] * cq[k][j] for k in range(d)) for j in range(d)]
        for i in range(d)
    ]
    return _requantize_matrix(c2, d)


def power_iteration_components(
    colsum: list[int], gram: list[list[int]], n: int, d: int,
    rounds: int = PCA_POWER_ROUNDS,
    squarings: int = PCA_POWER_SQUARINGS,
):
    """Top-2 principal components + mean via the deterministic
    iteration above, all plain Python (ints exact; floats are IEEE
    doubles — the same ops the oracle SQL performs). Returns
    (comps[2][d] floats, mean[d] floats)."""
    import math

    craw = [
        [n * gram[i][j] - colsum[i] * colsum[j] for j in range(d)]
        for i in range(d)
    ]
    # float path on purpose, matching the oracle's expression exactly:
    # /2^18 is an exponent shift (exact in double), and the int→double
    # cast of n*n is the same IEEE rounding in both engines
    dd = max(1, int(math.floor(float(n * n) / _CQ_DIV_BASE)))
    cq = [
        [int(math.floor(float(craw[i][j]) / float(dd))) for j in range(d)]
        for i in range(d)
    ]
    # down to the 2^23 squaring scale first (int64 headroom), then
    # square `squarings` times — the iterated matrix is C^(2^squarings)
    cq = _requantize_matrix(cq, d)
    for _ in range(squarings):
        cq = _square_and_requantize(cq, d)
    v1 = [PCA_QUANT] * d
    v2 = [PCA_QUANT if i % 2 == 0 else -PCA_QUANT for i in range(d)]
    for _ in range(rounds):
        w1 = [sum(cq[i][j] * v1[j] for j in range(d)) for i in range(d)]
        m1 = max(abs(x) for x in w1)
        v1 = v1 if m1 == 0 else _quantize([float(x) for x in w1], float(m1))
        w2 = [sum(cq[i][j] * v2[j] for j in range(d)) for i in range(d)]
        # quantize BEFORE the Gram-Schmidt dot: Σ w2·v1 with raw w2
        # (~5.5e17) overflows int64 at 64 terms (~1.2e24 — caught at
        # sf0.1: DuckDB silently promotes to INT128, Python to big
        # ints, but the arithmetic contract here is int64); with both
        # vectors ≤ 2^15 the dot is ≤ 64·2^30 ≈ 6.9e10
        m2a = max(abs(x) for x in w2)
        t2 = v2 if m2a == 0 else _quantize([float(x) for x in w2], float(m2a))
        d12 = sum(t2[i] * v1[i] for i in range(d))
        d11 = sum(v1[i] * v1[i] for i in range(d))
        r = float(d12) / float(d11)
        u2 = [float(t2[i]) - r * float(v1[i]) for i in range(d)]
        m2 = max(abs(x) for x in u2)
        v2 = t2 if m2 == 0 else _quantize(u2, m2)

    def canon(v: list[int]) -> list[float]:
        mx = max(abs(x) for x in v)
        lead = min(i for i in range(d) if abs(v[i]) == mx)
        s = -1 if v[lead] < 0 else 1
        nrm = math.sqrt(float(sum((x * s) * (x * s) for x in v)))
        return [float(x * s) / nrm for x in v]

    mean = [float(colsum[i]) / float(n * _SCALE) for i in range(d)]
    return [canon(v1), canon(v2)], mean


def pca_project_deterministic(
    df: DataFrame, vec_col: str, d: int, out_prefix: str = "pc"
) -> DataFrame:
    """End-to-end oracle-able projection: exact integer moments →
    deterministic power-iteration components → codegen'd literal-array
    fold (the same (x−m)·c sequential fold the oracle's list_reduce
    performs)."""
    colsum, gram, n = integer_moments(df, vec_col, d)
    comps, mean = power_iteration_components(colsum, gram, n, d)
    out = df
    for i, comp in enumerate(comps, start=1):
        out = out.withColumn(f"{out_prefix}{i}", project_expr(vec_col, comp, mean))
    return out


def pca_power_oracle_sql(
    d: int, rounds: int = PCA_POWER_ROUNDS, source: str = "embeddings",
    squarings: int = PCA_POWER_SQUARINGS,
) -> str:
    """DuckDB SQL reproducing :func:`power_iteration_components` +
    the projection bit-for-bit (see the block comment above for why
    every step is engine-identical). Output: (vec_id, label,
    pc1_micro, pc2_micro) with pc_micro = floor(pc·1e6 + 0.5) — the
    house integer-micros hashing discipline."""
    q = PCA_QUANT
    # every CTE is AS MATERIALIZED: DuckDB otherwise INLINES the round
    # chain — each round references the previous, every reference path
    # re-reaches the parquet scan, and the plan blows up exponentially
    # (observed as "Too many open files" before any row is produced)
    ctes = [
        f"""x AS MATERIALIZED (
  SELECT vec_id, i,
         CAST(floor(CAST(embedding[i + 1] AS DOUBLE) * {_SCALE} + 0.5) AS BIGINT) AS qx
  FROM {source}, unnest(range({d})) AS u(i)
)""",
        f"nrow AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n FROM {source})",
        "cs AS MATERIALIZED (SELECT i, CAST(sum(qx) AS BIGINT) AS s FROM x GROUP BY i)",
        "g AS MATERIALIZED (SELECT a.i AS i, b.i AS j, CAST(sum(a.qx * b.qx) AS BIGINT) AS gij"
        " FROM x a JOIN x b USING (vec_id) GROUP BY a.i, b.i)",
        "craw AS MATERIALIZED (SELECT g.i, g.j,"
        " (SELECT n FROM nrow) * gij - ca.s * cb.s AS c"
        " FROM g JOIN cs ca ON ca.i = g.i JOIN cs cb ON cb.i = g.j)",
        f"dd AS MATERIALIZED (SELECT greatest(CAST(1 AS BIGINT),"
        f" CAST(floor(CAST(n * n AS DOUBLE) / {_CQ_DIV_BASE}) AS BIGINT)) AS dv"
        " FROM nrow)",
        "cq AS MATERIALIZED (SELECT i, j, CAST(floor(CAST(c AS DOUBLE) /"
        " CAST((SELECT dv FROM dd) AS DOUBLE)) AS BIGINT) AS c FROM craw)",
        f"v1_0 AS MATERIALIZED (SELECT i, CAST({q} AS BIGINT) AS v FROM range({d}) t(i))",
        f"v2_0 AS MATERIALIZED (SELECT i, CAST(CASE WHEN i % 2 = 0 THEN {q} ELSE -{q} END"
        f" AS BIGINT) AS v FROM range({d}) t(i))",
    ]
    quant = (
        "CAST(floor(CAST({w} AS DOUBLE) / CAST({m} AS DOUBLE) * "
        f"{q} + 0.5) AS BIGINT)"
    )
    # re-quantize to the 2^23 squaring scale, then square `squarings`
    # times — the iterated matrix is C^(2^squarings) (same
    # eigenvectors; ratio^(2^s) convergence per round). All sums stay
    # <= 2^52: int64-safe AND exactly representable in double.
    mquant = (
        "CASE WHEN {m} = 0 THEN CAST(0 AS BIGINT) ELSE"
        " CAST(floor(CAST({c} AS DOUBLE) / CAST({m} AS DOUBLE) * "
        f"{_MAT_QUANT} + 0.5) AS BIGINT) END"
    )
    ctes += [
        "mm_0 AS MATERIALIZED (SELECT max(abs(c)) AS m FROM cq)",
        "cq_0 AS MATERIALIZED (SELECT i, j, "
        + mquant.format(c="c", m="(SELECT m FROM mm_0)")
        + " AS c FROM cq)",
    ]
    for sq in range(1, squarings + 1):
        ctes += [
            f"c2_{sq} AS MATERIALIZED (SELECT a.i AS i, b.j AS j,"
            f" CAST(sum(a.c * b.c) AS BIGINT) AS c"
            f" FROM cq_{sq - 1} a JOIN cq_{sq - 1} b ON a.j = b.i"
            " GROUP BY a.i, b.j)",
            f"mm_{sq} AS MATERIALIZED (SELECT max(abs(c)) AS m FROM c2_{sq})",
            f"cq_{sq} AS MATERIALIZED (SELECT i, j, "
            + mquant.format(c="c", m=f"(SELECT m FROM mm_{sq})")
            + f" AS c FROM c2_{sq})",
        ]
    cm = f"cq_{squarings}"
    for r in range(1, rounds + 1):
        p = r - 1
        ctes += [
            f"w1_{r} AS MATERIALIZED (SELECT cq.i AS i, CAST(sum(cq.c * v.v) AS BIGINT) AS w"
            f" FROM {cm} cq JOIN v1_{p} v ON v.i = cq.j GROUP BY cq.i)",
            f"m1_{r} AS MATERIALIZED (SELECT max(abs(w)) AS m FROM w1_{r})",
            f"v1_{r} AS MATERIALIZED (SELECT w1.i, CASE WHEN (SELECT m FROM m1_{r}) = 0"
            f" THEN p.v ELSE {quant.format(w='w1.w', m=f'(SELECT m FROM m1_{r})')}"
            f" END AS v FROM w1_{r} w1 JOIN v1_{p} p ON p.i = w1.i)",
            f"w2_{r} AS MATERIALIZED (SELECT cq.i AS i, CAST(sum(cq.c * v.v) AS BIGINT) AS w"
            f" FROM {cm} cq JOIN v2_{p} v ON v.i = cq.j GROUP BY cq.i)",
            f"m2a_{r} AS MATERIALIZED (SELECT max(abs(w)) AS m FROM w2_{r})",
            # quantize BEFORE the Gram-Schmidt dot (int64 budget — see
            # power_iteration_components)
            f"t2_{r} AS MATERIALIZED (SELECT w2.i, CASE WHEN (SELECT m FROM m2a_{r}) = 0"
            f" THEN p.v ELSE {quant.format(w='w2.w', m=f'(SELECT m FROM m2a_{r})')}"
            f" END AS v FROM w2_{r} w2 JOIN v2_{p} p ON p.i = w2.i)",
            f"dot_{r} AS MATERIALIZED (SELECT"
            f" (SELECT CAST(sum(t2.v * v1.v) AS BIGINT) FROM t2_{r} t2"
            f"  JOIN v1_{r} v1 ON v1.i = t2.i) AS d12,"
            f" (SELECT CAST(sum(v * v) AS BIGINT) FROM v1_{r}) AS d11)",
            f"u2_{r} AS MATERIALIZED (SELECT t2.i, CAST(t2.v AS DOUBLE) -"
            f" (CAST((SELECT d12 FROM dot_{r}) AS DOUBLE) /"
            f"  CAST((SELECT d11 FROM dot_{r}) AS DOUBLE)) * CAST(v1.v AS DOUBLE) AS u"
            f" FROM t2_{r} t2 JOIN v1_{r} v1 ON v1.i = t2.i)",
            f"m2_{r} AS MATERIALIZED (SELECT max(abs(u)) AS m FROM u2_{r})",
            f"v2_{r} AS MATERIALIZED (SELECT u2.i, CASE WHEN (SELECT m FROM m2_{r}) = 0"
            f" THEN t.v ELSE CAST(floor(u2.u / (SELECT m FROM m2_{r}) * {q} + 0.5)"
            f" AS BIGINT) END AS v FROM u2_{r} u2 JOIN t2_{r} t ON t.i = u2.i)",
        ]
    canon = """{c} AS MATERIALIZED (
  SELECT i, CAST(v * sgn AS DOUBLE) / nrm AS c FROM (
    SELECT i, v,
           (SELECT CASE WHEN (SELECT v FROM {v} WHERE i =
              (SELECT min(i) FROM {v} WHERE abs(v) =
                (SELECT max(abs(v)) FROM {v}))) < 0 THEN -1 ELSE 1 END) AS sgn,
           (SELECT sqrt(CAST(sum(v * v) AS DOUBLE)) FROM {v}) AS nrm
    FROM {v}
  )
)"""
    ctes.append(canon.format(c="c1", v=f"v1_{rounds}"))
    ctes.append(canon.format(c="c2", v=f"v2_{rounds}"))
    ctes += [
        f"mn AS MATERIALIZED (SELECT i, CAST(s AS DOUBLE) /"
        f" CAST((SELECT n FROM nrow) * {_SCALE} AS DOUBLE) AS m FROM cs)",
        "lc1 AS MATERIALIZED (SELECT list(c ORDER BY i) AS a1 FROM c1)",
        "lc2 AS MATERIALIZED (SELECT list(c ORDER BY i) AS a2 FROM c2)",
        "lmn AS MATERIALIZED (SELECT list(m ORDER BY i) AS am FROM mn)",
    ]
    # the projection fold: the SAME per-element op sequence as Spark's
    # aggregate(zip_with(x − m, c, *)) — sub, mul, add-to-acc,
    # i = 0..d-1. The 1-row list CTEs cross-join in as plain columns:
    # DuckDB lambdas reject subqueries but accept outer columns.
    fold = (
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE),"
        " list_transform(range(1, {d} + 1), i ->"
        " (CAST(embedding[i] AS DOUBLE) - am[i]) * {c}[i])),"
        " (acc, t) -> acc + t)"
    )
    pc1 = fold.format(d=d, c="a1")
    pc2 = fold.format(d=d, c="a2")
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT vec_id, label,
       CAST(floor({pc1} * 1000000 + 0.5) AS BIGINT) AS pc1_micro,
       CAST(floor({pc2} * 1000000 + 0.5) AS BIGINT) AS pc2_micro
FROM {source}, lc1, lc2, lmn
"""
    )
