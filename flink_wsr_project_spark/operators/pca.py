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


def covariance(df: DataFrame, vec_col: str, d: int):
    """Exact (integer-scaled) covariance matrix + mean as numpy arrays.

    Only O(tasks) rows ever reach the merge and only d x d numbers
    reach the driver."""
    import numpy as np

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
    total_n = next(r.n for r in rows if r.pos == 0)
    flat = np.zeros(d + d * d, dtype=np.int64)
    for r in rows:
        flat[r.pos] = r.v
    colsum, gram = flat[:d], flat[d:].reshape(d, d)
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
