"""Keyed deduplication — keep the first/last row per key.

This is the Flink SQL dedup idiom (``ROW_NUMBER() OVER (PARTITION BY k
ORDER BY ts) = 1``), which the reference engine would run as keyed
state keeping one element. In Spark 4 the SAME idiom is also the
shuffle-minimal plan: ``InferWindowGroupLimit`` plants a
``WindowGroupLimit(Partial)`` below the exchange, so every map task
pre-prunes to ONE row per key before shuffling — the wire carries
~|keys| rows, not the table — and a ``Final`` pass re-prunes after the
exchange. (Verified in this build for partitioned windows; the rule
does NOT fire for empty partition specs, which is why global top-K
lives in ``operators.topn.topn_global`` instead.)

The aggregation alternative — ``min_by(struct(*row), struct(order))``
— ships the same ~|keys| rows but plans SortAggregate (struct
aggregation buffers are not hash-aggregatable) whose interpreted
struct comparisons measured ~35% slower than the codegen'd sort +
WindowGroupLimit pipeline at sf0.1. The property test keeps both forms
and asserts they agree row-for-row.

Determinism: extend ``order_by`` with a unique tiebreaker (event_id);
``row_number`` over a total order resolves ties identically on any
partitioning.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window as W, functions as F


def dedup_keep_first(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str | Column],
    keep: str = "first",
) -> DataFrame:
    """One row per ``keys`` group: the row minimizing (``keep='first'``)
    or maximizing (``keep='last'``) the ``order_by`` tuple. Returns the
    full original schema (column order preserved)."""
    if keep not in ("first", "last"):
        raise ValueError(f"keep must be first|last, got {keep!r}")
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    order = [c.asc() for c in cols] if keep == "first" else [c.desc() for c in cols]
    w = W.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("_kf_rn", F.row_number().over(w))
        .filter(F.col("_kf_rn") == 1)
        .drop("_kf_rn")
    )


def dedup_keep_first_agg(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str | Column],
    keep: str = "first",
) -> DataFrame:
    """Aggregation form of :func:`dedup_keep_first` (``min_by`` /
    ``max_by`` on the full-row struct). Same result, same shuffle
    volume; kept as the cross-check implementation and for inputs
    where a sort is undesirable (e.g. wide rows where the
    WindowGroupLimit sort key would drag the whole row through the
    sorter anyway)."""
    if keep not in ("first", "last"):
        raise ValueError(f"keep must be first|last, got {keep!r}")
    pick = F.min_by if keep == "first" else F.max_by
    row = F.struct(*[F.col(c) for c in df.columns])
    order = F.struct(*[F.col(c) if isinstance(c, str) else c for c in order_by])
    out = df.groupBy(*keys).agg(pick(row, order).alias("_row"))
    return out.select(*[F.col(f"_row.{c}").alias(c) for c in df.columns])
