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
aggregated (windows × keys, not raw rows). For a pathological single
giant window, switch to the two-phase approach: per-partition top-N
(mapInPandas heap) then global top-N merge.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window as W, functions as F


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
    ROW_NUMBER() is BIGINT.
    """
    order: list[Column] = [F.col(order_col).desc() if descending else F.col(order_col).asc()]
    order += [F.col(t).asc() for t in tiebreakers]
    w = W.partitionBy(*partition_cols).orderBy(*order)
    return (
        df.withColumn(rank_alias, F.row_number().over(w).cast("long"))
        .filter(F.col(rank_alias) <= n)
    )
