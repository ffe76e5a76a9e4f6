"""As-of join — for each left row, the temporally nearest right row.

Spark has no native ASOF join (pandas ``merge_asof`` / DuckDB ``ASOF
JOIN`` semantics): for every left row, attach the single right row with
the greatest ``right_ts <= left_ts`` (backward) or smallest
``right_ts >= left_ts`` (forward) per key, optionally within a
tolerance. The naive formulations are a range join (nested-loop) or a
per-row correlated subquery — both non-starters at scale.

Spark-first plan — the union + carry-forward trick
(plans/analytics_queries.purchase_attribution_asof inlines the same
idea; this operator generalizes it to arbitrary tables, payloads,
direction, strictness, and tolerance):

1. union the two sides on an aligned schema, tagging ``_side``
   (right=0, left=1);
2. ONE shuffle: window partitioned by the key, ordered by
   ``(ts, _side)`` so a right row at the same timestamp sorts before
   (inclusive) or after (strict) the left rows it may match;
3. each payload column is ``last(payload) IGNORE NULLS`` over the
   running frame — left rows carry NULL payloads so they only ever
   *read*;
4. keep the left side, null out matches outside ``tolerance_s``.

Cost: one exchange on the key, one sort — identical shape to a
sort-merge join, with no per-row probe and no expansion. Skew follows
the key's distribution (same exposure as any keyed window; pre-salt
the heavy key upstream if one key dominates).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window as W, functions as F

_SIDE = "_asof_side"
_TS = "_asof_ts"
_RTS = "_asof_right_ts"
_PFX = "_asof_r_"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str] | None = None,
    direction: str = "backward",
    strict: bool = False,
    tolerance_s: int | None = None,
    matched_ts_alias: str | None = None,
) -> DataFrame:
    """Left as-of join: every left row, plus the payload of its match
    (NULL columns when no right row qualifies — pandas ``merge_asof``
    left semantics).

    ``on``            equi-key columns (present on both sides).
    ``right_cols``    payload columns to attach (default: everything on
                      the right except keys and ``right_ts``). Name
                      collisions with left columns are rejected —
                      alias on the way in.
    ``direction``     'backward' (greatest right_ts <= left_ts) or
                      'forward' (smallest right_ts >= left_ts).
    ``strict``        exclude the right_ts == left_ts boundary.
    ``tolerance_s``   max |left_ts - right_ts| in seconds (epoch-Long
                      or timestamp columns; compared on floored epoch
                      seconds per the house determinism rule).
    ``matched_ts_alias``  also emit the matched right timestamp.

    Ties on (key, right_ts) are broken by the largest payload tuple in
    ``right_cols`` order (deterministic regardless of partitioning);
    pre-aggregate the right side when a different policy is needed.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    on = list(on)
    payload = list(
        right_cols
        if right_cols is not None
        else [c for c in right.columns if c not in (*on, right_ts)]
    )
    clash = set(payload) & set(left.columns)
    if clash:
        raise ValueError(f"payload columns collide with left columns: {sorted(clash)}")

    def _epoch(col: Column, df: DataFrame, name: str) -> Column:
        """Floored epoch seconds (house determinism rule) whatever the
        column's physical type — timestamp or epoch-Long."""
        if df.schema[name].dataType.typeName().startswith("timestamp"):
            return F.floor(F.unix_timestamp(col)).cast("long")
        return col.cast("long")

    r = right.select(
        *on,
        F.col(right_ts).alias(_TS),
        F.col(right_ts).alias(_RTS),
        *[F.col(c).alias(_PFX + c) for c in payload],
    ).withColumn(_SIDE, F.lit(0))
    l = left.withColumn(_TS, F.col(left_ts)).withColumn(_SIDE, F.lit(1))
    unioned = l.unionByName(r, allowMissingColumns=True)

    # Boundary handling via the side tag's sort position: inclusive
    # wants an equal-ts right row visible to the left row (right first),
    # strict wants it hidden (right last). Forward mirrors the time
    # axis. Ties among right rows: payload columns, so `last` takes the
    # max payload tuple.
    side_order = F.col(_SIDE).asc() if not strict else F.col(_SIDE).desc()
    ties = [F.col(_PFX + c).asc_nulls_first() for c in payload]
    ts_order = F.col(_TS).asc() if direction == "backward" else F.col(_TS).desc()
    order = [ts_order, side_order, *ties]
    w = W.partitionBy(*on).orderBy(*order).rowsBetween(W.unboundedPreceding, W.currentRow)

    matched_ts = F.last(_RTS, ignorenulls=True).over(w)
    enriched = unioned.select(
        "*",
        matched_ts.alias("_asof_matched_ts"),
        *[F.last(_PFX + c, ignorenulls=True).over(w).alias("_asof_m_" + c) for c in payload],
    ).filter(F.col(_SIDE) == 1)

    keep = F.col("_asof_matched_ts").isNotNull()
    if tolerance_s is not None:
        lts = _epoch(F.col(left_ts), left, left_ts)
        rts = _epoch(F.col("_asof_matched_ts"), right, right_ts)
        delta = (lts - rts) if direction == "backward" else (rts - lts)
        keep = keep & (delta <= tolerance_s)

    out = enriched.select(
        *left.columns,
        *[F.when(keep, F.col("_asof_m_" + c)).alias(c) for c in payload],
        *(
            [F.when(keep, F.col("_asof_matched_ts")).alias(matched_ts_alias)]
            if matched_ts_alias
            else []
        ),
    )
    return out
