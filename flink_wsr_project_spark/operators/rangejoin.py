"""Banded (bucketed) range join — point-in-interval matching without
an equi-key.

A pure range predicate (``p.ts BETWEEN i.start AND i.end``) gives the
planner no hash key: Spark falls back to BroadcastNestedLoopJoin
(every point × every interval — O(n·m) compares, and a hard failure
once the interval side outgrows the driver). The classic fix is to
QUANTIZE time into fixed buckets:

* each point lands in exactly ONE bucket (``ts div bucket``);
* each interval is exploded into EVERY bucket it overlaps
  (``sequence(start div bucket, end div bucket)``);
* the join becomes an equi-join on the bucket id (plus any natural
  keys), post-filtered by the exact range predicate.

Each (point, interval) pair can meet in at most one bucket — the
point's — so no dedup step is needed. Cost model: the interval side
grows by (avg interval width / bucket width) replicas, the point side
not at all; compares drop from |points|×|intervals| to per-bucket
products. Pick ``bucket_s`` near the typical interval width so most
intervals explode into ~1-2 buckets.

Timestamps are epoch-second Longs on both sides (house determinism
rule — fractional-vs-floored epoch differs at exact boundaries).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

_BUCKET = "_rj_bucket"


def banded_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bucket_s: int,
    extra_keys: Sequence[str] = (),
    how: str = "inner",
) -> DataFrame:
    """``points ⋈ intervals ON point_ts BETWEEN start AND end`` (both
    bounds inclusive, epoch-second Long columns), executed as an
    equi-join on ``floor(ts / bucket_s)``. ``extra_keys`` adds natural
    equi-keys (e.g. user_id) when the relation has them."""
    p = points.withColumn(_BUCKET, (F.col(point_ts) / bucket_s).cast("long"))
    iv = intervals.withColumn(
        _BUCKET,
        F.explode(
            F.sequence(
                (F.col(start_col) / bucket_s).cast("long"),
                (F.col(end_col) / bucket_s).cast("long"),
            )
        ),
    )
    joined = p.join(iv, [*extra_keys, _BUCKET], how).filter(
        (F.col(point_ts) >= F.col(start_col)) & (F.col(point_ts) <= F.col(end_col))
    )
    return joined.drop(_BUCKET)
