"""Skew-resistant equi-join via key salting.

When one join key carries a disproportionate share of rows, the
shuffle hash-partitions that key onto ONE task: the straggler that
dominates job wall-clock at 100 TB. Salting splits each hot key into
``n_salts`` sub-keys: the skewed (probe) side gets a deterministic
per-row salt, the other (build) side is replicated once per salt
value, and the join runs on ``(key, salt)`` — spreading every key's
rows over ``n_salts`` tasks at the cost of an ``n_salts``× blow-up of
the build side (cheap when that side is orders of magnitude smaller
but still too big to broadcast).

Relation to the engine's other skew tools, in the order to reach for
them:

1. ``broadcast()`` the small side — no shuffle at all (the default for
   dims throughout plans/).
2. AQE skew-join (``spark.sql.adaptive.skewJoin.enabled``, on in
   session.py) — splits oversized sort-merge partitions at runtime
   with no plan changes.
3. ``salted_join`` — deterministic, planner-visible spreading for the
   cases AQE can't fix: a single key too big for ONE task even after
   splitting (AQE splits partitions, not keys), shuffled-hash joins,
   or engines/configs without AQE.

The reference hand-rolled exactly this trick for its constant-key
aggregation (PageView.scala:41-52 salts into 4 random subkeys and
re-merges); aggregation salting is subsumed by Spark's partial+final
HashAggregate, but JOIN salting still has to be explicit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
    salt_col: str = "_salt",
) -> DataFrame:
    """Equi-join ``skewed ⋈ other`` on column ``on``, salted ``n_salts``
    ways. Result is identical to ``skewed.join(other, on, how)`` for
    inner/left joins — the salt only changes row DISTRIBUTION, because
    every (key, salt) pair on the probe side finds the build side
    replicated under that same salt.

    The salt is a deterministic hash of the probe row's non-key
    columns (falling back to the key itself when there are none), so
    repeated runs partition identically; any per-row value would be
    CORRECT (salt-invariance), determinism is a house rule. The join
    is hinted sort-merge: with a broadcastable build side you would
    not salt at all, and letting the demo silently broadcast would
    test nothing.
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    non_key = [c for c in skewed.columns if c != on]
    salt = (
        F.abs(F.hash(*[F.col(c) for c in non_key])) % n_salts
        if non_key
        else F.abs(F.hash(F.col(on))) % n_salts
    )
    probe = skewed.withColumn(salt_col, salt.cast("int"))
    build = other.withColumn(
        salt_col, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]).cast("array<int>"))
    )
    return probe.join(build.hint("merge"), [on, salt_col], how).drop(salt_col)
