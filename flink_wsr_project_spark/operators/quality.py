"""Data-quality expectations — declarative rule checks compiled into
one aggregate pass (no per-rule scans, no Python in the row path).

A check is (name, boolean Column over a row). ``quality_report``
evaluates ALL checks in a single scan: each rule becomes a
``sum(violates)`` conditional aggregate. ``enforce`` splits a frame
into (passing rows, violating rows + reasons) for quarantine flows.

At 100 TB this is the cheapest possible shape: rules share one scan
and one tiny global aggregate; the quarantine split is two filters
over the same cached/pipelined projection.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, functions as F


def quality_report(df: DataFrame, checks: Mapping[str, Column]) -> DataFrame:
    """One row per rule: violations, rows checked, pass rate."""
    total = F.count("*")
    aggs = [total.alias("_n")]
    for name, ok in checks.items():
        # A rule evaluating to NULL (e.g. in_range over a NULL value) is a
        # violation: fail-closed, matching CASE WHEN ok THEN 0 ELSE 1 END.
        aggs.append(F.sum(F.when(ok, 0).otherwise(1)).cast("long").alias(f"_v_{name}"))
    row = df.agg(*aggs)
    out = None
    for name in checks:
        one = row.select(
            F.lit(name).alias("rule"),
            F.col(f"_v_{name}").alias("violations"),
            F.col("_n").alias("rows_checked"),
            (1.0 - F.col(f"_v_{name}") / F.col("_n")).alias("pass_rate"),
        )
        out = one if out is None else out.unionAll(one)
    return out


def enforce(
    df: DataFrame, checks: Mapping[str, Column], reason_col: str = "violated_rules"
) -> tuple[DataFrame, DataFrame]:
    """(passing, quarantined) — quarantined rows carry the list of
    violated rule names."""
    reasons = F.array_compact(
        F.array(
            *[
                # NULL rule results quarantine too (fail-closed, same
                # semantics as quality_report's violation count).
                F.when(~F.coalesce(ok, F.lit(False)), F.lit(name))
                for name, ok in checks.items()
            ]
        )
    )
    tagged = df.withColumn(reason_col, reasons)
    passing = tagged.filter(F.size(reason_col) == 0).drop(reason_col)
    quarantined = tagged.filter(F.size(reason_col) > 0)
    return passing, quarantined


# standard rule builders ------------------------------------------------------


def not_null(col: str) -> Column:
    return F.col(col).isNotNull()


def in_range(col: str, lo, hi) -> Column:
    return F.col(col).between(lo, hi)


def matches(col: str, pattern: str) -> Column:
    return F.col(col).rlike(pattern)


def one_of(col: str, values) -> Column:
    return F.col(col).isin(*values)

def observed(df: DataFrame, name: str, metrics: Mapping[str, Column]):
    """Attach in-flight observation metrics to a frame: the metrics are
    computed DURING whatever action consumes ``df`` — no second scan,
    no extra job — and read back from the returned ``Observation``
    after the action finishes. The production-monitoring pattern for a
    100 TB write: row counts, null counts, and value bounds come out of
    the same pass that wrote the data (Spark's ``Dataset.observe``;
    in Structured Streaming the same metrics surface per micro-batch
    through ``QueryProgressEvent.observedMetrics``).

    Returns ``(df_with_observation, observation)``; call
    ``observation.get`` after an action on the returned frame.
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    exprs = [c.alias(n) for n, c in metrics.items()]
    return df.observe(obs, *exprs), obs
