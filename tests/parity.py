"""Spark-vs-DuckDB parity checker — mirrors the driver's compare:
row count, schema (column name set), and order-insensitive values.

Stricter than a hash: on mismatch it reports which rows differ, which
is what we iterate against. Values must match exactly (our queries are
engineered for bit-exact cross-engine determinism — integer-cents
aggregation, explicit tie-breakers, epoch-long window bounds).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from flink_wsr_project_spark.schemas import TESTDATA_TABLES


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    import os

    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        # tolerate partial dirs: synthetic-parity tests (crafted inputs
        # exercising branches the generated testdata never reaches)
        # write only the tables their query reads
        if os.path.exists(f"{sf_dir}/{t}.parquet"):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _dtype_family(series: pd.Series) -> str:
    """Collapse a pandas dtype to the family the driver's hash
    distinguishes: integer / float / datetime / other(object, str, bool).
    A nullable column arriving as object with int content is 'other' on
    purpose — if ONE engine yields object and the other int64, that is a
    real canonicalization divergence."""
    kind = series.dtype.kind
    if kind in "iu":
        return "int"
    if kind == "f":
        return "float"
    if kind in "mM":
        return "datetime"
    return "other"


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns), key=lambda s: s.astype(str)).reset_index(
            drop=True
        )
    return pdf


def assert_parity(spark_df, oracle: str, sf_dir: str, name: str = "?") -> None:
    got = _normalize(spark_df.toPandas())
    con = duckdb_con(sf_dir)
    want = _normalize(con.sql(oracle).df())
    con.close()

    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: column mismatch spark={sorted(got.columns)} oracle={sorted(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count spark={len(got)} oracle={len(want)}"
    # Dtype-kind parity: the driver's value hash canonicalizes by dtype, so
    # an int64 Spark column vs a float64 oracle column (DuckDB returns
    # HUGEINT for sum(BIGINT), which pandas maps to float64) hash-mismatches
    # even when every value is numerically equal. Catch that drift here:
    # every oracle output column must land in the same dtype family as the
    # Spark result (fix = explicit CAST in the oracle SQL).
    for col in got.columns:
        gk, wk = _dtype_family(got[col]), _dtype_family(want[col])
        assert gk == wk, (
            f"{name}: col {col} dtype family spark={got[col].dtype}({gk}) "
            f"oracle={want[col].dtype}({wk}) — add an explicit CAST in the oracle SQL"
        )
    for col in got.columns:
        g, w = got[col], want[col]
        for i, (a, b) in enumerate(zip(g, w)):
            if a is None and b is None:
                continue
            if isinstance(a, float) or isinstance(b, float):
                a_nan = a is None or (isinstance(a, float) and math.isnan(a))
                b_nan = b is None or (isinstance(b, float) and math.isnan(b))
                if a_nan and b_nan:
                    continue
                assert not (a_nan or b_nan) and float(a) == float(b), (
                    f"{name}: col {col} row {i}: spark={a!r} oracle={b!r}"
                )
            else:
                assert str(a) == str(b), f"{name}: col {col} row {i}: spark={a!r} oracle={b!r}"
