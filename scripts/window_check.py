#!/usr/bin/env python
"""Pre-validate the driver's external-correctness window.

Runs the FIRST 50 entries of ``__spark_entry__.queries()`` — the exact
set the driver checks after the round — against their DuckDB oracles
at sf0.01 from a deliberately hostile session (non-UTC timezone,
plain configs), using the driver's compare semantics (sorted columns,
order-insensitive stringified values). Prints one line per query and
a final BAD list; run before a round ends so a would-be red external
row is caught while there is still time to fix it.

Usage: python scripts/window_check.py [sf_dir]
"""

from __future__ import annotations

import sys

REPO = __file__.rsplit("/", 2)[0]
sys.path.insert(0, REPO)


def main(sf: str) -> int:
    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e

    Q, O = e.queries(), e.oracle_sql()
    window = list(Q)[:50]
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    def norm(p):
        p = p.reindex(sorted(p.columns), axis=1)
        return p.sort_values(
            by=list(p.columns), key=lambda s: s.astype(str)
        ).reset_index(drop=True)

    bad = []
    for i, name in enumerate(window):
        try:
            got = norm(Q[name](spark, sf).toPandas())
            if name in O:
                want = norm(con.sql(O[name]).df())
                ok = (
                    got.shape == want.shape
                    and list(got.columns) == list(want.columns)
                    and all(
                        str(a) == str(b)
                        for c in got.columns
                        for a, b in zip(got[c], want[c])
                    )
                )
                status = "MATCH" if ok else "MISMATCH"
            else:
                status, ok = f"no_oracle rows={len(got)}", True
        except Exception as ex:  # noqa: BLE001 — report, don't die
            status, ok = f"ERROR {type(ex).__name__}: {str(ex)[:100]}", False
        if not ok:
            bad.append(name)
        print(f"{i:2d} {name:35s} {status}", flush=True)
    print("BAD:", bad)
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"))
