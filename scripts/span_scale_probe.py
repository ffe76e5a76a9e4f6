#!/usr/bin/env python
"""Two-corpus-size candidate-volume probe for the repeated-span family
(the table SCALE.md carries for every capped dedup path): at sf0.01
and sf0.1, measure the gram-match row count the UNCAPPED join
enumerates vs the star-collapsed CAPPED join, plus the df tail that
drives the difference.

DuckDB-side (the oracle SQL is the same body the Spark query runs, so
the volumes are the real ones); run: python scripts/span_scale_probe.py
"""

from __future__ import annotations

import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from flink_wsr_project_spark.operators.spans import (  # noqa: E402
    span_posgram_ctes,
)


HEADER = " ".join(f"hdr{i}" for i in range(20))


def measure(sf_dir: str, cap: int, boilerplate: bool = False) -> dict:
    con = duckdb.connect()
    if boilerplate:
        # the real-corpus degenerate mass the generator lacks: a shared
        # 20-token header on every 10th document, so header-gram df
        # grows proportionally with the corpus
        con.sql(
            f"""CREATE VIEW documents AS
SELECT doc_id,
       CASE WHEN doc_id % 10 = 0 THEN '{HEADER} ' || text ELSE text END AS text
FROM '{sf_dir}/documents.parquet'"""
        )
    else:
        con.sql(
            f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
        )
    base = span_posgram_ctes("duckdb")
    stats = con.sql(
        f"""
WITH {base},
go AS (SELECT gh, doc_id, count(*) AS occ FROM sp_pg GROUP BY gh, doc_id),
g AS (SELECT gh, count(*) AS df, sum(occ) AS total_occ, sum(occ*occ) AS sq,
             min(doc_id) AS keeper
      FROM go GROUP BY gh),
gk AS (SELECT g.gh, g.df, g.total_occ, g.sq,
              (SELECT occ FROM go WHERE go.gh = g.gh AND go.doc_id = g.keeper) AS keeper_occ
       FROM g)
SELECT count(*) AS n_grams,
       sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS matchable,
       max(df) AS max_df,
       sum(CASE WHEN df >= 2 THEN (total_occ*total_occ - sq) // 2 ELSE 0 END) AS uncapped_rows,
       sum(CASE WHEN df >= 2 THEN
             CASE WHEN df <= {cap} THEN (total_occ*total_occ - sq) // 2
                  ELSE (total_occ - keeper_occ) * keeper_occ END
           ELSE 0 END) AS capped_rows,
       sum(CASE WHEN df > {cap} THEN 1 ELSE 0 END) AS grams_capped
FROM gk
"""
    ).fetchall()[0]
    n_docs = con.sql("SELECT count(*) FROM documents").fetchall()[0][0]
    keys = ["n_grams", "matchable", "max_df", "uncapped_rows", "capped_rows", "grams_capped"]
    return {"sf_dir": sf_dir, "n_docs": n_docs, **dict(zip(keys, stats))}


def main() -> None:
    cap = int(os.environ.get("SPARK_GRAFT_SPAN_GRAM_CAP", "2"))
    for boiler in (False, True):
        label = "boilerplate-injected" if boiler else "as-generated"
        rows = [
            measure("/root/testdata/sf0.01", cap, boiler),
            measure("/root/testdata/sf0.1", cap, boiler),
        ]
        for r in rows:
            print(label, r, flush=True)
        a, b = rows
        scale = b["n_docs"] / a["n_docs"]
        print(
            f"{label} corpus x{scale:.2f}: "
            f"uncapped x{b['uncapped_rows'] / max(a['uncapped_rows'], 1):.2f}, "
            f"capped x{b['capped_rows'] / max(a['capped_rows'], 1):.2f}"
        )


if __name__ == "__main__":
    main()
