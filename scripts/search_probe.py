#!/usr/bin/env python
"""Search-index probe cost vs corpus size — the honest cost model,
measured: a BM25 query's work is its MATCHED POSTING LISTS, so a
rare-term query stays flat as the corpus grows while a common-term
query grows with its df (the posting list is the data; no index can
make reading it free). Builds the index at three corpus sizes and
times the same queries against each.

Run: python scripts/search_probe.py
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from flink_wsr_project_spark.session import get_spark  # noqa: E402


def main() -> None:
    from flink_wsr_project_spark.operators.search_index import (
        bm25_from_index,
        search_stats,
        write_search_index,
    )
    from flink_wsr_project_spark.sources.readers import load_table

    spark = get_spark("search-probe")
    rows = []
    for sf in ("0.001", "0.01", "0.1"):
        prefix = f"srch_{sf.replace('.', '_')}"
        for t in (f"{prefix}_postings", f"{prefix}_docstats", f"{prefix}_sstats"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
            shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
        docs = load_table(spark, "documents", f"/root/testdata/sf{sf}").select(
            "doc_id", "text"
        )
        write_search_index(spark, docs, prefix)
        n_docs, _ = search_stats(spark, prefix)

        def timed(terms):
            reps = []
            for _ in range(5):
                t0 = time.perf_counter()
                bm25_from_index(spark, prefix, terms).collect()
                reps.append(time.perf_counter() - t0)
            return statistics.median(reps)

        rows.append(
            {
                "sf": sf,
                "n_docs": n_docs,
                "common_terms_s": round(timed(["join", "filter"]), 3),
                "rare_term_s": round(timed(["dup"]), 3),
                "mixed_s": round(timed(["join", "filter", "dup"]), 3),
            }
        )
        print(rows[-1], flush=True)
    a, c = rows[0], rows[-1]
    print(
        f"corpus x{c['n_docs'] / a['n_docs']:.0f}: "
        f"common x{c['common_terms_s'] / a['common_terms_s']:.2f}, "
        f"rare x{c['rare_term_s'] / a['rare_term_s']:.2f}"
    )


if __name__ == "__main__":
    main()
