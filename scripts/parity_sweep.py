#!/usr/bin/env python
"""Driver-style correctness sweep: run EVERY registered query at a
given SF dir (default sf0.01 — the driver's gate scale) and compare
against its DuckDB oracle with the same row-count / schema /
order-insensitive value discipline the driver uses.

Usage: python scripts/parity_sweep.py [sf_dir] [name_filter...]

Prints one line per query (ok / MISMATCH / no_oracle / ERROR) and a
final summary; exits non-zero when any oracle-checked query fails.
"""

from __future__ import annotations

import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

from flink_wsr_project_spark.plans.registry import all_oracles, all_queries  # noqa: E402
from flink_wsr_project_spark.session import get_spark  # noqa: E402
from parity import assert_parity  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("parity-sweep")
    queries, oracles = all_queries(), all_oracles()

    failed: list[str] = []
    for name in sorted(queries):
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            df = queries[name](spark, sf_dir)
            if name in oracles:
                assert_parity(df, oracles[name], sf_dir, name=name)
                status = "ok"
            else:
                n = df.count()
                status = f"no_oracle rows={n}"
        except AssertionError as e:
            status = f"MISMATCH {str(e).splitlines()[0][:160]}"
            failed.append(name)
        except Exception:
            status = "ERROR " + traceback.format_exc(limit=1).splitlines()[-1][:160]
            failed.append(name)
        print(f"{name:32s} {time.perf_counter() - t0:6.1f}s  {status}", flush=True)

    print(f"\n{len(failed)} failures / {len(queries)} queries", flush=True)
    for f in failed:
        print(f"  FAIL {f}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
