"""CLI: run registered queries / jobs from the command line.

    python -m flink_wsr_project_spark list
    python -m flink_wsr_project_spark run hot_items_topn \
        --sf-dir /root/testdata/sf0.01 --limit 20
    python -m flink_wsr_project_spark explain pricing_summary
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="flink_wsr_project_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list registered queries")

    run = sub.add_parser("run", help="run a query and print rows")
    run.add_argument("name")
    run.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    run.add_argument("--limit", type=int, default=50)
    run.add_argument("--cpus", default=None)

    ex = sub.add_parser("explain", help="print a query's physical plan")
    ex.add_argument("name")
    ex.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ex.add_argument("--cpus", default=None)

    args = ap.parse_args(argv)

    from flink_wsr_project_spark.plans.registry import all_queries

    registry = all_queries()

    if args.cmd == "list":
        for name in sorted(registry):
            print(name)
        return 0

    if args.name not in registry:
        print(f"unknown query: {args.name!r} (see `list`)", file=sys.stderr)
        return 2

    from flink_wsr_project_spark.session import get_spark

    spark = get_spark("cli", cpus=args.cpus)
    df = registry[args.name](spark, args.sf_dir)
    if args.cmd == "run":
        df.show(args.limit, truncate=False)
    else:
        df.explain("formatted")
    return 0


if __name__ == "__main__":
    try:
        raise SystemExit(main())
    except BrokenPipeError:  # e.g. `... list | head`
        raise SystemExit(0)
