#!/usr/bin/env python
"""Regenerate QUERIES.md from the plan registry (single source of truth)."""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from flink_wsr_project_spark.plans.registry import _REGISTRY, _load_all  # noqa: E402

HEADER = """# QUERIES — registry inventory (auto-generated; do not edit by hand)

One row per registered query: oracle-checked means the driver
hash-compares it against DuckDB at sf0.01; rows-only means the
weaker existence check.

Total: {total} queries, {oracled} oracle-checked.

| query | oracle | tags | summary |
|---|---|---|---|
"""

FOOTER = """
```python
# regenerate: python scripts/gen_queries_md.py
from flink_wsr_project_spark.plans.registry import _load_all, _REGISTRY
_load_all()  # then rebuild the table above from _REGISTRY
```
"""


def summary(doc: str, width: int = 107) -> str:
    s = re.sub(r"\s+", " ", (doc or "").strip())
    return s if len(s) <= width else s[:width] + "..."


def main() -> None:
    _load_all()
    qs = sorted(_REGISTRY.values(), key=lambda q: q.name)
    rows = [
        f"| `{q.name}` | {'✓' if q.oracle else 'rows-only'} | {', '.join(q.tags)} | {summary(q.doc)} |"
        for q in qs
    ]
    out = HEADER.format(total=len(qs), oracled=sum(1 for q in qs if q.oracle)) + "\n".join(rows) + "\n" + FOOTER
    with open(os.path.join(REPO, "QUERIES.md"), "w") as f:
        f.write(out)
    print(f"wrote QUERIES.md: {len(qs)} queries")


if __name__ == "__main__":
    main()
