"""bench.py is the driver's second surface. Since r16 it prints TWO
JSON lines — a verbose ``bench_detail`` line first, then the compact
primary record LAST (the driver parses the last JSON line inside a
~2000-char tail window; r15's committed artifact lost its totals when
per-run detail grew the old single line past that window). The primary
line must stay inside the window by construction. Run it as the driver
does — a fresh subprocess honoring $SPARK_GRAFT_SF_DIR and
$SPARK_GRAFT_CPUS."""

from __future__ import annotations

import json
import os
import subprocess
import sys

# the driver's tail-capture window (observed across BENCH_r* artifacts);
# the primary line must fit with margin for sf0.1-scale float widths
DRIVER_TAIL_WINDOW = 2000


def test_bench_emits_detail_then_compact_primary_line():
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="4",
    )
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
        capture_output=True,
        text=True,
        timeout=540,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    json_lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    assert len(json_lines) == 2, f"expected detail + primary lines, got {len(json_lines)}"
    detail = json.loads(json_lines[0])
    d = json.loads(json_lines[-1])

    # the PRIMARY record is the LAST line and fits the driver's tail
    # window with margin — the r15 truncation regression pin
    assert d["metric"] == "headline_queries_total"
    assert len(json_lines[-1]) < DRIVER_TAIL_WINDOW - 100, (
        f"primary line {len(json_lines[-1])} chars — would risk the "
        "driver's tail capture"
    )

    assert d["unit"] == "sec"
    assert d["sf"] == 0.001
    assert isinstance(d["value"], (int, float)) and d["value"] > 0
    assert set(d["queries"]) == set(d["queries_steady"])
    # steady numbers must be a median of >=3 runs, with the count recorded
    assert d["steady_runs"] >= 3
    assert len(d["queries"]) >= 16
    assert abs(sum(d["queries"].values()) - d["value"]) < 0.05 * max(d["value"], 1)
    # pipeline totals present on the primary line (the fields r15 lost)
    assert set(d["queries_pipeline"]) == set(d["queries_pipeline_steady"])
    assert isinstance(d["pipeline_total"], (int, float))

    # contention legibility (r14 verdict task 3): per-run samples live
    # on the DETAIL line; the taint object stays on the primary record
    assert detail["metric"] == "bench_detail"
    assert set(detail["queries_steady_samples"]) == set(d["queries_steady"])
    for n, runs in detail["queries_steady_samples"].items():
        assert len(runs) == d["steady_runs"]
    assert set(detail["queries_pipeline_steady_samples"]) == set(
        d["queries_pipeline_steady"]
    )
    taint = d["taint"]
    assert isinstance(taint["steady_gt_first"], list)
    assert isinstance(taint["startup_contended"], bool)
    assert taint["tainted"] == (
        bool(taint["steady_gt_first"]) or taint["startup_contended"]
    )
