"""bench.py is the driver's second surface: it must print exactly ONE
JSON line with the documented fields, honoring $SPARK_GRAFT_SF_DIR and
$SPARK_GRAFT_CPUS. Run it as the driver does — a fresh subprocess."""

from __future__ import annotations

import json
import os
import subprocess
import sys


def test_bench_emits_one_json_line_with_contract_fields():
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
    assert len(json_lines) == 1, f"expected ONE JSON line, got {len(json_lines)}"
    d = json.loads(json_lines[0])
    assert d["metric"] == "headline_queries_total"
    assert d["unit"] == "sec"
    assert d["sf"] == 0.001
    assert isinstance(d["value"], (int, float)) and d["value"] > 0
    assert set(d["queries"]) == set(d["queries_steady"])
    # steady numbers must be a median of >=3 runs, with the count recorded
    assert d["steady_runs"] >= 3
    assert len(d["queries"]) >= 16
    assert abs(sum(d["queries"].values()) - d["value"]) < 0.05 * max(d["value"], 1)
    # contention legibility (r14 verdict task 3): per-run samples +
    # the taint object must make a contaminated sample identifiable
    # from the artifact alone
    assert set(d["queries_steady_samples"]) == set(d["queries_steady"])
    for n, runs in d["queries_steady_samples"].items():
        assert len(runs) == d["steady_runs"]
    assert set(d["queries_pipeline_steady_samples"]) == set(
        d["queries_pipeline_steady"]
    )
    taint = d["taint"]
    assert isinstance(taint["steady_gt_first"], list)
    assert isinstance(taint["startup_contended"], bool)
    assert taint["tainted"] == (
        bool(taint["steady_gt_first"]) or taint["startup_contended"]
    )
