#!/usr/bin/env python
"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
the primary record as the LAST stdout line, ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}. Verbose per-run detail
(every steady sample, isolated-run breakdowns) prints on its own
earlier ``"metric": "bench_detail"`` line, so the primary record
stays inside the driver's bounded tail capture no matter how much
detail accrues (r15 lost its committed totals to exactly that
truncation).

Queries are fully materialized through the noop sink (no driver-side
collect; measures scan → shuffle → agg end to end).

Modes
-----
* default: one session runs every headline query (first-run pass, then
  ``steady_runs`` steady passes; per-query MEDIAN reported). This is
  the round-over-round continuity metric.
* ``SPARK_GRAFT_ISOLATE=1``: each headline query additionally runs in
  a FRESH subprocess (own JVM, own session, only that query) so
  registry-import/JIT/GC pressure from earlier queries cannot leak
  into later ones. Reported under ``queries_isolated`` /
  ``queries_isolated_steady`` next to the shared-session numbers —
  the delta between the two IS the measured session-pressure tax
  (r5 verdict: the bench could not distinguish engine regression from
  environment; now both numbers are in the same JSON).

Two totals are emitted in the one JSON line (r13 verdict task 2):
``headline_queries_total`` (the 16-query round-over-round continuity
metric, unchanged since r1 for comparability) and ``pipeline_total``
(the heavy LLM-pipeline operators — spans, SemDeDup, BM25,
containment, LM — whose wall-time was previously invisible to
round-over-round comparison; plan shapes alone don't catch a perf
regression in the repo's largest code mass).

The ``context`` object records what the r5 drift analysis needed and
didn't have: load average before/after, cpu count, registry import
seconds (r13: 1.0 s and growing linearly with query count; fixed in
r14 not by lazy oracles but by deferring the pandas import the
multimodal oracle pulled in — registry import is now ~0.05 s on top
of pyspark itself), and session startup seconds.

Contention legibility (r14 verdict task 3): two consecutive rounds
needed out-of-band A/B runs to defend recorded numbers, so the JSON
now carries enough per-run detail to identify a tainted sample FROM
THE ARTIFACT ALONE: every steady run's individual time
(``queries_steady_samples`` / ``queries_pipeline_steady_samples``),
and a ``taint`` object listing each query whose steady MEDIAN exceeds
its own first run by more than 5% in the same record (steady runs
reuse the compiled plans the first run paid for, so beyond scheduler
jitter this is strongly indicative of load arriving mid-bench) plus a
``startup_contended`` flag (session startup > 7.5 s ⇒ the JVM start
itself was contended; the r14 interleaved A/B showed first-run totals
track startup, not code version). The heuristic is documented in
BASELINE.md.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time
from statistics import median

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

# Headline set: one per operator family (sliding topN, tumble agg,
# distinct, sequence, joins, star-schema, pipeline).
HEADLINE = [
    "hot_items_topn",
    "hot_pages_topn",
    "pv_hourly",
    "uv_hourly",
    "market_by_channel",
    "login_fail_detect",
    "order_timeout",
    "tx_interval_join",
    "tx_reconcile",
    "pricing_summary",
    "shipping_priority_topn",
    "nation_volume",
    "top_customers_per_nation",
    "dedup_exact",
    "doc_token_count",
    "doc_quality_score",
]

# Pipeline-heavy set (r13 verdict task 2): the largest operator
# families added since r10, one representative each — MinHash-LSH
# dedup, semantic dedup, span-level dedup, chunk containment, BM25
# ranked retrieval, LM perplexity scoring. Tracked as a SECOND total
# next to (never replacing) the 16-query headline.
PIPELINE = [
    "dedup_minhash_lsh_capped",
    "semdedup_keep_list",
    "shared_span_pairs_capped",
    "chunk_containment",
    "bm25_search_topk",
    "doc_lm_perplexity",
]


# session-startup seconds of THIS process (set by _run_one / main) —
# emitted per subprocess so a contended JVM start is visible per run
_SESSION_STARTUP = -1.0


def _steady_runs() -> int:
    # default 3 (the decision-grade minimum); an explicit override is
    # respected as given — a developer asking for 1 debugging pass gets 1
    return max(1, int(os.environ.get("SPARK_GRAFT_STEADY_RUNS", "3")))


def _run_one(name: str, sf_dir: str) -> None:
    """Subprocess entry (--one): fresh session, ONE query, first-run +
    steady passes, one JSON line on stdout."""
    from flink_wsr_project_spark.plans.registry import all_queries
    from flink_wsr_project_spark.session import get_spark

    global _SESSION_STARTUP
    t_sess = time.perf_counter()
    spark = get_spark("bench-iso")
    _SESSION_STARTUP = time.perf_counter() - t_sess
    reg = all_queries()
    # same warm pass as the shared-session path (pv_hourly, untimed):
    # without it the isolated first-run would fold cold-JVM/codegen/
    # footer costs into the number and the shared-vs-isolated delta
    # would no longer measure session pressure alone
    reg["pv_hourly"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    fn = reg[name]
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    first = time.perf_counter() - t0
    steady = []
    for _ in range(_steady_runs()):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        steady.append(time.perf_counter() - t0)
    print(
        json.dumps(
            {
                "name": name,
                "first": first,
                "steady": median(steady),
                "steady_samples": [round(s, 3) for s in steady],
                "session_startup_sec": round(_SESSION_STARTUP, 3),
            }
        )
    )


def _isolated_pass(names: list[str], sf_dir: str) -> tuple[dict, dict, dict]:
    """Run each query in its own subprocess; collect first/steady."""
    first: dict[str, float] = {}
    steady: dict[str, float] = {}
    detail: dict[str, dict] = {}
    for name in names:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", name],
            capture_output=True,
            text=True,
            env={**os.environ, "SPARK_GRAFT_SF_DIR": sf_dir},
            check=True,
        )
        row = json.loads(out.stdout.strip().splitlines()[-1])
        first[name] = round(row["first"], 3)
        steady[name] = round(row["steady"], 3)
        detail[name] = {
            "steady_samples": row.get("steady_samples", []),
            "session_startup_sec": row.get("session_startup_sec", -1.0),
        }
    return first, steady, detail


def _hot_machine(load0: float) -> dict:
    """Pre-flight machine-state flag (r10 verdict task 7): the
    first-run headline swings ±25% with session state, and every
    drift analysis since r5 has had to re-derive the attribution from
    circumstantial context. Two signals, recorded so the flag's
    REASON is auditable: load per cpu at start (> 0.125 ≈ >4 runnable
    tasks on the 32-cpu box), and a just-ran-suite marker — the age of
    the newest write under spark-warehouse/ or .pytest_cache/ (the
    pytest suite writes store tables; a run minutes ago means the
    page cache and JIT state belong to the suite, not to this bench)."""
    cpus = os.cpu_count() or 1
    newest: float | None = None
    for p in ("spark-warehouse", ".pytest_cache"):
        full = os.path.join(REPO, p)
        if os.path.isdir(full):
            try:
                mt = max(
                    (os.path.getmtime(os.path.join(full, f)) for f in os.listdir(full)),
                    default=os.path.getmtime(full),
                )
            except OSError:
                continue
            newest = mt if newest is None else max(newest, mt)
    age = None if newest is None else int(time.time() - newest)
    recent_suite = age is not None and age < 1200
    return {
        "load_per_cpu": round(load0 / cpus, 3),
        "suite_artifacts_age_sec": age,
        "hot_machine": bool(load0 / cpus > 0.125 or recent_suite),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    load0 = os.getloadavg()[0]
    hot = _hot_machine(load0)

    t_imp = time.perf_counter()
    from flink_wsr_project_spark.plans.registry import all_queries  # noqa: E402

    registry = all_queries()
    import_sec = time.perf_counter() - t_imp

    t_sess = time.perf_counter()
    from flink_wsr_project_spark.session import get_spark  # noqa: E402

    spark = get_spark("bench")
    session_sec = time.perf_counter() - t_sess

    names = [n for n in HEADLINE if n in registry]

    # warm the JVM + parquet footer caches once (excluded from timing)
    registry["pv_hourly"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        registry[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    # Steady-state passes (plans/codegen already compiled). The
    # headline metric stays the first-run pass for round-over-round
    # continuity; the steady numbers isolate execution cost from the
    # one-time JIT/compile overhead that dominates small-SF first runs
    # (and is amortized to nothing in any real job). r4 verdict: one
    # steady run per query made jitter indistinguishable from
    # regression — run ≥3 and report the per-query MEDIAN, with the
    # run count recorded so the JSON is self-describing.
    steady_runs = _steady_runs()
    samples: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(steady_runs):
        for name in names:
            t0 = time.perf_counter()
            registry[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples[name].append(time.perf_counter() - t0)

    steady = {n: round(median(v), 3) for n, v in samples.items()}

    # Pipeline-heavy pass: first-run + the same steady protocol. Runs
    # AFTER the headline passes so it cannot perturb the continuity
    # metric's JIT/cache state relative to r1–r13 numbers.
    pipe_names = [n for n in PIPELINE if n in registry]
    pipe_timings: dict[str, float] = {}
    for name in pipe_names:
        t0 = time.perf_counter()
        registry[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        pipe_timings[name] = round(time.perf_counter() - t0, 3)
    pipe_samples: dict[str, list[float]] = {n: [] for n in pipe_names}
    for _ in range(steady_runs):
        for name in pipe_names:
            t0 = time.perf_counter()
            registry[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            pipe_samples[name].append(time.perf_counter() - t0)
    pipe_steady = {n: round(median(v), 3) for n, v in pipe_samples.items()}

    # Taint heuristic (r14 verdict task 3, documented in BASELINE.md):
    # a query whose steady MEDIAN exceeds its own first run in the
    # same record is strongly indicative of load arriving mid-bench
    # (steady passes reuse the plans/codegen the first run compiled),
    # and the whole steady total should be read as a contaminated
    # sample. A 5% relative tolerance absorbs scheduler/GC jitter on
    # sub-second queries, which can legitimately nudge a steady median
    # a few ms past a lucky first run on a clean machine (r15 ADVICE —
    # the flag should mark contention, not round-off). Session startup
    # > 7.5 s means the JVM start itself was contended (the r14
    # interleaved A/B: first-run totals track session_startup_sec,
    # not code version).
    steady_gt_first = sorted(
        [n for n in names if steady[n] > timings[n] * 1.05]
        + [n for n in pipe_names if pipe_steady[n] > pipe_timings[n] * 1.05]
    )
    taint = {
        "steady_gt_first": steady_gt_first,
        "startup_contended": session_sec > 7.5,
        "tainted": bool(steady_gt_first) or session_sec > 7.5,
    }

    # Two stdout lines (r15 verdict defect 1): the per-run sample
    # detail added in r15 grew the single JSON line past the driver's
    # 2000-char tail-capture window, so the committed BENCH_r15
    # artifact lost its parseable totals ("parsed": null). The detail
    # now goes on its OWN line FIRST and the compact primary record
    # prints LAST — the driver parses the last JSON line inside its
    # tail window, so the totals always survive however verbose the
    # detail grows. The primary line is kept within the window by
    # construction (no per-sample lists); test_bench_output pins it.
    detail = {
        "metric": "bench_detail",
        "queries_steady_samples": {
            n: [round(s, 3) for s in v] for n, v in samples.items()
        },
        "queries_pipeline_steady_samples": {
            n: [round(s, 3) for s in v] for n, v in pipe_samples.items()
        },
    }
    result = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "steady_total": round(sum(steady.values()), 3),
        "queries_steady": steady,
        "steady_runs": steady_runs,
        "pipeline_total": round(sum(pipe_timings.values()), 3),
        "queries_pipeline": pipe_timings,
        "pipeline_steady_total": round(sum(pipe_steady.values()), 3),
        "queries_pipeline_steady": pipe_steady,
        "taint": taint,
        "sf": sf,
        "context": {
            "load_avg_start": round(load0, 2),
            "cpus": os.cpu_count(),
            "registry_import_sec": round(import_sec, 3),
            "session_startup_sec": round(session_sec, 3),
            **hot,
        },
    }

    if os.environ.get("SPARK_GRAFT_ISOLATE") == "1":
        spark.stop()  # free the shared JVM before the per-query ones
        iso_first, iso_steady, iso_detail = _isolated_pass(names, sf_dir)
        # per-query maps + per-run detail ride the detail line; only
        # the two totals join the size-bounded primary record
        detail["queries_isolated"] = iso_first
        detail["queries_isolated_steady"] = iso_steady
        detail["queries_isolated_detail"] = iso_detail
        result["isolated_total"] = round(sum(iso_first.values()), 3)
        result["isolated_steady_total"] = round(sum(iso_steady.values()), 3)

    # captured LAST so the bracket covers the isolated pass too —
    # machine-state context must include every run it exists to explain
    result["context"]["load_avg_end"] = round(os.getloadavg()[0], 2)

    print(json.dumps(detail))
    print(json.dumps(result))


if __name__ == "__main__":
    if len(sys.argv) == 3 and sys.argv[1] == "--one":
        _run_one(sys.argv[2], os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    else:
        main()
