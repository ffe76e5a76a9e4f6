#!/usr/bin/env python
"""Per-key fold throughput: drive every applyInPandasWithState fold
closure DIRECTLY (no Spark — the folds are self-contained closures, so
this measures the Python/numpy kernel that bounds per-key throughput
at scale) over a 1M-row single-key micro-batch and report rows/s.

This makes SCALE.md's streaming-throughput statements reproducible
(r5 measured the shifted-AND fold at ~5M rows/s in a one-off session;
this script re-measures every fold, including the r6 LOCF and KMV
ones, in one command). The deliberately sequential EWMA loop is the
expected floor — its state is 3 scalars and the loop IS the recursion.

Usage: python scripts/stream_fold_bench.py [n_rows]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from flink_wsr_project_spark.operators.cep import build_strict_match_fn  # noqa: E402
from flink_wsr_project_spark.streaming.dedup import build_band_claim_fold  # noqa: E402
from flink_wsr_project_spark.streaming.stateful import (  # noqa: E402
    build_blacklist_fn,
    build_cms_fold,
    build_ewma_stream_fn,
    build_kmv_fold,
    build_locf_fold,
    build_login_fail_fn,
    build_order_timeout_fn,
    build_pattern_corr_fold,
    build_uv_bloom_fn,
)


class _State:
    def __init__(self):
        self._v, self.hasTimedOut = None, False

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def remove(self):
        self._v = None

    def setTimeoutTimestamp(self, ts):
        pass


def _drain(fn, key, pdf):
    t0 = time.perf_counter()
    for out in fn(key, iter([pdf]), _State()):
        _ = len(out)
    return time.perf_counter() - t0


def main(n: int) -> None:
    rng = np.random.default_rng(7)
    ts = pd.to_datetime(np.sort(rng.integers(0, n // 10, n)), unit="s")
    ev = rng.choice(["error", "ok"], n)
    vals = rng.integers(0, 5000, n).astype(np.int64)
    ids = np.arange(n, dtype=np.int64)

    cases = [
        ("login_fail (shifted-AND)",
         build_login_fail_fn(2.0, "error", "ts", "event_type"),
         (7,), pd.DataFrame({"ts": ts, "event_type": ev})),
        ("order_timeout (run fold)",
         build_order_timeout_fn(15, "create", "ts", "event_type"),
         (7,), pd.DataFrame({"ts": ts, "event_type": rng.choice(["create", "pay"], n)})),
        ("blacklist (day fold)",
         build_blacklist_fn(100, "ts"),
         (7, 8), pd.DataFrame({"ts": ts})),
        ("uv_bloom (cumsum fold)",
         build_uv_bloom_fn(1 << 20, 61, "ts", "user_id"),
         (3600,), pd.DataFrame({"ts": ts, "user_id": rng.integers(0, n // 2, n).astype(np.int64)})),
        ("kmv (bottom-k, pre-hashed)",
         build_kmv_fold(32, 1 << 28, "h28", 1000),
         (86400,), pd.DataFrame({"h28": rng.integers(0, 1 << 28, n).astype(np.int64)})),
        ("cms (bincount, pre-indexed)",
         build_cms_fold(4, 1024, "cell", 1000),
         (86400,), pd.DataFrame({"cell": rng.integers(0, 4 * 1024, n).astype(np.int64)})),
        ("band claim (keep-first)",
         build_band_claim_fold(1000),
         (0, "h"), pd.DataFrame({"t": np.sort(rng.integers(0, n, n)).astype(np.int64),
                                 "doc_id": ids,
                                 "band": np.zeros(n, dtype=np.int64)})),
        ("pattern corr (convolve)",
         build_pattern_corr_fold((0, 100, 300, 600, 1000, 600, 300, 100)),
         (7,), pd.DataFrame({"t": np.sort(rng.integers(0, n, n)).astype(np.int64),
                             "event_id": ids,
                             "x": rng.integers(-500_000, 500_000, n).astype(np.int64)})),
        ("locf (searchsorted grid)",
         build_locf_fold(1800, "t_sec", "v_milli", "event_id"),
         (7,), pd.DataFrame({"t_sec": np.sort(rng.integers(0, n, n)).astype(np.int64),
                             "event_id": ids, "v_milli": vals})),
        ("cep strict k=2 (shifted-AND)",
         build_strict_match_fn(2, 5, ["uid"], ["a", "b"]),
         (9,), pd.DataFrame({"_ts_s": np.sort(rng.integers(0, n, n)).astype(np.int64),
                             "_m0": rng.integers(0, 2, n).astype(np.int64),
                             "_m1": rng.integers(0, 2, n).astype(np.int64)})),
        ("ewma (sequential by definition)",
         build_ewma_stream_fn("ts", "v_milli"),
         (7,), pd.DataFrame({"ts": ts, "event_id": ids, "v_milli": vals})),
    ]
    print(f"{'fold':34s} {'rows/s':>12s}")
    for name, fn, key, pdf in cases:
        dt = _drain(fn, key, pdf)
        print(f"{name:34s} {int(n / dt):>12,}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000)
