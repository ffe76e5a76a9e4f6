"""Property tests for the vectorized stateful streaming folds.

The r5 vectorizations (numpy shifted-AND, run-level and day-level
folds, the Bloom first-occurrence cumsum) replaced per-row loops whose
semantics were easy to eyeball. These tests drive the fold closures
DIRECTLY — no Spark, a fake GroupState, hypothesis-generated event
streams with random chunking and micro-batch boundaries — and compare
against straightforward per-row reference loops. Hundreds of random
interleavings run in seconds, covering the edge classes fixture tests
can't enumerate: duplicate timestamps, single-row runs, state carried
across batches, empty batches, negative/extreme user ids.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from flink_wsr_project_spark.streaming.stateful import (
    build_blacklist_fn,
    build_login_fail_fn,
    build_order_timeout_fn,
    build_uv_bloom_fn,
)


class FakeState:
    """The slice of pyspark's GroupState the folds touch."""

    def __init__(self):
        self._v = None
        self.hasTimedOut = False
        self.timeout_ts = None
        self.watermark_ms = 0

    def getCurrentWatermarkMs(self):
        return self.watermark_ms

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        assert self._v is not None, "get on empty state"
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def remove(self):
        self._v = None

    def setTimeoutTimestamp(self, ts):
        self.timeout_ts = ts


def _run_fold(fn, key, batches, state=None):
    """Feed chunked micro-batches through a fold, concatenating output."""
    state = state or FakeState()
    outs = []
    for chunks in batches:
        outs.extend(fn(key, iter(chunks), state))
    out = pd.concat(outs, ignore_index=True) if outs else pd.DataFrame()
    return out, state


def _sorted_batch(chunks, by):
    """The folds' shared preamble: concat + ONE stable sort."""
    return pd.concat(chunks, ignore_index=True).sort_values(by, kind="mergesort")


def _chunked(rows: pd.DataFrame, splits: list[int]) -> list[pd.DataFrame]:
    """Split a frame into chunks at the given row indices (may create
    empty chunks — Arrow does too)."""
    idx = sorted({s % (len(rows) + 1) for s in splits})
    bounds = [0, *idx, len(rows)]
    return [rows.iloc[a:b] for a, b in zip(bounds, bounds[1:])]


# ---------------------------------------------------------------------------
# strategies
# ---------------------------------------------------------------------------

_ts = st.integers(min_value=0, max_value=40)  # dense → duplicate seconds
_splitter = st.lists(st.integers(0, 200), max_size=6)


def _mk_batches(events: pd.DataFrame, batch_cuts, chunk_splits):
    """Random micro-batch boundaries, then random Arrow-chunk splits
    inside each batch (rows stay in generation order — UNSORTED)."""
    cuts = sorted({c % (len(events) + 1) for c in batch_cuts})
    bounds = [0, *cuts, len(events)]
    out = []
    for a, b in zip(bounds, bounds[1:]):
        out.append(_chunked(events.iloc[a:b].reset_index(drop=True), chunk_splits))
    return out


# ---------------------------------------------------------------------------
# login-fail: strict adjacent-pair within gap
# ---------------------------------------------------------------------------


@settings(max_examples=150, deadline=None)
@given(
    evs=st.lists(st.tuples(_ts, st.sampled_from(["error", "ok"])), min_size=1, max_size=40),
    batch_cuts=st.lists(st.integers(0, 200), max_size=3),
    chunk_splits=_splitter,
)
def test_login_fail_fold_matches_rowloop(evs, batch_cuts, chunk_splits):
    fn = build_login_fail_fn(2.0, "error", "ts", "event_type")
    df = pd.DataFrame(
        {"ts": pd.to_datetime([t for t, _ in evs], unit="s"), "event_type": [e for _, e in evs]}
    )
    batches = _mk_batches(df, batch_cuts, chunk_splits)
    got, state = _run_fold(fn, (7,), batches)

    # reference: per-row loop over each batch's stable-sorted rows;
    # frontier = last PROCESSED ts (tracked separately from the fail
    # carry, which a success resets to NaN)
    carry, frontier = float("nan"), float("nan")
    expect = []
    for chunks in batches:
        live = [c for c in chunks if len(c)]
        if not live:
            continue
        pdf = _sorted_batch(live, ["ts"])
        prev = carry
        for _, r in pdf.iterrows():
            t = r.ts.timestamp()
            # late-arrival policy: rows behind the processed frontier
            # are dropped (reversed warning pairs otherwise)
            if not math.isnan(frontier) and t < frontier:
                continue
            frontier = t
            if r.event_type == "error":
                if not math.isnan(prev) and t - prev <= 2.0:
                    expect.append((7, int(prev), int(t)))
                prev = t
            else:
                prev = float("nan")
        carry = prev

    got_rows = (
        [tuple(r) for r in got[["user_id", "first_fail", "last_fail"]].itertuples(index=False)]
        if len(got)
        else []
    )
    assert got_rows == expect
    # carried state matches the loop's
    sv, sf_ = state.get
    assert (math.isnan(sv) and math.isnan(carry)) or sv == carry
    assert (math.isnan(sf_) and math.isnan(frontier)) or sf_ == frontier


# ---------------------------------------------------------------------------
# order-timeout: pending-pair state machine (data path)
# ---------------------------------------------------------------------------


@settings(max_examples=150, deadline=None)
@given(
    evs=st.lists(st.tuples(_ts, st.sampled_from(["create", "pay"])), min_size=1, max_size=40),
    batch_cuts=st.lists(st.integers(0, 200), max_size=3),
    chunk_splits=_splitter,
)
def test_order_timeout_fold_matches_rowloop(evs, batch_cuts, chunk_splits):
    ddl = 15
    fn = build_order_timeout_fn(ddl, "create", "ts", "event_type")
    df = pd.DataFrame(
        {"ts": pd.to_datetime([t for t, _ in evs], unit="s"), "event_type": [e for _, e in evs]}
    )
    batches = _mk_batches(df, batch_cuts, chunk_splits)
    got, state = _run_fold(fn, (3,), batches)

    create_ts, pay_ts = float("nan"), float("nan")
    expect = []
    for chunks in batches:
        live = [c for c in chunks if len(c)]
        if not live:
            continue
        pdf = _sorted_batch(live, ["ts"])
        for _, r in pdf.iterrows():
            t = r.ts.timestamp()
            if r.event_type == "create":
                if not math.isnan(pay_ts):
                    status = (
                        "payed successfully" if pay_ts <= t + ddl else "payed but already timeout"
                    )
                    expect.append((3, status, int(t), int(pay_ts)))
                    create_ts, pay_ts = float("nan"), float("nan")
                else:
                    create_ts = t
            else:
                if not math.isnan(create_ts):
                    status = (
                        "payed successfully"
                        if t <= create_ts + ddl
                        else "payed but already timeout"
                    )
                    expect.append((3, status, int(create_ts), int(t)))
                    create_ts, pay_ts = float("nan"), float("nan")
                else:
                    pay_ts = t

    got_rows = (
        [tuple(r) for r in got[["order_id", "status", "create_ts", "pay_ts"]].itertuples(index=False)]
        if len(got)
        else []
    )
    assert got_rows == expect
    if math.isnan(create_ts) and math.isnan(pay_ts):
        assert not state.exists
    else:
        sc, sp = state.get
        for a, b in ((sc, create_ts), (sp, pay_ts)):
            assert (math.isnan(a) and math.isnan(b)) or a == b


# ---------------------------------------------------------------------------
# blacklist: daily threshold crossing, one warning per day
# ---------------------------------------------------------------------------


@settings(max_examples=150, deadline=None)
@given(
    ts=st.lists(st.integers(0, 3 * 86400), min_size=1, max_size=60),
    batch_cuts=st.lists(st.integers(0, 200), max_size=3),
    chunk_splits=_splitter,
    cap=st.integers(1, 6),
)
def test_blacklist_fold_matches_rowloop(ts, batch_cuts, chunk_splits, cap):
    fn = build_blacklist_fn(cap, "ts")
    df = pd.DataFrame({"ts": pd.to_datetime(ts, unit="s")})
    batches = _mk_batches(df, batch_cuts, chunk_splits)
    got, state = _run_fold(fn, (1, 2), batches)

    day, count, warned = "", 0, 0
    expect = []
    for chunks in batches:
        live = [c for c in chunks if len(c)]
        if not live:
            continue
        pdf = _sorted_batch(live, ["ts"])
        for _, r in pdf.iterrows():
            d = r.ts.strftime("%Y-%m-%d")
            # late-arrival policy: a day is final once a newer day is seen
            if day and d < day:
                continue
            if d != day:
                day, count, warned = d, 0, 0
            count += 1
            if not warned and count > cap:
                warned = 1
                expect.append((1, 2, d, cap + 1))

    got_rows = (
        [tuple(r) for r in got[["user_id", "ad_id", "day", "click_count"]].itertuples(index=False)]
        if len(got)
        else []
    )
    assert got_rows == expect
    assert state.get == (day, count, warned)


# ---------------------------------------------------------------------------
# per-element Bloom UV: exact FIRE sequence + reference hash parity
# ---------------------------------------------------------------------------


def _ref_bloom_hash(uid: int, seed: int, nbits: int) -> int:
    """The reference Bloom hash, straight off the Scala string loop
    (UniqueVisitor_03_Bloom.scala:157-176): h = h*seed + char over
    str(uid), Int wrap-around, masked to the bitmap."""
    h = 0
    for ch in str(uid):
        h = (h * seed + ord(ch)) & 0xFFFFFFFF
    return h & (nbits - 1)


@settings(max_examples=100, deadline=None)
@given(
    evs=st.lists(
        st.tuples(
            _ts,
            st.one_of(
                st.integers(-(2**63), 2**63 - 1),
                st.integers(-5, 5),  # dense → same-uid repeats
            ),
        ),
        min_size=1,
        max_size=50,
    ),
    batch_cuts=st.lists(st.integers(0, 200), max_size=3),
    chunk_splits=_splitter,
)
def test_uv_bloom_fold_matches_rowloop(evs, batch_cuts, chunk_splits):
    nbits, seed = 1 << 10, 61  # tiny bitmap → frequent collisions, on purpose
    fn = build_uv_bloom_fn(nbits, seed, "ts", "user_id")
    df = pd.DataFrame(
        {
            "ts": pd.to_datetime([t for t, _ in evs], unit="s"),
            "user_id": pd.array([u for _, u in evs], dtype="int64"),
        }
    )
    batches = _mk_batches(df, batch_cuts, chunk_splits)
    got, state = _run_fold(fn, (3600,), batches)

    bits: set[int] = set()
    count = 0
    expect = []
    for chunks in batches:
        live = [c for c in chunks if len(c)]
        if not live:
            continue
        pdf = _sorted_batch(live, ["ts", "user_id"])
        for _, r in pdf.iterrows():
            off = _ref_bloom_hash(int(r.user_id), seed, nbits)
            if off not in bits:
                bits.add(off)
                count += 1
            expect.append((3600, int(r.user_id), count))

    got_rows = (
        [tuple(r) for r in got[["window_end", "user_id", "uv"]].itertuples(index=False)]
        if len(got)
        else []
    )
    assert got_rows == expect
    # final state: count and the exact bitmap
    scount, sbloom = state.get
    assert scount == count
    bloom_np = np.frombuffer(sbloom, dtype=np.uint8)
    set_bits = {
        int(i * 8 + b) for i in np.nonzero(bloom_np)[0] for b in range(8) if bloom_np[i] >> b & 1
    }
    assert set_bits == bits


# ---------------------------------------------------------------------------
# strict CEP chain: k-row adjacency with within-bound across batches
# ---------------------------------------------------------------------------


@settings(max_examples=150, deadline=None)
@given(
    evs=st.lists(
        st.tuples(_ts, st.booleans(), st.booleans()), min_size=1, max_size=40
    ),
    batch_cuts=st.lists(st.integers(0, 200), max_size=3),
    chunk_splits=_splitter,
    k=st.integers(1, 3),
    within=st.one_of(st.none(), st.integers(0, 10)),
)
def test_strict_match_fold_matches_rowloop(evs, batch_cuts, chunk_splits, k, within):
    from flink_wsr_project_spark.operators.cep import build_strict_match_fn

    names = [f"s{i}" for i in range(k)]
    fn = build_strict_match_fn(k, within, ["uid"], names)
    # step-match flags are independent booleans per row (step i uses
    # flag i % 2 — exercises repeated predicates for k=3)
    df = pd.DataFrame(
        {
            "_ts_s": pd.array([t for t, _, _ in evs], dtype="int64"),
            **{f"_m{i}": [int(ev[1 + i % 2]) for ev in evs] for i in range(k)},
        }
    )
    batches = _mk_batches(df, batch_cuts, chunk_splits)
    got, state = _run_fold(fn, (9,), batches)

    carry: list[tuple[int, list[int]]] = []  # trailing k-1 rows (ts, flags)
    expect = []
    for chunks in batches:
        live = [c for c in chunks if len(c)]
        if not live:
            continue
        pdf = _sorted_batch(live, ["_ts_s"])
        # plain tuples: itertuples mangles leading-underscore columns
        rows = [
            (int(r[0]), [int(r[1 + i]) for i in range(k)])
            for r in pdf.itertuples(index=False, name=None)
        ]
        # late-arrival policy: rows older than already-processed state
        # are dropped (the fold's documented Flink-style discipline —
        # splicing them after newer rows would emit reversed pairs)
        if carry:
            rows = [r for r in rows if r[0] >= carry[-1][0]]
            if not rows:
                continue
        comb = carry + rows
        for j in range(len(comb)):
            if j < max(k - 1, len(carry)):
                continue
            window = comb[j - (k - 1) : j + 1]
            if all(window[i][1][i] for i in range(k)) and (
                within is None or window[-1][0] - window[0][0] <= within
            ):
                expect.append((9, *[w[0] for w in window]))
        carry = comb[len(comb) - (k - 1) :] if k > 1 else []

    got_rows = (
        [tuple(r) for r in got[["uid", *[f"{n}_ts" for n in names]]].itertuples(index=False)]
        if len(got)
        else []
    )
    assert got_rows == expect
    # carried buffer matches the loop's trailing window
    import json

    buf = json.loads(state.get[0])
    assert [(b[0], b[1:]) for b in buf] == carry


# ---------------------------------------------------------------------------
# secondary-sort EWMA fold: per-user (acc + v) div 2 with cross-chunk carry
# ---------------------------------------------------------------------------


@settings(max_examples=150, deadline=None)
@given(
    evs=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 10**9)), min_size=1, max_size=50
    ),
    chunk_splits=_splitter,
)
def test_ewma_fold_matches_rowloop(evs, chunk_splits):
    from flink_wsr_project_spark.plans.analytics_queries import build_ewma_fold

    # mapInPandas input contract: one globally (user-)sorted partition,
    # split into Arrow chunks at ARBITRARY points (mid-user on purpose)
    evs = sorted(evs)
    df = pd.DataFrame(
        {
            "user_id": pd.array([u for u, _ in evs], dtype="int64"),
            "v_milli": pd.array([v for _, v in evs], dtype="int64"),
        }
    )
    chunks = _chunked(df, chunk_splits)
    out = pd.concat(list(build_ewma_fold()(iter(chunks))), ignore_index=True)

    expect = []
    for u in sorted({u for u, _ in evs}):
        vals = [v for uu, v in evs if uu == u]
        acc = vals[0]
        for v in vals[1:]:
            acc = (acc + v) // 2
        expect.append((u, len(vals), acc))

    got = [tuple(r) for r in out[["user_id", "n_events", "ewma_milli"]].itertuples(index=False)]
    assert got == expect


def test_strict_match_fold_drops_cross_batch_late_rows():
    """Regression (review finding): a match-eligible row arriving in a
    LATER micro-batch with an EARLIER event time than the carried
    buffer must be dropped, not appended after newer rows — the old
    fold built the sequence [10, 8] and emitted the time-reversed
    "adjacent" pair (first_ts=10, second_ts=8)."""
    from flink_wsr_project_spark.operators.cep import build_strict_match_fn

    fn = build_strict_match_fn(2, 5, ["uid"], ["a", "b"])
    b1 = pd.DataFrame({"_ts_s": pd.array([10], dtype="int64"), "_m0": [1], "_m1": [1]})
    b2 = pd.DataFrame({"_ts_s": pd.array([8], dtype="int64"), "_m0": [1], "_m1": [1]})
    got, state = _run_fold(fn, (1,), [[b1], [b2]])
    assert not len(got)  # no reversed (10, 8) pair
    # the frontier row stays buffered; the late row left no trace
    import json

    assert json.loads(state.get[0]) == [[10, 1, 1]]
    # an in-order successor still matches against the carried frontier
    b3 = pd.DataFrame({"_ts_s": pd.array([12], dtype="int64"), "_m0": [1], "_m1": [1]})
    got2, _ = _run_fold(fn, (1,), [[b3]], state=state)
    assert [tuple(r) for r in got2[["uid", "a_ts", "b_ts"]].itertuples(index=False)] == [
        (1, 10, 12)
    ]


def test_login_fail_fold_drops_cross_batch_late_rows():
    """Regression (same class as the CEP fix): a fail arriving in a
    later batch with an earlier ts than the carried fail frontier must
    be dropped, not paired backwards into (first_fail=10, last_fail=8)."""
    fn = build_login_fail_fn(2.0, "error", "ts", "event_type")
    b1 = pd.DataFrame({"ts": pd.to_datetime([10], unit="s"), "event_type": ["error"]})
    b2 = pd.DataFrame({"ts": pd.to_datetime([8], unit="s"), "event_type": ["error"]})
    got, state = _run_fold(fn, (7,), [[b1], [b2]])
    assert not len(got)
    assert state.get == (10.0, 10.0)  # frontier intact, late row left no trace
    # in-order successor still pairs with the carried fail
    b3 = pd.DataFrame({"ts": pd.to_datetime([11], unit="s"), "event_type": ["error"]})
    got2, _ = _run_fold(fn, (7,), [[b3]], state=state)
    assert [tuple(r) for r in got2[["user_id", "first_fail", "last_fail"]].itertuples(index=False)] == [
        (7, 10, 11)
    ]


def test_login_fail_fold_frontier_survives_success():
    """Review finding: the frontier must not die with the fail carry —
    after fail@100, fail@101 (warning) and a trailing success@102, a
    late replay of fail@99+fail@100 is BEHIND the processed frontier
    and must emit nothing, not a duplicate out-of-order warning."""
    fn = build_login_fail_fn(2.0, "error", "ts", "event_type")
    b1 = pd.DataFrame(
        {"ts": pd.to_datetime([100, 101], unit="s"), "event_type": ["error", "error"]}
    )
    b2 = pd.DataFrame({"ts": pd.to_datetime([102], unit="s"), "event_type": ["ok"]})
    late = pd.DataFrame(
        {"ts": pd.to_datetime([99, 100], unit="s"), "event_type": ["error", "error"]}
    )
    got, state = _run_fold(fn, (7,), [[b1], [b2], [late]])
    assert [tuple(r) for r in got[["user_id", "first_fail", "last_fail"]].itertuples(index=False)] == [
        (7, 100, 101)
    ]  # exactly the live warning, nothing from the replay
    sv, sf_ = state.get
    assert math.isnan(sv) and sf_ == 102.0


def test_blacklist_fold_finalizes_past_days():
    """Regression: late previous-day clicks after the day advanced must
    not reset the day counter and re-emit that day's warning."""
    fn = build_blacklist_fn(2, "ts")
    day1 = pd.DataFrame({"ts": pd.to_datetime([10, 20, 30], unit="s")})      # crosses cap=2
    day2 = pd.DataFrame({"ts": pd.to_datetime([86400 + 10], unit="s")})      # advances the day
    late1 = pd.DataFrame({"ts": pd.to_datetime([40, 50, 60], unit="s")})     # late day-1 clicks
    got, state = _run_fold(fn, (1, 2), [[day1], [day2], [late1]])
    days = [tuple(r) for r in got[["day", "click_count"]].itertuples(index=False)]
    assert days == [("1970-01-01", 3)]  # exactly ONE warning, from the live pass
    assert state.get[0] == "1970-01-02"  # frontier day unchanged by late rows


# ---------------------------------------------------------------------------
# KMV sketch fold: cross-batch bottom-k merge
# ---------------------------------------------------------------------------


def _ref_kmv(uids, k=4, m=1 << 28):
    import hashlib

    hs = sorted({int(hashlib.md5(f"uv:{u}".encode()).hexdigest()[:7], 16) for u in uids})[:k]
    return len(hs) if len(hs) < k else ((k - 1) * m) // hs[k - 1]


@settings(max_examples=100, deadline=None)
@given(
    uids=st.lists(st.integers(-50, 50), min_size=1, max_size=60),
    batch_cuts=st.lists(st.integers(0, 200), max_size=4),
    chunk_splits=_splitter,
)
def test_kmv_fold_merge_matches_set_semantics(uids, batch_cuts, chunk_splits):
    """The carried-state merge path (dedupe vs carried hashes +
    re-truncation to bottom-k) must converge to the set-semantics
    bottom-k regardless of batch/chunk boundaries — including ids
    repeated across batches and sketches already saturated at k.
    The fold's contract is a PRE-HASHED column (the operator computes
    h28 JVM-side); here the same md5 prefix is applied in the test
    harness so _ref_kmv stays the independent set-semantics oracle."""
    import hashlib

    from flink_wsr_project_spark.streaming.stateful import build_kmv_fold

    fn = build_kmv_fold(4, 1 << 28, "h28", ttl_ms=1000)
    hashes = [
        int(hashlib.md5(f"uv:{u}".encode()).hexdigest()[:7], 16) for u in uids
    ]
    # keep user_id alongside for the oracle bookkeeping below (the
    # fold itself only reads h28 — extra columns are ignored)
    df = pd.DataFrame(
        {
            "h28": pd.array(hashes, dtype="int64"),
            "user_id": pd.array(uids, dtype="int64"),
        }
    )
    batches = _mk_batches(df, batch_cuts, chunk_splits)
    got, state = _run_fold(fn, (86400,), batches)
    # last emission = converged estimate; every emission is the set
    # bottom-k of the ids seen so far
    seen = []
    expect_seq = []
    for chunks in batches:
        live = [c for c in chunks if len(c)]
        if not live:
            continue
        seen.extend(int(u) for c in live for u in c["user_id"].tolist())
        expect_seq.append((86400, _ref_kmv(seen)))
    got_rows = [tuple(r) for r in got[["window_end", "uv_kmv"]].itertuples(index=False)]
    # the converged (final) estimate equals the set-semantics bottom-k,
    # and the per-non-empty-batch running estimates appear in order
    # (empty batches re-emit the unchanged estimate between them)
    assert got_rows[-1] == expect_seq[-1]
    idx = 0
    for g in got_rows:
        if idx < len(expect_seq) and g == expect_seq[idx]:
            idx += 1
    assert idx == len(expect_seq), (got_rows, expect_seq)
    assert state.timeout_ts == 86400 * 1000 + 1000


def test_kmv_fold_rejects_degenerate_k():
    """k=1 makes the bottom-k estimator (k-1)·m/h_(k) identically 0 —
    and a 0/0 when the single kept 28-bit hash is itself 0 (p=2⁻²⁸
    per id: a certainty at 100 TB). The fold must refuse k<2 at BUILD
    time, not fold data and divide later; k=2 stays valid."""
    import pytest as _pytest

    from flink_wsr_project_spark.streaming.stateful import build_kmv_fold

    for bad in (1, 0, -3):
        with _pytest.raises(ValueError, match="k >= 2"):
            build_kmv_fold(bad, 1 << 28, "h28", ttl_ms=1000)
    # k=2 is the smallest non-degenerate sketch — must build and fold,
    # including the h=0 hash that broke k=1 (h_(k) is the LARGER kept
    # hash, nonzero whenever two distinct hashes exist)
    fn = build_kmv_fold(2, 1 << 28, "h28", ttl_ms=1000)
    df = pd.DataFrame({"h28": pd.array([0, 7], dtype="int64")})
    got, _ = _run_fold(fn, (86400,), [[df]])
    assert got["uv_kmv"].iloc[-1] == (1 << 28) // 7


def test_interval_ms_units_and_errors():
    """_interval_ms must accept every unit withWatermark itself takes
    (an operator forwarding the same string cannot crash on a value
    Spark accepts) and reject unknown units with a ValueError naming
    the accepted list, not a bare KeyError."""
    from flink_wsr_project_spark.streaming.stateful import _interval_ms

    assert _interval_ms("500 milliseconds") == 500
    assert _interval_ms("1 millisecond") == 1
    assert _interval_ms("3 seconds") == 3_000
    assert _interval_ms("2 minutes") == 120_000
    assert _interval_ms("1 hour") == 3_600_000
    assert _interval_ms("1 day") == 86_400_000
    assert _interval_ms("2 weeks") == 1_209_600_000
    assert _interval_ms("10 microseconds") == 0  # sub-ms floors to 0
    # CalendarInterval parsing is case-insensitive; '3 SECONDS' is
    # valid withWatermark input and must not raise here
    assert _interval_ms("3 SECONDS") == 3_000
    assert _interval_ms("1 Hour") == 3_600_000
    for bad in ("5 fortnights", "seconds", "1.5 seconds"):
        try:
            _interval_ms(bad)
        except ValueError as ex:
            assert "watermark interval" in str(ex)
        else:  # pragma: no cover
            raise AssertionError(f"{bad!r} should have raised")


# ---------------------------------------------------------------------------
# streaming EWMA: order-dependent incremental fold
# ---------------------------------------------------------------------------


@settings(max_examples=150, deadline=None)
@given(
    evs=st.lists(
        st.tuples(_ts, st.integers(0, 99), st.integers(0, 5000)),
        min_size=1,
        max_size=40,
    ),
    batch_cuts=st.lists(st.integers(0, 200), max_size=3),
    chunk_splits=_splitter,
)
def test_ewma_stream_fold_matches_rowloop(evs, batch_cuts, chunk_splits):
    """(ts, event_id, v_milli) streams through random micro-batch and
    Arrow-chunk boundaries; the fold must equal a per-row reference
    implementing the same (ts, event_id)-sorted recursion with the
    late-drop frontier policy."""
    from flink_wsr_project_spark.streaming.stateful import build_ewma_stream_fn

    fn = build_ewma_stream_fn("ts", "v_milli")
    df = pd.DataFrame(
        {
            "ts": pd.to_datetime([t for t, _, _ in evs], unit="s"),
            "event_id": pd.array([e for _, e, _ in evs], dtype="int64"),
            "v_milli": pd.array([v for _, _, v in evs], dtype="int64"),
        }
    )
    batches = _mk_batches(df, batch_cuts, chunk_splits)
    got, state = _run_fold(fn, (7,), batches)

    n, acc, frontier = 0, 0, float("nan")
    expect = []
    emitted = False
    for chunks in batches:
        live = [c for c in chunks if len(c)]
        if not live:
            continue
        emitted = True
        pdf = _sorted_batch(live, ["ts", "event_id"])
        for _, r in pdf.iterrows():
            t = r.ts.timestamp()
            if not math.isnan(frontier) and t < frontier:
                continue  # late row behind the processed frontier
            frontier = t
            acc = int(r.v_milli) if n == 0 else (acc + int(r.v_milli)) // 2
            n += 1
        expect.append((7, n, acc))

    got_rows = (
        [tuple(r) for r in got[["user_id", "n_events", "ewma_milli"]].itertuples(index=False)]
        if len(got)
        else []
    )
    assert got_rows == expect
    if emitted:
        sn, sa, sf_ = state.get
        assert (sn, sa) == (n, acc)
        assert sf_ == frontier


# ---------------------------------------------------------------------------
# streaming LOCF: grid emission with carried last observation
# ---------------------------------------------------------------------------


@settings(max_examples=150, deadline=None)
@given(
    evs=st.lists(
        st.tuples(_ts, st.integers(0, 99), st.integers(-5000, 5000)),
        min_size=1,
        max_size=40,
    ),
    batch_cuts=st.lists(st.integers(0, 200), max_size=3),
    chunk_splits=_splitter,
)
def test_locf_fold_matches_rowloop(evs, batch_cuts, chunk_splits):
    """(t_sec, event_id, v_milli) through random micro-batch/chunk
    boundaries; the fold must equal a per-batch reference applying the
    same semantics: late rows behind the last-observation frontier
    drop, the carried observation merges into the (t, event_id) sort,
    and each grid point g emits the last observation with t <= g (NULL
    before the first observation). step=7 so grids and observations
    interleave densely."""
    from flink_wsr_project_spark.streaming.stateful import build_locf_fold

    step = 7
    fn = build_locf_fold(step, "t_sec", "v_milli", "event_id")
    df = pd.DataFrame(
        {
            "t_sec": pd.array([t for t, _, _ in evs], dtype="int64"),
            "event_id": pd.array([e for _, e, _ in evs], dtype="int64"),
            "v_milli": pd.array([v for _, _, v in evs], dtype="int64"),
        }
    )
    batches = _mk_batches(df, batch_cuts, chunk_splits)
    got, state = _run_fold(fn, (7,), batches)

    last = None  # carried (t, ord, v)
    next_grid = None
    expect = []  # (grid_ts, value-or-None)
    for chunks in batches:
        live = [c for c in chunks if len(c)]
        if not live:
            continue
        pdf = _sorted_batch(live, ["t_sec", "event_id"])
        recs = [
            (int(r.t_sec), int(r.event_id), int(r.v_milli))
            for r in pdf.itertuples(index=False)
        ]
        if last is None:
            work = recs
            if not work:
                continue
            next_grid = (work[0][0] // step) * step
        else:
            kept = [r for r in recs if r[0] >= last[0]]
            # STABLE (t, ord) sort, like the fold's lexsort — equal
            # (t, ord) rows keep carried-then-batch order, never
            # ordered by value
            work = sorted([last, *kept], key=lambda r: (r[0], r[1]))
        last_grid = (work[-1][0] // step) * step
        g = next_grid
        while g <= last_grid:
            cands = [r for r in work if r[0] <= g]
            expect.append((g, cands[-1][2] if cands else None))
            g += step
        next_grid = last_grid + step
        last = work[-1]

    got_rows = (
        [
            (int(r.grid_ts), None if pd.isna(r.locf_milli) else int(r.locf_milli))
            for r in got.itertuples(index=False)
        ]
        if len(got)
        else []
    )
    assert got_rows == expect
    if last is not None:
        st_t, st_v, st_o, st_next = state.get
        assert (st_t, st_o, st_v) == last
        assert st_next == next_grid
        assert all(int(u) == 7 for u in got["user_id"].dropna())


# ---------------------------------------------------------------------------
# frontier tie semantics, pinned per fold (r5 verdict item 6): a second
# batch whose first row's ts EQUALS the first batch's last processed ts
# must FOLD (ties at the frontier are kept), and a strictly-older row
# must DROP. These are intended-behavior pins, not redundancy with the
# row-loop properties (whose references mirror the same policy).
# ---------------------------------------------------------------------------


def _dt(secs):
    return pd.to_datetime(secs, unit="s")


def test_login_fail_frontier_tie_folds_older_drops():
    from flink_wsr_project_spark.streaming.stateful import build_login_fail_fn

    fn = build_login_fail_fn(2.0, "error", "ts", "event_type")
    b1 = pd.DataFrame({"ts": _dt([10]), "event_type": ["error"]})
    # tie at the frontier (ts=10) folds -> adjacent pair (10, 10) warns;
    # the strictly-older fail (ts=9) drops (no (9, ...) pair, no reorder)
    b2 = pd.DataFrame({"ts": _dt([10, 9]), "event_type": ["error", "error"]})
    got, state = _run_fold(fn, (1,), [[b1], [b2]])
    pairs = [tuple(r) for r in got[["first_fail", "last_fail"]].itertuples(index=False)]
    assert pairs == [(10, 10)]
    assert state.get[1] == 10.0  # frontier unchanged by the late row


def test_ewma_frontier_tie_folds_older_drops():
    from flink_wsr_project_spark.streaming.stateful import build_ewma_stream_fn

    fn = build_ewma_stream_fn("ts", "v_milli")
    b1 = pd.DataFrame(
        {"ts": _dt([10]), "event_id": pd.array([1], dtype="int64"),
         "v_milli": pd.array([100], dtype="int64")}
    )
    b2 = pd.DataFrame(
        {"ts": _dt([10, 9]), "event_id": pd.array([2, 3], dtype="int64"),
         "v_milli": pd.array([50, 999], dtype="int64")}
    )
    got, state = _run_fold(fn, (1,), [[b1], [b2]])
    rows = [tuple(r) for r in got[["n_events", "ewma_milli"]].itertuples(index=False)]
    # batch1: acc=100. batch2: the ts=10 tie folds ((100+50)//2 = 75);
    # the ts=9 row is late and drops (would have folded first by sort
    # order and changed everything downstream)
    assert rows == [(1, 100), (2, 75)]


def test_blacklist_frontier_tie_folds_older_drops():
    from flink_wsr_project_spark.streaming.stateful import build_blacklist_fn

    fn = build_blacklist_fn(3, "ts")
    day0, day1 = 5 * 86400, 6 * 86400
    b1 = pd.DataFrame({"ts": _dt([day1 + 10])})  # day 1970-01-07, count=1
    # same-day rows fold (count 1+3=4 > cap -> exactly one warning);
    # the previous-day row drops (its day is final; recounting could
    # re-warn)
    b2 = pd.DataFrame({"ts": _dt([day1 + 10, day1 + 20, day1 + 30, day0 + 50])})
    got, state = _run_fold(fn, (1, 2), [[b1], [b2]])
    assert len(got) == 1 and got.iloc[0]["day"] == "1970-01-07"
    assert state.get == ("1970-01-07", 4, 1)


def test_cep_frontier_tie_folds_older_drops():
    from flink_wsr_project_spark.operators.cep import build_strict_match_fn

    fn = build_strict_match_fn(2, 5, ["uid"], ["a", "b"])
    b1 = pd.DataFrame(
        {"_ts_s": pd.array([10], dtype="int64"), "_m0": [1], "_m1": [1]}
    )
    # buffer frontier is ts=10; the tie row (ts=10) folds and is
    # ADJACENT to the buffered row -> match (10, 10); the ts=8 row is
    # behind the buffer and drops (no (8, 10) reordered match)
    b2 = pd.DataFrame(
        {"_ts_s": pd.array([10, 8], dtype="int64"), "_m0": [1, 1], "_m1": [1, 1]}
    )
    got, _ = _run_fold(fn, (9,), [[b1], [b2]])
    matches = [tuple(r) for r in got[["a_ts", "b_ts"]].itertuples(index=False)]
    assert matches == [(10, 10)]


# ---------------------------------------------------------------------------
# CMS fold: cell-wise counting merge is order/boundary-independent
# ---------------------------------------------------------------------------


@settings(max_examples=100, deadline=None)
@given(
    cells=st.lists(st.integers(0, 4 * 8 - 1), min_size=1, max_size=80),
    batch_cuts=st.lists(st.integers(0, 200), max_size=4),
    chunk_splits=_splitter,
)
def test_cms_fold_counts_match_any_chunking(cells, batch_cuts, chunk_splits):
    """Cell-wise addition commutes: however the pre-computed flat cell
    indices are cut into micro-batches and Arrow chunks (including
    empty chunks), the final cell array equals one np.bincount over
    everything, n_folded counts occurrences (rows/depth), and every
    emission is the running bincount of rows seen so far."""
    from flink_wsr_project_spark.streaming.stateful import build_cms_fold

    DEPTH, WIDTH = 4, 8
    fn = build_cms_fold(DEPTH, WIDTH, "cell", ttl_ms=1000)
    df = pd.DataFrame({"cell": pd.array(cells, dtype="int64")})
    batches = _mk_batches(df, batch_cuts, chunk_splits)
    got, state = _run_fold(fn, (86400,), batches)
    # one emission per micro-batch (even empty ones re-emit)
    assert len(got) == len(batches)
    running: list[int] = []
    for (_, row), chunks in zip(got.iterrows(), batches):
        running.extend(int(c) for ch in chunks for c in ch["cell"].tolist())
        expect = np.bincount(np.array(running, dtype=np.int64), minlength=DEPTH * WIDTH)
        assert row["window_end"] == 86400
        assert row["n_folded"] == len(running) // DEPTH
        assert row["nonzero"] == int(np.count_nonzero(expect))
        assert list(row["cells"]) == expect.tolist()
    # carried state equals the final cells; eviction timer is armed
    assert list(state.get[0]) == expect.tolist()
    assert state.timeout_ts == 86400 * 1000 + 1000


# ---------------------------------------------------------------------------
# pattern-correlation fold: trailing-k window scorer
# ---------------------------------------------------------------------------

_PAT = (0, 100, 300, 600, 1000, 600, 300, 100)


def _ref_pattern_windows(rows):
    """Per-row reference: sort by (t, event_id), score every length-k
    adjacent window with plain Python ints/floats."""
    k, sp = len(_PAT), sum(_PAT)
    den = float(k * sum(p * p for p in _PAT) - sp * sp)
    rows = sorted(rows, key=lambda r: (r[0], r[1]))
    out = []
    for e in range(k - 1, len(rows)):
        win = rows[e - k + 1 : e + 1]
        xs = [r[2] for r in win]
        sx, sxx = sum(xs), sum(v * v for v in xs)
        sxy = sum(p * v for p, v in zip(_PAT, xs))
        var = k * sxx - sx * sx
        if var > 0:
            corr = math.floor(1000.0 * (k * sxy - sx * sp) / (math.sqrt(float(var)) * math.sqrt(den)))
            out.append((rows[e][1], rows[e][0], corr))  # (event_id, t, corr)
    return out


@settings(max_examples=100, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 30), st.integers(-500, 500)),
        min_size=1,
        max_size=40,
        unique_by=lambda r: r,
    ),
    chunk_splits=_splitter,
)
def test_pattern_fold_single_batch_matches_reference(rows, chunk_splits):
    """One micro-batch, arbitrary Arrow chunking: the convolve fold
    must equal the per-row reference over the (t, event_id)-sorted
    rows — including duplicate timestamps, negative values, and
    zero-variance windows (which emit nothing)."""
    from flink_wsr_project_spark.streaming.stateful import build_pattern_corr_fold

    fn = build_pattern_corr_fold(_PAT)
    df = pd.DataFrame(
        {
            "t": pd.array([t for t, _ in rows], dtype="int64"),
            "event_id": pd.array(range(len(rows)), dtype="int64"),
            "x": pd.array([x for _, x in rows], dtype="int64"),
        }
    )
    got, state = _run_fold(fn, (7,), [_chunked(df, chunk_splits)])
    expect = _ref_pattern_windows(
        [(int(t), i, int(x)) for i, (t, x) in enumerate(rows)]
    )
    got_rows = [
        (r.event_id, r.window_end_ts, r.corr_milli)
        for r in got.itertuples(index=False)
    ]
    assert got_rows == expect
    # carried tail is the last k-1 rows of the sorted input; frontier
    # is the max t seen
    assert len(state.get[0]) == min(len(rows), len(_PAT) - 1)
    assert state.get[3] == max(t for t, _ in rows)


def test_pattern_fold_frontier_ties_fold_and_older_drops():
    """Cross-batch late policy: a second-batch row whose t EQUALS the
    first batch's last t folds (appended after the carried tail); a
    strictly older row drops — never spliced between buffered rows."""
    from flink_wsr_project_spark.streaming.stateful import build_pattern_corr_fold

    fn = build_pattern_corr_fold(_PAT)
    k = len(_PAT)
    b1 = pd.DataFrame(
        {
            "t": pd.array(range(10, 10 + k), dtype="int64"),
            "event_id": pd.array(range(k), dtype="int64"),
            "x": pd.array([v * 10 for v in range(k)], dtype="int64"),
        }
    )
    got1, state = _run_fold(fn, (7,), [[b1]])
    assert len(got1) == 1  # one full window
    assert state.get[3] == 10 + k - 1
    # tie at the frontier folds: a new window completes
    tie = pd.DataFrame(
        {
            "t": pd.array([10 + k - 1], dtype="int64"),
            "event_id": pd.array([100], dtype="int64"),
            "x": pd.array([999], dtype="int64"),
        }
    )
    got2, state = _run_fold(fn, (7,), [[tie]], state=state)
    assert list(got2["event_id"]) == [100]
    # strictly older than the frontier drops: no emission, state unchanged
    old = pd.DataFrame(
        {
            "t": pd.array([10], dtype="int64"),
            "event_id": pd.array([101], dtype="int64"),
            "x": pd.array([5], dtype="int64"),
        }
    )
    before = state.get
    got3, state = _run_fold(fn, (7,), [[old]], state=state)
    assert len(got3) == 0
    assert state.get == before


# ---------------------------------------------------------------------------
# band-claim fold (streaming near-dup): keep-first bucket keeper
# ---------------------------------------------------------------------------


@settings(max_examples=100, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 20), st.integers(1, 50)),  # (t, doc_id)
        min_size=1,
        max_size=30,
    ),
    batch_cuts=st.lists(st.integers(0, 200), max_size=4),
    chunk_splits=_splitter,
)
def test_band_claim_keeper_is_first_of_first_batch(rows, batch_cuts, chunk_splits):
    """The bucket keeper is the (t, doc_id)-minimal row of the FIRST
    non-empty micro-batch and never changes afterwards (keep-first is
    arrival-order semantics — a later batch's older row must not steal
    the claim); exactly one row ever has is_new_bucket, every emission
    carries the keeper, and the eviction timer tracks the newest t."""
    from flink_wsr_project_spark.streaming.dedup import build_band_claim_fold

    fn = build_band_claim_fold(1000)
    df = pd.DataFrame(
        {
            "t": pd.array([t for t, _ in rows], dtype="int64"),
            "doc_id": pd.array([d for _, d in rows], dtype="int64"),
            "band": pd.array([0] * len(rows), dtype="int64"),
        }
    )
    batches = _mk_batches(df, batch_cuts, chunk_splits)
    got, state = _run_fold(fn, (0, "h"), batches)
    first_batch = next(
        (chunks for chunks in batches if sum(len(c) for c in chunks)), None
    )
    fb = pd.concat(first_batch, ignore_index=True).sort_values(
        ["t", "doc_id"], kind="mergesort"
    )
    keeper = int(fb["doc_id"].iloc[0])
    assert (got["keeper_doc_id"] == keeper).all()
    assert int(got["is_new_bucket"].sum()) == 1
    claiming = got[got["is_new_bucket"]]
    assert int(claiming["doc_id"].iloc[0]) == keeper
    assert int(state.get[0]) == keeper
    # t is millisecond-granular; the eviction timer adds ttl directly
    assert state.timeout_ts == int(df["t"].max()) + 1000


# ---------------------------------------------------------------------------
# event-time eviction: every per-key fold arms, evicts, and re-seeds
# ---------------------------------------------------------------------------


def _login_batch(ts_s, types):
    return [[pd.DataFrame({"ts": pd.to_datetime(ts_s, unit="s"), "event_type": types})]]


def test_login_fail_fold_evicts_and_reseeds():
    """TTL contract (r6 verdict item 4): with ttl_ms > 0 the fold arms
    an event-time timer at frontier + ttl on EVERY invocation (v1
    timeouts are cleared per call), removes state on hasTimedOut, and
    a revived key re-seeds fresh — a post-eviction fail pair must
    still warn."""
    from flink_wsr_project_spark.streaming.stateful import build_login_fail_fn

    ttl = 3_600_000
    fn = build_login_fail_fn(2.0, "error", "ts", "event_type", ttl_ms=ttl)
    out, state = _run_fold(fn, (7,), _login_batch([10, 11], ["error", "error"]))
    assert len(out) == 1  # sanity: the pair warns
    assert state.timeout_ts == 11_000 + ttl  # armed at frontier + ttl

    # watermark clamp: a timer at/below the watermark kills the query
    state.watermark_ms = 12_000_000
    out2, state = _run_fold(fn, (7,), _login_batch([12], ["ok"]), state=state)
    assert state.timeout_ts == 12_000_001  # wm + 1, not 12_000 + ttl

    state.hasTimedOut = True
    outs = list(fn((7,), iter([]), state))
    assert not state.exists and len(outs[0]) == 0  # evicted, no output
    state.hasTimedOut = False

    # revival: fresh state, the adjacency logic restarts cleanly
    out3, state = _run_fold(fn, (7,), _login_batch([20, 21], ["error", "error"]), state=state)
    assert len(out3) == 1 and int(out3.iloc[0].first_fail) == 20


def test_ewma_fold_evicts_and_reseeds():
    from flink_wsr_project_spark.streaming.stateful import build_ewma_stream_fn

    ttl = 60_000
    fn = build_ewma_stream_fn("ts", "v_milli", ttl_ms=ttl)
    batch = [[pd.DataFrame({
        "ts": pd.to_datetime([5, 6], unit="s"),
        "event_id": [1, 2],
        "v_milli": [1000, 3000],
    })]]
    out, state = _run_fold(fn, (7,), batch)
    assert int(out.iloc[-1].ewma_milli) == 2000 and state.timeout_ts == 6_000 + ttl

    state.hasTimedOut = True
    outs = list(fn((7,), iter([]), state))
    assert not state.exists and len(outs[0]) == 0
    state.hasTimedOut = False

    # revival restarts the recursion from the first new value — the
    # documented semantic trade of evicting a whole-history fold
    out2, state = _run_fold(fn, (7,), [[pd.DataFrame({
        "ts": pd.to_datetime([100], unit="s"), "event_id": [3], "v_milli": [9000],
    })]], state=state)
    assert int(out2.iloc[0].n_events) == 1 and int(out2.iloc[0].ewma_milli) == 9000


def test_blacklist_fold_evicts_at_day_end_and_reseeds():
    from flink_wsr_project_spark.streaming.stateful import build_blacklist_fn

    ttl = 90_000_000  # 25 h
    fn = build_blacklist_fn(2, "ts", ttl_ms=ttl)
    out, state = _run_fold(fn, (7, 9), [[pd.DataFrame({
        "ts": pd.to_datetime([86400 + 10], unit="s"),
    })]])
    # armed at the STATE DAY's end + ttl (re-armable from state alone)
    assert state.timeout_ts == 2 * 86400 * 1000 + ttl

    state.hasTimedOut = True
    outs = list(fn((7, 9), iter([]), state))
    assert not state.exists and len(outs[0]) == 0
    state.hasTimedOut = False

    # revival re-seeds at count 0: three clicks re-cross the cap
    out2, state = _run_fold(fn, (7, 9), [[pd.DataFrame({
        "ts": pd.to_datetime([10 * 86400 + i for i in range(3)], unit="s"),
    })]], state=state)
    assert len(out2) == 1 and "WARNING" in out2.iloc[0].msg


def test_locf_fold_evicts_and_reseeds():
    from flink_wsr_project_spark.streaming.stateful import build_locf_fold

    ttl = 60_000
    fn = build_locf_fold(10, "t_sec", "v_milli", "event_id", ttl_ms=ttl)
    out, state = _run_fold(fn, (7,), [[pd.DataFrame({
        "t_sec": [5, 25], "v_milli": [100, 200], "event_id": [1, 2],
    })]])
    assert state.timeout_ts == 25_000 + ttl

    state.hasTimedOut = True
    outs = list(fn((7,), iter([]), state))
    assert not state.exists and len(outs[0]) == 0
    state.hasTimedOut = False

    # revival: the grid cursor restarts at the new first observation
    out2, state = _run_fold(fn, (7,), [[pd.DataFrame({
        "t_sec": [100], "v_milli": [700], "event_id": [3],
    })]], state=state)
    assert out2.grid_ts.tolist() == [100] and out2.locf_milli.tolist() == [700]


def test_pattern_corr_fold_evicts_and_reseeds():
    from flink_wsr_project_spark.streaming.stateful import build_pattern_corr_fold

    ttl = 60_000
    fn = build_pattern_corr_fold((1, 2, 3), ttl_ms=ttl)
    out, state = _run_fold(fn, (7,), [[pd.DataFrame({
        "t": [1, 2, 3], "event_id": [1, 2, 3], "x": [10, 20, 30],
    })]])
    assert len(out) == 1 and state.timeout_ts == 3_000 + ttl

    state.hasTimedOut = True
    outs = list(fn((7,), iter([]), state))
    assert not state.exists and len(outs[0]) == 0
    state.hasTimedOut = False

    # revival: the trailing buffer is gone — the first post-eviction
    # window needs k fresh rows
    out2, state = _run_fold(fn, (7,), [[pd.DataFrame({
        "t": [100, 101], "event_id": [4, 5], "x": [1, 2],
    })]], state=state)
    assert len(out2) == 0  # only k-1 rows since revival


def test_uv_bloom_fold_evicts_closed_window():
    from flink_wsr_project_spark.streaming.stateful import build_uv_bloom_fn

    ttl = 3_600_000
    fn = build_uv_bloom_fn(1 << 10, 61, "ts", "user_id", ttl_ms=ttl)
    out, state = _run_fold(fn, (7200,), [[pd.DataFrame({
        "ts": pd.to_datetime([3700], unit="s"), "user_id": [42],
    })]])
    # the key IS the window end: armed at window_end + ttl
    assert state.timeout_ts == 7200 * 1000 + ttl

    state.hasTimedOut = True
    outs = list(fn((7200,), iter([]), state))
    assert not state.exists and len(outs[0]) == 0


def test_eviction_ttl_shorter_than_watermark_rejected(spark):
    """Build-time guard (same discipline as the KMV k<2 reject): a TTL
    below the watermark delay can evict state that late-but-admissible
    rows (ts >= watermark) still need — the fold would silently
    re-seed and forget history the watermark contract promised to
    honor. Every entry point pairing the two knobs must refuse the
    degenerate configuration on a STREAMING frame; batch mode (no
    watermark, no timers) stays permissive."""
    import pytest

    from flink_wsr_project_spark.streaming.stateful import (
        blacklist_filter,
        ewma_stream,
        locf_stream,
        login_fail_detector,
        pattern_corr_stream,
        uv_per_element_bloom,
    )

    from pyspark.sql import functions as F

    stream = spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    cases = [
        (login_fail_detector, dict(watermark="10 minutes", idle_ttl="1 second")),
        (uv_per_element_bloom, dict(watermark="10 minutes", close_ttl="1 second")),
        (blacklist_filter, dict(watermark="10 minutes", idle_ttl="1 second")),
        (ewma_stream, dict(watermark="10 minutes", idle_ttl="1 second")),
        (pattern_corr_stream, dict(pattern=(1, -1), watermark="10 minutes", idle_ttl="1 second")),
        (locf_stream, dict(watermark="10 minutes", idle_ttl="1 second")),
    ]
    for fn, kw in cases:
        with pytest.raises(ValueError, match="shorter than the watermark"):
            fn(stream, **kw)
    # the boundary is inclusive: ttl == watermark delay must build
    assert login_fail_detector(
        stream.withColumnRenamed("timestamp", "ts")
        .withColumn("user_id", F.lit(1))
        .withColumn("event_type", F.lit("error")),
        watermark="10 minutes",
        idle_ttl="10 minutes",
    ) is not None
