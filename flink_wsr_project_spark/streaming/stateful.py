"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY.md §2.6 streaming forms — the reference's keyed
ProcessFunctions re-expressed on Spark's user-level state API).

Every UDF closure here is self-contained (no references back to this
package) so external driver sessions can execute them regardless of
worker PYTHONPATH.

State-size discipline (the 100 TB concern): each operator keeps O(1)
state per key — a pair of timestamps or a counter — never a buffer of
events, mirroring the reference's deliberate incremental designs
(``HotItems.scala:89-92``). Timeouts evict state exactly like the
reference's timers.

Throughput discipline (r4 verdict): every fold here is vectorized over
the whole micro-batch — one ``pd.concat`` + one STABLE sort, then a
numpy shifted-AND (login-fail), a run-level fold (order-timeout), a
day-level fold (blacklist), or a first-occurrence/cumsum fold
(per-element Bloom) — following the pattern proven in
``operators/cep.py`` (match_pattern_stream). No ``iterrows`` remains
in this module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout

from flink_wsr_project_spark.operators.windows import ensure_event_time


def _make_sorted_epoch():
    """Shared micro-batch preamble, built as a NESTED function so
    cloudpickle serializes it BY VALUE into each operator's closure —
    the logic lives in exactly one place while the state UDFs stay
    self-contained (no reference back to this package on workers).

    The returned function concatenates a micro-batch's Arrow chunks,
    applies ONE batch-wide STABLE sort (chunk-local sorts reorder
    events across chunk boundaries — the bug class fixed in
    operators/cep.py's match_pattern_stream), normalizes tz-aware
    timestamps to naive UTC, and returns ``(pdf, t)`` where ``t`` is a
    µs-resolution float64 epoch (µs is exact in float64; ns is not).
    """

    def _sorted_epoch(chunks, tcol, extra_by=()):
        import numpy as np
        import pandas as pd

        pdf = pd.concat(chunks, ignore_index=True).sort_values(
            [tcol, *extra_by], kind="mergesort"
        )
        tv = pdf[tcol]
        if getattr(tv.dt, "tz", None) is not None:
            tv = tv.dt.tz_convert("UTC").dt.tz_localize(None)
        t = (tv.to_numpy("datetime64[ns]").astype(np.int64) // 1000) / 1e6
        return pdf, t

    return _sorted_epoch


def build_login_fail_fn(gap: float, fail: str, tcol: str, ycol: str, ttl_ms: int = 0):
    """Fold for :func:`login_fail_detector`, exposed at module level so
    the property suite can drive it directly with a fake state object.
    The returned ``fn`` is a nested closure over primitives only —
    cloudpickle serializes it by value exactly as when it was defined
    inline, so worker self-containment is unchanged.

    ``ttl_ms > 0`` arms an event-time eviction timer at the processed
    frontier + ``ttl_ms`` on every invocation (clamped above the
    current watermark — arming at/below it is an error that kills the
    query); on timeout the key's state is dropped. A revived key
    re-seeds fresh: the warning pair itself needs ``gap`` (seconds)
    of adjacency, so eviction at an hours-scale TTL cannot lose a
    warning — the only semantic change is that rows older than the
    dead frontier are accepted again, and those are beyond the
    watermark horizon by construction. 0 disables arming (the batch
    / NoTimeout harness mode)."""
    sorted_epoch = _make_sorted_epoch()

    def fn(key, pdfs, state):
        import math

        import numpy as np
        import pandas as pd

        def _num(v):
            return float("nan") if v is None or math.isnan(v) else float(v)

        def _arm(frontier_s):
            if ttl_ms > 0 and not math.isnan(frontier_s):
                state.setTimeoutTimestamp(
                    max(
                        int(frontier_s * 1000) + ttl_ms,
                        state.getCurrentWatermarkMs() + 1,
                    )
                )

        cols = ["user_id", "first_fail", "last_fail", "msg"]
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame([], columns=cols)
            return
        # state: (last-fail ts or NaN, frontier = last PROCESSED ts).
        # The frontier is tracked separately because a trailing success
        # resets the fail carry to NaN — losing the frontier with it
        # would let late old fails slip behind already-processed rows.
        carry, frontier = float("nan"), float("nan")
        if state.exists:
            carry, frontier = _num(state.get[0]), _num(state.get[1])
        chunks = [p for p in pdfs if len(p)]
        if not chunks:
            state.update((carry, frontier))
            _arm(frontier)
            yield pd.DataFrame([], columns=cols)
            return
        pdf, t = sorted_epoch(chunks, tcol)
        if not math.isnan(frontier):
            # late-arrival policy (same as cep.build_strict_match_fn):
            # rows older than the processed frontier are dropped —
            # spliced after newer rows they would emit REVERSED warning
            # pairs (first_fail > last_fail)
            keep = t >= frontier
            if not keep.all():
                pdf, t = pdf[keep], t[keep]
                if not len(pdf):
                    state.update((carry, frontier))
                    _arm(frontier)
                    yield pd.DataFrame([], columns=cols)
                    return
        is_fail = pdf[ycol].to_numpy() == fail
        # Vectorized adjacent-pair match (cep.py shifted-AND pattern):
        # a warning at row j needs row j-1 (or the carried last event)
        # to be a fail within `gap`; non-fails carry NaN, which makes
        # the comparison False — the reset, for free.
        prev_fail_ts = np.concatenate(
            ([carry], np.where(is_fail[:-1], t[:-1], np.nan))
        )
        hit = is_fail & ((t - prev_fail_ts) <= gap)
        idx = np.nonzero(hit)[0]
        out = pd.DataFrame(
            {
                "user_id": np.full(len(idx), int(key[0]), dtype=np.int64),
                "first_fail": prev_fail_ts[idx].astype(np.int64),
                "last_fail": t[idx].astype(np.int64),
                "msg": "consecutive login failures",
            },
            columns=cols,
        )
        state.update((float(t[-1]) if is_fail[-1] else float("nan"), float(t[-1])))
        _arm(float(t[-1]))
        yield out

    return fn


def login_fail_detector(
    events: DataFrame,
    max_gap_s: float = 2.0,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    fail_value: str = "error",
    watermark: str = "10 minutes",
    idle_ttl: str = "1 hour",
) -> DataFrame:
    """C1 streaming: two consecutive failures within ``max_gap_s`` per
    user → warning.

    Reference: loginmonitor/LoginFail_CEP.scala:31-46 (strict ``next``
    contiguity, 2 s bound) and the hand-rolled ListState+timer twin
    LoginFail.scala:38-98. State: (last event was fail?, its ts) — two
    scalars per user, not a list of fails.

    State is evicted once the watermark passes the user's processed
    frontier + ``idle_ttl`` (event-time timeout): at 100 TB user-id
    cardinality is the thing you don't control, and a NoTimeout fold
    would hold two scalars per user FOREVER. The warning window is
    ``max_gap_s`` (seconds), so an hours-scale TTL cannot suppress a
    warning; a revived user re-seeds fresh (see
    :func:`build_login_fail_fn`).
    """
    streaming = events.isStreaming
    fn = build_login_fail_fn(
        float(max_gap_s),
        str(fail_value),
        ts_col,
        type_col,
        _ttl_ms_checked(idle_ttl, watermark, "login_fail_detector") if streaming else 0,
    )
    pre = ensure_event_time(events, ts_col)
    if streaming:
        pre = pre.withWatermark(ts_col, watermark)
    return pre.groupBy(user_col).applyInPandasWithState(
        fn,
        "user_id long, first_fail long, last_fail long, msg string",
        "last_fail double, frontier double",
        "append",
        GroupStateTimeout.EventTimeTimeout if streaming else GroupStateTimeout.NoTimeout,
    )


# NOTE: a second login-fail backend on Spark 4's state API v2
# (``transformWithStateInPandas`` + ``StatefulProcessor``) lived here
# through round 4. It was removed in round 5: the v2 runner's wire
# dependency (the ``google.protobuf`` runtime for pyspark's bundled
# ``StateMessage_pb2``) is absent from this environment and cannot be
# installed, so the execution path could never run — unexecutable code
# is a liability, not coverage. The v1 ``applyInPandasWithState``
# backend above carries identical semantics and full tests; a v2 port
# is mechanical when the runtime dependency exists (see git history,
# round-4 commit f46cae6 era, for the last working source).


def build_order_timeout_fn(ddl: int, cval: str, tcol: str, ycol: str):
    """Fold for :func:`order_timeout_monitor` (module-level for the
    property suite; pickling semantics unchanged — see
    :func:`build_login_fail_fn`)."""
    sorted_epoch = _make_sorted_epoch()

    def fn(key, pdfs, state):
        import math

        import pandas as pd

        cols = ["order_id", "status", "create_ts", "pay_ts"]
        if state.hasTimedOut:
            create_ts, pay_ts = state.get
            state.remove()
            # pay with no create (OrderTimeout_PF.scala:109-115) vs
            # create with no pay (:85-95)
            pay_only = math.isnan(create_ts) and not math.isnan(pay_ts)
            yield pd.DataFrame(
                [
                    {
                        "order_id": int(key[0]),
                        "status": (
                            "already payed but not found created log"
                            if pay_only
                            else "order timeout"
                        ),
                        "create_ts": int(create_ts) if not math.isnan(create_ts) else None,
                        "pay_ts": int(pay_ts) if not math.isnan(pay_ts) else None,
                    }
                ],
                columns=cols,
            )
            return

        import numpy as np

        create_ts, pay_ts = state.get if state.exists else (float("nan"), float("nan"))
        out = []
        chunks = [p for p in pdfs if len(p)]
        if chunks:
            # ONE micro-batch-wide STABLE sort (chunk-local sorts reorder
            # across Arrow-chunk boundaries), then a RUN-level fold: the
            # row loop collapses to runs of the same event kind, because
            # between emissions only one kind can be pending — a run's
            # FIRST element triggers the emission (pairing with the
            # pending other-kind ts), its LAST element re-arms the
            # pending slot. Runs per order ≈ its create/pay alternations
            # (a handful), so this loop is O(runs), never O(rows).
            pdf, t = sorted_epoch(chunks, tcol)
            isc = pdf[ycol].to_numpy() == cval
            n = len(t)
            starts = np.concatenate(([0], np.nonzero(isc[1:] != isc[:-1])[0] + 1))
            ends = np.concatenate((starts[1:], [n]))
            for s_, e_ in zip(starts, ends):
                kind_create = bool(isc[s_])
                first_t, last_t = float(t[s_]), float(t[e_ - 1])
                pending_other = pay_ts if kind_create else create_ts
                if not math.isnan(pending_other):
                    if kind_create:
                        create_ts, pay_ts = first_t, pending_other
                    else:
                        create_ts, pay_ts = pending_other, first_t
                    status = (
                        "payed successfully"
                        if pay_ts <= create_ts + ddl
                        else "payed but already timeout"
                    )
                    out.append(
                        {
                            "order_id": int(key[0]),
                            "status": status,
                            "create_ts": int(create_ts),
                            "pay_ts": int(pay_ts),
                        }
                    )
                    state.remove()
                    create_ts, pay_ts = float("nan"), float("nan")
                    if e_ - s_ > 1:  # rest of the run re-arms the slot
                        if kind_create:
                            create_ts = last_t
                        else:
                            pay_ts = last_t
                elif kind_create:
                    create_ts = last_t  # same-kind overwrite, latest wins
                else:
                    pay_ts = last_t
        if not math.isnan(create_ts) or not math.isnan(pay_ts):
            state.update((create_ts, pay_ts))
            # timer on whichever side arrived (PF registers one for the
            # pay-first case too, OrderTimeout_PF.scala:109-115)
            base = create_ts if not math.isnan(create_ts) else pay_ts
            state.setTimeoutTimestamp(int((base + ddl) * 1000))
        yield pd.DataFrame(out, columns=cols)

    return fn


def order_timeout_monitor(
    orders: DataFrame,
    deadline_s: int = 900,
    key_col: str = "order_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    create_value: str = "create",
    pay_value: str = "pay",
) -> DataFrame:
    """C3/C4 streaming: create→pay within deadline, else timeout.

    Reference: orderpay_detect/OrderTimeout_PF.scala:50-131 — ValueState
    (isCreated/isPayed/timerTs) + event-time timer at create+15 min
    (:85), handling pay-before-create (:109-115). Here: event-time
    timeout via ``GroupStateTimeout.EventTimeTimeout``; on timeout the
    state is evicted (the reference's timer-clear).
    """
    fn = build_order_timeout_fn(int(deadline_s), str(create_value), ts_col, type_col)
    orders = ensure_event_time(orders, ts_col)
    return orders.withWatermark(ts_col, "3 seconds").groupBy(key_col).applyInPandasWithState(
        fn,
        "order_id long, status string, create_ts long, pay_ts long",
        "create_ts double, pay_ts double",
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )


def build_uv_bloom_fn(nbits: int, sd: int, tcol: str, ucol: str, ttl_ms: int = 0):
    """Fold for :func:`uv_per_element_bloom` (module-level for the
    property suite; pickling semantics unchanged — see
    :func:`build_login_fail_fn`).

    ``ttl_ms > 0`` evicts a window's (count, bitmap) state once the
    watermark passes window_end + ``ttl_ms`` (the KMV fold's eviction
    pattern — the key IS the window end, so the timer needs no extra
    state); 0 disables arming (batch / NoTimeout harness mode)."""
    sorted_epoch = _make_sorted_epoch()

    def fn(key, pdfs, state):
        import numpy as np
        import pandas as pd

        cols = ["window_end", "user_id", "uv"]
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame([], columns=cols)
            return

        def _arm():
            if ttl_ms > 0:
                state.setTimeoutTimestamp(
                    max(
                        int(key[0]) * 1000 + ttl_ms,
                        state.getCurrentWatermarkMs() + 1,
                    )
                )

        if state.exists:
            count, bloom = state.get
            bloom_np = np.frombuffer(bloom, dtype=np.uint8).copy()
        else:
            count, bloom_np = 0, np.zeros(nbits >> 3, dtype=np.uint8)
        chunks = [p for p in pdfs if len(p)]
        if not chunks:
            state.update((int(count), bloom_np.tobytes()))
            _arm()
            yield pd.DataFrame([], columns=cols)
            return
        # ONE micro-batch-wide stable sort (chunk-local sorts would
        # reorder across Arrow-chunk boundaries). The per-element count
        # sequence LOOKS sequential (each emitted uv depends on every
        # prior bitmap mutation) but vectorizes exactly: an element
        # increments the count iff its bit is unset in the CARRIED bloom
        # AND it is the FIRST occurrence of that offset in the sorted
        # batch (np.unique's return_index) — so uv-after-element is
        # carried_count + cumsum(is_new). Bit tests/sets use byte
        # indexing (no bitmap expansion; bitwise_or.at handles duplicate
        # byte offsets), so memory stays bits/8 even at the reference's
        # 2^30.
        pdf, _ = sorted_epoch(chunks, tcol, (ucol,))
        uids = pdf[ucol].to_numpy(np.int64)
        # reference Bloom.hash (:157-176): polynomial fold over the
        # characters of ``str(id)`` with Scala Int wrap-around —
        # vectorized by digit position (ids grouped by digit count so
        # each group folds most-significant-first like the string loop).
        # A negative id's '-' folds FIRST (h starts at ord('-')), exact
        # parity with the string hash for unconstrained LongType ids;
        # two's-complement negation in uint64 covers int64 min, whose
        # abs overflows int64.
        offs = np.zeros(len(uids), dtype=np.uint64)
        neg = uids < 0
        u64 = uids.astype(np.uint64)
        absu = np.where(neg, ~u64 + np.uint64(1), u64)
        # exact digit count: integer threshold comparisons, no log10
        # float edges at powers of ten (abs(int64 min) has 19 digits)
        thresholds = np.array([10**k for k in range(1, 20)], dtype=np.uint64)
        ndig = np.searchsorted(thresholds, absu, side="right") + 1
        for length in np.unique(ndig):
            m = ndig == length
            u = absu[m]
            h = np.where(neg[m], np.uint64(45), np.uint64(0))  # ord('-')
            for pos in range(int(length) - 1, -1, -1):
                digit = (u // np.uint64(10**pos)) % np.uint64(10)
                h = (h * np.uint64(sd) + digit + np.uint64(48)) & np.uint64(0xFFFFFFFF)
            offs[m] = h & np.uint64(nbits - 1)
        offs = offs.astype(np.int64)
        byte_idx, bit = offs >> 3, (np.uint8(1) << (offs & 7).astype(np.uint8))
        already_set = (bloom_np[byte_idx] & bit) != 0
        _, first_idx = np.unique(offs, return_index=True)
        is_first = np.zeros(len(offs), dtype=bool)
        is_first[first_idx] = True
        is_new = is_first & ~already_set
        uv = count + np.cumsum(is_new)
        count = int(uv[-1])
        np.bitwise_or.at(bloom_np, byte_idx, bit)
        out = pd.DataFrame(
            {
                "window_end": np.full(len(uids), int(key[0]), dtype=np.int64),
                "user_id": uids,
                "uv": uv.astype(np.int64),
            },
            columns=cols,
        )
        state.update((int(count), bloom_np.tobytes()))
        _arm()
        yield out

    return fn


def uv_per_element_bloom(
    events: DataFrame,
    bits: int = 1 << 20,
    seed: int = 61,
    ts_col: str = "ts",
    user_col: str = "user_id",
    watermark: str = "10 minutes",
    close_ttl: str = "1 hour",
) -> DataFrame:
    """C6 + A10 streaming, EXACT per-element semantics: the reference's
    ``FIRE_AND_PURGE`` trigger emits an updated unique-visitor count for
    EVERY arriving element, deduplicating through a Bloom bitmap instead
    of buffering the window (``UniqueVisitor_03_Bloom.scala:62-92``
    trigger, ``:96-154`` process fn, ``:157-176`` Bloom).

    Spark's windowed aggregates can only emit per *trigger*, not per
    element — but ``applyInPandasWithState`` controls emission per ROW,
    so this reproduces the reference exactly: keyed by the hour-window
    end, state is ``(count, bloom bitmap)``, and each input element
    appends one output row carrying the count *after* that element —
    the precise FIRE sequence, not a boundary sample of it (the
    update-mode approximation and its divergence envelope are pinned in
    tests/test_streaming.py::test_per_element_trigger_envelope_update_mode).

    The Bloom is bit-compatible with the reference: polynomial rolling
    hash of the decimal user id with ``seed`` (Scala Int arithmetic —
    wrap at 2^32) masked by ``bits - 1`` (power of two, reference uses
    2^30). FIRE_AND_PURGE means the *elements* are never buffered:
    state is the bitmap + one counter per in-flight window — bits/8
    bytes per key (128 KiB at the 2^20 default, 128 MiB at the
    reference's 2^30 — the reference offloads it to Redis; on Spark it
    lives in the state store, checkpointed, no external service).
    """
    nbits = int(bits)
    if nbits & (nbits - 1):
        raise ValueError("bits must be a power of two (reference Bloom contract)")
    streaming = events.isStreaming
    # eviction: FIRE_AND_PURGE never buffers elements, but the bitmap
    # (bits/8 bytes per in-flight window) must still leave the state
    # store once the watermark passes window_end + the close horizon —
    # otherwise every closed hour accumulates 128 KiB forever
    fn = build_uv_bloom_fn(
        nbits,
        int(seed),
        ts_col,
        user_col,
        _ttl_ms_checked(close_ttl, watermark, "uv_per_element_bloom") if streaming else 0,
    )

    from pyspark.sql import functions as F

    pre = ensure_event_time(events, ts_col)
    if streaming:
        pre = pre.withWatermark(ts_col, watermark)
    keyed = pre.withColumn(
        "window_end",
        ((F.floor(F.unix_timestamp(F.col(ts_col)) / 3600) + 1) * 3600).cast("long"),
    )
    return keyed.groupBy("window_end").applyInPandasWithState(
        fn,
        "window_end long, user_id long, uv long",
        "count long, bloom binary",
        "append",
        GroupStateTimeout.EventTimeTimeout if streaming else GroupStateTimeout.NoTimeout,
    )


def blacklist_filter(
    clicks: DataFrame,
    threshold: int = 100,
    user_col: str = "user_id",
    key_col: str = "ad_id",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    idle_ttl: str = "25 hours",
) -> DataFrame:
    """C5 streaming: per-(user, ad) click counter; one-time warning when
    the daily count crosses the threshold.

    Reference: market/z_FilterBlackListUser.scala:8-43 — ValueState
    count + ``isSentBlackList`` flag, processing-time midnight reset
    (:20-22). Here the day is part of the state (event-time day —
    deterministic, SURVEY §7.4.5); crossing emits exactly one warning.

    State is evicted once the watermark passes the state-day's END +
    ``idle_ttl`` (event-time timeout): the counter is day-scoped by
    design, so a (user, ad) pair that stops clicking must not hold
    three scalars forever — at 100 TB the pair-key cardinality is the
    unbounded dimension. The default TTL (25 h past day end) outlives
    any day the counter can still legitimately change; a revived pair
    re-seeds at count 0 exactly as the reference's midnight reset
    does, and the late-day drop policy already made older rows no-ops.
    """
    streaming = clicks.isStreaming
    fn = build_blacklist_fn(
        int(threshold),
        ts_col,
        _ttl_ms_checked(idle_ttl, watermark, "blacklist_filter") if streaming else 0,
    )
    pre = ensure_event_time(clicks, ts_col)
    if streaming:
        pre = pre.withWatermark(ts_col, watermark)
    return pre.groupBy(user_col, key_col).applyInPandasWithState(
        fn,
        "user_id long, ad_id long, day string, click_count long, msg string",
        "day string, count long, warned long",
        "append",
        GroupStateTimeout.EventTimeTimeout if streaming else GroupStateTimeout.NoTimeout,
    )


def build_blacklist_fn(cap: int, tcol: str, ttl_ms: int = 0):
    """Fold for :func:`blacklist_filter` (module-level for the property
    suite; pickling semantics unchanged — see
    :func:`build_login_fail_fn`).

    ``ttl_ms > 0`` arms an event-time eviction timer at the state-day's
    END + ``ttl_ms`` (re-armable from the state alone — the day string
    is the only timestamp the fold keeps), clamped above the current
    watermark; on timeout the (user, ad) key's counter is dropped and a
    revival re-seeds at 0. 0 disables arming."""
    sorted_epoch = _make_sorted_epoch()

    def fn(key, pdfs, state):
        import numpy as np
        import pandas as pd

        cols = ["user_id", "ad_id", "day", "click_count", "msg"]
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame([], columns=cols)
            return
        day, count, warned = state.get if state.exists else ("", 0, 0)
        out = []
        chunks = [p for p in pdfs if len(p)]
        if chunks:
            # ONE micro-batch-wide STABLE sort, then a DAY-level fold:
            # per-row counting collapses to run lengths because ts-sorted
            # rows have nondecreasing days — the crossing row within a
            # day is position (cap - carried_count), so each day needs
            # one size + one comparison, never a per-row loop.
            pdf, t = sorted_epoch(chunks, tcol)
            # day runs via integer day ordinals — no per-row string
            # formatting; only the <= #runs boundary days are stringified
            # (floor-div on the µs epoch == the ns→D calendar floor,
            # including pre-1970 timestamps)
            day_ord = np.floor(t / 86400.0).astype(np.int64).astype("datetime64[D]")
            if day:
                # late-arrival policy: a day's counter is FINAL once a
                # newer day has been seen — late previous-day rows are
                # dropped (counting them would reset base to 0 and could
                # re-emit an already-sent warning for that day)
                keep = day_ord >= np.datetime64(day, "D")
                day_ord = day_ord[keep]
            n = len(day_ord)
            starts = (
                np.concatenate(([0], np.nonzero(day_ord[1:] != day_ord[:-1])[0] + 1))
                if n
                else np.empty(0, dtype=np.int64)
            )
            ends = np.concatenate((starts[1:], [n])) if n else starts
            for s_, e_ in zip(starts, ends):
                d = str(np.datetime_as_string(day_ord[s_], unit="D"))
                base, w = (count, warned) if d == day else (0, 0)
                size = int(e_ - s_)
                if not w and base + size > cap:
                    w = 1
                    out.append(
                        {
                            "user_id": int(key[0]),
                            "ad_id": int(key[1]),
                            "day": d,
                            "click_count": int(cap + 1),
                            "msg": f"WARNING: click count over {cap} today",
                        }
                    )
                day, count, warned = d, base + size, w
        state.update((day, count, warned))
        if ttl_ms > 0 and day:
            day_end_ms = (
                int(np.datetime64(day, "D").astype("datetime64[s]").astype(np.int64))
                + 86400
            ) * 1000
            state.setTimeoutTimestamp(
                max(day_end_ms + ttl_ms, state.getCurrentWatermarkMs() + 1)
            )
        yield pd.DataFrame(out, columns=cols)

    return fn


def build_ewma_stream_fn(tcol: str, vcol: str, ttl_ms: int = 0):
    """Fold for :func:`ewma_stream` (module-level for the property
    suite; pickling semantics unchanged — see
    :func:`build_login_fail_fn`).

    ``ttl_ms > 0`` arms event-time eviction at the processed frontier
    + ``ttl_ms`` (clamped above the watermark); on timeout the user's
    (n, acc, frontier) drops and a revival restarts the recursion from
    its first new value. Unlike the login-fail fold this IS a semantic
    trade — the recursion spans the user's whole history — so the TTL
    marks "this series ended"; it exists because at 100 TB key
    cardinality, not per-key size, is what overruns a state store.
    0 disables arming.

    State per user is three scalars — (n, acc, frontier) — the
    incremental form of the same e := (e + v) div 2 recursion the two
    batch plans compute (``user_value_ewma``'s in-row fold,
    ``user_value_ewma_partitioned``'s secondary sort). Within a batch
    rows fold in (ts, event_id) order; rows behind the processed
    frontier are dropped as late (the fold is order-DEPENDENT, so a
    spliced-late row would change every subsequent value — same policy
    as the login-fail/CEP folds, documented in SCALE.md). Cross-batch
    same-timestamp ties fold in batch-arrival order: the frontier is
    the last processed epoch at full (µs) resolution, so event_id
    ordering is guaranteed within a micro-batch, best-effort across
    them for rows sharing that exact timestamp.
    """
    sorted_epoch = _make_sorted_epoch()

    def fn(key, pdfs, state):
        import math

        import numpy as np
        import pandas as pd

        cols = ["user_id", "n_events", "ewma_milli"]
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame([], columns=cols)
            return

        def _arm(frontier_s):
            if ttl_ms > 0 and not math.isnan(frontier_s):
                state.setTimeoutTimestamp(
                    max(
                        int(frontier_s * 1000) + ttl_ms,
                        state.getCurrentWatermarkMs() + 1,
                    )
                )

        n, acc, frontier = state.get if state.exists else (0, 0, float("nan"))
        n = int(n)
        acc = int(acc)
        chunks = [p for p in pdfs if len(p)]
        if not chunks:
            # a key invoked with no data (harness edge; Spark only
            # calls per-key on arrival) emits nothing, like the peers
            state.update((n, acc, frontier))
            _arm(frontier)
            yield pd.DataFrame([], columns=cols)
            return
        pdf, t = sorted_epoch(chunks, tcol, extra_by=("event_id",))
        if not math.isnan(frontier):
            keep = t >= frontier
            pdf, t = pdf[keep], t[keep]
        for v in pdf[vcol].to_numpy(np.int64).tolist():
            # the recursion is sequential by definition (each step's
            # floor depends on the previous) — the loop IS the
            # algorithm, exactly as in build_ewma_fold; values are
            # non-negative milli-units, so Python // matches SQL
            # `div` (truncation)
            acc = v if n == 0 else (acc + v) // 2
            n += 1
        if len(pdf):
            frontier = float(t[-1])
        state.update((n, acc, frontier))
        _arm(frontier)
        yield pd.DataFrame(
            {"user_id": [int(key[0])], "n_events": [n], "ewma_milli": [acc]},
            columns=cols,
        )

    return fn


def ewma_stream(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
    watermark: str = "3 seconds",
    idle_ttl: str = "1 hour",
) -> DataFrame:
    """Streaming form of ``user_value_ewma``: per-user running
    exponentially weighted value (alpha = 1/2), emitted once per user
    per micro-batch and converging to the batch plans' value once all
    rows arrive (pinned by tests/test_streaming.py::
    test_ewma_stream_matches_batch; the cross-batch carry and
    late-drop policy are pinned at the fold level in
    tests/test_stateful_folds.py). Completes the one-semantics /
    three-plans set: in-row array fold (bounded history), secondary
    sort (unbounded history), and this O(1)-state incremental stream.
    """
    from pyspark.sql import functions as F

    from flink_wsr_project_spark.operators.windows import milli_value

    streaming = events.isStreaming
    fn = build_ewma_stream_fn(
        ts_col,
        "v_milli",
        _ttl_ms_checked(idle_ttl, watermark, "ewma_stream") if streaming else 0,
    )
    pre = ensure_event_time(events, ts_col)
    src = pre.select(
        F.col(user_col).cast("long").alias(user_col),
        F.col(ts_col),
        F.col("event_id").cast("long").alias("event_id"),
        milli_value(value_col).alias("v_milli"),
    )
    if streaming:
        src = src.withWatermark(ts_col, watermark)
    return src.groupBy(user_col).applyInPandasWithState(
        fn,
        "user_id long, n_events long, ewma_milli long",
        "n long, acc long, frontier double",
        "append",
        GroupStateTimeout.EventTimeTimeout if streaming else GroupStateTimeout.NoTimeout,
    )


def build_kmv_fold(k: int, m: int, hcol: str, ttl_ms: int):
    """Fold for :func:`kmv_distinct_stream`: per-window state is the
    ``k`` smallest DISTINCT 28-bit md5 hashes of the user ids — the
    associative bottom-k merge that makes a KMV sketch O(k)-state and
    partition-order-independent (the batch twin ``uv_daily_kmv``
    derives the identical estimate from a rank over the full distinct
    set). ``hcol`` is the PRE-HASHED 28-bit value: the md5 runs
    JVM-side as a SQL column (the batch twin's exact ``h28``
    expression, whole-stage codegen) before the groupBy, so the fold
    is pure int64 set/sort arithmetic — no per-element Python hashing
    in the hot path. Each trigger emits the window's current estimate;
    duplicate and above-k hashes never grow state. The window's sketch
    is EVICTED (event-time timeout) once the watermark passes
    window_end + ``ttl_ms`` — closed days do not accumulate in the
    state store.

    ``k`` must be ≥ 2: the bottom-k estimator ``(k-1)·m / h_(k)`` is
    degenerate at k=1 — the numerator is identically 0 and the kept
    hash can itself be 0 (a 28-bit md5 prefix hits it at p=2⁻²⁸,
    i.e. routinely in a 100 TB run), which would divide by zero."""
    if k < 2:
        raise ValueError(f"KMV needs k >= 2 (got k={k}): (k-1)*m/h_(k) is degenerate at k=1")

    def fn(key, pdfs, state):
        import numpy as np
        import pandas as pd

        cols = ["window_end", "n_sketch", "uv_kmv"]
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame([], columns=cols)
            return
        hs: list[int] = list(state.get[0]) if state.exists else []
        # bottom-k of a SET is arrival-order-independent: merge the
        # batch's distinct hashes (np.unique, in C) with the carried
        # sketch — everything from here is int64 set arithmetic
        arrs = [p[hcol].to_numpy(np.int64) for p in pdfs if len(p)]
        batch_hs = np.unique(np.concatenate(arrs)) if arrs else np.empty(0, np.int64)
        seen = set(hs)
        hs.extend(h for h in batch_hs.tolist() if h not in seen)
        hs = sorted(hs)[:k]
        state.update((hs,))
        state.setTimeoutTimestamp(int(key[0]) * 1000 + ttl_ms)
        d = len(hs)
        est = d if d < k else ((k - 1) * m) // hs[k - 1]
        yield pd.DataFrame(
            [{"window_end": int(key[0]), "n_sketch": d, "uv_kmv": int(est)}],
            columns=cols,
        )

    return fn


def _interval_ms(interval: str) -> int:
    """Parse a ``withWatermark``-style delay string ("500 milliseconds",
    "3 seconds", "1 day") to integer milliseconds, covering every unit
    Spark's CalendarInterval accepts for watermarks — an operator that
    forwards the same string to ``withWatermark`` must not crash on a
    value Spark itself would take. Unknown units raise ValueError with
    the accepted list (not KeyError)."""
    factors_ms = {
        "microsecond": 0.001,
        "millisecond": 1,
        "second": 1_000,
        "minute": 60_000,
        "hour": 3_600_000,
        "day": 86_400_000,
        "week": 604_800_000,
    }
    try:
        n, unit = interval.strip().split(" ", 1)
        # Spark's CalendarInterval parsing is case-insensitive
        # ('3 SECONDS' is valid withWatermark input) — match it
        return int(int(n) * factors_ms[unit.strip().lower().rstrip("s")])
    except (ValueError, KeyError):
        raise ValueError(
            f"unsupported watermark interval {interval!r}; expected "
            f"'<n> <unit>' with unit one of {sorted(factors_ms)} (plural ok)"
        ) from None


def _ttl_ms_checked(ttl: str, watermark: str, what: str) -> int:
    """Parse an eviction TTL, rejecting the degenerate configuration
    where it is SHORTER than the watermark delay (same build-time
    discipline as the KMV k<2 reject): a row is admissible as long as
    its event time is at or above the watermark, so a TTL below the
    watermark delay can evict a key's state while admissible rows for
    it are still in flight — the late row then re-seeds a fresh fold
    and the operator silently forgets history the watermark contract
    promised to honor (e.g. two login fails 1.5 s apart spanning the
    eviction never pair into a warning). Every docstring's "eviction
    cannot change emitted results" claim holds ONLY under
    ttl >= watermark delay, so enforce it where both knobs meet."""
    ttl_ms, wm_ms = _interval_ms(ttl), _interval_ms(watermark)
    if ttl_ms < wm_ms:
        raise ValueError(
            f"{what}: eviction TTL {ttl!r} is shorter than the watermark "
            f"delay {watermark!r}; admissible late rows could arrive after "
            "their key's state was evicted and silently re-seed the fold. "
            "Use a TTL >= the watermark delay."
        )
    return ttl_ms


def kmv_distinct_stream(
    events: DataFrame,
    k: int = 32,
    ts_col: str = "ts",
    user_col: str = "user_id",
    watermark: str = "3 seconds",
) -> DataFrame:
    """Streaming twin of the batch ``uv_daily_kmv`` sketch (A10's
    approximate-distinct intent with EXACTLY checkable arithmetic):
    keyed by the daily window end, state is the k smallest distinct
    user-id hashes — bounded at k longs per in-flight window versus
    ``approx_count_distinct``'s opaque HLL registers and the exact
    aggregate's O(distinct) set — and evicted once the watermark passes
    the window. Emits the window's current estimate every trigger
    (converges to the batch value once all rows arrive — pinned by
    tests/test_streaming.py::test_kmv_stream_matches_batch; the
    cross-batch merge is pinned at the fold level in
    tests/test_stateful_folds.py).
    """
    from pyspark.sql import functions as F

    from flink_wsr_project_spark.operators.dedup import h28

    wm_ms = _interval_ms(watermark)
    fn = build_kmv_fold(int(k), 1 << 28, "h28", wm_ms)
    pre = ensure_event_time(events, ts_col)
    # truncating `div`, identical to the batch twin's SQL — floor()
    # would disagree with uv_daily_kmv on pre-1970 timestamps
    keyed = pre.withColumn(
        "window_end",
        F.expr(
            f"(CAST(floor(unix_timestamp({ts_col})) AS BIGINT) div 86400) * 86400 + 86400"
        ),
    ).withColumn(
        # the 28-bit md5-prefix hash runs JVM-side (whole-stage
        # codegen), the batch twin's exact expression — the Python fold
        # only ever sees int64s
        "h28",
        F.expr(h28(f"concat('uv:', CAST({user_col} AS STRING))", "spark")),
    )
    if events.isStreaming:
        keyed = keyed.withWatermark(ts_col, watermark)
    # keep the watermarked ts column in the projection — dropping it
    # detaches the watermark and EventTimeTimeout refuses to plan
    return keyed.select("window_end", "h28", ts_col).groupBy("window_end").applyInPandasWithState(
        fn,
        "window_end long, n_sketch long, uv_kmv long",
        "hs array<long>",
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )


def build_cms_fold(depth: int, width: int, ccol: str, ttl_ms: int):
    """Fold for :func:`cms_cells_stream`: per-window state is the full
    Count-Min cell array — ``depth × width`` int64 counters, FIXED size
    regardless of how many distinct keys the window sees (the whole
    point of the sketch; the batch twin ``token_cms_heavy_hitters``
    builds the identical cells with a groupBy). ``ccol`` is the
    PRE-COMPUTED flat cell index ``r*width + bucket`` — the salted
    28-bit md5 hash and the modulo run JVM-side (whole-stage codegen)
    before the groupBy, so the fold is one ``np.bincount`` per
    micro-batch (pure C counting, no per-element Python hashing).

    Counting is commutative and associative, so — like the per-element
    Bloom fold and unlike the sequence-sensitive CEP folds — the result
    is arrival-order-independent and needs NO late-arrival frontier:
    every row that reaches the fold counts, wherever the micro-batch
    boundaries fall. The window's cells are EVICTED (event-time
    timeout) once the watermark passes window_end + ``ttl_ms``.

    Each trigger emits the window's current cells plus ``n_folded``
    (occurrences folded so far — monotone, so consumers keep the
    last emission per window) and ``nonzero`` (occupied cells).
    """

    def fn(key, pdfs, state):
        import numpy as np
        import pandas as pd

        cols = ["window_end", "n_folded", "nonzero", "cells"]
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame([], columns=cols)
            return
        ncells = depth * width
        if state.exists:
            cells = np.asarray(state.get[0], dtype=np.int64)
            n = int(state.get[1])
        else:
            cells = np.zeros(ncells, dtype=np.int64)
            n = 0
        arrs = [p[ccol].to_numpy(np.int64) for p in pdfs if len(p)]
        if arrs:
            flat = np.concatenate(arrs)
            cells = cells + np.bincount(flat, minlength=ncells)
            # state carries the RAW row count; dividing only at emission
            # keeps n_folded exact even if a chunk boundary ever split a
            # key's depth rows across batches
            n += len(flat)
        state.update((cells.tolist(), n))
        state.setTimeoutTimestamp(int(key[0]) * 1000 + ttl_ms)
        yield pd.DataFrame(
            [
                {
                    "window_end": int(key[0]),
                    "n_folded": n // depth,
                    "nonzero": int(np.count_nonzero(cells)),
                    "cells": cells.tolist(),
                }
            ],
            columns=cols,
        )

    return fn


def cms_user_cells_stream(
    events: DataFrame,
    depth: int = 4,
    width: int = 1024,
    ts_col: str = "ts",
    key_col: str = "user_id",
    watermark: str = "3 seconds",
) -> DataFrame:
    """Streaming twin of the batch Count-Min sketch
    (``token_cms_heavy_hitters``'s cell construction, keyed here by the
    daily window like the KMV twin): per in-flight window the state is
    the ``depth × width`` counter array — bounded by the sketch
    geometry, NOT by key cardinality — and merging across micro-batches
    is cell-wise addition, the same commutative merge that lets shard
    sketches combine on a 1000-executor cluster.

    Plan shape: the ``depth`` salted h28 hashes (the batch twin's exact
    ``'r<r>:' || key`` expressions) and bucket moduli are computed
    JVM-side as an array column, exploded to one row per (occurrence,
    hash-row) — a narrow 4× map, no extra shuffle — then one groupBy
    carries flat int64 cell indices into the fold, which is a single
    ``np.bincount`` per batch. Exactness is pinned by
    tests/test_streaming.py::test_cms_stream_matches_batch (final cells
    == an independent per-row reimplementation) and the fold-level
    order-independence property in tests/test_stateful_folds.py.
    """
    from pyspark.sql import functions as F

    from flink_wsr_project_spark.operators.dedup import h28

    wm_ms = _interval_ms(watermark)
    fn = build_cms_fold(int(depth), int(width), "cell", wm_ms)
    pre = ensure_event_time(events, ts_col)
    salted = ", ".join(
        "{r} * {w} + ({h}) % {w}".format(
            r=r,
            w=width,
            h=h28(f"concat('r{r}:', CAST({key_col} AS STRING))", "spark"),
        )
        for r in range(depth)
    )
    keyed = pre.withColumn(
        "window_end",
        F.expr(
            f"(CAST(floor(unix_timestamp({ts_col})) AS BIGINT) div 86400) * 86400 + 86400"
        ),
    ).withColumn("cell", F.explode(F.expr(f"array({salted})")))
    if events.isStreaming:
        keyed = keyed.withWatermark(ts_col, watermark)
    # keep the watermarked ts column in the projection (EventTimeTimeout)
    return keyed.select("window_end", "cell", ts_col).groupBy("window_end").applyInPandasWithState(
        fn,
        "window_end long, n_folded long, nonzero long, cells array<long>",
        "cells array<long>, n long",
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )


def build_pattern_corr_fold(pattern: tuple[int, ...], ttl_ms: int = 0):
    """Fold for :func:`pattern_corr_stream`: per-user state is the
    trailing ``len(pattern)-1`` (t, event_id, x) rows — exactly the
    buffer the batch ``series_pattern_topk`` materializes as lag
    columns — plus the late-arrival frontier. Each micro-batch is
    sorted ONCE by the batch twin's total order (second-floored t,
    then event_id), appended to the carried tail, and every length-k
    window ending at a new row emits its Pearson correlation against
    the fixed pattern: integer sliding sums via ``np.convolve`` (pure
    C), only the final normalization in IEEE double — the batch
    expression's exact arithmetic, including the milli-floor and the
    zero-variance filter.

    This fold is sequence-SENSITIVE (windows are composed of adjacent
    rows), so it adopts the module's uniform frontier policy: rows
    with ``t >= frontier`` (the last processed row's t) fold — ties at
    the frontier are processed in sorted order after the carried tail
    — and strictly older rows drop as late, never spliced between
    already-buffered rows."""

    k = len(pattern)
    s_p = sum(pattern)
    den = float(k * sum(p * p for p in pattern) - s_p * s_p)
    pat_rev = tuple(reversed(pattern))

    def fn(key, pdfs, state):
        import math

        import numpy as np
        import pandas as pd

        cols = ["user_id", "event_id", "window_end_ts", "corr_milli"]
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame([], columns=cols)
            return

        def _arm(frontier_s):
            if ttl_ms > 0 and frontier_s is not None:
                state.setTimeoutTimestamp(
                    max(
                        int(frontier_s) * 1000 + ttl_ms,
                        state.getCurrentWatermarkMs() + 1,
                    )
                )

        pdf = pd.concat(list(pdfs), ignore_index=True)
        if state.exists:
            ts0, eid0, xs0, frontier = state.get
        else:
            ts0, eid0, xs0, frontier = [], [], [], None
        if len(pdf):
            pdf = pdf.sort_values(["t", "event_id"], kind="mergesort")
            if frontier is not None:
                pdf = pdf[pdf["t"].to_numpy(np.int64) >= frontier]
        if not len(pdf):
            _arm(frontier)
            yield pd.DataFrame([], columns=cols)
            return
        t = np.concatenate([np.asarray(ts0, np.int64), pdf["t"].to_numpy(np.int64)])
        eid = np.concatenate(
            [np.asarray(eid0, np.int64), pdf["event_id"].to_numpy(np.int64)]
        )
        x = np.concatenate([np.asarray(xs0, np.int64), pdf["x"].to_numpy(np.int64)])
        out = pd.DataFrame([], columns=cols)
        if len(x) >= k:
            ones = np.ones(k, dtype=np.int64)
            sx = np.convolve(x, ones, "valid")
            sxx = np.convolve(x * x, ones, "valid")
            sxy = np.convolve(x, np.array(pat_rev, dtype=np.int64), "valid")
            var = k * sxx - sx * sx
            # every valid window ends at a NEW row (the carried tail is
            # < k rows), so nothing re-emits across batches
            keep = var > 0
            if keep.any():
                num = (k * sxy - sx * s_p)[keep].astype(np.float64)
                corr = np.floor(
                    1000.0 * num / (np.sqrt(var[keep].astype(np.float64)) * math.sqrt(den))
                ).astype(np.int64)
                ends = np.nonzero(keep)[0] + (k - 1)
                out = pd.DataFrame(
                    {
                        "user_id": np.full(len(ends), int(key[0]), dtype=np.int64),
                        "event_id": eid[ends],
                        "window_end_ts": t[ends],
                        "corr_milli": corr,
                    },
                    columns=cols,
                )
        tail = slice(max(0, len(x) - (k - 1)), len(x))
        state.update((t[tail].tolist(), eid[tail].tolist(), x[tail].tolist(), int(t[-1])))
        _arm(int(t[-1]))
        yield out

    return fn


def pattern_corr_stream(
    events: DataFrame,
    pattern: tuple[int, ...],
    ts_col: str = "ts",
    value_col: str = "value",
    user_col: str = "user_id",
    id_col: str = "event_id",
    watermark: str = "3 seconds",
    idle_ttl: str = "1 hour",
) -> DataFrame:
    """Streaming twin of the batch ``series_pattern_topk`` scorer (the
    lag-window subsequence correlation, emitted per window instead of
    globally top-K'd — rank the append-mode output to reproduce the
    batch result exactly): per-user O(k) state (the trailing k−1
    observations), the batch twin's exact integer sums and IEEE
    normalization, and the module's uniform late-arrival frontier.
    Pinned by tests/test_streaming.py::test_pattern_corr_stream_matches_batch
    and the fold-level chunking/late properties in
    tests/test_stateful_folds.py."""
    from pyspark.sql import functions as F

    from flink_wsr_project_spark.operators.windows import milli_value

    streaming = events.isStreaming
    fn = build_pattern_corr_fold(
        tuple(int(p) for p in pattern),
        _ttl_ms_checked(idle_ttl, watermark, "pattern_corr_stream") if streaming else 0,
    )
    pre = ensure_event_time(events, ts_col)
    keyed = pre.select(
        F.col(user_col).alias("user_id"),
        F.col(id_col).alias("event_id"),
        # the batch twin's exact units: second-floored epoch, milli value
        F.expr(f"CAST(floor(unix_timestamp({ts_col})) AS BIGINT)").alias("t"),
        milli_value(value_col).alias("x"),
        F.col(ts_col),
    )
    if streaming:
        keyed = keyed.withWatermark(ts_col, watermark)
    return keyed.groupBy("user_id").applyInPandasWithState(
        fn,
        "user_id long, event_id long, window_end_ts long, corr_milli long",
        "ts array<long>, eids array<long>, xs array<long>, frontier long",
        "append",
        GroupStateTimeout.EventTimeTimeout if streaming else GroupStateTimeout.NoTimeout,
    )


def build_locf_fold(step: int, tcol: str, vcol: str, ocol: str, ttl_ms: int = 0):
    """Fold for :func:`locf_stream`: per-user state is FOUR longs —
    the last observation (t, value, event_id) plus the next un-emitted
    grid point — the O(1) carry-forward state the batch twin
    ``user_value_locf`` re-derives with a window pass.

    Per batch: one stable sort on (t, event_id), late rows behind the
    last-observation frontier drop (same policy as the login-fail/
    EWMA folds — an interleaved-late row would rewrite already-emitted
    grid points), then every grid point from ``next_grid`` up to
    ``floor(max_t/step)*step`` is emitted in one vectorized
    ``searchsorted`` over the (carried ⊕ new) observation arrays: the
    value at grid point g is the last observation with t <= g in
    (t, event_id) order — bit-identical to the batch plan's
    ``last_value IGNORE NULLS`` over (t, is_obs DESC, ord_id). A grid
    point preceding the user's first observation emits NULL, exactly
    as the batch oracle does. Emitted grid points are final (append
    mode); a same-second observation arriving in a LATER batch folds
    into subsequent grid points only — the µs-tie best-effort shared
    by every order-dependent fold here.
    """

    def fn(key, pdfs, state):
        import numpy as np
        import pandas as pd

        cols = ["user_id", "grid_ts", "locf_milli"]
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame(
                {c: pd.array([], dtype="Int64") for c in cols}, columns=cols
            )
            return

        def _arm(last_obs_s):
            if ttl_ms > 0:
                state.setTimeoutTimestamp(
                    max(
                        int(last_obs_s) * 1000 + ttl_ms,
                        state.getCurrentWatermarkMs() + 1,
                    )
                )

        chunks = [p for p in pdfs if len(p)]
        if not chunks:
            if state.exists:
                state.update(tuple(state.get))
                _arm(state.get[0])
            yield pd.DataFrame({c: pd.array([], dtype="Int64") for c in cols}, columns=cols)
            return
        pdf = pd.concat(chunks, ignore_index=True).sort_values(
            [tcol, ocol], kind="mergesort"
        )
        t = pdf[tcol].to_numpy(np.int64)
        v = pdf[vcol].to_numpy(np.int64)
        o = pdf[ocol].to_numpy(np.int64)
        if state.exists:
            t0, v0, o0, next_grid = state.get
            keep = t >= t0  # frontier = last observation's (floored) second
            t, v, o = t[keep], v[keep], o[keep]
            # carried observation joins the sort so ties at the
            # frontier second order by event_id exactly as in batch
            t = np.concatenate(([t0], t))
            v = np.concatenate(([v0], v))
            o = np.concatenate(([o0], o))
            order = np.lexsort((o, t))
            t, v, o = t[order], v[order], o[order]
        else:
            # grid starts at the floor of the user's first observation
            next_grid = (int(t[0]) // step) * step
        last_grid = (int(t[-1]) // step) * step
        gs = np.arange(next_grid, last_grid + step, step, dtype=np.int64)
        idx = np.searchsorted(t, gs, side="right") - 1
        vals = pd.array(v[np.maximum(idx, 0)], dtype="Int64")
        vals[idx < 0] = pd.NA  # grid point before the first observation
        state.update((int(t[-1]), int(v[-1]), int(o[-1]), int(last_grid + step)))
        _arm(int(t[-1]))
        yield pd.DataFrame(
            {
                "user_id": pd.array([int(key[0])] * len(gs), dtype="Int64"),
                "grid_ts": pd.array(gs, dtype="Int64"),
                "locf_milli": vals,
            },
            columns=cols,
        )

    return fn


def locf_stream(
    events: DataFrame,
    step: int = 1800,
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
    watermark: str = "3 seconds",
    idle_ttl: str = "1 hour",
) -> DataFrame:
    """Streaming twin of ``user_value_locf``: per-user
    last-observation-carried-forward resampling onto a ``step``-second
    grid, emitting each grid point ONCE (append mode) as observations
    pass it. Completes the time-series set — LOCF was the only ordered
    fold without a streaming form (r5 verdict item 5). State is O(1)
    per user (one observation + the grid cursor); convergence to the
    batch plan over the same rows is pinned by
    tests/test_streaming.py::test_locf_stream_matches_batch and the
    fold's order/tie/late properties by tests/test_stateful_folds.py.

    The emitted grid tops out at the last SEEN observation's floor —
    Structured Streaming has no end-of-input flush, so the batch twin's
    final grid point appears once an observation at or past it arrives
    (the same convergence contract as every fold here).
    """
    from pyspark.sql import functions as F

    from flink_wsr_project_spark.operators.windows import milli_value

    streaming = events.isStreaming
    fn = build_locf_fold(
        int(step),
        "t_sec",
        "v_milli",
        "event_id",
        _ttl_ms_checked(idle_ttl, watermark, "locf_stream") if streaming else 0,
    )
    pre = ensure_event_time(events, ts_col)
    src = pre.select(
        F.col(user_col).cast("long").alias(user_col),
        F.col(ts_col),
        # floored epoch seconds, the batch twin's exact t expression
        F.col(ts_col).cast("timestamp").cast("long").alias("t_sec"),
        F.col("event_id").cast("long").alias("event_id"),
        milli_value(value_col).alias("v_milli"),
    )
    if streaming:
        src = src.withWatermark(ts_col, watermark)
    return src.groupBy(user_col).applyInPandasWithState(
        fn,
        "user_id long, grid_ts long, locf_milli long",
        "t long, v long, o long, next_grid long",
        "append",
        GroupStateTimeout.EventTimeTimeout if streaming else GroupStateTimeout.NoTimeout,
    )
