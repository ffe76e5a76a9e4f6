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
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout

from flink_wsr_project_spark.operators.windows import ensure_event_time


def login_fail_detector(
    events: DataFrame,
    max_gap_s: float = 2.0,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    fail_value: str = "error",
) -> DataFrame:
    """C1 streaming: two consecutive failures within ``max_gap_s`` per
    user → warning.

    Reference: loginmonitor/LoginFail_CEP.scala:31-46 (strict ``next``
    contiguity, 2 s bound) and the hand-rolled ListState+timer twin
    LoginFail.scala:38-98. State: (last event was fail?, its ts) — two
    scalars per user, not a list of fails.
    """
    gap = float(max_gap_s)
    fail = str(fail_value)
    tcol, ucol, ycol = ts_col, user_col, type_col

    def fn(key, pdfs, state):
        import math

        import pandas as pd

        last_fail_ts = None
        if state.exists:
            v = state.get[0]
            last_fail_ts = None if v is None or math.isnan(v) else v
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values([tcol])
            for _, row in pdf.iterrows():
                t = row[tcol].timestamp()
                if row[ycol] == fail:
                    if last_fail_ts is not None and t - last_fail_ts <= gap:
                        out.append(
                            {
                                "user_id": int(key[0]),
                                "first_fail": int(last_fail_ts),
                                "last_fail": int(t),
                                "msg": "consecutive login failures",
                            }
                        )
                    last_fail_ts = t
                else:
                    last_fail_ts = None
        state.update((float(last_fail_ts) if last_fail_ts is not None else float("nan"),))
        yield pd.DataFrame(out, columns=["user_id", "first_fail", "last_fail", "msg"])

    return events.groupBy(user_col).applyInPandasWithState(
        fn,
        "user_id long, first_fail long, last_fail long, msg string",
        "last_fail double",
        "append",
        GroupStateTimeout.NoTimeout,
    )


def login_fail_detector_v2(
    events: DataFrame,
    max_gap_s: float = 2.0,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    fail_value: str = "error",
) -> DataFrame:
    """C1 streaming on Spark 4's state API v2
    (``transformWithStateInPandas`` + ``StatefulProcessor``): identical
    semantics to :func:`login_fail_detector` — two consecutive failures
    within ``max_gap_s`` per user — with the same O(1) state (one
    ``ValueState`` holding the last-fail timestamp). The v2 API is the
    forward path (typed state handles, timers, TTL, state repartition-
    safe); keeping both backends proves the semantics are API-neutral
    (``tests/test_streaming.py`` asserts v1/v2/batch agreement).
    """
    gap = float(max_gap_s)
    fail = str(fail_value)
    tcol, ycol = ts_col, type_col

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class LoginFailProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._last = handle.getValueState("last_fail", "v double")

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            last = self._last.get()[0] if self._last.exists() else None
            out = []
            for pdf in rows:
                pdf = pdf.sort_values([tcol])
                for _, row in pdf.iterrows():
                    t = row[tcol].timestamp()
                    if row[ycol] == fail:
                        if last is not None and t - last <= gap:
                            out.append(
                                {
                                    "user_id": int(key[0]),
                                    "first_fail": int(last),
                                    "last_fail": int(t),
                                    "msg": "consecutive login failures",
                                }
                            )
                        last = t
                    else:
                        last = None
            if last is None:
                self._last.clear()
            else:
                self._last.update((float(last),))
            yield pd.DataFrame(out, columns=["user_id", "first_fail", "last_fail", "msg"])

        def close(self) -> None:
            pass

    pre = ensure_event_time(events, ts_col)
    if pre.isStreaming:
        pre = pre.withWatermark(ts_col, "3 seconds")
    return pre.groupBy(user_col).transformWithStateInPandas(
        LoginFailProcessor(),
        "user_id long, first_fail long, last_fail long, msg string",
        "append",
        "None",
    )


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
    ddl = int(deadline_s)
    kcol, tcol, ycol = key_col, ts_col, type_col
    cval, pval = str(create_value), str(pay_value)

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

        create_ts, pay_ts = state.get if state.exists else (float("nan"), float("nan"))
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values([tcol])
            for _, row in pdf.iterrows():
                t = row[tcol].timestamp()
                if row[ycol] == cval:
                    create_ts = t
                else:
                    pay_ts = t
                if not math.isnan(create_ts) and not math.isnan(pay_ts):
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
        if not math.isnan(create_ts) or not math.isnan(pay_ts):
            state.update((create_ts, pay_ts))
            # timer on whichever side arrived (PF registers one for the
            # pay-first case too, OrderTimeout_PF.scala:109-115)
            base = create_ts if not math.isnan(create_ts) else pay_ts
            state.setTimeoutTimestamp(int((base + ddl) * 1000))
        yield pd.DataFrame(out, columns=cols)

    orders = ensure_event_time(orders, ts_col)
    return orders.withWatermark(ts_col, "3 seconds").groupBy(key_col).applyInPandasWithState(
        fn,
        "order_id long, status string, create_ts long, pay_ts long",
        "create_ts double, pay_ts double",
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )


def uv_per_element_bloom(
    events: DataFrame,
    bits: int = 1 << 20,
    seed: int = 61,
    ts_col: str = "ts",
    user_col: str = "user_id",
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
    sd = int(seed)
    tcol, ucol = ts_col, user_col

    def fn(key, pdfs, state):
        import pandas as pd

        if state.exists:
            count, bloom = state.get
            bloom = bytearray(bloom)
        else:
            count, bloom = 0, bytearray(nbits >> 3)
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values([tcol, ucol])
            for _, row in pdf.iterrows():
                uid = str(int(row[ucol]))
                h = 0
                for ch in uid:  # reference Bloom.hash: Int wrap-around
                    h = (h * sd + ord(ch)) & 0xFFFFFFFF
                off = h & (nbits - 1)
                if not bloom[off >> 3] & (1 << (off & 7)):
                    bloom[off >> 3] |= 1 << (off & 7)
                    count += 1
                out.append(
                    {
                        "window_end": int(key[0]),
                        "user_id": int(row[ucol]),
                        "uv": int(count),
                    }
                )
        state.update((int(count), bytes(bloom)))
        yield pd.DataFrame(out, columns=["window_end", "user_id", "uv"])

    from pyspark.sql import functions as F

    keyed = events.withColumn(
        "window_end",
        ((F.floor(F.unix_timestamp(F.col(ts_col)) / 3600) + 1) * 3600).cast("long"),
    )
    return keyed.groupBy("window_end").applyInPandasWithState(
        fn,
        "window_end long, user_id long, uv long",
        "count long, bloom binary",
        "append",
        GroupStateTimeout.NoTimeout,
    )


def blacklist_filter(
    clicks: DataFrame,
    threshold: int = 100,
    user_col: str = "user_id",
    key_col: str = "ad_id",
    ts_col: str = "ts",
) -> DataFrame:
    """C5 streaming: per-(user, ad) click counter; one-time warning when
    the daily count crosses the threshold.

    Reference: market/z_FilterBlackListUser.scala:8-43 — ValueState
    count + ``isSentBlackList`` flag, processing-time midnight reset
    (:20-22). Here the day is part of the state (event-time day —
    deterministic, SURVEY §7.4.5); crossing emits exactly one warning.
    """
    cap = int(threshold)
    tcol = ts_col

    def fn(key, pdfs, state):
        import pandas as pd

        day, count, warned = state.get if state.exists else ("", 0, 0)
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values([tcol])
            for _, row in pdf.iterrows():
                d = row[tcol].strftime("%Y-%m-%d")
                if d != day:
                    day, count, warned = d, 0, 0
                count += 1
                if count > cap and not warned:
                    warned = 1
                    out.append(
                        {
                            "user_id": int(key[0]),
                            "ad_id": int(key[1]),
                            "day": day,
                            "click_count": int(count),
                            "msg": f"WARNING: click count over {cap} today",
                        }
                    )
        state.update((day, count, warned))
        yield pd.DataFrame(out, columns=["user_id", "ad_id", "day", "click_count", "msg"])

    return clicks.groupBy(user_col, key_col).applyInPandasWithState(
        fn,
        "user_id long, ad_id long, day string, click_count long, msg string",
        "day string, count long, warned long",
        "append",
        GroupStateTimeout.NoTimeout,
    )
