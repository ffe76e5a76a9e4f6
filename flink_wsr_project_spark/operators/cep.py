"""Generic CEP pattern matching — the FlinkCEP surface (SURVEY §2.6)
as a small Pattern API compiled to window-function / join plans.

Reference API (loginmonitor/LoginFail_CEP.scala:31-46,
orderpay_detect/OrderTimeout_CEP.scala:35-57):

    Pattern.begin("first").where(pred)
           .next("second").where(pred)        // strict contiguity
           .followedBy("third").where(pred)   // relaxed contiguity
           .within(Time.seconds(n))

Here:

    p = (Pattern.begin("first", F.col("event_type") == "error")
                .next("second", F.col("event_type") == "error")
                .within(2))
    matches = match_pattern(events, ["user_id"], "ts", p)

Semantics (documented subset of FlinkCEP):

* **strict chains** (``begin`` + only ``next`` steps): every run of
  adjacent rows matching the step predicates is a match — identical to
  FlinkCEP's strict contiguity emitting all matches. Compiled to one
  shuffle per key + a lag() chain over pre-evaluated step-match
  booleans (single window pass, no joins, no state).
* **chains containing ``followedBy``**: first-match-per-key semantics
  (FlinkCEP's AFTER MATCH SKIP PAST LAST with earliest events): step k
  binds to the earliest row matching its predicate strictly after step
  k-1's row. Compiled to per-step min-ts aggregates joined on the key
  — each step is one co-partitioned aggregate, the funnel plan shape.
* ``within(s)``: total span (last step ts − first step ts) ≤ s,
  applied to the bound events in both modes.

Scale: both compilations shuffle only on the key columns; the strict
path is a single window pass, the relaxed path is (steps) aggregates
reusing one partitioning. No state exists outside the shuffle.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Window as W, functions as F

from flink_wsr_project_spark.operators.windows import ensure_event_time


@dataclass
class _Step:
    name: str
    predicate: Column
    contiguity: str  # "begin" | "next" | "followedBy"


@dataclass
class Pattern:
    steps: list[_Step] = field(default_factory=list)
    within_s: int | None = None

    @staticmethod
    def begin(name: str, predicate: Column) -> "Pattern":
        return Pattern(steps=[_Step(name, predicate, "begin")])

    def next(self, name: str, predicate: Column) -> "Pattern":
        """Strict contiguity: the immediately following row."""
        return Pattern(self.steps + [_Step(name, predicate, "next")], self.within_s)

    def followedBy(self, name: str, predicate: Column) -> "Pattern":
        """Relaxed contiguity: any later row (earliest binds)."""
        return Pattern(self.steps + [_Step(name, predicate, "followedBy")], self.within_s)

    def within(self, seconds: int) -> "Pattern":
        return Pattern(self.steps, int(seconds))

    @property
    def is_strict(self) -> bool:
        return all(s.contiguity in ("begin", "next") for s in self.steps)


def match_pattern(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    pattern: Pattern,
    tiebreakers: list[str] | None = None,
) -> DataFrame:
    """Match ``pattern`` per key; returns one row per match with
    ``<step>_ts`` epoch-second columns for every step."""
    steps = pattern.steps
    if not steps or steps[0].contiguity != "begin":
        raise ValueError("pattern must start with Pattern.begin(...)")
    df = ensure_event_time(df, ts_col)
    ts_s = F.col(ts_col).cast("timestamp").cast("long")
    if pattern.is_strict:
        return _match_strict(df, key_cols, ts_col, ts_s, pattern, tiebreakers or [])
    return _match_relaxed(df, key_cols, ts_s, pattern)


def _match_strict(df, key_cols, ts_col, ts_s, pattern, tiebreakers) -> DataFrame:
    """All k-length adjacent runs via a lag chain over pre-evaluated
    step-match booleans (one window pass)."""
    steps = pattern.steps
    k = len(steps)
    w = W.partitionBy(*key_cols).orderBy(ts_col, *tiebreakers)
    cur = df.withColumn("_ts_s", ts_s)
    for i, s in enumerate(steps):
        cur = cur.withColumn(f"_m{i}", s.predicate)
    # the current row holds the LAST step; lag(j) reaches step k-1-j
    cond = F.col(f"_m{k - 1}")
    for j in range(1, k):
        cur = cur.withColumn(f"_lag_ts_{j}", F.lag("_ts_s", j).over(w))
        cur = cur.withColumn(f"_lag_m_{j}", F.lag(f"_m{k - 1 - j}", j).over(w))
        cond = cond & F.col(f"_lag_m_{j}") & F.col(f"_lag_ts_{j}").isNotNull()
    if pattern.within_s is not None and k > 1:
        cond = cond & (F.col("_ts_s") - F.col(f"_lag_ts_{k - 1}") <= pattern.within_s)
    out = cur.filter(cond)
    sel = list(key_cols)
    for i, s in enumerate(steps):
        j = k - 1 - i
        src = "_ts_s" if j == 0 else f"_lag_ts_{j}"
        sel.append(F.col(src).alias(f"{s.name}_ts"))
    return out.select(*sel)


def _match_relaxed(df, key_cols, ts_s, pattern) -> DataFrame:
    """First-match-per-key: per-step earliest-after aggregates."""
    steps = pattern.steps
    base = df.withColumn("_ts_s", ts_s)
    bound = (
        base.filter(steps[0].predicate)
        .groupBy(*key_cols)
        .agg(F.min("_ts_s").alias(f"{steps[0].name}_ts"))
    )
    prev_col = f"{steps[0].name}_ts"
    for s in steps[1:]:
        nxt = (
            base.filter(s.predicate)
            .join(bound.select(*key_cols, prev_col), key_cols)
            .filter(F.col("_ts_s") > F.col(prev_col))
            .groupBy(*key_cols)
            .agg(F.min("_ts_s").alias(f"{s.name}_ts"))
        )
        bound = bound.join(nxt, key_cols)
        prev_col = f"{s.name}_ts"
    if pattern.within_s is not None:
        bound = bound.filter(
            F.col(f"{steps[-1].name}_ts") - F.col(f"{steps[0].name}_ts")
            <= pattern.within_s
        )
    return bound


def match_pattern_stream(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str,
    pattern: Pattern,
    watermark: str = "3 seconds",
) -> DataFrame:
    """Streaming executor for STRICT patterns (begin + next chains):
    per-key state is the trailing k-1 rows' (ts, step-match flags) —
    O(pattern length) per key, never a growing buffer. Adjacency is
    preserved across micro-batches (the reference's CEP NFA state,
    reduced to the strict-chain case it actually uses); rows arriving
    in a later batch but OLDER than already-processed state are
    dropped as late (see :func:`build_strict_match_fn` for the
    policy), never spliced out of order.

    Relaxed (followedBy) patterns are batch-only here; their streaming
    form belongs to a per-key state machine like
    streaming.stateful.order_timeout_monitor.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    steps = pattern.steps
    if not steps or steps[0].contiguity != "begin":
        raise ValueError("pattern must start with Pattern.begin(...)")
    if not pattern.is_strict:
        raise ValueError("match_pattern_stream supports strict (next) chains only")
    k = len(steps)
    within = pattern.within_s
    names = [s.name for s in steps]

    # Normalize event time ONCE, before the batch/stream branch — the
    # _ts_s epoch extraction below is NTZ/TZ-sensitive, so both branches
    # (not just the streaming one) must see a normalized LTZ column.
    pre = ensure_event_time(stream, ts_col)
    pre = pre.withColumn("_ts_s", F.col(ts_col).cast("timestamp").cast("long"))
    for i, s in enumerate(steps):
        pre = pre.withColumn(f"_m{i}", s.predicate.cast("integer"))

    # Key columns keep their INPUT types (a long user_id stays long —
    # stringifying keys would silently force casts on downstream joins).
    key_types = {f.name: f.dataType.simpleString() for f in stream.schema.fields}
    out_schema = (
        ", ".join(f"{c} {key_types[c]}" for c in key_cols)
        + ", "
        + ", ".join(f"{n}_ts long" for n in names)
    )
    # state: flattened trailing window [(ts, m0..mk-1) * (k-1)] as a json string
    state_schema = "buf string"
    fn = build_strict_match_fn(k, within, list(key_cols), names)

    keyed = pre.withWatermark(ts_col, watermark) if stream.isStreaming else pre
    return keyed.groupBy(*key_cols).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def build_strict_match_fn(k: int, within, key_cols: list[str], names: list[str]):
    """Fold for :func:`match_pattern_stream`, exposed at module level so
    the property suite can drive it directly with a fake state object
    (input frames carry precomputed ``_ts_s`` and ``_m{i}`` columns).
    The returned ``fn`` is a closure over primitives — cloudpickle
    serializes it by value exactly as when it was defined inline.

    Late-arrival policy (processing is EAGER — matches emit in the
    batch their trigger row arrives): rows already folded into earlier
    batches are final, so a new row OLDER than the carried buffer's
    last event time cannot be inserted into the already-processed order
    — it is DROPPED, exactly like Flink CEP drops late events beyond
    the watermark (the alternative — appending it after newer rows —
    would emit time-reversed "adjacent" pairs). The trade-off vs
    Flink's watermark-hold ordering: Flink buffers rows until the
    watermark passes and would still match a row late by less than the
    watermark delay; eager processing trades that narrow window for
    immediate emission (Structured Streaming offers no end-of-input
    watermark flush, so holding would strand every trailing match).
    Within one micro-batch, out-of-order rows are fully handled by the
    batch-wide sort."""

    def fn(key, pdfs, state):
        import json

        import numpy as np
        import pandas as pd

        buf = json.loads(state.get[0]) if state.exists else []
        cols = list(key_cols) + [f"{n}_ts" for n in names]
        chunks = list(pdfs)
        if not chunks:
            state.update((json.dumps(buf),))
            yield pd.DataFrame([], columns=cols)
            return
        # One micro-batch-wide event-time sort (stable), then a fully
        # vectorized rolling-window match: valid[j] requires row j-(k-1-i)
        # to satisfy step i for every i, i.e. an AND of k shifted
        # step-match columns — no per-row Python loop.
        pdf = pd.concat(chunks, ignore_index=True).sort_values("_ts_s", kind="mergesort")
        if buf:
            # drop rows that sort BEFORE already-processed state (see
            # late-arrival policy above); buf is ts-ascending, so the
            # frontier is its last entry
            pdf = pdf[pdf["_ts_s"].to_numpy(np.int64) >= buf[-1][0]]
            if not len(pdf):
                state.update((json.dumps(buf),))
                yield pd.DataFrame([], columns=cols)
                return
        n_buf = len(buf)
        ts = np.concatenate(
            [np.array([b[0] for b in buf], dtype=np.int64), pdf["_ts_s"].to_numpy(np.int64)]
        )
        n = len(ts)
        m = np.zeros((n, k), dtype=bool)
        for i in range(k):
            if n_buf:
                m[:n_buf, i] = [bool(b[1 + i]) for b in buf]
            m[n_buf:, i] = pdf[f"_m{i}"].to_numpy() == 1
        valid = np.ones(n, dtype=bool)
        for i in range(k):
            shift = k - 1 - i
            col = m[:, i]
            if shift:
                # pad is clamped to n: a batch (plus carried buffer) can
                # hold FEWER than k-1 rows, where col[:-shift] alone
                # would over-pad and break the AND's shape
                col = np.concatenate(
                    [np.zeros(min(shift, n), dtype=bool), col[: max(0, n - shift)]]
                )
            valid &= col
        # current row must be NEW (buffered rows were consumed last batch)
        # and the window must be full (k rows available).
        valid &= np.arange(n) >= max(k - 1, n_buf)
        if within is not None and k > 1:
            first_ts = np.concatenate(
                [np.zeros(min(k - 1, n), dtype=np.int64), ts[: max(0, n - (k - 1))]]
            )
            valid &= (ts - first_ts) <= within
        idx = np.nonzero(valid)[0]
        data = {c: [key[i_c]] * len(idx) for i_c, c in enumerate(key_cols)}
        for i, nme in enumerate(names):
            data[f"{nme}_ts"] = ts[idx - (k - 1) + i]
        tail_lo = max(0, n - (k - 1)) if k > 1 else n
        buf = [[int(ts[t])] + [int(m[t, i]) for i in range(k)] for t in range(tail_lo, n)]
        state.update((json.dumps(buf),))
        yield pd.DataFrame(data, columns=cols)

    return fn
