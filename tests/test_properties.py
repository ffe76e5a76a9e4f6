"""Property-based tests: core operators vs brute-force Python models
on hypothesis-generated inputs (SURVEY §5 — strictly stronger than the
reference's print-and-eyeball validation).

Example counts are small (each example is a Spark job), but every run
explores fresh shapes: duplicate timestamps, empty groups, ties,
out-of-order arrival, boundary-exact gaps.
"""

from __future__ import annotations

from collections import Counter, defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from flink_wsr_project_spark.operators.topn import topn_per_group
from flink_wsr_project_spark.operators.windows import windowed_agg
from flink_wsr_project_spark.sources.readers import epoch_to_ts

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

# (user, ts) event rows; ts in a 2-hour span so sliding windows overlap
_events = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 7200)),
    min_size=1,
    max_size=120,
)


@given(rows=_events)
@settings(**_SETTINGS)
def test_sliding_window_count_matches_model(spark, rows):
    """groupBy(window(1h, 5m), key).count() == per-(window,key) brute count."""
    df = spark.createDataFrame(rows, ["uid", "ts_epoch"]).withColumn(
        "ts", epoch_to_ts("ts_epoch")
    )
    got = {
        (r.window_end, r.uid): r.cnt
        for r in windowed_agg(
            df, "ts", "1 hour", "5 minutes", keys=["uid"],
            aggs=[F.count("*").alias("cnt")],
        ).collect()
    }
    model: Counter = Counter()
    for uid, ts in rows:
        # windows [start, start+3600) with start multiple of 300 containing ts
        first_start = (ts // 300) * 300 - 3600 + 300
        for start in range(first_start, ts + 1, 300):
            if start <= ts < start + 3600:
                model[(start + 3600, uid)] += 1
    assert got == dict(model)


@given(rows=_events)
@settings(**_SETTINGS)
def test_tumbling_distinct_matches_model(spark, rows):
    df = spark.createDataFrame(rows, ["uid", "ts_epoch"]).withColumn(
        "ts", epoch_to_ts("ts_epoch")
    )
    got = {
        r.window_end: r.uv
        for r in windowed_agg(
            df, "ts", "1 hour", aggs=[F.countDistinct("uid").alias("uv")]
        ).collect()
    }
    model: defaultdict[int, set] = defaultdict(set)
    for uid, ts in rows:
        model[(ts // 3600) * 3600 + 3600].add(uid)
    assert got == {we: len(s) for we, s in model.items()}


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50), st.integers(0, 9)),
        min_size=1,
        max_size=80,
    ),
    n=st.integers(1, 4),
)
@settings(**_SETTINGS)
def test_topn_matches_model(spark, rows, n):
    """row_number top-N with tie-breaker == python sort top-N."""
    df = spark.createDataFrame(rows, ["grp", "cnt", "tie"]).dropDuplicates(
        ["grp", "tie"]
    )
    data = [(r.grp, r.cnt, r.tie) for r in df.collect()]
    got = {
        (r.grp, r.rank): (r.cnt, r.tie)
        for r in topn_per_group(df, ["grp"], "cnt", n, tiebreakers=["tie"]).collect()
    }
    model = {}
    by_grp: defaultdict[int, list] = defaultdict(list)
    for grp, cnt, tie in data:
        by_grp[grp].append((cnt, tie))
    for grp, items in by_grp.items():
        for rank, (cnt, tie) in enumerate(
            sorted(items, key=lambda x: (-x[0], x[1]))[:n], start=1
        ):
            model[(grp, rank)] = (cnt, tie)
    assert got == model


@given(
    pays=st.lists(st.tuples(st.integers(0, 5), st.integers(0, 60)), max_size=30),
    receipts=st.lists(st.tuples(st.integers(0, 5), st.integers(0, 60)), max_size=30),
)
@settings(**_SETTINGS)
def test_interval_join_matches_model(spark, pays, receipts):
    """Batch interval join == nested-loop model over [ts-3, ts+5]."""
    from flink_wsr_project_spark.streaming.joins import interval_join

    if not pays or not receipts:
        return
    lp = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(pays)], ["key", "lts_epoch", "lid"]
    ).withColumn("lts", epoch_to_ts("lts_epoch"))
    rp = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(receipts)], ["key", "rts_epoch", "rid"]
    ).withColumn("rts", epoch_to_ts("rts_epoch"))
    out = interval_join(lp, rp, "key", "lts", "rts", lower_s=-3, upper_s=5)
    got = {(r.lid, r.rid) for r in out.select(F.col("l.lid"), F.col("r.rid")).collect()}
    model = {
        (i, j)
        for i, (lk, lt) in enumerate(pays)
        for j, (rk, rt) in enumerate(receipts)
        if lk == rk and lt - 3 <= rt <= lt + 5
    }
    assert got == model


@given(
    logins=st.lists(
        st.tuples(st.integers(0, 2), st.booleans(), st.integers(0, 30)),
        min_size=1,
        max_size=40,
        unique_by=lambda x: (x[0], x[2]),
    )
)
@settings(**_SETTINGS)
def test_login_fail_lag_matches_model(spark, logins, tmp_path_factory):
    """Consecutive-fail detection == python scan over per-user timeline."""
    from flink_wsr_project_spark import jobs

    d = tmp_path_factory.mktemp("prop_login")
    lines = [
        f"{uid},ip{uid},{'fail' if is_fail else 'success'},{ts}"
        for uid, is_fail, ts in logins
    ]
    (d / "LoginLog.csv").write_text("\n".join(lines))
    got = {
        (r.user_id, r.first_fail_ts, r.last_fail_ts)
        for r in jobs.login_fail_warnings(spark, str(d / "LoginLog.csv")).collect()
    }
    timelines: defaultdict[int, list] = defaultdict(list)
    for uid, is_fail, ts in logins:
        timelines[uid].append((ts, "fail" if is_fail else "success"))
    model = set()
    for uid, tl in timelines.items():
        tl.sort()
        for (t1, e1), (t2, e2) in zip(tl, tl[1:]):
            if e1 == e2 == "fail" and t2 - t1 <= 2:
                model.add((uid, t1, t2))
    assert got == model


def test_operators_on_empty_input(spark):
    """Zero-row inputs flow through the operator kit without errors."""
    import pyspark.sql.types as T

    schema = T.StructType(
        [
            T.StructField("uid", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("cnt", T.LongType()),
        ]
    )
    empty = spark.createDataFrame([], schema)
    assert (
        windowed_agg(empty, "ts", "1 hour", "5 minutes", keys=["uid"],
                     aggs=[F.count("*").alias("cnt")]).count() == 0
    )
    assert topn_per_group(empty, ["uid"], "cnt", 3).count() == 0
    from flink_wsr_project_spark.streaming.joins import reconcile_full_outer

    assert (
        reconcile_full_outer(empty, empty, "uid", "ts", "ts", tolerance_s=5).count() == 0
    )


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 2), st.sampled_from(["a", "b"]), st.integers(0, 40)),
        min_size=1,
        max_size=50,
        unique_by=lambda x: (x[0], x[2]),
    )
)
@settings(**_SETTINGS)
def test_cep_strict_matches_model(spark, rows):
    """Strict 2-step pattern == python adjacency scan (all matches)."""
    from flink_wsr_project_spark.operators.cep import Pattern, match_pattern

    df = spark.createDataFrame(rows, ["uid", "ev", "t"]).withColumn(
        "ts", epoch_to_ts("t")
    )
    p = (
        Pattern.begin("first", F.col("ev") == "a")
        .next("second", F.col("ev") == "a")
        .within(3)
    )
    got = {
        (r.uid, r.first_ts, r.second_ts)
        for r in match_pattern(df, ["uid"], "ts", p).collect()
    }
    timelines: defaultdict[int, list] = defaultdict(list)
    for uid, ev, t in rows:
        timelines[uid].append((t, ev))
    model = set()
    for uid, tl in timelines.items():
        tl.sort()
        for (t1, e1), (t2, e2) in zip(tl, tl[1:]):
            if e1 == e2 == "a" and t2 - t1 <= 3:
                model.add((uid, t1, t2))
    assert got == model


def test_quality_enforce_split(spark):
    """enforce() partitions rows exactly; quarantine carries reasons."""
    from flink_wsr_project_spark.operators.quality import enforce, in_range, not_null

    df = spark.createDataFrame(
        [(1, 5.0), (2, -1.0), (None, 5.0), (None, -2.0)], ["uid", "v"]
    )
    passing, quarantined = enforce(
        df, {"uid_not_null": not_null("uid"), "v_range": in_range("v", 0, 10)}
    )
    assert passing.count() == 1
    q = {tuple(r.violated_rules) for r in quarantined.collect()}
    assert q == {("v_range",), ("uid_not_null",), ("uid_not_null", "v_range")}
    assert passing.count() + quarantined.count() == df.count()


def test_quality_null_rule_result_is_violation(spark):
    """A rule evaluating to NULL (e.g. in_range over a NULL value) must
    count as a violation and quarantine the row — fail-closed, matching
    the oracle's CASE WHEN ok THEN 0 ELSE 1 semantics. (Regression:
    sum((~ok).cast('long')) silently dropped NULL rows.)"""
    from flink_wsr_project_spark.operators.quality import (
        enforce,
        in_range,
        not_null,
        quality_report,
    )

    df = spark.createDataFrame(
        [(1, 5.0), (2, None), (3, 99.0)], ["uid", "v"]
    )
    checks = {"uid_not_null": not_null("uid"), "v_range": in_range("v", 0, 10)}
    report = {r.rule: r for r in quality_report(df, checks).collect()}
    # NULL v: in_range -> NULL, counted as a violation alongside 99.0
    assert report["v_range"].violations == 2
    assert report["v_range"].rows_checked == 3
    assert abs(report["v_range"].pass_rate - 1 / 3) < 1e-12
    assert report["uid_not_null"].violations == 0

    passing, quarantined = enforce(df, checks)
    assert passing.count() == 1  # only (1, 5.0)
    q = {(r.uid, tuple(r.violated_rules)) for r in quarantined.collect()}
    assert q == {(2, ("v_range",)), (3, ("v_range",))}


@given(
    texts=st.lists(
        st.text(alphabet="ab c", min_size=1, max_size=40),
        min_size=2,
        max_size=8,
    )
)
@settings(**_SETTINGS)
def test_ngram_jaccard_matches_python_model(spark, texts):
    """The shared shingle+Jaccard SQL (used by minhash-LSH verify and
    ngram_jaccard_pairs) == a pure-Python 3-gram set model — an
    independent third implementation breaking any DuckDB/Spark
    shared-assumption tie."""
    from flink_wsr_project_spark.operators.dedup import jaccard_expr, shingled_cte

    rows = [(i, t) for i, t in enumerate(texts)]
    spark.createDataFrame(rows, ["doc_id", "text"]).createOrReplaceTempView("documents")
    jac = jaccard_expr("a.sh", "b.sh", "spark")
    out = spark.sql(
        f"""
WITH {shingled_cte('spark')}
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, {jac} AS jaccard
FROM shingled a JOIN shingled b ON a.doc_id < b.doc_id
"""
    ).collect()

    import re

    def spark_toks(t: str) -> list:
        return re.split(r"\s+", t.strip())

    def model_shingles(t: str) -> set:
        toks = spark_toks(t)
        if len(toks) < 3:
            return {t.strip()}
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    for r in out:
        sa, sb = model_shingles(texts[r.doc_a]), model_shingles(texts[r.doc_b])
        inter = len(sa & sb)
        want = inter / (len(sa) + len(sb) - inter)
        assert abs(r.jaccard - want) < 1e-12, (texts[r.doc_a], texts[r.doc_b])


@given(rows=_events, spec=st.sampled_from([(3600, 300), (600, 60), (120, 40)]))
@settings(**_SETTINGS)
def test_two_stage_sliding_count_matches_one_pass(spark, rows, spec):
    """sliding_count_two_stage == windowed_agg for arbitrary event sets
    and several dur/slide shapes (alignment, boundary rows, empty
    buckets, duplicate timestamps)."""
    from flink_wsr_project_spark.operators.windows import sliding_count_two_stage

    dur_s, slide_s = spec
    df = spark.createDataFrame(rows, ["uid", "ts_epoch"]).withColumn(
        "ts", epoch_to_ts("ts_epoch")
    )
    one = {
        (r.window_end, r.uid): r.cnt
        for r in windowed_agg(
            df, "ts", f"{dur_s} seconds", f"{slide_s} seconds", keys=["uid"],
            aggs=[F.count("*").alias("cnt")],
        ).collect()
    }
    two = {
        (r.window_end, r.uid): r.cnt
        for r in sliding_count_two_stage(df, "ts", dur_s, slide_s, keys=["uid"]).collect()
    }
    assert one == two


def test_salted_join_equals_plain_join(spark):
    """Salt-invariance: salted_join returns exactly the plain join's
    rows (inner and left, incl. unmatched probe keys), and the
    physical plan is a sort-merge join keyed on (key, salt) — the
    skew-spreading structure, not a broadcast that would make the
    salt a no-op."""
    from flink_wsr_project_spark.operators.skew import salted_join

    probe = spark.createDataFrame(
        [(1, 10.0), (1, 11.0), (1, 12.0), (2, 20.0), (9, 90.0)], ["k", "v"]
    )
    build = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], ["k", "tag"])

    for how in ("inner", "left"):
        got = salted_join(probe, build, "k", n_salts=4, how=how)
        want = probe.join(build, "k", how)
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

    plan = salted_join(probe, build, "k", n_salts=4)._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan and "_salt" in plan
    assert "BroadcastHashJoin" not in plan


def test_banded_range_join_equals_naive(spark):
    """Bucketing invariance: banded_range_join returns exactly the
    naive range join's rows — including inclusive-boundary points
    (ts == start, ts == end), intervals spanning many buckets,
    bucket-straddling points, and unmatched points — and each
    (point, interval) pair appears ONCE (they can only meet in the
    point's bucket). The plan must be an equi-join: no nested-loop or
    cartesian node."""
    from flink_wsr_project_spark.operators.rangejoin import banded_range_join

    points = spark.createDataFrame(
        [(1, 100), (2, 150), (3, 199), (4, 200), (5, 201), (6, 999), (7, 350)],
        ["pid", "ts"],
    )
    intervals = spark.createDataFrame(
        [(10, 100, 200), (11, 150, 650), (12, 0, 50)], ["iid", "lo", "hi"]
    )
    got = banded_range_join(points, intervals, "ts", "lo", "hi", bucket_s=100)
    naive = points.join(
        intervals, (points.ts >= intervals.lo) & (points.ts <= intervals.hi)
    )
    want = sorted((r.pid, r.iid) for r in naive.collect())
    assert sorted((r.pid, r.iid) for r in got.collect()) == want
    assert (1, 10) in want and (4, 10) in want  # inclusive bounds
    assert (7, 11) in want                      # mid-interval, straddled bucket
    assert all(p != 6 for p, _ in want)         # unmatched point stays out

    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def _asof_pandas_oracle(lp, rp, direction, allow_exact, tol=None):
    """pandas.merge_asof as the independent oracle implementation."""
    import pandas as pd

    lp = lp.sort_values("ts").reset_index(drop=True)
    rp = rp.sort_values("rts").reset_index(drop=True)
    return pd.merge_asof(
        lp, rp, left_on="ts", right_on="rts", by="k",
        direction=direction, allow_exact_matches=allow_exact,
        tolerance=tol,
    )


def _asof_case(spark, direction, strict, tol_s):
    """asof_join vs pandas merge_asof on data with exact-boundary ties,
    multi-key interleaving, and unmatched left rows."""
    import pandas as pd

    from flink_wsr_project_spark.operators.asofjoin import asof_join

    rng = __import__("random").Random(42 + int(strict) + len(direction))
    lrows = [(k, rng.randrange(0, 1000)) for k in (1, 2, 3) for _ in range(40)]
    rrows = list({(k, rng.randrange(0, 1000)) for k in (1, 2) for _ in range(25)})
    # plant exact-boundary collisions so strict vs inclusive differ
    rrows += [(k, ts) for (k, ts) in lrows[:5]]
    rrows = sorted(set(rrows))
    left = spark.createDataFrame(lrows, ["k", "ts"])
    right = spark.createDataFrame(
        [(k, ts, ts * 10) for (k, ts) in rrows], ["k", "rts", "payload"]
    )
    got = (
        asof_join(left, right, on=["k"], left_ts="ts", right_ts="rts",
                  direction=direction, strict=strict, tolerance_s=tol_s,
                  matched_ts_alias="mts")
        .toPandas().sort_values(["k", "ts"]).reset_index(drop=True)
    )
    want = _asof_pandas_oracle(
        left.toPandas(), right.toPandas(), direction, not strict,
        tol=None if tol_s is None else tol_s,
    ).sort_values(["k", "ts"]).reset_index(drop=True)
    assert len(got) == len(left.toPandas()) == len(want)  # left semantics
    for g, w in zip(got.itertuples(), want.itertuples()):
        assert (g.k, g.ts) == (w.k, w.ts)
        gp = None if pd.isna(g.payload) else g.payload
        wp = None if pd.isna(w.payload) else w.payload
        assert gp == wp, f"{direction} strict={strict} tol={tol_s}: {g} vs {w}"
        gm = None if pd.isna(g.mts) else g.mts
        wm = None if pd.isna(w.rts) else w.rts
        assert gm == wm
    return got


def test_asof_join_backward_inclusive(spark):
    got = _asof_case(spark, "backward", strict=False, tol_s=None)
    assert {"k", "ts", "payload", "mts"} <= set(got.columns)


def test_asof_join_backward_strict_with_tolerance(spark):
    _asof_case(spark, "backward", strict=True, tol_s=100)


def test_asof_join_forward_inclusive(spark):
    _asof_case(spark, "forward", strict=False, tol_s=None)


def test_asof_join_forward_strict(spark):
    _asof_case(spark, "forward", strict=True, tol_s=50)


def test_asof_join_one_exchange_and_collision_guard(spark):
    """The plan shuffles ONCE (union + window — no join node at all);
    payload/left name collisions are rejected up front."""
    import pytest as _pytest

    from flink_wsr_project_spark.operators.asofjoin import asof_join

    left = spark.createDataFrame([(1, 10, "x")], ["k", "ts", "payload"])
    right = spark.createDataFrame([(1, 5, "y")], ["k", "rts", "payload"])
    with _pytest.raises(ValueError, match="collide"):
        asof_join(left, right, on=["k"], left_ts="ts", right_ts="rts")

    out = asof_join(left.drop("payload"), right, on=["k"], left_ts="ts", right_ts="rts")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1
    assert "Join" not in plan


def test_dedup_keep_first_two_forms_agree_and_plan_prunes(spark):
    """Window form == min_by aggregation form (ties broken identically)
    for both keep directions, and the window form's plan shows the
    map-side WindowGroupLimit(Partial) prune below a single exchange —
    the property that makes keyed dedup shuffle ~|keys| rows."""
    from flink_wsr_project_spark.operators.keepfirst import (
        dedup_keep_first,
        dedup_keep_first_agg,
    )

    rows = [(k, ts, i, f"p{i}") for i, (k, ts) in enumerate(
        [(1, 10), (1, 10), (1, 5), (2, 7), (2, 7), (3, 1)])]
    df = spark.createDataFrame(rows, ["k", "ts", "uid", "payload"])

    for keep in ("first", "last"):
        got = dedup_keep_first(df, ["k"], ["ts", "uid"], keep=keep)
        want = dedup_keep_first_agg(df, ["k"], ["ts", "uid"], keep=keep)
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
        assert got.count() == 3  # one row per key

    plan = dedup_keep_first(df, ["k"], ["ts", "uid"])._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan and "Partial" in plan
    assert plan.count("Exchange") == 1


def test_hll_rollup_merge_invariance(spark):
    """The scale property behind uv_daily_sketch_rollup: unioning
    hourly sketches gives BIT-EXACT the same estimate as sketching the
    day directly (DataSketches HLL union is lossless at equal lgK), and
    the estimate lands within the configured rsd of exact."""
    from flink_wsr_project_spark.sources.readers import load_table

    sf = "/root/testdata/sf0.001"
    events = load_table(spark, "events", sf).filter(F.col("event_type") == "view")
    day = F.date_format("ts", "yyyy-MM-dd").alias("day")
    via_hours = (
        events.groupBy(day, F.hour("ts").alias("h"))
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .groupBy("day")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
    )
    direct = events.groupBy(day).agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est")
    )
    exact = events.groupBy(day).agg(F.countDistinct("user_id").alias("uv"))
    a = {r.day: r.est for r in via_hours.collect()}
    b = {r.day: r.est for r in direct.collect()}
    x = {r.day: r.uv for r in exact.collect()}
    assert a == b  # merge-invariance, bit-exact
    for d, est in a.items():
        assert abs(est - x[d]) / max(x[d], 1) < 0.05


def test_pca_matches_numpy_recompute(spark):
    """Distributed integer-scaled Gram covariance == numpy's on the
    same scaled data (bit-exact — associativity is the point of the
    integer scaling), components match eigh up to the documented sign
    canonicalization, and the codegen'd zip_with projection agrees
    with the numpy projection to float tolerance. Partitioning
    invariance is exercised by repartitioning to 7 uneven tasks."""
    import numpy as np

    from flink_wsr_project_spark.operators.pca import (
        _SCALE,
        covariance,
        pca_components,
        pca_project,
    )
    from flink_wsr_project_spark.sources.readers import load_table

    emb = load_table(spark, "embeddings", "/root/testdata/sf0.001").repartition(7)
    rows = emb.select("vec_id", "embedding").collect()
    ids = [r.vec_id for r in rows]
    X = np.stack([r.embedding for r in rows])

    cov, mean, n = covariance(emb, "embedding", 64)
    Xi = np.floor(X * _SCALE + 0.5).astype(np.int64)  # half-up, mirrors gram_partials
    want_cov = (Xi.T @ Xi) / (len(X) * _SCALE**2) - np.outer(
        Xi.sum(0) / (len(X) * _SCALE), Xi.sum(0) / (len(X) * _SCALE)
    )
    assert n == len(X)
    assert np.array_equal(
        np.asarray(cov), want_cov
    ), "integer-scaled covariance must be bit-exact"

    comps, evs = pca_components(cov, 2)
    assert evs[0] >= evs[1] > 0
    assert all(comp[int(np.argmax(np.abs(comp)))] > 0 for comp in comps)
    for comp in comps:
        assert abs(np.linalg.norm(comp) - 1.0) < 1e-9

    got = {
        r.vec_id: (r.pc1, r.pc2)
        for r in pca_project(emb, "embedding", 64, k=2)
        .select("vec_id", "pc1", "pc2")
        .collect()
    }
    proj = (X - mean) @ comps.T
    for vid, p in zip(ids, proj):
        assert abs(got[vid][0] - p[0]) < 1e-9 and abs(got[vid][1] - p[1]) < 1e-9


def test_pca_power_iteration_agrees_with_eigh(spark):
    """The deterministic power-iteration components (the r15
    oracle-able path of embedding_pca_project) agree DIRECTIONALLY
    with numpy eigh's — |cos| ≈ 1 per component — and the iteration is
    partitioning-invariant (pure function of the exact integer
    moments). Exact equality is neither expected nor required: the
    iteration trades LAPACK precision for bit-reproducibility in SQL,
    and the external gate hashes the iteration against its own DuckDB
    unrolling."""
    import numpy as np

    from flink_wsr_project_spark.operators.pca import (
        covariance,
        integer_moments,
        pca_components,
        power_iteration_components,
    )
    from flink_wsr_project_spark.sources.readers import load_table

    emb = load_table(spark, "embeddings", "/root/testdata/sf0.001").repartition(7)
    colsum, gram, n = integer_moments(emb, "embedding", 64)
    comps_pi, mean_pi = power_iteration_components(colsum, gram, n, 64)

    cov, mean, _ = covariance(emb, "embedding", 64)
    comps_eigh, _ = pca_components(cov, 2)
    for pi, ref in zip(comps_pi, comps_eigh):
        cos = abs(float(np.dot(np.array(pi), ref)))
        assert cos > 0.999, f"power-iteration component drifted: |cos|={cos}"
    assert np.allclose(mean_pi, mean, atol=1e-12)
    # partitioning invariance: same moments (and thus same components)
    # from a different task layout
    colsum2, gram2, n2 = integer_moments(
        load_table(spark, "embeddings", "/root/testdata/sf0.001").repartition(3),
        "embedding",
        64,
    )
    assert (colsum2, gram2, n2) == (colsum, gram, n)


def test_cumulate_final_step_equals_tumble_and_grows(spark):
    """CUMULATE invariants at sf0.001: within each window_start the
    counts are nondecreasing in window_end (early firings accumulate),
    and the LAST step (window_start + max) equals the plain tumbling
    count of that hour."""
    from flink_wsr_project_spark.operators.windows import cumulate_count, windowed_agg
    from flink_wsr_project_spark.sources.readers import load_table

    from tests.conftest import SF_DIR

    events = load_table(spark, "events", SF_DIR).filter(F.col("event_type") == "view")
    cum = cumulate_count(events, "ts", max_s=3600, step_s=900)
    by_start: dict[int, list[tuple[int, int]]] = {}
    for r in cum.collect():
        by_start.setdefault(r.window_start, []).append((r.window_end, r.cnt))
    tumble = {
        r.window_end: r.cnt
        for r in windowed_agg(
            events, "ts", "1 hour", aggs=[F.count("*").alias("cnt")]
        ).collect()
    }
    assert by_start
    for start, steps in by_start.items():
        steps.sort()
        counts = [c for _, c in steps]
        assert counts == sorted(counts)  # nondecreasing growth
        last_end, last_cnt = steps[-1]
        assert last_end == start + 3600
        assert last_cnt == tumble[last_end]  # final firing == tumble


@given(
    docs=st.lists(
        st.lists(
            st.text(alphabet="abcdefg 0'%\\_", min_size=0, max_size=12),
            min_size=0,
            max_size=20,
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(max_examples=40, deadline=None)
def test_minhash_hashed_path_equals_per_permutation_md5(docs):
    """r9 pinned equivalence: ``minhash_from_hashed_expr`` over the
    once-hashed shingle array must equal the original ``minhash_expr``
    (md5 re-run inside every permutation fold) for every permutation,
    on arbitrary shingle strings including empties, quotes, percent
    and backslash. DuckDB evaluates both expression forms; the
    Spark<->DuckDB parity suite then carries the identity to Spark."""
    import duckdb

    from flink_wsr_project_spark.operators.dedup import (
        N_PERMS,
        h28,
        minhash_expr,
        minhash_from_hashed_expr,
    )

    con = duckdb.connect()
    con.execute(
        # empty lists bind as INTEGER[]; force VARCHAR[] explicitly
        "CREATE TABLE t AS SELECT doc_id, CAST(sh AS VARCHAR[]) AS sh FROM (VALUES "
        + ", ".join(f"({i}, ?)" for i in range(len(docs)))
        + ") v(doc_id, sh)",
        [list(d) for d in docs],
    )
    old_cols = ", ".join(
        f"{minhash_expr('sh', k, 'duckdb')} AS o{k}" for k in range(N_PERMS)
    )
    new_cols = ", ".join(
        f"{minhash_from_hashed_expr(k, 'duckdb')} AS n{k}" for k in range(N_PERMS)
    )
    rows = con.sql(
        f"WITH h AS (SELECT doc_id, sh, "
        f"list_transform(sh, s -> {h28('s', 'duckdb')}) AS hv FROM t) "
        f"SELECT {old_cols}, {new_cols} FROM h ORDER BY doc_id"
    ).fetchall()
    from flink_wsr_project_spark.operators.dedup import N_PERMS as P

    for row in rows:
        assert row[:P] == row[P:]


_doc_texts = st.lists(
    st.text(
        alphabet=st.sampled_from("ab çé☃ xyz"),  # multi-byte + spaces
        min_size=0,
        max_size=60,
    ),
    min_size=1,
    max_size=12,
)


@given(texts=_doc_texts)
@settings(max_examples=40, deadline=None)
def test_signature_inrow_form_equals_batch_form_and_python_model(texts):
    """r16 pinned equivalence for the polynomial signature scheme: the
    STREAMING in-row form (``shingle_hash_array_expr`` + the 16
    ``minhash_from_hashed_expr`` folds + ``band_hash_expr``) must
    produce the exact band values of the BATCH form (``signature_sql``
    — explode + min aggregation), and both must match an independent
    pure-Python model of the token-code Horner chain — on
    hypothesis-generated unicode including empty/whitespace-only texts
    (the whole-text fallback) and sub-3-token docs. DuckDB evaluates
    both SQL forms; the Spark<->DuckDB parity suite carries the
    identity to Spark (and the plan tests pin the Spark batch shape)."""
    import hashlib
    import re

    import duckdb

    from flink_wsr_project_spark.operators.dedup import (
        BAND_SIZE,
        N_BANDS,
        N_PERMS,
        PERMS,
        MINHASH_P,
        SIG_CHAIN_B,
        SIG_CHAIN_M,
        band_hash_expr,
        minhash_from_hashed_expr,
        shingle_hash_array_expr,
        signature_sql,
        toks_expr,
    )

    def code(tok: str) -> int:
        return int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:15], 16)

    def model_bands(text: str) -> tuple[str, ...]:
        toks = re.split(r"\s+", text.strip())
        if len(toks) < 3:
            shs = [code(text.strip()) % SIG_CHAIN_M]
        else:
            shs = []
            for i in range(len(toks) - 2):
                h = code(toks[i]) % SIG_CHAIN_M
                for j in (1, 2):
                    h = (h * SIG_CHAIN_B + code(toks[i + j])) % SIG_CHAIN_M
                shs.append(h)
        mh = [min((a * h + b) % MINHASH_P for h in shs) for a, b in PERMS]
        return tuple(
            hashlib.md5(
                "_".join(
                    str(mh[b * BAND_SIZE + j]) for j in range(BAND_SIZE)
                ).encode()
            ).hexdigest()
            for b in range(N_BANDS)
        )

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, ?)" for i in range(len(texts)))
        + ") v(doc_id, text)",
        list(texts),
    )
    batch = {
        r[0]: tuple(r[1:])
        for r in con.execute(signature_sql("duckdb")).fetchall()
    }
    mh_cols = ", ".join(
        f"{minhash_from_hashed_expr(k, 'duckdb')} AS mh{k}" for k in range(N_PERMS)
    )
    bands = ", ".join(
        band_hash_expr([f"mh{b * BAND_SIZE + j}" for j in range(BAND_SIZE)], "duckdb")
        + f" AS band{b}"
        for b in range(N_BANDS)
    )
    inrow = {
        r[0]: tuple(r[1:])
        for r in con.execute(
            f"WITH tk AS (SELECT doc_id, trim(text) AS txt, "
            f"{toks_expr('text', 'duckdb')} AS t FROM documents),\n"
            f"h AS (SELECT doc_id, "
            f"{shingle_hash_array_expr('t', 'txt', 'duckdb')} AS hv FROM tk),\n"
            f"m AS (SELECT doc_id, {mh_cols} FROM h)\n"
            f"SELECT doc_id, {bands} FROM m"
        ).fetchall()
    }
    assert batch == inrow
    for i, t in enumerate(texts):
        assert batch[i] == model_bands(t), (i, t)


@given(texts=_doc_texts)
@settings(**_SETTINGS)
def test_quality_classifier_matches_python_model(spark, texts):
    """quality_classifier_score vs a pure-Python reference: identical
    tokenization (whitespace split of the trimmed text), identical
    28-bit md5-prefix hash, identical LCG weights and integer
    truncating division — an oracle INDEPENDENT of both SQL engines,
    on hypothesis-generated unicode (multi-byte chars exercise the
    md5-of-UTF8 path; empty/whitespace-only texts the single-empty-
    token edge)."""
    import hashlib
    import re

    from flink_wsr_project_spark.plans.pipeline_queries import (
        _QCLS_A,
        _QCLS_C,
        _QCLS_DIMS,
        _QCLS_M,
        quality_classifier_score,
    )

    rows = [(i, t) for i, t in enumerate(texts)]

    def model(text):
        toks = re.split(r"\s+", text.strip())  # split('') -> [''] like both engines
        score = 0
        for tok in toks:
            h = int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:7], 16)
            dim = h % _QCLS_DIMS
            score += ((_QCLS_A * dim + _QCLS_C) % _QCLS_M) - _QCLS_M // 2
        n = len(toks)
        # truncation toward zero, exactly as Spark `div` / DuckDB `//`
        q = abs(score * 1000) // n
        milli = q if score >= 0 else -q
        return n, milli, "keep" if milli >= 0 else "drop"

    import pandas as pd

    d = pd.DataFrame(rows, columns=["doc_id", "text"])
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        d.to_parquet(f"{td}/documents.parquet", index=False)
        out = {
            r.doc_id: (r.n_tok, r.score_milli, r.label)
            for r in quality_classifier_score(spark, td).collect()
        }
    for i, t in rows:
        assert out[i] == model(t), f"doc {i}: {out[i]} != {model(t)} for {t!r}"


def test_bpe_batch_compatibility_properties():
    """Property pin for the batched-BPE compatibility rule
    (hypothesis): for ANY candidate list, the selected batch (a) never
    exceeds k, (b) preserves candidate order, (c) has pairwise
    DISJOINT {lhs, rhs, merged} symbol sets — the invariant that makes
    the one-pass fold equal sequential application — and (d) always
    includes the first candidate (progress guarantee)."""
    from hypothesis import given, settings, strategies as st

    from flink_wsr_project_spark.operators.bpe import _select_compatible

    sym = st.text(alphabet="abcd_", min_size=1, max_size=3)
    cand = st.tuples(sym, sym, st.integers(min_value=1, max_value=100))

    @settings(max_examples=200, deadline=None)
    @given(st.lists(cand, max_size=30), st.integers(min_value=1, max_value=8))
    def check(cands, k):
        out = _select_compatible(cands, k)
        assert len(out) <= k
        # order preserved
        idx = [cands.index(c) for c in out]
        assert idx == sorted(idx)
        # pairwise symbol-disjointness incl. merged outputs
        seen: set[str] = set()
        for lhs, rhs, _ in out:
            symbols = {lhs, rhs, lhs + rhs}
            assert not (symbols & seen)
            seen |= symbols
        # progress: the leader is always taken
        if cands:
            assert out and out[0] == cands[0]

    check()
