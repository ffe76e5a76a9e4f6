"""Synthetic-parity tests: crafted inputs that exercise query branches
the GENERATED testdata never reaches.

The external gate (and the sf0.001/sf0.01 parity suite) can only prove
branches the data takes — at sf0.01 `late_data_classify` emits nothing
but 'on_time' because the generator's arrival order tracks event time,
so the lateness trichotomy (the whole point of the L2/L3 reproduction)
was externally green yet untested. These tests write a small parquet
table with deliberately out-of-order arrivals into a tmp dir and run
the SAME registry query + DuckDB oracle over it, pinning every class
and both CASE boundaries on both engines.
"""

from __future__ import annotations

import pandas as pd
import pytest

from flink_wsr_project_spark.plans.registry import get
from tests.parity import assert_parity


def _write_events(tmp_path, rows):
    """rows: (event_id, epoch_s, user_id, event_type, value, props)."""
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"], unit="s").astype("datetime64[us]")
    d = tmp_path / "synth_sf"
    d.mkdir(exist_ok=True)
    pdf.to_parquet(d / "events.parquet", index=False)
    return str(d)


def test_late_data_classify_all_three_classes(spark, tmp_path):
    """Arrival order = event_id; watermark source = running max ts.
    Crafted arrivals hit every class AND both CASE boundaries exactly:

      e1 t=1000  max=1000  on_time (first row)
      e2 t=2000  max=2000  on_time (advances the watermark)
      e3 t=1940  max=2000  on_time          — boundary: t == max-60
      e4 t=1935  max=2000  late_within_lateness (max-120 <= t < max-60)
      e5 t=1880  max=2000  late_within_lateness — boundary: t == max-120
      e6 t=1850  max=2000  too_late_side_output (t < max-120)
    """
    rows = [
        (1, 1000, 10, "view", 1.0, "{}"),
        (2, 2000, 11, "view", 1.0, "{}"),
        (3, 1940, 12, "view", 1.0, "{}"),
        (4, 1935, 13, "view", 1.0, "{}"),
        (5, 1880, 14, "view", 1.0, "{}"),
        (6, 1850, 15, "view", 1.0, "{}"),
    ]
    sf_dir = _write_events(tmp_path, rows)
    q = get("late_data_classify")
    df = q.spark_fn(spark, sf_dir)

    got = {r.event_id: r.lateness for r in df.collect()}
    assert got == {
        1: "on_time",
        2: "on_time",
        3: "on_time",
        4: "late_within_lateness",
        5: "late_within_lateness",
        6: "too_late_side_output",
    }
    # and the oracle agrees on the same crafted input, row for row
    assert_parity(q.spark_fn(spark, sf_dir), q.oracle, sf_dir, "late_data_classify/synth")


def _write_documents(tmp_path, rows):
    """rows: (doc_id, text, lang, source, n_chars)."""
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source", "n_chars"])
    d = tmp_path / "synth_docs_sf"
    d.mkdir(exist_ok=True)
    pdf.to_parquet(d / "documents.parquet", index=False)
    return str(d)


def test_lang_id_every_language_and_tie_order(spark, tmp_path):
    """The generated corpus is English-text-only, so lang_id predicts
    'en' for all 500 docs at every SF — the es/de/fr argmax branches
    and the fixed tie order (en > es > de > fr) never execute. Crafted
    marker-word docs pin every branch on both engines:

      1 pure-en  2 pure-es  3 pure-de  4 pure-fr
      5 'de' alone — a word in es's marker list, not de's → es
      6 en/es tie → en (priority)   7 es/de tie → es   8 de/fr tie → de
      9 zero markers → all scores 0 → en (tie chain)
    """
    rows = [
        (1, "the a of and is", "en", "s", 15),
        (2, "el la de que los", "es", "s", 16),
        (3, "der die und das ist", "de", "s", 19),
        (4, "le les et une est", "fr", "s", 17),
        (5, "de", "de", "s", 2),
        (6, "a el", "en", "s", 4),
        (7, "el der", "es", "s", 6),
        (8, "der le", "de", "s", 6),
        (9, "xyz qwerty", "zh", "s", 10),
    ]
    sf_dir = _write_documents(tmp_path, rows)
    q = get("lang_id")
    got = {r.doc_id: r.predicted_lang for r in q.spark_fn(spark, sf_dir).collect()}
    assert got == {
        1: "en", 2: "es", 3: "de", 4: "fr",
        5: "es", 6: "en", 7: "es", 8: "de", 9: "en",
    }
    assert_parity(q.spark_fn(spark, sf_dir), q.oracle, sf_dir, "lang_id/synth")


def test_curation_funnel_every_stage(spark, tmp_path):
    """At sf0.01 the generated corpus has zero exact-dup groups and
    zero quality failures, so the funnel's 'quality' and 'exact_dup'
    stages never fire (only near_dup/contaminated/kept appear). A
    crafted corpus drives all five first-dropping stages:

      doc 2  3 tokens                     → quality
      docs 3=4 identical text            → 4 exact_dup, 3 kept
      docs 5≈7 differ in the last token  → 7 near_dup (J≈0.89, LSH pair)
      docs 8/19 share an 8-token run; 8 is train-split, 19 test-split
        (split = md5('split:'||id) hash)  → 8 contaminated, 19 kept
      doc 9  unique                       → kept
    """
    w = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
        "kilo lima mike november oscar papa quebec romeo sierra tango"
    ).split()
    shared8 = "uniform victor whiskey xray yankee zulu amber birch"
    docs = [
        (2, "tiny doc here", "s1"),
        (3, " ".join(w[:12]), "s1"),
        (4, " ".join(w[:12]), "s1"),
        (5, " ".join(w), "s2"),
        (7, " ".join(w[:19]) + " zebra", "s2"),
        (8, shared8 + " cedar dunes ember frost grove haven", "s3"),
        (19, shared8 + " ivory jasper karma lotus maple noble", "s3"),
        (9, "quartz raven slate topaz umber velvet walnut xenon yucca zephyr onyx pearl", "s1"),
    ]
    sf_dir = _write_documents(
        tmp_path, [(i, t, "en", s, len(t)) for i, t, s in docs]
    )
    q = get("curation_funnel")
    got = {
        (r.source, r.stage): r.n_docs for r in q.spark_fn(spark, sf_dir).collect()
    }
    assert got == {
        ("s1", "quality"): 1,
        ("s1", "exact_dup"): 1,
        ("s1", "kept"): 2,
        ("s2", "near_dup"): 1,
        ("s2", "kept"): 1,
        ("s3", "contaminated"): 1,
        ("s3", "kept"): 1,
    }
    assert_parity(q.spark_fn(spark, sf_dir), q.oracle, sf_dir, "curation_funnel/synth")


def test_shingle_short_doc_fallback(spark, tmp_path):
    """Every generated doc has ≥10 tokens, so the shingled_cte fallback
    (docs shorter than the 3-token shingle → whole trimmed text as the
    single shingle) is dead corpus-wide even though ALL dedup queries
    build on it. One- and two-token docs pin it: the pair of identical
    short docs must still come out as an LSH near-dup pair (their
    single-shingle sets are identical, J=1) on both engines."""
    docs = [
        (1, "solo", "s"),
        (2, "solo", "s"),               # identical 1-token docs: J=1 pair
        (3, "two words", "s"),
        (4, "quartz raven slate topaz umber velvet walnut xenon", "s"),
    ]
    sf_dir = _write_documents(tmp_path, [(i, t, "en", s, len(t)) for i, t, s in docs])
    q = get("dedup_minhash_lsh")
    pairs = {(r.doc_a, r.doc_b) for r in q.spark_fn(spark, sf_dir).collect()}
    assert (1, 2) in pairs
    assert_parity(q.spark_fn(spark, sf_dir), q.oracle, sf_dir, "dedup_minhash_lsh/synth")


def test_ohlc_pre1970_arrival_order(spark, tmp_path):
    """arrival_ord_key biases the epoch by +10^11 before zero-padding so
    NEGATIVE (pre-1970) seconds order numerically. A bare lpad of the
    signed string mis-sorts them two ways — same digit count ("-29" >
    "-20" lexicographically) and different digit count ("-2999" vs
    "-29") — so three ticks in the bar ending at epoch 0 pin both:
    open must be the t=-2999 tick, close the t=-20 tick, on both
    engines (the DuckDB oracle carries the same bias literal)."""
    rows = [
        (1, -2999, 10, "view", 5.0, "{}"),  # earliest → open
        (2, -29, 11, "view", 7.0, "{}"),
        (3, -20, 12, "view", 9.0, "{}"),  # latest → close
    ]
    sf_dir = _write_events(tmp_path, rows)
    q = get("value_ohlc_hourly")
    [bar] = q.spark_fn(spark, sf_dir).collect()
    assert (bar.window_end, bar.open_milli, bar.close_milli) == (0, 5000, 9000)
    assert (bar.high_milli, bar.low_milli, bar.n_events) == (9000, 5000, 3)
    assert_parity(q.spark_fn(spark, sf_dir), q.oracle, sf_dir, "value_ohlc_hourly/synth")


def test_lsh_bucket_cap_drops_oversized_keeps_small(spark, tmp_path):
    """The capped LSH variant must drop candidates from buckets larger
    than _LSH_BUCKET_CAP (=2) while keeping pairs from within-cap
    buckets — a crafted corpus makes the branch split deterministic:
    docs 1-4 are verbatim clones (every band bucket size 4 -> capped;
    their 6 pairs vanish), docs 10-11 are a near-dup pair alone in
    their buckets (size 2 -> kept), doc 20 is unrelated. The uncapped
    query keeps ALL near-dup pairs on the same corpus (superset), and
    lsh_bucket_skew reports exactly the capped buckets and saved
    pairs. Both engines agree on all three queries (oracle parity on
    the synthetic table)."""
    from flink_wsr_project_spark.plans.pipeline_queries import _LSH_BUCKET_CAP

    if _LSH_BUCKET_CAP != 2:  # corpus is built for cap=2; the env
        pytest.skip("SPARK_GRAFT_LSH_BUCKET_CAP overridden")  # override is legitimate
    clone = "the quick brown fox jumps over the lazy dog again and again today"
    near_a = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    near_b = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda nu"
    other = "completely different content about spark structured streaming state"
    rows = [
        (1, clone, "en", "web", len(clone)),
        (2, clone, "en", "web", len(clone)),
        (3, clone, "en", "web", len(clone)),
        (4, clone, "en", "web", len(clone)),
        (10, near_a, "en", "web", len(near_a)),
        (11, near_b, "en", "web", len(near_b)),
        (20, other, "en", "web", len(other)),
    ]
    sf_dir = _write_documents(tmp_path, rows)

    capped = get("dedup_minhash_lsh_capped")
    uncapped = get("dedup_minhash_lsh")
    skew = get("lsh_bucket_skew")

    got_capped = {
        (r.doc_a, r.doc_b) for r in capped.spark_fn(spark, sf_dir).collect()
    }
    got_uncapped = {
        (r.doc_a, r.doc_b) for r in uncapped.spark_fn(spark, sf_dir).collect()
    }
    assert got_capped == {(10, 11)}  # clone-cluster pairs capped away
    assert {(a, b) for a, b in got_uncapped if a < 5 and b < 5} == {
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)
    }
    assert got_capped < got_uncapped  # strict, measured coverage cost
    srows = skew.spark_fn(spark, sf_dir).collect()
    assert {r.band for r in srows} == {0, 1, 2, 3}
    for r in srows:
        assert r.max_bucket == 4 and r.buckets_capped == 1 and r.pairs_saved == 6

    for q in (capped, uncapped, skew):
        assert_parity(q.spark_fn(spark, sf_dir), q.oracle, sf_dir, f"{q.name}/synth")


def test_series_pattern_zero_variance_and_exact_match(spark, tmp_path):
    """series_pattern_topk branch coverage the generated data never
    reaches (its continuous doubles produce no constant length-8 run
    at either gate SF — checked): a CONSTANT series whose windows have
    zero variance must be excluded by the `8*sxx - sx*sx > 0` guard on
    BOTH engines (without it the normalization divides by zero), an
    exact pattern-shaped series must score at the top (corr ≈ 1000
    milli), and its negation must score the exact mirror (corr is
    shift/scale-invariant, so -x flips only the sign)."""
    pat = (0, 100, 300, 600, 1000, 600, 300, 100)
    rows = []
    # user 10: constant value => the only full window has zero variance
    for j in range(8):
        rows.append((100 + j, 1000 + j, 10, "view", 5.0, "{}"))
    # user 11: the exact pattern shape (value in units => x = pat milli)
    for j, p in enumerate(pat):
        rows.append((200 + j, 2000 + j, 11, "view", p / 1000.0, "{}"))
    # user 12: the negated pattern
    for j, p in enumerate(pat):
        rows.append((300 + j, 3000 + j, 12, "view", -p / 1000.0, "{}"))
    sf_dir = _write_events(tmp_path, rows)
    q = get("series_pattern_topk")
    out = q.spark_fn(spark, sf_dir).collect()

    by_user = {r.user_id: r for r in out}
    # zero-variance user emits NOTHING; both shaped users emit one window
    assert 10 not in by_user and len(out) == 2
    # exact shape scores at/next to 1000 milli and the negation at/next
    # to -1000 (the true correlations are exactly ±1; the IEEE sqrt
    # product may land one ulp either side before the milli floor)
    assert by_user[11].corr_milli in (999, 1000)
    assert by_user[12].corr_milli in (-1001, -1000)
    # ranking: positive match first
    assert [r.user_id for r in out] == [11, 12]
    # and the oracle agrees row-for-row on the same crafted input
    assert_parity(q.spark_fn(spark, sf_dir), q.oracle, sf_dir, "series_pattern/synth")


def test_events_quality_report_violations(spark, tmp_path):
    """At both gate SFs the generated events violate NO rule —
    violations is 0 and pass_rate 1.0 for all three rows (checked), so
    every rule's counting branch (the whole point of a quality report)
    was externally green yet unexercised, including the NULL
    semantics: a NULL value fails `BETWEEN` into the ELSE arm, a NULL
    event_type fails `IN`. Crafted rows hit every rule, both range
    ends, and the NULL paths, on both engines."""
    import numpy as np

    pdf = pd.DataFrame(
        {
            "event_id": pd.array(range(1, 9), dtype="int64"),
            "ts": pd.to_datetime([1000 + i for i in range(8)], unit="s").astype(
                "datetime64[us]"
            ),
            "user_id": pd.array([1, None, 3, 4, 5, 6, 7, 8], dtype="Int64"),
            "event_type": ["view", "click", "bogus", None, "purchase", "signup", "error", "view"],
            "value": [1.0, 2.0, 3.0, 4.0, -0.5, 1000000.5, np.nan, 0.0],
            "props": ["{}"] * 8,
        }
    )
    d = tmp_path / "synth_quality"
    d.mkdir(exist_ok=True)
    pdf.to_parquet(d / "events.parquet", index=False)
    sf_dir = str(d)

    q = get("events_quality_report")
    got = {r.rule: (r.violations, r.rows_checked, r.pass_rate) for r in q.spark_fn(spark, sf_dir).collect()}
    # user_id: 1 NULL; value: -0.5, 1000000.5, NaN-as-NULL → 3; type: bogus + NULL → 2
    assert got == {
        "user_not_null": (1, 8, 1.0 - 1 / 8),
        "value_range": (3, 8, 1.0 - 3 / 8),
        "known_type": (2, 8, 1.0 - 2 / 8),
    }
    assert_parity(q.spark_fn(spark, sf_dir), q.oracle, sf_dir, "events_quality/synth")


def test_dedup_method_agreement_all_three_cells(spark, tmp_path):
    """At sf0.01 the text-method and embedding-method near-dup pair
    sets are DISJOINT (n_both = 0 — checked), so the agreement count
    this query exists to report has never been a non-zero number.
    Crafted corpus: ids 1/2 are near-dup in BOTH modalities, 3/4 only
    textually (orthogonal embeddings), 5/6 only by embedding
    (unrelated text) → n_text=2, n_emb=2, n_both=1 on both engines."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    long_a = "the quick brown fox jumps over the lazy dog again and again " * 3
    long_b = "completely different words about spark catalyst and parquet scans " * 3
    long_c = "a third unrelated passage mentioning streams state and watermarks " * 3
    docs = pd.DataFrame(
        {
            "doc_id": pd.array([1, 2, 3, 4, 5, 6], dtype="int64"),
            "text": [long_a, long_a, long_b, long_b, long_c, "nothing shared here at all truly"],
            "lang": ["en"] * 6,
            "source": ["s"] * 6,
            "n_chars": pd.array([len(long_a)] * 2 + [len(long_b)] * 2 + [len(long_c), 32], dtype="int64"),
        }
    )
    e1 = [1.0, 0.0, 0.0, 0.0]
    e2 = [0.0, 1.0, 0.0, 0.0]
    e3 = [0.0, 0.0, 1.0, 0.0]
    e4 = [0.0, 0.0, 0.0, 1.0]
    emb = pa.table(
        {
            "vec_id": pa.array([1, 2, 3, 4, 5, 6], type=pa.int64()),
            # mutually orthogonal except the two deliberate dup pairs
            # (1,2) and (5,6) — every other same-label pair has cos 0
            "embedding": pa.array(
                [e1, e1, e2, e3, e4, e4], type=pa.list_(pa.float32())
            ),
            "label": pa.array([0, 0, 0, 0, 0, 0], type=pa.int32()),
        }
    )
    d = tmp_path / "synth_agreement"
    d.mkdir(exist_ok=True)
    docs.to_parquet(d / "documents.parquet", index=False)
    pq.write_table(emb, d / "embeddings.parquet")
    sf_dir = str(d)

    q = get("dedup_method_agreement")
    row = q.spark_fn(spark, sf_dir).collect()[0]
    assert (row.n_text_pairs, row.n_emb_pairs, row.n_both) == (2, 2, 1)
    assert_parity(q.spark_fn(spark, sf_dir), q.oracle, sf_dir, "dedup_agreement/synth")


def test_source_quality_summary_fail_modes(spark, tmp_path):
    """At sf0.01 every generated doc passes the Gopher gate in every
    source (n_pass == n_docs, pass_rate 1.0 across all 20 sources —
    checked), so the gate's FAIL side — the reason the dashboard
    exists — never fires. Crafted docs pin each fail mode and the
    inclusive ratio boundary:

      bad/1  3 tokens                  → fail (token count < 10)
      bad/2  12 one-char tokens        → fail (chars/token < 3)
      bad/3  10 twenty-char tokens     → fail (chars/token > 15)
      bad/4  normal                    → pass  ⇒ bad pass_rate 0.25
      good/5 ratio exactly 3.0         → pass (BETWEEN is inclusive)
      good/6 normal                    → pass  ⇒ good pass_rate 1.0
    """
    ratio3 = " ".join(["aa"] * 9 + ["bbb"])  # 10 toks, 30 chars → 3.0
    docs = [
        (1, "alpha beta gamma", "bad"),
        (2, " ".join(list("abcdefghijkl")), "bad"),
        (3, " ".join(["x" * 20] * 10), "bad"),
        (4, "quartz raven slate topaz umber velvet walnut xenon yucca zephyr", "bad"),
        (5, ratio3, "good"),
        (6, "amber birch cedar dunes ember frost grove haven ivory jasper", "good"),
    ]
    sf_dir = _write_documents(tmp_path, [(i, t, "en", s, len(t)) for i, t, s in docs])
    q = get("source_quality_summary")
    got = {r.source: (r.n_docs, r.n_pass, r.pass_rate) for r in q.spark_fn(spark, sf_dir).collect()}
    assert got == {"bad": (4, 1, 0.25), "good": (2, 2, 1.0)}
    assert_parity(q.spark_fn(spark, sf_dir), q.oracle, sf_dir, "source_quality/synth")


def test_fuzzy_prefix_nonzero_distance(spark, tmp_path):
    """Every LSH candidate pair at sf0.01 has prefix_edit_distance 0
    (near-dups in the generated corpus share their first 40 chars —
    checked), so the Levenshtein kernel — the FUZZY part of the fuzzy
    matcher — never computes a nonzero value. Two crafted pairs pin
    it: an identical pair (distance 0) and a pair differing by one
    char inside the 40-char prefix (distance 1, still J≈0.71 so the
    LSH block keeps it), cross-checked against DuckDB's levenshtein."""
    base = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
        "kilo lima mike november oscar papa quebec romeo sierra tango"
    )
    variant = base.replace("charlie", "charlee")  # 1 edit, within 40 chars
    docs = [
        (1, base, "s"),
        (2, variant, "s"),
        (3, "quartz raven slate topaz umber velvet walnut xenon yucca zephyr onyx", "s"),
        (4, "quartz raven slate topaz umber velvet walnut xenon yucca zephyr onyx", "s"),
    ]
    sf_dir = _write_documents(tmp_path, [(i, t, "en", s, len(t)) for i, t, s in docs])
    q = get("fuzzy_prefix_pairs")
    got = {(r.doc_a, r.doc_b): r.prefix_edit_distance for r in q.spark_fn(spark, sf_dir).collect()}
    assert got[(1, 2)] == 1 and got[(3, 4)] == 0
    assert_parity(q.spark_fn(spark, sf_dir), q.oracle, sf_dir, "fuzzy_prefix/synth")


def test_conversion_funnel_stage_three(spark, tmp_path):
    """At sf0.01 no user completes view→click→purchase inside the hour
    (the funnel emits only stages 1 and 2 — checked), so the deepest
    CASE arm and its `reached >= 3` row never execute. Crafted users
    pin the full ladder, the inclusive 3600-s boundary, and the
    ordering constraint (a purchase BEFORE the click must not count):

      u1 view 0 → click 10 → purchase 3600   stage 3 (boundary, <= holds)
      u2 view 0 → click 10 → purchase 3700   stage 2 (purchase too late)
      u3 view 0 → click 20, purchase at 15   stage 2 (purchase precedes click)
      u4 view only                           stage 1
    """
    rows = [
        (1, 1000, 1, "view", 1.0, "{}"),
        (2, 1010, 1, "click", 1.0, "{}"),
        (3, 4600, 1, "purchase", 1.0, "{}"),
        (4, 1000, 2, "view", 1.0, "{}"),
        (5, 1010, 2, "click", 1.0, "{}"),
        (6, 4700, 2, "purchase", 1.0, "{}"),
        (7, 1000, 3, "view", 1.0, "{}"),
        (8, 1020, 3, "click", 1.0, "{}"),
        (9, 1015, 3, "purchase", 1.0, "{}"),
        (10, 1000, 4, "view", 1.0, "{}"),
    ]
    sf_dir = _write_events(tmp_path, rows)
    q = get("conversion_funnel")
    got = {r.stage: r.n_users for r in q.spark_fn(spark, sf_dir).collect()}
    assert got == {1: 4, 2: 3, 3: 1}
    assert_parity(q.spark_fn(spark, sf_dir), q.oracle, sf_dir, "conversion_funnel/synth")


def test_doc_triangles_multi_triangle_nodes(spark, tmp_path):
    """Every triangle-bearing doc at sf0.01 sits in EXACTLY one
    triangle (n_triangles=1 for all rows — checked), so the per-node
    accumulation over multiple triangles is unexercised. A crafted
    4-clique (each node in C(3,2)=3 triangles), a 3-clique (1 each),
    and a bare edge (no triangle — must be absent) pin the counting
    on both engines."""
    k4 = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo"
    k3 = "quartz raven slate topaz umber velvet walnut xenon yucca zephyr"
    edge = "amber birch cedar dunes ember frost grove haven ivory jasper"
    docs = (
        [(i, k4, "s") for i in (1, 2, 3, 4)]
        + [(i, k3, "s") for i in (5, 6, 7)]
        + [(i, edge, "s") for i in (8, 9)]
    )
    sf_dir = _write_documents(tmp_path, [(i, t, "en", s, len(t)) for i, t, s in docs])
    q = get("doc_triangles")
    got = {r.doc_id: r.n_triangles for r in q.spark_fn(spark, sf_dir).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3, 5: 1, 6: 1, 7: 1}
    assert_parity(q.spark_fn(spark, sf_dir), q.oracle, sf_dir, "doc_triangles/synth")


def test_doc_oov_ratio_nonzero(spark, tmp_path):
    """The generated corpus has fewer than 100 distinct tokens, so the
    top-100 vocab covers EVERYTHING and oov_ratio is 0.0 for all 500
    docs at sf0.01 (checked) — the out-of-vocabulary subtraction the
    query exists for never produces a nonzero value. A crafted corpus
    with 125 distinct tokens pins the vocab cutoff (count desc, token
    asc tie-break: the five common tokens + singletons r001..r095 are
    in; r096..r120 are out) and a doc straddling it on both engines."""
    singles = [f"r{i:03d}" for i in range(1, 121)]
    docs = [(i, "c1 c2 c3 c4 c5", "s") for i in range(1, 11)]
    docs.append((11, " ".join(singles[:60]), "s"))     # r001-r060: all in vocab
    docs.append((12, " ".join(singles[60:]), "s"))     # r061-r095 in, r096-r120 out
    sf_dir = _write_documents(tmp_path, [(i, t, "en", s, len(t)) for i, t, s in docs])
    q = get("doc_oov_ratio")
    got = {r.doc_id: (r.n_tokens, r.in_vocab) for r in q.spark_fn(spark, sf_dir).collect()}
    assert got[11] == (60, 60)
    assert got[12] == (60, 35)  # 25 OOV tokens → ratio 25/60
    assert all(got[i] == (5, 5) for i in range(1, 11))
    assert_parity(q.spark_fn(spark, sf_dir), q.oracle, sf_dir, "doc_oov/synth")


def test_dedup_exact_multi_copy_groups(spark, tmp_path):
    """The sf0.01 corpus contains ZERO exact duplicates (n_copies=1 for
    all 500 hash groups — checked), so the exact-dedup query has never
    actually deduplicated at the gate SF. Crafted copies pin the group
    count and the min-doc_id keeper rule (including ids arriving out
    of order) on both engines."""
    docs = [
        (7, "alpha bravo charlie delta echo", "s"),
        (3, "alpha bravo charlie delta echo", "s"),   # dup, lower id → keeper
        (5, "alpha bravo charlie delta echo", "s"),   # triple
        (9, "quartz raven slate topaz umber", "s"),
        (2, "unique text here entirely", "s"),
    ]
    sf_dir = _write_documents(tmp_path, [(i, t, "en", s, len(t)) for i, t, s in docs])
    q = get("dedup_exact")
    got = {r.keep_doc_id: r.n_copies for r in q.spark_fn(spark, sf_dir).collect()}
    assert got == {3: 3, 9: 1, 2: 1}
    assert_parity(q.spark_fn(spark, sf_dir), q.oracle, sf_dir, "dedup_exact/synth")


def test_doc_quality_score_fail_side(spark, tmp_path):
    """passes_quality is True for all 500 docs at sf0.01 (checked) —
    the per-doc gate never fails even though the per-source rollup's
    fail modes are now pinned. Reuse the same crafted fail modes at
    the doc level: short doc, tiny chars/token, huge chars/token, and
    a passing doc with stopwords (nonzero stopword_ratio)."""
    docs = [
        (1, "alpha beta gamma", "s"),
        (2, " ".join(list("abcdefghijkl")), "s"),
        (3, " ".join(["x" * 20] * 10), "s"),
        (4, "the cat sat on a mat and then the dog", "s"),
    ]
    sf_dir = _write_documents(tmp_path, [(i, t, "en", s, len(t)) for i, t, s in docs])
    q = get("doc_quality_score")
    got = {r.doc_id: r.passes_quality for r in q.spark_fn(spark, sf_dir).collect()}
    assert got == {1: False, 2: False, 3: False, 4: True}
    rows = {r.doc_id: r for r in q.spark_fn(spark, sf_dir).collect()}
    assert rows[4].stopword_ratio > 0
    assert_parity(q.spark_fn(spark, sf_dir), q.oracle, sf_dir, "doc_quality/synth")


def test_cms_nonzero_overestimate(spark, tmp_path):
    """overestimate is 0 for every top-20 token at sf0.01 (checked):
    the corpus vocabulary is far smaller than the 4×1024 sketch, so no
    heavy hitter ever shares all four cells with another token — the
    error the query exists to measure is always zero. A 5000-token
    vocabulary (~5 tokens per bucket per row) forces collisions into
    every cell: at least one top-20 token must show a POSITIVE
    overestimate, and min-of-cells ≥ exact must still hold for all —
    with DuckDB agreeing on the exact per-token error values."""
    words = [f"w{i:04d}" for i in range(5000)]
    docs = []
    # 50 docs × 100 distinct rare tokens = the 5000-token noise floor
    for i in range(50):
        docs.append((i, " ".join(words[i * 100 : (i + 1) * 100]), "s"))
    # heavy hitters: 30 copies of each of 3 tokens
    docs.append((100, " ".join(["hhalpha"] * 30 + ["hhbravo"] * 30 + ["hhcharlie"] * 30), "s"))
    sf_dir = _write_documents(tmp_path, [(i, t, "en", s, len(t)) for i, t, s in docs])
    q = get("token_cms_heavy_hitters")
    rows = q.spark_fn(spark, sf_dir).collect()
    assert all(r.overestimate >= 0 for r in rows)
    assert any(r.overestimate > 0 for r in rows)
    assert_parity(q.spark_fn(spark, sf_dir), q.oracle, sf_dir, "cms_overest/synth")


def test_kv_upsert_null_key_rows_excluded(spark, tmp_path):
    """Generated events have no NULL user_id/event_type, so the KV
    key's NULL handling was never exercised — and the three engines
    genuinely disagreed: Spark's concat_ws SKIPS NULL fields, DuckDB's
    || NULL-propagates, and the sink's '|'.join raises on None. The
    contract is now "NULL key columns never reach the KV store",
    filtered identically in both engines; crafted NULL rows pin it."""
    pdf = pd.DataFrame(
        {
            "event_id": pd.array([1, 2, 3, 4, 5, 6], dtype="int64"),
            "ts": pd.to_datetime(
                [1000, 2000, 3000, 4000, 5000, 6000], unit="s"
            ).astype("datetime64[us]"),
            "user_id": pd.array([10, None, 10, 11, None, 10], dtype="Int64"),
            "event_type": ["view", "view", None, "view", None, "view"],
            "value": [1.0] * 6,
            "props": ["{}"] * 6,
        }
    )
    d = tmp_path / "synth_null_sf"
    d.mkdir(exist_ok=True)
    pdf.to_parquet(d / "events.parquet", index=False)
    sf_dir = str(d)
    q = get("kv_upsert_final_state")
    got = {r.kv_key: r.kv_value for r in q.spark_fn(spark, sf_dir).collect()}
    # events 2/3/5 carry a NULL key column -> excluded, never a
    # 'None|view' / '10|' / NULL-keyed row
    assert got == {"10|view": "2", "11|view": "1"}
    assert_parity(q.spark_fn(spark, sf_dir), q.oracle, sf_dir, "kv_upsert_null/synth")


def test_star_edge_verify_rejects_false_positive_member(spark, tmp_path):
    """The over-cap star edges are Jaccard-gated (r8), but at every
    tested SF with cap=2 each over-cap bucket is a pure clone cluster,
    so the reject branch (member fails Jaccard >= 0.5 vs the keeper)
    was dead code. This corpus makes it fire deterministically: docs
    1-3 are verbatim clones; doc 4 extends the clone text with 14 junk
    tokens chosen (offline search over the repo's fixed hash/perm
    constants; re-verified under the r16 polynomial scheme, where the
    colliding band is band 0 instead of band 3) so one band's minhash
    minima all equal the clones' — a REAL band-hash false positive —
    while exact 3-gram Jaccard vs the clone is 11/25 = 0.44 < 0.5. Every bucket holding a clone
    holds all three (size >= 3 > cap), so doc 4 can only reach the
    clones through the star branch, and the verify must reject it:
    doc 4 stays kept, alone in its component, on BOTH engines."""
    from flink_wsr_project_spark.plans.pipeline_queries import _LSH_BUCKET_CAP

    if _LSH_BUCKET_CAP != 2:  # corpus is built for cap=2; the env
        pytest.skip("SPARK_GRAFT_LSH_BUCKET_CAP overridden")  # override is legitimate
    clone = "the quick brown fox jumps over the lazy dog again and again today"
    fp = (
        clone
        + " umbrella dahlia cedar vortex juniper clove larch birch"
        + " wombat moss sphinx kelp reed bramble"
    )
    rows = [
        (1, clone, "en", "web", len(clone)),
        (2, clone, "en", "web", len(clone)),
        (3, clone, "en", "web", len(clone)),
        (4, fp, "en", "web", len(fp)),
        (20, "completely different content about spark structured streaming state",
         "en", "web", 66),
    ]
    sf_dir = _write_documents(tmp_path, rows)

    keep = get("dedup_keep_list")
    got = {r.doc_id: r.action for r in keep.spark_fn(spark, sf_dir).collect()}
    # 2/3 collapse onto keeper 1; the false-positive member 4 fails the
    # verify and stays kept (the branch this test exists to exercise).
    assert got == {1: "keep", 2: "drop", 3: "drop", 4: "keep", 20: "keep"}

    comp = get("dedup_components")
    comps = {r.doc_id: r.component_id for r in comp.spark_fn(spark, sf_dir).collect()}
    assert comps == {1: 1, 2: 1, 3: 1, 4: 4, 20: 20}

    for q in (keep, comp):
        assert_parity(q.spark_fn(spark, sf_dir), q.oracle, sf_dir, f"{q.name}/synth-fp")


def test_capped_keep_list_matches_uncapped_on_clones(spark, tmp_path):
    """The chain docstring's contract: on PURE clone clusters the
    cap-aware drop set equals the uncapped chain's (the star collapse
    loses nothing when every star edge verifies). Corpus: a 5-clone
    cluster (over-cap in every band at cap=2), a 2-doc near-dup pair
    (within-cap), and an unrelated doc. The uncapped reference drop
    set is computed from ``dedup_minhash_lsh`` pairs at the chain's
    own threshold (>= 0.5): a doc is dropped iff it is doc_b of any
    verified pair — identical rule, unbounded candidate join."""
    clone = "pack my box with five dozen liquor jugs before the next auction today"
    near_a = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    near_b = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda nu"
    rows = [(i, clone, "en", "web", len(clone)) for i in range(1, 6)] + [
        (10, near_a, "en", "web", len(near_a)),
        (11, near_b, "en", "web", len(near_b)),
        (20, "completely different content about spark structured streaming state",
         "en", "web", 66),
    ]
    sf_dir = _write_documents(tmp_path, rows)

    keep = get("dedup_keep_list")
    capped_drops = {
        r.doc_id for r in keep.spark_fn(spark, sf_dir).collect() if r.action == "drop"
    }
    uncapped = get("dedup_minhash_lsh")
    uncapped_drops = {
        r.doc_b for r in uncapped.spark_fn(spark, sf_dir).collect() if r.jaccard >= 0.5
    }
    assert capped_drops == uncapped_drops == {2, 3, 4, 5, 11}
    assert_parity(keep.spark_fn(spark, sf_dir), keep.oracle, sf_dir, "keep_list/synth-clones")


def test_within_cap_contract_capped_pairs_equal_chain_edges(spark, tmp_path):
    """Since r9 the standalone capped-pairs query and the composed
    chain derive their within-cap candidates from SEPARATE SQL
    (``_capped_cands_ctes``' size-window self-join — long-format since
    r16 — vs the chain's ``marked`` window CTE; see the
    _capped_cands_ctes docstring). This pins that the two formulations select the same
    pair set where they overlap: a corpus of three disjoint near-dup
    pairs (every band bucket size <= 2 = the default cap, all pairs
    Jaccard >= 0.5) plus an unrelated doc. The standalone pairs, the
    chain's components, and the chain's drop set must all describe
    exactly those three pairs, on both engines."""
    from flink_wsr_project_spark.plans.pipeline_queries import _LSH_BUCKET_CAP

    if _LSH_BUCKET_CAP != 2:  # corpus is built for cap=2; the env
        pytest.skip("SPARK_GRAFT_LSH_BUCKET_CAP overridden")  # override is legitimate
    pairs_text = [
        ("alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu",
         "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda nu"),
        ("one two three four five six seven eight nine ten eleven twelve items",
         "one two three four five six seven eight nine ten eleven twelve boxes"),
        ("red orange yellow green blue indigo violet colors of the rainbow sky",
         "red orange yellow green blue indigo violet colors of the rainbow sea"),
    ]
    rows = []
    for i, (a, b) in enumerate(pairs_text):
        rows += [(10 * (i + 1), a, "en", "web", len(a)),
                 (10 * (i + 1) + 1, b, "en", "web", len(b))]
    rows.append((99, "completely different content about spark structured streaming state",
                 "en", "web", 66))
    sf_dir = _write_documents(tmp_path, rows)

    expected = {(10, 11), (20, 21), (30, 31)}
    capped = get("dedup_minhash_lsh_capped")
    got_pairs = {(r.doc_a, r.doc_b) for r in capped.spark_fn(spark, sf_dir).collect()}
    assert got_pairs == expected

    comp = get("dedup_components")
    comps = {r.doc_id: r.component_id for r in comp.spark_fn(spark, sf_dir).collect()}
    assert comps == {10: 10, 11: 10, 20: 20, 21: 20, 30: 30, 31: 30, 99: 99}

    keep = get("dedup_keep_list")
    drops = {r.doc_id for r in keep.spark_fn(spark, sf_dir).collect() if r.action == "drop"}
    assert drops == {11, 21, 31}

    for q in (capped, comp, keep):
        assert_parity(q.spark_fn(spark, sf_dir), q.oracle, sf_dir, f"{q.name}/synth-wc")


def test_dedup_incremental_all_three_decisions(spark, tmp_path):
    """At sf0.01 all three decision branches fire, but the crafted
    corpus pins the SEMANTICS the generated data can't: corpus claims
    always outrank batch claims (doc 14 has both a corpus partner AND
    a smaller batch partner in its cluster — corpus must win), the
    within-batch arm claims strictly by smaller doc_id, and corpus
    docs never appear in the output (they are immutable; only the
    increment gets decisions). Batch = doc_id % 3 = 2 → batch docs
    are {2, 5, 8, 11, 14}, corpus {0, 1, 3}.

      cluster A: batch 2 ≡ batch 5 (identical)   → 2 keep, 5 dup_within_batch of 2
      cluster B: corpus 3 ~ batch 8 ~ batch 14   → 8, 14 dup_of_corpus of 3
                 (14's smaller batch partner 8 is outranked by corpus 3)
      singleton: batch 11                        → keep
    """
    A = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima mike november oscar papa"
    B = "red orange yellow green blue indigo violet crimson amber teal navy maroon olive silver gold bronze"
    B2 = B.rsplit(" ", 1)[0] + " copper"
    B3 = B.rsplit(" ", 1)[0] + " platinum"
    C = "one two three four five six seven eight nine ten eleven twelve thirteen fourteen fifteen sixteen"
    U1 = "cat dog bird fish horse cow sheep goat pig duck hen owl fox wolf bear deer"
    U2 = "sun moon star cloud rain snow wind storm fog mist dew frost hail sleet thunder lightning"
    rows = [
        (0, U1, "en", "s", len(U1)),
        (1, U2, "en", "s", len(U2)),
        (2, A, "en", "s", len(A)),
        (3, B, "en", "s", len(B)),
        (5, A, "en", "s", len(A)),
        (8, B2, "en", "s", len(B2)),
        (11, C, "en", "s", len(C)),
        (14, B3, "en", "s", len(B3)),
    ]
    sf_dir = _write_documents(tmp_path, rows)
    q = get("dedup_incremental")
    got = {r.doc_id: (r.decision, r.dup_of) for r in q.spark_fn(spark, sf_dir).collect()}
    assert got == {
        2: ("keep", None),
        5: ("dup_within_batch", 2),
        8: ("dup_of_corpus", 3),
        11: ("keep", None),
        14: ("dup_of_corpus", 3),
    }
    assert_parity(q.spark_fn(spark, sf_dir), q.oracle, sf_dir, "dedup_incremental/synth")


def test_quantized_recall_loses_a_neighbor(spark, tmp_path):
    """At sf0.01 int8 quantization preserves every exact top-5 set
    (n_hit == 5, recall_ppm == 1000000 for all queries — checked), so
    the LOSS the query exists to measure never appears. Crafted
    corpus: query [1, 0] with four clear winners and two straddlers
    whose float cosines differ but which QUANTIZE IDENTICALLY
    ([127, 103] both, m = 1.0):

      id 907  y=0.8094 → float rank 5 (better aligned)
      id 801  y=0.81   → float rank 6

    Equal quantized cosine falls to the neighbor_id tie-break, which
    picks 801 — so the quantized top-5 swaps 907 for 801 and recall@5
    is exactly 4/5 on both engines."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    vecs = {
        0: [1.0, 0.0],
        1: [1.0, 0.1],
        2: [1.0, 0.2],
        3: [1.0, 0.3],
        4: [1.0, 0.4],
        907: [1.0, 0.8094],
        801: [1.0, 0.81],
    }
    ids = sorted(vecs)
    emb = pa.table(
        {
            "vec_id": pa.array(ids, type=pa.int64()),
            "embedding": pa.array([vecs[i] for i in ids], type=pa.list_(pa.float32())),
            "label": pa.array([0] * len(ids), type=pa.int32()),
        }
    )
    d = tmp_path / "synth_quant"
    d.mkdir(exist_ok=True)
    pq.write_table(emb, d / "embeddings.parquet")
    sf_dir = str(d)

    q = get("ann_quantized_recall")
    rows = {r.query_id: (r.n_hit, r.recall_ppm) for r in q.spark_fn(spark, sf_dir).collect()}
    assert rows == {0: (4, 800000)}
    assert_parity(q.spark_fn(spark, sf_dir), q.oracle, sf_dir, "quant_recall/synth")


def test_star_collapse_residual_quantified_when_keeper_is_false_positive(spark, tmp_path):
    """Quantifies the documented star-collapse recall residual
    (_neardup_edges_ctes docstring): star edges verify member-vs-KEEPER
    only, so when the bucket-MIN doc is a band-hash false positive, the
    mutual near-dup members behind it lose every edge FROM THAT BUCKET.
    The r10 verdict asked for a number behind "another band can still
    supply them" — this corpus measures it.

    Corpus: the searched single-band collision text from
    test_star_edge_verify_rejects_false_positive_member (band 0 under
    the r16 polynomial constants; band 3 under the pre-r16 md5
    scheme), but the false positive gets doc_id 0 — SMALLER than the
    clones — so in the poisoned band it IS the bucket-min keeper.
    Per-band star-edge audit (inline SQL over the chain's own
    signature/verify fragments):

      band 0:    bucket {0,1,2,3} → 3 star candidates, 0 verified
                 (keeper 0 fails Jaccard vs every clone: the poisoned
                  band contributes NOTHING)
      bands 1-3: bucket {1,2,3}   → 2 star candidates, 2 verified

    So the per-band loss is total (3/3 candidates) in the poisoned
    band, and the recovery is total for the SEMANTICS: identical
    members share ALL four band buckets, the other three bands each
    supply the (1,2),(1,3) keeper edges, and the chain's drop set
    equals the uncapped reference. A poisoned-everywhere corpus would
    need the false positive to collide in all 4 bands AND hold the
    min id — a full 16-value minhash signature collision, i.e. a
    minhash DUPLICATE, not a false positive. That bound is the number
    SCALE.md r11 records."""
    from flink_wsr_project_spark.operators.dedup import (
        jaccard_expr,
        longsigs_select,
        shingled_cte,
        signature_sql,
    )
    from flink_wsr_project_spark.plans.pipeline_queries import _LSH_BUCKET_CAP

    if _LSH_BUCKET_CAP != 2:  # corpus is built for cap=2; the env
        pytest.skip("SPARK_GRAFT_LSH_BUCKET_CAP overridden")  # override is legitimate

    clone = "the quick brown fox jumps over the lazy dog again and again today"
    fp = (
        clone
        + " umbrella dahlia cedar vortex juniper clove larch birch"
        + " wombat moss sphinx kelp reed bramble"
    )
    rows = [
        (0, fp, "en", "web", len(fp)),
        (1, clone, "en", "web", len(clone)),
        (2, clone, "en", "web", len(clone)),
        (3, clone, "en", "web", len(clone)),
        (20, "completely different content about spark structured streaming state",
         "en", "web", 66),
    ]
    sf_dir = _write_documents(tmp_path, rows)

    # per-band star audit over the chain's own SQL fragments
    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView("documents")
    jac = jaccard_expr("sa.sh", "sb.sh", "spark")
    audit = spark.sql(f"""
WITH sigs AS ({signature_sql('spark')}),
{shingled_cte('spark')},
longsigs AS (
{longsigs_select('spark')}
),
marked AS (
  SELECT doc_id, b, h,
         count(*) OVER (PARTITION BY b, h) AS n,
         min(doc_id) OVER (PARTITION BY b, h) AS keeper
  FROM longsigs
),
star AS (
  SELECT DISTINCT b, keeper AS doc_a, doc_id AS doc_b
  FROM marked WHERE n > {_LSH_BUCKET_CAP} AND doc_id > keeper
)
SELECT s.b AS band,
       count(*) AS candidates,
       sum(CASE WHEN {jac} >= 0.5 THEN 1 ELSE 0 END) AS verified
FROM star s
JOIN shingled sa ON sa.doc_id = s.doc_a
JOIN shingled sb ON sb.doc_id = s.doc_b
GROUP BY s.b
""")
    got = {r.band: (r.candidates, r.verified) for r in audit.collect()}
    assert got == {0: (3, 0), 1: (2, 2), 2: (2, 2), 3: (2, 2)}

    # semantics survive the poisoned band: drop set == the uncapped
    # reference, the false positive stays kept and alone
    keep = get("dedup_keep_list")
    actions = {r.doc_id: r.action for r in keep.spark_fn(spark, sf_dir).collect()}
    assert actions == {0: "keep", 1: "keep", 2: "drop", 3: "drop", 20: "keep"}
    uncapped = get("dedup_minhash_lsh")
    uncapped_drops = {
        r.doc_b for r in uncapped.spark_fn(spark, sf_dir).collect() if r.jaccard >= 0.5
    }
    assert {d for d, a in actions.items() if a == "drop"} == uncapped_drops == {2, 3}

    comp = get("dedup_components")
    comps = {r.doc_id: r.component_id for r in comp.spark_fn(spark, sf_dir).collect()}
    assert comps == {0: 0, 1: 1, 2: 1, 3: 1, 20: 20}

    for q in (keep, comp):
        assert_parity(q.spark_fn(spark, sf_dir), q.oracle, sf_dir, f"{q.name}/synth-fpmin")


def test_image_dhash_sanitizes_non_ascii_text_identically(spark, tmp_path):
    """The render body is sized in CHARACTERS but encoded as UTF-8:
    an unsanitized multibyte codepoint would overflow the BMP's
    declared byte length (invalid container) and split the oracle's
    character arithmetic from the decoder's byte reads. Both engines
    now fold non-printable-ASCII to '0' with the escape-free
    '[^ -~]' class BEFORE sizing; a crafted corpus with multibyte,
    control, and boundary characters pins the parity — and that a
    sanitized clone of an ASCII doc still hashes identical (the fold
    is deterministic, not lossy-random)."""
    exotic = "café naïve 中文 data \tmixed—dash " * 6
    plain = exotic.replace("é", "0").replace("ï", "0").replace(
        "中", "0").replace("文", "0").replace("\t", "0").replace(
        "—", "0")
    rows = [
        (0, exotic, "en", "web", len(exotic)),
        (4, plain, "en", "web", len(plain)),  # same width class as 0
        (8, "completely different content about spark streaming state xyz",
         "en", "web", 61),
    ]
    sf_dir = _write_documents(tmp_path, rows)

    q = get("image_dhash_neardup")
    got = {(r.doc_a, r.doc_b, r.hamming) for r in q.spark_fn(spark, sf_dir).collect()}
    # the sanitized exotic doc renders byte-identically to its
    # hand-folded ASCII twin → Hamming 0
    assert (0, 4, 0) in got
    assert_parity(q.spark_fn(spark, sf_dir), q.oracle, sf_dir, "dhash/synth-nonascii")

    kl = get("image_dhash_keep_list")
    actions = {r.asset_id: r.action for r in kl.spark_fn(spark, sf_dir).collect()}
    assert actions == {0: "keep", 4: "drop", 8: "keep"}
    assert_parity(kl.spark_fn(spark, sf_dir), kl.oracle, sf_dir, "dhash_kl/synth-nonascii")


def _span_docs(tmp_path, texts):
    """Write documents with ids 1..n from a list of texts."""
    return _write_documents(
        tmp_path,
        [(i + 1, t, "en", "web", len(t)) for i, t in enumerate(texts)],
    )


def _toks(prefix, a, b):
    """Unique filler tokens prefix{a}..prefix{b-1}."""
    return [f"{prefix}{i}" for i in range(a, b)]


def test_shared_span_pairs_exact_offsets(spark, tmp_path):
    """The span primitive's core claim — maximal spans with EXACT
    0-based token offsets on both sides — pinned on crafted docs:

      doc1: 5 unique fillers + S[0..19]            (S at a_start=5)
      doc2: S[0..19] + 3 unique fillers            (S at b_start=0)
      doc3: 10-token prefix of S + unique fillers  (run < 16 → filtered)
      doc4: 6 tokens (< gram width → no grams at all)

    Expected output: exactly one row (1, 2, 5, 0, 20). The doc1/doc3
    and doc2/doc3 shared runs are 10 tokens — above the gram width so
    they DO form islands (3 grams each) but below SPAN_MIN_TOKENS, so
    the filter drops them: both branches of the min-span gate execute."""
    S = _toks("s", 0, 20)
    sf_dir = _span_docs(
        tmp_path,
        [
            " ".join(_toks("u", 0, 5) + S),
            " ".join(S + _toks("v", 0, 3)),
            " ".join(S[:10] + _toks("w", 0, 12)),
            " ".join(_toks("x", 0, 6)),
        ],
    )
    q = get("shared_span_pairs")
    rows = {
        (r.doc_a, r.doc_b, r.a_start, r.b_start, r.span_tokens)
        for r in q.spark_fn(spark, sf_dir).collect()
    }
    assert rows == {(1, 2, 5, 0, 20)}
    assert_parity(q.spark_fn(spark, sf_dir), q.oracle, sf_dir, "shared_span_pairs/synth")


def test_span_two_diagonals_two_rows(spark, tmp_path):
    """Two DISJOINT shared runs between the same pair at different
    relative offsets land on different diagonals and must come back as
    two separate maximal spans, not one merged blob."""
    A = _toks("a", 0, 16)
    B = _toks("b", 0, 18)
    sf_dir = _span_docs(
        tmp_path,
        [
            " ".join(A + _toks("u", 0, 4) + B),
            " ".join(B + _toks("v", 0, 7) + A),
        ],
    )
    q = get("shared_span_pairs")
    rows = {
        (r.doc_a, r.doc_b, r.a_start, r.b_start, r.span_tokens)
        for r in q.spark_fn(spark, sf_dir).collect()
    }
    assert rows == {(1, 2, 0, 25, 16), (1, 2, 20, 0, 18)}
    assert_parity(q.spark_fn(spark, sf_dir), q.oracle, sf_dir, "span_two_diagonals/synth")


def test_span_cap_star_preserves_keeper_claims_exactly(spark, tmp_path):
    """The valve's load-bearing property: for an over-cap gram, claims
    BY the min-id document are preserved EXACTLY (star rows match each
    occurrence against the keeper at the keeper's own gram positions,
    so the keeper-side spans are identical to the uncapped ones);
    what the cap drops is pair evidence among non-keeper documents.

    Four docs share the same 20-token run S (df = 4 per gram, over the
    cap of 2). Uncapped: all 6 pairs carry the span. Capped: exactly
    the 3 keeper pairs (1,2) (1,3) (1,4) — with the SAME offsets and
    length — and the keep-list still drops docs 2-4 on doc1's claims."""
    S = _toks("s", 0, 20)
    texts = [
        " ".join(_toks("u", 0, 3) + S),
        " ".join(S + _toks("v", 0, 5)),
        " ".join(_toks("w", 0, 7) + S),
        " ".join(S + _toks("x", 0, 4)),
    ]
    sf_dir = _span_docs(tmp_path, texts)
    qu = get("shared_span_pairs")
    qc = get("shared_span_pairs_capped")
    un = {
        (r.doc_a, r.doc_b, r.a_start, r.b_start, r.span_tokens)
        for r in qu.spark_fn(spark, sf_dir).collect()
    }
    cp = {
        (r.doc_a, r.doc_b, r.a_start, r.b_start, r.span_tokens)
        for r in qc.spark_fn(spark, sf_dir).collect()
    }
    assert len(un) == 6 and all(t == 20 for *_, t in un)
    assert cp == {(a, b, s1, s2, t) for (a, b, s1, s2, t) in un if a == 1}
    kl = get("span_dedup_keep_list")
    actions = {r.doc_id: r.action for r in kl.spark_fn(spark, sf_dir).collect()}
    assert actions == {1: "keep", 2: "drop", 3: "drop", 4: "drop"}
    assert_parity(qc.spark_fn(spark, sf_dir), qc.oracle, sf_dir, "span_capped/synth")
    assert_parity(kl.spark_fn(spark, sf_dir), kl.oracle, sf_dir, "span_keep_list/synth")


def test_span_coverage_union_and_threshold_boundary(spark, tmp_path):
    """Interval-union coverage and the exact 500-permille boundary.

    doc3 (highest id, 40 tokens = S[0..39]) is claimed by:
      doc1 = S[0..19]  → covers doc3 tokens 0..19
      doc2 = S[10..29] → covers doc3 tokens 10..29
    The union is 0..29 = 30 tokens (NOT 20+20=40): overlapping claims
    must not double-count. 30/40 = 750 permille → drop.

    doc4 setup pins the boundary: 40 tokens, exactly 20 covered by a
    lower doc → 500 permille == threshold → drop (>= semantics); and
    doc5 with 19 covered... is impossible (spans must be >= 16 and
    runs longer than intended would merge), so the keep side of the
    boundary is doc1/doc2 themselves: doc2 accrues coverage from doc1
    (their 10-token overlap is below min-span, so 0 permille → keep)."""
    S = _toks("s", 0, 40)
    T = _toks("t", 0, 40)
    sf_dir = _span_docs(
        tmp_path,
        [
            " ".join(S[0:20]),
            " ".join(S[10:30]),
            " ".join(S),
            " ".join(T),
            " ".join(T[0:20] + _toks("y", 0, 20)),
        ],
    )
    kl = get("span_dedup_keep_list")
    out = {r.doc_id: r for r in kl.spark_fn(spark, sf_dir).collect()}
    assert out[3].covered_tokens == 30 and out[3].coverage_permille == 750
    assert out[3].action == "drop"
    # doc5: tokens 0..19 covered by doc4's T-prefix → exactly 500 permille
    assert out[5].covered_tokens == 20 and out[5].coverage_permille == 500
    assert out[5].action == "drop"
    assert out[1].action == "keep" and out[2].action == "keep"
    assert out[4].action == "keep"
    assert_parity(kl.spark_fn(spark, sf_dir), kl.oracle, sf_dir, "span_coverage/synth")


def test_span_gram_skew_arithmetic(spark, tmp_path):
    """The skew report's saved-rows arithmetic, pinned by hand: one
    over-cap gram family (S shared by 3 docs, each gram df=3 > cap=2,
    occ=1 per doc → enumerated rows (3²-3)/2 = 3, star rows 2, saved 1
    per gram; 13 grams for a 20-token run) and one within-cap family
    (U shared by 2 docs — matchable, not capped, saves nothing)."""
    S = _toks("s", 0, 20)
    U = _toks("u", 0, 16)
    sf_dir = _span_docs(
        tmp_path,
        [
            " ".join(S),
            " ".join(_toks("v", 0, 2) + S),
            " ".join(S + _toks("w", 0, 2)),
            " ".join(U),
            " ".join(_toks("x", 0, 3) + U),
        ],
    )
    sk = get("span_gram_skew")
    row = sk.spark_fn(spark, sf_dir).collect()[0]
    # S-run: 20-8+1 = 13 grams at df=3; U-run: 16-8+1 = 9 grams at df=2
    assert row.max_df == 3
    assert row.grams_capped == 13
    assert row.grams_matchable == 13 + 9
    assert row.match_rows_saved == 13  # (3*3-3)//2 - (3-1)*1 = 1 per gram
    assert_parity(sk.spark_fn(spark, sf_dir), sk.oracle, sf_dir, "span_skew/synth")


def test_span_gram_skew_keeper_multiocc(spark, tmp_path):
    """Saved-rows arithmetic when the KEEPER holds multiple copies of
    an over-cap gram — the stray-keeper-copy scenario the star-arm fix
    constructs. Keeper doc1 carries the shared 20-token run S twice
    (separated by 8 unique fillers, so no junction gram repeats);
    docs 2 and 3 carry S once. Per S-gram: occ = (2,1,1), total=4,
    sq=6, df=3 > cap=2 → enumerated (16-6)/2 = 5; star rows
    (4-2)*2 = 4 (each member occurrence pairs with BOTH keeper
    occurrences); saved = 1 per gram × 13 grams. The pre-fix formula
    subtracted only (4-2) = 2 star rows and would report 39."""
    S = _toks("s", 0, 20)
    sf_dir = _span_docs(
        tmp_path,
        [
            " ".join(S + _toks("f", 0, 8) + S),
            " ".join(_toks("v", 0, 2) + S),
            " ".join(S + _toks("w", 0, 2)),
        ],
    )
    sk = get("span_gram_skew")
    row = sk.spark_fn(spark, sf_dir).collect()[0]
    assert row.max_df == 3
    assert row.grams_capped == 13
    assert row.match_rows_saved == 13  # (4*4-6)//2 - (4-2)*2 = 1 per gram
    assert_parity(
        sk.spark_fn(spark, sf_dir), sk.oracle, sf_dir, "span_skew/keeper-multiocc"
    )


def test_span_scrub_exact_strings(spark, tmp_path):
    """The cut-and-reassemble pinned on exact strings: the keeper's
    copy is untouched, a middle span is cut with prefix/suffix
    reassembled in order, a fully-shared doc scrubs to empty, and an
    unrelated doc passes through byte-identical."""
    S = _toks("s", 0, 20)
    sf_dir = _span_docs(
        tmp_path,
        [
            " ".join(_toks("f", 0, 5) + S + _toks("g", 0, 5)),  # keeper
            " ".join(_toks("h", 0, 3) + S + _toks("k", 0, 4)),  # middle cut
            " ".join(S),                                        # fully shared
            " ".join(_toks("z", 0, 9)),                         # untouched
        ],
    )
    q = get("span_scrub")
    out = {r.doc_id: r for r in q.spark_fn(spark, sf_dir).collect()}
    assert out[1].tokens_removed == 0
    assert out[1].scrubbed_text == " ".join(_toks("f", 0, 5) + S + _toks("g", 0, 5))
    assert out[2].tokens_removed == 20
    assert out[2].scrubbed_text == " ".join(_toks("h", 0, 3) + _toks("k", 0, 4))
    assert out[3].tokens_removed == 20 and out[3].scrubbed_text == ""
    assert out[4].tokens_removed == 0
    assert out[4].scrubbed_text == " ".join(_toks("z", 0, 9))
    assert_parity(q.spark_fn(spark, sf_dir), q.oracle, sf_dir, "span_scrub/synth")


def test_span_gapped_bridges_one_substitution(spark, tmp_path):
    """The gapped variant's reason to exist, pinned: a single token
    SUBSTITUTION mid-run (doc2's token 20 of a 40-token shared run)
    kills the 8 grams covering it. Exact islands report TWO spans
    (tokens 0..19 and 21..39); the gapped merge bridges the w-wide
    hole into ONE 40-token near-verbatim span with matched_grams = 25
    (33 gram positions minus the 8 killed). An INSERTION, by contrast,
    shifts the diagonal and must NOT be bridged."""
    S = _toks("s", 0, 40)
    edited = list(S)
    edited[20] = "EDIT"
    inserted = S[:20] + ["INS"] + S[20:]
    sf_dir = _span_docs(
        tmp_path,
        [
            " ".join(S),
            " ".join(edited),
            " ".join(inserted),
        ],
    )
    qe = get("shared_span_pairs_capped")
    qg = get("shared_span_pairs_gapped")
    exact12 = sorted(
        (r.a_start, r.b_start, r.span_tokens)
        for r in qe.spark_fn(spark, sf_dir).collect()
        if (r.doc_a, r.doc_b) == (1, 2)
    )
    assert exact12 == [(0, 0, 20), (21, 21, 19)]  # split by the edit
    gap12 = [
        (r.a_start, r.b_start, r.span_tokens, r.matched_grams)
        for r in qg.spark_fn(spark, sf_dir).collect()
        if (r.doc_a, r.doc_b) == (1, 2)
    ]
    assert gap12 == [(0, 0, 40, 25)]  # one bridged near-verbatim span

    # the insertion pair: two diagonals, bridged into nothing longer —
    # same spans as exact (alignment changed, not edited)
    gap13 = sorted(
        (r.a_start, r.b_start, r.span_tokens)
        for r in qg.spark_fn(spark, sf_dir).collect()
        if (r.doc_a, r.doc_b) == (1, 3)
    )
    exact13 = sorted(
        (r.a_start, r.b_start, r.span_tokens)
        for r in qe.spark_fn(spark, sf_dir).collect()
        if (r.doc_a, r.doc_b) == (1, 3)
    )
    assert gap13 == [(a, b, t) for a, b, t in exact13]
    assert len(gap13) == 2  # prefix (diag 0) and suffix (diag -1) runs
    assert_parity(qg.spark_fn(spark, sf_dir), qg.oracle, sf_dir, "span_gapped/synth")


def test_bm25_rare_term_and_length_normalization(spark, tmp_path):
    """BM25 semantics pinned on crafted docs (query: join, filter,
    dup): a single RARE-term hit (df=1) outranks a common-term hit
    (high df → near-zero idf); among equal-tf docs the SHORTER one
    scores higher (the b·dl/avgdl denominator); a doc with no query
    terms is absent from the ranking."""
    filler = _toks("z", 0, 40)
    texts = (
        ["dup " + " ".join(_toks("a", 0, 20))]          # doc1: rare hit
        + ["join filter " + " ".join(_toks("b", 0, 38))]  # doc2: common, long
        + ["join filter " + " ".join(_toks("c", 0, 8))]   # doc3: common, short
        + [" ".join(filler)]                             # doc4: no query terms
        # dilute idf for join/filter: several docs containing both
        # (6, so every query-term doc stays inside the top-10 cut)
        + [f"join filter pad{i} " + " ".join(_toks(f"d{i}_", 0, 10)) for i in range(6)]
    )
    sf_dir = _span_docs(tmp_path, texts)
    q = get("bm25_search_topk")
    rows = q.spark_fn(spark, sf_dir).collect()
    scores = {r.doc_id: r.score_micros for r in rows}
    ranked = [r.doc_id for r in sorted(rows, key=lambda r: (-r.score_micros, r.doc_id))]
    assert ranked[0] == 1, f"rare-term doc should rank first: {scores}"
    assert 4 not in scores  # no query terms, no row
    assert scores[3] > scores[2], "shorter doc with same tf must outscore longer"
    assert_parity(q.spark_fn(spark, sf_dir), q.oracle, sf_dir, "bm25/synth")


def test_span_decontaminate_cross_split_only(spark, tmp_path):
    """Span decontamination pins: evidence flows ONLY across the
    train/test boundary (train-train and test-test clones are dedup's
    business, not contamination), positions are exact, and over-cap
    boilerplate grams are excluded. Split ids are chosen by probing
    the same content-independent hash the query uses."""
    from flink_wsr_project_spark.operators.dedup import h28

    import duckdb

    # find ids per split with the oracle's own hash
    con = duckdb.connect()
    h = h28("concat('split:', CAST(doc_id AS VARCHAR))", "duckdb")
    picks = {"train": [], "test": []}
    for i in range(1, 400):
        m = con.sql(f"SELECT {h} % 100 FROM (SELECT {i} AS doc_id)").fetchall()[0][0]
        split = "train" if m < 80 else ("test" if m >= 90 else "val")
        if split != "val" and len(picks[split]) < 3:
            picks[split].append(i)
        if all(len(v) >= 3 for v in picks.values()):
            break
    tr, te = picks["train"], picks["test"]

    S = _toks("s", 0, 30)
    T = _toks("t", 0, 25)
    rows = {
        tr[0]: " ".join(S),                           # train: leaks S to test
        te[0]: " ".join(_toks("p", 0, 3) + S),        # test: holds S at pos 3
        tr[1]: " ".join(T),                           # train-train clone pair:
        tr[2]: " ".join(T),                           #   NOT contamination
        te[1]: " ".join(_toks("q", 0, 20)),           # test: clean
    }
    sf_dir = _span_docs_ids(tmp_path, rows)
    q = get("benchmark_span_decontaminate")
    got = {
        (r.test_doc, r.train_doc): (r.test_start, r.train_start, r.span_tokens)
        for r in q.spark_fn(spark, sf_dir).collect()
    }
    assert got == {(te[0], tr[0]): (3, 0, 30)}
    assert_parity(q.spark_fn(spark, sf_dir), q.oracle, sf_dir, "span_decon/synth")


def _span_docs_ids(tmp_path, rows):
    """Write documents with EXPLICIT ids from a {doc_id: text} map."""
    return _write_documents(
        tmp_path,
        [(i, t, "en", "web", len(t)) for i, t in sorted(rows.items())],
    )


def test_span_leakage_multi_span_pair(spark, tmp_path):
    """The provenance rollup pinned off the gate corpus' 1-span-per-
    pair degeneracy: two disjoint shared runs between a srcA doc and a
    srcB doc roll up to ONE (srcA, srcB) row with n_spans=2, and a
    same-source clone pair lands in a cross_source=false row."""
    A = _toks("a", 0, 16)
    B = _toks("b", 0, 18)
    C = _toks("c", 0, 20)
    sf_dir = _write_documents(
        tmp_path,
        [
            (1, " ".join(A + _toks("u", 0, 4) + B), "en", "srcA", 1),
            (2, " ".join(B + _toks("v", 0, 7) + A), "en", "srcB", 1),
            (3, " ".join(C), "en", "srcC", 1),
            (4, " ".join(C + _toks("w", 0, 2)), "en", "srcC", 1),
        ],
    )
    q = get("cross_source_span_leakage")
    rows = {
        (r.source_a, r.source_b): (r.cross_source, r.n_spans, r.leaked_tokens)
        for r in q.spark_fn(spark, sf_dir).collect()
    }
    assert rows == {
        ("srcA", "srcB"): (True, 2, 16 + 18),
        ("srcC", "srcC"): (False, 1, 20),
    }
    assert_parity(q.spark_fn(spark, sf_dir), q.oracle, sf_dir, "span_leakage/synth")


def test_span_cap_star_survives_stray_keeper_gram_copy(spark, tmp_path):
    """r13 review regression: the star arm must pair member
    occurrences with EVERY keeper occurrence of the gram, not one
    precomputed keeper position. Keeper doc1 holds a stray copy of the
    run's first 8-gram at pos 0 and the full 20-token run S at pos 12;
    docs 2-4 hold S (gram df = 4 > cap = 2, so the whole run is
    star-collapsed). A single-position star (the old code) would pull
    that gram onto the stray diagonal and shorten the keeper-side span
    to 19; the fix keeps capped == uncapped keeper claims at exactly
    20 tokens."""
    S = _toks("s", 0, 20)
    sf_dir = _span_docs(
        tmp_path,
        [
            " ".join(S[0:8] + _toks("u", 0, 4) + S),
            " ".join(S + _toks("v", 0, 3)),
            " ".join(_toks("w", 0, 2) + S),
            " ".join(S + _toks("x", 0, 5)),
        ],
    )
    qu = get("shared_span_pairs")
    qc = get("shared_span_pairs_capped")
    un = {
        (r.doc_a, r.doc_b): (r.a_start, r.b_start, r.span_tokens)
        for r in qu.spark_fn(spark, sf_dir).collect()
        if r.doc_a == 1
    }
    cp = {
        (r.doc_a, r.doc_b): (r.a_start, r.b_start, r.span_tokens)
        for r in qc.spark_fn(spark, sf_dir).collect()
        if r.doc_a == 1
    }
    assert un[(1, 2)] == (12, 0, 20)
    assert cp == un  # keeper claims preserved EXACTLY under the cap
    assert_parity(qc.spark_fn(spark, sf_dir), qc.oracle, sf_dir, "span_stray/synth")


def test_bpe_greedy_overlap_and_tiebreak(spark, tmp_path):
    """BPE learning pinned by hand on overlap-heavy words:

    * raw-bigram counting (Sennrich): 'aaaa_' contributes (a,a) THREE
      times per occurrence even though greedy merging only applies it
      twice — round 1's count is 2*3 + 1*2 = 8;
    * greedy left-to-right non-overlap: 'aaaa' merges to [aa, aa, _],
      never [aa, a, a, _] or an overlapped [aa, aa] at positions 0/1;
    * the lexicographic tie-break: round 2 has (aa, _) and (aa, aa)
      both at count 2 — '_' < 'a', so (aa, _) wins, and every later
      round inherits that choice."""
    from flink_wsr_project_spark.operators.bpe import (
        bpe_unrolled_sql,
        learn_bpe_merges,
    )
    from flink_wsr_project_spark.sources.readers import load_table

    sf_dir = _write_documents(
        tmp_path, [(1, "aaaa aaaa aaa", "en", "web", 13)]
    )
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    merges, seg = learn_bpe_merges(spark, docs, 3)
    assert merges == [
        (1, "a", "a", "aa", 8),
        (2, "aa", "_", "aa_", 2),
        (3, "aa", "aa_", "aaaa_", 2),
    ]
    segs = {r.word: list(r.syms) for r in seg.collect()}
    assert segs == {"aaaa": ["aaaa_"], "aaa": ["aa", "a", "_"]}
    seg.unpersist()

    # driver loop == unrolled Spark SQL == DuckDB oracle, all 8 rounds
    # (the loop dries up after round 5 on this corpus: [aa, a, _] gives
    # (a,_) then (aa,a_) and then nothing — both sides must agree on
    # WHERE it dries up, not just on the early rounds)
    q = get("bpe_merges_topk")
    got = [tuple(r) for r in q.spark_fn(spark, sf_dir).orderBy("merge_rank").collect()]
    docs.createOrReplaceTempView("documents")
    unrolled = [
        tuple(r)
        for r in spark.sql(bpe_unrolled_sql("spark", 8)).orderBy("merge_rank").collect()
    ]
    assert got == unrolled and len(got) == 5
    assert_parity(q.spark_fn(spark, sf_dir), q.oracle, sf_dir, "bpe/synth")


def test_bpe_merge_exhaustion_keeps_segmentation(spark, tmp_path):
    """When pair merges exhaust BEFORE the requested rounds, the
    unrolled SQL's re-segmentation CTEs must carry the LAST real
    segmentation through the empty merge rounds (LEFT JOIN ON true
    fallback) — a cross join against the empty m{r} would zero out
    s{r} and every downstream CTE, so the fertility / doc-token
    oracles would return empty while the Spark-side driver loop keeps
    the last segmentation (r14 ADVICE finding)."""
    import duckdb

    from flink_wsr_project_spark.operators.bpe import (
        bpe_doc_tokens_sql,
        bpe_fertility_sql,
        learn_bpe_merges,
    )
    from flink_wsr_project_spark.sources.readers import load_table

    # 'ab ab cd': dries after 4 merges (a+b, ab+_, c+d, cd+_) — every
    # word is then ONE symbol and no pair remains; ask for 8 rounds.
    sf_dir = _write_documents(tmp_path, [(1, "ab ab cd", "en", "web", 8)])
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    merges, seg = learn_bpe_merges(spark, docs, 8)
    assert len(merges) == 4
    driver_seg = {r.word: list(r.syms) for r in seg.collect()}
    assert driver_seg == {"ab": ["ab_"], "cd": ["cd_"]}
    seg.unpersist()

    docs.createOrReplaceTempView("documents")
    fert = spark.sql(bpe_fertility_sql("spark", 8)).collect()
    assert len(fert) == 1 and fert[0].vocab_words == 2
    assert fert[0].bpe_symbols == 3  # 2*[ab_] + 1*[cd_]

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    dfert = con.execute(bpe_fertility_sql("duckdb", 8)).fetchall()
    assert [tuple(r) for r in fert] == dfert
    dtok = con.execute(
        bpe_doc_tokens_sql("duckdb", 8) + " ORDER BY doc_id"
    ).fetchall()
    stok = [
        tuple(r)
        for r in spark.sql(bpe_doc_tokens_sql("spark", 8))
        .orderBy("doc_id")
        .collect()
    ]
    assert stok == dtok and len(stok) == 1
    con.close()


def test_bpe_batched_matches_sequential_when_counts_dominate(spark, tmp_path):
    """batch_k parity (r14 verdict task 2): on a corpus where the
    top-K compatible pairs' counts strictly dominate every pair a
    batch member CREATES, batched learning must equal the one-merge
    path exactly — same merge table (ranks, counts) and same final
    segmentation. Frequencies 10 > 8 > 6 with diversified successors
    keep created pairs (ab,p)=5 etc. below the next candidate."""
    from flink_wsr_project_spark.operators.bpe import learn_bpe_merges
    from flink_wsr_project_spark.sources.readers import load_table

    words = (
        ["abp"] * 5 + ["abq"] * 5 + ["cdr"] * 4 + ["cds"] * 4
        + ["eft"] * 3 + ["efu"] * 3
    )
    sf_dir = _write_documents(tmp_path, [(1, " ".join(words), "en", "web", 99)])
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")

    seq_merges, seq_seg = learn_bpe_merges(spark, docs, 3, batch_k=1)
    bat_merges, bat_seg = learn_bpe_merges(spark, docs, 3, batch_k=3)
    assert seq_merges == bat_merges == [
        (1, "a", "b", "ab", 10),
        (2, "c", "d", "cd", 8),
        (3, "e", "f", "ef", 6),
    ]
    seq = {r.word: list(r.syms) for r in seq_seg.collect()}
    bat = {r.word: list(r.syms) for r in bat_seg.collect()}
    assert seq == bat
    seq_seg.unpersist(), bat_seg.unpersist()


def test_bpe_batch_compatibility_rules():
    """The symbol-disjointness rule, including MERGED outputs: a
    candidate sharing lhs/rhs with an accepted rule is skipped, and so
    is one whose lhs equals an accepted rule's merged output (the
    one-pass fold would otherwise consume/produce symbols another rule
    references, diverging from sequential application)."""
    from flink_wsr_project_spark.operators.bpe import _select_compatible

    cands = [
        ("a", "b", 10),   # accepted
        ("b", "_", 9),    # shares 'b' -> skipped
        ("ab", "c", 8),   # lhs equals accepted merged 'ab' -> skipped
        ("x", "y", 7),    # accepted
        ("p", "q", 6),    # accepted (k=3 reached)
        ("r", "s", 5),
    ]
    assert _select_compatible(cands, 3) == [
        ("a", "b", 10), ("x", "y", 7), ("p", "q", 6),
    ]
    # a candidate PRODUCING an accepted rule's symbol is also skipped:
    # accepted (xy, z); candidate (x, y) merged output 'xy' collides
    assert _select_compatible([("xy", "z", 9), ("x", "y", 8), ("u", "v", 7)], 2) == [
        ("xy", "z", 9), ("u", "v", 7),
    ]
    assert _select_compatible([], 4) == []


def test_bpe_batched_skips_incompatible_and_converges(spark, tmp_path):
    """A batch round must skip an incompatible runner-up (shares a
    symbol with the leader) yet still make progress, and the learned
    vocabulary must reach the requested size across rounds."""
    from flink_wsr_project_spark.operators.bpe import learn_bpe_merges
    from flink_wsr_project_spark.sources.readers import load_table

    # 'ab'×4, 'bc'×3: round-1 candidates (a,b)=4, (b,c)=3 share 'b' —
    # the batch takes only (a,b); (b,c) must wait for round 2.
    sf_dir = _write_documents(
        tmp_path, [(1, " ".join(["ab"] * 4 + ["bc"] * 3), "en", "web", 20)]
    )
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    merges, seg = learn_bpe_merges(spark, docs, 2, batch_k=4)
    assert [(m[1], m[2]) for m in merges][:1] == [("a", "b")]
    assert len(merges) == 2
    seg.unpersist()


def test_bpe_fold_exprs_escape_quoted_symbols(spark):
    """The generated merge-fold expressions embed corpus-derived
    symbols as SQL literals; the registered queries' pre-tokenizer
    keeps [a-z0-9] only, but the operator accepts any caller frame —
    a symbol carrying an apostrophe or backslash must be escaped, not
    break the expression (r15 ADVICE; the batched path widens the
    surface to 4k+8 candidates per round)."""
    from flink_wsr_project_spark.operators.bpe import (
        _merge_batch_expr,
        _merge_pair_expr,
    )

    apos = "don't"
    bsl = "a\\b"  # the two-char symbol a\b
    df = spark.createDataFrame(
        [("w", 1, [apos, "x", bsl, "y"])],
        "word string, freq long, syms array<string>",
    )
    pair_expr = _merge_pair_expr(apos, "x") + " AS syms"
    out = df.selectExpr(pair_expr).first()
    assert out.syms == [apos + "x", bsl, "y"]
    batch_expr = _merge_batch_expr([(apos, "x", 1), (bsl, "y", 1)]) + " AS syms"
    out2 = df.selectExpr(batch_expr).first()
    assert out2.syms == [apos + "x", bsl + "y"]


def test_cosine_prenorm_bit_exact_vs_inline(spark):
    """The r16 prenorm rewrite (self-dots hoisted to per-row columns
    so pair joins fold only the cross dot) must be BIT-exact against
    the inline ``cosine_expr`` — including the zero-norm NULL guard,
    which now compares precomputed columns instead of re-folding.
    Covers: ordinary vectors, a zero vector on either side, and
    negative components (sqrt/division see identical doubles or the
    comparison is meaningless)."""
    from flink_wsr_project_spark.operators.similarity import (
        cosine_expr,
        cosine_prenorm_expr,
        dot_expr,
    )

    rows = [
        (1, [0.25, -1.5, 3.0]),
        (2, [2.0, 0.5, -0.125]),
        (3, [0.0, 0.0, 0.0]),  # zero norm -> NULL cosine
        (4, [1e-3, 7.25, 0.3]),
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).createOrReplaceTempView("cpn_vecs")
    nd = dot_expr("embedding", "embedding", "spark")
    inline = spark.sql(
        f"""SELECT a.vec_id AS va, b.vec_id AS vb,
                   {cosine_expr("a.embedding", "b.embedding", "spark")} AS c
            FROM cpn_vecs a JOIN cpn_vecs b ON a.vec_id < b.vec_id"""
    ).collect()
    pre = spark.sql(
        f"""SELECT a.vec_id AS va, b.vec_id AS vb,
                   {cosine_prenorm_expr("a.embedding", "b.embedding", "a.nd", "b.nd", "spark")} AS c
            FROM (SELECT *, {nd} AS nd FROM cpn_vecs) a
            JOIN (SELECT *, {nd} AS nd FROM cpn_vecs) b ON a.vec_id < b.vec_id"""
    ).collect()
    il = {(r.va, r.vb): r.c for r in inline}
    pr = {(r.va, r.vb): r.c for r in pre}
    assert set(il) == set(pr) and len(il) == 6
    for k in il:
        if il[k] is None:
            assert pr[k] is None, k
        else:
            # bit-exact, not approx: identical IEEE op sequence
            import struct

            assert struct.pack("<d", il[k]) == struct.pack("<d", pr[k]), k
    assert il[(1, 3)] is None and il[(3, 4)] is None
