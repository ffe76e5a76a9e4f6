"""Persisted dHash block store: incremental image dedup with the
signature store's decision contract, one denormalized table, and the
store side exchange-free. Decision parity is pinned against the
externally-oracled ``image_dhash_neardup`` pair set — the store must
reach exactly the conclusions the one-statement query's pairs imply.
"""

from __future__ import annotations

import shutil

import pandas as pd
from pyspark.sql import functions as F

from flink_wsr_project_spark.operators.image_dedup import (
    absorb_kept_into_dhash_store,
    dhash_block_skew,
    image_dedup_from_store,
    write_dhash_store,
)
from flink_wsr_project_spark.operators.multimodal import synthesize_image_renders
from flink_wsr_project_spark.plans.registry import get
from tests.conftest import SF_DIR
from tests.test_writers import _assert_store_unshuffled


def _drop(spark, prefix):
    spark.sql(f"DROP TABLE IF EXISTS {prefix}_blocks")
    shutil.rmtree(f"spark-warehouse/{prefix}_blocks", ignore_errors=True)


def test_store_decisions_match_registered_pair_set(spark):
    """Split the corpus the dedup_incremental way (asset_id % 3 = 2 is
    the batch); the store's decisions must equal what the registered
    query's verified pairs imply under the decision contract (corpus
    claims outrank batch claims, smallest partner wins). Also pins the
    store side of the probe as exchange-free with auto-broadcast off —
    the (blk, bv) full-key bucketing at work."""
    _drop(spark, "imgst")
    assets = synthesize_image_renders(spark, SF_DIR)
    corpus = assets.where(~F.expr("asset_id % 3 = 2"))
    batch = assets.where(F.expr("asset_id % 3 = 2"))

    write_dhash_store(spark, corpus, "imgst", num_buckets=4)
    got = {
        (r.asset_id, r.decision, r.dup_of)
        for r in image_dedup_from_store(spark, batch, "imgst").collect()
    }

    pairs = [
        (r.doc_a, r.doc_b)
        for r in get("image_dhash_neardup").spark_fn(spark, SF_DIR).collect()
    ]
    in_batch = {a for a, _, _ in got}
    expected = set()
    for a in in_batch:
        corpus_p = {
            (y if x == a else x)
            for x, y in pairs
            if a in (x, y) and (y if x == a else x) not in in_batch
        }
        batch_p = {x for x, y in pairs if y == a and x in in_batch}
        if corpus_p:
            expected.add((a, "dup_of_corpus", min(corpus_p)))
        elif batch_p:
            expected.add((a, "dup_within_batch", min(batch_p)))
        else:
            expected.add((a, "keep", None))
    assert got == expected
    # non-degenerate at this SF: both reachable branches fire (the
    # within-batch branch needs a crafted corpus — covered below)
    counts = {d: sum(1 for _, dd, _ in got if dd == d) for d in
              ("keep", "dup_of_corpus")}
    assert counts["keep"] > 0 and counts["dup_of_corpus"] > 0

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        _assert_store_unshuffled(
            image_dedup_from_store(spark, batch, "imgst"), "imgst"
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_dhash_bmp_row_stride_padding(spark):
    """ADVICE r11: 24 bpp BMP rows pad to 4-byte boundaries — the
    decoder must step by ``((3w+3)//4)·4``, not ``3w``. Two images
    with IDENTICAL pixels but different PADDING bytes must hash
    identically (a stride-ignorant decoder reads the padding as
    pixels), and the hash must equal the one computed independently
    from the pixel MATRIX."""
    import struct

    from flink_wsr_project_spark.operators.multimodal import extract_image_dhash

    w, h = 5, 8  # width NOT a multiple of 4 -> stride 16, 1 pad byte
    stride = (3 * w + 3) // 4 * 4
    px = [[(37 * x + 11 * y) % 251 for x in range(w)] for y in range(h)]

    def bmp(pad_byte: int) -> bytes:
        body = b"".join(
            b"".join(bytes([px[y][x]] * 3) for x in range(w))
            + bytes([pad_byte]) * (stride - 3 * w)
            for y in range(h)
        )
        return (
            b"BM"
            + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
            + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 0, 0, 0, 0)
            + body
        )

    expected = 0
    for gy in range(8):
        y = min(gy * h // 8, h - 1)
        for c in range(1, 9):
            left = px[y][min((c - 1) * w // 9, w - 1)] * 3
            right = px[y][min(c * w // 9, w - 1)] * 3
            if right > left:
                expected |= 1 << (gy * 8 + (c - 1))
    if expected >= 1 << 63:
        expected -= 1 << 64

    df = spark.createDataFrame(
        [(1, bytearray(bmp(0x00))), (2, bytearray(bmp(0xFF)))],
        "asset_id long, payload binary",
    )
    got = {r.asset_id: r.dhash for r in extract_image_dhash(df).collect()}
    assert got[1] == got[2] == expected


def test_store_bucket_cap_star_collapses_and_never_invents(spark, tmp_path):
    """The skew valve: with an over-cap store bucket (3 clones share
    every block), a probing clone is claimed through the STAR arm
    against the bucket-min representative; a far probe stays keep.
    Against the real corpus, capped dup claims must be a SUBSET of the
    exact path's (the cap only bounds, never invents — every star row
    is Hamming-verified), and a giant cap reproduces the exact
    decisions bit-for-bit. The store stays exchange-free with the cap
    on (the stats agg groups by the bucket keys; only the per-bucket
    rollup broadcasts)."""
    B = ("zero nine eight seven six five four three two one plus minus"
         " times divided equals approximately infinity sum product union")
    C = ("qq ww ee rr tt yy uu ii oo pp aa ss dd ff gg hh jj kk ll zz"
         " xx cc vv bb nn mm 11 22 33 44 55 66 77 88 99 00 ab cd ef gh")

    def render(rows):
        pdf = pd.DataFrame(
            rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
        )
        d = tmp_path / f"cap_{rows[0][0]}"
        d.mkdir(exist_ok=True)
        pdf.to_parquet(d / "documents.parquet", index=False)
        return synthesize_image_renders(spark, str(d))

    _drop(spark, "imgcap")
    # corpus: docs 3/7/11 all render B at width 16 -> identical hashes,
    # every (blk, bv) bucket they occupy has n=3 (> cap=2)
    write_dhash_store(
        spark,
        render([(3, B, "en", "s", len(B)), (7, B, "en", "s", len(B)),
                (11, B, "en", "s", len(B))]),
        "imgcap", num_buckets=4,
    )
    probe = render([(15, B, "en", "s", len(B)), (19, C, "en", "s", len(C))])
    capped = image_dedup_from_store(spark, probe, "imgcap", bucket_cap=2)
    got = {r.asset_id: (r.decision, r.dup_of) for r in capped.collect()}
    # star arm: claimed by the bucket-min representative
    assert got == {15: ("dup_of_corpus", 3), 19: ("keep", None)}

    # skew report: every bucket the clones occupy is over-cap; star
    # rows replace 3 enumerated pairs with 2 per bucket -> saved > 0
    skew = {r.blk: r for r in dhash_block_skew(spark, "imgcap", bucket_cap=2).collect()}
    assert set(skew) == {0, 1, 2, 3}
    assert all(s.max_bucket == 3 and s.buckets_capped >= 1 for s in skew.values())
    # per over-cap bucket of n=3: 3 enumerated pairs - 2 star rows = 1 saved
    assert all(s.pairs_saved == s.buckets_capped * 1 for s in skew.values())

    # exchange-free with the cap on
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        _assert_store_unshuffled(
            image_dedup_from_store(spark, probe, "imgcap", bucket_cap=2), "imgcap"
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))

    # real-corpus subset/equality relationships
    _drop(spark, "imgcap2")
    assets = synthesize_image_renders(spark, SF_DIR)
    corpus = assets.where(~F.expr("asset_id % 3 = 2"))
    batch = assets.where(F.expr("asset_id % 3 = 2"))
    write_dhash_store(spark, corpus, "imgcap2", num_buckets=4)
    exact = {r.asset_id: (r.decision, r.dup_of)
             for r in image_dedup_from_store(spark, batch, "imgcap2").collect()}
    capped2 = {r.asset_id: (r.decision, r.dup_of)
               for r in image_dedup_from_store(
                   spark, batch, "imgcap2", bucket_cap=2).collect()}
    huge = {r.asset_id: (r.decision, r.dup_of)
            for r in image_dedup_from_store(
                spark, batch, "imgcap2", bucket_cap=10**6).collect()}
    assert huge == exact
    for a, (dec, _) in capped2.items():
        if dec != "keep":
            assert exact[a][0] != "keep", f"{a}: cap invented a dup claim"


def test_block_store_serves_audio_via_extractor(spark):
    """The block store is 64-bit-hash-agnostic: written with the audio
    windowed-energy fingerprint it runs the SAME incremental dedup
    contract over WAV clips — decisions must match what the registered
    ``audio_fp_neardup`` pair set implies; a probe or absorb with the
    WRONG extractor is rejected from the catalog-recorded identity
    (hashes from different extractors never match, so the mismatch
    would otherwise be silent garbage); replayed absorbs stay
    idempotent."""
    import pytest

    from flink_wsr_project_spark.operators.multimodal import (
        extract_audio_fingerprint,
        synthesize_audio_renders,
    )

    _drop(spark, "audst")
    assets = synthesize_audio_renders(spark, SF_DIR)
    corpus = assets.where(~F.expr("asset_id % 3 = 2"))
    batch = assets.where(F.expr("asset_id % 3 = 2"))
    write_dhash_store(
        spark, corpus, "audst", num_buckets=4, extractor=extract_audio_fingerprint
    )

    got = {
        (r.asset_id, r.decision, r.dup_of)
        for r in image_dedup_from_store(
            spark, batch, "audst", extractor=extract_audio_fingerprint
        ).collect()
    }
    pairs = [
        (r.doc_a, r.doc_b)
        for r in get("audio_fp_neardup").spark_fn(spark, SF_DIR).collect()
    ]
    in_batch = {a for a, _, _ in got}
    expected = set()
    for a in in_batch:
        corpus_p = {
            (y if x == a else x)
            for x, y in pairs
            if a in (x, y) and (y if x == a else x) not in in_batch
        }
        batch_p = {x for x, y in pairs if y == a and x in in_batch}
        if corpus_p:
            expected.add((a, "dup_of_corpus", min(corpus_p)))
        elif batch_p:
            expected.add((a, "dup_within_batch", min(batch_p)))
        else:
            expected.add((a, "keep", None))
    assert got == expected
    assert {d for _, d, _ in got} >= {"keep"}  # decisions exist

    # wrong extractor (the image default) dies loudly, probe AND absorb
    with pytest.raises(ValueError, match="extract_audio_fingerprint"):
        image_dedup_from_store(spark, batch, "audst")
    dec = image_dedup_from_store(
        spark, batch, "audst", extractor=extract_audio_fingerprint
    )
    with pytest.raises(ValueError, match="extract_audio_fingerprint"):
        absorb_kept_into_dhash_store(spark, batch, dec, "audst", num_buckets=4)

    # absorb + replay idempotency on the audio hash
    n = absorb_kept_into_dhash_store(
        spark, batch, dec, "audst", num_buckets=4,
        extractor=extract_audio_fingerprint,
    )
    assert n == sum(1 for _, d, _ in got if d == "keep")
    assert absorb_kept_into_dhash_store(
        spark, batch, dec, "audst", num_buckets=4, exclude_existing=True,
        extractor=extract_audio_fingerprint,
    ) == 0


def test_block_store_serves_video_via_extractor(spark):
    """The third member of the extractor-agnostic claim (VERDICT r12
    #2 — audio had this test, video only an assertion): written with
    the video temporal fingerprint, the SAME block store runs the
    incremental dedup contract over Y4M clips — decisions must match
    what the registered ``video_fp_neardup`` pair set implies; the
    wrong extractor is rejected from the catalog identity; absorb +
    replay stay idempotent on the video hash."""
    import pytest

    from flink_wsr_project_spark.operators.multimodal import (
        extract_video_fingerprint,
        synthesize_video_renders,
    )

    _drop(spark, "vidst")
    assets = synthesize_video_renders(spark, SF_DIR)
    corpus = assets.where(~F.expr("asset_id % 3 = 2"))
    batch = assets.where(F.expr("asset_id % 3 = 2"))
    write_dhash_store(
        spark, corpus, "vidst", num_buckets=4, extractor=extract_video_fingerprint
    )

    got = {
        (r.asset_id, r.decision, r.dup_of)
        for r in image_dedup_from_store(
            spark, batch, "vidst", extractor=extract_video_fingerprint
        ).collect()
    }
    pairs = [
        (r.doc_a, r.doc_b)
        for r in get("video_fp_neardup").spark_fn(spark, SF_DIR).collect()
    ]
    in_batch = {a for a, _, _ in got}
    expected = set()
    for a in in_batch:
        corpus_p = {
            (y if x == a else x)
            for x, y in pairs
            if a in (x, y) and (y if x == a else x) not in in_batch
        }
        batch_p = {x for x, y in pairs if y == a and x in in_batch}
        if corpus_p:
            expected.add((a, "dup_of_corpus", min(corpus_p)))
        elif batch_p:
            expected.add((a, "dup_within_batch", min(batch_p)))
        else:
            expected.add((a, "keep", None))
    assert got == expected
    assert {d for _, d, _ in got} >= {"keep"}

    # wrong extractor (the image default) dies loudly, probe AND absorb
    with pytest.raises(ValueError, match="extract_video_fingerprint"):
        image_dedup_from_store(spark, batch, "vidst")
    dec = image_dedup_from_store(
        spark, batch, "vidst", extractor=extract_video_fingerprint
    )
    with pytest.raises(ValueError, match="extract_video_fingerprint"):
        absorb_kept_into_dhash_store(spark, batch, dec, "vidst", num_buckets=4)

    # absorb + replay idempotency on the video hash
    n = absorb_kept_into_dhash_store(
        spark, batch, dec, "vidst", num_buckets=4,
        extractor=extract_video_fingerprint,
    )
    assert n == sum(1 for _, d, _ in got if d == "keep")
    assert absorb_kept_into_dhash_store(
        spark, batch, dec, "vidst", num_buckets=4, exclude_existing=True,
        extractor=extract_video_fingerprint,
    ) == 0


def test_store_identity_gate_hard_fails(spark):
    """ADVICE r12 (medium): a store with NO recorded identity — pre-r13
    store or an interrupted write — must fail probes/absorbs loudly
    instead of silently matching nothing (the old name-only check
    passed on absence, so an old-scheme store probed with new-scheme
    hashes decided 'keep' for every true dup). Same for a matching
    extractor NAME under a different recorded hash FORMAT — exactly
    the r11→r12 32-bit→64-bit scenario the format stamp exists for."""
    import pytest

    from flink_wsr_project_spark.operators.image_dedup import (
        EXTRACTOR_PROP,
        HASH_FORMAT_PROP,
    )

    _drop(spark, "imgid")
    assets = synthesize_image_renders(spark, SF_DIR).limit(30)
    write_dhash_store(spark, assets, "imgid", num_buckets=2)
    # the healthy store probes fine
    image_dedup_from_store(spark, assets.limit(5), "imgid").collect()

    # strip the identity → every probe/absorb path refuses
    spark.sql(
        f"ALTER TABLE imgid_blocks UNSET TBLPROPERTIES "
        f"('{EXTRACTOR_PROP}', '{HASH_FORMAT_PROP}')"
    )
    with pytest.raises(ValueError, match="no recorded hash identity"):
        image_dedup_from_store(spark, assets.limit(5), "imgid")

    # same extractor name, older recorded format → refused with the
    # format names in the message
    spark.sql(
        f"ALTER TABLE imgid_blocks SET TBLPROPERTIES "
        f"('{EXTRACTOR_PROP}'='extract_image_dhash', "
        f"'{HASH_FORMAT_PROP}'='h32b8v0')"
    )
    with pytest.raises(ValueError, match="h32b8v0"):
        image_dedup_from_store(spark, assets.limit(5), "imgid")


def test_pruned_image_probe_matches_full_on_partitioned_store(spark, tmp_path):
    """The small-Δ fast path for images (the signature store's pruned
    probe applied to the dHash block store): decision-for-decision
    equality with the full probe on the %3 split, directory-level
    pruning visible in the plan (bp IN-list PartitionFilters, fewer
    input directories than the store holds), broadcast Δ side, capped
    variant agreeing with the full capped probe, absorb matching the
    partitioned layout, and the GENERIC compactor preserving both the
    bucket spec and the spark_graft layout property across its swap
    (a rewrite that dropped it would silently demote the store to
    bucketed-only)."""
    from flink_wsr_project_spark.operators.image_dedup import (
        BLOCK_PARTITIONS_PROP,
        _store_block_partitions,
        image_dedup_from_store_pruned,
    )
    from flink_wsr_project_spark.sources.writers import (
        compact_bucketed_table,
        table_bucket_spec,
        table_data_file_stats,
    )

    _drop(spark, "imgpr")
    assets = synthesize_image_renders(spark, SF_DIR)
    corpus = assets.where(~F.expr("asset_id % 3 = 2"))
    batch = assets.where(F.expr("asset_id % 3 = 2"))
    write_dhash_store(spark, corpus, "imgpr", num_buckets=2, hash_partitions=16)
    assert _store_block_partitions(spark, "imgpr") == 16

    want = {(r.asset_id, r.decision, r.dup_of)
            for r in image_dedup_from_store(spark, batch, "imgpr").collect()}
    got_df = image_dedup_from_store_pruned(spark, batch, "imgpr")
    got = {(r.asset_id, r.decision, r.dup_of) for r in got_df.collect()}
    assert got == want and {d for _, d, _ in got} >= {"keep", "dup_of_corpus"}

    # one-image probe: bp partition filter prunes directories
    one = assets.where("asset_id = 2")
    one_df = image_dedup_from_store_pruned(spark, one, "imgpr")
    plan = one_df._jdf.queryExecution().executedPlan().toString()
    scan = [ln for ln in plan.splitlines()
            if "imgpr_blocks" in ln and "PartitionFilters" in ln]
    assert scan and any("bp" in ln for ln in scan), plan
    store_dirs = {f.rsplit("/", 2)[1]
                  for f in spark.table("imgpr_blocks").inputFiles()}
    read_dirs = {f.rsplit("/", 2)[1] for f in one_df.inputFiles()
                 if "imgpr_blocks" in f}
    assert len(read_dirs) <= 4 < len(store_dirs)
    assert "BroadcastHashJoin" in plan

    # capped pruned == capped full (bucket stats exact over the slice)
    want_cap = {(r.asset_id, r.decision, r.dup_of)
                for r in image_dedup_from_store(
                    spark, batch, "imgpr", bucket_cap=2).collect()}
    got_cap = {(r.asset_id, r.decision, r.dup_of)
               for r in image_dedup_from_store_pruned(
                   spark, batch, "imgpr", bucket_cap=2).collect()}
    assert got_cap == want_cap

    # absorb follows the partitioned layout; generic compaction keeps
    # the property AND the pruned probe working
    dec = image_dedup_from_store(spark, batch, "imgpr")
    n = absorb_kept_into_dhash_store(spark, batch, dec, "imgpr", num_buckets=2)
    assert n > 0
    compact_bucketed_table(spark, "imgpr_blocks")
    assert _store_block_partitions(spark, "imgpr") == 16
    assert table_bucket_spec(spark, "imgpr_blocks") == (2, ["blk", "bv"])
    n_files, n_dirs = table_data_file_stats(spark, "imgpr_blocks")
    assert n_files <= 2 * n_dirs
    replay = {(r.asset_id, r.decision) for r in
              image_dedup_from_store_pruned(spark, one, "imgpr").collect()}
    # the absorbed asset 2 now matches ITSELF-excluded partners only;
    # it was kept pre-absorb, so replay sees it as keep or a dup of a
    # smaller absorbed partner — assert the probe still runs pruned
    # and returns exactly one decision row
    assert len(replay) == 1

    # a bucketed-only store rejects the pruned probe with guidance
    import pytest
    _drop(spark, "imgbo")
    write_dhash_store(spark, one, "imgbo", num_buckets=2)
    with pytest.raises(ValueError, match="not hash-partitioned"):
        image_dedup_from_store_pruned(spark, one, "imgbo")


def test_dhash_store_absorb_lifecycle(spark, tmp_path):
    """Day-over-day growth with the within-batch branch exercised:
    day-1 has an in-batch clone pair (same text, same width class →
    identical hash) — keeper kept, clone claimed within-batch; after
    absorbing the kept images, day-2 clones of BOTH the day-1 keeper
    and the original corpus come back dup_of_corpus of the right
    partners; a replayed absorb with exclude_existing appends
    nothing."""
    A = ("alpha bravo charlie delta echo foxtrot golf hotel india juliet"
         " kilo lima mike november oscar papa quebec romeo sierra tango")
    B = ("zero nine eight seven six five four three two one plus minus"
         " times divided equals approximately infinity sum product union")

    def render(rows):
        pdf = pd.DataFrame(
            rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
        )
        d = tmp_path / f"imgs_{rows[0][0]}"
        d.mkdir(exist_ok=True)
        pdf.to_parquet(d / "documents.parquet", index=False)
        return synthesize_image_renders(spark, str(d))

    _drop(spark, "imgabs")
    # corpus: doc 3 renders B at width 16 (3 % 4 = 3)
    write_dhash_store(spark, render([(3, B, "en", "s", len(B))]), "imgabs",
                      num_buckets=4)

    # day 1: docs 2 and 6 both render A at width 12 (2 % 4 == 6 % 4)
    day1 = render([(2, A, "en", "s", len(A)), (6, A, "en", "s", len(A))])
    dec1 = image_dedup_from_store(spark, day1, "imgabs")
    got1 = {r.asset_id: (r.decision, r.dup_of) for r in dec1.collect()}
    assert got1 == {2: ("keep", None), 6: ("dup_within_batch", 2)}
    assert absorb_kept_into_dhash_store(spark, day1, dec1, "imgabs",
                                        num_buckets=4) == 1

    # day 2: doc 10 clones day-1's absorbed keeper (A, width 12);
    # doc 7 clones the original corpus (B, width 16)
    day2 = render([(10, A, "en", "s", len(A)), (7, B, "en", "s", len(B))])
    dec2 = image_dedup_from_store(spark, day2, "imgabs")
    got2 = {r.asset_id: (r.decision, r.dup_of) for r in dec2.collect()}
    assert got2 == {10: ("dup_of_corpus", 2), 7: ("dup_of_corpus", 3)}

    # nothing kept on day 2 → absorb is 0; replaying day 1's absorb
    # with exclude_existing is also 0 (idempotent under replay)
    assert absorb_kept_into_dhash_store(spark, day2, dec2, "imgabs",
                                        num_buckets=4) == 0
    assert absorb_kept_into_dhash_store(
        spark, day1, dec1, "imgabs", num_buckets=4, exclude_existing=True
    ) == 0
    # exactly the corpus image + the one kept image, 4 block rows each
    assert spark.table("imgabs_blocks").count() == 2 * 4


def test_image_dedup_loop_compacts_and_generic_compactor_preserves(spark, tmp_path):
    """The continuous loop (streaming/dedup.py::image_dedup_foreach_batch):
    decisions sink per batch, kept images absorb idempotently, and the
    generic catalog-driven compactor keeps the single block table's
    file count bounded by the dial after every batch — with probe
    decisions preserved across compactions and the bucket spec intact."""
    from flink_wsr_project_spark.sources.writers import (
        should_compact,
        table_bucket_spec,
        table_data_file_stats,
    )
    from flink_wsr_project_spark.streaming.dedup import image_dedup_foreach_batch

    def render(rows):
        pdf = pd.DataFrame(
            rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
        )
        d = tmp_path / f"loop_{rows[0][0]}"
        d.mkdir(exist_ok=True)
        pdf.to_parquet(d / "documents.parquet", index=False)
        return synthesize_image_renders(spark, str(d))

    import hashlib

    def txt(i):
        # md5-derived, mutually far in dHash space. All loop ids sit in
        # the widest render class (id % 4 == 3 → w=16): a 4-px-wide
        # image has only 3 informative difference bits per row, so
        # "distinct" texts can still collide within Hamming 3 — the
        # wide class gives the full 8 bits/row (checked offline: no
        # pair of these ids is within Hamming 3).
        h = hashlib.md5(f"imgloop{i}".encode()).hexdigest() * 8
        return " ".join(h[k * 6 : (k + 1) * 6] for k in range(30))

    _drop(spark, "imgloop")
    write_dhash_store(spark, render([(3, txt(3), "en", "s", 1)]), "imgloop",
                      num_buckets=2)

    seen = []
    body = image_dedup_foreach_batch(
        "imgloop", lambda d, i: seen.append(
            {r.asset_id: r.decision for r in d.collect()}),
        num_buckets=2, max_files_per_bucket=2,
    )
    days = [7, 11, 15, 19, 23, 27]
    for n, day in enumerate(days, start=1):
        body(render([(day, txt(day), "en", "s", 1)]), n)
        n_files, _ = table_data_file_stats(spark, "imgloop_blocks")
        assert n_files <= 2 * 2, f"day {day}: {n_files} files"
    assert should_compact(spark, "imgloop_blocks", max_files_per_bucket=2) is False
    assert table_bucket_spec(spark, "imgloop_blocks") == (2, ["blk", "bv"])
    assert all(list(d.values()) == ["keep"] for d in seen) and len(seen) == 6

    # every absorbed image is probe-visible after the compactions:
    # 99 renders day-23's text in the same width class → exact clone
    got = {
        (r.asset_id, r.decision, r.dup_of)
        for r in image_dedup_from_store(
            spark, render([(99, txt(23), "en", "s", 1)]), "imgloop"
        ).collect()
    }
    assert got == {(99, "dup_of_corpus", 23)}
