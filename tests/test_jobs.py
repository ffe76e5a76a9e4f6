"""End-to-end reference-job parity: each job in jobs.py runs against
fixture-format files (FIXTURES.md shapes) with planted patterns and
must reproduce the reference job's documented outputs."""

from __future__ import annotations

import pytest

from flink_wsr_project_spark import jobs

_T0 = 1511658000  # epoch anchor used by the reference's sample CSVs


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("ref_fixtures")

    # UserBehavior.csv — item 1715 planted as hourly top item (5 pv),
    # item 2244 second (3 pv), buys must be ignored
    ub = []
    for i in range(5):
        ub.append(f"{100 + i},1715,14,pv,{_T0 + 60 * i}")
    for i in range(3):
        ub.append(f"{200 + i},2244,14,pv,{_T0 + 60 * i}")
    ub.append(f"300,9999,14,buy,{_T0 + 60}")
    ub.append(f"301,1111,14,pv,{_T0 + 7200}")  # second hour
    (d / "UserBehavior.csv").write_text("\n".join(ub))

    # apache.log — /hot planted top URL
    logs = []
    for i in range(4):
        logs.append(f"83.149.9.216 - - 17/05/2015:10:05:{i:02d} +0000 GET /hot")
    logs.append("83.149.9.217 - - 17/05/2015:10:05:10 +0000 GET /cold")
    (d / "apache.log").write_text("\n".join(logs))

    # AdClickLog.csv — user 937166 clicks ad 1715 5× in one day
    ad = [f"937166,1715,beijing,beijing,{_T0 + 10 * i}" for i in range(5)]
    ad.append(f"100001,2244,guangdong,shenzhen,{_T0}")
    (d / "AdClickLog.csv").write_text("\n".join(ad))

    # LoginLog.csv — user 1035: 2 fails 1 s apart (warning);
    # user 1036: fails 3 s apart (no); user 1037: fail,success,fail (no)
    login = [
        f"1035,83.149.9.216,fail,{_T0}",
        f"1035,83.149.9.216,fail,{_T0 + 1}",
        f"1036,10.2.3.14,fail,{_T0}",
        f"1036,10.2.3.14,fail,{_T0 + 3}",
        f"1037,10.2.3.15,fail,{_T0}",
        f"1037,10.2.3.15,success,{_T0 + 1}",
        f"1037,10.2.3.15,fail,{_T0 + 2}",
    ]
    (d / "LoginLog.csv").write_text("\n".join(login))

    # OrderLog.csv — all four C4 outcomes + tx ids for the J1/J2 join
    order = [
        f"1,create,,{_T0}",
        f"1,pay,txA,{_T0 + 10}",          # payed successfully
        f"2,create,,{_T0}",
        f"2,pay,txB,{_T0 + 2000}",        # payed but already timeout
        f"3,create,,{_T0}",               # order timeout
        f"4,pay,txD,{_T0 + 5}",           # payed without create
    ]
    (d / "OrderLog.csv").write_text("\n".join(order))

    # ReceiptLog.csv — txA matches (+2 s), txB receipt too late (+9 s),
    # txZ receipt-only
    receipt = [
        f"txA,wechat,{_T0 + 12}",
        f"txB,alipay,{_T0 + 2009}",
        f"txZ,alipay,{_T0 + 100}",
    ]
    (d / "ReceiptLog.csv").write_text("\n".join(receipt))
    return d


def test_hot_items_job(spark, fixture_dir):
    out = jobs.hot_items(spark, str(fixture_dir / "UserBehavior.csv"))
    top = {
        (r.window_end, r.rank): (r.item_id, r.cnt) for r in out.collect()
    }
    # the first full-hour window ending at T0+3600 ranks 1715 > 2244
    we = ((_T0 // 300) * 300) + 3600
    assert top[(we, 1)] == (1715, 5)
    assert top[(we, 2)] == (2244, 3)
    # buy rows never counted
    assert all(item != 9999 for item, _ in top.values())


def test_hot_pages_job(spark, fixture_dir):
    out = jobs.hot_pages(spark, str(fixture_dir / "apache.log")).collect()
    assert any(r.url == "/hot" and r.rank == 1 and r.cnt == 4 for r in out)
    # /hot outranks /cold in every window where it appears
    by_window: dict[int, dict[str, int]] = {}
    for r in out:
        by_window.setdefault(r.window_end, {})[r.url] = r.rank
    assert any("/hot" in urls for urls in by_window.values())
    for urls in by_window.values():
        if "/hot" in urls:
            assert urls["/hot"] == 1


def test_page_view_and_uv_jobs(spark, fixture_dir):
    pv = jobs.page_view(spark, str(fixture_dir / "UserBehavior.csv")).collect()
    assert {(r.window_end, r.cnt) for r in pv} == {(_T0 + 3600, 8), (_T0 + 10800, 1)}
    uv = jobs.unique_visitor(spark, str(fixture_dir / "UserBehavior.csv")).collect()
    assert {(r.window_end, r.uv) for r in uv} == {(_T0 + 3600, 8), (_T0 + 10800, 1)}
    uv_approx = jobs.unique_visitor(
        spark, str(fixture_dir / "UserBehavior.csv"), approx=True
    ).collect()
    # HLL at rsd=0.01 is exact at this cardinality
    assert {(r.window_end, r.uv) for r in uv_approx} == {(_T0 + 3600, 8), (_T0 + 10800, 1)}


def test_ad_analysis_blacklist_job(spark, fixture_dir):
    out = jobs.ad_analysis_by_province(
        spark, str(fixture_dir / "AdClickLog.csv"), click_threshold=3
    )
    warnings = out["warnings"].collect()
    assert len(warnings) == 1
    assert (warnings[0].user_id, warnings[0].ad_id) == (937166, 1715)
    # filtered stream keeps threshold clicks for the hot user + 1 normal
    assert out["filtered"].count() == 4
    # counts only see filtered clicks
    total = sum(r.cnt for r in out["counts"].filter("province = 'beijing'").collect())
    assert total > 0


def test_login_fail_job(spark, fixture_dir):
    out = jobs.login_fail_warnings(spark, str(fixture_dir / "LoginLog.csv")).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.user_id, r.first_fail_ts, r.last_fail_ts) == (1035, _T0, _T0 + 1)


def test_order_timeout_job(spark, fixture_dir):
    out = jobs.order_timeout_results(spark, str(fixture_dir / "OrderLog.csv"))
    got = {r.order_id: r.result_msg for r in out.collect()}
    assert got == {
        1: "payed successfully",
        2: "payed but already timeout",
        3: "order timeout",
        4: "already payed but not found created log",
    }


def test_tx_match_job(spark, fixture_dir):
    out = jobs.tx_match(
        spark, str(fixture_dir / "OrderLog.csv"), str(fixture_dir / "ReceiptLog.csv")
    )
    matched = {(r.tx_id, r.pay_channel) for r in out["matched"].collect()}
    assert matched == {("txA", "wechat")}
    assert {r.tx_id for r in out["unmatched_pays"].collect()} == {"txB", "txD"}
    assert {r.tx_id for r in out["unmatched_receipts"].collect()} == {"txB", "txZ"}


def test_hot_items_stream_matches_batch(spark, fixture_dir, tmp_path):
    """The streaming form of the flagship converges to the batch answer
    once all input is consumed."""
    import shutil

    d = tmp_path / "ub_stream"
    d.mkdir()
    shutil.copy(fixture_dir / "UserBehavior.csv", d / "part1.csv")

    collected: dict[tuple, tuple] = {}

    def sink(ranked, epoch_id):
        for r in ranked.collect():
            collected[(r.window_end, r.rank)] = (r.item_id, r.cnt)

    q = jobs.hot_items_stream(spark, str(d), sink)
    q.processAllAvailable()
    q.stop()

    batch = jobs.hot_items(spark, str(fixture_dir / "UserBehavior.csv"))
    want = {(r.window_end, r.rank): (r.item_id, r.cnt) for r in batch.collect()}
    assert collected == want and len(want) > 0


def test_unique_visitor_stream_job(spark, fixture_dir, tmp_path):
    """UniqueVisitor_03 end-to-end: CSV-dir stream → per-element Bloom
    UV emissions; one row per pv element, final count = exact distinct
    pv users of the fixture hour."""
    import shutil

    d = tmp_path / "uv_csv_dir"
    d.mkdir()
    shutil.copy(fixture_dir / "UserBehavior.csv", d / "part1.csv")
    rows = []

    def sink(batch_df, epoch_id):
        rows.extend((r.window_end, r.user_id, r.uv) for r in batch_df.collect())

    q = jobs.unique_visitor_stream(spark, str(d), sink)
    q.processAllAvailable()
    q.stop()

    # fixture: 8 pv in hour 1 (8 distinct users) + 1 pv in a later hour
    assert len(rows) == 9
    by_we: dict[int, list[int]] = {}
    for we, _u, uv in rows:
        by_we.setdefault(we, []).append(uv)
    uvs = sorted(by_we.items())
    assert [max(v) for _, v in uvs] == [8, 1]
    assert sorted(by_we[uvs[0][0]]) == list(range(1, 9))  # per-element fires
