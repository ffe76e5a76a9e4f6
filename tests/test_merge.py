"""MERGE / upsert semantics (operators/merge.py) — the warehouse CDC
apply core. Covers all four decisions (kept / insert / update /
delete), latest-change-wins collapse, and the delete-even-when-absent
contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_wsr_project_spark.operators.merge import merge_upsert


def _base(spark):
    return spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], ["k", "name", "v"]
    )


def test_merge_insert_update_kept(spark):
    changes = spark.createDataFrame(
        [(2, "b2", 21), (4, "d", 40)], ["k", "name", "v"]
    )
    got = {
        r.k: (r.name, r.v, r.op)
        for r in merge_upsert(_base(spark), changes, ["k"], ["v"]).collect()
    }
    assert got == {
        1: ("a", 10, "kept"),
        2: ("b2", 21, "update"),
        3: ("c", 30, "kept"),
        4: ("d", 40, "insert"),
    }


def test_merge_latest_change_wins(spark):
    # two changes for k=2: the one with the larger order_by column wins
    changes = spark.createDataFrame(
        [(2, "old", 98), (2, "new", 99)], ["k", "name", "v"]
    )
    got = {
        r.k: (r.name, r.op)
        for r in merge_upsert(_base(spark), changes, ["k"], ["v"]).collect()
    }
    assert got[2] == ("new", "update")


def test_merge_delete_removes_existing_key(spark):
    # CDC-style op column: the predicate reads the change row's NATURAL
    # column name, pre-rename
    changes = spark.createDataFrame(
        [(2, "DELETE", 0), (4, "d", 40)], ["k", "name", "v"]
    )
    out = merge_upsert(
        _base(spark), changes, ["k"], ["v"],
        delete_predicate=F.col("name") == "DELETE",
    )
    got = {r.k: r.op for r in out.collect()}
    assert 2 not in got  # deleted outright, no tombstone row
    assert got == {1: "kept", 3: "kept", 4: "insert"}


def test_merge_delete_of_absent_key_is_noop(spark):
    changes = spark.createDataFrame([(99, "DELETE", 0)], ["k", "name", "v"])
    out = merge_upsert(
        _base(spark), changes, ["k"], ["v"],
        delete_predicate=F.col("name") == "DELETE",
    )
    got = {r.k: r.op for r in out.collect()}
    assert got == {1: "kept", 2: "kept", 3: "kept"}


def test_merge_delete_wins_over_earlier_update(spark):
    # k=2 gets an update then a later delete: the delete (latest) wins
    changes = spark.createDataFrame(
        [(2, "b2", 1), (2, "DELETE", 2)], ["k", "name", "v"]
    )
    out = merge_upsert(
        _base(spark), changes, ["k"], ["v"],
        delete_predicate=F.col("name") == "DELETE",
    )
    assert 2 not in {r.k for r in out.collect()}


def test_merge_null_predicate_is_not_a_delete(spark):
    changes = spark.createDataFrame(
        [(2, None, 21)], "k long, name string, v long"
    )
    out = merge_upsert(
        _base(spark), changes, ["k"], ["v"],
        delete_predicate=F.col("name") == "DELETE",  # NULL name → NULL predicate
    )
    got = {r.k: (r.name, r.op) for r in out.collect()}
    assert got[2] == (None, "update")
