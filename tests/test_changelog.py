"""Changelog / incremental scan over the snapshot log (r7) —
Iceberg's CDC read: row-level changes between two committed versions,
reconstructed from the manifest chain alone.
"""

from __future__ import annotations

import pytest

from deepseek_ocr_api_rs_spark.sources.snapshots import (
    apply_deletes,
    compact,
    current_version,
    delete_keys,
    delete_where,
    merge_into,
    read_changelog,
    read_snapshot,
    write_snapshot,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr("id", "id * 2 as v")


def _changes(spark, t, frm, to=None):
    rows = read_changelog(spark, t, frm, to).collect()
    return sorted(
        (r._commit_version, r._change_type, r.id, r.v) for r in rows
    )


def test_append_commits_are_pure_inserts(spark, tmp_path):
    t = str(tmp_path / "tbl")
    write_snapshot(_df(spark, 0, 3), t)
    write_snapshot(_df(spark, 3, 5), t, mode="append")
    # full history from zero: every row is an insert at its commit
    assert _changes(spark, t, 0) == [
        (1, "insert", 0, 0), (1, "insert", 1, 2), (1, "insert", 2, 4),
        (2, "insert", 3, 6), (2, "insert", 4, 8),
    ]
    # incremental from v1: only the second append
    assert _changes(spark, t, 1) == [
        (2, "insert", 3, 6), (2, "insert", 4, 8),
    ]


def test_cow_delete_emits_exactly_the_removed_rows(spark, tmp_path):
    t = str(tmp_path / "tbl")
    write_snapshot(_df(spark, 0, 4), t, stats_cols=["id"])
    write_snapshot(_df(spark, 4, 8), t, mode="append", stats_cols=["id"])
    delete_where(spark, t, "id in (2, 5)", prune=("id", 2, 5))
    assert _changes(spark, t, 2) == [
        (3, "delete", 2, 4), (3, "delete", 5, 10),
    ]
    # passthrough rows (file of ids 0..3 keeps 0,1,3) appear only as the
    # rewrite's net: delete of the removed rows, nothing else
    assert all(c == "delete" for _, c, _, _ in _changes(spark, t, 2))


def test_merge_emits_delete_plus_insert_for_updates(spark, tmp_path):
    t = str(tmp_path / "tbl")
    write_snapshot(_df(spark, 0, 4), t, stats_cols=["id"])
    upd = spark.createDataFrame(
        [(1, 999), (10, 20)], "id long, v long"
    )
    merge_into(spark, t, upd, "id")
    got = _changes(spark, t, 1)
    assert (2, "delete", 1, 2) in got  # old image of the updated key
    assert (2, "insert", 1, 999) in got  # new image
    assert (2, "insert", 10, 20) in got  # unmatched -> insert
    # rows rewritten UNCHANGED by the candidate rewrite net out
    assert (2, "insert", 0, 0) not in got
    assert (2, "delete", 0, 0) not in got
    assert len(got) == 3


def test_maintenance_commits_emit_nothing(spark, tmp_path):
    t = str(tmp_path / "tbl")
    write_snapshot(_df(spark, 0, 3), t)
    write_snapshot(_df(spark, 3, 6), t, mode="append")
    v_before = current_version(t)
    compact(spark, t, target_files=1)
    assert current_version(t) == v_before + 1
    assert _changes(spark, t, v_before) == []
    # ...and the empty frame still carries the table + meta schema
    cols = set(read_changelog(spark, t, v_before).columns)
    assert {"id", "v", "_change_type", "_commit_version"} <= cols


def test_mor_delete_emits_full_deleted_rows(spark, tmp_path):
    t = str(tmp_path / "tbl")
    write_snapshot(_df(spark, 0, 5), t)
    keys = spark.createDataFrame([(1,), (3,)], "id long")
    delete_keys(spark, t, keys, "id")
    assert _changes(spark, t, 1) == [
        (2, "delete", 1, 2), (2, "delete", 3, 6),
    ]
    # materializing the deletes later is data-preserving: no new changes
    apply_deletes(spark, t)
    assert _changes(spark, t, 2) == []


def test_changelog_replays_to_the_target_snapshot(spark, tmp_path):
    """Snapshot(from) + inserts - deletes == snapshot(to): the changelog
    is a faithful delta across a mixed history."""
    t = str(tmp_path / "tbl")
    write_snapshot(_df(spark, 0, 6), t, stats_cols=["id"])
    write_snapshot(_df(spark, 6, 9), t, mode="append", stats_cols=["id"])
    delete_where(spark, t, "id in (0, 7)", prune=("id", 0, 7))
    merge_into(
        spark, t,
        spark.createDataFrame([(2, -1), (20, -2)], "id long, v long"),
        "id",
    )
    compact(spark, t, target_files=1)
    delete_keys(spark, t, spark.createDataFrame([(8,)], "id long"), "id")
    frm = 1
    start = {(r.id, r.v) for r in read_snapshot(spark, t, version=frm).collect()}
    for row in read_changelog(spark, t, frm).collect():
        if row._change_type == "insert":
            start.add((row.id, row.v))
        else:
            start.discard((row.id, row.v))
    end = {(r.id, r.v) for r in read_snapshot(spark, t).collect()}
    assert start == end


def test_changelog_across_schema_evolution(spark, tmp_path):
    t = str(tmp_path / "tbl")
    write_snapshot(_df(spark, 0, 2), t)
    evolved = spark.range(2, 4).selectExpr(
        "id", "id * 2 as v", "cast(id as string) as tag"
    )
    write_snapshot(evolved, t, mode="append")
    rows = {
        (r._commit_version, r.id): r.tag
        for r in read_changelog(spark, t, 0).collect()
    }
    assert rows[(1, 0)] is None and rows[(1, 1)] is None
    assert rows[(2, 2)] == "2" and rows[(2, 3)] == "3"


def test_changelog_range_validation(spark, tmp_path):
    t = str(tmp_path / "tbl")
    with pytest.raises(FileNotFoundError):
        read_changelog(spark, t, 0)
    write_snapshot(_df(spark, 0, 2), t)
    with pytest.raises(ValueError):
        read_changelog(spark, t, 1, 2)  # to beyond current
    with pytest.raises(ValueError):
        read_changelog(spark, t, 2, 1)  # inverted
    assert read_changelog(spark, t, 1, 1).count() == 0  # empty range
