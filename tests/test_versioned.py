"""VersionedParquetTable (warehouse/versioned.py) — MERGE INTO on pure
parquet: copy-on-write versions, atomic pointer flip, partition-grain
rewrite with hard-linked reuse.

Reference parity: T1.7's keyed UPDATE (load_warehouse.py:117-129 runs
it in Postgres); SURVEY §2 maps it to Delta MERGE. These tests gate
the semantics (upsert, delete, row moves between partitions), the
atomicity story (old version readable until flip; crash orphans
harmless), and the 100 TB property (untouched partitions hard-linked,
asserted by inode)."""

from __future__ import annotations

import os

import pytest

from data_warehouse_opensky_spark.warehouse.versioned import (
    VersionedParquetTable,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id BIGINT, day STRING, val STRING")


def _rows(t, version=None):
    return {
        tuple(r) for r in t.read(version).select("id", "day", "val").collect()
    }


@pytest.fixture()
def table(spark, tmp_path):
    t = VersionedParquetTable(spark, str(tmp_path / "tbl"), partition_col="day")
    t.init(_df(spark, [
        (1, "2024-01-01", "a"),
        (2, "2024-01-01", "b"),
        (3, "2024-01-02", "c"),
        (4, "2024-01-03", "d"),
    ]))
    return t


def test_merge_upserts_and_inserts(spark, table):
    stats = table.merge_into(
        _df(spark, [
            (2, "2024-01-01", "B2"),   # update in place
            (5, "2024-01-04", "e"),    # insert, new partition
        ]),
        ["id"],
    )
    assert stats["version"] == 2
    assert stats["updated"] == 1 and stats["inserted"] == 1
    assert _rows(table) == {
        (1, "2024-01-01", "a"), (2, "2024-01-01", "B2"),
        (3, "2024-01-02", "c"), (4, "2024-01-03", "d"),
        (5, "2024-01-04", "e"),
    }
    # time travel: v1 unchanged
    assert (2, "2024-01-01", "b") in _rows(table, version=1)


def test_untouched_partitions_are_hard_linked(spark, table):
    table.merge_into(_df(spark, [(2, "2024-01-01", "B2")]), ["id"])
    v1 = os.path.join(table.path, "v=1", "day=2024-01-02")
    v2 = os.path.join(table.path, "v=2", "day=2024-01-02")
    inodes1 = {f: os.stat(os.path.join(v1, f)).st_ino
               for f in os.listdir(v1) if f.endswith(".parquet")}
    inodes2 = {f: os.stat(os.path.join(v2, f)).st_ino
               for f in os.listdir(v2) if f.endswith(".parquet")}
    assert inodes1 == inodes2 and inodes1  # same files, zero bytes copied
    # the touched partition was REWRITTEN (different files)
    t1 = os.path.join(table.path, "v=1", "day=2024-01-01")
    t2 = os.path.join(table.path, "v=2", "day=2024-01-01")
    assert {os.stat(os.path.join(t1, f)).st_ino for f in os.listdir(t1)
            if f.endswith(".parquet")}.isdisjoint(
        {os.stat(os.path.join(t2, f)).st_ino for f in os.listdir(t2)
         if f.endswith(".parquet")})


def test_merge_moves_row_across_partitions(spark, table):
    table.merge_into(_df(spark, [(3, "2024-01-05", "c-moved")]), ["id"])
    got = _rows(table)
    assert (3, "2024-01-05", "c-moved") in got
    assert not any(r[0] == 3 and r[1] == "2024-01-02" for r in got)
    assert len(got) == 4


def test_merge_delete_mode(spark, table):
    stats = table.merge_into(
        spark.createDataFrame([(1,), (4,)], "id BIGINT"),
        ["id"],
        when_matched="delete",
    )
    assert stats["deleted"] == 2
    assert {r[0] for r in _rows(table)} == {2, 3}


def test_crash_orphan_is_invisible_and_vacuumable(spark, table):
    # simulate a crashed merge: a fully-written version dir with no flip
    os.makedirs(os.path.join(table.path, "v=2"), exist_ok=True)
    assert table.latest_version() == 1
    assert len(_rows(table)) == 4  # reader unaffected
    # next merge supersedes the orphan number
    table.merge_into(_df(spark, [(1, "2024-01-01", "A")]), ["id"])
    assert table.latest_version() == 3
    removed = table.vacuum(keep_last=1)
    assert 2 in removed and 3 not in removed
    assert len(_rows(table)) == 4


def test_duplicate_source_keys_rejected(spark, table):
    with pytest.raises(ValueError, match="duplicate merge keys"):
        table.merge_into(
            _df(spark, [(9, "2024-01-01", "x"), (9, "2024-01-01", "y")]),
            ["id"],
        )


def test_null_source_keys_rejected(spark, table):
    with pytest.raises(ValueError, match="non-null"):
        table.merge_into(
            _df(spark, [(None, "2024-01-01", "x")]), ["id"]
        )


def test_merge_is_replayable(spark, table):
    src = _df(spark, [(2, "2024-01-01", "B2"), (6, "2024-01-01", "f")])
    table.merge_into(src, ["id"])
    before = _rows(table)
    table.merge_into(src, ["id"])  # replay: same source again
    assert _rows(table) == before  # idempotent outcome, new version
    assert table.latest_version() == 3


def test_unpartitioned_table_roundtrip(spark, tmp_path):
    t = VersionedParquetTable(spark, str(tmp_path / "flat"))
    t.init(spark.createDataFrame([(1, "a"), (2, "b")], "id BIGINT, v STRING"))
    t.merge_into(
        spark.createDataFrame([(2, "B"), (3, "c")], "id BIGINT, v STRING"),
        ["id"],
    )
    assert {tuple(r) for r in t.read().collect()} == {
        (1, "a"), (2, "B"), (3, "c")
    }


def test_overwrite_partitions_replaces_only_named_days(spark, table):
    stats = table.overwrite_partitions(_df(spark, [
        (10, "2024-01-01", "new1"),   # replaces BOTH rows of day 01
        (11, "2024-01-05", "new2"),   # creates day 05
    ]))
    assert stats["rewritten_partitions"] == 2
    assert stats["linked_partitions"] == 2  # day 02 and 03 reused
    assert _rows(table) == {
        (10, "2024-01-01", "new1"),
        (3, "2024-01-02", "c"),
        (4, "2024-01-03", "d"),
        (11, "2024-01-05", "new2"),
    }
    # untouched partitions hard-linked (zero copy)
    v1 = os.path.join(table.path, "v=1", "day=2024-01-02")
    v2 = os.path.join(table.path, "v=2", "day=2024-01-02")
    assert {os.stat(os.path.join(v1, f)).st_ino for f in os.listdir(v1)
            if f.endswith(".parquet")} == \
           {os.stat(os.path.join(v2, f)).st_ino for f in os.listdir(v2)
            if f.endswith(".parquet")}


def test_overwrite_partitions_requires_partition_col(spark, tmp_path):
    t = VersionedParquetTable(spark, str(tmp_path / "flat"))
    t.init(spark.createDataFrame([(1, "a")], "id BIGINT, v STRING"))
    with pytest.raises(ValueError, match="partition_col"):
        t.overwrite_partitions(
            spark.createDataFrame([(1, "b")], "id BIGINT, v STRING")
        )


def test_escape_path_name_matches_jvm(spark):
    """The pure-Python escapePathName (ADVICE r11: the private-JVM-API
    call could silently fall back to the UNescaped name) must match
    Spark's writer byte-for-byte on every character class it escapes."""
    from data_warehouse_opensky_spark.warehouse.versioned import (
        escape_path_name,
    )

    jvm = spark._jvm.org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    cases = [
        "a b", "c:d", "a%b", "a#b", "a/b", "a=b", "a*b", "a'b", 'a"b',
        "a\\b", "a{b", "a[b]", "a^b", "a?b", "café", "2024-01-01 00:00:00",
        "\x01x", "\x1fx", "\x7fx", "plain", "a\tb", "a\nb", "<>|", "a.b_c-d",
    ]
    for c in cases:
        assert escape_path_name(c) == jvm.escapePathName(c), c


def test_merge_with_null_partition_values(spark, tmp_path):
    """ADVICE r11 (medium): NULL partition values. Spark writes NULL
    pcol rows to day=__HIVE_DEFAULT_PARTITION__; the old classification
    (isin([None,...]) + f"day=None") both missed them — the stale null
    partition was hard-linked NEXT TO its rewrite: duplicate rows."""
    t = VersionedParquetTable(spark, str(tmp_path / "nulls"), partition_col="day")
    t.init(_df(spark, [
        (1, None, "n1"),
        (2, None, "n2"),
        (3, "2024-01-02", "c"),
    ]))
    # update a row INSIDE the null partition + insert another into it
    t.merge_into(_df(spark, [(1, None, "N1v2"), (4, None, "n4")]), ["id"])
    assert _rows(t) == {
        (1, None, "N1v2"), (2, None, "n2"),
        (3, "2024-01-02", "c"), (4, None, "n4"),
    }
    # exactly ONE default-partition dir in v=2, and it was rewritten
    v2_parts = [d for d in os.listdir(t._version_dir(2)) if d.startswith("day=")]
    assert sorted(v2_parts) == ["day=2024-01-02", "day=__HIVE_DEFAULT_PARTITION__"]


def test_merge_preserves_untouched_null_partition(spark, tmp_path):
    """The inverse case: a merge NOT touching the null partition must
    hard-link it once (it is untouched), never drop or duplicate it."""
    t = VersionedParquetTable(spark, str(tmp_path / "nulls2"), partition_col="day")
    t.init(_df(spark, [(1, None, "n1"), (3, "2024-01-02", "c")]))
    t.merge_into(_df(spark, [(3, "2024-01-02", "C2")]), ["id"])
    assert _rows(t) == {(1, None, "n1"), (3, "2024-01-02", "C2")}
    d1 = os.path.join(t._version_dir(1), "day=__HIVE_DEFAULT_PARTITION__")
    d2 = os.path.join(t._version_dir(2), "day=__HIVE_DEFAULT_PARTITION__")
    inodes = lambda d: {os.stat(os.path.join(d, f)).st_ino  # noqa: E731
                        for f in os.listdir(d) if f.endswith(".parquet")}
    assert inodes(d1) == inodes(d2) and inodes(d1)


def test_merge_empty_string_partition_collapses_to_null(spark, tmp_path):
    """Spark's writer sends empty-string partition values to the SAME
    __HIVE_DEFAULT_PARTITION__ dir as NULL (and the reader returns
    NULL for both) — the classification must treat '' and NULL as one
    partition or the dirname set double-counts it."""
    t = VersionedParquetTable(spark, str(tmp_path / "empty"), partition_col="day")
    t.init(_df(spark, [(1, "", "e1"), (3, "2024-01-02", "c")]))
    # round-trip: '' reads back as NULL (Spark semantics, documented)
    assert _rows(t) == {(1, None, "e1"), (3, "2024-01-02", "c")}
    t.merge_into(_df(spark, [(2, "", "e2")]), ["id"])
    assert _rows(t) == {
        (1, None, "e1"), (2, None, "e2"), (3, "2024-01-02", "c")
    }
    v2_parts = [d for d in os.listdir(t._version_dir(2)) if d.startswith("day=")]
    assert sorted(v2_parts) == ["day=2024-01-02", "day=__HIVE_DEFAULT_PARTITION__"]


def test_overwrite_partitions_with_null_partition(spark, tmp_path):
    t = VersionedParquetTable(spark, str(tmp_path / "ow"), partition_col="day")
    t.init(_df(spark, [(1, None, "n1"), (2, None, "n2"), (3, "2024-01-02", "c")]))
    stats = t.overwrite_partitions(_df(spark, [(9, None, "fresh")]))
    assert stats["rewritten_partitions"] == 1
    assert stats["linked_partitions"] == 1
    assert _rows(t) == {(9, None, "fresh"), (3, "2024-01-02", "c")}


def test_vacuum_grace_period_protects_recent_versions(spark, table):
    """VERDICT r11 #7: the Delta-VACUUM hazard. A version younger than
    grace_seconds is never removed, so a reader that resolved the
    pointer within the grace window keeps its files; with grace 0 an
    in-flight reader of a vacuumed version fails CLEANLY (file-missing
    error), never silently reading partial data."""
    table.merge_into(_df(spark, [(1, "2024-01-01", "A2")]), ["id"])
    table.merge_into(_df(spark, [(1, "2024-01-01", "A3")]), ["id"])
    # all versions were just written → grace covers them, nothing removed
    assert table.vacuum(keep_last=1, grace_seconds=3600) == []
    # a reader holding v=1 planned BEFORE an aggressive vacuum...
    stale = table.read(1)
    removed = table.vacuum(keep_last=1, grace_seconds=0)
    assert removed == [1, 2]
    # ...fails loudly (path/file gone) — never returns partial rows
    with pytest.raises(Exception, match="(?i)path|file|exist"):
        stale.count()


def test_merge_with_escaped_partition_values(spark, tmp_path):
    """Partition values containing path-escaped characters (spaces,
    colons) must not be double-counted: Spark writes 'day=a%20b', and
    a naive unescaped dirname match would hard-link the old partition
    NEXT TO its rewrite — duplicate rows."""
    t = VersionedParquetTable(spark, str(tmp_path / "esc"), partition_col="day")
    t.init(_df(spark, [
        (1, "a b", "x"),        # space → %20 in the dirname
        (2, "c:d", "y"),        # colon → %3A
        (3, "plain", "z"),
    ]))
    t.merge_into(_df(spark, [(1, "a b", "X2")]), ["id"])
    assert _rows(t) == {
        (1, "a b", "X2"), (2, "c:d", "y"), (3, "plain", "z")
    }
    # and the untouched escaped partition was linked, not copied
    import os as _os
    v1 = [d for d in _os.listdir(t._version_dir(1)) if d.startswith("day=")]
    v2 = [d for d in _os.listdir(t._version_dir(2)) if d.startswith("day=")]
    assert sorted(v1) == sorted(v2)


def test_concurrent_merges_serialize_without_lost_updates(spark, table):
    """r12 multi-writer upgrade: two genuinely concurrent merge_into
    calls (separate threads, one SparkSession, distinct keys) must
    BOTH land — the writer lock serializes them, so the final table
    carries both updates and the versions are sequential. Under the
    old last-flip-wins behavior one merge's rows vanished."""
    import threading

    errs = []

    def do_merge(key, day, val):
        try:
            table.merge_into(_df(spark, [(key, day, val)]), ["id"])
        except Exception as e:  # noqa: BLE001 — surface in main thread
            errs.append(e)

    t1 = threading.Thread(target=do_merge, args=(1, "2024-01-01", "T1"))
    t2 = threading.Thread(target=do_merge, args=(4, "2024-01-03", "T2"))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs
    got = _rows(table)
    assert (1, "2024-01-01", "T1") in got
    assert (4, "2024-01-03", "T2") in got
    assert len(got) == 4
    assert table.latest_version() == 3
    assert table.history() == [1, 2, 3]


def test_writer_lock_excludes_second_writer(spark, table, tmp_path):
    """The lock itself: while one handle holds it, a second table
    handle's mutation blocks until release (probed with a thread and
    an event, bounded wait)."""
    import threading
    import time

    other = VersionedParquetTable(spark, table.path, partition_col="day")
    entered = threading.Event()
    done = threading.Event()

    def blocked_merge():
        entered.set()
        other.merge_into(_df(spark, [(9, "2024-01-09", "late")]), ["id"])
        done.set()

    with table._writer_lock():
        t = threading.Thread(target=blocked_merge)
        t.start()
        assert entered.wait(10)
        # the other writer must NOT complete while we hold the lock
        # (generous window: plan + would-be write takes < 15 s here)
        assert not done.wait(3)
    t.join(30)
    assert done.is_set()
    assert (9, "2024-01-09", "late") in _rows(table)
