"""Mutation-layer semantics (SURVEY §2.10 M1-M3, RBAC-shaped cases
from the reference's behavioral tests — SURVEY §5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_database_monitoring_system_spark.operators import mutation


def _users(spark):
    return spark.createDataFrame(
        [(1, "alice", "Admin"), (2, "bob", "User"), (3, "carol", "User")],
        "id long, username string, role string",
    )


def test_insert_ignore_skips_existing_keys(spark):
    users = _users(spark)
    inserts = spark.createDataFrame(
        [(2, "bob2", "Moderator"), (4, "dan", "User")],
        "id long, username string, role string",
    )
    out = mutation.insert_ignore(users, inserts, ["id"]).collect()
    by_id = {r.id: r for r in out}
    assert len(out) == 4
    assert by_id[2].username == "bob"  # conflict ignored
    assert by_id[4].username == "dan"  # new row inserted


def test_insert_ignore_dedups_batch_internal_conflicts(spark):
    # PG INSERT .. ON CONFLICT DO NOTHING keeps ONE row per key even
    # when the incoming batch repeats a key; the deterministic pick is
    # the row_number()==1 row over the orderable non-key columns.
    users = _users(spark)
    inserts = spark.createDataFrame(
        [(4, "dan", "User"), (4, "dan2", "Admin"), (4, "aaron", "User")],
        "id long, username string, role string",
    )
    out = mutation.insert_ignore(users, inserts, ["id"]).collect()
    assert len(out) == 4  # exactly one id=4 row appended
    row4 = [r for r in out if r.id == 4]
    assert len(row4) == 1
    assert row4[0].username == "aaron"  # min over (username, role) ordering


def test_upsert_last_writer_wins(spark):
    users = _users(spark)
    updates = spark.createDataFrame([(2, "bob", "Admin")], "id long, username string, role string")
    out = {r.id: r for r in mutation.upsert(users, updates, ["id"]).collect()}
    assert len(out) == 3
    assert out[2].role == "Admin"


def test_delete_where_keeps_null_predicate_rows(spark):
    df = spark.createDataFrame([(1, "x"), (2, None), (3, "y")], "id long, tag string")
    out = mutation.delete_where(df, F.col("tag") == "x").collect()
    assert sorted(r.id for r in out) == [2, 3]  # NULL predicate row kept


def test_update_where(spark):
    users = _users(spark)
    out = mutation.update_where(
        users, F.col("role") == "User", {"role": F.lit("Member")}
    ).collect()
    roles = {r.id: r.role for r in out}
    assert roles == {1: "Admin", 2: "Member", 3: "Member"}


def test_archive_roundtrip(spark):
    df = spark.createDataFrame([(i, i * 10) for i in range(10)], "id long, v long")
    archived, remaining = mutation.archive_split(df, F.col("id") < 4)
    assert archived.count() == 4 and remaining.count() == 6
    assert "archive_timestamp" in archived.columns
    restored, kept = mutation.restore_expired(archived, remaining, F.col("id") < 2)
    assert restored.count() == 8  # 6 remaining + 2 restored
    assert kept.count() == 2


def _fresh_tables(spark, n):
    """UUID-named managed tables (the catalog is in-memory per session
    but warehouse directories persist, so fixed names collide with
    leftovers from other sessions — same pattern as test_catalog)."""
    import uuid

    names = [f"txn_{uuid.uuid4().hex[:8]}" for _ in range(n)]
    return names


def test_multi_table_transaction_commits_both(spark):
    from real_time_database_monitoring_system_spark.operators import mutation

    ta, tb = _fresh_tables(spark, 2)
    try:
        spark.createDataFrame([(1, "old")], "id long, v string").write.saveAsTable(ta)
        spark.createDataFrame([(1, "old")], "id long, v string").write.saveAsTable(tb)
        mutation.multi_table_transaction(
            spark,
            {
                ta: spark.createDataFrame([(1, "new"), (2, "new")], "id long, v string"),
                tb: spark.createDataFrame([(9, "new")], "id long, v string"),
            },
        )
        assert spark.table(ta).count() == 2
        assert {r.v for r in spark.table(tb).collect()} == {"new"}
        assert not spark.catalog.tableExists(f"{ta}__txn_stage")
    finally:
        for t in (ta, tb):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_multi_table_transaction_rolls_back_on_failure(spark):
    """A failure while computing the SECOND table's result must leave
    BOTH targets untouched (the reference's transaction.atomic
    guarantee) and no staging debris — and a RETRY after the failure
    must succeed (failed stage writes leave catalog-less locations
    that the rollback must physically remove)."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from real_time_database_monitoring_system_spark.operators import mutation

    tc, td = _fresh_tables(spark, 2)
    try:
        spark.createDataFrame([(1, "orig")], "id long, v string").write.saveAsTable(tc)
        spark.createDataFrame([(2, "orig")], "id long, v string").write.saveAsTable(td)
        good = spark.createDataFrame([(1, "changed")], "id long, v string")
        # raise_error only fires when the plan executes — during staging
        bad = spark.createDataFrame([(2, "x")], "id long, v string").select(
            "id", F.expr("raise_error('boom')").alias("v")
        )
        with _pytest.raises(Exception, match="boom"):
            mutation.multi_table_transaction(spark, {tc: good, td: bad})
        assert {r.v for r in spark.table(tc).collect()} == {"orig"}
        assert {r.v for r in spark.table(td).collect()} == {"orig"}
        assert not spark.catalog.tableExists(f"{tc}__txn_stage")
        assert not spark.catalog.tableExists(f"{td}__txn_stage")
        # retry with a good plan must not hit LOCATION_ALREADY_EXISTS
        fixed = spark.createDataFrame([(2, "fixed")], "id long, v string")
        mutation.multi_table_transaction(spark, {tc: good, td: fixed})
        assert {r.v for r in spark.table(td).collect()} == {"fixed"}
    finally:
        for t in (tc, td):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


class TestSnapshotCatalog:
    """Crash-atomic multi-table transactions (M4's crash half) via the
    versioned-manifest protocol in sources/txn.py."""

    def _cat(self, tmp_path):
        from real_time_database_monitoring_system_spark.sources.txn import SnapshotCatalog

        return SnapshotCatalog(str(tmp_path / "cat"))

    def test_commit_and_read_both_tables(self, spark, tmp_path):
        cat = self._cat(tmp_path)
        v = cat.commit(
            {
                "users": spark.range(5).withColumnRenamed("id", "user_id"),
                "roles": spark.createDataFrame([(1, "admin")], "user_id long, role string"),
            }
        )
        assert v == 1
        assert cat.read(spark, "users").count() == 5
        assert cat.read(spark, "roles").collect()[0].role == "admin"

    def test_compute_failure_leaves_old_snapshot(self, spark, tmp_path):
        import pytest
        from pyspark.sql import functions as F

        cat = self._cat(tmp_path)
        cat.commit({"t": spark.range(3), "u": spark.range(4)})
        bad = spark.range(2).select(F.expr("CAST(raise_error('boom') AS BIGINT)").alias("id"))
        with pytest.raises(Exception, match="boom"):
            cat.commit({"t": spark.range(99), "u": bad})
        # phase 1 failed mid-way: t's new version dir exists on disk but
        # the manifest never moved — BOTH tables read the old snapshot
        assert cat.read(spark, "t").count() == 3
        assert cat.read(spark, "u").count() == 4

    def test_crash_before_swap_is_invisible_and_retryable(self, spark, tmp_path, monkeypatch):
        import os

        import pytest
        from real_time_database_monitoring_system_spark.sources import txn

        cat = self._cat(tmp_path)
        cat.commit({"t": spark.range(3), "u": spark.range(4)})

        # an IN-PROCESS failure between the data writes and the
        # manifest swap: the publish never happens, readers keep the
        # old snapshot, and (r12 review) the failed attempt cleans its
        # own version-dir debris so an immediate RETRY is not bricked
        # by errorifexists at the recomputed version number
        def die(*a, **k):
            raise OSError("simulated crash before manifest swap")

        monkeypatch.setattr(txn.os, "replace", die)
        with pytest.raises(OSError, match="simulated crash"):
            cat.commit({"t": spark.range(99), "u": spark.range(98)})
        monkeypatch.undo()

        assert cat.read(spark, "t").count() == 3
        assert cat.read(spark, "u").count() == 4
        assert not os.path.exists(
            os.path.join(str(tmp_path), "cat", "data", "t", "v2")
        ), "failed phase-1 debris must be cleaned for the retry"
        cat.commit({"t": spark.range(7)})  # retry succeeds immediately
        assert cat.read(spark, "t").count() == 7
        assert cat.read(spark, "u").count() == 4

    def test_hard_crash_debris_is_vacuumable(self, spark, tmp_path):
        # a REAL process crash (kill -9) runs no cleanup: simulate by
        # planting a stranded version dir the manifest never saw —
        # invisible to readers, reclaimed by vacuum()
        import os

        cat = self._cat(tmp_path)
        cat.commit({"t": spark.range(3)})
        spark.range(99).write.parquet(
            os.path.join(str(tmp_path), "cat", "data", "t", "v99")
        )
        assert cat.read(spark, "t").count() == 3
        removed = cat.vacuum()
        assert any("v99" in r for r in removed)
        cat.commit({"t": spark.range(7)})
        assert cat.read(spark, "t").count() == 7

    def test_snapshot_isolation_until_vacuum(self, spark, tmp_path):
        cat = self._cat(tmp_path)
        cat.commit({"t": spark.range(3)})
        old_reader = cat.read(spark, "t")  # resolves v1 paths now
        cat.commit({"t": spark.range(10)})
        assert old_reader.count() == 3  # v1 files still on disk
        assert cat.read(spark, "t").count() == 10
        removed = cat.vacuum()
        assert removed == ["data/t/v1"]

    def test_manifest_swap_is_all_or_nothing_per_version(self, spark, tmp_path):
        cat = self._cat(tmp_path)
        cat.commit({"a": spark.range(1), "b": spark.range(2)})
        cat.commit({"a": spark.range(11), "b": spark.range(12)})
        m = cat.manifest()
        # one version number governs every table touched by the commit
        assert m["version"] == 2
        assert m["tables"]["a"].endswith("v2") and m["tables"]["b"].endswith("v2")

    def test_concurrent_writer_is_rejected_not_interleaved(self, spark, tmp_path):
        import os

        import pytest

        from real_time_database_monitoring_system_spark.sources.txn import (
            ConcurrentCommitError,
        )

        cat = self._cat(tmp_path)
        cat.commit({"t": spark.range(3)})
        # a writer "in flight" = the lock file exists
        lock = os.path.join(cat.root, ".commit.lock")
        with open(lock, "w") as fh:
            fh.write("12345")
        with pytest.raises(ConcurrentCommitError, match="remove the lock"):
            cat.commit({"t": spark.range(9)})
        assert cat.read(spark, "t").count() == 3  # nothing moved
        os.unlink(lock)  # crashed-writer recovery
        cat.commit({"t": spark.range(9)})
        assert cat.read(spark, "t").count() == 9

    def test_merge_into_is_one_atomic_version(self, spark, tmp_path):
        from real_time_database_monitoring_system_spark.sources.txn import merge_into

        cat = self._cat(tmp_path)
        cat.commit(
            {"t": spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")}
        )
        v = merge_into(
            cat,
            spark,
            "t",
            spark.createDataFrame([(2, "B"), (3, "c")], "k long, v string"),
            ["k"],
        )
        assert v == 2
        got = {r.k: r.v for r in cat.read(spark, "t").collect()}
        assert got == {1: "a", 2: "B", 3: "c"}

    def test_time_travel_reads_archived_versions(self, spark, tmp_path):
        import pytest

        cat = self._cat(tmp_path)
        cat.commit({"t": spark.range(3)})
        cat.commit({"t": spark.range(10), "u": spark.range(2)})
        assert cat.read(spark, "t", version=1).count() == 3
        assert cat.read(spark, "t", version=2).count() == 10
        assert cat.read(spark, "t").count() == 10
        with pytest.raises(KeyError, match="unknown table 'u' at version 1"):
            cat.read(spark, "u", version=1)
        with pytest.raises(KeyError, match="not committed"):
            cat.read(spark, "t", version=9)
        # vacuum keeps only current-version data; old manifests remain
        # but their files are gone — the documented versionAsOf trade
        cat.vacuum()
        assert cat.read(spark, "t").count() == 10

    def test_merge_cas_rejects_stale_read(self, spark, tmp_path):
        """A commit carrying expected_version fails if another commit
        landed after the read it derives from — the lost-update guard
        for read-modify-write (merge) callers."""
        import pytest

        from real_time_database_monitoring_system_spark.sources.txn import (
            ConcurrentCommitError,
        )

        cat = self._cat(tmp_path)
        cat.commit({"t": spark.range(3)})
        stale = cat.manifest()["version"]
        cat.commit({"t": spark.range(5)})  # interleaving writer
        with pytest.raises(ConcurrentCommitError, match="re-read and retry"):
            cat.commit({"t": spark.range(9)}, expected_version=stale)
        assert cat.read(spark, "t").count() == 5  # interloper's commit intact
        # matching expectation commits fine
        cat.commit({"t": spark.range(9)}, expected_version=cat.manifest()["version"])
        assert cat.read(spark, "t").count() == 9


class TestVacuumLocking:
    def test_vacuum_refuses_while_commit_in_flight(self, tmp_path, spark):
        """vacuum serializes on the commit lock (r12 review): an
        unlocked vacuum resolving its live set from a stale manifest
        could rmtree a concurrently landing commit's data."""
        import os

        import pytest
        from real_time_database_monitoring_system_spark.sources.txn import (
            ConcurrentCommitError,
            SnapshotCatalog,
        )

        cat = SnapshotCatalog(str(tmp_path / "cat"))
        cat.commit({"t": spark.range(3)})
        lock = os.path.join(str(tmp_path / "cat"), ".commit.lock")
        open(lock, "w").close()  # a commit (or crashed writer) holds it
        try:
            with pytest.raises(ConcurrentCommitError, match="vacuum"):
                cat.vacuum()
        finally:
            os.unlink(lock)
        cat.vacuum()  # lock released → vacuum proceeds
