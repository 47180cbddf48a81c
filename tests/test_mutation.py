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
