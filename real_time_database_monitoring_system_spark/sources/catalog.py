"""Catalog DDL operations (SURVEY §2.1 S10-S12) over Spark managed
tables.

The reference's archive endpoint issues raw DDL against PostgreSQL:
``CREATE TABLE IF NOT EXISTS … (LIKE src INCLUDING ALL)``
(``/root/reference/myapp/views.py:925-928``), an idempotent
``ALTER TABLE ADD COLUMN`` guarded by an information_schema probe
(``views.py:929-943``), ``INSERT INTO … SELECT`` (``views.py:947-951``)
and ``TRUNCATE`` (``views.py:954-956``). These are the Spark-catalog
equivalents; the CHECK-constraint of `db_helpers.py:7-12` becomes a
validated filter on write (Spark tables don't enforce constraints).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def create_table_like(spark: SparkSession, table: str, like: DataFrame) -> None:
    """S10: ``CREATE TABLE IF NOT EXISTS table`` with `like`'s schema
    (empty)."""
    like.limit(0).write.mode("ignore").saveAsTable(table)


def ensure_column(spark: SparkSession, table: str, col_name: str, col_type: str) -> bool:
    """S11: idempotent ADD COLUMN — catalog probe first (the
    information_schema.columns existence check of views.py:930-937).
    Returns True if the column was added."""
    existing = {f.name for f in spark.table(table).schema.fields}
    if col_name in existing:
        return False
    spark.sql(f"ALTER TABLE {table} ADD COLUMNS ({col_name} {col_type})")
    return True


def insert_into(spark: SparkSession, table: str, rows: DataFrame, check: Column | None = None) -> None:
    """S9: ``INSERT INTO … SELECT``; `check` emulates a CHECK
    constraint (rows failing it are rejected with an error count).
    The checked relation is MATERIALIZED before the count so the write
    appends exactly the rows that were checked — without it the two
    actions re-evaluate the plan independently, and a
    nondeterministic or concurrently-growing input could slip
    check-violating rows past the guard (TOCTOU; r12 review)."""
    if check is not None:
        from ..operators.util import materialize

        rows = materialize(rows)
        bad = rows.filter(~F.coalesce(check, F.lit(False))).count()
        if bad:
            raise ValueError(f"CHECK constraint failed for {bad} rows")
    rows.write.mode("append").insertInto(table)


def truncate_table(spark: SparkSession, table: str) -> None:
    """S12: TRUNCATE — ``TRUNCATE TABLE`` DDL, the mode-independent
    equivalent of the reference's TRUNCATE. (The previous
    empty-overwrite-insertInto emulation silently NO-OPS on a
    partitioned table under
    ``spark.sql.sources.partitionOverwriteMode=dynamic`` — a zero-row
    overwrite touches zero partitions — which would make
    `archive_table` duplicate the full source on every run; r12
    review.)"""
    spark.sql(f"TRUNCATE TABLE {table}")


def archive_table(
    spark: SparkSession,
    src_table: str,
    archive_table_name: str,
    ts_col: str = "archive_timestamp",
) -> int:
    """The reference's full archive pipeline (views.py:913-994):
    create-if-missing archive with src schema + timestamp column, copy
    all rows stamped, truncate src. Returns rows archived.

    The stamped snapshot is MATERIALIZED once, so the returned count,
    the appended rows, and the rows the truncate discards are the SAME
    snapshot — without it count/append are independent scans and a
    concurrent append lands in neither consistently (r12 review).
    NOT crash-atomic across the append/truncate pair (the reference
    leans on ``transaction.atomic`` here): a crash between them leaves
    src un-truncated and a naive re-run would re-archive those rows —
    production either keys the archive on a content digest or runs the
    pair through `txn.SnapshotCatalog.commit` for the all-or-nothing
    guarantee."""
    from ..operators.util import materialize

    src = spark.table(src_table)
    stamped = materialize(src.withColumn(ts_col, F.current_timestamp()))
    create_table_like(spark, archive_table_name, stamped)
    ensure_column(spark, archive_table_name, ts_col, "timestamp")
    n = stamped.count()
    stamped.write.mode("append").insertInto(archive_table_name)
    truncate_table(spark, src_table)
    return n
