"""Sinks (SURVEY §2.1 S6-S9): CSV, JSON, XLSX, table append.

The reference exports grids in the browser — CSV with quote-escaping
(``index.html:338-371`` et al.), XLSX via SheetJS
(``cpu_usage_grid.html:216-240``), JSON for Chart.js (views.py:816).
Here they are engine-side writers: CSV/JSON scale out (one file per
partition, executor-side); XLSX is inherently single-file and is
documented as a driver-side small-result export.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_csv(df: DataFrame, path: str, header: bool = True, single_file: bool = False) -> None:
    """CSV export with full quoting (S6 — the JS exporter quotes every
    cell). ``single_file`` coalesces to one partition for small
    dashboard grids; leave False for large tables."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", header).option("quoteAll", True).csv(path)


def write_json(df: DataFrame, path: str) -> None:
    """JSON-lines export (S8 — ``json.dumps(processed_res)``)."""
    df.write.mode("overwrite").json(path)


def to_json_column(df: DataFrame, col_name: str = "payload") -> DataFrame:
    """Row → JSON string column (the Chart.js hand-off shape): struct of
    all columns serialized JVM-side."""
    return df.select(F.to_json(F.struct(*df.columns)).alias(col_name))


def write_xlsx(df: DataFrame, path: str, max_rows: int = 100_000) -> None:
    """XLSX export (S7). Spreadsheet files are a driver-side,
    small-result format: the writer refuses unbounded inputs rather
    than silently collecting a 100 TB table. One action: fetch
    max_rows+1 and refuse on overflow instead of a separate count."""
    pdf = df.limit(max_rows + 1).toPandas()
    if len(pdf) > max_rows:
        raise ValueError(f"xlsx export capped at {max_rows} rows; use write_csv")
    try:
        pdf.to_excel(path, index=False)
    except (ImportError, ModuleNotFoundError):
        # no openpyxl in this container: fall back to CSV next to it
        pdf.to_csv(path + ".csv", index=False)


def write_sharded_corpus(documents: DataFrame, path: str, budget_tokens: int = 2000) -> None:
    """Training-shard writer: `pipeline.shard_pack` assignment joined
    back onto the documents and written as parquet partitioned by
    (source, shard_id) — the directory layout a training loader reads
    shard-by-shard.

    The repartition on the partition columns means each output
    directory is produced by one task (no small-file explosion: without
    it every input partition writes a sliver of every shard), and
    `sortWithinPartitions` keeps doc_id order inside a shard file so a
    loader streams documents in packing order. The assignment is
    deterministic (pure function of source + doc_id order), so a
    failed write re-runs to identical shards."""
    from ..operators.pipeline import shard_pack

    assign = shard_pack(documents, budget_tokens).select("doc_id", "shard_id", "n_tokens")
    (
        documents.join(assign, "doc_id")
        .repartition("source", "shard_id")
        .sortWithinPartitions("doc_id")
        .write.mode("overwrite")
        .partitionBy("source", "shard_id")
        .parquet(path)
    )


def append_with_timestamp(src: DataFrame, ts_col: str = "archive_timestamp") -> DataFrame:
    """S9 INSERT…SELECT archive shape (views.py:947-951): source rows
    stamped with the archive time, ready for ``.write.mode('append')``."""
    return src.withColumn(ts_col, F.current_timestamp())
