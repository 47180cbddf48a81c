"""Non-parquet interchange formats with the registry's no-inference rule.

The reference exports its grids as CSV/XLSX and ships JSON to the
browser (SURVEY §2.1 S6–S8); a training-data pipeline additionally
ingests JSONL drops from upstream producers. These helpers make those
formats first-class WITHOUT giving up the engine's schema discipline:

- every read takes the explicit registry schema (schema inference on
  a 100 TB text drop is a full extra pass AND a correctness hazard —
  a column of "123"s infers bigint until the day it doesn't);
- malformed JSONL/CSV rows are not dropped silently and do not fail
  the job: PERMISSIVE mode routes them to a quarantine column, and
  `read_jsonl` returns (good, quarantined) so the pipeline can land
  bad input in a dead-letter table with lineage (the at-scale
  ingestion contract; FAILFAST is a one-bad-byte job killer and
  DROPMALFORMED is silent data loss).
- ORC round-trips with the same explicit schema — Spark carries the
  reader/writer natively, and mixed-format lakes are the norm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from .registry import SCHEMAS

_CORRUPT = "_corrupt_record"


def _with_corrupt(schema: StructType) -> StructType:
    return StructType(list(schema.fields) + [StructField(_CORRUPT, StringType())])


def write_jsonl(df: DataFrame, path: str) -> None:
    """One JSON object per line (the interchange format LLM corpora
    actually arrive in); permissive consumers re-read with
    `read_jsonl`."""
    df.write.mode("overwrite").json(path)


def read_jsonl(
    spark: SparkSession, path: str, table: str
) -> tuple[DataFrame, DataFrame]:
    """(good, quarantined) under the registry schema for `table`.

    Good rows have NULL `_corrupt_record`; quarantined rows carry the
    raw offending line for the dead-letter sink. The parsed batch is
    cached: Spark refuses plans whose column pruning leaves ONLY the
    internal corrupt-record column (QUERY_ONLY_CORRUPT_RECORD_COLUMN),
    and caching is the documented pattern — it also means the two
    consumers share one parse instead of re-reading the drop."""
    raw = spark.read.schema(_with_corrupt(SCHEMAS[table])).json(path).cache()
    good = raw.filter(F.col(_CORRUPT).isNull()).drop(_CORRUPT)
    quarantined = raw.filter(F.col(_CORRUPT).isNotNull()).select(
        F.col(_CORRUPT).alias("raw_line")
    )
    return good, quarantined


def write_csv(df: DataFrame, path: str) -> None:
    """Headered CSV with full quoting — the reference's export shape
    (index.html:338-371), writable at any scale (one file per task)."""
    df.write.mode("overwrite").option("header", True).option(
        "quoteAll", True
    ).csv(path)


def read_csv(spark: SparkSession, path: str, table: str) -> DataFrame:
    """CSV under the registry schema — header consumed for position
    only, types come from the schema, never inference."""
    return (
        spark.read.schema(SCHEMAS[table])
        .option("header", True)
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


def write_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str, table: str) -> DataFrame:
    return spark.read.schema(SCHEMAS[table]).orc(path)


def read_binary_dir(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    max_bytes: int | None = None,
) -> DataFrame:
    """Raw-file ingestion for multimodal corpora via the built-in
    `binaryFile` source: one row per file → the engine's multimodal
    payload shape (doc_id, payload, media_source, media_path,
    payload_bytes), ready for `operators.multimodal.decode_payloads`
    → `featurize` → ANN.

    - `doc_id = xxhash64(path)`: deterministic and embarrassingly
      parallel — never a window/zipWithIndex over the listing.
    - `glob` (e.g. ``*.png``) filters at FILE-LISTING time
      (pathGlobFilter), so excluded files are never opened.
    - `max_bytes` maps to a `length` predicate, which binaryFile
      pushes to the file level — oversized blobs are skipped without
      reading content (the guard a 100 TB media crawl needs against
      the one 40 GB stray video).
    - recursiveFileLookup handles nested date/shard directory layouts.

    spark-avro/spark-xml style external modules are NOT bundled in
    this distribution (probed 2026-08-14); binaryFile, text, CSV,
    JSON and ORC cover the non-parquet ingestion surface natively.
    """
    reader = (
        spark.read.format("binaryFile").option("recursiveFileLookup", "true")
    )
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    if max_bytes is not None:
        df = df.filter(F.col("length") <= max_bytes)
    return df.select(
        F.xxhash64("path").alias("doc_id"),
        F.col("content").alias("payload"),
        # extension of the BASENAME only: splitting the full path on '.'
        # would return the whole path for dotless filenames, or a
        # directory fragment when only a directory name contains a dot
        # (day=1.5/img). No-extension basenames yield NULL (ADVICE r4).
        F.nullif(
            F.regexp_extract(
                F.element_at(F.split(F.col("path"), "/"), -1), r"\.([^.]+)$", 1
            ),
            F.lit(""),
        ).alias("media_source"),
        F.col("path").alias("media_path"),
        F.col("length").alias("payload_bytes"),
    )


def read_text_corpus(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """One-file-one-document text corpus ingestion (the classic crawl
    /books layout) via the built-in text source with ``wholetext`` —
    each file becomes ONE row instead of one row per line, so document
    boundaries survive without a fragile re-assembly groupBy over
    (file, line_no). Returns the documents shape
    (doc_id, text, lang, source, n_chars): deterministic
    xxhash64(path) ids, lang left NULL for `text.char_trigram_langid`
    / `lang_id` to fill downstream, source = the file's parent
    directory name (the usual per-source layout).

    Caveat at scale, stated not hidden: wholetext makes a file the
    unit of parallelism AND of memory (a task materializes the whole
    file) — right for corpora of many small/medium documents, wrong
    for single multi-GB files, which should arrive via `read_jsonl`
    or be split upstream."""
    # NB: wholetext must go through the text() kwarg — the PySpark
    # method re-sets the option from its own default (False), silently
    # clobbering a prior .option("wholetext", ...) call
    reader = spark.read.option("recursiveFileLookup", "true")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.text(path, wholetext=True).select(
        "value", F.input_file_name().alias("path")
    )
    return df.select(
        F.xxhash64("path").alias("doc_id"),
        F.col("value").alias("text"),
        F.lit(None).cast("string").alias("lang"),
        F.element_at(F.split(F.col("path"), "/"), -2).alias("source"),
        F.length("value").cast("long").alias("n_chars"),
    )
