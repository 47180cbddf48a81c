"""Interchange formats: explicit-schema round-trips + JSONL quarantine."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_database_monitoring_system_spark.sources import formats
from real_time_database_monitoring_system_spark.sources.registry import load_table


def _sorted_rows(df, key):
    return [tuple(r) for r in df.orderBy(key).collect()]


def test_jsonl_roundtrip_documents(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "docs_jsonl")
    formats.write_jsonl(docs, path)
    good, quarantined = formats.read_jsonl(spark, path, "documents")
    assert quarantined.count() == 0
    assert _sorted_rows(good, "doc_id") == _sorted_rows(docs, "doc_id")


def test_jsonl_quarantines_malformed_lines(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").limit(5)
    path = tmp_path / "dirty_jsonl"
    formats.write_jsonl(docs, str(path))
    # drop a producer's dirty file into the same directory
    (path / "bad.json").write_text(
        '{"doc_id": 999999, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}\n'
        "{this is not json at all\n"
        '{"doc_id": "also-not-a-long"}\n'
    )
    good, quarantined = formats.read_jsonl(spark, str(path), "documents")
    bad = [r["raw_line"] for r in quarantined.collect()]
    assert len(bad) == 2 and any("not json" in b for b in bad)
    # the good rows include the clean files AND the valid line from the
    # dirty file; nothing was dropped silently
    assert good.count() == 6
    assert good.filter(F.col("doc_id") == 999999).count() == 1


def test_csv_roundtrip_orders(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_csv")
    formats.write_csv(orders, path)
    back = formats.read_csv(spark, path, "orders")
    assert back.schema == orders.schema
    assert _sorted_rows(back, "o_orderkey") == _sorted_rows(orders, "o_orderkey")


def test_orc_roundtrip_events(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "events_orc")
    formats.write_orc(events, path)
    back = formats.read_orc(spark, path, "events")
    assert back.schema == events.schema
    assert _sorted_rows(back, "event_id") == _sorted_rows(events, "event_id")


def test_explicit_schema_reads_across_file_generations(spark, sf_dir, tmp_path):
    """Schema evolution contract: a directory holding files written
    BEFORE a column existed and files written after reads cleanly
    under the explicit superset schema — old rows surface NULL for the
    new column, no mergeSchema inference pass, no failure. This is how
    `catalog.ensure_column`-style evolution behaves at the file layer
    on an immutable lake."""
    docs = load_table(spark, sf_dir, "documents").limit(10)
    path = tmp_path / "evolving"
    # generation 1: before `quality` existed
    docs.write.mode("overwrite").parquet(str(path / "gen=1"))
    # generation 2: with the new column
    docs.withColumn("quality", F.lit(0.5)).write.mode("overwrite").parquet(
        str(path / "gen=2")
    )
    schema = ("doc_id long, text string, lang string, source string, "
              "n_chars int, quality double")
    back = spark.read.schema(schema).option("basePath", str(path)).parquet(
        str(path / "gen=1"), str(path / "gen=2")
    )
    assert back.count() == 20
    assert back.filter(F.col("quality").isNull()).count() == 10
    assert back.filter(F.col("quality") == 0.5).count() == 10


def test_binary_dir_ingestion_feeds_multimodal_pipeline(spark, tmp_path):
    """Raw-file ingestion closes the multimodal loop from the
    FILESYSTEM side: binaryFile listing -> payload shape -> mapInPandas
    decode. Glob must filter at listing time, max_bytes at the file
    level, content must round-trip exactly, and doc_id must be a
    deterministic function of the path (same listing -> same ids)."""
    from real_time_database_monitoring_system_spark.operators import multimodal
    from real_time_database_monitoring_system_spark.sources import formats

    media = tmp_path / "media" / "day=1"
    media.mkdir(parents=True)
    payloads = {
        "a.png": b"\x89PNG-fake-bytes-aaaaaa",
        "b.png": b"\x89PNG-fake-bytes-bb",
        "c.wav": b"RIFF-fake-audio",
        "d.png": b"\x89" + b"x" * 4096,  # oversized
    }
    for name, data in payloads.items():
        (media / name).write_bytes(data)

    df = formats.read_binary_dir(
        spark, str(tmp_path / "media"), glob="*.png", max_bytes=1024
    )
    rows = {r.media_path.rsplit("/", 1)[-1]: r for r in df.collect()}
    assert set(rows) == {"a.png", "b.png"}  # glob drops .wav, max_bytes drops d
    assert bytes(rows["a.png"].payload) == payloads["a.png"]
    assert all(r.media_source == "png" for r in rows.values())
    assert all(r.payload_bytes == len(bytes(r.payload)) for r in rows.values())
    # deterministic ids: a second listing produces identical doc_ids
    again = {r.media_path: r.doc_id for r in formats.read_binary_dir(
        spark, str(tmp_path / "media"), glob="*.png", max_bytes=1024).collect()}
    assert again == {r.media_path: r.doc_id for r in rows.values()}

    decoded = multimodal.decode_payloads(df).collect()
    assert len(decoded) == 2
    by_id = {r.doc_id: r for r in decoded}
    for r in rows.values():
        assert by_id[r.doc_id].payload_bytes == r.payload_bytes

    # media_source must come from the BASENAME's extension only: a
    # dotless filename yields NULL (not the whole path), and a dot in
    # a DIRECTORY name (day=1.5/) must not leak a directory fragment
    # as the extension (ADVICE r4).
    weird = tmp_path / "weird" / "day=1.5"
    weird.mkdir(parents=True)
    (weird / "noext").write_bytes(b"raw-blob")
    (weird / "clip.mp4").write_bytes(b"fake-mp4")
    wrows = {
        r.media_path.rsplit("/", 1)[-1]: r
        for r in formats.read_binary_dir(spark, str(tmp_path / "weird")).collect()
    }
    assert wrows["noext"].media_source is None
    assert wrows["clip.mp4"].media_source == "mp4"


def test_text_corpus_one_file_one_document(spark, tmp_path):
    """wholetext ingestion: document boundaries = file boundaries
    (newlines inside a file must NOT split it), source = parent dir,
    and the result feeds the text operators directly."""
    from real_time_database_monitoring_system_spark.operators import text as text_ops
    from real_time_database_monitoring_system_spark.sources import formats

    (tmp_path / "corpus" / "wiki").mkdir(parents=True)
    (tmp_path / "corpus" / "books").mkdir(parents=True)
    (tmp_path / "corpus" / "wiki" / "a.txt").write_text("line one\nline two\nline three")
    (tmp_path / "corpus" / "wiki" / "b.txt").write_text("the quick brown fox")
    (tmp_path / "corpus" / "books" / "c.txt").write_text("call me ishmael tonight")
    (tmp_path / "corpus" / "books" / "skip.md").write_text("not a txt")

    docs = formats.read_text_corpus(spark, str(tmp_path / "corpus"), glob="*.txt")
    rows = docs.collect()
    assert len(rows) == 3
    by_text = {r.text: r for r in rows}
    assert "line one\nline two\nline three" in by_text  # newlines intact
    assert by_text["the quick brown fox"].source == "wiki"
    assert by_text["call me ishmael tonight"].source == "books"
    assert all(r.n_chars == len(r.text) for r in rows)
    assert len({r.doc_id for r in rows}) == 3
    # feeds the text operator surface unchanged
    stats = text_ops.token_stats(docs).collect()
    assert len(stats) == 3 and all(s.n_tokens > 0 for s in stats)


def test_resize_payloads_stride_and_bounds(spark):
    """Stride-sample contract: output ≤ target_bytes per row, exact
    ⌈n/stride⌉ sizes, first byte always kept, empty payload → 0."""
    from real_time_database_monitoring_system_spark.operators import multimodal

    docs = spark.createDataFrame(
        [(1, "a" * 200, "en", "s", 200), (2, "xyz", "en", "s", 3), (3, "", "en", "s", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {r.doc_id: r for r in multimodal.resize_payloads(docs, target_bytes=64).collect()}
    assert out[1].orig_bytes == 200 and out[1].stride == 4  # ceil(200/64)
    assert out[1].resized_bytes == 50 and out[1].resized_bytes <= 64
    assert out[2].stride == 1 and out[2].resized_bytes == 3
    assert out[3].resized_bytes == 0 and out[3].resized_checksum == 0
    # checksum equals the shared polynomial over the sampled bytes
    from real_time_database_monitoring_system_spark.operators.multimodal import (
        _poly_checksum,
    )

    assert out[2].resized_checksum == _poly_checksum(b"xyz")
    assert out[1].resized_checksum == _poly_checksum(("a" * 200).encode()[::4])
