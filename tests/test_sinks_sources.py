"""Sink/source layer tests (S6-S8 + generic readers) and the
vectorized pandas-UDF surface."""

from __future__ import annotations

import math
import os

from pyspark.sql import functions as F

from real_time_database_monitoring_system_spark.functions import vectorized
from real_time_database_monitoring_system_spark.operators.mutation import compact
from real_time_database_monitoring_system_spark.sources import formats, sinks
from real_time_database_monitoring_system_spark.sources.registry import load_table


def test_csv_roundtrip(spark, sf_dir, tmp_path):
    df = load_table(spark, sf_dir, "region")
    out = str(tmp_path / "region_csv")
    sinks.write_csv(df, out, single_file=True)
    back = formats.read_csv(spark, out, "region")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_json_roundtrip(spark, sf_dir, tmp_path):
    df = load_table(spark, sf_dir, "nation")
    out = str(tmp_path / "nation_json")
    sinks.write_json(df, out)
    good, quarantined = formats.read_jsonl(spark, out, "nation")
    assert sorted(map(tuple, good.collect())) == sorted(map(tuple, df.collect()))
    assert quarantined.count() == 0


def test_to_json_column(spark, sf_dir):
    df = load_table(spark, sf_dir, "region").orderBy("r_regionkey").limit(1)
    payload = sinks.to_json_column(df).first().payload
    assert '"r_regionkey":0' in payload.replace(" ", "")


def test_xlsx_cap(spark, sf_dir, tmp_path):
    df = load_table(spark, sf_dir, "region")
    try:
        sinks.write_xlsx(df, str(tmp_path / "r.xlsx"), max_rows=2)
        raise AssertionError("expected ValueError for capped export")
    except ValueError:
        pass
    sinks.write_xlsx(df, str(tmp_path / "r2.xlsx"))
    assert any(p.startswith("r2.xlsx") for p in os.listdir(tmp_path))


def _read_xlsx_grid(path):
    """Unzip the OOXML and return the sheet as a list of row dicts
    keyed by cell ref — stdlib-only, mirroring what any spreadsheet
    app parses."""
    import xml.etree.ElementTree as ET
    import zipfile

    ns = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
    with zipfile.ZipFile(path) as zf:
        names = set(zf.namelist())
        # a valid single-sheet package: all four structural parts present
        for part in (
            "[Content_Types].xml",
            "_rels/.rels",
            "xl/workbook.xml",
            "xl/_rels/workbook.xml.rels",
            "xl/worksheets/sheet1.xml",
        ):
            assert part in names, f"missing OOXML part {part}"
        sheet = ET.fromstring(zf.read("xl/worksheets/sheet1.xml"))
    rows = []
    for row in sheet.iter(f"{ns}row"):
        cells = {}
        for c in row.iter(f"{ns}c"):
            if c.get("t") == "inlineStr":
                cells[c.get("r")] = c.find(f"{ns}is/{ns}t").text
            else:
                cells[c.get("r")] = c.find(f"{ns}v").text
        rows.append(cells)
    return rows


def test_write_xlsx_produces_real_ooxml(spark, sf_dir, tmp_path):
    """S7 parity: the export is genuine zipped OOXML (reference SheetJS
    grid export, cpu_usage_grid.html:216-240) — headers in row 1,
    strings as inline strings, numbers as numeric cells, verified by
    unzipping and parsing the sheet XML with the stdlib."""
    df = load_table(spark, sf_dir, "region").orderBy("r_regionkey")
    expect = df.collect()
    out = str(tmp_path / "region.xlsx")
    sinks.write_xlsx(df, out)
    grid = _read_xlsx_grid(out)
    header = grid[0]
    assert header["A1"] == "r_regionkey"
    assert header["B1"] == "r_name"
    assert len(grid) == len(expect) + 1
    for i, want in enumerate(expect, start=2):
        assert grid[i - 1][f"A{i}"] == str(want.r_regionkey)
        assert grid[i - 1][f"B{i}"] == want.r_name
    # deterministic artifact: same result → byte-identical file
    out2 = str(tmp_path / "region_again.xlsx")
    sinks.write_xlsx(df, out2)
    assert open(out, "rb").read() == open(out2, "rb").read()


def test_xlsx_cell_typing_and_escaping(tmp_path):
    """NULL/NaN → empty cell; XML-special and multibyte text survive;
    floats keep full precision; booleans render as text; wide frames
    cross the Z→AA column boundary correctly."""
    import pandas as pd

    cols = [f"c{i}" for i in range(28)]
    row1 = ["<&>\"'", 3.5, None, float("nan"), True] + list(range(23))
    row2 = ["héllo\nworld", -1, 2.25, 0, False] + [None] * 23
    pdf = pd.DataFrame([row1, row2], columns=cols)

    class _FakeDF:
        def limit(self, n):
            return self

        def toPandas(self):
            return pdf

    out = str(tmp_path / "typed.xlsx")
    sinks.write_xlsx(_FakeDF(), out)
    grid = _read_xlsx_grid(out)
    assert grid[0]["AA1"] == "c26" and grid[0]["AB1"] == "c27"
    r1, r2 = grid[1], grid[2]
    assert r1["A2"] == "<&>\"'"
    assert float(r1["B2"]) == 3.5
    assert "C2" not in r1 and "D2" not in r1  # None / NaN omitted
    assert r1["E2"] == "True"
    assert r2["A3"] == "héllo\nworld"
    assert float(r2["C3"]) == 2.25
    assert r2["E3"] == "False"
    assert "F3" not in r2  # trailing None block omitted


def test_xlsx_control_chars_escape_ooxml_style(tmp_path):
    """XML-illegal control characters (U+0000–U+0008, U+000B, DEL)
    must not reach sheet1.xml raw — they render via OOXML's _xHHHH_
    convention and the sheet stays parseable; a literal _xHHHH_ in the
    data is protected as _x005F_xHHHH_ so decoding round-trips."""
    import pandas as pd

    pdf = pd.DataFrame(
        [["a\x00b\x08c", "bell\x07", "_x0007_ literal", "tab\tok\nline"]],
        columns=["w", "x", "y", "z"],
    )

    class _FakeDF:
        def limit(self, n):
            return self

        def toPandas(self):
            return pdf

    out = str(tmp_path / "ctrl.xlsx")
    sinks.write_xlsx(_FakeDF(), out)
    grid = _read_xlsx_grid(out)  # ET.fromstring rejects raw controls
    assert grid[1]["A2"] == "a_x0000_b_x0008_c"
    assert grid[1]["B2"] == "bell_x0007_"
    assert grid[1]["C2"] == "_x005F_x0007_ literal"
    assert grid[1]["D2"] == "tab\tok\nline"  # \t \n are XML-legal


def test_compact_reduces_partitions(spark, sf_dir):
    df = load_table(spark, sf_dir, "lineitem").repartition(16)
    assert compact(df, 4).rdd.getNumPartitions() == 4
    assert compact(df.coalesce(2), 8).rdd.getNumPartitions() == 8


def test_normalize_embedding_udf(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(5)
    rows = emb.select(
        vectorized.normalized(F.col("embedding").cast("array<double>")).alias("n")
    ).collect()
    for r in rows:
        norm = math.sqrt(sum(x * x for x in r.n))
        assert abs(norm - 1.0) < 1e-9


def test_ivf_knn_recall(spark, sf_dir):
    from real_time_database_monitoring_system_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    exact = {(r.q_id, r.vec_id) for r in similarity.knn_bruteforce(emb, n_queries=10, k=5).collect()}
    ivf = {(r.q_id, r.vec_id) for r in similarity.ivf_knn(emb, n_queries=10, k=5, nprobe=3).collect()}
    recall = len(exact & ivf) / len(exact)
    assert recall >= 0.3, f"IVF recall too low: {recall}"


def test_write_sharded_corpus_layout_and_roundtrip(spark, sf_dir, tmp_path):
    from real_time_database_monitoring_system_spark.operators.pipeline import shard_pack

    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "shards")
    sinks.write_sharded_corpus(docs, out, budget_tokens=2000)
    # partition directories exist per (source, shard_id)
    sources = [d for d in os.listdir(out) if d.startswith("source=")]
    assert sources, "expected source= partition directories"
    assert any(
        d.startswith("shard_id=") for d in os.listdir(os.path.join(out, sources[0]))
    )
    # round-trip: partition pruning reads one shard; assignment matches
    back = spark.read.parquet(out)
    expect = shard_pack(docs, 2000)
    got = {(r.doc_id): (r.source, r.shard_id) for r in back.collect()}
    want = {(r.doc_id): (r.source, r.shard_id) for r in expect.collect()}
    assert got == want
    one = back.filter((F.col("source") == sources[0].split("=")[1]) & (F.col("shard_id") == 0))
    assert one.count() > 0


def test_write_xlsx_caps_without_counting_twice(spark, sf_dir, tmp_path):
    import pytest as _pytest

    df = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    with _pytest.raises(ValueError):
        sinks.write_xlsx(df, str(tmp_path / "too_big.xlsx"), max_rows=5)


def test_events_loader_adapts_to_ts_physical_form(spark, tmp_path):
    """The driver's feed has shipped events.ts both as ns-int64 and as
    native µs timestamp across data generations; load_table must yield
    byte-identical µs TIMESTAMP_NTZ rows from either physical form."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    us_vals = [1704067200_000000, 1704067201_500001]
    cols = {
        "event_id": pa.array([1, 2], pa.int64()),
        "user_id": pa.array([10, 11], pa.int64()),
        "event_type": pa.array(["view", "click"], pa.string()),
        "value": pa.array([1.5, 2.5], pa.float64()),
        "props": pa.array(["{}", "{}"], pa.string()),
    }
    forms = {
        # +999 ns exercises the truncating (not rounding) ns→µs path
        "ns": pa.array([u * 1000 + 999 for u in us_vals], pa.timestamp("ns")),
        "us": pa.array(us_vals, pa.timestamp("us")),
    }
    loaded = {}
    for form, ts_arr in forms.items():
        d = tmp_path / form
        d.mkdir()
        table = pa.table({"event_id": cols["event_id"], "ts": ts_arr, **{
            k: v for k, v in cols.items() if k != "event_id"}})
        pq.write_table(table, str(d / "events.parquet"))
        df = load_table(spark, str(d), "events")
        assert df.schema["ts"].dataType.typeName() == "timestamp_ntz"
        loaded[form] = sorted(map(tuple, df.collect()))
    assert loaded["ns"] == loaded["us"]


def test_alert_maildir_rfc822_and_idempotent(spark, tmp_path):
    """Alert rows land as parseable RFC-822 files with deterministic
    Message-IDs; re-delivery overwrites byte-identically."""
    from email import message_from_bytes

    from real_time_database_monitoring_system_spark.sources import sinks

    alerts = spark.createDataFrame(
        [(1, "cpu", 99.5), (2, "mem", 101.0)],
        "event_id long, event_type string, value double",
    )
    out = str(tmp_path / "maildir")
    paths = sinks.write_alert_maildir(alerts.orderBy("event_id"), out)
    assert len(paths) == 2
    first = open(paths[0], "rb").read()
    msg = message_from_bytes(first)
    assert msg["Subject"] == "Database Monitoring Alert"
    assert "event_type: cpu" in msg.get_payload()
    assert msg["Message-ID"].endswith("@rtdbms-spark>")
    again = sinks.write_alert_maildir(alerts.orderBy("event_id"), out)
    assert again == paths and open(paths[0], "rb").read() == first


def test_alert_maildir_cap_raises(spark, tmp_path):
    import pytest

    from real_time_database_monitoring_system_spark.sources import sinks

    many = spark.range(5).withColumnRenamed("id", "event_id")
    with pytest.raises(ValueError, match="paging storm"):
        sinks.write_alert_maildir(many, str(tmp_path / "m"), max_alerts=3)


def test_xlsx_array_cells_render_as_text(spark, tmp_path):
    """Array columns (an embeddings export) must not crash the NaN
    self-equality guard with numpy's elementwise != (r12 review)."""
    from real_time_database_monitoring_system_spark.sources.sinks import write_xlsx

    df = spark.createDataFrame(
        [(1, [0.5, 0.25]), (2, None)],
        "vec_id bigint, embedding array<double>",
    )
    out = str(tmp_path / "emb.xlsx")
    write_xlsx(df.orderBy("vec_id"), out)
    import zipfile

    sheet = zipfile.ZipFile(out).read("xl/worksheets/sheet1.xml").decode()
    assert "0.5" in sheet and "0.25" in sheet


def test_maildir_rerun_removes_stale_alerts(spark, tmp_path):
    """A re-run with FEWER/different alerts owns the dir: the previous
    run's alert files are cleared, so a relay can't double-deliver
    stale payloads (r12 review)."""
    import os

    from real_time_database_monitoring_system_spark.sources.sinks import (
        write_alert_maildir,
    )

    d = str(tmp_path / "mail")
    big = spark.createDataFrame(
        [(1, 98.7), (2, 99.1)], "alert_id bigint, value double"
    )
    write_alert_maildir(big, d)
    assert len([f for f in os.listdir(d) if f.endswith(".eml")]) == 2
    small = spark.createDataFrame([(1, 99.9)], "alert_id bigint, value double")
    paths = write_alert_maildir(small, d)
    left = [f for f in os.listdir(d) if f.endswith(".eml")]
    assert len(left) == 1 and os.path.basename(paths[0]) == left[0]
