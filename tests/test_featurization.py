"""Feature hashing, novelty scoring, and BPE pair statistics.

Oracle parity for the three registry entries is covered by
test_oracle_parity.py; here: algebraic invariants on real data and
exact expectations on constructed micro-corpora.
"""

from __future__ import annotations

import pytest

from real_time_database_monitoring_system_spark.operators import dedup, pipeline
from real_time_database_monitoring_system_spark.operators import text as text_ops
from real_time_database_monitoring_system_spark.sources.registry import SCHEMAS, load_table

_DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars int"


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(rows)], _DOC_SCHEMA
    )


def test_feature_hash_embed_is_unit_normalized(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    rows = pipeline.feature_hash_embed(docs).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        assert 0 <= r["bucket"] < 32
        assert r["tf"] >= 1
        by_doc.setdefault(r["doc_id"], []).append(r)
    n_tokens = {
        r["doc_id"]: r["n_tokens"]
        for r in text_ops.token_stats(docs).select("doc_id", "n_tokens").collect()
    }
    for doc_id, rs in by_doc.items():
        assert sum(r["weight"] ** 2 for r in rs) == pytest.approx(1.0, abs=1e-9)
        assert sum(r["tf"] for r in rs) == n_tokens[doc_id]


def test_doc_novelty_extremes_on_micro_corpus(spark):
    docs = _docs(
        spark,
        [
            "alpha beta gamma delta",      # duplicated content → novelty 0
            "alpha beta gamma delta",
            "unique words never repeated anywhere",  # → novelty 1
        ],
    )
    out = {r["doc_id"]: r for r in dedup.doc_novelty(docs).collect()}
    assert out[0]["novelty"] == 0.0 and out[1]["novelty"] == 0.0
    assert out[2]["novelty"] == 1.0
    assert out[2]["n_shingles"] == out[2]["n_unique"] == 3


def test_bpe_pair_stats_exact_micro_counts(spark):
    docs = _docs(spark, ["aaab ab", "ba"])
    out = [(r["pair"], r["n"]) for r in text_ops.bpe_pair_stats(docs).collect()]
    # aaab: aa,aa,ab ; ab: ab ; ba: ba → aa:2, ab:2, ba:1; ties pair-asc
    assert out == [("aa", 2), ("ab", 2), ("ba", 1)]


def test_featurization_tolerates_empty_input(spark):
    docs = spark.createDataFrame([], SCHEMAS["documents"])
    assert pipeline.feature_hash_embed(docs).count() == 0
    assert dedup.doc_novelty(docs).count() == 0
    assert text_ops.bpe_pair_stats(docs).count() == 0
