"""Round-10 operators and guards.

Wave 0 here: the untracked-artifact guard (VERDICT r9 task 1) and the
ANSI-overflow pin (ADVICE r9: the kruskal/anova/brown_forsythe family
casts DECIMAL(38,0) sums to BIGINT at the edge — both engines must
fail LOUDLY past the documented exactness bound, never diverge
silently).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from conftest import stray_artifacts


class TestArtifactGuard:
    def test_flags_each_artifact_pattern(self):
        untracked = [
            "CORRECTNESS_r10.json",
            "BENCH_r10.json",
            "BENCH_DETAIL_r10.json",
            "NOTES.md",
            "real_time_database_monitoring_system_spark/operators/new.py",
        ]
        assert stray_artifacts(untracked) == [
            "CORRECTNESS_r10.json",
            "BENCH_r10.json",
            "BENCH_DETAIL_r10.json",
        ]

    def test_clean_tree_passes(self):
        assert stray_artifacts(["src/x.py", "BENCH_DETAIL.json"]) == []

    def test_non_artifact_json_ignored(self):
        # BENCH_DETAIL.json (the mutable latest-run copy) is tracked
        # and mutable by design; only the per-round archives gate.
        assert stray_artifacts(["COPYCHECK.json", "LEAKCHECK.json"]) == []


class TestAnsiOverflowIsLoud:
    """Pin the session contract the stats family's edge casts rely on:
    ANSI mode ON (Spark 4 default, never overridden by the session
    factory), so DECIMAL(38,0)→BIGINT past ±2^63 raises CAST_OVERFLOW
    — the same loud failure DuckDB's HUGEINT→BIGINT cast gives —
    instead of non-ANSI's silent NULL (which would silently diverge
    from the oracle past the documented exactness bounds of
    kruskal_from_value_counts / brown_forsythe / anova_oneway)."""

    def test_ansi_enabled(self, spark):
        assert spark.conf.get("spark.sql.ansi.enabled") == "true"

    def test_ansi_overflow_is_loud(self, spark):
        df = spark.range(1).select(
            F.expr(
                "CAST(CAST('99999999999999999999999999' AS DECIMAL(38,0))"
                " AS BIGINT)"
            ).alias("x")
        )
        with pytest.raises(Exception, match="CAST_OVERFLOW|overflow"):
            df.collect()

    def test_duckdb_overflow_is_loud(self):
        import duckdb

        with pytest.raises(Exception, match="[Oo]ut of [Rr]ange|[Oo]verflow"):
            duckdb.sql(
                "SELECT CAST(CAST('99999999999999999999999999' AS HUGEINT)"
                " AS BIGINT)"
            ).fetchall()
