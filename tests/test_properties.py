"""Property-based tests (hypothesis) for the pure-Python dialect
pieces — no SparkSession needed."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from real_time_database_monitoring_system_spark.functions.pg_dialect import pg_to_java_pattern

PG_ATOMS = ["YYYY", "YY", "MM", "DD", "HH24", "HH12", "HH", "MI", "SS", "MS", "AM", "MON", "DAY"]
SEPARATORS = ["-", "/", ":", ".", " ", ""]


@st.composite
def pg_patterns(draw):
    n = draw(st.integers(min_value=1, max_value=6))
    parts = []
    for _ in range(n):
        parts.append(draw(st.sampled_from(PG_ATOMS)))
        parts.append(draw(st.sampled_from(SEPARATORS)))
    return "".join(parts)


@given(pg_patterns())
@settings(max_examples=200)
def test_translation_is_total_and_atomic(pattern):
    out = pg_to_java_pattern(pattern)
    # no PG-only atoms survive
    assert "HH24" not in out
    assert "MI" not in out
    # length is bounded (no runaway expansion)
    assert len(out) <= 2 * len(pattern)


@given(st.text(alphabet="-/:. ", max_size=20))
def test_separators_pass_through(seps):
    assert pg_to_java_pattern(seps) == seps


def test_idempotent_on_translated_output_separators():
    # translating a pattern twice must not mangle separators
    once = pg_to_java_pattern("YYYY-MM-DD HH24:MI:SS")
    assert once == "yyyy-MM-dd HH:mm:ss"
