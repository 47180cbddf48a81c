"""Round-13 optimization equivalence pins.

The r13 optimization round restructured hot operators without touching
what they compute; these tests make the equivalences falsifiable:

- `analytics._hl_select_group` (the Hodges–Lehmann order-statistic
  SELECTION that replaced the |V_ref|·|V_cur| grid) against a
  brute-force pairwise-difference grid on thousands of random
  fixtures, pure Python (no Spark) so the sweep is wide.
- `hl_from_value_counts` end-to-end on adversarial fixtures (the
  Spark path: rank targets, Arrow boundary, empty halves).
"""

from __future__ import annotations

import math
import random
from collections import defaultdict

import pandas as pd
import pytest
from pyspark.sql import functions as F

from real_time_database_monitoring_system_spark.operators import analytics


def _brute_hl(pv):
    """Oracle-shaped brute force: expand the full difference grid and
    read the four order statistics off the cumulative relation."""
    refs = [(v, cr) for v, cr, cc in pv if cr > 0]
    curs = [(v, cc) for v, cr, cc in pv if cc > 0]
    n_ref = sum(cr for _, cr, _ in pv)
    n_cur = sum(cc for _, _, cc in pv)
    if not refs or not curs:
        return None
    pairs: dict[int, int] = defaultdict(int)
    for vr, cr in refs:
        for vc, cc in curs:
            pairs[vc - vr] += cr * cc
    ds = sorted(pairs)
    cum, acc = {}, 0
    for d in ds:
        acc += pairs[d]
        cum[d] = acc
    npairs = n_ref * n_cur
    k_ci = max(
        1,
        math.floor(
            float(npairs) / 2
            - 1.96
            * math.sqrt(
                float(n_ref) * float(n_cur) * float(n_ref + n_cur + 1) / 12.0
            )
        ),
    )

    def pick(t):
        for d in ds:
            if cum[d] >= t:
                return d
        return None

    return (
        n_ref,
        n_cur,
        pick((npairs + 1) // 2),
        pick(npairs // 2 + 1),
        pick(k_ci),
        pick(npairs + 1 - k_ci),
    )


def _select_hl(pv):
    """Drive `_hl_select_group` the way applyInPandas does, with the
    rank targets computed the way the Spark expressions compute them."""
    n_ref = sum(cr for _, cr, _ in pv)
    n_cur = sum(cc for _, _, cc in pv)
    if n_ref == 0 or n_cur == 0:
        return None
    npairs = n_ref * n_cur
    k_ci = max(
        1,
        math.floor(
            float(npairs) / 2
            - 1.96
            * math.sqrt(
                float(n_ref) * float(n_cur) * float(n_ref + n_cur + 1) / 12.0
            )
        ),
    )
    pdf = pd.DataFrame(
        {
            "event_type": ["t"] * len(pv),
            "cents": [v for v, _, _ in pv],
            "c_ref": [cr for _, cr, _ in pv],
            "c_cur": [cc for _, _, cc in pv],
            "t_hl_lo": [(npairs + 1) // 2] * len(pv),
            "t_hl_hi": [npairs // 2 + 1] * len(pv),
            "t_ci_lo": [k_ci] * len(pv),
            "t_ci_hi": [npairs + 1 - k_ci] * len(pv),
        }
    )
    out = analytics._hl_select_group(pdf)
    if len(out) == 0:
        return None
    r = out.iloc[0]
    return (
        int(r["n_ref"]),
        int(r["n_cur"]),
        int(r["hl_lo_cents"]),
        int(r["hl_hi_cents"]),
        int(r["ci_lo_cents"]),
        int(r["ci_hi_cents"]),
    )


def test_hl_selection_matches_bruteforce_sweep():
    """The binary-search selection equals the full-grid cumulative
    read on thousands of random alphabets, including one-sided types,
    singleton alphabets, heavy ties and negative values."""
    rng = random.Random(13)
    checked = 0
    for _ in range(4000):
        nvals = rng.randint(1, 12)
        vals = rng.sample(range(-30, 31), nvals)
        pv = [
            (v, rng.randint(0, 3), rng.randint(0, 3))
            for v in vals
        ]
        pv = [row for row in pv if row[1] + row[2] > 0]
        if not pv:
            continue
        assert _select_hl(pv) == _brute_hl(pv), f"fixture: {pv}"
        checked += 1
    assert checked > 3000


def test_hl_selection_wide_alphabet_heavy_counts():
    """Large sparse alphabets with heavy counts (the shape the cents
    quantization actually produces) agree too."""
    rng = random.Random(1313)
    for _ in range(60):
        vals = rng.sample(range(-100_000, 100_000), rng.randint(50, 200))
        pv = [(v, rng.randint(0, 500), rng.randint(0, 500)) for v in vals]
        assert _select_hl(pv) == _brute_hl(pv)


def test_hl_from_value_counts_spark_path(spark):
    """End-to-end through the Spark plan (rank-target expressions,
    Arrow boundary, presentation sort): adversarial fixtures including
    a type whose halves never overlap and a type with one giant tie."""
    fixtures = [
        ("gap", -5, 3, 0),
        ("gap", 1000, 0, 7),
        ("tie", 42, 9, 9),
        ("mix", -3, 2, 1),
        ("mix", 0, 0, 4),
        ("mix", 11, 5, 0),
        ("mix", 12, 1, 2),
        ("onesided", 7, 4, 0),
    ]
    pv = spark.createDataFrame(
        fixtures, "event_type string, cents bigint, c_ref bigint, c_cur bigint"
    )
    got = {
        r["event_type"]: (
            r["n_ref"],
            r["n_cur"],
            r["hl_lo_cents"],
            r["hl_hi_cents"],
            r["ci_lo_cents"],
            r["ci_hi_cents"],
            r["hl_shift_cents"],
        )
        for r in analytics.hl_from_value_counts(pv).collect()
    }
    assert set(got) == {"gap", "tie", "mix"}
    for name in got:
        rows = [
            (v, cr, cc) for t, v, cr, cc in fixtures if t == name
        ]
        b = _brute_hl(rows)
        assert got[name][:6] == b, f"{name}: {got[name][:6]} != {b}"
        assert got[name][6] == (b[2] + b[3]) / 2


def test_hl_output_order_and_schema(spark):
    """Presentation contract unchanged: ordered by event_type, the
    eight columns in their historical order and types."""
    pv = spark.createDataFrame(
        [("b", 1, 1, 1), ("a", 2, 2, 2)],
        "event_type string, cents bigint, c_ref bigint, c_cur bigint",
    )
    out = analytics.hl_from_value_counts(pv)
    assert out.columns == [
        "event_type",
        "n_ref",
        "n_cur",
        "hl_lo_cents",
        "hl_hi_cents",
        "ci_lo_cents",
        "ci_hi_cents",
        "hl_shift_cents",
    ]
    rows = out.collect()
    assert [r["event_type"] for r in rows] == ["a", "b"]
    assert all(isinstance(r["hl_shift_cents"], float) for r in rows)


# ---------------------------------------------------------------------------
# Jonckheere–Terpstra: pandas prefix-matrix jt2 vs the dense-grid form
# ---------------------------------------------------------------------------


def _brute_jt2(cells):
    """Doubled JT from (h, cents, c) cells the slow way: expand every
    cell and sum, over ordered hour pairs, 2·#(x<y) + #(x==y) —
    restricted to hours 0..23 and non-null cents, the dense-grid
    domain."""
    vals = []
    for h, v, c in cells:
        if 0 <= h <= 23 and v is not None:
            vals.extend([(h, v)] * c)
    jt2 = 0
    for i, (h1, v1) in enumerate(vals):
        for h2, v2 in vals[i + 1 :]:
            if h1 == h2:
                continue
            lo, hi = ((v1, v2) if h1 < h2 else (v2, v1))
            if lo < hi:
                jt2 += 2
            elif lo == hi:
                jt2 += 1
    return jt2


def _pandas_jt2(cells):
    pdf = pd.DataFrame(
        {
            "event_type": ["t"] * len(cells),
            "h": [h for h, _, _ in cells],
            "cents": [v for _, v, _ in cells],
            "c": [c for _, _, c in cells],
        }
    )
    out = analytics._jt_grid_group(pdf)
    return int(out.iloc[0]["jt2d"])


def test_jt2_matches_bruteforce_sweep():
    rng = random.Random(131)
    for _ in range(300):
        ncells = rng.randint(1, 40)
        seen = set()
        cells = []
        for _ in range(ncells):
            h = rng.randint(0, 23)
            v = rng.randint(-5, 5)
            if (h, v) in seen:
                continue
            seen.add((h, v))
            cells.append((h, v, rng.randint(1, 4)))
        assert _pandas_jt2(cells) == _brute_jt2(cells), f"cells: {cells}"


def test_jt2_out_of_range_hours_and_null_cents_excluded():
    """Rows outside the 0–23 hour grid (pre-epoch negative hours) and
    NULL-cents rows never matched the former dense-grid join, so they
    are excluded from jt2 — while the Spark-side marginals still count
    them (pinned end-to-end below)."""
    base = [(1, 10, 2), (2, 20, 3)]
    with_extras = base + [(-3, 10, 5), (25, 20, 1)]
    assert _pandas_jt2(with_extras) == _brute_jt2(base)
    # NULL cents via the pandas path directly
    pdf = pd.DataFrame(
        {
            "event_type": ["t"] * 3,
            "h": [1, 2, 3],
            "cents": [10.0, 20.0, float("nan")],
            "c": [2, 3, 4],
        }
    )
    assert int(analytics._jt_grid_group(pdf).iloc[0]["jt2d"]) == _brute_jt2(
        [(1, 10, 2), (2, 20, 3)]
    )


def test_jt_from_cell_counts_spark_path(spark):
    """End-to-end: jt2 via the Arrow task, marginals via Spark, on a
    fixture with an out-of-range hour (counts in marginals, not jt2)."""
    rows = [
        ("a", 1, 10, 2),
        ("a", 2, 20, 3),
        ("a", -3, 10, 5),
        ("b", 0, 7, 1),
        ("b", 23, 7, 2),
    ]
    pc = spark.createDataFrame(
        rows, "event_type string, h bigint, cents bigint, c bigint"
    )
    got = {r["event_type"]: r.asDict() for r in analytics.jt_from_cell_counts(pc).collect()}
    # type a: jt2 over the in-grid cells only
    assert got["a"]["jt2"] == _brute_jt2([(1, 10, 2), (2, 20, 3)])
    # marginals count the out-of-range hour row too
    assert got["a"]["n_total"] == 10
    # per-hour sizes: h=1→2, h=2→3, h=-3→5 (the out-of-range hour counts)
    assert got["a"]["sum_n2"] == 2 * 2 + 3 * 3 + 5 * 5
    # type b: all ties at cents=7 across two hours → jt2 = #tie-pairs = 1*2
    assert got["b"]["jt2"] == 2
    assert got["b"]["n_total"] == 3


# ---------------------------------------------------------------------------
# Sign-LSH bands: vectorized Arrow pass vs the expression-chain spec
# ---------------------------------------------------------------------------


def _band_parity(spark, df, bands, bits):
    from real_time_database_monitoring_system_spark.operators import similarity

    arrow = similarity.banded_signatures_arrow(df, bands, bits)
    chain = df.select(
        "vec_id", "label", "vec",
        *similarity.near_dup_band_cols("vec", bands, bits),
    )
    assert chain.exceptAll(arrow).count() == 0
    assert arrow.exceptAll(chain).count() == 0


def test_arrow_bands_bit_identical_to_chain_real_corpus(spark, sf_dir):
    """Every band of every row of the real embeddings table must match
    the expression-chain spec exactly, at both the check-scale 6-bit
    and the prod 16-bit band widths."""
    from real_time_database_monitoring_system_spark.sources.registry import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    emb_d = emb.select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("vec")
    )
    _band_parity(spark, emb_d, 8, 6)
    _band_parity(spark, emb_d, 8, 16)


def test_arrow_bands_corner_cases(spark):
    """NULL vector / NULL element → all-zero bands (the chain's NULL
    dot); NaN element → every bit set (Spark's NaN ≥ 0.0 is true);
    longer-than-64 vectors use their first 64 elements — all checked
    against the chain itself; a shorter-than-64 vector raises (the
    chain's ANSI index would too)."""
    import random as _random

    from real_time_database_monitoring_system_spark.operators import similarity

    rng = _random.Random(7)
    rows = [(i, 1, [rng.uniform(-2, 2) for _ in range(64)]) for i in range(50)]
    rows.append((1000, 1, None))
    v = [0.5] * 64
    v[13] = None
    rows.append((1001, 1, v))
    v = [0.5] * 64
    v[7] = float("nan")
    rows.append((1002, 1, v))
    rows.append((1003, 1, [0.25] * 70))
    df = spark.createDataFrame(rows, "vec_id bigint, label int, vec array<double>")
    _band_parity(spark, df, 4, 6)

    short = spark.createDataFrame(
        [(1, 1, [0.5] * 10)], "vec_id bigint, label int, vec array<double>"
    )
    with pytest.raises(Exception, match="shorter"):
        similarity.banded_signatures_arrow(short, 2, 3).collect()
