"""Explicit Bloom-filter runtime pruning for large semi-joins.

The scale problem: reducing a 100 TB fact table by a selective key set
has two classic plans — broadcast-hash semi join (needs the key set to
fit the broadcast limit as an EXACT hash set) or shuffle semi join
(moves the whole fact through the exchange). A Bloom filter splits the
difference: 100M keys at ~1% FPR is ~120 MB of bits — broadcastable —
and pruning happens MAP-SIDE on the fact scan, so only surviving rows
(true matches + the FPR slice) reach the shuffle for the exact join.
Catalyst injects this itself for some shuffle joins
(`spark.sql.optimizer.runtime.bloomFilter.enabled`); this module makes
the pattern explicit, tunable, and available where the optimizer
declines (e.g. keys produced by an arbitrary upstream pipeline).

Everything is built-in JVM expressions: ``xxhash64(key, seed)`` for
the k probe hashes, ``bit_or`` aggregation over shifted bits for the
build side, a one-row broadcast cross join to ship the words map, and
a ``forall`` probe filter. False positives are removed by the exact
semi join that follows, so results are exact for any (m, k); sizing
only affects how much reaches the shuffle.

No driver-side collect: the bit array is assembled as a (word → bits)
map inside one aggregated row and broadcast by the cross join — the
same broadcast-scalar shape as `monitoring`'s snapshot instant.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .util import materialize as _materialize

_WORD = 64  # bits per map entry (long)
# internal broadcast-column name; underscored + unlikely so a fact
# table carrying a same-named column can't make the cross join's
# resolution ambiguous (guarded again in bloom_prune)
_BLOOM_COL = "__bloom_words__"


class BloomFilter(NamedTuple):
    """A built filter plus the (m, k) it was built with — probing with
    different parameters than the build silently yields false
    negatives, so the handle carries them."""

    words: DataFrame  # one row: word-index → 64-bit long map
    m_bits: int
    k: int


def _positions_sql(key: str, m_bits: int, k: int) -> str:
    """SQL array of the k probe bit-positions for a key column (pmod
    keeps them non-negative; distinct seeds via the hashed literal).
    Built as a parsed SQL string — repo convention for expressions with
    many literal terms (one parse instead of k py4j round-trips), and
    bit-shift-by-column is SQL-only anyway."""
    probes = ", ".join(f"pmod(xxhash64({key}, {i}), {m_bits}L)" for i in range(k))
    return f"array({probes})"


def bloom_build(keys: DataFrame, key: str, m_bits: int = 1 << 20, k: int = 5) -> BloomFilter:
    """Build a Bloom filter over `keys.key` as a ONE-ROW DataFrame
    holding the bits as a word-index → long map. Build shape: explode
    the k positions per key (map-side), bit_or partial-aggregate per
    64-bit word — one shuffle over at most m_bits/64 groups — then
    collapse to a single map row."""
    pos = keys.select(
        F.explode(F.expr(_positions_sql(key, m_bits, k))).alias("pos")
    ).filter(F.col("pos").isNotNull())
    words = pos.selectExpr(
        f"cast(pos div {_WORD} as int) AS word",
        f"shiftleft(1L, cast(pos % {_WORD} as int)) AS bit",
    ).groupBy("word").agg(F.bit_or("bit").alias("bits"))
    one_row = words.agg(
        F.map_from_entries(F.collect_list(F.struct("word", "bits"))).alias(_BLOOM_COL)
    )
    return BloomFilter(one_row, m_bits, k)


def bloom_prune(fact: DataFrame, bloom: BloomFilter, key: str) -> DataFrame:
    """Filter `fact` to rows whose key MIGHT be in the built set (no
    false negatives; FPR set by the handle's m/k vs the key count). The
    one-row bloom side ships via broadcast nested-loop cross join; the
    probe is a map-lookup `forall` evaluated map-side in the scan
    stage."""
    if _BLOOM_COL in fact.columns:
        raise ValueError(
            f"fact table already carries the internal column {_BLOOM_COL!r}; "
            "rename it before bloom pruning"
        )
    probe = F.expr(
        f"forall({_positions_sql(key, bloom.m_bits, bloom.k)}, p -> "
        f"(coalesce(element_at({_BLOOM_COL}, cast(p div {_WORD} as int)), 0L)"
        f" & shiftleft(1L, cast(p % {_WORD} as int))) != 0)"
    )
    return fact.crossJoin(F.broadcast(bloom.words)).filter(probe).drop(_BLOOM_COL)


def bloom_semi_join(
    fact: DataFrame,
    keys: DataFrame,
    on: str,
    m_bits: int = 1 << 20,
    k: int = 5,
) -> DataFrame:
    """Exact semi join of `fact` against `keys`' `on` column, with the
    shuffle fed only by Bloom survivors. Equivalent to
    ``fact WHERE on IN (SELECT on FROM keys)`` for any (m, k).

    The distinct key set is materialized once and consumed by BOTH the
    bloom build and the exact join — keys are 'produced by an arbitrary
    upstream pipeline' by premise, and the diamond would otherwise
    re-run that pipeline."""
    keyset = _materialize(keys.select(on).distinct())
    bloom = bloom_build(keyset, on, m_bits, k)
    pruned = bloom_prune(fact, bloom, on)
    return pruned.join(keyset, on, "left_semi")
