"""Corpus-curation operators a training-data pipeline runs between
dedup and shard-writing: benchmark decontamination, temperature-based
domain mixing, sequence-length bucketing, and snapshot reconciliation.

All four are deterministic, built-in-expression-only (JVM, codegen)
designs, so each has an exact DuckDB oracle twin. Cross-engine
arithmetic follows the repo's determinism rules: integer counts,
explicit parenthesization for the one double formula per operator, and
round(..., 9) at the output edge only.

Scale notes:
- `decontaminate` is an inverted-index join, never all-pairs: train
  shingles stream map-side into a join against the (small, broadcast)
  benchmark shingle set. The benchmark side is an eval suite — MBs,
  not TBs — so the broadcast is structural, not an optimization hack.
  At 100 TB the train side is one explode + one broadcast-hash-join +
  one keyed agg: no shuffle of the corpus at all.
- `temperature_sample` is a map-side filter after a broadcast join of
  per-source rates (a handful of rows). The only corpus shuffle is the
  per-source count, which partial-aggregates map-side.
- `length_buckets` is a single scan → two keyed aggs over ~11 groups.
- `snapshot_diff` shuffles both snapshots once on the key — the
  standard CDC reconciliation shape; at scale the two sides co-locate
  on the same hash partitioning, and bucketed tables would make it
  shuffle-free (see sources/bucketing.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _word_shingles
from .pipeline import content_hash_bucket
from .util import materialize as _materialize
from .util import spread as _spread


def decontaminate(train: DataFrame, bench: DataFrame, shingle_k: int = 3) -> DataFrame:
    """Benchmark decontamination: training documents sharing at least
    one word ``shingle_k``-gram with any benchmark document, with hit
    counts.

    This is the standard eval-leakage sweep a pipeline runs before
    training: exact n-gram collision against the held-out benchmark
    suite (production sweeps use k in 8..13; the default 3 matches the
    repo's tiny-vocabulary synthetic corpus so results are non-empty).
    Shingles are compared by 64-bit hash (cheap long equality; a
    cross-shingle collision needs ~2^32 distinct shingles).

    Returns (doc_id, n_hit_shingles, n_bench_docs) for contaminated
    train docs only: the distinct overlapping shingles and the distinct
    benchmark documents hit, ordered by doc_id.
    """
    t = (
        _shingle_hashes(train, shingle_k)
        .select("doc_id", "sh_h")
    )
    b = (
        _shingle_hashes(bench, shingle_k)
        .select(F.col("doc_id").alias("bench_id"), "sh_h")
    )
    return (
        t.join(F.broadcast(b), "sh_h")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("sh_h").alias("n_hit_shingles"),
            F.countDistinct("bench_id").alias("n_bench_docs"),
        )
        .orderBy("doc_id")
    )


def _shingle_hashes(documents: DataFrame, shingle_k: int) -> DataFrame:
    """(doc_id, sh_h): distinct hashed word-shingles per document."""
    return (
        _spread(documents, "doc_id", cap=4 * documents.rdd.getNumPartitions())
        .filter(F.size(F.filter(F.split("text", r"\s+"), lambda x: x != "")) >= shingle_k)
        .select("doc_id", F.explode(_word_shingles(F.col("text"), shingle_k)).alias("sh"))
        .select("doc_id", F.xxhash64("sh").alias("sh_h"))
    )


# one formula string per derived column, shared verbatim between the
# Spark plan (F.expr) and the DuckDB oracle (f-string injection) — a
# single source of truth keeps the double arithmetic bit-identical.
WEIGHT_SQL = "round(power(n_docs, {alpha!r}) / pow_sum, 9)"
RATE_SQL = (
    "round(least(CAST(1.0 AS DOUBLE), "
    "(({target_frac!r} * n_total) * power(n_docs, {alpha_m1!r})) / pow_sum), 9)"
)


def temperature_mix_weights(
    documents: DataFrame, alpha: float = 0.5, target_frac: float = 0.5
) -> DataFrame:
    """Per-source temperature mixing weights and sampling rates.

    Domain mixing reweights source s from its natural share c_s/N to
    w_s = c_s^alpha / sum(c^alpha) (alpha<1 upsamples small domains —
    the multilingual/multi-domain training mix rule). The sampling rate
    that realizes the mix at an overall keep fraction t is
    r_s = min(1, t * N * c_s^(alpha-1) / sum(c^alpha)), so expected
    kept docs per source ~ t * N * w_s.

    One keyed count over the corpus (map-side partial agg), a 2-column
    scalar aggregate, and a broadcast cross join — no corpus reshuffle.
    """
    # materialized: the totals aggregate AND the output join both read
    # `counts` — without it each consumer re-scans the corpus
    counts = _materialize(documents.groupBy("source").agg(F.count("*").alias("n_docs")))
    totals = counts.agg(
        F.expr(f"sum(power(n_docs, {alpha!r}))").alias("pow_sum"),
        F.sum("n_docs").alias("n_total"),
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "source",
            "n_docs",
            F.expr(WEIGHT_SQL.format(alpha=alpha)).alias("weight"),
            F.expr(
                RATE_SQL.format(target_frac=target_frac, alpha_m1=alpha - 1.0)
            ).alias("sample_rate"),
        )
        .orderBy("source")
    )


def temperature_sample(
    documents: DataFrame, alpha: float = 0.5, target_frac: float = 0.5
) -> DataFrame:
    """Deterministic temperature resample: keep each document iff its
    content-hash draw falls under its source's sampling rate.

    The draw is `md5(text) mod 1e6` — a property of the document, so
    reruns, retries, and other engines keep identical rows (the same
    content-addressed rule as `pipeline.hash_sample`, here with a
    per-source threshold). Map-side filter after a broadcast join of
    the tiny rates table; the corpus itself never shuffles.
    """
    rates = temperature_mix_weights(documents, alpha, target_frac).select(
        "source", "sample_rate"
    )
    return (
        _spread(documents, "doc_id", cap=4 * documents.rdd.getNumPartitions())
        .withColumn("h1e6", content_hash_bucket("text", 1_000_000))
        .join(F.broadcast(rates), "source")
        .filter(F.col("h1e6") < F.expr("CAST(floor(sample_rate * 1000000.0) AS BIGINT)"))
        .select("doc_id", "source", "lang", "n_chars")
        .orderBy("doc_id")
    )


# sequence-length bucket boundaries (tokens): [lo, hi) per bucket, the
# last bucket open-ended — the batching-efficiency histogram a trainer
# uses to pick packing lengths.
LENGTH_BUCKETS = [0, 8, 16, 32, 64, 128, 256, 512, 1024, 2048, 4096]


def length_bucket_case(ntok_sql: str) -> str:
    """ANSI-SQL CASE mapping a token count to its bucket id — valid
    verbatim in both Spark SQL and DuckDB (single source of truth for
    operator and oracle)."""
    whens = [
        f"WHEN {ntok_sql} < {hi} THEN {i}"
        for i, hi in enumerate(LENGTH_BUCKETS[1:])
    ]
    return "CAST(CASE " + " ".join(whens) + f" ELSE {len(LENGTH_BUCKETS) - 1} END AS INT)"


def length_bucket_label_case(ntok_sql: str) -> str:
    """Companion CASE producing the human-readable '[lo,hi)' label."""
    whens = [
        f"WHEN {ntok_sql} < {hi} THEN '[{LENGTH_BUCKETS[i]},{hi})'"
        for i, hi in enumerate(LENGTH_BUCKETS[1:])
    ]
    last = f"'[{LENGTH_BUCKETS[-1]},inf)'"
    return "CASE " + " ".join(whens) + f" ELSE {last} END"


def length_buckets(documents: DataFrame) -> DataFrame:
    """Token-length histogram over power-of-two buckets: documents and
    token mass per bucket, plus each bucket's share of corpus tokens.

    Sequence-length distribution drives batch packing efficiency (pad
    waste) and max-length cutoff choices. One scan computes token
    counts; the aggregation is ~11 groups with map-side combine; the
    corpus-total join is a broadcast scalar (the repo's injected-scalar
    pattern, not a driver-side collect)."""
    n_tok = F.size(F.filter(F.split("text", r"\s+"), lambda x: x != "")).cast("bigint")
    d = _spread(documents, "doc_id", cap=4 * documents.rdd.getNumPartitions()).select(
        "doc_id",
        n_tok.alias("n_tokens"),
    ).select(
        "n_tokens",
        F.expr(length_bucket_case("n_tokens")).alias("bucket_id"),
        F.expr(length_bucket_label_case("n_tokens")).alias("bucket_label"),
    )
    # materialized: corpus total and the share join both read `agg`
    agg = _materialize(
        d.groupBy("bucket_id", "bucket_label").agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
    )
    corpus = agg.agg(F.sum("total_tokens").alias("corpus_tokens"))
    return (
        agg.crossJoin(F.broadcast(corpus))
        .select(
            "bucket_id",
            "bucket_label",
            "n_docs",
            "total_tokens",
            F.expr(
                "round(CAST(total_tokens AS DOUBLE) / CAST(corpus_tokens AS DOUBLE), 9)"
            ).alias("token_share"),
        )
        .orderBy("bucket_id")
    )


def incremental_dedup(old: DataFrame, new: DataFrame, key: str = "doc_id") -> DataFrame:
    """Incremental-ingest dedup: the documents of a new snapshot that
    actually need to (re-)enter the processing pipeline.

    A re-crawl lands as a full snapshot, but only a sliver is new work.
    A document qualifies iff ALL of:
      1. its key is new, or its content fingerprint changed for that
         key ('added' / 'changed' — the `snapshot_diff` classes);
      2. its content does not already exist in the old snapshot under
         ANY key (a moved/re-posted document is not new work);
      3. within the new batch, it is the minimum-key holder of its
         fingerprint (batch-internal exact dedup — same
         first-row-per-key rule as `mutation.insert_ignore`).

    Shapes: one keyed left join old↔new (same narrow CDC join as
    `snapshot_diff`), one left_anti on fingerprint against the old
    content set, one fingerprint-partitioned row_number. Three shuffles
    total, each on a join/window key, never all-pairs; with bucketed
    snapshot tables the keyed join is shuffle-free."""
    o = old.select(F.col(key), F.md5(F.col("text").cast("binary")).alias("fp"))
    n = new.select(F.col(key), F.md5(F.col("text").cast("binary")).alias("fp"))
    changed = (
        n.join(o.select(F.col(key), F.col("fp").alias("old_fp")), key, "left")
        .filter(F.col("old_fp").isNull() | (F.col("old_fp") != F.col("fp")))
        .select(
            key,
            "fp",
            F.when(F.col("old_fp").isNull(), F.lit("added"))
            .otherwise(F.lit("changed"))
            .alias("status"),
        )
    )
    from pyspark.sql.window import Window

    batch_rep = changed.withColumn(
        "rn", F.row_number().over(Window.partitionBy("fp").orderBy(key))
    ).filter(F.col("rn") == 1)
    return (
        batch_rep.join(o.select("fp").distinct(), "fp", "left_anti")
        .select(key, "status")
        .orderBy(key)
    )


def incremental_dedup_near(
    old: DataFrame,
    new: DataFrame,
    key: str = "doc_id",
    threshold: float = 0.5,
    shingle_k: int = 3,
) -> DataFrame:
    """Incremental-ingest dedup with a NEAR-duplicate rule: the
    documents of a new snapshot that need to (re-)enter the pipeline,
    where a doc is dropped not only if its exact content already lives
    in the old snapshot (`incremental_dedup`'s three rules) but also
    if it is a MinHash-verified near-duplicate (word-``shingle_k``-gram
    Jaccard ≥ ``threshold``) of ANY old document — the rule that makes
    a re-crawl drop lightly-edited re-posts, boilerplate re-wraps, and
    its own revisions, not just byte-identical copies.

    Composition, not new machinery: the exact pass is
    `incremental_dedup` verbatim; the near pass runs the portable
    MinHash family (`dedup.portable_shingle_hashes` /
    `portable_bands`) over BOTH sides, joins band keys new↔old for
    candidates, and verifies exact Jaccard on the shared 60-bit
    shingle-key sets — so the whole decision is bit-reproducible in
    any engine (the `minhash_lsh_pairs_portable` contract).

    Bounds at scale: the near pass only signs the exact-pass SURVIVORS
    on the new side (a re-crawl's sliver, not the snapshot); the old
    side is one signature pass over the corpus — in production it is
    precomputed once and reused across re-crawls (signatures are
    content-addressed). Candidates are band-equality matches only —
    never all-pairs — and the exact verify runs on candidates only.
    Near-dup checking WITHIN the new batch needs transitive
    clustering (`dedup.dup_clusters`); this operator scopes the near
    rule to new↔old — `incremental_dedup_near_transitive` below adds
    the within-batch collapse on top.

    Docs with fewer than ``shingle_k`` tokens have no signature and
    cannot match the near rule — the exact rule still applies to them.
    Returns (key, status) for kept docs, ordered by key."""
    kept, _ = _incremental_near_core(old, new, key, threshold, shingle_k)
    return kept.orderBy(key)


def _incremental_near_core(old, new, key, threshold, shingle_k):
    """`incremental_dedup_near` body, additionally returning the
    new-side signature relation so `incremental_dedup_near_transitive`
    can run its within-batch pass WITHOUT a third signing scan (the
    hashes relation is per-document — slicing it to the kept ids is
    identical to re-signing the kept docs)."""
    from .dedup import portable_bands, portable_shingle_hashes

    old_docs = old.select(F.col(key).alias("doc_id"), "text")
    # The old-side signing pass (the corpus-sized one) depends only on
    # `old`, while the exact CDC pass and the survivor signing chain
    # depend on old+new — two independent eager pipelines. Overlap
    # them from a 2-thread pool so the old-side shingle/hash jobs
    # back-fill the survivor chain's stragglers instead of running
    # strictly after it (guide §2.6; the `_dedup_verdicts` pattern).
    # Results unchanged: threads only build/materialize deterministic
    # relations; composition below stays lazy.
    from concurrent.futures import ThreadPoolExecutor

    def _surv_chain():
        # diamond: the exact-pass survivors feed the near pass AND the
        # final anti-join — materialize or the CDC join/window re-runs
        surv = _materialize(incremental_dedup(old, new, key))
        new_docs = new.join(surv.select(key), key).select(
            F.col(key).alias("doc_id"), "text"
        )
        return surv, portable_shingle_hashes(new_docs, shingle_k)

    with ThreadPoolExecutor(max_workers=2) as pool:
        f_old = pool.submit(portable_shingle_hashes, old_docs, shingle_k)
        f_surv = pool.submit(_surv_chain)
        hs_old = f_old.result()
        surv, hs_new = f_surv.result()
    cand = (
        portable_bands(hs_new)
        .withColumnRenamed("doc_id", "new_id")
        .join(
            portable_bands(hs_old).withColumnRenamed("doc_id", "old_id"),
            ["band_id", "band_key"],
        )
        .select("new_id", "old_id")
        .distinct()
    )
    sets_new = hs_new.groupBy("doc_id").agg(
        F.array_sort(F.collect_set("h")).alias("hs_n")
    )
    sets_old = hs_old.groupBy("doc_id").agg(
        F.array_sort(F.collect_set("h")).alias("hs_o")
    )
    verified = cand.join(
        sets_new.select(F.col("doc_id").alias("new_id"), "hs_n"), "new_id"
    ).join(sets_old.select(F.col("doc_id").alias("old_id"), "hs_o"), "old_id")
    inter = F.size(F.array_intersect("hs_n", "hs_o"))
    union = F.size("hs_n") + F.size("hs_o") - inter
    near = (
        verified.filter(
            inter.cast("double") / union.cast("double") >= F.lit(threshold)
        )
        .select(F.col("new_id").alias(key))
        .distinct()
    )
    return surv.join(near, key, "left_anti"), hs_new


def incremental_dedup_near_transitive(
    old: DataFrame,
    new: DataFrame,
    key: str = "doc_id",
    threshold: float = 0.5,
    shingle_k: int = 3,
) -> DataFrame:
    """`incremental_dedup_near` plus the within-batch collapse that
    operator documents as out of scope: after the exact and new↔old
    near rules, the surviving batch may still contain near-duplicates
    OF EACH OTHER (a re-crawl picking up several mirrors of the same
    page in one snapshot). This composes the survivors with
    `dedup.minhash_lsh_pairs_portable` (same portable MinHash family,
    same threshold/shingle operating point) and
    `dedup.dup_clusters`' bounded connected components: each
    within-batch near-dup cluster keeps only its minimum-key member.

    Composition, not new machinery: pass 1 is
    `incremental_dedup_near` verbatim; pass 2 runs banded candidates +
    exact-Jaccard verify over ONLY the pass-1 survivors (a re-crawl's
    sliver, so the self-join side is small by construction) — and over
    pass 1's ALREADY-MATERIALIZED signature relation sliced to the
    kept ids, so the batch is signed once, not twice (signatures are
    per-document: the slice is identical to re-signing). The CC
    label IS the minimum reachable key, so "keeper = own label" needs
    no extra ranking. Iteration count is bounded by near-dup component
    diameter (stars/short chains — the `dup_clusters` contract).

    Returns (key, status) for kept documents, ordered by key."""
    from .dedup import dup_clusters, minhash_lsh_pairs_from_hashes

    kept1, hs_new = _incremental_near_core(old, new, key, threshold, shingle_k)
    kept = _materialize(kept1)
    hs_kept = hs_new.join(
        kept.select(F.col(key).alias("doc_id")), "doc_id"
    )
    pairs = minhash_lsh_pairs_from_hashes(hs_kept, threshold=threshold)
    losers = (
        dup_clusters(pairs)
        .filter(F.col("cluster_id") != F.col("doc_id"))
        .select(F.col("doc_id").alias(key))
    )
    return kept.join(losers, key, "left_anti").orderBy(key)


def snapshot_diff(old: DataFrame, new: DataFrame, key: str = "doc_id") -> DataFrame:
    """Snapshot reconciliation (CDC classify): per-key status between
    two corpus snapshots — 'added', 'deleted', 'changed' (content
    fingerprint differs), or 'unchanged'.

    The incremental-ingest primitive: a re-crawl lands as a new
    snapshot and only added/changed documents re-enter the dedup →
    score → pack pipeline. Content identity is md5 of the text, so the
    comparison is a narrow (key, fingerprint) full-outer join — one
    shuffle on the key per side; with bucketed snapshot tables
    (sources/bucketing.py) it is shuffle-free."""
    o = old.select(F.col(key), F.md5(F.col("text").cast("binary")).alias("old_fp"))
    n = new.select(F.col(key), F.md5(F.col("text").cast("binary")).alias("new_fp"))
    status = (
        F.when(F.col("old_fp").isNull(), F.lit("added"))
        .when(F.col("new_fp").isNull(), F.lit("deleted"))
        .when(F.col("old_fp") == F.col("new_fp"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return (
        o.join(n, key, "full_outer")
        .select(key, status.alias("status"))
        .orderBy(key)
    )


def cap_per_source(documents: DataFrame, k: int = 10) -> DataFrame:
    """Per-domain document cap: keep at most ``k`` documents per
    source, preferring longer documents (n_chars DESC, doc_id
    tiebreak). The standard anti-over-representation guard for web
    corpora — a single crawl domain must not dominate the mixture.

    One window shuffle on source; at 100 TB a skewed mega-domain is
    still a single partition's sorted run (O(n log n) local sort, no
    quadratic step), and since only rank ≤ k survives, a pre-filter
    with AQE skew-split handles even a pathological domain. Selection
    by explicit ordered rank keeps reruns byte-identical (a
    rand()-based cap would not be)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("source").orderBy(F.col("n_chars").desc(), "doc_id")
    return (
        documents.withColumn("rank_in_source", F.row_number().over(w).cast("int"))
        .filter(F.col("rank_in_source") <= k)
        .select("doc_id", "source", "n_chars", "rank_in_source")
        .orderBy("source", "rank_in_source")
    )


def assign_split(
    documents: DataFrame, train_pct: int = 90, val_pct: int = 5
) -> DataFrame:
    """Deterministic train/val/test assignment by keyed hash bucket:
    md5(doc_id) % 100 → train < train_pct ≤ val < train_pct+val_pct ≤
    test. Keyed on the stable document id (not content) so a document
    keeps its split across content-touching pipeline runs — the
    property that prevents silent eval-set leakage when a cleaning
    pass rewrites text.

    Pure map-side expression: no shuffle, no RNG state, agrees across
    engines and reruns row for row (same portable md5-prefix bucket as
    pipeline.content_hash_bucket)."""
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 8),
            16,
            10,
        ).cast("bigint")
        % 100
    )
    return (
        documents.withColumn("bucket", bucket)
        .select(
            "doc_id",
            "source",
            "bucket",
            F.when(F.col("bucket") < train_pct, "train")
            .when(F.col("bucket") < train_pct + val_pct, "val")
            .otherwise("test")
            .alias("split"),
        )
        .orderBy("doc_id")
    )


def split_leakage(
    documents: DataFrame,
    train_pct: int = 90,
    val_pct: int = 5,
    prefix_chars: int | None = 40,
) -> DataFrame:
    """Eval-set leakage audit: content fingerprints that occur in MORE
    THAN ONE split — a train/test pair of matching documents means the
    eval metric is partly memorization. `assign_split` keys on doc_id
    precisely so cleaning can't move a doc across splits; this is the
    complementary check that two DIFFERENT doc_ids with matching
    content didn't land on opposite sides (which only dedup, not split
    keying, can prevent).

    `prefix_chars` picks the leak class: the default fingerprints the
    first N normalized characters — shared openings (templated or
    boilerplate-prefixed documents), the common real-world leak that
    whole-document hashing misses; `None` demands byte-identical
    documents. One digest groupBy (the exact-dedup exchange)
    collecting distinct splits per fingerprint; leaked rows are
    fingerprints with ≥ 2 distinct splits.
    """
    split_col = (
        F.when(F.col("bucket") < train_pct, "train")
        .when(F.col("bucket") < train_pct + val_pct, "val")
        .otherwise("test")
    )
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 8),
            16,
            10,
        ).cast("bigint")
        % 100
    )
    norm = F.lower(F.trim(F.regexp_replace("text", r"\s+", " ")))
    if prefix_chars is not None:
        norm = F.substring(norm, 1, prefix_chars)
    tagged = documents.withColumn("bucket", bucket).select(
        F.md5(norm.cast("binary")).alias("content_fp"),
        "doc_id",
        split_col.alias("split"),
    )
    return (
        tagged.groupBy("content_fp")
        .agg(
            F.count("*").alias("n_docs"),
            F.array_sort(F.collect_set("split")).alias("splits"),
            F.min("doc_id").alias("example_doc_id"),
        )
        .filter(F.size("splits") >= 2)
        .select(
            "content_fp",
            "n_docs",
            F.array_join("splits", ",").alias("splits"),
            "example_doc_id",
        )
        .orderBy("example_doc_id")
    )


def shuffle_order(documents: DataFrame, salt: str = "shuffle:") -> DataFrame:
    """Deterministic global shuffle for training order: sort by
    md5(salt || doc_id). Changing the salt reshuffles; the same salt
    reproduces the exact order on any engine — rand()-ordered writes
    are unrepeatable and partition-count-dependent.

    The ORDER BY is a range-partitioned distributed sort (Spark
    samples split points), which a training-shard writer needs anyway
    for a total order; shard position within each output file is then
    assigned per-partition at write time (see
    sinks.write_sharded_corpus), never via a driver-side loop or a
    single global window."""
    key = F.md5(
        F.concat(F.lit(salt), F.col("doc_id").cast("string")).cast("binary")
    )
    return documents.select("doc_id", "source", key.alias("shuffle_key")).orderBy(
        "shuffle_key", "doc_id"
    )


def temporal_split(
    events: DataFrame, train_frac: float = 0.8, embargo_minutes: int = 60
) -> DataFrame:
    """Leakage-safe temporal train/eval split: train is everything up
    to the `train_frac` time quantile, eval starts only after an
    embargo gap past the cutoff, and rows inside the gap are labeled
    'embargo' (excluded from both). Hash splits (`assign_split`) give
    i.i.d. partitions; models evaluated on the FUTURE need this
    time-ordered form, and the embargo keeps trailing-window features
    computed near the boundary from leaking eval-period signal into
    training.

    The cutoff is a `percentile_disc` order statistic on integer µs
    (a real timestamp from the data — engine-exact, no interpolation),
    computed in one column-pruned aggregate and broadcast back; the
    labeling itself is a map-side comparison. One scan, zero wide
    shuffles beyond the presentation sort.
    """
    # Spark's percentile_disc yields DOUBLE; µs values are < 2^53 so
    # the bigint round-trip is exact (and matches the oracle's type)
    cut = events.agg(
        F.expr(
            "cast(percentile_disc("
            + repr(train_frac)
            + ") WITHIN GROUP (ORDER BY unix_micros(cast(ts as timestamp))) as bigint)"
        ).alias("cutoff_us")
    )
    us = F.expr("unix_micros(cast(ts as timestamp))")
    embargo_us = embargo_minutes * 60_000_000
    return (
        events.crossJoin(F.broadcast(cut))
        .select(
            "event_id",
            us.alias("us"),
            "cutoff_us",
            F.when(us <= F.col("cutoff_us"), "train")
            .when(us > F.col("cutoff_us") + F.lit(embargo_us), "eval")
            .otherwise("embargo")
            .alias("split"),
        )
        .orderBy("event_id")
    )


def k_anonymity_audit(customer: DataFrame, k: int = 5) -> DataFrame:
    """k-anonymity audit over the customer table's quasi-identifier
    lattice — the privacy gate a data-release / training-data pipeline
    runs AFTER direct-identifier scrubbing (`text.pii_redact` removes
    emails and phones; re-identification risk comes from the columns
    that remain). A release is k-anonymous iff every quasi-identifier
    combination matches ≥ k rows.

    One Expand + ONE aggregation evaluates the whole generalization
    lattice — GROUPING SETS ((nationkey, mktsegment), (nationkey),
    (mktsegment)) — then an O(#groups) summary per set reports the
    decision panel: smallest anonymity set, rows at risk (members of
    groups below k), and whether dropping a column achieves
    k-anonymity. At 100 TB this is one column-pruned scan + one
    grouped shuffle; the feed is never windowed or self-joined.
    """
    if k <= 0:
        raise ValueError("k_anonymity_audit: k must be positive")
    groups = (
        customer.groupingSets(
            [["c_nationkey", "c_mktsegment"], ["c_nationkey"], ["c_mktsegment"]],
            "c_nationkey",
            "c_mktsegment",
        )
        .agg(
            F.grouping("c_nationkey").cast("int").alias("g_nat"),
            F.grouping("c_mktsegment").cast("int").alias("g_seg"),
            F.count("*").alias("n"),
        )
    )
    qi_set = (
        F.when((F.col("g_nat") == 0) & (F.col("g_seg") == 0), "nationkey+mktsegment")
        .when(F.col("g_nat") == 0, "nationkey")
        .otherwise("mktsegment")
    )
    return (
        groups.groupBy(qi_set.alias("qi_set"))
        .agg(
            F.count("*").alias("n_groups"),
            F.min("n").alias("min_group_n"),
            F.sum(F.when(F.col("n") < k, F.col("n")).otherwise(F.lit(0)))
            .alias("rows_at_risk"),
            (F.min("n") >= k).alias("k_anonymous"),
        )
        .orderBy("qi_set")
    )


def data_contract_audit(events: DataFrame) -> DataFrame:
    """Declarative data-quality gate (the Deequ/Great-Expectations
    shape): verify the feed against its published contract — nullity,
    key uniqueness, value ranges, categorical domain, timestamp sanity
    — and emit one decision row per expectation. This is the admission
    check a 100 TB ingest runs BEFORE letting a batch into the lake;
    the reference's equivalent is per-row form validation in Django.

    ALL expectations evaluate in ONE aggregation pass over the feed
    (map-side partials; the distinct-count rides the same shuffle), so
    the audit costs one scan regardless of how many expectations the
    contract carries. The wide→long reshape is a constant-width
    `stack` over the single result row. Violation counts are exact
    integers; `observed` is the violation count (or row count for the
    volume check) cast to double at the edge.
    """
    domain = ["click", "error", "purchase", "signup", "view"]
    dom = ", ".join(f"'{d}'" for d in domain)
    a = events.agg(
        F.count("*").alias("n"),
        F.count_distinct("event_id").alias("n_key"),
        F.sum(F.when(F.col("event_id").isNull(), 1).otherwise(0)).alias("null_key"),
        F.sum(F.when(F.col("user_id").isNull(), 1).otherwise(0)).alias("null_user"),
        F.sum(F.when(F.col("value") < 0, 1).otherwise(0)).alias("neg_value"),
        F.sum(F.when(F.col("value") > 400, 1).otherwise(0)).alias("high_value"),
        F.sum(
            F.when(~F.col("event_type").isin(domain), 1).otherwise(0)
        ).alias("bad_type"),
        F.sum(
            F.when(
                (F.col("ts") < F.lit("2020-01-01").cast("timestamp_ntz"))
                | (F.col("ts") >= F.lit("2035-01-01").cast("timestamp_ntz")),
                1,
            ).otherwise(0)
        ).alias("bad_ts"),
    )
    return (
        a.selectExpr(
            f"""stack(8,
            'event_id_not_null', CAST(null_key AS DOUBLE), null_key = 0,
            'event_id_unique', CAST(n - n_key AS DOUBLE), n = n_key,
            'event_type_in_domain', CAST(bad_type AS DOUBLE), bad_type = 0,
            'row_count_min_1', CAST(n AS DOUBLE), n >= 1,
            'ts_in_2020_2035', CAST(bad_ts AS DOUBLE), bad_ts = 0,
            'user_id_not_null', CAST(null_user AS DOUBLE), null_user = 0,
            'value_below_400', CAST(high_value AS DOUBLE), high_value = 0,
            'value_non_negative', CAST(neg_value AS DOUBLE), neg_value = 0
            ) AS (expectation, observed, pass)"""
        )
        .orderBy("expectation")
    )


def contamination_by_source(
    train: DataFrame, bench: DataFrame, shingle_k: int = 13
) -> DataFrame:
    """Per-source contamination report: how much of each ingest
    source collides with the benchmark suite at the production
    13-gram operating point — the table that turns `decontaminate`'s
    per-document verdicts into the ingest-level decision ("source X
    is 4% benchmark text: quarantine the source, don't just drop the
    hits").

    Pure composition: `decontaminate` verbatim (broadcast benchmark
    shingle sets, distinct-hit counting) left-joined back to the
    train-side source column, reduced to one #sources-row aggregate
    of exact integers with a single double division."""
    hits = decontaminate(train, bench, shingle_k).select(
        "doc_id", "n_hit_shingles"
    )
    per = train.select("doc_id", "source").join(hits, "doc_id", "left")
    return (
        per.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("n_hit_shingles").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_contaminated"),
            F.sum(F.coalesce("n_hit_shingles", F.lit(0)))
            .cast("bigint")
            .alias("n_hit_shingles"),
        )
        .select(
            "source",
            "n_docs",
            "n_contaminated",
            "n_hit_shingles",
            (
                F.col("n_contaminated").cast("double")
                / F.col("n_docs").cast("double")
            ).alias("contamination_rate"),
        )
        .orderBy("source")
    )


def decile_assign_sql(nbins: int, col: str = "q3") -> str:
    """Bucket-assignment expression over cut columns c1..c{nbins-1}:
    1 + Σ (col > c_i) — generated from one constant so the Spark
    operator and the DuckDB oracle can never drift (the
    `psi_bin_case_sql` rule). Values equal to a cut fall in the lower
    bucket (`percentile_disc` cuts are actual data values, so the
    boundary comparison is exact, not a float guess)."""
    terms = "".join(
        f" + (CASE WHEN {col} > c{i} THEN 1 ELSE 0 END)"
        for i in range(1, nbins)
    )
    return "1" + terms


def quality_calibration_curve(documents: DataFrame, nbins: int = 10) -> DataFrame:
    """Does the quality score actually PREDICT duplication? Per
    quality decile: document count, exact-duplicate count, dup rate —
    the calibration readout that decides whether quality-gated
    sampling (`quality_quantile_filter`) will amplify or suppress the
    duplicated mass. (On real crawls low-quality deciles carry most of
    the boilerplate mirrors; a flat curve means the score is blind to
    them and dedup must run first.)

    Exactness: deciles come from `disc_quantiles_from_counts` cuts
    over the integer-thousandths quantized score (order statistics —
    engine-exact); assignment is `decile_assign_sql` comparisons; the
    dup flag is the `exact_dedup` digest group size. One final double
    division per decile row.

    Scale shape: the quality pass reduces to a per-doc relation; cuts
    run over the QUANTIZED distinct-score counts — bounded at ~100k
    values forever (see the q3 comment below), never growing with the
    corpus; the digest shuffle is `exact_dedup`'s own exchange; decile
    assignment is a broadcast of one 9-column row. Output = `nbins`
    rows."""
    from .text import quality_score
    from .util import disc_quantiles_from_counts as _disc_quantiles

    # deciles run on the INTEGER-thousandths grid q3 = floor(q·1000):
    # the raw quality double is near-unique, so a cuts relation over it
    # grows with the corpus (a 500k-doc single-partition window in the
    # 100× stress run); floor quantization bounds the distinct-value
    # alphabet at ~100k forever. floor (not round) on purpose — both
    # engines floor the identical product double identically, with no
    # .5-boundary rounding-mode divergence (the drift_cusum trap).
    q = _materialize(
        quality_score(documents).select(
            "doc_id",
            F.expr("CAST(floor(quality * 1000) AS BIGINT)").alias("q3"),
        )
    )
    cuts = _disc_quantiles(
        q, [], "q3", [(f"c{i}", i, nbins) for i in range(1, nbins)]
    )
    norm = F.lower(F.trim(F.regexp_replace("text", r"\s+", " ")))
    # diamond rule: the digest relation feeds the cluster-size
    # aggregate AND the flag join — materialize or the corpus scan +
    # md5 runs twice
    fps = _materialize(
        documents.select(
            "doc_id", F.md5(norm.cast("binary")).alias("content_fp")
        )
    )
    sizes = fps.groupBy("content_fp").agg(F.count("*").alias("n_copies"))
    flagged = fps.join(sizes, "content_fp").select(
        "doc_id", (F.col("n_copies") > 1).alias("is_dup")
    )
    assigned = q.crossJoin(F.broadcast(cuts)).select(
        "doc_id", F.expr(decile_assign_sql(nbins)).cast("int").alias("decile")
    )
    return (
        assigned.join(flagged, "doc_id")
        .groupBy("decile")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("is_dup"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_dup"),
        )
        .select(
            "decile",
            "n_docs",
            "n_dup",
            (F.col("n_dup").cast("double") / F.col("n_docs").cast("double")).alias(
                "dup_rate"
            ),
        )
        .orderBy("decile")
    )


def temporal_split_kll(
    events: DataFrame, train_frac: float = 0.8, accuracy: int = 10000
) -> DataFrame:
    """The 100 TB path for `temporal_split`'s cutoff, verdict-column
    checked: event-time µs keys are near-unique, so this is the ONE
    quantile site where the counts conversion reduces nothing
    (documented in the percentile-family notes) — the production
    cutoff comes from the mergeable GK/KLL sketch
    (`approx_percentile`, single pass, bounded state) instead of the
    exact `percentile_disc` (which buffers the feed). The hashed
    output carries the EXACT cutoff, the achieved train fraction
    under it, and a rank-window boolean asserting the sketch cutoff
    sits inside its published ±n/accuracy rank bound
    (`sketches.rank_window_ok` — tie-robust, falsifiability
    unit-pinned); the raw sketch value stays out of the hash (the
    `value_percentiles_approx_checked` pattern). A deterministic
    oracle emits literal TRUE, so any estimator-contract violation
    hash-mismatches in a driver round."""
    from .sketches import rank_window_ok

    us = F.expr("unix_micros(cast(ts as timestamp))")
    approx = events.agg(
        F.expr(
            f"approx_percentile(unix_micros(cast(ts as timestamp)),"
            f" {train_frac!r}, {accuracy})"
        ).alias("a_cut")
    )
    # diamond rule: g feeds the exact-rank count AND the final panel
    g = _materialize(events.crossJoin(F.broadcast(approx)).agg(
        F.count("*").alias("n_events"),
        F.expr(
            "cast(percentile_disc("
            + repr(train_frac)
            + ") WITHIN GROUP (ORDER BY unix_micros(cast(ts as timestamp)))"
            " as bigint)"
        ).alias("cutoff_us_exact"),
        F.sum((us < F.col("a_cut")).cast("long")).alias("lt"),
        F.sum((us <= F.col("a_cut")).cast("long")).alias("le"),
    ))
    exact_le = events.crossJoin(
        F.broadcast(g.select("cutoff_us_exact"))
    ).agg(
        F.sum((us <= F.col("cutoff_us_exact")).cast("long")).alias("n_train")
    )
    return (
        g.crossJoin(F.broadcast(exact_le))
        .select(
            F.col("n_events").cast("bigint").alias("n_events"),
            "cutoff_us_exact",
            F.col("n_train").cast("bigint").alias("n_train"),
            (
                F.col("n_train").cast("double") / F.col("n_events").cast("double")
            ).alias("train_frac_achieved"),
            rank_window_ok(
                F.col("lt"), F.col("le"), F.col("n_events"), train_frac,
                eps=1.0 / accuracy,
            ).alias("kll_cutoff_in_rank_bound"),
        )
    )


def len_quality_histogram(
    documents: DataFrame, len_quant: int = 64
) -> DataFrame:
    """Per-source 2-d joint histogram of document length × quality
    band — the mix-design readout a training-data pipeline reads
    before setting per-source sampling weights: two sources with the
    same mean quality can carry it in opposite corners (short-clean vs
    long-noisy), and caps/mixing tuned on marginals alone miss that.
    Each cell reports its count and its share WITHIN the source, so
    sources of different sizes compare directly.

    Bands are FIXED-WIDTH (length: n_chars div ``len_quant``; quality:
    floor(quality/10), clamped to 9 — the `windowed_psi` rationale:
    fixed bins keep panels comparable across runs and sources, where
    per-run deciles would re-cut every time). The floor runs on the
    identical double both engines compute (the shared `quality_score`
    expression) — multiplication/division by the band constants is
    correctly rounded, the `quality_calibration_curve` convention.

    Scale shape: one quality pass (the shared one-tokenize-pass
    features), one keyed count bounded by #sources × length alphabet ×
    10 bands, MATERIALIZED before the per-source totals join (the
    diamond rule — the share row and the cell rows both consume it).
    Output is cell-count-sized, never feed-sized."""
    from .text import quality_score

    q = quality_score(documents).select("doc_id", "quality")
    cells = (
        documents.select(
            "doc_id",
            "source",
            F.expr(f"n_chars div {int(len_quant)}").alias("len_bucket"),
        )
        .join(q, "doc_id")
        .select(
            "source",
            "len_bucket",
            F.expr("least(9, CAST(floor(quality / 10.0) AS INT))").alias(
                "q_band"
            ),
        )
    )
    counts = _materialize(
        cells.groupBy("source", "len_bucket", "q_band").agg(
            F.count("*").cast("bigint").alias("n_docs")
        )
    )
    totals = counts.groupBy("source").agg(F.sum("n_docs").alias("n_src"))
    return (
        counts.join(totals, "source")
        .select(
            "source",
            "len_bucket",
            "q_band",
            "n_docs",
            (
                F.col("n_docs").cast("double") / F.col("n_src").cast("double")
            ).alias("share"),
        )
        .orderBy("source", "len_bucket", "q_band")
    )


def dedup_quality_shift(documents: DataFrame, nbins: int = 10) -> DataFrame:
    """What does exact dedup DO to the quality mix? PSI between the
    full corpus's quality distribution (reference) and the dedup
    SURVIVORS' distribution (current), per reference-decile bin — the
    before/after companion to `quality_calibration_curve` (which asks
    whether quality predicts duplication; this asks whether removing
    the duplicates moved the distribution). PSI ≈ 0 means dedup is
    quality-neutral; a large term in a low decile means the removed
    mass was concentrated there (the real-crawl expectation:
    boilerplate mirrors are low-quality).

    Exactness: quality rides the integer-thousandths q3 grid (the
    `quality_calibration_curve` rule); survivor = min doc_id per
    `exact_dedup` content digest; the PSI core is the shared
    `psi_from_value_counts` (ceil-rank decile cuts over the reduced
    count relation, `PSI_TERM_SQL` at the edge).

    Scale shape: one quality pass + one digest shuffle (both
    feed-width, both already paid by their parent ops); everything
    after rides the per-distinct-q3 count relation — bounded at ~100k
    values forever. Output = nbins rows."""
    from .anomaly import psi_from_value_counts
    from .text import quality_score

    q = quality_score(documents).select(
        "doc_id",
        F.expr("CAST(floor(quality * 1000) AS BIGINT)").alias("value"),
    )
    norm = F.lower(F.trim(F.regexp_replace("text", r"\s+", " ")))
    fps = documents.select(
        "doc_id", F.md5(norm.cast("binary")).alias("content_fp")
    )
    keepers = fps.groupBy("content_fp").agg(F.min("doc_id").alias("keeper"))
    flagged = fps.join(keepers, "content_fp").select(
        "doc_id", (F.col("doc_id") == F.col("keeper")).alias("is_keeper")
    )
    per_value = (
        q.join(flagged, "doc_id")
        .groupBy("value")
        .agg(
            F.count("*").alias("d_ref"),
            F.sum(F.when(F.col("is_keeper"), 1).otherwise(0)).alias("d_cur"),
        )
    )
    return psi_from_value_counts(per_value, nbins=nbins)
