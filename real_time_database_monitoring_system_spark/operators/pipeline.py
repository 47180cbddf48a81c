"""Training-data pipeline operators over `documents`: deterministic
sampling, shard packing, TF-IDF, vocabulary extraction, and
quantile-based quality filtering.

These are the corpus-preparation steps a large-scale LLM data pipeline
runs after dedup (`operators.dedup`) and scoring (`operators.text`):
pick a reproducible subset, pack it into token-budgeted shards, and
keep per-source quality floors. Every operator is built-in-expression
only (JVM, codegen) and deterministic, so each has an exact DuckDB
oracle twin.

Scale notes:
- `hash_sample` is a map-side filter — no shuffle, no RNG state, and
  content-addressed (md5 of the text), so the same document is kept or
  dropped identically across re-ingests and engines. This is the
  production-reproducible alternative to `df.sample()`, whose output
  depends on partitioning.
- `stratified_sample` / `quality_quantile_filter` shuffle once on
  `source` (the stratum key); per-stratum state is a window, not a
  collect.
- `shard_pack` is a per-source running sum — one shuffle, and the
  window is partitioned (never global). Packing is greedy in doc_id
  order: deterministic, restart-safe, and streaming-friendly.
- `tfidf_top_terms` / `vocab_topk` are explode → keyed agg shapes with
  map-side partial aggregation, same as `text._token_counts`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .util import materialize as _materialize
from .util import spread as _spread


def content_hash_bucket(text_col: str | Column, buckets: int = 100) -> Column:
    """Deterministic [0, buckets) bucket from the first 8 hex chars of
    md5(text) — portable across engines (DuckDB: `CAST('0x' ||
    substr(md5(text), 1, 8) AS BIGINT)`), uniform enough for sampling,
    and stable under repartitioning/re-ingest.

    Accepts a column name or an arbitrary string Column (e.g. a cast
    key) so every hash-bucket consumer shares this one portable-hash
    contract instead of re-deriving the md5/substring/conv chain."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    h = F.conv(F.substring(F.md5(col.cast("binary")), 1, 8), 16, 10).cast("bigint")
    return h % buckets


def hash_sample(documents: DataFrame, pct: int = 10) -> DataFrame:
    """Keep a reproducible `pct`% of documents by content-hash bucket.

    Pure map-side filter: at 100 TB this costs one scan with the
    predicate evaluated next to the reader, no shuffle, no driver
    state. Unlike rand()-based sampling the decision is a property of
    the document, so reruns, retries, and other engines agree row for
    row."""
    return (
        _spread(documents, "doc_id", cap=4 * documents.rdd.getNumPartitions())
        .withColumn("hash_bucket", content_hash_bucket("text"))
        .filter(F.col("hash_bucket") < pct)
        .select("doc_id", "source", "lang", "n_chars", "hash_bucket")
        .orderBy("doc_id")
    )


# A-ES sample key, shared verbatim (modulo the md5 twin form) with the
# DuckDB oracle: u = (h+1)/2^32+1 ∈ (0,1) from the content hash, key =
# ln(u)/w — the Efraimidis–Spirakis u^(1/w) order under a monotone map.
# Rounded to 9 dp for ranking (the repo float-path rule: ln differs by
# ulps across libm implementations; 9-dp ties then break on doc_id
# identically in both engines).
_AES_KEY_SQL = (
    "round(ln((CAST({h} AS DOUBLE) + 1.0) / 4294967297.0)"
    " / greatest(CAST(n_chars AS DOUBLE), 1.0), 9)"
)


def weighted_sample(documents: DataFrame, k: int = 100) -> DataFrame:
    """Weighted sampling WITHOUT replacement, k docs with inclusion
    odds proportional to length (`n_chars`) — the Efraimidis–Spirakis
    exponential-keys scheme: each row draws u ∈ (0,1), its key is
    u^(1/w), and the k largest keys win. Long documents carry more
    training tokens, so token-proportional selection is the natural
    corpus-subsetting rule (vs doc-uniform `hash_sample`).

    The draw is the content hash (a property of the document), so the
    sample is reproducible across reruns, engines, and partitionings —
    no rand(), no seed plumbing. Map-side key computation + global
    top-k: Catalyst plans the limit as TakeOrderedAndProject (per-
    partition heaps + single k-row reduction), so there is no sort and
    no shuffle of the corpus at any scale.
    """
    h = F.conv(
        F.substring(F.md5(F.col("text").cast("binary")), 1, 8), 16, 10
    ).cast("bigint")
    return (
        _spread(documents, "doc_id", cap=4 * documents.rdd.getNumPartitions())
        .withColumn("h32", h)
        .withColumn("sample_key", F.expr(_AES_KEY_SQL.format(h="h32")))
        .orderBy(F.desc("sample_key"), F.asc("doc_id"))
        .limit(k)
        .select("doc_id", "source", "n_chars", "sample_key")
    )


def stratified_sample(documents: DataFrame, n_per_source: int = 5) -> DataFrame:
    """Deterministic stratified sample: the `n_per_source` documents
    with the smallest content-hash rank within each source.

    Equal-quota sampling per stratum (source) is how training mixes
    hold composition targets while subsampling. Rank by (hash bucket,
    doc_id) so the pick is reproducible and unbiased by ingestion
    order; one shuffle on `source`, per-partition top-n via window."""
    w = Window.partitionBy("source").orderBy("h256", "doc_id")
    return (
        _spread(documents, "doc_id", cap=4 * documents.rdd.getNumPartitions())
        .withColumn("h256", content_hash_bucket("text", 256))
        .withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= n_per_source)
        .select("doc_id", "source", "lang", "sample_rank")
        .orderBy("source", "sample_rank")
    )


def stratified_sample_exact(
    documents: DataFrame, pct: int = 20, n_buckets: int = 64
) -> DataFrame:
    """PROPORTIONAL stratified sample with exact per-stratum counts:
    per source, exactly ``k_s = ceil(pct·n_s/100)`` documents — the
    ``k_s`` smallest by (id-hash, doc_id) — fully deterministic across
    reruns, engines, and partitionings. `stratified_sample` takes a
    fixed quota per source; `hash_sample` is proportional but only
    APPROXIMATELY (a hash-bucket filter's count varies stratum to
    stratum); training-mix recipes that promise "exactly 20% of every
    source" need this operator.

    Scale shape — a distributed order-statistic selection, NOT a
    per-source window over the corpus (one giant source would
    serialize into a single partition): (1) one map-combinable
    (source, hash-bucket) histogram over ``n_buckets`` uniform ranges
    of the 32-bit id hash; (2) cumulative bucket math on that
    #sources×n_buckets relation decides, per bucket, how many rows to
    take; (3) buckets fully below the cut pass with a broadcast-join
    FILTER (no window at all — the overwhelming mass of the sample);
    only the ONE boundary bucket per source is ranked, a window over
    ~n_s/n_buckets rows. The id hash is `assign_split`'s md5-prefix —
    a property of the document id, so the sample survives
    content-rewriting pipeline runs."""
    if not 0 < pct <= 100:
        raise ValueError("stratified_sample_exact: pct must be in (0, 100]")
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 8),
        16,
        10,
    ).cast("bigint")
    width = (1 << 32) // int(n_buckets)
    base = _spread(documents, "doc_id", cap=4 * documents.rdd.getNumPartitions()).select(
        "doc_id", "source", h.alias("h")
    ).withColumn("b", F.expr(f"h div {width}"))
    # base is re-derived (not materialized) on the probe side: the
    # hash is a pure function of doc_id, so recomputation is exact
    hist = base.groupBy("source", "b").agg(F.count("*").alias("cnt"))
    w_src = Window.partitionBy("source")
    w_cum = (
        Window.partitionBy("source")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    plan = (
        hist.withColumn("n_s", F.sum("cnt").over(w_src))
        .withColumn("cum_before", F.coalesce(F.sum("cnt").over(w_cum), F.lit(0)))
        .withColumn("k_s", F.expr(f"(n_s * {int(pct)} + 99) div 100"))
        .withColumn(
            "take",
            F.greatest(
                F.lit(0).cast("bigint"),
                F.least(F.col("cnt"), F.col("k_s") - F.col("cum_before")),
            ),
        )
        .filter(F.col("take") > 0)
        .select("source", "b", "cnt", "take")
    )
    joined = base.join(F.broadcast(plan), ["source", "b"])
    full = joined.filter(F.col("take") == F.col("cnt")).select("doc_id", "source")
    w_part = Window.partitionBy("source", "b").orderBy("h", "doc_id")
    partial = (
        joined.filter(F.col("take") < F.col("cnt"))
        .withColumn("rn", F.row_number().over(w_part))
        .filter(F.col("rn") <= F.col("take"))
        .select("doc_id", "source")
    )
    return full.unionByName(partial).orderBy("doc_id")


def pack_efficiency(documents: DataFrame, budget_tokens: int = 2000) -> DataFrame:
    """Shard packing efficiency audit over `shard_pack`'s assignment:
    per (source, shard), the document count, token total, and fill
    ratio against the budget — the padding-waste report a training-
    shard writer checks before committing a layout (chronic under-fill
    means the budget is mis-sized for the corpus's document lengths;
    the boundary-crossing rule makes the last doc spill, so fill can
    exceed 1.0 and the report shows by how much).

    Pure composition: `shard_pack`'s per-source running-sum window,
    then one (source, shard_id) aggregate — no new shuffle shape; the
    fill ratio is the single final double division."""
    packed = shard_pack(documents, budget_tokens)
    return (
        packed.groupBy("source", "shard_id")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("shard_tokens"),
        )
        .select(
            "source",
            "shard_id",
            "n_docs",
            "shard_tokens",
            (
                F.col("shard_tokens").cast("double") / F.lit(float(budget_tokens))
            ).alias("fill_ratio"),
        )
        .orderBy("source", "shard_id")
    )


def shard_pack(documents: DataFrame, budget_tokens: int = 2000) -> DataFrame:
    """Greedy token-budget shard packing: within each source, documents
    are laid out in doc_id order and cut into shards of at most
    ~`budget_tokens` whitespace tokens (a document that crosses the
    boundary starts the next shard; `shard_id = floor(tokens_before /
    budget)`).

    This is the training-shard writer's assignment step. The running
    sum is a `ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING` window
    per source — partitioned, so no global sort exists at scale, and
    the assignment is a pure function of (source, doc_id order), so a
    re-run after failure packs identically."""
    n_tok = F.size(F.filter(F.split("text", r"\s+"), lambda x: x != ""))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        _spread(documents, "doc_id", cap=4 * documents.rdd.getNumPartitions())
        .select("doc_id", "source", n_tok.cast("bigint").alias("n_tokens"))
        .withColumn("tokens_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("bigint")))
        .withColumn("shard_id", F.expr(f"tokens_before div {int(budget_tokens)}"))
        .select("doc_id", "source", "n_tokens", "shard_id")
        .orderBy("doc_id")
    )


def tfidf_top_terms(documents: DataFrame, k: int = 3) -> DataFrame:
    """Per-document top-`k` terms by TF-IDF.

    tf = term count / document token count; idf = ln(N / doc_freq);
    score rounded to 9 dp for cross-engine reproducibility (the one
    transcendental, like cosine in `similarity`). Shapes: one explode,
    two keyed aggs (term-per-doc and doc-freq), a broadcast scalar N,
    and a per-doc top-k window — each shuffle is on a key, nothing is
    global or quadratic."""
    toks = _spread(documents, "doc_id", cap=4 * documents.rdd.getNumPartitions()).select(
        "doc_id", F.explode(F.filter(F.split("text", r"\s+"), lambda x: x != "")).alias("term")
    )
    # materialized: doc_len, doc_freq, and the scoring join all read tf
    # (see util.materialize — three consumers would otherwise re-scan
    # and re-tokenize the corpus each)
    tf = _materialize(toks.groupBy("doc_id", "term").agg(F.count("*").alias("n_term")))
    doc_len = tf.groupBy("doc_id").agg(F.sum("n_term").alias("n_tokens"))
    df_ = tf.groupBy("term").agg(F.count("*").alias("doc_freq"))
    # corpus size as a broadcast scalar (the repo's injected-scalar
    # pattern) — not a driver-side .count(), which would be an eager
    # extra pass over the corpus
    n_docs = doc_len.agg(F.count("*").cast("double").alias("n_docs"))
    scored = (
        tf.join(doc_len, "doc_id")
        .join(df_, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            F.round(
                (F.col("n_term").cast("double") / F.col("n_tokens").cast("double"))
                * F.log(F.col("n_docs") / F.col("doc_freq").cast("double")),
                9,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("doc_id", F.col("rn").cast("int").alias("rn"), "term", "tfidf")
        .orderBy("doc_id", "rn")
    )


def bm25_search(
    documents: DataFrame,
    n_queries: int = 10,
    query_len: int = 6,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 top-`k` retrieval over the corpus — the lexical-search
    primitive a RAG / retrieval-augmented pipeline runs beside the
    embedding k-NN in `similarity` (the reference's only search is a
    LIKE substring scan, views.py substring filters; BM25 is what that
    becomes at corpus scale).

    Query set is self-contained and deterministic: the first
    `n_queries` documents (doc_id < n_queries) contribute their first
    `query_len` distinct tokens as query terms; the query document
    itself is excluded from its own results, as in `knn_bruteforce`.

    score(q, d) = Σ_{t∈q∩d} idf(t) · tf(t,d)·(k1+1) /
                  (tf(t,d) + k1·(1 − b + b·|d|/avgdl)),
    idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1)   [Robertson/Lucene form]

    Cross-engine determinism: each per-term contribution is rounded to
    9 dp (the repo's one-transcendental rule), then accumulated as
    DECIMAL(20,9) — an EXACT, order-independent sum — and cast to
    double only at the edge, so Spark's arbitrary-order partial
    aggregation and DuckDB's sequential sum agree bit-for-bit.

    Scale shape: the corpus is tokenized ONCE into a materialized
    postings relation (doc_id, term, tf) — the same diamond feeding
    doc-lengths, doc-frequencies, and the scoring join. The query-term
    side is tiny and broadcast, so the postings relation never
    shuffles for the probe; only matching postings (docs sharing ≥1
    query term) flow into the (query_id, doc_id) aggregation, and the
    final top-k is a window over that candidate set keyed by query —
    never over the corpus. At 100 TB this is the standard sharded
    retrieval plan: score shards independently, merge k per query.
    """
    if n_queries <= 0 or query_len <= 0 or k <= 0:
        raise ValueError("bm25_search: n_queries, query_len and k must be positive")
    tok_arr = F.filter(F.split("text", r"\s+"), lambda x: x != "")
    toks = _spread(documents, "doc_id", cap=4 * documents.rdd.getNumPartitions()).select(
        "doc_id", F.explode(tok_arr).alias("term")
    )
    tf = _materialize(toks.groupBy("doc_id", "term").agg(F.count("*").alias("n_term")))
    doc_len = _materialize(
        tf.groupBy("doc_id").agg(F.sum("n_term").alias("n_tokens"))
    )
    df_ = tf.groupBy("term").agg(F.count("*").alias("doc_freq"))
    # one-row corpus stats: N and avgdl, computed over docs with ≥1
    # token (identical population in the DuckDB twin)
    stats = doc_len.agg(
        F.count("*").cast("double").alias("n_docs"),
        (F.sum("n_tokens").cast("double") / F.count("*").cast("double")).alias("avgdl"),
    )
    qterms = (
        documents.filter(F.col("doc_id") < n_queries)
        .select(
            F.col("doc_id").alias("query_id"),
            F.explode(F.array_distinct(F.slice(tok_arr, 1, query_len))).alias("term"),
        )
    )
    contrib = (
        tf.join(F.broadcast(qterms), "term")
        .filter(F.col("doc_id") != F.col("query_id"))
        .join(doc_len, "doc_id")
        .join(df_, "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            "doc_id",
            F.round(
                F.log(
                    (F.col("n_docs") - F.col("doc_freq").cast("double") + F.lit(0.5))
                    / (F.col("doc_freq").cast("double") + F.lit(0.5))
                    + F.lit(1.0)
                )
                * (
                    (F.col("n_term").cast("double") * F.lit(k1 + 1.0))
                    / (
                        F.col("n_term").cast("double")
                        + F.lit(k1)
                        * (
                            F.lit(1.0 - b)
                            + F.lit(b)
                            * (F.col("n_tokens").cast("double") / F.col("avgdl"))
                        )
                    )
                ),
                9,
            )
            .cast("decimal(20,9)")
            .alias("contrib"),
        )
    )
    scored = contrib.groupBy("query_id", "doc_id").agg(
        F.sum("contrib").cast("double").alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", F.col("rn").cast("int").alias("rn"), "doc_id", "score")
        .orderBy("query_id", "rn")
    )


def vocab_topk(documents: DataFrame, k: int = 50) -> DataFrame:
    """Global vocabulary head: top-`k` terms by total occurrences (ties
    by term asc) with document frequency. Explode → single keyed agg
    with map-side combine → TakeOrderedAndProject; the classic
    vocabulary-extraction shape."""
    toks = _spread(documents, "doc_id", cap=4 * documents.rdd.getNumPartitions()).select(
        "doc_id", F.explode(F.filter(F.split("text", r"\s+"), lambda x: x != "")).alias("term")
    )
    return (
        toks.groupBy("term")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.countDistinct("doc_id").alias("doc_freq"),
        )
        .orderBy(F.desc("n_occurrences"), F.asc("term"))
        .limit(k)
    )


def ngram_counts(documents: DataFrame, n: int = 2, k: int = 50) -> DataFrame:
    """Corpus n-gram head: top-`k` word n-grams by occurrence count
    (ties by gram asc) with document frequency — the language-model
    support table (bigram/trigram statistics) next to the unigram
    `vocab_topk`.

    N-grams are built O(tokens) per row by zip_with over shifted
    slices (same idiom as dedup shingling — the index-based transform
    re-evaluates the tokenize subtree per element, quadratic), WITHOUT
    the distinct: counts need every occurrence. Then explode → one
    keyed agg with map-side combine → TakeOrderedAndProject."""
    if n < 2:
        raise ValueError("use vocab_topk for unigrams")
    toks = F.filter(F.split("text", r"\s+"), lambda x: x != "")
    out = toks
    for j in range(1, n):
        shifted = F.slice(toks, j + 1, 1 << 30)
        out = F.zip_with(out, shifted, lambda a, b: F.concat(a, F.lit(" "), b))
    grams = F.filter(out, lambda x: x.isNotNull())
    exploded = (
        _spread(documents, "doc_id", cap=4 * documents.rdd.getNumPartitions())
        .select("doc_id", grams.alias("grams"))
        .select("doc_id", F.explode("grams").alias("gram"))
    )
    return (
        exploded.groupBy("gram")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.countDistinct("doc_id").alias("doc_freq"),
        )
        .orderBy(F.desc("n_occurrences"), F.asc("gram"))
        .limit(k)
    )


def pmi_pairs(
    documents: DataFrame, window: int = 2, min_count: int = 5, k: int = 50
) -> DataFrame:
    """Top-`k` token pairs by pointwise mutual information within a
    ±`window` co-occurrence window — the collocation detector ("new
    york", "machine learning") of the LM support family next to
    `vocab_topk`/`ngram_counts`: raw pair frequency surfaces common
    words; PMI = ln(p(a,b) / (p(a)p(b))) surfaces pairs that co-occur
    far above chance.

    Pairs are unordered (canonical least-first key). Shapes all linear:
    pairs are built O(tokens·window) per row by zip_with over shifted
    slices (the repo shingling idiom — no self-join on position), then
    two keyed aggs (pair counts, unigram counts) + two broadcast
    scalars (total tokens / total pairs). All counts are exact
    integers; the single transcendental (ln of a product of explicit
    double casts, fixed evaluation order) is rounded to 9 dp — counts
    are cast to double BEFORE multiplying, since c_pair·N_tok²
    overflows bigint on a 100 TB corpus.
    """
    toks_arr = F.filter(F.split("text", r"\s+"), lambda x: x != "")
    d = _spread(documents, "doc_id", cap=4 * documents.rdd.getNumPartitions()).select("doc_id", toks_arr.alias("toks"))
    pair_arrays = []
    for j in range(1, window + 1):
        shifted = F.slice("toks", j + 1, 1 << 30)
        pair_arrays.append(
            F.zip_with(
                F.col("toks"),
                shifted,
                lambda a, b: F.when(a <= b, F.concat(a, F.lit(" "), b)).otherwise(
                    F.concat(b, F.lit(" "), a)
                ),
            )
        )
    pairs = d.select(
        F.explode(
            F.filter(F.concat(*pair_arrays), lambda x: x.isNotNull())
        ).alias("pair")
    )
    # materialized diamonds: each counts table feeds its total AND a join
    pair_counts = _materialize(pairs.groupBy("pair").agg(F.count("*").alias("c_pair")))
    tok_counts = _materialize(
        d.select(F.explode("toks").alias("term")).groupBy("term").agg(F.count("*").alias("c_tok"))
    )
    n_tok = tok_counts.agg(F.sum("c_tok").alias("n_tok"))
    n_pair = pair_counts.agg(F.sum("c_pair").alias("n_pair"))
    ca = tok_counts.select(F.col("term").alias("term_a"), F.col("c_tok").alias("c_a"))
    cb = tok_counts.select(F.col("term").alias("term_b"), F.col("c_tok").alias("c_b"))
    return (
        pair_counts.filter(F.col("c_pair") >= min_count)
        .withColumn("term_a", F.split("pair", " ")[0])
        .withColumn("term_b", F.split("pair", " ")[1])
        .join(ca, "term_a")
        .join(cb, "term_b")
        .crossJoin(F.broadcast(n_tok))
        .crossJoin(F.broadcast(n_pair))
        .select(
            "pair",
            "c_pair",
            "c_a",
            "c_b",
            F.expr(
                "round(ln((CAST(c_pair AS DOUBLE) * CAST(n_tok AS DOUBLE)"
                " * CAST(n_tok AS DOUBLE)) / (CAST(n_pair AS DOUBLE)"
                " * CAST(c_a AS DOUBLE) * CAST(c_b AS DOUBLE))), 9)"
            ).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), F.asc("pair"))
        .limit(k)
    )


def quality_quantile_filter(documents: DataFrame, exact: bool = True) -> DataFrame:
    """Keep documents at or above their source's median quality score.

    Per-stratum quantile floors ("drop the worst half of each crawl")
    beat a global threshold because sources have different score
    distributions. The medians are computed as a small per-source
    aggregate and broadcast-joined back — not an unframed window, which
    would buffer and sort every source partition just to attach one
    scalar. `exact=True` uses `percentile` (same interpolation rule as
    DuckDB's `quantile_cont`, and the quality formula is already
    engine-exact, so the filter is reproducible bit-for-bit — the
    oracle-checked mode). At 100 TB exact per-group percentiles mean
    collecting each group's values; `exact=False` swaps in
    `approx_percentile` (t-digest sketch, mergeable map-side), the
    production path when the floor only needs to be approximately the
    median."""
    from .text import quality_score  # local import to avoid cycle at package init

    q = quality_score(documents).select("doc_id", "quality")
    # materialized: read by the median aggregate AND the filter join
    with_src = _materialize(
        q.join(_spread(documents, "doc_id", cap=4 * documents.rdd.getNumPartitions()).select("doc_id", "source"), "doc_id")
    )
    med_expr = (
        F.expr("percentile(quality, 0.5)")
        if exact
        else F.expr("approx_percentile(quality, 0.5, 10000)")
    )
    medians = with_src.groupBy("source").agg(med_expr.alias("src_median"))
    return (
        with_src.join(F.broadcast(medians), "source")
        .filter(F.col("quality") >= F.col("src_median"))
        .select("doc_id", "source", "quality", "src_median")
        .orderBy("doc_id")
    )


def chunk_documents(
    documents: DataFrame, window: int = 32, stride: int = 24
) -> DataFrame:
    """Token-window chunking: split each document into `window`-token
    chunks every `stride` tokens (overlap = window - stride) — the
    context-window preparation step between cleaning and `shard_pack`.

    Chunk starts are 0, stride, 2*stride, ... while start < n_tokens,
    so the final chunk may be short; zero-token documents emit no
    chunks. Shape at scale: tokenize once, precompute the start list,
    ONE generator (posexplode of a bare precomputed column — anything
    else re-evaluates carried columns per element), then a map-side
    slice/join per chunk. No shuffle except the display sort; chunking
    100 TB is embarrassingly parallel and stays in whole-stage codegen.
    """
    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")
    toks = F.filter(F.split("text", r"\s+"), lambda x: x != "")
    base = (
        _spread(documents, "doc_id", cap=4 * documents.rdd.getNumPartitions())
        .select("doc_id", toks.alias("toks"))
        .withColumn("n_tokens", F.size("toks").cast("bigint"))
        .filter(F.col("n_tokens") > 0)
        .withColumn(
            "starts",
            F.sequence(F.lit(0), (F.col("n_tokens") - 1).cast("int"), F.lit(stride)),
        )
    )
    return (
        base.select(
            "doc_id",
            "n_tokens",
            "toks",
            F.posexplode("starts").alias("chunk_id", "start"),
        )
        .select(
            "doc_id",
            "chunk_id",
            F.col("start").cast("bigint").alias("start"),
            F.slice("toks", F.col("start") + 1, F.lit(window)).alias("chunk_toks"),
        )
        .select(
            "doc_id",
            "chunk_id",
            "start",
            F.size("chunk_toks").cast("bigint").alias("chunk_tokens"),
            F.array_join("chunk_toks", " ").alias("chunk_text"),
        )
        .orderBy("doc_id", "chunk_id")
    )


def corpus_stats(documents: DataFrame) -> DataFrame:
    """Dataset-card summary per source: document/token/char volumes,
    language spread, distinct-content count, and token share.

    The numbers a corpus release publishes (and a mixing strategy
    consumes): one scan computes per-row token counts in the same
    projection as the grouping key, then a single keyed agg over a
    handful of sources with map-side partial aggregation — the
    distinct-content count is `count(DISTINCT md5)` which partial-
    aggregates per source too. The corpus-total join is a broadcast
    scalar (the repo's injected-scalar pattern, never a collect)."""
    n_tok = F.size(F.filter(F.split("text", r"\s+"), lambda x: x != "")).cast("bigint")
    rows = _spread(documents, "doc_id", cap=4 * documents.rdd.getNumPartitions()).select(
        "source",
        "lang",
        n_tok.alias("n_tokens"),
        F.length("text").cast("bigint").alias("n_chars_t"),
        F.md5(F.col("text").cast("binary")).alias("fp"),
    )
    # materialized: the corpus-total aggregate and the share join both
    # read the per-source rollup
    agg = _materialize(
        rows.groupBy("source").agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("lang").alias("n_langs"),
            F.countDistinct("fp").alias("n_distinct_texts"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("n_chars_t").alias("total_chars"),
        )
    )
    corpus = agg.agg(F.sum("total_tokens").alias("corpus_tokens"))
    return (
        agg.crossJoin(F.broadcast(corpus))
        .select(
            "source",
            "n_docs",
            "n_langs",
            "n_distinct_texts",
            "total_tokens",
            "total_chars",
            F.expr(
                "round(CAST(total_tokens AS DOUBLE) / CAST(corpus_tokens AS DOUBLE), 9)"
            ).alias("token_share"),
            F.expr(
                "round(CAST(total_chars AS DOUBLE) / CAST(n_docs AS DOUBLE), 9)"
            ).alias("mean_doc_chars"),
        )
        .orderBy("source")
    )


def unigram_logprob_score(documents: DataFrame) -> DataFrame:
    """Perplexity-style quality signal from a corpus-trained unigram
    LM: per-token log p(tok) = ln(count(tok)) − ln(total_tokens),
    document score = mean log-prob (higher = more typical text; the
    in-container stand-in for CCNet's KenLM perplexity filter, same
    pipeline role and same plan shape a real LM scorer would have).

    Scale shape: tokenize ONCE (materialized explode shared by the
    frequency aggregate and the scoring join); the LM is a vocab-sized
    table joined WITHOUT a broadcast hint — a curated vocabulary fits
    and AQE broadcasts it at runtime, but a raw web-corpus vocab
    (every distinct URL and typo) can reach GBs, where a forced hint
    would OOM the driver; unhinted, AQE falls back to a shuffle join.
    Corpus total is a broadcast scalar.

    Determinism: ln() is rounded to 9 dp and accumulated in
    decimal(28,9) — exact, order-independent sums under any
    parallelism — with ONE double division at the edge (the repo's
    standard cross-engine float rules).
    """
    toks = _materialize(
        _spread(documents, "doc_id", cap=4 * documents.rdd.getNumPartitions()).select(
            "doc_id",
            "source",
            F.explode(F.filter(F.split("text", r"\s+"), lambda x: x != "")).alias(
                "tok"
            ),
        )
    )
    freq = toks.groupBy("tok").agg(F.count("*").alias("n_tok"))
    total = freq.agg(F.sum("n_tok").alias("n_total"))
    logp = (
        F.round(F.log(F.col("n_tok").cast("double")) - F.log(F.col("n_total").cast("double")), 9)
        .cast("decimal(28,9)")
        .alias("logp")
    )
    scored = toks.join(freq, "tok").crossJoin(F.broadcast(total)).select(
        "doc_id", "source", logp
    )
    return (
        scored.groupBy("doc_id", "source")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("logp").alias("sum_logp"),
        )
        .select(
            "doc_id",
            "source",
            "n_tokens",
            (F.col("sum_logp").cast("double") / F.col("n_tokens").cast("double")).alias(
                "avg_logprob"
            ),
        )
        .orderBy("doc_id")
    )


def curation_waterfall(documents: DataFrame) -> DataFrame:
    """The curation chain's survival waterfall: document counts after
    each stage of `curate_corpus` (total → cleaned+joined →
    exact-dedup keepers → per-source quality floor) with the retained
    fraction — the one-table answer to "where did my corpus go",
    which every ablation writeup needs before trusting a filter.

    Reuses the exact stage operators (clean, keeper semi-join, quality
    floor) so the waterfall can never disagree with the pipeline it
    describes; the four counts are one-row aggregates unioned, with
    the corpus total broadcast for the fraction. Same two materialized
    diamonds as `curate_corpus`.
    """
    from .curation import assign_split as _  # noqa: F401 (chain parity)
    from .dedup import exact_dedup
    from .text import clean_text

    cleaned = clean_text(documents).select("doc_id", F.col("clean").alias("text"))
    docs2 = _materialize(
        cleaned.join(documents.select("doc_id", "lang", "source"), "doc_id")
    )
    keepers = exact_dedup(docs2).select(F.col("keeper_doc_id").alias("doc_id"))
    docs3 = _materialize(docs2.join(keepers, "doc_id", "left_semi"))
    kept = quality_quantile_filter(docs3, exact=True)
    stages = [
        ("total", documents),
        ("clean_join", docs2),
        ("dedup_keepers", docs3),
        ("quality_floor", kept),
    ]
    rows = None
    for i, (name, df) in enumerate(stages):
        one = df.agg(F.count("*").alias("n_docs")).select(
            F.lit(i + 1).alias("stage_no"), F.lit(name).alias("stage"), "n_docs"
        )
        rows = one if rows is None else rows.unionByName(one)
    total = documents.agg(F.count("*").cast("double").alias("n_total"))
    return (
        rows.crossJoin(F.broadcast(total))
        .select(
            "stage_no",
            "stage",
            "n_docs",
            F.round(F.col("n_docs").cast("double") / F.col("n_total"), 9).alias(
                "retained_frac"
            ),
        )
        .orderBy("stage_no")
    )


def curate_corpus(documents: DataFrame) -> DataFrame:
    """END-TO-END curation chain — the composition proof that the
    pipeline stages snap together: clean (URL/e-mail/tag scrub) →
    exact-dedup keepers on the CLEANED text → per-source median
    quality floor → deterministic id-hash split. Returns one row per
    surviving document with its provenance columns.

    Every stage is the already-oracle-checked operator called as-is
    (reuse over re-derivation; the inner presentation sorts ride
    along — at composition scale the optimizer cost is the keeper
    semi-joins, not the sorts). Intermediates feeding two consumers
    are materialized per the repo diamond rule. The full chain has its
    own DuckDB oracle, so the COMPOSITION is hash-checked end to end,
    not just the stages.
    """
    from .curation import assign_split
    from .dedup import exact_dedup
    from .text import clean_text

    cleaned = clean_text(documents).select("doc_id", F.col("clean").alias("text"))
    docs2 = _materialize(
        cleaned.join(documents.select("doc_id", "lang", "source"), "doc_id")
    )
    keepers = exact_dedup(docs2).select(F.col("keeper_doc_id").alias("doc_id"))
    docs3 = _materialize(docs2.join(keepers, "doc_id", "left_semi"))
    kept = quality_quantile_filter(docs3, exact=True)
    survivors = docs3.join(kept.select("doc_id"), "doc_id", "left_semi")
    return (
        assign_split(survivors)
        .select("doc_id", "source", "split")
        .join(kept.select("doc_id", "quality", "src_median"), "doc_id")
        .orderBy("doc_id")
    )


def feature_hash_embed(documents: DataFrame, n_buckets: int = 32) -> DataFrame:
    """Hashing-trick document featurization: each token is hashed into
    one of `n_buckets` slots (the portable md5-prefix bucket — same
    hash both engines compute), per-doc term frequencies are
    L2-normalized, and the vector is emitted in LONG form
    (doc_id, bucket, tf, weight) so downstream joins/aggregations stay
    relational (and the driver hash-compare sees scalars, not arrays).

    This is the in-engine text→vector bridge (feature hashing,
    Weinberger et al. 2009): no vocabulary state, no fit step, so it
    maps over 100 TB as one explode + one keyed aggregation. The
    weight is integer tf divided by the sqrt of an exact integer
    sum-of-squares — a single final double division on exact inputs,
    bit-equal across engines.

    Shuffles: tf aggregation on (doc_id, bucket), then the norm window
    on doc_id — both keyed, combine-friendly, never global.
    """
    toks = _spread(documents, "doc_id", cap=4 * documents.rdd.getNumPartitions()).select(
        "doc_id",
        F.explode(F.filter(F.split("text", r"\s+"), lambda x: x != "")).alias("tok"),
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("tok").cast("binary")), 1, 8), 16, 10)
        .cast("bigint") % n_buckets
    )
    tf = toks.select("doc_id", bucket.alias("bucket")).groupBy("doc_id", "bucket").agg(
        F.count("*").alias("tf")
    )
    w = Window.partitionBy("doc_id")
    return (
        tf.withColumn("norm_sq", F.sum(F.col("tf") * F.col("tf")).over(w))
        .select(
            "doc_id",
            F.col("bucket").cast("int").alias("bucket"),
            "tf",
            (F.col("tf").cast("double") / F.sqrt(F.col("norm_sq").cast("double"))).alias(
                "weight"
            ),
        )
        .orderBy("doc_id", "bucket")
    )


def minmax_normalize(events: DataFrame) -> DataFrame:
    """Per-type min-max feature scaling: ``(value - min) / (max - min)``
    into [0, 1] — the featurization step before any distance-based
    model or mixing weight. Degenerate groups (max == min) yield NULL
    rather than a division artifact.

    Determinism: min/max are order statistics (exact, order-
    independent — never a float SUM), the subtraction of two exact
    2-decimal doubles is exact, and the single final double division
    is IEEE-identical in any engine. Scale shape: one map-side-partial
    aggregation producing #types rows, broadcast back onto the feed —
    the big side is scanned once and never shuffles or sorts (a
    per-type window would put a whole type's feed into one partition;
    the broadcast join keeps the plan embarrassingly parallel).
    """
    stats = events.groupBy("event_type").agg(
        F.min("value").alias("v_min"), F.max("value").alias("v_max")
    )
    return (
        events.join(F.broadcast(stats), "event_type")
        .select(
            "event_id",
            "event_type",
            "value",
            F.when(F.col("v_max") > F.col("v_min"),
                   (F.col("value") - F.col("v_min"))
                   / (F.col("v_max") - F.col("v_min")))
            .alias("norm01"),
        )
        .orderBy("event_id")
    )


def source_quantile_normalize(
    documents: DataFrame, col: str = "n_chars", buckets: int = 10
) -> DataFrame:
    """Quantile-normalize a per-document feature WITHIN each source so
    heterogeneous sources become comparable (a web crawl's "long doc"
    and a forum dump's "long doc" land in the same decile) — the
    calibration step before cross-source quality filtering or mixing.

    Scale shape: the naive formulation is `percent_rank() OVER
    (PARTITION BY source ...)` — a per-source window that serializes
    each source into ONE partition, i.e. a 100 TB scale-killer for any
    large source. Instead the per-source bucket cut points come from
    `percentile_disc` AGGREGATES (map-side combinable, #sources output
    rows), broadcast back, and the bucket index is a map-side chain of
    integer comparisons. Same pattern as `minmax_normalize` /
    `winsorized_stats`. Ties sit deterministically in the lower bucket
    (strict `>` against each cut) in both engines — exact order
    statistics over integers, no float ambiguity."""
    if buckets < 2:
        raise ValueError("source_quantile_normalize: buckets must be >= 2")
    qs = [i / buckets for i in range(1, buckets)]
    cuts = documents.groupBy("source").agg(
        *[
            F.expr(f"percentile_disc({q}) WITHIN GROUP (ORDER BY {col})").alias(f"c_{i}")
            for i, q in enumerate(qs)
        ]
    )
    bucket = " + ".join(
        f"(CASE WHEN {col} > c_{i} THEN 1 ELSE 0 END)" for i in range(len(qs))
    )
    return (
        documents.join(F.broadcast(cuts), "source")
        .select(
            "doc_id",
            "source",
            col,
            F.expr(bucket).cast("int").alias("norm_bucket"),
        )
        .orderBy("doc_id")
    )


def tokenize_to_ids(
    documents: DataFrame, vocab_size: int = 1000, oov_id: int = 0
) -> DataFrame:
    """Apply a fixed vocabulary to the corpus: every document becomes
    its ordered array of integer token ids, out-of-vocabulary tokens
    map to `oov_id` — the tokenizer-application step between curation
    and training-shard writing. The vocabulary is corpus-derived here
    (top-`vocab_size` terms by frequency, ties by term) so the
    operator is self-contained and exactly reproducible.

    Scale shape: vocabulary selection is a keyed count + TakeOrdered
    top-k (never a window over all distinct terms); id assignment is a
    window over ONLY the ≤ vocab_size surviving rows, then broadcast.
    The corpus-side cost is one posexplode + broadcast probe + one
    groupBy(doc_id) reassembly shuffle carrying the token stream — at
    production scale you would keep the exploded (doc_id, pos, id)
    form and skip the array reassembly, which exists here for the
    row-per-document contract. Documents with zero tokens drop out
    (no token stream to encode), as in the oracle twin."""
    if vocab_size <= 0:
        raise ValueError("tokenize_to_ids: vocab_size must be positive")
    tok_arr = F.filter(F.split("text", r"\s+"), lambda x: x != "")
    tokp = _spread(documents, "doc_id", cap=4 * documents.rdd.getNumPartitions()).select(
        "doc_id", F.posexplode(tok_arr).alias("pos", "term")
    )
    counts = tokp.groupBy("term").agg(F.count("*").alias("n"))
    top = counts.orderBy(F.desc("n"), F.asc("term")).limit(vocab_size)
    vocab = top.withColumn(
        "id",
        F.row_number()
        .over(Window.orderBy(F.desc("n"), F.asc("term")))
        .cast("int"),
    ).select("term", "id")
    encoded = tokp.join(F.broadcast(vocab), "term", "left").select(
        "doc_id", "pos", F.coalesce("id", F.lit(int(oov_id)).cast("int")).alias("tid")
    )
    return (
        encoded.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tid"))),
                lambda s: s.tid,
            ).alias("token_ids"),
        )
        .orderBy("doc_id")
    )


# Cap on the distinct n_chars alphabet feeding the one-vs-rest
# source-drift grid (ADVICE r11). Lengths are unquantized (exact KS),
# so the ceiling guards the sources×alphabet grid and the per-length
# totals broadcast against a pathological length domain; 100k narrow
# rows broadcast in single-digit MBs.
_SLD_MAX_LENGTH_ALPHABET = 100_000


def source_length_drift(documents: DataFrame) -> DataFrame:
    """EXACT one-vs-rest two-sample panel of document length per
    source: for each source, the two-sample KS statistic AND Cliff's
    delta of its n_chars distribution against the REST of the corpus —
    the distribution-level companion to `source_kl_divergence`'s
    binned score: KS is binning-free (the exact sup over the real
    ECDFs, no bucket-edge artifacts) and δ adds the signed ordinal
    direction (does this source run long or short, and how often).
    The pair is the curation dashboard's "which source is shaped
    wrong" row.

    Scale shape — leave-one-out count algebra, NOT a per-source
    re-scan: the corpus reduces ONCE to the (source, n_chars) count
    relation (bounded by sources × the length alphabet); the global
    per-length totals broadcast back, and each source's REST side is
    g(v) − own(v) on the dense source×length grid (the
    `independence_chi2` margin-spine rule — a source missing a length
    must still carry the rest side's mass there). S sources cost ONE
    reduction + S bounded coda partitions, not S scans; the shared
    `ks_from_value_counts` / `cliffs_from_value_counts` codas run
    keyed by source over the same materialized relation."""
    from .analytics import cliffs_from_value_counts
    from .anomaly import ks_from_value_counts
    from .util import materialize

    counts = (
        documents.filter(
            F.col("source").isNotNull() & F.col("n_chars").isNotNull()
        )
        .groupBy("source", F.col("n_chars").alias("v"))
        .agg(F.count("*").cast("bigint").alias("own"))
    )
    counts = materialize(counts)
    # Dense-grid loud-failure cap (ADVICE r11, the hl_from_value_counts
    # rule): the grid below is sources × the DISTINCT raw-length
    # alphabet, and `totals` (one row per distinct length) is
    # broadcast. Corpus lengths are unquantized by design (KS is the
    # binning-free panel), so a warehouse-scale corpus could push the
    # alphabet to 1e5–1e6 distinct values; fail loudly at the operator
    # boundary instead of an opaque broadcast OOM. The count reads the
    # just-materialized blocks, not the source (eager by choice — same
    # trade as hl_from_value_counts, documented there).
    n_lengths = counts.select("v").distinct().count()
    if n_lengths > _SLD_MAX_LENGTH_ALPHABET:
        raise ValueError(
            "source_length_drift: the corpus has "
            f"{n_lengths} distinct n_chars values, exceeding the "
            f"dense-grid cap of {_SLD_MAX_LENGTH_ALPHABET}. The "
            "one-vs-rest grid is sources x length-alphabet with the "
            "per-length totals broadcast; quantize n_chars into "
            "buckets before calling (binned KS) or raise the cap "
            "knowingly."
        )
    totals = counts.groupBy("v").agg(F.sum("own").cast("bigint").alias("g"))
    grid = (
        counts.select("source").distinct()
        .join(F.broadcast(totals), F.lit(True))
        .join(counts, ["source", "v"], "left")
        .select(
            "source",
            "v",
            F.coalesce("own", F.lit(0)).alias("c_cur"),
            (F.col("g") - F.coalesce("own", F.lit(0))).alias("c_ref"),
        )
    )
    grid = materialize(grid)
    ks = ks_from_value_counts(
        grid.select(
            "source",
            F.col("v").alias("value"),
            F.col("c_ref").alias("d_ref"),
            F.col("c_cur").alias("d_cur"),
        ),
        keys=["source"],
    )
    cl = cliffs_from_value_counts(
        grid.select(
            "source",
            F.col("v").alias("cents"),
            "c_ref",
            "c_cur",
        ),
        keys=["source"],
    ).select("source", "delta")
    return (
        ks.join(cl, "source")
        .select("source", "n_ref", "n_cur", "ks_d", "delta")
        .orderBy("source")
    )


def source_kl_divergence(documents: DataFrame) -> DataFrame:
    """Training-mix divergence audit: KL(source ‖ corpus) over unigram
    distributions — "how far does each source's token mix sit from the
    blended corpus", the quantity mix-tuning sweeps monitor when
    re-weighting sources (a source with near-zero KL adds diversity
    nothing; a high-KL source shifts the blend). Complements
    `temperature_mix_weights` (which reweights by size, not content)
    and `doc_novelty` (per-document, not per-source).

    KL(p_s ‖ q) = Σ_t (c_st/N_s) · ln((c_st·N)/(N_s·c_t)) — terms
    absent from the source contribute 0, and every source term exists
    in the corpus by construction, so the sum is finite.

    Cross-engine determinism: each per-term contribution is a
    pinned-order double expression rounded to 9 dp (the repo's
    one-transcendental rule, as `bm25_search`), accumulated as
    DECIMAL(20,9) — exact and order-independent — and cast to double
    at the edge.

    Scale shape: the corpus is tokenized ONCE into a materialized
    (source, term, c_st) relation — the diamond feeding source totals,
    corpus term totals, and the contribution join. Source totals and
    the one-row corpus total broadcast; the only data-sized shuffles
    are the tf aggregation and the vocabulary-sized term join. The
    final aggregate is #sources rows."""
    tok_arr = F.filter(F.split("text", r"\s+"), lambda x: x != "")
    tf = _materialize(
        _spread(documents, "doc_id", cap=4 * documents.rdd.getNumPartitions())
        .select("source", F.explode(tok_arr).alias("term"))
        .groupBy("source", "term")
        .agg(F.count("*").alias("c_st"))
    )
    src_tot = tf.groupBy("source").agg(F.sum("c_st").alias("n_s"))
    term_tot = tf.groupBy("term").agg(F.sum("c_st").alias("c_t"))
    total = src_tot.agg(F.sum("n_s").alias("n_total"))
    contrib = (
        tf.join(F.broadcast(src_tot), "source")
        .join(term_tot, "term")
        .crossJoin(F.broadcast(total))
        .select(
            "source",
            F.expr(
                "CAST(round((CAST(c_st AS DOUBLE) / CAST(n_s AS DOUBLE))"
                " * ln((CAST(c_st AS DOUBLE) * CAST(n_total AS DOUBLE))"
                " / (CAST(n_s AS DOUBLE) * CAST(c_t AS DOUBLE))), 9)"
                " AS DECIMAL(20,9))"
            ).alias("contrib"),
        )
    )
    return (
        contrib.groupBy("source")
        .agg(
            F.count("*").alias("n_terms"),
            F.sum("contrib").cast("double").alias("kl_nats"),
        )
        .orderBy("source")
    )


# interpolated bigram contribution — pinned-order, one transcendental,
# round(9); evaluated verbatim by both engines over identical
# (prev, cur, c12, c1, cu, n_total) columns
BIGRAM_TERM_SQL = (
    "round(CASE WHEN prev IS NULL THEN"
    " ln(CAST(cu AS DOUBLE) / CAST(n_total AS DOUBLE))"
    " ELSE ln(0.7 * (CAST(c12 AS DOUBLE) / CAST(c1 AS DOUBLE))"
    " + 0.3 * (CAST(cu AS DOUBLE) / CAST(n_total AS DOUBLE))) END, 9)"
)


def bigram_logprob_score(documents: DataFrame) -> DataFrame:
    """Interpolated-bigram LM quality signal: per-document mean of
    ln(0.7·p(cur|prev) + 0.3·p(cur)) — the next step up from
    `unigram_logprob_score` toward the KenLM-style perplexity filters
    production pipelines run (CCNet): a document of common words in
    IMPLAUSIBLE ORDER now scores low where the unigram model cannot
    see the difference. The first token backs off to its unigram
    probability; interpolation keeps every in-corpus bigram finite.

    Scale shape: the (prev, cur) pair relation is built ARRAY-SIDE
    (prepend-null + zip) before ONE explode — never a positional
    self-join of the token table, which would shuffle the corpus on
    (doc_id, pos). The unigram/bigram tables join WITHOUT broadcast
    hints (the `unigram_logprob_score` rule: a raw web-corpus vocab
    can reach GBs — AQE broadcasts at runtime when it actually fits).
    Per-term round(9) → DECIMAL(28,9) accumulation
    keeps the distributed sum exact and order-independent."""
    toks_arr = F.filter(F.split("text", r"\s+"), lambda x: x != "")
    pairs = _materialize(
        _spread(documents, "doc_id", cap=4 * documents.rdd.getNumPartitions())
        .select("doc_id", "source", toks_arr.alias("l"))
        .filter(F.size("l") > 0)
        .select(
            "doc_id",
            "source",
            F.explode(
                F.arrays_zip(
                    F.expr("slice(concat(array(CAST(NULL AS STRING)), l), 1, size(l))"),
                    F.col("l"),
                )
            ).alias("p"),
        )
        .select(
            "doc_id", "source", F.col("p.0").alias("prev"), F.col("p.l").alias("cur")
        )
    )
    uni = pairs.groupBy(F.col("cur").alias("tok")).agg(F.count("*").alias("n_uni"))
    bi = (
        pairs.filter(F.col("prev").isNotNull())
        .groupBy("prev", "cur")
        .agg(F.count("*").alias("c12"))
    )
    total = uni.agg(F.sum("n_uni").alias("n_total"))
    scored = (
        pairs.join(uni.withColumnRenamed("tok", "cur")
                   .withColumnRenamed("n_uni", "cu"), "cur", "left")
        .join(
            uni.withColumnRenamed("tok", "prev")
            .withColumnRenamed("n_uni", "c1"),
            "prev",
            "left",
        )
        .join(bi, ["prev", "cur"], "left")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            "source",
            F.expr(BIGRAM_TERM_SQL).cast("decimal(28,9)").alias("term"),
        )
    )
    return (
        scored.groupBy("doc_id", "source")
        .agg(F.count("*").alias("n_tokens"), F.sum("term").alias("s"))
        .select(
            "doc_id",
            "source",
            "n_tokens",
            (F.col("s").cast("double") / F.col("n_tokens").cast("double")).alias(
                "avg_logprob"
            ),
        )
        .orderBy("doc_id")
    )


def sequence_pack(documents: DataFrame, seq_len: int = 512) -> DataFrame:
    """Pack the corpus' concatenated token stream into fixed-length
    training sequences (GPT-style packing: documents are laid end to
    end with one EOS each, the stream is cut every ``seq_len`` tokens,
    and documents may span cuts). Reports, per document, its global
    stream offset and the sequence span it lands in — the assignment a
    training loader and an attention-mask builder both consume.

    The global stream offset is a DISTRIBUTED two-level cumulative
    sum, never a global window: a per-source window cumsum (doc_id
    order — the `shard_pack` partitioned shape) plus a #sources-row
    prefix relation broadcast back. A naive
    ``Window.orderBy(doc_id)`` with no partition key would funnel the
    whole corpus through ONE task; the two-level form keeps every
    stage partitioned at any scale, and the assignment stays a pure
    function of (source, doc_id) order — deterministic re-runs after
    failure, as with `shard_pack`.

    Returns (doc_id, source, n_tokens, stream_offset, seq_first,
    seq_last, n_seqs) ordered by (source, doc_id); n_tokens counts the
    appended EOS."""
    if seq_len <= 0:
        raise ValueError("sequence_pack: seq_len must be positive")
    n_tok = F.size(F.filter(F.split("text", r"\s+"), lambda x: x != ""))
    per_doc = _spread(documents, "doc_id", cap=4 * documents.rdd.getNumPartitions()).select(
        "doc_id", "source", (n_tok + F.lit(1)).cast("bigint").alias("n_tokens")
    )
    w_src = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # diamond: the in-source offsets feed both the per-source totals
    # and the final projection
    local = _materialize(
        per_doc.withColumn(
            "before_in_source",
            F.coalesce(F.sum("n_tokens").over(w_src), F.lit(0).cast("bigint")),
        )
    )
    totals = local.groupBy("source").agg(F.sum("n_tokens").alias("src_total"))
    w_prefix = Window.orderBy("source").rowsBetween(Window.unboundedPreceding, -1)
    prefix = totals.withColumn(
        "src_prefix",
        F.coalesce(F.sum("src_total").over(w_prefix), F.lit(0).cast("bigint")),
    ).select("source", "src_prefix")
    out = local.join(F.broadcast(prefix), "source").select(
        "doc_id",
        "source",
        "n_tokens",
        (F.col("src_prefix") + F.col("before_in_source")).alias("stream_offset"),
    )
    first = F.expr(f"stream_offset div {int(seq_len)}")
    last = F.expr(f"(stream_offset + n_tokens - 1) div {int(seq_len)}")
    return (
        out.select(
            "doc_id",
            "source",
            "n_tokens",
            "stream_offset",
            first.cast("bigint").alias("seq_first"),
            last.cast("bigint").alias("seq_last"),
            (last - first + 1).cast("bigint").alias("n_seqs"),
        )
        .orderBy("source", "doc_id")
    )


# per-term Jensen–Shannon contribution over (c_st, n_s, c_rest,
# n_rest): both KL halves against the mixture m = (p+q)/2, absent
# sides contribute 0 (0·ln 0 = 0), pinned order, round(9) — evaluated
# verbatim by the DuckDB oracle
JS_TERM_SQL = (
    "round("
    "CASE WHEN c_st > 0 THEN"
    " 0.5 * (CAST(c_st AS DOUBLE) / CAST(n_s AS DOUBLE))"
    " * ln((CAST(c_st AS DOUBLE) / CAST(n_s AS DOUBLE))"
    " / (0.5 * (CAST(c_st AS DOUBLE) / CAST(n_s AS DOUBLE)"
    " + CAST(c_rest AS DOUBLE) / CAST(n_rest AS DOUBLE))))"
    " ELSE 0.0 END"
    " + CASE WHEN c_rest > 0 THEN"
    " 0.5 * (CAST(c_rest AS DOUBLE) / CAST(n_rest AS DOUBLE))"
    " * ln((CAST(c_rest AS DOUBLE) / CAST(n_rest AS DOUBLE))"
    " / (0.5 * (CAST(c_st AS DOUBLE) / CAST(n_s AS DOUBLE)"
    " + CAST(c_rest AS DOUBLE) / CAST(n_rest AS DOUBLE))))"
    " ELSE 0.0 END, 9)"
)


def js_divergence(documents: DataFrame) -> DataFrame:
    """Jensen–Shannon divergence (nats) between each source's unigram
    distribution and the REST of the corpus — the symmetric, bounded
    [0, ln 2] companion to `source_kl_divergence`: KL(source ‖ corpus)
    rewards a source for matching a blend it is itself part of (a
    dominant source looks artificially close), while JS against the
    complement measures what the source actually ADDS. The number
    mix-tuning reports as "distinctiveness".

    Terms absent from one side contribute only the other KL half
    (0·ln 0 = 0), and the mixture m = (p+q)/2 is strictly positive on
    the union support, so every term is finite with no smoothing.
    Per-term contributions are the shared pinned `JS_TERM_SQL`
    round(9) doubles accumulated in DECIMAL; js_distance is the
    metric form √JS of the already-summed value.

    Scale shape: the corpus tokenizes ONCE into the materialized
    (source, term, c_st) relation (the `source_kl_divergence`
    diamond); the union support is the (vocabulary × #sources) spine —
    bounded by vocab size times the handful of sources, shuffled on
    term, never row-wise on the feed; source totals broadcast; the
    final aggregate is #sources rows. Sources with an empty complement
    (single-source corpus) are excluded (JS vs nothing is undefined)."""
    tok_arr = F.filter(F.split("text", r"\s+"), lambda x: x != "")
    tf = _materialize(
        _spread(documents, "doc_id", cap=4 * documents.rdd.getNumPartitions())
        .select("source", F.explode(tok_arr).alias("term"))
        .groupBy("source", "term")
        .agg(F.count("*").alias("c_st"))
    )
    src_tot = tf.groupBy("source").agg(F.sum("c_st").alias("n_s"))
    term_tot = tf.groupBy("term").agg(F.sum("c_st").alias("c_t"))
    total = src_tot.agg(F.sum("n_s").alias("n_total"))
    spine = term_tot.crossJoin(F.broadcast(src_tot.select("source")))
    rows = (
        spine.join(tf, ["source", "term"], "left")
        .select(
            "source",
            "term",
            F.coalesce("c_st", F.lit(0)).alias("c_st"),
            "c_t",
        )
        .join(F.broadcast(src_tot), "source")
        .crossJoin(F.broadcast(total))
        .select(
            "source",
            "c_st",
            "n_s",
            (F.col("c_t") - F.col("c_st")).alias("c_rest"),
            (F.col("n_total") - F.col("n_s")).alias("n_rest"),
        )
        .filter(F.col("n_rest") > 0)
    )
    return (
        rows.groupBy("source")
        .agg(
            F.sum(F.when(F.col("c_st") > 0, 1).otherwise(0)).alias(
                "n_terms_src"
            ),
            F.sum(F.expr(JS_TERM_SQL).cast("decimal(38,9)")).alias("js"),
        )
        .select(
            "source",
            F.col("n_terms_src").cast("bigint").alias("n_terms_src"),
            F.expr("CAST(js AS DOUBLE)").alias("js_nats"),
            F.expr(
                "round(sqrt(greatest(CAST(js AS DOUBLE), 0.0)), 9)"
            ).alias("js_distance"),
        )
        .orderBy("source")
    )


def seqlen_histogram(documents: DataFrame) -> DataFrame:
    """Per-source power-of-two document-length histogram (whitespace
    tokens): bucket b holds docs with 2^(b-1) <= n_tokens < 2^b (b =
    binary digit count; empty docs land in bucket 1 with n = 0's
    binary rendering '0') — the sequence-length profile a packing /
    context-window plan is sized from (`shard_pack` budgets, padding
    estimates, truncation loss).

    The bucket is an INTEGER property (digit count of the base-2
    rendering) — no log2 double anywhere, so bucket edges are exact in
    both engines. One tokenize scan into a (source, bucket) aggregate;
    output is #sources × ~20 rows."""
    n_tok = F.size(F.filter(F.split("text", r"\s+"), lambda x: x != ""))
    return (
        _spread(documents, "doc_id", cap=4 * documents.rdd.getNumPartitions())
        .select(
            "source",
            n_tok.cast("bigint").alias("n_tokens"),
            F.length(F.conv(n_tok.cast("string"), 10, 2)).cast("int").alias(
                "len_bucket"
            ),
        )
        .groupBy("source", "len_bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
            F.sum("n_tokens").cast("bigint").alias("bucket_tokens"),
        )
        .orderBy("source", "len_bucket")
    )


def sample_skew_audit(documents: DataFrame, pct: int = 10) -> DataFrame:
    """Sampling-bias audit for `hash_sample`: per source, the
    population count, the sampled count, the realized rate, the
    expected count, and the binomial standardized residual
    (n_sample − n·p)/√(n·p·(1−p)) — the check that a hash-bucket
    sample did not systematically over/under-represent a source
    (|resid| ≳ 3 on a big source means the hash and the source are
    correlated, e.g. near-identical templated documents hashing into
    the same buckets). Run it before trusting any sampled eval.

    Composition: the `hash_sample` predicate re-applied as a
    conditional count inside ONE (source) keyed aggregate over a
    single corpus scan — the sample is NOT re-materialized and the
    audit can never disagree with the operator (same
    `content_hash_bucket` expression). Exact integer counts; the
    expected/residual are fixed-order double expressions of those
    integers (/, *, sqrt — correctly-rounded ops only)."""
    p_expr = f"CAST({pct} AS DOUBLE) / 100.0"
    per_src = (
        _spread(documents, "doc_id", cap=4 * documents.rdd.getNumPartitions())
        .withColumn("hash_bucket", content_hash_bucket("text"))
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_pop"),
            F.sum(F.when(F.col("hash_bucket") < pct, 1).otherwise(0))
            .cast("bigint")
            .alias("n_sample"),
        )
    )
    return (
        per_src.select(
            "source",
            "n_pop",
            "n_sample",
            F.expr(
                "round(CAST(n_sample AS DOUBLE) / CAST(n_pop AS DOUBLE), 9)"
            ).alias("sample_rate"),
            F.expr(
                f"round(CAST(n_pop AS DOUBLE) * ({p_expr}), 9)"
            ).alias("expected"),
            F.expr(
                f"round((CAST(n_sample AS DOUBLE) - CAST(n_pop AS DOUBLE) * ({p_expr}))"
                f" / sqrt(CAST(n_pop AS DOUBLE) * ({p_expr}) * (1.0 - ({p_expr}))), 9)"
            ).alias("std_residual"),
        )
        .orderBy("source")
    )


def doc_perplexity_outliers(documents: DataFrame) -> DataFrame:
    """Perplexity-outlier curation panel: per source, how many
    documents score as LM outliers — avg unigram log-prob more than
    3·1.4826·MAD below the source median (the `mad_outliers` robust
    rule applied to `unigram_logprob_score`, i.e. the CCNet
    "perplexity bucket then drop the tail" filter in panel form).
    Low-side only: unusually HIGH logprob is just typical text, while
    the low tail is the boilerplate/garbled/wrong-language mass a
    perplexity filter exists to drop.

    Determinism AND bounded state: avg_logprob is one final double
    division over the decimal logp sum (deterministic per doc); the
    median and MAD run on the INTEGER-micronats grid
    q6 = floor(avg_logprob·10⁶) — the `quality_calibration_curve` q3
    move: the raw score is near-unique per doc, so a counts relation
    over it grows with the corpus, while the quantized alphabet is
    bounded by the score's range (~10⁷ values) forever. floor, not
    round (no .5-boundary rounding-mode divergence). The flag
    compares integer micronats against the fixed-order constant
    product — no fresh transcendental anywhere past the pinned
    per-token ln.

    Scale shape: the scorer's tokenize pass reduces to a per-doc
    relation; baselines run over the bounded quantized counts; flags
    are a broadcast join back. Output ≤ #sources rows."""
    from .util import disc_quantiles_from_counts as _disc_quantiles

    scored = _materialize(
        unigram_logprob_score(documents).select(
            "doc_id",
            "source",
            F.expr("CAST(floor(avg_logprob * 1000000) AS BIGINT)").alias("q6"),
        )
    )
    med = _materialize(
        _disc_quantiles(scored, ["source"], "q6", [("med_q6", 1, 2)])
    )
    mad = _disc_quantiles(
        scored.join(F.broadcast(med), "source").select(
            "source",
            F.abs(F.col("q6") - F.col("med_q6")).alias("adev"),
        ),
        ["source"],
        "adev",
        [("mad_q6", 1, 2)],
    )
    baseline = med.join(mad, "source")
    return (
        scored.join(F.broadcast(baseline), "source")
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.first("med_q6").alias("med_q6"),
            F.first("mad_q6").alias("mad_q6"),
            F.sum(
                F.when(
                    F.expr("med_q6 - q6 > (3.0 * 1.4826) * mad_q6"),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
        .select(
            "source",
            "n_docs",
            (F.col("med_q6").cast("double") / F.lit(1000000.0)).alias(
                "med_logprob"
            ),
            (F.col("mad_q6").cast("double") / F.lit(1000000.0)).alias(
                "mad_logprob"
            ),
            "n_outliers",
            (
                F.col("n_outliers").cast("double") / F.col("n_docs").cast("double")
            ).alias("outlier_rate"),
        )
        .orderBy("source")
    )


def mix_rebalance_plan(
    documents: DataFrame, target_ppm: dict[str, int] | None = None
) -> DataFrame:
    """Sampling-rate plan to hit a target source mix under a fixed
    total token budget — the knob a training-data pipeline turns after
    the audits (`source_kl_divergence`, `class_balance`) say the mix
    is wrong. With no explicit target the plan equalizes sources
    (target share = 1/#sources, in parts-per-million so the target is
    INTEGER and the oracle shares it exactly).

    For each source with n_tok tokens out of N total: the largest
    budget B ≤ N whose per-source demand d_s = B·ppm_s/10⁶ fits every
    source (d_s ≤ n_tok) is B = min over sources of
    n_tok·10⁶ div ppm_s — pure integer arithmetic (the
    `interval_overlap_join` cross-multiplication rule). Emitted
    per-source: keep_tokens = B·ppm_s div 10⁶ and the two final
    double divisions (current share, sampling rate).

    Scale shape: ONE whitespace-token count per source (map-side
    size() sum — no explode), a 1-row broadcast total, arithmetic on
    the ≤ #sources relation. Nothing shuffles but source keys."""
    toks = documents.groupBy("source").agg(
        F.sum(F.size(F.filter(F.split("text", r"\s+"), lambda x: x != "")))
        .cast("bigint")
        .alias("n_tok")
    )
    toks = _materialize(toks)
    n_sources = toks.count()
    if target_ppm is None:
        share = 1_000_000 // n_sources
        ppm = F.lit(share)
    else:
        mapping = F.create_map(
            *[F.lit(x) for kv in target_ppm.items() for x in kv]
        )
        ppm = F.coalesce(mapping[F.col("source")], F.lit(0))
    per = toks.select("source", "n_tok", ppm.cast("bigint").alias("ppm"))
    budget = per.filter(F.col("ppm") > 0).agg(
        F.min(F.expr("n_tok * 1000000 div ppm")).alias("budget")
    )
    return (
        per.crossJoin(F.broadcast(budget))
        .crossJoin(
            F.broadcast(
                toks.agg(F.sum("n_tok").cast("bigint").alias("total_tok"))
            )
        )
        .select(
            "source",
            "n_tok",
            "ppm",
            F.col("budget").cast("bigint").alias("budget_tokens"),
            F.expr("budget * ppm div 1000000").cast("bigint").alias("keep_tokens"),
            (F.col("n_tok").cast("double") / F.col("total_tok").cast("double")).alias(
                "current_share"
            ),
            F.expr(
                "CAST(budget * ppm div 1000000 AS DOUBLE) / CAST(n_tok AS DOUBLE)"
            ).alias("sampling_rate"),
        )
        .orderBy("source")
    )

def doc_length_percentiles(documents: DataFrame) -> DataFrame:
    """Per-source document-length quartiles + p95 (continuous/type-7
    interpolation) — the KEYED operating point of the counts-based
    quantile family: `value_percentiles_interp` proved the global/
    per-type shape on the feed, `stream_value_percentiles` the
    weighted-counts state shape; this is the per-SOURCE corpus
    profile a mixture designer reads before setting packing lengths
    and length-filter cutoffs (a source whose p95 is under the
    sequence length packs clean; one whose p25 exceeds it needs
    chunking, not filtering).

    Exactness: `util.cont_quantiles_from_counts` — integer rank
    split over the per-(source, n_chars) count relation, one
    fixed-shape interpolation expression at the edge, mirrored
    verbatim by the oracle (never `quantile_cont`).

    Scale shape: the count relation is bounded by #sources × distinct
    lengths (lengths are small integers — a naturally quantized
    alphabet, no q-grid needed), map-side combinable; no value
    buffering anywhere."""
    from .util import cont_quantiles_from_counts

    return cont_quantiles_from_counts(
        documents,
        ["source"],
        "n_chars",
        [("p25", 1, 4), ("p50", 1, 2), ("p75", 3, 4), ("p95", 19, 20)],
    ).orderBy("source")
