"""Text-analysis operators over the `documents` table — the
training-data-pipeline layer (language ID, quality scoring, token
counting, fingerprinting).

All expressions are built-in higher-order / string functions (JVM-side,
codegen) — no Python in the hot path. Counts and ratios are exact
integers until one final double division, so results are engine-exact
for oracle checking.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .util import materialize as _materialize
from .util import spread as _spread

# Tiny per-language stopword lists for the n-gram/stopword heuristic
# language identifier. Deliberately simple and deterministic.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "ein"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "fr": ["le", "la", "de", "et", "un", "une", "est", "dans"],
}


def _tokens(col: Column) -> Column:
    """Whitespace tokens with empties dropped (split on runs)."""
    return F.filter(F.split(col, r"\s+"), lambda x: x != "")


def _token_counts(
    documents: DataFrame,
    extra_aggs: list[Column] | None = None,
    carry: dict[str, Column] | None = None,
) -> DataFrame:
    """ONE corpus scan for all token-derived counts: tokenize via
    explode and aggregate in a single keyed agg — several
    `size(filter(split(...)))` expressions in one projection each
    re-tokenize the row (measured ~1.5× slower at sf0.1, and the gap
    grows with tokens/doc).

    `carry` maps output names to row-level expressions (punctuation
    counts, lengths, ...) computed in the SAME projection before the
    explode and carried through the agg with `first()` — so callers
    don't need a second scan + join for per-row features.
    `explode_outer` keeps zero-token documents (their `tok` is NULL;
    `count("tok")` yields 0)."""
    carry = carry or {}
    # two selects on purpose: the explode argument must be a bare
    # precomputed column, otherwise ExtractGenerator leaves the carried
    # expressions in a Project ABOVE the Generate and they get
    # re-evaluated once per exploded token instead of once per document
    # (plan-asserted in tests/test_plans.py)
    base = (
        _spread(documents, "doc_id", cap=4 * documents.rdd.getNumPartitions())
        .select(
            "doc_id",
            *[c.alias(n) for n, c in carry.items()],
            _tokens(F.col("text")).alias("toks"),
        )
        .select("doc_id", *carry.keys(), F.explode_outer("toks").alias("tok"))
    )
    aggs = [
        F.count("tok").alias("n_tokens"),
        F.countDistinct("tok").alias("n_unique"),
    ]
    # carried columns are functions of doc_id, so they ride as grouping
    # keys — zero aggregate state, unlike first()-style carries
    return base.groupBy("doc_id", *carry.keys()).agg(*(aggs + (extra_aggs or [])))


def token_stats(documents: DataFrame) -> DataFrame:
    """Token counting: whitespace tokens plus a BPE-ish regex token
    count (`[a-z]+|[0-9]+|[^a-z0-9\\s]` word/number/punct atoms), and
    mean token length. Single corpus scan: the regex counts ride the
    tokenize pass as carried row-level columns.

    The atom count is computed as THREE positive-class scans — alpha
    runs + digit runs + punct chars by complement arithmetic
    (`length − length(alnum/space chars)`, each punct char is exactly
    one atom) — instead of the literal alternation, whose
    `[^a-z0-9\\s]` arm pays the negated-class penalty (the
    `normalized_dedup` rule): value-identical by construction (the
    alternation's three arms partition the atom set; pinned on corpus
    + unicode edges in tests/test_round8_wave6.py), measured
    3.68 → 1.09 s per 500k docs and the dominant term of this
    operator's 5M-doc wall time. The oracle keeps the one-regex
    alternation spelling — same counts."""
    bpe = (
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[a-z]+"), 0))
        + F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[0-9]+"), 0))
        + F.length("text")
        - F.length(
            F.array_join(
                F.regexp_extract_all(F.col("text"), F.lit(r"[a-z0-9\s]+"), 0), ""
            )
        )
    )
    counts = _token_counts(
        documents,
        carry={
            "n_bpe_tokens": bpe,
            "n_nonspace_chars": F.length(F.regexp_replace("text", r"\s+", "")),
        },
    )
    return (
        counts.select(
            "doc_id",
            F.col("n_tokens").cast("int").alias("n_tokens"),
            "n_bpe_tokens",
            F.col("n_unique").cast("int").alias("n_unique_tokens"),
            "n_nonspace_chars",
        )
        .withColumn(
            "mean_token_len",
            F.when(
                F.col("n_tokens") > 0,
                F.col("n_nonspace_chars").cast("double") / F.col("n_tokens").cast("double"),
            ).otherwise(F.lit(0.0)),
        )
        .orderBy("doc_id")
    )


def quality_score(documents: DataFrame) -> DataFrame:
    """Quality scoring: length / punctuation / stopword / uniqueness
    ratios folded into a 0-100 score with a CASE band. Mirrors the
    reference's threshold-flagging post-processing style
    (views.py:618-638) applied to document quality."""
    stop_all = [w for ws in LANG_STOPWORDS.values() for w in ws]
    counts = _token_counts(
        documents,
        [F.count(F.when(F.col("tok").isin(stop_all), 1)).alias("n_stopwords")],
        carry={
            "lang": F.col("lang"),
            "n_chars_m": F.length("text"),
            # complement arithmetic, NOT a negated class: Spark's
            # regex engine degrades ~10× on [^...] (25 s vs 2.5 s per
            # 571k docs, measured) — count the allowed chars with a
            # positive class and subtract. Value-identical to
            # size(extract_all('[^a-z0-9\s]')) since every match of
            # the negated class is exactly one char (pinned by test).
            "n_punct": F.length("text")
            - F.length(
                F.array_join(
                    F.regexp_extract_all(
                        F.col("text"), F.lit(r"[a-z0-9\s]+"), 0
                    ),
                    "",
                )
            ),
        },
    )
    df = counts.select(
        "doc_id",
        "lang",
        "n_chars_m",
        F.col("n_tokens").cast("int").alias("n_tokens"),
        F.col("n_unique").cast("int").alias("n_unique"),
        F.col("n_stopwords").cast("int").alias("n_stopwords"),
        "n_punct",
    )
    uniq_ratio = F.col("n_unique").cast("double") / F.col("n_tokens").cast("double")
    stop_ratio = F.col("n_stopwords").cast("double") / F.col("n_tokens").cast("double")
    punct_ratio = F.col("n_punct").cast("double") / F.col("n_chars_m").cast("double")
    score = (
        uniq_ratio * 50.0
        + stop_ratio * 30.0
        + (F.lit(1.0) - punct_ratio) * 10.0
        + F.when(F.col("n_tokens").between(20, 500), F.lit(10.0)).otherwise(F.lit(0.0))
    )
    return (
        df.filter(F.col("n_tokens") > 0)
        .withColumn("uniq_ratio", uniq_ratio)
        .withColumn("stop_ratio", stop_ratio)
        .withColumn("quality", score)
        .withColumn(
            "quality_band",
            F.when(score >= 60, "high").when(score >= 40, "medium").otherwise("low"),
        )
        .select("doc_id", "lang", "n_tokens", "uniq_ratio", "stop_ratio", "quality", "quality_band")
        .orderBy("doc_id")
    )


def lang_id(documents: DataFrame) -> DataFrame:
    """Heuristic language ID: per-language stopword hit counts with a
    deterministic argmax (score desc, language code asc). Exact integer
    scores → engine-exact. On real corpora the stopword lists grow;
    the operator shape (token filter + greatest/CASE) is unchanged."""
    counts = _token_counts(
        documents,
        [
            F.count(F.when(F.col("tok").isin(ws), 1)).alias(f"raw_{lg}")
            for lg, ws in LANG_STOPWORDS.items()
        ],
        carry={"lang": F.col("lang")},
    )
    scored = counts.select(
        "doc_id",
        "lang",
        *[F.col(f"raw_{lg}").cast("int").alias(f"score_{lg}") for lg in LANG_STOPWORDS],
    )
    langs = sorted(LANG_STOPWORDS)  # asc tiebreak
    best = F.greatest(*[F.col(f"score_{lg}") for lg in langs])
    guess = F.lit("unknown")
    for lg in reversed(langs):
        guess = F.when(F.col(f"score_{lg}") == best, F.lit(lg)).otherwise(guess)
    guess = F.when(best == 0, F.lit("unknown")).otherwise(guess)
    return scored.withColumn("lang_guess", guess).orderBy("doc_id")


def clean_text(documents: DataFrame) -> DataFrame:
    """Pre-tokenization scrub — the standard corpus-cleaning pass:
    strip URLs, e-mail addresses, and HTML-ish tags, then collapse
    whitespace runs. Pure map-side regexp chain (one scan, no shuffle
    besides the display sort); every pattern is POSIX-portable so the
    DuckDB oracle applies the identical rewrites."""
    cleaned = F.trim(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace("text", r"https?://[^\s]+", " "),
                    r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}",
                    " ",
                ),
                r"<[^>]*>",
                " ",
            ),
            r"\s+",
            " ",
        )
    )
    return (
        _spread(documents, "doc_id", cap=4 * documents.rdd.getNumPartitions())
        .select(
            "doc_id",
            cleaned.alias("clean"),
            F.length("text").alias("raw_len"),
        )
        .withColumn("clean_len", F.length("clean"))
        .select("doc_id", "clean", "raw_len", "clean_len")
        .orderBy("doc_id")
    )


C4_MIN_WORDS = 5
C4_MAX_WORD_CHARS = 1000


def c4_rule_filter(documents: DataFrame) -> DataFrame:
    """C4-style heuristic cleaning rules as an auditable keep/drop
    panel: one boolean per rule plus the final ``keep`` conjunction —
    the hard-rule complement of the soft `quality_score`/`quality_logit`
    scorers (a curation pipeline runs the rules first, then scores the
    survivors). Rules are the document-level adaptation of the C4
    paper's line filters:

    - ``has_min_words``: ≥ 5 tokens;
    - ``has_terminal_punct``: trimmed text ends in . ! ? or " ;
    - ``no_braces``: no '{' or '}' (code/markup leak signal);
    - ``no_lorem``: no 'lorem ipsum' (case-insensitive);
    - ``no_policy_boilerplate``: none of the C4 stop-phrases
      ('javascript', 'cookie policy', 'terms of use', 'privacy
      policy') in the lowered text;
    - ``no_long_word``: longest token ≤ 1000 chars (minified-blob
      signal).

    All rules are single-scan vectorized built-ins (contains/regexp/
    array-fold) — one projection, no shuffle before the final sort;
    at 100 TB this is a pure map stage. Returns (doc_id, n_tokens,
    the six rule booleans, keep) ordered by doc_id."""
    toks = _tokens(F.col("text"))
    low = F.lower("text")
    trimmed = F.rtrim(F.col("text"))
    rules = {
        "has_min_words": F.size(toks) >= C4_MIN_WORDS,
        "has_terminal_punct": trimmed.rlike(r'[.!?"]$'),
        "no_braces": ~F.col("text").contains("{") & ~F.col("text").contains("}"),
        "no_lorem": ~low.contains("lorem ipsum"),
        "no_policy_boilerplate": (
            ~low.contains("javascript")
            & ~low.contains("cookie policy")
            & ~low.contains("terms of use")
            & ~low.contains("privacy policy")
        ),
        "no_long_word": F.aggregate(
            toks, F.lit(0), lambda acc, t: F.greatest(acc, F.length(t))
        )
        <= C4_MAX_WORD_CHARS,
    }
    keep = None
    for expr in rules.values():
        keep = expr if keep is None else (keep & expr)
    return (
        _spread(documents, "doc_id", cap=4 * documents.rdd.getNumPartitions())
        .select(
            "doc_id",
            F.size(toks).cast("int").alias("n_tokens"),
            *[expr.alias(name) for name, expr in rules.items()],
            keep.alias("keep"),
        )
        .orderBy("doc_id")
    )


def repetition_score(documents: DataFrame) -> DataFrame:
    """Repetition quality signal: the share of the document covered by
    its single most-frequent bigram — high values flag boilerplate /
    degenerate repetition (the classic dedup-adjacent filter). One
    tokenize pass, bigrams via zip_with over a shifted slice (O(tokens)
    like `dedup._word_shingles`), then a keyed agg: max bigram count /
    total bigrams, exact integers until one final double division."""
    toks = _tokens(F.col("text"))
    bigrams = F.filter(
        F.zip_with(toks, F.slice(toks, 2, 1 << 30), lambda a, b: F.concat(a, F.lit(" "), b)),
        lambda x: x.isNotNull(),
    )
    per_bigram = (
        _spread(documents, "doc_id", cap=4 * documents.rdd.getNumPartitions())
        .select("doc_id", F.explode(bigrams).alias("bg"))
        .groupBy("doc_id", "bg")
        .agg(F.count("*").alias("n"))
    )
    return (
        per_bigram.groupBy("doc_id")
        .agg(F.max("n").alias("max_bigram"), F.sum("n").alias("n_bigrams"))
        .select(
            "doc_id",
            F.col("max_bigram").cast("int").alias("max_bigram"),
            F.col("n_bigrams").cast("int").alias("n_bigrams"),
            (F.col("max_bigram").cast("double") / F.col("n_bigrams").cast("double")).alias(
                "rep_ratio"
            ),
        )
        .orderBy("doc_id")
    )


# PII patterns shared verbatim between the Spark plan and the DuckDB
# oracle (both Java regex and RE2 accept them: character classes,
# bounded repetition, ASCII \b). Order matters: IP before phone so a
# dotted number is claimed by the more specific 4-group pattern first.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "<EMAIL>"),
    ("ip", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b", "<PHONE>"),
]


def pii_redact(documents: DataFrame) -> DataFrame:
    """PII scrub — the pre-training redaction pass: replace e-mail
    addresses, IPv4 addresses, and NNN-NNN-NNNN phone numbers with
    typed placeholders, reporting per-category hit counts.

    Pure map-side: per-category counts ride the same projection as the
    regexp_replace chain, so the corpus is scanned once and nothing
    shuffles except the display sort. Counts are taken on the RAW text
    (before any replacement) so categories can't steal each other's
    matches mid-chain; the replacement chain applies in PII_PATTERNS
    order. Production pipelines add locale-specific patterns (IBAN,
    SSN, ...) to PII_PATTERNS — the operator shape is unchanged.
    """
    redacted = F.col("text")
    counts = []
    for name, pat, rep in PII_PATTERNS:
        counts.append(
            F.size(F.regexp_extract_all(F.col("text"), F.lit(pat), 0)).alias(f"n_{name}s")
        )
        redacted = F.regexp_replace(redacted, pat, rep)
    return (
        _spread(documents, "doc_id", cap=4 * documents.rdd.getNumPartitions())
        .select("doc_id", *counts, redacted.alias("redacted"))
        .withColumn(
            "n_redactions",
            sum(F.col(f"n_{name}s") for name, _, _ in PII_PATTERNS).cast("int"),
        )
        .withColumn("redacted_len", F.length("redacted"))
        .select(
            "doc_id", "n_emails", "n_ips", "n_phones", "n_redactions",
            "redacted", "redacted_len",
        )
        .orderBy("doc_id")
    )


def fingerprint(documents: DataFrame) -> DataFrame:
    """Document fingerprinting: md5 of whitespace-normalized text plus a
    31-polynomial rolling hash (mod 1e9+7) over characters — the
    rolling hash is the shape used for shingle hashing at scale and is
    expressible in any engine for oracle parity."""
    norm = F.lower(F.trim(F.regexp_replace("text", r"\s+", " ")))
    chars = F.filter(F.split(norm, ""), lambda c: c != "")
    rolling = F.aggregate(
        chars,
        F.lit(0).cast("bigint"),
        lambda acc, c: (acc * 31 + F.ascii(c)) % 1000000007,
    )
    return _spread(documents, "doc_id", cap=4 * documents.rdd.getNumPartitions()).select(
        "doc_id",
        F.md5(norm.cast("binary")).alias("md5_fp"),
        rolling.alias("rolling_fp"),
    ).orderBy("doc_id")


def bpe_pair_stats(documents: DataFrame, top_n: int = 50) -> DataFrame:
    """Corpus-wide adjacent character-pair frequencies — the statistic
    a byte-pair-encoding tokenizer's first merge step maximizes
    (Sennrich et al. 2016). Every occurrence counts (not per-doc
    distinct), so the output ranks exactly what BPE would merge first.

    Pairs are generated per token with `transform(sequence(...))` over
    plain `substring` — the indexed subtree is the scalar token, so
    the NOTES.md quadratic-re-evaluation trap (indexing into a
    *computed array*) does not apply. One explode + one keyed count +
    TakeOrderedAndProject for the deterministic (count desc, pair asc)
    head — map-side combine collapses each task to its distinct-pair
    set (≤ ~1.3k for [a-z0-9]²), so the shuffle is tiny at any corpus
    size.
    """
    toks = _spread(documents, "doc_id", cap=4 * documents.rdd.getNumPartitions()).select(
        F.explode(_tokens(F.col("text"))).alias("tok")
    )
    pairs = (
        toks.filter(F.length("tok") >= 2)
        .select(
            F.explode(
                F.expr("transform(sequence(1, length(tok) - 1), i -> substring(tok, i, 2))")
            ).alias("pair")
        )
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("pair").asc())
        .limit(top_n)
    )


# fixed-weight logistic quality model, shared verbatim with the DuckDB
# oracle: one transcendental (exp), pinned evaluation order, rounded
# to 6 dp at the edge (no accumulation follows, so per-row rounding is
# the only cross-engine surface). Inputs are exact ratios of integer
# counts, so the argument of exp() is bit-identical on both engines.
QUALITY_LOGIT_SQL = (
    "round(1.0 / (1.0 + exp(-("
    "-2.0 + 3.0 * (CAST(n_unique AS DOUBLE) / CAST(n_tokens AS DOUBLE))"
    " + 2.5 * (CAST(n_stopwords AS DOUBLE) / CAST(n_tokens AS DOUBLE))"
    " + 0.08 * (CAST(n_tokens AS DOUBLE) / 100.0)"
    " - 0.35 * ((CAST(n_nonspace AS DOUBLE) / CAST(n_tokens AS DOUBLE)) - 5.0)"
    "))), 6)"
)


def quality_logit(documents: DataFrame) -> DataFrame:
    """Model-based keep/drop gate: a fixed-weight logistic classifier
    over token features — the shape of the fastText/linear quality
    classifiers LLM pipelines apply corpus-wide (CCNet, Gopher rules),
    one step up from `quality_score`'s additive heuristic: the output
    is a calibrated keep probability plus the 0.5-threshold decision.
    Weights are pinned constants (a deployed model's coefficients are
    data, not code); scoring is pure map-side arithmetic.

    Feature extraction rides ONE corpus tokenize pass
    (`_token_counts` — uniqueness, stopword hits, and non-space length
    in a single keyed agg); scoring adds zero shuffles. At 100 TB
    this is exactly one scan over the corpus with codegen'd
    expressions — no Python UDF, no model server round-trip."""
    stop_all = [w for ws in LANG_STOPWORDS.values() for w in ws]
    counts = _token_counts(
        documents,
        [F.count(F.when(F.col("tok").isin(stop_all), 1)).alias("n_stopwords")],
        carry={"n_nonspace": F.length(F.regexp_replace("text", r"\s+", ""))},
    )
    return (
        counts.filter(F.col("n_tokens") > 0)
        .select(
            "doc_id",
            F.col("n_tokens").cast("int").alias("n_tokens"),
            F.expr(QUALITY_LOGIT_SQL).alias("keep_p"),
        )
        .withColumn("keep", F.col("keep_p") >= 0.5)
        .orderBy("doc_id")
    )


def char_trigram_langid(documents: DataFrame, k: int = 50) -> DataFrame:
    """Train AND evaluate a character-trigram language classifier in
    one declarative plan, reporting the confusion matrix — the
    Cavnar–Trenkle n-gram profile method that production language ID
    (fastText, CLD) descends from, and a step past `lang_id`'s
    stopword heuristic (which needs curated word lists; trigram
    profiles are learned from the labeled corpus itself).

    Train: per-language top-`k` trigram profiles (count desc, trigram
    asc — deterministic), weight = k+1-rank. Classify: each document's
    DISTINCT trigrams probe the profile table; the best-scoring
    language wins (score desc, language asc). Evaluate: exact
    (lang_true, lang_pred, n) cells.

    Scale shape: the corpus is trigram-exploded ONCE into a
    materialized relation feeding both the profile aggregation and
    the per-doc distinct probe (diamond rule). The trained model is
    #langs×k rows — broadcast — so classification is one map-side
    join + one doc-keyed aggregation + a top-1 window per doc. All
    scores are exact integers; ties break lexicographically on both
    engines."""
    # overlapping trigrams via one regex pass (lookahead captures 3
    # code points at every position) — NOT transform(sequence, i ->
    # substring(text, i, 3)): UTF8String.substring walks from the
    # string start to find the code-point offset, so the indexed form
    # is O(doc_len²) per document and measured 3× slower at sf0.1.
    # Output is identical for docs of >=3 code points (both code-point
    # semantics); on SHORTER docs the forms differ — the indexed form's
    # sequence(1, len-2) descends to [1, 0] and emits padded
    # sub-'trigrams', the regex form emits none. The regex behavior is
    # the correct one (matches the oracle's len>=3 filter) and is
    # pinned by the short-doc case in
    # tests/test_wave6_ops.py::test_trigram_regex_extraction_matches_indexed_substring.
    tri_arr = F.expr(r"regexp_extract_all(text, '(?s)(?=(.{3})).', 1)")
    # materialize the GROUPED (doc, trigram, count) relation, not the
    # raw explode: profiles re-aggregate it (sum of per-doc counts ==
    # raw occurrence counts) and the probe needs exactly its distinct
    # rows — one grouped shuffle replaces a raw materialization plus a
    # later corpus-sized DISTINCT
    tri_counts = _materialize(
        _spread(documents, "doc_id", cap=4 * documents.rdd.getNumPartitions())
        .filter(F.length("text") >= 3)
        .select("doc_id", F.col("lang").alias("lang_true"), tri_arr.alias("ts"))
        .select("doc_id", "lang_true", F.explode("ts").alias("tg"))
        .groupBy("doc_id", "lang_true", "tg")
        .agg(F.count("*").alias("n_tg"))
    )
    w_rank = Window.partitionBy("plang").orderBy(F.desc("n"), F.asc("tg"))
    profiles = (
        tri_counts.groupBy(F.col("lang_true").alias("plang"), "tg")
        .agg(F.sum("n_tg").alias("n"))
        .withColumn("rnk", F.row_number().over(w_rank))
        .filter(F.col("rnk") <= k)
        .select("plang", "tg", (F.lit(k + 1) - F.col("rnk")).cast("bigint").alias("wt"))
    )
    doc_tg = tri_counts.select("doc_id", "lang_true", "tg")
    scores = (
        doc_tg.join(F.broadcast(profiles), "tg")
        .groupBy("doc_id", "lang_true", "plang")
        .agg(F.sum("wt").alias("score"))
    )
    w_best = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("plang"))
    best = (
        scores.withColumn("rn", F.row_number().over(w_best))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang_true", F.col("plang").alias("lang_pred"))
    )
    return (
        best.groupBy("lang_true", "lang_pred")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
        .orderBy("lang_true", "lang_pred")
    )


def vocab_growth(documents: DataFrame, n_buckets: int = 20) -> DataFrame:
    """Heaps'-law curve of the corpus: cumulative distinct vocabulary
    vs cumulative token count along doc_id order, bucketed — "is this
    corpus still contributing new vocabulary, or has it saturated?",
    the curve a data-mix review reads before paying to ingest more of
    a source (V(n) ≈ K·n^β keeps climbing for diverse text; a
    templated crawl flattens early). The type-token ratio per bucket
    is the same signal normalized.

    A term's contribution point is its FIRST document (min doc_id) —
    so cum_vocab at bucket b counts exactly the distinct terms seen in
    buckets ≤ b, without ever holding a growing distinct-set state.
    Buckets are fixed doc_id ranges ((doc_id−mn)·B div span) — pure
    arithmetic, no global row-numbering window, cluster-safe on an
    unsorted corpus.

    Scale shape: one tokenize pass reduces to (term → first_doc,
    n_uses) via a keyed min/count aggregate (map-side partials); doc
    token counts reduce to per-bucket sums the same way. Only the
    ≤ `n_buckets` bucket rows enter the running-total window (single
    partition over ≤ B rows — bounded by construction, not by data).
    Empty buckets (sparse doc_id ranges) surface with zero deltas so
    the curve's x-axis stays honest."""
    if n_buckets < 1:
        raise ValueError("vocab_growth: n_buckets must be ≥ 1")
    # diamond rule: ONE tokenize pass, reduced to the grouped
    # (doc_id, term, n) relation before materializing — it feeds both
    # the per-term first-doc aggregate and the per-doc token totals
    # (the raw exploded stream would be corpus-sized; the grouped form
    # is bounded by per-doc distinct terms, the same trade
    # char_trigram_langid makes)
    tf_dt = _materialize(
        _spread(documents, "doc_id", cap=4 * documents.rdd.getNumPartitions())
        .select("doc_id", F.explode(_tokens(F.col("text"))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("n"))
    )
    bounds = documents.agg(
        F.min("doc_id").alias("mn"), F.max("doc_id").alias("mx")
    )
    bucket_of = (
        f"CAST(((doc_id - mn) * {n_buckets}) div (mx - mn + 1) AS INT)"
    )
    term_first = (
        tf_dt.groupBy("term")
        .agg(F.min("doc_id").alias("doc_id"))
        .crossJoin(F.broadcast(bounds))
        .groupBy(F.expr(bucket_of).alias("bucket"))
        .agg(F.count("*").alias("new_terms"))
    )
    doc_tokens = (
        tf_dt.groupBy("doc_id")
        .agg(F.sum("n").alias("n_tok"))
        .crossJoin(F.broadcast(bounds))
        .groupBy(F.expr(bucket_of).alias("bucket"))
        .agg(F.count("*").alias("n_docs"), F.sum("n_tok").alias("bucket_tokens"))
    )
    spine = documents.sparkSession.range(n_buckets).select(
        F.col("id").cast("int").alias("bucket")
    )
    per_bucket = (
        spine.join(doc_tokens, "bucket", "left")
        .join(term_first, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("n_docs", F.lit(0)).cast("bigint").alias("n_docs"),
            F.coalesce("bucket_tokens", F.lit(0)).cast("bigint").alias(
                "bucket_tokens"
            ),
            F.coalesce("new_terms", F.lit(0)).cast("bigint").alias("new_terms"),
        )
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per_bucket.select(
            "bucket",
            "n_docs",
            "bucket_tokens",
            "new_terms",
            F.sum("bucket_tokens").over(w).alias("cum_tokens"),
            F.sum("new_terms").over(w).alias("cum_vocab"),
        )
        .select(
            "bucket",
            "n_docs",
            "bucket_tokens",
            "new_terms",
            "cum_tokens",
            "cum_vocab",
            F.expr(
                "CASE WHEN cum_tokens > 0 THEN"
                " round(CAST(cum_vocab AS DOUBLE) / CAST(cum_tokens AS DOUBLE), 9)"
                " END"
            ).alias("ttr"),
        )
        .orderBy("bucket")
    )


def zipf_fit(documents: DataFrame, top_n: int = 100) -> DataFrame:
    """Zipf's-law fit per source: least-squares slope of ln(frequency)
    against ln(rank) over the source's `top_n` terms — natural text
    sits near slope −1; templated/generated text (the thing a corpus
    audit wants flagged) bends away from it. Completes the corpus
    statistical-law pair with `vocab_growth` (Heaps).

    Determinism: ln is evaluated once per term and rounded to 9 dp
    (the repo's one-transcendental rule); x, y and their 9-dp-rounded
    products accumulate as DECIMAL — order-independent under any
    partitioning — and the final combine is the SHARED
    `analytics.TREND_FINAL_SQL` expression, so this fit literally
    cannot drift from the trend panel's arithmetic. Rank ties break
    (count desc, term asc) — deterministic in both engines.

    Scale shape: one tokenize pass reduces to the (source, term)
    count relation; the top-n rank is a per-source window over that
    relation (WindowGroupLimit prunes to top_n map-side); the fit
    consumes ≤ #sources × top_n rows. The corpus is never shuffled
    row-wise."""
    from .analytics import TREND_FINAL_SQL

    if top_n < 3:
        raise ValueError("zipf_fit: top_n must be ≥ 3")
    tf = (
        _spread(documents, "doc_id", cap=4 * documents.rdd.getNumPartitions())
        .select("source", F.explode(_tokens(F.col("text"))).alias("term"))
        .groupBy("source", "term")
        .agg(F.count("*").alias("n_term"))
    )
    w = Window.partitionBy("source").orderBy(F.desc("n_term"), F.asc("term"))
    ranked = (
        tf.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= top_n)
        .select(
            "source",
            F.expr("round(ln(CAST(rnk AS DOUBLE)), 9)").alias("x"),
            F.expr("round(ln(CAST(n_term AS DOUBLE)), 9)").alias("y"),
        )
    )
    dec = "CAST(round({e}, 9) AS DECIMAL(25,9))"
    sums = ranked.groupBy("source").agg(
        F.expr("CAST(count(*) AS BIGINT)").alias("n"),
        F.expr(f"CAST(SUM({dec.format(e='x')}) AS DOUBLE)").alias("sx"),
        F.expr(f"CAST(SUM({dec.format(e='y')}) AS DOUBLE)").alias("sy"),
        F.expr(f"CAST(SUM({dec.format(e='x * x')}) AS DOUBLE)").alias("sxx"),
        F.expr(f"CAST(SUM({dec.format(e='x * y')}) AS DOUBLE)").alias("sxy"),
        F.expr(f"CAST(SUM({dec.format(e='y * y')}) AS DOUBLE)").alias("syy"),
    )
    return sums.select(
        "source",
        F.col("n").alias("n_terms"),
        F.expr(TREND_FINAL_SQL["slope_per_hour"]).alias("zipf_slope"),
        F.expr(TREND_FINAL_SQL["r2"]).alias("r2"),
    ).orderBy("source")


# Gopher (MassiveText) rule constants — the published operating
# points; integer cross-multiplied forms below keep every rule exact
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_LEN = 3       # 3 ≤ mean word length ≤ 10
GOPHER_MAX_MEAN_LEN = 10
GOPHER_SYMBOL_RATIO_10X = 1   # (# '#' + # '…') / words ≤ 0.1
GOPHER_ALPHA_RATIO_5X = 4     # ≥ 80% of words contain a letter
GOPHER_STOPWORDS = ["the", "a", "of", "and", "to", "in", "that", "with"]
GOPHER_MIN_STOPWORDS = 2


def gopher_rule_filter(documents: DataFrame) -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021,
    MassiveText §A1.1) as an auditable keep/drop panel — the
    statistics-based complement of `c4_rule_filter`'s phrase rules:
    C4 looks for KNOWN bad content, Gopher for DEGENERATE SHAPE
    (too short/long, symbol soup, non-linguistic token mix).

    Every ratio rule is an integer cross-multiplication, so the panel
    is EXACT end-to-end — no double compares anywhere:

    - ``word_count_ok``: 50 ≤ words ≤ 100 000;
    - ``mean_word_len_ok``: 3·n ≤ Σ len(token) ≤ 10·n;
    - ``symbol_ratio_ok``: 10·(#'#' + #'...') ≤ n;
    - ``alpha_ratio_ok``: 5·(words with ≥ 1 letter) ≥ 4·n;
    - ``has_stopwords``: ≥ 2 distinct tokens from the fixed 8-word
      stopword list (membership sum, not list-intersect, so both
      engines count identically).

    The reported mean_word_len is the one display double (round(9),
    NULL for empty docs) — rules never read it.

    Scale shape: single-scan vectorized projection (tokenize once,
    array folds) + final sort; a pure map stage at 100 TB, exactly
    like `c4_rule_filter`."""
    toks = _tokens(F.col("text"))
    n_words = F.size(toks)
    total_chars = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    n_hash = F.length("text") - F.length(F.expr("replace(text, '#', '')"))
    n_ellipsis = (
        F.length("text") - F.length(F.expr("replace(text, '...', '')"))
    ) / F.lit(3)
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike("[a-zA-Z]")))
    n_stop = None
    for sw in GOPHER_STOPWORDS:
        term = F.when(F.array_contains(toks, sw), 1).otherwise(0)
        n_stop = term if n_stop is None else (n_stop + term)
    stats = _spread(documents, "doc_id", cap=4 * documents.rdd.getNumPartitions()).select(
        "doc_id",
        n_words.cast("int").alias("n_words"),
        total_chars.alias("total_chars"),
        (n_hash + n_ellipsis.cast("long")).alias("n_symbols"),
        n_alpha.alias("n_alpha"),
        n_stop.alias("n_stop"),
    )
    rules = {
        "word_count_ok": (F.col("n_words") >= GOPHER_MIN_WORDS)
        & (F.col("n_words") <= GOPHER_MAX_WORDS),
        "mean_word_len_ok": (
            F.col("total_chars") >= GOPHER_MIN_MEAN_LEN * F.col("n_words")
        )
        & (F.col("total_chars") <= GOPHER_MAX_MEAN_LEN * F.col("n_words"))
        & (F.col("n_words") > 0),
        "symbol_ratio_ok": F.lit(10) * F.col("n_symbols")
        <= F.col("n_words"),
        "alpha_ratio_ok": F.lit(5) * F.col("n_alpha")
        >= F.lit(4) * F.col("n_words"),
        "has_stopwords": F.col("n_stop") >= GOPHER_MIN_STOPWORDS,
    }
    keep = None
    for expr in rules.values():
        keep = expr if keep is None else (keep & expr)
    return (
        stats.select(
            "doc_id",
            "n_words",
            F.expr(
                "round(CASE WHEN n_words > 0 THEN"
                " CAST(total_chars AS DOUBLE) / CAST(n_words AS DOUBLE)"
                " END, 9)"
            ).alias("mean_word_len"),
            *[expr.alias(name) for name, expr in rules.items()],
            keep.alias("keep"),
        )
        .orderBy("doc_id")
    )


def oov_rate(documents: DataFrame, vocab_size: int = 16) -> DataFrame:
    """Per-source out-of-vocabulary rate against the corpus' own
    top-`vocab_size` token vocabulary — the tokenizer-fit audit a
    training pipeline runs before committing to a vocab: a source
    whose tokens fall outside the head vocabulary will fragment into
    subwords (cost) or unknowns (quality loss). Complements
    `source_kl_divergence` (distribution distance) with the blunt
    operational number ("12% of src7's tokens aren't in the top-V").

    The vocabulary is deterministic: top `vocab_size` terms by
    (corpus count DESC, term ASC) — the same total-order tiebreak
    every ranked entry uses. OOV mass and token totals are exact
    integer sums; the rate is one pinned round(9) division.

    Scale shape: ONE tokenize+explode pass reduced to the (source,
    term, count) relation (materialized — it feeds the vocabulary,
    the totals, and the OOV sum); the vocabulary relation is
    vocab_size rows and broadcasts into a left anti join; final
    aggregate is #sources rows."""
    tok_arr = F.filter(F.split("text", r"\s+"), lambda x: x != "")
    tf = _materialize(
        _spread(documents, "doc_id", cap=4 * documents.rdd.getNumPartitions())
        .select("source", F.explode(tok_arr).alias("term"))
        .groupBy("source", "term")
        .agg(F.count("*").alias("c_st"))
    )
    term_tot = tf.groupBy("term").agg(F.sum("c_st").alias("c_t"))
    # top-V via orderBy+limit → TakeOrderedAndProject (map-side heaps,
    # no single-partition global window over the vocabulary relation)
    vocab = (
        term_tot.orderBy(F.col("c_t").desc(), F.col("term"))
        .limit(int(vocab_size))
        .select("term")
    )
    oov = tf.join(F.broadcast(vocab), "term", "left_anti")
    per_src = tf.groupBy("source").agg(
        F.sum("c_st").alias("n_tokens"),
        F.count("*").alias("n_terms"),
    )
    per_oov = oov.groupBy("source").agg(
        F.sum("c_st").alias("n_oov"),
        F.count("*").alias("n_oov_terms"),
    )
    return (
        per_src.join(per_oov, "source", "left")
        .select(
            "source",
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            F.col("n_terms").cast("bigint").alias("n_terms"),
            F.coalesce("n_oov", F.lit(0)).cast("bigint").alias("n_oov"),
            F.coalesce("n_oov_terms", F.lit(0))
            .cast("bigint")
            .alias("n_oov_terms"),
            F.expr(
                "round(CAST(coalesce(n_oov, 0) AS DOUBLE)"
                " / CAST(n_tokens AS DOUBLE), 9)"
            ).alias("oov_rate"),
        )
        .orderBy("source")
    )


def gopher_repetition(documents: DataFrame) -> DataFrame:
    """Gopher repetition signals (Rae et al. 2021, MassiveText §A1.1):
    per document and n ∈ {2, 3, 4}, the character mass of the TOP
    (most frequent) n-gram and of ALL DUPLICATED n-grams — the two
    ratio families the Gopher repetition rules threshold. Completes
    the `gopher_rule_filter` panel (shape rules) with its repetition
    half; distinct from `repetition_score` (bigram count share, not
    character mass).

    Pinned definitions (both engines compute them identically):
    tokens are whitespace words; an n-gram's char length is
    `length(gram)` with grams joined by single spaces; `total_chars`
    is the length of the whole token stream joined by single spaces —
    so every ratio is a pure integer/integer division.
    ``top_cnt`` = max occurrence count; ``top_mass`` = cnt·len of the
    most frequent gram, count ties broken toward the LARGER mass (a
    deterministic total order — equal count and equal mass make the
    choice irrelevant); ``dup_mass`` = Σ cnt·len over grams with
    cnt ≥ 2. A document emits a row for n only if it has ≥ n tokens.

    Scale shape: ONE tokenize pass; all three n-gram families come
    from chained O(tokens) zip_with shifts (never slice-per-position,
    the `regexp_extract_all` shingle lesson) into a single explode ~3×
    the token stream; one (doc, n, gram) count; the top/dup reduction
    runs a max-window over the ALREADY-REDUCED per-gram relation and
    one final (doc, n) aggregate. No all-pairs step, no feed-scale
    window."""
    toks = _tokens(F.col("text"))
    base = _spread(documents, "doc_id", cap=4 * documents.rdd.getNumPartitions()).select(
        "doc_id",
        F.length(F.array_join(toks, " ")).cast("bigint").alias("total_chars"),
        toks.alias("toks"),
    )
    big = 1 << 30
    g2 = F.zip_with(
        F.col("toks"),
        F.slice(F.col("toks"), 2, big),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    g3 = F.zip_with(
        g2, F.slice(F.col("toks"), 3, big), lambda a, b: F.concat(a, F.lit(" "), b)
    )
    g4 = F.zip_with(
        g3, F.slice(F.col("toks"), 4, big), lambda a, b: F.concat(a, F.lit(" "), b)
    )

    def _tagged(garr, n):
        return F.transform(
            F.filter(garr, lambda x: x.isNotNull()),
            lambda g: F.struct(F.lit(n).cast("int").alias("n"), g.alias("gram")),
        )

    grams = F.concat(_tagged(g2, 2), _tagged(g3, 3), _tagged(g4, 4))
    # explode argument precomputed in its own projection (the
    # _token_counts ExtractGenerator rule). explode_OUTER + an explicit
    # null filter, not plain explode (r13, guide §4.4's duplication
    # trap in JVM form): a non-outer explode makes the optimizer infer
    # `size(grams) > 0` and push it below the spread exchange, where it
    # re-evaluates the ENTIRE tokenize + 3×zip_with gram construction
    # per document a second time — at scan parallelism, before the
    # spread — just to decide emptiness (plan showed the full gram
    # expression duplicated into the scan-side Filter; 18 zip_with
    # occurrences in plans/r13/gopher_repetition_before.txt vs 6 in
    # the after snapshot). explode_outer
    # infers no such filter; the post-explode isnotnull(s) drops
    # exactly the empty-array rows explode would have skipped (the
    # gram structs themselves are never null — _tagged builds them
    # with struct() over null-filtered grams). Measured 1.67 → 0.79 s
    # at sf0.1 (min of 5 interleaved), identical rows (exceptAll 0/0).
    ex = (
        base.select("doc_id", "total_chars", grams.alias("grams"))
        .select("doc_id", "total_chars", F.explode_outer("grams").alias("s"))
        .filter(F.col("s").isNotNull())
    )
    per_gram = (
        ex.select(
            "doc_id", "total_chars", F.col("s.n").alias("n"), F.col("s.gram").alias("gram")
        )
        .groupBy("doc_id", "total_chars", "n", "gram")
        .agg(F.count("*").alias("cnt"))
        .select(
            "doc_id",
            "total_chars",
            "n",
            "cnt",
            (F.col("cnt") * F.length("gram").cast("bigint")).alias("mass"),
        )
    )
    # top_cnt/top_mass via ONE lexicographic struct max — identical to
    # the former max-window + tie filter ("max cnt, count ties broken
    # toward the larger mass" IS the (cnt, mass) struct order), but as
    # a plain aggregate it combines partially within the stage: the
    # per-gram relation (~3× the token stream) collapses to #docs×3
    # rows in the partial aggregate instead of running a tie-filter
    # window over the full relation (guide §2.3 "aggregate before you
    # shuffle"). Plan accounting (r13 correction of the r12 comment,
    # VERDICT r12): the window removal did NOT drop an Exchange — the
    # old window already reused the spread's doc_id partitioning, so
    # the plan went Window 1 → 0 with Exchange 2 → 2, and the struct
    # max plans as a SortAggregate pair (struct agg buffers are not
    # hash-aggregable), so a partition-local Sort of the per-gram
    # relation remains. The r12 local delta was correspondingly
    # modest (2.43 → 2.38 s min-of-5, same window). Note the gram
    # count itself never shuffles: both the count and this rollup
    # reuse the spread's doc_id hash partitioning, so only narrow doc
    # rows (spread) and the final #docs×3 rows (presentation sort)
    # ever cross an exchange — at any corpus scale.
    return (
        per_gram.groupBy("doc_id", "n", "total_chars")
        .agg(
            F.max(F.struct(F.col("cnt"), F.col("mass"))).alias("_top"),
            F.coalesce(
                F.sum(F.when(F.col("cnt") >= 2, F.col("mass"))), F.lit(0)
            )
            .cast("bigint")
            .alias("dup_mass"),
        )
        .select(
            "doc_id",
            "n",
            "total_chars",
            F.col("_top.cnt").cast("bigint").alias("top_cnt"),
            F.col("_top.mass").cast("bigint").alias("top_mass"),
            "dup_mass",
            (F.col("top_mass").cast("double") / F.col("total_chars").cast("double")).alias(
                "top_frac"
            ),
            (F.col("dup_mass").cast("double") / F.col("total_chars").cast("double")).alias(
                "dup_frac"
            ),
        )
        .orderBy("doc_id", "n")
    )


def gopher_line_repetition(documents: DataFrame) -> DataFrame:
    """WITHIN-document line/paragraph repetition (the other half of
    Gopher's repetition rules): per document, the fraction of lines
    (split on '\\n') and paragraphs (split on '\\n\\n') that are exact
    repeats of an earlier one, by count and by character mass.
    Cross-document repetition is `line_dedup` / `paragraph_dedup`
    territory; this is the per-document degenerate-structure signal
    (chat logs, scraped tickers, copy-paste loops).

    Pinned definitions: a unit occurring c times contributes c−1
    duplicate occurrences and (c−1)·length(unit) duplicate chars;
    denominators are the unit count and Σ length(unit) (separator
    chars excluded — both engines agree by construction). Empty units
    (consecutive separators) count like any unit. Fractions are single
    integer/integer double divisions.

    Scale shape: two posexplode-free explodes (line and paragraph)
    each reduced immediately to per-(doc, unit) counts, then one
    (doc) aggregate per family joined on doc_id — bounded by document
    size, no windows, no joins wider than #docs."""

    def _family(unit_col, prefix):
        ex = _spread(documents, "doc_id", cap=4 * documents.rdd.getNumPartitions()).select(
            "doc_id", F.explode(F.split("text", unit_col)).alias("u")
        )
        per_u = ex.groupBy("doc_id", "u").agg(F.count("*").alias("c"))
        return per_u.groupBy("doc_id").agg(
            F.sum("c").cast("bigint").alias(f"{prefix}_units"),
            F.sum(F.col("c") * F.length("u").cast("bigint"))
            .cast("bigint")
            .alias(f"{prefix}_chars"),
            F.sum(F.col("c") - 1).cast("bigint").alias(f"{prefix}_dup_units"),
            F.sum((F.col("c") - 1) * F.length("u").cast("bigint"))
            .cast("bigint")
            .alias(f"{prefix}_dup_chars"),
        )
    lines = _family("\n", "line")
    paras = _family("\n\n", "para")
    return (
        lines.join(paras, "doc_id")
        .select(
            "doc_id",
            "line_units",
            "line_dup_units",
            "line_dup_chars",
            "para_units",
            "para_dup_units",
            "para_dup_chars",
            (F.col("line_dup_units").cast("double") / F.col("line_units").cast("double")).alias(
                "line_dup_frac"
            ),
            F.when(
                F.col("line_chars") > 0,
                F.col("line_dup_chars").cast("double") / F.col("line_chars").cast("double"),
            ).alias("line_dup_char_frac"),
            (F.col("para_dup_units").cast("double") / F.col("para_units").cast("double")).alias(
                "para_dup_frac"
            ),
            F.when(
                F.col("para_chars") > 0,
                F.col("para_dup_chars").cast("double") / F.col("para_chars").cast("double"),
            ).alias("para_dup_char_frac"),
        )
        .orderBy("doc_id")
    )


def tokenizer_fertility(documents: DataFrame, vocab_size: int = 64) -> DataFrame:
    """Tokenizer fertility / compression audit per source against the
    corpus' own top-``vocab_size`` vocabulary (the `tokenize_to_ids` /
    `oov_rate` vocabulary rule: count DESC, term ASC): models the
    byte-fallback tokenizer every modern stack ships — an in-vocab
    word costs ONE piece, an out-of-vocab word falls back to its
    ``length(term)`` byte pieces — and reports pieces/word (fertility)
    and bytes/piece (compression) per source. `oov_rate` gives the
    blunt OOV share; this prices it: a source can have modest OOV yet
    terrible fertility when its OOV words are long.

    All sums are exact integers (piece counts, UTF-8 byte totals via
    octet_length); the three ratios are single pinned round(9)
    divisions.

    Scale shape: the doc-level byte/char totals aggregate straight off
    the scan (no explode); the token side reuses the `oov_rate` shape
    — one tokenize+explode reduced to (source, term, count),
    vocabulary = TakeOrdered top-V broadcast into the piece-cost join;
    final relation is #sources rows."""
    doc_side = _spread(documents, "doc_id", cap=4 * documents.rdd.getNumPartitions()).groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.octet_length("text")).cast("bigint").alias("total_bytes"),
        F.sum(F.length("text")).cast("bigint").alias("total_chars"),
    )
    tok_arr = F.filter(F.split("text", r"\s+"), lambda x: x != "")
    tf = _materialize(
        _spread(documents, "doc_id", cap=4 * documents.rdd.getNumPartitions())
        .select("source", F.explode(tok_arr).alias("term"))
        .groupBy("source", "term")
        .agg(F.count("*").alias("c_st"))
    )
    term_tot = tf.groupBy("term").agg(F.sum("c_st").alias("c_t"))
    vocab = (
        term_tot.orderBy(F.col("c_t").desc(), F.col("term"))
        .limit(int(vocab_size))
        .select("term", F.lit(True).alias("in_vocab"))
    )
    pieces = (
        tf.join(F.broadcast(vocab), "term", "left")
        .groupBy("source")
        .agg(
            F.sum("c_st").cast("bigint").alias("n_tokens"),
            F.sum(F.when(F.col("in_vocab"), F.col("c_st")).otherwise(0))
            .cast("bigint")
            .alias("n_invocab"),
            F.sum(
                F.when(F.col("in_vocab"), F.col("c_st")).otherwise(
                    F.col("c_st") * F.length("term").cast("bigint")
                )
            )
            .cast("bigint")
            .alias("n_pieces"),
        )
    )
    return (
        doc_side.join(pieces, "source")
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "n_invocab",
            "n_pieces",
            "total_bytes",
            "total_chars",
            F.expr(
                "round(CAST(n_pieces AS DOUBLE) / CAST(n_tokens AS DOUBLE), 9)"
            ).alias("fertility"),
            F.expr(
                "round(CAST(total_bytes AS DOUBLE) / CAST(n_pieces AS DOUBLE), 9)"
            ).alias("bytes_per_piece"),
            F.expr(
                "round(CAST(total_bytes AS DOUBLE) / CAST(n_tokens AS DOUBLE), 9)"
            ).alias("bytes_per_token"),
        )
        .orderBy("source")
    )


def vocab_coverage_curve(documents: DataFrame, max_k: int = 1024) -> DataFrame:
    """Vocabulary coverage curve: for k = 1, 2, 4, …, ``max_k``, the
    fraction of all token OCCURRENCES covered by the top-k terms — the
    tokenizer-sizing report (`oov_rate` prices ONE operating point;
    this sweeps the whole head so the vocab-size knee is visible).
    Rows exist for powers of two ≤ the corpus' distinct-term count;
    ``term_at_k`` is the k-th term itself under the house total order
    (count DESC, term ASC).

    Exactness: cumulative sums of exact integer counts; coverage is
    the single final double division.

    Scale shape: one tokenize+explode reduced to (term, count); top-k
    via orderBy+limit (TakeOrderedAndProject — map-side heaps, never
    a global window over the distinct-term relation); the
    rank/cumsum window runs over ≤ max_k rows; the one-row total
    broadcasts into the final projection."""
    tok_arr = F.filter(F.split("text", r"\s+"), lambda x: x != "")
    term_tot = _materialize(
        _spread(documents, "doc_id", cap=4 * documents.rdd.getNumPartitions())
        .select(F.explode(tok_arr).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("c_t"))
    )
    total = term_tot.agg(F.sum("c_t").cast("bigint").alias("total_occ"))
    order = [F.col("c_t").desc(), F.col("term").asc()]
    top = term_tot.orderBy(*order).limit(int(max_k))
    w_rank = Window.orderBy(*order)
    w_cum = w_rank.rowsBetween(Window.unboundedPreceding, 0)
    ks = [k for k in (1 << i for i in range(31)) if k <= max_k]
    return (
        top.withColumn("k", F.row_number().over(w_rank).cast("int"))
        .withColumn("covered_occ", F.sum("c_t").over(w_cum).cast("bigint"))
        .filter(F.col("k").isin(ks))
        .crossJoin(F.broadcast(total))
        .select(
            "k",
            F.col("term").alias("term_at_k"),
            "covered_occ",
            "total_occ",
            (
                F.col("covered_occ").cast("double")
                / F.col("total_occ").cast("double")
            ).alias("coverage"),
        )
        .orderBy("k")
    )


def char_entropy(documents: DataFrame) -> DataFrame:
    """Per-document character-level Shannon entropy (nats) — the
    lowest-level degenerate-content detector: natural prose sits
    around 3–4.2 nats, base64/hex blobs higher, repeated-character
    and template junk far lower. Complements the token-level quality
    panels (`quality_score`, `gopher_rule_filter`), which a single-
    token pathological blob can slip past.

    H = ln(n) − (Σ c·ln c)/n over per-character counts c. EVERY
    transcendental is pinned at its call site (the mannwhitney_u
    rule): the per-character c·ln c term is round(9) before its exact
    DECIMAL(28,9) accumulation, and ln(n_chars) is round(9) in its own
    step BEFORE the final composition — the closing expression then
    contains only correctly-rounded ops (−, /) over pinned values, so
    it is bit-deterministic cross-engine, not probabilistically safe.

    Scale shape: one character explode ((?s). — the
    `char_trigram_langid` cost, ~chars rows) reduced immediately to
    (doc, char) counts — state bounded by alphabet × docs — then one
    doc-keyed aggregate. No windows, no joins."""
    ex = _spread(documents, "doc_id", cap=4 * documents.rdd.getNumPartitions()).select(
        "doc_id",
        F.expr("regexp_extract_all(text, '(?s).', 0)").alias("chars"),
    ).select("doc_id", F.explode("chars").alias("ch"))
    per_char = ex.groupBy("doc_id", "ch").agg(F.count("*").alias("c"))
    return (
        per_char.groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_chars"),
            F.count("*").cast("bigint").alias("n_distinct"),
            F.sum(
                F.expr(
                    "CAST(round(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)), 9)"
                    " AS DECIMAL(28,9))"
                )
            ).alias("s_clnc"),
        )
        .select(
            "doc_id",
            "n_chars",
            "n_distinct",
            # decimal accumulator, DOUBLE at the hashed edge (the
            # welch/psi pattern — DecimalType at the edge was the
            # round-7 driver-hash failure class)
            F.col("s_clnc").cast("double").alias("s_clnc"),
            F.expr(
                "round(round(ln(CAST(n_chars AS DOUBLE)), 9)"
                " - CAST(s_clnc AS DOUBLE) / CAST(n_chars AS DOUBLE), 9)"
            ).alias("entropy_nats"),
        )
        .orderBy("doc_id")
    )


def lang_mismatch_audit(documents: DataFrame) -> DataFrame:
    """Metadata-vs-content agreement audit: per (source, declared
    lang), how often the content-based `lang_id` guess agrees with the
    crawler's `lang` metadata — the standard curation check before
    trusting declared language for mixing/filtering (mislabeled
    ingests and template-English pages show up as low agreement
    pockets). 'unknown' guesses (no stopword hits, or languages the
    tiny heuristic doesn't model) are reported separately from hard
    disagreements.

    Pure composition: `lang_id` (one tokenize scan) reduced to a
    (source, lang) keyed aggregate of exact integer counts + single
    double divisions; output #sources × #langs rows."""
    ided = lang_id(documents).select("doc_id", "lang", "lang_guess")
    src = documents.select("doc_id", "source")
    return (
        ided.join(src, "doc_id")
        .groupBy("source", "lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("lang_guess") == F.col("lang"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_match"),
            F.sum(F.when(F.col("lang_guess") == "unknown", 1).otherwise(0))
            .cast("bigint")
            .alias("n_unknown"),
        )
        .select(
            "source",
            "lang",
            "n_docs",
            "n_match",
            "n_unknown",
            (F.col("n_docs") - F.col("n_match") - F.col("n_unknown")).alias(
                "n_conflict"
            ),
            (F.col("n_match").cast("double") / F.col("n_docs").cast("double")).alias(
                "match_rate"
            ),
        )
        .orderBy("source", "lang")
    )


def distinct_ngram_ratio(documents: DataFrame) -> DataFrame:
    """Corpus diversity panel: per source and n ∈ {1, 2, 3}, the
    distinct-n ratio (distinct n-grams / total n-grams) — the standard
    corpus-level diversity statistic (distinct-1/2 of Li et al. 2016):
    templated or machine-generated sources collapse toward 0 while
    diverse prose stays high, so the panel ranks sources for mix
    re-weighting before any model sees them. Complements
    `gopher_repetition` (per-document repetition mass) with the
    cross-document view — a source of UNIQUE documents that all share
    phrasing looks clean per-doc and collapses here.

    Scale shape: ONE tokenize pass; 2/3-grams from chained O(tokens)
    zip_with shifts (never slice-per-position); one (source, n, gram)
    count with map-side partials, then a (source, n) reduction of
    exact integers — total = Σ cnt, distinct = row count. Ratio is a
    single double division of exact integers. Output 3×#sources rows;
    no windows, no joins."""
    toks = _tokens(F.col("text"))
    base = _spread(documents, "doc_id", cap=4 * documents.rdd.getNumPartitions()).select("source", toks.alias("toks"))
    big = 1 << 30
    g2 = F.zip_with(
        F.col("toks"),
        F.slice(F.col("toks"), 2, big),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    g3 = F.zip_with(
        g2, F.slice(F.col("toks"), 3, big), lambda a, b: F.concat(a, F.lit(" "), b)
    )

    def _tagged(garr, n):
        return F.transform(
            F.filter(garr, lambda x: x.isNotNull()),
            lambda g: F.struct(F.lit(n).cast("int").alias("n"), g.alias("gram")),
        )

    grams = F.concat(_tagged(F.col("toks"), 1), _tagged(g2, 2), _tagged(g3, 3))
    ex = base.select("source", grams.alias("grams")).select(
        "source", F.explode("grams").alias("s")
    )
    per_gram = (
        ex.select("source", F.col("s.n").alias("n"), F.col("s.gram").alias("gram"))
        .groupBy("source", "n", "gram")
        .agg(F.count("*").alias("cnt"))
    )
    return (
        per_gram.groupBy("source", "n")
        .agg(
            F.sum("cnt").cast("bigint").alias("total_ngrams"),
            F.count("*").cast("bigint").alias("distinct_ngrams"),
        )
        .select(
            "source",
            "n",
            "total_ngrams",
            "distinct_ngrams",
            (
                F.col("distinct_ngrams").cast("double")
                / F.col("total_ngrams").cast("double")
            ).alias("distinct_ratio"),
        )
        .orderBy("source", "n")
    )


def pii_density_by_source(documents: DataFrame) -> DataFrame:
    """Per-source PII exposure report: document counts, per-category
    hit totals (the `PII_PATTERNS` classes `pii_redact` scrubs), the
    fraction of documents carrying ANY hit, and hits per 10k
    characters — the triage table that decides which ingest gets the
    expensive locale-specific PII pass and which source is dropped
    outright (a source where half the pages carry e-mail addresses is
    a forum dump, not prose).

    Scale shape: the per-document counts ride ONE map-side projection
    (the `pii_redact` scan without paying for the redacted text);
    everything else is a single (source) keyed aggregate of exact
    integers with map-side partials. Densities are single double
    divisions of exact integers at the #sources-row edge."""
    counts = [
        F.size(F.regexp_extract_all(F.col("text"), F.lit(pat), 0)).alias(f"n_{name}s")
        for name, pat, _ in PII_PATTERNS
    ]
    per_doc = _spread(documents, "doc_id", cap=4 * documents.rdd.getNumPartitions()).select(
        "source", F.length("text").cast("bigint").alias("chars"), *counts
    )
    hit_cols = [f"n_{name}s" for name, _, _ in PII_PATTERNS]
    any_hit = sum(F.col(c) for c in hit_cols) > 0
    agg = per_doc.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("chars").cast("bigint").alias("n_chars"),
        *[F.sum(c).cast("bigint").alias(c) for c in hit_cols],
        F.sum(F.when(any_hit, 1).otherwise(0)).cast("bigint").alias("n_docs_with_pii"),
    )
    total_hits = sum(F.col(c) for c in hit_cols)
    return (
        agg.select(
            "source",
            "n_docs",
            "n_chars",
            *hit_cols,
            "n_docs_with_pii",
            (
                F.col("n_docs_with_pii").cast("double")
                / F.col("n_docs").cast("double")
            ).alias("doc_pii_rate"),
            F.round(
                total_hits.cast("double") * F.lit(10000.0)
                / F.col("n_chars").cast("double"),
                9,
            ).alias("hits_per_10k_chars"),
        )
        .orderBy("source")
    )


def template_prefix_groups(
    documents: DataFrame, prefix_chars: int = 40, min_docs: int = 3
) -> DataFrame:
    """Templated-page detector: groups of ≥ ``min_docs`` documents
    within one source sharing the same first-``prefix_chars``
    normalized characters — the common CMS/template signature
    (identical headers, navigation dumps, generated-page openings).
    `curation.split_leakage` uses the same prefix fingerprint to
    catch CROSS-SPLIT pairs; this is the within-source census that
    decides whether a source needs a template-stripping pass at all.
    The prefix itself is emitted (not just its hash) so the report is
    actionable by a human.

    One normalize projection + one (source, prefix) count with
    map-side partials + a HAVING filter; output rows bounded by the
    number of real templates."""
    norm = F.lower(F.trim(F.regexp_replace("text", r"\s+", " ")))
    return (
        _spread(documents, "doc_id", cap=4 * documents.rdd.getNumPartitions())
        .select(
            "doc_id",
            "source",
            F.substring(norm, 1, prefix_chars).alias("prefix"),
            F.length("text").cast("bigint").alias("chars"),
        )
        .groupBy("source", "prefix")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.min("doc_id").alias("example_doc_id"),
            F.sum("chars").cast("bigint").alias("total_chars"),
        )
        .filter(F.col("n_docs") >= min_docs)
        .orderBy("source", "prefix")
    )


# shared bad-character class: C0 controls minus \t\n\r, plus the
# U+FFFD replacement character (the mojibake tell). ONE pattern text —
# \x{...} escapes parse identically in Java regex and RE2, so the
# Spark operator and the DuckDB oracle share it verbatim.
ENCODING_BAD_CLASS = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x{FFFD}]"


def encoding_audit(documents: DataFrame) -> DataFrame:
    """Encoding-health panel per source: how much of the ingest is
    mojibake or binary-contaminated — replacement characters (U+FFFD,
    the decoder's "I gave up" marker) and stray C0 control characters
    (minus tab/newline/CR) per document, rolled up per source. The
    standard first gate of a crawl-ingest pipeline: a source whose
    docs are full of U+FFFD was decoded with the wrong charset, and
    control characters signal binary blobs mislabeled as text; both
    poison tokenizers downstream.

    Exactness: pure integer counts from one regexp pass over each
    document (`ENCODING_BAD_CLASS` shared verbatim with the oracle)
    plus one final double division for the char-level rate.

    Scale shape: map-side projection (one regexp scan per doc, ~chars
    cost), one keyed aggregate to ≤ #sources rows. No joins, no
    windows.

    Factored into `encoding_doc_stats` (per-doc classify) →
    `encoding_source_counts` (keyed integer counters — the exact
    complete-mode state `streaming.rollup.stream_encoding_audit`
    maintains) → `encoding_panel_from_source_counts` (the rate coda),
    so the streaming twin runs the identical code and shares the
    oracle verbatim."""
    return encoding_panel_from_source_counts(
        encoding_source_counts(encoding_doc_stats(_spread(documents, "doc_id", cap=4 * documents.rdd.getNumPartitions())))
    )


def encoding_doc_stats(documents: DataFrame) -> DataFrame:
    """Per-doc encoding classify (stateless projection — safe on both
    batch and streaming frames): total chars + bad-char count from one
    `ENCODING_BAD_CLASS` regexp pass."""
    return documents.select(
        "source",
        F.length("text").alias("n_chars_t"),
        F.size(
            F.regexp_extract_all(F.col("text"), F.lit(ENCODING_BAD_CLASS), 0)
        ).alias("n_bad"),
    )


def encoding_source_counts(per: DataFrame) -> DataFrame:
    """The ≤ #sources × 4-integer-counter aggregation — map-side
    combinable in batch, bounded forever as streaming state."""
    return per.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("n_bad") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_bad_docs"),
        F.sum("n_chars_t").cast("bigint").alias("total_chars"),
        F.sum("n_bad").cast("bigint").alias("n_bad_chars"),
    )


def encoding_panel_from_source_counts(counts: DataFrame) -> DataFrame:
    """Final panel: the integer counters plus the one double division."""
    return counts.select(
        "source",
        "n_docs",
        "n_bad_docs",
        "total_chars",
        "n_bad_chars",
        (
            F.col("n_bad_chars").cast("double")
            / F.col("total_chars").cast("double")
        ).alias("bad_char_rate"),
    ).orderBy("source")


def intra_doc_line_dedup(documents: DataFrame) -> DataFrame:
    """WITHIN-document line dedup: keep each document's first
    occurrence of every distinct line, in order — the intra-doc rung
    of the line-dedup ladder (`boilerplate_lines` finds corpus-wide
    hot lines; this removes the repeated nav blocks / footers / retry
    spam INSIDE one page, the RefinedWeb-style trim that runs before
    any corpus-level pass).

    Shuffle-free by design: lines are materialized once as an array
    column, and the keep-first filter is an indexed higher-order
    lambda (element i survives iff no earlier element equals it) —
    O(lines²) comparisons per document over the bounded per-doc line
    count, zero exchanges, which beats an explode + per-(doc, line)
    window shuffle at any corpus size. The array must be a BARE column
    reference inside the lambda (the `_word_shingles` re-evaluation
    trap).

    Returns (doc_id, n_lines, n_kept, text_clean) — `text_clean`
    rejoins the survivors with newlines."""
    lined = _spread(documents, "doc_id", cap=4 * documents.rdd.getNumPartitions()).select(
        "doc_id", F.split("text", "\n").alias("lines")
    )
    kept = F.filter(
        F.col("lines"),
        lambda x, i: ~F.array_contains(F.slice(F.col("lines"), 1, i), x),
    )
    return (
        lined.select(
            "doc_id",
            F.size("lines").cast("bigint").alias("n_lines"),
            F.size(kept).cast("bigint").alias("n_kept"),
            F.array_join(kept, "\n").alias("text_clean"),
        )
        .orderBy("doc_id")
    )


def vocab_overlap_matrix(documents: DataFrame) -> DataFrame:
    """Pairwise vocabulary overlap between sources: for every source
    pair (a < b), the Jaccard similarity and overlap coefficient of
    their distinct-token sets — the corpus-composition diagnostic that
    tells a mixture designer which sources are near-interchangeable
    (high overlap → diminishing returns from adding both) and which
    contribute genuinely new vocabulary. The set-level sibling of
    `source_kl_divergence` (which compares token FREQUENCIES; this
    compares token SUPPORTS) using the `tokenizer_fertility`
    whitespace tokenization verbatim.

    Exactness: set sizes and intersections are exact integer counts;
    jaccard = |∩| / (|A| + |B| − |∩|) and overlap = |∩| / min(|A|,|B|)
    are single correctly-rounded double divisions over those integers.

    Scale shape: one tokenize+explode reduced immediately to the
    DISTINCT (source, term) relation (≈ Σ per-source vocabularies —
    Heaps-sublinear in corpus size), materialized once (it feeds both
    the size aggregate and the pair join — the diamond rule). The
    self-equi-join on `term` fans out ≤ #sources rows per term, so
    worst-case join output is vocab × #sources² — never doc-scale.
    Per-source sizes broadcast into the final #pairs-row select.
    Source pairs sharing zero tokens are absent (inner join) — both
    engines agree by construction."""
    tok_arr = F.filter(F.split("text", r"\s+"), lambda x: x != "")
    st = _materialize(
        _spread(documents, "doc_id", cap=4 * documents.rdd.getNumPartitions())
        .select("source", F.explode(tok_arr).alias("term"))
        .distinct()
    )
    sizes = st.groupBy("source").agg(F.count("*").cast("bigint").alias("v"))
    inter = (
        st.alias("a")
        .join(st.alias("b"), "term")
        .filter(F.col("a.source") < F.col("b.source"))
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count("*").cast("bigint").alias("n_common"))
    )
    size_a = sizes.select(
        F.col("source").alias("source_a"), F.col("v").alias("vocab_a")
    )
    size_b = sizes.select(
        F.col("source").alias("source_b"), F.col("v").alias("vocab_b")
    )
    return (
        inter.join(F.broadcast(size_a), "source_a")
        .join(F.broadcast(size_b), "source_b")
        .select(
            "source_a",
            "source_b",
            "vocab_a",
            "vocab_b",
            "n_common",
            (
                F.col("n_common").cast("double")
                / (
                    F.col("vocab_a") + F.col("vocab_b") - F.col("n_common")
                ).cast("double")
            ).alias("jaccard"),
            (
                F.col("n_common").cast("double")
                / F.least("vocab_a", "vocab_b").cast("double")
            ).alias("overlap_coef"),
        )
        .orderBy("source_a", "source_b")
    )


def vocab_richness(documents: DataFrame) -> DataFrame:
    """Per-source lexical-richness panel: token/type counts, hapax
    legomena, type-token ratio, Yule's K and Simpson's D — the
    classical vocabulary-concentration statistics that separate
    natural prose (K ≈ 60–200) from templated/generated text (few
    types repeated → K explodes) and from keyword-stuffed spam
    (anomalously flat → K collapses). Completes the statistical-law
    trio with `zipf_fit` (rank-frequency slope) and `vocab_growth`
    (Heaps exponent): Zipf/Heaps fit a CURVE, K and D are closed-form
    moments of the same frequency spectrum — cheaper, and exact.

        K = 10⁴ · (Σm² − N) / N²      (m = each type's frequency)
        D = (Σm² − N) / (N·(N−1))     (collision probability)

    Exactness: all spectrum moments are integer sums — Σm² in
    DECIMAL(38,0) (a 10¹⁰-count hot token squares to 10²⁰, past
    BIGINT) — and the edge is three fixed-shape double divisions
    (never DecimalType). Scale shape: one tokenize pass reduces the
    corpus to the (source, term) count relation — the `zipf_fit`
    exchange, map-side combinable — then a #sources-row aggregate.
    Nothing quadratic, no windows over the feed."""
    tf = (
        _spread(documents, "doc_id", cap=4 * documents.rdd.getNumPartitions())
        .select("source", F.explode(_tokens(F.col("text"))).alias("term"))
        .groupBy("source", "term")
        .agg(F.count("*").alias("n_term"))
    )
    per = tf.groupBy("source").agg(
        F.sum("n_term").cast("bigint").alias("n_tokens"),
        F.count("*").cast("bigint").alias("n_types"),
        F.sum(F.when(F.col("n_term") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_hapax"),
        F.sum(
            F.expr("CAST(n_term AS DECIMAL(38,0)) * CAST(n_term AS DECIMAL(38,0))")
        ).alias("m2"),
    )
    return (
        per.filter(F.col("n_tokens") >= 1)
        .select(
            "source",
            "n_tokens",
            "n_types",
            "n_hapax",
            F.expr(
                "CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE)"
            ).alias("ttr"),
            F.expr(
                "CAST(n_hapax AS DOUBLE) / CAST(n_types AS DOUBLE)"
            ).alias("hapax_ratio"),
            F.expr(
                "10000.0 * CAST(m2 - CAST(n_tokens AS DECIMAL(38,0)) AS DOUBLE)"
                " / (CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE))"
            ).alias("yule_k"),
            F.expr(
                "CASE WHEN n_tokens >= 2 THEN"
                " CAST(m2 - CAST(n_tokens AS DECIMAL(38,0)) AS DOUBLE)"
                " / (CAST(n_tokens AS DOUBLE) * CAST(n_tokens - 1 AS DOUBLE))"
                " END"
            ).alias("simpson_d"),
        )
        .orderBy("source")
    )
