"""Behavior tests for the round-7 operators: Gopher repetition
signals (n-gram and line/paragraph), tokenizer fertility, transitive
incremental near-dedup, exact stratified sampling, boilerplate-line
panels — planted fixtures with hand-computable truth."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from real_time_database_monitoring_system_spark.operators import (
    curation,
    dedup,
    pipeline,
    text as text_ops,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _docs_src(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_gopher_repetition_closed_form(spark):
    """'a b a b c': bigrams {a b:2, b a:1, b c:1} → top 'a b' cnt 2
    mass 2·3=6; dup_mass 6; total_chars 9. Trigrams all unique →
    dup 0, top_cnt 1, ties on cnt=1 resolve to max mass: 'b a b' has
    len 5 like the others → top_mass 5. 4-grams: two, each len 7."""
    out = text_ops.gopher_repetition(_docs(spark, [(1, "a b a b c")])).collect()
    by_n = {r.n: r for r in out}
    assert sorted(by_n) == [2, 3, 4]
    r2 = by_n[2]
    assert (r2.total_chars, r2.top_cnt, r2.top_mass, r2.dup_mass) == (9, 2, 6, 6)
    assert r2.top_frac == 6 / 9 and r2.dup_frac == 6 / 9
    r3 = by_n[3]
    assert (r3.top_cnt, r3.top_mass, r3.dup_mass) == (1, 5, 0)
    r4 = by_n[4]
    assert (r4.top_cnt, r4.top_mass, r4.dup_mass) == (1, 7, 0)


def test_gopher_repetition_short_docs_emit_only_valid_n(spark):
    """A 2-token doc emits only the n=2 row; a 1-token doc emits
    nothing (no n-grams exist)."""
    out = text_ops.gopher_repetition(
        _docs(spark, [(1, "x y"), (2, "solo")])
    ).collect()
    assert [(r.doc_id, r.n) for r in out] == [(1, 2)]


def test_gopher_line_repetition_closed_form(spark):
    """'x\\nx\\ny\\n\\nx\\nx\\ny': lines = [x,x,y,'',x,x,y] → 7 units,
    dups: x occurs 4× (+3), y 2× (+1) → 4 dup units, dup chars 3+1=4
    over 6 line chars; paragraphs = ['x\\nx\\ny'] × 2 → 2 units, 1 dup
    (5 of 10 chars)."""
    out = text_ops.gopher_line_repetition(
        _docs(spark, [(1, "x\nx\ny\n\nx\nx\ny")])
    ).collect()
    r = out[0]
    assert (r.line_units, r.line_dup_units, r.line_dup_chars) == (7, 4, 4)
    assert r.line_dup_frac == 4 / 7
    assert r.line_dup_char_frac == 4 / 6
    assert (r.para_units, r.para_dup_units, r.para_dup_chars) == (2, 1, 5)
    assert r.para_dup_frac == 0.5
    assert r.para_dup_char_frac == 0.5


def test_incremental_dedup_near_transitive_collapses_batch_clusters(spark):
    """Three within-batch mirrors of one novel page (suffix variants)
    survive the old↔new rules but form a near-dup chain; the
    transitive collapse keeps only the min key. An unrelated novel doc
    and a near-dup-of-old doc exercise the inherited rules."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    novel = "one red two blue three green four yellow five purple six"
    old = _docs(spark, [(1, base)])
    new = _docs(
        spark,
        [
            (10, novel + " va"),  # cluster keeper (min key)
            (11, novel + " vb"),  # near 10 → dropped
            (12, novel + " vc"),  # near 11 (and 10) → dropped
            (20, base + " tail"),  # near-dup of OLD → dropped by pass 1
            (30, "totally different words with no overlap at all here"),
        ],
    )
    out = curation.incremental_dedup_near_transitive(old, new).collect()
    assert [(r.doc_id, r.status) for r in out] == [
        (10, "added"),
        (30, "added"),
    ]


def test_tokenizer_fertility_byte_fallback_model(spark):
    """vocab_size=1 keeps only the most frequent term ('aa', count 2,
    ties none): src1 = 'aa aa bbb' → 3 tokens, 2 in-vocab, pieces =
    2 + 3 = 5; bytes = 9 ('aa aa bbb'). src2 = 'cccc' → 1 token, 0
    in-vocab, 4 pieces."""
    out = text_ops.tokenizer_fertility(
        _docs_src(spark, [(1, "aa aa bbb", "s1"), (2, "cccc", "s2")]),
        vocab_size=1,
    ).collect()
    by_src = {r.source: r for r in out}
    r1 = by_src["s1"]
    assert (r1.n_tokens, r1.n_invocab, r1.n_pieces, r1.total_bytes) == (3, 2, 5, 9)
    assert r1.fertility == round(5 / 3, 9)
    r2 = by_src["s2"]
    assert (r2.n_tokens, r2.n_invocab, r2.n_pieces, r2.total_bytes) == (1, 0, 4, 4)
    assert r2.fertility == 4.0 and r2.bytes_per_piece == 1.0


def test_stratified_sample_exact_counts_and_order_contract(spark, sf_dir):
    """Exactly ceil(pct·n_s/100) rows per source, and the selection is
    the k_s smallest by (md5-prefix hash of doc_id, doc_id) — checked
    against a direct window-rank recomputation."""
    from real_time_database_monitoring_system_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = pipeline.stratified_sample_exact(docs, pct=20)
    got = {(r.doc_id, r.source) for r in out.collect()}
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 8),
        16,
        10,
    ).cast("bigint")
    ref = (
        docs.select("doc_id", "source", h.alias("h"))
        .withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("source").orderBy("h", "doc_id")),
        )
        .withColumn(
            "n_s",
            F.count("*").over(Window.partitionBy("source")),
        )
        .filter(F.col("rn") <= (F.col("n_s") * 20 + 99) / 100)
    )
    want = {(r.doc_id, r.source) for r in ref.select("doc_id", "source").collect()}
    assert got == want
    per_src = {
        r.source: r.n for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    tot = {
        r.source: r.n
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    for s, n in tot.items():
        assert per_src[s] == -(-n * 20 // 100)  # ceil


def test_stratified_sample_exact_tiny_strata(spark):
    """pct=50 over a 1-doc and a 3-doc source keeps ceil: 1 and 2."""
    docs = _docs_src(
        spark,
        [(1, "a", "s1"), (2, "b", "s2"), (3, "c", "s2"), (4, "d", "s2")],
    )
    out = pipeline.stratified_sample_exact(docs, pct=50).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, 0)
        by_src[r.source] += 1
    assert by_src == {"s1": 1, "s2": 2}


def test_pack_efficiency_rollup(spark):
    """Budget 5: docs of 3,3,4 tokens in one source → shards 0 (3),
    1 (3+4? no: tokens_before 3 → shard 0? 3 div 5 = 0 → doc2 shard 0;
    doc3 tokens_before 6 → shard 1). Shard 0: 2 docs 6 tokens, fill
    1.2; shard 1: 1 doc 4 tokens, fill 0.8."""
    docs = _docs_src(
        spark, [(1, "a b c", "s"), (2, "d e f", "s"), (3, "g h i j", "s")]
    )
    out = pipeline.pack_efficiency(docs, budget_tokens=5).collect()
    assert [(r.shard_id, r.n_docs, r.shard_tokens, r.fill_ratio) for r in out] == [
        (0, 2, 6, 1.2),
        (1, 1, 4, 0.8),
    ]


def test_seqlen_histogram_integer_buckets(spark):
    """Token counts 0,1,2,3,4 land in buckets 1,1,2,2,3 (binary digit
    count; 0 renders '0' → bucket 1)."""
    docs = _docs_src(
        spark,
        [
            (1, "", "s"),
            (2, "a", "s"),
            (3, "a b", "s"),
            (4, "a b c", "s"),
            (5, "a b c d", "s"),
        ],
    )
    out = pipeline.seqlen_histogram(docs).collect()
    assert [(r.len_bucket, r.n_docs, r.min_tokens, r.max_tokens) for r in out] == [
        (1, 2, 0, 1),
        (2, 2, 2, 3),
        (3, 1, 4, 4),
    ]


def test_vocab_coverage_curve_closed_form(spark):
    """Counts a:4, b:2, c:1, d:1 → k=1 covers 4/8, k=2 covers 6/8,
    k=4 covers 8/8; ranks 3 (not a power of two) and >4 absent."""
    docs = _docs(spark, [(1, "a a a a b b c d")])
    out = text_ops.vocab_coverage_curve(docs).collect()
    assert [(r.k, r.term_at_k, r.covered_occ, r.coverage) for r in out] == [
        (1, "a", 4, 0.5),
        (2, "b", 6, 0.75),
        (4, "d", 8, 1.0),
    ]


def test_boilerplate_lines_threshold_and_mass(spark):
    """25 docs share 'hot line' (df 25 > 20); 'warm' appears in 20
    docs (not > 20 → excluded); occurrences count every copy: doc 0
    carries 'hot line' twice → 26 occurrences, mass 26·8."""
    rows = []
    for i in range(25):
        extra = "\nhot line\nhot line" if i == 0 else "\nhot line"
        warm = "\nwarm" if i < 20 else ""
        rows.append((i, f"body {i}" + extra + warm))
    out = dedup.boilerplate_lines(_docs(spark, rows), max_docs=20).collect()
    assert [(r.line, r.doc_freq, r.n_occurrences, r.chars_mass) for r in out] == [
        ("hot line", 25, 26, 26 * 8)
    ]


def test_char_entropy_closed_form(spark):
    """'aab': counts {a:2, b:1} → H = ln3 − (2·ln2)/3; 'zzzz' → 0."""
    import math

    out = {
        r.doc_id: r
        for r in text_ops.char_entropy(_docs(spark, [(1, "aab"), (2, "zzzz")])).collect()
    }
    r1 = out[1]
    assert (r1.n_chars, r1.n_distinct) == (3, 2)
    want = round(round(math.log(3.0), 9) - round(2 * math.log(2.0), 9) / 3.0, 9)
    assert r1.entropy_nats == want
    r2 = out[2]
    assert (r2.n_chars, r2.n_distinct) == (4, 1)
    assert r2.entropy_nats == 0.0


def test_lang_mismatch_audit_counts(spark):
    """Declared 'en' with English stopwords matches; declared 'de'
    with English text conflicts; stopword-free text is unknown."""
    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and ate", "en", "s"),
            (2, "the dog is in the house that is", "de", "s"),
            (3, "qqq www zzz", "fr", "s"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    out = {(r.source, r.lang): r for r in text_ops.lang_mismatch_audit(docs).collect()}
    assert out[("s", "en")].n_match == 1
    assert out[("s", "de")].n_conflict == 1
    assert out[("s", "fr")].n_unknown == 1


def test_cross_source_dup_matrix_finds_foreign_mirror(spark):
    """A verbatim re-host under another source lands in one matrix
    cell with jaccard 1; unrelated docs produce no pairs."""
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta", "srcA"),
            (2, "alpha beta gamma delta epsilon zeta eta theta", "srcB"),
            (3, "one two three four five six seven eight nine", "srcA"),
        ],
        "doc_id long, text string, source string",
    )
    out = dedup.cross_source_dup_matrix(docs).collect()
    assert [(r.source_a, r.source_b, r.n_pairs, r.avg_jaccard) for r in out] == [
        ("srcA", "srcB", 1, 1.0)
    ]


def test_payload_dedup_content_address(spark):
    """Identical payloads under different ids collapse to the min-id
    keeper with the byte mass of the redundant copies."""
    from real_time_database_monitoring_system_spark.operators import multimodal

    docs = spark.createDataFrame(
        [(1, "same bytes", "x", "s"), (7, "same bytes", "x", "s"), (3, "other", "x", "s")],
        "doc_id long, text string, lang string, source string",
    )
    out = multimodal.payload_dedup(docs).collect()
    assert [(r.keeper_doc_id, r.n_copies, r.reclaimable_bytes) for r in out] == [
        (1, 2, 10),
        (3, 1, 0),
    ]


def test_distinct_ngram_ratio_closed_form(spark):
    """'a a a a' → 1-grams 4 total/1 distinct; 2-grams 3/1; 3-grams
    2/1. 'a b c' → 3/3, 2/2, 1/1."""
    out = text_ops.distinct_ngram_ratio(
        _docs_src(spark, [(1, "a a a a", "rep"), (2, "a b c", "div")])
    ).collect()
    got = {(r.source, r.n): (r.total_ngrams, r.distinct_ngrams, r.distinct_ratio) for r in out}
    assert got[("rep", 1)] == (4, 1, 0.25)
    assert got[("rep", 2)] == (3, 1, 1 / 3)
    assert got[("rep", 3)] == (2, 1, 0.5)
    assert got[("div", 1)] == (3, 3, 1.0)
    assert got[("div", 2)] == (2, 2, 1.0)
    assert got[("div", 3)] == (1, 1, 1.0)


def test_pii_density_by_source_counts(spark):
    """Two docs in one source: one with an email + an IP, one clean →
    totals 1/1/0, docs-with-pii 1 of 2."""
    docs = _docs_src(
        spark,
        [
            (1, "write to a@b.com from 10.0.0.1 thanks", "s"),
            (2, "nothing sensitive here", "s"),
        ],
    )
    r = text_ops.pii_density_by_source(docs).collect()[0]
    assert (r.n_docs, r.n_emails, r.n_ips, r.n_phones) == (2, 1, 1, 0)
    assert r.n_docs_with_pii == 1 and r.doc_pii_rate == 0.5


def test_simhash_distance_hist_identical_docs(spark):
    """Two identical docs → one pair at hamming 0; cum matches."""
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon", "s"),
            (2, "alpha beta gamma delta epsilon", "s"),
        ],
        "doc_id long, text string, source string",
    )
    out = dedup.simhash_distance_hist(docs).collect()
    assert [(r.hamming, r.n_pairs, r.cum_pairs) for r in out] == [(0, 1, 1)]


def test_sample_skew_audit_counts_match_operator(spark, sf_dir):
    """The audit's n_sample per source must equal what hash_sample
    actually keeps — same predicate, single scan."""
    from real_time_database_monitoring_system_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents")
    audit = {r.source: r for r in pipeline.sample_skew_audit(docs).collect()}
    kept = {
        r.source: r.n
        for r in pipeline.hash_sample(docs).groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    for src, r in audit.items():
        assert r.n_sample == kept.get(src, 0)
        assert r.n_pop >= r.n_sample


def test_split_embedding_leakage_clean_and_leaky(spark):
    """Two identical vectors: ids chosen so one pair crosses splits
    (cos 1.0 reported), and a same-split control pair produces no
    row."""
    from real_time_database_monitoring_system_spark.operators import similarity

    # md5-bucket splits: find ids in train and test deterministically
    import hashlib

    def split_of(i):
        b = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 100
        return "train" if b < 90 else ("val" if b < 95 else "test")

    train_ids = [i for i in range(1, 200) if split_of(i) == "train"]
    test_ids = [i for i in range(1, 200) if split_of(i) == "test"]
    a, b, c, d = train_ids[0], test_ids[0], train_ids[1], train_ids[2]
    vec = [1.0] + [0.0] * 63
    other = [0.0, 1.0] + [0.0] * 62
    emb = spark.createDataFrame(
        [(a, 0, vec), (b, 0, vec), (c, 0, other), (d, 0, other)],
        "vec_id long, label int, embedding array<double>",
    )
    out = similarity.split_embedding_leakage(emb, threshold=0.9)
    rows = out.collect()
    assert [(r.split_a, r.split_b, r.n_pairs, r.max_cos_sim) for r in rows] == [
        ("test", "train", 1, 1.0)
    ]


def test_cdc_chunk_realignment(spark):
    """The CDC property: the same payload embedded after DIFFERENT
    prefixes still produces shared interior chunks (dup_chars > 0),
    which fixed-offset chunking could never align."""
    payload = (
        "content defined chunking realigns interior boundaries after "
        "any insertion because the cut decision depends only on the "
        "local window of characters and not on absolute offsets, so "
        "downstream chunks re-synchronize immediately and dedup sees "
        "the shared payload regardless of where each carrier placed it"
    ) * 2
    docs = spark.createDataFrame(
        [
            (1, "short prefix " + payload, "s"),
            (2, "a completely different and much longer document opening " + payload, "s"),
        ],
        "doc_id long, text string, source string",
    )
    r = dedup.cdc_chunk_dedup(docs).collect()[0]
    assert r.n_dup_occurrences > 0 and r.dup_chars > 0
    assert r.chunk_chars == sum(len(t) for t in [
        "short prefix " + payload,
        "a completely different and much longer document opening " + payload,
    ])


def test_cdc_chunks_partition_text(spark):
    """Chunks tile each document exactly: Σ chunk length = doc length
    and every boundary obeys the h %% divisor rule or is the doc end."""
    docs = spark.createDataFrame(
        [(1, "abcdefghij" * 30, "s")], "doc_id long, text string, source string"
    )
    r = dedup.cdc_chunk_dedup(docs).collect()[0]
    assert r.chunk_chars == 300


def test_bloom_fpr_audit_verdict_columns(spark):
    """Disjoint build/probe sets: every probe hit is a false positive;
    fill^4 prediction composes correctly-rounded ops only."""
    from real_time_database_monitoring_system_spark.operators import sketches

    ev = spark.createDataFrame(
        [(i, i % 40) for i in range(200)], "event_id long, user_id long"
    )
    r = sketches.bloom_fpr_audit(ev).collect()[0]
    assert r.n_ref_users == 20 and r.n_probe_users == 20
    assert 0 < r.n_bits_set <= 80  # ≤ 4 bits per ref user
    assert 0.0 <= r.fpr_observed <= 1.0
    p = r.n_bits_set / 1024.0
    assert r.fpr_expected == round((p * p) * (p * p), 9)


def test_template_prefix_groups_threshold(spark):
    """Three docs sharing a 40-char opening group; two do not."""
    tpl = "identical opening line shared by the template pages "
    docs = _docs_src(
        spark,
        [
            (1, tpl + "one", "s"),
            (2, tpl + "two", "s"),
            (3, tpl + "three", "s"),
            (4, "unique doc four", "s"),
            (5, "unique doc five", "s"),
        ],
    )
    out = text_ops.template_prefix_groups(docs).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_docs, r.example_doc_id) == (3, 1)
    assert r.prefix == tpl[:40]


def test_contamination_by_source_rollup(spark):
    """One source ships a benchmark excerpt verbatim, one is clean."""
    bench_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu"
    docs = _docs_src(
        spark,
        [
            (1, "intro words " + bench_text + " trailing words", "dirty"),
            (2, "totally unrelated prose about nothing at all here", "dirty"),
            (3, "another clean document with its own words only", "clean"),
        ],
    )
    bench = _docs(spark, [(100, bench_text)])
    out = {r.source: r for r in curation.contamination_by_source(docs, bench).collect()}
    assert out["dirty"].n_contaminated == 1 and out["dirty"].n_docs == 2
    assert out["dirty"].contamination_rate == 0.5
    assert out["clean"].n_contaminated == 0 and out["clean"].n_hit_shingles == 0


def test_negative_samples_contract(spark):
    """Exactly k negatives per anchor, never the anchor's own label,
    deterministically ordered by the pair hash."""
    from real_time_database_monitoring_system_spark.operators import similarity

    emb = spark.createDataFrame(
        [(i, i % 3, [float(i)]) for i in range(97, 97 * 4 + 1)],
        "vec_id long, label int, embedding array<double>",
    )
    out = similarity.negative_samples(emb, k=4).collect()
    by_anchor = {}
    for r in out:
        assert r.neg_label != r.anchor_label
        by_anchor.setdefault(r.anchor_id, []).append(r)
    for a, rows in by_anchor.items():
        assert [r.neg_rank for r in sorted(rows, key=lambda r: r.neg_rank)] == [1, 2, 3, 4]
        keys = [r.sample_key for r in sorted(rows, key=lambda r: r.neg_rank)]
        assert keys == sorted(keys)


def test_audio_frame_energy_closed_form(spark):
    """64 identical bytes 'd' (ascii 100 → sample 0) give 3 frames of
    zero energy at frame=32/hop=16; a byte 'e' (sample 1) at position
    0 contributes 1 to frame 0 only. Short payloads emit nothing."""
    from real_time_database_monitoring_system_spark.operators import multimodal

    docs = spark.createDataFrame(
        [(1, "e" + "d" * 63, "s"), (2, "d" * 31, "s")],
        "doc_id long, text string, source string",
    )
    out = multimodal.audio_frame_energy(docs).collect()
    assert [(r.doc_id, r.frame_no, r.energy) for r in out] == [
        (1, 0, 1),
        (1, 1, 0),
        (1, 2, 0),
    ]
