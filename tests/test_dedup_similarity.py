"""Semantic checks for the hash-based ops that have no SQL oracle:
MinHash+LSH and SimHash against exact Jaccard; LSH-ANN recall against
brute-force KNN; multimodal decode plumbing."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_database_monitoring_system_spark.operators import (
    clustering,
    dedup,
    multimodal,
    similarity,
)
from real_time_database_monitoring_system_spark.sources.registry import load_table


def test_minhash_finds_planted_duplicate(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    # plant a near-duplicate of doc 0 (same source, text + one word)
    dup = docs.filter(F.col("doc_id") == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extra")).alias("text"),
        "lang",
        "source",
        (F.col("n_chars") + 6).alias("n_chars"),
    )
    with_dup = docs.unionByName(dup)
    pairs = dedup.minhash_lsh_pairs(with_dup, threshold=0.5).collect()
    assert any(r.doc_a == 0 and r.doc_b == 100000 for r in pairs), pairs


def test_minhash_portable_finds_planted_duplicate_and_agrees(spark, sf_dir):
    """The portable (md5-affine) MinHash variant must surface the same
    planted near-duplicate as the xxhash64 form, and at a fixed
    verification threshold the two variants' verified pair sets agree
    on the real corpus (verification is exact Jaccard in both; only
    the candidate generation differs, and both banding schemes must
    recall a 0.5+ Jaccard pair)."""
    docs = load_table(spark, sf_dir, "documents")
    dup = docs.filter(F.col("doc_id") == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extra")).alias("text"),
        "lang",
        "source",
        (F.col("n_chars") + 6).alias("n_chars"),
    )
    with_dup = docs.unionByName(dup)
    pairs = dedup.minhash_lsh_pairs_portable(with_dup, threshold=0.5).collect()
    assert any(r.doc_a == 0 and r.doc_b == 100000 for r in pairs), pairs
    fast = {
        (r.doc_a, r.doc_b)
        for r in dedup.minhash_lsh_pairs(docs, threshold=0.5).collect()
    }
    portable = {
        (r.doc_a, r.doc_b)
        for r in dedup.minhash_lsh_pairs_portable(docs, threshold=0.5).collect()
    }
    assert fast == portable, f"variants disagree: {fast ^ portable}"


def test_minhash_candidates_superset_of_high_jaccard(spark, sf_dir):
    """Every truly-similar pair (exact Jaccard >= 0.6) must be caught
    by the LSH candidate generation (recall check on real data)."""
    docs = load_table(spark, sf_dir, "documents")
    exact = {
        (r.doc_a, r.doc_b)
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.6).collect()
    }
    lsh = {
        (r.doc_a, r.doc_b)
        for r in dedup.minhash_lsh_pairs(docs, threshold=0.0).collect()
    }
    missed = exact - lsh
    assert len(missed) <= max(1, len(exact) // 5), f"LSH missed {missed}"


def test_dup_clusters_transitive_closure(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)],
        "doc_a long, doc_b long",
    )
    clusters = {r.doc_id: r.cluster_id for r in dedup.dup_clusters(pairs).collect()}
    assert clusters[1] == clusters[2] == clusters[3] == 1
    assert clusters[10] == clusters[11] == 10
    assert clusters[20] == clusters[21] == clusters[22] == clusters[23] == 20


def test_keeper_list(spark, sf_dir):
    docs = spark.createDataFrame(
        [(i, f"t{i}", "en", "s", 10) for i in range(6)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    pairs = spark.createDataFrame([(1, 4), (4, 5)], "doc_a long, doc_b long")
    keep = {r.doc_id: (r.keeper_doc_id, r.is_keeper) for r in dedup.keeper_list(docs, pairs).collect()}
    assert keep[0] == (0, True) and keep[2] == (2, True) and keep[3] == (3, True)
    assert keep[1] == (1, True) and keep[4] == (1, False) and keep[5] == (1, False)


def test_simhash_identical_docs_distance_zero(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    dup = docs.filter(F.col("doc_id") == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    pairs = dedup.simhash_pairs(docs.unionByName(dup), max_hamming=0).collect()
    assert any(r.doc_a == 0 and r.doc_b == 100000 and r.hamming == 0 for r in pairs)


def test_stop_shingle_cutoff_bounds_inverted_lists(spark):
    """A boilerplate shingle shared by a whole block must be dropped
    before the co-occurrence self-join (it would make that inverted
    list quadratic), while genuinely duplicated docs stay discoverable."""
    boiler = "terms of service apply to all pages"
    docs = spark.createDataFrame(
        [(i, f"{boiler} unique tail {i} alpha beta gamma {i}", "en", "s0", 50) for i in range(10)]
        + [(100, f"{boiler} copied body text here", "en", "s0", 50),
           (101, f"{boiler} copied body text here", "en", "s0", 50)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    kept = dedup._kept_inverted(docs, shingle_k=3, max_df_frac=0.5)
    # block has 12 docs -> cutoff = max(2, 6): the boilerplate shingles
    # (df=12) are gone; no surviving inverted list exceeds the cutoff
    max_list = kept.groupBy("source", "sh_h").count().agg(F.max("count")).first()[0]
    assert max_list <= 6
    # the planted exact-duplicate pair still surfaces with jaccard 1.0
    pairs = {(r.doc_a, r.doc_b): r.jaccard for r in dedup.ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    assert pairs.get((100, 101)) == 1.0


def test_simhash_banding_equals_allpairs(spark, sf_dir):
    """Pigeonhole-banded candidate generation must be recall-complete:
    the banded equi-join output is IDENTICAL to the quadratic all-pairs
    formulation for every r (hamming <= r implies an exact match on at
    least one of the r+1 bands)."""
    docs = load_table(spark, sf_dir, "documents")
    sh = dedup.simhash_64(docs).join(docs.select("doc_id", "source"), "doc_id")
    a = sh.select("source", F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sim_a"))
    b = sh.select("source", F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sim_b"))
    for r in (0, 3, 6):
        brute = sorted(
            (row.source, row.doc_a, row.doc_b, row.hamming)
            for row in a.join(b, "source")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select(
                "source", "doc_a", "doc_b",
                F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))).alias("hamming"),
            )
            .filter(F.col("hamming") <= r)
            .collect()
        )
        banded = sorted(
            (row.source, row.doc_a, row.doc_b, row.hamming)
            for row in dedup.simhash_pairs(docs, max_hamming=r).collect()
        )
        assert banded == brute, f"banding lost/invented pairs at r={r}"


def test_simhash_plan_has_no_allpairs_join(spark, sf_dir):
    """The physical plan must be a hash/merge equi-join on the band
    key, not a nested-loop/cartesian within source blocks."""
    docs = load_table(spark, sf_dir, "documents")
    plan = dedup.simhash_pairs(docs)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_embedding_near_dup_recall_and_plan(spark, sf_dir):
    """The banded near-dup pairs must (a) be a subset of the exact
    per-label pairs, (b) recover ≥90% of them (8 bands × 6 bits at
    cos ≥ 0.9 gives ≥98% expected recall), and (c) not contain an
    all-pairs product in the physical plan."""
    emb = load_table(spark, sf_dir, "embeddings")
    emb_d = emb.select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("vec")
    )
    a = emb_d.select("label", F.col("vec_id").alias("vec_a"), F.col("vec").alias("va"))
    b = emb_d.select("label", F.col("vec_id").alias("vec_b"), F.col("vec").alias("vb"))
    exact = {
        (r.vec_a, r.vec_b)
        for r in a.join(b, "label")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a", "vec_b",
            F.round(similarity.cosine(F.col("va"), F.col("vb")), 9).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= 0.9)
        .collect()
    }
    df = similarity.embedding_near_dup_pairs(emb, threshold=0.9)
    banded = {(r.vec_a, r.vec_b) for r in df.collect()}
    assert banded <= exact, "banding invented pairs"
    if exact:
        recall = len(banded) / len(exact)
        assert recall >= 0.9, f"near-dup recall too low: {recall}"
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_lsh_ann_recall_vs_bruteforce(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    exact = {(r.q_id, r.vec_id) for r in similarity.knn_bruteforce(emb, n_queries=10, k=5).collect()}
    approx = {(r.q_id, r.vec_id) for r in similarity.knn_lsh(emb, n_queries=10, k=5).collect()}
    recall = len(exact & approx) / len(exact)
    # the synthetic embeddings are near-random (max pair cosine ~0.5),
    # so this is a regression anchor, not the ANN contract — that lives
    # in test_ann_recall_on_planted_neighbors below, where true near
    # neighbors exist for LSH theory to apply to
    assert recall >= 0.3, f"LSH ANN recall too low: {recall}"


def _planted_embeddings(spark):
    """Deterministic corpus WITH ground-truth structure: 10 clusters of
    1 query + 5 neighbors at cosine ≈0.95 (center + small noise), plus
    200 random background vectors spread over the same labels. The
    exact top-5 of each query is its own cluster, so recall@5 against
    bruteforce measures whether the approximate paths find genuinely
    similar items — the promise LSH/IVF actually make (their collision
    guarantees apply to high-similarity pairs, not to the weak
    neighbors of a uniformly random corpus)."""
    import math
    import random

    rng = random.Random(4253)
    dim = 64

    def unit(v):
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    centers = [unit([rng.gauss(0.0, 1.0) for _ in range(dim)]) for _ in range(10)]

    def near(c):
        return unit([x + rng.gauss(0.0, 0.03) for x in c])

    rows = []
    # vec_id 0..9: one query per cluster (label = cluster id)
    for lbl, c in enumerate(centers):
        rows.append((lbl, near(c), lbl))
    # 5 planted neighbors per cluster
    nid = 10
    for lbl, c in enumerate(centers):
        for _ in range(5):
            rows.append((nid, near(c), lbl))
            nid += 1
    # random background, labels round-robin
    for i in range(200):
        rows.append((nid, unit([rng.gauss(0.0, 1.0) for _ in range(dim)]), i % 10))
        nid += 1
    return spark.createDataFrame(
        [(i, [float(x) for x in v], lbl) for i, v, lbl in rows],
        "vec_id long, embedding array<float>, label int",
    )


def test_ann_recall_on_planted_neighbors(spark):
    """Quantitative ANN correctness contract (VERDICT r2 #4): on a
    corpus with planted near neighbors, both approximate paths must
    recover ≥90% of the exact top-5."""
    emb = _planted_embeddings(spark)
    exact: dict[int, set[int]] = {}
    for r in similarity.knn_bruteforce(emb, n_queries=10, k=5).collect():
        exact.setdefault(r.q_id, set()).add(r.vec_id)
    assert len(exact) == 10

    def recall(df):
        got: dict[int, set[int]] = {}
        for r in df.collect():
            got.setdefault(r.q_id, set()).add(r.vec_id)
        per_q = [
            len(exact[q] & got.get(q, set())) / len(exact[q]) for q in exact
        ]
        return sum(per_q) / len(per_q)

    lsh = recall(similarity.knn_lsh(emb, n_queries=10, k=5))
    assert lsh >= 0.9, f"LSH recall@5 on planted neighbors too low: {lsh}"
    ivf = recall(similarity.ivf_knn(emb, n_queries=10, k=5, nprobe=3))
    assert ivf >= 0.9, f"IVF recall@5 on planted neighbors too low: {ivf}"


def test_containment_recall_on_planted_excerpts(spark):
    """Quantitative recall contract for the containment path (VERDICT
    r3 #8): 20 planted excerpt pairs — a paragraph lifted verbatim
    into a much longer page, containment 1.0 by construction — must
    ALL survive the inverted-index candidate generation and the
    stop-shingle DF cutoff; and nothing else may be reported (the
    background corpora share no 3-grams)."""
    rows = []
    for i in range(20):
        para = " ".join(f"p{i}w{j}" for j in range(30))
        filler = " ".join(f"f{i}w{j}" for j in range(40))
        rows.append((2 * i, para, "en", "s", len(para)))
        rows.append((2 * i + 1, para + " " + filler, "en", "s", len(para) + 1 + len(filler)))
    for i in range(20):
        bg = " ".join(f"b{i}w{j}" for j in range(35))
        rows.append((100 + i, bg, "en", "s", len(bg)))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = {(r.doc_a, r.doc_b): r.containment for r in dedup.containment_pairs(docs).collect()}
    planted = {(2 * i, 2 * i + 1) for i in range(20)}
    found = planted & set(got)
    recall = len(found) / len(planted)
    assert recall >= 0.9, f"containment recall on planted excerpts too low: {recall}"
    assert all(got[p] >= 0.99 for p in found)
    assert set(got) <= planted, f"invented pairs: {set(got) - planted}"


def test_semantic_dedup_recall_on_planted_pairs(spark):
    """Quantitative recall contract for SemDeDup's cluster blocking
    (VERDICT r3 #8): on the planted-neighbor corpus, near-dup pairs
    (exact float cosine ≥ 0.92) must survive the k-means blocking —
    a pair only dies when k-means splits genuinely similar vectors
    across clusters. Threshold margin (operator at 0.85, truth at
    0.92, precision floor 0.84) keeps int8 quantization off the
    boundary."""
    import math

    emb = _planted_embeddings(spark)
    vecs = {r.vec_id: r.embedding for r in emb.collect()}

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b, strict=True))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb)

    ids = sorted(vecs)
    exact = {
        (a, b)
        for ai, a in enumerate(ids)
        for b in ids[ai + 1 :]
        if cos(vecs[a], vecs[b]) >= 0.92
    }
    assert exact, "fixture lost its planted near-dup pairs"
    got = {(r.a_id, r.b_id) for r in clustering.semantic_dedup(emb, threshold=0.85).collect()}
    recall = len(exact & got) / len(exact)
    assert recall >= 0.9, f"semantic-dedup recall on planted pairs too low: {recall}"
    assert all(cos(vecs[a], vecs[b]) >= 0.84 for a, b in got)


def test_multimodal_decode_shapes(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = multimodal.decode_metadata(docs)
    rows = out.collect()
    assert len(rows) == docs.count()
    first = rows[0]
    assert first.payload_bytes > 0
    assert 0 <= first.fake_width < 640 and 0 <= first.fake_height < 480


def test_multimodal_frame_sampling_multiplies_rows(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    frames = multimodal.sample_frames(docs, n_frames=4)
    n_docs = docs.count()
    assert frames.count() == 4 * n_docs
    per_doc = frames.filter(frames.doc_id == 0).collect()
    assert [r.frame_no for r in per_doc] == [0, 1, 2, 3]
    assert per_doc[0].frame_offset == 0
    assert all(r.frame_checksum >= 0 for r in per_doc)


def test_multimodal_featurize_feeds_ann(spark, sf_dir):
    """featurize closes the multimodal -> vector-search pipeline: its
    float32 unit vectors must slot directly into knn_bruteforce."""
    import pyspark.sql.functions as F

    docs = load_table(spark, sf_dir, "documents").limit(60)
    emb = multimodal.featurize(docs)
    # deterministic across runs
    a = {r.doc_id: r.embedding for r in emb.collect()}
    b = {r.doc_id: r.embedding for r in multimodal.featurize(docs).collect()}
    assert a == b
    # unit-norm float32 vectors of the declared width
    import math

    for v in list(a.values())[:5]:
        assert len(v) == multimodal.EMBED_DIM
        assert abs(math.sqrt(sum(x * x for x in v)) - 1.0) < 1e-5
    # ANN-ready: rename to the embeddings layout and run exact top-k
    as_index = emb.select(
        F.col("doc_id").alias("vec_id"),
        F.lit(0).alias("label"),
        "embedding",
    )
    knn = similarity.knn_bruteforce(as_index, n_queries=3, k=4)
    rows = knn.collect()
    assert {r.q_id for r in rows} == {0, 1, 2}
    assert all(1 <= r.rn <= 4 for r in rows)


def test_keeper_list_best_prefers_quality(spark):
    docs = spark.createDataFrame(
        [(i, f"t{i}", "en", "s", 10) for i in range(6)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    pairs = spark.createDataFrame([(1, 4), (4, 5)], "doc_a long, doc_b long")
    scores = spark.createDataFrame(
        [(0, 0.1), (1, 0.2), (2, 0.3), (3, 0.4), (4, 0.9), (5, 0.9)],
        "doc_id long, quality double",
    )
    got = {
        r.doc_id: (r.keeper_doc_id, r.is_keeper)
        for r in dedup.keeper_list_best(docs, pairs, scores).collect()
    }
    # cluster {1,4,5}: 4 and 5 tie at 0.9 -> min doc_id 4 wins
    assert got[1] == (4, False) and got[4] == (4, True) and got[5] == (4, False)
    # singletons keep themselves
    assert got[0] == (0, True) and got[2] == (2, True) and got[3] == (3, True)


def test_keeper_list_best_missing_scores_lose_ties(spark):
    docs = spark.createDataFrame(
        [(i, f"t{i}", "en", "s", 10) for i in range(3)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    pairs = spark.createDataFrame([(0, 1), (1, 2)], "doc_a long, doc_b long")
    scores = spark.createDataFrame([(2, 0.5)], "doc_id long, quality double")
    got = {r.doc_id: r.keeper_doc_id for r in dedup.keeper_list_best(docs, pairs, scores).collect()}
    # only doc 2 has a score -> it is the keeper for the whole chain
    assert got == {0: 2, 1: 2, 2: 2}



def test_paragraph_dedup_keeps_first_occurrence_and_drops_empty_docs(spark):
    from real_time_database_monitoring_system_spark.operators.dedup import paragraph_dedup
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    docs = spark.createDataFrame(
        [
            (1, "alpha\nbeta\ngamma"),
            (2, "beta\ndelta"),      # beta already seen in doc 1
            (3, "alpha\ngamma"),     # fully duplicate -> vanishes
            (4, "epsilon"),
        ],
        schema,
    )
    out = {r.doc_id: r for r in paragraph_dedup(docs).collect()}
    assert out[1].dedup_text == "alpha\nbeta\ngamma"
    assert out[1].n_kept == 3 and out[1].n_dropped == 0
    assert out[2].dedup_text == "delta"
    assert out[2].n_kept == 1 and out[2].n_dropped == 1
    assert 3 not in out, "document with no surviving paragraph disappears"
    assert out[4].dedup_text == "epsilon"


def test_paragraph_dedup_position_order_preserved(spark):
    from real_time_database_monitoring_system_spark.operators.dedup import paragraph_dedup
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    # doc 2 shares its MIDDLE paragraph with doc 1; the surviving
    # paragraphs must be re-joined in original positional order
    docs = spark.createDataFrame(
        [(1, "shared"), (2, "first\nshared\nlast")], schema
    )
    out = {r.doc_id: r for r in paragraph_dedup(docs).collect()}
    assert out[2].dedup_text == "first\nlast"
    assert out[2].n_kept == 2 and out[2].n_dropped == 1


def test_simhash_portable_finds_planted_duplicate(spark, sf_dir):
    """The portable (md5-60-bit) SimHash must surface a planted exact
    duplicate at hamming 0 (token-set-identical text is hamming 0
    under ANY hash family; a one-token edit's hamming is hash-family-
    dependent on short docs, so the exact plant is the stable probe)."""
    docs = load_table(spark, sf_dir, "documents")
    dup = docs.filter(F.col("doc_id") == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        "text",
        "lang",
        "source",
        "n_chars",
    )
    pairs = dedup.simhash_pairs_portable(docs.unionByName(dup)).collect()
    hit = [r for r in pairs if r.doc_a == 0 and r.doc_b == 100000]
    assert hit and hit[0].hamming == 0, pairs[:5]
    assert all(r.hamming <= 3 for r in pairs)


def test_quantize_int8_error_bounds(spark, sf_dir):
    """Symmetric int8 with scale = max|x|/127: every element's
    reconstruction error is at most scale/2 (round-to-nearest), so
    max_abs_err <= scale/2 and mse <= (scale/2)^2."""
    from real_time_database_monitoring_system_spark.operators import similarity as sim

    out = sim.embedding_quantize_int8(load_table(spark, sf_dir, "embeddings")).collect()
    assert len(out) > 0
    for r in out:
        assert r.max_abs_err <= r.scale / 2 + 1e-9, r
        assert r.mse <= (r.scale / 2) ** 2 + 1e-9, r


def test_random_projection_preserves_distances_jl(spark, sf_dir):
    """JL with 16 Rademacher dims: squared distances are preserved in
    EXPECTATION; check the mean distortion over sampled pairs is small
    even though individual pairs can deviate."""
    from real_time_database_monitoring_system_spark.operators import similarity as sim

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 30)
    orig = {r.vec_id: r.embedding for r in emb.collect()}
    proj = {}
    for r in sim.random_projection(emb).collect():
        proj.setdefault(r.vec_id, [0.0] * 16)[r.dim_id] = r.value
    import itertools

    ratios = []
    for a, b in itertools.combinations(sorted(orig), 2):
        d_o = sum((x - y) ** 2 for x, y in zip(orig[a], orig[b]))
        d_p = sum((x - y) ** 2 for x, y in zip(proj[a], proj[b]))
        if d_o > 0:
            ratios.append(d_p / d_o)
    mean_ratio = sum(ratios) / len(ratios)
    assert 0.7 < mean_ratio < 1.3, f"JL mean distortion off: {mean_ratio}"


def test_knn_projected_recall_on_planted_neighbors(spark):
    """The compressed-first path's contract: on a corpus with genuine
    near neighbors (cosine ≈0.95 clusters), the 16-d JL shortlist must
    hand the exact re-ranker everything it needs — recall@5 ≥ 0.9.
    (On the isotropic synthetic corpus recall is meaningless: top-5
    'neighbors' there are noise-separated, the regime JL theory makes
    no promise about.)"""
    emb = _planted_embeddings(spark)
    exact = {
        (r.q_id, r.vec_id)
        for r in similarity.knn_bruteforce(emb, n_queries=10, k=5).collect()
    }
    proj = {
        (r.q_id, r.vec_id)
        for r in similarity.knn_projected(emb, n_queries=10, k=5).collect()
    }
    recall = len(exact & proj) / len(exact)
    assert recall >= 0.9, f"projected-shortlist recall too low: {recall}"
    import pytest

    with pytest.raises(ValueError):
        similarity.knn_projected(emb, k=5, shortlist=3)
