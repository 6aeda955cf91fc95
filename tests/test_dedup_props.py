"""Deterministic dedup-operator properties on constructed documents with
known overlap structure (beyond the oracle gate's synthetic corpus)."""

from __future__ import annotations

from pyspark.sql import functions as F

from rastercube_spark.operators.dedup import (
    content_fingerprint,
    exact_dedup,
    lsh_candidate_pairs,
    minhash_signatures,
    pair_jaccard,
    shingles_df,
    simhash_df,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy dog"),        # exact dup of 1
    (3, "the  QUICK   brown fox jumps over the lazy dog"),     # ws/case variant
    (4, "the quick brown fox jumps over the sleepy dog"),      # near dup
    (5, "completely different text about raster cubes here"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_dedup_normalizes(spark):
    out = {r["keeper_doc_id"]: r["n_copies"] for r in exact_dedup(_docs(spark), "doc_id", "text").collect()}
    # 1,2,3 share a normalized fingerprint (keeper 1); 4 and 5 are unique
    assert out == {1: 3, 4: 1, 5: 1}


def test_identical_docs_identical_signatures(spark):
    sh = shingles_df(_docs(spark), "doc_id", "text", k=3)
    sig = minhash_signatures(sh).collect()
    by_id = {r["doc_id"]: tuple(r[c] for c in sorted(r.asDict()) if c.startswith("mh_")) for r in sig}
    assert by_id[1] == by_id[2] == by_id[3]
    assert by_id[1] != by_id[5]


def test_lsh_finds_exact_dups_jaccard_exact(spark):
    d = _docs(spark)
    sh = shingles_df(d, "doc_id", "text", k=3)
    pairs = lsh_candidate_pairs(minhash_signatures(sh))
    cand = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
    assert {(1, 2), (1, 3), (2, 3)} <= cand  # identical signatures always collide
    j = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in pair_jaccard(sh, pairs).collect()}
    assert j[(1, 2)] == 1.0
    if (1, 4) in j:  # 7-of-9 trigrams differ by one word → 6/8 distinct... exact value
        assert 0 < j[(1, 4)] < 1


def test_simhash_identical_and_near(spark):
    out = {r["doc_id"]: r["simhash"] for r in simhash_df(_docs(spark), "doc_id", "text").collect()}
    assert out[1] == out[2]
    # near-dup hamming distance small vs unrelated
    def ham(a, b):
        return bin(a ^ b).count("1")
    assert ham(out[1], out[4]) < ham(out[1], out[5])


def test_fingerprint_column_stable(spark):
    d = _docs(spark)
    fps = d.select(content_fingerprint(F.col("text")).alias("fp")).collect()
    assert fps[0]["fp"] == fps[1]["fp"] == fps[2]["fp"]
    assert len(fps[0]["fp"]) == 32  # md5 hex


def test_decontaminate_plants_and_disjoint(spark):
    """Property anchors for the decontamination operator: a training doc
    containing an exact copy of eval text MUST be flagged with at least
    (len - k + 1) hits; a training set with fully disjoint vocabulary
    MUST produce zero flags."""
    from rastercube_spark.operators.dedup import decontaminate

    eval_text = "alpha beta gamma delta epsilon zeta eta theta"
    ev = spark.createDataFrame(
        [(0, eval_text)], "doc_id long, text string"
    )
    tr = spark.createDataFrame(
        [
            (100, "prefix words " + eval_text + " suffix words"),  # planted
            (101, "uno dos tres cuatro cinco seis siete ocho"),    # disjoint
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["n_hits"] for r in decontaminate(tr, ev, k=5).collect()}
    assert 101 not in got, "disjoint-vocabulary doc falsely flagged"
    # 8 eval tokens -> 4 distinct 5-grams, all present in the planted doc
    assert got.get(100) == 4, got


def test_incremental_dedup_composes_to_global(spark):
    """qd1's operator invariant: store keepers ∪ incremental keepers
    (with corpus ids below batch ids) ≡ from-scratch exact_dedup of the
    whole corpus — incremental ingestion loses nothing and double-keeps
    nothing. Re-ingesting the corpus itself yields an EMPTY keep-list."""
    from rastercube_spark.operators.dedup import (
        exact_dedup,
        incremental_dedup,
    )

    corpus = spark.createDataFrame(
        [(i, f"doc {i % 7}") for i in range(20)], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        # ids 100+: three fresh texts, plus re-ingests of corpus texts
        [(100 + i, f"doc {i}") for i in range(10)],
        "doc_id long, text string",
    )
    store = exact_dedup(corpus, "doc_id", "text")
    inc = incremental_dedup(batch, store.select("fingerprint"))
    # fresh = texts 7..9 (corpus only had i % 7 -> texts 0..6)
    assert inc.count() == 3
    assert {r["keeper_doc_id"] for r in inc.collect()} == {107, 108, 109}

    merged = store.select("fingerprint", "keeper_doc_id").unionByName(
        inc.select("fingerprint", "keeper_doc_id")
    )
    scratch = exact_dedup(
        corpus.unionByName(batch), "doc_id", "text"
    ).select("fingerprint", "keeper_doc_id")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, scratch.collect())
    )

    again = incremental_dedup(corpus, store.select("fingerprint"))
    assert again.count() == 0


def test_neardup_decontaminate_catches_paraphrase(spark):
    """qd4's operator: a training doc that shares most (not all) of its
    shingles with a benchmark doc must be flagged — the leak exact
    n-gram decontamination (k large) misses — while unrelated docs stay
    clean, and re-ordering/partitioning cannot change the verdict."""
    from rastercube_spark.operators.dedup import neardup_decontaminate

    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    ev = spark.createDataFrame(
        [(0, base), (1, "completely different benchmark text about astronomy stars galaxies")],
        "doc_id long, text string",
    )
    tr = spark.createDataFrame(
        [
            (100, base.replace("today", "tonight")),   # paraphrase leak of 0
            (101, base),                                # verbatim leak of 0
            (102, "unrelated training document about cooking pasta with garlic"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           neardup_decontaminate(tr, ev, k=3, threshold=0.5).collect()}
    assert set(out) == {100, 101}
    assert out[101]["max_jaccard"] == 1.0
    assert 0.5 <= out[100]["max_jaccard"] < 1.0
    assert out[100]["n_eval_matches"] == 1


def test_ngram_novelty_extremes(spark):
    """Planted structure: two exact copies share every shingle (novelty
    0 for both), a fully unique doc scores 1.0, and a doc assembled
    from the copies' fragments — the case pairwise dedup under-catches
    — collapses toward 0 without being anyone's near-dup."""
    from rastercube_spark.operators.dedup import ngram_novelty

    base = "alpha beta gamma delta epsilon zeta eta theta"
    uniq = "qq ww ee rr tt yy uu ii"
    frankenstein = "alpha beta gamma zeta eta theta qq unique tail"
    docs = spark.createDataFrame(
        [(0, base), (1, base), (2, uniq), (3, frankenstein)],
        "doc_id int, text string",
    )
    got = {r["doc_id"]: r for r in ngram_novelty(docs, k=3).collect()}
    assert got[0]["novelty"] == 0.0 and got[1]["novelty"] == 0.0
    assert got[2]["novelty"] == 1.0
    # shared 3-grams: "alpha beta gamma" (from base) and nothing else
    # from uniq ("eta theta qq" spans the seam and is new) → below 1
    assert 0.0 < got[3]["novelty"] < 1.0
    assert got[3]["n_shingles"] == 7


def test_ngram_novelty_short_docs_absent(spark):
    from rastercube_spark.operators.dedup import ngram_novelty

    docs = spark.createDataFrame(
        [(0, "one two"), (1, "a b c d")], "doc_id int, text string"
    )
    got = {r["doc_id"] for r in ngram_novelty(docs, k=3).collect()}
    assert got == {1}


def test_corpus_overlap_identity_and_disjoint(spark):
    """corpus_overlap's estimator bounds: identical snapshots give
    est = exact = 1; shingle-disjoint snapshots give est = exact = 0
    (r9 qd8 operator)."""
    from rastercube_spark.operators.dedup import corpus_overlap

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon w{i} zeta") for i in range(30)],
        "doc_id bigint, text string",
    )
    same = corpus_overlap(docs, docs).collect()[0]
    assert same["est_jaccard"] == 1.0 and same["exact_jaccard"] == 1.0
    assert same["within_03"]
    other = spark.createDataFrame(
        [(i, f"uno dos tres cuatro cinco x{i} seis") for i in range(30)],
        "doc_id bigint, text string",
    )
    disj = corpus_overlap(docs, other).collect()[0]
    assert disj["exact_jaccard"] == 0.0
    assert disj["est_jaccard"] == 0.0  # no shared shingle can share a min
    # 'full' records the trivial anchor metadata
    assert same["anchor_rate"] == 1.0 and same["anchor_ci95"] == 0.0


def test_corpus_overlap_anchor_modes(spark):
    """The exact anchor's scale policy is callable (VERDICT r9 "Next
    round" #4): 'sampled' key-space hash-mod sampling estimates the
    full Jaccard within its own recorded CI, with a recorded effective
    rate; None skips the anchor join and NULLs the anchor columns; the
    schema is identical across modes; a bogus mode raises."""
    import pytest

    from rastercube_spark.operators.dedup import corpus_overlap

    # ~50% true overlap over a few thousand distinct shingles so a
    # 25% key-space sample still holds hundreds of union shingles
    a = spark.createDataFrame(
        [(i, f"w{i} w{i + 1} w{i + 2} w{i + 3} w{i + 4}") for i in range(0, 2000)],
        "doc_id bigint, text string",
    )
    b = spark.createDataFrame(
        [(i, f"w{i} w{i + 1} w{i + 2} w{i + 3} w{i + 4}") for i in range(1000, 3000)],
        "doc_id bigint, text string",
    )
    full = corpus_overlap(a, b, anchor="full").collect()[0]
    samp = corpus_overlap(a, b, anchor="sampled", anchor_rate=0.25).collect()[0]
    cols = [
        "n_perms", "est_jaccard", "exact_jaccard",
        "anchor_rate", "anchor_ci95", "within_03",
    ]
    assert list(full.asDict()) == cols
    assert list(samp.asDict()) == cols
    assert samp["anchor_rate"] == pytest.approx(0.25, abs=1e-5)
    assert samp["anchor_ci95"] > 0.0
    # the sampled estimate brackets the full exact within ~3 half-widths
    # (deterministic: fixed hash family, fixed data)
    assert abs(samp["exact_jaccard"] - full["exact_jaccard"]) <= max(
        3 * samp["anchor_ci95"], 0.05
    )
    none = corpus_overlap(a, b, anchor=None).collect()[0]
    assert list(none.asDict()) == cols
    assert none["est_jaccard"] == full["est_jaccard"]
    assert none["exact_jaccard"] is None
    assert none["anchor_rate"] is None
    assert none["anchor_ci95"] is None
    assert none["within_03"] is None
    with pytest.raises(ValueError, match="anchor"):
        corpus_overlap(a, b, anchor="bogus")
    # anchor_rate is validated, not clamped: rate<=0 used to silently
    # become 1/2^20 and rate>1 recorded an effective rate above 1.0
    # while keeping everything (ADVICE r10)
    for bad in (0.0, -0.1, 1.5):
        with pytest.raises(ValueError, match="anchor_rate"):
            corpus_overlap(a, b, anchor="sampled", anchor_rate=bad)
    # ...but only the sampled mode reads it: full/None ignore the arg
    assert (
        corpus_overlap(a, b, anchor="full", anchor_rate=-1.0)
        .collect()[0]["anchor_rate"]
        == 1.0
    )


def test_cross_source_overlap_containment_and_disjoint(spark):
    """A small source whose every passage also appears in a big source
    reads overlap 1.0 (containment, not Jaccard); a disjoint source
    never pairs. 8 tokens per passage → each doc below is exactly two
    passages."""
    words = [f"w{i}" for i in range(16)]
    shared = " ".join(words)  # passages: w0..w7, w8..w15
    other = " ".join(f"x{i}" for i in range(16))
    docs = spark.createDataFrame(
        [
            (1, shared, "big"),
            (2, other, "big"),
            (3, shared, "small"),   # fully contained in big
            (4, " ".join(f"y{i}" for i in range(16)), "lone"),
        ],
        "doc_id long, text string, source string",
    )
    from rastercube_spark.operators.dedup import cross_source_overlap

    rows = {
        (r["src_a"], r["src_b"]): r
        for r in cross_source_overlap(docs).collect()
    }
    assert set(rows) == {("big", "small")}
    r = rows[("big", "small")]
    assert (r["n_shared"], r["n_a"], r["n_b"]) == (2, 4, 2)
    assert r["overlap"] == 1.0


def test_cross_source_overlap_partition_invariant(spark):
    """The matrix is a pure set property of (source, passage) — any
    input partitioning gives identical rows."""
    docs = spark.createDataFrame(
        [
            # i % 5 rotates the text start, i % 3 the source, so some
            # passages repeat across sources and some don't
            (i, " ".join(f"t{j}" for j in range(i % 5, i % 5 + 12)), f"s{i % 3}")
            for i in range(30)
        ],
        "doc_id long, text string, source string",
    )
    from rastercube_spark.operators.dedup import cross_source_overlap

    a = sorted(map(tuple, cross_source_overlap(docs).collect()))
    b = sorted(map(tuple, cross_source_overlap(docs.repartition(7)).collect()))
    assert a == b and len(a) > 0


# --- repeated_spans (qf7) -----------------------------------------------

def test_repeated_spans_merges_overlapping_grams(spark):
    """A 6-token phrase shared by two docs yields TWO overlapping dup
    5-grams per doc which must merge into ONE maximal span of 6 tokens
    (the gaps-and-islands step) — while a doc with the phrase split by
    unique filler keeps two separate spans."""
    from rastercube_spark.operators.dedup import repeated_spans

    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens → grams at pos 1,2
    docs = spark.createDataFrame(
        [
            (1, shared + " unique1 unique2 unique3 unique4"),
            (2, "pre1 pre2 " + shared + " tail1 tail2"),
            (3, "lonely tokens nothing shared here at all ever"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in repeated_spans(docs, k=5).collect()}
    assert set(out) == {1, 2}
    for d in (1, 2):
        assert out[d]["n_spans"] == 1
        assert out[d]["dup_tokens"] == 6
    assert out[1]["dl"] == 10
    assert abs(out[1]["dup_frac"] - 0.6) < 1e-9


def test_repeated_spans_counts_intra_doc_repeats(spark):
    """A phrase pasted twice into ONE doc is a repeat (position-level
    count, suffix-array semantics) — no second document needed; its two
    non-overlapping occurrences stay two spans."""
    from rastercube_spark.operators.dedup import repeated_spans

    phrase = "one two three four five"
    docs = spark.createDataFrame(
        [(1, phrase + " x1 x2 x3 " + phrase),
         (2, "all unique words in this other document entirely")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in repeated_spans(docs, k=5).collect()}
    assert set(out) == {1}
    assert out[1]["n_spans"] == 2
    assert out[1]["dup_tokens"] == 10


def test_repeated_spans_span_boundary_adjacency(spark):
    """Dup grams at pos p and p+k are ADJACENT runs (end of first =
    p+k−1, start of second = p+k): they must merge — the island break
    condition is strictly pos > lag+k−1."""
    from rastercube_spark.operators.dedup import repeated_spans

    # 10-token shared text: all 5-grams dup → one span covering all 10
    shared = "a b c d e f g h i j"
    docs = spark.createDataFrame(
        [(1, shared), (2, shared)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in repeated_spans(docs, k=5).collect()}
    assert out[1]["n_spans"] == 1
    assert out[1]["dup_tokens"] == 10
    assert abs(out[1]["dup_frac"] - 1.0) < 1e-9


# --- sampled_pair_dup_rate (qf9) ----------------------------------------

def test_dup_rate_pair_count_matches_bucket_combinatorics(spark, sf_dir):
    """n_pairs must equal Σ_buckets C(size, 2) for the deterministic
    id-hash bucketing — recomputed independently here."""
    from rastercube_spark.operators.dedup import sampled_pair_dup_rate
    from rastercube_spark.sources.tables import load

    docs = load(spark, sf_dir, "documents")
    n = docs.count()
    b = max(1, n // 8)
    sizes = (
        docs.select(
            (
                F.conv(
                    F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
                    16, 10,
                ).cast("bigint") % b
            ).alias("bucket")
        )
        .groupBy("bucket").count().collect()
    )
    expected = sum(r["count"] * (r["count"] - 1) // 2 for r in sizes)
    rows = sampled_pair_dup_rate(docs, docs_per_bucket=8).collect()
    assert [r["threshold"] for r in rows] == [0.5, 0.8]
    for r in rows:
        assert r["n_pairs"] == expected
        assert 0 <= r["n_dup"] <= r["n_pairs"]


def test_dup_rate_identical_corpus_rate_one(spark):
    """Every doc identical → every sampled pair has Jaccard 1.0 →
    dup_rate 1.0 at every threshold."""
    from rastercube_spark.operators.dedup import sampled_pair_dup_rate

    docs = spark.createDataFrame(
        [(i, "same exact text for every single document") for i in range(40)],
        "doc_id long, text string",
    )
    rows = sampled_pair_dup_rate(docs, docs_per_bucket=8).collect()
    for r in rows:
        assert r["n_pairs"] >= 1
        assert r["n_dup"] == r["n_pairs"]
        assert abs(r["dup_rate"] - 1.0) < 1e-9


def test_dup_rate_shingleless_docs_dilute_but_never_count(spark):
    """Docs too short for a 3-gram shingle (or NULL text) appear in
    n_pairs (the sample is content-independent) but can never be
    counted near-dup — their Jaccard is undefined on both engines."""
    from rastercube_spark.operators.dedup import sampled_pair_dup_rate

    docs = spark.createDataFrame(
        [(i, "ab") for i in range(20)] + [(99, None)],
        "doc_id long, text string",
    )
    rows = sampled_pair_dup_rate(docs, docs_per_bucket=8).collect()
    for r in rows:
        assert r["n_pairs"] >= 1
        assert r["n_dup"] == 0
        assert abs(r["dup_rate"]) < 1e-9


def test_dup_rate_counts_exactly_the_cobucketed_dup_pairs(spark):
    """Invariant: n_dup at threshold t equals the independently-computed
    number of co-bucketed pairs whose exact Jaccard ≥ t — the estimator
    never invents or drops a sampled pair. Corpus: 20 triplet groups of
    identical docs (within-group Jaccard 1.0, cross-group ~0)."""
    from rastercube_spark.operators.dedup import sampled_pair_dup_rate

    n_groups = 20
    docs = spark.createDataFrame(
        [
            (g * 3 + j, f"group {g} text shared alpha beta gamma delta g{g}")
            for g in range(n_groups)
            for j in range(3)
        ],
        "doc_id long, text string",
    )
    b = max(1, (n_groups * 3) // 8)
    buckets = {
        r["doc_id"]: r["bucket"]
        for r in docs.select(
            "doc_id",
            (
                F.conv(
                    F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
                    16, 10,
                ).cast("bigint") % b
            ).alias("bucket"),
        ).collect()
    }
    expected_dups = sum(
        1
        for a in range(n_groups * 3)
        for c in range(a + 1, n_groups * 3)
        if buckets[a] == buckets[c] and a // 3 == c // 3
    )
    rows = {r["threshold"]: r for r in
            sampled_pair_dup_rate(docs, docs_per_bucket=8).collect()}
    # identical docs → Jaccard 1.0 ≥ both thresholds; cross-group pairs
    # share only filler tokens, far below 0.5
    assert rows[0.5]["n_dup"] == expected_dups
    assert rows[0.8]["n_dup"] == expected_dups
