"""BM25 operator semantics on constructed corpora (operators/text.py
bm25_topk): rarity weighting, length normalization, tf saturation, and
partition invariance — the ranking properties the qe5 oracle can't
express as requirements (it only proves engine agreement)."""

from __future__ import annotations

from rastercube_spark.operators.text import bm25_topk


def _corpus(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _scores(df):
    return {r["doc_id"]: (r["n_terms"], r["score"]) for r in df.collect()}


def test_rare_term_outweighs_common(spark):
    """One 'needle' hit (df=1) must outrank one 'hay' hit (df=9) at
    equal tf and document length."""
    filler = " ".join(f"f{i}" for i in range(10))
    rows = [(i, f"hay {filler}") for i in range(9)]
    rows.append((9, f"needle {filler}"))
    out = bm25_topk(_corpus(spark, rows), terms=("hay", "needle"), k=10)
    s = _scores(out)
    assert s[9][1] > s[0][1]


def test_length_normalization_and_tf(spark):
    """Same single term hit: the shorter document scores higher; two
    hits beat one at equal length."""
    rows = [
        (1, "term " + " ".join(f"f{i}" for i in range(4))),    # short, tf 1
        (2, "term " + " ".join(f"f{i}" for i in range(40))),   # long, tf 1
        (3, "term term " + " ".join(f"f{i}" for i in range(3))),  # tf 2
    ]
    s = _scores(bm25_topk(_corpus(spark, rows), terms=("term",), k=10))
    assert s[1][1] > s[2][1]  # shorter wins
    assert s[3][1] > s[1][1]  # more hits win
    assert s[1][0] == s[2][0] == s[3][0] == 1  # n_terms counts DISTINCT terms


def test_multi_term_and_partition_invariance(spark):
    """A doc hitting both terms outranks single-hit docs of the same
    shape, and the exact (score, order) is invariant under input
    partitioning — the fixed-order addition chain at work."""
    filler = " ".join(f"f{i}" for i in range(8))
    rows = [
        (1, f"alpha beta {filler}"),
        (2, f"alpha {filler} x"),
        (3, f"beta {filler} x"),
        (4, filler + " y z"),
    ]
    docs = _corpus(spark, rows)
    a = [tuple(r) for r in bm25_topk(docs, terms=("alpha", "beta")).collect()]
    assert a[0][0] == 1 and a[0][1] == 2  # doc 1, n_terms 2, ranked first
    b = [
        tuple(r)
        for r in bm25_topk(docs.repartition(5), terms=("alpha", "beta")).collect()
    ]
    assert a == b


def test_duplicated_terms_score_once(spark):
    """A repeated query term contributes exactly once (ADVICE r11: the
    fixed-order addition chain would otherwise silently double it —
    only the CLI used to dedup before calling)."""
    filler = " ".join(f"f{i}" for i in range(10))
    rows = [(i, f"hay {filler}") for i in range(5)]
    once = _scores(bm25_topk(_corpus(spark, rows), terms=("hay",), k=5))
    twice = _scores(
        bm25_topk(_corpus(spark, rows), terms=("hay", "hay"), k=5)
    )
    assert once == twice


def test_log_idf_mode_matches_textbook_and_linear_single_term(spark):
    """log_idf=True computes ln((N-df+0.5)/(df+0.5)) (tolerance vs
    python's libm — the documented reason it is NOT the oracle-gated
    form), and single-term rankings agree with the linear variant
    (monotone transform)."""
    import math

    filler = " ".join(f"f{i}" for i in range(10))
    rows = [(i, f"hay {filler}") for i in range(9)]
    rows.append((9, f"needle {filler}"))
    corpus = _corpus(spark, rows)
    lin = bm25_topk(corpus, terms=("needle",), k=10)
    log = bm25_topk(corpus, terms=("needle",), k=10, log_idf=True)
    s_lin, s_log = _scores(lin), _scores(log)
    # same hit set and same (single-term) ranking
    assert list(s_lin) == list(s_log) == [9]
    # the two scores differ exactly by idf -> ln(idf) on the rarity
    # factor: reconstruct and compare within libm tolerance
    n_docs, df = 10.0, 1.0
    ratio = (n_docs - df + 0.5) / (df + 0.5)
    assert s_log[9][1] > 0
    assert abs(s_log[9][1] / s_lin[9][1] - math.log(ratio) / ratio) < 1e-6


def test_token_surprisal_ranks_rare_token_docs_lowest(spark):
    """qf2's operator (token_surprisal): a document of corpus-unique
    gibberish must rank more unusual (lower score) than one built from
    the corpus's common tokens; ties break on doc_id; scores invariant
    under repartition."""
    from rastercube_spark.operators.text import token_surprisal

    common = " ".join(["the cat sat"] * 5)
    rows = [(i, common) for i in range(8)]
    rows.append((8, "zxqv jkwp mmro xxyz aabb ccdd eeff gghh iijj kkll"
                     " mmnn oopp"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = token_surprisal(docs, k=9).collect()
    assert out[0]["doc_id"] == 8  # gibberish = most unusual
    assert out[0]["score"] < out[1]["score"]
    out2 = token_surprisal(docs.repartition(5), k=9).collect()
    assert [(r["doc_id"], r["score"]) for r in out] == [
        (r["doc_id"], r["score"]) for r in out2
    ]


def test_length_histogram_buckets_and_totals(spark):
    """qf3's operator (length_histogram): documents land in the
    [2^k, 2^(k+1)) bucket of their whitespace token count; totals and
    maxima are exact; bucket set covers exactly the occupied powers."""
    from rastercube_spark.operators.text import length_histogram

    def doc(n):  # n whitespace tokens
        return " ".join(f"w{j}" for j in range(n))

    rows = [(0, doc(1)), (1, doc(2)), (2, doc(3)), (3, doc(4)),
            (4, doc(7)), (5, doc(8)), (6, doc(1023)), (7, doc(1024)),
            (8, None)]  # NULL text -> 0 tokens, bucket 0 (edge-harness
            #             catch: the implicit NULL paths diverged)
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["bucket_lo"]: r for r in length_histogram(docs).collect()}
    assert set(out) == {0, 1, 2, 4, 8, 512, 1024}
    assert out[0]["n_docs"] == 1 and out[0]["n_tokens"] == 0
    assert out[0]["max_len"] == 0
    assert out[2]["n_docs"] == 2 and out[2]["n_tokens"] == 5
    assert out[4]["n_docs"] == 2 and out[4]["max_len"] == 7
    assert out[512]["n_docs"] == 1 and out[512]["max_len"] == 1023
    assert out[1024]["n_docs"] == 1 and out[1024]["n_tokens"] == 1024
