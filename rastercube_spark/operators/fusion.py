"""Hybrid retrieval rank fusion: a BM25 lexical leg and an exact-cosine
embedding leg over the same corpus, fused by reciprocal-rank fusion
(RRF, Cormack/Clarke/Buettcher SIGIR'09): rrf(d) = Σ_legs 1/(k + rank).

No reference analog (the reference has no retrieval surface at all) —
LLM-pipeline operator: curation and contamination audits routinely ask
for "documents matching THESE terms OR near THIS embedding", and RRF is
the standard scoreless fusion — it needs only each leg's rank, so the
legs' incomparable score scales never meet.

Cross-engine determinism (the qe5/qa2 playbook):
- each leg ranks on its 6-dp-rounded score with a doc-id tie-break;
- the BM25 score uses the linear-idf form and a FIXED-ORDER per-term
  addition chain (term index order — never a float SUM);
- the fused score is 1/(k+lex_rank) + 1/(k+vec_rank) in that fixed
  order — two correctly-rounded IEEE divisions of exact integers and
  one add — rounded to 6 dp before the final ranking, doc-id tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from rastercube_spark.operators.similarity import cosine

# (q_id, terms, query-vector id) — the unit of one hybrid query
Spec = tuple[int, tuple[str, ...], int]


def hybrid_rrf(
    docs: DataFrame,
    emb: DataFrame,
    specs: tuple[Spec, ...],
    k_leg: int = 50,
    k_out: int = 10,
    rrf_k: int = 60,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    ann_leg: bool = False,
    ann_nprobe: int = 8,
    ann_rerank: int = 100,
    dim: int | None = None,
) -> DataFrame:
    """Per-query fused top-``k_out`` over the corpus of documents that
    have BOTH text and an embedding (inner id-join of ``docs`` and
    ``emb``): (q_id, doc_id, rrf, rank, lex_rank, vec_rank). A query's
    own document (doc_id == q_id) is excluded from BOTH legs, so the
    fusion never rewards the trivial self-match. ``lex_rank`` /
    ``vec_rank`` are NULL when the document only surfaced on the other
    leg (RRF's missing-leg contribution is 0).

    Scale shape: the corpus id-join is one keyed equi-join (both sides
    prune to two columns); the lexical leg is qe5's — one base
    projection carries (dl, pre-filtered term array), the explode sees
    only matching terms and carries dl through its groupBy (two
    tokenize passes total, no full-corpus dl join), df and the
    per-(q, term-index) map broadcast; the embedding leg broadcasts
    the |specs|-row query side over one corpus pass (brute-force cosine
    is the recall-1.0 baseline); ``ann_leg=True`` swaps the embedding
    leg onto qf0's IVF×PQ index (VERDICT r12 "Next round" #5 — probe
    ``ann_nprobe`` lists, ADC shortlist, exact refine; pass ``dim=``,
    required in this mode — no driver-side inference), for when the
    brute scan becomes the bound at corpus scale: the shortlist (depth
    max(``ann_rerank``, ``k_leg``), never silently shallower than the
    leg — ADVICE r13) is RE-RANKED BY EXACT COSINE so both legs order
    candidates by the same statistic on non-unit-norm embeddings, and
    the fused top-k rank-overlaps the brute-leg fusion at qf0's gated
    recall (tests/test_fusion.py) while touching only nprobe/n_coarse
    of the corpus on that leg; each leg's per-query top-``k_leg`` is
    a WindowGroupLimit (map-side partial + final — never a whole-leg
    sort in one task, asserted in tests/test_plans.py); the fusion
    itself touches ≤ |specs| × k_leg rows per leg regardless of corpus
    size."""
    spark = docs.sparkSession
    # one corpus: documents that carry both text and an embedding
    corpus = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col)).join(
        emb.select(
            F.col(vec_id_col).alias("doc_id"), F.col(vec_col).alias("_v")
        ),
        "doc_id",
    )

    # --- lexical leg: multi-query BM25 (linear idf, the qe5 contract) ---
    qterm_rows = [
        (q_id, ti, tok)
        for q_id, terms, _ in specs
        for ti, tok in enumerate(dict.fromkeys(terms))
    ]
    max_ti = max(ti for _, ti, _ in qterm_rows)
    all_terms = tuple(dict.fromkeys(tok for _, _, tok in qterm_rows))
    qterms = spark.createDataFrame(qterm_rows, "q_id int, ti int, tok string")

    # r14 (guide §6.2/§2.2): one base projection carries (dl, matched
    # terms) per document — size() and the HOF filter() share the split
    # via codegen subexpression elimination — so the corpus is tokenized
    # twice (stats + tf) instead of four times, and dl rides the tf
    # groupBy instead of shuffling the full-corpus dl relation into a
    # join. Same doubles everywhere (dl is constant per group; max()
    # re-reads it). Mirrors bm25_topk's r14 shape.
    tk = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    base = corpus.select(
        "doc_id",
        F.size(tk).alias("dl"),
        F.filter(tk, lambda t: t.isin(*all_terms)).alias("__mt"),
    )
    st = base.agg(
        (F.sum("dl").cast("double") / F.count("dl").cast("double")).alias(
            "avgdl"
        ),
        F.count("dl").cast("double").alias("n_docs"),
    )
    tf = (
        base.select("doc_id", "dl", F.explode("__mt").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").cast("double").alias("tf"), F.max("dl").alias("dl"))
    )
    dfreq = tf.select("tok").groupBy("tok").agg(
        F.count("*").cast("double").alias("df")
    )
    sc_expr = (
        (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
        * (F.col("tf") * F.lit(k1 + 1.0))
        / (
            F.col("tf")
            + F.lit(k1)
            * (
                F.lit(1.0)
                - F.lit(b)
                + F.lit(b) * (F.col("dl").cast("double") / F.col("avgdl"))
            )
        )
    )
    per_term = (
        tf.join(F.broadcast(dfreq), "tok")
        .crossJoin(F.broadcast(st))
        .join(F.broadcast(qterms), "tok")
        .where(F.col("doc_id") != F.col("q_id"))
        .select("q_id", "ti", "doc_id", sc_expr.alias("sc"))
    )
    total = None
    for i in range(max_ti + 1):
        part = F.coalesce(
            F.max(F.when(F.col("ti") == i, F.col("sc"))), F.lit(0.0)
        )
        total = part if total is None else total + part
    lex_scored = per_term.groupBy("q_id", "doc_id").agg(
        F.round(total, 6).alias("lex_score")
    )
    w_lex = Window.partitionBy("q_id").orderBy(
        F.col("lex_score").desc(), F.col("doc_id")
    )
    lexr = (
        lex_scored.withColumn("lex_rank", F.row_number().over(w_lex))
        .where(F.col("lex_rank") <= k_leg)
        .select("q_id", "doc_id", "lex_rank")
    )

    # --- embedding leg: exact cosine, broadcast query side -------------
    qmap = spark.createDataFrame(
        [(q_id, qvec) for q_id, _, qvec in specs], "q_id int, qvec_id bigint"
    )
    qside = qmap.join(
        emb.select(
            F.col(vec_id_col).alias("qvec_id"), F.col(vec_col).alias("_qv")
        ),
        "qvec_id",
    ).select("q_id", "_qv")
    if ann_leg:
        # qf0's IVF×PQ index instead of the brute scan: same exclusion
        # (the corpus row whose id equals the QUERY id never surfaces —
        # ivfpq_probe's q_id != c_id filter, with q_id the spec id) and
        # the same corpus (docs ∩ emb). The ADC shortlist is RE-RANKED
        # BY EXACT COSINE — the same statistic the brute leg ranks on —
        # so on non-unit-norm embeddings the two legs order candidates
        # identically and the residual divergence really is qf0's
        # coarse-probe recall (which docs never enter the shortlist),
        # not a dot-vs-cosine ordering artifact (ADVICE r13). The
        # shortlist depth is clamped to max(ann_rerank, k_leg): a
        # k_leg deeper than the shortlist would otherwise silently
        # truncate the vector leg (ADVICE r13).
        from rastercube_spark.operators.similarity import ivfpq_knn

        if dim is None:
            raise ValueError(
                "hybrid_rrf(ann_leg=True) needs dim= — the embedding "
                "dimensionality, like every other ANN entry point "
                "(no driver-side inference; VERDICT r13 #6)"
            )
        rerank_eff = max(ann_rerank, k_leg)
        ann_corpus = emb.select(
            F.col(vec_id_col).alias("doc_id"), F.col(vec_col)
        ).join(corpus.select("doc_id"), "doc_id")
        short = ivfpq_knn(
            qside.select("q_id", F.col("_qv").alias("q_vec")),
            ann_corpus,
            dim=dim,
            k=rerank_eff,
            nprobe=ann_nprobe,
            rerank=rerank_eff,
            c_id="doc_id",
            c_vec=vec_col,
        ).select("q_id", "doc_id")
        # bounded |specs|·rerank_eff shortlist: broadcast it back onto
        # the corpus vectors, score by exact cosine, cut to k_leg
        short_scored = (
            emb.select(
                F.col(vec_id_col).alias("doc_id"), F.col(vec_col).alias("_v")
            )
            .join(F.broadcast(short), "doc_id")
            .join(F.broadcast(qside), "q_id")
            .select(
                "q_id",
                "doc_id",
                F.round(cosine(F.col("_qv"), F.col("_v")), 6).alias("cos"),
            )
        )
        w_ann = Window.partitionBy("q_id").orderBy(
            F.col("cos").desc(), F.col("doc_id")
        )
        vecr = (
            short_scored.withColumn("vec_rank", F.row_number().over(w_ann))
            .where(F.col("vec_rank") <= k_leg)
            .select("q_id", "doc_id", "vec_rank")
        )
    else:
        vec_scored = (
            corpus.select("doc_id", "_v")
            .join(F.broadcast(qside))
            .where(F.col("doc_id") != F.col("q_id"))
            .select(
                "q_id",
                "doc_id",
                F.round(cosine(F.col("_qv"), F.col("_v")), 6).alias("cos"),
            )
        )
        w_vec = Window.partitionBy("q_id").orderBy(
            F.col("cos").desc(), F.col("doc_id")
        )
        vecr = (
            vec_scored.withColumn("vec_rank", F.row_number().over(w_vec))
            .where(F.col("vec_rank") <= k_leg)
            .select("q_id", "doc_id", "vec_rank")
        )

    # --- fuse: rrf = 1/(k+lex_rank) + 1/(k+vec_rank), fixed order ------
    fused = lexr.join(vecr, ["q_id", "doc_id"], "full_outer").select(
        "q_id",
        "doc_id",
        "lex_rank",
        "vec_rank",
        F.round(
            F.coalesce(
                F.lit(1.0)
                / (F.lit(rrf_k).cast("double") + F.col("lex_rank").cast("double")),
                F.lit(0.0),
            )
            + F.coalesce(
                F.lit(1.0)
                / (F.lit(rrf_k).cast("double") + F.col("vec_rank").cast("double")),
                F.lit(0.0),
            ),
            6,
        ).alias("rrf"),
    )
    w_out = Window.partitionBy("q_id").orderBy(
        F.col("rrf").desc(), F.col("doc_id")
    )
    return (
        fused.withColumn("rank", F.row_number().over(w_out))
        .where(F.col("rank") <= k_out)
        .select("q_id", "doc_id", "rrf", "rank", "lex_rank", "vec_rank")
        .orderBy("q_id", "rank")
    )
