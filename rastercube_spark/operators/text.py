"""Text-analysis operators for training-data pipelines: token counting,
quality scoring, language ID, fingerprinting. All pure column expressions
(codegen'd); the DuckDB-equivalent SQL fragments live next to the queries
in queries/datapipe.py so both engines compute the identical definition.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny per-language stopword marker sets for the n-gram/stopword heuristic
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "la", "los", "que", "de"),
    "de": ("der", "die", "das", "und", "ist"),
}


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(F.split(F.trim(text), r"\s+"))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish proxy: count of word/number/punct units (regex)."""
    return F.size(F.regexp_extract_all(text, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0))


def punct_ratio(text: Column) -> Column:
    n_punct = F.length(F.regexp_replace(text, r"[^\.,;:!\?]", ""))
    return n_punct / F.greatest(F.length(text), F.lit(1)).cast("double")


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    toks = F.split(F.lower(text), r"\s+")
    markers = LANG_MARKERS[lang]
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*markers)))
    return n_stop / F.greatest(F.size(toks), F.lit(1)).cast("double")


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: length band + stopword presence −
    punctuation excess. Deterministic, SQL-mirrorable."""
    len_ok = F.when((F.length(text) >= 100) & (F.length(text) <= 20000), 0.4).otherwise(0.0)
    stop_ok = F.when(stopword_ratio(text) > 0.01, 0.4).otherwise(0.0)
    punct_pen = F.when(punct_ratio(text) > 0.1, -0.2).otherwise(0.0)
    return F.round(F.lit(0.2) + len_ok + stop_ok + punct_pen, 6)


def lang_guess(text: Column) -> Column:
    """Stopword-marker language ID: pick the language with the most marker
    hits (ties → lexicographic order of language code, 'und' if none).

    Implemented as array_max over (hits, priority) structs — a linear
    expression tree. (A nested when/otherwise chain duplicates its whole
    subtree at every level: 2^n copies of the tokenizer, which blew
    codegen time up to ~13 s per plan before this formulation.)
    """
    toks = F.split(F.lower(text), r"\s+")
    codes = sorted(LANG_MARKERS)
    # priority decreasing in code order: on a hits tie the max struct is
    # the lexicographically-first code
    scored = [
        F.struct(
            F.size(
                F.filter(toks, lambda t: t.isin(*LANG_MARKERS[code]))
            ).alias("hits"),
            F.lit(len(codes) - 1 - i).alias("pri"),
        )
        for i, code in enumerate(codes)
    ]
    best = F.array_max(F.array(*scored))
    code_lookup = F.array(*[F.lit(c) for c in codes])
    # NULL text must be 'und' EXPLICITLY: with hits all NULL, the struct
    # array_max and the `hits <= 0` guard both go NULL and the result
    # falls through to an arbitrary code — and the SQL oracle's CASE
    # chain falls through to a DIFFERENT arbitrary code ('de' vs 'fr',
    # caught by tests/test_edge_corpus.py). Both engines now short-
    # circuit NULL input identically.
    return F.when(text.isNull(), F.lit("und")).otherwise(
        F.when(best["hits"] <= 0, F.lit("und")).otherwise(
            F.element_at(code_lookup, F.lit(len(codes)) - best["pri"])
        )
    )


def bm25_topk(
    docs,
    terms: tuple[str, ...],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    log_idf: bool = False,
):
    """BM25-style lexical top-k retrieval — the keyword leg of the search
    surface next to the embedding kNN family (q96/q97/qa2/qb6/qe2):
    contamination hunts, eval-set leaks and curation audits all start
    with "find the documents that score highest for THESE terms", and at
    100 TB that must be one corpus pass, not an inverted-index service.
    Returns the top ``k`` (doc_id, n_terms, score) rows.

    Scoring is BM25 with one deliberate substitution: the idf factor is
    the LINEAR rarity ratio (N - df + 0.5) / (df + 0.5) instead of its
    logarithm. log() is libm-version-dependent and the driver's gate is
    an exact value hash (the qd2 sqrt-vs-pow lesson, _util.py); the
    linear form is a strictly monotone transform of the standard idf, so
    single-term rankings are identical and multi-term rankings simply
    weight rarity harder. CAVEAT (VERDICT r11): because the per-term
    monotone transform is applied BEFORE the terms are summed, the
    summed multi-term score is NOT order-equivalent to textbook log-idf
    BM25 — on adversarial corpora the two top-k sets can differ (a very
    rare term's linear idf dominates a sum where its log would not).
    ``log_idf=True`` computes the textbook ln((N-df+0.5)/(df+0.5))
    variant for callers that want standard BM25 semantics and can
    tolerate libm-dependent last-bit drift (tolerance-tested against
    the linear form in tests/test_bm25.py; NOT used by the oracle-gated
    qe5, whose driver check is an exact hash). Every other op in the
    score is IEEE +,-,*,/
    on identical inputs — exactly rounded and engine-identical:
    token counts and doc frequencies are exact integers, avgdl is one
    double division of exact sums, and the per-document total is a
    FIXED-ORDER chain of additions over the terms tuple (conditional
    MAX per term, coalesce to 0.0 — never a float SUM, whose order the
    engine may permute). Rounded to 6 dp BEFORE ranking, id tie-break.

    Scale shape (r14, guide §6.2/§2.2): ONE base projection per document
    carries (dl, matched-terms array) — size() and a HOF filter() over
    the same split, evaluated once per row by codegen subexpression
    elimination. avgdl/N aggregate the narrow (doc_id, dl) side of that
    projection; the explode sees ONLY the pre-filtered array (tf rows ≈
    hit docs × terms) and carries dl through the groupBy, so the old
    full-corpus dl relation never shuffles into a join. Two tokenize
    passes over the corpus total (stats + tf) instead of four; df is a
    |terms|-row aggregate that broadcasts back; the global top-k is
    orderBy+limit → TakeOrdered, never a full sort. Tokenization matches
    the shingle convention (lower, trim, split on runs of whitespace)."""
    # A duplicated term must not score twice (ADVICE r11: the fixed-order
    # addition chain below iterates the tuple, so a repeat would silently
    # double that term's contribution; only the CLI used to dedup).
    terms = tuple(dict.fromkeys(terms))
    tk = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(tk).alias("dl"),
        F.filter(tk, lambda t: t.isin(*terms)).alias("__mt"),
    )
    st = base.agg(
        (
            F.sum("dl").cast("double") / F.count("dl").cast("double")
        ).alias("avgdl"),
        F.count("dl").cast("double").alias("n_docs"),
    )
    tf = (
        base.select("doc_id", "dl", F.explode("__mt").alias("tok"))
        .groupBy("doc_id", "tok")
        # dl is constant within a doc's group; max() re-reads it without
        # joining the full-corpus dl relation back in (identical value)
        .agg(F.count("*").cast("double").alias("tf"), F.max("dl").alias("dl"))
    )
    df = tf.select("tok").groupBy("tok").agg(
        F.count("*").cast("double").alias("df")
    )
    rarity = (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (
        F.col("df") + F.lit(0.5)
    )
    if log_idf:
        rarity = F.log(rarity)
    sc = (
        rarity
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
    scored = (
        tf.join(F.broadcast(df), "tok")
        .crossJoin(F.broadcast(st))
        .select("doc_id", "tok", sc.alias("sc"))
    )
    total = None
    for t in terms:
        part = F.coalesce(
            F.max(F.when(F.col("tok") == t, F.col("sc"))), F.lit(0.0)
        )
        total = part if total is None else total + part
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_terms"),
            F.round(total, 6).alias("score"),
        )
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(k)
    )


def token_surprisal(
    docs,
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Per-document unigram typicality audit (the deterministic cousin
    of CCNet's LM-perplexity filter): score each document by the mean
    CORPUS frequency of its own tokens and return the ``k`` most
    unusual (lowest-scoring) documents. A low score means the document
    is built from tokens the corpus rarely uses — gibberish, foreign
    text in a monolingual corpus, encoding damage, or markup — exactly
    the tail an LM-perplexity filter flags, without a model artifact
    or libm call. Returns (doc_id, n_tokens, score), score ascending.

    Determinism: corpus token counts and document lengths are exact
    bigints; a document's raw score is Σ over its token OCCURRENCES of
    corpus_count(token) — an integer SUM (order-free) — and the final
    score divides ONCE by (dl · N_total_tokens), one IEEE division of
    exact integers, rounded to 6 dp before the ordering with a doc_id
    tie-break. (The per-token quotient is never materialized: summing
    quotients would reassociate float error across engines.)

    Scale shape (qa1's topology): one explode feeds a map-side-
    combinable groupBy(token) count; the per-occurrence join back is
    keyed on the token (both sides shuffle on the bounded vocabulary
    key, never on pairs); the total-token scalar broadcasts; the
    global bottom-k is orderBy+limit → TakeOrdered. No reference
    analog — this is LLM-pipeline surface (builder brief)."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        ).alias("tok"),
    )
    cnt = toks.groupBy("tok").agg(
        F.count("*").cast("bigint").alias("c")
    )
    # N_total = total token occurrences — computed MAP-ONLY from
    # size(split()) rather than re-aggregating cnt, which would replay
    # the explode a third time (same exact integer either way)
    total = docs.select(
        F.size(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        ).cast("bigint").alias("dl")
    ).agg(F.sum("dl").cast("double").alias("n_total"))
    return (
        toks.join(cnt, "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum("c").cast("double").alias("c_sum"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            "n_tokens",
            F.round(
                F.col("c_sum")
                / (F.col("n_tokens").cast("double") * F.col("n_total")),
                6,
            ).alias("score"),
        )
        .orderBy("score", "doc_id")
        .limit(k)
    )


def length_histogram(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Sequence-length distribution: documents and tokens per power-of-
    two token-count bucket — the planning query a packing stage (qa6)
    or a context-length decision reads first ("how much of the corpus
    exceeds 4k tokens?"). Returns (bucket_lo, n_docs, n_tokens,
    max_len), one row per occupied bucket, ordered by bucket_lo; a
    document with ``dl`` whitespace tokens lands in the bucket
    [2^floor(log2(dl)), 2^(floor+1)) — computed with bit-shift integer
    arithmetic (no log(), which is libm-dependent), empty docs in
    bucket 0.

    Scale shape: token counts come from size(split(...)) — map-only,
    no explode anywhere — and the histogram is one map-side-combinable
    groupBy over at most ~40 buckets. One scan, one ~40-row shuffle.
    No reference analog — LLM-pipeline surface (builder brief)."""
    # NULL text counts as 0 tokens — bucket 0, contributing 0 to the
    # sums — pinned EXPLICITLY on both sides (the edge-corpus harness
    # caught the implicit forms diverging: Spark's NULL-propagating
    # greatest() fell to the coalesce-0 bucket while DuckDB's CASE fell
    # through to a NULL bucket).
    dl = docs.select(
        F.col(id_col).alias("doc_id"),
        F.coalesce(
            F.size(
                F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
            ).cast("bigint"),
            F.lit(0).cast("bigint"),
        ).alias("dl"),
    )
    # bucket_lo = largest power of two <= dl, computed with pure
    # integer comparisons (no log(), which is libm-dependent): a fixed
    # 40-probe GREATEST chain of CASE WHEN dl >= 2^i THEN 2^i END —
    # engine-identical arithmetic, codegen-friendly, covers dl < 2^40.
    probes = [
        F.when(F.col("dl") >= F.lit(1 << i), F.lit(1 << i).cast("bigint"))
        for i in range(40)
    ]
    bucketed = dl.select(
        "doc_id",
        "dl",
        F.coalesce(F.greatest(*probes), F.lit(0))
        .cast("bigint")
        .alias("bucket_lo"),
    )
    return (
        bucketed.groupBy("bucket_lo")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("dl").cast("bigint").alias("n_tokens"),
            F.max("dl").cast("bigint").alias("max_len"),
        )
        .orderBy("bucket_lo")
    )


def boilerplate_ngrams(
    docs,
    n: int = 3,
    min_df: int = 5,
    k_out: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Boilerplate detection by corpus-frequent word n-grams: an n-gram
    is *boilerplate* when it appears in at least ``min_df`` distinct
    documents (headers, footers, licence blocks, navigation chrome —
    the shared-substring noise a web-scale corpus carries into
    training). Returns the ``k_out`` documents with the highest
    boilerplate share: (doc_id, n_grams, n_boiler, boiler_frac), where
    ``n_grams`` counts the document's DISTINCT n-grams and
    ``boiler_frac = n_boiler / n_grams`` (6-dp rounded, doc-id
    tie-break). Documents with fewer than ``n`` tokens (including NULL
    text) carry no n-gram evidence and are excluded by contract.

    ``min_df`` is an absolute document count, not a corpus fraction —
    the practitioner convention (CCNet/C4-style shared-line filters):
    "appears in K documents" is evidence of templating at any corpus
    size, while a fixed fraction silently stops firing as the corpus
    grows.

    Cross-engine determinism: both counts are exact integers from the
    same tokenize→shingle→distinct definition (lower, trim, split on
    whitespace runs — the shingles_df convention), and the fraction is
    ONE correctly-rounded IEEE division.

    Scale shape: the per-document gram dedup is RELATIONAL — one
    distinct shuffle on (doc_id, gram), the shingles_df(distinct=True)
    topology the rest of the dedup family uses; the document-frequency
    aggregate is one map-side-combinable groupBy(gram); the join back
    to per-document rows is a keyed equi-join against the (small,
    min_df-pruned) heavy set — left unhinted so AQE broadcasts it when
    its runtime size allows and shuffles otherwise; the final top-k is
    TakeOrdered, never a global sort. Nothing is ever pairwise: cost
    is linear in total n-gram occurrences.

    Why NOT array_distinct map-side (the first cut): explode's
    InferFiltersFromGenerate clones the generator child into a
    ``size(e) > 0 AND isnotnull(e)`` filter, and predicate pushdown
    then re-inlines that clone BELOW the rebalance exchange — the
    whole array_distinct(transform(...)) gram build ran ~3×, two of
    them on the single pre-shuffle scan task (measured: qf5 10 s at
    sf0.1; this form 0.12 s). The guard therefore sits on the cheap
    int INDEX sequence (the shingles_df convention) so the cloned
    filter costs an int-array build, and the dedup moved to the
    distinct shuffle. No reference analog."""
    toks_mat = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+").alias("__tk"),
    )
    ntk = F.size("__tk")
    # the CASE guard (on the index sequence: sequence(1, size-n+1)
    # turns DESCENDING for short docs and throws) also excludes
    # sub-n-token and NULL-text documents by contract: no positions,
    # no rows
    idx = F.when(ntk >= F.lit(n), F.sequence(F.lit(1), ntk - (n - 1))).otherwise(
        F.array().cast("array<int>")
    )
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(F.col("__tk"), i + j) for j in range(n)]
        ),
    )
    sh = toks_mat.select("doc_id", F.explode(grams).alias("g")).distinct()
    heavy = (
        sh.groupBy("g")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") >= min_df)
        .select("g")
    )
    boiler = sh.join(heavy, "g").groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_boiler")
    )
    totals = sh.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_grams")
    )
    return (
        totals.join(boiler, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            F.coalesce(F.col("n_boiler"), F.lit(0).cast("bigint")).alias(
                "n_boiler"
            ),
            F.round(
                F.coalesce(F.col("n_boiler"), F.lit(0)).cast("double")
                / F.col("n_grams").cast("double"),
                6,
            ).alias("boiler_frac"),
        )
        .orderBy(F.col("boiler_frac").desc(), "doc_id")
        .limit(k_out)
    )


def chunk_documents(
    docs,
    max_tokens: int = 32,
    stride: int = 24,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Chunk documents into fixed-size token windows — the
    make-training-sequences step that precedes packing (qa6 packs the
    RESULTING pieces into context bins; this produces the pieces from
    documents longer than one context): window ``w`` of a document
    covers tokens [1 + w·stride, 1 + w·stride + max_tokens), windows
    start at every stride-th token UNTIL the previous window has
    already covered the document end, so with stride < max_tokens
    consecutive chunks overlap by (max_tokens − stride) tokens — the
    standard training-window overlap. Returns
    (doc_id, chunk_idx, n_tokens, chunk).

    Contract details a consumer must know: tokens are whitespace runs
    of the RAW text (case and punctuation preserved) and the chunk is
    re-joined with single spaces, so intra-document whitespace is
    normalized; a trailing window shorter than max_tokens is emitted
    for the tail, but NO window starts once an earlier window already
    reached token n (ADVICE r12: the old contract emitted a final
    chunk fully contained in its predecessor — e.g. 10 tokens at
    max=4/stride=3 produced both "t8 t9 t10" and "t10" — redundant
    duplicate training text; start positions now stop at
    min(n, max(n − max_tokens + stride, 1))). With stride ≥ max_tokens
    (gap chunking) windows keep starting while any token remains, as
    before. Documents with no tokens (NULL text) emit no chunks.

    100 TB shape: map-only — the ONLY relational op is the position
    explode, and its generator child is the cheap int
    ``sequence(1, n, stride)``, with the chunk string built AFTER the
    explode (qf5's InferFiltersFromGenerate lesson: the inferred
    size/isnotnull filter clones the generator child below the
    exchange, so the child must never carry the expensive string
    work). Zero shuffles, zero joins; output order is the caller's
    concern. No reference analog — LLM-pipeline surface (builder
    brief)."""
    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")
    if max_tokens < 1:
        raise ValueError(f"max_tokens must be >= 1, got {max_tokens}")
    toks_mat = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.col(text_col), r"\s+").alias("__tk"),
    )
    n = F.size("__tk")
    # Last permitted start: stop once the previous window reached token
    # n (s_prev + max_tokens - 1 >= n ⇔ s > n - max_tokens + stride is
    # contained); the least(n, ·) keeps gap chunking (stride >
    # max_tokens) bounded by the token count as before.
    bound = F.least(
        n, F.greatest(n - F.lit(max_tokens) + F.lit(stride), F.lit(1))
    )
    starts = F.when(
        n >= 1, F.sequence(F.lit(1), bound, F.lit(stride))
    ).otherwise(F.array().cast("array<int>"))
    return (
        toks_mat.select(
            "doc_id", "__tk", n.alias("__n"), F.explode(starts).alias("__s")
        )
        .select(
            "doc_id",
            ((F.col("__s") - 1) / stride).cast("bigint").alias("chunk_idx"),
            F.least(F.lit(max_tokens), F.col("__n") - F.col("__s") + 1)
            .cast("bigint")
            .alias("n_tokens"),
            F.concat_ws(
                " ", F.slice(F.col("__tk"), F.col("__s"), max_tokens)
            ).alias("chunk"),
        )
    )


def char_langid(
    docs,
    profile_size: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
):
    """Corpus-learned character-trigram language ID with a confusion
    matrix against the recorded labels — the standard langid.py/
    fastText-style character-profile approach, self-supervised from the
    corpus's own ``lang`` column: learn each language's top
    ``profile_size`` trigrams, score every document by how many of its
    trigram OCCURRENCES fall in each language's profile, predict the
    argmax. Returns (lang, pred, n_docs) — the confusion matrix, ordered
    — so a curation run reads mislabel rates per language pair at a
    glance. Documents with no trigrams (NULL/too-short text) predict
    'und'. Complements lang_guess (q90's five-stopword marker ID):
    trigram profiles see morphology, not just function words, and need
    no hand-picked marker list.

    Determinism: trigram counts are exact bigints; the profile cut
    breaks ties (count DESC, gram ASC); the prediction argmax breaks
    ties (hits DESC, language code ASC) — no floats anywhere.

    100 TB shape: the train/score double pass is the design (learn the
    profile, then score against it), but NEITHER pass shuffles the
    corpus on a gram-wide key (r15, guide §2.3 — aggregate before you
    shuffle): the TRAIN pass aggregates raw gram occurrences straight
    to (lang, gram) counts (map-side combinable; post-shuffle rows ≈
    n_langs × distinct grams, never × documents), and the SCORE pass
    joins the raw occurrences to the broadcast profile FIRST, so its
    aggregate shuffles pre-combined (doc_id, lang, plang) partials —
    n_langs columns per document instead of a row per distinct
    (doc, gram). The old plan materialized the per-(doc_id, gram)
    count relation as an explicit aggregate in BOTH passes; that
    intermediate is pure shuffle volume — every consumer only ever
    needed it re-aggregated coarser, and Σ over a finer grouping equals
    the direct coarse count exactly (bigints, no floats anywhere).
    """
    from pyspark.sql import Window

    d = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(lang_col).alias("lang"),
        F.lower(F.col(text_col)).alias("__s"),
    )
    n = F.length("__s")
    # raw (doc_id, lang, gram) occurrence rows from ONE explode per
    # pass; the guard keeps sequence() from going descending on texts
    # shorter than 3 chars
    grams = d.select(
        "doc_id",
        "lang",
        F.explode(
            F.when(
                n >= 3,
                F.transform(
                    F.sequence(F.lit(1), n - 2),
                    lambda i: F.col("__s").substr(i, F.lit(3)),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("gram"),
    )
    # per-language profile: top profile_size grams by (count DESC, gram
    # ASC) — counted DIRECTLY at (lang, gram) granularity (identical
    # bigint to the old Σ of per-doc counts) and broadcast back.
    # NULL-labeled documents contribute NO profile (a NULL candidate
    # language would ride into the argmax tie-break, where Spark sorts
    # NULLS FIRST and DuckDB NULLS LAST — a latent engine/oracle
    # divergence); they are still scored against the labeled languages'
    # profiles and land in their own NULL-label confusion rows.
    w_prof = Window.partitionBy("plang").orderBy(
        F.col("pc").desc(), F.col("gram")
    )
    prof = (
        grams.where(F.col("lang").isNotNull())
        .groupBy(F.col("lang").alias("plang"), "gram")
        .agg(F.count("*").cast("bigint").alias("pc"))
        .withColumn("prn", F.row_number().over(w_prof))
        .where(F.col("prn") <= profile_size)
        .select("plang", "gram")
    )
    # score: hits per (doc, candidate language) = number of the doc's
    # trigram OCCURRENCES that sit in that language's profile — the
    # broadcast join fans each occurrence to its profile languages and
    # the count aggregates map-side; the label rides along
    # (functionally dependent on doc_id) so the confusion cell needs no
    # join back to the corpus
    hits = (
        grams.join(F.broadcast(prof), "gram")
        .groupBy("doc_id", "lang", "plang")
        .agg(F.count("*").cast("bigint").alias("h"))
    )
    w_pred = Window.partitionBy("doc_id").orderBy(
        F.col("h").desc(), F.col("plang")
    )
    # Confusion cells including the 'und' default (no trigrams, or no
    # profile hit) in ONE aggregation over a weighted union: every doc
    # contributes an ('und', +1) marker from a column-pruned lang scan;
    # every PREDICTED doc contributes (pred, +1) and ('und', −1) from a
    # single 2-row explode of the window output — so und(lang) =
    # n_lang − n_predicted(lang) without ever joining the corpus to its
    # own predictions (the naive left-join formulation plans a
    # sort-merge of two corpus-sized relations) and without consuming
    # any expensive relation twice (each extra consumer of the window
    # output would replay the trigram explode end-to-end).
    pred_w = (
        hits.withColumn("rn", F.row_number().over(w_pred))
        .where(F.col("rn") == 1)
        .select(
            "lang",
            F.explode(
                F.array(
                    F.struct(
                        F.col("plang").alias("pred"), F.lit(1).alias("w")
                    ),
                    F.struct(
                        F.lit("und").alias("pred"), F.lit(-1).alias("w")
                    ),
                )
            ).alias("pw"),
        )
        .select("lang", F.col("pw.pred").alias("pred"), F.col("pw.w").alias("w"))
    )
    marker = docs.select(
        F.col(lang_col).alias("lang"),
        F.lit("und").alias("pred"),
        F.lit(1).alias("w"),
    )
    return (
        pred_w.unionByName(marker)
        .groupBy("lang", "pred")
        .agg(F.sum("w").cast("bigint").alias("n_docs"))
        .where(F.col("n_docs") > 0)
        .orderBy("lang", "pred")
    )


def template_prefixes(
    docs,
    k_tokens: int = 8,
    min_docs: int = 2,
    k_out: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
):
    """Per-source repeated document PREFIXES — crawler/template header
    detection: documents from the same source that open with the same
    first ``k_tokens`` tokens almost always share an injected scaffold
    (navigation header, license banner, boilerplate preamble) that
    should be stripped before training. Complements qf5
    (boilerplate_ngrams: corpus-wide repeated interior n-grams) — this
    keys on the DOCUMENT OPENING and attributes it to a source. Returns
    (source, prefix, n_docs, frac) for prefixes shared by at least
    ``min_docs`` documents of their source, top ``k_out`` by
    (n_docs DESC, source, prefix), frac = share of the source's docs.

    Determinism: counts are exact bigints; frac is one 6-dp IEEE
    division; ordering is fully tie-broken.

    100 TB shape: MAP-ONLY prefix extraction (array_join of a slice —
    no explode at all), ONE groupBy keyed (source, prefix) with
    map-side combine, per-source totals as a second tiny keyed agg
    joined back on source, TakeOrdered for the top-k. The corpus never
    shuffles on anything but (source, prefix).
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(source_col).alias("source"),
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+").alias("__tk"),
    )
    pre = toks.select(
        "source",
        F.when(
            F.col("__tk").isNotNull() & (F.size("__tk") >= 1),
            F.array_join(F.slice("__tk", 1, k_tokens), " "),
        ).alias("prefix"),
    ).where(F.col("prefix").isNotNull())
    per_prefix = pre.groupBy("source", "prefix").agg(
        F.count("*").cast("bigint").alias("n_docs")
    )
    per_source = pre.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_src")
    )
    return (
        per_prefix.where(F.col("n_docs") >= min_docs)
        .join(per_source, "source")
        .select(
            "source",
            "prefix",
            "n_docs",
            F.round(
                F.col("n_docs") / F.col("n_src").cast("double"), 6
            ).alias("frac"),
        )
        .orderBy(F.col("n_docs").desc(), "source", "prefix")
        .limit(k_out)
    )


CODE_KEYWORDS: tuple[str, ...] = (
    "def", "return", "import", "class", "function", "var", "const",
    "void", "int", "public",
)


def code_detect(
    docs,
    sym_min: float = 0.03,
    indent_min: float = 0.15,
    kw_min: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
):
    """Code-vs-prose detection by character-class signals — the
    "how much of this source is source code" report a mixture designer
    reads before setting code/prose ratios (and before pointing a
    prose-quality filter like qb5 at a code-heavy scrape, where it
    would reject everything): per document a symbol-character ratio
    ({}()[];=<>#|&*), an indented-line fraction (lines opening with a
    tab or two spaces) and a code-keyword token count; a document is
    code when symbols AND indentation clear their floors, or keywords
    alone do. Returns (source, n_docs, n_code, code_frac) per source,
    ordered. Documents with NULL text are excluded.

    Determinism: counts are exact integers; the two ratios are single
    IEEE divisions compared against literal floors; code_frac is one
    6-dp division. The symbol class, line-split and keyword list are
    spelled identically in the SQL oracle.

    100 TB shape: every signal is a map-only column expression
    (regexp_replace length, a line split + filter, a token filter —
    no explode); the ONLY shuffle is the per-source count aggregate,
    map-side combinable, |sources| rows out.
    """
    t = F.col(text_col)
    n_chars = F.greatest(F.length(t), F.lit(1)).cast("double")
    n_sym = F.length(F.regexp_replace(t, r"[^{}()\[\];=<>#|&*]", ""))
    sym_ratio = n_sym / n_chars
    lines = F.split(t, "\n")
    n_lines = F.greatest(F.size(lines), F.lit(1)).cast("double")
    n_indent = F.size(F.filter(lines, lambda l: l.rlike(r"^(\t|  )")))
    indent_frac = n_indent / n_lines
    toks = F.split(F.lower(t), r"\s+")
    kw = F.size(F.filter(toks, lambda x: x.isin(*CODE_KEYWORDS)))
    is_code = (
        (sym_ratio >= F.lit(sym_min)) & (indent_frac >= F.lit(indent_min))
    ) | (kw >= F.lit(kw_min))
    return (
        docs.where(t.isNotNull())
        .select(
            F.col(source_col).alias("source"),
            is_code.cast("int").alias("__c"),
        )
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("__c").cast("bigint").alias("n_code"),
        )
        .select(
            "source",
            "n_docs",
            "n_code",
            F.round(
                F.col("n_code") / F.col("n_docs").cast("double"), 6
            ).alias("code_frac"),
        )
        .orderBy("source")
    )
