"""Sampling-operator properties (operators/sampling.py): determinism
under re-partitioning (the whole point of hash sampling — a reservoir
or rand() sample can't promise this), exactness of the two-level
group top-k, threshold nesting, and upsampling multiplicity bounds."""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from rastercube_spark.operators.sampling import (
    group_sample,
    hash_draw,
    mixture_sample,
    mixture_upsample,
    rate_to_hex_threshold,
)
from rastercube_spark.sources.tables import load


def _ids(df):
    return sorted(r["doc_id"] for r in df.select("doc_id").collect())


def test_mixture_sample_nested_rates(spark, sf_dir):
    """Thresholds nest, so samples nest: the rate-0.25 sample is a
    subset of the rate-0.5 sample is a subset of the corpus — the
    property that lets a pipeline tighten a mixture WITHOUT churning
    which rows survive (draw < t1 < t2 ⇒ kept@t1 ⊆ kept@t2)."""
    d = load(spark, sf_dir, "documents")

    def rates(rate):
        return d.select("source").distinct().select(
            "source", F.lit(rate_to_hex_threshold(rate)).alias("thr")
        )

    k25 = set(_ids(mixture_sample(d, rates(0.25))))
    k50 = set(_ids(mixture_sample(d, rates(0.5))))
    assert k25 < k50
    assert len(k50) < d.count()


def test_mixture_sample_partition_invariant(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    rates = d.select("source").distinct().select(
        "source", F.lit(rate_to_hex_threshold(0.5)).alias("thr")
    )
    a = _ids(mixture_sample(d, rates))
    b = _ids(mixture_sample(d.repartition(13), rates))
    assert a == b


def test_group_sample_two_level_equals_naive(spark, sf_dir):
    """The scale formulation (per-hex-digit pre-top-k, then true top-k)
    must equal the naive single window EXACTLY — it is an execution
    strategy, not an approximation."""
    d = load(spark, sf_dir, "documents")
    got = group_sample(d, k=5).select("doc_id", "source", "sample_rank")
    w = Window.partitionBy("source").orderBy(
        hash_draw(F.col("doc_id"), "samp:"), "doc_id"
    )
    naive = (
        d.withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= 5)
        .select("doc_id", "source", "sample_rank")
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, naive.collect())
    )


def test_group_sample_exact_k_and_invariant(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    s = group_sample(d, k=5)
    per = {r["source"]: r["n"] for r in
           s.groupBy("source").agg(F.count("*").alias("n")).collect()}
    # fixture sources all have >= 5 docs, so every group yields exactly k
    assert per and all(n == 5 for n in per.values())
    a = sorted(map(tuple, s.select("doc_id", "source").collect()))
    b = sorted(map(tuple,
        group_sample(d.repartition(13), k=5).select("doc_id", "source").collect()))
    assert a == b


def test_mixture_upsample_multiplicity_bounds(spark, sf_dir):
    """Every row appears n_base or n_base+1 times, copy indices are
    contiguous from 0, and the realized fractional share sits strictly
    between none and all (the draw actually splits the corpus)."""
    d = load(spark, sf_dir, "documents")
    weights = d.select("source").distinct().select(
        "source",
        F.lit(2).alias("n_base"),
        F.lit(rate_to_hex_threshold(0.5)).alias("thr"),
    )
    up = mixture_upsample(d, weights)
    per = (
        up.groupBy("doc_id")
        .agg(F.count("*").alias("n"), F.max("copy").alias("mx"))
        .collect()
    )
    assert all(r["n"] in (2, 3) and r["mx"] == r["n"] - 1 for r in per)
    n3 = sum(1 for r in per if r["n"] == 3)
    assert 0 < n3 < len(per)


def test_flatten_rates_sqrt_mixture(spark):
    """qd2's rate computation: the smallest source keeps everything
    (threshold 'g'), larger sources keep sqrt(n_min/n), so realized
    counts flatten toward sqrt(n) — checked within binomial noise on a
    deterministic synthetic corpus."""
    from rastercube_spark.operators.sampling import (
        flatten_rates,
        mixture_sample,
    )

    sizes = {"small": 200, "mid": 800, "big": 3200}
    rows = [
        (f"{s}-{i}", s) for s, n in sizes.items() for i in range(n)
    ]
    df = spark.createDataFrame(rows, "doc_id string, source string")
    counts = df.groupBy("source").agg(F.count("*").alias("n"))
    rates = {r["source"]: r["thr"] for r in flatten_rates(counts).collect()}
    assert rates["small"] == "g"  # keep-all
    assert rates["mid"] < rates["small"] and rates["big"] < rates["mid"]
    kept = (
        mixture_sample(df, flatten_rates(counts), key="doc_id", salt="t:")
        .groupBy("source")
        .count()
        .collect()
    )
    got = {r["source"]: r["count"] for r in kept}
    assert got["small"] == 200
    # expected sqrt(n_min*n): mid 400, big 800; binomial sd ~ 20/28
    assert abs(got["mid"] - 400) < 80, got
    assert abs(got["big"] - 800) < 110, got


def test_flatten_rates_deterministic_under_repartition(spark):
    from rastercube_spark.operators.sampling import (
        flatten_rates,
        mixture_sample,
    )

    rows = [(f"d{i}", f"s{i % 3}") for i in range(900)]
    df = spark.createDataFrame(rows, "doc_id string, source string")
    counts = df.groupBy("source").agg(F.count("*").alias("n"))

    def run(frame):
        out = mixture_sample(frame, flatten_rates(counts), key="doc_id",
                             salt="t:")
        return sorted(r["doc_id"] for r in out.collect())

    assert run(df) == run(df.repartition(17, "doc_id"))


def test_split_assign_growth_and_partition_invariant(spark, sf_dir):
    """A doc's split is a pure function of its id: the assignment must
    be identical on the full corpus, on any subset (corpus GROWTH never
    migrates a doc across the leakage boundary — the property
    randomSplit lacks), and at any partitioning. Rates land near 90/5/5
    and every split is non-empty on the fixture."""
    from rastercube_spark.operators.sampling import split_assign
    from rastercube_spark.sources.tables import load

    d = load(spark, sf_dir, "documents")
    splits = [("train", 0.9), ("val", 0.05), ("test", 0.05)]
    full = {
        r["doc_id"]: r["split"]
        for r in split_assign(d, splits).select("doc_id", "split").collect()
    }
    sub = {
        r["doc_id"]: r["split"]
        for r in split_assign(d.where(F.col("doc_id") % 3 == 0), splits)
        .repartition(7)
        .select("doc_id", "split")
        .collect()
    }
    assert sub == {k: v for k, v in full.items() if k % 3 == 0}
    n = len(full)
    counts = {s: sum(1 for v in full.values() if v == s) for s in ("train", "val", "test")}
    assert counts["train"] > 0.8 * n and counts["val"] > 0 and counts["test"] > 0
    assert sum(counts.values()) == n


def test_split_assign_single_split_and_validation(spark, sf_dir):
    import pytest

    from rastercube_spark.operators.sampling import split_assign
    from rastercube_spark.sources.tables import load

    d = load(spark, sf_dir, "documents")
    only = split_assign(d, [("all", 1.0)]).select("split").distinct().collect()
    assert [r["split"] for r in only] == ["all"]
    with pytest.raises(ValueError):
        split_assign(d, [])


# --- token_budget_select (qf8) ------------------------------------------

def _naive_budget_select(docs, stopwords, budget):
    """The oracle's naive semantics, spelled directly in pyspark: one
    running sum over EVERY doc of a source (test-only — this is the
    formulation the scale path must reproduce, not the one it runs)."""
    toks = F.split(F.lower(F.col("text")), r"\s+")
    dl = F.size(toks).cast("bigint")
    hits = F.size(F.filter(toks, lambda t: t.isin(*stopwords))).cast("bigint")
    base = docs.select(
        "doc_id", "source", dl.alias("dl"),
        F.floor(F.lit(1000000.0) * hits / dl).cast("bigint").alias("score"),
    ).where(F.col("dl") >= 1)
    w = (
        Window.partitionBy("source")
        .orderBy(F.desc("score"), "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sel = base.withColumn("cum", F.sum("dl").over(w)).where(F.col("cum") <= budget)
    return (
        sel.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_sel"),
            F.sum("dl").cast("bigint").alias("tok_sel"),
            F.min("score").cast("bigint").alias("cutoff_score"),
        )
        .orderBy("source")
    )


def test_token_budget_histogram_equals_naive(spark, sf_dir):
    """The histogram-threshold plan must reproduce the naive per-source
    running-sum selection EXACTLY — whole classes under budget plus the
    boundary-class doc_id prefix is the same row set."""
    from rastercube_spark.operators.sampling import token_budget_select
    from rastercube_spark.operators.text import LANG_MARKERS
    from rastercube_spark.sources.tables import load

    docs = load(spark, sf_dir, "documents")
    for budget in (100, 600, 10**9):
        got = token_budget_select(
            docs, LANG_MARKERS["en"], budget
        ).collect()
        want = _naive_budget_select(docs, LANG_MARKERS["en"], budget).collect()
        assert [tuple(r) for r in got] == [tuple(r) for r in want], budget


def test_token_budget_edges(spark):
    """Boundary edge cases: a first doc alone over budget selects
    nothing for its source; zero-token (empty-split never occurs — a
    ''-token doc has dl 1) and NULL-text docs are excluded; a budget
    hit EXACTLY at a class edge takes the class whole."""
    from rastercube_spark.operators.sampling import token_budget_select

    docs = spark.createDataFrame(
        [
            # src_a: one 12-token doc, budget 10 → nothing selected
            (1, "src_a", "the " * 11 + "end"),
            # src_b: three docs of 5 tokens, distinct scores via
            # stopword counts 5,4,3 → budget 10 takes exactly two
            (2, "src_b", "the the the the the"),
            (3, "src_b", "the the the the x"),
            (4, "src_b", "the the the x x"),
            (5, "src_c", None),
        ],
        "doc_id long, source string, text string",
    )
    out = {
        r["source"]: r
        for r in token_budget_select(docs, ("the",), 10).collect()
    }
    assert "src_a" not in out
    assert "src_c" not in out
    assert out["src_b"]["n_sel"] == 2
    assert out["src_b"]["tok_sel"] == 10
    assert out["src_b"]["cutoff_score"] == 800000


def test_token_budget_equivalence_random_corpora(spark):
    """Property: histogram-threshold selection ≡ naive running-sum
    selection on adversarial random corpora (score ties, one-doc
    sources, exact-boundary budgets). Corpora are generated with a
    seeded RNG driver-side — deterministic, hypothesis-style without
    per-example Spark-session churn."""
    import random

    from rastercube_spark.operators.sampling import token_budget_select

    rng = random.Random(1234)
    stop = ("the", "a")
    for trial in range(4):
        rows = []
        n_docs = rng.randint(5, 60)
        for i in range(n_docs):
            src = f"s{rng.randint(0, 4)}"
            dl = rng.randint(1, 12)
            # force heavy score ties: few distinct stopword counts
            n_stop = rng.randint(0, min(2, dl))
            toks = ["the"] * n_stop + [f"w{rng.randint(0, 3)}"] * (dl - n_stop)
            rng.shuffle(toks)
            rows.append((i, src, " ".join(toks)))
        docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
        budget = rng.choice([1, 7, 20, 10**6])
        got = token_budget_select(docs, stop, budget).collect()
        want = _naive_budget_select(docs, stop, budget).collect()
        assert [tuple(r) for r in got] == [tuple(r) for r in want], (
            trial, budget, rows,
        )


def test_source_score_percentiles_matches_naive_random_corpora(spark):
    """Property (qg5): the histogram-quantile plan equals the naive
    sorted-position definition — k-th smallest score, k = ceil(p·n) —
    on adversarial random corpora (heavy score ties, one-doc sources,
    n where ceil(p·n) lands exactly on class boundaries). Corpora are
    seeded-RNG driver-side, the naive answer computed in pure Python."""
    import math
    import random

    from rastercube_spark.operators.sampling import source_score_percentiles

    rng = random.Random(4321)
    stop = ("the", "a")
    for trial in range(4):
        rows = []
        n_docs = rng.randint(4, 64)
        for i in range(n_docs):
            src = f"s{rng.randint(0, 3)}"
            dl = rng.randint(1, 10)
            n_stop = rng.randint(0, min(3, dl))
            toks = ["the"] * n_stop + [f"w{rng.randint(0, 2)}"] * (dl - n_stop)
            rng.shuffle(toks)
            rows.append((i, src, " ".join(toks)))
        docs = spark.createDataFrame(
            rows, "doc_id long, source string, text string"
        )
        got = {r["source"]: r for r in
               source_score_percentiles(docs, stop).collect()}
        # naive: per-source sorted score list, element at ceil(p*n)
        by_src: dict[str, list[int]] = {}
        for _i, src, text in rows:
            tk = text.lower().split()
            sc = math.floor(1e6 * sum(t in stop for t in tk) / len(tk))
            by_src.setdefault(src, []).append(sc)
        for src, scores in by_src.items():
            scores.sort()
            n = len(scores)
            want = (n, scores[(n + 3) // 4 - 1], scores[(n + 1) // 2 - 1],
                    scores[(n * 3 + 3) // 4 - 1])
            r = got[src]
            assert (r["n_docs"], r["p25"], r["p50"], r["p75"]) == want, (
                trial, src, scores,
            )
        assert set(got) == set(by_src)


def test_source_score_percentiles_contract(spark):
    """qg5 edges: single-doc source collapses all quartiles to its
    score; NULL text is excluded; out-of-range / duplicate percentile
    sets refuse loudly."""
    import pytest as _pytest

    from rastercube_spark.operators.sampling import source_score_percentiles

    docs = spark.createDataFrame(
        [
            (1, "sA", "the the a"),       # score floor(1e6*3/3) = 1000000
            (2, "sB", None),              # excluded
            (3, "sB", "x y z the"),       # score 250000
        ],
        "doc_id long, source string, text string",
    )
    out = {r["source"]: r for r in
           source_score_percentiles(docs, ("the", "a")).collect()}
    assert out["sA"]["n_docs"] == 1
    assert (out["sA"]["p25"], out["sA"]["p50"], out["sA"]["p75"]) == (
        1000000, 1000000, 1000000,
    )
    assert out["sB"]["n_docs"] == 1 and out["sB"]["p50"] == 250000
    with _pytest.raises(ValueError, match="outside"):
        source_score_percentiles(docs, ("the",), ps=(0.0, 0.5))
    with _pytest.raises(ValueError, match="outside"):
        source_score_percentiles(docs, ("the",), ps=(1.5,))
    with _pytest.raises(ValueError, match="duplicate"):
        source_score_percentiles(docs, ("the",), ps=(0.5, 0.5))
    with _pytest.raises(ValueError, match="at least one"):
        source_score_percentiles(docs, ("the",), ps=())


def test_source_score_percentiles_arbitrary_p_matches_naive(spark):
    """VERDICT r13 #5: the rank arithmetic generalizes to ANY rational
    p — k = ceil(p·n) with p the exact fraction of the decimal
    literal, selected via the division-free cross-multiplied
    histogram condition. Property-check p ∈ {0.1, 0.9, 0.99} (plus
    p=1.0 → the max) against the naive per-source sort on tie-heavy
    seeded corpora, including n where ceil(p·n) lands exactly on a
    class boundary; column names derive from 100·p."""
    import math
    import random
    from fractions import Fraction

    from rastercube_spark.operators.sampling import source_score_percentiles

    ps = (0.1, 0.9, 0.99, 1.0)
    names = ("p10", "p90", "p99", "p100")
    rng = random.Random(987)
    stop = ("the", "a")
    for trial in range(4):
        rows = []
        n_docs = rng.randint(4, 80)
        for i in range(n_docs):
            src = f"s{rng.randint(0, 2)}"
            dl = rng.randint(1, 6)
            n_stop = rng.randint(0, min(2, dl))  # heavy score ties
            toks = ["the"] * n_stop + ["w"] * (dl - n_stop)
            rng.shuffle(toks)
            rows.append((i, src, " ".join(toks)))
        docs = spark.createDataFrame(
            rows, "doc_id long, source string, text string"
        )
        out = source_score_percentiles(docs, stop, ps=ps)
        assert out.columns == ["source", "n_docs", *names]
        got = {r["source"]: r for r in out.collect()}
        by_src: dict[str, list[int]] = {}
        for _i, src, text in rows:
            tk = text.lower().split()
            sc = math.floor(1e6 * sum(t in stop for t in tk) / len(tk))
            by_src.setdefault(src, []).append(sc)
        for src, scores in by_src.items():
            scores.sort()
            n = len(scores)
            for p, name in zip(ps, names):
                fr = Fraction(repr(float(p)))
                k = -(-fr.numerator * n // fr.denominator)  # ceil(p·n)
                assert got[src][name] == scores[k - 1], (
                    trial, src, p, n, scores,
                )
