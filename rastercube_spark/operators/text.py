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
