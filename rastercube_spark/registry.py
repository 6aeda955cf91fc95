"""Query registry: the single source of truth for the declared query
surface (SURVEY.md §2.9).

Every operator the engine claims is registered here with a Spark callable
``(spark, sf_dir) -> DataFrame`` and, when SQL-expressible, the equivalent
DuckDB oracle SQL. ``__spark_entry__.py`` re-exports these to the driver.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}

# --- driver-attestation rotation ----------------------------------------
# The driver's correctness harness attests the FIRST 50 registered queries
# each round (registration order = dict order returned by queries()).
# Registration order used to be import order, which was fragile (ADVICE r3:
# isort would silently reshuffle attestation coverage). It is explicit:
# ATTEST_CHANGED lists every query whose code or emitted values changed
# this round (their prior-round attestations are stale), ATTEST_STALE
# fills the remaining window slots with the queries whose last driver
# attestation is oldest. Queries in neither keep import order after
# these, and MUST be code-frozen.
#
# The contract is now MECHANICALLY ENFORCED (rounds 3 and 4 both shipped
# stale attestations; a comment is not a control — VERDICT r04 #3):
# rastercube_spark/attest.py hashes each query's source CLOSURE (its
# function, its oracle SQL, and every package function/class it
# transitively references — so editing operators/asof.py flags
# q17_asof_join even though queries/joins.py is untouched), and
# tests/test_attestation.py fails naming any query whose closure hash
# differs from the recorded baseline (tests/attest_hashes.json) while
# sitting outside the window and outside ATTEST_EXEMPT. Regenerate the
# baseline with tests/make_attest.py IN THE SAME COMMIT that rotates
# these lists; make_attest refuses to run while the rule is violated.
#
# Round 10 changed set — six entries: five changed closures (the
# exact diff of
# rastercube_spark.attest.all_hashes() vs the r9 baseline): the
# CC driver-finish memory bound is now MEASURED and the gate derived
# (VERDICT r9 "Next round" #3) — operators/graph.py gained the
# per-dtype bytes-per-row constants (SCALING.json cc_finish_rss,
# tools/measure_finish_rss.py) and driver_finish_gate(), and
# min_label_clusters' default resolves through it → qa3/qa4/qb2/qc0
# (the CC users). Plus qd8: corpus_overlap's exact anchor became a
# callable policy (anchor='full'|'sampled'|None with recorded rate +
# binomial CI — VERDICT r9 "Next round" #4); the registered query pins
# anchor='full' and projects the original four columns, so its oracle
# SQL and values are unchanged while the closure (and output of the
# OPERATOR) changed. All five emit the same values as r9; the bench
# artifact-layer work (end-of-run CPU accounting) and the
# rebalance_scan plan assertions changed no closure. qd9 keep-best
# dedup (quality-aware keeper: longest text per near-dup cluster via
# one map-side-combinable argmax aggregate) is NEW this round — first
# attestation; it displaces qb3 from the stale fill below (qb3 stays
# r8-frozen at the 2-round maximum, first in line for r11 with the
# other nine r8 leftovers).
ATTEST_CHANGED: tuple[str, ...] = (
    "qd9_dedup_keep_best",
    "qd8_snapshot_overlap",
    "qa3_dup_clusters",
    "qa4_dedup_keep",
    "qb2_semantic_dedup",
    "qc0_balanced_sample",
)

# The 44 remaining window slots go oldest-first per tools/
# rotate_window.py's ground-truth reading of the CORRECTNESS_r*
# artifacts (VERDICT r9 "Next round" #1): FIRST the twelve r7-stale
# queries at the window's stated 2-round maximum (q82, q91-q95, q99,
# qa1, qa5, qd1, qd2, qd5 — queued "first for r10" last round and
# honored here), then the r8 cohort in the planner's (alphabetical)
# order through qb1 (qb3 displaced by the new qd9 — a NEW query must
# be attested the round it lands). Ten r8 queries (qb3, qb4, qd4, qd6,
# qd7, qr01, qr03-qr05, qr09) don't fit and stay frozen at ≤2 rounds
# old, first in line for r11 — with ~6 changed + 44 stale slots over
# 105 queries the steady state keeps every query ≤2 rounds from its
# last driver attestation.
ATTEST_STALE: tuple[str, ...] = (
    "q82_grouped_agg_udf",
    "q91_exact_dedup",
    "q92_minhash_lsh_pairs",
    "q93_lsh_jaccard",
    "q94_ngram_jaccard_topk",
    "q95_simhash",
    "q99_winnow_fingerprint",
    "qa1_tfidf_topterms",
    "qa5_repetition_filters",
    "qd1_incremental_dedup",
    "qd2_temperature_mixture",
    "qd5_token_drift",
    "q10_inner_equi",
    "q11_broadcast_join",
    "q12_sort_merge_join",
    "q13_left_outer_null",
    "q14_left_semi",
    "q15_left_anti",
    "q16_theta_join",
    "q18_copartitioned_zip",
    "q19_range_join",
    "q21_count_distinct",
    "q23_cube",
    "q24_grouping_sets",
    "q25_having",
    "q26_zonal_stats",
    "q27_argmax_gather",
    "q28_zonal_percentile",
    "q29_salted_agg",
    "q63_qa_bitops",
    "q65_affine_transform",
    "q75_stream_static_join",
    "q76_stream_stream_join",
    "q80_scalar_pandas_udf",
    "q83_chunk_udtf",
    "q90_text_metrics",
    "q97_lsh_knn",
    "q98_cosine_pairs_topk",
    "qa0_multimodal_decode",
    "qa2_ivf_knn",
    "qa6_sequence_packing",
    "qa7_pii_redaction",
    "qa8_frame_sample",
    "qb1_decontaminate",
)

ATTEST_FIRST: tuple[str, ...] = ATTEST_CHANGED + ATTEST_STALE

# Closure-hash changes NOT rotated into the window, each with its
# justification — the auditable escape hatch for shared-helper edits
# that would otherwise force rotating the entire surface. Empty this
# round: the r6 oracle-spelling exemptions (q92/q93/q95/q99 _h32) were
# baselined in r6 and their closures are unchanged since.
ATTEST_EXEMPT: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query implementation and (optionally) its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def _load_all() -> None:
    # Importing the package populates the registry via decorators.
    import rastercube_spark.queries  # noqa: F401


def _ordered(names: dict) -> list[str]:
    head = [n for n in ATTEST_FIRST if n in names]
    rest = [n for n in names if n not in set(ATTEST_FIRST)]
    return head + rest


def queries() -> dict[str, QueryFn]:
    _load_all()
    return {n: _QUERIES[n] for n in _ordered(_QUERIES)}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {n: _ORACLES[n] for n in _ordered(_ORACLES)}
