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
# Round 8 changed set — two causes, six closures (the exact diff of
# rastercube_spark.attest.all_hashes() vs the r7 baseline):
# (a) the CC contraction work — min_label_clusters gained the
# partition-local union-find star-contraction pre-pass and the
# size-gated driver finish (operators/graph.py; label-invariant,
# values unchanged) → qa3/qa4/qb2/qc0; lsh_cosine_pairs's
# shuffle-partitions parse got the guarded fallback (ADVICE r7) →
# qb0 (plus the CC users); qb2/qc0 additionally moved their plane
# sizing from a per-invocation e.count() job to parquet-footer
# statistics (sources/tables.py table_rows — same number, no extra
# scan job). (b) qd4's exact-Jaccard verify now semi-joins train down
# to candidate ids before the distinct shingle relation (ADVICE r7
# medium — the verify stage no longer shuffles the full corpus's
# widest relation). All six emit byte-identical values; no golden
# regeneration needed. Plus two NEW queries (first attestation): qd6
# n-gram novelty (per-doc fraction of corpus-unique shingles — the
# memorization/boilerplate audit) and qd7 deterministic stratified
# train/val/test split assignment (salted-md5 cumulative thresholds —
# growth-stable, leakage-safe).
ATTEST_CHANGED: tuple[str, ...] = (
    "qd6_ngram_novelty",
    "qd7_split_assign",
    "qa3_dup_clusters",
    "qa4_dedup_keep",
    "qb0_cosine_pairs_lsh",
    "qb2_semantic_dedup",
    "qc0_balanced_sample",
    "qd4_neardup_decontaminate",
)

# The 42 remaining window slots go oldest-first per tools/
# rotate_window.py's ground-truth reading of the CORRECTNESS_r*
# artifacts (VERDICT r7 "Next round" #1): the six r5 stragglers a
# 50-slot window could not fit last round (qa7, qr01, qr03-qr05, qr09 —
# queued "first in line for r08" and honored here), then the r6 cohort
# in planner order. Nine r6 queries (qb5-qb9, qr02, qr06-qr08; qb5/qb6
# displaced by the two new qd* slots) don't fit and stay frozen at
# ≤2 rounds old, first in line for r09 — the window (50) is just under
# half the surface (103).
ATTEST_STALE: tuple[str, ...] = (
    "qa7_pii_redaction",
    "qr01_windowed_read_fill",
    "qr03_availability_semi_join",
    "qr04_incremental_anti_join",
    "qr05_date_coverage",
    "qr09_chunk_checksum",
    "q10_inner_equi",
    "q11_broadcast_join",
    "q12_sort_merge_join",
    "q13_left_outer_null",
    "q14_left_semi",
    "q15_left_anti",
    "q16_theta_join",
    "q18_copartitioned_zip",
    "q19_range_join",
    "q20_tpch_q1_agg",
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
    "q96_knn_bruteforce",
    "q97_lsh_knn",
    "q98_cosine_pairs_topk",
    "qa0_multimodal_decode",
    "qa2_ivf_knn",
    "qa6_sequence_packing",
    "qa8_frame_sample",
    "qa9_media_knn",
    "qb1_decontaminate",
    "qb3_mixture_sample",
    "qb4_passage_dedup",
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
