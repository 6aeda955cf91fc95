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
# Round 11 changed set — eight entries, the exact diff of
# rastercube_spark.attest.all_hashes() vs the r10 baseline. Seven are
# NEW queries (a NEW query must be attested the round it lands):
# qe2_pq_knn (product-quantized ANN: deterministic per-subspace
# codebooks + integer-LUT ADC shortlist + exact refine),
# qe1_containment_audit (doc-level cross-snapshot containment, the
# per-document drill-down of qd8 — qd6's shingle-keyed topology),
# qe0_embedding_drift (per-label centroid-cosine drift between
# vec_id-parity snapshots: quantized exact-integer components, one
# Summarizer.sum groupBy — the first pyspark.ml vector-aggregation
# user), qe3_source_overlap (cross-source passage-overlap matrix —
# provenance contamination), qe4_embedding_outliers (per-label
# cosine-to-centroid bottom-k — the mislabel audit),
# qe5_bm25_topk (lexical BM25 top-k, linear-idf determinism variant)
# and q77_dedup_within_watermark (time-bounded streaming dedup, batch
# replay of dropDuplicatesWithinWatermark with a recursive-CTE
# oracle). qd8_snapshot_overlap's closure changed because
# corpus_overlap now VALIDATES anchor_rate instead of silently
# clamping (ADVICE r10; the registered query pins anchor='full' so its
# values are unchanged). The bench/CLI work (compact-line overflow
# guard, guest-CPU fix, corpus-overlap verb) touches no closure.
ATTEST_CHANGED: tuple[str, ...] = (
    "qe2_pq_knn",
    "qe1_containment_audit",
    "qe0_embedding_drift",
    "qe3_source_overlap",
    "qe4_embedding_outliers",
    "qe5_bm25_topk",
    "q77_dedup_within_watermark",
    "qd8_snapshot_overlap",
)

# The 42 remaining window slots go oldest-first per tools/
# rotate_window.py's ground-truth reading of the CORRECTNESS_r*
# artifacts: FIRST the ten r8-stale queries at the window's stated
# 2-round maximum (qb3, qb4, qd4, qd6, qd7, qr01, qr03-qr05, qr09 —
# queued "first for r11" last round and honored here, VERDICT r10
# "Next round" #1), then the r9 cohort in the planner's (alphabetical)
# order through q81. Thirteen r9 queries (qb5, qb6, qb7, qb8, qb9,
# qd3, qr02, qr06-qr08, and — displaced when this session's four new
# queries grew ATTEST_CHANGED from 4 to 8 slots — q96, qa9, qb0)
# don't fit and stay frozen at ≤2 rounds old, first in line for r12 —
# with ~4-8 changed + ~42 stale slots over 112 queries the steady
# state keeps every query ≤2 rounds from its last driver attestation.
ATTEST_STALE: tuple[str, ...] = (
    "qb3_mixture_sample",
    "qb4_passage_dedup",
    "qd4_neardup_decontaminate",
    "qd6_ngram_novelty",
    "qd7_split_assign",
    "qr01_windowed_read_fill",
    "qr03_availability_semi_join",
    "qr04_incremental_anti_join",
    "qr05_date_coverage",
    "qr09_chunk_checksum",
    "q01_scan_count",
    "q02_project_filter",
    "q03_in_null_predicates",
    "q17_asof_join",
    "q20_tpch_q1_agg",
    "q22_rollup",
    "q2a_approx_count_distinct",
    "q2b_approx_quantiles",
    "q30_ranking",
    "q31_lag_lead_gapfill",
    "q32_moving_average",
    "q33_running_total",
    "q40_global_topk",
    "q41_per_group_topk",
    "q50_union_all",
    "q51_union_distinct",
    "q52_intersect",
    "q53_except",
    "q60_string_funcs",
    "q61_date_funcs",
    "q62_math_funcs",
    "q64_nodata_case",
    "q66_array_json",
    "q67_categorical_legend",
    "q68_type_reinterpret",
    "q69_landsat_qa",
    "q70_tumbling_window",
    "q71_sliding_window",
    "q72_session_window",
    "q73_watermark_late_data",
    "q74_stateful_dedup",
    "q81_grouped_map_udf",
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
