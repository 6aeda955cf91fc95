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
# Round 9 changed set — six closures (the exact diff of
# rastercube_spark.attest.all_hashes() vs the r8 baseline): the
# qb2/qc0 wall-time work (VERDICT r8 "Next round" #3) — pass-1 CC
# contraction runs on the input's existing partitioning when the
# driver finish is armed (no repartitionByRange sampling job/exchange),
# the driver finish rides Arrow both ways (toPandas + pandas
# createDataFrame), and lsh_cosine_pairs gained a plan-time broadcast
# of the rescore's vector-fetch sides gated on caller-supplied footer
# stats (corpus_rows) → qa3/qa4 (CC users), qb0 (fetch broadcast),
# qb2/qc0 (all three). Plus qa9: its query-side featurization now runs
# on the pre-filtered 5 docs instead of filtering the corpus features
# (a doc_id predicate cannot push through the mapInPandas featurizer
# barrier — the old form paid 2x corpus featurization; vectors
# identical). Plus the r9 under-partitioned-scan sweep: q20's decimal
# aggregation, brute_force_knn's cosine stage (q96/qd3/qa9) and
# lsh_cosine_pairs' hash pass (qb0/qb2/qc0) rebalance single-file
# fixture scans to cluster width before their compute-heavy
# pre-shuffle stages (rebalance_scan — a no-op on many-file
# production scans; decimal sums and per-row hashing are
# order-invariant). All nine emit byte-identical values; no golden
# regeneration needed. The round's GeoTIFF DEFLATE
# work changed no registered closure (the codec feeds ingest/export and
# T-tests, not query plans — verified via the all_hashes diff). qd8
# snapshot-overlap (MinHash corpus-sketch Jaccard estimate + exact
# anchor + tolerance verdict) is NEW this round — first attestation.
ATTEST_CHANGED: tuple[str, ...] = (
    "qd8_snapshot_overlap",
    "q20_tpch_q1_agg",
    "q96_knn_bruteforce",
    "qd3_knn_label_consistency",
    "qa9_media_knn",
    "qa3_dup_clusters",
    "qa4_dedup_keep",
    "qb0_cosine_pairs_lsh",
    "qb2_semantic_dedup",
    "qc0_balanced_sample",
)

# The 45 remaining window slots go oldest-first per tools/
# rotate_window.py's ground-truth reading of the CORRECTNESS_r*
# artifacts (VERDICT r8 "Next round" #2): FIRST the nine r6-stale
# queries at the window's stated 2-round maximum (qb5-qb9, qr02,
# qr06-qr08 — queued "first for r9" last round and honored here), then
# the r7 cohort in planner (alphabetical) order through q81 (the last
# four slots went to the late q20/q96/qd3 rebalance fixes and the new
# qd8 — a NEW query must be attested the round it lands). Twelve r7
# queries (q82, q91-q95, q99, qa1, qa5, qd1, qd2, qd5) don't fit and
# stay frozen at ≤2 rounds old, first in line for r10 — the window
# (50) is just under half the surface (now 104).
ATTEST_STALE: tuple[str, ...] = (
    "qb5_quality_rules",
    "qb6_quantized_knn",
    "qb7_group_sample",
    "qb8_mixture_upsample",
    "qb9_dataset_report",
    "qr02_polygon_mask",
    "qr06_cube_window_agg",
    "qr07_resample_downsample",
    "qr08_reproject_nearest",
    "q01_scan_count",
    "q02_project_filter",
    "q03_in_null_predicates",
    "q17_asof_join",
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
