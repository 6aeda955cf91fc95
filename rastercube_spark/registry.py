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
# Round 5 changed set: qr07 (integer sum_v/n_src output), q2a/q2b (new
# exact-anchor + tolerance-verdict outputs, now fully oracled), qb0
# (new), qa2 (trained IVF centroids), q17 + q22 (re-attested after the
# r04 contract breaches — ADVICE r04), q70–q74 + q17 (shared events
# loader rewritten for the Spark 4.1 native TIMESTAMP_NANOS read), and
# the datapipe queries reading documents through the changed
# rebalance_scan.
ATTEST_CHANGED: tuple[str, ...] = (
    "qr07_resample_downsample",
    "q17_asof_join",
    "q22_rollup",
    "q2a_approx_count_distinct",
    "q2b_approx_quantiles",
    "qb0_cosine_pairs_lsh",
    "qa2_ivf_knn",
    "q70_tumbling_window",
    "q71_sliding_window",
    "q72_session_window",
    "q73_watermark_late_data",
    "q74_stateful_dedup",
    "q90_text_metrics",
    "q91_exact_dedup",
    "q92_minhash_lsh_pairs",
    "q93_lsh_jaccard",
    "q94_ngram_jaccard_topk",
    "q95_simhash",
    "q99_winnow_fingerprint",
    "qa0_multimodal_decode",
    "qa1_tfidf_topterms",
    "qa3_dup_clusters",
    "qa4_dedup_keep",
    "qa5_repetition_filters",
    "qa6_sequence_packing",
    "qa7_pii_redaction",
    "qa8_frame_sample",
    "qa9_media_knn",
    "q83_chunk_udtf",
    "qb1_decontaminate",
    "qb2_semantic_dedup",
)

# Stalest standing attestations: everything last attested in round 2
# (q30–q33, q40/q41, q50–q53, q60), then the oldest round-3 rows —
# the raster query family, q21, and the grouped-UDF pair.
ATTEST_STALE: tuple[str, ...] = (
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
    # q21_count_distinct yielded its slot to qb2_semantic_dedup (same
    # pattern as q10/q13 below); frozen-valid, exempt-listed.
    "q81_grouped_map_udf",
    "q82_grouped_agg_udf",
    "qr01_windowed_read_fill",
    "qr03_availability_semi_join",
    "qr04_incremental_anti_join",
    "qr05_date_coverage",
    "qr08_reproject_nearest",
    "qr09_chunk_checksum",
    # q10_inner_equi and q13_left_outer_null yielded their slots to the
    # new q83_chunk_udtf and qb1_decontaminate (new queries must enter
    # via the window); both stay frozen-valid under their r03
    # attestations and are exempt-listed below.
)

ATTEST_FIRST: tuple[str, ...] = ATTEST_CHANGED + ATTEST_STALE

# Closure-hash changes NOT rotated into the window, each with its
# justification — the auditable escape hatch for shared-helper edits
# that would otherwise force rotating the entire surface (sources/
# tables.py `load` sits in every query's closure). Entries here assert:
# the named change cannot alter this query's emitted values, and the
# round's golden hashes (tests/golden_sf0001.json) pin that claim.
_SHARED_LOADER = (
    "sources/tables.py load()/rebalance_scan() edited (events NANOS "
    "branch + inputFiles signal); this query reads neither events nor "
    "documents-via-rebalance, so its scan path is byte-identical — "
    "golden hash unchanged this round"
)
ATTEST_EXEMPT: dict[str, str] = {
    name: _SHARED_LOADER
    for name in (
        "q01_scan_count",
        "q02_project_filter",
        "q03_in_null_predicates",
        "q10_inner_equi",
        "q13_left_outer_null",
        "q21_count_distinct",
        "q11_broadcast_join",
        "q12_sort_merge_join",
        "q14_left_semi",
        "q15_left_anti",
        "q16_theta_join",
        "q18_copartitioned_zip",
        "q19_range_join",
        "q20_tpch_q1_agg",
        "q23_cube",
        "q24_grouping_sets",
        "q25_having",
        "q26_zonal_stats",
        "q27_argmax_gather",
        "q28_zonal_percentile",
        "q29_salted_agg",
        "q61_date_funcs",
        "q62_math_funcs",
        "q63_qa_bitops",
        "q64_nodata_case",
        "q65_affine_transform",
        "q66_array_json",
        "q67_categorical_legend",
        "q68_type_reinterpret",
        "q69_landsat_qa",
        "q80_scalar_pandas_udf",
        "q96_knn_bruteforce",
        "q97_lsh_knn",
        "q98_cosine_pairs_topk",
        "qr02_polygon_mask",
        "qr06_cube_window_agg",
    )
}


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
