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
# isort would silently reshuffle attestation coverage). It is now explicit:
# ATTEST_FIRST lists, per round, (a) every query whose code or emitted
# values changed this round — their prior-round attestations are stale —
# then (b) the queries whose last driver attestation is oldest. Queries not
# listed keep import order after these, and MUST be code-frozen (their
# standing CORRECTNESS_r{N}.json rows remain valid only by immutability).
#
# Round 4: slots 1-26 = changed this round (davg/dsum exact-division
# rewrite, qr07 fix, simhash/lsh_knn rewrites, EventReplay staging, and
# the vectorized-cosine swap under q96/q98/qa2 — output-identical, golden
# hashes pinned, but re-attested since their code changed); the rest =
# queries whose last driver attestation is oldest (round 2).
ATTEST_FIRST: tuple[str, ...] = (
    # changed this round
    "qr07_resample_downsample",
    "qr02_polygon_mask",
    "qr06_cube_window_agg",
    "q20_tpch_q1_agg",
    "q23_cube",
    "q24_grouping_sets",
    "q25_having",
    "q26_zonal_stats",
    "q29_salted_agg",
    "q11_broadcast_join",
    "q12_sort_merge_join",
    "q18_copartitioned_zip",
    "q63_qa_bitops",
    "q64_nodata_case",
    "q69_landsat_qa",
    "q80_scalar_pandas_udf",
    "q70_tumbling_window",
    "q71_sliding_window",
    "q72_session_window",
    "q73_watermark_late_data",
    "q74_stateful_dedup",
    "q95_simhash",
    "q96_knn_bruteforce",
    "q97_lsh_knn",
    "q98_cosine_pairs_topk",
    "qa2_ivf_knn",
    "qa3_dup_clusters",
    "qa4_dedup_keep",
    "qa6_sequence_packing",
    "qa8_frame_sample",
    "qa9_media_knn",
    "q19_range_join",
    # rebalance_scan loader change touches every datapipe query; the ones
    # not already above rotate in here (outputs unchanged — goldens pinned)
    "q90_text_metrics",
    "q91_exact_dedup",
    "q92_minhash_lsh_pairs",
    "q93_lsh_jaccard",
    "q94_ngram_jaccard_topk",
    "q99_winnow_fingerprint",
    "qa0_multimodal_decode",
    "qa1_tfidf_topterms",
    "qa5_repetition_filters",
    "qa7_pii_redaction",
    # stalest standing attestation (round 2)
    # (q2a/q2b dropped from the window: declared no-oracle sketches — the
    # driver records only a rows-only check for them, so their slots go
    # to fully-oracled queries; their tolerance tests pin them instead)
    "q27_argmax_gather",
    "q28_zonal_percentile",
    # q50_union_all rotated out (frozen since r02) for q19_range_join
    "q61_date_funcs",
    "q62_math_funcs",
    "q65_affine_transform",
    "q66_array_json",
    "q67_categorical_legend",
    "q68_type_reinterpret",
)


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
