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
# Round 6 changed set. Two kinds of change this round:
# (a) code changes: qa2 (k-means centroid matrix now rides a Spark
#     broadcast variable instead of the per-iteration UDF closure),
#     q83 (NULL/empty-text handling aligned between UDTF and oracle —
#     ADVICE r05 low);
# (b) instrument changes: attest.py now resolves function-body imports
#     from bytecode (ADVICE r05 high — qb0/qb1/qb2/qa2 etc. had their
#     operators silently outside the hashed closure). Every query whose
#     hash moved because its closure GREW under the fixed instrument is
#     rotated here so the driver re-attests it under the sound hash;
# (c) NEW queries (first attestation): qb3 mixture sampling, qb4
#     passage-level dedup, qb5 quality-rule gate, qb6 int8-quantized
#     kNN, qb7 fixed-size group sample, qb8 fractional upsampling,
#     qb9 dataset-card report, qc0 cluster-balanced sampling, q75
#     stream-static enrichment join, q76 stream-stream interval join —
#     10 slots.
# (d) NULL-semantics fixes from the edge-corpus harness
#     (tests/test_edge_corpus.py): q90 (NULL text → 'und' in BOTH
#     engines — each engine previously fell through to a different
#     arbitrary code), qa0 (NULL payload → NULL metadata instead of a
#     worker crash), qa8/qa9 (NULL payload rows dropped by the
#     frame/feature stages in both engines). Driver-fixture outputs are
#     unchanged (golden hashes identical); the driver re-attests the
#     new closures.
#
# The (c)+(d) slots displace TWELVE standing rows from the stale
# rotation, all golden-pinned at sf0.001 and first in line for r07:
# q30 (green in r05, the youngest), q01/q02/q03 (trivial scans),
# q61/q62/q64/q66/q67/q68/q69 (pure deterministic scalar-function
# families), and q73 (r05-green; its (b)-rotation was precautionary —
# behavior unchanged under the instrument fix).
ATTEST_CHANGED: tuple[str, ...] = (
    "qb7_group_sample",
    "qb8_mixture_upsample",
    "qb9_dataset_report",
    "qc0_balanced_sample",
    "q75_stream_static_join",
    "q76_stream_stream_join",
    "q90_text_metrics",
    "qa0_multimodal_decode",
    "qa8_frame_sample",
    "qa9_media_knn",
    "qb3_mixture_sample",
    "qb4_passage_dedup",
    "qb5_quality_rules",
    "qb6_quantized_knn",
    "qa2_ivf_knn",
    "q83_chunk_udtf",
    "qb0_cosine_pairs_lsh",
    "qb1_decontaminate",
    "qb2_semantic_dedup",
    "qa3_dup_clusters",
    "qa4_dedup_keep",
    "qa6_sequence_packing",
    "q19_range_join",
    "q65_affine_transform",
    "q98_cosine_pairs_topk",
    "qr06_cube_window_agg",
    "qr07_resample_downsample",
    "qr08_reproject_nearest",
)

# Stalest standing attestations — the r05 exempt list (r03/r04 driver
# rows: the join/agg families, q10/q13/q21 displaced in r05, the heavy
# hitters q20/q96/q97/qr02) rotates through the remaining window slots
# this round (VERDICT r05 "Next round" #2); the eleven displaced rows
# are enumerated above ATTEST_CHANGED.
ATTEST_STALE: tuple[str, ...] = (
    "q10_inner_equi",
    "q11_broadcast_join",
    "q12_sort_merge_join",
    "q13_left_outer_null",
    "q14_left_semi",
    "q15_left_anti",
    "q16_theta_join",
    "q18_copartitioned_zip",
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
    "q80_scalar_pandas_udf",
    "q96_knn_bruteforce",
    "q97_lsh_knn",
    "qr02_polygon_mask",
)

ATTEST_FIRST: tuple[str, ...] = ATTEST_CHANGED + ATTEST_STALE

# Closure-hash changes NOT rotated into the window, each with its
# justification — the auditable escape hatch for shared-helper edits
# that would otherwise force rotating the entire surface.
_H32_SPELLING = (
    "oracle-text-only: the shared _h32 SQL fragment changed spelling "
    "from concat('0x', ...) to '0x' || ... (DuckDB concat SKIPS NULL "
    "arguments, so the old spelling turned a NULL md5 slice into the "
    "un-castable literal '0x'; || propagates NULL — edge-corpus "
    "hardening, tests/test_edge_corpus.py). For non-NULL input the two "
    "spellings are identical SQL, the engine-side code is untouched, "
    "and the sf0.001 golden hash is unchanged."
)
ATTEST_EXEMPT: dict[str, str] = {
    "q92_minhash_lsh_pairs": _H32_SPELLING,
    "q93_lsh_jaccard": _H32_SPELLING,
    "q95_simhash": _H32_SPELLING,
    "q99_winnow_fingerprint": _H32_SPELLING,
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
