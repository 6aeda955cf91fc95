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
# Round 12 changed set — eleven entries, the exact diff of
# rastercube_spark.attest.all_hashes() vs the r11 baseline:
# qa2_ivf_knn and qe2_pq_knn changed because quantizer TRAINING now
# runs driver-side for bounded samples (train_ivf_centroids /
# train_pq_codebooks driver_train_below — bit-identical results,
# asserted; skips per-iteration job latency: qe2's loop-inclusive
# median halved);
# qf0_ivfpq_knn is NEW (the IVF×PQ composed ANN both qa2's and qe2's
# docstrings advertised as the 100 TB path — VERDICT r11 "Next round"
# #3; a NEW query must be attested the round it lands);
# qf1_embedding_dim_stats, qf2_token_surprisal and qf3_length_histogram
# are NEW (collapsed-dimension audit, corpus-relative unigram
# typicality filter, and packing-planning length distribution —
# LLM-pipeline surface);
# qf4_hybrid_rrf, qf5_boilerplate_ngrams and qf6_ann_index_audit are
# NEW (BM25+cosine reciprocal-rank fusion, corpus-frequent-shingle
# boilerplate share, and the IVF/PQ index-build health audit —
# LLM-pipeline surface, landed later in r12);
# qf7_repeated_spans, qf8_token_budget and qf9_dup_rate_estimate are
# NEW (suffix-array-style exact repeated-substring audit, per-source
# histogram-threshold token-budget selection, and the sampled-pair
# corpus duplicate-rate estimator — LLM-pipeline surface, landed
# latest in r12; the closure-hash diff vs the committed baseline was
# verified to be exactly these three before rotation);
# qg0_semantic_decontaminate is NEW (embedding-space eval-set
# decontamination — the map-only third decontamination topology next
# to qb1/qd4; r12 session 3; qf5's closure also changed this session:
# the InferFiltersFromGenerate plan fix, values unchanged, oracle
# green);
# qg1_chunk_documents is NEW (fixed-window document chunking — the
# make-training-sequences step before qa6's packing; map-only;
# r12 session 3);
# qe5_bm25_topk's closure changed because bm25_topk now dedups the
# terms tuple (ADVICE r11 — a repeated term used to score twice) and
# grew an off-by-default log_idf mode + the summed-score rank caveat
# (VERDICT r11 #5; the registered query passes distinct terms and the
# default linear form, so emitted values are unchanged);
# qe4_embedding_outliers' closure changed because
# label_centroid_outliers now ENFORCES its dim parameter via
# assert_true instead of silently ignoring it (ADVICE r11; all fixture
# vectors are dim-64, values unchanged). The bench repeat-median work
# and the GeoTIFF export type hints touch no closure (verified: the
# hash diff is exactly these three).
ATTEST_CHANGED: tuple[str, ...] = (
    "qf0_ivfpq_knn",
    "qf1_embedding_dim_stats",
    "qf2_token_surprisal",
    "qf3_length_histogram",
    "qf4_hybrid_rrf",
    "qf5_boilerplate_ngrams",
    "qf6_ann_index_audit",
    "qf7_repeated_spans",
    "qf8_token_budget",
    "qf9_dup_rate_estimate",
    "qg0_semantic_decontaminate",
    "qg1_chunk_documents",
    "qe4_embedding_outliers",
    "qe5_bm25_topk",
    "qa2_ivf_knn",
    "qe2_pq_knn",
)

# The 34 remaining window slots go oldest-first per tools/
# rotate_window.py's ground-truth reading of the CORRECTNESS_r*
# artifacts: FIRST the thirteen r9-stale queries at the window's
# stated 2-round maximum (qb5-qb9, qd3, qr02, qr06-qr08, q96, qa9,
# qb0 — queued "first for r12" last round and honored here, VERDICT
# r11 "Next round" #1), then the r10 cohort in the planner's
# (alphabetical) order through q91. The r10 tail (q92-qa8 minus the
# changed qa2, qb1, qb2, qc0, qd1, qd2, qd5, qd8, qd9 and the r11
# cohort) doesn't fit and stays frozen at ≤2 rounds old (attested r10,
# judged at r12 = at the 2-round ceiling), first in line for r13 —
# capacity check: 50 slots/round × a 3-round re-attest cycle (attest
# at r, at-ceiling at r+2, re-attest by r+3's window) = 150 ≥ the 119
# registered queries, so the steady state keeps every query within
# the ceiling (at 122 queries still ≤ 150). q92/q93/q94 moved from
# this round's stale list to the r13 head to make room for the three
# new qf4-qf6 attestations; q83/q90/q91 likewise for qf7-qf9 (both
# trios attested r10, judged at r12 = exactly the ceiling, and lead
# r13 with the rest of the r10 tail); q82 likewise for qg0 and q80
# for qg1 (at 124 queries still ≤ the 150-slot 3-round capacity).
ATTEST_STALE: tuple[str, ...] = (
    "q96_knn_bruteforce",
    "qa9_media_knn",
    "qb0_cosine_pairs_lsh",
    "qb5_quality_rules",
    "qb6_quantized_knn",
    "qb7_group_sample",
    "qb8_mixture_upsample",
    "qb9_dataset_report",
    "qd3_knn_label_consistency",
    "qr02_polygon_mask",
    "qr06_cube_window_agg",
    "qr07_resample_downsample",
    "qr08_reproject_nearest",
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
