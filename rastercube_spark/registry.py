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
# --- tiered-rotation policy (VERDICT r13 "Next round" #1) --------------
# The registry outgrew ad-hoc window bookkeeping: 131 queries share a
# 50-slot driver window under a 3-round staleness ceiling (a query's
# latest driver attestation may be at most 2 rounds old when judged).
# The policy, ENFORCED MECHANICALLY in tests/test_attestation.py
# (test_rotation_policy_capacity_and_staleness):
#   tier 1 — changed/new closures ALWAYS attest in their landing round
#            (ATTEST_CHANGED; the existing closure-hash rule);
#   tier 2 — code-frozen queries re-attest on a 3-round cycle: every
#            query whose latest green CORRECTNESS_r* row is 2 rounds
#            behind the newest recorded round MUST appear in the next
#            window (ATTEST_STALE head), remaining slots go
#            oldest-first per tools/rotate_window.py;
#   capacity — 50 slots × 3-round cycle = 150, minus a 6-slot/round
#            reserve for tier-1 churn ⇒ the registry is CAPPED AT 144
#            registered queries (test-enforced). Net-new queries only
#            land while the cap holds; at 131 (r14, net-new 0) the
#            contract stays satisfiable indefinitely.
#
# Round 14 changed set — twelve entries, the exact diff of
# rastercube_spark.attest.all_hashes() vs the r13 baseline. Eight are
# the r14 OPTIMIZATION closures (plan changed, values bit-identical —
# the whole point of the round; OPTIMIZATION_r14.md entries 1-4, 8, 9):
# q97_lsh_knn / qa2_ivf_knn (scoring UDFs marked non-deterministic so
# Catalyst stops duplicating the ArrowEvalPython nodes, guide §4.4);
# q98_cosine_pairs_topk (per-pair UDF → blocked_cosine_pairs GEMM);
# qb0_cosine_pairs_lsh (LUT rescore under the 32 MB broadcast gate);
# qb2_semantic_dedup / qc0_balanced_sample (same LUT path via
# lsh_cosine_pairs, plus the nondet scoring UDFs in their
# construction-time pair search); qf6_ann_index_audit (closure moved
# with the shared similarity.py helper edits — its own plan and
# values are unchanged, plans/r14/qf6_* before==after shape; then the
# audit itself folded to ONE corpus scan — one ArrowEvalPython
# projection, one explode, two-level keyed agg, no Union);
# qe5_bm25_topk (lexical leg folded to two tokenize passes — dl rides
# the tf groupBy, the explode sees a pre-filtered array, the
# full-corpus dl join is gone; qf4's lexical leg shares the rewrite,
# guide §6.2/§2.2). The
# other four predate the
# optimization phase (landed in 6befde9, the r13 mid-build tail):
# qg8_knn_graph_stats changed because knn_graph_stats grew the
# persisted-index mode (VERDICT r13 #2 — index=(enc, meta) from
# build-ann-index --store-vectors reads cid from storage and the
# coarse quantizer from the index metadata; the candidate-join core
# was factored into knn_graph_edges/knn_graph_index_sides); the
# registered query keeps the inline path, values unchanged
# (bit-identity test in tests/test_similarity.py);
# qg5_source_score_percentiles changed because the rank arithmetic
# generalized from the hard-coded quartiles to any rational p via the
# division-free cross-multiplied selection (VERDICT r13 #5); the
# default quartile values and oracle are unchanged (property test vs
# the naive sort at p ∈ {0.1, 0.9, 0.99, 1.0});
# qf4_hybrid_rrf changed because hybrid_rrf's ann_leg now takes dim=
# as a parameter (VERDICT r13 #6 — no driver-side .first()), clamps
# the ADC shortlist to max(ann_rerank, k_leg), and re-ranks the
# shortlist by exact cosine so both legs order by the same statistic
# (ADVICE r13 ×3); the registered query keeps the brute leg, values
# unchanged;
# qf0_ivfpq_knn changed because ivfpq_encode gained the extra_cols
# passthrough save_ann_index(store_vectors=True) projects the raw
# vectors with (same single map-only corpus pass); the default plan
# and all emitted values are unchanged.
ATTEST_CHANGED: tuple[str, ...] = (
    "q97_lsh_knn",
    "q98_cosine_pairs_topk",
    "qa2_ivf_knn",
    "qb0_cosine_pairs_lsh",
    "qb2_semantic_dedup",
    "qc0_balanced_sample",
    "qe5_bm25_topk",
    "qf0_ivfpq_knn",
    "qf4_hybrid_rrf",
    "qf6_ann_index_audit",
    "qg5_source_score_percentiles",
    "qg8_knn_graph_stats",
)

# The 38 remaining window slots go oldest-first per tools/
# rotate_window.py's ground-truth reading of the CORRECTNESS_r*
# artifacts: FIRST the full thirty-six-query r11 cohort at the
# 2-round staleness ceiling (judged at r13; the tier-2 rule makes
# this head MANDATORY — VERDICT r13 "What's wrong" #1 names exactly
# these 36), then the two oldest r12-attested queries (q10/q11 in
# the planner's order) for the remaining slots. The r14
# optimization closures consumed eight of the ten pull-forward slots
# the original r14 rotation had reserved; the r12 cohort's remaining
# 20 queries hit the ceiling at r15 and must lead that window.
ATTEST_STALE: tuple[str, ...] = (
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
    "q77_dedup_within_watermark",
    "q81_grouped_map_udf",
    "qb3_mixture_sample",
    "qb4_passage_dedup",
    "qd4_neardup_decontaminate",
    "qd6_ngram_novelty",
    "qd7_split_assign",
    "qd8_snapshot_overlap",
    "qe0_embedding_drift",
    "qe1_containment_audit",
    "qe3_source_overlap",
    "qr01_windowed_read_fill",
    "qr03_availability_semi_join",
    "qr04_incremental_anti_join",
    "qr05_date_coverage",
    "qr09_chunk_checksum",
    "q10_inner_equi",
    "q11_broadcast_join",
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
