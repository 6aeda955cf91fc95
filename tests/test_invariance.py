"""Equivalence-under-physical-plan (SURVEY §5 declared strategy): query
results must be invariant to physical execution choices — broadcast
forced off, AQE off, a different shuffle-partition count — and raster
results invariant to the chunking geometry. Catches operators whose
semantics accidentally depend on partitioning (nondeterministic
tie-breaks, partition-local assumptions, salt leakage)."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from rastercube_spark import registry

# join-heavy, agg, window, dedup/LSH, kNN, range join — the shapes most
# at risk of partitioning-dependent results
QUERIES = [
    "q12_sort_merge_join",
    "q20_tpch_q1_agg",
    "q30_ranking",
    "q92_minhash_lsh_pairs",
    "q97_lsh_knn",
    "q19_range_join",
    # round 5: trained-IVF kNN (distributed k-means partial sums must be
    # partition-order-proof — the integer-exactness argument, tested) and
    # the LSH pair search (bucket self-join + DISTINCT + re-joins)
    "qa2_ivf_knn",
    "qb0_cosine_pairs_lsh",
    # round 6: the sampling family (hash draws must be partition-proof),
    # passage dedup (two keyed shuffles + join back), SQ8+ADC kNN
    # (Arrow-batch boundaries must not leak into scores), and the two
    # new streaming-form joins in their batch registration
    "qb3_mixture_sample",
    "qb4_passage_dedup",
    "qb6_quantized_knn",
    "qb7_group_sample",
    "qb8_mixture_upsample",
    "q75_stream_static_join",
    "q76_stream_stream_join",
    "qb9_dataset_report",
]

VARIANTS = [
    {"spark.sql.autoBroadcastJoinThreshold": "-1"},
    {"spark.sql.adaptive.enabled": "false"},
    {"spark.sql.shuffle.partitions": "7"},
]


def _rows(spark, sf_dir, name):
    return sorted(map(str, registry.queries()[name](spark, sf_dir).collect()))


@pytest.mark.parametrize("name", QUERIES)
def test_results_invariant_to_physical_plan(spark, sf_dir, name):
    baseline = _rows(spark, sf_dir, name)
    saved: dict[str, str] = {}
    try:
        for variant in VARIANTS:
            for k, v in variant.items():
                saved.setdefault(k, spark.conf.get(k))
                spark.conf.set(k, v)
            assert _rows(spark, sf_dir, name) == baseline, (
                f"{name} changed results under {variant}"
            )
            for k in variant:
                spark.conf.set(k, saved[k])
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_raster_results_invariant_to_chunking(spark, tmp_path):
    """Equivalence-under-chunking: the same grid stored with different
    fraction geometries answers windowed reads identically (the
    reference's jGrid invariant, tests/test_jgrid3.py equivalence)."""
    from rastercube_spark.sources.raster import CubeHeader, RasterCube

    rng = np.random.RandomState(17)
    W, H, ND = 80, 60, 4
    full = rng.randint(-2000, 10001, size=(H, W, ND)).astype(np.int16)

    results = []
    for fw, fh, fnd in ((20, 20, 2), (40, 30, 4), (80, 60, 1)):
        cube = RasterCube(
            str(tmp_path / f"cube_{fw}x{fh}_{fnd}"),
            CubeHeader(
                width=W, height=H, frac_width=fw, frac_height=fh,
                dtype="int16", nodataval=-3000, frac_ndates=fnd,
                timestamps_ms=list(range(ND)),
            ),
        )
        cube.write_arrays(spark, full)
        window = cube.load_slice_array(spark, (7, 5), (73, 52), 1, 4)
        agg = (
            cube.load_slice_xy(spark, (7, 5), (73, 52), 1, 4)
            .agg(
                F.count("*").alias("n"),
                F.sum(F.col("value").cast("bigint")).alias("s"),
            )
            .collect()[0]
        )
        results.append((window, agg["n"], agg["s"]))

    ref_win, ref_n, ref_s = results[0]
    for win, n, s in results[1:]:
        np.testing.assert_array_equal(win, ref_win)
        assert (n, s) == (ref_n, ref_s)
