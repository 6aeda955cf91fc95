"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Queries execute via the noop sink — full plan execution (scan → shuffle →
agg/join/window/UDF) without driver-side collection, so timings measure
the engine, not result transfer.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

# A representative slice of the surface: scans, sort-merge + broadcast
# joins, hash agg, windows, top-k, QA decode, grouped-map UDF, raster
# window read, minhash-LSH dedup, brute-force + LSH kNN, text metrics.
HEADLINE = [
    "q01_scan_count",
    "q02_project_filter",
    "q12_sort_merge_join",
    "q20_tpch_q1_agg",
    "q21_count_distinct",
    "q18_copartitioned_zip",
    "q30_ranking",
    "q33_running_total",
    "q40_global_topk",
    "q63_qa_bitops",
    "q81_grouped_map_udf",
    "qr01_windowed_read_fill",
    "q70_tumbling_window",
    "qr06_cube_window_agg",
    "qr07_resample_downsample",
    "q90_text_metrics",
    "q92_minhash_lsh_pairs",
    "q93_lsh_jaccard",
    "q95_simhash",
    "q96_knn_bruteforce",
    "q97_lsh_knn",
    "q99_winnow_fingerprint",
    # round 4 additions: bucketed range join, all-pairs cosine, IVF kNN,
    # multimodal frame fan-out + media-features kNN (headline_total is
    # therefore not directly comparable to rounds <= 3, which ran 22
    # queries; per-query timings are)
    "q19_range_join",
    "q98_cosine_pairs_topk",
    "qa2_ivf_knn",
    "qa8_frame_sample",
    "qa9_media_knn",
    # round 5 additions: LSH-bucketed cosine pair search (the registered
    # scale path for q98's all-pairs formulation) and the broadcast
    # n-gram decontamination pass (qb2's clustering is driver-iterative,
    # so its noop-sink timing would measure only the final labels plan —
    # excluded rather than reported misleadingly)
    "qb0_cosine_pairs_lsh",
    "qb1_decontaminate",
]


def _env_note() -> dict:
    """Record the run conditions next to the numbers so cross-round
    deltas inside the documented ±30% local-noise band stop consuming
    review attention (VERDICT r04 'Bench hygiene'): load average at
    start is the strongest confounder on a shared 32-core box."""
    import platform

    note = {
        "python": platform.python_version(),
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    }
    try:
        import pyspark

        note["pyspark"] = pyspark.__version__
    except ImportError:
        pass
    try:
        note["loadavg_start"] = [round(x, 2) for x in os.getloadavg()]
    except OSError:
        pass
    return note


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None
    env = _env_note()

    from rastercube_spark import registry
    from rastercube_spark.session import get_spark

    spark = get_spark("rastercube-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs.get(name)
        if fn is None:
            continue
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()  # warm (JIT, shuffle files)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "env": env,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
