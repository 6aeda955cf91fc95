"""r15 optimization-round instrument: per-query plan capture + timing.

Two modes:
  --plans [names...]   dump explain("formatted") for each headline query
                       to plans/r15/<name>_<tag>.txt (tag via --tag,
                       default "before"); construction runs (training
                       collects etc.) but nothing is executed.
  --time names...      per-query timing like bench.py (warm + median of
                       3 noop-sink samples) but standalone, with
                       construction and execution timed separately so a
                       loop-inclusive query's driver work is attributed.

Shares the bench session factory so plans match what bench.py runs.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _headline():
    import bench

    return list(bench.HEADLINE)


def _fn_for(name):
    import bench
    from rastercube_spark import registry

    qs = registry.queries()
    return qs.get(name) or bench.COMPOSITES.get(name)


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def capture_plans(spark, sf_dir, names, tag):
    outdir = os.path.join(REPO, "plans", "r15")
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        fn = _fn_for(name)
        if fn is None:
            print(f"SKIP {name}: not registered", file=sys.stderr)
            continue
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(outdir, f"{name}_{tag}.txt")
            with open(path, "w") as f:
                f.write(buf.getvalue())
            print(f"plan {name} -> {path}")
        except Exception as e:  # noqa: BLE001 - survey must not abort
            print(f"ERR {name}: {e}", file=sys.stderr)


def time_queries(spark, sf_dir, names, samples=3):
    import bench

    out = {}
    for name in names:
        fn = _fn_for(name)
        if fn is None:
            continue
        spark.sparkContext.setJobDescription(f"profile:{name}")
        loop = name in bench.LOOP_INCLUSIVE
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t_construct = time.perf_counter() - t0
        _noop(df)  # warm
        runs = []
        for _ in range(samples):
            t0 = time.perf_counter()
            if loop:
                _noop(fn(spark, sf_dir))
            else:
                _noop(df)
            runs.append(time.perf_counter() - t0)
        out[name] = {
            "construct_s": round(t_construct, 3),
            "median_s": round(statistics.median(runs), 3),
            "samples": [round(r, 3) for r in runs],
            "loop_inclusive": loop,
        }
        print(name, json.dumps(out[name]))
        spark.sparkContext.setJobDescription(None)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--plans", action="store_true")
    ap.add_argument("--time", action="store_true")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--out", default=None)
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from rastercube_spark.session import get_spark

    spark = get_spark("rastercube-profile-r15")
    spark.sparkContext.setLogLevel("ERROR")
    names = args.names or _headline()
    if args.plans:
        capture_plans(spark, sf_dir, names, args.tag)
    if args.time:
        res = time_queries(spark, sf_dir, names)
        if args.out:
            with open(args.out, "w") as f:
                json.dump(res, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
