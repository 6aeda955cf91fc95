"""r15 over-partitioning audit (VERDICT r14 "Next round" #1): run a
query once and report per-stage task counts + wall time, so AQE's
ACTUAL post-shuffle partition counts are a read, not a guess.

    SPARK_GRAFT_CPUS=32 python tools/stageprobe_r15.py qg1_chunk_documents ...

Optionally set SPARK_GRAFT_PROBE_CONF='k=v;k=v' to A/B session confs.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    extra = {}
    for kv in os.environ.get("SPARK_GRAFT_PROBE_CONF", "").split(";"):
        if "=" in kv:
            k, v = kv.split("=", 1)
            extra[k.strip()] = v.strip()

    import bench
    from rastercube_spark import registry
    from rastercube_spark.session import get_spark

    spark = get_spark("rastercube-stageprobe-r15", extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    sc = spark.sparkContext
    jt = sc._jsc.sc().statusTracker()

    out = {}
    for name in names:
        fn = qs.get(name) or bench.COMPOSITES.get(name)
        if fn is None:
            print(f"SKIP {name}", file=sys.stderr)
            continue
        loop = name in bench.LOOP_INCLUSIVE
        df = fn(spark, sf_dir)
        _noop(df)  # warm
        group = f"probe-{name}"
        sc.setJobGroup(group, name)
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            _noop(fn(spark, sf_dir) if loop else df)
            samples.append(time.perf_counter() - t0)
        sc.setJobGroup(None, None)
        job_ids = list(jt.getJobIdsForGroup(group))
        stages = []
        n_jobs = len(job_ids)
        for jid in sorted(job_ids):
            ji = jt.getJobInfo(jid)
            if ji is None:
                continue
            for sid in list(ji.get().stageIds()):
                si = jt.getStageInfo(sid)
                if si is not None and si.get().numTasks() > 0:
                    stages.append((sid, si.get().numTasks()))
        # stages for 3 samples — report the task-count histogram
        counts = [n for _, n in sorted(stages)]
        out[name] = {
            "median_s": round(statistics.median(samples), 3),
            "samples": [round(s, 3) for s in samples],
            "n_jobs_3samples": n_jobs,
            "n_stages_3samples": len(counts),
            "task_counts": counts,
            "total_tasks": sum(counts),
        }
        print(name, json.dumps(out[name]))
    spark.stop()


if __name__ == "__main__":
    main()
