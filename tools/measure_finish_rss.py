"""Measure peak DRIVER RSS of the CC driver finish (VERDICT r9 "Next
round" #3): the ``driver_finish_rows`` gate's memory bound was a
docstring estimate ("~1 GB near 2M"), asserted on a 128 GiB sandbox
that forgives what a 16 GiB production driver would not. This pins it:

    python tools/measure_finish_rss.py          # full sweep → SCALING.json
    python tools/measure_finish_rss.py --leg int64 1600000   # one leg

Per (dtype, n) leg, a FRESH process (so the Python allocator's
high-water state can't bleed between legs):

- builds the star relation exactly as ``min_label_clusters`` does
  (chain-32 synthetic edges → ``_contract_stars`` → eager
  localCheckpoint → count), with ids either int64 (spark.range ids)
  or md5-hex strings (the content-hash id shape qd1/q91 flows carry);
- samples this process's RSS (/proc/self/statm) every 10 ms on a
  background thread across the whole ``_driver_finish(stars)`` call —
  toPandas collect, id lists, union-find dict, label computation, and
  the Arrow rebuild all land inside the window;
- reports peak−baseline RSS and bytes/row.

Memory is load-independent (unlike the timing sweeps, no idle gate
needed); results merge into SCALING.json under "cc_finish_rss" and the
derived bytes/row constants live in operators/graph.py next to the
gate they justify.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import threading
import time

sys.path.insert(
    0, os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))
)

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))
SCALING = os.path.join(REPO, "SCALING.json")
SIZES = [1_600_000, 2_000_000]
DTYPES = ("int64", "md5str")
_PAGE = os.sysconf("SC_PAGE_SIZE")


def _rss_bytes() -> int:
    with open("/proc/self/statm") as f:
        return int(f.read().split()[1]) * _PAGE


def _jvm_pids() -> list[int]:
    """Pids of this process's java children (the py4j-launched Spark
    driver JVM). The Arrow collect buffers behind toPandas live THERE,
    in a separate process — sampling only /proc/self/statm under-counts
    the driver-side memory the 1 GiB budget is meant to bound
    (ADVICE r10)."""
    me = os.getpid()
    pids: list[int] = []
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/stat") as f:
                raw = f.read()
            comm = raw[raw.index("(") + 1 : raw.rindex(")")]
            ppid = int(raw.rsplit(")", 1)[1].split()[1])
        except (OSError, ValueError, IndexError):
            continue
        if ppid == me and "java" in comm:
            pids.append(int(d))
    return pids


def _pid_rss_bytes(pid: int) -> int:
    try:
        with open(f"/proc/{pid}/statm") as f:
            return int(f.read().split()[1]) * _PAGE
    except (OSError, ValueError, IndexError):
        return 0


class _Sampler(threading.Thread):
    """Tracks peak RSS of BOTH sides of the py4j boundary: this Python
    process and the Spark driver JVM child (separately — the gate's
    bytes/row constants bound the Python-side union-find; the JVM peak
    is recorded so the exclusion is measured, not silent)."""

    def __init__(self) -> None:
        super().__init__(daemon=True)
        self.peak = 0
        self.jvm_peak = 0
        self._jvm = _jvm_pids()
        self._halt = threading.Event()

    def _tick(self) -> None:
        self.peak = max(self.peak, _rss_bytes())
        self.jvm_peak = max(
            self.jvm_peak, sum(_pid_rss_bytes(p) for p in self._jvm)
        )

    def run(self) -> None:
        while not self._halt.is_set():
            self._tick()
            time.sleep(0.01)

    def stop(self) -> None:
        self._halt.set()
        self.join()
        self._tick()


def run_leg(dtype: str, n: int) -> int:
    from pyspark.sql import functions as F

    from rastercube_spark.operators import graph
    from rastercube_spark.session import get_spark

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from scaling import synth_edges

    spark = get_spark(f"finish-rss-{dtype}-{n}")
    spark.sparkContext.setLogLevel("ERROR")
    e = synth_edges(spark, n).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    if dtype == "md5str":
        # content-hash ids: same graph, each id replaced by a 32-char
        # hex digest; md5 is order-preserving-free but the union-find
        # only needs EQUALITY + total order, both fine on hex strings
        e = e.select(
            F.md5(F.col("src").cast("string")).alias("src"),
            F.md5(F.col("dst").cast("string")).alias("dst"),
        )
    stars = graph._contract_stars(e).localCheckpoint(eager=True)
    rows = stars.count()
    # settle: let the JVM/py4j churn from the count drain before baseline
    time.sleep(1.0)
    baseline = statistics.median(_rss_bytes() for _ in range(5))
    jvm_baseline = statistics.median(
        sum(_pid_rss_bytes(p) for p in _jvm_pids()) for _ in range(5)
    )
    s = _Sampler()
    s.start()
    out = graph._driver_finish(stars)
    n_out = out.count()  # materialize the Arrow rebuild end-to-end
    s.stop()
    delta = int(s.peak - baseline)
    jvm_delta = int(s.jvm_peak - jvm_baseline)
    print(
        "LEG_RESULT "
        + json.dumps(
            {
                "dtype": dtype,
                "stars": rows,
                "labels_out": n_out,
                "baseline_rss_mib": round(baseline / 2**20, 1),
                "peak_rss_mib": round(s.peak / 2**20, 1),
                "delta_mib": round(delta / 2**20, 1),
                "bytes_per_row": round(delta / rows, 1),
                # the JVM driver child, sampled over the same window —
                # its Arrow collect/serve buffers are NOT in the
                # Python-side constants (they are bounded separately by
                # spark.driver.memory); recorded so the exclusion is a
                # number, not a footnote (ADVICE r10)
                "jvm_delta_mib": round(jvm_delta / 2**20, 1),
                "jvm_bytes_per_row": round(jvm_delta / rows, 1),
            }
        )
    )
    spark.stop()
    return 0


def main() -> int:
    if len(sys.argv) == 4 and sys.argv[1] == "--leg":
        return run_leg(sys.argv[2], int(sys.argv[3]))
    legs: dict[str, dict] = {}
    for dtype in DTYPES:
        for n in SIZES:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--leg", dtype, str(n)],
                capture_output=True,
                text=True,
                timeout=1800,
            )
            row = None
            for line in proc.stdout.splitlines():
                if line.startswith("LEG_RESULT "):
                    row = json.loads(line[len("LEG_RESULT "):])
            if row is None:
                print(f"LEG FAILED {dtype} n={n}:\n{proc.stderr[-2000:]}",
                      file=sys.stderr)
                return 1
            legs.setdefault(dtype, {})[str(n)] = row
            print(f"{dtype} n={n}: Δ{row['delta_mib']} MiB "
                  f"({row['bytes_per_row']} B/row)", file=sys.stderr)
    with open(SCALING) as f:
        scaling = json.load(f)
    scaling["cc_finish_rss"] = {
        "note": (
            "peak driver RSS delta of _driver_finish(stars) — toPandas "
            "collect + union-find dict + Arrow rebuild — sampled at 10 ms "
            "on /proc/self/statm, fresh process per leg; justifies the "
            "bytes-per-row constants behind min_label_clusters' "
            "driver_finish_rows default (operators/graph.py). "
            "bytes_per_row covers the PYTHON process only; the JVM "
            "driver child (Arrow collect/serve buffers, bounded by "
            "spark.driver.memory, not by this gate) is sampled over "
            "the same window and recorded as jvm_delta_mib/"
            "jvm_bytes_per_row per leg"
        ),
        "legs": legs,
    }
    with open(SCALING, "w") as f:
        json.dump(scaling, f, indent=1)
    print(json.dumps(scaling["cc_finish_rss"]))
    return 0


if __name__ == "__main__":
    sys.exit(main())
