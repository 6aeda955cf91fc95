"""Round-over-round bench comparison with the noise discipline applied
(VERDICT r5/r6: every cross-round panic so far was load contamination,
not code):

    python tools/bench_compare.py BENCH_r06.json BENCH_r07.json

Reads either the driver's recorded shape ({"parsed": {...}}) or
bench.py's raw JSON line or a BENCH_DETAIL.json. Classifies each common
query as noise / real by BOTH a relative band and an absolute floor (a
0.05 s jitter on a 0.2 s query is 25% but means nothing), flags
load-contaminated runs from their recorded env notes, and prints the
common-subset totals the verdicts have converged on quoting.

When BOTH inputs carry per-query repeat dispersion (BENCH_DETAIL.json
query_clock.spread — recorded since r12, VERDICT r11 #2), a delta must
ALSO exceed the larger run's own observed spread to count as real:
the instrument's measured noise floor beats the static 30% band, in
both directions (a 10% delta on a query whose samples spread 3% IS
real; a 40% delta on one that spreads 50% is not adjudicable).
"""

from __future__ import annotations

import json
import sys

REL_BAND = 0.30  # documented local-noise band on this shared 32-core box
ABS_FLOOR_S = 0.20


def load(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    parsed = d.get("parsed", d)
    if parsed is None:
        # a driver artifact whose stdout line outgrew the 2000-char
        # capture (BENCH_r09.json): the tail lost its FRONT, but the
        # queries dict usually survives — recover it instead of
        # crashing, and say so
        tail = d.get("tail", "")
        start = tail.find('"queries"')
        if start != -1:
            brace = tail.find("{", start)
            depth, end = 0, -1
            for i, ch in enumerate(tail[brace:], brace):
                depth += ch == "{"
                depth -= ch == "}"
                if depth == 0:
                    end = i
                    break
            if end != -1:
                print(
                    f"NOTE: {path} has parsed=null (truncated stdout "
                    "line); queries recovered from the tail, value/env "
                    "unavailable",
                    file=sys.stderr,
                )
                return {"queries": json.loads(tail[brace : end + 1])}
        raise SystemExit(
            f"{path}: parsed=null and no queries dict recoverable from "
            "its 2000-char tail"
        )
    return parsed


def _normalize_keys(parsed: dict) -> dict:
    """Map query names to their unique id prefix (q01_scan_count → q01)
    so a record whose compact line degraded to short keys
    ("keys":"id", bench.py r12) compares against full-name records.
    No-op if any prefix collides (then full names were kept
    everywhere)."""
    out = dict(parsed)
    for field in ("queries", "query_clock"):
        d = parsed.get(field)
        if not d:
            continue
        short = {}
        for k, v in d.items():
            p = k.split("_", 1)[0]
            if p in short:
                return parsed  # collision: keep full names as-is
            short[p] = v
        out[field] = short
    return out


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    a, b = load(sys.argv[1]), load(sys.argv[2])
    if a.get("keys") != b.get("keys"):
        # one record degraded to id-prefix keys, the other didn't:
        # normalize BOTH so the common subset survives the format change
        a, b = _normalize_keys(a), _normalize_keys(b)
    qa, qb = a["queries"], b["queries"]
    common = sorted(set(qa) & set(qb))
    for side, d in (("A", a), ("B", b)):
        env = d.get("env", {})
        la = env.get("loadavg_start")
        warn = env.get("load_warning")
        print(f"{side}: loadavg_start={la}" + (f"  WARNING: {warn}" if warn else ""))
    ta, tb = sum(qa[k] for k in common), sum(qb[k] for k in common)
    print(f"common-{len(common)} total: {ta:.2f}s -> {tb:.2f}s "
          f"({(tb - ta) / ta:+.1%})")
    spr_a = {k: v.get("spread") for k, v in a.get("query_clock", {}).items()}
    spr_b = {k: v.get("spread") for k, v in b.get("query_clock", {}).items()}
    have_spread = any(v is not None for v in spr_a.values()) and any(
        v is not None for v in spr_b.values()
    )
    if have_spread:
        print("per-query repeat spreads present in both records: deltas "
              "are additionally gated on each query's measured "
              "dispersion")
    real = []
    for k in common:
        d = qb[k] - qa[k]
        if abs(d) <= ABS_FLOOR_S or abs(d) <= REL_BAND * qa[k]:
            continue
        if have_spread and spr_a.get(k) is not None and spr_b.get(k) is not None:
            floor = max(spr_a[k] * qa[k], spr_b[k] * qb[k])
            if abs(d) <= floor:
                print(f"  within-instrument  {k}: {qa[k]:.2f} -> "
                      f"{qb[k]:.2f} ({d:+.2f}s) inside measured spread "
                      f"{floor:.2f}s — not adjudicable")
                continue
        real.append((d, k))
    if not real:
        print(f"no per-query delta outside the noise band "
              f"(>{REL_BAND:.0%} and >{ABS_FLOOR_S}s"
              + (", and measured spread" if have_spread else "") + ")")
    for d, k in sorted(real):
        print(f"  {'REGRESSION' if d > 0 else 'improvement'}  {k}: "
              f"{qa[k]:.2f} -> {qb[k]:.2f} ({d:+.2f}s)")
    only_b = sorted(set(qb) - set(qa))
    if only_b:
        print("new in B:", ", ".join(f"{k}={qb[k]:.2f}s" for k in only_b))
    return 0


if __name__ == "__main__":
    sys.exit(main())
