"""Attestation-rotation planner: compute each query's last driver-green
round from the recorded CORRECTNESS_r*.json artifacts and print the
recommended next-round window.

    python tools/rotate_window.py

Why a tool: the window accounting drifted from its own comments in
rounds 4 and 5 (VERDICT r05 "What's wrong" #2) and was hand-re-derived
again in round 6 — the displacement bookkeeping is exactly the kind of
list a human mis-maintains. This reads the ground truth instead:

- last_green[q] = max round whose CORRECTNESS_r{N}.json has a row for q
  with rows/schema/hash all True (hash may be absent for rows-only
  checks — those count as green-weak and are flagged);
- queries never attested (new since the last round) MUST head the next
  window;
- the rest of the stale budget goes to the smallest last_green first.

The output is a suggestion to paste into registry.ATTEST_STALE after
the next round's ATTEST_CHANGED is known — it cannot know which code
will change next round.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(
    0, os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))
)

from rastercube_spark import registry  # noqa: E402

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))
WINDOW = 50


def last_green_rounds() -> tuple[dict[str, int], dict[str, int]]:
    """(strong, weak): query → last round with a fully-green row /
    a rows-only green row (no hash compare — non-SQL-expressible)."""
    strong: dict[str, int] = {}
    weak: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"_r(\d+)\.json$", path)
        rnd = int(m.group(1))
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            if not isinstance(row, dict) or row.get("err"):
                continue
            ok_rows = row.get("rows_match", False)
            ok_schema = row.get("schema_match", True)
            ok_hash = row.get("hash_match", None)
            if ok_rows and ok_schema and ok_hash:
                strong[name] = max(strong.get(name, 0), rnd)
            elif ok_rows:
                weak[name] = max(weak.get(name, 0), rnd)
    return strong, weak


def main() -> int:
    strong, weak = last_green_rounds()
    names = list(registry.queries())
    never = [n for n in names if n not in strong and n not in weak]
    ranked = sorted(
        (n for n in names if n not in never),
        key=lambda n: (strong.get(n, weak.get(n, 0)), n),
    )
    print(f"{len(names)} registered; window = {WINDOW}")
    if never:
        print(f"\nNEVER driver-attested ({len(never)}) — must head the window:")
        for n in never:
            print(f"  {n}")
    print("\nstalest standing rows (fill remaining slots in this order):")
    budget = WINDOW - len(never)
    for n in ranked[: budget + 10]:
        rnd = strong.get(n)
        tag = f"r{rnd:02d}" if rnd else f"r{weak[n]:02d} (rows-only)"
        marker = "  " if ranked.index(n) < budget else "| "
        print(f"{marker}{tag}  {n}")
    print(
        "\n(entries after the '|' line fall outside the window if nothing"
        " changes; every ATTEST_CHANGED entry next round displaces one"
        " more from the tail)"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
