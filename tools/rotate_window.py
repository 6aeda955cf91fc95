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

import os
import sys

sys.path.insert(
    0, os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))
)

from rastercube_spark import registry  # noqa: E402
from rastercube_spark.attest import last_green_rounds  # noqa: E402

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))
WINDOW = 50


def main() -> int:
    strong, weak = last_green_rounds(REPO)
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
