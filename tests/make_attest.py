"""Record the per-query source-closure hash baseline
(tests/attest_hashes.json) — run IN THE SAME COMMIT that rotates
registry.ATTEST_CHANGED / ATTEST_STALE / ATTEST_EXEMPT:

    python tests/make_attest.py

Refuses to write while the rotation contract is violated (a query whose
closure changed vs the current baseline but which is neither in the
driver window nor exempted), so the baseline cannot be used to paper
over an unrotated change; git history pairs every baseline update with
the registry edit that justified it.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(
    0, os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))
)

from rastercube_spark import registry  # noqa: E402
from rastercube_spark.attest import all_hashes, violations  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "attest_hashes.json")


def main() -> int:
    cur = all_hashes()
    if os.path.exists(OUT):
        with open(OUT) as f:
            old = json.load(f)
        bad = violations(
            cur, old, set(registry.ATTEST_FIRST), set(registry.ATTEST_EXEMPT)
        )
        if bad:
            print(
                "REFUSING to update baseline: closure changed outside the "
                f"window and unexempted for: {', '.join(bad)}\n"
                "Rotate them into registry.ATTEST_CHANGED (or justify in "
                "ATTEST_EXEMPT) first."
            )
            return 1
    with open(OUT, "w") as f:
        json.dump(cur, f, indent=1, sort_keys=True)
    print(f"wrote {OUT} ({len(cur)} queries)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
