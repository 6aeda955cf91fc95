"""Regenerate tests/golden_sf0001.json: per-query row count + value hash
at sf0.001. Run after INTENTIONAL semantic changes:

    python tests/make_golden.py
"""

from __future__ import annotations

import hashlib
import json
import os

from rastercube_spark import registry
from rastercube_spark.session import get_spark

SF = "/root/testdata/sf0.001"
OUT = os.path.join(os.path.dirname(__file__), "golden_sf0001.json")


def query_digest(df) -> tuple[int, str]:
    cols = sorted(df.columns)
    rows = sorted(
        repr(tuple(r[c] for c in cols)) for r in df.collect()
    )
    h = hashlib.md5("\n".join(rows).encode()).hexdigest()
    return len(rows), h


def main() -> None:
    spark = get_spark("golden")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for name, fn in sorted(registry.queries().items()):
        n, h = query_digest(fn(spark, SF))
        out[name] = {"rows": n, "md5": h}
        print(name, n, h)
    with open(OUT, "w") as f:
        json.dump(out, f, indent=2, sort_keys=True)
    print(f"wrote {OUT} ({len(out)} queries)")


if __name__ == "__main__":
    main()
