"""Golden-results regression guard: every registered query's sf0.001
output is pinned by (row count, value hash). This catches semantic drift
the oracle gate can't — when a Spark query and its oracle SQL are edited
*together*, they still agree with each other while both diverge from the
previous behavior. Intentional changes: regenerate with
``python tests/make_golden.py`` and review the diff."""

from __future__ import annotations

import json
import os

import pytest

from rastercube_spark import registry

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden_sf0001.json")
GOLDEN_SF = "/root/testdata/sf0.001"

with open(GOLDEN_PATH) as f:
    _GOLDEN = json.load(f)

_QUERIES = registry.queries()


def test_golden_covers_all_queries():
    assert set(_GOLDEN) == set(_QUERIES), (
        "golden file out of date — run python tests/make_golden.py"
    )


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_golden(name, spark):
    from tests.make_golden import query_digest

    n, h = query_digest(_QUERIES[name](spark, GOLDEN_SF))
    want = _GOLDEN[name]
    assert (n, h) == (want["rows"], want["md5"]), (
        f"{name} output changed vs golden (rows {n} vs {want['rows']}); "
        "if intentional, regenerate tests/golden_sf0001.json"
    )
