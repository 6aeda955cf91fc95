"""The engine's primary correctness gate, mirroring the driver: every
registered query runs on Spark and (when SQL-expressible) against its
DuckDB oracle on the same parquet — row count + order-insensitive value
match (SURVEY.md §5.2.1)."""

from __future__ import annotations

import pytest

from rastercube_spark import registry
from rastercube_spark.testing import compare

_QUERIES = registry.queries()
_ORACLES = registry.oracle_sql()

# Queries allowed a float tolerance instead of the driver-mirroring exact
# compare. Keep this list EMPTY unless a query's semantics are genuinely
# tolerance-bounded (libm-version-dependent math, iterative convergence);
# everything else must match the oracle bit-for-bit, because the driver's
# gate is an exact value hash (CORRECTNESS_r03 qr07 lesson).
_FLOAT_TOL: dict[str, float] = {}


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_vs_oracle(name, spark, duck, sf_dir):
    df = _QUERIES[name](spark, sf_dir)
    if name not in _ORACLES:
        # rows-only check for non-SQL-expressible ops
        assert df.count() >= 0
        return
    report = compare(df, duck, _ORACLES[name], float_tol=_FLOAT_TOL.get(name, 0.0))
    assert report["ok"], report
