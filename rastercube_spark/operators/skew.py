"""Skew-mitigated equi-join (salting) — the manual counterpart of AQE's
skew-join split, for when one join key dominates (a hot user, a hot
document cluster, a nodata-heavy tile).

A plain shuffle join sends every row of a hot key to ONE reducer; that
task runs for hours while the rest of the cluster idles. Salting splits
each hot key across ``n_salt`` reducers:

- the BIG side gets a deterministic per-row salt in ``[0, n_salt)``
  (xxhash64 of the whole row — no RNG, so re-runs and retries land rows
  on the same reducer);
- the SMALL side is replicated once per salt value (explode of a literal
  range — ``n_salt×`` its size, fine for dimension tables);
- the join runs on ``(keys…, salt)``; dropping the salt afterwards gives
  exactly the plain-join result (each big row matches the one replica
  carrying its salt).

Complements q29's salted aggregation (queries/aggregations.py) and AQE
(`spark.sql.adaptive.skewJoin`, which only kicks in for sort-merge joins
past size thresholds); salting is the explicit, always-available form.
The reference never joins skewed relations (dense array indexing), so
this is net-new engine surface per the brief's scale mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``on`` with the big side's hot keys
    spread over ``n_salt`` reducers. Result ≡ ``big.join(small, on,
    how)`` (property-tested); supports 'inner' and 'left' joins (the
    replicated side must be the lookup side, so right/full variants
    would double-count — rejected)."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner'|'left' only")
    salted_big = big.withColumn(
        _SALT, F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salt))
    )
    replicated = small.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    return salted_big.join(replicated, [*on, _SALT], how).drop(_SALT)
