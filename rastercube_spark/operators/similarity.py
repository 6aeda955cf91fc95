"""Similarity search over embedding columns (array<float>).

- cosine(): pure column expression (zip_with + aggregate) — JVM-side, no
  UDF, works inside joins and windows.
- brute_force_knn(): exact top-k by cosine; the N×M score matrix is a
  (broadcast) join, top-k a per-query window. Baseline / recall oracle.
- lsh_knn(): scale path — random-hyperplane LSH buckets shrink the
  candidate set before exact scoring; buckets are deterministic (fixed
  hyperplanes derived from a seeded generator), so results are reproducible.

At 100 TB: broadcast the (small) query set, never the corpus; the LSH
variant shuffles corpus rows once on the bucket key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two float-array columns, as a column expr."""
    return _dot(a, b) / (_norm(a) * _norm(b))


# NOTE (negative result worth keeping): unrolling the dot product into
# dim explicit multiply-adds was measured ~3× SLOWER than the F.aggregate
# fold at dim=64 — the giant expression tree blows past codegen limits
# and falls back to interpreted eval. The fold is the right form.


def brute_force_knn(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query by cosine (self-matches excluded)."""
    scored = corpus.join(F.broadcast(queries)).where(
        F.col(q_id) != F.col(c_id)
    ).select(
        F.col(q_id),
        F.col(c_id),
        # rank on the 6-dp rounded score: fp-identical across engines, so
        # the top-k set is deterministic (ties broken by corpus id)
        F.round(cosine(F.col(q_vec), F.col(c_vec)), 6).alias("cosine"),
    )
    w = Window.partitionBy(q_id).orderBy(F.col("cosine").desc(), F.col(c_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(q_id, c_id, "cosine", "rank")
    )


# --- IVF (coarse quantizer) --------------------------------------------

def ivf_centroids(dim: int, n_cents: int, seed: int = 11) -> list[list[float]]:
    """Deterministic pseudo-random coarse centroids (LCG — driver-side
    literals, like the LSH hyperplanes). Production swaps in k-means-
    trained centroids with the same shape; the operator topology is
    identical."""
    return _hyperplanes(dim, n_cents, seed)


def ivf_assign(vec: Column, cents: list[list[float]]) -> Column:
    """Nearest-centroid id by max inner product (ties → lowest id),
    as an array_max over (dot, priority) structs — linear expression
    tree, no when-chain blowup."""
    n = len(cents)
    scored = [
        F.struct(
            F.aggregate(
                F.zip_with(
                    vec,
                    F.array(*[F.lit(v) for v in c]),
                    lambda x, y: x.cast("double") * y,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ).alias("dot"),
            F.lit(n - 1 - i).alias("pri"),
        )
        for i, c in enumerate(cents)
    ]
    best = F.array_max(F.array(*scored))
    return (F.lit(n - 1) - best["pri"]).alias("cid")


def ivf_probe_lists(vec: Column, cents: list[list[float]], nprobe: int) -> Column:
    """Top-``nprobe`` centroid ids for a query vector (dot desc, id asc):
    sort the (dot, priority) structs descending and slice."""
    n = len(cents)
    scored = [
        F.struct(
            F.aggregate(
                F.zip_with(
                    vec,
                    F.array(*[F.lit(v) for v in c]),
                    lambda x, y: x.cast("double") * y,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ).alias("dot"),
            F.lit(n - 1 - i).alias("pri"),
        )
        for i, c in enumerate(cents)
    ]
    top = F.slice(F.sort_array(F.array(*scored), asc=False), 1, nprobe)
    return F.transform(top, lambda s: F.lit(n - 1) - s["pri"])


def ivf_knn(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 10,
    n_cents: int = 16,
    nprobe: int = 4,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
) -> DataFrame:
    """IVF approximate kNN: corpus rows live in their nearest-centroid
    inverted list; each query scores only the lists it probes.

    Scale shape: assignment is a per-row column expression (one pass, no
    shuffle); the probe join is an equi-join on the centroid id whose
    fan-out is nprobe/n_cents of the corpus — the standard IVF cost
    model. The corpus shuffles once on cid (or is bucketed by it on
    disk, making repeat queries shuffle-free).
    """
    cents = ivf_centroids(dim, n_cents)
    cb = corpus.withColumn("cid", ivf_assign(F.col(c_vec), cents))
    qb = queries.select(
        F.col(q_id),
        F.col(q_vec),
        F.explode(ivf_probe_lists(F.col(q_vec), cents, nprobe)).alias("cid"),
    )
    scored = cb.join(F.broadcast(qb), "cid").where(
        F.col(q_id) != F.col(c_id)
    ).select(
        F.col(q_id),
        F.col(c_id),
        F.round(cosine(F.col(q_vec), F.col(c_vec)), 6).alias("cosine"),
    )
    w = Window.partitionBy(q_id).orderBy(F.col("cosine").desc(), F.col(c_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(q_id, c_id, "cosine", "rank")
    )


# --- LSH (random hyperplanes) ------------------------------------------

def _hyperplanes(dim: int, n_planes: int, seed: int = 7) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (LCG; no numpy at runtime
    on executors — these are driver-side literals baked into the plan)."""
    state = seed
    planes = []
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            row.append(((state >> 33) / float(1 << 31)) - 1.0)  # [-1, 1)
        planes.append(row)
    return planes


def lsh_bucket(vec: Column, dim: int, n_planes: int = 8, seed: int = 7) -> Column:
    """Sign-pattern bucket id (0 .. 2^n_planes−1) for a vector column."""
    planes = _hyperplanes(dim, n_planes, seed)
    bucket = F.lit(0)
    for i, plane in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(v) for v in plane]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(proj >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def lsh_knn(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only corpus rows in the query's LSH bucket.

    Trade recall for a ~2^n_planes candidate reduction; equi-join on the
    bucket key replaces the cross join, so this scales to corpora that
    cannot be cross-joined.
    """
    qb = queries.withColumn("bucket", lsh_bucket(F.col(q_vec), dim, n_planes))
    cb = corpus.withColumn("bucket", lsh_bucket(F.col(c_vec), dim, n_planes))
    scored = cb.join(F.broadcast(qb), "bucket").where(
        F.col(q_id) != F.col(c_id)
    ).select(
        F.col(q_id),
        F.col(c_id),
        F.round(cosine(F.col(q_vec), F.col(c_vec)), 6).alias("cosine"),
    )
    w = Window.partitionBy(q_id).orderBy(F.col("cosine").desc(), F.col(c_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(q_id, c_id, "cosine", "rank")
    )
