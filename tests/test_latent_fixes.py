"""Regression tests for the four latent bugs from ADVICE r3 (none were
exercised by the oracle gate, which is exactly why they mattered):

1. repair_truncate left a stale partition on disk forever when ALL of a
   partition's rows were overgrown (dynamic overwrite writes nothing for
   an empty partition), while counting it "fixed" every run.
2. write_long/write_arrays under a session-global dynamic
   partitionOverwriteMode kept partitions the new data didn't touch —
   rewriting a cube with fewer partitions left stale ones.
3. running_max_exclusive crashed on an all-NULL bucket (None > best) and
   could mis-bucket int64 order values above 2^53 via a double cast.
4. min_label_clusters silently returned wrong labels when the component
   diameter exceeded max_iter.
"""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import Window, functions as F

from rastercube_spark.operators.graph import min_label_clusters
from rastercube_spark.operators.prefix import running_max_exclusive
from rastercube_spark.sources.raster import CubeHeader, RasterCube

W, H, ND = 40, 40, 6
NODATA = -3000


def _header() -> CubeHeader:
    return CubeHeader(
        width=W,
        height=H,
        frac_width=20,
        frac_height=20,
        dtype="int16",
        nodataval=NODATA,
        frac_ndates=2,
        timestamps_ms=[1000 * 86400 * (i + 1) for i in range(ND)],
    )


def test_repair_truncate_all_overgrown_partition(spark, tmp_path):
    """A partition whose rows are ALL beyond the time axis must be
    deleted, not silently kept: repair → no overgrown rows anywhere →
    second repair returns 0 (true idempotence)."""
    rng = np.random.RandomState(3)
    data = rng.randint(-2000, 10001, size=(H, W, ND)).astype(np.int16)
    c = RasterCube(str(tmp_path / "cube"), _header())
    c.write_arrays(spark, data)

    # fabricate a WHOLLY overgrown partition: a brand-new trailing
    # time_chunk containing only rows with t >= ndates
    last_chunk = (ND - 1) // c.header.frac_ndates
    bogus = (
        c.df(spark)
        .where((F.col("time_chunk") == last_chunk) & (F.col("t") == ND - 1))
        .withColumn("t", F.lit(ND).cast("int"))
        .withColumn("time_chunk", F.lit(last_chunk + 1).cast("int"))
    )
    bogus.write.mode("append").partitionBy("frac_num", "time_chunk").parquet(
        c.data_path
    )
    assert c.df(spark).where(F.col("time_chunk") > last_chunk).count() > 0

    assert c.repair_truncate(spark) >= 1
    assert c.df(spark).where(F.col("t") >= ND).count() == 0
    assert c.df(spark).where(F.col("time_chunk") > last_chunk).count() == 0
    got = c.load_slice_array(spark, (0, 0), (W, H))
    np.testing.assert_array_equal(got, data)
    # the old bug: stale partition stayed → every run re-counted it fixed
    assert c.repair_truncate(spark) == 0


def test_full_write_replaces_all_partitions_despite_dynamic_conf(spark, tmp_path):
    """write_arrays is a whole-table overwrite even when the session conf
    has partitionOverwriteMode=dynamic (leaked from another writer)."""
    rng = np.random.RandomState(5)
    big = rng.randint(-2000, 10001, size=(H, W, ND)).astype(np.int16)
    c = RasterCube(str(tmp_path / "cube"), _header())
    c.write_arrays(spark, big)
    n_parts_before = c.df(spark).select("frac_num", "time_chunk").distinct().count()
    assert n_parts_before > 1

    old = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    try:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # rewrite the cube with a SHORTER time axis → fewer partitions
        small_header = _header()
        small_header.timestamps_ms = small_header.timestamps_ms[:2]
        c2 = RasterCube(c.root, small_header)
        c2.write_arrays(spark, big[:, :, :2])
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old)

    # stale trailing time_chunk partitions must be gone
    assert c2.df(spark).agg(F.max("time_chunk")).first()[0] == 0
    got = c2.load_slice_array(spark, (0, 0), (W, H))
    np.testing.assert_array_equal(got, big[:, :, :2])


def test_running_max_all_null_bucket(spark):
    """An order-contiguous run of NULL values (an entire bucket's worth)
    must not crash the driver-side prefix combine."""
    rows = [(i, None if 20 <= i < 60 else float(i % 7)) for i in range(100)]
    df = spark.createDataFrame(rows, "ord int, v double")
    got = running_max_exclusive(df, "ord", "v", num_buckets=10)
    w = Window.orderBy("ord").rowsBetween(Window.unboundedPreceding, -1)
    want = df.withColumn("__running_max", F.max("v").over(w))
    g = {r["ord"]: r["__running_max"] for r in got.collect()}
    x = {r["ord"]: r["__running_max"] for r in want.collect()}
    assert g == x


def test_running_max_int64_above_2_53(spark):
    """Order values above 2^53 lose precision as doubles; bucketing must
    stay in the integer domain or rows land in the wrong bucket."""
    base = 1 << 60
    # adjacent int64 orders that collapse to the same double
    rows = [(base + i, i) for i in range(0, 2000)]
    df = spark.createDataFrame(rows, "ord long, v long")
    got = running_max_exclusive(df, "ord", "v", num_buckets=8)
    w = Window.orderBy("ord").rowsBetween(Window.unboundedPreceding, -1)
    want = df.withColumn("__running_max", F.max("v").over(w))
    g = {r["ord"]: r["__running_max"] for r in got.collect()}
    x = {r["ord"]: r["__running_max"] for r in want.collect()}
    assert g == x


def test_min_label_long_path_converges(spark):
    """A path graph of length 60 (diameter 60 > default max_iter=20)
    must still produce one cluster — pointer doubling makes convergence
    logarithmic in diameter."""
    n = 61
    pairs = spark.createDataFrame(
        [(f"d{i:03d}", f"d{i + 1:03d}") for i in range(n - 1)],
        "doc_a string, doc_b string",
    )
    labels = min_label_clusters(pairs, max_iter=20)
    clusters = {r["cluster_id"] for r in labels.collect()}
    assert clusters == {"d000"}
    assert labels.count() == n


def test_min_label_raises_instead_of_wrong_labels(spark):
    """If the iteration budget genuinely can't cover the diameter, the
    operator must raise, never return silently wrong labels."""
    pairs = spark.createDataFrame(
        [(f"d{i:03d}", f"d{i + 1:03d}") for i in range(10)],
        "doc_a string, doc_b string",
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        # contract_passes=0 pins the budget-raise semantics of the global
        # loop itself: with contraction on, a graph this small may
        # legitimately collapse in the pre-pass and converge within one
        # round, which is the correct behavior, not the one under test
        min_label_clusters(pairs, max_iter=1, contract_passes=0)


def test_contract_stars_label_invariance(spark):
    """The union-find pre-pass must be label-INVARIANT: same
    (doc_id, cluster_id) relation with contraction off, one pass, and
    two passes — on a mix of chains, a clique, a singleton pair, and
    string ids (r8; the driver hash gate depends on this)."""
    edges = (
        # chain of 8
        [(f"c{i}", f"c{i + 1}") for i in range(8)]
        # clique of 5 (all pairs)
        + [(f"k{i}", f"k{j}") for i in range(5) for j in range(i + 1, 5)]
        # isolated pair + a self-loop singleton
        + [("p0", "p1"), ("s9", "s9")]
    )
    pairs = spark.createDataFrame(edges, "doc_a string, doc_b string")
    want = sorted(
        map(tuple, min_label_clusters(pairs, contract_passes=0).collect())
    )
    for passes in (1, 2, 3):
        got = sorted(
            map(tuple, min_label_clusters(pairs, contract_passes=passes).collect())
        )
        assert got == want, f"contract_passes={passes}"
    # sanity on the expected content itself
    as_map = dict(want)
    assert as_map["c5"] == "c0" and as_map["k3"] == "k0"
    assert as_map["p1"] == "p0" and as_map["s9"] == "s9"


def test_contract_stars_collapses_clique_edges(spark):
    """A partition-local clique's |V|²/2 candidate edges must leave the
    pre-pass as ≤ |V| star edges — the 100 TB volume argument (dense LSH
    buckets emit cliques)."""
    from rastercube_spark.operators.graph import _contract_stars

    n = 40
    pairs = spark.createDataFrame(
        [(i, j) for i in range(n) for j in range(i + 1, n)],
        "src bigint, dst bigint",
    )
    stars = _contract_stars(pairs.coalesce(1)).collect()
    assert len(stars) <= n
    # every vertex survives, root is the component minimum
    verts = {r["dst"] for r in stars} | {r["src"] for r in stars}
    assert verts == set(range(n))
    assert {r["src"] for r in stars} == {0}


def test_driver_finish_fires_at_fixture_scale(spark, sf_dir, monkeypatch):
    """VERDICT r8 #1's accounting gap: the size-gated driver finish must
    actually FIRE inside the registered qb2 at fixture scale — if the
    contracted star relation somehow exceeded the gate (or the gate
    logic regressed), qb2 would silently fall back to the materialized
    pointer-doubling rounds whose per-round barrier cost is exactly
    what the r8 rework removed. Asserted by interception, not timing."""
    from rastercube_spark.operators import graph
    from rastercube_spark.registry import queries

    fired = []
    real = graph._driver_finish

    def spy(stars):
        fired.append(stars.count())
        return real(stars)

    monkeypatch.setattr(graph, "_driver_finish", spy)
    out = queries()["qb2_semantic_dedup"](spark, sf_dir)
    assert out.count() > 0
    assert fired and fired[0] <= 1_000_000, (
        "driver finish did not fire: qb2 ran the distributed loop at "
        "fixture scale"
    )


_ABOVE_GATE_SCRIPT = """
import json, sys
from pyspark.sql import functions as F
from pyspark.sql.types import LongType
from rastercube_spark.operators import graph
from rastercube_spark.session import get_spark

gate = graph.driver_finish_gate(LongType())
assert gate == 3_200_000  # time-evidence ceiling (1 GiB/256 B would allow 4.19M)
def boom(stars):
    raise AssertionError("driver finish fired above the gate")
graph._driver_finish = boom
spark = get_spark("above-gate-test")
spark.sparkContext.setLogLevel("ERROR")
n_pairs = gate + 100_000
pairs = spark.range(n_pairs).select(
    (F.col("id") * 2).alias("doc_a"), (F.col("id") * 2 + 1).alias("doc_b")
)
out = graph.min_label_clusters(pairs)
agg = out.agg(
    F.count("*").alias("n"),
    F.countDistinct("cluster_id").alias("n_clusters"),
    F.sum(
        (F.col("cluster_id") != F.col("doc_id") - F.col("doc_id") % 2)
        .cast("long")
    ).alias("n_wrong"),
).first()
print("RESULT " + json.dumps(
    {"gate": gate, "n_pairs": n_pairs, "n": agg["n"],
     "n_clusters": agg["n_clusters"], "n_wrong": agg["n_wrong"]}))
spark.stop()
"""


def test_distributed_path_engages_above_gate():
    """The 100 TB path above the driver-finish gate (VERDICT r9 "what's
    wrong" #3): build a contracted star relation LARGER than the derived
    default gate (gate+100k disjoint 2-cliques → > the 3.2M time-evidence
    ceiling) and assert by interception that the driver finish does NOT
    fire — the distributed pointer-doubling loop runs on the contracted
    graph — and that its labels are exact, checked by aggregates (2×
    pairs rows, one cluster per pair, cluster_id = the even pair
    minimum) rather than a multi-million-row collect.

    Own subprocess JVM (the scaling-leg isolation pattern): the shared
    test session keeps the suite's deliberate 1 GiB driver-heap
    discipline, while the distributed loop's per-round checkpoints at
    ~6.6M rows need real (production-executor-like) heap in local mode."""
    import json
    import os
    import subprocess
    import sys

    from pyspark.sql.types import LongType, StringType

    from rastercube_spark.operators import graph

    # the derived defaults themselves (pure logic, no Spark):
    # int64 → the 3.2M measured-time ceiling; md5-string ids → the
    # 1 GiB / 512 B memory bound engages first
    assert graph.driver_finish_gate(LongType()) == 3_200_000
    assert graph.driver_finish_gate(StringType()) == (1 << 30) // 512

    env = dict(os.environ, PYSPARK_SUBMIT_ARGS="--driver-memory 8g pyspark-shell")
    proc = subprocess.run(
        [sys.executable, "-c", _ABOVE_GATE_SCRIPT],
        capture_output=True, text=True, timeout=600, env=env,
    )
    result = None
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            result = json.loads(line[len("RESULT "):])
    assert result is not None, proc.stderr[-3000:]
    assert result["n"] == 2 * result["n_pairs"]
    assert result["n_clusters"] == result["n_pairs"]
    assert result["n_wrong"] == 0


def test_min_label_empty_and_singleton_edge_sets(spark):
    """The Arrow driver finish (r9) must hold its schema contract on
    the degenerate inputs a zero-near-dup corpus produces: empty edge
    relations (both id types) return empty with the right schema; a
    single pair collapses to one cluster."""
    empty_s = spark.createDataFrame([], "doc_a string, doc_b string")
    out = min_label_clusters(empty_s)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["doc_id", "cluster_id"]
    assert out.schema["doc_id"].dataType.simpleString() == "string"
    empty_b = spark.createDataFrame([], "doc_a bigint, doc_b bigint")
    assert min_label_clusters(empty_b).count() == 0
    one = spark.createDataFrame([(1, 2)], "doc_a bigint, doc_b bigint")
    assert sorted(map(tuple, min_label_clusters(one).collect())) == [
        (1, 1),
        (2, 1),
    ]
