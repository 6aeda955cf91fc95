"""Edge-events oracle harness — the events-table counterpart of
test_edge_corpus.py: every events-driven query re-compared against its
oracle on a stream the driver fixture doesn't have — NULL user_id /
value / event_type / props, duplicate event ids, and exact-boundary /
tied timestamps.

``ts`` itself stays non-null: event TIME is the one column an
event-time engine requires at ingest (a record without it cannot enter
a watermarked pipeline; Spark's window generator and DuckDB's
time_bucket also disagree about NULL event time, so admitting it would
test ingest policy, not the engine). Everything else is fair game.
"""

from __future__ import annotations

import os
from datetime import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rastercube_spark import registry
from rastercube_spark.testing import compare, duck_connection

BASE_SF = "/root/testdata/sf0.001"


def _ts(minute: int, second: int = 0, micro: int = 0) -> datetime:
    return datetime(2024, 1, 1, 0, minute, second, micro)


# (event_id, ts, user_id, event_type, value, props)
EDGE_EVENTS = [
    # a normal-looking session for user 1, spanning window boundaries
    (1, _ts(1), 1, "view", 1.0, '{"k": 1}'),
    (2, _ts(9, 59, 999999), 1, "click", 2.5, None),       # window edge
    (3, _ts(10), 1, "click", None, '{"k": 2}'),           # NULL value
    (4, _ts(25), 1, "purchase", 10.0, "{}"),
    # NULL user_id: groups/partitions must treat it identically
    (5, _ts(3), None, "view", 1.5, None),
    (6, _ts(7), None, "click", 0.5, None),
    # NULL event_type: a NULL group key for the windowed aggs
    (7, _ts(12), 2, None, 3.0, None),
    # duplicate event_id, later ts — q74 keeps the earliest
    (8, _ts(5), 2, "view", 1.0, None),
    (8, _ts(6), 2, "view", 1.0, None),
    # same event_id AND ts, different user — q74's user_id tie-break
    (9, _ts(8), 4, "error", 7.0, None),
    (9, _ts(8), 3, "error", 7.0, None),
    # a click exactly 60 minutes after a view: q76's inclusive bound
    (10, _ts(0), 5, "view", 1.0, None),
    (11, _ts(59, 59), 5, "click", 1.0, None),
    (12, _ts(0), 6, "view", 1.0, None),
]

QUERIES = [
    "q17_asof_join",
    "q70_tumbling_window",
    "q71_sliding_window",
    "q72_session_window",
    "q73_watermark_late_data",
    "q74_stateful_dedup",
    "q75_stream_static_join",
    "q76_stream_stream_join",
]


@pytest.fixture(scope="module")
def edge_ev_dir(tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("edge_events")
    for f in os.listdir(BASE_SF):
        if f != "events.parquet":
            os.symlink(os.path.join(BASE_SF, f), os.path.join(d, f))
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in EDGE_EVENTS], pa.int64()),
            "ts": pa.array([r[1] for r in EDGE_EVENTS], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in EDGE_EVENTS], pa.int64()),
            "event_type": pa.array([r[3] for r in EDGE_EVENTS], pa.string()),
            "value": pa.array([r[4] for r in EDGE_EVENTS], pa.float64()),
            "props": pa.array([r[5] for r in EDGE_EVENTS], pa.string()),
        }
    )
    pq.write_table(tbl, os.path.join(d, "events.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def edge_ev_duck(edge_ev_dir):
    con = duck_connection(edge_ev_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", QUERIES)
def test_edge_events_vs_oracle(name, spark, edge_ev_dir, edge_ev_duck):
    df = registry.queries()[name](spark, edge_ev_dir)
    report = compare(df, edge_ev_duck, registry.oracle_sql()[name])
    assert report["ok"], report


# q77 dedups over the ARRIVAL LOG: event_id is its arrival sequence
# number, so the contract requires it unique (true of the driver table
# by construction — TESTDATA.md). Under a duplicated event_id the
# arrival order itself is undefined, so q77 is edge-tested on the
# unique-arrival subset — keeping every NULL-key row, which is the
# interesting part: NULL user_id / event_type form their OWN dedup key
# (Spark groupBy semantics; the oracle's recursive chain joins with
# IS NOT DISTINCT FROM to match).
@pytest.fixture(scope="module")
def edge_ev_unique_dir(tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("edge_events_uniq")
    for f in os.listdir(BASE_SF):
        if f != "events.parquet":
            os.symlink(os.path.join(BASE_SF, f), os.path.join(d, f))
    seen: set[int] = set()
    rows = []
    for r in EDGE_EVENTS:
        if r[0] in seen:
            continue
        seen.add(r[0])
        rows.append(r)
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )
    pq.write_table(tbl, os.path.join(d, "events.parquet"))
    return str(d)


def test_edge_events_dedup_within_watermark(spark, edge_ev_unique_dir):
    con = duck_connection(edge_ev_unique_dir)
    try:
        df = registry.queries()["q77_dedup_within_watermark"](
            spark, edge_ev_unique_dir
        )
        report = compare(
            df, con, registry.oracle_sql()["q77_dedup_within_watermark"]
        )
        assert report["ok"], report
    finally:
        con.close()
