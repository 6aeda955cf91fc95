"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY §2.8; builder brief: 'applyInPandasWithState for custom stateful
operators').

``running_user_totals``: per-user running (event count, value sum)
maintained in explicit GroupState across micro-batches — the pattern for
any accumulating per-key state Spark's built-in aggregations can't
express (custom merge logic, bounded structures, early emission). Each
invocation emits the key's CURRENT totals tagged with an invocation
sequence, so an update-mode sink holds the full update history and the
max-seq row per key is the final state (what the conformance test pins
against the batch aggregate).

At scale: state lives in the state store keyed by user (RocksDB-backed on
a real cluster), one Arrow batch per (key, trigger) — no driver
involvement, no unbounded growth beyond live keys.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, sum_value double, seq bigint"
STATE_SCHEMA = "n bigint, s double, seq bigint"


def _track(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
    (user_id,) = key
    n, s, seq = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
    seq += 1
    state.update((n, s, seq))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "sum_value": [round(s, 4)],
            "seq": [seq],
        }
    )


def running_user_totals(events_stream: DataFrame) -> DataFrame:
    """Streaming per-user running totals with explicit state."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _track,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


DEDUP_WM_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, "
    "event_type string, value double"
)


def dedup_within_watermark(
    events: DataFrame,
    delay_s: int = 24 * 3600,
    order_col: str = "event_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Batch replay of Structured Streaming's
    ``dropDuplicatesWithinWatermark(['user_id', 'event_type'])`` under
    ``withWatermark(ts, delay)`` with one event per trigger in arrival
    (``order_col``) order — time-bounded dedup: the first event of a key
    anchors, subsequent events of the key are dropped while the anchor's
    state lives, and the state is evicted once the watermark passes
    anchor_ts + delay (so a key re-appearing after a quiet period is
    kept again and re-anchors). This is the double-send suppressor for
    event streams — q74's dropDuplicates never forgets a key, which is
    wrong for "the same user action re-fires days later".

    Replayed semantics, per the streaming operator's state machine:
    - watermark before event i = max(event time over all PRIOR arrivals)
      − delay (watermark advances at micro-batch boundaries, so event i
      is judged by the watermark the PREVIOUS event established);
    - event kept iff its key has no live anchor, i.e. watermark ≥
      anchor_ts + delay (eviction is NON-strict: state whose
      expiresAt = anchor_ts + delay equals the watermark is already
      evicted — pinned empirically by the streaming conformance test's
      equality fixture, where the real operator KEEPS the boundary row);
    - a kept event re-anchors its key at its own event time.

    Scale shape: the global prior-arrival max rides the distributed
    prefix scan (operators/prefix.py — range partition + per-partition
    window + broadcast offsets, no single-task window); the per-key
    chain is applyInPandas over the key, sequential only within a key's
    (bounded) event list. The deployment path at 100 TB/day is the REAL
    streaming operator (state in RocksDB, no replay); this batch form
    exists for audits and as the oracle-checkable twin."""
    import numpy as np

    from pyspark.sql import functions as F

    from rastercube_spark.operators.prefix import running_max_exclusive

    delay = pd.Timedelta(seconds=delay_s)

    e = running_max_exclusive(
        events.select(
            "event_id", ts_col, "user_id", "event_type", "value"
        ),
        order_col,
        ts_col,
    ).withColumnRenamed("__running_max", "prior_max")

    def chain(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        wm = pdf["prior_max"] - delay
        ts = pdf[ts_col]
        keep = np.zeros(len(pdf), dtype=bool)
        anchor = None
        for i in range(len(pdf)):
            w = wm.iloc[i]
            if anchor is None or (pd.notna(w) and w >= anchor + delay):
                keep[i] = True
                anchor = ts.iloc[i]
        return pdf.loc[
            keep, ["event_id", ts_col, "user_id", "event_type", "value"]
        ]

    return (
        e.groupBy("user_id", "event_type")
        .applyInPandas(chain, DEDUP_WM_SCHEMA)
        .orderBy("event_id")
    )
