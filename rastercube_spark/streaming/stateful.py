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
    chain runs as mapInPandas over key-REPARTITIONED, key-then-arrival
    SORTED partitions — one Python invocation per partition, NOT one
    per key (the first cut used groupBy.applyInPandas and spent ~12 ms
    of Arrow/worker round-trip per tiny key group: 9.2 s for 750 keys
    × ~13 rows at sf0.01; the partition-batched form reads the same
    10k rows in well under a second). Anchor state is carried across
    Arrow batches inside a partition (the iterator yields batches in
    partition order), and key changes are detected null-safely, so a
    NULL user_id / event_type still forms its own dedup key exactly as
    groupBy semantics would. The deployment path at 100 TB/day is the
    REAL streaming operator (state in RocksDB, no replay); this batch
    form exists for audits and as the oracle-checkable twin."""
    import numpy as np

    from rastercube_spark.operators.prefix import running_max_exclusive

    delay64 = np.timedelta64(int(delay_s), "s")
    out_cols = ["event_id", ts_col, "user_id", "event_type", "value"]

    e = (
        running_max_exclusive(
            events.select(*out_cols),
            order_col,
            ts_col,
        )
        .withColumnRenamed("__running_max", "prior_max")
        .repartition("user_id", "event_type")
        .sortWithinPartitions("user_id", "event_type", order_col)
    )

    def chain(batches):
        cur_key = object()  # never equals a real key tuple
        anchor = None  # np.datetime64 of the live anchor, or None
        for pdf in batches:
            n = len(pdf)
            uid, et = pdf["user_id"], pdf["event_type"]
            # null-safe key tuples: (isnull, filled) pairs — a NULL key
            # can never collide with a real value's tuple
            keys = list(
                zip(uid.isna(), uid.fillna(0), et.isna(), et.fillna(""))
            )
            wm = (pdf["prior_max"] - pd.Timedelta(seconds=delay_s)).values
            ts = pdf[ts_col].values
            keep = np.zeros(n, dtype=bool)
            for i in range(n):
                if keys[i] != cur_key:
                    cur_key = keys[i]
                    anchor = None
                w = wm[i]
                if anchor is None or (
                    not np.isnat(w) and w >= anchor + delay64
                ):
                    keep[i] = True
                    anchor = ts[i]
            yield pdf.loc[keep, out_cols]

    return e.mapInPandas(chain, DEDUP_WM_SCHEMA).orderBy("event_id")
