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
