"""Structured Streaming replay harness for the events surface (Q70-Q74).

Replays the driver's ``events`` table through a real ``readStream`` →
stateful aggregation → ``writeStream`` pipeline so the batch queries in
queries/streaming.py can be conformance-tested against true streaming
execution (SURVEY.md §5.2.5): file-source replay in arrival order,
``withWatermark`` for lateness, memory sink for assertions.

Mechanics worth knowing (they shape the conformance tests):
- the file source admits files per trigger (``maxFilesPerTrigger``) in
  (modification-time, path) order — the harness spaces mtimes to force a
  deterministic arrival order;
- the watermark used by trigger N is computed from data seen through
  trigger N-1, so lateness granularity equals file granularity; staging
  via ``EventReplay.from_rows(..., rows_per_file=1)`` makes that ROW
  granularity — each event arrives in its own trigger, so the exact
  late-drop boundary is exercised one event at a time
  (tests/test_streaming.py::test_watermark_drops_row_granular asserts an
  event that coarse file-granular replay admits is dropped there);
- append-mode windows emit only once the watermark passes their end — the
  harness's ``advance_watermark`` drops sentinel files beyond the real
  data so every real window flushes before the assertion.

The reference has no streaming engine; its closest analog is the
incremental time-append job (complete_ndvi_worldgrid.py:59-186). This
surface is engine-provided (SURVEY §2.8).
"""

from __future__ import annotations

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import DataFrame, SparkSession

EVENT_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, "
    "event_type string, value double"
)

_SENTINEL_TYPE = "__sentinel__"


class EventReplay:
    """Stage the events table as a sequence of parquet files and stream
    them back with per-file triggers."""

    def __init__(
        self,
        spark: SparkSession,
        sf_dir: str,
        work_dir: str,
        n_files: int = 8,
        order_col: str = "event_id",
    ):
        self.spark = spark
        self.work_dir = work_dir
        self.input_dir = os.path.join(work_dir, "input")
        os.makedirs(self.input_dir, exist_ok=True)
        self._file_seq = 0

        from pyspark.sql import functions as F

        from rastercube_spark.sources.tables import load

        # Staging is DISTRIBUTED: repartitionByRange splits the table into
        # n_files contiguous order_col ranges (executor-side sort + write,
        # nothing funnels through the driver — the old toPandas() staging
        # was a driver-memory bottleneck at scale). Range partition i lands
        # in part-file i, so admitting part files in name order replays
        # the table in order_col order, file-granular, exactly as before.
        stats = load(spark, sf_dir, "events").agg(
            F.count("*").alias("n"), F.max("ts").alias("mx")
        ).collect()[0]
        self.n_rows, self.max_ts = stats["n"], stats["mx"]
        stage_dir = os.path.join(work_dir, "_stage")
        (
            load(spark, sf_dir, "events")
            .repartitionByRange(n_files, order_col)
            .sortWithinPartitions(order_col)
            .write.mode("overwrite")
            .parquet(stage_dir)
        )
        for name in sorted(os.listdir(stage_dir)):
            if name.startswith("part-") and name.endswith(".parquet"):
                self._admit_file(os.path.join(stage_dir, name))

    @classmethod
    def from_rows(
        cls,
        spark: SparkSession,
        rows,
        work_dir: str,
        rows_per_file: int = 1,
    ) -> "EventReplay":
        """Stage an explicit arrival sequence (a pandas DataFrame with the
        events schema) instead of a table, ``rows_per_file`` events per
        staged file. ``rows_per_file=1`` is the row-granular mode: the
        file source admits one EVENT per trigger, so watermark lateness
        is decided at row boundaries — the granularity a socket source
        would give, without the nondeterministic batching of one."""
        self = cls.__new__(cls)
        self.spark = spark
        self.work_dir = work_dir
        self.input_dir = os.path.join(work_dir, "input")
        os.makedirs(self.input_dir, exist_ok=True)
        self._file_seq = 0
        self.n_rows = len(rows)
        self.max_ts = rows["ts"].max()
        for i in range(0, len(rows), rows_per_file):
            self._write_file(rows.iloc[i : i + rows_per_file])
        return self

    def _admit_file(self, src: str) -> None:
        """Move a staged parquet file into the stream input dir under the
        next sequence name, with a strictly increasing mtime (the file
        source admits files in (mtime, path) order)."""
        path = os.path.join(self.input_dir, f"{self._file_seq:05d}.parquet")
        os.replace(src, path)
        mtime = time.time() + self._file_seq
        os.utime(path, (mtime, mtime))
        self._file_seq += 1

    def _write_file(self, pdf) -> None:
        path = os.path.join(self.input_dir, f"{self._file_seq:05d}.parquet")
        tbl = pa.Table.from_pandas(pdf, preserve_index=False)
        # parquet µs timestamps: the stream schema says TIMESTAMP, and the
        # engine's nanos-truncation already happened in load()
        pq.write_table(tbl, path, coerce_timestamps="us", allow_truncated_timestamps=True)
        # strictly increasing mtimes fix the file-source admission order
        mtime = time.time() + self._file_seq
        os.utime(path, (mtime, mtime))
        self._file_seq += 1

    def stream(self, max_files_per_trigger: int | None = 1) -> DataFrame:
        """The sentinel rows stay IN the stream — the watermark node only
        sees rows that reach it, so filtering sentinels here would stop
        the watermark from ever passing the real data. Filter them from
        the *sink* (they carry user_id = -1, event_type = '__sentinel__',
        event_id >= 10^12)."""
        reader = self.spark.readStream.schema(EVENT_SCHEMA)
        if max_files_per_trigger is not None:
            reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        return reader.parquet(self.input_dir)

    def duplicate_files(self) -> None:
        """Re-stage a copy of every staged file (later mtimes) — feeds each
        event twice for dedup conformance."""
        import pandas as pd

        for name in sorted(os.listdir(self.input_dir)):
            pdf = pq.read_table(os.path.join(self.input_dir, name)).to_pandas()
            self._write_file(pdf)

    def advance_watermark(self, minutes: int = 120) -> None:
        """Drop a sentinel file far past the real data so the watermark
        passes every real window (the sentinel rows are filtered out of
        the stream itself)."""
        import pandas as pd

        row = pd.DataFrame(
            {
                "event_id": [10**12 + self._file_seq],
                "ts": [self.max_ts + pd.Timedelta(minutes=minutes)],
                "user_id": [-1],
                "event_type": [_SENTINEL_TYPE],
                "value": [0.0],
            }
        )
        self._write_file(row)


def run_to_completion(
    stream_df: DataFrame,
    replay: EventReplay,
    name: str,
    output_mode: str = "append",
    flushes: int = 2,
) -> DataFrame:
    """Start the streaming query on a memory sink, drain all staged files,
    then drop ``flushes`` sentinel files (each processed in its own
    trigger) so append-mode state flushes; return the sink as a DataFrame.
    """
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(processingTime="200 milliseconds")
        .option("checkpointLocation", os.path.join(replay.work_dir, f"ckpt_{name}"))
        .start()
    )
    try:
        q.processAllAvailable()
        for _ in range(flushes):
            replay.advance_watermark()
            q.processAllAvailable()
    finally:
        q.stop()
    return replay.spark.table(name)
