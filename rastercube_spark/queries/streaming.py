"""Q70-Q74 — event-time windowing surface (SURVEY.md §2.9).

Spark's `window()` / `session_window()` work identically in batch and in
Structured Streaming, so the registered queries here run them in batch
(deterministic, oracle-checkable) and `rastercube_spark.streaming.replay`
re-runs the same aggregations through a real readStream→writeStream
pipeline with watermarks; the conformance test (tests/test_streaming.py)
asserts the terminal sink state matches these batch results (SURVEY §5.2.5).

The reference's only streaming analog is the idempotent time-append (D2,
reference complete_ndvi_worldgrid.py:59-134); the full event-time surface
is engine-provided (§2.8).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from rastercube_spark.queries._util import davg, davg_sql
from rastercube_spark.registry import query
from rastercube_spark.sources.tables import load


@query(
    "q70_tumbling_window",
    oracle=f"""
        SELECT event_type,
               time_bucket(INTERVAL '10 minutes', ts) AS window_start,
               count(*) AS cnt,
               {davg_sql('value')} AS avg_value
        FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events) events
        GROUP BY event_type, window_start
        ORDER BY event_type, window_start
    """,
)
def q70(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy("event_type", F.window("ts", "10 minutes").alias("w"))
        .agg(F.count("*").alias("cnt"), davg("value").alias("avg_value"))
        .select(
            "event_type",
            F.col("w.start").alias("window_start"),
            "cnt",
            "avg_value",
        )
        .orderBy("event_type", "window_start")
    )


@query(
    "q71_sliding_window",
    oracle=f"""
        SELECT event_type, window_start, count(*) AS cnt, {davg_sql('value')} AS avg_value
        FROM (
            SELECT event_type, value,
                   time_bucket(INTERVAL '5 minutes', ts) - k.k * INTERVAL '5 minutes'
                       AS window_start,
                   ts
            FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events) events
            CROSS JOIN (VALUES (0), (1)) k(k)
        )
        WHERE ts >= window_start AND ts < window_start + INTERVAL '10 minutes'
        GROUP BY event_type, window_start
        ORDER BY event_type, window_start
    """,
)
def q71(spark, sf_dir):
    """10-minute windows sliding every 5: each event lands in 2 windows.
    The oracle reproduces Spark's epoch-aligned window assignment with
    time_bucket arithmetic."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy("event_type", F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count("*").alias("cnt"), davg("value").alias("avg_value"))
        .select(
            "event_type",
            F.col("w.start").alias("window_start"),
            "cnt",
            "avg_value",
        )
        .orderBy("event_type", "window_start")
    )


@query(
    "q72_session_window",
    oracle="""
        SELECT user_id, min(ts) AS session_start, count(*) AS n_events
        FROM (
            SELECT user_id, ts,
                   SUM(is_new) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS session_id
            FROM (
                SELECT user_id, ts, event_id,
                       CASE WHEN ts - lag(ts) OVER (
                                PARTITION BY user_id ORDER BY ts, event_id
                            ) <= INTERVAL '30 minutes'
                            THEN 0 ELSE 1 END AS is_new
                FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events) events
            )
        )
        GROUP BY user_id, session_id
        ORDER BY user_id, session_start
    """,
)
def q72(spark, sf_dir):
    """Session windows, 30-minute gap. Spark's session_window() in batch;
    the oracle uses the classic gap-islands formulation (lag + cumulative
    sum), which is also how an engine without native sessionization would
    express it."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.min("ts").alias("session_start"), F.count("*").alias("n_events"))
        .select("user_id", "session_start", "n_events")
        .orderBy("user_id", "session_start")
    )


@query(
    "q73_watermark_late_data",
    oracle=f"""
        -- watermark semantics on the arrival stream (arrival order =
        -- event_id order in TESTDATA): a row is DROPPED iff its event time
        -- is more than 15 minutes behind the max event time already seen.
        SELECT event_type,
               time_bucket(INTERVAL '10 minutes', ts) AS window_start,
               count(*) AS cnt
        FROM (
            SELECT event_type, ts,
                   max(ts) OVER (
                       ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ) AS max_seen
            FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events) events
        )
        WHERE max_seen IS NULL OR ts >= max_seen - INTERVAL '15 minutes'
        GROUP BY event_type, window_start
        ORDER BY event_type, window_start
    """,
)
def q73(spark, sf_dir):
    """Watermark/late-data semantics, expressed relationally: drop rows
    whose event time lags the running max by > 15 minutes (what
    withWatermark('ts', '15 minutes') drops on replay in arrival order).

    The running max over the global arrival order uses the distributed
    prefix scan (operators/prefix.py) — range-partition + per-partition
    window + broadcast offsets — NOT a single-task global window, so the
    batch form holds at scale. The true Structured Streaming replay lives
    in rastercube_spark/streaming/replay.py and is conformance-tested
    (tests/test_streaming.py)."""
    from rastercube_spark.operators.prefix import running_max_exclusive

    e = load(spark, sf_dir, "events")
    kept = (
        running_max_exclusive(e, "event_id", "ts")
        .withColumnRenamed("__running_max", "max_seen")
        .where(
            F.col("max_seen").isNull()
            | (F.col("ts") >= F.col("max_seen") - F.expr("INTERVAL 15 minutes"))
        )
    )
    return (
        kept.groupBy("event_type", F.window("ts", "10 minutes").alias("w"))
        .agg(F.count("*").alias("cnt"))
        .select("event_type", F.col("w.start").alias("window_start"), "cnt")
        .orderBy("event_type", "window_start")
    )


@query(
    "q74_stateful_dedup",
    oracle="""
        SELECT event_id, ts, user_id, event_type, value
        FROM (
            SELECT event_id, ts, user_id, event_type, value,
                   row_number() OVER (
                       PARTITION BY event_id ORDER BY ts, user_id
                   ) AS rn
            FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events) events
        )
        WHERE rn = 1
        ORDER BY event_id
    """,
)
def q74(spark, sf_dir):
    """Stateful dedup on event_id (earliest wins — deterministic form of
    dropDuplicates(['event_id']); the streaming variant with watermark state
    is in streaming/replay.py)."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_id").orderBy("ts", "user_id")
    return (
        e.select("event_id", "ts", "user_id", "event_type", "value")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
        .orderBy("event_id")
    )


@query(
    "q75_stream_static_join",
    oracle=f"""
        SELECT n.n_name,
               time_bucket(INTERVAL '30 minutes', e.ts) AS window_start,
               count(*) AS cnt,
               {davg_sql('e.value')} AS avg_value
        FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events) e
        JOIN nation n ON n.n_nationkey = e.user_id % 25
        GROUP BY n.n_name, window_start
        ORDER BY n.n_name, window_start
    """,
)
def q75(spark, sf_dir):
    """Stream-static enrichment join — the remaining Structured
    Streaming join surface next to q70-q74's windowed/stateful aggs:
    an unbounded event stream enriched against a bounded dimension
    (here ``nation`` via user_id % 25 — the demographic/config lookup
    every event pipeline performs), then windowed per dimension value.
    Registered in its deterministic batch form (stream-static joins are
    batch-equivalent by definition: the static side is fixed across
    microbatches); tests/test_streaming.py re-runs it through a real
    readStream → static join → watermark → windowed agg → writeStream
    pipeline and asserts the terminal sink matches this result.

    Scale shape: the dimension broadcasts (Spark re-broadcasts it per
    microbatch); the stream is never shuffled for the join — the only
    wide op is the windowed aggregation, map-side combinable on
    (n_name, window). At 100 TB/day this is the canonical enrichment
    topology: no stream-stream state, no watermark bookkeeping for the
    join itself."""
    e = load(spark, sf_dir, "events")
    n = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nk"), "n_name"
    )
    return (
        e.withColumn("nk", F.col("user_id") % 25)
        .join(F.broadcast(n), "nk")
        .groupBy("n_name", F.window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").alias("cnt"), davg("value").alias("avg_value"))
        .select(
            "n_name",
            F.col("w.start").alias("window_start"),
            "cnt",
            "avg_value",
        )
        .orderBy("n_name", "window_start")
    )


@query(
    "q76_stream_stream_join",
    oracle="""
        SELECT v.event_id AS view_id,
               c.event_id AS click_id,
               v.user_id,
               epoch_us(c.ts) - epoch_us(v.ts) AS delay_us
        FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events) v
        JOIN (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events) c
          ON v.user_id = c.user_id
         AND v.event_type = 'view' AND c.event_type = 'click'
         AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL 60 MINUTE
        ORDER BY view_id, click_id
    """,
)
def q76(spark, sf_dir):
    """Stream-STREAM interval join — the last Structured Streaming join
    surface after q75's stream-static form: click-to-view attribution,
    matching each click to the views it followed within 60 minutes for
    the same user (the both-sides-unbounded join that forces real state
    management: each side buffers rows until the watermark proves no
    more matches can arrive). Registered in its deterministic batch
    form; tests/test_streaming.py replays it through two readStream
    branches with watermarks and a time-bound join condition and
    asserts the sink matches this result exactly.

    Scale shape: the join keys on user_id (an equi-key — Spark plans a
    keyed join with the time bound as residual predicate, never a
    cartesian; plan-asserted), and in the streaming form the time bound
    plus watermark caps each side's state at ~60 minutes of events per
    user — without the bound, state grows unboundedly and the join is
    rejected by Spark's unsupported-operation check. delay_us is an
    exact integer (µs difference), so the result hashes identically in
    both engines."""
    e = load(spark, sf_dir, "events")
    v = e.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        "user_id",
        F.col("ts").alias("v_ts"),
    )
    c = e.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    return (
        v.join(
            c,
            (F.col("user_id") == F.col("c_user"))
            & (F.col("c_ts") > F.col("v_ts"))
            & (F.col("c_ts") <= F.col("v_ts") + F.expr("interval 60 minutes")),
        )
        .select(
            "view_id",
            "click_id",
            "user_id",
            (F.unix_micros("c_ts") - F.unix_micros("v_ts")).alias("delay_us"),
        )
        .orderBy("view_id", "click_id")
    )


@query(
    "q77_dedup_within_watermark",
    oracle="""
        WITH RECURSIVE e AS (
            SELECT event_id, ts, user_id, event_type, value,
                   row_number() OVER (
                       PARTITION BY user_id, event_type ORDER BY event_id
                   ) AS idx,
                   max(ts) OVER (
                       ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ) - INTERVAL '24 hours' AS wm
            FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events)
        ),
        chain AS (
            SELECT user_id, event_type, idx, event_id, ts, value,
                   ts AS anchor, TRUE AS kept
            FROM e WHERE idx = 1
            UNION ALL
            SELECT e.user_id, e.event_type, e.idx, e.event_id, e.ts,
                   e.value,
                   CASE WHEN e.wm >= c.anchor + INTERVAL '24 hours'
                        THEN e.ts ELSE c.anchor END,
                   COALESCE(e.wm >= c.anchor + INTERVAL '24 hours', FALSE)
            FROM chain c
            JOIN e ON e.user_id IS NOT DISTINCT FROM c.user_id
                  AND e.event_type IS NOT DISTINCT FROM c.event_type
                  AND e.idx = c.idx + 1
        )
        SELECT event_id, ts, user_id, event_type, value
        FROM chain WHERE kept
        ORDER BY event_id
    """,
)
def q77(spark, sf_dir):
    """Time-bounded streaming dedup in its deterministic batch form
    (streaming/stateful.py dedup_within_watermark): the replay of
    ``withWatermark('ts', '24 hours').dropDuplicatesWithinWatermark(
    ['user_id', 'event_type'])`` with one event per trigger in
    event_id (arrival) order — the first event of a key anchors, later
    events of the key are dropped while the anchor's state lives, the
    state is evicted once the watermark (prior-arrival max event time
    minus 24 h) REACHES anchor_ts + 24 h (non-strict — the conformance
    test pins the equality boundary), and the next
    occurrence re-anchors. q74 dedups forever (exact once-only ids);
    q77 is the DOUBLE-SEND suppressor, the missing time-bounded member
    of the dedup family — and the oracle is the state machine itself,
    written as a per-key recursive chain over the arrival order (depth
    = events per key, bounded).

    The true streaming pipeline (readStream → withWatermark →
    dropDuplicatesWithinWatermark → append sink) is conformance-tested
    in tests/test_streaming.py, including the exact eviction boundary,
    via the row-granular EventReplay harness."""
    from rastercube_spark.streaming.stateful import dedup_within_watermark

    e = load(spark, sf_dir, "events")
    return dedup_within_watermark(e, delay_s=24 * 3600)
