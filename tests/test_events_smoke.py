"""First-line environment-drift guard (VERDICT r05 "Next round" #8).

The r4→r5 pyspark upgrade silently changed the events.parquet read
(TIMESTAMP(NANOS) became a native read) and broke every streaming
query at once; the shared loader now branches on the read schema
(sources/tables.py). This smoke pins the contract the whole q70–q74
family sits on, so the NEXT drift fails here — one cheap, named test —
instead of as five red driver rows.
"""

from __future__ import annotations

from rastercube_spark.sources.tables import load


def test_events_loader_yields_timestamps(spark, sf_dir):
    df = load(spark, sf_dir, "events")
    types = dict(df.dtypes)
    assert types["ts"] == "timestamp", (
        f"events ts read as {types['ts']!r} — pyspark NANOS handling "
        "drifted again; fix sources/tables.py load()"
    )
    row = df.select("ts").limit(1).collect()[0]
    assert row["ts"].year >= 1970
