"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

The engine treats image/audio/video as binary columns with a metadata
struct, exactly like any other column — the Spark-side machinery (schema,
Arrow batching via mapInPandas, partition-preserving transforms) is real
and tested; only the *codec* step is a stub, because no image/audio
libraries ship in this container. The stub decode is a deterministic
function of the payload's md5, so the whole pipeline stays oracle-checkable
end to end (the DuckDB mirror computes the same md5-derived metrics).

At 100 TB: payloads ride in parquet binary columns (or are pointers to an
object store resolved inside the decode batch); mapInPandas keeps each
Arrow batch bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``,
and the decode stage is embarrassingly parallel — no shuffle at all.

Reference has no multimodal surface; this generalizes its raster ingest
pattern (reference rastercube/datasources/modis/tiff.py:92-122: opaque
pixel payload + sidecar geometry metadata).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

# Output schema of the decode stage — fixed, so downstream plans are stable
# regardless of the codec backing it.
DECODE_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes bigint, "
    "width int, height int, n_frames int"
)


def attach_payload(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Model a multimodal table: (id, media_type, payload binary).

    Test data has no real media, so the payload is the UTF-8 bytes of the
    text column — byte-identical in every engine, which keeps the decode
    stage verifiable.
    """
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.lit("application/octet-stream").alias("media_type"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
    )


def _stub_decode(payload: bytes) -> tuple[int, int, int]:
    """STUB codec: real deployments plug a decoder (PIL/ffmpeg/...) here.

    Deterministic fake: dimensions derived from the payload md5 so the
    pipeline is testable without media libraries. Byte-for-byte mirrored by
    the DuckDB oracle (md5 hex slices → ints).
    """
    h = hashlib.md5(payload).hexdigest()
    width = 64 + int(h[0:4], 16) % 448
    height = 64 + int(h[4:8], 16) % 448
    n_frames = 1 + int(h[8:12], 16) % 8
    return width, height, n_frames


def decode_metrics(media: DataFrame) -> DataFrame:
    """Decode stage: binary payload → typed metadata, via mapInPandas.

    One Arrow batch in, one out; executors never hold more than a batch of
    payloads. This is the pattern a real image/audio featurizer uses —
    swap ``_stub_decode`` for the actual codec.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_stub_decode(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "n_frames": [d[2] for d in decoded],
                }
            )

    return media.mapInPandas(decode_batches, schema=DECODE_SCHEMA)
