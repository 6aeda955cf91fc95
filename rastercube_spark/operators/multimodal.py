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
            # NULL payload (missing media — normal in a real corpus)
            # passes through with NULL metadata; bytes(None) raised
            # before (caught by tests/test_edge_corpus.py). Nullable
            # pandas int dtypes keep Arrow from coercing None to NaN
            # floats on the way back.
            payloads = [None if p is None else bytes(p) for p in pdf["payload"]]
            decoded = [
                (None, None, None) if p is None else _stub_decode(p)
                for p in payloads
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pd.array(
                        [None if p is None else len(p) for p in payloads],
                        dtype="Int64",
                    ),
                    "width": pd.array([d[0] for d in decoded], dtype="Int32"),
                    "height": pd.array([d[1] for d in decoded], dtype="Int32"),
                    "n_frames": pd.array(
                        [d[2] for d in decoded], dtype="Int32"
                    ),
                }
            )

    return media.mapInPandas(decode_batches, schema=DECODE_SCHEMA)


FRAME_SCHEMA = "doc_id bigint, frame_idx int, n_frames int, frame binary"


def sample_frames(media: DataFrame, stride: int = 2) -> DataFrame:
    """Frame-sample stage: one input row (video payload) → one output row
    per SAMPLED frame (indices 0, stride, 2·stride, …), each carrying its
    byte slice of the payload.

    The row fan-out happens inside the Arrow batch (mapInPandas yields
    more rows than it consumes — the real shape of a frame sampler:
    decode once, emit k frames, no shuffle, no driver involvement).
    STUB frame extraction: the frame count is the md5-derived n_frames
    and frame i is the i-th equal byte-slice of the payload; a real
    deployment replaces the slicing with an ffmpeg/PyAV call of the same
    signature. Deterministic, so DuckDB can mirror it byte-for-byte.
    """

    def sample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"doc_id": [], "frame_idx": [], "n_frames": [], "frame": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    continue  # missing media has no frames to emit
                raw = bytes(payload)
                _w, _h, n_frames = _stub_decode(raw)
                size = max(1, len(raw) // n_frames)
                for i in range(0, n_frames, stride):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["n_frames"].append(n_frames)
                    # last frame takes the remainder, like a real splitter
                    end = len(raw) if i == n_frames - 1 else (i + 1) * size
                    out["frame"].append(raw[i * size : end])
            yield pd.DataFrame(out)

    return media.mapInPandas(sample_batches, schema=FRAME_SCHEMA)


FEATURE_SCHEMA = "doc_id bigint, feature array<float>"


def extract_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """Feature-extract stage: binary payload → dense float vector
    (``array<float>``), the column shape the similarity operators
    (brute_force_knn / lsh_knn / ivf_knn) consume — so a media corpus
    plugs straight into the ANN pillar.

    STUB featurizer: ``dim`` floats in [0, 1) from md5(payload ‖ '|j')
    hex slices (printable-ASCII salt so the DuckDB oracle can mirror it
    through VARCHAR — testdata text is ASCII, so bytes ≡ chars);
    deterministic; a real deployment swaps in a vision/audio encoder
    emitting the same schema."""

    def feat_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # a featurizer cannot embed missing media: drop NULL-payload
            # rows (plain lists, not a masked frame — pandas index
            # alignment would desynchronize ids from features)
            ids = [
                i for i, p in zip(pdf["doc_id"], pdf["payload"])
                if p is not None
            ]
            payloads = [p for p in pdf["payload"] if p is not None]
            feats = []
            for payload in payloads:
                raw = bytes(payload)
                vec = []
                for j in range(0, dim, 4):
                    h = hashlib.md5(raw + b"|" + str(j).encode()).hexdigest()
                    vec += [
                        int(h[k * 4 : k * 4 + 4], 16) / 65536.0
                        for k in range(min(4, dim - j))
                    ]
                feats.append(vec)
            # explicit dtypes: an all-NULL batch yields empty columns,
            # and pandas' float64 default for them breaks the Arrow
            # list<float> conversion on the way back
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "feature": pd.Series(feats, dtype="object"),
                }
            )

    import numpy as np  # noqa: F401  (pandas object->list arrays)

    return media.mapInPandas(feat_batches, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = (
    "doc_id bigint, media_type string, payload binary, "
    "width int, height int, scale double"
)


def resize_media(media: DataFrame, max_dim: int = 128) -> DataFrame:
    """Resize stage: payload → downscaled payload + new dimensions, still
    a binary column (the output of a real thumbnailer). STUB resample:
    keeps every k-th byte where k = ceil(max(w,h)/max_dim) — output size
    shrinks with the scale factor exactly like a real decimation, and
    every step is deterministic."""

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                "doc_id": [], "media_type": [], "payload": [],
                "width": [], "height": [], "scale": [],
            }
            for doc_id, mt, payload in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"]
            ):
                if payload is None:
                    continue  # nothing to resize
                raw = bytes(payload)
                w, h, _n = _stub_decode(raw)
                k = max(1, -(-max(w, h) // max_dim))  # ceil div
                rows["doc_id"].append(doc_id)
                rows["media_type"].append(mt)
                rows["payload"].append(raw[::k])
                rows["width"].append(w // k)
                rows["height"].append(h // k)
                rows["scale"].append(1.0 / k)
            yield pd.DataFrame(rows)

    return media.mapInPandas(resize_batches, schema=RESIZE_SCHEMA)
