"""Edge-corpus oracle harness: every documents-driven query re-compared
against its DuckDB oracle on a corpus the driver fixture doesn't have —
NULL text, empty text, single tokens, runs of spaces, unicode
(accents/CJK/emoji), and an over-long token.

Motivation: ADVICE r05 found q83 silently diverging on NULL text — a
class of bug the fixture can never catch because it contains no NULLs.
This harness makes the whole text surface prove NULL/unicode agreement,
not just the one query that got caught. The edge corpus keeps the
driver's schema (doc_id, text, lang, source, n_chars) and srcN source
names so the mixture queries' source-suffix parsing still applies.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rastercube_spark import registry
from rastercube_spark.testing import compare, duck_connection

BASE_SF = "/root/testdata/sf0.001"

EDGE_DOCS = [
    (0, None, "en", "src0", 0),                      # NULL text
    (1, "", "en", "src1", 0),                        # empty string
    (2, "one", "en", "src2", 3),                     # single token
    (3, "a  b   c", "en", "src3", 8),                # runs of spaces
    (4, "the quick brown fox the lazy dog the end", "en", "src0", 41),
    (5, "café naïve façade über señor", "fr", "src1", 28),       # accents
    (6, "中文 文本 处理 测试 中文 文本", "zh", "src2", 16),          # CJK
    (7, "emoji 🚀 in 🚀 text 🚀 stream", "en", "src3", 27),        # emoji
    (8, "x" * 4000, "en", "src0", 4000),             # one over-long token
    (9, "the the the the the the the the", "en", "src1", 31),  # repetition
    (10, "tab\tand\nnewline separated words here", "en", "src2", 36),
    (11, "the quick brown fox the lazy dog the end", "en", "src3", 41),
]

# Every ORACLED query that reads the documents table. qa3/qa4 (recursive
# CTE closures) are included: tiny corpus, the CTE stays cheap.
QUERIES = [
    "q83_chunk_udtf",
    "q90_text_metrics",
    "q91_exact_dedup",
    "q92_minhash_lsh_pairs",
    "q93_lsh_jaccard",
    "q94_ngram_jaccard_topk",
    "q95_simhash",
    "q99_winnow_fingerprint",
    "qa0_multimodal_decode",
    "qa1_tfidf_topterms",
    "qa3_dup_clusters",
    "qa4_dedup_keep",
    "qa5_repetition_filters",
    "qa6_sequence_packing",
    "qa7_pii_redaction",
    "qb1_decontaminate",
    "qb3_mixture_sample",
    "qb4_passage_dedup",
    "qb5_quality_rules",
    "qb7_group_sample",
    "qb8_mixture_upsample",
    "qb9_dataset_report",
    "qe3_source_overlap",
    "qe5_bm25_topk",
    "qf2_token_surprisal",
    "qf3_length_histogram",
    "qf4_hybrid_rrf",
    "qf5_boilerplate_ngrams",
    "qf7_repeated_spans",
    "qf8_token_budget",
    "qf9_dup_rate_estimate",
    "qg1_chunk_documents",
    "qg2_char_langid",
    "qg3_template_prefixes",
    "qg4_source_dup_matrix",
    "qg5_source_score_percentiles",
    "qg6_code_detect",
    "qg7_dup_cluster_histogram",
]


@pytest.fixture(scope="module")
def edge_sf_dir(tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("edge_sf")
    for f in os.listdir(BASE_SF):
        if f != "documents.parquet":
            os.symlink(os.path.join(BASE_SF, f), os.path.join(d, f))
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in EDGE_DOCS], pa.int64()),
            "text": pa.array([r[1] for r in EDGE_DOCS], pa.string()),
            "lang": pa.array([r[2] for r in EDGE_DOCS], pa.string()),
            "source": pa.array([r[3] for r in EDGE_DOCS], pa.string()),
            "n_chars": pa.array([r[4] for r in EDGE_DOCS], pa.int64()),
        }
    )
    pq.write_table(tbl, os.path.join(d, "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def edge_duck(edge_sf_dir):
    con = duck_connection(edge_sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", QUERIES)
def test_edge_corpus_vs_oracle(name, spark, edge_sf_dir, edge_duck):
    df = registry.queries()[name](spark, edge_sf_dir)
    report = compare(df, edge_duck, registry.oracle_sql()[name])
    assert report["ok"], report


# The stub media codec slices the BYTE payload; its oracle mirrors it
# through VARCHAR, which is byte-accurate only for ASCII text (the
# documented stub precondition — operators/multimodal.py
# extract_features: "testdata text is ASCII, so bytes ≡ chars"). Real
# deployments replace the codec, so the frame/feature queries are edge-
# tested on the ASCII subset: NULL, empty, long-token, and repetition
# rows stay in; only the unicode rows are out.
STUB_CODEC_QUERIES = ["qa8_frame_sample", "qa9_media_knn"]


@pytest.fixture(scope="module")
def ascii_sf_dir(tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("edge_ascii_sf")
    for f in os.listdir(BASE_SF):
        if f != "documents.parquet":
            os.symlink(os.path.join(BASE_SF, f), os.path.join(d, f))
    rows = [r for r in EDGE_DOCS if r[1] is None or r[1].isascii()]
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array([r[3] for r in rows], pa.string()),
            "n_chars": pa.array([r[4] for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, os.path.join(d, "documents.parquet"))
    return str(d)


@pytest.mark.parametrize("name", STUB_CODEC_QUERIES)
def test_edge_ascii_vs_oracle(name, spark, ascii_sf_dir):
    con = duck_connection(ascii_sf_dir)
    try:
        df = registry.queries()[name](spark, ascii_sf_dir)
        report = compare(df, con, registry.oracle_sql()[name])
        assert report["ok"], report
    finally:
        con.close()
