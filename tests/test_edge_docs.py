"""Regression tests for round-2 ADVICE: short/empty documents and zero
embedding vectors.

The fixture corpora contain no single-word or empty documents, so
``sequence(1, size-1)`` descending-sequence bugs (Spark yields [1, 0], then
``element_at(words, 0)`` errors under ANSI) pass parity silently until real
data hits them.  Here we restage sf0.001 with planted adversarial rows and
re-run the same oracle gate the driver uses.
"""

from __future__ import annotations

import shutil
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from kinesis_test_spark.oracle import check_query

SF_SRC = "/root/testdata/sf0.001"

# Keys whose Spark plan walks word n-grams over `documents.text` and must
# survive docs with fewer words than the n-gram order.
NGRAM_KEYS = [
    "q_text_bigrams",
    "q_dedup_ngram_jaccard",
    "q_text_contamination",
    "q_dedup_minhash",
    # round-6 n-gram consumers (sequence(1,0) counts DOWN in Spark —
    # each carries an explicit short-doc guard)
    "q_text_perplexity",
    "q_bpe_pair_counts",
    "q_dedup_paragraph",
    "q_dedup_containment",
    # round-7 sweep: every remaining n-gram / shingle / signature walker
    # (probed total on this corpus before pinning)
    "q_dedup_simhash",
    "q_dedup_simhash_hamming",
    "q_dedup_fuzzy",
    "q_dedup_normalized",
    "q_dedup_keep_best",
    "q_dedup_keeplist",
    "q_dedup_clusters",
    "q_dedup_verify",
    "q_dedup_eval",
    "q_dedup_incremental",
    "q_text_tokenize_ids",
]


@pytest.fixture(scope="module")
def edge_sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_sf")
    for f in Path(SF_SRC).glob("*.parquet"):
        shutil.copy(f, d / f.name)

    docs = pq.read_table(d / "documents.parquet")
    extra = pa.table(
        {
            "doc_id": [90000001, 90000002, 90000003, 90000004],
            "text": ["", "one", "two words", "exactly three words"],
            "lang": ["en"] * 4,
            "source": ["edge"] * 4,
            "n_chars": [0, 3, 9, 19],
        },
        schema=docs.schema,
    )
    pq.write_table(pa.concat_tables([docs, extra]), d / "documents.parquet")

    emb = pq.read_table(d / "embeddings.parquet")
    dim = len(emb.column("embedding")[0])
    zero = pa.table(
        {
            "vec_id": [90000001],
            "embedding": [[0.0] * dim],
            "label": [0],
        },
        schema=emb.schema,
    )
    pq.write_table(pa.concat_tables([emb, zero]), d / "embeddings.parquet")
    return str(d)


# Keys over `documents.text` whose expressions divide by or index into
# text-derived quantities: must survive the planted empty document (round-3
# audit: alpha_ratio divided by length(text) — ANSI error on "" — and the
# fingerprint / langid / chunk generators were verified total by analysis;
# these pins keep them that way).
DOC_EDGE_KEYS = [
    "q_text_quality",
    "q_text_fingerprint",
    "q_text_langid_ngram",
    "q_text_chunk",
    "q_text_stats",
    "q_text_repetition",
    # round-6 doc scorers with text-derived denominators / log arguments
    "q_text_entropy",
    "q_quality_gate",
    "q_vocab_coverage",
    "q_length_histogram",
    "q_pipeline_audit",
    # round-7 sweep: the remaining doc scorers / samplers / exporters with
    # text-derived denominators or log arguments (all probed total first)
    "q_text_wordcount",
    "q_text_tokens",
    "q_text_tfidf",
    "q_text_logprob",
    "q_text_pack",
    "q_mixture",
    "q_mixture_temperature",
    "q_pipeline_llm",
    "q_pipeline_clean",
    "q_sample_split",
    "q_domain_cap",
    "q_text_pii",
    "q_text_langid",
    "q_text_shard_export",
    "q_dedup_exact",
    # round-10 keys: hashed-feature classifier and BPE encode (empty /
    # 1-word docs exercise the empty-token hash bucket and the
    # zero-merge/zero-token paths — VERDICT r9 #4/#5 edge-doc pins)
    "q_quality_classifier",
    "q_bpe_encode",
]

# Keys over `embeddings` that compute a cosine: must survive the planted
# zero vector (Spark side yields DuckDB's -1.0 sentinel via
# coalesce(try_divide(...), -1), so parity holds row-for-row).
ZERO_VEC_KEYS = [
    "q_emb_normalize",
    "q_dedup_embedding",
    "q_sim_search",
    # round-7 sweep: every remaining cosine / centroid / quantization
    # consumer of the embeddings table (probed against the zero vector)
    "q_dedup_embedding_cells",
    "q_emb_centroid",
    "q_emb_pq",
    "q_emb_drift",
    "q_ann_batch",
    "q_ann_recall",
    "q_sim_search_ivf",
    "q_sim_search_ivf_multiprobe",
    "q_sim_lsh",
    "q_kmeans_step",
]


@pytest.mark.parametrize("name", NGRAM_KEYS)
def test_short_docs_parity(spark, edge_sf_dir, name):
    problems = check_query(spark, edge_sf_dir, name)
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", DOC_EDGE_KEYS)
def test_empty_doc_parity(spark, edge_sf_dir, name):
    problems = check_query(spark, edge_sf_dir, name)
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", ZERO_VEC_KEYS)
def test_zero_vector_parity(spark, edge_sf_dir, name):
    problems = check_query(spark, edge_sf_dir, name)
    assert not problems, f"{name}: " + "; ".join(problems)
