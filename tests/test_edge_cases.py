"""Empty-input / degenerate-input hardening for every custom operator.

A 100 TB pipeline WILL hit empty partitions, filtered-to-nothing stages, and
single-row groups; operators must return empty results, not crash.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pontem_spark.operators import dedup as D
from pontem_spark.operators import multimodal as M
from pontem_spark.operators.asof import asof_join
from pontem_spark.operators.ivf import ivf_topk
from pontem_spark.operators.similarity import (
    brute_force_topk,
    cosine_pairs_blocked,
    lsh_bucket_topk,
)
from pontem_spark.sources.tables import load_table


@pytest.fixture()
def empty_docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").filter(F.lit(False))


@pytest.fixture()
def empty_emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").filter(F.lit(False))


def test_dedup_family_on_empty(empty_docs):
    assert D.exact_duplicates(empty_docs, "doc_id", "text").count() == 0
    assert D.jaccard_similar_pairs(empty_docs, "doc_id", "text").count() == 0
    assert D.minhash_candidate_pairs(empty_docs, "doc_id", "text").count() == 0
    assert D.simhash(empty_docs, "doc_id", "text").count() == 0


def test_similarity_on_empty_corpus(spark, sf_dir, empty_emb):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    assert brute_force_topk(empty_emb, queries, dim=64).count() == 0
    assert lsh_bucket_topk(empty_emb, queries, dim=64).count() == 0
    assert cosine_pairs_blocked(empty_emb).count() == 0


def test_similarity_on_empty_queries(spark, sf_dir, empty_emb):
    emb = load_table(spark, sf_dir, "embeddings")
    assert brute_force_topk(emb, empty_emb, dim=64).count() == 0
    assert ivf_topk(emb, empty_emb, dim=64).count() == 0


def test_asof_with_empty_right(spark):
    left = spark.createDataFrame(
        pd.DataFrame({"k": [1], "t": pd.to_datetime(["2024-01-01"]), "lv": [1]})
    )
    right = spark.createDataFrame(
        pd.DataFrame({"k": [1], "t": pd.to_datetime(["2024-01-01"]), "rv": [9]})
    ).filter(F.lit(False))
    out = asof_join(left, right, on="t", by="k").toPandas()
    assert len(out) == 1
    assert pd.isna(out["r_rv"].iloc[0])


def test_multimodal_on_empty(empty_docs):
    packed = M.attach_binary(empty_docs, "doc_id", "text")
    assert M.decode_media(packed).count() == 0
    assert M.extract_features(packed).count() == 0


def test_single_row_inputs(spark, sf_dir):
    one_doc = load_table(spark, sf_dir, "documents").limit(1)
    assert D.jaccard_similar_pairs(one_doc, "doc_id", "text").count() == 0  # no pairs
    assert D.exact_duplicates(one_doc, "doc_id", "text").count() == 1

    one_vec = load_table(spark, sf_dir, "embeddings").limit(1)
    assert cosine_pairs_blocked(one_vec).count() == 0


def test_short_document_shingles(spark):
    """Docs shorter than the shingle width must yield zero shingles, not
    errors (guards the sequence() bounds)."""
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": ["one two", "a"]})
    )
    assert D.jaccard_similar_pairs(docs, "doc_id", "text", ngram=3).count() == 0
    assert D.minhash_candidate_pairs(docs, "doc_id", "text", ngram=3).count() == 0
