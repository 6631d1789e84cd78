"""Embedding operator (U1) tests: determinism across partitionings,
value-level self-oracle vs the plain-Python encoder."""

import numpy as np
from pyspark.sql import Row

from ai_incident_analyst_spark.operators.embedding import (
    embed_text,
    hashing_encode,
)

DOCS = [
    Row(doc_id=0, message="Database connection timeout on service X", event="error"),
    Row(doc_id=1, message="Service Y crashed due to OOM", event="error"),
    Row(doc_id=2, message=None, event="other"),
]


def test_embed_matches_python_encoder(spark):
    df = spark.createDataFrame(DOCS)
    out = {r.doc_id: np.array(r.embedding)
           for r in embed_text(df, ["message", "event"], dim=64).collect()}
    # exact concat_ws semantics: None skipped (embedder.py:21)
    texts = {0: "Database connection timeout on service X error",
             1: "Service Y crashed due to OOM error",
             2: "other"}
    for i, t in texts.items():
        expect = hashing_encode([t], 64)[0]
        assert np.allclose(out[i], expect, atol=1e-6), i


def test_embed_deterministic_across_partitions(spark):
    df1 = spark.createDataFrame(DOCS).repartition(1)
    df4 = spark.createDataFrame(DOCS).repartition(4)
    a = {r.doc_id: tuple(r.embedding)
         for r in embed_text(df1, ["message"], dim=32).collect()}
    b = {r.doc_id: tuple(r.embedding)
         for r in embed_text(df4, ["message"], dim=32).collect()}
    assert a == b


def test_embedding_normalized(spark):
    df = spark.createDataFrame(DOCS[:2])
    for r in embed_text(df, ["message"], dim=64).collect():
        assert abs(np.linalg.norm(r.embedding) - 1.0) < 1e-5


def test_embed_custom_make_model_branch(spark):
    """The make_model branch (embedding.py:58 — the path a real
    SentenceTransformer rides, reference embedder.py:16) must be
    constructed per worker and used for every batch. A numpy stand-in
    keeps the test hermetic while exercising the non-default branch."""
    def make_model():
        def encode(texts):
            return np.array([[float(len(t)), 1.0] for t in texts],
                            dtype=np.float32)
        return encode

    df = spark.createDataFrame(DOCS).repartition(3)
    out = {r.doc_id: list(r.embedding)
           for r in embed_text(df, ["message"], dim=2,
                               make_model=make_model).collect()}
    assert out[2] == [0.0, 1.0]          # None -> "" via fillna
    assert out[0][0] == float(len(DOCS[0].message))


def test_embed_real_sentence_transformer(spark):
    """U1 real-model smoke (reference embedder.py:16,23-30): only runs on
    hosts with sentence-transformers installed — auto-skips here. Verifies
    the per-worker init + batched encode contract end-to-end with the
    actual model the reference uses."""
    import pytest
    pytest.importorskip("sentence_transformers")

    def make_model():
        from sentence_transformers import SentenceTransformer
        m = SentenceTransformer("all-MiniLM-L6-v2")
        return lambda texts: m.encode(texts, batch_size=32)

    df = spark.createDataFrame(DOCS)
    rows = embed_text(df, ["message", "event"], dim=384,
                      make_model=make_model).collect()
    assert all(len(r.embedding) == 384 for r in rows)
