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
