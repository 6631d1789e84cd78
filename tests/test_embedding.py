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


def test_embed_plan_classification(spark):
    from ai_incident_analyst_spark.operators.embedding import embed_plan

    snap = spark.createDataFrame(
        [(1, "same"), (2, "changed-now"), (3, "brand new")],
        "doc_id long, text string")
    import hashlib
    stored = spark.createDataFrame(
        [(1, hashlib.md5(b"same").hexdigest()),
         (2, hashlib.md5(b"changed-before").hexdigest()),
         (9, hashlib.md5(b"gone").hexdigest())],
        "doc_id long, __content_md5 string")
    got = {r["doc_id"]: r["action"]
           for r in embed_plan(snap, stored, "doc_id", "text").collect()}
    assert got == {1: "keep", 2: "embed", 3: "new", 9: "drop"}


def test_incremental_embed_equals_full_and_chains(spark):
    from ai_incident_analyst_spark.operators.embedding import (
        incremental_embed,
    )

    v1 = spark.createDataFrame(
        [(i, f"doc number {i}") for i in range(8)],
        "doc_id long, text string")
    t1 = incremental_embed(v1, None, "doc_id", "text", dim=16)
    assert t1.count() == 8

    # v2: doc 0 changed, doc 8 new, doc 7 departed
    v2 = spark.createDataFrame(
        [(0, "doc number zero CHANGED")]
        + [(i, f"doc number {i}") for i in range(1, 7)]
        + [(8, "doc number 8")],
        "doc_id long, text string")
    t2 = incremental_embed(v2, t1, "doc_id", "text", dim=16)
    full = incremental_embed(v2, None, "doc_id", "text", dim=16)
    a = {r["doc_id"]: (r["__content_md5"], tuple(r["embedding"]))
         for r in t2.collect()}
    b = {r["doc_id"]: (r["__content_md5"], tuple(r["embedding"]))
         for r in full.collect()}
    assert a == b                     # refresh == full re-embed
    assert 7 not in a                 # departed id dropped
    # chaining a no-change snapshot is a fixed point
    t3 = incremental_embed(v2, t2, "doc_id", "text", dim=16)
    c = {r["doc_id"]: (r["__content_md5"], tuple(r["embedding"]))
         for r in t3.collect()}
    assert c == a
