"""DSIR importance resampling (operators/dsir.py): straight-line Python
parity on a tiny corpus, determinism under repartitioning, zero-gram
exclusion, and the one-corpus-shuffle plan contract."""

import hashlib
import math
import re

import pytest

from ai_incident_analyst_spark.operators.dsir import (
    doc_bucket_counts,
    dsir_log_ratio,
    dsir_scores,
    dsir_select,
)

DOCS = [
    # raw docs 0-4 all have 6 tokens: logw = Σ cnt·λ is length-
    # sensitive, so the behavioral ranking test below needs equal
    # gram counts to isolate the vocabulary effect
    (0, "spark shuffles the big join keys", "raw"),
    (1, "spark broadcast joins the tiny dim", "raw"),
    (2, "cat sat warm mat dog cart", "raw"),
    (3, "dog barked mail cart cat mat", "raw"),
    (4, "spark partitions the join output flow", "raw"),
    (5, "xy", "raw"),                        # single length-2 unigram
    (6, "! ?", "raw"),                       # zero qualifying grams
]
TARGET = [
    (100, "spark joins and shuffles partitions"),
    (101, "broadcast the small join side in spark"),
]
B, ALPHA = 64, 1.0


def _py_grams(text):
    toks = [t for t in re.split(r"\W+", text.lower()) if len(t) >= 2]
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _bucket(gram):
    h = hashlib.md5(("dsir" + gram).encode()).hexdigest()
    return int(h[:8], 16) % B


def _py_counts(rows):
    out = {}
    for did, text in rows:
        for g in _py_grams(text):
            key = (did, _bucket(g))
            out[key] = out.get(key, 0) + 1
    return out


def _py_scores():
    rawc = _py_counts([(d, t) for d, t, _ in DOCS])
    tgtc = _py_counts(TARGET)
    rc, tc = {}, {}
    for (_, b), c in rawc.items():
        rc[b] = rc.get(b, 0) + c
    for (_, b), c in tgtc.items():
        tc[b] = tc.get(b, 0) + c
    tt, rt = sum(tc.values()), sum(rc.values())
    lam = {b: math.log((tc.get(b, 0) + ALPHA) / (tt + ALPHA * B))
           - math.log((rc[b] + ALPHA) / (rt + ALPHA * B)) for b in rc}
    sc = {}
    for (d, b), c in rawc.items():
        sc[d] = sc.get(d, 0.0) + c * lam[b]
    return {d: round(v, 6) for d, v in sc.items()}


@pytest.fixture(scope="module")
def raw(spark):
    return spark.createDataFrame(
        [(d, t) for d, t, _ in DOCS], "doc_id long, text string")


@pytest.fixture(scope="module")
def target(spark):
    return spark.createDataFrame(TARGET, "doc_id long, text string")


def test_bucket_counts_match_python(spark, raw):
    got = {(r["doc_id"], r["bucket"]): r["cnt"]
           for r in doc_bucket_counts(raw, "doc_id", "text", B).collect()}
    assert got == _py_counts([(d, t) for d, t, _ in DOCS])


def test_scores_match_python_reference(spark, raw, target):
    got = {r["doc_id"]: r["logw"]
           for r in dsir_scores(raw, "doc_id", "text", target,
                                buckets=B, alpha=ALPHA).collect()}
    want = _py_scores()
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], abs=2e-6), d


def test_target_like_docs_score_higher(spark, raw, target):
    sc = {r["doc_id"]: r["logw"]
          for r in dsir_scores(raw, "doc_id", "text", target,
                               buckets=B).collect()}
    spark_docs = {0, 1, 4}          # share spark/join vocabulary w/ target
    other_docs = {2, 3}             # disjoint content
    assert min(sc[d] for d in spark_docs) > max(sc[d] for d in other_docs)


def test_zero_gram_docs_excluded(spark, raw, target):
    sc = dsir_scores(raw, "doc_id", "text", target, buckets=B)
    ids = {r["doc_id"] for r in sc.collect()}
    assert 6 not in ids             # "! ?" has no qualifying gram
    assert 5 in ids                 # "xy" is a single length-2 unigram


def test_select_deterministic_across_partitioning(spark, raw, target):
    a = dsir_select(raw, "doc_id", "text", target, k=4,
                    buckets=B).collect()
    b = dsir_select(raw.repartition(7), "doc_id", "text", target, k=4,
                    buckets=B).collect()
    assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]
    assert [r["gkey"] for r in a] == [r["gkey"] for r in b]


def test_select_k_exceeding_population(spark, raw, target):
    out = dsir_select(raw, "doc_id", "text", target, k=50,
                      buckets=B).collect()
    assert len(out) == 6            # doc 6 has no features, rest selected


def test_plan_one_corpus_shuffle_reused_no_python(spark, raw, target):
    df = dsir_scores(raw, "doc_id", "text", target, buckets=B)
    df.collect()   # AQE only materializes ReusedExchange in the final plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "MapInPandas" not in plan
    # the raw (doc,bucket) exchange feeds both the model fit and the
    # scorer: planned once, consumed twice
    assert "ReusedExchange" in plan
