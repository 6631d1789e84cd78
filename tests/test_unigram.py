"""Unigram segmentation (operators/unigram.py): vocabulary
determinism, integer-Viterbi hand checks against a brute-force
segmentation enumeration, coverage floor, and partitioning
invariance."""

import itertools
import math

import pytest
from pyspark.sql import functions as F

from ai_incident_analyst_spark.operators.unigram import (
    unigram_encode_stats,
    unigram_vocab,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [("the cat sat",), ("the cat ran",), ("thecat returned",)]
    return spark.createDataFrame(rows, "text string")


def _vmap(vocab_rows):
    return {r["piece"]: r["ek"] for r in vocab_rows}


def _brute_best(w, vmap, max_piece):
    """Enumerate ALL segmentations into vocab pieces; return the min
    integer key — the spec the DP must match."""
    best = None
    n = len(w)

    def rec(i, acc):
        nonlocal best
        if i == n:
            best = acc if best is None or acc < best else best
            return
        for l in range(1, min(max_piece, n - i) + 1):
            ek = vmap.get(w[i:i + l])
            if ek is not None:
                rec(i + l, acc + ek)

    rec(0, 0)
    return best


def test_vocab_char_floor_and_weights(spark, corpus):
    rows = unigram_vocab(corpus, "text", max_piece=3, top_k=5).collect()
    vm = _vmap(rows)
    # every character of the word stream is present (coverage floor)
    for ch in set("thecatsatranreturned"):
        assert ch in vm
    # weights: ek = round(-ln(cnt/tot)*1e6)*1000 + 1 -> ones digit is 1
    assert all(ek % 1000 == 1 for ek in vm.values())


def test_dp_matches_brute_force(spark, corpus):
    vocab = unigram_vocab(corpus, "text", max_piece=3, top_k=8)
    vm = _vmap(vocab.collect())
    out = {r["doc_id"]: r for r in unigram_encode_stats(
        corpus.withColumn("doc_id", F.monotonically_increasing_id()),
        "doc_id", "text", vocab).collect()}
    # recompute every doc's stats from the brute-force spec
    texts = {i: t for i, (t,) in enumerate(
        [("the cat sat",), ("the cat ran",), ("thecat returned",)])}
    by_doc = {r: out[k] for k, r in zip(sorted(out), sorted(texts))}
    for i, text in texts.items():
        words = [w for w in text.lower().split() if len(w) <= 12]
        keys = [_brute_best(w, vm, 3) for w in words]
        row = by_doc[i]
        assert row["n_words"] == len(words)
        assert row["total_key"] == sum(keys)
        assert row["n_pieces"] == sum(k % 1000 for k in keys)


def test_key_minimizes_cost_then_pieces(spark):
    # craft a vocab where a 1-piece and 2-piece split tie on cost: the
    # ones-digit counter must break the tie toward fewer pieces
    corpus = spark.createDataFrame([("ab ab a b",)], "text string")
    vocab = unigram_vocab(corpus, "text", max_piece=2, top_k=10)
    vm = _vmap(vocab.collect())
    ek_ab, ek_a, ek_b = vm["ab"], vm["a"], vm["b"]
    brute = _brute_best("ab", vm, 2)
    assert brute == min(ek_ab, ek_a + ek_b)
    # counter arithmetic: piece counts ride the ones digits exactly
    assert (ek_a + ek_b) % 1000 == 2 and ek_ab % 1000 == 1


def test_partitioning_invariance(spark, sf_dir):
    from ai_incident_analyst_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(60)
    vocab = unigram_vocab(docs, "text")
    a = sorted(map(tuple, unigram_encode_stats(
        docs, "doc_id", "text", vocab).collect()))
    b = sorted(map(tuple, unigram_encode_stats(
        docs.repartition(7), "doc_id", "text", vocab).collect()))
    assert a == b and len(a) > 0
