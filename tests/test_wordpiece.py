"""WordPiece (operators/wordpiece.py): greedy longest-match-first with
## continuations — hand truths, plain-greedy replay parity (valid
because the char floor removes dead ends), determinism."""

import pytest
from pyspark.sql import functions as F

from ai_incident_analyst_spark.operators.wordpiece import (
    wordpiece_encode_stats,
    wordpiece_vocab,
)

pytestmark = pytest.mark.usefixtures("spark")


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def test_vocab_is_position_aware(spark):
    df = _docs(spark, ["abab abab", "ab"])
    pieces = {r["piece"] for r in
              wordpiece_vocab(df, "text", max_piece=2, top_k=8).collect()}
    # word-start 'ab' and continuation '##ab' are distinct entries
    assert "ab" in pieces and "##ab" in pieces
    # char floor is position-aware: 'a' occurs word-initially, 'b' only
    # interior — so the floor carries 'a', '##a', '##b' but NOT a
    # word-start 'b' (no word starts with b in this corpus)
    assert {"a", "##a", "##b"} <= pieces
    assert "b" not in pieces


def test_greedy_matches_plain_maxmatch_replay(spark):
    texts = ["the quick brown fox jumps over lazy dogs tonight",
             "sparkle sparks sparking parked parking spark",
             "aaaa aaab abab bbbb baaa"]
    df = _docs(spark, texts)
    vocab = wordpiece_vocab(df, "text", max_piece=4, top_k=60,
                            max_word_len=12)
    starts = set()
    conts = set()
    for r in vocab.collect():
        p = r["piece"]
        (conts if p.startswith("##") else starts).add(p.removeprefix("##"))

    def greedy(w):
        pos, n = 0, 0
        while pos < len(w):
            for l in range(min(4, len(w) - pos), 0, -1):
                forms = starts if pos == 0 else conts
                if w[pos:pos + l] in forms:
                    pos += l
                    n += 1
                    break
            else:
                raise AssertionError(f"dead end in {w!r} at {pos}")
        return n

    want = {}
    for i, t in enumerate(texts):
        ws = [w for w in t.split() if 0 < len(w) <= 12]
        want[i] = (len(ws), sum(greedy(w) for w in ws))
    got = {r["doc_id"]: (r["n_words"], r["n_pieces"])
           for r in wordpiece_encode_stats(
               df, "doc_id", "text", vocab, max_piece=4,
               max_word_len=12).collect()}
    assert got == want


def test_key_encodes_piece_lengths(spark):
    # one word, known vocab: "abcd" with pieces abc(start), ##d ->
    # greedy picks abc then d: decisions (4-3)=1 at i=1, (4-1)=3 at i=2
    df = _docs(spark, ["abcd"])
    vocab = spark.createDataFrame(
        [("abc",), ("ab",), ("a",), ("##b",), ("##c",), ("##d",),
         ("##cd",)], "piece string")
    r = wordpiece_encode_stats(df, "doc_id", "text", vocab,
                               max_piece=4, max_word_len=12).collect()[0]
    key = 1 * 5 ** 11 + 3 * 5 ** 10
    assert (r["n_words"], r["n_pieces"], r["key_sum"]) == (1, 2,
                                                           key * 100 + 2)


def test_deterministic_across_partitionings(spark):
    texts = ["stream batch merge sort group", "vector index probe scan"]
    df = _docs(spark, texts)
    vocab = wordpiece_vocab(df, "text")
    a = sorted(map(tuple, wordpiece_encode_stats(
        df.repartition(1), "doc_id", "text", vocab).collect()))
    b = sorted(map(tuple, wordpiece_encode_stats(
        df.repartition(7), "doc_id", "text", vocab).collect()))
    assert a == b
