"""WordPiece (BERT-style) segmentation — the tokenizer family's third
member (``operators/bpe.py`` trains merges, ``operators/unigram.py``
runs max-likelihood Viterbi; WordPiece is greedy longest-match-first
with the ``##`` continuation convention, the inference rule BERT ships).

Exactness contract (how a GREEDY algorithm gets a SQL twin): greedy
MaxMatch equals the lexicographic MINIMUM over complete segmentations
of the decision sequence "how much shorter than ``max_piece`` was each
chosen piece" — the first decision dominates, so minimizing the
base-``(max_piece+1)`` integer key

    KEY = Σ_i (max_piece − len_i) · (max_piece+1)^(max_word_len − i)

(i = 1-based decision index) picks the longest feasible piece at every
step, exactly greedy, PROVIDED every match extends to a complete path —
guaranteed here because the vocabulary carries a single-character floor
in both word-start and ``##`` continuation form, so no word dead-ends
(the case where true WordPiece emits UNK cannot arise). Piece count
rides in the ones digits of ``KEY2 = KEY·100 + n_pieces``: the key
uniquely encodes the decision sequence, so one ``min()`` returns both.
All arithmetic is int64 (max KEY2 < 2.5e10 at the default 12/4 bounds)
— no FP anywhere, which is what lets a recursive-CTE twin hash-match a
greedy tokenizer.

Physical plan mirrors ``unigram.py``: vocabulary build is a narrow
substring explode + one map-side-combined count + TakeOrderedAndProject;
encoding collapses the corpus to its DISTINCT word table (bounded by
the language, not the corpus), runs the tiny DP per word in one Arrow
batch with the vocabulary broadcast, and joins the per-word keys back
for per-document stats — one keyed shuffle.

Reference parity: the reference has no tokenizer at all (its text prep
stops at regex redaction, ``src/incident_analyst/preprocessor.py``);
this family is part of the beyond-reference training-data surface.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _words(df: DataFrame, text_col: str, max_word_len: int) -> DataFrame:
    toks = F.filter(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                    lambda t: (F.length(t) > 0)
                    & (F.length(t) <= max_word_len))
    return df.select(F.explode(toks).alias("w"))


def wordpiece_vocab(df: DataFrame, text_col: str, max_piece: int = 4,
                    top_k: int = 150,
                    max_word_len: int = 12) -> DataFrame:
    """Deterministic position-aware piece vocabulary: the ``top_k`` most
    frequent pieces over the corpus word stream — word-START substrings
    counted as-is, interior substrings in ``##``-prefixed continuation
    form (the two positions are distinct vocabulary entries, exactly as
    in BERT's vocab) — UNION a single-character floor in BOTH forms so
    every word is segmentable. Returns ``(piece)`` rows; piece length
    (without ``##``) drives the greedy key, so no weight column is
    needed.
    """
    words = _words(df, text_col, max_word_len) \
        .groupBy("w").agg(F.count("*").alias("wc"))
    st = F.explode(F.sequence(F.lit(1), F.length("w"))).alias("st")
    ln = F.explode(F.sequence(F.lit(1), F.lit(max_piece))).alias("l")
    subs = (words.select("w", "wc", st)
            .select("w", "wc", "st", ln)
            .where(F.col("st") + F.col("l") - 1 <= F.length("w"))
            .select(
                F.when(F.col("st") == 1,
                       F.col("w").substr(F.col("st"), F.col("l")))
                .otherwise(F.concat(F.lit("##"),
                                    F.col("w").substr(F.col("st"),
                                                      F.col("l"))))
                .alias("piece"), "wc"))
    counts = subs.groupBy("piece").agg(F.sum("wc").alias("cnt"))
    topk = counts.orderBy(F.desc("cnt"), F.col("piece").asc()).limit(top_k)
    chars = counts.where(
        F.length(F.regexp_replace("piece", "^##", "")) == 1)
    return (topk.unionByName(chars).select("piece").distinct())


def wordpiece_encode_stats(df: DataFrame, id_col: str, text_col: str,
                           vocab: DataFrame, max_piece: int = 4,
                           max_word_len: int = 12) -> DataFrame:
    """Per-document greedy-WordPiece stats under ``vocab``:
    ``(id_col, n_words, n_pieces, key_sum)`` — ``n_pieces`` the summed
    per-word piece counts, ``key_sum`` the summed greedy keys (KEY2 in
    the module docstring; verifying it hash-verifies the exact decision
    sequence of every word). Documents with no qualifying word produce
    no row; a word with an out-of-vocabulary character (impossible when
    the vocabulary came from the same corpus) is skipped, not crashed.
    """
    pieces = [r["piece"] for r in vocab.collect()]
    starts = {p for p in pieces if not p.startswith("##")}
    conts = {p[2:] for p in pieces if p.startswith("##")}
    sc = df.sparkSession.sparkContext
    bc = sc.broadcast((starts, conts, max_piece, max_word_len))

    doc_words = df.select(F.col(id_col).alias("__id"),
                          F.col(text_col)).select(
        "__id",
        F.explode(F.filter(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
            lambda t: (F.length(t) > 0)
            & (F.length(t) <= max_word_len))).alias("w"))
    distinct_words = doc_words.select("w").distinct()

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        st_, co_, mp, mwl = bc.value
        base = mp + 1

        def best(w: str):
            n = len(w)
            # dp[(pos, step)] = min accumulated KEY over prefixes
            dp = {(0, 0): 0}
            for pos in range(n):
                for (p, s), acc in [kv for kv in dp.items() if kv[0][0] == pos]:
                    forms = st_ if pos == 0 else co_
                    for l in range(1, min(mp, n - pos) + 1):
                        if w[pos:pos + l] not in forms:
                            continue
                        i = s + 1
                        key = acc + (mp - l) * base ** (mwl - i)
                        k2 = (pos + l, i)
                        if k2 not in dp or key < dp[k2]:
                            dp[k2] = key
            done = [(acc * 100 + s, s) for (p, s), acc in dp.items()
                    if p == n]
            if not done:
                return None, None
            k2, s = min(done)
            return k2, s

        for pdf in batches:
            keys, nps = [], []
            for w in pdf["w"]:
                k, s = best(w)
                keys.append(k)
                nps.append(s)
            yield pd.DataFrame({"w": pdf["w"], "key": keys, "np": nps})

    keys = distinct_words.mapInPandas(part,
                                      schema="w string, key long, np long")
    return (doc_words.join(keys, "w")
            .where(F.col("key").isNotNull())
            .groupBy("__id")
            .agg(F.count("*").alias("n_words"),
                 F.sum("np").alias("n_pieces"),
                 F.sum("key").alias("key_sum"))
            .withColumnRenamed("__id", id_col))
