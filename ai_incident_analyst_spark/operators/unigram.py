"""SentencePiece-style unigram segmentation with an exact, engine-
portable Viterbi.

The tokenizer family's second member (``operators/bpe.py`` is the
first): a unigram language model scores every way of splitting a word
into vocabulary pieces and keeps the max-likelihood segmentation
(Kudo 2018). Training SentencePiece runs EM; this module implements
the INFERENCE half — segmentation under a given piece vocabulary —
plus a deterministic count-based vocabulary builder, which is the part
a 100 TB pipeline runs per-document (EM training, like BPE merge
training, touches only the bounded word-count table).

Exactness contract (what makes a DuckDB twin hash-match a dynamic
program): all Viterbi arithmetic is INTEGER. A piece's edge weight is
``round(−ln(p)·1e6)·1000 + 1`` — cost quantized to micro-nats in the
upper digits, a piece COUNTER in the ones digit — so one ``min()``
over path sums simultaneously minimizes (cost, n_pieces) with no FP
accumulation and no tie-break ambiguity: equal keys ARE equal answers.
A 20-piece path stays < 3e11, eight orders below int64 overflow. The
only float op is the one ``ln`` per vocabulary entry (bounded table),
quantized at source — the repo-wide discretization contract.

Physical plan:

- vocabulary build: words → substring explode (``sequence`` ×
  ``substring``, narrow) → one map-side-combined piece count →
  ``TakeOrderedAndProject`` top-k ∪ the single-character floor (which
  guarantees every corpus word is segmentable);
- encode: the corpus collapses to its DISTINCT word table (bounded by
  the language, not the corpus — the same argument as BPE training);
  the Viterbi DP runs once per distinct word in an Arrow batch with
  the vocabulary dict broadcast; per-document stats come from joining
  the per-word keys back (one keyed shuffle) and aggregating.
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


def unigram_vocab(df: DataFrame, text_col: str, max_piece: int = 4,
                  top_k: int = 200,
                  max_word_len: int = 12) -> DataFrame:
    """Deterministic piece vocabulary: the ``top_k`` most frequent
    substrings (length ≤ ``max_piece``) of the corpus's word stream,
    counted with multiplicity, UNION the single-character floor.
    Returns ``(piece, ek)`` with ``ek`` the integer Viterbi edge
    weight described in the module docstring."""
    words = _words(df, text_col, max_word_len) \
        .groupBy("w").agg(F.count("*").alias("wc"))
    st = F.explode(F.sequence(F.lit(1), F.length("w"))).alias("st")
    ln = F.explode(F.sequence(F.lit(1), F.lit(max_piece))).alias("l")
    subs = (words.select("w", "wc", st)
            .select("w", "wc", "st", ln)
            .where(F.col("st") + F.col("l") - 1 <= F.length("w"))
            .select(F.col("w").substr(F.col("st"), F.col("l"))
                    .alias("piece"), "wc"))
    counts = subs.groupBy("piece").agg(F.sum("wc").alias("cnt"))
    topk = counts.orderBy(F.desc("cnt"), F.col("piece").asc()).limit(top_k)
    chars = counts.where(F.length("piece") == 1)
    vocab0 = topk.unionByName(chars).distinct()
    tot = vocab0.agg(F.sum("cnt").alias("__tot"))
    return (vocab0.crossJoin(F.broadcast(tot))
            .select("piece",
                    (F.round(-F.log(F.col("cnt") / F.col("__tot"))
                             * F.lit(1e6)).cast("long") * 1000 + 1)
                    .alias("ek")))


def unigram_encode_stats(df: DataFrame, id_col: str, text_col: str,
                         vocab: DataFrame,
                         max_word_len: int = 12) -> DataFrame:
    """Per-document segmentation stats under ``vocab``:
    ``(id_col, n_words, n_pieces, total_key)`` — ``total_key`` the sum
    of each word's minimal integer Viterbi key (micro-nat cost ‖ piece
    count), ``n_pieces`` recovered from the keys' ones digits.
    Documents with no qualifying word produce no row. Words containing
    a character outside the vocabulary (impossible when the vocabulary
    was built from the same corpus) are skipped, not crashed."""
    ventries = [(r["piece"], int(r["ek"])) for r in vocab.collect()]
    vmap = dict(ventries)
    max_piece = max((len(p) for p in vmap), default=1)
    sc = df.sparkSession.sparkContext
    bc = sc.broadcast((vmap, max_piece))

    doc_words = df.select(F.col(id_col).alias("__id"),
                          F.col(text_col)).select(
        "__id",
        F.explode(F.filter(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
            lambda t: (F.length(t) > 0)
            & (F.length(t) <= max_word_len))).alias("w"))
    distinct_words = doc_words.select("w").distinct()

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        vm, mp = bc.value

        def best(w: str):
            n = len(w)
            dp = [None] * (n + 1)
            dp[0] = 0
            for j in range(1, n + 1):
                b = None
                for l in range(1, min(mp, j) + 1):
                    ek = vm.get(w[j - l:j])
                    if ek is None or dp[j - l] is None:
                        continue
                    cand = dp[j - l] + ek
                    if b is None or cand < b:
                        b = cand
                dp[j] = b
            return dp[n]

        for pdf in batches:
            yield pd.DataFrame({"w": pdf["w"],
                                "key": [best(w) for w in pdf["w"]]})

    keys = distinct_words.mapInPandas(part, schema="w string, key long")
    return (doc_words.join(keys, "w")
            .where(F.col("key").isNotNull())
            .groupBy("__id")
            .agg(F.count("*").alias("n_words"),
                 F.sum(F.col("key") % 1000).alias("n_pieces"),
                 F.sum("key").alias("total_key"))
            .withColumnRenamed("__id", id_col))
