"""BPE vocabulary training + encoding over a document corpus.

Beyond-reference LLM-data-pipeline surface (BASELINE.json north star):
``text_analysis.bpe_token_count`` estimates token budgets with a
pretokenizer regex; this module TRAINS an actual byte-pair-encoding
merge table from the corpus and encodes documents with it — the step
that turns a curated corpus into a tokenizer + token-count ledger
(cf. Sennrich et al. 2016, the public BPE algorithm; GPT-2-style
word-level training).

Scale design — the same bounded-driver contract as ``clustering.py``:

* The 100 TB part is the WORD-COUNT extraction: one tokenize projection
  + one map-side-combined groupBy. On clean text the distinct-word table
  is language-sized (≈10⁵–10⁷ rows); because web corpora also emit
  unbounded junk "words" (URLs, hashes, base64), ``bpe_train``
  additionally enforces ``min_word_count`` / ``max_vocab_rows`` so the
  driver collect is capped no matter what the corpus contains.
* The merge loop runs driver-side over that bounded count table —
  exactly where HuggingFace/SentencePiece trainers run it — with a
  deterministic tie-break (max count, then lexicographically smallest
  pair), so the merge list is reproducible across runs and partitionings.
* Encoding broadcasts the merge-rank dict and applies the standard
  greedy lowest-rank merge per word inside an Arrow ``mapInPandas``
  pass: embarrassingly parallel, zero shuffle.
"""

from __future__ import annotations

import logging
import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: end-of-word marker (keeps merges from crossing word boundaries and
#: distinguishes "est</w>" from mid-word "est")
EOW = "</w>"

#: Java-regex \s equivalent ([ \t\n\x0B\f\r]) — the encoder must split
#: words exactly like word_counts' Spark-side split, or it would score
#: tokens never present in the trained vocabulary (Python str.split()
#: additionally breaks on Unicode spaces like NBSP)
_JAVA_WS = re.compile("[ \t\n\x0b\f\r]+")


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Distinct lowercase whitespace-word counts — the only corpus-sized
    pass of BPE training. Returns ``(w, c)``."""
    return (
        df.select(F.explode(F.split(F.trim(F.lower(F.col(text_col))),
                                    r"\s+")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w").agg(F.count("*").alias("c"))
    )


def _pair_counts(vocab: dict[tuple[str, ...], int]) -> dict:
    pairs: dict[tuple[str, str], int] = {}
    for sym, c in vocab.items():
        for i in range(len(sym) - 1):
            p = (sym[i], sym[i + 1])
            pairs[p] = pairs.get(p, 0) + c
    return pairs


def _merge_vocab(vocab: dict[tuple[str, ...], int],
                 pair: tuple[str, str]) -> dict:
    a, b = pair
    ab = a + b
    out: dict[tuple[str, ...], int] = {}
    for sym, c in vocab.items():
        i, new = 0, []
        while i < len(sym):
            if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                new.append(ab)
                i += 2
            else:
                new.append(sym[i])
                i += 1
        out[tuple(new)] = out.get(tuple(new), 0) + c
    return out


def bpe_train(df: DataFrame, text_col: str = "text",
              num_merges: int = 100,
              min_pair_count: int = 2,
              min_word_count: int = 1,
              max_vocab_rows: int = 500_000) -> list[tuple[str, str]]:
    """Train a BPE merge list from the corpus.

    Distributed word-count pass, then the classic greedy loop over the
    bounded count table on the driver. Deterministic: ties on pair count
    break by the lexicographically smallest pair. Stops early when the
    best pair's count falls below ``min_pair_count``.

    The driver collect is BOUNDED: on clean natural text the distinct-word
    table is language-sized, but a web corpus's "words" include URLs,
    hashes, and base64 — unbounded in the corpus. ``min_word_count``
    filters singletons before the collect and ``max_vocab_rows`` caps it
    to the top-N words by ``(count desc, word asc)`` — a deterministic
    total order, so truncation is reproducible across partitionings. The
    same guard HF/SentencePiece trainers apply. The cap runs as Spark's
    TakeOrderedAndProject (per-partition top-N, merged on the driver), so
    no global sort shuffle is added. Truncation is logged at WARNING.
    """
    wc = word_counts(df, text_col)
    if min_word_count > 1:
        wc = wc.filter(F.col("c") >= min_word_count)
    # limit(max+1): the extra row is the truncation probe — a table of
    # exactly max_vocab_rows must NOT warn (len can never exceed the
    # limit, so `len >= max` alone can't tell truncation from exact fit)
    rows = (wc.orderBy(F.col("c").desc(), F.col("w").asc())
            .limit(max_vocab_rows + 1).collect())
    if len(rows) > max_vocab_rows:
        rows = rows[:max_vocab_rows]
        logging.getLogger(__name__).warning(
            "bpe_train: distinct-word table truncated to top %d rows by "
            "(count desc, word asc); raise max_vocab_rows or "
            "min_word_count to change coverage", max_vocab_rows)
    vocab = {}
    for r in rows:
        sym = tuple(r["w"]) + (EOW,)
        vocab[sym] = vocab.get(sym, 0) + int(r["c"])
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs = _pair_counts(vocab)
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < min_pair_count:
            break
        merges.append(best)
        vocab = _merge_vocab(vocab, best)
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy BPE encode of one word: repeatedly merge the lowest-rank
    adjacent pair — the standard published algorithm."""
    sym = list(word) + [EOW]
    while len(sym) > 1:
        best_rank, best_i = None, -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i:best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_encode_tokens(df: DataFrame, id_col: str, text_col: str,
                      merges: list[tuple[str, str]],
                      out_col: str = "tokens") -> DataFrame:
    """Per-document token SEQUENCE under a trained merge list — the
    actual tokenize-for-training step (``bpe_encode_counts`` only sizes
    the budget; shard writers need the tokens themselves).

    Same physical shape as the counter: broadcast rank dict, one Arrow
    pass, zero shuffle, per-word memoization; emits ``array<string>``
    in document word order. Token-ID mapping is a downstream dictionary
    join (vocab = distinct tokens), deliberately not fused here.
    """
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    sc = df.sparkSession.sparkContext
    br = sc.broadcast(ranks)
    cols = df.columns
    fields = ", ".join(f"`{f.name}` {f.dataType.simpleString()}"
                       for f in df.schema.fields)
    schema = f"{fields}, {out_col} array<string>"

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rk = br.value
        memo: dict[str, list[str]] = {}

        def tokens(text: str) -> list[str]:
            out: list[str] = []
            for w in _JAVA_WS.split((text or "").lower()):
                if not w:
                    continue
                t = memo.get(w)
                if t is None:
                    t = encode_word(w, rk)
                    memo[w] = t
                out.extend(t)
            return out

        for pdf in batches:
            out = pdf[cols].copy()
            out[out_col] = [tokens(t) for t in pdf[text_col]]
            yield out

    return df.mapInPandas(part, schema=schema)


def bpe_vocab_ids(df: DataFrame, text_col: str,
                  merges: list[tuple[str, str]]) -> DataFrame:
    """The trained vocabulary as ``(token, tid, freq)`` with
    deterministic ids: rank by (corpus frequency DESC, token ASC).

    The vocab is BOUNDED by construction — tokens are single characters
    plus merge outputs, so |vocab| ≤ |alphabet| + |merges| regardless of
    corpus size — which is what makes collecting it to the driver (for
    ``bpe_encode_ids``'s broadcast) safe at 100 TB.
    """
    from pyspark.sql import Window

    freq = (
        bpe_encode_tokens(df.select(text_col), "__unused", text_col, merges)
        .select(F.explode("tokens").alias("token"))
        .groupBy("token").agg(F.count("*").alias("freq"))
    )
    w = Window.orderBy(F.desc("freq"), F.asc("token"))
    return freq.withColumn("tid", (F.row_number().over(w) - 1).cast("int")) \
               .select("token", "tid", "freq")


def bpe_encode_ids(df: DataFrame, id_col: str, text_col: str,
                   merges: list[tuple[str, str]],
                   vocab: dict[str, int],
                   out_col: str = "token_ids") -> DataFrame:
    """Per-document TOKEN-ID sequence — the final tokenizer artifact
    (what a training-shard writer serializes). ``vocab`` is the
    {token: id} map from ``bpe_vocab_ids`` (bounded, broadcast).
    Tokens outside the vocab (impossible when encoding the training
    corpus itself; possible on held-out text) map to -1, the
    conventional unk sentinel."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    sc = df.sparkSession.sparkContext
    br = sc.broadcast((ranks, dict(vocab)))
    cols = df.columns
    fields = ", ".join(f"`{f.name}` {f.dataType.simpleString()}"
                       for f in df.schema.fields)
    schema = f"{fields}, {out_col} array<int>"

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rk, vc = br.value
        memo: dict[str, list[int]] = {}

        def ids(text: str) -> list[int]:
            out: list[int] = []
            for w in _JAVA_WS.split((text or "").lower()):
                if not w:
                    continue
                t = memo.get(w)
                if t is None:
                    t = [vc.get(tok, -1) for tok in encode_word(w, rk)]
                    memo[w] = t
                out.extend(t)
            return out

        for pdf in batches:
            out = pdf[cols].copy()
            out[out_col] = [ids(t) for t in pdf[text_col]]
            yield out

    return df.mapInPandas(part, schema=schema)


def bpe_encode_counts(df: DataFrame, id_col: str, text_col: str,
                      merges: list[tuple[str, str]],
                      out_col: str = "n_bpe_tokens") -> DataFrame:
    """Per-document token count under a trained merge list.

    Broadcasts the rank dict; one Arrow pass, zero shuffle, all input
    columns pass through plus ``out_col``. Per-word encodings are
    memoized per batch (Zipf makes the word set per batch tiny relative
    to occurrences).
    """
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    sc = df.sparkSession.sparkContext
    br = sc.broadcast(ranks)
    cols = df.columns
    fields = ", ".join(f"`{f.name}` {f.dataType.simpleString()}"
                       for f in df.schema.fields)
    schema = f"{fields}, {out_col} long"

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rk = br.value
        memo: dict[str, int] = {}

        def count_tokens(text: str) -> int:
            total = 0
            for w in _JAVA_WS.split((text or "").lower()):
                if not w:
                    continue
                n = memo.get(w)
                if n is None:
                    n = len(encode_word(w, rk))
                    memo[w] = n
                total += n
            return total

        for pdf in batches:
            out = pdf[cols].copy()
            out[out_col] = [count_tokens(t) for t in pdf[text_col]]
            yield out

    return df.mapInPandas(part, schema=schema)
