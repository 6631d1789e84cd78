"""Batched text-embedding operator (SURVEY.md §2.8 U1).

Reference parity: ``src/embedding/embedder.py:23-30`` — concat configured
fields (null-skipping, embedder.py:19-21), batch through
SentenceTransformer.encode(batch_size=32), attach ``embedding`` column.

Spark design: an **iterator pandas_udf** — the model is initialized once
per Python worker (the reference loads it once per LogEmbedder instance,
embedder.py:16; per-executor init is the distributed analog), batches
arrive via Arrow sized by spark.sql.execution.arrow.maxRecordsPerBatch
(the batch_size=32 knob's analog). Everything upstream/downstream of the
UDF stays JVM-side.

The real sentence-transformers model is not in this container, so the
default model is a deterministic hashing embedder (feature-hashing
bag-of-words, L2-normalized) — same shape/contract, reproducible across
partitionings, no torch dependency. Swap ``make_model`` for a real
encoder on a cluster with GPUs.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf

DEFAULT_DIM = 64  # matches testdata embeddings.parquet; reference dim is 384


def hashing_encode(texts: list[str], dim: int = DEFAULT_DIM) -> np.ndarray:
    """Deterministic fake encoder: md5 feature-hashed bag of words,
    signed, L2-normalized. Stable across processes (no PYTHONHASHSEED)."""
    out = np.zeros((len(texts), dim), dtype=np.float32)
    for i, t in enumerate(texts):
        for tok in (t or "").lower().split():
            h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "little")
            sign = 1.0 if (h >> 63) & 1 else -1.0
            out[i, h % dim] += sign
        n = float(np.linalg.norm(out[i]))
        if n > 0:
            out[i] /= n
    return out


def make_embed_udf(dim: int = DEFAULT_DIM,
                   make_model: Callable[[], Callable[[list[str]], np.ndarray]] | None = None):
    """Build the iterator pandas_udf. ``make_model`` runs once per worker
    (expensive init goes there — model load, GPU pin); default is the
    hashing encoder."""

    @pandas_udf("array<float>")
    def embed(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        model = make_model() if make_model else (lambda ts: hashing_encode(ts, dim))
        for s in batches:
            vecs = model(s.fillna("").tolist())
            yield pd.Series([np.asarray(v, dtype=np.float32) for v in vecs])

    return embed


def embed_text(df: DataFrame, fields: list[str],
               out_col: str = "embedding", dim: int = DEFAULT_DIM,
               make_model=None) -> DataFrame:
    """U1 end-to-end: null-skip concat of ``fields`` (embedder.py:19-21)
    → batched encode → attach ``embedding`` array<float> column."""
    text = F.concat_ws(" ", *[F.col(f) for f in fields])
    return df.withColumn(out_col, make_embed_udf(dim, make_model)(text))
