"""Sliding-window document chunking — the RAG / context-assembly
splitter.

The reference feeds WHOLE incident documents into its prompt builder
(``src/rag_pipeline.py`` concatenates full descriptions); that works for
60-row incident tables and fails at corpus scale, where retrieval and
embedding operate on bounded-size chunks. This operator is the standard
fixed-token-window splitter with overlap (the LangChain/LlamaIndex
"sliding window" recipe, restated relationally): window ``W`` tokens,
stride ``S`` (overlap ``W−S``), so every token is covered and a passage
split across a boundary still appears whole in the next chunk.

Engine-portable by construction:

- tokens are the ``\\s+`` split with empties dropped (DuckDB:
  ``string_split_regex`` + ``list_filter`` — identical semantics);
- the chunk count is EXACT INTEGER arithmetic:
  ``n ≤ W → 1``, else ``1 + ceil((n−W)/S)`` computed as
  ``1 + (n − W + S − 1) div S`` — integer floor-div on a non-negative
  numerator, no float, no rounding-rule ambiguity between engines;
- chunk ``i`` is tokens ``[i·S+1, i·S+W]`` (1-based slice) joined with
  single spaces — whitespace runs are not preserved (a tokenizer-bound
  consumer never sees them anyway), which is what lets the twin agree
  byte-for-byte.

Physical plan, and why it holds at 100 TB: one NARROW pass — split,
integer chunk count, ``sequence``/``explode`` fan-out, ``slice`` +
``array_join`` — no shuffle, no UDF, whole-stage codegen end to end.
The fan-out multiplies rows by ~n/S but each output row is bounded
(≤W tokens), so downstream embedding/indexing stages see uniformly
sized units regardless of input document skew — that bounding is the
point of the operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(df: DataFrame, id_col: str, text_col: str,
                    window: int = 64, stride: int = 48,
                    out_text: str = "chunk_text") -> DataFrame:
    """Split each document into overlapping token windows.

    Returns ``(id_col, chunk_idx, start_tok, n_tokens, out_text)`` —
    ``chunk_idx`` 0-based, ``start_tok`` the 1-based token offset of the
    chunk's first token (so a consumer can map a chunk hit back into the
    source document), ``n_tokens`` the actual chunk length (= ``window``
    everywhere except the final partial chunk). Documents whose token
    stream is empty produce no chunks.
    """
    if not (0 < stride <= window):
        raise ValueError(f"need 0 < stride <= window, got {stride}/{window}")
    toks = F.filter(F.split(F.col(text_col), r"\s+"),
                    lambda t: F.length(t) > 0)
    base = (df.select(F.col(id_col), toks.alias("__toks"))
            .where(F.size("__toks") > 0))
    n = F.size(F.col("__toks"))
    nchunks = F.when(n <= window, F.lit(1)).otherwise(
        F.lit(1) + F.floor((n - window + stride - 1) / F.lit(stride)))
    fan = base.select(
        id_col, "__toks",
        F.explode(F.sequence(F.lit(0), (nchunks - 1).cast("int")))
         .alias("chunk_idx"))
    chunk = F.slice(F.col("__toks"), F.col("chunk_idx") * stride + 1, window)
    return fan.select(
        id_col,
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        (F.col("chunk_idx") * stride + 1).cast("long").alias("start_tok"),
        F.size(chunk).cast("long").alias("n_tokens"),
        F.array_join(chunk, " ").alias(out_text))
