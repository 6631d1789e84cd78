"""Sequence packing: map a token-counted corpus onto fixed-length training
sequences ("packs") the way GPT-style pretraining pipelines do — concatenate
all documents in a deterministic order and cut every ``seq_len`` tokens,
letting documents straddle pack boundaries.

Beyond-reference LLM-data-pipeline surface (BASELINE.json north star): the
reference stops at embedding batches of 32 (src/embedding/embedder.py:13);
packing is the downstream step any 100 TB pretraining pipeline needs.

Scale design
------------
The core primitive is a GLOBAL prefix sum of token counts in doc-id order.
A naive ``Window.orderBy(id)`` with no partition key collapses the corpus
into ONE task — correct at sf0.01, dead at 100 TB. Instead, the classic
two-phase distributed scan:

1. ``repartitionByRange(id)`` — range shuffle, Spark samples split bounds.
2. per-partition local cumsum (window PARTITIONED by the physical
   partition id — parallel, no cross-partition dependency).
3. per-partition totals (a ``spark_partition_id`` groupBy — one row per
   partition, collected to the driver: KB-scale even at 100k partitions).
4. broadcast the exclusive prefix of the totals back and add.

Everything else is arithmetic on the running offset — fully codegen'd,
zero Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_cumsum(df: DataFrame, order_col: str, value_col: str,
                  out_col: str = "cumsum",
                  num_partitions: int | None = None) -> DataFrame:
    """Exact global running total of ``value_col`` in ``order_col`` order,
    without ever funneling the data through a single task.

    Returns the input plus ``out_col`` = inclusive prefix sum. Rows with
    equal ``order_col`` values are summed in an arbitrary relative order —
    use a unique ordering column (doc id) for determinism.
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(n, F.col(order_col)) \
        .withColumn("__pid", F.spark_partition_id())
    w = Window.partitionBy("__pid").orderBy(order_col) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # the local-cumsum subtree feeds TWO consumers (the totals agg and the
    # final join) and the broadcast on the totals side defeats
    # ReuseExchange — checkpoint so the range shuffle + window run once
    # (r3 plan audit: 2 scans / 5 shuffles → 1 scan)
    local = ranged.withColumn("__local", F.sum(value_col).over(w)) \
        .localCheckpoint(eager=False)
    # one row per partition — tiny driver collect, then a broadcast join
    # (the totals table is KB-scale; Spark broadcasts it automatically)
    totals = (
        local.groupBy("__pid").agg(F.sum(value_col).alias("__tot"))
    )
    pw = Window.orderBy("__pid") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    offsets = (
        totals.withColumn("__off", F.sum("__tot").over(pw) - F.col("__tot"))
        .select("__pid", "__off")
    )
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(out_col, (F.col("__local") + F.col("__off")).cast("long"))
        .drop("__pid", "__local", "__off")
    )


def pack_sequences(df: DataFrame, id_col: str, tokens_col: str,
                   seq_len: int,
                   num_partitions: int | None = None) -> DataFrame:
    """Assign every document its span of fixed-length training packs.

    Documents are laid head-to-tail in ``id_col`` order; pack ``p`` owns
    token offsets [p*seq_len, (p+1)*seq_len). A document starting at
    global offset ``s`` with ``t`` tokens appears in every pack it
    overlaps, with per-pack slice bounds — one output row per (doc, pack):

    ``(id, pack_id, tok_start, tok_end)`` where ``tok_start``/``tok_end``
    are the document-relative token slice [tok_start, tok_end) that lands
    in ``pack_id``. Zero-token docs are dropped (they occupy no span).

    The explode fan-out is bounded: a doc spans at most
    ``ceil(t/seq_len)+1`` packs, so output size is O(total_tokens/seq_len
    + n_docs) — linear, no skew amplification.
    """
    cum = global_cumsum(df.select(id_col, tokens_col), id_col, tokens_col,
                        "__cum", num_partitions)
    t = F.col(tokens_col).cast("long")
    start = (F.col("__cum") - t)
    first = F.floor(start / seq_len)
    last = F.floor((F.col("__cum") - 1) / seq_len)
    packs = (
        cum.filter(t > 0)
        .withColumn("pack_id", F.explode(F.sequence(first, last)))
        .select(
            F.col(id_col),
            F.col("pack_id").cast("long").alias("pack_id"),
            # doc-relative slice owned by this pack
            (F.greatest(F.col("pack_id") * seq_len, start) - start)
            .cast("long").alias("tok_start"),
            (F.least((F.col("pack_id") + 1) * seq_len, F.col("__cum"))
             - start).cast("long").alias("tok_end"),
        )
    )
    return packs


def shard_by_token_budget(df: DataFrame, id_col: str, tokens_col: str,
                          budget: int,
                          num_partitions: int | None = None) -> DataFrame:
    """Assign every document to a contiguous output shard of ≈ ``budget``
    tokens — the deterministic sharding step that turns a curated corpus
    into training files of roughly equal token mass (docs are never split;
    use ``pack_sequences`` when exact fixed-length spans are wanted).

    A document is owned by the shard containing its START offset in the
    global id-ordered layout: ``shard_id = floor(start / budget)``. Every
    shard therefore holds ≥ budget − max_doc_tokens and < budget + 
    max_doc_tokens tokens; assignment is append-stable for any suffix of
    new ids. Same two-phase distributed prefix sum as ``pack_sequences``
    — no single-task global window. Returns
    ``(id, tokens_col, shard_id)``; zero-token docs keep their position
    (they cost nothing and stay addressable).
    """
    cum = global_cumsum(df.select(id_col, tokens_col), id_col, tokens_col,
                        "__cum", num_partitions)
    t = F.col(tokens_col).cast("long")
    return (
        cum.withColumn(
            "shard_id",
            F.floor((F.col("__cum") - t) / F.lit(budget)).cast("long"))
        .select(id_col, tokens_col, "shard_id")
    )


def shard_manifest(df: DataFrame, id_col: str, tokens_col: str,
                   shard_col: str = "shard_id") -> DataFrame:
    """Deterministic per-shard manifest ``(shard_id, n_docs, n_tokens,
    content_hash)`` — the reproducibility artifact shipped next to
    training shards: a reader can verify a shard's membership without
    rescanning it. ``content_hash`` is md5 over the SORTED concatenation
    of each member id's own md5 — fixed-width tokens, so the encoding is
    unambiguous for any id type (a delimiter join would collide
    {"a,b","c"} with {"a","b,c"} on string ids), independent of
    partitioning/arrival order, and cross-engine checkable. One keyed
    aggregation; collect_list is per shard (≈ budget/avg_doc_tokens ids
    — bounded by construction).
    """
    return (
        df.groupBy(shard_col)
        .agg(F.count("*").alias("n_docs"),
             F.sum(tokens_col).alias("n_tokens"),
             F.md5(F.array_join(
                 F.sort_array(
                     F.collect_list(F.md5(F.col(id_col).cast("string")))),
                 "")).alias("content_hash"))
    )
