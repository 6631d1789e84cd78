"""Retrieval-quality evaluation: recall@k and MRR of an ANN result
against the exact ground truth.

Every approximate index in this repo (IVF, LSH, PQ) ships with a pytest
recall check; this operator is the same measurement as a first-class
relational op, so a production pipeline can run "nightly recall of the
persisted index vs a sampled exact scan" as a query and alert on drift —
the standard ANN-ops practice (FAISS benchmarks report exactly these
two numbers).

Everything is joins + windows over the two result frames; with both
inputs produced by deterministic top-k operators the metrics are exact
rationals, so the whole evaluation hash-matches an independent SQL twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def retrieval_metrics(approx: DataFrame, exact: DataFrame, k: int,
                      query_id: str = "query_id", item_col: str = "vec_id",
                      dist_col: str = "distance") -> DataFrame:
    """Per-query ``(query_id, recall_at_k, mrr)``.

    - ``recall_at_k``: |approx ∩ exact| / k — both inputs are expected to
      be top-k frames (the kNN operators' output shape).
    - ``mrr``: 1 / (approx rank of the exact nearest neighbor), 0 when
      the true top-1 is missing from the approx list. Ranks order by
      ``(distance, item)`` — the repo-wide kNN tie rule.
    """
    def ranked(df):
        w = Window.partitionBy(query_id).orderBy(
            F.col(dist_col).asc(), F.col(item_col).asc())
        return df.select(query_id, item_col,
                         F.row_number().over(w).alias("rk"))

    ar = ranked(approx)
    er = ranked(exact)
    hits = (
        er.join(ar.select(query_id, item_col), [query_id, item_col],
                "left_semi")
        .groupBy(query_id).agg(F.count("*").alias("n_hit"))
    )
    top1 = (
        er.filter(F.col("rk") == 1)
        .select(query_id, item_col)
        .join(ar, [query_id, item_col], "left")
        .select(query_id, F.col("rk").alias("rk1"))
    )
    queries = exact.select(query_id).distinct()
    return (
        queries
        .join(hits, query_id, "left")
        .join(top1, query_id, "left")
        .select(
            query_id,
            F.round(F.coalesce(F.col("n_hit"), F.lit(0)) / F.lit(float(k)),
                    6).alias("recall_at_k"),
            F.round(F.coalesce(F.lit(1.0) / F.col("rk1"), F.lit(0.0)),
                    6).alias("mrr"),
        )
    )


def retrieval_ndcg(approx: DataFrame, exact: DataFrame, k: int,
                   query_id: str = "query_id", item_col: str = "vec_id",
                   dist_col: str = "distance") -> DataFrame:
    """Per-query graded nDCG@k: ``(query_id, ndcg_at_k)``.

    Relevance of an item is graded by its EXACT rank: ``rel = k − rank
    + 1`` for the exact top-k, 0 otherwise — the standard graded-gain
    setup when ground truth is itself a ranking.
    ``DCG = Σ rel_i / log2(i + 1)`` over the approx positions;
    ``IDCG`` is the same sum over the ideal (exact) order, so a perfect
    index scores exactly 1. Complements recall@k (set overlap) and MRR
    (top-1 placement) with rank-position sensitivity — the three
    numbers FAISS-style index evaluations report. Pure joins + windows
    sharing the kNN tie rule; log2 over small integers is deterministic
    FP, rounded 6 dp for the SQL twin.
    """
    def ranked(df):
        w = Window.partitionBy(query_id).orderBy(
            F.col(dist_col).asc(), F.col(item_col).asc())
        # truncate to top-k HERE: an input frame deeper than k (a top-10
        # frame evaluated @5) must not contribute tail positions to the
        # DCG or negative relevances (k − rank + 1 < 0) to the gains —
        # without the filter both silently happen
        return df.select(query_id, item_col,
                         F.row_number().over(w).alias("rk")) \
            .filter(F.col("rk") <= k)

    er = ranked(exact).withColumn(
        "rel", (F.lit(k) - F.col("rk") + 1).cast("double"))
    ar = ranked(approx)
    dcg = (
        ar.join(er.select(query_id, item_col, "rel"),
                [query_id, item_col], "inner")
        .groupBy(query_id)
        .agg(F.sum(F.col("rel") / F.log2(F.col("rk") + 1)).alias("dcg"))
    )
    idcg = (
        er.groupBy(query_id)
        .agg(F.sum(F.col("rel") / F.log2(F.col("rk") + 1)).alias("idcg"))
    )
    return (
        idcg.join(dcg, query_id, "left")
        .select(query_id,
                F.round(F.coalesce(F.col("dcg"), F.lit(0.0))
                        / F.col("idcg"), 6).alias("ndcg_at_k"))
    )
