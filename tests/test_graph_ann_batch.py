"""Batched graph ANN search (graph_ann_search_batch) and PMI
collocations — value checks against straight-line replays."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from ai_incident_analyst_spark.operators.graph_ann import (
    build_knn_graph,
    graph_ann_search,
    graph_ann_search_batch,
)
from ai_incident_analyst_spark.operators.text_analysis import (
    pmi_collocations,
)


def _vecs_df(spark, vecs):
    return spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>")


def test_batch_equals_singles(spark):
    # each query's batched walk must equal its single-query walk
    rng = np.random.default_rng(5)
    vecs = rng.normal(size=(25, 8))
    df = _vecs_df(spark, vecs)
    g = build_knn_graph(df, "vec_id", "embedding", k=3)
    qids = [2, 7, 11]
    qs = spark.createDataFrame(
        [(i, vecs[i].tolist()) for i in qids],
        "query_id long, query_vec array<double>")
    batch = graph_ann_search_batch(g, df, qs, "vec_id", "embedding",
                                   hops=2, beam=3, k=4)
    got = {}
    for r in batch.collect():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["vec_id"], r["sim"]))
    assert set(got) == set(qids)
    for qid in qids:
        single = graph_ann_search(g, df, "vec_id", "embedding",
                                  query_vec=vecs[qid].tolist(),
                                  hops=2, beam=3, k=4)
        exp = [(r["rank"], r["vec_id"], r["sim"])
               for r in single.collect()]
        assert got[qid] == exp, qid


def test_batch_no_driver_state(spark):
    # the batched walk must be one lazy plan: building it triggers no
    # Spark jobs (driver-side collects would)
    rng = np.random.default_rng(6)
    vecs = rng.normal(size=(10, 4))
    df = _vecs_df(spark, vecs)
    g = build_knn_graph(df, "vec_id", "embedding", k=2)
    qs = spark.createDataFrame(
        [(0, vecs[0].tolist())], "query_id long, query_vec array<double>")
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup() or [])
    out = graph_ann_search_batch(g, df, qs, "vec_id", "embedding",
                                 hops=2, beam=2, k=3)
    after = len(tracker.getJobIdsForGroup() or [])
    assert after == before            # plan built, nothing executed
    assert out.count() > 0            # and it runs


def test_pmi_collocations_matches_math(spark):
    # 'neural network' always adjacent; the pair must rank first with
    # the hand-computed PMI
    docs = [(i, "neural network models beat filler words here")
            for i in range(6)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = pmi_collocations(df, "doc_id", "text", min_count=5,
                           top_n=10).collect()
    assert len(out) > 0
    # every token appears 6 times, every adjacent pair 6 times:
    # all PMIs equal ln((6/36)/((6/42)^2)) — check against the formula
    n_uni, n_bi = 42.0, 36.0
    exp = round(math.log((6 / n_bi) / ((6 / n_uni) ** 2)), 6)
    assert all(r["pmi"] == exp and r["n_pair"] == 6 for r in out)
    assert (out[0]["w1"], out[0]["w2"]) == ("beat", "filler")  # tie order


def test_pmi_min_count_guard(spark):
    df = spark.createDataFrame(
        [(1, "rare pair only once"), (2, "other words entirely")],
        "doc_id long, text string")
    assert pmi_collocations(df, "doc_id", "text",
                            min_count=5).count() == 0


def test_graph_index_probe_identity_and_pruning(spark, tmp_path):
    from ai_incident_analyst_spark.operators.graph_ann import (
        graph_probe_index,
        graph_write_index,
    )
    rng = np.random.default_rng(8)
    vecs = rng.normal(size=(20, 6))
    df = _vecs_df(spark, vecs)
    g = build_knn_graph(df, "vec_id", "embedding", k=3)
    path = str(tmp_path / "gidx")
    graph_write_index(g, path, n_buckets=8)

    inline = [(r["rank"], r["vec_id"], r["sim"])
              for r in graph_ann_search(g, df, "vec_id", "embedding",
                                        hops=3, beam=3, k=5).collect()]
    probed_df = graph_probe_index(spark, path, df, "vec_id", "embedding",
                                  n_buckets=8, hops=3, beam=3, k=5)
    probed = [(r["rank"], r["vec_id"], r["sim"])
              for r in probed_df.collect()]
    assert inline == probed

    # pruning proof: a single-id fetch plans a __bucket partition filter
    index = spark.read.parquet(path)
    one = index.where((F.col("__bucket").isin([3]))
                      & F.col("src").isin([3]))
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "__bucket" in plan


def test_registry_index_query_matches_inline_query(spark):
    """graph_ann_index_query must return byte-identical rows to
    graph_ann_query at the same SF — same walk, same discretization,
    only the adjacency's physical source differs (persisted bucket
    index vs inline frame)."""
    from ai_incident_analyst_spark.queries import REGISTRY

    sf = "/root/testdata/sf0.001"
    inline = [tuple(r) for r in
              REGISTRY["graph_ann_query"].fn(spark, sf).collect()]
    probed = [tuple(r) for r in
              REGISTRY["graph_ann_index_query"].fn(spark, sf).collect()]
    assert inline == probed and len(inline) == 5
