"""Inverted index / boolean search / BM25: hand-built corpus truths,
plus the persisted-index partition-pruning proof."""

import pytest

from pyspark.sql import functions as F

from ai_incident_analyst_spark.operators.search import (
    bm25_rank,
    build_inverted_index,
    read_index_for_terms,
    search_all_terms,
    write_inverted_index,
)

pytestmark = pytest.mark.usefixtures("spark")


def _corpus(spark):
    rows = [(1, "the cat sat on the mat"),
            (2, "the dog sat"),
            (3, "cat dog cat"),
            (4, "birds fly high")]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_index_term_frequencies(spark):
    idx = build_inverted_index(_corpus(spark), "doc_id", "text")
    got = {(r["term"], r["doc_id"]): r["tf"] for r in idx.collect()}
    assert got[("the", 1)] == 2
    assert got[("cat", 3)] == 2
    assert ("cat", 2) not in got


def test_search_all_terms_intersection(spark):
    idx = build_inverted_index(_corpus(spark), "doc_id", "text")
    got = {r["doc_id"] for r in
           search_all_terms(idx, ["cat", "sat"]).collect()}
    assert got == {1}
    # case-insensitive query terms
    got2 = {r["doc_id"] for r in
            search_all_terms(idx, ["CAT", "DOG"]).collect()}
    assert got2 == {3}


def test_bm25_prefers_tf_and_rarity(spark):
    idx = build_inverted_index(_corpus(spark), "doc_id", "text")
    dl = idx.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    out = bm25_rank(idx, dl, ["cat"], n_docs=4, avg_len=4.0,
                    topn=10).collect()
    ranked = [r["doc_id"] for r in out]
    # doc 3 has tf=2 and is short -> must outrank doc 1 (tf=1, longer)
    assert ranked == [3, 1]
    assert out[0]["score"] > out[1]["score"] > 0


def test_persisted_index_prunes_buckets(spark, tmp_path):
    idx = build_inverted_index(_corpus(spark), "doc_id", "text")
    path = str(tmp_path / "idx")
    write_inverted_index(idx, path, n_buckets=16)
    probe = read_index_for_terms(spark, path, ["cat", "dog"], n_buckets=16)
    got = {(r["term"], r["doc_id"]): r["tf"] for r in probe.collect()}
    want = {k: v for k, v in
            {(r["term"], r["doc_id"]): r["tf"] for r in idx.collect()}.items()
            if k[0] in ("cat", "dog")}
    assert got == want
    # pruning proof: the scan's partition filters mention the bucket list
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan


def test_rrf_fusion_hand_computed(spark):
    from ai_incident_analyst_spark.operators.search import rrf_fuse
    a = spark.createDataFrame([(1, 9.0), (2, 5.0), (3, 1.0)],
                              "doc_id long, score double")
    b = spark.createDataFrame([(3, 0.9), (1, 0.5)],
                              "doc_id long, score double")
    got = {r["doc_id"]: r["rrf_score"]
           for r in rrf_fuse([a, b], k=60, topn=10).collect()}
    assert got[1] == round(1 / 61 + 1 / 62, 6)
    assert got[2] == round(1 / 62, 6)
    assert got[3] == round(1 / 63 + 1 / 61, 6)
    # doc 1 (rank1 + rank2) outranks doc 3 (rank3 + rank1)
    assert got[1] > got[3] > got[2]


def test_phrase_search_consecutive_only(spark):
    from ai_incident_analyst_spark.operators.search import (
        build_positional_index,
        phrase_search,
    )
    rows = [(1, "big red fox"), (2, "red big fox"), (3, "big red big red")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pidx = build_positional_index(df, "doc_id", "text")
    got = {r["doc_id"]: r["n_occurrences"]
           for r in phrase_search(pidx, "big red").collect()}
    # doc 2 has both words but not adjacent in order
    assert got == {1: 1, 3: 2}
    # three-word phrase
    got3 = {r["doc_id"]: r["n_occurrences"]
            for r in phrase_search(pidx, "big red fox").collect()}
    assert got3 == {1: 1}
    import pytest as _p
    with _p.raises(ValueError):
        phrase_search(pidx, "   ")


def test_ql_rank_hand_computed(spark):
    """QL score against the straight-line Dirichlet formula on a tiny
    corpus, including the zero-tf decomposition (a doc matching only
    one of two query terms must still score the full two-term value)."""
    import math

    from ai_incident_analyst_spark.operators.search import (
        build_inverted_index,
        ql_rank,
    )

    rows = [(0, "cat cat dog"), (1, "cat fish fish fish"), (2, "bird bird")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    idx = build_inverted_index(df, "doc_id", "text")
    dl = idx.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    ct = 9  # total tokens
    mu = 10.0
    got = {r["doc_id"]: r["score"]
           for r in ql_rank(idx, dl, ["cat", "dog"], collection_tokens=ct,
                            mu=mu, topn=10).collect()}

    def ql(tfs, dln):
        # full formula: sum_t ln((tf + mu*cf_t/ct) / (dln + mu))
        cf = {"cat": 3, "dog": 1}
        return round(sum(
            math.log((tfs.get(t, 0) + mu * cf[t] / ct) / (dln + mu))
            for t in cf), 6)

    assert got[0] == ql({"cat": 2, "dog": 1}, 3)
    assert got[1] == ql({"cat": 1}, 4)       # zero-tf dog term included
    assert 2 not in got                       # no query term -> unranked
    assert got[0] > got[1]


def test_ql_rank_absent_term_ignored(spark):
    from ai_incident_analyst_spark.operators.search import (
        build_inverted_index,
        ql_rank,
    )

    df = spark.createDataFrame([(0, "cat cat")], "doc_id long, text string")
    idx = build_inverted_index(df, "doc_id", "text")
    dl = idx.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    with_zx = ql_rank(idx, dl, ["cat", "zxq"], collection_tokens=2,
                      mu=10.0).collect()
    without = ql_rank(idx, dl, ["cat"], collection_tokens=2,
                      mu=10.0).collect()
    assert [tuple(r) for r in with_zx] == [tuple(r) for r in without]


def test_best_snippet_densest_window_and_ties(spark):
    from ai_incident_analyst_spark.operators.search import best_snippet

    rows = [
        # hits at tokens 2, 9, 10 (1-based); W=4: window starting at 9
        # holds 2 hits — the densest; the early lone hit loses
        (0, "a cat b c d e f g cat cat k l"),
        # tie: two 1-hit windows -> earliest start wins
        (1, "x cat y z q w e r cat t"),
        (2, "no query words here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           best_snippet(df, "doc_id", "text", ["cat"], window=4).collect()}
    assert set(got) == {0, 1}
    assert (got[0]["start_tok"], got[0]["n_hits"]) == (9, 2)
    assert got[0]["snippet"] == "cat cat k l"
    assert (got[1]["start_tok"], got[1]["n_hits"]) == (2, 1)
    assert got[1]["snippet"] == "cat y z q"


def test_best_snippet_window_clamps_at_doc_end(spark):
    from ai_incident_analyst_spark.operators.search import best_snippet

    df = spark.createDataFrame([(0, "a b cat")], "doc_id long, text string")
    r = best_snippet(df, "doc_id", "text", ["cat"], window=5).first()
    assert r["snippet"] == "cat" and r["start_tok"] == 3
