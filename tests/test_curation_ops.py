"""Chunking, hard-negative mining, and curriculum ordering
(operators/chunking.py, mining.py, curriculum.py): hand-computed
reference values, edge cases, determinism under repartitioning, and
plan-shape contracts (chunking must stay shuffle-free and UDF-free)."""

import pytest
from pyspark.sql import functions as F

from ai_incident_analyst_spark.operators.chunking import chunk_documents
from ai_incident_analyst_spark.operators.curriculum import (
    difficulty_buckets,
    interleave_order,
)
from ai_incident_analyst_spark.operators.mining import mine_hard_negatives


# ---------------------------------------------------------------------------
# chunk_documents
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "a b c d e f g h i j"),        # 10 toks
        (1, "one  two\tthree"),            # whitespace runs collapse
        (2, "   "),                        # empty after filter -> no chunks
        (3, "solo"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_exact_windows(spark, docs):
    # W=4 S=2 over 10 tokens: chunks at starts 1,3,5,7,9 ->
    # nchunks = 1 + ceil((10-4)/2) = 4 ... check the formula:
    # 1 + (10-4+1)//2 = 1 + 3 = 4 -> starts 1,3,5,7 (last covers 7..10)
    out = {(r["chunk_idx"], r["start_tok"], r["n_tokens"], r["chunk_text"])
           for r in chunk_documents(docs.where("doc_id = 0"), "doc_id",
                                    "text", window=4, stride=2).collect()}
    assert out == {
        (0, 1, 4, "a b c d"),
        (1, 3, 4, "c d e f"),
        (2, 5, 4, "e f g h"),
        (3, 7, 4, "g h i j"),
    }


def test_chunk_tail_and_coverage(spark, docs):
    # W=4 S=3 over 10 tokens: nchunks = 1 + ceil(6/3) = 3 -> starts
    # 1,4,7; chunk 2 covers tokens 7..10 (full), every token covered
    rows = chunk_documents(docs.where("doc_id = 0"), "doc_id", "text",
                           window=4, stride=3).collect()
    assert [r["start_tok"] for r in sorted(rows, key=lambda r: r["chunk_idx"])] \
        == [1, 4, 7]
    covered = set()
    for r in rows:
        covered.update(range(r["start_tok"], r["start_tok"] + r["n_tokens"]))
    assert covered == set(range(1, 11))


def test_chunk_short_and_empty_docs(spark, docs):
    rows = chunk_documents(docs, "doc_id", "text",
                           window=4, stride=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert 2 not in by_doc                       # empty doc -> no chunks
    assert len(by_doc[3]) == 1
    assert by_doc[3][0]["chunk_text"] == "solo"
    assert by_doc[3][0]["n_tokens"] == 1
    assert [r["chunk_text"] for r in by_doc[1]] == ["one two three"]


def test_chunk_partial_tail_len(spark):
    # 5 tokens, W=4 S=4: chunks at 1 (4 toks) and 5 (1 tok)
    df = spark.createDataFrame([(0, "a b c d e")], "doc_id long, text string")
    rows = sorted(chunk_documents(df, "doc_id", "text", window=4,
                                  stride=4).collect(),
                  key=lambda r: r["chunk_idx"])
    assert [(r["start_tok"], r["n_tokens"]) for r in rows] == [(1, 4), (5, 1)]


def test_chunk_bad_stride(spark, docs):
    with pytest.raises(ValueError):
        chunk_documents(docs, "doc_id", "text", window=4, stride=5)
    with pytest.raises(ValueError):
        chunk_documents(docs, "doc_id", "text", window=4, stride=0)


def test_chunk_plan_no_shuffle_no_udf(spark, docs):
    plan = chunk_documents(docs, "doc_id", "text")._jdf \
        .queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# mine_hard_negatives
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def mining_frames(spark):
    # 1-d embeddings make cosine degenerate; use 2-d with known angles.
    # query q0 at (1, 0). corpus items by angle from q0 (cos desc):
    #   10:(1,0) sim 1.0   11:(4,1) sim .970  12:(2,1) sim .894
    #   13:(1,1) sim .707  14:(0,1) sim 0.0
    corpus = spark.createDataFrame(
        [(10, [1.0, 0.0]), (11, [4.0, 1.0]), (12, [2.0, 1.0]),
         (13, [1.0, 1.0]), (14, [0.0, 1.0])],
        "vec_id long, embedding array<double>")
    queries = spark.createDataFrame(
        [(0, [1.0, 0.0])], "query_id long, query_vec array<double>")
    positives = spark.createDataFrame(
        [(0, 10)], "query_id long, vec_id long")
    return queries, corpus, positives


def test_mining_excludes_positives_and_ranks(spark, mining_frames):
    queries, corpus, positives = mining_frames
    rows = mine_hard_negatives(queries, corpus, positives, k=3) \
        .orderBy("rank").collect()
    assert [r["vec_id"] for r in rows] == [11, 12, 13]
    assert [r["rank"] for r in rows] == [1, 2, 3]
    assert rows[0]["sim"] == pytest.approx(4 / (17 ** 0.5), abs=1e-6)


def test_mining_margin_drops_near_positives(spark, mining_frames):
    queries, corpus, positives = mining_frames
    # best positive sim = 1.0; margin .1 drops 11 (sim .970 > .9)
    rows = mine_hard_negatives(queries, corpus, positives, k=3,
                               margin=0.1).orderBy("rank").collect()
    assert [r["vec_id"] for r in rows] == [12, 13, 14]
    # margin filter applies BEFORE the top-k: ranks are 1..3, not 2..4
    assert [r["rank"] for r in rows] == [1, 2, 3]


def test_mining_k_truncates(spark, mining_frames):
    queries, corpus, positives = mining_frames
    assert mine_hard_negatives(queries, corpus, positives, k=2).count() == 2


def test_mining_partitioning_invariance(spark, mining_frames):
    queries, corpus, positives = mining_frames
    a = mine_hard_negatives(queries, corpus, positives, k=3).collect()
    b = mine_hard_negatives(queries, corpus.repartition(7),
                            positives, k=3).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


# ---------------------------------------------------------------------------
# curriculum: difficulty_buckets + interleave_order
# ---------------------------------------------------------------------------

def test_buckets_quartiles(spark):
    df = spark.createDataFrame([(i, float(i)) for i in range(1, 9)],
                               "id long, score double")
    # boundaries = interpolated quartiles of 1..8: 2.75, 4.5, 6.25
    out = {r["id"]: r["bucket"]
           for r in difficulty_buckets(df, "score", 4).collect()}
    assert out == {1: 0, 2: 0, 3: 1, 4: 1, 5: 2, 6: 2, 7: 3, 8: 3}


def test_buckets_ties_fall_low(spark):
    df = spark.createDataFrame([(i, 5.0) for i in range(4)],
                               "id long, score double")
    # all scores equal all boundaries -> strict > puts everything in 0
    assert {r["bucket"] for r in
            difficulty_buckets(df, "score", 4).collect()} == {0}


def test_buckets_bad_n(spark):
    df = spark.createDataFrame([(1, 1.0)], "id long, score double")
    with pytest.raises(ValueError):
        difficulty_buckets(df, "score", 1)


def test_interleave_positions(spark):
    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(10)],
        "id long, k string")
    out = interleave_order(df, "id", "k")
    # each key gets positions 1..5 exactly once
    got = {(r["k"], r["pos"]) for r in out.collect()}
    assert got == {(k, p) for k in ("a", "b") for p in range(1, 6)}
    # reading in (pos, key) order alternates keys
    ordered = [r["k"] for r in out.orderBy("pos", "k").collect()]
    assert ordered == ["a", "b"] * 5


def test_interleave_append_stable(spark):
    base = spark.createDataFrame(
        [(i, "a") for i in range(6)], "id long, k string")
    more = spark.createDataFrame(
        [(i, "a") for i in range(6, 9)], "id long, k string")
    p0 = {r["id"]: r["pos"] for r in
          interleave_order(base, "id", "k").collect()}
    p1 = {r["id"]: r["pos"] for r in
          interleave_order(base.union(more), "id", "k").collect()}
    # md5 order: original rows keep their RELATIVE order after appends
    orig_sorted0 = sorted(p0, key=lambda i: p0[i])
    orig_sorted1 = sorted((i for i in p1 if i in p0), key=lambda i: p1[i])
    assert orig_sorted0 == orig_sorted1


def test_interleave_determinism_under_repartition(spark):
    df = spark.createDataFrame(
        [(i, ["x", "y", "z"][i % 3]) for i in range(30)],
        "id long, k string")
    a = sorted(map(tuple, interleave_order(df, "id", "k").collect()))
    b = sorted(map(tuple,
                   interleave_order(df.repartition(11), "id", "k").collect()))
    assert a == b


# ---------------------------------------------------------------------------
# vocab_coverage
# ---------------------------------------------------------------------------

def test_vocab_coverage_hand_computed(spark):
    from ai_incident_analyst_spark.operators.text_analysis import (
        vocab_coverage,
    )

    # counts: a=4, b=3, c=2, d=1  (total 10); rank order a,b,c,d
    df = spark.createDataFrame(
        [("a a b c",), ("a b c d",), ("A b",)], "text string")
    got = {r["n_top"]: (r["covered_tokens"], r["total_tokens"],
                        r["coverage"])
           for r in vocab_coverage(df, "text", [1, 2, 4]).collect()}
    assert got == {1: (4, 10, 0.4), 2: (7, 10, 0.7), 4: (10, 10, 1.0)}


def test_vocab_coverage_tie_break_and_oversize_cutoff(spark):
    from ai_incident_analyst_spark.operators.text_analysis import (
        vocab_coverage,
    )

    # x and y tie at 2; term order breaks the tie -> top-1 covers x
    df = spark.createDataFrame([("y x",), ("x y",)], "text string")
    got = {r["n_top"]: r["covered_tokens"]
           for r in vocab_coverage(df, "text", [1, 2, 99]).collect()}
    assert got == {1: 2, 2: 4}          # cutoff 99 > vocab -> no row


def test_vocab_coverage_partitioning_invariance(spark):
    from ai_incident_analyst_spark.operators.text_analysis import (
        vocab_coverage,
    )

    rows = [(f"tok{i % 7} tok{i % 3} filler{i}",) for i in range(60)]
    df = spark.createDataFrame(rows, "text string")
    a = sorted(map(tuple, vocab_coverage(df, "text", [5, 20]).collect()))
    b = sorted(map(tuple, vocab_coverage(
        df.repartition(13), "text", [5, 20]).collect()))
    assert a == b


def test_sample_random_negatives_contract(spark):
    from ai_incident_analyst_spark.operators.mining import (
        sample_random_negatives,
    )

    qs = spark.createDataFrame([(i,) for i in range(3)],
                               "query_id long")
    corpus = spark.createDataFrame([(i,) for i in range(100, 140)],
                                   "vec_id long")
    pos = spark.createDataFrame(
        [(q, v) for q in range(3) for v in range(100, 110)],
        "query_id long, vec_id long")
    out = sample_random_negatives(qs, corpus, pos, k=4)
    rows = out.collect()
    # k per query, ranks 1..k
    per = {}
    for r in rows:
        per.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"]))
    assert set(per) == {0, 1, 2}
    for qid, lst in per.items():
        assert sorted(rk for rk, _ in lst) == [1, 2, 3, 4]
        # never a positive
        assert all(v >= 110 for _, v in lst)
    # deterministic across partitionings
    again = sample_random_negatives(
        qs.repartition(7), corpus.repartition(5), pos, k=4).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    # a different salt re-draws (overwhelmingly likely to differ)
    other = sample_random_negatives(qs, corpus, pos, k=4,
                                    salt="x").collect()
    assert sorted(map(tuple, rows)) != sorted(map(tuple, other))


def test_rake_keyphrases_hand_truth(spark):
    """Classic RAKE arithmetic on a designed two-doc corpus."""
    from ai_incident_analyst_spark.operators.text_analysis import (
        rake_keyphrases,
    )

    rows = [(1, "deep learning of deep networks"),
            (2, "the deep learning")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["phrase"]: r for r in
           rake_keyphrases(df, "doc_id", "text",
                           stopwords=("the", "of"),
                           max_phrase_words=3, top_n=10).collect()}
    # candidate occurrences: 'deep learning' x2, 'deep networks' x1
    # freq: deep=3, learning=2, networks=1
    # degree: deep = 2+2+2 = 6, learning = 2+2 = 4, networks = 2
    # score('deep learning') = 6/3 + 4/2 = 4.0
    # score('deep networks') = 6/3 + 2/1 = 4.0
    assert set(out) == {"deep learning", "deep networks"}
    assert out["deep learning"]["score"] == 4.0
    assert out["deep learning"]["phrase_freq"] == 2
    assert out["deep networks"]["score"] == 4.0
    assert out["deep networks"]["n_words"] == 2


def test_rake_keyphrases_guards_and_phrase_cap(spark):
    import pytest as pt

    from ai_incident_analyst_spark.operators.text_analysis import (
        rake_keyphrases,
    )

    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon")], "doc_id long, text string")
    # no stopword hit -> one 5-word run, over the cap -> dropped
    assert rake_keyphrases(df, "doc_id", "text",
                           stopwords=("zzz",),
                           max_phrase_words=3).count() == 0
    with pt.raises(ValueError):
        rake_keyphrases(df, "doc_id", "text", stopwords=())
    with pt.raises(ValueError):
        rake_keyphrases(df, "doc_id", "text", max_phrase_words=0)
