"""chunk_documents (operators/rag.py) + int8 quantization
(functions/vectors.py)."""

from pyspark.sql import functions as F

from ai_incident_analyst_spark.functions.vectors import int_l2_sq, quantize_int8
from ai_incident_analyst_spark.operators.rag import chunk_documents


def _chunks(spark, text, size, stride):
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    rows = chunk_documents(df, size=size, stride=stride) \
        .orderBy("chunk_idx").collect()
    return [r["chunk_text"] for r in rows]


def test_chunk_overlap_and_coverage(spark):
    # 10 chars, size 4, stride 2 -> starts 1,3,5,7 (7+4-1 >= 10, minimal)
    assert _chunks(spark, "abcdefghij", 4, 2) == \
        ["abcd", "cdef", "efgh", "ghij"]


def test_chunk_no_redundant_tail(spark):
    # doc shorter than one window -> exactly one chunk
    assert _chunks(spark, "abc", 80, 60) == ["abc"]


def test_chunk_nonoverlapping_tail(spark):
    # size == stride: plain tiling, short tail kept for coverage
    assert _chunks(spark, "abcdefg", 3, 3) == ["abc", "def", "g"]


def test_chunk_empty_and_null_yield_nothing(spark):
    df = spark.createDataFrame([(1, ""), (2, None), (3, "xy")],
                               ["doc_id", "text"])
    rows = chunk_documents(df, size=4, stride=2).collect()
    assert [(r["doc_id"], r["chunk_idx"], r["chunk_text"]) for r in rows] \
        == [(3, 0, "xy")]


def test_quantize_int8_clips_and_rounds(spark):
    df = spark.createDataFrame([([0.0, 1.0, -1.0, 2.5, -3.0, 0.5, 0.004],)],
                               ["v"])
    [row] = df.select(quantize_int8("v").alias("q")).collect()
    # 0.5*127 = 63.5 rounds half-away-from-zero to 64; 0.004*127 = 0.508 -> 1
    assert row["q"] == [0, 127, -127, 127, -127, 64, 1]


def test_int_l2_sq_exact(spark):
    df = spark.createDataFrame([([1, -2, 3], [4, 0, 3])], ["a", "b"])
    [row] = df.select(int_l2_sq("a", "b").alias("d")).collect()
    assert row["d"] == 9 + 4 + 0


def test_quantized_ranking_tracks_exact(spark, sf_dir):
    """Quantized top-1 neighbor == exact top-1 on the testdata embeddings
    (codes at 127 levels keep enough resolution for well-separated
    vectors)."""
    from ai_incident_analyst_spark.operators.knn import knn_join
    from ai_incident_analyst_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"))
    c = emb.filter(F.col("vec_id") >= 3)
    exact = {r["query_id"]: r["vec_id"]
             for r in knn_join(q, c, k=1, metric="l2_sq").collect()}

    qq = q.select("query_id", quantize_int8("query_vec").alias("qc"))
    cc = c.select("vec_id", quantize_int8("embedding").alias("cc"))
    scored = cc.join(F.broadcast(qq)).select(
        "query_id", "vec_id", int_l2_sq("qc", "cc").alias("d"))
    from pyspark.sql import Window
    w = Window.partitionBy("query_id").orderBy(F.col("d").asc(),
                                               F.col("vec_id").asc())
    quant = {r["query_id"]: r["vec_id"] for r in
             scored.withColumn("rn", F.row_number().over(w))
             .filter(F.col("rn") == 1).collect()}
    assert quant == exact
