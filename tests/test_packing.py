"""Token-budget sharding (operators/packing.py:shard_by_token_budget):
hand-computed greedy reference, size bounds, append-stability."""

def test_shard_by_token_budget_invariants(spark):
    """Docs go whole into shards; a shard's token mass stays within one
    max-doc of the budget; assignment is append-stable."""
    from pyspark.sql import functions as F

    from ai_incident_analyst_spark.operators.packing import (
        shard_by_token_budget,
    )
    rows = [(i, (i * 37) % 90 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    out = shard_by_token_budget(df, "doc_id", "n_tok", budget=500)
    got = {r.doc_id: r.shard_id for r in out.collect()}
    # reference: sequential greedy by start offset
    cum, expect = 0, {}
    for i, t in rows:
        expect[i] = cum // 500
        cum += t
    assert got == expect
    # shard sizes within budget + max_doc
    sizes = {r.shard_id: r.s for r in
             out.groupBy("shard_id").agg(F.sum("n_tok").alias("s")).collect()}
    assert all(s < 500 + 90 for s in sizes.values())
    # append-stability: first half unchanged when second half is appended
    half = spark.createDataFrame(rows[:100], "doc_id long, n_tok long")
    got_half = {r.doc_id: r.shard_id
                for r in shard_by_token_budget(half, "doc_id", "n_tok",
                                               budget=500).collect()}
    assert got_half == {i: expect[i] for i in range(100)}
