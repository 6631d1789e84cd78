"""Skew-salting correctness + bucketed co-located join plan proof."""

from pyspark.sql import functions as F

from ai_incident_analyst_spark.operators.skew import salted_agg, salted_join


def test_salted_agg_matches_plain_agg(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet") \
        .select("event_type", F.col("event_id").cast("double").alias("v"))
    plain = {r.event_type: (r.s, r.n, r.mx)
             for r in ev.groupBy("event_type")
             .agg(F.sum("v").alias("s"), F.count("v").alias("n"),
                  F.max("v").alias("mx")).collect()}
    salted = {r.event_type: (r.s, r.n, r.mx)
              for r in salted_agg(ev, "event_type",
                                  {"s": ("v", "sum"), "n": ("v", "count"),
                                   "mx": ("v", "max")},
                                  salt_buckets=8).collect()}
    assert plain.keys() == salted.keys()
    for k in plain:
        assert plain[k][1] == salted[k][1] and plain[k][2] == salted[k][2]
        assert abs(plain[k][0] - salted[k][0]) < 1e-6 * max(1.0, abs(plain[k][0]))


def test_salted_join_matches_plain_join(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet") \
        .select("o_orderkey", "o_custkey")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet") \
        .select(F.col("c_custkey").alias("o_custkey"), "c_mktsegment")
    plain = orders.join(cust, "o_custkey").count()
    salted = salted_join(orders, cust, "o_custkey", salt_buckets=4).count()
    assert plain == salted


def test_bucketed_tables_join_without_shuffle(spark, tmp_path):
    """Pre-bucketing both sides on the join key removes the exchange —
    the co-located join strategy for repeated fact-fact joins at scale."""
    n_buckets = 4
    a = spark.range(0, 10000).withColumn("v", F.col("id") * 2)
    b = spark.range(0, 10000).withColumn("w", F.col("id") * 3)
    spark.sql("DROP TABLE IF EXISTS bkt_a")
    spark.sql("DROP TABLE IF EXISTS bkt_b")
    a.write.bucketBy(n_buckets, "id").sortBy("id").saveAsTable("bkt_a")
    b.write.bucketBy(n_buckets, "id").sortBy("id").saveAsTable("bkt_b")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # disable broadcast so the join strategy is the one bucketing helps
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("bkt_a").join(spark.table("bkt_b"), "id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert joined.count() == 10000
        assert "Exchange hashpartitioning" not in plan, plan
        assert "SortMergeJoin" in plan
        # bucket metadata reaches the scan
        assert "SelectedBucketsCount" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")


def test_approx_aggregates_within_tolerance(spark, sf_dir):
    from ai_incident_analyst_spark.queries import REGISTRY
    approx = {r.event_type: (r.approx_users, r.approx_p95)
              for r in REGISTRY["approx_distinct_users"].fn(spark, sf_dir).collect()}
    exact = {r.event_type: (r.nu, r.p95)
             for r in spark.read.parquet(f"{sf_dir}/events.parquet")
             .groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("nu"),
                  F.expr("percentile(value, 0.95)").alias("p95")).collect()}
    assert approx.keys() == exact.keys()
    for k in exact:
        assert abs(approx[k][0] - exact[k][0]) <= max(2, 0.05 * exact[k][0])
        # tail quantiles on small SFs carry larger relative sketch error
        assert abs(approx[k][1] - exact[k][1]) <= max(0.5, 0.06 * abs(exact[k][1]))


def test_salted_join_rejects_unsupported_how(spark):
    """ADVICE r1: the explode-N-ways construction is only correct for
    inner/left joins from the big side — other modes must be rejected."""
    import pytest
    from ai_incident_analyst_spark.operators.skew import salted_join
    big = spark.createDataFrame([(1, "x")], "k long, v string")
    small = spark.createDataFrame([(1, "y")], "k long, w string")
    for how in ("right", "full", "left_semi", "left_anti"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(big, small, "k", how=how)
    assert salted_join(big, small, "k", how="left").count() == 1


def test_key_skew_report_hand_computed(spark):
    from ai_incident_analyst_spark.operators.skew import key_skew_report

    # key a: 6 rows, b: 2, c: 2  -> n=10, keys=3, max=6, median=2
    rows = [("a",)] * 6 + [("b",)] * 2 + [("c",)] * 2
    df = spark.createDataFrame(rows, "k string")
    r = key_skew_report(df, "k", top_n=2).first()
    assert (r["n_rows"], r["n_keys"], r["max_key_rows"]) == (10, 3, 6)
    assert r["median_key_rows"] == 2.0
    assert r["max_key_frac"] == 0.6
    assert r["top10_frac"] == 0.8          # top-2 keys: a(6) + b(2)
    assert r["skew_ratio"] == 1.8          # 6 / (10/3)


def test_key_skew_report_uniform(spark):
    from ai_incident_analyst_spark.operators.skew import key_skew_report

    df = spark.createDataFrame([(f"k{i}",) for i in range(8)], "k string")
    r = key_skew_report(df, "k").first()
    assert r["skew_ratio"] == 1.0 and r["max_key_rows"] == 1


def test_join_size_forecast_matches_actual_join(spark):
    from ai_incident_analyst_spark.operators.skew import join_size_forecast
    from pyspark.sql import functions as F

    left = spark.createDataFrame(
        [(k,) for k in [1] * 5 + [2] * 3 + [3] * 1 + [9] * 4],
        "k long")
    right = spark.createDataFrame(
        [(k,) for k in [1] * 2 + [2] * 4 + [3] * 1 + [7] * 6],
        "k long")
    r = join_size_forecast(left, right, "k", "k", top_n=2).collect()[0]
    actual = left.join(right, "k").count()
    assert r["join_rows"] == actual == 5 * 2 + 3 * 4 + 1
    assert r["n_left"] == 13 and r["n_right"] == 13
    assert r["n_matching_keys"] == 3
    # per-key outputs: k1=10, k2=12, k3=1 -> top-2 by out desc: 2,1
    assert r["top_keys"] == "2,1"
    assert r["amplification_1e6"] == (23 * 1_000_000) // 13
