"""Deterministic sampling: reproducibility, append-stability, accuracy."""

from pyspark.sql import functions as F

from ai_incident_analyst_spark.operators.sampling import (
    hash_sample,
    stratified_sample,
    train_test_split,
    weighted_interleave,
)


def test_hash_sample_deterministic_and_accurate(spark):
    df = spark.range(20_000).withColumnRenamed("id", "k")
    a = {r.k for r in hash_sample(df, "k", 0.3).collect()}
    b = {r.k for r in hash_sample(df, "k", 0.3).collect()}
    assert a == b  # bit-identical across runs
    # binomial(20k, 0.3): 3-sigma ≈ 195
    assert abs(len(a) - 6000) < 400


def test_hash_sample_append_stable(spark):
    """A row's membership never changes when the table grows."""
    small = spark.range(1_000).withColumnRenamed("id", "k")
    big = spark.range(5_000).withColumnRenamed("id", "k")
    s_small = {r.k for r in hash_sample(small, "k", 0.5).collect()}
    s_big = {r.k for r in hash_sample(big, "k", 0.5).collect()}
    assert s_small == {k for k in s_big if k < 1_000}


def test_hash_sample_salt_decorrelates(spark):
    df = spark.range(10_000).withColumnRenamed("id", "k")
    a = {r.k for r in hash_sample(df, "k", 0.5, salt="a").collect()}
    b = {r.k for r in hash_sample(df, "k", 0.5, salt="b").collect()}
    overlap = len(a & b) / 10_000
    assert 0.2 < overlap < 0.3  # independent draws: E[overlap] = 0.25


def test_stratified_rates(spark):
    df = spark.range(30_000).select(
        F.col("id").alias("k"), (F.col("id") % 3).cast("string").alias("g"))
    out = stratified_sample(df, "k", "g", {"0": 0.1, "1": 0.9}, default=0.0)
    counts = {r.g: r.n for r in
              out.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert abs(counts["0"] - 1000) < 200
    assert abs(counts["1"] - 9000) < 300
    assert "2" not in counts  # default 0.0 drops the stratum


def test_train_test_split_partition(spark):
    df = spark.range(10_000).withColumnRenamed("id", "k")
    out = train_test_split(df, "k", 0.2)
    counts = {r.split: r.n for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert counts["test"] + counts["train"] == 10_000
    assert abs(counts["test"] - 2000) < 250
    # independent of the sampling decision for the same key (different salt)
    sampled = {r.k for r in hash_sample(df, "k", 0.2).collect()}
    test_keys = {r.k for r in out.filter("split = 'test'").collect()}
    overlap = len(sampled & test_keys) / 10_000
    assert 0.02 < overlap < 0.06  # ~0.04 if independent, 0.2 if correlated


def test_weighted_interleave_no_shuffle(spark):
    df = spark.range(1_000).withColumnRenamed("id", "k")
    mixed = weighted_interleave([(df, 1.0), (df, 0.5)], "k")
    n = mixed.count()
    assert abs(n - 1500) < 100
    plan = mixed._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # mixture is scans + union only


def test_leakage_safe_split_keeps_clusters_together(spark):
    """Every near-dup cluster must land whole on one side; singletons
    split independently; appends never migrate existing rows."""
    from pyspark.sql import functions as F

    from ai_incident_analyst_spark.operators.dedup import (
        connected_components,
    )
    from ai_incident_analyst_spark.operators.sampling import (
        leakage_safe_split,
    )
    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in range(100)], "doc_id long, payload string")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 40, 2)]        # 20 two-doc clusters
        + [(50, 51), (51, 52), (52, 53)],            # one four-doc chain
        "id_a long, id_b long")
    clusters = connected_components(edges)
    out = leakage_safe_split(docs, "doc_id", clusters, test_fraction=0.3)
    side = {r.doc_id: r.split for r in out.collect()}
    for a in range(0, 40, 2):
        assert side[a] == side[a + 1], a
    assert len({side[i] for i in (50, 51, 52, 53)}) == 1
    assert {"train", "test"} == set(side.values())  # both sides populated
    # append-stability: a prefix subset gets identical assignments
    sub = leakage_safe_split(docs.filter("doc_id < 60"), "doc_id",
                             clusters, test_fraction=0.3)
    assert {r.doc_id: r.split for r in sub.collect()} == \
        {i: side[i] for i in range(60)}


def test_score_weighted_sample_properties(spark):
    """Acceptance rate tracks the score; score 0 keeps nothing, score 1
    with rate 1 keeps everything; membership is append-stable."""
    from pyspark.sql import functions as F

    from ai_incident_analyst_spark.operators.sampling import (
        score_weighted_sample,
    )
    n = 4000
    df = spark.createDataFrame(
        [(i, 0.9 if i % 2 else 0.1) for i in range(n)],
        "id long, q double")
    kept = score_weighted_sample(df, "id", "q").collect()
    hi = sum(1 for r in kept if r.q == 0.9) / (n / 2)
    lo = sum(1 for r in kept if r.q == 0.1) / (n / 2)
    assert abs(hi - 0.9) < 0.05 and abs(lo - 0.1) < 0.05
    # extremes
    all_zero = df.withColumn("q", F.lit(0.0))
    assert score_weighted_sample(all_zero, "id", "q").count() == 0
    all_one = df.withColumn("q", F.lit(1.0))
    assert score_weighted_sample(all_one, "id", "q").count() == n
    # append-stability: same ids survive from a prefix
    a = {r.id for r in kept}
    b = {r.id for r in score_weighted_sample(
        df.filter("id < 2000"), "id", "q").collect()}
    assert b == {i for i in a if i < 2000}


# --- weighted sampling without replacement (A-ES) --------------------------

def test_weighted_sample_proportional_and_stable(spark):
    from ai_incident_analyst_spark.operators.sampling import (
        weighted_sample_no_replacement,
    )
    rows = [(i, 100.0 if i < 50 else 1.0) for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, w double")
    got = weighted_sample_no_replacement(df, "id", "w", k=100)
    ids = {r["id"] for r in got.collect()}
    assert len(ids) == 100
    # heavy rows (weight 100x) should be drawn near-completely
    heavy = sum(1 for i in ids if i < 50)
    assert heavy >= 40
    # deterministic + partitioning-independent
    again = {r["id"] for r in weighted_sample_no_replacement(
        df.repartition(13), "id", "w", k=100).collect()}
    assert ids == again


def test_weighted_sample_excludes_bad_weights(spark):
    from ai_incident_analyst_spark.operators.sampling import (
        weighted_sample_no_replacement,
    )
    rows = [(1, 0.0), (2, -3.0), (3, None), (4, float("nan")), (5, 2.0)]
    df = spark.createDataFrame(rows, "id long, w double")
    got = {r["id"] for r in
           weighted_sample_no_replacement(df, "id", "w", k=10).collect()}
    assert got == {5}


def test_weighted_sample_per_stratum_k(spark):
    from ai_incident_analyst_spark.operators.sampling import (
        weighted_sample_no_replacement,
    )
    rows = [(i, "a" if i % 2 else "b", 1.0 + i % 7) for i in range(400)]
    df = spark.createDataFrame(rows, "id long, g string, w double")
    got = weighted_sample_no_replacement(df, "id", "w", k=30,
                                         strata_col="g")
    per = {r["g"]: r["n"] for r in
           got.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert per == {"a": 30, "b": 30}


def test_domain_mixture_rates_and_absent_domains(spark):
    from ai_incident_analyst_spark.operators.sampling import (
        domain_mixture_sample,
    )
    rows = ([(i, "en", 100) for i in range(400)]
            + [(i + 1000, "de", 100) for i in range(100)]
            + [(i + 2000, "xx", 100) for i in range(50)])
    df = spark.createDataFrame(rows, "id long, dom string, sz long")
    # budget 20000: en rate = 0.5*20000/40000 = 0.25; de = 0.5*20000/10000
    # clamps at 1.0 (under-represented domain keeps everything)
    kept = domain_mixture_sample(df, "id", "dom", "sz",
                                 {"en": 0.5, "de": 0.5}, budget=20000.0)
    per = {r["dom"]: r["n"] for r in
           kept.groupBy("dom").agg(F.count("*").alias("n")).collect()}
    assert "xx" not in per            # absent from target: dropped
    assert per["de"] == 100           # rate clamped at 1
    assert 60 <= per["en"] <= 140     # ~0.25 * 400, hash-Bernoulli


def test_domain_mixture_deterministic_and_append_stable(spark):
    from ai_incident_analyst_spark.operators.sampling import (
        domain_mixture_sample,
    )
    rows = [(i, "en", 10) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, dom string, sz long")
    kw = dict(target_weights={"en": 1.0}, budget=1500.0)
    a = {r["id"] for r in domain_mixture_sample(
        df.repartition(1), "id", "dom", "sz", **kw).collect()}
    b = {r["id"] for r in domain_mixture_sample(
        df.repartition(7), "id", "dom", "sz", **kw).collect()}
    assert a == b


def test_temperature_sample_boosts_rare_domains(spark):
    from ai_incident_analyst_spark.operators.sampling import (
        temperature_sample)
    rows = [(i, "big") for i in range(900)] + \
           [(900 + i, "small") for i in range(100)]
    df = spark.createDataFrame(rows, "id long, dom string")
    kept = temperature_sample(df, "id", "dom", alpha=0.5).collect()
    from collections import Counter
    got = Counter(r["dom"] for r in kept)
    # alpha=0.5 targets q ∝ sqrt(n): q_small = 10/40 = 0.25 of the
    # budget (1000 rows) = 250 > 100 available → rate clamps to 1.0,
    # small keeps everything; big downsamples to ~q_big*N = 750
    assert got["small"] == 100
    assert 600 < got["big"] < 900
    # alpha=1 keeps the natural mixture: every rate is 1.0
    all_kept = temperature_sample(df, "id", "dom", alpha=1.0).count()
    assert all_kept == 1000


def test_temperature_sample_deterministic_and_append_stable(spark):
    from ai_incident_analyst_spark.operators.sampling import (
        temperature_sample)
    rows = [(i, "a" if i % 4 else "b") for i in range(400)]
    df = spark.createDataFrame(rows, "id long, dom string")
    k1 = {r["id"] for r in temperature_sample(df, "id", "dom",
                                              alpha=0.5).collect()}
    k2 = {r["id"] for r in temperature_sample(
        df.repartition(7), "id", "dom", alpha=0.5).collect()}
    assert k1 == k2
