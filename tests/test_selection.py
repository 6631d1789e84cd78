"""MMR diverse subset selection (operators/selection.py)."""

import hashlib

import numpy as np
from pyspark.sql import functions as F

from ai_incident_analyst_spark.operators.selection import mmr_select


def _mmr_numpy(ids, vecs, k, lam=0.5, dp=6):
    """Independent greedy restatement with the same discretization."""
    vecs = np.asarray(vecs, dtype=np.float64)
    norm = np.linalg.norm(vecs, axis=1)

    def cos(i, j):
        return round(float(vecs[i] @ vecs[j] / (norm[i] * norm[j])), dp)

    order = sorted(range(len(ids)),
                   key=lambda i: (hashlib.md5(str(ids[i]).encode())
                                  .hexdigest(), str(ids[i])))
    a = order[0]
    rel = [cos(i, a) for i in range(len(ids))]
    picked = []
    for rank in range(1, k + 1):
        best = None
        for i in range(len(ids)):
            if i in [p[0] for p in picked]:
                continue
            if not picked:
                sc = rel[i]
            else:
                ms = max(cos(i, p[0]) for p in picked)
                sc = round(lam * rel[i] - (1 - lam) * ms, dp)
            key = (-sc, ids[i])
            if best is None or key < best[0]:
                best = (key, i, sc)
        picked.append((best[1], rank, best[2]))
    return [(rank, ids[i], rel[i], sc) for i, rank, sc in picked]


def _toy(spark):
    # two tight clusters + one outlier; ids chosen so md5 ordering is
    # exercised rather than insertion order
    rows = [
        (11, [1.0, 0.0, 0.0]), (12, [0.99, 0.1, 0.0]),
        (13, [0.98, 0.15, 0.05]),
        (21, [0.0, 1.0, 0.0]), (22, [0.05, 0.99, 0.1]),
        (31, [0.0, 0.0, 1.0]),
    ]
    return rows, spark.createDataFrame(
        rows, "vec_id long, embedding array<double>")


def test_mmr_matches_numpy(spark):
    rows, df = _toy(spark)
    got = [(r.rank, r.vec_id, r.rel, r.mmr)
           for r in mmr_select(df, "vec_id", "embedding", k=4).collect()]
    want = _mmr_numpy([r[0] for r in rows], [r[1] for r in rows], k=4)
    assert got == want


def test_mmr_spreads_across_clusters(spark):
    # external relevance (the production shape): equal scores force the
    # diversity term to decide — one pick per direction, never three of
    # a kind (pure top-k-by-rel would take all of cluster 1)
    rows, df = _toy(spark)
    scored = df.withColumn("q", F.lit(0.9))
    top3 = {r.vec_id
            for r in mmr_select(scored, "vec_id", "embedding", k=3,
                                rel_col="q").collect()}
    assert len({i // 10 for i in top3}) == 3


def test_mmr_partitioning_invariant(spark):
    _, df = _toy(spark)
    a = [tuple(r) for r in
         mmr_select(df, "vec_id", "embedding", k=4).collect()]
    b = [tuple(r) for r in
         mmr_select(df.repartition(5), "vec_id", "embedding",
                    k=4).collect()]
    assert a == b


def test_mmr_k_exceeding_rows_truncates(spark):
    _, df = _toy(spark)
    small = df.filter(F.col("vec_id").isin(11, 21))
    rows = mmr_select(small, "vec_id", "embedding", k=5).collect()
    assert [r.rank for r in rows] == [1, 2]


def test_mmr_registry_query(spark, sf_dir):
    from ai_incident_analyst_spark.queries import REGISTRY
    rows = REGISTRY["mmr_select_diverse"].fn(spark, sf_dir).collect()
    assert [r.rank for r in rows] == [1, 2, 3, 4, 5]
    assert len({r.vec_id for r in rows}) == 5
    # rank 1 is the pure-relevance argmax: mmr == rel there
    assert rows[0].mmr == rows[0].rel


# ---------------------------------------------------------------------------
# greedy k-center coreset (round 8)
# ---------------------------------------------------------------------------

def test_k_center_matches_python_replay(spark):
    from ai_incident_analyst_spark.operators.selection import (
        k_center_select,
    )

    import hashlib

    import numpy as np

    rng = np.random.default_rng(11)
    vecs = {i: rng.normal(0, 1, 8).round(3).tolist() for i in range(40)}
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()],
        "vec_id long, embedding array<double>")
    got = [(r["rank"], r["vec_id"], r["dist"])
           for r in k_center_select(df, "vec_id", "embedding", k=5)
           .orderBy("rank").collect()]

    def replay(k=5):
        seed = min(vecs, key=lambda i: (hashlib.md5(
            str(i).encode()).hexdigest(), str(i)))
        picked = [(1, seed, None)]
        while len(picked) < k:
            best = None
            for i in sorted(vecs):
                if i in {p[1] for p in picked}:
                    continue
                d = min(round(sum((a - b) * (a - b) for a, b in
                                  zip(vecs[i], vecs[p[1]])), 6)
                        for p in picked)
                if best is None or d > best[1] or (d == best[1]
                                                   and i < best[0]):
                    if best is None or d > best[1]:
                        best = (i, d)
            picked.append((len(picked) + 1, best[0], best[1]))
        return picked

    assert got == replay()
    # covering radius is monotone non-increasing after rank 2
    ds = [d for _, _, d in got[1:]]
    assert all(a >= b for a, b in zip(ds, ds[1:]))


def test_k_center_spreads_clusters(spark):
    from ai_incident_analyst_spark.operators.selection import (
        k_center_select,
    )

    # three tight blobs far apart: the first 3 picks must hit 3 blobs
    rows = []
    for b, center in enumerate([0.0, 100.0, -100.0]):
        for j in range(10):
            rows.append((b * 10 + j, [center + j * 0.01, center]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    picks = [r["vec_id"] for r in
             k_center_select(df, "vec_id", "embedding", k=3).collect()]
    assert {p // 10 for p in picks} == {0, 1, 2}
