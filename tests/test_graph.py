"""PageRank: parity vs a pure-numpy power iteration, plus structural
invariants (dangling nodes, weighted multi-edges, determinism)."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from ai_incident_analyst_spark.operators.graph import pagerank

pytestmark = pytest.mark.usefixtures("spark")


def _numpy_pagerank(edges, iters=3, d=0.85, weights=None):
    """Unnormalized Brin/Page convention: r = (1-d) + d * P^T r, r0 = 1."""
    nodes = sorted({u for u, v in edges} | {v for u, v in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    w = np.zeros((n, n))
    for k, (u, v) in enumerate(edges):
        w[idx[u], idx[v]] += 1.0 if weights is None else weights[k]
    out = w.sum(axis=1)
    p = np.divide(w, out[:, None], out=np.zeros_like(w), where=out[:, None] > 0)
    r = np.ones(n)
    for _ in range(iters):
        r = (1 - d) + d * (p.T @ r)
    return {nodes[i]: r[i] for i in range(n)}


def _collect(df):
    return {r["node"]: r["rank"] for r in df.collect()}


def test_pagerank_numpy_parity(spark):
    # ring + chord + a dangling sink (node 5 has no out-edges)
    edges = [(1, 2), (2, 3), (3, 1), (1, 3), (4, 1), (3, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = _collect(pagerank(df, iterations=3))
    want = _numpy_pagerank(edges)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12)


def test_pagerank_weighted_equals_multiedge(spark):
    # an edge with weight 3 must equal three parallel unit edges
    multi = [(1, 2), (1, 2), (1, 2), (1, 3), (2, 3)]
    weighted = [(1, 2, 3.0), (1, 3, 1.0), (2, 3, 1.0)]
    a = _collect(pagerank(
        spark.createDataFrame(multi, "src long, dst long"), iterations=4))
    b = _collect(pagerank(
        spark.createDataFrame(weighted, "src long, dst long, w double"),
        weight="w", iterations=4))
    assert a.keys() == b.keys()
    for k in a:
        assert a[k] == pytest.approx(b[k], rel=1e-12)


def test_pagerank_sink_gets_base_only_mass_flows(spark):
    # 1 -> 2: node 1 has no in-edges so rank(1) = 0.15 after any round;
    # node 2 receives all of 1's mass each round
    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    got = _collect(pagerank(df, iterations=2))
    assert got[1] == pytest.approx(0.15)
    # round 1: r2 = 0.15 + 0.85*1.0 = 1.0; round 2: 0.15 + 0.85*0.15
    assert got[2] == pytest.approx(0.15 + 0.85 * 0.15, rel=1e-12)


def test_pagerank_deterministic_across_partitionings(spark):
    rng = np.random.default_rng(7)
    edges = [(int(u), int(v)) for u, v in rng.integers(0, 40, size=(300, 2))
             if u != v]
    df1 = spark.createDataFrame(edges, "src long, dst long").repartition(1)
    df2 = spark.createDataFrame(edges, "src long, dst long").repartition(13)
    a, b = _collect(pagerank(df1)), _collect(pagerank(df2))
    assert a.keys() == b.keys()
    for k in a:
        assert a[k] == pytest.approx(b[k], rel=1e-9)


# ---------------------------------------------------------------------------
# HITS + label propagation (round 8)
# ---------------------------------------------------------------------------

def _numpy_hits(edges, iters=2):
    nodes = sorted({u for u, v in edges} | {v for u, v in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    a_mat = np.zeros((n, n))
    for u, v in set(edges):
        a_mat[idx[u], idx[v]] = 1.0
    h = np.ones(n)
    a = np.zeros(n)
    for _ in range(iters):
        a = a_mat.T @ h
        a = a / a.max()
        h = a_mat @ a
        h = h / h.max()
    return {nodes[i]: (round(h[i], 6), round(a[i], 6)) for i in range(n)}


def test_hits_numpy_parity(spark):
    from ai_incident_analyst_spark.operators.graph import hits

    edges = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (4, 2), (2, 3)]
    got = {r["node"]: (r["hub"], r["authority"])
           for r in hits(spark.createDataFrame(
               edges, "src long, dst long"), iterations=2).collect()}
    want = _numpy_hits(edges)
    assert set(got) == set(want)
    for n in want:
        assert got[n] == pytest.approx(want[n], abs=2e-6), n
    # node 4 points at everything, is pointed at by nothing: pure hub
    assert got[4][1] == 0.0 and got[4][0] > 0
    # node 3 is the most-pointed-at: top authority, normalized to 1
    assert got[3][1] == 1.0


def test_hits_deterministic_across_partitionings(spark):
    from ai_incident_analyst_spark.operators.graph import hits

    edges = [(i, (i * 7 + 3) % 23) for i in range(60)] + \
            [(i, (i * 5 + 1) % 23) for i in range(40)]
    df = spark.createDataFrame(edges, "src long, dst long")
    a = sorted(map(tuple, hits(df.repartition(1)).collect()))
    b = sorted(map(tuple, hits(df.repartition(13)).collect()))
    assert a == b


def test_label_propagation_two_cliques_bridge(spark):
    from ai_incident_analyst_spark.operators.graph import label_propagation

    # two 4-cliques joined by one bridge edge: LPA must give each clique
    # one label and not merge them across the bridge (CC would)
    c1 = [(a, b) for a in range(4) for b in range(4) if a < b]
    c2 = [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
    edges = c1 + c2 + [(3, 10)]
    got = {r["node"]: r["label"]
           for r in label_propagation(
               spark.createDataFrame(edges, "src long, dst long"),
               iterations=3).collect()}
    assert len({got[n] for n in range(4)}) == 1
    assert len({got[n] for n in range(10, 14)}) == 1
    assert got[0] != got[10]


def test_label_propagation_python_replay(spark):
    from ai_incident_analyst_spark.operators.graph import label_propagation

    edges = [(i, (i * 3 + 1) % 11) for i in range(30)]

    def replay(es, iters=3):
        und = set()
        for u, v in es:
            if u != v:
                und.add((u, v))
                und.add((v, u))
        nodes = {u for u, _ in und}
        lab = {n: n for n in nodes}
        for _ in range(iters):
            new = {}
            for n in nodes:
                cnt = {}
                for u, v in und:
                    if u == n:
                        cnt[lab[v]] = cnt.get(lab[v], 0) + 1
                best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
                new[n] = best[0]
            lab = new
        return lab

    got = {r["node"]: r["label"]
           for r in label_propagation(
               spark.createDataFrame(edges, "src long, dst long"),
               iterations=3).collect()}
    assert got == replay(edges)


def test_hits_and_lpa_reject_nonpositive_iterations(spark):
    """iterations=0 must fail fast with a clear ValueError, not a
    confusing join-on-None crash deep in the plan (advice r8)."""
    import pytest

    from ai_incident_analyst_spark.operators.graph import (
        hits,
        label_propagation,
    )

    e = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="iterations"):
        hits(e, iterations=0)
    with pytest.raises(ValueError, match="iterations"):
        label_propagation(e, iterations=0)


def test_k_core_matches_networkx_free_reference(spark):
    """Peeling reference in pure Python on a designed graph: a 4-clique
    (3-core), a 4-cycle hanging off it (2-core), and a chain tendril
    (peels entirely at k=2)."""
    from ai_incident_analyst_spark.operators.graph import k_core

    edges = [
        # 4-clique: 1,2,3,4
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
        # 4-cycle 5-6-7-8 attached to the clique at 4-5
        (4, 5), (5, 6), (6, 7), (7, 8), (8, 5),
        # chain tendril 9-10-11
        (8, 9), (9, 10), (10, 11),
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    core2 = {r["node"]: r["degree"]
             for r in k_core(df, k=2).collect()}
    # chain 9-10-11 peels; clique + cycle survive
    assert set(core2) == {1, 2, 3, 4, 5, 6, 7, 8}
    assert core2[1] == 3 and core2[6] == 2
    core3 = {r["node"]: r["degree"]
             for r in k_core(df, k=3).collect()}
    assert set(core3) == {1, 2, 3, 4}          # only the clique
    assert all(d == 3 for d in core3.values())
    assert k_core(df, k=4).count() == 0        # no 4-core
    import pytest
    with pytest.raises(ValueError):
        k_core(df, k=0)


def test_k_core_neardup_converges_within_twin_unroll(spark):
    """The oracle unrolls 8 peeling rounds; assert the real graph's
    fixed point arrives within that budget at the gate SF (so the
    fixed-round twin and the run-to-convergence operator agree)."""
    from ai_incident_analyst_spark.operators.dedup import (
        ngram_jaccard_pairs_lsh,
    )
    from ai_incident_analyst_spark.operators.graph import k_core
    from ai_incident_analyst_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    pairs = ngram_jaccard_pairs_lsh(docs, "doc_id", "text", n=3,
                                    threshold=0.12, num_perm=64,
                                    bands=64).localCheckpoint()
    # max_iter=8 == the twin's unroll: must converge, not raise
    out = k_core(pairs, "id_a", "id_b", k=2, max_iter=8)
    assert out.count() >= 0


def test_k_truss_reference_graph(spark):
    """A 4-clique with a pendant triangle and a chain: the 3-truss
    keeps both triangle structures, the 4-truss only the clique."""
    from ai_incident_analyst_spark.operators.graph import k_truss

    edges = [
        # 4-clique 1-4 (each edge in 2 triangles)
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
        # pendant triangle 4-5-6 (each edge in exactly 1 triangle)
        (4, 5), (5, 6), (4, 6),
        # chain 6-7-8: no triangles, peels at any k
        (6, 7), (7, 8),
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    t3 = {(r["u"], r["v"]): r["support"]
          for r in k_truss(df, k=3).collect()}
    assert set(t3) == {(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
                       (4, 5), (5, 6), (4, 6)}
    assert t3[(1, 2)] == 2 and t3[(4, 5)] == 1
    t4 = {(r["u"], r["v"]): r["support"]
          for r in k_truss(df, k=4).collect()}
    assert set(t4) == {(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)}
    assert all(s == 2 for s in t4.values())
    assert k_truss(df, k=5).count() == 0
    import pytest
    with pytest.raises(ValueError):
        k_truss(df, k=2)


def test_k_truss_cascade_peel(spark):
    """Dropping one edge can strip triangles from others — the
    iterative cascade: two triangles sharing an edge plus a weak
    triangle hanging off, where removing the weak edges re-evaluates
    support (4-truss of a 'bowtie + tail' collapses entirely)."""
    from ai_incident_analyst_spark.operators.graph import k_truss

    # bowtie: triangles (1,2,3) and (3,4,5) share node 3 only
    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (3, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    t3 = k_truss(df, k=3)
    assert t3.count() == 6          # both triangles survive the 3-truss
    assert k_truss(df, k=4).count() == 0   # no edge has 2 triangles
