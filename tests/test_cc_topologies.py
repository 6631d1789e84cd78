"""connected_components vs a driver union-find oracle across the graph
topologies that distinguish the algorithms (r12):

- hash-min LP alone is O(diameter) rounds — the density-held DBSCAN core
  graph (long-thin, measured diameter ~358 at sf10) exhausted the round
  budget; pointer jumping measured ~1.5 hops/round of real progress.
- pure star contraction handles chains but its per-round state is
  EDGE-sized — 6-10x slower than LP on the dense clique graphs dedup
  produces.
- the shipped hybrid (<=10 LP rounds, then star contraction on the
  label-quotient graph, maps composed) must be exact on BOTH classes.

`small_graph_edges=1` forces the distributed path (the driver union-find
fast path is what the oracle here replays, so testing against it with
the fast path active would be circular).
"""

import random

import pytest

from ai_incident_analyst_spark.operators.dedup import connected_components


def _union_find(pairs):
    parent = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in pairs:
        parent.setdefault(u, u)
        parent.setdefault(v, v)
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {n: find(n) for n in parent}


def _cases():
    rng = random.Random(3)
    perm = list(range(900))
    rng.shuffle(perm)
    return {
        # long chain: needs the star phase (LP covers 10 hops)
        "path": [(i, i + 1) for i in range(599)],
        # chain whose ids are NOT aligned with the geometry — the case
        # where pointer jumping's greedy id-descent stalls
        "shuffled_path": [(perm[i], perm[i + 1]) for i in range(899)],
        # dup-heavy random graph (multiset edges; converges in LP phase)
        "random_dupes": [(rng.randrange(400), rng.randrange(400))
                         for _ in range(400)] * 2,
        # bucket cliques — the dedup workload shape (LP phase only)
        "cliques": [(b * 10 + i, b * 10 + j)
                    for b in range(20) for i in range(5)
                    for j in range(i + 1, 5)],
        # self-loop-only nodes keep the (node, node) contract
        "selfloops": [(1, 1), (2, 3), (3, 4), (9, 9)],
        # two components of different diameters
        "two_chains": [(i, i + 1) for i in range(150)]
                      + [(10_000 + i, 10_001 + i) for i in range(250)],
    }


@pytest.mark.parametrize("name", sorted(_cases()))
def test_matches_union_find(spark, name):
    pairs = _cases()[name]
    edges = spark.createDataFrame(
        [(int(u), int(v)) for u, v in pairs], "id_a long, id_b long")
    got = {r["node"]: r["cluster_id"]
           for r in connected_components(edges,
                                         small_graph_edges=1).collect()}
    assert got == _union_find(pairs)


def test_driver_fast_path_identical(spark):
    # same graph through both paths → identical labels
    pairs = _cases()["shuffled_path"]
    edges = spark.createDataFrame(
        [(int(u), int(v)) for u, v in pairs], "id_a long, id_b long")
    fast = {r["node"]: r["cluster_id"]
            for r in connected_components(edges).collect()}
    dist = {r["node"]: r["cluster_id"]
            for r in connected_components(edges,
                                          small_graph_edges=1).collect()}
    assert fast == dist
