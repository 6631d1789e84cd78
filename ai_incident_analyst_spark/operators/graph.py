"""Link-analysis operators: weighted PageRank over an edge list.

The reference has no graph operator at all (its nearest relative is the
transitive near-dup clustering we already extend it with in
``operators/dedup.py:connected_components``); PageRank is the standard
next step for a web-scale training-data pipeline — CommonCrawl-style
curation scores hosts/pages by link authority (the original use), and
item-transition graphs (click A → click B inside a session) yield the
same computation for "important item" ranking.

Physical design — classic synchronous power iteration, restated on
DataFrames so Catalyst owns the physical plan:

- Edges are weighted and pre-aggregated: ``(src, dst) -> w`` with one
  groupBy, then joined once against per-src total outweight so each
  edge carries its transition probability ``w / tw``. This table is
  computed ONCE, cached, and re-used by every round — the per-round work
  is one equi-join (ranks → edges on src) + one groupBy(dst) sum, i.e.
  two keyed shuffles, no driver data, no Python boundary.
- Ranks init at 1.0 per node (the unnormalized Brin/Page convention:
  ``r = (1-d) + d * Σ r_in``); dangling nodes simply contribute nothing
  (their mass is not redistributed — the convention most SQL/graph-lib
  implementations use, and the one an unrolled SQL twin can reproduce
  exactly).
- ``localCheckpoint`` truncates lineage per round exactly like
  ``connected_components`` — the plan stays O(1) across iterations
  instead of growing a 2^k tree.

At 100 TB the edge table shuffles once to build and then each round
shuffles only the rank table (node cardinality, far below edge
cardinality) plus the join output; skewed high-in-degree nodes (the
web's power law) are handled by AQE skew-join splitting, which is why
the contribution aggregation is a plain groupBy rather than a
hand-rolled combiner.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(edges: DataFrame, src: str = "src", dst: str = "dst",
             weight: Optional[str] = None, iterations: int = 3,
             damping: float = 0.85) -> DataFrame:
    """Weighted PageRank with a fixed iteration count.

    Returns ``(node, rank)`` for every node appearing as a src or dst.
    Fixed ``iterations`` (rather than a convergence tolerance) keeps the
    result deterministic and lets an unrolled SQL twin reproduce the
    values bit-for-bit up to FP association order.
    """
    w = (F.col(weight).cast("double") if weight is not None
         else F.lit(1.0))
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"),
                     w.alias("w"))
        .groupBy("src", "dst").agg(F.sum("w").alias("w"))
    )
    tw = e.groupBy("src").agg(F.sum("w").alias("tw"))
    # transition matrix rows: src -> dst with probability p; built once,
    # reused every round
    trans = (
        e.join(tw, "src")
        .select("src", "dst", (F.col("w") / F.col("tw")).alias("p"))
        .localCheckpoint(eager=False)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )

    ranks = nodes.select("node", F.lit(1.0).alias("rank"))
    base = 1.0 - damping
    for _ in range(iterations):
        contribs = (
            ranks.join(trans, ranks["node"] == trans["src"])
            .select(F.col("dst").alias("node"),
                    (F.col("rank") * F.col("p")).alias("c"))
            .groupBy("node").agg(F.sum("c").alias("c"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .select("node",
                    (F.lit(base)
                     + F.lit(damping) * F.coalesce(F.col("c"), F.lit(0.0))
                     ).alias("rank"))
            .localCheckpoint(eager=False)
        )
    return ranks


def triangle_count(edges: DataFrame, src: str = "src",
                   dst: str = "dst") -> DataFrame:
    """Per-node triangle participation count over the undirected simple
    graph induced by ``edges`` (self-loops dropped, directions and
    duplicates collapsed): ``(node, n_triangles)`` for every node that
    appears in an edge.

    The classic two-join MapReduce formulation on canonical ``u < v``
    edges: wedges ``u–v–w`` (``u < v < w``) joined against the closing
    edge ``(u, w)``. Every triangle is found exactly once in its
    canonical orientation, then exploded to its three corners for the
    per-node sum. All keys are integers; results are exact — an
    independent SQL twin hash-matches.

    Scale note: wedge generation squares the degree of hot nodes; the
    canonical ``u < v`` orientation already halves it, and the standard
    refinement (orient edges low-degree → high-degree instead of by id,
    which bounds wedge fan-out by arboricity) drops in here by swapping
    the comparison column — kept by-id for oracle determinism.
    """
    canon = (
        edges.select(F.least(F.col(src), F.col(dst)).alias("u"),
                     F.greatest(F.col(src), F.col(dst)).alias("v"))
        .filter(F.col("u") < F.col("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    e1, e2, e3 = canon.alias("e1"), canon.alias("e2"), canon.alias("e3")
    tris = (
        e1.join(e2, F.col("e1.v") == F.col("e2.u"))
        .select(F.col("e1.u").alias("a"), F.col("e1.v").alias("b"),
                F.col("e2.v").alias("c"))
        .join(e3, (F.col("a") == F.col("e3.u"))
              & (F.col("c") == F.col("e3.v")), "left_semi")
    )
    corners = (
        tris.select(F.col("a").alias("node"))
        .union(tris.select(F.col("b").alias("node")))
        .union(tris.select(F.col("c").alias("node")))
        .groupBy("node").agg(F.count("*").alias("n_triangles"))
    )
    nodes = (
        canon.select(F.col("u").alias("node"))
        .union(canon.select(F.col("v").alias("node")))
        .distinct()
    )
    return (
        nodes.join(corners, "node", "left")
        .select("node",
                F.coalesce("n_triangles", F.lit(0)).alias("n_triangles"))
    )


def graph_stats(edges: DataFrame, src: str = "src",
                dst: str = "dst") -> DataFrame:
    """One-row structural summary of the undirected simple graph:
    ``(n_nodes, n_edges, max_degree, n_wedges, n_triangles,
    global_clustering_1e6)``.

    Wedges (paths of length 2) come from the degree table alone —
    ``Σ d·(d−1)/2`` — and triangles from ``triangle_count``; the global
    clustering coefficient ``3·triangles / wedges`` is reported as an
    integer micro-ratio (``·10⁶``, floor) so the whole row stays in
    exact integer arithmetic end to end (engine-portable by
    construction). Degree table is one shuffle; everything downstream is
    tiny.
    """
    canon = (
        edges.select(F.least(F.col(src), F.col(dst)).alias("u"),
                     F.greatest(F.col(src), F.col(dst)).alias("v"))
        .filter(F.col("u") < F.col("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = (
        canon.select(F.col("u").alias("node"))
        .union(canon.select(F.col("v").alias("node")))
        .groupBy("node").agg(F.count("*").alias("d"))
    )
    tri_total = (
        triangle_count(canon, "u", "v")
        .agg((F.sum("n_triangles") / 3).cast("long").alias("t"))
    )
    stats = deg.agg(
        F.count("*").alias("n_nodes"),
        F.max("d").alias("max_degree"),
        F.sum((F.col("d") * (F.col("d") - 1) / 2).cast("long"))
        .alias("n_wedges"),
    )
    n_edges = canon.agg(F.count("*").alias("n_edges"))
    return (
        stats.join(n_edges).join(tri_total)
        .select(
            "n_nodes", "n_edges", "max_degree", "n_wedges",
            F.col("t").alias("n_triangles"),
            # integral `div`, not double `/`+cast: the FP quotient can
            # round across the floor boundary and disagree with exact
            # integer division
            F.when(F.col("n_wedges") > 0,
                   F.expr("(3 * t * 1000000) div n_wedges"))
            .otherwise(F.lit(0)).alias("global_clustering_1e6"),
        )
    )


def hits(edges: DataFrame, src: str = "src", dst: str = "dst",
         iterations: int = 2, round_dp: int = 6) -> DataFrame:
    """Kleinberg HITS with a fixed iteration count: ``(node, hub,
    authority)`` for every node in the edge list.

    Classic mutual reinforcement on the directed simple graph —
    ``authority(v) = Σ_{u→v} hub(u)``, ``hub(u) = Σ_{u→v} authority(v)``
    — with MAX normalization after each half-step (scores scale to
    max=1). Max, not the textbook L2 or an L1 sum, because max over
    doubles is associativity-FREE: a global Σ of doubles can associate
    differently across engines/partitionings and flip a 6-dp rounding
    boundary, while max is exact under any order — and any positive
    rescaling preserves the HITS ranking identically. Fixed
    ``iterations`` rather than a convergence tolerance, same
    determinism contract as ``pagerank``.

    Physical shape: the deduped edge table is checkpointed once; each
    half-step is one equi-join (scores → edges) + one groupBy sum + a
    1-row scalar-subquery broadcast for the normalizer — node-cardinality
    shuffles only, no driver data, no Python. Hot hubs/authorities (the
    power-law tail) are plain groupBy keys, so AQE skew splitting
    applies.
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    e = (edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
         .distinct()
         .localCheckpoint(eager=False))
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .distinct()
             .localCheckpoint(eager=False))

    def _nmax(df, col):
        tot = df.agg(F.max(col).alias("__t"))
        return (df.crossJoin(F.broadcast(tot))
                .select("node", (F.col(col) / F.col("__t")).alias(col)))

    hubs = nodes.select("node", F.lit(1.0).alias("hub"))
    auth = None
    for _ in range(iterations):
        auth = (e.join(hubs, e["src"] == hubs["node"])
                .groupBy(F.col("dst").alias("node"))
                .agg(F.sum("hub").alias("authority")))
        auth = _nmax(auth, "authority").localCheckpoint(eager=False)
        hubs = (e.join(auth, e["dst"] == auth["node"])
                .groupBy(F.col("src").alias("node"))
                .agg(F.sum("authority").alias("hub")))
        hubs = _nmax(hubs, "hub").localCheckpoint(eager=False)
    return (nodes
            .join(hubs, "node", "left")
            .join(auth, "node", "left")
            .select("node",
                    F.round(F.coalesce("hub", F.lit(0.0)),
                            round_dp).alias("hub"),
                    F.round(F.coalesce("authority", F.lit(0.0)),
                            round_dp).alias("authority")))


def label_propagation(edges: DataFrame, src: str = "src",
                      dst: str = "dst", iterations: int = 3) -> DataFrame:
    """Synchronous label-propagation community detection over the
    undirected simple graph: ``(node, label)`` after a fixed number of
    rounds. Each round every node adopts the label held by the PLURALITY
    of its neighbors, ties broken by the smallest label — both choices
    make the algorithm deterministic (the usual async/random-order LPA
    is not reproducible, which disqualifies it for a pipeline whose
    outputs must be auditable), and a fixed round count lets an unrolled
    SQL twin hash-match. Isolated direction: a node keeps its current
    label when it has no neighbors (cannot happen here — every node in
    an edge list has degree ≥ 1 on the undirected closure).

    vs ``connected_components``: CC merges everything reachable; LPA
    finds *denser-than-surroundings* groups inside a component — the
    community structure a curation pipeline uses to diversify sampling
    within a connected near-dup blob.

    Physical shape per round: one join (labels → undirected edges) + one
    (node, label) count groupBy + one per-node argmax window — all keyed
    on node ids, lineage truncated per round like ``pagerank``. Integer
    labels end-to-end: exact cross-engine.
    """
    from pyspark.sql import Window

    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    und = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
           .union(edges.select(F.col(dst).alias("u"),
                               F.col(src).alias("v")))
           .filter(F.col("u") != F.col("v"))
           .distinct()
           .localCheckpoint(eager=False))
    labels = (und.select(F.col("u").alias("node")).distinct()
              .select("node", F.col("node").alias("label")))
    w = Window.partitionBy("node").orderBy(F.col("n").desc(),
                                           F.col("label").asc())
    for _ in range(iterations):
        neigh = (und.join(labels, und["v"] == labels["node"])
                 .select(F.col("u").alias("node"), "label"))
        counts = neigh.groupBy("node", "label").agg(
            F.count(F.lit(1)).alias("n"))
        labels = (counts.withColumn("__rn", F.row_number().over(w))
                  .filter(F.col("__rn") == 1)
                  .select("node", "label")
                  .localCheckpoint(eager=False))
    return labels


def k_core(edges: DataFrame, src: str = "src", dst: str = "dst",
           k: int = 2, max_iter: int = 30) -> DataFrame:
    """k-core decomposition (fixed k): the maximal subgraph in which
    every node has degree ≥ ``k``, by iterative peeling — drop nodes
    below ``k``, recompute degrees, repeat to the fixed point (Seidman
    1983; the standard "dense kernel vs straggler fringe" diagnostic).
    On an item-transition or near-dup graph the k-core separates the
    stable dense interaction kernel from tendrils that pagerank/
    triangles alone don't isolate — useful both as a curation signal
    (keep the kernel) and as a skew early-warning (a huge 8-core means
    hub joins ahead).

    Returns ``(node, degree)`` for k-core members — degree WITHIN the
    core (≥ k by construction). Empty frame when no k-core exists.

    Physical shape per round: one degree groupBy + two semi-join-shaped
    equi-joins of the edge list against the surviving node set — all
    keyed on node ids, no driver data; lineage truncated per round
    (eager localCheckpoint, so the convergence count reads cached
    blocks). Converges in ≤ diameter-ish rounds on real graphs; raises
    past ``max_iter`` rather than returning a half-peeled set (the
    ``connected_components`` loudness contract). A fixed-round unroll
    (no-op rounds are harmless: peeling is monotone, so a converged
    edge set is a fixed point of every later round) is what the SQL
    twin replays.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    und = (edges.select(F.col(src).cast("long").alias("u"),
                        F.col(dst).cast("long").alias("v"))
           .filter(F.col("u") != F.col("v")))
    alive = (und.union(und.select(F.col("v").alias("u"),
                                  F.col("u").alias("v")))
             .distinct()
             .localCheckpoint(eager=True))
    prev_edges = alive.count()
    for _ in range(max_iter):
        deg = alive.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
        keep = deg.where(F.col("deg") >= k).select("u")
        alive = (alive.join(keep, "u")
                 .join(keep.withColumnRenamed("u", "v"), "v")
                 .select("u", "v")
                 .localCheckpoint(eager=True))
        n = alive.count()
        if n == prev_edges:
            break
        prev_edges = n
    else:
        raise RuntimeError(
            f"k_core did not reach a fixed point in {max_iter} rounds; "
            "raise max_iter")
    return (alive.groupBy("u").agg(F.count(F.lit(1)).alias("degree"))
            .select(F.col("u").alias("node"),
                    F.col("degree").cast("long").alias("degree")))


def k_truss(edges: DataFrame, src: str = "src", dst: str = "dst",
            k: int = 3, max_iter: int = 30) -> DataFrame:
    """k-truss decomposition (Cohen 2008): the maximal subgraph in
    which every EDGE participates in ≥ k−2 triangles — the edge-level
    sharpening of ``k_core`` (every k-truss is inside the (k−1)-core,
    but a truss additionally kills bridge edges whose endpoints are
    individually well-connected). On a near-dup graph the 3-truss
    keeps only mutually-corroborated duplication (every retained pair
    shares a witness), dropping chain links a single noisy pair could
    forge.

    Returns ``(u, v, support)`` for surviving canonical (u < v) edges;
    ``support`` = triangle count within the truss (≥ k−2). Empty frame
    when no truss exists.

    Physical shape per round: the canonical wedge join + closing-edge
    join (the ``triangle_count`` machinery), an explode of each
    triangle to its 3 edges, one support groupBy, and the drop filter;
    lineage truncated per round, convergence by edge-count fixed point
    (raises past ``max_iter`` — the loudness contract). Peeling is
    monotone, so a fixed-round SQL unroll with trailing no-op rounds
    equals the convergence loop — the ``k_core`` twin argument.
    Triangle support squares hot-node degrees; the canonical
    orientation halves wedge fan-out and AQE skew-splits the rest
    (same scale notes as ``triangle_count``).
    """
    if k < 3:
        raise ValueError(f"k must be >= 3 for a k-truss, got {k}")
    e = (edges.select(F.least(F.col(src), F.col(dst)).alias("u"),
                      F.greatest(F.col(src), F.col(dst)).alias("v"))
         .filter(F.col("u") < F.col("v"))
         .distinct()
         .localCheckpoint(eager=True))
    prev = e.count()
    support = None
    for _ in range(max_iter):
        w1, w2, w3 = e.alias("w1"), e.alias("w2"), e.alias("w3")
        tri = (w1.join(w2, F.col("w1.v") == F.col("w2.u"))
               .select(F.col("w1.u").alias("a"),
                       F.col("w1.v").alias("b"),
                       F.col("w2.v").alias("c"))
               .join(w3, (F.col("a") == F.col("w3.u"))
                     & (F.col("c") == F.col("w3.v")), "left_semi"))
        sides = (tri.select(F.col("a").alias("u"), F.col("b").alias("v"))
                 .union(tri.select(F.col("b").alias("u"),
                                   F.col("c").alias("v")))
                 .union(tri.select(F.col("a").alias("u"),
                                   F.col("c").alias("v"))))
        support = (sides.groupBy("u", "v")
                   .agg(F.count(F.lit(1)).alias("support"))
                   .localCheckpoint(eager=True))
        e = (e.join(support.where(F.col("support") >= k - 2),
                    ["u", "v"], "left_semi")
             .localCheckpoint(eager=True))
        n = e.count()
        if n == prev:
            break
        prev = n
    else:
        raise RuntimeError(
            f"k_truss did not reach a fixed point in {max_iter} rounds; "
            "raise max_iter")
    if support is None:
        return e.select("u", "v", F.lit(0).cast("long").alias("support"))
    return (e.join(support, ["u", "v"])
            .select("u", "v", F.col("support").cast("long")
                    .alias("support")))
