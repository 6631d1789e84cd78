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
