"""Market-basket co-occurrence mining: frequent item pairs with
support / confidence / lift.

The classic association-rule surface (the pairwise core of Apriori /
FP-growth) restated relationally — no candidate-generation framework
needed for the pairwise case, which is what recommendation backfills
and "frequently bought together" widgets actually consume.

Physical design: baskets self-join WITHIN the basket key only
(``a.item < b.item``), so pair volume is Σ |basket|²/2 — bounded by
basket size, never corpus² (the same Σ-of-squares contract as SemDeDup
and blocked linkage). Support counts are map-side-combined aggs; the
per-item support table is item-cardinality and broadcast-joins back.
All metrics are exact ratios of integer counts (rounded 6 dp), so the
whole mining run hash-matches a SQL twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def frequent_item_pairs(baskets: DataFrame, basket_col: str,
                        item_col: str, min_support: int = 2,
                        topn: int | None = None,
                        max_basket_size: int | None = None) -> DataFrame:
    """Item pairs co-occurring in ≥ ``min_support`` baskets:
    ``(item_a, item_b, n_pair, n_a, n_b, support, confidence_a_to_b,
    lift)`` with ``item_a < item_b``.

    - ``support``   = n_pair / n_baskets
    - ``confidence``= n_pair / n_a  (rule a→b)
    - ``lift``      = support / (supp_a · supp_b)

    ``max_basket_size`` (opt-in) drops baskets with more distinct items
    before the within-basket self-join: pair volume is Σ |basket|², so
    one degenerate basket (a crawler session, a catch-all order id) can
    contribute |basket|²/2 pairs on its own — 10k items is 50M pairs
    from one key, and it lands in ONE shuffle partition. Oversize
    baskets carry little signal for pairwise association mining
    (co-occurrence in a basket with everything is uninformative), but
    dropping one DOES change n_baskets — the support/lift denominator
    for every pair — so the guard is explicit, not a default: set it
    (10_000 is a sane production value) on corpora that can contain
    degenerate keys.
    """
    # checkpoint the distinct frame FIRST: it feeds the size guard, the
    # basket count, the item-support agg and both self-join sides — an
    # un-checkpointed subtree would recompute the distinct shuffle per
    # consumer (measured ~2x wall at sf0.1 when the guard landed after
    # the checkpoint)
    b = baskets.select(F.col(basket_col).alias("bk"),
                       F.col(item_col).alias("it")).distinct() \
        .localCheckpoint(eager=False)
    if max_basket_size is not None:
        sizes = b.groupBy("bk").agg(F.count("*").alias("__n"))
        b = (b.join(F.broadcast(
                 sizes.filter(F.col("__n") > max_basket_size)
                 .select("bk")), "bk", "left_anti")
             .localCheckpoint(eager=False))
    n_baskets = b.select("bk").distinct().count()
    item_supp = b.groupBy("it").agg(F.count("*").alias("n_it"))
    l, r = b.alias("l"), b.alias("r")
    pairs = (
        l.join(r, (F.col("l.bk") == F.col("r.bk"))
               & (F.col("l.it") < F.col("r.it")))
        .groupBy(F.col("l.it").alias("item_a"),
                 F.col("r.it").alias("item_b"))
        .agg(F.count("*").alias("n_pair"))
        .filter(F.col("n_pair") >= min_support)
    )
    sa = item_supp.select(F.col("it").alias("item_a"),
                          F.col("n_it").alias("n_a"))
    sb = item_supp.select(F.col("it").alias("item_b"),
                          F.col("n_it").alias("n_b"))
    nb = float(n_baskets)
    out = (
        pairs.join(sa, "item_a").join(sb, "item_b")
        .select(
            "item_a", "item_b", "n_pair", "n_a", "n_b",
            F.round(F.col("n_pair") / F.lit(nb), 6).alias("support"),
            F.round(F.col("n_pair") / F.col("n_a"), 6)
            .alias("confidence_a_to_b"),
            F.round((F.col("n_pair") * F.lit(nb))
                    / (F.col("n_a") * F.col("n_b")), 6).alias("lift"),
        )
    )
    if topn is not None:
        # sort-limit (TakeOrderedAndProject): per-partition partial
        # top-n — a global row_number window would single-task the
        # whole pair-count table
        out = out.orderBy(F.col("n_pair").desc(),
                          F.col("item_a").asc(),
                          F.col("item_b").asc()).limit(topn)
    return out
