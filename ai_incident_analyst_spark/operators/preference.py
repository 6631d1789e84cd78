"""Preference-data operators: pairwise comparisons, Bradley–Terry
ranking, and chosen/rejected pair construction.

The reference has no preference/ranking surface (its analytics stop at
the RAG loop, ``src/analyst/rca.py``); these are the batch operators an
RLHF/DPO training-data pipeline runs upstream of fine-tuning:

- ``pairwise_comparisons`` turns co-occurring scored items into head-to-
  head match records (the "which response won" table);
- ``bradley_terry`` fits the classic Bradley–Terry strength model over
  those matches with the MM algorithm (Hunter 2004, "MM algorithms for
  generalized Bradley-Terry models") — the standard way to turn pairwise
  preferences into scalar rankings (cf. public Chatbot-Arena
  methodology);
- ``preference_pairs`` builds (chosen, rejected) training pairs per
  group from any per-item score — the DPO data-prep shape.

Scale design (100 TB rule):

- The heavy input (raw comparisons) is reduced ONCE by a keyed groupBy
  into an aggregated match table of at most |entities|² rows; every MM
  iteration then operates on that aggregate only — corpus size never
  re-enters the loop.
- MM iterations are fixed-count (like ``operators/graph.py:pagerank``)
  so results are deterministic and the whole fit unrolls into a DuckDB
  twin; per-round scores are discretized to ``round_dp`` decimals to
  absorb FP-association ulps across engines (the kmeans/pagerank trick).
- ``preference_pairs`` is a single min/max-struct groupBy (map-side
  combine, no window over a hot partition key — the
  ``dedup_lines_global`` skew-proof pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: score floor keeping MM denominators strictly positive even when an
#: entity never wins (its strength collapses to 0 and the next round's
#: 1/(s_i + s_j) would blow up on an all-loser pair)
SCORE_FLOOR = 1e-6


def pairwise_comparisons(df: DataFrame, group_col: str, entity_col: str,
                         value_col: str) -> DataFrame:
    """Head-to-head match records from co-grouped scored entities.

    Within each ``group_col`` bucket, every unordered pair of distinct
    entities becomes one comparison: the entity whose (per-group max)
    ``value_col`` is strictly higher wins; exact ties are draws and
    count for neither side. Returns one row per entity pair
    ``(entity_a, entity_b, wins_a, wins_b)`` with ``entity_a <
    entity_b``, aggregated over all groups.

    The pair join is WITHIN the group key only (Σ|group|², never
    corpus²) — the ``operators/basket.py:frequent_item_pairs`` shape —
    and the per-(group, entity) pre-aggregation both dedups repeated
    entities and caps the join input at one row per entity per group.
    """
    lines = (
        df.groupBy(F.col(group_col).alias("__g"),
                   F.col(entity_col).alias("__e"))
        .agg(F.max(F.col(value_col)).alias("__v"))
    )
    a, b = lines.alias("a"), lines.alias("b")
    return (
        a.join(b, (F.col("a.__g") == F.col("b.__g"))
               & (F.col("a.__e") < F.col("b.__e")))
        .groupBy(F.col("a.__e").alias("entity_a"),
                 F.col("b.__e").alias("entity_b"))
        .agg(
            F.sum(F.when(F.col("a.__v") > F.col("b.__v"), 1)
                  .otherwise(0)).alias("wins_a"),
            F.sum(F.when(F.col("b.__v") > F.col("a.__v"), 1)
                  .otherwise(0)).alias("wins_b"),
        )
        .filter(F.col("wins_a") + F.col("wins_b") > 0)  # draws-only pairs
    )


def bradley_terry(matches: DataFrame, iterations: int = 2,
                  round_dp: int = 6) -> DataFrame:
    """Bradley–Terry strengths via ``iterations`` fixed MM rounds.

    ``matches`` is the ``pairwise_comparisons`` output
    ``(entity_a, entity_b, wins_a, wins_b)``. Each MM round applies
    Hunter's update ``s_i ← W_i / Σ_j n_ij / (s_i + s_j)`` (W_i = total
    wins, n_ij = decisive comparisons between i and j), then normalizes
    to mean strength 1 and discretizes to ``round_dp`` decimals so the
    unrolled SQL twin reproduces the values exactly. Strengths are
    floored at ``SCORE_FLOOR`` (an entity with zero wins otherwise hits
    a 0/0 denominator next round).

    Returns ``(entity, wins, comparisons, score)``. Every per-round
    frame is O(|entities|²) at most — corpus scale only touches the
    one-off ``pairwise_comparisons`` aggregation upstream.
    """
    m = matches.select(
        "entity_a", "entity_b",
        (F.col("wins_a") + F.col("wins_b")).alias("n"),
        "wins_a", "wins_b")
    directed = (
        m.select(F.col("entity_a").alias("i"), F.col("entity_b").alias("j"),
                 "n", F.col("wins_a").alias("w"))
        .unionAll(
            m.select(F.col("entity_b").alias("i"),
                     F.col("entity_a").alias("j"),
                     "n", F.col("wins_b").alias("w")))
        .localCheckpoint(eager=False)
    )
    tot = (
        directed.groupBy(F.col("i").alias("entity"))
        .agg(F.sum("w").alias("wins"), F.sum("n").alias("comparisons"))
        .localCheckpoint(eager=False)
    )

    s = tot.select("entity", F.lit(1.0).alias("s"))
    for _ in range(iterations):
        si = s.select(F.col("entity").alias("i"), F.col("s").alias("s_i"))
        sj = s.select(F.col("entity").alias("j"), F.col("s").alias("s_j"))
        u = (
            directed.join(si, "i").join(sj, "j")
            .groupBy(F.col("i").alias("entity"))
            .agg(F.sum(F.col("n") / (F.col("s_i") + F.col("s_j")))
                 .alias("denom"))
            .join(tot, "entity")
            .select("entity", (F.col("wins") / F.col("denom")).alias("s"))
        )
        # normalize to mean 1 with a 1-row scalar-subquery broadcast
        # (size-independent of data scale — broadcast policy allows it)
        norm = F.broadcast(
            u.agg(F.count("*").alias("__k"), F.sum("s").alias("__sum")))
        s = (
            u.crossJoin(norm)
            .select("entity",
                    F.round(F.greatest(
                        F.col("s") * F.col("__k") / F.col("__sum"),
                        F.lit(SCORE_FLOOR)), round_dp).alias("s"))
            .localCheckpoint(eager=False)
        )
    return (
        tot.join(s, "entity")
        .select("entity", "wins", "comparisons", F.col("s").alias("score"))
    )


def preference_pairs(df: DataFrame, group_cols: list[str], id_col: str,
                     score_col: str) -> DataFrame:
    """DPO-style (chosen, rejected) pair per group from per-item scores.

    For each ``group_cols`` bucket: chosen = highest ``score_col`` (ties
    → smallest ``id_col``), rejected = lowest score (ties → smallest
    id), keeping only groups with a strictly positive margin — a pair
    whose two sides score identically teaches nothing.

    One min/max-struct groupBy: map-side combined, skew-proof (no
    row_number window over a potentially hot group key), and the id
    tie-breaks make the output deterministic under any partitioning.
    """
    gc = [F.col(c) for c in group_cols]
    agg = (
        df.groupBy(*gc)
        .agg(
            F.max(F.struct(F.col(score_col).alias("q"),
                           (-F.col(id_col)).alias("nid"))).alias("__b"),
            F.min(F.struct(F.col(score_col).alias("q"),
                           F.col(id_col).alias("id"))).alias("__w"),
        )
    )
    return (
        agg.select(
            *group_cols,
            (-F.col("__b.nid")).alias("chosen_id"),
            F.col("__w.id").alias("rejected_id"),
            F.col("__b.q").alias("chosen_score"),
            F.col("__w.q").alias("rejected_score"),
            F.round(F.col("__b.q") - F.col("__w.q"), 6).alias("margin"),
        )
        .filter(F.col("chosen_score") > F.col("rejected_score"))
    )
