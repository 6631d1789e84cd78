"""Preference operators: pairwise comparisons, Bradley-Terry MM,
chosen/rejected pair construction (operators/preference.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from ai_incident_analyst_spark.operators.preference import (
    SCORE_FLOOR,
    bradley_terry,
    pairwise_comparisons,
    preference_pairs,
)


def _matches_df(spark, rows):
    return spark.createDataFrame(
        rows, "entity_a string, entity_b string, wins_a long, wins_b long")


def _bt_numpy(matches, iterations=2, round_dp=6):
    """Straight-line numpy restatement of Hunter's MM update —
    independent of the DataFrame formulation."""
    ents = sorted({m[0] for m in matches} | {m[1] for m in matches})
    idx = {e: i for i, e in enumerate(ents)}
    k = len(ents)
    n = np.zeros((k, k))
    w = np.zeros(k)
    for a, b, wa, wb in matches:
        ia, ib = idx[a], idx[b]
        n[ia, ib] += wa + wb
        n[ib, ia] += wa + wb
        w[ia] += wa
        w[ib] += wb
    s = np.ones(k)
    for _ in range(iterations):
        denom = np.array([
            sum(n[i, j] / (s[i] + s[j]) for j in range(k) if n[i, j] > 0)
            for i in range(k)])
        s = w / denom
        s = np.maximum(s * k / s.sum(), SCORE_FLOOR).round(round_dp)
    return {e: s[idx[e]] for e in ents}


def test_pairwise_comparisons_basic(spark):
    # group 1: A(10) beats B(5) beats C(1); group 2: B(7) beats A(3);
    # group 3: A(4) ties B(4) -> draw, counts for neither
    df = spark.createDataFrame(
        [(1, "A", 10.0), (1, "B", 5.0), (1, "C", 1.0),
         (2, "B", 7.0), (2, "A", 3.0),
         (3, "A", 4.0), (3, "B", 4.0)],
        "g long, e string, v double")
    got = {(r.entity_a, r.entity_b): (r.wins_a, r.wins_b)
           for r in pairwise_comparisons(df, "g", "e", "v").collect()}
    assert got == {("A", "B"): (1, 1), ("A", "C"): (1, 0),
                   ("B", "C"): (1, 0)}


def test_pairwise_comparisons_dedups_repeated_entities(spark):
    # two A-rows in one group collapse to max before pairing: one
    # comparison, decided by A's max (9) vs B (5)
    df = spark.createDataFrame(
        [(1, "A", 2.0), (1, "A", 9.0), (1, "B", 5.0)],
        "g long, e string, v double")
    rows = pairwise_comparisons(df, "g", "e", "v").collect()
    assert len(rows) == 1
    assert (rows[0].wins_a, rows[0].wins_b) == (1, 0)


def test_bradley_terry_matches_numpy(spark):
    matches = [("A", "B", 7, 3), ("A", "C", 4, 6), ("B", "C", 2, 8),
               ("A", "D", 5, 0), ("C", "D", 9, 1)]
    want = _bt_numpy(matches)
    got = {r.entity: r.score
           for r in bradley_terry(_matches_df(spark, matches)).collect()}
    assert set(got) == set(want)
    for e in want:
        assert got[e] == pytest.approx(want[e], abs=1.5e-6), e


def test_bradley_terry_order_and_totals(spark):
    # D dominates everyone, C loses everything -> score order D > C
    matches = [("A", "B", 6, 4), ("A", "D", 0, 10), ("B", "D", 1, 9),
               ("C", "D", 0, 10), ("A", "C", 8, 2), ("B", "C", 7, 3)]
    rows = {r.entity: r for r in
            bradley_terry(_matches_df(spark, matches)).collect()}
    assert rows["D"].score == max(r.score for r in rows.values())
    assert rows["C"].score == min(r.score for r in rows.values())
    assert rows["D"].wins == 29 and rows["D"].comparisons == 30
    # zero-win entities stay positive (floor) so the MM stays defined
    assert rows["C"].score >= SCORE_FLOOR


def test_bradley_terry_partitioning_invariant(spark):
    matches = [("A", "B", 7, 3), ("A", "C", 4, 6), ("B", "C", 2, 8)]
    df = _matches_df(spark, matches)
    a = sorted(map(tuple, bradley_terry(df).collect()))
    b = sorted(map(tuple, bradley_terry(df.repartition(7)).collect()))
    assert a == b


def test_preference_pairs_tiebreak_and_margin(spark):
    df = spark.createDataFrame(
        # g1: clear best/worst; g2: top score tied (ids 20,21) -> chosen
        # is smaller id; bottom tied (22,23) -> rejected is smaller id;
        # g3: all scores equal -> no pair (margin would be 0)
        [("g1", 1, 0.9), ("g1", 2, 0.5), ("g1", 3, 0.1),
         ("g2", 21, 0.8), ("g2", 20, 0.8), ("g2", 23, 0.2), ("g2", 22, 0.2),
         ("g3", 30, 0.4), ("g3", 31, 0.4)],
        "grp string, doc_id long, q double")
    got = {r.grp: r for r in
           preference_pairs(df, ["grp"], "doc_id", "q").collect()}
    assert set(got) == {"g1", "g2"}
    assert (got["g1"].chosen_id, got["g1"].rejected_id) == (1, 3)
    assert got["g1"].margin == pytest.approx(0.8)
    assert (got["g2"].chosen_id, got["g2"].rejected_id) == (20, 22)


def test_registry_queries_run(spark, sf_dir):
    from ai_incident_analyst_spark.queries import REGISTRY
    bt = REGISTRY["bt_brand_scores"].fn(spark, sf_dir)
    rows = bt.collect()
    assert rows and [r.entity if hasattr(r, "entity") else r.brand
                     for r in rows]
    assert all(r.score >= SCORE_FLOOR for r in rows)
    # scores arrive sorted descending
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)
    pp = REGISTRY["preference_pairs_quality"].fn(spark, sf_dir).collect()
    assert pp and all(r.margin > 0 for r in pp)
