"""Market-basket mining: hand-computed supports, confidence, lift."""

import pytest

from ai_incident_analyst_spark.operators.basket import frequent_item_pairs

pytestmark = pytest.mark.usefixtures("spark")


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "bk long, it string")
    return {(r["item_a"], r["item_b"]): r
            for r in frequent_item_pairs(df, "bk", "it", **kw).collect()}


def test_pair_counts_and_metrics(spark):
    rows = [(1, "a"), (1, "b"), (1, "c"),
            (2, "a"), (2, "b"),
            (3, "a"), (3, "c"),
            (4, "d")]
    got = _run(spark, rows, min_support=2)
    ab = got[("a", "b")]
    assert ab["n_pair"] == 2 and ab["n_a"] == 3 and ab["n_b"] == 2
    assert ab["support"] == 0.5          # 2 of 4 baskets
    assert ab["confidence_a_to_b"] == round(2 / 3, 6)
    assert ab["lift"] == round((2 * 4) / (3 * 2), 6)
    ac = got[("a", "c")]
    assert ac["n_pair"] == 2
    assert ("b", "c") not in got          # co-occurs once < min_support


def test_duplicate_items_in_basket_count_once(spark):
    rows = [(1, "a"), (1, "a"), (1, "b"), (2, "a"), (2, "b")]
    got = _run(spark, rows, min_support=1)
    assert got[("a", "b")]["n_pair"] == 2
    assert got[("a", "b")]["n_a"] == 2


def test_topn_orders_by_pair_count(spark):
    rows = ([(i, "x") for i in range(5)] + [(i, "y") for i in range(5)]
            + [(0, "z"), (1, "z")])
    got = _run(spark, rows, min_support=1, topn=1)
    assert set(got) == {("x", "y")}


def test_max_basket_size_drops_degenerate_basket(spark):
    """A pathological 10k-item basket would contribute ~50M pairs from
    one shuffle key; the guard drops it (and it from the basket count)
    while normal baskets mine unchanged."""
    rows = ([(1, "a"), (1, "b"), (2, "a"), (2, "b")]
            + [(99, f"i{k}") for k in range(10_001)])
    got = _run(spark, rows, min_support=2, max_basket_size=100)
    assert set(got) == {("a", "b")}
    ab = got[("a", "b")]
    assert ab["n_pair"] == 2
    assert ab["support"] == 1.0  # 2 of 2 surviving baskets
    # guard off: the degenerate basket's items flood back in
    got_all = _run(spark, rows[:4] + [(99, "a"), (99, "b"), (99, "c")],
                   min_support=2, max_basket_size=None)
    assert got_all[("a", "b")]["n_pair"] == 3


def test_max_basket_size_noop_on_normal_data(spark):
    rows = [(1, "a"), (1, "b"), (1, "c"),
            (2, "a"), (2, "b"),
            (3, "a"), (3, "c"),
            (4, "d")]
    # guard enabled but no basket exceeds it: results identical to the
    # unguarded default
    assert _run(spark, rows, min_support=2, max_basket_size=100) \
        == _run(spark, rows, min_support=2)
