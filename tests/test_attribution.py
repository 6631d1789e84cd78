"""Shapley channel attribution (operators/attribution.py): exact-value
hand truths, efficiency axiom, itertools brute-force parity."""

import pytest
from pyspark.sql import functions as F

from ai_incident_analyst_spark.operators.attribution import (
    shapley_attribution,
)

pytestmark = pytest.mark.usefixtures("spark")


def _touches(spark, rows):
    return spark.createDataFrame(rows, "u long, ch string, conv int")


def test_single_channel_gets_all_credit(spark):
    rows = [(1, "a", 1), (2, "a", 0), (3, "b", 0), (3, "b", 0)]
    df = _touches(spark, rows)
    got = {r["channel"]: r["shapley"]
           for r in shapley_attribution(df, "u", "ch", "conv",
                                        ["a", "b"]).collect()}
    # v({a})=0.5, v({b})=0, v({a,b}) unobserved -> 0 by the stated
    # convention, so the grand coalition "loses" a's value:
    # phi_a = 1/2*(v(a)-v(0)) + 1/2*(v(ab)-v(b)) = 0.25
    # phi_b = 1/2*(v(b)-v(0)) + 1/2*(v(ab)-v(a)) = 1/2*(0-0.5) = -0.25
    # (credits telescope to v(ab)=0 — the unobserved-as-zero trade-off)
    assert got["a"] == pytest.approx(0.25, abs=1e-6)
    assert got["b"] == pytest.approx(-0.25, abs=1e-6)


def test_efficiency_and_bruteforce_parity(spark):
    from itertools import combinations
    from math import factorial

    # deterministic synthetic exposure sets with varied conversion
    chans = ["a", "b", "c"]
    rows = []
    for u in range(60):
        mask = u % 8
        touched = [c for i, c in enumerate(chans) if mask >> i & 1]
        conv = 1 if (mask in (3, 5, 7) and u % 3 == 0) or mask == 6 \
            else 0
        for c in (touched or ["a"]):   # mask 0 users touch 'a' once
            rows.append((u, c, conv))
    df = _touches(spark, rows)
    got = {r["channel"]: (r["shapley_scaled"], r["shapley"])
           for r in shapley_attribution(df, "u", "ch", "conv",
                                        chans).collect()}

    # brute force from the same unit table
    units = {}
    for u, c, conv in rows:
        m, cv = units.get(u, (0, 0))
        units[u] = (m | (1 << chans.index(c)), max(cv, conv))
    rates = {}
    for m, cv in units.values():
        k, n = rates.get(m, (0, 0))
        rates[m] = (k + cv, n + 1)
    vq = {m: round(1e6 * k / n) for m, (k, n) in rates.items()}
    n = len(chans)
    want = {}
    for i, c in enumerate(chans):
        tot = 0
        others = [b for b in range(n) if b != i]
        for r in range(n):
            for sub in combinations(others, r):
                m = sum(1 << b for b in sub)
                w = factorial(r) * factorial(n - 1 - r)
                tot += w * (vq.get(m | 1 << i, 0) - vq.get(m, 0))
        want[c] = tot
    for c in chans:
        assert got[c][0] == want[c], c
    # efficiency: credits sum to v(grand) - v(empty) when every
    # coalition is observed and v(empty)=0... here empty mask is
    # unobserved-as-0 and grand is observed, so the telescoping sum
    # equals vq(grand)/1e6
    total = sum(v for v, _ in got.values()) / factorial(n)
    assert total == pytest.approx(vq[7], abs=1)
