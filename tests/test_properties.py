"""Property-based cross-checks (hypothesis): engine operators vs
independent Python references on randomized small inputs.

SURVEY §5 calls out that the reference has no randomized tests; these
cover the operators whose edge cases (ties, empty groups, boundary gaps)
are easy to miss with hand fixtures. Example counts are kept small —
each example runs a real Spark job.
"""

from datetime import datetime, timedelta

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from ai_incident_analyst_spark.operators.dedup import dedup_keep_first
from ai_incident_analyst_spark.operators.temporal import asof_join, sessionize

BASE = datetime(2024, 1, 1)

# (key, ts-offset-minutes, payload) triples
rows_strategy = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 300), st.integers(0, 5)),
    min_size=1, max_size=12,
)


@settings(max_examples=12, deadline=None)
@given(left=rows_strategy, right=rows_strategy)
def test_asof_join_matches_python_reference(spark, left, right):
    ldf = spark.createDataFrame(
        [(i, k, BASE + timedelta(minutes=m)) for i, (k, m, _) in enumerate(left)],
        "lid long, k long, ts timestamp")
    rdf = spark.createDataFrame(
        [(i, k, BASE + timedelta(minutes=m), float(v))
         for i, (k, m, v) in enumerate(right)],
        "rid long, k long, ts timestamp, v double")

    got = {r.lid: r.rid_matched
           for r in asof_join(ldf, rdf, key="k", right_cols=["rid", "v"],
                              tiebreak="rid").collect()}

    # reference: latest right with ts <= left ts; ties -> largest rid
    for i, (k, m, _) in enumerate(left):
        lts = BASE + timedelta(minutes=m)
        cand = [(BASE + timedelta(minutes=rm), ri)
                for ri, (rk, rm, _) in enumerate(right)
                if rk == k and BASE + timedelta(minutes=rm) <= lts]
        expect = max(cand)[1] if cand else None
        assert got[i] == expect, (i, left, right)


@settings(max_examples=12, deadline=None)
@given(rows=rows_strategy, gap=st.integers(1, 90))
def test_sessionize_matches_python_reference(spark, rows, gap):
    df = spark.createDataFrame(
        [(i, k, BASE + timedelta(minutes=m)) for i, (k, m, _) in enumerate(rows)],
        "i long, k long, ts timestamp")
    got = {r.i: r.session_id
           for r in sessionize(df, "k", "ts", gap_seconds=gap * 60,
                               order_tiebreak="i").collect()}

    by_key: dict[int, list[tuple[datetime, int]]] = {}
    for i, (k, m, _) in enumerate(rows):
        by_key.setdefault(k, []).append((BASE + timedelta(minutes=m), i))
    for k, evs in by_key.items():
        evs.sort()
        sid, last = 0, None
        for ts, i in evs:
            if last is None or (ts - last).total_seconds() > gap * 60:
                sid += 1
            last = ts
            assert got[i] == sid, (rows, gap)


@settings(max_examples=12, deadline=None)
@given(rows=rows_strategy)
def test_dedup_keep_first_matches_python_reference(spark, rows):
    df = spark.createDataFrame(
        [(i, k, v) for i, (k, _, v) in enumerate(rows)],
        "arrival long, k long, v long")
    got = sorted((r.k, r.v, r.arrival)
                 for r in dedup_keep_first(df, ["k", "v"], "arrival").collect())

    seen, expect = set(), []
    for i, (k, _, v) in enumerate(rows):
        if (k, v) not in seen:
            seen.add((k, v))
            expect.append((k, v, i))
    assert got == sorted(expect)


@settings(max_examples=10, deadline=None)
@given(tokens=st.lists(st.integers(0, 300), min_size=1, max_size=20),
       seq_len=st.integers(1, 64))
def test_pack_sequences_tiling_property(spark, tokens, seq_len):
    """For ANY token-count vector and pack size: pack spans tile the
    global token line exactly — per-doc slices sum to the doc's tokens,
    per-pack loads sum to seq_len except the last pack."""
    from ai_incident_analyst_spark.operators.packing import pack_sequences
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(tokens)], "id long, t long")
    out = [(r.id, r.pack_id, r.tok_start, r.tok_end)
           for r in pack_sequences(df, "id", "t", seq_len=seq_len,
                                   num_partitions=3).collect()]
    total = sum(tokens)
    per_doc: dict = {}
    per_pack: dict = {}
    for i, p, s, e in out:
        assert 0 <= s < e <= tokens[i], (i, s, e, tokens)
        per_doc[i] = per_doc.get(i, 0) + (e - s)
        per_pack[p] = per_pack.get(p, 0) + (e - s)
    assert per_doc == {i: t for i, t in enumerate(tokens) if t > 0}
    if total:
        n_packs = (total + seq_len - 1) // seq_len
        assert set(per_pack) == set(range(n_packs))
        for p, load in per_pack.items():
            want = seq_len if p < n_packs - 1 else total - seq_len * (n_packs - 1)
            assert load == want, (p, load, want, tokens, seq_len)


@settings(max_examples=8, deadline=None)
@given(texts=st.lists(
    st.text(alphabet="ab c", min_size=0, max_size=30), min_size=1, max_size=6))
def test_repetition_stats_bounds_property(spark, texts):
    """All fractions land in [0,1]; n_words matches a Python tokenizer;
    degenerate docs (no tokens) are simply absent."""
    import re

    from ai_incident_analyst_spark.operators.text_analysis import (
        repetition_stats,
    )
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = {r.doc_id: r for r in
           repetition_stats(df, "doc_id", "text", n=2).collect()}
    for i, t in enumerate(texts):
        toks = [w for w in re.split(r"\s+", t.strip().lower()) if w]
        if not toks:
            assert i not in got
            continue
        r = got[i]
        assert r.n_words == len(toks)
        for frac in (r.dup_word_frac, r.top_ngram_char_frac,
                     r.dup_ngram_char_frac):
            assert 0.0 <= frac <= 1.0
        if len(toks) >= 2:
            assert r.top_ngram_char_frac > 0.0
