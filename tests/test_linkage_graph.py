"""fuzzy_self_join / fuzzy_join / triangle_count: hand-computed truths."""

import pytest

from pyspark.sql import functions as F

from ai_incident_analyst_spark.operators.graph import triangle_count
from ai_incident_analyst_spark.operators.linkage import (
    fuzzy_join,
    fuzzy_self_join,
    last_token,
)

pytestmark = pytest.mark.usefixtures("spark")


def test_fuzzy_self_join_blocks_and_verifies(spark):
    df = spark.createDataFrame(
        [(1, "cold widget"), (2, "bold widget"), (3, "cold gadget"),
         (4, "warm widget"), (5, "cold widget")],
        "id long, name string")
    got = {(r["id_a"], r["id_b"]): r["dist"]
           for r in fuzzy_self_join(df, "id", "name",
                                    last_token("name"), max_dist=2).collect()}
    # widget block: (1,2) dist 1; (1,4) dist 3 -> excluded; (2,4) dist 3
    # -> excluded; (1,5) dist 0; (2,5) dist 1. gadget block: singleton.
    assert got == {(1, 2): 1, (1, 5): 0, (2, 5): 1}


def test_fuzzy_self_join_never_crosses_blocks(spark):
    # identical names in different blocks are never compared
    df = spark.createDataFrame(
        [(1, "abc xx"), (2, "abc yy")], "id long, name string")
    assert fuzzy_self_join(df, "id", "name", last_token("name"),
                           max_dist=10).count() == 0


def test_fuzzy_join_two_tables(spark):
    left = spark.createDataFrame([(1, "acme corp"), (2, "zeta corp")],
                                 "lid long, lname string")
    right = spark.createDataFrame([(10, "acme corp"), (11, "acne corp"),
                                   (12, "beta corp")],
                                  "rid long, rname string")
    got = {(r["lid"], r["rid"]): r["dist"]
           for r in fuzzy_join(left, right, "lid", "rid", "lname", "rname",
                               last_token("lname"), last_token("rname"),
                               max_dist=1).collect()}
    # zeta->beta is a single substitution, so (2, 12) matches too
    assert got == {(1, 10): 0, (1, 11): 1, (2, 12): 1}


def _tri(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r["node"]: r["n_triangles"]
            for r in triangle_count(df).collect()}


def test_triangle_k4(spark):
    # K4: 4 triangles, every node in exactly 3
    edges = [(a, b) for a in range(4) for b in range(4) if a < b]
    got = _tri(spark, edges)
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangle_duplicates_directions_selfloops_ignored(spark):
    edges = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 1), (2, 3)]
    got = _tri(spark, edges)
    assert got == {1: 1, 2: 1, 3: 1}


def test_triangle_free_graph_zeroes(spark):
    got = _tri(spark, [(1, 2), (2, 3), (3, 4)])  # path: no triangles
    assert got == {1: 0, 2: 0, 3: 0, 4: 0}


def test_soundex_blocker_pairs_soundalikes(spark):
    from ai_incident_analyst_spark.operators.linkage import (
        fuzzy_self_join,
        soundex_blocker,
    )
    df = spark.createDataFrame(
        [(1, "smith"), (2, "smyth"), (3, "jones")], "id long, name string")
    got = {(r["id_a"], r["id_b"]): r["dist"]
           for r in fuzzy_self_join(df, "id", "name",
                                    soundex_blocker("name"),
                                    max_dist=2).collect()}
    assert got == {(1, 2): 1}


def test_sorted_neighborhood_window(spark):
    from pyspark.sql import functions as F
    from ai_incident_analyst_spark.operators.linkage import (
        sorted_neighborhood_pairs,
    )
    # sorted by name: abc1, abc2, abd9, xyz — window 2 compares only
    # adjacent rows in sort order
    df = spark.createDataFrame(
        [(1, "abc1"), (2, "abc2"), (3, "abd9"), (4, "xyzq")],
        "id long, name string")
    got = {(r["id_a"], r["id_b"]): r["dist"]
           for r in sorted_neighborhood_pairs(
               df, "id", "name", F.col("name"), window=2,
               max_dist=2).collect()}
    # adjacent: (1,2) dist 1; (2,3) dist 2; (3,4) dist 4 -> out
    assert got == {(1, 2): 1, (2, 3): 2}
    # window 3 additionally compares (1,3): b->d and 1->9 = dist 2
    got3 = {(r["id_a"], r["id_b"]): r["dist"]
            for r in sorted_neighborhood_pairs(
                df, "id", "name", F.col("name"), window=3,
                max_dist=2).collect()}
    assert got3 == {(1, 2): 1, (2, 3): 2, (1, 3): 2}


def test_graph_stats_k4(spark):
    from ai_incident_analyst_spark.operators.graph import graph_stats
    edges = [(a, b) for a in range(4) for b in range(4) if a < b]
    df = spark.createDataFrame(edges, "src long, dst long")
    r = graph_stats(df).first()
    # K4: 4 nodes, 6 edges, deg 3 each -> 4*3 = 12 wedges, 4 triangles,
    # clustering = 3*4/12 = 1.0
    assert (r["n_nodes"], r["n_edges"], r["max_degree"]) == (4, 6, 3)
    assert r["n_wedges"] == 12
    assert r["n_triangles"] == 4
    assert r["global_clustering_1e6"] == 1000000


def test_graph_stats_triangle_free(spark):
    from ai_incident_analyst_spark.operators.graph import graph_stats
    df = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    r = graph_stats(df).first()
    assert r["n_triangles"] == 0
    assert r["n_wedges"] == 1
    assert r["global_clustering_1e6"] == 0


def test_fuzzy_self_join_respects_non_text_blocker(spark):
    """Identical texts in DIFFERENT blocks must neither pair across
    blocks nor duplicate same-block pairs (review finding)."""
    from pyspark.sql import functions as F
    from ai_incident_analyst_spark.operators.linkage import fuzzy_self_join
    df = spark.createDataFrame(
        [(1, "acme corp", "east"), (2, "acme corp", "west"),
         (3, "acme corp", "east"), (4, "acme corp", "west")],
        "id long, name string, region string")
    got = sorted((r["id_a"], r["id_b"], r["dist"])
                 for r in fuzzy_self_join(df, "id", "name",
                                          F.col("region"),
                                          max_dist=2).collect())
    # only within-region pairs, each exactly once
    assert got == [(1, 3, 0), (2, 4, 0)]


def test_jaro_winkler_reference_values():
    from ai_incident_analyst_spark.operators.linkage import jaro_winkler
    # canonical textbook values
    assert jaro_winkler("MARTHA", "MARHTA") == pytest.approx(0.9611, abs=1e-4)
    assert jaro_winkler("DIXON", "DICKSONX") == pytest.approx(0.8133, abs=1e-4)
    assert jaro_winkler("abc", "abc") == 1.0
    assert jaro_winkler("abc", "xyz") == 0.0
    assert jaro_winkler("", "abc") == 0.0


def test_jaro_winkler_matches_duckdb():
    import random
    import string

    import duckdb

    from ai_incident_analyst_spark.operators.linkage import jaro_winkler
    rng = random.Random(4)
    words = ["".join(rng.choices(string.ascii_lowercase,
                                 k=rng.randint(1, 14))) for _ in range(40)]
    con = duckdb.connect()
    for i in range(0, 40, 2):
        a, b = words[i], words[i + 1]
        d = con.execute("select jaro_winkler_similarity(?, ?)",
                        [a, b]).fetchone()[0]
        assert jaro_winkler(a, b) == pytest.approx(d, abs=1e-12), (a, b)


def test_jaro_winkler_pairs_blocked(spark):
    from pyspark.sql import functions as F

    from ai_incident_analyst_spark.operators.linkage import (
        jaro_winkler_pairs,
        last_token,
    )
    df = spark.createDataFrame(
        [(1, "green metallic box"), (2, "green metalic box"),
         (3, "red metallic box"), (4, "blue shiny sphere"),
         (5, "green metallic box")],
        "id long, name string")
    out = {(r["id_a"], r["id_b"]): r["jw"]
           for r in jaro_winkler_pairs(df, "id", "name",
                                       last_token("name"),
                                       threshold=0.9).collect()}
    assert out[(1, 5)] == 1.0                   # exact duplicates
    assert (1, 2) in out and out[(1, 2)] >= 0.9  # near-duplicate spelling
    assert (2, 5) in out
    assert all(a < b for a, b in out)
    # cross-block pair (sphere vs box) never compared
    assert not any(4 in p for p in out)


def test_jw_length_prefilter_is_lossless(spark):
    """The threshold-derived length-ratio prefilter must drop only pairs
    that provably cannot reach the threshold: brute-force JW over all
    pairs (no filter path, threshold=0) agrees with the filtered
    operator at threshold .9."""
    from ai_incident_analyst_spark.operators.linkage import (
        jaro_winkler,
        jaro_winkler_pairs,
    )

    names = ["midnight blue lace", "midnight blue lance",
             "mid", "midnight blue lace extra words making it long",
             "aquamarine dust", "aquamarine rust"]
    rows = [(i, t) for i, t in enumerate(names)]
    df = spark.createDataFrame(rows, "pid long, name string")
    got = {(r["id_a"], r["id_b"]): r["jw"]
           for r in jaro_winkler_pairs(df, "pid", "name",
                                       F.lit("all"),
                                       threshold=0.9).collect()}
    want = {}
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            jw = round(jaro_winkler(names[i], names[j]), 6)
            if jw >= 0.9:
                want[(i, j)] = jw
    assert got == want
    # sanity: the fixture includes a pair the bound actually prunes
    assert (2, 3) not in want and len(want) >= 2


def test_jw_batch_char_multiset_prune_is_lossless():
    """_jw_batch (r13: vectorized char-multiset upper-bound prune ahead
    of the python kernel) must agree with per-pair jaro_winkler on every
    pair that can reach the threshold — including equal strings, empty
    strings, repeated-char multisets, and values exactly at the rounding
    boundary — and may differ only on pairs both sides drop."""
    import random
    import string

    import pandas as pd

    from ai_incident_analyst_spark.operators.linkage import (
        _jw_batch,
        jaro_winkler,
    )

    rng = random.Random(13)
    vocab = ["almond", "antique", "azure", "beige", "bisque", "blanched",
             "blue", "blush", "brown", "burlywood"]
    texts = [" ".join(rng.choices(vocab, k=rng.randint(1, 6)))
             for _ in range(120)]
    texts += ["", "", "aaa", "aab", "aba", "ab", "ba",
              "almond azure", "azure almond"]
    pairs = [(rng.choice(texts), rng.choice(texts)) for _ in range(4000)]
    a = pd.Series([p[0] for p in pairs])
    b = pd.Series([p[1] for p in pairs])
    for threshold in (0.9, 0.7, 0.0):
        got = _jw_batch(a, b, threshold, 6)
        for i, (x, y) in enumerate(pairs):
            exact = jaro_winkler(x, y)
            if round(exact, 6) >= threshold:
                assert got[i] == exact, (x, y, threshold)
            else:
                assert round(got[i], 6) < threshold, (x, y, threshold)


def test_jw_batch_null_texts():
    """r13 ADVICE: None in the batch crashed np.unique (object array
    mixing None and str is unsortable). Defined behavior now: null==null
    pairs score 1.0 (the old per-pair kernel's None==None path),
    null-vs-anything-else (including null-vs-empty-string) scores 0.0,
    and no null ever reaches the interpreted kernel — at EVERY
    threshold, including ones low enough to disable the prune."""
    import pandas as pd

    from ai_incident_analyst_spark.operators.linkage import _jw_batch

    a = pd.Series([None, None, None, "azure", "", "azure", None])
    b = pd.Series([None, "azure", "", None, None, "azure", None])
    for threshold in (0.9, 0.5, 0.0):
        got = _jw_batch(a, b, threshold, 6)
        assert list(got) == [1.0, 0.0, 0.0, 0.0, 0.0, 1.0, 1.0], threshold


# ---------------------------------------------------------------------------
# SymSpell deletion-blocked spell suggestion (round 8)
# ---------------------------------------------------------------------------

def test_spell_suggest_basic_and_ties(spark):
    from ai_incident_analyst_spark.operators.linkage import spell_suggest

    rows = [
        ("spark", 100), ("shark", 100), ("stark", 40),
        ("table", 80), ("cable", 80),
        ("sark", 1),      # deletion of both spark and shark: freq tie ->
                          # alphabetical: shark
        ("tble", 1),      # deletion of table AND cable (sub at pos 1 vs 1)?
                          # lev(tble,table)=1 (insert a), lev(tble,cable)=2
        ("zzzz", 1),      # no candidate -> dropped
        ("sparkk", 1),    # insertion -> spark
        ("spbrk", 1),     # substitution -> spark
    ]
    df = spark.createDataFrame(rows, "w string, f long")
    got = {r["word"]: (r["suggestion"], r["suggestion_freq"])
           for r in spell_suggest(df, "w", "f", min_vocab_freq=5,
                                  max_unknown_freq=1).collect()}
    assert got["sark"] == ("shark", 100)     # tie: freq equal, 'shark'<'spark'
    assert got["tble"] == ("table", 80)
    assert got["sparkk"] == ("spark", 100)
    assert got["spbrk"] == ("spark", 100)
    assert "zzzz" not in got
    # vocab words never appear as corrections targets of themselves
    assert "spark" not in got


def test_spell_suggest_matches_bruteforce(spark):
    from ai_incident_analyst_spark.operators.linkage import spell_suggest

    vocab = ["merge", "query", "table", "spark", "shard", "short",
             "float", "group"]
    unknowns = ["merg", "qery", "tble", "spak", "shart", "flot",
                "xxxx", "groupp", "sharde"]
    rows = [(w, 50) for w in vocab] + [(w, 1) for w in unknowns]
    df = spark.createDataFrame(rows, "w string, f long")
    got = {r["word"]: r["suggestion"]
           for r in spell_suggest(df, "w", "f", min_vocab_freq=5,
                                  max_unknown_freq=1).collect()}

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                         prev + (ca != cb))
        return dp[len(b)]

    want = {}
    for u in unknowns:
        cands = sorted((w for w in vocab if lev(u, w) == 1))
        if cands:
            want[u] = cands[0]   # all vocab freq equal: alphabetical
    assert got == want


def test_spell_suggest_rejects_overlapping_bands(spark):
    from ai_incident_analyst_spark.operators.linkage import spell_suggest

    df = spark.createDataFrame([("a", 3)], "w string, f long")
    with pytest.raises(ValueError):
        spell_suggest(df, "w", "f", min_vocab_freq=2, max_unknown_freq=2)


def test_spell_suggest_transposition_vs_deletion_ties(spark):
    """Candidate-generation edge cases (r9 fixture hardening): a
    TRANSPOSITION shares a deletion variant with its source (so the
    equi-join admits it) but is levenshtein 2 — the verify must reject
    it; a typo explainable as deletion-of-A AND transposition-of-B must
    keep only the true distance-1 explanation; equal-char
    transpositions collapse to the word itself and are never unknowns."""
    from ai_incident_analyst_spark.operators.linkage import spell_suggest

    rows = [
        ("hello", 50), ("batch", 50), ("stream", 50),
        # pure transposition of 'hello' (swap l<->e): lev=2, candidate
        # via shared deletion variant 'helo' -> must produce NO row
        ("hlelo", 1),
        # 'bath': deletion of batch (lev 1) -- suggestible even though
        # it is ALSO two edits from other vocab words
        ("bath", 1),
        # transposition of 'stream' (swap r<->e): lev=2 -> no row
        ("steram", 1),
        # deletion of 'stream' -> row
        ("steam", 1),
    ]
    df = spark.createDataFrame(rows, "w string, f long")
    got = {r["word"]: (r["suggestion"], r["suggestion_freq"])
           for r in spell_suggest(df, "w", "f", min_vocab_freq=5,
                                  max_unknown_freq=1).collect()}
    assert "hlelo" not in got        # transposition rejected by verify
    assert "steram" not in got
    assert got["bath"] == ("batch", 50)
    assert got["steam"] == ("stream", 50)


def test_spell_suggest_freq_beats_alphabetical(spark):
    """Frequency rules; suggestion asc only breaks EQUAL frequencies."""
    from ai_incident_analyst_spark.operators.linkage import spell_suggest

    rows = [("tible", 90), ("table", 40), ("tble", 1)]
    df = spark.createDataFrame(rows, "w string, f long")
    got = {r["word"]: (r["suggestion"], r["suggestion_freq"])
           for r in spell_suggest(df, "w", "f", min_vocab_freq=5,
                                  max_unknown_freq=1).collect()}
    # 'tble' is distance 1 from BOTH table (insert a) and tible
    # (insert i); tible wins on frequency even though table < tible
    # alphabetically
    assert got["tble"] == ("tible", 90)


def test_fellegi_sunter_weights_and_bands(spark):
    """Hand-checked weights: fixed fold of log2 constants selected by
    booleans; thresholds route to match/possible/non_match."""
    import math

    from ai_incident_analyst_spark.operators.linkage import (
        fellegi_sunter,
    )

    params = {"a_eq": (0.9, 0.01), "b_eq": (0.8, 0.2)}
    wa, da = math.log2(0.9 / 0.01), math.log2(0.1 / 0.99)
    wb, db = math.log2(0.8 / 0.2), math.log2(0.2 / 0.8)
    rows = [(1, True, True), (2, True, False),
            (3, False, True), (4, False, False)]
    df = spark.createDataFrame(rows, "pid long, a_eq boolean, b_eq boolean")
    out = {r["pid"]: (r["weight"], r["decision"])
           for r in fellegi_sunter(df, params, upper=7.0,
                                   lower=-2.0).collect()}
    import pytest as pt
    assert out[1][0] == pt.approx(round(wa + wb, 6), abs=1e-9)
    assert out[1][1] == "match"          # 6.49 + 2 = 8.49 >= 7
    assert out[2][0] == pt.approx(round(wa + db, 6), abs=1e-9)
    assert out[2][1] == "possible"       # 6.49 - 2 = 4.49
    assert out[4][1] == "non_match"      # -3.31 - 2 = -5.31 <= -2
    with pt.raises(ValueError):
        fellegi_sunter(df, {}, 1.0, 0.0)
    with pt.raises(ValueError):
        fellegi_sunter(df, params, upper=-5.0, lower=0.0)
    with pt.raises(ValueError):
        fellegi_sunter(df, {"a_eq": (1.0, 0.5)}, 1.0, 0.0)


def test_fellegi_sunter_null_agreement_is_neutral(spark):
    """A NULL agreement boolean (missing comparison) contributes the
    standard NEUTRAL weight 0.0 — not the disagreement weight
    (ADVICE r9)."""
    import math

    import pytest as pt

    from ai_incident_analyst_spark.operators.linkage import (
        fellegi_sunter,
    )

    params = {"a_eq": (0.9, 0.01), "b_eq": (0.8, 0.2)}
    wa = math.log2(0.9 / 0.01)
    wb, db = math.log2(0.8 / 0.2), math.log2(0.2 / 0.8)
    rows = [(1, True, None), (2, None, None), (3, None, False)]
    df = spark.createDataFrame(rows, "pid long, a_eq boolean, b_eq boolean")
    out = {r["pid"]: r["weight"]
           for r in fellegi_sunter(df, params, upper=7.0,
                                   lower=-2.0).collect()}
    assert out[1] == pt.approx(round(wa, 6), abs=1e-9)   # NULL b -> +0
    assert out[2] == 0.0                                 # all NULL
    assert out[3] == pt.approx(round(db, 6), abs=1e-9)   # explicit False


def test_sorted_neighborhood_jw_pairs_window_semantics(spark):
    """Candidates are exactly each row vs its next window-1 ranks in
    (sort_key, id) order; the Arrow verifier scores equal the pure-
    Python jaro_winkler reference; candidate volume is O(n*window) by
    construction (the scale-safe alternative to key blocking)."""
    import pytest as pt

    from ai_incident_analyst_spark.operators.linkage import (
        jaro_winkler,
        sorted_neighborhood_jw_pairs,
    )

    names = [(1, "martha"), (2, "marhta"), (3, "michael"),
             (4, "michelle"), (5, "zebra")]
    df = spark.createDataFrame(names, "pid long, name string")
    out = {(r["id_a"], r["id_b"]): r["jw"]
           for r in sorted_neighborhood_jw_pairs(
               df, "pid", "name", F.col("name"), window=3,
               threshold=0.8).collect()}
    # sort order: marhta(2) martha(1) michael(3) michelle(4) zebra(5)
    # window=3 candidate pairs: (2,1)(2,3)(1,3)(1,4)(3,4)(3,5)(4,5)
    expect = {}
    order = [2, 1, 3, 4, 5]
    texts = dict(names)
    for i, a in enumerate(order):
        for b in order[i + 1:i + 3]:
            jw = round(jaro_winkler(texts[a], texts[b]), 6)
            if jw >= 0.8:
                expect[(a, b)] = jw
    assert out == expect
    assert (2, 1) in out and out[(2, 1)] == pt.approx(0.961111, abs=1e-6)
    assert (3, 4) in out                     # michael/michelle ~ 0.921
    # far-apart ranks are never candidates even if similar
    assert (1, 5) not in out and (2, 5) not in out
