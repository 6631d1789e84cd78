"""Text-analysis operator tests with hand-computed expectations."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from ai_incident_analyst_spark.operators.text_analysis import (
    analyze,
    fingerprint,
    lang_id,
    quality_score,
    token_count,
)


def _one(spark, col, **rows):
    return spark.createDataFrame([Row(**rows)]).select(col.alias("o")).first().o


def test_token_count(spark):
    assert _one(spark, token_count(F.col("t")), t="a b  c") == 3
    assert _one(spark, token_count(F.col("t")), t="   ") == 0
    assert _one(spark, token_count(F.col("t")), t="one") == 1


def test_quality_score_range(spark, sf_dir):
    from ai_incident_analyst_spark.sources.tables import load_table
    docs = load_table(spark, sf_dir, "documents")
    mm = docs.select(quality_score("text").alias("q")) \
        .agg(F.min("q"), F.max("q")).first()
    assert 0.0 <= mm[0] <= mm[1] <= 1.0


def test_lang_id(spark):
    assert _one(spark, lang_id(F.col("t")), t="the cat and the dog is here") == "en"
    assert _one(spark, lang_id(F.col("t")), t="el perro de la casa que ladra") == "es"
    assert _one(spark, lang_id(F.col("t")), t="der hund und die katze ist da") == "de"
    assert _one(spark, lang_id(F.col("t")), t="xyz qwerty") == "und"


def test_fingerprint_normalization(spark):
    a = _one(spark, fingerprint(F.col("t")), t="Hello,   World!")
    b = _one(spark, fingerprint(F.col("t")), t="hello world")
    assert a == b
    c = _one(spark, fingerprint(F.col("t")), t="different text")
    assert a != c


def test_analyze_attaches_all(spark, sf_dir):
    from ai_incident_analyst_spark.sources.tables import load_table
    docs = load_table(spark, sf_dir, "documents").limit(5)
    out = analyze(docs)
    assert {"token_count", "quality", "lang_pred", "fingerprint"} <= set(out.columns)
    assert out.count() == 5


def test_bpe_token_count_examples(spark):
    from ai_incident_analyst_spark.operators.text_analysis import bpe_token_count
    rows = spark.createDataFrame(
        [("Hello world, it's 42 tokens!",), ("",), ("   ",), ("a.b,c",)],
        "t string",
    ).select(bpe_token_count("t").alias("n")).collect()
    # "Hello"," world",","," it","'s"," 42"," tokens","!" -> 8
    assert [r.n for r in rows] == [8, 0, 0, 5]


def test_winnow_fingerprints_match_python_reference(spark, sf_dir):
    """Value-level self-oracle: engine winnowing == reference winnowing
    applied in Python to the engine's own k-gram hash arrays."""
    from ai_incident_analyst_spark.operators.text_analysis import (
        kgram_hashes,
        winnow_fingerprints,
    )
    from ai_incident_analyst_spark.sources.tables import load_table

    k, w = 9, 4
    docs = load_table(spark, sf_dir, "documents").limit(50)
    got = docs.select(
        "doc_id",
        kgram_hashes("text", k).alias("h"),
        winnow_fingerprints("text", k, w).alias("fp"),
    ).collect()
    assert len(got) == 50
    for r in got:
        hashes = r.h
        m = len(hashes) - w + 1
        assert m > 0  # corpus texts are long enough for real windows
        expect, seen = [], set()
        for i in range(m):
            v = min(hashes[i:i + w])
            if v not in seen:
                seen.add(v)
                expect.append(v)
        assert list(r.fp) == expect, r.doc_id


def test_winnow_shared_substring_guarantee(spark):
    """Any shared run of >= k+w-1 chars must yield a shared fingerprint."""
    from pyspark.sql import functions as F

    from ai_incident_analyst_spark.operators.text_analysis import (
        winnow_fingerprints,
    )
    shared = "the quick brown fox jumps over the lazy dog"
    df = spark.createDataFrame(
        [(1, "AAAA " + shared + " BBBB"), (2, "xyzzy " + shared + " qqqq")],
        "id long, t string",
    ).select("id", winnow_fingerprints("t", 9, 4).alias("fp"))
    a, b = [set(r.fp) for r in df.orderBy("id").collect()]
    assert a & b, "no shared fingerprint despite long shared substring"


def test_winnow_stats_matches_hof_form(spark):
    """The relational (posexplode + window-min) fast path must produce
    byte-identical stats to the HOF-array formulation, including the
    normalization (casefold + whitespace collapse) and both degenerate
    branches (text < k chars; fewer than w k-grams)."""
    from pyspark.sql import functions as F

    from ai_incident_analyst_spark.operators.text_analysis import (
        winnow_fingerprint_stats,
        winnow_fingerprints,
    )
    rows = [
        (1, "The quick   Brown fox JUMPS over the lazy dog repeatedly."),
        (2, "the quick brown fox jumps over the lazy dog repeatedly."),
        (3, "short"),                       # < k chars -> whole-text hash
        (4, "exactly9!"),                   # 1 k-gram, < w windows
        (5, "twelve chars"),                # few k-grams, < w windows
        (6, ""),                            # empty
        (7, "  \t  "),                      # blank after trim
        (8, "a much longer document " * 20),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fp = winnow_fingerprints("text", k=9, w=4)
    hof = df.select(
        "doc_id", F.size(fp).alias("n_fp"),
        F.array_min(fp).alias("fp_min"), F.array_max(fp).alias("fp_max"))
    fast = winnow_fingerprint_stats(df, "doc_id", "text", k=9, w=4)
    h = {r.doc_id: (r.n_fp, r.fp_min, r.fp_max) for r in hof.collect()}
    f_ = {r.doc_id: (r.n_fp, r.fp_min, r.fp_max) for r in fast.collect()}
    assert h == f_

    # the md5 hash scheme (oracle-portable registry variant) must hold the
    # same equivalence, and its values must be 60-bit non-negative ints
    fp_md5 = winnow_fingerprints("text", k=9, w=4, hash_fn="md5")
    hof_md5 = df.select(
        "doc_id", F.size(fp_md5).alias("n_fp"),
        F.array_min(fp_md5).alias("fp_min"),
        F.array_max(fp_md5).alias("fp_max"))
    fast_md5 = winnow_fingerprint_stats(df, "doc_id", "text", k=9, w=4,
                                        hash_fn="md5")
    h2 = {r.doc_id: (r.n_fp, r.fp_min, r.fp_max) for r in hof_md5.collect()}
    f2 = {r.doc_id: (r.n_fp, r.fp_min, r.fp_max) for r in fast_md5.collect()}
    assert h2 == f2
    assert h2 != h  # genuinely different hash scheme
    assert all(0 <= v[1] < (1 << 60) for v in h2.values())


def test_kgram_hashes_short_text(spark):
    """ADVICE r1: text shorter than k (incl. empty) must yield an EMPTY
    hash array, not two duplicate hashes of the clamped whole text."""
    from ai_incident_analyst_spark.operators.text_analysis import kgram_hashes
    df = spark.createDataFrame(
        [(0, "tiny"), (1, ""), (2, "exactly9!")], "i long, text string")
    rows = {r.i: r.h for r in
            df.select("i", kgram_hashes("text", k=9).alias("h")).collect()}
    assert rows[0] == []
    assert rows[1] == []
    assert len(rows[2]) == 1  # exactly k chars -> one gram


def test_winnow_short_text_fallback(spark):
    """Texts < k chars still get a non-empty winnow fingerprint via the
    whole-text-hash fallback (n==0 branch, live after the kgram fix)."""
    from ai_incident_analyst_spark.operators.text_analysis import (
        winnow_fingerprints,
    )
    df = spark.createDataFrame([(0, "tiny"), (1, "")], "i long, text string")
    rows = {r.i: r.f for r in
            df.select("i", winnow_fingerprints("text").alias("f")).collect()}
    assert len(rows[0]) == 1 and len(rows[1]) == 1


def test_c4_clean_rules(spark):
    """Public C4 rules: terminal punctuation, >=5 words, no javascript
    lines; pages with lorem ipsum / braces / <3 surviving lines die."""
    from ai_incident_analyst_spark.operators.text_analysis import c4_clean
    good = ("This is a perfectly fine sentence.\n"
            "Short line\n"                          # no punct, <5 words
            "Another good sentence with many words here.\n"
            "Please enable javascript to continue browsing.\n"  # js
            "And a third good sentence rounds the page out.")
    rows = [
        (1, good),
        (2, "Too few surviving lines here honestly.\nOnly one more line."),
        (3, good + "\nlorem ipsum dolor sit amet."),
        (4, good.replace("many words", "many {braced} words")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.cleaned for r in
           df.select("doc_id", c4_clean("text").alias("cleaned")).collect()}
    assert out[1] == ("This is a perfectly fine sentence.\n"
                      "Another good sentence with many words here.\n"
                      "And a third good sentence rounds the page out.")
    assert out[2] is None   # < 3 surviving lines
    assert out[3] is None   # lorem ipsum page kill
    assert out[4] is None   # brace page kill


def test_ngram_lm_score_matches_hand_computation(spark):
    """Tiny corpus where the bigram LM is computable by hand: uni a:3 b:2,
    T=5, bigrams (a,b):2 (b,a):1."""
    import math

    from ai_incident_analyst_spark.operators.text_analysis import (
        ngram_lm_score,
    )
    df = spark.createDataFrame(
        [(1, "A b, a!"), (2, "a B"), (3, "")], "doc_id long, text string")
    got = {r.doc_id: (r.n_tokens, r.bits_per_token)
           for r in ngram_lm_score(df, "doc_id", "text").collect()}
    d1 = -(math.log2(3 / 5) + math.log2(2 / 3) + math.log2(1 / 2)) / 3
    d2 = -(math.log2(3 / 5) + math.log2(2 / 3)) / 2
    assert got[1][0] == 3 and abs(got[1][1] - d1) < 1e-6
    assert got[2][0] == 2 and abs(got[2][1] - d2) < 1e-6
    assert 3 not in got  # empty docs emit no row


def test_profile_table_nulls_and_types(spark):
    from ai_incident_analyst_spark.operators.text_analysis import (
        profile_table,
    )
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b"), (None, "b")],
        "k long, v string")
    got = {r.column: r for r in profile_table(df).collect()}
    assert got["k"].n_rows == 4 and got["k"].n_nulls == 1
    assert got["k"].n_distinct == 3
    assert (got["k"].min_value, got["k"].max_value) == ("1", "3")
    assert got["v"].n_nulls == 1 and got["v"].n_distinct == 2
    assert (got["v"].min_value, got["v"].max_value) == ("a", "b")


def test_tag_keywords_boundaries_and_bigrams(spark):
    from ai_incident_analyst_spark.operators.text_analysis import (
        tag_keywords,
    )
    docs = spark.createDataFrame(
        [(1, "Broadcast HASH JOIN beats shuffle join here"),
         (2, "scanning and rescan are not matched"),  # substrings only
         (3, "hash value pairs and hash join")],
        "doc_id long, text string")
    vocab = spark.createDataFrame(
        [("hash join", "exec"), ("join", "exec"), ("scan", "exec"),
         ("hash value", "storage")], "term string, tag string")
    got = {(r.doc_id, r.tag): r.n_terms
           for r in tag_keywords(docs, "doc_id", "text", vocab).collect()}
    # doc1: 'hash join' + 'join' (distinct terms, case-insensitive)
    assert got[(1, "exec")] == 2
    # doc2: 'scan' appears only as substring of 'scanning' -> no word match
    assert (2, "exec") not in got
    assert got[(3, "exec")] == 2          # 'hash join' + 'join'
    assert got[(3, "storage")] == 1       # 'hash value'


# --- unicode normalization -------------------------------------------------

def test_normalize_unicode_cross_engine_parity(spark):
    """NFC + strip-accents must agree with DuckDB's nfc_normalize/
    strip_accents on real non-ASCII content — the proof the ASCII
    corpus oracle can't give."""
    import duckdb

    from ai_incident_analyst_spark.operators.text_analysis import (
        normalize_unicode,
    )

    texts = [
        "café",                 # composed é
        "café",                # decomposed e + combining acute
        "Über straße",     # Ü, ß
        "naïve résumé",
        "İstanbul ğüneş",
        None,
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i long, t string")
    got_nfc = {r["i"]: r["n"] for r in df.select(
        "i", normalize_unicode("t").alias("n")).collect()}
    got_strip = {r["i"]: r["n"] for r in df.select(
        "i", normalize_unicode("t", strip_accents=True).alias("n"))
        .collect()}
    con = duckdb.connect()
    for i, t in enumerate(texts):
        if t is None:
            assert got_nfc[i] is None and got_strip[i] is None
            continue
        want_nfc = con.execute(
            "SELECT nfc_normalize(?)", [t]).fetchone()[0]
        want_strip = con.execute(
            "SELECT strip_accents(nfc_normalize(?))", [t]).fetchone()[0]
        assert got_nfc[i] == want_nfc, f"NFC mismatch on {t!r}"
        assert got_strip[i] == want_strip, f"strip mismatch on {t!r}"


def test_normalize_unicode_dedups_composed_forms(spark):
    from ai_incident_analyst_spark.operators.text_analysis import (
        normalize_unicode,
    )
    df = spark.createDataFrame(
        [(1, "café"), (2, "café")], "i long, t string")
    out = df.select(normalize_unicode("t").alias("n")).distinct()
    assert out.count() == 1


def test_normalize_unicode_rejects_bad_form(spark):
    from ai_incident_analyst_spark.operators.text_analysis import (
        normalize_unicode,
    )
    import pytest as _pytest
    with _pytest.raises(ValueError):
        normalize_unicode("t", form="XXX")
