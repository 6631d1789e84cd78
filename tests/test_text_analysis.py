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
