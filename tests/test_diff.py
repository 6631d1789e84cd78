"""table_diff / diff_summary: hand-computed change sets."""

import pytest

from ai_incident_analyst_spark.operators.diff import diff_summary, table_diff

pytestmark = pytest.mark.usefixtures("spark")


def test_diff_classifies_all_changes(spark):
    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", None)],
        "k long, s string, v double")
    new = spark.createDataFrame(
        [(1, "a", 1.0), (2, "B", 2.0), (4, "d", 4.0)],
        "k long, s string, v double")
    got = {r["k"]: r["change"] for r in table_diff(old, new, ["k"]).collect()}
    assert got == {2: "changed", 3: "removed", 4: "added"}


def test_diff_null_safe_comparison(spark):
    # NULL == NULL must be "unchanged", NULL vs value must be "changed"
    old = spark.createDataFrame([(1, None), (2, None)], "k long, v double")
    new = spark.createDataFrame([(1, None), (2, 5.0)], "k long, v double")
    got = {r["k"]: r["change"] for r in table_diff(old, new, ["k"]).collect()}
    assert got == {2: "changed"}


def test_diff_identical_is_empty(spark):
    df = spark.createDataFrame([(1, "x"), (2, "y")], "k long, s string")
    assert table_diff(df, df, ["k"]).count() == 0


def test_diff_summary_counts(spark):
    old = spark.createDataFrame([(i, i * 1.0) for i in range(10)],
                                "k long, v double")
    new = spark.createDataFrame(
        [(i, i * 1.0 if i % 3 else -1.0) for i in range(2, 12)],
        "k long, v double")
    got = {r["change"]: r["n"]
           for r in diff_summary(old, new, ["k"]).collect()}
    # removed: 0,1; added: 10,11; changed among 2..9 where i%3==0: 3,6,9
    # (k=10, 11 are added, not changed even though 10%3!=0)
    assert got == {"removed": 2, "added": 2, "changed": 3}


def test_diff_schema_mismatch_raises(spark):
    a = spark.createDataFrame([(1, "x")], "k long, s string")
    b = spark.createDataFrame([(1, 2.0)], "k long, v double")
    with pytest.raises(ValueError, match="schemas differ"):
        table_diff(a, b, ["k"])


def test_schema_diff_reports_drift(spark):
    from ai_incident_analyst_spark.operators.diff import schema_diff
    a = spark.createDataFrame([(1, "x", 2.0)], "k long, s string, v double")
    b = spark.createDataFrame([(1, 3, True)], "k long, s int, b boolean")
    got = {(r["column"], r["change"]): (r["old_type"], r["new_type"])
           for r in schema_diff(a, b).collect()}
    assert got == {
        ("v", "removed"): ("double", None),
        ("b", "added"): (None, "boolean"),
        ("s", "type_changed"): ("string", "int"),
    }
    assert schema_diff(a, a).count() == 0
