"""Tolerant JSON/CSV sources: corrupt rows are captured, never fatal."""

import pytest
from pyspark.sql import types as T

from ai_incident_analyst_spark.sources.formats import (
    CORRUPT_COL,
    corrupt_split,
    read_csv_tolerant,
    read_json_tolerant,
    release_split,
    split_corrupt,
)

SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("msg", T.StringType()),
])


def test_json_tolerant_captures_corrupt(spark, tmp_path):
    p = str(tmp_path / "in.jsonl")
    with open(p, "w") as f:
        f.write('{"id": 1, "msg": "ok"}\n')
        f.write('{"id": oops not json\n')
        f.write('{"id": 2, "msg": "also ok"}\n')
    df = read_json_tolerant(spark, p, SCHEMA)
    clean, bad = split_corrupt(df)
    assert {r.id for r in clean.collect()} == {1, 2}
    assert CORRUPT_COL not in clean.columns
    bad_rows = bad.collect()
    assert len(bad_rows) == 1
    assert "oops" in bad_rows[0][CORRUPT_COL]


def test_csv_tolerant_captures_type_mismatch(spark, tmp_path):
    p = str(tmp_path / "in.csv")
    with open(p, "w") as f:
        f.write("id,msg\n1,hello\nNOT_A_NUMBER,world\n2,bye\n")
    df = read_csv_tolerant(spark, p, SCHEMA)
    clean, bad = split_corrupt(df)
    assert {r.id for r in clean.collect()} == {1, 2}
    assert len(bad.collect()) == 1


def test_json_all_clean_roundtrip(spark, tmp_path):
    src = spark.createDataFrame([(i, f"m{i}") for i in range(50)],
                                "id long, msg string")
    p = str(tmp_path / "rt")
    src.write.json(p)
    clean, bad = split_corrupt(read_json_tolerant(spark, p, SCHEMA))
    assert clean.count() == 50 and bad.count() == 0


def test_release_split_lifecycle(spark, tmp_path):
    """corrupt_split unpersists the shared parse on exit; release_split
    on a derived frame raises instead of silently leaking the cache."""
    src = spark.createDataFrame([(1, "a"), (2, "b")], "id long, msg string")
    p = str(tmp_path / "rt2")
    src.write.json(p)
    with corrupt_split(read_json_tolerant(spark, p, SCHEMA)) as (clean, bad):
        assert clean.count() == 2 and bad.count() == 0
        parent = clean._split_corrupt_parent
        assert parent.storageLevel.useMemory  # cached inside the block
    assert not parent.storageLevel.useMemory  # released on exit
    clean2, _bad2 = split_corrupt(read_json_tolerant(spark, p, SCHEMA))
    derived = clean2.select("id")  # fork without the release marker
    with pytest.raises(ValueError, match="split_corrupt"):
        release_split(derived)
    release_split(clean2)  # the original fork still releases fine
