"""Tolerant file-format readers beyond parquet.

Reference parity: the history store is a JSON file the reference rewrites
whole (``src/main.py:88-92``) and reloads per dashboard request
(``src/dashboard/app.py:16``); ops teams also drop CSV exports next to
it. These readers make malformed rows a DATA problem (captured in a
column, countable, quarantinable) instead of a job failure — at 100 TB
one corrupt line must never kill an ingest.

Both return the data plus a ``_corrupt_record`` column: null for clean
rows, the raw offending line otherwise (Spark PERMISSIVE mode wired
explicitly). ``split_corrupt`` separates the two streams so pipelines
can land quarantine files alongside clean ones.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def _with_corrupt_field(schema: T.StructType) -> T.StructType:
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return T.StructType(list(schema.fields)
                        + [T.StructField(CORRUPT_COL, T.StringType())])


def read_json_tolerant(spark: SparkSession, path: str,
                       schema: T.StructType) -> DataFrame:
    """JSON-lines reader that never throws on bad rows: PERMISSIVE mode
    with an explicit corrupt-record column (Spark silently drops corrupt
    rows on some paths unless the column is in the schema — wiring it
    explicitly makes the behavior contractual)."""
    return (
        spark.read.schema(_with_corrupt_field(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def read_csv_tolerant(spark: SparkSession, path: str,
                      schema: T.StructType, header: bool = True,
                      delimiter: str = ",") -> DataFrame:
    """CSV reader with the same corrupt-record contract (type mismatches
    and ragged rows land in ``_corrupt_record``, not in an exception)."""
    return (
        spark.read.schema(_with_corrupt_field(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", str(header).lower())
        .option("delimiter", delimiter)
        .csv(path)
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean_rows_without_corrupt_col, quarantine_rows) — the standard
    ingest fork: clean rows continue the pipeline, quarantine rows land
    in a side table for inspection/replay.

    The frame is cached first: Spark refuses corrupt-column-only queries
    straight off a raw file scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN — the
    parser would have to re-run just to rebuild the raw line), and both
    forks consume the same parse anyway. The cache is session-scoped: a
    loop ingesting many files should release it after consuming both
    forks — use the ``corrupt_split`` context manager (releases on exit)
    or pass a fork to ``release_split``. NB: the release marker rides on
    the exact DataFrame objects returned here; derived frames
    (``clean.select(...)`` etc.) don't carry it, and ``release_split``
    RAISES on a frame without one rather than silently leaking the cache.
    """
    cached = df.cache()
    clean = cached.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = cached.filter(F.col(CORRUPT_COL).isNotNull())
    # let either fork release the shared parent cache
    clean._split_corrupt_parent = cached  # type: ignore[attr-defined]
    bad._split_corrupt_parent = cached    # type: ignore[attr-defined]
    return clean, bad


def release_split(fork: DataFrame) -> None:
    """Unpersist the cached parse behind a ``split_corrupt`` fork — call
    once both forks have been consumed (idempotent on the parent cache).

    Raises ``ValueError`` when given a frame that is not one of the two
    objects ``split_corrupt`` returned: a derived frame (``.select``/
    ``.filter``/``.withColumn`` fork) has no release marker, and a
    silent no-op here would leak one cached parse per file in an ingest
    loop — the failure mode this guard exists to surface.
    """
    parent = getattr(fork, "_split_corrupt_parent", None)
    if parent is None:
        raise ValueError(
            "release_split needs one of the exact DataFrames returned by "
            "split_corrupt (derived frames don't carry the cache marker); "
            "keep a reference to the original fork, or use the "
            "corrupt_split context manager")
    parent.unpersist()


@contextmanager
def corrupt_split(df: DataFrame):
    """``with corrupt_split(read_json_tolerant(...)) as (clean, bad):`` —
    the loop-safe form of ``split_corrupt``: the shared cached parse is
    unpersisted on exit no matter how the body leaves, so an ingest loop
    over many files cannot accumulate session-lifetime caches."""
    clean, bad = split_corrupt(df)
    try:
        yield clean, bad
    finally:
        release_split(clean)
