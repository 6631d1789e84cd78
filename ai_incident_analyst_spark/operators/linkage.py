"""Entity resolution: blocked fuzzy self/two-table joins.

The reference dedups only on exact keys (``src/preprocessing/
preprocessor.py:30-42``); record linkage — "are these two rows the same
real-world entity?" — is the classic data-cleaning extension every
curation pipeline needs (supplier/customer master-data matching, near-
identical product titles, author disambiguation).

Physical design — the textbook blocking+verification shape (the same
two-phase skeleton as MinHash-LSH dedup, with an edit-distance verifier
instead of Jaccard):

- **Block**: an equi-join on a caller-supplied cheap key expression
  (phonetic code, token, sorted-prefix). This is what turns the O(n²)
  all-pairs comparison into Σ|block|² — the only formulation that
  survives 100 TB. The block key join is a plain keyed shuffle; a hot
  block (everyone named "Smith") is AQE skew-split.
- **Verify**: exact Levenshtein inside the block, JVM-side
  (``F.levenshtein`` — integer-exact, so results are engine-portable and
  an independent SQL twin hash-matches them).

Self-join mode emits each unordered pair once (``id_a < id_b``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def last_token(col: Column | str, delim: str = " ") -> Column:
    """A cheap blocker: the last delimiter-separated token (for
    adjective–noun product names, the noun)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.element_at(F.split(c, delim), -1)


def fuzzy_self_join(df: DataFrame, id_col: str, text_col: str,
                    blocker: Column, max_dist: int = 2) -> DataFrame:
    """All unordered row pairs whose block keys match and whose
    ``text_col`` edit distance is ≤ ``max_dist``:
    ``(id_a, id_b, text_a, text_b, dist)``.
    """
    side = df.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("txt"),
        blocker.alias("blk"),
    )
    a, b = side.alias("a"), side.alias("b")
    return (
        a.join(b, (F.col("a.blk") == F.col("b.blk"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                F.col("a.txt").alias("text_a"), F.col("b.txt").alias("text_b"),
                F.levenshtein(F.col("a.txt"), F.col("b.txt")).alias("dist"))
        .filter(F.col("dist") <= max_dist)
    )


def fuzzy_join(left: DataFrame, right: DataFrame,
               left_id: str, right_id: str,
               left_text: str, right_text: str,
               left_blocker: Column, right_blocker: Column,
               max_dist: int = 2) -> DataFrame:
    """Two-table linkage: ``(left_id, right_id, dist)`` for block-key
    matches within edit distance ``max_dist``. Use a deterministic
    post-rule (min dist, tie → min right id) to pick one match per left
    row if a 1:1 linkage is needed.
    """
    l_ = left.select(F.col(left_id).alias("lid"),
                     F.col(left_text).alias("ltxt"),
                     left_blocker.alias("blk"))
    r_ = right.select(F.col(right_id).alias("rid"),
                      F.col(right_text).alias("rtxt"),
                      right_blocker.alias("blk"))
    return (
        l_.join(r_, "blk")
        .select("lid", "rid",
                F.levenshtein(F.col("ltxt"), F.col("rtxt")).alias("dist"))
        .filter(F.col("dist") <= max_dist)
        .select(F.col("lid").alias(left_id), F.col("rid").alias(right_id),
                "dist")
    )
