"""Vector column math (SURVEY.md §2.7 F20-F21) as higher-order functions.

Reference parity: squared-L2 distance implicit in FAISS ``IndexFlatL2``
(src/vector_db/faiss_db.py:43,54); float32 casts (faiss_db.py:40,53).

These are pure Catalyst expressions (zip_with/aggregate), so distance
evaluation happens JVM-side with no Python boundary. For large batched
matrix work the knn operator also offers an Arrow/numpy fast path
(operators/knn.py) — same math, BLAS-backed.

All math is done in double: float32 accumulation order differences
would make results nondeterministic across partitionings.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def to_double_array(col: Column | str) -> Column:
    """F20 analog: cast array<float> ↔ array<double> for stable math."""
    return _c(col).cast("array<double>")


def dot_product(a: Column | str, b: Column | str) -> Column:
    return F.aggregate(
        F.zip_with(to_double_array(a), to_double_array(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_sq(a: Column | str, b: Column | str) -> Column:
    """F21: squared-L2 distance — the IndexFlatL2 metric (faiss_db.py:43)."""
    return F.aggregate(
        F.zip_with(to_double_array(a), to_double_array(b),
                   lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column | str) -> Column:
    return F.sqrt(dot_product(a, a))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    return dot_product(a, b) / (norm(a) * norm(b))
