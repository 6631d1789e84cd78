"""Count-min sketch as a relational, cross-engine-reproducible structure.

A CMS answers "how often does key x occur?" within ε·N overcount using
d×w counters — the streaming/heavy-hitter sketch every large pipeline
keeps per window. Two design points make this one Spark-idiomatic and
oracle-checkable:

* **The sketch IS a DataFrame** ``(row, col, cnt)`` (d·w rows max), built
  with one explode + one groupBy — map-side combinable, mergeable across
  windows/partitions by construction (sum matching cells), no UDAF, no
  driver state.
* **Hash rows derive from md5**, which is bit-identical in Spark and
  DuckDB (unlike xxhash64) — so estimates, not just exact answers, are
  value-hash-verifiable against the oracle. h_i(key) = first 8 hex chars
  of md5(i || key) mod w.

At 100 TB the build is a scan + one shuffle of at most d·w·partitions
partial rows; estimation for a probe set is a broadcast join of the tiny
sketch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cms_col(key: Column, i: int, width: int) -> Column:
    """Row-i bucket of ``key``: md5 hex prefix as int, mod width."""
    h = F.md5(F.concat(F.lit(str(i)), F.lit("|"), key.cast("string")))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % width)


def cms_build(df: DataFrame, key_col: str, depth: int = 4,
              width: int = 1024) -> DataFrame:
    """Build the sketch: ``(row, col, cnt)`` with one explode + groupBy."""
    key = F.col(key_col)
    cells = F.array(*[
        F.struct(F.lit(i).alias("row"), _cms_col(key, i, width).alias("col"))
        for i in range(depth)
    ])
    return (
        df.select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.row").alias("row"), F.col("c.col").alias("col"))
        .agg(F.count("*").alias("cnt"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Sketches over disjoint data unions by summing matching cells —
    the property that lets per-window/per-partition sketches roll up."""
    return (
        a.unionByName(b)
        .groupBy("row", "col")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_estimate(sketch: DataFrame, probes: DataFrame, key_col: str,
                 depth: int = 4, width: int = 1024) -> DataFrame:
    """Point-estimate each probe key: min over its d cells (missing cell
    = 0). The sketch side is tiny (≤ d·w rows) and broadcast; the probe
    set is never shuffled."""
    key = F.col(key_col)
    cells = F.array(*[
        F.struct(F.lit(i).alias("row"), _cms_col(key, i, width).alias("col"))
        for i in range(depth)
    ])
    exploded = probes.select(key.alias(key_col), F.explode(cells).alias("c")) \
        .select(key_col, F.col("c.row").alias("row"), F.col("c.col").alias("col"))
    return (
        exploded.join(F.broadcast(sketch), ["row", "col"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_count"))
    )


# --- Bloom filter: relational build, scan-side prune ------------------------
#
# The 100 TB use-case is runtime semi-join pruning: build a Bloom filter
# over a dimension's join keys (tiny), then drop non-matching fact rows AT
# THE SCAN — before any shuffle — instead of shuffling 100 TB into a join
# that discards most of it. This mirrors what Spark's AQE runtime filter
# (InjectRuntimeFilter) does internally, but as an explicit, persistable,
# mergeable operator: the filter IS a DataFrame of set bit positions, so
# per-partition / per-day filters union together (`bloom_merge`) and can be
# written to parquet alongside the data they summarize.
#
# Hashes reuse the md5 scheme of the CMS above (bit-identical in Spark and
# DuckDB), so even the deterministic false-positive set is value-hash
# oracle-checkable — the estimate itself is in the correctness gate, not
# just eyeballed. Reference parity: generalizes the run-scoped `seen`-set
# membership gate of preprocessor dedup (reference
# src/preprocessing/preprocessor.py:30-38) to out-of-core scale.


def _bloom_bit(key: Column, i: int, num_bits: int) -> Column:
    """Hash-i bit position of ``key`` — same md5 derivation as the CMS."""
    h = F.md5(F.concat(F.lit(str(i)), F.lit("|"), key.cast("string")))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % num_bits)


def bloom_build(df: DataFrame, key_col: str, num_bits: int = 1 << 16,
                num_hashes: int = 4) -> DataFrame:
    """Build the filter: a DataFrame of distinct set ``bit`` positions
    (≤ num_bits rows). One explode + one distinct; map-side combinable."""
    key = F.col(key_col)
    bits = F.array(*[_bloom_bit(key, i, num_bits) for i in range(num_hashes)])
    return df.select(F.explode(bits).alias("bit")).distinct()


def bloom_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Filters over disjoint data union by unioning their bit sets."""
    return a.unionByName(b).distinct()


def bloom_prune(df: DataFrame, key_col: str, bits: DataFrame,
                num_bits: int = 1 << 16, num_hashes: int = 4) -> DataFrame:
    """Keep only rows of ``df`` whose key MIGHT be in the filter (no false
    negatives; deterministic md5 false positives).

    The bit table is materialized once into a packed long[] bitmap — at
    most ``num_bits/64`` words (a filter sized for 1M keys at 1% FP is
    ~1.2 MB), the same driver-side materialization Spark's own runtime
    filter performs — and embedded as a literal array, so the check is a
    pure column expression evaluated inside the scan's WholeStageCodegen:
    no join, no shuffle, and Parquet row groups still benefit from any
    stacked min/max pushdown. ``df`` itself is never collected.
    """
    n_words = (num_bits + 63) >> 6
    words = [0] * n_words
    for (b,) in bits.select("bit").collect():
        words[b >> 6] |= 1 << (b & 63)
    # two's-complement into signed 64-bit for LongType literals
    words = [w - (1 << 64) if w >= (1 << 63) else w for w in words]
    arr = F.array(*[F.lit(w).cast("long") for w in words])

    key = F.col(key_col)
    out = df.withColumn("__bw", arr)
    cond = F.lit(True)
    for i in range(num_hashes):
        out = out.withColumn(f"__bp{i}", _bloom_bit(key, i, num_bits))
        cond = cond & F.expr(
            f"(element_at(__bw, cast(__bp{i} div 64 as int) + 1) & "
            f"shiftleft(1L, cast(__bp{i} % 64 as int))) != 0")
    drop = ["__bw"] + [f"__bp{i}" for i in range(num_hashes)]
    return out.filter(cond).drop(*drop)


# --- HyperLogLog: relational registers, exact-arithmetic estimate ----------
#
# Distinct-count sketch (Flajolet et al., AMS/HLL lineage): m registers,
# register j keeps the max leading-zero run (rho) of hashes landing in j.
# Same two design points as the CMS above:
#
# * **The sketch IS a DataFrame** ``(reg, rho)`` (≤ m rows), built with one
#   narrow projection + one groupBy-max — map-side combinable, mergeable
#   across windows/partitions with groupBy-max (`hll_merge`), persistable
#   next to the data it summarizes.
# * **Every arithmetic step is cross-engine exact**, so the ESTIMATE is
#   value-hash oracle-checkable, not just eyeballed:
#   - the hash is md5 (bit-identical in Spark and DuckDB);
#   - rho comes from the hex string itself (strip leading '0' chars + a
#     16-way CASE on the first nonzero digit) — integer ops, no log2()
#     whose libm rounding could differ by an ulp across engines;
#   - the harmonic sum adds only exact powers of two 2^0..2^-49, whose
#     partial sums all fit in 53 bits of mantissa → the sum is EXACT and
#     therefore order-insensitive (safe under any shuffle/agg order).
#
# At 100 TB: build = one scan + a shuffle of ≤ m·partitions partial rows;
# a cardinality estimate per (day, tenant, ...) group is the same groupBy
# with `reg` folded into the key. Spark's own approx_count_distinct is the
# black-box twin; this one is an auditable, mergeable, cross-engine table.

#: CASE mapping of the first nonzero hex digit to its leading-zero count
#: within the 4-bit nibble: '1'→3, '2'/'3'→2, '4'-'7'→1, '8'-'f'→0.
_NIBBLE_NLZ = ("CASE WHEN __fd = '1' THEN 3 "
               "WHEN __fd IN ('2','3') THEN 2 "
               "WHEN __fd IN ('4','5','6','7') THEN 1 ELSE 0 END")


def hll_build(df: DataFrame, key_col: str, m: int = 256) -> DataFrame:
    """Build the sketch: ``(reg, rho)``, one row per non-empty register.

    ``m`` must be 16 or 256 (1 or 2 hex chars of register addressing) so
    the register index is an exact hex-prefix slice. rho is computed over
    the next 12 hex chars (48 bits): 4·(leading zero chars) + nibble
    zeros + 1, all-zero case → 49.
    """
    return hll_build_grouped(df, [], key_col, m=m)


def hll_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Sketches over any two datasets merge by register-wise max — HLL
    merge is lossless (union semantics), unlike CMS's additive merge."""
    return a.unionByName(b).groupBy("reg").agg(F.max("rho").alias("rho"))


def hll_estimate(sketch: DataFrame, m: int = 256) -> DataFrame:
    """One-row DataFrame ``(est_distinct double)``.

    Standard HLL estimator: alpha·m²/Σ 2^(-M_j) with empty registers
    contributing 2^0, plus the small-range linear-counting correction
    E ≤ 2.5m → m·ln(m/V). Rounded to 3 decimals (ln() is the single
    libm call; rounding removes its cross-engine ulp)."""
    return hll_estimate_grouped(sketch, [], m=m)


def hll_build_grouped(df: DataFrame, group_cols: list[str], key_col: str,
                      m: int = 256) -> DataFrame:
    """Per-group register tables: ``(*group_cols, reg, rho)`` — the
    rollup-able distinct-count primitive. Build once per (day, tenant, …)
    cell; coarser cells (month, all-tenants) come from ``hll_merge_grouped``
    over the FINE sketches, never from re-scanning the raw 100 TB — the
    same partial-aggregate algebra as ``operators/rollup.py``, extended to
    a non-additive measure (distinct) via the sketch."""
    if m not in (16, 256):
        raise ValueError("m must be 16 or 256 (hex-prefix addressing)")
    rc = 1 if m == 16 else 2
    h = F.md5(F.col(key_col).cast("string"))
    tail = F.substring(h, rc + 1, 12)
    stripped = F.regexp_replace(tail, r"^0+", "")
    return (
        df.select(
            *group_cols,
            F.conv(F.substring(h, 1, rc), 16, 10).cast("int").alias("reg"),
            stripped.alias("__s"),
            F.substring(stripped, 1, 1).alias("__fd"))
        .select(
            *group_cols, "reg",
            F.when(F.length("__s") == 0, F.lit(49)).otherwise(
                (F.lit(12) - F.length("__s")) * 4
                + F.expr(_NIBBLE_NLZ) + 1).alias("rho"))
        .groupBy(*group_cols, "reg").agg(F.max("rho").alias("rho"))
    )


def hll_merge_grouped(sketch: DataFrame, group_cols: list[str]) -> DataFrame:
    """Coarsen: re-group a finer sketch to ``group_cols`` (e.g. day→month,
    or drop a dimension) by register-wise max."""
    return sketch.groupBy(*group_cols, "reg").agg(F.max("rho").alias("rho"))


def hll_estimate_grouped(sketch: DataFrame, group_cols: list[str],
                         m: int = 256) -> DataFrame:
    """Estimate per group: ``(*group_cols, est_distinct)`` — same
    exact-arithmetic estimator as ``hll_estimate``, one row per group."""
    alpha = {16: 0.673, 256: 0.7213 / (1 + 1.079 / 256)}[m]
    agg = sketch.groupBy(*group_cols).agg(
        F.sum(F.pow(F.lit(0.5), F.col("rho"))).alias("s"),
        F.count("*").alias("nz"))
    raw = F.lit(alpha * m * m) / (F.col("s") + (F.lit(m) - F.col("nz")))
    return agg.select(
        *group_cols,
        F.round(
            F.when((raw <= 2.5 * m) & (F.col("nz") < m),
                   F.lit(float(m)) * F.log(F.lit(float(m))
                                           / (F.lit(m) - F.col("nz"))))
            .otherwise(raw), 3).alias("est_distinct"))


def histogram_quantile_grouped(df: DataFrame, group_cols: list[str],
                               value_col: str, q: float,
                               buckets: int = 400,
                               out_col: str = "est_quantile") -> DataFrame:
    """Approximate per-group quantile via an equal-width histogram —
    the cross-engine-reproducible stand-in for ``percentile_approx``
    (whose Greenwald-Khanna sketch is engine-specific and can't be
    value-hash oracle-checked).

    Two passes: (1) per-group min/max/count, broadcast back; (2) bucket
    counts + a cumulative window over ≤ ``buckets`` rows per group, then
    linear interpolation inside the crossing bucket:
    ``lo + width·(b + (q·n − cum_before)/count_b)``. Error is bounded by
    one bucket width ((hi−lo)/buckets). Every step is plain double
    arithmetic on identical expressions, so DuckDB reproduces the value
    bit-for-bit (rounded to 6dp to shed last-ulp noise).

    At 100 TB: pass 1 is a scan + tiny agg; pass 2 is a scan + a shuffle
    of ≤ groups·buckets count rows — no per-group sort of raw values,
    which is what an exact percentile would need.
    """
    from pyspark.sql import Window

    if not 0.0 <= q <= 1.0:
        raise ValueError(f"q must be in [0, 1], got {q}")
    v = F.col(value_col).cast("double")
    # NaN would floor-cast into bucket 0 and drag the estimate toward the
    # minimum — exclude it like NULL (it carries no orderable value)
    src = df.filter(v.isNotNull() & ~F.isnan(v))
    bounds = src.groupBy(*group_cols).agg(
        F.min(v).alias("__lo"), F.max(v).alias("__hi"),
        F.count("*").alias("__n"))
    width = (F.col("__hi") - F.col("__lo")) / F.lit(float(buckets))
    degen = F.col("__hi") <= F.col("__lo")
    b = F.when(degen, F.lit(0)).otherwise(
        F.least(F.greatest(F.floor((v - F.col("__lo")) / width),
                           F.lit(0)), F.lit(buckets - 1)))
    hist = (
        src.join(F.broadcast(bounds), group_cols)
        .groupBy(*group_cols, "__lo", "__hi", "__n", b.alias("__b"))
        .agg(F.count("*").alias("__c"))
    )
    w = Window.partitionBy(*group_cols).orderBy("__b") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    target = F.lit(float(q)) * F.col("__n").cast("double")
    cum = hist.withColumn("__cum", F.sum("__c").over(w))
    # first bucket whose cumulative count reaches the target; the q=0
    # disjunct keeps the first non-empty bucket (target 0 is reached
    # before any bucket, so cum_before < target alone never fires)
    crossing = (F.col("__cum").cast("double") >= target) & (
        ((F.col("__cum") - F.col("__c")).cast("double") < target)
        | ((target <= F.lit(0.0)) & (F.col("__cum") == F.col("__c"))))
    est = F.when(degen, F.col("__lo")).otherwise(
        F.col("__lo") + ((F.col("__hi") - F.col("__lo"))
                         / F.lit(float(buckets)))
        * (F.col("__b").cast("double")
           + (target - (F.col("__cum") - F.col("__c")).cast("double"))
           / F.col("__c").cast("double")))
    return (
        cum.filter(crossing | (degen & (F.col("__b") == 0)))
        .select(*group_cols, F.round(est, 6).alias(out_col))
    )


def histogram_sketch_build(df: DataFrame, group_cols: list[str],
                           value_col: str, lo: float, hi: float,
                           buckets: int = 400) -> DataFrame:
    """MERGEABLE per-group quantile sketch: equal-width bucket counts
    over the FIXED range [lo, hi) — ``(*group_cols, bucket, cnt)``.

    Fixed bounds are what make the sketch mergeable (same bucket grid
    everywhere): build per fine cell (day, tenant), coarsen with
    ``histogram_sketch_merge`` by summing matching buckets — quantiles
    over any time range then come from stored sketches, never from
    re-scanning raw history. This extends the rollup partial-aggregate
    algebra (operators/rollup.py) to quantiles, the non-additive measure
    it couldn't cover. Values outside the range clamp to the edge
    buckets (estimates there degrade to the range edge — size [lo, hi)
    generously). ≤ ``buckets`` rows per group, one map-side-combinable
    aggregation.
    """
    if hi <= lo:
        raise ValueError(f"need lo < hi, got [{lo}, {hi})")
    v = F.col(value_col).cast("double")
    width = (hi - lo) / float(buckets)
    b = F.least(F.greatest(F.floor((v - F.lit(lo)) / F.lit(width)),
                           F.lit(0)), F.lit(buckets - 1))
    return (
        # NaN floor-casts to bucket 0 and would permanently poison the
        # low end of a persisted sketch — excluded like NULL
        df.filter(v.isNotNull() & ~F.isnan(v))
        .groupBy(*group_cols, b.alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )


def histogram_sketch_merge(sketch: DataFrame,
                           group_cols: list[str]) -> DataFrame:
    """Coarsen: re-group a finer sketch to ``group_cols`` (drop a
    dimension, day→month) by summing matching buckets — exact, lossless
    with respect to the bucket grid."""
    return sketch.groupBy(*group_cols, "bucket") \
        .agg(F.sum("cnt").alias("cnt"))


def histogram_sketch_quantile(sketch: DataFrame, group_cols: list[str],
                              q: float, lo: float, hi: float,
                              buckets: int = 400,
                              out_col: str = "est_quantile") -> DataFrame:
    """Per-group quantile estimate from a (possibly merged) sketch:
    cumulative window over ≤ ``buckets`` rows per group + linear
    interpolation in the crossing bucket — same estimator and
    cross-engine-exact arithmetic as ``histogram_quantile_grouped``,
    minus the raw-data passes (the sketch IS the data here).
    """
    from pyspark.sql import Window

    if not 0.0 <= q <= 1.0:
        raise ValueError(f"q must be in [0, 1], got {q}")
    if hi <= lo:
        raise ValueError(f"need lo < hi, got [{lo}, {hi})")
    width = (hi - lo) / float(buckets)
    wtot = Window.partitionBy(*group_cols)
    w = Window.partitionBy(*group_cols).orderBy("bucket") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = (sketch
           .withColumn("__n", F.sum("cnt").over(wtot))
           .withColumn("__cum", F.sum("cnt").over(w)))
    target = F.lit(float(q)) * F.col("__n").cast("double")
    crossing = (F.col("__cum").cast("double") >= target) & (
        ((F.col("__cum") - F.col("cnt")).cast("double") < target)
        | ((target <= F.lit(0.0)) & (F.col("__cum") == F.col("cnt"))))
    est = (F.lit(lo) + F.lit(width)
           * (F.col("bucket").cast("double")
              + (target - (F.col("__cum") - F.col("cnt")).cast("double"))
              / F.col("cnt").cast("double")))
    return (
        cum.filter(crossing)
        .select(*group_cols, F.round(est, 6).alias(out_col))
    )


def hll_intersect_estimate(a: DataFrame, b: DataFrame,
                           m: int = 256) -> DataFrame:
    """Estimate set overlap from two HLL sketches by inclusion-exclusion:
    |A∩B| ≈ est(A) + est(B) − est(A∪B), where the union estimate comes
    from the lossless register-wise-max merge. One row:
    ``(est_a, est_b, est_union, est_intersect)``.

    This is the sketch answer to "how many users did BOTH things" /
    "how many keys would this join match" over 100 TB without a distinct
    shuffle of either side — build per-partition sketches, merge, subtract.
    The intersection error compounds (±1.04/√m on each of three terms) and
    can dip below zero for tiny true overlaps; the raw value is returned
    un-clamped so callers see the sign of the noise. All arithmetic is the
    same exact-powers-of-two harmonic sums as ``hll_estimate`` — the final
    add/subtract of 3-dp-rounded doubles is bit-reproducible cross-engine.
    """
    # each sketch feeds TWO consumers (its own estimate + the union merge)
    # and the tiny register tables sit behind aggregations ReuseExchange
    # can't share — checkpoint so each sketch build runs once (r3 plan
    # audit: 11 shuffles / 4 scans without this)
    a = a.localCheckpoint(eager=False)
    b = b.localCheckpoint(eager=False)
    ea = hll_estimate(a, m=m).withColumnRenamed("est_distinct", "est_a")
    eb = hll_estimate(b, m=m).withColumnRenamed("est_distinct", "est_b")
    eu = hll_estimate(hll_merge(a, b), m=m) \
        .withColumnRenamed("est_distinct", "est_union")
    return (
        ea.crossJoin(eb).crossJoin(eu)
        .withColumn(
            "est_intersect",
            F.round(F.col("est_a") + F.col("est_b") - F.col("est_union"), 3))
    )
