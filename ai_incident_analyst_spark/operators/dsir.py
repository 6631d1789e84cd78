"""DSIR — Data Selection with Importance Resampling (Xie et al.,
NeurIPS 2023) over hashed n-gram features.

The canonical "pick pretraining data that looks like my target corpus"
operator: fit two bag-of-hashed-ngrams unigram models — one on a small
TARGET corpus (the distribution you want), one on the RAW corpus (the
distribution you have) — score every raw document by its log importance
weight  log w(x) = Σ_grams  [ln p_target(bucket) − ln p_raw(bucket)],
then resample k documents with probability ∝ w via Gumbel top-k.

The reference has no data-selection surface at all (its corpus is
whatever the incident API returns — ``src/new_relic_fetcher.py``); this
is north-star training-data-pipeline surface, same family as the
sampling/mixture operators in ``operators/sampling.py``.

Everything is deterministic and engine-portable, following the repo's
sampling contract (``operators/sampling.py`` module docstring):

- the feature hash is ``md5(salt‖gram)`` → first 8 hex chars → int %
  buckets (bit-identical in Spark and DuckDB — the twin replays it);
- the Gumbel draw derives from ``md5('g:'‖id)``, not an RNG, so the
  selected set is reproducible, append-stable, and layout-invariant;
- ranking keys are rounded to ``round_dp`` decimals before the top-k
  (id tie-break), so a libm-ln ulp can't flip a boundary rank — the
  same discretization contract as BM25 (``operators/search.py``).

Physical plan, and why it holds at 100 TB:

- n-gram explode → bucket → per-(doc, bucket) count is ONE map-side-
  combined keyed shuffle over the corpus — the only corpus-sized
  shuffle in the whole operator. Both downstream consumers (the raw
  model fit and the per-document scorer) hang off the SAME exchange,
  so Spark plans the second as a ReusedExchange: the explode pass runs
  once;
- the model fits reduce that compacted frame to ≤``buckets`` rows
  (default 4096) — shuffled bytes O(buckets), corpus-size independent
  — and the λ log-ratio table joins back BROADCAST; the corpus never
  shuffles to meet the model;
- Gumbel top-k is a ``TakeOrderedAndProject`` (per-partition partial
  top-k merged on the driver) — never a single-partition window.

Documents with zero qualifying grams have no feature mass, hence no
defined importance weight: they are excluded from scoring and can never
be selected (the twin's inner joins agree by construction).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _grams(text_col: str, min_len: int = 2) -> Column:
    """Unigrams + bigrams of the lowercased ``\\W+`` token stream (the
    repo-standard tokenizer — ``operators/divergence.py:127``), tokens
    shorter than ``min_len`` dropped BEFORE bigram formation so the
    bigrams are over the same filtered stream as the unigrams."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\W+"),
                    lambda t: F.length(t) >= min_len)
    n = F.greatest(F.size(toks) - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(toks, F.lit(1), n),
        F.slice(toks, F.lit(2), n),
        lambda a, b: F.concat_ws(" ", a, b))
    return F.concat(toks, bigrams)


def doc_bucket_counts(df: DataFrame, id_col: str, text_col: str,
                      buckets: int = 4096,
                      salt: str = "dsir") -> DataFrame:
    """Hashed bag-of-ngrams features, compacted per document:
    ``(id_col, bucket, cnt)`` — one narrow explode + one map-side-
    combined groupBy. Multiplicity is kept in ``cnt`` (both the models
    and the scores are count-weighted, the paper's formulation)."""
    g = F.explode(_grams(text_col)).alias("__gram")
    b = (F.conv(F.substring(
            F.md5(F.concat(F.lit(salt), F.col("__gram"))), 1, 8), 16, 10)
         .cast("long") % buckets)
    return (df.select(F.col(id_col), g)
            .select(id_col, b.alias("bucket"))
            .groupBy(id_col, "bucket")
            .agg(F.count(F.lit(1)).alias("cnt")))


def dsir_log_ratio(target_counts: DataFrame, raw_counts: DataFrame,
                   buckets: int = 4096,
                   alpha: float = 1.0) -> DataFrame:
    """The per-bucket log importance ratio table
    ``λ(b) = ln((tc_b+α)/(Tt+αB)) − ln((rc_b+α)/(Tr+αB))`` — two
    add-α-smoothed hashed unigram models as one ≤``buckets``-row frame
    ``(bucket, lam)``. Inputs are ``doc_bucket_counts`` frames. Keyed
    on the RAW side's observed buckets (every bucket a scored document
    hits appears there by construction); target counts join with 0
    default. Totals ride in as 1-row broadcast anchors — no collect."""
    tc = target_counts.groupBy("bucket").agg(F.sum("cnt").alias("tc"))
    rc = raw_counts.groupBy("bucket").agg(F.sum("cnt").alias("rc"))
    tt = tc.agg(F.sum("tc").alias("tt"))
    rt = rc.agg(F.sum("rc").alias("rt"))
    ab = float(alpha) * buckets
    return (rc.join(tc, "bucket", "left")
            .crossJoin(F.broadcast(tt)).crossJoin(F.broadcast(rt))
            .select(
                "bucket",
                (F.log((F.coalesce(F.col("tc"), F.lit(0)) + F.lit(alpha))
                       / (F.coalesce(F.col("tt"), F.lit(0)) + F.lit(ab)))
                 - F.log((F.col("rc") + F.lit(alpha))
                         / (F.col("rt") + F.lit(ab)))).alias("lam")))


def dsir_scores(raw: DataFrame, id_col: str, text_col: str,
                target: DataFrame, buckets: int = 4096,
                alpha: float = 1.0, salt: str = "dsir",
                round_dp: int = 6) -> DataFrame:
    """Per-document DSIR log importance weight: ``(id_col, logw)`` with
    ``logw = round(Σ_buckets cnt·λ(bucket), round_dp)``. ``target``
    needs the same ``text_col`` (its id column is only a grouping key
    and may be any stable id). The raw features' exchange is shared by
    the model fit and the scorer (ReusedExchange — one explode pass)."""
    rawc = doc_bucket_counts(raw, id_col, text_col, buckets, salt)
    tgtc = doc_bucket_counts(target, id_col, text_col, buckets, salt)
    lam = dsir_log_ratio(tgtc, rawc, buckets, alpha)
    return (rawc.join(F.broadcast(lam), "bucket")
            .groupBy(id_col)
            .agg(F.round(F.sum(F.col("cnt") * F.col("lam")),
                         round_dp).alias("logw")))


def dsir_select(raw: DataFrame, id_col: str, text_col: str,
                target: DataFrame, k: int, buckets: int = 4096,
                alpha: float = 1.0, salt: str = "dsir",
                round_dp: int = 6) -> DataFrame:
    """Gumbel top-k resampling WITHOUT replacement from the softmax of
    the log weights (the standard reparameterization: adding i.i.d.
    Gumbel noise to log-scores and taking the top k draws k samples
    w/o replacement ∝ w): ``key = logw + (−ln(−ln u))`` with ``u``
    hash-derived from the id — reproducible and append-stable for
    surviving rows. Returns ``(id_col, logw, gkey)`` for the k selected
    documents, ``gkey`` rounded before the rank (id tie-break)."""
    scores = dsir_scores(raw, id_col, text_col, target,
                         buckets, alpha, salt, round_dp)
    u = (F.conv(F.substring(
            F.md5(F.concat(F.lit("g:"), F.col(id_col).cast("string"))),
            1, 8), 16, 10).cast("double") + F.lit(1.0)) \
        / F.lit(float(16 ** 8) + 1.0)
    gkey = F.round(F.col("logw") - F.log(-F.log(u)), round_dp)
    return (scores.withColumn("gkey", gkey)
            .orderBy(F.desc("gkey"), F.col(id_col).asc())
            .limit(k))
