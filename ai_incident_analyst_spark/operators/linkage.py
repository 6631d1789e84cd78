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

import pandas as pd  # module-level: pandas_udf type hints are strings
                     # under future-annotations and resolve via globals

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .util import guard_pairwise_input, spread


def last_token(col: Column | str, delim: str = " ") -> Column:
    """A cheap blocker: the last delimiter-separated token (for
    adjective–noun product names, the noun)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.element_at(F.split(c, delim), -1)


def fuzzy_self_join(df: DataFrame, id_col: str, text_col: str,
                    blocker: Column, max_dist: int = 2,
                    max_rows: int | None = 200_000,
                    force: bool = False) -> DataFrame:
    """All unordered row pairs whose block keys match and whose
    ``text_col`` edit distance is ≤ ``max_dist``:
    ``(id_a, id_b, text_a, text_b, dist)``.

    Σ|block|² candidate growth: with a low-cardinality blocker the
    candidate set is quadratic in the table (the 64-value last-token
    blocker measured spill-regime at sf2, SCALING.md) — inputs above
    ``max_rows`` (default 200k = the largest in-envelope measured SF)
    raise ``PairwiseInputCapExceeded`` unless ``force=True``; the
    bounded sibling is ``sorted_neighborhood_pairs`` (O(n·window) by
    construction, skew-independent).

    Three result-preserving optimizations keep the verify stage cheap
    (together 22× on 20k product names at sf0.1 — 51 s → 2.5 s):

    - **verify on DISTINCT texts, then expand**: edit distance is a
      function of the text pair, so the O(block²) Levenshtein work runs
      over distinct (text, block) values only — real-world name columns
      are heavily duplicated (20k rows → 64 distinct here), and distinct
      verify is never more work than row-pair verify. Matching text
      pairs then expand back to id pairs through two equi-joins on text
      (the expansion output is exactly the result set — irreducible);
    - ``|len(a) − len(b)| ≤ max_dist`` as a NECESSARY integer pre-filter
      inside the pair join;
    - the thresholded ``levenshtein(a, b, k)`` form: banded O(len·k)
      with early exit instead of the full O(len²) table (returns −1 past
      the threshold).
    """
    guard_pairwise_input(df, max_rows, "fuzzy_self_join",
                         "sorted_neighborhood_pairs (Hernandez-Stolfo "
                         "rank-window blocking, O(n·window))", force)
    side = df.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("txt"),
        blocker.alias("blk"),
    )
    texts = side.select("txt", "blk").distinct().localCheckpoint(eager=False)
    ta, tb = texts.alias("ta"), texts.alias("tb")
    lev = F.levenshtein(F.col("ta.txt"), F.col("tb.txt"), max_dist)
    # canonical text order: each unordered text pair compared once;
    # the self-pair (t, t) carries the duplicate-id matches at dist 0
    tpairs = (
        ta.join(tb, (F.col("ta.blk") == F.col("tb.blk"))
                & (F.col("ta.txt") <= F.col("tb.txt"))
                & (F.abs(F.length(F.col("ta.txt"))
                         - F.length(F.col("tb.txt"))) <= max_dist))
        .select(F.col("ta.txt").alias("txt_a"),
                F.col("tb.txt").alias("txt_b"),
                F.col("ta.blk").alias("blk"), lev.alias("dist"))
        .filter(F.col("dist") >= 0)
    )
    # hash-spread the matched text pairs so the id expansion — and the
    # consumer's partial aggregation — parallelizes over text pairs no
    # matter which join side the planner builds: the checkpointed pair
    # table has unknown stats, so the planner streams it behind two
    # broadcasts and AQE coalesces it to ONE task otherwise (the whole
    # 5.5M-row expansion ran serially; measured 11 s → 2.5 s at sf0.1)
    tpairs = spread(tpairs, "txt_a")
    # expansion joins carry the BLOCK KEY alongside the text: with a
    # blocker not derived from text_col, the same text can live in
    # several blocks, and a text-only join would emit cross-block pairs
    # (violating the blocking contract) and duplicate same-block pairs
    # once per extra block
    ma = side.select(F.col("id").alias("ia"), F.col("txt").alias("txt_a"),
                     F.col("blk"))
    mb = side.select(F.col("id").alias("ib"), F.col("txt").alias("txt_b"),
                     F.col("blk"))
    expanded = (
        ma.join(tpairs, ["txt_a", "blk"]).join(mb, ["txt_b", "blk"])
        .filter(F.col("ia") != F.col("ib"))
        # same-text pairs arrive in both id orders; canonicalize and
        # keep one (cross-text pairs are already unique per text pair)
        .filter((F.col("txt_a") != F.col("txt_b"))
                | (F.col("ia") < F.col("ib")))
    )
    lo_first = (F.col("ia") < F.col("ib"))
    return expanded.select(
        F.least("ia", "ib").alias("id_a"),
        F.greatest("ia", "ib").alias("id_b"),
        F.when(lo_first, F.col("txt_a")).otherwise(F.col("txt_b"))
         .alias("text_a"),
        F.when(lo_first, F.col("txt_b")).otherwise(F.col("txt_a"))
         .alias("text_b"),
        "dist",
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
        .filter(F.abs(F.length(F.col("ltxt"))
                      - F.length(F.col("rtxt"))) <= max_dist)
        .select("lid", "rid",
                F.levenshtein(F.col("ltxt"), F.col("rtxt"), max_dist)
                .alias("dist"))
        .filter(F.col("dist") >= 0)
        .select(F.col("lid").alias(left_id), F.col("rid").alias(right_id),
                "dist")
    )


def soundex_blocker(col: Column | str) -> Column:
    """Phonetic blocker (JVM ``soundex``): catches sound-alike spelling
    variants ("Smyth"/"Smith") that token/prefix blockers miss. No
    engine-portable SQL twin (DuckDB has no soundex) — pair results
    using this blocker are pytest-verified instead."""
    c = F.col(col) if isinstance(col, str) else col
    return F.soundex(c)


def sorted_neighborhood_pairs(df: DataFrame, id_col: str, text_col: str,
                              sort_key: Column, window: int = 5,
                              max_dist: int = 2) -> DataFrame:
    """Sorted-neighborhood blocking (Hernández–Stolfo): order the corpus
    by a sort key, compare each row only to the next ``window−1`` rows,
    verify with banded Levenshtein. The classic alternative to key
    blocking when near-matches share a prefix but no exact block value —
    candidate volume is O(n·window) by construction, independent of
    block-size skew.

    The global rank comes from ``packing.global_cumsum`` (range shuffle +
    per-partition window + broadcast offsets — never a single-task
    global sort); neighborhoods are one integer equi-join of each row
    against its next ``window−1`` ranks. Returns ``(id_a, id_b, dist)``
    with the pair ordered by rank (a before b).
    """
    from .packing import global_cumsum

    base = df.select(F.col(id_col).alias("ia"),
                     F.col(text_col).alias("ta"),
                     F.struct(sort_key, F.col(id_col)).alias("__sk"),
                     F.lit(1).alias("__one"))
    ranked = global_cumsum(base, "__sk", "__one", out_col="__rank") \
        .drop("__sk", "__one").localCheckpoint(eager=False)
    probes = ranked.select(
        "ia", "ta",
        F.explode(F.array(*[F.col("__rank") + F.lit(j)
                            for j in range(1, window)])).alias("__tr"))
    right = ranked.select(F.col("ia").alias("ib"), F.col("ta").alias("tb"),
                          F.col("__rank").alias("__tr"))
    lev = F.levenshtein(F.col("ta"), F.col("tb"), max_dist)
    return (
        probes.join(right, "__tr")
        .filter(F.abs(F.length("ta") - F.length("tb")) <= max_dist)
        .select(F.col("ia").alias("id_a"), F.col("ib").alias("id_b"),
                lev.alias("dist"))
        .filter(F.col("dist") >= 0)
    )


def sorted_neighborhood_jw_pairs(df: DataFrame, id_col: str,
                                 text_col: str, sort_key: Column,
                                 window: int = 5, threshold: float = 0.9,
                                 round_dp: int = 6) -> DataFrame:
    """Jaro–Winkler verification over SORTED-NEIGHBORHOOD blocking —
    the scale-safe composition of the shelf's two linkage halves:
    ``jaro_winkler_pairs``'s key blocker makes candidate volume
    Σ|block|² (quadratic when a key is heavy — 64 distinct part names
    make ``last_token`` blocks grow with the table), while the
    Hernández–Stolfo window bounds candidates at O(n·window) BY
    CONSTRUCTION, independent of key skew. JW is prefix-weighted, so
    sorting by the name itself puts exactly the high-JW pairs in
    adjacent ranks — the natural sort key for this verifier.

    Same machinery as the halves it composes: global rank via the
    two-phase prefix sum (never a single-task sort), one integer
    equi-join for the window, the provable JW length-ratio prefilter
    ahead of the Arrow verifier, scores rounded to ``round_dp`` BEFORE
    the threshold compare (engine-portable boundary). Returns
    ``(id_a, id_b, jw)`` with the pair ordered by rank (a before b).
    """
    from pyspark.sql.functions import pandas_udf

    from .packing import global_cumsum

    @pandas_udf("double")
    def jw_udf(a: pd.Series, b: pd.Series) -> pd.Series:
        return _jw_batch(a, b, float(threshold), round_dp)

    # the function IS deterministic; the flag only stops Catalyst from
    # COLLAPSING the scoring projection into the threshold filter and
    # the downstream expansion joins, which re-evaluated the Arrow UDF
    # up to 4x per pair (r10 plan audit: 4 ArrowEvalPython stages in
    # jw_part_pairs -> 1 after this)
    jw_udf = jw_udf.asNondeterministic()

    base = df.select(F.col(id_col).alias("ia"),
                     F.col(text_col).alias("ta"),
                     F.struct(sort_key, F.col(id_col)).alias("__sk"),
                     F.lit(1).alias("__one"))
    ranked = global_cumsum(base, "__sk", "__one", out_col="__rank") \
        .drop("__sk", "__one").localCheckpoint(eager=False)
    probes = ranked.select(
        "ia", "ta",
        F.explode(F.array(*[F.col("__rank") + F.lit(j)
                            for j in range(1, window)])).alias("__tr"))
    right = ranked.select(F.col("ia").alias("ib"), F.col("ta").alias("tb"),
                          F.col("__rank").alias("__tr"))
    cand = probes.join(right, "__tr")
    # provable JW length-ratio prefilter (see jaro_winkler_pairs):
    # jw >= T forces min_len/max_len >= 3*(T - 0.4)/0.6 - 2
    ratio = 3.0 * (float(threshold) - 0.4) / 0.6 - 2.0
    if ratio > 0.0:
        cand = cand.where(
            F.least(F.length("ta"), F.length("tb"))
            >= F.lit(ratio) * F.greatest(F.length("ta"), F.length("tb")))
    return (cand
            .withColumn("jw", F.round(jw_udf("ta", "tb"), round_dp))
            .where(F.col("jw") >= threshold)
            .select(F.col("ia").alias("id_a"), F.col("ib").alias("id_b"),
                    "jw"))


def _jw_batch(a: "pd.Series", b: "pd.Series", threshold: float,
              round_dp: int) -> "pd.Series":
    """Batch Jaro–Winkler with a PROVABLE vectorized prune (r13 opt,
    guide §4.2 — do the heavy lifting in native code inside the UDF):
    the interpreted ``jaro_winkler`` kernel only runs on pairs whose
    char-multiset upper bound can still reach ``threshold``.

    Bound (result-preserving by proof, not heuristic): Jaro matches are
    a one-to-one pairing of equal characters, so
    ``m ≤ Σ_c min(count_a(c), count_b(c))`` (byte counts on UTF-8 only
    loosen the bound — every common char contributes ≥ 1 common byte);
    ``jaro = (m/n1 + m/n2 + (m−t)/m)/3 ≤ (m_ub/n1 + m_ub/n2 + 1)/3``
    (monotone in m, transposition term ≤ 1); and with the standard
    p = 0.1, l ≤ 4 boost ``jw ≤ 0.6·jaro + 0.4`` (also valid when the
    boost doesn't fire, since jaro ≤ 1). A pair with
    ``jw_ub < threshold − 0.5·10^−round_dp − 1e−9`` cannot round up to
    the threshold, so returning 0.0 for it leaves the post-UDF
    ``round(jw, round_dp) >= threshold`` filter's output unchanged
    (the margin covers rounding-at-the-boundary plus float error in
    the bound arithmetic itself). Equal strings short-circuit to 1.0
    (covers the empty-string diagonal the length math can't).

    Count vectors are built once per DISTINCT string in the batch and
    the min/sum runs as one numpy pass (prune rate and speedup measured
    in OPTIMIZATION_r13.md).
    """
    import numpy as np

    av, bv = a.to_numpy(), b.to_numpy()
    n = len(av)
    if n == 0:
        return pd.Series([], dtype="float64")
    # null texts (r13 ADVICE): None in an object array crashes np.unique
    # (None-vs-str unsortable). Null-vs-null pairs hit the eq path below
    # (1.0, the old per-pair kernel's behavior); null-vs-anything-else is
    # 0.0 by definition here and never reaches the interpreted kernel —
    # nulls are masked to "" for the count/bound arithmetic only.
    nulls = pd.isna(a).to_numpy() | pd.isna(b).to_numpy()
    if nulls.any():
        av = np.where(pd.isna(a).to_numpy(), "", av)
        bv = np.where(pd.isna(b).to_numpy(), "", bv)
    texts = np.concatenate([av, bv])
    uniq, inv = np.unique(texts, return_inverse=True)
    counts = np.zeros((len(uniq), 256), dtype=np.int32)
    lens = np.ones(len(uniq), dtype=np.float64)  # 1-floor: len 0 pairs
    for i, u in enumerate(uniq):                 # are handled via eq/0.0
        bs = np.frombuffer(u.encode("utf-8"), dtype=np.uint8)
        counts[i] = np.bincount(bs, minlength=256)
        if len(u):
            lens[i] = float(len(u))
    ia, ib = inv[:n], inv[n:]
    m_ub = np.minimum(counts[ia], counts[ib]).sum(axis=1,
                                                  dtype=np.float64)
    jaro_ub = (m_ub / lens[ia] + m_ub / lens[ib] + 1.0) / 3.0
    jw_ub = 0.6 * jaro_ub + 0.4
    cut = threshold - 0.5 * 10.0 ** (-round_dp) - 1e-9
    eq = av == bv
    out = np.zeros(n, dtype=np.float64)
    out[eq] = 1.0
    if nulls.any():
        # masked eq would score null-vs-"" as 1.0; only null==null is
        out[nulls] = 0.0
        out[pd.isna(a).to_numpy() & pd.isna(b).to_numpy()] = 1.0
    for i in np.nonzero((jw_ub >= cut) & ~eq & ~nulls)[0]:
        out[i] = jaro_winkler(av[i], bv[i])
    return pd.Series(out)


def jaro_winkler(s1: str, s2: str, prefix_scale: float = 0.1,
                 boost_threshold: float = 0.7) -> float:
    """Reference Jaro–Winkler similarity (Winkler 1990): Jaro matches
    within ``max(len)/2 − 1``, transpositions halved, plus the common-
    prefix bonus (≤4 chars) when Jaro exceeds ``boost_threshold``.
    Verified equal (180/180 random pairs, <1e-12) to DuckDB's
    ``jaro_winkler_similarity``, so scores hash-match the oracle."""
    if s1 == s2:
        return 1.0
    n1, n2 = len(s1), len(s2)
    if not n1 or not n2:
        return 0.0
    match_dist = max(n1, n2) // 2 - 1
    m1 = [False] * n1
    m2 = [False] * n2
    matches = 0
    for i, c in enumerate(s1):
        lo, hi = max(0, i - match_dist), min(n2, i + match_dist + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                matches += 1
                break
    if not matches:
        return 0.0
    t = 0
    k = 0
    for i in range(n1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    j = (matches / n1 + matches / n2 + (matches - t) / matches) / 3
    if j > boost_threshold:
        l = 0
        for a, b in zip(s1[:4], s2[:4]):
            if a != b:
                break
            l += 1
        return j + l * prefix_scale * (1 - j)
    return j


def jaro_winkler_pairs(df: DataFrame, id_col: str, text_col: str,
                       blocker: Column, threshold: float = 0.9,
                       round_dp: int = 6,
                       max_rows: int | None = 200_000,
                       force: bool = False) -> DataFrame:
    """Blocked fuzzy pairs by Jaro–Winkler similarity ≥ ``threshold`` —
    the name-matching verifier record-linkage practice prefers over raw
    edit distance (prefix-weighted, length-normalized). Same Σ|block|²
    blocking skeleton as ``fuzzy_self_join``; the verifier is an Arrow
    ``pandas_udf`` over ``jaro_winkler`` (no JVM builtin exists), run on
    DISTINCT text pairs within blocks before expanding back to id pairs.
    Scores round to ``round_dp`` BEFORE the threshold compare so the
    boundary is engine-portable. Returns
    ``(id_a, id_b, text_a, text_b, jw)``.

    Inputs above ``max_rows`` (default 200k — the measured sf0.5 cell
    confirmed the n² fit; the sf2 projection is a 47-minute burn,
    SCALING.md) raise ``PairwiseInputCapExceeded`` unless ``force=True``;
    ``sorted_neighborhood_jw_pairs`` is the bounded O(n·window) sibling.
    """
    guard_pairwise_input(df, max_rows, "jaro_winkler_pairs",
                         "sorted_neighborhood_jw_pairs (rank-window "
                         "blocking, O(n·window))", force)
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def jw_udf(a: pd.Series, b: pd.Series) -> pd.Series:
        return _jw_batch(a, b, float(threshold), round_dp)

    # the function IS deterministic; the flag only stops Catalyst from
    # COLLAPSING the scoring projection into the threshold filter and
    # the downstream expansion joins, which re-evaluated the Arrow UDF
    # up to 4x per pair (r10 plan audit: 4 ArrowEvalPython stages in
    # jw_part_pairs -> 1 after this)
    jw_udf = jw_udf.asNondeterministic()

    base = (spread(df.select(id_col, text_col), id_col)
            .select(F.col(id_col).alias("id"),
                    F.col(text_col).alias("t"),
                    blocker.alias("__b"))
            .localCheckpoint(eager=False))
    texts = base.select("t", "__b").distinct()
    a = texts.select(F.col("t").alias("ta"), "__b")
    b = texts.select(F.col("t").alias("tb"), "__b")
    # ta <= tb keeps each unordered TEXT pair once (ta == tb covers the
    # exact-duplicate rows; jaro_winkler returns 1.0 there, no special
    # case); expansion to id pairs then normalizes by id order — the
    # (ta, tb) orientation is unique per text pair so no pair repeats,
    # and the equal-text diagonal dedups via the id_a < id_b branch
    cand = a.join(b, "__b").where(F.col("ta") <= F.col("tb"))
    # PROVABLE length-ratio prefilter, JVM-side, ahead of the Python
    # verifier (the per-pair cost in this operator is the Arrow UDF):
    # jaro ≤ (min_len/max_len + 2)/3 (m ≤ min_len, transposition term
    # ≤ 1), and with the standard p=0.1, l ≤ 4 prefix boost
    # jw ≤ 0.6·jaro + 0.4 — so jw ≥ T forces
    # min_len/max_len ≥ 3·(T − 0.4)/0.6 − 2. Pairs failing the bound
    # CANNOT reach the threshold; dropping them changes nothing.
    jmin = (float(threshold) - 0.4) / 0.6
    ratio = 3.0 * jmin - 2.0
    if ratio > 0.0:
        cand = cand.where(
            F.least(F.length("ta"), F.length("tb"))
            >= F.lit(ratio) * F.greatest(F.length("ta"), F.length("tb")))
    verified = (
        cand
        .withColumn("jw", F.round(jw_udf("ta", "tb"), round_dp))
        .where(F.col("jw") >= threshold)
    )
    # hash-spread the verified text pairs BEFORE the id expansion (r13
    # opt — the fuzzy_self_join:104 lesson finally applied to this
    # operator too): the verified frame is |distinct-text-pairs| rows
    # (288 at sf0.1) behind an Arrow UDF and a tiny distinct, so AQE
    # plans the two broadcast expansion joins — which fan each text
    # pair out to |ids_a|x|ids_b| rows and then feed the md5 pair-hash
    # aggregation — at the verified side's near-single-partition
    # parallelism: the multi-million-row expansion ran almost serially.
    # repartition-by-key with an explicit count is NOT AQE-coalesced,
    # so the expansion and the consumer's partial aggregation
    # parallelize over text pairs (plan: Exchange count +1, measured
    # 3.8x on jw_part_pairs — OPTIMIZATION_r13.md).
    verified = spread(verified, "ta", "tb")
    # expansion joins carry the BLOCK KEY alongside the text (the
    # fuzzy_self_join contract): with a blocker not derived from the
    # text, a text-only join would emit cross-block pairs
    ia = base.select(F.col("id").alias("__ia"), F.col("t").alias("ta"),
                     "__b")
    ib = base.select(F.col("id").alias("__ib"), F.col("t").alias("tb"),
                     "__b")
    return (
        verified.join(ia, ["ta", "__b"]).join(ib, ["tb", "__b"])
        .where(F.col("__ia") != F.col("__ib"))
        .where((F.col("ta") < F.col("tb")) | (F.col("__ia") < F.col("__ib")))
        .select(
            F.least("__ia", "__ib").alias("id_a"),
            F.greatest("__ia", "__ib").alias("id_b"),
            F.when(F.col("__ia") < F.col("__ib"), F.col("ta"))
             .otherwise(F.col("tb")).alias("text_a"),
            F.when(F.col("__ia") < F.col("__ib"), F.col("tb"))
             .otherwise(F.col("ta")).alias("text_b"),
            "jw")
    )


def _deletion_variants(col: Column | str) -> Column:
    """The word plus every single-character-deletion of it — the
    SymSpell blocking key set. |word|+1 variants per word, so the
    blocking fan-out is linear in corpus characters."""
    c = F.col(col) if isinstance(col, str) else col
    dels = F.transform(
        F.sequence(F.lit(1), F.length(c)),
        lambda i: F.concat(c.substr(F.lit(1), i - 1),
                           c.substr(i + 1, F.length(c))))
    return F.array_union(F.array(c), dels)


def spell_suggest(word_counts: DataFrame, word_col: str, freq_col: str,
                  min_vocab_freq: int = 5,
                  max_unknown_freq: int = 1,
                  max_word_len: int = 24) -> DataFrame:
    """'Did you mean' for corpus cleanup: for each rare token (freq ≤
    ``max_unknown_freq``, the presumed-typo tail), the best vocabulary
    word (freq ≥ ``min_vocab_freq``) at Damerau-free edit distance
    EXACTLY 1 — ``(word, suggestion, suggestion_freq)``, one row per
    correctable word (unmatched words are dropped; ties broken by
    frequency desc then suggestion asc).

    Candidate generation is the SymSpell deletion trick, not an
    all-pairs distance join: two words are within levenshtein 1 only if
    they share a member of each other's 1-deletion neighborhood (the
    word itself + each single-char deletion), so an EQUI-join on
    exploded variants finds every candidate — O(Σ|word|) blocking keys
    versus the O(|unknown|·|vocab|) cross product a naive fuzzy join
    pays. The shared-variant filter is complete for distance ≤ 1 and
    then JVM ``levenshtein`` verifies == 1 exactly (the variant join
    also admits some distance-2 pairs, e.g. transpositions — verify
    removes them). ``max_word_len`` bounds per-word fan-out; hot
    variants (short strings) are plain join keys, AQE skew-split.
    """
    base = (word_counts
            .select(F.col(word_col).alias("w"),
                    F.col(freq_col).cast("long").alias("f"))
            .filter(F.length("w").between(1, max_word_len)))
    unk = base.filter(F.col("f") <= max_unknown_freq)
    voc = base.filter(F.col("f") >= min_vocab_freq)
    if min_vocab_freq <= max_unknown_freq:
        raise ValueError("vocab and unknown bands must not overlap")
    uv = unk.select("w", F.explode(_deletion_variants("w")).alias("__k"))
    vv = voc.select(F.col("w").alias("s"), F.col("f").alias("sf"),
                    F.explode(_deletion_variants("w")).alias("__k"))
    cand = (uv.join(vv, "__k")
            .select("w", "s", "sf").distinct()
            .filter(F.levenshtein("w", "s") == 1))
    win = Window.partitionBy("w").orderBy(F.col("sf").desc(),
                                          F.col("s").asc())
    return (cand.withColumn("__rn", F.row_number().over(win))
            .filter(F.col("__rn") == 1)
            .select(F.col("w").alias("word"),
                    F.col("s").alias("suggestion"),
                    F.col("sf").alias("suggestion_freq")))


def fellegi_sunter(pairs: DataFrame,
                   field_params: dict[str, tuple[float, float]],
                   upper: float, lower: float,
                   round_dp: int = 6) -> DataFrame:
    """Fellegi–Sunter probabilistic record-linkage scoring (JASA 1969;
    the model under Splink/RecordLinkage): given candidate pairs with
    one BOOLEAN agreement column per compared field, add the classic
    log₂ match weight — ``log2(m/u)`` when the field agrees,
    ``log2((1−m)/(1−u))`` when it disagrees — and classify by the two
    thresholds: ``weight ≥ upper`` → 'match', ``≤ lower`` →
    'non_match', else 'possible' (the clerical-review band).
    ``field_params`` maps agreement column → ``(m, u)`` where m =
    P(agree | same entity), u = P(agree | different entities).
    A NULL agreement boolean (the comparison itself was impossible —
    a missing field on either side) contributes the standard
    Fellegi–Sunter NEUTRAL weight 0.0: a missing comparison is no
    evidence either way, not a disagreement.

    Scoring is a FIXED left-to-right fold of per-field constants
    selected by integer booleans — no running float aggregation — so
    both engines compute identical doubles for every pair and the
    threshold classification cannot flap (the ``sprt_bernoulli``
    exactness contract). Blocking/candidate generation is the caller's
    job (equi-join on block keys; the deletion-neighborhood /
    LSH-bucket operators are the fuzzy options) — this operator is
    pure per-pair arithmetic, embarrassingly parallel at any scale.

    Returns the input plus ``(weight, decision)``.
    """
    import math

    if not field_params:
        raise ValueError("field_params must name at least one field")
    if upper < lower:
        raise ValueError("upper must be >= lower")
    w = None
    for fld, (m, u) in field_params.items():
        if not (0.0 < m < 1.0 and 0.0 < u < 1.0):
            raise ValueError(f"m/u for {fld!r} must be in (0, 1)")
        term = F.when(F.col(fld), F.lit(math.log2(m / u))) \
            .when(~F.col(fld), F.lit(math.log2((1.0 - m) / (1.0 - u)))) \
            .otherwise(F.lit(0.0))
        w = term if w is None else w + term
    return (pairs.withColumn("weight", F.round(w, round_dp))
            .withColumn("decision",
                        F.when(w >= F.lit(upper), F.lit("match"))
                        .when(w <= F.lit(lower), F.lit("non_match"))
                        .otherwise(F.lit("possible"))))
