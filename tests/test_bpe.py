"""BPE trainer/encoder (operators/bpe.py): hand-computed merge sequence
on the classic example corpus, encode determinism, count parity with a
pure-Python reference."""

from pyspark.sql import functions as F

from ai_incident_analyst_spark.operators.bpe import (
    EOW,
    bpe_encode_counts,
    bpe_train,
    encode_word,
    word_counts,
)


def _corpus(spark):
    # the classic BPE teaching corpus (Sennrich et al. example shape)
    rows = [(1, "low low low low low"),
            (2, "lower lower"),
            (3, "newest newest newest newest newest newest"),
            (4, "widest widest widest")]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_word_counts(spark):
    wc = {r.w: r.c for r in word_counts(_corpus(spark), "text").collect()}
    assert wc == {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def test_bpe_train_hand_sequence(spark):
    """First merges on the classic corpus are derivable by hand:
    'es' (9 = newest 6 + widest 3), then 'es'+'t' (9), then 'est'+EOW,
    then 'l'+'o' (7 = low 5 + lower 2), then 'lo'+'w' (7)."""
    merges = bpe_train(_corpus(spark), "text", num_merges=5)
    assert merges == [("e", "s"), ("es", "t"), ("est", EOW),
                      ("l", "o"), ("lo", "w")]


def test_encode_word_greedy(spark):
    merges = bpe_train(_corpus(spark), "text", num_merges=5)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    assert encode_word("lowest", ranks) == ["low", "est" + EOW]
    assert encode_word("low", ranks) == ["low", EOW]  # no 'low</w>' merge yet
    assert encode_word("zzz", ranks) == ["z", "z", "z", EOW]


def test_bpe_encode_counts_matches_reference(spark):
    df = _corpus(spark).repartition(3)
    merges = bpe_train(df, "text", num_merges=5)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    out = {r.doc_id: r.n_bpe_tokens
           for r in bpe_encode_counts(df, "doc_id", "text", merges).collect()}
    expect = {}
    for doc_id, text in [(r.doc_id, r.text) for r in _corpus(spark).collect()]:
        expect[doc_id] = sum(len(encode_word(w, ranks))
                             for w in text.lower().split())
    assert out == expect
    # determinism across partitionings
    out1 = {r.doc_id: r.n_bpe_tokens
            for r in bpe_encode_counts(_corpus(spark).repartition(1),
                                       "doc_id", "text", merges).collect()}
    assert out1 == out


def test_bpe_train_collect_is_capped(spark):
    """Adversarial corpus: every doc contributes unique garbage tokens
    (hashes/URL-ish junk), so distinct words grow with the corpus. The
    max_vocab_rows cap must bound the driver collect to the top-N by
    (count desc, word asc) — the frequent real words survive, the junk
    tail is dropped, and the merge list equals training on the frequent
    words alone."""
    junk = [(i, f"low low newest xq{i:04d}h href{i:04d}z") for i in range(200)]
    df = spark.createDataFrame(junk, "doc_id long, text string")
    # 3 real words + 400 singleton junk words; cap keeps only the top 3
    merges_capped = bpe_train(df, "text", num_merges=5, max_vocab_rows=3)
    clean = spark.createDataFrame(
        [(0, " ".join(["low low newest"] * 200))], "doc_id long, text string")
    merges_clean = bpe_train(clean, "text", num_merges=5)
    assert merges_capped == merges_clean
    # min_word_count filters the singleton junk the same way
    merges_minc = bpe_train(df, "text", num_merges=5, min_word_count=2)
    assert merges_minc == merges_clean
    # defaults (large cap) still see everything and stay deterministic
    assert bpe_train(df, "text", num_merges=5) == \
        bpe_train(df.repartition(7), "text", num_merges=5)


def test_bpe_train_on_testdata(spark, sf_dir):
    """Trainer runs on the real documents table; merges are deterministic
    across two runs and encoding compresses vs character count."""
    from ai_incident_analyst_spark.sources.tables import load_table
    docs = load_table(spark, sf_dir, "documents")
    m1 = bpe_train(docs, "text", num_merges=30)
    m2 = bpe_train(docs, "text", num_merges=30)
    assert m1 == m2 and len(m1) == 30
    enc = bpe_encode_counts(docs.select("doc_id", "text"), "doc_id", "text",
                            m1)
    row = enc.agg(F.sum("n_bpe_tokens").alias("tok"),
                  F.sum(F.length("text")).alias("chars")).first()
    assert 0 < row.tok < row.chars


def test_rank_order_application_equals_greedy(spark, sf_dir):
    """The twin-SQL equivalence (_bpe_trained_sql): applying the trained
    merges sequentially in rank order — all occurrences, left-to-right
    non-overlapping per merge — must segment every corpus word exactly
    like the greedy lowest-rank ``encode_word``. This is the classic BPE
    property the hash-matched oracle relies on; assert it directly over
    the real testdata vocabulary."""
    from ai_incident_analyst_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    merges = bpe_train(docs, "text", num_merges=30)
    ranks = {p: i for i, p in enumerate(merges)}
    words = [r.w for r in word_counts(docs, "text").collect()]

    def apply_in_rank_order(word: str) -> list[str]:
        sym = list(word) + [EOW]
        for a, b in merges:
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            sym = out
        return sym

    assert words
    for w in words:
        assert apply_in_rank_order(w) == encode_word(w, ranks), w


def test_encode_tokens_matches_counts_and_order(spark):
    """bpe_encode_tokens: sequence length == bpe_encode_counts count for
    every doc, and the sequence preserves document word order."""
    from ai_incident_analyst_spark.operators.bpe import bpe_encode_tokens

    docs = _corpus(spark)
    merges = bpe_train(docs, "text", num_merges=5)
    toks = {r.doc_id: r.tokens
            for r in bpe_encode_tokens(docs, "doc_id", "text",
                                       merges).collect()}
    cnts = {r.doc_id: r.n_bpe_tokens
            for r in bpe_encode_counts(docs, "doc_id", "text",
                                       merges).collect()}
    assert {d: len(t) for d, t in toks.items()} == cnts
    # doc 1 = "low low low low low": with merges (e,s)(es,t)(est,EOW)
    # (l,o)(lo,w), each "low" encodes as ["low", EOW]? no — 'low'+EOW
    # needs a (low, EOW) merge that isn't in the top-5; expect
    # ["low", "</w>"] * 5 exactly, in order
    ranks = {p: i for i, p in enumerate(merges)}
    expect = encode_word("low", ranks) * 5
    assert toks[1] == expect
    # word order: doc 2 = "lower lower" — tokens for 'lower' twice
    assert toks[2] == encode_word("lower", ranks) * 2


def test_vocab_ids_and_id_encode(spark):
    """bpe_vocab_ids: deterministic (freq DESC, token ASC) ids covering
    exactly the encoded corpus's tokens; bpe_encode_ids round-trips
    through the vocab (no -1 on the training corpus) and maps held-out
    tokens to the unk sentinel."""
    from ai_incident_analyst_spark.operators.bpe import (
        bpe_encode_ids,
        bpe_encode_tokens,
        bpe_vocab_ids,
    )

    docs = _corpus(spark)
    merges = bpe_train(docs, "text", num_merges=5)
    vdf = bpe_vocab_ids(docs, "text", merges).collect()
    vocab = {r.token: r.tid for r in vdf}
    # ids are 0..n-1, bijective, ranked by freq desc then token asc
    assert sorted(vocab.values()) == list(range(len(vocab)))
    ranked = sorted(vdf, key=lambda r: (-r.freq, r.token))
    assert [r.tid for r in ranked] == list(range(len(vdf)))

    toks = {r.doc_id: r.tokens
            for r in bpe_encode_tokens(docs, "doc_id", "text",
                                       merges).collect()}
    ids = {r.doc_id: r.token_ids
           for r in bpe_encode_ids(docs, "doc_id", "text", merges,
                                   vocab).collect()}
    inv = {v: k for k, v in vocab.items()}
    for d in toks:
        assert [inv[i] for i in ids[d]] == toks[d]   # exact round-trip
        assert -1 not in ids[d]

    # held-out text with a character the corpus never saw → unk id
    held = spark.createDataFrame([(9, "zzz?")], "doc_id long, text string")
    out = bpe_encode_ids(held, "doc_id", "text", merges, vocab).first()
    assert -1 in out.token_ids
