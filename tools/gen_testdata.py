"""Generate a DISTRIBUTIONAL TWIN of the driver's synthetic testdata at an
arbitrary scale factor — used for the sf1 scaling probe (the driver only
ships sf0.001/0.01/0.1 under /root/testdata, which is read-only).

This is NOT byte-identical to the driver's data (its generator is not
published); it reproduces every distribution the r10 profiling session
measured on /root/testdata/sf{0.001,0.01,0.1} so that per-query wall-time
RATIOS between driver SFs and generated SFs are meaningful:

- row counts per table scale as: customer 150k*sf, supplier 10k*sf,
  part 200k*sf, orders 1.5M*sf, events 1M*sf, documents 50k*sf (min 500),
  embeddings 20k*sf (min 500); region=5 / nation=25 fixed; lineitem is
  Poisson(4) lines per order (measured: 147236/150000 orders non-empty at
  sf0.1 = the Poisson(4) zero-class; per-order counts 1..17 match).
- part: 8 adjectives x 8 nouns = 64 distinct two-word names (the
  jw_part_pairs quadratic-blocker property), Brand#1..25, 6 types,
  size 1..50, retailprice = 900 + 0.1*(key % 1000).
- orders: status P/F/O uniform, totalprice U(1000, 500000) 2dp,
  orderdate uniform over the 2405 days from 1995-01-01.
- lineitem: partkey/suppkey uniform, linenumber U{1..7}, quantity
  U{1..50}, extendedprice U(900, 105000) 2dp, discount {0..0.10},
  tax {0..0.08}, flags A/N/R x F/O, shipdate uniform 1995-01-02 +2498d
  (measured: shipdate is INDEPENDENT of orderdate in the driver data).
- events: Poisson process over exactly 30 days from 2024-01-01
  (exponential inter-arrivals — measured mean/median ratio ln2),
  user_id U{0..15000*sf-1}, 5 event types uniform, value Exp(mean 50)
  2dp, props = {"k": U{0..99}}.
- documents: text = 10..100 uniform draws from the driver's exact
  31-word vocab, lang ~ (en .4, de/es/fr/zh .15), source = src{id%20},
  n_chars = len(text); 0.16% of docs are EXACT copies of a random
  earlier doc (measured: 8 duplicate pairs / 5000 docs at sf0.1).
- embeddings: 64-dim unit-normalized N(0,1) float32 (measured: label
  centroids are cosine-orthogonal and within-label cosine matches the
  sqrt(1/n) noise floor -> labels carry no geometric signal),
  label U{0..9} int32.

Usage: python tools/gen_testdata.py <sf> [out_dir]
       (default out_dir /root/repo/testdata/sf<sf>)

ZIPF MODE (round-12 judge ask): the driver's documents corpus draws
every token uniformly from a 31-word vocab, which makes the near-dup
scale laws OUTPUT-bound — random doc pairs share most of their token
set, the true Hamming<=5 pair set grows ~101x per 10x docs, and the
SimHash fingerprints concentrate (low key entropy), so no blocking
scheme can look subquadratic and the Manku multi-chunk candidate cut
is unmeasurable. `--zipf` writes a REALISTIC-VOCAB documents table
instead (everything else unchanged):

- vocab: 50,000 tokens "w0".."w49999", frequency Zipf(s=1.07) SHIFTED
  BY 100 RANKS (p_k ∝ (k+100)^-1.07) — the content-word distribution
  AFTER stopword removal, which is what production fingerprinting
  feeds (Manku's own pipeline fingerprints extracted features, not the
  raw token stream). The shift matters mechanically: per-occurrence
  SimHash votes concentrate when the head is heavy — with unshifted
  Zipf the shared expected-vote vector has sigma_p = sqrt(Σp²) ≈ 0.115
  per bit vs multinomial noise ~1/sqrt(L), so at L≈100 tokens ALL
  fingerprints collapse toward one point and 3% of RANDOM pairs land
  at Hamming ≤ 5 (measured on the first cut of this corpus: 3783
  pairs / 500 docs — still output-bound). Shifted, sigma_p ≈ 0.017,
  fingerprint bits are near-uniform and the background d≤5 rate is the
  binomial floor C(60,≤5)/2^60 ≈ 5e-9 — ~0.6 expected background
  pairs even at 500k docs.
- doc length U{40..160} tokens; background docs are independent draws
  (pairwise Jaccard ~1e-2).
- planted near-dup structure, LINEAR in n (each special doc copies ONE
  uniformly-random earlier doc): 8% near-dups with 2% of token
  positions resampled (shifts each bit's vote by at most 2·#changed
  against a ~sqrt(L) margin — most planted pairs stay within d ≤ 5)
  and 2% exact copies. True-pair count therefore grows ~n, not n² —
  the sparse-pair regime where candidate generation, not output, is
  the term being measured.

Usage: python tools/gen_testdata.py --zipf <sf> [out_dir]
       (default out_dir /root/repo/testdata/zipf-sf<sf>; writes
       documents.parquet ONLY — the near-dup family reads nothing else)

CLUSTERED MODE (round-13 judge ask): the driver's embeddings table is
isotropic N(0,1) unit-normalized — the FRIENDLIEST regime for IVF cell
balance (trained cells come out near-uniform), so every vector-family
scale cell measured on it rides a best case. Real embedding corpora
cluster — that is the whole premise of semantic dedup and of the
reference embedding incident logs at all (reference embedder.py:16,
faiss_db.py:43). `--clustered` writes an embeddings.parquet with a
deterministic Gaussian mixture instead (schema identical: vec_id int64,
embedding list<float32> unit-normalized 64-dim, label int32 U{0..9}):

- 64 cluster centers: unit-normalized N(0,1) draws (near-orthogonal in
  64-dim, like topic centroids in a sentence-embedding space).
- cluster MASSES are Zipf(1.07) (p_k ∝ k^-1.07, k=1..64): the head
  cluster holds ~21% of clustered points — a genuinely hot IVF cell,
  the regime the isotropic twin cannot produce.
- 10% of points are an isotropic noise floor (background docs that
  belong to no topic); the other 90% are center + N(0, σ²I), σ=0.0625
  → within-cluster cosine ≈ 1/(1+64σ²) ≈ 0.80, between-cluster ≈ 0
  (matches MiniLM-class topical corpora: tight topics, orthogonal
  topics).
- labels stay U{0..9} random (geometry-free) so every existing query
  and oracle runs unchanged on this dir.

Usage: python tools/gen_testdata.py --clustered <sf> [out_dir]
       (default out_dir /root/repo/testdata/clustered-sf<sf>; writes
       embeddings.parquet ONLY — the vector family reads nothing else)
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = ["a", "agg", "batch", "big", "column", "customer", "data", "dup",
         "fast", "filter", "group", "hash", "join", "key", "line",
         "merge", "order", "part", "query", "row", "scan", "slow",
         "small", "sort", "spark", "stream", "table", "the", "value",
         "vector", "window"]
ADJ = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
NOUN = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.4, 0.15, 0.15, 0.15, 0.15]


def write(df: pd.DataFrame, out_dir: str, name: str):
    df.to_parquet(os.path.join(out_dir, f"{name}.parquet"), index=False)
    print(f"# {name}: {len(df)} rows", file=sys.stderr)


def gen_zipf_documents(sf: float, out_dir: str) -> None:
    """Realistic-vocab documents twin: Zipf(1.07) over 50k tokens with a
    linear planted near-dup set (8% mutated copies + 2% exact copies of
    one random earlier doc each). Deterministic (seed 42)."""
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(42)
    n_doc = max(500, int(50_000 * sf))
    V = 50_000
    # rank shift 100 = stopwords removed upstream (see module docstring:
    # unshifted Zipf concentrates per-occurrence SimHash fingerprints)
    p = (np.arange(1, V + 1, dtype=np.float64) + 100.0) ** -1.07
    cdf = np.cumsum(p / p.sum())
    # float cumsum can leave cdf[-1] a ulp below 1.0, and a uniform draw
    # above it would make searchsorted return V (IndexError into vocab)
    # — ~1e-16/draw but nonzero over 5e7 sf10 draws (r13, ADVICE)
    cdf[-1] = 1.0
    vocab = np.array([f"w{i}" for i in range(V)])

    lens = rng.integers(40, 161, n_doc)
    offs = np.concatenate([[0], np.cumsum(lens)])
    flat = np.searchsorted(cdf, rng.random(offs[-1])).astype(np.int32)
    docs_tok = [flat[offs[i]:offs[i + 1]] for i in range(n_doc)]

    kind = rng.random(n_doc)
    start = n_doc // 4  # first quarter is always background
    n_near = n_exact = 0
    for i in range(start, n_doc):
        if kind[i] < 0.08:  # near-dup: copy + resample 2% of positions
            base = docs_tok[int(rng.integers(0, i))].copy()
            m = rng.random(len(base)) < 0.02
            base[m] = np.searchsorted(cdf, rng.random(int(m.sum())))
            docs_tok[i] = base
            n_near += 1
        elif kind[i] < 0.10:  # exact copy
            docs_tok[i] = docs_tok[int(rng.integers(0, i))]
            n_exact += 1
    print(f"# zipf documents: {n_doc} rows, {n_near} near-dup + "
          f"{n_exact} exact planted", file=sys.stderr)

    texts = [" ".join(vocab[t]) for t in docs_tok]
    write(pd.DataFrame({
        "doc_id": np.arange(n_doc, dtype=np.int64),
        "text": texts,
        "lang": rng.choice(LANGS, n_doc, p=LANG_P),
        "source": [f"src{i % 20}" for i in range(n_doc)],
        "n_chars": np.array([len(t) for t in texts],
                            dtype=np.int64)}), out_dir, "documents")


def gen_clustered_embeddings(sf: float, out_dir: str) -> None:
    """Clustered embeddings twin: 64-center Gaussian mixture with
    Zipf(1.07) cluster masses + 10% isotropic noise floor (see module
    docstring, CLUSTERED MODE). Deterministic (seed 42)."""
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(42)
    n_vec = max(500, int(20_000 * sf))
    K, D, SIGMA = 64, 64, 0.0625

    centers = rng.standard_normal((K, D))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    p = np.arange(1, K + 1, dtype=np.float64) ** -1.07
    p /= p.sum()

    is_noise = rng.random(n_vec) < 0.10
    cid = rng.choice(K, n_vec, p=p)
    emb = rng.standard_normal((n_vec, D)).astype(np.float64)
    # clustered points: center + sigma*noise; noise-floor points keep
    # the raw isotropic draw
    emb[~is_noise] = centers[cid[~is_noise]] + SIGMA * emb[~is_noise]
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    emb = emb.astype(np.float32)
    head = np.bincount(cid[~is_noise], minlength=K).max()
    print(f"# clustered embeddings: {n_vec} rows, {int(is_noise.sum())} "
          f"noise-floor, head cluster {head} pts", file=sys.stderr)

    tbl = pa.table({
        "vec_id": pa.array(np.arange(n_vec, dtype=np.int64)),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(emb.reshape(-1), type=pa.float32()), D).cast(
            pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n_vec).astype(np.int32))})
    pq.write_table(tbl, os.path.join(out_dir, "embeddings.parquet"))


def main():
    if sys.argv[1] == "--clustered":
        sf = float(sys.argv[2])
        out_dir = sys.argv[3] if len(sys.argv) > 3 else \
            f"/root/repo/testdata/clustered-sf{sys.argv[2]}"
        gen_clustered_embeddings(sf, out_dir)
        return
    if sys.argv[1] == "--zipf":
        sf = float(sys.argv[2])
        out_dir = sys.argv[3] if len(sys.argv) > 3 else \
            f"/root/repo/testdata/zipf-sf{sys.argv[2]}"
        gen_zipf_documents(sf, out_dir)
        return
    sf = float(sys.argv[1])
    out_dir = sys.argv[2] if len(sys.argv) > 2 else \
        f"/root/repo/testdata/sf{sys.argv[1]}"
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(42)

    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_evt = int(1_000_000 * sf)
    n_user = int(15_000 * sf)
    n_doc = max(500, int(50_000 * sf))
    n_vec = max(500, int(20_000 * sf))

    write(pd.DataFrame({
        "r_regionkey": np.arange(5, dtype=np.int64).astype(np.int32),
        "r_name": REGIONS}), out_dir, "region")
    write(pd.DataFrame({
        "n_nationkey": np.arange(25, dtype=np.int64).astype(np.int32),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": (np.arange(25) % 5).astype(np.int32)}),
        out_dir, "nation")

    write(pd.DataFrame({
        "c_custkey": np.arange(n_cust, dtype=np.int64),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": rng.integers(0, 25, n_cust).astype(np.int32),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": np.array(SEGMENTS)[
            rng.integers(0, 5, n_cust)]}), out_dir, "customer")

    write(pd.DataFrame({
        "s_suppkey": np.arange(n_supp, dtype=np.int64),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": rng.integers(0, 25, n_supp).astype(np.int32),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2)}),
        out_dir, "supplier")

    keys = np.arange(n_part, dtype=np.int64)
    write(pd.DataFrame({
        "p_partkey": keys,
        "p_name": [f"{ADJ[a]} {NOUN[n]}" for a, n in zip(
            rng.integers(0, 8, n_part), rng.integers(0, 8, n_part))],
        "p_brand": [f"Brand#{b}" for b in rng.integers(1, 26, n_part)],
        "p_type": np.array(TYPES)[rng.integers(0, 6, n_part)],
        "p_size": rng.integers(1, 51, n_part).astype(np.int32),
        "p_retailprice": np.round(900.0 + 0.1 * (keys % 1000), 2)}),
        out_dir, "part")

    odate = (np.datetime64("1995-01-01", "us")
             + rng.integers(0, 2405, n_ord)
             * np.timedelta64(86_400_000_000, "us"))
    write(pd.DataFrame({
        "o_orderkey": np.arange(n_ord, dtype=np.int64),
        "o_custkey": rng.integers(0, n_cust, n_ord).astype(np.int64),
        "o_orderstatus": np.array(["P", "F", "O"])[
            rng.integers(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(1000, 500_000, n_ord), 2),
        "o_orderdate": odate,
        "o_orderpriority": np.array(PRIORITIES)[
            rng.integers(0, 5, n_ord)]}), out_dir, "orders")

    lines_per = rng.poisson(4.0, n_ord)
    l_ord = np.repeat(np.arange(n_ord, dtype=np.int64), lines_per)
    n_li = len(l_ord)
    sdate = (np.datetime64("1995-01-02", "us")
             + rng.integers(0, 2499, n_li)
             * np.timedelta64(86_400_000_000, "us"))
    write(pd.DataFrame({
        "l_orderkey": l_ord,
        "l_partkey": rng.integers(0, n_part, n_li).astype(np.int64),
        "l_suppkey": rng.integers(0, n_supp, n_li).astype(np.int64),
        "l_linenumber": rng.integers(1, 8, n_li).astype(np.int32),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105_000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) * 0.01, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) * 0.01, 2),
        "l_returnflag": np.array(["A", "N", "R"])[
            rng.integers(0, 3, n_li)],
        "l_linestatus": np.array(["F", "O"])[rng.integers(0, 2, n_li)],
        "l_shipdate": sdate}), out_dir, "lineitem")

    # Poisson process: n_evt exponential inter-arrivals rescaled to span
    # exactly 30 days (matches the fixed-window, density-scales design)
    gaps = rng.exponential(1.0, n_evt)
    ts_sec = np.cumsum(gaps)
    ts_sec *= (30 * 86_400) / ts_sec[-1] * (1 - 1e-6)
    ts = (np.datetime64("2024-01-01", "us")
          + (ts_sec * 1e6).astype(np.int64).astype("timedelta64[us]"))
    write(pd.DataFrame({
        "event_id": np.arange(n_evt, dtype=np.int64),
        "ts": ts,
        "user_id": rng.integers(0, n_user, n_evt).astype(np.int64),
        "event_type": np.array(EVENT_TYPES)[rng.integers(0, 5, n_evt)],
        "value": np.round(rng.exponential(50.0, n_evt), 2),
        "props": [json.dumps({"k": int(k)})
                  for k in rng.integers(0, 100, n_evt)]}),
        out_dir, "events")

    lens = rng.integers(10, 101, n_doc)
    vocab = np.array(VOCAB)
    texts = [" ".join(vocab[rng.integers(0, len(VOCAB), ln)])
             for ln in lens]
    # exact-duplicate injection at the measured 0.16% rate
    n_dup = int(round(0.0016 * n_doc))
    for tgt in rng.choice(np.arange(n_doc // 4, n_doc), n_dup,
                          replace=False):
        texts[tgt] = texts[int(rng.integers(0, n_doc // 4))]
    write(pd.DataFrame({
        "doc_id": np.arange(n_doc, dtype=np.int64),
        "text": texts,
        "lang": rng.choice(LANGS, n_doc, p=LANG_P),
        "source": [f"src{i % 20}" for i in range(n_doc)],
        "n_chars": np.array([len(t) for t in texts],
                            dtype=np.int64)}), out_dir, "documents")

    emb = rng.standard_normal((n_vec, 64)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n_vec, dtype=np.int64)),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(emb.reshape(-1), type=pa.float32()), 64).cast(
            pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n_vec).astype(np.int32))})
    pq.write_table(tbl, os.path.join(out_dir, "embeddings.parquet"))
    print(f"# embeddings: {n_vec} rows", file=sys.stderr)


if __name__ == "__main__":
    main()
