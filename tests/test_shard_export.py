"""WebDataset tar shard export (operators/shard_export.py): layout,
budget bounds, manifest consistency, byte determinism."""

import hashlib
import json
import os
import tarfile

from pyspark.sql import functions as F

from ai_incident_analyst_spark.operators.packing import (
    shard_by_token_budget,
)
from ai_incident_analyst_spark.operators.shard_export import (
    write_webdataset_shards,
)
from ai_incident_analyst_spark.operators.text_analysis import token_count
from ai_incident_analyst_spark.sources.tables import load_table


def _docs(spark, sf_dir, n=120):
    return (load_table(spark, sf_dir, "documents").limit(n)
            .select("doc_id", "text", "lang",
                    token_count("text").alias("n_tok")))


def _shard_md5s(path):
    return {f: hashlib.md5(open(os.path.join(path, f), "rb").read())
            .hexdigest()
            for f in sorted(os.listdir(path)) if f.endswith(".tar")}


def test_export_layout_manifest_and_budget(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    out = str(tmp_path / "shards")
    manifest = {r.shard_id: r
                for r in write_webdataset_shards(
                    docs, out, budget=500, meta_cols=["lang"]).collect()}

    # manifest agrees with the pure assignment operator
    want = {r.shard_id: (r.n_docs, r.n_tokens) for r in
            shard_by_token_budget(docs, "doc_id", "n_tok", 500)
            .groupBy("shard_id")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_tok").alias("n_tokens")).collect()}
    assert {k: (m.n_docs, m.n_tokens) for k, m in manifest.items()} == want

    # every tar exists, holds (txt, json) pairs in sorted-id order, and
    # the json meta carries the token count + meta cols
    rows = {r.doc_id: r for r in docs.collect()}
    max_tok = max(r.n_tok for r in rows.values())
    seen = set()
    for sid, m in manifest.items():
        # budget bound: a shard holds < budget + max_doc_tokens tokens
        assert m.n_tokens < 500 + max_tok
        with tarfile.open(os.path.join(out, m.file)) as tar:
            names = tar.getnames()
            # WebDataset layout: one (txt, json) pair per key, pairs
            # adjacent, keys in ascending id order
            assert names[::2] == [n for n in names if n.endswith(".txt")]
            assert names[1::2] == [n[:-4] + ".json" for n in names[::2]]
            keys = [n[:-4] for n in names if n.endswith(".txt")]
            assert keys == sorted(keys)
            assert len(keys) == m.n_docs
            for k in keys:
                did = int(k)
                seen.add(did)
                txt = tar.extractfile(f"{k}.txt").read().decode()
                meta = json.loads(tar.extractfile(f"{k}.json").read())
                assert txt == (rows[did].text or "")
                assert meta["n_tok"] == rows[did].n_tok
                assert meta["lang"] == rows[did].lang
    assert seen == set(rows)  # every doc exported exactly once


def test_export_is_byte_deterministic(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir, n=60)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_webdataset_shards(docs, a, budget=400).collect()
    write_webdataset_shards(docs.repartition(7), b, budget=400).collect()
    ha, hb = _shard_md5s(a), _shard_md5s(b)
    assert ha and ha == hb  # identical bytes across partitionings


def test_roundtrip_read_webdataset(spark, sf_dir, tmp_path):
    """Export → ingest round-trip: every doc comes back with its exact
    text and token count; a shard with an unpaired member yields a NULL
    half instead of failing the read."""
    from pyspark.sql import functions as F

    from ai_incident_analyst_spark.operators.shard_export import (
        read_webdataset_shards,
    )

    docs = _docs(spark, sf_dir, n=80)
    out = str(tmp_path / "shards")
    write_webdataset_shards(docs, out, budget=600,
                            meta_cols=["lang"]).collect()

    back = read_webdataset_shards(spark, out) \
        .withColumn("doc_id", F.col("key").cast("long")) \
        .withColumn("n_tok", F.get_json_object("meta", "$.n_tok")
                    .cast("long")) \
        .withColumn("lang", F.get_json_object("meta", "$.lang"))
    got = {r.doc_id: r for r in back.collect()}
    want = {r.doc_id: r for r in docs.collect()}
    assert set(got) == set(want)
    for d, w in want.items():
        assert got[d].text == (w.text or "")
        assert got[d].n_tok == w.n_tok
        assert got[d].lang == w.lang

    # unpaired member: txt with no json → meta NULL, read survives
    import io as _io
    import tarfile as _tarfile

    from ai_incident_analyst_spark.operators.shard_export import (
        _deterministic_member,
    )
    buf = _io.BytesIO()
    with _tarfile.open(fileobj=buf, mode="w") as tar:
        payload = b"orphan text"
        tar.addfile(_deterministic_member("999999999999.txt", payload),
                    _io.BytesIO(payload))
    lone = str(tmp_path / "lone")
    os.makedirs(lone)
    with open(os.path.join(lone, "shard-999999.tar"), "wb") as f:
        f.write(buf.getvalue())
    orphan = read_webdataset_shards(spark, lone).collect()
    assert len(orphan) == 1
    assert orphan[0].text == "orphan text" and orphan[0].meta is None
