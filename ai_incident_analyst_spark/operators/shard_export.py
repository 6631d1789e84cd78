"""WebDataset-style tar shard EXPORT — the last mile of the
training-data pipeline.

``shard_by_token_budget`` decides which contiguous ~budget-token shard
owns each document; this module materializes those shards as the tar
archives a dataloader actually consumes (the public WebDataset layout:
one ``{key}.txt`` + ``{key}.json`` member pair per sample, samples
contiguous within a ``shard-NNNNNN.tar``).

Physical design:

- Shard assignment is the two-phase distributed prefix sum from
  ``packing.py`` (append-stable, no single-task window).
- One shuffle groups each shard's docs onto one task
  (``groupBy(shard_id).applyInPandas``); the task streams its group
  into a single tar via stdlib ``tarfile`` and returns ONE manifest row
  — the driver never sees document bytes, and shards write in parallel
  across whatever executors the cluster has. Shard size is bounded by
  ``budget + max_doc_tokens`` by construction, so a task's working set
  is bounded no matter how big the corpus is.
- Tars are BYTE-DETERMINISTIC: members sorted by id, fixed zeroed
  mtime/uid/gid/mode metadata — re-exporting an unchanged corpus
  produces bit-identical archives (content-hash verification and
  resumable uploads fall out for free; asserted in
  tests/test_shard_export.py).
- ``path`` is a local/NFS directory here; on an object store the same
  pass writes to executor-local scratch and uploads, or targets a
  FUSE mount — the tar bytes are the contract, not the filesystem API.

No reference parity (the reference has no export stage); this is the
beyond-reference training-pipeline surface, downstream sibling of
``shard_manifest`` / ``training_shards_pipeline``.
"""

from __future__ import annotations

import io
import json
import os
import tarfile

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .packing import shard_by_token_budget

MANIFEST_SCHEMA = ("shard_id long, file string, n_docs long, "
                   "n_tokens long, n_bytes long")


def _deterministic_member(name: str, payload: bytes) -> tarfile.TarInfo:
    info = tarfile.TarInfo(name=name)
    info.size = len(payload)
    info.mtime = 0
    info.uid = info.gid = 0
    info.uname = info.gname = ""
    info.mode = 0o644
    return info


def write_webdataset_shards(df: DataFrame, path: str,
                            id_col: str = "doc_id",
                            text_col: str = "text",
                            tokens_col: str = "n_tok",
                            budget: int = 4000,
                            meta_cols: list[str] | None = None) -> DataFrame:
    """Export ``df`` as WebDataset tar shards under ``path``; returns
    the per-shard manifest ``(shard_id, file, n_docs, n_tokens,
    n_bytes)`` as a DataFrame (collect it or write it next to the
    shards).

    ``df`` needs ``id_col``, ``text_col`` and a precomputed
    ``tokens_col`` (the token counter is the caller's choice —
    whitespace, BPE, …). ``meta_cols`` ride into each sample's
    ``.json`` member alongside the token count.
    """
    meta_cols = list(meta_cols or [])
    os.makedirs(path, exist_ok=True)
    sharded = shard_by_token_budget(
        df.select(id_col, tokens_col), id_col, tokens_col, budget)
    data = df.select(id_col, text_col, *meta_cols) \
             .join(sharded, id_col)

    def write_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        shard_id = int(pdf["shard_id"].iloc[0])
        pdf = pdf.sort_values(id_col)
        fname = f"shard-{shard_id:06d}.tar"
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w",
                          format=tarfile.USTAR_FORMAT) as tar:
            for row in pdf.itertuples(index=False):
                d = row._asdict()
                key = f"{d[id_col]:012d}" if isinstance(d[id_col], int) \
                    else str(d[id_col])
                txt = (d[text_col] or "").encode("utf-8")
                meta = {"n_tok": int(d[tokens_col]),
                        **{c: d[c] for c in meta_cols}}
                js = json.dumps(meta, sort_keys=True,
                                default=str).encode("utf-8")
                tar.addfile(_deterministic_member(f"{key}.txt", txt),
                            io.BytesIO(txt))
                tar.addfile(_deterministic_member(f"{key}.json", js),
                            io.BytesIO(js))
        payload = buf.getvalue()
        with open(os.path.join(path, fname), "wb") as f:
            f.write(payload)
        return pd.DataFrame({
            "shard_id": [shard_id],
            "file": [fname],
            "n_docs": [len(pdf)],
            "n_tokens": [int(pdf[tokens_col].sum())],
            "n_bytes": [len(payload)],
        })

    return (
        data.groupBy("shard_id")
        .applyInPandas(write_shard, schema=MANIFEST_SCHEMA)
    )


def read_webdataset_shards(spark, path: str) -> DataFrame:
    """Ingest WebDataset tar shards back into a DataFrame — the
    consume side of ``write_webdataset_shards`` (training pipelines
    both emit and re-read this layout).

    ``binaryFile`` gives one row per tar (parallelism = one task per
    shard, which is the natural unit: a shard is budget-bounded, so a
    task's working set is bounded); an Arrow pass untars each archive
    and emits ``(shard_file, key, text, meta)`` with ``meta`` the raw
    JSON member string (``F.get_json_object``/``from_json`` downstream —
    schema-on-read, like the history source). Member pairing tolerates
    missing halves: a key with no ``.txt`` yields text NULL, no
    ``.json`` yields meta NULL — one malformed sample must not kill a
    100 TB ingest.
    """
    import tarfile as _tarfile
    from typing import Iterator as _Iterator

    files = (spark.read.format("binaryFile")
             .option("pathGlobFilter", "*.tar")
             .load(path)
             .select("path", "content"))

    def untar(batches: "_Iterator[pd.DataFrame]") -> "_Iterator[pd.DataFrame]":
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                txts: dict[str, str] = {}
                metas: dict[str, str] = {}
                with _tarfile.open(fileobj=io.BytesIO(row.content)) as tar:
                    for m in tar.getmembers():
                        if m.name.endswith(".txt"):
                            txts[m.name[:-4]] = \
                                tar.extractfile(m).read().decode("utf-8")
                        elif m.name.endswith(".json"):
                            metas[m.name[:-5]] = \
                                tar.extractfile(m).read().decode("utf-8")
                keys = sorted(set(txts) | set(metas))
                fname = os.path.basename(row.path)
                yield pd.DataFrame({
                    "shard_file": [fname] * len(keys),
                    "key": keys,
                    "text": [txts.get(k) for k in keys],
                    "meta": [metas.get(k) for k in keys],
                })

    return files.mapInPandas(
        untar, schema="shard_file string, key string, text string, "
                      "meta string")
