"""Perceptual image hashing (operators/multimodal.py:image_dhash /
dhash_neardup): band-packing hand-checks, real BMP decode branch,
fake-path md5 replay parity, pigeonhole recall, and plan contracts."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from ai_incident_analyst_spark.operators.multimodal import (
    _pack_dhash_bands,
    _write_bmp,
    dhash_neardup,
    image_dhash,
    make_media_table,
)


def test_pack_bands_gradients():
    inc = np.tile(np.arange(9), (8, 1))          # rising row -> all bits
    assert _pack_dhash_bands(inc) == [65535] * 4
    dec = inc[:, ::-1]                            # falling row -> no bits
    assert _pack_dhash_bands(dec) == [0] * 4
    # one bit: row 0, col 0 only
    px = np.zeros((8, 9), dtype=np.int64)
    px[0, 1] = 5
    assert _pack_dhash_bands(px) == [1, 0, 0, 0]
    # row 1 contributes the high byte of band 0
    px = np.zeros((8, 9), dtype=np.int64)
    px[1, 1] = 5
    assert _pack_dhash_bands(px) == [256, 0, 0, 0]


def _py_fake_bands(payload: bytes):
    sha = hashlib.sha256(payload).hexdigest()
    px = np.array([[int(hashlib.md5(f"{sha}:{r}:{c}".encode())
                        .hexdigest()[:4], 16) % 256
                    for c in range(9)] for r in range(8)])
    return _pack_dhash_bands(px)


@pytest.fixture(scope="module")
def media(spark):
    df = spark.createDataFrame(
        [(0, "alpha doc"), (1, "beta doc"), (2, "alpha doc")],
        "doc_id long, text string")
    return make_media_table(df, "doc_id", "text")


def test_fake_dhash_matches_python_replay(spark, media):
    rows = {r["media_id"]: r for r in image_dhash(media).collect()}
    for mid, payload in ((0, b"alpha doc"), (1, b"beta doc")):
        want = _py_fake_bands(payload)
        got = [rows[mid][f"band_{i}"] for i in range(4)]
        assert got == want, mid
        assert rows[mid]["dhash"] == "%04x%04x%04x%04x" % tuple(want)
    # identical payloads -> identical signatures
    assert rows[0]["dhash"] == rows[2]["dhash"]


def test_fake_path_plan_no_udf_no_shuffle(spark, media):
    plan = image_dhash(media)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_real_bmp_branch_gradients(spark):
    inc = np.tile((np.arange(90) * 255 // 89).astype(np.uint8),
                  (40, 1))                       # 40x90, rising left→right
    rgb_inc = np.stack([inc] * 3, axis=-1)
    rgb_dec = rgb_inc[:, ::-1]
    df = spark.createDataFrame(
        [(0, bytearray(_write_bmp(rgb_inc))),
         (1, bytearray(_write_bmp(rgb_dec))),
         (2, bytearray(b"not an image"))],
        "media_id long, content binary")
    rows = {r["media_id"]: r for r in
            image_dhash(df, fake=False).collect()}
    assert [rows[0][f"band_{i}"] for i in range(4)] == [65535] * 4
    assert [rows[1][f"band_{i}"] for i in range(4)] == [0] * 4
    assert rows[2]["band_0"] is None and rows[2]["dhash"] is None


def test_real_branch_resize_invariance(spark):
    # the same gradient at 2x resolution hashes identically (that is
    # the point of a perceptual hash)
    base = np.tile((np.arange(90) * 255 // 89).astype(np.uint8), (40, 1))
    big = np.repeat(np.repeat(base, 2, axis=0), 2, axis=1)
    df = spark.createDataFrame(
        [(0, bytearray(_write_bmp(np.stack([base] * 3, -1)))),
         (1, bytearray(_write_bmp(np.stack([big] * 3, -1))))],
        "media_id long, content binary")
    rows = {r["media_id"]: r["dhash"] for r in
            image_dhash(df, fake=False).collect()}
    assert rows[0] == rows[1]


def _sig_df(spark, rows):
    return spark.createDataFrame(
        [(i, *b, "%04x%04x%04x%04x" % tuple(b)) for i, b in rows],
        "media_id long, band_0 long, band_1 long, band_2 long, "
        "band_3 long, dhash string")


def test_neardup_finds_close_misses_far(spark):
    base = [4660, 22136, 43981, 61389]
    flip2 = list(base)
    flip2[1] ^= 0b101                            # 2 bits in one band
    far = [b ^ 0b11111 for b in base]            # 20 bits apart
    sig = _sig_df(spark, [(0, base), (1, flip2), (2, far)])
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in dhash_neardup(sig, threshold=3).collect()}
    assert pairs == {(0, 1): 2}


def test_neardup_identical_all_bands(spark):
    sig = _sig_df(spark, [(0, [1, 2, 3, 4]), (1, [1, 2, 3, 4])])
    rows = dhash_neardup(sig, threshold=0).collect()
    assert [(r["id_a"], r["id_b"], r["hamming"]) for r in rows] \
        == [(0, 1, 0)]


def test_neardup_threshold_guard(spark):
    sig = _sig_df(spark, [(0, [0, 0, 0, 0])])
    with pytest.raises(ValueError):
        dhash_neardup(sig, threshold=4)
