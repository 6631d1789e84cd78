"""Multimodal (image/audio/video) column plumbing.

North-star operators for a training-data pipeline (BASELINE.json): media
rides as opaque ``binary`` columns + a typed metadata struct; decode /
feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages so bytes never round-trip through Python row by
row.

Codec boundary: the IMAGE kernels decode with PIL, the AUDIO kernel with
soundfile, the VIDEO kernel with PyAV — each real branch import-gated
exactly like the embedding operator's sentence-transformers branch
(``tests/test_embedding.py`` pattern): ``fake=False`` works wherever the
codec library is importable and raises NotImplementedError with the
install hint where it isn't (this container has no codecs, so those
tests auto-skip here). ``fake=True`` (default) uses a deterministic
stand-in seeded by content hash — the Spark-side plumbing (schema,
batch shape, partitioning) is real and tested either way.

Scale notes: media blobs dominate row size; keep them in their own table
keyed by content hash (dedup for free), partition by size bucket so Arrow
batches stay bounded (`spark.sql.execution.arrow.maxRecordsPerBatch`
interacts with row width), and push metadata-only predicates BEFORE the
decode stage so pruning happens on the cheap columns.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType([
    T.StructField("media_type", T.StringType()),   # image|audio|video
    T.StructField("format", T.StringType()),       # png|jpg|wav|mp4…
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.LongType()),
])

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("content", T.BinaryType()),
    T.StructField("meta", MEDIA_META),
])


def make_media_table(df: DataFrame, id_col: str, payload_col: str,
                     media_type: str = "image", fmt: str = "png") -> DataFrame:
    """Build a media table from any source column (test harness packs text
    bytes as the opaque payload). Adds the content-hash key used for
    exact dedup of blobs."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.col(payload_col).cast("binary").alias("content"),
        F.struct(
            F.lit(media_type).alias("media_type"), F.lit(fmt).alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
        F.sha2(F.col(payload_col).cast("binary"), 256).alias("content_sha256"),
    )


def _require(module: str, feature: str) -> None:
    """Fail fast on the DRIVER with the install hint when the codec
    library backing ``fake=False`` is missing; executors import it again
    inside the Arrow stage (per-worker, like the embedding model init)."""
    import importlib.util
    if importlib.util.find_spec(module) is None:
        raise NotImplementedError(
            f"{feature} with fake=False needs the '{module}' package, "
            f"which is not installed in this environment; install it "
            f"(e.g. pip install {'Pillow' if module == 'PIL' else module}) "
            f"or run with fake=True for the deterministic stand-in")


def _fake_features(blob: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a decoded-media feature vector."""
    h = hashlib.sha256(blob or b"").digest()
    rng = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
    return (rng % 1000).astype(np.float32) / 1000.0


def _bmp_pixels(blob: bytes) -> "np.ndarray":
    """Stdlib decode of an uncompressed 24/32-bit BMP to an (h, w, 3)
    uint8 RGB matrix — so one real IMAGE decode branch executes even
    where Pillow isn't installed (the ``_decode_wave_pcm`` pattern).
    Non-BMP / compressed / paletted blobs raise and the caller applies
    its undecodable-blob contract."""
    import struct

    if not blob or len(blob) < 54 or blob[:2] != b"BM":
        raise ValueError("not a BMP")
    off = struct.unpack_from("<I", blob, 10)[0]
    w, h = struct.unpack_from("<ii", blob, 18)
    bpp = struct.unpack_from("<H", blob, 28)[0]
    comp = struct.unpack_from("<I", blob, 30)[0]
    if comp != 0 or bpp not in (24, 32) or w <= 0 or h == 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, comp={comp})")
    flip = h > 0          # positive height → rows stored bottom-up
    h = abs(h)
    nb = bpp // 8
    stride = (w * nb + 3) & ~3
    arr = np.frombuffer(blob, dtype=np.uint8, count=stride * h, offset=off)
    arr = arr.reshape(h, stride)[:, :w * nb].reshape(h, w, nb)
    if flip:
        arr = arr[::-1]
    return arr[..., 2::-1]   # BMP stores BGR(A) → RGB


def _write_bmp(px: "np.ndarray") -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit uncompressed BMP bytes (the
    fallback re-encoder for ``resize_media``)."""
    import struct

    h, w, _ = px.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    body = rows.tobytes()
    hdr = b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                      2835, 2835, 0, 0)
    return hdr + dib + body


def _decode_bmp_gray(blob: bytes) -> "np.ndarray":
    """BMP → grayscale float32 matrix (ITU-R 601 luma, the same weights
    PIL's ``convert("L")`` uses)."""
    rgb = _bmp_pixels(blob).astype(np.float32)
    return (rgb[..., 0] * 299 + rgb[..., 1] * 587
            + rgb[..., 2] * 114) / 1000.0


def _nn_grid(mat: "np.ndarray", gh: int, gw: int) -> "np.ndarray":
    """Nearest-neighbor sample of a 2-D matrix onto a (gh, gw) grid —
    the fallback's deterministic downsampler (PIL's bicubic resize is
    not reproduced; the fallback defines its own contract)."""
    yi = np.linspace(0, mat.shape[0] - 1, gh).round().astype(int)
    xi = np.linspace(0, mat.shape[1] - 1, gw).round().astype(int)
    return mat[np.ix_(yi, xi)]


def extract_features(df: DataFrame, dim: int = 32, fake: bool = True) -> DataFrame:
    """Decode + feature-extract stage over the media table.

    ``fake=False`` decodes IMAGES with PIL when importable (grayscale-
    resize to the smallest g×g grid covering ``dim`` pixels, flatten,
    scale to [0, 1]); without Pillow it falls back to the stdlib BMP
    decoder + nearest-neighbor grid (``_decode_bmp_gray``), so a real
    decode branch runs — and is value-asserted — in codec-less
    environments for BMP payloads. Undecodable blobs yield an empty
    feature array instead of killing the job (at 100 TB one corrupt
    file must not fail the stage).
    """
    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
        T.StructField("n_bytes", T.IntegerType()),
    ])

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not fake:
            import importlib.util
            have_pil = importlib.util.find_spec("PIL") is not None
            if have_pil:
                import io

                from PIL import Image
            g = int(np.ceil(np.sqrt(dim)))

            def feats_of(blob: bytes) -> np.ndarray:
                try:
                    if have_pil:
                        img = Image.open(io.BytesIO(blob or b""))
                        px = np.asarray(
                            img.convert("L").resize((g, g)),
                            dtype=np.float32)
                    else:
                        px = _nn_grid(_decode_bmp_gray(blob), g, g)
                    return (px.ravel()[:dim] / 255.0).astype(np.float32)
                except Exception:
                    return np.zeros(0, dtype=np.float32)
        else:
            def feats_of(blob: bytes) -> np.ndarray:
                return _fake_features(blob, dim)
        for pdf in batches:
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "features": [feats_of(b) for b in pdf["content"]],
                "n_bytes": [len(b or b"") for b in pdf["content"]],
            })

    return df.select("media_id", "content").mapInPandas(part, schema=out_schema)


def resize_media(df: DataFrame, width: int = 224, height: int = 224,
                 fake: bool = True) -> DataFrame:
    """Image resize stage: binary in → binary out with updated metadata.

    ``fake=False`` decodes with PIL per Arrow batch when importable,
    resizes to (width, height) and re-encodes as PNG; without Pillow it
    falls back to the stdlib BMP path (``_bmp_pixels`` → nearest-
    neighbor resize → 24-bit BMP re-encode), so the real branch runs in
    codec-less environments for BMP payloads. Undecodable blobs pass
    through as null content. The fake produces a deterministic
    pseudo-payload of the target pixel-buffer size (sha256-keyed stream,
    so identical inputs resize identically — content-hash dedup still
    works downstream). Output schema mirrors the input media table: the
    stage is composable before ``extract_features``.
    """

    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ])
    target = width * height * 3  # RGB pixel-buffer size stand-in

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not fake:
            import importlib.util
            have_pil = importlib.util.find_spec("PIL") is not None
            if have_pil:
                import io

                from PIL import Image

            def resized(blob: bytes) -> bytes | None:
                try:
                    if have_pil:
                        img = Image.open(io.BytesIO(blob or b""))
                        out = io.BytesIO()
                        img.convert("RGB").resize((width, height)) \
                           .save(out, format="PNG")
                        return out.getvalue()
                    px = _bmp_pixels(blob)
                    yi = np.linspace(0, px.shape[0] - 1,
                                     height).round().astype(int)
                    xi = np.linspace(0, px.shape[1] - 1,
                                     width).round().astype(int)
                    return _write_bmp(px[np.ix_(yi, xi)])
                except Exception:
                    return None
        else:
            def resized(blob: bytes) -> bytes:
                h = hashlib.sha256(blob or b"").digest()
                return (h * (target // len(h) + 1))[:target]
        for pdf in batches:
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "content": [resized(b) for b in pdf["content"]],
                "width": width,
                "height": height,
            })

    return df.select("media_id", "content").mapInPandas(part, schema=out_schema)


def _band_rms(mono: "np.ndarray", n_bands: int) -> "np.ndarray":
    """Per-window RMS energy over ``n_bands`` equal splits of a mono
    float waveform — shared by every real decode path."""
    n = len(mono)
    if n == 0:
        return np.zeros(0, dtype=np.float32)
    bounds = np.linspace(0, n, n_bands + 1).astype(int)
    return np.array(
        [float(np.sqrt(np.mean(mono[a:b] ** 2))) if b > a else 0.0
         for a, b in zip(bounds[:-1], bounds[1:])],
        dtype=np.float32)


def _decode_wave_pcm(blob: bytes, n_bands: int):
    """Stdlib ``wave`` decode of a PCM WAV container: mono mix +
    normalization to [-1, 1] float32 exactly like soundfile's
    ``dtype='float32'`` read of integer PCM. Covers the 8/16/32-bit PCM
    subset; non-WAV/compressed blobs raise and the caller yields nulls.
    Exists so the real (non-fake) decode branch executes even where
    soundfile isn't installed — wave ships with CPython."""
    import io
    import wave

    with wave.open(io.BytesIO(blob or b"")) as w:
        sr = w.getframerate()
        ch = w.getnchannels()
        sw = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    dtype = {1: np.uint8, 2: np.int16, 4: np.int32}.get(sw)
    if dtype is None:
        raise ValueError(f"unsupported PCM sample width {sw}")
    x = np.frombuffer(raw, dtype=dtype).astype(np.float32)
    if sw == 1:          # unsigned 8-bit PCM centers at 128
        x = (x - 128.0) / 128.0
    else:
        x = x / float(2 ** (8 * sw - 1))
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    n = len(x)
    return sr, n, int(n * 1000 / sr) if sr else 0, _band_rms(x, n_bands)


def audio_features(df: DataFrame, n_bands: int = 16,
                   fake: bool = True) -> DataFrame:
    """Audio decode + feature stage over the media table.

    ``fake=False`` decodes with soundfile when importable, falling back
    to the stdlib ``wave`` module for PCM WAV containers (so one real
    codec branch runs — and is value-asserted — even in codec-less
    environments like this container): read the container, mix to mono,
    split the waveform into ``n_bands`` equal windows and emit
    per-window RMS energy plus (sample_rate, n_samples, duration_ms) —
    the standard cheap audio fingerprint a curation pipeline filters on
    (silence/clipping detection, duration gates) before any expensive
    model. Undecodable blobs yield nulls instead of failing the stage
    (one corrupt file must not kill a 100 TB pass). The fake derives the
    same-shaped output deterministically from the content hash, so the
    Spark-side plumbing (schema, Arrow batching, partition pass) is
    tested with or without the codec.
    """

    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("rms", T.ArrayType(T.FloatType())),
        T.StructField("n_bytes", T.IntegerType()),
    ])

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not fake:
            import importlib.util
            have_sf = importlib.util.find_spec("soundfile") is not None
            if have_sf:
                import io

                import soundfile as sf_mod

            def decode(blob: bytes):
                try:
                    if have_sf:
                        data, sr = sf_mod.read(io.BytesIO(blob or b""),
                                               dtype="float32")
                        mono = data.mean(axis=1) if data.ndim > 1 else data
                        n = len(mono)
                        return (sr, n, int(n * 1000 / sr) if sr else 0,
                                _band_rms(mono, n_bands))
                    return _decode_wave_pcm(blob, n_bands)
                except Exception:
                    return None, None, None, None
        else:
            def decode(blob: bytes):
                sr = 16000
                n = len(blob or b"") * 4
                # same content-hash derivation as the image fake — one
                # stand-in float family for the whole module
                rms = _fake_features(blob, n_bands)
                return sr, n, int(n * 1000 / sr), rms

        for pdf in batches:
            rows = [decode(b) for b in pdf["content"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "sample_rate": [r[0] for r in rows],
                "n_samples": [r[1] for r in rows],
                "duration_ms": [r[2] for r in rows],
                "rms": [r[3] for r in rows],
                "n_bytes": [len(b or b"") for b in pdf["content"]],
            })

    return df.select("media_id", "content").mapInPandas(part, schema=out_schema)


def frame_sample(df: DataFrame, every_ms: int = 1000, fake: bool = True) -> DataFrame:
    """Video frame-sampling stage (UDTF-shaped: 1 row → N frame rows).

    ``fake=False`` decodes with PyAV (``pip install av``; import-gated
    like the image kernels on PIL): open the container from the blob,
    decode the first video stream and keep the first frame at or past
    each ``every_ms`` boundary — one decode pass per blob, rows ready
    for the image feature extractor. Undecodable blobs yield no frames.
    The fake derives a deterministic frame count from blob size. Either
    way the fan-out happens inside mapInPandas, so the blob is decoded
    once per partition pass, not once per frame.
    """
    if not fake:
        _require("av", "frame_sample")

    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_ts_ms", T.LongType()),
    ])

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not fake:
            import io

            import av as av_mod

            def frames_of(blob: bytes) -> list[int]:
                try:
                    with av_mod.open(io.BytesIO(blob or b"")) as container:
                        vstream = container.streams.video[0]
                        rate = vstream.average_rate
                        keep, next_ts = [], 0
                        for n, frame in enumerate(
                                container.decode(vstream)):
                            # frame.time = pts·time_base (None when the
                            # stream carries no timing); fall back to
                            # frame-rate pacing rather than collapsing
                            # every frame to t=0 and silently keeping 1
                            if frame.time is not None:
                                t_ms = int(frame.time * 1000)
                            elif rate:
                                t_ms = int(n * 1000 / float(rate))
                            else:
                                return []  # no timing info: undecodable
                            if t_ms >= next_ts:
                                keep.append(t_ms)
                                next_ts = t_ms + every_ms
                        return keep
                except Exception:
                    return []
        else:
            def frames_of(blob: bytes) -> list[int]:
                n_frames = max(1, min(10, len(blob or b"") // 64))
                return [i * every_ms for i in range(n_frames)]

        for pdf in batches:
            ids, idxs, tss = [], [], []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                for i, t_ms in enumerate(frames_of(blob)):
                    ids.append(mid); idxs.append(i); tss.append(t_ms)
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs,
                                "frame_ts_ms": tss})

    return df.select("media_id", "content").mapInPandas(part, schema=out_schema)


# ---------------------------------------------------------------------------
# perceptual image hashing (dHash) + hamming near-dup
# ---------------------------------------------------------------------------

def _pack_dhash_bands(px: "np.ndarray") -> list[int]:
    """(8, 9) integer grayscale grid → four 16-bit dHash bands.

    Bit (r, c) is set when ``px[r, c+1] > px[r, c]`` (the classic
    difference hash — gradient direction survives rescaling and
    re-encoding); row r packs little-endian into bits 0..7, band b =
    rows 2b (low byte) and 2b+1 (high byte). Bands instead of one
    64-bit word keep every value positive and small — no sign-bit
    overflow ambiguity across engines, and the bands ARE the LSH
    blocking unit ``dhash_neardup`` joins on."""
    bits = (px[:, 1:] > px[:, :-1]).astype(np.int64)          # (8, 8)
    rowvals = (bits << np.arange(8, dtype=np.int64)).sum(axis=1)
    return [int(rowvals[2 * b] + 256 * rowvals[2 * b + 1]) for b in range(4)]


def image_dhash(df: DataFrame, fake: bool = True) -> DataFrame:
    """Per-image dHash signature: ``(media_id, band_0..band_3, dhash)``
    with ``dhash`` the 16-hex-char display form (band_0 first).

    ``fake=True`` (codec-less stand-in) derives the 8×9 grayscale grid
    from the content hash — ``px(r,c) = int(md5(sha256(content) ‖
    ':r:c')[:4hex]) % 256`` — as PURE relational expressions: no UDF, no
    shuffle, and a DuckDB twin can replay it bit-for-bit (the repo's
    md5-derived determinism contract, ``operators/dsir.py``). The
    plumbing a real corpus needs — signature schema, banding, the
    near-dup join — is identical either way.

    ``fake=False`` decodes with PIL when importable, else the stdlib BMP
    fallback (``_bmp_pixels``): integer ITU-601 luma ``(299r + 587g +
    114b) // 1000``, block-mean resize to 8×9 on floor-boundary slabs
    (nearest-neighbor when the source is smaller than the grid), same
    band packing via ``_pack_dhash_bands``. Undecodable blobs yield
    null bands (one corrupt file must not fail a 100 TB stage).
    """
    if fake:
        sha = F.sha2(F.col("content").cast("binary"), 256)

        def px(r: int, c: int):
            h = F.md5(F.concat(sha, F.lit(f":{r}:{c}")))
            return F.conv(F.substring(h, 1, 4), 16, 10).cast("long") % 256

        rows = [
            sum(((px(r, c + 1) > px(r, c)).cast("long") * F.lit(1 << c)
                 for c in range(8)), F.lit(0))
            for r in range(8)
        ]
        bands = [rows[2 * b] + rows[2 * b + 1] * F.lit(256) for b in range(4)]
        out = df.select(
            "media_id",
            *[b.alias(f"band_{i}") for i, b in enumerate(bands)])
        return out.withColumn(
            "dhash", F.format_string("%04x%04x%04x%04x",
                                     "band_0", "band_1", "band_2", "band_3"))

    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("band_0", T.LongType()),
        T.StructField("band_1", T.LongType()),
        T.StructField("band_2", T.LongType()),
        T.StructField("band_3", T.LongType()),
        T.StructField("dhash", T.StringType()),
    ])

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import importlib.util
        have_pil = importlib.util.find_spec("PIL") is not None
        if have_pil:
            import io

            from PIL import Image

        def grid_of(blob: bytes) -> "np.ndarray | None":
            try:
                if have_pil:
                    img = Image.open(io.BytesIO(blob or b""))
                    rgb = np.asarray(img.convert("RGB"), dtype=np.int64)
                else:
                    rgb = _bmp_pixels(blob).astype(np.int64)
                gray = (rgb[..., 0] * 299 + rgb[..., 1] * 587
                        + rgb[..., 2] * 114) // 1000
                h, w = gray.shape
                if h < 8 or w < 9:
                    return _nn_grid(gray, 8, 9)
                rb = [h * i // 8 for i in range(9)]
                cb = [w * j // 9 for j in range(10)]
                out = np.zeros((8, 9), dtype=np.int64)
                for i in range(8):
                    for j in range(9):
                        blk = gray[rb[i]:rb[i + 1], cb[j]:cb[j + 1]]
                        out[i, j] = int(blk.sum()) // blk.size
                return out
            except Exception:
                return None

        for pdf in batches:
            recs = []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                g = grid_of(blob)
                if g is None:
                    recs.append((mid, None, None, None, None, None))
                else:
                    b = _pack_dhash_bands(g)
                    recs.append((mid, *b,
                                 "%04x%04x%04x%04x" % tuple(b)))
            yield pd.DataFrame(recs, columns=[f.name for f in out_schema])

    return df.select("media_id", "content").mapInPandas(part, out_schema)


def dhash_neardup(sig: DataFrame, threshold: int = 3) -> DataFrame:
    """Near-duplicate image pairs from ``image_dhash`` signatures:
    ``(id_a, id_b, hamming)`` with total dHash hamming distance ≤
    ``threshold``.

    Banded-LSH blocking, the MinHash recipe over hamming space: two
    signatures within hamming 3 of each other differ in at most 3 of
    the 4 bands, so BY PIGEONHOLE they agree exactly on ≥1 band —
    candidates are the equi-join on (band_idx, band_value), recall 1.0
    for ``threshold`` ≤ 3. The corpus-sized frame is shuffled once by
    band value (O(n·4) rows), never self-joined all-pairs; the hamming
    verify is ``bit_count(xor)`` over the four 16-bit bands — JVM
    integer ops, engine-exact."""
    if not 0 <= threshold <= 3:
        raise ValueError(f"banded recall guarantee needs 0<=t<=3, "
                         f"got {threshold}")
    bcols = [f"band_{i}" for i in range(4)]
    # the signature subtree is referenced FOUR times below (both sides of
    # the band join + both verify joins); unmarked, Spark re-runs the
    # upstream hash/decode pass per reference. Signatures are 5 narrow
    # ints per image — orders of magnitude smaller than the media blobs —
    # so caching them is safe at any corpus scale (spills to disk, never
    # re-decodes). Unpersisted before return — the verified pair list
    # (small by the near-dup contract) is checkpointed first, so the
    # cache never outlives the call (CacheManager entries are NOT
    # freed by plan GC).
    sig = sig.persist()
    bands = sig.select(
        "media_id",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("band_idx"),
                     F.col(c).cast("long").alias("val"))
            for i, c in enumerate(bcols)])).alias("b")
    ).select("media_id", "b.band_idx", "b.val")
    cand = (bands.alias("a")
            .join(bands.alias("b"),
                  (F.col("a.band_idx") == F.col("b.band_idx"))
                  & (F.col("a.val") == F.col("b.val"))
                  & (F.col("a.media_id") < F.col("b.media_id")))
            .select(F.col("a.media_id").alias("id_a"),
                    F.col("b.media_id").alias("id_b"))
            .distinct())
    sa = sig.select(F.col("media_id").alias("id_a"),
                    *[F.col(c).alias(f"a_{c}") for c in bcols])
    sb = sig.select(F.col("media_id").alias("id_b"),
                    *[F.col(c).alias(f"b_{c}") for c in bcols])
    ham = sum((F.bit_count(F.col(f"a_{c}").bitwiseXOR(F.col(f"b_{c}")))
               for c in bcols), F.lit(0))
    out = (cand.join(sa, "id_a").join(sb, "id_b")
           .withColumn("hamming", ham.cast("long"))
           .where(F.col("hamming") <= threshold)
           .select("id_a", "id_b", "hamming")
           .localCheckpoint(eager=True))
    sig.unpersist()
    return out
