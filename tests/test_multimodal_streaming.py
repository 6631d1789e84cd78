"""Multimodal plumbing + Structured Streaming variant tests."""

import tempfile

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from ai_incident_analyst_spark.operators.multimodal import (
    extract_features,
    frame_sample,
    make_media_table,
)
from ai_incident_analyst_spark.sources.tables import load_table
from ai_incident_analyst_spark.streaming.pipeline import (
    streaming_count_by_window,
    streaming_dedup,
)


def test_media_table_schema(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    media = make_media_table(docs, "doc_id", "text")
    assert [f.name for f in media.schema.fields] == [
        "media_id", "content", "meta", "content_sha256"]
    assert media.schema["content"].dataType.typeName() == "binary"
    row = media.first()
    assert row.meta.media_type == "image"


def test_extract_features_deterministic(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(20)
    media = make_media_table(docs, "doc_id", "text")
    a = {r.media_id: tuple(r.features)
         for r in extract_features(media.repartition(1), dim=16).collect()}
    b = {r.media_id: tuple(r.features)
         for r in extract_features(media.repartition(4), dim=16).collect()}
    assert a == b
    assert all(len(v) == 16 for v in a.values())


def _bmp_bytes(px):
    """Build a 24-bit BMP from an (h, w, 3) uint8 RGB matrix using the
    operator's own writer (round-trip identity is asserted below)."""
    from ai_incident_analyst_spark.operators.multimodal import _write_bmp
    return _write_bmp(px)


def test_extract_features_real_decode_bmp_fallback(spark):
    """Real image decode via the stdlib BMP fallback — runs (and
    value-asserts) in THIS container, no Pillow needed: a constant-color
    BMP yields the exact luma everywhere, grayscale weights are ITU-R
    601, and a corrupt blob yields empty features."""
    import numpy as np

    # constant color (40, 80, 120): luma = .299*40+.587*80+.114*120
    px = np.zeros((6, 8, 3), dtype=np.uint8)
    px[:] = (40, 80, 120)
    want = (40 * 299 + 80 * 587 + 120 * 114) / 1000.0 / 255.0
    rows = [Row(i=1, payload=bytearray(_bmp_bytes(px))),
            Row(i=2, payload=bytearray(b"not a bmp"))]
    media = make_media_table(spark.createDataFrame(rows), "i", "payload",
                             media_type="image", fmt="bmp")
    feats = {r.media_id: list(r.features)
             for r in extract_features(media, dim=16, fake=False).collect()}
    assert len(feats[1]) == 16
    assert all(abs(v - want) < 2e-3 for v in feats[1])
    assert feats[2] == []


def test_resize_media_real_bmp_fallback(spark):
    """resize_media(fake=False) without Pillow: BMP in → resized BMP
    out, with the nearest-neighbor pixels surviving the re-encode
    round-trip exactly (gradient corners preserved)."""
    import numpy as np

    from ai_incident_analyst_spark.operators.multimodal import (
        _bmp_pixels,
        resize_media,
    )

    px = np.zeros((10, 12, 3), dtype=np.uint8)
    px[..., 0] = np.arange(12)[None, :] * 20      # R: left→right ramp
    px[..., 1] = np.arange(10)[:, None] * 25      # G: top→bottom ramp
    rows = [Row(i=1, payload=bytearray(_bmp_bytes(px))),
            Row(i=2, payload=bytearray(b"junk"))]
    media = make_media_table(spark.createDataFrame(rows), "i", "payload",
                             media_type="image", fmt="bmp")
    out = {r.media_id: r
           for r in resize_media(media, width=4, height=3,
                                 fake=False).collect()}
    got = _bmp_pixels(bytes(out[1].content))
    assert got.shape == (3, 4, 3)
    # nearest-neighbor grid: corners must equal source corners exactly
    assert tuple(got[0, 0]) == tuple(px[0, 0])
    assert tuple(got[-1, -1]) == tuple(px[-1, -1])
    assert (out[1].width, out[1].height) == (4, 3)
    assert out[2].content is None


def test_extract_features_real_decode_with_pil(spark):
    """Real PIL decode path (auto-skips without Pillow, mirroring the
    sentence-transformers smoke in test_embedding.py): a synthetic PNG
    round-trips through extract_features(fake=False) and resize_media
    (fake=False) with correct shapes; a corrupt blob yields empty
    features instead of failing the stage."""
    pytest.importorskip("PIL")
    import io

    import numpy as np
    from PIL import Image

    from ai_incident_analyst_spark.operators.multimodal import resize_media

    def png_bytes(w, h, val):
        img = Image.fromarray(
            np.full((h, w, 3), val, dtype=np.uint8), mode="RGB")
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue()

    rows = [Row(i=1, payload=bytearray(png_bytes(8, 6, 200))),
            Row(i=2, payload=bytearray(png_bytes(16, 16, 10))),
            Row(i=3, payload=bytearray(b"not a png"))]
    media = make_media_table(spark.createDataFrame(rows), "i", "payload")
    feats = {r.media_id: list(r.features)
             for r in extract_features(media, dim=16, fake=False).collect()}
    assert len(feats[1]) == 16 and len(feats[2]) == 16
    # uniform-gray 200 image -> every grayscale pixel ~200/255
    assert all(abs(v - 200 / 255) < 0.02 for v in feats[1])
    assert feats[3] == []  # corrupt blob: empty features, job survives
    out = {r.media_id: r for r in
           resize_media(media, width=4, height=3, fake=False).collect()}
    img = Image.open(io.BytesIO(out[1].content))
    assert img.size == (4, 3) and (out[1].width, out[1].height) == (4, 3)
    assert out[3].content is None  # corrupt blob passes through as null


def test_frame_sample_fanout(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(10)
    media = make_media_table(docs, "doc_id", "text", media_type="video")
    frames = frame_sample(media, every_ms=500).collect()
    assert len(frames) >= 10
    by_id = {}
    for r in frames:
        by_id.setdefault(r.media_id, []).append(r)
    for rs in by_id.values():
        assert [r.frame_idx for r in sorted(rs, key=lambda x: x.frame_idx)] \
            == list(range(len(rs)))


def test_audio_features_fake_deterministic(spark, sf_dir):
    from ai_incident_analyst_spark.operators.multimodal import audio_features
    docs = load_table(spark, sf_dir, "documents").limit(20)
    media = make_media_table(docs, "doc_id", "text", media_type="audio",
                             fmt="wav")
    a = {r.media_id: (r.sample_rate, r.n_samples, r.duration_ms,
                      tuple(r.rms))
         for r in audio_features(media.repartition(1), n_bands=8).collect()}
    b = {r.media_id: (r.sample_rate, r.n_samples, r.duration_ms,
                      tuple(r.rms))
         for r in audio_features(media.repartition(4), n_bands=8).collect()}
    assert a == b
    assert all(len(v[3]) == 8 for v in a.values())
    assert all(v[0] == 16000 for v in a.values())


def test_audio_features_real_decode_wave_pcm(spark):
    """Real decode via the stdlib-``wave`` PCM fallback — runs (and
    value-asserts) in THIS container, no codec library needed: a 16-bit
    PCM WAV round-trips with exact sample count / duration / RMS, a
    stereo file mixes to mono, and a corrupt blob yields nulls instead
    of failing the stage."""
    import io
    import wave as wave_mod

    import numpy as np

    from ai_incident_analyst_spark.operators.multimodal import audio_features

    def wav_bytes(frames: np.ndarray, sr: int, ch: int) -> bytes:
        buf = io.BytesIO()
        with wave_mod.open(buf, "wb") as w:
            w.setnchannels(ch)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes(frames.astype("<i2").tobytes())
        return buf.getvalue()

    # mono: constant +16384 → normalized 0.5 exactly; rms = 0.5
    mono = np.full(8000, 16384, dtype=np.int16)
    # stereo: channels 8192 / 24576 → mono mean (0.25+0.75)/2 = 0.5
    stereo = np.column_stack([np.full(4000, 8192, dtype=np.int16),
                              np.full(4000, 24576, dtype=np.int16)]).ravel()
    rows = [Row(i=1, payload=bytearray(wav_bytes(mono, 8000, 1))),
            Row(i=2, payload=bytearray(wav_bytes(stereo, 16000, 2))),
            Row(i=3, payload=bytearray(b"not a wav"))]
    media = make_media_table(spark.createDataFrame(rows), "i", "payload",
                             media_type="audio", fmt="wav")
    out = {r.media_id: r
           for r in audio_features(media, n_bands=4, fake=False).collect()}
    assert out[1].sample_rate == 8000
    assert out[1].n_samples == 8000
    assert out[1].duration_ms == 1000
    assert all(abs(v - 0.5) < 1e-6 for v in out[1].rms)
    assert out[2].sample_rate == 16000
    assert out[2].n_samples == 4000
    assert out[2].duration_ms == 250
    assert all(abs(v - 0.5) < 1e-6 for v in out[2].rms)
    assert out[3].sample_rate is None and out[3].rms is None


def test_audio_features_real_decode_with_soundfile(spark):
    """Real soundfile decode (auto-skips without the codec, mirroring
    the PIL test): a synthetic WAV round-trips with correct sample
    count/duration and the constant-amplitude RMS; a corrupt blob
    yields nulls instead of failing the stage."""
    pytest.importorskip("soundfile")
    import io

    import numpy as np
    import soundfile as sf_mod

    from ai_incident_analyst_spark.operators.multimodal import audio_features

    def wav_bytes(n, sr, amp):
        buf = io.BytesIO()
        sf_mod.write(buf, np.full(n, amp, dtype=np.float32), sr,
                     format="WAV", subtype="FLOAT")
        return buf.getvalue()

    rows = [Row(i=1, payload=bytearray(wav_bytes(8000, 8000, 0.5))),
            Row(i=2, payload=bytearray(b"not a wav"))]
    media = make_media_table(spark.createDataFrame(rows), "i", "payload",
                             media_type="audio", fmt="wav")
    out = {r.media_id: r
           for r in audio_features(media, n_bands=4, fake=False).collect()}
    assert out[1].sample_rate == 8000
    assert out[1].n_samples == 8000
    assert out[1].duration_ms == 1000
    assert all(abs(v - 0.5) < 1e-5 for v in out[1].rms)
    assert out[2].sample_rate is None and out[2].rms is None


def test_frame_sample_gated_without_av(spark, sf_dir):
    import importlib.util
    if importlib.util.find_spec("av") is not None:
        pytest.skip("PyAV installed; the real-decode test covers this")
    docs = load_table(spark, sf_dir, "documents").limit(1)
    media = make_media_table(docs, "doc_id", "text", media_type="video")
    with pytest.raises(NotImplementedError, match="'av'"):
        frame_sample(media, fake=False)


def test_frame_sample_real_decode_with_av(spark):
    """Real PyAV decode (auto-skips without the codec): a synthetic
    10-frame mp4 sampled at every_ms=0 yields every frame with
    monotonically increasing timestamps; a corrupt blob yields no rows."""
    pytest.importorskip("av")
    import io

    import av as av_mod
    import numpy as np

    def mp4_bytes(n_frames, fps):
        buf = io.BytesIO()
        with av_mod.open(buf, "w", format="mp4") as container:
            stream = container.add_stream("h264", rate=fps)
            stream.width, stream.height = 64, 64
            stream.pix_fmt = "yuv420p"
            for i in range(n_frames):
                arr = np.full((64, 64, 3), i * 20, dtype=np.uint8)
                frame = av_mod.VideoFrame.from_ndarray(arr, format="rgb24")
                for pkt in stream.encode(frame):
                    container.mux(pkt)
            for pkt in stream.encode():
                container.mux(pkt)
        return buf.getvalue()

    rows = [Row(i=1, payload=bytearray(mp4_bytes(10, 5))),
            Row(i=2, payload=bytearray(b"not a video"))]
    media = make_media_table(spark.createDataFrame(rows), "i", "payload",
                             media_type="video", fmt="mp4")
    frames = frame_sample(media, every_ms=0, fake=False).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r.media_id, []).append(r)
    assert len(by_id.get(1, [])) == 10
    ts = [r.frame_ts_ms for r in sorted(by_id[1],
                                        key=lambda x: x.frame_idx)]
    assert ts == sorted(ts)
    assert 2 not in by_id  # corrupt blob: zero frames, job survives


def _stream_fixture(spark, tmp):
    df = spark.createDataFrame([
        Row(ts="2024-01-01 10:00:00", k="a"),
        Row(ts="2024-01-01 10:00:00", k="a"),   # dup
        Row(ts="2024-01-01 11:00:00", k="b"),
        Row(ts="2024-01-02 09:00:00", k="a"),
    ]).select(F.to_timestamp("ts").alias("ts"), "k")
    df.write.mode("overwrite").parquet(f"{tmp}/in")
    return spark.readStream.schema(df.schema).parquet(f"{tmp}/in")


def test_streaming_dedup(spark):
    with tempfile.TemporaryDirectory() as tmp:
        stream = _stream_fixture(spark, tmp)
        out = streaming_dedup(stream, ["k", "ts"], "ts", "2 days")
        q = (out.writeStream.format("memory").queryName("sd")
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(60)
        assert spark.sql("SELECT count(*) c FROM sd").first().c == 3


def test_streaming_windowed_counts(spark):
    with tempfile.TemporaryDirectory() as tmp:
        stream = _stream_fixture(spark, tmp)
        out = streaming_count_by_window(stream, "ts", "1 day", "1 day")
        # append mode only emits windows the watermark has closed; with a
        # single availableNow batch nothing closes — complete mode shows all
        q = (out.writeStream.format("memory").queryName("swc")
             .outputMode("complete").trigger(availableNow=True).start())
        q.awaitTermination(60)
        rows = {str(r.window_start)[:10]: r["count"]
                for r in spark.sql("SELECT * FROM swc").collect()}
        assert rows == {"2024-01-01": 3, "2024-01-02": 1}


def test_resize_media_shapes_and_determinism(spark, sf_dir):
    from ai_incident_analyst_spark.operators.multimodal import (
        make_media_table,
        resize_media,
    )
    from ai_incident_analyst_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(8)
    media = make_media_table(docs, "doc_id", "text")
    out = resize_media(media, width=16, height=16).collect()
    assert len(out) == 8
    assert all(len(r.content) == 16 * 16 * 3 for r in out)
    assert all((r.width, r.height) == (16, 16) for r in out)
    # deterministic: same payload -> same resized bytes
    again = resize_media(media, width=16, height=16).collect()
    assert {r.media_id: bytes(r.content) for r in out} == \
           {r.media_id: bytes(r.content) for r in again}
    # composes with the feature extractor
    from ai_incident_analyst_spark.operators.multimodal import extract_features
    feats = extract_features(
        resize_media(media, width=16, height=16), dim=8).collect()
    assert all(len(r.features) == 8 for r in feats)


def test_streaming_interval_join(spark):
    from ai_incident_analyst_spark.streaming.pipeline import streaming_interval_join
    with tempfile.TemporaryDirectory() as tmp:
        errors = spark.createDataFrame([
            Row(ts="2024-01-01 10:00:00", user="u1", eid=1),
            Row(ts="2024-01-01 12:00:00", user="u2", eid=2),
        ]).select(F.to_timestamp("ts").alias("ts"), "user", "eid")
        purchases = spark.createDataFrame([
            Row(ts="2024-01-01 10:30:00", user="u1", pid=10),  # within 1h of eid 1
            Row(ts="2024-01-01 09:00:00", user="u1", pid=11),  # before error: no
            Row(ts="2024-01-01 13:30:00", user="u2", pid=12),  # 1.5h after: no
        ]).select(F.to_timestamp("ts").alias("ts"), "user", "pid")
        errors.write.parquet(f"{tmp}/err")
        purchases.write.parquet(f"{tmp}/pur")
        es = spark.readStream.schema(errors.schema).parquet(f"{tmp}/err")
        ps = spark.readStream.schema(purchases.schema).parquet(f"{tmp}/pur")
        out = streaming_interval_join(ps, es, key="user", within="1 hour")
        q = (out.writeStream.format("memory").queryName("sij")
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(60)
        rows = [(r.pid, r.eid) for r in spark.sql("SELECT * FROM sij").collect()]
        assert rows == [(10, 1)]


def test_streaming_rollup_sink_incremental(spark):
    """The maintained rollup after two micro-batches equals a full batch
    rebuild over all the data — the continuous-aggregate invariant."""
    import datetime as dt

    from ai_incident_analyst_spark.operators.rollup import build_rollup
    from ai_incident_analyst_spark.streaming.pipeline import (
        streaming_rollup_sink,
    )

    def mk(seed, n=60):
        rows = [(dt.datetime(2024, 1, 1 + (i + seed) % 5, i % 24),
                 f"t{i % 2}", float((i * 13 + seed) % 50))
                for i in range(n)]
        return spark.createDataFrame(
            rows, "ts timestamp, event_type string, value double")

    with tempfile.TemporaryDirectory() as tmp:
        rollup_path = f"{tmp}/rollup"
        # batch 1 arrives, stream starts, then batch 2 arrives
        mk(0).write.mode("overwrite").parquet(f"{tmp}/in")
        stream = spark.readStream.schema(mk(0).schema).parquet(f"{tmp}/in")
        sink = streaming_rollup_sink(stream, rollup_path, f"{tmp}/ckpt",
                                     "ts", ["event_type"], "value")
        q = sink.trigger(availableNow=True).start()
        q.awaitTermination(120)
        mk(7).write.mode("append").parquet(f"{tmp}/in")
        q = sink.trigger(availableNow=True).start()
        q.awaitTermination(120)

        got = sorted(tuple(str(x) for x in r)
                     for r in spark.read.parquet(rollup_path).collect())
        full = build_rollup(mk(0).unionByName(mk(7)), "ts",
                            ["event_type"], "value")
        want = sorted(tuple(str(x) for x in r) for r in full.collect())
        assert got == want


def test_streaming_index_dedup_sink(spark, sf_dir):
    """Micro-batches probe the persisted corpus MinHash index; docs with a
    corpus near-dup are gated out, novel docs append to the sink."""
    import tempfile

    from ai_incident_analyst_spark.operators.dedup import (
        minhash_write_index,
    )
    from ai_incident_analyst_spark.sources.tables import load_table
    from ai_incident_analyst_spark.streaming.pipeline import (
        streaming_index_dedup_sink,
    )

    with tempfile.TemporaryDirectory() as tmp:
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        corpus = docs.filter("doc_id < 400")
        minhash_write_index(corpus, "doc_id", "text", f"{tmp}/idx",
                            num_perm=64, bands=16, hash_fn="md5")

        # incoming batch: 10 docs whose TEXT is already in the corpus
        # (fresh ingest ids, duplicate content -> est_jaccard 1.0) + 10
        # genuinely unseen docs; all re-keyed past the corpus id range
        dup = docs.filter("doc_id < 10") \
            .withColumn("doc_id", F.col("doc_id") + 20000)
        novel = docs.filter("doc_id >= 400 AND doc_id < 410") \
            .withColumn("doc_id", F.col("doc_id") + 10000)
        dup.unionByName(novel).write.parquet(f"{tmp}/in")
        stream = spark.readStream.schema(dup.schema).parquet(f"{tmp}/in")

        q = streaming_index_dedup_sink(
            stream, f"{tmp}/idx", f"{tmp}/out", f"{tmp}/ck",
            "doc_id", "text", threshold=0.9, hash_fn="md5")
        q.awaitTermination(120)

        kept = {r.doc_id for r in spark.read.parquet(f"{tmp}/out").collect()}
        # every duplicate-content doc gated; only genuinely novel docs
        # survive (a few novel docs may legitimately near-dup the corpus —
        # the synthetic texts repeat phrases — so subset, not equality)
        assert not kept & {20000 + i for i in range(10)}
        assert kept <= {10400 + i for i in range(10)}
        assert len(kept) >= 5, kept


def test_streaming_histogram_sink_matches_batch(spark):
    """Incrementally-merged streaming sketch must equal the batch-built
    sketch over all data, and quantiles from it must match."""
    import tempfile

    from ai_incident_analyst_spark.operators.sketch import (
        histogram_sketch_build,
        histogram_sketch_quantile,
    )
    from ai_incident_analyst_spark.streaming.pipeline import (
        streaming_histogram_sink,
    )

    rows = [("a", float((i * 13) % 97)) for i in range(500)] + \
           [("b", float(i % 50)) for i in range(300)]
    df = spark.createDataFrame(rows, "g string, v double")
    with tempfile.TemporaryDirectory() as tmp:
        df.repartition(4).write.parquet(f"{tmp}/in")
        stream = spark.readStream.schema(df.schema) \
            .option("maxFilesPerTrigger", 1).parquet(f"{tmp}/in")
        q = streaming_histogram_sink(
            stream, f"{tmp}/sk", f"{tmp}/ck", ["g"], "v", 0.0, 100.0, 200) \
            .trigger(availableNow=True).start()
        q.awaitTermination(120)

        stored = spark.read.parquet(f"{tmp}/sk")
        direct = histogram_sketch_build(df, ["g"], "v", 0.0, 100.0, 200)
        a = {(r.g, r.bucket): r.cnt for r in stored.collect()}
        b = {(r.g, r.bucket): r.cnt for r in direct.collect()}
        assert a == b
        p95s = {r.g: r.est_quantile for r in histogram_sketch_quantile(
            stored, ["g"], 0.95, 0.0, 100.0, 200).collect()}
        p95d = {r.g: r.est_quantile for r in histogram_sketch_quantile(
            direct, ["g"], 0.95, 0.0, 100.0, 200).collect()}
        assert p95s == p95d


def test_streaming_cms_sink_matches_batch(spark):
    """Incrementally-merged streaming CMS must equal the batch-built
    sketch cell-for-cell, so point estimates match exactly."""
    import tempfile

    from ai_incident_analyst_spark.operators.sketch import (
        cms_build,
        cms_estimate,
    )
    from ai_incident_analyst_spark.streaming.pipeline import streaming_cms_sink

    rows = [(f"u{i % 37}",) for i in range(900)]
    df = spark.createDataFrame(rows, "k string")
    with tempfile.TemporaryDirectory() as tmp:
        df.repartition(3).write.parquet(f"{tmp}/in")
        stream = spark.readStream.schema(df.schema) \
            .option("maxFilesPerTrigger", 1).parquet(f"{tmp}/in")
        q = streaming_cms_sink(stream, f"{tmp}/sk", f"{tmp}/ck", "k",
                               depth=4, width=256) \
            .trigger(availableNow=True).start()
        q.awaitTermination(120)

        stored = spark.read.parquet(f"{tmp}/sk")
        direct = cms_build(df, "k", depth=4, width=256)
        a = {(r.row, r.col): r.cnt for r in stored.collect()}
        b = {(r.row, r.col): r.cnt for r in direct.collect()}
        assert a == b
        probes = spark.createDataFrame([("u0",), ("u1",)], "k string")
        est = {r.k: r.est_count for r in cms_estimate(
            stored, probes, "k", depth=4, width=256).collect()}
        # CMS never undercounts; with 37 keys in 256 columns collisions
        # are unlikely, so the estimate equals the true count here
        true = {k: sum(1 for (r,) in rows if r == k) for k in ("u0", "u1")}
        for k in est:
            assert est[k] >= true[k]
            assert est[k] <= true[k] + 60


def test_streaming_decay_sink_matches_batch(spark):
    """Incrementally decay-merged store must match the one-shot batch
    computation anchored at each key's final reference time."""
    import tempfile
    from datetime import datetime, timedelta

    from ai_incident_analyst_spark.operators.temporal import decayed_agg
    from ai_incident_analyst_spark.streaming.pipeline import (
        streaming_decay_sink,
    )

    base = datetime(2024, 1, 1)
    rows = [(i % 7, base + timedelta(hours=i), float(1 + i % 5))
            for i in range(400)]
    df = spark.createDataFrame(rows, "k long, ts timestamp, v double")
    hl = 86400.0 * 3
    with tempfile.TemporaryDirectory() as tmp:
        df.repartition(4).write.parquet(f"{tmp}/in")
        stream = spark.readStream.schema(df.schema) \
            .option("maxFilesPerTrigger", 1).parquet(f"{tmp}/in")
        q = streaming_decay_sink(stream, f"{tmp}/st", f"{tmp}/ck",
                                 "k", "ts", "v", half_life_seconds=hl) \
            .trigger(availableNow=True).start()
        q.awaitTermination(120)

        stored = {r["k"]: (r["decayed_sum"], r["ref_ts"])
                  for r in spark.read.parquet(f"{tmp}/st").collect()}
        # batch truth: per-key sums anchored at the key's own max ts
        refs = {r["k"]: r["m"] for r in
                df.groupBy("k").agg(F.max("ts").alias("m")).collect()}
        for k, ref in refs.items():
            want = decayed_agg(df.filter(F.col("k") == k), "k", "ts", "v",
                               hl, ref).first()["decayed_sum"]
            got_sum, got_ref = stored[k]
            assert got_ref == ref
            assert got_sum == pytest.approx(want, rel=1e-9)


def test_streaming_index_sink_matches_batch(spark):
    """Incrementally-merged postings must equal the batch-built index."""
    import tempfile

    from ai_incident_analyst_spark.operators.search import (
        build_inverted_index,
        search_all_terms,
    )
    from ai_incident_analyst_spark.streaming.pipeline import (
        streaming_index_sink,
    )

    rows = [(i, f"alpha beta w{i % 9} gamma" if i % 2 else f"alpha w{i % 9}")
            for i in range(120)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    with tempfile.TemporaryDirectory() as tmp:
        df.repartition(3).write.parquet(f"{tmp}/in")
        stream = spark.readStream.schema(df.schema) \
            .option("maxFilesPerTrigger", 1).parquet(f"{tmp}/in")
        q = streaming_index_sink(stream, f"{tmp}/idx", f"{tmp}/ck",
                                 "doc_id", "text") \
            .trigger(availableNow=True).start()
        q.awaitTermination(120)

        stored = spark.read.parquet(f"{tmp}/idx")
        direct = build_inverted_index(df, "doc_id", "text")
        a = {(r.term, r.doc_id): r.tf for r in stored.collect()}
        b = {(r.term, r.doc_id): r.tf for r in direct.collect()}
        assert a == b
        hits = {r["doc_id"] for r in
                search_all_terms(stored, ["alpha", "beta"]).collect()}
        assert hits == {i for i in range(120) if i % 2}


def test_streaming_scd2_sink_matches_batch(spark):
    """Incrementally-maintained SCD2 store must equal the one-shot
    assembly over the full change log."""
    import tempfile
    from datetime import datetime, timedelta

    from ai_incident_analyst_spark.operators.scd import scd2_apply
    from ai_incident_analyst_spark.streaming.pipeline import (
        streaming_scd2_sink,
    )

    base = datetime(2024, 1, 1)
    rows = []
    for i in range(300):
        k = i % 9
        rows.append((k, base + timedelta(hours=i),
                     f"s{(i // 9) % 4}", i))
    df = spark.createDataFrame(rows, "k long, ts timestamp, v string, o long")
    with tempfile.TemporaryDirectory() as tmp:
        # CDC contract: batches arrive in event-time order (each file is
        # one time range; rows inside a file may be unordered)
        for lo in (0, 100, 200):
            chunk = df.filter(f"o >= {lo} AND o < {lo + 100}")
            chunk.coalesce(1).write.mode("append").parquet(f"{tmp}/in")
        stream = spark.readStream.schema(df.schema) \
            .option("maxFilesPerTrigger", 1).parquet(f"{tmp}/in")
        q = streaming_scd2_sink(stream, f"{tmp}/dim", f"{tmp}/ck",
                                "k", "ts", ["v"], order_col="o") \
            .trigger(availableNow=True).start()
        q.awaitTermination(120)

        stored = {(r["k"], r["v"], r["valid_from"], r["valid_to"],
                   r["is_current"])
                  for r in spark.read.parquet(f"{tmp}/dim").collect()}
        want = {(r["k"], r["v"], r["valid_from"], r["valid_to"],
                 r["is_current"])
                for r in scd2_apply(df, "k", "ts", ["v"],
                                    order_col="o").collect()}
        assert stored == want


def test_streaming_scd2_sink_rejects_late_changes(spark):
    """A change older than the stored current version must fail loudly
    (no-op collapse is lossy — silent mis-assembly otherwise)."""
    import tempfile
    from datetime import datetime

    from ai_incident_analyst_spark.streaming.pipeline import (
        streaming_scd2_sink,
    )

    with tempfile.TemporaryDirectory() as tmp:
        d1 = spark.createDataFrame(
            [(1, datetime(2024, 2, 1), "b", 10)],
            "k long, ts timestamp, v string, o long")
        d1.coalesce(1).write.mode("append").parquet(f"{tmp}/in")
        # late row: event time BEFORE the stored version
        d2 = spark.createDataFrame(
            [(1, datetime(2024, 1, 1), "a", 11)],
            "k long, ts timestamp, v string, o long")
        d2.coalesce(1).write.mode("append").parquet(f"{tmp}/in")
        stream = spark.readStream.schema(d1.schema) \
            .option("maxFilesPerTrigger", 1).parquet(f"{tmp}/in")
        q = streaming_scd2_sink(stream, f"{tmp}/dim", f"{tmp}/ck",
                                "k", "ts", ["v"], order_col="o") \
            .trigger(availableNow=True).start()
        import pyspark.errors
        with pytest.raises(Exception, match="older than the stored"):
            q.awaitTermination(120)
            raise AssertionError("stream should have failed")


def test_streaming_ivf_sink_matches_batch_and_replays(spark, sf_dir):
    """Incrementally-added IVF store must probe identically to the
    one-shot batch index over the same fixed centroids, and a full
    checkpoint-reset replay must overwrite its own (cell, batch)
    partitions instead of appending duplicates."""
    import shutil
    import tempfile

    from ai_incident_analyst_spark.operators.knn import (
        ivf_probe_index,
        ivf_write_index,
    )
    from ai_incident_analyst_spark.streaming.pipeline import streaming_ivf_sink

    emb = load_table(spark, sf_dir, "embeddings").limit(200) \
        .select("vec_id", "embedding")
    cents = spark.createDataFrame(
        [(i, [1.0 if j == i else 0.0 for j in range(64)]) for i in range(4)],
        "centroid_id long, centroid array<double>")
    queries = emb.limit(3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"))

    def probe(path):
        return sorted(
            (r.query_id, r.vec_id, round(r.distance, 9))
            for r in ivf_probe_index(spark, path, queries, cents,
                                     k=5, nprobe=2).collect())

    with tempfile.TemporaryDirectory() as tmp:
        emb.repartition(3).write.parquet(f"{tmp}/in")
        stream = spark.readStream.schema(emb.schema) \
            .option("maxFilesPerTrigger", 1).parquet(f"{tmp}/in")
        q = streaming_ivf_sink(stream, f"{tmp}/ivf", f"{tmp}/ck", cents) \
            .trigger(availableNow=True).start()
        q.awaitTermination(120)

        ivf_write_index(emb, cents, f"{tmp}/ivf_batch")
        assert probe(f"{tmp}/ivf") == probe(f"{tmp}/ivf_batch")
        n_rows = spark.read.parquet(f"{tmp}/ivf").count()
        assert n_rows == 200

        # replay from scratch: same files, same batch ids -> the sink
        # overwrites its own partitions, the store does not double
        shutil.rmtree(f"{tmp}/ck")
        stream2 = spark.readStream.schema(emb.schema) \
            .option("maxFilesPerTrigger", 1).parquet(f"{tmp}/in")
        q2 = streaming_ivf_sink(stream2, f"{tmp}/ivf", f"{tmp}/ck", cents) \
            .trigger(availableNow=True).start()
        q2.awaitTermination(120)
        assert spark.read.parquet(f"{tmp}/ivf").count() == 200
        assert probe(f"{tmp}/ivf") == probe(f"{tmp}/ivf_batch")


def test_compact_ivf_store_preserves_probes_and_shrinks(spark, sf_dir):
    """Compaction folds per-batch partitions into __batch=-1 per cell:
    probe results are unchanged, the store keeps working as a sink
    target afterwards, and the batch-dir count drops."""
    import glob
    import tempfile

    from ai_incident_analyst_spark.operators.knn import ivf_probe_index
    from ai_incident_analyst_spark.streaming.pipeline import (
        compact_ivf_store,
        streaming_ivf_sink,
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding")
    first = emb.where(F.col("vec_id") < 150)
    second = emb.where((F.col("vec_id") >= 150) & (F.col("vec_id") < 200))
    cents = spark.createDataFrame(
        [(i, [1.0 if j == i else 0.0 for j in range(64)]) for i in range(4)],
        "centroid_id long, centroid array<double>")
    queries = emb.limit(3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"))

    def probe(path):
        return sorted(
            (r.query_id, r.vec_id, round(r.distance, 9))
            for r in ivf_probe_index(spark, path, queries, cents,
                                     k=5, nprobe=4).collect())

    def run_sink(src_dir, store, ck):
        stream = spark.readStream.schema(emb.schema) \
            .option("maxFilesPerTrigger", 1).parquet(src_dir)
        q = streaming_ivf_sink(stream, store, ck, cents) \
            .trigger(availableNow=True).start()
        q.awaitTermination(120)

    with tempfile.TemporaryDirectory() as tmp:
        first.repartition(3).write.parquet(f"{tmp}/in")
        run_sink(f"{tmp}/in", f"{tmp}/ivf", f"{tmp}/ck")
        before = probe(f"{tmp}/ivf")
        n_dirs_before = len(glob.glob(f"{tmp}/ivf/__cell=*/__batch=*"))

        compact_ivf_store(spark, f"{tmp}/ivf")
        assert probe(f"{tmp}/ivf") == before
        n_dirs_after = len(glob.glob(f"{tmp}/ivf/__cell=*/__batch=*"))
        assert n_dirs_after < n_dirs_before
        assert spark.read.parquet(f"{tmp}/ivf").count() == 150

        # the compacted store keeps accepting new batches (same ck)
        second.repartition(2).write.mode("append").parquet(f"{tmp}/in")
        run_sink(f"{tmp}/in", f"{tmp}/ivf", f"{tmp}/ck")
        assert spark.read.parquet(f"{tmp}/ivf").count() == 200

        # a second compaction over the mixed store is stable too
        compact_ivf_store(spark, f"{tmp}/ivf")
        assert spark.read.parquet(f"{tmp}/ivf").count() == 200
        got = {r.vec_id for r in
               spark.read.parquet(f"{tmp}/ivf").select("vec_id").collect()}
        assert got == {r.vec_id for r in
                       emb.where(F.col("vec_id") < 200).collect()}


def test_streaming_psi_sink_matches_batch_report(spark):
    """PSI over a streamed current window (frozen baseline grid, bin
    counts merged incrementally) must equal the one-shot batch
    psi_report over the same data."""
    import tempfile

    from ai_incident_analyst_spark.operators.divergence import psi_report
    from ai_incident_analyst_spark.streaming.pipeline import (
        psi_from_store,
        streaming_psi_sink,
    )

    base = spark.createDataFrame([(float(i % 100),) for i in range(400)],
                                 "v double")
    cur = spark.createDataFrame([(float((i % 80) + 30),) for i in range(300)],
                                "v double")
    with tempfile.TemporaryDirectory() as tmp:
        cur.repartition(3).write.parquet(f"{tmp}/in")
        stream = spark.readStream.schema(cur.schema) \
            .option("maxFilesPerTrigger", 1).parquet(f"{tmp}/in")
        q = streaming_psi_sink(stream, base, "v", f"{tmp}/psi",
                               f"{tmp}/ck", n_bins=5) \
            .trigger(availableNow=True).start()
        q.awaitTermination(120)

        streamed = sorted(map(tuple, psi_from_store(
            spark, f"{tmp}/psi", base, "v", n_bins=5).collect()))
        batch = sorted(map(tuple, psi_report(base, cur, "v",
                                             n_bins=5).collect()))
        assert streamed == batch
        assert len(streamed) == 5


def test_compact_ivf_store_rescues_batch_committed_mid_compaction(
        spark, sf_dir, monkeypatch):
    """A micro-batch that commits into the OLD version directory between
    compaction's snapshot and its pointer flip (advice r7: that batch
    landed in a directory _recover_store later GCs, and its checkpoint
    entry was already committed so it never replayed) must be rescued
    into the live compacted store."""
    import os
    import tempfile

    from ai_incident_analyst_spark.streaming import pipeline as pl

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding")
    first = emb.where(F.col("vec_id") < 100)
    racer = emb.where((F.col("vec_id") >= 100) & (F.col("vec_id") < 130))
    cents = spark.createDataFrame(
        [(i, [1.0 if j == i else 0.0 for j in range(64)]) for i in range(4)],
        "centroid_id long, centroid array<double>")

    with tempfile.TemporaryDirectory() as tmp:
        store, ck = f"{tmp}/ivf", f"{tmp}/ck"
        first.repartition(2).write.parquet(f"{tmp}/in")
        stream = spark.readStream.schema(emb.schema) \
            .option("maxFilesPerTrigger", 1).parquet(f"{tmp}/in")
        q = pl.streaming_ivf_sink(stream, store, ck, cents) \
            .trigger(availableNow=True).start()
        q.awaitTermination(120)
        assert spark.read.parquet(store).count() == 100

        # simulate the race: just before the flip, a sink batch commits
        # into the (already-snapshotted) current version directory
        real_swap = pl._swap_pointer

        def racing_swap(p, target):
            if ".v-compact" not in target:
                # migration flips inside _recover_store route through the
                # same module global — only the compaction flip races
                return real_swap(p, target)
            cur = os.path.realpath(p) if os.path.islink(p) else p
            from ai_incident_analyst_spark.operators.knn import (
                _centroid_arrays,
                assign_cells,
            )
            ids, mat, ctype = _centroid_arrays(cents, "centroid_id",
                                               "centroid")
            (assign_cells(racer, "embedding", ids, mat, n=1,
                          cell_type=ctype)
             .withColumn("__batch", F.lit(99))
             .write.partitionBy("__cell", "__batch")
             .option("partitionOverwriteMode", "dynamic")
             .mode("overwrite").parquet(cur))
            real_swap(p, target)

        monkeypatch.setattr(pl, "_swap_pointer", racing_swap)
        pl.compact_ivf_store(spark, store)
        monkeypatch.setattr(pl, "_swap_pointer", real_swap)

        # the racing batch's 30 rows survived the flip
        assert spark.read.parquet(store).count() == 130
        got = {r.vec_id for r in
               spark.read.parquet(store).select("vec_id").collect()}
        assert got == {r.vec_id for r in
                       emb.where(F.col("vec_id") < 130).collect()}
        # and a follow-up compaction folds it into __batch=-1 cleanly
        pl.compact_ivf_store(spark, store)
        assert spark.read.parquet(store).count() == 130
