"""Golden-bytes tests for the real (stdlib) multimodal decode paths:
PNG chunk/filter decoding, WAV PCM decoding, and the Spark operators
that consume them. The deterministic-fake fallback is covered in
test_dedup_similarity.py; here every payload is genuine media."""

import io
import struct
import wave
import zlib

import numpy as np
import pytest

from facolos_data_pipelines_spark.operators import multimodal


def _make_rgb(h=5, w=7):
    return (np.arange(h * w * 3, dtype=np.uint32) * 37 % 256).astype(np.uint8).reshape(h, w, 3)


def test_png_roundtrip_rgb_rgba_gray():
    for arr in (
        _make_rgb(),
        np.dstack([_make_rgb(4, 4), np.full((4, 4), 200, np.uint8)]),  # RGBA
        _make_rgb(6, 3)[:, :, 0],  # gray 2-D
    ):
        data = multimodal.png_encode(arr)
        out = multimodal.png_decode(data)
        expect = arr if arr.ndim == 3 else arr[:, :, None]
        assert out.shape == expect.shape
        assert np.array_equal(out, expect)


def _filter_line(ftype, line, prev, bpp):
    """Forward-apply a PNG filter (spec §9) to produce test scanlines."""
    out = bytearray(len(line))
    for x in range(len(line)):
        a = line[x - bpp] if x >= bpp else 0
        b = prev[x]
        c = prev[x - bpp] if x >= bpp else 0
        if ftype == 0:
            v = line[x]
        elif ftype == 1:
            v = line[x] - a
        elif ftype == 2:
            v = line[x] - b
        elif ftype == 3:
            v = line[x] - ((a + b) >> 1)
        else:  # Paeth
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            v = line[x] - pred
        out[x] = v & 0xFF
    return bytes(out)


def test_png_decode_handles_all_filter_types():
    arr = _make_rgb(5, 5)
    h, w, ch = arr.shape
    raw, prev = b"", bytes(w * ch)
    for y in range(h):
        ftype = y % 5  # exercise filters 0,1,2,3,4
        line = arr[y].tobytes()
        raw += bytes([ftype]) + _filter_line(ftype, line, prev, ch)
        prev = line

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(multimodal.png_decode(png), arr)


def test_png_decode_rejects_garbage_and_unsupported():
    with pytest.raises(ValueError, match="signature"):
        multimodal.png_decode(b"\x89PNGfake1")
    bad_depth = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
        + b"\x00\x00\x00\x00"
    )
    with pytest.raises(ValueError, match="unsupported"):
        multimodal.png_decode(bad_depth)


def _make_wav(x, sr=8000):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sr)
        wf.writeframes((np.clip(x, -1, 1) * 32767).astype("<i2").tobytes())
    return buf.getvalue()


def test_wav_decode_golden_sine():
    sr, n = 8000, 8000
    t = np.arange(n) / sr
    x = 0.5 * np.sin(2 * np.pi * 440 * t)
    samples, rate = multimodal.wav_decode(_make_wav(x, sr))
    assert rate == sr and len(samples) == n
    assert float(np.sqrt(np.mean(samples**2))) == pytest.approx(0.5 / np.sqrt(2), rel=1e-3)


def test_extract_image_features_real_png(spark):
    arr = _make_rgb(8, 8)
    payload = multimodal.png_encode(arr)
    rows = [(1, payload, "png", 8, 8, len(payload))]
    df = spark.createDataFrame(rows, multimodal.IMAGE_SCHEMA)
    r = multimodal.extract_image_features(df).collect()[0]
    assert r["decode_mode"] == "real"
    assert r["mean_pixel"] == pytest.approx(float(arr.mean()))
    hist = np.histogram(arr, bins=multimodal.FEATURE_DIM, range=(0, 256))[0]
    assert r["features"] == pytest.approx((hist / hist.sum()).astype(np.float32).tolist())


def test_resize_images_real_roundtrip(spark):
    arr = _make_rgb(8, 6)
    payload = multimodal.png_encode(arr)
    rows = [(1, payload, "png", 6, 8, len(payload)), (2, b"notanimage", "jpeg", 4, 4, 10)]
    df = spark.createDataFrame(rows, multimodal.IMAGE_SCHEMA)
    out = {r["media_id"]: r for r in multimodal.resize_images(df, 3, 4).collect()}
    real = out[1]
    assert (real["width"], real["height"]) == (3, 4)
    resized = multimodal.png_decode(bytes(real["payload"]))
    assert resized.shape == (4, 3, 3)
    # nearest-neighbor: top-left output pixel is the top-left source pixel
    assert np.array_equal(resized[0, 0], arr[0, 0])
    # undecodable payload passes through unchanged except metadata
    assert bytes(out[2]["payload"]) == b"notanimage"
    assert (out[2]["width"], out[2]["height"]) == (3, 4)


def test_audio_features_real_wav(spark):
    sr, n = 8000, 4000
    x = 0.25 * np.sin(2 * np.pi * 220 * np.arange(n) / sr)
    payload = _make_wav(x, sr)
    rows = [
        (1, payload, "wav", sr, n / sr, len(payload)),
        (2, b"\x00junk", "mp3", 44100, 1.0, 5),
    ]
    df = spark.createDataFrame(rows, multimodal.AUDIO_SCHEMA)
    out = {r["media_id"]: r for r in multimodal.audio_features(df).collect()}
    real = out[1]
    assert real["decode_mode"] == "real"
    assert real["measured_duration_s"] == pytest.approx(n / sr)
    assert real["rms"] == pytest.approx(0.25 / np.sqrt(2), rel=1e-3)
    assert len(real["features"]) == multimodal.FEATURE_DIM
    # a pure 220 Hz tone concentrates its power in the lowest band
    assert real["features"][0] > 0.9
    assert out[2]["decode_mode"] == "fake"
    assert len(out[2]["features"]) == multimodal.FEATURE_DIM


def test_audio_features_zero_frame_wav_survives(spark):
    """A syntactically valid WAV with zero frames decodes to an empty
    signal; the FFT stage must emit a zero spectrum instead of raising
    (the 'job never dies on one bad blob' contract)."""
    payload = _make_wav(np.zeros(0), 8000)
    rows = [(1, payload, "wav", 8000, 0.0, len(payload))]
    df = spark.createDataFrame(rows, multimodal.AUDIO_SCHEMA)
    r = multimodal.audio_features(df).collect()[0]
    assert r["decode_mode"] == "real"
    assert r["rms"] == 0.0 and r["measured_duration_s"] == 0.0
    assert r["features"] == [0.0] * multimodal.FEATURE_DIM


def test_synthesize_image_corpus_real_decodable(spark):
    """The synthesized bench corpus must be GENUINE PNGs: stdlib
    png_decode reads every payload, extract_image_features reports
    decode_mode='real' on all rows, and payloads are deterministic per
    id (same id -> same bytes across runs/executors)."""
    ids = spark.range(0, 20).selectExpr("id as media_id")
    imgs = multimodal.synthesize_image_corpus(ids, width=8, height=8).collect()
    assert len(imgs) == 20
    for r in imgs:
        px = multimodal.png_decode(bytes(r["payload"]))
        assert px.shape == (8, 8, 3)
        assert r["n_bytes"] == len(r["payload"])
    again = {
        r["media_id"]: bytes(r["payload"])
        for r in multimodal.synthesize_image_corpus(ids).collect()
    }
    assert all(bytes(r["payload"]) == again[r["media_id"]] for r in imgs)
    feats = multimodal.extract_image_features(
        multimodal.synthesize_image_corpus(ids)
    ).collect()
    assert {r["decode_mode"] for r in feats} == {"real"}
    assert all(len(r["features"]) == multimodal.FEATURE_DIM for r in feats)


def test_synthesize_audio_corpus_real_decodable(spark):
    """Synthesized WAVs: stdlib wave reads them, audio_features reports
    decode_mode='real', the 0.5-amplitude sine RMS lands at A/sqrt(2),
    and the PCM16 container is exactly 44 + 2*n bytes."""
    ids = spark.range(0, 10).selectExpr("id as media_id")
    out = multimodal.audio_features(
        multimodal.synthesize_audio_corpus(ids, sample_rate=8000, duration_s=0.2)
    ).collect()
    assert len(out) == 10
    for r in out:
        assert r["decode_mode"] == "real"
        assert r["n_bytes"] == 44 + 2 * 1600
        assert r["measured_duration_s"] == pytest.approx(0.2)
        assert r["rms"] == pytest.approx(0.5 / np.sqrt(2), rel=2e-3)
