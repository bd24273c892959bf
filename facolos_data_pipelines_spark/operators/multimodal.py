"""Multimodal columns — image/audio/video as opaque binary + metadata.

The Spark-side plumbing (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested. Decode is now ALSO real for the two
formats a pure-stdlib runtime can handle:

- **PNG** (8-bit gray/gray+alpha/RGB/RGBA, non-interlaced): full chunk
  parse + zlib inflate + scanline unfilter (filters 0-4 incl. Paeth),
  no external dependency. If Pillow IS importable on the worker it is
  preferred (covers JPEG/WebP/...).
- **WAV** (PCM 8/16-bit) via the stdlib ``wave`` module; ``soundfile``
  is preferred when importable (covers FLAC/OGG/...).

Payloads that are neither (e.g. JPEG without Pillow, or synthetic test
bytes) fall back to the deterministic crc32-seeded fake so pipelines
keep flowing; every feature row carries a ``decode_mode`` column
('real' | 'fake') so downstream filters can separate the two. This is
the honest contract for a 100 TB corpus with mixed/corrupt media: the
job never dies on one bad blob, and the fake rows are identifiable.

Design for 100 TB of media: binary payloads stay in parquet binary
columns (or pointers to object-store keys for >~100 MB blobs), work is
``mapInPandas`` over Arrow batches so each Python worker touches a
columnar slab, and ``spark.sql.files.maxPartitionBytes`` bounds batch
memory. Feature extraction emits fixed-width arrays ready for the
similarity operators. The codecs are defined inside a factory and
bound as locals so cloudpickle serializes them by value — no
``--py-files`` needed on bare clusters.
"""

from __future__ import annotations

from collections.abc import Iterator
from types import SimpleNamespace

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Typed metadata travels beside the blob — never inside it.
IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("format", T.StringType(), True),  # png/jpeg/...
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), True),
    ]
)

AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("codec", T.StringType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("duration_s", T.DoubleType(), True),
        T.StructField("n_bytes", T.LongType(), True),
    ]
)

VIDEO_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("codec", T.StringType(), True),
        T.StructField("fps", T.DoubleType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), True),
    ]
)

FEATURE_DIM = 16

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _make_media_codecs() -> SimpleNamespace:
    """Build the codec set as nested closures (pickled BY VALUE by
    cloudpickle, so mapInPandas workers need no package install).

    Returns a namespace with: png_encode, png_decode, wav_decode,
    fake_pixels, image_decode, audio_decode.
    """
    import io
    import struct
    import wave
    import zlib

    import numpy as np

    sig = b"\x89PNG\r\n\x1a\n"

    def png_encode(arr: np.ndarray) -> bytes:
        """Minimal PNG writer (8-bit, filter 0, one IDAT). Accepts
        (h, w) gray or (h, w, ch) for ch in 1/2/3/4."""
        a = np.ascontiguousarray(arr, dtype=np.uint8)
        if a.ndim == 2:
            a = a[:, :, None]
        h, w, ch = a.shape
        color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
        raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))

        def chunk(ctype: bytes, data: bytes) -> bytes:
            return (
                struct.pack(">I", len(data))
                + ctype
                + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
            )

        ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
        return sig + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")

    def png_decode(data: bytes) -> np.ndarray:
        """Pure-stdlib PNG reader: 8-bit depth, color types 0/2/4/6,
        non-interlaced. Returns (h, w, channels) uint8."""
        if data[:8] != sig:
            raise ValueError("not a PNG (bad signature)")
        pos, idat = 8, []
        w = h = channels = None
        while pos + 8 <= len(data):
            (length,) = struct.unpack(">I", data[pos : pos + 4])
            ctype = data[pos + 4 : pos + 8]
            body = data[pos + 8 : pos + 8 + length]
            pos += 12 + length
            if ctype == b"IHDR":
                w, h, depth, color, _comp, _filt, interlace = struct.unpack(
                    ">IIBBBBB", body
                )
                if depth != 8 or interlace != 0 or color not in (0, 2, 4, 6):
                    raise ValueError(
                        f"unsupported PNG variant (depth={depth}, color={color}, "
                        f"interlace={interlace}); install Pillow for full coverage"
                    )
                channels = {0: 1, 2: 3, 4: 2, 6: 4}[color]
            elif ctype == b"IDAT":
                idat.append(body)
            elif ctype == b"IEND":
                break
        if w is None or not idat:
            raise ValueError("truncated PNG (missing IHDR/IDAT)")
        raw = zlib.decompress(b"".join(idat))
        stride, bpp = w * channels, channels
        if len(raw) != h * (stride + 1):
            raise ValueError("PNG scanline payload has wrong length")
        out = bytearray(h * stride)
        pos2 = 0
        for y in range(h):
            ftype = raw[pos2]
            pos2 += 1
            line = raw[pos2 : pos2 + stride]
            pos2 += stride
            o = y * stride
            po = o - stride
            if ftype == 0:
                out[o : o + stride] = line
                continue
            if ftype == 2 and y == 0:
                out[o : o + stride] = line
                continue
            for x in range(stride):
                a = out[o + x - bpp] if x >= bpp else 0
                b = out[po + x] if y > 0 else 0
                if ftype == 1:
                    v = line[x] + a
                elif ftype == 2:
                    v = line[x] + b
                elif ftype == 3:
                    v = line[x] + ((a + b) >> 1)
                elif ftype == 4:
                    c = out[po + x - bpp] if (y > 0 and x >= bpp) else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    v = line[x] + pred
                else:
                    raise ValueError(f"bad PNG filter type {ftype}")
                out[o + x] = v & 0xFF
        return np.frombuffer(bytes(out), dtype=np.uint8).reshape(h, w, channels)

    def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
        """Stdlib WAV reader (PCM 8/16-bit). Returns (mono float64 in
        [-1, 1], sample_rate)."""
        with wave.open(io.BytesIO(data), "rb") as wf:
            n, sr, ch, sw = (
                wf.getnframes(),
                wf.getframerate(),
                wf.getnchannels(),
                wf.getsampwidth(),
            )
            frames = wf.readframes(n)
        if sw == 2:
            x = np.frombuffer(frames, dtype="<i2").astype(np.float64) / 32768.0
        elif sw == 1:
            x = (np.frombuffer(frames, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
        else:
            raise ValueError(f"unsupported WAV sample width {sw}; install soundfile")
        if ch > 1:
            x = x.reshape(-1, ch).mean(axis=1)
        return x, sr

    def fake_pixels(payload: bytes) -> np.ndarray:
        """Deterministic fallback for undecodable payloads. crc32, NOT
        hash(): Python's bytes hash is salted per process
        (PYTHONHASHSEED), which would differ across executors/runs."""
        rng = np.random.default_rng(zlib.crc32(bytes(payload)))
        return rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)

    # Optional-dependency probes, cached in closure cells: a FAILED
    # import is not cached in sys.modules, so probing per payload would
    # re-scan sys.path on every row of a 100 TB decode job on exactly
    # the bare clusters this fallback exists for. One probe per
    # (deserialized) closure instead. [] = unprobed, [None] = absent.
    _pil_cell: list = []
    _sf_cell: list = []

    def _pil():
        if not _pil_cell:
            try:
                from PIL import Image  # optional dependency, preferred

                _pil_cell.append(Image)
            except ImportError:
                _pil_cell.append(None)
        return _pil_cell[0]

    def _soundfile():
        if not _sf_cell:
            try:
                import soundfile as sf  # optional dependency, preferred

                _sf_cell.append(sf)
            except ImportError:
                _sf_cell.append(None)
        return _sf_cell[0]

    def image_decode(payload: bytes) -> tuple[np.ndarray, str]:
        """(pixels, mode): real decode via Pillow when importable, else
        the stdlib PNG reader; anything undecodable yields the
        deterministic fake with mode='fake'."""
        if payload is None:
            raise NotImplementedError(
                "image_decode requires a payload; NULL blobs must be filtered upstream"
            )
        data = bytes(payload)
        Image = _pil()
        if Image is not None:
            try:
                px = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
                return px, "real"
            except Exception:
                pass  # unreadable by PIL -> try stdlib / fake
        if data[:8] == sig:
            try:
                return png_decode(data), "real"
            except Exception:
                pass  # corrupt/unsupported PNG -> fake
        return fake_pixels(data), "fake"

    def fake_samples(payload: bytes) -> tuple[np.ndarray, int]:
        rng = np.random.default_rng(zlib.crc32(bytes(payload)))
        return rng.uniform(-1.0, 1.0, size=1600), 16000

    def audio_decode(payload: bytes) -> tuple[np.ndarray, int, str]:
        """(samples, sample_rate, mode): soundfile when importable,
        stdlib wave for PCM WAV, deterministic fake otherwise."""
        if payload is None:
            raise NotImplementedError(
                "audio_decode requires a payload; NULL blobs must be filtered upstream"
            )
        data = bytes(payload)
        sf = _soundfile()
        if sf is not None:
            try:
                x, sr = sf.read(io.BytesIO(data), dtype="float64", always_2d=True)
                return x.mean(axis=1), int(sr), "real"
            except Exception:
                pass
        try:
            x, sr = wav_decode(data)
            return x, sr, "real"
        except Exception:
            pass
        x, sr = fake_samples(data)
        return x, sr, "fake"

    return SimpleNamespace(
        png_encode=png_encode,
        png_decode=png_decode,
        wav_decode=wav_decode,
        fake_pixels=fake_pixels,
        image_decode=image_decode,
        audio_decode=audio_decode,
    )


# Module-level handles for direct (driver-side / test) use.
_CODECS = _make_media_codecs()
png_encode = _CODECS.png_encode
png_decode = _CODECS.png_decode
wav_decode = _CODECS.wav_decode


def _make_image_decoder():
    """Back-compat shim: pixels-only decoder (fake-or-real), bound as a
    local so cloudpickle serializes it by value."""
    codecs = _make_media_codecs()

    def decode(payload: bytes) -> np.ndarray:
        return codecs.image_decode(payload)[0]

    return decode


_decode_image_stub = _make_image_decoder()


def synthesize_image_corpus(
    df: DataFrame,
    id_col: str = "media_id",
    width: int = 8,
    height: int = 8,
) -> DataFrame:
    """Deterministic REAL-PNG corpus synthesizer: one IMAGE_SCHEMA row
    per input row, payload a genuine stdlib-encoded RGB PNG whose
    pixels are crc32(id)-seeded — so a benchmark or test built on it
    exercises the REAL decode path end to end (``decode_mode='real'``
    downstream), not the fake fallback. Runs as one Arrow pass
    (mapInPandas) with zero shuffle; generation cost mirrors decode
    cost, which is the honest shape for a media-pipeline benchmark
    when the container has no sample media and the testdata tree is
    read-only."""
    codecs = _make_media_codecs()
    w, h = int(width), int(height)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import zlib

        import numpy as np

        for pdf in batches:
            ids, payloads, nb = [], [], []
            for i in pdf[id_col]:
                rng = np.random.default_rng(zlib.crc32(str(int(i)).encode()))
                px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
                data = codecs.png_encode(px)
                ids.append(int(i))
                payloads.append(data)
                nb.append(len(data))
            yield pd.DataFrame(
                {
                    "media_id": pd.array(ids, dtype="int64"),
                    "payload": payloads,
                    "format": "png",
                    "width": pd.array([w] * len(ids), dtype="int32"),
                    "height": pd.array([h] * len(ids), dtype="int32"),
                    "n_bytes": pd.array(nb, dtype="int64"),
                }
            )

    return df.select(id_col).mapInPandas(run, IMAGE_SCHEMA)


def synthesize_audio_corpus(
    df: DataFrame,
    id_col: str = "media_id",
    sample_rate: int = 8000,
    duration_s: float = 0.2,
) -> DataFrame:
    """Deterministic REAL-WAV corpus synthesizer: PCM16 mono sine at an
    id-derived frequency, written by the stdlib ``wave`` encoder — the
    audio twin of :func:`synthesize_image_corpus`, giving downstream
    :func:`audio_features` a genuinely decodable payload
    (``decode_mode='real'``). One Arrow pass, no shuffle."""
    sr, dur = int(sample_rate), float(duration_s)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import wave
        import zlib

        import numpy as np

        n = max(1, int(sr * dur))
        t = np.arange(n) / sr
        for pdf in batches:
            ids, payloads, nb = [], [], []
            for i in pdf[id_col]:
                seed = zlib.crc32(str(int(i)).encode())
                freq = 100.0 + (seed % 3000)  # 100..3099 Hz, deterministic
                x = (np.sin(2 * np.pi * freq * t) * 0.5 * 32767).astype("<i2")
                buf = io.BytesIO()
                with wave.open(buf, "wb") as wf:
                    wf.setnchannels(1)
                    wf.setsampwidth(2)
                    wf.setframerate(sr)
                    wf.writeframes(x.tobytes())
                data = buf.getvalue()
                ids.append(int(i))
                payloads.append(data)
                nb.append(len(data))
            yield pd.DataFrame(
                {
                    "media_id": pd.array(ids, dtype="int64"),
                    "payload": payloads,
                    "codec": "pcm_s16le",
                    "sample_rate": pd.array([sr] * len(ids), dtype="int32"),
                    "duration_s": dur,
                    "n_bytes": pd.array(nb, dtype="int64"),
                }
            )

    return df.select(id_col).mapInPandas(run, AUDIO_SCHEMA)


def extract_image_features(df: DataFrame) -> DataFrame:
    """Decode + feature-extract images into array<float> columns.

    mapInPandas over Arrow batches; output carries the metadata through
    plus a FEATURE_DIM-float normalized-histogram embedding, a
    mean-pixel summary, and ``decode_mode`` ('real' for PNG/Pillow
    decodes, 'fake' for the deterministic fallback).
    """
    out_schema = T.StructType(
        [f for f in IMAGE_SCHEMA.fields if f.name != "payload"]
        + [
            T.StructField("mean_pixel", T.DoubleType(), True),
            T.StructField("features", T.ArrayType(T.FloatType()), True),
            T.StructField("decode_mode", T.StringType(), True),
        ]
    )

    codecs = _make_media_codecs()  # local bind -> pickled by value
    dim = FEATURE_DIM

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            means, feats, modes = [], [], []
            for payload in pdf["payload"]:
                px, mode = codecs.image_decode(payload)
                means.append(float(px.mean()))
                hist = np.histogram(px, bins=dim, range=(0, 256))[0]
                total = max(int(hist.sum()), 1)
                feats.append((hist / total).astype(np.float32).tolist())
                modes.append(mode)
            yield pdf.drop(columns=["payload"]).assign(
                mean_pixel=means, features=feats, decode_mode=modes
            )

    return df.mapInPandas(run, out_schema)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Nearest-neighbor resize + PNG re-encode for decodable payloads;
    undecodable payloads pass through with metadata-only update (the
    prior stub behavior, now the documented fallback)."""
    out_schema = IMAGE_SCHEMA

    codecs = _make_media_codecs()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            payloads, fmts, n_bytes = [], [], []
            for payload, fmt in zip(pdf["payload"], pdf["format"]):
                if payload is None:
                    payloads.append(None)
                    fmts.append(fmt)
                    n_bytes.append(None)
                    continue
                px, mode = codecs.image_decode(payload)
                if mode == "real":
                    h, w = px.shape[0], px.shape[1]
                    yi = (np.arange(height) * h // height).clip(0, h - 1)
                    xi = (np.arange(width) * w // width).clip(0, w - 1)
                    data = codecs.png_encode(px[yi][:, xi])
                    payloads.append(data)
                    fmts.append("png")  # re-encoded container
                    n_bytes.append(len(data))
                else:
                    payloads.append(bytes(payload))
                    fmts.append(fmt)
                    n_bytes.append(len(payload))
            yield pdf.assign(
                payload=payloads,
                format=fmts,
                width=width,
                height=height,
                n_bytes=pd.array(n_bytes, dtype="Int64"),
            )

    return df.mapInPandas(run, out_schema)


def sample_video_frames(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame index.

    Frame *selection* is pure Spark (sequence + explode — no Python);
    per-frame decode would need a video codec (not available even via
    stdlib), so it remains out of scope.
    """
    return (
        df.withColumn(
            "frame_index",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.coalesce(F.col("n_frames"), F.lit(1)) - 1, F.lit(0)),
                    F.lit(every_n),
                )
            ),
        )
        .withColumn("frame_ts_s", F.col("frame_index") / F.coalesce(F.col("fps"), F.lit(30.0)))
        .drop("payload")
    )


def audio_features(df: DataFrame) -> DataFrame:
    """Audio features with real WAV/soundfile decode: RMS level,
    measured duration, and a FEATURE_DIM-band normalized power
    spectrum (rfft band energies). Undecodable payloads get the
    deterministic fake signal with ``decode_mode='fake'``."""
    out_schema = T.StructType(
        [f for f in AUDIO_SCHEMA.fields if f.name != "payload"]
        + [
            T.StructField("byte_rate", T.DoubleType(), True),
            T.StructField("rms", T.DoubleType(), True),
            T.StructField("measured_duration_s", T.DoubleType(), True),
            T.StructField("features", T.ArrayType(T.FloatType()), True),
            T.StructField("decode_mode", T.StringType(), True),
        ]
    )

    codecs = _make_media_codecs()
    dim = FEATURE_DIM

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rms, dur, feats, modes = [], [], [], []
            for payload in pdf["payload"]:
                x, sr, mode = codecs.audio_decode(payload)
                rms.append(float(np.sqrt(np.mean(x * x))) if len(x) else 0.0)
                dur.append(len(x) / sr if sr else 0.0)
                if len(x) == 0:
                    # a valid zero-frame WAV decodes to an empty signal;
                    # rfft([]) raises — emit a zero spectrum instead of
                    # killing the task on one degenerate blob
                    feats.append([0.0] * dim)
                    modes.append(mode)
                    continue
                spec = np.abs(np.fft.rfft(x)) ** 2
                bands = np.array_split(spec, dim)
                energy = np.array([float(b.sum()) for b in bands])
                total = max(float(energy.sum()), 1e-12)
                feats.append((energy / total).astype(np.float32).tolist())
                modes.append(mode)
            rate = pdf["n_bytes"] / pdf["duration_s"].clip(lower=1e-9)
            yield pdf.drop(columns=["payload"]).assign(
                byte_rate=rate,
                rms=rms,
                measured_duration_s=dur,
                features=feats,
                decode_mode=modes,
            )

    return df.mapInPandas(run, out_schema)
