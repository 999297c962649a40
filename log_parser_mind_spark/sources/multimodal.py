"""Multimodal columns: image/audio/video as opaque ``binary`` + typed metadata.

The Spark-side plumbing is real — schema (schemas.MEDIA_ASSETS), partitioning,
Arrow-batched ``mapInPandas`` UDF signatures, batch shapes. The codec step
decodes REAL bytes for the two formats a container with no media libraries
can still parse honestly:

  - image: binary PPM (P6, maxval 255) — a pure-Python header parse + raw
    RGB buffer, no compression to reimplement.
  - audio: PCM16 WAV via the stdlib ``wave`` module.

Everything else (PNG/JPEG, compressed audio, any video) stays behind the
loud ``NotImplementedError`` gate — those codecs are NOT installed here and
a silent wrong-decode would be worse than the gate. ``fake=True`` keeps the
deterministic hash-derived stand-in (same schema/batch shape) for pipeline
tests that don't care about pixels.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..schemas import MEDIA_ASSETS

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.StringType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def synth_assets(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake assets: payload bytes derived from sha256(seed, i)."""
    rows = []
    for i in range(n):
        media = ["image", "audio", "video"][i % 3]
        payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * (4 + i % 5)
        meta = {
            "image": (64 + i % 8, 48, None, None, None),
            "audio": (None, None, 1000 * (1 + i % 10), 16000, None),
            "video": (320, 240, 2000, None, 48 + i % 24),
        }[media]
        rows.append(
            (f"asset_{i:06d}", f"conv_{i % 7:08d}", i % 5, media, f"{media}/x-fake", payload, meta)
        )
    return spark.createDataFrame(rows, MEDIA_ASSETS)


def _hash_bytes(seed: int, i: int, n: int) -> bytes:
    """n deterministic bytes from chained sha256 — hashlib, not numpy RNG,
    so locked goldens cannot drift across numpy versions (NEP 19 does not
    guarantee Generator stream stability)."""
    out = b""
    block = hashlib.sha256(f"{seed}:{i}".encode()).digest()
    while len(out) < n:
        out += block
        block = hashlib.sha256(block).digest()
    return out[:n]


def synth_real_assets(spark: SparkSession, n: int = 32, seed: int = 42) -> DataFrame:
    """Deterministic REAL-format assets for the honest decode path: even
    rows are binary PPM images (header incl. a comment line — exercising
    the parser's grammar), odd rows PCM16 WAV. Payload bytes are
    hash-derived, so the decoded features are a pure function of (seed, i)."""
    import io
    import wave

    rows = []
    for i in range(n):
        if i % 2 == 0:
            w, h = 8 + i % 8, 6 + i % 5
            payload = (
                b"P6\n# synth fixture\n%d %d\n255\n" % (w, h)
                + _hash_bytes(seed, i, w * h * 3)
            )
            media, mime = "image", "image/x-portable-pixmap"
            meta = (w, h, None, None, None)
        else:
            rate, nsamp = 8000, 400 + 40 * (i % 5)
            buf = io.BytesIO()
            with wave.open(buf, "wb") as wf:
                wf.setnchannels(1)
                wf.setsampwidth(2)
                wf.setframerate(rate)
                wf.writeframes(_hash_bytes(seed, i, nsamp * 2))
            payload = buf.getvalue()
            media, mime = "audio", "audio/wav"
            meta = (None, None, int(1000 * nsamp / rate), rate, None)
        rows.append(
            (f"rasset_{i:06d}", f"conv_{i % 7:08d}", i % 5, media, mime, payload, meta)
        )
    return spark.createDataFrame(rows, MEDIA_ASSETS)


def _fake_features(payload: bytes) -> list[float]:
    digest = hashlib.sha256(payload or b"").digest()
    arr = np.frombuffer(digest[: FEATURE_DIM * 2], dtype=np.uint16).astype(np.float32)
    return (arr / 65535.0).tolist()


def decode_ppm(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Binary PPM (P6) → (width, height, uint8 array of shape (h, w, 3)).
    Full header grammar: 'P6', then width/height/maxval as ASCII decimals
    separated by whitespace, '#' comments running to end-of-line allowed
    between tokens, ONE whitespace byte after maxval, then w*h*3 raw RGB
    bytes. Only maxval 255 (1-byte samples) is supported. Raises ValueError
    on anything malformed — never a silent partial decode."""
    if not payload or not payload.startswith(b"P6"):
        raise ValueError("not a binary PPM (missing P6 magic)")
    pos = 2
    tokens: list[int] = []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if pos < len(payload) and payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and payload[pos : pos + 1].isdigit():
            pos += 1
        if pos == start:
            raise ValueError("malformed PPM header (expected decimal token)")
        tokens.append(int(payload[start:pos]))
    w, h, maxval = tokens
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval} (only 255)")
    # exactly ONE whitespace byte separates maxval from the raster
    if pos >= len(payload) or not payload[pos : pos + 1].isspace():
        raise ValueError("malformed PPM header (raster must follow one whitespace byte)")
    pos += 1
    raster = payload[pos:]
    if len(raster) < w * h * 3:
        raise ValueError(f"truncated PPM raster: {len(raster)} of {w * h * 3} bytes")
    if len(raster) > w * h * 3:
        raise ValueError(f"trailing bytes after PPM raster: {len(raster) - w * h * 3}")
    return w, h, np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)


def _ppm_features(payload: bytes) -> list[float]:
    """16-dim image features from REAL pixels: normalized dims, per-channel
    mean/std, 8-bin luma histogram fractions. float64 math rounded to 6dp
    before the float32 cast — bit-stable across runs and parallelism."""
    w, h, px = decode_ppm(payload)
    chans = px.reshape(-1, 3).astype(np.float64) / 255.0
    luma = chans @ np.array([0.299, 0.587, 0.114])
    hist, _ = np.histogram(luma, bins=8, range=(0.0, 1.0))
    feats = (
        [w / 256.0, h / 256.0]
        + chans.mean(axis=0).tolist()
        + chans.std(axis=0).tolist()
        + (hist / luma.size).tolist()
    )
    return [round(float(x), 6) for x in feats]


def decode_wav(payload: bytes) -> tuple[int, int, np.ndarray]:
    """PCM16 WAV via the stdlib ``wave`` module → (n_channels, sample_rate,
    int16 sample array, channel-interleaved). Raises on non-PCM16."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as wf:
        if wf.getsampwidth() != 2:
            raise ValueError(f"unsupported WAV sample width {wf.getsampwidth()} (only PCM16)")
        frames = wf.readframes(wf.getnframes())
        return (
            wf.getnchannels(),
            wf.getframerate(),
            np.frombuffer(frames, dtype="<i2"),
        )


def _wav_features(payload: bytes) -> list[float]:
    """16-dim audio features from REAL samples: channels, rate, duration,
    RMS, zero-crossing rate, peak, 10-bin |amplitude| histogram fractions."""
    n_ch, rate, samples = decode_wav(payload)
    x = samples.astype(np.float64) / 32768.0
    n = max(x.size, 1)
    zc = float(np.count_nonzero(np.diff(np.signbit(x)))) / n if x.size > 1 else 0.0
    hist, _ = np.histogram(np.abs(x), bins=10, range=(0.0, 1.0))
    feats = [
        n_ch / 8.0,
        rate / 48000.0,
        (x.size / n_ch / rate) if rate else 0.0,
        float(np.sqrt(np.mean(x * x))) if x.size else 0.0,
        zc,
        float(np.max(np.abs(x))) if x.size else 0.0,
    ] + (hist / n).tolist()
    return [round(float(x), 6) for x in feats]


def _real_features(media_type: str, payload: bytes) -> list[float]:
    payload = payload or b""
    if media_type == "image" and payload.startswith(b"P6"):
        return _ppm_features(payload)
    if media_type == "audio" and payload.startswith(b"RIFF"):
        return _wav_features(payload)
    raise NotImplementedError(
        f"no in-container codec for media_type={media_type!r} with this payload: "
        "real decode supports binary PPM images and PCM16 WAV audio only (PIL / "
        "soundfile / av are not installed); pass fake=True for the deterministic "
        "stand-in"
    )


def decode_and_featurize(assets: DataFrame, fake: bool = False) -> DataFrame:
    """Arrow-batched decode → feature-extract. ``fake=False`` decodes REAL
    bytes for PPM images and PCM16 WAV audio (pure-Python / stdlib — see
    module docstring) and raises loudly for any other format; ``fake=True``
    swaps the deterministic hash stand-in with the same schema/batch
    shape."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if fake:
                feats = pdf["payload"].map(_fake_features)
            else:
                feats = [
                    _real_features(m, b)
                    for m, b in zip(pdf["media_type"], pdf["payload"])
                ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(lambda b: len(b or b"")).astype("int32"),
                    "features": feats,
                }
            )

    cols = assets.select("asset_id", "media_type", "payload")
    return cols.mapInPandas(run, schema=FEATURES_SCHEMA)


def frame_sample_plan(assets: DataFrame, every_ms: int = 500) -> DataFrame:
    """Video frame-sampling plumbing: expand each video into (asset_id,
    frame_ts_ms) rows natively (sequence+explode); the decode of each frame
    would be a second mapInPandas over this plan."""
    v = assets.filter(F.col("media_type") == "video")
    return v.select(
        "asset_id",
        F.explode(
            F.sequence(F.lit(0), F.coalesce(F.col("meta.duration_ms"), F.lit(0)), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )


def media_stats(assets: DataFrame) -> DataFrame:
    """Typed-metadata aggregates over the opaque payloads."""
    return assets.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_assets"),
        F.sum(F.octet_length("payload")).alias("total_bytes"),
        F.avg(F.coalesce(F.col("meta.duration_ms"), F.lit(0))).alias("avg_duration_ms"),
    )
