"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with metadata
columns (modality, width/height or sample rate, codec). The Ray-side
plumbing — schema, small batch sizes for wide rows, actor-pool decode
stage signature, output layout — is real and tested, and ``DecodeStage``
carries REAL pure-numpy decoders for uncompressed containers
(``functions.media``: RIFF/WAVE PCM16 audio, P6 binary PPM images);
compressed codecs (png/jpeg/mp4 — libraries absent in this container)
raise ``NotImplementedError``. ``fake_decoder=True`` keeps the
deterministic payload-hash feature double for the synthetic opaque path.

The reference's analog is its HDF5 granule decode (fill-value -> NaN,
scale factor; ``VNP09GA.py:84-123``): opaque stored payload -> typed
in-memory value, once per record, inside a stateful stage.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ecov003_l2t_stars_ray.functions.media import (
    decode_ppm,
    decode_wav,
    encode_ppm,
    encode_wav,
)

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("modality", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("sample_rate", pa.int32()),
        ("codec", pa.string()),
    ]
)


def synthesize_media(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic fake media table (payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    modality = np.array(["image", "audio", "video"])[rng.integers(0, 3, n)]
    payloads = [rng.integers(0, 256, size=int(sz), dtype=np.uint8).tobytes()
                for sz in rng.integers(256, 4096, n)]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "modality": pa.array(modality),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(rng.integers(16, 512, n).astype(np.int32)),
            "height": pa.array(rng.integers(16, 512, n).astype(np.int32)),
            "sample_rate": pa.array(
                np.where(modality == "audio", 16000, 0).astype(np.int32)
            ),
            "codec": pa.array(np.where(modality == "image", "png", "raw")),
        },
        schema=MEDIA_SCHEMA,
    )


def synthesize_real_media(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic media table with REAL payloads (WAV sines, PPM noise)."""
    rng = np.random.default_rng(seed)
    rows: dict[str, list] = {k: [] for k in MEDIA_SCHEMA.names}
    for i in range(n):
        if i % 2 == 0:  # audio: sine burst, PCM16 WAV
            rate = int(rng.choice([8000, 16000]))
            dur = float(rng.uniform(0.05, 0.2))
            freq = float(rng.uniform(200.0, 2000.0))
            amp = float(rng.uniform(0.3, 0.95))
            t = np.arange(int(dur * rate)) / rate
            payload = encode_wav(amp * np.sin(2 * np.pi * freq * t), rate)
            meta = ("audio", 0, 0, rate, "wav")
        else:  # image: uint8 noise, binary PPM
            w, h = int(rng.integers(8, 33)), int(rng.integers(8, 33))
            payload = encode_ppm(rng.integers(0, 256, (h, w, 3), dtype=np.uint8))
            meta = ("image", w, h, 0, "ppm")
        modality, w, h, rate, codec = meta
        rows["media_id"].append(i)
        rows["modality"].append(modality)
        rows["payload"].append(payload)
        rows["width"].append(w)
        rows["height"].append(h)
        rows["sample_rate"].append(rate)
        rows["codec"].append(codec)
    return pa.table(rows, schema=MEDIA_SCHEMA)


class DecodeStage:
    """Actor-pool decode/feature-extract stage.

    The codec registry is built ONCE in ``__init__`` (the place a real
    deployment loads model weights / codec contexts). Real decoders exist
    for ``wav`` (RIFF PCM16) and ``ppm`` (netpbm P6) via
    ``functions.media``; any other codec raises ``NotImplementedError``
    (compressed-codec libraries are absent in this container).
    ``fake_decoder=True`` keeps the payload-hash feature double instead.

    Every path emits the same 8-dim float64 ``feature`` column so the
    downstream schema is codec-independent:

    - audio: duration_s, rms, peak, zero-cross rate, mean, std,
      n_channels, sample_rate/48000
    - image: width, height, mean R/G/B (0-1), std (0-1), aspect w/h
    """

    def __init__(self, fake_decoder: bool = False):
        self.fake = fake_decoder
        self._codecs = {"wav": self._audio_features, "ppm": self._image_features}

    @staticmethod
    def _audio_features(payload: bytes) -> np.ndarray:
        x, rate = decode_wav(payload)
        mono = x.mean(axis=1)
        zc = np.count_nonzero(np.signbit(mono[1:]) != np.signbit(mono[:-1]))
        return np.array(
            [
                len(mono) / rate,
                float(np.sqrt(np.mean(mono**2))),
                float(np.abs(mono).max(initial=0.0)),
                zc / max(len(mono) - 1, 1),
                float(mono.mean()) if len(mono) else 0.0,
                float(mono.std()),
                float(x.shape[1]),
                rate / 48000.0,
            ]
        )

    @staticmethod
    def _image_features(payload: bytes) -> np.ndarray:
        img = decode_ppm(payload)
        h, w = img.shape[:2]
        chan = img.reshape(-1, 3).mean(axis=0) / 255.0
        return np.array(
            [float(w), float(h), chan[0], chan[1], chan[2],
             float(img.std()) / 255.0, w / h],
        )

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        feats = np.zeros((len(df), 8), dtype=np.float64)
        if self.fake:
            for i, p in enumerate(df["payload"]):
                feats[i] = (
                    np.frombuffer(
                        hashlib.blake2b(p, digest_size=64).digest(), dtype=np.uint8
                    )[:8].astype(np.float64)
                    / 255.0
                )
        else:
            for i, (p, codec) in enumerate(zip(df["payload"], df["codec"])):
                fn = self._codecs.get(codec)
                if fn is None:
                    raise NotImplementedError(
                        f"no decoder for codec {codec!r}: only uncompressed "
                        "wav/ppm are decodable without media libraries"
                    )
                f = fn(p)
                feats[i, : len(f)] = f
        out = df.drop(columns=["payload"]).copy()
        out["feature"] = list(feats)
        out["payload_bytes"] = df["payload"].map(len).astype("int64")
        return out


def decode_features(
    media: ray.data.Dataset, fake_decoder: bool = True
) -> ray.data.Dataset:
    """Decode stage wiring: small batches (wide binary rows), actor pool."""
    return media.map_batches(
        DecodeStage,
        fn_constructor_kwargs={"fake_decoder": fake_decoder},
        batch_format="pandas",
        batch_size=32,  # wide rows: keep batch x concurrency within heap
        concurrency=(1, 4),
    )


class ThumbnailStage:
    """Actor-pool image RESIZE stage: decode PPM -> nearest-neighbor
    downsample to ``side x side`` -> re-encode PPM, plus per-thumbnail
    mean channel stats.

    Nearest-neighbor index math is pure integer selection
    (``src = (dst * src_dim) // side``), so thumbnails are bit-exact and
    cluster-size independent — the property the golden pytest pins.
    Non-image rows pass through with a null thumbnail (schema-total, like
    the reference's BlankOutput gate).  Same actor-pool shape as
    :class:`DecodeStage` (K6 one-time init; small batches because rows
    carry binary payloads).  Reference analog: the coarse->fine raster
    resampling step (`ECOv003_L2T_STARS` upsampling of 490 m composites
    to the 70 m grid) as a Ray Data stage."""

    def __init__(self, side: int = 8):
        self.side = int(side)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        from ..functions.media import decode_ppm, encode_ppm

        side = self.side
        thumbs: list = []
        means = np.full((len(df), 3), np.nan)
        for i, (payload, codec) in enumerate(zip(df["payload"], df["codec"])):
            if codec != "ppm":
                thumbs.append(None)
                continue
            img = decode_ppm(payload)
            h, w = img.shape[:2]
            ys = (np.arange(side, dtype=np.int64) * h) // side
            xs = (np.arange(side, dtype=np.int64) * w) // side
            th = img[np.ix_(ys, xs)]
            thumbs.append(encode_ppm(th))
            means[i] = th.reshape(-1, 3).mean(axis=0)
        out = df.drop(columns=["payload"]).copy()
        out["thumbnail"] = thumbs
        out["thumb_mean_r"] = means[:, 0]
        out["thumb_mean_g"] = means[:, 1]
        out["thumb_mean_b"] = means[:, 2]
        return out


def thumbnail_media(
    media: ray.data.Dataset, side: int = 8
) -> ray.data.Dataset:
    """Resize stage wiring: actor pool, small binary-row batches."""
    return media.map_batches(
        ThumbnailStage,
        fn_constructor_kwargs={"side": side},
        batch_format="pandas",
        batch_size=32,
        concurrency=(1, 4),
    )
