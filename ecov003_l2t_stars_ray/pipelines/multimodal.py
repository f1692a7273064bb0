"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with metadata
columns (modality, width/height or sample rate, codec). The Ray-side
plumbing — schema, small batch sizes for wide rows, actor-pool decode
stage signature, output layout — is real and tested; the actual decode is
STUBBED (no image/audio libraries in this container): ``DecodeStage``
raises ``NotImplementedError`` unless constructed with
``fake_decoder=True``, which produces a deterministic fake feature vector
from the payload bytes so the downstream pipeline shape is exercised.

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


class DecodeStage:
    """Actor-pool decode/feature-extract stage.

    Real deployments construct with a decoder callable loaded ONCE in
    ``__init__`` (model weights, codec context). Here: ``fake_decoder=True``
    derives a deterministic 8-dim feature from payload bytes; otherwise the
    stage raises NotImplementedError at first batch (decode libs absent).
    """

    def __init__(self, fake_decoder: bool = False):
        self.fake = fake_decoder

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        if not self.fake:
            raise NotImplementedError(
                "media decode requires image/audio libraries not present in "
                "this environment; construct DecodeStage(fake_decoder=True) "
                "for the deterministic test double"
            )
        feats = np.stack(
            [
                np.frombuffer(
                    hashlib.blake2b(p, digest_size=64).digest(), dtype=np.uint8
                )[:8].astype(np.float64)
                / 255.0
                for p in df["payload"]
            ]
        )
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
