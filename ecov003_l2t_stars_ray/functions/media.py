"""Pure-numpy media codecs for the multimodal decode stage.

Two uncompressed container formats are implemented from their public
specifications only (no image/audio libraries exist in this container):

- **WAV** (RIFF/WAVE, PCM 16-bit): ``encode_wav`` / ``decode_wav``.
- **PPM** (netpbm P6 binary, maxval 255): ``encode_ppm`` / ``decode_ppm``.

These are the real decoders behind ``pipelines.multimodal.DecodeStage`` —
the analog of the reference's opaque-granule decode (stored payload ->
typed in-memory array, ``VNP09GA.py:84-123``), here for audio/image
payload columns instead of raster granules.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_wav", "decode_wav", "encode_ppm", "decode_ppm"]


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode mono/stereo PCM16 WAV.

    ``samples``: 1-D (mono) or 2-D ``(n, channels)`` array. Float inputs
    are clipped to [-1, 1] and scaled to int16; integer inputs must
    already be int16-range.
    """
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2:
        raise ValueError("samples must be 1-D or 2-D (n, channels)")
    if np.issubdtype(arr.dtype, np.floating):
        pcm = np.round(np.clip(arr, -1.0, 1.0) * 32767.0).astype("<i2")
    else:
        pcm = arr.astype("<i2")
    n_channels = pcm.shape[1]
    byte_rate = sample_rate * n_channels * 2
    block_align = n_channels * 2
    data = pcm.tobytes()  # interleaved row-major == interleaved channels
    fmt_chunk = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, n_channels, sample_rate, byte_rate,
        block_align, 16,
    )
    data_header = struct.pack("<4sI", b"data", len(data))
    riff_size = 4 + len(fmt_chunk) + len(data_header) + len(data)
    return struct.pack("<4sI4s", b"RIFF", riff_size, b"WAVE") + fmt_chunk + data_header + data


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM16 RIFF/WAVE payload -> ``(float64 (n, ch) in [-1,1], rate)``.

    Walks the chunk list (tolerates extra chunks like LIST/fact); only
    format tag 1 (PCM) at 16 bits is supported.
    """
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, len(payload)
    sample_rate = n_channels = None
    data = None
    while pos + 8 <= end:
        cid, csize = struct.unpack_from("<4sI", payload, pos)
        pos += 8
        body = payload[pos : pos + csize]
        if cid == b"fmt ":
            tag, n_channels, sample_rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if tag != 1 or bits != 16:
                raise ValueError(f"unsupported WAV format tag={tag} bits={bits}")
        elif cid == b"data":
            data = body
        pos += csize + (csize & 1)  # chunks are word-aligned
    if sample_rate is None or data is None:
        raise ValueError("WAV payload missing fmt/data chunk")
    pcm = np.frombuffer(data, dtype="<i2")
    pcm = pcm[: (len(pcm) // n_channels) * n_channels].reshape(-1, n_channels)
    return pcm.astype(np.float64) / 32768.0, int(sample_rate)


def encode_ppm(img: np.ndarray) -> bytes:
    """Encode an ``(h, w, 3)`` uint8 array as binary PPM (P6, maxval 255)."""
    arr = np.ascontiguousarray(img, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("image must be (h, w, 3) uint8")
    h, w = arr.shape[:2]
    return f"P6\n{w} {h}\n255\n".encode() + arr.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Decode a binary PPM (P6) payload -> ``(h, w, 3)`` uint8 array.

    Handles arbitrary whitespace and ``#`` comments in the header, per the
    netpbm spec.
    """
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        # skip whitespace and comments
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    raster = np.frombuffer(payload, dtype=np.uint8, count=h * w * 3, offset=pos)
    return raster.reshape(h, w, 3)
