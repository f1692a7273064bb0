"""Integrity checksums for lineage fragments.

The reference verifies every downloaded granule with a POSIX `cksum`
CRC-32 plus size (``cksum.py:9-66``, ``LPDAACDataPool.py:368-430``). The
engine records the same style of integrity column for input fragments in
its lineage manifest. Implemented from the POSIX.1-2017 `cksum`
specification (CRC-32/CKSUM: polynomial 0x04C11DB7, MSB-first, length
appended LSB-first, final complement) — not a copy of the reference code.
"""

from __future__ import annotations

import zlib

_POLY = 0x04C11DB7
_TABLE = []
for _i in range(256):
    _c = _i << 24
    for _ in range(8):
        _c = ((_c << 1) ^ _POLY) if (_c & 0x80000000) else (_c << 1)
        _c &= 0xFFFFFFFF
    _TABLE.append(_c)


def posix_cksum(data: bytes) -> tuple[int, int]:
    """(crc, length) exactly as the POSIX `cksum` utility prints."""
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _TABLE[((crc >> 24) & 0xFF) ^ b]
    n = len(data)
    length = n
    while n > 0:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _TABLE[((crc >> 24) & 0xFF) ^ (n & 0xFF)]
        n >>= 8
    return (~crc) & 0xFFFFFFFF, length


def crc32_file(path: str, chunk: int = 1 << 20) -> int:
    """Streaming zlib CRC-32 of a file (fast integrity column)."""
    crc = 0
    with open(path, "rb") as f:
        while True:
            buf = f.read(chunk)
            if not buf:
                return crc & 0xFFFFFFFF
            crc = zlib.crc32(buf, crc)
