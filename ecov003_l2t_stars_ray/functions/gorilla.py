"""Gorilla time-series compression: delta-of-delta timestamps + XOR values.

Per the north rule, each retention tier's (bucket_start, value) series is
compressed per block with the Gorilla codec (Pelkonen et al., "Gorilla: a
fast, scalable, in-memory time series database", VLDB 2015; see also Chimp,
VLDB 2022, in PAPERS.md). No analog exists in the reference — this is the
engine's own storage format for rolled-up series.

Encoding:
- header: first timestamp (64 bits) + first delta (64 bits) + first value
  (64 bits raw IEEE-754).
- timestamps: delta-of-delta D with prefix codes
  '0' (D=0), '10'+7b, '110'+9b, '1110'+12b, '1111'+64b
  (microsecond resolution needs the wide escape; the paper's ranges are
  kept for the common bucket-aligned case where D is exactly 0).
- values: XOR with previous; '0' if identical; '10' + meaningful bits if
  the leading/trailing-zero window fits the previous one; '11' + 5b leading
  + 6b (length-1) + meaningful bits otherwise.

NaN (gap buckets) round-trips bit-exactly since encoding is on raw bits.
Pure-Python bit I/O operating on one series chunk at a time — called once
per (conv_id, metric, tier) run inside ``map_batches``, so the Python loop
is per-point within an already-small rolled-up block.
"""

from __future__ import annotations

import struct

import numpy as np


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int) -> None:
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def finish(self) -> bytes:
        if self.nbits:
            self.buf.append((self.acc << (8 - self.nbits)) & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.buf)


class _BitReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read(self, bits: int) -> int:
        out = 0
        remaining = bits
        while remaining:
            byte = self.data[self.pos >> 3]
            avail = 8 - (self.pos & 7)
            take = min(avail, remaining)
            shift = avail - take
            out = (out << take) | ((byte >> shift) & ((1 << take) - 1))
            self.pos += take
            remaining -= take
        return out


_DOD_RANGES = ((7, 0b10, 2), (9, 0b110, 3), (12, 0b1110, 4))


def compress(ts_us: np.ndarray, values: np.ndarray) -> bytes:
    """Compress parallel int64-us timestamps + float64 values to bytes."""
    ts = np.asarray(ts_us, dtype=np.int64)
    vals = np.asarray(values, dtype=np.float64).view(np.uint64)
    n = len(ts)
    header = struct.pack("<I", n)
    if n == 0:
        return header
    w = _BitWriter()
    w.write(int(ts[0]) & ((1 << 64) - 1), 64)
    w.write(int(vals[0]), 64)
    prev_delta = 0
    if n > 1:
        first_delta = int(ts[1] - ts[0])
        w.write(first_delta & ((1 << 64) - 1), 64)
        prev_delta = first_delta

    prev_lead, prev_len = -1, -1
    prev_val = int(vals[0])
    prev_ts = int(ts[0])
    for i in range(1, n):
        # --- timestamp: delta-of-delta
        if i >= 2:
            delta = int(ts[i]) - prev_ts
            dod = delta - prev_delta
            prev_delta = delta
            if dod == 0:
                w.write(0, 1)
            else:
                for bits, code, codebits in _DOD_RANGES:
                    lo, hi = -(1 << (bits - 1)) + 1, (1 << (bits - 1))
                    if lo <= dod <= hi:
                        w.write(code, codebits)
                        w.write(dod + (1 << (bits - 1)) - 1, bits)
                        break
                else:
                    w.write(0b1111, 4)
                    w.write(dod & ((1 << 64) - 1), 64)
        prev_ts = int(ts[i])
        # --- value: XOR
        v = int(vals[i])
        xor = v ^ prev_val
        prev_val = v
        if xor == 0:
            w.write(0, 1)
            continue
        lead = 64 - xor.bit_length()
        if lead > 31:
            lead = 31
        trail = (xor & -xor).bit_length() - 1
        mlen = 64 - lead - trail
        if prev_lead >= 0 and lead >= prev_lead and (64 - prev_lead - prev_len) <= trail:
            w.write(0b10, 2)
            w.write(xor >> (64 - prev_lead - prev_len), prev_len)
        else:
            w.write(0b11, 2)
            w.write(lead, 5)
            w.write(mlen - 1, 6)
            w.write(xor >> trail, mlen)
            prev_lead, prev_len = lead, mlen
    return header + w.finish()


def decompress(data: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of :func:`compress` — bit-exact roundtrip (incl. NaN)."""
    (n,) = struct.unpack_from("<I", data, 0)
    ts = np.empty(n, dtype=np.int64)
    vals = np.empty(n, dtype=np.uint64)
    if n == 0:
        return ts, vals.view(np.float64)
    r = _BitReader(data[4:])
    t0 = _signed(r.read(64), 64)
    v0 = r.read(64)
    ts[0] = t0
    vals[0] = v0
    prev_delta = 0
    if n > 1:
        prev_delta = _signed(r.read(64), 64)
        ts[1] = t0 + prev_delta

    prev_val = v0
    prev_lead, prev_len = -1, -1
    prev_ts = int(ts[0])
    for i in range(1, n):
        if i >= 2:
            if r.read(1) == 0:
                dod = 0
            else:
                for bits, _code, _codebits in _DOD_RANGES:
                    if r.read(1) == 0:
                        dod = r.read(bits) - (1 << (bits - 1)) + 1
                        break
                else:
                    dod = _signed(r.read(64), 64)
            prev_delta += dod
            ts[i] = prev_ts + prev_delta
        prev_ts = int(ts[i])
        if r.read(1) == 0:
            vals[i] = prev_val
            continue
        if r.read(1) == 0:  # '10': reuse previous window
            lead, mlen = prev_lead, prev_len
        else:  # '11': new window
            lead = r.read(5)
            mlen = r.read(6) + 1
            prev_lead, prev_len = lead, mlen
        xor = r.read(mlen) << (64 - lead - mlen)
        prev_val ^= xor
        vals[i] = prev_val
    return ts, vals.view(np.float64)


def _signed(x: int, bits: int) -> int:
    return x - (1 << bits) if x >= (1 << (bits - 1)) else x
