"""Time-series block codecs: delta-of-delta timestamps + Gorilla XOR values.

Implements the two stream encodings from the public paper "Gorilla: A Fast,
Scalable, In-Memory Time Series Database" (Pelkonen et al., VLDB 2015),
§4.1.1 (timestamp delta-of-delta) and §4.1.2 (XOR float compression). The
reference has no compression at all (it ships JSON to Elasticsearch,
/root/reference/libs/mimir/src/rubber.rs:652-746); this is a target-side
addition required by the north rule.

Codecs are sequential by nature (each symbol depends on the previous), so
they run per *block* — one (source, day) at a time, <= 1440 points at 1m
granularity — inside an actor-pool stage; the outer pipeline stays
vectorized and parallel. Round-trip exactness is enforced by unit tests.
"""

from __future__ import annotations

import numpy as np


class BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int) -> None:
        """Append the low ``bits`` bits of ``value`` (MSB first)."""
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def getvalue(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            return bytes(self.buf) + bytes([(self.acc << pad) & 0xFF])
        return bytes(self.buf)


class BitReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def read(self, bits: int) -> int:
        out = 0
        for _ in range(bits):
            byte = self.data[self.pos >> 3]
            out = (out << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return out


# ---------------------------------------------------------------------------
# Delta-of-delta timestamps (Gorilla §4.1.1 ranges)
# ---------------------------------------------------------------------------
_DOD_RANGES = (
    (63, "10", 7),        # [-63, 64]
    (255, "110", 9),      # [-255, 256]
    (2047, "1110", 12),   # [-2047, 2048]
)


def encode_dod(ts: np.ndarray) -> bytes:
    """Encode int64 timestamps (any fixed unit) -> delta-of-delta bitstream."""
    ts = np.asarray(ts, dtype=np.int64)
    n = len(ts)
    w = BitWriter()
    w.write(n, 32)
    if n == 0:
        return w.getvalue()
    w.write(int(ts[0]) & ((1 << 64) - 1), 64)
    if n == 1:
        return w.getvalue()
    deltas = np.diff(ts)
    w.write(int(deltas[0]) & ((1 << 64) - 1), 64)
    dods = np.diff(deltas)
    for d in dods:
        d = int(d)
        if d == 0:
            w.write(0, 1)
            continue
        for bound, prefix, bits in _DOD_RANGES:
            if -bound <= d <= bound + 1:
                w.write(int(prefix, 2), len(prefix))
                w.write(d + bound, bits)
                break
        else:
            w.write(0b1111, 4)
            w.write(d & ((1 << 64) - 1), 64)
    return w.getvalue()


def _wrap64(v: int) -> int:
    """Two's-complement wrap into int64 — deltas between extreme int64
    timestamps exceed the int64 range; encode and decode both work mod 2^64."""
    v &= (1 << 64) - 1
    return v - (1 << 64) if v >= (1 << 63) else v


def decode_dod(data: bytes) -> np.ndarray:
    r = BitReader(data)
    n = r.read(32)
    out = np.empty(n, dtype=np.int64)
    if n == 0:
        return out
    out[0] = _wrap64(r.read(64))
    if n == 1:
        return out
    delta = _wrap64(r.read(64))
    out[1] = _wrap64(int(out[0]) + delta)
    for i in range(2, n):
        if r.read(1) == 0:
            dod = 0
        else:
            if r.read(1) == 0:
                bound, bits = 63, 7
            elif r.read(1) == 0:
                bound, bits = 255, 9
            elif r.read(1) == 0:
                bound, bits = 2047, 12
            else:
                dod = _wrap64(r.read(64))
                delta = _wrap64(delta + dod)
                out[i] = _wrap64(int(out[i - 1]) + delta)
                continue
            dod = r.read(bits) - bound
        delta = _wrap64(delta + dod)
        out[i] = _wrap64(int(out[i - 1]) + delta)
    return out


# ---------------------------------------------------------------------------
# Gorilla XOR float64 values (§4.1.2)
# ---------------------------------------------------------------------------
def encode_gorilla(values: np.ndarray) -> bytes:
    vals = np.asarray(values, dtype=np.float64).view(np.uint64)
    n = len(vals)
    w = BitWriter()
    w.write(n, 32)
    if n == 0:
        return w.getvalue()
    prev = int(vals[0])
    w.write(prev, 64)
    lead, trail = 65, 65  # invalid window -> first xor always rewrites it
    for i in range(1, n):
        cur = int(vals[i])
        x = prev ^ cur
        prev = cur
        if x == 0:
            w.write(0, 1)
            continue
        l = 64 - x.bit_length()          # leading zeros
        t = (x & -x).bit_length() - 1    # trailing zeros
        l = min(l, 31)                   # 5-bit leading-zero field
        if l >= lead and t >= trail:
            w.write(0b10, 2)
            w.write(x >> trail, 64 - lead - trail)
        else:
            lead, trail = l, t
            mbits = 64 - l - t
            w.write(0b11, 2)
            w.write(l, 5)
            w.write(mbits & 0x3F, 6)     # 64 encoded as 0 (6-bit field)
            w.write(x >> t, mbits)
    return w.getvalue()


def decode_gorilla(data: bytes) -> np.ndarray:
    r = BitReader(data)
    n = r.read(32)
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out.view(np.float64)
    prev = r.read(64)
    out[0] = prev
    lead, trail = 0, 0
    for i in range(1, n):
        if r.read(1) == 0:
            out[i] = prev
            continue
        if r.read(1) == 1:
            lead = r.read(5)
            mbits = r.read(6)
            if mbits == 0:
                mbits = 64
            trail = 64 - lead - mbits
        else:
            mbits = 64 - lead - trail
        x = r.read(mbits) << trail
        prev = prev ^ x
        out[i] = prev
    return out.view(np.float64)
