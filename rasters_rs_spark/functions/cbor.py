"""Minimal CBOR (RFC 8949) codec — the reference's binary metadata
sink/source (write_bin/read_bin, raster-tools/src/utils.rs:117-128,
serde_cbor) for histogram and tile-index artifacts.

Covers the value types those artifacts contain: unsigned/negative
integers, float64, byte strings, text strings, arrays, maps, bool,
null. Encoding follows serde_cbor's conventions: definite lengths,
shortest-form integer heads, floats always as 64-bit (major 7, ai 27).
Pure Python over bytes — metadata is driver-sized (the pixel path never
goes through CBOR).
"""

from __future__ import annotations

import struct

_MAJOR_UINT = 0
_MAJOR_NINT = 1
_MAJOR_BYTES = 2
_MAJOR_TEXT = 3
_MAJOR_ARRAY = 4
_MAJOR_MAP = 5
_MAJOR_SIMPLE = 7


def _head(major: int, arg: int) -> bytes:
    mb = major << 5
    if arg < 24:
        return bytes([mb | arg])
    if arg < 0x100:
        return bytes([mb | 24, arg])
    if arg < 0x10000:
        return bytes([mb | 25]) + arg.to_bytes(2, "big")
    if arg < 0x100000000:
        return bytes([mb | 26]) + arg.to_bytes(4, "big")
    return bytes([mb | 27]) + arg.to_bytes(8, "big")


def _encode(obj, out: bytearray) -> None:
    if obj is None:
        out.append(0xF6)
    elif obj is True:
        out.append(0xF5)
    elif obj is False:
        out.append(0xF4)
    elif isinstance(obj, int):
        if obj >= 0:
            out += _head(_MAJOR_UINT, obj)
        else:
            out += _head(_MAJOR_NINT, -1 - obj)
    elif isinstance(obj, float):
        out.append(0xFB)
        out += struct.pack(">d", obj)
    elif isinstance(obj, bytes):
        out += _head(_MAJOR_BYTES, len(obj))
        out += obj
    elif isinstance(obj, str):
        raw = obj.encode("utf-8")
        out += _head(_MAJOR_TEXT, len(raw))
        out += raw
    elif isinstance(obj, (list, tuple)):
        out += _head(_MAJOR_ARRAY, len(obj))
        for v in obj:
            _encode(v, out)
    elif isinstance(obj, dict):
        out += _head(_MAJOR_MAP, len(obj))
        for k, v in obj.items():
            _encode(k, out)
            _encode(v, out)
    else:
        # numpy scalars and the like: fall back on their python value
        item = getattr(obj, "item", None)
        if item is not None:
            _encode(item(), out)
        else:
            raise TypeError(f"cbor: unsupported type {type(obj)!r}")


def dumps(obj) -> bytes:
    out = bytearray()
    _encode(obj, out)
    return bytes(out)


class _Reader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def take(self, n: int) -> bytes:
        b = self.data[self.pos:self.pos + n]
        if len(b) != n:
            raise ValueError("cbor: truncated input")
        self.pos += n
        return b

    def arg(self, ai: int) -> int:
        if ai < 24:
            return ai
        if ai == 24:
            return self.take(1)[0]
        if ai == 25:
            return int.from_bytes(self.take(2), "big")
        if ai == 26:
            return int.from_bytes(self.take(4), "big")
        if ai == 27:
            return int.from_bytes(self.take(8), "big")
        raise ValueError(f"cbor: indefinite lengths not supported (ai={ai})")

    def decode(self):
        ib = self.take(1)[0]
        major, ai = ib >> 5, ib & 0x1F
        if major == _MAJOR_UINT:
            return self.arg(ai)
        if major == _MAJOR_NINT:
            return -1 - self.arg(ai)
        if major == _MAJOR_BYTES:
            return self.take(self.arg(ai))
        if major == _MAJOR_TEXT:
            return self.take(self.arg(ai)).decode("utf-8")
        if major == _MAJOR_ARRAY:
            return [self.decode() for _ in range(self.arg(ai))]
        if major == _MAJOR_MAP:
            return {self.decode(): self.decode()
                    for _ in range(self.arg(ai))}
        if major == 6:  # tag: skip and decode the tagged value
            self.arg(ai)
            return self.decode()
        if major == _MAJOR_SIMPLE:
            if ai == 20:
                return False
            if ai == 21:
                return True
            if ai in (22, 23):
                return None
            if ai == 25:  # float16 (serde_cbor may emit for round halves)
                return _f16(int.from_bytes(self.take(2), "big"))
            if ai == 26:
                return struct.unpack(">f", self.take(4))[0]
            if ai == 27:
                return struct.unpack(">d", self.take(8))[0]
        raise ValueError(f"cbor: unsupported item 0x{ib:02x}")


def _f16(h: int) -> float:
    # minimal binary16 decode (no numpy dependency in the hot path)
    sign = -1.0 if h & 0x8000 else 1.0
    exp = (h >> 10) & 0x1F
    frac = h & 0x3FF
    if exp == 0:
        return sign * frac * 2.0 ** -24
    if exp == 31:
        return sign * (float("nan") if frac else float("inf"))
    return sign * (1.0 + frac / 1024.0) * 2.0 ** (exp - 15)


def loads(data: bytes):
    r = _Reader(data)
    obj = r.decode()
    if r.pos != len(data):
        raise ValueError("cbor: trailing bytes")
    return obj


def write_bin(path: str, obj) -> None:
    """The reference's write_bin (utils.rs:117-122): CBOR to a file."""
    with open(path, "wb") as f:
        f.write(dumps(obj))


def read_bin(path: str):
    """The reference's read_bin (utils.rs:124-128)."""
    with open(path, "rb") as f:
        return loads(f.read())
