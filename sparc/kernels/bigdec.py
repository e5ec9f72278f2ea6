"""128-bit zigzag-varint coding — the unbounded-decimal mantissa stream.

Wire semantics mirror the reference's BigInteger serialization
(``org/apache/orc/impl/SerializationUtils.java:195-257``
``writeBigInteger``/``readBigInteger``): zigzag the signed unscaled
value (``(n << 1) ^ (n >> 127)``), then unsigned LEB128 base-128
varint, low group first, high bit = continuation.

Unlike the reference's per-value loop, everything here is vectorized
over (lo, hi) uint64 word pairs: a zigzagged 2^128 value needs at most
19 seven-bit digits, so encode/decode are <= 19 masked numpy passes
regardless of row count — no per-row Python.
"""

from __future__ import annotations

import numpy as np

MAX_DIGITS = 19  # ceil(128 / 7)
_U64 = np.uint64
_ONES = ~np.uint64(0)


def _zigzag(lo: np.ndarray, hi: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(lo u64, hi i64 two's complement) -> zigzagged unsigned pair."""
    hi_u = hi.astype(np.uint64)
    mask = (hi >> np.int64(63)).astype(np.uint64)  # all-ones when negative
    hi_s = (hi_u << _U64(1)) | (lo >> _U64(63))
    lo_s = lo << _U64(1)
    return lo_s ^ mask, hi_s ^ mask


def _unzigzag(lo: np.ndarray, hi: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    mask = np.where((lo & _U64(1)).astype(bool), _ONES, _U64(0))
    lo_s = (lo >> _U64(1)) | (hi << _U64(63))
    hi_s = hi >> _U64(1)
    return lo_s ^ mask, (hi_s ^ mask).view(np.int64)


def _ndigits(lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    """Varint digit count of each zigzagged 128-bit value (>= 1)."""
    nd = np.ones(lo.size, dtype=np.int64)
    for k in range(1, MAX_DIGITS):
        m = 7 * k  # value needs digit k iff v >= 2^(7k)
        if m < 64:
            passed = (hi > 0) | (lo >= _U64(1 << m))
        else:
            passed = hi >= _U64(1 << (m - 64))
        nd += passed
    return nd


def encode(lo: np.ndarray, hi: np.ndarray) -> bytes:
    """Encode signed 128-bit values given as (low u64, high i64) words."""
    lo = np.ascontiguousarray(lo, dtype=np.uint64)
    hi = np.ascontiguousarray(hi, dtype=np.int64)
    if lo.size == 0:
        return b""
    zlo, zhi = _zigzag(lo, hi)
    nd = _ndigits(zlo, zhi)
    starts = np.concatenate(([0], np.cumsum(nd)))[:-1]
    out = np.empty(int(nd.sum()), dtype=np.uint8)
    with np.errstate(over="ignore"):
        for k in range(MAX_DIGITS):
            sel = nd > k
            if not sel.any():
                break
            m = 7 * k
            if k == 0:
                d = zlo & _U64(0x7F)
            elif m < 64:
                d = ((zlo >> _U64(m)) | (zhi << _U64(64 - m))) & _U64(0x7F)
            else:
                d = (zhi >> _U64(m - 64)) & _U64(0x7F)
            d = d[sel].astype(np.uint8)
            d[(nd > k + 1)[sel]] |= 0x80  # continuation
            out[starts[sel] + k] = d
    return out.tobytes()


def decode(data: bytes | memoryview, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Decode ``n`` values -> (low u64, high i64) word arrays."""
    if n == 0:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    buf = np.frombuffer(data, dtype=np.uint8)
    ends = np.flatnonzero(buf < 0x80)[:n]
    if ends.size < n:
        raise ValueError(f"varint stream truncated: {ends.size} < {n} values")
    starts = np.concatenate(([0], ends[:-1] + 1))
    nd = ends - starts + 1
    lo = np.zeros(n, dtype=np.uint64)
    hi = np.zeros(n, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for k in range(int(nd.max())):
            sel = nd > k
            d = (buf[starts[sel] + k] & 0x7F).astype(np.uint64)
            m = 7 * k
            if m < 64:
                lo[sel] |= d << _U64(m)
                if m > 57:  # digit straddles the word boundary
                    hi[sel] |= d >> _U64(64 - m)
            else:
                hi[sel] |= d << _U64(m - 64)
    return _unzigzag(lo, hi)
