"""Vectorized bit-packing for widths 1..64 (including non-power-of-2).

Semantics mirror the reference's ``SerializationUtils.writeInts/readInts``
(``org/apache/orc/impl/SerializationUtils.java:495-703, 934-994``): values are
written MSB-first into a contiguous big-endian bit stream, padded with zero
bits to a byte boundary.  Implementation is numpy (bit-matrix + packbits /
byte-slicing fast paths), not an unrolled-loop port.
"""

from __future__ import annotations

import numpy as np

U64 = np.uint64


def pack(values: np.ndarray, width: int) -> bytes:
    """Pack uint64 values at ``width`` bits each, MSB-first, zero-padded."""
    values = np.ascontiguousarray(values, dtype=U64)
    n = values.size
    if n == 0 or width == 0:
        return b""
    if width % 8 == 0:
        # byte-aligned fast path: take the low width/8 bytes of each
        # big-endian 8-byte representation
        nbytes = width // 8
        be = values.astype(">u8").view(np.uint8).reshape(n, 8)
        return be[:, 8 - nbytes :].tobytes()
    # shift-free path (64-bit shifts are ~100x slow on this host): view each
    # value as 8 big-endian bytes, unpack to a (n, 64) bit matrix, keep the
    # low ``width`` bit columns, re-pack the ravel
    be = values.astype(">u8").view(np.uint8).reshape(n, 8)
    bits = np.unpackbits(be, axis=1)[:, 64 - width :]
    return np.packbits(bits.reshape(-1)).tobytes()


def unpack(data: bytes | memoryview, n: int, width: int) -> np.ndarray:
    """Inverse of :func:`pack` → uint64 array of length ``n``."""
    if n == 0 or width == 0:
        return np.zeros(n, dtype=U64)
    raw = np.frombuffer(data, dtype=np.uint8, count=(n * width + 7) // 8)
    if width % 8 == 0:
        nbytes = width // 8
        be = np.zeros((n, 8), dtype=np.uint8)
        be[:, 8 - nbytes :] = raw.reshape(n, nbytes)
        return be.view(">u8").reshape(n).astype(U64)
    bits = np.unpackbits(raw)[: n * width].reshape(n, width)
    full = np.zeros((n, 64), dtype=np.uint8)
    full[:, 64 - width :] = bits
    return np.packbits(full, axis=1).view(">u8").reshape(n).astype(U64)


def packed_size(n: int, width: int) -> int:
    return (n * width + 7) // 8
