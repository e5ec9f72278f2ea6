"""Boolean bitfield encoding: bit-pack (MSB-first) then byte-RLE.

Matches the reference's ``BitFieldWriter/BitFieldReader``
(``org/apache/orc/impl/BitFieldWriter.java:49-64`` /
``BitFieldReader.java:45-108``) with bitSize=1 — the encoding of PRESENT
(null-mask) streams and BOOLEAN columns.  Trailing bits of the final byte
are zero-padded, so the decoder needs the logical length ``n``.
"""

from __future__ import annotations

import numpy as np

from . import byterle


def encode(flags: np.ndarray) -> bytes:
    flags = np.ascontiguousarray(flags, dtype=bool)
    packed = np.packbits(flags)  # MSB-first, zero-padded
    return byterle.encode(packed)


def decode(data: bytes | memoryview, n: int) -> np.ndarray:
    nbytes = (n + 7) // 8
    packed = byterle.decode(data, nbytes)
    return np.unpackbits(packed)[:n].astype(bool)


def encode_with_marks(
    flags: np.ndarray, bit_marks: list[int]
) -> tuple[bytes, list[tuple[int, int, int]]]:
    """Encode the whole bitfield once and return, per bit index in
    ``bit_marks``, the seek position ``(byte-RLE control-byte offset,
    bytes consumed in that chunk, bits consumed in the byte)`` —
    ``BitFieldReader.seek`` consumption order (BitFieldReader.java:
    91-108).  Unlike restart-per-segment encoding, this keeps the bit
    stream continuous, so positions work for ARBITRARY (non-multiple-
    of-8) group boundaries — what nested columns' value spaces produce."""
    flags = np.ascontiguousarray(flags, dtype=bool)
    packed = np.packbits(flags)
    blob, byte_pos = byterle.encode_with_marks(packed, [m // 8 for m in bit_marks])
    return blob, [
        (off, used, m % 8) for (off, used), m in zip(byte_pos, bit_marks)
    ]
