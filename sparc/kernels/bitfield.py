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
