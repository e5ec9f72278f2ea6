"""Block compression layer: chunked general-purpose codec over encoded streams.

Mirrors the reference's OutStream/InStream chunking contract
(``org/apache/orc/impl/OutStream.java:376-413`` — chunked compress,
store-uncompressed-if-bigger per chunk; inverse
``InStream$CompressedStream.readHeader`` ``InStream.java:493-523``), with
two documented deviations:

- Header: the reference's 3-byte header encodes only
  ``compressedLength<<1 | isOriginal`` because its decompressors accept
  unknown output sizes; pyarrow's codec API requires the exact
  decompressed size, so our 8-byte header adds the raw length (two
  little-endian uint32: ``clen<<1|orig``, ``rawlen``).
- Chunk size: the reference chunks at 256 KiB (``orc.compress.size``)
  because the chunk IS its intra-stripe seek granularity.  Our seek
  granularity is the row-group segment (stripe.py), which restarts
  compression anyway, so chunks only bound the codec window — 4 MiB
  chunks let zstd see ~16x more context at the same level and CPU cost,
  measured -12% total size on web text/html vs 256 KiB with identical
  encode wall time.  The header is self-describing, so any chunk size
  decodes.

Codecs are pyarrow's C++ implementations (zstd default, matching the
reference's ``orc.compress=ZSTD`` 2.2.2 default).
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

CHUNK_SIZE = 1 << 22  # 4 MiB codec window (see docstring)
_HEADER = struct.Struct("<II")

# name -> (pyarrow codec name, default level)
CODECS = {
    "zstd": ("zstd", 3),
    "zlib": ("gzip", 6),
    "lz4": ("lz4_raw", None),
    "snappy": ("snappy", None),
    "brotli": ("brotli", None),
}

_codec_cache: dict[tuple[str, int | None], pa.Codec] = {}


def _codec(name: str, level: int | None) -> pa.Codec:
    key = (name, level)
    if key not in _codec_cache:
        pa_name, default_level = CODECS[name]
        lvl = level if level is not None else default_level
        _codec_cache[key] = (
            pa.Codec(pa_name, compression_level=lvl) if lvl is not None else pa.Codec(pa_name)
        )
    return _codec_cache[key]


def compress(data: bytes, codec: str = "zstd", level: int | None = None) -> bytes:
    """Chunked compress with store-if-bigger per chunk; 'none' passes through."""
    if codec == "none":
        return data
    c = _codec(codec, level)
    out = bytearray()
    for pos in range(0, len(data), CHUNK_SIZE):
        chunk = data[pos : pos + CHUNK_SIZE]
        comp = bytes(c.compress(chunk))
        if len(comp) < len(chunk):
            out += _HEADER.pack((len(comp) << 1) | 0, len(chunk))
            out += comp
        else:  # store original (isOriginal flag), like the reference
            out += _HEADER.pack((len(chunk) << 1) | 1, len(chunk))
            out += chunk
    return bytes(out)


def decompress(data, codec: str = "zstd", level: int | None = None):
    """Decompress a chunked stream.  Returns a zero-copy view whenever
    possible — a pyarrow Buffer (single compressed chunk), a memoryview
    of the input (single stored chunk), or a numpy uint8 array assembled
    with exactly one copy per chunk (multi-chunk).  All returns support
    the buffer protocol; consumers use np.frombuffer / bytes() as needed.
    The old implementation copied every payload 3x (Buffer->bytes,
    += into bytearray, bytes(bytearray)) — at decode this was the single
    largest CPU item after the codec itself."""
    if codec == "none":
        return data
    n = len(data)
    if n == 0:
        return b""
    c = _codec(codec, level)
    # fast path: exactly one chunk (every stream < CHUNK_SIZE raw)
    word, rawlen = _HEADER.unpack_from(data, 0)
    clen = word >> 1
    if _HEADER.size + clen == n:
        body = data[_HEADER.size : _HEADER.size + clen]
        if word & 1:  # stored original: a view of the input
            return body if isinstance(body, memoryview) else memoryview(body)
        return c.decompress(body, rawlen)  # pa.Buffer, zero extra copies
    # multi-chunk: pre-scan headers for the total, one copy per chunk
    total = 0
    pos = 0
    while pos < n:
        word, rawlen = _HEADER.unpack_from(data, pos)
        total += rawlen
        pos += _HEADER.size + (word >> 1)
    out = np.empty(total, np.uint8)
    pos = 0
    o = 0
    while pos < n:
        word, rawlen = _HEADER.unpack_from(data, pos)
        pos += _HEADER.size
        clen = word >> 1
        if word & 1:
            out[o : o + rawlen] = np.frombuffer(data[pos : pos + clen], np.uint8)
        else:
            out[o : o + rawlen] = np.frombuffer(
                c.decompress(data[pos : pos + clen], rawlen), np.uint8
            )
        pos += clen
        o += rawlen
    return out
