"""Per-stripe bloom filters for point-lookup stripe pruning.

Mirrors the reference's per-column bloom contract (SURVEY.md §2.6:
``org/apache/orc/util/BloomFilter.java`` split-64 scheme — k probe bits at
``h1 + i*h2``, FPP default 0.01 via ``orc.bloom.filter.fpp``) with one
documented substitution: the reference hashes with Murmur3; we use
pandas' vectorized 64-bit column hash (``hash_pandas_object``) with two
fixed hash keys, which keeps hashing C-speed over whole columns.  The
filter is engine-internal (written and probed only by this engine), so
hash-function parity with ORC is not required — the *pruning contract*
(no false negatives, ~FPP false positives) is what is reproduced.

The build-side pandas dtype is recorded in the header and probes are cast
to it before hashing: ``hash_pandas_object`` hashes int64 5 and float64
5.0 differently, so an uncast probe could produce a silent false negative
— the one failure mode the contract forbids.

Stream layout: ``<u32 m_bits><u8 k><u8 dtype_len><dtype utf-8><packed
bits little-endian>``.
"""

from __future__ import annotations

import math
import struct

import numpy as np
import pandas as pd

DEFAULT_FPP = 0.01  # orc.bloom.filter.fpp default
_HEADER = struct.Struct("<IBB")
_KEY1 = "sparc-bloom-hash-key-0123456789a"[:16]
_KEY2 = "sparc-bloom-hash-key-abcdef01234"[:16]


def _hashes(values: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    h1 = pd.util.hash_pandas_object(values, index=False, hash_key=_KEY1).to_numpy()
    h2 = pd.util.hash_pandas_object(values, index=False, hash_key=_KEY2).to_numpy()
    return h1, (h2 | np.uint64(1))  # odd step, like split-64's h2 adjustment


def optimal_params(n: int, fpp: float = DEFAULT_FPP) -> tuple[int, int]:
    """(m bits, k probes) for expected n values at the target FPP."""
    n = max(n, 1)
    m = max(64, int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2))))
    k = max(1, int(round(m / n * math.log(2))))
    return m, min(k, 15)


def _to_bytes_series(values: pd.Series) -> pd.Series:
    """Normalize an object-dtype series to utf-8 bytes.  str and bytes
    share pandas dtype 'object' but hash differently — without this, a
    bytes probe against a str-built filter (or vice versa) would be a
    silent false negative, the one failure mode the contract forbids."""
    inferred = pd.api.types.infer_dtype(values, skipna=True)
    if inferred == "bytes":
        return values
    if inferred == "string":
        return values.str.encode("utf-8")
    return values.map(lambda v: v.encode("utf-8") if isinstance(v, str) else v)


def build(values: pd.Series, fpp: float = DEFAULT_FPP) -> bytes:
    """Build a serialized bloom filter over non-null values."""
    m, k = optimal_params(len(values), fpp)
    if str(values.dtype) == "object":
        values = _to_bytes_series(values)
        # versioned dtype tag: probes normalize str->bytes the same way;
        # plain "object" tags (legacy files) keep the old probe path
        dtype = b"object/b"
    else:
        dtype = str(values.dtype).encode()
    bits = np.zeros((m + 7) // 8, dtype=np.uint8)
    if len(values):
        h1, h2 = _hashes(values)
        um = np.uint64(m)
        with np.errstate(over="ignore"):  # uint64 wraparound is intended
            for i in range(k):
                idx = (h1 + np.uint64(i) * h2) % um
                np.bitwise_or.at(
                    bits, (idx // np.uint64(8)).astype(np.int64),
                    np.uint8(1) << (idx % np.uint64(8)).astype(np.uint8),
                )
    return _HEADER.pack(m, k, len(dtype)) + dtype + bits.tobytes()


_MULTI_MAGIC = b"SBM1"


def pack_multi(blobs: list[bytes]) -> bytes:
    """Pack per-row-group bloom blobs into one self-describing stream
    (the per-row-group serialization the reference keeps in its
    BLOOM_FILTER_UTF8 index stream)."""
    head = _MULTI_MAGIC + struct.pack("<H", len(blobs))
    lens = b"".join(struct.pack("<I", len(b)) for b in blobs)
    return head + lens + b"".join(blobs)


def unpack_multi(blob: bytes) -> list[bytes]:
    if not blob.startswith(_MULTI_MAGIC):
        return [blob]  # legacy single-filter stream
    (n,) = struct.unpack_from("<H", blob, 4)
    lens = struct.unpack_from(f"<{n}I", blob, 6)
    out = []
    pos = 6 + 4 * n
    for ln in lens:
        out.append(blob[pos : pos + ln])
        pos += ln
    return out


def might_contain_any(blob: bytes, value) -> bool:
    """Stripe-level probe over a (possibly multi-row-group) bloom stream."""
    return any(might_contain(b, value) for b in unpack_multi(blob))


def might_contain_rg(blob: bytes, value, g: int) -> bool:
    """Row-group-level probe; out-of-range groups cannot be skipped."""
    return might_contain_rg_list(unpack_multi(blob), value, g)


def might_contain_rg_list(blobs: list[bytes], value, g: int) -> bool:
    """Probe pre-unpacked per-group filters (cannot skip out of range)."""
    return True if g >= len(blobs) else might_contain(blobs[g], value)


def might_contain(blob: bytes, value) -> bool:
    """Probe; False means the value is definitely absent from the stripe."""
    m, k, dlen = _HEADER.unpack_from(blob, 0)
    dtype = blob[_HEADER.size : _HEADER.size + dlen].decode()
    bits = np.frombuffer(blob, dtype=np.uint8, offset=_HEADER.size + dlen)
    if dtype == "object/b":
        if isinstance(value, str):
            value = value.encode("utf-8")
        elif not isinstance(value, bytes):
            return True  # non-stringlike probe vs string filter: cannot skip
        probe = pd.Series([value], dtype=object)
    else:
        probe = pd.Series([value])
        if str(probe.dtype) != dtype:
            try:
                probe = probe.astype(dtype)
            except (ValueError, TypeError):
                return True  # cannot represent in the built dtype: cannot skip
    h1, h2 = _hashes(probe)
    um = np.uint64(m)
    with np.errstate(over="ignore"):
        idx = (h1[0] + np.arange(k, dtype=np.uint64) * h2[0]) % um
    idx = idx.astype(np.int64)
    hit = (bits[idx // 8] >> (idx % 8).astype(np.uint8)) & 1
    return bool(hit.all())
