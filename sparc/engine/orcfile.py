"""Spec-conformant ORC file writer over the engine's own kernels.

SURVEY.md §5's "reference cross-read" stretch layer: emit a real ORC
file (magic, stripes, protobuf StripeFooter/Footer/PostScript — the
layout written by ``PhysicalFsWriter`` PhysicalFsWriter.java:680-716 and
``WriterImpl.writeFooter/writePostScript`` WriterImpl.java:619-706) using
THIS engine's RLEv2 / byte-RLE / bitfield / dictionary kernels, and read
it back with an independent reference implementation (pyarrow's C++ ORC
reader, Spark's Java reader).  A successful value-identical cross-read is
the strongest available oracle that the kernel wire formats match the
ORC spec bit-for-bit — far stronger than self round-trips.

Scope (deliberately minimal — an oracle, not the product sink):
- compression NONE / ZLIB / SNAPPY / ZSTD (the reference's
  3-byte-header chunk framing, store-original-if-bigger)
- file versions 0.12 (RLEv2) and legacy 0.11 (RLEv1)
- leaf types: int32/int64, double/float, string (dict or direct),
  binary, bool, date32, timestamp[us] (writerTimezone UTC; both file
  versions), decimal up to (38, s) — unbounded zigzag-varint mantissa +
  signed RLE scale stream, ``DecimalTreeWriter`` semantics
- nested types: list / map / struct / dense+sparse union to any depth —
  pre-order column-id tree with per-level PRESENT + LENGTH / byte-RLE
  TAG streams (Struct/List/Map/UnionTreeWriter semantics), in both the
  plain and the row-indexed layout (child row-group windows derived from
  the parent's present/length prefix sums)
- nullable columns via PRESENT streams
- optional ROW_INDEX streams (``row_index_stride > 0``): per-group seek
  positions + IntegerStatistics; the reference Java reader demonstrably
  row-group-SKIPS inside our files (tests prove wrong positions break
  the filtered read, so the pass is meaningful)

The protobuf tail is hand-encoded (varint/length-delimited primitives
only — field numbers from the public orc_proto.proto)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..kernels import bitfield, dictionary, rlev1, rlev2
from . import stripe as stripe_mod

# --- ORC compressed-stream framing ------------------------------------------
#
# With a compression kind set, EVERY stream plus the stripe footers and
# the file footer/metadata are chunked with the reference's 3-byte header
# (``OutStream.writeHeader`` OutStream.java:186-189: little-endian
# ``compressedLength << 1 | isOriginal``), store-original-if-bigger per
# chunk.  ORC ZLIB is raw DEFLATE (no zlib wrapper).

_ORC_CHUNK = 256 * 1024  # orc.compress.size default


def _deflate(data: bytes) -> bytes:
    import zlib

    c = zlib.compressobj(6, zlib.DEFLATED, -15)  # raw deflate
    return c.compress(data) + c.flush()


def _compress_one(chunk: bytes, kind: str) -> bytes:
    if kind == "ZLIB":
        return _deflate(chunk)
    # pyarrow one-shot codecs match the reference's raw in-chunk formats:
    # snappy embeds the uncompressed length as a leading varint, zstd's
    # single-shot frame header records the content size
    return bytes(pa.Codec(kind.lower()).compress(chunk))


def _compress_chunked(
    data: bytes, kind: str
) -> tuple[bytes, np.ndarray, np.ndarray]:
    """_orc_compress, also returning the (uncompressed, compressed) start
    offsets of every chunk — needed to translate an uncompressed stream
    offset into the (block start, offset in block) pair a compressed
    InStream.seek consumes."""
    if kind == "NONE" or not data:
        return data, np.array([0], np.int64), np.array([0], np.int64)
    out = bytearray()
    u_starts, c_starts = [], []
    for pos in range(0, len(data), _ORC_CHUNK):
        u_starts.append(pos)
        c_starts.append(len(out))
        chunk = bytes(data[pos : pos + _ORC_CHUNK])
        comp = _compress_one(chunk, kind)
        if len(comp) < len(chunk):
            head = len(comp) << 1
            body = comp
        else:
            head = (len(chunk) << 1) | 1
            body = chunk
        out += bytes([head & 0xFF, (head >> 8) & 0xFF, (head >> 16) & 0xFF])
        out += body
    return bytes(out), np.array(u_starts, np.int64), np.array(c_starts, np.int64)


def _orc_compress(data: bytes, kind: str) -> bytes:
    if kind == "NONE":
        return data
    out = bytearray()
    for pos in range(0, len(data), _ORC_CHUNK):
        chunk = bytes(data[pos : pos + _ORC_CHUNK])
        comp = _compress_one(chunk, kind)
        if len(comp) < len(chunk):
            head = len(comp) << 1
            body = comp
        else:
            head = (len(chunk) << 1) | 1  # stored original
            body = chunk
        out += head.to_bytes(3, "little")
        out += body
    return bytes(out)


# --- protobuf primitives ----------------------------------------------------


def _varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _f_varint(field: int, v: int) -> bytes:
    return _varint(field << 3) + _varint(v)


def _f_bytes(field: int, b: bytes) -> bytes:
    return _varint((field << 3) | 2) + _varint(len(b)) + b


def _f_packed(field: int, vals: list[int]) -> bytes:
    return _f_bytes(field, b"".join(_varint(v) for v in vals))


# --- enums (public orc_proto.proto) ----------------------------------------

_KIND = {
    "bool": 0, "int32": 3, "int64": 4, "float": 5, "double": 6,
    "string": 7, "large_string": 7, "binary": 8, "large_binary": 8,
    "timestamp": 9, "list": 10, "map": 11, "struct": 12, "union": 13,
    "decimal": 14, "date32[day]": 15,
}
_STREAM_PRESENT, _STREAM_DATA, _STREAM_LENGTH, _STREAM_DICT = 0, 1, 2, 3
_STREAM_SECONDARY, _STREAM_ROW_INDEX = 5, 6
_ENC_DIRECT, _ENC_DICT, _ENC_DIRECT_V2, _ENC_DICT_V2 = 0, 1, 2, 3
_COMPRESSION = {"NONE": 0, "ZLIB": 1, "SNAPPY": 2, "LZ4": 4, "ZSTD": 5}

DICT_THRESHOLD = 0.8  # orc.dictionary.key.threshold


def _column_kind(t: pa.DataType) -> int:
    if pa.types.is_timestamp(t):
        # tz-aware Arrow timestamps are absolute instants -> the
        # TIMESTAMP_INSTANT category (kind 18, "timestamp with local
        # time zone"); tz-naive ones are wall-clock TIMESTAMP.  The
        # stream encoding is identical (seconds-from-2015 + nanos) —
        # with writerTimezone pinned to UTC the values need no
        # conversion in either category.
        return 18 if t.tz is not None else _KIND["timestamp"]
    if pa.types.is_decimal(t):
        return _KIND["decimal"]
    s = str(t)
    if s not in _KIND:
        raise NotImplementedError(f"orcfile: unsupported type {t}")
    return _KIND[s]


def _type_pb(t: pa.DataType) -> bytes:
    """Footer Type proto for a leaf column: kind (1) plus, for decimal,
    precision (5) and scale (6)."""
    out = _f_varint(1, _column_kind(t))
    if pa.types.is_decimal(t):
        out += _f_varint(5, t.precision) + _f_varint(6, t.scale)
    return out


def _decimal_words(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Non-null unscaled (low u64, high i64) words, via decimal128."""
    if not pa.types.is_decimal128(arr.type):
        arr = arr.cast(pa.decimal128(arr.type.precision, arr.type.scale))
    return stripe_mod._decimal_unscaled_words(arr)


# --- nested type tree (pre-order column ids, per orc TypeDescription) -------


def _is_nested(t: pa.DataType) -> bool:
    return (
        pa.types.is_struct(t)
        or pa.types.is_list(t)
        or pa.types.is_large_list(t)
        or pa.types.is_map(t)
        or pa.types.is_union(t)
    )


def _build_tree(t: pa.DataType, next_id: list[int]) -> dict:
    """Tree node {id, t, children: [(field_name, node)]} with ids
    assigned in pre-order — ORC's TypeDescription numbering."""
    node = {"id": next_id[0], "t": t, "children": []}
    next_id[0] += 1
    if pa.types.is_struct(t) or pa.types.is_union(t):
        for f in t:
            node["children"].append((f.name, _build_tree(f.type, next_id)))
    elif pa.types.is_list(t) or pa.types.is_large_list(t):
        node["children"].append(("_elem", _build_tree(t.value_type, next_id)))
    elif pa.types.is_map(t):
        node["children"].append(("_key", _build_tree(t.key_type, next_id)))
        node["children"].append(("_value", _build_tree(t.item_type, next_id)))
    return node


def _tree_type_pb(node: dict) -> bytes:
    t = node["t"]
    if "orc_override" in node:
        # CHAR/VARCHAR: string streams + a typed maximumLength (Type
        # proto field 4); write-time pad/truncate enforcement lives in
        # sparc.ops.mask
        kind_name, maxlen = node["orc_override"]
        kind = 17 if kind_name == "char" else 16
        return _f_varint(1, kind) + _f_varint(4, maxlen)
    if pa.types.is_struct(t):
        out = _f_varint(1, _KIND["struct"])
        out += _f_packed(2, [c["id"] for _, c in node["children"]])
        for name, _ in node["children"]:
            out += _f_bytes(3, name.encode())
        return out
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return _f_varint(1, _KIND["list"]) + _f_packed(
            2, [node["children"][0][1]["id"]]
        )
    if pa.types.is_map(t):
        return _f_varint(1, _KIND["map"]) + _f_packed(
            2, [c["id"] for _, c in node["children"]]
        )
    if pa.types.is_union(t):
        return _f_varint(1, _KIND["union"]) + _f_packed(
            2, [c["id"] for _, c in node["children"]]
        )
    return _type_pb(t)


def _tree_type_pbs(node: dict, out: list[bytes]) -> None:
    out.append(_tree_type_pb(node))
    for _, c in node["children"]:
        _tree_type_pbs(c, out)


def _combined(arr) -> pa.Array:
    return arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr


def _encode_tree(
    node: dict, arr: pa.Array, v11: bool,
    out: list[tuple[int, list[tuple[int, bytes]], bytes]],
    counts: dict[int, list],
) -> None:
    """Recursively encode ``arr`` under ``node``, appending
    (column_id, streams, encoding_pb) in pre-order and accumulating
    per-id footer stats into ``counts`` ({id: [n_values, has_null]}) —
    one walk produces both streams and statistics, so they cannot
    drift apart.  ORC nested nulls: a child column holds entries only
    for slots where the parent is present (StructTreeWriter.writeBatch
    StructTreeWriter.java:71-100, ListTreeWriter.writeBatch
    ListTreeWriter.java:73-126, MapTreeWriter.writeBatch
    MapTreeWriter.java:77-136 — coordinates recovered from the
    orc-core 2.2.2 jar's line tables per SURVEY §0)."""
    t = node["t"]
    arr = _combined(arr)
    c = counts.setdefault(node["id"], [0, False])
    c[0] += len(arr) - arr.null_count
    c[1] = c[1] or arr.null_count > 0
    if not _is_nested(t):
        streams, enc = _encode_column(arr, v11)
        out.append((node["id"], streams, enc))
        return
    rle = (lambda v: rlev1.encode(v, signed=False)) if v11 else (
        lambda v: rlev2.encode(v, signed=False)
    )
    streams: list[tuple[int, bytes]] = []
    if arr.null_count:
        valid = arr.is_valid()
        streams.append(
            (_STREAM_PRESENT, bitfield.encode(valid.to_numpy(zero_copy_only=False)))
        )
    if pa.types.is_struct(t):
        out.append((node["id"], streams, _f_varint(1, _ENC_DIRECT)))
        for i, (_, child_node) in enumerate(node["children"]):
            child = _combined(arr.field(i))
            if arr.null_count:
                child = child.filter(valid)
            _encode_tree(child_node, child, v11, out, counts)
        return
    if pa.types.is_union(t):
        # UnionTreeWriter.writeBatch UnionTreeWriter.java:59-115: DATA =
        # byte-RLE tags; each variant's values follow in row order.
        # Arrow unions carry no top-level validity, so there is never a
        # PRESENT stream here.
        from ..kernels import byterle

        codes = arr.type_codes.to_numpy(zero_copy_only=False)
        lut = np.zeros(128, np.uint8)
        for i, c in enumerate(t.type_codes):
            lut[c] = i
        tags = lut[codes]
        streams.append((_STREAM_DATA, byterle.encode(tags)))
        out.append((node["id"], streams, _f_varint(1, _ENC_DIRECT)))
        dense = t.mode == "dense"
        offs = arr.offsets.to_numpy(zero_copy_only=False) if dense else None
        for i, (_, child_node) in enumerate(node["children"]):
            rows = np.flatnonzero(tags == i)
            take = offs[rows] if dense else rows
            child = _combined(arr.field(i)).take(pa.array(take, pa.int64()))
            _encode_tree(child_node, child, v11, out, counts)
        return
    # list / map: LENGTH stream of present slots, children flattened
    nn = arr.drop_null() if arr.null_count else arr
    if pa.types.is_map(t):
        # MapArray.keys/.items ignore the slice window; .offsets is
        # windowed — slice the children explicitly
        offs = (
            nn.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            if len(nn)
            else np.zeros(1, np.int64)
        )
        lengths = np.diff(offs)
        lo_e, hi_e = int(offs[0]), int(offs[-1])
        children = [
            nn.keys.slice(lo_e, hi_e - lo_e),
            nn.items.slice(lo_e, hi_e - lo_e),
        ]
    else:
        lengths = (
            nn.value_lengths().to_numpy(zero_copy_only=False).astype(np.int64)
            if len(nn)
            else np.zeros(0, np.int64)
        )
        children = [nn.flatten()]
    streams.append((_STREAM_LENGTH, rle(lengths)))
    out.append(
        (node["id"], streams, _f_varint(1, _ENC_DIRECT if v11 else _ENC_DIRECT_V2))
    )
    for child, (_, child_node) in zip(children, node["children"]):
        _encode_tree(child_node, child, v11, out, counts)


def _encode_column(
    arr: pa.Array, v11: bool = False
) -> tuple[list[tuple[int, bytes]], bytes]:
    """-> ([(stream_kind, bytes)...], ColumnEncoding protobuf).

    ``v11`` emits the 0.11 legacy layout: RLEv1 integer/length streams
    and DIRECT/DICTIONARY (v1) encodings — the cross-read oracle for the
    rlev1 kernel."""
    rle = (lambda v, signed: rlev1.encode(v, signed=signed)) if v11 else (
        lambda v, signed: rlev2.encode(v, signed=signed)
    )
    t = arr.type
    streams: list[tuple[int, bytes]] = []
    if arr.null_count:
        valid = arr.is_valid().to_numpy(zero_copy_only=False)
        streams.append((_STREAM_PRESENT, bitfield.encode(valid)))
    nn = arr.drop_null() if arr.null_count else arr

    enc = _f_varint(1, _ENC_DIRECT if v11 else _ENC_DIRECT_V2)
    if pa.types.is_integer(t) or pa.types.is_date32(t):
        vals = stripe_mod._arrow_nonnull_int64(arr)
        streams.append((_STREAM_DATA, rle(vals, True)))
    elif pa.types.is_timestamp(t):
        # same 2015-epoch split in every file version; only the integer
        # coder changes (RLEv1 in 0.11, RLEv2 in 0.12)
        unit_scale = stripe_mod._TS_UNITS[t.unit]
        vals = stripe_mod._arrow_nonnull_int64(arr)
        seconds = np.floor_divide(vals, unit_scale) - stripe_mod.TS_BASE_SECONDS
        frac = np.mod(vals, unit_scale)
        nanos = stripe_mod.format_nanos(frac * (1_000_000_000 // unit_scale))
        streams.append((_STREAM_DATA, rle(seconds, True)))
        streams.append((_STREAM_SECONDARY, rle(nanos, False)))
    elif pa.types.is_decimal(t):
        # DecimalTreeWriter: DATA = unbounded zigzag-varint mantissa
        # (SerializationUtils.writeBigInteger SerializationUtils.java:
        # 195-217), SECONDARY = *signed* RLE scale, one per value
        # (DecimalTreeWriter.writeBatch DecimalTreeWriter.java:159-165)
        from ..kernels import bigdec

        lo, hi = _decimal_words(nn)
        streams.append((_STREAM_DATA, bigdec.encode(lo, hi)))
        streams.append(
            (_STREAM_SECONDARY, rle(np.full(len(nn), t.scale, np.int64), True))
        )
    elif pa.types.is_floating(t):
        np_t = np.float32 if pa.types.is_float32(t) else np.float64
        vals = nn.to_numpy(zero_copy_only=False).astype(np_t)
        streams.append((_STREAM_DATA, vals.astype(np.dtype(np_t).newbyteorder("<")).tobytes()))
        enc = _f_varint(1, _ENC_DIRECT)
    elif pa.types.is_boolean(t):
        vals = nn.to_numpy(zero_copy_only=False)
        streams.append((_STREAM_DATA, bitfield.encode(vals)))
        enc = _f_varint(1, _ENC_DIRECT)
    elif stripe_mod._is_binary_like(t):
        bin_arr = nn.cast(pa.large_binary())
        lengths = (
            pa.compute.binary_length(bin_arr)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        is_str = pa.types.is_string(t) or pa.types.is_large_string(t)
        n_unique = len(bin_arr.unique()) if len(bin_arr) else 0
        if is_str and len(bin_arr) and n_unique / len(bin_arr) <= DICT_THRESHOLD:
            codes, uniques = dictionary.encode_sorted(bin_arr)
            streams.append((_STREAM_DATA, rle(codes, False)))
            streams.append((_STREAM_DICT, b"".join(uniques)))
            streams.append(
                (
                    _STREAM_LENGTH,
                    rle(
                        np.fromiter((len(u) for u in uniques), np.int64, len(uniques)),
                        False,
                    ),
                )
            )
            enc = _f_varint(1, _ENC_DICT if v11 else _ENC_DICT_V2) + _f_varint(
                2, len(uniques)
            )
        else:
            streams.append((_STREAM_DATA, bytes(stripe_mod._concat_binary(bin_arr))))
            streams.append((_STREAM_LENGTH, rle(lengths, False)))
    else:
        raise NotImplementedError(f"orcfile: unsupported type {t}")
    return streams, enc


def _min_stats(n_values: int, has_null: bool) -> bytes:
    out = _f_varint(1, n_values)
    out += _varint((10 << 3)) + (b"\x01" if has_null else b"\x00")
    return out


# --- row index (rowIndexStride > 0) ----------------------------------------
#
# Every stream restarts its coder AND its compression chunk at each
# row-group boundary, so recorded positions are exact chunk starts with
# zero in-chunk / in-run offsets — the simplest layout the reference
# reader's PositionProvider accepts (``TreeWriterBase.
# createRowIndexEntry``/``recordPosition`` TreeWriterBase.java:323-330;
# seek consumption order per coder in RunLengthIntegerReaderV2.seek /
# BitFieldReader.seek).  Position value counts per stream:
#   raw byte stream: [offset]            (+1 leading chunk offset if compressed)
#   RLE int stream:  [offset, usedInRun]
#   bitfield stream: [offset, usedInByteRLE, bitsConsumed]

_EXTRAS_RAW, _EXTRAS_RLE, _EXTRAS_BITS = 0, 1, 2


def _zz(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v < 0 else v << 1


def _rg_int_stats(vals: np.ndarray, n_rows: int, has_null: bool) -> bytes:
    """ColumnStatistics proto with IntegerStatistics (sint64 min/max/sum)
    — what lets the reference's SearchArgument prune row groups."""
    out = _f_varint(1, int(vals.size))
    if vals.size:
        body = _f_varint(1, _zz(int(vals.min()))) + _f_varint(2, _zz(int(vals.max())))
        out += _f_bytes(2, body)
    out += _varint(10 << 3) + (b"\x01" if has_null else b"\x00")
    return out


_STRING_STAT_TRUNCATE = 1024  # UTF-8 bytes, ColumnStatisticsImpl truncation limit


def _utf8_prefix(b: bytes, limit: int) -> bytes:
    """Longest prefix of ``b`` of at most ``limit`` bytes that ends on a
    UTF-8 codepoint boundary (back off over continuation bytes)."""
    cut = limit
    while cut > 0 and (b[cut] & 0xC0) == 0x80:
        cut -= 1
    return b[:cut]


def _increment_bound(s: str) -> str | None:
    """Smallest-effort string strictly greater than every string with
    prefix ``s``: bump the last codepoint, skipping the surrogate gap
    (U+D800–U+DFFF can't be UTF-8-encoded), carrying past U+10FFFF by
    dropping the char and bumping the previous one.  ``None`` when every
    char is U+10FFFF (no bound exists — legal to omit)."""
    chars = list(s)
    for i in range(len(chars) - 1, -1, -1):
        cp = ord(chars[i])
        if cp < 0x10FFFF:
            nxt = cp + 1
            if 0xD800 <= nxt <= 0xDFFF:
                nxt = 0xE000
            return "".join(chars[:i]) + chr(nxt)
    return None


def _rg_string_stats(
    mn: bytes | None, mx: bytes | None, total_len: int, n_values: int,
    has_null: bool,
) -> bytes:
    """ColumnStatistics with StringStatistics (minimum=1, maximum=2,
    sum=3; lowerBound=4/upperBound=5 for over-limit bounds, matching
    ColumnStatisticsImpl's truncation contract — 1024 UTF-8 *bytes*,
    backing off to a codepoint boundary: lowerBound is a prefix
    <= the true minimum; upperBound must compare > the true maximum, so
    the last kept codepoint is incremented skipping the surrogate gap;
    when no increment exists the bound is omitted — legal, and merely
    unprunable)."""
    out = _f_varint(1, n_values)
    if n_values and mn is not None and mx is not None:
        body = b""
        if len(mn) <= _STRING_STAT_TRUNCATE:
            body += _f_bytes(1, mn)
        else:
            body += _f_bytes(4, _utf8_prefix(mn, _STRING_STAT_TRUNCATE))
        if len(mx) <= _STRING_STAT_TRUNCATE:
            body += _f_bytes(2, mx)
        else:
            kept = _utf8_prefix(mx, _STRING_STAT_TRUNCATE).decode("utf-8")
            ub = _increment_bound(kept)
            if ub is not None:
                body += _f_bytes(5, ub.encode("utf-8"))
        body += _f_varint(3, _zz(total_len))
        out += _f_bytes(4, body)
    out += _varint(10 << 3) + (b"\x01" if has_null else b"\x00")
    return out


def _rg_double_stats(vals: np.ndarray, has_null: bool) -> bytes:
    """ColumnStatistics with DoubleStatistics (fixed64 min=1/max=2/sum=3)."""
    import struct as _struct

    out = _f_varint(1, int(vals.size))
    if vals.size:
        fin = vals[np.isfinite(vals)]
        if fin.size == vals.size:  # NaN/inf bounds are not prunable
            body = (
                _varint((1 << 3) | 1) + _struct.pack("<d", float(vals.min()))
                + _varint((2 << 3) | 1) + _struct.pack("<d", float(vals.max()))
                + _varint((3 << 3) | 1) + _struct.pack("<d", float(vals.sum()))
            )
            out += _f_bytes(3, body)
    out += _varint(10 << 3) + (b"\x01" if has_null else b"\x00")
    return out


def _rg_date_stats(days: np.ndarray, has_null: bool) -> bytes:
    """ColumnStatistics with DateStatistics (sint32 min=1/max=2, days
    since epoch) — the field ColumnStatisticsImpl$DateStatisticsImpl
    deserializes for DATE columns (IntegerStatistics on a DATE column is
    ignored by the reference reader, i.e. unprunable)."""
    out = _f_varint(1, int(days.size))
    if days.size:
        body = _f_varint(1, _zz(int(days.min()))) + _f_varint(2, _zz(int(days.max())))
        out += _f_bytes(7, body)
    out += _varint(10 << 3) + (b"\x01" if has_null else b"\x00")
    return out


def _rg_timestamp_stats(vals: np.ndarray, unit_scale: int, has_null: bool) -> bytes:
    """ColumnStatistics with TimestampStatistics (sint64 epoch millis:
    minimum=1/maximum=2 plus the ORC-611 minimumUtc=3/maximumUtc=4 pair —
    identical here because writerTimezone is always UTC).  The maximum is
    rounded UP to the next millisecond so sub-millisecond true values
    never fall outside the recorded bound (the reference writer carries
    the remainder in maximumNanos; omitting that field obliges a ceil)."""
    out = _f_varint(1, int(vals.size))
    if vals.size:
        lo, hi = int(vals.min()), int(vals.max())
        per_ms = unit_scale // 1000  # unit ticks per millisecond (>=1)
        ms_lo = lo // per_ms if per_ms > 1 else lo * (1000 // unit_scale)
        ms_hi = -((-hi) // per_ms) if per_ms > 1 else hi * (1000 // unit_scale)
        body = (
            _f_varint(1, _zz(ms_lo)) + _f_varint(2, _zz(ms_hi))
            + _f_varint(3, _zz(ms_lo)) + _f_varint(4, _zz(ms_hi))
        )
        out += _f_bytes(9, body)
    out += _varint(10 << 3) + (b"\x01" if has_null else b"\x00")
    return out


def _rg_decimal_stats(arr: pa.Array, has_null: bool) -> bytes:
    """ColumnStatistics with DecimalStatistics (string minimum=1/
    maximum=2 in HiveDecimal plain form, trailing zeros stripped — the
    same canonical form the bloom addString path uses).  ``arr`` is
    non-null."""
    from . import orcread as _orcread

    out = _f_varint(1, len(arr))
    if len(arr):
        mm = pa.compute.min_max(arr)
        body = _f_bytes(
            1, _orcread._orc_decimal_str(mm["min"].as_py()).encode()
        ) + _f_bytes(2, _orcread._orc_decimal_str(mm["max"].as_py()).encode())
        out += _f_bytes(6, body)
    out += _varint(10 << 3) + (b"\x01" if has_null else b"\x00")
    return out


def _rg_bool_stats(n_true: int, n_values: int, has_null: bool) -> bytes:
    """ColumnStatistics with BucketStatistics (packed uint64 count of
    true values)."""
    out = _f_varint(1, n_values)
    out += _f_bytes(5, _f_packed(1, [n_true]))
    out += _varint(10 << 3) + (b"\x01" if has_null else b"\x00")
    return out


def _rg_binary_stats(total_bytes: int, n_values: int, has_null: bool) -> bytes:
    """ColumnStatistics with BinaryStatistics (sint64 sum of lengths)."""
    out = _f_varint(1, n_values)
    out += _f_bytes(8, _f_varint(1, _zz(total_bytes)))
    out += _varint(10 << 3) + (b"\x01" if has_null else b"\x00")
    return out


def _uvarint_prefix(pb: bytes) -> tuple[int, int]:
    """(numberOfValues, bytes consumed) from the front of a
    ColumnStatistics blob — every builder above emits field 1 first."""
    assert pb[0] == 0x08, "ColumnStatistics must lead with numberOfValues"
    v = 0
    shift = 0
    i = 1
    while True:
        b = pb[i]
        v |= (b & 0x7F) << shift
        i += 1
        if not b & 0x80:
            return v, i
        shift += 7


def _node_stats_pb(arr: pa.Array) -> bytes:
    """One ColumnStatistics over a whole (already parent-masked) leaf
    value array — the per-STRIPE twin of the per-row-group builders
    above, feeding the file Metadata section (StripeStatistics) and the
    file-footer statistics list."""
    t = arr.type
    has_null = arr.null_count > 0
    nn = arr.drop_null() if has_null else arr
    if pa.types.is_date32(t):
        return _rg_date_stats(stripe_mod._arrow_nonnull_int64(arr), has_null)
    if pa.types.is_integer(t):
        vals = stripe_mod._arrow_nonnull_int64(arr)
        return _rg_int_stats(vals, len(arr), has_null)
    if pa.types.is_timestamp(t):
        return _rg_timestamp_stats(
            stripe_mod._arrow_nonnull_int64(arr),
            stripe_mod._TS_UNITS[t.unit],
            has_null,
        )
    if pa.types.is_floating(t):
        vals = nn.to_numpy(zero_copy_only=False).astype(np.float64)
        return _rg_double_stats(vals, has_null)
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        b = nn.cast(pa.large_binary())
        if len(b):
            mm = pa.compute.min_max(b)
            mn, mx = mm["min"].as_py(), mm["max"].as_py()
            total = int(pa.compute.sum(pa.compute.binary_length(b)).as_py() or 0)
        else:
            mn = mx = None
            total = 0
        return _rg_string_stats(mn, mx, total, len(b), has_null)
    if stripe_mod._is_binary_like(t):
        b = nn.cast(pa.large_binary())
        total = int(pa.compute.sum(pa.compute.binary_length(b)).as_py() or 0) if len(b) else 0
        return _rg_binary_stats(total, len(b), has_null)
    if pa.types.is_boolean(t):
        n_true = int(pa.compute.sum(nn).as_py() or 0) if len(nn) else 0
        return _rg_bool_stats(n_true, len(nn), has_null)
    if pa.types.is_decimal(t):
        return _rg_decimal_stats(nn, has_null)
    return _min_stats(len(nn), has_null)


def _tree_stats_pbs(node: dict, arr: pa.Array, out: list[bytes]) -> None:
    """Pre-order ColumnStatistics for a column subtree, masking children
    exactly as the encode walks do (struct children filtered by parent
    validity, list/map children sliced to present parents' elements,
    union variants gathered by tag) so the recorded statistics describe
    precisely the values the streams contain."""
    arr = _combined(arr)
    t = node["t"]
    if not _is_nested(t):
        out.append(_node_stats_pb(arr))
        return
    has_null = arr.null_count > 0
    out.append(_min_stats(len(arr) - arr.null_count, has_null))
    if pa.types.is_struct(t):
        valid_arr = arr.is_valid() if arr.null_count else None
        for i, (_, child_node) in enumerate(node["children"]):
            child = _combined(arr.field(i))
            if valid_arr is not None:
                child = child.filter(valid_arr)
            _tree_stats_pbs(child_node, child, out)
        return
    if pa.types.is_union(t):
        codes = arr.type_codes.to_numpy(zero_copy_only=False)
        lut = np.zeros(128, np.uint8)
        for i, tc in enumerate(t.type_codes):
            lut[tc] = i
        tags = lut[codes]
        dense = t.mode == "dense"
        offs_u = arr.offsets.to_numpy(zero_copy_only=False) if dense else None
        for i, (_, child_node) in enumerate(node["children"]):
            rows = np.flatnonzero(tags == i)
            take = offs_u[rows] if dense else rows
            child = _combined(arr.field(i)).take(pa.array(take, pa.int64()))
            _tree_stats_pbs(child_node, child, out)
        return
    # list / map
    nn = arr.drop_null() if arr.null_count else arr
    if pa.types.is_map(t):
        offs = (
            nn.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            if len(nn)
            else np.zeros(1, np.int64)
        )
        lo_e, hi_e = int(offs[0]), int(offs[-1])
        children = [
            nn.keys.slice(lo_e, hi_e - lo_e),
            nn.items.slice(lo_e, hi_e - lo_e),
        ]
    else:
        children = [nn.flatten()]
    for child, (_, child_node) in zip(children, node["children"]):
        _tree_stats_pbs(child_node, child, out)


def _encode_column_grouped(
    arr: pa.Array, bounds: list[tuple[int, int]], v11: bool
) -> tuple[list[tuple[int, list[bytes], int]], bytes, list[bytes]]:
    """Per-row-group encoding for indexed files.

    -> (streams, encoding_pb, per-group ColumnStatistics blobs) where
    streams = [(stream_kind, [blob per group], extras)] in position-
    recording order.  Strings always use DIRECT here (the reference
    rewrites dictionary row-index positions on flush; restart-per-group
    direct streams sidestep that statefulness while staying legal ORC)."""
    rle = (lambda v, s: rlev1.encode(v, signed=s)) if v11 else (
        lambda v, s: rlev2.encode(v, signed=s)
    )
    t = arr.type
    streams: list[tuple[int, list[bytes], int]] = []
    valid = arr.is_valid().to_numpy(zero_copy_only=False) if arr.null_count else None
    if valid is not None:
        # one continuous bit stream + real mid-stream seek positions:
        # restart-per-group byte flushes would inject padding bits when a
        # group boundary is not a multiple of 8, which is the normal case
        # for nested children's value spaces
        blob, marks = bitfield.encode_with_marks(valid, [lo for lo, _ in bounds])
        streams.append((_STREAM_PRESENT, [blob], _EXTRAS_BITS, marks))
    # value offsets of each group into the non-null space
    if valid is None:
        voffs = [lo for lo, _ in bounds] + [len(arr)]
    else:
        cum = np.concatenate(([0], np.cumsum(valid.astype(np.int64))))
        voffs = [int(cum[lo]) for lo, _ in bounds] + [int(cum[-1])]
    nn = arr.drop_null() if arr.null_count else arr

    def vs(g: int) -> slice:
        return slice(voffs[g], voffs[g + 1])

    enc = _f_varint(1, _ENC_DIRECT if v11 else _ENC_DIRECT_V2)
    stats: list[bytes] = []
    n_groups = len(bounds)
    if pa.types.is_integer(t) or pa.types.is_date32(t):
        vals = stripe_mod._arrow_nonnull_int64(arr)
        streams.append(
            (_STREAM_DATA, [rle(vals[vs(g)], True) for g in range(n_groups)], _EXTRAS_RLE)
        )
        if pa.types.is_date32(t):
            stats = [
                _rg_date_stats(
                    vals[vs(g)], valid is not None and not valid[lo:hi].all()
                )
                for g, (lo, hi) in enumerate(bounds)
            ]
        else:
            stats = [
                _rg_int_stats(
                    vals[vs(g)], hi - lo, valid is not None and not valid[lo:hi].all()
                )
                for g, (lo, hi) in enumerate(bounds)
            ]
    elif pa.types.is_timestamp(t):
        unit_scale = stripe_mod._TS_UNITS[t.unit]
        vals = stripe_mod._arrow_nonnull_int64(arr)
        seconds = np.floor_divide(vals, unit_scale) - stripe_mod.TS_BASE_SECONDS
        nanos = stripe_mod.format_nanos(
            np.mod(vals, unit_scale) * (1_000_000_000 // unit_scale)
        )
        streams.append(
            (_STREAM_DATA, [rle(seconds[vs(g)], True) for g in range(n_groups)], _EXTRAS_RLE)
        )
        streams.append(
            (
                _STREAM_SECONDARY,
                [rle(nanos[vs(g)], False) for g in range(n_groups)],
                _EXTRAS_RLE,
            )
        )
        stats = [
            _rg_timestamp_stats(
                vals[vs(g)], unit_scale, valid is not None and not valid[lo:hi].all()
            )
            for g, (lo, hi) in enumerate(bounds)
        ]
    elif pa.types.is_decimal(t):
        from ..kernels import bigdec

        lo, hi = _decimal_words(nn)
        scales = np.full(len(nn), t.scale, np.int64)
        streams.append(
            (
                _STREAM_DATA,
                [bigdec.encode(lo[vs(g)], hi[vs(g)]) for g in range(n_groups)],
                _EXTRAS_RAW,  # varint stream: position is the byte offset
            )
        )
        streams.append(
            (
                _STREAM_SECONDARY,
                [rle(scales[vs(g)], True) for g in range(n_groups)],
                _EXTRAS_RLE,
            )
        )
        stats = [
            _rg_decimal_stats(
                nn.slice(voffs[g], voffs[g + 1] - voffs[g]),
                valid is not None and not valid[lo:hi].all(),
            )
            for g, (lo, hi) in enumerate(bounds)
        ]
    elif pa.types.is_floating(t):
        np_t = np.float32 if pa.types.is_float32(t) else np.float64
        vals = nn.to_numpy(zero_copy_only=False).astype(np.dtype(np_t).newbyteorder("<"))
        streams.append(
            (_STREAM_DATA, [vals[vs(g)].tobytes() for g in range(n_groups)], _EXTRAS_RAW)
        )
        enc = _f_varint(1, _ENC_DIRECT)
        stats = [
            _rg_double_stats(
                vals[vs(g)].astype(np.float64),
                valid is not None and not valid[lo:hi].all(),
            )
            for g, (lo, hi) in enumerate(bounds)
        ]
    elif pa.types.is_boolean(t):
        vals = nn.to_numpy(zero_copy_only=False)
        blob, marks = bitfield.encode_with_marks(vals, voffs[:-1])
        streams.append((_STREAM_DATA, [blob], _EXTRAS_BITS, marks))
        enc = _f_varint(1, _ENC_DIRECT)
    elif stripe_mod._is_binary_like(t):
        bin_arr = nn.cast(pa.large_binary())
        lengths = (
            pa.compute.binary_length(bin_arr)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        blob = stripe_mod._concat_binary(bin_arr)
        boffs = np.concatenate(([0], np.cumsum(lengths)))
        streams.append(
            (
                _STREAM_DATA,
                [
                    bytes(blob[boffs[voffs[g]] : boffs[voffs[g + 1]]])
                    for g in range(n_groups)
                ],
                _EXTRAS_RAW,
            )
        )
        streams.append(
            (
                _STREAM_LENGTH,
                [rle(lengths[vs(g)], False) for g in range(n_groups)],
                _EXTRAS_RLE,
            )
        )
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            stats = []
            for g, (lo, hi) in enumerate(bounds):
                sub = bin_arr.slice(voffs[g], voffs[g + 1] - voffs[g])
                if len(sub):
                    mm = pa.compute.min_max(sub)
                    mn, mx = mm["min"].as_py(), mm["max"].as_py()
                else:
                    mn = mx = None
                stats.append(
                    _rg_string_stats(
                        mn, mx, int(lengths[vs(g)].sum()),
                        voffs[g + 1] - voffs[g],
                        valid is not None and not valid[lo:hi].all(),
                    )
                )
    else:
        raise NotImplementedError(f"orcfile row-index: unsupported type {t}")
    if not stats:
        stats = [
            _min_stats(
                voffs[g + 1] - voffs[g],
                valid is not None and not valid[lo:hi].all(),
            )
            for g, (lo, hi) in enumerate(bounds)
        ]
    return streams, enc, stats


def _encode_tree_grouped(
    node: dict,
    arr: pa.Array,
    bounds: list[tuple[int, int]],
    v11: bool,
    counts: dict[int, list],
    out: list[tuple[int, list[tuple[int, list[bytes], int]], bytes, list[bytes]]],
) -> None:
    """Row-group-segmented recursive encode: the indexed-file analog of
    ``_encode_tree``.  Every stream of every node in the subtree is a
    per-group blob list (coder + compression chunk restart at each group,
    so recorded positions are exact piece starts), and every node gets
    per-group ColumnStatistics — ORC row indexes cover nested columns
    exactly like flat ones (``TreeWriterBase.createRowIndexEntry``
    recurses childrenWriters, TreeWriterBase.java:323-330).

    ``bounds`` are windows in THIS node's own value space: row-group row
    windows at the root; for children, the windows induced by the parent
    (present-slot prefix sums for struct children, element-offset
    windows for list/map children, per-variant tag counts for unions)."""
    t = node["t"]
    arr = _combined(arr)
    c = counts.setdefault(node["id"], [0, False])
    c[0] += len(arr) - arr.null_count
    c[1] = c[1] or arr.null_count > 0
    if not _is_nested(t):
        streams, enc, stats = _encode_column_grouped(arr, bounds, v11)
        out.append((node["id"], streams, enc, stats))
        return
    rle = (lambda v: rlev1.encode(v, signed=False)) if v11 else (
        lambda v: rlev2.encode(v, signed=False)
    )
    n_groups = len(bounds)
    streams: list[tuple[int, list[bytes], int]] = []
    valid_arr = arr.is_valid() if arr.null_count else None
    valid = (
        valid_arr.to_numpy(zero_copy_only=False) if valid_arr is not None else None
    )
    if valid is not None:
        blob, marks = bitfield.encode_with_marks(valid, [lo for lo, _ in bounds])
        streams.append((_STREAM_PRESENT, [blob], _EXTRAS_BITS, marks))
        cum = np.concatenate(([0], np.cumsum(valid.astype(np.int64))))
        voffs = [int(cum[lo]) for lo, _ in bounds] + [int(cum[-1])]
    else:
        voffs = [lo for lo, _ in bounds] + [len(arr)]
    stats = [
        _min_stats(
            voffs[g + 1] - voffs[g],
            valid is not None and not valid[lo:hi].all(),
        )
        for g, (lo, hi) in enumerate(bounds)
    ]
    present_bounds = [(voffs[g], voffs[g + 1]) for g in range(n_groups)]
    if pa.types.is_struct(t):
        out.append((node["id"], streams, _f_varint(1, _ENC_DIRECT), stats))
        for i, (_, child_node) in enumerate(node["children"]):
            child = _combined(arr.field(i))
            if valid_arr is not None:
                child = child.filter(valid_arr)
            _encode_tree_grouped(
                child_node, child, present_bounds, v11, counts, out
            )
        return
    if pa.types.is_union(t):
        from ..kernels import byterle

        codes = arr.type_codes.to_numpy(zero_copy_only=False)
        lut = np.zeros(128, np.uint8)
        for i, tc in enumerate(t.type_codes):
            lut[tc] = i
        tags = lut[codes]
        # RunLengthByteReader.seek consumes (offset, used) — the same
        # position shape as the int RLE coders
        streams.append(
            (
                _STREAM_DATA,
                [byterle.encode(tags[lo:hi]) for lo, hi in bounds],
                _EXTRAS_RLE,
            )
        )
        out.append((node["id"], streams, _f_varint(1, _ENC_DIRECT), stats))
        dense = t.mode == "dense"
        offs_u = arr.offsets.to_numpy(zero_copy_only=False) if dense else None
        for i, (_, child_node) in enumerate(node["children"]):
            mask = tags == i
            cum_i = np.concatenate(([0], np.cumsum(mask.astype(np.int64))))
            child_bounds = [(int(cum_i[lo]), int(cum_i[hi])) for lo, hi in bounds]
            rows = np.flatnonzero(mask)
            take = offs_u[rows] if dense else rows
            child = _combined(arr.field(i)).take(pa.array(take, pa.int64()))
            _encode_tree_grouped(child_node, child, child_bounds, v11, counts, out)
        return
    # list / map: LENGTH of present slots per group; child windows are
    # the element-offset spans of each group's present slots
    nn = arr.drop_null() if arr.null_count else arr
    if pa.types.is_map(t):
        offs = (
            nn.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            if len(nn)
            else np.zeros(1, np.int64)
        )
        lengths = np.diff(offs)
        lo_e, hi_e = int(offs[0]), int(offs[-1])
        children = [
            nn.keys.slice(lo_e, hi_e - lo_e),
            nn.items.slice(lo_e, hi_e - lo_e),
        ]
    else:
        lengths = (
            nn.value_lengths().to_numpy(zero_copy_only=False).astype(np.int64)
            if len(nn)
            else np.zeros(0, np.int64)
        )
        children = [nn.flatten()]
    streams.append(
        (
            _STREAM_LENGTH,
            [rle(lengths[voffs[g] : voffs[g + 1]]) for g in range(n_groups)],
            _EXTRAS_RLE,
        )
    )
    out.append(
        (
            node["id"],
            streams,
            _f_varint(1, _ENC_DIRECT if v11 else _ENC_DIRECT_V2),
            stats,
        )
    )
    e_cum = np.concatenate(([0], np.cumsum(lengths))).astype(np.int64)
    elem_bounds = [
        (int(e_cum[voffs[g]]), int(e_cum[voffs[g + 1]])) for g in range(n_groups)
    ]
    for child, (_, child_node) in zip(children, node["children"]):
        _encode_tree_grouped(child_node, child, elem_bounds, v11, counts, out)


def _row_index_pb(entries: list[tuple[list[int], bytes]]) -> bytes:
    """RowIndex proto: entries of (packed positions, ColumnStatistics)."""
    out = bytearray()
    for positions, st in entries:
        body = b""
        if positions:
            body += _f_bytes(1, b"".join(_varint(p) for p in positions))
        body += _f_bytes(2, st)
        out += _f_bytes(1, bytes(body))
    return bytes(out)


def write_orc(
    table: pa.Table, path: str, rows_per_stripe: int = 100_000,
    version: str = "0.12", compression: str = "NONE",
    row_index_stride: int = 0,
    type_overrides: dict[str, tuple[str, int]] | None = None,
    bloom_columns: list[str] | None = None,
    bloom_fpp: float = 0.05,  # BloomFilter.DEFAULT_FPP
    user_metadata: dict[str, bytes] | None = None,
) -> None:
    """Write ``table`` (flat schema) as an ORC file at ``path``.

    ``version="0.11"`` emits the legacy RLEv1 layout (cross-read oracle
    for the rlev1 kernel).  ``compression`` in ZLIB/SNAPPY/ZSTD wraps
    every stream and protobuf section in the reference's 3-byte-header
    chunked framing (cross-read oracle for the compressed-stream
    contract).  ``row_index_stride > 0`` (multiple of 8) emits real
    ROW_INDEX streams with per-group seek positions + IntegerStatistics,
    so the reference reader can *skip row groups* inside our file —
    verified by reading back with a pushed-down filter."""
    v11 = version == "0.11"
    if compression not in ("NONE", "ZLIB", "SNAPPY", "ZSTD"):
        raise NotImplementedError(f"orcfile: compression {compression}")
    if row_index_stride and row_index_stride % 8:
        raise ValueError("row_index_stride must be a multiple of 8")
    n_cols = table.num_columns
    root_node = _build_tree(
        pa.struct([table.schema.field(i) for i in range(n_cols)]), [0]
    )
    for name, (kind_name, maxlen) in (type_overrides or {}).items():
        (node,) = [c for cn, c in root_node["children"] if cn == name]
        if kind_name not in ("char", "varchar") or not (
            pa.types.is_string(node["t"]) or pa.types.is_large_string(node["t"])
        ):
            raise ValueError(f"type_overrides: {name} must be a string column")
        # the reference writer can never store a value longer than the
        # declared maximumLength — refuse rather than emit a
        # spec-nonconformant file (pad/truncate enforcement is
        # sparc.ops.mask's job, upstream of the sink)
        longest = pa.compute.max(pa.compute.utf8_length(table.column(name))).as_py()
        if longest is not None and longest > maxlen:
            raise ValueError(
                f"type_overrides: {name} holds a {longest}-char value — "
                f"exceeds {kind_name}({maxlen})"
            )
        node["orc_override"] = (kind_name, maxlen)
    if bloom_columns:
        unknown = sorted(set(bloom_columns) - set(table.schema.names))
        if unknown:
            raise ValueError(
                f"bloom_columns: {unknown} not in schema "
                f"{table.schema.names} — a typo here would silently emit "
                "a file with no bloom streams"
            )
    out = bytearray(b"ORC")
    header_len = 3
    stripe_infos = []
    total_rows = table.num_rows
    counts: dict[int, list] = {}  # id -> [n_values, has_null], via encode walk
    stripe_stats_pbs: list[list[bytes]] = []  # per stripe: ColumnStatistics per id

    for lo in range(0, max(total_rows, 1), max(rows_per_stripe, 1)):
        chunk = table.slice(lo, rows_per_stripe)
        if chunk.num_rows == 0 and total_rows > 0:
            break
        stripe_offset = len(out)
        stream_meta: list[tuple[int, int, int]] = []  # (kind, column_id, length)
        encodings = [_f_varint(1, _ENC_DIRECT)]  # root struct
        data = bytearray()
        index = bytearray()
        if row_index_stride:
            bounds = stripe_mod._row_bounds(chunk.num_rows, row_index_stride)
            # root struct (column 0) index: position-less entries with counts
            root_ri = _row_index_pb(
                [([], _min_stats(hi - g_lo, False)) for g_lo, hi in bounds]
            )
            wrapped = _orc_compress(root_ri, compression)
            stream_meta.append((_STREAM_ROW_INDEX, 0, len(wrapped)))
            index += wrapped
            grouped: list[
                tuple[int, list[tuple[int, list[bytes], int]], bytes, list[bytes]]
            ] = []
            bloom_streams: dict[int, bytes] = {}
            for i in range(n_cols):
                col = chunk.column(i)
                if isinstance(col, pa.ChunkedArray):
                    col = col.combine_chunks()
                # pre-order emission == column-id order, nested included
                node = root_node["children"][i][1]
                _encode_tree_grouped(node, col, bounds, v11, counts, grouped)
                if bloom_columns and root_node["children"][i][0] in bloom_columns:
                    if _is_nested(node["t"]):
                        raise NotImplementedError("orcfile: bloom on nested column")
                    filters = []
                    for lo, hi in bounds:
                        sub = col.slice(lo, hi - lo)
                        nn_sub = sub.drop_null() if sub.null_count else sub
                        hashes = _orc_bloom_hashes(nn_sub)
                        if hashes is None:
                            raise NotImplementedError(
                                f"orcfile: bloom on type {node['t']}"
                            )
                        filters.append(
                            _orc_bloom_build(hashes, row_index_stride, bloom_fpp)
                        )
                    bloom_streams[node["id"]] = _orc_compress(
                        _bloom_index_pb(filters), compression
                    )
            col_payloads = []
            for cid, streams, enc, stats in grouped:
                encodings.append(enc)
                # build each stream.  Two layouts:
                # - per-group pieces (marks is None): coder + compression
                #   chunk restart at each group, positions are exact piece
                #   offsets with zero coder state;
                # - whole stream + marks (bit-packed PRESENT / BOOLEAN
                #   DATA): one continuous stream, positions carry the real
                #   (chunk offset, used-in-run, bits) coder state.
                built = []  # (kind, bytes, offsets-or-chunkmaps, extras, marks)
                for st in streams:
                    kind, blobs, extras = st[0], st[1], st[2]
                    marks = st[3] if len(st) > 3 else None
                    if marks is None:
                        pieces = [_orc_compress(b, compression) for b in blobs]
                        offs = np.concatenate(
                            ([0], np.cumsum([len(p) for p in pieces]))
                        )
                        built.append((kind, b"".join(pieces), offs[:-1], None, None))
                    else:
                        wrapped, u_starts, c_starts = _compress_chunked(
                            blobs[0], compression
                        )
                        built.append(
                            (kind, wrapped, (u_starts, c_starts), None, marks)
                        )
                entries = []
                for g in range(len(bounds)):
                    positions: list[int] = []
                    for st, b in zip(streams, built):
                        extras = st[2]
                        _, _, offs, _, marks = b
                        if marks is None:
                            positions.append(int(offs[g]))
                            if compression != "NONE":
                                positions.append(0)  # offset inside the chunk
                            positions.extend([0] * extras)  # coder state
                        else:
                            off, used, bits = marks[g]
                            if compression == "NONE":
                                positions.extend([off, used, bits])
                            else:
                                u_starts, c_starts = offs
                                ci = (
                                    int(np.searchsorted(u_starts, off, "right"))
                                    - 1
                                )
                                positions.extend(
                                    [
                                        int(c_starts[ci]),
                                        off - int(u_starts[ci]),
                                        used,
                                        bits,
                                    ]
                                )
                    entries.append((positions, stats[g]))
                ri = _orc_compress(_row_index_pb(entries), compression)
                stream_meta.append((_STREAM_ROW_INDEX, cid, len(ri)))
                index += ri
                if cid in bloom_streams:
                    bs = bloom_streams[cid]
                    stream_meta.append((8, cid, len(bs)))  # BLOOM_FILTER_UTF8
                    index += bs
                col_payloads.append((cid, built))
            for cid, built in col_payloads:
                for kind, payload, _, _, _ in built:
                    stream_meta.append((kind, cid, len(payload)))
                    data += payload
        else:
            flat: list[tuple[int, list[tuple[int, bytes]], bytes]] = []
            for i in range(n_cols):
                _encode_tree(
                    root_node["children"][i][1], chunk.column(i), v11, flat,
                    counts,
                )
            # _encode_tree appends pre-order, which IS column-id order
            for cid, streams, _ in flat:
                for kind, blob in streams:
                    wrapped = _orc_compress(blob, compression)
                    stream_meta.append((kind, cid, len(wrapped)))
                    data += wrapped
            encodings += [enc for _, _, enc in flat]
        # per-stripe column statistics for the Metadata section — what
        # lets the reference reader's sargApp.pickStripes skip WHOLE
        # stripes before touching their indexes (RecordReaderImpl
        # consults Reader.getStripeStatistics; granularity above the
        # ROW_INDEX streams emitted per group below)
        st_stats: list[bytes] = [_min_stats(chunk.num_rows, False)]
        for i in range(n_cols):
            col = chunk.column(i)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            _tree_stats_pbs(root_node["children"][i][1], col, st_stats)
        stripe_stats_pbs.append(st_stats)
        out += index
        out += data
        # StripeFooter: streams=1, columns(encodings)=2, writerTimezone=3
        sf = bytearray()
        for kind, col_id, length in stream_meta:
            body = _f_varint(1, kind) + _f_varint(2, col_id) + _f_varint(3, length)
            sf += _f_bytes(1, bytes(body))
        for e in encodings:
            sf += _f_bytes(2, e)
        sf += _f_bytes(3, b"UTC")
        sf_wrapped = _orc_compress(bytes(sf), compression)
        out += sf_wrapped
        stripe_infos.append(
            (stripe_offset, len(index), len(data), len(sf_wrapped), chunk.num_rows)
        )

    content_length = len(out)

    # Metadata section (between stripes and footer): one StripeStatistics
    # per stripe, one ColumnStatistics per column id — typed min/max so a
    # SearchArgument can refute entire stripes from the tail alone
    meta_pb = b"".join(
        _f_bytes(1, b"".join(_f_bytes(1, cs) for cs in st))
        for st in stripe_stats_pbs
    )
    metadata_wrapped = _orc_compress(meta_pb, compression)
    out += metadata_wrapped

    # Footer
    footer = bytearray()
    footer += _f_varint(1, header_len)
    footer += _f_varint(2, content_length)
    for off, ilen, dlen, flen, nrows in stripe_infos:
        body = (
            _f_varint(1, off)
            + _f_varint(2, ilen)
            + _f_varint(3, dlen)
            + _f_varint(4, flen)
            + _f_varint(5, nrows)
        )
        footer += _f_bytes(3, bytes(body))
    # types in pre-order: root struct, then each column's subtree
    type_pbs: list[bytes] = []
    _tree_type_pbs(root_node, type_pbs)
    for tp in type_pbs:
        footer += _f_bytes(4, tp)
    # user metadata (Writer.addUserMetadata analog): Footer.metadata,
    # repeated UserMetadataItem { name=1, value=2 }
    for k, v in (user_metadata or {}).items():
        footer += _f_bytes(5, _f_bytes(1, k.encode()) + _f_bytes(2, bytes(v)))
    footer += _f_varint(6, total_rows)
    # file-level per-id stats: typed min/max over the whole table (same
    # masked walk as the stripe stats — lets the reader skip the entire
    # file from the footer), cross-checked against the value counts the
    # encode walk accumulated so the two traversals cannot drift apart
    file_stats: list[bytes] = [_min_stats(total_rows, False)]
    for i in range(n_cols):
        col = table.column(i)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        _tree_stats_pbs(root_node["children"][i][1], col, file_stats)
    counts[0] = [total_rows, False]
    for cid, st in enumerate(file_stats):
        walk_n = counts.get(cid, [0, False])[0]
        stat_n, _rest = _uvarint_prefix(st)
        assert stat_n == walk_n, (
            f"orcfile: column id {cid} stats count {stat_n} != encode walk {walk_n}"
        )
        footer += _f_bytes(7, st)
    footer += _f_varint(8, row_index_stride)
    footer_wrapped = _orc_compress(bytes(footer), compression)
    out += footer_wrapped

    # PostScript
    ps = bytearray()
    ps += _f_varint(1, len(footer_wrapped))
    ps += _f_varint(2, _COMPRESSION[compression])
    if compression != "NONE":
        ps += _f_varint(3, _ORC_CHUNK)  # compressionBlockSize
    ps += _f_packed(4, [0, 11] if v11 else [0, 12])  # file version
    ps += _f_varint(5, len(metadata_wrapped))  # metadataLength
    # writerVersion 9 = ORC_14, orc-core 2.2's CURRENT_WRITER: the reader
    # trusts a statistic only if the writer postdates its bug fix, and
    # this writer implements every gated contract — codepoint-ordered
    # string bounds (HIVE_8732), NaN-free double bounds (HIVE_13083),
    # UTF8 blooms (ORC_101), UTC timestamp statistics (ORC_135, else the
    # reader ignores timestamp min/max entirely), canonical decimal
    # strings (ORC_517), 1024-byte stat truncation (ORC_203)
    ps += _f_varint(6, 9)
    ps += _f_bytes(8000, b"ORC")
    assert len(ps) < 256
    out += ps
    out.append(len(ps))

    with open(path, "wb") as f:
        f.write(bytes(out))


# --- BLOOM_FILTER_UTF8 emission ----------------------------------------------
#
# Byte-exact reimplementation of org.apache.orc.util.BloomFilter's BUILD
# side (constructor sizing and addHash recovered from the orc-core 2.2.2
# bytecode; hash functions shared with sparc.engine.orcread's validated
# probe side).  Emitted per row group in a BloomFilterIndex protobuf, the
# layout BloomFilterIO.serialize writes — so the reference reader can
# bloom-prune inside our files, and tests can compare our bitset words
# against a live Java BloomFilter fed the same values, word for word.

import math as _math

_ORC_BLOOM_DEFAULT_FPP = 0.05  # BloomFilter.DEFAULT_FPP


def _orc_bloom_params(n: int, fpp: float) -> tuple[int, int]:
    n = max(n, 1)
    bits = int(-n * _math.log(fpp) / (_math.log(2.0) ** 2))  # d2i truncates
    num_bits = bits + (64 - bits % 64)  # always rounds up, +64 when aligned
    # Java Math.round = floor(x + 0.5), not banker's rounding
    k = max(1, int(_math.floor(num_bits / n * _math.log(2.0) + 0.5)))
    return num_bits, k


def _orc_bloom_build(hashes: list[int], n_expected: int, fpp: float) -> tuple[np.ndarray, int]:
    """-> (bitset words as uint64, numHashFunctions); BloomFilter.addHash
    over pre-computed Murmur3/Thomas-Wang 64-bit hashes."""
    num_bits, k = _orc_bloom_params(n_expected, fpp)
    words = np.zeros(num_bits >> 6, np.uint64)
    m32 = 0xFFFFFFFF
    for h64 in hashes:
        h64 &= (1 << 64) - 1
        h1 = h64 & m32
        if h1 >= 1 << 31:
            h1 -= 1 << 32
        h2 = (h64 >> 32) & m32
        if h2 >= 1 << 31:
            h2 -= 1 << 32
        for i in range(1, k + 1):
            combined = (h1 + i * h2) & m32
            if combined >= 1 << 31:
                combined -= 1 << 32
            if combined < 0:
                combined = ~combined
            pos = combined % num_bits
            words[pos >> 6] |= np.uint64(1 << (pos & 63))
    return words, k


def _orc_bloom_hashes(arr: pa.Array) -> list[int] | None:
    """Per-value 64-bit bloom hashes for a non-null array, matching the
    writer's add* dispatch: strings/binary -> Murmur3.hash64(bytes),
    ints/dates -> the Thomas-Wang long mix, doubles ->
    addLong(doubleToLongBits) (BloomFilter.addDouble — bitsets validated
    word-identical to a live Java BloomFilterUtf8), timestamps ->
    addLong(UTC epoch millis), decimals -> addString(HiveDecimal
    plain form, trailing zeros stripped).  None = unsupported type."""
    from . import orcread as _orcread

    t = arr.type
    if stripe_mod._is_binary_like(t):
        return [
            _orcread.murmur3_hash64(v.as_py() if not isinstance(v, bytes) else v)
            for v in arr.cast(pa.large_binary())
        ]
    if pa.types.is_integer(t) or pa.types.is_date32(t):
        vals = stripe_mod._arrow_nonnull_int64(arr)
        return [_orcread._orc_long_hash(int(v)) for v in vals]
    if pa.types.is_floating(t):
        vals = np.asarray(arr.cast(pa.float64()), np.float64)
        bits = vals.view(np.int64).copy()
        # Double.doubleToLongBits canonicalizes every NaN payload
        bits[np.isnan(vals)] = 0x7FF8000000000000
        return [_orcread._orc_long_hash(int(b)) for b in bits]
    if pa.types.is_timestamp(t):
        us = np.asarray(arr.cast(pa.timestamp("us")).view(pa.int64()), np.int64)
        millis = np.floor_divide(us, 1000)
        return [_orcread._orc_long_hash(int(m)) for m in millis]
    if pa.types.is_decimal(t):
        return [
            _orcread.murmur3_hash64(
                _orcread._orc_decimal_str(v.as_py()).encode("utf-8")
            )
            for v in arr
        ]
    return None


def _bloom_index_pb(group_filters: list[tuple[np.ndarray, int]]) -> bytes:
    out = bytearray()
    for words, k in group_filters:
        body = _f_varint(1, k) + _f_bytes(
            3, words.astype("<u8").tobytes()
        )
        out += _f_bytes(1, bytes(body))
    return bytes(out)
