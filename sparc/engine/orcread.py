"""Read REAL ORC files with this engine's own kernels — the reverse
cross-validation direction: the reference writer (Spark's orc-core /
pyarrow) produces the file, OUR RLEv2 / byte-RLE / bitfield / dictionary
decoders reconstruct it.  Together with ``orcfile`` (our writer → their
readers) this closes the loop on wire-format conformance.

Scope (an oracle, not the product read path): compression NONE / ZLIB /
SNAPPY / ZSTD, schemas of int8..int64, date32, double/float,
bool, nested list / map / struct / union to any depth (recursive
type-tree walk), string (DIRECT / DICTIONARY v1 *and* DIRECT_V2 / DICTIONARY_V2 —
the ColumnEncoding kind selects RLEv1 vs RLEv2 per stream, mirroring
TreeReaderFactory's reader-version dispatch), binary, timestamp
(any IANA writerTimezone — wall-clock semantics matching the reference
reader: per-file 2015-base shift + vectorized per-value writer-zone
conversion, verified against spark.read.orc under a UTC session),
decimal (unbounded varint mantissa + signed per-value scale with
rescale-to-declared-scale, ``DecimalTreeReader`` semantics);
row-index streams are skipped (we read whole stripes).

Tail layout per ``ReaderImpl.extractPostScript/extractFileTail``
(ReaderImpl.java:649-667, 454-501); stream directory per
``StripePlanner.parseStripe`` (StripePlanner.java:142-158)."""

from __future__ import annotations

import zlib as _zlib

import numpy as np
import pyarrow as pa

from ..kernels import bitfield, rlev1, rlev2
from . import stripe as stripe_mod

# --- minimal protobuf parser ------------------------------------------------


def _parse_pb(data: bytes | memoryview) -> dict[int, list]:
    """field number -> list of raw values (ints for varint, memoryview for
    length-delimited; fixed64/32 returned as ints)."""
    out: dict[int, list] = {}
    mv = memoryview(data)
    pos = 0
    n = len(mv)
    while pos < n:
        key, pos = _varint(mv, pos)
        field, wire = key >> 3, key & 7
        if wire == 0:
            v, pos = _varint(mv, pos)
        elif wire == 2:
            ln, pos = _varint(mv, pos)
            v = mv[pos : pos + ln]
            pos += ln
        elif wire == 1:
            v = int.from_bytes(mv[pos : pos + 8], "little")
            pos += 8
        elif wire == 5:
            v = int.from_bytes(mv[pos : pos + 4], "little")
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")
        out.setdefault(field, []).append(v)
    return out


def _varint(mv: memoryview, pos: int) -> tuple[int, int]:
    shift = 0
    result = 0
    while True:
        b = mv[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _packed_varints(raw) -> list[int]:
    mv = memoryview(raw)
    out = []
    pos = 0
    while pos < len(mv):
        v, pos = _varint(mv, pos)
        out.append(v)
    return out


# --- compressed-stream inflation --------------------------------------------

_KINDS = {0: "NONE", 1: "ZLIB", 2: "SNAPPY", 3: "LZO", 4: "LZ4", 5: "ZSTD"}


def _inflate(data: bytes | memoryview, kind: str) -> bytes:
    if kind == "NONE":
        return bytes(data)
    mv = memoryview(data)
    out = bytearray()
    pos = 0
    while pos < len(mv):
        head = int.from_bytes(mv[pos : pos + 3], "little")
        pos += 3
        clen, original = head >> 1, head & 1
        chunk = mv[pos : pos + clen]
        pos += clen
        if original:
            out += chunk
        elif kind == "ZLIB":
            out += _zlib.decompress(bytes(chunk), -15)  # raw deflate
        elif kind == "SNAPPY":
            # raw snappy embeds the uncompressed length as a leading varint
            size, _ = _varint(chunk, 0)
            out += pa.Codec("snappy").decompress(bytes(chunk), size)
        elif kind == "ZSTD":
            out += pa.Codec("zstd").decompress(
                bytes(chunk), _zstd_content_size(chunk)
            )
        else:
            raise NotImplementedError(f"orcread: codec {kind}")
    return bytes(out)


def _zstd_content_size(chunk) -> int:
    """Frame-header content size (the reference's one-shot ZSTD_compress
    always records it)."""
    mv = memoryview(chunk)
    assert int.from_bytes(mv[0:4], "little") == 0xFD2FB528, "not a zstd frame"
    fhd = mv[4]
    fcs_flag = fhd >> 6
    single_segment = (fhd >> 5) & 1
    did_size = (0, 1, 2, 4)[fhd & 3]
    pos = 5 + (0 if single_segment else 1) + did_size
    if fcs_flag == 0:
        if not single_segment:
            raise ValueError("zstd frame without content size")
        return mv[pos]
    if fcs_flag == 1:
        return int.from_bytes(mv[pos : pos + 2], "little") + 256
    if fcs_flag == 2:
        return int.from_bytes(mv[pos : pos + 4], "little")
    return int.from_bytes(mv[pos : pos + 8], "little")


# --- ORC enums ---------------------------------------------------------------

_TYPE_KINDS = {
    0: "boolean", 1: "byte", 2: "short", 3: "int", 4: "long", 5: "float",
    6: "double", 7: "string", 8: "binary", 9: "timestamp", 10: "list",
    11: "map", 12: "struct", 13: "union", 14: "decimal", 15: "date",
    16: "varchar", 17: "char", 18: "timestamp_instant",
}
_STREAM_KIND = {0: "PRESENT", 1: "DATA", 2: "LENGTH", 3: "DICTIONARY_DATA",
                5: "SECONDARY", 6: "ROW_INDEX", 8: "BLOOM_FILTER_UTF8",
                7: "BLOOM_FILTER"}
_INT_WIDTH = {"byte": pa.int8(), "short": pa.int16(), "int": pa.int32(),
              "long": pa.int64()}


def read_orc(path: str) -> pa.Table:
    """Parse + decode an ORC file with this engine's kernels."""
    with open(path, "rb") as f:
        data = f.read()
    ps_len = data[-1]
    ps = _parse_pb(data[-1 - ps_len : -1])
    footer_len = ps[1][0]
    kind = _KINDS[ps.get(2, [0])[0]]
    footer = _parse_pb(_inflate(data[-1 - ps_len - footer_len : -1 - ps_len], kind))

    types = [_parse_pb(t) for t in footer[4]]
    root = types[0]
    assert _TYPE_KINDS[root.get(1, [0])[0]] == "struct"
    subtypes = _packed_varints(root[2][0]) if 2 in root else []
    names = [bytes(b).decode() for b in root.get(3, [])]

    stripes = []
    for s in footer.get(3, []):
        sp = _parse_pb(s)
        stripes.append(
            {
                "offset": sp[1][0],
                "index_len": sp.get(2, [0])[0],
                "data_len": sp[3][0],
                "footer_len": sp[4][0],
                "n_rows": sp[5][0],
            }
        )

    col_chunks: dict[int, list[pa.Array]] = {i: [] for i in range(len(names))}
    for st in stripes:
        base = st["offset"]
        sf_raw = _inflate(
            data[base + st["index_len"] + st["data_len"] :
                 base + st["index_len"] + st["data_len"] + st["footer_len"]],
            kind,
        )
        sf = _parse_pb(sf_raw)
        streams = [_parse_pb(x) for x in sf.get(1, [])]
        encodings = [_parse_pb(x) for x in sf.get(2, [])]
        # StripeFooter.writerTimezone (field 3): timestamp seconds are
        # wall-clock in this zone; only UTC decodes without per-value
        # DST adjustment, so anything else must fail loudly, not drift
        writer_tz = bytes(sf[3][0]).decode() if 3 in sf else "UTC"
        # stream payloads laid out sequentially from the stripe start
        pos = base
        per_col: dict[int, dict[str, bytes]] = {}
        for stream in streams:
            skind = _STREAM_KIND.get(stream.get(1, [0])[0], "?")
            col = stream.get(2, [0])[0]
            ln = stream.get(3, [0])[0]
            if skind not in ("ROW_INDEX", "BLOOM_FILTER", "BLOOM_FILTER_UTF8", "?"):
                per_col.setdefault(col, {})[skind] = _inflate(
                    data[pos : pos + ln], kind
                )
            pos += ln
        for i, type_id in enumerate(subtypes):
            arr = _decode_tree(
                type_id, types, per_col, encodings, st["n_rows"], writer_tz
            )
            col_chunks[i].append(arr)

    if not stripes:
        # zero-stripe file (Spark writes these for empty partitions):
        # a typed empty table, as every reference reader returns
        return pa.table(
            {n: pa.nulls(0, _arrow_type_of(types, s))
             for n, s in zip(names, subtypes)}
        )
    cols = [pa.concat_arrays(chunks) if len(chunks) != 1 else chunks[0]
            for chunks in (col_chunks[i] for i in range(len(names)))]
    return pa.table(dict(zip(names, cols)))


def _arrow_type_of(types: list[dict], idx: int) -> pa.DataType:
    """Arrow type a decode of this ORC Type node produces (used only to
    shape zero-stripe empties — the decode paths carry their own types)."""
    t = types[idx]
    tk = _TYPE_KINDS[t.get(1, [0])[0]]
    subtypes = _packed_varints(t[2][0]) if 2 in t else []
    names = [bytes(b).decode() for b in t.get(3, [])]
    if tk in _INT_WIDTH:
        at = _INT_WIDTH[tk]
        if tk == "long" and _catalyst_type(t) == "timestamp_ntz":
            return pa.timestamp("us")
        return at
    simple = {
        "boolean": pa.bool_(), "float": pa.float32(), "double": pa.float64(),
        "string": pa.string(), "char": pa.string(), "varchar": pa.string(),
        "binary": pa.binary(), "date": pa.date32(),
        "timestamp": pa.timestamp("us"),
        "timestamp_instant": pa.timestamp("us", tz="UTC"),
    }
    if tk in simple:
        return simple[tk]
    if tk == "decimal":
        return pa.decimal128(t.get(5, [38])[0], t.get(6, [10])[0])
    if tk == "struct":
        return pa.struct(
            [pa.field(n, _arrow_type_of(types, s)) for n, s in zip(names, subtypes)]
        )
    if tk == "list":
        return pa.list_(_arrow_type_of(types, subtypes[0]))
    if tk == "map":
        return pa.map_(
            _arrow_type_of(types, subtypes[0]), _arrow_type_of(types, subtypes[1])
        )
    raise NotImplementedError(f"empty-file type {tk}")


def _decode_tree(
    type_id: int, types: list[dict], per_col: dict, encodings: list[dict],
    n_rows: int, writer_tz: str,
) -> pa.Array:
    """Recursive column decode over the pre-order type tree.  Nested
    nulls per the ORC model (TreeReaderFactory's StructTreeReader
    :2569-2661, ListTreeReader :2792-2878, MapTreeReader :2884-2979,
    UnionTreeReader :2671-2766, DecimalTreeReader :1484-1782 —
    orc-core 2.2.2 jar line tables per SURVEY §0): a child
    stream holds entries only for slots where the parent is present, so
    each level re-expands its children through its own PRESENT bits."""
    type_pb = types[type_id]
    tk = _TYPE_KINDS[type_pb.get(1, [0])[0]]
    if tk not in ("struct", "list", "map", "union"):
        return _decode_orc_column(
            type_pb, per_col.get(type_id, {}), encodings[type_id], n_rows,
            writer_tz,
        )
    streams = per_col.get(type_id, {})
    enc_kind = encodings[type_id].get(1, [0])[0]
    rle = rlev1 if enc_kind in (0, 1) else rlev2
    valid = None
    n_vals = n_rows
    if "PRESENT" in streams:
        valid = bitfield.decode(streams["PRESENT"], n_rows)
        n_vals = int(valid.sum())
        if n_vals == n_rows:
            valid = None
    subtypes = _packed_varints(type_pb[2][0]) if 2 in type_pb else []

    def child(sid: int, n: int) -> pa.Array:
        return _decode_tree(sid, types, per_col, encodings, n, writer_tz)

    if tk == "union":
        # UnionTreeReader: DATA = byte-RLE tags; variant values follow in
        # row order.  Arrow unions cannot carry top-level nulls, so a
        # PRESENT-bearing union (Hive can write one) has no lossless
        # Arrow image — refuse rather than guess.
        if valid is not None:
            raise NotImplementedError("orcread: union with nulls")
        from ..kernels import byterle

        tags = byterle.decode(streams["DATA"], n_rows).astype(np.int8)
        offsets = np.zeros(n_rows, np.int32)
        kids = []
        for i, sid in enumerate(subtypes):
            mask = tags == i
            cnt = int(mask.sum())
            kids.append(child(sid, cnt))
            offsets[mask] = np.arange(cnt, dtype=np.int32)
        return pa.UnionArray.from_dense(
            pa.array(tags, pa.int8()), pa.array(offsets, pa.int32()), kids
        )
    if tk == "struct":
        names = [bytes(b).decode() for b in type_pb.get(3, [])]
        kids = [child(sid, n_vals) for sid in subtypes]
        if valid is not None:
            # inflate to n_rows: parent-null slots become null children
            idx = np.zeros(n_rows, np.int64)
            idx[valid] = np.arange(n_vals)
            take_idx = pa.array(idx, pa.int64(), mask=~valid)
            kids = [k.take(take_idx) for k in kids]
            return pa.StructArray.from_arrays(kids, names, mask=pa.array(~valid))
        return pa.StructArray.from_arrays(kids, names)
    lengths = rle.decode(streams["LENGTH"], n_vals, signed=False)
    total = int(lengths.sum())
    if total > 2**31 - 1:
        raise NotImplementedError(
            f"orcread: stripe holds {total} nested elements — exceeds "
            "int32 Arrow list offsets"
        )
    if valid is None:
        off_arr = pa.array(
            np.concatenate(([0], np.cumsum(lengths))).astype(np.int32), pa.int32()
        )
    else:
        full_len = np.zeros(n_rows, np.int64)
        full_len[valid] = lengths
        offs = np.concatenate(([0], np.cumsum(full_len))).astype(np.int32)
        off_arr = pa.array(
            offs, pa.int32(), mask=np.concatenate((~valid, [False]))
        )
    if tk == "list":
        return pa.ListArray.from_arrays(off_arr, child(subtypes[0], total))
    return pa.MapArray.from_arrays(
        off_arr, child(subtypes[0], total), child(subtypes[1], total)
    )


def _catalyst_type(type_pb: dict) -> str | None:
    """Spark's logical-type annotation on an ORC Type (attributes field,
    ``repeated StringPair attributes = 7`` with key
    ``spark.sql.catalyst.type``) — how Spark's writer marks e.g.
    TIMESTAMP_NTZ columns it physically stores as plain longs of epoch
    micros (verified: -1 reads back 1969-12-31T23:59:59.999999)."""
    for pair in type_pb.get(7, []):
        p = _parse_pb(pair)
        if 1 in p and bytes(p[1][0]) == b"spark.sql.catalyst.type" and 2 in p:
            return bytes(p[2][0]).decode()
    return None


def _decode_orc_column(
    type_pb: dict, streams: dict[str, bytes], enc_pb: dict, n_rows: int,
    writer_tz: str = "UTC",
) -> pa.Array:
    arr = _decode_orc_column_raw(type_pb, streams, enc_pb, n_rows, writer_tz)
    # honor Spark's logical-type annotation the way spark.read.orc does:
    # an attributed NTZ long column comes back as timestamp[us], not int64
    if _catalyst_type(type_pb) == "timestamp_ntz" and arr.type == pa.int64():
        arr = arr.view(pa.timestamp("us"))
    return arr


def _decode_orc_column_raw(
    type_pb: dict, streams: dict[str, bytes], enc_pb: dict, n_rows: int,
    writer_tz: str = "UTC",
) -> pa.Array:
    tk = _TYPE_KINDS[type_pb.get(1, [0])[0]]
    enc_kind = enc_pb.get(1, [0])[0]  # 0 DIRECT, 1 DICT, 2 DIRECT_V2, 3 DICT_V2
    # ColumnEncoding selects the integer coder: DIRECT/DICTIONARY carry
    # RLEv1 streams (0.11-era), *_V2 carry RLEv2 (RunLengthIntegerReader
    # vs RunLengthIntegerReaderV2 dispatch, TreeReaderFactory)
    rle = rlev1 if enc_kind in (0, 1) else rlev2
    valid = None
    n_vals = n_rows
    if "PRESENT" in streams:
        valid = bitfield.decode(streams["PRESENT"], n_rows)
        n_vals = int(valid.sum())
        if n_vals == n_rows:
            valid = None

    def scatter(vals: np.ndarray, t: pa.DataType) -> pa.Array:
        return stripe_mod._scatter_numeric(vals, valid, n_rows, t)

    if tk in _INT_WIDTH:
        vals = rle.decode(streams["DATA"], n_vals, signed=True)
        return scatter(vals.astype(_INT_WIDTH[tk].to_pandas_dtype()), _INT_WIDTH[tk])
    if tk == "date":
        vals = rle.decode(streams["DATA"], n_vals, signed=True)
        return scatter(vals.astype(np.int32), pa.date32())
    if tk in ("double", "float"):
        np_t = np.float64 if tk == "double" else np.float32
        vals = np.frombuffer(streams["DATA"], dtype=np.dtype(np_t).newbyteorder("<"))
        return scatter(vals.astype(np_t), pa.float64() if tk == "double" else pa.float32())
    if tk == "boolean":
        vals = bitfield.decode(streams["DATA"], n_vals)
        return scatter(vals, pa.bool_())
    if tk == "timestamp_instant":
        # TIMESTAMP_INSTANT ("timestamp with local time zone"): the wire
        # value is an absolute instant relative to 2015-01-01 00:00 UTC —
        # writerTimezone is irrelevant by definition, no wall-clock
        # re-expression on either side (TimestampTreeReader's instantly-
        # typed variant skips the zone adjustment)
        seconds = rle.decode(streams["DATA"], n_vals, signed=True)
        nanos = stripe_mod.parse_nanos(
            rle.decode(streams["SECONDARY"], n_vals, signed=False)
        )
        us = (seconds + stripe_mod.TS_BASE_SECONDS) * 1_000_000 + nanos // 1_000
        return scatter(us, pa.timestamp("us", tz="UTC"))
    if tk == "timestamp":
        utc = writer_tz in ("UTC", "GMT", "Etc/UTC", "Etc/GMT")
        if utc:
            base = stripe_mod.TS_BASE_SECONDS
        else:
            # The wire value is (instant seconds - base), where base is
            # the INSTANT of 2015-01-01 00:00:00 wall-clock in the
            # writer's zone (TreeWriterBase's base_timestamp) — one
            # per-file constant.
            from datetime import datetime
            from zoneinfo import ZoneInfo

            try:
                zone = ZoneInfo(writer_tz)
            except Exception as exc:
                raise NotImplementedError(
                    f"orcread: unknown writerTimezone {writer_tz!r}"
                ) from exc
            base = int(datetime(2015, 1, 1, tzinfo=zone).timestamp())
        seconds = rle.decode(streams["DATA"], n_vals, signed=True)
        nanos = stripe_mod.parse_nanos(
            rle.decode(streams["SECONDARY"], n_vals, signed=False)
        )
        us = (seconds + base) * 1_000_000 + nanos // 1_000
        if not utc:
            # ORC TIMESTAMP is wall-clock semantics: the reference reader
            # re-expresses the writer's LOCAL wall clock in the reader's
            # zone (TimestampTreeReader's writer/reader offset
            # adjustment; verified against spark.read.orc under a UTC
            # session).  The offset is per-VALUE (DST), so convert the
            # recovered instants to writer-zone wall time vectorized.
            import pandas as pd

            wall = (
                pd.DatetimeIndex(us.astype("datetime64[us]"), tz="UTC")
                .tz_convert(zone)
                .tz_localize(None)
            )
            us = wall.values.astype("datetime64[us]").astype(np.int64)
        return scatter(us, pa.timestamp("us"))
    if tk in ("string", "binary", "varchar", "char"):
        # CHAR/VARCHAR carry ordinary string streams; maximumLength is
        # type metadata only (values are stored as written)
        t = pa.binary() if tk == "binary" else pa.string()
        if enc_kind in (1, 3):  # DICTIONARY / DICTIONARY_V2
            nd = enc_pb.get(2, [0])[0]
            dlens = rle.decode(streams["LENGTH"], nd, signed=False)
            dblob = np.frombuffer(streams["DICTIONARY_DATA"], np.uint8)
            codes = rle.decode(streams["DATA"], n_vals, signed=False)
            doffs = np.concatenate(([0], np.cumsum(dlens)))
            row_lens = dlens[codes] if n_vals else np.zeros(0, dtype=np.int64)
            buf = stripe_mod._ragged_gather(dblob, doffs[codes], row_lens)
            return stripe_mod._build_binary(buf, row_lens, valid, n_rows, t)
        row_lens = rle.decode(streams["LENGTH"], n_vals, signed=False)
        return stripe_mod._build_binary(
            np.frombuffer(streams["DATA"], np.uint8), row_lens, valid, n_rows, t
        )
    if tk == "decimal":
        # DecimalTreeReader: DATA = unbounded zigzag-varint mantissa,
        # SECONDARY = signed RLE per-value scale.  HiveDecimal strips
        # trailing zeros, so a value's wire scale may be below the column
        # scale; the reader rescales to the declared scale.
        from ..kernels import bigdec

        prec = type_pb.get(5, [38])[0]
        scale = type_pb.get(6, [0])[0]
        lo, hi = bigdec.decode(streams["DATA"], n_vals)
        val_scales = rle.decode(streams["SECONDARY"], n_vals, signed=True)
        if n_vals and not (val_scales == scale).all():
            # rare path: exact Python-int rescale (oracle read, not hot)
            out_lo = np.empty(n_vals, np.uint64)
            out_hi = np.empty(n_vals, np.int64)
            for i in range(n_vals):
                v = (int(hi[i]) << 64) | int(lo[i])
                v *= 10 ** (scale - int(val_scales[i]))
                out_lo[i] = v & 0xFFFFFFFFFFFFFFFF
                out_hi[i] = v >> 64
            lo, hi = out_lo, out_hi
        return stripe_mod._build_decimal_big(
            lo, hi, valid, n_rows, pa.decimal128(prec, scale)
        )
    raise NotImplementedError(f"orcread: type {tk}")


# --- row-group seek (consumer side of the row index) -------------------------
#
# ``RecordReaderImpl.seekToRowEntry`` analog over reference-written
# indexed files: parse each column's ROW_INDEX stream, consume the
# per-entry position list in the reader's order (per stream: [compressed
# block start, offset in block] when compressed else [stream offset],
# then coder state — RLE: values used in run; bitfield: bytes used in
# run + bits in byte), and decode ONLY the requested row groups.  Flat
# leaf columns (the shapes the reference writer indexes per column kind
# above); dictionary streams are stripe-level and therefore carry no
# positions (StringDictionaryTreeReader.seek skips them).


def _inflate_with_map(
    data: bytes | memoryview, kind: str
) -> tuple[bytes, "np.ndarray", "np.ndarray"]:
    """_inflate, also returning (compressed, uncompressed) chunk start
    offsets so a (block, in-block) position maps to an uncompressed
    stream offset."""
    if kind == "NONE":
        b = bytes(data)
        return b, np.array([0], np.int64), np.array([0], np.int64)
    mv = memoryview(data)
    out = bytearray()
    pos = 0
    c_starts: list[int] = []
    u_starts: list[int] = []
    while pos < len(mv):
        c_starts.append(pos)
        u_starts.append(len(out))
        head = int.from_bytes(mv[pos : pos + 3], "little")
        pos += 3
        clen, original = head >> 1, head & 1
        chunk = mv[pos : pos + clen]
        pos += clen
        if original:
            out += chunk
        elif kind == "ZLIB":
            out += _zlib.decompress(bytes(chunk), -15)
        elif kind == "SNAPPY":
            size, _ = _varint(chunk, 0)
            out += pa.Codec("snappy").decompress(bytes(chunk), size)
        elif kind == "ZSTD":
            out += pa.Codec("zstd").decompress(bytes(chunk), _zstd_content_size(chunk))
        else:
            raise NotImplementedError(f"orcread: codec {kind}")
    return bytes(out), np.array(c_starts, np.int64), np.array(u_starts, np.int64)


def _stream_coder(tk: str, skind: str, enc_kind: int) -> str:
    """'bits' | 'rle' | 'byte' | 'raw' — what seek state the stream's
    coder consumes (BitFieldReader / RunLength*Reader / InStream)."""
    if skind == "PRESENT" or (tk == "boolean" and skind == "DATA"):
        return "bits"
    if tk == "union" and skind == "DATA":
        return "byte"  # byte-RLE TAG stream: (offset, used), like int RLE
    if skind == "DATA" and (
        tk in ("float", "double", "decimal")
        or (tk in ("string", "binary", "varchar", "char") and enc_kind in (0, 2))
    ):
        return "raw"
    return "rle"


def _rle_signed(tk: str, skind: str) -> bool:
    if skind == "DATA" and tk in (
        "byte", "short", "int", "long", "date", "timestamp", "timestamp_instant"
    ):
        return True
    return skind == "SECONDARY" and tk == "decimal"


def _seek_mini_subtree(
    type_id: int,
    types: list[dict],
    encodings: list[dict],
    inflated_streams,
    row_index: dict[int, list[list[int]]],
    g: int,
    n_node: int,
    kind: str,
    out: dict[int, dict[str, bytes]],
) -> None:
    """Build group-``g``-local mini streams for ``type_id``'s subtree by
    seeking each node's streams via ITS OWN row-index positions, then
    recursing with each child's group value count (present count for
    struct children, summed lengths for list/map elements, per-variant
    tag counts for unions) — the TreeReader seek recursion.  ``n_node``
    is this node's value count in its own value space for the group.
    The minis feed :func:`_decode_tree` unchanged."""
    from ..kernels import byterle

    type_pb = types[type_id]
    tk = _TYPE_KINDS[type_pb.get(1, [0])[0]]
    enc_kind = encodings[type_id].get(1, [0])[0]
    entries = row_index.get(type_id, [])
    positions = list(entries[g]) if g < len(entries) else []
    mini: dict[str, bytes] = {}

    def take(count: int) -> list[int]:
        got, positions[:count] = positions[:count], []
        return got

    n_present = n_node
    lengths_g = None
    for skind, (whole, c_starts, u_starts) in inflated_streams(type_id):
        # dictionary streams are stripe-level: no positions recorded
        if skind == "DICTIONARY_DATA" or (skind == "LENGTH" and enc_kind in (1, 3)):
            mini[skind] = whole
            continue
        if kind == "NONE":
            (off,) = take(1)
        else:
            c_off, in_block = take(2)
            ci = int(np.searchsorted(c_starts, c_off, "right")) - 1
            off = int(u_starts[ci]) + in_block
        coder = _stream_coder(tk, skind, enc_kind)
        if skind == "PRESENT" or (tk == "union" and skind == "DATA"):
            n_need = n_node  # row space of this node
        else:
            n_need = n_present  # non-null value space
        if coder == "bits":
            (used, bits) = take(2)
            nbits = used * 8 + bits + n_need
            flags = bitfield.decode(memoryview(whole)[off:], nbits)[
                used * 8 + bits :
            ]
            mini[skind] = bitfield.encode(flags)
            if skind == "PRESENT":
                n_present = int(flags.sum())
        elif coder == "byte":
            (used,) = take(1)
            vals = byterle.decode(memoryview(whole)[off:], used + n_need)[used:]
            mini[skind] = byterle.encode(vals)
        elif coder == "rle":
            (used,) = take(1)
            rle = rlev1 if enc_kind in (0, 1) else rlev2
            signed = _rle_signed(tk, skind)
            vals = rle.decode(
                memoryview(whole)[off:], used + n_need, signed=signed
            )[used:]
            if skind == "LENGTH":
                lengths_g = vals
            mini[skind] = rle.encode(vals, signed=signed)
        else:  # raw
            if tk in ("float", "double") and skind == "DATA":
                w = 8 if tk == "double" else 4
                mini[skind] = whole[off : off + n_need * w]
            elif skind == "DATA" and lengths_g is not None:
                mini[skind] = whole[off : off + int(lengths_g.sum())]
            else:
                # decimal varint DATA (self-delimiting) or string DATA
                # before LENGTH: slice to end, the decoder consumes what
                # it needs
                mini[skind] = whole[off:]
    out[type_id] = mini
    if tk not in ("struct", "list", "map", "union"):
        return
    subtypes = _packed_varints(type_pb[2][0]) if 2 in type_pb else []
    if tk == "struct":
        child_counts = [n_present] * len(subtypes)
    elif tk == "union":
        tags = byterle.decode(mini["DATA"], n_node) if n_node else np.zeros(0, np.uint8)
        child_counts = [int((tags == i).sum()) for i in range(len(subtypes))]
    else:  # list / map
        total = int(lengths_g.sum()) if lengths_g is not None else 0
        child_counts = [total] * len(subtypes)
    for sid, cn in zip(subtypes, child_counts):
        _seek_mini_subtree(
            sid, types, encodings, inflated_streams, row_index, g, cn, kind, out
        )


def read_orc_row_groups(
    path: str, groups: list[int], columns: list[str] | None = None
) -> pa.Table:
    """Decode only the requested row groups (global, file-order indices
    of ``rowIndexStride`` spans) of a row-indexed ORC file, seeking into
    every stream via the file's own ROW_INDEX positions.  The selective
    analog of :func:`read_orc`; flat leaf columns only."""
    with open(path, "rb") as f:
        data = f.read()
    ps_len = data[-1]
    ps = _parse_pb(data[-1 - ps_len : -1])
    footer_len = ps[1][0]
    kind = _KINDS[ps.get(2, [0])[0]]
    footer = _parse_pb(_inflate(data[-1 - ps_len - footer_len : -1 - ps_len], kind))
    stride = footer.get(8, [0])[0]
    if not stride:
        raise ValueError("read_orc_row_groups: file has no row index")
    types = [_parse_pb(t) for t in footer[4]]
    root = types[0]
    subtypes = _packed_varints(root[2][0]) if 2 in root else []
    names = [bytes(b).decode() for b in root.get(3, [])]
    sel_names = names if columns is None else list(columns)
    sel = [(i, names[i]) for i in range(len(names)) if names[i] in sel_names]
    stripes = []
    for s in footer.get(3, []):
        sp = _parse_pb(s)
        stripes.append(
            {
                "offset": sp[1][0],
                "index_len": sp.get(2, [0])[0],
                "data_len": sp[3][0],
                "footer_len": sp[4][0],
                "n_rows": sp[5][0],
            }
        )
    want = set(groups)
    col_chunks: dict[int, list[pa.Array]] = {i: [] for i, _ in sel}
    g_base = 0
    for st in stripes:
        n_rows = st["n_rows"]
        n_gr = (n_rows + stride - 1) // stride
        local = [g - g_base for g in want if g_base <= g < g_base + n_gr]
        g_base += n_gr
        if not local:
            continue
        base = st["offset"]
        sf = _parse_pb(
            _inflate(
                data[base + st["index_len"] + st["data_len"] :
                     base + st["index_len"] + st["data_len"] + st["footer_len"]],
                kind,
            )
        )
        stream_pbs = [_parse_pb(x) for x in sf.get(1, [])]
        encodings = [_parse_pb(x) for x in sf.get(2, [])]
        writer_tz = bytes(sf[3][0]).decode() if 3 in sf else "UTC"
        # stream payload spans + ROW_INDEX blobs, in file order
        pos = base
        per_col_raw: dict[int, list[tuple[str, bytes]]] = {}
        row_index: dict[int, list[list[int]]] = {}
        for stream in stream_pbs:
            skind = _STREAM_KIND.get(stream.get(1, [0])[0], "?")
            col = stream.get(2, [0])[0]
            ln = stream.get(3, [0])[0]
            blob = data[pos : pos + ln]
            pos += ln
            if skind == "ROW_INDEX":
                ri = _parse_pb(_inflate(blob, kind))
                entries = []
                for e in ri.get(1, []):
                    epb = _parse_pb(e)
                    entries.append(
                        _packed_varints(epb[1][0]) if 1 in epb else []
                    )
                row_index[col] = entries
            elif skind in ("BLOOM_FILTER", "BLOOM_FILTER_UTF8", "?"):
                continue
            else:
                per_col_raw.setdefault(col, []).append((skind, blob))
        inflate_cache: dict[int, list[tuple[str, tuple]]] = {}

        def inflated_streams(col: int) -> list[tuple[str, tuple]]:
            if col not in inflate_cache:
                inflate_cache[col] = [
                    (skind, _inflate_with_map(blob, kind))
                    for skind, blob in per_col_raw.get(col, [])
                ]
            return inflate_cache[col]

        for i, _name in sel:
            tid = subtypes[i]
            for g in sorted(local):
                rows_g = min(stride, n_rows - g * stride)
                mini_per_col: dict[int, dict[str, bytes]] = {}
                _seek_mini_subtree(
                    tid, types, encodings, inflated_streams, row_index,
                    g, rows_g, kind, mini_per_col,
                )
                arr = _decode_tree(
                    tid, types, mini_per_col, encodings, rows_g, writer_tz
                )
                col_chunks[i].append(arr)
    out_cols = []
    out_names = []
    for i, name in sel:
        chunks = col_chunks[i]
        out_names.append(name)
        out_cols.append(
            pa.concat_arrays(chunks) if len(chunks) != 1 else chunks[0]
        )
    return pa.table(dict(zip(out_names, out_cols)))


def _stats_from_pb(spb: dict) -> dict:
    """ColumnStatistics protobuf -> the engine's sarg stats dict
    ({min, max, n_values, n_nulls, *_trunc}).  Only the domains sarg can
    compare are mapped (integer / double / string); anything else yields
    a bounds-free dict, which sarg treats as CANNOT_SKIP — pruning stays
    sound by construction."""
    import struct as _struct

    def szz(v: int) -> int:
        return (v >> 1) ^ -(v & 1)

    out: dict = {"n_values": spb.get(1, [None])[0]}
    # hasNull (field 10) is optional and absent in files written before it
    # existed (e.g. some v0.11 writers): leave n_nulls UNKNOWN rather than
    # defaulting to 0 — sarg must answer IS NULL conservatively, not NO.
    if 10 in spb:
        out["n_nulls"] = 1 if spb[10][0] else 0
    if 2 in spb:  # IntegerStatistics (sint64 min/max)
        ist = _parse_pb(spb[2][0])
        if 1 in ist:
            out["min"] = szz(ist[1][0])
        if 2 in ist:
            out["max"] = szz(ist[2][0])
    elif 3 in spb:  # DoubleStatistics (fixed64 doubles)
        dst = _parse_pb(spb[3][0])
        if 1 in dst:
            out["min"] = _struct.unpack("<d", int(dst[1][0]).to_bytes(8, "little"))[0]
        if 2 in dst:
            out["max"] = _struct.unpack("<d", int(dst[2][0]).to_bytes(8, "little"))[0]
    elif 4 in spb:  # StringStatistics; lowerBound/upperBound (4/5) mark
        # truncated bounds — map to the engine's lossy-bound flags
        sst = _parse_pb(spb[4][0])
        if 1 in sst:
            out["min"] = bytes(sst[1][0]).decode("utf-8", "replace")
        elif 4 in sst:
            out["min"] = bytes(sst[4][0]).decode("utf-8", "replace")
            out["min_trunc"] = True
        if 2 in sst:
            out["max"] = bytes(sst[2][0]).decode("utf-8", "replace")
        elif 5 in sst:
            out["max"] = bytes(sst[5][0]).decode("utf-8", "replace")
            out["max_trunc"] = True
    return out


def read_orc_statistics(
    path: str,
) -> tuple[list[dict], list[list[dict]], dict[str, bytes]]:
    """Reference Reader API analog (``Reader.getStatistics`` /
    ``getStripeStatistics`` / ``getMetadataValue``): parse a file's tail
    into (file column statistics per column id, per-stripe column
    statistics from the Metadata section, user metadata).  Stats dicts
    are the engine's sarg form ({min, max, n_values, n_nulls, ...});
    unmapped typed domains yield bounds-free dicts.  Only the tail is
    read — no stripe bytes are touched."""
    with open(path, "rb") as f:
        data = f.read()
    ps_len = data[-1]
    ps = _parse_pb(data[-1 - ps_len : -1])
    footer_len = ps[1][0]
    kind = _KINDS[ps.get(2, [0])[0]]
    footer = _parse_pb(_inflate(data[-1 - ps_len - footer_len : -1 - ps_len], kind))
    file_stats = [_stats_from_pb(_parse_pb(s)) for s in footer.get(7, [])]
    user_meta: dict[str, bytes] = {}
    for item in footer.get(5, []):
        it = _parse_pb(item)
        user_meta[bytes(it[1][0]).decode()] = bytes(it[2][0]) if 2 in it else b""
    stripe_stats: list[list[dict]] = []
    meta_len = ps.get(5, [0])[0]
    if meta_len:
        meta_end = len(data) - 1 - ps_len - footer_len
        meta = _parse_pb(_inflate(data[meta_end - meta_len : meta_end], kind))
        for ss in meta.get(1, []):
            stripe_stats.append(
                [_stats_from_pb(_parse_pb(c)) for c in _parse_pb(ss).get(1, [])]
            )
    return file_stats, stripe_stats, user_meta


def read_orc_filtered(
    path: str, predicate: tuple, columns: list[str] | None = None
) -> tuple[pa.Table, int, int]:
    """``pickRowGroups`` over a reference-written indexed file: evaluate
    the engine's SearchArgument tree (engine/sarg.py) against each row
    group's OWN ColumnStatistics parsed from the file's ROW_INDEX
    streams, then seek-decode only the surviving groups
    (RecordReaderImpl.pickRowGroups + seekToRowEntry with the roles
    swapped: their file and statistics, our pruning and kernels).

    Returns (table, total_groups, kept_groups).  The caller applies the
    residual row-level filter; pruning may drop only groups the
    statistics PROVE cannot match."""
    from . import sarg as sarg_mod

    with open(path, "rb") as f:
        data = f.read()
    ps_len = data[-1]
    ps = _parse_pb(data[-1 - ps_len : -1])
    footer_len = ps[1][0]
    kind = _KINDS[ps.get(2, [0])[0]]
    footer = _parse_pb(_inflate(data[-1 - ps_len - footer_len : -1 - ps_len], kind))
    stride = footer.get(8, [0])[0]
    if not stride:
        raise ValueError("read_orc_filtered: file has no row index")
    # Metadata section (PostScript.metadataLength, field 5): per-stripe
    # ColumnStatistics — the coarsest pruning level, evaluated BEFORE any
    # stripe bytes (footer, indexes) are touched.  At object-store scale
    # this is the difference between one tail fetch and one round-trip
    # per stripe for stripes the statistics already refute.
    meta_len = ps.get(5, [0])[0]
    stripe_level_stats: list[list[dict]] = []
    if meta_len:
        meta_end = len(data) - 1 - ps_len - footer_len
        meta = _parse_pb(_inflate(data[meta_end - meta_len : meta_end], kind))
        for ss in meta.get(1, []):
            cols_pb = _parse_pb(ss).get(1, [])
            stripe_level_stats.append(
                [_stats_from_pb(_parse_pb(c)) for c in cols_pb]
            )
    types = [_parse_pb(t) for t in footer[4]]
    root = types[0]
    subtypes = _packed_varints(root[2][0]) if 2 in root else []
    names = [bytes(b).decode() for b in root.get(3, [])]
    name_to_tid = dict(zip(names, subtypes))
    pred_cols = {
        c: name_to_tid[c] for c in sarg_mod.columns_of(predicate) if c in name_to_tid
    }
    keep_groups: list[int] = []
    g_base = 0
    n_total = 0
    for s_i, s in enumerate(footer.get(3, [])):
        sp = _parse_pb(s)
        st_off, st_idx = sp[1][0], sp.get(2, [0])[0]
        st_data, st_foot = sp[3][0], sp[4][0]
        st_rows = sp[5][0]
        n_gr = (st_rows + stride - 1) // stride
        n_total += n_gr
        if s_i < len(stripe_level_stats):
            ss = stripe_level_stats[s_i]
            st_col_stats = {
                name: ss[tid]
                for name, tid in pred_cols.items()
                if tid < len(ss) and ss[tid]
            }
            if not sarg_mod.keep(predicate, st_col_stats):
                # whole stripe refuted from the tail alone: its footer and
                # index bytes are never read
                g_base += n_gr
                continue
        sf = _parse_pb(
            _inflate(
                data[st_off + st_idx + st_data : st_off + st_idx + st_data + st_foot],
                kind,
            )
        )
        # per-column row-index entry stats for the predicate's columns
        entry_stats: dict[str, list[dict]] = {}
        entry_blooms: dict[str, list] = {}
        pos = st_off
        for stream in (_parse_pb(x) for x in sf.get(1, [])):
            skind = _STREAM_KIND.get(stream.get(1, [0])[0], "?")
            col = stream.get(2, [0])[0]
            ln = stream.get(3, [0])[0]
            if skind == "ROW_INDEX" and col in pred_cols.values():
                ri = _parse_pb(_inflate(data[pos : pos + ln], kind))
                name = names[subtypes.index(col)]
                stats = []
                for e in ri.get(1, []):
                    epb = _parse_pb(e)
                    stats.append(
                        _stats_from_pb(_parse_pb(epb[2][0])) if 2 in epb else {}
                    )
                entry_stats[name] = stats
            elif skind == "BLOOM_FILTER_UTF8" and col in pred_cols.values():
                # the reference writer's own per-row-group bloom filters
                # refute =/IN probes the min/max stats cannot
                name = names[subtypes.index(col)]
                entry_blooms[name] = _parse_bloom_index(
                    _inflate(data[pos : pos + ln], kind)
                )
            pos += ln
        for g in range(n_gr):
            col_stats = {
                name: st[g]
                for name, st in entry_stats.items()
                if g < len(st) and st[g]
            }
            probes = {
                name: (
                    lambda v, _w=bfs[g][0], _k=bfs[g][1]: _bloom_probe_value(
                        _w, _k, v
                    )
                )
                for name, bfs in entry_blooms.items()
                if g < len(bfs)
            }
            if sarg_mod.keep(predicate, col_stats, probes or None):
                keep_groups.append(g_base + g)
        g_base += n_gr
    if keep_groups:
        table = read_orc_row_groups(path, keep_groups, columns=columns)
    elif n_total:
        # typed empty result: decode one group for the schema, keep 0 rows
        table = read_orc_row_groups(path, [0], columns=columns).slice(0, 0)
    else:
        table = read_orc_row_groups(path, [], columns=columns)
    return table, n_total, len(keep_groups)


# --- reference bloom filters (consumer side) ---------------------------------
#
# Byte-exact reimplementation of the probe side of
# ``org.apache.orc.util.BloomFilter`` + ``Murmur3.hash64`` (constants and
# control flow recovered from the orc-core 2.2.2 bytecode; validated
# value-identically against the live Java class in tests): strings probe
# with Murmur3 hash64 over utf-8 bytes, longs with the Thomas-Wang mix,
# doubles via their raw IEEE-754 bits; k probe positions at the
# int32-wrapping ``hash1 + i*hash2`` with ``~`` on negatives.

_M64 = (1 << 64) - 1
_MURMUR_C1 = (-8663945395140668459) & _M64
_MURMUR_C2 = 5545529020109919103
_MURMUR_SEED = 104729


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def murmur3_hash64(data: bytes, seed: int = _MURMUR_SEED) -> int:
    """org.apache.orc.util.Murmur3.hash64 (signed Java long result)."""
    h = seed & _M64
    nblocks = len(data) >> 3
    for i in range(nblocks):
        k = int.from_bytes(data[i * 8 : (i + 1) * 8], "little")
        k = (k * _MURMUR_C1) & _M64
        k = _rotl64(k, 31)
        k = (k * _MURMUR_C2) & _M64
        h ^= k
        h = (_rotl64(h, 27) * 5 + 1390208809) & _M64
    tail = data[nblocks * 8 :]
    if tail:
        k1 = 0
        for i, b in enumerate(tail):
            k1 ^= b << (8 * i)
        k1 = (k1 * _MURMUR_C1) & _M64
        k1 = _rotl64(k1, 31)
        k1 = (k1 * _MURMUR_C2) & _M64
        h ^= k1
    h ^= len(data)
    h ^= h >> 33
    h = (h * 0xFF51AFD7ED558CCD) & _M64
    h ^= h >> 33
    h = (h * 0xC4CEB9FE1A85EC53) & _M64
    h ^= h >> 33
    return h - (1 << 64) if h >= (1 << 63) else h


def _orc_long_hash(key: int) -> int:
    """BloomFilter.getLongHash: Thomas-Wang 64-bit mix with Java's
    ARITHMETIC right shifts (lshr on signed longs)."""

    def sar(v: int, r: int) -> int:  # arithmetic shift right on int64
        v &= _M64
        if v >= 1 << 63:
            v -= 1 << 64
        return (v >> r) & _M64

    key &= _M64
    key = ((key ^ _M64) + (key << 21)) & _M64
    key ^= sar(key, 24)
    key = (key + (key << 3) + (key << 8)) & _M64
    key ^= sar(key, 14)
    key = (key + (key << 2) + (key << 4)) & _M64
    key ^= sar(key, 28)
    key = (key + (key << 31)) & _M64
    return key - (1 << 64) if key >= (1 << 63) else key


def _bloom_test_hash(words: "np.ndarray", num_funcs: int, h64: int) -> bool:
    """BloomFilter.testHash: int32-wrapping combined probes, ~ on
    negatives, modulo numBits; True = maybe present."""
    num_bits = int(words.size) * 64
    if not num_bits:
        return True
    h64 &= _M64
    hash1 = h64 & 0xFFFFFFFF
    if hash1 >= 1 << 31:
        hash1 -= 1 << 32
    hash2 = (h64 >> 32) & 0xFFFFFFFF
    if hash2 >= 1 << 31:
        hash2 -= 1 << 32
    for i in range(1, num_funcs + 1):
        combined = (hash1 + i * hash2) & 0xFFFFFFFF
        if combined >= 1 << 31:
            combined -= 1 << 32
        if combined < 0:
            combined = ~combined
        pos = combined % num_bits
        if not (int(words[pos >> 6]) >> (pos & 63)) & 1:
            return False
    return True


def _orc_decimal_str(value) -> str:
    """HiveDecimal.toString form: plain notation, trailing fractional
    zeros stripped, zero is "0" regardless of scale or sign — the string
    DecimalTreeWriter feeds bloomFilterUtf8.addString (validated against
    a live Java writer's bloom streams: hit rate 1.0 vs 0.0085 for the
    raw-scale string)."""
    if not value:
        return "0"
    s = format(value.normalize(), "f")
    return s


def _orc_timestamp_millis(value) -> int:
    """TimestampTreeWriter bloom key: UTC epoch milliseconds (floor),
    java.sql.Timestamp.getTime() semantics (validated against a live
    Java writer's bloom streams)."""
    import datetime as _dt

    if value.tzinfo is None:
        value = value.replace(tzinfo=_dt.timezone.utc)
    epoch = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)
    delta = value - epoch
    us = (delta.days * 86_400_000_000
          + delta.seconds * 1_000_000 + delta.microseconds)
    return us // 1000


def _bloom_probe_value(words, num_funcs, value) -> bool:
    import datetime as _dt
    import decimal as _decimal
    import struct as _struct

    if isinstance(value, str):
        h = murmur3_hash64(value.encode("utf-8"))
    elif isinstance(value, bytes):
        h = murmur3_hash64(value)
    elif isinstance(value, bool):
        return True  # ORC has no bool blooms
    elif isinstance(value, int):
        h = _orc_long_hash(value)
    elif isinstance(value, float):
        h = _orc_long_hash(
            int.from_bytes(_struct.pack("<d", value), "little", signed=False)
        )
    elif isinstance(value, _decimal.Decimal):
        h = murmur3_hash64(_orc_decimal_str(value).encode("utf-8"))
    elif isinstance(value, _dt.datetime):
        h = _orc_long_hash(_orc_timestamp_millis(value))
    else:
        return True  # unknown domain: cannot refute
    return _bloom_test_hash(words, num_funcs, h)


def _parse_bloom_index(blob: bytes) -> list[tuple["np.ndarray", int]]:
    """BloomFilterIndex -> [(bitset words le-uint64, numHashFunctions)]
    per row group; utf8bitset (field 3) or legacy repeated fixed64
    bitset (field 2)."""
    out = []
    idx = _parse_pb(blob)
    for e in idx.get(1, []):
        bf = _parse_pb(e)
        k = bf.get(1, [0])[0]
        if 3 in bf:
            words = np.frombuffer(bytes(bf[3][0]), "<u8")
        elif 2 in bf:
            words = np.array(bf[2], np.uint64)
        else:
            words = np.zeros(0, np.uint64)
        out.append((words, k))
    return out
