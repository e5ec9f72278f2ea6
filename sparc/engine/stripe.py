"""Stripe encode/decode: pure functions Arrow batch <-> (streams, footer).

This is the engine's core contract (SURVEY.md §3.4): one stripe is encoded
by one pure function inside ``mapInArrow`` — no per-row Python anywhere.

Stream model mirrors the reference (``StreamName(columnId, Kind)``,
``org/apache/orc/impl/StreamName.java:40-132``): per column, a dict of
streams keyed by kind:

- PRESENT       — null mask (bitfield + byte-RLE), only when nulls exist
  (TreeWriterBase.writeBatch/removeIsPresentPositions semantics)
- DATA          — main data (RLEv2 / raw bytes / dict codes / FSST body)
- LENGTH        — RLEv2 unsigned lengths (strings, binary, lists)
- DICTIONARY_DATA — concatenated sorted dictionary bytes
- SECONDARY     — timestamp nanos (TimestampTreeWriter.formatNanos contract,
  ``org/apache/orc/impl/writer/TimestampTreeWriter.java:99-174``)

Every stream then passes the block-codec layer (§2.5).  The per-stripe
footer is a JSON-able dict: encodings chosen, per-stream sizes, column
statistics — the engine's self-describing metadata + metrics checkpoint.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..kernels import bitfield, block, dictionary, fsst, rlev2
from . import stats as stats_mod

# seconds between unix epoch and 2015-01-01 00:00:00 UTC — the reference's
# BASE_TIMESTAMP_STRING epoch (TimestampTreeWriter)
TS_BASE_SECONDS = 1_420_070_400

DICT_CHECK_ROWS = 10_000  # ROW_INDEX_STRIDE_DICTIONARY_CHECK analog
FSST_MIN_WIN = 0.90  # pre-codec sample ratio gate (see _encode_binary_like)


def _fsst_enabled() -> bool:
    """SPARC_FSST=0 switches to speed mode: strings go raw+zstd like the
    reference (which has no FSST), trading ~2% total size for ~2x encode
    throughput.  The encodingStrategy SPEED/COMPRESSION analog."""
    import os

    return os.environ.get("SPARC_FSST", "1") != "0"
FSST_MAX_AVG_LEN = 4096  # strings only; big blobs go straight to zstd
FSST_SAMPLE = 1 << 15

_TS_UNITS = {"s": 1, "ms": 1_000, "us": 1_000_000, "ns": 1_000_000_000}


# ---------------------------------------------------------------------------
# timestamp nanos trick (formatNanos / parseNanos)
# ---------------------------------------------------------------------------


def format_nanos(nanos: np.ndarray) -> np.ndarray:
    """Trailing-zero packing: value<<3 | (zeros-1), zeros in 2..7."""
    nanos = nanos.astype(np.int64)
    out = nanos << 3
    remaining = (nanos != 0) & (nanos % 100 == 0)
    for z in range(7, 1, -1):
        m = remaining & (nanos % (10**z) == 0)
        out[m] = ((nanos[m] // (10**z)) << 3) | (z - 1)
        remaining &= ~m
    return out


def parse_nanos(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.int64)
    zeros = v & 7
    base = v >> 3
    scale = np.where(zeros > 0, 10 ** (zeros + 1), 1).astype(np.int64)
    return base * scale


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------


def _arrow_nonnull_int64(arr: pa.Array) -> tuple[np.ndarray, np.ndarray | None]:
    """(non-null values as int64, validity bool array or None)."""
    t = arr.type
    # date32 has no direct int64 cast; hop through its storage width
    mid = pa.int32() if pa.types.is_date32(t) else pa.int64()
    if arr.null_count:
        valid = arr.is_valid().to_numpy(zero_copy_only=False)
        vals = arr.drop_null().cast(mid).to_numpy(zero_copy_only=False)
        return vals.astype(np.int64), valid
    return (
        arr.cast(mid).to_numpy(zero_copy_only=False).astype(np.int64),
        None,
    )


def encode_column(
    arr: pa.Array, name: str, codec: str = "zstd", fsst: bool | None = None
) -> tuple[dict[str, bytes], dict]:
    """Encode one column -> ({stream_kind: bytes}, column footer dict)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    t = arr.type
    streams: dict[str, bytes] = {}
    meta: dict = {
        "name": name,
        "arrow_type": str(t),
        "n_rows": len(arr),
        "n_nulls": arr.null_count,
    }

    valid = None
    if arr.null_count:
        valid = arr.is_valid().to_numpy(zero_copy_only=False)
        streams["PRESENT"] = bitfield.encode(valid)

    if pa.types.is_integer(t) or pa.types.is_date(t):
        vals, _ = _arrow_nonnull_int64(arr)
        streams["DATA"] = rlev2.encode(vals, signed=True)
        meta["encoding"] = "rlev2"
        meta["stats"] = stats_mod.int_stats(vals, arr.null_count).to_dict()
    elif pa.types.is_timestamp(t):
        unit_scale = _TS_UNITS[t.unit]
        vals, _ = _arrow_nonnull_int64(arr)
        # split into (seconds - 2015 base) + formatted nanos
        seconds = np.floor_divide(vals, unit_scale) - TS_BASE_SECONDS
        frac = np.mod(vals, unit_scale)  # >= 0 (floor semantics)
        nanos = frac * (1_000_000_000 // unit_scale)
        streams["DATA"] = rlev2.encode(seconds, signed=True)
        streams["SECONDARY"] = rlev2.encode(format_nanos(nanos), signed=False)
        meta["encoding"] = "timestamp_split"
        meta["ts_unit"] = t.unit
        meta["ts_tz"] = t.tz
        meta["stats"] = stats_mod.int_stats(vals, arr.null_count, kind="timestamp").to_dict()
    elif pa.types.is_floating(t):
        np_t = np.float32 if pa.types.is_float32(t) else np.float64
        if arr.null_count:
            vals = arr.drop_null().to_numpy(zero_copy_only=False).astype(np_t)
        else:
            vals = arr.to_numpy(zero_copy_only=False).astype(np_t)
        streams["DATA"] = vals.astype(np.dtype(np_t).newbyteorder("<")).tobytes()
        meta["encoding"] = "float_raw"
        meta["stats"] = stats_mod.float_stats(vals.astype(np.float64), arr.null_count).to_dict()
    elif pa.types.is_boolean(t):
        if arr.null_count:
            vals = arr.drop_null().to_numpy(zero_copy_only=False)
        else:
            vals = arr.to_numpy(zero_copy_only=False)
        streams["DATA"] = bitfield.encode(vals)
        meta["encoding"] = "bool"
        meta["stats"] = stats_mod.bool_stats(vals, arr.null_count).to_dict()
    elif _is_binary_like(t):
        _encode_binary_like(arr, streams, meta, codec, fsst)
    elif pa.types.is_list(t) or pa.types.is_large_list(t):
        nn = arr.drop_null() if arr.null_count else arr
        counts = nn.value_lengths().to_numpy(zero_copy_only=False).astype(np.int64)
        streams["LENGTH"] = rlev2.encode(counts, signed=False)
        child_streams, child_meta = encode_column(nn.flatten(), f"{name}.item", codec)
        for k, v in child_streams.items():
            streams[f"CHILD_{k}"] = v
        meta["encoding"] = "list"
        meta["child"] = child_meta
        meta["stats"] = stats_mod.int_stats(counts, arr.null_count, kind="int").to_dict()
    else:
        raise NotImplementedError(f"unsupported arrow type {t} for column {name}")

    # block-compression layer on every stream, store-if-bigger per chunk
    # (CHILD_* streams were already compressed by the recursive call).
    # Per-stream codec tuning mirrors SerializationUtils.getCustomizedCodec
    # (SerializationUtils.java:1391-1424): small index-ish streams
    # (PRESENT/LENGTH/SECONDARY) get a faster level; bulk DATA streams the
    # default.  Levels are codec params, not format — the chunk header
    # carries everything the decoder needs.
    sizes = {}
    for kind in list(streams):
        raw = streams[kind]
        if kind.startswith("CHILD_"):
            sizes[kind] = {"encoded": len(raw), "compressed": len(raw)}
            continue
        level = _STREAM_LEVEL.get(kind) if codec == "zstd" else None
        comp = block.compress(raw, codec, level)
        streams[kind] = comp
        sizes[kind] = {"encoded": len(raw), "compressed": len(comp)}
    meta["codec"] = codec
    meta["streams"] = sizes
    return streams, meta


# stream kind -> zstd level override (None = codec default, level 3)
_STREAM_LEVEL = {"PRESENT": 1, "LENGTH": 1, "SECONDARY": 1}


def _is_binary_like(t: pa.DataType) -> bool:
    return (
        pa.types.is_string(t)
        or pa.types.is_large_string(t)
        or pa.types.is_binary(t)
        or pa.types.is_large_binary(t)
    )


def _encode_binary_like(
    arr: pa.Array, streams: dict, meta: dict, codec: str = "zstd",
    fsst_opt: bool | None = None,
) -> None:
    """String/binary: dict-vs-direct(-vs-FSST) auto-selection by stripe stats.

    Mirrors checkDictionaryEncoding's early 10k-row check + the 0.8
    threshold; extends the 2-way choice with an FSST candidate measured on
    a sample (the 3-way selection SURVEY.md §4 calls for).
    """
    t = arr.type
    is_str = pa.types.is_string(t) or pa.types.is_large_string(t)
    nn = arr.drop_null() if arr.null_count else arr
    bin_arr = nn.cast(pa.large_binary())
    lengths = pa.compute.binary_length(bin_arr).to_numpy(zero_copy_only=False).astype(np.int64)
    n_nonnull = len(bin_arr)

    # early dictionary check on the first 10k non-null rows
    check = bin_arr.slice(0, min(DICT_CHECK_ROWS, n_nonnull))
    import pandas as pd

    check_codes, check_uniques = pd.factorize(check.to_pandas(), sort=False)
    use_dict = dictionary.should_use_dictionary(len(check_uniques), len(check))

    if use_dict and n_nonnull:
        codes, uniques = dictionary.encode_sorted(bin_arr)
        dict_blob = b"".join(uniques)
        streams["DATA"] = rlev2.encode(codes, signed=False)
        streams["DICTIONARY_DATA"] = dict_blob
        streams["LENGTH"] = rlev2.encode(
            np.fromiter((len(u) for u in uniques), dtype=np.int64, count=len(uniques)),
            signed=False,
        )
        meta["encoding"] = "dict"
        meta["dict_size"] = len(uniques)
        mn, mx = (uniques[0], uniques[-1]) if uniques else (None, None)
        meta["stats"] = stats_mod.string_stats(
            lengths, meta["n_nulls"], mn, mx, n_distinct=len(uniques),
            kind="string" if is_str else "binary",
        ).to_dict()
        return

    # direct: concatenated bytes + LENGTH; try FSST on a sample.
    # FSST is a short-string codec (urls, text) — large binary payloads
    # (html blobs) go straight to the zstd block layer, which compresses
    # them nearly as well at ~50x the speed.
    data_buf = _concat_binary(bin_arr)
    streams["LENGTH"] = rlev2.encode(lengths, signed=False)
    avg_len = float(lengths.mean()) if lengths.size else 0.0
    fsst_on = _fsst_enabled() if fsst_opt is None else fsst_opt
    use_fsst = False
    if fsst_on and len(data_buf) >= 4096 and is_str and avg_len <= FSST_MAX_AVG_LEN:
        # Decision is on the PRE-block-codec ratio: comparing post-zstd
        # sizes on a small sample is biased against FSST (an FSST'd 256 KiB
        # chunk holds ~2x the original content, which zstd only exploits at
        # full-chunk scale — measured: sample-level post-zstd ratio ~1.02
        # vs full-stream 0.78-0.91).  A pre-codec ratio < FSST_MIN_WIN
        # empirically predicts a post-codec win on web text/urls.
        sample = bytes(data_buf[:FSST_SAMPLE])
        table = fsst.train(sample)
        sample_enc = fsst.compress(sample, table)
        if len(sample_enc) < FSST_MIN_WIN * len(sample):
            use_fsst = True
            body = fsst.compress(bytes(data_buf), table)
            streams["DATA"] = table.serialize() + body
            meta["encoding"] = "direct_fsst"
    if not use_fsst:
        streams["DATA"] = bytes(data_buf)
        meta["encoding"] = "direct"
    mn = mx = None
    if n_nonnull:
        mm = pa.compute.min_max(bin_arr)
        mn, mx = mm["min"].as_py(), mm["max"].as_py()
    meta["stats"] = stats_mod.string_stats(
        lengths, meta["n_nulls"], mn, mx, kind="string" if is_str else "binary"
    ).to_dict()


def _concat_binary(bin_arr: pa.Array) -> memoryview:
    """Contiguous data buffer of a large_binary array (zero-copy slice)."""
    buffers = bin_arr.buffers()
    offsets = np.frombuffer(buffers[1], dtype=np.int64, count=len(bin_arr) + 1,
                            offset=bin_arr.offset * 8)
    data = buffers[2] if buffers[2] is not None else b""
    return memoryview(data)[int(offsets[0]) : int(offsets[-1])]


def encode_stripe(
    batch: pa.RecordBatch | pa.Table,
    codec: str = "zstd",
    bloom_columns: list[str] | None = None,
    fsst: bool | None = None,
) -> tuple[dict[tuple[str, str], bytes], dict]:
    """Encode all columns -> ({(column, kind): bytes}, stripe footer).

    ``bloom_columns`` adds a per-stripe BLOOM_FILTER_UTF8 stream for the
    named columns (point-lookup stripe pruning, SURVEY.md §2.6)."""
    import time

    from .. import runtime

    runtime.init()
    t_start = time.perf_counter()
    streams: dict[tuple[str, str], bytes] = {}
    footer = {"n_rows": batch.num_rows, "columns": []}
    for i, name in enumerate(batch.schema.names):
        col = batch.column(i)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        col_streams, col_meta = encode_column(col, name, codec, fsst)
        if bloom_columns and name in bloom_columns:
            from . import bloom as bloom_mod

            nn = col.drop_null() if col.null_count else col
            blob = bloom_mod.build(nn.to_pandas())
            col_streams["BLOOM_FILTER_UTF8"] = blob
            col_meta["streams"]["BLOOM_FILTER_UTF8"] = {
                "encoded": len(blob),
                "compressed": len(blob),  # bloom bits are high-entropy; stored raw
            }
        for kind, data in col_streams.items():
            streams[(name, kind)] = data
        footer["columns"].append(col_meta)
    footer["encode_seconds"] = round(time.perf_counter() - t_start, 4)
    return streams, footer


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def decode_column(
    streams: dict[str, bytes], meta: dict
) -> pa.Array:
    codec = meta["codec"]
    n_rows = meta["n_rows"]
    n_nulls = meta["n_nulls"]
    raw = {
        k: block.decompress(v, codec)
        for k, v in streams.items()
        # child streams decompress recursively; bloom streams are index
        # metadata, not data — never needed to reconstruct values
        if not k.startswith("CHILD_") and k != "BLOOM_FILTER_UTF8"
    }

    valid = None
    if n_nulls:
        valid = bitfield.decode(raw["PRESENT"], n_rows)
    n_vals = n_rows - n_nulls
    enc = meta["encoding"]
    t = _parse_type(meta)

    if enc == "rlev2":
        vals = rlev2.decode(raw["DATA"], n_vals, signed=True)
        return _scatter_numeric(vals, valid, n_rows, t)
    if enc == "timestamp_split":
        seconds = rlev2.decode(raw["DATA"], n_vals, signed=True)
        nanos = parse_nanos(rlev2.decode(raw["SECONDARY"], n_vals, signed=False))
        unit_scale = _TS_UNITS[meta["ts_unit"]]
        vals = (seconds + TS_BASE_SECONDS) * unit_scale + nanos // (
            1_000_000_000 // unit_scale
        )
        return _scatter_numeric(vals, valid, n_rows, t)
    if enc == "float_raw":
        np_t = np.float32 if t == pa.float32() else np.float64
        vals = np.frombuffer(raw["DATA"], dtype=np_t)
        return _scatter_numeric(vals, valid, n_rows, t)
    if enc == "bool":
        vals = bitfield.decode(raw["DATA"], n_vals)
        return _scatter_numeric(vals, valid, n_rows, t)
    if enc == "dict":
        nd = meta["dict_size"]
        dlens = rlev2.decode(raw["LENGTH"], nd, signed=False)
        dblob = raw["DICTIONARY_DATA"]
        codes = rlev2.decode(raw["DATA"], n_vals, signed=False)
        doffs = np.concatenate(([0], np.cumsum(dlens)))
        row_lens = dlens[codes] if n_vals else np.zeros(0, dtype=np.int64)
        starts = doffs[codes]
        data_buf = _ragged_gather(np.frombuffer(dblob, np.uint8), starts, row_lens)
        return _build_binary(data_buf, row_lens, valid, n_rows, t)
    if enc in ("direct", "direct_fsst"):
        row_lens = rlev2.decode(raw["LENGTH"], n_vals, signed=False)
        if enc == "direct_fsst":
            table, pos = fsst.SymbolTable.deserialize(raw["DATA"])
            data = np.frombuffer(fsst.decompress(raw["DATA"][pos:], table), np.uint8)
        else:
            data = np.frombuffer(raw["DATA"], np.uint8)
        return _build_binary(data, row_lens, valid, n_rows, t)
    if enc == "list":
        counts = rlev2.decode(raw["LENGTH"], n_vals, signed=False)
        child_streams = {
            k[len("CHILD_"):]: v for k, v in streams.items() if k.startswith("CHILD_")
        }
        child = decode_column(child_streams, meta["child"])
        offsets = np.concatenate(([0], np.cumsum(counts))).astype(np.int32)
        if valid is None:
            return pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), child)
        full_offsets = np.zeros(n_rows + 1, dtype=np.int32)
        full_offsets[1:][valid[:]] = counts
        np.cumsum(full_offsets, out=full_offsets)
        mask = pa.array(~valid)
        return pa.ListArray.from_arrays(
            pa.array(full_offsets, pa.int32()), child, mask=mask
        )
    raise NotImplementedError(enc)


def _parse_type(meta: dict) -> pa.DataType:
    s = meta["arrow_type"]
    if s.startswith("timestamp"):
        return pa.timestamp(meta["ts_unit"], tz=meta.get("ts_tz"))
    simple = {
        "int8": pa.int8(), "int16": pa.int16(), "int32": pa.int32(),
        "int64": pa.int64(), "uint32": pa.uint32(), "uint64": pa.uint64(),
        "date32[day]": pa.date32(), "float": pa.float32(), "double": pa.float64(),
        "bool": pa.bool_(), "string": pa.string(), "large_string": pa.large_string(),
        "binary": pa.binary(), "large_binary": pa.large_binary(),
    }
    if s in simple:
        return simple[s]
    if s.startswith("list<") or s.startswith("large_list<"):
        child = _parse_type(meta["child"])
        return pa.list_(child)
    raise NotImplementedError(s)


def _scatter_numeric(
    vals: np.ndarray, valid: np.ndarray | None, n_rows: int, t: pa.DataType
) -> pa.Array:
    # date types: build as same-width ints, then cast (pa.array can't take
    # raw int64 numpy for date32)
    via = None
    if pa.types.is_date32(t):
        vals, via, t2 = vals.astype(np.int32), t, pa.int32()
    elif pa.types.is_date64(t):
        via, t2 = t, pa.int64()
    else:
        t2 = t
    if valid is None:
        out = pa.array(vals, type=t2)
    else:
        full = np.zeros(n_rows, dtype=vals.dtype)
        full[valid] = vals
        out = pa.array(full, type=t2, mask=~valid)
    return out.cast(via) if via is not None else out


def _ragged_gather(src: np.ndarray, starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    total = int(lens.sum())
    if total == 0:
        return np.zeros(0, dtype=np.uint8)
    reps = np.repeat(np.arange(lens.size), lens)
    intra = np.arange(total, dtype=np.int64) - np.repeat(
        np.concatenate(([0], np.cumsum(lens)))[:-1], lens
    )
    return src[starts[reps] + intra]


def _build_binary(
    data: np.ndarray,
    row_lens: np.ndarray,
    valid: np.ndarray | None,
    n_rows: int,
    t: pa.DataType,
) -> pa.Array:
    use_large = t in (pa.large_string(), pa.large_binary())
    off_dtype = np.int64 if use_large else np.int32
    if valid is None:
        offsets = np.concatenate(([0], np.cumsum(row_lens))).astype(off_dtype)
        validity_buf = None
        null_count = 0
    else:
        full_lens = np.zeros(n_rows, dtype=np.int64)
        full_lens[valid] = row_lens
        offsets = np.concatenate(([0], np.cumsum(full_lens))).astype(off_dtype)
        validity_buf = pa.py_buffer(np.packbits(valid, bitorder="little").tobytes())
        null_count = int((~valid).sum())
    buffers = [
        validity_buf,
        pa.py_buffer(offsets.tobytes()),
        pa.py_buffer(data.tobytes()),
    ]
    return pa.Array.from_buffers(t, n_rows, buffers, null_count=null_count)


def decode_stripe(
    streams: dict[tuple[str, str], bytes], footer: dict
) -> pa.Table:
    from .. import runtime

    runtime.init()
    cols = []
    names = []
    for col_meta in footer["columns"]:
        name = col_meta["name"]
        col_streams = {kind: data for (cname, kind), data in streams.items() if cname == name}
        cols.append(decode_column(col_streams, col_meta))
        names.append(name)
    return pa.table(dict(zip(names, cols)))
