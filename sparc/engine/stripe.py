"""Stripe encode/decode: pure functions Arrow batch <-> (streams, footer).

This is the engine's core contract (SURVEY.md §3.4): one stripe is encoded
by one pure function inside ``mapInArrow`` — no per-row Python anywhere.

Stream model mirrors the reference (``StreamName(columnId, Kind)``,
``org/apache/orc/impl/StreamName.java:40-132``): per column, a dict of
streams keyed by kind:

- PRESENT       — null mask (bitfield + byte-RLE), only when nulls exist
  (TreeWriterBase.writeBatch/removeIsPresentPositions semantics)
- DATA          — main data (RLEv2 / raw bytes / dict codes / FSST body)
- LENGTH        — RLEv2 unsigned lengths (strings, binary, lists, maps)
- DICTIONARY_DATA — concatenated sorted dictionary bytes
- SECONDARY     — timestamp nanos (TimestampTreeWriter.formatNanos contract,
  ``org/apache/orc/impl/writer/TimestampTreeWriter.java:99-174``)
- FSST_TABLE    — serialized FSST symbol table (segmented FSST streams)
- CHILD{i}_*    — nested child column streams (list/map/struct recursion,
  ``ListTreeWriter.writeBatch`` :73-126, ``MapTreeWriter`` :77-136,
  ``StructTreeWriter.writeBatch`` :71-100)

Row-group index (``orc.row.index.stride`` = 10,000): value-bearing streams
are encoded and block-compressed in per-row-group SEGMENTS whose
compressed lengths live in the footer (``meta["segments"]``), alongside
per-row-group statistics (``meta["row_index"]``).  That is the engine's
analog of the reference's ROW_INDEX stream + per-group positions
(``TreeWriterBase.createRowIndexEntry`` TreeWriterBase.java:323-330):
a reader can evaluate a predicate against the per-group stats
(``RecordReaderImpl.pickRowGroups`` RecordReaderImpl.java:1176-1292) and
decompress + decode ONLY the selected groups (``seekToRow`` analog —
segment boundaries play the role of stream seek positions).

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
FSST_MIN_WIN = 0.90  # pre-codec sample gate (forced mode; see _encode_binary_like)
FSST_POST_GATE = 0.90  # auto mode: required post-codec sample win

# orc.row.index.stride default; must stay a multiple of 8 so PRESENT /
# bool bitfield segments stay byte-aligned at every group boundary
ROW_INDEX_STRIDE = 10_000


def _fsst_enabled() -> bool:
    """SPARC_FSST=0 disables the FSST candidate entirely (never probed);
    default auto mode probes a sample and uses FSST only on a measured
    post-codec win (see _encode_binary_like)."""
    import os

    return os.environ.get("SPARC_FSST", "1") != "0"
FSST_MAX_AVG_LEN = 4096  # strings only; big blobs go straight to zstd
FSST_SAMPLE = 1 << 17  # auto-gate probe sample (one codec window either way)
# auto mode probes only streams big enough for a win to matter — the probe
# itself costs ~0.2 CPU s, pure overhead on small stripes
FSST_PROBE_MIN = 8 << 20

# per-worker-process memo of auto-gate rejections: (column, codec) -> count
_FSST_REJECTS: dict[tuple[str, str], int] = {}

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


def _arrow_nonnull_int64(arr: pa.Array) -> np.ndarray:
    """Non-null values as int64."""
    t = arr.type
    # date32 has no direct int64 cast; hop through its storage width
    mid = pa.int32() if pa.types.is_date32(t) else pa.int64()
    nn = arr.drop_null() if arr.null_count else arr
    return nn.cast(mid).to_numpy(zero_copy_only=False).astype(np.int64)


def _row_bounds(n_rows: int, stride: int | None) -> list[tuple[int, int]]:
    if not stride or n_rows <= 0:
        return [(0, n_rows)]
    return [(lo, min(lo + stride, n_rows)) for lo in range(0, n_rows, stride)]


class _ColumnEncoder:
    """Accumulates per-row-group segments + whole-stripe streams for one
    column, then compresses into the final (streams, meta) pair."""

    def __init__(self, name: str, arr: pa.Array, codec: str, stride: int | None):
        if stride and stride % 8:
            # PRESENT/bool bitfield segments are decoded by concatenating
            # per-group byte runs — only sound when every group boundary
            # packs to whole bytes
            raise ValueError(f"row_index_stride must be a multiple of 8, got {stride}")
        self.name = name
        self.arr = arr
        self.codec = codec
        self.stride = stride
        self.bounds = _row_bounds(len(arr), stride)
        self.valid: np.ndarray | None = None
        if arr.null_count:
            self.valid = arr.is_valid().to_numpy(zero_copy_only=False)
        # per-group (row count, null count, value offset into non-null space)
        self.rg_rows = [hi - lo for lo, hi in self.bounds]
        if self.valid is None:
            self.rg_nulls = [0] * len(self.bounds)
        else:
            self.rg_nulls = [
                int((~self.valid[lo:hi]).sum()) for lo, hi in self.bounds
            ]
        self.rg_vals = [r - z for r, z in zip(self.rg_rows, self.rg_nulls)]
        self.voffs = np.concatenate(([0], np.cumsum(self.rg_vals))).astype(np.int64)
        self.seg_streams: dict[str, list[bytes]] = {}
        self.whole_streams: dict[str, bytes] = {}
        self.child_streams: dict[str, bytes] = {}  # pre-compressed (recursive)
        self.row_index: list[dict] = [{} for _ in self.bounds]
        self.meta: dict = {
            "name": name,
            "arrow_type": str(arr.type),
            "n_rows": len(arr),
            "n_nulls": arr.null_count,
        }
        if self.valid is not None:
            self.seg_streams["PRESENT"] = [
                bitfield.encode(self.valid[lo:hi]) for lo, hi in self.bounds
            ]

    def val_slice(self, g: int) -> slice:
        return slice(int(self.voffs[g]), int(self.voffs[g + 1]))

    def set_rg_stats(self, g: int, st: stats_mod.ColumnStats) -> None:
        self.row_index[g]["n_rows"] = self.rg_rows[g]
        self.row_index[g]["stats"] = st.to_dict()

    def finish(self) -> tuple[dict[str, bytes], dict]:
        streams: dict[str, bytes] = {}
        sizes: dict[str, dict] = {}
        segments: dict[str, list[int]] = {}
        for kind, segs in self.seg_streams.items():
            level = _STREAM_LEVEL.get(kind) if self.codec == "zstd" else None
            comp = [block.compress(s, self.codec, level) for s in segs]
            streams[kind] = b"".join(comp)
            segments[kind] = [len(c) for c in comp]
            sizes[kind] = {
                "encoded": sum(len(s) for s in segs),
                "compressed": sum(len(c) for c in comp),
            }
        for kind, raw in self.whole_streams.items():
            level = _STREAM_LEVEL.get(kind) if self.codec == "zstd" else None
            comp = block.compress(raw, self.codec, level)
            streams[kind] = comp
            sizes[kind] = {"encoded": len(raw), "compressed": len(comp)}
        for kind, comp in self.child_streams.items():
            streams[kind] = comp
            sizes[kind] = {"encoded": len(comp), "compressed": len(comp)}
        if self.stride:
            if segments:
                self.meta["segments"] = segments
            self.meta["row_index_stride"] = self.stride
            self.meta["row_index"] = self.row_index
        self.meta["codec"] = self.codec
        self.meta["streams"] = sizes
        return streams, self.meta


def encode_column(
    arr: pa.Array,
    name: str,
    codec: str = "zstd",
    fsst: bool | None = None,
    stride: int | None = ROW_INDEX_STRIDE,
) -> tuple[dict[str, bytes], dict]:
    """Encode one column -> ({stream_kind: bytes}, column footer dict).

    ``stride`` > 0 produces per-row-group stream segments + stats (the
    row-group index); ``stride=None`` emits the legacy single-segment
    layout (used for nested children, whose value space does not align
    with parent row groups)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    t = arr.type
    if pa.types.is_decimal(t) and not pa.types.is_decimal128(t):
        # decimal32/64 arrays (pyarrow >= 16) use 4/8-byte storage; the
        # unscaled-int extraction below assumes 16-byte decimal128 words
        arr = arr.cast(pa.decimal128(t.precision, t.scale))
        t = arr.type
    enc = _ColumnEncoder(name, arr, codec, stride)
    meta = enc.meta

    if pa.types.is_integer(t) or pa.types.is_date(t):
        vals = _arrow_nonnull_int64(arr)
        enc.seg_streams["DATA"] = []
        for g in range(len(enc.bounds)):
            v = vals[enc.val_slice(g)]
            enc.seg_streams["DATA"].append(rlev2.encode(v, signed=True))
            enc.set_rg_stats(g, stats_mod.int_stats(v, enc.rg_nulls[g]))
        meta["encoding"] = "rlev2"
        meta["stats"] = stats_mod.int_stats(vals, arr.null_count).to_dict()
    elif pa.types.is_decimal(t) and t.precision > 18:
        # unbounded-decimal path (DecimalTreeWriter semantics via
        # SerializationUtils.writeBigInteger, SerializationUtils.java:
        # 195-217): zigzag-varint 128-bit mantissa DATA stream + RLE
        # scale SECONDARY stream, vectorized over uint64 word pairs
        from ..kernels import bigdec

        lo, hi = _decimal_unscaled_words(arr)
        scale = np.int64(t.scale)
        enc.seg_streams["DATA"] = []
        enc.seg_streams["SECONDARY"] = []
        for g in range(len(enc.bounds)):
            sl = enc.val_slice(g)
            glo, ghi = lo[sl], hi[sl]
            enc.seg_streams["DATA"].append(bigdec.encode(glo, ghi))
            enc.seg_streams["SECONDARY"].append(
                rlev2.encode(np.full(glo.size, scale), signed=False)
            )
            enc.set_rg_stats(g, stats_mod.decimal128_stats(glo, ghi, enc.rg_nulls[g]))
        meta["encoding"] = "decimal_big"
        meta["precision"] = t.precision
        meta["scale"] = t.scale
        meta["stats"] = stats_mod.decimal128_stats(lo, hi, arr.null_count).to_dict()
    elif pa.types.is_decimal(t):
        # decimal64 path (Decimal64TreeWriter.writeBatch semantics,
        # Decimal64TreeWriter.java:59-112): unscaled value as signed RLEv2,
        # precision/scale in the footer.  precision <= 18 only (the
        # unscaled value must fit int64).
        vals = _decimal_unscaled_int64(arr)
        enc.seg_streams["DATA"] = []
        for g in range(len(enc.bounds)):
            v = vals[enc.val_slice(g)]
            enc.seg_streams["DATA"].append(rlev2.encode(v, signed=True))
            enc.set_rg_stats(g, stats_mod.int_stats(v, enc.rg_nulls[g], kind="decimal"))
        meta["encoding"] = "decimal64"
        meta["precision"] = t.precision
        meta["scale"] = t.scale
        meta["stats"] = stats_mod.int_stats(vals, arr.null_count, kind="decimal").to_dict()
    elif pa.types.is_timestamp(t):
        unit_scale = _TS_UNITS[t.unit]
        vals = _arrow_nonnull_int64(arr)
        # split into (seconds - 2015 base) + formatted nanos
        seconds = np.floor_divide(vals, unit_scale) - TS_BASE_SECONDS
        frac = np.mod(vals, unit_scale)  # >= 0 (floor semantics)
        nanos = format_nanos(frac * (1_000_000_000 // unit_scale))
        enc.seg_streams["DATA"] = []
        enc.seg_streams["SECONDARY"] = []
        for g in range(len(enc.bounds)):
            sl = enc.val_slice(g)
            enc.seg_streams["DATA"].append(rlev2.encode(seconds[sl], signed=True))
            enc.seg_streams["SECONDARY"].append(rlev2.encode(nanos[sl], signed=False))
            enc.set_rg_stats(
                g, stats_mod.int_stats(vals[sl], enc.rg_nulls[g], kind="timestamp")
            )
        meta["encoding"] = "timestamp_split"
        meta["ts_unit"] = t.unit
        meta["ts_tz"] = t.tz
        meta["stats"] = stats_mod.int_stats(vals, arr.null_count, kind="timestamp").to_dict()
    elif pa.types.is_floating(t):
        np_t = np.float32 if pa.types.is_float32(t) else np.float64
        nn = arr.drop_null() if arr.null_count else arr
        vals = nn.to_numpy(zero_copy_only=False).astype(np_t)
        le = np.dtype(np_t).newbyteorder("<")
        enc.seg_streams["DATA"] = []
        for g in range(len(enc.bounds)):
            v = vals[enc.val_slice(g)]
            enc.seg_streams["DATA"].append(v.astype(le).tobytes())
            enc.set_rg_stats(
                g, stats_mod.float_stats(v.astype(np.float64), enc.rg_nulls[g])
            )
        meta["encoding"] = "float_raw"
        meta["stats"] = stats_mod.float_stats(vals.astype(np.float64), arr.null_count).to_dict()
    elif pa.types.is_boolean(t):
        nn = arr.drop_null() if arr.null_count else arr
        vals = nn.to_numpy(zero_copy_only=False)
        enc.seg_streams["DATA"] = []
        for g in range(len(enc.bounds)):
            v = vals[enc.val_slice(g)]
            enc.seg_streams["DATA"].append(bitfield.encode(v))
            enc.set_rg_stats(g, stats_mod.bool_stats(v, enc.rg_nulls[g]))
        meta["encoding"] = "bool"
        meta["stats"] = stats_mod.bool_stats(vals, arr.null_count).to_dict()
    elif _is_binary_like(t):
        _encode_binary_like(enc, fsst)
    elif pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_map(t):
        _encode_list_like(enc, fsst)
    elif pa.types.is_struct(t):
        _encode_struct(enc, fsst)
    elif pa.types.is_union(t):
        _encode_union(enc, fsst)
    else:
        raise NotImplementedError(f"unsupported arrow type {t} for column {name}")

    return enc.finish()


# stream kind -> zstd level override (None = codec default, level 3)
_STREAM_LEVEL = {"PRESENT": 1, "LENGTH": 1, "SECONDARY": 1}


def _is_binary_like(t: pa.DataType) -> bool:
    return (
        pa.types.is_string(t)
        or pa.types.is_large_string(t)
        or pa.types.is_binary(t)
        or pa.types.is_large_binary(t)
    )


def _encode_binary_like(enc: _ColumnEncoder, fsst_opt: bool | None) -> None:
    """String/binary: dict-vs-direct(-vs-FSST) auto-selection by stripe stats.

    Mirrors checkDictionaryEncoding's early 10k-row check + the 0.8
    threshold; extends the 2-way choice with an FSST candidate measured on
    a sample (the 3-way selection SURVEY.md §4 calls for).
    """
    arr, meta = enc.arr, enc.meta
    t = arr.type
    is_str = pa.types.is_string(t) or pa.types.is_large_string(t)
    nn = arr.drop_null() if arr.null_count else arr
    bin_arr = nn.cast(pa.large_binary())
    lengths = pa.compute.binary_length(bin_arr).to_numpy(zero_copy_only=False).astype(np.int64)
    n_nonnull = len(bin_arr)
    kind = "string" if is_str else "binary"

    # per-group bounds double as the column bounds (min-of-mins /
    # max-of-maxes) so the column never pays a second full min_max scan
    # — on web text that scan was ~19% of the whole stripe encode CPU
    group_bounds: list[tuple] = []

    def rg_string_stats(g: int) -> None:
        sl = enc.val_slice(g)
        mn = mx = None
        # binary columns carry no min/max (BinaryStatisticsImpl tracks
        # only the byte sum) — blob bounds are useless for pruning and
        # would bloat every footer's row index
        if is_str:
            sub = bin_arr.slice(sl.start, sl.stop - sl.start)
            if len(sub):
                mm = pa.compute.min_max(sub)
                mn, mx = mm["min"].as_py(), mm["max"].as_py()
                group_bounds.append((mn, mx))
        enc.set_rg_stats(
            g,
            stats_mod.string_stats(lengths[sl], enc.rg_nulls[g], mn, mx, kind=kind),
        )

    def column_min_max() -> tuple:
        if not group_bounds:
            return None, None
        return (
            min(b[0] for b in group_bounds),
            max(b[1] for b in group_bounds),
        )

    # early dictionary check on the first 10k non-null rows — strings
    # only: the reference's BinaryTreeWriter (org/apache/orc/impl/writer/
    # BinaryTreeWriter.java) is always DIRECT_V2, and hashing 10k blobs
    # just to reject the dictionary was ~40% of the html column's CPU
    if is_str:
        check = bin_arr.slice(0, min(DICT_CHECK_ROWS, n_nonnull))
        n_check_unique = len(check.unique())
        use_dict = dictionary.should_use_dictionary(n_check_unique, len(check))
    else:
        use_dict = False

    if use_dict and n_nonnull:
        # orc.dictionary.implementation analog: 'rbtree' (default) yields
        # the sorted DICTIONARY_V2 contract; 'hash' keeps first-occurrence
        # order and skips the sort pass (decode never assumes order)
        import os

        impl = os.environ.get("SPARC_DICT_IMPL", "rbtree")
        if impl == "hash":
            codes, uniques = dictionary.encode_unsorted(bin_arr)
        else:
            codes, uniques = dictionary.encode_sorted(bin_arr)
        meta["dict_impl"] = impl
        enc.whole_streams["DICTIONARY_DATA"] = b"".join(uniques)
        enc.whole_streams["LENGTH"] = rlev2.encode(
            np.fromiter((len(u) for u in uniques), dtype=np.int64, count=len(uniques)),
            signed=False,
        )
        enc.seg_streams["DATA"] = []
        for g in range(len(enc.bounds)):
            enc.seg_streams["DATA"].append(
                rlev2.encode(codes[enc.val_slice(g)], signed=False)
            )
            rg_string_stats(g)
        meta["encoding"] = "dict"
        meta["dict_size"] = len(uniques)
        mn, mx = (min(uniques), max(uniques)) if uniques else (None, None)
        meta["stats"] = stats_mod.string_stats(
            lengths, meta["n_nulls"], mn, mx, n_distinct=len(uniques), kind=kind
        ).to_dict()
        return

    # direct: concatenated bytes + LENGTH; try FSST on a sample.
    # FSST is a short-string codec (urls, text) — large binary payloads
    # (html blobs) go straight to the zstd block layer, which compresses
    # them nearly as well at ~50x the speed.
    data_buf = _concat_binary(bin_arr)
    byte_offs = np.concatenate(([0], np.cumsum(lengths))).astype(np.int64)
    avg_len = float(lengths.mean()) if lengths.size else 0.0
    fsst_on = _fsst_enabled() if fsst_opt is None else fsst_opt
    probe_min = 4096 if fsst_opt is True else FSST_PROBE_MIN
    table = None
    # Amortize the auto-gate probe: a REJECTED decision for a column is
    # cached per worker process (workers are reused across stripes), so
    # only the first stripe pays the ~0.2 s train+sample cost — on web
    # text the gate rejects every time and was 19% of kernel CPU.  An
    # accept is NOT cached: the trained table must fit each stripe's
    # sample, and accepts are rare enough that re-probing is cheap
    # relative to the win.
    probe_cached_reject = (
        fsst_opt is None and _FSST_REJECTS.get((enc.name, enc.codec), 0) > 0
    )
    if (
        fsst_on and not probe_cached_reject
        and len(data_buf) >= probe_min and is_str and avg_len <= FSST_MAX_AVG_LEN
    ):
        # Auto mode decides on the measured POST-codec sample win: with
        # the 4 MiB block chunk, a 128 KiB sample fits one codec window
        # both raw and FSST'd, so zstd(fsst(sample))/zstd(sample) is an
        # unbiased estimate of the full-stream ratio.  (With the old
        # 256 KiB chunks FSST looked better than it was: it packed ~2x
        # content per window, a win big windows now capture directly —
        # measured: url stream 1.41 MB @256K -> 0.51 MB @4M raw vs
        # 1.05 MB FSST'd, at ~1/10 the encode CPU.)  Forced mode
        # (fsst=True) keeps the optimistic pre-codec gate for callers
        # that want maximum compression attempts regardless of CPU.
        sample = bytes(data_buf[:FSST_SAMPLE])
        cand = fsst.train(sample)
        sample_enc = fsst.compress(sample, cand)
        if fsst_opt is True:
            if len(sample_enc) < FSST_MIN_WIN * len(sample):
                table = cand
        else:
            post_fsst = len(block.compress(sample_enc, enc.codec))
            post_raw = len(block.compress(sample, enc.codec))
            if post_fsst < FSST_POST_GATE * post_raw:
                table = cand
            else:
                _FSST_REJECTS[(enc.name, enc.codec)] = (
                    _FSST_REJECTS.get((enc.name, enc.codec), 0) + 1
                )

    enc.seg_streams["LENGTH"] = []
    enc.seg_streams["DATA"] = []
    for g in range(len(enc.bounds)):
        sl = enc.val_slice(g)
        enc.seg_streams["LENGTH"].append(rlev2.encode(lengths[sl], signed=False))
        # zero-copy memoryview slice straight into the block codec (FSST
        # needs bytes; the raw path never copies the column)
        chunk = data_buf[int(byte_offs[sl.start]) : int(byte_offs[sl.stop])]
        enc.seg_streams["DATA"].append(
            fsst.compress(bytes(chunk), table) if table is not None else chunk
        )
        rg_string_stats(g)
    if table is not None:
        enc.whole_streams["FSST_TABLE"] = table.serialize()
        meta["encoding"] = "direct_fsst"
    else:
        meta["encoding"] = "direct"
    mn, mx = column_min_max()
    meta["stats"] = stats_mod.string_stats(
        lengths, meta["n_nulls"], mn, mx, kind=kind
    ).to_dict()


def _encode_list_like(enc: _ColumnEncoder, fsst_opt: bool | None) -> None:
    """List / large_list / map: per-group LENGTH segments + whole-stripe
    child subtree (child value space does not align with parent groups;
    per-group child counts in the row index allow selective child
    slicing at decode).  Mirrors ListTreeWriter / MapTreeWriter."""
    arr, meta = enc.arr, enc.meta
    t = arr.type
    nn = arr.drop_null() if arr.null_count else arr
    is_map = pa.types.is_map(t)
    if is_map:
        lst = nn.cast(
            pa.list_(
                pa.struct(
                    [("key", t.key_type), ("value", t.item_type)]
                )
            )
        )
    else:
        lst = nn
    counts = lst.value_lengths().to_numpy(zero_copy_only=False).astype(np.int64)
    enc.seg_streams["LENGTH"] = []
    for g in range(len(enc.bounds)):
        sl = enc.val_slice(g)
        c = counts[sl]
        enc.seg_streams["LENGTH"].append(rlev2.encode(c, signed=False))
        enc.set_rg_stats(g, stats_mod.int_stats(c, enc.rg_nulls[g]))
        enc.row_index[g]["child_count"] = int(c.sum())
    child_streams, child_meta = encode_column(
        lst.flatten(), f"{enc.name}.item", enc.codec, fsst_opt, stride=None
    )
    for k, v in child_streams.items():
        enc.child_streams[f"CHILD0_{k}"] = v
    meta["encoding"] = "map" if is_map else "list"
    meta["child"] = child_meta
    meta["stats"] = stats_mod.int_stats(counts, arr.null_count).to_dict()


def _encode_struct(enc: _ColumnEncoder, fsst_opt: bool | None) -> None:
    """Struct: no data streams of its own — PRESENT + one recursive child
    subtree per field, full stripe length (StructTreeWriter.writeBatch
    semantics: children are written for every row; the struct validity
    mask governs reassembly)."""
    arr, meta = enc.arr, enc.meta
    t = arr.type
    children_meta = []
    for i in range(t.num_fields):
        field = t.field(i)
        child = arr.field(i)
        child_streams, child_meta = encode_column(
            child, f"{enc.name}.{field.name}", enc.codec, fsst_opt, stride=None
        )
        child_meta["field_name"] = field.name
        for k, v in child_streams.items():
            enc.child_streams[f"CHILD{i}_{k}"] = v
        children_meta.append(child_meta)
    for g in range(len(enc.bounds)):
        enc.set_rg_stats(
            g,
            stats_mod.ColumnStats(
                kind="struct",
                n_values=enc.rg_vals[g],
                n_nulls=enc.rg_nulls[g],
            ),
        )
    meta["encoding"] = "struct"
    meta["children"] = children_meta
    meta["stats"] = stats_mod.ColumnStats(
        kind="struct", n_values=len(arr) - arr.null_count, n_nulls=arr.null_count
    ).to_dict()


def _decimal_unscaled_int64(arr: pa.Array) -> np.ndarray:
    """Unscaled int64 values of a decimal128 array (precision <= 18, so
    the value IS the low 64-bit word; the high word is sign extension).
    Zero-copy read of the 16-byte little-endian storage."""
    nn = arr.drop_null() if arr.null_count else arr
    nn = nn.combine_chunks() if isinstance(nn, pa.ChunkedArray) else nn
    buf = nn.buffers()[1]
    words = np.frombuffer(buf, dtype=np.int64, count=2 * (nn.offset + len(nn)))
    return words.reshape(-1, 2)[nn.offset :, 0].copy()


def _decimal_unscaled_words(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Non-null unscaled values of a decimal128 array as (low u64,
    high i64) word pairs — zero-copy read of the 16-byte LE storage."""
    nn = arr.drop_null() if arr.null_count else arr
    nn = nn.combine_chunks() if isinstance(nn, pa.ChunkedArray) else nn
    buf = nn.buffers()[1]
    words = np.frombuffer(buf, dtype=np.uint64, count=2 * (nn.offset + len(nn)))
    words = words.reshape(-1, 2)[nn.offset :]
    return words[:, 0].copy(), words[:, 1].copy().view(np.int64)


def _build_decimal_big(
    lo: np.ndarray, hi: np.ndarray, valid: np.ndarray | None, n_rows: int,
    t: pa.DataType,
) -> pa.Array:
    full_lo, full_hi = lo, hi
    validity_buf = None
    null_count = 0
    if valid is not None:
        full_lo = np.zeros(n_rows, dtype=np.uint64)
        full_lo[valid] = lo
        full_hi = np.zeros(n_rows, dtype=np.int64)
        full_hi[valid] = hi
        validity_buf = pa.py_buffer(np.packbits(valid, bitorder="little"))
        null_count = int((~valid).sum())
    words = np.empty((n_rows, 2), dtype=np.uint64)
    words[:, 0] = full_lo
    words[:, 1] = full_hi.view(np.uint64)
    return pa.Array.from_buffers(
        t, n_rows, [validity_buf, pa.py_buffer(words)],
        null_count=null_count,
    )


def _build_decimal(
    vals: np.ndarray, valid: np.ndarray | None, n_rows: int, t: pa.DataType
) -> pa.Array:
    full = vals
    validity_buf = None
    null_count = 0
    if valid is not None:
        full = np.zeros(n_rows, dtype=np.int64)
        full[valid] = vals
        validity_buf = pa.py_buffer(np.packbits(valid, bitorder="little"))
        null_count = int((~valid).sum())
    words = np.empty((n_rows, 2), dtype=np.int64)
    words[:, 0] = full
    words[:, 1] = np.where(full < 0, -1, 0)  # sign-extended high word
    return pa.Array.from_buffers(
        t, n_rows, [validity_buf, pa.py_buffer(words)],
        null_count=null_count,
    )


def _encode_union(enc: _ColumnEncoder, fsst_opt: bool | None) -> None:
    """Dense union: byte-RLE TAG stream + per-variant child subtree in
    row order (UnionTreeWriter semantics — ORC's union stores each
    variant's values sequentially in tag order, so arbitrary Arrow
    offsets are normalized by a per-variant take)."""
    from ..kernels import byterle

    arr, meta = enc.arr, enc.meta
    t = arr.type
    if t.mode != "dense":
        raise NotImplementedError("sparse union unsupported (use dense)")
    tags = np.frombuffer(arr.buffers()[1], dtype=np.int8, count=len(arr),
                         offset=arr.offset)
    offsets = np.frombuffer(arr.buffers()[2], dtype=np.int32, count=len(arr),
                            offset=arr.offset * 4)
    # store the variant index (0..n-1), not the raw type code — codes are
    # metadata in the footer
    code_to_variant = {t.field(i).type_code if hasattr(t.field(i), "type_code")
                       else t.type_codes[i]: i for i in range(t.num_fields)}
    variants = np.array([code_to_variant[c] for c in tags.tolist()], dtype=np.uint8)
    enc.whole_streams["TAG"] = byterle.encode(variants)
    children_meta = []
    for i in range(t.num_fields):
        field = t.field(i)
        sel = np.flatnonzero(variants == i)
        child_vals = arr.field(i).take(pa.array(offsets[sel], pa.int32()))
        child_streams, child_meta = encode_column(
            child_vals, f"{enc.name}.{field.name}", enc.codec, fsst_opt, stride=None
        )
        child_meta["field_name"] = field.name
        child_meta["type_code"] = int(t.type_codes[i])
        for k, v in child_streams.items():
            enc.child_streams[f"CHILD{i}_{k}"] = v
        children_meta.append(child_meta)
    for g in range(len(enc.bounds)):
        enc.set_rg_stats(
            g,
            stats_mod.ColumnStats(kind="union", n_values=enc.rg_vals[g],
                                  n_nulls=enc.rg_nulls[g]),
        )
    meta["encoding"] = "union"
    meta["children"] = children_meta
    meta["stats"] = stats_mod.ColumnStats(
        kind="union", n_values=len(arr), n_nulls=0
    ).to_dict()


def _decode_union(streams: dict[str, bytes], meta: dict) -> pa.Array:
    from ..kernels import byterle

    codec = meta["codec"]
    n_rows = meta["n_rows"]
    variants = byterle.decode(block.decompress(streams["TAG"], codec), n_rows)
    children = []
    fields = []
    type_codes = []
    for i, child_meta in enumerate(meta["children"]):
        prefix = f"CHILD{i}_"
        child_streams = {
            k[len(prefix):]: v for k, v in streams.items() if k.startswith(prefix)
        }
        child = decode_column(child_streams, child_meta)
        children.append(child.combine_chunks() if isinstance(child, pa.ChunkedArray) else child)
        fields.append(pa.field(child_meta["field_name"], child.type))
        type_codes.append(child_meta["type_code"])
    # per-variant running count -> dense offsets in row order
    offsets = np.zeros(n_rows, dtype=np.int32)
    for i in range(len(children)):
        sel = variants == i
        offsets[sel] = np.arange(int(sel.sum()), dtype=np.int32)
    tags = np.array([type_codes[v] for v in variants.tolist()], dtype=np.int8)
    return pa.UnionArray.from_dense(
        pa.array(tags, pa.int8()),
        pa.array(offsets, pa.int32()),
        children,
        [f.name for f in fields],
        type_codes,
    )


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
    row_index_stride: int | None = ROW_INDEX_STRIDE,
) -> tuple[dict[tuple[str, str], bytes], dict]:
    """Encode all columns -> ({(column, kind): bytes}, stripe footer).

    ``bloom_columns`` adds a per-row-group BLOOM_FILTER_UTF8 stream for
    the named columns (point-lookup stripe + row-group pruning,
    SURVEY.md §2.6)."""
    import time

    from .. import runtime

    runtime.init()
    t_start = time.perf_counter()
    streams: dict[tuple[str, str], bytes] = {}
    footer = {"n_rows": batch.num_rows, "columns": []}
    if row_index_stride:
        footer["row_index_stride"] = row_index_stride
    for i, name in enumerate(batch.schema.names):
        col = batch.column(i)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        col_streams, col_meta = encode_column(
            col, name, codec, fsst, stride=row_index_stride
        )
        if bloom_columns and name in bloom_columns:
            from . import bloom as bloom_mod

            blobs = []
            for lo, hi in _row_bounds(len(col), row_index_stride):
                sub = col.slice(lo, hi - lo)
                sub = sub.drop_null() if sub.null_count else sub
                blobs.append(bloom_mod.build(sub.to_pandas()))
            blob = bloom_mod.pack_multi(blobs)
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
    streams: dict[str, bytes], meta: dict, row_groups: list[int] | None = None
) -> pa.Array:
    """Decode one column; ``row_groups`` selects row-group indices to
    materialize (None = all).  Selected groups only are decompressed and
    decoded when the column was written with segments; columns without
    segments (nested children, legacy stripes) decode whole and are
    row-sliced."""
    codec = meta["codec"]
    segments = meta.get("segments")
    if (
        segments is None
        or meta["encoding"] in ("struct", "union")
        or (
            row_groups is None
            # bool DATA is the one non-concatenable segment kind: it
            # packs n_vals bits (the non-null count) per segment, which
            # is byte-padded mid-stream when nulls make n_vals % 8 != 0
            and not (meta["encoding"] == "bool" and meta["n_nulls"])
        )
    ):
        # struct columns have no data streams of their own: children are
        # whole-stripe subtrees, so decode whole and row-slice (segment
        # concatenation stays byte-aligned because the stride is a
        # multiple of 8 — block chunks concatenate transparently).
        # row_groups=None (full scan, the hot path) also decodes whole:
        # every stream kind is self-delimiting under concatenation
        # (RLE runs, varints, byte-aligned bitfields, block chunks), so
        # one decompress + one array build replaces the per-group loop
        # and its final concat copy.
        arr = _decode_whole(streams, meta)
        if row_groups is not None:
            arr = _slice_row_groups(arr, meta, row_groups)
        return arr

    ri = meta["row_index"]
    rgs = list(row_groups) if row_groups is not None else list(range(len(ri)))
    bounds = {
        kind: np.concatenate(([0], np.cumsum(lens))).astype(np.int64)
        for kind, lens in segments.items()
    }

    def seg_raw(kind: str, g: int) -> bytes:
        b = bounds[kind]
        return block.decompress(streams[kind][int(b[g]) : int(b[g + 1])], codec)

    shared = {
        k: block.decompress(v, codec)
        for k, v in streams.items()
        if k not in segments
        and not k.startswith("CHILD")
        and k != "BLOOM_FILTER_UTF8"
    }

    t = _parse_type(meta)
    enc = meta["encoding"]

    # whole-stripe shared state per encoding
    dict_arrays = None
    if enc == "dict":
        nd = meta["dict_size"]
        dlens = rlev2.decode(shared["LENGTH"], nd, signed=False)
        dict_values = _dict_values_array(dlens, shared["DICTIONARY_DATA"], t)
    fsst_table = None
    if enc == "direct_fsst":
        fsst_table, _ = fsst.SymbolTable.deserialize(shared["FSST_TABLE"])
    child = None
    if enc in ("list", "map"):
        child_streams = {
            k[len("CHILD0_"):]: v for k, v in streams.items() if k.startswith("CHILD0_")
        }
        child = decode_column(child_streams, meta["child"])
        # child start offset of each group = cumsum of per-group counts
        child_offs = np.concatenate(
            ([0], np.cumsum([e["child_count"] for e in ri]))
        ).astype(np.int64)

    pieces: list[pa.Array] = []
    for g in rgs:
        n_rows = ri[g]["n_rows"]
        n_nulls = ri[g]["stats"]["n_nulls"]
        n_vals = n_rows - n_nulls
        valid = None
        if n_nulls:
            valid = bitfield.decode(seg_raw("PRESENT", g), n_rows)
        elif "PRESENT" in segments:
            pass  # group has no nulls; PRESENT segment is all-ones, skip
        if enc == "rlev2":
            vals = rlev2.decode(seg_raw("DATA", g), n_vals, signed=True)
            pieces.append(_scatter_numeric(vals, valid, n_rows, t))
        elif enc == "decimal64":
            vals = rlev2.decode(seg_raw("DATA", g), n_vals, signed=True)
            pieces.append(_build_decimal(vals, valid, n_rows, t))
        elif enc == "decimal_big":
            from ..kernels import bigdec

            lo, hi = bigdec.decode(seg_raw("DATA", g), n_vals)
            pieces.append(_build_decimal_big(lo, hi, valid, n_rows, t))
        elif enc == "timestamp_split":
            seconds = rlev2.decode(seg_raw("DATA", g), n_vals, signed=True)
            nanos = parse_nanos(rlev2.decode(seg_raw("SECONDARY", g), n_vals, signed=False))
            unit_scale = _TS_UNITS[meta["ts_unit"]]
            vals = (seconds + TS_BASE_SECONDS) * unit_scale + nanos // (
                1_000_000_000 // unit_scale
            )
            pieces.append(_scatter_numeric(vals, valid, n_rows, t))
        elif enc == "float_raw":
            np_t = np.float32 if t == pa.float32() else np.float64
            vals = np.frombuffer(seg_raw("DATA", g), dtype=np_t)
            pieces.append(_scatter_numeric(vals, valid, n_rows, t))
        elif enc == "bool":
            vals = bitfield.decode(seg_raw("DATA", g), n_vals)
            pieces.append(_scatter_numeric(vals, valid, n_rows, t))
        elif enc == "dict":
            codes = rlev2.decode(seg_raw("DATA", g), n_vals, signed=False)
            pieces.append(_dict_take(dict_values, codes, valid, n_rows))
        elif enc in ("direct", "direct_fsst"):
            row_lens = rlev2.decode(seg_raw("LENGTH", g), n_vals, signed=False)
            body = seg_raw("DATA", g)
            if fsst_table is not None:
                body = fsst.decompress(body, fsst_table)
            pieces.append(
                _build_binary(np.frombuffer(body, np.uint8), row_lens, valid, n_rows, t)
            )
        elif enc in ("list", "map"):
            counts = rlev2.decode(seg_raw("LENGTH", g), n_vals, signed=False)
            sub_child = child.slice(int(child_offs[g]), int(counts.sum()))
            pieces.append(_build_list(counts, sub_child, valid, n_rows, t))
        else:
            raise NotImplementedError(enc)
    if len(pieces) == 1:
        return pieces[0]
    return pa.concat_arrays([p.combine_chunks() if isinstance(p, pa.ChunkedArray) else p for p in pieces])


def _slice_row_groups(arr: pa.Array, meta: dict, row_groups: list[int]) -> pa.Array:
    ri = meta.get("row_index")
    if ri is None:
        return arr  # no index info: cannot prune, return whole
    offs = np.concatenate(([0], np.cumsum([e["n_rows"] for e in ri]))).astype(np.int64)
    pieces = [arr.slice(int(offs[g]), int(offs[g + 1] - offs[g])) for g in row_groups]
    if len(pieces) == 1:
        return pieces[0]
    return pa.concat_arrays(pieces)


def _decode_whole(streams: dict[str, bytes], meta: dict) -> pa.Array:
    """Single-segment (legacy / nested-child) decode path."""
    codec = meta["codec"]
    n_rows = meta["n_rows"]
    n_nulls = meta["n_nulls"]
    enc = meta["encoding"]
    if enc == "struct":
        return _decode_struct(streams, meta)
    if enc == "union":
        return _decode_union(streams, meta)
    t = _parse_type(meta)

    raw = {
        k: block.decompress(v, codec)
        for k, v in streams.items()
        # child streams decompress recursively; bloom streams are index
        # metadata, not data — never needed to reconstruct values
        if not k.startswith("CHILD") and k != "BLOOM_FILTER_UTF8"
    }

    valid = None
    if n_nulls:
        valid = bitfield.decode(raw["PRESENT"], n_rows)
    n_vals = n_rows - n_nulls

    if enc == "rlev2":
        vals = rlev2.decode(raw["DATA"], n_vals, signed=True)
        return _scatter_numeric(vals, valid, n_rows, t)
    if enc == "decimal64":
        vals = rlev2.decode(raw["DATA"], n_vals, signed=True)
        return _build_decimal(vals, valid, n_rows, t)
    if enc == "decimal_big":
        from ..kernels import bigdec

        lo, hi = bigdec.decode(raw["DATA"], n_vals)
        return _build_decimal_big(lo, hi, valid, n_rows, t)
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
        codes = rlev2.decode(raw["DATA"], n_vals, signed=False)
        values = _dict_values_array(dlens, raw["DICTIONARY_DATA"], t)
        return _dict_take(values, codes, valid, n_rows)
    if enc in ("direct", "direct_fsst"):
        row_lens = rlev2.decode(raw["LENGTH"], n_vals, signed=False)
        if enc == "direct_fsst":
            if "FSST_TABLE" in raw:
                table, _ = fsst.SymbolTable.deserialize(raw["FSST_TABLE"])
                data = np.frombuffer(fsst.decompress(raw["DATA"], table), np.uint8)
            else:  # legacy layout: table prefixed to DATA
                table, pos = fsst.SymbolTable.deserialize(raw["DATA"])
                data = np.frombuffer(fsst.decompress(raw["DATA"][pos:], table), np.uint8)
        else:
            data = np.frombuffer(raw["DATA"], np.uint8)
        return _build_binary(data, row_lens, valid, n_rows, t)
    if enc in ("list", "map"):
        counts = rlev2.decode(raw["LENGTH"], n_vals, signed=False)
        child_streams = {
            k[len("CHILD0_"):]: v for k, v in streams.items() if k.startswith("CHILD0_")
        }
        child = decode_column(child_streams, meta["child"])
        return _build_list(counts, child, valid, n_rows, t)
    raise NotImplementedError(enc)


def _decode_struct(streams: dict[str, bytes], meta: dict) -> pa.Array:
    codec = meta["codec"]
    n_rows = meta["n_rows"]
    n_nulls = meta["n_nulls"]
    valid = None
    if n_nulls:
        valid = bitfield.decode(block.decompress(streams["PRESENT"], codec), n_rows)
    children = []
    names = []
    for i, child_meta in enumerate(meta["children"]):
        prefix = f"CHILD{i}_"
        child_streams = {
            k[len(prefix):]: v for k, v in streams.items() if k.startswith(prefix)
        }
        children.append(decode_column(child_streams, child_meta))
        names.append(child_meta["field_name"])
    mask = pa.array(~valid) if valid is not None else None
    children = [
        c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in children
    ]
    return pa.StructArray.from_arrays(children, names=names, mask=mask)


def _build_list(
    counts: np.ndarray,
    child: pa.Array,
    valid: np.ndarray | None,
    n_rows: int,
    t: pa.DataType,
) -> pa.Array:
    if isinstance(child, pa.ChunkedArray):
        child = child.combine_chunks()
    if valid is None:
        offsets = np.concatenate(([0], np.cumsum(counts))).astype(np.int32)
        mask = None
    else:
        full = np.zeros(n_rows + 1, dtype=np.int32)
        full[1:][valid[:]] = counts
        np.cumsum(full, out=full)
        offsets = full
        mask = pa.array(~valid)
    if pa.types.is_map(t):
        out = pa.MapArray.from_arrays(
            pa.array(offsets, pa.int32()),
            child.field(0),
            child.field(1),
        )
        if mask is not None:
            # MapArray.from_arrays lacks a mask argument; rebuild validity
            validity = pa.py_buffer(np.packbits(valid, bitorder="little"))
            out = pa.Array.from_buffers(
                out.type,
                n_rows,
                [validity, out.buffers()[1]],
                null_count=int((~valid).sum()),
                children=[out.values],
            )
        return out
    return pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), child, mask=mask)


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
    if s.startswith("decimal128("):
        return pa.decimal128(meta["precision"], meta["scale"])
    if s.startswith("list<") or s.startswith("large_list<"):
        child = _parse_type(meta["child"])
        return pa.list_(child)
    if s.startswith("map<"):
        child = _parse_type(meta["child"])  # struct<key, value>
        return pa.map_(child.field(0).type, child.field(1).type)
    if s.startswith("struct<"):
        fields = [
            pa.field(cm["field_name"], _parse_type(cm)) for cm in meta["children"]
        ]
        return pa.struct(fields)
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


def _dict_values_array(dlens: np.ndarray, dblob, t: pa.DataType) -> pa.Array:
    """The stripe dictionary as an Arrow array, built ONCE per stripe —
    zero-copy over the concatenated DICTIONARY_DATA bytes (offsets in
    the target type's width, so downstream take() needs no cast)."""
    use_large = t in (pa.large_string(), pa.large_binary())
    off_dtype = np.int64 if use_large else np.int32
    doffs = np.concatenate(([0], np.cumsum(dlens))).astype(off_dtype)
    return pa.Array.from_buffers(
        t, len(dlens), [None, pa.py_buffer(doffs), pa.py_buffer(dblob)]
    )


def _dict_take(
    values: pa.Array, codes: np.ndarray, valid: np.ndarray | None, n_rows: int
) -> pa.Array:
    """Materialize dict rows via Arrow's C++ take kernel — ~10x faster
    than a numpy ragged gather (null slots become null indices, which
    take propagates)."""
    if valid is None:
        idx = pa.array(codes.astype(np.int32))
    else:
        full = np.zeros(n_rows, dtype=np.int32)
        full[valid] = codes.astype(np.int32)
        idx = pa.array(full, mask=~valid)
    return values.take(idx)


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
        validity_buf = pa.py_buffer(np.packbits(valid, bitorder="little"))
        null_count = int((~valid).sum())
    # py_buffer over the numpy arrays / decompressed views directly:
    # .tobytes() here was a full extra memcpy of every blob column's
    # payload per stripe (py_buffer holds a reference, so lifetime is
    # safe all the way down to the mmap'd stripe file)
    buffers = [
        validity_buf,
        pa.py_buffer(offsets),
        pa.py_buffer(data),
    ]
    return pa.Array.from_buffers(t, n_rows, buffers, null_count=null_count)


def pick_row_groups(
    footer: dict,
    predicate: tuple,
    streams: dict[tuple[str, str], bytes] | None = None,
) -> list[int] | None:
    """Evaluate a sarg predicate against each row group's stats; return
    selected group indices, or None when every group survives (decode
    whole).  The engine's ``RecordReaderImpl.pickRowGroups`` analog.

    With ``streams``, per-row-group bloom filters (BLOOM_FILTER_UTF8,
    packed per group) additionally refute =/IN leaves the min/max stats
    cannot — ``checkInBloomFilter`` (RecordReaderImpl.java:932-978)."""
    from . import bloom as bloom_mod, sarg as sarg_mod

    per_col = [
        (c["name"], c.get("row_index"))
        for c in footer["columns"]
    ]
    indexed = [(n, ri) for n, ri in per_col if ri]
    if not indexed:
        return None
    blooms: dict[str, list[bytes]] = {}
    if streams:
        for (cname, kind), blob in streams.items():
            if kind == "BLOOM_FILTER_UTF8":
                blooms[cname] = bloom_mod.unpack_multi(bytes(blob))
    n_rgs = len(indexed[0][1])
    selected = []
    for g in range(n_rgs):
        col_stats = {
            name: ri[g]["stats"] for name, ri in indexed if g < len(ri)
        }
        probes = {
            name: (lambda v, _b=blobs, _g=g: bloom_mod.might_contain_rg_list(_b, v, _g))
            for name, blobs in blooms.items()
        }
        if sarg_mod.keep(predicate, col_stats, probes or None):
            selected.append(g)
    if len(selected) == n_rgs:
        return None
    return selected


def decode_stripe(
    streams: dict[tuple[str, str], bytes],
    footer: dict,
    row_groups: list[int] | None = None,
) -> pa.Table:
    from .. import runtime

    runtime.init()
    cols = []
    names = []
    for col_meta in footer["columns"]:
        name = col_meta["name"]
        col_streams = {kind: data for (cname, kind), data in streams.items() if cname == name}
        cols.append(decode_column(col_streams, col_meta, row_groups=row_groups))
        names.append(name)
    return pa.table(dict(zip(names, cols)))
