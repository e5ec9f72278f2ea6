"""FSST-style symbol-table string compression (from the public paper:
Boncz, Neumann, Leis — "FSST: Fast Random Access String Compression",
VLDB 2020; see PAPERS.md "Adaptive Compression for Fast Scans on String
Columns").  NOT present in the reference (orc-core 2.2.2 has no FSST) —
required by the north rule for url/text columns; tested by self round-trip
plus size-win checks, since no reference oracle exists.

Scheme: up to 255 symbols of 1..8 bytes; output codes 0..254 index the
table, code 255 escapes one literal byte.  Training is a deterministic
iterative merge (singles → pairs → longer), scored by frequency × length.

Encode: vectorized longest-match precompute (mul-built big-endian window
keys + per-length direct/hash lookup tables — no 64-bit shifts and no
``searchsorted``, both ~100x slow on this host), then a BLOCK-ALIGNED
lockstep greedy walk: a token boundary is forced every ``_BLOCK`` bytes
(matches may not cross it), which makes every block's parse independent,
so all blocks advance one token per iteration as a single numpy gather
over a vector of block cursors — no Python-speed loop and no log-factor
pointer-doubling passes.  The alignment costs at most a few forced
escapes per block boundary (measured <0.1% of output size at 8 KiB
blocks, and the post-codec probe gate re-checks the win per column);
decode is parse-boundary-agnostic, so round-trip correctness is
unaffected.
Decode: fully vectorized, including escape resolution (every maximal run
of 0xFF bytes starts at a code position, so escapes sit at even offsets
within the run — provable from the 1-or-2-byte token structure).
"""

from __future__ import annotations

import numpy as np

ESCAPE = 255
MAX_SYMBOLS = 255
MAX_SYMBOL_LEN = 8
TRAIN_ITERS = 4
# 32 KiB training sample measured same-or-better post-zstd disk size as
# 64 KiB on web text/urls at half the training cost
SAMPLE_TARGET = 1 << 15

_HASH_BITS = 16
_HASH_SIZE = 1 << _HASH_BITS
_HASH_MASK = np.uint64(_HASH_SIZE - 1)
_HASH_MUL = np.uint64(0x9E3779B97F4A7C15)
_D16 = np.uint64(1 << 16)
_D32 = np.uint64(1 << 32)
_D48 = np.uint64(1 << 48)


def _mix16(k: np.ndarray) -> np.ndarray:
    """uint64 -> 16-bit slot, shift-free (floordiv/xor/mul are fast here)."""
    with np.errstate(over="ignore"):  # wrap-around multiply is intended
        x = k ^ (k // _D16) ^ (k // _D32) ^ (k // _D48)
        return (x * _HASH_MUL) & _HASH_MASK


def _mix16_scalar(key: int) -> int:
    """Python-int twin of :func:`_mix16` (bit-identical, no numpy overhead)."""
    x = key ^ (key >> 16) ^ (key >> 32) ^ (key >> 48)
    return (x * 0x9E3779B97F4A7C15) & 0xFFFF


class SymbolTable:
    """Immutable trained symbol table."""

    __slots__ = (
        "symbols", "sym_buf", "sym_off", "sym_len", "_dropped",
        "_h_div", "_h_key", "_h_code", "_h_len", "_t2", "_t1",
    )

    def __init__(self, symbols: list[bytes]):
        assert len(symbols) <= MAX_SYMBOLS
        self.symbols = symbols
        self.sym_len = np.zeros(256, dtype=np.int64)
        offsets = np.zeros(256, dtype=np.int64)
        buf = bytearray()
        for i, s in enumerate(symbols):
            offsets[i] = len(buf)
            self.sym_len[i] = len(s)
            buf += s
        self.sym_len[ESCAPE] = 1
        self.sym_off = offsets
        self.sym_buf = np.frombuffer(bytes(buf), dtype=np.uint8)
        # single-probe match tables (the real-FSST lookup shape): lengths
        # 3..8 share ONE hash table slotted by the first 3 bytes — each
        # slot holds (divisor 256^(8-L), full big-endian key, code, L) and
        # the lookup verifies window // divisor == key; lengths 1/2 are
        # direct-addressed.  One symbol per slot: on collision the LONGER
        # symbol wins (greedy quality), the loser is dropped from matching
        # (correctness unaffected — matching is optional).
        self._dropped = 0
        self._h_div = np.ones(_HASH_SIZE, dtype=np.uint64)
        self._h_key = np.zeros(_HASH_SIZE, dtype=np.uint64)
        self._h_code = np.full(_HASH_SIZE, ESCAPE, dtype=np.uint8)
        self._h_len = np.zeros(_HASH_SIZE, dtype=np.uint8)
        self._t2 = np.full(1 << 16, ESCAPE, dtype=np.uint8)
        self._t1 = np.full(1 << 8, ESCAPE, dtype=np.uint8)
        for code, s in enumerate(symbols):
            L = len(s)
            if L == 1:
                self._t1[s[0]] = code
            elif L == 2:
                self._t2[(s[0] << 8) | s[1]] = code
            else:
                key3 = (s[0] << 16) | (s[1] << 8) | s[2]
                slot = _mix16_scalar(key3)
                if self._h_len[slot] >= L:
                    self._dropped += 1
                    continue
                self._h_div[slot] = np.uint64(1 << (8 * (8 - L)))
                self._h_key[slot] = np.uint64(int.from_bytes(s, "big"))
                self._h_code[slot] = code
                self._h_len[slot] = L

    # -- serialization ------------------------------------------------------
    def serialize(self) -> bytes:
        out = bytearray([len(self.symbols)])
        for s in self.symbols:
            out.append(len(s))
            out += s
        return bytes(out)

    @classmethod
    def deserialize(cls, data, pos: int = 0) -> tuple["SymbolTable", int]:
        if not isinstance(data, bytes):
            data = memoryview(data).cast("B")  # unsigned view (pa.Buffer is 'b')
        n = data[pos]
        pos += 1
        symbols = []
        for _ in range(n):
            ln = data[pos]
            pos += 1
            symbols.append(bytes(data[pos : pos + ln]))
            pos += ln
        return cls(symbols), pos


def _window_keys(data: np.ndarray) -> np.ndarray:
    """uint64 big-endian 8-byte window starting at each position.

    Multiply-accumulate (8 vector ops) — no shifts, no (n,8) matrix.
    """
    n = data.size
    padded = np.concatenate([data, np.zeros(8, dtype=np.uint8)])
    key = np.zeros(n, dtype=np.uint64)
    p = np.uint64(1)
    for j in range(7, -1, -1):
        key += padded[j : j + n].astype(np.uint64) * p
        if j:
            p = p * np.uint64(256)
    return key


_D40 = np.uint64(1 << 40)
_D48_ = np.uint64(1 << 48)


def _find_matches(table: SymbolTable, data: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-position symbol match: (match_len, match_code); len 0 = none.

    Single hash probe for lengths 3..8 (slot by the first 3 bytes, full
    key verified via one divide+compare), then direct len-2/len-1 tables
    — ~6 gathers total instead of one pass per symbol length."""
    n = data.size
    if n == 0:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.uint8)
    key8 = _window_keys(data)
    key3 = key8 // _D40
    slot = _mix16(key3)
    ln = table._h_len[slot].astype(np.int64)
    hit3 = (ln > 0) & (key8 // table._h_div[slot] == table._h_key[slot])
    rem = n - np.arange(n, dtype=np.int64)
    hit3 &= ln <= rem
    c2 = table._t2[key8 // _D48_]
    hit2 = ~hit3 & (c2 != ESCAPE) & (rem >= 2)
    c1 = table._t1[key3 // np.uint64(1 << 16)]
    hit1 = ~hit3 & ~hit2 & (c1 != ESCAPE)
    match_len = np.where(hit3, ln, np.where(hit2, 2, np.where(hit1, 1, 0)))
    match_code = np.where(hit3, table._h_code[slot], np.where(hit2, c2, c1))
    return match_len, match_code.astype(np.uint8)


_SEG = 1 << 17  # compress segment: keeps all matcher temporaries cache-resident
_BLOCK = 1 << 9  # parse-alignment block (must divide _SEG): many lockstep
# lanes (n/512) keep each walk iteration's numpy calls amortized; the
# boundary cost (a clamped match falls back to a 1-byte symbol or an
# escape) measured ~0.1-0.3% of output size, re-checked per column by the
# post-codec probe gate
_WALK_LOCKSTEP_MIN = 4096  # below this the scalar walk beats vector setup


def _walk_lockstep(
    arr: np.ndarray, lens: np.ndarray, codes: np.ndarray, n: int
) -> bytes:
    """Block-aligned lockstep greedy walk over the whole value.

    ``lens``/``codes`` are the block-clamped per-position match tables
    (uint8): no match crosses a ``_BLOCK`` boundary, so every block's
    parse is independent and all n/_BLOCK blocks advance one token per
    iteration — a handful of compacted numpy gathers per step, ~15
    element-ops per emitted token total.  This replaces the old
    pointer-doubling walk whose log2(path) full-array passes cost ~50
    element-ops per input BYTE.  Two phases: count each block's output
    bytes (so each block's tokens can be emitted straight into its final
    output slice, no reordering sort), then emit."""
    starts = np.arange(0, n, _BLOCK, dtype=np.int64)
    ends = np.minimum(starts + _BLOCK, n)
    m = starts.size
    widths = np.zeros(m, dtype=np.int64)
    pos = starts.copy()
    ai = np.flatnonzero(pos < ends)
    while ai.size:
        p = pos[ai]
        ln = lens[p].astype(np.int64)
        esc = ln == 0
        widths[ai] += 1 + esc
        pos[ai] = p + np.where(esc, 1, ln)
        ai = ai[pos[ai] < ends[ai]]
    out_starts = np.concatenate(([0], np.cumsum(widths)))
    outb = np.empty(int(out_starts[-1]), dtype=np.uint8)
    pos = starts.copy()
    cur = out_starts[:-1].copy()
    ai = np.flatnonzero(pos < ends)
    while ai.size:
        p = pos[ai]
        ln = lens[p].astype(np.int64)
        esc = ln == 0
        c = cur[ai]
        outb[c] = np.where(esc, np.uint8(ESCAPE), codes[p])
        if esc.any():
            outb[c[esc] + 1] = arr[p[esc]]
        cur[ai] = c + 1 + esc
        pos[ai] = p + np.where(esc, 1, ln)
        ai = ai[pos[ai] < ends[ai]]
    return outb.tobytes()


def compress(data: bytes, table: SymbolTable) -> bytes:
    """Greedy longest-match encode: segmented matcher + lockstep walk.

    Matching runs per ~128 KiB segment (with 7-byte lookahead so the
    matcher sees full windows near the boundary) so the ~10 vector
    passes of the matcher hit L2 instead of streaming multi-MB
    temporaries through DRAM — at 32-way parallelism the full-array
    version is memory-bandwidth bound, not compute bound.  The per-
    position match tables are block-clamped as they are produced (a
    match that would cross a ``_BLOCK`` boundary falls back to the
    position's 1-byte symbol, or an escape when none exists), then one
    lockstep walk emits the whole value — see :func:`_walk_lockstep`."""
    n = len(data)
    arr = np.frombuffer(data, dtype=np.uint8)
    if n < _WALK_LOCKSTEP_MIN:
        mlen, mcode = _find_matches(table, arr)
        lens = mlen.tolist()
        codes = mcode.tolist()
        out = bytearray()
        append = out.append
        i = 0
        while i < n:
            ln = lens[i]
            if ln:
                append(codes[i])
                i += ln
            else:
                append(ESCAPE)
                append(data[i])
                i += 1
        return bytes(out)
    lens_full = np.empty(n, dtype=np.uint8)
    codes_full = np.empty(n, dtype=np.uint8)
    for pos in range(0, n, _SEG):
        end = min(pos + _SEG, n)
        seg = arr[pos : min(end + MAX_SYMBOL_LEN - 1, n)]
        mlen, mcode = _find_matches(table, seg)
        span = end - pos
        mlen = mlen[:span]
        # block-clamp (block grid is absolute, and _SEG % _BLOCK == 0 so
        # the relative grid coincides): crossing matches fall back to the
        # position's 1-byte symbol when the table has one, else escape
        rel = np.arange(span, dtype=np.int64)
        bend = np.minimum((rel // _BLOCK + 1) * _BLOCK, span)
        viol = rel + mlen > bend
        if viol.any():
            rescue = table._t1[seg[:span][viol]]
            mlen = np.where(viol, 0, mlen)
            mcode = mcode[:span].copy()
            mlen[viol] = np.where(rescue != ESCAPE, 1, 0)
            mcode[viol] = rescue
            lens_full[pos:end] = mlen.astype(np.uint8)
            codes_full[pos:end] = mcode
        else:
            lens_full[pos:end] = mlen.astype(np.uint8)
            codes_full[pos:end] = mcode[:span]
    return _walk_lockstep(arr, lens_full, codes_full, n)


def decompress(enc: bytes, table: SymbolTable) -> bytes:
    if len(enc) == 0:  # len(), not truthiness: enc may be ndarray/Buffer
        return b""
    data = np.frombuffer(enc, dtype=np.uint8)
    # resolve escapes: a 255 at a code position escapes the next byte.
    # Every maximal run of 0xFF bytes starts at a code position (the byte
    # before a run is a non-0xFF literal or non-escape code, so the next
    # position is a code), hence escapes sit at even offsets within runs.
    is_literal = np.zeros(data.size + 1, dtype=bool)
    pos = np.flatnonzero(data == ESCAPE)
    if pos.size:
        run_start = np.concatenate(([True], np.diff(pos) > 1))
        first = pos[run_start][np.cumsum(run_start) - 1]
        esc = pos[((pos - first) & 1) == 0]
        is_literal[esc + 1] = True
    is_literal = is_literal[:-1]
    codes = data[~is_literal]
    out_lens = table.sym_len[codes]
    total = int(out_lens.sum())
    out = np.empty(total, dtype=np.uint8)
    out_starts = np.concatenate(([0], np.cumsum(out_lens)))[:-1]
    esc = codes == ESCAPE
    # escape codes emit their literal byte
    if esc.any():
        code_pos = np.flatnonzero(~is_literal)
        out[out_starts[esc]] = data[code_pos[esc] + 1]
    # symbol codes: ragged gather from the symbol buffer
    sym = ~esc
    if sym.any():
        s_lens = out_lens[sym]
        s_out = out_starts[sym]
        s_src = table.sym_off[codes[sym]]
        reps = np.repeat(np.arange(s_lens.size), s_lens)
        intra = np.arange(int(s_lens.sum()), dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(s_lens)))[:-1], s_lens
        )
        out[s_out[reps] + intra] = table.sym_buf[s_src[reps] + intra]
    return out.tobytes()


# ---------------------------------------------------------------------------
# training
# ---------------------------------------------------------------------------


def train(sample: bytes) -> SymbolTable:
    """Deterministic iterative trainer over a byte sample."""
    if len(sample) > SAMPLE_TARGET:
        # evenly spaced 1 KiB slices, deterministic
        step = len(sample) // (SAMPLE_TARGET // 1024)
        parts = [sample[i : i + 1024] for i in range(0, len(sample), max(step, 1024))]
        sample = b"".join(parts)[:SAMPLE_TARGET]
    arr = np.frombuffer(sample, dtype=np.uint8)
    if arr.size == 0:
        return SymbolTable([])

    # iteration 0: most frequent single bytes
    counts = np.bincount(arr, minlength=256)
    present = np.flatnonzero(counts)
    order = sorted(present.tolist(), key=lambda b: (-int(counts[b]), b))
    symbols = [bytes([b]) for b in order[:MAX_SYMBOLS]]
    table = SymbolTable(symbols)

    for _ in range(TRAIN_ITERS):
        gains = _count_gains(table, arr)
        ranked = sorted(gains.items(), key=lambda kv: (-kv[1], kv[0]))
        symbols = [s for s, _ in ranked[:MAX_SYMBOLS]]
        table = SymbolTable(symbols)
    return table


def _count_gains(table: SymbolTable, arr: np.ndarray) -> dict[bytes, int]:
    """Parse sample with current table; score symbols and merged pairs."""
    mlen, mcode = _find_matches(table, arr)
    lens = mlen.tolist()
    codes = mcode.tolist()
    n = arr.size
    raw = arr.tobytes()
    gains: dict[bytes, int] = {}
    i = 0
    prev_sym: bytes | None = None
    while i < n:
        ln = lens[i]
        if ln:
            s = table.symbols[codes[i]]
        else:
            s = raw[i : i + 1]
            ln = 1
        gains[s] = gains.get(s, 0) + ln
        if prev_sym is not None and len(prev_sym) + ln <= MAX_SYMBOL_LEN:
            merged = prev_sym + s
            gains[merged] = gains.get(merged, 0) + len(merged)
        prev_sym = s
        i += ln
    # always keep single bytes competitive (escapes cost 2x)
    counts = np.bincount(arr, minlength=256)
    for b in np.flatnonzero(counts).tolist():
        s = bytes([b])
        gains[s] = gains.get(s, 0) + int(counts[b])
    return gains


# ---------------------------------------------------------------------------
# convenience: one-shot stream format  [table][u32 raw_len][codes]
# ---------------------------------------------------------------------------


def compress_with_table(data: bytes, table: SymbolTable | None = None) -> bytes:
    if table is None:
        table = train(data)
    body = compress(data, table)
    return table.serialize() + body


def decompress_with_table(enc: bytes) -> bytes:
    table, pos = SymbolTable.deserialize(enc)
    return decompress(enc[pos:], table)
