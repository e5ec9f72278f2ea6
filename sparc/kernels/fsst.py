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
keys split into two uint32 halves + per-length direct/hash lookup tables
with masked-prefix verification — uint32 ops measure ~2x uint64 on this
host, and the masked compare replaces a vector integer divide, numpy's
slowest element op here; no ``searchsorted``, ~100x slow on this host),
then a BLOCK-ALIGNED
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
# low 16 bits of the 64-bit golden ratio: only the product's low half
# survives the & 0xFFFF, and (x*M) mod 2^16 == ((x mod 2^16)*(M mod 2^16))
# mod 2^16, so the 16-bit multiplier is bit-identical to the old 64-bit
# one while staying inside uint32 vector arithmetic
_HASH_MUL16 = np.uint32(0x7C15)
_MASK16 = np.uint32(0xFFFF)

# L-byte big-endian prefix masks for the two uint32 window halves,
# indexed by symbol length 0..8 (0 = empty slot: mask 0, gated by len)
_LUT_MHI = np.array(
    [(0xFFFFFFFF << (8 * max(4 - L, 0))) & 0xFFFFFFFF for L in range(9)],
    dtype=np.uint32,
)
_LUT_MLO = np.array(
    [(0xFFFFFFFF << (8 * min(8 - L, 4))) & 0xFFFFFFFF for L in range(9)],
    dtype=np.uint32,
)
_LUT_MHI[0] = _LUT_MLO[0] = 0


def _mix16(key3: np.ndarray) -> np.ndarray:
    """24-bit first-3-bytes key (uint32) -> 16-bit slot, all uint32 ops."""
    x = key3 ^ (key3 >> np.uint32(16))
    return ((x & _MASK16) * _HASH_MUL16) & _MASK16


def _mix16_scalar(key3: int) -> int:
    """Python-int twin of :func:`_mix16` (bit-identical, no numpy overhead)."""
    x = key3 ^ (key3 >> 16)
    return ((x & 0xFFFF) * 0x7C15) & 0xFFFF


class SymbolTable:
    """Immutable trained symbol table."""

    __slots__ = (
        "symbols", "sym_buf", "sym_off", "sym_len", "_dropped",
        "_h_khi", "_h_klo", "_h_lc",
        "_h_code", "_h_len", "_t2", "_t1",
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
        # slot holds the symbol's zero-padded 8-byte key split into two
        # big-endian uint32 halves plus a packed (len<<8)|code word, and
        # the lookup verifies (window & mask) == key per half, with the
        # L-byte prefix masks looked up from a 9-entry cache-resident LUT
        # on the gathered length (3 random gathers into the 64K tables
        # per probe instead of 6; no vector integer divide — numpy's
        # slowest element op on this host); lengths 1/2 are
        # direct-addressed.  One symbol per slot: on collision the LONGER
        # symbol wins (greedy quality), the loser is dropped from
        # matching (correctness unaffected — matching is optional).
        self._dropped = 0
        self._h_khi = np.zeros(_HASH_SIZE, dtype=np.uint32)
        self._h_klo = np.zeros(_HASH_SIZE, dtype=np.uint32)
        # empty slot: len 0 gates the hit (khi/klo of empty slots are
        # never trusted alone), code defaults to ESCAPE
        self._h_lc = np.full(_HASH_SIZE, ESCAPE, dtype=np.uint16)
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
                padded = s + b"\x00" * (8 - L)
                mhi = (0xFFFFFFFF << (8 * max(4 - L, 0))) & 0xFFFFFFFF
                mlo = (0xFFFFFFFF << (8 * min(8 - L, 4))) & 0xFFFFFFFF
                self._h_khi[slot] = int.from_bytes(padded[:4], "big") & mhi
                self._h_klo[slot] = int.from_bytes(padded[4:], "big") & mlo
                self._h_lc[slot] = (L << 8) | code
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


def _half_keys(data: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Big-endian 8-byte window at each position as two uint32 halves
    (bytes 0..3, bytes 4..7), zero-padded past the end.

    One uint32 astype + 6 mul-adds over VIEWS of the padded array — no
    uint64 arithmetic and no (n,8) matrix."""
    n = data.size
    padded = np.concatenate([data, np.zeros(8, dtype=np.uint8)]).astype(np.uint32)
    s256 = np.uint32(256)
    hi = padded[0:n] * s256
    hi += padded[1 : 1 + n]
    hi *= s256
    hi += padded[2 : 2 + n]
    hi *= s256
    hi += padded[3 : 3 + n]
    lo = padded[4 : 4 + n] * s256
    lo += padded[5 : 5 + n]
    lo *= s256
    lo += padded[6 : 6 + n]
    lo *= s256
    lo += padded[7 : 7 + n]
    return hi, lo


def _find_matches(table: SymbolTable, data: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-position symbol match: (match_len uint8, match_code uint8);
    len 0 = none.

    Single hash probe for lengths 3..8 (slot by the first 3 bytes, full
    key verified via two masked uint32 compares), then direct len-2/
    len-1 tables — ~7 gathers total instead of one pass per symbol
    length, and the hit lanes combine by disjoint-mask multiply-add
    (uint8) instead of chained ``np.where`` (the wheres were ~26% of the
    matcher wall on this host)."""
    n = data.size
    if n == 0:
        return np.zeros(0, dtype=np.uint8), np.zeros(0, dtype=np.uint8)
    hi, lo = _half_keys(data)
    slot = _mix16(hi >> np.uint32(8))
    lc = table._h_lc[slot]
    ln8 = (lc >> np.uint16(8)).astype(np.uint8)
    code3 = lc.astype(np.uint8)  # low byte of the packed (len<<8)|code
    hit3 = (
        (ln8 > 0)
        & ((hi & _LUT_MHI[ln8]) == table._h_khi[slot])
        & ((lo & _LUT_MLO[ln8]) == table._h_klo[slot])
    )
    c2 = table._t2[hi >> np.uint32(16)]
    hit2 = ~hit3 & (c2 != ESCAPE)
    c1 = table._t1[data]
    hit1 = ~hit3 & ~hit2 & (c1 != ESCAPE)
    # tail fix (last <=8 positions): the zero padding can fabricate a
    # match for symbols with trailing NUL bytes, and len-2 needs 2 real
    # bytes — mask any match longer than the remaining bytes
    k = min(8, n)
    tail_rem = (n - np.arange(n - k, n)).astype(np.uint8)
    hit3[n - k :] &= ln8[n - k :] <= tail_rem
    hit2[n - 1 :] = False
    hit1[n - k :] |= (~hit3[n - k :]) & (~hit2[n - k :]) & (c1[n - k :] != ESCAPE)
    h3 = hit3.view(np.uint8)
    h2 = hit2.view(np.uint8)
    h1 = hit1.view(np.uint8)
    match_len = h3 * ln8
    match_len += h2 + h2  # disjoint lanes: at most one term is nonzero
    match_len += h1
    match_code = h3 * code3
    match_code += h2 * c2
    match_code += h1 * c1
    return match_len, match_code


_SEG = 1 << 17  # compress segment: keeps all matcher temporaries cache-resident
_BLOCK = 1 << 9  # parse-alignment block (must divide _SEG): many lockstep
# lanes (n/512) keep each walk iteration's numpy calls amortized; the
# boundary cost (a clamped match falls back to a 1-byte symbol or an
# escape) measured ~0.1-0.3% of output size, re-checked per column by the
# post-codec probe gate
_WALK_LOCKSTEP_MIN = 4096  # below this the scalar walk beats vector setup

# reused per-process scratch (fresh multi-MB temporaries pay this host's
# first-touch-fault tax on EVERY call; a ragged-gather np.repeat
# compaction over fresh 24 MB temporaries measured 0.28 s/call vs ~0.01 s
# for a reused broadcast-mask compaction of the same output)
_BUFS: dict[str, np.ndarray] = {}
_OFFS_W = np.arange(2 * _BLOCK, dtype=np.int64)


def _scratch_buf(name: str, size: int, dtype) -> np.ndarray:
    buf = _BUFS.get(name)
    if buf is None or buf.size < size:
        buf = np.empty(max(size, 1 << 20), dtype=dtype)
        _BUFS[name] = buf
    return buf[:size]


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
    element-ops per input BYTE.  ONE traversal: each block emits into
    its own 2*_BLOCK scratch slice (the worst case, all escapes), then a
    broadcast-mask boolean compaction joins the slices — half the
    gathers of the old count-then-emit two-phase walk, over reused
    buffers (see ``_scratch_buf``)."""
    starts = np.arange(0, n, _BLOCK, dtype=np.int64)
    ends = np.minimum(starts + _BLOCK, n)
    m = starts.size
    w = 2 * _BLOCK
    scratch = _scratch_buf("walk_scratch", m * w, np.uint8)
    mask = _scratch_buf("walk_mask", m * w, bool).reshape(m, w)
    base = np.arange(m, dtype=np.int64) * w
    pos = starts.copy()
    cur = base.copy()
    ai = np.flatnonzero(pos < ends)
    while ai.size:
        p = pos[ai]
        ln = lens[p].astype(np.int64)
        esc = ln == 0
        c = cur[ai]
        scratch[c] = np.where(esc, np.uint8(ESCAPE), codes[p])
        if esc.any():
            scratch[c[esc] + 1] = arr[p[esc]]
        cur[ai] = c + 1 + esc
        pos[ai] = p + np.where(esc, 1, ln)
        ai = ai[pos[ai] < ends[ai]]
    widths = cur - base
    np.less(_OFFS_W[None, :], widths[:, None], out=mask)
    return scratch[mask.reshape(-1)].tobytes()


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


def _clamped_match(
    table: SymbolTable, arr: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Per-position match tables with matches clamped at ``_BLOCK``
    boundaries (the same rule :func:`compress` applies per segment), so a
    block-aligned lockstep parse of the result is a valid greedy parse."""
    n = arr.size
    mlen, mcode = _find_matches(table, arr)
    rel = np.arange(n, dtype=np.int64)
    bend = np.minimum((rel // _BLOCK + 1) * _BLOCK, n)
    viol = rel + mlen > bend
    if viol.any():
        rescue = table._t1[arr[viol]]
        mlen = np.where(viol, 0, mlen).astype(np.uint8)
        mcode = mcode.copy()
        mlen[viol] = np.where(rescue != ESCAPE, 1, 0)
        mcode[viol] = rescue
    return mlen, mcode


def _parse_positions(lens: np.ndarray, n: int) -> np.ndarray:
    """Token start positions of the block-aligned greedy parse, in input
    order — the same lockstep advance as :func:`_walk_lockstep`, emitting
    positions instead of output bytes (training-size inputs, so plain
    allocations: <=0.5 MB of scratch at the 32 KiB sample cap)."""
    starts = np.arange(0, n, _BLOCK, dtype=np.int64)
    ends = np.minimum(starts + _BLOCK, n)
    m = starts.size
    w = _BLOCK  # worst case: one token per input byte
    posbuf = np.zeros(m * w, dtype=np.int64)
    base = np.arange(m, dtype=np.int64) * w
    pos = starts.copy()
    cur = np.zeros(m, dtype=np.int64)
    ai = np.flatnonzero(pos < ends)
    while ai.size:
        p = pos[ai]
        posbuf[base[ai] + cur[ai]] = p
        ln = lens[p].astype(np.int64)
        cur[ai] += 1
        pos[ai] = p + np.where(ln == 0, 1, ln)
        ai = ai[pos[ai] < ends[ai]]
    mask = np.arange(w, dtype=np.int64)[None, :] < cur[:, None]
    return posbuf[mask.reshape(-1)]


def _count_gains(table: SymbolTable, arr: np.ndarray) -> dict[bytes, int]:
    """Parse sample with current table; score symbols and merged pairs.

    Vectorized: block-aligned lockstep parse -> token id array (code, or
    256+byte for escapes) -> bincount for symbol gains and np.unique over
    adjacent-id pairs for merge candidates.  Python touches only the
    UNIQUE ids/pairs (bounded by table size squared), never the token
    stream — the old scalar walk was ~1 us/byte, 28% of a forced-FSST
    stripe encode."""
    n = arr.size
    gains: dict[bytes, int] = {}
    if n == 0:
        return gains
    mlen, mcode = _clamped_match(table, arr)
    tok = _parse_positions(mlen, n)
    ln = mlen[tok].astype(np.int64)
    esc = ln == 0
    ids = np.where(esc, arr[tok].astype(np.int64) + 256, mcode[tok].astype(np.int64))
    tlen = np.where(esc, 1, ln)

    def _sym(i: int) -> bytes:
        return table.symbols[i] if i < 256 else bytes([i - 256])

    counts = np.bincount(ids, minlength=512)
    for i in np.flatnonzero(counts).tolist():
        s = _sym(i)
        gains[s] = gains.get(s, 0) + int(counts[i]) * len(s)
    if ids.size >= 2:
        ok = (tlen[:-1] + tlen[1:]) <= MAX_SYMBOL_LEN
        keys = ids[:-1][ok] * 512 + ids[1:][ok]
        uk, uc = np.unique(keys, return_counts=True)
        for k, c in zip(uk.tolist(), uc.tolist()):
            merged = _sym(k >> 9) + _sym(k & 511)
            gains[merged] = gains.get(merged, 0) + int(c) * len(merged)
    # always keep single bytes competitive (escapes cost 2x)
    counts_b = np.bincount(arr, minlength=256)
    for b in np.flatnonzero(counts_b).tolist():
        s = bytes([b])
        gains[s] = gains.get(s, 0) + int(counts_b[b])
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
