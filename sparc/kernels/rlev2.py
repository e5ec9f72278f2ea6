"""ORC RLEv2 integer coding: SHORT_REPEAT / DIRECT / PATCHED_BASE / DELTA.

Wire format is the reference's RLEv2 stream format
(``org/apache/orc/impl/RunLengthIntegerWriterV2.java`` — sub-encoding writers
:188-411, ``determineEncoding`` :433-559, ``preparePatchedBlob`` :571-668;
reader ``RunLengthIntegerReaderV2.java:87-316``), with the same constants
(MAX_SCOPE=512, MIN_REPEAT=3, MAX_SHORT_REPEAT_LENGTH=10, BASE_VALUE_LIMIT=2^56)
and the same header layouts, so sizes track the reference closely.

The *encoder structure* is deliberately different (SURVEY.md §7: semantics-
equal, structure-different): instead of a per-value state machine we segment
the whole array with vectorized delta-run detection, then choose the cheapest
sub-encoding per segment by *computed size* (which can only tie or beat the
reference's heuristic).  Python-level work is O(#segments), never O(n).

All values are treated as two's-complement int64 (like the reference's
``long``); ``signed`` controls zigzag in SHORT_REPEAT/DIRECT and the base
varint in DELTA.
"""

from __future__ import annotations

import numpy as np

from . import bitpack
from .util import (
    _WIDTH_TO_CODE,
    CLOSEST_FIXED_BITS,
    I64,
    U64,
    bits_required,
    closest_fixed_bits,
    decode_bit_width,
    encode_bit_width,
    percentile_bits,
    read_vslong,
    read_vulong,
    to_signed64,
    write_vslong,
    write_vulong,
    zigzag_decode,
    zigzag_encode,
)

MAX_SCOPE = 512
MIN_REPEAT = 3
MAX_SHORT_REPEAT_LENGTH = 10
BASE_VALUE_LIMIT = 1 << 56

# Minimum fixed-delta run length worth breaking a variable segment for.
# The reference extracts runs at MIN_REPEAT=3 because its per-value state
# machine is free in Java; for vectorized encoding, extracting tiny runs
# fragments segments (hurting both throughput and, usually, size — short
# runs compress better inside a 512-value DELTA/DIRECT chunk than as
# standalone 2-byte-header runs).  Runs shorter than this stay inline.
MIN_EXTRACT_RUN = 16

_SHORT_REPEAT, _DIRECT, _PATCHED_BASE, _DELTA = 0, 1, 2, 3


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------


def encode(values: np.ndarray, signed: bool, aligned: bool = False) -> bytes:
    """Encode an int64 array to an RLEv2 byte stream."""
    v = np.ascontiguousarray(values, dtype=I64)
    n = v.size
    out = bytearray()
    if n == 0:
        return b""

    # --- vectorized segmentation ------------------------------------------
    # deltas in wrap-safe uint64; a delta run of length L covers L+1 values
    u = v.view(U64)
    d = u[1:] - u[:-1] if n > 1 else np.empty(0, dtype=U64)
    # overflow-safe check: delta fits in int64 when computed exactly
    # (reference guards with isSafeSubtract); runs with unsafe deltas are
    # excluded from DELTA encoding
    d_i = d.view(I64)
    safe = ((v[1:] >= v[:-1]) & (d_i >= 0)) | ((v[1:] < v[:-1]) & (d_i < 0))

    # maximal runs of equal delta
    if d.size:
        change = np.flatnonzero(d[1:] != d[:-1]) + 1
        rstarts = np.concatenate(([0], change))  # index into d
        rends = np.concatenate((change, [d.size]))
        rlens = rends - rstarts  # in deltas; values covered = rlens + 1
        good = (rlens + 1 >= MIN_EXTRACT_RUN) & safe[rstarts]
    else:
        rstarts = rends = rlens = np.empty(0, dtype=np.int64)
        good = np.empty(0, dtype=bool)

    good_idx = np.flatnonzero(good)
    pos = 0
    for gi in good_idx.tolist():
        s = int(rstarts[gi])  # first value index of the run
        e = int(rends[gi])  # last value index is e (d indices s..e-1)
        start = max(pos, s)
        if e - start + 1 < MIN_EXTRACT_RUN:
            continue
        if start > pos:
            _encode_variable(out, v[pos:start], signed, aligned)
        _encode_fixed_delta_run(out, v[start : e + 1], int(d_i[s]), signed)
        pos = e + 1
    if pos < n:
        _encode_variable(out, v[pos:n], signed, aligned)
    return bytes(out)


def _encode_fixed_delta_run(
    out: bytearray, run: np.ndarray, delta: int, signed: bool
) -> None:
    """Emit a fixed-delta run (len>=3) as SHORT_REPEAT/DELTA, split at 512."""
    n = run.size
    pos = 0
    while pos < n:
        chunk = min(n - pos, MAX_SCOPE)
        if n - pos - chunk in (1, 2):  # avoid stranding a <3 tail
            chunk = n - pos - MIN_REPEAT if n - pos - MIN_REPEAT >= MIN_REPEAT else chunk
            chunk = max(chunk, MIN_REPEAT)
        sub = run[pos : pos + chunk]
        if chunk < MIN_REPEAT:
            _encode_variable(out, sub, signed, False)
        elif delta == 0 and chunk <= MAX_SHORT_REPEAT_LENGTH:
            _write_short_repeat(out, int(sub[0]), chunk, signed)
        else:
            _write_fixed_delta(out, int(sub[0]), delta, chunk, signed)
        pos += chunk
    return


def _write_short_repeat(out: bytearray, value: int, count: int, signed: bool) -> None:
    u = ((value << 1) ^ (value >> 63)) & ((1 << 64) - 1) if signed else value & (
        (1 << 64) - 1
    )
    nbytes = max(1, (u.bit_length() + 7) // 8)
    out.append((_SHORT_REPEAT << 6) | ((nbytes - 1) << 3) | (count - MIN_REPEAT))
    out.extend(u.to_bytes(nbytes, "big"))


def _write_fixed_delta(
    out: bytearray, base: int, delta: int, count: int, signed: bool
) -> None:
    # DELTA header with width code 0 == fixed delta
    out.append((_DELTA << 6) | ((count - 1) >> 8))
    out.append((count - 1) & 0xFF)
    if signed:
        write_vslong(out, base)
    else:
        write_vulong(out, base)
    write_vslong(out, delta)


def _percentiles_from_hist(hist: np.ndarray, n: int, ps: tuple[float, ...]) -> list[int]:
    """Width (decoded) at each percentile, from a 32-bucket width-code hist."""
    results = []
    for p in ps:
        discard = int(n * (1.0 - p))
        width = 0
        for code in range(31, -1, -1):
            discard -= int(hist[code])
            if discard < 0:
                width = decode_bit_width(code)
                break
        results.append(width)
    return results


def _encode_variable(
    out: bytearray, seg: np.ndarray, signed: bool, aligned: bool
) -> None:
    """Encode a segment with no long fixed-delta runs: chunk at 512, choose
    DIRECT / PATCHED_BASE / (monotonic) DELTA per chunk by computed size.

    Per-chunk decisions reuse segment-wide precomputed arrays (zigzag,
    bit-width codes, monotonicity prefix counts) so Python-level work per
    chunk is O(1) numpy calls.
    """
    n = seg.size
    if n == 0:
        return
    zz = zigzag_encode(seg) if signed else seg.view(U64)
    wcodes = _WIDTH_TO_CODE[CLOSEST_FIXED_BITS[bits_required(zz)]]
    d = np.diff(seg)
    # prefix counts for O(1) per-chunk monotonicity checks
    cneg = np.zeros(d.size + 1, dtype=np.int64)
    cpos = np.zeros(d.size + 1, dtype=np.int64)
    if d.size:
        np.cumsum(d < 0, out=cneg[1:])
        np.cumsum(d > 0, out=cpos[1:])
        dcodes = _WIDTH_TO_CODE[CLOSEST_FIXED_BITS[bits_required(np.abs(d).view(U64))]]
    else:
        dcodes = cneg[:0]

    for start in range(0, n, MAX_SCOPE):
        end = min(start + MAX_SCOPE, n)
        cn = end - start
        v = seg[start:end]
        zzc = zz[start:end]

        hist = np.bincount(wcodes[start:end], minlength=32)
        bits100, bits90 = _percentiles_from_hist(hist, cn, (1.0, 0.9))
        direct_width = closest_fixed_bits(bits100, aligned)
        best_size = 2 + bitpack.packed_size(cn, direct_width)
        best_mode = "direct"

        # monotonic -> DELTA.  Wire format stores |delta| after the first
        # delta and the decoder takes the common sign from the first delta,
        # so require a nonzero, sign-consistent first delta.
        delta_payload = None
        if cn >= MIN_REPEAT:
            nneg = int(cneg[end - 1] - cneg[start])
            npos = int(cpos[end - 1] - cpos[start])
            d0 = int(d[start])
            dchunk = d[start : end - 1]
            if nneg == 0 and npos == 0:
                # all deltas zero inside a variable segment (short const run
                # covering the whole chunk)
                if cn <= MAX_SHORT_REPEAT_LENGTH:
                    _write_short_repeat(out, int(v[0]), cn, signed)
                else:
                    _write_fixed_delta(out, int(v[0]), 0, cn, signed)
                continue
            if (d0 > 0 and nneg == 0) or (d0 < 0 and npos == 0):
                if npos + nneg == cn - 1 and np.all(dchunk == d0):
                    # constant nonzero delta
                    dsize = (
                        2 + _varint_len(int(v[0]), signed) + _varint_len_signed(d0)
                    )
                    if dsize < best_size:
                        best_mode, best_size = "fixed_delta", dsize
                else:
                    dhist = np.bincount(dcodes[start + 1 : end - 1], minlength=32)
                    (dbits,) = _percentiles_from_hist(dhist, cn - 2, (1.0,))
                    dw = closest_fixed_bits(dbits, aligned) if cn > 2 else 0
                    if dw == 1:  # width 1 unrepresentable (code 0 = fixed)
                        dw = 2
                    dsize = (
                        2
                        + _varint_len(int(v[0]), signed)
                        + _varint_len_signed(d0)
                        + bitpack.packed_size(max(0, cn - 2), dw)
                    )
                    if dsize < best_size:
                        best_mode, best_size = "delta", dsize
                        delta_payload = (int(v[0]), dchunk, dw)

        # PATCHED_BASE doubles as plain frame-of-reference when the chunk has
        # no outliers (zero patch entries): base = min, data = value - min.
        # The reference only tries PATCHED on a 90p/100p gap; we also try it
        # whenever the FoR span is narrower than the direct width, which
        # strictly improves on the reference's size for clustered data
        # (e.g. time-ordered warc_ts with jitter).
        patched = None
        vmin, vmax = int(v.min()), int(v.max())
        span = (vmax - vmin) & ((1 << 64) - 1)
        span_bits = closest_fixed_bits(min(64, max(1, span.bit_length())), aligned)
        if bits100 - bits90 > 1 or span_bits < direct_width:
            patched = _prepare_patched(v, vmin, aligned)
            if patched is not None and patched["size"] < best_size:
                best_mode, best_size = "patched", patched["size"]

        if best_mode == "direct":
            _write_direct(out, zzc, cn, direct_width)
        elif best_mode == "fixed_delta":
            _write_fixed_delta(out, int(v[0]), int(d[start]), cn, signed)
        elif best_mode == "delta":
            first, dchunk, dw = delta_payload
            _write_var_delta(out, first, dchunk, dw, cn, signed)
        else:
            _write_patched(out, patched, cn)


def _varint_len(value: int, signed: bool) -> int:
    u = ((value << 1) ^ (value >> 63)) & ((1 << 64) - 1) if signed else value & (
        (1 << 64) - 1
    )
    return max(1, (u.bit_length() + 6) // 7)


def _varint_len_signed(value: int) -> int:
    return _varint_len(value, True)


def _write_direct(out: bytearray, zz: np.ndarray, n: int, width: int) -> None:
    out.append((_DIRECT << 6) | (encode_bit_width(width) << 1) | ((n - 1) >> 8))
    out.append((n - 1) & 0xFF)
    out.extend(bitpack.pack(zz, width))


def _write_var_delta(
    out: bytearray, first: int, d: np.ndarray, dw: int, n: int, signed: bool
) -> None:
    width_code = encode_bit_width(dw) if dw else 0
    out.append((_DELTA << 6) | (width_code << 1) | ((n - 1) >> 8))
    out.append((n - 1) & 0xFF)
    if signed:
        write_vslong(out, first)
    else:
        write_vulong(out, first)
    write_vslong(out, int(d[0]))
    if n > 2 and dw:
        out.extend(bitpack.pack(np.abs(d[1:]).view(U64), dw))


def _prepare_patched(v: np.ndarray, vmin: int, aligned: bool) -> dict | None:
    """Mirror of preparePatchedBlob (RunLengthIntegerWriterV2.java:571-668),
    extended with a zero-patch mode (pure frame-of-reference)."""
    if abs(vmin) >= BASE_VALUE_LIMIT:
        return None
    br = (v.view(U64) - np.uint64(vmin & ((1 << 64) - 1))).astype(U64)
    bits95 = percentile_bits(br, 0.95)
    bits100 = percentile_bits(br, 1.0)
    data_width = closest_fixed_bits(bits95, aligned)

    need = bits_required(br)
    patch_pos = np.flatnonzero(need > data_width)
    if patch_pos.size == 0:
        # pure FoR: all values fit data_width at bits100.  The spec (and
        # the reference decoder) require pl >= 1, so emit one no-op patch
        # entry (gap 0, patch 0 — ORs nothing into data[0]); this keeps
        # the stream decodable by ANY conformant ORC reader (verified via
        # the orcfile cross-read) at a one-byte cost.
        data_width = closest_fixed_bits(bits100, aligned)
        entries: list[tuple[int, int]] = [(0, 0)]
        patch_width = 1
        gap_width = 1
        entry_width = closest_fixed_bits(2)
    else:
        if patch_pos.size > 0.06 * v.size + 1:
            return None
        patch_width = closest_fixed_bits(bits100 - data_width)
        if data_width + patch_width > 64 or patch_width > 56:
            return None
        patch_vals = (br[patch_pos] >> U64(data_width)).astype(U64)

        # gaps between patches; split gaps > 255 with (255, 0) filler entries
        gaps = np.diff(np.concatenate(([0], patch_pos))).astype(np.int64)
        gaps[0] = int(patch_pos[0])
        entries = []
        for g, pv in zip(gaps.tolist(), patch_vals.tolist()):
            while g > 255:
                entries.append((255, 0))
                g -= 255
            entries.append((g, pv))
        if len(entries) > 31:
            return None

        max_gap = max(e[0] for e in entries)
        gap_width = closest_fixed_bits(max(1, int(max_gap).bit_length()))
        if gap_width > 8:
            return None
        # reference quirk: combined entry width uses closest fixed bits
        entry_width = closest_fixed_bits(gap_width + patch_width)
        if entry_width > 64:
            return None

    base_mag = abs(vmin)
    base_bits = base_mag.bit_length() + 1  # +1 sign bit
    base_bytes = min(8, max(1, (base_bits + 7) // 8))

    size = (
        4
        + base_bytes
        + bitpack.packed_size(v.size, data_width)
        + bitpack.packed_size(len(entries), entry_width)
    )
    return {
        "size": size,
        "vmin": vmin,
        "br": br,
        "data_width": data_width,
        "patch_width": patch_width,
        "gap_width": gap_width,
        "entry_width": entry_width,
        "entries": entries,
        "base_bytes": base_bytes,
    }


def _write_patched(out: bytearray, p: dict, n: int) -> None:
    dw_code = encode_bit_width(p["data_width"])
    out.append((_PATCHED_BASE << 6) | (dw_code << 1) | ((n - 1) >> 8))
    out.append((n - 1) & 0xFF)
    out.append(((p["base_bytes"] - 1) << 5) | encode_bit_width(p["patch_width"]))
    out.append(((p["gap_width"] - 1) << 5) | len(p["entries"]))
    # base: magnitude with sign in the MSB of the big-endian field
    vmin = p["vmin"]
    base_field = abs(vmin)
    if vmin < 0:
        base_field |= 1 << (8 * p["base_bytes"] - 1)
    out.extend(base_field.to_bytes(p["base_bytes"], "big"))
    # data: base-reduced values, truncated to data_width (patches hold the rest)
    mask = U64((1 << p["data_width"]) - 1) if p["data_width"] < 64 else U64(
        0xFFFFFFFFFFFFFFFF
    )
    out.extend(bitpack.pack(p["br"] & mask, p["data_width"]))
    entries = np.array(
        [(g << p["patch_width"]) | pv for g, pv in p["entries"]], dtype=U64
    )
    out.extend(bitpack.pack(entries, p["entry_width"]))


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def decode(data: bytes | memoryview, n: int, signed: bool) -> np.ndarray:
    """Decode an RLEv2 stream back to int64.

    ``n`` may be smaller than the encoded count (partial read): the final
    run is truncated, mirroring the reference reader's ability to stop
    mid-run (RunLengthIntegerReaderV2.nextVector honors the batch size).
    """
    out = np.empty(n, dtype=I64)
    data = bytes(data)
    pos = 0
    filled = 0
    while filled < n:
        header = data[pos]
        mode = header >> 6
        if mode == _SHORT_REPEAT:
            nbytes = ((header >> 3) & 0x7) + 1
            count = min((header & 0x7) + MIN_REPEAT, n - filled)
            u = int.from_bytes(data[pos + 1 : pos + 1 + nbytes], "big")
            val = ((u >> 1) ^ -(u & 1)) if signed else to_signed64(u)
            out[filled : filled + count] = val
            pos += 1 + nbytes
            filled += count
        elif mode == _DIRECT:
            width = decode_bit_width((header >> 1) & 0x1F)
            count = (((header & 1) << 8) | data[pos + 1]) + 1
            pos += 2
            nb = bitpack.packed_size(count, width)
            zz = bitpack.unpack(data[pos : pos + nb], count, width)
            take = min(count, n - filled)
            out[filled : filled + take] = (
                zigzag_decode(zz) if signed else zz.view(I64)
            )[:take]
            pos += nb
            filled += take
        elif mode == _PATCHED_BASE:
            width = decode_bit_width((header >> 1) & 0x1F)
            count = (((header & 1) << 8) | data[pos + 1]) + 1
            b3, b4 = data[pos + 2], data[pos + 3]
            base_bytes = (b3 >> 5) + 1
            patch_width = decode_bit_width(b3 & 0x1F)
            gap_width = (b4 >> 5) + 1
            pll = b4 & 0x1F
            pos += 4
            base_field = int.from_bytes(data[pos : pos + base_bytes], "big")
            sign_mask = 1 << (8 * base_bytes - 1)
            base = -(base_field & ~sign_mask) if base_field & sign_mask else base_field
            pos += base_bytes
            nb = bitpack.packed_size(count, width)
            br = bitpack.unpack(data[pos : pos + nb], count, width)
            pos += nb
            entry_width = closest_fixed_bits(gap_width + patch_width)
            nb = bitpack.packed_size(pll, entry_width)
            entries = bitpack.unpack(data[pos : pos + nb], pll, entry_width)
            pos += nb
            idx = 0
            pmask = (1 << patch_width) - 1
            for e in entries.tolist():
                gap = e >> patch_width
                pv = e & pmask
                idx += gap
                if pv:
                    br[idx] |= U64(pv << width)
            take = min(count, n - filled)
            out[filled : filled + take] = (
                br + np.uint64(base & ((1 << 64) - 1))
            ).view(I64)[:take]
            filled += take
        else:  # _DELTA
            width_code = (header >> 1) & 0x1F
            count = (((header & 1) << 8) | data[pos + 1]) + 1
            pos += 2
            if signed:
                base, pos = read_vslong(data, pos)
            else:
                u, pos = read_vulong(data, pos)
                base = to_signed64(u)
            delta0, pos = read_vslong(data, pos)
            seg = np.empty(count, dtype=I64)
            seg[0] = base
            if count > 1:
                if width_code == 0:  # fixed delta (wrap-safe two's complement)
                    steps = np.arange(count, dtype=I64).view(U64)
                    seg[:] = (
                        np.uint64(base & ((1 << 64) - 1))
                        + steps * np.uint64(delta0 & ((1 << 64) - 1))
                    ).view(I64)
                else:
                    width = decode_bit_width(width_code)
                    nb = bitpack.packed_size(count - 2, width)
                    rest = bitpack.unpack(data[pos : pos + nb], count - 2, width)
                    pos += nb
                    deltas = np.empty(count - 1, dtype=I64)
                    deltas[0] = delta0
                    sign = -1 if delta0 < 0 else 1
                    deltas[1:] = sign * rest.view(I64)
                    seg[1:] = np.int64(base) + np.cumsum(deltas, dtype=I64)
            take = min(count, n - filled)
            out[filled : filled + take] = seg[:take]
            filled += take
    return out
