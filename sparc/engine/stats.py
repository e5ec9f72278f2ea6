"""Column statistics — the reference's "aggregation layer".

Mirrors ``org/apache/orc/impl/ColumnStatisticsImpl.java`` semantics
(per-type min/max/sum/count + hasNull; string stats carry min/max values and
the sum of lengths, truncated for storage) computed batch-wise with numpy.
Maintained per row group (10k rows) and per stripe; these drive codec
auto-selection (SURVEY.md §4) and pruning over the metrics table.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import numpy as np

ROW_INDEX_STRIDE = 10_000  # orc.row.index.stride default
STRING_STAT_TRUNCATE = 1024  # proto truncation length in the reference


@dataclass
class ColumnStats:
    kind: str  # 'int' | 'float' | 'string' | 'binary' | 'timestamp' | 'bool'
    n_values: int = 0
    n_nulls: int = 0
    minimum: Any = None
    maximum: Any = None
    total: Any = None  # sum for numeric, sum of lengths for string/binary
    n_distinct: int | None = None  # filled for string columns when computed

    @property
    def has_null(self) -> bool:
        return self.n_nulls > 0

    def to_dict(self) -> dict:
        mn, mx = self.minimum, self.maximum
        mn_t = mx_t = False
        if self.kind in ("string", "binary"):
            mn, mn_t = _truncate(mn)
            mx, mx_t = _truncate(mx)
        return {
            "kind": self.kind,
            "n_values": self.n_values,
            "n_nulls": self.n_nulls,
            "min": mn,
            "max": mx,
            # explicit lossy-bound markers (the reference proto's
            # lowerBound/upperBound distinction): a True flag means the
            # stored text is NOT the exact column extreme and pruning must
            # treat the bound as unknown in that direction
            "min_trunc": mn_t,
            "max_trunc": mx_t,
            "sum": self.total,
            "n_distinct": self.n_distinct,
        }


def _truncate(v) -> tuple:
    """(stored text, lossy flag).  Bytes are cut at a UTF-8 character
    boundary so the cut itself never fabricates U+FFFD; any replacement
    char remaining means the value wasn't valid UTF-8 (binary), which is
    just as lossy for ordering purposes, so it also sets the flag."""
    if v is None:
        return None, False
    if isinstance(v, bytes):
        lossy = len(v) > STRING_STAT_TRUNCATE
        cut = v[:STRING_STAT_TRUNCATE]
        if lossy:
            while cut and (cut[-1] & 0xC0) == 0x80:
                cut = cut[:-1]
            if cut and cut[-1] >= 0xC0:
                cut = cut[:-1]
        text = cut.decode("utf-8", "replace")
        return text, lossy or "�" in text
    s = str(v)
    return s[:STRING_STAT_TRUNCATE], len(s) > STRING_STAT_TRUNCATE


def int_stats(values: np.ndarray, n_nulls: int, kind: str = "int") -> ColumnStats:
    s = ColumnStats(kind=kind, n_values=int(values.size), n_nulls=int(n_nulls))
    if values.size:
        s.minimum = int(values.min())
        s.maximum = int(values.max())
        # overflow-checked sum like IntegerStatisticsImpl: fast int64 path
        # when bounds prove it safe, exact object-sum otherwise
        bound = max(abs(s.minimum), abs(s.maximum))
        if bound * values.size < (1 << 62):
            s.total = int(values.sum(dtype=np.int64))
        else:
            # exact overflow-safe sum with NO per-value Python loop:
            # int64 partial sums over chunks sized so |partial| <= 2^62,
            # combined as Python ints.  (Epoch-micro timestamps hit this
            # branch on every stripe — the old tolist() genexpr was 2
            # Python calls per row.)
            k = max(1, (1 << 62) // max(bound, 1))
            s.total = int(
                sum(
                    int(values[i : i + k].sum(dtype=np.int64))
                    for i in range(0, values.size, k)
                )
            )
    return s


def decimal128_stats(lo: np.ndarray, hi: np.ndarray, n_nulls: int) -> ColumnStats:
    """Stats over 128-bit unscaled decimals given as (low u64, high i64)
    word pairs; min/max/sum become exact Python ints (DecimalStatisticsImpl
    keeps exact HiveDecimal bounds the same way)."""
    s = ColumnStats(kind="decimal", n_values=int(lo.size), n_nulls=int(n_nulls))
    if lo.size:
        order = np.lexsort((lo, hi))  # signed high word primary
        i, j = int(order[0]), int(order[-1])
        s.minimum = (int(hi[i]) << 64) + int(lo[i])
        s.maximum = (int(hi[j]) << 64) + int(lo[j])
        s.total = (int(hi.astype(object).sum()) << 64) + int(lo.astype(object).sum())
    return s


def float_stats(values: np.ndarray, n_nulls: int) -> ColumnStats:
    s = ColumnStats(kind="float", n_values=int(values.size), n_nulls=int(n_nulls))
    if values.size:
        s.minimum = float(values.min())
        s.maximum = float(values.max())
        s.total = float(values.sum())
    return s


def string_stats(
    lengths: np.ndarray,
    n_nulls: int,
    minimum: bytes | None,
    maximum: bytes | None,
    n_distinct: int | None = None,
    kind: str = "string",
) -> ColumnStats:
    s = ColumnStats(kind=kind, n_values=int(lengths.size), n_nulls=int(n_nulls))
    if lengths.size:
        s.minimum = minimum
        s.maximum = maximum
        s.total = int(lengths.sum())
        s.n_distinct = n_distinct
    return s


def bool_stats(values: np.ndarray, n_nulls: int) -> ColumnStats:
    s = ColumnStats(kind="bool", n_values=int(values.size), n_nulls=int(n_nulls))
    if values.size:
        true_count = int(values.sum())
        s.minimum = bool(true_count > 0) and bool(true_count == values.size)
        s.maximum = bool(true_count > 0)
        s.total = true_count  # trueCount, like BooleanStatisticsImpl
    return s


def merge(a: ColumnStats, b: ColumnStats) -> ColumnStats:
    """Stripe-level merge of row-group stats (StripeStatisticsImpl analog)."""
    out = ColumnStats(kind=a.kind)
    out.n_values = a.n_values + b.n_values
    out.n_nulls = a.n_nulls + b.n_nulls
    for s in (a, b):
        if s.minimum is not None:
            out.minimum = s.minimum if out.minimum is None else min(out.minimum, s.minimum)
        if s.maximum is not None:
            out.maximum = s.maximum if out.maximum is None else max(out.maximum, s.maximum)
        if s.total is not None:
            out.total = s.total if out.total is None else out.total + s.total
    return out
