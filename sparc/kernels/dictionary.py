"""Sorted-dictionary encoding for string/binary columns.

Reproduces the reference's DICTIONARY_V2 *contract* (SURVEY.md §2.3): the
dictionary is byte-lexicographically sorted and row codes index into the
sorted dictionary.  The reference reaches that state incrementally with a
red-black tree (``org/apache/orc/impl/StringRedBlackTree.java:31-142``);
we reach the identical state batch-wise: hash-factorize (C-speed), sort the
uniques, remap codes through the rank permutation.  Semantics-equal,
structure-different.

The dict-vs-direct decision threshold (distinct/non-null > 0.8 → direct)
matches ``orc.dictionary.key.threshold`` / ``checkDictionaryEncoding``
(``StringBaseTreeWriter.java:116-124``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

DICT_KEY_THRESHOLD = 0.8  # orc.dictionary.key.threshold default


def encode_sorted(values: pa.Array | np.ndarray) -> tuple[np.ndarray, list[bytes]]:
    """Return (codes:int64, sorted unique byte strings).

    Sort order is raw-byte lexicographic (UTF-8 bytes, not codepoints) —
    the DICTIONARY_V2 spec's order.  ``values`` must be non-null binary/str.
    """
    if isinstance(values, pa.Array) or isinstance(values, pa.ChunkedArray):
        arr = values.combine_chunks() if isinstance(values, pa.ChunkedArray) else values
        pd_vals = arr.to_pandas()
    else:
        pd_vals = pd.Series(values)
    codes, uniques = pd.factorize(pd_vals, sort=False)
    uniq_bytes = [u if isinstance(u, bytes) else str(u).encode("utf-8") for u in uniques]
    order = _byte_argsort(uniq_bytes)
    rank = np.empty(len(uniq_bytes), dtype=np.int64)
    rank[order] = np.arange(len(uniq_bytes))
    sorted_uniques = [uniq_bytes[i] for i in order]
    return rank[codes].astype(np.int64), sorted_uniques


def _byte_argsort(items: list[bytes]) -> np.ndarray:
    """Argsort by raw bytes (Python's bytes comparison is memcmp order)."""
    return np.array(
        sorted(range(len(items)), key=items.__getitem__), dtype=np.int64
    )


def decode(codes: np.ndarray, uniques: list[bytes]) -> list[bytes]:
    lookup = np.array(uniques, dtype=object)
    return lookup[np.asarray(codes, dtype=np.int64)].tolist()


def should_use_dictionary(n_distinct: int, n_nonnull: int) -> bool:
    """True when distinct/non-null <= 0.8 (reference threshold semantics)."""
    if n_nonnull == 0:
        return False
    return n_distinct / n_nonnull <= DICT_KEY_THRESHOLD
