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
    Hash-unique and sort both run in Arrow C kernels (Arrow sorts binary
    by memcmp, matching Python bytes order), so a high-cardinality column
    crossing the 0.8 threshold stays off the interpreter.
    """
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        arr = values.combine_chunks() if isinstance(values, pa.ChunkedArray) else values
    else:
        arr = pa.array(pd.Series(values))
    arr = arr.cast(pa.large_binary())
    denc = arr.dictionary_encode()
    uniq = denc.dictionary
    order = pa.compute.sort_indices(uniq).to_numpy().astype(np.int64)
    rank = np.empty(len(uniq), dtype=np.int64)
    rank[order] = np.arange(len(uniq))
    codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    sorted_uniques = uniq.take(pa.array(order)).to_pylist()
    return rank[codes], sorted_uniques


def encode_unsorted(values: pa.Array | np.ndarray) -> tuple[np.ndarray, list[bytes]]:
    """First-occurrence-order dictionary (the reference's hash-table
    implementation, ``orc.dictionary.implementation=hash`` /
    ``StringHashTableDictionary.java:142-216``): codes index the
    dictionary in insertion order, skipping the sort pass — the cheaper
    choice for high-cardinality dictionaries where sortedness buys
    nothing (readers must not assume order; ours doesn't)."""
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        arr = values.combine_chunks() if isinstance(values, pa.ChunkedArray) else values
    else:
        arr = pa.array(pd.Series(values))
    arr = arr.cast(pa.large_binary())
    denc = arr.dictionary_encode()  # Arrow: first-occurrence order
    codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    return codes, denc.dictionary.to_pylist()


def decode(codes: np.ndarray, uniques: list[bytes]) -> list[bytes]:
    lookup = np.array(uniques, dtype=object)
    return lookup[np.asarray(codes, dtype=np.int64)].tolist()


def should_use_dictionary(n_distinct: int, n_nonnull: int) -> bool:
    """True when distinct/non-null <= 0.8 (reference threshold semantics)."""
    if n_nonnull == 0:
        return False
    return n_distinct / n_nonnull <= DICT_KEY_THRESHOLD
