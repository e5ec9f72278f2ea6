"""Nested column support: struct, map, list-of-struct, struct-of-list —
the StructTreeWriter / MapTreeWriter recursion (SURVEY.md §2.4)."""

import pyarrow as pa
import pytest

from sparc.engine import stripe


def _roundtrip(table: pa.Table, stride=None):
    streams, footer = stripe.encode_stripe(table, row_index_stride=stride)
    out = stripe.decode_stripe(streams, footer)
    assert out.equals(table), f"\nwant {table.to_pydict()}\n got {out.to_pydict()}"
    return footer


def test_struct_roundtrip():
    t = pa.table(
        {
            "id": pa.array([1, 2, 3], pa.int64()),
            "meta": pa.array(
                [
                    {"status": 200, "mime": "text/html"},
                    {"status": 404, "mime": "application/json"},
                    {"status": 301, "mime": None},
                ],
                pa.struct([("status", pa.int32()), ("mime", pa.string())]),
            ),
        }
    )
    footer = _roundtrip(t)
    meta = footer["columns"][1]
    assert meta["encoding"] == "struct"
    assert [c["field_name"] for c in meta["children"]] == ["status", "mime"]


def test_struct_with_nulls_roundtrip():
    t = pa.table(
        {
            "s": pa.array(
                [{"a": 1, "b": "x"}, None, {"a": None, "b": "z"}, None],
                pa.struct([("a", pa.int64()), ("b", pa.string())]),
            )
        }
    )
    _roundtrip(t)


def test_nested_struct_in_struct():
    inner = pa.struct([("x", pa.int64()), ("y", pa.float64())])
    outer = pa.struct([("p", inner), ("q", pa.string())])
    t = pa.table(
        {
            "n": pa.array(
                [
                    {"p": {"x": 1, "y": 2.5}, "q": "a"},
                    {"p": {"x": -7, "y": 0.0}, "q": None},
                    None,
                ],
                outer,
            )
        }
    )
    _roundtrip(t)


def test_map_roundtrip():
    t = pa.table(
        {
            "headers": pa.array(
                [
                    [("content-type", "text/html"), ("etag", "abc")],
                    [],
                    [("x", None)],
                ],
                pa.map_(pa.string(), pa.string()),
            )
        }
    )
    footer = _roundtrip(t)
    assert footer["columns"][0]["encoding"] == "map"


def test_map_with_null_rows():
    t = pa.table(
        {
            "m": pa.array(
                [[("a", 1)], None, [("b", 2), ("c", 3)]],
                pa.map_(pa.string(), pa.int64()),
            )
        }
    )
    _roundtrip(t)


def test_list_of_struct():
    elem = pa.struct([("tag", pa.string()), ("n", pa.int64())])
    t = pa.table(
        {
            "links": pa.array(
                [
                    [{"tag": "a", "n": 3}, {"tag": "img", "n": 1}],
                    [],
                    [{"tag": "div", "n": None}],
                ],
                pa.list_(elem),
            )
        }
    )
    _roundtrip(t)


def test_struct_of_list():
    st = pa.struct([("xs", pa.list_(pa.int64())), ("name", pa.string())])
    t = pa.table(
        {
            "s": pa.array(
                [{"xs": [1, 2], "name": "p"}, {"xs": [], "name": None}],
                st,
            )
        }
    )
    _roundtrip(t)


def test_struct_with_row_index_and_pruning():
    """Struct columns coexist with the row-group index: sibling scalar
    columns prune, struct columns row-slice."""
    import numpy as np

    n = 2500
    vals = np.arange(n, dtype=np.int64)
    t = pa.table(
        {
            "k": pa.array(vals),
            "s": pa.array(
                [{"a": int(v), "b": f"s{v}"} for v in vals],
                pa.struct([("a", pa.int64()), ("b", pa.string())]),
            ),
        }
    )
    streams, footer = stripe.encode_stripe(t, row_index_stride=1000)
    assert stripe.decode_stripe(streams, footer).equals(t)
    sel = stripe.pick_row_groups(footer, ("between", "k", 1200, 1300))
    assert sel == [1]
    out = stripe.decode_stripe(streams, footer, row_groups=sel)
    assert out.equals(t.slice(1000, 1000))


def test_deep_nesting_list_of_list():
    t = pa.table(
        {
            "ll": pa.array(
                [[[1, 2], [3]], [], [[4], None, [5, 6, 7]]],
                pa.list_(pa.list_(pa.int64())),
            )
        }
    )
    _roundtrip(t)


def test_dense_union_roundtrip():
    """Dense union: byte-RLE tag stream + per-variant subtrees in tag
    order (UnionTreeWriter semantics), arbitrary type codes and
    non-sequential Arrow offsets normalized at encode."""
    import numpy as np

    tags = pa.array([0, 1, 0, 0, 1], pa.int8())
    offsets = pa.array([0, 0, 1, 2, 1], pa.int32())
    arr = pa.UnionArray.from_dense(
        tags, offsets,
        [pa.array([10, 20, 30], pa.int64()), pa.array(["a", "b"])],
        ["num", "txt"], [0, 1],
    )
    t = pa.table({"u": arr, "k": pa.array([1, 2, 3, 4, 5], pa.int64())})
    footer = _roundtrip(t)
    assert footer["columns"][0]["encoding"] == "union"

    # non-contiguous type codes, shuffled value order
    arr2 = pa.UnionArray.from_dense(
        pa.array([5, 7, 5, 7], pa.int8()), pa.array([1, 0, 0, 1], pa.int32()),
        [pa.array([100, 200], pa.int64()), pa.array(["x", "y"])],
        ["n", "s"], [5, 7],
    )
    _roundtrip(pa.table({"u": arr2}))


def test_dense_union_rowgroup_slicing():
    n = 2400
    import numpy as np

    rng = np.random.default_rng(4)
    tags_np = rng.integers(0, 2, n).astype(np.int8)
    n0 = int((tags_np == 0).sum())
    offs = np.zeros(n, dtype=np.int32)
    offs[tags_np == 0] = np.arange(n0)
    offs[tags_np == 1] = np.arange(n - n0)
    arr = pa.UnionArray.from_dense(
        pa.array(tags_np, pa.int8()), pa.array(offs, pa.int32()),
        [pa.array(np.arange(n0), pa.int64()),
         pa.array([f"s{i}" for i in range(n - n0)])],
        ["num", "txt"], [0, 1],
    )
    t = pa.table({"u": arr})
    streams, footer = stripe.encode_stripe(t, row_index_stride=800)
    assert stripe.decode_stripe(streams, footer).equals(t)
    out = stripe.decode_stripe(streams, footer, row_groups=[1])
    assert out.equals(t.slice(800, 800))


def test_sparse_union_raises():
    arr = pa.UnionArray.from_sparse(
        pa.array([0, 1], pa.int8()),
        [pa.array([1, 2], pa.int64()), pa.array(["a", "b"])],
    )
    with pytest.raises(NotImplementedError):
        stripe.encode_stripe(pa.table({"u": arr}))
