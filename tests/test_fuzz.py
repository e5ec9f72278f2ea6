"""Property-based fuzz over the wire-format kernels (hypothesis).

Every kernel must round-trip arbitrary inputs bit-identically — the
`TestNewIntegerEncoding`-style exhaustive-pattern layer (SURVEY §5.1)
generalized to generated data."""

import numpy as np
from hypothesis import given, settings, strategies as st

from sparc.engine import stripe
from sparc.kernels import bitfield, byterle, fsst, rlev1, rlev2

_FAST = settings(max_examples=60, deadline=None)

int64s = st.integers(min_value=-(2**63), max_value=2**63 - 1)
small_ints = st.integers(min_value=-(2**20), max_value=2**20)


@_FAST
@given(st.lists(int64s, max_size=1500))
def test_rlev2_signed_roundtrip(xs):
    v = np.array(xs, dtype=np.int64)
    assert np.array_equal(rlev2.decode(rlev2.encode(v, signed=True), v.size, signed=True), v)


@_FAST
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=1500))
def test_rlev2_unsigned_roundtrip(xs):
    v = np.array(xs, dtype=np.uint64).astype(np.int64)
    out = rlev2.decode(rlev2.encode(v, signed=False), v.size, signed=False)
    assert np.array_equal(out, v)


@_FAST
@given(
    st.lists(small_ints, max_size=400),
    st.integers(min_value=1, max_value=5),
)
def test_rlev2_runs_and_ramps(xs, rep):
    """Repeat/ramp-amplified inputs exercise SHORT_REPEAT/DELTA paths."""
    base = np.repeat(np.array(xs or [0], dtype=np.int64), rep)
    ramp = base + np.arange(base.size)
    for v in (base, ramp):
        assert np.array_equal(
            rlev2.decode(rlev2.encode(v, signed=True), v.size, signed=True), v
        )


@_FAST
@given(st.lists(int64s, max_size=800))
def test_rlev1_roundtrip(xs):
    v = np.array(xs, dtype=np.int64)
    assert np.array_equal(rlev1.decode(rlev1.encode(v, signed=True), v.size, signed=True), v)


@_FAST
@given(st.binary(max_size=2000))
def test_byterle_roundtrip(data):
    v = np.frombuffer(data, dtype=np.uint8)
    assert np.array_equal(byterle.decode(byterle.encode(v), v.size), v)


@_FAST
@given(st.lists(st.booleans(), max_size=2000))
def test_bitfield_roundtrip(bits):
    v = np.array(bits, dtype=bool)
    assert np.array_equal(bitfield.decode(bitfield.encode(v), v.size), v)


@settings(max_examples=25, deadline=None)
@given(st.binary(max_size=6000))
def test_fsst_roundtrip_arbitrary_bytes(data):
    table = fsst.train(data[:2048])
    assert fsst.decompress(fsst.compress(data, table), table) == data


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.one_of(st.none(), st.integers(min_value=-(2**40), max_value=2**40)),
        max_size=300,
    ),
    st.lists(st.one_of(st.none(), st.text(max_size=20)), max_size=300),
)
def test_stripe_roundtrip_fuzz(ints, texts):
    import pyarrow as pa

    n = max(len(ints), len(texts), 1)
    ints = (ints + [None] * n)[:n]
    texts = (texts + [None] * n)[:n]
    t = pa.table(
        {"i": pa.array(ints, pa.int64()), "s": pa.array(texts, pa.string())}
    )
    streams, footer = stripe.encode_stripe(t, row_index_stride=64)
    assert stripe.decode_stripe(streams, footer).equals(t)
