"""Decimal64 column support (Decimal64TreeWriter analog): unscaled
int64 + RLEv2, precision/scale in the footer."""

from decimal import Decimal

import pyarrow as pa
import pytest

from sparc.engine import stripe


def test_decimal_roundtrip_with_nulls():
    t = pa.table(
        {
            "d": pa.array(
                [Decimal("12.34"), None, Decimal("-99999999.99"), Decimal("0.01")],
                pa.decimal128(12, 2),
            )
        }
    )
    streams, footer = stripe.encode_stripe(t)
    assert footer["columns"][0]["encoding"] == "decimal64"
    assert footer["columns"][0]["precision"] == 12
    assert footer["columns"][0]["scale"] == 2
    assert stripe.decode_stripe(streams, footer).equals(t)


def test_decimal_max_precision_18():
    t = pa.table(
        {
            "d": pa.array(
                [Decimal("123456789012345.678"), Decimal("-0.001")],
                pa.decimal128(18, 3),
            )
        }
    )
    streams, footer = stripe.encode_stripe(t)
    assert stripe.decode_stripe(streams, footer).equals(t)


def test_decimal_precision_19_raises():
    t = pa.table({"d": pa.array([Decimal("1")], pa.decimal128(19, 0))})
    with pytest.raises(NotImplementedError):
        stripe.encode_stripe(t)


def test_decimal_rowgroup_segments_and_pruning():
    vals = [Decimal(i) / 100 for i in range(-3000, 3000)]
    t = pa.table({"d": pa.array(vals, pa.decimal128(10, 2))})
    streams, footer = stripe.encode_stripe(t, row_index_stride=1000)
    assert stripe.decode_stripe(streams, footer).equals(t)
    assert stripe.decode_stripe(streams, footer, row_groups=[2]).equals(
        t.slice(2000, 1000)
    )
    # per-group stats prune on the unscaled-int domain (group 0 holds
    # unscaled -3000..-2001, group 1 starts at -2000)
    sel = stripe.pick_row_groups(footer, ("between", "d", -2999, -2001))
    assert sel == [0]
