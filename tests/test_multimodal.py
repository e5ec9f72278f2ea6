"""Multimodal plumbing: vectorized stub decode vs a per-row reference."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparc.ops import multimodal


def _ref_stub(payload: bytes | None):
    """Per-row reference implementation of the stub (test-only loop)."""
    if payload is None or len(payload) == 0:
        return "", 0, 0, [0.0] * 8
    header = payload[:8].hex()
    w = 64 + payload[0] % 64
    h = 64 + payload[-1] % 64
    arr = np.frombuffer(payload[:256].ljust(256, b"\0"), dtype=np.uint8)
    feat = (arr.reshape(8, 32).mean(axis=1) / 255.0).astype(np.float32)
    return header, int(w), int(h), feat.tolist()


PAYLOADS = [
    b"hello world this is a payload",
    b"",
    None,
    b"x",
    bytes(range(256)) * 3,  # longer than the 256-byte feature window
    b"\x00\xff\x7f\x80",
]


@pytest.fixture(scope="module")
def feats(spark):
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(PAYLOADS)], "doc_id long, payload binary"
    ).repartition(2)
    rows = multimodal.extract_features(df).orderBy("id").collect()
    return {r["id"]: r for r in rows}


def test_metadata_matches_reference(feats):
    for i, p in enumerate(PAYLOADS):
        header, w, h, feat = _ref_stub(p)
        r = feats[i]
        n = len(p) if p else 0
        assert r["n_bytes"] == n
        assert r["header"] == header
        assert r["fake_width"] == w
        assert r["fake_height"] == h
        np.testing.assert_allclose(r["feature"], feat, atol=1e-6)


def test_fingerprint_deterministic(spark):
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(PAYLOADS)], "doc_id long, payload binary"
    )
    a = {r["id"]: r["feat_fp"] for r in multimodal.extract_features(df).collect()}
    b = {
        r["id"]: r["feat_fp"]
        for r in multimodal.extract_features(df.repartition(3)).collect()
    }
    assert a == b
    # distinct payloads -> distinct fingerprints (no trivial collisions)
    assert len(set(a.values())) == len(set(
        bytes(p) if p else b"" for p in PAYLOADS
    ))


def test_metadata_surface_schema(spark):
    df = spark.createDataFrame([(1, b"abc")], "doc_id long, payload binary")
    out = multimodal.extract_metadata(df)
    assert [f.name for f in out.schema.fields] == [
        "id", "n_bytes", "header", "fake_width", "fake_height",
    ]
    r = out.collect()[0]
    assert (r["n_bytes"], r["header"]) == (3, "616263")


def test_matches_spark_sql_mirror(spark):
    """The vectorized numpy path agrees with a pure-SQL recomputation."""
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(PAYLOADS) if p], "doc_id long, payload binary"
    )
    ours = multimodal.extract_metadata(df)
    sql = df.select(
        F.col("doc_id").alias("id"),
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.lower(F.hex(F.expr("substring(payload, 1, 8)"))).alias("header"),
        (64 + F.conv(F.hex(F.expr("substring(payload, 1, 1)")), 16, 10) % 64)
        .cast("int").alias("fake_width"),
        (64 + F.conv(
            F.hex(F.expr("substring(payload, octet_length(payload), 1)")), 16, 10
        ) % 64).cast("int").alias("fake_height"),
    )
    assert ours.exceptAll(sql).count() == 0
    assert sql.exceptAll(ours).count() == 0
