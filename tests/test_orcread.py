"""Reverse cross-validation: REAL ORC files written by reference
implementations (pyarrow's C++ writer, Spark's orc-core Java writer)
decoded by THIS engine's kernels (sparc.engine.orcread) — together with
test_orcfile.py (our writer → their readers) this closes the loop on
wire-format conformance in both directions."""

import glob

import numpy as np
import pyarrow as pa
import pyarrow.orc
import pytest

from sparc.engine import orcread


def _assert_same_as_pyarrow(path: str):
    got = orcread.read_orc(path)
    ref = pa.orc.ORCFile(path).read()
    assert got.num_rows == ref.num_rows
    for name in ref.schema.names:
        a = got[name].combine_chunks()
        b = ref[name].combine_chunks()
        if a.type != b.type:
            b = b.cast(a.type)
        assert a.equals(b), name
    return got


@pytest.fixture(scope="module")
def mixed_table():
    rng = np.random.default_rng(6)
    n = 5000
    return pa.table(
        {
            "i": pa.array(rng.integers(-(10**12), 10**12, n), pa.int64()),
            "small": pa.array(rng.integers(0, 100, n).astype(np.int32), pa.int32()),
            "s": pa.array([f"row-{i % 37}" for i in range(n)]),        # dict
            "u": pa.array([f"https://x{i}.com" for i in range(n)]),    # direct
            "d": pa.array(rng.standard_normal(n)),
            "nul": pa.array([None if i % 7 == 0 else i for i in range(n)], pa.int64()),
        }
    )


@pytest.mark.parametrize("comp", ["UNCOMPRESSED", "ZLIB", "SNAPPY", "ZSTD"])
def test_read_pyarrow_written_orc(tmp_path, mixed_table, comp):
    path = str(tmp_path / f"pa_{comp}.orc")
    pa.orc.write_table(mixed_table, path, compression=comp)
    got = _assert_same_as_pyarrow(path)
    # also value-identical to the source table
    for name in mixed_table.schema.names:
        a = got[name].combine_chunks()
        b = mixed_table[name].combine_chunks()
        if a.type != b.type:
            b = b.cast(a.type)
        assert a.equals(b), name


@pytest.mark.parametrize("comp", ["zlib", "snappy", "zstd"])
def test_read_spark_java_written_orc(spark, tmp_path, comp):
    """The reference Java writer's output decoded by our kernels."""
    from sparc.fixtures import pages

    t = pages.generate(4000, seed=45, row_offset=0)
    import pyarrow.parquet as pq

    src = str(tmp_path / "in.parquet")
    pq.write_table(t, src)
    out = str(tmp_path / f"orc_{comp}")
    (
        spark.read.parquet(src)
        .coalesce(1)
        .write.mode("overwrite")
        .option("compression", comp)
        .orc(out)
    )
    path = glob.glob(out + "/part-*.orc")[0]
    got = _assert_same_as_pyarrow(path)
    assert got.num_rows == 4000
