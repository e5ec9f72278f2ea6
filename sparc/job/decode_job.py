"""The distributed decode job: streams table → original DataFrame.

Inverse of encode_job: read the streams parquet, co-locate each stripe's
stream rows (repartition on stripe_id — the only shuffle), decode inside
``mapInArrow``, verify stream checksums, emit Arrow batches in the
original schema.  Selected-column decode ("projection pushdown" over our
own format) only fetches the needed streams: a plain DataFrame filter on
the ``column`` field before the shuffle.
"""

from __future__ import annotations

import json
import zlib
from collections.abc import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..engine import stripe as stripe_mod


def _decode_partition_factory(columns: list[str] | None, verify_crc: bool):
    def decode_partition(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        collected = list(batches)
        if not collected:  # empty shuffle partition
            return
        table = pa.Table.from_batches(collected)
        if table.num_rows == 0:
            return
        sids = table["stripe_id"]
        for sid in pa.compute.unique(sids).to_pylist():
            sub = table.filter(pa.compute.equal(sids, sid))
            streams: dict[tuple[str, str], bytes] = {}
            footer = None
            for col, kind, data in zip(
                sub["column"].to_pylist(),
                sub["kind"].to_pylist(),
                sub["data"].to_pylist(),
            ):
                if kind == "FOOTER":
                    footer = json.loads(data.decode())
                else:
                    streams[(col, kind)] = data
            if footer is None:
                raise ValueError(f"stripe {sid}: FOOTER row missing (incomplete)")
            if verify_crc:
                for (c, k), v in streams.items():
                    expect = footer.get("crc32", {}).get(f"{c}/{k}")
                    if expect is not None and zlib.crc32(v) != expect:
                        raise ValueError(f"stripe {sid}: crc mismatch on {c}/{k}")
            if columns:
                footer = dict(footer)
                footer["columns"] = [c for c in footer["columns"] if c["name"] in columns]
            out = stripe_mod.decode_stripe(streams, footer)
            yield from out.to_batches(max_chunksize=10_000)

    return decode_partition


def run_decode(
    spark: SparkSession,
    streams_dir: str,
    *,
    columns: list[str] | None = None,
    schema_ddl: str | None = None,
    verify_crc: bool = False,
    n_partitions: int | None = None,
) -> DataFrame:
    """Decode the streams table back to a DataFrame of the original schema."""
    raw = spark.read.parquet(streams_dir)
    if columns:
        raw = raw.filter(
            F.col("column").isin(list(columns) + [""])  # keep FOOTER rows
        )
    if schema_ddl is None:
        schema_ddl = infer_schema_ddl(spark, streams_dir, columns)
    n_parts = n_partitions or max(spark.sparkContext.defaultParallelism, 8)
    fn = _decode_partition_factory(columns, verify_crc)
    return raw.repartition(n_parts, "stripe_id").mapInArrow(fn, schema=schema_ddl)


_ARROW_TO_DDL = {
    "int8": "tinyint", "int16": "smallint", "int32": "int", "int64": "long",
    "float": "float", "double": "double", "bool": "boolean",
    "string": "string", "large_string": "string",
    "binary": "binary", "large_binary": "binary", "date32[day]": "date",
}


def _ddl_type(col_meta: dict) -> str:
    t = col_meta["arrow_type"]
    if t.startswith("timestamp"):
        return "timestamp"
    if t in _ARROW_TO_DDL:
        return _ARROW_TO_DDL[t]
    if t.startswith(("list<", "large_list<")):
        return f"array<{_ddl_type(col_meta['child'])}>"
    raise NotImplementedError(t)


def infer_schema_ddl(
    spark: SparkSession, streams_dir: str, columns: list[str] | None = None
) -> str:
    """Read one FOOTER row and derive the Spark DDL schema."""
    row = (
        spark.read.parquet(streams_dir)
        .filter(F.col("kind") == "FOOTER")
        .select("data")
        .limit(1)
        .collect()
    )
    if not row:
        raise ValueError(f"no FOOTER rows in {streams_dir}")
    footer = json.loads(bytes(row[0][0]).decode())
    parts = []
    for c in footer["columns"]:
        if columns and c["name"] not in columns:
            continue
        parts.append(f"`{c['name']}` {_ddl_type(c)}")
    return ", ".join(parts)
