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
    stripe_filter: tuple[str, object, object] | None = None,
    cast_to: dict[str, str] | None = None,
) -> DataFrame:
    """Decode the streams table back to a DataFrame of the original schema.

    ``stripe_filter=(column, lo, hi)`` prunes whole stripes whose footer
    min/max range does not intersect [lo, hi] BEFORE the shuffle — the
    engine-side analog of the reference's stripe-level SearchArgument
    pruning (SURVEY.md §2.7; ``RecordReaderImpl.evaluatePredicateProto``).
    Note this prunes, it does not filter rows: apply the row predicate on
    the decoded DataFrame as usual (Catalyst handles it).

    ``cast_to={column: spark_type_ddl}`` is the schema-evolution surface
    (SURVEY.md §2.8): reader-schema conversions are Catalyst ``cast``s
    applied after decode — the ~35 pairwise ConvertTreeReader readers of
    the reference collapse into Spark's built-in cast matrix.
    """
    raw = spark.read.parquet(streams_dir)
    if stripe_filter is not None:
        col, lo, hi = stripe_filter
        keep = prune_stripes(spark, streams_dir, col, lo, hi)
        raw = raw.filter(F.col("stripe_id").isin(keep))
    if columns:
        raw = raw.filter(
            F.col("column").isin(list(columns) + [""])  # keep FOOTER rows
        )
    if schema_ddl is None:
        schema_ddl = infer_schema_ddl(spark, streams_dir, columns)
    n_parts = n_partitions or max(spark.sparkContext.defaultParallelism, 8)
    fn = _decode_partition_factory(columns, verify_crc)
    out = raw.repartition(n_parts, "stripe_id").mapInArrow(fn, schema=schema_ddl)
    if cast_to:
        out = out.select(
            *[
                F.col(f.name).cast(cast_to[f.name]).alias(f.name)
                if f.name in cast_to
                else F.col(f.name)
                for f in out.schema.fields
            ]
        )
    return out


def prune_stripes_bloom(
    spark: SparkSession, streams_dir: str, column: str, value
) -> list[int]:
    """Stripe ids that *might* contain ``value`` in ``column``, per the
    per-stripe bloom streams (BLOOM_FILTER_UTF8; no false negatives).
    Stripes without a bloom stream for the column are kept."""
    from ..engine import bloom as bloom_mod

    blooms = {
        r["stripe_id"]: bytes(r["data"])
        for r in (
            spark.read.parquet(streams_dir)
            .filter((F.col("kind") == "BLOOM_FILTER_UTF8") & (F.col("column") == column))
            .select("stripe_id", "data")
            .collect()
        )
    }
    all_ids = [
        r[0]
        for r in spark.read.parquet(streams_dir)
        .filter(F.col("kind") == "FOOTER")
        .select("stripe_id")
        .distinct()
        .collect()
    ]
    return sorted(
        sid
        for sid in all_ids
        if sid not in blooms or bloom_mod.might_contain(blooms[sid], value)
    )


def stripe_column_stats(spark: SparkSession, streams_dir: str) -> list[dict]:
    """[{stripe_id, column, kind, min, max, n_nulls, n_values}, ...] parsed
    from the stripe footers.

    Footers are planner-scale metadata (one per stripe, like the
    reference's stripe directory read by ``ReaderImpl``); at 10^12-row
    scale this collect is a ~GB metrics-table scan and should become a
    DataFrame join — the pruning contract is unchanged.
    """
    rows = (
        spark.read.parquet(streams_dir)
        .filter(F.col("kind") == "FOOTER")
        .select("stripe_id", "data")
        .collect()
    )
    out = []
    for sid, blob in rows:
        footer = json.loads(bytes(blob).decode())
        for c in footer["columns"]:
            st = c.get("stats") or {}
            out.append(
                {
                    "stripe_id": sid,
                    "column": c["name"],
                    "kind": st.get("kind"),
                    "min": st.get("min"),
                    "max": st.get("max"),
                    "n_nulls": c.get("n_nulls", 0),
                    "n_values": st.get("n_values", c.get("n_rows", 0)),
                }
            )
    return out


def prune_stripes(
    spark: SparkSession, streams_dir: str, column: str, lo=None, hi=None
) -> list[int]:
    """Stripe ids whose [min, max] for ``column`` intersects [lo, hi].

    Tri-state like the reference's TruthValue algebra: a stripe with no
    stats for the column (all-null or missing) is kept (YES_NO_NULL ->
    cannot skip).  ``lo``/``hi`` of None mean unbounded.
    """
    keep = []
    for st in stripe_column_stats(spark, streams_dir):
        if st["column"] != column:
            continue
        mn, mx = st["min"], st["max"]
        if mn is None or mx is None:
            keep.append(st["stripe_id"])
            continue
        if lo is not None and mx < lo:
            continue
        if hi is not None and mn > hi:
            continue
        keep.append(st["stripe_id"])
    return sorted(set(keep))


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
