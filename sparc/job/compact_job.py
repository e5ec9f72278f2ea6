"""Stripe compaction: merge streams tables without decode/re-encode.

The engine-side analog of the reference's ``WriterImpl.appendStripe``
(``org/apache/orc/impl/WriterImpl.java:854-904``): pre-encoded stripe
bytes move as-is; only the stripe directory (here: stripe ids in the
streams table) is rewritten.  Use cases: merging the outputs of several
partial encode jobs, or re-binning many small stream files into fewer
large ones.

Everything is a metadata-level DataFrame transform — no kernel runs, no
Python touches the stream bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def compact(
    spark: SparkSession,
    src_dirs: list[str],
    out_dir: str,
    *,
    n_output_files: int | None = None,
) -> dict:
    """Concatenate several streams tables into one, renumbering stripe ids
    to stay disjoint (source order is preserved: ids of source k are
    offset by the total stripe count of sources 0..k-1)."""
    offset = 0
    parts: list[DataFrame] = []
    counts: list[int] = []
    for d in src_dirs:
        df = spark.read.parquet(d)
        n = df.agg(F.max("stripe_id")).collect()[0][0]
        n = int(n) + 1 if n is not None else 0
        parts.append(
            df.withColumn("stripe_id", (F.col("stripe_id") + F.lit(offset)).cast("long"))
        )
        counts.append(n)
        offset += n
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    if n_output_files:
        # co-locate each stripe's rows in one file (decode locality)
        out = out.repartition(n_output_files, "stripe_id")
    out.write.mode("overwrite").parquet(out_dir)
    return {"n_stripes": offset, "sources": dict(zip(src_dirs, counts))}
