"""Streaming windowed statistics over arriving pages.

Beyond-the-reference layer (the reference has no streaming surface,
SURVEY.md §2.10): a production crawl wants per-window ingest metrics —
rows, bytes, language mix — computed on the stream, tolerant of late
arrivals.  Built-in Structured Streaming only: event-time window on
``warc_ts`` + watermark for late data, partial-aggregated groupBy (no
UDFs, whole-stage codegen).  The output is itself planner-scale metadata
(one row per window x lang), append-mode once the watermark passes."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def windowed_ingest_stats(
    stream: DataFrame,
    *,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    ts_col: str = "warc_ts",
    lang_col: str = "lang",
) -> DataFrame:
    """Event-time windowed ingest metrics with late-data tolerance.

    Returns a streaming DataFrame of
    (window_start, window_end, lang, n_rows, html_bytes, text_bytes):
    rows later than ``watermark`` behind the max observed event time are
    dropped (bounded state — the property that lets this run forever at
    crawl scale)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(lang_col))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.coalesce(F.octet_length("html"), F.lit(0))).alias("html_bytes"),
            F.sum(F.coalesce(F.octet_length("text"), F.lit(0))).alias("text_bytes"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            F.col(lang_col),
            "n_rows",
            "html_bytes",
            "text_bytes",
        )
    )


def start_windowed_stats(
    spark,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    *,
    schema_ddl: str = (
        "url string, warc_ts timestamp, html binary, text string, lang string"
    ),
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    trigger_once: bool = False,
):
    """File-source stream -> windowed stats -> append-mode parquet sink
    (restart-safe: the checkpoint carries source offsets AND the
    aggregation + watermark state, so a later run resumes exactly)."""
    stream = spark.readStream.schema(schema_ddl).parquet(input_dir)
    stats = windowed_ingest_stats(stream, window=window, watermark=watermark)
    writer = (
        stats.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
