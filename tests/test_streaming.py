"""Structured Streaming ingest test: two file drops -> incremental encode,
decodable streams table, no re-encode of earlier batches."""

from __future__ import annotations

import glob
import os
import time

import pytest

from sparc.fixtures import pages
from sparc.job import decode_job
from sparc.streaming import ingest


def _drop(files_dir: str, name: str, n_rows: int, offset: int) -> None:
    pages.write_parquet(os.path.join(files_dir, name), n_rows, seed=42)


def _run_once(spark, files_dir, out, ckpt):
    q = ingest.start_ingest(
        spark, files_dir, out, ckpt,
        target_rows_per_stripe=1000, trigger_once=True,
    )
    q.awaitTermination(120)
    assert not q.isActive


def test_incremental_ingest(spark, tmp_path):
    files_dir = str(tmp_path / "landing")
    out = str(tmp_path / "streams")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(files_dir)

    _drop(files_dir, "part1.parquet", 2000, 0)
    _run_once(spark, files_dir, out, ckpt)
    footers1 = decode_job.stripe_column_stats(spark, out)
    stripes1 = {s["stripe_id"] for s in footers1}
    assert stripes1
    assert decode_job.run_decode(spark, out).count() == 2000

    # second drop: only the new file is encoded (streaming checkpoint),
    # earlier stripes are untouched (same footer set survives)
    _drop(files_dir, "part2.parquet", 1500, 2000)
    _run_once(spark, files_dir, out, ckpt)
    footers2 = decode_job.stripe_column_stats(spark, out)
    stripes2 = {s["stripe_id"] for s in footers2}
    assert stripes1 < stripes2  # strictly grew, old ids intact
    # batch-namespaced ids never collide
    assert all(s >= ingest.STRIPE_SPACE for s in stripes2 - stripes1)
    assert decode_job.run_decode(spark, out).count() == 3500


def test_windowed_stats_with_watermark(spark, tmp_path):
    """Event-time windowed ingest metrics: a later file drop advances the
    watermark past the first drop's windows, which then emit (append
    mode) with counts matching a batch recompute."""
    from pyspark.sql import functions as F

    from sparc.streaming import winstats

    files_dir = str(tmp_path / "landing")
    os.makedirs(files_dir)
    ckpt = str(tmp_path / "ckpt")
    pages.write_parquet(os.path.join(files_dir, "p1.parquet"), 3000, seed=5)

    stats_out = str(tmp_path / "win_stats")

    def run_once():
        q = winstats.start_windowed_stats(
            spark, files_dir, stats_out, ckpt,
            window="1 hour", watermark="0 seconds",
            trigger_once=True,
        )
        q.awaitTermination(120)
        assert not q.isActive

    run_once()
    # second drop ~28h later in event time -> watermark passes every
    # window of drop 1
    import pyarrow.parquet as pq

    t2 = pages.generate(200, seed=6, row_offset=100_000)
    pq.write_table(t2, os.path.join(files_dir, "p2.parquet"))
    run_once()

    got = spark.read.parquet(stats_out)
    assert got.count() > 0
    # every emitted window matches the batch recompute over drop 1
    batch = spark.read.parquet(os.path.join(files_dir, "p1.parquet"))
    expect = winstats.windowed_ingest_stats(batch, window="1 hour")
    matched = got.join(
        expect,
        ["window_start", "window_end", "lang", "n_rows", "html_bytes", "text_bytes"],
        "left_semi",
    )
    # all emitted drop-1 windows agree exactly (drop-2 windows may still
    # be withheld by the watermark)
    unmatched = got.count() - matched.count()
    assert unmatched <= got.count() // 2 and matched.count() > 0


def test_retried_batch_no_duplicates(spark, tmp_path):
    """At-least-once guard end-to-end: foreachBatch may re-deliver a
    batch after the sink committed but before the checkpoint did.  A
    replayed encode_batch (the REAL closure from make_encode_batch) with
    the same batch id must append nothing — no duplicate stripes, no
    re-encode of committed ones — and the streams table must stay
    decodable with the original row count."""
    from sparc.job import encode_job

    src = str(tmp_path / "batch.parquet")
    pages.write_parquet(src, 3000, seed=45)
    out = str(tmp_path / "streams")
    encode_batch = ingest.make_encode_batch(
        spark, out, target_rows_per_stripe=1000
    )
    batch_df = spark.read.parquet(src)
    encode_batch(batch_df, 7)
    rows_after_first = spark.read.parquet(out).count()
    stripes_first = sorted(encode_job.completed_stripes(spark, out))
    assert stripes_first and all(s >= 7 * ingest.STRIPE_SPACE for s in stripes_first)
    # retry: same batch id, same data (checkpoint lost before commit)
    encode_batch(batch_df, 7)
    assert spark.read.parquet(out).count() == rows_after_first  # nothing appended
    assert sorted(encode_job.completed_stripes(spark, out)) == stripes_first
    dec = decode_job.run_decode(spark, out)
    assert dec.count() == 3000  # no duplicate rows


def _drop_docs(files_dir: str, name: str, rows: list[tuple[str, str]]) -> None:
    """rows = [(text, iso_ts)] parquet drop for the dedup streams."""
    import pandas as pd

    df = pd.DataFrame(
        {
            "text": [r[0] for r in rows],
            "warc_ts": pd.to_datetime([r[1] for r in rows]),
        }
    )
    # Spark's declared 'timestamp' type is microseconds
    df.to_parquet(os.path.join(files_dir, name), coerce_timestamps="us")


def test_stream_dedup_within_watermark(spark, tmp_path):
    """Exact streaming dedup with bounded state: re-crawled duplicates
    inside the watermark window are dropped; the survivor count matches
    a batch distinct-count oracle."""
    from sparc.streaming import dedup as sdedup

    files_dir = str(tmp_path / "landing")
    os.makedirs(files_dir)
    rows = [
        ("alpha", "2026-01-01 10:00:00"),
        ("beta", "2026-01-01 10:01:00"),
        ("alpha", "2026-01-01 10:02:00"),   # dup inside watermark
        ("gamma", "2026-01-01 10:03:00"),
        ("beta", "2026-01-01 10:04:00"),    # dup inside watermark
    ]
    _drop_docs(files_dir, "d1.parquet", rows)
    stream = spark.readStream.schema("text string, warc_ts timestamp").parquet(
        files_dir
    )
    deduped = sdedup.dedup_within_watermark(
        sdedup.with_content_key(stream), watermark="30 minutes"
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt1"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT text FROM dedup_stream").collect()
    assert sorted(r["text"] for r in got) == ["alpha", "beta", "gamma"]


def test_stream_dup_counts_stateful(spark, tmp_path):
    """Custom stateful operator (applyInPandasWithState): per-key seen
    counts survive across micro-batches through the state store."""
    from sparc.streaming import dedup as sdedup

    files_dir = str(tmp_path / "landing")
    os.makedirs(files_dir)
    _drop_docs(
        files_dir,
        "d1.parquet",
        [
            ("alpha", "2026-01-01 10:00:00"),
            ("alpha", "2026-01-01 10:01:00"),
            ("beta", "2026-01-01 10:02:00"),
        ],
    )
    stream = spark.readStream.schema("text string, warc_ts timestamp").parquet(
        files_dir
    )
    counts = sdedup.dup_counts_stateful(
        sdedup.with_content_key(stream), watermark="10 minutes"
    )
    q = (
        counts.writeStream.format("memory")
        .queryName("dup_counts")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    try:
        q.processAllAvailable()
        # second batch: alpha re-appears -> count must carry over via state
        _drop_docs(files_dir, "d2.parquet", [("alpha", "2026-01-01 10:05:00")])
        q.processAllAvailable()
    finally:
        q.stop()
    import hashlib

    alpha_key = hashlib.sha256(b"alpha").hexdigest()
    beta_key = hashlib.sha256(b"beta").hexdigest()
    rows = spark.sql(
        "SELECT content_key, max(n_seen) AS n FROM dup_counts GROUP BY 1"
    ).collect()
    got = {r["content_key"]: r["n"] for r in rows}
    assert got[alpha_key] == 3   # 2 in batch 1 + 1 in batch 2 (state carried)
    assert got[beta_key] == 1
