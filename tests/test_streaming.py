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
