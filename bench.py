"""Benchmark entry point (driver contract).

Runs the headline workload at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line: {"metric", "value", "unit", "queries", "sf", ...extras}.

Headline = the north-rule metric: encode throughput (GB/s of raw input
bytes) over a >=1 GiB synthetic Common-Crawl-style pages table, plus
compressed bytes/row vs the reference ORC writer (Spark's bundled
orc-core, zstd) on identical data, plus decode throughput and a sample of
the pipeline operators at the testdata scale factor.

Scaling evidence (local[8] vs local[32]) is produced by running this
script twice with SPARK_GRAFT_CPUS=8/32 — see BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from collections.abc import Iterator

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
CACHE = os.environ.get("SPARC_BENCH_CACHE", "/tmp/sparc_bench")
ROWS_OVERRIDE = os.environ.get("SPARC_BENCH_ROWS")


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def build_spark(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"sparc-bench-{cpus}")
        .config("spark.sql.shuffle.partitions", str(max(cpus * 2, 8)))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
        .getOrCreate()
    )


def gen_pages_parquet(spark, n_rows: int, path: str, chunk: int = 20_000) -> None:
    """Distributed deterministic generation (row content depends only on
    global row index + seed, so parallelism doesn't change the data)."""
    import pyarrow as pa

    if os.path.exists(path):
        try:
            got = spark.read.parquet(path).count()
            if got == n_rows:
                return
        except Exception:
            pass
        shutil.rmtree(path, ignore_errors=True)
    offsets = list(range(0, n_rows, chunk))

    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from sparc.fixtures import pages as pages_mod

        for b in batches:
            for off in b.column("off").to_pylist():
                t = pages_mod.generate(min(chunk, n_rows - off), seed=42, row_offset=off)
                yield from t.to_batches()

    # one chunk per task -> one ~20 MB file per chunk: scan parallelism of
    # the result matches its file count (a single giant row group caps any
    # downstream stage at n_files tasks)
    df = spark.createDataFrame([(o,) for o in offsets], "off long").repartition(
        max(len(offsets), 1)
    )
    out = df.mapInArrow(
        gen, "url string, warc_ts timestamp_ntz, html binary, text string, lang string"
    )
    out.write.mode("overwrite").parquet(path)


def raw_bytes_of(spark, path: str) -> int:
    from pyspark.sql import functions as F

    df = spark.read.parquet(path)
    expr = (
        F.coalesce(F.octet_length("url"), F.lit(0))
        + F.coalesce(F.octet_length("html"), F.lit(0))
        + F.coalesce(F.octet_length("text"), F.lit(0))
        + F.coalesce(F.octet_length("lang"), F.lit(0))
        + F.lit(8)
    )
    return int(df.select(F.sum(expr)).collect()[0][0])


def dir_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    sf = _sf_from_dir(SF_DIR)
    n_rows = int(ROWS_OVERRIDE) if ROWS_OVERRIDE else max(20_000, int(3_000_000 * sf))
    os.makedirs(CACHE, exist_ok=True)
    pages_path = os.path.join(CACHE, f"pages_{n_rows}.parquet")

    spark = build_spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}
    extras: dict = {"cpus": CPUS, "n_pages_rows": n_rows}

    t0 = time.perf_counter()
    gen_pages_parquet(spark, n_rows, pages_path)
    timings["gen_pages"] = round(time.perf_counter() - t0, 3)

    raw = raw_bytes_of(spark, pages_path)
    extras["pages_raw_bytes"] = raw

    from sparc.job import decode_job, encode_job

    # ---- headline: encode the pages table ---------------------------------
    # Two timed runs: "cold" pays the per-worker-process first-touch page
    # faults of this sandbox's VM (fresh Python workers); "warm" reuses the
    # same long-lived workers, which is the representative regime at scale
    # (a production worker encodes thousands of stripes, not one).  The
    # headline metric is the warm run; cold is reported alongside.
    df = spark.read.parquet(pages_path)
    # hash stripes + in-stripe (lang, warc_ts) sort: measured equal
    # compression to lang-salted clustering (the sort already groups
    # languages inside each stripe) at ~4x the throughput; lang_salted
    # remains the strategy for lang-partitioned layouts (tested in CI)
    # >=4 stripes/core: bounds each worker's resident footprint and matches
    # the many-stripes-per-executor shape of a real cluster run
    n_stripes = max(CPUS * 4, (raw >> 27))
    enc_walls = []
    for attempt in ("cold", "warm"):
        out_dir = os.path.join(CACHE, f"streams_{CPUS}_{n_rows}_{attempt}")
        shutil.rmtree(out_dir, ignore_errors=True)
        t0 = time.perf_counter()
        encode_job.run_encode(
            df,
            out_dir,
            strategy="hash",
            n_stripes=n_stripes,
            sort_within=["lang", "warc_ts"],
            fingerprint=f"bench-{n_rows}",
            resume=False,
        )
        enc_walls.append(time.perf_counter() - t0)
    enc_wall = enc_walls[-1]
    timings["encode_pages_cold"] = round(enc_walls[0], 3)
    timings["encode_pages"] = round(enc_wall, 3)
    extras["encode_gbps_cold"] = round(raw / enc_walls[0] / 1e9, 4)
    extras["encode_gbps"] = round(raw / enc_wall / 1e9, 4)
    ours_bytes = dir_bytes(out_dir)
    extras["ours_bytes_per_row"] = round(ours_bytes / n_rows, 2)

    # ---- reference: Spark's bundled orc-core writer, zstd (cold + warm) ---
    ref_walls = []
    for attempt in ("cold", "warm"):
        ref_dir = os.path.join(CACHE, f"ref_orc_{n_rows}_{attempt}")
        shutil.rmtree(ref_dir, ignore_errors=True)
        t0 = time.perf_counter()
        df.write.option("compression", "zstd").orc(ref_dir)
        ref_walls.append(time.perf_counter() - t0)
    ref_wall = ref_walls[-1]
    timings["reference_orc_write_cold"] = round(ref_walls[0], 3)
    timings["reference_orc_write"] = round(ref_wall, 3)
    ref_bytes = dir_bytes(ref_dir)
    extras["ref_bytes_per_row"] = round(ref_bytes / n_rows, 2)
    extras["size_vs_reference"] = round(ours_bytes / ref_bytes, 4)
    extras["ref_gbps"] = round(raw / ref_wall / 1e9, 4)
    extras["encode_vs_reference_wall"] = round(enc_wall / ref_wall, 4)

    # ---- decode the pages table back (cold + warm) ------------------------
    dec_walls = []
    for attempt in ("cold", "warm"):
        t0 = time.perf_counter()
        decoded = decode_job.run_decode(spark, out_dir)
        n_dec = decoded.count()
        dec_walls.append(time.perf_counter() - t0)
        assert n_dec == n_rows, f"decode row count {n_dec} != {n_rows}"
    dec_wall = dec_walls[-1]
    timings["decode_pages_cold"] = round(dec_walls[0], 3)
    timings["decode_pages"] = round(dec_wall, 3)
    extras["decode_gbps"] = round(raw / dec_wall / 1e9, 4)

    # ---- operator sample at the testdata scale factor ----------------------
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    for qname in [
        "roundtrip_documents",
        "roundtrip_lineitem",
        "encode_metrics_documents",
        "text_profile",
        "dedup_exact",
        "minhash_lsh_candidates",
        "simsearch_topk",
    ]:
        t0 = time.perf_counter()
        qs[qname](spark, SF_DIR).count()
        timings[qname] = round(time.perf_counter() - t0, 3)

    spark.stop()

    print(
        json.dumps(
            {
                "metric": "pages_encode_gbps",
                "value": extras["encode_gbps"],
                "unit": "GB/s",
                "queries": timings,
                "sf": sf,
                **extras,
            }
        )
    )


if __name__ == "__main__":
    main()
