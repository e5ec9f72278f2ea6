"""Decode A/B dissection: Spark near-data decode vs a plain
multiprocessing pool running the IDENTICAL per-stripe work over the same
files-sink stripes, vs the reference spark.read.orc aggregate.

Separates Spark orchestration cost from the engine's parallel ceiling on
this host.  Usage: python scripts/decode_ab.py [n_rows]
"""
import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, ".")
os.environ.setdefault("SPARC_BENCH_CACHE", "/tmp/sparc_bench")
CACHE = os.environ["SPARC_BENCH_CACHE"]


def _pool_decode_unit(args):
    """One (manifest-path, shard, n_shards) scan unit: same work as
    _decode_paths_factory, minus Spark."""
    path, shard, n_shards, streams_dir = args
    from sparc import runtime
    runtime.init_worker()
    import pyarrow as pa
    import pyarrow.parquet as pq
    import mmap as mmap_mod
    from sparc.engine import stripe as stripe_mod

    t = pq.read_table(path)
    sids = t["stripe_id"].to_pylist()
    total = 0
    rows = 0
    for i in range(shard, len(sids), n_shards):
        footer = json.loads(t["data"][i].as_py().decode())
        spath = footer["stripe_file"]
        if not os.path.isabs(spath):
            spath = os.path.join(streams_dir, spath)
        with open(spath, "rb") as f:
            mm = mmap_mod.mmap(f.fileno(), 0, access=mmap_mod.ACCESS_READ)
        mv = memoryview(mm)
        streams = {}
        for cname, kind, off, ln in footer["stream_spans"]:
            if kind == "BLOOM_FILTER_UTF8":
                continue
            streams[(cname, kind)] = mv[off : off + ln]
        out = stripe_mod.decode_stripe(streams, footer)
        import pyarrow.compute as pc
        for name in ("url", "html", "text", "lang"):
            col = out[name]
            if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
                col = pc.cast(col, pa.large_binary())
            total += pc.sum(pc.binary_length(col)).as_py() or 0
        rows += out.num_rows
    return total, rows


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    os.makedirs(CACHE, exist_ok=True)
    import bench
    from sparc.job import encode_job, decode_job
    from pyspark.sql import functions as F

    spark = bench.build_spark(32)
    spark.sparkContext.setLogLevel("ERROR")
    pages = os.path.join(CACHE, f"pages_{n_rows}_rg2m.parquet")
    bench.gen_pages_parquet(spark, n_rows, pages)
    raw = bench.raw_bytes_of(spark, pages)
    print(f"raw {raw/1e9:.2f} GB")
    inp_dir = os.path.join(CACHE, f"ab_streams_{n_rows}")
    if not os.path.exists(inp_dir):
        t0 = time.perf_counter()
        encode_job.run_encode(
            spark.read.parquet(pages), inp_dir,
            target_rows_per_stripe=max(n_rows // 32, 1),
            fingerprint=f"ab-{n_rows}", strategy="input", sink="files",
        )
        print(f"encode {time.perf_counter()-t0:.2f}s")
    ref_dir = os.path.join(CACHE, f"ab_ref_{n_rows}")
    if not os.path.exists(ref_dir):
        spark.read.parquet(pages).write.option("compression", "zstd").orc(ref_dir)

    force = F.sum(
        F.octet_length("html") + F.octet_length("text")
        + F.octet_length("url") + F.octet_length("lang")
    )

    canary = bench.host_canary_seconds()
    print(f"canary {canary}s")

    # --- pool decode (engine ceiling, no Spark) ---
    paths = decode_job._manifest_paths(inp_dir)
    n_shards = max(1, -(-32 // max(len(paths), 1)))
    units = [(p, s, n_shards, inp_dir) for p in paths for s in range(n_shards)]
    print(f"{len(paths)} manifests, {len(units)} units")
    for npool in (32,):
        with mp.Pool(npool) as pool:
            for it in range(3):
                t0 = time.perf_counter()
                res = pool.map(_pool_decode_unit, units)
                w = time.perf_counter() - t0
                rows = sum(r[1] for r in res)
                print(f"pool[{npool}] iter{it}: {w:.3f}s {raw/w/1e9:.2f} GB/s rows={rows}")

    # --- Spark near-data decode ---
    for it in range(4):
        t0 = time.perf_counter()
        got = (
            decode_job.run_decode_map(
                spark, inp_dir, bench._octets_map, "octets long, rows long",
                columns=["url", "html", "text", "lang"],
            )
            .agg(F.sum("octets"), F.sum("rows").alias("r"))
            .collect()[0]
        )
        w = time.perf_counter() - t0
        print(f"spark neardata iter{it}: {w:.3f}s {raw/w/1e9:.2f} GB/s rows={got['r']}")

    # --- reference read ---
    for it in range(3):
        t0 = time.perf_counter()
        spark.read.orc(ref_dir).select(force).collect()
        w = time.perf_counter() - t0
        print(f"ref orc read iter{it}: {w:.3f}s {raw/w/1e9:.2f} GB/s")

    print(f"end canary {bench.host_canary_seconds()}s")
    spark.stop()


if __name__ == "__main__":
    main()
