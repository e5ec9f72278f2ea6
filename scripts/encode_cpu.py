"""Encode CPU A/B: input-strategy engine encode vs reference ORC writer,
proc-tree core-seconds per GiB, interleaved. Usage: encode_cpu.py [n_rows]"""
import os
import shutil
import sys
import time

sys.path.insert(0, ".")
os.environ.setdefault("SPARC_BENCH_CACHE", "/tmp/sparc_bench")
CACHE = os.environ["SPARC_BENCH_CACHE"]


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    import bench
    from sparc.job import encode_job

    spark = bench.build_spark(32)
    spark.sparkContext.setLogLevel("ERROR")
    pages = os.path.join(CACHE, f"pages_{n_rows}_rg2m.parquet")
    bench.gen_pages_parquet(spark, n_rows, pages)
    raw = bench.raw_bytes_of(spark, pages)
    gib = raw / (1 << 30)
    df = spark.read.parquet(pages)
    print(f"raw {raw/1e9:.2f} GB, canary {bench.host_canary_seconds()}s")

    for i in range(4):
        inp_dir = os.path.join(CACHE, f"cpu_in_{n_rows}")
        shutil.rmtree(inp_dir, ignore_errors=True)
        c0 = bench.proc_tree_cpu_seconds(); t0 = time.perf_counter()
        encode_job.run_encode(
            df, inp_dir, strategy="input", sink="files",
            target_rows_per_stripe=max(n_rows // 32, 1),
            fingerprint=f"cpu-{n_rows}", resume=False,
        )
        w = time.perf_counter() - t0
        cpu = bench.proc_tree_cpu_seconds() - c0
        print(f"input iter{i}: wall={w:.2f}s cpu={cpu:.1f} ({cpu/gib:.1f} core-s/GiB)")

        ref_dir = os.path.join(CACHE, f"cpu_ref_{n_rows}")
        shutil.rmtree(ref_dir, ignore_errors=True)
        c0 = bench.proc_tree_cpu_seconds(); t0 = time.perf_counter()
        df.write.option("compression", "zstd").orc(ref_dir)
        w = time.perf_counter() - t0
        cpu = bench.proc_tree_cpu_seconds() - c0
        print(f"ref   iter{i}: wall={w:.2f}s cpu={cpu:.1f} ({cpu/gib:.1f} core-s/GiB)")
    print(f"end canary {bench.host_canary_seconds()}s")
    spark.stop()


if __name__ == "__main__":
    main()
