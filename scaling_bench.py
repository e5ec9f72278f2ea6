"""Two-parallelism scaling evidence for the encode job (north rule).

The north rule requires >=0.8 encode-throughput scaling efficiency from N
to 4N executors.  No real cluster exists in this sandbox, so (per the
driver instruction) we run the same job on the same input at two
parallelism levels and report throughput at both plus the efficiency
  eff = (T_N / T_4N) / 4  ==  throughput_4N / (4 * throughput_N).

Because this VM's vCPUs are oversubscribed, the script first calibrates
the *hardware's own* scaling ceiling with pure-CPU busy loops (no memory,
no IO); the job's efficiency is reported raw and relative to that
ceiling.  Each timed point is the best of ``RUNS`` warm runs (the VM's
timing noise is 2-4x; cold runs pay one-off page-fault costs that a
long-lived production executor does not).

Usage: python scaling_bench.py [N 4N ...]   (default pairs: 2/8 and 8/32)
Writes BENCH/scaling.json and prints one JSON line per pair.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import shutil
import sys
import time

RUNS = 2
CACHE = os.environ.get("SPARC_BENCH_CACHE", "/tmp/sparc_bench")
N_ROWS = int(os.environ.get("SPARC_BENCH_ROWS", "300000"))


def _burn(q):
    x = 0
    t0 = time.perf_counter()
    for i in range(20_000_000):
        x += i
    q.put(time.perf_counter() - t0)


def cpu_ceiling(n: int, n4: int) -> float:
    """Hardware scaling ceiling: aggregate busy-loop throughput ratio."""

    def agg(nproc: int) -> float:
        q = mp.Queue()
        ps = [mp.Process(target=_burn, args=(q,)) for _ in range(nproc)]
        t0 = time.perf_counter()
        for p in ps:
            p.start()
        for p in ps:
            p.join()
        wall = time.perf_counter() - t0
        for _ in range(nproc):
            q.get()
        return nproc / wall

    a_n, a_4n = agg(n), agg(n4)
    return (a_4n / a_n) / (n4 / n)


def encode_wall(cpus: int, n_stripes: int, raw_bytes: list) -> float:
    """Best-of-RUNS warm encode wall at local[cpus] over the cached pages."""
    from pyspark.sql import SparkSession

    import bench as bench_mod
    from sparc.job import encode_job

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"sparc-scale-{cpus}")
        .config("spark.sql.shuffle.partitions", str(max(cpus * 2, 8)))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    pages_path = os.path.join(CACHE, f"pages_{N_ROWS}.parquet")
    bench_mod.gen_pages_parquet(spark, N_ROWS, pages_path)
    if not raw_bytes:
        raw_bytes.append(bench_mod.raw_bytes_of(spark, pages_path))
    df = spark.read.parquet(pages_path)
    walls = []
    for r in range(RUNS + 1):  # +1 cold warm-up run, not timed
        out_dir = os.path.join(CACHE, f"scale_{cpus}_{r}")
        shutil.rmtree(out_dir, ignore_errors=True)
        t0 = time.perf_counter()
        encode_job.run_encode(
            df, out_dir, strategy="hash", n_stripes=n_stripes,
            sort_within=["lang", "warc_ts"], fingerprint=f"scale-{cpus}",
            resume=False,
        )
        walls.append(time.perf_counter() - t0)
        shutil.rmtree(out_dir, ignore_errors=True)
    spark.stop()
    return min(walls[1:])


def main() -> None:
    pairs = []
    args = [int(a) for a in sys.argv[1:]]
    if args:
        pairs = [(args[i], args[i + 1]) for i in range(0, len(args), 2)]
    else:
        pairs = [(2, 8), (8, 32)]
    os.makedirs("BENCH", exist_ok=True)
    results = []
    raw_bytes: list = []
    for n, n4 in pairs:
        ceiling = cpu_ceiling(n, n4)
        n_stripes = max(n4 * 4, 32)
        t_n = encode_wall(n, n_stripes, raw_bytes)
        t_4n = encode_wall(n4, n_stripes, raw_bytes)
        raw = raw_bytes[0]
        eff = (t_n / t_4n) / (n4 / n)
        rec = {
            "pair": f"local[{n}] -> local[{n4}]",
            "n_rows": N_ROWS,
            "raw_bytes": raw,
            "n_stripes": n_stripes,
            "wall_n_sec": round(t_n, 3),
            "wall_4n_sec": round(t_4n, 3),
            "gbps_n": round(raw / t_n / 1e9, 4),
            "gbps_4n": round(raw / t_4n / 1e9, 4),
            "scaling_efficiency": round(eff, 4),
            "hardware_ceiling_efficiency": round(ceiling, 4),
            "efficiency_vs_ceiling": round(eff / ceiling, 4),
        }
        results.append(rec)
        print(json.dumps(rec))
    with open("BENCH/scaling.json", "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
