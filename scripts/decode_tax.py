"""Decompose the XL near-data decode wall: where does the Spark job tax go?

Measures, on the SAME encoded XL streams dir (3 GiB raw):
  - noop       : mapInArrow over the same unit LocalRelation with an empty
                 closure (pure job + task + worker-protocol floor)
  - manifests  : closure that only pq.read_table's each manifest (adds
                 footer fetch cost)
  - neardata   : the real run_decode_map octet aggregate (adds decode)
  - pool       : plain process-pool over identical units (no Spark)
  - ref        : spark.read.orc + in-JVM octet aggregate
Prints one JSON line with medians over 3 reps (first rep discarded).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARC_WARM_HEAP_BYTES", str(256 << 20))

CACHE = "/tmp/sparc_bench"
XL_ROWS = 900_000
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def med(xs):
    s = sorted(xs)
    return s[len(s) // 2]


def main():
    import bench
    from sparc.job import decode_job

    xl_ours = os.path.join(CACHE, f"streams_py_dec_{XL_ROWS}")
    xl_ref = os.path.join(CACHE, f"ref_orc_{XL_ROWS}_dec")
    xl_pages = os.path.join(CACHE, f"pages_{XL_ROWS}_rg2m.parquet")
    spark = bench.build_spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    xl_raw = bench.raw_bytes_of(spark, xl_pages)
    paths = decode_job._manifest_paths(xl_ours)
    out = {"xl_raw": xl_raw, "n_manifests": len(paths), "cpus": CPUS}
    out["canary_start"] = bench.host_canary_seconds()

    # unit list identical to run_decode paths mode
    target = CPUS
    n_shards = max(1, -(-target // max(len(paths), 1)))
    units = [(p, s, n_shards) for p in paths for s in range(n_shards)]
    n_parts = max(1, min(target, len(units)))
    rr = [u for j in range(n_parts) for u in units[j::n_parts]]
    out["n_units"] = len(units)

    def noop(batches):
        import pyarrow as pa

        from sparc import runtime

        runtime.init_worker()
        n = 0
        for b in batches:
            n += b.num_rows
        yield pa.RecordBatch.from_pydict({"n": [n]})

    def manifests_only(batches):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from sparc import runtime

        runtime.init_worker()
        n = 0
        for b in batches:
            for path in b.column("path").to_pylist():
                t = pq.read_table(path, use_threads=False)
                n += t.num_rows
        yield pa.RecordBatch.from_pydict({"n": [n]})

    def run_fn(fn):
        df = spark.createDataFrame(rr, "path string, shard int, n_shards int")
        return df.mapInArrow(fn, schema="n long").agg(F.sum("n")).collect()[0][0]

    walls: dict[str, list[float]] = {k: [] for k in
                                     ("noop", "manifests", "neardata", "ref")}
    for rep in range(4):
        t0 = time.perf_counter()
        run_fn(noop)
        w = time.perf_counter() - t0
        if rep:
            walls["noop"].append(w)
        t0 = time.perf_counter()
        run_fn(manifests_only)
        w = time.perf_counter() - t0
        if rep:
            walls["manifests"].append(w)
        t0 = time.perf_counter()
        got = (
            decode_job.run_decode_map(
                spark, xl_ours, bench._octets_map, "octets long, rows long",
                columns=["url", "html", "text", "lang"],
            )
            .agg(F.sum("octets"), F.sum("rows").alias("r"))
            .collect()[0]
        )
        assert got["r"] == XL_ROWS
        w = time.perf_counter() - t0
        if rep:
            walls["neardata"].append(w)
        force = F.sum(
            F.octet_length("html") + F.octet_length("text")
            + F.octet_length("url") + F.octet_length("lang")
        )
        t0 = time.perf_counter()
        spark.read.orc(xl_ref).select(force).collect()
        w = time.perf_counter() - t0
        if rep:
            walls["ref"].append(w)
    for k, v in walls.items():
        out[f"{k}_walls"] = [round(x, 3) for x in v]
        out[f"{k}_med"] = round(med(v), 3)
    pool_walls, _ = bench._pool_decode_walls(xl_ours, CPUS, rounds=3)
    out["pool_walls"] = [round(x, 3) for x in pool_walls]
    out["pool_med"] = round(med(pool_walls), 3)
    out["canary_end"] = bench.host_canary_seconds()
    out["neardata_gbps"] = round(xl_raw / out["neardata_med"] / 1e9, 3)
    out["ref_gbps"] = round(xl_raw / out["ref_med"] / 1e9, 3)
    out["pool_gbps"] = round(xl_raw / out["pool_med"] / 1e9, 3)
    out["ratio"] = round(out["neardata_med"] / out["ref_med"], 3)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
