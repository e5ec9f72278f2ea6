"""Measure the Python-lane job floor: a noop mapInArrow over a tiny
LocalRelation at several task counts, vs the JVM-only job floor, with
many interleaved reps.  The XL decode's entire gap vs the reference
reader is this floor (decode_tax.py: noop_min ~= neardata_min), so
knowing its composition (per-job vs per-task, JVM vs Python lane)
decides which lever closes verdict item #1.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("REPS", "9"))


def med(xs):
    s = sorted(xs)
    return s[len(s) // 2]


def main():
    import bench

    spark = bench.build_spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    out = {"cpus": CPUS, "canary_start": bench.host_canary_seconds()}

    def noop(batches):
        import pyarrow as pa

        from sparc import runtime

        runtime.init_worker()
        n = 0
        for b in batches:
            n += b.num_rows
        yield pa.RecordBatch.from_pydict({"n": [n]})

    counts = [1, 8, 32, 64, 96]
    walls: dict[str, list[float]] = {}
    for rep in range(REPS + 1):
        for n_tasks in counts:
            rows = [(i,) for i in range(n_tasks)]
            df = spark.createDataFrame(rows, "i int")
            t0 = time.perf_counter()
            df.mapInArrow(noop, schema="n long").agg({"n": "sum"}).collect()
            w = time.perf_counter() - t0
            if rep:
                walls.setdefault(f"py_{n_tasks}", []).append(w)
        # JVM-only floor at 32 tasks
        df = spark.range(0, 32, 1, 32)
        t0 = time.perf_counter()
        df.agg({"id": "sum"}).collect()
        w = time.perf_counter() - t0
        if rep:
            walls.setdefault("jvm_32", []).append(w)
    for k, v in walls.items():
        out[f"{k}_med"] = round(med(v), 4)
        out[f"{k}_min"] = round(min(v), 4)
    out["canary_end"] = bench.host_canary_seconds()
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
