"""Measure Spark's fixed per-job / per-Python-task cost floor on this host:
an (almost) no-op mapInArrow job with the same task shape as the decode,
vs a JVM-only aggregate job.  Usage: python scripts/spark_floor.py"""
import os
import sys
import time

sys.path.insert(0, ".")


def main():
    import bench
    import pyarrow as pa
    from pyspark.sql import functions as F

    spark = bench.build_spark(32)
    spark.sparkContext.setLogLevel("ERROR")

    def noop(batches):
        from sparc import runtime
        runtime.init_worker()
        n = 0
        for b in batches:
            n += b.num_rows
        yield pa.record_batch({"n": pa.array([n], pa.int64())})

    for n_units in (60, 32, 8, 2, 1):
        rows = [(f"p{i}", i % 2, 2) for i in range(n_units)]
        df = spark.createDataFrame(
            spark.sparkContext.parallelize(rows, min(n_units, 32)),
            "path string, shard int, n_shards int",
        )
        walls = []
        cpus = []
        for it in range(4):
            c0 = bench.proc_tree_cpu_seconds()
            t0 = time.perf_counter()
            df.mapInArrow(noop, "n long").agg(F.sum("n")).collect()
            walls.append(round(time.perf_counter() - t0, 3))
            cpus.append(round(bench.proc_tree_cpu_seconds() - c0, 2))
        print(f"mapInArrow noop {n_units} units: walls={walls} cpu={cpus}")

    walls = []
    for it in range(4):
        t0 = time.perf_counter()
        spark.range(1_000_000).agg(F.sum("id")).collect()
        walls.append(round(time.perf_counter() - t0, 3))
    print(f"jvm-only range agg: {walls}")
    spark.stop()


if __name__ == "__main__":
    main()
