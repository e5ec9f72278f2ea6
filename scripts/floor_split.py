"""Split the Python-lane no-op job CPU between the JVM and the Python
workers, and check whether workers are actually reused (PID churn)."""
import os
import sys
import time

sys.path.insert(0, ".")


def per_pid_cpu():
    clk = os.sysconf("SC_CLK_TCK")
    out = {}
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/stat", "rb") as f:
                rest = f.read().rsplit(b") ", 1)
                name = rest[0].split(b"(", 1)[1]
                parts = rest[1].split()
        except (OSError, IndexError):
            continue
        out[int(d)] = (
            name.decode(errors="replace"),
            (int(parts[11]) + int(parts[12]) + int(parts[13]) + int(parts[14])) / clk,
        )
    return out


def main():
    import bench
    import pyarrow as pa
    from pyspark.sql import functions as F

    spark = bench.build_spark(32)
    spark.sparkContext.setLogLevel("ERROR")

    def noop(batches):
        import os as _os
        pid = _os.getpid()
        n = 0
        for b in batches:
            n += b.num_rows
        yield pa.record_batch({"n": pa.array([pid], pa.int64())})

    rows = [(f"p{i}", i % 2, 2) for i in range(32)]
    df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 32),
        "path string, shard int, n_shards int",
    )
    pid_sets = []
    for it in range(4):
        before = per_pid_cpu()
        t0 = time.perf_counter()
        got = df.mapInArrow(noop, "n long").collect()
        w = time.perf_counter() - t0
        after = per_pid_cpu()
        pids = sorted({r["n"] for r in got})
        pid_sets.append(set(pids))
        by_name = {}
        for pid, (name, cpu) in after.items():
            prev = before.get(pid, (name, 0.0))[1]
            d = cpu - prev
            if d > 0.01:
                by_name.setdefault(name, [0.0, 0])
                by_name[name][0] += d
                by_name[name][1] += 1
        print(f"iter{it}: wall={w:.3f} workers={len(pids)} "
              + " ".join(f"{k}:{v[0]:.2f}({v[1]}p)" for k, v in sorted(by_name.items(), key=lambda x: -x[1][0])[:6]))
    for i in range(1, len(pid_sets)):
        same = len(pid_sets[i] & pid_sets[0])
        print(f"iter{i} reuses {same}/{len(pid_sets[i])} worker pids from iter0")
    spark.stop()


if __name__ == "__main__":
    main()
