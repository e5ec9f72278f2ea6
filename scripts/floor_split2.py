"""Which python pids burn the per-task CPU: the reused workers, or other
forked processes?  Also records minor-fault counts (COW/first-touch)."""
import os
import sys
import time

sys.path.insert(0, ".")


def per_pid():
    clk = os.sysconf("SC_CLK_TCK")
    out = {}
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/stat", "rb") as f:
                rest = f.read().rsplit(b") ", 1)
                name = rest[0].split(b"(", 1)[1]
                p = rest[1].split()
        except (OSError, IndexError):
            continue
        out[int(d)] = (
            name.decode(errors="replace"),
            int(p[11]) / clk,  # utime
            int(p[7]),   # minflt
            int(p[1]),   # ppid
            int(p[12]) / clk,  # stime
        )
    return out


def main():
    import bench
    import pyarrow as pa

    spark = bench.build_spark(32)
    spark.sparkContext.setLogLevel("ERROR")

    def noop(batches):
        import os as _os
        n = 0
        for b in batches:
            n += b.num_rows
        yield pa.record_batch({"n": pa.array([_os.getpid()], pa.int64())})

    rows = [(f"p{i}", i % 2, 2) for i in range(32)]
    df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 32),
        "path string, shard int, n_shards int",
    )
    df.mapInArrow(noop, "n long").collect()  # warm
    for it in range(2):
        before = per_pid()
        got = df.mapInArrow(noop, "n long").collect()
        after = per_pid()
        worker_pids = {r["n"] for r in got}
        wcpu = ncpu = 0.0
        wfault = nfault = 0
        new_pids = 0
        for pid, (name, cpu, mf, ppid) in after.items():
            if "python" not in name and "java" not in name:
                continue
            pname, pcpu, pmf, _ = before.get(pid, (name, 0.0, 0, 0))
            d = cpu - pcpu
            df_ = mf - pmf
            if pid in worker_pids:
                wcpu += d; wfault += df_
            elif "python" in name:
                if pid not in before:
                    new_pids += 1
                ncpu += d; nfault += df_
        jcpu = sum(
            (cpu - before.get(pid, ("", 0, 0, 0))[1])
            for pid, (name, cpu, mf, pp) in after.items() if "java" in name
        )
        print(f"iter{it}: workers cpu={wcpu:.2f} faults={wfault}  "
              f"other-python cpu={ncpu:.2f} faults={nfault} newpids={new_pids}  "
              f"jvm cpu={jcpu:.2f}")
    spark.stop()


if __name__ == "__main__" and len(sys.argv) == 1:
    main()

# quick pid-level dump variant
def dump():
    import bench
    import pyarrow as pa

    spark = bench.build_spark(32)
    spark.sparkContext.setLogLevel("ERROR")

    def noop(batches):
        import os as _os
        n = 0
        for b in batches:
            n += b.num_rows
        yield pa.record_batch({"n": pa.array([_os.getpid()], pa.int64())})

    rows = [(f"p{i}", i % 2, 2) for i in range(32)]
    df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 32),
        "path string, shard int, n_shards int",
    )
    df.mapInArrow(noop, "n long").collect()
    before = per_pid()
    got = df.mapInArrow(noop, "n long").collect()
    after = per_pid()
    worker_pids = {r["n"] for r in got}
    me = os.getpid()
    rowsout = []
    for pid, (name, cpu, mf, ppid, st) in after.items():
        if "python" not in name:
            continue
        prev = before.get(pid, (name, 0.0, 0, 0, 0.0))
        d = cpu - prev[1]
        ds = st - prev[4]
        if d + ds > 0.05:
            tag = "WORKER" if pid in worker_pids else ("DRIVER" if pid == me else "other")
            try:
                cmd = open(f"/proc/{pid}/cmdline").read().replace("\0", " ")[:80]
            except OSError:
                cmd = "?"
            rowsout.append((d+ds, pid, ppid, tag, f"u={d:.2f} s={ds:.2f} "+cmd))
    for d, pid, ppid, tag, cmd in sorted(rowsout, reverse=True)[:40]:
        print(f"{d:6.2f} pid={pid} ppid={ppid} {tag} {cmd}")
    spark.stop()

if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "dump":
    dump()
