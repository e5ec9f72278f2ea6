"""Profile the pyscan encode job's phase breakdown at XL scale.

Decomposes one run_encode_paths call into: unit planning, the plan
count() job, the repartition+mapInArrow+parquet-write main job, and —
inside the main job — worker-side scan vs encode vs sink time (sampled
via an env-gated accumulator file).  Run on a quiet host; compares
against the process-pool ceiling for the same units.
"""
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from sparc.job import encode_job

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
ROWS = int(os.environ.get("PROF_ROWS", "900000"))
CACHE = "/tmp/sparc_bench"


def main():
    os.makedirs(CACHE, exist_ok=True)
    pages = os.path.join(CACHE, f"pages_{ROWS}_rg2m.parquet")
    spark = bench.build_spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(pages):
        bench.gen_pages_parquet(spark, ROWS, pages)
    raw = bench.raw_bytes_of(spark, pages)
    print(f"raw bytes: {raw/1e9:.3f} GB, rows {ROWS}")

    n_stripes = max(CPUS, (raw * 3 // 3) >> 25)
    per = max(ROWS // n_stripes, 1)

    # phase 1: planning (driver-side for <=64 files)
    files = sorted(
        os.path.join(pages, f) for f in os.listdir(pages)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    )
    for rep in range(3):
        out = os.path.join(CACHE, f"prof_py_{ROWS}_{rep}")
        shutil.rmtree(out, ignore_errors=True)
        t0 = time.perf_counter()
        units_df = encode_job._plan_units(spark, files, per)
        t_plan = time.perf_counter() - t0

        t0 = time.perf_counter()
        n_units = units_df.count()
        t_count = time.perf_counter() - t0

        t0 = time.perf_counter()
        res = encode_job.run_encode_units(
            spark, units_df, out,
            target_rows_per_stripe=per,
            fingerprint="prof", resume=False,
        )
        t_job = time.perf_counter() - t0
        # total as bench measures it (fresh planning + count inside)
        out2 = os.path.join(CACHE, f"prof_py2_{ROWS}_{rep}")
        shutil.rmtree(out2, ignore_errors=True)
        t0 = time.perf_counter()
        encode_job.run_encode_paths(
            spark, pages, out2, target_rows_per_stripe=per,
            fingerprint="prof2", resume=False,
        )
        t_total = time.perf_counter() - t0
        print(
            f"rep{rep}: plan={t_plan:.3f}s count={t_count:.3f}s "
            f"main_job={t_job:.3f}s total(paths)={t_total:.3f}s "
            f"units={n_units} gbps_main={raw/t_job/1e9:.3f} "
            f"gbps_total={raw/t_total/1e9:.3f}"
        )

    # pool ceiling for the same fixture
    walls, _, syss = bench._pool_encode_walls(ROWS, CPUS, rounds=3)
    k = min(range(len(walls)), key=lambda i: walls[i])
    print(f"pool: walls={[round(w,3) for w in walls]} best_gbps={raw/walls[k]/1e9:.3f}")
    print(f"canary: {bench.host_canary_seconds()}")
    spark.stop()


if __name__ == "__main__":
    main()
