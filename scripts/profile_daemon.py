"""Drop-in replacement for pyspark.daemon that cProfiles every worker
task and appends marshalled stats to /tmp/worker_prof/<pid>.pstats.
Enable with .config("spark.python.daemon.module", "scripts.profile_daemon")
(repo root must be on the workers' PYTHONPATH)."""
import cProfile
import os

import pyspark.worker as _worker
import pyspark.daemon as _daemon

_orig_main = _worker.main
os.makedirs("/tmp/worker_prof", exist_ok=True)


def _profiled_main(infile, outfile):
    pr = cProfile.Profile()
    pr.enable()
    try:
        return _orig_main(infile, outfile)
    finally:
        pr.disable()
        pr.dump_stats(f"/tmp/worker_prof/{os.getpid()}_{_counter()}.pstats")


_n = 0


def _counter():
    global _n
    _n += 1
    return _n


_worker.main = _profiled_main
_daemon.worker_main = _profiled_main  # daemon binds at import; rebind

if __name__ == "__main__":
    _daemon.manager()
