"""Worker-protocol tuning in sparc.runtime.init_worker.

The zipimport patch must be SURGICAL: cache invalidation is skipped only
for zips under SPARK_HOME (immutable install artifacts re-scanned by
worker_util.setup_spark_files on every task), while zips anywhere else —
the runtime-added --py-files location — keep full invalidation
semantics, or addPyFile after the first task would silently stop
working."""

import gc
import importlib
import os
import sys
import zipfile
import zipimport

import pytest

from sparc import runtime


def _make_zip(path: str, member: str, body: str = "x = 1\n") -> None:
    with zipfile.ZipFile(path, "a") as z:
        z.writestr(member, body)


@pytest.fixture
def patched_runtime(tmp_path, monkeypatch):
    """Run init_worker against a fake SPARK_HOME, restoring global state."""
    fake_home = tmp_path / "spark_home"
    fake_home.mkdir()
    monkeypatch.setenv("SPARK_HOME", str(fake_home))
    orig_inval = zipimport.zipimporter.invalidate_caches
    had_flag = hasattr(zipimport.zipimporter, "_sparc_inval")
    orig_tuned = runtime._worker_tuned
    runtime._worker_tuned = False
    if had_flag:
        del zipimport.zipimporter._sparc_inval
        zipimport.zipimporter.invalidate_caches = orig_inval
    try:
        runtime.init_worker()
        yield fake_home
    finally:
        zipimport.zipimporter.invalidate_caches = orig_inval
        if hasattr(zipimport.zipimporter, "_sparc_inval"):
            del zipimport.zipimporter._sparc_inval
        runtime._worker_tuned = orig_tuned


def test_sparkhome_zip_invalidation_skipped(patched_runtime, tmp_path):
    home_zip = str(patched_runtime / "lib.zip")
    _make_zip(home_zip, "mod_a.py")
    imp = zipimport.zipimporter(home_zip)
    assert imp.find_spec("mod_a") is not None
    # append a new member; a skipped invalidation must keep the stale
    # directory (that staleness is exactly the per-task work we avoid)
    _make_zip(home_zip, "mod_b.py")
    imp.invalidate_caches()
    assert imp.find_spec("mod_b") is None


def test_external_zip_invalidation_kept(patched_runtime, tmp_path):
    ext_zip = str(tmp_path / "pyfiles.zip")
    _make_zip(ext_zip, "mod_c.py")
    imp = zipimport.zipimporter(ext_zip)
    assert imp.find_spec("mod_c") is not None
    _make_zip(ext_zip, "mod_d.py")
    imp.invalidate_caches()  # NOT under SPARK_HOME: full semantics
    assert imp.find_spec("mod_d") is not None


def test_import_time_heap_frozen(patched_runtime):
    # the daemon's between-task gc.collect() only scans the young
    # generations once the module heap is frozen
    assert gc.get_freeze_count() > 0


def test_init_worker_idempotent(patched_runtime):
    before = zipimport.zipimporter.invalidate_caches
    runtime._worker_tuned = False
    runtime.init_worker()  # second call must not re-wrap the wrapper
    assert zipimport.zipimporter.invalidate_caches is before


def test_prefix_match_respects_path_boundary(patched_runtime, tmp_path):
    # /.../spark_home-extra must NOT be treated as inside /.../spark_home
    sibling = str(patched_runtime) + "-extra"
    os.makedirs(sibling, exist_ok=True)
    sib_zip = os.path.join(sibling, "lib.zip")
    _make_zip(sib_zip, "mod_e.py")
    imp = zipimport.zipimporter(sib_zip)
    assert imp.find_spec("mod_e") is not None
    _make_zip(sib_zip, "mod_f.py")
    imp.invalidate_caches()
    assert imp.find_spec("mod_f") is not None
