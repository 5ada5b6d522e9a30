"""Bench contention flag: must not self-flag on its own JVM's load (r5
post-mortem — artifact flagged with loadavg 11.2 but foreign_cpu_frac 0.0)."""

from __future__ import annotations

import importlib.util


def _load_bench():
    spec = importlib.util.spec_from_file_location("bench", "/root/repo/bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_own_jvm_load_does_not_flag():
    b = _load_bench()
    # high loadavg from our own 32-thread JVM, zero foreign cpu → clean
    assert not b._is_contended(foreign_frac=0.0, load_start=11.2)
    assert not b._is_contended(foreign_frac=0.04, load_start=30.0)


def test_foreign_competitor_flags():
    b = _load_bench()
    assert b._is_contended(foreign_frac=0.06, load_start=0.1)
    assert b._is_contended(foreign_frac=0.5, load_start=5.0)


def test_loadavg_fallback_when_sampling_failed():
    b = _load_bench()
    # /proc/stat unavailable → fall back to the loadavg heuristic
    assert b._is_contended(foreign_frac=-1.0, load_start=2.5)
    assert not b._is_contended(foreign_frac=-1.0, load_start=0.5)


def test_empty_sf_dir_preserves_schemas(tmp_path, monkeypatch):
    """The trigger-zero streaming startup runs (BASELINE.md r13 rule) read
    16-row head twins that must carry the SAME arrow schemas as the source
    tables — especially events.ts's physical type (the r4 vintage lesson)."""
    import shutil

    import pyarrow.parquet as pq

    import bench

    d = bench._empty_sf_dir("/root/testdata/sf0.001")
    try:
        for t in ("events", "lineitem", "documents"):
            src = pq.read_schema(f"/root/testdata/sf0.001/{t}.parquet")
            twin = pq.read_schema(f"{d}/{t}.parquet")
            assert twin.names == src.names
            assert [f.type for f in twin] == [f.type for f in src], t
            assert pq.read_metadata(f"{d}/{t}.parquet").num_rows == 16
    finally:
        shutil.rmtree(d, ignore_errors=True)
