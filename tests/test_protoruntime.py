"""protoruntime discovery: this container has no pip-installed protobuf but
does carry a vendored pure-python runtime, so discovery must succeed, cache,
and produce the worker env overrides that ship the runtime to spawned
Python workers (see test_streaming.py::test_transform_with_state_counts for
the end-to-end TWS query that consumes all of this)."""

from __future__ import annotations

import sys

from sparkfusion.protoruntime import ensure_protobuf_runtime, worker_env_overrides


def test_discovery_makes_protobuf_importable():
    ok, extra = ensure_protobuf_runtime()
    assert ok
    import google.protobuf  # noqa: F401 — must not raise after discovery

    if extra is not None:
        # append, never prepend: a real site-packages install must win
        assert sys.path[-1] == extra or extra in sys.path[1:]
        assert sys.path[0] != extra


def test_discovery_is_cached():
    assert ensure_protobuf_runtime() is ensure_protobuf_runtime()


def test_worker_env_overrides_shape():
    assert worker_env_overrides(None) == {}
    env = worker_env_overrides("/some/vendored/root")
    assert env["PYTHONPATH"] == "/some/vendored/root"
    assert env["TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK"] == "true"
