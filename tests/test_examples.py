"""Integration smoke: the whole example gallery must run exception-free at
sf0.001 — the in-process analog of ``scripts/run_examples.sh`` (which mirrors
the reference's ``scripts/run_examples.sh`` one-pass gallery run). Each
example's ``main`` executes against the shared test session (``get_session``
is getOrCreate, so no second JVM spins up); a raise anywhere fails the test.
"""

from __future__ import annotations

import importlib.util
import inspect
import os

import pytest

EX_DIR = os.path.join(os.path.dirname(__file__), "..", "examples")
EXAMPLES = sorted(f[:-3] for f in os.listdir(EX_DIR) if f.endswith(".py"))


def _load(name: str):
    spec = importlib.util.spec_from_file_location(
        f"examples_{name}", os.path.join(EX_DIR, f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_gallery_is_complete():
    # the runner and this smoke cover the same set; a new example file is
    # picked up by both automatically
    assert len(EXAMPLES) >= 6, EXAMPLES


@pytest.mark.parametrize("name", EXAMPLES)
def test_example_runs(spark, name):
    mod = _load(name)
    sig = inspect.signature(mod.main)
    if "sf_dir" in sig.parameters:
        mod.main("/root/testdata/sf0.001")
    else:
        mod.main()
