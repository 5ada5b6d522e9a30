from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from sparkfusion.session import get_session

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_session("sparkfusion-tests", cpus=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
