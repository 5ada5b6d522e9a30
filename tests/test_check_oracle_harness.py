"""Oracle-harness hardening: --dump-mismatch writes both engines' rows, and
--plain mode exists for driver-parity runs (VERDICT r5 #2/#3)."""

from __future__ import annotations

import importlib.util
import os
import sys


def _load_check_oracle():
    spec = importlib.util.spec_from_file_location(
        "check_oracle", "/root/repo/tools/check_oracle.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_dump_mismatch_on_deliberate_value_diff(spark, tmp_path, monkeypatch):
    """A query whose Spark result deliberately disagrees with its oracle must
    fail AND leave both normalized row dumps behind for diagnosis."""
    co = _load_check_oracle()

    import __spark_entry__ as e

    monkeypatch.setattr(
        e,
        "queries",
        lambda: {
            "deliberate_diff": lambda s, sf: s.createDataFrame(
                [(1, 10)], "k int, v int"
            )
        },
    )
    monkeypatch.setattr(e, "oracle_sql", lambda: {"deliberate_diff": "SELECT 1 AS k, 11 AS v"})
    monkeypatch.setattr(
        sys,
        "argv",
        [
            "check_oracle.py",
            "/root/testdata/sf0.001",
            "deliberate_diff",
            "--dump-mismatch",
            str(tmp_path),
        ],
    )
    rc = co.main()
    assert rc == 1
    spark_dump = tmp_path / "deliberate_diff.spark.txt"
    duck_dump = tmp_path / "deliberate_diff.duckdb.txt"
    assert spark_dump.exists() and duck_dump.exists()
    assert "10" in spark_dump.read_text()
    assert "11" in duck_dump.read_text()


def test_dump_rows_unit(tmp_path):
    co = _load_check_oracle()
    co._dump_rows(str(tmp_path / "sub"), "q", "spark", ["a", "b"], [(1, 2), (3, 4)])
    out = (tmp_path / "sub" / "q.spark.txt").read_text().splitlines()
    assert out[0] == "a\tb"
    assert out[1] == "(1, 2)"


def test_matching_query_writes_no_dump(spark, tmp_path, monkeypatch):
    co = _load_check_oracle()

    import __spark_entry__ as e

    monkeypatch.setattr(
        e,
        "queries",
        lambda: {"agree": lambda s, sf: s.createDataFrame([(1,)], "k int")},
    )
    monkeypatch.setattr(e, "oracle_sql", lambda: {"agree": "SELECT 1 AS k"})
    monkeypatch.setattr(
        sys,
        "argv",
        ["check_oracle.py", "/root/testdata/sf0.001", "agree",
         "--dump-mismatch", str(tmp_path / "none")],
    )
    assert co.main() == 0
    assert not os.path.exists(str(tmp_path / "none"))
