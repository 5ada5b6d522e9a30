"""Tests for the stalest-first verification rotation — the ordering the
driver's front-50 correctness window consumes. No Spark needed."""

from __future__ import annotations

import json

from sparkfusion.suite import _verification_age


def _write(tmp_path, rnd, rows):
    (tmp_path / f"CORRECTNESS_r{rnd:02d}.json").write_text(json.dumps(rows))


GREEN = {"rows_match": True, "schema_match": True, "hash_match": True, "err": None}
ERR = {"rows_match": None, "schema_match": None, "hash_match": None, "err": "boom"}
MISMATCH = {"rows_match": True, "schema_match": True, "hash_match": False, "err": None}
ROWS_ONLY = {
    "rows_match": None,
    "schema_match": None,
    "hash_match": None,
    "spark_rows": 0,
    "err": "no_oracle",
}


def test_green_rounds_tracked_and_errors_void(tmp_path):
    _write(tmp_path, 1, {"a": GREEN, "b": GREEN, "c": ROWS_ONLY})
    _write(tmp_path, 2, {"a": GREEN, "b": ERR})
    ages = _verification_age(str(tmp_path))
    assert ages["a"] == 2  # re-greened in r2
    assert ages["b"] == -1  # error newer than last green → voided, re-checks FIRST
    assert ages["c"] == 1  # rows-only check that ran counts as verified
    assert "never_seen" not in ages


def test_mismatch_voids_like_error(tmp_path):
    _write(tmp_path, 3, {"q": GREEN})
    _write(tmp_path, 4, {"q": MISMATCH})
    assert _verification_age(str(tmp_path))["q"] == -1


def test_voided_queries_front_even_never_green(tmp_path):
    # an errored-only query (never green) also takes priority age -1
    _write(tmp_path, 2, {"q": ERR})
    assert _verification_age(str(tmp_path))["q"] == -1


def test_regreen_after_error_restores_age(tmp_path):
    _write(tmp_path, 1, {"q": GREEN})
    _write(tmp_path, 2, {"q": ERR})
    _write(tmp_path, 3, {"q": GREEN})
    assert _verification_age(str(tmp_path))["q"] == 3


def test_registry_orders_stalest_first():
    # the live registry invariant the driver window depends on: every
    # never-verified/voided (age-0) query precedes every aged query, and
    # aged queries are non-decreasing in verification age
    from sparkfusion.suite import queries

    names = list(queries())
    ages = _verification_age()
    zero = [n for n in names if ages.get(n, 0) <= 0]
    aged_seq = [ages[n] for n in names if ages.get(n, 0) > 0]
    if zero and aged_seq:
        pos = {n: i for i, n in enumerate(names)}
        assert max(pos[n] for n in zero) < min(
            pos[n] for n in names if ages.get(n, 0) > 0
        )
    assert aged_seq == sorted(aged_seq)


def test_malformed_artifacts_are_skipped(tmp_path):
    (tmp_path / "CORRECTNESS_r01.json").write_text("[1, 2, 3]")  # not a dict
    _write(tmp_path, 2, {"q": GREEN, "junk": None})  # null row
    (tmp_path / "CORRECTNESS_r03.json").write_text("{not json")
    ages = _verification_age(str(tmp_path))
    assert ages == {"q": 2}
