"""Driver-parity gate: the external driver runs every query on its OWN plain
SparkSession (no sparkfusion confs). Any query that silently depends on
``get_session()``'s confs passes local checks but fails the driver — the r5
failure mode. This test runs the conf-risk slice (queries that never route a
read through ``table()``/``load_star()``, i.e. the ``_ensure_read_confs``
bypass set, plus the three r5 driver-red sources queries) through
``tools/check_oracle.py --plain`` in a SUBPROCESS, so the session really is
plain rather than the test-session singleton."""

from __future__ import annotations

import subprocess
import sys

# queries whose bodies never call table()/load_star()/events_with_ts directly
# (AST scan; some route confs through module helpers — those passing here is
# the proof), plus the r5 driver-mismatch set.
PLAIN_SLICE = [
    "s7_memory_batch",
    "s8_literal_dataframe",
    "cal1_calendar_dim",
    "s21_python_datasource",
    "s22_python_stream_source",
    "s23_jsonl_sink_roundtrip",
    "x3_udf_struct_1brc",
    "ts1_resample_gapfill",
    "ts4_ohlc_hourly",
    "fn1_funnel",
    "scd2_user_state",
    "j9_asof_join",
    "w7_running_distinct",
    "text_pii_scan",
    "text_corpus_stats",
]


def test_plain_session_slice_matches_oracle():
    proc = subprocess.run(
        [
            sys.executable,
            "tools/check_oracle.py",
            "/root/testdata/sf0.01",
            *PLAIN_SLICE,
            "--plain",
        ],
        cwd="/root/repo",
        capture_output=True,
        text=True,
        timeout=600,
    )
    tail = "\n".join(proc.stdout.splitlines()[-25:])
    assert proc.returncode == 0, f"plain-session parity failed:\n{tail}\n{proc.stderr[-2000:]}"
    assert f"{len(PLAIN_SLICE)} passed, 0 failed" in proc.stdout, tail
