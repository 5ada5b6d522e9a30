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


# Queries the driver has NEVER sampled in any CORRECTNESS_r* artifact
# (computed r9 from registered-names minus the union of all driver samples).
# These are exactly the conf-sensitive class — RocksDB state store, vendored
# protobuf runtime, warehouse/checkpoint dirs — that historically only breaks
# under the driver's plain session (r4/r5 failure mode). Until the driver's
# sample lottery reaches them, this subprocess run IS their driver evidence.
NEVER_SAMPLED = [
    "a28_pivot",
    "a32_global_rank",  # added r11 (local round), never driver-sampled yet
    "a29_unpivot",
    "boot1_bootstrap_ci",
    "bpe3_encode_counts",
    "dq7_table_fingerprint",
    "dq8_benford",
    "dsir1_importance_select",
    "j13_salted_skew_join",
    "mix2_temperature_sample",
    "pack2_length_buckets",
    "semdedup1_cluster_prune",
    "sim_ivfpq_store_probe",
    "stream_cdc_keep_latest",
    "stream_ivfpq_ingest",
    "stream_recent_events_tws",
    "stream_session_timeout_tws",
    "stream_stateful_counts_tws",
    "stream_stream_left_outer",
    "stream_user_type_counts_tws",
    "tok1_oov_rate",
    "tok2_vocab_sweep",
    "ts7_acf",
    "ts8_seasonal_decompose",
    "ts9_rolling_median",
    "x10_observed_metrics",
    "x11_mapinarrow_stats",
    "x8_arrow_user_gaps",
    "x9_udtf_analyze_schema",
]


def _run_plain(queries: list[str], timeout: int = 600) -> None:
    proc = subprocess.run(
        [
            sys.executable,
            "tools/check_oracle.py",
            "/root/testdata/sf0.01",
            *queries,
            "--plain",
        ],
        cwd="/root/repo",
        capture_output=True,
        text=True,
        timeout=timeout,
    )
    tail = "\n".join(proc.stdout.splitlines()[-35:])
    assert proc.returncode == 0, f"plain-session parity failed:\n{tail}\n{proc.stderr[-2000:]}"
    assert f"{len(queries)} passed, 0 failed" in proc.stdout, tail


def test_plain_session_slice_matches_oracle():
    _run_plain(PLAIN_SLICE)


def test_plain_session_never_driver_sampled():
    """Fresh-process plain-session run of every query the driver has never
    sampled (r8 verdict item 1) — streaming/tws first since they carry the
    most session-state risk."""
    _run_plain(NEVER_SAMPLED, timeout=1200)
