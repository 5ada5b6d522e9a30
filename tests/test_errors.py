"""Typed error hierarchy (reference parity: src/error.rs:15-49 UtilsError
variants). One test per category, plus backward-compat: every new type still
satisfies the builtin its call sites historically raised."""

from __future__ import annotations

import pytest

from sparkfusion.errors import (
    ConvergenceError,
    DecodeError,
    EnvironmentGateError,
    PlanError,
    SchemaError,
    SourceError,
    SparkfusionError,
)


def test_hierarchy_and_builtin_compat():
    assert issubclass(PlanError, SparkfusionError) and issubclass(PlanError, ValueError)
    assert issubclass(SchemaError, PlanError)
    assert issubclass(SourceError, SparkfusionError) and issubclass(SourceError, ValueError)
    assert issubclass(DecodeError, SourceError)
    assert issubclass(EnvironmentGateError, NotImplementedError)
    assert issubclass(ConvergenceError, RuntimeError)


def test_plan_error_from_operator(spark):
    from sparkfusion.operators.bloom import bloom_bitmap

    with pytest.raises(PlanError, match="multiple of 64"):
        bloom_bitmap(spark.range(3).withColumnRenamed("id", "k"), "k", num_bits=100)


def test_schema_error_from_operator(spark):
    from sparkfusion.operators.schema import df_cols_to_json

    df = spark.range(3)
    with pytest.raises(SchemaError, match="not found"):
        df_cols_to_json(df, ["missing_col"], "j")


def test_source_error_from_sink():
    from sparkfusion.sources.pysource import JsonlDirWriter

    with pytest.raises(SourceError, match="path"):
        JsonlDirWriter({}, overwrite=False)


def test_decode_error_from_ppm(spark):
    from sparkfusion.llm.multimodal import decode_ppm

    bad = spark.createDataFrame(
        [(1, bytearray(b"NOTPPM rubbish"))], "media_id int, content binary"
    )
    with pytest.raises(Exception) as exc_info:
        decode_ppm(bad).collect()
    # raised inside a pandas UDF worker — Spark wraps it, so assert on the
    # propagated message rather than the unpicklable exception class
    assert "not a P6 PPM" in str(exc_info.value)


def test_environment_gate_error_for_tws(spark, sf_dir, monkeypatch):
    """The gate must still fire on runtimes where protoruntime discovery
    finds nothing (simulated — this container discovers a vendored copy)."""
    import sparkfusion.protoruntime as pr
    from sparkfusion.streaming.windows import (
        read_events_stream,
        stateful_user_counts_tws,
    )

    monkeypatch.setattr(pr, "ensure_protobuf_runtime", lambda: (False, None))
    events = read_events_stream(spark, sf_dir)
    with pytest.raises(EnvironmentGateError, match="protobuf"):
        stateful_user_counts_tws(events)


def test_exports_from_package_root():
    import sparkfusion

    for name in (
        "SparkfusionError",
        "PlanError",
        "SchemaError",
        "SourceError",
        "DecodeError",
        "EnvironmentGateError",
        "ConvergenceError",
    ):
        assert getattr(sparkfusion, name) is not None
