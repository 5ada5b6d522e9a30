"""Typed error hierarchy (reference parity: ``src/error.rs:15-49`` —
``UtilsError`` wraps each failure domain in a named variant; callers match on
the variant instead of string-parsing messages).

The Python-idiomatic mirror is an exception hierarchy. Each class also
subclasses the builtin its call sites previously raised (``ValueError`` /
``NotImplementedError``), so ``except ValueError`` callers and existing
tests keep working — the new types only ADD precision:

- :class:`PlanError` — invalid operator arguments / un-runnable plan
  construction (~``DataFusionError``).
- :class:`SchemaError` — missing or mismatched columns/types
  (~``ArrowError``); subclass of :class:`PlanError`.
- :class:`SourceError` — source/sink misconfiguration or IO contract
  violations (~``ObjectStoreError``/``IoError``/``ParquetError``).
- :class:`DecodeError` — malformed binary payloads in decode paths
  (~``SerdeError``); subclass of :class:`SourceError`.
- :class:`EnvironmentGateError` — an operation whose implementation needs an
  optional dependency absent from the runtime (codecs, protobuf). Subclass
  of ``NotImplementedError``, matching the honest-stub convention.
"""

from __future__ import annotations

__all__ = [
    "SparkfusionError",
    "PlanError",
    "SchemaError",
    "SourceError",
    "DecodeError",
    "EnvironmentGateError",
    "ConvergenceError",
]


class SparkfusionError(Exception):
    """Root of every error sparkfusion raises on its own behalf."""


class PlanError(SparkfusionError, ValueError):
    """Operator called with arguments that cannot form a valid plan."""


class SchemaError(PlanError):
    """Required columns missing or column shapes inconsistent."""


class SourceError(SparkfusionError, ValueError):
    """Source/sink misconfigured or its IO contract violated."""


class DecodeError(SourceError):
    """A binary payload failed to parse in a decode path."""


class EnvironmentGateError(SparkfusionError, NotImplementedError):
    """Implementation requires an optional dependency this runtime lacks."""


class ConvergenceError(SparkfusionError, RuntimeError):
    """An iterative algorithm exhausted its round budget without a fixpoint."""
