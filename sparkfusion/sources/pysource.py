"""Custom Python DataSource — the Spark 4 public connector extension point.

The reference registers custom in-memory table providers with its session
(SURVEY.md §2.1 S7/S8: MemTable batch + literal-dataframe sources,
``src/utils/dataframe.rs`` ``df_from_columns``); Spark's equivalent
extension point for a *new format* is the Python DataSource API
(``pyspark.sql.datasource``): implement ``DataSource``/``DataSourceReader``,
register once per session, then ``spark.read.format(name)`` plans it like
any other source — including partition planning, so reads parallelize
across executors.

This module ships a deterministic synthetic source (``sparkfusion_docs``)
as the working demo: every row is a pure function of its row id (Knuth
multiplicative hash), so the output is reproducible across engines — the
suite oracle mirrors it with ``generate_series`` in DuckDB.

Scale notes: ``partitions()`` splits the id range into contiguous slices —
each executor materializes only its slice (no driver materialization, no
skew). Rows cross Python→JVM per batch; a production connector for a real
format would be IO-bound, not compute-bound, so the Python overhead
amortizes. This is the extension-point demo, not a hot-path operator.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

from ..errors import SourceError

FORMAT_NAME = "sparkfusion_docs"

#: Knuth multiplicative hash constant (2^32 / golden ratio)
_KNUTH = 2654435761


def synth_row(i: int) -> tuple[int, int, int, float]:
    """The pure row function: (doc_id, bucket, milli, score) for row id
    ``i``. The integer ``milli`` column is the comparison contract — all
    integer math, bit-identical in any engine; ``score = milli/1000`` is the
    derived float kept for realism but NEVER part of an oracle (the r5
    driver hash mismatch on s21/s22 traced to the float→round roundtrip)."""
    m = (i * _KNUTH) % 1000
    return (i, i % 7, m, m / 1000.0)


class RangeDocsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n = int(options.get("n", 1000))
        self.num_partitions = int(options.get("partitions", 4))
        if self.n < 0 or self.num_partitions < 1:
            raise SourceError(
                f"sparkfusion_docs: need n >= 0 and partitions >= 1, "
                f"got n={self.n} partitions={self.num_partitions}"
            )

    def partitions(self) -> list[InputPartition]:
        step = -(-self.n // self.num_partitions) if self.n else 1
        return [
            InputPartition((start, min(start + step, self.n)))
            for start in range(0, max(self.n, 1), step)
        ]

    def read(self, partition: InputPartition):
        start, end = partition.value
        for i in range(start, end):
            yield synth_row(i)


class RangeDocsStreamReader(SimpleDataSourceStreamReader):
    """Finite micro-batch stream over the same synthetic rows: each batch
    advances the offset by ``rate`` ids until ``n`` is reached, then reports
    no new data (so ``processAllAvailable()`` terminates deterministically).

    Offsets are plain JSON dicts ``{"next": i}`` — exactly-once across
    restarts comes from ``readBetweenOffsets`` replaying any committed span
    verbatim (rows are a pure function of the id, so replay is trivially
    idempotent). This is the custom-connector analog of the suite's
    file-based streams: the public Spark 4 extension point for a streaming
    source a production pipeline would point at a queue/change-feed.
    """

    def __init__(self, options: dict):
        self.n = int(options.get("n", 2000))
        self.rate = int(options.get("rate", 500))
        if self.n < 0 or self.rate < 1:
            raise SourceError(
                f"sparkfusion_docs stream: need n >= 0 and rate >= 1, "
                f"got n={self.n} rate={self.rate}"
            )

    def initialOffset(self) -> dict:
        return {"next": 0}

    def read(self, start: dict):
        # the prefetching wrapper iterates the rows with next(); return an
        # iterator, not a list
        s = int(start["next"])
        if s >= self.n:
            return (iter(()), start)
        e = min(s + self.rate, self.n)
        return (iter([synth_row(i) for i in range(s, e)]), {"next": e})

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(
            [synth_row(i) for i in range(int(start["next"]), int(end["next"]))]
        )


class RangeDocsDataSource(DataSource):
    """``spark.read.format("sparkfusion_docs").option("n", N)`` source."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> str:
        return "doc_id bigint, bucket int, milli bigint, score double"

    def reader(self, schema) -> RangeDocsReader:
        return RangeDocsReader(self.options)

    def simpleStreamReader(self, schema) -> RangeDocsStreamReader:
        return RangeDocsStreamReader(self.options)


def register_python_datasource(spark) -> None:
    """Idempotent session registration of the demo format."""
    spark.dataSource.register(RangeDocsDataSource)


def read_synth_docs(spark, n: int = 5000, partitions: int = 8):
    """Read the synthetic source (registering the format if needed)."""
    register_python_datasource(spark)
    return (
        spark.read.format(FORMAT_NAME)
        .option("n", str(n))
        .option("partitions", str(partitions))
        .load()
    )


def read_synth_docs_stream(spark, n: int = 2000, rate: int = 500):
    """Open the synthetic source as a micro-batch stream (finite: ``n`` rows
    at ``rate`` rows/batch, then idle)."""
    register_python_datasource(spark)
    return (
        spark.readStream.format(FORMAT_NAME)
        .option("n", str(n))
        .option("rate", str(rate))
        .load()
    )


JSONL_FORMAT = "sparkfusion_jsonl"


class _JsonlCommit(WriterCommitMessage):
    def __init__(self, tmp_path: str, rows: int):
        self.tmp_path = tmp_path
        self.rows = rows


class JsonlDirWriter(DataSourceWriter):
    """JSON-lines directory sink with a two-phase commit protocol — the
    write-side extension point (reference parity: the hand-rolled parquet/
    json sinks in ``src/utils/dataframe.rs`` ``write_df_to_file``):

    - each task streams its partition to ``part-<uuid>.jsonl.tmp`` and
      returns the file name as its commit message;
    - the DRIVER promotes every ``.tmp`` to its final name and drops a
      ``_SUCCESS`` marker only after all tasks succeed (``commit``), or
      deletes the temporaries (``abort``) — a failed/speculated task can
      never leave a half-written file visible to readers.

    Keys are serialized sorted so the byte output is deterministic for a
    given row.
    """

    def __init__(self, options: dict, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise SourceError("sparkfusion_jsonl: 'path' option is required")
        self.overwrite = overwrite

    def write(self, iterator):
        import json as _json
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f"part-{uuid.uuid4().hex}.jsonl.tmp")
        n = 0
        with open(tmp, "w") as f:
            for row in iterator:
                f.write(_json.dumps(row.asDict(), sort_keys=True) + "\n")
                n += 1
        return _JsonlCommit(tmp, n)

    def commit(self, messages):
        import os

        # invalidate the previous generation FIRST so no reader ever sees a
        # _SUCCESS marker alongside partially-deleted data, then sweep both
        # stale .jsonl files (overwrite) and orphan .jsonl.tmp left by dead
        # or speculatively-retried tasks that are NOT in this commit's
        # message list — an orphan tmp promoted later would double-count.
        success = os.path.join(self.path, "_SUCCESS")
        if os.path.exists(success):
            os.remove(success)
        committed = {m.tmp_path for m in messages if m is not None}
        for name in os.listdir(self.path):
            full = os.path.join(self.path, name)
            if name.endswith(".jsonl.tmp") and full not in committed:
                os.remove(full)
            elif name.endswith(".jsonl") and self.overwrite:
                os.remove(full)
        for m in messages:
            if m is not None:
                os.replace(m.tmp_path, m.tmp_path[: -len(".tmp")])
        with open(success, "w") as f:
            f.write("")

    def abort(self, messages):
        import os

        for m in messages:
            if m is not None and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)


class JsonlDirDataSource(DataSource):
    """``df.write.format("sparkfusion_jsonl").option("path", dir)`` sink."""

    @classmethod
    def name(cls) -> str:
        return JSONL_FORMAT

    def writer(self, schema, overwrite: bool) -> JsonlDirWriter:
        return JsonlDirWriter(self.options, overwrite)


def register_jsonl_sink(spark) -> None:
    spark.dataSource.register(JsonlDirDataSource)


def write_jsonl(df, path: str, mode: str = "append") -> None:
    """Write a DataFrame through the custom two-phase-commit JSONL sink."""
    register_jsonl_sink(df.sparkSession)
    df.write.format(JSONL_FORMAT).option("path", path).mode(mode).save()
