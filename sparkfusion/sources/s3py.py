"""Boto3-native S3 parquet connector (SURVEY.md §2.1 S14-S17, executed live).

The reference hand-rolls its S3 surface: credential chain → ranged parallel
GETs → multipart uploads (``src/utils/aws.rs:57-468``, 10 MiB chunks / 10
workers from ``src/utils/constants.rs:1-3``). Spark's production answer is
the S3A connector, but this container ships no hadoop-aws jar — so instead of
leaving the path env-gated, this module implements the same surface as a
**Spark 4 Python DataSource** over boto3 + pyarrow, which runs END-TO-END
against any S3 wire-protocol endpoint (exercised against an in-process moto
server in ``tests/test_s3_native.py``, including multi-part writes and the
overwrite sweep).

Scale design:

- **Read**: the driver lists objects once (paginated ``list_objects_v2``) and
  plans ONE partition PER OBJECT — each executor opens only its object and
  streams Arrow record batches straight into the JVM (no driver
  materialization, no Python row loop). Footer/metadata access goes through
  ranged GETs via a seekable file adapter, with pyarrow's ``pre_buffer``
  coalescing the small footer reads — the same access pattern as the
  reference's ranged reader (``aws.rs:239-329``).
- **Pushdown**: Spark 4.1's ``pushFilters`` hands the reader the conjunctive
  filter list; comparison/null/IN filters on top-level columns are used to
  SKIP whole row groups via parquet min/max/null statistics (ranged GETs
  never fetch skipped groups) and to pre-filter batches with
  ``pyarrow.compute`` before they cross into the JVM. All filters are also
  returned to Spark, so Spark re-applies them — pushdown here is purely an
  I/O reduction, never a correctness dependency. Column pruning: a
  user-supplied ``.schema(...)`` reads only those columns' chunks.
- **Write**: an Arrow-batch writer (``DataSourceArrowWriter`` — batches
  arrive from the JVM with no Python row loop) buffers ``rows_per_group``
  rows per parquet row group and serializes into a streaming multipart
  upload — a full ``part_size`` (default 10 MiB, the reference's chunk
  constant) is shipped as soon as it fills, so task memory is bounded by
  ``part_size`` + one row group, not the partition size. Parts are invisible
  until ``complete_multipart_upload`` (S3's own two-phase protocol); the
  job-level ``commit`` then writes a ``_SUCCESS`` marker, and ``abort``
  deletes any completed task objects.

Honest limitation (documented, not hidden): S3 has no rename, so overwrite
sweeps old objects at commit time rather than atomically.
"""

from __future__ import annotations

import io
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)

from ..errors import SourceError

FORMAT_NAME = "s3parquet"

#: the reference's transfer constants (src/utils/constants.rs:1-3)
DEFAULT_PART_SIZE = 10 * 1024 * 1024
#: S3 (and moto, which enforces it) rejects non-final parts below 5 MiB —
#: the writer clamps any smaller requested part_size up to this floor
S3_MIN_PART_SIZE = 5 * 1024 * 1024


def s3_client(options: dict):
    """boto3 S3 client from DataSource options; with no explicit keys boto3
    falls back to its default provider chain (env vars, instance profile) —
    the reference's ``aws_config::load_from_env`` behavior
    (``src/utils/aws.rs:33-54``)."""
    import boto3

    kwargs = {}
    if options.get("endpoint_url"):
        kwargs["endpoint_url"] = options["endpoint_url"]
    if options.get("region"):
        kwargs["region_name"] = options["region"]
    if options.get("access_key"):
        kwargs["aws_access_key_id"] = options["access_key"]
    if options.get("secret_key"):
        kwargs["aws_secret_access_key"] = options["secret_key"]
    if options.get("session_token"):
        kwargs["aws_session_token"] = options["session_token"]
    return boto3.client("s3", **kwargs)


class _S3SeekableFile:
    """Minimal seekable file-like over ranged GETs, for pyarrow's parquet
    reader (footer probe + row-group reads). Every ``read`` is one ranged
    request; pyarrow's ``pre_buffer`` keeps the count low.

    ``closed`` is a plain attribute — pyarrow's PythonFile adapter reads it
    as one, and a bound method would be truthy (= permanently closed).
    ``tests/test_s3_native.py::test_file_adapters_satisfy_pyarrow_protocol``
    pins the whole protocol.
    """

    def __init__(self, client, bucket: str, key: str, size: int):
        self._c, self._b, self._k, self._size = client, bucket, key, size
        self._pos = 0
        self.closed = False

    def size(self) -> int:
        return self._size

    def tell(self) -> int:
        return self._pos

    def seek(self, offset: int, whence: int = 0) -> int:
        if whence == 0:
            self._pos = offset
        elif whence == 1:
            self._pos += offset
        elif whence == 2:
            self._pos = self._size + offset
        return self._pos

    def read(self, n: int = -1) -> bytes:
        if n is None or n < 0:
            end = self._size - 1
        else:
            end = min(self._pos + n, self._size) - 1
        if end < self._pos:
            return b""
        body = self._c.get_object(
            Bucket=self._b, Key=self._k, Range=f"bytes={self._pos}-{end}"
        )["Body"].read()
        self._pos += len(body)
        return body

    def seekable(self) -> bool:
        return True

    def readable(self) -> bool:
        return True

    def writable(self) -> bool:
        return False

    def close(self) -> None:
        self.closed = True

    def flush(self) -> None:  # pragma: no cover
        pass


def _list_parquet_objects(client, bucket: str, prefix: str) -> list[tuple[str, int]]:
    """All (key, size) parquet objects under the prefix, markers excluded."""
    out: list[tuple[str, int]] = []
    paginator = client.get_paginator("list_objects_v2")
    for page in paginator.paginate(Bucket=bucket, Prefix=prefix):
        for obj in page.get("Contents", []):
            key = obj["Key"]
            if key.endswith(".parquet") and obj["Size"] > 0:
                out.append((key, obj["Size"]))
    return sorted(out)


# ---------------------------------------------------------------------------
# filter pushdown: (column, op, value) triples the reader can act on
# ---------------------------------------------------------------------------

_COMPARISONS = {
    EqualTo: "eq",
    GreaterThan: "gt",
    GreaterThanOrEqual: "ge",
    LessThan: "lt",
    LessThanOrEqual: "le",
}


def _translate_filters(filters: list[Filter]) -> list[tuple[str, str, object]]:
    """Spark Filter objects → picklable (col, op, value) triples. Only
    top-level columns; anything unrecognized is simply not translated
    (Spark re-applies every filter regardless)."""
    out: list[tuple[str, str, object]] = []
    for flt in filters:
        attr = getattr(flt, "attribute", None)
        if attr is None or len(attr) != 1:
            continue
        col = attr[0]
        op = _COMPARISONS.get(type(flt))
        if op is not None:
            out.append((col, op, flt.value))
        elif isinstance(flt, In):
            out.append((col, "in", tuple(flt.value)))
        elif isinstance(flt, IsNull):
            out.append((col, "isnull", None))
        elif isinstance(flt, IsNotNull):
            out.append((col, "notnull", None))
    return out


def _rg_may_match(stats, op: str, val) -> bool:
    """Can a row group with these parquet column statistics contain a row
    matching the predicate? Conservative: True whenever stats are absent or
    incomparable. Mirrors the min/max pruning the native scan does."""
    if stats is None:
        return True
    try:
        if op == "isnull":
            return stats.null_count is None or stats.null_count > 0
        if op == "notnull":
            nrows = getattr(stats, "num_values", None)
            return True if nrows is None else nrows > 0
        if not stats.has_min_max:
            return True
        lo, hi = stats.min, stats.max
        if op == "eq":
            return lo <= val <= hi
        if op == "gt":
            return hi > val
        if op == "ge":
            return hi >= val
        if op == "lt":
            return lo < val
        if op == "le":
            return lo <= val
        if op == "in":
            return any(lo <= v <= hi for v in val)
    except TypeError:
        return True
    return True


def _batch_mask(batch, triples):
    """pyarrow.compute boolean mask for the translated filters, or None if
    any of them can't be evaluated on this batch (Spark re-filters anyway).

    Floating-point columns are never comparison-filtered here: Spark's NaN
    total order (NaN = NaN, NaN greater than everything) disagrees with
    Arrow's IEEE semantics (every NaN comparison false), so pre-filtering
    would DROP NaN rows Spark cannot re-add. Null checks stay safe."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.types as pat

    mask = None
    for col, op, val in triples:
        if col not in batch.schema.names:
            return None
        arr = batch.column(col)
        if pat.is_floating(arr.type) and op not in ("isnull", "notnull"):
            continue
        try:
            if op == "isnull":
                m = pc.is_null(arr)
            elif op == "notnull":
                m = pc.is_valid(arr)
            elif op == "in":
                m = pc.is_in(arr, value_set=pa.array(list(val), type=arr.type))
            else:
                scalar = pa.scalar(val, type=arr.type)
                m = {
                    "eq": pc.equal,
                    "gt": pc.greater,
                    "ge": pc.greater_equal,
                    "lt": pc.less,
                    "le": pc.less_equal,
                }[op](arr, scalar)
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError, TypeError, OverflowError):
            return None
        mask = m if mask is None else pc.and_kleene(mask, m)
    return mask


class S3ParquetReader(DataSourceReader):
    """One partition per S3 object; Arrow batches straight to the JVM.

    Honors the RESOLVED read schema (user ``.schema(...)`` or the inferred
    one): only those columns' chunks are fetched, every file is validated
    against it at read time (clear error naming the object, instead of a
    late executor batch-schema mismatch), and batches are cast to it.
    """

    def __init__(self, options: dict, schema):
        self.options = dict(options)
        self.bucket = options.get("bucket")
        self.prefix = options.get("prefix", "")
        if not self.bucket:
            raise SourceError("s3parquet: 'bucket' option is required")
        self.schema = schema
        self._filters: list[tuple[str, str, object]] = []

    def pushFilters(self, filters: list[Filter]):
        """Record the translatable subset for row-group skipping / batch
        pre-filtering, but hand EVERY filter back to Spark: pushdown is an
        I/O optimization here, never a correctness dependency."""
        self._filters = _translate_filters(filters)
        return filters

    def partitions(self) -> list[InputPartition]:
        objs = _list_parquet_objects(s3_client(self.options), self.bucket, self.prefix)
        if not objs:
            raise SourceError(
                f"s3parquet: no parquet objects under "
                f"s3://{self.bucket}/{self.prefix}"
            )
        return [InputPartition(obj) for obj in objs]

    def read(self, partition: InputPartition):
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        key, size = partition.value
        target = to_arrow_schema(self.schema)
        names = target.names
        f = _S3SeekableFile(s3_client(self.options), self.bucket, key, size)
        pf = pq.ParquetFile(f, pre_buffer=True)
        file_cols = set(pf.schema_arrow.names)
        missing = [c for c in names if c not in file_cols]
        if missing:
            raise SourceError(
                f"s3parquet: object s3://{self.bucket}/{key} lacks column(s) "
                f"{missing} required by the resolved read schema "
                f"(schema is inferred from the first object under the prefix; "
                f"pass an explicit .schema(...) covering only shared columns)"
            )
        row_groups = self._select_row_groups(pf)
        for batch in pf.iter_batches(
            batch_size=65536, row_groups=row_groups, columns=names
        ):
            if self._filters:
                mask = _batch_mask(batch, self._filters)
                if mask is not None:
                    batch = batch.filter(mask)
                    if batch.num_rows == 0:
                        continue
            # Arrow-batch fast path: batches cross into the JVM without a
            # Python row loop; cast aligns field order/nullability with the
            # resolved schema
            yield batch.select(names).cast(target)

    def _select_row_groups(self, pf) -> list[int]:
        """Row groups that might satisfy the pushed filters, by parquet
        min/max/null-count statistics — skipped groups are never fetched.

        Floating-point columns are exempt from comparison pruning: parquet
        stats exclude NaN, and Spark's NaN total order (NaN greater than
        everything, NaN = NaN) would make stats-based pruning drop groups
        whose only matching rows are NaN."""
        import pyarrow.types as pat

        n = pf.metadata.num_row_groups
        if not self._filters:
            return list(range(n))
        idx_by_name = {
            pf.metadata.schema.column(i).name: i
            for i in range(pf.metadata.num_columns)
        }
        arrow_schema = pf.schema_arrow
        kept = []
        for rg in range(n):
            meta = pf.metadata.row_group(rg)
            ok = True
            for col, op, val in self._filters:
                ci = idx_by_name.get(col)
                if ci is None:
                    continue
                if (
                    col in arrow_schema.names
                    and pat.is_floating(arrow_schema.field(col).type)
                    and op not in ("isnull", "notnull")
                ):
                    continue
                if not _rg_may_match(meta.column(ci).statistics, op, val):
                    ok = False
                    break
            if ok:
                kept.append(rg)
        return kept


class _S3Commit(WriterCommitMessage):
    def __init__(self, key: str, rows: int):
        self.key = key
        self.rows = rows


class _MultipartBuffer:
    """File-like that streams writes into an S3 multipart upload: a part is
    shipped the moment ``part_size`` bytes accumulate, so memory stays at
    O(part_size) however large the partition (``aws.rs:331-468`` parity —
    the reference chunks at the same 10 MiB).

    ``closed`` is a plain attribute (pyarrow protocol — see
    ``_S3SeekableFile``); a read offset into the accumulation buffer avoids
    re-materializing the remainder on every part flush (a single large
    ``write`` is O(n), not O(n²)).
    """

    def __init__(self, client, bucket: str, key: str, part_size: int):
        self._c, self._b, self._k = client, bucket, key
        self._part_size = part_size
        self._buf = io.BytesIO()
        self._off = 0  # bytes of _buf already shipped
        self._parts: list[dict] = []
        self._upload_id = client.create_multipart_upload(Bucket=bucket, Key=key)[
            "UploadId"
        ]
        self.bytes_written = 0
        self.closed = False

    def _pending(self) -> int:
        return self._buf.tell() - self._off

    def write(self, data: bytes) -> int:
        self._buf.write(data)
        self.bytes_written += len(data)
        if self._pending() >= self._part_size:
            view = self._buf.getbuffer()
            while self._buf.tell() - self._off >= self._part_size:
                self._ship(bytes(view[self._off : self._off + self._part_size]))
                self._off += self._part_size
            del view  # release the memoryview so BytesIO can be resized
            remainder = self._buf.getvalue()[self._off :]
            self._buf = io.BytesIO()
            self._buf.write(remainder)
            self._off = 0
        return len(data)

    def _ship(self, body: bytes) -> None:
        num = len(self._parts) + 1
        resp = self._c.upload_part(
            Bucket=self._b, Key=self._k, UploadId=self._upload_id,
            PartNumber=num, Body=body,
        )
        self._parts.append({"ETag": resp["ETag"], "PartNumber": num})

    def close(self) -> None:
        if self.closed:
            return
        if self._pending() or not self._parts:
            self._ship(self._buf.getvalue()[self._off :])
            self._buf, self._off = io.BytesIO(), 0
        self._c.complete_multipart_upload(
            Bucket=self._b, Key=self._k, UploadId=self._upload_id,
            MultipartUpload={"Parts": self._parts},
        )
        self.closed = True

    def abort(self) -> None:
        """Best-effort: never raises, so it can run in an except path without
        masking the original failure (complete may have actually landed
        server-side, in which case the upload id is already gone)."""
        try:
            self._c.abort_multipart_upload(
                Bucket=self._b, Key=self._k, UploadId=self._upload_id
            )
        except Exception:  # noqa: BLE001 - NoSuchUpload etc.
            pass

    # pyarrow probes these on its sink
    def tell(self) -> int:
        return self.bytes_written

    def seekable(self) -> bool:
        return False

    def writable(self) -> bool:
        return True

    def readable(self) -> bool:
        return False

    def flush(self) -> None:
        pass


def _write_task(
    options: dict, bucket: str, prefix: str, arrow_schema,
    part_size: int, rows_per_group: int, iterator,
) -> _S3Commit:
    """One task's Arrow batches → one parquet object via streaming multipart
    upload (shared by the batch and streaming writers). Empty task → no
    object. Batches accumulate to ``rows_per_group`` rows per parquet row
    group, so task memory is bounded by part_size + one row group."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    first = next(iterator, None)
    if first is None:
        return _S3Commit(None, 0)
    key = f"{prefix}/part-{uuid.uuid4().hex}.parquet"
    sink = _MultipartBuffer(s3_client(options), bucket, key, part_size)
    rows = 0
    pending: list = []
    pending_rows = 0

    def _flush(writer):
        nonlocal pending, pending_rows, rows
        writer.write_table(pa.Table.from_batches(pending, schema=arrow_schema))
        rows += pending_rows
        pending, pending_rows = [], 0

    try:
        with pq.ParquetWriter(sink, arrow_schema) as writer:
            for batch in _chain_one(first, iterator):
                if batch.schema != arrow_schema:
                    batch = batch.select(arrow_schema.names).cast(arrow_schema)
                pending.append(batch)
                pending_rows += batch.num_rows
                if pending_rows >= rows_per_group:
                    _flush(writer)
            if pending:
                _flush(writer)
        sink.close()
    except Exception:
        sink.abort()  # best-effort, never masks the original exception
        raise
    return _S3Commit(key, rows)


def _delete_keys(client, bucket: str, keys: list[str]) -> None:
    """Batched best-effort object delete (delete_objects caps at 1000)."""
    for i in range(0, len(keys), 1000):
        client.delete_objects(
            Bucket=bucket,
            Delete={"Objects": [{"Key": k} for k in keys[i : i + 1000]]},
        )


class _S3WriterBase:
    """Shared option parsing for the batch and streaming S3 parquet writers —
    one place for the bucket check, the 5 MiB part-size clamp, and the
    row-group size."""

    def __init__(self, options: dict, schema):
        self.options = dict(options)
        self.bucket = options.get("bucket")
        self.prefix = (options.get("prefix") or "").rstrip("/")
        if not self.bucket:
            raise SourceError("s3parquet: 'bucket' option is required")
        # S3 rejects CompleteMultipartUpload when any non-final part is under
        # 5 MiB (EntityTooSmall) — clamp so every shipped part is legal
        self.part_size = max(
            int(options.get("part_size", DEFAULT_PART_SIZE)), S3_MIN_PART_SIZE
        )
        self.rows_per_group = int(options.get("rows_per_group", 65536))
        self.schema = schema

    def _arrow_schema(self):
        from pyspark.sql.pandas.types import to_arrow_schema

        return to_arrow_schema(self.schema)

    def _run_task(self, iterator) -> _S3Commit:
        return _write_task(
            self.options, self.bucket, self.prefix, self._arrow_schema(),
            self.part_size, self.rows_per_group, iterator,
        )


class S3ParquetWriter(_S3WriterBase, DataSourceArrowWriter):
    """Per-task streaming multipart parquet upload + job-level commit.

    Arrow end to end: ``DataSourceArrowWriter`` hands this task RecordBatches
    from the JVM (no Python row loop); batches accumulate to
    ``rows_per_group`` rows, each flush is one parquet row group serialized
    into the multipart buffer. Task level: parts are invisible until
    ``complete_multipart_upload``, so a failed/speculated task leaves at most
    an aborted upload, never a partial object; a task with zero rows writes
    no object at all. Job level: ``commit`` writes the ``_SUCCESS`` marker
    (and, for overwrite mode, sweeps previous-generation objects first —
    writing an empty schema-only object if every task was empty, so the
    prefix stays readable); ``abort`` deletes any objects completed by
    finished tasks.
    """

    def __init__(self, options: dict, schema, overwrite: bool):
        super().__init__(options, schema)
        self.overwrite = overwrite

    def write(self, iterator):
        return self._run_task(iterator)

    def commit(self, messages):
        client = s3_client(self.options)
        committed = {m.key for m in messages if m is not None and m.key}
        if not committed:
            # all tasks empty: keep the prefix readable with a schema-only file
            import pyarrow as pa
            import pyarrow.parquet as pq

            buf = io.BytesIO()
            pq.write_table(
                pa.Table.from_batches([], schema=self._arrow_schema()), buf
            )
            key = f"{self.prefix}/part-{uuid.uuid4().hex}.parquet"
            client.put_object(Bucket=self.bucket, Key=key, Body=buf.getvalue())
            committed = {key}
        if self.overwrite:
            _delete_keys(
                client,
                self.bucket,
                [
                    k
                    for k, _ in _list_parquet_objects(client, self.bucket, self.prefix)
                    if k not in committed
                ],
            )
        client.put_object(
            Bucket=self.bucket,
            Key=f"{self.prefix}/_SUCCESS",
            Body="\n".join(sorted(committed)).encode(),
        )

    def abort(self, messages):
        client = s3_client(self.options)
        _delete_keys(
            client, self.bucket, [m.key for m in messages if m is not None and m.key]
        )


def _chain_one(first, rest):
    yield first
    yield from rest


class S3ParquetStreamWriter(_S3WriterBase, DataSourceStreamArrowWriter):
    """Structured-Streaming S3 parquet sink over the same streaming-multipart
    task writer as the batch path.

    Exactly-once contract: task objects are invisible until their multipart
    completes; per microbatch, ``commit`` writes a ``_batch-<id>.manifest``
    object listing exactly the objects of that batch. On a REPLAYED batch
    (failure between task completion and checkpoint advance — Spark re-runs
    the batch with the same batchId), the existing manifest wins: the
    replay's fresh objects are deleted and the original manifest kept, so a
    manifest-trusting reader sees each batch exactly once. ``abort``
    deletes the failed batch's completed objects.

    ``truncate`` (Spark passes overwrite=True for complete/truncating output
    modes): after writing the batch's manifest, every OTHER data object and
    manifest under the prefix is swept, so the prefix always holds exactly
    the latest batch's snapshot instead of an append history."""

    def __init__(self, options: dict, schema, truncate: bool = False):
        super().__init__(options, schema)
        self.truncate = truncate

    def write(self, iterator):
        return self._run_task(iterator)

    def _manifest_key(self, batchId: int) -> str:
        return f"{self.prefix}/_batch-{batchId}.manifest"

    def commit(self, messages, batchId: int) -> None:
        client = s3_client(self.options)
        keys = sorted(m.key for m in messages if m is not None and m.key)
        manifest = self._manifest_key(batchId)
        try:
            client.head_object(Bucket=self.bucket, Key=manifest)
            exists = True
        except Exception:  # noqa: BLE001 - 404
            exists = False
        if exists:
            # replayed batch: the original manifest is authoritative — drop
            # this replay's objects so the prefix holds each batch once
            _delete_keys(client, self.bucket, keys)
            return
        client.put_object(
            Bucket=self.bucket, Key=manifest, Body="\n".join(keys).encode()
        )
        if self.truncate:
            keep = set(keys) | {manifest}
            stale = [
                k
                for k, _ in _list_parquet_objects(client, self.bucket, self.prefix)
                if k not in keep
            ]
            stale += [
                obj["Key"]
                for page in client.get_paginator("list_objects_v2").paginate(
                    Bucket=self.bucket, Prefix=f"{self.prefix}/_batch-"
                )
                for obj in page.get("Contents", [])
                if obj["Key"] not in keep
            ]
            _delete_keys(client, self.bucket, stale)

    def abort(self, messages, batchId: int) -> None:
        client = s3_client(self.options)
        _delete_keys(
            client, self.bucket, [m.key for m in messages if m is not None and m.key]
        )


class S3ParquetDataSource(DataSource):
    """``spark.read.format("s3parquet").option("bucket", ...)`` and
    ``df.write.format("s3parquet")`` — the boto3-native S3 connector."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self):
        """Infer from the FIRST object's parquet footer via ranged GETs —
        a driver-side metadata read, never a data download. (Each file is
        re-validated against the resolved schema at read time; heterogeneous
        prefixes fail with a planning-quality error naming the object.)"""
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_schema

        client = s3_client(self.options)
        bucket = self.options.get("bucket")
        if not bucket:
            raise SourceError("s3parquet: 'bucket' option is required")
        objs = _list_parquet_objects(client, bucket, self.options.get("prefix", ""))
        if not objs:
            raise SourceError(
                f"s3parquet: no parquet objects under "
                f"s3://{bucket}/{self.options.get('prefix', '')}"
            )
        key, size = objs[0]
        pf = pq.ParquetFile(_S3SeekableFile(client, bucket, key, size))
        return from_arrow_schema(pf.schema_arrow)

    def reader(self, schema) -> S3ParquetReader:
        return S3ParquetReader(self.options, schema)

    def writer(self, schema, overwrite: bool) -> S3ParquetWriter:
        return S3ParquetWriter(self.options, schema, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> S3ParquetStreamWriter:
        # overwrite=True = complete/truncating output mode: each batch must
        # REPLACE the prefix contents, not append to them
        return S3ParquetStreamWriter(self.options, schema, truncate=overwrite)


def register_s3_datasource(spark: SparkSession) -> None:
    """Idempotent session registration of the s3parquet format.

    Also enables ``spark.sql.python.filterPushdown.enabled`` (a runtime SQL
    conf, default false): Spark refuses to plan a Python DataSource that
    implements ``pushFilters`` while the flag is off, and the driver runs
    suite queries with its own plain session (CLAUDE.md contract), so this
    must be set here rather than at session build time."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(S3ParquetDataSource)


def read_from_s3_native(
    spark: SparkSession, bucket: str, prefix: str, name: str = "t", **options
) -> DataFrame:
    """Register an S3 parquet prefix as a table and return ``select *`` —
    the shape of the reference's ``read_from_s3`` (``src/utils/aws.rs:
    168-196``), executed through the boto3 connector."""
    register_s3_datasource(spark)
    r = spark.read.format(FORMAT_NAME).option("bucket", bucket).option("prefix", prefix)
    for k, v in options.items():
        if v is not None:
            r = r.option(k, str(v))
    df = r.load()
    df.createOrReplaceTempView(name)
    return spark.sql(f"SELECT * FROM {name}")


def write_to_s3_native(
    df: DataFrame, bucket: str, prefix: str, mode: str = "overwrite", **options
) -> None:
    """Parquet sink to S3 via streaming multipart upload (``write_to_s3`` +
    multipart, ``src/utils/aws.rs:198-236,239-468``)."""
    register_s3_datasource(df.sparkSession)
    w = df.write.format(FORMAT_NAME).mode(mode)
    w = w.option("bucket", bucket).option("prefix", prefix)
    for k, v in options.items():
        if v is not None:
            w = w.option(k, str(v))
    w.save()
