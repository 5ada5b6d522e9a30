"""Boto3-native S3 connector tests (SURVEY §2.1 S14-S17) against an
in-process moto server — the read path (ranged GETs, schema inference,
pushdown), the write path (streaming multipart, overwrite sweep, abort),
and the pyarrow file-protocol regression class that broke round 7's
first cut (``closed`` must be a *bool attribute*, never a method).
"""

from __future__ import annotations

import io
import uuid

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from sparkfusion.sources.s3local import CREDS, ensure_bucket
from sparkfusion.sources.s3py import (
    _MultipartBuffer,
    _S3SeekableFile,
    S3ParquetReader,
    read_from_s3_native,
    write_to_s3_native,
)

BUCKET = "sparkfusion-test"


@pytest.fixture(scope="module")
def s3():
    client, endpoint = ensure_bucket(BUCKET)
    return client, endpoint


def _opts(endpoint, **extra):
    return {"endpoint_url": endpoint, **CREDS, **extra}


def _put_parquet(client, key: str, tbl: pa.Table, **writer_kwargs) -> int:
    buf = io.BytesIO()
    pq.write_table(tbl, buf, **writer_kwargs)
    data = buf.getvalue()
    client.put_object(Bucket=BUCKET, Key=key, Body=data)
    return len(data)


def _get_parquet(client, key: str) -> pa.Table:
    body = client.get_object(Bucket=BUCKET, Key=key)["Body"].read()
    return pq.read_table(io.BytesIO(body))


def _list(client, prefix: str) -> list[str]:
    resp = client.list_objects_v2(Bucket=BUCKET, Prefix=prefix)
    return sorted(o["Key"] for o in resp.get("Contents", []))


# ---------------------------------------------------------------------------
# pyarrow file-protocol regression tests (VERDICT r7 item 7): a bound method
# where pyarrow expects an attribute is truthy → "I/O operation on closed
# file". These would have caught the round-7 breakage.
# ---------------------------------------------------------------------------


def test_file_adapters_expose_closed_as_bool_attribute(s3):
    client, _ = s3
    size = _put_parquet(client, "proto/a.parquet", pa.table({"x": [1, 2, 3]}))
    f = _S3SeekableFile(client, BUCKET, "proto/a.parquet", size)
    assert f.closed is False and isinstance(f.closed, bool)
    f.close()
    assert f.closed is True

    buf = _MultipartBuffer(client, BUCKET, "proto/b.parquet", part_size=1024)
    assert buf.closed is False and isinstance(buf.closed, bool)
    buf.write(b"x")
    buf.close()
    assert buf.closed is True


def test_seekable_file_opens_under_pyarrow_parquet(s3):
    """ParquetFile over the ranged-GET adapter: footer probe + full read."""
    client, _ = s3
    tbl = pa.table({"x": list(range(1000)), "s": [f"v{i}" for i in range(1000)]})
    size = _put_parquet(client, "proto/c.parquet", tbl)
    pf = pq.ParquetFile(
        _S3SeekableFile(client, BUCKET, "proto/c.parquet", size), pre_buffer=True
    )
    assert pf.schema_arrow.names == ["x", "s"]
    assert pf.read().equals(tbl)


def test_multipart_buffer_is_a_valid_pyarrow_sink(s3):
    """pq.ParquetWriter writes through the multipart buffer end-to-end."""
    client, _ = s3
    tbl = pa.table({"x": list(range(500))})
    # a single final part may be under 5 MiB; only NON-final parts have a floor
    sink = _MultipartBuffer(client, BUCKET, "proto/d.parquet", part_size=5 * 2**20)
    with pq.ParquetWriter(sink, tbl.schema) as w:
        w.write_table(tbl)
    sink.close()
    assert _get_parquet(client, "proto/d.parquet").equals(tbl)


# ---------------------------------------------------------------------------
# _MultipartBuffer unit behavior (fake client — no server round trips)
# ---------------------------------------------------------------------------


class _FakeClient:
    def __init__(self, fail_complete=False, fail_abort=False):
        self.parts: list[bytes] = []
        self.completed = False
        self.aborted = False
        self.fail_complete = fail_complete
        self.fail_abort = fail_abort

    def create_multipart_upload(self, Bucket, Key):
        return {"UploadId": "u1"}

    def upload_part(self, Bucket, Key, UploadId, PartNumber, Body):
        assert PartNumber == len(self.parts) + 1
        self.parts.append(bytes(Body))
        return {"ETag": f"e{PartNumber}"}

    def complete_multipart_upload(self, Bucket, Key, UploadId, MultipartUpload):
        if self.fail_complete:
            raise RuntimeError("complete timed out")
        assert [p["PartNumber"] for p in MultipartUpload["Parts"]] == list(
            range(1, len(self.parts) + 1)
        )
        self.completed = True

    def abort_multipart_upload(self, Bucket, Key, UploadId):
        if self.fail_abort:
            raise RuntimeError("NoSuchUpload")
        self.aborted = True


def test_multipart_buffer_ships_full_parts_from_one_large_write():
    """A single write far bigger than part_size ships every full part (offset
    tracking, not O(n²) re-materialization) and close flushes the tail."""
    c = _FakeClient()
    buf = _MultipartBuffer(c, "b", "k", part_size=1000)
    payload = bytes(range(256)) * 40  # 10240 bytes
    buf.write(payload)
    assert len(c.parts) == 10 and all(len(p) == 1000 for p in c.parts)
    buf.write(b"tail")
    buf.close()
    assert c.completed
    assert b"".join(c.parts) == payload + b"tail"


def test_multipart_buffer_empty_close_ships_one_empty_part():
    c = _FakeClient()
    buf = _MultipartBuffer(c, "b", "k", part_size=1000)
    buf.close()
    assert c.completed and c.parts == [b""]


def test_multipart_abort_never_masks_the_original_failure():
    """If complete fails after S3 actually finished (abort → NoSuchUpload),
    the ORIGINAL exception must propagate, not the abort's."""
    c = _FakeClient(fail_complete=True, fail_abort=True)
    buf = _MultipartBuffer(c, "b", "k", part_size=1000)
    buf.write(b"data")
    with pytest.raises(RuntimeError, match="complete timed out"):
        buf.close()
    buf.abort()  # must not raise despite NoSuchUpload


# ---------------------------------------------------------------------------
# Spark end-to-end: read path
# ---------------------------------------------------------------------------


def test_spark_read_roundtrip_multiple_objects(spark, s3):
    client, endpoint = s3
    prefix = f"read/{uuid.uuid4().hex}"
    _put_parquet(client, f"{prefix}/a.parquet", pa.table({"k": [1, 2], "v": ["a", "b"]}))
    _put_parquet(client, f"{prefix}/b.parquet", pa.table({"k": [3], "v": ["c"]}))
    client.put_object(Bucket=BUCKET, Key=f"{prefix}/_SUCCESS", Body=b"")  # ignored
    df = read_from_s3_native(spark, BUCKET, prefix, name="t_read", **_opts(endpoint))
    got = sorted((r.k, r.v) for r in df.collect())
    assert got == [(1, "a"), (2, "b"), (3, "c")]
    assert df.rdd.getNumPartitions() == 2  # one partition per object


def test_spark_read_user_schema_subset_prunes_columns(spark, s3):
    client, endpoint = s3
    prefix = f"prune/{uuid.uuid4().hex}"
    _put_parquet(
        client, f"{prefix}/a.parquet",
        pa.table({"k": [1, 2], "v": ["a", "b"], "w": [1.5, 2.5]}),
    )
    from sparkfusion.sources.s3py import FORMAT_NAME, register_s3_datasource

    register_s3_datasource(spark)
    df = (
        spark.read.format(FORMAT_NAME)
        .schema("v string, k bigint")
        .option("bucket", BUCKET)
        .option("prefix", prefix)
        .options(**_opts(endpoint))
        .load()
    )
    assert df.columns == ["v", "k"]
    assert sorted((r.v, r.k) for r in df.collect()) == [("a", 1), ("b", 2)]


def test_spark_read_missing_column_fails_naming_the_object(spark, s3):
    client, endpoint = s3
    prefix = f"miss/{uuid.uuid4().hex}"
    _put_parquet(client, f"{prefix}/a.parquet", pa.table({"k": [1]}))
    from sparkfusion.sources.s3py import FORMAT_NAME, register_s3_datasource

    register_s3_datasource(spark)
    df = (
        spark.read.format(FORMAT_NAME)
        .schema("k bigint, nope string")
        .option("bucket", BUCKET)
        .option("prefix", prefix)
        .options(**_opts(endpoint))
        .load()
    )
    with pytest.raises(Exception, match="lacks column"):
        df.collect()


def test_spark_read_filter_still_correct_with_pushdown(spark, s3):
    """Filters prune row groups via parquet stats AND Spark re-applies them —
    results must be exact either way."""
    client, endpoint = s3
    prefix = f"filt/{uuid.uuid4().hex}"
    tbl = pa.table({"k": list(range(100)), "v": [i * 2 for i in range(100)]})
    _put_parquet(client, f"{prefix}/a.parquet", tbl, row_group_size=10)
    df = read_from_s3_native(spark, BUCKET, prefix, name="t_filt", **_opts(endpoint))
    got = sorted(r.k for r in df.filter("k >= 37 AND k < 42").collect())
    assert got == [37, 38, 39, 40, 41]
    got_in = sorted(r.k for r in df.filter("k IN (5, 95)").collect())
    assert got_in == [5, 95]


def test_row_group_skipping_uses_parquet_stats(s3):
    """Unit check of the pruning itself: 10 row groups of 10 rows, a filter
    touching 2 of them keeps exactly those groups."""
    from pyspark.sql.types import LongType, StructField, StructType

    client, endpoint = s3
    prefix = f"rg/{uuid.uuid4().hex}"
    key = f"{prefix}/a.parquet"
    size = _put_parquet(
        client, key, pa.table({"k": list(range(100))}), row_group_size=10
    )
    schema = StructType([StructField("k", LongType())])
    reader = S3ParquetReader(
        {"bucket": BUCKET, "prefix": prefix, **_opts(endpoint)}, schema
    )
    reader._filters = [("k", "ge", 37), ("k", "lt", 42)]
    pf = pq.ParquetFile(_S3SeekableFile(client, BUCKET, key, size))
    assert reader._select_row_groups(pf) == [3, 4]
    reader._filters = [("k", "eq", 55)]
    assert reader._select_row_groups(pf) == [5]
    reader._filters = [("k", "in", (5, 95))]
    assert reader._select_row_groups(pf) == [0, 9]


# ---------------------------------------------------------------------------
# Spark end-to-end: write path
# ---------------------------------------------------------------------------


def test_spark_write_multipart_roundtrip(spark, s3):
    """~14 MiB of incompressible data in one partition at the 5 MiB part
    floor → ≥2 parts genuinely ship through the multipart protocol (moto
    enforces real S3's EntityTooSmall rule, so this is the honest path);
    read-back must be exact."""
    client, endpoint = s3
    prefix = f"write/{uuid.uuid4().hex}"
    # sha2 hex of the row id: deterministic, ~incompressible, 64 B/row
    df = spark.range(0, 220_000).selectExpr(
        "id", "sha2(CAST(id AS STRING), 256) AS h"
    )
    write_to_s3_native(
        df.coalesce(1), BUCKET, prefix,
        part_size=5 * 2**20, rows_per_group=20_000, **_opts(endpoint),
    )
    keys = _list(client, prefix)
    data_keys = [k for k in keys if k.endswith(".parquet")]
    assert len(data_keys) == 1
    assert f"{prefix}/_SUCCESS" in keys
    success = client.get_object(Bucket=BUCKET, Key=f"{prefix}/_SUCCESS")["Body"].read()
    assert sorted(success.decode().splitlines()) == data_keys
    head = client.head_object(Bucket=BUCKET, Key=data_keys[0])
    # multipart objects report a part-count suffix in their ETag on real S3
    # and moto; ≥2 proves parts actually shipped before close
    assert head["ContentLength"] > 10 * 2**20
    assert int(head["ETag"].rstrip('"').split("-")[-1]) >= 2
    back = read_from_s3_native(spark, BUCKET, prefix, name="t_back", **_opts(endpoint))
    agg = back.selectExpr(
        "count(*) AS n", "sum(id) AS s", "count(DISTINCT h) AS d"
    ).collect()[0]
    assert (agg.n, agg.s, agg.d) == (220_000, 220_000 * 219_999 // 2, 220_000)


def test_spark_write_overwrite_sweeps_stale_objects(spark, s3):
    client, endpoint = s3
    prefix = f"ow/{uuid.uuid4().hex}"
    df1 = spark.range(0, 100).repartition(4)
    write_to_s3_native(df1, BUCKET, prefix, **_opts(endpoint))
    gen1 = {k for k in _list(client, prefix) if k.endswith(".parquet")}
    assert len(gen1) == 4
    df2 = spark.range(100, 150).repartition(2)
    write_to_s3_native(df2, BUCKET, prefix, **_opts(endpoint))
    gen2 = {k for k in _list(client, prefix) if k.endswith(".parquet")}
    assert len(gen2) == 2 and not (gen1 & gen2)
    back = read_from_s3_native(spark, BUCKET, prefix, name="t_ow", **_opts(endpoint))
    assert sorted(r.id for r in back.collect()) == list(range(100, 150))


def test_spark_write_empty_dataframe_keeps_prefix_readable(spark, s3):
    client, endpoint = s3
    prefix = f"empty/{uuid.uuid4().hex}"
    df = spark.range(10).filter("id < 0")  # empty, schema id:bigint
    write_to_s3_native(df, BUCKET, prefix, **_opts(endpoint))
    back = read_from_s3_native(spark, BUCKET, prefix, name="t_empty", **_opts(endpoint))
    assert back.count() == 0
    assert back.schema.fieldNames() == ["id"]


def test_spark_write_decimal_and_timestamp_fidelity(spark, s3):
    """Type fidelity through the Arrow writer for the trap types (decimal
    money columns, timestamps) — the same classes the oracle rules guard."""
    client, endpoint = s3
    prefix = f"types/{uuid.uuid4().hex}"
    df = spark.sql(
        """
        SELECT CAST(id AS DECIMAL(12,2)) / 7 AS money,
               timestamp_micros(CAST(id * 1000001 AS BIGINT)) AS ts,
               CAST(id AS INT) AS i
        FROM range(1000)
        """
    )
    expected = {(str(r.money), r.ts, r.i) for r in df.collect()}
    write_to_s3_native(df, BUCKET, prefix, **_opts(endpoint))
    back = read_from_s3_native(spark, BUCKET, prefix, name="t_types", **_opts(endpoint))
    assert back.schema == df.schema
    assert {(str(r.money), r.ts, r.i) for r in back.collect()} == expected


# ---------------------------------------------------------------------------
# Structured Streaming sink
# ---------------------------------------------------------------------------


def test_streaming_sink_writes_batches_with_manifests(spark, s3, tmp_path):
    """File stream → s3parquet streaming sink with availableNow trigger:
    data objects + per-batch manifest land; manifest lists exactly the
    batch's objects; read-back matches the source rows."""
    import pyarrow as pa

    from sparkfusion.sources.s3py import FORMAT_NAME, register_s3_datasource

    client, endpoint = s3
    prefix = f"stream/{uuid.uuid4().hex}"
    src = tmp_path / "src"
    src.mkdir()
    spark.range(0, 50).selectExpr("id", "id * 3 AS v").coalesce(1).write.parquet(
        str(src / "a")
    )
    register_s3_datasource(spark)
    stream = spark.readStream.schema("id bigint, v bigint").parquet(str(src / "*"))
    q = (
        stream.writeStream.format(FORMAT_NAME)
        .option("bucket", BUCKET)
        .option("prefix", prefix)
        .options(**_opts(endpoint))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    keys = _list(client, prefix)
    data_keys = [k for k in keys if k.endswith(".parquet")]
    manifests = [k for k in keys if ".manifest" in k]
    assert data_keys and manifests
    listed = []
    for m in manifests:
        body = client.get_object(Bucket=BUCKET, Key=m)["Body"].read().decode()
        listed.extend(body.splitlines())
    assert sorted(listed) == data_keys  # manifests cover exactly the data
    back = read_from_s3_native(spark, BUCKET, prefix, name="t_stream", **_opts(endpoint))
    assert sorted((r.id, r.v) for r in back.collect()) == [(i, i * 3) for i in range(50)]


def test_streaming_commit_replay_is_idempotent(s3):
    """A replayed batchId must not duplicate data: the original manifest
    wins and the replay's objects are deleted."""
    from pyspark.sql.types import LongType, StructField, StructType

    from sparkfusion.sources.s3py import _S3Commit, S3ParquetStreamWriter

    client, endpoint = s3
    prefix = f"replay/{uuid.uuid4().hex}"
    schema = StructType([StructField("id", LongType())])
    w = S3ParquetStreamWriter(
        {"bucket": BUCKET, "prefix": prefix, **_opts(endpoint)}, schema
    )
    k1 = f"{prefix}/part-original.parquet"
    client.put_object(Bucket=BUCKET, Key=k1, Body=b"orig")
    w.commit([_S3Commit(k1, 1)], batchId=7)
    # replay of batch 7 produced a different object
    k2 = f"{prefix}/part-replayed.parquet"
    client.put_object(Bucket=BUCKET, Key=k2, Body=b"replay")
    w.commit([_S3Commit(k2, 1)], batchId=7)
    keys = _list(client, prefix)
    assert k1 in keys and k2 not in keys  # replay object swept
    body = client.get_object(
        Bucket=BUCKET, Key=f"{prefix}/_batch-7.manifest"
    )["Body"].read().decode()
    assert body.splitlines() == [k1]


def test_streaming_abort_deletes_completed_task_objects(s3):
    from pyspark.sql.types import LongType, StructField, StructType

    from sparkfusion.sources.s3py import _S3Commit, S3ParquetStreamWriter

    client, endpoint = s3
    prefix = f"abort/{uuid.uuid4().hex}"
    schema = StructType([StructField("id", LongType())])
    w = S3ParquetStreamWriter(
        {"bucket": BUCKET, "prefix": prefix, **_opts(endpoint)}, schema
    )
    k = f"{prefix}/part-x.parquet"
    client.put_object(Bucket=BUCKET, Key=k, Body=b"x")
    w.abort([_S3Commit(k, 1), None], batchId=3)
    assert k not in _list(client, prefix)


def test_nan_rows_survive_float_filter_pushdown(spark, s3):
    """Spark's NaN total order (NaN > everything, NaN = NaN) disagrees with
    Arrow/parquet-stats IEEE semantics — the reader must NOT pre-filter or
    stats-prune floating columns, or NaN rows silently vanish."""
    client, endpoint = s3
    prefix = f"nan/{uuid.uuid4().hex}"
    tbl = pa.table({"d": [float("nan"), -3.0, 1.5, float("nan")],
                    "k": [1, 2, 3, 4]})
    _put_parquet(client, f"{prefix}/a.parquet", tbl, row_group_size=2)
    df = read_from_s3_native(spark, BUCKET, prefix, name="t_nan", **_opts(endpoint))
    # Spark: NaN > 0 is TRUE → rows 1, 3, 4
    assert sorted(r.k for r in df.filter("d > 0").collect()) == [1, 3, 4]
    assert sorted(r.k for r in df.filter("d = double('nan')").collect()) == [1, 4]
    # integer pushdown on the same file still exact
    assert sorted(r.k for r in df.filter("k >= 3").collect()) == [3, 4]


def test_streaming_truncate_mode_keeps_only_latest_batch(s3):
    """overwrite=True (complete/truncating output mode) must sweep previous
    batches' objects and manifests at each commit."""
    from pyspark.sql.types import LongType, StructField, StructType

    from sparkfusion.sources.s3py import _S3Commit, S3ParquetStreamWriter

    client, endpoint = s3
    prefix = f"trunc/{uuid.uuid4().hex}"
    schema = StructType([StructField("id", LongType())])
    w = S3ParquetStreamWriter(
        {"bucket": BUCKET, "prefix": prefix, **_opts(endpoint)}, schema, truncate=True
    )
    k0 = f"{prefix}/part-b0.parquet"
    client.put_object(Bucket=BUCKET, Key=k0, Body=b"b0")
    w.commit([_S3Commit(k0, 1)], batchId=0)
    k1 = f"{prefix}/part-b1.parquet"
    client.put_object(Bucket=BUCKET, Key=k1, Body=b"b1")
    w.commit([_S3Commit(k1, 1)], batchId=1)
    keys = _list(client, prefix)
    assert k1 in keys and k0 not in keys  # batch-0 data swept
    assert f"{prefix}/_batch-1.manifest" in keys
    assert f"{prefix}/_batch-0.manifest" not in keys  # old manifest swept
