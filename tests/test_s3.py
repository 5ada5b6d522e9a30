"""S3 wiring tests (SURVEY.md §2.1 S14-S17) — no endpoint in this container,
so these verify exactly what is verifiable offline: the `fs.s3a.*` keys
`configure_s3` writes, and the URIs `read_from_s3`/`write_to_s3` compose.
The residual untested surface is purely environmental (a live S3A filesystem).
"""

from __future__ import annotations

from sparkfusion.sources.s3 import configure_s3, read_from_s3, write_to_s3


def test_configure_s3_sets_exact_s3a_keys(spark):
    configure_s3(
        spark,
        access_key="AKTEST",
        secret_key="SKTEST",
        session_token="TOKTEST",
        region="eu-central-1",
        endpoint="http://localhost:9000",
    )
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    assert conf.get("fs.s3a.access.key") == "AKTEST"
    assert conf.get("fs.s3a.secret.key") == "SKTEST"
    assert conf.get("fs.s3a.session.token") == "TOKTEST"
    assert (
        conf.get("fs.s3a.aws.credentials.provider")
        == "org.apache.hadoop.fs.s3a.TemporaryAWSCredentialsProvider"
    )
    assert conf.get("fs.s3a.endpoint.region") == "eu-central-1"
    assert conf.get("fs.s3a.endpoint") == "http://localhost:9000"
    # reference's hand-tuned transfer settings (constants.rs: 10 MiB chunks,
    # 10 workers) mapped onto S3A's knobs
    assert conf.get("fs.s3a.multipart.size") == "10M"
    assert conf.get("fs.s3a.threads.max") == "10"


def test_configure_s3_without_token_keeps_default_provider(spark):
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    conf.unset("fs.s3a.aws.credentials.provider")
    configure_s3(spark, access_key="AK2", secret_key="SK2")
    assert conf.get("fs.s3a.access.key") == "AK2"
    # no session token → provider chain untouched (env/instance-profile default)
    assert conf.get("fs.s3a.aws.credentials.provider") is None


class _ReaderProxy:
    def __init__(self, owner):
        self._owner = owner

    def parquet(self, path):
        self._owner.captured["read_path"] = path
        return self._owner.df


class _SparkProxy:
    """Delegates sql/view plumbing to the real session but intercepts
    ``spark.read.parquet`` so the composed s3a:// URI is observable without
    an endpoint."""

    def __init__(self, spark, df):
        self._spark = spark
        self.df = df
        self.captured = {}

    @property
    def read(self):
        return _ReaderProxy(self)

    def sql(self, q):
        return self._spark.sql(q)


def test_read_from_s3_composes_s3a_uri(spark, sf_dir):
    real = spark.read.parquet(f"{sf_dir}/region.parquet")
    proxy = _SparkProxy(spark, real)
    out = read_from_s3(proxy, "my-bucket", "data/region.parquet", name="s3_region")
    assert proxy.captured["read_path"] == "s3a://my-bucket/data/region.parquet"
    # full read_from_s3 shape: view registered + select * returns the data
    assert out.count() == real.count()


class _WriterProxy:
    def __init__(self, captured):
        self._captured = captured

    def mode(self, m):
        self._captured["mode"] = m
        return self

    def parquet(self, path):
        self._captured["write_path"] = path


class _DFProxy:
    def __init__(self):
        self.captured = {}

    @property
    def write(self):
        return _WriterProxy(self.captured)


def test_write_to_s3_composes_s3a_uri():
    df = _DFProxy()
    write_to_s3(df, "out-bucket", "exports/part.parquet")
    assert df.captured["write_path"] == "s3a://out-bucket/exports/part.parquet"
    assert df.captured["mode"] == "overwrite"
    df2 = _DFProxy()
    write_to_s3(df2, "out-bucket", "exports/part.parquet", mode="append")
    assert df2.captured["mode"] == "append"
