"""S3 access shim (SURVEY.md §2.1 S14-S17).

The reference hand-rolls S3: credential chain → object-store registration →
ranged parallel GETs (10 MiB chunks, 10 workers) → multipart uploads
(``src/utils/aws.rs:57-468``, ``src/utils/constants.rs:1-3``). On Spark all
of that is the S3A connector's job — applications just use ``s3a://`` URIs
with every reader/writer in :mod:`sparkfusion.sources`. This module holds the
one piece that is application-level: wiring credentials/region/endpoint into
the Hadoop configuration.

Untestable in this container (no S3 endpoint); the configuration keys are the
standard public ``fs.s3a.*`` surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def configure_s3(
    spark: SparkSession,
    access_key: str | None = None,
    secret_key: str | None = None,
    session_token: str | None = None,
    region: str | None = None,
    endpoint: str | None = None,
) -> None:
    """Set S3A credentials/region on the live session.

    With no explicit keys, S3A falls back to its default provider chain
    (env vars, instance profile) — the same behavior as the reference's
    ``aws_config::load_from_env`` (``src/utils/aws.rs:33-54``).
    """
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    if access_key:
        conf.set("fs.s3a.access.key", access_key)
    if secret_key:
        conf.set("fs.s3a.secret.key", secret_key)
    if session_token:
        conf.set("fs.s3a.session.token", session_token)
        conf.set(
            "fs.s3a.aws.credentials.provider",
            "org.apache.hadoop.fs.s3a.TemporaryAWSCredentialsProvider",
        )
    if region:
        conf.set("fs.s3a.endpoint.region", region)
    if endpoint:
        conf.set("fs.s3a.endpoint", endpoint)
    # the reference's hand-tuned transfer settings (constants.rs: 10 MiB
    # chunks, 10 workers) map to S3A's own knobs:
    conf.set("fs.s3a.multipart.size", "10M")
    conf.set("fs.s3a.threads.max", "10")


#: URI scheme for the object store. "s3a" in production; tests flip it to
#: "file" so the read/write paths below execute END-TO-END against a local
#: Hadoop filesystem — the container has no S3 endpoint and pyspark ships
#: without hadoop-aws, so file:// is the closest executable stand-in (it
#: exercises everything these functions own; the s3a:// connector itself is
#: Hadoop's code, not ours).
_SCHEME = "s3a"


def _object_uri(bucket: str, key: str) -> str:
    """Hadoop URI for (bucket, key) under the active scheme. file: URIs take
    the bucket as a local directory path (no authority component)."""
    if _SCHEME == "file":
        return f"file:{bucket}/{key}"
    return f"{_SCHEME}://{bucket}/{key}"


def read_from_s3(spark: SparkSession, bucket: str, key: str, name: str = "t") -> DataFrame:
    """Register an S3 parquet object as a table and return ``select *`` —
    the exact shape of ``read_from_s3`` (``src/utils/aws.rs:168-196``)."""
    df = spark.read.parquet(_object_uri(bucket, key))
    df.createOrReplaceTempView(name)
    return spark.sql(f"SELECT * FROM {name}")


def write_to_s3(df: DataFrame, bucket: str, key: str, mode: str = "overwrite") -> None:
    """Parquet sink to S3 (``write_to_s3``, ``src/utils/aws.rs:198-236``);
    multipart upload handled by the S3A committer."""
    df.write.mode(mode).parquet(_object_uri(bucket, key))
