"""Sources & sinks (SURVEY.md §2.1).

Readers/writers for CSV, Parquet, JSON, in-memory batches, literal frames,
plus empty/random frame generators and the CSV→Parquet materializer. S3
(S14-S17) has two paths: ``s3a://`` URIs via Spark's S3A connector (needs the
hadoop-aws jar; :mod:`.s3`), and the boto3-native ``s3parquet`` Python
DataSource (:mod:`.s3py` — ranged GETs + streaming multipart uploads, the
reference's hand-rolled transfer, ``src/utils/aws.rs:91-149,308-468``), which
runs end-to-end in this container against any S3 wire-protocol endpoint.
"""

from .readers import (
    read_batch,
    read_csv,
    read_csv_no_header,
    read_literal,
    read_parquet,
    register_csv,
    register_parquet,
)
from .generators import get_empty_df, get_random_df, read_empty
from .s3py import read_from_s3_native, register_s3_datasource, write_to_s3_native
from .writers import df_to_json_rows, write_csv_to_parquet, write_json, write_parquet

__all__ = [
    "read_csv",
    "read_csv_no_header",
    "register_csv",
    "read_parquet",
    "register_parquet",
    "read_batch",
    "read_literal",
    "get_empty_df",
    "read_empty",
    "get_random_df",
    "write_parquet",
    "write_json",
    "write_csv_to_parquet",
    "df_to_json_rows",
    "register_s3_datasource",
    "read_from_s3_native",
    "write_to_s3_native",
]
