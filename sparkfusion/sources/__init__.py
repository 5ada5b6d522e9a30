"""Sources & sinks (SURVEY.md §2.1).

Readers/writers for CSV, Parquet, JSON, in-memory batches, literal frames,
plus empty/random frame generators and the CSV→Parquet materializer. S3 paths
(S14-S17) ride the same API via ``s3a://`` URIs — Spark's S3A connector does
ranged reads and multipart-committer uploads internally, replacing the
reference's hand-rolled chunked transfer (``src/utils/aws.rs:91-149,308-468``).
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
]
