"""Sources/sinks suite (SURVEY.md §2.1).

File-producing queries write under /tmp/sparkfusion_io (overwrite mode) and
re-read — the oracle then checks the round-tripped values against the
original star table, proving the sink+scan pair lossless. CSV round-trips
stick to int/string columns (float text round-trips are format-dependent).
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..errors import PlanError
from ..session import table
from ..sources import (
    get_empty_df,
    get_random_df,
    read_batch,
    read_csv,
    read_literal,
    write_csv_to_parquet,
    write_parquet,
)
from . import register

IO_DIR = "/tmp/sparkfusion_io"


def _parquet_vintage(sf_dir: str, name: str) -> str:
    """Staleness key for a parquet table under ``sf_dir`` — changes whenever
    the table's bytes could have (mtime_ns + size), for marker-keyed sidecar
    fixtures (s26 blobs). ``os.stat()`` on a DIRECTORY succeeds (returning
    the dirent's own stat, size 4096), so the directory-shaped layout (e.g.
    the sf1 build) is detected explicitly with ``isdir`` — an in-place
    regeneration that rewrites part files under identical names leaves the
    directory mtime unchanged, and a stat-of-directory key would silently
    pin stale fixture blobs (r12 advice). Flat-file layout keys on the
    file's own (mtime_ns, size)."""
    src = os.path.join(sf_dir, f"{name}.parquet")
    if os.path.isdir(src):
        parts = sorted(
            (f, os.path.getsize(p), os.stat(p).st_mtime_ns)
            for f in os.listdir(src)
            if f.endswith(".parquet")
            for p in [os.path.join(src, f)]
        )
        return f"{sf_dir}|{parts}"
    st = os.stat(src)
    return f"{sf_dir}|{st.st_mtime_ns}|{st.st_size}"


@register(
    "s1_s3_csv_roundtrip",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
)
def s1_s3_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink → CSV scan with header + inferred schema, registered as a view.

    Reference: ``ctx.read_csv(path, CsvReadOptions::default())``
    (``src/utils/datasets.rs:54-56``) + ``register_csv``
    (``examples/algo/one_billion_row_challenge.rs:122``).
    """
    path = os.path.join(IO_DIR, "nation_csv")
    nat = table(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    nat.write.mode("overwrite").option("header", True).csv(path)
    df = read_csv(spark, path, header=True, infer_schema=True)
    df.createOrReplaceTempView("nation_from_csv")
    return spark.sql("SELECT n_nationkey, n_name, n_regionkey FROM nation_from_csv")


@register(
    "s2_csv_no_header",
    oracle="SELECT r_regionkey AS column_1, r_name AS column_2 FROM region",
)
def s2_csv_no_header(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Headerless CSV scan → auto-named ``column_1..`` (DataFusion convention).

    Reference: ``CsvReadOptions::new().has_header(false)`` at
    ``examples/algo/one_billion_row_challenge.rs:121-123``.
    """
    from ..sources import read_csv_no_header

    path = os.path.join(IO_DIR, "region_csv_nh")
    table(spark, sf_dir, "region").select("r_regionkey", "r_name").write.mode(
        "overwrite"
    ).option("header", False).csv(path)
    return read_csv_no_header(spark, path)


@register(
    "s4_s5_s11_parquet_roundtrip",
    oracle="SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier WHERE s_acctbal > 0",
)
def s4_s5_s11_parquet_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet sink → parquet scan → registered view → SQL over it.

    Reference: ``df.write_parquet`` (``src/utils/datasets.rs:112-114``),
    ``ctx.read_parquet`` (``:184-185``), ``register_parquet``
    (``examples/dataframe/query.rs:118-123``). The ``s_acctbal > 0`` filter is
    applied on the re-read side so PushedFilters hits the round-tripped file.
    """
    from ..sources import register_parquet

    path = os.path.join(IO_DIR, "supplier_pq")
    write_parquet(table(spark, sf_dir, "supplier"), path)
    register_parquet(spark, "supplier_rt", path)
    return spark.sql(
        "SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier_rt WHERE s_acctbal > 0"
    )


@register(
    "s7_memory_batch",
    oracle="""
    SELECT * FROM (VALUES (1, 'foo', 42), (2, 'bar', 43), (3, 'baz', 44))
      AS t(id, name, data)
    """,
)
def s7_memory_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-memory batch source (reference ``ctx.read_batch``/``register_batch``,
    ``examples/dataframe/query.rs:41``) — the ``idnamedata`` fixture."""
    return read_batch(
        spark,
        [(1, "foo", 42), (2, "bar", 43), (3, "baz", 44)],
        schema="id int, name string, data int",
        name="mem_batch",
    )


@register(
    "s8_literal_dataframe",
    oracle="""
    SELECT * FROM (VALUES (1, 'foo'), (2, 'bar'), (3, 'baz')) AS t(id, name)
    """,
)
def s8_literal_dataframe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``dataframe!`` macro analog (``examples/dataframe/create.rs:258-261``)."""
    return read_literal(spark, id=[1, 2, 3], name=["foo", "bar", "baz"])


@register("s9_empty_df", oracle=None)
def s9_empty_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """0-row 0-col frame (``get_empty_df``, ``src/utils/helpers.rs:34-38``;
    distinct from 1-row ``read_empty``, ``:27-30``) — rows-only check."""
    return get_empty_df(spark)


@register("s10_random_df", oracle=None)
def s10_random_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random frame generator (``get_random_df``,
    ``src/utils/helpers.rs:69-127``) — non-deterministic → rows-only."""
    return get_random_df(spark, ["int", "float", "string", "bool"], rows=100)


@register(
    "s13_csv_to_parquet",
    oracle="SELECT c_custkey, c_name, c_nationkey FROM customer",
)
def s13_csv_to_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV→Parquet materialization (``write_csv_to_parquet``,
    ``src/utils/datasets.rs:87-120``)."""
    csv_path = os.path.join(IO_DIR, "customer_csv")
    pq_path = os.path.join(IO_DIR, "customer_pq")
    table(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey").write.mode(
        "overwrite"
    ).option("header", True).csv(csv_path)
    return write_csv_to_parquet(spark, csv_path, pq_path)


@register(
    "s18_json_sink_roundtrip",
    oracle="SELECT r_regionkey, r_name FROM region",
)
def s18_json_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON sink → JSON scan round-trip (``df_to_json_bytes``,
    ``src/utils/dataframe.rs:813-823``; file form of ``df.toJSON``)."""
    path = os.path.join(IO_DIR, "region_json")
    reg = table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    reg.write.mode("overwrite").json(path)
    return spark.read.schema("r_regionkey int, r_name string").json(path)


def _z_oracle() -> str:
    terms = " + ".join(
        f"(((x >> {i}) & 1) << {2 * i}) + (((y >> {i}) & 1) << {2 * i + 1})"
        for i in range(8)
    )
    return f"""
    SELECT o_orderkey, CAST({terms} AS BIGINT) AS zval FROM (
      SELECT o_orderkey, o_custkey % 256 AS x,
             CAST(floor(o_totalprice / 2000) AS BIGINT) % 256 AS y
      FROM orders
    )
    """


@register("z1_zorder_key", oracle=_z_oracle())
def z1_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (Z-order) clustering key over (custkey, price-bucket): the
    multi-dimensional sort key behind `write_zordered` — files ordered by it
    keep parquet min/max footers narrow on BOTH dimensions, so scans prune
    on either filter (Delta/Iceberg's OPTIMIZE ZORDER, as a pure
    whole-stage-codegen bit-interleave expression; no UDF). Layout benefit
    is pinned in tests/test_layout.py; this entry pins the key math against
    DuckDB's bit arithmetic. See :func:`sparkfusion.sources.layout.zvalue`."""
    from pyspark.sql import functions as F

    from ..sources.layout import zvalue

    orders = table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        zvalue(
            [
                F.col("o_custkey") % 256,
                F.floor(F.col("o_totalprice") / 2000).cast("long") % 256,
            ],
            bits=8,
        ),
    )


def _hilbert_oracle(bits: int = 8) -> str:
    from ..sources.layout import hilbert_level_exprs

    sql = """
      SELECT o_orderkey,
             CAST(o_custkey % 256 AS BIGINT) AS hx,
             CAST(CAST(floor(o_totalprice / 2000) AS BIGINT) % 256 AS BIGINT) AS hy,
             CAST(0 AS BIGINT) AS hd
      FROM orders
    """
    for xe, ye, de in hilbert_level_exprs(bits):
        sql = f"SELECT o_orderkey, {xe} AS hx, {ye} AS hy, {de} AS hd FROM ({sql})"
    return f"SELECT o_orderkey, hd AS hval FROM ({sql})"


@register("z2_hilbert_key", oracle=_hilbert_oracle())
def z2_hilbert_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert-curve clustering key over the same (custkey, price-bucket)
    grid as z1: the locality-stronger layout key (every unit key step is a
    unit spatial step, so per-file min/max footers stay narrower than
    Morton's power-of-two diagonal jumps — what Delta Lake ships as 'liquid
    clustering'). The unrolled xy2d bit loop is 8 chained projections of
    pure CASE/bit arithmetic — no UDF, no shuffle, one codegen stage — and
    the SAME per-level expression strings are pasted into this oracle
    (:func:`sparkfusion.sources.layout.hilbert_level_exprs`), so both
    engines run textually identical integer math. Curve validity
    (bijection, unit-step adjacency) and the file-pruning win are pinned in
    tests/test_layout.py. See :func:`sparkfusion.sources.layout.with_hilbert_key`."""
    from ..sources.layout import with_hilbert_key

    orders = table(spark, sf_dir, "orders")
    return with_hilbert_key(
        orders,
        "o_custkey % 256",
        "CAST(floor(o_totalprice / 2000) AS BIGINT) % 256",
        keep=["o_orderkey"],
        bits=8,
        out="hval",
    )


@register(
    "s19_orc_roundtrip",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
    WHERE o_orderkey % 7 = 0
    """,
)
def s19_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink + scan roundtrip — the second columnar format Spark ships
    natively (zlib-compressed, predicate pushdown and column pruning work
    the same as parquet via the vectorized ORC reader). The oracle reads
    the ORIGINAL parquet rows, so a pass proves bit-faithful write→read
    fidelity through the ORC codec, not just that the query ran."""
    import os

    path = os.path.join(IO_DIR, "orders_orc")
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 7 == 0)
    orders.select("o_orderkey", "o_orderstatus", "o_totalprice").write.mode(
        "overwrite"
    ).orc(path)
    return spark.read.orc(path)


@register(
    "s24_s3_native_roundtrip",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
    WHERE o_orderkey % 11 = 0
    """,
)
def s24_s3_native_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boto3-native S3 parquet sink + scan roundtrip (SURVEY §2.1 S14-S17;
    reference ``src/utils/aws.rs:168-196,198-236,239-468``): an orders slice
    goes out through streaming multipart uploads and comes back via ranged
    GETs through the ``s3parquet`` Python DataSource, against an in-process
    S3 wire-protocol endpoint. (At this SF each object is a single final
    part — S3's 5 MiB non-final-part floor is real and moto enforces it;
    genuine ≥2-part shipping is exercised with ~14 MiB of data in
    ``tests/test_s3_native.py::test_spark_write_multipart_roundtrip``.)
    The oracle reads the ORIGINAL parquet rows, so a pass proves
    bit-faithful write→read fidelity through the whole boto3 path —
    credentials → multipart → _SUCCESS → list → footer probe → Arrow
    batches."""
    from ..sources.s3local import CREDS, ensure_bucket
    from ..sources.s3py import read_from_s3_native, write_to_s3_native

    _, endpoint = ensure_bucket("sparkfusion-suite")
    opts = {"endpoint_url": endpoint, **CREDS}
    slice_df = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 11 == 0)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .repartition(4)
    )
    write_to_s3_native(slice_df, "sparkfusion-suite", "roundtrip/orders", **opts)
    return read_from_s3_native(
        spark, "sparkfusion-suite", "roundtrip/orders",
        name="s24_orders_back", **opts,
    )


@register(
    "cal1_calendar_dim",
    oracle="""
    SELECT strftime(d, '%Y-%m-%d') AS iso,
           CAST(year(d) AS BIGINT) AS y, CAST(month(d) AS BIGINT) AS m,
           CAST(isodow(d) AS BIGINT) AS dow, isodow(d) >= 6 AS is_weekend,
           CAST(weekofyear(d) AS BIGINT) AS woy, CAST(quarter(d) AS BIGINT) AS q
    FROM (SELECT unnest(generate_series(DATE '2024-01-01', DATE '2024-12-31',
                                        INTERVAL 1 DAY))::DATE AS d)
    """,
)
def cal1_calendar_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar dimension for 2024 (366 rows): generated spine + derived
    year/month/quarter/ISO week/ISO weekday/weekend attributes — the
    conformed dimension every rollup joins against, produced distributed
    (sequence explode) and broadcastable at any span. ISO weekday parity:
    Spark weekday()+1 == DuckDB isodow (Mon=1..Sun=7); weekofyear is ISO
    week in both. See :func:`sparkfusion.sources.generators.build_calendar`."""
    from ..sources.generators import build_calendar

    return build_calendar(spark, "2024-01-01", "2024-12-31")


@register(
    "s20_dynamic_partition_overwrite",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderstatus = 'F' THEN o_totalprice + 7.0
                ELSE o_totalprice END AS o_totalprice,
           o_orderstatus
    FROM orders
    """,
)
def s20_dynamic_partition_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition overwrite roundtrip: orders written partitioned by
    status, then ONLY the 'F' partition backfilled with corrected prices
    (+7.0) — the other partitions must survive untouched (static overwrite
    would clobber the table; append would duplicate the re-run). The oracle
    is the expected post-backfill state over the ORIGINAL parquet. See
    :func:`sparkfusion.sources.writers.overwrite_partitions`."""
    import shutil

    from ..sources.writers import overwrite_partitions

    path = os.path.join(IO_DIR, "orders_by_status")
    shutil.rmtree(path, ignore_errors=True)
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    overwrite_partitions(orders, path, ["o_orderstatus"])
    fix = orders.filter(F.col("o_orderstatus") == "F").withColumn(
        "o_totalprice", F.col("o_totalprice") + F.lit(7.0)
    )
    overwrite_partitions(fix, path, ["o_orderstatus"])
    return spark.read.parquet(path)


@register(
    "s21_python_datasource",
    oracle="""
    WITH g AS (SELECT unnest(generate_series(0, 4999)) AS i)
    SELECT CAST(i % 7 AS INT) AS bucket, count(*) AS n,
           CAST(sum((i * 2654435761) % 1000) AS BIGINT) AS sum_milli
    FROM g GROUP BY i % 7
    """,
)
def s21_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python DataSource (Spark 4 connector extension point): a
    registered ``sparkfusion_docs`` format read like any built-in source,
    partition-planned across 8 slices. Every row is a pure integer function
    of its id, so DuckDB mirrors the source with ``generate_series`` — the
    compared aggregate sums the source's own INTEGER ``milli`` column
    directly (no float anywhere in the contract; the r5 driver mismatch came
    from a score·1000 re-integerization roundtrip).
    See :mod:`sparkfusion.sources.pysource`."""
    from ..sources.pysource import read_synth_docs

    docs = read_synth_docs(spark, n=5000, partitions=8)
    return docs.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("milli").alias("sum_milli"),
    )


@register(
    "s22_python_stream_source",
    oracle="""
    WITH g AS (SELECT unnest(generate_series(0, 1999)) AS i)
    SELECT CAST(i % 7 AS INT) AS bucket, count(*) AS n,
           CAST(sum((i * 2654435761) % 1000) AS BIGINT) AS sum_milli
    FROM g GROUP BY i % 7
    """,
)
def s22_python_stream_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python STREAMING source (Spark 4 SimpleDataSourceStreamReader):
    2000 synthetic rows arrive over 4 micro-batches of 500, aggregated with a
    streaming groupBy (complete mode) and driven to completion — offsets are
    JSON dicts, replay via readBetweenOffsets is idempotent because rows are
    a pure function of the id. Oracle = the same rows via generate_series.
    The compared aggregate sums the source's INTEGER ``milli`` column (no
    float in the contract), and the query verifies the stream ran to
    completion — a short stream (prefetch hiccup under load) raises loudly
    instead of hashing partial sums (the r5 driver-mismatch failure mode).
    See :mod:`sparkfusion.sources.pysource`."""
    from ..sources.pysource import read_synth_docs_stream
    from ..streaming.windows import run_stream_to_table

    n_total = 2000
    stream = read_synth_docs_stream(spark, n=n_total, rate=500)
    agg = stream.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("milli").alias("sum_milli"),
    )
    out = run_stream_to_table(agg, "complete")
    got = out.agg(F.sum("n")).collect()[0][0]
    if got != n_total:
        raise RuntimeError(
            f"s22: stream processed {got}/{n_total} rows — incomplete run"
        )
    return out


@register(
    "s23_jsonl_sink_roundtrip",
    oracle="""
    SELECT lang, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY lang
    """,
)
def s23_jsonl_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python DataSourceWriter (Spark 4 write-side extension point):
    documents stream through the two-phase-commit JSONL sink (task temp
    files promoted by the driver commit, _SUCCESS marker), are read back
    with the native JSON reader, and must aggregate identically to the
    ORIGINAL parquet — sink+codec fidelity proof, same pattern as the ORC
    roundtrip (s19). See :class:`sparkfusion.sources.pysource.JsonlDirWriter`."""
    import shutil

    from ..sources.pysource import write_jsonl

    path = os.path.join(IO_DIR, "documents_jsonl")
    shutil.rmtree(path, ignore_errors=True)
    docs = table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    write_jsonl(docs, path, mode="overwrite")
    # explicit read-back schema: JSON schema INFERENCE is env-sensitive
    # (n_chars inferred double on some builds flipped the r5 driver hash)
    back = spark.read.schema("doc_id bigint, lang string, n_chars bigint").json(
        os.path.join(path, "*.jsonl")
    )
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("total_chars")
    )


@register(
    "b1_bucketed_join",
    oracle="""
    SELECT c.c_mktsegment, count(*) AS n_orders,
           CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_mktsegment
    """,
)
def b1_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-free fact-to-fact join via BUCKETED tables: customer and
    orders are persisted bucketed 8-ways on the join key
    (:func:`sparkfusion.sources.writers.write_bucketed_table`), then joined
    from the catalog — identical bucket specs let the sort-merge join read
    co-located bucket files with NO Exchange on either side (plan asserted
    in tests/test_plans.py). At 100 TB this is THE tool for repeated joins
    on a stable key: the shuffle is paid once at ingest. Result is checked
    against the plain (shuffled) join oracle — bucketing must never change
    answers, only movement.

    Tables are sf-scoped and written AT MOST ONCE per session
    (ensure_bucketed_table skips the ingest when spec + row count already
    match), so bench REPEATS time the join, not the rewrite (ADVICE r6)."""
    from ..sources.writers import ensure_bucketed_table

    sf_tag = re.sub(r"[^0-9a-z]+", "_", sf_dir.rstrip("/").rsplit("/", 1)[-1].lower())
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = ensure_bucketed_table(
        cust, f"bkt_customer_{sf_tag}", 8, ["c_custkey"], ["c_custkey"]
    )
    o = ensure_bucketed_table(
        orders.withColumnRenamed("o_custkey", "c_custkey"),
        f"bkt_orders_{sf_tag}",
        8,
        ["c_custkey"],
        ["c_custkey"],
    )
    return (
        c.join(o, "c_custkey")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
    )


@register(
    "s25_xml_roundtrip",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
    WHERE o_orderkey % 13 = 0
    """,
)
def s25_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML sink + scan roundtrip (Spark 4 ships the former spark-xml as a
    built-in format). The read supplies an EXPLICIT schema — XML carries no
    types, so schema inference would hand back strings and the driver's
    type-strict compare would (rightly) fail; doubles survive the text
    roundtrip because the writer emits Java shortest-round-trip decimal
    strings. The oracle reads the ORIGINAL parquet rows, so a pass proves
    write->read fidelity through the XML codec, completing the
    text-format family next to CSV (s1/s2/s13), JSON (s18), and
    JSONL (s23)."""
    import os

    path = os.path.join(IO_DIR, "orders_xml")
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 13 == 0)
    orders.select("o_orderkey", "o_orderstatus", "o_totalprice").write.mode(
        "overwrite"
    ).option("rootTag", "orders").option("rowTag", "order").format("xml").save(path)
    return (
        spark.read.schema("o_orderkey bigint, o_orderstatus string, o_totalprice double")
        .option("rowTag", "order")
        .format("xml")
        .load(path)
    )


@register(
    "s26_binary_file_scan",
    oracle="""
    SELECT regexp_extract(filename, '([^/]+)$', 1) AS fname,
           CAST(octet_length(content) AS BIGINT) AS n_bytes,
           md5(decode(content)) AS content_md5
    FROM read_blob('/tmp/sparkfusion_io/doc_blobs/*.bin')
    """,
)
def s26_binary_file_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-file binary ingestion via Spark's ``binaryFile`` source — the
    front door of every multimodal pipeline (images/audio arrive as opaque
    files, not rows; the mm_* decoders downstream consume exactly this
    shape). Setup materializes a deterministic blob per sampled document
    (UTF-8 text bytes, doc_id % 97 == 0) and the query scans the DIRECTORY,
    reporting per-file name, size, and content md5 — verified against
    DuckDB's ``read_blob`` over the same files, so the oracle proves the
    bytes Spark hands the pipeline are the bytes on disk. At 100 TB
    binaryFile parallelizes per-file with ``pathGlobFilter``/partition
    pruning; files >2 GiB need chunked readers (mm_mjpeg_frames shows the
    frame-sampled variant)."""
    import os
    import shutil

    path = os.path.join(IO_DIR, "doc_blobs")
    marker = os.path.join(path, "_SF_MARKER")
    docs = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 97 == 0)
        .select("doc_id", "text")
    )
    # Fixture built ONCE per sf_dir (marker-keyed sidecar, r10 verdict #5),
    # and written by the EXECUTORS via foreachPartition — no driver collect,
    # so the setup parallelizes with the documents table instead of scaling
    # driver memory with it. Deterministic per-doc filenames make the
    # distributed write collision-free and idempotent; local mode / a shared
    # filesystem is the same requirement binaryFile itself has.
    # The marker keys on the documents parquet's (mtime, size) as well as
    # the sf_dir: the driver regenerates /root/testdata IN PLACE between
    # rounds (r12 observed), and an sf_dir-only key would silently pin
    # blobs from the previous data vintage.
    vintage = _parquet_vintage(sf_dir, "documents")
    prev = None
    if os.path.exists(marker):
        with open(marker) as f:
            prev = f.read()
    if prev != vintage:
        shutil.rmtree(path, ignore_errors=True)
        os.makedirs(path, exist_ok=True)

        def _write_blobs(rows):
            for r in rows:
                with open(os.path.join(path, f"doc_{r['doc_id']}.bin"), "wb") as f:
                    f.write(r["text"].encode("utf-8"))

        docs.foreachPartition(_write_blobs)
        with open(marker, "w") as f:
            f.write(vintage)
    bf = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")  # exclude the _SF_MARKER sidecar
        .load(path)
    )
    return bf.select(
        F.element_at(F.split(F.col("path"), "/"), -1).alias("fname"),
        F.col("length").alias("n_bytes"),
        F.md5(F.col("content")).alias("content_md5"),
    )


@register(
    "s27_s3_stream_sink_roundtrip",
    oracle="""
    SELECT event_id, user_id, epoch_us(ts) AS ts_us,
           CAST(value AS DOUBLE) AS value
    FROM events WHERE event_id % 5 = 0
    """,
)
def s27_s3_stream_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRUCTURED STREAMING → S3 exactly-once sink, end to end against the
    wire protocol (r8's `S3ParquetStreamWriter`, promoted from pytest-only
    to the oracle gate): an events slice becomes a 2-file stream
    (maxFilesPerTrigger=1 → two micro-batches), each batch ships through
    the shared multipart task writer and commits a per-batch manifest, and
    the result is read back through the `s3parquet` ranged-GET DataSource.
    The oracle reads the ORIGINAL events rows — a pass proves byte-faithful
    stream → multipart → manifest → list → footer-probe → Arrow fidelity
    across batch boundaries. Replay idempotence (original manifest wins,
    replay objects swept) is pinned separately in tests/test_s3_native.py."""
    import shutil
    import uuid

    from pyspark.sql import functions as F

    from ..session import events_with_ts
    from ..sources.s3local import CREDS, ensure_bucket
    from ..sources.s3py import (
        FORMAT_NAME,
        read_from_s3_native,
        register_s3_datasource,
    )

    _, endpoint = ensure_bucket("sparkfusion-suite")
    opts = {"endpoint_url": endpoint, **CREDS}
    run = uuid.uuid4().hex
    base = f"{IO_DIR}/s27_{run}"
    in_dir, ckpt = f"{base}/in", f"{base}/ckpt"
    prefix = f"stream_rt/{run}"

    ev = events_with_ts(spark, sf_dir).filter(F.col("event_id") % 5 == 0).select(
        "event_id", "user_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        F.col("value").cast("double").alias("value"),
    )
    for i in range(2):
        ev.filter(F.col("event_id") % 2 == i).coalesce(1).write.mode(
            "append"
        ).parquet(in_dir)

    register_s3_datasource(spark)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = (
        stream.writeStream.format(FORMAT_NAME)
        .option("bucket", "sparkfusion-suite")
        .option("prefix", prefix)
        .options(**{k: str(v) for k, v in opts.items()})
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    shutil.rmtree(base, ignore_errors=True)
    return read_from_s3_native(
        spark, "sparkfusion-suite", prefix, name=f"s27_back_{run}", **opts
    )


@register(
    "m4_compact_small_files",
    oracle="""
    SELECT l_orderkey, l_partkey, l_linenumber, l_quantity
    FROM lineitem WHERE l_orderkey % 5 = 0
    """,
)
def m4_compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction as a first-class maintenance query (the
    OPTIMIZE / bin-packing pass every lakehouse runs): a lineitem slice is
    deliberately fragmented into 32 tiny files (what a streaming or
    per-task writer accretes), compacted via
    :func:`sparkfusion.sources.writers.compact_parquet` — coalesce (no
    shuffle) into a staging dir, then a crash-safe park→promote→delete
    swap — and read back. The oracle pins that compaction is
    content-preserving; the file-count collapse and the swap's crash
    ordering are pinned in tests/test_maintenance.py. Completes the
    maintenance family: compact (this), vacuum (snapshot GC), time travel
    (m3), incremental refresh (mv1)."""
    from ..sources.writers import compact_parquet

    path = os.path.join(IO_DIR, "m4_compact")
    sl = (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 5 == 0)
        .select("l_orderkey", "l_partkey", "l_linenumber", "l_quantity")
    )
    sl.repartition(32).write.mode("overwrite").parquet(path)
    n_after = compact_parquet(spark, path, target_files=2)
    if n_after > 2:
        raise PlanError(f"compaction left {n_after} files, expected <= 2")
    return spark.read.parquet(path)


@register(
    "s29_corrupt_record_quarantine",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey FROM nation
    WHERE n_nationkey % 5 <> 0
    """,
)
def s29_corrupt_record_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-row quarantine on CSV ingest — the dead-letter pattern every
    production loader needs: rows that fail typed parsing must not kill the
    job (FAILFAST) or silently vanish (DROPMALFORMED), they must route to a
    quarantine sink for replay. Every 5th nation row is written with a
    poisoned integer field; the PERMISSIVE read captures each unparseable
    line intact in ``_corrupt``, good rows flow on, bad rows land in a
    quarantine parquet with their raw text. The oracle pins that the GOOD
    set is exactly the unpoisoned rows — nothing dropped, nothing leaked
    through with nulls. (Spark requires materializing the frame before
    filtering on the internal corrupt-record column — the documented
    raw-file restriction; production lands the typed+corrupt frame to a
    staging table first, which is exactly what the cache stands in for.)"""
    path = os.path.join(IO_DIR, "nation_poisoned_csv")
    qpath = os.path.join(IO_DIR, "nation_quarantine")
    nat = table(spark, sf_dir, "nation")
    lines = nat.select(
        F.when(
            F.col("n_nationkey") % 5 == 0,
            F.concat_ws(
                ",", F.concat(F.lit("x"), F.col("n_nationkey")), F.col("n_name"),
                F.col("n_regionkey"),
            ),
        )
        .otherwise(
            F.concat_ws(
                ",", F.col("n_nationkey"), F.col("n_name"), F.col("n_regionkey")
            )
        )
        .alias("value")
    )
    lines.write.mode("overwrite").text(path)
    raw = (
        spark.read.schema(
            "n_nationkey int, n_name string, n_regionkey int, _corrupt string"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(path)
    ).cache()
    try:
        bad = raw.filter(F.col("_corrupt").isNotNull()).select("_corrupt")
        bad.write.mode("overwrite").parquet(qpath)
        good = raw.filter(F.col("_corrupt").isNull()).select(
            "n_nationkey", "n_name", "n_regionkey"
        )
        out = good.localCheckpoint(eager=True)
    finally:
        raw.unpersist()
    return out
