"""Data-quality suite: column profiling, constraint audit, referential
orphans, keep-latest compaction — the gatekeeper queries a 100 TB pipeline
runs around every load. All outputs are integer counts or window picks, so
determinism is structural (no float aggregation anywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.quality import (
    check_constraints,
    keep_latest,
    profile_columns,
    referential_orphans,
)
from ..session import events_with_ts, table
from . import register


@register(
    "dq1_profile_orders",
    oracle="""
    SELECT 'o_orderkey' AS column_name, count(*) AS n_rows,
           count(*) - count(o_orderkey) AS n_nulls,
           count(DISTINCT o_orderkey) AS n_distinct FROM orders
    UNION ALL SELECT 'o_custkey', count(*), count(*) - count(o_custkey),
           count(DISTINCT o_custkey) FROM orders
    UNION ALL SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
           count(DISTINCT o_orderstatus) FROM orders
    UNION ALL SELECT 'o_totalprice', count(*), count(*) - count(o_totalprice),
           count(DISTINCT o_totalprice) FROM orders
    UNION ALL SELECT 'o_orderpriority', count(*), count(*) - count(o_orderpriority),
           count(DISTINCT o_orderpriority) FROM orders
    """,
)
def dq1_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-scan column profile of orders (rows / nulls / exact distincts per
    column, long format). The oracle re-reads the table per column; Spark
    does it in a single pass + stack — at 100 TB that is 5 scans vs 1. See
    :func:`sparkfusion.operators.quality.profile_columns` (`approx=True`
    switches to HLL++ and kills the Expand for production)."""
    orders = table(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"]
    return profile_columns(orders, cols)


@register(
    "dq2_constraints_lineitem",
    oracle="""
    SELECT 'quantity_positive' AS rule,
           CAST(sum(CASE WHEN l_quantity > 0 THEN 0 ELSE 1 END) AS BIGINT)
             AS violations,
           count(*) AS n_rows FROM lineitem
    UNION ALL SELECT 'price_nonnegative',
           CAST(sum(CASE WHEN l_extendedprice >= 0 THEN 0 ELSE 1 END) AS BIGINT),
           count(*)
    FROM lineitem
    UNION ALL SELECT 'discount_in_unit_range',
           CAST(sum(CASE WHEN l_discount BETWEEN 0 AND 1 THEN 0 ELSE 1 END) AS BIGINT),
           count(*)
    FROM lineitem
    UNION ALL SELECT 'returnflag_domain',
           CAST(sum(CASE WHEN l_returnflag IN ('A', 'N', 'R') THEN 0 ELSE 1 END)
                AS BIGINT),
           count(*)
    FROM lineitem
    UNION ALL SELECT 'shipdate_present',
           CAST(sum(CASE WHEN l_shipdate IS NOT NULL THEN 0 ELSE 1 END) AS BIGINT),
           count(*)
    FROM lineitem
    """,
)
def dq2_constraints_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative constraint audit over lineitem in ONE scan (NULL counts as
    violation — unknown ≠ satisfied). The oracle's UNION ALL re-scans per
    rule; Spark evaluates all rules in a single agg. See
    :func:`sparkfusion.operators.quality.check_constraints`."""
    li = table(spark, sf_dir, "lineitem")
    return check_constraints(
        li,
        {
            "quantity_positive": F.col("l_quantity") > 0,
            "price_nonnegative": F.col("l_extendedprice") >= 0,
            "discount_in_unit_range": F.col("l_discount").between(0, 1),
            "returnflag_domain": F.col("l_returnflag").isin("A", "N", "R"),
            "shipdate_present": F.col("l_shipdate").isNotNull(),
        },
    )


@register(
    "dq3_referential_orphans",
    oracle="""
    SELECT 'lineitem->orders' AS relation,
           (SELECT count(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
             AS orphans,
           (SELECT count(*) FROM lineitem) AS child_rows
    UNION ALL
    SELECT 'orders->customer',
           (SELECT count(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)),
           (SELECT count(*) FROM orders)
    UNION ALL
    SELECT 'customer->nation',
           (SELECT count(*) FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)),
           (SELECT count(*) FROM customer)
    """,
)
def dq3_referential_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: orphan counts for the star's three FK
    edges via LEFT ANTI joins (keys-only shuffle; parent side distinct-ed,
    broadcast when it is a dim). See
    :func:`sparkfusion.operators.quality.referential_orphans`."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    return referential_orphans(
        [
            ("lineitem->orders", li, "l_orderkey", orders, "o_orderkey"),
            ("orders->customer", orders, "o_custkey", cust, "c_custkey"),
            ("customer->nation", cust, "c_nationkey", nation, "n_nationkey"),
        ]
    )


@register(
    "m2_keep_latest",
    oracle="""
    SELECT user_id, event_id, event_type, value, epoch_us(ts) AS ts_us
    FROM events
    QUALIFY row_number() OVER (
      PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC
    ) = 1
    """,
)
def m2_keep_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-log compaction: the latest event per user (ts DESC, event_id
    DESC tiebreak) — the keep-latest primitive CDC snapshot materialization
    and SCD-1 upserts reduce to. One window shuffle on user_id. See
    :func:`sparkfusion.operators.quality.keep_latest`."""
    ev = events_with_ts(spark, sf_dir).select(
        "user_id",
        "event_id",
        "event_type",
        "value",
        F.unix_micros(F.col("ts")).alias("ts_us"),
    )
    return keep_latest(ev, ["user_id"], ["ts_us", "event_id"])


@register(
    "dq4_partition_skew",
    oracle="""
    WITH per_key AS (
      SELECT l_suppkey AS key, count(*) AS n FROM lineitem GROUP BY 1
    ), stats AS (
      SELECT CAST(sum(n) AS DOUBLE) / count(*) AS avg_n FROM per_key
    )
    SELECT key, n, round(n / avg_n, 6) AS skew_factor
    FROM per_key, stats
    ORDER BY n DESC, key LIMIT 10
    """,
)
def dq4_partition_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostic: the 10 heaviest l_suppkey groups and their
    skew factor (rows / mean-rows-per-key) — what you run BEFORE a big join
    to decide between plain shuffle, salting, and AQE skew-join. One
    groupBy + a tiny stats reduce broadcast back; top-10 is
    TakeOrderedAndProject."""
    li = table(spark, sf_dir, "lineitem")
    per_key = li.groupBy(F.col("l_suppkey").alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    stats = per_key.agg(
        (F.sum("n").cast("double") / F.count(F.lit(1))).alias("avg_n")
    )
    return (
        per_key.join(F.broadcast(stats))
        .select("key", "n", F.round(F.col("n") / F.col("avg_n"), 6).alias("skew_factor"))
        .orderBy(F.col("n").desc(), F.col("key"))
        .limit(10)
    )


@register(
    "dq5_duplicate_keys",
    oracle="""
    SELECT 'orders.o_orderkey' AS key_name,
           (SELECT count(*) FROM (
              SELECT o_orderkey FROM orders GROUP BY 1 HAVING count(*) > 1))
             AS duplicated_keys,
           (SELECT count(*) FROM orders) AS n_rows
    UNION ALL
    SELECT 'lineitem.l_orderkey',
           (SELECT count(*) FROM (
              SELECT l_orderkey FROM lineitem GROUP BY 1 HAVING count(*) > 1)),
           (SELECT count(*) FROM lineitem)
    """,
)
def dq5_duplicate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary-key uniqueness audit: how many key values occur more than
    once (orders.o_orderkey must be 0 — it IS the PK; lineitem.l_orderkey
    is expectedly non-unique). groupBy + HAVING per relation; the audit
    shape for 'can I safely MERGE on this key'."""

    def dup_count(df: DataFrame, col: str, label: str) -> DataFrame:
        dups = (
            df.groupBy(col).agg(F.count(F.lit(1)).alias("c")).filter(F.col("c") > 1)
        )
        return (
            dups.agg(F.count(F.lit(1)).alias("duplicated_keys"))
            .crossJoin(df.agg(F.count(F.lit(1)).alias("n_rows")))
            .select(F.lit(label).alias("key_name"), "duplicated_keys", "n_rows")
        )

    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    return dup_count(orders, "o_orderkey", "orders.o_orderkey").unionByName(
        dup_count(li, "l_orderkey", "lineitem.l_orderkey")
    )


@register(
    "a16_equidepth_histogram",
    oracle="""
    SELECT o_orderpriority, bucket, count(*) AS n,
           min(o_totalprice) AS lo, max(o_totalprice) AS hi
    FROM (
      SELECT o_orderpriority, o_totalprice,
             NTILE(4) OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice, o_orderkey) AS bucket
      FROM orders
    )
    GROUP BY o_orderpriority, bucket
    """,
)
def a16_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group equi-depth (quantile) histogram: 4 equal-count buckets of
    order value per priority class, with each bucket's row count and value
    bounds — the distribution profile that drives range-partition planning
    and skew detection (a15 is the fixed-WIDTH sibling). NTILE's
    remainder-to-leading-buckets split is standard SQL semantics on both
    engines; the (value, key) order is total so bucket assignment is
    deterministic. Shuffles once on the group key; per-group windows scale
    with group count (a GLOBAL ntile would serialize on one reducer — at
    100 TB use approx_percentile breakpoints instead, a21)."""
    from pyspark.sql import Window

    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return (
        table(spark, sf_dir, "orders")
        .select("o_orderpriority", "o_totalprice", F.ntile(4).over(w).alias("bucket"))
        .groupBy("o_orderpriority", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
    )


@register(
    "dq5_psi_drift",
    oracle="""
    WITH b AS (
      SELECT least(CAST(floor(value / 50) AS INT), 9) AS bucket,
             CASE WHEN epoch_us(ts) < 1705363200000000 THEN 1 ELSE 0 END AS is_base
      FROM events
    ),
    c AS (
      SELECT bucket,
             sum(is_base) AS n_base,
             sum(1 - is_base) AS n_cur
      FROM b GROUP BY bucket
    ),
    t AS (SELECT sum(n_base) AS tb, sum(n_cur) AS tc FROM c)
    SELECT bucket,
           CAST(n_base AS BIGINT) AS n_base,
           CAST(n_cur AS BIGINT) AS n_cur,
           round((CAST(n_base + 1 AS DOUBLE) / (tb + 10)
                  - CAST(n_cur + 1 AS DOUBLE) / (tc + 10))
                 * ln((CAST(n_base + 1 AS DOUBLE) / (tb + 10))
                      / (CAST(n_cur + 1 AS DOUBLE) / (tc + 10))), 9) AS psi_term
    FROM c CROSS JOIN t
    """,
)
def dq5_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift profile: event values bucketed into
    10 fixed-width bins, baseline window (before a fixed cut timestamp) vs
    current, add-one smoothed shares, per-bucket PSI contribution
    ``(p−q)·ln(p/q)`` — the distribution-shift monitor run between pipeline
    snapshots (Σterms > 0.2 = investigate). Emitting per-BUCKET terms keeps
    every number a function of exact integer counts plus one libm ln
    (rounded 9) — no cross-row float summation anywhere, so the result is
    engine- and partitioning-stable; callers sum the rounded terms in
    DECIMAL for the scalar PSI. One scan, one 10-row groupBy, broadcast
    totals."""
    ev = events_with_ts(spark, sf_dir)
    bucket = F.least(F.floor(F.col("value") / 50).cast("int"), F.lit(9))
    is_base = (F.unix_micros(F.col("ts")) < F.lit(1705363200000000)).cast("long")
    c = (
        ev.select(bucket.alias("bucket"), is_base.alias("is_base"))
        .groupBy("bucket")
        .agg(
            F.sum("is_base").alias("n_base"),
            F.sum(F.lit(1) - F.col("is_base")).alias("n_cur"),
        )
    )
    t = c.agg(F.sum("n_base").alias("tb"), F.sum("n_cur").alias("tc"))
    p = (F.col("n_base") + 1).cast("double") / (F.col("tb") + 10)
    q = (F.col("n_cur") + 1).cast("double") / (F.col("tc") + 10)
    return c.join(F.broadcast(t)).select(
        "bucket",
        "n_base",
        "n_cur",
        F.round((p - q) * F.log(p / q), 9).alias("psi_term"),
    )


@register(
    "dq6_schema_drift",
    oracle="""
    SELECT * FROM (VALUES
      ('o_orderpriority', 'removed', 'string', NULL),
      ('o_refund_flag', 'added', NULL, 'boolean'),
      ('o_totalprice', 'retyped', 'double', 'decimal(12,2)')
    ) AS t(col_name, change, old_type, new_type)
    """,
)
def dq6_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-drift detection: a new batch of orders drops a column, adds
    one, and retypes the money column — the diff surfaces every change as
    rows BEFORE the append corrupts the dataset. See
    :func:`sparkfusion.operators.quality.schema_diff`."""
    from ..operators.quality import schema_diff

    old = table(spark, sf_dir, "orders")
    new = (
        old.drop("o_orderpriority")
        .withColumn("o_refund_flag", F.lit(False))
        .withColumn("o_totalprice", F.col("o_totalprice").cast("decimal(12,2)"))
    )
    return schema_diff(old, new)


@register(
    "dq7_table_fingerprint",
    oracle="""
    WITH h AS (
      SELECT ('0x' || substr(md5(
               CAST(o_orderkey AS VARCHAR) || '|' ||
               CAST(o_custkey AS VARCHAR) || '|' ||
               o_orderstatus || '|' ||
               CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR) || '|' ||
               CAST(epoch_us(o_orderdate) AS VARCHAR) || '|' ||
               o_orderpriority), 1, 15))::BIGINT AS fp
      FROM orders
    )
    SELECT count(*) AS n_rows,
           bit_xor(fp) AS xor_fp,
           CAST(sum(fp) AS DOUBLE) AS sum_fp,
           min(fp) AS min_fp, max(fp) AS max_fp
    FROM h
    """,
)
def dq7_table_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent whole-table content fingerprint — the migration /
    replication validator: serialize every row through an EXPLICIT canonical
    form (decimal-cast money, integer epoch-µs timestamps, '|' field
    separator — never engine-default formatting), md5 it, fold the top 60
    bits into xor/sum/min/max accumulators. Any engine computing the same
    canonicalization gets bit-identical accumulators, so source and target
    of a 100 TB copy can each run one map-side-combinable aggregation pass
    and compare five scalars instead of shipping rows. Same canon-hash
    discipline as ``sources.writers.ensure_bucketed_table``'s content
    fingerprint; 60-bit slices keep every value positive in signed BIGINT
    on both engines."""
    o = table(spark, sf_dir, "orders")
    canon = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.col("o_orderstatus"),
        F.col("o_totalprice").cast("decimal(12,2)").cast("string"),
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).cast("string"),
        F.col("o_orderpriority"),
    )
    h = o.select(
        F.conv(F.substring(F.md5(canon), 1, 15), 16, 10).cast("long").alias("fp")
    )
    return h.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.expr("bit_xor(fp)").alias("xor_fp"),
        F.sum(F.col("fp").cast("decimal(38,0)")).cast("double").alias("sum_fp"),
        F.min("fp").alias("min_fp"),
        F.max("fp").alias("max_fp"),
    )


# Benford first-digit probabilities log10(1 + 1/d), as 12-decimal LITERALS:
# both engines parse the same decimal text to the same double, so the chi²
# arithmetic is bit-identical — computing log10 in each engine would pick up
# libm last-ulp differences instead.
_BENFORD_P = {
    "1": "0.301029995664",
    "2": "0.176091259056",
    "3": "0.124938736608",
    "4": "0.096910013008",
    "5": "0.079181246048",
    "6": "0.066946789631",
    "7": "0.057991946978",
    "8": "0.051152522447",
    "9": "0.045757490561",
}


@register(
    "dq8_benford",
    oracle=f"""
    WITH d AS (
      SELECT regexp_extract(CAST(o_totalprice AS VARCHAR), '[1-9]', 0) AS digit
      FROM orders
    ),
    c AS (
      SELECT digit, count(*) AS n_obs, sum(count(*)) OVER () AS n_total
      FROM d GROUP BY digit
    )
    SELECT digit, n_obs,
           round(CAST(CASE digit
             {' '.join(f"WHEN '{k}' THEN {v}" for k, v in _BENFORD_P.items())}
           END AS DOUBLE), 9) AS exp_freq,
           round((n_obs - n_total * CAST(CASE digit
             {' '.join(f"WHEN '{k}' THEN {v}" for k, v in _BENFORD_P.items())}
           END AS DOUBLE)) * (n_obs - n_total * CAST(CASE digit
             {' '.join(f"WHEN '{k}' THEN {v}" for k, v in _BENFORD_P.items())}
           END AS DOUBLE)) / (n_total * CAST(CASE digit
             {' '.join(f"WHEN '{k}' THEN {v}" for k, v in _BENFORD_P.items())}
           END AS DOUBLE)), 9) AS chi2_term
    FROM c
    """,
)
def dq8_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-significant-digit conformance — the classic
    fabricated-data / fraud screen for financial columns: observed count
    per leading digit of o_totalprice against the Benford expectation
    log10(1+1/d), with the per-digit χ² contribution (sum them for the
    test statistic; large terms localize WHICH digit deviates). One
    groupBy to 9 rows, then a window total over the aggregated frame —
    the global-count window costs nothing because it runs on 9 rows, not
    the table. Expected frequencies are 12-decimal literals in BOTH
    engines (an engine-computed log10 would differ in the last ulp);
    first digit extracted from the canonical decimal string so values
    below 1 resolve to their first non-zero digit identically."""
    o = table(spark, sf_dir, "orders")
    from pyspark.sql import Window

    digit = F.regexp_extract(F.col("o_totalprice").cast("string"), "[1-9]", 0)
    c = (
        o.select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_obs"))
        .withColumn("n_total", F.sum("n_obs").over(Window.partitionBy()))
    )
    p = None
    for k, v in _BENFORD_P.items():
        expr = F.when(F.col("digit") == k, F.lit(float(v)))
        p = expr if p is None else p.when(F.col("digit") == k, F.lit(float(v)))
    n, t = F.col("n_obs"), F.col("n_total")
    return c.select(
        "digit",
        "n_obs",
        F.round(p, 9).alias("exp_freq"),
        F.round((n - t * p) * (n - t * p) / (t * p), 9).alias("chi2_term"),
    )
