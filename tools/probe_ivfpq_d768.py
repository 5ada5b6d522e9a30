"""Production-dimension probe for the IVF-PQ family (closes the last d=64
caveat in the r11 verdict: semdedup / cosine_pairs / argmin were re-proved at
d=768 by tools/probe_d768.py; this does the same for the PQ module).

What it measures, at n=100k hashed-uniform d=768 vectors (the same frame
family as probe_d768 — near-orthogonal, so candidate sets stay small and the
probe times ENGINE work, not pair output):

1. ``derive_ivfpq_params`` — bounded driver math (n_cells+n_codes rows).
2. ``ivfpq_encode_literal`` — the map-only streaming-ingest encoder, at two
   coarse sizes (n_cells=64 and 256) to locate the literal-expression
   ceiling: the cell argmin is ONE expression with n_cells*768 literal
   leaves, the exact interpreted-bound regime the r13 two_level probe
   measured (~1.2e8 element-ops/s effective on this box). The PQ half adds
   m*n_codes*dsub leaves. Throughput in rows/s is the number that matters
   for a streaming ingest claim.
3. ``ivfpq_adc_topk`` — the full deterministic query path (coarse assign via
   broadcast crossJoin + residual encode via the (j)-join + per-cell ADC) at
   n_cells=64, m=96, n_codes=32, nprobe=8.
4. ``ivf_build`` — the PRODUCTION coarse quantizer (MLlib seeded KMeans) at
   the FAISS k≈sqrt(n) rule, timed separately because its cost model (native
   JVM, triangle-inequality pruned) is unrelated to the literal path.

Usage: python tools/probe_ivfpq_d768.py [n]   (default 100000)
       python tools/probe_ivfpq_d768.py [n] --store-query
Solo rule: never run while another Spark JVM is up (bench/sweeps/pytest).

``--store-query`` (r15, verdict #1) measures the PRODUCTION query path at
the same config as the in-plan ``adc_topk_cells64_nprobe8`` number
(110.5 s/query at n=100k in the r14 probe): batch-encode the corpus
(``ivfpq_encode_batch``), write it partitioned by cell, then answer 3
queries via ``ivfpq_store_adc_topk`` — partition-pruned scan + int64 ADC
table kernel. Reported per-query wall is the apples-to-apples comparison.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from sparkfusion.session import get_session  # noqa: E402

D = 768


def make_frame(spark, n: int, d: int = D):
    # GLSL-hash components in [-1, 1] (see tools/probe_d768.py for why the
    # plain-sin family is unusable at d=768)
    def comp(j):
        x = F.sin(F.col("id").cast("double") * 12.9898 + j.cast("double") * 78.233) * 43758.5453
        return (x - F.floor(x)) * 2.0 - 1.0

    df = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(F.sequence(F.lit(0), F.lit(d - 1)), comp).alias("embedding"),
    ).localCheckpoint(eager=False)
    df.count()
    return df


def timed(label: str, fn) -> dict:
    t0 = time.monotonic()
    try:
        out = fn()
    except Exception as e:  # a size-limit failure IS a probe finding
        wall = round(time.monotonic() - t0, 2)
        msg = f"{type(e).__name__}: {str(e)[:200]}"
        print(f"  {label}: FAILED after {wall}s — {msg}", flush=True)
        return {"label": label, "wall": wall, "error": msg}
    wall = round(time.monotonic() - t0, 2)
    print(f"  {label}: {wall}s out={out}", flush=True)
    return {"label": label, "wall": wall, "out": out}


def store_query_probe(spark, df, n: int) -> None:
    """The production query path vs the in-plan composite (verdict #1)."""
    import shutil

    from pyspark.sql import functions as F  # noqa: F811

    from sparkfusion.llm.pq import (
        derive_ivfpq_params,
        ivfpq_encode_batch,
        ivfpq_store_adc_topk,
    )

    n_cells, m, n_codes = 64, 96, 32
    results = []
    cents, cb = derive_ivfpq_params(df, n_cells=n_cells, m=m, dim=D, n_codes=n_codes)
    path = "/root/repo/.tmp/ivfpq_store_d768"
    shutil.rmtree(path, ignore_errors=True)
    r = timed(
        f"batch_encode_write_cells{n_cells}_m{m}",
        lambda: ivfpq_encode_batch(df, cents, cb)
        .write.mode("overwrite").partitionBy("cell").parquet(path),
    )
    r["rows_per_s"] = round(n / r["wall"], 1)
    results.append(r)
    code_cols = [f"code{j}" for j in range(m)]
    stored = spark.read.parquet(path).select(
        "vec_id", F.col("cell").cast("int").alias("cell"), *code_cols
    )
    for i, qid in enumerate((n - 1, n // 2, 1)):
        qv = [
            float(x)
            for x in df.filter(F.col("vec_id") == qid).select("embedding").first()[0]
        ]
        results.append(
            timed(
                f"store_adc_query{i}_nprobe8",
                lambda qv=qv, qid=qid: ivfpq_store_adc_topk(
                    stored, qv, cents, cb, q_id=qid, nprobe=8, k=10
                ).count(),
            )
        )
    print(json.dumps(results))
    shutil.rmtree(path, ignore_errors=True)


def gram_probe(spark, df, n: int) -> None:
    """r14 verdict #6: A/B the opt-in BLAS3 gram encode (exact=False)
    against the bit-parity fold at production dims, and COUNT row
    mismatches (the docstring's error envelope predicts zero outside
    measure-zero rounding-boundary straddles)."""
    from pyspark.sql import functions as F  # noqa: F811

    from sparkfusion.llm.pq import derive_ivfpq_params, ivfpq_encode_batch

    n_cells, m, n_codes = 64, 96, 32
    cents, cb = derive_ivfpq_params(df, n_cells=n_cells, m=m, dim=D, n_codes=n_codes)
    results = []
    frames = {}
    for label, exact in (("encode_exact_fold", True), ("encode_gram_blas3", False)):
        enc = ivfpq_encode_batch(df, cents, cb, exact=exact).localCheckpoint(
            eager=False
        )
        r = timed(f"{label}_cells{n_cells}_m{m}", enc.count)
        r["rows_per_s"] = round(n / r["wall"], 1)
        results.append(r)
        frames[exact] = enc
    a, b = frames[True], frames[False]
    cols = a.columns
    mismatches = (
        a.alias("x")
        .join(b.alias("y"), "vec_id")
        .filter(
            " OR ".join(f"x.{c} <> y.{c}" for c in cols if c != "vec_id")
        )
        .count()
    )
    results.append({"label": "gram_vs_exact_row_mismatches", "out": mismatches})
    print(f"  row mismatches gram vs exact: {mismatches} / {n}", flush=True)
    print(json.dumps(results))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    spark = get_session()
    df = make_frame(spark, n)
    print(f"== IVF-PQ d={D} probe, n={n} ==", flush=True)
    if "--store-query" in sys.argv:
        store_query_probe(spark, df, n)
        return
    if "--gram" in sys.argv:
        gram_probe(spark, df, n)
        return
    results = []

    from sparkfusion.llm.ivf import ivf_build
    from sparkfusion.llm.pq import (
        derive_ivfpq_params,
        ivfpq_adc_topk,
        ivfpq_encode_literal,
    )

    m, n_codes = 96, 32  # dsub=8 — the FAISS-typical 768/8 split
    for n_cells in (64, 256):
        params = timed(
            f"derive_params_cells{n_cells}",
            lambda n_cells=n_cells: len(
                derive_ivfpq_params(df, n_cells=n_cells, m=m, dim=D, n_codes=n_codes)[0]
            ),
        )
        results.append(params)
        cents, cb = derive_ivfpq_params(df, n_cells=n_cells, m=m, dim=D, n_codes=n_codes)
        r = timed(
            f"encode_literal_cells{n_cells}_m{m}",
            lambda cents=cents, cb=cb: ivfpq_encode_literal(df, cents, cb).count(),
        )
        r["rows_per_s"] = round(n / r["wall"], 1)
        results.append(r)

    q = df.filter(F.col("vec_id") == n - 1)
    results.append(
        timed(
            "adc_topk_cells64_nprobe8",
            lambda: ivfpq_adc_topk(
                df, q, n_cells=64, nprobe=8, m=m, dim=D, n_codes=n_codes, k=10
            ).count(),
        )
    )

    k_coarse = max(2, int(n ** 0.5))
    results.append(
        timed(
            f"ivf_build_mllib_k{k_coarse}",
            lambda: ivf_build(df, k=k_coarse)[0].count(),
        )
    )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
