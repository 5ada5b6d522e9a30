"""4th scaling point for the flagship document pipelines (r13 verdict #3):
50k (sf1) -> 500k (r13 probe) -> **5M docs**, one more 10x step. Every round
that added a scaling point caught a new hazard class; compositions at 5M are
where shuffle spill, AQE partition counts, and driver result sizes would
surface.

Usage: python tools/probe_5m.py [build|run|all]   (default all)

Frame construction mirrors tools/scale_testdata.py's documents handling one
level up: 100 key-shifted copies of .localdata/sf1 documents (stride 10^12,
clear of sf1's copy*10^10 shifts), each word prefixed ``e{i}`` so cross-copy
shingle overlap is destroyed relative to BOTH the sf1 copies (``c{i}``) and
the r13 500k probe (``d{i}``) — K identical text copies would plant K^2/2
exact-dup pairs per doc and the probe would measure the flood, not the
algorithm. Within-copy near-dup structure is preserved verbatim, so output
cardinality must track the corpus ~exactly (x100 +- the boundary effects
already measured at 500k).

Solo rule: never run while another Spark JVM is up.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from sparkfusion.session import get_session, table  # noqa: E402

SRC = "/root/repo/.localdata/sf1"
DST = "/root/repo/.localdata/probe5m"
COPIES = 100
STRIDE = 1_000_000_000_000  # sf1 keys go up to ~9e10 + source keys


def build(spark) -> None:
    os.makedirs(DST, exist_ok=True)
    base = table(spark, SRC, "documents")
    parts = []
    for i in range(COPIES):
        c = base.withColumn("doc_id", F.col("doc_id") + F.lit(i * STRIDE))
        if i > 0:
            c = c.withColumn(
                "text", F.regexp_replace(F.col("text"), r"(\S+)", f"e{i}$1")
            )
        parts.append(c)
    union = parts[0]
    for c in parts[1:]:
        union = union.unionByName(c)
    path = os.path.join(DST, "documents.parquet")
    union.repartition(64).write.mode("overwrite").parquet(path)
    n = spark.read.parquet(path).count()
    print(f"built {path}: {n} rows", flush=True)


def run(spark) -> None:
    from sparkfusion.llm.dedup import connected_components, minhash_dedup_pairs
    from sparkfusion.suite.llm_suite import (
        pipeline2_training_shards,
        pipeline_corpus_clean,
    )

    results = []

    def timed(label, fn, reps=2):
        walls, out = [], None
        for _ in range(reps):
            spark.catalog.clearCache()  # pipelines cache the doc scan
            t0 = time.monotonic()
            out = fn()
            walls.append(round(time.monotonic() - t0, 1))
        print(f"{label}: best {min(walls)}s reps={walls} out={out}", flush=True)
        results.append({"label": label, "best": min(walls), "reps": walls, "out": out})

    timed("pipeline_corpus_clean_5m",
          lambda: pipeline_corpus_clean(spark, DST).count())
    timed("pipeline2_training_shards_5m",
          lambda: pipeline2_training_shards(spark, DST).count())

    def minhash_cc():
        # xxhash64 = the production base hash (same shape as the r13 500k
        # flagship probe); md5 is the oracle path
        docs = table(spark, DST, "documents").select("doc_id", "text")
        pairs = minhash_dedup_pairs(
            docs, "doc_id", "text", k=16, bands=4, n=3, threshold=0.5,
            hash_fn="xxhash64",
        ).select("id_a", "id_b").localCheckpoint(eager=False)
        n_pairs = pairs.count()
        comps = connected_components(pairs)
        n_clusters = comps.select("component").distinct().count()
        return (n_pairs, n_clusters)

    timed("minhash_pairs_cc_5m", minhash_cc, reps=2)
    print(json.dumps(results))


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = get_session("probe5m")
    if mode in ("build", "all"):
        build(spark)
    if mode in ("run", "all"):
        run(spark)
