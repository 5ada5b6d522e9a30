"""Scale-up testdata generator: build an sfN directory as K key-shifted
copies of an existing sf directory (default: sf0.1 x 10 -> sf1).

Usage:
    python tools/scale_testdata.py [SRC_DIR DST_DIR COPIES]
    # default: /root/testdata/sf0.1 .localdata/sf1 10

Construction (documented so scaling results are interpretable):
- ``region``/``nation`` are fixed-size dimensions (as in TPC-H) — copied
  unchanged, so broadcast-dim plans stay broadcast at every SF.
- Every other table is unioned K times with all entity keys shifted by
  ``copy * STRIDE`` (referential integrity preserved: lineitem's
  orderkey/partkey/suppkey shift with their parents; nationkeys don't shift).
  Value columns are byte-identical per copy, so predicate selectivities —
  and therefore per-query work per row — match the source SF exactly.
- ``documents.text`` gets a per-copy word prefix (``c3the c3quick ...`` for
  copy 3): within-copy near-dup structure is preserved verbatim while
  cross-copy shingle overlap is destroyed — without this, K identical text
  copies would plant K^2/2 exact-dup pairs per document and the dedup
  benchmarks would measure the flood, not the algorithm.
- ``embeddings.embedding`` is rotated by ``copy`` positions: norms and all
  within-copy angles are exactly preserved; cross-copy cosines decorrelate
  (rotation autocorrelation of i.i.d.-ish vectors is ~0), for the same
  reason as above.
- ``events.ts``'s parquet physical type follows whatever the driver last
  generated (TIMESTAMP(NANOS) in some rounds, timestamp[us] in others — the
  r4 post-mortem); the copy is written back with the arrived type and the
  suite's ``events_with_ts`` branches on the arrived dtype either way.

Output is written under the repo (.localdata/ is gitignored); the driver's
/root/testdata is never touched.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from sparkfusion.session import get_session, table  # noqa: E402

#: key shift per copy — far above any source key, far below 2^63/K
STRIDE = 10_000_000_000

#: table -> key columns shifted by copy*STRIDE
SHIFT_KEYS = {
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
    "events": ("event_id", "user_id"),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}

DIMS = ("region", "nation")


def _copy_of(df: DataFrame, name: str, i: int) -> DataFrame:
    out = df
    for key in SHIFT_KEYS[name]:
        out = out.withColumn(key, F.col(key) + F.lit(i * STRIDE))
    if name == "documents" and i > 0:
        out = out.withColumn(
            "text", F.regexp_replace(F.col("text"), r"(\S+)", f"c{i}$1")
        )
    if name == "embeddings" and i > 0:
        # rotate left by copy index, wrapped to the vector dimension: a raw
        # rot >= dim would yield a negative slice length (error) or, at
        # rot == dim, an identity rotation that re-plants cross-copy exact
        # duplicates. NB when copies > dim the wrap reaches rot == 0 and the
        # decorrelation guarantee lapses for those copies — guarded in
        # scale() which asserts copies < dim.
        n = F.size(F.col("embedding"))
        rot = F.lit(i) % n
        out = out.withColumn(
            "embedding",
            F.when(rot == 0, F.col("embedding")).otherwise(
                F.concat(
                    F.slice(F.col("embedding"), rot + 1, n - rot),
                    F.slice(F.col("embedding"), 1, rot),
                )
            ),
        )
    return out


def scale(src: str, dst: str, copies: int) -> None:
    spark = get_session("scale-testdata")
    os.makedirs(dst, exist_ok=True)
    for name in DIMS:
        table(spark, src, name).write.mode("overwrite").parquet(
            os.path.join(dst, f"{name}.parquet")
        )
        print(f"{name}: copied")
    for name in SHIFT_KEYS:
        base = table(spark, src, name)
        if name == "embeddings":
            dim = len(base.select("embedding").first()[0])
            assert copies < dim, (
                f"copies={copies} >= embedding dim {dim}: rotation would wrap "
                "to identity and re-plant cross-copy exact-dup pairs"
            )
        union = _copy_of(base, name, 0)
        for i in range(1, copies):
            union = union.unionByName(_copy_of(base, name, i))
        path = os.path.join(dst, f"{name}.parquet")
        union.write.mode("overwrite").parquet(path)
        print(f"{name}: x{copies} -> {spark.read.parquet(path).count()} rows")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".localdata", "sf1"
    )
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    scale(src, dst, copies)
