"""Production-dimension probe (r13 verdict #2): every embedding-path scale
claim before r14 rested on d=64 vectors; a real training pipeline carries
d=768+ where (a) the int64 quantization envelope has 12x less headroom and
(b) the per-pair / per-assign constants scale linearly with d. This probe
re-runs the semdedup (flat + two_level), cosine_pairs, and assign_quantized
measurements on synthetic d=768 frames and records the table in BASELINE.md.

Usage: python tools/probe_d768.py [n ...]   (default 100000 200000)

Solo rule: never run while another Spark JVM is up (bench/sweeps).
Frame: expression-built sin embeddings (same family as the r12/r13 d=64
probes, seeded by row id; |x| <= 1 so the envelope bound is the unit-norm
one), localCheckpointed before timing so generation cost is excluded.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from sparkfusion.operators.kmeans import (  # noqa: E402
    check_quantization_envelope,
    lloyd_centroids,
    quantize_points,
)
from sparkfusion.session import get_session  # noqa: E402

D = 768
SCALE = 6


def make_frame(spark, n: int, d: int = D):
    # GLSL-style hash (frac(sin(x)*43758.5453)): at d=768 the d=64 probes'
    # plain-sin family is pathologically self-similar (neighboring ids are
    # near-parallel -> pair output quadratic in n, which would time OUTPUT
    # size, not engine work); hashed components are ~uniform in [-1, 1], so
    # random 768-dim vectors are near-orthogonal and pair counts stay small
    def comp(j):
        x = F.sin(F.col("id").cast("double") * 12.9898 + j.cast("double") * 78.233) * 43758.5453
        return (x - F.floor(x)) * 2.0 - 1.0

    df = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(F.sequence(F.lit(0), F.lit(d - 1)), comp).alias("embedding"),
    ).localCheckpoint(eager=False)
    df.count()  # materialize before timing
    return df


def timed(label: str, fn, reps: int = 3) -> dict:
    walls = []
    for _ in range(reps):
        t0 = time.monotonic()
        out = fn()
        walls.append(round(time.monotonic() - t0, 2))
    print(f"  {label}: {min(walls)}s (reps {walls}) out={out}", flush=True)
    return {"label": label, "best": min(walls), "reps": walls, "out": out}


class RssSampler:
    """Peak resident memory of the WHOLE process tree (python driver + JVM +
    pyspark daemons), sampled from /proc every 0.5s — the honest local-mode
    stand-in for 'peak task memory' in the r14 verdict #2 probe (local[32]
    shares one JVM heap; per-task peaks aren't separable, tree RSS is the
    number that decides whether the box survives)."""

    def __init__(self):
        import threading

        self.peak_gb = 0.0
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)

    def _tree_rss_gb(self) -> float:
        import os

        me = os.getpid()
        ppid = {}
        rss = {}
        for pid in os.listdir("/proc"):
            if not pid.isdigit():
                continue
            try:
                with open(f"/proc/{pid}/stat") as f:
                    parts = f.read().rsplit(")", 1)[1].split()
                ppid[int(pid)] = int(parts[1])
                rss[int(pid)] = int(parts[21]) * 4096  # pages -> bytes
            except (OSError, IndexError, ValueError):
                continue
        total = 0
        for pid in rss:
            p = pid
            for _ in range(40):
                if p == me:
                    total += rss[pid]
                    break
                p = ppid.get(p, 0)
                if p <= 1:
                    break
        return total / 1e9

    def _run(self):
        while not self._stop.wait(0.5):
            self.peak_gb = max(self.peak_gb, self._tree_rss_gb())

    def __enter__(self):
        self._thread.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        self._thread.join(timeout=2)


def big_probe(ns: list[int]) -> None:
    """r14 verdict #2: the embedding family's own 4th scaling point — the
    lexical pipelines have 5M docs, the embedding paths stopped at 200k.
    Runs semdedup (two-level — at these n the auto default escalates past
    the flat k=4096 cap anyway), cosine_pairs auto-bits, and the banded
    recall path at n up to 1M+, d=768, with tree-RSS peaks per step."""
    check_quantization_envelope(D, SCALE, 1.0)
    spark = get_session()
    results = []
    from sparkfusion.llm.similarity import cosine_pairs, semdedup

    for n in ns:
        print(f"== BIG n={n} d={D} ==", flush=True)
        df = make_frame(spark, n)
        print(f"  frame ~{n * D * 8 / 1e9:.1f} GB as float64", flush=True)
        steps = [
            (
                f"semdedup_two_level_n{n}",
                lambda: semdedup(
                    df, "vec_id", "embedding", iterations=2,
                    threshold=0.8, scale=SCALE, two_level=True,
                ).filter("NOT keep").count(),
            ),
            (
                f"cosine_pairs_auto_n{n}",
                lambda: cosine_pairs(
                    df, "vec_id", "embedding", threshold=0.95
                ).count(),
            ),
            (
                f"cosine_pairs_banded2_n{n}",
                lambda: cosine_pairs(
                    df, "vec_id", "embedding", threshold=0.95, bands=2
                ).count(),
            ),
        ]
        for label, fn in steps:
            with RssSampler() as s:
                r = timed(label, fn, reps=1)
            r["peak_tree_rss_gb"] = round(s.peak_gb, 1)
            print(f"    peak tree RSS: {r['peak_tree_rss_gb']} GB", flush=True)
            results.append(r)
        spark.catalog.clearCache()
    print(json.dumps(results))


def main() -> None:
    if "--big" in sys.argv:
        sys.argv.remove("--big")
        big_probe([int(a) for a in sys.argv[1:]] or [500_000, 1_000_000])
        return
    ns = [int(a) for a in sys.argv[1:]] or [100_000, 200_000]
    # the static envelope holds at unit-norm d=768 scale=6 (and would raise
    # here if a future edit broke it)
    check_quantization_envelope(D, SCALE, 1.0)
    spark = get_session()
    results = []
    for n in ns:
        print(f"== n={n} d={D} ==", flush=True)
        df = make_frame(spark, n)
        emb_bytes = n * D * 8 / 1e9
        print(f"  frame ~{emb_bytes:.1f} GB as float64", flush=True)

        from sparkfusion.llm.similarity import cosine_pairs, semdedup

        # 1. one quantize+assign pass at the auto-derived k (the kernel the
        # envelope guard sits in; also exercises the 768-wide Lloyd's agg)
        k = max(2, -(-n // 256))
        pts = quantize_points(df, "vec_id", "embedding", SCALE)
        pts.count()
        results.append(
            timed(
                f"lloyd_1iter_k{k}_n{n}",
                lambda: len(lloyd_centroids(pts, k, 1, force_numpy=True)),
                reps=1 if n > 150_000 else 2,
            )
        )

        # 2. semdedup end-to-end: flat auto-k vs two_level (auto only
        # escalates past k=4096, so force two_level for the comparison)
        for label, kw in (
            ("semdedup_flat", {}),
            ("semdedup_two_level", {"two_level": True}),
        ):
            results.append(
                timed(
                    f"{label}_n{n}",
                    lambda kw=kw: semdedup(
                        df, "vec_id", "embedding", iterations=2,
                        threshold=0.8, scale=SCALE, **kw,
                    ).filter("NOT keep").count(),
                    reps=1,
                )
            )

        # 3. cosine_pairs auto-bits (LSH bucket join + vectorized verify)
        results.append(
            timed(
                f"cosine_pairs_auto_n{n}",
                lambda: cosine_pairs(
                    df, "vec_id", "embedding", threshold=0.95
                ).count(),
                reps=1,
            )
        )
        spark.catalog.clearCache()
    print(json.dumps(results))


if __name__ == "__main__":
    main()
