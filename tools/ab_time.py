"""Targeted A/B timer for optimization rounds — times a SUBSET of suite
queries with exactly bench.py's methodology (warm-up + min-of-N over a noop
sink, one solo JVM, foreign-CPU accounting) so before/after numbers are
comparable to the round bench without paying the full 140-query run.

Usage:
    python tools/ab_time.py <query> [<query> ...] [--reps N] [--sf DIR]

Prints one line per query: name, min, all reps, foreign-CPU share of the
timed window. NOT an artifact generator — BENCH_local.json stays bench.py's.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _cpu_sample, _own_cpu, _run_once  # noqa: E402  (bench methodology)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    argv = sys.argv[1:]
    for i, a in enumerate(argv):
        if a == "--reps":
            reps = int(argv[i + 1])
            args.remove(argv[i + 1])
        if a == "--sf":
            sf_dir = argv[i + 1]
            args.remove(argv[i + 1])
    if not args:
        sys.exit("usage: ab_time.py <query> [...] [--reps N] [--sf DIR]")

    from sparkfusion.session import get_session
    from sparkfusion.suite import queries

    spark = get_session("sparkfusion-ab")
    qs = queries()
    unknown = [a for a in args if a not in qs]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    for name in args:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"ab:{name}")
        try:
            _run_once(fn, spark, sf_dir)  # warm-up
            t0, b0 = _cpu_sample()
            o0 = _own_cpu()
            times = [_run_once(fn, spark, sf_dir) for _ in range(reps)]
            t1, b1 = _cpu_sample()
            o1 = _own_cpu()
            span = t1 - t0
            foreign = min(max(0, b1 - b0), max(0, (b1 - b0) - (o1 - o0)))
            ffrac = round(foreign / span, 4) if span > 0 else -1.0
            print(
                f"{name}: min={min(times):.3f}s reps={[round(t, 3) for t in times]} "
                f"foreign_cpu={ffrac}",
                flush=True,
            )
        except Exception as ex:
            print(f"{name}: ERROR {ex}", flush=True)
        finally:
            spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
