"""Registry latency-floor audit (r14 verdict #7): at 328 registered queries
with a ~0.4s median, the suite total is dominated by per-query FIXED costs,
and round-over-round deltas get misread against irreducible overhead. This
quantifies the floor on a warm session:

1. ``noop_range1`` / ``noop_read_schema`` — the pure harness floor: one
   trivial action, and one parquet-footer touch through ``table()``.
2. Five representative sub-second suite queries, min-of-5 warm, split into
   PLAN time (calling ``fn(spark, sf_dir)`` — python plan build, includes
   any eager derivation the entry does) and EXEC time (``collect()``).

Floor reading: exec time of a trivial action ≈ scheduler+exchange fixed
cost; plan time of a suite entry ≈ python/Catalyst assembly. A query whose
wall sits within ~2× the floor has no optimizable engine work left — its
round-over-round movement is noise, not regression (bench methodology note
in BASELINE.md).

Usage: python tools/probe_latency_floor.py   (solo rule applies)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.1"
QUERIES = [
    "s8_literal_dataframe",   # no table read at all
    "p6_filter_sql_string",   # one scan + filter
    "a3_count_star",          # one scan + count
    "u1_union_all",           # two scans + union
    "f7_split_builtin",       # scan + string funcs
]


def main() -> None:
    from sparkfusion.session import get_session, table

    spark = get_session("latency-floor")
    import __spark_entry__ as e

    qs = e.queries()
    results = []

    def minwall(fn, reps=5):
        walls = []
        for _ in range(reps):
            t0 = time.monotonic()
            fn()
            walls.append(time.monotonic() - t0)
        return round(min(walls), 4), [round(w, 4) for w in walls]

    # warm up the session (JIT, codegen caches)
    spark.range(1000).count()
    table(spark, SF, "region").count()

    w, reps = minwall(lambda: spark.range(1).toPandas())
    results.append({"label": "noop_range1_toPandas", "min": w, "reps": reps})
    w, reps = minwall(lambda: table(spark, SF, "region").limit(1).toPandas())
    results.append({"label": "noop_table_limit1", "min": w, "reps": reps})

    for name in QUERIES:
        if name not in qs:
            print(f"skip {name}: not registered", flush=True)
            continue
        fn = qs[name]
        plan_w, plan_reps = minwall(lambda: fn(spark, SF))
        df = fn(spark, SF)
        exec_w, exec_reps = minwall(lambda: df.collect())
        total_w, _ = minwall(lambda: fn(spark, SF).collect())
        results.append(
            {
                "label": name,
                "plan_min": plan_w,
                "exec_min": exec_w,
                "total_min": total_w,
                "plan_reps": plan_reps,
                "exec_reps": exec_reps,
            }
        )
        print(
            f"  {name}: plan {plan_w}s exec {exec_w}s total {total_w}s",
            flush=True,
        )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
