"""Snapshot formatted physical plans for the optimization round's evidence
trail: writes ``plans/<round>/<query>_<tag>.txt`` with the
``explain("formatted")`` output of each named suite query.

Usage:
    python tools/capture_plans.py <round> <tag> <query> [<query> ...]
    python tools/capture_plans.py r13 before q1_pricing_summary km1_kmeans_quantized
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    if len(sys.argv) < 4:
        sys.exit("usage: capture_plans.py <round> <tag> <query> [...]")
    rnd, tag, *names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from sparkfusion.session import get_session
    from sparkfusion.suite import queries

    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "plans", rnd)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_session("sparkfusion-plans")
    qs = queries()
    for name in names:
        if name not in qs:
            print(f"SKIP unknown query {name}")
            continue
        df = qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(f"-- {name} ({tag}) at {sf_dir}\n")
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
