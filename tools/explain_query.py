"""Print any registered suite query's formatted physical plan (and
optionally its DuckDB oracle SQL) — the user-facing counterpart of
tools/dump_plans.py.

Usage:
    python tools/explain_query.py <query_name> [sf_dir] [--sql]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--sql"]
    show_sql = "--sql" in sys.argv
    if not args:
        from sparkfusion.suite import queries

        print("registered queries:")
        for name in sorted(queries()):
            print(" ", name)
        return
    name = args[0]
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.01"
    from sparkfusion.session import get_session
    from sparkfusion.suite import oracle_sql, queries

    qs = queries()
    if name not in qs:
        sys.exit(f"unknown query {name!r}; run with no args to list")
    spark = get_session("explain", cpus=8)
    from plan_util import plan_string

    df = qs[name](spark, sf_dir)
    print(plan_string(df))
    if show_sql:
        sql = oracle_sql().get(name)
        print("-- DuckDB oracle SQL --")
        print(sql if sql else "(rows-only query: no oracle)")


if __name__ == "__main__":
    main()
