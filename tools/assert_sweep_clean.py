"""Round-end artifact gate: a sweep artifact is CLEAN only if every query
passed AND no derived oracle silently degraded to rows-only (r14 verdict
item 4 — a degrade means an entry that was hash-checked last round is only
rows-checked in this artifact, which must fail the round-end gate, not hide
in stderr).

Usage: python tools/assert_sweep_clean.py LOCAL_X.json [LOCAL_Y.json ...]
Exit 0 iff all artifacts are clean; prints a per-artifact verdict line.
"""

from __future__ import annotations

import json
import sys


def check(path: str) -> bool:
    with open(path) as f:
        art = json.load(f)
    failed = art.get("failed", None)
    degraded = art.get("degraded", None)
    problems = []
    if failed is None:
        problems.append("no 'failed' field (not a check_oracle artifact?)")
    elif failed:
        bad = [n for n, r in art.get("queries", {}).items()
               if r.get("status") not in ("pass", "rows_only")]
        problems.append(f"{failed} failed: {bad[:10]}")
    if degraded is None:
        problems.append("no 'degraded' field (artifact predates r15 harness)")
    elif degraded:
        problems.append(
            "degraded oracles: "
            + ", ".join(f"{d['name']} ({d['kind']})" for d in degraded)
        )
    if problems:
        print(f"DIRTY {path}: " + "; ".join(problems))
        return False
    print(f"clean {path}: {art.get('passed')} passed, 0 failed, 0 degraded")
    return True


if __name__ == "__main__":
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    sys.exit(0 if all([check(p) for p in sys.argv[1:]]) else 1)
