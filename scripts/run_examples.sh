#!/usr/bin/env bash
# Run the whole example gallery in one pass — repo analog of the reference's
# scripts/run_examples.sh (which `cargo run --example <name> -- all`s every
# example group). Each example is a standalone script taking [sf_dir]; they
# run sequentially (one Spark JVM at a time) and the runner fails on the
# first non-zero exit.
#
# Usage: scripts/run_examples.sh [sf_dir]   (default /root/testdata/sf0.001)
set -euo pipefail

cd "$(dirname "$0")/.."
SF_DIR="${1:-/root/testdata/sf0.001}"
SKIP_LIST=()

skip_example() {
    local name="$1"
    for skip in "${SKIP_LIST[@]}"; do
        [ "$name" = "$skip" ] && return 0
    done
    return 1
}

for f in examples/*.py; do
    example_name=$(basename "$f" .py)
    if skip_example "$example_name"; then
        echo "Skipping $example_name"
        continue
    fi
    echo "== Running example: $example_name ($SF_DIR) =="
    python "$f" "$SF_DIR"
done
echo "All examples completed."
