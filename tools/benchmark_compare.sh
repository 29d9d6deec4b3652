#!/usr/bin/env bash
# A/B benchmark of the current working tree vs another git ref.
# (reference analog: tools/benchmark_compare.sh — rebuild per branch, N runs,
# mean/median report)
#
# Usage: tools/benchmark_compare.sh [BASE_REF] [RUNS]
set -euo pipefail

BASE_REF="${1:-main}"
RUNS="${2:-3}"
REPO_ROOT="$(git rev-parse --show-toplevel)"
cd "$REPO_ROOT"

run_bench() {
    local label="$1" out sum=0 n=0
    for i in $(seq 1 "$RUNS"); do
        out=$(python -u bench.py 2>/dev/null | tail -1)
        val=$(python -c "import json,sys; print(json.loads(sys.argv[1])['value'])" "$out")
        echo "  $label run $i: $val streams ($out)"
        sum=$((sum + val)); n=$((n + 1))
    done
    echo "  $label mean: $((sum / n)) streams"
}

echo "== current working tree =="
run_bench current

WORKTREE=$(mktemp -d)
trap 'git worktree remove --force "$WORKTREE" 2>/dev/null || true' EXIT
git worktree add --detach "$WORKTREE" "$BASE_REF" >/dev/null
echo "== $BASE_REF =="
(cd "$WORKTREE" && run_bench "$BASE_REF")
