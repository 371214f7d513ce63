#!/bin/bash
# Sharded test-suite runner (VERDICT r3 next #9).
#
# The XLA CPU compiler can segfault after ~180 compilations accumulate in
# one process (nondeterministic, late in the suite); tests/conftest.py
# bounds it by periodically clearing JAX caches. This script retires the
# risk structurally: the suite splits into N shards, each a FRESH pytest
# process, so no process ever approaches the window. Round-robin by file
# keeps shards balanced (slow files spread across shards).
#
# Usage:
#   scripts/run_tests.sh            # 4 sequential shards (CI default)
#   scripts/run_tests.sh 6          # 6 shards
#   scripts/run_tests.sh 4 -m slow  # extra args forwarded to pytest
set -u
cd "$(dirname "$0")/.."
N=${1:-4}
shift || true

FILES=(tests/test_*.py)
fail=0
for ((i = 0; i < N; i++)); do
  shard=()
  for ((j = i; j < ${#FILES[@]}; j += N)); do
    shard+=("${FILES[j]}")
  done
  [ ${#shard[@]} -eq 0 ] && continue
  echo "=== shard $((i + 1))/$N: ${shard[*]} ==="
  python -m pytest "${shard[@]}" -q "$@" || fail=1
done
exit $fail
