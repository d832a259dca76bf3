#!/bin/bash
# Per-module real-TPU suite with clean accounting (VERDICT r4 #3).
#
# Runs every tests/test_*.py module as its own pytest process under
# KIVI_TPU_REAL=1 and its own timeout, records each module's
# pass/fail/skip counts, and prints a grand total.  One module = one
# process also sidesteps the XLA-CPU LLVM-JIT exhaustion and lets a
# single hung module time out without losing the rest of the run.
#
# Usage: bash scripts/run_real_tpu_suite.sh [outfile]
set -u
cd "$(dirname "$0")/.."
OUT="${1:-docs/artifacts/real_tpu_suite_r5.txt}"
: > "$OUT"
echo "# Real-TPU suite, per-module (KIVI_TPU_REAL=1), $(date -u +%Y-%m-%dT%H:%MZ)" >> "$OUT"
total_pass=0; total_fail=0; total_skip=0; total_err=0
for f in tests/test_*.py; do
  mod=$(basename "$f")
  start=$(date +%s)
  tmp=$(mktemp)
  KIVI_TPU_REAL=1 timeout 1500 python -m pytest "$f" -q -p no:cacheprovider > "$tmp" 2>&1
  rc=$?
  line=$(grep -aE "[0-9]+ (passed|failed|skipped|error)" "$tmp" | tail -1)
  rm -f "$tmp"
  dur=$(( $(date +%s) - start ))
  p=$(echo "$line" | grep -oE "[0-9]+ passed" | grep -oE "[0-9]+" || echo 0)
  fl=$(echo "$line" | grep -oE "[0-9]+ failed" | grep -oE "[0-9]+" || echo 0)
  s=$(echo "$line" | grep -oE "[0-9]+ skipped" | grep -oE "[0-9]+" || echo 0)
  e=$(echo "$line" | grep -oE "[0-9]+ error" | grep -oE "[0-9]+" || echo 0)
  total_pass=$((total_pass + ${p:-0})); total_fail=$((total_fail + ${fl:-0}))
  total_skip=$((total_skip + ${s:-0})); total_err=$((total_err + ${e:-0}))
  printf "%-32s %3s passed %3s failed %3s skipped %3s error  rc=%s %4ss\n" \
    "$mod" "${p:-0}" "${fl:-0}" "${s:-0}" "${e:-0}" "$rc" "$dur" | tee -a "$OUT"
done
echo "----" | tee -a "$OUT"
printf "TOTAL: %s passed, %s failed, %s skipped, %s error\n" \
  "$total_pass" "$total_fail" "$total_skip" "$total_err" | tee -a "$OUT"
