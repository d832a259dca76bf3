#!/bin/bash
# Real-TPU suite with per-module accounting (VERDICT r4 #3).
#
# Modules run in a few GROUPED pytest processes (full per-module
# isolation throws away every in-process jit cache and made single
# modules blow a 25-minute timeout on the tunnel), with per-module
# pass/fail/skip counts parsed from the -v per-test lines — so a crash
# or timeout loses only its group's tail AND the artifact still shows
# exactly which modules ran.  Failure lines are appended verbatim.
#
# Usage: bash scripts/run_real_tpu_suite.sh [outfile]
set -u
cd "$(dirname "$0")/.."
OUT="${1:-docs/artifacts/real_tpu_suite_r5.txt}"
: > "$OUT"
echo "# Real-TPU suite, grouped runs (KIVI_TPU_REAL=1), $(date -u +%Y-%m-%dT%H:%MZ)" >> "$OUT"

# 4 groups, alphabetical; heavy serving modules spread across groups
G1="tests/test_api.py tests/test_batcher.py tests/test_beam_search.py"
G2="tests/test_cache_streaming.py tests/test_checkpoint.py tests/test_cli.py tests/test_elastic.py tests/test_elastic_kill.py tests/test_evalsuite.py tests/test_flash.py tests/test_flash_extend.py"
G3="tests/test_flush_schedule.py tests/test_fused_decode.py tests/test_guards.py tests/test_kernels.py tests/test_longbench_e2e.py tests/test_model_vs_hf.py tests/test_multihost.py tests/test_padding.py"
G4="tests/test_parallel.py tests/test_prefix_cache.py tests/test_prefix_manager.py tests/test_prefix_ragged.py tests/test_quant_core.py tests/test_ring.py tests/test_sampling.py tests/test_spec_batcher.py tests/test_speculative.py tests/test_streaming.py"

gi=0
for G in "$G1" "$G2" "$G3" "$G4"; do
  gi=$((gi + 1))
  start=$(date +%s)
  tmp=$(mktemp)
  KIVI_TPU_REAL=1 timeout 5400 python -m pytest $G -v -p no:cacheprovider \
    > "$tmp" 2>&1
  rc=$?
  dur=$(( $(date +%s) - start ))
  echo "## group $gi (rc=$rc, ${dur}s): $G" >> "$OUT"
  python3 - "$tmp" >> "$OUT" <<'PYEOF'
import collections, re, sys
counts = collections.defaultdict(lambda: collections.Counter())
fails = []
for line in open(sys.argv[1], errors="replace"):
    m = re.match(r"(tests/\S+?\.py)::(\S+).*\b(PASSED|FAILED|SKIPPED|ERROR)\b", line)
    if m:
        counts[m.group(1)][m.group(3)] += 1
        if m.group(3) in ("FAILED", "ERROR"):
            fails.append(line.strip()[:200])
for mod in sorted(counts):
    c = counts[mod]
    print(f"{mod:40s} {c['PASSED']:3d} passed {c['FAILED']:3d} failed "
          f"{c['SKIPPED']:3d} skipped {c['ERROR']:3d} error")
for f in fails:
    print("  FAIL:", f)
PYEOF
  rm -f "$tmp"
done
echo "----" >> "$OUT"
python3 - "$OUT" >> "$OUT" <<'PYEOF'
import re, sys
tp = tf = ts = te = 0
for line in open(sys.argv[1]):
    m = re.match(r"tests/\S+\.py\s+(\d+) passed\s+(\d+) failed\s+(\d+) skipped\s+(\d+) error", line)
    if m:
        tp += int(m.group(1)); tf += int(m.group(2))
        ts += int(m.group(3)); te += int(m.group(4))
print(f"TOTAL: {tp} passed, {tf} failed, {ts} skipped, {te} error")
PYEOF
tail -1 "$OUT"
