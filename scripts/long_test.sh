#!/usr/bin/env bash
# LongBench predict+score driver — analogue of the reference's
# scripts/long_test.sh (/root/reference/scripts/long_test.sh): takes the
# quant config on the command line and runs the predict step for every
# task, then the scorer.
#
# Usage: scripts/long_test.sh K_BITS V_BITS GROUP_SIZE RESIDUAL MODEL_DIR DATA_DIR [OUT_DIR]
set -euo pipefail
K=${1:-2}; V=${2:-2}; GS=${3:-32}; RL=${4:-128}; MODEL=${5:?model dir}
DATA=${6:?LongBench data dir (jsonl files)}
OUT=${7:-pred/$(basename "$MODEL")_k${K}v${V}gs${GS}rl${RL}}

python -m kivi_tpu.evalsuite.run_longbench predict \
  --model-dir "$MODEL" --data-dir "$DATA" --out-dir "$OUT" \
  --k-bits "$K" --v-bits "$V" --group-size "$GS" --residual "$RL"
python -m kivi_tpu.evalsuite.run_longbench score --pred-dir "$OUT"
