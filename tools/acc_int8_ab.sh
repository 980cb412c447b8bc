#!/bin/bash
# int8 accuracy A/B on the strongest synthetic checkpoint (VERDICT r4
# item 5): score fp32/bf16/int8-absmax/int8-percentile through the
# unchanged eval chain, full-res and quarter-res, on the recipe stage-B
# checkpoint. Run on the real TPU (eval graphs are cached by the recipe
# training's own evals).
#
# Usage: CKPT=/tmp/recipe_gate_resnet34/stage_b/synthetic/checkpoints_*/ckpt_epoch_*.msgpack \
#        bash tools/acc_int8_ab.sh 2>&1 | tee /tmp/acc_int8_r5.log
set -u
cd "$(dirname "$0")/.."
CKPT=${CKPT:?set CKPT to the stage-B checkpoint}
BASE="--dataset synthetic --synthetic_n 64 --synthetic_mixed_frac 0.5
      --height 480 --width 640 --batch_size 8 --encoder resnet34
      --dynamic --global-gate --hard --num_runs 1 --ckpt_path $CKPT"

run() { echo "=== $* ==="; timeout 3600 python eval.py $BASE "$@"; }

run                                                     # fp32 full
run --output_res quarter                                # fp32 q4
run --dtype bfloat16 --output_res quarter               # bf16 q4
run --quant int8 --calib_batches 8                      # int8 absmax full
run --quant int8 --calib_batches 8 --output_res quarter # int8 absmax q4
run --quant int8 --calib_batches 8 --calib_estimator percentile \
    --calib_percentile 99.9                             # int8 p99.9 full
run --quant int8 --calib_batches 8 --calib_estimator percentile \
    --calib_percentile 99.9 --output_res quarter        # int8 p99.9 q4
