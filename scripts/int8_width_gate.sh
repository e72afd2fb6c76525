#!/bin/bash
# int8 quality gate AT THE WIDTHS THAT SHIP IT (round-5 verdict task 1).
#
# The flagship bench defaults `--precision int8` for ViT-B/32, L/14 and H/14, but the
# round-4 convergence gate ran only at ViT-S/16-128 (width 384). This harness gates the
# precision mode at the widths where it actually executes:
#
#   (a) ViT-B/32 (width 768 / MLP 3072): 5 epochs of REAL-INPUT training on the shapes
#       webdataset (full pipeline: native tar/decode/BPE, --wire-size 128 device-side
#       upsample to 224 — the flagship real-input recipe), identical seeds, bf16 vs int8.
#       Compares train-loss trajectory, val loss, and retrieval (mean rank / R@K).
#   (b) ViT-H/14 (width 1280 / MLP 5120): 300-step synthetic loss-curve A/B, identical
#       seeds, loss logged every 10 steps for trajectory overlay. (H/14 real-input at
#       this scale would be feed-bound; the GEMM-quantization question is width-, not
#       data-, dependent, and the synthetic stream is deterministic per seed.)
#
# Usage: scripts/int8_width_gate.sh [DATA_DIR] [OUT_DIR]
set -u
DATA=${1:-/tmp/shapes}
OUT=${2:-/tmp/int8_gate}
cd "$(dirname "$0")/.."

if [ ! -f "$DATA/classes.json" ]; then
  python scripts/make_shapes_dataset.py --out "$DATA" --train 16384 --val 1024
fi
N_TRAIN_SHARDS=$(ls "$DATA"/train-*.tar | wc -l)
LAST=$(printf '%06d' $((N_TRAIN_SHARDS - 1)))
TRAIN="$DATA/train-{000000..$LAST}.tar"
VAL="$DATA/val-{000000..000000}.tar"
mkdir -p "$OUT"

B32=(--model ViT-B-32 --wire-size 128 --dataset-type webdataset
     --train-data "$TRAIN" --val-data "$VAL"
     --train-num-samples 16384 --val-num-samples 1024
     --epochs 5 --batch-size 256 --warmup 100 --lr 1e-3 --wd 0.05 --seed 0
     --workers 1 --report-to none --logs "$OUT")

H14=(--model ViT-H-14 --dataset-type synthetic
     --train-num-samples 14400 --epochs 1 --batch-size 48
     --warmup 50 --lr 5e-4 --wd 0.05 --seed 0 --log-every-n-steps 10
     --workers 1 --report-to none --logs "$OUT")

run() {
  name=$1; shift
  echo "=== $name: $*"
  timeout 3600 python -m multimodal_tpu.train.run --name "$name" "$@" \
      > "$OUT/$name.log" 2>&1
  rc=$?
  grep -oE '"loss": [0-9.]+' "$OUT/$name.log" | tail -1 | sed "s/^/[$name] final /"
  grep -oE '"val_loss": [0-9.]+' "$OUT/$name.log" | tail -1 | sed "s/^/[$name] /"
  [ $rc -ne 0 ] && echo "[$name] FAILED rc=$rc"
}

run b32-bf16 "${B32[@]}" --precision amp_bf16
run b32-int8 "${B32[@]}" --precision int8
run h14-bf16 "${H14[@]}" --precision amp_bf16
run h14-int8 "${H14[@]}" --precision int8
echo INT8-GATE-DONE
