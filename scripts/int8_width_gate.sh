#!/bin/bash
# int8 quality gate AT THE WIDTHS THAT SHIP IT (round-5; RESULTS.md "Round-5 summary").
#
# The bench defaults `--precision int8` per model, so the precision mode must be
# convergence-gated at the widths where it actually executes — not only at the
# ViT-S/16-128 (width 384) scale the round-4 gate used:
#
#   (a) ViT-B/32 (width 768 / MLP 3072): 5 epochs of REAL-INPUT training on the shapes
#       webdataset (full pipeline: native tar/decode/BPE, --wire-size 128 device-side
#       upsample to 224 — the flagship real-input recipe), identical seeds, bf16 vs
#       int8. Compares val-loss trajectory and retrieval (mean rank / R@K).
#   (b) ViT-L/14 (width 1024) and ViT-H/14 (width 1280): 300-step REAL-INPUT loss-curve
#       A/Bs on the same wire-128 feed, identical seeds, loss logged every 10 steps for
#       trajectory overlay. Each model runs its shipping bench config (L/14 b96 f32
#       moments; H/14 b48 bf16 moments — the only single-chip fit, and int8 holds extra
#       temps that OOM f32-moment H/14 even earlier).
#
# NOTE: synthetic data CANNOT drive these A/Bs — random image/text pairs pin the
# contrastive loss to ln(batch) by step ~10, so every arm looks identical (measured;
# see RESULTS.md round 5). The gate therefore runs on the learnable shapes webdataset
# end to end.
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

COMMON=(--wire-size 128 --dataset-type webdataset --train-data "$TRAIN"
        --warmup 50 --lr 5e-4 --wd 0.05 --seed 0 --log-every-n-steps 10
        --workers 1 --report-to none --logs "$OUT")

B32=(--model ViT-B-32 --val-data "$VAL"
     --train-num-samples 16384 --val-num-samples 1024
     --epochs 5 --batch-size 256 --warmup 100 --lr 1e-3)

L14=(--model ViT-L-14 --train-num-samples 14400 --epochs 1 --batch-size 96)

H14=(--model ViT-H-14 --train-num-samples 14400 --epochs 1 --batch-size 48
     --opt-state-dtype bfloat16)

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

run b32-bf16 "${COMMON[@]}" "${B32[@]}" --precision amp_bf16
run b32-int8 "${COMMON[@]}" "${B32[@]}" --precision int8
run l14-bf16 "${COMMON[@]}" "${L14[@]}" --precision amp_bf16
run l14-int8 "${COMMON[@]}" "${L14[@]}" --precision int8
run h14-bf16 "${COMMON[@]}" "${H14[@]}" --precision amp_bf16
run h14-int8 "${COMMON[@]}" "${H14[@]}" --precision int8
echo INT8-GATE-DONE
