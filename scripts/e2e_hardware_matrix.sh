#!/bin/bash
# Hardware E2E matrix: every loss family + the round-2 training features, run on the real
# chip against the compositional shapes webdataset (scripts/make_shapes_dataset.py).
# Refreshes RESULTS.md "All four loss families train on hardware" at current-code state:
#   clip / align / cloob / vclip mean-only (the original four)
#   vclip MC-sampled with the Riemannian mean-grad + staged-KL path (train/engine.py)
#   siglip, --model-ema, --opt lamb, ring+shard_map contrastive
# Usage: scripts/e2e_hardware_matrix.sh [DATA_DIR] [OUT_DIR] [EPOCHS]
#   ROWS="siglip ema lamb ring" scripts/e2e_hardware_matrix.sh   # subset of rows
set -u
DATA=${1:-/tmp/shapes}
OUT=${2:-/tmp/e2e_matrix}
EPOCHS=${3:-3}
ROWS=${ROWS:-}
cd "$(dirname "$0")/.."

if [ ! -f "$DATA/classes.json" ]; then
  python scripts/make_shapes_dataset.py --out "$DATA" --train 16384 --val 1024
fi
N_TRAIN_SHARDS=$(ls "$DATA"/train-*.tar | wc -l)
LAST=$(printf '%06d' $((N_TRAIN_SHARDS - 1)))
TRAIN="$DATA/train-{000000..$LAST}.tar"
VAL="$DATA/val-{000000..000000}.tar"
mkdir -p "$OUT"

COMMON=(--model ViT-S-16-128 --dataset-type webdataset
        --train-data "$TRAIN" --val-data "$VAL"
        --train-num-samples 16384 --val-num-samples 1024
        --epochs "$EPOCHS" --batch-size 128 --warmup 100 --lr 1e-3 --wd 0.05
        --workers 1 --report-to none --logs "$OUT")

run() {
  name=$1; shift
  if [ -n "$ROWS" ] && ! echo " $ROWS " | grep -q " $name "; then return; fi
  echo "=== $name: $*"
  timeout 2700 python -m multimodal_tpu.train.run "${COMMON[@]}" --name "$name" "$@" \
      > "$OUT/$name.log" 2>&1
  rc=$?
  tail -n 3 "$OUT/$name.log" | sed "s/^/[$name] /"
  grep -oE '"loss": [0-9.]+' "$OUT/$name.log" | tail -1 | sed "s/^/[$name] final /"
  [ $rc -ne 0 ] && echo "[$name] FAILED rc=$rc"
}

run clip           --loss clip
run align          --loss align --clip-inModality-loss
run cloob          --loss cloob
run vclip-mean     --loss vclip --variational --use-mean-only
# kl-warmup-epochs 2 => epoch 0 is MEAN-ONLY (the zero-KL phase is warmup_epochs-1
# epochs), then the KL ramp + riemannian hook; warmup 1 would sample from step 0 —
# the documented round-1 collapse mode (run.py:kl_schedule)
run vclip-mc       --loss vclip --variational --mc-samples 8 --kl-warmup-epochs 2 \
                   --epochs 4
run siglip         --loss siglip
run ema            --loss clip --model-ema
run lamb           --loss clip --opt lamb --lr 2e-3
run ring           --loss clip --contrastive-impl ring --use-shard-map on
echo MATRIX-DONE
