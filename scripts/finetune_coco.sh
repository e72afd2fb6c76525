#!/bin/bash
# Baseline fine-tune of a pretrained CLIP on COCO captions — the reference's notebook recipe
# (Notebooks/finetune.ipynb:cell 5: bs 32, lr 1e-6, wd 1e-2, 15 epochs, 5 warmup epochs
# = ~1265 steps at 9k*0.9/32, grad clipping on). Select the loss family with --loss {clip,cloob,align} (the notebook's
# MODEL dispatch); point --pretrained at an OpenAI-format checkpoint for the warm start.
python -m multimodal_tpu.train.run \
    --train-data "${COCO_ROOT:-/data/coco}" \
    --dataset-type coco \
    --model ViT-B-32 \
    --pretrained "${PRETRAINED:?set PRETRAINED to an OpenAI-format CLIP checkpoint}" \
    --loss "${LOSS:-clip}" \
    --batch-size 32 \
    --lr 1e-6 \
    --wd 1e-2 \
    --epochs 15 \
    --warmup 1265 \
    --grad-clip-norm 1.0 \
    --precision amp_bf16 \
    --logs "${LOGS:-./logs}" \
    --report-to tensorboard \
    "$@"
