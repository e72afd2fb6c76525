#!/bin/bash
# Variational CLIP training — the reference's notebook recipe (Notebooks/trainer.ipynb:cell 7:
# bs 128, lr 1e-3, wd 1e-8, 20 epochs, 2 warmup epochs = ~704 steps at 50k*0.9/128,
# KL_WEIGHT=100 ramped over 5 epochs,
# frozen backbone, PowerSpherical posterior) mapped onto the TPU CLI. COCO 50k subset by
# default, as in the notebook's DATA_DIR split.
python -m multimodal_tpu.train.run \
    --train-data "${COCO_ROOT:-/data/coco}" \
    --dataset-type coco \
    --model ViT-B-32 \
    --variational \
    --distribution-type power_spherical \
    --kl-weight 100 \
    --kl-warmup-epochs 5 \
    --freeze-backbone \
    --batch-size 128 \
    --lr 1e-3 \
    --wd 1e-8 \
    --epochs 20 \
    --warmup 704 \
    --precision amp_bf16 \
    --logs "${LOGS:-./logs}" \
    --report-to tensorboard \
    "$@"
