#!/bin/bash
# COCO retrieval eval (reference test_retrieval.sh): R@{1,5,10} text->image and image->text.
python -m multimodal_tpu.train.run \
    --epochs 0 \
    --model "${MODEL:-ViT-B-16}" \
    --pretrained "${CKPT:?set CKPT to a checkpoint path}" \
    --batch-size 256 \
    --coco-retrieval "${COCO_ROOT:?set COCO_ROOT to the COCO root directory}" \
    "$@"
