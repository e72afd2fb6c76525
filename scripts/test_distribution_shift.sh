#!/bin/bash
# Distribution-shift zero-shot sweep (reference test_distribution_shit.sh):
# ImageNet-{Sketch,A,O,R,V2} folder-per-class sets.
python -m multimodal_tpu.train.run \
    --epochs 0 \
    --model "${MODEL:-ViT-B-16}" \
    --pretrained "${CKPT:?set CKPT to a checkpoint path}" \
    --batch-size 1024 \
    ${IMAGENET_S:+--imagenet-s "$IMAGENET_S"} \
    ${IMAGENET_A:+--imagenet-a "$IMAGENET_A"} \
    ${IMAGENET_O:+--imagenet-o "$IMAGENET_O"} \
    ${IMAGENET_R:+--imagenet-r "$IMAGENET_R"} \
    ${IMAGENET_V2:+--imagenet-v2 "$IMAGENET_V2"} \
    "$@"
