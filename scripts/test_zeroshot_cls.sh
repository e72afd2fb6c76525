#!/bin/bash
# Zero-shot classification eval over the standard datasets (reference test_zeroshot_cls.sh).
# Point the env vars at folder-per-class layouts.
python -m multimodal_tpu.train.run \
    --epochs 0 \
    --model "${MODEL:-ViT-B-16}" \
    --pretrained "${CKPT:?set CKPT to a checkpoint path}" \
    --batch-size 1024 \
    ${IMAGENET_VAL:+--imagenet-val "$IMAGENET_VAL"} \
    ${CIFAR10:+--cifar10 "$CIFAR10"} \
    ${CIFAR100:+--cifar100 "$CIFAR100"} \
    ${FLOWERS:+--flowers "$FLOWERS"} \
    ${FOOD:+--food "$FOOD"} \
    ${STANFORD_CARS:+--stanford-cars "$STANFORD_CARS"} \
    "$@"
