#!/bin/bash
# SharedCLIP pre-training on CC12M — the reference recipe (AlignCLIP/train_sharedCLIP.sh:4-17)
# mapped onto the TPU CLI. bf16 replaces AMP; batch size is per host.
python -m multimodal_tpu.train.run \
    --train-data "${CC12M_SHARDS:-/data/cc12m/cc12m-train-{0000..1242}.tar}" \
    --train-num-samples 10030127 \
    --dataset-type webdataset \
    --model ViT-B-16 \
    --batch-size 512 \
    --lr 1e-3 \
    --wd 0.1 \
    --epochs 30 \
    --warmup 10000 \
    --precision amp_bf16 \
    --local-loss --gather-with-grad \
    --logs "${LOGS:-./logs}" \
    --report-to tensorboard \
    "$@"
