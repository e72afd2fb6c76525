#!/bin/bash
# AlignCLIP pre-training — reference train_alignCLIP.sh:4-19: SharedCLIP recipe plus the
# in-modality separation loss with NL semantic supervision (alpha=1, beta=0.5).
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
    --clip-inModality-loss --alpha 1 --beta 0.5 \
    --nl_semantic_supervision --separate_text --separate_image \
    --semantic-model-path "${SBERT_PATH:-}" \
    --logs "${LOGS:-./logs}" \
    --report-to tensorboard \
    "$@"
