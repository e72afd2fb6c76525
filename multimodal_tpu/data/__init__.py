from multimodal_tpu.data.tokenizer import (
    HFTokenizer,
    SimpleTokenizer,
    default_tokenizer,
    tokenize,
)
from multimodal_tpu.data.preprocess import (
    OPENAI_DATASET_MEAN,
    OPENAI_DATASET_STD,
    eval_transform,
    normalize_images,
    resize_max_size,
    train_transform,
)
from multimodal_tpu.data.synthetic import SyntheticBatches, SyntheticDataset
from multimodal_tpu.data.shards import ShardSampler, braceexpand, expand_shards
from multimodal_tpu.data.wds import WdsReader, decode_images, iter_tar_samples
from multimodal_tpu.data.datasets import (
    FileListDataset,
    build_dataset,
    coco_captions,
    cood_items,
    csv_items,
    laion_items,
)
from multimodal_tpu.data.pipeline import DataInfo, background, prefetch_to_device
