from multimodal_tpu.data.tokenizer import SimpleTokenizer, default_tokenizer, tokenize
from multimodal_tpu.data.preprocess import (
    OPENAI_DATASET_MEAN,
    OPENAI_DATASET_STD,
    eval_transform,
    normalize_images,
    train_transform,
)
from multimodal_tpu.data.synthetic import SyntheticDataset
