"""Synthetic fake-data backend — lets the full training loop run with no data and no network.

Counterpart of reference AlignCLIP/main/data.py:582-608 (SyntheticDataset: constant black
image + "Dummy caption", selected via --dataset-type synthetic, params.py:100-104)."""

from __future__ import annotations

import numpy as np

from multimodal_tpu.data.preprocess import IMAGE_SIZE, OPENAI_DATASET_MEAN, OPENAI_DATASET_STD
from multimodal_tpu.data.tokenizer import CONTEXT_LENGTH, tokenize


class SyntheticDataset:
    """Fixed black image + fixed caption, already preprocessed/tokenized."""

    def __init__(
        self,
        num_samples: int = 100,
        image_size: int = IMAGE_SIZE,
        caption: str = "Dummy caption",
        context_length: int = CONTEXT_LENGTH,
    ):
        self.num_samples = num_samples
        self.image_size = image_size
        # normalized all-black image
        self._image = (
            (np.zeros((image_size, image_size, 3), np.float32) - np.asarray(OPENAI_DATASET_MEAN, np.float32))
            / np.asarray(OPENAI_DATASET_STD, np.float32)
        )
        self._text = tokenize([caption], context_length=context_length)[0]

    def __len__(self):
        return self.num_samples

    def __getitem__(self, idx):
        if not 0 <= idx < self.num_samples:
            raise IndexError(idx)
        return {"image": self._image, "text": self._text}

    def batches(self, batch_size: int, steps: int | None = None, drop_last: bool = True):
        """Yield dict batches {image: [B,H,W,3] f32, text: [B,77] i32}."""
        total = steps if steps is not None else self.num_samples // batch_size
        image = np.broadcast_to(self._image, (batch_size,) + self._image.shape).copy()
        text = np.broadcast_to(self._text, (batch_size,) + self._text.shape).copy()
        for _ in range(total):
            yield {"image": image, "text": text}
