"""Semantic caption embeddings for AlignCLIP's NL semantic supervision.

Counterpart of the reference's SBERT side-input: run.py:375-376 loads
sentence-transformers 'all-mpnet-base-v2', train.py:92-96 embeds the raw captions per batch,
and ClipInModalityLoss weights intra-modal logits by (1 - S S^T) (align_clip/loss.py:227-256).

Two encoders behind one callable protocol (texts -> [B, D] float32, L2-normalized):
  * ``HFSentenceEncoder`` — a locally cached HF transformer with mean pooling (the standard
    sentence-transformers recipe); requires local weights (zero-egress TPU pods);
  * ``HashingSemanticEncoder`` — deterministic bag-of-ngrams feature hashing. No weights, no
    network; captions sharing words get high cosine similarity, disjoint captions low — the
    structural property the loss needs, suitable for tests and smoke runs.
"""

from __future__ import annotations

import hashlib
import logging
import re
from typing import Sequence

import numpy as np

log = logging.getLogger(__name__)

_WORD = re.compile(r"[a-z0-9']+")


class HashingSemanticEncoder:
    def __init__(self, dim: int = 256, ngrams: int = 2):
        self.dim = dim
        self.ngrams = ngrams

    def _bucket(self, token: str) -> tuple[int, float]:
        h = hashlib.blake2b(token.encode(), digest_size=8).digest()
        idx = int.from_bytes(h[:4], "little") % self.dim
        sign = 1.0 if h[4] & 1 else -1.0
        return idx, sign

    def __call__(self, texts: Sequence[str]) -> np.ndarray:
        out = np.zeros((len(texts), self.dim), np.float32)
        for row, text in enumerate(texts):
            words = _WORD.findall(text.lower())
            grams = list(words)
            for n in range(2, self.ngrams + 1):
                grams += [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]
            for g in grams:
                idx, sign = self._bucket(g)
                out[row, idx] += sign
        norms = np.linalg.norm(out, axis=1, keepdims=True)
        return out / np.maximum(norms, 1e-12)


class HFSentenceEncoder:
    """Mean-pooled transformer sentence embeddings from a local snapshot
    (e.g. sentence-transformers/all-mpnet-base-v2)."""

    def __init__(self, model_path: str, max_length: int = 128, batch_size: int = 64):
        import torch
        from transformers import AutoModel, AutoTokenizer

        self._torch = torch
        self.tokenizer = AutoTokenizer.from_pretrained(model_path, local_files_only=True)
        self.model = AutoModel.from_pretrained(model_path, local_files_only=True).eval()
        self.max_length = max_length
        self.batch_size = batch_size

    def __call__(self, texts: Sequence[str]) -> np.ndarray:
        torch = self._torch
        outs = []
        for start in range(0, len(texts), self.batch_size):
            chunk = list(texts[start : start + self.batch_size])
            enc = self.tokenizer(chunk, padding=True, truncation=True,
                                 max_length=self.max_length, return_tensors="pt")
            with torch.no_grad():
                hidden = self.model(**enc).last_hidden_state  # [B, T, D]
            mask = enc["attention_mask"][..., None].float()
            pooled = (hidden * mask).sum(1) / mask.sum(1).clamp(min=1e-9)
            outs.append(pooled.numpy())
        out = np.concatenate(outs, axis=0).astype(np.float32)
        return out / np.maximum(np.linalg.norm(out, axis=1, keepdims=True), 1e-12)


def make_semantic_encoder(model_path: str | None = None, dim: int = 256):
    """HF encoder when a local snapshot is given/loadable, hashing fallback otherwise
    (mirrors run.py:375-376's conditional SBERT load)."""
    if model_path:
        try:
            return HFSentenceEncoder(model_path)
        except Exception as e:  # noqa: BLE001
            log.warning("HF sentence encoder unavailable (%r); using hashing fallback", e)
    return HashingSemanticEncoder(dim=dim)
