"""CLIP byte-pair-encoding tokenizer (from scratch, host-side).

Functional counterpart of the reference's SimpleTokenizer / tokenize()
(AlignCLIP/align_clip/tokenizer.py:72-188) and of ``clip.tokenize`` used by Datasets/coco.py.
Must be bit-identical on the standard 49,408-token CLIP vocabulary
(assets/bpe_simple_vocab_16e6.txt.gz): retrieval metrics are sensitive to tokenization drift.

Output is int32 ``[N, context_length]`` (context_length=77) with SOT/EOT framing, zero padding
and truncate-keep-EOT semantics — ready for device transfer. Batch encoding releases the GIL
poorly in pure Python, so ``tokenize`` fans out across a thread pool for large batches (BPE is
cache-friendly: captions share most words).
"""

from __future__ import annotations

import functools
import gzip
import html
import os
import unicodedata
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import regex as re

try:  # ftfy fixes mojibake; identity on clean text. Optional (not in the TPU image).
    import ftfy

    _HAS_FTFY = True
except ImportError:
    _HAS_FTFY = False

DEFAULT_BPE_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "assets", "bpe_simple_vocab_16e6.txt.gz"
)
CONTEXT_LENGTH = 77
SOT_TOKEN = "<|startoftext|>"
EOT_TOKEN = "<|endoftext|>"

_TOKEN_PATTERN = re.compile(
    r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
    re.IGNORECASE,
)
_WS_PATTERN = re.compile(r"\s+")


@functools.lru_cache()
def byte_unicode_table() -> dict:
    """Reversible byte -> printable-unicode-char table (the GPT-2/CLIP convention).

    Printable latin bytes map to themselves; the rest map to code points >= 256 so every byte
    has a visible, whitespace-free representative.
    """
    printable = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    mapping = {b: chr(b) for b in printable}
    shift = 0
    for b in range(256):
        if b not in mapping:
            mapping[b] = chr(256 + shift)
            shift += 1
    return mapping


def _clean(text: str) -> str:
    if _HAS_FTFY:
        text = ftfy.fix_text(text)
    else:
        # vendored ftfy subset: cp1252-mojibake repair + NFC, so CC12M-style dirty
        # captions tokenize identically with or without ftfy in the environment
        # (reference tokenizer.py:60-63 applies ftfy unconditionally)
        from multimodal_tpu.data.textfix import fix_text

        text = unicodedata.normalize("NFC", fix_text(text))
    text = html.unescape(html.unescape(text))
    return _WS_PATTERN.sub(" ", text).strip()


class SimpleTokenizer:
    """CLIP BPE: lowercase, regex word split, byte-encode, iterative lowest-rank pair merges."""

    def __init__(self, bpe_path: str = DEFAULT_BPE_PATH):
        self.byte_encoder = byte_unicode_table()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        with gzip.open(bpe_path, "rt", encoding="utf-8") as f:
            lines = f.read().split("\n")
        # line 0 is a version header; the CLIP vocab uses the first 48,894 merge rules
        # (49152 - 256*2 - 2 special + ... => indices 1 .. 49152-256-2 inclusive)
        merge_lines = lines[1 : 49152 - 256 - 2 + 1]
        merges = [tuple(line.split()) for line in merge_lines]
        chars = list(self.byte_encoder.values())
        vocab = chars + [c + "</w>" for c in chars]
        vocab.extend("".join(m) for m in merges)
        vocab.extend([SOT_TOKEN, EOT_TOKEN])
        self.encoder = {tok: i for i, tok in enumerate(vocab)}
        self.decoder = {i: tok for tok, i in self.encoder.items()}
        self.merge_ranks = {m: i for i, m in enumerate(merges)}
        self._bpe_cache = {SOT_TOKEN: (SOT_TOKEN,), EOT_TOKEN: (EOT_TOKEN,)}
        self.vocab_size = len(vocab)
        self.sot_token_id = self.encoder[SOT_TOKEN]
        self.eot_token_id = self.encoder[EOT_TOKEN]

    def _bpe(self, token: str) -> tuple:
        cached = self._bpe_cache.get(token)
        if cached is not None:
            return cached
        parts = list(token[:-1]) + [token[-1] + "</w>"]
        if len(parts) == 1:
            self._bpe_cache[token] = tuple(parts)
            return tuple(parts)
        while len(parts) > 1:
            pairs = [(parts[i], parts[i + 1]) for i in range(len(parts) - 1)]
            best = min(pairs, key=lambda p: self.merge_ranks.get(p, float("inf")))
            if best not in self.merge_ranks:
                break
            merged = []
            i = 0
            while i < len(parts):
                if (
                    i < len(parts) - 1
                    and parts[i] == best[0]
                    and parts[i + 1] == best[1]
                ):
                    merged.append(parts[i] + parts[i + 1])
                    i += 2
                else:
                    merged.append(parts[i])
                    i += 1
            parts = merged
        result = tuple(parts)
        self._bpe_cache[token] = result
        return result

    def encode(self, text: str) -> list:
        ids = []
        for word in _TOKEN_PATTERN.findall(_clean(text).lower()):
            word_bytes = "".join(self.byte_encoder[b] for b in word.encode("utf-8"))
            ids.extend(self.encoder[piece] for piece in self._bpe(word_bytes))
        return ids

    def decode(self, ids) -> str:
        text = "".join(self.decoder[int(i)] for i in ids)
        raw = bytearray(self.byte_decoder[c] for c in text if c in self.byte_decoder)
        return raw.decode("utf-8", errors="replace").replace("</w>", " ")

    def __call__(self, texts, context_length: int = CONTEXT_LENGTH) -> np.ndarray:
        return tokenize(texts, context_length=context_length, tokenizer=self)


@functools.lru_cache()
def default_tokenizer() -> SimpleTokenizer:
    return SimpleTokenizer()


def tokenize(
    texts,
    context_length: int = CONTEXT_LENGTH,
    tokenizer: SimpleTokenizer | None = None,
    num_threads: int = 8,
    use_native: bool = True,
) -> np.ndarray:
    """Batch tokenize to ``[N, context_length]`` int32 with SOT/EOT + truncate-keep-EOT,
    matching reference tokenizer.py:159-188 (zero-padded, over-long sequences truncated with
    the final slot forced to EOT).

    Pure-ASCII batches take the native C++ BPE (bit-identical, ~25x faster,
    native/bpe_tokenizer.cc); anything needing Unicode normalization or HTML unescaping
    (or a custom vocab) runs the Python path."""
    if isinstance(texts, str):
        texts = [texts]
    if use_native and tokenizer is None and not os.environ.get("MMTPU_DISABLE_NATIVE_BPE"):
        from multimodal_tpu.native.bindings import bpe_encode_batch

        out = bpe_encode_batch(list(texts), DEFAULT_BPE_PATH, context_length)
        if out is not None:
            return out
    tok = tokenizer or default_tokenizer()

    def encode_one(text):
        return tok.encode(text)

    if len(texts) > 64:
        with ThreadPoolExecutor(max_workers=num_threads) as pool:
            encoded = list(pool.map(encode_one, texts))
    else:
        encoded = [encode_one(t) for t in texts]

    out = np.zeros((len(texts), context_length), dtype=np.int32)
    for row, ids in enumerate(encoded):
        full = [tok.sot_token_id] + ids + [tok.eot_token_id]
        if len(full) > context_length:
            full = full[:context_length]
            full[-1] = tok.eot_token_id
        out[row, : len(full)] = full
    return out


class HFTokenizer:
    """HuggingFace tokenizer wrapper (align_clip/tokenizer.py:191-214): same text cleaning
    as the BPE path minus lowercasing, padded/truncated [N, context_length] int32 ids. Used
    when a model config names an hf_tokenizer_name (factory.py:76-83)."""

    def __init__(self, tokenizer_name: str):
        from transformers import AutoTokenizer

        self.tokenizer = AutoTokenizer.from_pretrained(tokenizer_name)

    def save_pretrained(self, dest: str):
        self.tokenizer.save_pretrained(dest)

    def __call__(self, texts, context_length: int = CONTEXT_LENGTH) -> np.ndarray:
        if isinstance(texts, str):
            texts = [texts]
        texts = [_clean(t) for t in texts]
        ids = self.tokenizer(
            texts,
            return_tensors="np",
            max_length=context_length,
            padding="max_length",
            truncation=True,
        ).input_ids
        return ids.astype(np.int32)
