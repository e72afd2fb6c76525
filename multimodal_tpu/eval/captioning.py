"""Captioning evaluation: BLEU + the end-to-end caption-model downstream metric.

Counterpart of reference metrics/captioning.py: ``bleu_score`` (:55-75, nltk sentence_bleu
with uniform 4-gram weights), ``train_caption_model`` 3-epoch training on frozen CLIP
embeddings (:234-298), generation (:178-231) and the CaptioningMetric entry (:6-53).
BLEU is implemented from scratch (smoothed modified n-gram precision + brevity penalty,
matching nltk's method1 smoothing) — no nltk in the TPU image.
"""

from __future__ import annotations

import logging
import math
from collections import Counter
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

log = logging.getLogger(__name__)


def _ngrams(tokens: Sequence, n: int) -> Counter:
    return Counter(tuple(tokens[i : i + n]) for i in range(len(tokens) - n + 1))


def sentence_bleu(
    references: Sequence[Sequence[str]],
    hypothesis: Sequence[str],
    weights: Sequence[float] = (0.25, 0.25, 0.25, 0.25),
    smooth_eps: float = 0.1,
) -> float:
    """Sentence BLEU with clipped n-gram precision, brevity penalty, and epsilon smoothing
    for zero counts (nltk SmoothingFunction method1 — the reference's effective setting)."""
    hyp_len = len(hypothesis)
    if hyp_len == 0:
        return 0.0
    ref_lens = [len(r) for r in references]
    closest_ref = min(ref_lens, key=lambda rl: (abs(rl - hyp_len), rl))
    bp = 1.0 if hyp_len > closest_ref else math.exp(1.0 - closest_ref / max(hyp_len, 1))

    score = 0.0
    for n, w in enumerate(weights, start=1):
        if w == 0:
            continue
        hyp_ngrams = _ngrams(hypothesis, n)
        total = max(sum(hyp_ngrams.values()), 1)
        max_ref = Counter()
        for ref in references:
            for g, c in _ngrams(ref, n).items():
                max_ref[g] = max(max_ref[g], c)
        clipped = sum(min(c, max_ref[g]) for g, c in hyp_ngrams.items())
        p_n = clipped / total if clipped > 0 else smooth_eps / total
        score += w * math.log(p_n)
    return bp * math.exp(score)


def corpus_bleu(references_list, hypotheses, **kw) -> float:
    return float(np.mean([
        sentence_bleu(refs, hyp, **kw) for refs, hyp in zip(references_list, hypotheses)
    ]))


class CaptioningMetric:
    """Downstream captioning eval: train a ClipCaptionModel on frozen CLIP image embeddings,
    generate captions on held-out images, score BLEU against ground truth
    (metrics/captioning.py:6-53, 234-331)."""

    def __init__(
        self,
        caption_model=None,
        tokenizer: Optional[Callable] = None,
        detokenizer: Optional[Callable] = None,
        epochs: int = 3,
        batch_size: int = 32,
        lr: float = 2e-5,
        max_gen_len: int = 40,
        temperature: float = 0.0,
        seed: int = 0,
        eos_token: Optional[int] = None,
    ):
        """eos_token: id that ends generation AND truncates hypotheses before scoring.
        Defaults to the caption model's own default (GPT-2's 50256) — callers using a
        different vocab (e.g. CLIP BPE, EOT=49407) MUST pass theirs, otherwise decoding
        never stops and post-EOT garbage deflates BLEU."""
        from multimodal_tpu.models.captioner import ClipCaptionModel

        self.model = caption_model or ClipCaptionModel()
        self.tokenizer = tokenizer
        self.detokenizer = detokenizer
        self.epochs = epochs
        self.batch_size = batch_size
        self.lr = lr
        self.max_gen_len = max_gen_len
        self.temperature = temperature
        self.seed = seed
        self.eos_token = eos_token

    def train(self, clip_embeds: np.ndarray, token_ids: np.ndarray, params=None):
        """Train the caption model (frozen CLIP embeds in, next-token CE out). Returns
        trained params. token_ids: [N, T] int32, 0-padded."""
        import optax

        key = jax.random.PRNGKey(self.seed)
        n = clip_embeds.shape[0]
        if params is None:
            params = self.model.init(key, jnp.asarray(clip_embeds[:2]),
                                     jnp.asarray(token_ids[:2]))
        tx = optax.adamw(self.lr)
        opt_state = tx.init(params)

        @jax.jit
        def step(params, opt_state, emb, tok):
            loss, grads = jax.value_and_grad(
                lambda p: self.model.apply(p, emb, tok)
            )(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        if n == 0:
            raise ValueError("captioning train set is empty")
        bs = min(self.batch_size, n)  # never zero optimizer steps on a small train set
        rng = np.random.default_rng(self.seed)
        loss = float("nan")
        for epoch in range(self.epochs):
            order = rng.permutation(n)
            for start in range(0, n - bs + 1, bs):
                idx = order[start : start + bs]
                params, opt_state, loss = step(
                    params, opt_state, jnp.asarray(clip_embeds[idx]),
                    jnp.asarray(token_ids[idx]),
                )
            log.info("caption epoch %d: loss %.4f", epoch, float(loss))
        return params

    def generate(self, params, clip_embeds: np.ndarray) -> np.ndarray:
        key = jax.random.PRNGKey(self.seed + 1)

        gen_kwargs = {} if self.eos_token is None else {"eos_token": self.eos_token}

        @jax.jit
        def gen(params, emb, key):
            return self.model.apply(
                params, emb, key, max_len=self.max_gen_len,
                temperature=self.temperature, method=self.model.generate, **gen_kwargs,
            )

        outs = []
        for start in range(0, clip_embeds.shape[0], self.batch_size):
            key, sub = jax.random.split(key)
            outs.append(np.asarray(gen(
                params, jnp.asarray(clip_embeds[start : start + self.batch_size]), sub
            )))
        return np.concatenate(outs, axis=0)

    def compute(
        self,
        train_embeds: np.ndarray,
        train_tokens: np.ndarray,
        eval_embeds: np.ndarray,
        eval_captions: Sequence[str],
        params=None,
    ) -> tuple[float, dict]:
        """Full pipeline: train -> generate -> BLEU. eval_captions are reference strings;
        generated ids are detokenized with ``self.detokenizer``."""
        params = self.train(train_embeds, train_tokens, params=params)
        gen_ids = self.generate(params, eval_embeds)
        detok = self.detokenizer or (lambda ids: " ".join(str(i) for i in ids if i > 0))

        def clean(row):
            ids = [int(t) for t in row]
            if self.eos_token is not None and self.eos_token in ids:
                ids = ids[: ids.index(self.eos_token)]  # drop EOS and everything after
            return [t for t in ids if t > 0]

        hyps = [detok(clean(row)).split() for row in gen_ids]
        refs = [[c.split()] for c in eval_captions]
        bleu = corpus_bleu(refs, hyps)
        return bleu, {"bleu": bleu, "num_eval": len(hyps)}
