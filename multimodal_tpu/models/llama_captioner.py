"""Llama captioner adapter: CLIP embedding -> linear projection -> Llama prefix -> generate.

Counterpart of reference Models/llamaCaptioner:8-114 (a linear projection from the CLIP
embedding (512) to the Llama hidden size, the projected vector prepended as one soft token,
HF ``generate()`` decoding, BLEU via nltk). The reference drives Llama-3-8B through HF
transformers on GPU; here the adapter is framework-neutral: the projection lives in JAX, and
decoding delegates to a locally cached HF causal LM when one is available (the TPU image has
the transformers library but no hub access — pass ``model_path`` to a local snapshot)."""

from __future__ import annotations

import logging
import jax
import jax.numpy as jnp
import numpy as np

log = logging.getLogger(__name__)


class LlamaCaptioner:
    def __init__(self, model_path: str, clip_dim: int = 512, seed: int = 0,
                 max_new_tokens: int = 40):
        try:
            import torch
            from transformers import AutoModelForCausalLM, AutoTokenizer
        except ImportError as e:  # pragma: no cover
            raise RuntimeError("transformers/torch required for LlamaCaptioner") from e
        self._torch = torch
        self.tokenizer = AutoTokenizer.from_pretrained(model_path, local_files_only=True)
        self.model = AutoModelForCausalLM.from_pretrained(
            model_path, local_files_only=True, torch_dtype=torch.float32
        ).eval()
        hidden = self.model.config.hidden_size
        key = jax.random.PRNGKey(seed)
        self.projection = np.asarray(
            jax.random.normal(key, (clip_dim, hidden)) * (clip_dim ** -0.5), np.float32
        )
        self.max_new_tokens = max_new_tokens

    def project(self, clip_embeds) -> np.ndarray:
        """JAX-side projection: [B, clip_dim] -> [B, 1, hidden] soft prefix."""
        out = jnp.asarray(clip_embeds, jnp.float32) @ jnp.asarray(self.projection)
        return np.array(out)[:, None, :]  # fresh writable copy (torch.from_numpy target)

    def generate_caption(self, clip_embeds, prompt: str = "A photo of") -> list[str]:
        """Prefix embedding + prompt tokens -> generate (llamaCaptioner:72-114)."""
        torch = self._torch
        prefix = torch.from_numpy(self.project(clip_embeds))
        prompt_ids = self.tokenizer(prompt, return_tensors="pt").input_ids
        prompt_emb = self.model.get_input_embeddings()(prompt_ids)
        captions = []
        for i in range(prefix.shape[0]):
            inputs = torch.cat([prefix[i : i + 1], prompt_emb], dim=1)
            with torch.no_grad():
                out = self.model.generate(
                    inputs_embeds=inputs,
                    max_new_tokens=self.max_new_tokens,
                    do_sample=False,
                    pad_token_id=self.tokenizer.eos_token_id,
                )
            captions.append(self.tokenizer.decode(out[0], skip_special_tokens=True))
        return captions
