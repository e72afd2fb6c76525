"""Model factory — name -> module (+ initialized params), from the JSON config registry.

Counterpart of align_clip/factory.py:107-257 (create_model / create_model_and_transforms)."""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_tpu.models.clip import CLIP, VariationalCLIP
from multimodal_tpu.models.config import (
    CLIPConfig,
    VariationalConfig,
    get_model_config,
    list_models,
)


def create_model(
    name: str,
    variational: bool = False,
    vcfg: Optional[VariationalConfig] = None,
    dtype: Any = jnp.float32,
    remat: Optional[bool] = None,
    patch_dropout: Optional[float] = None,
    force_quick_gelu: bool = False,
    siglip: bool = False,
    lora_rank: Optional[int] = None,
    lora_alpha: Optional[float] = None,
    int8_forward: bool = False,
    force_image_size: Optional[int] = None,
):
    import dataclasses

    cfg = get_model_config(name)
    if force_image_size:  # reference factory.py force_image_size: model AT this resolution
        if force_image_size % cfg.vision.patch_size:
            raise ValueError(
                f"--force-image-size {force_image_size} is not a multiple of the "
                f"model's patch size {cfg.vision.patch_size}"
            )
        cfg = dataclasses.replace(
            cfg, vision=dataclasses.replace(cfg.vision, image_size=force_image_size)
        )
    if remat is not None:
        cfg = dataclasses.replace(cfg, remat=remat)
    if int8_forward:  # --precision int8: SwitchBack int8 MLP GEMMs (ops/quant.py)
        cfg = dataclasses.replace(cfg, int8_forward=True)
    if lora_rank:  # PEFT LoRA adapters on every trunk projection (finetune.ipynb:cell 12)
        cfg = dataclasses.replace(
            cfg, lora_rank=lora_rank, lora_alpha=lora_alpha or cfg.lora_alpha
        )
    if siglip:  # SigLIP head: learnable pairwise-sigmoid bias, published inits
        cfg = dataclasses.replace(
            cfg, logit_bias_init=-10.0, logit_scale_init=float(np.log(10.0))
        )
    if force_quick_gelu:  # reference factory.py:137-140 / params.py --force-quick-gelu
        cfg = dataclasses.replace(cfg, act="quick_gelu")
    if patch_dropout is not None:  # --force-patch-dropout (reference params.py:246-251)
        cfg = dataclasses.replace(
            cfg, vision=dataclasses.replace(cfg.vision, patch_dropout=patch_dropout)
        )
    if variational:
        return VariationalCLIP(cfg=cfg, vcfg=vcfg or VariationalConfig(), dtype=dtype)
    return CLIP(cfg=cfg, dtype=dtype)


def example_inputs(cfg: CLIPConfig, batch: int = 2):
    images = jnp.zeros((batch, cfg.vision.image_size, cfg.vision.image_size, 3), jnp.float32)
    tokens = jnp.zeros((batch, cfg.text.context_length), jnp.int32).at[:, 0].set(1)
    # put a large token id at position 3 so EOT-argmax pooling has a well-defined target
    tokens = tokens.at[:, 3].set(cfg.text.vocab_size - 1)
    return images, tokens


def init_params(model, rng=None, batch: int = 2):
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    images, tokens = example_inputs(model.cfg, batch)
    return model.init(rng, images, tokens)


def param_count(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
