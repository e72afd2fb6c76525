"""Typed model configuration + JSON registry.

Counterpart of the reference's model-config system: dataclasses CLIPVisionCfg/CLIPTextCfg
(align_clip/model.py:21-55) and the JSON registry align_clip/model_configs/*.json loaded by
_rescan_model_configs (factory.py:32-53)."""

from __future__ import annotations

import dataclasses
import json
import os
_CONFIG_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "configs")


@dataclasses.dataclass(frozen=True)
class VisionConfig:
    image_size: int = 224
    patch_size: int = 32
    width: int = 768
    layers: int = 12
    heads: int = 12
    mlp_ratio: float = 4.0
    patch_dropout: float = 0.0  # FLIP-style token drop at train time (transformer.py:51-88)
    ls_init_value: float | None = None  # LayerScale init (model.py:30)
    scaled_cosine: bool = False  # cosine-sim attention w/ per-head temp (transformer.py:119)
    scale_heads: bool = False  # per-head learnable output scale (transformer.py:124)
    global_average_pool: bool = False  # mean-pool tokens instead of CLS (model.py:33,76-80)
    attentional_pool: bool = False  # learned-query pooling head (model.py:34, transformer.py:167)
    n_queries: int = 256
    attn_pooler_heads: int = 8
    # sparse capacity (beyond reference): MoE MLPs on every `moe_every`-th block
    moe_experts: int = 0
    moe_every: int = 2
    moe_top_k: int = 1
    moe_capacity_factor: float = 1.25


@dataclasses.dataclass(frozen=True)
class TextConfig:
    context_length: int = 77
    vocab_size: int = 49408
    width: int = 512
    layers: int = 12
    heads: int = 8
    mlp_ratio: float = 4.0
    ls_init_value: float | None = None  # LayerScale init (model.py:47)


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    embed_dim: int = 512
    vision: VisionConfig = dataclasses.field(default_factory=VisionConfig)
    text: TextConfig = dataclasses.field(default_factory=TextConfig)
    # single shared trunk for both modalities (SharedCLIP/AlignCLIP, model.py:175-194);
    # requires vision.width == text.width etc. (asserted at model.py:165-169)
    share_trunk: bool = False
    remat: bool = False  # per-block rematerialization (grad checkpointing)
    # MLP activation: "quick_gelu" (OpenAI CLIP) or "gelu" (OpenCLIP LAION-style configs;
    # the reference forces the former via --force-quick-gelu, factory.py:137-140)
    act: str = "quick_gelu"
    # SigLIP-style pairwise-sigmoid head (beyond reference): a learnable logit bias next
    # to logit_scale. None = no bias param (softmax CLIP family); SigLIP's published init
    # is bias=-10 with logit_scale=ln(10) (losses/siglip_loss.py)
    logit_bias_init: float | None = None
    logit_scale_init: float | None = None  # None = CLIP's ln(1/0.07)
    # PEFT-style low-rank adapters on every attention/MLP projection in both trunks
    # (finetune.ipynb:cell 12's optional LoRA wrap): rank 0 = off. Adapter deltas start
    # at zero (B=0 init) so a pretrained checkpoint's behavior is unchanged at step 0;
    # train only the adapters via train.run --lora-rank (optax.masked on 'lora_' leaves).
    lora_rank: int = 0
    lora_alpha: float = 16.0
    # SwitchBack int8 training GEMMs in every trunk MLP (fwd + input-grad on the 2x-rate
    # int8 MXU, weight-grad bf16/f32; ops/quant.py:int8_dense_train). The TPU-native
    # extension of the reference's precision axis (AlignCLIP/main/params.py:218);
    # enable via --precision int8.
    int8_forward: bool = False

    def __post_init__(self):
        if self.share_trunk:
            assert self.vision.width == self.text.width, "shared trunk requires equal widths"
            assert self.vision.layers == self.text.layers
            assert self.vision.heads == self.text.heads


@dataclasses.dataclass(frozen=True)
class VariationalConfig:
    """Extra head config for VariationalCLIP (Models/variationalClip.py:40-57)."""

    model_type: str = "Spherical"  # or "Gaussian"
    min_concentration: float = 10.0
    initial_concentration: float = 200.0
    max_concentration: float = 1e12


def _vision_from_json(d: dict) -> VisionConfig:
    return VisionConfig(
        image_size=d.get("image_size", 224),
        patch_size=d.get("patch_size", 32),
        width=d.get("width", 768),
        layers=d.get("layers", 12),
        heads=d.get("heads", d.get("width", 768) // 64),
        mlp_ratio=d.get("mlp_ratio", 4.0),
        patch_dropout=d.get("patch_dropout", 0.0),
        ls_init_value=d.get("ls_init_value"),
        scaled_cosine=d.get("scaled_cosine", False),
        scale_heads=d.get("scale_heads", False),
        global_average_pool=d.get("global_average_pool", False),
        attentional_pool=d.get("attentional_pool", False),
        n_queries=d.get("n_queries", 256),
        attn_pooler_heads=d.get("attn_pooler_heads", 8),
        moe_experts=d.get("moe_experts", 0),
        moe_every=d.get("moe_every", 2),
        moe_top_k=d.get("moe_top_k", 1),
        moe_capacity_factor=d.get("moe_capacity_factor", 1.25),
    )


def _text_from_json(d: dict) -> TextConfig:
    return TextConfig(
        context_length=d.get("context_length", 77),
        vocab_size=d.get("vocab_size", 49408),
        width=d.get("width", 512),
        layers=d.get("layers", 12),
        heads=d.get("heads", d.get("width", 512) // 64),
        mlp_ratio=d.get("mlp_ratio", 4.0),
        ls_init_value=d.get("ls_init_value"),
    )


def clip_config_from_dict(d: dict) -> CLIPConfig:
    return CLIPConfig(
        embed_dim=d.get("embed_dim", 512),
        vision=_vision_from_json(d.get("vision_cfg", {})),
        text=_text_from_json(d.get("text_cfg", {})),
        share_trunk=d.get("share_trunk", False),
        remat=d.get("remat", False),
        # "act": "gelu"|"quick_gelu", or OpenCLIP-style "quick_gelu": false; the default
        # stays QuickGELU (every reference model is OpenAI-style, factory.py:137-140)
        act=d.get("act", "quick_gelu" if d.get("quick_gelu", True) else "gelu"),
        lora_rank=d.get("lora_rank", 0),
        lora_alpha=d.get("lora_alpha", 16.0),
    )


_registry: dict = {}


def _rescan():
    _registry.clear()
    if os.path.isdir(_CONFIG_DIR):
        for fname in sorted(os.listdir(_CONFIG_DIR)):
            if fname.endswith(".json"):
                with open(os.path.join(_CONFIG_DIR, fname)) as f:
                    _registry[fname[:-5]] = json.load(f)


def list_models() -> list:
    if not _registry:
        _rescan()
    return sorted(_registry)


def get_model_config(name: str) -> CLIPConfig:
    if not _registry:
        _rescan()
    if name not in _registry:
        raise KeyError(f"unknown model config {name!r}; available: {list_models()}")
    return clip_config_from_dict(_registry[name])


def add_model_config(name: str, cfg: dict):
    """Register an extra config at runtime (factory.py:61 equivalent)."""
    if not _registry:
        _rescan()
    _registry[name] = cfg
