"""Checkpoint interop: load reference-format torch state_dicts into the JAX param tree.

Counterpart of the reference's pretrained-loading paths: OpenAI CLIP ViT checkpoints
(Models/clipModel.py:17-35 via clip.load), SharedCLIP/AlignCLIP checkpoints
(align_clip/factory.py:85-104 load_checkpoint, 'module.' prefix stripping run.py:306-307)
and positional-embedding resizing on image-size mismatch (align_clip/model.py:311-343).

Name mapping (torch -> flax):
    visual.conv1.weight [W,3,P,P]              -> visual_stem/patch_conv/kernel [P,P,3,W]
    visual.class_embedding                     -> visual_stem/class_embedding
    visual.positional_embedding                -> visual_stem/positional_embedding
    visual.ln_pre.{weight,bias}                -> visual_stem/ln_pre/LayerNorm_0/{scale,bias}
    visual.transformer.resblocks.{i}.attn.in_proj_weight [3W,W]
                                               -> visual_transformer/resblock_{i}/attn/qkv/kernel (transposed)
    ....attn.out_proj.weight [W,W]             -> .../attn/out/kernel (transposed)
    ....mlp.c_fc.weight [4W,W]                 -> .../mlp/c_fc/kernel (transposed)
    visual.ln_post / visual.proj               -> ln_post / visual_projection
    token_embedding.weight                     -> text_stem/token_embedding/embedding
    positional_embedding                       -> text_stem/positional_embedding
    transformer.resblocks.{i}.*                -> text_transformer/resblock_{i}/* (two-tower)
                                                  or transformer/resblock_{i}/* (shared trunk)
    ln_final / text_projection / logit_scale   -> ln_final / text_projection / logit_scale
SharedCLIP checkpoints additionally carry a shared 'projection' (model.py:192).
"""

from __future__ import annotations

import logging
import os
from typing import Any, Mapping

import numpy as np

from multimodal_tpu.models.config import CLIPConfig

log = logging.getLogger(__name__)


def _t(x):
    return np.asarray(x, np.float32).T


def resize_pos_embed(pos: np.ndarray, target_len: int, num_prefix: int = 1) -> np.ndarray:
    """Bicubic-resize the 2-D grid part of a ViT positional table to a new sequence length
    (align_clip/model.py:311-343). Prefix (CLS) rows pass through unchanged."""
    if pos.shape[0] == target_len:
        return pos
    prefix, grid = pos[:num_prefix], pos[num_prefix:]
    old = int(np.sqrt(grid.shape[0]))
    new = int(np.sqrt(target_len - num_prefix))
    if old * old != grid.shape[0] or new * new != target_len - num_prefix:
        raise ValueError(f"cannot resize pos embed {pos.shape[0]} -> {target_len}")
    try:
        import jax

        img = grid.reshape(1, old, old, -1)
        resized = np.asarray(
            jax.image.resize(img, (1, new, new, img.shape[-1]), method="bicubic")
        ).reshape(new * new, -1)
    except ImportError:  # pragma: no cover
        from PIL import Image

        chans = [
            np.asarray(
                Image.fromarray(grid[:, c].reshape(old, old)).resize((new, new), Image.BICUBIC)
            ).reshape(-1)
            for c in range(grid.shape[1])
        ]
        resized = np.stack(chans, axis=1)
    log.info("resized positional embedding %d -> %d tokens", pos.shape[0], target_len)
    return np.concatenate([prefix, resized], axis=0).astype(pos.dtype)


def _strip_prefixes(sd: Mapping[str, Any]) -> dict:
    """Unwrap {'state_dict': ...} nesting and strip DDP 'module.'/'_orig_mod.' prefixes."""
    if "state_dict" in sd and isinstance(sd["state_dict"], Mapping):
        sd = sd["state_dict"]
    out = {}
    for k, v in sd.items():
        for pre in ("module.", "_orig_mod."):
            if k.startswith(pre):
                k = k[len(pre):]
        out[k] = v
    return out


def _map_block(sd: dict, src: str, width: int) -> dict:
    """One ResidualAttentionBlock's tensors -> flax leaf dict. torch's fused in_proj
    [3W, W] splits into our separate query/key/value kernels (row order is q, k, v)."""
    qkv_w = np.asarray(sd[f"{src}.attn.in_proj_weight"], np.float32)  # [3W, W]
    qkv_b = np.asarray(sd[f"{src}.attn.in_proj_bias"], np.float32)
    out_w = np.asarray(sd[f"{src}.attn.out_proj.weight"], np.float32)
    qw, kw, vw = np.split(qkv_w, 3, axis=0)
    qb, kb, vb = np.split(qkv_b, 3, axis=0)
    return {
        "attn": {
            "query": {"kernel": qw.T, "bias": qb},
            "key": {"kernel": kw.T, "bias": kb},
            "value": {"kernel": vw.T, "bias": vb},
            "out": {
                "kernel": out_w.T,
                "bias": np.asarray(sd[f"{src}.attn.out_proj.bias"], np.float32),
            },
        },
        "ln_1": {"LayerNorm_0": {
            "scale": np.asarray(sd[f"{src}.ln_1.weight"], np.float32),
            "bias": np.asarray(sd[f"{src}.ln_1.bias"], np.float32),
        }},
        "ln_2": {"LayerNorm_0": {
            "scale": np.asarray(sd[f"{src}.ln_2.weight"], np.float32),
            "bias": np.asarray(sd[f"{src}.ln_2.bias"], np.float32),
        }},
        "mlp": {
            "c_fc": {
                "kernel": _t(sd[f"{src}.mlp.c_fc.weight"]),
                "bias": np.asarray(sd[f"{src}.mlp.c_fc.bias"], np.float32),
            },
            "c_proj": {
                "kernel": _t(sd[f"{src}.mlp.c_proj.weight"]),
                "bias": np.asarray(sd[f"{src}.mlp.c_proj.bias"], np.float32),
            },
        },
    }


def _ln(sd: dict, src: str) -> dict:
    return {"LayerNorm_0": {
        "scale": np.asarray(sd[f"{src}.weight"], np.float32),
        "bias": np.asarray(sd[f"{src}.bias"], np.float32),
    }}


def convert_torch_state_dict(sd: Mapping[str, Any], cfg: CLIPConfig) -> dict:
    """torch CLIP/SharedCLIP state_dict -> flax {'params': ...} tree (numpy leaves)."""
    sd = _strip_prefixes(sd)
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
          for k, v in sd.items()}

    shared = cfg.share_trunk
    grid = cfg.vision.image_size // cfg.vision.patch_size
    target_vis_len = grid * grid + 1

    p: dict = {
        "visual_stem": {
            "patch_conv": {
                "kernel": np.transpose(np.asarray(sd["visual.conv1.weight"], np.float32),
                                       (2, 3, 1, 0)),
            },
            "class_embedding": np.asarray(sd["visual.class_embedding"], np.float32),
            "positional_embedding": resize_pos_embed(
                np.asarray(sd["visual.positional_embedding"], np.float32), target_vis_len
            ),
            "ln_pre": _ln(sd, "visual.ln_pre"),
        },
        "text_stem": {
            "token_embedding": {
                "embedding": np.asarray(sd["token_embedding.weight"], np.float32)
            },
            "positional_embedding": np.asarray(sd["positional_embedding"], np.float32),
        },
        "logit_scale": np.asarray(sd["logit_scale"], np.float32).reshape(()),
    }

    if shared:
        p["transformer"] = {
            f"resblock_{i}": _map_block(sd, f"transformer.resblocks.{i}", cfg.vision.width)
            for i in range(cfg.vision.layers)
        }
        p["ln_post"] = _ln(sd, "visual.ln_post" if "visual.ln_post.weight" in sd else "ln_post")
        proj_key = "projection" if "projection" in sd else "text_projection"
        p["projection"] = np.asarray(sd[proj_key], np.float32)
    else:
        p["visual_transformer"] = {
            f"resblock_{i}": _map_block(sd, f"visual.transformer.resblocks.{i}",
                                        cfg.vision.width)
            for i in range(cfg.vision.layers)
        }
        p["text_transformer"] = {
            f"resblock_{i}": _map_block(sd, f"transformer.resblocks.{i}", cfg.text.width)
            for i in range(cfg.text.layers)
        }
        p["ln_post"] = _ln(sd, "visual.ln_post")
        p["ln_final"] = _ln(sd, "ln_final")
        p["visual_projection"] = np.asarray(sd["visual.proj"], np.float32)
        p["text_projection"] = np.asarray(sd["text_projection"], np.float32)

    return {"params": p}


def _check_tree_match(loaded, template, path=""):
    """Every template leaf must exist with the same shape (catches silent config drift)."""
    if isinstance(template, Mapping):
        missing = set(template) - set(loaded)
        extra = set(loaded) - set(template)
        if missing or extra:
            raise ValueError(f"param tree mismatch at {path or '/'}: "
                             f"missing={sorted(missing)} extra={sorted(extra)}")
        for k in template:
            _check_tree_match(loaded[k], template[k], f"{path}/{k}")
    else:
        if tuple(np.shape(loaded)) != tuple(np.shape(template)):
            raise ValueError(
                f"shape mismatch at {path}: {np.shape(loaded)} vs {np.shape(template)}"
            )


def load_pretrained(path: str, params_template, cfg: CLIPConfig):
    """Load a checkpoint by format: orbax dir, or torch .pt/.pth/.bin via torch (CPU).

    When ``params_template`` carries LoRA adapter leaves (``lora_a``/``lora_b``, i.e.
    the model was built with lora_rank > 0): an orbax checkpoint that ITSELF carries
    adapter leaves (saved from a LoRA finetune) is restored against the full template,
    keeping the trained adapters. Otherwise (published/base checkpoints have no adapter
    leaves) the checkpoint is loaded against a lora-free view of the template and the
    freshly initialized adapters are grafted back on afterwards, with a log line saying
    so (finetune.ipynb's get_peft_model path: pretrained base + new adapters)."""
    import flax.traverse_util as traverse_util

    from multimodal_tpu.models.lora import is_lora_leaf

    flat_template = traverse_util.flatten_dict(params_template, sep="/")
    lora_leaves = {k: v for k, v in flat_template.items() if is_lora_leaf(k)}
    base_template = params_template
    if lora_leaves:
        base_template = traverse_util.unflatten_dict(
            {k: v for k, v in flat_template.items() if not is_lora_leaf(k)}, sep="/"
        )

    if os.path.isdir(path):
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        if lora_leaves:
            # probe: a checkpoint saved from a LoRA finetune carries the adapters —
            # restore it against the FULL template so the trained adapters load
            # instead of being silently replaced by fresh inits
            try:
                return ckptr.restore(os.path.abspath(path), params_template)
            except Exception:
                log.info(
                    "pretrained checkpoint %s has no LoRA adapter leaves — loading the "
                    "base weights and grafting freshly initialized adapters", path,
                )
        import jax

        restored = ckptr.restore(os.path.abspath(path), base_template)
        # --force-image-size against a checkpoint trained at the registry resolution:
        # orbax restores the CHECKPOINT's shapes (no shape enforcement), so bicubic-
        # resize the visual positional table to the template grid, then strict-check —
        # any remaining shape drift is a real config mismatch and raises
        flat_r = traverse_util.flatten_dict(restored, sep="/")
        flat_base = traverse_util.flatten_dict(base_template, sep="/")
        for k in flat_base:
            if (k.endswith("visual_stem/positional_embedding") and k in flat_r
                    and np.shape(flat_r[k]) != np.shape(flat_base[k])):
                flat_r[k] = resize_pos_embed(
                    np.asarray(flat_r[k], np.float32), np.shape(flat_base[k])[0]
                )
        restored = traverse_util.unflatten_dict(flat_r, sep="/")
        _check_tree_match(restored, base_template)
        restored = jax.tree_util.tree_map(
            lambda leaf, ref: np.asarray(leaf, np.asarray(ref).dtype)
            if not hasattr(leaf, "sharding") else leaf,
            restored, base_template,
        )
    else:
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=False)
        if hasattr(sd, "state_dict"):  # torchscript archive (clip.load format)
            sd = sd.state_dict()
        converted = convert_torch_state_dict(sd, cfg)
        _check_tree_match(converted, base_template)
        import jax

        restored = jax.tree_util.tree_map(
            lambda leaf, ref: np.asarray(leaf, np.asarray(ref).dtype),
            converted, base_template,
        )

    if lora_leaves:
        flat = traverse_util.flatten_dict(restored, sep="/")
        flat.update(lora_leaves)
        restored = traverse_util.unflatten_dict(flat, sep="/")
    return restored


# --------------------------------------------------------------------------- export
def _unmap_block(blk: Mapping[str, Any], dst: str) -> dict:
    """Inverse of _map_block: flax block leaves -> torch ResidualAttentionBlock tensors
    (separate q/k/v kernels re-fused into in_proj [3W, W], row order q, k, v)."""
    a = blk["attn"]
    g = lambda t: np.asarray(t, np.float32)  # noqa: E731
    qkv_w = np.concatenate([g(a[k]["kernel"]).T for k in ("query", "key", "value")], axis=0)
    qkv_b = np.concatenate([g(a[k]["bias"]) for k in ("query", "key", "value")], axis=0)
    return {
        f"{dst}.attn.in_proj_weight": qkv_w,
        f"{dst}.attn.in_proj_bias": qkv_b,
        f"{dst}.attn.out_proj.weight": g(a["out"]["kernel"]).T,
        f"{dst}.attn.out_proj.bias": g(a["out"]["bias"]),
        f"{dst}.ln_1.weight": g(blk["ln_1"]["LayerNorm_0"]["scale"]),
        f"{dst}.ln_1.bias": g(blk["ln_1"]["LayerNorm_0"]["bias"]),
        f"{dst}.ln_2.weight": g(blk["ln_2"]["LayerNorm_0"]["scale"]),
        f"{dst}.ln_2.bias": g(blk["ln_2"]["LayerNorm_0"]["bias"]),
        f"{dst}.mlp.c_fc.weight": g(blk["mlp"]["c_fc"]["kernel"]).T,
        f"{dst}.mlp.c_fc.bias": g(blk["mlp"]["c_fc"]["bias"]),
        f"{dst}.mlp.c_proj.weight": g(blk["mlp"]["c_proj"]["kernel"]).T,
        f"{dst}.mlp.c_proj.bias": g(blk["mlp"]["c_proj"]["bias"]),
    }


def export_torch_state_dict(params: Mapping[str, Any], cfg: CLIPConfig) -> dict:
    """flax params tree -> OpenAI-CLIP/SharedCLIP-format torch state_dict (numpy values;
    pass through torch.save after torch.from_numpy to write a .pt the reference stack
    loads). Exact inverse of convert_torch_state_dict — lets a reference user train here
    and evaluate with their existing torch tooling."""
    p = params["params"] if "params" in params else params
    g = lambda t: np.asarray(t, np.float32)  # noqa: E731

    sd: dict = {
        "visual.conv1.weight": np.transpose(
            g(p["visual_stem"]["patch_conv"]["kernel"]), (3, 2, 0, 1)),
        "visual.class_embedding": g(p["visual_stem"]["class_embedding"]),
        "visual.positional_embedding": g(p["visual_stem"]["positional_embedding"]),
        "visual.ln_pre.weight": g(p["visual_stem"]["ln_pre"]["LayerNorm_0"]["scale"]),
        "visual.ln_pre.bias": g(p["visual_stem"]["ln_pre"]["LayerNorm_0"]["bias"]),
        "token_embedding.weight": g(p["text_stem"]["token_embedding"]["embedding"]),
        "positional_embedding": g(p["text_stem"]["positional_embedding"]),
        "logit_scale": g(p["logit_scale"]).reshape(()),
    }
    if cfg.share_trunk:
        for i in range(cfg.vision.layers):
            sd.update(_unmap_block(p["transformer"][f"resblock_{i}"],
                                   f"transformer.resblocks.{i}"))
        sd["visual.ln_post.weight"] = g(p["ln_post"]["LayerNorm_0"]["scale"])
        sd["visual.ln_post.bias"] = g(p["ln_post"]["LayerNorm_0"]["bias"])
        sd["projection"] = g(p["projection"])
    else:
        for i in range(cfg.vision.layers):
            sd.update(_unmap_block(p["visual_transformer"][f"resblock_{i}"],
                                   f"visual.transformer.resblocks.{i}"))
        for i in range(cfg.text.layers):
            sd.update(_unmap_block(p["text_transformer"][f"resblock_{i}"],
                                   f"transformer.resblocks.{i}"))
        sd["visual.ln_post.weight"] = g(p["ln_post"]["LayerNorm_0"]["scale"])
        sd["visual.ln_post.bias"] = g(p["ln_post"]["LayerNorm_0"]["bias"])
        sd["ln_final.weight"] = g(p["ln_final"]["LayerNorm_0"]["scale"])
        sd["ln_final.bias"] = g(p["ln_final"]["LayerNorm_0"]["bias"])
        sd["visual.proj"] = g(p["visual_projection"])
        sd["text_projection"] = g(p["text_projection"])
    return sd
