"""LoRA adapter utilities: extract, load, and merge low-rank adapters.

Counterpart of the reference's optional PEFT-LoRA finetune (finetune.ipynb:cell 12:
``get_peft_model`` + ``merge_and_unload``). The adapters themselves live inside the
parameter tree as ``<proj>/lora_a``, ``<proj>/lora_b`` (models/layers.py:_DenseParams),
so a LoRA finetune is just the normal train loop with an optax mask; these helpers cover
the checkpoint side: save adapters alone (tiny files), re-attach them to a base model,
and fold them into the kernels for lora-free deployment (the merge_and_unload analog).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np

try:  # flax is a hard dep of the models package; guard only for doc tooling
    import flax.traverse_util as traverse_util
except ImportError:  # pragma: no cover
    traverse_util = None


def is_lora_leaf(path: str) -> bool:
    return path.endswith("lora_a") or path.endswith("lora_b")


def lora_mask(params) -> Any:
    """Boolean pytree: True on adapter leaves (+ nothing else). The optimizer-side mask
    used by train.run --lora-rank additionally trains logit_scale (run.py:_finetune_mask)."""

    def keep(path, leaf):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        return is_lora_leaf(name)

    return jax.tree_util.tree_map_with_path(keep, params)


ALPHA_KEY = "__lora_alpha__"  # metadata entry in extracted adapter dicts


def extract_lora(params, alpha: float | None = None, *, cfg=None) -> Dict[str, np.ndarray]:
    """Pull only the adapter leaves out of a param tree -> flat {path: array} dict
    (the small thing worth checkpointing during a LoRA finetune).

    Records the finetune's ``alpha`` under ``ALPHA_KEY`` so a later merge_lora can't
    silently use a wrong scale. Pass ``alpha=`` explicitly or ``cfg=`` (a CLIPConfig,
    whose ``lora_alpha`` is read)."""
    flat = traverse_util.flatten_dict(params, sep="/")
    out = {k: np.asarray(v) for k, v in flat.items() if is_lora_leaf(k)}
    if alpha is None and cfg is not None:
        alpha = float(cfg.lora_alpha)
    if alpha is not None:
        out[ALPHA_KEY] = np.float32(alpha)
    return out

def load_lora(params, adapters: Dict[str, np.ndarray]):
    """Re-attach extracted adapters to a param tree (shapes must match the model's
    lora_rank). Unknown paths raise — a wrong-rank or wrong-model adapter set should
    never load silently."""
    flat = traverse_util.flatten_dict(params, sep="/")
    for k, v in adapters.items():
        if k == ALPHA_KEY:
            continue
        if k not in flat:
            raise KeyError(f"adapter leaf {k!r} not present in the model (wrong rank/model?)")
        if tuple(flat[k].shape) != tuple(v.shape):
            raise ValueError(f"adapter {k!r} shape {v.shape} != model {flat[k].shape}")
        flat[k] = jax.numpy.asarray(v)
    return traverse_util.unflatten_dict(flat, sep="/")


def merge_lora(params, alpha: float | None = None, *, cfg=None,
               adapters: Dict[str, np.ndarray] | None = None):
    """Fold every adapter pair into its kernel and DROP the lora leaves:
    kernel += (alpha / r) * lora_a @ lora_b  (r = lora_a.shape[1]).

    The result is loadable by the same architecture with lora_rank=0 — the
    ``merge_and_unload`` deployment path. ``alpha`` must match the finetune's
    --lora-alpha; supply it one of three ways: explicitly, via ``cfg=`` (CLIPConfig,
    reads ``lora_alpha``), or via ``adapters=`` (an extract_lora dict carrying
    ALPHA_KEY). Sources that disagree raise rather than merge wrongly.

    When ``adapters=`` is given its ADAPTER WEIGHTS are merged too: they are loaded
    into ``params`` (load_lora — unknown paths / wrong shapes raise) before folding,
    so merging a freshly-initialized tree with a trained extract_lora dict does the
    expected thing instead of folding the tree's own (zero) lora_b."""
    sources = {"alpha": alpha}
    if cfg is not None:
        sources["cfg.lora_alpha"] = float(cfg.lora_alpha)
    if adapters is not None and ALPHA_KEY in adapters:
        sources[f"adapters[{ALPHA_KEY}]"] = float(adapters[ALPHA_KEY])
    given = {k: v for k, v in sources.items() if v is not None}
    if not given:
        raise ValueError(
            "merge_lora needs the finetune's alpha: pass alpha=, cfg=, or an "
            "extract_lora(..., alpha=...) dict via adapters="
        )
    vals = set(float(v) for v in given.values())
    if len(vals) > 1:
        raise ValueError(f"conflicting lora alpha values: {given}")
    alpha = vals.pop()
    if adapters is not None:
        params = load_lora(params, adapters)
    flat = traverse_util.flatten_dict(params, sep="/")
    out = {}
    for k, v in flat.items():
        if is_lora_leaf(k):
            continue
        if k.endswith("kernel"):
            base = k[: -len("kernel")]
            a, b = flat.get(base + "lora_a"), flat.get(base + "lora_b")
            if a is not None and b is not None:
                r = a.shape[1]
                v = v + (alpha / r) * (a @ b)
        out[k] = v
    return traverse_util.unflatten_dict(out, sep="/")
