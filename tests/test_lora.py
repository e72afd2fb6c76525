"""LoRA finetune path (--lora-rank; reference finetune.ipynb:cell 12 PEFT LoRA):
adapters train, base weights freeze, merge reproduces the adapted model lora-free."""

import dataclasses

import flax.traverse_util as tu
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_tpu.models import create_model, init_params
from multimodal_tpu.models.factory import example_inputs
from multimodal_tpu.models.lora import extract_lora, load_lora, lora_mask, merge_lora


@pytest.fixture(scope="module")
def lora_model():
    model = create_model("tiny-test", lora_rank=4, lora_alpha=8.0)
    return model, init_params(model)


def test_zero_init_is_noop(lora_model):
    model, params = lora_model
    base = create_model("tiny-test")
    bparams = init_params(base)
    # same init seed -> identical base leaves; B=0 makes the adapters a no-op at step 0
    imgs, toks = example_inputs(model.cfg)
    f = tu.flatten_dict(params["params"], sep="/")
    fb = tu.flatten_dict(bparams["params"], sep="/")
    for k, v in fb.items():
        f[k] = v
    out = model.apply({"params": tu.unflatten_dict(f, sep="/")}, imgs, toks)
    ref = base.apply(bparams, imgs, toks)
    np.testing.assert_allclose(
        np.asarray(out["image_features"]), np.asarray(ref["image_features"]), atol=1e-6
    )


def test_only_adapters_receive_updates(lora_model):
    """The full train step under --lora-rank: grads flow everywhere, but the masked
    optimizer updates ONLY lora_a/lora_b (+ logit_scale), allocates moments only for
    those leaves, and still reports a grad norm (computed over trainable grads only)."""
    from multimodal_tpu.train import TrainState, make_optimizer, make_train_step
    from multimodal_tpu.train.optimizer import extract_grad_norm
    from multimodal_tpu.train.run import _finetune_mask, freeze_optimizer

    model, params = lora_model
    tx = make_optimizer(1e-2, weight_decay=0.0, grad_clip_norm=1.0)
    masked, mask = _finetune_mask(params, "lora")
    tx = freeze_optimizer(tx, mask)
    state = TrainState.create(params, tx)
    # optax.masked allocates NO moments for frozen leaves: the optimizer state's leaf
    # count covers just the adapter pairs + logit_scale, not the full model
    n_trainable = sum(bool(m) for m in jax.tree_util.tree_leaves(mask))
    n_state_leaves = len([x for x in jax.tree_util.tree_leaves(state.opt_state)
                          if hasattr(x, "shape") and x.ndim > 0])
    assert n_state_leaves <= 2 * n_trainable, (
        f"optimizer state holds {n_state_leaves} array leaves for "
        f"{n_trainable} trainable params — moments allocated for frozen leaves?")
    step = make_train_step(model, tx, loss_type="clip", donate=False)
    c = model.cfg
    rng = jax.random.PRNGKey(0)
    batch = {
        "image": jax.random.normal(
            rng, (8, c.vision.image_size, c.vision.image_size, 3)),
        "text": jax.random.randint(rng, (8, c.text.context_length), 1, c.text.vocab_size),
    }
    new_state, metrics = step(state, batch, rng)
    assert np.isfinite(float(metrics["loss"]))
    before = tu.flatten_dict(params["params"], sep="/")
    after = tu.flatten_dict(jax.device_get(new_state.params)["params"], sep="/")
    changed = {k for k in before if not np.allclose(before[k], after[k])}
    trainable = {k for k in before
                 if k.endswith("lora_a") or k.endswith("lora_b") or "logit_scale" in k}
    assert changed, "nothing trained"
    assert changed <= trainable, f"frozen leaves moved: {sorted(changed - trainable)[:5]}"
    # lora_b starts at 0 but gets nonzero grads through lora_a's activations
    assert any(k.endswith("lora_b") for k in changed), "adapters did not train"
    # grad-norm metric survives the masked wrapper
    norm = extract_grad_norm(jax.device_get(new_state.opt_state))
    assert norm is not None and np.isfinite(float(norm)) and float(norm) > 0


def test_extract_load_merge_roundtrip(lora_model):
    model, params = lora_model
    rng = jax.random.PRNGKey(1)
    # give the adapters nonzero values so the merge actually changes the kernels
    f = tu.flatten_dict(params, sep="/")
    for k in f:
        if k.endswith("lora_a") or k.endswith("lora_b"):
            f[k] = jax.random.normal(jax.random.fold_in(rng, hash(k) % 2**31),
                                     f[k].shape) * 0.03
    params = tu.unflatten_dict(f, sep="/")
    imgs, toks = example_inputs(model.cfg)
    out = model.apply(params, imgs, toks)

    adapters = extract_lora(params)
    assert adapters and all(("lora_a" in k or "lora_b" in k) for k in adapters)
    reloaded = load_lora(init_params(model), adapters)
    out2 = model.apply(reloaded, imgs, toks)
    np.testing.assert_allclose(np.asarray(out["image_features"]),
                               np.asarray(out2["image_features"]), atol=1e-6)

    merged = merge_lora(params, alpha=8.0)
    base = create_model("tiny-test")
    out3 = base.apply(merged, imgs, toks)
    np.testing.assert_allclose(np.asarray(out["image_features"]),
                               np.asarray(out3["image_features"]), atol=1e-5)
    # wrong-rank adapters refuse to load
    wrong = {k: v[:, :2] if k.endswith("lora_a") else v for k, v in adapters.items()}
    with pytest.raises((KeyError, ValueError)):
        load_lora(init_params(model), wrong)


def test_pretrained_plus_lora(tmp_path, lora_model):
    """--lora-rank + --pretrained: a base (lora-free) checkpoint loads against a
    lora-bearing template — base weights come from the checkpoint, the freshly
    initialized adapters survive (finetune.ipynb: pretrained backbone + new PEFT
    adapters). Covers both the torch .pt and the orbax-dir formats."""
    import torch

    from multimodal_tpu.models.checkpoint_interop import (
        export_torch_state_dict, load_pretrained)

    model, params = lora_model
    base = create_model("tiny-test")
    bparams = init_params(base, jax.random.PRNGKey(123))  # distinct from template's init

    # torch .pt path
    sd = {k: torch.from_numpy(np.asarray(v)) for k, v in
          export_torch_state_dict(bparams, base.cfg).items()}
    pt = tmp_path / "base.pt"
    torch.save(sd, pt)
    loaded = load_pretrained(str(pt), params, model.cfg)
    lf = tu.flatten_dict(loaded, sep="/")
    bf = tu.flatten_dict(bparams, sep="/")
    pf = tu.flatten_dict(params, sep="/")
    for k, v in lf.items():
        if k.endswith("lora_a") or k.endswith("lora_b"):
            np.testing.assert_array_equal(np.asarray(v), np.asarray(pf[k]))
        else:
            np.testing.assert_allclose(np.asarray(v), np.asarray(bf[k]), atol=1e-6)

    # orbax directory path
    import orbax.checkpoint as ocp

    ckpt_dir = tmp_path / "orbax_base"
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(str(ckpt_dir.resolve()), bparams)
    ckptr.wait_until_finished()  # StandardCheckpointer saves async
    loaded2 = load_pretrained(str(ckpt_dir), params, model.cfg)
    lf2 = tu.flatten_dict(loaded2, sep="/")
    for k, v in lf2.items():
        ref = pf[k] if (k.endswith("lora_a") or k.endswith("lora_b")) else bf[k]
        np.testing.assert_allclose(np.asarray(v), np.asarray(ref), atol=1e-6)


def test_merge_alpha_sources(lora_model):
    """merge_lora refuses to merge without the finetune's alpha and raises on
    conflicting sources; extract_lora records alpha for the roundtrip."""
    model, params = lora_model
    with pytest.raises(ValueError, match="alpha"):
        merge_lora(params)  # no source at all
    adapters = extract_lora(params, cfg=model.cfg)  # records cfg.lora_alpha = 8.0
    with pytest.raises(ValueError, match="conflicting"):
        merge_lora(params, alpha=4.0, adapters=adapters)
    m1 = merge_lora(params, adapters=adapters)
    m2 = merge_lora(params, alpha=8.0)
    m3 = merge_lora(params, cfg=model.cfg)
    for a, b in ((m1, m2), (m1, m3)):
        jax.tree_util.tree_map(
            lambda x, y: np.testing.assert_array_equal(np.asarray(x), np.asarray(y)),
            a, b)


def test_opt_state_dtype_rejected_off_fused_path():
    """--opt-state-dtype bfloat16 with lamb/lars (or fused=False) must raise, not
    silently keep f32 moments."""
    from multimodal_tpu.train import make_optimizer

    for kw in ({"opt": "lamb"}, {"opt": "lars"}, {"fused": False}):
        with pytest.raises(ValueError, match="opt-state-dtype"):
            make_optimizer(1e-3, state_dtype=jnp.bfloat16, **kw)
    make_optimizer(1e-3, state_dtype=jnp.bfloat16)  # fused adamw path: fine


def test_cli_flag_smoke(tmp_path):
    """--lora-rank end to end through train.run on synthetic data (1 step)."""
    from multimodal_tpu.train.run import main

    main([
        "--model", "tiny-test", "--dataset-type", "synthetic", "--epochs", "1",
        "--steps-per-epoch", "2", "--batch-size", "8", "--lora-rank", "2",
        "--precision", "fp32", "--logs", str(tmp_path), "--name", "lora-smoke",
        "--report-to", "none",
    ])
