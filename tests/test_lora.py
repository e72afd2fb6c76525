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
    optimizer updates ONLY lora_a/lora_b (+ logit_scale)."""
    import optax

    from multimodal_tpu.train import TrainState, make_optimizer, make_train_step
    from multimodal_tpu.train.run import _finetune_mask

    model, params = lora_model
    tx = make_optimizer(1e-2, weight_decay=0.0, grad_clip_norm=1.0)
    masked, mask = _finetune_mask(params, "lora")
    tx = optax.chain(
        tx, masked(optax.set_to_zero(), jax.tree_util.tree_map(lambda m: not m, mask))
    )
    state = TrainState.create(params, tx)
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


def test_cli_flag_smoke(tmp_path):
    """--lora-rank end to end through train.run on synthetic data (1 step)."""
    from multimodal_tpu.train.run import main

    main([
        "--model", "tiny-test", "--dataset-type", "synthetic", "--epochs", "1",
        "--steps-per-epoch", "2", "--batch-size", "8", "--lora-rank", "2",
        "--precision", "fp32", "--logs", str(tmp_path), "--name", "lora-smoke",
        "--report-to", "none",
    ])
