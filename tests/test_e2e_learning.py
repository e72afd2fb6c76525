"""End-to-end learning regression: the full stack (data -> sharded train step -> eval) must
actually LEARN a learnable image<->caption mapping, not just run.

Eight color classes: images are solid-color frames (uint8, the production wire format),
captions are distinct token patterns. After a few hundred sharded steps, paired retrieval
R@1 on held-out samples must be far above the 1/8 chance level. This is the framework's
equivalent of the reference's notebook sanity runs (finetune.ipynb) as a deterministic test."""

import numpy as np
import pytest

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from multimodal_tpu.eval.retrieval import get_clip_metrics
from multimodal_tpu.models import add_model_config, create_model, init_params
from multimodal_tpu.parallel import create_mesh, shard_batch
from multimodal_tpu.train import TrainState, make_optimizer, make_schedule, make_train_step

add_model_config(
    "tiny-e2e",
    {
        "embed_dim": 32,
        "vision_cfg": {"image_size": 32, "patch_size": 8, "width": 64, "layers": 2, "heads": 2},
        "text_cfg": {"context_length": 8, "vocab_size": 64, "width": 64, "layers": 2, "heads": 2},
    },
)

COLORS = np.array([
    [255, 0, 0], [0, 255, 0], [0, 0, 255], [255, 255, 0],
    [255, 0, 255], [0, 255, 255], [255, 128, 0], [128, 0, 255],
], np.uint8)


def _batch(rng, b=32):
    cls = rng.integers(0, len(COLORS), b)
    images = np.zeros((b, 32, 32, 3), np.uint8)
    images[:] = COLORS[cls][:, None, None, :]
    images = np.clip(
        images.astype(np.int16) + rng.integers(-20, 20, images.shape), 0, 255
    ).astype(np.uint8)
    text = np.zeros((b, 8), np.int32)
    text[:, 0] = 62  # SOT-like
    text[:, 1] = 10 + cls  # the class token
    text[:, 2] = 63  # EOT-like (argmax pooling target)
    return {"image": images, "text": text}, cls


@pytest.mark.slow
def test_framework_learns_color_retrieval():
    model = create_model("tiny-e2e")
    params = init_params(model)
    tx = make_optimizer(make_schedule("cosine", 3e-3, warmup_steps=10, total_steps=300),
                        weight_decay=0.01, grad_clip_norm=1.0)
    state = TrainState.create(params, tx)
    mesh = create_mesh()
    state = jax.device_put(state, NamedSharding(mesh, P()))
    step = make_train_step(model, tx, loss_type="clip", mesh=mesh, use_shard_map=True,
                           donate=False)

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    first = last = None
    for i in range(300):
        batch, _ = _batch(rng)
        key, sub = jax.random.split(key)
        state, m = step(state, shard_batch(batch, mesh), sub)
        if i == 0:
            first = float(m["loss"])
        last = float(m["loss"])
    assert np.isfinite(last)
    assert last < first * 0.5, f"loss did not drop: {first} -> {last}"

    # held-out eval: paired retrieval must crush the 1/8 chance level.
    # images go through the same uint8 -> normalized prolog as training.
    from multimodal_tpu.train.engine import batch_images

    test_batch, cls = _batch(np.random.default_rng(123), b=64)
    out = model.apply(jax.device_get(state.params), batch_images(test_batch),
                      test_batch["text"], normalize=True)
    metrics = get_clip_metrics(np.asarray(out["image_features"]),
                               np.asarray(out["text_features"]))
    # same-class captions are interchangeable, so grade by class match at rank 1
    img = np.asarray(out["image_features"])
    txt = np.asarray(out["text_features"])
    top1 = (img @ txt.T).argmax(axis=1)
    class_match = (cls[top1] == cls).mean()
    assert class_match > 0.9, f"rank-1 class accuracy {class_match}; metrics {metrics}"
