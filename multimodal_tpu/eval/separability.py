"""Modality-gap probe: train a linear classifier to distinguish image vs text embeddings.

Counterpart of reference metrics/linearSeparability.py:9-88 (full-batch logistic training;
accuracy -> 0.5 means the modalities are aligned/inseparable). Implemented as one jitted
lax.scan over full-batch gradient steps instead of a Python epoch loop."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def linear_separability(
    image_features,
    text_features,
    epochs: int = 1000,
    lr: float = 1e-2,
    seed: int = 0,
) -> float:
    """Returns classification accuracy of the trained linear probe (0.5 = inseparable)."""
    x = jnp.concatenate(
        [jnp.asarray(image_features, jnp.float32), jnp.asarray(text_features, jnp.float32)],
        axis=0,
    )
    y = jnp.concatenate(
        [jnp.zeros(len(image_features), jnp.int32), jnp.ones(len(text_features), jnp.int32)]
    )
    d = x.shape[-1]
    key = jax.random.PRNGKey(seed)
    w0 = jax.random.normal(key, (d, 2)) * 0.01
    b0 = jnp.zeros((2,))

    def loss_fn(wb):
        w, b = wb
        logits = x @ w + b
        return jnp.mean(
            -jax.nn.log_softmax(logits)[jnp.arange(x.shape[0]), y]
        )

    @jax.jit
    def train():
        def step(wb, _):
            g = jax.grad(loss_fn)(wb)
            return (wb[0] - lr * g[0], wb[1] - lr * g[1]), None

        (w, b), _ = jax.lax.scan(step, (w0, b0), None, length=epochs)
        logits = x @ w + b
        return jnp.mean((jnp.argmax(logits, axis=-1) == y).astype(jnp.float32))

    return float(train())
