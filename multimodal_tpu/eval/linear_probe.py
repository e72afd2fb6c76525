"""Linear probing: logistic regression on frozen features.

Counterpart of reference main/linear_probing.py:11-114 (LogisticRegression head, AdamW +
cosine LR, accuracy or mean-per-class accuracy). One jitted scan over full-batch steps."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from multimodal_tpu.train.schedules import cosine_lr


def train_linear_probe(
    train_features,
    train_labels,
    num_classes: int,
    *,
    epochs: int = 100,
    lr: float = 1e-3,
    weight_decay: float = 0.0,
    batch_size: int = 4096,
    seed: int = 0,
):
    """Returns (w [D,C], b [C]) trained with AdamW + cosine schedule."""
    x = jnp.asarray(train_features, jnp.float32)
    y = jnp.asarray(train_labels, jnp.int32)
    n, d = x.shape
    steps_per_epoch = max(n // min(batch_size, n), 1)
    total_steps = epochs * steps_per_epoch
    tx = optax.adamw(cosine_lr(lr, max(total_steps // 20, 1), total_steps), weight_decay=weight_decay)
    key = jax.random.PRNGKey(seed)
    params = {"w": jax.random.normal(key, (d, num_classes)) * 0.01, "b": jnp.zeros((num_classes,))}
    opt_state = tx.init(params)
    bs = min(batch_size, n)

    def loss_fn(p, xb, yb):
        logits = xb @ p["w"] + p["b"]
        return jnp.mean(-jax.nn.log_softmax(logits)[jnp.arange(xb.shape[0]), yb])

    @jax.jit
    def run(params, opt_state, key):
        def step(carry, _):
            params, opt_state, key = carry
            key, sub = jax.random.split(key)
            idx = jax.random.randint(sub, (bs,), 0, n)
            g = jax.grad(loss_fn)(params, x[idx], y[idx])
            updates, opt_state = tx.update(g, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, key), None

        (params, opt_state, _), _ = jax.lax.scan(
            step, (params, opt_state, key), None, length=total_steps
        )
        return params

    return run(params, opt_state, key)


def probe_accuracy(params, features, labels, mean_per_class: bool = False) -> float:
    """Accuracy, or mean-per-class accuracy (linear_probing.py:96-110)."""
    logits = np.asarray(jnp.asarray(features, jnp.float32) @ params["w"] + params["b"])
    preds = logits.argmax(axis=-1)
    labels = np.asarray(labels)
    if not mean_per_class:
        return float((preds == labels).mean())
    accs = []
    for c in np.unique(labels):
        m = labels == c
        accs.append(float((preds[m] == c).mean()))
    return float(np.mean(accs))


def linear_probe_metrics(
    train_features, train_labels, test_features, test_labels, num_classes: int, **kw
) -> dict:
    params = train_linear_probe(train_features, train_labels, num_classes, **kw)
    return {
        "linear_probe_accuracy": probe_accuracy(params, test_features, test_labels),
        "linear_probe_mean_per_class": probe_accuracy(
            params, test_features, test_labels, mean_per_class=True
        ),
    }
