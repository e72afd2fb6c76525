"""Optimizer assembly: AdamW with weight-decay exclusion + grad clip + non-finite skip.

Counterpart of reference AlignCLIP/main/run.py:279-296: AdamW where gains/biases (ndim < 2)
and logit_scale are excluded from weight decay; GradScaler is unnecessary on TPU (bf16 needs
no loss scaling) — NaN robustness comes from optax.apply_if_finite, the analogue of the
reference notebooks' NaN-grad skip loops (trainer.ipynb:cell 19)."""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


class ClipAndSkipState(NamedTuple):
    grad_norm: jnp.ndarray  # pre-clip global norm (exposed for metrics — no extra pass)


def clip_and_skip_by_global_norm(
    clip_norm: Optional[float], skip_nonfinite: bool
) -> optax.GradientTransformation:
    """Global-norm clip + non-finite zeroing from ONE pass over the gradients.

    Replaces chaining optax.clip_by_global_norm (one norm pass) + a separate finite check
    (another pass): the squared-norm reduction is computed once; a non-finite norm means
    some element was non-finite (inf^2 or nan propagates), so scale becomes 0 — updates are
    zeroed and downstream adamw still runs but its state is frozen by skip_if_nonfinite's
    select. The norm is kept in the state so the train step can report it for free."""

    def init(params):
        del params
        return ClipAndSkipState(jnp.zeros((), jnp.float32))

    def update(updates, state, params=None):
        del params
        sq = sum(
            jnp.sum(jnp.square(u.astype(jnp.float32)))
            for u in jax.tree_util.tree_leaves(updates)
        )
        norm = jnp.sqrt(sq)
        scale = jnp.ones((), jnp.float32)
        if clip_norm is not None:
            scale = jnp.minimum(1.0, clip_norm / jnp.maximum(norm, 1e-12))
        if skip_nonfinite:
            scale = jnp.where(jnp.isfinite(norm), scale, 0.0)
        updates = jax.tree_util.tree_map(lambda u: u * scale.astype(u.dtype), updates)
        return updates, ClipAndSkipState(norm)

    return optax.GradientTransformation(init, update)


class SkipIfNonfiniteState(NamedTuple):
    inner_state: optax.OptState
    notfinite_count: jnp.ndarray


def _find_grad_norm(state_tree):
    """Locate a grad-norm-carrying state (ClipAndSkipState or FusedAdamWState) inside a
    (possibly nested) optax state tree — e.g. under optax.MaskedState for freeze modes."""
    found = []

    def visit(node):
        if isinstance(node, (ClipAndSkipState, FusedAdamWState)):
            found.append(node.grad_norm)
        elif isinstance(node, tuple):
            for child in node:
                visit(child)

    visit(state_tree)
    return found[0] if found else None


def extract_grad_norm(opt_state):
    """Pre-clip gradient norm of the last step, free of charge (no extra pass). Returns
    None when the optimizer carries no norm state."""
    if isinstance(opt_state, FusedAdamWState):
        return opt_state.grad_norm
    if isinstance(opt_state, SkipIfNonfiniteState):
        opt_state = opt_state.inner_state
    return _find_grad_norm(opt_state)


def skip_if_nonfinite(inner: optax.GradientTransformation) -> optax.GradientTransformation:
    """Exact step-skip on non-finite gradients with NO extra pass over the grads.

    optax.apply_if_finite emits a per-leaf isfinite reduction plus a lax.cond around the
    whole update — measured at ~28 ms/step (20%) for ViT-B/32 on v5e (100 tiny kernels).
    Here the finite flag comes from the global norm already computed by
    clip_and_skip_by_global_norm inside ``inner`` (a non-finite element makes the whole
    norm non-finite); the inner update always runs and scalar-predicate selects keep the
    old state / zero updates on a bad step — XLA fuses the selects into the update kernels.
    Falls back to computing the sum of squares itself if ``inner`` carries no norm state."""

    def init(params):
        return SkipIfNonfiniteState(inner.init(params), jnp.zeros((), jnp.int32))

    def update(updates, state, params=None):
        new_updates, new_inner = inner.update(updates, state.inner_state, params)
        norm = _find_grad_norm(new_inner)
        if norm is None:
            norm = sum(
                jnp.sum(jnp.square(u.astype(jnp.float32)))
                for u in jax.tree_util.tree_leaves(updates)
            )
        finite = jnp.isfinite(norm)
        pick = lambda a, b: jnp.where(finite, a, b)  # noqa: E731
        out_updates = jax.tree_util.tree_map(lambda u: pick(u, jnp.zeros_like(u)), new_updates)

        def pick_state(new, old):
            if isinstance(new, ClipAndSkipState):
                return new  # always keep the fresh norm so metrics show the bad value
            return jax.tree_util.tree_map(pick, new, old)

        out_inner = jax.tree_util.tree_map(
            pick_state, new_inner, state.inner_state,
            is_leaf=lambda x: isinstance(x, ClipAndSkipState),
        )
        count = jnp.where(finite, 0, state.notfinite_count + 1)
        return out_updates, SkipIfNonfiniteState(out_inner, count)

    return optax.GradientTransformation(init, update)


def wd_mask(params):
    """True where weight decay applies: ndim >= 2 and not the logit scale."""

    def is_decayed(path, leaf):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        return leaf.ndim >= 2 and "logit_scale" not in name

    return jax.tree_util.tree_map_with_path(is_decayed, params)


class FusedAdamWState(NamedTuple):
    count: jnp.ndarray
    mu: optax.Updates
    nu: optax.Updates
    grad_norm: jnp.ndarray
    notfinite_count: jnp.ndarray


def fused_adamw(
    schedule,
    *,
    weight_decay: float = 0.2,
    beta1: float = 0.9,
    beta2: float = 0.98,
    eps: float = 1e-6,
    grad_clip_norm: Optional[float] = None,
    skip_nonfinite: bool = True,
    state_dtype: jnp.dtype = jnp.float32,
) -> optax.GradientTransformation:
    """AdamW + global-norm clip + exact non-finite skip + weight-decay masking in ONE pass
    per parameter leaf.

    One tree pass builds the whole update expression per leaf (clip scale, moment updates,
    bias correction, masked weight decay, skip selects) with a single flat NamedTuple state.
    Measured perf-neutral vs the modular optax chain on v5e (XLA fuses the chain's stage
    boundaries too) — kept as the default for the simpler state layout, the free grad_norm/
    skip counters, and exact-parity tests against the optax reference
    (tests/test_fused_optimizer.py).

    ``state_dtype=bfloat16`` stores BOTH moments in bf16 (arithmetic stays f32): halves
    the optimizer-state HBM from 8 to 4 bytes/param — the difference between ViT-g/14's
    AdamW fitting a single 16 GB v5e or not. bf16's ~3 significant digits perturb the
    rsqrt(nu) step scale by well under 1%, the standard large-model tradeoff."""

    def init(params):
        return FusedAdamWState(
            count=jnp.zeros((), jnp.int32),
            mu=jax.tree_util.tree_map(lambda p: jnp.zeros_like(p, state_dtype), params),
            nu=jax.tree_util.tree_map(lambda p: jnp.zeros_like(p, state_dtype), params),
            grad_norm=jnp.zeros((), jnp.float32),
            notfinite_count=jnp.zeros((), jnp.int32),
        )

    def update(grads, state, params=None):
        assert params is not None, "fused_adamw needs params (weight decay)"
        sq = sum(
            jnp.sum(jnp.square(g.astype(jnp.float32)))
            for g in jax.tree_util.tree_leaves(grads)
        )
        norm = jnp.sqrt(sq)
        scale = jnp.ones((), jnp.float32)
        if grad_clip_norm is not None:
            scale = jnp.minimum(1.0, grad_clip_norm / jnp.maximum(norm, 1e-12))
        finite = jnp.isfinite(norm)
        if skip_nonfinite:
            scale = jnp.where(finite, scale, 0.0)  # zeroed grads on the bad step

        count = state.count + jnp.where(finite, 1, 0) if skip_nonfinite else state.count + 1
        # LR uses the pre-increment step (optax scale_by_schedule starts at schedule(0));
        # bias correction uses the post-increment count (optax scale_by_adam's count_inc)
        lr = schedule(state.count) if callable(schedule) else schedule
        c1 = 1.0 - beta1 ** count.astype(jnp.float32)
        c2 = 1.0 - beta2 ** count.astype(jnp.float32)
        decay_mask = wd_mask(params)

        def leaf(g, mu, nu, p, decayed):
            g = g.astype(jnp.float32) * scale
            mu_new = beta1 * mu.astype(jnp.float32) + (1.0 - beta1) * g
            nu_new = beta2 * nu.astype(jnp.float32) + (1.0 - beta2) * jnp.square(g)
            upd = (mu_new / c1) / (jnp.sqrt(nu_new / c2) + eps)
            if decayed:
                upd = upd + weight_decay * p.astype(jnp.float32)
            upd = -lr * upd
            mu_new = mu_new.astype(state_dtype)
            nu_new = nu_new.astype(state_dtype)
            if skip_nonfinite:
                # exact skip: moments frozen, update zeroed on the bad step
                mu_new = jnp.where(finite, mu_new, mu)
                nu_new = jnp.where(finite, nu_new, nu)
                upd = jnp.where(finite, upd, jnp.zeros_like(upd))
            return mu_new, nu_new, upd.astype(p.dtype)

        flat_g, treedef = jax.tree_util.tree_flatten(grads)
        flat_mu = treedef.flatten_up_to(state.mu)
        flat_nu = treedef.flatten_up_to(state.nu)
        flat_p = treedef.flatten_up_to(params)
        flat_mask = treedef.flatten_up_to(decay_mask)
        out = [leaf(g, m, n, p, d)
               for g, m, n, p, d in zip(flat_g, flat_mu, flat_nu, flat_p, flat_mask)]
        mu_new = jax.tree_util.tree_unflatten(treedef, [o[0] for o in out])
        nu_new = jax.tree_util.tree_unflatten(treedef, [o[1] for o in out])
        updates = jax.tree_util.tree_unflatten(treedef, [o[2] for o in out])
        notfinite = jnp.where(finite, 0, state.notfinite_count + 1) if skip_nonfinite \
            else state.notfinite_count
        return updates, FusedAdamWState(count, mu_new, nu_new, norm, notfinite)

    return optax.GradientTransformation(init, update)


def make_optimizer(
    schedule,
    weight_decay: float = 0.2,
    beta1: float = 0.9,
    beta2: float = 0.98,
    eps: float = 1e-6,
    grad_clip_norm: Optional[float] = None,
    skip_nonfinite: bool = True,
    max_consecutive_nonfinite: int = 100,
    fused: bool = True,
    opt: str = "adamw",
    state_dtype: jnp.dtype = jnp.float32,
):
    """Default: the single-pass fused AdamW (see fused_adamw). fused=False builds the
    modular optax chain with identical semantics — kept for composition with other optax
    transforms and as the numerical reference the fused path is tested against.

    opt: 'adamw' (the reference's optimizer, run.py:279-294) or the large-batch
    trust-ratio optimizers 'lamb' / 'lars' (beyond reference) — the standard choices
    when the global contrastive batch grows past what AdamW's LR tolerates; both reuse
    the gain/bias weight-decay exclusion mask and the clip/skip-nonfinite wrappers."""
    if jnp.dtype(state_dtype) != jnp.float32 and (opt != "adamw" or not fused):
        # only fused_adamw stores reduced-precision moments; anything else would keep
        # f32 state while the user believes they halved optimizer HBM — refuse loudly
        raise ValueError(
            f"--opt-state-dtype {jnp.dtype(state_dtype).name} is only honored by the "
            f"fused adamw path (got opt={opt!r}, fused={fused}); drop the flag or use "
            "the default optimizer"
        )
    if opt in ("lamb", "lars"):
        inner = (
            optax.lamb(learning_rate=schedule, b1=beta1, b2=beta2, eps=eps,
                       weight_decay=weight_decay, mask=wd_mask)
            if opt == "lamb"
            else optax.lars(learning_rate=schedule, weight_decay=weight_decay,
                            weight_decay_mask=wd_mask, trust_ratio_mask=wd_mask,
                            momentum=beta1)
        )
        tx = optax.chain(
            clip_and_skip_by_global_norm(grad_clip_norm, skip_nonfinite), inner
        )
        return skip_if_nonfinite(tx) if skip_nonfinite else tx
    if opt != "adamw":
        raise ValueError(f"unknown optimizer {opt!r} (adamw | lamb | lars)")
    if fused:
        return fused_adamw(
            schedule, weight_decay=weight_decay, beta1=beta1, beta2=beta2, eps=eps,
            grad_clip_norm=grad_clip_norm, skip_nonfinite=skip_nonfinite,
            state_dtype=state_dtype,
        )
    tx = optax.chain(
        # one pass computes the global norm, clips, and zeroes non-finite updates; the norm
        # is exposed via extract_grad_norm so the train step reports it without recomputing
        clip_and_skip_by_global_norm(grad_clip_norm, skip_nonfinite),
        optax.adamw(
            learning_rate=schedule,
            b1=beta1,
            b2=beta2,
            eps=eps,
            weight_decay=weight_decay,
            mask=wd_mask,
        ),
    )
    if skip_nonfinite:
        tx = skip_if_nonfinite(tx)
    return tx
