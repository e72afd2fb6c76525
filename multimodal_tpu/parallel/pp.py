"""Pipeline parallelism: stage-sharded transformer blocks, GPipe microbatch schedule.

The reference never pipelines (its models fit one GPU; SURVEY §2c). This is the scale-out
mode for models whose LAYERS don't fit a chip: shard the stacked per-block parameters over a
``stage`` mesh axis (dim 0 of every stacked leaf), keep microbatch activations flowing
around the stage ring with ``lax.ppermute``, and let each stage apply only its resident
blocks. The schedule is plain GPipe: with M microbatches and S stages the loop runs
M + S - 1 ticks; stage s works on microbatch t - s at tick t, so all stages are busy in the
steady state and the bubble fraction is (S-1)/(M+S-1).

TPU-first specifics:
  * the per-stage block stack is applied with ``lax.scan`` over the leading (layer) axis —
    one compiled block body per stage, not L unrolled copies;
  * the stage handoff is a single ppermute of the [mb, S_seq, W] activation — rides ICI,
    overlaps with the next tick's compute under XLA's async collectives;
  * everything is differentiable: the VJP of the ppermute chain IS the reverse schedule
    (backward bubble included), so ``jax.grad`` of a pipelined loss produces 1F1B-shaped
    communication without any hand-written backward.

Composes with the ``data`` axis: mesh ('data', 'stage'), batch sharded over data, block
stacks sharded over stage, stems/heads replicated.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

STAGE_AXIS = "stage"


def stack_block_params(tower_params: dict, prefix: str = "resblock_"):
    """Stack a tower's per-block subtrees {resblock_0..L-1} into one [L, ...] tree.

    Returns (stacked_tree, rest) where ``rest`` holds the tower's non-block entries
    unchanged. The stacked tree's dim 0 is the layer axis — shard it over 'stage'.
    """
    names = sorted(
        (k for k in tower_params if k.startswith(prefix)),
        key=lambda k: int(k[len(prefix):]),
    )
    assert names, f"no {prefix}* entries in tower params"
    blocks = [tower_params[k] for k in names]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)
    rest = {k: v for k, v in tower_params.items() if k not in names}
    return stacked, rest


def unstack_block_params(stacked, prefix: str = "resblock_") -> dict:
    """Inverse of stack_block_params: [L, ...] tree -> {resblock_i: ...}."""
    leaves = jax.tree_util.tree_leaves(stacked)
    num = leaves[0].shape[0]
    return {
        f"{prefix}{i}": jax.tree_util.tree_map(lambda x, i=i: x[i], stacked)
        for i in range(num)
    }


def _varying(x, axis_name):
    """Type ``x`` as device-varying over ``axis_name`` (JAX >= 0.9 vma typing)."""
    if hasattr(jax.lax, "pcast"):
        return jax.lax.pcast(x, (axis_name,), to="varying")
    return x


def pipeline_blocks(
    block_apply: Callable,
    stacked_local,
    x_microbatches,
    axis_name: str = STAGE_AXIS,
):
    """Run microbatches through stage-sharded blocks with the GPipe schedule.

    Must be called inside shard_map with ``axis_name`` in the mesh. ``stacked_local`` is
    this stage's [L/S, ...] slice of the stacked block tree; ``block_apply(block_params, x)
    -> x`` applies ONE block. ``x_microbatches``: [M, mb, ...] activations (each stage holds
    the same M microbatches of its data-shard; only stage 0's copy enters the pipeline).

    Returns [M, mb, ...] outputs, valid on EVERY stage (the last stage's results are
    broadcast back with a psum — cheap relative to the block compute, and it keeps the
    downstream loss SPMD so jax.grad works unchanged).
    """
    n_stages = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    m = x_microbatches.shape[0]
    ticks = m + n_stages - 1
    perm = [(i, i + 1) for i in range(n_stages - 1)]

    def apply_local(x):
        def body(x, bp):
            return block_apply(bp, x), None

        x, _ = jax.lax.scan(body, x, stacked_local)
        return x

    def tick(state, t):
        # stage 0 ingests microbatch t (clipped: tail ticks re-feed the last microbatch,
        # whose results never reach the output — they drain before stage S-1)
        inp = jax.lax.dynamic_index_in_dim(
            x_microbatches, jnp.clip(t, 0, m - 1), 0, keepdims=False
        )
        cur = jnp.where(idx == 0, inp, state)
        cur = apply_local(cur)
        nxt = jax.lax.ppermute(cur, axis_name, perm)
        return nxt, cur

    state0 = _varying(jnp.zeros_like(x_microbatches[0]), axis_name)
    _, ys = jax.lax.scan(tick, state0, jnp.arange(ticks))
    # stage S-1 finishes microbatch t-(S-1) at tick t -> its ys[S-1:] are outputs 0..M-1
    outs = ys[n_stages - 1:]
    outs = jnp.where(idx == n_stages - 1, outs, jnp.zeros_like(outs))
    return jax.lax.psum(outs, axis_name)


def pp_state_shardings(state, mesh: Mesh, stacked_paths=("visual_blocks", "text_blocks")):
    """NamedSharding tree: stacked block leaves shard dim 0 over 'stage', rest replicated."""

    def spec(path, leaf):
        parts = [str(getattr(k, "key", k)) for k in path]
        if any(p in stacked_paths for p in parts) and getattr(leaf, "ndim", 0) >= 1:
            return NamedSharding(mesh, P(STAGE_AXIS))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec, state)


def to_pipeline_params(params, towers=("visual_transformer", "text_transformer")):
    """Rewrite a CLIP params tree: each tower's resblock_i subtrees -> one stacked entry.

    {'params': {'visual_transformer': {'resblock_0': ...}, ...}} becomes
    {'params': {..., 'visual_blocks': stacked, 'visual_transformer': rest}} so the stacked
    leaves can be stage-sharded while every other leaf keeps its name (checkpoint interop:
    run from_pipeline_params before saving).
    """
    p = dict(params["params"])
    out = {"params": p}
    for tower, stacked_name in zip(towers, ("visual_blocks", "text_blocks")):
        stacked, rest = stack_block_params(dict(p[tower]))
        p[tower] = rest
        p[stacked_name] = stacked
    return out


def from_pipeline_params(params, towers=("visual_transformer", "text_transformer")):
    """Inverse of to_pipeline_params."""
    p = dict(params["params"])
    for tower, stacked_name in zip(towers, ("visual_blocks", "text_blocks")):
        rest = dict(p[tower])
        rest.update(unstack_block_params(p.pop(stacked_name)))
        p[tower] = rest
    return {"params": p}


def pp_param_specs(params):
    """PartitionSpec tree for pipeline-form params (shard_map in_specs)."""

    def spec(path, leaf):
        parts = [str(getattr(k, "key", k)) for k in path]
        if any(p in ("visual_blocks", "text_blocks") for p in parts) and getattr(
            leaf, "ndim", 0
        ) >= 1:
            return P(STAGE_AXIS)
        return P()

    return jax.tree_util.tree_map_with_path(spec, params)


def create_pp_mesh(data: int, stages: int, devices=None) -> Mesh:
    import numpy as np

    devices = devices if devices is not None else jax.devices()
    assert data * stages <= len(devices), f"need {data * stages} devices"
    arr = np.asarray(devices[: data * stages]).reshape(data, stages)
    return Mesh(arr, ("data", STAGE_AXIS))


def make_pp_train_step(model, tx, *, mesh: Mesh, num_microbatches: int = 2,
                       label_smoothing: float = 0.0, donate: bool = False,
                       ema_decay=None):
    """Jitted CLIP train step with BOTH tower trunks pipelined over the 'stage' axis.

    The state holds pipeline-form params (to_pipeline_params): stems/heads replicated,
    stacked block trees sharded on the layer axis over 'stage'; batch sharded over 'data'.
    Numerically identical to the DP step (same loss, same updates) — tested — because the
    schedule only reorders the block applications. Two-tower non-variational CLIP with
    CLS or mean pooling (clip.py:284-320 tail recomputed here on the pipeline outputs).
    """
    import optax

    from multimodal_tpu.losses import clip_loss
    from multimodal_tpu.models.clip import _resolve_act
    from multimodal_tpu.models.layers import ResidualBlock
    from multimodal_tpu.ops.block_attention import _ln_rows
    from multimodal_tpu.ops.sphere import l2_normalize
    from multimodal_tpu.train.engine import TrainState, _clamp_logit_scale, batch_images

    c = model.cfg
    assert not c.share_trunk and not c.vision.attentional_pool, (
        "pipeline step covers the two-tower CLIP family"
    )
    assert c.vision.moe_experts == 0, (
        "pipeline step does not cover MoE trunks: MoE blocks have a different param "
        "structure, so the per-block stacking (stack_block_params) cannot shard them "
        "over 'stage' — use expert parallelism (parallel/ep.py) for MoE models"
    )
    vis_block = ResidualBlock(
        c.vision.width, c.vision.heads, c.vision.mlp_ratio, causal=False,
        act=_resolve_act(c.act), dtype=model.dtype, depth=c.vision.layers,
        ls_init_value=c.vision.ls_init_value, scaled_cosine=c.vision.scaled_cosine,
        scale_heads=c.vision.scale_heads,
    )
    txt_block = ResidualBlock(
        c.text.width, c.text.heads, c.text.mlp_ratio, causal=True,
        act=_resolve_act(c.act), dtype=model.dtype, depth=c.text.layers,
        ls_init_value=c.text.ls_init_value,
    )

    def _ln(p, x):
        inner = p["LayerNorm_0"]
        return _ln_rows(x, inner["scale"], inner["bias"], 1e-5)

    def _microbatch(x, m):
        return x.reshape((m, x.shape[0] // m) + x.shape[1:])

    def local_loss_fn(params, batch, rng):
        p = params["params"]
        images, tokens = batch_images(batch), batch["text"]
        bl = images.shape[0]

        v_in = model.apply(
            {"params": p}, images, train=True, rngs={"patch_dropout": rng},
            method=lambda m, img, train: m.visual_stem(img, train=train),
        )
        v_out = pipeline_blocks(
            lambda bp, x: vis_block.apply({"params": bp}, x),
            p["visual_blocks"], _microbatch(v_in, num_microbatches),
        ).reshape(bl, *v_in.shape[1:])
        # pooling before ln_post, matching CLIP._pool_image (clip.py:296-303)
        v_pool = (jnp.mean(v_out, axis=1) if c.vision.global_average_pool
                  else v_out[:, 0])
        fi = _ln(p["ln_post"], v_pool).astype(jnp.float32) @ p["visual_projection"]

        t_in = model.apply(
            {"params": p}, tokens, method=lambda m, tok: m.text_stem(tok)
        )
        t_out = pipeline_blocks(
            lambda bp, x: txt_block.apply({"params": bp}, x),
            p["text_blocks"], _microbatch(t_in, num_microbatches),
        ).reshape(bl, *t_in.shape[1:])
        eot = jnp.take_along_axis(
            t_out, jnp.argmax(tokens, axis=-1)[:, None, None], axis=1
        )[:, 0]
        ft = _ln(p["ln_final"], eot).astype(jnp.float32) @ p["text_projection"]

        # clip_loss already pmeans over axis_name internally — this is the global loss
        return clip_loss(
            l2_normalize(fi), l2_normalize(ft), p["logit_scale"],
            label_smoothing=label_smoothing, normalize=False,
            axis_name="data", local_loss=True,
        )

    def step_fn(state: TrainState, batch, rng):
        specs = pp_param_specs(state.params)

        def loss_fn(params):
            return jax.shard_map(
                local_loss_fn, mesh=mesh,
                in_specs=(specs, P("data"), P()), out_specs=P(),
            )(params, batch, rng)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_params = _clamp_logit_scale(new_params)
        new_ema = state.ema_params  # preserved (and updated) like the engine step
        if ema_decay is not None and state.ema_params is not None:
            d = jnp.minimum(ema_decay, (1.0 + state.step) / (10.0 + state.step))
            new_ema = jax.tree_util.tree_map(
                lambda e, q: e * d + q.astype(e.dtype) * (1.0 - d),
                state.ema_params, new_params,
            )
        new_state = TrainState(step=state.step + 1, params=new_params,
                               opt_state=new_opt_state, ema_params=new_ema)
        return new_state, {"loss": loss}

    jit_kwargs = {}
    if donate:
        jit_kwargs["donate_argnums"] = (0,)
    return jax.jit(step_fn, **jit_kwargs)
