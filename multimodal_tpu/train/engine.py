"""Training engine: jitted sharded train steps for every loss family.

Counterpart of reference AlignCLIP/main/train.py:65-239 (train_one_epoch internals) and the
notebook train loops (trainer.ipynb:cell 19), redesigned for XLA:

  * one jitted ``train_step(state, batch, rng)`` — forward, loss, grad, clip, AdamW update,
    post-step logit_scale clamp to [0, ln 100] (train.py:181-182) — no Python in the hot loop;
  * data parallelism by sharding constraint: params replicated, batch sharded over the
    ``data`` mesh axis; XLA inserts the feature all-gather for the global contrastive loss.
    An explicit shard_map variant computes the local_loss form (local@global logits with
    axis-offset labels) for ICI-optimal scaling;
  * gradient accumulation in two forms (SURVEY §2c.3): plain micro-batch averaging via
    lax.scan, and OpenCLIP's feature-cached accumulation (train.py:119-163) that enlarges the
    effective contrastive batch — phase 1 caches stop-grad features of all micro-batches,
    phase 2 re-forwards each micro-batch with the others as negatives and accumulates exact
    full-batch gradients;
  * NaN robustness via a single-pass non-finite step skip (optimizer.skip_if_nonfinite —
    replaces the reference's NaN-skip loops).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import NamedSharding, PartitionSpec as P

from multimodal_tpu.data.preprocess import normalize_images
from multimodal_tpu.distributions import PowerSpherical, VonMisesFisher
from multimodal_tpu.distributions.normal import NormalDiag
from multimodal_tpu.losses import align_clip_loss, clip_loss, cloob_loss, vclip_loss
from multimodal_tpu.models.clip import LOGIT_SCALE_MAX
from multimodal_tpu.ops.sphere import l2_normalize

DATA_AXIS = "data"


def batch_images(batch, model=None, wire_size=None):
    """Device-side input prolog: uint8 batches (the native pipeline's wire format — 4x less
    host->device traffic) are normalized in XLA; float batches pass through already
    normalized.

    ``wire_size`` opts into the --wire-size low-bandwidth format: the host ships crops at
    a smaller source resolution (e.g. 128 px for a 224-px model — another 3.1x less
    host->device traffic) and the upsample to model resolution runs HERE as an XLA bicubic
    resize fused into the step prolog: resolution recovery costs MXU-adjacent compute
    instead of wire bandwidth. The resize is gated on an EXPLICIT wire_size — a batch
    whose spatial size differs from the model's image_size without one is a configuration
    error (e.g. data decoded at a size the model was not built for) and raises instead of
    silently training on upsampled data."""
    img = batch["image"]
    if img.dtype == jnp.uint8:
        img = normalize_images(img)
    target = getattr(getattr(getattr(model, "cfg", None), "vision", None),
                     "image_size", None)
    if target and img.shape[1] != target:
        if wire_size is None:
            raise ValueError(
                f"batch images are {img.shape[1]}px but the model expects {target}px — "
                "pass --wire-size to opt into the on-device upsample, or decode the data "
                "at the model's resolution (--force-image-size rebuilds the model at the "
                "forced size)"
            )
        if img.shape[1] != wire_size:
            raise ValueError(
                f"batch images are {img.shape[1]}px but --wire-size is {wire_size}"
            )
        img = jax.image.resize(
            img.astype(jnp.float32),
            (img.shape[0], target, target, img.shape[-1]), method="bicubic",
        )
    return img


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any
    # exponential moving average of params (beyond reference, --model-ema); None = off.
    # A None field holds no pytree leaves, so checkpoints/shardings are unchanged when off
    ema_params: Any = None

    @classmethod
    def create(cls, params, tx, ema: bool = False):
        # the EMA starts as a COPY: aliasing the param buffers would double-donate them
        # in the jitted step (donate_argnums covers the whole state)
        ema_params = jax.tree_util.tree_map(jnp.copy, params) if ema else None
        return cls(step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params),
                   ema_params=ema_params)


def _move_moments(opt_state, sharding):
    """device_put the fused-AdamW moment trees (mu/nu) to ``sharding`` — the in-step
    half of optimizer-state host offload (parallel/offload.py holds the between-step
    placement). Walks wrapper NamedTuples (MaskedState, SkipIfNonfiniteState, chains)."""
    from multimodal_tpu.train.optimizer import FusedAdamWState

    def visit(node):
        if isinstance(node, FusedAdamWState):
            move = lambda t: jax.tree_util.tree_map(  # noqa: E731
                lambda x: jax.device_put(x, sharding), t)
            return node._replace(mu=move(node.mu), nu=move(node.nu))
        if isinstance(node, tuple) and type(node) is not tuple:
            return type(node)(*(visit(c) for c in node))
        if isinstance(node, tuple):
            return tuple(visit(c) for c in node)
        return node

    return visit(opt_state)


def global_norm(tree):
    return jnp.sqrt(
        sum(jnp.sum(jnp.square(x.astype(jnp.float32))) for x in jax.tree_util.tree_leaves(tree))
    )


def _clamp_logit_scale(params):
    """Post-step clamp logit_scale to [0, ln(100)] (train.py:181-182)."""

    def clamp(path, leaf):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        if "logit_scale" in name:
            return jnp.clip(leaf, 0.0, LOGIT_SCALE_MAX)
        return leaf

    return jax.tree_util.tree_map_with_path(clamp, params)


def make_loss_fn(
    model,
    loss_type: str = "clip",
    loss_kwargs: Optional[dict] = None,
    wire_size: Optional[int] = None,
) -> Callable:
    """Build loss_fn(params, batch, rng, axis_name) -> (loss, metrics) for a loss family.

    loss_type: 'clip' | 'cloob' | 'align' | 'vclip' (the four reference losses, SURVEY §2a)
    or 'siglip' (pairwise sigmoid, beyond reference).
    """
    kw = dict(loss_kwargs or {})

    if loss_type == "clip":
        label_smoothing = kw.pop("label_smoothing", 0.0)
        local_loss = kw.pop("local_loss", True)
        # contrastive_impl: 'dense' (local@global block), 'chunked' (streaming logsumexp over
        # column chunks), 'ring' (ppermute-streamed, no all-gather) — losses/global_contrastive
        impl = kw.pop("contrastive_impl", "dense")
        chunk_size = kw.pop("chunk_size", 1024)
        # MoE configs sow per-layer load-balance terms (models/moe.py); collect them here
        moe_aux_weight = kw.pop("moe_aux_weight", 0.01)
        has_moe = getattr(getattr(model, "cfg", None), "vision", None) is not None and (
            model.cfg.vision.moe_experts > 0
        )

        def loss_fn(params, batch, rng, axis_name=None):
            moe_aux = None
            if has_moe:
                from multimodal_tpu.models.moe import collect_moe_losses

                out, mutated = model.apply(
                    params, batch_images(batch, model, wire_size), batch["text"], train=True,
                    rngs={"patch_dropout": rng}, mutable=["moe_losses"],
                )
                moe_aux = collect_moe_losses(mutated)
            else:
                out = model.apply(
                    params, batch_images(batch, model, wire_size), batch["text"], train=True,
                    rngs={"patch_dropout": rng},
                )
            fi, ft, ls = out["image_features"], out["text_features"], out["logit_scale"]
            if impl == "ring" and axis_name is not None:
                from multimodal_tpu.losses.global_contrastive import ring_clip_loss

                loss = ring_clip_loss(fi, ft, ls, axis_name, normalize=False,
                                      label_smoothing=label_smoothing, **kw)
            elif impl == "chunked":
                from multimodal_tpu.losses.global_contrastive import chunked_clip_loss

                loss = chunked_clip_loss(
                    fi, ft, ls, chunk_size=chunk_size, label_smoothing=label_smoothing,
                    normalize=False, axis_name=axis_name, **kw,
                )
            else:
                loss = clip_loss(
                    fi, ft, ls,
                    label_smoothing=label_smoothing,
                    normalize=False,
                    axis_name=axis_name,
                    local_loss=local_loss,
                    **kw,
                )
            metrics = {"loss": loss, "logit_scale": ls}
            if moe_aux is not None:
                loss = loss + moe_aux_weight * moe_aux
                metrics["moe_aux_loss"] = moe_aux
                metrics["loss"] = loss
            return loss, metrics

        return loss_fn

    if loss_type == "siglip":
        # SigLIP (beyond reference): pairwise sigmoid; requires a model built with
        # logit_bias_init (factory: create_model(..., siglip=True)). Inside shard_map the
        # loss streams text blocks around the ring — exact with no all-gather.
        if getattr(getattr(model, "cfg", None), "logit_bias_init", None) is None:
            raise ValueError(
                "loss_type='siglip' needs a model with a logit_bias param — create it "
                "with create_model(..., siglip=True) or cfg.logit_bias_init set"
            )

        def loss_fn(params, batch, rng, axis_name=None):
            out = model.apply(
                params, batch_images(batch, model, wire_size), batch["text"], train=True,
                rngs={"patch_dropout": rng},
            )
            from multimodal_tpu.losses.siglip_loss import siglip_loss

            loss = siglip_loss(
                out["image_features"], out["text_features"],
                out["logit_scale"], out["logit_bias"],
                normalize=False, axis_name=axis_name, **kw,
            )
            return loss, {"loss": loss, "logit_scale": out["logit_scale"],
                          "logit_bias": out["logit_bias"]}

        return loss_fn

    if loss_type == "cloob":
        inv_tau = kw.pop("inv_tau", 30.0)
        scale_hopfield = kw.pop("scale_hopfield", 8.0)

        def loss_fn(params, batch, rng, axis_name=None):
            out = model.apply(
                params, batch_images(batch, model, wire_size), batch["text"], train=True,
                rngs={"patch_dropout": rng},
            )
            img, txt = out["image_features"], out["text_features"]
            if axis_name is not None:
                img = jax.lax.all_gather(img, axis_name, axis=0, tiled=True)
                txt = jax.lax.all_gather(txt, axis_name, axis=0, tiled=True)
            loss = cloob_loss(img, txt, inv_tau=inv_tau, scale_hopfield=scale_hopfield)
            return loss, {"loss": loss}

        return loss_fn

    if loss_type == "align":

        def loss_fn(params, batch, rng, axis_name=None):
            out = model.apply(
                params, batch_images(batch, model, wire_size), batch["text"], train=True,
                rngs={"patch_dropout": rng},
            )
            res = align_clip_loss(
                out["image_features"],
                out["text_features"],
                out["logit_scale"],
                semantic_features=batch.get("semantic"),
                normalize=False,
                axis_name=axis_name,
                **kw,
            )
            return res["total_loss"], {"loss": res["total_loss"], **res}

        return loss_fn

    if loss_type == "vclip":
        dist_type = kw.pop("distribution_type", "power_spherical")
        # Riemannian mean-grad projection (trainer.ipynb train_epoch's register_hook):
        # gate on per-epoch schedule from the CLI (on after KL warmup completes)
        riemannian = kw.pop("riemannian", False)

        def loss_fn(params, batch, rng, axis_name=None):
            rng, dropout_rng = jax.random.split(rng)
            out = model.apply(
                params, batch_images(batch, model, wire_size), batch["text"], train=True,
                rngs={"patch_dropout": dropout_rng},
            )
            mu_i = l2_normalize(out["image_mean"])
            mu_t = l2_normalize(out["text_mean"])
            if riemannian:
                from multimodal_tpu.ops.sphere import riemannian_grad

                mu_i = riemannian_grad(mu_i)
                mu_t = riemannian_grad(mu_t)
            conc_i, conc_t = out["image_concentration"], out["text_concentration"]
            if dist_type == "power_spherical":
                di, dt = PowerSpherical(mu_i, conc_i), PowerSpherical(mu_t, conc_t)
            elif dist_type == "vmf":
                di, dt = VonMisesFisher(mu_i, conc_i), VonMisesFisher(mu_t, conc_t)
            elif dist_type == "normal":
                di = NormalDiag(out["image_mean"], jnp.sqrt(conc_i))
                dt = NormalDiag(out["text_mean"], jnp.sqrt(conc_t))
            else:
                raise ValueError(dist_type)
            res = vclip_loss(
                di, dt, conc_i, conc_t, out["logit_scale"], key=rng, **kw
            )
            metrics = dict(res)
            metrics["loss"] = res["total_loss"]
            metrics["mean_image_concentration"] = conc_i.mean()
            metrics["mean_text_concentration"] = conc_t.mean()
            return res["total_loss"], metrics

        return loss_fn

    raise ValueError(f"unknown loss_type {loss_type!r}")


def _accum_grads(loss_fn, params, batch, rng, accum_steps: int, axis_name):
    """Plain micro-batch gradient accumulation via lax.scan (trainer.ipynb:cell 19 form)."""
    micro = jax.tree_util.tree_map(
        lambda x: x.reshape((accum_steps, x.shape[0] // accum_steps) + x.shape[1:]), batch
    )
    rngs = jax.random.split(rng, accum_steps)

    def body(carry, xs):
        g_acc, l_acc = carry
        mb, r = xs
        (loss, metrics), g = jax.value_and_grad(loss_fn, has_aux=True)(params, mb, r, axis_name)
        return (jax.tree_util.tree_map(jnp.add, g_acc, g), l_acc + loss), metrics

    zero = jax.tree_util.tree_map(jnp.zeros_like, params)
    (g_sum, loss_sum), metrics = jax.lax.scan(body, (zero, 0.0), (micro, rngs))
    grads = jax.tree_util.tree_map(lambda g: g / accum_steps, g_sum)
    metrics = jax.tree_util.tree_map(lambda m: m[-1], metrics)
    metrics["loss"] = loss_sum / accum_steps
    return grads, metrics


def _feature_cached_grads(model, params, batch, rng, logit_scale_loss_kwargs,
                          accum_steps: int, axis_name, wire_size=None):
    """OpenCLIP feature-cached accumulation (train.py:119-163), exact full-batch gradients.

    Only defined for the plain CLIP InfoNCE loss (as in the reference). Phase 1: stop-grad
    features for every micro-batch. Phase 2: per micro-batch, re-forward with grad, splice
    into the cached feature bank, full-bank loss, accumulate grads. Both phases run in train
    mode with the SAME per-micro-batch dropout rng, so the re-forwarded features equal the
    cached ones and the accumulated gradients stay exact."""
    kw = dict(logit_scale_loss_kwargs or {})
    label_smoothing = kw.pop("label_smoothing", 0.0)
    kw.pop("local_loss", None)
    kw.pop("contrastive_impl", None)
    kw.pop("chunk_size", None)
    moe_aux_weight = kw.pop("moe_aux_weight", 0.01)
    has_moe = getattr(getattr(model, "cfg", None), "vision", None) is not None and (
        model.cfg.vision.moe_experts > 0
    )
    micro = jax.tree_util.tree_map(
        lambda x: x.reshape((accum_steps, x.shape[0] // accum_steps) + x.shape[1:]), batch
    )
    rngs = jax.random.split(rng, accum_steps)

    def encode(p, mb, r):
        if has_moe:
            from multimodal_tpu.models.moe import collect_moe_losses

            out, mutated = model.apply(p, batch_images(mb, model, wire_size), mb["text"], train=True,
                                       rngs={"patch_dropout": r}, mutable=["moe_losses"])
            aux = collect_moe_losses(mutated)
        else:
            out = model.apply(p, batch_images(mb, model, wire_size), mb["text"], train=True,
                              rngs={"patch_dropout": r})
            aux = jnp.float32(0.0)
        return out["image_features"], out["text_features"], out["logit_scale"], aux

    def phase1(carry, xs):
        mb, r = xs
        fi, ft, _, _ = encode(params, mb, r)
        return carry, (fi, ft)

    _, (bank_i, bank_t) = jax.lax.scan(phase1, None, (micro, rngs))  # [k, Bm, E]
    bank_i = jax.lax.stop_gradient(bank_i)
    bank_t = jax.lax.stop_gradient(bank_t)

    def loss_for_micro(p, mb, r, idx):
        fi, ft, ls, aux = encode(p, mb, r)
        all_i = jax.lax.dynamic_update_index_in_dim(bank_i, fi, idx, 0).reshape(
            -1, fi.shape[-1]
        )
        all_t = jax.lax.dynamic_update_index_in_dim(bank_t, ft, idx, 0).reshape(
            -1, ft.shape[-1]
        )
        loss = clip_loss(
            all_i, all_t, ls,
            label_smoothing=label_smoothing, normalize=False, axis_name=axis_name, **kw,
        )
        # full-batch aux = mean of per-micro auxes, so weight each by 1/accum_steps
        # (grads here are summed, not averaged) to keep the accumulated grad exact
        loss = loss + moe_aux_weight * aux / accum_steps
        return loss, (ls, aux)

    def phase2(carry, xs):
        g_acc, l_acc = carry
        mb, r, idx = xs
        (loss, (ls, aux)), g = jax.value_and_grad(loss_for_micro, has_aux=True)(
            params, mb, r, idx
        )
        return (jax.tree_util.tree_map(jnp.add, g_acc, g), l_acc + loss), (ls, aux)

    zero = jax.tree_util.tree_map(jnp.zeros_like, params)
    (g_sum, loss_sum), (ls, auxes) = jax.lax.scan(
        phase2, (zero, 0.0), (micro, rngs, jnp.arange(accum_steps))
    )
    loss_report = loss_sum / accum_steps
    if has_moe:
        # loss_sum/k carries only weight*mean(aux)/k of the aux term; top it up so the
        # reported loss matches the non-accumulated path's loss + weight*aux
        mean_aux = jnp.mean(auxes)
        loss_report = loss_report + moe_aux_weight * mean_aux * (accum_steps - 1) / accum_steps
    metrics = {"loss": loss_report, "logit_scale": ls[-1]}
    if has_moe:
        metrics["moe_aux_loss"] = mean_aux
    return g_sum, metrics  # grads are exact full-batch grads; no averaging (sum of chain parts)


def make_train_step(
    model,
    tx,
    *,
    loss_type: str = "clip",
    loss_kwargs: Optional[dict] = None,
    mesh=None,
    use_shard_map: bool = False,
    accum_steps: int = 1,
    feature_cached_accum: bool = False,
    donate: bool = True,
    state_shardings=None,
    ema_decay: Optional[float] = None,
    offload_opt_state: bool = False,
    wire_size: Optional[int] = None,
):
    """Build the jitted train step. With ``mesh``: params replicated, batch data-sharded.

    ema_decay: when set (and the state carries ema_params), updates the parameter EMA
    each step with TF-style decay warmup min(decay, (1+step)/(10+step)).

    use_shard_map=True computes the loss inside shard_map with the local_loss form —
    the global x global logits matrix is never materialized per chip.

    state_shardings: an optional NamedSharding tree for the TrainState (e.g. from
    parallel.tp.tp_state_shardings) — enables tensor parallelism over a ('data','model')
    mesh via GSPMD propagation; mutually exclusive with use_shard_map.

    offload_opt_state: the AdamW moments live in pinned host RAM between steps
    (parallel/offload.py shardings on the state) — the step explicitly device_puts them
    HBM-side before tx.update and back to host after, which is what lets XLA schedule
    the HBM<->host DMA around the backward instead of rejecting the mixed-memory add."""
    loss_fn = make_loss_fn(model, loss_type, loss_kwargs, wire_size=wire_size)

    if feature_cached_accum and accum_steps > 1:
        # the cached-bank loss is the dense full-bank InfoNCE; a memory-bounded
        # contrastive form would be silently replaced by the dense one — reject instead
        lk = loss_kwargs or {}
        if lk.get("contrastive_impl") not in (None, "dense") or lk.get("local_loss"):
            raise ValueError(
                "feature-cached accumulation computes the dense full-bank CLIP loss and "
                "does not support --contrastive-impl chunked/ring or --local-loss — "
                "drop --feature-cached-accum or the sharded contrastive options"
            )

    def grads_and_metrics(params, batch, rng, axis_name):
        if feature_cached_accum and accum_steps > 1:
            assert loss_type == "clip", "feature-cached accumulation is a CLIP-loss feature"
            return _feature_cached_grads(model, params, batch, rng, loss_kwargs,
                                         accum_steps, axis_name, wire_size)
        if accum_steps > 1:
            return _accum_grads(loss_fn, params, batch, rng, accum_steps, axis_name)
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, rng, axis_name
        )
        return grads, metrics

    def step_fn(state: TrainState, batch, rng):
        if use_shard_map:
            assert mesh is not None
            # hybrid multi-slice meshes carry a 'replica' (DCN) axis in front of 'data'
            # (ICI); batch shards and collectives run over the full tuple
            from multimodal_tpu.parallel.mesh import batch_axes

            axes = batch_axes(mesh)

            def sharded(params, batch, rng):
                grads, metrics = grads_and_metrics(params, batch, rng, axes)
                grads = jax.lax.pmean(grads, axes)
                metrics = jax.lax.pmean(metrics, axes)
                return grads, metrics

            grads, metrics = jax.shard_map(
                sharded,
                mesh=mesh,
                in_specs=(P(), P(axes), P()),
                out_specs=(P(), P()),
            )(state.params, batch, rng)
        else:
            grads, metrics = grads_and_metrics(state.params, batch, rng, None)

        opt_state_in = state.opt_state
        if offload_opt_state:
            opt_state_in = _move_moments(
                opt_state_in, NamedSharding(mesh, P(), memory_kind="device"))
        updates, new_opt_state = tx.update(grads, opt_state_in, state.params)
        if offload_opt_state:
            new_opt_state = _move_moments(
                new_opt_state, NamedSharding(mesh, P(), memory_kind="pinned_host"))
        new_params = optax.apply_updates(state.params, updates)
        if loss_type != "siglip":
            # CLIP-family ln(100) temperature clamp (train.py:181-182); SigLIP's
            # temperature runs free by design (it converges near exp(t') ~ 100-120)
            new_params = _clamp_logit_scale(new_params)
        # the optimizer's single norm pass already produced this — no recompute
        from multimodal_tpu.train.optimizer import extract_grad_norm

        norm = extract_grad_norm(new_opt_state)
        metrics["grad_norm"] = norm if norm is not None else global_norm(grads)
        new_ema = state.ema_params
        if ema_decay is not None and state.ema_params is not None:
            d = jnp.minimum(ema_decay, (1.0 + state.step) / (10.0 + state.step))
            new_ema = jax.tree_util.tree_map(
                lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d),
                state.ema_params, new_params,
            )
        new_state = TrainState(step=state.step + 1, params=new_params,
                               opt_state=new_opt_state, ema_params=new_ema)
        return new_state, metrics

    jit_kwargs = {}
    if mesh is not None:
        from multimodal_tpu.parallel.mesh import batch_axes as _batch_axes

        batch_spec = P(_batch_axes(mesh))
    if state_shardings is not None:
        # TP/FSDP/EP shardings are GSPMD-propagated and exclusive with shard_map; the
        # offload shardings are replicated-with-memory-kinds and compose with it
        assert mesh is not None and (not use_shard_map or offload_opt_state)
        replicated = NamedSharding(mesh, P())
        data_sharded = NamedSharding(mesh, batch_spec)
        jit_kwargs["in_shardings"] = (state_shardings, data_sharded, replicated)
        jit_kwargs["out_shardings"] = (state_shardings, replicated)
    elif mesh is not None:
        replicated = NamedSharding(mesh, P())
        data_sharded = NamedSharding(mesh, batch_spec)
        # single shardings act as pytree prefixes (whole state replicated, whole batch sharded)
        jit_kwargs["in_shardings"] = (replicated, data_sharded, replicated)
        jit_kwargs["out_shardings"] = (replicated, replicated)
    if donate:
        jit_kwargs["donate_argnums"] = (0,)
    # XLA:TPU compiler flags can't ride XLA_FLAGS here (compilation happens behind the
    # remote-chip relay, and the host-side parser rejects TPU-only flags); per-jit
    # compiler_options travel through PJRT to whichever backend compiles. Knob for flag
    # A/Bs, e.g. MMTPU_COMPILER_OPTIONS=xla_tpu_scoped_vmem_limit_kib=65536 (set to the
    # empty string to get the compiler defaults). Measured table: docs/DESIGN.md.
    import os as _os

    opts = _os.environ.get("MMTPU_COMPILER_OPTIONS")
    if opts is None and jax.devices()[0].platform == "tpu":
        # measured +0.6% (ViT-B/32) / +1.3% (ViT-B/16) same-day, losses bit-identical
        opts = "xla_tpu_enable_latency_hiding_scheduler=true"
        # 32 MiB scoped VMEM is a measured win exactly where the large-S block-attention
        # kernels run (vision S > 128: B/16 894.6 -> 900.9, L/14 242.8 -> 245.8, two
        # same-day pairs each) and a measured LOSS at short S (B/32 -2.2%): the bigger
        # XLA fusions around the S>128 kernels want the headroom, the S=50 fusion set
        # double-buffers better without it. 48 MiB gives the gain back (B/16 896.7).
        vision = getattr(getattr(model, "cfg", None), "vision", None)
        if vision is not None:
            seq = (vision.image_size // vision.patch_size) ** 2 + 1
            if seq > 128:
                opts += ",xla_tpu_scoped_vmem_limit_kib=32768"
    if opts:
        jit_kwargs["compiler_options"] = dict(
            kv.split("=", 1) for kv in opts.split(",") if kv
        )
    return jax.jit(step_fn, **jit_kwargs)
