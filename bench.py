"""Headline benchmark: CLIP ViT-B/32 training throughput per chip (bf16, synthetic on-device
data — measures the compute path free of input-pipeline effects, per BASELINE.json's
north-star 'images+texts/sec/chip ... sustained input-bound-free').

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no throughput numbers (BASELINE.md). The documented
comparison constant below is the commonly reported OpenCLIP ViT-B/32 training throughput of
~1100 samples/s per A100-40GB (fp16 AMP, large batch) — the reference stack IS vendored
OpenCLIP, so this is the fairest available stand-in for 'the reference's own headline
benchmark' until a measured reference run exists. vs_baseline = ours_per_chip / 1100.
"""

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache"),
)

REFERENCE_SAMPLES_PER_S_PER_GPU = 1100.0  # OpenCLIP ViT-B/32 on A100 (see module docstring)

# peak dense bf16 FLOP/s per chip, by jax device_kind (public TPU spec sheets)
PEAK_FLOPS = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5": 459e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,
    "TPU v6e": 918e12,
}


def _tower_flops(seq: int, width: int, layers: int, mlp_ratio: float = 4.0) -> float:
    """Forward FLOPs for one transformer tower pass over ``seq`` tokens (MACs x 2):
    per token/layer qkv 6W^2 + scores 2SW + attn@V 2SW + out-proj 2W^2 + MLP 4*hidden*W
    (hidden = int(W * mlp_ratio), matching the model's floor — layers.py:160)."""
    hidden = int(width * mlp_ratio)
    per_token_layer = 8.0 * width * width + 4.0 * hidden * width + 4.0 * seq * width
    return layers * seq * per_token_layer


def train_flops_per_sample(cfg) -> float:
    """Analytic training FLOPs per (image, text) pair: forward + backward ~= 3x forward
    (standard rule: bwd does ~2x fwd matmul work). Includes patch/text embed and the
    final projections; ignores softmax/layernorm/loss (sub-1%)."""
    v, t = cfg.vision, cfg.text
    seq_v = (v.image_size // v.patch_size) ** 2 + 1
    fwd = _tower_flops(seq_v, v.width, v.layers, getattr(v, "mlp_ratio", 4.0))
    fwd += seq_v * (v.patch_size * v.patch_size * 3) * v.width * 2  # patch embed
    fwd += v.width * cfg.embed_dim * 2  # image projection
    fwd += _tower_flops(t.context_length, t.width, t.layers, getattr(t, "mlp_ratio", 4.0))
    fwd += t.context_length * t.width * 2  # token embed gather ~ negligible, kept for form
    fwd += t.width * cfg.embed_dim * 2  # text projection
    return 3.0 * fwd


def int8_train_flops_per_sample(cfg) -> float:
    """The subset of train_flops_per_sample that EXECUTES on the 2x-rate int8 MXU under
    --precision int8: the MLP GEMMs' forward + input-grad (ops/quant.py:int8_dense_train
    — the weight-grad third stays bf16). Used for the hardware-utilization MFU
    convention (mfu_hw): ideal step time charges these FLOPs against the int8 peak."""
    v, t = cfg.vision, cfg.text
    seq_v = (v.image_size // v.patch_size) ** 2 + 1
    total = 0.0
    for seq, width, layers, ratio in (
        (seq_v, v.width, v.layers, getattr(v, "mlp_ratio", 4.0)),
        (t.context_length, t.width, t.layers, getattr(t, "mlp_ratio", 4.0)),
    ):
        fwd_mlp = layers * seq * 4.0 * int(width * ratio) * width
        total += 2.0 * fwd_mlp  # fwd + dgrad of 3x total
    return total


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true", help="smoke-level run")
    parser.add_argument("--batch-size", type=int, default=None)
    parser.add_argument("--steps", type=int, default=None)
    parser.add_argument("--model", default="ViT-B-32")
    parser.add_argument("--remat", action="store_true",
                        help="per-block rematerialization (A/B for HBM-bound configs)")
    parser.add_argument("--int8", action=argparse.BooleanOptionalAction, default=None,
                        help="SwitchBack int8 MLP GEMMs (--precision int8). Default: "
                             "the measured per-model best (on for B/32 +5.0%% / H/14 "
                             "+2.1%% / L/14 +1.0%%; off for B/16 -1.8%% and g/14 wash "
                             "— round-4 A/B, quality-gated in RESULTS.md)")
    parser.add_argument("--offload", action="store_true",
                        help="AdamW moments in pinned host RAM (parallel/offload.py "
                             "A/B for HBM-bound models)")
    parser.add_argument("--opt-state-dtype", default=None,
                        choices=["float32", "bfloat16"],
                        help="AdamW moment dtype; default f32 except H/14 and g/14 "
                             "(bfloat16 is the only single-chip fit at their peak batch)")
    args = parser.parse_args()

    # measured-best per-chip batch per model (docs/DESIGN.md batch-sensitivity notes):
    # B/16 peaks at 272 (+4% over 256; 320+ regresses under bwd-activation HBM pressure);
    # L/14 peaks at 96 (sweep 48..128: 237/240/243/243/241/224 — 128 hits the same cliff);
    # H/14 peaks at 48 and g/14 at 24 (b16 61.1 / b24 64.8 / b32+remat 60.0), both
    # REQUIRING bf16 AdamW state on a 16 GB chip (f32 state OOMs H/14 at b48 and g/14
    # at any batch) — forced below
    # B/32 peaks at 320 (round-3 sweep: 256 -> 2456-2468, 288 -> 2452, 320 -> 2496-2511,
    # 352 -> 2420, 384 -> 2503)
    best_batch = {"ViT-B-32": 320, "ViT-B-16": 272, "ViT-L-14": 96,
                  "ViT-H-14": 48, "ViT-g-14": 24}
    batch = args.batch_size or (
        64 if args.quick else best_batch.get(args.model, 256)
    )
    if args.opt_state_dtype is None:
        # measured: bf16 state is the only single-chip fit at H/14's and g/14's peak
        # batch; tracks f32 within rounding (test_bf16_state_dtype_tracks_f32)
        args.opt_state_dtype = (
            "bfloat16" if args.model in ("ViT-H-14", "ViT-g-14") else "float32"
        )
    if args.int8 is None:
        # measured round-4 speed A/B (docs/DESIGN.md): int8 wins where MLP rows amortize
        # the dynamic-quantize VPU work and the step is MXU-bound; B/16 regresses (-1.8%)
        # and g/14 (HBM-bound) is a wash. Round-5 WIDTH quality gate (RESULTS.md,
        # scripts/int8_width_gate.sh): convergence parity holds at width 768 (B/32,
        # 5-epoch real-input) and 1024 (L/14, 300-step real-input curve overlap), but
        # H/14 (width 1280, its shipping bf16-moments config) converges visibly slower
        # under int8 in the same harness — its int8 default is REVOKED (+2.1% speed
        # was not worth an unquantified quality risk); opt back in with --int8
        args.int8 = args.model in ("ViT-B-32", "ViT-L-14")
    steps = args.steps or (3 if args.quick else 8)
    warmup = 1 if args.quick else 3

    from multimodal_tpu.models import create_model, init_params
    from multimodal_tpu.parallel import create_mesh, shard_batch
    from multimodal_tpu.train import TrainState, make_optimizer, make_schedule, make_train_step

    # The remote-chip tunnel can be transiently unavailable, and a bad window can make
    # backend init either raise UNAVAILABLE or HANG outright; a failed init is also
    # cached for the process lifetime. So before touching jax in-process, probe the
    # backend in a bounded subprocess and wait out flaky windows (bounded attempts).
    # Deterministic errors (bad platform, missing driver) skip the wait and fail fast
    # in-process with the real message.
    attempts = int(os.environ.get("MMTPU_BENCH_PROBE_ATTEMPTS", "5"))
    probe_timeout = float(os.environ.get("MMTPU_BENCH_PROBE_TIMEOUT", "180"))
    sleep_s = float(os.environ.get("MMTPU_BENCH_PROBE_SLEEP", "120"))
    status = "ok"
    for attempt in range(attempts):
        import subprocess

        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=probe_timeout, capture_output=True, text=True,
            )
            status = ("ok" if r.returncode == 0 else
                      "unavailable" if "UNAVAILABLE" in (r.stderr or "") else "fatal")
        except subprocess.TimeoutExpired:
            status = "hang"
        if status in ("ok", "fatal"):
            break
        if attempt + 1 < attempts:
            print(f"[bench] backend probe {attempt + 1}/{attempts}: {status}; "
                  f"retrying in {sleep_s:.0f}s", file=sys.stderr, flush=True)
            time.sleep(sleep_s)
    if status == "hang":
        # never fall through to an unbounded in-process init that would hang forever
        raise RuntimeError(
            f"backend init still hanging after {attempts} bounded probes")
    # 'fatal' falls through: the in-process init reproduces the real error message fast

    dev = jax.devices()[0]
    print(f"[bench] platform={dev.platform} kind={dev.device_kind} "
          f"n_devices={len(jax.devices())} batch={batch} steps={steps}", file=sys.stderr)

    model = create_model(args.model, dtype=jnp.bfloat16, remat=args.remat or None,
                         int8_forward=args.int8)
    params = init_params(model)
    tx = make_optimizer(
        make_schedule("cosine", 1e-3, warmup_steps=100, total_steps=10000),
        weight_decay=0.1,
        grad_clip_norm=1.0,
        state_dtype=jnp.dtype(args.opt_state_dtype),
    )
    state = TrainState.create(params, tx)
    mesh = create_mesh()
    if args.offload:
        from multimodal_tpu.parallel.offload import (
            offload_state_shardings, shard_state_offload)

        state_shardings = offload_state_shardings(state, mesh)
        state = shard_state_offload(state, mesh)
        step = make_train_step(model, tx, loss_type="clip", mesh=mesh,
                               state_shardings=state_shardings, donate=True,
                               offload_opt_state=True)
    else:
        state = jax.device_put(
            state, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()))
        step = make_train_step(model, tx, loss_type="clip", mesh=mesh, donate=True)

    rng = np.random.default_rng(0)
    c = model.cfg
    # uint8 images: the production wire format (native pipeline output, normalized on-device)
    host_batch = {
        "image": rng.integers(
            0, 256, (batch, c.vision.image_size, c.vision.image_size, 3), dtype=np.uint8
        ),
        "text": rng.integers(1, c.text.vocab_size - 1, (batch, c.text.context_length)).astype(
            np.int32
        ),
    }
    dev_batch = shard_batch(host_batch, mesh)
    key = jax.random.PRNGKey(0)

    for _ in range(warmup):
        state, metrics = step(state, dev_batch, key)
    float(metrics["loss"])  # on the axon relay only a host fetch truly synchronizes

    def timed_chain(k):
        nonlocal state
        t0 = time.perf_counter()
        for _ in range(k):
            state, m = step(state, dev_batch, key)
        loss = float(m["loss"])  # one sync at the end of the chain
        return time.perf_counter() - t0, loss

    # Two-point measurement (time a 1-step and an N-step chain through one host fetch,
    # subtract) cancels the constant dispatch/fetch round trip. A SINGLE pair is fragile:
    # one RTT fluctuation on the remote-chip tunnel lands entirely in the difference
    # (observed: a --quick run reporting 3.3x the bf16 peak). Median over repeated pairs.
    repeats = 2 if args.quick else 3
    estimates = []
    loss_val = float("nan")
    for _ in range(repeats):
        t_one, _ = timed_chain(1)
        dt, loss_val = timed_chain(steps)
        estimates.append(max((dt - t_one) / max(steps - 1, 1), 1e-9))
    estimates.sort()
    step_time = estimates[len(estimates) // 2]

    # Sanity gate: an implied throughput above the chip's bf16 peak is a measurement
    # failure, never a real speed. Re-measure once with longer chains (more signal per
    # fetch) before reporting anything.
    flops_per_sample = train_flops_per_sample(model.cfg)
    peak_flops = PEAK_FLOPS.get(jax.devices()[0].device_kind)
    if peak_flops and (flops_per_sample * batch / step_time) > 0.95 * peak_flops:
        print("[bench] implied MFU >95%: re-measuring with longer chains",
              file=sys.stderr, flush=True)
        estimates = []
        for _ in range(repeats):
            t_one, _ = timed_chain(2)
            dt, loss_val = timed_chain(2 * steps)
            estimates.append(max((dt - t_one) / max(2 * steps - 2, 1), 1e-9))
        estimates.sort()
        step_time = estimates[len(estimates) // 2]

    n_chips = len(jax.devices())
    samples_per_s = batch / step_time
    per_chip = samples_per_s / n_chips
    metrics = {"loss": loss_val}
    flops = flops_per_sample
    peak = peak_flops
    # Two MFU conventions (round-4 verdict: label them, report both):
    #   mfu    — bf16-equivalent: analytic bf16 FLOPs / bf16 peak. Under --int8 this is
    #            a SPEEDUP measure relative to the bf16 machine model, and can exceed
    #            the true fraction of hardware capability used.
    #   mfu_hw — hardware utilization: FLOPs executing on the 2x-rate int8 MXU are
    #            charged against the int8 peak (ideal-time ratio); == mfu when int8 off.
    mfu = (flops * per_chip / peak) if peak else None
    mfu_hw = None
    if peak:
        int8_flops = int8_train_flops_per_sample(model.cfg) if args.int8 else 0.0
        mfu_hw = (flops - 0.5 * int8_flops) * per_chip / peak
    print(
        f"[bench] {step_time*1e3:.2f} ms/step -> {samples_per_s:.1f} samples/s "
        f"({per_chip:.1f}/chip), loss={metrics['loss']:.4f}, "
        f"{flops/1e9:.1f} GFLOP/sample"
        + (f", MFU={mfu*100:.1f}% (bf16-equiv)" if mfu is not None else "")
        + (f", MFU_hw={mfu_hw*100:.1f}%" if mfu_hw is not None and args.int8 else ""),
        file=sys.stderr,
    )
    record = {
        "metric": f"clip_{args.model.lower().replace('-', '')}"
                  "_train_samples_per_s_per_chip",
        "value": round(per_chip, 2),
        "unit": "samples/s/chip",
        "vs_baseline": round(per_chip / REFERENCE_SAMPLES_PER_S_PER_GPU, 4),
    }
    if mfu is not None:
        record["mfu"] = round(mfu, 4)
        record["mfu_convention"] = "bf16-equiv"
        if mfu_hw is not None:
            record["mfu_hw"] = round(mfu_hw, 4)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
