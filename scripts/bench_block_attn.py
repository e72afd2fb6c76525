"""Microbenchmark for the whole-block attention kernel (ops/block_attention.py).

Times forward and forward+backward at CLIP encoder shapes in isolation so kernel A/Bs
turn around in seconds instead of full bench.py runs. Reports achieved TFLOP/s against
the useful attention FLOPs (projections + logits + PV), the same accounting as
docs/DESIGN.md's B/32 step audit.

Usage:
  python scripts/bench_block_attn.py                      # B/32 vision+text shapes
  python scripts/bench_block_attn.py --shape 256,197,768,12   # B,S,W,H
  MMTPU_BLOCK_ATTN_<FLAG>=1 python scripts/bench_block_attn.py   # kernel variant A/B
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache"),
)


def attn_flops(b: int, s: int, w: int) -> float:
    """Useful MACs*2: 4 projections (b*s*w*w each) + logits (b*h*s*s*dh = b*s*s*w) + PV."""
    return 2.0 * (4 * b * s * w * w + 2 * b * s * s * w)


def run_case(b, s, w, h, causal, steps=30, warmup=5, backward=True):
    from multimodal_tpu.ops.block_attention import block_attention

    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    x = jnp.asarray(rng.standard_normal((b, s, w)), dt)
    mk = lambda *shape: jnp.asarray(rng.standard_normal(shape) * 0.02, dt)  # noqa: E731
    args = (x, mk(w, w), mk(w), mk(w, w), mk(w), mk(w, w), mk(w), mk(w, w), mk(w))

    # CHAINED calls (each consumes the previous output) so the device cannot overlap or
    # elide work, timed by bench.py's two-point method (subtracting a 1-step chain
    # cancels the relay's dispatch+fetch round trip; only a host float() truly syncs).
    if backward:
        def loss(x, *a):
            return jnp.sum(block_attention(x, *a, heads=h, causal=causal).astype(jnp.float32))

        g = jax.grad(loss)

        @jax.jit
        def f(x, *a):
            return x + 1e-6 * g(x, *a)
    else:
        @jax.jit
        def f(x, *a):
            return block_attention(x, *a, heads=h, causal=causal)

    x0, rest = args[0], args[1:]

    def chain(k):
        x = x0
        for _ in range(k):
            x = f(x, *rest)
        return float(jnp.sum(x[0, 0, :8].astype(jnp.float32)))

    chain(1)  # compile + warm
    est = []
    for _ in range(3):
        t0 = time.perf_counter(); chain(1); t1 = time.perf_counter()
        chain(steps)
        t2 = time.perf_counter()
        est.append(max(((t2 - t1) - (t1 - t0)) / (steps - 1), 1e-9))
    est.sort()
    t_step = est[1]
    fl = attn_flops(b, s, w) * (3.0 if backward else 1.0)
    return t_step, fl / t_step / 1e12


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default=None, help="B,S,W,H (overrides the default set)")
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--fwd-only", action="store_true")
    args = ap.parse_args()

    cases = (
        [tuple(int(v) for v in args.shape.split(","))]
        if args.shape
        else [(256, 50, 768, 12), (256, 77, 512, 8)]  # B/32 vision, text
    )
    flags = {k: v for k, v in os.environ.items() if k.startswith("MMTPU_BLOCK")}
    print(f"device={jax.devices()[0].device_kind} flags={flags}")
    for (b, s, w, h) in cases:
        causal = s == 77  # text tower convention
        tf, rf = run_case(b, s, w, h, causal, steps=args.steps, backward=False)
        line = (f"[{b},{s},{w},h{h}]{' causal' if causal else ''} "
                f"fwd {tf*1e3:7.3f} ms  {rf:6.1f} TF/s")
        if not args.fwd_only:
            tb, rb = run_case(b, s, w, h, causal, steps=args.steps, backward=True)
            line += f" | fwd+bwd {tb*1e3:7.3f} ms  {rb:6.1f} TF/s"
        print(line)


if __name__ == "__main__":
    main()
