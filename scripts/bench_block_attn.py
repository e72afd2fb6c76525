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

    if backward:
        def loss(*a):
            return jnp.sum(block_attention(*a, heads=h, causal=causal).astype(jnp.float32))

        f = jax.jit(jax.grad(loss, argnums=(0, 1, 3, 5, 7)))
    else:
        f = jax.jit(lambda *a: block_attention(*a, heads=h, causal=causal))

    out = f(*args)
    jax.block_until_ready(out)
    # chained timing with one sync (axon relay: only host fetches synchronize)
    t1 = time.perf_counter()
    o = None
    for _ in range(steps):
        o = f(*args)
    jax.block_until_ready(o)
    dt_total = time.perf_counter() - t1
    t_step = dt_total / steps
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
