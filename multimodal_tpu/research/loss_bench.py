"""Loss-dynamics test bench: Riemannian SGD of point pairs on S^1 under the vCLIP loss.

Counterpart of reference distribution_training_comparisons/test_vclipLoss.py:26-602: N unit
vector pairs on the circle, manual Riemannian SGD (tangent-space gradient projection :26-46 +
exponential map :48-67), 1000 epochs of VClipLoss, tracking pair arc lengths, gradient norms
and concentration evolution, summarized in the summary_statistics.txt format whose committed
outputs are the reference's de-facto loss regression baseline (BASELINE.md). The JAX version
runs the whole optimization as one jitted lax.scan — deterministic under a fixed PRNG key.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_tpu.distributions import PowerSpherical, VonMisesFisher
from multimodal_tpu.distributions.projected_normal import ProjectedNormal
from multimodal_tpu.losses import vclip_loss
from multimodal_tpu.ops.sphere import l2_normalize

DISTRIBUTIONS = ("power_spherical", "vmf", "projected_normal")


def _make_dists(name, mu_a, conc_a, mu_b, conc_b):
    if name == "power_spherical":
        return PowerSpherical(mu_a, conc_a), PowerSpherical(mu_b, conc_b)
    if name == "vmf":
        return VonMisesFisher(mu_a, conc_a), VonMisesFisher(mu_b, conc_b)
    if name == "projected_normal":
        return ProjectedNormal(mu_a * conc_a[..., None], jnp.ones_like(mu_a)), ProjectedNormal(
            mu_b * conc_b[..., None], jnp.ones_like(mu_b)
        )
    raise ValueError(name)


def riemannian_project(grad, x):
    """Project an ambient gradient onto the tangent space at x (test_vclipLoss.py:26-46)."""
    return grad - jnp.sum(grad * x, axis=-1, keepdims=True) * x


def exponential_map(x, v):
    """Sphere exponential map (test_vclipLoss.py:48-67)."""
    norm = jnp.linalg.norm(v, axis=-1, keepdims=True)
    safe = jnp.maximum(norm, 1e-12)
    return jnp.where(
        norm < 1e-12, x, jnp.cos(norm) * x + jnp.sin(norm) * (v / safe)
    )


def arc_length(a, b):
    """Great-circle angle between paired unit vectors, degrees (test_vclipLoss.py:69-80)."""
    cos = jnp.clip(jnp.sum(a * b, axis=-1), -1.0, 1.0)
    return jnp.degrees(jnp.arccos(cos))


@dataclasses.dataclass
class BenchResult:
    distribution: str
    final_total_loss: float
    final_contrastive_loss: float
    final_kl_loss: float
    initial_concentration_a: float
    final_concentration_a: float
    initial_concentration_b: float
    final_concentration_b: float
    initial_arc_deg: float
    final_arc_deg: float
    grad_norm_first: float
    grad_norm_last: float
    history: Optional[dict] = None

    def summary_text(self) -> str:
        """summary_statistics.txt format (distribution_training_comparisons/*/)."""
        return "\n".join([
            f"Distribution: {self.distribution}",
            "",
            "Final losses:",
            f"  total: {self.final_total_loss:.4f}",
            f"  contrastive: {self.final_contrastive_loss:.4f}",
            f"  kl: {self.final_kl_loss:.4f}",
            "",
            "Concentrations (A):"
            f" {self.initial_concentration_a:.3f} -> {self.final_concentration_a:.3f}",
            "Concentrations (B):"
            f" {self.initial_concentration_b:.3f} -> {self.final_concentration_b:.3f}",
            "",
            "Mean pair arc length:"
            f" {self.initial_arc_deg:.2f} deg -> {self.final_arc_deg:.2f} deg",
            "",
            f"Gradient norms: first {self.grad_norm_first:.4f}, last {self.grad_norm_last:.4f}",
        ])


def run_loss_bench(
    distribution: str = "power_spherical",
    n_points: int = 20,
    dim: int = 2,
    steps: int = 1000,
    lr: float = 0.05,
    conc_lr: float = 0.01,
    initial_concentration: float = 0.1,
    kl_weight: float = 0.01,
    mc_samples: int = 8,
    seed: int = 0,
    keep_history: bool = False,
) -> BenchResult:
    """Train paired points with Riemannian SGD on the means + plain SGD on the (direct,
    positivity-clamped) concentrations under vclip_loss; return summary statistics."""
    key = jax.random.PRNGKey(seed)
    k1, k2, k_loss = jax.random.split(key, 3)
    mu_a = l2_normalize(jax.random.normal(k1, (n_points, dim)))
    # B starts as slightly-perturbed A so pairs begin close (the reference's 0.26 deg init)
    mu_b = l2_normalize(mu_a + 0.005 * jax.random.normal(k2, (n_points, dim)))
    # concentrations are direct SGD parameters, like the reference bench's leaf tensors
    raw_conc = jnp.full((2, n_points), initial_concentration)
    logit_scale = jnp.asarray(2.6592)  # ln(1/0.07): CLIP's temperature (clipLoss.py default)

    def loss_fn(mu_a, mu_b, raw_conc, key):
        conc = jnp.maximum(raw_conc, 1e-3)
        da, db = _make_dists(distribution, mu_a, conc[0], mu_b, conc[1])
        res = vclip_loss(
            da, db, conc[0], conc[1], logit_scale,
            key=key, kl_weight=kl_weight, num_samples=mc_samples,
            var_reg_weight=0.0, label_smoothing=0.0,
        )
        return res["total_loss"], res

    grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1, 2), has_aux=True)

    def step(carry, key):
        mu_a, mu_b, raw_conc = carry
        (loss, res), (ga, gb, gc) = grad_fn(mu_a, mu_b, raw_conc, key)
        # Riemannian update on the means (tangent projection + exp map)
        mu_a = exponential_map(mu_a, -lr * riemannian_project(ga, mu_a))
        mu_b = exponential_map(mu_b, -lr * riemannian_project(gb, mu_b))
        raw_conc = jnp.maximum(raw_conc - conc_lr * gc, 1e-3)
        gnorm = jnp.sqrt(
            jnp.sum(ga**2) + jnp.sum(gb**2) + jnp.sum(gc**2)
        )
        out = {
            "total": res["total_loss"],
            "contrastive": res["clip_loss"],
            "kl": res.get("image_kl_loss", 0.0) + res.get("text_kl_loss", 0.0),
            "grad_norm": gnorm,
            "arc": jnp.mean(arc_length(mu_a, mu_b)),
            "conc_a": jnp.mean(raw_conc[0]),
            "conc_b": jnp.mean(raw_conc[1]),
        }
        return (mu_a, mu_b, raw_conc), out

    keys = jax.random.split(k_loss, steps)
    init_arc = float(jnp.mean(arc_length(mu_a, mu_b)))
    (mu_a, mu_b, raw_conc), hist = jax.lax.scan(step, (mu_a, mu_b, raw_conc), keys)
    hist = {k: np.asarray(v) for k, v in hist.items()}

    return BenchResult(
        distribution=distribution,
        final_total_loss=float(hist["total"][-1]),
        final_contrastive_loss=float(hist["contrastive"][-1]),
        final_kl_loss=float(hist["kl"][-1]),
        initial_concentration_a=initial_concentration,
        final_concentration_a=float(hist["conc_a"][-1]),
        initial_concentration_b=initial_concentration,
        final_concentration_b=float(hist["conc_b"][-1]),
        initial_arc_deg=init_arc,
        final_arc_deg=float(hist["arc"][-1]),
        grad_norm_first=float(hist["grad_norm"][0]),
        grad_norm_last=float(hist["grad_norm"][-1]),
        history=hist if keep_history else None,
    )


def main(argv=None):
    """CLI: regenerate the summary_statistics.txt artifacts for all three distributions."""
    import argparse
    import os

    p = argparse.ArgumentParser("vclip loss bench")
    p.add_argument("--out-dir", default="loss_bench_results")
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--distributions", nargs="*", default=list(DISTRIBUTIONS))
    args = p.parse_args(argv)
    for dist in args.distributions:
        res = run_loss_bench(dist, steps=args.steps)
        d = os.path.join(args.out_dir, dist)
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, "summary_statistics.txt")
        with open(path, "w") as f:
            f.write(res.summary_text() + "\n")
        print(f"{dist}: arc {res.initial_arc_deg:.2f} -> {res.final_arc_deg:.2f} deg, "
              f"conc {res.initial_concentration_a:.2f} -> {res.final_concentration_a:.2f} "
              f"({path})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
