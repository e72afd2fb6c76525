"""Loss tests, including multi-device parity: the sharded local_loss contrastive must equal
the single-device global computation in value AND gradient (the reference's hardest parity
requirement, SURVEY.md §7 'gradients equal the single-device global computation';
align_clip/loss.py:20-117)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from multimodal_tpu.distributions import PowerSpherical, VonMisesFisher
from multimodal_tpu.distributions.normal import NormalDiag
from multimodal_tpu.losses import (
    align_clip_loss,
    clip_loss,
    clip_loss_sampled,
    cloob_loss,
    vclip_loss,
)
from multimodal_tpu.ops.sphere import l2_normalize
from multimodal_tpu.parallel import create_mesh

B, D = 32, 64


@pytest.fixture(scope="module")
def feats():
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    img = jax.random.normal(k1, (B, D))
    txt = img + 0.5 * jax.random.normal(k2, (B, D))
    sem = jax.random.normal(k3, (B, 48))
    return img, txt, sem


def test_clip_loss_basic(feats):
    img, txt, _ = feats
    loss = clip_loss(img, txt, jnp.float32(2.659), label_smoothing=0.1)
    assert loss.shape == ()
    assert 0 < float(loss) < 20
    # perfectly aligned features with huge scale -> loss near the label-smoothing floor
    loss_aligned = clip_loss(img, img, jnp.float32(4.6), label_smoothing=0.0)
    assert float(loss_aligned) < 0.1


def test_clip_loss_scale_clamp(feats):
    img, txt, _ = feats
    a = clip_loss(img, txt, jnp.float32(4.6052))
    b = clip_loss(img, txt, jnp.float32(100.0))  # clamped to ln(100)
    np.testing.assert_allclose(float(a), float(b), rtol=1e-6)


def test_clip_loss_sampled_shape(feats):
    img, txt, _ = feats
    s = 5
    img_s = jnp.broadcast_to(img, (s, B, D))
    txt_s = jnp.broadcast_to(txt, (s, B, D))
    per_sample = clip_loss_sampled(img_s, txt_s, jnp.float32(2.0))
    assert per_sample.shape == (s,)
    # identical samples -> identical per-sample losses
    np.testing.assert_allclose(np.asarray(per_sample), float(per_sample[0]), rtol=1e-5)


def _sharded_loss_and_grad(img, txt, scale, axis_name, mesh, local_loss=True, **kw):
    def loss_fn(img, txt):
        return clip_loss(
            img, txt, scale, axis_name=axis_name, local_loss=local_loss, **kw
        )

    f = jax.shard_map(
        lambda i, t: jax.value_and_grad(loss_fn, argnums=(0, 1))(i, t),
        mesh=mesh,
        in_specs=(P("data"), P("data")),
        out_specs=(P(), (P("data"), P("data"))),
    )
    return f(img, txt)


def test_sharded_local_loss_matches_global(feats):
    """local@global logits + offset labels == single-device global loss; grads too."""
    img, txt, _ = feats
    scale = jnp.float32(2.659)
    mesh = create_mesh()
    ref_loss, (ref_gi, ref_gt) = jax.value_and_grad(
        lambda i, t: clip_loss(i, t, scale), argnums=(0, 1)
    )(img, txt)
    for local_loss in [True, False]:
        (loss, (gi, gt)) = _sharded_loss_and_grad(
            img, txt, scale, "data", mesh, local_loss=local_loss
        )
        np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(gi), np.asarray(ref_gi), rtol=2e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(gt), np.asarray(ref_gt), rtol=2e-4, atol=1e-6)


def test_sharded_align_loss_matches_global(feats):
    img, txt, sem = feats
    scale = jnp.float32(2.0)
    mesh = create_mesh()

    def global_fn(i, t):
        return align_clip_loss(i, t, scale, semantic_features=sem)["total_loss"]

    ref_loss, ref_g = jax.value_and_grad(global_fn)(img, txt)

    def local_fn(i, t, s):
        return align_clip_loss(
            i, t, scale, semantic_features=s, axis_name="data", local_loss=True
        )["total_loss"]

    f = jax.shard_map(
        lambda i, t, s: jax.value_and_grad(local_fn)(i, t, s),
        mesh=mesh,
        in_specs=(P("data"), P("data"), P("data")),
        out_specs=(P(), P("data")),
    )
    loss, g = f(img, txt, sem)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g), np.asarray(ref_g), rtol=2e-4, atol=1e-6)


def test_align_loss_semantic_weighting_changes_loss(feats):
    img, txt, sem = feats
    scale = jnp.float32(2.0)
    with_sem = align_clip_loss(img, txt, scale, semantic_features=sem)
    without = align_clip_loss(img, txt, scale)
    assert with_sem["total_loss"].shape == ()
    assert not np.isclose(float(with_sem["total_loss"]), float(without["total_loss"]))
    assert float(with_sem["inModality_loss"]) > 0


def test_cloob_loss(feats):
    img, txt, _ = feats
    img_n, txt_n = l2_normalize(img), l2_normalize(txt)
    loss = cloob_loss(img_n, txt_n, inv_tau=30.0, scale_hopfield=8.0)
    assert np.isfinite(float(loss))
    # aligned pairs should beat shuffled pairs
    perm = jax.random.permutation(jax.random.PRNGKey(1), B)
    loss_shuffled = cloob_loss(img_n, txt_n[perm], inv_tau=30.0, scale_hopfield=8.0)
    assert float(loss) < float(loss_shuffled)


@pytest.mark.parametrize("dist_kind", ["power_spherical", "vmf"])
def test_vclip_loss_spherical(feats, dist_kind):
    img, txt, _ = feats
    mu_i, mu_t = l2_normalize(img), l2_normalize(txt)
    conc_i = jnp.full((B,), 100.0)
    conc_t = jnp.full((B,), 120.0)
    cls = PowerSpherical if dist_kind == "power_spherical" else VonMisesFisher
    out = vclip_loss(
        cls(loc=mu_i, scale=conc_i),
        cls(loc=mu_t, scale=conc_t),
        conc_i,
        conc_t,
        jnp.float32(2.659),
        key=jax.random.PRNGKey(2),
        num_samples=8,
    )
    for k in ["total_loss", "clip_loss", "image_kl_loss", "text_kl_loss", "var_reg"]:
        assert np.isfinite(float(out[k])), k
    assert float(out["image_kl_loss"]) > 0
    assert float(out["var_reg"]) > 0
    # mean-only mode (kl_weight=0 path)
    out2 = vclip_loss(
        cls(loc=mu_i, scale=conc_i),
        cls(loc=mu_t, scale=conc_t),
        conc_i,
        conc_t,
        jnp.float32(2.659),
        kl_weight=0.0,
    )
    assert np.isfinite(float(out2["total_loss"]))


def test_vclip_loss_gaussian(feats):
    img, txt, _ = feats
    sig_i = jnp.full((B, D), 0.5)
    sig_t = jnp.full((B, D), 0.6)
    out = vclip_loss(
        NormalDiag(loc=img, scale=sig_i),
        NormalDiag(loc=txt, scale=sig_t),
        jnp.square(sig_i),
        jnp.square(sig_t),
        jnp.float32(2.659),
        key=jax.random.PRNGKey(3),
        num_samples=4,
    )
    assert np.isfinite(float(out["total_loss"]))
    assert float(out["image_kl_loss"]) > 0


def test_vclip_loss_gradients(feats):
    img, txt, _ = feats

    def loss_fn(raw_mu, raw_conc):
        mu = l2_normalize(raw_mu)
        conc = jnp.exp(raw_conc)
        out = vclip_loss(
            PowerSpherical(loc=mu, scale=conc),
            PowerSpherical(loc=l2_normalize(txt), scale=conc),
            conc,
            conc,
            jnp.float32(2.659),
            key=jax.random.PRNGKey(4),
            num_samples=4,
            kl_weight=100.0,
        )
        return out["total_loss"]

    g_mu, g_conc = jax.grad(loss_fn, argnums=(0, 1))(img, jnp.full((B,), 5.0))
    assert np.isfinite(np.asarray(g_mu)).all()
    assert np.isfinite(np.asarray(g_conc)).all()
    assert float(jnp.abs(g_conc).sum()) > 0
