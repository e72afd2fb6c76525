"""Real-checkpoint parity gate against COMMITTED golden fixtures.

BASELINE.md parity config #1 calls for loading a published torch CLIP checkpoint and
matching its embeddings. The environment has no network and no local OpenAI/HF snapshot, so
the gate is anchored to committed artifacts instead: ``assets/interop_tiny_clip.pt`` is a
torch state_dict in the exact OpenAI CLIP tensor naming/layout (saved from the torch twin of
tests/test_checkpoint_interop.py, seed 0), and ``assets/interop_tiny_golden.npz`` holds the
embeddings THE TORCH MODEL produced for fixed inputs. The test drives the production
from-disk path — ``load_pretrained`` on the .pt file (torch.load -> convert -> tree check),
the same branch a real ``--pretrained ViT-B-32.pt`` run takes (run.py --pretrained) — and
must reproduce the recorded torch numbers. Regenerate with the script in this docstring's
history if the twin ever changes; the fixtures are the contract."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

ASSETS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "assets")


@pytest.fixture(scope="module")
def golden():
    data = np.load(os.path.join(ASSETS, "interop_tiny_golden.npz"))
    return {k: data[k] for k in data.files}


def test_load_pretrained_from_disk_matches_torch_goldens(golden):
    import test_checkpoint_interop  # registers the interop-test model config  # noqa: F401

    from multimodal_tpu.models import create_model, init_params
    from multimodal_tpu.models.checkpoint_interop import load_pretrained
    from multimodal_tpu.models.config import get_model_config

    model = create_model("interop-test")
    template = init_params(model)
    params = load_pretrained(
        os.path.join(ASSETS, "interop_tiny_clip.pt"), template,
        get_model_config("interop-test"),
    )

    images = jnp.asarray(golden["images"]).transpose(0, 2, 3, 1)  # NCHW -> NHWC
    tokens = jnp.asarray(golden["tokens"])
    fi = model.apply(params, images, method=model.encode_image)
    ft = model.apply(params, tokens, method=model.encode_text)
    np.testing.assert_allclose(
        np.asarray(fi), golden["image_embeddings"], atol=2e-4, rtol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(ft), golden["text_embeddings"], atol=2e-4, rtol=2e-3
    )


def test_goldens_drive_retrieval_metrics(golden):
    """The loaded checkpoint's embeddings run the retrieval metric path end-to-end
    (main/retrieval.py:55-102 semantics): self-retrieval on matched pairs."""
    from multimodal_tpu.eval.retrieval import get_clip_metrics

    fi = golden["image_embeddings"]
    ft = golden["text_embeddings"]
    fi = fi / np.linalg.norm(fi, axis=-1, keepdims=True)
    ft = ft / np.linalg.norm(ft, axis=-1, keepdims=True)
    m = get_clip_metrics(fi, ft, logit_scale=100.0)
    assert set(k for k in m if "R@1" in k)  # both directions reported
    for k, v in m.items():
        if "R@" in k:
            assert 0.0 <= v <= 1.0
