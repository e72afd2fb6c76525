"""Evaluation-suite tests with synthetic embeddings of known structure.

Mirrors the reference's metric semantics: metrics/topk.py:85-106 (hand-checked example),
metrics/entropy.py, metrics/linearSeparability.py, main/retrieval.py:55-102,
main/zero_shot.py, main/linear_probing.py, main/train.py:338-356."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_tpu.eval import (
    apply_templates,
    average_kth_neighbor_angle,
    build_zero_shot_classifier,
    classnames,
    get_clip_metrics,
    linear_probe_metrics,
    linear_separability,
    recall_at_k,
    templates,
    top_k_score,
    zero_shot_eval,
)
from multimodal_tpu.ops.sphere import l2_normalize


def paired_features(n=64, d=32, noise=0.1, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    img = l2_normalize(jax.random.normal(k1, (n, d)))
    txt = l2_normalize(img + noise * jax.random.normal(k2, (n, d)))
    return img, txt


def test_metadata():
    assert len(templates("openai")) == 80
    assert len(classnames("imagenet")) == 1000
    assert len(classnames("cifar10")) == 10
    assert len(classnames("stanford-cars")) == 196
    assert apply_templates("cat", ["a photo of a {}."]) == ["a photo of a cat."]


def test_top_k_score_perfect_and_noisy():
    img, txt = paired_features(noise=0.01)
    assert top_k_score(img, txt, k=1) > 0.95
    img2, txt2 = paired_features(noise=10.0, seed=1)
    assert top_k_score(img2, txt2, k=1) < 0.3


def test_top_k_hand_example():
    """2-D hand-checked example in the spirit of metrics/topk.py:85-106."""
    img = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
    txt = jnp.asarray([[1.0, 0.1], [0.1, 1.0]])
    assert top_k_score(img, txt, k=1) == 1.0
    txt_swapped = txt[::-1]
    assert top_k_score(img, txt_swapped, k=1) == 0.0
    assert top_k_score(img, txt_swapped, k=2) == 1.0


def test_knn_angle_uniform_vs_clustered():
    key = jax.random.PRNGKey(0)
    uniform = l2_normalize(jax.random.normal(key, (512, 16)))
    clustered = l2_normalize(
        jnp.ones((512, 16)) + 0.01 * jax.random.normal(key, (512, 16))
    )
    a_u = average_kth_neighbor_angle(uniform, k=1, batch_size=128)
    a_c = average_kth_neighbor_angle(clustered, k=1, batch_size=128)
    assert a_u > a_c > 0


def test_linear_separability():
    # far-apart modalities: fully separable -> accuracy ~1
    img = l2_normalize(jnp.ones((64, 16)) + 0.01 * jax.random.normal(jax.random.PRNGKey(0), (64, 16)))
    txt = l2_normalize(-jnp.ones((64, 16)) + 0.01 * jax.random.normal(jax.random.PRNGKey(1), (64, 16)))
    assert linear_separability(img, txt, epochs=300) > 0.95
    # identical distributions -> near chance
    a, _ = paired_features(n=128, noise=0.0)
    assert linear_separability(a, a, epochs=300) <= 0.75


def test_recall_at_k_with_caption_map():
    img, _ = paired_features(n=20, noise=0.0)
    # 5 captions per image, tiny noise
    t2i = np.repeat(np.arange(20), 5)
    txt = l2_normalize(
        img[t2i] + 0.01 * jax.random.normal(jax.random.PRNGKey(2), (100, img.shape[1]))
    )
    out = recall_at_k(img, txt, t2i)
    assert out["text_to_image_R@1"] > 0.9
    assert out["image_to_text_R@1"] > 0.9
    assert out["text_to_image_R@10"] >= out["text_to_image_R@5"] >= out["text_to_image_R@1"]


def test_get_clip_metrics():
    img, txt = paired_features(n=50, noise=0.01)
    m = get_clip_metrics(img, txt)
    assert m["image_to_text_R@1"] > 0.9
    assert m["image_to_text_mean_rank"] < 2.0
    assert m["text_to_image_median_rank"] == 1.0
    img2, txt2 = paired_features(n=50, noise=100.0, seed=3)
    m2 = get_clip_metrics(img2, txt2)
    assert m2["image_to_text_mean_rank"] > 5.0


def test_zero_shot_pipeline_synthetic():
    """End-to-end zero-shot over a fake encoder: class c images cluster at direction e_c."""
    d = 64
    names = ["cat", "dog", "bird"]
    rng = np.random.default_rng(0)

    def encode_text(tokens):
        # deterministic fake text encoder: hash tokens row -> direction among the 3 classes
        out = np.zeros((tokens.shape[0], d), np.float32)
        for i, row in enumerate(np.asarray(tokens)):
            cls = int(row.sum()) % 3
            out[i, cls] = 1.0
            out[i, 3:] = 0.01
        return jnp.asarray(out)

    def encode_image(images):
        return images  # images ARE features in this fake

    classifier = build_zero_shot_classifier(encode_text, names, ["a photo of a {}."])
    assert classifier.shape == (d, 3)

    feats = np.zeros((30, d), np.float32)
    labels = np.arange(30) % 3
    # place each "image" exactly at its class's text direction
    cls_dirs = np.asarray(classifier.T)
    for i, l in enumerate(labels):
        feats[i] = cls_dirs[l] + rng.normal(0, 0.01, d)
    res = zero_shot_eval(encode_image, classifier, [(jnp.asarray(feats), labels)])
    assert res["top1"] > 0.9
    assert res["top5"] == 1.0


def test_linear_probe():
    rng = np.random.default_rng(0)
    n, d, c = 600, 32, 3
    labels = rng.integers(0, c, n)
    feats = rng.normal(0, 0.1, (n, d)).astype(np.float32)
    feats[np.arange(n), labels] += 2.0
    out = linear_probe_metrics(
        feats[:500], labels[:500], feats[500:], labels[500:], num_classes=c, epochs=30
    )
    assert out["linear_probe_accuracy"] > 0.9
    assert out["linear_probe_mean_per_class"] > 0.9
