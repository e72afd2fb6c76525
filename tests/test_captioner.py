"""Caption decode path: GPT-2 parity vs transformers, KV-cache decode, mapper, BLEU,
and the end-to-end CaptioningMetric on a tiny synthetic task (captions must be learnable
from the embedding -> BLEU goes up)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_tpu.eval.captioning import CaptioningMetric, corpus_bleu, sentence_bleu
from multimodal_tpu.models.captioner import (
    TINY_GPT2,
    ClipCaptionModel,
    GPT2,
    GPT2Config,
    load_hf_gpt2,
)

CLIP_DIM = 16


def tiny_caption_model(prefix_length=4):
    return ClipCaptionModel(
        gpt2=TINY_GPT2, clip_dim=CLIP_DIM, prefix_length=prefix_length,
        clip_length=2, mapper_layers=1,
    )


# ---------------------------------------------------------------------------
# GPT-2 core
# ---------------------------------------------------------------------------


def test_gpt2_parity_vs_transformers():
    """Our flax GPT-2 vs a randomly initialized HF GPT2LMHeadModel with the same weights."""
    transformers = pytest.importorskip("transformers")
    import torch

    hf_cfg = transformers.GPT2Config(
        vocab_size=128, n_positions=32, n_embd=32, n_layer=2, n_head=2,
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
    )
    torch.manual_seed(0)
    hf = transformers.GPT2LMHeadModel(hf_cfg).eval()

    cfg = GPT2Config(vocab_size=128, max_positions=32, width=32, layers=2, heads=2)
    model = GPT2(cfg)
    params = {"params": load_hf_gpt2(hf.state_dict(), cfg)}

    tokens = np.random.default_rng(0).integers(0, 128, (2, 12)).astype(np.int32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(tokens).long()).logits.numpy()

    emb = model.apply(params, jnp.asarray(tokens), method=GPT2.embed)
    got, _ = model.apply(params, emb)
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4, rtol=2e-3)


def test_gpt2_kv_cache_matches_full_forward():
    cfg = TINY_GPT2
    model = GPT2(cfg)
    rng = jax.random.PRNGKey(0)
    tokens = jax.random.randint(rng, (2, 10), 0, cfg.vocab_size)
    params = model.init(rng, jnp.zeros((2, 10, cfg.width)))

    emb = model.apply(params, tokens, method=GPT2.embed)
    full_logits, _ = model.apply(params, emb)

    # incremental: feed 6-token prompt, then 4 tokens one at a time
    caches = model.apply(params, 2, 16, method=GPT2.init_cache)
    logits, caches = model.apply(params, emb[:, :6], caches=caches, position=0)
    inc = [logits[:, -1]]
    for i in range(6, 10):
        logits, caches = model.apply(params, emb[:, i : i + 1], caches=caches, position=i)
        inc.append(logits[:, -1])
    inc = jnp.stack(inc, axis=1)  # predictions at positions 5..9
    np.testing.assert_allclose(np.asarray(inc), np.asarray(full_logits[:, 5:10]),
                               atol=1e-4, rtol=1e-4)


# ---------------------------------------------------------------------------
# Caption model
# ---------------------------------------------------------------------------


def test_caption_forward_loss_and_generate_shapes():
    model = tiny_caption_model()
    rng = jax.random.PRNGKey(0)
    emb = jax.random.normal(rng, (3, CLIP_DIM))
    toks = jax.random.randint(rng, (3, 8), 1, TINY_GPT2.vocab_size)
    params = model.init(rng, emb, toks)
    loss = model.apply(params, emb, toks)
    assert np.isfinite(float(loss)) and float(loss) > 0

    gen = model.apply(params, emb, rng, max_len=6, method=model.generate)
    assert gen.shape == (3, 6) and gen.dtype == jnp.int32

    sampled = model.apply(params, emb, rng, max_len=6, temperature=0.8,
                          method=model.generate)
    assert sampled.shape == (3, 6)


def test_generate_stops_at_eos():
    model = tiny_caption_model()
    rng = jax.random.PRNGKey(1)
    emb = jax.random.normal(rng, (2, CLIP_DIM))
    toks = jax.random.randint(rng, (2, 8), 1, TINY_GPT2.vocab_size)
    params = model.init(rng, emb, toks)
    # eos_token = the argmax everywhere model? just check padding semantics: tokens after a
    # generated eos are 0
    gen = np.asarray(model.apply(params, emb, rng, max_len=8, eos_token=3,
                                 method=model.generate))
    for row in gen:
        if 3 in row:
            after = row[list(row).index(3) + 1:]
            assert (after == 0).all()


# ---------------------------------------------------------------------------
# BLEU
# ---------------------------------------------------------------------------


def test_bleu_perfect_and_disjoint():
    ref = "a cat sits on the mat".split()
    assert sentence_bleu([ref], ref) == pytest.approx(1.0)
    assert sentence_bleu([ref], "entirely different words here now".split()) < 0.05


def test_bleu_brevity_penalty():
    ref = "a b c d e f g h".split()
    short = sentence_bleu([ref], "a b c d".split())
    full = sentence_bleu([ref], ref)
    assert short < full


def test_corpus_bleu_known_value():
    refs = [[["the", "cat", "sat", "on", "a", "mat"]], [["dogs", "run", "very", "fast", "today"]]]
    hyps = [["the", "cat", "sat", "on", "a", "mat"], ["dogs", "run", "very", "fast", "today"]]
    assert corpus_bleu(refs, hyps) == pytest.approx(1.0)
    # short hypotheses fall back to smoothed higher-order precision (nltk method1)
    assert corpus_bleu([[["a", "b", "c"]]], [["a", "b", "c"]]) < 1.0


# ---------------------------------------------------------------------------
# end-to-end metric: the caption must be learnable from the embedding
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_captioning_metric_learns_synthetic_mapping():
    """Two embedding clusters, each with a fixed caption. After training, generation from a
    cluster's embedding must reproduce its caption (BLEU >> random)."""
    rng = np.random.default_rng(0)
    n_per = 48
    emb_a = rng.normal(2.0, 0.1, (n_per, CLIP_DIM)).astype(np.float32)
    emb_b = rng.normal(-2.0, 0.1, (n_per, CLIP_DIM)).astype(np.float32)
    # captions as token sequences: [5 6 7 eos] and [9 10 11 eos]; eos=3
    tok_a = np.tile(np.array([5, 6, 7, 3, 0, 0], np.int32), (n_per, 1))
    tok_b = np.tile(np.array([9, 10, 11, 3, 0, 0], np.int32), (n_per, 1))
    embeds = np.concatenate([emb_a, emb_b])
    tokens = np.concatenate([tok_a, tok_b])

    metric = CaptioningMetric(
        caption_model=tiny_caption_model(), epochs=14, batch_size=16, lr=2e-3,
        max_gen_len=5,
    )
    params = metric.train(embeds, tokens)

    gen = metric.generate(params, np.concatenate([emb_a[:4], emb_b[:4]]))
    want = [[5, 6, 7], [9, 10, 11]]
    hyps = [[int(t) for t in row if t > 3] for row in gen]
    refs = [[list(map(str, want[0]))]] * 4 + [[list(map(str, want[1]))]] * 4
    bleu = corpus_bleu(refs, [[str(t) for t in h] for h in hyps])
    assert bleu > 0.5, f"BLEU {bleu}; generations {hyps}"


def test_captioning_metric_eos_truncates_hypotheses():
    """With eos_token set, compute() stops decoding at EOS and truncates hypotheses
    before BLEU — without it, post-EOS garbage across max_gen_len deflates the score
    (the reference stops at the EOT/stop token too, captioning.py:178-231)."""
    rng = np.random.default_rng(1)
    n_per = 48
    emb_a = rng.normal(2.0, 0.1, (n_per, CLIP_DIM)).astype(np.float32)
    emb_b = rng.normal(-2.0, 0.1, (n_per, CLIP_DIM)).astype(np.float32)
    tok_a = np.tile(np.array([5, 6, 7, 3, 0, 0], np.int32), (n_per, 1))  # eos=3
    tok_b = np.tile(np.array([9, 10, 11, 3, 0, 0], np.int32), (n_per, 1))
    embeds = np.concatenate([emb_a, emb_b])
    tokens = np.concatenate([tok_a, tok_b])

    detok = lambda ids: " ".join(str(i) for i in ids)  # noqa: E731
    metric = CaptioningMetric(
        caption_model=tiny_caption_model(), epochs=14, batch_size=16, lr=2e-3,
        max_gen_len=12, eos_token=3, detokenizer=detok,
    )
    bleu, info = metric.compute(
        embeds, tokens, np.concatenate([emb_a[:4], emb_b[:4]]),
        ["5 6 7"] * 4 + ["9 10 11"] * 4,
    )
    assert info["num_eval"] == 8
    # max_gen_len is 4x the caption length; only EOS truncation gets BLEU this high
    assert bleu > 0.5, f"BLEU {bleu}"
