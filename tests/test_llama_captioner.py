"""Llama captioner adapter (models/llama_captioner.py; reference Models/llamaCaptioner:8-114):
driven end-to-end against a tiny random local LlamaForCausalLM snapshot — no hub access
needed, which is exactly the adapter's deployment story (pass a local snapshot path)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from multimodal_tpu.models.llama_captioner import LlamaCaptioner  # noqa: E402

CLIP_DIM = 32
HIDDEN = 32
VOCAB = 256


@pytest.fixture(scope="module")
def llama_snapshot(tmp_path_factory):
    """A complete local snapshot: tiny random LlamaForCausalLM + a word-level fast
    tokenizer, both loadable via Auto* with local_files_only=True."""
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace
    from transformers import LlamaConfig, LlamaForCausalLM, PreTrainedTokenizerFast

    path = tmp_path_factory.mktemp("llama_tiny")

    torch.manual_seed(0)
    cfg = LlamaConfig(
        vocab_size=VOCAB, hidden_size=HIDDEN, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, bos_token_id=1, eos_token_id=2,
    )
    LlamaForCausalLM(cfg).save_pretrained(path)

    words = ["<unk>", "<s>", "</s>", "A", "photo", "of", "a", "the", "cat", "dog",
             "red", "blue", "circle", "square", "on", "and", "small", "large"]
    vocab = {w: i for i, w in enumerate(words)}
    tok = Tokenizer(WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = Whitespace()
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok, unk_token="<unk>", bos_token="<s>", eos_token="</s>",
    )
    fast.save_pretrained(path)
    return str(path)


def test_generate_shapes_and_determinism(llama_snapshot):
    cap = LlamaCaptioner(llama_snapshot, clip_dim=CLIP_DIM, max_new_tokens=8)
    embeds = np.random.default_rng(0).standard_normal((2, CLIP_DIM)).astype(np.float32)

    prefix = cap.project(embeds)
    assert prefix.shape == (2, 1, HIDDEN)
    assert np.isfinite(prefix).all()

    caps1 = cap.generate_caption(embeds, prompt="A photo of")
    caps2 = cap.generate_caption(embeds, prompt="A photo of")
    assert len(caps1) == 2
    assert all(isinstance(c, str) for c in caps1)
    assert caps1 == caps2, "greedy decode must be deterministic"


def test_prefix_conditions_output(llama_snapshot):
    """Different CLIP embeddings reach the LM: the soft prefix must be able to change
    the greedy decode (with a tiny random LM almost any two prefixes diverge)."""
    cap = LlamaCaptioner(llama_snapshot, clip_dim=CLIP_DIM, max_new_tokens=8)
    rng = np.random.default_rng(1)
    a = rng.standard_normal((1, CLIP_DIM)).astype(np.float32) * 8
    b = -a
    out = cap.generate_caption(np.concatenate([a, b]), prompt="the")
    assert out[0] != out[1], "prefix had no effect on the decode"
