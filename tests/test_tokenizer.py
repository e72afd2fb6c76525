"""BPE tokenizer parity tests.

Ground truth comes from two independent sources: (a) HuggingFace's CLIPTokenizer (an
independent implementation of the same BPE), instantiated locally from vocab/merges files we
derive from the vocab asset; (b) hand-known CLIP token ids. The reference requires bit-exact
tokens on the 49,408-token vocabulary (align_clip/tokenizer.py:72-188)."""

import gzip
import json

import numpy as np
import pytest

from multimodal_tpu.data.tokenizer import (
    CONTEXT_LENGTH,
    DEFAULT_BPE_PATH,
    SimpleTokenizer,
    tokenize,
)

CASES = [
    "a photo of a cat",
    "A PHOTO OF A CAT!!!",
    "the quick brown fox jumps over the lazy dog",
    "it's a dog's breakfast, isn't it?",
    "123 456.789 100%",
    "hello-world foo_bar baz@qux.com",
    "  extra   whitespace \t and\nnewlines  ",
    "café naïve résumé",
    "emoji \U0001f600 \U0001f308 test",
    "<|startoftext|> special <|endoftext|>",
    "",
]


@pytest.fixture(scope="module")
def tok():
    return SimpleTokenizer()


@pytest.fixture(scope="module")
def hf_tok(tok, tmp_path_factory):
    transformers = pytest.importorskip("transformers")
    d = tmp_path_factory.mktemp("cliptok")
    (d / "vocab.json").write_text(json.dumps(tok.encoder, ensure_ascii=False))
    with gzip.open(DEFAULT_BPE_PATH, "rt", encoding="utf-8") as f:
        lines = f.read().split("\n")
    merges = lines[1 : 49152 - 256 - 2 + 1]
    (d / "merges.txt").write_text("\n".join(["#version: 0.2"] + merges))
    return transformers.CLIPTokenizer(
        str(d / "vocab.json"), str(d / "merges.txt")
    )


def test_vocab_size(tok):
    assert tok.vocab_size == 49408
    assert tok.sot_token_id == 49406
    assert tok.eot_token_id == 49407


def test_known_ids(tok):
    # canonical CLIP tokenization, widely documented
    assert tok.encode("a photo of a cat") == [320, 1125, 539, 320, 2368]


@pytest.mark.parametrize("text", CASES)
def test_matches_huggingface(tok, hf_tok, text):
    ours = tok.encode(text)
    theirs = hf_tok(text, add_special_tokens=False)["input_ids"]
    assert ours == theirs, f"{text!r}: {ours} != {theirs}"


def test_tokenize_shape_and_framing(tok):
    out = tokenize(["a photo of a cat", "hi"], tokenizer=tok)
    assert out.shape == (2, CONTEXT_LENGTH) and out.dtype == np.int32
    assert out[0, 0] == tok.sot_token_id
    row = out[0]
    eot_pos = int(np.argmax(row == tok.eot_token_id))
    assert eot_pos == 6  # sot + 5 tokens
    assert (row[eot_pos + 1 :] == 0).all()


def test_truncation_keeps_eot(tok):
    long_text = " ".join(["dog"] * 200)
    out = tokenize([long_text], tokenizer=tok)
    assert out.shape == (1, CONTEXT_LENGTH)
    assert out[0, -1] == tok.eot_token_id
    assert (out[0] != 0).all()


def test_roundtrip_decode(tok):
    text = "the quick brown fox"
    assert tok.decode(tok.encode(text)).strip() == "the quick brown fox"


def test_batch_threading_consistent(tok):
    texts = [f"sample caption number {i}" for i in range(200)]
    batched = tokenize(texts, tokenizer=tok)
    single = np.stack([tokenize([t], tokenizer=tok)[0] for t in texts])
    np.testing.assert_array_equal(batched, single)


# ---------------------------------------------------------------------------
# native C++ BPE fast path
# ---------------------------------------------------------------------------


def test_native_bpe_bit_exact_with_python(tok):
    from multimodal_tpu.data.tokenizer import DEFAULT_BPE_PATH
    from multimodal_tpu.native.bindings import bpe_encode_batch

    ascii_cases = [c for c in CASES if all(ord(ch) < 128 for ch in c) and "&" not in c]
    extra = ["!!!'s odd apostrophes ''s", "we'll they're you've i'm i'd don't",
             "x" * 500, "a.b,c;d:e!f?g", "'llamas 'd 're"]
    cases = ascii_cases + extra
    nat = bpe_encode_batch(cases, DEFAULT_BPE_PATH)
    assert nat is not None
    py = tokenize(cases, use_native=False)
    np.testing.assert_array_equal(nat, py)


def test_native_bpe_fallback_gating():
    from multimodal_tpu.data.tokenizer import DEFAULT_BPE_PATH
    from multimodal_tpu.native.bindings import bpe_encode_batch

    assert bpe_encode_batch(["café au lait"], DEFAULT_BPE_PATH) is None  # non-ASCII
    assert bpe_encode_batch(["a &amp; b"], DEFAULT_BPE_PATH) is None  # HTML entity
    # the public tokenize() transparently falls back and still matches pure python
    mixed = ["plain ascii caption", "café au lait", "a &amp; b"]
    np.testing.assert_array_equal(tokenize(mixed), tokenize(mixed, use_native=False))


def test_tokenize_default_uses_native_when_eligible():
    got = tokenize(["a photo of a cat"])
    want = tokenize(["a photo of a cat"], use_native=False)
    np.testing.assert_array_equal(got, want)
    assert got[0, 0] == 49406 and 49407 in got[0]


def test_mojibake_tokenizes_like_clean_text(tok):
    """ftfy-parity on dirty web captions (reference tokenizer.py:60-63 applies ftfy
    unconditionally; data/textfix.py vendors the cp1252-mojibake subset): the mojibake
    form must produce the SAME token ids as the clean form in any environment."""
    pairs = [
        ("CafÃ© de Paris", "Café de Paris"),
        ("CafÃƒÂ©", "Café"),                      # double-encoded
        ("donâ€™t stop believinâ€™", "don’t stop believin’"),
        ("ðŸ˜€ smiling face", "😀 smiling face"),  # mojibake emoji
        ("mÃ¼nchen weiÃŸbier", "münchen weißbier"),
    ]
    dirty, clean = zip(*pairs)
    np.testing.assert_array_equal(tokenize(list(dirty)), tokenize(list(clean)))


def test_clean_unicode_passes_through(tok):
    """Genuine accents/emoji must NOT be mangled by the mojibake repair."""
    cases = ["São Paulo café", "naïve résumé", "a 😀 in text", "日本語のキャプション"]
    ids = tokenize(cases)
    # identity check at the string level via the internal cleaner
    from multimodal_tpu.data.tokenizer import _clean

    for c in cases:
        assert _clean(c) == c
    assert (ids[:, 0] == 49406).all()


def test_nfd_nfc_agree(tok):
    import unicodedata

    composed = "Café naïve résumé"
    decomposed = unicodedata.normalize("NFD", composed)
    assert composed != decomposed  # the test is vacuous otherwise
    np.testing.assert_array_equal(tokenize([composed]), tokenize([decomposed]))
