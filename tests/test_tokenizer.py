"""Tokenizer parity vs the reference SimpleTokenizer (exact id match)."""

import numpy as np
import pytest

from ccmh.tokenizer import ClipBpeTokenizer, tokenize_batch
from tests.conftest import load_reference_module

SENTENCES = [
    "a photo of a cat",
    "A man riding a wave on top of a surfboard.",
    "two dogs playing in the snow, with mountains behind them!",
    "the quick brown fox jumps over the lazy dog 1234",
    "weird   spacing\tand\nnewlines",
    "punctuation?! (lots); of:: it...",
    "don't stop believin'",
    "x",
    "",
    "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa supercalifragilistic",
]


@pytest.fixture(scope="module")
def tok():
    return ClipBpeTokenizer()


@pytest.fixture(scope="module")
def ref_tok():
    mod = load_reference_module("model/base/simple_tokenizer.py")
    return mod.SimpleTokenizer()


def test_vocab_size(tok):
    assert len(tok.encoder) == 49408
    assert tok.sot_id == 49406
    assert tok.eot_id == 49407


@pytest.mark.parametrize("text", SENTENCES)
def test_encode_parity(tok, ref_tok, text):
    assert tok.encode(text) == ref_tok.encode(text)


@pytest.mark.parametrize("text", SENTENCES)
def test_tokenize_parity(tok, ref_tok, text):
    assert tok.tokenize(text) == ref_tok.tokenize(text)


def test_known_ids(tok):
    # Golden values from the public OpenAI CLIP tokenizer.
    assert tok.encode("a photo of a cat") == [320, 1125, 539, 320, 2368]


def test_roundtrip(tok):
    text = "a photo of a cat"
    assert tok.decode(tok.encode(text)).strip() == text


def test_padded_encoding_matches_reference_dataset_path(tok, ref_tok):
    """Replicates dataset/base.py:64-81: SOT + tokens truncated + EOT + pad."""
    max_words = 32
    for text in SENTENCES:
        words = ["<|startoftext|>"] + ref_tok.tokenize(text)
        words = words[: max_words - 1] + ["<|endoftext|>"]
        expected = ref_tok.convert_tokens_to_ids(words)
        expected = expected + [0] * (max_words - len(expected))
        assert tok.encode_padded(text, max_words) == expected


def test_truncation():
    tok = ClipBpeTokenizer()
    long_text = " ".join(["word"] * 100)
    ids = tok.encode_padded(long_text, 32)
    assert len(ids) == 32
    assert ids[0] == tok.sot_id
    assert ids[31] == tok.eot_id


def test_batch_shape():
    out = tokenize_batch(["a cat", "a dog"], max_words=32)
    assert out.shape == (2, 32)
    assert out.dtype == np.int32
