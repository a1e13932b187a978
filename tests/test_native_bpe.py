"""Native C++ BPE tokenizer: bit-exact id parity with the Python tokenizer.

The Python tokenizer's ids are themselves parity-pinned against the
reference SimpleTokenizer (test_tokenizer.py), so native == Python here
transitively gives native == reference on the guarded ASCII domain.
"""

import random
import string

import numpy as np
import pytest

from ccmh.tokenizer import native
from ccmh.tokenizer.bpe import default_tokenizer, tokenize_batch

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native tokenizer toolchain unavailable")


CASES = [
    "a photo of a dog on green grass",
    "it's the cat's hat, isn't it?!",
    "we're; you've -- they'll 'd 'm '' ",
    "digits 1 23 456 and mixed a1b2c3",
    "punctuation!!! ...:;##@ /\\[]{}()",
    "",
    "   ",
    "word",
    "supercalifragilisticexpialidocious antidisestablishmentarianism",
    "a " * 100,                       # truncation at max_words
    "odd\x01control\x02chars",        # non-printable ASCII -> shifted plane
    "tabs\tand\nnewlines collapse",
    "UPPER Case MiXeD",
    "'s 't 're 've 'm 'll 'd standalone",
    "'rex 'veto 'mat",                # contraction prefix then letter run
    "trailing apostrophe' and double''s",
]


@pytest.mark.parametrize("max_words", [8, 32])
def test_fixed_cases_parity(max_words):
    tok = default_tokenizer()
    want = np.asarray([tok.encode_padded(t, max_words) for t in CASES], np.int32)
    got = native.encode_padded_batch(CASES, max_words)
    np.testing.assert_array_equal(got, want)


def test_fuzz_parity():
    tok = default_tokenizer()
    rng = random.Random(0)
    alphabet = string.ascii_letters + string.digits + " .,!?'-:;()[]/"
    texts = ["".join(rng.choice(alphabet) for _ in range(rng.randint(0, 80)))
             for _ in range(300)]
    want = np.asarray([tok.encode_padded(t, 32) for t in texts], np.int32)
    got = native.encode_padded_batch(texts, 32)
    np.testing.assert_array_equal(got, want)


def test_eligibility_guard():
    assert native.eligible("plain ascii text!")
    assert not native.eligible("café")               # non-ASCII
    assert not native.eligible("a &amp; b")           # HTML entity
    assert not native.eligible("<|endoftext|> x")     # literal special


def test_tokenize_batch_mixes_native_and_fallback():
    """tokenize_batch routes eligible rows native and the rest through
    Python, preserving order; output equals the all-Python result."""
    tok = default_tokenizer()
    mixed = ["café au lait", "a &amp; b", "plain ascii", "<|endoftext|>!"]
    got = tokenize_batch(mixed, 16)
    want = np.asarray([tok.encode_padded(t, 16) for t in mixed], np.int32)
    np.testing.assert_array_equal(got, want)
    # escape hatch: forcing Python yields the same thing
    np.testing.assert_array_equal(tokenize_batch(mixed, 16, use_native=False), want)


def test_meta_items_equals_per_item():
    """Batched meta assembly (native-BPE tokenize_batch) is bit-identical
    to the per-item meta_item path, masks included."""
    from ccmh.data.dataset import CrossModalDataset
    from ccmh.data.split import RawData

    rng = np.random.RandomState(0)
    caps = np.asarray(
        ["a dog", "it's two cats!", "number 3", "punctuation... ok?"], object)
    raw = RawData(
        captions=caps,
        indexes=np.asarray([np.zeros((8, 8, 3), np.uint8)] * 4, object),
        labels=rng.rand(4, 5).astype(np.float32),
    )
    for with_mask in (False, True):
        ds = CrossModalDataset(raw, is_train=True, max_words=12, resolution=8,
                               seed=3, with_mask=with_mask)
        ds.epoch = 2
        idxs = np.asarray([2, 0, 3, 1])
        got = ds.meta_items(idxs)
        items = [ds.meta_item(int(i)) for i in idxs]
        for key in items[0]:
            np.testing.assert_array_equal(
                got[key], np.stack([it[key] for it in items]), err_msg=key)
