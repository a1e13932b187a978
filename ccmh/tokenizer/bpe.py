"""Byte-level BPE tokenizer with exact OpenAI-CLIP token-id parity.

Host-side (pure Python) component of the data pipeline: tokenization is
inherently string processing and does not belong on the TPU.  The contract
is *bit-exact id parity* with the reference tokenizer
(reference: model/base/simple_tokenizer.py:62-143) so that text encoders
trained here and there see identical token streams.

The vocab asset ``ccmh/assets/bpe_simple_vocab_16e6.txt.gz`` is the standard
public OpenAI CLIP merge table (49,152-token vocab: 256 byte symbols, the
same 256 with an end-of-word marker, 48,894 merges, and two specials).
"""

from __future__ import annotations

import functools
import gzip
import html
import os
import unicodedata
from typing import Dict, List, Sequence, Tuple

import numpy as np
import regex

try:  # ftfy is optional; captions in the standard datasets are ASCII-clean.
    import ftfy

    def _fix_text(text: str) -> str:
        return ftfy.fix_text(text)
except ImportError:  # pragma: no cover - environment without ftfy
    def _fix_text(text: str) -> str:
        # Cheap stand-in: mojibake repair is a no-op for well-formed input;
        # NFC normalisation covers the common decomposed-accent case.
        return unicodedata.normalize("NFC", text)

VOCAB_SIZE = 49408
CONTEXT_LENGTH = 77
SOT_TOKEN = "<|startoftext|>"
EOT_TOKEN = "<|endoftext|>"

_ASSET_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "assets")
DEFAULT_VOCAB_PATH = os.path.join(_ASSET_DIR, "bpe_simple_vocab_16e6.txt.gz")

# Word-splitting pattern shared with the reference tokenizer
# (model/base/simple_tokenizer.py:82): specials, English contractions,
# letter runs, single digits, punctuation runs.
_WORD_PATTERN = regex.compile(
    r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"""
    r"""|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
    regex.IGNORECASE,
)
_WS_PATTERN = regex.compile(r"\s+")


@functools.lru_cache()
def byte_to_unicode_table() -> Dict[int, str]:
    """Invertible map from the 256 byte values to printable unicode chars.

    Printable ASCII/latin bytes map to themselves; the rest are shifted into
    the 0x100+ plane so no vocab entry is whitespace or a control character.
    """
    visible = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    table: Dict[int, str] = {b: chr(b) for b in visible}
    offset = 0
    for b in range(256):
        if b not in table:
            table[b] = chr(0x100 + offset)
            offset += 1
    return table


def _clean(text: str) -> str:
    text = _fix_text(text)
    text = html.unescape(html.unescape(text))
    text = _WS_PATTERN.sub(" ", text.strip())
    return text.strip().lower()


class ClipBpeTokenizer:
    """Greedy lowest-rank-first byte-pair encoder over the CLIP merge table."""

    def __init__(self, vocab_path: str = DEFAULT_VOCAB_PATH):
        self._byte_enc = byte_to_unicode_table()
        self._byte_dec = {c: b for b, c in self._byte_enc.items()}

        with gzip.open(vocab_path, "rt", encoding="utf-8") as fh:
            lines = fh.read().split("\n")
        # Line 0 is a header; the usable merge table is exactly
        # vocab_size - 2*256 byte symbols - 2 specials entries long.
        n_merges = VOCAB_SIZE - 2 * 256 - 2
        merges: List[Tuple[str, str]] = []
        for line in lines[1 : 1 + n_merges]:
            a, b = line.split()
            merges.append((a, b))
        self._rank: Dict[Tuple[str, str], int] = {m: i for i, m in enumerate(merges)}

        symbols = list(self._byte_enc.values())
        entries = symbols + [s + "</w>" for s in symbols] + ["".join(m) for m in merges]
        entries += [SOT_TOKEN, EOT_TOKEN]
        self.encoder: Dict[str, int] = {tok: i for i, tok in enumerate(entries)}
        self.decoder: Dict[int, str] = {i: tok for tok, i in self.encoder.items()}
        self._bpe_cache: Dict[str, List[str]] = {
            SOT_TOKEN: [SOT_TOKEN],
            EOT_TOKEN: [EOT_TOKEN],
        }

    @property
    def sot_id(self) -> int:
        return self.encoder[SOT_TOKEN]

    @property
    def eot_id(self) -> int:
        return self.encoder[EOT_TOKEN]

    def _merge_word(self, token: str) -> List[str]:
        cached = self._bpe_cache.get(token)
        if cached is not None:
            return cached
        if len(token) == 0:
            return []
        parts: List[str] = list(token[:-1]) + [token[-1] + "</w>"]
        while len(parts) > 1:
            best_rank = None
            best_idx = -1
            for i in range(len(parts) - 1):
                r = self._rank.get((parts[i], parts[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank = r
                    best_idx = i
            if best_rank is None:
                break
            merged = parts[best_idx] + parts[best_idx + 1]
            # Fuse every occurrence of this exact pair left-to-right, same as
            # the canonical BPE merge step.
            out: List[str] = []
            i = 0
            while i < len(parts):
                if (
                    i + 1 < len(parts)
                    and parts[i] == parts[best_idx]
                    and parts[i + 1] == parts[best_idx + 1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(parts[i])
                    i += 1
            parts = out
        self._bpe_cache[token] = parts
        return parts

    def tokenize(self, text: str) -> List[str]:
        """Text -> list of BPE token strings (reference parity: ``tokenize``)."""
        pieces: List[str] = []
        for word in _WORD_PATTERN.findall(_clean(text)):
            mapped = "".join(self._byte_enc[b] for b in word.encode("utf-8"))
            pieces.extend(self._merge_word(mapped))
        return pieces

    def convert_tokens_to_ids(self, tokens: Sequence[str]) -> List[int]:
        return [self.encoder[t] for t in tokens]

    def encode(self, text: str) -> List[int]:
        return self.convert_tokens_to_ids(self.tokenize(text))

    def decode(self, ids: Sequence[int]) -> str:
        joined = "".join(self.decoder[i] for i in ids)
        raw = bytes(self._byte_dec[c] for c in joined if c in self._byte_dec)
        return raw.decode("utf-8", errors="replace").replace("</w>", " ")

    def encode_padded(self, text: str, max_words: int = 32) -> List[int]:
        """SOT + tokens (truncated) + EOT, zero-padded to ``max_words``.

        Mirrors the caption path of the reference dataset
        (dataset/base.py:64-81): truncate the token list to max_words-1
        *including* the SOT token, then append EOT, then pad with 0.
        """
        tokens = [SOT_TOKEN] + self.tokenize(text)
        tokens = tokens[: max_words - 1] + [EOT_TOKEN]
        ids = self.convert_tokens_to_ids(tokens)
        return ids + [0] * (max_words - len(ids))


@functools.lru_cache()
def default_tokenizer() -> ClipBpeTokenizer:
    return ClipBpeTokenizer()


def tokenize_batch(
    texts: Sequence[str], max_words: int = 32, use_native: bool = None
) -> np.ndarray:
    """Vectorised host-side helper: list of strings -> int32 [B, max_words].

    ASCII texts (no HTML entities / literal specials) ride the native C++
    tokenizer when its toolchain is available — bit-identical ids, GIL-free
    and threaded (the serving daemon's text path tokenizes on request
    threads).  Everything else uses the pure-Python tokenizer.  Set
    ``CCMH_NATIVE_BPE=0`` (or ``use_native=False``) to force Python.
    """
    texts = list(texts)
    if not texts:  # keep the [B, max_words] contract for empty batches
        return np.zeros((0, max_words), np.int32)
    if use_native is None:
        use_native = os.environ.get("CCMH_NATIVE_BPE", "1") != "0"
    if use_native and texts:
        from ccmh.tokenizer import native

        elig = [native.eligible(t) for t in texts]
        if any(elig) and native.available():
            out = np.zeros((len(texts), max_words), np.int32)
            idx = [i for i, e in enumerate(elig) if e]
            out[idx] = native.encode_padded_batch(
                [texts[i] for i in idx], max_words)
            if len(idx) < len(texts):
                tok = default_tokenizer()
                for i, e in enumerate(elig):
                    if not e:
                        out[i] = tok.encode_padded(texts[i], max_words)
            return out
    tok = default_tokenizer()
    return np.asarray([tok.encode_padded(t, max_words) for t in texts], dtype=np.int32)
