"""Text -> phoneme-id tokenisation (host-side, pre-processing).

Replacement for `naturalspeech2_pytorch.utils.tokenizer.Tokenizer`
(reference call sites voicebox_pytorch.py:25,636-642,706,780-782): espeak-backed
text->phoneme ids with pad id -1. Phonemisation is host-side string work, not
device code (SURVEY.md §7 hard-parts list), so this is plain Python:

* espeak backend when the `phonemizer` package + espeak-ng library exist
  (gated — NOT in this image);
* deterministic grapheme fallback otherwise: a fixed character vocabulary so
  ids are stable across runs/processes. For TTS quality a real phonemizer
  matters; for the framework contract (ids in [0, vocab), pad -1) the fallback
  is exact.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

__all__ = ["Tokenizer", "GraphemeTokenizer", "ESPEAK_AVAILABLE"]

try:  # pragma: no cover - not installed in this image
    from phonemizer.backend import EspeakBackend  # noqa: F401

    ESPEAK_AVAILABLE = True
except Exception:  # pragma: no cover
    ESPEAK_AVAILABLE = False


_DEFAULT_CHARSET = (
    " abcdefghijklmnopqrstuvwxyz0123456789!'(),-.:;?"
)


class GraphemeTokenizer:
    """Deterministic char-level fallback tokenizer. pad id = -1."""

    def __init__(self, charset: str = _DEFAULT_CHARSET):
        self.charset = charset
        self._to_id = {c: i for i, c in enumerate(charset)}

    @property
    def vocab_size(self) -> int:
        return len(self.charset)

    def encode(self, text: str) -> List[int]:
        text = text.lower()
        return [self._to_id[c] for c in text if c in self._to_id]

    def texts_to_tensor_ids(self, texts: Sequence[str], max_length: Optional[int] = None) -> np.ndarray:
        """(len(texts), max_len) int array, padded with -1 — the reference's
        pad convention (voicebox_pytorch.py:806-811)."""
        encoded = [self.encode(t) for t in texts]
        target = max(len(e) for e in encoded)
        if max_length is not None:
            target = min(target, max_length)
        out = np.full((len(texts), target), -1, dtype=np.int32)
        for i, e in enumerate(encoded):
            out[i, : min(len(e), target)] = e[:target]
        return out


# Fixed, pre-enumerated IPA symbol table (espeak-ng en-us inventory with
# stress/length marks, plus latin letters, digits, punctuation). The table is
# FROZEN: ids are stable across runs and processes, and the embedding sized
# from vocab_size can never be out-indexed — symbols outside the table map to
# the reserved <unk> id 0 instead of growing the vocabulary.
_IPA_SYMBOLS = (
    ["<unk>", " "]
    + list("abcdefghijklmnopqrstuvwxyz")
    + list("ABCDEFGHIJKLMNOPQRSTUVWXYZ")
    + list("0123456789")
    + list("!'(),-.:;?\"")
    + list("æɑɒɔəɚɛɜɝɪʊʌʒʃθðŋɹɾɡɫɬɱɳɲʔʕχʁħʰʲʷ")
    + list("ãẽĩõũáéíóúàèìòùâêîôû")
    + list("ˈˌːˑ̩̃‿͡")
    + list("ᵻɐɨʉɘɵɤøœɶɞʏʎʋʍɸβɗɖʂʐɻɽɢʡʢǀǁǂǃ")
)


class EspeakTokenizer:
    """IPA-phoneme tokenizer via phonemizer/espeak-ng, over the frozen
    `_IPA_SYMBOLS` table (see above: run-stable ids, bounded vocab).

    `backend` is injectable: anything with `.phonemize(list[str]) ->
    list[str]` (IPA strings). Default constructs the espeak-ng backend —
    gated on the phonemizer package being installed."""

    def __init__(self, language: str = "en-us", backend=None):
        if backend is None:  # pragma: no cover - requires espeak-ng
            from phonemizer.backend import EspeakBackend

            backend = EspeakBackend(
                language, preserve_punctuation=True, with_stress=True
            )
        self.backend = backend
        self._vocab: List[str] = list(_IPA_SYMBOLS)
        self._to_id = {s: i for i, s in enumerate(self._vocab)}

    def _sym_id(self, s: str) -> int:
        return self._to_id.get(s, 0)  # unknown symbol -> <unk>

    @property
    def vocab_size(self) -> int:
        return max(len(self._vocab), 256)

    def texts_to_tensor_ids(self, texts: Sequence[str], max_length: Optional[int] = None) -> np.ndarray:
        phonemized = self.backend.phonemize(list(texts))
        encoded = [[self._sym_id(c) for c in p] for p in phonemized]
        target = max(len(e) for e in encoded)
        if max_length is not None:
            target = min(target, max_length)
        out = np.full((len(texts), target), -1, dtype=np.int32)
        for i, e in enumerate(encoded):
            out[i, : min(len(e), target)] = e[:target]
        return out


def Tokenizer(**kwargs):
    """Factory matching the reference's default-constructed `Tokenizer()`
    (voicebox_pytorch.py:636-637): espeak when available, grapheme fallback
    otherwise."""
    if ESPEAK_AVAILABLE:
        return EspeakTokenizer(**kwargs)
    return GraphemeTokenizer(**kwargs)
