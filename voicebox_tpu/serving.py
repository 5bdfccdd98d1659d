"""Batched synthesis engine for serving.

The reference is library-only (SURVEY.md §1: "no CLI, no serving layer");
production deployment on TPU needs one thing the ad-hoc path doesn't give you:
**no compiles on the request path**. XLA compiles one program per input shape,
so the engine quantises every request onto a fixed grid of (batch, length)
buckets and pre-compiles each bucket once at startup (`warmup()`), then serves
from the cache with padding + masking.

    engine = TTSEngine(cfm_wrapper, text_buckets=(64, 128), batch_buckets=(1, 4))
    engine.warmup()                       # compile all bucket programs
    audio = engine.synthesize(["hello world"])   # ms-latency, no compiles
"""

from __future__ import annotations

import time
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["TTSEngine"]


class TTSEngine:
    def __init__(
        self,
        cfm_wrapper,
        *,
        text_buckets: Sequence[int] = (32, 64, 128, 256),
        batch_buckets: Sequence[int] = (1, 2, 4, 8),
        steps: int = 3,
        cond_scale: float = 1.3,
        max_semantic_token_ids: int = 1024,
        spec_decode: bool = True,
        decode_to_audio: bool = True,
    ):
        assert cfm_wrapper.params is not None, "wrapper must be initialised"
        assert cfm_wrapper.text_to_semantic is not None, (
            "TTSEngine serves the text->semantic pipeline; the duration-"
            "predictor pipeline needs a per-request voice prompt — call "
            "wrapper.sample(cond=..., phoneme_ids=...) directly for that"
        )
        self.wrapper = cfm_wrapper
        self.text_buckets = tuple(sorted(text_buckets))
        self.batch_buckets = tuple(sorted(batch_buckets))
        self.steps = steps
        self.cond_scale = cond_scale
        self.max_semantic_token_ids = max_semantic_token_ids
        self.spec_decode = spec_decode
        self.decode_to_audio = decode_to_audio
        self._warm = False

    # ------------------------------------------------------------------

    def _tokenizer(self):
        # __init__ asserts text_to_semantic is present
        return self.wrapper.text_to_semantic.tokenizer

    def _bucket(self, value: int, buckets: Sequence[int]) -> int:
        for b in buckets:
            if value <= b:
                return b
        return buckets[-1]

    def _pad_ids(self, ids: np.ndarray, batch: int, length: int) -> np.ndarray:
        out = np.full((batch, length), -1, dtype=np.int32)
        b = min(ids.shape[0], batch)
        n = min(ids.shape[1], length)
        out[:b, :n] = ids[:b, :n]
        return out

    # ------------------------------------------------------------------

    def synthesize(self, texts: List[str], rng=None):
        """texts -> audio (or latents when decode_to_audio=False), padded to
        the enclosing (batch, text-length) bucket and trimmed back. Requests
        beyond the largest batch bucket are served in successive chunks (every
        text gets audio); a text longer than the largest text bucket raises —
        silent truncation would return cut-off speech."""
        tok = self._tokenizer()
        ids_all = np.asarray(tok.texts_to_tensor_ids(list(texts)))

        if ids_all.shape[1] > self.text_buckets[-1]:
            raise ValueError(
                f"text of {ids_all.shape[1]} tokens exceeds the largest text "
                f"bucket {self.text_buckets[-1]}; raise text_buckets or split "
                "the text"
            )
        length = self._bucket(ids_all.shape[1], self.text_buckets)

        n_req = len(texts)
        max_batch = self.batch_buckets[-1]
        outs = []
        for start in range(0, n_req, max_batch):
            chunk = ids_all[start : start + max_batch]
            batch = self._bucket(chunk.shape[0], self.batch_buckets)
            ids = self._pad_ids(chunk, batch, length)
            if rng is not None:
                rng, chunk_rng = jax.random.split(rng)
            else:
                chunk_rng = None
            out = self.wrapper.sample(
                **self._id_kwarg(ids),
                steps=self.steps,
                cond_scale=self.cond_scale,
                max_semantic_token_ids=self.max_semantic_token_ids,
                spec_decode=self.spec_decode,
                decode_to_audio=self.decode_to_audio,
                rng=chunk_rng,
            )
            outs.append(out[: chunk.shape[0]])
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)

    def _id_kwarg(self, ids: np.ndarray) -> dict:
        return {"text_token_ids": jnp.asarray(ids)}

    def warmup(self, verbose: bool = False) -> float:
        """Pre-compile every (batch, text-length) bucket; returns seconds."""
        t0 = time.time()
        for batch in self.batch_buckets:
            for length in self.text_buckets:
                dummy = ["a"] * batch
                ids = self._pad_ids(
                    self._tokenizer().texts_to_tensor_ids(dummy), batch, length
                )
                out = self.wrapper.sample(
                    **self._id_kwarg(ids),
                    steps=self.steps,
                    cond_scale=self.cond_scale,
                    max_semantic_token_ids=self.max_semantic_token_ids,
                    spec_decode=self.spec_decode,
                    decode_to_audio=self.decode_to_audio,
                )
                jnp.asarray(out).block_until_ready()
                if verbose:
                    print(f"warm bucket batch={batch} len={length}", flush=True)
        self._warm = True
        return time.time() - t0
