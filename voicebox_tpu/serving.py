"""Batched synthesis engine for serving.

The reference is library-only (SURVEY.md §1: "no CLI, no serving layer");
production deployment on TPU needs one thing the ad-hoc path doesn't give you:
**no compiles on the request path**. XLA compiles one program per input shape,
so the engine quantises every request onto a fixed grid of (batch, length)
buckets and pre-compiles each bucket once at startup (`warmup()`), then serves
from the cache with padding + masking.

Both reference conditioning pipelines are served
(voicebox_pytorch.py:1213-1241):

* **semantic** (Spear-TTS TextToSemantic attached): texts -> AR-generated
  semantic ids in a fixed buffer -> CFM sample;
* **duration** (DurationPredictor attached): texts/phonemes -> predicted
  durations -> aligned ids at a STATIC frame horizon (`frame_length`) ->
  CFM sample. The horizon bucket is a deterministic function of the text
  bucket, so warmup covers every request-path program.

    engine = TTSEngine(cfm_wrapper, text_buckets=(64, 128), batch_buckets=(1, 4))
    engine.warmup()                       # compile all bucket programs
    audio, lengths = engine.synthesize(["hello"], return_lengths=True)
    clips = engine.synthesize(["hello"], trim=True)   # list of trimmed arrays
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
        # duration pipeline: frame horizon = frames_per_token * text bucket,
        # rounded up into frame_buckets
        frames_per_token: int = 8,
        frame_buckets: Optional[Sequence[int]] = None,
        # "int8": serve the denoiser's transformer matmuls on the MXU's s8
        # path; "w8a16": weight-only int8 with in-VMEM Pallas dequant — best
        # per-request latency for large models at small batch (ops/quant.py).
        # Small output perturbation; off by default
        quantize: Optional[str] = None,
        # serve from bf16-stored params: numerically free for a bf16-compute
        # model, halves the f32 weight HBM read (ops/quant.py::
        # cast_float_params) — measured 1.10x per-request at dim 1024
        param_store_dtype: Optional[jnp.dtype] = None,
        # persist compiled bucket programs across process restarts: warmup
        # after the first deploy skips XLA compilation entirely
        # (utils/compilation_cache.py)
        compilation_cache_dir: Optional[str] = None,
    ):
        if compilation_cache_dir is not None:
            from .utils.compilation_cache import enable_compilation_cache

            enable_compilation_cache(compilation_cache_dir)
        assert cfm_wrapper.params is not None, "wrapper must be initialised"
        assert (
            cfm_wrapper.text_to_semantic is not None
            or cfm_wrapper.duration_predictor is not None
        ), (
            "TTSEngine needs a conditioning pipeline: attach a TextToSemantic "
            "(text->semantic) or a DurationPredictor to the wrapper"
        )
        self.wrapper = cfm_wrapper
        self.mode = (
            "semantic" if cfm_wrapper.text_to_semantic is not None else "duration"
        )
        self.text_buckets = tuple(sorted(text_buckets))
        self.batch_buckets = tuple(sorted(batch_buckets))
        self.steps = steps
        self.cond_scale = cond_scale
        self.max_semantic_token_ids = max_semantic_token_ids
        self.spec_decode = spec_decode
        self.decode_to_audio = decode_to_audio
        self.frames_per_token = frames_per_token
        self.quantize = quantize
        self.param_store_dtype = param_store_dtype
        if frame_buckets is None:
            frame_buckets = tuple(b * frames_per_token for b in self.text_buckets)
        self.frame_buckets = tuple(sorted(frame_buckets))
        self._warm = False

    # ------------------------------------------------------------------

    def _tokenizer(self):
        if self.mode == "semantic":
            return self.wrapper.text_to_semantic.tokenizer
        return self.wrapper.duration_predictor.tokenizer

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

    def _sample_kwargs(self, ids: np.ndarray) -> dict:
        if self.mode == "semantic":
            return {
                "text_token_ids": jnp.asarray(ids),
                "max_semantic_token_ids": self.max_semantic_token_ids,
                "spec_decode": self.spec_decode,
            }
        # duration pipeline: pad id -1 -> clamp handled by the predictor;
        # the static frame horizon is derived from the text bucket
        frame_length = self._bucket(
            ids.shape[1] * self.frames_per_token, self.frame_buckets
        )
        return {
            "phoneme_ids": jnp.asarray(ids),
            "frame_length": frame_length,
        }

    # ------------------------------------------------------------------

    def synthesize(
        self,
        texts: List[str],
        rng=None,
        return_lengths: bool = False,
        trim: bool = False,
    ):
        """texts -> audio (or latents when decode_to_audio=False), padded to
        the enclosing (batch, text-length) bucket and trimmed back along the
        batch dim. Requests beyond the largest batch bucket are served in
        successive chunks (every text gets audio); a text longer than the
        largest text bucket raises — silent truncation would return cut-off
        speech.

        The time axis always spans the full bucket horizon (static shapes);
        `return_lengths=True` additionally returns per-request valid lengths
        (samples of audio / frames of latents), and `trim=True` returns a
        LIST of per-request numpy arrays cut to those lengths instead."""
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
        outs, lens = [], []
        for start in range(0, n_req, max_batch):
            chunk = ids_all[start : start + max_batch]
            batch = self._bucket(chunk.shape[0], self.batch_buckets)
            ids = self._pad_ids(chunk, batch, length)
            if rng is not None:
                rng, chunk_rng = jax.random.split(rng)
            else:
                chunk_rng = None
            out, out_lens = self.wrapper.sample(
                **self._sample_kwargs(ids),
                steps=self.steps,
                cond_scale=self.cond_scale,
                decode_to_audio=self.decode_to_audio,
                return_lengths=True,
                quantize=self.quantize,
                param_store_dtype=self.param_store_dtype,
                rng=chunk_rng,
            )
            outs.append(out[: chunk.shape[0]])
            lens.append(out_lens[: chunk.shape[0]])
        out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
        lengths = lens[0] if len(lens) == 1 else jnp.concatenate(lens, axis=0)
        if trim:
            out_np, lengths_np = np.asarray(out), np.asarray(lengths)
            if self.decode_to_audio:  # audio: time is the LAST axis
                return [o[..., :n] for o, n in zip(out_np, lengths_np)]
            # latents (n, d) / codes (n, q): time is the leading axis
            return [o[:n] for o, n in zip(out_np, lengths_np)]
        if return_lengths:
            return out, lengths
        return out

    def warmup(self, verbose: bool = False) -> float:
        """Pre-compile every (batch, text-length) bucket; returns seconds."""
        t0 = time.time()
        for batch in self.batch_buckets:
            for length in self.text_buckets:
                dummy = ["a"] * batch
                ids = self._pad_ids(
                    self._tokenizer().texts_to_tensor_ids(dummy), batch, length
                )
                out, _ = self.wrapper.sample(
                    **self._sample_kwargs(ids),
                    steps=self.steps,
                    cond_scale=self.cond_scale,
                    decode_to_audio=self.decode_to_audio,
                    return_lengths=True,
                    quantize=self.quantize,
                param_store_dtype=self.param_store_dtype,
                )
                jnp.asarray(out).block_until_ready()
                if verbose:
                    print(f"warm bucket batch={batch} len={length}", flush=True)
        self._warm = True
        return time.time() - t0
