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

import queue
import threading
import time
import warnings
from concurrent.futures import Future
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["TTSEngine", "DynamicBatcher"]


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
        # path — measured best per-request latency for large models at small
        # batch when combined with param_store_dtype=bf16 (1.23x at dim 1024
        # batch 1, PERFORMANCE.md). "w8a16": weight-only int8 with in-VMEM
        # Pallas dequant — measured SLOWER than bf16 at every benchmarked
        # config of this model (0.69-0.99x); niche use only. Small output
        # perturbation; off by default
        quantize: Optional[str] = None,
        # serve from bf16-stored params: numerically free for a bf16-compute
        # model, halves the f32 weight HBM read (ops/quant.py::
        # cast_float_params) — measured 1.10x per-request at dim 1024
        param_store_dtype: Optional[jnp.dtype] = None,
        # long-form: texts whose token count exceeds the largest text bucket
        # are served by windowed infilling (cfm.sample_long_stream) — text
        # segmented onto the bucket grid for conditioning-id generation, then
        # one compiled window program over the whole id stream. These set the
        # static window geometry (warmed like any bucket); enable_long_form=
        # False restores the raise-on-overflow behaviour
        long_window_frames: int = 768,
        long_overlap_frames: int = 128,
        enable_long_form: bool = True,
        # voice cloning with raw-audio prompts: prompt waveforms are
        # quantised onto this grid (seconds) so the codec-encode and wav2vec
        # programs stay static; warmup() pre-compiles them when set. Latent
        # prompts need no extra programs. None disables raw-prompt cloning.
        prompt_seconds_buckets: Optional[Sequence[float]] = None,
        # duration mode: ALSO pre-compile the sampler for every frame bucket
        # an overflow re-bucket could pick (predicted span > the text
        # bucket's default horizon), so even over-horizon requests never
        # compile on the request path. Off by default — it adds
        # batch_buckets x extra-frame-buckets warmup programs
        warm_overflow_buckets: bool = False,
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
        assert 0 < long_overlap_frames < long_window_frames
        self.long_window_frames = long_window_frames
        self.long_overlap_frames = long_overlap_frames
        self.enable_long_form = enable_long_form
        self.prompt_seconds_buckets = (
            tuple(sorted(prompt_seconds_buckets))
            if prompt_seconds_buckets else None
        )
        self.warm_overflow_buckets = warm_overflow_buckets
        self._warm = False

    # ------------------------------------------------------------------

    @property
    def _outputs_audio(self) -> bool:
        """True when outputs are decoded waveforms (time = LAST axis). A
        codec-less wrapper returns latents (time = axis 1) even when
        decode_to_audio=True — trimming/stacking must follow the ACTUAL
        output layout, not the flag."""
        return (self.decode_to_audio
                and self.wrapper.voicebox.audio_enc_dec is not None)

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
        assert self.mode == "semantic"
        return {
            "text_token_ids": jnp.asarray(ids),
            "max_semantic_token_ids": self.max_semantic_token_ids,
            "spec_decode": self.spec_decode,
        }

    # ------------------------------------------------------------------
    # duration-pipeline helpers: predict durations FIRST (host-visible), so
    # the frame horizon can be re-bucketed when predictions overflow it and
    # the alignment/validity math runs in numpy (no device program depends
    # on a per-request length)
    # ------------------------------------------------------------------

    def _predict_durations(self, ids: np.ndarray, cond=None) -> np.ndarray:
        """(batch, length) bucket-padded phoneme ids -> per-position integer
        durations (batch, length), clipped >= 1 and zeroed at pads. One
        warmed dp program per (batch, length) shape. `cond` latents (a voice
        prompt, (1, p, d)) are pre-curtailed/padded host-side to the phoneme
        length — the net does the same curtail internally (reference
        voicebox_pytorch.py:815-819), so this keeps the program shape on the
        text-bucket grid regardless of prompt length."""
        from .models.duration import masked_frame_durations

        dp = self.wrapper.duration_predictor
        if cond is not None:
            c = np.asarray(cond, dtype=np.float32)
            n_ph = ids.shape[1]
            if c.shape[1] >= n_ph:
                c = c[:, :n_ph]
            else:
                c = np.pad(c, ((0, 0), (0, n_ph - c.shape[1]), (0, 0)))
            c = np.broadcast_to(c, (ids.shape[0],) + c.shape[1:])
            cond = jnp.asarray(np.ascontiguousarray(c))
        durations = dp.forward_with_cond_scale(
            cond=cond, phoneme_ids=jnp.asarray(ids)
        )
        # the SHARED rounding/masking rule (numpy inputs -> host math, no
        # device round-trip on the request path)
        return masked_frame_durations(ids, np.asarray(durations))

    @staticmethod
    def _align_ids_np(ids: np.ndarray, per_pos: np.ndarray,
                      total_length: int) -> np.ndarray:
        """Host-side `align_phoneme_ids_with_durations`: repeat each id by
        its (pad-zeroed) duration, 0-fill the tail."""
        out = np.zeros((ids.shape[0], total_length), dtype=ids.dtype)
        for j in range(ids.shape[0]):
            rep = np.repeat(ids[j], per_pos[j])[:total_length]
            out[j, : rep.shape[0]] = rep
        return out

    def _duration_sample(self, ids: np.ndarray, rng):
        """One duration-mode bucket group: predict durations, pick the frame
        horizon from the ACTUAL masked duration sum (re-bucketing UP the
        frame grid when the default text-bucket-derived horizon is too
        small — an up-bucketed program compiles once on first use and is
        cached after), align host-side, and sample through the pre-aligned-id
        path. Predictions beyond the largest frame bucket warn and clamp —
        never a silent cut. Returns (output np, per-request lengths np)."""
        per = self._predict_durations(ids)
        n_valid = np.maximum(per.sum(axis=1), 1)
        frame_length = self._bucket(
            ids.shape[1] * self.frames_per_token, self.frame_buckets
        )
        needed = int(n_valid.max())
        if needed > frame_length:
            frame_length = self._bucket(needed, self.frame_buckets)
        if needed > self.frame_buckets[-1]:
            warnings.warn(
                f"predicted speech span of {needed} frames exceeds the "
                f"largest frame bucket {self.frame_buckets[-1]}; output is "
                "clipped to the bucket — raise frame_buckets/"
                "frames_per_token or split the text",
                stacklevel=3,
            )
            n_valid = np.minimum(n_valid, frame_length)
        aligned = self._align_ids_np(ids, per, frame_length)
        out = self.wrapper.sample(
            semantic_token_ids=jnp.asarray(aligned),
            ids_at_frame_rate=True,
            steps=self.steps,
            cond_scale=self.cond_scale,
            decode_to_audio=self.decode_to_audio,
            quantize=self.quantize,
            param_store_dtype=self.param_store_dtype,
            rng=rng,
        )
        if self._outputs_audio:
            lens = n_valid * self.wrapper.voicebox.audio_enc_dec.downsample_factor
        else:
            lens = n_valid
        return np.asarray(out), lens.astype(np.int64)

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
        successive chunks (every text gets audio). Texts longer than the
        largest text bucket route through long-form windowed infilling
        (`_stream_long`, one request at a time, still on warmed static
        shapes); with `enable_long_form=False` they raise instead — silent
        truncation would return cut-off speech.

        The time axis spans the enclosing static horizon;
        `return_lengths=True` additionally returns per-request valid lengths
        (samples of audio / frames of latents), and `trim=True` returns a
        LIST of per-request numpy arrays cut to those lengths instead. When
        long-form requests are mixed in, outputs of different horizons are
        zero-padded to the longest before stacking (trim=True avoids the
        padding copy)."""
        tok = self._tokenizer()
        ids_all = np.asarray(tok.texts_to_tensor_ids(list(texts)))
        valid = (ids_all >= 0).sum(axis=1)

        max_bucket = self.text_buckets[-1]
        long_rows = [i for i in range(len(texts)) if valid[i] > max_bucket]
        if long_rows and not self.enable_long_form:
            raise ValueError(
                f"text of {int(valid[long_rows[0]])} tokens exceeds the "
                f"largest text bucket {max_bucket} and long-form serving is "
                "disabled; raise text_buckets, split the text, or construct "
                "the engine with enable_long_form=True"
            )
        short_rows = [i for i in range(len(texts)) if i not in set(long_rows)]

        results: dict = {}  # row -> (np array incl. batch dim 1, length)
        if short_rows:
            ids_short = ids_all[short_rows]
            ids_short = ids_short[:, : max(1, int(valid[short_rows].max()))]
            length = self._bucket(ids_short.shape[1], self.text_buckets)
            max_batch = self.batch_buckets[-1]
            for start in range(0, len(short_rows), max_batch):
                rows = short_rows[start : start + max_batch]
                chunk = ids_short[start : start + max_batch]
                batch = self._bucket(chunk.shape[0], self.batch_buckets)
                ids = self._pad_ids(chunk, batch, length)
                if rng is not None:
                    rng, chunk_rng = jax.random.split(rng)
                else:
                    chunk_rng = None
                if self.mode == "duration":
                    out, out_lens = self._duration_sample(ids, chunk_rng)
                else:
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
                    out, out_lens = np.asarray(out), np.asarray(out_lens)
                for j, row in enumerate(rows):
                    results[row] = (out[j : j + 1], int(out_lens[j]))
        for row in long_rows:
            if rng is not None:
                rng, row_rng = jax.random.split(rng)
            else:
                row_rng = None
            chunks = list(self._stream_long(
                ids_all[row : row + 1, : int(valid[row])], rng=row_rng
            ))
            time_axis = -1 if self._outputs_audio else 1
            full = np.concatenate([np.asarray(c) for c in chunks],
                                  axis=time_axis)
            results[row] = (full, full.shape[time_axis])

        ordered = [results[i] for i in range(len(texts))]
        if trim:
            if self._outputs_audio:  # audio: time is the LAST axis
                return [o[0][..., :n] for o, n in ordered]
            # latents (n, d) / codes (n, q): time is the leading axis
            return [o[0][:n] for o, n in ordered]
        # stack on a common horizon (zero-pad long/short mixes)
        time_axis = (ordered[0][0].ndim - 1) if self._outputs_audio else 1
        horizon = max(o.shape[time_axis] for o, _ in ordered)
        stacked = []
        for o, _ in ordered:
            pad = horizon - o.shape[time_axis]
            if pad:
                widths = [(0, 0)] * o.ndim
                widths[time_axis] = (0, pad)
                o = np.pad(o, widths)
            stacked.append(o)
        out = jnp.asarray(np.concatenate(stacked, axis=0))
        if return_lengths:
            # dtype fixed in numpy: jnp converting int64->int32 on device
            # would be one (tiny) request-path compile
            return out, jnp.asarray(
                np.asarray([n for _, n in ordered], dtype=np.int32)
            )
        return out

    # ------------------------------------------------------------------
    # long-form (over-bucket) serving
    # ------------------------------------------------------------------

    def synthesize_stream(self, text: str, rng=None):
        """Single-text streaming synthesis: a generator yielding audio (or
        latent) chunks. Over-bucket texts stream via windowed infilling —
        time-to-first-audio is one window's sampling latency; in-bucket texts
        yield their (trimmed) one-shot result as a single chunk. All shapes
        are on the warmed static grid: no request-path compiles."""
        tok = self._tokenizer()
        ids = np.asarray(tok.texts_to_tensor_ids([text]))
        n_tokens = int((ids[0] >= 0).sum())
        if n_tokens <= self.text_buckets[-1]:
            clip = self.synthesize([text], rng=rng, trim=True)[0]
            yield jnp.asarray(clip)
            return
        assert self.enable_long_form, (
            "text exceeds the largest bucket and enable_long_form=False"
        )
        yield from self._stream_long(ids[:, :n_tokens], rng=rng)

    def _long_ratio(self) -> float:
        """Latent frames per conditioning id on the long path. Semantic mode:
        the wrapper's wav2vec/codec rate algebra; duration mode: aligned
        phoneme ids are already at frame rate (1.0)."""
        if self.mode == "semantic":
            return self.wrapper.frames_per_semantic_token()
        return 1.0

    def _segment_groups(self, ids_row: np.ndarray):
        """Shared long-form scaffolding: segment an over-bucket id row onto
        the largest text bucket, then group same-bucket segments into
        batched work items — same-bucket segments run ONE warmed
        (batch, length) program per group instead of one call each. Returns
        (n_segments, [(segment indices, (batch, length) stacked ids), ...])."""
        seg = self.text_buckets[-1]
        items = []  # (bucket length, (1, length) padded row)
        for s in range(0, ids_row.shape[1], seg):
            chunk = ids_row[:, s : s + seg]
            length = self._bucket(chunk.shape[1], self.text_buckets)
            items.append((length, self._pad_ids(chunk, 1, length)))
        by_len: dict = {}
        for i, (length, _) in enumerate(items):
            by_len.setdefault(length, []).append(i)
        max_batch = self.batch_buckets[-1]
        groups = []
        for length, idxs in by_len.items():
            for start in range(0, len(idxs), max_batch):
                sel = idxs[start : start + max_batch]
                batch = self._bucket(len(sel), self.batch_buckets)
                stacked = self._pad_ids(
                    np.concatenate([items[i][1] for i in sel], axis=0),
                    batch, length,
                )
                groups.append((sel, stacked))
        return len(items), groups

    def _long_frame_ids(self, ids_row: np.ndarray, cond=None):
        """(1, n_tokens) over-bucket token ids -> (conditioning ids (1, m),
        exact_frames). Text is segmented onto the largest text bucket; each
        segment group runs the warmed bucket program (AR semantic
        generation, or duration prediction + host-side alignment), valid
        outputs are trimmed and concatenated host-side. `cond`: duration
        mode only — voice-prompt latents conditioning the duration
        predictions (the reference passes the same cond to the duration
        predictor, voicebox_pytorch.py:1231-1241)."""
        n_segments, groups = self._segment_groups(ids_row)
        parts = [None] * n_segments
        if self.mode == "semantic":
            # batching matters most here: the AR decode scan runs the same
            # number of steps for batch 1 or 8, so batching k same-bucket
            # segments generates their ids ~k x faster — long-form
            # time-to-first-audio is dominated by exactly this stage
            tts = self.wrapper.text_to_semantic
            for sel, stacked in groups:
                sem, mask = tts.generate(
                    source=jnp.asarray(stacked),
                    source_type="text",
                    target_type="speech",
                    max_length=self.max_semantic_token_ids,
                    return_target_mask=True,
                    spec_decode=self.spec_decode,
                )
                sem, mask = np.asarray(sem), np.asarray(mask)
                for j, i in enumerate(sel):
                    n_valid = int(mask[j].sum())
                    parts[i] = sem[j : j + 1, : max(n_valid, 1)]
        else:
            # alignment runs host-side at each segment's EXACT masked
            # duration sum, so the long path never clamps or truncates a
            # predicted span
            for sel, stacked in groups:
                per = self._predict_durations(stacked, cond=cond)
                for j, i in enumerate(sel):
                    n_valid = max(int(per[j].sum()), 1)
                    parts[i] = self._align_ids_np(
                        stacked[j : j + 1], per[j : j + 1], n_valid
                    )
        cond_ids = np.concatenate(parts, axis=1)
        exact = int(np.ceil(cond_ids.shape[1] * self._long_ratio()))
        return cond_ids, exact

    def _stream_long(self, ids_row: np.ndarray, rng=None):
        """Over-bucket request -> generator of audio/latent chunks via
        cfm.sample_long_stream. The frame horizon is quantised UP to
        window + k*hop so every decode program shape is covered by warmup
        (the conditioning ids are right-padded with their last id to keep the
        id->frame mapping rate-exact), and the emitted stream is trimmed back
        to the exact frame count."""
        cond_ids, exact = self._long_frame_ids(ids_row)
        yield from self._drive_long(cond_ids, exact, rng=rng)

    def _drive_long(self, cond_ids: np.ndarray, exact: int, rng=None,
                    prompt=None, skip_frames: int = 0):
        """Drive the windowed-infilling stream for `cond_ids` covering
        `exact` latent frames; optionally condition the first window on a
        voice `prompt` (latents, already frame-aligned with the first
        `skip_frames` ids) and drop the prompt's span from the emitted
        stream (the caller already has that audio)."""
        window, overlap = self.long_window_frames, self.long_overlap_frames
        hop = window - overlap
        total = window + int(np.ceil(max(exact - window, 0) / hop)) * hop
        ratio = self._long_ratio()
        n_pad_ids = int(np.ceil(total / ratio))
        if n_pad_ids > cond_ids.shape[1]:
            cond_ids = np.concatenate(
                [cond_ids,
                 np.repeat(cond_ids[:, -1:], n_pad_ids - cond_ids.shape[1],
                           axis=1)],
                axis=1,
            )
        codec = self.wrapper.voicebox.audio_enc_dec
        as_audio = self._outputs_audio
        per_frame = codec.downsample_factor if as_audio else 1
        # emit frames [skip_frames, exact): the prompt span is the caller's
        # own audio, the tail beyond `exact` is grid padding
        budget = (exact - skip_frames) * per_frame
        skip = skip_frames * per_frame
        time_axis = -1 if as_audio else 1
        for chunk in self.wrapper.sample_long_stream(
            semantic_token_ids=jnp.asarray(cond_ids),
            total_frames=total,
            window_frames=window,
            overlap_frames=overlap,
            prompt=prompt,
            steps=self.steps,
            cond_scale=self.cond_scale,
            decode_to_audio=self.decode_to_audio,
            quantize=self.quantize,
            param_store_dtype=self.param_store_dtype,
            rng=rng,
        ):
            n = chunk.shape[time_axis]
            # trim on the HOST: slicing the jnp array would compile a
            # per-shape device program on the request path
            lo = min(skip, n)
            hi = min(lo + budget, n)
            skip -= lo
            budget -= hi - lo
            if hi > lo:
                if lo == 0 and hi == n:
                    yield chunk
                else:
                    sl = [slice(None)] * chunk.ndim
                    sl[time_axis] = slice(lo, hi)
                    yield jnp.asarray(np.asarray(chunk)[tuple(sl)])
            if budget == 0:
                return

    # ------------------------------------------------------------------
    # in-context voice cloning
    # ------------------------------------------------------------------

    def _duration_prompt_ids(self, prompt_lat, prompt_text: str) -> np.ndarray:
        """Frame-rate-aligned phoneme ids for the PROMPT span in duration
        mode: predict per-phoneme durations for the prompt transcript
        conditioned on the prompt latents (the reference passes the same
        cond to the duration predictor, voicebox_pytorch.py:1231-1241), then
        rescale them by cumulative rounding to sum to EXACTLY the prompt's
        frame count so the id stream stays frame-aligned."""
        tok = self._tokenizer()
        ids = np.asarray(tok.texts_to_tensor_ids([prompt_text]))
        n = int((ids[0] >= 0).sum())
        assert n > 0, "empty prompt_text"
        assert n <= self.text_buckets[-1], (
            f"prompt transcript of {n} tokens exceeds the largest text "
            f"bucket {self.text_buckets[-1]}"
        )
        length = self._bucket(n, self.text_buckets)
        ids_b = self._pad_ids(ids[:, :n], 1, length)
        per = self._predict_durations(ids_b, cond=prompt_lat)[0]  # (length,)
        p = int(prompt_lat.shape[1])
        scaled = per.astype(np.float64) * (p / max(int(per.sum()), 1))
        cum = np.round(np.cumsum(scaled)).astype(np.int64)
        ints = np.diff(np.concatenate([[0], cum]))
        aligned = np.repeat(ids_b[0], ints)
        assert aligned.shape[0] == p
        return aligned[None, :]

    def _prepare_prompt(self, prompt, prompt_ids, prompt_text=None):
        """Normalise a voice prompt to (latents (1, p, d), ids (1, n_p)).

        Raw-audio prompts are zero-padded up to a `prompt_seconds_buckets`
        bucket (so encode/wav2vec run on warmed static shapes), then the
        valid latent frames / ids are sliced back out host-side — the
        slices feed the HOST-assembled window conditioning, so variable
        prompt lengths never touch a device program shape.

        `prompt_ids` derivation when not given: semantic mode runs wav2vec
        on the prompt audio; duration mode needs the prompt's transcript
        (`prompt_text`) and predicts/rescales its phoneme durations
        (`_duration_prompt_ids`)."""
        codec = self.wrapper.voicebox.audio_enc_dec
        prompt = np.asarray(prompt, dtype=np.float32)
        if prompt.ndim == 2:  # raw audio (1, n_samples)
            assert codec is not None, (
                "raw-audio prompts need an audio_enc_dec on the VoiceBox; "
                "pass prompt latents (1, p, dim) + prompt_ids instead"
            )
            assert self.prompt_seconds_buckets, (
                "raw-audio prompts need TTSEngine(prompt_seconds_buckets=...) "
                "so the encode/wav2vec programs stay on a static grid"
            )
            sr = codec.sampling_rate
            n = prompt.shape[1]
            buckets = [int(round(s * sr)) for s in self.prompt_seconds_buckets]
            assert n <= buckets[-1], (
                f"prompt of {n / sr:.1f}s exceeds the largest prompt bucket "
                f"({self.prompt_seconds_buckets[-1]}s)"
            )
            target = self._bucket(n, buckets)
            padded = np.zeros((1, target), dtype=np.float32)
            padded[:, :n] = prompt
            lat = np.asarray(codec.encode(jnp.asarray(padded)))
            p_frames = int(np.ceil(n / (target / lat.shape[1])))
            lat = lat[:, :p_frames]
            if prompt_ids is None:
                if self.mode == "duration":
                    assert prompt_text is not None, (
                        "duration mode derives prompt_ids from the prompt's "
                        "transcript: pass prompt_text= (or prompt_ids=)"
                    )
                    prompt_ids = self._duration_prompt_ids(lat, prompt_text)
                else:
                    assert self.wrapper.text_to_semantic.wav2vec is not None, (
                        "prompt_ids can only be derived from audio via "
                        "wav2vec; pass prompt_ids= explicitly"
                    )
                    from .ops.stft import resample

                    w2v = self.wrapper.text_to_semantic.wav2vec
                    w_in = resample(jnp.asarray(padded), sr,
                                    w2v.target_sample_hz)
                    ids = np.asarray(w2v(w_in))
                    n_p = int(np.ceil(n / (target / ids.shape[1])))
                    prompt_ids = ids[:, : max(n_p, 1)]
            return lat, np.asarray(prompt_ids)
        assert prompt.ndim == 3, "prompt must be (1, n_samples) or (1, p, dim)"
        if prompt_ids is None and self.mode == "duration" and prompt_text:
            prompt_ids = self._duration_prompt_ids(prompt, prompt_text)
        assert prompt_ids is not None, (
            "latent prompts need explicit prompt_ids (the conditioning ids "
            "for the prompt span — e.g. wav2vec ids of the prompt audio, or "
            "prompt_text= in duration mode)"
        )
        return prompt, np.asarray(prompt_ids)

    def clone_stream(self, text: str, prompt, *, prompt_ids=None,
                     prompt_text=None, rng=None):
        """In-context voice cloning — the Voicebox headline capability
        (paper §3.2; reference `sample(cond=prompt_audio, texts=...)`,
        voicebox_pytorch.py:1175-1201): synthesize `text` continuing the
        voice in `prompt`, yielding audio/latent chunks.

        Rides the warmed long-form window programs: the prompt occupies the
        first window's kept span, and its LENGTH is data (the infilling
        keep-mask), not a program shape — any prompt shorter than the window
        shares one compiled sampler, so the request path stays compile-free.
        The yielded stream contains ONLY the continuation (the prompt span
        is the caller's own audio). `prompt`: raw audio (1, n_samples) at
        codec.sampling_rate, or latents (1, p, dim) with explicit
        `prompt_ids`. Duration mode: pass `prompt_text` (the prompt's
        transcript) instead of `prompt_ids` — the continuation's durations
        are then ALSO conditioned on the prompt voice, mirroring the
        reference's cond threading (voicebox_pytorch.py:1231-1241)."""
        assert self.enable_long_form, (
            "cloning rides the long-form path; construct the engine with "
            "enable_long_form=True"
        )
        tok = self._tokenizer()
        ids_row = np.asarray(tok.texts_to_tensor_ids([text]))
        n_tokens = int((ids_row[0] >= 0).sum())
        assert n_tokens > 0, "empty text"
        prompt_lat, p_ids = self._prepare_prompt(prompt, prompt_ids,
                                                 prompt_text)
        p_frames = int(prompt_lat.shape[1])
        assert p_frames <= self.long_window_frames - 1, (
            f"prompt spans {p_frames} frames, must be < long_window_frames="
            f"{self.long_window_frames}"
        )
        gen_ids, gen_exact = self._long_frame_ids(
            ids_row[:, :n_tokens],
            cond=prompt_lat if self.mode == "duration" else None,
        )
        # host-side concat/cast: an eager device .astype would compile one
        # tiny program PER PROMPT LENGTH on the request path
        cond_ids = np.concatenate(
            [np.asarray(p_ids).astype(gen_ids.dtype), gen_ids], axis=1
        )
        yield from self._drive_long(
            cond_ids, p_frames + gen_exact, rng=rng,
            prompt=jnp.asarray(prompt_lat), skip_frames=p_frames,
        )

    def clone(self, text: str, prompt, *, prompt_ids=None, prompt_text=None,
              rng=None):
        """One-shot voice cloning; returns the full trimmed continuation
        (audio (1, t_samples) / latents (1, n_frames, dim))."""
        chunks = [np.asarray(c)
                  for c in self.clone_stream(text, prompt,
                                             prompt_ids=prompt_ids,
                                             prompt_text=prompt_text,
                                             rng=rng)]
        time_axis = -1 if self._outputs_audio else 1
        return jnp.asarray(np.concatenate(chunks, axis=time_axis))

    def warmup(self, verbose: bool = False) -> float:
        """Pre-compile every (batch, text-length) bucket; returns seconds."""
        t0 = time.time()
        for batch in self.batch_buckets:
            for length in self.text_buckets:
                dummy = ["a"] * batch
                ids = self._pad_ids(
                    self._tokenizer().texts_to_tensor_ids(dummy), batch, length
                )
                if self.mode == "duration":
                    # warms the dp program AND the default-frame-bucket
                    # sampler — the exact request-path pair (an up-bucketed
                    # overflow horizon compiles once on first use instead)
                    out, _ = self._duration_sample(ids, None)
                else:
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
        if self.mode == "duration" and self.warm_overflow_buckets:
            # frame buckets only an overflow re-bucket reaches (every text
            # bucket's DEFAULT horizon was just warmed above)
            covered = {
                self._bucket(l * self.frames_per_token, self.frame_buckets)
                for l in self.text_buckets
            }
            for batch in self.batch_buckets:
                for fb in self.frame_buckets:
                    if fb in covered:
                        continue
                    out = self.wrapper.sample(
                        semantic_token_ids=jnp.zeros((batch, fb), jnp.int32),
                        ids_at_frame_rate=True,
                        steps=self.steps,
                        cond_scale=self.cond_scale,
                        decode_to_audio=self.decode_to_audio,
                        quantize=self.quantize,
                        param_store_dtype=self.param_store_dtype,
                    )
                    jnp.asarray(out).block_until_ready()
                    if verbose:
                        print(f"warm overflow bucket batch={batch} "
                              f"frames={fb}", flush=True)
        if self.enable_long_form:
            # one two-window stream compiles every long-path program: the
            # (b=1, window) infilling sampler and all three chunked-decode
            # shapes (first window, steady state, final drain — requests are
            # quantised onto the same window + k*hop grid, so the drain
            # buffer shape recurs too)
            window, overlap = self.long_window_frames, self.long_overlap_frames
            total = 2 * window - overlap  # window + one hop
            n_ids = int(np.ceil(total / self._long_ratio()))
            for chunk in self.wrapper.sample_long_stream(
                semantic_token_ids=jnp.zeros((1, n_ids), dtype=jnp.int32),
                total_frames=total,
                window_frames=window,
                overlap_frames=overlap,
                steps=self.steps,
                cond_scale=self.cond_scale,
                decode_to_audio=self.decode_to_audio,
                quantize=self.quantize,
                param_store_dtype=self.param_store_dtype,
            ):
                jnp.asarray(chunk).block_until_ready()
            if verbose:
                print(f"warm long-form window={window} overlap={overlap}",
                      flush=True)
        codec = self.wrapper.voicebox.audio_enc_dec
        if (self.enable_long_form and self.prompt_seconds_buckets
                and codec is not None):
            # cloning prompt grid: one codec-encode (+ wav2vec, semantic
            # mode) program per prompt bucket
            sr = codec.sampling_rate
            for secs in self.prompt_seconds_buckets:
                dummy = jnp.zeros((1, int(round(secs * sr))), jnp.float32)
                jnp.asarray(codec.encode(dummy)).block_until_ready()
                if (self.mode == "semantic"
                        and self.wrapper.text_to_semantic.wav2vec is not None):
                    from .ops.stft import resample

                    w2v = self.wrapper.text_to_semantic.wav2vec
                    w_in = resample(dummy, sr, w2v.target_sample_hz)
                    jnp.asarray(w2v(w_in)).block_until_ready()
                if verbose:
                    print(f"warm prompt bucket {secs}s", flush=True)
        if self.enable_long_form and self.mode == "duration":
            # duration-mode cloning conditions the dp on prompt latents
            # (raw-audio AND latent prompts — latent prompts need no codec
            # programs but DO hit these): the cond is pre-curtailed to the
            # PHONEME length, so one with-cond dp program per
            # (batch, text-length) bucket covers every prompt length. The
            # cond feature dim follows the DP'S OWN codec rule
            # (duration.py::forward_with_cond_scale), not the voicebox's.
            dp = self.wrapper.duration_predictor
            d = (dp.audio_enc_dec.latent_dim
                 if dp.audio_enc_dec is not None else dp.net.dim)
            for batch in self.batch_buckets:
                for length in self.text_buckets:
                    ids = np.full((batch, length), -1, dtype=np.int32)
                    ids[:, 0] = 0
                    self._predict_durations(
                        ids, cond=np.zeros((1, length, d), np.float32)
                    )
            if verbose:
                print("warm duration-mode prompt-cond dp programs", flush=True)
        self._warm = True
        return time.time() - t0


class DynamicBatcher:
    """Request-level dynamic batching over a warmed `TTSEngine`.

    The engine's pre-compiled bucket programs make BATCHED synthesis the
    cheap path — measured on one v5e chip the full pipeline serves 508
    audio-seconds/s at batch 8 vs 252 at batch 1 (PERFORMANCE.md) — but a
    production server receives requests one at a time. This batcher closes
    that gap: `submit(text)` returns a `concurrent.futures.Future`
    immediately; a single worker thread drains the queue for up to
    `max_wait_ms` after the first pending request, groups what it collected
    by TEXT BUCKET (so a short request never pays a long bucket's compute),
    and issues one `engine.synthesize` call per group. Over-bucket texts form
    their own group and ride the engine's long-form path.

    All device work happens on the one worker thread (the TPU wants a single
    client); submitters only block in `Future.result()`. Results are the
    engine's `trim=True` per-request arrays. The reference has no serving
    layer at all (SURVEY.md §1: "no CLI, no serving layer") — this plus
    `TTSEngine` is the deployment surface a production TPU fleet needs.

        engine.warmup()
        with DynamicBatcher(engine, max_wait_ms=8.0) as batcher:
            futures = [batcher.submit(t) for t in texts]   # from any thread
            clips = [f.result() for f in futures]
    """

    _SENTINEL = object()

    def __init__(
        self,
        engine: TTSEngine,
        *,
        max_wait_ms: float = 8.0,
        max_batch: Optional[int] = None,
        seed: int = 0,
        autostart: bool = True,
    ):
        self.engine = engine
        self.max_wait_s = max_wait_ms / 1000.0
        self.max_batch = int(max_batch or engine.batch_buckets[-1])
        assert self.max_batch >= 1
        self._queue: "queue.Queue" = queue.Queue()
        self._rng = jax.random.PRNGKey(seed)
        self._thread: Optional[threading.Thread] = None
        self._closed = False
        # serialises submit() against close(): without it a submit racing
        # close() can pass the closed check and enqueue behind the shutdown
        # sentinel, leaving its Future unresolved forever
        self._submit_lock = threading.Lock()
        # observability: occupancy tells you whether max_wait_ms is earning
        # its latency cost
        self.stats = {"requests": 0, "batches": 0, "occupancy_sum": 0}
        if autostart:
            self.start()

    # ------------------------------------------------------------------

    def start(self):
        if self._thread is None:
            self._thread = threading.Thread(
                target=self._worker, name="DynamicBatcher", daemon=True
            )
            self._thread.start()
        return self

    def submit(self, text: str) -> Future:
        """Enqueue one request; returns a Future resolving to the trimmed
        per-request array (audio `(1, t)` / latents `(n, d)` — the engine's
        `trim=True` layout)."""
        fut: Future = Future()
        with self._submit_lock:
            assert not self._closed, "batcher is closed"
            self._queue.put(("synth", text, fut))
        return fut

    def submit_clone(self, text: str, prompt, *, prompt_ids=None,
                     prompt_text=None) -> Future:
        """Enqueue a voice-cloning request (`engine.clone` semantics);
        returns a Future resolving to the full trimmed continuation. Cloning
        rides the long-form window programs one request at a time, so clones
        don't batch with each other — the batcher's value here is the single
        device-owning worker thread (the TPU wants one client): clones and
        batched synthesis interleave safely from any number of submitters."""
        fut: Future = Future()
        with self._submit_lock:
            assert not self._closed, "batcher is closed"
            self._queue.put(
                ("clone", (text, prompt, prompt_ids, prompt_text), fut)
            )
        return fut

    def synthesize(self, text: str, timeout: Optional[float] = None):
        """Blocking convenience wrapper around `submit`."""
        return self.submit(text).result(timeout)

    def close(self, timeout: Optional[float] = 30.0):
        """Drain outstanding requests and stop the worker."""
        with self._submit_lock:
            if self._closed:
                return
            self._closed = True
            self._queue.put(self._SENTINEL)
        worker_alive = False
        if self._thread is not None:
            self._thread.join(timeout)
            worker_alive = self._thread.is_alive()
        # belt-and-braces: if anything is still queued after the worker exits
        # (e.g. the join timed out mid-batch), cancel those futures so no
        # caller blocks forever in result()
        while True:
            try:
                item = self._queue.get_nowait()
            except queue.Empty:
                break
            if item is self._SENTINEL:
                if worker_alive:
                    # the join timed out mid-batch: the worker still needs
                    # the sentinel to shut down — put it back and stop
                    # draining (eating it would leave the worker blocked on
                    # queue.get() forever)
                    self._queue.put(item)
                    break
                continue
            *_, fut = item
            if fut.set_running_or_notify_cancel():  # skip already-cancelled
                fut.set_exception(RuntimeError("DynamicBatcher closed"))

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.close()

    @property
    def mean_occupancy(self) -> float:
        b = self.stats["batches"]
        return self.stats["occupancy_sum"] / b if b else 0.0

    # ------------------------------------------------------------------

    def _collect(self):
        """Block for the first pending request, then keep draining until
        `max_batch` requests are in hand or `max_wait_ms` has elapsed.
        Returns a list of (text, future); None means shutdown."""
        first = self._queue.get()
        if first is self._SENTINEL:
            return None
        batch = [first]
        deadline = time.monotonic() + self.max_wait_s
        while len(batch) < self.max_batch:
            remaining = deadline - time.monotonic()
            try:
                item = (self._queue.get_nowait() if remaining <= 0
                        else self._queue.get(timeout=remaining))
            except queue.Empty:
                break
            if item is self._SENTINEL:
                # re-post the sentinel so the NEXT _collect shuts down; first
                # serve what we already hold
                self._queue.put(self._SENTINEL)
                break
            batch.append(item)
        return batch

    def _bucket_key(self, text: str, tok) -> int:
        ids = np.asarray(tok.texts_to_tensor_ids([text]))
        n = int((ids[0] >= 0).sum())
        if n > self.engine.text_buckets[-1]:
            return -1  # long-form group
        return self.engine._bucket(n, self.engine.text_buckets)

    def _worker(self):
        tok = self.engine._tokenizer()
        while True:
            batch = self._collect()
            if batch is None:
                return
            # group by text bucket: one engine call per bucket keeps short
            # requests on short programs; clones run one-at-a-time on the
            # same (single device-owning) thread
            groups: dict = {}
            clones = []
            for kind, payload, fut in batch:
                # transition pending -> running; False means the caller
                # cancelled while queued. Skipping here ALSO makes the later
                # set_result/set_exception safe (a running Future can no
                # longer be cancelled, so neither can raise
                # InvalidStateError and kill the worker thread).
                if not fut.set_running_or_notify_cancel():
                    continue
                if kind == "clone":
                    clones.append((payload, fut))
                    continue
                text = payload
                try:
                    key = self._bucket_key(text, tok)
                except Exception as e:  # tokenizer failure: fail that request
                    fut.set_exception(e)
                    continue
                groups.setdefault(key, []).append((text, fut))
            for (text, prompt, prompt_ids, prompt_text), fut in clones:
                self._rng, call_rng = jax.random.split(self._rng)
                try:
                    fut.set_result(self.engine.clone(
                        text, prompt, prompt_ids=prompt_ids,
                        prompt_text=prompt_text, rng=call_rng,
                    ))
                    self.stats["requests"] += 1
                except Exception as e:
                    fut.set_exception(e)
            for key, items in groups.items():
                texts = [t for t, _ in items]
                self._rng, call_rng = jax.random.split(self._rng)
                try:
                    clips = self.engine.synthesize(texts, rng=call_rng,
                                                   trim=True)
                except Exception as e:
                    for _, fut in items:
                        fut.set_exception(e)
                    continue
                self.stats["requests"] += len(items)
                self.stats["batches"] += 1
                self.stats["occupancy_sum"] += len(items)
                for (_, fut), clip in zip(items, clips):
                    fut.set_result(clip)
