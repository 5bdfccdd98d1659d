"""L4: conditional flow matching wrapper — CFM training objective + jitted ODE
sampler + conditioning orchestration.

Re-design of the reference `ConditionalFlowMatcherWrapper`
(voicebox_pytorch.py:1122-1427) for TPU execution:

* the CFM objective follows eq (5)/(6) of arXiv 2306.15687 exactly as the
  reference does (voicebox_pytorch.py:1397-1410):
  `x0 ~ N(0, I)`, `t ~ U(0,1)` per sample,
  `w = (1 - (1 - sigma) t) x0 + t x1`, `flow = x1 - (1 - sigma) x0`;
* sampling replaces torchdiffeq/torchode with a fixed-step midpoint solver
  under `lax.scan` (`voicebox_tpu.ops.ode`) compiled ONCE per static config —
  the whole ODE solve, including every transformer forward, is a single XLA
  program;
* classifier-free guidance (`cond_scale != 1`) runs as one batched `2b`
  forward per vector-field evaluation instead of the reference's two
  sequential forwards (voicebox_pytorch.py:972-985) — on TPU this doubles MXU
  utilisation instead of doubling latency;
* the class is a thin stateful façade over pure functions: `loss_fn` and the
  cached sampler are pure and jit-compiled; the object stores `params` for the
  torch-like `wrapper(x)` / `wrapper.sample(...)` usage of the reference
  README.

Conditioning inputs mirror the reference: exactly one of TextToSemantic /
DurationPredictor may be attached (voicebox_pytorch.py:1149-1150), and
precomputed `semantic_token_ids` / `phoneme_ids` pass straight through
(voicebox_pytorch.py:1182,1337).
"""

from __future__ import annotations

import math
import warnings
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.interp import curtail_or_pad
from ..ops.ode import cfm_interpolant, odeint
from .duration import masked_frame_durations
from .voicebox import VoiceBox

__all__ = ["ConditionalFlowMatcherWrapper", "is_probably_audio_from_shape"]


def is_probably_audio_from_shape(t) -> bool:
    """Raw-audio detection by shape: (b, n) or (b, 1, n)
    (reference voicebox_pytorch.py:1119-1120)."""
    return t is not None and (t.ndim == 2 or (t.ndim == 3 and t.shape[1] == 1))


class ConditionalFlowMatcherWrapper:
    def __init__(
        self,
        voicebox: VoiceBox,
        text_to_semantic: Optional[Any] = None,
        duration_predictor: Optional[Any] = None,
        sigma: float = 0.0,
        ode_method: str = "midpoint",  # paper's solver choice
        cond_drop_prob: float = 0.0,
        params: Optional[Any] = None,
        # reference-API aliases (voicebox_pytorch.py:1129-1161): torchdiffeq's
        # method name maps directly; use_torchode selects the ADAPTIVE Tsit5
        # (`ops/ode.py::odeint_tsit5_adaptive`, integral step controller under
        # lax.while_loop — the torchode Tsit5+IntegralController equivalent),
        # honouring atol/rtol
        ode_atol: float = 1e-5,
        ode_rtol: float = 1e-5,
        use_torchode: bool = False,
        torchdiffeq_ode_method: Optional[str] = None,
    ):
        if torchdiffeq_ode_method is not None:
            ode_method = torchdiffeq_ode_method
        if use_torchode:
            ode_method = "tsit5_adaptive"
        self.ode_atol = ode_atol
        self.ode_rtol = ode_rtol
        self.sigma = sigma
        self.voicebox = voicebox
        self.condition_on_text = voicebox.condition_on_text

        assert not (not self.condition_on_text and text_to_semantic is not None), (
            "TextToSemantic should not be passed in if not conditioning on text"
        )
        if self.condition_on_text and (
            text_to_semantic is not None or duration_predictor is not None
        ):
            assert (text_to_semantic is not None) ^ (duration_predictor is not None), (
                "use either TextToSemantic or DurationPredictor, not both"
            )

        self.text_to_semantic = text_to_semantic
        self.duration_predictor = duration_predictor
        self.cond_drop_prob = cond_drop_prob
        self.ode_method = ode_method

        self.params = params
        self._rng = jax.random.PRNGKey(0)
        self._sampler_cache: dict = {}
        # jit the stateful-entry loss (eager flax apply dispatches op-by-op,
        # which is pathologically slow on a tunneled TPU backend)
        self._loss_jit = jax.jit(self.loss_fn)

    # ------------------------------------------------------------------
    # parameter management
    # ------------------------------------------------------------------

    @property
    def audio_enc_dec(self):
        return self.voicebox.audio_enc_dec

    def init_params(self, rng: jax.Array, seq_len: int = 64, batch: int = 1):
        """Initialise voicebox params from dummy shapes; stores and returns them."""
        latent_dim = self.voicebox.latent_dim
        x = jnp.zeros((batch, seq_len, latent_dim))
        kwargs = dict(times=jnp.zeros((batch,)), target=x)
        if self.condition_on_text:
            kwargs["cond_token_ids"] = jnp.zeros((batch, seq_len), dtype=jnp.int32)
        variables = jax.jit(self.voicebox.init, static_argnames=("train",))(
            {"params": rng, "mask": rng, "cfg": rng}, x, **kwargs
        )
        self.params = variables["params"]
        return self.params

    def _next_rng(self):
        self._rng, sub = jax.random.split(self._rng)
        return sub

    def load(self, path, strict: bool = True):
        """Restore voicebox params from a trainer checkpoint; returns the pkg
        so a trainer can also restore optim state (mirrors
        voicebox_pytorch.py:1167-1173)."""
        from flax import serialization

        with open(path, "rb") as f:
            pkg = serialization.msgpack_restore(f.read())
        model_state = pkg["model"]
        if self.params is not None and strict:
            self.params = serialization.from_state_dict(self.params, model_state)
        else:
            self.params = jax.tree.map(jnp.asarray, model_state)
        return pkg

    def load_torch(self, path):
        """Migration path from the reference build: port a reference trainer
        checkpoint (`torch.save({'model': wrapper_state_dict, ...})`,
        /root/reference/voicebox_pytorch/trainer.py:191-197,306-310) into
        this wrapper's VoiceBox params. Frozen `audio_enc_dec.*` codec
        weights inside the checkpoint are skipped — port those with the
        codec loaders in `utils/port_weights`. Call `init_params()` first
        (the ported tree is validated shape-by-shape against it)."""
        from ..utils.port_weights import load_voicebox_torch

        assert self.params is not None, (
            "call init_params() first — it provides the shape template the "
            "ported checkpoint is validated against"
        )
        self.params = load_voicebox_torch(path, self.params)
        return self.params

    def save_torch(self, path, extra_model_state=None):
        """The INVERSE of `load_torch`: export this wrapper's TPU-trained
        denoiser as a reference-format checkpoint that the reference's
        `ConditionalFlowMatcherWrapper.load(path)` restores
        (voicebox_pytorch.py:1167-1173 reads `pkg['model']`, whose denoiser
        keys live under the `voicebox.` submodule prefix). `null_cond` and
        `transformer.rotary_emb.inv_freq` are synthesised (frozen zeros /
        deterministic buffer); `extra_model_state` entries merge verbatim —
        pass the user's original frozen `voicebox.audio_enc_dec.*` torch
        weights when a codec is attached on the reference side (or load
        there with strict=False). For a checkpoint the reference TRAINER can
        resume (with optimizer moments), use `VoiceBoxTrainer.save_torch`."""
        from ..utils.port_weights import (
            export_voicebox_torch,
            save_reference_checkpoint,
        )

        assert self.params is not None, "no params to export"
        sd = export_voicebox_torch(
            self.params, dim_head=self.voicebox.dim_head
        )
        model = {f"voicebox.{k}": v for k, v in sd.items()}
        if extra_model_state:
            model.update(extra_model_state)
        return save_reference_checkpoint(path, model)

    # ------------------------------------------------------------------
    # training loss (pure)
    # ------------------------------------------------------------------

    def loss_fn(
        self,
        params,
        x1: jax.Array,  # (b, n, d) latents — raw audio handled in __call__
        rng: jax.Array,
        *,
        mask: Optional[jax.Array] = None,
        cond_token_ids: Optional[jax.Array] = None,
        cond: Optional[jax.Array] = None,
        cond_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        """Pure CFM loss — safe to jit / grad / shard over a mesh."""
        sigma = self.sigma
        batch = x1.shape[0]

        noise_rng, time_rng, mask_rng, cfg_rng, drop_rng = jax.random.split(rng, 5)

        x0 = jax.random.normal(noise_rng, x1.shape, dtype=x1.dtype)
        times = jax.random.uniform(time_rng, (batch,), dtype=jnp.float32)
        w, flow = cfm_interpolant(x1, x0, times, sigma)

        return self.voicebox.apply(
            {"params": params},
            w,
            times=times,
            cond_token_ids=cond_token_ids,
            self_attn_mask=mask,
            cond_drop_prob=self.cond_drop_prob,
            target=flow,
            cond=cond,
            cond_mask=cond_mask,
            train=True,
            rngs={"mask": mask_rng, "cfg": cfg_rng, "dropout": drop_rng},
        )

    def sp_loss_fn(self, mesh, *, seq_axis: str = "seq",
                   batch_axis: Optional[str] = None):
        """Sequence-parallel drop-in for `loss_fn` (same signature): the
        latent time axis shards over the mesh's `seq_axis` and the whole
        denoiser runs shard-locally (ring attention, halo conv, psum'd loss
        — parallel/sequence_parallel.py). `batch_axis` additionally shards
        the batch for a 2-D data x seq mesh. Same training distribution:
        noise/time/span/CFG randomness drawn from `rng` at full length."""
        from ..parallel.sequence_parallel import make_sp_loss_fn

        sp_model = self.voicebox.clone(seq_axis=seq_axis,
                                       pad_to_lane_multiple=False)
        inner = make_sp_loss_fn(
            sp_model, mesh, seq_axis=seq_axis, batch_axis=batch_axis,
            cond_drop_prob=self.cond_drop_prob, sigma=self.sigma,
        )

        def fn(params, x1, rng, *, mask=None, cond_token_ids=None,
               cond=None, cond_mask=None):
            assert cond_mask is None, (
                "explicit cond_mask is not plumbed through the SP loss; the "
                "span mask is drawn at full length inside (reference "
                "training semantics)"
            )
            noise_rng, time_rng, sp_rng = jax.random.split(rng, 3)
            x0 = jax.random.normal(noise_rng, x1.shape, dtype=x1.dtype)
            times = jax.random.uniform(time_rng, (x1.shape[0],),
                                       dtype=jnp.float32)
            return inner(params, sp_rng, x1, x0, times, mask,
                         cond_token_ids, cond)

        return fn

    # ------------------------------------------------------------------
    # torch-like stateful entry points (reference README usage)
    # ------------------------------------------------------------------

    def __call__(
        self,
        x1,
        *,
        mask=None,
        semantic_token_ids=None,
        phoneme_ids=None,
        cond=None,
        cond_mask=None,
        input_sampling_rate: Optional[int] = None,
        rng: Optional[jax.Array] = None,
        params=None,
    ):
        """Compute the CFM training loss, encoding raw audio if a codec is
        attached (mirrors voicebox_pytorch.py:1332-1427)."""
        params = params if params is not None else self.params
        assert params is not None, "call init_params() first or pass params="
        rng = rng if rng is not None else self._next_rng()

        x1 = jnp.asarray(x1)
        if cond is not None:
            cond = jnp.asarray(cond)

        input_is_raw_audio = is_probably_audio_from_shape(x1)
        cond_is_raw_audio = is_probably_audio_from_shape(cond)
        raw_audio = x1 if input_is_raw_audio else None

        if input_is_raw_audio or cond_is_raw_audio:
            codec = self.voicebox.audio_enc_dec
            assert codec is not None, (
                "audio_enc_dec must be set on VoiceBox to train directly on raw audio"
            )
            codec_sr = codec.sampling_rate
            input_sampling_rate = input_sampling_rate or codec_sr
            if input_is_raw_audio:
                x1 = codec.encode(
                    _resample_if_needed(x1, input_sampling_rate, codec_sr)
                )
            if cond_is_raw_audio:
                cond = codec.encode(
                    _resample_if_needed(cond, input_sampling_rate, codec_sr)
                )
            x1 = jax.lax.stop_gradient(x1)
            if cond is not None:
                cond = jax.lax.stop_gradient(cond)

        assert self.condition_on_text or (
            semantic_token_ids is None and phoneme_ids is None
        ), "semantic or phoneme ids should not be passed in if not conditioning on text"

        cond_token_ids = None
        if self.condition_on_text:
            if self.text_to_semantic is not None or semantic_token_ids is not None:
                assert phoneme_ids is None
                if semantic_token_ids is None:
                    assert raw_audio is not None
                    wav2vec = self.text_to_semantic.wav2vec
                    wav2vec_input = _resample_if_needed(
                        raw_audio, input_sampling_rate, wav2vec.target_sample_hz
                    )
                    semantic_token_ids = wav2vec(wav2vec_input)
                cond_token_ids = semantic_token_ids
            else:
                assert phoneme_ids is not None
                cond_token_ids = phoneme_ids

        return self._loss_jit(
            params,
            x1,
            rng,
            mask=mask,
            cond_token_ids=cond_token_ids,
            cond=cond,
            cond_mask=cond_mask,
        )

    # ------------------------------------------------------------------
    # sampling
    # ------------------------------------------------------------------

    def _build_sampler(self, steps: int, use_cfg: bool, has_ids: bool, has_attn_mask: bool,
                       has_cond_mask: bool, method: str, fuse_decode: bool = False,
                       quantize: Optional[str] = None):
        """Build + jit the full ODE solve for one static configuration.
        Cached per instance (an lru_cache on the bound method would pin old
        wrapper instances — params and codec weights — in a class-level cache).

        With `fuse_decode` the codec's vocoder runs INSIDE the same program
        (ODE solve -> RVQ/mel -> Vocos -> iSTFT compiled together): one
        dispatch per request instead of two — on a remote/tunneled backend
        that halves request latency, locally it saves a host round-trip.

        With `quantize="int8"` the transformer's Dense matmuls run as s8 x s8
        -> s32 MXU ops; with `quantize="w8a16"` they run as bf16 MXU ops over
        int8 weights dequantized in VMEM (half the weight HBM traffic,
        `ops/quant.py::w8a16_matmul`); the caller passes the pre-quantized
        param tree (`sample()` handles both)."""
        key = (steps, use_cfg, has_ids, has_attn_mask, has_cond_mask, method,
               fuse_decode, quantize)
        cached = self._sampler_cache.get(key)
        if cached is not None:
            # LRU: refresh insertion order so eviction drops the stalest entry
            self._sampler_cache.pop(key)
            self._sampler_cache[key] = cached
            return cached
        voicebox = self.voicebox
        decode_fn = None
        if fuse_decode:
            decode_fn, _ = self.audio_enc_dec.decode_fn()

        if quantize is None:
            apply_fn = voicebox.apply
        else:
            from ..ops.quant import QUANT_MODES, quantized_dense

            if quantize not in QUANT_MODES:
                raise ValueError(
                    f"unknown quantize mode {quantize!r} (use one of {QUANT_MODES})"
                )

            def apply_fn(variables, *args, **kwargs):
                with quantized_dense(quantize):
                    return voicebox.apply(variables, *args, **kwargs)

        def vector_field(params, t, x, cond, cond_token_ids, cond_mask,
                         self_attn_mask, cond_scale):
            kwargs = dict(
                cond_mask=cond_mask,
                self_attn_mask=self_attn_mask,
                cond_token_ids=cond_token_ids,
                train=False,
            )
            b = x.shape[0]
            if not use_cfg:
                drop = jnp.zeros((b,), dtype=bool)
                return apply_fn(
                    {"params": params}, x, times=t, cond=cond,
                    cond_drop_prob=0.0, cond_drop_mask=drop, **kwargs,
                )
            # CFG: one 2b-batched forward — cond half + null half
            x2 = jnp.concatenate([x, x], axis=0)
            cond2 = jnp.concatenate([cond, cond], axis=0)
            drop2 = jnp.concatenate(
                [jnp.zeros((b,), dtype=bool), jnp.ones((b,), dtype=bool)], axis=0
            )
            kwargs2 = dict(
                cond_mask=None if cond_mask is None else jnp.concatenate([cond_mask] * 2, 0),
                self_attn_mask=None
                if self_attn_mask is None
                else jnp.concatenate([self_attn_mask] * 2, 0),
                cond_token_ids=None
                if cond_token_ids is None
                else jnp.concatenate([cond_token_ids] * 2, 0),
                train=False,
            )
            out2 = apply_fn(
                {"params": params}, x2, times=jnp.broadcast_to(t, (2 * b,)),
                cond=cond2, cond_drop_prob=0.0, cond_drop_mask=drop2, **kwargs2,
            )
            logits, null_logits = out2[:b], out2[b:]
            return null_logits + (logits - null_logits) * cond_scale

        atol, rtol = self.ode_atol, self.ode_rtol

        @jax.jit
        def sample_latents(params, y0, cond, cond_token_ids, cond_mask,
                           self_attn_mask, cond_scale, codec_params=None):
            def fn(t, x):
                return vector_field(
                    params, t, x, cond, cond_token_ids, cond_mask,
                    self_attn_mask, cond_scale,
                )

            if method == "tsit5_adaptive":  # use_torchode: honour atol/rtol
                from ..ops.ode import odeint_tsit5_adaptive

                y_final, _ = odeint_tsit5_adaptive(
                    fn, y0, 0.0, 1.0, atol=atol, rtol=rtol
                )
            else:
                times = jnp.linspace(0.0, 1.0, steps)
                y_final, _ = odeint(fn, y0, times, method=method)
            if decode_fn is not None:
                return decode_fn(codec_params, y_final)
            return y_final

        # bounded like the reference's lru_cache(maxsize=8): callers sweeping
        # steps/cond_scale/method configs must not accumulate compiled XLA
        # programs without eviction
        while len(self._sampler_cache) >= 8:
            self._sampler_cache.pop(next(iter(self._sampler_cache)))
        self._sampler_cache[key] = sample_latents
        return sample_latents

    def _quantized_params(self, params, quantize: str):
        """Quantize the Dense kernels once per (params identity, mode) — the
        per-request cost is then only the dynamic activation quantization
        inside the fused program."""
        cached = getattr(self, "_qparams_cache", None)
        if cached is not None and cached[0] is params and cached[1] == quantize:
            return cached[2]
        from ..ops.quant import quantize_dense_params

        qparams = jax.jit(quantize_dense_params)(params)
        self._qparams_cache = (params, quantize, qparams)
        return qparams

    def _stored_params(self, params, dtype):
        """Serving storage-dtype cast (`ops/quant.py::cast_float_params`),
        cached per params identity."""
        cached = getattr(self, "_stored_cache", None)
        if cached is not None and cached[0] is params and cached[1] == dtype:
            return cached[2]
        from ..ops.quant import cast_float_params

        sparams = jax.jit(
            cast_float_params, static_argnames=("dtype",)
        )(params, dtype=dtype)
        self._stored_cache = (params, dtype, sparams)
        return sparams

    def sample(
        self,
        *,
        cond=None,
        texts=None,
        text_token_ids=None,
        semantic_token_ids=None,
        phoneme_ids=None,
        cond_mask=None,
        steps: int = 3,
        cond_scale: float = 1.0,
        decode_to_audio: bool = True,
        decode_to_codes: bool = False,
        max_semantic_token_ids: int = 2048,
        spec_decode: bool = False,
        spec_decode_gamma: int = 5,
        return_lengths: bool = False,
        # duration-predictor pipeline only: a STATIC frame horizon for the
        # aligned phoneme ids (serving buckets — keeps shapes fixed so the
        # request path never recompiles); None = tight dynamic length
        frame_length: Optional[int] = None,
        # specify the output length in SECONDS (reference README.md:157 open
        # todo: "when sampling, allow for specifying in seconds"). Converted
        # to latent frames via audio_enc_dec.seconds_per_frame. With cond
        # latents/audio: cond is curtailed/padded to that horizon. With the
        # duration-predictor pipeline: sets frame_length. Without cond on a
        # non-text model: enables pure length-specified generation from noise
        # (`batch_size` rows of zero cond, full-span generation mask).
        duration_seconds: Optional[float] = None,
        batch_size: int = 1,
        # "int8": run the transformer's Dense matmuls as s8 x s8 -> s32 MXU
        # ops (2x the bf16 MXU rate on v5e) — weights quantized once per
        # params version, activations dynamically per token (ops/quant.py).
        # Measured best large-model small-batch config: param_store_dtype=
        # bf16 + quantize="int8" (1.23x at dim 1024 batch 1, PERFORMANCE.md).
        # "w8a16": weight-only — int8 weights dequantized inside a Pallas
        # matmul's VMEM pipeline. MEASURED SLOWER than the bf16 baseline on
        # this model's shapes at every benchmarked config (0.69-0.99x,
        # benchmarks/int8_serving.py): its grid re-streams the activation
        # block per weight-column block; kept for genuinely weight-bound
        # niches only. Beyond-parity serving levers, off by default
        # (reference has no quantized path).
        quantize: Optional[str] = None,
        # Serve from params stored in this dtype (one cached cast per params
        # version). bf16 storage is numerically FREE for a bf16-compute model
        # (flax was already downcasting the kernels at use) and halves the
        # HBM read of the f32-computed adaptive-norm projections — measured
        # 1.10x at dim 1024 batch 1, 1.23x combined with quantize="int8"
        # (ops/quant.py::cast_float_params). None keeps the checkpoint dtype.
        param_store_dtype: Optional[jnp.dtype] = None,
        # set True when `semantic_token_ids` are ALREADY aligned 1:1 with
        # latent frames (sample_long's window loop pre-stretches them):
        # skips the wav2vec/codec sample-rate reconciliation so cond keeps
        # its given length
        ids_at_frame_rate: bool = False,
        rng: Optional[jax.Array] = None,
        params=None,
    ):
        """Sample audio latents by integrating the learned ODE from noise
        (mirrors voicebox_pytorch.py:1175-1330).

        Outputs are statically shaped (XLA): with `texts`, the generated
        semantic ids live in a fixed `max_semantic_token_ids` buffer, so the
        decoded audio always spans the full horizon — the part beyond the
        generated speech is padding. `return_lengths=True` additionally
        returns per-sample valid lengths (samples of audio, or frames of
        latents/codes) derived from the generator's validity mask, so callers
        can trim (the reference's AR generate returns variable-length ids
        instead, which static shapes forbid)."""
        params = params if params is not None else self.params
        assert params is not None, "call init_params() first or pass params="
        rng = rng if rng is not None else self._next_rng()

        codec = self.voicebox.audio_enc_dec

        if cond is not None:
            cond = jnp.asarray(cond)
        if is_probably_audio_from_shape(cond):
            assert codec is not None
            cond = codec.encode(cond)

        want_frames = None
        if duration_seconds is not None:
            assert codec is not None, (
                "duration_seconds needs an audio_enc_dec to define "
                "seconds_per_frame — pass cond latents of the desired "
                "length instead"
            )
            want_frames = codec.frames_for_seconds(duration_seconds)

        num_cond_inputs = sum(
            x is not None
            for x in (texts, text_token_ids, semantic_token_ids, phoneme_ids)
        )
        assert num_cond_inputs <= 1

        self_attn_mask = None
        cond_token_ids = None
        dp_frames = None

        if self.condition_on_text:
            if self.text_to_semantic is not None or semantic_token_ids is not None:
                assert want_frames is None, (
                    "duration_seconds conflicts with semantic-token "
                    "conditioning: the latent length follows the token count"
                )
                assert phoneme_ids is None
                if semantic_token_ids is None:
                    semantic_token_ids, self_attn_mask = self.text_to_semantic.generate(
                        source=text_token_ids if text_token_ids is not None else texts,
                        source_type="text",
                        target_type="speech",
                        max_length=max_semantic_token_ids,
                        return_target_mask=True,
                        spec_decode=spec_decode,
                        spec_decode_gamma=spec_decode_gamma,
                    )
                cond_token_ids = jnp.asarray(semantic_token_ids)
            elif self.duration_predictor is not None:
                if want_frames is not None and frame_length is None:
                    frame_length = want_frames
                if phoneme_ids is None:
                    tok = self.duration_predictor.tokenizer
                    assert tok is not None and texts is not None
                    phoneme_ids = jnp.asarray(tok.texts_to_tensor_ids(texts))
                phoneme_ids = jnp.asarray(phoneme_ids)
                durations, aligned_phoneme_ids = (
                    self.duration_predictor.forward_with_cond_scale(
                        cond=cond,
                        phoneme_ids=phoneme_ids,
                        return_aligned_phoneme_ids=True,
                        total_length=frame_length,
                    )
                )
                cond_token_ids = jnp.asarray(aligned_phoneme_ids)
                # speech span = sum of per-position durations over VALID
                # phoneme positions only — bucket pads (id -1) would
                # otherwise each contribute >= 1 junk frame to the
                # return_lengths validity signal. The rounding/masking rule
                # is THE shared one (duration.masked_frame_durations), so
                # this count can never drift from the aligned id stream.
                dp_frames = jnp.sum(
                    masked_frame_durations(phoneme_ids, durations), axis=-1
                )

            cond_tokens_seq_len = cond_token_ids.shape[-1]
            cond_target_length = cond_tokens_seq_len

            if cond is not None:
                if (self.text_to_semantic is not None and codec is not None
                        and not ids_at_frame_rate):
                    # sample-rate algebra between wav2vec and the codec
                    # (voicebox_pytorch.py:1246-1257); skipped when the codec
                    # is absent (latent-space serving: token count IS the
                    # frame count) or when the caller pre-stretched the ids
                    wav2vec = self.text_to_semantic.wav2vec
                    cond_target_length = math.ceil(
                        (cond_tokens_seq_len * wav2vec.target_sample_hz / wav2vec.downsample_factor)
                        / (codec.sampling_rate / codec.downsample_factor)
                    )
                cond = curtail_or_pad(cond, cond_target_length)
            else:
                cond = jnp.zeros(
                    (cond_token_ids.shape[0], cond_target_length, self.voicebox.latent_dim)
                )
        else:
            assert num_cond_inputs == 0, (
                "no conditioning inputs should be given if not conditioning on text"
            )
            if want_frames is not None:
                if cond is None:
                    # pure length-specified generation: zero cond, and the
                    # model's default sample-time cond_mask (all True)
                    # regenerates the whole span from noise
                    cond = jnp.zeros(
                        (batch_size, want_frames, self.voicebox.latent_dim)
                    )
                else:
                    cond = curtail_or_pad(cond, want_frames)

        assert cond is not None, (
            "cond latents (or conditioning tokens, or duration_seconds with "
            "a codec) required to sample"
        )

        y0 = jax.random.normal(rng, cond.shape, dtype=cond.dtype)

        fuse_decode = (
            decode_to_audio and not decode_to_codes and codec is not None
            and hasattr(codec, "decode_fn")
        )
        sampler = self._build_sampler(
            int(steps),
            bool(cond_scale != 1.0),
            cond_token_ids is not None,
            self_attn_mask is not None,
            cond_mask is not None,
            self.ode_method,
            fuse_decode,
            quantize,
        )
        if param_store_dtype is not None:
            params = self._stored_params(params, param_store_dtype)
        if quantize is not None:
            params = self._quantized_params(params, quantize)
        codec_params = codec.decode_fn()[1] if fuse_decode else None
        sampled = sampler(
            params, y0, cond, cond_token_ids, cond_mask, self_attn_mask,
            jnp.asarray(cond_scale, dtype=jnp.float32), codec_params,
        )

        if dp_frames is not None and frame_length is not None:
            # an explicit static horizon that cuts the predicted speech span
            # must never be silent (the serving engine re-buckets instead —
            # serving.py::_duration_sample). Checked AFTER the async sampler
            # dispatch so the tiny host fetch overlaps device work.
            over = np.asarray(dp_frames) - cond.shape[1]
            if (over > 0).any():
                warnings.warn(
                    f"predicted durations span up to {int(over.max())} frames "
                    f"beyond frame_length={cond.shape[1]}; the generated "
                    "speech is truncated — raise frame_length or use "
                    "sample_long",
                    stacklevel=2,
                )

        if fuse_decode:
            out = sampled  # decoded audio, one fused program
            out_is_audio = True
        elif decode_to_codes and codec is not None:
            out = codec.decode_to_codes(sampled)
            out_is_audio = False
        elif not decode_to_audio or codec is None:
            out = sampled
            out_is_audio = False
        else:
            out = codec.decode(sampled)
            out_is_audio = True
        if not return_lengths:
            return out

        n_frames = cond.shape[1]
        if self_attn_mask is not None:
            valid_tokens = jnp.asarray(self_attn_mask).sum(axis=-1)
            if self.text_to_semantic is not None and codec is not None:
                # same wav2vec/codec rate algebra as cond_target_length above
                wav2vec = self.text_to_semantic.wav2vec
                ratio = (wav2vec.target_sample_hz / wav2vec.downsample_factor) / (
                    codec.sampling_rate / codec.downsample_factor
                )
                frames = jnp.ceil(valid_tokens * ratio).astype(jnp.int32)
            else:
                frames = valid_tokens.astype(jnp.int32)
            frames = jnp.minimum(frames, n_frames)
        elif dp_frames is not None:  # duration pipeline: speech span from durations
            frames = jnp.minimum(dp_frames, n_frames)
        else:  # no validity mask (precomputed ids): everything is valid
            frames = jnp.full((out.shape[0],), n_frames, dtype=jnp.int32)
        if out_is_audio and codec is not None:
            return out, frames * codec.downsample_factor
        return out, frames

    def frames_per_semantic_token(self) -> float:
        """Latent frames produced per semantic token — the wav2vec/codec
        sample-rate ratio used by sample()'s length reconciliation
        (voicebox_pytorch.py:1246-1257); 1.0 when either side is absent
        (latent-space models: one frame per token)."""
        codec = self.voicebox.audio_enc_dec
        if (self.text_to_semantic is None or codec is None
                or self.text_to_semantic.wav2vec is None):
            return 1.0
        wav2vec = self.text_to_semantic.wav2vec
        return (wav2vec.target_sample_hz / wav2vec.downsample_factor) / (
            codec.sampling_rate / codec.downsample_factor
        )

    def _long_total_frames(self, n_ids: int, total_frames) -> int:
        """Default long-form horizon: token count scaled by the wav2vec/codec
        rate ratio (matching sample()'s cond length for the same ids)."""
        if total_frames is not None:
            return int(total_frames)
        return math.ceil(n_ids * self.frames_per_semantic_token())

    @staticmethod
    def _validate_long_args(total_frames, window_frames, overlap_frames):
        assert 0 < overlap_frames < window_frames, (
            f"need 0 < overlap_frames ({overlap_frames}) < window_frames "
            f"({window_frames})"
        )
        assert total_frames >= window_frames, (
            f"total_frames {total_frames} < window_frames {window_frames}: "
            "use sample() directly for short outputs"
        )

    def sample_long(
        self,
        *,
        semantic_token_ids,  # (b, n_ids) conditioning ids for the WHOLE output
        total_frames: Optional[int] = None,  # default: rate-scaled id count
        window_frames: int = 768,
        overlap_frames: int = 128,
        prompt=None,  # (b, p, d) latents or (b, p_samples) raw audio voice prompt
        steps: int = 3,
        cond_scale: float = 1.0,
        decode_to_audio: bool = True,
        quantize: Optional[str] = None,
        param_store_dtype: Optional[jnp.dtype] = None,
        rng: Optional[jax.Array] = None,
        params=None,
    ):
        """Unbounded-length synthesis by windowed infilling (beyond-parity:
        the reference generates one fixed horizon, voicebox_pytorch.py:1289 —
        its memory and latency grow with the utterance).

        Voicebox's training objective IS infilling (cond zeroed inside the
        span mask, :1031-1035), so generation continues seamlessly across
        windows: window k+1 is sampled with its first `overlap_frames`
        conditioned on window k's tail (`cond_mask=False` there = keep, True
        elsewhere = generate), exactly the paper's in-context continuation.
        Every window has the same static shape, so the WHOLE stream runs on
        ONE compiled program — O(window) memory and per-window latency for
        arbitrarily long audio. An optional `prompt` (voice sample) conditions
        the first window the same way. Composes with the serving levers
        (`quantize`, `param_store_dtype`).

        For incremental consumption (play audio while later windows are still
        sampling) use `sample_long_stream` — this method delegates to the
        same window loop, so the two are latent-identical for the same rng."""
        import numpy as np

        chunks = list(self._sample_long_chunks(
            semantic_token_ids=semantic_token_ids, total_frames=total_frames,
            window_frames=window_frames, overlap_frames=overlap_frames,
            prompt=prompt, steps=steps, cond_scale=cond_scale,
            quantize=quantize, param_store_dtype=param_store_dtype,
            rng=rng, params=params,
        ))
        out = jnp.asarray(np.concatenate(chunks, axis=1))
        codec = self.voicebox.audio_enc_dec
        if decode_to_audio and codec is not None:
            return codec.decode(out)
        return out

    def sample_long_stream(
        self,
        *,
        semantic_token_ids,  # (b, n_ids) conditioning ids for the WHOLE output
        total_frames: Optional[int] = None,  # default: rate-scaled id count
        window_frames: int = 768,
        overlap_frames: int = 128,
        prompt=None,  # (b, p, d) latents or (b, p_samples) raw audio voice prompt
        steps: int = 3,
        cond_scale: float = 1.0,
        decode_to_audio: bool = True,
        decode_ctx_frames: Optional[int] = None,
        quantize: Optional[str] = None,
        param_store_dtype: Optional[jnp.dtype] = None,
        rng: Optional[jax.Array] = None,
        params=None,
    ):
        """Streaming unbounded-length synthesis: returns a generator yielding
        audio (or latent) chunks as each infilling window completes, so
        playback can start after ONE window's sampling latency instead of the
        whole utterance's (beyond-parity: the reference only returns a
        complete fixed horizon, voicebox_pytorch.py:1289). Arguments are
        validated eagerly at call time (misuse fails here, not on first
        consumption).

        With `decode_to_audio=False` the yielded latent chunks concatenate to
        exactly `sample_long(decode_to_audio=False)` for the same rng (both
        run the identical window loop). With decoding on, each chunk is
        vocoded together with `decode_ctx_frames` (default: `overlap_frames`)
        of already-emitted latent left-context and a same-sized right guard of
        not-yet-emitted frames, then trimmed to the new samples — so every
        emitted sample sees a full receptive field of latent context on both
        sides. Seam-free for the time-local decoders — MelVoco/Vocos
        (ConvNeXt + 'same'-padded iSTFT) and EncodecVoco.decode (RVQ
        quantise -> Vocos; it never runs the Encodec LSTM decoder,
        codec.py:222-240) — whose receptive fields are << the default guard:
        bit-exact vs the one-shot decode on f32 backends; on TPU the
        default-precision matmuls can tile differently per chunk shape
        (measured ~5e-3 abs on O(1) audio for SHORT decodes generally — the
        same rounding any shape change induces, not a seam artifact).
        Steady-state chunks share ONE static decode shape (one compiled
        program); the first window and the final drain buffer are two more
        shapes, so a full stream compiles at most three decode programs —
        and when total_frames lands exactly on window + k*hop the final
        drain reuses the steady-state shape (the serving engine quantises
        to this grid)."""
        total = self._long_total_frames(
            jnp.asarray(semantic_token_ids).shape[1], total_frames
        )
        self._validate_long_args(total, window_frames, overlap_frames)
        ctx = overlap_frames if decode_ctx_frames is None else decode_ctx_frames
        assert ctx >= 0
        chunks = self._sample_long_chunks(
            semantic_token_ids=semantic_token_ids, total_frames=total,
            window_frames=window_frames, overlap_frames=overlap_frames,
            prompt=prompt, steps=steps, cond_scale=cond_scale,
            quantize=quantize, param_store_dtype=param_store_dtype,
            rng=rng, params=params,
        )
        codec = self.voicebox.audio_enc_dec
        return self._stream_decode(chunks, codec, decode_to_audio, ctx)

    @staticmethod
    def _stream_decode(chunks, codec, decode_to_audio: bool, ctx: int):
        if not decode_to_audio or codec is None:
            for chunk in chunks:
                yield jnp.asarray(chunk)
            return

        import numpy as np

        spf = codec.downsample_factor  # samples per latent frame
        buf = None  # latent frames [next_emit - left, received)
        left = 0    # already-emitted context frames at buf's head

        def drain(final: bool):
            # decode the buffer, emit only the samples of frames
            # [left, n - ctx) (all remaining frames when final), then trim the
            # buffer to the ctx frames of left context the next drain needs
            nonlocal buf, left
            n = buf.shape[1]
            emit_hi = n if final else n - ctx
            if emit_hi <= left:
                return None
            audio = np.asarray(codec.decode(jnp.asarray(buf)), np.float32)
            out = audio[..., left * spf:emit_hi * spf]
            keep_from = max(emit_hi - ctx, 0)
            left = emit_hi - keep_from
            buf = buf[:, keep_from:]
            return out

        for chunk in chunks:
            buf = chunk if buf is None else np.concatenate([buf, chunk], axis=1)
            out = drain(final=False)
            if out is not None:
                yield jnp.asarray(out)
        out = drain(final=True)
        if out is not None:
            yield jnp.asarray(out)

    def _sample_long_chunks(
        self, *, semantic_token_ids, total_frames, window_frames,
        overlap_frames, prompt, steps, cond_scale, quantize,
        param_store_dtype, rng, params,
    ):
        """Core window loop of sample_long / sample_long_stream: generate by
        windowed infilling and yield each window's newly-FINALIZED latent
        frames as a float32 numpy chunk (window_frames for the first window,
        then hop = window - overlap each; the concatenation of all chunks is
        the full (b, total_frames, d) latent stream). Frames are final the
        moment their window is sampled — the next window keeps its overlap
        prefix verbatim — so chunks can be decoded/played while later windows
        are still being generated."""
        ids = jnp.asarray(semantic_token_ids)
        b, n_ids = ids.shape
        total_frames = self._long_total_frames(n_ids, total_frames)
        self._validate_long_args(total_frames, window_frames, overlap_frames)
        rng = rng if rng is not None else self._next_rng()
        codec = self.voicebox.audio_enc_dec
        dim = self.voicebox.latent_dim

        if prompt is not None:
            prompt = jnp.asarray(prompt)
            if is_probably_audio_from_shape(prompt):
                assert codec is not None
                prompt = codec.encode(prompt)
            assert prompt.shape[1] <= window_frames - 1, (
                "prompt longer than a window — raise window_frames"
            )

        # Host-side stitching (numpy): every eager device op on a tunneled
        # backend is a ~30 ms dispatch, so the glue stays on the host — the
        # only device work per window is the ONE compiled sample() program.
        import numpy as np

        ids_np = np.asarray(ids)
        # ids at the latent frame rate (nearest-neighbour stretch), so
        # per-window slices stay aligned with the latent timeline
        idx = np.minimum((np.arange(total_frames) * n_ids) // total_frames,
                         n_ids - 1)
        frame_ids = ids_np[:, idx]

        hop = window_frames - overlap_frames
        n_windows = 1 + max(0, -(-(total_frames - window_frames) // hop))
        padded_total = window_frames + (n_windows - 1) * hop
        if padded_total > total_frames:  # tail window padded with its last id
            frame_ids = np.concatenate(
                [frame_ids,
                 np.repeat(frame_ids[:, -1:], padded_total - total_frames, axis=1)],
                axis=1,
            )

        prompt_np = None if prompt is None else np.asarray(prompt, np.float32)
        latents = np.zeros((b, padded_total, dim), dtype=np.float32)
        arange_w = np.arange(window_frames)
        done = 0  # frames already yielded as finalized chunks
        for w in range(n_windows):
            start = w * hop
            ids_w = frame_ids[:, start:start + window_frames]
            cond_w = np.zeros((b, window_frames, dim), dtype=np.float32)
            keep = np.zeros((window_frames,), dtype=bool)
            if w == 0:
                if prompt_np is not None:
                    p_len = prompt_np.shape[1]
                    cond_w[:, :p_len] = prompt_np
                    keep = arange_w < p_len
            else:
                cond_w[:, :overlap_frames] = latents[:, start:start + overlap_frames]
                keep = arange_w < overlap_frames
            rng, sub = jax.random.split(rng)
            out_w = np.asarray(
                self.sample(
                    cond=jnp.asarray(cond_w),
                    semantic_token_ids=jnp.asarray(ids_w),
                    ids_at_frame_rate=True,  # ids pre-stretched above
                    cond_mask=jnp.broadcast_to(
                        jnp.asarray(~keep), (b, window_frames)
                    ),
                    steps=steps,
                    cond_scale=cond_scale,
                    decode_to_audio=False,
                    quantize=quantize,
                    param_store_dtype=param_store_dtype,
                    rng=sub,
                    params=params,
                ),
                dtype=np.float32,
            )
            # keep previously-committed frames on the overlap; commit the rest
            committed = latents[:, start:start + window_frames] if w > 0 else cond_w
            latents[:, start:start + window_frames] = np.where(
                keep[None, :, None], committed, out_w
            )
            # everything through this window is now final: the next window
            # keeps its overlap prefix verbatim (cond_mask=False there)
            fin = min(start + window_frames, total_frames)
            if fin > done:
                yield latents[:, done:fin].copy()
                done = fin


def _resample_if_needed(audio, sr_in: Optional[int], sr_out: int):
    if sr_in is None or sr_in == sr_out:
        return audio
    from ..ops.stft import resample

    return resample(audio, sr_in, sr_out)
