"""DurationPredictor: phoneme-conditioned duration regression + NS2-style
learned aligner for training targets (flax.linen).

Mirrors the reference `DurationPredictor` (voicebox_pytorch.py:596-876):
phoneme embedding (512) fused with span-masked conditioning audio, ConvPosEmbed
residual, Transformer (depth 10, qk-norm, plain RMSNorm), Linear(dim, 1) head;
training targets are MAS-aligned hard durations (soft-alignment net +
`maximum_path`), with masked-mean L1 + forward-sum alignment loss.

The soft aligner follows the NS2 recipe the reference imports as a black box
(`naturalspeech2_pytorch.aligner.Aligner`, call site voicebox_pytorch.py:619,
682,743): conv towers over mel queries and phoneme keys, alignment energy =
negative L2 distance, log-softmax over phonemes.

Reference bugs fixed, not replicated (SURVEY.md 'quirks'):
* duration L1 loss is computed on the predicted `durations`, not the
  transformer hidden states (voicebox_pytorch.py:856-866);
* the forward-sum alignment loss is always added in training (the reference
  only adds it when `return_aligned_phoneme_ids=True`,
  voicebox_pytorch.py:868-874).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.forward_sum import forward_sum_loss
from ..ops.interp import curtail_or_pad
from ..ops.mas import maximum_path
from ..ops.masks import mask_from_frac_lengths, prob_mask_like
from ..utils.tokenizer import Tokenizer
from .primitives import ConvPositionEmbed
from .transformer import Transformer

__all__ = ["Aligner", "DurationPredictorNet", "DurationPredictor"]


class Aligner(nn.Module):
    """NS2-style soft alignment: conv towers + negative-distance attention.

    queries: mel (b, dim_in, t_mel); keys: phoneme emb (b, t_ph, dim_hidden);
    returns (alignment_soft (b, 1, t_mel, t_ph), alignment_logprob same shape).
    """

    dim_in: int = 80
    dim_hidden: int = 512
    attn_channels: int = 80
    temperature: float = 0.0005
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        queries: jax.Array,  # (b, dim_in, t_mel)
        keys: jax.Array,  # (b, t_ph, dim_hidden)
        mask: Optional[jax.Array] = None,  # (b, 1, t_ph) or (b, t_ph)
    ) -> Tuple[jax.Array, jax.Array]:
        q = queries.transpose(0, 2, 1)  # (b, t_mel, dim_in)
        k = keys  # (b, t_ph, dim_hidden)

        k = nn.Conv(self.dim_hidden * 2, (3,), padding="SAME", dtype=self.dtype,
                    name="key_conv1")(k)
        k = nn.relu(k)
        k = nn.Conv(self.attn_channels, (1,), dtype=self.dtype, name="key_conv2")(k)

        q = nn.Conv(self.dim_in * 2, (3,), padding="SAME", dtype=self.dtype,
                    name="query_conv1")(q)
        q = nn.relu(q)
        q = nn.Conv(self.dim_in, (1,), dtype=self.dtype, name="query_conv2")(q)
        q = nn.relu(q)
        q = nn.Conv(self.attn_channels, (1,), dtype=self.dtype, name="query_conv3")(q)

        # negative squared distance attention energies
        dist = (
            jnp.sum(jnp.square(q), axis=-1)[:, :, None]
            - 2 * jnp.einsum("btc,bsc->bts", q, k)
            + jnp.sum(jnp.square(k), axis=-1)[:, None, :]
        )  # (b, t_mel, t_ph)
        energies = -self.temperature * dist

        if mask is not None:
            if mask.ndim == 3:
                mask = mask[:, 0, :]
            energies = jnp.where(mask[:, None, :], energies, -1e9)

        logprob = jax.nn.log_softmax(energies, axis=-1)
        soft = jnp.exp(logprob)
        return soft[:, None], logprob[:, None]


class DurationPredictorNet(nn.Module):
    """The pure network: phoneme emb + cond fusion -> transformer -> durations."""

    num_phoneme_tokens: int
    dim_phoneme_emb: int = 512
    dim: int = 512
    latent_dim: Optional[int] = None  # codec latent dim if != dim
    depth: int = 10
    dim_head: int = 64
    heads: int = 8
    ff_mult: float = 4.0
    ff_dropout: float = 0.0
    conv_pos_embed_kernel_size: int = 31
    conv_pos_embed_groups: Optional[int] = None
    attn_dropout: float = 0.0
    use_flash: Optional[bool] = None
    attn_qk_norm: bool = True
    use_gateloop_layers: bool = False
    p_drop_prob: float = 0.2  # p_drop in the paper
    frac_lengths_mask: Tuple[float, float] = (0.1, 1.0)
    aligner_dim_in: int = 80
    aligner_attn_channels: int = 80
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        *,
        cond: jax.Array,  # (b, t, latent_dim|dim) conditioning audio latents
        phoneme_ids: jax.Array,  # (b, t_ph) int, pad = -1
        cond_drop_prob: float = 0.0,
        cond_drop_mask: Optional[jax.Array] = None,
        cond_mask: Optional[jax.Array] = None,
        mel: Optional[jax.Array] = None,  # (b, t_mel, aligner_dim_in) train only
        phoneme_len: Optional[jax.Array] = None,
        mel_len: Optional[jax.Array] = None,
        phoneme_mask: Optional[jax.Array] = None,  # (b, t_ph)
        mel_mask: Optional[jax.Array] = None,  # (b, t_mel)
        self_attn_mask: Optional[jax.Array] = None,
        train: bool = False,
        return_aligned_phoneme_ids: bool = False,
    ):
        batch, seq_len, _ = cond.shape

        if self.latent_dim is not None and self.latent_dim != self.dim:
            cond = nn.Dense(self.dim, dtype=self.dtype, name="proj_in")(cond)

        # conditioning span mask: coin flip between a contiguous span covering
        # frac in (0.1, 1.0) and iid Bernoulli(p_drop) (voicebox_pytorch.py:786-793)
        if cond_mask is None:
            if train:
                use_frac = jax.random.bernoulli(self.make_rng("mask"))
                frac_lengths = jax.random.uniform(
                    self.make_rng("mask"), (batch,),
                    minval=self.frac_lengths_mask[0],
                    maxval=self.frac_lengths_mask[1],
                )
                span = mask_from_frac_lengths(self.make_rng("mask"), seq_len, frac_lengths)
                bern = prob_mask_like(self.make_rng("mask"), (batch, seq_len),
                                      self.p_drop_prob)
                cond_mask = jnp.where(use_frac, span, bern)
            else:
                cond_mask = jnp.zeros((batch, seq_len), dtype=bool)

        cond = cond * (~cond_mask[..., None]).astype(cond.dtype)

        # classifier-free guidance null-cond swap
        if cond_drop_mask is None and cond_drop_prob > 0.0:
            cond_drop_mask = prob_mask_like(self.make_rng("cfg"), (batch,), cond_drop_prob)
        if cond_drop_mask is not None:
            cond = jnp.where(cond_drop_mask[:, None, None], 0.0, cond)

        # pad id -1 -> attention mask; clamp ids for the embedding lookup
        if self_attn_mask is None:
            self_attn_mask = phoneme_ids != -1
        phoneme_ids_clamped = jnp.clip(phoneme_ids, 0, None)

        phoneme_emb = nn.Embed(
            self.num_phoneme_tokens, self.dim_phoneme_emb, dtype=self.dtype,
            name="to_phoneme_emb",
        )(phoneme_ids_clamped)

        cond = curtail_or_pad(cond, phoneme_ids.shape[-1])
        x = nn.Dense(self.dim, dtype=self.dtype, name="to_embed")(
            jnp.concatenate([phoneme_emb, cond], axis=-1)
        )

        x = ConvPositionEmbed(
            dim=self.dim, kernel_size=self.conv_pos_embed_kernel_size,
            groups=self.conv_pos_embed_groups, dtype=self.dtype, name="conv_embed",
        )(x, mask=self_attn_mask) + x

        x = Transformer(
            dim=self.dim, depth=self.depth, dim_head=self.dim_head,
            heads=self.heads, ff_mult=self.ff_mult, ff_dropout=self.ff_dropout,
            attn_dropout=self.attn_dropout, use_flash=self.use_flash,
            attn_qk_norm=self.attn_qk_norm,
            use_gateloop_layers=self.use_gateloop_layers,
            dtype=self.dtype, name="transformer",
        )(x, mask=self_attn_mask, deterministic=not train)

        durations = nn.Dense(1, dtype=self.dtype, name="to_pred")(x)[..., 0]

        if not train:
            return durations

        assert all(v is not None for v in (mel, phoneme_len, mel_len, phoneme_mask, mel_mask)), (
            "need mel, phoneme_len, mel_len, phoneme_mask, mel_mask to train the duration predictor"
        )

        # aligner: soft alignment + MAS hard path -> per-phoneme durations
        soft, logprob = Aligner(
            dim_in=self.aligner_dim_in,
            dim_hidden=self.dim_phoneme_emb,
            attn_channels=self.aligner_attn_channels,
            name="aligner",
        )(mel.transpose(0, 2, 1), phoneme_emb, phoneme_mask)

        attn_mask = phoneme_mask[:, :, None] & mel_mask[:, None, :]  # (b, t_ph, t_mel)
        alignment_mas = maximum_path(
            soft[:, 0].transpose(0, 2, 1), attn_mask  # (b, t_ph, t_mel)
        )
        alignment_hard = jnp.sum(alignment_mas, axis=-1).astype(jnp.float32)
        target = jax.lax.stop_gradient(alignment_hard)

        # masked-mean L1 on predicted durations (bug-fixed; see module docstring)
        loss_mask = cond_mask[:, : phoneme_ids.shape[-1]]
        loss_mask = curtail_or_pad(loss_mask[..., None], phoneme_ids.shape[-1])[..., 0]
        loss_mask = loss_mask & self_attn_mask
        target = curtail_or_pad(target[..., None], phoneme_ids.shape[-1])[..., 0]

        l1 = jnp.abs(durations.astype(jnp.float32) - target)
        l1 = jnp.where(loss_mask, l1, 0.0)
        num = jnp.sum(l1, axis=-1)
        den = jnp.clip(jnp.sum(loss_mask, axis=-1).astype(jnp.float32), 1e-5, None)
        dur_loss = jnp.mean(num / den)

        align_loss = forward_sum_loss(logprob, phoneme_len, mel_len)
        loss = dur_loss + align_loss

        if return_aligned_phoneme_ids:
            return loss, target
        return loss


def masked_frame_durations(phoneme_ids, durations):
    """THE duration-rounding rule, shared by id alignment
    (`align_phoneme_ids_with_durations`), `cfm.sample`'s `return_lengths`
    frame counts, and the serving engine's horizon math
    (`serving.py::_predict_durations`) so the three can never drift:
    `clip(round(d), 1)` per position — every REAL phoneme speaks for at
    least one frame (reference voicebox_pytorch.py:833-839) — then ZERO at
    pad positions (id < 0, bucket padding), which the reference never sees
    because its ids are unpadded per-valid-phoneme. Dispatches on the input
    type so host (numpy) callers stay off the device."""
    xp = jnp if isinstance(durations, jax.Array) else np
    per = xp.clip(xp.round(durations), 1, None).astype(xp.int32)
    return xp.where(xp.asarray(phoneme_ids) >= 0, per, 0)


def align_phoneme_ids_with_durations(
    phoneme_ids: jax.Array, durations: jax.Array, total_length: Optional[int] = None
) -> jax.Array:
    """Oversample phoneme ids to the frame rate by repeating each id for its
    duration (reference voicebox_pytorch.py:689-692 /
    `generate_mask_from_repeats`). Frame j gets phoneme i where
    cumsum[i-1] <= j < cumsum[i] — a searchsorted gather instead of the
    reference's (b, n, total) one-hot einsum (O(n*total) memory saved).

    Pad positions (id < 0, bucket padding) contribute ZERO duration
    (`masked_frame_durations`): a pad's clipped >=1 duration would inflate
    the speech span and gather pad ids into the frames between the
    valid-prefix sum and the inflated total."""
    durations = masked_frame_durations(phoneme_ids, jnp.asarray(durations))
    boundaries = jnp.cumsum(durations, axis=-1)  # (b, n_ph)
    if total_length is None:
        total_length = int(jnp.max(boundaries[:, -1]))
    frames = jnp.arange(total_length)[None, :]  # (1, total)
    # index of first boundary > frame
    idx = jnp.sum(frames[:, :, None] >= boundaries[:, None, :], axis=-1)
    idx = jnp.clip(idx, 0, phoneme_ids.shape[-1] - 1)
    aligned = jnp.take_along_axis(phoneme_ids, idx, axis=-1)
    # frames past a row's total duration get id 0, matching the reference
    # einsum (no phoneme covers them -> sum of one-hots is 0,
    # voicebox_pytorch.py:689-692) — NOT the clamped last/pad phoneme
    return jnp.where(frames < boundaries[:, -1:], aligned, 0)


class DurationPredictor:
    """Stateful façade mirroring the reference's module surface: tokenizer
    handling, CFG-scaled inference, aligned-id generation."""

    def __init__(
        self,
        *,
        audio_enc_dec: Optional[Any] = None,
        tokenizer: Optional[Any] = None,
        num_phoneme_tokens: Optional[int] = None,
        dim_phoneme_emb: int = 512,
        dim: int = 512,
        depth: int = 10,
        params: Optional[Any] = None,
        aligner_dim_in: int = 80,
        aligner_attn_channels: int = 80,
        **net_kwargs,
    ):
        assert not (tokenizer is not None and num_phoneme_tokens is not None), (
            "when a tokenizer is given, num_phoneme_tokens is not needed"
        )
        if tokenizer is None and num_phoneme_tokens is None:
            tokenizer = Tokenizer()
        if tokenizer is not None:
            num_phoneme_tokens = tokenizer.vocab_size
        self.tokenizer = tokenizer
        self.audio_enc_dec = audio_enc_dec

        latent_dim = None
        if audio_enc_dec is not None and audio_enc_dec.latent_dim != dim:
            latent_dim = audio_enc_dec.latent_dim

        self.net = DurationPredictorNet(
            num_phoneme_tokens=num_phoneme_tokens,
            dim_phoneme_emb=dim_phoneme_emb,
            dim=dim,
            latent_dim=latent_dim,
            depth=depth,
            aligner_dim_in=aligner_dim_in,
            aligner_attn_channels=aligner_attn_channels,
            **net_kwargs,
        )
        self.params = params
        self._rng = jax.random.PRNGKey(0)
        # jitted apply for eval/inference paths (eager apply is slow on a
        # tunneled TPU backend)
        self._apply_jit = jax.jit(
            self.net.apply,
            static_argnames=("train", "cond_drop_prob", "return_aligned_phoneme_ids"),
        )

    def init_params(self, rng, seq_len: int = 64, n_phonemes: int = 16, batch: int = 1):
        cond_dim = (
            self.audio_enc_dec.latent_dim if self.audio_enc_dec is not None else self.net.dim
        )
        variables = jax.jit(self.net.init, static_argnames=("train",))(
            {"params": rng, "mask": rng, "cfg": rng},
            cond=jnp.zeros((batch, seq_len, cond_dim)),
            phoneme_ids=jnp.zeros((batch, n_phonemes), dtype=jnp.int32),
            mel=jnp.zeros((batch, seq_len, self.net.aligner_dim_in)),
            phoneme_len=jnp.full((batch,), n_phonemes, dtype=jnp.int32),
            mel_len=jnp.full((batch,), seq_len, dtype=jnp.int32),
            phoneme_mask=jnp.ones((batch, n_phonemes), dtype=bool),
            mel_mask=jnp.ones((batch, seq_len), dtype=bool),
            train=True,
        )
        self.params = variables["params"]
        return self.params

    def _next_rng(self):
        self._rng, sub = jax.random.split(self._rng)
        return sub

    def load_torch(self, path):
        """Port a reference DurationPredictor checkpoint (raw state dict or a
        trainer checkpoint with the `duration_predictor.` prefix) into this
        facade's params — inference-complete; the training-only aligner
        retrains from init (`utils/port_weights.py::
        load_duration_predictor_torch` documents why)."""
        from ..utils.port_weights import load_duration_predictor_torch

        assert self.params is not None, (
            "call init_params() first — it provides the shape template"
        )
        self.params = load_duration_predictor_torch(path, self.params)
        return self.params

    def save_torch(self, path, prefix: str = ""):
        """The INVERSE of `load_torch`: export a reference-layout
        `DurationPredictor` state dict (inside a `{'model': ...}` pkg like
        the reference trainer's). The aligner is NOT exported (its NS2
        parameter names are unknowable here — symmetric with the load
        direction), so the reference side loads with `strict=False`:
        inference-complete, the training-only aligner retrains from init.
        Pass `prefix='duration_predictor.'` to produce keys for a
        ConditionalFlowMatcherWrapper-level state dict."""
        from ..utils.port_weights import (
            export_duration_predictor_torch,
            save_reference_checkpoint,
        )

        assert self.params is not None, "no params to export"
        sd = export_duration_predictor_torch(
            self.params, dim_head=self.net.dim_head
        )
        return save_reference_checkpoint(
            path, {f"{prefix}{k}": v for k, v in sd.items()}
        )

    def loss_fn(self, params, rng, *, cond, phoneme_ids, mel, phoneme_len, mel_len,
                phoneme_mask, mel_mask, cond_drop_prob: float = 0.0, **kwargs):
        """Pure training loss — jit/grad-able."""
        k1, k2, k3 = jax.random.split(rng, 3)
        return self.net.apply(
            {"params": params},
            cond=cond, phoneme_ids=phoneme_ids, mel=mel,
            phoneme_len=phoneme_len, mel_len=mel_len,
            phoneme_mask=phoneme_mask, mel_mask=mel_mask,
            cond_drop_prob=cond_drop_prob, train=True,
            rngs={"mask": k1, "cfg": k2, "dropout": k3},
            **kwargs,
        )

    def __call__(self, *, cond, texts=None, phoneme_ids=None, train=False,
                 rng=None, params=None, **kwargs):
        params = params if params is not None else self.params
        assert params is not None, "call init_params() first or pass params="
        if phoneme_ids is None:
            assert self.tokenizer is not None and texts is not None
            phoneme_ids = jnp.asarray(self.tokenizer.texts_to_tensor_ids(texts))
        if train:
            return self.loss_fn(params, rng if rng is not None else self._next_rng(),
                                cond=cond, phoneme_ids=phoneme_ids, **kwargs)
        return self._apply_jit(
            {"params": params}, cond=cond, phoneme_ids=phoneme_ids,
            cond_drop_prob=0.0, train=False, **kwargs,
        )

    def forward_with_cond_scale(
        self,
        *,
        cond,
        texts=None,
        phoneme_ids=None,
        cond_scale: float = 1.0,
        return_aligned_phoneme_ids: bool = False,
        total_length: Optional[int] = None,
        params=None,
        **kwargs,
    ):
        """CFG-scaled duration inference (voicebox_pytorch.py:694-727). As in
        the sampler, the cond/null pair runs as one 2b-batched forward."""
        params = params if params is not None else self.params
        assert params is not None
        if phoneme_ids is None:
            assert self.tokenizer is not None and texts is not None
            phoneme_ids = jnp.asarray(self.tokenizer.texts_to_tensor_ids(texts))
        phoneme_ids = jnp.asarray(phoneme_ids)
        if cond is None:
            # no voice prompt: null-conditioned prediction (zero cond latents,
            # fully dropped — CFG degenerates to the unconditional branch,
            # the analogue of the wrapper's zeros-cond fallback,
            # voicebox_pytorch.py:1259)
            b = phoneme_ids.shape[0]
            cond_dim = (
                self.audio_enc_dec.latent_dim
                if self.audio_enc_dec is not None else self.net.dim
            )
            cond = jnp.zeros((b, phoneme_ids.shape[1], cond_dim))
            kwargs.setdefault("cond_drop_mask", jnp.ones((b,), dtype=bool))
            cond_scale = 1.0
        cond = jnp.asarray(cond)

        b = cond.shape[0]
        if cond_scale == 1.0:
            drop = kwargs.pop("cond_drop_mask", jnp.zeros((b,), dtype=bool))
            durations = self._apply_jit(
                {"params": params}, cond=cond, phoneme_ids=phoneme_ids,
                cond_drop_prob=0.0,
                cond_drop_mask=drop, train=False, **kwargs,
            )
        else:
            cond2 = jnp.concatenate([cond, cond], axis=0)
            ids2 = jnp.concatenate([phoneme_ids, phoneme_ids], axis=0)
            drop2 = jnp.concatenate(
                [jnp.zeros((b,), dtype=bool), jnp.ones((b,), dtype=bool)]
            )
            out2 = self._apply_jit(
                {"params": params}, cond=cond2, phoneme_ids=ids2,
                cond_drop_prob=0.0, cond_drop_mask=drop2, train=False, **kwargs,
            )
            durations, null_durations = out2[:b], out2[b:]
            durations = null_durations + (durations - null_durations) * cond_scale

        if not return_aligned_phoneme_ids:
            return durations
        # an explicit total_length keeps the aligned-id shape STATIC (serving
        # buckets: no per-request recompiles, no host sync on jnp.max)
        aligned = align_phoneme_ids_with_durations(
            phoneme_ids, durations, total_length=total_length
        )
        return durations, aligned
