"""L0 neural primitives (flax.linen).

TPU-first re-design of the reference's tensor/NN primitives
(voicebox_pytorch.py:152-349). Parameter semantics (shapes, init, fp32-forced
subcomputations) match the reference so the math is numerically comparable;
the implementation is pure-functional flax with explicit dtypes so XLA can run
the bulk compute in bfloat16 on the MXU while norms/rotary stay fp32.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name
from flax import linen as nn

from ..ops.gateloop import gated_linear_recurrence

__all__ = [
    "LearnedSinusoidalPosEmb",
    "rotary_frequencies",
    "rotate_half",
    "apply_rotary_pos_emb",
    "ConvPositionEmbed",
    "RMSNorm",
    "AdaptiveRMSNorm",
    "MultiheadRMSNorm",
    "GEGLU",
    "FeedForward",
    "SimpleGateLoopLayer",
]


def _l2norm(x: jax.Array, eps: float = 1e-12) -> jax.Array:
    """torch F.normalize semantics: x / max(||x||_2, eps) over the last axis.

    The clamp sits INSIDE the sqrt: sqrt's gradient at 0 is inf, and an
    all-zero row (e.g. a lane-alignment pad frame through a zero-init bias)
    would poison the whole backward pass with NaNs."""
    sumsq = jnp.sum(jnp.square(x), axis=-1, keepdims=True)
    # rsqrt + multiply, not divide-by-sqrt: one rsqrt per ROW plus cheap
    # per-element multiplies instead of a multi-cycle VPU divide per element
    return x * jax.lax.rsqrt(jnp.maximum(sumsq, eps * eps))


class LearnedSinusoidalPosEmb(nn.Module):
    """Learned-frequency Fourier features of the scalar ODE time
    (reference voicebox_pytorch.py:154-167)."""

    dim: int

    @nn.compact
    def __call__(self, t: jax.Array) -> jax.Array:  # t: (b,)
        assert self.dim % 2 == 0
        half_dim = self.dim // 2
        weights = self.param("weights", nn.initializers.normal(1.0), (half_dim,))
        freqs = t[:, None].astype(jnp.float32) * weights[None, :] * 2 * math.pi
        return jnp.concatenate([jnp.sin(freqs), jnp.cos(freqs)], axis=-1)


def rotary_frequencies(positions: jax.Array, dim: int, theta: float = 50000.0) -> jax.Array:
    """RoPE frequency table, fp32 (reference voicebox_pytorch.py:172-191).

    positions: (n,) -> returns (n, dim) = cat(freqs, freqs).
    """
    inv_freq = 1.0 / (theta ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    freqs = jnp.einsum("i,j->ij", positions.astype(jnp.float32), inv_freq)
    return jnp.concatenate([freqs, freqs], axis=-1)


def rotate_half(x: jax.Array) -> jax.Array:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rotary_pos_emb(pos: jax.Array, t: jax.Array) -> jax.Array:
    """fp32-forced rotary application (reference voicebox_pytorch.py:197-199)."""
    dtype = t.dtype
    t32 = t.astype(jnp.float32)
    out = t32 * jnp.cos(pos) + rotate_half(t32) * jnp.sin(pos)
    return out.astype(dtype)


def _halo_exchange_1d(x: jax.Array, halo: int, axis_name: str) -> jax.Array:
    """Pad a sequence-sharded (b, n_local, d) tensor with `halo` frames from
    each ring neighbour (zeros at the global edges, matching the zero 'SAME'
    padding a full-sequence conv would see). Convolving the result with
    padding='VALID' then equals the global conv's local output slice."""
    assert x.shape[1] >= halo, (
        f"local shard ({x.shape[1]} frames) shorter than the conv halo "
        f"({halo}); use fewer shards or a smaller kernel"
    )
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [((i + 1) % n, i) for i in range(n)]
    from_left = jax.lax.ppermute(x[:, -halo:], axis_name, fwd)
    from_right = jax.lax.ppermute(x[:, :halo], axis_name, bwd)
    from_left = jnp.where(idx == 0, 0.0, from_left)
    from_right = jnp.where(idx == n - 1, 0.0, from_right)
    return jnp.concatenate([from_left, x, from_right], axis=1)


class ConvPositionEmbed(nn.Module):
    """Depthwise 1-D conv positional module with pre/post masking + GELU
    (reference voicebox_pytorch.py:203-233). Output is residually added by
    callers. Uses NLC layout (feature-minor) which is the TPU-friendly layout
    for `lax.conv_general_dilated`.

    Under sequence parallelism (`seq_axis` set, module inside `shard_map`)
    the conv's receptive field crosses shard boundaries: a halo of
    kernel_size//2 frames is exchanged with the ring neighbours via
    `lax.ppermute` and the conv runs VALID over the widened block — exactly
    the full-sequence 'SAME' conv, computed shard-locally."""

    dim: int
    kernel_size: int = 31
    groups: Optional[int] = None
    seq_axis: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
        assert self.kernel_size % 2 == 1
        groups = self.groups if self.groups is not None else self.dim

        if mask is not None:
            x = jnp.where(mask[..., None], x, 0.0)

        padding = "SAME"
        if self.seq_axis is not None and self.kernel_size > 1:
            x = _halo_exchange_1d(x, self.kernel_size // 2, self.seq_axis)
            padding = "VALID"

        x = nn.Conv(
            features=self.dim,
            kernel_size=(self.kernel_size,),
            padding=padding,
            feature_group_count=groups,
            dtype=self.dtype,
            name="dw_conv1d",
        )(x)
        # tanh-approximate GELU: measured 16% cheaper per FF stack on v5e than
        # exact erf (PERFORMANCE.md), and the denoiser has no pretrained
        # reference weights to match bit-for-bit (ported-codec models — vocos,
        # hubert — DO use exact GELU for checkpoint parity)
        out = nn.gelu(x)

        if mask is not None:
            out = jnp.where(mask[..., None], out, 0.0)

        return out


class RMSNorm(nn.Module):
    """gamma * sqrt(d) * l2norm(x) (reference voicebox_pytorch.py:237-247).
    Normalisation runs in fp32 regardless of compute dtype."""

    dim: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        gamma = self.param("gamma", nn.initializers.ones, (self.dim,))
        scale = self.dim**0.5
        out = _l2norm(x.astype(jnp.float32)) * scale * gamma
        return checkpoint_name(
            out.astype(x.dtype), "norm_out")


class AdaptiveRMSNorm(nn.Module):
    """RMSNorm whose gain/bias are regressed from a condition vector, zero-init
    so it starts as identity (gamma-bias = 1) — reference
    voicebox_pytorch.py:249-276."""

    dim: int
    cond_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, cond: jax.Array) -> jax.Array:
        scale = self.dim**0.5
        normed = _l2norm(x.astype(jnp.float32)) * scale

        gamma = nn.Dense(
            self.dim,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.ones,
            dtype=jnp.float32,
            name="to_gamma",
        )(cond.astype(jnp.float32))
        beta = nn.Dense(
            self.dim,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=jnp.float32,
            name="to_beta",
        )(cond.astype(jnp.float32))

        out = normed * gamma[:, None, :] + beta[:, None, :]
        return checkpoint_name(
            out.astype(x.dtype), "norm_out")


class MultiheadRMSNorm(nn.Module):
    """Per-head qk-norm: gamma (heads, 1, dim) * sqrt(dim) * l2norm(x)
    (reference voicebox_pytorch.py:280-287). Input: (b, h, n, d)."""

    dim: int
    heads: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        gamma = self.param("gamma", nn.initializers.ones, (self.heads, 1, self.dim))
        scale = self.dim**0.5
        out = _l2norm(x.astype(jnp.float32)) * gamma * scale
        return out.astype(x.dtype)


class GEGLU(nn.Module):
    """x, gate = split(x); gelu(gate) * x (reference voicebox_pytorch.py:337-340)."""

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x, gate = jnp.split(x, 2, axis=-1)
        # tanh-approximate GELU (TPU-fast; see ConvPositionEmbed note)
        return checkpoint_name(nn.gelu(gate) * x, "gelu_out")


class FeedForward(nn.Module):
    """GEGLU MLP, inner dim = int(dim * mult * 2/3) to param-match a non-gated
    4x MLP (reference voicebox_pytorch.py:342-349)."""

    dim: int
    mult: float = 4.0
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        dim_inner = int(self.dim * self.mult * 2 / 3)
        x = nn.Dense(dim_inner * 2, dtype=self.dtype, name="proj_in")(x)
        x = GEGLU()(x)
        if self.dropout > 0.0:
            x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj_out")(x)


class SimpleGateLoopLayer(nn.Module):
    """Data-controlled linear recurrence (GateLoop with head dim 1), run as a
    single `jax.lax.associative_scan` — see `voicebox_tpu.ops.gateloop`.

    Structure mirrors `gateloop_transformer.SimpleGateLoopLayer` as the
    reference constructs it (voicebox_pytorch.py:31,399,465-466): pre-RMSNorm,
    one fused dim*3 projection into (q, kv, a), sigmoid forget gate, state
    recurrence s_t = a_t s_{t-1} + kv_t, output q * s, optional post-LN
    (`post_ln=True` at the call site), no output projection — the caller adds
    the residual. Input (b, n, d) -> output (b, n, d).
    """

    dim: int
    prenorm: bool = True
    post_ln: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.prenorm:
            x = RMSNorm(self.dim, name="norm")(x)
        qkva = nn.Dense(self.dim * 3, use_bias=False, dtype=self.dtype, name="to_qkva")(x)
        q, kv, a = jnp.split(qkva, 3, axis=-1)

        # data-controlled forget gate in (0, 1)
        gate = jax.nn.sigmoid(a)
        state = gated_linear_recurrence(gate, kv, axis=1)
        out = q * state

        if self.post_ln:
            out = nn.LayerNorm(dtype=self.dtype, name="post_norm")(out)
        return out
