"""Encodec neural audio codec (flax.linen): SEANet conv encoder/decoder +
residual vector quantisation.

TPU-native implementation of the `audiolm_pytorch.EncodecWrapper` contract
used by the reference (voicebox_pytorch.py:28,561-581): frozen Meta Encodec
24 kHz —

* `encode(audio (b, n)) -> latents (b, n/320, 128)` (continuous,
  pre-quantisation — `return_encoded=True` semantics)
* `rq(latents) -> (quantized, codes (b, n, q), ...)` residual VQ against the
  learned codebooks
* `.codebook_dim == 128`, `.downsample_factor == 320` (strides 2*4*5*8)

Architecture follows the public Encodec recipe (arXiv 2210.13438): conv stem
-> 4 blocks of [residual unit + strided downsampling conv, channels doubling]
-> 2-layer LSTM -> conv head, ELU activations, causal padding. The decoder
mirrors with transposed convs. Sequence layout is NLC (feature-minor) so every
conv lowers to an MXU-friendly `conv_general_dilated`; the LSTM runs as an
`nn.RNN` scan.

No network egress here: weights are randomly initialised with the exact
pretrained architecture; `voicebox_tpu.utils.port_weights` converts a local
torch state dict when one is provided.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["SEANetEncoder", "SEANetDecoder", "ResidualVQ", "EncodecModel"]


def _causal_pad(x: jax.Array, kernel_size: int, stride: int = 1) -> jax.Array:
    """Left-pad so a strided conv is causal (Encodec 24 kHz is causal)."""
    pad = kernel_size - stride
    if pad <= 0:
        return x
    return jnp.pad(x, ((0, 0), (pad, 0), (0, 0)))


class CausalConv1d(nn.Module):
    features: int
    kernel_size: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = _causal_pad(x, self.kernel_size, self.stride)
        return nn.Conv(
            self.features, kernel_size=(self.kernel_size,),
            strides=(self.stride,), padding="VALID", dtype=self.dtype,
            name="conv",
        )(x)


class CausalConvTranspose1d(nn.Module):
    features: int
    kernel_size: int
    stride: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = nn.ConvTranspose(
            self.features, kernel_size=(self.kernel_size,),
            strides=(self.stride,), padding="VALID", dtype=self.dtype,
            name="convtr",
        )(x)
        # trim the non-causal tail (upstream trims kernel - stride from the right)
        extra = self.kernel_size - self.stride
        if extra > 0:
            y = y[:, :-extra, :]
        return y


class ResidualUnit(nn.Module):
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.elu(x)
        h = CausalConv1d(self.dim // 2, kernel_size=3, dtype=self.dtype, name="conv1")(h)
        h = nn.elu(h)
        h = CausalConv1d(self.dim, kernel_size=1, dtype=self.dtype, name="conv2")(h)
        return x + h


class _LSTM(nn.Module):
    features: int
    num_layers: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # residual LSTM stack (upstream SLSTM adds skip)
        skip = x
        for i in range(self.num_layers):
            x = nn.RNN(nn.OptimizedLSTMCell(self.features), name=f"lstm_{i}")(x)
        return x + skip


class SEANetEncoder(nn.Module):
    channels: int = 1
    dim: int = 128
    n_filters: int = 32
    ratios: Sequence[int] = (8, 5, 4, 2)  # applied reversed: downsample 2,4,5,8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # x: (b, n) or (b, n, 1) -> (b, n / prod(ratios), dim)
        if x.ndim == 2:
            x = x[..., None]
        mult = 1
        x = CausalConv1d(mult * self.n_filters, kernel_size=7, dtype=self.dtype,
                         name="stem")(x)
        for i, ratio in enumerate(reversed(self.ratios)):
            x = ResidualUnit(mult * self.n_filters, dtype=self.dtype,
                             name=f"res_{i}")(x)
            x = nn.elu(x)
            x = CausalConv1d(
                mult * self.n_filters * 2, kernel_size=ratio * 2, stride=ratio,
                dtype=self.dtype, name=f"down_{i}",
            )(x)
            mult *= 2
        x = _LSTM(mult * self.n_filters, dtype=self.dtype, name="lstm")(x)
        x = nn.elu(x)
        return CausalConv1d(self.dim, kernel_size=7, dtype=self.dtype, name="head")(x)


class SEANetDecoder(nn.Module):
    channels: int = 1
    dim: int = 128
    n_filters: int = 32
    ratios: Sequence[int] = (8, 5, 4, 2)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # x: (b, t, dim) -> (b, t * prod(ratios))
        mult = 2 ** len(self.ratios)
        x = CausalConv1d(mult * self.n_filters, kernel_size=7, dtype=self.dtype,
                         name="stem")(x)
        x = _LSTM(mult * self.n_filters, dtype=self.dtype, name="lstm")(x)
        for i, ratio in enumerate(self.ratios):
            x = nn.elu(x)
            x = CausalConvTranspose1d(
                mult * self.n_filters // 2, kernel_size=ratio * 2, stride=ratio,
                dtype=self.dtype, name=f"up_{i}",
            )(x)
            x = ResidualUnit(mult * self.n_filters // 2, dtype=self.dtype,
                             name=f"res_{i}")(x)
            mult //= 2
        x = nn.elu(x)
        x = CausalConv1d(self.channels, kernel_size=7, dtype=self.dtype, name="head")(x)
        return x[..., 0]


class ResidualVQ(nn.Module):
    """Residual vector quantisation: q codebooks, each quantising the residual
    of the previous stage by nearest-neighbour lookup. Inference-only (the
    codec is frozen in the reference, voicebox_pytorch.py:1362-1371)."""

    num_quantizers: int = 8
    codebook_size: int = 1024
    dim: int = 128

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
        # x: (b, n, dim) -> (quantized, codes (b, n, q), commit_loss placeholder)
        codebooks = self.param(
            "codebooks",
            nn.initializers.normal(1.0),
            (self.num_quantizers, self.codebook_size, self.dim),
        )

        def body(carry, codebook):
            residual, quantized_acc = carry
            # nearest codebook entry by L2: argmin ||r - c||^2 over codebook
            dots = jnp.einsum("bnd,kd->bnk", residual, codebook)
            sq = jnp.sum(jnp.square(codebook), axis=-1)  # (k,)
            dist = sq[None, None, :] - 2 * dots
            codes = jnp.argmin(dist, axis=-1)  # (b, n)
            q = codebook[codes]  # (b, n, dim)
            return (residual - q, quantized_acc + q), codes

        init = (x, jnp.zeros_like(x))
        (residual, quantized), codes = jax.lax.scan(body, init, codebooks)
        codes = jnp.moveaxis(codes, 0, -1)  # (b, n, q)
        commit_loss = jnp.mean(jnp.square(residual))
        return quantized, codes, commit_loss


class EncodecModel:
    """Stateful façade mirroring the EncodecWrapper usage surface."""

    sampling_rate = 24000

    def __init__(
        self,
        dim: int = 128,
        n_filters: int = 32,
        ratios: Sequence[int] = (8, 5, 4, 2),
        num_quantizers: int = 8,
        codebook_size: int = 1024,
        params: Optional[Any] = None,
        seed: int = 0,
    ):
        self.codebook_dim = dim
        self.num_quantizers = num_quantizers
        self._ratios = tuple(ratios)

        self.encoder = SEANetEncoder(dim=dim, n_filters=n_filters, ratios=ratios)
        self.decoder = SEANetDecoder(dim=dim, n_filters=n_filters, ratios=ratios)
        self.quantizer = ResidualVQ(
            num_quantizers=num_quantizers, codebook_size=codebook_size, dim=dim
        )

        if params is None:
            rng = jax.random.PRNGKey(seed)
            k1, k2, k3 = jax.random.split(rng, 3)
            t = 320 * 4
            params = {
                "encoder": jax.jit(self.encoder.init)(k1, jnp.zeros((1, t)))["params"],
                "decoder": jax.jit(self.decoder.init)(k2, jnp.zeros((1, 4, dim)))["params"],
                "quantizer": jax.jit(self.quantizer.init)(k3, jnp.zeros((1, 4, dim)))["params"],
            }
        self.params = params

        self._encode = jax.jit(
            lambda p, a: self.encoder.apply({"params": p["encoder"]}, a)
        )
        self._decode = jax.jit(
            lambda p, z: self.decoder.apply({"params": p["decoder"]}, z)
        )
        self._rq = jax.jit(
            lambda p, z: self.quantizer.apply({"params": p["quantizer"]}, z)
        )

    @property
    def downsample_factor(self) -> int:
        out = 1
        for r in self._ratios:
            out *= r
        return out  # 320

    def encode(self, audio: jax.Array) -> jax.Array:
        """(b, n) raw audio -> (b, n/320, codebook_dim) continuous latents."""
        if audio.ndim == 3 and audio.shape[1] == 1:
            audio = audio[:, 0, :]
        return self._encode(self.params, audio)

    def rq(self, latents: jax.Array):
        """RVQ-quantize latents -> (quantized, codes (b, n, q), loss)."""
        return self._rq(self.params, latents)

    def decode_latents(self, latents: jax.Array) -> jax.Array:
        quantized, _, _ = self.rq(latents)
        return self._decode(self.params, quantized)

    def decode_codes(self, codes: jax.Array) -> jax.Array:
        """codes (b, n, q) -> audio (b, n*320). ONE jitted program — the
        per-quantizer gathers, sum, and decoder fuse (eager per-op dispatch
        costs ~ms each over the tunnel)."""
        fn = getattr(self, "_decode_codes_jit", None)
        if fn is None:
            decoder = self.decoder

            def impl(params, codes):
                codebooks = params["quantizer"]["codebooks"]  # (q, size, dim)
                q = codes.shape[-1]
                gathered = codebooks[
                    jnp.arange(q)[:, None, None], codes.transpose(2, 0, 1)
                ]  # (q, b, n, dim)
                quantized = gathered.sum(axis=0)
                return decoder.apply({"params": params["decoder"]}, quantized)

            fn = self._decode_codes_jit = jax.jit(impl)
        return fn(self.params, codes)

    def __call__(self, audio: jax.Array, return_encoded: bool = False):
        latents = self.encode(audio)
        if return_encoded:
            return latents, None, None
        quantized, codes, _ = self.rq(latents)
        return self._decode(self.params, quantized), codes, None
