"""Vocos vocoder (flax.linen): ConvNeXt backbone + iSTFT head.

TPU-native implementation of the `vocos.Vocos` contract the reference uses as
a black box (voicebox_pytorch.py:36,497,508,543-549,556,562,588-589):

* mel variant ('charactr/vocos-mel-24khz'):     `decode(mel (b, 100, T)) -> wav`
* encodec variant ('charactr/vocos-encodec-24khz'):
    `codes_to_features(codes (q, T) | (b, q, T)) -> (b, 128, T)`
    `decode(features, bandwidth_id=...) -> wav`

Architecture follows the public Vocos recipe (arXiv 2306.00814): Conv1d embed
-> LayerNorm -> N ConvNeXt blocks (depthwise k7 conv, LayerNorm, 1x1 up 3x,
GELU, 1x1 down, layer-scale residual) -> LayerNorm -> Linear to (n_fft + 2)
-> split magnitude/phase -> exp-clip -> complex spectrum -> iSTFT overlap-add
(`voicebox_tpu.ops.stft.istft`). The encodec variant adds an AdaLayerNorm
conditioned on the bandwidth id and an embedding-sum `codes_to_features`.

Pretrained weights: this environment has no network egress, so
`from_pretrained` initialises randomly unless pointed at a local torch
checkpoint (see `voicebox_tpu.utils.port_weights`). The architecture and
tensor contracts are exact, so ported weights drop in.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.stft import istft

__all__ = ["VocosBackbone", "ISTFTHead", "Vocos"]


class ConvNeXtBlock(nn.Module):
    dim: int
    intermediate_dim: int
    layer_scale_init: float = 1e-6
    num_bandwidths: int = 0  # >0: AdaLayerNorm conditioning (encodec variant)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, bandwidth_id: Optional[jax.Array] = None) -> jax.Array:
        # x: (b, n, dim)
        residual = x
        x = nn.Conv(
            self.dim, kernel_size=(7,), padding="SAME",
            feature_group_count=self.dim, dtype=self.dtype, name="dwconv",
        )(x)
        if self.num_bandwidths > 0 and bandwidth_id is not None:
            x = AdaLayerNorm(self.dim, self.num_bandwidths, name="norm")(x, bandwidth_id)
        else:
            x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        x = nn.Dense(self.intermediate_dim, dtype=self.dtype, name="pwconv1")(x)
        x = nn.gelu(x, approximate=False)  # exact GELU (torch default)
        x = nn.Dense(self.dim, dtype=self.dtype, name="pwconv2")(x)
        gamma = self.param(
            "gamma", nn.initializers.constant(self.layer_scale_init), (self.dim,)
        )
        return residual + gamma * x


class AdaLayerNorm(nn.Module):
    """LayerNorm whose scale/shift are per-bandwidth embedding tables
    (ones/zeros init), matching the upstream Vocos encodec-variant
    conditioning."""

    dim: int
    num_embeddings: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, bandwidth_id: jax.Array) -> jax.Array:
        scale_table = self.param(
            "scale", nn.initializers.ones, (self.num_embeddings, self.dim)
        )
        shift_table = self.param(
            "shift", nn.initializers.zeros, (self.num_embeddings, self.dim)
        )
        scale = scale_table[bandwidth_id]  # (b, dim) or (1, dim)
        shift = shift_table[bandwidth_id]
        x = nn.LayerNorm(epsilon=1e-6, use_scale=False, use_bias=False,
                         dtype=self.dtype)(x)
        return x * scale[:, None, :] + shift[:, None, :]


class VocosBackbone(nn.Module):
    input_channels: int = 100
    dim: int = 512
    intermediate_dim: int = 1536
    num_layers: int = 8
    num_bandwidths: int = 0  # >0 enables AdaLayerNorm bandwidth conditioning
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, bandwidth_id: Optional[jax.Array] = None) -> jax.Array:
        # x: (b, n, input_channels) -> (b, n, dim)
        if self.num_bandwidths > 0:
            assert bandwidth_id is not None
            bandwidth_id = jnp.atleast_1d(bandwidth_id)
            if bandwidth_id.shape[0] == 1 and x.shape[0] > 1:
                bandwidth_id = jnp.broadcast_to(bandwidth_id, (x.shape[0],))
        else:
            bandwidth_id = None

        x = nn.Conv(self.dim, kernel_size=(7,), padding="SAME", dtype=self.dtype,
                    name="embed")(x)
        if bandwidth_id is not None:
            x = AdaLayerNorm(self.dim, self.num_bandwidths, name="norm_in")(
                x, bandwidth_id
            )
        else:
            x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm_in")(x)

        for i in range(self.num_layers):
            x = ConvNeXtBlock(
                dim=self.dim,
                intermediate_dim=self.intermediate_dim,
                layer_scale_init=1.0 / self.num_layers,
                num_bandwidths=self.num_bandwidths,
                dtype=self.dtype,
                name=f"block_{i}",
            )(x, bandwidth_id)

        return nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="final_norm")(x)


class ISTFTHead(nn.Module):
    dim: int = 512
    n_fft: int = 1024
    hop_length: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # x: (b, n, dim) -> wav (b, n * hop_length)
        h = nn.Dense(self.n_fft + 2, dtype=self.dtype, name="out")(x)
        mag, phase = jnp.split(h, 2, axis=-1)  # (b, n, n_fft//2 + 1) each
        # upstream clips the MAGNITUDE at 1e2 (clip(exp(x), max=100)), not the
        # exponent — exp(100) is inf in fp32 and inf*0 in the DFT makes NaN
        mag = jnp.clip(jnp.exp(mag.astype(jnp.float32)), None, 100.0)
        phase = phase.astype(jnp.float32)
        # real/imag kept separate (no complex ops on the TPU hot path)
        spec = jax.lax.complex(mag * jnp.cos(phase), mag * jnp.sin(phase))
        spec = spec.transpose(0, 2, 1)  # (b, freq, frames)
        # Vocos heads use 'same'-padded iSTFT: exactly frames * hop samples out
        return istft(
            spec, n_fft=self.n_fft, win_length=self.n_fft,
            hop_length=self.hop_length, padding="same",
        )


class Vocos:
    """Stateful façade bundling backbone + head params, mirroring the
    pretrained-`Vocos` usage surface."""

    def __init__(
        self,
        input_channels: int = 100,
        dim: int = 512,
        intermediate_dim: int = 1536,
        num_layers: int = 8,
        n_fft: int = 1024,
        hop_length: int = 256,
        num_bandwidths: int = 0,
        codebook_size: int = 1024,
        num_quantizers: int = 8,
        params: Optional[Any] = None,
        seed: int = 0,
    ):
        self.input_channels = input_channels
        self.hop_length = hop_length
        self.num_bandwidths = num_bandwidths
        self.codebook_size = codebook_size
        self.num_quantizers = num_quantizers

        self.backbone = VocosBackbone(
            input_channels=input_channels, dim=dim,
            intermediate_dim=intermediate_dim, num_layers=num_layers,
            num_bandwidths=num_bandwidths,
        )
        self.head = ISTFTHead(dim=dim, n_fft=n_fft, hop_length=hop_length)

        if params is None:
            rng = jax.random.PRNGKey(seed)
            k1, k2, k3 = jax.random.split(rng, 3)
            dummy = jnp.zeros((1, 8, input_channels))
            bw = jnp.zeros((1,), jnp.int32) if num_bandwidths > 0 else None
            params = {
                # jit the inits: eager op-by-op init is pathologically slow on a
                # tunneled TPU backend
                "backbone": jax.jit(self.backbone.init)(k1, dummy, bw)["params"],
                "head": jax.jit(self.head.init)(k2, jnp.zeros((1, 8, dim)))["params"],
            }
            if num_bandwidths > 0:
                # codes -> features embedding table (sum over quantizers),
                # mirroring vocos.codes_to_features over the encodec codebooks
                params["codebook"] = jax.random.normal(
                    k3, (num_quantizers, codebook_size, input_channels)
                ) * 0.02
        self.params = params
        self._decode = jax.jit(self._decode_impl)
        self._codes_to_features = jax.jit(self._codes_to_features_impl)

    @classmethod
    def from_pretrained(cls, path_or_name: str, **kwargs):
        """Local-checkpoint loader. With no local file (no network egress in
        this environment) falls back to random init with the exact pretrained
        architecture for the known model names."""
        if path_or_name.endswith("vocos-encodec-24khz"):
            # upstream config: n_fft 1280 / hop 320 — one hop per Encodec
            # frame (downsample 320 at 24 kHz), so n frames -> n*320 samples
            kwargs.setdefault("n_fft", 1280)
            kwargs.setdefault("hop_length", 320)
            model = cls(input_channels=128, num_bandwidths=4, **kwargs)
        else:  # vocos-mel-24khz: n_fft 1024 / hop 256 (the class defaults)
            model = cls(input_channels=100, **kwargs)
        import os

        if os.path.exists(path_or_name):
            from ..utils.port_weights import load_vocos_torch

            model.params = load_vocos_torch(path_or_name, model.params)
        return model

    def _decode_impl(self, params, features, bandwidth_id):
        # features: (b, c, n) channels-first at the API boundary (vocos contract)
        x = features.transpose(0, 2, 1)
        h = self.backbone.apply({"params": params["backbone"]}, x, bandwidth_id)
        return self.head.apply({"params": params["head"]}, h)

    def decode(self, features: jax.Array, bandwidth_id: Optional[jax.Array] = None) -> jax.Array:
        if self.num_bandwidths > 0:
            assert bandwidth_id is not None
            bandwidth_id = jnp.atleast_1d(jnp.asarray(bandwidth_id))
        else:
            bandwidth_id = jnp.zeros((1,), jnp.int32)  # unused placeholder
        return self._decode(self.params, features, bandwidth_id)

    def codes_to_features(self, codes: jax.Array) -> jax.Array:
        """codes (q, n) or (b, q, n) int -> features (b, input_channels, n):
        sum of per-quantizer codebook embeddings (encodec variant)."""
        assert self.num_bandwidths > 0, "codes_to_features is an encodec-variant op"
        if codes.ndim == 2:
            codes = codes[None]
        return self._codes_to_features(self.params, codes)

    def _codes_to_features_impl(self, params, codes: jax.Array) -> jax.Array:
        codebook = params["codebook"]  # (q, size, c)
        q = codes.shape[1]
        feats = jnp.take_along_axis(
            codebook[None, :q, :, :],  # (1, q, size, c)
            codes[..., None, None].transpose(0, 1, 4, 2, 3)[:, :, 0],  # (b, q, n, 1)
            axis=2,
        )  # (b, q, n, c)
        feats = feats.sum(axis=1)  # (b, n, c)
        return feats.transpose(0, 2, 1)
