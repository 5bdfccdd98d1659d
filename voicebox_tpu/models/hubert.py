"""HubertWithKmeans: frozen speech -> semantic-token quantiser (flax.linen).

TPU-native implementation of the `audiolm_pytorch.HubertWithKmeans` contract
used by the reference (voicebox_pytorch.py:1144,1251-1254,1386-1388;
__init__.py:15): `wav2vec(wav (b, n) @ 16 kHz) -> semantic ids (b, n/320)`,
plus `.target_sample_hz` and `.downsample_factor` used for the conditioning
length algebra at sampling time.

Architecture follows the HuBERT-base recipe (arXiv 2106.07447): a 7-layer
strided conv feature extractor (total stride 320 -> 50 Hz frames), layer-norm
+ projection, a bidirectional transformer encoder, then k-means assignment of
an intermediate layer's features against learned centroids. Runs frozen /
inference-only, exactly as the reference uses it.

Weights: random init with the exact architecture (no network egress);
`voicebox_tpu.utils.port_weights` helpers convert local torch checkpoints +
k-means .bin centroids.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .transformer import Transformer

__all__ = ["HubertFeatureExtractor", "HubertEncoder", "HubertWithKmeans"]


class HubertFeatureExtractor(nn.Module):
    """7 strided conv layers, total downsample 5*2*2*2*2*2*2 = 320."""

    conv_dim: int = 512
    kernels: Sequence[int] = (10, 3, 3, 3, 3, 2, 2)
    strides: Sequence[int] = (5, 2, 2, 2, 2, 2, 2)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, wav: jax.Array) -> jax.Array:
        # (b, n) -> (b, n/320, conv_dim)
        x = wav[..., None]
        for i, (k, s) in enumerate(zip(self.kernels, self.strides)):
            x = nn.Conv(
                self.conv_dim, kernel_size=(k,), strides=(s,), padding="VALID",
                use_bias=False, dtype=self.dtype, name=f"conv_{i}",
            )(x)
            if i == 0:
                x = nn.GroupNorm(num_groups=self.conv_dim, dtype=self.dtype,
                                 name="group_norm")(x)
            x = nn.gelu(x, approximate=False)  # exact GELU (torch default)
        return x


class HubertEncoder(nn.Module):
    dim: int = 768
    depth: int = 12
    heads: int = 12
    conv_pos_kernel: int = 128
    conv_pos_groups: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
        # convolutional relative positional embedding (wav2vec2-style)
        pos = nn.Conv(
            self.dim, kernel_size=(self.conv_pos_kernel,), padding="SAME",
            feature_group_count=self.conv_pos_groups, dtype=self.dtype,
            name="pos_conv",
        )(x)
        x = x + nn.gelu(pos, approximate=False)
        x = nn.LayerNorm(dtype=self.dtype, name="pre_norm")(x)

        return Transformer(
            dim=self.dim, depth=self.depth, heads=self.heads,
            dim_head=self.dim // self.heads, dtype=self.dtype, name="transformer",
        )(x, mask=mask)


class HubertWithKmeans:
    """Stateful façade: frozen HuBERT features + k-means token assignment."""

    def __init__(
        self,
        checkpoint_path: Optional[str] = None,
        kmeans_path: Optional[str] = None,
        num_clusters: int = 500,
        target_sample_hz: int = 16000,
        seq_len_multiple_of: Optional[int] = None,
        dim: int = 768,
        depth: int = 12,
        heads: int = 12,
        params: Optional[Any] = None,
        seed: int = 0,
    ):
        self.target_sample_hz = target_sample_hz
        self.seq_len_multiple_of = seq_len_multiple_of
        self.num_clusters = num_clusters
        self.codebook_size = num_clusters

        assert dim % heads == 0 and (dim // heads) % 2 == 0, (
            "dim/heads must be even for rotary embedding"
        )
        self.feature_extractor = HubertFeatureExtractor()
        self.encoder = HubertEncoder(dim=dim, depth=depth, heads=heads)

        if params is None:
            rng = jax.random.PRNGKey(seed)
            k1, k2, k3, k4 = jax.random.split(rng, 4)
            feat_params = jax.jit(self.feature_extractor.init)(k1, jnp.zeros((1, 3200)))["params"]
            proj = {
                "kernel": jax.random.normal(k2, (512, dim)) * 0.02,
                "bias": jnp.zeros((dim,)),
            }
            enc_params = jax.jit(self.encoder.init)(k3, jnp.zeros((1, 10, dim)))["params"]
            centroids = jax.random.normal(k4, (num_clusters, dim))
            params = {
                "feature_extractor": feat_params,
                "proj": proj,
                "encoder": enc_params,
                "kmeans": centroids,
            }
        self.params = params

        if checkpoint_path is not None or kmeans_path is not None:
            import os

            if checkpoint_path is not None:
                assert os.path.exists(checkpoint_path), (
                    f"hubert checkpoint not found: {checkpoint_path}"
                )
                from ..utils.port_weights import load_hubert_torch

                self.params = params = load_hubert_torch(
                    checkpoint_path, params
                )
            if kmeans_path is not None:
                assert os.path.exists(kmeans_path), (
                    f"kmeans checkpoint not found: {kmeans_path}"
                )
                import joblib  # pragma: no cover

                km = joblib.load(kmeans_path)
                self.params["kmeans"] = jnp.asarray(km.cluster_centers_)

        self._forward = jax.jit(self._forward_impl)

    @property
    def downsample_factor(self) -> int:
        return 320

    def _forward_impl(self, params, wav: jax.Array) -> jax.Array:
        feats = self.feature_extractor.apply(
            {"params": params["feature_extractor"]}, wav
        )
        feats = feats @ params["proj"]["kernel"] + params["proj"]["bias"]
        feats = self.encoder.apply({"params": params["encoder"]}, feats)

        centroids = params["kmeans"]  # (k, dim)
        dist = (
            jnp.sum(jnp.square(feats), axis=-1, keepdims=True)
            - 2 * feats @ centroids.T
            + jnp.sum(jnp.square(centroids), axis=-1)[None, None, :]
        )
        return jnp.argmin(dist, axis=-1)  # (b, frames) int

    def __call__(self, wav: jax.Array, flatten: bool = True) -> jax.Array:
        """wav (b, n) @ target_sample_hz -> semantic token ids (b, frames)."""
        wav = jnp.asarray(wav)
        if wav.ndim == 3 and wav.shape[1] == 1:
            wav = wav[:, 0]
        return self._forward(self.params, wav)

    def features(self, wav: jax.Array) -> jax.Array:
        """Pre-quantization encoder features (b, frames, dim) — the vectors
        the k-means vocabulary is built over."""
        wav = jnp.asarray(wav)
        if wav.ndim == 3 and wav.shape[1] == 1:
            wav = wav[:, 0]
        p = self.params

        @jax.jit
        def run(params, wav):
            feats = self.feature_extractor.apply(
                {"params": params["feature_extractor"]}, wav
            )
            feats = feats @ params["proj"]["kernel"] + params["proj"]["bias"]
            return self.encoder.apply({"params": params["encoder"]}, feats)

        return run(p, wav)

    def fit_kmeans(self, wavs=None, *, features=None, rng=None, iters: int = 50):
        """Build the semantic-token vocabulary from a corpus IN-FRAMEWORK
        (the reference requires a pretrained sklearn k-means checkpoint).
        Pass `wavs` (b, n) at target_sample_hz, or a precomputed `features`
        (n_frames, dim) matrix. Sets params['kmeans'] and returns
        (centroids, inertia). `utils/kmeans.py::fit_kmeans` is the
        device-side fitter (kmeans++ + Lloyd's, scatter-free)."""
        from ..utils.kmeans import fit_kmeans

        assert (wavs is None) != (features is None), (
            "pass exactly one of wavs / features"
        )
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        dim = self.params["kmeans"].shape[-1]
        if features is None:
            features = self.features(jnp.asarray(wavs)).reshape(-1, dim)
        else:
            features = jnp.asarray(features)
            assert features.ndim == 2 and features.shape[-1] == dim
        centroids, inertia = fit_kmeans(rng, features, self.num_clusters,
                                        iters=iters)
        self.params["kmeans"] = centroids
        return centroids, inertia
