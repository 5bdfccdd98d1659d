"""HubertWithKmeans: frozen speech -> semantic-token quantiser (flax.linen).

TPU-native implementation of the `audiolm_pytorch.HubertWithKmeans` contract
used by the reference (voicebox_pytorch.py:1144,1251-1254,1386-1388;
__init__.py:15): `wav2vec(wav (b, n) @ 16 kHz) -> semantic ids (b, n/320)`,
plus `.target_sample_hz` and `.downsample_factor` used for the conditioning
length algebra at sampling time.

The encoder is a FAITHFUL wav2vec2/HuBERT-base block layout (arXiv
2106.07447), weight-compatible with upstream checkpoints (both `transformers`
and fairseq state-dict namings — see `utils/port_weights.py::
load_hubert_torch`):

* 7-layer strided conv feature extractor (no bias, exact GELU, group norm on
  layer 0 only; total stride 320 -> 50 Hz frames)
* feature projection: LayerNorm(512) -> Linear(512 -> 768)
* weight-normed conv positional embedding (kernel 128, 16 groups, even-kernel
  same-pad: pad k/2 both sides, drop the trailing frame), GELU, residual
* pre-layers LayerNorm (the base model is post-norm, `layer_norm_first=False`)
* N post-norm encoder blocks: biased q/k/v/out projections, softmax
  attention, LayerNorm; Linear(768 -> 3072) exact-GELU Linear(3072 -> 768),
  LayerNorm
* `output_layer` truncation matching fairseq `extract_features(...,
  output_layer=k)` — features are taken AFTER block k (1-indexed);
  audiolm-pytorch's default for k-means is layer 9.

Runs frozen / inference-only, exactly as the reference uses it. Weights:
random init with the exact architecture (no network egress);
`voicebox_tpu.utils.port_weights.load_hubert_torch` converts local torch
checkpoints (full model: extractor + projection + every encoder block) and
joblib-dumped k-means centroids load via `kmeans_path`.

Fidelity is pinned against the GENUINE upstream implementation, not a
restatement: `tests/test_hubert_upstream.py` round-trips tiny
`transformers.Wav2Vec2Model` / `HubertModel` instances (both norm variants,
including `output_layer` truncation vs `output_hidden_states`) through
`load_hubert_torch` and asserts full-forward parity at atol 1e-4.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = [
    "HubertFeatureExtractor",
    "HubertEncoderLayer",
    "HubertEncoder",
    "HubertWithKmeans",
]


class HubertFeatureExtractor(nn.Module):
    """7 strided conv layers, total downsample 5*2*2*2*2*2*2 = 320.

    `norm_mode="group"` (base models): bias-less convs, group norm after
    layer 0 only. `norm_mode="layer"` (large models,
    feat_extract_norm="layer"): biased convs, a channel LayerNorm after
    EVERY conv."""

    conv_dim: int = 512
    kernels: Sequence[int] = (10, 3, 3, 3, 3, 2, 2)
    strides: Sequence[int] = (5, 2, 2, 2, 2, 2, 2)
    norm_mode: str = "group"  # "group" | "layer"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, wav: jax.Array) -> jax.Array:
        assert self.norm_mode in ("group", "layer")
        # (b, n) -> (b, n/320, conv_dim)
        x = wav[..., None]
        for i, (k, s) in enumerate(zip(self.kernels, self.strides)):
            x = nn.Conv(
                self.conv_dim, kernel_size=(k,), strides=(s,), padding="VALID",
                use_bias=(self.norm_mode == "layer"), dtype=self.dtype,
                name=f"conv_{i}",
            )(x)
            if self.norm_mode == "layer":
                x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                 name=f"layer_norm_{i}")(x)
            elif i == 0:
                x = nn.GroupNorm(num_groups=self.conv_dim, epsilon=1e-5, dtype=self.dtype,
                                 name="group_norm")(x)
            x = nn.gelu(x, approximate=False)  # exact GELU (torch default)
        return x


class HubertEncoderLayer(nn.Module):
    """One post-norm wav2vec2/HuBERT-base block.

    Mirrors `transformers` Wav2Vec2EncoderLayer / fairseq
    TransformerSentenceEncoderLayer (layer_norm_first=False): biased q/k/v/out
    projections, residual + LayerNorm, then Linear->exact GELU->Linear FFN,
    residual + LayerNorm. The reference consumes this frozen
    (voicebox_pytorch.py:1384-1389)."""

    dim: int = 768
    heads: int = 12
    ff_dim: int = 3072
    # False (base): post-norm — attn, +res, LN, ff, +res, LN.
    # True (large, do_stable_layer_norm / layer_norm_first): pre-norm —
    # x + attn(LN(x)), x + ff(LN(x)); the encoder applies one final LN at
    # the very end instead.
    pre_norm: bool = False
    dtype: jnp.dtype = jnp.float32

    def _attend(self, x, mask):
        h = self.heads
        d = self.dim // h
        # scaling applied to the PROJECTED q (incl. bias), matching torch MHA
        q = nn.Dense(self.dim, dtype=self.dtype, name="q_proj")(x) * (d ** -0.5)
        k = nn.Dense(self.dim, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(self.dim, dtype=self.dtype, name="v_proj")(x)
        b, n, _ = x.shape
        q = q.reshape(b, n, h, d)
        k = k.reshape(b, n, h, d)
        v = v.reshape(b, n, h, d)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k)
        if mask is not None:
            scores = jnp.where(
                mask[:, None, None, :], scores,
                jnp.finfo(scores.dtype).min,
            )
        probs = jax.nn.softmax(scores, axis=-1)
        attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, n, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="out_proj")(attn)

    def _ff(self, x):
        ff = nn.Dense(self.ff_dim, dtype=self.dtype, name="fc1")(x)
        ff = nn.gelu(ff, approximate=False)
        return nn.Dense(self.dim, dtype=self.dtype, name="fc2")(ff)

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
        attn_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                 name="attn_norm")
        final_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                  name="final_norm")
        if self.pre_norm:
            x = x + self._attend(attn_norm(x), mask)
            return x + self._ff(final_norm(x))
        x = attn_norm(x + self._attend(x, mask))
        return final_norm(x + self._ff(x))


class HubertEncoder(nn.Module):
    """wav2vec2-base encoder: weight-normed conv positional embedding +
    pre-layers LayerNorm + `depth` post-norm blocks.

    `depth` is the number of blocks RUN — to reproduce fairseq
    `extract_features(output_layer=k)` semantics (audiolm-pytorch passes
    k=9 for HuBERT k-means), construct with depth=k; features are the output
    of block k (which, being post-norm, is already layer-normed)."""

    dim: int = 768
    depth: int = 12
    heads: int = 12
    ff_dim: Optional[int] = None  # default 4*dim (3072 at base scale)
    conv_pos_kernel: int = 128
    conv_pos_groups: int = 16
    # base (False): LayerNorm after the pos conv, post-norm blocks.
    # large (True, do_stable_layer_norm / layer_norm_first): pre-norm blocks
    # with ONE LayerNorm at the very end — skipped under `output_layer`
    # truncation (fairseq extract_features returns the raw residual stream
    # after block k), controlled by `apply_final_norm`.
    layer_norm_first: bool = False
    apply_final_norm: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
        # convolutional relative positional embedding (wav2vec2-style):
        # pad k//2 both sides, VALID conv, drop the trailing frame when the
        # kernel is even (torch Wav2Vec2SamePadLayer removes num_pad_remove=1)
        pad = self.conv_pos_kernel // 2
        xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
        pos = nn.Conv(
            self.dim, kernel_size=(self.conv_pos_kernel,), padding="VALID",
            feature_group_count=self.conv_pos_groups, dtype=self.dtype,
            name="pos_conv",
        )(xp)
        if self.conv_pos_kernel % 2 == 0:
            pos = pos[:, :-1]
        x = x + nn.gelu(pos, approximate=False)
        outer_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                  name="pre_norm")
        if not self.layer_norm_first:
            x = outer_norm(x)

        ff_dim = self.ff_dim if self.ff_dim is not None else 4 * self.dim
        for i in range(self.depth):
            x = HubertEncoderLayer(
                dim=self.dim, heads=self.heads, ff_dim=ff_dim,
                pre_norm=self.layer_norm_first,
                dtype=self.dtype, name=f"layer_{i}",
            )(x, mask=mask)
        if self.layer_norm_first and self.apply_final_norm:
            x = outer_norm(x)
        return x


def _layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array,
                eps: float = 1e-5) -> jax.Array:
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias


class HubertWithKmeans:
    """Stateful façade: frozen HuBERT features + k-means token assignment.

    `output_layer` (default None = all `depth` blocks) truncates the encoder
    fairseq-style; pass 9 with a base checkpoint to match audiolm-pytorch's
    HubertWithKmeans default (its k-means vocabularies are built over layer-9
    features)."""

    def __init__(
        self,
        checkpoint_path: Optional[str] = None,
        kmeans_path: Optional[str] = None,
        num_clusters: int = 500,
        target_sample_hz: int = 16000,
        seq_len_multiple_of: Optional[int] = None,
        conv_dim: int = 512,
        dim: int = 768,
        depth: int = 12,
        heads: int = 12,
        ff_dim: Optional[int] = None,
        conv_pos_kernel: int = 128,
        conv_pos_groups: int = 16,
        # large-model (hubert-large / wav2vec2-large) layout switches:
        # pre-norm blocks + end LayerNorm, and per-conv-layer LayerNorm
        # extractor with conv biases (feat_extract_norm="layer")
        layer_norm_first: bool = False,
        extractor_norm_mode: str = "group",
        output_layer: Optional[int] = None,
        params: Optional[Any] = None,
        seed: int = 0,
    ):
        self.target_sample_hz = target_sample_hz
        self.seq_len_multiple_of = seq_len_multiple_of
        self.num_clusters = num_clusters
        self.codebook_size = num_clusters

        if output_layer is not None:
            assert 1 <= output_layer <= depth, (
                f"output_layer {output_layer} outside [1, depth={depth}]"
            )
            depth = output_layer
        self.feature_extractor = HubertFeatureExtractor(
            conv_dim=conv_dim, norm_mode=extractor_norm_mode
        )
        self.encoder = HubertEncoder(
            dim=dim, depth=depth, heads=heads, ff_dim=ff_dim,
            conv_pos_kernel=conv_pos_kernel, conv_pos_groups=conv_pos_groups,
            layer_norm_first=layer_norm_first,
            # fairseq extract_features(output_layer=k) returns the raw
            # residual stream after block k, skipping the end LayerNorm
            apply_final_norm=(output_layer is None),
        )

        if params is None:
            rng = jax.random.PRNGKey(seed)
            k1, k2, k3, k4 = jax.random.split(rng, 4)
            feat_params = jax.jit(self.feature_extractor.init)(k1, jnp.zeros((1, 3200)))["params"]
            proj = {
                "kernel": jax.random.normal(k2, (conv_dim, dim)) * 0.02,
                "bias": jnp.zeros((dim,)),
            }
            enc_params = jax.jit(self.encoder.init)(k3, jnp.zeros((1, 10, dim)))["params"]
            centroids = jax.random.normal(k4, (num_clusters, dim))
            params = {
                "feature_extractor": feat_params,
                "proj_norm": {"scale": jnp.ones((conv_dim,)),
                              "bias": jnp.zeros((conv_dim,))},
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
                import joblib

                # audiolm-pytorch loads a joblib-dumped sklearn MiniBatchKMeans
                # and reads cluster_centers_ (hubert_kmeans.py); same contract
                km = joblib.load(kmeans_path)
                centers = jnp.asarray(km.cluster_centers_)
                assert centers.ndim == 2 and centers.shape[-1] == dim, (
                    f"kmeans centroids {centers.shape} don't match encoder "
                    f"dim {dim}"
                )
                self.num_clusters = self.codebook_size = int(centers.shape[0])
                self.params["kmeans"] = centers

        self._forward = jax.jit(self._forward_impl)
        # cached once like _forward: a fresh jax.jit wrapper per call would
        # retrace every features() invocation (same trap CLAUDE.md notes for
        # eager dispatch on the tunneled backend)
        self._features = jax.jit(self._features_impl)

    @property
    def downsample_factor(self) -> int:
        return 320

    def num_frames(self, n_samples: int) -> int:
        """Exact output frame count for an `n_samples` wav — the VALID-conv
        arithmetic of the 7-layer extractor (transformers'
        `_get_feat_extract_output_lengths` equivalent), after the
        `seq_len_multiple_of` curtailment `_prep_wav` applies. Used by the
        seq2seq trainer to mask the id positions a padded wav fabricates."""
        n = int(n_samples)
        if self.seq_len_multiple_of is not None:
            n = (n // int(self.seq_len_multiple_of)) * int(self.seq_len_multiple_of)
        for k, s in zip(self.feature_extractor.kernels,
                        self.feature_extractor.strides):
            n = (n - k) // s + 1
        assert n > 0, f"wav of {n_samples} samples too short for the extractor"
        return n

    def _features_impl(self, params, wav: jax.Array) -> jax.Array:
        feats = self.feature_extractor.apply(
            {"params": params["feature_extractor"]}, wav
        )
        # feature projection: LayerNorm(512) then Linear(512 -> dim), matching
        # transformers Wav2Vec2FeatureProjection / fairseq layer_norm +
        # post_extract_proj
        if "proj_norm" in params:
            feats = _layer_norm(
                feats, params["proj_norm"]["scale"], params["proj_norm"]["bias"]
            )
        feats = feats @ params["proj"]["kernel"] + params["proj"]["bias"]
        return self.encoder.apply({"params": params["encoder"]}, feats)

    def _forward_impl(self, params, wav: jax.Array) -> jax.Array:
        feats = self._features_impl(params, wav)
        centroids = params["kmeans"]  # (k, dim)
        dist = (
            jnp.sum(jnp.square(feats), axis=-1, keepdims=True)
            - 2 * feats @ centroids.T
            + jnp.sum(jnp.square(centroids), axis=-1)[None, None, :]
        )
        return jnp.argmin(dist, axis=-1)  # (b, frames) int

    def _prep_wav(self, wav) -> jax.Array:
        wav = jnp.asarray(wav)
        if wav.ndim == 3 and wav.shape[1] == 1:
            wav = wav[:, 0]
        if self.seq_len_multiple_of is not None:
            # audiolm-pytorch curtails the wav to a multiple BEFORE the
            # frozen model (hubert_kmeans.py `curtail_to_multiple`); skipping
            # it would yield silently different frame counts for a caller
            # porting reference code. Host-side shape math: each distinct
            # input length is its own compiled program either way.
            m = int(self.seq_len_multiple_of)
            n = (wav.shape[-1] // m) * m
            assert n > 0, (
                f"wav of {wav.shape[-1]} samples shorter than "
                f"seq_len_multiple_of={m}"
            )
            wav = wav[..., :n]
        return wav

    def __call__(self, wav: jax.Array, flatten: bool = True) -> jax.Array:
        """wav (b, n) @ target_sample_hz -> semantic token ids (b, frames).

        `flatten` mirrors audiolm-pytorch's kwarg: False reshapes the cluster
        ids to (b, -1). Token ids are already (b, frames), so both layouts
        coincide — kept so ported call sites behave identically."""
        ids = self._forward(self.params, self._prep_wav(wav))
        if not flatten:
            ids = ids.reshape(ids.shape[0], -1)
        return ids

    def features(self, wav: jax.Array) -> jax.Array:
        """Pre-quantization encoder features (b, frames, dim) — the vectors
        the k-means vocabulary is built over."""
        return self._features(self.params, self._prep_wav(wav))

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
