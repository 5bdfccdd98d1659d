"""Multi-head bidirectional attention (flax.linen).

Mirrors the reference `Attention` module (voicebox_pytorch.py:289-333): fused
QKV projection (no bias), optional per-head QK-RMSNorm with a fixed softmax
scale (22B-ViT-style, scale 10), rotary embedding on q and k, output
projection without bias. The score math runs through
`voicebox_tpu.ops.flash_attention` — a Pallas online-softmax kernel on TPU, an
XLA einsum elsewhere (the reference's analogous dispatch lives in
attend.py:38-137).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name
from flax import linen as nn

from ..ops.flash_attention import attend
from ..ops.ring_attention import ring_attention, ring_attention_prefixed
from .primitives import MultiheadRMSNorm, apply_rotary_pos_emb

__all__ = ["Attention"]


class Attention(nn.Module):
    dim: int
    dim_head: int = 64
    heads: int = 8
    dropout: float = 0.0
    use_flash: Optional[bool] = None
    qk_norm: bool = False
    qk_norm_scale: float = 10.0
    # sequence parallelism: when `seq_axis` names a mesh axis (module running
    # inside `shard_map`), the score math runs as ring attention — the local
    # k/v shard streams around the axis via ppermute, with the first
    # `num_prefix` rows (register tokens) treated as a replicated global
    # prefix (see ops/ring_attention.py::ring_attention_prefixed)
    seq_axis: Optional[str] = None
    num_prefix: int = 0
    # opt-in bf16 score matrix + softmax on the XLA attention path (measured
    # +9% train step at dim 512; ~4e-3 output delta — see
    # ops/flash_attention.py::reference_attention). None = f32 (reference
    # numerics). Ignored by the Pallas flash and ring paths, whose online
    # softmax never materialises the score matrix.
    scores_dtype: Optional[jnp.dtype] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        mask: Optional[jax.Array] = None,
        rotary_emb: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        b, n, _ = x.shape
        h, d = self.heads, self.dim_head
        dim_inner = h * d

        qkv = nn.Dense(dim_inner * 3, use_bias=False, dtype=self.dtype, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        # (b, n, h*d) -> (b, h, n, d)
        q, k, v = (
            t.reshape(b, n, h, d).transpose(0, 2, 1, 3) for t in (q, k, v)
        )

        if self.qk_norm:
            q = MultiheadRMSNorm(dim=d, heads=h, name="q_norm")(q)
            k = MultiheadRMSNorm(dim=d, heads=h, name="k_norm")(k)

        if rotary_emb is not None:
            # tagged so remat_policy='dots+qk_rotary' can save the post-norm,
            # post-rotary q/k instead of recomputing the f32 l2norm + rotary
            # chains in the backward
            q = checkpoint_name(
                apply_rotary_pos_emb(rotary_emb, q), "qk_rotary")
            k = checkpoint_name(
                apply_rotary_pos_emb(rotary_emb, k), "qk_rotary")

        scale = self.qk_norm_scale if self.qk_norm else None
        if self.seq_axis is not None:
            assert self.dropout == 0.0 or deterministic, (
                "attention-weight dropout is not supported under sequence "
                "parallelism (all reference configs default attn_dropout=0)"
            )
            if self.num_prefix > 0:
                out_prefix, out_local = ring_attention_prefixed(
                    q, k, v, num_prefix=self.num_prefix, mask=mask,
                    scale=scale, axis_name=self.seq_axis,
                )
                out = jnp.concatenate([out_prefix, out_local], axis=2)
            else:
                out = ring_attention(
                    q, k, v, mask=mask, scale=scale, axis_name=self.seq_axis
                )
        elif self.dropout > 0.0 and not deterministic:
            # attention-weight dropout forces the XLA path (training only;
            # all reference configs default attn_dropout=0)
            from ..ops.flash_attention import reference_attention

            out = reference_attention(
                q, k, v, mask=mask, scale=scale, dropout=self.dropout,
                dropout_rng=self.make_rng("dropout"),
                scores_dtype=self.scores_dtype,
            )
        else:
            out = attend(q, k, v, mask=mask, scale=scale, use_flash=self.use_flash,
                         training=not deterministic,
                         scores_dtype=self.scores_dtype)

        out = out.transpose(0, 2, 1, 3).reshape(b, n, dim_inner)
        return nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="to_out")(out)
