"""Ring attention: sequence-parallel bidirectional attention over a mesh axis.

The sequence-parallel building block this framework adds beyond the reference
(SURVEY.md §2.3 — the reference has no SP; its attention is single-device full
quadratic, attend.py:100-137). When utterances outgrow one chip's HBM even
with the Pallas flash kernel, shard the *sequence* over a mesh axis: each
device holds a q/k/v shard, computes attention of its local queries against
the k/v block it currently holds, then passes the k/v block to its ring
neighbour with `lax.ppermute` — after `axis_size` steps every query has seen
every key. The online-softmax accumulator (running max / running sum, exactly
the flash-kernel scheme at mesh scale) makes the result bit-equivalent to
full attention without ever gathering the sequence on one device.

On TPU the ppermute rides the ICI torus; compute of step i overlaps the
transfer of step i+1 (XLA schedules the collective-permute asynchronously).

Usage — inside `shard_map` with the sequence axis sharded::

    from jax.experimental.shard_map import shard_map
    attn = shard_map(
        lambda q, k, v: ring_attention(q, k, v, axis_name="seq"),
        mesh=mesh,
        in_specs=(P(None, None, "seq", None),) * 3,
        out_specs=P(None, None, "seq", None),
    )

Differentiable: the ring is a `lax.scan` whose carry holds the travelling
k/v (and mask) shards; JAX reverse-mode differentiates through `ppermute`
(its transpose is the inverse permutation), giving the standard ring-attention
backward — gradients for remote k/v flow back around the ring.

Per-device caveat: `mask` is the key-padding mask for the *local* key shard;
register tokens or other global prefixes must be replicated into every shard
or handled outside the ring (see PARITY.md §2.3).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["ring_attention"]

_NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def _block_stats(q, k, v, mask, scale):
    """Unnormalised attention of local q against one k/v block.

    Returns (num, m, l): num = sum_j exp(s_ij - m_i) v_j, m = row max,
    l = row sum-of-exp — the flash-kernel accumulator triple, f32."""
    s = jnp.einsum(
        "bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32
    ) * scale
    if mask is not None:
        s = jnp.where(mask[:, None, None, :], s, _NEG_INF)
    m = jnp.max(s, axis=-1)  # (b, h, i)
    p = jnp.exp(s - m[..., None])
    l = jnp.sum(p, axis=-1)
    num = jnp.einsum(
        "bhij,bhjd->bhid", p.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return num, m, l


def ring_attention(
    q: jax.Array,  # (b, h, n_local, d) — local query shard
    k: jax.Array,  # (b, h, n_local, d) — local key shard
    v: jax.Array,  # (b, h, n_local, d) — local value shard
    mask: Optional[jax.Array] = None,  # (b, n_local) — local key-padding mask
    scale: Optional[float] = None,
    axis_name: str = "seq",
) -> jax.Array:
    """Sequence-parallel attention inside `shard_map` over `axis_name`.

    Matches `reference_attention` on the gathered sequence exactly (same
    online-softmax math as the flash kernel, applied across devices)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5

    axis_size = jax.lax.psum(1, axis_name)
    perm = [(i, (i + 1) % axis_size) for i in range(axis_size)]
    has_mask = mask is not None  # trace-time: unmasked calls skip the mask
    # carry, its per-step ppermute, and the where() over the score block

    def merge(carry, block):
        acc, m_run, l_run = carry
        num, m_blk, l_blk = block
        m_new = jnp.maximum(m_run, m_blk)
        alpha = jnp.exp(m_run - m_new)
        beta = jnp.exp(m_blk - m_new)
        acc = acc * alpha[..., None] + num * beta[..., None]
        return acc, m_new, l_run * alpha + l_blk * beta

    def step(carry, _):
        stats, k_blk, v_blk, mask_blk = carry
        # permute FIRST: the local block was consumed before the scan, so
        # only axis_size-1 rotations happen (no dead final transfer)
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        if has_mask:
            mask_blk = jax.lax.ppermute(mask_blk, axis_name, perm)
        stats = merge(stats, _block_stats(q, k_blk, v_blk, mask_blk, scale))
        return (stats, k_blk, v_blk, mask_blk), None

    # step 0: the local block, outside the ring loop
    stats0 = _block_stats(q, k, v, mask, scale)
    (stats, _, _, _), _ = jax.lax.scan(
        step, (stats0, k, v, mask), None, length=axis_size - 1
    )
    acc, _, l = stats

    l = jnp.where(l == 0.0, 1.0, l)
    return (acc / l[..., None]).astype(q.dtype)
