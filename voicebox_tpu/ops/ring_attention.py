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

__all__ = ["ring_attention", "ring_attention_prefixed"]

_NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def _block_stats(q, k, v, mask, scale):
    """Unnormalised attention of local q against one k/v block.

    Returns (num, m, l): num = sum_j exp(s_ij - m_i) v_j, m = row max,
    l = row sum-of-exp — the flash-kernel accumulator triple, accumulated at
    >= f32 (promoted with the input dtype so f64 runs stay exact)."""
    acc_t = jnp.promote_types(q.dtype, jnp.float32)
    s = jnp.einsum(
        "bhid,bhjd->bhij", q, k, preferred_element_type=acc_t
    ) * scale
    if mask is not None:
        s = jnp.where(mask[:, None, None, :], s, _NEG_INF)
    m = jnp.max(s, axis=-1)  # (b, h, i)
    p = jnp.exp(s - m[..., None])
    l = jnp.sum(p, axis=-1)
    num = jnp.einsum(
        "bhij,bhjd->bhid", p.astype(v.dtype), v,
        preferred_element_type=acc_t,
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


def ring_attention_prefixed(
    q: jax.Array,  # (b, h, p + n_local, d) — global prefix rows then local shard
    k: jax.Array,  # (b, h, p + n_local, d)
    v: jax.Array,  # (b, h, p + n_local, d)
    num_prefix: int,
    mask: Optional[jax.Array] = None,  # (b, p + n_local) — prefix rows must be True
    scale: Optional[float] = None,
    axis_name: str = "seq",
) -> jax.Array:
    """Ring attention with a REPLICATED global prefix (register tokens).

    The full-model sequence-parallel wiring (PARITY.md §2.3): the reference's
    Transformer prepends `num_register_tokens` learned registers that attend
    globally (voicebox_pytorch.py:438-441). Under sequence parallelism the
    main tokens are sharded over `axis_name` while the registers are
    replicated on every device, concatenated at the front of each local shard.

    Every query row (prefix and local alike) must see: the prefix keys (held
    locally, identical on all devices — merged ONCE) plus every local key
    block (streamed around the ring). Prefix-query outputs are computed
    redundantly on every device; each device merges ring blocks starting from
    its own shard, so their results differ by float-rounding merge order — a
    `lax.pmean` re-synchronises them to bit-identical values (and its
    transpose psums the gradient back to every device's copy, which the
    replicated-input transpose then averages correctly).

    Returns a pair `(out_prefix, out_local)` — (b, h, p, d) replicated and
    (b, h, n_local, d) sharded — kept separate so shard_map's replication
    tracking sees the pmean'd prefix as replicated; callers concatenate.
    Local rows exactly match full attention on the gathered sequence.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    p = num_prefix
    assert p > 0, "use ring_attention when there is no prefix"

    pk, k_loc = k[:, :, :p], k[:, :, p:]
    pv, v_loc = v[:, :, :p], v[:, :, p:]
    if mask is not None:
        pmask, mask_loc = mask[:, :p], mask[:, p:]
    else:
        pmask = mask_loc = None

    axis_size = jax.lax.psum(1, axis_name)
    perm = [(i, (i + 1) % axis_size) for i in range(axis_size)]
    has_mask = mask_loc is not None

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
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        if has_mask:
            mask_blk = jax.lax.ppermute(mask_blk, axis_name, perm)
        stats = merge(stats, _block_stats(q, k_blk, v_blk, mask_blk, scale))
        return (stats, k_blk, v_blk, mask_blk), None

    # block 0: the replicated prefix keys — identical on every device, so it
    # never travels the ring
    stats0 = _block_stats(q, pk, pv, pmask, scale)
    # block 1: the local key shard
    stats0 = merge(stats0, _block_stats(q, k_loc, v_loc, mask_loc, scale))
    (stats, _, _, _), _ = jax.lax.scan(
        step, (stats0, k_loc, v_loc, mask_loc), None, length=axis_size - 1
    )
    acc, _, l = stats

    l = jnp.where(l == 0.0, 1.0, l)
    out = (acc / l[..., None]).astype(q.dtype)

    # re-sync the redundantly-computed prefix rows (merge-order rounding)
    out_prefix = jax.lax.pmean(out[:, :, :p], axis_name).astype(q.dtype)
    return out_prefix, out[:, :, p:]
