"""Probabilistic / span mask builders.

TPU-native re-design of the mask helpers in the reference
(`voicebox_pytorch/voicebox_pytorch.py:68-150`): the reference draws randomness
imperatively (`torch.Tensor.uniform_`, Python `random()`); here every random
draw takes an explicit `jax.random` key so the builders are pure and usable
inside `jit`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "prob_mask_like",
    "reduce_masks_with_and",
    "mask_from_start_end_indices",
    "mask_from_frac_lengths",
    "coin_flip",
]


def prob_mask_like(key: jax.Array, shape, prob: float) -> jax.Array:
    """Bernoulli(prob) boolean mask.

    Mirrors `prob_mask_like` (reference voicebox_pytorch.py:68-74) including the
    p=0 / p=1 fast paths (which also keep the result independent of `key`,
    preserving determinism of CFG-off configs).
    """
    if prob == 1:
        return jnp.ones(shape, dtype=bool)
    if prob == 0:
        return jnp.zeros(shape, dtype=bool)
    return jax.random.uniform(key, shape) < prob


def reduce_masks_with_and(*masks):
    """AND-combine optional masks; None entries are dropped.

    Mirrors `reduce_masks_with_and` (reference voicebox_pytorch.py:76-87).
    """
    masks = [m for m in masks if m is not None]
    if len(masks) == 0:
        return None
    out = masks[0]
    for m in masks[1:]:
        out = out & m
    return out


def mask_from_start_end_indices(seq_len: int, start: jax.Array, end: jax.Array) -> jax.Array:
    """Boolean mask over [start, end) per batch element.

    Mirrors `mask_from_start_end_indices` (reference voicebox_pytorch.py:121-135).
    `seq_len` must be static (jit constraint).
    """
    seq = jnp.arange(seq_len, dtype=jnp.int32)
    seq = seq.reshape((1,) * start.ndim + (seq_len,))
    start = start[..., None].astype(jnp.int32)
    end = end[..., None].astype(jnp.int32)
    return (seq >= start) & (seq < end)


def mask_from_frac_lengths(key: jax.Array, seq_len: int, frac_lengths: jax.Array) -> jax.Array:
    """Random contiguous span covering `frac` of the sequence (the infilling mask).

    Mirrors `mask_from_frac_lengths` (reference voicebox_pytorch.py:137-150):
    lengths truncate toward zero, start uniform in [0, seq_len - length].
    """
    lengths = (frac_lengths * seq_len).astype(jnp.int32)
    max_start = (seq_len - lengths).astype(frac_lengths.dtype)
    rand = jax.random.uniform(key, frac_lengths.shape, dtype=frac_lengths.dtype)
    start = jnp.clip(max_start * rand, 0, None)
    end = start + lengths.astype(start.dtype)
    return mask_from_start_end_indices(seq_len, start, end)


def coin_flip(key: jax.Array) -> jax.Array:
    """Traced boolean coin flip (reference uses Python `random() < 0.5`,
    voicebox_pytorch.py:57-58 — host randomness is not jit-able, so we draw on
    device)."""
    return jax.random.bernoulli(key, 0.5)
