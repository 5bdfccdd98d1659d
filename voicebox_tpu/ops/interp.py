"""Length adaptation helpers: 1-D linear interpolation and curtail/pad.

Replaces the reference's fake-2D `F.interpolate` hack (`interpolate_1d`,
voicebox_pytorch.py:89-107) with `jax.image.resize` (method='linear' matches
torch bilinear with align_corners=False / half-pixel centers), and
`curtail_or_pad` (voicebox_pytorch.py:109-117).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["interpolate_1d", "curtail_or_pad"]


def interpolate_1d(t: jax.Array, length: int) -> jax.Array:
    """Linearly resample the last axis to `length`.

    Accepts `(b, n)` or `(b, d, n)`. Boolean inputs are interpolated in float
    and cast back (nonzero -> True), matching the reference's dtype round-trip
    (voicebox_pytorch.py:92,106 — bool masks come back bool).
    """
    dtype = t.dtype
    x = t.astype(jnp.float32)

    implicit_one_channel = x.ndim == 2
    if implicit_one_channel:
        x = x[:, None, :]

    b, d, _ = x.shape
    # antialias=False: torch F.interpolate(mode='bilinear') does plain 2-tap
    # interpolation when downsampling too; resize's default antialias=True
    # would apply a triangle filter and diverge from the reference
    x = jax.image.resize(x, (b, d, length), method="linear", antialias=False)

    if implicit_one_channel:
        x = x[:, 0, :]

    if dtype == jnp.bool_:
        return x > 0
    return x.astype(dtype)


def curtail_or_pad(t: jax.Array, target_length: int) -> jax.Array:
    """Truncate or right-pad axis -2 to `target_length` (zeros)."""
    length = t.shape[-2]
    if length > target_length:
        return t[..., :target_length, :]
    if length < target_length:
        pad = [(0, 0)] * t.ndim
        pad[-2] = (0, target_length - length)
        return jnp.pad(t, pad)
    return t
