"""Gated linear recurrence via `jax.lax.associative_scan`.

TPU-native equivalent of `gateloop_transformer.SimpleGateLoopLayer` as used by
the reference Transformer (voicebox_pytorch.py:31,372,399,465-466 — constructed
with `use_jax_associative_scan` flag and `post_ln=True`, applied residually
before attention). The upstream layer is a data-controlled linear recurrence
(GateLoop, arXiv 2311.01927) with head dim 1:

    s_t = a_t * s_{t-1} + k_t * v_t        (per-channel state)
    o_t = q_t * s_t

A first-order linear recurrence composes associatively —
`(a2, b2) ∘ (a1, b1) = (a1*a2, a2*b1 + b2)` — so the whole sequence runs as a
single `associative_scan`, which is exactly the log-depth formulation the
upstream author gestures at with the `use_jax_associative_scan` flag. On TPU
this is the natural O(n) long-context primitive.

The functional core lives here; the parameterised layer is
`voicebox_tpu.models.primitives.SimpleGateLoopLayer`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["gated_linear_recurrence"]


def gated_linear_recurrence(a: jax.Array, x: jax.Array, axis: int = 1) -> jax.Array:
    """Compute s_t = a_t * s_{t-1} + x_t (s_0 = 0) along `axis` via associative scan.

    `a` and `x` must have the same shape. Runs in fp32 for stability and casts
    back to the input dtype.
    """
    dtype = x.dtype
    a32 = a.astype(jnp.float32)
    x32 = x.astype(jnp.float32)

    def combine(left, right):
        a_l, b_l = left
        a_r, b_r = right
        return a_l * a_r, a_r * b_l + b_r

    _, out = jax.lax.associative_scan(combine, (a32, x32), axis=axis)
    return out.astype(dtype)
