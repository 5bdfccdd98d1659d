"""TPU-native k-means for building the semantic-token vocabulary.

The reference consumes a PRETRAINED sklearn k-means over HuBERT features
(audiolm-pytorch's hubert-k-means checkpoint; loaded here via
`HubertWithKmeans(kmeans_path=...)`). This module closes the from-scratch
gap: fit the quantizer on your own corpus inside this framework, on device.

TPU-shaped: Lloyd's assignments are one (n, k) distance matmul; the centroid
update is a one-hot (k, n) @ (n, d) MXU matmul + count normalisation — NO
scatter ops (TPU scatters serialize, see PERFORMANCE.md's iSTFT note).
k-means++ seeding runs as a `lax.scan` over k draws. Everything jits; the
whole fit is one compiled program.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["fit_kmeans", "kmeans_assign"]


def _sq_dists(x: jax.Array, c: jax.Array) -> jax.Array:
    """(n, k) squared euclidean distances via the expanded form (one MXU
    matmul instead of an (n, k, d) broadcast)."""
    xx = jnp.sum(x * x, axis=-1, keepdims=True)  # (n, 1)
    cc = jnp.sum(c * c, axis=-1)[None, :]  # (1, k)
    return xx + cc - 2.0 * (x @ c.T)


def kmeans_assign(x: jax.Array, centroids: jax.Array) -> jax.Array:
    """Nearest-centroid ids (n,) — the quantiser used at inference."""
    return jnp.argmin(_sq_dists(x, centroids), axis=-1)


def _kmeanspp_init(rng: jax.Array, x: jax.Array, k: int) -> jax.Array:
    """k-means++ seeding (Arthur & Vassilvitskii 2007): each next centre is
    drawn with probability proportional to its squared distance from the
    chosen set. Sequential by definition -> lax.scan over k draws."""
    n = x.shape[0]
    k0, rng = jax.random.split(rng)
    first = x[jax.random.randint(k0, (), 0, n)]
    d2 = jnp.sum((x - first) ** 2, axis=-1)

    def draw(carry, key):
        d2 = carry
        p = d2 / jnp.clip(jnp.sum(d2), 1e-12, None)
        idx = jax.random.choice(key, n, p=p)
        c = x[idx]
        d2 = jnp.minimum(d2, jnp.sum((x - c) ** 2, axis=-1))
        return d2, c

    _, rest = jax.lax.scan(draw, d2, jax.random.split(rng, k - 1))
    return jnp.concatenate([first[None], rest], axis=0)


@functools.partial(jax.jit, static_argnames=("k", "iters"))
def fit_kmeans(
    rng: jax.Array,
    x: jax.Array,  # (n, d) features, e.g. HuBERT frames over a corpus
    k: int,
    iters: int = 50,
) -> Tuple[jax.Array, jax.Array]:
    """Fit k centroids; returns (centroids (k, d) f32, inertia scalar).

    Empty clusters keep their previous centre (same guard sklearn applies
    via reinit; keeping the centre is deterministic and jit-static)."""
    x = x.astype(jnp.float32)
    n = x.shape[0]
    init = _kmeanspp_init(rng, x, k)

    def lloyd(c, _):
        d2 = _sq_dists(x, c)  # (n, k)
        assign = jnp.argmin(d2, axis=-1)
        onehot = jax.nn.one_hot(assign, k, dtype=jnp.float32)  # (n, k)
        counts = jnp.sum(onehot, axis=0)  # (k,)
        sums = onehot.T @ x  # (k, d) — MXU, no scatter
        new_c = jnp.where(
            counts[:, None] > 0, sums / jnp.clip(counts[:, None], 1.0, None), c
        )
        inertia = jnp.sum(jnp.min(d2, axis=-1))
        return new_c, inertia

    centroids, inertias = jax.lax.scan(lloyd, init, None, length=iters)
    return centroids, inertias[-1] / n
