"""TPU-native k-means (utils/kmeans.py) — the in-framework replacement for
the reference's pretrained sklearn k-means quantizer, plus the
HubertWithKmeans.fit_kmeans integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from voicebox_tpu.utils.kmeans import fit_kmeans, kmeans_assign


def _blobs(rng, k=5, per=200, d=8, spread=0.05):
    centers = jax.random.normal(rng, (k, d)) * 3.0
    noise = jax.random.normal(jax.random.fold_in(rng, 1), (k, per, d)) * spread
    x = (centers[:, None, :] + noise).reshape(-1, d)
    return x, centers


def test_recovers_blob_centers():
    x, centers = _blobs(jax.random.PRNGKey(0))
    c, inertia = fit_kmeans(jax.random.PRNGKey(1), x, k=5, iters=30)
    assert c.shape == (5, 8)
    # every true center has a fitted centroid within the blob spread
    d = np.min(
        np.linalg.norm(np.asarray(centers)[:, None] - np.asarray(c)[None], axis=-1),
        axis=1,
    )
    assert (d < 0.1).all(), d
    assert float(inertia) < 0.1  # per-point inertia ~ spread^2 * d


def test_assign_partitions_blobs():
    x, _ = _blobs(jax.random.PRNGKey(2), k=4, per=50)
    c, _ = fit_kmeans(jax.random.PRNGKey(3), x, k=4, iters=20)
    ids = np.asarray(kmeans_assign(x, c)).reshape(4, 50)
    # each blob maps to exactly one cluster id, all four ids used
    per_blob = [set(row.tolist()) for row in ids]
    assert all(len(s) == 1 for s in per_blob)
    assert len(set().union(*per_blob)) == 4


def test_deterministic_and_jittable():
    x, _ = _blobs(jax.random.PRNGKey(4))
    a, ia = fit_kmeans(jax.random.PRNGKey(5), x, k=5, iters=10)
    b, ib = fit_kmeans(jax.random.PRNGKey(5), x, k=5, iters=10)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert float(ia) == float(ib)


def test_more_clusters_than_occupied_keeps_finite():
    # duplicate points force empty clusters: previous centres must be kept
    x = jnp.concatenate([jnp.zeros((50, 4)), jnp.ones((50, 4))])
    c, _ = fit_kmeans(jax.random.PRNGKey(6), x, k=8, iters=10)
    assert bool(jnp.all(jnp.isfinite(c)))


def test_hubert_fit_kmeans_integration():
    from voicebox_tpu.models.hubert import HubertWithKmeans

    w2v = HubertWithKmeans(num_clusters=12, dim=64, depth=2, heads=4)
    wav = jax.random.normal(jax.random.PRNGKey(0), (2, 6400))
    before = w2v.params["kmeans"]
    c, inertia = w2v.fit_kmeans(wav, rng=jax.random.PRNGKey(1), iters=10)
    assert c.shape == (12, 64) and w2v.params["kmeans"] is c
    assert float(inertia) >= 0.0
    # token contract still holds with the fitted vocabulary
    ids = w2v(wav)
    assert (np.asarray(ids) >= 0).all() and (np.asarray(ids) < 12).all()
    # features= path and exclusivity
    feats = w2v.features(wav).reshape(-1, 64)
    w2v.fit_kmeans(features=feats, iters=5)
    with pytest.raises(AssertionError):
        w2v.fit_kmeans(wav, features=feats)
    assert not np.allclose(np.asarray(before), np.asarray(w2v.params["kmeans"]))
