"""Pipeline-parallel Transformer on the 8-virtual-device CPU platform.

The V-cycle schedule (parallel/pipeline.py) must reproduce the plain
`scan_layers=True` forward per microbatch exactly — same blocks, same order,
no floating-point reordering — and stay differentiable end-to-end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from voicebox_tpu.models.transformer import Transformer
from voicebox_tpu.parallel.pipeline import make_pp_forward


def _model(depth, **kw):
    cfg = dict(
        dim=32, depth=depth, dim_head=8, heads=4, num_register_tokens=2,
        use_unet_skip_connection=True, adaptive_rmsnorm=True,
        adaptive_rmsnorm_cond_dim_in=16, attn_qk_norm=True, scan_layers=True,
    )
    cfg.update(kw)
    return Transformer(**cfg)


def _data(M, b=2, n=24, dim=32, cond_dim=16, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    x = jax.random.normal(ks[0], (M, b, n, dim))
    cond = jax.random.normal(ks[1], (M, b, cond_dim))
    mask = jax.random.bernoulli(ks[2], 0.8, (M, b, n)).at[:, :, :3].set(True)
    return x, cond, mask


def _plain_per_microbatch(tr, params, x, mask, cond):
    # jit the reference path: eager-vs-jit compilations fold the f32 rotary
    # table (register position -10000) differently at ~6e-5, which the
    # scale-10 qk-norm softmax amplifies chaotically over depth; jit-vs-jit
    # the pipeline is EXACT (f64 parity 0.0 at every stage count)
    pf = jax.jit(
        lambda p, xm, mm, cm: tr.apply(
            {"params": p}, xm, mask=mm, adaptive_rmsnorm_cond=cm)
    )
    return jnp.stack([
        pf(params, x[m], mask[m], cond[m]) for m in range(x.shape[0])
    ])


class TestPipelineForward:
    @pytest.mark.parametrize("stages,depth,M", [(4, 8, 5), (2, 8, 3), (1, 4, 2)])
    def test_matches_plain(self, stages, depth, M):
        tr = _model(depth)
        x, cond, mask = _data(M)
        params = tr.init(jax.random.PRNGKey(1), x[0], mask=mask[0],
                         adaptive_rmsnorm_cond=cond[0])["params"]
        ref = _plain_per_microbatch(tr, params, x, mask, cond)

        mesh = Mesh(np.array(jax.devices()[:stages]), ("pipe",))
        fn = jax.jit(make_pp_forward(tr, mesh, num_microbatches=M))
        out = fn(params, x, mask, cond)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-5)

    def test_no_skip_no_registers(self):
        tr = _model(8, use_unet_skip_connection=False, num_register_tokens=0,
                    adaptive_rmsnorm=False, adaptive_rmsnorm_cond_dim_in=None)
        M = 4
        ks = jax.random.split(jax.random.PRNGKey(2), 2)
        x = jax.random.normal(ks[0], (M, 2, 24, 32))
        params = tr.init(ks[1], x[0])["params"]
        pf = jax.jit(lambda p, xm: tr.apply({"params": p}, xm))
        ref = jnp.stack([pf(params, x[m]) for m in range(M)])

        mesh = Mesh(np.array(jax.devices()[:4]), ("pipe",))
        fn = jax.jit(make_pp_forward(tr, mesh, num_microbatches=M))
        out = fn(params, x)
        # f32 cross-program fusion noise amplified by the scale-10 qk-norm
        # softmax over depth 8 (the pipeline is EXACT at f64, see module test
        # docstring); structural bugs show up as O(1) errors
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-3, atol=5e-3)

    def test_indivisible_depth_rejected(self):
        tr = _model(6)  # half=3 does not divide by 4 stages
        mesh = Mesh(np.array(jax.devices()[:4]), ("pipe",))
        with pytest.raises(AssertionError, match="divide"):
            make_pp_forward(tr, mesh, num_microbatches=2)


class TestPipelineGrad:
    def test_grad_matches_plain(self):
        tr = _model(8)
        M = 4
        x, cond, mask = _data(M, seed=3)
        params = tr.init(jax.random.PRNGKey(4), x[0], mask=mask[0],
                         adaptive_rmsnorm_cond=cond[0])["params"]

        mesh = Mesh(np.array(jax.devices()[:4]), ("pipe",))
        fn = make_pp_forward(tr, mesh, num_microbatches=M)

        def pp_loss(p):
            return jnp.mean(jnp.square(fn(p, x, mask, cond)))

        def plain_loss(p):
            return jnp.mean(jnp.square(_plain_per_microbatch(tr, p, x, mask, cond)))

        g_pp = jax.jit(jax.grad(pp_loss))(params)
        g_ref = jax.jit(jax.grad(plain_loss))(params)
        # global-norm comparison: per-leaf relative checks are meaningless on
        # near-zero-gradient leaves (f32 qk-norm chaos dominates them)
        ref_cat = np.concatenate(
            [np.asarray(t).ravel() for t in jax.tree.leaves(g_ref)])
        pp_cat = np.concatenate(
            [np.asarray(t).ravel() for t in jax.tree.leaves(g_pp)])
        rel = np.linalg.norm(pp_cat - ref_cat) / np.linalg.norm(ref_cat)
        assert rel <= 1e-2, f"global grad rel-norm diff {rel:.2e}"
