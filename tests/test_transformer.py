"""Tests for the L1 Transformer backbone: registers, U-Net skips, adaptive
norm conditioning, masking."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from voicebox_tpu.models.transformer import Transformer


def _make(depth=4, **kw):
    return Transformer(dim=32, depth=depth, dim_head=8, heads=4, **kw)


class TestTransformer:
    def test_basic_shape(self, rng):
        mod = _make()
        x = jax.random.normal(rng, (2, 10, 32))
        params = mod.init(rng, x)
        out = mod.apply(params, x)
        assert out.shape == (2, 10, 32)

    def test_odd_depth_asserts(self, rng):
        with pytest.raises(AssertionError):
            _make(depth=3).init(rng, jnp.zeros((1, 4, 32)))

    def test_register_tokens_removed(self, rng):
        mod = _make(num_register_tokens=6)
        x = jax.random.normal(rng, (2, 10, 32))
        params = mod.init(rng, x)
        out = mod.apply(params, x)
        assert out.shape == (2, 10, 32)
        assert params["params"]["register_tokens"].shape == (6, 32)

    def test_unet_skip_combiners_in_second_half_only(self, rng):
        mod = _make(depth=4, use_unet_skip_connection=True)
        params = mod.init(rng, jnp.zeros((1, 4, 32)))
        keys = params["params"].keys()
        assert "skip_combiner_2" in keys and "skip_combiner_3" in keys
        assert "skip_combiner_0" not in keys and "skip_combiner_1" not in keys

    def test_adaptive_norm_conditioning_changes_output(self, rng):
        mod = _make(adaptive_rmsnorm=True, adaptive_rmsnorm_cond_dim_in=16)
        x = jax.random.normal(rng, (2, 8, 32))
        cond_a = jnp.zeros((2, 16))
        cond_b = jnp.ones((2, 16))
        params = mod.init(rng, x, adaptive_rmsnorm_cond=cond_a)
        # the cond regressors are zero-init (identity) — perturb one so the
        # conditioning path is actually live
        params = jax.tree_util.tree_map_with_path(
            lambda path, p: p + 0.05
            if any(getattr(k, "key", None) == "to_gamma" for k in path)
            else p,
            params,
        )
        out_a = mod.apply(params, x, adaptive_rmsnorm_cond=cond_a)
        out_b = mod.apply(params, x, adaptive_rmsnorm_cond=cond_b)
        assert not np.allclose(out_a, out_b)

    def test_mask_blocks_padded_keys(self, rng):
        # changing values at masked (padded) positions must not change the
        # outputs at unmasked positions
        mod = _make()
        x = jax.random.normal(rng, (1, 10, 32))
        mask = jnp.arange(10)[None, :] < 6
        params = mod.init(rng, x, mask=mask)
        out1 = mod.apply(params, x, mask=mask)
        x2 = x.at[:, 6:].add(100.0)
        out2 = mod.apply(params, x2, mask=mask)
        np.testing.assert_allclose(out1[:, :6], out2[:, :6], rtol=1e-4, atol=1e-4)

    def test_gateloop_layers(self, rng):
        mod = _make(use_gateloop_layers=True)
        x = jax.random.normal(rng, (1, 6, 32))
        params = mod.init(rng, x)
        assert "gateloop" in params["params"]["block_0"]
        assert mod.apply(params, x).shape == x.shape

    def test_qk_norm(self, rng):
        mod = _make(attn_qk_norm=True)
        x = jax.random.normal(rng, (1, 6, 32))
        params = mod.init(rng, x)
        assert "q_norm" in params["params"]["block_0"]["attn"]
        assert jnp.isfinite(mod.apply(params, x)).all()

    def test_jit(self, rng):
        mod = _make(num_register_tokens=2, use_unet_skip_connection=True)
        x = jax.random.normal(rng, (2, 8, 32))
        params = mod.init(rng, x)
        out = jax.jit(mod.apply)(params, x)
        assert jnp.isfinite(out).all()


class TestScanLayers:
    def _stack_params(self, params, depth, unet=False):
        """Transplant unrolled block params into the scanned (stacked) layout."""
        import jax.numpy as jnp

        half = depth // 2
        front = jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[params["params"][f"block_{i}"] for i in range(half)],
        )
        back = jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[params["params"][f"block_{i}"] for i in range(half, depth)],
        )
        back_tree = {"block": back}
        if unet:
            back_tree["skip_combiner"] = jax.tree.map(
                lambda *xs: jnp.stack(xs),
                *[params["params"][f"skip_combiner_{i}"]
                  for i in range(half, depth)],
            )
        return {
            "params": {
                "layers_front": {"block": front},
                "layers_back": back_tree,
                "final_norm": params["params"]["final_norm"],
            }
        }

    @pytest.mark.parametrize("unet", [False, True])
    def test_scan_matches_unrolled(self, rng, unet):
        """Same math as the unrolled loop — including the U-Net skip stack
        (the reference pushes each block's INPUT, voicebox_pytorch.py:459)."""
        depth = 4
        kw = dict(dim=32, depth=depth, dim_head=8, heads=4,
                  use_unet_skip_connection=unet)
        unrolled = Transformer(**kw)
        scanned = Transformer(**kw, scan_layers=True)
        x = jax.random.normal(rng, (2, 10, 32))
        params = unrolled.init(rng, x)
        out_u = unrolled.apply(params, x)
        out_s = scanned.apply(self._stack_params(params, depth, unet), x)
        np.testing.assert_allclose(out_u, out_s, rtol=2e-4, atol=2e-5)

    def test_scan_with_unet_and_registers(self, rng):
        mod = Transformer(dim=32, depth=4, dim_head=8, heads=4, scan_layers=True,
                          use_unet_skip_connection=True, num_register_tokens=3,
                          attn_qk_norm=True)
        x = jax.random.normal(rng, (2, 8, 32))
        params = mod.init(rng, x)
        out = jax.jit(mod.apply)(params, x)
        assert out.shape == x.shape
        assert jnp.isfinite(out).all()

    def test_scan_adaptive_norm(self, rng):
        mod = Transformer(dim=32, depth=2, dim_head=8, heads=4, scan_layers=True,
                          adaptive_rmsnorm=True, adaptive_rmsnorm_cond_dim_in=16)
        x = jax.random.normal(rng, (1, 6, 32))
        cond = jnp.ones((1, 16))
        params = mod.init(rng, x, adaptive_rmsnorm_cond=cond)
        out = mod.apply(params, x, adaptive_rmsnorm_cond=cond)
        assert jnp.isfinite(out).all()

    def test_scan_grad(self, rng):
        mod = Transformer(dim=32, depth=4, dim_head=8, heads=4, scan_layers=True,
                          use_unet_skip_connection=True, remat=True)
        x = jax.random.normal(rng, (1, 6, 32))
        params = mod.init(rng, x)
        g = jax.grad(lambda p: jnp.sum(mod.apply(p, x) ** 2))(params)
        assert all(jnp.isfinite(t).all() for t in jax.tree.leaves(g))

    def test_remat_policy_grads_match_no_remat(self, rng):
        """Selective remat ('dots': save matmul outputs, recompute elementwise)
        changes only WHAT is cached for backward — loss and grads must equal
        the un-remat'd model."""

        def make(**kw):
            return Transformer(dim=32, depth=4, dim_head=8, heads=4,
                               use_unet_skip_connection=True, attn_qk_norm=True,
                               **kw)

        x = jax.random.normal(rng, (2, 8, 32))
        base = make()
        params = base.init(rng, x)
        loss = lambda mod: jax.jit(
            jax.value_and_grad(lambda p: jnp.sum(mod.apply(p, x) ** 2))
        )(params)

        l0, g0 = loss(base)
        for policy in (None, "dots", "dots_no_batch"):
            l1, g1 = loss(make(remat=True, remat_policy=policy))
            np.testing.assert_allclose(l1, l0, rtol=1e-5)
            for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g0)):
                np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)

    def test_remat_policy_unknown_raises(self, rng):
        mod = Transformer(dim=32, depth=2, dim_head=8, heads=4, remat=True,
                          remat_policy="bogus")
        x = jax.random.normal(rng, (1, 4, 32))
        with pytest.raises(AssertionError, match="remat_policy"):
            mod.init(rng, x)


class TestAttnDropout:
    def test_dropout_stochastic_in_training(self, rng):
        mod = _make(attn_dropout=0.5)
        x = jax.random.normal(rng, (1, 8, 32))
        params = mod.init(rng, x)
        a = mod.apply(params, x, deterministic=False,
                      rngs={"dropout": jax.random.PRNGKey(1)})
        b = mod.apply(params, x, deterministic=False,
                      rngs={"dropout": jax.random.PRNGKey(2)})
        c = mod.apply(params, x)  # deterministic default
        assert not np.allclose(a, b)
        np.testing.assert_allclose(c, mod.apply(params, x), rtol=1e-6)


class TestReferenceKwargAliases:
    """Reference call-site kwargs keep working verbatim
    (voicebox_pytorch.py:365,371-372,896)."""

    def test_attn_flash_alias_matches_use_flash(self, rng):
        # equal resolution both ways (True needs the TPU Pallas kernel, so
        # only resolution — not execution — is checked for that value)
        assert _make(attn_flash=True)._resolved_flash is True
        assert _make(use_flash=True)._resolved_flash is True
        x = jax.random.normal(rng, (1, 8, 32))
        ref = _make(use_flash=False)
        ali = _make(attn_flash=False)
        params = ref.init(rng, x)
        np.testing.assert_allclose(
            ref.apply(params, x), ali.apply(params, x), rtol=1e-6
        )

    def test_attn_flash_wins_over_use_flash(self):
        mod = _make(use_flash=True, attn_flash=False)
        assert mod._resolved_flash is False

    def test_gateloop_use_jax_accepted(self, rng):
        mod = _make(use_gateloop_layers=True, gateloop_use_jax=True)
        x = jax.random.normal(rng, (1, 8, 32))
        params = mod.init(rng, x)
        assert jnp.isfinite(mod.apply(params, x)).all()

    def test_voicebox_attn_flash_and_trainer_split_batches(self, rng, tmp_path):
        from voicebox_tpu import ConditionalFlowMatcherWrapper, VoiceBox
        from voicebox_tpu.training.data import ArrayDataset
        from voicebox_tpu.training.trainer import VoiceBoxTrainer

        vb = VoiceBox(dim_in=16, dim=32, depth=2, dim_head=8, heads=4,
                      num_register_tokens=2, conv_pos_embed_kernel_size=7,
                      condition_on_text=False, attn_flash=False)
        cfm = ConditionalFlowMatcherWrapper(vb)
        cfm.init_params(rng, seq_len=8, batch=2)
        ds = ArrayDataset(
            [np.random.RandomState(i).randn(8, 16).astype(np.float32)
             for i in range(16)]
        )
        tr = VoiceBoxTrainer(cfm, batch_size=2, dataset=ds, num_train_steps=1,
                             valid_frac=0.25, results_folder=str(tmp_path),
                             split_batches=True, bucket_multiple=8,
                             use_mesh=False)
        tr.train()
        assert tr.steps == 1
