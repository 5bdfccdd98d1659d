"""Unit tests for L0 primitives: shapes + numerical parity with the reference
math (formulas re-derived in numpy, not imported from the reference)."""

import jax
import jax.numpy as jnp
import numpy as np

from voicebox_tpu.models.primitives import (
    AdaptiveRMSNorm,
    ConvPositionEmbed,
    FeedForward,
    LearnedSinusoidalPosEmb,
    MultiheadRMSNorm,
    RMSNorm,
    SimpleGateLoopLayer,
    apply_rotary_pos_emb,
    rotary_frequencies,
    rotate_half,
)


class TestSinusoidalPosEmb:
    def test_formula(self, rng):
        mod = LearnedSinusoidalPosEmb(dim=8)
        t = jnp.array([0.25, 0.5])
        params = mod.init(rng, t)
        out = mod.apply(params, t)
        w = np.asarray(params["params"]["weights"])
        freqs = t[:, None] * w[None, :] * 2 * np.pi
        expected = np.concatenate([np.sin(freqs), np.cos(freqs)], axis=-1)
        np.testing.assert_allclose(out, expected, rtol=1e-5)
        assert out.shape == (2, 8)


class TestRotary:
    def test_frequencies_theta(self):
        pos = jnp.arange(4)
        freqs = rotary_frequencies(pos, dim=8, theta=50000.0)
        inv = 1.0 / (50000.0 ** (np.arange(0, 8, 2) / 8))
        expected = np.einsum("i,j->ij", np.arange(4.0), inv)
        expected = np.concatenate([expected, expected], -1)
        np.testing.assert_allclose(freqs, expected, rtol=1e-5)

    def test_rotate_half(self):
        x = jnp.array([1.0, 2.0, 3.0, 4.0])
        np.testing.assert_allclose(rotate_half(x), [-3.0, -4.0, 1.0, 2.0])

    def test_apply_preserves_norm(self, rng):
        # rotation preserves the norm of each (x_i, x_{i+d/2}) pair
        t = jax.random.normal(rng, (1, 2, 6, 8))
        pos = rotary_frequencies(jnp.arange(6), dim=8)
        out = apply_rotary_pos_emb(pos, t)
        np.testing.assert_allclose(
            jnp.linalg.norm(out, axis=-1), jnp.linalg.norm(t, axis=-1), rtol=1e-5
        )

    def test_position_zero_is_identity(self, rng):
        t = jax.random.normal(rng, (1, 1, 1, 16))
        pos = rotary_frequencies(jnp.zeros(1), dim=16)
        np.testing.assert_allclose(apply_rotary_pos_emb(pos, t), t, rtol=1e-6)


class TestNorms:
    def test_rmsnorm_formula(self, rng):
        mod = RMSNorm(dim=16)
        x = jax.random.normal(rng, (2, 3, 16))
        params = mod.init(rng, x)
        out = mod.apply(params, x)
        xn = np.asarray(x)
        expected = xn / np.linalg.norm(xn, axis=-1, keepdims=True) * (16**0.5)
        np.testing.assert_allclose(out, expected, rtol=1e-5)

    def test_adaptive_rmsnorm_identity_at_init(self, rng):
        # zero-init regressors -> gamma=1, beta=0 -> plain unit-gamma RMSNorm
        mod = AdaptiveRMSNorm(dim=16, cond_dim=8)
        x = jax.random.normal(rng, (2, 3, 16))
        cond = jax.random.normal(jax.random.PRNGKey(7), (2, 8))
        params = mod.init(rng, x, cond=cond)
        out = mod.apply(params, x, cond=cond)
        xn = np.asarray(x)
        expected = xn / np.linalg.norm(xn, axis=-1, keepdims=True) * (16**0.5)
        np.testing.assert_allclose(out, expected, rtol=1e-5)

    def test_multihead_rmsnorm_shapes(self, rng):
        mod = MultiheadRMSNorm(dim=8, heads=4)
        x = jax.random.normal(rng, (2, 4, 6, 8))
        params = mod.init(rng, x)
        out = mod.apply(params, x)
        assert out.shape == x.shape
        assert params["params"]["gamma"].shape == (4, 1, 8)


class TestConvPositionEmbed:
    def test_mask_zeroing(self, rng):
        mod = ConvPositionEmbed(dim=8, kernel_size=5)
        x = jax.random.normal(rng, (2, 10, 8))
        mask = jnp.arange(10)[None, :] < jnp.array([7, 10])[:, None]
        params = mod.init(rng, x, mask)
        out = mod.apply(params, x, mask)
        assert out.shape == x.shape
        # padded frames are exactly zero after the post-conv mask
        assert (out[0, 7:] == 0).all()

    def test_depthwise_param_count(self, rng):
        mod = ConvPositionEmbed(dim=8, kernel_size=5)
        params = mod.init(rng, jnp.zeros((1, 4, 8)))
        kernel = params["params"]["dw_conv1d"]["kernel"]
        # depthwise: (k, in/groups=1, out)
        assert kernel.shape == (5, 1, 8)


class TestFeedForward:
    def test_inner_dim_two_thirds(self, rng):
        mod = FeedForward(dim=12, mult=4)
        params = mod.init(rng, jnp.zeros((1, 2, 12)))
        # inner = int(12 * 4 * 2/3) = 32, doubled for GEGLU
        assert params["params"]["proj_in"]["kernel"].shape == (12, 64)
        assert params["params"]["proj_out"]["kernel"].shape == (32, 12)

    def test_forward(self, rng):
        mod = FeedForward(dim=12)
        x = jax.random.normal(rng, (2, 5, 12))
        params = mod.init(rng, x)
        assert mod.apply(params, x).shape == x.shape


class TestGateLoopLayer:
    def test_shapes_and_jit(self, rng):
        mod = SimpleGateLoopLayer(dim=16)
        x = jax.random.normal(rng, (2, 10, 16))
        params = mod.init(rng, x)
        out = jax.jit(mod.apply)(params, x)
        assert out.shape == x.shape

    def test_causality(self, rng):
        # output at time t must not depend on inputs after t
        mod = SimpleGateLoopLayer(dim=8)
        x = jax.random.normal(rng, (1, 12, 8))
        params = mod.init(rng, x)
        out1 = mod.apply(params, x)
        x2 = x.at[:, 6:].set(0.0)
        out2 = mod.apply(params, x2)
        np.testing.assert_allclose(out1[:, :6], out2[:, :6], rtol=1e-4, atol=1e-5)
