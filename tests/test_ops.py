"""Unit tests for voicebox_tpu.ops: masks, interpolation, ODE solvers,
gateloop recurrence, attention numerics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from voicebox_tpu.ops import (
    attend,
    curtail_or_pad,
    gated_linear_recurrence,
    interpolate_1d,
    mask_from_frac_lengths,
    mask_from_start_end_indices,
    odeint,
    odeint_midpoint,
    prob_mask_like,
    reduce_masks_with_and,
    reference_attention,
)


class TestMasks:
    def test_prob_mask_fast_paths(self, rng):
        assert prob_mask_like(rng, (3, 4), 1).all()
        assert not prob_mask_like(rng, (3, 4), 0).any()

    def test_prob_mask_rate(self, rng):
        m = prob_mask_like(rng, (10000,), 0.3)
        assert 0.27 < m.mean() < 0.33

    def test_reduce_masks(self):
        a = jnp.array([True, True, False])
        b = jnp.array([True, False, False])
        assert reduce_masks_with_and(None, None) is None
        np.testing.assert_array_equal(reduce_masks_with_and(a, None), a)
        np.testing.assert_array_equal(reduce_masks_with_and(a, b), a & b)

    def test_mask_from_start_end(self):
        m = mask_from_start_end_indices(6, jnp.array([1, 0]), jnp.array([4, 2]))
        np.testing.assert_array_equal(
            m,
            [[False, True, True, True, False, False],
             [True, True, False, False, False, False]],
        )

    def test_mask_from_frac_lengths_coverage(self, rng):
        seq_len = 100
        frac = jnp.full((64,), 0.7)
        m = mask_from_frac_lengths(rng, seq_len, frac)
        # each row covers exactly int(0.7*100) = 70 contiguous positions
        assert (m.sum(-1) == 70).all()
        # contiguity: diff changes sign at most twice
        d = jnp.abs(jnp.diff(m.astype(jnp.int32), axis=-1)).sum(-1)
        assert (d <= 2).all()

    def test_mask_from_frac_lengths_jits(self, rng):
        f = jax.jit(lambda k, fr: mask_from_frac_lengths(k, 50, fr))
        out = f(rng, jnp.array([0.5, 0.9]))
        assert out.shape == (2, 50)


class TestInterp:
    def test_identity_length(self):
        x = jnp.arange(12.0).reshape(1, 3, 4)
        np.testing.assert_allclose(interpolate_1d(x, 4), x, atol=1e-6)

    def test_upsample_linear(self):
        x = jnp.array([[0.0, 1.0]])
        out = interpolate_1d(x, 4)
        # half-pixel-center linear resize (matches torch bilinear, align_corners=False)
        np.testing.assert_allclose(out, [[0.0, 0.25, 0.75, 1.0]], atol=1e-6)

    def test_bool_roundtrip(self):
        m = jnp.array([[True, True, False, False]])
        out = interpolate_1d(m, 8)
        assert out.dtype == jnp.bool_
        assert out[0, 0] and not out[0, -1]

    def test_curtail_or_pad(self):
        x = jnp.ones((2, 5, 3))
        assert curtail_or_pad(x, 3).shape == (2, 3, 3)
        padded = curtail_or_pad(x, 8)
        assert padded.shape == (2, 8, 3)
        assert (padded[:, 5:] == 0).all()


class TestODE:
    def test_exponential_decay(self):
        # dy/dt = -y, y0 = 1 -> y(1) = e^-1
        fn = lambda t, y: -y
        y0 = jnp.ones((4,))
        yT, traj = odeint_midpoint(fn, y0, jnp.linspace(0, 1, 33))
        np.testing.assert_allclose(yT, np.exp(-1.0), rtol=1e-3)
        assert traj.shape == (33, 4)

    def test_time_dependent(self):
        # dy/dt = 2t -> y(1) = y0 + 1; midpoint is exact for linear-in-t fields
        fn = lambda t, y: jnp.full_like(y, 2 * t)
        yT, _ = odeint_midpoint(fn, jnp.zeros((2,)), jnp.linspace(0, 1, 3))
        np.testing.assert_allclose(yT, 1.0, rtol=1e-6)

    def test_methods_converge(self):
        fn = lambda t, y: -y
        y0 = jnp.ones(())
        for method, rtol in [("euler", 5e-2), ("midpoint", 1e-3), ("rk4", 1e-6)]:
            yT, _ = odeint(fn, y0, jnp.linspace(0, 1, 17), method=method)
            np.testing.assert_allclose(yT, np.exp(-1.0), rtol=rtol)

    def test_jit_and_grad(self):
        def loss(a):
            fn = lambda t, y: a * y
            yT, _ = odeint_midpoint(fn, jnp.ones(()), jnp.linspace(0, 1, 9))
            return yT

        g = jax.jit(jax.grad(loss))(-1.0)
        # d/da e^a at a=-1 is e^-1
        np.testing.assert_allclose(g, np.exp(-1.0), rtol=1e-2)


class TestGateLoop:
    def test_matches_sequential_scan(self, rng):
        k1, k2 = jax.random.split(rng)
        a = jax.nn.sigmoid(jax.random.normal(k1, (2, 16, 8)))
        x = jax.random.normal(k2, (2, 16, 8))
        out = gated_linear_recurrence(a, x, axis=1)

        # sequential reference
        s = np.zeros((2, 8))
        expected = np.zeros((2, 16, 8))
        for t in range(16):
            s = np.asarray(a[:, t]) * s + np.asarray(x[:, t])
            expected[:, t] = s
        np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-5)


class TestAttention:
    def _naive(self, q, k, v, mask=None, scale=None):
        scale = scale if scale is not None else q.shape[-1] ** -0.5
        sim = np.einsum("bhid,bhjd->bhij", q, k) * scale
        if mask is not None:
            sim = np.where(mask[:, None, None, :], sim, -1e30)
        sim = sim - sim.max(-1, keepdims=True)
        attn = np.exp(sim)
        attn = attn / attn.sum(-1, keepdims=True)
        return np.einsum("bhij,bhjd->bhid", attn, v)

    def test_reference_attention_matches_naive(self, rng):
        ks = jax.random.split(rng, 3)
        q = jax.random.normal(ks[0], (2, 4, 37, 16))
        k = jax.random.normal(ks[1], (2, 4, 37, 16))
        v = jax.random.normal(ks[2], (2, 4, 37, 16))
        mask = jnp.arange(37)[None, :] < jnp.array([30, 37])[:, None]
        out = reference_attention(q, k, v, mask)
        expected = self._naive(np.asarray(q), np.asarray(k), np.asarray(v), np.asarray(mask))
        np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-5)

    def test_custom_scale(self, rng):
        ks = jax.random.split(rng, 3)
        q = jax.random.normal(ks[0], (1, 2, 8, 4))
        k = jax.random.normal(ks[1], (1, 2, 8, 4))
        v = jax.random.normal(ks[2], (1, 2, 8, 4))
        out = reference_attention(q, k, v, scale=10.0)
        expected = self._naive(np.asarray(q), np.asarray(k), np.asarray(v), scale=10.0)
        np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-5)

    def test_bf16_scores_close_to_f32(self, rng):
        # opt-in bf16 score matrix: same math within bf16 softmax rounding.
        # q/k are unit-normalised as the model's qk-norm guarantees, so
        # |logit| <= scale = 10 (bf16-representable to ~0.04 ulp)
        ks = jax.random.split(rng, 3)
        q = jax.random.normal(ks[0], (2, 4, 37, 16))
        k = jax.random.normal(ks[1], (2, 4, 37, 16))
        q = (q / jnp.linalg.norm(q, axis=-1, keepdims=True)).astype(jnp.bfloat16)
        k = (k / jnp.linalg.norm(k, axis=-1, keepdims=True)).astype(jnp.bfloat16)
        v = jax.random.normal(ks[2], (2, 4, 37, 16), dtype=jnp.bfloat16)
        mask = jnp.arange(37)[None, :] < jnp.array([30, 37])[:, None]
        ref = reference_attention(q, k, v, mask, scale=10.0)
        out = reference_attention(q, k, v, mask, scale=10.0,
                                  scores_dtype=jnp.bfloat16)
        assert out.dtype == ref.dtype == jnp.bfloat16
        # measured max |delta| 0.031 on softmax-weighted outputs (bf16 logit
        # ulp 0.0625 near |logit|=10)
        np.testing.assert_allclose(
            out.astype(np.float32), ref.astype(np.float32), atol=4e-2
        )

    def test_attend_dispatch_cpu(self, rng):
        # on CPU the dispatcher must take the XLA path and agree with it
        ks = jax.random.split(rng, 3)
        q = jax.random.normal(ks[0], (1, 2, 12, 8))
        k = jax.random.normal(ks[1], (1, 2, 12, 8))
        v = jax.random.normal(ks[2], (1, 2, 12, 8))
        out = attend(q, k, v)
        np.testing.assert_allclose(out, reference_attention(q, k, v), rtol=1e-5)


class TestAttendAutoPolicy:
    """The measured dispatch: XLA below the 4096-key threshold, Pallas above
    (on TPU backends). CPU always takes XLA; the TPU branch is exercised by
    monkeypatching the backend probe and intercepting the kernel entry."""

    def _probe(self, monkeypatch, n, training):
        import voicebox_tpu.ops.flash_attention as fa_mod

        fa = __import__("sys").modules["voicebox_tpu.ops.flash_attention"]
        calls = {}
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        monkeypatch.setattr(
            fa, "flash_attention",
            lambda q, k, v, m=None, s=None, **kw: calls.setdefault("flash", True) or q,
        )
        monkeypatch.setattr(
            fa, "reference_attention",
            lambda q, k, v, m=None, s=None, **kw: calls.setdefault("xla", True) or q,
        )
        q = jnp.zeros((1, 1, n, 8))
        fa.attend(q, q, q, training=training)
        return calls

    def test_short_seq_takes_xla(self, monkeypatch):
        assert self._probe(monkeypatch, 512, training=False) == {"xla": True}

    def test_long_seq_takes_flash(self, monkeypatch):
        assert self._probe(monkeypatch, 5000, training=False) == {"flash": True}

    def test_long_seq_training_takes_flash(self, monkeypatch):
        # FA2 backward makes Pallas the training path beyond the threshold too
        assert self._probe(monkeypatch, 5000, training=True) == {"flash": True}


class TestFlashKernelInterpret:
    """Pallas flash kernels run in interpret mode on CPU — math parity with
    the XLA path (TPU-compiled parity is exercised separately on hardware:
    rel err <= 0.7% bf16, masked dk/dv exactly zero, n=8192 grads finite)."""

    def _inputs(self, rng, n=200, d=32):
        ks = jax.random.split(rng, 4)
        q = jax.random.normal(ks[0], (2, 2, n, d))
        k = jax.random.normal(ks[1], (2, 2, n, d))
        v = jax.random.normal(ks[2], (2, 2, n, d))
        mask = jax.random.bernoulli(ks[3], 0.8, (2, n)).at[:, :4].set(True)
        return q, k, v, mask

    def test_forward_parity(self, rng):
        from voicebox_tpu.ops.flash_attention import _flash_forward

        q, k, v, mask = self._inputs(rng)
        out = _flash_forward(q, k, v, mask, scale=None or q.shape[-1] ** -0.5,
                             block_q=128, block_k=128, interpret=True)
        ref = reference_attention(q, k, v, mask)
        np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)

    def test_backward_parity(self, rng):
        from voicebox_tpu.ops.flash_attention import _flash_backward, _flash_forward

        q, k, v, mask = self._inputs(rng)
        scale = q.shape[-1] ** -0.5
        out, lse = _flash_forward(q, k, v, mask, scale, 128, 128,
                                  return_lse=True, interpret=True)
        do = jax.random.normal(jax.random.PRNGKey(7), out.shape)
        dq, dk, dv = _flash_backward(q, k, v, mask, out, lse, do, scale,
                                     128, 128, interpret=True)
        _, vjp = jax.vjp(lambda q, k, v: reference_attention(q, k, v, mask, scale),
                         q, k, v)
        rq, rk, rv = vjp(do)
        np.testing.assert_allclose(dq, rq, rtol=2e-3, atol=2e-4)
        np.testing.assert_allclose(dk, rk, rtol=2e-3, atol=2e-4)
        np.testing.assert_allclose(dv, rv, rtol=2e-3, atol=2e-4)

    def test_backward_masked_keys_zero_grad(self, rng):
        from voicebox_tpu.ops.flash_attention import _flash_backward, _flash_forward

        q, k, v, _ = self._inputs(rng, n=160)
        mask = jnp.zeros((2, 160), bool).at[:, :100].set(True)
        scale = q.shape[-1] ** -0.5
        out, lse = _flash_forward(q, k, v, mask, scale, 128, 128,
                                  return_lse=True, interpret=True)
        do = jnp.ones_like(out)
        _, dk, dv = _flash_backward(q, k, v, mask, out, lse, do, scale,
                                    128, 128, interpret=True)
        assert np.abs(np.asarray(dk[:, :, 100:])).max() == 0.0
        assert np.abs(np.asarray(dv[:, :, 100:])).max() == 0.0


class TestTsit5:
    def test_fixed_grid_high_order(self):
        from voicebox_tpu.ops.ode import odeint_tsit5

        fn = lambda t, y: -y
        yT, _ = odeint_tsit5(fn, jnp.ones(()), jnp.linspace(0, 1, 5))
        np.testing.assert_allclose(yT, np.exp(-1.0), rtol=1e-6)  # fp32 floor

    def test_adaptive_converges(self):
        from voicebox_tpu.ops.ode import odeint_tsit5_adaptive

        fn = lambda t, y: -y
        y, n = odeint_tsit5_adaptive(fn, jnp.ones((4,)), atol=1e-6, rtol=1e-6)
        np.testing.assert_allclose(y, np.exp(-1.0), rtol=1e-5)
        assert 0 < int(n) < 256

    def test_adaptive_stiffer_field_uses_more_steps(self):
        from voicebox_tpu.ops.ode import odeint_tsit5_adaptive

        _, n_slow = odeint_tsit5_adaptive(lambda t, y: -y, jnp.ones(()))
        _, n_fast = odeint_tsit5_adaptive(lambda t, y: -25 * y, jnp.ones(()))
        assert int(n_fast) > int(n_slow)

    def test_adaptive_jits(self):
        from voicebox_tpu.ops.ode import odeint_tsit5_adaptive

        f = jax.jit(lambda y0: odeint_tsit5_adaptive(lambda t, y: -y, y0)[0])
        np.testing.assert_allclose(f(jnp.ones(())), np.exp(-1.0), rtol=1e-4)
