"""Numerical parity vs the PyTorch reference's pure math (SURVEY.md §4.2).

Each test re-states the reference's documented math in torch (independently
written from the cited equations, NOT vendored code), loads IDENTICAL weights
into the flax module, and compares outputs at float32 with tight tolerances.
This is the strongest "matching the reference" evidence available without
network egress (no pretrained checkpoints).

Reference math covered (citations into /root/reference/voicebox_pytorch/):
- LearnedSinusoidalPosEmb        voicebox_pytorch.py:154-167
- RotaryEmbedding θ=50000, fp32  voicebox_pytorch.py:172-199
- ConvPositionEmbed               voicebox_pytorch.py:203-233
- RMSNorm / AdaptiveRMSNorm /
  MultiheadRMSNorm                voicebox_pytorch.py:237-287
- Attention + Attend scale-10
  qk-norm semantics               voicebox_pytorch.py:289-333, attend.py:76-137
- GEGLU FeedForward (2/3 inner)   voicebox_pytorch.py:337-349
- CFM interpolant w / flow        voicebox_pytorch.py:1397-1410
- midpoint odeint trajectory      voicebox_pytorch.py:1292-1296 (torchdiffeq)

Known deliberate deviation: the denoiser path uses tanh-approximate GELU
(PERFORMANCE.md — 17% cheaper on v5e; no pretrained denoiser weights exist to
match). Tests involving GELU therefore compare against torch's tanh variant
and separately bound the erf-vs-tanh delta.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

ATOL = 2e-5


def _np(x):
    return np.asarray(jax.device_get(x))


def _t(x):
    return torch.from_numpy(np.array(x, dtype=np.float32, copy=True))


# ---------------------------------------------------------------------------
# positional embeddings
# ---------------------------------------------------------------------------


class TestLearnedSinusoidalPosEmb:
    def test_parity(self):
        from voicebox_tpu.models.primitives import LearnedSinusoidalPosEmb

        dim, b = 16, 5
        rs = np.random.RandomState(0)
        weights = rs.randn(dim // 2).astype(np.float32)
        t_in = rs.rand(b).astype(np.float32)

        # reference: freqs = t[:, None] * w[None, :] * 2π; cat(sin, cos)
        # (voicebox_pytorch.py:163-167)
        tt = _t(t_in)[:, None] * _t(weights)[None, :] * 2 * math.pi
        expected = torch.cat([tt.sin(), tt.cos()], dim=-1).numpy()

        mod = LearnedSinusoidalPosEmb(dim=dim)
        out = mod.apply({"params": {"weights": jnp.asarray(weights)}}, jnp.asarray(t_in))
        np.testing.assert_allclose(_np(out), expected, atol=ATOL)


class TestRotary:
    def test_frequencies_and_application(self):
        from voicebox_tpu.models.primitives import (
            apply_rotary_pos_emb,
            rotary_frequencies,
        )

        dim, n = 32, 12
        rs = np.random.RandomState(1)
        x = rs.randn(2, 4, n, dim).astype(np.float32)  # (b, h, n, d)
        positions = np.arange(n, dtype=np.float32)

        # reference RotaryEmbedding (voicebox_pytorch.py:172-191):
        # inv_freq = 1 / θ^(arange(0, d, 2)/d), θ=50000; freqs duplicated
        theta = 50000.0
        inv_freq = 1.0 / (
            theta ** (torch.arange(0, dim, 2).float() / dim)
        )
        freqs = torch.einsum("i,j->ij", _t(positions), inv_freq)
        freqs = torch.cat([freqs, freqs], dim=-1)

        ours = rotary_frequencies(jnp.asarray(positions), dim)
        np.testing.assert_allclose(_np(ours), freqs.numpy(), atol=ATOL)

        # apply: t cos(pos) + rotate_half(t) sin(pos), fp32
        # (voicebox_pytorch.py:193-199)
        xt = _t(x)
        x1, x2 = xt.chunk(2, dim=-1)
        rotated = torch.cat([-x2, x1], dim=-1)
        expected = xt * freqs.cos() + rotated * freqs.sin()

        out = apply_rotary_pos_emb(jnp.asarray(freqs.numpy()), jnp.asarray(x))
        np.testing.assert_allclose(_np(out), expected.numpy(), atol=ATOL)

    def test_register_positions_negative(self):
        # registers sit at rotary position −10000 (voicebox_pytorch.py:438-441)
        from voicebox_tpu.models.primitives import rotary_frequencies

        pos = jnp.concatenate(
            [jnp.full((4,), -10000.0), jnp.arange(8, dtype=jnp.float32)]
        )
        freqs = rotary_frequencies(pos, 16)
        assert np.isfinite(_np(freqs)).all()


# ---------------------------------------------------------------------------
# norms
# ---------------------------------------------------------------------------


class TestNorms:
    def test_rmsnorm(self):
        from voicebox_tpu.models.primitives import RMSNorm

        dim = 48
        rs = np.random.RandomState(2)
        x = rs.randn(3, 7, dim).astype(np.float32)
        gamma = rs.randn(dim).astype(np.float32)

        # reference: F.normalize(x, dim=-1) * sqrt(d) * gamma
        # (voicebox_pytorch.py:237-247)
        expected = (F.normalize(_t(x), dim=-1) * (dim**0.5) * _t(gamma)).numpy()

        out = RMSNorm(dim=dim).apply({"params": {"gamma": jnp.asarray(gamma)}}, jnp.asarray(x))
        np.testing.assert_allclose(_np(out), expected, atol=ATOL)

    def test_adaptive_rmsnorm(self):
        from voicebox_tpu.models.primitives import AdaptiveRMSNorm

        dim, cond_dim, b, n = 32, 24, 3, 6
        rs = np.random.RandomState(3)
        x = rs.randn(b, n, dim).astype(np.float32)
        cond = rs.randn(b, cond_dim).astype(np.float32)
        wg = rs.randn(cond_dim, dim).astype(np.float32) * 0.1
        bg = rs.randn(dim).astype(np.float32)
        wb = rs.randn(cond_dim, dim).astype(np.float32) * 0.1
        bb = rs.randn(dim).astype(np.float32)

        # reference: normed = F.normalize(x) * sqrt(d);
        # gamma/beta = Linear(cond); normed * gamma[:,None] + beta[:,None]
        # (voicebox_pytorch.py:249-276)
        ct = _t(cond)
        gamma = ct @ _t(wg) + _t(bg)
        beta = ct @ _t(wb) + _t(bb)
        normed = F.normalize(_t(x), dim=-1) * (dim**0.5)
        expected = (normed * gamma[:, None, :] + beta[:, None, :]).numpy()

        params = {
            "to_gamma": {"kernel": jnp.asarray(wg), "bias": jnp.asarray(bg)},
            "to_beta": {"kernel": jnp.asarray(wb), "bias": jnp.asarray(bb)},
        }
        out = AdaptiveRMSNorm(dim=dim, cond_dim=cond_dim).apply(
            {"params": params}, jnp.asarray(x), cond=jnp.asarray(cond)
        )
        np.testing.assert_allclose(_np(out), expected, atol=ATOL)

    def test_adaptive_rmsnorm_zero_init_is_identity_rmsnorm(self):
        # zero-init: gamma ≡ 1, beta ≡ 0 → plain scale*normalize
        # (voicebox_pytorch.py:263-270 "init to identity")
        from voicebox_tpu.models.primitives import AdaptiveRMSNorm

        dim = 16
        rs = np.random.RandomState(4)
        x = rs.randn(2, 5, dim).astype(np.float32)
        cond = rs.randn(2, 8).astype(np.float32)
        mod = AdaptiveRMSNorm(dim=dim, cond_dim=8)
        params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), cond=jnp.asarray(cond))
        out = mod.apply(params, jnp.asarray(x), cond=jnp.asarray(cond))
        expected = (F.normalize(_t(x), dim=-1) * (dim**0.5)).numpy()
        np.testing.assert_allclose(_np(out), expected, atol=ATOL)

    def test_multihead_rmsnorm(self):
        from voicebox_tpu.models.primitives import MultiheadRMSNorm

        h, d = 4, 16
        rs = np.random.RandomState(5)
        x = rs.randn(2, h, 9, d).astype(np.float32)
        gamma = rs.randn(h, 1, d).astype(np.float32)

        # reference: F.normalize(x, dim=-1) * gamma * sqrt(d)
        # (voicebox_pytorch.py:280-287)
        expected = (F.normalize(_t(x), dim=-1) * _t(gamma) * (d**0.5)).numpy()
        out = MultiheadRMSNorm(dim=d, heads=h).apply(
            {"params": {"gamma": jnp.asarray(gamma)}}, jnp.asarray(x)
        )
        np.testing.assert_allclose(_np(out), expected, atol=ATOL)


# ---------------------------------------------------------------------------
# feedforward (GEGLU)
# ---------------------------------------------------------------------------


class TestFeedForward:
    def test_geglu_ff_parity(self):
        from voicebox_tpu.models.primitives import FeedForward

        dim, mult, b, n = 24, 4, 2, 5
        dim_inner = int(dim * mult * 2 / 3)  # voicebox_pytorch.py:343
        rs = np.random.RandomState(6)
        x = rs.randn(b, n, dim).astype(np.float32)
        w1 = (rs.randn(dim, dim_inner * 2) / math.sqrt(dim)).astype(np.float32)
        b1 = rs.randn(dim_inner * 2).astype(np.float32) * 0.1
        w2 = (rs.randn(dim_inner, dim) / math.sqrt(dim_inner)).astype(np.float32)
        b2 = rs.randn(dim).astype(np.float32) * 0.1

        # reference FF: Linear → GEGLU (x, gate = chunk; gelu(gate) * x)
        # → Linear (voicebox_pytorch.py:337-349). GELU here is the tanh
        # variant — the documented TPU deviation (module docstring).
        ht = _t(x) @ _t(w1) + _t(b1)
        xt, gate = ht.chunk(2, dim=-1)
        inner = F.gelu(gate, approximate="tanh") * xt
        expected = (inner @ _t(w2) + _t(b2)).numpy()

        params = {
            "proj_in": {"kernel": jnp.asarray(w1), "bias": jnp.asarray(b1)},
            "proj_out": {"kernel": jnp.asarray(w2), "bias": jnp.asarray(b2)},
        }
        out = FeedForward(dim=dim, mult=mult).apply({"params": params}, jnp.asarray(x))
        np.testing.assert_allclose(_np(out), expected, atol=ATOL)

        # bound the deviation vs the reference's exact-erf GELU on this data
        exact = ((F.gelu(gate) * xt) @ _t(w2) + _t(b2)).numpy()
        assert np.max(np.abs(expected - exact)) < 5e-3

    def test_inner_dim_matches_reference_formula(self):
        from voicebox_tpu.models.primitives import FeedForward

        mod = FeedForward(dim=512, mult=4)
        params = mod.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 512)))
        k = params["params"]["proj_in"]["kernel"]
        assert k.shape == (512, 2 * int(512 * 4 * 2 / 3))


# ---------------------------------------------------------------------------
# conv position embed
# ---------------------------------------------------------------------------


class TestConvPositionEmbed:
    def test_parity_with_mask(self):
        from voicebox_tpu.models.primitives import ConvPositionEmbed

        dim, k, b, n = 8, 7, 2, 20
        rs = np.random.RandomState(7)
        x = rs.randn(b, n, dim).astype(np.float32)
        w = rs.randn(dim, 1, k).astype(np.float32) * 0.2  # torch (out, in/g, k)
        bias = rs.randn(dim).astype(np.float32) * 0.1
        mask = np.ones((b, n), bool)
        mask[0, 15:] = False

        # reference: zero masked frames, depthwise Conv1d(padding=k//2), GELU,
        # zero masked frames again (voicebox_pytorch.py:203-233); tanh GELU
        # per the documented deviation.
        xt = _t(x) * _t(mask.astype(np.float32))[..., None]
        conv = F.conv1d(xt.transpose(1, 2), _t(w), _t(bias), padding=k // 2, groups=dim)
        act = F.gelu(conv.transpose(1, 2), approximate="tanh")
        expected = (act * _t(mask.astype(np.float32))[..., None]).numpy()

        # flax depthwise kernel layout: (k, in/groups, out) = transpose of torch
        kernel = jnp.asarray(np.transpose(w, (2, 1, 0)))
        params = {"dw_conv1d": {"kernel": kernel, "bias": jnp.asarray(bias)}}
        out = ConvPositionEmbed(dim=dim, kernel_size=k).apply(
            {"params": params}, jnp.asarray(x), mask=jnp.asarray(mask)
        )
        np.testing.assert_allclose(_np(out), expected, atol=ATOL)


# ---------------------------------------------------------------------------
# attention (Attend scale semantics)
# ---------------------------------------------------------------------------


def _torch_attention(x, wqkv, wout, h, d, mask, rotary, qk_gammas, scale):
    """The reference Attention + Attend math (voicebox_pytorch.py:289-333;
    attend.py:100-137): fused qkv, optional per-head qk RMSNorm, rotary,
    sim = q·k * scale, key-padding mask b j -> b 1 1 j, softmax, out proj."""
    b, n, _ = x.shape
    qkv = x @ wqkv
    q, k, v = qkv.chunk(3, dim=-1)
    q, k, v = (t.reshape(b, n, h, d).permute(0, 2, 1, 3) for t in (q, k, v))
    if qk_gammas is not None:
        qg, kg = qk_gammas
        q = F.normalize(q, dim=-1) * qg * (d**0.5)
        k = F.normalize(k, dim=-1) * kg * (d**0.5)
    if rotary is not None:
        def rot(t):
            t1, t2 = t.chunk(2, dim=-1)
            return t * rotary.cos() + torch.cat([-t2, t1], dim=-1) * rotary.sin()

        q, k = rot(q), rot(k)
    sim = torch.einsum("bhid,bhjd->bhij", q, k) * scale
    if mask is not None:
        m = mask[:, None, None, :]
        sim = sim.masked_fill(~m, -torch.finfo(sim.dtype).max)
    attn = sim.softmax(dim=-1)
    out = torch.einsum("bhij,bhjd->bhid", attn, v)
    out = out.permute(0, 2, 1, 3).reshape(b, n, h * d)
    return out @ wout


class TestAttention:
    @pytest.mark.parametrize("qk_norm", [False, True])
    @pytest.mark.parametrize("with_mask", [False, True])
    def test_parity(self, qk_norm, with_mask):
        from voicebox_tpu.models.attention import Attention
        from voicebox_tpu.models.primitives import rotary_frequencies

        dim, h, d, b, n = 32, 2, 16, 2, 10
        rs = np.random.RandomState(8 + qk_norm)
        x = rs.randn(b, n, dim).astype(np.float32)
        wqkv = (rs.randn(dim, 3 * h * d) / math.sqrt(dim)).astype(np.float32)
        wout = (rs.randn(h * d, dim) / math.sqrt(h * d)).astype(np.float32)
        qg = rs.randn(h, 1, d).astype(np.float32)
        kg = rs.randn(h, 1, d).astype(np.float32)
        mask = None
        if with_mask:
            mask = np.ones((b, n), bool)
            mask[1, 6:] = False

        rotary = rotary_frequencies(jnp.arange(n, dtype=jnp.float32), d)
        rotary_t = _t(_np(rotary))

        # reference scale semantics: fixed 10 under qk_norm, else d^-0.5
        # (voicebox_pytorch.py:304-306; attend.py:111)
        scale = 10.0 if qk_norm else d**-0.5
        expected = _torch_attention(
            _t(x), _t(wqkv), _t(wout), h, d,
            torch.from_numpy(mask) if mask is not None else None,
            rotary_t, (_t(qg), _t(kg)) if qk_norm else None, scale,
        ).numpy()

        params = {
            "to_qkv": {"kernel": jnp.asarray(wqkv)},
            "to_out": {"kernel": jnp.asarray(wout)},
        }
        if qk_norm:
            params["q_norm"] = {"gamma": jnp.asarray(qg)}
            params["k_norm"] = {"gamma": jnp.asarray(kg)}
        out = Attention(dim=dim, dim_head=d, heads=h, qk_norm=qk_norm).apply(
            {"params": params}, jnp.asarray(x),
            mask=jnp.asarray(mask) if mask is not None else None,
            rotary_emb=rotary,
        )
        # padded queries attend to garbage rows in both frameworks; compare
        # valid positions only (the reference masks them downstream via loss)
        valid = mask if mask is not None else np.ones((b, n), bool)
        np.testing.assert_allclose(
            _np(out)[valid], expected[valid], atol=5e-5
        )


# ---------------------------------------------------------------------------
# CFM objective + ODE solver
# ---------------------------------------------------------------------------


class TestCFMParity:
    @pytest.mark.parametrize("sigma", [0.0, 0.1])
    def test_interpolant_and_flow(self, sigma):
        from voicebox_tpu.ops.ode import cfm_interpolant

        rs = np.random.RandomState(10)
        x1 = rs.randn(4, 6, 8).astype(np.float32)
        x0 = rs.randn(4, 6, 8).astype(np.float32)
        times = rs.rand(4).astype(np.float32)

        # reference: w = (1-(1-σ)t) x0 + t x1; flow = x1 - (1-σ) x0
        # (voicebox_pytorch.py:1397-1410)
        t = _t(times)[:, None, None]
        w_ref = (1 - (1 - sigma) * t) * _t(x0) + t * _t(x1)
        flow_ref = _t(x1) - (1 - sigma) * _t(x0)

        w, flow = cfm_interpolant(jnp.asarray(x1), jnp.asarray(x0), jnp.asarray(times), sigma)
        np.testing.assert_allclose(_np(w), w_ref.numpy(), atol=ATOL)
        np.testing.assert_allclose(_np(flow), flow_ref.numpy(), atol=ATOL)

    def test_midpoint_trajectory(self):
        """Fixed-grid explicit midpoint vs a torch re-statement of
        torchdiffeq's midpoint scheme (y' = f(t + h/2, y + h/2 f(t, y)));
        the reference integrates linspace(0, 1, steps)
        (voicebox_pytorch.py:1290-1296)."""
        from voicebox_tpu.ops.ode import odeint

        rs = np.random.RandomState(11)
        A = (rs.randn(8, 8) * 0.3).astype(np.float32)
        y0 = rs.randn(2, 8).astype(np.float32)
        steps = 5
        times = np.linspace(0.0, 1.0, steps).astype(np.float32)

        def f_t(t, y):
            return y @ _t(A).T * (1.0 + t)

        ys = [_t(y0)]
        y = _t(y0)
        for i in range(steps - 1):
            t0, t1 = float(times[i]), float(times[i + 1])
            h = t1 - t0
            k1 = f_t(t0, y)
            y = y + h * f_t(t0 + h / 2, y + (h / 2) * k1)
            ys.append(y)
        expected = torch.stack(ys).numpy()

        def f_j(t, y):
            return y @ jnp.asarray(A).T * (1.0 + t)

        y_final, traj = odeint(f_j, jnp.asarray(y0), jnp.asarray(times), method="midpoint")
        np.testing.assert_allclose(_np(traj), expected, atol=5e-5)
        np.testing.assert_allclose(_np(y_final), expected[-1], atol=5e-5)
