"""Tests for MAS (maximum_path) and the forward-sum loss: parity against
brute-force / numpy dynamic programming references."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from voicebox_tpu.ops.forward_sum import forward_sum_loss
from voicebox_tpu.ops.mas import maximum_path


def _mas_numpy(value, x_len, y_len):
    """Reference DP (glow-tts style), single sample."""
    v = np.full((x_len, y_len), -1e9)
    for j in range(y_len):
        for i in range(max(0, x_len + j - y_len), min(x_len, j + 1)):
            stay = v[i, j - 1] if (j > 0 and i <= j - 1) else -1e9
            adv = v[i - 1, j - 1] if (i > 0 and j > 0) else -1e9
            prev = 0.0 if (i == 0 and j == 0) else max(stay, adv)
            v[i, j] = prev + value[i, j]
    path = np.zeros((x_len, y_len), dtype=bool)
    index = x_len - 1
    for j in reversed(range(y_len)):
        path[index, j] = True
        if index > 0 and j > 0 and (index == j or v[index, j - 1] < v[index - 1, j - 1]):
            index -= 1
    return path


def _lens_to_mask(x_lens, y_lens, t_x, t_y):
    mx = np.arange(t_x)[None, :] < np.asarray(x_lens)[:, None]
    my = np.arange(t_y)[None, :] < np.asarray(y_lens)[:, None]
    return mx[:, :, None] & my[:, None, :]


class TestMaximumPath:
    def test_matches_numpy_dp(self, rng):
        t_x, t_y = 6, 14
        x_lens, y_lens = [6, 4, 3], [14, 10, 3]
        value = np.asarray(jax.random.normal(rng, (3, t_x, t_y)))
        mask = _lens_to_mask(x_lens, y_lens, t_x, t_y)
        path = np.asarray(maximum_path(jnp.asarray(value), jnp.asarray(mask)))
        for i, (xl, yl) in enumerate(zip(x_lens, y_lens)):
            expected = _mas_numpy(value[i], xl, yl)
            np.testing.assert_array_equal(
                path[i, :xl, :yl], expected, err_msg=f"sample {i}"
            )
            assert not path[i, xl:, :].any() and not path[i, :, yl:].any()

    def test_path_properties(self, rng):
        t_x, t_y = 5, 12
        value = jax.random.normal(rng, (2, t_x, t_y))
        mask = jnp.asarray(_lens_to_mask([5, 5], [12, 12], t_x, t_y))
        path = np.asarray(maximum_path(value, mask))
        # every frame assigned exactly one phoneme
        assert (path.sum(axis=1) == 1).all()
        # durations sum to the number of frames, every phoneme gets >= 1
        durations = path.sum(axis=-1)
        assert (durations.sum(-1) == 12).all()
        assert (durations >= 1).all()
        # monotonic: assigned phoneme index is nondecreasing over frames
        idx = path.argmax(axis=1)
        assert (np.diff(idx, axis=-1) >= 0).all()

    def test_jit(self, rng):
        value = jax.random.normal(rng, (1, 4, 8))
        mask = jnp.ones((1, 4, 8), dtype=bool)
        p1 = maximum_path(value, mask)
        p2 = jax.jit(maximum_path)(value, mask)
        np.testing.assert_array_equal(p1, p2)


class TestForwardSum:
    def test_matches_torch_ctc(self, rng):
        """Exact parity with the reference ForwardSumLoss recipe
        (naturalspeech2: blank column at logit -1, log_softmax over keys,
        torch CTCLoss(blank=0, zero_infinity=True, reduction='mean'))."""
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        b, t_mel, t_ph = 3, 10, 4
        logits = np.asarray(
            jax.random.normal(rng, (b, t_mel, t_ph))
        ).astype(np.float32)
        key_lens = np.array([4, 3, 2])
        query_lens = np.array([10, 8, 5])

        loss = forward_sum_loss(
            jnp.asarray(logits), jnp.asarray(key_lens), jnp.asarray(query_lens)
        )

        attn = torch.from_numpy(logits)
        attn = F.pad(attn, (1, 0), value=-1.0)  # blank col 0 at logit -1
        mask = (
            torch.arange(t_ph + 1)[None, None, :]
            > torch.as_tensor(key_lens)[:, None, None]
        )
        attn = attn.masked_fill(mask, -1e9)
        attn = attn.log_softmax(dim=-1).permute(1, 0, 2)  # (T, b, K+1)
        targets = torch.arange(1, t_ph + 1)[None, :].repeat(b, 1)
        expected = F.ctc_loss(
            attn, targets, torch.as_tensor(query_lens),
            torch.as_tensor(key_lens), blank=0, reduction="mean",
            zero_infinity=True,
        )
        np.testing.assert_allclose(float(loss), float(expected), rtol=1e-4)

    def test_impossible_alignment_zero_not_inf(self):
        # key_len > query_len cannot align; zero_infinity semantics -> 0
        lp = jnp.zeros((1, 2, 5))
        loss = forward_sum_loss(lp, jnp.array([5]), jnp.array([2]))
        assert float(loss) == 0.0

    def test_perfect_alignment_low_loss(self):
        # diagonal-concentrated logprobs -> low loss; uniform -> higher
        t_mel, t_ph = 8, 4
        sharp = np.full((1, t_mel, t_ph), -10.0)
        for t in range(t_mel):
            sharp[0, t, min(t // 2, t_ph - 1)] = 0.0
        uniform = np.zeros((1, t_mel, t_ph))
        kl = jnp.array([t_ph])
        ql = jnp.array([t_mel])
        l_sharp = forward_sum_loss(jnp.asarray(sharp), kl, ql)
        l_uniform = forward_sum_loss(jnp.asarray(uniform), kl, ql)
        assert l_sharp < l_uniform

    def test_grad_flows(self, rng):
        logits = jax.random.normal(rng, (2, 6, 3))
        g = jax.grad(
            lambda lp: forward_sum_loss(lp, jnp.array([3, 3]), jnp.array([6, 6]))
        )(logits)
        assert jnp.isfinite(g).all()
        assert jnp.abs(g).max() > 0
