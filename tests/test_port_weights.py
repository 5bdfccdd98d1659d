"""Numerical parity tests for torch -> flax weight conversion rules: each
converted layer must produce the same outputs as its torch counterpart."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from flax import linen as nn

from voicebox_tpu.utils.port_weights import (
    _split_torch_lstm,
    fuse_weight_norm,
    torch_conv1d_to_flax,
    torch_convtranspose1d_to_flax,
    torch_linear_to_dense,
)


class _Opaque:  # module-level so pickle can round-trip it; not allowlisted
    pass         # by torch's weights_only=True unpickler


class TestSafeCheckpointLoading:
    """r4 weak #6: `load_torch_state_dict` must try the code-free
    `weights_only=True` unpickler first — plain-tensor checkpoints (every
    checkpoint this framework or the reference trainer writes) never
    execute pickled code; only object-carrying checkpoints fall back, with
    a loud warning naming the file."""

    def test_plain_tensors_load_without_warning(self, tmp_path):
        import warnings

        import torch

        from voicebox_tpu.utils.port_weights import load_torch_state_dict

        path = tmp_path / "plain.pt"
        torch.save({"w": torch.ones(2, 3), "b": torch.zeros(3)}, path)
        with warnings.catch_warnings():
            warnings.simplefilter("error")  # any warning fails the test
            sd = load_torch_state_dict(str(path))
        assert sd["w"].shape == (2, 3)

    def test_object_checkpoint_warns_on_fallback(self, tmp_path):
        import pytest as _pytest
        import torch

        from voicebox_tpu.utils.port_weights import load_torch_state_dict

        path = tmp_path / "objects.pt"
        torch.save({"w": torch.ones(2), "meta": _Opaque()}, path)
        with _pytest.warns(UserWarning, match="weights_only"):
            sd = load_torch_state_dict(str(path))
        assert sd["w"].shape == (2,)


class TestLayerConversions:
    def test_linear(self):
        tl = torch.nn.Linear(6, 4)
        x = torch.randn(2, 6)
        expected = tl(x).detach().numpy()

        kernel = torch_linear_to_dense(tl.weight.detach().numpy())
        out = np.asarray(x.numpy() @ kernel + tl.bias.detach().numpy())
        np.testing.assert_allclose(out, expected, atol=1e-5)

    def test_conv1d(self):
        tc = torch.nn.Conv1d(3, 5, kernel_size=4)
        x = torch.randn(2, 3, 10)
        expected = tc(x).detach().numpy()  # (2, 5, 7) NCW

        mod = nn.Conv(5, kernel_size=(4,), padding="VALID")
        params = {
            "params": {
                "kernel": jnp.asarray(torch_conv1d_to_flax(tc.weight.detach().numpy())),
                "bias": jnp.asarray(tc.bias.detach().numpy()),
            }
        }
        out = mod.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 1)))  # NLC
        np.testing.assert_allclose(
            np.asarray(out).transpose(0, 2, 1), expected, atol=1e-5
        )

    def test_convtranspose1d(self):
        tc = torch.nn.ConvTranspose1d(3, 5, kernel_size=4, stride=2)
        x = torch.randn(2, 3, 6)
        expected = tc(x).detach().numpy()

        mod = nn.ConvTranspose(5, kernel_size=(4,), strides=(2,), padding="VALID")
        params = {
            "params": {
                "kernel": jnp.asarray(
                    torch_convtranspose1d_to_flax(tc.weight.detach().numpy()).copy()
                ),
                "bias": jnp.asarray(tc.bias.detach().numpy()),
            }
        }
        out = mod.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 1)))
        np.testing.assert_allclose(
            np.asarray(out).transpose(0, 2, 1), expected, atol=1e-5
        )

    def test_weight_norm_fuse(self):
        conv = torch.nn.Conv1d(3, 5, kernel_size=3)
        wn = torch.nn.utils.weight_norm(conv)
        fused = fuse_weight_norm(
            wn.weight_g.detach().numpy(), wn.weight_v.detach().numpy()
        )
        np.testing.assert_allclose(fused, wn.weight.detach().numpy(), atol=1e-6)

    def test_lstm_layer(self):
        h, d = 8, 6
        tl = torch.nn.LSTM(d, h, num_layers=1, batch_first=True)
        x = torch.randn(2, 12, d)
        expected, _ = tl(x)
        expected = expected.detach().numpy()

        sd = {f"p.{k}": v.detach().numpy() for k, v in tl.state_dict().items()}
        cell_params = _split_torch_lstm(sd, "p", 0)

        rnn = nn.RNN(nn.OptimizedLSTMCell(h))
        out = rnn.apply({"params": {"cell": cell_params}}, jnp.asarray(x.numpy()))
        np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)
