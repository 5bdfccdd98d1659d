"""Reference-format checkpoint EXPORT — migrate a TPU-trained model BACK.

`utils/port_weights.py::export_*` invert the `load_*` ports: flax param
trees -> reference-layout torch state dicts (voicebox_pytorch.py:905-970
VoiceBox, :596-693 DurationPredictor, :353-406 Transformer), plus a torch
`AdamW.state_dict()` built from optax Adam moments so the REFERENCE trainer
(trainer.py:199-207) resumes a run trained here. Proven here:

* load∘export and export∘load are identities (param trees / fixture dicts),
* the exported dict reproduces the flax forward through the independent
  torch restatement of the reference math (test_port_voicebox),
* key ORDER matches the reference module's genuine `state_dict()` order —
  load-bearing for optimizer param indices,
* the exported optimizer state loads into a GENUINE `torch.optim.AdamW`
  (real torch validates the format) and round-trips through our own
  `load_optimizer_torch`,
* trainer-level: `save_torch` -> `load_torch` restores params, moments, and
  the step counter exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

import test_port_voicebox as tpv
from voicebox_tpu import VoiceBox
from voicebox_tpu.models.cfm import ConditionalFlowMatcherWrapper
from voicebox_tpu.models.duration import DurationPredictor
from voicebox_tpu.utils.port_weights import (
    export_duration_predictor_torch,
    export_optimizer_torch,
    export_voicebox_torch,
    load_duration_predictor_torch,
    load_optimizer_torch,
    load_voicebox_torch,
    rotary_inv_freq,
    save_reference_checkpoint,
)


def _random_like(tree, seed=0, scale=0.2):
    """Randomise every leaf — zero-init leaves (adaptive-norm Linears) must
    not mask transpose/layout bugs."""
    leaves, treedef = jax.tree.flatten(tree)
    rs = np.random.RandomState(seed)
    leaves = [
        jnp.asarray(rs.randn(*np.shape(l)).astype(np.float32) * scale)
        for l in leaves
    ]
    return jax.tree.unflatten(treedef, leaves)


def _vb_and_params(seed=0):
    vb = tpv._flax_model()
    return vb, _random_like(tpv._template(vb), seed=seed)


def _assert_trees_equal(a, b, atol=0.0):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=atol)


class TestVoiceboxExport:
    def test_load_then_export_is_identity_on_reference_dict(self):
        """export(load(sd)) returns every fixture tensor bit-exactly; the
        only ADDED key is the synthesised rotary buffer."""
        sd = tpv._reference_state_dict()
        vb = tpv._flax_model()
        params = load_voicebox_torch(sd, tpv._template(vb))
        out = export_voicebox_torch(params, dim_head=tpv.DIM_HEAD)

        assert set(out) - set(sd) == {"transformer.rotary_emb.inv_freq"}
        assert set(sd) - set(out) == set()
        for k, v in sd.items():
            np.testing.assert_array_equal(out[k], v.numpy(), err_msg=k)

    def test_export_then_load_is_identity_on_flax_params(self):
        vb, params = _vb_and_params()
        out = export_voicebox_torch(params, dim_head=tpv.DIM_HEAD)
        params2 = load_voicebox_torch(out, tpv._template(vb))
        _assert_trees_equal(params, params2)

    def test_exported_forward_matches_flax(self):
        """The torch restatement of the reference forward, run ON the
        exported dict, reproduces the flax model's output."""
        vb, params = _vb_and_params(seed=5)
        sd = {
            k: torch.from_numpy(np.array(v, copy=True))
            for k, v in export_voicebox_torch(params, dim_head=tpv.DIM_HEAD).items()
        }

        b, n = 2, 32
        rs = np.random.RandomState(11)
        x = rs.randn(b, n, tpv.DIM_IN).astype(np.float32)
        cond = rs.randn(b, n, tpv.DIM_IN).astype(np.float32)
        times = rs.rand(b).astype(np.float32)
        ids = rs.randint(0, tpv.N_COND_TOKENS, (b, n)).astype(np.int32)
        mask = rs.rand(b, n) < 0.5

        ours = vb.apply(
            {"params": params}, jnp.asarray(x), times=jnp.asarray(times),
            cond=jnp.asarray(cond), cond_token_ids=jnp.asarray(ids),
            cond_mask=jnp.asarray(mask), cond_drop_prob=0.0, train=False,
        )
        ref = tpv._torch_forward(
            sd, torch.from_numpy(x), torch.from_numpy(times),
            torch.from_numpy(cond), torch.from_numpy(ids.astype(np.int64)),
            torch.from_numpy(mask),
        )
        np.testing.assert_allclose(
            np.asarray(ours), ref.numpy(), atol=2e-4, rtol=1e-3
        )

    def test_state_dict_key_order(self):
        """Key order must equal the reference module's `state_dict()` order
        (own params first, then children in assignment order —
        voicebox_pytorch.py:905-970 VoiceBox, :375-406 Transformer, Attention
        registers q/k norms before to_qkv/to_out :310-315): torch optimizer
        indices follow `parameters()` in exactly this order."""
        _, params = _vb_and_params()
        out = export_voicebox_torch(params, dim_head=tpv.DIM_HEAD)

        expected = [
            "null_cond",
            "sinu_pos_emb.0.weights",
            "sinu_pos_emb.1.weight",
            "sinu_pos_emb.1.bias",
            "to_cond_emb.weight",
            "to_embed.weight",
            "to_embed.bias",
            "conv_embed.dw_conv1d.0.weight",
            "conv_embed.dw_conv1d.0.bias",
            "transformer.register_tokens",
        ]
        # NB: no `layers.{i}.0` skip combiners — `use_unet_skip_connection`
        # defaults False and VoiceBox never enables it
        # (voicebox_pytorch.py:368,949-962); the conditional emit is
        # exercised structurally by the roundtrip tests
        for i in range(tpv.DEPTH):
            lp = f"transformer.layers.{i}"
            expected += [
                f"{lp}.2.to_gamma.weight", f"{lp}.2.to_gamma.bias",
                f"{lp}.2.to_beta.weight", f"{lp}.2.to_beta.bias",
                f"{lp}.3.q_norm.gamma", f"{lp}.3.k_norm.gamma",
                f"{lp}.3.to_qkv.weight", f"{lp}.3.to_out.weight",
                f"{lp}.4.to_gamma.weight", f"{lp}.4.to_gamma.bias",
                f"{lp}.4.to_beta.weight", f"{lp}.4.to_beta.bias",
                f"{lp}.5.0.weight", f"{lp}.5.0.bias",
                f"{lp}.5.3.weight", f"{lp}.5.3.bias",
            ]
        expected += [
            "transformer.rotary_emb.inv_freq",
            "transformer.final_norm.gamma",
            "to_pred.weight",
        ]
        assert list(out) == expected

    def test_inv_freq_buffer(self):
        np.testing.assert_allclose(
            rotary_inv_freq(16),
            1.0 / (50000.0 ** (np.arange(0, 16, 2, dtype=np.float32) / 16)),
        )
        # dim_head inferred from qk-norm gammas when omitted
        _, params = _vb_and_params()
        out = export_voicebox_torch(params)
        assert out["transformer.rotary_emb.inv_freq"].shape == (tpv.DIM_HEAD // 2,)

    def test_cfm_save_torch_roundtrip(self, tmp_path):
        vb = tpv._flax_model()
        cfm = ConditionalFlowMatcherWrapper(vb)
        cfm.init_params(jax.random.PRNGKey(0), seq_len=32, batch=2)
        cfm.params = _random_like(cfm.params, seed=9)
        path = tmp_path / "voicebox.0.pt"
        pkg = cfm.save_torch(str(path))
        assert set(pkg) == {"model", "optim", "scheduler"}
        assert pkg["optim"] == {} and pkg["scheduler"] == {}
        assert all(k.startswith("voicebox.") for k in pkg["model"])

        cfm2 = ConditionalFlowMatcherWrapper(tpv._flax_model())
        cfm2.init_params(jax.random.PRNGKey(1), seq_len=32, batch=2)
        cfm2.load_torch(str(path))
        _assert_trees_equal(cfm.params, cfm2.params)


class TestDurationPredictorExport:
    def _dp(self, seed):
        dp = DurationPredictor(
            num_phoneme_tokens=40, dim_phoneme_emb=32, dim=48, depth=2,
            dim_head=16, heads=2, attn_qk_norm=True,
        )
        dp.init_params(jax.random.PRNGKey(0), seq_len=20, n_phonemes=8, batch=2)
        dp.params = _random_like(dp.params, seed=seed)
        return dp

    def test_save_torch_roundtrip(self, tmp_path):
        dp = self._dp(seed=3)
        path = tmp_path / "duration.pt"
        pkg = dp.save_torch(str(path))
        assert "aligner" not in " ".join(pkg["model"])  # not exported
        assert pkg["model"]["null_cond"].shape == (48,)  # zeros(dim), :653

        dp2 = self._dp(seed=4)
        aligner_before = dp2.params["aligner"]
        dp2.load_torch(str(path))
        for key in ("to_phoneme_emb", "to_embed", "conv_embed",
                    "transformer", "to_pred"):
            _assert_trees_equal(dp.params[key], dp2.params[key])
        # the aligner (training-targets-only) is untouched by design
        _assert_trees_equal(aligner_before, dp2.params["aligner"])

    def test_wrapper_prefix(self, tmp_path):
        dp = self._dp(seed=6)
        pkg = dp.save_torch(str(tmp_path / "d.pt"), prefix="duration_predictor.")
        assert all(k.startswith("duration_predictor.") for k in pkg["model"])


class TestOptimizerExport:
    def _export_all(self, params, mu, nu, count, lr, wd):
        def vb(tree):
            return {
                f"voicebox.{k}": v
                for k, v in export_voicebox_torch(
                    tree, dim_head=tpv.DIM_HEAD
                ).items()
            }

        model = vb(params)
        return model, export_optimizer_torch(
            model, vb(mu), vb(nu), count, lr=lr, wd=wd
        )

    def test_roundtrip_through_our_loader(self):
        _, params = _vb_and_params()
        mu = _random_like(params, seed=21, scale=0.01)
        nu = jax.tree.map(lambda p: jnp.abs(p), _random_like(params, seed=22, scale=0.01))
        model, optim = self._export_all(params, mu, nu, 123, lr=2e-4, wd=1e-2)

        pkg = {"model": model, "optim": optim}
        mu2, nu2, count2 = load_optimizer_torch(
            pkg, jax.tree.map(lambda p: p, params)
        )
        assert count2 == 123
        _assert_trees_equal(mu, mu2, atol=1e-7)
        _assert_trees_equal(nu, nu2, atol=1e-7)

    def test_loads_into_genuine_torch_adamw(self, tmp_path):
        """The exported state dict is accepted by real torch.optim.AdamW —
        the format the reference trainer's resume consumes
        (trainer.py:199-207) — and the optimizer steps afterwards."""
        _, params = _vb_and_params(seed=2)
        mu = _random_like(params, seed=31, scale=0.01)
        nu = jax.tree.map(lambda p: jnp.abs(p),
                          _random_like(params, seed=32, scale=0.01))
        lr, wd = 3e-4, 1e-2
        model, optim_sd = self._export_all(params, mu, nu, 7, lr=lr, wd=wd)
        path = tmp_path / "voicebox.7.pt"
        save_reference_checkpoint(str(path), model, optim_sd)
        pkg = torch.load(str(path), weights_only=False)

        # reference get_optimizer grouping: [ndim>=2 decayed, ndim<2 not]
        names = [k for k in model
                 if not k.endswith("rotary_emb.inv_freq")]
        g1 = [k for k in names if model[k].ndim >= 2]
        g2 = [k for k in names if model[k].ndim < 2]
        tparams = {
            k: torch.nn.Parameter(torch.from_numpy(np.array(model[k])))
            for k in g1 + g2
        }
        opt = torch.optim.AdamW(
            [
                {"params": [tparams[k] for k in g1], "weight_decay": wd},
                {"params": [tparams[k] for k in g2], "weight_decay": 0.0},
            ],
            lr=lr, betas=(0.9, 0.99), eps=1e-8,
        )
        opt.load_state_dict(pkg["optim"])

        # moments restored bit-exactly at the right indices
        st = opt.state[tparams[g1[0]]]
        mu_sd = {f"voicebox.{k}": v for k, v in export_voicebox_torch(
            mu, dim_head=tpv.DIM_HEAD).items()}
        np.testing.assert_allclose(
            st["exp_avg"].numpy(), mu_sd[g1[0]], atol=0
        )
        assert float(st["step"]) == 7.0
        # frozen null_cond occupies an index but carries no state
        assert tparams["voicebox.null_cond"] not in opt.state

        # and the optimizer actually steps
        for p in tparams.values():
            p.grad = torch.zeros_like(p)
        opt.step()

    def test_trainer_save_torch_resumes_here(self, tmp_path, rng):
        """Full loop at trainer level: train 2 steps -> save_torch ->
        load_torch into a FRESH trainer restores params, Adam moments, and
        the step counter exactly (the same loader that was validated against
        genuine reference checkpoints in test_port_optim.py)."""
        from voicebox_tpu.training.data import ArrayDataset
        from voicebox_tpu.training.optimizer import adam_state_from_opt_state
        from voicebox_tpu.training.trainer import VoiceBoxTrainer

        def mk():
            vb = VoiceBox(
                dim_in=8, dim=32, depth=2, dim_head=8, heads=4,
                num_register_tokens=2, attn_qk_norm=True,
                condition_on_text=False,
            )
            cfm = ConditionalFlowMatcherWrapper(vb)
            cfm.init_params(jax.random.PRNGKey(0), seq_len=16, batch=2)
            return cfm

        data = [
            np.random.RandomState(i).randn(30, 8).astype(np.float32)
            for i in range(8)
        ]
        tr = VoiceBoxTrainer(
            mk(), batch_size=2, dataset=ArrayDataset(data),
            num_train_steps=2, valid_frac=0.25, wd=1e-2,
            results_folder=str(tmp_path / "r1"), use_mesh=False,
            bucket_multiple=16,
        )
        tr.train()
        assert tr.steps == 2
        path = tmp_path / "voicebox.2.pt"
        tr.save_torch(str(path))

        tr2 = VoiceBoxTrainer(
            mk(), batch_size=2, dataset=ArrayDataset(data),
            num_train_steps=2, valid_frac=0.25, wd=1e-2,
            results_folder=str(tmp_path / "r2"), use_mesh=False,
            bucket_multiple=16,
        )
        tr2.load_torch(str(path))
        assert tr2.steps == 2
        _assert_trees_equal(tr.params, tr2.params, atol=1e-7)
        mu1, nu1, c1 = adam_state_from_opt_state(tr.opt_state)
        mu2, nu2, c2 = adam_state_from_opt_state(tr2.opt_state)
        assert c1 == c2 == 2
        _assert_trees_equal(mu1, mu2, atol=1e-7)
        _assert_trees_equal(nu1, nu2, atol=1e-7)
