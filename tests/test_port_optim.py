"""Optimizer-state migration from the reference build.

The reference trainer checkpoint carries `{'model', 'optim', 'scheduler'}`
and its `.load` restores all three (reference trainer.py:191-207) — so a
faithful migration must carry the AdamW moments and step counter too, not
just the weights. `utils/port_weights.load_optimizer_torch` reconstructs the
torch param-index -> name map from the reference's get_optimizer grouping
(reference optimizer.py:3-35: [ndim>=2 decayed, ndim<2 no-decay] in
parameters() order, no requires_grad filter) and ports exp_avg/exp_avg_sq
through the SAME layout mapping as the weights (Adam is elementwise: moments
transform exactly like their params).

The strong test here is cross-framework step equivalence: run N torch AdamW
steps (reference grouping + the reference's clip_grad_norm_(0.5)), port
params + moments + count, then take one MORE step on each side with the same
gradients — the parameter trees must match to f32 tolerance. That validates
the index alignment, the transposes, the wd mask partition, the bias
correction counter, and the clip semantics all at once.
"""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from test_port_voicebox import _flax_model, _reference_state_dict, _template
from voicebox_tpu.training.optimizer import get_optimizer, restore_adam_state
from voicebox_tpu.utils.port_weights import (
    load_optimizer_torch,
    load_voicebox_torch,
)

LR, WD, CLIP = 1e-3, 1e-2, 0.5


def _prefixed(sd):
    return {f"voicebox.{k}": v for k, v in sd.items()}


def _uncond_state_dict(seed=0):
    """Reference layout WITHOUT text conditioning (condition_on_text=False:
    no to_cond_emb, to_embed takes cat(x, cond) only)."""
    sd = _reference_state_dict(seed)
    del sd["to_cond_emb.weight"]
    rs = np.random.RandomState(seed + 7)
    dim, _ = sd["to_embed.weight"].shape
    dim_in = sd["null_cond"].shape[0]
    sd["to_embed.weight"] = torch.from_numpy(
        rs.randn(dim, 2 * dim_in).astype(np.float32) * 0.2
    )
    return sd


class _TorchRun:
    """Reference-semantics AdamW over a reference-layout state dict."""

    def __init__(self, seed=0, sd=None):
        sd = _reference_state_dict(seed) if sd is None else sd
        self.params = {
            k: torch.nn.Parameter(
                v.clone().float(), requires_grad="null_cond" not in k
            )
            for k, v in sd.items()
        }
        wd_p = [p for p in self.params.values() if p.ndim >= 2]
        nd_p = [p for p in self.params.values() if p.ndim < 2]
        # reference get_optimizer (optimizer.py:10-35): two groups, the
        # second with weight_decay 0; betas (0.9, 0.99), eps 1e-8
        self.optim = torch.optim.AdamW(
            [{"params": wd_p}, {"params": nd_p, "weight_decay": 0}],
            lr=LR, betas=(0.9, 0.99), eps=1e-8, weight_decay=WD,
        )
        self._rs = np.random.RandomState(seed + 100)

    def make_grads(self):
        return {
            k: self._rs.randn(*p.shape).astype(np.float32) * 0.01
            for k, p in self.params.items()
            if p.requires_grad
        }

    def step(self, grads):
        live = []
        for k, p in self.params.items():
            if not p.requires_grad:
                continue
            p.grad = torch.from_numpy(grads[k].copy())
            live.append(p)
        # the reference clips BEFORE the step (trainer.py:274-275)
        torch.nn.utils.clip_grad_norm_(live, CLIP)
        self.optim.step()
        self.optim.zero_grad(set_to_none=True)

    def pkg(self):
        model = {k: p.detach().clone() for k, p in self.params.items()}
        # a registered buffer: present in state_dict, NOT in the optimizer
        # index space (reference voicebox_pytorch.py:176)
        model["transformer.rotary_emb.inv_freq"] = torch.zeros(8)
        return {
            "model": _prefixed(model),
            "optim": self.optim.state_dict(),
            "scheduler": {},
        }


@pytest.fixture(scope="module")
def run3(tmp_path_factory):
    """3 torch steps -> saved checkpoint (+ the run object for continuing)."""
    run = _TorchRun()
    for _ in range(3):
        run.step(run.make_grads())
    path = tmp_path_factory.mktemp("ckpt") / "voicebox.3.pt"
    torch.save(run.pkg(), str(path))
    return run, str(path)


def test_accepts_pathlike(run3):
    """A pathlib.Path is the idiomatic way to hold a checkpoint path — it
    must torch.load like a str, not be mistaken for an in-memory pkg dict."""
    from pathlib import Path

    run, path = run3
    template = _template(_flax_model())
    mu, nu, count = load_optimizer_torch(Path(path), template)
    assert count == 3


def test_moment_port_mapping_exact(run3):
    """Ported mu/nu leaves equal the torch exp_avg/exp_avg_sq under the same
    layout transposes as the weights (checked against torch's state keyed by
    Parameter object — independent of the loader's index reconstruction)."""
    run, path = run3
    template = _template(_flax_model())
    mu, nu, count = load_optimizer_torch(path, template)
    assert count == 3

    def torch_state(name):
        return run.optim.state[run.params[name]]

    np.testing.assert_allclose(
        np.asarray(mu["to_embed"]["kernel"]),
        torch_state("to_embed.weight")["exp_avg"].numpy().T,
        rtol=0, atol=0,
    )
    np.testing.assert_allclose(
        np.asarray(nu["to_embed"]["kernel"]),
        torch_state("to_embed.weight")["exp_avg_sq"].numpy().T,
        rtol=0, atol=0,
    )
    np.testing.assert_allclose(
        np.asarray(mu["conv_embed"]["dw_conv1d"]["kernel"]),
        np.transpose(
            torch_state("conv_embed.dw_conv1d.0.weight")["exp_avg"].numpy(),
            (2, 1, 0),
        ),
        rtol=0, atol=0,
    )
    np.testing.assert_allclose(
        np.asarray(mu["to_cond_emb"]["embedding"]),
        torch_state("to_cond_emb.weight")["exp_avg"].numpy(),
        rtol=0, atol=0,
    )
    # a no-decay-group (ndim<2) leaf — exercises the second index block
    np.testing.assert_allclose(
        np.asarray(mu["transformer"]["final_norm"]["gamma"]),
        torch_state("transformer.final_norm.gamma")["exp_avg"].numpy(),
        rtol=0, atol=0,
    )


def test_resume_step_matches_torch(run3):
    """One more step on each side with identical gradients: param trees must
    agree — validates count/bias-correction, wd-mask partition, clip, lr."""
    run, path = run3
    template = _template(_flax_model())
    pkg = torch.load(path, map_location="cpu", weights_only=False)
    params = load_voicebox_torch(pkg["model"], template)
    mu, nu, count = load_optimizer_torch(path, template)

    opt = get_optimizer(lr=LR, wd=WD, max_grad_norm=CLIP)
    opt_state = opt.init(params)
    opt_state = restore_adam_state(opt_state, mu, nu, count)

    grads4 = run.make_grads()
    # port the gradient tree through the same mapping (grads transform like
    # their params); zeros template so unmapped leaves stay zero
    zeros = jax.tree.map(jnp.zeros_like, params)
    flax_grads = load_voicebox_torch(_prefixed(
        {k: torch.from_numpy(v) for k, v in grads4.items()}
    ), zeros)

    import optax

    updates, _ = opt.update(flax_grads, opt_state, params)
    ours = optax.apply_updates(params, updates)

    run.step(grads4)  # torch's 4th step
    expected = load_voicebox_torch(
        _prefixed({k: p.detach().clone() for k, p in run.params.items()}),
        _template(_flax_model()),
    )
    for (ka, a), (kb, b) in zip(
        jax.tree_util.tree_leaves_with_path(ours),
        jax.tree_util.tree_leaves_with_path(expected),
    ):
        assert ka == kb
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-6, rtol=1e-5,
            err_msg=str(ka),
        )


def test_trainer_load_torch_resumes(tmp_path):
    """VoiceBoxTrainer.load_torch restores weights + moments + step and the
    run continues (the reference trainer.load contract, trainer.py:199-207)."""
    import optax

    from voicebox_tpu.models.cfm import ConditionalFlowMatcherWrapper
    from voicebox_tpu.training.data import ArrayDataset
    from voicebox_tpu.training.trainer import VoiceBoxTrainer

    from test_port_voicebox import (
        DEPTH, DIM, DIM_HEAD, DIM_IN, HEADS, N_REG,
    )
    from voicebox_tpu import VoiceBox

    # unconditioned reference checkpoint (latent-space trainer datasets carry
    # no conditioning ids; the conditioned layout is covered above)
    run = _TorchRun(sd=_uncond_state_dict())
    for _ in range(3):
        run.step(run.make_grads())
    path = str(tmp_path / "voicebox.3.pt")
    torch.save(run.pkg(), path)

    vb = VoiceBox(
        dim_in=DIM_IN, dim=DIM, depth=DEPTH, dim_head=DIM_HEAD, heads=HEADS,
        num_register_tokens=N_REG, attn_qk_norm=True, condition_on_text=False,
    )
    cfm = ConditionalFlowMatcherWrapper(vb, cond_drop_prob=0.2)
    cfm.init_params(jax.random.PRNGKey(0), seq_len=32, batch=2)
    ds = ArrayDataset(
        [np.random.RandomState(i).randn(32, 24).astype(np.float32)
         for i in range(8)]
    )
    tr = VoiceBoxTrainer(
        cfm, batch_size=2, dataset=ds, num_train_steps=5, valid_frac=0.25,
        results_folder=str(tmp_path / "res"), use_mesh=False,
        num_warmup_steps=0, lr=LR, wd=WD,
        save_model_every=100, save_results_every=100, prefetch_batches=0,
    )
    tr.load_torch(path)
    assert tr.steps == 3

    # every stateful counter (adam bias correction + lr schedule) restored
    counts = []

    def walk(s):
        if hasattr(s, "_fields"):
            if "count" in s._fields:
                counts.append(int(s.count))
            for f in s._fields:
                walk(getattr(s, f))
        elif isinstance(s, (tuple, list)):
            for x in s:
                walk(x)

    walk(tr.opt_state)
    assert counts and all(c == 3 for c in counts), counts

    # a ported moment leaf landed in the live optimizer state
    adam = [
        s for s in jax.tree_util.tree_leaves_with_path(
            tr.opt_state, is_leaf=lambda x: isinstance(
                x, optax.ScaleByAdamState)
        ) if isinstance(s[1], optax.ScaleByAdamState)
    ]
    assert len(adam) == 1
    assert float(jnp.abs(adam[0][1].mu["to_embed"]["kernel"]).max()) > 0

    tr.train()  # 2 more steps (num_train_steps=5)
    assert tr.steps == 5


def test_misalignment_refuses(run3, tmp_path):
    """An un-alignable checkpoint (extra non-buffer tensor shifts the index
    map) refuses the optimizer port loudly instead of misporting."""
    _, path = run3
    pkg = torch.load(path, map_location="cpu", weights_only=False)
    pkg["model"]["voicebox.mystery_extra"] = torch.zeros(3, 3)
    bad = tmp_path / "bad.pt"
    torch.save(pkg, str(bad))
    with pytest.raises(ValueError, match="align"):
        load_optimizer_torch(str(bad), _template(_flax_model()))


def test_heterogeneous_steps_warn(run3, tmp_path):
    _, path = run3
    pkg = torch.load(path, map_location="cpu", weights_only=False)
    state = pkg["optim"]["state"]
    k0 = next(iter(state))
    state[k0]["step"] = torch.tensor(1.0)
    het = tmp_path / "het.pt"
    torch.save(pkg, str(het))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        _, _, count = load_optimizer_torch(str(het), _template(_flax_model()))
    assert count == 3
    assert any("heterogeneous" in str(x.message) for x in w)


def test_frozen_param_keeps_zero_moments(run3):
    """`null_cond` (requires_grad=False, reference voicebox_pytorch.py:940)
    occupies an optimizer index but never gets state — the port must not
    misalign around it (covered by the exact-mapping test) and must not warn
    about it as a missing trainable param."""
    _, path = run3
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        load_optimizer_torch(path, _template(_flax_model()))
    assert not any("no optimizer state" in str(x.message) for x in w)
