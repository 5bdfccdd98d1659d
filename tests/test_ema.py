"""EMA-of-params opt-in (training/optimizer.py::track_params_ema).

The EMA tree rides inside the optimizer state, so checkpointing/sharding/
donation come for free — these tests pin the math (EMA of the POST-update
params), the trainer integration, and checkpoint persistence.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from voicebox_tpu import ConditionalFlowMatcherWrapper, VoiceBox
from voicebox_tpu.training.data import ArrayDataset
from voicebox_tpu.training.optimizer import (
    ema_params_from_state,
    get_optimizer,
    track_params_ema,
)
from voicebox_tpu.training.trainer import VoiceBoxTrainer


def test_ema_math_matches_manual():
    decay = 0.9
    opt = get_optimizer(lr=0.1, wd=0.0, max_grad_norm=0.5, ema_decay=decay)
    params = {"w": jnp.asarray([1.0, -2.0]), "b": jnp.asarray([0.5])}
    state = opt.init(params)
    manual_ema = jax.tree.map(lambda p: np.asarray(p, np.float64), params)

    key = jax.random.PRNGKey(0)
    for i in range(4):
        key, sub = jax.random.split(key)
        grads = jax.tree.map(
            lambda p: jax.random.normal(sub, p.shape), params
        )
        updates, state = opt.update(grads, state, params)
        params = optax.apply_updates(params, updates)
        manual_ema = jax.tree.map(
            lambda e, p: decay * e + (1 - decay) * np.asarray(p, np.float64),
            manual_ema, params,
        )

    ema = ema_params_from_state(state)
    assert ema is not None
    for k in params:
        np.testing.assert_allclose(ema[k], manual_ema[k], rtol=1e-5)


def test_ema_dtype_and_no_ema_returns_none():
    opt = get_optimizer(lr=0.1, ema_decay=0.99, ema_dtype=jnp.bfloat16)
    params = {"w": jnp.ones((4, 4))}
    state = opt.init(params)
    assert ema_params_from_state(state)["w"].dtype == jnp.bfloat16

    plain = get_optimizer(lr=0.1, max_grad_norm=0.5)
    assert ema_params_from_state(plain.init(params)) is None


def test_standalone_transform_requires_params():
    tr = track_params_ema(0.9)
    state = tr.init({"w": jnp.ones((2,))})
    updates = {"w": jnp.ones((2,))}
    try:
        tr.update(updates, state)  # params omitted
        raise SystemExit("should have asserted")
    except AssertionError:
        pass


def test_trainer_ema_generate_and_checkpoint(tmp_path):
    rng = jax.random.PRNGKey(0)
    vb = VoiceBox(
        dim_in=8, dim=16, depth=2, dim_head=8, heads=2,
        num_register_tokens=2, condition_on_text=False,
    )
    cfm = ConditionalFlowMatcherWrapper(vb)
    cfm.init_params(rng, seq_len=16, batch=2)
    ds = ArrayDataset([np.random.RandomState(i).randn(16, 8) for i in range(8)])
    tr = VoiceBoxTrainer(
        cfm, batch_size=2, dataset=ds, num_train_steps=3, valid_frac=0.25,
        results_folder=str(tmp_path / "r"), use_mesh=False, bucket_multiple=16,
        ema_decay=0.5, save_model_every=2, prefetch_batches=0,
    )
    tr.train()

    ema = tr.ema_params
    assert ema is not None
    # after a few steps with decay 0.5, EMA lags the live params but has moved
    leaves = jax.tree.leaves(jax.tree.map(
        lambda e, p: float(jnp.max(jnp.abs(e - p))), ema, tr.params))
    assert max(leaves) > 0.0

    out = tr.generate(cond=jnp.zeros((1, 16, 8)), steps=2, use_ema=True)
    assert out.shape == (1, 16, 8)
    assert bool(jnp.all(jnp.isfinite(out)))

    # checkpoint round-trip: EMA is part of opt_state, so restore brings it
    tr2 = VoiceBoxTrainer(
        cfm, batch_size=2, dataset=ds, num_train_steps=3, valid_frac=0.25,
        results_folder=str(tmp_path / "r2"), use_mesh=False, bucket_multiple=16,
        ema_decay=0.5, prefetch_batches=0,
    )
    tr2.load(str(tmp_path / "r" / "voicebox.2.ckpt"))
    restored = tr2.ema_params
    for a, b in zip(jax.tree.leaves(ema), jax.tree.leaves(restored)):
        # the ckpt was written at step 2; tr trained one more step after, so
        # just check structure + finiteness here and exact match below via
        # a fresh save
        assert a.shape == b.shape
    # exact: save current state and reload
    tr.save(str(tmp_path / "r" / "voicebox.final.ckpt"))
    tr2.load(str(tmp_path / "r" / "voicebox.final.ckpt"))
    for a, b in zip(jax.tree.leaves(ema), jax.tree.leaves(tr2.ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_config_ema_fields_round_trip():
    from voicebox_tpu.training.config import TrainConfig

    cfg = TrainConfig(batch_size=2, num_train_steps=1, ema_decay=0.999,
                      ema_dtype="bfloat16")
    d = cfg.to_dict()
    assert d["ema_decay"] == 0.999
    assert TrainConfig.from_dict(d).ema_dtype == "bfloat16"
