"""LoRA adapters (ops/lora.py) — beyond-parity parameter-efficient
fine-tuning. Covers: identity at init (B=0), targeting scope, adapter-only
training on a frozen base (the voice-adaptation flow), interceptor/fold
equivalence, and composition with the serving path."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from voicebox_tpu import ConditionalFlowMatcherWrapper, VoiceBox
from voicebox_tpu.ops.lora import (
    fold_lora,
    lora_dense,
    lora_init,
    lora_scale,
    merge_lora_params,
)


def _cfm(dim=32, depth=2):
    vb = VoiceBox(
        num_cond_tokens=0, dim_in=dim, dim_cond_emb=0, dim=dim, depth=depth,
        dim_head=16, heads=2, num_register_tokens=2, attn_qk_norm=False,
        condition_on_text=False,
    )
    cfm = ConditionalFlowMatcherWrapper(vb)
    cfm.init_params(jax.random.PRNGKey(0), seq_len=16, batch=4)
    return cfm


def test_init_targets_and_shapes():
    cfm = _cfm()
    lora = lora_init(jax.random.PRNGKey(1), cfm.params, rank=4)
    blk = lora["transformer"]["block_0"]
    assert blk["attn"]["to_qkv"]["lora_a"].shape == (32, 4)
    assert blk["attn"]["to_qkv"]["lora_b"].shape == (4, 96)
    assert blk["ff"]["proj_in"]["lora_a"].shape[1] == 4
    # B zero-init = identity start
    assert float(jnp.abs(blk["attn"]["to_qkv"]["lora_b"]).max()) == 0.0
    # out-of-scope layers carry no adapters
    assert "to_embed" not in lora and "to_pred" not in lora
    # trainable set is tiny vs the base
    n_lora = sum(x.size for x in jax.tree.leaves(lora))
    n_base = sum(x.size for x in jax.tree.leaves(cfm.params))
    assert n_lora < 0.15 * n_base


def test_identity_at_init():
    """With B = 0 the adapted forward equals the base forward EXACTLY."""
    cfm = _cfm()
    lora = lora_init(jax.random.PRNGKey(1), cfm.params, rank=4)
    merged = merge_lora_params(cfm.params, lora)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 32))
    kw = dict(times=jnp.asarray([0.2, 0.8]), cond=x, cond_drop_prob=0.0,
              train=False)

    base = jax.jit(
        lambda p: cfm.voicebox.apply({"params": p}, x, **kw)
    )(cfm.params)

    @jax.jit
    def adapted(p):
        with lora_dense(lora_scale(16, 4)):
            return cfm.voicebox.apply({"params": p}, x, **kw)

    # B = 0 makes the delta exactly zero; the only residue is XLA fusion
    # reassociation around the (+0) adds
    np.testing.assert_allclose(np.asarray(adapted(merged)), np.asarray(base),
                               rtol=1e-5, atol=1e-5)


def test_adapter_only_training_moves_loss_and_freezes_base():
    cfm = _cfm()
    base = cfm.params
    scale = lora_scale(8, 4)
    lora = lora_init(jax.random.PRNGKey(1), base, rank=4)
    x = jax.random.normal(jax.random.PRNGKey(2), (4, 16, 32)) * 0.1

    def loss_fn(lora_tree, key):
        merged = merge_lora_params(base, lora_tree)
        with lora_dense(scale):
            return cfm.loss_fn(merged, x, key)

    opt = optax.adam(1e-2)
    opt_state = opt.init(lora)

    @jax.jit
    def step(lora_tree, opt_state, key):
        loss, grads = jax.value_and_grad(loss_fn)(lora_tree, key)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(lora_tree, updates), opt_state, loss

    key = jax.random.PRNGKey(3)
    first = last = None
    for i in range(60):
        key, sub = jax.random.split(key)
        lora, opt_state, loss = step(lora, opt_state, sub)
        if i == 0:
            first = float(loss)
        last = float(loss)
    assert last < 0.7 * first, (first, last)
    # the base tree object was never touched
    assert cfm.params is base
    # adapters actually moved
    assert float(jnp.abs(lora["transformer"]["block_0"]["attn"]["to_qkv"]["lora_b"]).max()) > 0


def test_fold_matches_interceptor():
    cfm = _cfm()
    scale = lora_scale(16, 4)
    lora = lora_init(jax.random.PRNGKey(1), cfm.params, rank=4)
    # give B real values so the delta is non-trivial
    lora = jax.tree.map(
        lambda x: x + 0.02 * jax.random.normal(jax.random.PRNGKey(9), x.shape),
        lora,
    )
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 32))
    kw = dict(times=jnp.asarray([0.2, 0.8]), cond=x, cond_drop_prob=0.0,
              train=False)

    merged = merge_lora_params(cfm.params, lora)

    @jax.jit
    def adapted(p):
        with lora_dense(scale):
            return cfm.voicebox.apply({"params": p}, x, **kw)

    folded = fold_lora(cfm.params, lora, scale)
    out_folded = jax.jit(
        lambda p: cfm.voicebox.apply({"params": p}, x, **kw)
    )(folded)
    np.testing.assert_allclose(
        np.asarray(adapted(merged)), np.asarray(out_folded),
        rtol=2e-4, atol=2e-4,
    )
    # folded tree is a PLAIN param tree: serves through sample() untouched
    out = cfm.sample(cond=x, steps=2, params=folded, rng=jax.random.PRNGKey(5),
                     decode_to_audio=False)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_bad_scope_raises():
    cfm = _cfm()
    with pytest.raises(AssertionError):
        lora_init(jax.random.PRNGKey(0), cfm.params, rank=4,
                  scope_keys=("nonexistent_scope",))
