"""Int8 serving quantization (ops/quant.py) — beyond-parity opt-in.

Covers the quantized matmul's accuracy, the param-tree surgery's targeting
(transformer Dense layers only — VoiceBox's top-level latent `proj_in` must
stay float), the flax interceptor through the real model, and the end-to-end
`sample(quantize="int8")` path against the unquantized sampler.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from voicebox_tpu import VoiceBox
from voicebox_tpu.models.cfm import ConditionalFlowMatcherWrapper
from voicebox_tpu.ops.quant import (
    int8_matmul,
    quantize_dense_params,
    quantize_kernel,
    quantized_dense,
    w8a16_matmul,
)


def _tiny_voicebox(**kw):
    kw.setdefault("attn_qk_norm", False)
    return VoiceBox(
        num_cond_tokens=50,
        dim_in=24,
        dim_cond_emb=24,
        dim=64,
        depth=2,
        dim_head=16,
        heads=4,
        num_register_tokens=4,
        condition_on_text=True,
        **kw,
    )


def test_int8_matmul_accuracy():
    rs = np.random.RandomState(0)
    w = jnp.asarray(rs.randn(96, 128), jnp.float32)
    x = jnp.asarray(rs.randn(3, 17, 96), jnp.float32)
    q, s = quantize_kernel(w)
    assert q.dtype == jnp.int8 and s.shape == (1, 128)
    y = int8_matmul(x, q, s)
    ref = x @ w
    rel = float(jnp.linalg.norm(y - ref) / jnp.linalg.norm(ref))
    assert rel < 0.02, rel


def test_w8a16_matmul_parity():
    """The Pallas weight-only matmul must be EXACT vs x @ dequant(kernel)
    (modulo f32 dot rounding): unlike the dynamic-int8 path, activations are
    never quantized, so the only error budget is the weight rounding."""
    rs = np.random.RandomState(0)
    # ragged shapes force the kernel's m/k/n padding paths
    for lead, k, n in [((3, 17), 96, 128), ((33,), 130, 257), ((2, 4, 8), 64, 96)]:
        w = jnp.asarray(rs.randn(k, n), jnp.float32)
        x = jnp.asarray(rs.randn(*lead, k), jnp.float32)
        q, s = quantize_kernel(w)
        y = w8a16_matmul(x, q, s, interpret=True)
        assert y.shape == (*lead, n) and y.dtype == x.dtype
        deq_ref = x @ (q.astype(jnp.float32) * s)
        assert float(jnp.max(jnp.abs(y - deq_ref))) < 1e-4 * float(
            jnp.max(jnp.abs(deq_ref))
        )
        rel = float(jnp.linalg.norm(y - x @ w) / jnp.linalg.norm(x @ w))
        assert rel < 0.02, rel


def test_sample_w8a16_end_to_end():
    """`sample(quantize='w8a16')` runs the Pallas weight-only path (interpret
    mode on CPU) and lands near the float sample on identical noise."""
    vb = _tiny_voicebox()
    cfm = ConditionalFlowMatcherWrapper(vb)
    cfm.init_params(jax.random.PRNGKey(0), seq_len=32, batch=2)

    cond = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 24))
    ids = jnp.zeros((2, 32), dtype=jnp.int32)
    rng = jax.random.PRNGKey(3)

    out = cfm.sample(cond=cond, semantic_token_ids=ids, steps=2,
                     cond_scale=1.3, rng=rng)
    out_q = cfm.sample(cond=cond, semantic_token_ids=ids, steps=2,
                       cond_scale=1.3, quantize="w8a16", rng=rng)
    assert out_q.shape == out.shape
    assert bool(jnp.all(jnp.isfinite(out_q)))
    # weight-only rounding is a smaller perturbation than the dynamic path's
    rel = float(jnp.linalg.norm(out_q - out) / jnp.linalg.norm(out))
    assert rel < 0.1, rel


def test_sample_param_store_dtype():
    """`sample(param_store_dtype=bf16)` serves from a cached bf16 cast of the
    params — numerically a rounding-level perturbation, composable with
    quantize, one cast per params version."""
    vb = _tiny_voicebox()
    cfm = ConditionalFlowMatcherWrapper(vb)
    cfm.init_params(jax.random.PRNGKey(0), seq_len=32, batch=2)

    cond = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 24))
    ids = jnp.zeros((2, 32), dtype=jnp.int32)
    kw = dict(cond=cond, semantic_token_ids=ids, steps=2, cond_scale=1.3,
              rng=jax.random.PRNGKey(3))

    out = cfm.sample(**kw)
    out_h = cfm.sample(param_store_dtype=jnp.bfloat16, **kw)
    assert out_h.shape == out.shape and bool(jnp.all(jnp.isfinite(out_h)))

    # cast is cached per params identity
    first = cfm._stored_cache
    cfm.sample(param_store_dtype=jnp.bfloat16, **kw)
    assert cfm._stored_cache is first
    assert all(
        leaf.dtype == jnp.bfloat16
        for leaf in jax.tree.leaves(first[2])
        if jnp.issubdtype(leaf.dtype, jnp.floating)
    )

    # composes with int8: surgery runs on the bf16-stored tree
    out_hq = cfm.sample(param_store_dtype=jnp.bfloat16, quantize="int8", **kw)
    assert bool(jnp.all(jnp.isfinite(out_hq)))


def test_quantize_kernel_stacked_and_zero_columns():
    # scan_layers-style stacked kernel: per-(layer, out-channel) scales
    rs = np.random.RandomState(1)
    w = jnp.asarray(rs.randn(3, 8, 16), jnp.float32)
    w = w.at[:, :, 5].set(0.0)  # a zero column must not produce NaNs
    q, s = quantize_kernel(w)
    assert q.shape == w.shape and s.shape == (3, 1, 16)
    deq = q.astype(jnp.float32) * s
    assert bool(jnp.all(jnp.isfinite(deq)))
    assert float(jnp.max(jnp.abs(deq - w))) < float(jnp.max(s)) * 0.51


def test_param_surgery_targets_transformer_only():
    vb = _tiny_voicebox()
    cfm = ConditionalFlowMatcherWrapper(vb)
    params = cfm.init_params(jax.random.PRNGKey(0), seq_len=32, batch=1)
    qp = quantize_dense_params(params)

    # the input-fusion Linear at the top level keeps its float kernel
    assert "kernel" in qp["to_embed"]
    # transformer attention + FF kernels are int8
    block0 = qp["transformer"]["block_0"]
    assert qp is not params
    assert "kernel_q" in block0["attn"]["to_qkv"]
    assert block0["attn"]["to_qkv"]["kernel_q"].dtype == jnp.int8
    assert "kernel_q" in block0["ff"]["proj_in"]
    assert "kernel" not in block0["ff"]["proj_in"]
    # FF biases survive the surgery
    assert "bias" in block0["ff"]["proj_in"]
    # numerics-sensitive layers stay float
    assert "kernel" in qp["to_pred"]
    assert "kernel" in qp["time_mlp"]
    # the AdaptiveRMSNorm conditioning projections stay float (zero-init)
    assert "kernel" in block0["attn_prenorm"]["to_gamma"]


def test_interceptor_forward_close_to_float():
    vb = _tiny_voicebox()
    cfm = ConditionalFlowMatcherWrapper(vb)
    params = cfm.init_params(jax.random.PRNGKey(0), seq_len=32, batch=2)
    qp = quantize_dense_params(params)

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 24))
    times = jnp.asarray([0.3, 0.7])
    ids = jnp.zeros((2, 32), dtype=jnp.int32)
    kwargs = dict(times=times, cond=x, cond_token_ids=ids, cond_drop_prob=0.0,
                  train=False)

    y = jax.jit(lambda p: vb.apply({"params": p}, x, **kwargs))(params)

    @jax.jit
    def run_q(p):
        with quantized_dense():
            return vb.apply({"params": p}, x, **kwargs)

    yq = run_q(qp)
    assert yq.shape == y.shape
    rel = float(jnp.linalg.norm(yq - y) / jnp.linalg.norm(y))
    assert rel < 0.05, rel  # measured 0.020 at this config
    assert bool(jnp.all(jnp.isfinite(yq)))


def test_sample_quantized_end_to_end():
    vb = _tiny_voicebox()
    cfm = ConditionalFlowMatcherWrapper(vb)
    cfm.init_params(jax.random.PRNGKey(0), seq_len=32, batch=2)

    cond = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 24))
    ids = jnp.zeros((2, 32), dtype=jnp.int32)
    rng = jax.random.PRNGKey(3)

    out = cfm.sample(cond=cond, semantic_token_ids=ids, steps=2,
                     cond_scale=1.3, rng=rng)
    out_q = cfm.sample(cond=cond, semantic_token_ids=ids, steps=2,
                       cond_scale=1.3, quantize="int8", rng=rng)
    assert out_q.shape == out.shape
    assert bool(jnp.all(jnp.isfinite(out_q)))
    # same noise, same solver — quantization is a perturbation, not a rewrite
    # (measured 0.020 at this config; a RANDOM-INIT qk-norm model amplifies
    # any rounding through its near-one-hot scale-10 softmax — same behaviour
    # as documented for bf16 attention scores in PERFORMANCE.md)
    rel = float(jnp.linalg.norm(out_q - out) / jnp.linalg.norm(out))
    assert rel < 0.1, rel

    # quantized params are cached per params identity
    first = cfm._qparams_cache
    cfm.sample(cond=cond, semantic_token_ids=ids, steps=2, cond_scale=1.3,
               quantize="int8", rng=rng)
    assert cfm._qparams_cache is first

    with pytest.raises(ValueError):
        cfm._build_sampler(2, False, True, False, False, "midpoint",
                           quantize="int4")


def test_quantized_sampling_on_trained_model():
    """Quality canary on TRAINED weights (the random-init qk-norm softmax is
    chaotic and says nothing about deployment quality — same reasoning as the
    bf16-scores canary in test_voicebox_cfm.py). After overfitting a tiny CFM,
    the int8 sample must land near the f32 sample on identical noise."""
    import optax

    vb = VoiceBox(
        num_cond_tokens=0, dim_in=32, dim_cond_emb=0, dim=32, depth=2,
        dim_head=16, heads=2, num_register_tokens=2, attn_qk_norm=True,
        condition_on_text=False,
    )
    cfm = ConditionalFlowMatcherWrapper(vb)
    params = cfm.init_params(jax.random.PRNGKey(0), seq_len=16, batch=4)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 32)) * 0.1
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, key):
        loss, grads = jax.value_and_grad(cfm.loss_fn)(params, x, key)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.PRNGKey(2)
    for _ in range(120):
        key, sub = jax.random.split(key)
        params, opt_state, _ = step(params, opt_state, sub)
    cfm.params = params

    rng = jax.random.PRNGKey(3)
    out = cfm.sample(cond=x, steps=3, rng=rng, decode_to_audio=False)
    out_q = cfm.sample(cond=x, steps=3, rng=rng, decode_to_audio=False,
                       quantize="int8")
    rel = float(jnp.linalg.norm(out_q - out) / jnp.linalg.norm(out))
    assert rel < 0.1, rel
