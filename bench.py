"""Benchmark: the BASELINE.json primary metric — CFM train steps/sec/chip at
dim=512, depth=24 — plus sampling RTF for a 10 s utterance (north-star target
RTF <= 0.05 on v5e).

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ..., "extra": {...}}

`vs_baseline` is the ratio of the north-star RTF target (0.05) to the measured
RTF (>1.0 means beating the target); the reference itself publishes no numbers
(BASELINE.md).
"""

import json
import time

import jax
import jax.numpy as jnp
import optax


def _build(dtype):
    from voicebox_tpu import VoiceBox
    from voicebox_tpu.models.cfm import ConditionalFlowMatcherWrapper

    vb = VoiceBox(
        num_cond_tokens=500,
        dim_in=128,  # Encodec latent dim
        dim_cond_emb=512,
        dim=512,
        depth=24,
        dim_head=64,
        heads=8,
        num_register_tokens=16,
        attn_qk_norm=True,
        condition_on_text=True,
        dtype=dtype,
    )
    return ConditionalFlowMatcherWrapper(vb, cond_drop_prob=0.2)


def bench_train(cfm, batch=8, seq_len=768, iters=20):
    """Train throughput: full fwd+bwd+adamw update, jitted."""
    params = cfm.init_params(jax.random.PRNGKey(0), seq_len=seq_len, batch=2)
    opt = optax.chain(optax.clip_by_global_norm(0.5), optax.adamw(1e-4))
    opt_state = opt.init(params)

    x = jax.random.normal(jax.random.PRNGKey(1), (batch, seq_len, 128))
    ids = jax.random.randint(jax.random.PRNGKey(2), (batch, seq_len), 0, 500)

    @jax.jit
    def step(params, opt_state, rng):
        loss, grads = jax.value_and_grad(cfm.loss_fn)(
            params, x, rng, cond_token_ids=ids
        )
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = jax.random.PRNGKey(3)
    params, opt_state, loss = step(params, opt_state, rng)  # compile
    loss.block_until_ready()

    t0 = time.perf_counter()
    for i in range(iters):
        rng, sub = jax.random.split(rng)
        params, opt_state, loss = step(params, opt_state, sub)
    loss.block_until_ready()
    dt = time.perf_counter() - t0
    return iters / dt, params


def bench_sample_rtf(cfm, params, steps=3, cond_scale=1.3, iters=10):
    """Sampling RTF: 10 s of 24 kHz audio = 750 Encodec frames (downsample 320)."""
    seq_len = 750
    audio_seconds = seq_len * 320 / 24000.0

    cond = jax.random.normal(jax.random.PRNGKey(4), (1, seq_len, 128))
    ids = jax.random.randint(jax.random.PRNGKey(5), (1, seq_len), 0, 500)

    out = cfm.sample(
        cond=cond, semantic_token_ids=ids, steps=steps, cond_scale=cond_scale,
        decode_to_audio=False, params=params,
    )
    out.block_until_ready()  # compile

    t0 = time.perf_counter()
    for _ in range(iters):
        out = cfm.sample(
            cond=cond, semantic_token_ids=ids, steps=steps, cond_scale=cond_scale,
            decode_to_audio=False, params=params,
        )
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    return dt / audio_seconds, dt


def main():
    on_tpu = jax.default_backend() in ("tpu", "axon")
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    cfm = _build(dtype)
    train_sps, params = bench_train(cfm)
    rtf, latency = bench_sample_rtf(cfm, params)

    target_rtf = 0.05
    print(
        json.dumps(
            {
                "metric": "sampling_rtf_10s_utterance",
                "value": round(rtf, 5),
                "unit": "rtf (lower is better)",
                "vs_baseline": round(target_rtf / rtf, 3),
                "extra": {
                    "train_steps_per_sec_dim512_depth24_bs8_seq768": round(train_sps, 3),
                    "sample_latency_s_750frames_steps3_cfg": round(latency, 4),
                    "backend": jax.default_backend(),
                    "dtype": str(dtype.__name__ if hasattr(dtype, "__name__") else dtype),
                    "note": "vs_baseline = north-star RTF target 0.05 / measured RTF (>1 beats target); reference publishes no numbers",
                },
            }
        )
    )


if __name__ == "__main__":
    main()
