"""Benchmark: the BASELINE.json primary metric — CFM train steps/sec/chip at
dim=512, depth=24 — plus sampling RTF for a 10 s utterance INCLUDING the full
vocoder decode (north-star target RTF <= 0.05 on v5e).

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ..., "extra": {...}}

`vs_baseline` is the ratio of the north-star RTF target (0.05) to the measured
RTF (>1.0 means beating the target); the reference itself publishes no numbers
(BASELINE.md).

Timing methodology (tunneled-TPU-safe):
* `block_until_ready` does not force remote execution on the axon backend and
  identical-input repeat executions can be served from a cache — every timed
  program therefore ends in a scalar that is fetched with `float()`, and every
  call gets fresh PRNG inputs.
* train steps/s uses a differential: one jitted `lax.scan` of K=22 steps vs
  one of K=2, (t22 - t2) / 20 — constant dispatch/tunnel cost cancels, leaving
  pure on-chip step time.
* sampling RTF is per-request latency including dispatch (what a server sees);
  the measured dispatch round-trip is reported alongside.

Model config is the TPU-tuned flagship: dim 512, depth 24, heads 4 x
dim_head 128 (same parameter count and FLOPs as the reference's 8 x 64 split,
but d=128 fills the 128-wide MXU — measured 33% faster), and 752-frame
sequences so frames + 16 register tokens = 768 = 6*128 lanes (register-aligned
buckets, see training/data.py).
"""

import json
import time

import jax
import jax.numpy as jnp
import optax

SEQ_LEN = 752  # + 16 register tokens = 768 = 6 * 128
LATENT_DIM = 128  # Encodec latent dim


def _build(dtype, codec=None, scores_dtype=None):
    from voicebox_tpu import VoiceBox
    from voicebox_tpu.models.cfm import ConditionalFlowMatcherWrapper

    vb = VoiceBox(
        num_cond_tokens=500,
        dim_in=LATENT_DIM,
        dim_cond_emb=512,
        dim=512,
        depth=24,
        dim_head=128,
        heads=4,
        num_register_tokens=16,
        attn_qk_norm=True,
        attn_scores_dtype=scores_dtype,
        condition_on_text=True,
        dtype=dtype,
        audio_enc_dec=codec,
    )
    return ConditionalFlowMatcherWrapper(vb, cond_drop_prob=0.2)


def bench_train(cfm, batch=8, seq_len=SEQ_LEN, moment_dtype=None, params=None):
    """Train throughput: full fwd+bwd+adamw update; K-step scan differential.
    moment_dtype=jnp.bfloat16 measures the opt-in compressed-moment path
    (training/optimizer.py); None is the reference-parity f32 default."""
    from voicebox_tpu.training.optimizer import get_optimizer

    if params is None:
        params = cfm.init_params(jax.random.PRNGKey(0), seq_len=seq_len, batch=2)
    opt = get_optimizer(lr=1e-4, wd=1e-2, max_grad_norm=0.5,
                        moment_dtype=moment_dtype)
    opt_state = opt.init(params)

    x = jax.random.normal(jax.random.PRNGKey(1), (batch, seq_len, LATENT_DIM))
    ids = jax.random.randint(jax.random.PRNGKey(2), (batch, seq_len), 0, 500)

    def multi(K):
        @jax.jit
        def run(params, opt_state, rng):
            def body(carry, key):
                p, o = carry
                loss, grads = jax.value_and_grad(cfm.loss_fn)(
                    p, x, key, cond_token_ids=ids
                )
                updates, o = opt.update(grads, o, p)
                return (optax.apply_updates(p, updates), o), loss

            keys = jax.random.split(rng, K)
            _, losses = jax.lax.scan(body, (params, opt_state), keys)
            return losses[-1]

        return run

    best = {}
    for K in (2, 22):
        f = multi(K)
        ts = []
        for rep in range(3):
            if rep == 0:
                float(f(params, opt_state, jax.random.PRNGKey(100 + K)))  # compile
            t0 = time.perf_counter()
            float(f(params, opt_state, jax.random.PRNGKey(200 + 31 * rep + K)))
            ts.append(time.perf_counter() - t0)
        best[K] = min(ts)
    dt = (best[22] - best[2]) / 20
    return 1.0 / dt, params


def bench_dispatch_overhead(iters=5):
    """Round-trip of a trivial jitted program with a host fetch."""
    f = jax.jit(lambda x: (x * 2.0).sum())
    float(f(jnp.ones((8,))))  # compile
    ts = []
    for i in range(iters):
        x = jnp.full((8,), float(i + 1))
        t0 = time.perf_counter()
        float(f(x))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def bench_sample_rtf(cfm, params, steps=3, cond_scale=1.3, iters=8):
    """Sampling RTF: 10 s of 24 kHz audio = 750 Encodec frames (downsample 320),
    including the full vocoder decode (RVQ quantize -> Vocos -> iSTFT) — the
    sampler fuses it into ONE program, so a request is one dispatch.

    Per-request latency with a host fetch; rng varies per call."""
    seq_len = 750
    audio_seconds = seq_len * 320 / 24000.0

    cond = jax.random.normal(jax.random.PRNGKey(4), (1, seq_len, LATENT_DIM))
    ids = jax.random.randint(jax.random.PRNGKey(5), (1, seq_len), 0, 500)

    def one(i):
        audio = cfm.sample(
            cond=cond, semantic_token_ids=ids, steps=steps, cond_scale=cond_scale,
            params=params, rng=jax.random.PRNGKey(1000 + i),
        )
        assert audio.shape[-1] == seq_len * 320  # exactly 10 s out
        return float(jnp.asarray(audio, jnp.float32).sum())  # force + fetch

    def timed(f):
        f(0)  # compile
        ts = []
        for i in range(iters):
            t0 = time.perf_counter()
            f(i + 1)
            ts.append(time.perf_counter() - t0)
        return min(ts)

    dt = timed(one)

    def latents_only(i):
        out = cfm.sample(
            cond=cond, semantic_token_ids=ids, steps=steps, cond_scale=cond_scale,
            decode_to_audio=False, params=params, rng=jax.random.PRNGKey(2000 + i),
        )
        return float(out.sum())

    dt_latents = timed(latents_only)
    return dt / audio_seconds, dt, dt_latents / audio_seconds


def _build_codec():
    """Production-architecture EncodecVoco (upstream vocos-encodec-24khz
    geometry: n_fft 1280 / hop 320); weights random — identical compute cost."""
    from voicebox_tpu.models.codec import EncodecVoco
    from voicebox_tpu.models.encodec import EncodecModel
    from voicebox_tpu.models.vocos import Vocos

    return EncodecVoco(
        encodec=EncodecModel(),
        vocos=Vocos.from_pretrained("charactr/vocos-encodec-24khz"),
    )


def main():
    on_tpu = jax.default_backend() in ("tpu", "axon")
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    cfm = _build(dtype, codec=_build_codec())
    train_sps, params = bench_train(cfm)
    train_sps_bf16m, _ = bench_train(cfm, moment_dtype=jnp.bfloat16,
                                     params=params)
    # full opt-in stack: bf16 attention scores (same param tree) + bf16 moments
    cfm_bf16s = _build(dtype, codec=_build_codec(),
                       scores_dtype=jnp.bfloat16 if on_tpu else None)
    train_sps_stack, _ = bench_train(cfm_bf16s, moment_dtype=jnp.bfloat16,
                                     params=params)
    rtf, latency, rtf_latents = bench_sample_rtf(cfm, params)
    dispatch_s = bench_dispatch_overhead()

    target_rtf = 0.05
    print(
        json.dumps(
            {
                "metric": "sampling_rtf_10s_utterance",
                "value": round(rtf, 5),
                "unit": "rtf (lower is better)",
                "vs_baseline": round(target_rtf / rtf, 3),
                "extra": {
                    "train_steps_per_sec_dim512_depth24_bs8_seq752plus16reg": round(train_sps, 3),
                    "train_steps_per_sec_bf16_adam_moments_optin": round(train_sps_bf16m, 3),
                    "train_steps_per_sec_bf16_scores_plus_moments_optin": round(train_sps_stack, 3),
                    "sample_latency_s_750frames_steps3_cfg_incl_vocoder": round(latency, 4),
                    "rtf_latents_only": round(rtf_latents, 5),
                    "dispatch_roundtrip_s": round(dispatch_s, 4),
                    "backend": jax.default_backend(),
                    "dtype": str(dtype.__name__ if hasattr(dtype, "__name__") else dtype),
                    "note": "vs_baseline = north-star RTF target 0.05 / measured RTF (>1 beats target); reference publishes no numbers; train steps/s is a K-step scan differential (pure on-chip time), RTF is per-request latency including dispatch",
                },
            }
        )
    )


if __name__ == "__main__":
    main()
