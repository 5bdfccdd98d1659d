"""Measure the opt-in int8 serving path (ops/quant.py) on the real TPU.

Per-request latency (batch 1) and saturation throughput (batch 8) for the
flagship config (dim 512, depth 24, heads 4 x 128, production-geometry Encodec
codec, 10 s utterances, 3 midpoint steps + CFG, fused vocoder decode) —
quantize=None vs quantize="int8" — plus the output perturbation between the
two on identical noise.

Timing per CLAUDE.md rules: every timed program ends in a fetched scalar,
fresh PRNG per call, min over repeats.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from bench import LATENT_DIM, _build, _build_codec

SEQ_LEN = 750  # 10 s of 24 kHz audio at Encodec downsample 320
AUDIO_SECONDS = SEQ_LEN * 320 / 24000.0


def bench_sample(cfm, params, batch, quantize, iters=6, steps=3, cond_scale=1.3):
    cond = jax.random.normal(jax.random.PRNGKey(4), (batch, SEQ_LEN, LATENT_DIM))
    ids = jax.random.randint(jax.random.PRNGKey(5), (batch, SEQ_LEN), 0, 500)

    def one(i):
        audio = cfm.sample(
            cond=cond, semantic_token_ids=ids, steps=steps,
            cond_scale=cond_scale, params=params, quantize=quantize,
            rng=jax.random.PRNGKey(1000 + i),
        )
        return float(jnp.asarray(audio, jnp.float32).sum())

    one(0)  # compile (+ weight quantization, cached)
    ts = []
    for i in range(iters):
        t0 = time.perf_counter()
        one(i + 1)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def _build_dim1024(dtype, codec):
    from voicebox_tpu import VoiceBox
    from voicebox_tpu.models.cfm import ConditionalFlowMatcherWrapper

    vb = VoiceBox(
        num_cond_tokens=500, dim_in=LATENT_DIM, dim_cond_emb=512, dim=1024,
        depth=24, dim_head=128, heads=8, num_register_tokens=16,
        attn_qk_norm=True, condition_on_text=True, dtype=dtype,
        audio_enc_dec=codec,
    )
    return ConditionalFlowMatcherWrapper(vb, cond_drop_prob=0.2)


def main():
    on_tpu = jax.default_backend() in ("tpu", "axon")
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    cfm = _build(dtype, codec=_build_codec())
    params = cfm.init_params(jax.random.PRNGKey(0), seq_len=SEQ_LEN, batch=2)

    # output perturbation on identical noise (latents, so the codec's random
    # weights don't dominate the comparison)
    cond = jax.random.normal(jax.random.PRNGKey(4), (1, SEQ_LEN, LATENT_DIM))
    ids = jax.random.randint(jax.random.PRNGKey(5), (1, SEQ_LEN), 0, 500)
    kw = dict(cond=cond, semantic_token_ids=ids, steps=3, cond_scale=1.3,
              decode_to_audio=False, params=params, rng=jax.random.PRNGKey(7))
    lat = jnp.asarray(cfm.sample(**kw), jnp.float32)
    lat_q = jnp.asarray(cfm.sample(quantize="int8", **kw), jnp.float32)
    lat_w = jnp.asarray(cfm.sample(quantize="w8a16", **kw), jnp.float32)
    rel = float(jnp.linalg.norm(lat_q - lat) / jnp.linalg.norm(lat))
    rel_w = float(jnp.linalg.norm(lat_w - lat) / jnp.linalg.norm(lat))
    print(f"latent rel delta vs {dtype.__name__}: int8 {rel:.4f} | w8a16 {rel_w:.4f}",
          flush=True)

    for batch in (1, 8):
        t_f = bench_sample(cfm, params, batch, None)
        t_q = bench_sample(cfm, params, batch, "int8")
        t_w = bench_sample(cfm, params, batch, "w8a16")
        thr_f = batch * AUDIO_SECONDS / t_f
        print(
            f"dim  512 batch {batch}: {dtype.__name__} {t_f*1e3:7.1f} ms ({thr_f:6.1f} audio-s/s) | "
            f"int8 {t_q*1e3:7.1f} ms ({t_f/t_q:0.2f}x) | "
            f"w8a16 {t_w*1e3:7.1f} ms ({t_f/t_w:0.2f}x)",
            flush=True,
        )

    # reference-default scale: 705M params — weight HBM traffic dominates
    # more, so int8 weights buy more here
    cfm_big = _build_dim1024(dtype, _build_codec())
    params_big = cfm_big.init_params(jax.random.PRNGKey(0), seq_len=SEQ_LEN,
                                     batch=2)
    for batch in (1, 8):
        t_f = bench_sample(cfm_big, params_big, batch, None)
        t_q = bench_sample(cfm_big, params_big, batch, "int8")
        t_w = bench_sample(cfm_big, params_big, batch, "w8a16")
        thr_f = batch * AUDIO_SECONDS / t_f
        print(
            f"dim 1024 batch {batch}: {dtype.__name__} {t_f*1e3:7.1f} ms ({thr_f:6.1f} audio-s/s) | "
            f"int8 {t_q*1e3:7.1f} ms ({t_f/t_q:0.2f}x) | "
            f"w8a16 {t_w*1e3:7.1f} ms ({t_f/t_w:0.2f}x)",
            flush=True,
        )


if __name__ == "__main__":
    main()
