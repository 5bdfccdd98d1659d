"""Streaming synthesis benchmark: time-to-first-audio vs whole-utterance.

`sample_long_stream` yields vocoded chunks as each infilling window completes,
so playback can start after ONE window's sampling latency. This measures, on
the flagship config (dim 512, depth 24, heads 4x128) with the
production-geometry EncodecVoco codec, a 40 s utterance (3000 latent frames,
768-frame windows, 128-frame overlap):

  * time-to-first-audio (first yielded chunk, ~10.2 s of audio)
  * total streamed wall-clock (all chunks)
  * non-streaming `sample_long` wall-clock (the only option the reference's
    fixed-horizon API shape would allow)

Run: python benchmarks/streaming_tts.py   (real TPU; several min of compiles)
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp

TOTAL_FRAMES = 3000  # 40 s at the Encodec 75 Hz frame rate
WINDOW, OVERLAP = 768, 128


def build():
    from bench import _build, _build_codec

    on_tpu = jax.default_backend() in ("tpu", "axon")
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    cfm = _build(dtype, codec=_build_codec())
    params = cfm.init_params(jax.random.PRNGKey(0), seq_len=WINDOW, batch=1)
    return cfm, params


def run(cfm, params, seed):
    ids = jax.random.randint(jax.random.PRNGKey(2), (1, TOTAL_FRAMES), 0, 500)
    kw = dict(semantic_token_ids=ids, total_frames=TOTAL_FRAMES,
              window_frames=WINDOW, overlap_frames=OVERLAP, steps=3,
              cond_scale=1.3, params=params)

    t0 = time.perf_counter()
    t_first = None
    n_samples = 0
    for chunk in cfm.sample_long_stream(rng=jax.random.PRNGKey(seed), **kw):
        n_samples += chunk.shape[-1]
        if t_first is None:
            t_first = time.perf_counter() - t0
    t_stream = time.perf_counter() - t0

    t0 = time.perf_counter()
    audio = cfm.sample_long(rng=jax.random.PRNGKey(seed + 1), **kw)
    float(jnp.asarray(audio, jnp.float32).sum())
    t_oneshot = time.perf_counter() - t0
    return t_first, t_stream, t_oneshot, n_samples


def main():
    cfm, params = build()
    run(cfm, params, seed=100)  # compile pass (sampler + chunk decodes)
    results = [run(cfm, params, seed=200 + 7 * i) for i in range(3)]
    t_first = min(r[0] for r in results)
    t_stream = min(r[1] for r in results)
    t_oneshot = min(r[2] for r in results)
    n_samples = results[0][3]
    audio_s = n_samples / 24000.0
    # the first yielded chunk is (WINDOW - OVERLAP) frames: drain() withholds
    # a decode_ctx right guard of OVERLAP frames until more latents arrive
    first_chunk_s = (WINDOW - OVERLAP) * 320 / 24000.0
    print(f"utterance: {audio_s:.1f} s audio ({n_samples} samples)")
    print(f"time-to-first-audio (streaming, {first_chunk_s:.1f} s chunk): "
          f"{t_first * 1e3:.1f} ms")
    print(f"streamed total: {t_stream * 1e3:.1f} ms  "
          f"(rtf {t_stream / audio_s:.4f})")
    print(f"one-shot sample_long: {t_oneshot * 1e3:.1f} ms  "
          f"(rtf {t_oneshot / audio_s:.4f})")
    print(f"TTFA speedup vs waiting for the whole utterance: "
          f"{t_oneshot / t_first:.2f}x")


if __name__ == "__main__":
    main()
