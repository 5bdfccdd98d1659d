"""Seq2seq (text→semantic) training throughput on the real TPU chip.

Measures the spear-tts-stage trainer's jitted step at the upstream-typical
scale (dim 512, 6-layer encoder + 6-layer decoder, the default
`TextToSemantic` geometry this framework ships) — the reference has no
number to beat here (it consumes the stage pretrained), so this records the
capability's cost: steps/s for teacher-forced CE at batch 32.

Timing follows the repo-wide tunneled-TPU recipe (PERFORMANCE.md): K-step
`lax.scan` differential (t_K22 − t_K2)/20 so dispatch/tunnel overhead
cancels; PRNG varies per call to defeat identical-input caching.

    python benchmarks/seq2seq_train.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import optax

N_TEXT, N_SEM = 256, 501  # IPA-ish text vocab; 500 kmeans clusters + 1
BATCH, N_TXT_LEN, N_SEM_LEN = 32, 128, 384  # ~7.7 s utterances at 50 Hz


def main():
    from voicebox_tpu import TextToSemantic
    from voicebox_tpu.training.optimizer import get_optimizer

    t2s = TextToSemantic(
        dim=512, num_text_token_ids=N_TEXT, num_semantic_token_ids=N_SEM,
        source_depth=6, target_depth=6, heads=8, dim_head=64,
    )
    params = t2s.init_params(jax.random.PRNGKey(0))
    opt = get_optimizer(lr=3e-4, wd=1e-2, max_grad_norm=0.5)
    opt_state = jax.jit(opt.init)(params)

    text = jax.random.randint(
        jax.random.PRNGKey(1), (BATCH, N_TXT_LEN), 0, N_TEXT
    )
    sem = jax.random.randint(
        jax.random.PRNGKey(2), (BATCH, N_SEM_LEN), 0, N_SEM - 1
    )

    def multi(K):
        @jax.jit
        def run(params, opt_state, rng):
            def body(carry, key):
                p, o = carry
                # vary the target ids per step (cache-defeating input churn,
                # same cost profile)
                s = jnp.where(
                    jax.random.bernoulli(key, 0.01, sem.shape), 0, sem
                )
                loss, grads = jax.value_and_grad(t2s.loss_fn)(p, text, s)
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
                float(f(params, opt_state, jax.random.PRNGKey(100 + K)))
            t0 = time.perf_counter()
            float(f(params, opt_state, jax.random.PRNGKey(200 + 31 * rep + K)))
            ts.append(time.perf_counter() - t0)
        best[K] = min(ts)
    dt = (best[22] - best[2]) / 20
    steps_s = 1.0 / dt
    toks_s = steps_s * BATCH * N_SEM_LEN
    print({
        "metric": "seq2seq_train_steps_per_s",
        "value": round(steps_s, 2),
        "unit": "steps/s",
        "detail": {
            "dim": 512, "enc_depth": 6, "dec_depth": 6,
            "batch": BATCH, "text_len": N_TXT_LEN, "sem_len": N_SEM_LEN,
            "target_tokens_per_s": round(toks_s),
        },
    })


if __name__ == "__main__":
    main()
