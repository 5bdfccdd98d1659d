"""Measure speculative decoding on TRAINED weights (VERDICT r1 item 5).

Overfits the production-size TextToSemantic (dim 512, 6+6 layers — the same
config as PERFORMANCE.md's envelope measurement) on a deterministic toy
text->semantic mapping, then measures wall-clock for plain greedy vs
self-speculative decoding and checks output equality. Run on the TPU:

    python benchmarks/spec_decode_trained.py

Prints one JSON line with the trained-weights speedup — the real data point
between the 0.54x (zero-acceptance) and 1.31x (full-acceptance) envelope.
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
import optax

from voicebox_tpu.models.text_to_semantic import TextToSemantic
from voicebox_tpu.utils.tokenizer import GraphemeTokenizer

SEM_VOCAB = 500
TARGET_LEN = 200
N_VARIANTS = 8
MAX_LENGTH = 256
GAMMA = 5


def make_data(tok):
    rs = np.random.RandomState(0)
    texts = [
        "".join(rs.choice(list("abcdefghijklmnopqrstuvwxyz "), 16))
        for _ in range(N_VARIANTS)
    ]
    text_ids = tok.texts_to_tensor_ids(texts)
    # deterministic target pattern keyed off the variant index
    sem = np.stack(
        [(7 * v + 3 * np.arange(TARGET_LEN)) % (SEM_VOCAB - 1) for v in range(N_VARIANTS)]
    ).astype(np.int32)
    return jnp.asarray(text_ids), jnp.asarray(sem)


def main():
    print("backend:", jax.default_backend(), flush=True)
    tok = GraphemeTokenizer()
    tts = TextToSemantic(
        dim=512, source_depth=6, target_depth=6, heads=8, dim_head=64,
        tokenizer=tok, num_semantic_token_ids=SEM_VOCAB,
    )
    text_ids, sem_ids = make_data(tok)
    tts.init_params(jax.random.PRNGKey(0), n_text=text_ids.shape[1],
                    n_sem=TARGET_LEN, batch=N_VARIANTS)

    opt = optax.adam(3e-4)
    opt_state = jax.jit(opt.init)(tts.params)

    @jax.jit
    def train_step(params, opt_state, t, s):
        loss, grads = jax.value_and_grad(tts.loss_fn)(params, t, s)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    params = tts.params
    t0 = time.perf_counter()
    loss = None
    for step in range(4000):
        params, opt_state, loss = train_step(params, opt_state, text_ids, sem_ids)
        if step % 250 == 0:
            lv = float(loss)
            print(f"step {step}: loss {lv:.4f}", flush=True)
            if lv < 5e-3:
                break
    print(f"trained to loss {float(loss):.4f} in {time.perf_counter()-t0:.0f}s",
          flush=True)
    tts.params = params

    # correctness on trained weights: greedy reproduces the pattern, spec == greedy
    one = text_ids[:1]
    tok_g, mask_g = tts.generate(one, max_length=MAX_LENGTH, return_target_mask=True)
    tok_s, mask_s = tts.generate(one, max_length=MAX_LENGTH, return_target_mask=True,
                                 spec_decode=True, spec_decode_gamma=GAMMA)
    acc = float(
        (np.asarray(tok_g)[0, :TARGET_LEN] == np.asarray(sem_ids)[0]).mean()
    )
    spec_equal = bool((np.asarray(tok_g) == np.asarray(tok_s)).all()
                      and (np.asarray(mask_g) == np.asarray(mask_s)).all())
    gen_len = int(np.asarray(mask_g).sum())
    print(f"pattern accuracy {acc:.3f}, emitted {gen_len} tokens, "
          f"spec==greedy: {spec_equal}", flush=True)

    # timing: cycle text variants (axon result-cache dodge), block via float()
    variants = [text_ids[i : i + 1] for i in range(4)]

    def bench(spec):
        for v in variants:  # warm every variant's program + result path
            out = tts.generate(v, max_length=MAX_LENGTH, spec_decode=spec,
                               spec_decode_gamma=GAMMA)
            float(jnp.sum(out))
        reps = 24
        t0 = time.perf_counter()
        for i in range(reps):
            out = tts.generate(variants[i % len(variants)],
                               max_length=MAX_LENGTH, spec_decode=spec,
                               spec_decode_gamma=GAMMA)
            float(jnp.sum(out))
        return (time.perf_counter() - t0) / reps * 1e3

    greedy_ms = bench(False)
    spec_ms = bench(True)
    result = {
        "metric": "spec_decode_trained_speedup",
        "greedy_ms": round(greedy_ms, 2),
        "spec_ms": round(spec_ms, 2),
        "speedup": round(greedy_ms / spec_ms, 3),
        "pattern_accuracy": round(acc, 4),
        "spec_equals_greedy": spec_equal,
        "final_loss": round(float(loss), 5),
        "tokens": gen_len,
        "gamma": GAMMA,
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
