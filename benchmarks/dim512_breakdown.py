"""Fine-grained attribution of the dim-512 flagship train step (VERDICT r1
item 8): A/B the full config against variants with one feature removed, via
the K-step scan differential. The deltas say where the 42.5 ms/step lives and
which fusion lever (AdaRMSNorm epilogue, GEGLU, qk-norm, optimizer) is worth
building. Run on the TPU:

    python benchmarks/dim512_breakdown.py

Prints one JSON line per variant.
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import optax

SEQ_LEN = 752
LATENT_DIM = 128
BATCH = 8


def build(**overrides):
    from voicebox_tpu import VoiceBox
    from voicebox_tpu.models.cfm import ConditionalFlowMatcherWrapper

    kw = dict(
        num_cond_tokens=500, dim_in=LATENT_DIM, dim_cond_emb=512, dim=512,
        depth=24, dim_head=128, heads=4, num_register_tokens=16,
        attn_qk_norm=True, condition_on_text=True, dtype=jnp.bfloat16,
    )
    kw.update(overrides)
    return ConditionalFlowMatcherWrapper(VoiceBox(**kw), cond_drop_prob=0.2)


def bench_step(cfm, *, clip=0.5, wd=1e-2, fwd_only=False, moment_dtype=None):
    from voicebox_tpu.training.optimizer import get_optimizer

    params = cfm.init_params(jax.random.PRNGKey(0), seq_len=SEQ_LEN, batch=2)
    opt = get_optimizer(lr=1e-4, wd=wd, max_grad_norm=clip,
                        moment_dtype=moment_dtype)
    opt_state = jax.jit(opt.init)(params)

    x = jax.random.normal(jax.random.PRNGKey(1), (BATCH, SEQ_LEN, LATENT_DIM))
    ids = jax.random.randint(jax.random.PRNGKey(2), (BATCH, SEQ_LEN), 0, 500)

    def multi(K):
        @jax.jit
        def run(params, opt_state, rng):
            def body(carry, key):
                p, o = carry
                if fwd_only:
                    loss = cfm.loss_fn(p, x, key, cond_token_ids=ids)
                    return (p, o), loss
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
                float(f(params, opt_state, jax.random.PRNGKey(100 + K)))
            t0 = time.perf_counter()
            float(f(params, opt_state, jax.random.PRNGKey(200 + 31 * rep + K)))
            ts.append(time.perf_counter() - t0)
        best[K] = min(ts)
    return (best[22] - best[2]) / 20


def main():
    print("backend:", jax.default_backend(), flush=True)
    variants = [
        ("full", {}, {}),
        ("fwd_only", {}, {"fwd_only": True}),
        ("no_clip", {}, {"clip": None}),
        ("no_qk_norm", {"attn_qk_norm": False}, {}),
        ("no_registers", {"num_register_tokens": 0}, {}),
        ("bf16_moments", {}, {"moment_dtype": jnp.bfloat16}),
        # GEGLU inner dim: reference 2/3 rule gives 1365 (not lane-aligned);
        # mult 4.125 lands it on 1408 = 11*128 (+3% params)
        ("ff_lane_aligned", {"ff_mult": 4.125}, {}),
        ("ff_lane_aligned_bf16m", {"ff_mult": 4.125},
         {"moment_dtype": jnp.bfloat16}),
        # bf16 score matrix + softmax (VoiceBox attn_scores_dtype opt-in):
        # halves the (b,h,n,n) HBM traffic, relaxes f32 softmax numerics
        ("bf16_scores", {"attn_scores_dtype": jnp.bfloat16}, {}),
        ("bf16_scores_stacked",
         {"ff_mult": 4.125, "attn_scores_dtype": jnp.bfloat16},
         {"moment_dtype": jnp.bfloat16}),
        # Pallas flash pair at the swept short-seq blocks (384/768 at n=768
        # d=128, benchmarks/train_attn_sweep.py) instead of XLA's fused path
        ("flash_stacked", {"ff_mult": 4.125, "use_flash": True},
         {"moment_dtype": jnp.bfloat16}),
    ]
    if len(sys.argv) > 1:
        names = set(sys.argv[1:])
        variants = [v for v in variants if v[0] in names]
    results = {}
    for name, mkw, bkw in variants:
        dt = bench_step(build(**mkw), **bkw)
        results[name] = dt
        print(json.dumps({
            "variant": name, "ms_per_step": round(dt * 1e3, 2),
            "steps_per_sec": round(1.0 / dt, 2),
        }), flush=True)
    if "full" in results:
        base = results["full"]
        deltas = {k: round((base - v) * 1e3, 2) for k, v in results.items()
                  if k != "full"}
        print(json.dumps({"deltas_ms_vs_full": deltas}), flush=True)


if __name__ == "__main__":
    main()
