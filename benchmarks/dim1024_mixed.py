"""Mixed-precision parameter storage at the reference-default scale
(dim 1024, depth 24, ~705M params) — round-3 perf frontier probe.

Scheme under test ("bf16 master training", the TPU-standard mixed-precision
recipe): the LIVE param tree handed to fwd/bwd is stored in bf16 and an f32
master copy rides next to the optimizer state. Per-step HBM traffic deltas vs
the f32-param baseline (705M params, 2.8 GB f32 / 1.4 GB bf16):

* fwd weight read   2.8 -> 1.4 GB   (flax casts f32->bf16 at use anyway;
                                     storing bf16 halves the stream)
* bwd dgrad read    2.8 -> 1.4 GB
* gradient tree     f32 -> bf16     (grad dtype follows the primal params:
                                     1.4 GB less write + 1.4 GB less read)
* optimizer         master f32 read/write unchanged; +1.4 GB bf16-param write

Net ~ -5.6 GB/step ≈ -7 ms at the 819 GB/s roofline, IF the numerics and the
16 GB HBM fit (+1.4 GB state for the master copy) both hold.

Run on the TPU:  python benchmarks/dim1024_mixed.py [best master ...]
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

BEST_POLICY = "dots+attn_probs+qk_rotary+norm_out"


def build(dim=1024, depth=24):
    from voicebox_tpu import VoiceBox
    from voicebox_tpu.models.cfm import ConditionalFlowMatcherWrapper

    vb = VoiceBox(
        ff_mult=4.125,
        attn_scores_dtype=jnp.bfloat16,
        num_cond_tokens=500,
        dim_in=LATENT_DIM,
        dim_cond_emb=512,
        dim=dim,
        depth=depth,
        dim_head=128,
        heads=dim // 128,
        num_register_tokens=16,
        attn_qk_norm=True,
        condition_on_text=True,
        dtype=jnp.bfloat16,
        remat=(dim >= 1024),
        remat_policy=BEST_POLICY if dim >= 1024 else None,
    )
    return ConditionalFlowMatcherWrapper(vb, cond_drop_prob=0.2)


def timed(make_run, params_state):
    """K-scan differential on the donated step; params_state is a tuple tree
    donated whole."""
    best = {}
    state = params_state
    for K in (2, 12):
        f = make_run(K)
        ts = []
        for rep in range(3):
            if rep == 0:
                state, loss = f(state, jax.random.PRNGKey(7 + K))
                float(loss)  # compile + force
            t0 = time.perf_counter()
            state, loss = f(state, jax.random.PRNGKey(100 + 31 * rep + K))
            float(loss)
            ts.append(time.perf_counter() - t0)
        best[K] = min(ts)
    return 1.0 / ((best[12] - best[2]) / 10), state


def bench_baseline(dim=1024, depth=24):
    from voicebox_tpu.training.optimizer import get_optimizer

    cfm = build(dim, depth)
    params = cfm.init_params(jax.random.PRNGKey(0), seq_len=SEQ_LEN, batch=2)
    opt = get_optimizer(lr=1e-4, wd=1e-2, max_grad_norm=0.5,
                        moment_dtype=jnp.bfloat16)
    opt_state = jax.jit(opt.init)(params)

    x = jax.random.normal(jax.random.PRNGKey(1), (BATCH, SEQ_LEN, LATENT_DIM))
    ids = jax.random.randint(jax.random.PRNGKey(2), (BATCH, SEQ_LEN), 0, 500)

    def make_run(K):
        @(lambda f: jax.jit(f, donate_argnums=(0,)))
        def run(state, rng):
            def body(carry, key):
                p, o = carry
                loss, grads = jax.value_and_grad(cfm.loss_fn)(
                    p, x, key, cond_token_ids=ids
                )
                updates, o = opt.update(grads, o, p)
                return (optax.apply_updates(p, updates), o), loss

            state, losses = jax.lax.scan(body, state, jax.random.split(rng, K))
            return state, losses[-1]

        return run

    sps, _ = timed(make_run, (params, opt_state))
    return sps


def bench_master(dim=1024, depth=24):
    """bf16 live params + f32 master; grads arrive in bf16."""
    from voicebox_tpu.training.optimizer import get_optimizer

    cfm = build(dim, depth)
    master = cfm.init_params(jax.random.PRNGKey(0), seq_len=SEQ_LEN, batch=2)
    opt = get_optimizer(lr=1e-4, wd=1e-2, max_grad_norm=0.5,
                        moment_dtype=jnp.bfloat16)
    opt_state = jax.jit(opt.init)(master)
    to_bf16 = lambda t: jax.tree.map(lambda p: p.astype(jnp.bfloat16), t)
    live = jax.jit(to_bf16)(master)

    x = jax.random.normal(jax.random.PRNGKey(1), (BATCH, SEQ_LEN, LATENT_DIM))
    ids = jax.random.randint(jax.random.PRNGKey(2), (BATCH, SEQ_LEN), 0, 500)

    def make_run(K):
        @(lambda f: jax.jit(f, donate_argnums=(0,)))
        def run(state, rng):
            def body(carry, key):
                live, m, o = carry
                loss, grads = jax.value_and_grad(cfm.loss_fn)(
                    live, x, key, cond_token_ids=ids
                )
                updates, o = opt.update(grads, o, m)
                m = optax.apply_updates(m, updates)
                return (to_bf16(m), m, o), loss

            state, losses = jax.lax.scan(body, state, jax.random.split(rng, K))
            return state, losses[-1]

        return run

    sps, _ = timed(make_run, (live, master, opt_state))
    return sps


def main():
    print("backend:", jax.default_backend(), flush=True)
    specs = sys.argv[1:] or ["best", "master"]
    for spec in specs:
        dim = 512 if spec.endswith("512") else 1024
        depth = 24
        kind = spec.replace("512", "").rstrip("_") or "best"
        fn = {"best": bench_baseline, "master": bench_master}[kind]
        try:
            sps = fn(dim, depth)
            print(json.dumps({
                "metric": f"train_steps_per_sec_dim{dim}_depth{depth}_bs8",
                "variant": kind,
                "value": round(sps, 3),
            }), flush=True)
        except Exception as e:
            print(json.dumps({"spec": spec, "error": str(e)[:300]}), flush=True)


if __name__ == "__main__":
    main()
