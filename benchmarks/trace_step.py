"""Device-trace attribution of a train step — per-HLO-category time and the
top individual ops, captured over the axon tunnel (jax.profiler device traces
carry hlo_category / model_flops / raw_bytes_accessed per op).

Usage (on the TPU):
    python benchmarks/trace_step.py [dim] [variant]
      dim: 512 | 1024 (default 1024)
      variant: best (f32 params) | master (bf16 live + f32 master)

Prints a category table and the top-20 ops by device time.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import optax

SEQ_LEN = 752
LATENT_DIM = 128
BATCH = 8
K = 5  # steps per trace; per-step numbers divide by K


def build_step(dim, variant):
    from benchmarks.dim1024_mixed import build
    from voicebox_tpu.training.optimizer import get_optimizer

    cfm = build(dim, 24)
    master = cfm.init_params(jax.random.PRNGKey(0), seq_len=SEQ_LEN, batch=2)
    opt = get_optimizer(lr=1e-4, wd=1e-2, max_grad_norm=0.5,
                        moment_dtype=jnp.bfloat16)
    opt_state = jax.jit(opt.init)(master)
    x = jax.random.normal(jax.random.PRNGKey(1), (BATCH, SEQ_LEN, LATENT_DIM))
    ids = jax.random.randint(jax.random.PRNGKey(2), (BATCH, SEQ_LEN), 0, 500)

    if variant == "master":
        to_bf16 = lambda t: jax.tree.map(
            lambda p: p.astype(jnp.bfloat16), t)
        live = jax.jit(to_bf16)(master)

        @(lambda f: jax.jit(f, donate_argnums=(0,)))
        def run(state, rng):
            def body(carry, key):
                live, m, o = carry
                loss, grads = jax.value_and_grad(cfm.loss_fn)(
                    live, x, key, cond_token_ids=ids)
                updates, o = opt.update(grads, o, m)
                m = optax.apply_updates(m, updates)
                return (to_bf16(m), m, o), loss

            state, losses = jax.lax.scan(body, state, jax.random.split(rng, K))
            return state, losses[-1]

        return run, (live, master, opt_state)

    @(lambda f: jax.jit(f, donate_argnums=(0,)))
    def run(state, rng):
        def body(carry, key):
            p, o = carry
            loss, grads = jax.value_and_grad(cfm.loss_fn)(
                p, x, key, cond_token_ids=ids)
            updates, o = opt.update(grads, o, p)
            return (optax.apply_updates(p, updates), o), loss

        state, losses = jax.lax.scan(body, state, jax.random.split(rng, K))
        return state, losses[-1]

    return run, (master, opt_state)


def main():
    from voicebox_tpu.utils.profiling import format_attribution, parse_device_trace

    dim = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    variant = sys.argv[2] if len(sys.argv) > 2 else "best"
    print("backend:", jax.default_backend(), flush=True)
    run, state = build_step(dim, variant)
    state, loss = run(state, jax.random.PRNGKey(3))
    float(loss)  # compile + force
    trace_dir = f"/tmp/trace_{dim}_{variant}"
    jax.profiler.start_trace(trace_dir)
    state, loss = run(state, jax.random.PRNGKey(4))
    float(loss)
    jax.profiler.stop_trace()

    cats, ops = parse_device_trace(trace_dir)
    print(f"\n== {dim} {variant} ==")
    print(format_attribution(cats, ops, steps=K))


if __name__ == "__main__":
    main()
