"""Does the K-scan differential overstate the real train-step time?

The device trace of the dim-512 K-scan step shows ~4.1 ms/step of
copy-done/async-done attributed to the scan carry: `lax.scan` double-buffers
the carried (params, opt_state) tree every iteration because the body reads
the old params (for grads) before writing the new ones. The REAL trainer
runs a `jit(..., donate_argnums=...)` step per call — input/output aliasing
lets XLA update the tree in place, so those copies should not exist there.

This probe measures the same step three ways on the TPU:
  scan    — (t[K=22] - t[K=2]) / 20 with the step body inside lax.scan
            (the methodology used so far; carries copy)
  chain   — K back-to-back host calls of the donated step, timed as the same
            differential; dispatch is async so enqueues pipeline and the
            leading tunnel RTT cancels in the differential
  chain1  — a single donated call timed cold (per-call number incl. RTT)

Measured answer (dim 512, v5e): scan 35.94 ms/step vs chain 36.16 ms/step —
the carry copies overlap compute and cost no wall time; the K-scan
differential is an honest stand-in for the donated trainer step.

Usage: python benchmarks/step_dispatch_probe.py [dim]
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


def build_pieces(dim):
    from benchmarks.dim1024_mixed import build
    from voicebox_tpu.training.optimizer import get_optimizer

    cfm = build(dim, 24)
    params = cfm.init_params(jax.random.PRNGKey(0), seq_len=SEQ_LEN, batch=2)
    opt = get_optimizer(lr=1e-4, wd=1e-2, max_grad_norm=0.5,
                        moment_dtype=jnp.bfloat16)
    opt_state = jax.jit(opt.init)(params)
    x = jax.random.normal(jax.random.PRNGKey(1), (BATCH, SEQ_LEN, LATENT_DIM))
    ids = jax.random.randint(jax.random.PRNGKey(2), (BATCH, SEQ_LEN), 0, 500)

    def body(p, o, key):
        loss, grads = jax.value_and_grad(cfm.loss_fn)(
            p, x, key, cond_token_ids=ids)
        updates, o = opt.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    return body, params, opt_state


def scan_differential(body, params, opt_state):
    def multi(K):
        @jax.jit
        def run(p, o, rng):
            def step(carry, key):
                p, o = carry
                p, o, loss = body(p, o, key)
                return (p, o), loss

            _, losses = jax.lax.scan(step, (p, o), jax.random.split(rng, K))
            return losses[-1]

        return run

    out = {}
    for K in (2, 22):
        f = multi(K)
        ts = []
        for rep in range(3):
            if rep == 0:
                float(f(params, opt_state, jax.random.PRNGKey(100 + K)))
            t0 = time.perf_counter()
            float(f(params, opt_state, jax.random.PRNGKey(200 + 31 * rep + K)))
            ts.append(time.perf_counter() - t0)
        out[K] = min(ts)
    return (out[22] - out[2]) / 20.0


def chain_differential(body, params, opt_state):
    step = jax.jit(body, donate_argnums=(0, 1))

    # warm up the compile on throwaway copies (donation consumes buffers)
    p = jax.tree.map(jnp.copy, params)
    o = jax.tree.map(jnp.copy, opt_state)
    p, o, loss = step(p, o, jax.random.PRNGKey(9))
    float(loss)

    def run(K, seed):
        nonlocal p, o
        t0 = time.perf_counter()
        loss = None
        for i in range(K):
            p, o, loss = step(p, o, jax.random.PRNGKey(seed + i))
        float(loss)
        return time.perf_counter() - t0

    out = {}
    for K in (2, 22):
        out[K] = min(run(K, 1000 * K + 97 * rep) for rep in range(3))
    single = min(run(1, 7000 + 13 * rep) for rep in range(3))
    return (out[22] - out[2]) / 20.0, single


def main():
    dim = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    print("backend:", jax.default_backend(), flush=True)
    body, params, opt_state = build_pieces(dim)
    scan_ms = scan_differential(body, params, opt_state) * 1e3
    print(f"scan differential: {scan_ms:.2f} ms/step", flush=True)
    chain_ms, single_s = chain_differential(body, params, opt_state)
    print(f"chain differential: {chain_ms * 1e3:.2f} ms/step")
    print(f"single donated call (incl. RTT): {single_s * 1e3:.2f} ms")
    print(json.dumps({
        "dim": dim,
        "scan_ms_per_step": round(scan_ms, 2),
        "chain_ms_per_step": round(chain_ms * 1e3, 2),
        "single_call_ms": round(single_s * 1e3, 2),
        "scan_steps_per_s": round(1e3 / scan_ms, 2),
        "chain_steps_per_s": round(1.0 / chain_ms, 2),
    }))


if __name__ == "__main__":
    main()
