"""Probe: optimizer-update bandwidth on TPU.

The dim-512 profiler attribution (PERFORMANCE.md) shows the optax
clip+AdamW chain at 6.8 ms/step — ~340 GB/s of traffic against an 819 GB/s
chip, i.e. ~2x off the elementwise roofline. This probe isolates the update
at both model scales and asks where the gap lives:

  A. production chain: clip_by_global_norm(0.5) + adamw          (baseline)
  B. adamw alone                                                  (clip cost)
  C. hand-fused per-leaf adam (one jnp expression per leaf)       (optax overhead)
  D. flat-buffer adam: state pre-flattened into one vector,
     grads flattened per step (includes the flatten/unflatten
     copies a real trainer would pay)                             (launch-count cost)

Traffic model per step: read g,p,m,v + write p,m,v = 7x param bytes (f32).
On-chip time via the K-step lax.scan differential (t_K12 - t_K2)/10 per
CLAUDE.md timing rules.
"""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
import optax


def make_tree(rng, n_leaves_big, big, n_leaves_small, small):
    """Synthetic param tree shaped like a transformer: a few big matrices and
    many small vectors/norm scales."""
    ks = jax.random.split(rng, n_leaves_big + n_leaves_small)
    tree = {}
    for i in range(n_leaves_big):
        tree[f"w{i}"] = jax.random.normal(ks[i], big) * 0.02
    for i in range(n_leaves_small):
        tree[f"b{i}"] = jax.random.normal(ks[n_leaves_big + i], small) * 0.02
    return tree


def scan_time(step_fn, init_carry, K=12, reps=4):
    """(t_K - t_2)/(K-2) on-chip seconds per step."""

    def run(K):
        # donate + chain the carry through calls (the trainer's own step
        # donates params/opt_state — without donation the dim-1024 tree
        # needs params + state + an undonated temp copy and OOMs)
        @functools.partial(jax.jit, donate_argnums=(0,))
        def prog(carry):
            def body(c, i):
                return step_fn(c, i), ()
            c, _ = jax.lax.scan(body, carry, jnp.arange(K))
            return c

        carry = jax.tree.map(jnp.copy, init_carry)
        carry = prog(carry)
        float(jnp.sum(jax.tree.leaves(carry)[0][..., :1].astype(jnp.float32)))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            carry = prog(carry)
            float(jnp.sum(jax.tree.leaves(carry)[0][..., :1].astype(jnp.float32)))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return (run(K) - run(2)) / (K - 2)


def probe(name, n_big, big, n_small, small):
    params = make_tree(jax.random.PRNGKey(0), n_big, big, n_small, small)
    n_bytes = sum(x.size * 4 for x in jax.tree.leaves(params))
    print(f"--- {name}: {n_bytes/1e9:.2f} GB params, "
          f"{n_big + n_small} leaves (traffic 7x = {7*n_bytes/1e9:.1f} GB/step)",
          flush=True)

    def grads_of(params, i):
        # cheap pseudo-grads that vary per step (defeats caching)
        return jax.tree.map(lambda p: p * (1e-3 + 1e-6 * i), params)

    def report(tag, t):
        print(f"  {tag:24s}: {t*1e3:7.2f} ms  {7*n_bytes/t/1e9:6.0f} GB/s",
              flush=True)

    # A/B: optax chains
    for tag, opt in (
        ("clip+adamw (production)", optax.chain(
            optax.clip_by_global_norm(0.5), optax.adamw(1e-4))),
        ("adamw alone", optax.adamw(1e-4)),
    ):
        state0 = jax.jit(opt.init)(params)

        def step(carry, i, opt=opt):
            p, s = carry
            g = grads_of(p, i)
            updates, s = opt.update(g, s, p)
            return (optax.apply_updates(p, updates), s)

        report(tag, scan_time(step, (params, state0)))

    # C: hand-fused per-leaf adam (no wd, no clip — pure update roofline)
    b1, b2, eps, lr = 0.9, 0.99, 1e-8, 1e-4
    m0 = jax.tree.map(jnp.zeros_like, params)

    def fused_step(carry, i):
        p, m, v = carry
        g = grads_of(p, i)
        m = jax.tree.map(lambda m_, g_: b1 * m_ + (1 - b1) * g_, m, g)
        v = jax.tree.map(lambda v_, g_: b2 * v_ + (1 - b2) * g_ * g_, v, g)
        p = jax.tree.map(
            lambda p_, m_, v_: p_ - lr * m_ / (jnp.sqrt(v_) + eps), p, m, v
        )
        return (p, m, v)

    report("hand-fused per-leaf", scan_time(fused_step, (params, m0, m0)))

    # D: flat-buffer adam (pay the per-step flatten of grads; state flat).
    # Skipped on big trees: ravel_pytree's extra full-tree copies double the
    # footprint and OOM — the copies are exactly why it loses anyway.
    if n_bytes > 1e9:
        print("  flat-buffer (w/ copies) : skipped (copies OOM at this scale)",
              flush=True)
        return
    flat, unravel = jax.flatten_util.ravel_pytree(params)
    z = jnp.zeros_like(flat)

    def flat_step(carry, i):
        p_tree, m, v = carry
        g_tree = grads_of(p_tree, i)
        g, _ = jax.flatten_util.ravel_pytree(g_tree)
        p, _ = jax.flatten_util.ravel_pytree(p_tree)
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        p = p - lr * m / (jnp.sqrt(v) + eps)
        return (unravel(p), m, v)

    report("flat-buffer (w/ copies)", scan_time(flat_step, (params, z, z)))


def main():
    print("backend:", jax.default_backend(), flush=True)
    # dim-512 flagship scale: 24 blocks x ~4 matrices + many small leaves
    probe("dim-512-like (~82M)", 96, (512, 1664), 220, (512,))
    # dim-1024-shaped leaves at ~half count: the probe holds TWO full
    # (params, m, v) carries (the chained one + the fresh-copy baseline), so
    # the true 705M tree (3x2.8 GB x 2) cannot fit 16 GB HBM here — the
    # trainer itself holds only one. Bandwidth conclusions are leaf-shape,
    # not tree-size, bound, so this half-size tree measures the same kernels.
    probe("dim-1024-like (~352M)", 48, (1536, 4776), 340, (1024,))


if __name__ == "__main__":
    main()
