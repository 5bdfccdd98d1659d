"""Block-shape sweep of the Pallas flash pair at the TRAIN geometries
(VERDICT r2 item 4): d=128 heads, n=768 (752 frames + 16 registers), bf16,
fwd+bwd — the shapes where PERFORMANCE.md's device trace shows XLA spilling
the f32 score tensor (2.15 ms/step at dim 512).

Sweeps (block_q, block_k) including the single-block config (768, 768) where
the whole KV lives in VMEM and the backward recomputes scores without any
HBM spill — the best-case flash geometry the prior 512/1024-block measurement
never tried. Compares against XLA's fused attention (reference_attention
under jit; XLA fuses the chain into its flash-like pattern with the score
spill).

Run on TPU:  python benchmarks/train_attn_sweep.py
Prints one JSON line per config; the verdict goes to PERFORMANCE.md and, if
a Pallas config wins, ops/flash_attention.py's dispatch policy.
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

SHAPES = [
    ("dim1024-geometry", 8, 8, 768, 128),
    ("dim512-geometry", 8, 4, 768, 128),
]
BLOCKS = [(768, 768), (384, 768), (256, 768), (768, 384), (384, 384),
          (256, 256), (512, 768), (512, 1024)]


def time_fwd_bwd(fn, q, k, v, reps=5):
    """On-chip fwd+bwd time via the K-step scan differential (CLAUDE.md):
    (t_K22 - t_K2) / 20 — dispatch/tunnel RTT cancels; the carry feeds each
    iteration fresh inputs so nothing is served from a cache."""
    grad = jax.grad(
        lambda q, k, v: jnp.sum(fn(q, k, v).astype(jnp.float32) ** 2),
        argnums=(0, 1, 2),
    )

    def k_steps(K):
        @jax.jit
        def run(q, k, v, seed):
            def body(carry, _):
                qq, s = carry
                dq, dk, dv = grad(qq, k, v)
                s = s + jnp.sum(dq.astype(jnp.float32))
                # perturb q from the grad so iterations chain (no caching)
                qq = qq + (dq * jnp.float32(1e-12)).astype(qq.dtype)
                return (qq, s), None

            (qq, s), _ = jax.lax.scan(body, (q + seed, 0.0), None, length=K)
            return s

        return run

    r22, r2 = k_steps(22), k_steps(2)

    def sample(i):
        seed = jnp.bfloat16(1e-6 * i)
        t0 = time.perf_counter()
        float(r22(q, k, v, seed))
        t22 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(r2(q, k, v, seed))
        t2 = time.perf_counter() - t0
        return (t22 - t2) / 20.0

    sample(0)  # compile both
    return min(sample(i + 1) for i in range(reps))


def main():
    print("backend:", jax.default_backend(), flush=True)
    from voicebox_tpu.ops.flash_attention import (
        flash_attention,
        reference_attention,
    )

    for name, b, h, n, d in SHAPES:
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(ks[0], (b, h, n, d), jnp.bfloat16)
        k = jax.random.normal(ks[1], (b, h, n, d), jnp.bfloat16)
        v = jax.random.normal(ks[2], (b, h, n, d), jnp.bfloat16)

        results = {"shape": f"b{b} h{h} n{n} d{d}"}
        results["xla_fused"] = time_fwd_bwd(
            lambda q, k, v: reference_attention(q, k, v, scale=d ** -0.5),
            q, k, v,
        )
        for bq, bk in BLOCKS:
            try:
                results[f"pallas_{bq}_{bk}"] = time_fwd_bwd(
                    lambda q, k, v, bq=bq, bk=bk: flash_attention(
                        q, k, v, None, d ** -0.5, bq, bk
                    ),
                    q, k, v,
                )
            except Exception as e:  # VMEM overflow etc: record, keep going
                results[f"pallas_{bq}_{bk}"] = f"error: {str(e)[:120]}"
        print(json.dumps({
            kk: (round(vv * 1e3, 3) if isinstance(vv, float) else vv)
            for kk, vv in results.items()
        }, indent=None), flush=True)


if __name__ == "__main__":
    main()
