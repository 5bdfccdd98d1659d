"""Probe: long-sequence attention throughput on TPU — our Pallas FA-2 pair
(block-size sweep) vs jax's splash-attention kernel, at the shapes that own
the >4096 dispatch regime (the long-context training headline: dim 512 /
heads 4 x d 128 / seq ~7520, and the crossover-table shape b8 h8 d64 n8192).

The XLA fused path OOMs here (the materialised (b,h,n,n) f32 scores alone are
16 GB at b8 n8192), so whatever wins this probe owns the long-seq regime in
`ops/flash_attention.py::attend`.

Run on TPU: python benchmarks/longseq_attn_probe.py
"""

import functools
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def time_fwd_bwd(fn, q, k, v, reps=6):
    grad = jax.jit(jax.grad(
        lambda q, k, v: jnp.sum(fn(q, k, v).astype(jnp.float32) ** 2),
        argnums=(0, 1, 2),
    ))

    def run(i):
        # vary inputs per call: identical-input repeats can be served from a
        # cache on the axon backend (see PERFORMANCE.md methodology)
        dq, dk, dv = grad(q * (1 + 1e-6 * i), k, v)
        return float(jnp.sum(dq.astype(jnp.float32)))  # force remote exec

    run(0)  # compile
    ts = []
    for i in range(reps):
        t0 = time.perf_counter()
        run(i + 1)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def time_fwd(fn, q, k, v, reps=6):
    jf = jax.jit(lambda q, k, v: jnp.sum(fn(q, k, v).astype(jnp.float32)))
    float(jf(q, k, v))
    ts = []
    for i in range(reps):
        t0 = time.perf_counter()
        float(jf(q * (1 + 1e-6 * i), k, v))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def probe_shape(B, H, N, D, block_grid):
    from voicebox_tpu.ops.flash_attention import flash_attention

    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, H, N, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, H, N, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, H, N, D), jnp.bfloat16)

    # fwd+bwd FLOPs for reporting: fwd 4*n^2*d, bwd ~2.5x fwd (FA-2 recompute)
    fwd_flops = 4 * B * H * N * N * D

    results = {}
    for bq, bk in block_grid:
        try:
            fn = lambda q, k, v: flash_attention(q, k, v, None, D**-0.5, bq, bk)
            t_f = time_fwd(fn, q, k, v)
            t_fb = time_fwd_bwd(fn, q, k, v)
            results[f"ours_{bq}x{bk}"] = {
                "fwd_ms": round(t_f * 1e3, 2),
                "fwd_tfs": round(fwd_flops / t_f / 1e12, 1),
                "fwdbwd_ms": round(t_fb * 1e3, 2),
            }
        except Exception as e:  # OOM / VMEM overflow
            results[f"ours_{bq}x{bk}"] = str(e)[:160]
        print(f"  {B}x{H}x{N}x{D} ours {bq}/{bk}: {results[f'ours_{bq}x{bk}']}",
              flush=True)

    try:
        from jax.experimental.pallas.ops.tpu.splash_attention import (
            splash_attention_kernel as sk,
            splash_attention_mask as sm,
        )

        mask = sm.MultiHeadMask([sm.FullMask((N, N)) for _ in range(H)])
        kernel = sk.make_splash_mha_single_device(mask=mask)

        def splash(q, k, v):
            qs = (q.astype(jnp.float32) * (D**-0.5)).astype(q.dtype)
            return jax.vmap(kernel)(qs, k, v)

        t_f = time_fwd(splash, q, k, v)
        t_fb = time_fwd_bwd(splash, q, k, v)
        results["splash"] = {
            "fwd_ms": round(t_f * 1e3, 2),
            "fwd_tfs": round(fwd_flops / t_f / 1e12, 1),
            "fwdbwd_ms": round(t_fb * 1e3, 2),
        }
    except Exception as e:
        results["splash_error"] = str(e)[:300]
    print(f"  {B}x{H}x{N}x{D} splash: {results.get('splash', results.get('splash_error'))}",
          flush=True)
    return results


def main():
    print("backend:", jax.default_backend(), flush=True)
    out = {}
    # long-context training headline shape (batch 1, flagship heads)
    out["b1h4n7680d128"] = probe_shape(
        1, 4, 7680, 128,
        [(512, 1024), (1024, 512), (512, 512), (768, 768), (256, 1024)],
    )
    # crossover-table shape
    out["b8h8n8192d64"] = probe_shape(
        8, 8, 8192, 64, [(512, 1024), (1024, 512), (512, 512)]
    )
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
