"""Probe: does a (b, n, h, d) attention layout beat the (b, h, n, d) one?

The dim-512 device trace attributes ~0.65 ms/step to the explicit
(b,n,h*d) -> (b,h,n,d) transposes in `models/attention.py` (plus copies in
the data-formatting class); at dim 1024 transposes are a slice of the
14.9 ms async/formatting bucket. Hypothesis: keeping q/k/v in (b,n,h,d) and
letting `dot_general` batch over a non-major `h` dim removes the
materialised transposes (XLA folds the layout change into the matmul's
operand load) without hurting the MXU tiling.

This times fwd+bwd of a 24-block attention-only stack (qkv dense, per-head
f32 qk-norm with fixed scale 10, fp32 rotary, score softmax, out dense,
residual) in both layouts at both flagship geometries, via the K-scan
differential (see PERFORMANCE.md timing methodology).

Measured answer (v5e, bf16, per 24-block stack fwd+bwd): bnhd LOSES at both
flagship geometries — dim 512 h4d128: 15.26 (bhnd) vs 15.66 ms; dim 1024
h8d128: 54.57 vs 56.75 ms. dot_general pays more for the non-major batch
dim than the materialised transposes cost. Documented dead-end; the
explicit-transpose layout in models/attention.py stays.

Usage: python benchmarks/attn_layout_probe.py
"""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from voicebox_tpu.models.primitives import (
    apply_rotary_pos_emb,
    rotary_frequencies,
)

B, N = 8, 768
DEPTH = 24
SCALE = 10.0  # qk-norm fixed softmax scale


def _l2norm(x):
    return x * jax.lax.rsqrt(jnp.sum(x * x, axis=-1, keepdims=True) + 1e-12)


def make_params(key, dim, h, d, dtype):
    ks = jax.random.split(key, DEPTH * 2)
    blocks = []
    for i in range(DEPTH):
        blocks.append({
            "qkv": (jax.random.normal(ks[2 * i], (dim, 3 * h * d)) * dim**-0.5
                    ).astype(dtype),
            "out": (jax.random.normal(ks[2 * i + 1], (h * d, dim)) * dim**-0.5
                    ).astype(dtype),
            "qg": jnp.ones((h, d), jnp.float32),
            "kg": jnp.ones((h, d), jnp.float32),
        })
    return blocks


def block_bhnd(p, x, rot, scores_dtype):
    b, n, dim = x.shape
    h, d = p["qg"].shape
    qkv = x @ p["qkv"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q, k, v = (t.reshape(b, n, h, d).transpose(0, 2, 1, 3) for t in (q, k, v))
    # per-head qk-norm, f32 (gamma broadcast (h,1,d) over (b,h,n,d))
    q = (_l2norm(q.astype(jnp.float32)) * d**0.5 * p["qg"][:, None]).astype(x.dtype)
    k = (_l2norm(k.astype(jnp.float32)) * d**0.5 * p["kg"][:, None]).astype(x.dtype)
    q = apply_rotary_pos_emb(rot, q)
    k = apply_rotary_pos_emb(rot, k)
    sim = jnp.einsum("bhid,bhjd->bhij", q, k,
                     preferred_element_type=scores_dtype) * SCALE
    attn = jax.nn.softmax(sim, axis=-1)
    o = jnp.einsum("bhij,bhjd->bhid", attn.astype(v.dtype), v)
    o = o.transpose(0, 2, 1, 3).reshape(b, n, h * d)
    return x + o @ p["out"]


def block_bnhd(p, x, rot, scores_dtype):
    b, n, dim = x.shape
    h, d = p["qg"].shape
    qkv = x @ p["qkv"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q, k, v = (t.reshape(b, n, h, d) for t in (q, k, v))
    # gamma (h,d) broadcasts over (b,n,h,d); rotary pos needs a head axis
    q = (_l2norm(q.astype(jnp.float32)) * d**0.5 * p["qg"]).astype(x.dtype)
    k = (_l2norm(k.astype(jnp.float32)) * d**0.5 * p["kg"]).astype(x.dtype)
    q = apply_rotary_pos_emb(rot[:, None, :], q)
    k = apply_rotary_pos_emb(rot[:, None, :], k)
    sim = jnp.einsum("bihd,bjhd->bhij", q, k,
                     preferred_element_type=scores_dtype) * SCALE
    attn = jax.nn.softmax(sim, axis=-1)
    o = jnp.einsum("bhij,bjhd->bihd", attn.astype(v.dtype), v)
    o = o.reshape(b, n, h * d)
    return x + o @ p["out"]


def scan_time(step_fn, params, x0, K_pair=(2, 22), reps=3):
    def run(K):
        @jax.jit
        def prog(params, x, seed):
            # grads make this fwd+bwd like the train step; the input varies
            # per iteration (defeats result caching)
            def full(carry, i):
                def loss_fn(params):
                    x = carry + (1e-6 * (seed + i)).astype(carry.dtype)
                    for p in params:
                        x = step_fn(p, x)
                    return jnp.sum(x.astype(jnp.float32) ** 2)

                l, g = jax.value_and_grad(loss_fn)(params)
                gsum = sum(jnp.sum(v.astype(jnp.float32))
                           for blk in g for v in blk.values())
                return carry, l + 0.0 * gsum

            _, losses = jax.lax.scan(full, x, jnp.arange(K))
            return losses[-1]

        ts = []
        for rep in range(reps + 1):
            t0 = time.perf_counter()
            float(prog(params, x0, 1000 * K + 31 * rep))
            if rep:  # first call = compile
                ts.append(time.perf_counter() - t0)
        return min(ts)

    k2, k22 = K_pair
    return (run(k22) - run(k2)) / (k22 - k2)


def main():
    print("backend:", jax.default_backend(), flush=True)
    for name, dim, h, d in (("dim512-h4", 512, 4, 128),
                            ("dim1024-h8", 1024, 8, 128)):
        params = make_params(jax.random.PRNGKey(0), dim, h, d, jnp.bfloat16)
        x0 = jax.random.normal(jax.random.PRNGKey(1), (B, N, dim),
                               jnp.bfloat16)
        rot = rotary_frequencies(jnp.arange(N), d)
        for lname, blk in (("bhnd (current)", block_bhnd),
                           ("bnhd (no transpose)", block_bnhd)):
            f = functools.partial(blk, rot=rot, scores_dtype=jnp.bfloat16)
            t = scan_time(f, params, x0)
            print(f"  {name:12s} {lname:22s}: {t*1e3:7.2f} ms "
                  f"per {DEPTH}-block fwd+bwd", flush=True)


if __name__ == "__main__":
    main()
