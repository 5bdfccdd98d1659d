"""Probe: jax's splash-attention TPU kernel vs our einsum path vs our Pallas
pair at the flagship training shape (b8 h4 n768 d128, bf16, fwd+bwd).

Decides whether splash earns a slot in ops/flash_attention.py's measured
dispatch. Run on TPU: python benchmarks/splash_attn_probe.py
"""

import functools
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

B, H, N, D = 8, 4, 768, 128


def time_fwd_bwd(fn, q, k, v, reps=10):
    loss = jax.jit(jax.grad(lambda q, k, v: jnp.sum(fn(q, k, v).astype(jnp.float32) ** 2), argnums=(0, 1, 2)))

    def run(i):
        key = jax.random.PRNGKey(i)
        dq, dk, dv = loss(q * (1 + 1e-6 * i), k, v)
        return float(jnp.sum(dq.astype(jnp.float32)))

    run(0)  # compile
    ts = []
    for i in range(reps):
        t0 = time.perf_counter()
        run(i + 1)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    print("backend:", jax.default_backend(), flush=True)
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, H, N, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, H, N, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, H, N, D), jnp.bfloat16)

    from voicebox_tpu.ops.flash_attention import flash_attention, reference_attention

    results = {}
    results["xla_einsum"] = time_fwd_bwd(
        lambda q, k, v: reference_attention(q, k, v, scale=D**-0.5), q, k, v
    )
    results["our_pallas"] = time_fwd_bwd(
        lambda q, k, v: flash_attention(q, k, v, None, D**-0.5), q, k, v
    )

    try:
        from jax.experimental.pallas.ops.tpu.splash_attention import (
            splash_attention_kernel as sk,
            splash_attention_mask as sm,
        )

        mask = sm.MultiHeadMask([sm.FullMask((N, N)) for _ in range(H)])
        kernel = sk.make_splash_mha_single_device(mask=mask)

        def splash(q, k, v):
            # splash expects (h, n, d) per batch row; vmap over batch.
            # scale: splash applies no default q scaling — fold into q.
            qs = (q.astype(jnp.float32) * (D**-0.5)).astype(q.dtype)
            return jax.vmap(kernel)(qs, k, v)

        results["jax_splash"] = time_fwd_bwd(splash, q, k, v)
    except Exception as e:
        results["jax_splash_error"] = str(e)[:300]

    print(json.dumps({k: (round(v * 1e3, 3) if isinstance(v, float) else v)
                      for k, v in results.items()}), flush=True)


if __name__ == "__main__":
    main()
