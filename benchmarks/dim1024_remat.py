"""Measure selective-remat policies at the reference-default scale
(dim 1024, depth 24, ~705M params) — VERDICT r1 item 8.

At this scale single-chip training requires remat (PERFORMANCE.md); the round-1
number (4.80 steps/s) used full-recompute remat. `remat_policy='dots'` keeps
matmul outputs and recomputes only elementwise work — this script measures the
steps/s + HBM tradeoff. Run on the TPU:

    python benchmarks/dim1024_remat.py [policy ...]

Prints one JSON line per policy.
"""

import json
import os
import sys
import time

# backend-compiler options (e.g. '{"xla_tpu_scoped_vmem_limit_kib": "65536"}').
# XLA_FLAGS can't carry TPU flags here: the local client's flag parser is a
# CPU-only build that aborts on unknown flags, while jit(compiler_options=...)
# ships them to the device-side compiler over the tunnel.
_COMPILER_OPTS = json.loads(os.environ.get("VB_COMPILER_OPTIONS", "null"))

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import optax

SEQ_LEN = 752
LATENT_DIM = 128
BATCH = 8


def build(remat_policy, scan_layers=False, scores_dtype=None, use_flash=None, ff_mult=4.0):
    from voicebox_tpu import VoiceBox
    from voicebox_tpu.models.cfm import ConditionalFlowMatcherWrapper

    vb = VoiceBox(
        ff_mult=ff_mult,
        scan_layers=scan_layers,
        attn_scores_dtype=scores_dtype,
        use_flash=use_flash,
        num_cond_tokens=500,
        dim_in=LATENT_DIM,
        dim_cond_emb=512,
        dim=1024,
        depth=24,
        dim_head=128,
        heads=8,
        num_register_tokens=16,
        attn_qk_norm=True,
        condition_on_text=True,
        dtype=jnp.bfloat16,
        remat=True,
        remat_policy=remat_policy,
    )
    return ConditionalFlowMatcherWrapper(vb, cond_drop_prob=0.2)


def bench(remat_policy, moment_dtype=None, scan_layers=False,
          scores_dtype=None, use_flash=None, ff_mult=4.0):
    from voicebox_tpu.training.optimizer import get_optimizer

    cfm = build(remat_policy, scan_layers=scan_layers,
                scores_dtype=scores_dtype, use_flash=use_flash,
                ff_mult=ff_mult)
    params = cfm.init_params(jax.random.PRNGKey(0), seq_len=SEQ_LEN, batch=2)
    opt = get_optimizer(lr=1e-4, wd=1e-2, max_grad_norm=0.5,
                        moment_dtype=moment_dtype)
    opt_state = jax.jit(opt.init)(params)

    x = jax.random.normal(jax.random.PRNGKey(1), (BATCH, SEQ_LEN, LATENT_DIM))
    ids = jax.random.randint(jax.random.PRNGKey(2), (BATCH, SEQ_LEN), 0, 500)

    def multi(K):
        # donated params/opt_state: REQUIRED to fit 16 GB HBM at this scale
        @(lambda f: jax.jit(f, donate_argnums=(0, 1),
                            compiler_options=_COMPILER_OPTS))
        def run(params, opt_state, rng):
            def body(carry, key):
                p, o = carry
                loss, grads = jax.value_and_grad(cfm.loss_fn)(
                    p, x, key, cond_token_ids=ids
                )
                updates, o = opt.update(grads, o, p)
                return (optax.apply_updates(p, updates), o), loss

            keys = jax.random.split(rng, K)
            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), keys
            )
            return params, opt_state, losses[-1]

        return run

    best = {}
    for K in (2, 12):
        f = multi(K)
        ts = []
        for rep in range(3):
            if rep == 0:
                params, opt_state, loss = f(params, opt_state, jax.random.PRNGKey(7 + K))
                float(loss)  # compile + force
            t0 = time.perf_counter()
            params, opt_state, loss = f(params, opt_state,
                                        jax.random.PRNGKey(100 + 31 * rep + K))
            float(loss)
            ts.append(time.perf_counter() - t0)
        best[K] = min(ts)
    dt = (best[12] - best[2]) / 10
    return 1.0 / dt


def main():
    print("backend:", jax.default_backend(), flush=True)
    # each spec: "<policy>" with optional "+bf16m" / "+scan" / "+bf16s" flags
    specs = sys.argv[1:] or ["none", "dots"]
    _FLAGS = {"bf16m", "bf16s", "scan", "flash", "ffla"}
    for spec in specs:
        parts = spec.split("+")
        flags = {p for p in parts if p in _FLAGS}
        # everything else (re-joined) is the remat policy — composite names
        # like 'dots+attn_probs' pass through to _resolve_remat_policy
        name = "+".join(p for p in parts if p not in _FLAGS)
        policy = None if name in ("none", "") else name
        moment_dtype = jnp.bfloat16 if "bf16m" in flags else None
        scores_dtype = jnp.bfloat16 if "bf16s" in flags else None
        scan_layers = "scan" in flags
        use_flash = True if "flash" in flags else None
        ff_mult = 4.125 if "ffla" in flags else 4.0
        try:
            sps = bench(policy, moment_dtype=moment_dtype,
                        scan_layers=scan_layers, scores_dtype=scores_dtype,
                        use_flash=use_flash, ff_mult=ff_mult)
            print(json.dumps({
                "metric": "train_steps_per_sec_dim1024_depth24_bs8",
                "remat_policy": name,
                "moment_dtype": "bf16" if moment_dtype else "f32",
                "scores_dtype": "bf16" if scores_dtype else "f32",
                "scan_layers": scan_layers,
                "use_flash": bool(use_flash),
                "ff_mult": ff_mult,
                "value": round(sps, 3),
            }), flush=True)
        except Exception as e:  # OOM etc — record, keep going
            print(json.dumps({
                "metric": "train_steps_per_sec_dim1024_depth24_bs8",
                "spec": spec,
                "error": str(e)[:200],
            }), flush=True)


if __name__ == "__main__":
    main()
