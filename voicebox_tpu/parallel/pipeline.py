"""Pipeline parallelism for the Transformer backbone (beyond-reference).

The reference has no pipeline parallelism (SURVEY.md §2.3). This module
implements GPipe-style microbatch pipelining over a mesh 'pipe' axis as a
single jitted SPMD program (`shard_map` + `lax.ppermute`), the idiomatic TPU
pattern: no per-stage processes, no send/recv runtime — XLA overlaps each
step's collective-permute with the next step's compute on the ICI torus.

The U-Net topology pipelines as a **V-cycle**: activations flow UP the ring
through the first-half blocks (stage 0 → S-1), then back DOWN through the
second-half blocks (stage S-1 → 0). Stage i holds first-half rows
[i·k, (i+1)·k) and the MIRRORED second-half rows [(S-1-i)·k, (S-i)·k)
(k = depth/2/S) — the mirror assignment makes every U-Net skip connection
START and END on the same device (first-half row j's skip feeds second-half
row half-1-j), so skips never cross the wire; each stage just buffers its own
skips until the travelling microbatch comes back down. Total 2S phases;
device i is active at phases i and 2S-1-i, i.e. it does one front and one
back block-stack per step once the pipe fills — the standard circular
schedule, bubble fraction (2S-1)/(M+2S-1) for M microbatches.

Works on the `scan_layers=True` parameter layout (stacked leading depth
axis): `shard_map` shards the stacks over 'pipe' directly; second-half rows
are pre-permuted into mirror order host-side. Differentiable — reverse-mode
flows back through the `lax.scan` schedule and `ppermute` transposes, giving
the standard 1F1B-equivalent backward pipeline for free.

Usage::

    tr = Transformer(dim=..., depth=..., scan_layers=True, ...)
    params = tr.init(...)["params"]
    fn = make_pp_forward(tr, mesh, num_microbatches=M)   # Mesh((S,), ("pipe",))
    y = jax.jit(fn)(params, x, mask, cond)               # x: (M, b, n, dim)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..models.primitives import RMSNorm, rotary_frequencies

__all__ = ["PIPE_AXIS", "mirror_back_rows", "make_pp_forward"]

PIPE_AXIS = "pipe"


def mirror_back_rows(params: dict, num_stages: int) -> dict:
    """Reorder the `layers_back` stack so shard_map's natural row-chunking
    hands stage i the mirror rows [(S-1-i)·k, (S-i)·k) its own skips feed."""
    half = jax.tree.leaves(params["layers_back"])[0].shape[0]
    assert half % num_stages == 0, (
        f"depth/2 ({half}) must divide by the pipeline stages ({num_stages})"
    )
    k = half // num_stages
    order = np.concatenate(
        [np.arange((num_stages - 1 - i) * k, (num_stages - i) * k)
         for i in range(num_stages)]
    )
    out = dict(params)
    out["layers_back"] = jax.tree.map(lambda a: a[order], params["layers_back"])
    return out


def make_pp_forward(
    transformer,
    mesh: Mesh,
    *,
    num_microbatches: int,
    pipe_axis: str = PIPE_AXIS,
    deterministic: bool = True,
):
    """Build the pipelined forward of a `scan_layers=True` Transformer.

    Returns `fn(params, x, mask, adaptive_rmsnorm_cond)` with
    `x: (M, b, n, dim)` microbatches (`mask: (M, b, n)` or None, cond:
    `(M, b, cond_dim)` or None) -> `(M, b, n, dim)`, numerically matching
    `transformer.apply` per microbatch. `params` is the UNMODIFIED param tree
    from init — the back-row mirror permutation happens inside.
    """
    S = mesh.shape[pipe_axis]
    M = num_microbatches
    half = transformer.depth // 2
    assert half % S == 0, f"depth/2 ({half}) must divide by stages ({S})"
    assert transformer.seq_axis is None, (
        "compose PP with SP by nesting meshes is not wired yet"
    )
    from ..models.transformer import pipeline_stage_modules

    num_reg = int(transformer.num_register_tokens)
    front_mod, back_mod = pipeline_stage_modules(transformer, deterministic)
    final_norm = RMSNorm(dim=transformer.dim)
    B = 2 * S  # skip-buffer slots: > max microbatches in flight per stage
    T = M + 2 * S - 1  # fill + steady + drain

    has_cond = transformer.adaptive_rmsnorm

    def inner(stage_params, x_all, mask_all, cond_all, rotary_emb):
        i = jax.lax.axis_index(pipe_axis)
        front_rows = stage_params["layers_front"]
        back_rows = stage_params["layers_back"]
        b, n_tok, dim = x_all.shape[1:]
        k = half // S

        up = [(j, (j + 1) % S) for j in range(S)]
        down = [(j, (j - 1) % S) for j in range(S)]

        def pick(arr, m):  # per-microbatch side input, clamped index
            return jax.lax.dynamic_index_in_dim(
                arr, jnp.clip(m, 0, M - 1), axis=0, keepdims=False
            )

        def run_front(x, mask_m, cond_m):
            def body(c, row):
                y, skip = front_mod.apply(
                    {"params": row}, c, None, mask_m, rotary_emb, cond_m
                )
                return y, skip

            return jax.lax.scan(body, x, front_rows)  # (y, skips (k, b, n, d))

        def run_back(x, skips, mask_m, cond_m):
            def body(c, inp):
                row, skip = inp
                y, _ = back_mod.apply(
                    {"params": row}, c, skip, mask_m, rotary_emb, cond_m
                )
                return y, None

            # stage-local skip order: first-half row j pairs with second-half
            # row half-1-j, so this stage's back rows consume its own front
            # skips in reverse
            y, _ = jax.lax.scan(body, x, (back_rows, skips[::-1]))
            return y

        def step(carry, t):
            x_f, x_b, skip_buf, out_buf = carry
            m_f = t - i  # microbatch at my front phase
            m_b = t - (2 * S - 1 - i)  # microbatch at my back phase

            y_f, skips = run_front(x_f, pick(mask_all, m_f), pick(cond_all, m_f))
            skip_buf = jax.lax.dynamic_update_slice_in_dim(
                skip_buf, skips[None], jnp.mod(m_f, B), axis=0
            )
            skips_rd = jax.lax.dynamic_index_in_dim(
                skip_buf, jnp.mod(m_b, B), axis=0, keepdims=False
            )
            y_b = run_back(x_b, skips_rd, pick(mask_all, m_b), pick(cond_all, m_b))

            # collect: device 0's back output at step t is microbatch t-(2S-1).
            # invalid early writes (m_b < 0) clamp to slot 0 and are
            # overwritten by the valid write later; m_b never exceeds M-1 on
            # device 0 (other devices' buffers are discarded)
            out_buf = jax.lax.dynamic_update_slice_in_dim(
                out_buf, y_b[None], jnp.clip(m_b, 0, M - 1), axis=0
            )

            recv_f = jax.lax.ppermute(y_f, pipe_axis, up)
            recv_b = jax.lax.ppermute(y_b, pipe_axis, down)
            inject = jax.lax.dynamic_index_in_dim(
                x_all, jnp.clip(t + 1, 0, M - 1), axis=0, keepdims=False
            )
            x_f_next = jnp.where(i == 0, inject, recv_f)
            # the top stage's front output turns around into its own back phase
            x_b_next = jnp.where(i == S - 1, y_f, recv_b)
            return (x_f_next, x_b_next, skip_buf, out_buf), None

        x0 = x_all[0]  # device 0's first injection (others compute garbage)
        zeros = jnp.zeros_like(x0)
        skip_buf = jnp.zeros((B, k, b, n_tok, dim), dtype=x_all.dtype)
        out_buf = jnp.zeros((M, b, n_tok, dim), dtype=x_all.dtype)
        # the carry becomes device-varying after one loop step; mark the
        # (replicated-born) initial values as varying for the vma checker
        carry0 = jax.tree.map(
            lambda a: jax.lax.pcast(a, (pipe_axis,), to="varying"),
            (x0, zeros, skip_buf, out_buf),
        )
        (_, _, _, out_buf), _ = jax.lax.scan(step, carry0, jnp.arange(T))
        return out_buf[None]  # leading 'pipe' axis; caller takes stage 0's

    def fn(params, x, mask=None, adaptive_rmsnorm_cond=None):
        assert x.shape[0] == M, f"expected {M} microbatches, got {x.shape[0]}"
        params = mirror_back_rows(params, S)
        b, n = x.shape[1], x.shape[2]
        if mask is None:
            mask = jnp.ones((M, b, n), dtype=bool)
        if has_cond:
            assert adaptive_rmsnorm_cond is not None
        else:
            # dummy; _HalfStack ignores norm_cond without adaptive_rmsnorm
            adaptive_rmsnorm_cond = jnp.zeros((M, b, 1), dtype=x.dtype)

        if num_reg > 0:
            regs = params["register_tokens"].astype(x.dtype)
            regs = jnp.broadcast_to(regs[None, None], (M, b, num_reg, x.shape[-1]))
            x = jnp.concatenate([regs, x], axis=2)
            mask = jnp.pad(mask, ((0, 0), (0, 0), (num_reg, 0)),
                           constant_values=True)

        positions = jnp.arange(n, dtype=jnp.int32)
        if num_reg > 0:
            positions = jnp.concatenate(
                [jnp.full((num_reg,), -10000, dtype=jnp.int32), positions]
            )
        rotary_emb = rotary_frequencies(
            positions, transformer.dim_head, transformer.rotary_theta
        )

        stage_params = {
            "layers_front": params["layers_front"],
            "layers_back": params["layers_back"],
        }
        in_specs = (
            {"layers_front": P(pipe_axis), "layers_back": P(pipe_axis)},
            P(),  # x microbatches, replicated (stage 0 injects)
            P(),  # masks
            P(),  # adaptive-norm cond (or dummy)
            P(),  # rotary table
        )
        sharded = jax.shard_map(
            inner, mesh=mesh,
            in_specs=in_specs,
            out_specs=P(pipe_axis),
        )
        out = sharded(stage_params, x, mask, adaptive_rmsnorm_cond, rotary_emb)[0]

        if num_reg > 0:
            out = out[:, :, num_reg:]
        return final_norm.apply({"params": params["final_norm"]}, out)

    return fn
