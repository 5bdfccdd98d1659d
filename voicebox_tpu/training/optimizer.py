"""Optimizer factory (optax).

Mirrors the reference `get_optimizer` (optimizer.py:3-35): params with
`ndim < 2` (biases, norm gains, per-head gammas) are excluded from weight
decay; Adam when wd == 0 else AdamW; betas (0.9, 0.99), eps 1e-8. In optax the
partition is a `mask` tree rather than two param groups.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Union

import jax
import optax

__all__ = [
    "get_optimizer",
    "decay_mask",
    "warmup_cosine_schedule",
    "track_params_ema",
    "ema_params_from_state",
    "clip_by_global_norm_f32",
    "restore_adam_state",
    "adam_state_from_opt_state",
]


def clip_by_global_norm_f32(max_norm: float) -> optax.GradientTransformation:
    """`optax.clip_by_global_norm` with the norm ACCUMULATED IN F32.

    Identical math for f32 gradient trees (tested vs optax), but required for
    bf16 gradients (the `param_dtype=bfloat16` mixed-precision trainer):
    optax's `global_norm` sums squares in the leaf dtype, and a bf16
    accumulator over ~1e8 squared terms drops small terms once the running
    sum grows — the clip would act on a wrong norm. Scaled gradients KEEP
    their input dtype (an f32 upcast here would silently re-widen the bf16
    gradient stream the mixed-precision scheme exists to shrink)."""
    import jax.numpy as jnp

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params
        gnorm = jnp.sqrt(
            sum(jnp.sum(jnp.square(u.astype(jnp.float32)))
                for u in jax.tree.leaves(updates))
        )
        # optax semantics: scale only when over the limit
        scale = jnp.where(
            gnorm < max_norm, 1.0, max_norm / jnp.maximum(gnorm, 1e-16)
        )
        updates = jax.tree.map(
            lambda u: (u.astype(jnp.float32) * scale).astype(u.dtype), updates
        )
        return updates, state

    return optax.GradientTransformation(init, update)


def decay_mask(params):
    """True for params that should receive weight decay (ndim >= 2)."""
    return jax.tree.map(lambda p: p.ndim >= 2, params)


def _scale_by_adam_fused(
    b1, b2, eps, moment_dtype=None, clip_norm=None
) -> optax.GradientTransformation:
    """`optax.scale_by_adam` with two TPU HBM-bandwidth levers fused in:

    * `clip_norm`: global-norm clipping FOLDED INTO the moment update —
      `optax.chain(clip_by_global_norm, adam)` materialises a full scaled
      copy of the gradients (an extra ~0.9 GB read+write at the dim-512
      flagship, measured 2.7 ms/step); here the norm is one read-only pass
      and the scale rides along in the g32 multiply. Identical math.
    * `moment_dtype` (e.g. bf16): BOTH moments stored at reduced precision
      (optax's `mu_dtype` covers only the first). Math in f32; state and the
      O(1)-scaled update recast — the downstream decay/lr stages re-promote,
      and the f32 update buffer was the peak-memory straw at dim 1024.
    """
    import jax.numpy as jnp

    def init(params):
        zeros = lambda p: jnp.zeros_like(
            p, dtype=moment_dtype if moment_dtype is not None else p.dtype
        )
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(zeros, params),
            nu=jax.tree.map(zeros, params),
        )

    def update(grads, state, params=None):
        del params
        count = state.count + 1
        c = count.astype(jnp.float32)
        bc1 = 1.0 - jnp.power(b1, c)
        bc2 = 1.0 - jnp.power(b2, c)

        if clip_norm is not None:
            gnorm = optax.global_norm(grads)
            # optax.clip_by_global_norm semantics: scale only when over
            scale = jnp.where(
                gnorm < clip_norm, 1.0, clip_norm / jnp.maximum(gnorm, 1e-16)
            )
        else:
            scale = None

        def one(m, v, g):
            g32 = g.astype(jnp.float32)
            if scale is not None:
                g32 = g32 * scale
            m32 = b1 * m.astype(jnp.float32) + (1.0 - b1) * g32
            v32 = b2 * v.astype(jnp.float32) + (1.0 - b2) * jnp.square(g32)
            upd = (m32 / bc1) / (jnp.sqrt(v32 / bc2) + eps)
            if moment_dtype is None:
                return m32, v32, upd
            return (m32.astype(moment_dtype), v32.astype(moment_dtype),
                    upd.astype(moment_dtype))

        out = jax.tree.map(one, state.mu, state.nu, grads)
        mu = jax.tree.map(lambda o: o[0], out, is_leaf=lambda o: isinstance(o, tuple))
        nu = jax.tree.map(lambda o: o[1], out, is_leaf=lambda o: isinstance(o, tuple))
        updates = jax.tree.map(lambda o: o[2], out, is_leaf=lambda o: isinstance(o, tuple))
        return updates, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


class ParamsEmaState(NamedTuple):
    """State of `track_params_ema`: the exponential moving average of the
    POST-update parameters."""

    ema: optax.Params


def track_params_ema(decay: float, ema_dtype=None) -> optax.GradientTransformation:
    """Track an exponential moving average of the parameters INSIDE the
    optimizer chain (must be the LAST stage, so `params + updates` is the
    post-step value). The EMA tree rides in `opt_state`, which means
    checkpointing, sharding propagation, and buffer donation all apply to it
    with no extra plumbing. `ema_dtype` (e.g. bf16) halves its HBM traffic.

    Beyond-parity: the reference trains without EMA (trainer.py:60-321), but
    flow-matching sample quality conventionally comes from averaged weights
    (Voicebox paper §4.2 and the diffusion literature); off by default.
    """
    assert 0.0 < decay < 1.0, decay

    def init(params):
        import jax.numpy as jnp

        # explicit copy: aliasing the live param buffers would make the
        # trainer's donate_argnums=(0, 1) donate the same buffer twice
        cast = lambda p: jnp.array(p, dtype=ema_dtype or p.dtype, copy=True)
        return ParamsEmaState(ema=jax.tree.map(cast, params))

    def update(updates, state, params=None):
        import jax.numpy as jnp

        assert params is not None, "track_params_ema needs params in update()"

        def one(e, p, u):
            new_p = p.astype(jnp.float32) + u.astype(jnp.float32)
            e32 = e.astype(jnp.float32)
            return (e32 + (1.0 - decay) * (new_p - e32)).astype(e.dtype)

        return updates, ParamsEmaState(
            ema=jax.tree.map(one, state.ema, params, updates)
        )

    return optax.GradientTransformation(init, update)


def restore_adam_state(opt_state, mu, nu, count, params=None):
    """Surgically install ported Adam moments + step counter into a freshly
    inited optimizer state (the resume-from-reference path:
    `utils/port_weights.load_optimizer_torch` produces `mu`/`nu`/`count`).

    * the single `ScaleByAdamState` in the (possibly nested chain) state gets
      the ported `mu`/`nu` — cast leaf-by-leaf to the state's existing dtypes
      (so `moment_dtype=bfloat16` trainers restore into bf16 moments) — and
      its bias-correction `count`;
    * EVERY other stateful counter (e.g. the lr-schedule's
      `ScaleByScheduleState.count` when lr is a warmup+cosine schedule) is
      set to the same `count`, so the restored run resumes at the right
      learning rate;
    * a `ParamsEmaState` (the opt-in EMA tracker) is re-seeded from `params`
      when given — the EMA of a resumed foreign run restarts at the ported
      weights, since the reference trains without EMA and has none to port.
    """
    import jax.numpy as jnp

    n_adam = 0

    def cast_like(old_tree, new_tree):
        old_leaves, treedef = jax.tree.flatten(old_tree)
        new_leaves = jax.tree.leaves(new_tree)
        assert len(old_leaves) == len(new_leaves), (
            f"moment tree has {len(new_leaves)} leaves, state expects "
            f"{len(old_leaves)}"
        )
        out = []
        for o, n in zip(old_leaves, new_leaves):
            assert tuple(o.shape) == tuple(n.shape), (o.shape, n.shape)
            arr = jnp.asarray(n, dtype=o.dtype)
            # keep the fresh state's placement: on an FSDP/TP mesh the inited
            # moments are sharded, and replacing them with default-device
            # arrays would pile ~2x param bytes onto one chip at dim 1024
            sharding = getattr(o, "sharding", None)
            if sharding is not None:
                arr = jax.device_put(arr, sharding)
            out.append(arr)
        return jax.tree.unflatten(treedef, out)

    def rec(s):
        nonlocal n_adam
        if isinstance(s, optax.ScaleByAdamState):
            n_adam += 1
            return optax.ScaleByAdamState(
                count=jnp.asarray(count, s.count.dtype),
                mu=cast_like(s.mu, mu),
                nu=cast_like(s.nu, nu),
            )
        if isinstance(s, ParamsEmaState):
            if params is None:
                return s
            return ParamsEmaState(ema=cast_like(s.ema, params))
        if hasattr(s, "_fields"):  # other namedtuple states — recurse fields
            # (e.g. optax MaskedState.inner_state can nest further states)
            repl = {f: rec(getattr(s, f)) for f in s._fields}
            if "count" in s._fields:
                repl["count"] = jnp.asarray(count, s.count.dtype)
            return type(s)(**repl)
        if isinstance(s, (tuple, list)):
            return type(s)(rec(x) for x in s)
        return s

    new_state = rec(opt_state)
    assert n_adam == 1, (
        f"expected exactly one Adam state in the optimizer chain, found "
        f"{n_adam}"
    )
    return new_state


def adam_state_from_opt_state(opt_state):
    """Extract `(mu, nu, count)` from the single `ScaleByAdamState` in a
    (possibly nested chain) optimizer state — the export counterpart of
    `restore_adam_state`, feeding `utils/port_weights.export_optimizer_torch`
    so the reference trainer can resume a run trained here."""
    found = []

    def rec(s):
        if isinstance(s, optax.ScaleByAdamState):
            found.append(s)
            return
        if hasattr(s, "_fields"):  # other namedtuple states
            for f in s._fields:
                rec(getattr(s, f))
            return
        if isinstance(s, (tuple, list)):
            for x in s:
                rec(x)

    rec(opt_state)
    assert len(found) == 1, (
        f"expected exactly one Adam state in the optimizer chain, found "
        f"{len(found)}"
    )
    s = found[0]
    return s.mu, s.nu, int(s.count)


def ema_params_from_state(opt_state) -> Optional[optax.Params]:
    """Extract the EMA param tree from a (possibly nested chain) optimizer
    state; None when no `track_params_ema` stage is present."""
    if isinstance(opt_state, ParamsEmaState):
        return opt_state.ema
    if isinstance(opt_state, tuple):
        for sub in opt_state:
            found = ema_params_from_state(sub)
            if found is not None:
                return found
    return None


def get_optimizer(
    lr: Union[float, optax.Schedule] = 1e-4,
    wd: float = 1e-2,
    betas=(0.9, 0.99),
    eps: float = 1e-8,
    group_wd_params: bool = True,
    max_grad_norm: Optional[float] = None,
    moment_dtype=None,
    ema_decay: Optional[float] = None,
    ema_dtype=None,
) -> optax.GradientTransformation:
    """`moment_dtype` (e.g. jnp.bfloat16) stores BOTH Adam moments at reduced
    precision — a TPU HBM-bandwidth lever (the optimizer update is pure memory
    traffic; see PERFORMANCE.md): measured 42.0 -> 39.1 ms/step at the dim-512
    flagship. Off by default: the reference keeps f32 moments. The update math
    always runs in f32 (moments are upcast, updated, and recast).

    The global-norm clip stays a CHAINED `optax.clip_by_global_norm` stage:
    a variant with the clip scale folded into the adam update measured SLOWER
    (43.0 vs 42.0 ms/step on v5e) — XLA already fuses the chained scale into
    the update elementwise kernel, and the remaining ~2.7 ms no-clip delta is
    the global-norm reduction plus its all-gradients barrier, which no fusion
    can remove (documented dead-end, PERFORMANCE.md)."""
    has_wd = wd > 0

    if moment_dtype is not None:
        opt = optax.chain(
            _scale_by_adam_fused(betas[0], betas[1], eps,
                                 moment_dtype=moment_dtype),
            optax.add_decayed_weights(
                wd, mask=decay_mask if group_wd_params else None
            ) if has_wd else optax.identity(),
            optax.scale_by_learning_rate(lr),
        )
    elif has_wd:
        opt = optax.adamw(
            lr,
            b1=betas[0],
            b2=betas[1],
            eps=eps,
            weight_decay=wd,
            mask=decay_mask if group_wd_params else None,
        )
    else:
        opt = optax.adam(lr, b1=betas[0], b2=betas[1], eps=eps)

    if max_grad_norm is not None:
        # reference clips the global norm before the step (trainer.py:274-275).
        # f32-accumulated norm: exact for f32 grads, correct for bf16 grads
        opt = optax.chain(clip_by_global_norm_f32(max_grad_norm), opt)
    if ema_decay is not None:
        # LAST stage: sees the final updates, so params + updates is the
        # post-step value the EMA must track
        opt = optax.chain(opt, track_params_ema(ema_decay, ema_dtype=ema_dtype))
    return opt


def warmup_cosine_schedule(
    lr: float,
    initial_lr: float,
    num_warmup_steps: int,
    num_train_steps: int,
) -> optax.Schedule:
    """Linear warmup `initial_lr -> lr`, then cosine annealing with
    T_max = num_train_steps (the reference steps CosineAnnealingLR only after
    warmup, trainer.py:144-145,231-253)."""
    if num_warmup_steps <= 0:
        return optax.cosine_decay_schedule(lr, max(num_train_steps, 1))

    warmup = optax.linear_schedule(initial_lr, lr, num_warmup_steps)
    cosine = optax.cosine_decay_schedule(lr, max(num_train_steps, 1))
    return optax.join_schedules([warmup, cosine], [num_warmup_steps])
