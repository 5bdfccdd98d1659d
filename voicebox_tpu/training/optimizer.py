"""Optimizer factory (optax).

Mirrors the reference `get_optimizer` (optimizer.py:3-35): params with
`ndim < 2` (biases, norm gains, per-head gammas) are excluded from weight
decay; Adam when wd == 0 else AdamW; betas (0.9, 0.99), eps 1e-8. In optax the
partition is a `mask` tree rather than two param groups.
"""

from __future__ import annotations

from typing import Optional, Union

import jax
import optax

__all__ = ["get_optimizer", "decay_mask", "warmup_cosine_schedule"]


def decay_mask(params):
    """True for params that should receive weight decay (ndim >= 2)."""
    return jax.tree.map(lambda p: p.ndim >= 2, params)


def get_optimizer(
    lr: Union[float, optax.Schedule] = 1e-4,
    wd: float = 1e-2,
    betas=(0.9, 0.99),
    eps: float = 1e-8,
    group_wd_params: bool = True,
    max_grad_norm: Optional[float] = None,
) -> optax.GradientTransformation:
    has_wd = wd > 0

    if has_wd:
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
        # reference clips the global norm before the step (trainer.py:274-275)
        return optax.chain(optax.clip_by_global_norm(max_grad_norm), opt)
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
