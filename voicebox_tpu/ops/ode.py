"""Fixed-step ODE solvers under `lax.scan` — the TPU-native replacement for
`torchdiffeq.odeint(..., method='midpoint')` (reference
voicebox_pytorch.py:1157-1161,1292-1296) and the torchode Tsit5 path
(voicebox_pytorch.py:1297-1322).

Design: the reference integrates with a *fixed* evaluation grid
(`torch.linspace(0, 1, steps)`) and the paper's method of choice is midpoint,
so an adaptive controller buys nothing — a fixed-step solver whose step loop is
a `lax.scan` compiles to a single XLA while-program with static shapes, which
is exactly what the TPU wants. atol/rtol therefore do not apply.

All solvers share the signature::

    yT, trajectory = solver(fn, y0, times)

where `fn(t, y) -> dy/dt` with scalar `t`, `times` is a 1-D array of
evaluation points (static length), and `trajectory` has shape
`(len(times), *y0.shape)` matching torchdiffeq's return contract.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["odeint", "odeint_midpoint", "odeint_euler", "odeint_rk4",
           "odeint_tsit5", "odeint_tsit5_adaptive", "cfm_interpolant"]


def cfm_interpolant(x1: jax.Array, x0: jax.Array, times: jax.Array,
                    sigma: float = 0.0):
    """The conditional-flow-matching interpolant and its target vector field
    (voicebox_pytorch.py:1407-1410):

        w    = (1 - (1 - sigma) t) x0 + t x1
        flow = x1 - (1 - sigma) x0

    `times` is per-sample `(b,)`; x0/x1 are `(b, n, d)`. Single source of
    truth for the training objective — used by both the single-device loss
    (models/cfm.py) and the sequence-parallel loss (parallel/
    sequence_parallel.py)."""
    t = times[:, None, None].astype(x1.dtype)
    w = (1.0 - (1.0 - sigma) * t) * x0 + t * x1
    flow = x1 - (1.0 - sigma) * x0
    return w, flow


def _solve(step_fn: Callable, fn: Callable, y0: jax.Array, times: jax.Array):
    t0s, t1s = times[:-1], times[1:]

    def scan_body(y, ts):
        t0, t1 = ts
        y_next = step_fn(fn, y, t0, t1 - t0)
        return y_next, y_next

    y_final, ys = jax.lax.scan(scan_body, y0, (t0s, t1s))
    trajectory = jnp.concatenate([y0[None], ys], axis=0)
    return y_final, trajectory


def _midpoint_step(fn, y, t, h):
    k1 = fn(t, y)
    k2 = fn(t + h / 2, y + (h / 2) * k1)
    return y + h * k2


def _euler_step(fn, y, t, h):
    return y + h * fn(t, y)


def _rk4_step(fn, y, t, h):
    k1 = fn(t, y)
    k2 = fn(t + h / 2, y + (h / 2) * k1)
    k3 = fn(t + h / 2, y + (h / 2) * k2)
    k4 = fn(t + h, y + h * k3)
    return y + (h / 6) * (k1 + 2 * k2 + 2 * k3 + k4)


def odeint_midpoint(fn, y0, times):
    """Explicit midpoint (RK2): 2 fn evals per interval, the paper's solver."""
    return _solve(_midpoint_step, fn, y0, times)


def odeint_euler(fn, y0, times):
    return _solve(_euler_step, fn, y0, times)


def odeint_rk4(fn, y0, times):
    return _solve(_rk4_step, fn, y0, times)


# Tsitouras 5(4) coefficients (the torchode/tsit5 tableau)
_TSIT5_C = (0.0, 0.161, 0.327, 0.9, 0.9800255409045097, 1.0, 1.0)
_TSIT5_A = (
    (),
    (0.161,),
    (-0.008480655492356989, 0.335480655492357),
    (2.8971530571054935, -6.359448489975075, 4.3622954328695815),
    (5.325864828439257, -11.748883564062828, 7.4955393428898365,
     -0.09249506636175525),
    (5.86145544294642, -12.92096931784711, 8.159367898576159,
     -0.071584973281401, -0.028269050394068383),
    (0.09646076681806523, 0.01, 0.4798896504144996, 1.379008574103742,
     -3.290069515436081, 2.324710524099774),
)
_TSIT5_B = (0.09646076681806523, 0.01, 0.4798896504144996, 1.379008574103742,
            -3.290069515436081, 2.324710524099774, 0.0)
# btilde = b(5th) - b(4th): the embedded error-estimate weights
_TSIT5_B_ERR = (
    -0.00178001105222577714,
    -0.0008164344596567469,
    0.007880878010261995,
    -0.1447110071732629,
    0.5823571654525552,
    -0.45808210592918697,
    1.0 / 66.0,
)


def _tsit5_stages(fn, y, t, h):
    ks = []
    for i in range(7):
        yi = y
        for j, a in enumerate(_TSIT5_A[i]):
            yi = yi + h * a * ks[j]
        ks.append(fn(t + _TSIT5_C[i] * h, yi))
    y_next = y
    err = jax.tree_util.tree_map(jnp.zeros_like, y)
    for k, b, be in zip(ks, _TSIT5_B, _TSIT5_B_ERR):
        y_next = y_next + h * b * k
        err = err + h * be * k
    return y_next, err


def _tsit5_step(fn, y, t, h):
    y_next, _ = _tsit5_stages(fn, y, t, h)
    return y_next


def odeint_tsit5(fn, y0, times):
    """Fixed-grid Tsitouras 5(4): 7 fn evals per interval, 5th order."""
    return _solve(_tsit5_step, fn, y0, times)


def odeint_tsit5_adaptive(
    fn,
    y0,
    t0: float = 0.0,
    t1: float = 1.0,
    atol: float = 1e-5,
    rtol: float = 1e-5,
    max_steps: int = 256,
    h0: float = 0.05,
):
    """Adaptive Tsit5 with an integral step-size controller under
    `lax.while_loop` — the TPU-shaped equivalent of the reference's torchode
    path (`Tsit5 + IntegralController`, voicebox_pytorch.py:1297-1322).

    The loop is bounded by `max_steps` (static), step size adapts on the
    scalar RMS error norm. Completion is GUARANTEED: the step size is floored
    at (t1 - t) / steps_remaining and a step at that floor is force-accepted,
    so a tolerance the budget cannot honour degrades accuracy instead of
    silently returning a partial integration. Returns
    (y_final, num_steps_taken)."""

    def err_norm(err, y, y_next):
        scale = atol + rtol * jnp.maximum(jnp.abs(y), jnp.abs(y_next))
        return jnp.sqrt(jnp.mean(jnp.square(err / scale)))

    def cond(state):
        t, _, _, n, _ = state
        return (t < t1) & (n < max_steps)

    def body(state):
        t, y, h, n, _ = state
        remaining = jnp.maximum(max_steps - n, 1).astype(jnp.float32)
        h_min = (t1 - t) / remaining  # the budget must cover the rest
        h = jnp.clip(h, h_min, t1 - t)
        y_next, err = _tsit5_stages(fn, y, t, h)
        e = err_norm(err, y, y_next)
        accept = (e <= 1.0) | (h <= h_min * (1.0 + 1e-6))
        # integral controller: h *= clip(0.9 * e^(-1/5))
        factor = jnp.clip(0.9 * jnp.power(jnp.maximum(e, 1e-10), -0.2), 0.2, 5.0)
        h_new = h * factor
        t = jnp.where(accept, t + h, t)
        y = jax.tree_util.tree_map(
            lambda a, b: jnp.where(accept, b, a), y, y_next
        )
        return (t, y, h_new, n + 1, e)

    t, y, h, n, _ = jax.lax.while_loop(
        cond, body, (jnp.asarray(t0, jnp.float32), y0, jnp.asarray(h0, jnp.float32),
                     jnp.asarray(0, jnp.int32), jnp.asarray(0.0, jnp.float32))
    )
    return y, n


_METHODS = {
    "midpoint": _midpoint_step,
    "euler": _euler_step,
    "rk4": _rk4_step,
    "tsit5": _tsit5_step,
}


def odeint(fn, y0, times, method: str = "midpoint"):
    """torchdiffeq-flavoured entry point; returns (y_final, trajectory)."""
    if method not in _METHODS:
        raise ValueError(f"unknown ODE method {method!r}; choose from {sorted(_METHODS)}")
    return _solve(_METHODS[method], fn, y0, times)
