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

__all__ = ["odeint", "odeint_midpoint", "odeint_euler", "odeint_rk4"]


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


_METHODS = {
    "midpoint": _midpoint_step,
    "euler": _euler_step,
    "rk4": _rk4_step,
}


def odeint(fn, y0, times, method: str = "midpoint"):
    """torchdiffeq-flavoured entry point; returns (y_final, trajectory)."""
    if method not in _METHODS:
        raise ValueError(f"unknown ODE method {method!r}; choose from {sorted(_METHODS)}")
    return _solve(_METHODS[method], fn, y0, times)
