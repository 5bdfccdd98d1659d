"""Monotonic alignment search (MAS / `maximum_path`) under jit.

TPU-native replacement for `naturalspeech2_pytorch.aligner.maximum_path`
(reference call site voicebox_pytorch.py:747-752): a Viterbi-style DP over the
(phoneme x mel-frame) grid. The torch version is a Python/numpy loop; here the
forward pass is a single `lax.scan` over mel frames with the whole phoneme
axis vectorised per step (the wavefront), and the backtrack is a reversed
`lax.scan` carrying the path index — both compile to static-shape XLA loops.

Contract: `maximum_path(value (b, t_x, t_y), mask (b, t_x, t_y)) -> bool path`
with `path.sum(-1)` = per-phoneme durations. `t_x` indexes phonemes, `t_y`
mel frames; per-sample lengths come from `mask` (True = valid cell). The path
is monotonic, starts at (0, 0), ends at (x_len-1, y_len-1), and advances by
at most one phoneme per frame.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["maximum_path"]

_NEG = -1e9


def maximum_path(value: jax.Array, mask: jax.Array) -> jax.Array:
    """Batched monotonic alignment search.

    value: (b, t_x, t_y) float alignment scores (higher = better).
    mask:  (b, t_x, t_y) bool validity (outer product of length masks).
    returns: (b, t_x, t_y) bool hard path.
    """
    b, t_x, t_y = value.shape
    value = value.astype(jnp.float32)

    x_lens = jnp.max(jnp.sum(mask.astype(jnp.int32), axis=1), axis=-1)  # (b,)
    y_lens = jnp.max(jnp.sum(mask.astype(jnp.int32), axis=2), axis=-1)  # (b,)

    i_idx = jnp.arange(t_x)[None, :]  # (1, t_x)

    def forward(carry, inp):
        v_prev = carry  # (b, t_x) best score ending at (i, j-1)
        val_j, j = inp  # val_j: (b, t_x)

        stay = v_prev  # from (i, j-1)
        advance = jnp.concatenate(
            [jnp.full((b, 1), _NEG), v_prev[:, :-1]], axis=1
        )  # from (i-1, j-1)

        # cell (i, j) reachable iff i <= j and i >= x_len - (y_len - j)
        reachable = (i_idx <= j) & (i_idx >= x_lens[:, None] - (y_lens[:, None] - j))

        best_prev = jnp.maximum(stay, advance)
        # at j == 0 only i == 0 is live, with zero prior
        best_prev = jnp.where((j == 0) & (i_idx == 0), 0.0, best_prev)

        v = jnp.where(reachable, best_prev + val_j, _NEG)
        return v, v

    init = jnp.full((b, t_x), _NEG)
    js = jnp.arange(t_y)
    _, v_all = jax.lax.scan(forward, init, (value.transpose(2, 0, 1), js))
    # v_all: (t_y, b, t_x)

    def backward(carry, inp):
        index = carry  # (b,) current phoneme index
        v_col_prev, j = inp  # v at column j-1: (b, t_x)

        in_range = j <= (y_lens - 1)
        # emit current cell
        row = (i_idx == index[:, None]) & in_range[:, None]

        v_stay = jnp.take_along_axis(v_col_prev, index[:, None], axis=1)[:, 0]
        v_adv = jnp.take_along_axis(
            v_col_prev, jnp.maximum(index - 1, 0)[:, None], axis=1
        )[:, 0]
        move_down = (index > 0) & ((index == j) | (v_stay < v_adv)) & in_range & (j > 0)
        index = jnp.where(move_down, index - 1, index)
        return index, row

    # reversed scan over j = t_y-1 .. 0; v column at j-1 (zeros for j = 0)
    v_prev_cols = jnp.concatenate([jnp.zeros((1, b, t_x)), v_all[:-1]], axis=0)
    init_index = jnp.maximum(x_lens - 1, 0)
    _, rows = jax.lax.scan(
        backward, init_index, (v_prev_cols, js), reverse=True
    )
    # rows: (t_y, b, t_x) -> (b, t_x, t_y)
    path = rows.transpose(1, 2, 0)
    return path & mask.astype(bool)
