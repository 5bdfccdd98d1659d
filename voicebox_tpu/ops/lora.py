"""LoRA adapters for cheap fine-tuning (voice/domain adaptation).

Beyond-parity: the reference has no parameter-efficient fine-tuning path —
adapting its ~705M-param default VoiceBox to a new voice means a full
fine-tune (3 copies of every weight in optimizer memory). LoRA (Hu et al.
2021, arXiv 2106.09685) trains only rank-r factors per targeted matmul:
`y = W x + (alpha/r) * B A x` with `A ~ N(0, 1/r)` and `B = 0`, so training
starts EXACTLY at the base model and the optimizer state shrinks by ~1000x.

TPU-shaped design decisions:
* the adapter delta is computed as `(x @ A) @ B` — two skinny MXU matmuls of
  rank r (pad r to a lane multiple if it ever matters; at r<=64 the cost is
  noise next to the base matmul);
* the base params stay CLOSED OVER (frozen) in the loss — `jax.grad` over the
  adapter tree alone gives a tiny optimizer state with no masking machinery;
* wiring reuses the quant path's non-invasive interceptor: stock `nn.Dense`
  modules whose param dict carries `lora_a`/`lora_b` get the delta added
  after their normal (bias-included) output, everything else falls through;
* `fold_lora` bakes `W += (alpha/r) B A` once for ZERO-overhead serving —
  the folded tree is a plain param tree, so it composes with every serving
  lever (quantize / param_store_dtype / TTSEngine).

Typical flow::

    scale = lora_scale(alpha=16, rank=8)
    lora = lora_init(rng, cfm.params, rank=8)
    def loss(lora_tree, x1, key):
        merged = merge_lora_params(cfm.params, lora_tree)
        with lora_dense(scale):
            return cfm.loss_fn(merged, x1, key)
    grads = jax.grad(loss)(lora, batch, key)          # adapters only
    ...
    served = fold_lora(cfm.params, lora, scale)       # deploy
"""

from __future__ import annotations

import contextlib
import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .quant import DEFAULT_QUANT_LAYERS, _SCOPE_KEY, _in_scope

__all__ = [
    "DEFAULT_LORA_LAYERS",
    "lora_init",
    "merge_lora_params",
    "lora_scale",
    "lora_dense",
    "fold_lora",
]

# same hot matmuls the quant path targets: attention projections + GEGLU FF
# (+ skip combiners where present)
DEFAULT_LORA_LAYERS = DEFAULT_QUANT_LAYERS


def lora_init(
    rng,
    params,
    rank: int = 8,
    layer_names: Sequence[str] = DEFAULT_LORA_LAYERS,
    scope_keys: Sequence[str] = (_SCOPE_KEY,),
):
    """Build an adapter tree mirroring `params`' nesting: every targeted
    Dense kernel (in, out) gets `{"lora_a": (in, r), "lora_b": (r, out)}`
    with A ~ N(0, 1/r) and B = 0 (identity start). Non-targeted subtrees are
    omitted entirely, so `jax.tree.leaves(lora)` is exactly the trainable
    set."""
    names = frozenset(layer_names)
    counter = [0]

    def walk(tree, path):
        if not isinstance(tree, dict):
            return None
        out = {}
        for key, val in tree.items():
            if (
                isinstance(val, dict)
                and key in names
                and "kernel" in val
                and not isinstance(val["kernel"], dict)
                and val["kernel"].ndim == 2
                and _in_scope(path + (key,), scope_keys)
            ):
                d_in, d_out = val["kernel"].shape
                counter[0] += 1
                k = jax.random.fold_in(rng, counter[0])
                out[key] = {
                    "lora_a": (
                        jax.random.normal(k, (d_in, rank), jnp.float32)
                        * (rank ** -0.5)
                    ),
                    "lora_b": jnp.zeros((rank, d_out), jnp.float32),
                }
            else:
                sub = walk(val, path + (key,))
                if sub:  # drop empty branches
                    out[key] = sub
        return out

    lora = walk(params, ())
    assert lora, "no Dense kernels matched layer_names within scope_keys"
    return lora


def merge_lora_params(params, lora):
    """Insert the adapter leaves into a copy of the param tree (next to each
    targeted kernel) so the interceptor can see them at apply time."""

    def walk(p, l):
        if l is None:
            return p
        out = {}
        for key, val in p.items():
            if key in l and isinstance(val, dict):
                if "lora_a" in l[key]:
                    merged = dict(val)
                    merged["lora_a"] = l[key]["lora_a"]
                    merged["lora_b"] = l[key]["lora_b"]
                    out[key] = merged
                else:
                    out[key] = walk(val, l[key])
            else:
                out[key] = val
        return out

    return walk(params, lora)


def lora_scale(alpha: float, rank: int) -> float:
    return alpha / rank


def lora_dense_interceptor(next_fun, args, kwargs, context, scale: float = 1.0):
    """Adds `(alpha/r) * (x @ A) @ B` after any stock `nn.Dense` whose params
    carry `lora_a` — the base Dense (bias included) runs untouched first."""
    module = context.module
    y = next_fun(*args, **kwargs)
    if (
        context.method_name == "__call__"
        and type(module) is nn.Dense
        and module.has_variable("params", "lora_a")
    ):
        (x,) = args
        a = module.get_variable("params", "lora_a")
        b = module.get_variable("params", "lora_b")
        delta = (x.astype(a.dtype) @ a) @ b
        y = y + (scale * delta).astype(y.dtype)
    return y


@contextlib.contextmanager
def lora_dense(scale: float = 1.0):
    """Context manager activating the LoRA delta during TRACING (wrap the
    `.apply`/`loss_fn` call inside the jitted function)."""
    with nn.intercept_methods(
        functools.partial(lora_dense_interceptor, scale=scale)
    ):
        yield


def fold_lora(params, lora, scale: float = 1.0):
    """Bake the adapters into plain kernels: `W += scale * A @ B`, with the
    SAME `scale` that was passed to `lora_dense` during training (use
    `lora_scale(alpha, rank)`). Returns a normal param tree (no lora leaves)
    — zero serving overhead, composes with quantize/param_store_dtype."""

    def walk(p, l):
        if l is None:
            return p
        out = {}
        for key, val in p.items():
            if key in l and isinstance(val, dict):
                if "lora_a" in l[key]:
                    a, b = l[key]["lora_a"], l[key]["lora_b"]
                    w = val["kernel"]
                    delta = scale * (
                        a.astype(jnp.float32) @ b.astype(jnp.float32)
                    )
                    folded = dict(val)
                    folded["kernel"] = (
                        w.astype(jnp.float32) + delta
                    ).astype(w.dtype)
                    out[key] = folded
                else:
                    out[key] = walk(val, l[key])
            else:
                out[key] = val
        return out

    return walk(params, lora)
