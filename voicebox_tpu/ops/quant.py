"""Int8 inference quantization for the sampling path (opt-in, TPU-native).

The v5e MXU executes s8 x s8 -> s32 matmuls at ~2x the bf16 FLOP rate
(394 TOPS vs 197 TFLOPs), and ~80% of a sampling forward's FLOPs live in the
transformer's weight matmuls (qkv/out projections + GEGLU feed-forward). This
module quantizes exactly those matmuls:

* weights: symmetric per-output-channel int8, scales folded out of the kernel
  once (`quantize_dense_params` — one pass over the param tree, cached by the
  sampler per params identity);
* activations: dynamic symmetric per-token int8 (absmax over the feature
  axis), computed inside the fused program — XLA fuses the absmax/round into
  the surrounding elementwise work;
* accumulation: int32 on the MXU (`lax.dot_general` with
  `preferred_element_type=int32`), dequantized by `row_scale * col_scale`.

Everything else (norms — f32 by design, rotary, attention score math, time
MLP, embeddings, `to_pred`, the AdaptiveRMSNorm conditioning projections whose
zero-init columns have no absmax to scale by) stays in the model's compute
dtype: those are the numerics-sensitive and/or FLOP-light pieces.

Wiring is non-invasive: `int8_dense_interceptor` (a `flax.linen
.intercept_methods` interceptor) swaps the matmul inside stock `nn.Dense`
modules whose param dict carries `kernel_q`/`kernel_scale` instead of
`kernel`; unquantized Dense modules fall through untouched. The reference has
no quantized path at all (its SDPA/static bf16 autocast is the nearest
analogue — /root/reference/voicebox_pytorch/trainer.py:267 autocast); this is
a beyond-parity serving feature, off by default.
"""

from __future__ import annotations

import contextlib
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = [
    "DEFAULT_QUANT_LAYERS",
    "quantize_kernel",
    "int8_matmul",
    "quantize_dense_params",
    "int8_dense_interceptor",
    "quantized_dense",
]

# Dense module names to quantize, all inside the transformer blocks: the
# attention projections, the GEGLU feed-forward, and the U-Net skip combiners.
DEFAULT_QUANT_LAYERS = (
    "to_qkv",
    "to_out",
    "proj_in",
    "proj_out",
    "skip_combiner",
)

# param-tree subtree the layer-name match is restricted to — VoiceBox's own
# top-level `proj_in` (the latent projection, outside any transformer) must
# NOT be caught by the feed-forward's `proj_in` name
_SCOPE_KEY = "transformer"


def quantize_kernel(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Symmetric per-output-channel int8 quantization of a Dense kernel.

    `w`: (..., in, out) — leading axes (e.g. a scan_layers stack) are kept.
    Returns `(q, scale)` with `q` int8 of w's shape and `scale` f32 of shape
    (..., 1, out) so `q * scale ~= w` broadcasts in both the stacked and the
    per-layer-sliced case.
    """
    w32 = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w32), axis=-2, keepdims=True)
    scale = absmax / 127.0
    safe = jnp.where(scale == 0.0, 1.0, scale)
    q = jnp.clip(jnp.round(w32 / safe), -127, 127).astype(jnp.int8)
    return q, scale


def int8_matmul(x: jax.Array, kernel_q: jax.Array, kernel_scale: jax.Array) -> jax.Array:
    """`x @ dequant(kernel)` computed as an s8 x s8 -> s32 MXU matmul.

    `x`: (..., in) any float dtype; `kernel_q`: (in, out) int8;
    `kernel_scale`: (1, out) or (out,) f32. Activations are quantized
    dynamically per token (symmetric absmax over the feature axis). Returns
    x.dtype.
    """
    x32 = x.astype(jnp.float32)
    row_absmax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    row_scale = row_absmax / 127.0
    safe = jnp.where(row_scale == 0.0, 1.0, row_scale)
    xq = jnp.clip(jnp.round(x32 / safe), -127, 127).astype(jnp.int8)

    acc = jax.lax.dot_general(
        xq,
        kernel_q,
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * row_scale * kernel_scale.reshape(-1)
    return out.astype(x.dtype)


def _in_scope(path: Tuple[str, ...]) -> bool:
    return any(_SCOPE_KEY in key for key in path)


def quantize_dense_params(params, layer_names: Sequence[str] = DEFAULT_QUANT_LAYERS):
    """Replace `kernel` with `kernel_q` (int8) + `kernel_scale` (f32) for every
    Dense submodule named in `layer_names` inside the transformer subtree.
    Biases and everything else pass through unchanged. Pure — safe to jit
    (layer_names is static)."""
    names = frozenset(layer_names)

    def walk(tree, path):
        if not isinstance(tree, dict):
            return tree
        out = {}
        for key, val in tree.items():
            if (
                isinstance(val, dict)
                and key in names
                and "kernel" in val
                and _in_scope(path)
            ):
                q, scale = quantize_kernel(val["kernel"])
                new_val = {k: v for k, v in val.items() if k != "kernel"}
                new_val["kernel_q"] = q
                new_val["kernel_scale"] = scale
                out[key] = new_val
            else:
                out[key] = walk(val, path + (key,))
        return out

    return walk(params, ())


def int8_dense_interceptor(next_fun, args, kwargs, context):
    """`flax.linen.intercept_methods` interceptor: any stock `nn.Dense` whose
    params carry `kernel_q` runs the int8 MXU matmul; all other modules (and
    Dense modules with a float `kernel`) fall through to their original
    method."""
    module = context.module
    if (
        context.method_name == "__call__"
        and type(module) is nn.Dense
        and module.has_variable("params", "kernel_q")
    ):
        (x,) = args
        kernel_q = module.get_variable("params", "kernel_q")
        kernel_scale = module.get_variable("params", "kernel_scale")
        y = int8_matmul(x, kernel_q, kernel_scale)
        if module.use_bias:
            bias = module.get_variable("params", "bias")
            y = y + bias.astype(y.dtype)
        return y
    return next_fun(*args, **kwargs)


@contextlib.contextmanager
def quantized_dense():
    """Context manager under which flax `apply` calls route quantized Dense
    modules through the int8 MXU path. Must be active while the computation
    is TRACED (wrap the `.apply` call inside the jitted function)."""
    with nn.intercept_methods(int8_dense_interceptor):
        yield
