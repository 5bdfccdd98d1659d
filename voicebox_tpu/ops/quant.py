"""Int8 inference quantization for the sampling path (opt-in, TPU-native).

Two quantized-matmul modes over the same int8 weight format (symmetric
per-output-channel, `quantize_dense_params` folds the scales out of the param
tree once, cached by the sampler per params identity):

* `"int8"` — dynamic activation quantization: activations become symmetric
  per-token int8 (absmax over the feature axis) inside the fused program and
  the MXU runs s8 x s8 -> s32 at ~2x the bf16 FLOP rate (394 TOPS vs 197
  TFLOPs on v5e). Wins when the matmuls are FLOP-bound; the absmax/round
  passes are elementwise overhead XLA cannot fuse into dot operands.
* `"w8a16"` — weight-only: a Pallas kernel (`w8a16_matmul`) streams the int8
  weight blocks through VMEM and dequantizes them INSIDE the dot's operand
  pipeline (int8 -> bf16 convert on the VPU, overlapped with the MXU), so the
  weight's HBM traffic halves while activations stay untouched — no dynamic
  quantization work, bf16 MXU rate. MEASURED VERDICT (PERFORMANCE.md,
  benchmarks/int8_serving.py): loses to the plain bf16 path at every
  benchmarked shape of this model (0.69-0.99x) because the grid re-streams
  the activation block once per weight-column block; the measured winner for
  the weight-HBM-bound regime is `param_store_dtype=bf16` + `"int8"`
  (1.23x at dim 1024 batch 1). Kept exact-and-tested for genuinely
  weight-bound niches (very large models at m ~ 1 rows).

Both modes quantize only the transformer's weight matmuls (qkv/out
projections + GEGLU feed-forward + skip combiners — ~80% of a sampling
forward's FLOPs). Everything else (norms — f32 by design, rotary, attention
score math, time MLP, embeddings, `to_pred`, the AdaptiveRMSNorm conditioning
projections whose zero-init columns have no absmax to scale by) stays in the
model's compute dtype: those are the numerics-sensitive and/or FLOP-light
pieces. The third lever, `cast_float_params` (sample(param_store_dtype=...)),
is a pure storage-dtype cast that DOES reach those excluded pieces — bf16
storage is numerically free for a bf16-compute model and halves the HBM read
of the f32-computed adaptive-norm projections; it composes with both modes.

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
import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.experimental import pallas as pl

__all__ = [
    "DEFAULT_QUANT_LAYERS",
    "SEQ2SEQ_QUANT_LAYERS",
    "SEQ2SEQ_QUANT_SCOPE",
    "QUANT_MODES",
    "quantize_kernel",
    "int8_matmul",
    "w8a16_matmul",
    "cast_float_params",
    "quantize_dense_params",
    "int8_dense_interceptor",
    "quantized_dense",
]

QUANT_MODES = ("int8", "w8a16")

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

# TextToSemantic's AR decode hot path: the decoder blocks' self/cross
# attention + FF projections and the vocab head. The encoder (one prefill per
# request) stays float — its scope keys don't match.
SEQ2SEQ_QUANT_LAYERS = (
    "to_qkv",
    "to_out",
    "to_q",
    "to_kv",
    "proj_in",
    "proj_out",
    "to_logits",
)
SEQ2SEQ_QUANT_SCOPE = ("dec_", "to_logits")


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


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _w8a16_kernel(x_ref, wq_ref, s_ref, o_ref):
    # Dequant rides in the dot's operand pipeline: the int8 block was fetched
    # from HBM (half the bf16 bytes) and converts in VMEM on the VPU — at
    # 2·m FLOPs of MXU work per weight element the convert never bottlenecks.
    w = wq_ref[...].astype(x_ref.dtype)
    acc = jax.lax.dot_general(
        x_ref[...], w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = (acc * s_ref[...]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "interpret"))
def w8a16_matmul(
    x: jax.Array,
    kernel_q: jax.Array,
    kernel_scale: jax.Array,
    block_m: int = 512,
    block_n: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """`x @ dequant(kernel)` with the int8 weight dequantized in VMEM.

    `x`: (..., in) any float dtype; `kernel_q`: (in, out) int8;
    `kernel_scale`: (1, out) or (out,) f32. Returns x.dtype.

    Grid order is (n_blocks, m_blocks) with m fastest, so each weight block's
    index is unchanged across consecutive grid steps and Pallas fetches it
    from HBM exactly once — total weight traffic is in·out bytes (vs 2·in·out
    for a bf16 kernel), which is the whole win in the weight-bound regime.
    Activation blocks re-stream once per n block; they are small there.
    """
    *lead, k = x.shape
    k_w, n = kernel_q.shape
    assert k == k_w, (x.shape, kernel_q.shape)
    scale = kernel_scale.reshape(1, n).astype(jnp.float32)

    m = 1
    for d in lead:
        m *= d
    x2 = x.reshape(m, k)

    block_m = min(block_m, _round_up(m, 16))
    block_n = min(block_n, _round_up(n, 128))
    mp, kp, np_ = _round_up(m, block_m), _round_up(k, 128), _round_up(n, block_n)
    if (mp, kp) != (m, k):
        x2 = jnp.pad(x2, ((0, mp - m), (0, kp - k)))
    if (kp, np_) != (k, n):
        kernel_q = jnp.pad(kernel_q, ((0, kp - k), (0, np_ - n)))
        scale = jnp.pad(scale, ((0, 0), (0, np_ - n)))

    out = pl.pallas_call(
        _w8a16_kernel,
        grid=(np_ // block_n, mp // block_m),
        in_specs=[
            pl.BlockSpec((block_m, kp), lambda j, i: (i, 0)),
            pl.BlockSpec((kp, block_n), lambda j, i: (0, j)),
            pl.BlockSpec((1, block_n), lambda j, i: (0, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda j, i: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, np_), x.dtype),
        interpret=interpret,
    )(x2, kernel_q, scale)
    return out[:m, :n].reshape(*lead, n)


def cast_float_params(params, dtype=jnp.bfloat16):
    """Cast every float param leaf to `dtype` — a storage-dtype change for
    serving. With a bf16-compute model this is numerically free for the Dense
    kernels (flax was already downcasting them at use) and halves the HBM
    read of the f32-computed pieces (the AdaptiveRMSNorm conditioning
    projections — 57% of the reference-default model's params — convert
    bf16->f32 on the VPU instead of streaming f32 from HBM). Measured: the
    dim-1024 batch-1 sampling pipeline runs 1.10x faster on bf16-stored
    params, 1.23x combined with quantize="int8" (PERFORMANCE.md)."""
    return jax.tree.map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        params,
    )


def _in_scope(path: Tuple[str, ...], scope_keys: Sequence[str]) -> bool:
    return any(scope in key for key in path for scope in scope_keys)


def quantize_dense_params(
    params,
    layer_names: Sequence[str] = DEFAULT_QUANT_LAYERS,
    scope_keys: Sequence[str] = (_SCOPE_KEY,),
):
    """Replace `kernel` with `kernel_q` (int8) + `kernel_scale` (f32) for every
    Dense submodule named in `layer_names` whose tree path (including its own
    name) contains one of `scope_keys` as a substring. Biases and everything
    else pass through unchanged. Pure — safe to jit (the name/scope arguments
    are static)."""
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
                and _in_scope(path + (key,), scope_keys)
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


def int8_dense_interceptor(next_fun, args, kwargs, context, mode: str = "int8"):
    """`flax.linen.intercept_methods` interceptor: any stock `nn.Dense` whose
    params carry `kernel_q` runs the quantized matmul for `mode`; all other
    modules (and Dense modules with a float `kernel`) fall through to their
    original method."""
    module = context.module
    if (
        context.method_name == "__call__"
        and type(module) is nn.Dense
        and module.has_variable("params", "kernel_q")
    ):
        (x,) = args
        # honour the module's compute dtype (flax promote_dtype semantics):
        # a float Dense would cast its input to `dtype` before the matmul,
        # so the quantized path must too — otherwise an e.g. bf16 embedding
        # output stays bf16 through an f32-dtype decode step and collides
        # with its f32 KV cache downstream
        if module.dtype is not None and x.dtype != module.dtype:
            x = x.astype(module.dtype)
        kernel_q = module.get_variable("params", "kernel_q")
        kernel_scale = module.get_variable("params", "kernel_scale")
        if mode == "int8":
            y = int8_matmul(x, kernel_q, kernel_scale)
        else:  # w8a16 — Pallas on TPU, interpreter elsewhere (tests/CPU)
            interpret = jax.default_backend() not in ("tpu", "axon")
            y = w8a16_matmul(x, kernel_q, kernel_scale, interpret=interpret)
        if module.use_bias:
            bias = module.get_variable("params", "bias")
            y = y + bias.astype(y.dtype)
        return y
    return next_fun(*args, **kwargs)


@contextlib.contextmanager
def quantized_dense(mode: str = "int8"):
    """Context manager under which flax `apply` calls route quantized Dense
    modules through the `mode` matmul ("int8" dynamic-activation MXU path or
    "w8a16" weight-only Pallas path). Must be active while the computation
    is TRACED (wrap the `.apply` call inside the jitted function)."""
    if mode not in QUANT_MODES:
        raise ValueError(f"unknown quantize mode {mode!r} (use one of {QUANT_MODES})")
    with nn.intercept_methods(
        functools.partial(int8_dense_interceptor, mode=mode)
    ):
        yield
