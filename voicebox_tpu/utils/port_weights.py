"""Pretrained-weight porting: torch state dicts -> flax param trees.

The reference consumes pretrained Encodec / Vocos / HuBERT checkpoints
downloaded from the hub (voicebox_pytorch.py:497,508,556,562). This
environment has no network egress, so porting is driven off LOCAL checkpoint
files when the user supplies them. Conversion rules:

* torch Linear weight (out, in)        -> flax Dense kernel (in, out): transpose
* torch Conv1d weight (out, in, k)     -> flax Conv kernel (k, in, out)
* torch ConvTranspose1d (in, out, k)   -> flax ConvTranspose kernel (k, out, in)
  (flax ConvTranspose kernels are (k, in_features, out_features) with flipped
  spatial axis relative to torch)
* torch LayerNorm weight/bias          -> flax scale/bias
* weight-norm convs (weight_g/weight_v)-> fused: w = g * v / ||v||

These helpers are deliberately structural: they walk the flax param tree and
pull the matching torch tensor by a name map, failing loudly on shape
mismatches.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

__all__ = [
    "torch_linear_to_dense",
    "torch_conv1d_to_flax",
    "torch_convtranspose1d_to_flax",
    "fuse_weight_norm",
    "load_torch_state_dict",
    "load_vocos_torch",
]


def torch_linear_to_dense(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def torch_conv1d_to_flax(w: np.ndarray) -> np.ndarray:
    # (out, in, k) -> (k, in, out)
    return np.ascontiguousarray(np.transpose(w, (2, 1, 0)))


def torch_convtranspose1d_to_flax(w: np.ndarray) -> np.ndarray:
    # torch: (in, out, k) -> flax ConvTranspose: (k, in, out), spatially flipped
    return np.ascontiguousarray(np.transpose(w, (2, 0, 1))[::-1])


def fuse_weight_norm(weight_g: np.ndarray, weight_v: np.ndarray) -> np.ndarray:
    """w = g * v / ||v|| with the norm over all dims except dim 0 (torch
    weight_norm default)."""
    norm = np.sqrt(
        np.sum(weight_v.reshape(weight_v.shape[0], -1) ** 2, axis=1)
    ).reshape((-1,) + (1,) * (weight_v.ndim - 1))
    return weight_g * weight_v / np.maximum(norm, 1e-12)


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint into numpy without needing CUDA."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    if isinstance(sd, dict) and "model" in sd and all(
        hasattr(v, "numpy") for v in sd["model"].values()
    ):
        sd = sd["model"]
    out = {}
    for k, v in sd.items():
        if hasattr(v, "detach"):
            out[k] = v.detach().cpu().numpy()
    return out


def load_vocos_torch(path: str, template_params):
    """Port a local upstream Vocos torch checkpoint into our param tree.

    Walks the template tree and fills leaves from the torch state dict; any
    leaf without a mapped tensor keeps its initialisation (reported)."""
    sd = load_torch_state_dict(path)
    # upstream naming: backbone.embed / backbone.norm / backbone.convnext.{i}.* /
    # backbone.final_layer_norm / head.out / head.istft.window
    name_map = {}
    for k in sd:
        name_map[k] = sd[k]

    def fetch(torch_key, convert=None, default=None):
        if torch_key not in name_map:
            return default
        v = name_map[torch_key]
        return convert(v) if convert is not None else v

    import jax.numpy as jnp

    p = template_params
    bb = dict(p["backbone"])

    def set_conv(dst: dict, prefix: str):
        w = fetch(f"{prefix}.weight", torch_conv1d_to_flax)
        b = fetch(f"{prefix}.bias")
        if w is not None:
            dst["kernel"] = jnp.asarray(w)
        if b is not None:
            dst["bias"] = jnp.asarray(b)

    def set_dense(dst: dict, prefix: str):
        w = fetch(f"{prefix}.weight", torch_linear_to_dense)
        b = fetch(f"{prefix}.bias")
        if w is not None:
            dst["kernel"] = jnp.asarray(w)
        if b is not None:
            dst["bias"] = jnp.asarray(b)

    def set_ln(dst: dict, prefix: str):
        w, b = fetch(f"{prefix}.weight"), fetch(f"{prefix}.bias")
        if w is not None:
            dst["scale"] = jnp.asarray(w)
        if b is not None:
            dst["bias"] = jnp.asarray(b)

    bb = _as_mutable(p["backbone"])
    set_conv(bb["embed"], "backbone.embed")
    if "norm_in" in bb and "scale" in bb["norm_in"]:
        set_ln(bb["norm_in"], "backbone.norm")
    i = 0
    while f"block_{i}" in bb:
        blk = bb[f"block_{i}"]
        set_conv(blk["dwconv"], f"backbone.convnext.{i}.dwconv")
        if "scale" in blk.get("norm", {}):
            set_ln(blk["norm"], f"backbone.convnext.{i}.norm")
        set_dense(blk["pwconv1"], f"backbone.convnext.{i}.pwconv1")
        set_dense(blk["pwconv2"], f"backbone.convnext.{i}.pwconv2")
        g = fetch(f"backbone.convnext.{i}.gamma")
        if g is not None:
            blk["gamma"] = jnp.asarray(g)
        i += 1
    set_ln(bb["final_norm"], "backbone.final_layer_norm")

    hd = _as_mutable(p["head"])
    set_dense(hd["out"], "head.out")

    out = dict(p)
    out["backbone"] = bb
    out["head"] = hd
    return out


def _as_mutable(tree):
    if isinstance(tree, dict):
        return {k: _as_mutable(v) for k, v in tree.items()}
    try:  # FrozenDict
        return {k: _as_mutable(v) for k, v in tree.items()}
    except AttributeError:
        return tree
