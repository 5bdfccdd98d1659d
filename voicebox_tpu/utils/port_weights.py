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
    "load_encodec_torch",
    "load_hubert_torch",
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
    def fetch(torch_key, convert=None, default=None):
        if torch_key not in sd:
            return default
        v = sd[torch_key]
        return convert(v) if convert is not None else v

    import jax.numpy as jnp

    p = template_params

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

    def set_norm(dst: dict, prefix: str):
        """Plain LayerNorm (`<prefix>.weight/.bias`) or the encodec-variant
        AdaLayerNorm whose scale/shift are nn.Embedding tables
        (`<prefix>.scale.weight` / `<prefix>.shift.weight`)."""
        if f"{prefix}.scale.weight" in sd:
            dst["scale"] = jnp.asarray(sd[f"{prefix}.scale.weight"])
            dst["shift"] = jnp.asarray(sd[f"{prefix}.shift.weight"])
        else:
            set_ln(dst, prefix)

    bb = _as_mutable(p["backbone"])
    set_conv(bb["embed"], "backbone.embed")
    if "norm_in" in bb:
        set_norm(bb["norm_in"], "backbone.norm")
    i = 0
    while f"block_{i}" in bb:
        blk = bb[f"block_{i}"]
        set_conv(blk["dwconv"], f"backbone.convnext.{i}.dwconv")
        set_norm(blk["norm"], f"backbone.convnext.{i}.norm")
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
    # encodec variant: codes->features codebooks, stored upstream as one
    # concatenated (q*size, c) tensor
    if "feature_extractor.codebook_weights" in sd and "codebook" in out:
        q, size, c = np.asarray(out["codebook"]).shape
        cw = sd["feature_extractor.codebook_weights"]
        assert cw.shape == (q * size, c), (
            f"codebook_weights {cw.shape} != expected {(q * size, c)}"
        )
        out["codebook"] = jnp.asarray(cw.reshape(q, size, c))
    return out


def _as_mutable(tree):
    if isinstance(tree, dict):
        return {k: _as_mutable(v) for k, v in tree.items()}
    try:  # FrozenDict
        return {k: _as_mutable(v) for k, v in tree.items()}
    except AttributeError:
        return tree


# ---------------------------------------------------------------------------
# Encodec (SEANet + RVQ) porting — upstream facebook/encodec_24khz state dict
# ---------------------------------------------------------------------------


def _split_torch_lstm(sd, prefix: str, layer: int):
    """torch LSTM layer weights -> flax OptimizedLSTMCell param dict.

    torch packs gates as [i, f, g, o] rows of weight_ih/weight_hh
    ((4h, in) / (4h, h)); flax keeps per-gate Dense modules ii/if/ig/io
    (input, no bias) and hi/hf/hg/ho (hidden, bias). torch's two bias vectors
    (b_ih + b_hh) fold into the hidden-side bias."""
    w_ih = sd[f"{prefix}.weight_ih_l{layer}"]
    w_hh = sd[f"{prefix}.weight_hh_l{layer}"]
    b = sd.get(f"{prefix}.bias_ih_l{layer}", 0) + sd.get(f"{prefix}.bias_hh_l{layer}", 0)
    h = w_hh.shape[1]
    gates = ["i", "f", "g", "o"]
    import jax.numpy as jnp

    out = {}
    for gi, g in enumerate(gates):
        sl = slice(gi * h, (gi + 1) * h)
        out[f"i{g}"] = {"kernel": jnp.asarray(w_ih[sl].T)}
        out[f"h{g}"] = {
            "kernel": jnp.asarray(w_hh[sl].T),
            "bias": jnp.asarray(b[sl]) if not isinstance(b, int) else jnp.zeros((h,)),
        }
    return out


def _wn_raw(sd, prefix: str):
    """Fused weight-norm tensor from `<prefix>.weight_g/.weight_v` (or plain
    `.weight`) in TORCH layout, plus bias — caller picks the layout convert."""
    if f"{prefix}.weight_g" in sd:
        w = fuse_weight_norm(sd[f"{prefix}.weight_g"], sd[f"{prefix}.weight_v"])
    else:
        w = sd[f"{prefix}.weight"]
    return w, sd.get(f"{prefix}.bias")


def _wn_conv(sd, prefix: str):
    """`_wn_raw` converted to flax Conv1d layout."""
    w, b = _wn_raw(sd, prefix)
    return torch_conv1d_to_flax(w), b


def load_encodec_torch(path: str, template_params, ratios=(8, 5, 4, 2)):
    """Port an upstream Encodec 24 kHz state dict into our EncodecModel
    param tree (encoder + decoder + quantizer codebooks).

    Upstream SEANet encoder module indices (facebook/encodec):
    0 stem conv; then per downsampling block i: (3i+1) resnet block,
    (3i+3) strided conv; 13 SLSTM; 15 head conv. Residual block convs live at
    `block.1` (k3) and `block.3` (k1)."""
    import jax.numpy as jnp

    sd = load_torch_state_dict(path)
    p = _as_mutable(template_params)

    def set_conv(dst, torch_prefix):
        w, b = _wn_conv(sd, torch_prefix)
        dst["kernel"] = jnp.asarray(w)
        if b is not None:
            dst["bias"] = jnp.asarray(b)

    n_blocks = len(ratios)
    for side, tree in (("encoder", p["encoder"]), ("decoder", p["decoder"])):
        base = f"{side}.model"
        set_conv(tree["stem"]["conv"], f"{base}.0.conv.conv")
        lstm_idx = 1 + 3 * n_blocks
        for i in range(n_blocks):
            if side == "encoder":
                blk, down = f"{base}.{3*i+1}", f"{base}.{3*i+3}"
                set_conv(tree[f"res_{i}"]["conv1"]["conv"], f"{blk}.block.1.conv.conv")
                set_conv(tree[f"res_{i}"]["conv2"]["conv"], f"{blk}.block.3.conv.conv")
                set_conv(tree[f"down_{i}"]["conv"], f"{down}.conv.conv")
            else:
                # decoder: [stem, lstm, (elu, convtr, resblock) x4, elu, head]
                up, blk = f"{base}.{3*i+3}", f"{base}.{3*i+4}"
                w, b = _wn_raw(sd, f"{up}.convtr.convtr")
                tree[f"up_{i}"]["convtr"]["kernel"] = jnp.asarray(
                    torch_convtranspose1d_to_flax(w)
                )
                if b is not None:
                    tree[f"up_{i}"]["convtr"]["bias"] = jnp.asarray(b)
                set_conv(tree[f"res_{i}"]["conv1"]["conv"], f"{blk}.block.1.conv.conv")
                set_conv(tree[f"res_{i}"]["conv2"]["conv"], f"{blk}.block.3.conv.conv")
        lstm_prefix = f"{base}.{lstm_idx if side == 'encoder' else 1}.lstm"
        for layer in (0, 1):
            key = f"{lstm_prefix}.weight_ih_l{layer}"
            if key in sd:
                # flax tree: nn.RNN is param-transparent, so the cell scope is
                # the auto-named OptimizedLSTMCell_{i} directly under 'lstm'
                tree["lstm"][f"OptimizedLSTMCell_{layer}"] = _split_torch_lstm(
                    sd, lstm_prefix, layer
                )
        set_conv(tree["head"]["conv"],
                 f"{base}.{lstm_idx + 2 if side == 'encoder' else len(ratios)*3 + 3}.conv.conv")

    # RVQ codebooks: quantizer.vq.layers.{i}._codebook.embed (k, dim)
    codebooks = []
    i = 0
    while f"quantizer.vq.layers.{i}._codebook.embed" in sd:
        codebooks.append(sd[f"quantizer.vq.layers.{i}._codebook.embed"])
        i += 1
    if codebooks:
        import numpy as _np

        n_q = p["quantizer"]["codebooks"].shape[0]
        p["quantizer"]["codebooks"] = jnp.asarray(_np.stack(codebooks[:n_q]))
    return p


def load_hubert_torch(path: str, template_params):
    """Port a fairseq/transformers HuBERT state dict into our HubertWithKmeans
    param tree. Maps the conv feature extractor (kernels + the layer-0
    group norm) and the feature projection; the transformer encoder and
    k-means centroids keep their initialisation unless supplied separately
    (`kmeans_path` on HubertWithKmeans)."""
    import jax.numpy as jnp

    sd = load_torch_state_dict(path)
    p = _as_mutable(template_params)

    # transformers naming: feature_extractor.conv_layers.{i}.conv.weight
    for i in range(7):
        for prefix in (
            f"feature_extractor.conv_layers.{i}.conv",
            f"hubert.feature_extractor.conv_layers.{i}.conv",
        ):
            if f"{prefix}.weight" in sd:
                p["feature_extractor"][f"conv_{i}"]["kernel"] = jnp.asarray(
                    torch_conv1d_to_flax(sd[f"{prefix}.weight"])
                )
    # layer-0 group norm (feat_extract_norm="group" in hubert-base)
    for prefix in (
        "feature_extractor.conv_layers.0.layer_norm",
        "hubert.feature_extractor.conv_layers.0.layer_norm",
    ):
        if f"{prefix}.weight" in sd:
            p["feature_extractor"]["group_norm"]["scale"] = jnp.asarray(sd[f"{prefix}.weight"])
            p["feature_extractor"]["group_norm"]["bias"] = jnp.asarray(sd[f"{prefix}.bias"])
    for prefix in ("feature_projection.projection", "hubert.feature_projection.projection"):
        if f"{prefix}.weight" in sd:
            p["proj"]["kernel"] = jnp.asarray(torch_linear_to_dense(sd[f"{prefix}.weight"]))
            p["proj"]["bias"] = jnp.asarray(sd[f"{prefix}.bias"])
    return p
