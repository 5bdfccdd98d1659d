"""Full-model sequence parallelism for the VoiceBox denoiser.

Beyond-reference capability (the reference's attention is single-device full
quadratic, attend.py:100-137 — SURVEY.md §2.3 lists no SP): when one
utterance's latent sequence outgrows a single chip even with the Pallas flash
kernel, shard the TIME axis of the activations over a mesh axis and run the
whole denoiser shard-locally:

* attention      -> ring attention; the local k/v shard streams around the
                    mesh axis via `lax.ppermute` while register tokens ride
                    along as a replicated global prefix
                    (`ops/ring_attention.py::ring_attention_prefixed`);
* ConvPositionEmbed -> halo exchange of kernel//2 boundary frames
                    (`models/primitives.py::_halo_exchange_1d`);
* rotary         -> positions offset by the shard index;
* loss           -> per-sample masked mean psum'd over the axis.

Everything else in the block (norms, GEGLU FF, skip combiners, input fusion,
prediction head) is position-wise and needs no communication. Gradients flow
through `ppermute`/`psum` transposes, so `jax.grad` of the wrapped loss is the
standard ring-attention backward — validated against the single-device model
in tests/test_sequence_parallel.py.

Global randomness (the training span mask, the CFG drop decision) cannot be
drawn shard-locally — `make_sp_loss_fn` draws them at FULL length outside
`shard_map` and passes them in, preserving the reference's training
distribution (voicebox_pytorch.py:1023-1026, 1041-1054).

Usage::

    mesh = Mesh(np.array(jax.devices()).reshape(8), ("seq",))
    model, sp_model = make_sp_pair(VoiceBox, dim=512, depth=4, ...)
    params = model.init(...)["params"]          # layouts are identical
    loss_fn = make_sp_loss_fn(sp_model, mesh)   # jit-able, differentiable
    loss = loss_fn(params, x, times, cond, cond_mask, cond_drop_mask, mask)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["SEQ_AXIS", "make_sp_pair", "sp_forward", "make_sp_loss_fn"]

SEQ_AXIS = "seq"


def make_sp_pair(model_cls, *, seq_axis: str = SEQ_AXIS, **kwargs):
    """Build (single_device_model, sequence_parallel_model) with identical
    parameter layouts — init on either, apply on both."""
    plain = model_cls(**kwargs)
    sp = plain.clone(seq_axis=seq_axis, pad_to_lane_multiple=False)
    return plain, sp


def _specs(seq_axis: str):
    x3 = P(None, seq_axis, None)  # (b, n, d) activations / latents
    m2 = P(None, seq_axis)  # (b, n) masks
    r = P()  # replicated
    return x3, m2, r


def sp_forward(
    sp_model,
    mesh: Mesh,
    *,
    seq_axis: str = SEQ_AXIS,
    condition_on_text: Optional[bool] = None,
):
    """Sequence-parallel vector-field evaluation (inference-shaped call).

    Returns `fn(params, x, times, cond, cond_mask, self_attn_mask[,
    cond_token_ids]) -> (b, n, latent_dim)` with the time axis of x/cond
    sharded over `seq_axis` and the output sharded the same way. Wrap in
    `jax.jit` (shard_map composes under jit)."""
    if condition_on_text is None:
        condition_on_text = sp_model.condition_on_text
    x3, m2, r = _specs(seq_axis)

    if condition_on_text:

        def inner(params, x, times, cond, cond_mask, self_attn_mask, cond_ids):
            return sp_model.apply(
                {"params": params}, x, times=times, cond=cond,
                cond_mask=cond_mask, self_attn_mask=self_attn_mask,
                cond_token_ids=cond_ids, cond_drop_prob=0.0,
            )

        in_specs = (r, x3, r, x3, m2, m2, r)
    else:

        def inner(params, x, times, cond, cond_mask, self_attn_mask):
            return sp_model.apply(
                {"params": params}, x, times=times, cond=cond,
                cond_mask=cond_mask, self_attn_mask=self_attn_mask,
                cond_drop_prob=0.0,
            )

        in_specs = (r, x3, r, x3, m2, m2)

    return jax.shard_map(inner, mesh=mesh, in_specs=in_specs, out_specs=x3)


def make_sp_loss_fn(
    sp_model,
    mesh: Mesh,
    *,
    seq_axis: str = SEQ_AXIS,
    batch_axis: Optional[str] = None,
    cond_drop_prob: float = 0.0,
    sigma: float = 0.0,
):
    """Sequence-parallel CFM training loss.

    Returns `loss_fn(params, rng, x1, x0, times, self_attn_mask[, cond_ids,
    cond]) -> scalar`: builds `w`/`flow` exactly as the reference CFM
    objective (voicebox_pytorch.py:1397-1410), draws the span mask and CFG
    drop at FULL length from `rng`, then evaluates the masked-mean MSE under
    `shard_map`. When `cond` is omitted it falls back to the flow target —
    the reference's `cond = default(cond, target)` training quirk
    (voicebox_pytorch.py:1003), preserved for training-distribution parity.
    Differentiable; jit it (or `jax.value_and_grad`) directly.

    `batch_axis` composes SP with data parallelism on a 2-D mesh
    (`Mesh(devs.reshape(dp, sp), (batch_axis, seq_axis))`): the batch dim
    shards over `batch_axis`, each data replica runs the full seq ring, the
    final loss is pmean'd over the batch axis — so `jax.grad` psums parameter
    gradients over BOTH axes (the DP gradient allreduce the reference gets
    from DDP, trainer.py:89-95, compiled onto ICI).
    """
    from ..ops.masks import mask_from_frac_lengths, prob_mask_like
    from ..ops.ode import cfm_interpolant

    assert float(sp_model.attn_dropout) == 0.0 and float(sp_model.ff_dropout) == 0.0, (
        "attn/ff dropout is not plumbed through the SP shard_map (the "
        "single-device loss_fn trains with dropout rngs; replicating that "
        "per-shard would change the mask distribution) — train the "
        "sequence-parallel path with dropout 0 (the reference defaults)"
    )

    x3, m2, r = _specs(seq_axis)
    if batch_axis is not None:
        x3 = P(batch_axis, seq_axis, None)
        m2 = P(batch_axis, seq_axis)
        b1 = P(batch_axis)  # per-sample vectors: times, CFG drop
        bn = P(batch_axis, None)  # per-sample token ids
    else:
        b1 = bn = r
    condition_on_text = sp_model.condition_on_text

    def _finish(loss):
        if batch_axis is not None:
            loss = jax.lax.pmean(loss, batch_axis)
        return loss

    if condition_on_text:

        def inner(params, w, times, flow, cond, cond_mask, drop_mask, mask, cond_ids):
            return _finish(sp_model.apply(
                {"params": params}, w, times=times, target=flow, cond=cond,
                cond_mask=cond_mask, cond_drop_mask=drop_mask,
                self_attn_mask=mask, cond_drop_prob=0.0,
                cond_token_ids=cond_ids,
            ))

        in_specs = (r, x3, b1, x3, x3, m2, b1, m2, bn)
    else:

        def inner(params, w, times, flow, cond, cond_mask, drop_mask, mask):
            return _finish(sp_model.apply(
                {"params": params}, w, times=times, target=flow, cond=cond,
                cond_mask=cond_mask, cond_drop_mask=drop_mask,
                self_attn_mask=mask, cond_drop_prob=0.0,
            ))

        in_specs = (r, x3, b1, x3, x3, m2, b1, m2)

    sharded = jax.shard_map(inner, mesh=mesh, in_specs=in_specs, out_specs=r)

    def loss_fn(params, rng, x1, x0, times, self_attn_mask=None, cond_ids=None,
                cond=None):
        b, n, _ = x1.shape
        k_frac, k_span, k_drop = jax.random.split(rng, 3)
        w, flow = cfm_interpolant(x1, x0, times, sigma)
        if cond is None:
            cond = flow  # == VoiceBox's cond = default(cond, target) fallback
        # global randomness, drawn at full length
        lo, hi = sp_model.frac_lengths_mask
        frac = jax.random.uniform(k_frac, (b,), minval=lo, maxval=hi)
        cond_mask = mask_from_frac_lengths(k_span, n, frac)
        drop_mask = prob_mask_like(k_drop, (b,), cond_drop_prob)
        if self_attn_mask is None:
            self_attn_mask = jnp.ones((b, n), dtype=bool)
        args = (params, w, times, flow, cond, cond_mask, drop_mask, self_attn_mask)
        if condition_on_text:
            args = args + (cond_ids,)
        return sharded(*args)

    return loss_fn
