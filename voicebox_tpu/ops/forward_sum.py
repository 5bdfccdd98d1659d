"""Forward-sum alignment loss (CTC with blank) — XLA-native.

TPU-native replacement for `naturalspeech2_pytorch.aligner.ForwardSumLoss`
(reference call sites voicebox_pytorch.py:683,871-876). The upstream loss is
NOT blank-free: it pads a blank column at logit `blank_logprob = -1` before
log-softmaxing over keys and runs `torch.nn.CTCLoss(blank=0,
zero_infinity=True)` over target sequence [1..K] — frames may emit blank
between/around phonemes, and those alignments carry non-negligible mass.
This mirrors that exactly with `optax.ctc_loss` (pure-XLA log-semiring scan):

* blank column 0 at logit `blank_logprob`, keys shifted to 1..K;
* keys beyond `key_lens` masked to -inf before the (internal) log-softmax;
* `zero_infinity=True`: impossible alignments (key_len > query_len) clamp to
  0 loss instead of inf;
* reduction matches `CTCLoss(reduction='mean')`: per-sample NLL divided by
  the target length, then batch-averaged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

__all__ = ["forward_sum_loss"]

_NEG = -1e9


def forward_sum_loss(
    attn_logprob: jax.Array,  # (b, 1, t_mel, t_ph) or (b, t_mel, t_ph)
    key_lens: jax.Array,  # (b,) phoneme lengths
    query_lens: jax.Array,  # (b,) mel lengths
    blank_logprob: float = -1.0,
) -> jax.Array:
    if attn_logprob.ndim == 4:
        attn_logprob = attn_logprob[:, 0]
    b, t_mel, t_ph = attn_logprob.shape
    lp = attn_logprob.astype(jnp.float32)

    # blank column at index 0 (logit -1, the upstream default), keys -> 1..K
    logits = jnp.pad(lp, ((0, 0), (0, 0), (1, 0)), constant_values=blank_logprob)
    # mask keys beyond each row's key_len (upstream masks index > key_len
    # before log_softmax; blank col 0 always stays valid)
    key_idx = jnp.arange(t_ph + 1)[None, None, :]
    logits = jnp.where(key_idx > key_lens[:, None, None], _NEG, logits)

    labels = jnp.broadcast_to(jnp.arange(1, t_ph + 1)[None, :], (b, t_ph))
    label_paddings = (
        jnp.arange(t_ph)[None, :] >= key_lens[:, None]
    ).astype(jnp.float32)
    logit_paddings = (
        jnp.arange(t_mel)[None, :] >= query_lens[:, None]
    ).astype(jnp.float32)

    per_sample = optax.ctc_loss(
        logits, logit_paddings, labels.astype(jnp.int32), label_paddings,
        blank_id=0,
    )
    # zero_infinity: alignments that cannot exist produce 0, not inf
    per_sample = jnp.where(key_lens <= query_lens, per_sample, 0.0)

    per_sample = per_sample / jnp.maximum(key_lens.astype(jnp.float32), 1.0)
    return jnp.mean(per_sample)
