"""Forward-sum alignment loss (CTC-style) as a log-semiring `lax.scan`.

TPU-native replacement for `naturalspeech2_pytorch.aligner.ForwardSumLoss`
(reference call sites voicebox_pytorch.py:683,871-876), which wraps torch's
C++ CTC kernel with an effectively-disabled blank (blank logprob ~ -1000). With
no blank, CTC over the target sequence [1..K] reduces to the plain monotonic
forward algorithm:

    alpha[t, k] = logprob[t, k] + logsumexp(alpha[t-1, k], alpha[t-1, k-1])

and the loss is -alpha[T-1, K-1] (normalised per sample by the target length,
matching `F.ctc_loss(reduction='mean')`'s by-target-length normalisation,
then averaged over the batch).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["forward_sum_loss"]

_NEG = -1e9


def forward_sum_loss(
    attn_logprob: jax.Array,  # (b, 1, t_mel, t_ph) or (b, t_mel, t_ph)
    key_lens: jax.Array,  # (b,) phoneme lengths
    query_lens: jax.Array,  # (b,) mel lengths
) -> jax.Array:
    if attn_logprob.ndim == 4:
        attn_logprob = attn_logprob[:, 0]
    b, t_mel, t_ph = attn_logprob.shape
    lp = attn_logprob.astype(jnp.float32)

    # renormalise over the VALID keys only (the torch impl log_softmaxes after
    # masking padded keys to -inf)
    key_idx = jnp.arange(t_ph)[None, None, :]
    valid_key = key_idx < key_lens[:, None, None]
    lp = jnp.where(valid_key, lp, _NEG)
    lp = jax.nn.log_softmax(lp, axis=-1)

    def step(alpha_prev, lp_t):
        # alpha_prev: (b, t_ph); lp_t: (b, t_ph)
        shifted = jnp.concatenate(
            [jnp.full((b, 1), _NEG), alpha_prev[:, :-1]], axis=1
        )
        alpha = lp_t + jnp.logaddexp(alpha_prev, shifted)
        return alpha, alpha

    # t = 0: must start at key 0
    alpha0 = jnp.where(
        jnp.arange(t_ph)[None, :] == 0, lp[:, 0, 0][:, None], _NEG
    )
    _, alphas = jax.lax.scan(step, alpha0, lp[:, 1:].transpose(1, 0, 2))
    alphas = jnp.concatenate([alpha0[None], alphas], axis=0)  # (t_mel, b, t_ph)

    # gather alpha[query_len - 1, k = key_len - 1] per sample
    t_final = jnp.clip(query_lens - 1, 0, t_mel - 1)
    k_final = jnp.clip(key_lens - 1, 0, t_ph - 1)
    batch_idx = jnp.arange(b)
    final = alphas[t_final, batch_idx, k_final]  # (b,)

    per_sample = -final / jnp.maximum(key_lens.astype(jnp.float32), 1.0)
    return jnp.mean(per_sample)
