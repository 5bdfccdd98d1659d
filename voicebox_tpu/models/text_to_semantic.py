"""TextToSemantic: seq2seq text -> semantic-token generation (flax.linen).

TPU-native implementation of the `spear_tts_pytorch.TextToSemantic` contract
used by the reference (voicebox_pytorch.py:29,1127,1143-1150,1217-1227;
__init__.py:13): an encoder-decoder transformer whose

    .generate(source, source_type='text', target_type='speech',
              max_length, return_target_mask=True, ...) -> (ids, mask)

produces HuBERT-kmeans semantic token ids to condition VoiceBox on, and which
carries a `.wav2vec` (HubertWithKmeans) for the sampling-time length algebra.

Design (Spear-TTS, arXiv 2302.03540, re-shaped for XLA):
* bidirectional text encoder = `voicebox_tpu.models.Transformer`;
* causal decoder blocks with rotary self-attention + cross-attention;
* autoregressive decoding is a single `lax.scan` over `max_length` steps with
  a preallocated KV cache per layer — static shapes, one compiled program per
  (batch, max_length) config. Per-step work is O(max_length) instead of the
  O(max_length^2) full re-forward a naive port would do.
* speculative decoding (`spec_decode=True`, voicebox_pytorch.py:1191) is
  implemented natively: a self-speculative early-exit draft (first half of the
  decoder stack) proposes `gamma` tokens and the full model verifies them in
  one chunk forward. Greedy mode reproduces plain greedy decoding exactly;
  temperature > 0 uses unbiased rejection sampling.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..utils.tokenizer import Tokenizer
from .primitives import FeedForward, RMSNorm, apply_rotary_pos_emb, rotary_frequencies
from .transformer import Transformer

__all__ = ["TextToSemantic"]


class _CachedSelfAttention(nn.Module):
    """Causal self-attention supporting full-sequence and single-step-with-
    cache modes."""

    dim: int
    heads: int = 8
    dim_head: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, position=None, cache=None):
        b, n, _ = x.shape
        h, d = self.heads, self.dim_head
        qkv = nn.Dense(h * d * 3, use_bias=False, dtype=self.dtype, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q, k, v = (t.reshape(b, n, h, d).transpose(0, 2, 1, 3) for t in (q, k, v))

        if cache is None:
            # training / prefill: full causal attention
            pos = rotary_frequencies(jnp.arange(n), d)
            q = apply_rotary_pos_emb(pos, q)
            k = apply_rotary_pos_emb(pos, k)
            sim = jnp.einsum("bhid,bhjd->bhij", q, k) * (d**-0.5)
            causal = jnp.tril(jnp.ones((n, n), dtype=bool))
            sim = jnp.where(causal[None, None], sim, -1e9)
            attn = jax.nn.softmax(sim, axis=-1)
            out = jnp.einsum("bhij,bhjd->bhid", attn, v)
            new_cache = None
        else:
            # chunked decode: n >= 1 tokens starting at `position` (n == 1 is
            # plain AR decode; n == gamma+1 is the speculative verify chunk).
            # Stale cache entries beyond the live position are masked out, so
            # rejected speculative writes need no rollback.
            k_buf, v_buf = cache  # (b, h, max_len, d)
            positions = position + jnp.arange(n)
            pos = rotary_frequencies(positions, d)  # (n, d)
            q = apply_rotary_pos_emb(pos, q)
            k = apply_rotary_pos_emb(pos, k)
            k_buf = jax.lax.dynamic_update_slice(k_buf, k, (0, 0, position, 0))
            v_buf = jax.lax.dynamic_update_slice(v_buf, v, (0, 0, position, 0))
            max_len = k_buf.shape[2]
            sim = jnp.einsum("bhid,bhjd->bhij", q, k_buf) * (d**-0.5)
            # row i (query at position+i) sees keys j <= position+i
            valid = (
                jnp.arange(max_len)[None, None, None, :]
                <= positions[None, None, :, None]
            )
            sim = jnp.where(valid, sim, -1e9)
            attn = jax.nn.softmax(sim, axis=-1)
            out = jnp.einsum("bhij,bhjd->bhid", attn, v_buf)
            new_cache = (k_buf, v_buf)

        out = out.transpose(0, 2, 1, 3).reshape(b, n, h * d)
        out = nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="to_out")(out)
        return out, new_cache


class _CrossAttention(nn.Module):
    dim: int
    heads: int = 8
    dim_head: int = 64
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        h, d = self.heads, self.dim_head
        self.to_q = nn.Dense(h * d, use_bias=False, dtype=self.dtype, name="to_q")
        self.to_kv = nn.Dense(h * d * 2, use_bias=False, dtype=self.dtype,
                              name="to_kv")
        self.to_out = nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                               name="to_out")

    def kv(self, context):
        """Project context to (k, v), each (b, h, m, d) — computable ONCE at
        prefill: the context never changes during AR decode, so recomputing
        this per step (as a naive decode loop does) wastes a context-sized
        matmul + reshape chain per layer per token."""
        b, m, _ = context.shape
        h, d = self.heads, self.dim_head
        k, v = jnp.split(self.to_kv(context), 2, axis=-1)
        k = k.reshape(b, m, h, d).transpose(0, 2, 1, 3)
        v = v.reshape(b, m, h, d).transpose(0, 2, 1, 3)
        return k, v

    def __call__(self, x, context=None, context_mask=None, kv=None):
        b, n, _ = x.shape
        h, d = self.heads, self.dim_head
        q = self.to_q(x)
        if kv is None:
            kv = self.kv(context)
        k, v = kv
        q = q.reshape(b, n, h, d).transpose(0, 2, 1, 3)
        sim = jnp.einsum("bhid,bhjd->bhij", q, k) * (d**-0.5)
        if context_mask is not None:
            sim = jnp.where(context_mask[:, None, None, :], sim, -1e9)
        attn = jax.nn.softmax(sim, axis=-1)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, h * d)
        return self.to_out(out)


class _DecoderBlock(nn.Module):
    dim: int
    heads: int
    dim_head: int
    ff_mult: float = 4.0
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.self_norm = RMSNorm(self.dim, name="self_norm")
        self.self_attn = _CachedSelfAttention(
            dim=self.dim, heads=self.heads, dim_head=self.dim_head,
            dtype=self.dtype, name="self_attn",
        )
        self.cross_norm = RMSNorm(self.dim, name="cross_norm")
        self.cross_attn = _CrossAttention(
            dim=self.dim, heads=self.heads, dim_head=self.dim_head,
            dtype=self.dtype, name="cross_attn",
        )
        self.ff_norm = RMSNorm(self.dim, name="ff_norm")
        self.ff = FeedForward(dim=self.dim, mult=self.ff_mult,
                              dtype=self.dtype, name="ff")

    def cross_kv(self, context):
        return self.cross_attn.kv(context)

    def __call__(self, x, context=None, context_mask=None, position=None,
                 cache=None, cross_kv=None):
        attn_out, new_cache = self.self_attn(
            self.self_norm(x), position=position, cache=cache
        )
        x = x + attn_out
        x = x + self.cross_attn(
            self.cross_norm(x), context, context_mask, kv=cross_kv
        )
        x = x + self.ff(self.ff_norm(x))
        return x, new_cache


class _Seq2Seq(nn.Module):
    """Full seq2seq network; __call__ = teacher-forced training logits,
    decode_step = one cached AR step."""

    num_text_tokens: int
    num_semantic_tokens: int
    dim: int = 512
    enc_depth: int = 6
    dec_depth: int = 6
    heads: int = 8
    dim_head: int = 64
    dtype: jnp.dtype = jnp.float32

    @property
    def bos_id(self) -> int:
        return self.num_semantic_tokens

    @property
    def eos_id(self) -> int:
        return self.num_semantic_tokens + 1

    def setup(self):
        self.text_embed = nn.Embed(self.num_text_tokens, self.dim, name="text_embed")
        self.encoder = Transformer(
            dim=self.dim, depth=self.enc_depth, heads=self.heads,
            dim_head=self.dim_head, dtype=self.dtype, name="encoder",
        )
        self.sem_embed = nn.Embed(
            self.num_semantic_tokens + 2, self.dim, name="sem_embed"
        )  # + bos + eos
        self.blocks = [
            _DecoderBlock(
                dim=self.dim, heads=self.heads, dim_head=self.dim_head,
                dtype=self.dtype, name=f"dec_{i}",
            )
            for i in range(self.dec_depth)
        ]
        self.final_norm = RMSNorm(self.dim, name="final_norm")
        self.to_logits = nn.Dense(
            self.num_semantic_tokens + 2, use_bias=False, name="to_logits"
        )

    def encode_text(self, text_ids, text_mask=None):
        if text_mask is None:
            text_mask = text_ids != -1
        x = self.text_embed(jnp.clip(text_ids, 0, None))
        return self.encoder(x, mask=text_mask), text_mask

    def __call__(self, text_ids, semantic_ids, text_mask=None):
        """Teacher-forced training logits (b, n_sem + 1, vocab): input is
        [bos, sem...], predicting [sem..., eos]."""
        context, text_mask = self.encode_text(text_ids, text_mask)
        b = semantic_ids.shape[0]
        bos = jnp.full((b, 1), self.bos_id, dtype=semantic_ids.dtype)
        dec_in = jnp.concatenate([bos, jnp.clip(semantic_ids, 0, None)], axis=1)
        x = self.sem_embed(dec_in)
        for block in self.blocks:
            x, _ = block(x, context, text_mask)
        return self.to_logits(self.final_norm(x))

    def precompute_cross_kv(self, context):
        """Per-layer cross-attention (k, v) projections of the encoder
        context — computed ONCE at prefill and reused by every decode step
        (the context is decode-invariant; recomputing the projection per
        step added a context-length matmul chain per layer per token)."""
        return tuple(block.cross_kv(context) for block in self.blocks)

    def decode_step(self, token, position, caches, context, text_mask,
                    cross_kvs=None):
        """One AR step: token (b,) -> logits (b, vocab), updated caches."""
        x = self.sem_embed(token[:, None])  # (b, 1, d)
        if cross_kvs is None:
            cross_kvs = (None,) * len(self.blocks)
        new_caches = []
        for block, cache, ckv in zip(self.blocks, caches, cross_kvs):
            x, new_cache = block(
                x, context, text_mask, position=position, cache=cache,
                cross_kv=ckv,
            )
            new_caches.append(new_cache)
        logits = self.to_logits(self.final_norm(x))[:, 0]
        # bos must never be emitted: its id == num_semantic_tokens, which is
        # exactly VoiceBox's CFG null-cond embedding row (voicebox.py null_
        # cond_id) — an emitted bos would silently condition a frame on null
        logits = logits.at[..., self.bos_id].set(-1e9)
        return logits, tuple(new_caches)

    def decode_chunk(self, tokens, position, caches, context, text_mask,
                     num_layers: Optional[int] = None, cross_kvs=None):
        """Chunked decode: tokens (b, n) at positions [position, position+n)
        -> logits (b, n, vocab). `num_layers` truncates the decoder stack —
        the self-speculative early-exit draft model (it reuses the full
        model's norm/logits head)."""
        x = self.sem_embed(tokens)
        blocks = self.blocks if num_layers is None else self.blocks[:num_layers]
        if cross_kvs is None:
            cross_kvs = (None,) * len(blocks)
        cache_out = []
        for block, cache, ckv in zip(blocks, caches, cross_kvs):
            x, new_cache = block(
                x, context, text_mask, position=position, cache=cache,
                cross_kv=ckv,
            )
            cache_out.append(new_cache)
        logits = self.to_logits(self.final_norm(x))
        logits = logits.at[..., self.bos_id].set(-1e9)  # see decode_step
        return logits, tuple(cache_out)


class TextToSemantic:
    """Stateful façade mirroring the spear-tts usage surface."""

    def __init__(
        self,
        *,
        dim: int = 512,
        num_text_token_ids: Optional[int] = None,
        num_semantic_token_ids: Optional[int] = None,
        source_depth: int = 6,
        target_depth: int = 6,
        heads: int = 8,
        dim_head: int = 64,
        wav2vec: Optional[Any] = None,
        tokenizer: Optional[Any] = None,
        params: Optional[Any] = None,
        seed: int = 0,
    ):
        self.wav2vec = wav2vec
        self.tokenizer = tokenizer if tokenizer is not None else Tokenizer()
        if num_text_token_ids is None:
            num_text_token_ids = self.tokenizer.vocab_size
        if num_semantic_token_ids is None:
            assert wav2vec is not None, (
                "pass num_semantic_token_ids or a wav2vec with a codebook size"
            )
            num_semantic_token_ids = wav2vec.codebook_size

        self.net = _Seq2Seq(
            num_text_tokens=num_text_token_ids,
            num_semantic_tokens=num_semantic_token_ids,
            dim=dim,
            enc_depth=source_depth,
            dec_depth=target_depth,
            heads=heads,
            dim_head=dim_head,
        )
        self.params = params
        self._rng = jax.random.PRNGKey(seed)
        self._samplers = {}  # bounded LRU — see _get_sampler

    @property
    def eos_id(self):
        return self.net.eos_id

    def init_params(self, rng, n_text: int = 16, n_sem: int = 16, batch: int = 1):
        self.params = jax.jit(self.net.init)(
            rng,
            jnp.zeros((batch, n_text), dtype=jnp.int32),
            jnp.zeros((batch, n_sem), dtype=jnp.int32),
        )["params"]
        return self.params

    def _next_rng(self):
        self._rng, sub = jax.random.split(self._rng)
        return sub

    # ------------------------------------------------------------------

    def loss_fn(self, params, text_ids, semantic_ids, text_mask=None,
                semantic_mask=None):
        """Teacher-forced cross-entropy (pure, jit-able)."""
        logits = self.net.apply({"params": params}, text_ids, semantic_ids,
                                text_mask)
        if semantic_mask is None:
            semantic_mask = semantic_ids != -1
        b, n = semantic_ids.shape
        # EOS is taught at each row's TRUE length (not after the pad tail):
        # under causal attention the padded positions never influence the
        # positions that carry loss, so only targets/mask need placing
        lengths = semantic_mask.sum(axis=-1)  # (b,)
        pos = jnp.arange(n + 1)[None]
        base = jnp.concatenate(
            [jnp.clip(semantic_ids, 0, None),
             jnp.zeros((b, 1), dtype=semantic_ids.dtype)], axis=1
        )
        targets = jnp.where(pos == lengths[:, None], self.net.eos_id, base)
        tmask = pos <= lengths[:, None]
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
        nll = jnp.where(tmask, nll, 0.0)
        return jnp.sum(nll) / jnp.clip(jnp.sum(tmask), 1, None)

    # ------------------------------------------------------------------

    def _apply_fn(self, quantize):
        """`net.apply`, optionally routed through the quantized-Dense
        interceptor (`ops/quant.py`): decoder-block + vocab-head matmuls whose
        params carry `kernel_q` run int8 ("int8" dynamic / "w8a16" weight-only
        Pallas); the AR decode at m=1 token is weight-HBM-bound, so the int8
        weight read is the whole step-time win."""
        net = self.net
        if quantize is None:
            return net.apply
        from ..ops.quant import quantized_dense

        def apply(*args, **kwargs):
            with quantized_dense(quantize):
                return net.apply(*args, **kwargs)

        return apply


    # compiled-generate cache, LRU-bounded like cfm._sampler_cache: callers
    # sweeping many (batch, max_length, gamma, temperature, quantize) configs
    # would otherwise pin every compiled program + its captured buffers
    _SAMPLERS_MAX = 16

    def _get_sampler(self, key, build):
        cached = self._samplers.get(key)
        if cached is not None:
            self._samplers.pop(key)      # re-insert: mark most-recently-used
            self._samplers[key] = cached
            return cached
        sampler = build()
        while len(self._samplers) >= self._SAMPLERS_MAX:
            self._samplers.pop(next(iter(self._samplers)))
        self._samplers[key] = sampler
        return sampler

    def _quantized_params(self, params):
        """Seq2seq param surgery, cached per params identity."""
        cached = getattr(self, "_qparams_cache", None)
        if cached is not None and cached[0] is params:
            return cached[1]
        from ..ops.quant import (
            SEQ2SEQ_QUANT_LAYERS,
            SEQ2SEQ_QUANT_SCOPE,
            quantize_dense_params,
        )

        qparams = jax.jit(
            lambda p: quantize_dense_params(
                p, SEQ2SEQ_QUANT_LAYERS, SEQ2SEQ_QUANT_SCOPE
            )
        )(params)
        self._qparams_cache = (params, qparams)
        return qparams

    def _build_generate(self, batch: int, max_length: int, temperature: float,
                        quantize=None):
        net = self.net
        h, d = net.heads, net.dim_head
        apply = self._apply_fn(quantize)

        @jax.jit
        def run(params, text_ids, rng):
            context, text_mask = apply(
                {"params": params}, text_ids, method=net.encode_text
            )
            cross_kvs = apply(
                {"params": params}, context, method=net.precompute_cross_kv
            )

            caches = tuple(
                (
                    jnp.zeros((batch, h, max_length, d)),
                    jnp.zeros((batch, h, max_length, d)),
                )
                for _ in range(net.dec_depth)
            )

            def step(carry, i):
                token, caches, done, key = carry
                logits, caches = apply(
                    {"params": params}, token, i, caches, context, text_mask,
                    cross_kvs=cross_kvs, method=net.decode_step,
                )
                key, sub = jax.random.split(key)
                if temperature == 0.0:
                    next_token = jnp.argmax(logits, axis=-1)
                else:
                    next_token = jax.random.categorical(sub, logits / temperature)
                next_token = next_token.astype(jnp.int32)
                is_eos = next_token == net.eos_id
                emitted = jnp.where(done, net.eos_id, next_token)
                done = done | is_eos
                return (next_token, caches, done, key), (emitted, done)

            bos = jnp.full((batch,), net.bos_id, dtype=jnp.int32)
            init = (bos, caches, jnp.zeros((batch,), bool), rng)
            _, (tokens, done_flags) = jax.lax.scan(
                step, init, jnp.arange(max_length)
            )
            tokens = tokens.T  # (b, max_length)
            # mask: positions strictly before the first eos
            prev_done = jnp.concatenate(
                [jnp.zeros((batch, 1), bool), done_flags.T[:, :-1]], axis=1
            )
            mask = ~prev_done & (tokens != net.eos_id)
            return tokens, mask

        return run

    def _build_generate_spec(self, batch: int, max_length: int, gamma: int,
                             draft_layers: int, quantize=None):
        """Self-speculative greedy decoding under jit.

        Draft = the first `draft_layers` decoder blocks (early-exit, reusing
        the full model's head — the spear-tts speculative recipe); verify =
        one (gamma+1)-token chunk forward of the full model. The accepted
        prefix length is the batch-min agreement count, so the whole batch
        advances uniformly (SPMD-friendly); every emitted token equals the
        plain greedy output exactly. Rejected cache entries need no rollback:
        positions beyond the live pointer are masked in attention and
        overwritten on the next iteration."""
        net = self.net
        h, d = net.heads, net.dim_head
        buf_len = max_length + gamma + 1
        apply = self._apply_fn(quantize)

        @jax.jit
        def run(params, text_ids):
            context, text_mask = apply(
                {"params": params}, text_ids, method=net.encode_text
            )
            cross_kvs = apply(
                {"params": params}, context, method=net.precompute_cross_kv
            )

            def make_caches(n_layers):
                return tuple(
                    (
                        jnp.zeros((batch, h, buf_len, d)),
                        jnp.zeros((batch, h, buf_len, d)),
                    )
                    for _ in range(n_layers)
                )

            full_caches = make_caches(net.dec_depth)
            buf = jnp.full((batch, buf_len), net.eos_id, dtype=jnp.int32)

            def cond(state):
                p, _, _, done, _ = state
                return (p < max_length) & ~jnp.all(done)

            def body(state):
                p, last_token, buf, done, full_caches = state

                # --- draft: gamma early-exit AR steps. The draft IS the full
                # model's first draft_layers layers, so it seeds from (and is
                # later refreshed by) the full cache: the verify chunk
                # recomputes identical KV for these positions PLUS position
                # p+gamma, which the draft never writes — keeping a separate
                # draft cache left a permanent zero-KV hole there on
                # full-acceptance rounds ---
                def draft_step(carry, j):
                    tok, caches = carry
                    logits, caches = apply(
                        {"params": params}, tok[:, None], p + j, caches,
                        context, text_mask, num_layers=draft_layers,
                        cross_kvs=cross_kvs[:draft_layers],
                        method=net.decode_chunk,
                    )
                    nxt = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)
                    return (nxt, caches), nxt

                (_, _), proposals = jax.lax.scan(
                    draft_step,
                    (last_token, tuple(full_caches[:draft_layers])),
                    jnp.arange(gamma),
                )
                proposals = proposals.T  # (b, gamma)

                # --- verify: one full-model chunk over [last, proposals] ---
                chunk = jnp.concatenate([last_token[:, None], proposals], axis=1)
                logits, full_caches = apply(
                    {"params": params}, chunk, p, full_caches, context,
                    text_mask, cross_kvs=cross_kvs, method=net.decode_chunk,
                )
                g = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (b, gamma+1)

                # longest agreed prefix, batch-min for uniform advance
                agree = g[:, :gamma] == proposals  # (b, gamma)
                prefix = jnp.cumprod(agree.astype(jnp.int32), axis=1)
                k = jnp.min(jnp.sum(prefix, axis=1))  # scalar in [0, gamma]

                # emit [d_1..d_k, g_{k+1}]; for samples that agreed past k,
                # g_{k+1} == d_{k+1}, so this is still their greedy token
                idx = jnp.arange(gamma + 1)[None, :]
                slab = jnp.where(
                    idx < k,
                    jnp.pad(proposals, ((0, 0), (0, 1))),
                    jnp.where(idx == k, g, net.eos_id),
                )
                # eos propagation within the slab + across iterations
                # (only genuinely emitted entries idx <= k count — the idx > k
                # tail is eos padding, not output)
                emitted_eos = (slab == net.eos_id) & (idx <= k)
                hit_eos = jnp.cumsum(emitted_eos.astype(jnp.int32), axis=1) > 0
                prev_hit = jnp.concatenate(
                    [jnp.zeros((batch, 1), bool), hit_eos[:, :-1]], axis=1
                )
                slab = jnp.where(done[:, None] | prev_hit, net.eos_id, slab)
                new_done = done | hit_eos[:, -1]

                buf = jax.lax.dynamic_update_slice(buf, slab, (0, p))
                advance = k + 1
                last_token = slab[jnp.arange(batch), jnp.minimum(advance - 1, gamma)]
                last_token = jnp.where(new_done, net.eos_id, last_token)
                return (p + advance, last_token, buf, new_done, full_caches)

            bos = jnp.full((batch,), net.bos_id, dtype=jnp.int32)
            init = (jnp.asarray(0, jnp.int32), bos, buf,
                    jnp.zeros((batch,), bool), full_caches)
            _, _, buf, _, _ = jax.lax.while_loop(cond, body, init)

            tokens = buf[:, :max_length]
            is_eos = tokens == net.eos_id
            any_eos = jnp.any(is_eos, axis=1)
            first = jnp.where(any_eos, jnp.argmax(is_eos, axis=1), max_length)
            mask = jnp.arange(max_length)[None, :] < first[:, None]
            tokens = jnp.where(mask, tokens, 0)
            return tokens, mask

        return run

    def _build_generate_spec_sampled(self, batch: int, max_length: int,
                                     gamma: int, draft_layers: int,
                                     temperature: float, quantize=None):
        """Sampled speculative decoding (rejection sampling, Leviathan et al.
        2022): draft q proposes, the full model p verifies; token i is accepted
        with prob min(1, p(x_i)/q(x_i)), a rejection resamples from
        norm(max(0, p - q)). Per-sample accepted tokens beyond the batch-min
        advance are themselves valid samples from p, so the batch still
        advances uniformly by (min accepted + 1) without biasing any row's
        distribution."""
        net = self.net
        h, d = net.heads, net.dim_head
        buf_len = max_length + gamma + 1
        inv_t = 1.0 / max(temperature, 1e-6)
        apply = self._apply_fn(quantize)

        @jax.jit
        def run(params, text_ids, rng):
            context, text_mask = apply(
                {"params": params}, text_ids, method=net.encode_text
            )
            cross_kvs = apply(
                {"params": params}, context, method=net.precompute_cross_kv
            )

            def make_caches(n_layers):
                return tuple(
                    (
                        jnp.zeros((batch, h, buf_len, d)),
                        jnp.zeros((batch, h, buf_len, d)),
                    )
                    for _ in range(n_layers)
                )

            full_caches = make_caches(net.dec_depth)
            buf = jnp.full((batch, buf_len), net.eos_id, dtype=jnp.int32)

            def cond(state):
                p, _, _, done, _, _ = state
                return (p < max_length) & ~jnp.all(done)

            def body(state):
                # draft shares the full model's first-layer caches — see the
                # greedy variant for why a separate draft cache is wrong
                p, last_token, buf, done, full_caches, key = state
                key, k_draft, k_accept, k_res = jax.random.split(key, 4)

                # --- draft: gamma sampled steps, keeping q log-probs ---
                def draft_step(carry, inp):
                    tok, caches = carry
                    j, kd = inp
                    logits, caches = apply(
                        {"params": params}, tok[:, None], p + j, caches,
                        context, text_mask, num_layers=draft_layers,
                        cross_kvs=cross_kvs[:draft_layers],
                        method=net.decode_chunk,
                    )
                    logq = jax.nn.log_softmax(logits[:, 0] * inv_t, axis=-1)
                    nxt = jax.random.categorical(kd, logq).astype(jnp.int32)
                    return (nxt, caches), (nxt, logq)

                draft_keys = jax.random.split(k_draft, gamma)
                (_, _), (proposals, logqs) = jax.lax.scan(
                    draft_step,
                    (last_token, tuple(full_caches[:draft_layers])),
                    (jnp.arange(gamma), draft_keys),
                )
                proposals = proposals.T  # (b, gamma)
                logqs = logqs.transpose(1, 0, 2)  # (b, gamma, vocab)

                # --- verify chunk with the full model ---
                chunk = jnp.concatenate([last_token[:, None], proposals], axis=1)
                logits, full_caches = apply(
                    {"params": params}, chunk, p, full_caches, context,
                    text_mask, cross_kvs=cross_kvs, method=net.decode_chunk,
                )
                logps = jax.nn.log_softmax(logits * inv_t, axis=-1)  # (b, g+1, v)

                # accept_i: u < p(d_i)/q(d_i)
                gather = lambda lp, ids: jnp.take_along_axis(
                    lp, ids[..., None], axis=-1
                )[..., 0]
                lp_d = gather(logps[:, :gamma], proposals)
                lq_d = gather(logqs, proposals)
                u = jax.random.uniform(k_accept, (batch, gamma))
                accept = jnp.log(jnp.clip(u, 1e-20, None)) < (lp_d - lq_d)
                prefix = jnp.cumprod(accept.astype(jnp.int32), axis=1)
                k_b = jnp.sum(prefix, axis=1)  # per-sample accepted count
                k = jnp.min(k_b)

                # correction token at slot k: rows with k_b > k reuse their
                # accepted draft d_{k+1}; rows with k_b == k resample from the
                # residual norm(max(0, p - q)); k == gamma rows sample the
                # bonus from p directly
                p_slot = jnp.take_along_axis(
                    logps, jnp.full((batch, 1, 1), 0) + k[None, None], axis=1
                )[:, 0]  # logps[:, k] (b, v)
                q_slot = jnp.take_along_axis(
                    logqs, jnp.minimum(k, gamma - 1)[None, None]
                    + jnp.zeros((batch, 1, 1), jnp.int32), axis=1
                )[:, 0]
                residual = jnp.clip(jnp.exp(p_slot) - jnp.exp(q_slot), 0.0, None)
                residual = jnp.where(
                    (k == gamma) | (residual.sum(-1, keepdims=True) < 1e-9),
                    jnp.exp(p_slot),
                    residual,
                )
                res_tok = jax.random.categorical(
                    k_res, jnp.log(jnp.clip(residual, 1e-20, None))
                ).astype(jnp.int32)
                has_extra = k_b > k
                corr = jnp.where(
                    has_extra,
                    jnp.take_along_axis(
                        jnp.pad(proposals, ((0, 0), (0, 1))),
                        jnp.minimum(k, gamma)[None] + jnp.zeros((batch, 1), jnp.int32),
                        axis=1,
                    )[:, 0],
                    res_tok,
                )

                idx = jnp.arange(gamma + 1)[None, :]
                slab = jnp.where(
                    idx < k,
                    jnp.pad(proposals, ((0, 0), (0, 1))),
                    jnp.where(idx == k, corr[:, None], net.eos_id),
                )
                emitted_eos = (slab == net.eos_id) & (idx <= k)
                hit_eos = jnp.cumsum(emitted_eos.astype(jnp.int32), axis=1) > 0
                prev_hit = jnp.concatenate(
                    [jnp.zeros((batch, 1), bool), hit_eos[:, :-1]], axis=1
                )
                slab = jnp.where(done[:, None] | prev_hit, net.eos_id, slab)
                new_done = done | hit_eos[:, -1]

                buf = jax.lax.dynamic_update_slice(buf, slab, (0, p))
                advance = k + 1
                last_token = slab[jnp.arange(batch), jnp.minimum(advance - 1, gamma)]
                last_token = jnp.where(new_done, net.eos_id, last_token)
                return (p + advance, last_token, buf, new_done, full_caches,
                        key)

            bos = jnp.full((batch,), net.bos_id, dtype=jnp.int32)
            init = (jnp.asarray(0, jnp.int32), bos, buf,
                    jnp.zeros((batch,), bool), full_caches, rng)
            _, _, buf, _, _, _ = jax.lax.while_loop(cond, body, init)

            tokens = buf[:, :max_length]
            is_eos = tokens == net.eos_id
            any_eos = jnp.any(is_eos, axis=1)
            first = jnp.where(any_eos, jnp.argmax(is_eos, axis=1), max_length)
            mask = jnp.arange(max_length)[None, :] < first[:, None]
            tokens = jnp.where(mask, tokens, 0)
            return tokens, mask

        return run

    def generate(
        self,
        source,
        *,
        source_type: str = "text",
        target_type: str = "speech",
        max_length: int = 2048,
        return_target_mask: bool = False,
        temperature: float = 0.0,
        spec_decode: bool = False,
        spec_decode_gamma: int = 5,
        # draft depth for speculative decoding; None = dec_depth // 2 (the
        # self-speculative early-exit half). The speedup is acceptance-rate-
        # dependent: deeper drafts agree more but cost more per proposal.
        spec_decode_draft_layers=None,
        # "int8" / "w8a16": run the decoder's matmuls over int8 weights
        # (ops/quant.py) — the m=1 AR decode is weight-HBM-bound, so the int8
        # weight read directly cuts per-token latency. Composes with
        # spec_decode. Beyond-parity serving lever, off by default.
        quantize=None,
        # serve from params stored in this dtype (cached cast per params
        # version; ops/quant.py::cast_float_params) — halves the f32 weight
        # read of the decode loop at zero cost to bf16-compute numerics
        param_store_dtype=None,
        rng=None,
        params=None,
    ):
        assert source_type == "text" and target_type == "speech", (
            "this build implements the text->speech(semantic) direction used "
            "by the CFM wrapper (voicebox_pytorch.py:1219-1227)"
        )
        params = params if params is not None else self.params
        assert params is not None, "call init_params() first or pass params="
        if param_store_dtype is not None:
            cached = getattr(self, "_stored_cache", None)
            if cached is not None and cached[0] is params and cached[1] == param_store_dtype:
                params = cached[2]
            else:
                from ..ops.quant import cast_float_params

                sparams = jax.jit(
                    cast_float_params, static_argnames=("dtype",)
                )(params, dtype=param_store_dtype)
                self._stored_cache = (params, param_store_dtype, sparams)
                params = sparams
        if quantize is not None:
            params = self._quantized_params(params)

        if isinstance(source, (list, tuple)) and isinstance(source[0], str):
            source = jnp.asarray(self.tokenizer.texts_to_tensor_ids(list(source)))
        else:
            source = jnp.asarray(source)

        batch = source.shape[0]
        if spec_decode_draft_layers is None:
            spec_decode_draft_layers = max(1, self.net.dec_depth // 2)
        if spec_decode and temperature == 0.0:
            draft_layers = int(spec_decode_draft_layers)
            key = ("spec", batch, int(max_length), int(spec_decode_gamma),
                   draft_layers, quantize)
            sampler = self._get_sampler(key, lambda: self._build_generate_spec(
                batch, int(max_length), int(spec_decode_gamma),
                draft_layers, quantize=quantize,
            ))
            tokens, mask = sampler(params, source)
        elif spec_decode:
            draft_layers = int(spec_decode_draft_layers)
            key = ("spec_sampled", batch, int(max_length),
                   int(spec_decode_gamma), draft_layers, float(temperature),
                   quantize)
            sampler = self._get_sampler(
                key, lambda: self._build_generate_spec_sampled(
                    batch, int(max_length), int(spec_decode_gamma),
                    draft_layers, float(temperature), quantize=quantize,
                ))
            tokens, mask = sampler(
                params, source, rng if rng is not None else self._next_rng()
            )
        else:
            key = (batch, int(max_length), float(temperature), quantize)
            sampler = self._get_sampler(key, lambda: self._build_generate(
                batch, int(max_length), float(temperature),
                quantize=quantize,
            ))
            tokens, mask = sampler(
                params, source, rng if rng is not None else self._next_rng()
            )
        # replace padding (post-eos) ids with 0 for safe embedding lookups
        tokens = jnp.where(mask, tokens, 0)
        if return_target_mask:
            return tokens, mask
        return tokens

    def load(self, path):
        """Restore params saved by THIS build (flax msgpack, mirroring the
        reference's `.load(path)` surface, spear-tts `.load` call site
        voicebox_pytorch.py:1167-1173 pattern).

        DECLARED LIMITATION — no torch port for upstream spear-tts-pytorch
        checkpoints: that package is a pip dependency whose module internals
        are not in the reference repo (SURVEY.md §2.2 marks them "[contract
        inferred from call site]"), and this build's TextToSemantic is a
        contract re-implementation (encoder-decoder with KV-cached scan
        decode) whose parameterization has no verifiable 1:1 name map to the
        upstream layout. Without the upstream source in-image, a state-dict
        walker could not be round-trip-tested the way load_voicebox_torch /
        load_hubert_torch are — so rather than ship an unverifiable port,
        upstream text->semantic weights require retraining the seq2seq here
        (the HuBERT k-means vocabulary it predicts IS ported exactly, so the
        training targets carry over — see models/hubert.py)."""
        from flax import serialization

        with open(path, "rb") as f:
            pkg = serialization.msgpack_restore(f.read())
        self.params = (
            serialization.from_state_dict(self.params, pkg["model"])
            if self.params is not None
            else pkg["model"]
        )
        return pkg
