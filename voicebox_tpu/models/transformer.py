"""L1 backbone: bidirectional transformer with register tokens, U-Net skip
connections, optional adaptive RMSNorm time conditioning, optional GateLoop
layers (flax.linen).

Structure mirrors the reference `Transformer` (voicebox_pytorch.py:353-479):

* depth must be even; first half of the blocks push activations onto a skip
  stack, second half pop + `Linear(cat(x, skip * 2^-0.5))` combine.
* `num_register_tokens` learned registers are prepended with rotary position
  -10000; the padding mask is extended with True for them.
* per block: [skip combine] -> [gateloop + residual] -> prenorm attention +
  residual -> prenorm feedforward + residual; final RMSNorm after removing
  registers.

Two execution modes:
* `scan_layers=False` (default): per-block Python loop, unrolled under `jit`.
* `scan_layers=True`: the U-Net structure factors into two UNIFORM halves —
  the first half pushes activations (a stacked `ys` from `nn.scan`), the
  second half consumes them in reverse with a skip-combiner in every block —
  so the whole backbone compiles as two `lax.scan`s. Compile time becomes
  O(1) in depth (the reference's flagship is depth 24) at identical math.
  Parameter layout differs (stacked leading depth axis), so the flag is part
  of the checkpoint format.

  Measured on one v5e chip (dim 512, depth 24, bf16, batch 8, seq 768):
  scan compiles the train step in ~130 s vs ~300 s unrolled, but runs ~17%
  slower (5.2 vs 6.3 steps/s — scan blocks cross-layer fusion), so unrolled
  stays the default for production training.

Blocks can be rematerialised (`remat=True`) to trade FLOPs for HBM during
training; composes with both modes.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .attention import Attention
from .primitives import (
    AdaptiveRMSNorm,
    FeedForward,
    RMSNorm,
    SimpleGateLoopLayer,
    rotary_frequencies,
)

__all__ = ["Transformer", "pipeline_stage_modules"]


# tensors tagged with jax.ad_checkpoint.checkpoint_name inside the blocks —
# composable into remat policies as 'dots+<name>+...' (profiling showed the
# dots-policy recompute bill is elementwise work on exactly these tensors)
_REMAT_TAGS = ("attn_probs", "qk_rotary", "norm_out", "gelu_out",
               "attn_out", "attn_lse")  # attn_out/lse: the flash kernel's
# outputs (ops/flash_attention.py) — save both to keep the Pallas forward
# out of the backward's remat bill


def _resolve_remat_policy(name: Optional[str]):
    """Named `jax.checkpoint` policies for selective rematerialisation.

    None  -> full recompute (jax default): lowest memory, highest recompute.
    'dots'-> save matmul outputs, recompute only cheap elementwise/softmax/
             norm work in the backward pass — costs activation memory roughly
             equal to the saved dot outputs but removes the expensive MXU
             recompute from the remat bill.
    'dots+attn_probs+...' -> additionally save the named tagged tensors
             (_REMAT_TAGS): spends more activation HBM to remove the
             corresponding elementwise recompute from the backward."""
    if name is None:
        return None
    table = {
        "dots": jax.checkpoint_policies.dots_saveable,
        "dots_no_batch": jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
    }
    parts = name.split("+")
    bases = [table[p] for p in parts if p in table]
    names = [p for p in parts if p not in table]
    unknown = [n for n in names if n not in _REMAT_TAGS]
    assert not unknown, (
        f"remat_policy parts {unknown} not in {sorted(table)} or {_REMAT_TAGS}"
    )
    policy = (
        jax.checkpoint_policies.save_only_these_names(*names) if names else None
    )
    for base in bases:
        policy = (
            base
            if policy is None
            else jax.checkpoint_policies.save_from_both_policies(policy, base)
        )
    assert policy is not None, f"empty remat_policy {name!r}"
    return policy


def pipeline_stage_modules(transformer: "Transformer", deterministic: bool = True):
    """(front, back) single-row `_HalfStack` modules whose param trees match
    one row of `transformer`'s `scan_layers=True` stacks — the building block
    `parallel/pipeline.py` applies per pipeline stage.

    A free function (not a method): constructing submodules inside a module
    method would register them as children of the unbound module."""
    assert transformer.scan_layers, "pipeline stages use the scan param layout"
    skip_scale = (
        transformer.skip_connect_scale
        if transformer.skip_connect_scale is not None
        else 2**-0.5
    )
    cfg = transformer._half_stack_cfg(deterministic, skip_scale)
    front = _HalfStack(**cfg, has_skip=False)
    back = _HalfStack(**cfg, has_skip=transformer.use_unet_skip_connection)
    return front, back


class _Block(nn.Module):
    """One transformer block (prenorm attn + prenorm FF, both residual)."""

    dim: int
    dim_head: int
    heads: int
    ff_mult: float
    attn_dropout: float
    ff_dropout: float
    use_flash: Optional[bool]
    adaptive_rmsnorm: bool
    adaptive_rmsnorm_cond_dim_in: Optional[int]
    attn_qk_norm: bool
    use_gateloop: bool
    seq_axis: Optional[str]
    num_prefix: int
    attn_scores_dtype: Optional[jnp.dtype]
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, mask, rotary_emb, norm_cond, deterministic=True):
        if self.use_gateloop:
            x = SimpleGateLoopLayer(dim=self.dim, dtype=self.dtype, name="gateloop")(x) + x

        if self.adaptive_rmsnorm:
            attn_norm = AdaptiveRMSNorm(
                dim=self.dim,
                cond_dim=self.adaptive_rmsnorm_cond_dim_in,
                name="attn_prenorm",
            )
            ff_norm = AdaptiveRMSNorm(
                dim=self.dim,
                cond_dim=self.adaptive_rmsnorm_cond_dim_in,
                name="ff_prenorm",
            )
            norm = lambda m, t: m(t, cond=norm_cond)
        else:
            attn_norm = RMSNorm(dim=self.dim, name="attn_prenorm")
            ff_norm = RMSNorm(dim=self.dim, name="ff_prenorm")
            norm = lambda m, t: m(t)

        attn_out = Attention(
            dim=self.dim,
            dim_head=self.dim_head,
            heads=self.heads,
            dropout=self.attn_dropout,
            use_flash=self.use_flash,
            qk_norm=self.attn_qk_norm,
            seq_axis=self.seq_axis,
            num_prefix=self.num_prefix,
            scores_dtype=self.attn_scores_dtype,
            dtype=self.dtype,
            name="attn",
        )(norm(attn_norm, x), mask=mask, rotary_emb=rotary_emb,
          deterministic=deterministic)
        x = attn_out + x

        ff_out = FeedForward(
            dim=self.dim,
            mult=self.ff_mult,
            dropout=self.ff_dropout,
            dtype=self.dtype,
            name="ff",
        )(norm(ff_norm, x), deterministic=deterministic)
        return ff_out + x


class _HalfStack(nn.Module):
    """One scan step: [skip combine] + block. carry = x; scanned input = skip.

    The stacked per-step output is the block INPUT (after any skip combine) —
    that is what the reference pushes onto the skip stack
    (voicebox_pytorch.py:459 pushes x before gateloop/attn/ff), so the back
    half consuming `skips[::-1]` reproduces its pop order exactly."""

    dim: int
    dim_head: int
    heads: int
    ff_mult: float
    attn_dropout: float
    ff_dropout: float
    use_flash: Optional[bool]
    adaptive_rmsnorm: bool
    adaptive_rmsnorm_cond_dim_in: Optional[int]
    attn_qk_norm: bool
    use_gateloop: bool
    seq_axis: Optional[str]
    num_prefix: int
    attn_scores_dtype: Optional[jnp.dtype]
    dtype: jnp.dtype
    has_skip: bool
    skip_scale: float
    deterministic: bool
    remat: bool
    remat_policy: Optional[str] = None

    @nn.compact
    def __call__(self, x, skip, mask, rotary_emb, norm_cond):
        if self.has_skip:
            x = nn.Dense(self.dim, dtype=self.dtype, name="skip_combiner")(
                jnp.concatenate([x, skip * self.skip_scale], axis=-1)
            )
        block_cls = _Block
        if self.remat:
            block_cls = nn.remat(
                _Block, static_argnums=(5,),
                policy=_resolve_remat_policy(self.remat_policy),
            )
        y = block_cls(
            dim=self.dim,
            dim_head=self.dim_head,
            heads=self.heads,
            ff_mult=self.ff_mult,
            attn_dropout=self.attn_dropout,
            ff_dropout=self.ff_dropout,
            use_flash=self.use_flash,  # Transformer resolved the alias already
            adaptive_rmsnorm=self.adaptive_rmsnorm,
            adaptive_rmsnorm_cond_dim_in=self.adaptive_rmsnorm_cond_dim_in,
            attn_qk_norm=self.attn_qk_norm,
            use_gateloop=self.use_gateloop,
            seq_axis=self.seq_axis,
            num_prefix=self.num_prefix,
            attn_scores_dtype=self.attn_scores_dtype,
            dtype=self.dtype,
            name="block",
        )(x, mask, rotary_emb, norm_cond, self.deterministic)
        return y, x


class Transformer(nn.Module):
    dim: int
    depth: int
    dim_head: int = 64
    heads: int = 8
    ff_mult: float = 4.0
    attn_dropout: float = 0.0
    ff_dropout: float = 0.0
    num_register_tokens: int = 0
    use_flash: Optional[bool] = None
    # reference-signature aliases (voicebox_pytorch.py:365,371-372):
    # `attn_flash` mirrors `use_flash` (None defers to the measured
    # length-based dispatch); `gateloop_use_jax` is accepted for call-site
    # compatibility but ignored — the gateloop recurrence here is ALWAYS the
    # jax associative scan (the reference's flag selects exactly that).
    attn_flash: Optional[bool] = None
    gateloop_use_jax: bool = True
    adaptive_rmsnorm: bool = False
    adaptive_rmsnorm_cond_dim_in: Optional[int] = None
    use_unet_skip_connection: bool = False
    skip_connect_scale: Optional[float] = None
    attn_qk_norm: bool = False
    use_gateloop_layers: bool = False
    # opt-in bf16 score matrix + softmax on the XLA attention path; None = f32
    # (reference numerics). Measured +9% train step at dim 512 — see
    # models/attention.py::Attention.scores_dtype and PERFORMANCE.md.
    attn_scores_dtype: Optional[jnp.dtype] = None
    rotary_theta: float = 50000.0
    remat: bool = False
    # named jax.checkpoint policy for remat=True: None = full recompute,
    # 'dots' = save matmul outputs, recompute only elementwise (see
    # _resolve_remat_policy; measured tradeoff in PERFORMANCE.md)
    remat_policy: Optional[str] = None
    scan_layers: bool = False
    # sequence parallelism: name of the mesh axis the MAIN token axis is
    # sharded over (the module must then run inside `shard_map`). Register
    # tokens are replicated on every shard and handled as a global prefix by
    # ring attention; rotary positions are offset by the shard index. See
    # parallel/sequence_parallel.py for the jit-able wrapper.
    seq_axis: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    def __post_init__(self):
        super().__post_init__()
        # reference asserts at construction (voicebox_pytorch.py:375); the
        # U-Net push/pop skip symmetry needs an even block count
        assert self.depth % 2 == 0, "depth must be even (U-Net skip symmetry)"

    @property
    def _resolved_flash(self) -> Optional[bool]:
        """`attn_flash` (reference kwarg name) wins when set; both None keeps
        the measured length-based dispatch in ops/flash_attention.py."""
        return self.attn_flash if self.attn_flash is not None else self.use_flash

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        mask: Optional[jax.Array] = None,
        adaptive_rmsnorm_cond: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        assert self.depth % 2 == 0, "depth must be even (U-Net skip symmetry)"
        batch, seq_len, _ = x.shape
        num_reg = int(self.num_register_tokens)
        has_registers = num_reg > 0
        if self.seq_axis is not None:
            assert not self.use_gateloop_layers, (
                "GateLoop's linear recurrence spans the whole sequence; it is "
                "not wired for sequence parallelism (reference configs "
                "default use_gateloop_layers=False)"
            )

        if has_registers:
            registers = self.param(
                "register_tokens", nn.initializers.normal(1.0), (num_reg, self.dim)
            )
            registers = jnp.broadcast_to(registers[None], (batch, num_reg, self.dim))
            x = jnp.concatenate([registers.astype(x.dtype), x], axis=1)
            if mask is not None:
                mask = jnp.pad(mask, ((0, 0), (num_reg, 0)), constant_values=True)

        # rotary table: registers sit at position -10000
        main_positions = jnp.arange(seq_len, dtype=jnp.int32)
        if self.seq_axis is not None:
            # seq_len here is the LOCAL shard; global position = shard offset
            main_positions = main_positions + jax.lax.axis_index(self.seq_axis) * seq_len
        if has_registers:
            register_positions = jnp.full((num_reg,), -10000, dtype=jnp.int32)
            positions = jnp.concatenate([register_positions, main_positions])
        else:
            positions = main_positions
        rotary_emb = rotary_frequencies(positions, self.dim_head, self.rotary_theta)

        skip_scale = (
            self.skip_connect_scale if self.skip_connect_scale is not None else 2**-0.5
        )

        if self.scan_layers:
            x = self._scan_forward(
                x, mask, rotary_emb, adaptive_rmsnorm_cond, deterministic, skip_scale
            )
            if has_registers:
                x = x[:, num_reg:]
            return RMSNorm(dim=self.dim, name="final_norm")(x)

        block_cls = _Block
        if self.remat:
            block_cls = nn.remat(
                _Block, static_argnums=(5,),
                policy=_resolve_remat_policy(self.remat_policy),
            )

        skip_connects = []
        for ind in range(self.depth):
            layer = ind + 1
            has_skip = self.use_unet_skip_connection and layer > (self.depth // 2)

            if not has_skip:
                skip_connects.append(x)
            else:
                skip = skip_connects.pop() * skip_scale
                x = jnp.concatenate([x, skip], axis=-1)
                x = nn.Dense(self.dim, dtype=self.dtype, name=f"skip_combiner_{ind}")(x)

            x = block_cls(
                dim=self.dim,
                dim_head=self.dim_head,
                heads=self.heads,
                ff_mult=self.ff_mult,
                attn_dropout=self.attn_dropout,
                ff_dropout=self.ff_dropout,
                use_flash=self._resolved_flash,
                adaptive_rmsnorm=self.adaptive_rmsnorm,
                adaptive_rmsnorm_cond_dim_in=self.adaptive_rmsnorm_cond_dim_in,
                attn_qk_norm=self.attn_qk_norm,
                use_gateloop=self.use_gateloop_layers,
                seq_axis=self.seq_axis,
                num_prefix=num_reg if self.seq_axis is not None else 0,
                attn_scores_dtype=self.attn_scores_dtype,
                dtype=self.dtype,
                name=f"block_{ind}",
            )(x, mask, rotary_emb, adaptive_rmsnorm_cond, deterministic)

        if has_registers:
            x = x[:, num_reg:]

        return RMSNorm(dim=self.dim, name="final_norm")(x)

    def _half_stack_cfg(self, deterministic, skip_scale):
        return dict(
            dim=self.dim,
            dim_head=self.dim_head,
            heads=self.heads,
            ff_mult=self.ff_mult,
            attn_dropout=self.attn_dropout,
            ff_dropout=self.ff_dropout,
            use_flash=self._resolved_flash,
            adaptive_rmsnorm=self.adaptive_rmsnorm,
            adaptive_rmsnorm_cond_dim_in=self.adaptive_rmsnorm_cond_dim_in,
            attn_qk_norm=self.attn_qk_norm,
            use_gateloop=self.use_gateloop_layers,
            seq_axis=self.seq_axis,
            num_prefix=(
                int(self.num_register_tokens) if self.seq_axis is not None else 0
            ),
            attn_scores_dtype=self.attn_scores_dtype,
            dtype=self.dtype,
            skip_scale=skip_scale,
            deterministic=deterministic,
            remat=self.remat,
            remat_policy=self.remat_policy,
        )

    def _scan_forward(self, x, mask, rotary_emb, norm_cond, deterministic,
                      skip_scale):
        half = self.depth // 2
        cfg = self._half_stack_cfg(deterministic, skip_scale)
        scan_kwargs = dict(
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            out_axes=0,
        )

        front = nn.scan(
            _HalfStack,
            in_axes=(nn.broadcast, nn.broadcast, nn.broadcast, nn.broadcast),
            length=half,
            **scan_kwargs,
        )(**cfg, has_skip=False, name="layers_front")
        x, skips = front(x, None, mask, rotary_emb, norm_cond)

        back = nn.scan(
            _HalfStack,
            in_axes=(0, nn.broadcast, nn.broadcast, nn.broadcast),
            **scan_kwargs,
        )(**cfg, has_skip=self.use_unet_skip_connection, name="layers_back")
        # reverse: last pushed skip pops first
        x, _ = back(x, skips[::-1], mask, rotary_emb, norm_cond)
        return x
