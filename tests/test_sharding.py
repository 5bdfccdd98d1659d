"""Tests for FSDP/TP parameter-sharding rules and sequence-parallel ring
attention on the 8-virtual-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from voicebox_tpu import ConditionalFlowMatcherWrapper, VoiceBox
from voicebox_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, make_mesh
from voicebox_tpu.parallel.sharding_rules import (
    make_param_shardings,
    param_partition_spec,
    shard_params,
)


class _Key:
    def __init__(self, key):
        self.key = key


def _path(*names):
    return tuple(_Key(n) for n in names)


class TestRules:
    def test_replicated(self):
        spec = param_partition_spec(_path("block_0", "attn", "to_qkv", "kernel"),
                                    jnp.zeros((64, 192)), mode="replicated")
        assert spec == P()

    def test_tp_column_row(self):
        shape = {"data": 2, "model": 4}
        qkv = param_partition_spec(_path("attn", "to_qkv", "kernel"),
                                   jnp.zeros((64, 192)), "tp", shape)
        assert qkv == P(None, MODEL_AXIS)
        out = param_partition_spec(_path("attn", "to_out", "kernel"),
                                   jnp.zeros((192, 64)), "tp", shape)
        assert out == P(MODEL_AXIS, None)
        ff_in = param_partition_spec(_path("ff", "proj_in", "kernel"),
                                     jnp.zeros((64, 256)), "tp", shape)
        assert ff_in == P(None, MODEL_AXIS)

    def test_tp_skips_indivisible(self):
        spec = param_partition_spec(_path("attn", "to_qkv", "kernel"),
                                    jnp.zeros((64, 190)), "tp",
                                    {"data": 2, "model": 4})
        assert spec == P(None, None)

    def test_tp_vocab(self):
        spec = param_partition_spec(_path("to_cond_emb", "embedding"),
                                    jnp.zeros((500, 64)), "tp",
                                    {"data": 2, "model": 4})
        assert spec == P(MODEL_AXIS, None)

    def test_fsdp_large_only(self):
        shape = {"data": 4, "model": 1}
        big = param_partition_spec(_path("ff", "proj_in", "kernel"),
                                   jnp.zeros((512, 512)), "fsdp", shape)
        assert DATA_AXIS in tuple(big)
        small = param_partition_spec(_path("norm", "gamma"),
                                     jnp.zeros((64,)), "fsdp", shape)
        assert small == P(None)

    def test_fsdp_plus_tp_compose(self):
        shape = {"data": 2, "model": 4}
        spec = param_partition_spec(_path("attn", "to_qkv", "kernel"),
                                    jnp.zeros((512, 768)), "fsdp+tp", shape)
        # tp on the output dim, fsdp picks the remaining (input) dim
        assert spec == P(DATA_AXIS, MODEL_AXIS)


class TestShardedTraining:
    @pytest.mark.parametrize("mode", ["fsdp", "tp", "fsdp+tp"])
    def test_train_step_runs_sharded(self, rng, mode, tmp_path):
        from voicebox_tpu.training.data import ArrayDataset
        from voicebox_tpu.training.trainer import VoiceBoxTrainer

        assert len(jax.devices()) == 8
        mesh = make_mesh(model_parallel=2)  # 4 x 2 mesh

        vb = VoiceBox(dim_in=32, dim=64, depth=2, dim_head=16, heads=4,
                      num_register_tokens=2, condition_on_text=False)
        cfm = ConditionalFlowMatcherWrapper(vb)
        cfm.init_params(rng, seq_len=16, batch=2)

        ds = ArrayDataset(
            [np.random.RandomState(i).randn(16, 32).astype(np.float32)
             for i in range(32)]
        )
        tr = VoiceBoxTrainer(
            cfm, batch_size=4, dataset=ds, num_train_steps=2, valid_frac=0.25,
            results_folder=str(tmp_path / "res"), mesh=mesh,
            param_sharding=mode, min_fsdp_size=1024, bucket_multiple=16,
            save_model_every=100, save_results_every=100,
        )
        # verify at least one weight actually got a non-trivial sharding
        specs = jax.tree.leaves(
            jax.tree.map(lambda p: p.sharding.spec, tr.params,
                         is_leaf=lambda x: hasattr(x, "sharding"))
        )
        assert any(any(ax is not None for ax in tuple(s)) for s in specs), (
            f"no param sharded under mode={mode}"
        )
        tr.train()
        assert tr.steps == 2

    def test_fsdp_matches_replicated_loss(self, rng):
        """Sharding must not change the math: one jitted loss under fsdp+tp
        equals the replicated loss."""
        mesh = make_mesh(model_parallel=2)
        vb = VoiceBox(dim_in=32, dim=64, depth=2, dim_head=16, heads=4,
                      num_register_tokens=2, condition_on_text=False)
        cfm = ConditionalFlowMatcherWrapper(vb)
        params = cfm.init_params(rng, seq_len=16, batch=2)
        x = jax.random.normal(rng, (4, 16, 32))
        key = jax.random.PRNGKey(7)

        loss_rep = jax.jit(cfm.loss_fn)(params, x, key)
        sharded = shard_params(mesh, params, "fsdp+tp", min_fsdp_size=256)
        loss_sh = jax.jit(cfm.loss_fn)(sharded, x, key)
        np.testing.assert_allclose(np.asarray(loss_rep), np.asarray(loss_sh),
                                   rtol=2e-5)


class TestRingAttention:
    """Sequence-parallel ring attention over an 8-device 'seq' axis."""

    def _mesh(self):
        return Mesh(np.array(jax.devices()[:8]), ("seq",))

    def _inputs(self, n=64, d=16, with_mask=True):
        ks = jax.random.split(jax.random.PRNGKey(3), 4)
        q = jax.random.normal(ks[0], (2, 2, n, d))
        k = jax.random.normal(ks[1], (2, 2, n, d))
        v = jax.random.normal(ks[2], (2, 2, n, d))
        mask = None
        if with_mask:
            mask = jax.random.bernoulli(ks[3], 0.75, (2, n)).at[:, :2].set(True)
        return q, k, v, mask

    def _sharded(self, mesh, with_mask):
        from voicebox_tpu.ops.ring_attention import ring_attention

        spec = P(None, None, "seq", None)
        mspec = P(None, "seq")
        if with_mask:
            return jax.shard_map(
                lambda q, k, v, m: ring_attention(q, k, v, m, axis_name="seq"),
                mesh=mesh, in_specs=(spec, spec, spec, mspec), out_specs=spec,
            )
        return jax.shard_map(
            lambda q, k, v: ring_attention(q, k, v, axis_name="seq"),
            mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        )

    @pytest.mark.parametrize("with_mask", [True, False])
    def test_matches_full_attention(self, with_mask):
        from voicebox_tpu.ops.flash_attention import reference_attention

        q, k, v, mask = self._inputs(with_mask=with_mask)
        mesh = self._mesh()
        f = self._sharded(mesh, with_mask)
        out = f(q, k, v, mask) if with_mask else f(q, k, v)
        ref = reference_attention(q, k, v, mask)
        np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)

    def test_custom_scale(self):
        from voicebox_tpu.ops.flash_attention import reference_attention
        from voicebox_tpu.ops.ring_attention import ring_attention

        q, k, v, _ = self._inputs(with_mask=False)
        mesh = self._mesh()
        spec = P(None, None, "seq", None)
        f = jax.shard_map(
            lambda q, k, v: ring_attention(q, k, v, scale=10.0, axis_name="seq"),
            mesh=mesh, in_specs=(spec,) * 3, out_specs=spec,
        )
        qn = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
        kn = k / jnp.linalg.norm(k, axis=-1, keepdims=True)
        np.testing.assert_allclose(
            f(qn, kn, v), reference_attention(qn, kn, v, scale=10.0),
            rtol=2e-4, atol=2e-5,
        )

    def test_gradients_match_full_attention(self):
        from voicebox_tpu.ops.flash_attention import reference_attention

        q, k, v, mask = self._inputs()
        mesh = self._mesh()
        f = self._sharded(mesh, with_mask=True)
        w = (jnp.arange(q.size, dtype=jnp.float32).reshape(q.shape) % 5) - 2

        ring_grads = jax.grad(
            lambda q, k, v: jnp.sum(f(q, k, v, mask) * w), argnums=(0, 1, 2)
        )(q, k, v)
        ref_grads = jax.grad(
            lambda q, k, v: jnp.sum(reference_attention(q, k, v, mask) * w),
            argnums=(0, 1, 2),
        )(q, k, v)
        for rg, fg in zip(ring_grads, ref_grads):
            np.testing.assert_allclose(rg, fg, rtol=2e-3, atol=2e-4)

    def test_jit_with_sharded_inputs(self):
        # the intended production use: jit + NamedSharding over the seq axis
        from jax.sharding import NamedSharding

        from voicebox_tpu.ops.flash_attention import reference_attention

        q, k, v, _ = self._inputs(with_mask=False)
        mesh = self._mesh()
        spec = P(None, None, "seq", None)
        sh = NamedSharding(mesh, spec)
        qs, ks_, vs = (jax.device_put(t, sh) for t in (q, k, v))
        f = jax.jit(self._sharded(mesh, with_mask=False))
        out = f(qs, ks_, vs)
        np.testing.assert_allclose(out, reference_attention(q, k, v),
                                   rtol=2e-4, atol=2e-5)


class TestShardedInference:
    """Serving from sharded params: `sample()` is a plain jit over the param
    tree, so TP/FSDP NamedShardings on the weights propagate through the
    compiled sampler (XLA inserts the collectives) — the multi-chip serving
    story for models too big for one chip's HBM. Parity must be exact math."""

    @pytest.mark.parametrize("mode", ["tp", "fsdp+tp"])
    def test_sample_matches_replicated(self, rng, mode):
        mesh = make_mesh(model_parallel=2)  # 4 x 2 mesh
        vb = VoiceBox(dim_in=32, dim=64, depth=2, dim_head=16, heads=4,
                      num_register_tokens=2, condition_on_text=False)
        cfm = ConditionalFlowMatcherWrapper(vb)
        params = cfm.init_params(rng, seq_len=16, batch=2)
        cond = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 32))
        key = jax.random.PRNGKey(11)

        out_rep = cfm.sample(cond=cond, steps=2, decode_to_audio=False,
                             rng=key)
        sharded = shard_params(mesh, params, mode, min_fsdp_size=256)
        specs = jax.tree.leaves(jax.tree.map(
            lambda p: p.sharding.spec, sharded,
            is_leaf=lambda x: hasattr(x, "sharding")))
        assert any(any(ax is not None for ax in tuple(s)) for s in specs)
        out_sh = cfm.sample(cond=cond, steps=2, decode_to_audio=False,
                            rng=key, params=sharded)
        np.testing.assert_allclose(np.asarray(out_rep), np.asarray(out_sh),
                                   rtol=2e-3, atol=3e-4)

    def test_sample_cfg_sharded(self, rng):
        # cond_scale != 1 routes through the 2b CFG batch — same parity bar
        mesh = make_mesh(model_parallel=2)
        vb = VoiceBox(dim_in=32, dim=64, depth=2, dim_head=16, heads=4,
                      num_register_tokens=2, condition_on_text=False)
        cfm = ConditionalFlowMatcherWrapper(vb)
        params = cfm.init_params(rng, seq_len=16, batch=2)
        cond = jax.random.normal(jax.random.PRNGKey(5), (2, 16, 32))
        key = jax.random.PRNGKey(13)

        out_rep = cfm.sample(cond=cond, steps=2, cond_scale=1.3,
                             decode_to_audio=False, rng=key)
        sharded = shard_params(mesh, params, "tp")
        out_sh = cfm.sample(cond=cond, steps=2, cond_scale=1.3,
                            decode_to_audio=False, rng=key, params=sharded)
        np.testing.assert_allclose(np.asarray(out_rep), np.asarray(out_sh),
                                   rtol=2e-3, atol=3e-4)


class TestCompiledCollectives:
    """Parity tests alone can't distinguish real sharding from silent full
    replication — a sharding-rule bug that replicated every tensor would
    still pass every numeric check above. Inspect the optimized HLO of the
    compiled grad step instead: the collectives the design claims
    (SURVEY.md §5 — DP gradients ride an all-reduce, FSDP gathers parameter
    shards on use, TP row-parallel matmuls reduce partial sums; the
    reference delegates all of this to NCCL inside accelerate,
    reference trainer.py:89-95) must actually appear in the program XLA
    emits for the mesh."""

    def _grad_hlo(self, mode, model_parallel=1, min_fsdp_size=256):
        from jax.sharding import NamedSharding

        mesh = make_mesh(model_parallel=model_parallel)
        vb = VoiceBox(dim_in=32, dim=64, depth=2, dim_head=16, heads=4,
                      num_register_tokens=2, condition_on_text=False)
        cfm = ConditionalFlowMatcherWrapper(vb)
        params = cfm.init_params(jax.random.PRNGKey(0), seq_len=16, batch=2)
        sharded = shard_params(mesh, params, mode,
                               min_fsdp_size=min_fsdp_size)
        x = jax.device_put(
            jax.random.normal(jax.random.PRNGKey(1), (8, 16, 32)),
            NamedSharding(mesh, P(DATA_AXIS)),
        )
        hlo = (
            jax.jit(jax.grad(cfm.loss_fn))
            .lower(sharded, x, jax.random.PRNGKey(2))
            .compile()
            .as_text()
        )
        return hlo, sharded

    def test_dp_gradients_all_reduce(self):
        # replicated params + batch-sharded data: the grad psum over the
        # 'data' axis must be a compiled all-reduce
        hlo, _ = self._grad_hlo("replicated")
        assert "all-reduce" in hlo

    def test_fsdp_gathers_and_rescatters(self):
        hlo, sharded = self._grad_hlo("fsdp")
        # forward/backward must gather the weight shards on use...
        assert "all-gather" in hlo
        # ...and reduce gradients back to shards (reduce-scatter, or the
        # unfused all-reduce + slice pair XLA sometimes emits instead)
        assert ("reduce-scatter" in hlo) or ("all-reduce" in hlo)
        # and a large kernel really lives 1/8th-per-device, not replicated
        leaves = [p for p in jax.tree.leaves(sharded)
                  if p.size * p.dtype.itemsize >= 256 * 4 and p.ndim >= 2]
        assert leaves
        frac = [ls.addressable_shards[0].data.size / ls.size for ls in leaves
                if any(ax is not None for ax in tuple(ls.sharding.spec))]
        assert frac and all(abs(f - 1 / 8) < 1e-9 for f in frac)

    def test_tp_partial_sums_all_reduce(self):
        # Megatron row-parallel (to_out / ff proj_out) matmuls produce
        # partial sums over the 'model' axis — an all-reduce must appear
        hlo, _ = self._grad_hlo("tp", model_parallel=2)
        assert "all-reduce" in hlo
