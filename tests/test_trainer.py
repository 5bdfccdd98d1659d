"""Tests for the L5 trainer: data pipeline, optimizer partition, schedule,
multi-device SPMD train step, checkpoint/resume, and the driver entry points."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from voicebox_tpu import ConditionalFlowMatcherWrapper, VoiceBox
from voicebox_tpu.parallel.mesh import make_mesh
from voicebox_tpu.training.data import (
    ArrayDataset,
    DataLoader,
    collate_with_mask,
    random_split,
)
from voicebox_tpu.training.optimizer import (
    decay_mask,
    get_optimizer,
    warmup_cosine_schedule,
)
from voicebox_tpu.training.trainer import VoiceBoxTrainer


def _make_cfm(rng, dim=32, seq=16):
    vb = VoiceBox(
        dim_in=dim, dim=dim, depth=2, dim_head=8, heads=4,
        num_register_tokens=2, condition_on_text=False,
    )
    cfm = ConditionalFlowMatcherWrapper(vb)
    cfm.init_params(rng, seq_len=seq, batch=2)
    return cfm


class TestData:
    def test_collate_pads_to_bucket(self):
        items = [np.ones((100, 4)), np.ones((180, 4))]
        batch, mask = collate_with_mask(items, bucket_multiple=64)
        assert batch.shape == (2, 192, 4)  # 180 -> next multiple of 64
        assert mask.sum(-1).tolist() == [100, 180]
        assert (batch[0, 100:] == 0).all()

    def test_collate_register_offset_grid(self):
        # 740 frames + 16 registers: offset grid gives 752 (-> 768 model len,
        # 6*128 aligned) instead of 768 (-> 784, padded to 896 tiles)
        items = [np.ones((740, 4))]
        batch, _ = collate_with_mask(items, bucket_multiple=256, bucket_offset=16)
        assert batch.shape == (1, 752, 4)

    def test_collate_offset_keeps_curated_lengths(self):
        # items exactly on the legacy grid must NOT be pushed a bucket up:
        # 256 + 16 registers pads to 384 tiles, far cheaper than a 496 bucket
        items = [np.ones((256, 4))]
        batch, _ = collate_with_mask(items, bucket_multiple=256, bucket_offset=16)
        assert batch.shape == (1, 256, 4)

    def test_collate_max_length_snaps_to_offset_grid(self):
        # a legacy k*multiple cap must not reintroduce the misaligned shape
        items = [np.ones((1000, 4))]
        batch, mask = collate_with_mask(
            items, bucket_multiple=256, bucket_offset=16, max_length=768
        )
        assert batch.shape == (1, 752, 4)
        assert mask.sum() == 752  # curtailed to the cap

    def test_aligned_loader_max_length_snaps_and_pads_with_minus_one(self):
        # the paired-conditioning loader applies the SAME offset-grid snap
        # as collate_with_mask (a legacy 768 cap with 16 registers must land
        # on 752, not 768) and pads ids with -1, the framework-wide id pad
        from voicebox_tpu.training.data import AlignedPairedDataLoader

        rs = np.random.RandomState(0)
        items = [
            (rs.randn(n, 4).astype(np.float32),
             rs.randint(0, 20, n).astype(np.int32))
            for n in (1000, 300)
        ]
        dl = AlignedPairedDataLoader(
            items, 2, bucket_multiple=256, bucket_offset=16, max_length=768,
            shuffle=False,
        )
        (x, mask), (ids, _) = next(iter(dl))
        assert x.shape[1] == 752 and ids.shape[1] == 752
        assert np.all(ids[~mask] == -1)
        assert np.all(ids[mask] >= 0)

    def test_trainer_auto_bucket_offset_latents(self, tmp_path, rng):
        # latent dataset + 2 register tokens -> buckets at k*64 - 2
        vb = VoiceBox(dim_in=8, dim=32, depth=2, dim_head=8, heads=4,
                      num_register_tokens=2, condition_on_text=False)
        cfm = ConditionalFlowMatcherWrapper(vb)
        cfm.init_params(rng, seq_len=16, batch=2)
        data = [np.random.RandomState(i).randn(50, 8).astype(np.float32) for i in range(8)]
        tr = VoiceBoxTrainer(
            cfm, batch_size=2, dataset=ArrayDataset(data), num_train_steps=1,
            valid_frac=0.25, results_folder=str(tmp_path / "r"), use_mesh=False,
            bucket_multiple=64,
        )
        wave, _ = next(tr.dl_iter)
        assert (wave.shape[-2] + 2) % 64 == 0

    def test_collate_curtail(self):
        items = [np.ones((100,)), np.ones((80,))]
        batch, mask = collate_with_mask(items, pad_to_longest=False)
        assert batch.shape == (2, 80)
        assert mask.all()

    def test_loader_static_shapes(self):
        ds = ArrayDataset([np.ones((50 + i,)) for i in range(10)])
        dl = DataLoader(ds, batch_size=4, bucket_multiple=64, seed=0)
        shapes = {b.shape for b, _ in dl}
        assert shapes == {(4, 64)}  # one bucket -> one compiled shape

    def test_loader_wraps_partial_batch(self):
        ds = ArrayDataset([np.ones((10,))] * 5)
        dl = DataLoader(ds, batch_size=4, seed=0)
        batches = list(dl)
        assert all(b.shape[0] == 4 for b, _ in batches)

    def test_random_split_deterministic(self):
        ds = ArrayDataset([np.full((4,), i) for i in range(20)])
        tr1, va1 = random_split(ds, 0.25, seed=42)
        tr2, va2 = random_split(ds, 0.25, seed=42)
        assert len(va1) == 5 and len(tr1) == 15
        assert [va1[i][0] for i in range(5)] == [va2[i][0] for i in range(5)]


class TestOptimizer:
    def test_decay_mask_partition(self):
        params = {"w": jnp.zeros((4, 4)), "b": jnp.zeros((4,)), "g": jnp.zeros(())}
        mask = decay_mask(params)
        assert mask["w"] and not mask["b"] and not mask["g"]

    def test_warmup_then_cosine(self):
        sched = warmup_cosine_schedule(3e-4, 1e-5, num_warmup_steps=10, num_train_steps=100)
        assert np.isclose(sched(0), 1e-5)
        assert np.isclose(sched(10), 3e-4, rtol=1e-3)
        assert sched(100) < 1e-5  # cosine decays toward 0
        # monotone increase during warmup
        assert sched(5) > sched(1)

    def test_get_optimizer_no_wd_is_adam(self):
        opt = get_optimizer(lr=1e-4, wd=0.0)
        params = {"w": jnp.ones((2, 2))}
        state = opt.init(params)
        g = {"w": jnp.ones((2, 2))}
        updates, _ = opt.update(g, state, params)
        assert jnp.isfinite(updates["w"]).all()

    def test_clip_applied(self):
        opt = get_optimizer(lr=1.0, wd=0.0, max_grad_norm=0.5)
        params = {"w": jnp.zeros((2, 2))}
        state = opt.init(params)
        g = {"w": jnp.full((2, 2), 100.0)}
        updates, _ = opt.update(g, state, params)
        assert jnp.isfinite(updates["w"]).all()

    @pytest.mark.parametrize("max_grad_norm", [None, 0.5])
    def test_lowp_transform_matches_optax_chain(self, max_grad_norm):
        """`_scale_by_adam_fused` (the bf16-moment storage transform, here at
        f32 with its optional clip folding) reproduces
        optax.chain(clip_by_global_norm, adamw) step-for-step — including
        steps where the clip triggers and where it doesn't."""
        import optax

        from voicebox_tpu.training.optimizer import (
            _scale_by_adam_fused,
            decay_mask as dm,
        )

        params = {"w": jnp.linspace(-1, 1, 12).reshape(3, 4),
                  "b": jnp.ones((4,)) * 0.1}
        ours = optax.chain(
            _scale_by_adam_fused(0.9, 0.99, 1e-8, clip_norm=max_grad_norm),
            optax.add_decayed_weights(0.01, mask=dm),
            optax.scale_by_learning_rate(1e-3),
        )
        chain = [optax.adamw(1e-3, b1=0.9, b2=0.99, eps=1e-8,
                             weight_decay=0.01, mask=dm)]
        if max_grad_norm is not None:
            chain.insert(0, optax.clip_by_global_norm(max_grad_norm))
        ref = optax.chain(*chain)
        so, sr = ours.init(params), ref.init(params)
        po = pr = params
        for i in range(4):
            # alternate tiny grads (clip idle) and huge grads (clip active)
            mag = 100.0 if i % 2 else 0.01
            g = jax.tree.map(
                lambda p: (mag * jnp.cos(p + i)).astype(jnp.float32), params
            )
            uo, so = ours.update(g, so, po)
            ur, sr = ref.update(g, sr, pr)
            po = optax.apply_updates(po, uo)
            pr = optax.apply_updates(pr, ur)
        for a, b in zip(jax.tree.leaves(po), jax.tree.leaves(pr)):
            np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)

    def test_moment_dtype_bf16_state_and_updates(self):
        opt = get_optimizer(lr=1e-3, wd=0.01, moment_dtype=jnp.bfloat16,
                            max_grad_norm=0.5)
        params = {"w": jnp.ones((4, 4))}
        state = opt.init(params)
        adam_state = state[1][0]  # (clip, (lowp adam, decay, lr)) chain
        assert adam_state.mu["w"].dtype == jnp.bfloat16
        assert adam_state.nu["w"].dtype == jnp.bfloat16
        g = {"w": jnp.full((4, 4), 0.3)}
        updates, state = opt.update(g, state, params)
        # wd stage re-promotes the bf16 adam update to f32
        assert updates["w"].dtype == jnp.float32
        assert jnp.isfinite(updates["w"]).all()


class TestTrainer:
    def _trainer(self, tmp_path, rng, **kw):
        cfm = _make_cfm(rng)
        ds = ArrayDataset(
            [np.random.RandomState(i).randn(16, 32).astype(np.float32) for i in range(16)]
        )
        return VoiceBoxTrainer(
            cfm,
            batch_size=4,
            dataset=ds,
            num_train_steps=3,
            num_warmup_steps=1,
            valid_frac=0.25,
            results_folder=str(tmp_path / "results"),
            save_model_every=2,
            save_results_every=2,
            bucket_multiple=16,
            use_mesh=kw.pop("use_mesh", False),
            **kw,
        )

    def test_train_runs_and_logs(self, tmp_path, rng):
        tr = self._trainer(tmp_path, rng)
        tr.train()
        assert tr.steps == 3
        metrics = (tmp_path / "results" / "metrics.jsonl").read_text().splitlines()
        assert any("train_loss" in line for line in metrics)
        assert any("valid_loss" in line for line in metrics)

    def test_grad_accum(self, tmp_path, rng):
        tr = self._trainer(tmp_path, rng, grad_accum_every=2)
        logs = tr.train_step()
        assert np.isfinite(logs["loss"])

    def test_checkpoint_resume(self, tmp_path, rng):
        tr = self._trainer(tmp_path, rng)
        tr.train_step()
        path = tmp_path / "results" / "ckpt.msgpack"
        tr.save(path)

        tr2 = self._trainer(tmp_path, jax.random.PRNGKey(99))
        tr2.load(path)
        assert tr2.steps == tr.steps
        a = jax.tree.leaves(tr.params)[0]
        b = jax.tree.leaves(tr2.params)[0]
        np.testing.assert_allclose(a, b)

    def test_mesh_training(self, tmp_path, rng):
        assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
        mesh = make_mesh()
        cfm = _make_cfm(rng)
        ds = ArrayDataset(
            [np.random.RandomState(i).randn(16, 32).astype(np.float32) for i in range(32)]
        )
        tr = VoiceBoxTrainer(
            cfm, batch_size=8, dataset=ds, num_train_steps=2, valid_frac=0.25,
            results_folder=str(tmp_path / "res"), mesh=mesh, bucket_multiple=16,
            save_model_every=100, save_results_every=100,
        )
        tr.train()
        assert tr.steps == 2

    def test_tracker_receives_events(self, tmp_path, rng):
        """Experiment-tracker hook mirroring accelerate's
        init_trackers("voicebox", hps) + log (reference
        trainer.py:182-189,285,302): a custom tracker object must receive the
        init config, train-loss records at their steps, valid-loss records,
        and a finish() at end of training (VERDICT r3 item 7)."""

        class Recorder:
            def __init__(self):
                self.inits, self.logs, self.finished = [], [], False

            def init_trackers(self, project, config):
                self.inits.append((project, dict(config)))

            def log(self, values, step):
                self.logs.append((dict(values), step))

            def finish(self):
                self.finished = True

        rec = Recorder()
        tr = self._trainer(tmp_path, rng, trackers=(rec,), log_every=1)
        tr.train()
        assert rec.inits and rec.inits[0][0] == "voicebox"
        assert rec.inits[0][1]["num_train_steps"] == 3
        train_steps = sorted(s for v, s in rec.logs if "train_loss" in v)
        assert train_steps == [0, 1, 2]
        assert all(np.isfinite(v["train_loss"])
                   for v, _ in rec.logs if "train_loss" in v)
        valid_steps = [s for v, s in rec.logs if "valid_loss" in v]
        assert 0 in valid_steps and 2 in valid_steps  # save_results_every=2
        assert rec.finished

    def test_tracker_plain_callable(self, tmp_path, rng):
        records = []
        tr = self._trainer(
            tmp_path, rng,
            trackers=(lambda record, step: records.append((record, step)),),
            log_every=1,
        )
        tr.train()
        events = {r.get("event") for r, _ in records}
        assert "init_trackers" in events
        assert any("train_loss" in r for r, _ in records)
        assert any("valid_loss" in r for r, _ in records)

    def test_generate_delegates_to_sample(self, tmp_path, rng):
        # the reference's .generate calls a nonexistent method (trainer.py:212-213);
        # ours must actually sample
        tr = self._trainer(tmp_path, rng)
        cond = jnp.zeros((1, 16, 32))
        out = tr.generate(cond=cond, steps=2)
        assert out.shape == (1, 16, 32)


class TestGraftEntry:
    def test_dryrun_multichip(self):
        import importlib.util, pathlib

        spec = importlib.util.spec_from_file_location(
            "__graft_entry__", pathlib.Path(__file__).parent.parent / "__graft_entry__.py"
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mod.dryrun_multichip(8)

    @pytest.mark.slow
    def test_entry_compiles(self):
        import importlib.util, pathlib

        spec = importlib.util.spec_from_file_location(
            "__graft_entry__", pathlib.Path(__file__).parent.parent / "__graft_entry__.py"
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        fn, args = mod.entry()
        jax.eval_shape(fn, *args)  # abstract compile check (fast)


class TestConditionalTraining:
    def test_semantic_conditioned_raw_audio_training(self, tmp_path, rng):
        """Trainer derives HuBERT ids from raw waves and threads them through
        the jitted step (reference voicebox_pytorch.py:1384-1389 analogue)."""
        from voicebox_tpu.models.codec import MelVoco
        from voicebox_tpu.models.hubert import HubertWithKmeans
        from voicebox_tpu.models.text_to_semantic import TextToSemantic
        from voicebox_tpu.models.vocos import Vocos

        codec = MelVoco(vocos=Vocos(input_channels=100, dim=32,
                                    intermediate_dim=64, num_layers=2))
        w2v = HubertWithKmeans(num_clusters=20, dim=32, depth=2, heads=4)
        tts = TextToSemantic(dim=32, source_depth=2, target_depth=2, heads=4,
                             dim_head=8, wav2vec=w2v)
        tts.init_params(jax.random.PRNGKey(0))
        vb = VoiceBox(audio_enc_dec=codec, dim=64, depth=2, dim_head=16,
                      heads=4, dim_cond_emb=32, num_register_tokens=2,
                      condition_on_text=True, num_cond_tokens=20)
        cfm = ConditionalFlowMatcherWrapper(vb, text_to_semantic=tts,
                                            cond_drop_prob=0.2)
        cfm.init_params(rng, seq_len=31, batch=2)

        ds = ArrayDataset(
            [np.random.RandomState(i).randn(4800).astype(np.float32) * 0.1
             for i in range(8)]
        )
        tr = VoiceBoxTrainer(
            cfm, batch_size=2, dataset=ds, num_train_steps=2, valid_frac=0.25,
            results_folder=str(tmp_path / "res"), bucket_multiple=4800,
            save_model_every=100, save_results_every=100, use_mesh=False,
        )
        tr.train()
        assert tr.steps == 2

    def test_paired_precomputed_cond_ids(self, tmp_path, rng):
        """Training a conditional model from (latents, frame-aligned ids)
        pairs — the duration pipeline's aligned-phoneme conditioning
        (reference voicebox_pytorch.py:1231-1241) with features extracted
        offline. Both fields must ride ONE shared bucket grid so padding
        keeps the ids frame-aligned."""
        from voicebox_tpu.training.data import AlignedPairedDataLoader

        n_ids, dim_in = 20, 8
        vb = VoiceBox(dim_in=dim_in, dim=32, depth=2, dim_head=8, heads=4,
                      dim_cond_emb=16, num_register_tokens=2,
                      condition_on_text=True, num_cond_tokens=n_ids)
        cfm = ConditionalFlowMatcherWrapper(vb, cond_drop_prob=0.2)
        cfm.init_params(rng, seq_len=16, batch=2)

        rs = np.random.RandomState(0)
        items = []
        for _ in range(8):
            n = int(rs.randint(10, 30))
            items.append((
                rs.randn(n, dim_in).astype(np.float32),
                rs.randint(0, n_ids, n).astype(np.int32),
            ))

        tr = VoiceBoxTrainer(
            cfm, batch_size=2, dataset=items, num_train_steps=3,
            valid_frac=0.25, results_folder=str(tmp_path / "res"),
            bucket_multiple=16, use_mesh=False, prefetch_batches=0,
        )
        assert tr._paired_cond_ids
        tr.train()
        assert tr.steps == 3

        # the shared grid: ids and latents collate to the SAME target; the
        # register-offset grid applies to both
        dl = AlignedPairedDataLoader(items, 4, bucket_multiple=16,
                                     bucket_offset=2)
        (x, mask), (ids, mask2) = next(iter(dl))
        assert x.shape[1] == ids.shape[1]
        assert mask is mask2
        assert (x.shape[1] + 2) % 16 == 0 or x.shape[1] % 16 == 0

        # unaligned pairs refuse loudly
        bad = [(np.zeros((12, dim_in), np.float32),
                np.zeros((7,), np.int32))]
        with pytest.raises(AssertionError, match="equal lengths"):
            next(iter(AlignedPairedDataLoader(bad, 1, bucket_multiple=16)))

        # raw-audio first fields refuse paired mode (ids derive via wav2vec)
        with pytest.raises(AssertionError, match="LATENTS"):
            VoiceBoxTrainer(
                cfm, batch_size=2, num_train_steps=1, valid_frac=0.25,
                dataset=[(np.zeros(64, np.float32),
                          np.zeros(4, np.int32))] * 8,
                results_folder=str(tmp_path / "res2"), use_mesh=False,
            )

    def test_paired_ids_actually_condition_the_loss(self, tmp_path, rng):
        """The ids reaching the jitted step must MATTER: the same trainer fed
        constant ids vs per-item ids diverges after a few steps."""
        n_ids, dim_in = 20, 8

        def run(use_real_ids):
            vb = VoiceBox(dim_in=dim_in, dim=32, depth=2, dim_head=8,
                          heads=4, dim_cond_emb=16, num_register_tokens=2,
                          condition_on_text=True, num_cond_tokens=n_ids)
            cfm = ConditionalFlowMatcherWrapper(vb, cond_drop_prob=0.0)
            cfm.init_params(jax.random.PRNGKey(0), seq_len=16, batch=2)
            rs = np.random.RandomState(1)
            items = []
            for _ in range(8):
                n = int(rs.randint(10, 30))
                ids = rs.randint(0, n_ids, n) if use_real_ids else np.zeros(n)
                items.append((rs.randn(n, dim_in).astype(np.float32),
                              ids.astype(np.int32)))
            tr = VoiceBoxTrainer(
                cfm, batch_size=2, dataset=items, num_train_steps=2,
                valid_frac=0.25, use_mesh=False, prefetch_batches=0,
                results_folder=str(tmp_path / f"r{use_real_ids}"),
                bucket_multiple=16, seed=3,
            )
            tr.train()
            return tr.params

        pa, pb = run(True), run(False)
        deltas = [
            float(jnp.max(jnp.abs(a - b)))
            for a, b in zip(jax.tree.leaves(pa), jax.tree.leaves(pb))
        ]
        assert max(deltas) > 1e-6  # the conditioning ids changed the updates


class TestOrbaxCheckpoint:
    def test_orbax_save_restore_roundtrip(self, tmp_path, rng):
        cfm = _make_cfm(rng)
        ds = ArrayDataset(
            [np.random.RandomState(i).randn(16, 32).astype(np.float32) for i in range(16)]
        )
        tr = VoiceBoxTrainer(
            cfm, batch_size=4, dataset=ds, num_train_steps=2, valid_frac=0.25,
            results_folder=str(tmp_path / "r"), save_model_every=1,
            save_results_every=100, bucket_multiple=16, use_mesh=False,
            checkpoint_backend="orbax",
        )
        tr.train()
        tr.checkpointer.wait()
        latest = tr.checkpointer.latest_step()
        assert latest is not None

        tr2 = VoiceBoxTrainer(
            cfm, batch_size=4, dataset=ds, num_train_steps=2, valid_frac=0.25,
            results_folder=str(tmp_path / "r"), save_model_every=100,
            save_results_every=100, bucket_multiple=16, use_mesh=False,
            checkpoint_backend="orbax",
        )
        tr2.load(latest)
        assert tr2.steps == latest
        a = jax.tree.leaves(tr.params)[0]
        b = jax.tree.leaves(tr2.params)[0]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

        # step parsing anchors on the basename's step field: the trainer's
        # canonical name resolves, digit-bearing suffixes/directories raise
        # instead of silently restoring the wrong step
        tr2.load(f"some_dir/voicebox.{latest}.ckpt")
        assert tr2.steps == latest
        import pytest

        with pytest.raises(ValueError, match="unambiguously"):
            tr2.load(f"run_v2/voicebox.{latest}.ckpt.bak3")


class TestTrainConfig:
    def test_roundtrip_and_build(self, rng, tmp_path):
        import json

        from voicebox_tpu.training.config import MeshConfig, TrainConfig

        cfg = TrainConfig(batch_size=2, num_train_steps=1, valid_frac=0.25,
                          bucket_multiple=16, results_folder=str(tmp_path / "r"),
                          use_mesh=False)
        # serialisable and round-trips
        d = json.loads(json.dumps(cfg.to_dict()))
        assert TrainConfig.from_dict(d) == cfg

        cfm = _make_cfm(rng)
        ds = ArrayDataset([np.ones((16, 32), np.float32)] * 8)
        tr = cfg.build(cfm, ds)
        tr.train()
        assert tr.steps == 1

    def test_mesh_config_builds(self):
        from voicebox_tpu.training.config import MeshConfig

        mesh = MeshConfig(model_parallel=2).build()
        assert mesh.shape["model"] == 2 and mesh.shape["data"] == 4

    def test_moment_dtype_string_roundtrips_and_builds(self, rng, tmp_path):
        import json

        from voicebox_tpu.training.config import TrainConfig

        cfg = TrainConfig(batch_size=2, num_train_steps=1, valid_frac=0.25,
                          bucket_multiple=16, moment_dtype="bfloat16",
                          results_folder=str(tmp_path / "r"), use_mesh=False)
        d = json.loads(json.dumps(cfg.to_dict()))
        assert TrainConfig.from_dict(d) == cfg

        cfm = _make_cfm(rng)
        ds = ArrayDataset([np.ones((16, 32), np.float32)] * 8)
        tr = cfg.build(cfm, ds)
        adam_state = tr.opt_state[1][0]
        leaves = jax.tree.leaves(adam_state.mu)
        assert all(l.dtype == jnp.bfloat16 for l in leaves)
        tr.train()
        assert tr.steps == 1


class TestPrefetchLoader:
    def test_preserves_order_and_content(self):
        from voicebox_tpu.training.data import DataLoader, PrefetchLoader

        ds = ArrayDataset([np.full((8, 4), i, np.float32) for i in range(12)])
        dl = DataLoader(ds, batch_size=4, shuffle=False, bucket_multiple=8)
        plain = [(b.copy(), m.copy()) for b, m in dl]
        pre = list(PrefetchLoader(dl, prefetch=2))
        assert len(plain) == len(pre)
        for (b0, m0), (b1, m1) in zip(plain, pre):
            np.testing.assert_array_equal(b0, b1)
            np.testing.assert_array_equal(m0, m1)

    def test_cycle_is_infinite(self):
        from voicebox_tpu.training.data import DataLoader, PrefetchLoader

        ds = ArrayDataset([np.zeros((8, 4), np.float32)] * 4)
        dl = DataLoader(ds, batch_size=2, bucket_multiple=8)
        it = PrefetchLoader(dl, prefetch=2).cycle()
        for _ in range(7):  # > one epoch (2 batches)
            b, m = next(it)
            assert b.shape[0] == 2
        it.close()  # abandon mid-stream; producer must unblock

    def test_producer_exception_reraises(self):
        from voicebox_tpu.training.data import PrefetchLoader

        class Boom:
            def __iter__(self):
                yield (np.zeros(1), np.zeros(1))
                raise RuntimeError("decode failed")

        it = iter(PrefetchLoader(Boom(), prefetch=1))
        next(it)
        with pytest.raises(RuntimeError, match="decode failed"):
            next(it)

    def test_plain_iterable_cycle(self):
        from voicebox_tpu.training.data import PrefetchLoader

        data = [1, 2, 3]
        it = PrefetchLoader(data, prefetch=1).cycle()
        got = [next(it) for _ in range(7)]
        assert got == [1, 2, 3, 1, 2, 3, 1]
        it.close()


class TestClipF32:
    """clip_by_global_norm_f32: optax-exact on f32 trees; norm accumulated in
    f32 and output dtype preserved on bf16 trees."""

    def _tree(self, dtype, scale=1.0):
        r = np.random.RandomState(0)
        return {
            "a": jnp.asarray(scale * r.randn(64, 64), dtype),
            "b": jnp.asarray(scale * r.randn(256), dtype),
        }

    @pytest.mark.parametrize("scale", [0.01, 10.0])  # under / over the limit
    def test_matches_optax_on_f32(self, scale):
        from voicebox_tpu.training.optimizer import clip_by_global_norm_f32

        grads = self._tree(jnp.float32, scale)
        ours, _ = clip_by_global_norm_f32(0.5).update(grads, optax.EmptyState())
        ref, _ = optax.clip_by_global_norm(0.5).update(
            grads, optax.clip_by_global_norm(0.5).init(grads)
        )
        for o, r in zip(jax.tree.leaves(ours), jax.tree.leaves(ref)):
            np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                       rtol=1e-6)

    def test_bf16_tree_keeps_dtype_and_uses_f32_norm(self):
        from voicebox_tpu.training.optimizer import clip_by_global_norm_f32

        grads = self._tree(jnp.bfloat16, 10.0)
        out, _ = clip_by_global_norm_f32(0.5).update(grads, optax.EmptyState())
        for o in jax.tree.leaves(out):
            assert o.dtype == jnp.bfloat16  # the bf16 stream stays bf16
        # clipped tree's f32 norm lands at the limit
        gnorm = float(jnp.sqrt(sum(
            jnp.sum(jnp.square(o.astype(jnp.float32)))
            for o in jax.tree.leaves(out)
        )))
        assert abs(gnorm - 0.5) < 0.02  # bf16 rounding of the scaled leaves


class TestMixedPrecisionParams:
    """param_dtype=bfloat16: bf16 live tree + f32 master (the TPU
    mixed-precision recipe; PERFORMANCE.md measures it at dim 1024)."""

    def _trainer(self, tmp_path, rng, **kw):
        cfm = _make_cfm(rng)
        ds = ArrayDataset(
            [np.random.RandomState(i).randn(16, 32).astype(np.float32)
             for i in range(16)]
        )
        return VoiceBoxTrainer(
            cfm, batch_size=4, dataset=ds, num_train_steps=3,
            valid_frac=0.25, results_folder=str(tmp_path / "results"),
            save_model_every=100, save_results_every=100,
            bucket_multiple=16, use_mesh=False,
            param_dtype=jnp.bfloat16, **kw,
        )

    def test_master_f32_live_bf16(self, tmp_path, rng):
        tr = self._trainer(tmp_path, rng)
        logs = tr.train_step()
        assert np.isfinite(np.asarray(logs["loss"]))
        for p in jax.tree.leaves(tr.params):
            assert p.dtype == jnp.float32  # master stays f32
        for p in jax.tree.leaves(tr._live):
            assert p.dtype == jnp.bfloat16
        # live tree is exactly the cast master (same program produced both)
        for m, l in zip(jax.tree.leaves(tr.params), jax.tree.leaves(tr._live)):
            np.testing.assert_array_equal(
                np.asarray(m, dtype=jnp.bfloat16), np.asarray(l)
            )

    def test_first_step_matches_f32_trainer_closely(self, tmp_path, rng):
        # same data/rng: the ONLY difference is bf16 rounding of the live
        # params the gradients are taken at -> the post-step masters must
        # agree to bf16-level tolerance
        tr_mp = self._trainer(tmp_path / "mp", rng)
        cfm = _make_cfm(rng)  # fresh identical params (same rng)
        ds = ArrayDataset(
            [np.random.RandomState(i).randn(16, 32).astype(np.float32)
             for i in range(16)]
        )
        tr_f32 = VoiceBoxTrainer(
            cfm, batch_size=4, dataset=ds, num_train_steps=3,
            valid_frac=0.25, results_folder=str(tmp_path / "f32"),
            save_model_every=100, save_results_every=100,
            bucket_multiple=16, use_mesh=False,
        )
        tr_mp.train_step()
        tr_f32.train_step()
        a = np.concatenate([np.asarray(x).ravel()
                            for x in jax.tree.leaves(tr_mp.params)])
        b = np.concatenate([np.asarray(x).ravel()
                            for x in jax.tree.leaves(tr_f32.params)])
        rel = np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-9)
        assert rel < 5e-2, rel

    def test_training_converges(self, tmp_path, rng):
        tr = self._trainer(tmp_path, rng)
        tr.train()
        assert tr.steps == 3
        assert np.isfinite(np.asarray(jax.tree.leaves(tr.params)[0])).all()

    def test_grad_accum_uses_f32_accumulator(self, tmp_path, rng):
        tr = self._trainer(tmp_path, rng, grad_accum_every=2)
        logs = tr.train_step()
        assert np.isfinite(np.asarray(logs["loss"]))

    def test_checkpoint_roundtrip_restores_live(self, tmp_path, rng):
        tr = self._trainer(tmp_path, rng)
        tr.train_step()
        path = tmp_path / "results" / "ckpt.msgpack"
        tr.save(path)
        tr2 = self._trainer(tmp_path, jax.random.PRNGKey(99))
        tr2.load(path)
        for a, b in zip(jax.tree.leaves(tr.params), jax.tree.leaves(tr2.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(tr._live), jax.tree.leaves(tr2._live)):
            assert b.dtype == jnp.bfloat16
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
