"""TextToSemanticTrainer — training the text→semantic stage in-framework.

The reference consumes a pretrained spear-tts model and ships no trainer
(voicebox_pytorch.py:29,1127-1150); upstream checkpoints are a declared port
non-goal (PARITY.md), so this trainer IS the migration path for the stage.
Covered here: id-pair and wave-derived-target datasets, per-field bucket
grids, wave→id masking at true frame counts, checkpoint resume, tracker
events, mesh data parallelism parity."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from voicebox_tpu.models.text_to_semantic import TextToSemantic
from voicebox_tpu.training.data import PairedDataLoader, PairedDataset
from voicebox_tpu.training.seq2seq_trainer import TextToSemanticTrainer

VOCAB_TEXT, VOCAB_SEM = 30, 24


def _t2s(seed=0):
    t2s = TextToSemantic(
        dim=32, num_text_token_ids=VOCAB_TEXT, num_semantic_token_ids=VOCAB_SEM,
        source_depth=2, target_depth=1, heads=2, dim_head=16, seed=seed,
    )
    t2s.init_params(jax.random.PRNGKey(seed))
    return t2s


def _id_pairs(n=10, seed=0):
    rs = np.random.RandomState(seed)
    return [
        (
            rs.randint(0, VOCAB_TEXT, rs.randint(5, 12)).astype(np.int32),
            rs.randint(0, VOCAB_SEM, rs.randint(8, 20)).astype(np.int32),
        )
        for _ in range(n)
    ]


def _trainer(tmp_path, t2s, dataset, steps=3, **kw):
    kw.setdefault("use_mesh", False)
    kw.setdefault("valid_frac", 0.25)
    return TextToSemanticTrainer(
        t2s, batch_size=2, dataset=dataset, num_train_steps=steps,
        wd=1e-2, results_folder=str(tmp_path / "r"),
        text_bucket_multiple=8, semantic_bucket_multiple=8,
        prefetch_batches=0, **kw,
    )


class TestEpochMath:
    def test_epochs_account_for_accum_and_split(self):
        # one epoch = ONE pass over the training split: each optimizer step
        # consumes batch_size * grad_accum_every items (the reference's
        # formula, trainer.py:141, would train grad_accum_every x as long)
        from voicebox_tpu.training.base import TrainerBase

        f = TrainerBase._steps_from_epochs
        assert f(1, 1000, 8, 4, 0.0) == 1000 // 32
        assert f(2, 1000, 8, 1, 0.0) == 250
        # the valid split comes off the top, exactly as random_split sizes it
        assert f(1, 1000, 8, 4, 0.05) == int(0.95 * 1000) // 32
        # tiny datasets floor at one step per epoch
        assert f(3, 10, 8, 4, 0.0) == 3

    def test_trainer_uses_split_and_accum(self, tmp_path):
        t2s = _t2s()
        tr = TextToSemanticTrainer(
            t2s, batch_size=2, dataset=_id_pairs(n=12), num_epochs=2,
            grad_accum_every=2, valid_frac=0.25, use_mesh=False,
            results_folder=str(tmp_path / "r"),
            text_bucket_multiple=8, semantic_bucket_multiple=8,
            prefetch_batches=0,
        )
        # 12 items -> 9 train; 9 // (2*2) = 2 steps/epoch * 2 epochs
        assert tr.num_train_steps == 4


class TestPairedDataLoader:
    def test_independent_bucket_grids(self):
        ds = PairedDataset(_id_pairs())
        dl = PairedDataLoader(
            ds, 4, bucket_multiples=(8, 16), pad_values=(-1, -1)
        )
        for (t, tm), (s, sm) in dl:
            assert t.shape[0] == s.shape[0] == 4
            assert t.shape[1] % 8 == 0 and s.shape[1] % 16 == 0
            # pads are -1 exactly where the mask is off
            assert np.all((t == -1) == ~tm)
            assert np.all((s == -1) == ~sm)

    def test_wraparound_keeps_batch_static(self):
        ds = PairedDataset(_id_pairs(n=5))
        batches = list(
            PairedDataLoader(ds, 4, bucket_multiples=(8, 8),
                             pad_values=(-1, -1))
        )
        assert len(batches) == 2
        assert all(b[0][0].shape[0] == 4 for b in batches)

    def test_max_length_caps(self):
        ds = PairedDataset(_id_pairs())
        dl = PairedDataLoader(
            ds, 4, bucket_multiples=(8, 8), pad_values=(-1, -1),
            max_lengths=(None, 8),
        )
        (t, _), (s, sm) = next(iter(dl))
        assert s.shape[1] == 8

    def test_sharded_ranks_tile_the_global_batch(self):
        """Multi-host contract (VERDICT r4 missing #3): same-seeded sharded
        loaders across ranks must (a) agree on every field's bucket target
        (computed from the FULL batch) and (b) yield rank-blocks that
        reassemble the unsharded batch exactly, per micro-batch group."""
        pairs = _id_pairs(n=16, seed=3)
        ds = PairedDataset(pairs)
        full = next(iter(PairedDataLoader(
            ds, 8, bucket_multiples=(8, 8), pad_values=(-1, -1), seed=5,
        )))
        shards = [
            next(iter(PairedDataLoader(
                ds, 8, bucket_multiples=(8, 8), pad_values=(-1, -1), seed=5,
                shard=(rank, 2), shard_group_size=4,
            )))
            for rank in (0, 1)
        ]
        for f in range(2):
            t_full, m_full = full[f]
            t0, m0 = shards[0][f]
            t1, m1 = shards[1][f]
            # same bucket target on every rank, half the rows each
            assert t0.shape == t1.shape == (4, t_full.shape[1])
            # groups of 4: rank 0 holds rows [0,1] and [4,5] of each group
            reassembled = np.concatenate(
                [t0[:2], t1[:2], t0[2:], t1[2:]], axis=0
            )
            np.testing.assert_array_equal(reassembled, t_full)
            remask = np.concatenate([m0[:2], m1[:2], m0[2:], m1[2:]], axis=0)
            np.testing.assert_array_equal(remask, m_full)

    def test_shard_divisibility_asserted(self):
        ds = PairedDataset(_id_pairs(n=8))
        with pytest.raises(AssertionError, match="divide over"):
            PairedDataLoader(ds, 6, bucket_multiples=(8, 8),
                             pad_values=(-1, -1), shard=(0, 4),
                             shard_group_size=3)


class TestIdPairTraining:
    def test_trains_checkpoints_and_resumes(self, tmp_path):
        t2s = _t2s()
        events = []
        tr = _trainer(
            tmp_path, t2s, PairedDataset(_id_pairs()), steps=3,
            trackers=(lambda rec, step: events.append((rec, step)),),
        )
        tr.train()
        assert tr.steps == 3
        assert t2s.params is tr.params  # synced back on completion

        records = [
            json.loads(l)
            for l in (tmp_path / "r" / "metrics.jsonl").read_text().splitlines()
        ]
        assert any(r.get("event") == "init_trackers" for r in records)
        losses = [r["train_loss"] for r in records if "train_loss" in r]
        assert len(losses) == 3 and all(np.isfinite(l) for l in losses)
        assert any("valid_loss" in r for r in records)
        assert any(rec.get("event") == "init_trackers" for rec, _ in events)

        ckpt = tmp_path / "r" / "text_to_semantic.0.ckpt"
        assert ckpt.exists()

        tr2 = _trainer(tmp_path, _t2s(seed=1), PairedDataset(_id_pairs()))
        tr2.load(str(tmp_path / "r" / "text_to_semantic.0.ckpt"))
        assert tr2.steps == 0
        assert tr2.t2s.params is tr2.params

    def test_loss_decreases_on_fixed_pair(self, tmp_path):
        """Overfit a 4-item corpus for 30 steps: loss must drop clearly."""
        t2s = _t2s()
        pairs = _id_pairs(n=4, seed=3)
        tr = _trainer(tmp_path, t2s, PairedDataset(pairs), steps=30,
                      lr=3e-3, valid_frac=0.0)
        losses = []
        tr.train(log_fn=lambda logs: losses.append(logs["loss"]))
        assert losses[-1] < losses[0] * 0.7, (losses[0], losses[-1])

    def test_grad_accum_matches_flat_batch(self, tmp_path):
        """accum=2 over micro-batches of 1 equals one batch of 2 (the in-jit
        scan is a pure reshape of the same math; f32 accumulator). Holds
        exactly only for equal-length rows: the loss is a masked mean PER
        MICRO batch, so unequal token counts weight rows differently under
        accumulation (same averaging semantics as VoiceBoxTrainer)."""
        rs = np.random.RandomState(5)
        pairs = [
            (
                rs.randint(0, VOCAB_TEXT, 8).astype(np.int32),
                rs.randint(0, VOCAB_SEM, 12).astype(np.int32),
            )
            for _ in range(8)
        ]

        def run(accum):
            t2s = _t2s()
            tr = TextToSemanticTrainer(
                t2s, batch_size=2 // accum, dataset=PairedDataset(pairs),
                grad_accum_every=accum, num_train_steps=2, valid_frac=0.0,
                results_folder=str(tmp_path / f"r{accum}"), use_mesh=False,
                text_bucket_multiple=8, semantic_bucket_multiple=8,
                prefetch_batches=0, seed=7,
            )
            tr.train()
            return tr.params

        p1, p2 = run(1), run(2)
        for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-5, rtol=1e-4)


class TestFunctionalGeneration:
    def test_trained_model_reproduces_memorized_mapping(self, tmp_path):
        """The strongest functional check: overfit 2 fixed (text, semantic)
        pairs, then greedy `generate` must emit each target sequence EXACTLY,
        stopping at the taught EOS position (mask False afterwards)."""
        t2s = _t2s()
        rs = np.random.RandomState(42)
        pairs = [
            (rs.randint(0, VOCAB_TEXT, 6).astype(np.int32),
             rs.randint(0, VOCAB_SEM, 9).astype(np.int32)),
            (rs.randint(0, VOCAB_TEXT, 6).astype(np.int32),
             rs.randint(0, VOCAB_SEM, 9).astype(np.int32)),
        ]
        tr = TextToSemanticTrainer(
            t2s, batch_size=2, dataset=PairedDataset(pairs),
            num_train_steps=150, valid_frac=0.0, lr=3e-3,
            results_folder=str(tmp_path / "r"), use_mesh=False,
            text_bucket_multiple=8, semantic_bucket_multiple=16,
            prefetch_batches=0, save_model_every=10**6,
            save_results_every=10**6,
        )
        tr.train()

        text = np.stack([np.asarray(p[0]) for p in pairs])
        ids, mask = tr.generate(
            jnp.asarray(text), max_length=16,
            return_target_mask=True, temperature=0.0,
        )
        ids, mask = np.asarray(ids), np.asarray(mask)
        for i, (_, target) in enumerate(pairs):
            n = len(target)
            assert mask[i, :n].all() and not mask[i, n:].any(), mask[i]
            np.testing.assert_array_equal(ids[i, :n], target)


class _FakeWav2Vec:
    """Contract double for HubertWithKmeans: the trainer only consumes
    __call__, num_frames, downsample_factor, codebook_size."""

    codebook_size = VOCAB_SEM
    target_sample_hz = 16000
    downsample_factor = 320
    kernels = (10, 3, 3, 3, 3, 2, 2)
    strides = (5, 2, 2, 2, 2, 2, 2)

    def num_frames(self, n):
        for k, s in zip(self.kernels, self.strides):
            n = (n - k) // s + 1
        return n

    def __call__(self, wav):
        b, n = wav.shape
        f = self.num_frames(n)
        # deterministic ids derived from the wave so tests can see content
        return (jnp.arange(f)[None, :] + jnp.zeros((b, 1), jnp.int32)) % 7


class TestWaveTargets:
    def _wave_pairs(self, n=8, seed=0):
        rs = np.random.RandomState(seed)
        return [
            (
                rs.randint(0, VOCAB_TEXT, rs.randint(5, 10)).astype(np.int32),
                rs.randn(rs.randint(700, 1800)).astype(np.float32),
            )
            for _ in range(n)
        ]

    def test_derives_and_masks_semantic_ids(self, tmp_path):
        t2s = _t2s()
        t2s.wav2vec = _FakeWav2Vec()
        tr = TextToSemanticTrainer(
            t2s, batch_size=2, dataset=PairedDataset(self._wave_pairs()),
            num_train_steps=2, valid_frac=0.25, use_mesh=False,
            results_folder=str(tmp_path / "r"),
            text_bucket_multiple=8, semantic_bucket_multiple=2,
            prefetch_batches=0,
        )
        # direct contract check on the derivation
        waves = np.random.RandomState(1).randn(2, 1280).astype(np.float32)
        mask = np.zeros((2, 1280), dtype=bool)
        mask[0, :1280] = True
        mask[1, :700] = True
        ids = np.asarray(tr._derive_semantic_ids(waves, mask))
        f_full = _FakeWav2Vec().num_frames(1280)
        f_short = _FakeWav2Vec().num_frames(700)
        assert ids.shape == (2, f_full)
        assert np.all(ids[0] != -1)
        assert np.all(ids[1, :f_short] != -1)
        assert np.all(ids[1, f_short:] == -1)

        tr.train()
        assert tr.steps == 2

    def test_real_hubert_integration(self, tmp_path):
        """End-to-end with a genuine (tiny, random) HubertWithKmeans: the
        real extractor frame math must agree with num_frames."""
        from voicebox_tpu.models.hubert import HubertWithKmeans

        w2v = HubertWithKmeans(
            num_clusters=VOCAB_SEM, conv_dim=8, dim=16, depth=1, heads=2,
        )
        ids = np.asarray(w2v(jnp.zeros((1, 1600))))
        assert ids.shape == (1, w2v.num_frames(1600))

        t2s = _t2s()
        t2s.wav2vec = w2v
        tr = TextToSemanticTrainer(
            t2s, batch_size=2, dataset=PairedDataset(self._wave_pairs(n=6)),
            num_train_steps=1, valid_frac=0.0, use_mesh=False,
            results_folder=str(tmp_path / "r"),
            text_bucket_multiple=8, semantic_bucket_multiple=2,
            prefetch_batches=0,
        )
        tr.train()
        assert tr.steps == 1


class TestMeshParity:
    def test_dp_mesh_matches_single_device(self, tmp_path):
        """Data-parallel sharding over the 8-device CPU mesh reproduces the
        unsharded step (XLA inserts the gradient psum; math is identical)."""
        pairs = _id_pairs(n=16, seed=11)

        def run(use_mesh, tag):
            t2s = _t2s()
            tr = TextToSemanticTrainer(
                t2s, batch_size=8, dataset=PairedDataset(pairs),
                num_train_steps=2, valid_frac=0.0, use_mesh=use_mesh,
                results_folder=str(tmp_path / tag),
                text_bucket_multiple=8, semantic_bucket_multiple=8,
                prefetch_batches=0, seed=13,
            )
            if use_mesh:
                assert tr.mesh is not None
            tr.train()
            return tr.params

        p_mesh, p_single = run(True, "m"), run(False, "s")
        for a, b in zip(jax.tree.leaves(p_mesh), jax.tree.leaves(p_single)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-5, rtol=1e-4)


class TestSpeechTextDataset:
    def test_pairs_audio_with_sidecar_transcripts(self, tmp_path):
        from scipy.io import wavfile

        from voicebox_tpu.training.data import SpeechTextDataset

        rs = np.random.RandomState(0)
        for i in range(3):
            wav = (rs.randn(1600) * 0.05 * 32767).astype(np.int16)
            wavfile.write(tmp_path / f"utt{i}.wav", 16000, wav)
            (tmp_path / f"utt{i}.txt").write_text(f"utterance {i}\n")
        # an orphan audio file (no transcript) is skipped, not paired
        wavfile.write(tmp_path / "orphan.wav", 16000,
                      (rs.randn(800) * 0.05 * 32767).astype(np.int16))

        ds = SpeechTextDataset(tmp_path, audio_extension=".wav")
        assert len(ds) == 3
        text, wave = ds[0]
        assert text == "utterance 0"
        assert wave.dtype == np.float32 and wave.shape == (1600,)

    def test_trains_through_the_seq2seq_trainer(self, tmp_path):
        from scipy.io import wavfile

        from voicebox_tpu.training.data import SpeechTextDataset

        rs = np.random.RandomState(1)
        for i in range(6):
            n = int(rs.randint(700, 1600))
            wav = (rs.randn(n) * 0.05 * 32767).astype(np.int16)
            wavfile.write(tmp_path / f"u{i}.wav", 16000, wav)
            (tmp_path / f"u{i}.txt").write_text(f"sample text {i}")

        t2s = TextToSemantic(
            dim=32, num_semantic_token_ids=VOCAB_SEM,
            source_depth=2, target_depth=1, heads=2, dim_head=16,
        )
        t2s.init_params(jax.random.PRNGKey(0))
        t2s.wav2vec = _FakeWav2Vec()
        tr = TextToSemanticTrainer(
            t2s, batch_size=2,
            dataset=SpeechTextDataset(tmp_path, audio_extension=".wav"),
            num_train_steps=2, valid_frac=0.25, use_mesh=False,
            results_folder=str(tmp_path / "r"),
            text_bucket_multiple=8, semantic_bucket_multiple=2,
            prefetch_batches=0,
        )
        tr.train()
        assert tr.steps == 2


class TestTextTokenization:
    def test_str_texts_tokenize_through_model_tokenizer(self, tmp_path):
        t2s = TextToSemantic(
            dim=32, num_semantic_token_ids=VOCAB_SEM,
            source_depth=2, target_depth=1, heads=2, dim_head=16,
        )  # default char tokenizer supplies num_text_token_ids
        t2s.init_params(jax.random.PRNGKey(0))
        rs = np.random.RandomState(0)
        texts = ["hello world", "the quick brown fox", "jax on tpu",
                 "voicebox", "flow matching", "semantic tokens"]
        pairs = [
            (t, rs.randint(0, VOCAB_SEM, rs.randint(8, 14)).astype(np.int32))
            for t in texts
        ]
        tr = _trainer(tmp_path, t2s, PairedDataset(pairs), steps=2)
        tr.train()
        assert tr.steps == 2
