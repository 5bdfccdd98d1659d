"""DurationPredictorTrainer — training the duration model end to end.

The reference defines the training forward (aligner + masked-L1 + forward-sum,
voicebox_pytorch.py:841-876) but ships no trainer; its README todo list
includes duration-training cleanup. Covered here: latent, explicit-mel, wave
(stub codec), and text datasets; checkpoint resume; metrics records."""

import json
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from voicebox_tpu.models.duration import DurationPredictor
from voicebox_tpu.training.data import PairedDataset
from voicebox_tpu.training.duration_trainer import DurationPredictorTrainer

N_PHONEMES = 40
DIM_FEAT = 12  # latent == aligner dim in the simple case


def _dp(aligner_dim=DIM_FEAT, latent_dim=DIM_FEAT, tokenizer=None, seed=0):
    kwargs = dict(
        dim_phoneme_emb=16, dim=32, depth=2, dim_head=8, heads=2,
        aligner_dim_in=aligner_dim, aligner_attn_channels=aligner_dim,
        audio_enc_dec=SimpleNamespace(latent_dim=latent_dim),
    )
    if tokenizer is None:
        kwargs["num_phoneme_tokens"] = N_PHONEMES
    # tokenizer="default": pass neither — the facade constructs the default
    # grapheme/espeak Tokenizer() itself
    dp = DurationPredictor(**kwargs)
    dp.init_params(jax.random.PRNGKey(seed), seq_len=24, n_phonemes=8, batch=2)
    return dp


def _latent_items(n=8, seed=0, feat=DIM_FEAT):
    rs = np.random.RandomState(seed)
    return [
        (
            rs.randint(0, N_PHONEMES, rs.randint(4, 9)).astype(np.int32),
            rs.randn(rs.randint(16, 40), feat).astype(np.float32),
        )
        for _ in range(n)
    ]


def _trainer(tmp_path, dp, dataset, steps=2, **kw):
    kw.setdefault("valid_frac", 0.25)
    return DurationPredictorTrainer(
        dp, batch_size=2, dataset=dataset, num_train_steps=steps,
        wd=1e-2, results_folder=str(tmp_path / "r"), use_mesh=False,
        phoneme_bucket_multiple=4, frame_bucket_multiple=8,
        prefetch_batches=0, **kw,
    )


class TestLatentTraining:
    def test_trains_checkpoints_and_resumes(self, tmp_path):
        dp = _dp()
        tr = _trainer(tmp_path, dp, PairedDataset(_latent_items()), steps=3)
        tr.train()
        assert tr.steps == 3
        assert dp.params is tr.params

        records = [
            json.loads(l)
            for l in (tmp_path / "r" / "metrics.jsonl").read_text().splitlines()
        ]
        losses = [r["train_loss"] for r in records if "train_loss" in r]
        assert len(losses) == 3 and all(np.isfinite(l) for l in losses)
        assert any("valid_loss" in r for r in records)

        tr2 = _trainer(tmp_path, _dp(seed=1), PairedDataset(_latent_items()))
        tr2.load(str(tmp_path / "r" / "duration.0.ckpt"))
        assert tr2.steps == 0 and tr2.dp.params is tr2.params

    def test_mismatched_latent_dim_requires_explicit_mel(self, tmp_path):
        dp = _dp(aligner_dim=8, latent_dim=DIM_FEAT)
        with pytest.raises(AssertionError, match="explicit mel"):
            _trainer(tmp_path, dp, PairedDataset(_latent_items()))

    def test_loss_decreases(self, tmp_path):
        dp = _dp()
        tr = _trainer(tmp_path, dp, PairedDataset(_latent_items(n=4, seed=2)),
                      steps=25, lr=3e-3, valid_frac=0.0)
        losses = []
        tr.train(log_fn=lambda logs: losses.append(logs["loss"]))
        assert losses[-1] < losses[0], (losses[0], losses[-1])


class TestExplicitMel:
    def test_three_field_items(self, tmp_path):
        rs = np.random.RandomState(0)
        mel_dim = 8
        items = []
        for _ in range(8):
            n = rs.randint(16, 40)
            items.append((
                rs.randint(0, N_PHONEMES, rs.randint(4, 9)).astype(np.int32),
                rs.randn(n, DIM_FEAT).astype(np.float32),
                rs.randn(n, mel_dim).astype(np.float32),
            ))
        dp = _dp(aligner_dim=mel_dim, latent_dim=DIM_FEAT)
        tr = _trainer(tmp_path, dp, PairedDataset(items))
        tr.train()
        assert tr.steps == 2


class _StubCodec:
    """Minimal AudioEncoderDecoder contract: strided linear encode."""

    latent_dim = DIM_FEAT
    downsample_factor = 64
    sampling_rate = 16000

    def encode(self, wav):
        b, n = wav.shape
        frames = wav.reshape(b, n // self.downsample_factor,
                             self.downsample_factor)
        proj = jnp.asarray(
            np.random.RandomState(7).randn(self.downsample_factor,
                                           self.latent_dim) * 0.1,
            dtype=wav.dtype,
        )
        return frames @ proj


class TestWaveItems:
    def _wave_items(self, n=8, seed=0):
        rs = np.random.RandomState(seed)
        return [
            (
                rs.randint(0, N_PHONEMES, rs.randint(4, 9)).astype(np.int32),
                rs.randn(rs.randint(1200, 2400)).astype(np.float32),
            )
            for _ in range(n)
        ]

    def test_codec_latents_double_as_mel(self, tmp_path):
        dp = _dp()
        dp.audio_enc_dec = _StubCodec()
        tr = _trainer(tmp_path, dp, PairedDataset(self._wave_items()))
        assert not tr._derive_mel  # latent_dim == aligner_dim_in
        tr.train()
        assert tr.steps == 2

    def test_derived_log_mel_when_dims_differ(self, tmp_path):
        mel_dim = 8
        dp = _dp(aligner_dim=mel_dim, latent_dim=DIM_FEAT)
        dp.audio_enc_dec = _StubCodec()
        items = [
            (ids, np.resize(w, 2048)) for ids, w in self._wave_items()
        ]  # >= n_fft for the log-mel transform
        tr = _trainer(tmp_path, dp, PairedDataset(items))
        assert tr._derive_mel
        mel, mask = tr._mel_for_aligner(
            np.stack([np.asarray(w) for _, w in items[:2]]),
            np.ones((2, 2048), dtype=bool),
        )
        assert mel.shape[-1] == mel_dim and mel.shape[0] == 2
        assert mask.shape == mel.shape[:2]
        tr.train()
        assert tr.steps == 2


class TestTextItems:
    def test_str_first_field_tokenizes(self, tmp_path):
        dp = _dp(tokenizer="default")
        rs = np.random.RandomState(0)
        texts = ["hello world", "flow matching", "phoneme durations",
                 "voicebox", "jax on tpu", "alignment"]
        items = [
            (t, rs.randn(rs.randint(16, 40), DIM_FEAT).astype(np.float32))
            for t in texts
        ]
        tr = _trainer(tmp_path, dp, PairedDataset(items))
        tr.train()
        assert tr.steps == 2
