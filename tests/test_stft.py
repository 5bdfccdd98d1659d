"""Tests for the DSP ops: STFT/mel/dB numerics (parity vs torch where
available on CPU), iSTFT round-trip, resampling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from voicebox_tpu.ops.stft import (
    amplitude_to_db,
    db_to_amplitude,
    hann_window,
    istft,
    mel_spectrogram,
    melscale_fbanks,
    resample,
    spectrogram,
    stft,
)


def _tone(sr=24000, dur=0.2, freq=440.0, batch=2):
    t = np.arange(int(sr * dur)) / sr
    x = np.sin(2 * np.pi * freq * t).astype(np.float32)
    return np.stack([x * (i + 1) / batch for i in range(batch)])


class TestSTFT:
    def test_hann_periodic(self):
        w = hann_window(8)
        expected = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(8) / 8)
        np.testing.assert_allclose(w, expected, atol=1e-6)

    def test_parity_with_torch_stft(self):
        torch = pytest.importorskip("torch")
        x = _tone()
        spec = stft(jnp.asarray(x), n_fft=1024, win_length=640, hop_length=160)
        t_spec = torch.stft(
            torch.from_numpy(x), n_fft=1024, win_length=640, hop_length=160,
            window=torch.hann_window(640), center=True, pad_mode="reflect",
            return_complex=True,
        )
        np.testing.assert_allclose(
            np.abs(np.asarray(spec)), np.abs(t_spec.numpy()), atol=1e-3
        )

    def test_spectrogram_power(self):
        x = _tone()
        s1 = spectrogram(jnp.asarray(x), power=1.0)
        s2 = spectrogram(jnp.asarray(x), power=2.0)
        np.testing.assert_allclose(s2, s1**2, rtol=1e-4)

    def test_tone_peak_bin(self):
        sr, freq = 24000, 1500.0
        x = _tone(sr=sr, freq=freq, batch=1)
        s = spectrogram(jnp.asarray(x), n_fft=1024, win_length=640, hop_length=160)
        peak_bin = int(jnp.argmax(s[0, :, 5]))
        expected_bin = round(freq * 1024 / sr)
        assert abs(peak_bin - expected_bin) <= 1


class TestMel:
    def test_fbanks_shape_and_partition(self):
        fb = melscale_fbanks(513, 0.0, 8000.0, 100, 24000)
        assert fb.shape == (513, 100)
        assert (np.asarray(fb) >= 0).all()

    def test_parity_with_torchaudio_if_available(self):
        torchaudio = pytest.importorskip("torchaudio")
        import torch

        fb_t = torchaudio.functional.melscale_fbanks(
            513, 0.0, 8000.0, 100, 24000, norm=None, mel_scale="htk"
        )
        fb = melscale_fbanks(513, 0.0, 8000.0, 100, 24000)
        np.testing.assert_allclose(fb, fb_t.numpy(), atol=1e-5)

    def test_mel_spectrogram_shape(self):
        x = _tone()  # (2, 4800)
        mel = mel_spectrogram(jnp.asarray(x))
        # frames = 4800 // 160 + 1 (center)
        assert mel.shape == (2, 100, 4800 // 160 + 1)


class TestDB:
    def test_amplitude_to_db(self):
        x = jnp.array([[1.0, 10.0, 100.0]])
        db = amplitude_to_db(x)
        np.testing.assert_allclose(db, [[0.0, 10.0, 20.0]], atol=1e-5)

    def test_amin_clamp(self):
        db = amplitude_to_db(jnp.array([[0.0]]))
        np.testing.assert_allclose(db, [[-100.0]], atol=1e-4)

    def test_db_roundtrip(self):
        x = jnp.array([[0.5, 2.0, 7.0]])
        db = amplitude_to_db(x)  # power -> dB
        amp = db_to_amplitude(db, ref=1.0, power=0.5)  # dB -> amplitude
        np.testing.assert_allclose(amp, jnp.sqrt(x), rtol=1e-5)


class TestISTFT:
    def test_roundtrip(self):
        x = _tone(dur=0.1)
        n = x.shape[-1]
        spec = stft(jnp.asarray(x), n_fft=1024, win_length=1024, hop_length=256)
        y = istft(spec, n_fft=1024, win_length=1024, hop_length=256, length=n)
        np.testing.assert_allclose(np.asarray(y), x, atol=1e-4)

    def test_roundtrip_win_lt_nfft(self):
        x = _tone(dur=0.1)
        n = x.shape[-1]
        spec = stft(jnp.asarray(x), n_fft=512, win_length=320, hop_length=80)
        y = istft(spec, n_fft=512, win_length=320, hop_length=80, length=n)
        np.testing.assert_allclose(np.asarray(y), x, atol=1e-4)


class TestResample:
    def test_identity(self):
        x = jnp.asarray(_tone())
        assert resample(x, 24000, 24000) is x

    def test_length_ratio(self):
        x = jnp.asarray(_tone(sr=24000, dur=0.1))
        y = resample(x, 24000, 16000)
        assert y.shape == (2, int(np.ceil(x.shape[1] * 16000 / 24000)))

    def test_channel_dim_passthrough(self):
        # (b, 1, n) raw-audio shape the wrapper accepts
        # (voicebox_pytorch.py:1119-1120) resamples along the last axis
        x = jnp.asarray(_tone(sr=24000, dur=0.1))
        y2 = resample(x, 24000, 16000)
        y3 = resample(x[:, None, :], 24000, 16000)
        assert y3.shape == (x.shape[0], 1, y2.shape[-1])
        np.testing.assert_allclose(np.asarray(y3[:, 0]), np.asarray(y2), rtol=1e-6)

    def test_tone_preserved(self):
        # a 440 Hz tone resampled 24k->16k stays a 440 Hz tone
        sr1, sr2 = 24000, 16000
        dur = 0.25
        t1 = np.arange(int(sr1 * dur)) / sr1
        x = np.sin(2 * np.pi * 440 * t1).astype(np.float32)
        y = np.asarray(resample(jnp.asarray(x), sr1, sr2))
        t2 = np.arange(len(y)) / sr2
        expected = np.sin(2 * np.pi * 440 * t2).astype(np.float32)
        # ignore filter edges
        m = slice(100, -100)
        assert np.corrcoef(y[m], expected[m])[0, 1] > 0.999

    def test_parity_with_torchaudio_if_available(self):
        torchaudio = pytest.importorskip("torchaudio")
        import torch

        x = _tone(dur=0.1)
        y = resample(jnp.asarray(x), 24000, 16000)
        y_t = torchaudio.functional.resample(torch.from_numpy(x), 24000, 16000)
        np.testing.assert_allclose(np.asarray(y), y_t.numpy(), atol=1e-4)


class TestMetrics:
    def test_mel_spectral_distance_zero_for_identical(self):
        from voicebox_tpu.utils.metrics import mel_spectral_distance

        x = _tone(dur=0.1)
        d = mel_spectral_distance(x, x)
        np.testing.assert_allclose(d, 0.0, atol=1e-4)

    def test_distance_increases_with_distortion(self):
        from voicebox_tpu.utils.metrics import mel_spectral_distance

        x = _tone(dur=0.1)
        small = mel_spectral_distance(x, x + 0.001 * np.random.RandomState(0).randn(*x.shape).astype(np.float32))
        large = mel_spectral_distance(x, x + 0.1 * np.random.RandomState(0).randn(*x.shape).astype(np.float32))
        assert 0 < float(small) < float(large)

    def test_length_mismatch_truncates(self):
        from voicebox_tpu.utils.metrics import mel_spectral_distance

        x = _tone(dur=0.1)
        d = mel_spectral_distance(x, x[:, :-500])
        assert np.isfinite(float(d))
