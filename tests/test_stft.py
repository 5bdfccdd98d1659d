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

    def test_parity_with_golden_fbanks(self):
        """Golden reference: torchaudio when importable, else an INDEPENDENT
        f64 per-filter triangle evaluation of the documented MelScale contract
        (HTK scale, norm=None) — a different code path from the vectorized
        slope formulation in ops/stft.py."""
        try:
            import torchaudio

            expected = torchaudio.functional.melscale_fbanks(
                513, 0.0, 8000.0, 100, 24000, norm=None, mel_scale="htk"
            ).numpy()
        except ImportError:
            expected = _golden_melscale_fbanks(513, 0.0, 8000.0, 100, 24000)
        fb = melscale_fbanks(513, 0.0, 8000.0, 100, 24000)
        np.testing.assert_allclose(fb, expected, atol=1e-5)

    def test_mel_spectrogram_shape(self):
        x = _tone()  # (2, 4800)
        mel = mel_spectrogram(jnp.asarray(x))
        # frames = 4800 // 160 + 1 (center)
        assert mel.shape == (2, 100, 4800 // 160 + 1)

    def test_mel_chain_parity_with_numpy_fft(self):
        """The full MelVoco analysis chain (reflect pad -> hann STFT -> power
        -> mel -> dB) vs an independent np.fft.rfft implementation at f64 —
        ops/stft.py uses matmul-DFT and slice-built reflect padding, so this
        cross-checks both against the canonical FFT formulation
        (reference chain: voicebox_pytorch.py:518-541)."""
        x = _tone(dur=0.1)
        n_fft, win, hop = 1024, 640, 160

        # golden: numpy f64 FFT chain
        xp = np.pad(x.astype(np.float64), ((0, 0), (n_fft // 2, n_fft // 2)),
                    mode="reflect")
        w = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(win) / win)
        lpad = (n_fft - win) // 2
        w = np.pad(w, (lpad, n_fft - win - lpad))
        frames = np.stack(
            [xp[:, i * hop : i * hop + n_fft] for i in range((xp.shape[1] - n_fft) // hop + 1)],
            axis=1,
        )
        spec = np.abs(np.fft.rfft(frames * w, axis=-1)) ** 2  # (b, T, freq)
        fb = _golden_melscale_fbanks(n_fft // 2 + 1, 0.0, 8000.0, 100, 24000)
        mel_db_golden = 10.0 * np.log10(np.clip(spec @ fb, 1e-10, None))

        mel = mel_spectrogram(jnp.asarray(x), n_fft=n_fft, win_length=win,
                              hop_length=hop)  # (b, mel, T)
        mel_db = amplitude_to_db(mel).transpose(0, 2, 1)
        # rtol absorbs the f32-matmul-DFT vs f64-FFT noise that log10 blows up
        # in near-silent bins (<= 0.45% relative there; in-band bins match to
        # hundredths of a dB)
        np.testing.assert_allclose(
            np.asarray(mel_db), mel_db_golden, rtol=5e-3, atol=0.1
        )


def _golden_melscale_fbanks(n_freqs, f_min, f_max, n_mels, sr):
    """Independent f64 triangle filterbank: per-filter (rise, fall) evaluation
    of the HTK-mel contract torchaudio MelScale documents."""

    def hz2mel(f):
        return 2595.0 * np.log10(1.0 + np.asarray(f, np.float64) / 700.0)

    def mel2hz(m):
        return 700.0 * (10.0 ** (np.asarray(m, np.float64) / 2595.0) - 1.0)

    freqs = np.linspace(0, sr // 2, n_freqs).astype(np.float64)
    pts = mel2hz(np.linspace(hz2mel(f_min), hz2mel(f_max), n_mels + 2))
    fb = np.zeros((n_freqs, n_mels))
    for m in range(n_mels):
        lo, c, hi = pts[m], pts[m + 1], pts[m + 2]
        rise = (freqs - lo) / (c - lo)
        fall = (hi - freqs) / (hi - c)
        fb[:, m] = np.clip(np.minimum(rise, fall), 0.0, None)
    return fb.astype(np.float32)


def _golden_resample(x, orig_freq, new_freq, L=6, rolloff=0.99):
    """Independent f64 windowed-sinc interpolation, evaluated as a DIRECT
    O(n_out * n_in) sum (no polyphase kernels, no conv): y(t_i) =
    scale * sum_j x_j hann^2(tau) sinc(tau), tau = (t_j - t_i) * base_freq.
    This is the continuous-time model torchaudio's resample documents."""
    import math as _math

    g = _math.gcd(orig_freq, new_freq)
    orig, new = orig_freq // g, new_freq // g
    base = min(orig, new) * rolloff
    scale = base / orig
    n = x.shape[-1]
    out_len = int(_math.ceil(new * n / orig))
    j = np.arange(n, dtype=np.float64)
    y = np.zeros(x.shape[:-1] + (out_len,), dtype=np.float64)
    xd = x.astype(np.float64)
    for i in range(out_len):
        tau = (j / orig - i / new) * base
        tau = np.clip(tau, -L, L)
        window = np.cos(tau * np.pi / (2 * L)) ** 2
        core = np.sinc(tau)  # np.sinc(x) = sin(pi x)/(pi x)
        y[..., i] = scale * np.sum(xd * window * core, axis=-1)
    return y.astype(np.float32)


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

    def test_parity_with_golden_sinc_interpolation(self):
        """Golden reference: torchaudio when importable, else the independent
        direct-sum sinc interpolation (`_golden_resample`) — exercises the
        polyphase kernel construction, padding, and phase/frame interleaving
        of ops/stft.py::resample against the continuous-time definition."""
        x = _tone(dur=0.025)  # short: the golden path is O(n_out * n_in)
        try:
            import torch
            import torchaudio

            expected = torchaudio.functional.resample(
                torch.from_numpy(x), 24000, 16000
            ).numpy()
        except ImportError:
            expected = _golden_resample(x, 24000, 16000)
        y = resample(jnp.asarray(x), 24000, 16000)
        np.testing.assert_allclose(np.asarray(y), expected, atol=1e-4)

    def test_parity_with_golden_sinc_upsample(self):
        x = _tone(dur=0.02, sr=16000)
        expected = _golden_resample(x, 16000, 24000)
        y = resample(jnp.asarray(x), 16000, 24000)
        np.testing.assert_allclose(np.asarray(y), expected, atol=1e-4)


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
