"""Tests for the native C++ WAV decoder + threaded batch loader, cross-checked
against scipy."""

import numpy as np
import pytest
from scipy.io import wavfile

from voicebox_tpu import native
from voicebox_tpu.training.data import load_audio


@pytest.fixture(scope="module")
def wav_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("wavs")
    paths = []
    rs = np.random.RandomState(0)
    for i, (n, sr) in enumerate([(1200, 16000), (2400, 24000), (800, 8000)]):
        x = (rs.randn(n) * 0.1).astype(np.float32)
        p = d / f"t{i}.wav"
        wavfile.write(p, sr, (x * 32767).astype(np.int16))
        paths.append((p, x, sr))
    return paths


@pytest.mark.skipif(not native.native_available(), reason="no native toolchain")
class TestNativeWav:
    def test_info(self, wav_files):
        p, x, sr = wav_files[0]
        info = native.wav_info(p)
        assert info == (len(x), sr)

    def test_read_matches_scipy(self, wav_files):
        for p, x, sr in wav_files:
            wave, got_sr = native.wav_read(p)
            assert got_sr == sr
            # int16 quantisation round trip
            np.testing.assert_allclose(wave, np.round(x * 32767) / 32768.0, atol=1e-4)

    def test_batch_threaded(self, wav_files):
        paths = [p for p, _, _ in wav_files]
        batch, lengths = native.wav_read_batch(paths, max_samples=4000, num_threads=2)
        assert batch.shape == (3, 4000)
        assert lengths.tolist() == [1200, 2400, 800]
        assert (batch[0, 1200:] == 0).all()

    def test_bad_file_reports_minus_one(self, tmp_path):
        bad = tmp_path / "bad.wav"
        bad.write_bytes(b"not a wav at all")
        assert native.wav_info(bad) is None
        batch, lengths = native.wav_read_batch([bad], max_samples=10)
        assert lengths[0] == -1

    def test_float32_wav(self, tmp_path):
        x = np.linspace(-0.5, 0.5, 777).astype(np.float32)
        p = tmp_path / "f32.wav"
        wavfile.write(p, 22050, x)
        wave, sr = native.wav_read(p)
        assert sr == 22050
        np.testing.assert_allclose(wave, x, atol=1e-6)

    def test_stereo_averaged(self, tmp_path):
        left = np.full(100, 0.5, dtype=np.float32)
        right = np.full(100, -0.1, dtype=np.float32)
        p = tmp_path / "st.wav"
        wavfile.write(p, 16000, np.stack([left, right], axis=1))
        wave, _ = native.wav_read(p)
        np.testing.assert_allclose(wave, 0.2, atol=1e-6)


class TestLoadAudioIntegration:
    def test_load_audio_wav(self, wav_files):
        p, x, sr = wav_files[0]
        wave, got_sr = load_audio(p)
        assert got_sr == sr
        assert wave.dtype == np.float32
        np.testing.assert_allclose(wave, np.round(x * 32767) / 32768.0, atol=1e-4)

    def test_flac_gated_error(self, tmp_path):
        p = tmp_path / "x.flac"
        p.write_bytes(b"fLaC")
        try:
            import soundfile  # noqa

            pytest.skip("soundfile installed; gate not applicable")
        except ImportError:
            pass
        with pytest.raises(ImportError, match="soundfile"):
            load_audio(p)
