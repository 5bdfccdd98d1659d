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


def _sig(n, seed=0, amp=3000, bps=16):
    """Smooth-ish integer test signal (sine + small noise) within bps range."""
    rs = np.random.RandomState(seed)
    t = np.arange(n)
    x = amp * np.sin(t / 17.0) + rs.randint(-40, 41, size=n)
    lim = 2 ** (bps - 1) - 1
    return np.clip(np.round(x), -lim - 1, lim).astype(np.int64)


@pytest.mark.skipif(not native.flac_available(), reason="no native toolchain")
class TestNativeFlac:
    """Round-trips against an independently-written Python reference FLAC
    encoder (tests/flac_ref_encoder.py): two separate implementations of the
    bitstream must agree bit-exactly on the decoded PCM."""

    def _roundtrip(self, tmp_path, channels, sr=24000, bps=16, **kw):
        from flac_ref_encoder import write_flac

        channels = np.asarray(channels, dtype=np.int64)
        p = tmp_path / "t.flac"
        write_flac(p, channels, sr, bps=bps, **kw)
        wave, got_sr = native.flac_read(p)
        assert got_sr == sr
        expected = (channels.astype(np.float64).mean(axis=0)
                    / (1 << (bps - 1))).astype(np.float32)
        np.testing.assert_array_equal(wave, expected)
        return p

    def test_fixed2_mono_multiframe(self, tmp_path):
        # 3 frames: 4096 + 4096 + partial tail
        self._roundtrip(tmp_path, _sig(9000)[None, :], block_size=4096,
                        mode="fixed2")

    @pytest.mark.parametrize("order", [0, 1, 3, 4])
    def test_fixed_orders(self, tmp_path, order):
        self._roundtrip(tmp_path, _sig(1500, seed=order)[None, :],
                        block_size=512, mode=f"fixed{order}")

    def test_constant_and_verbatim(self, tmp_path):
        c = np.full((1, 1000), -123, dtype=np.int64)
        self._roundtrip(tmp_path, c, block_size=500, mode="constant")
        v = _sig(700, seed=7)[None, :]
        self._roundtrip(tmp_path, v, block_size=350, mode="verbatim")

    def test_lpc(self, tmp_path):
        coefs = [int(round(1.5 * 1024)), int(round(-0.6 * 1024))]
        self._roundtrip(tmp_path, _sig(2000, seed=3)[None, :], block_size=1000,
                        mode="lpc", lpc_coefs=coefs, lpc_shift=10,
                        lpc_precision=12)

    @pytest.mark.parametrize("cmode", ["independent", "left_side",
                                       "right_side", "mid_side"])
    def test_stereo_modes(self, tmp_path, cmode):
        left = _sig(1200, seed=1)
        right = _sig(1200, seed=2, amp=2000)
        self._roundtrip(tmp_path, np.stack([left, right]), block_size=600,
                        mode="fixed1", channel_mode=cmode)

    def test_rice2_and_partitions(self, tmp_path):
        self._roundtrip(tmp_path, _sig(2048, seed=5)[None, :], block_size=1024,
                        mode="fixed2", partition_order=2, rice_method=1)

    def test_escape_partitions(self, tmp_path):
        self._roundtrip(tmp_path, _sig(1024, seed=6)[None, :], block_size=1024,
                        mode="fixed2", partition_order=1,
                        escape_partitions=(0, 1))

    def test_24bit(self, tmp_path):
        x = _sig(1000, seed=8, amp=3_000_000, bps=24)[None, :]
        self._roundtrip(tmp_path, x, bps=24, block_size=500, mode="fixed2")

    def test_8bit_and_ss_from_streaminfo(self, tmp_path):
        x = _sig(900, seed=9, amp=100, bps=8)[None, :]
        self._roundtrip(tmp_path, x, bps=8, block_size=300, mode="fixed1",
                        ss_from_streaminfo=True)

    def test_flac_info_header_only(self, tmp_path):
        from flac_ref_encoder import write_flac

        x = _sig(5000)[None, :]
        p = tmp_path / "t.flac"
        write_flac(p, x, 16000, block_size=4096)
        assert native.flac_info(p) == (5000, 16000)

    def test_undeclared_total_still_decodes(self, tmp_path):
        from flac_ref_encoder import write_flac

        x = _sig(1100)[None, :]
        p = tmp_path / "t.flac"
        write_flac(p, x, 24000, block_size=550, declare_total=False)
        assert native.flac_info(p) is None  # length not declared
        wave, sr = native.flac_read(p)
        assert sr == 24000 and len(wave) == 1100

    def test_undeclared_total_high_compression_no_truncation(self, tmp_path):
        """Undeclared-length stream whose decoded size exceeds the
        compressed-size capacity heuristic (constant audio compresses far
        past 4x): flac_read must grow its buffer and return ALL samples, not
        silently truncate at the first guess (ADVICE r3)."""
        from flac_ref_encoder import write_flac

        n = 200_000  # constant frames compress to ~bytes each
        x = np.full((1, n), 321, dtype=np.int64)
        p = tmp_path / "t.flac"
        write_flac(p, x, 24000, block_size=4096, mode="constant",
                   declare_total=False)
        import os

        # the premise of the test: the initial capacity guess is too small
        assert max(os.path.getsize(p) * 4, 1 << 16) < n
        wave, sr = native.flac_read(p)
        assert sr == 24000 and len(wave) == n
        np.testing.assert_array_equal(
            wave, np.full(n, 321 / (1 << 15), dtype=np.float32)
        )

    def test_corrupt_rejected(self, tmp_path):
        p = tmp_path / "bad.flac"
        p.write_bytes(b"fLaC" + b"\x00" * 10)
        assert native.flac_read(p) is None

    def test_load_audio_and_dataset(self, tmp_path):
        from flac_ref_encoder import write_flac

        from voicebox_tpu.training.data import AudioDataset

        for i in range(3):
            write_flac(tmp_path / f"s{i}.flac",
                       _sig(800 + 100 * i, seed=i)[None, :], 24000,
                       block_size=512)
        ds = AudioDataset(tmp_path)  # default extension: .flac (reference)
        assert len(ds) == 3
        for i in range(3):
            w = ds[i]
            assert w.dtype == np.float32 and len(w) == 800 + 100 * i
            # item_length: header-only STREAMINFO, must agree with decode
            assert ds.item_length(i) == len(w)

    def test_wav_flac_same_content_agree(self, tmp_path):
        from flac_ref_encoder import write_flac

        x = _sig(1600, seed=11)
        wavfile.write(tmp_path / "a.wav", 24000,
                      x.astype(np.int16))
        write_flac(tmp_path / "a.flac", x[None, :], 24000, block_size=800)
        w_wav, _ = load_audio(tmp_path / "a.wav")
        w_flac, _ = load_audio(tmp_path / "a.flac")
        np.testing.assert_allclose(w_wav, w_flac, atol=1.0 / 32768.0 + 1e-7)
