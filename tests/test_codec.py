"""Tests for the L2 codec boundary: MelVoco, EncodecVoco, Vocos, Encodec —
shape contracts (SURVEY.md §7 'shape contracts to preserve') and round-trip
consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from voicebox_tpu.models.codec import EncodecVoco, MelVoco
from voicebox_tpu.models.encodec import EncodecModel, ResidualVQ
from voicebox_tpu.models.vocos import Vocos


@pytest.fixture(scope="module")
def mel_voco():
    return MelVoco(vocos=Vocos(input_channels=100, dim=64, intermediate_dim=128,
                               num_layers=2))


@pytest.fixture(scope="module")
def encodec_voco():
    return EncodecVoco(
        encodec=EncodecModel(n_filters=8, num_quantizers=4),
        vocos=Vocos(input_channels=128, dim=64, intermediate_dim=128, num_layers=2,
                    num_bandwidths=4, num_quantizers=4),
    )


class TestMelVoco:
    def test_encode_shape(self, mel_voco):
        audio = jnp.zeros((2, 24000))  # 1 s @ 24 kHz
        mel = mel_voco.encode(audio)
        # hop defaults to the vocoder's hop (256) so encode/decode durations
        # are consistent (reference quirk fixed: 160 vs 256 time-stretched
        # decoded audio by 1.6x; its README todo acknowledges this)
        assert mel.shape == (2, 24000 // 256 + 1, 100)  # (b, frames, 100)

    def test_latent_dim_fixed(self, mel_voco):
        # reference bug: latent_dim raised AttributeError (voicebox_pytorch.py:516)
        assert mel_voco.latent_dim == 100

    def test_downsample_factor(self, mel_voco):
        # reference raised NotImplementedError (voicebox_pytorch.py:511-512)
        assert mel_voco.downsample_factor == mel_voco.vocos.hop_length == 256

    def test_encode_decode_duration_consistent(self, mel_voco):
        audio = jnp.zeros((1, 2560))
        mel = mel_voco.encode(audio)
        wav = mel_voco.decode(mel)
        assert wav.shape[-1] == mel.shape[1] * mel_voco.downsample_factor

    def test_explicit_hop_mismatch_warns(self):
        import warnings

        v = Vocos(input_channels=100, dim=64, intermediate_dim=128, num_layers=2)
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            codec = MelVoco(vocos=v, hop_length=160)  # reference's value
        assert any("hop" in str(x.message) for x in w)
        assert codec.downsample_factor == 160  # explicit override respected

    def test_decode_shape(self, mel_voco):
        mel = jax.random.normal(jax.random.PRNGKey(0), (2, 20, 100))
        wav = mel_voco.decode(mel)
        assert wav.ndim == 2 and wav.shape[0] == 2
        assert jnp.isfinite(wav).all()

    def test_channel_dim_accepted(self, mel_voco):
        # (b, 1, n) raw audio shape also accepted
        mel = mel_voco.encode(jnp.zeros((2, 1, 4800)))
        assert mel.shape[0] == 2 and mel.shape[2] == 100


class TestEncodecVoco:
    def test_encode_shape_contract(self, encodec_voco):
        audio = jnp.zeros((2, 3200))  # 3200 / 320 = 10 frames
        latents = encodec_voco.encode(audio)
        assert latents.shape == (2, 10, 128)

    def test_downsample_and_latent(self, encodec_voco):
        assert encodec_voco.downsample_factor == 320
        assert encodec_voco.latent_dim == 128

    def test_decode_to_codes_shape(self, encodec_voco):
        latents = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 128))
        codes = encodec_voco.decode_to_codes(latents)
        assert codes.shape == (2, 4, 10)  # (b, q, n)
        assert codes.dtype in (jnp.int32, jnp.int64)

    def test_decode_batched_shape(self, encodec_voco):
        latents = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 128))
        wav = encodec_voco.decode(latents)
        assert wav.shape[0] == 2 and wav.shape[1] == 1  # (b, 1, n)
        assert jnp.isfinite(wav).all()

    def test_pretrained_encodec_vocos_duration_exact(self):
        # upstream vocos-encodec-24khz runs n_fft 1280 / hop 320 — one hop per
        # Encodec frame, so n frames MUST decode to exactly n*320 samples
        # (regression: the class defaults 1024/256 decoded 10 s to 8 s)
        v = Vocos.from_pretrained("charactr/vocos-encodec-24khz",
                                  dim=64, intermediate_dim=128, num_layers=2)
        codes = jax.random.randint(jax.random.PRNGKey(0), (1, 8, 6), 0, 1024)
        feats = v.codes_to_features(codes)
        wav = v.decode(feats, bandwidth_id=jnp.asarray([2]))
        assert wav.shape == (1, 6 * 320)


class TestResidualVQ:
    def test_quantization_reduces_residual(self, rng):
        vq = ResidualVQ(num_quantizers=8, codebook_size=64, dim=16)
        x = jax.random.normal(rng, (2, 10, 16))
        params = vq.init(rng, x)
        quantized, codes, _ = vq.apply(params, x)
        assert codes.shape == (2, 10, 8)
        # more quantizers -> lower residual energy
        vq2 = ResidualVQ(num_quantizers=1, codebook_size=64, dim=16)
        q2, _, _ = vq2.apply(
            {"params": {"codebooks": params["params"]["codebooks"][:1]}}, x
        )
        err8 = jnp.mean(jnp.square(x - quantized))
        err1 = jnp.mean(jnp.square(x - q2))
        assert err8 < err1

    def test_codes_roundtrip_decode(self):
        codec = EncodecModel(n_filters=4, num_quantizers=2)
        audio = jax.random.normal(jax.random.PRNGKey(0), (1, 640)) * 0.1
        latents = codec.encode(audio)
        q1, codes, _ = codec.rq(latents)
        wav_from_latents = codec.decode_latents(latents)
        wav_from_codes = codec.decode_codes(codes)
        np.testing.assert_allclose(
            np.asarray(wav_from_latents), np.asarray(wav_from_codes), atol=1e-5
        )


class TestVocos:
    def test_mel_variant_decode(self):
        v = Vocos(input_channels=100, dim=64, intermediate_dim=128, num_layers=2,
                  hop_length=256)
        mel = jax.random.normal(jax.random.PRNGKey(0), (2, 100, 12))
        wav = v.decode(mel)
        assert wav.shape == (2, 12 * 256)

    def test_codes_to_features(self):
        v = Vocos(input_channels=128, dim=64, intermediate_dim=128, num_layers=2,
                  num_bandwidths=4, num_quantizers=4)
        codes = jnp.zeros((2, 4, 10), dtype=jnp.int32)
        feats = v.codes_to_features(codes)
        assert feats.shape == (2, 128, 10)

    def test_codes_2d_accepted(self):
        v = Vocos(input_channels=128, dim=64, intermediate_dim=128, num_layers=2,
                  num_bandwidths=4, num_quantizers=4)
        feats = v.codes_to_features(jnp.zeros((4, 10), dtype=jnp.int32))
        assert feats.shape == (1, 128, 10)

    def test_bandwidth_changes_output(self):
        v = Vocos(input_channels=128, dim=64, intermediate_dim=128, num_layers=2,
                  num_bandwidths=4, num_quantizers=4)
        # AdaLayerNorm tables are ones/zeros-init (all bandwidths identical at
        # init, like upstream) — perturb bandwidth 3's scale so the path is live
        p = jax.tree_util.tree_map(lambda x: x, v.params)
        p["backbone"]["norm_in"]["scale"] = (
            p["backbone"]["norm_in"]["scale"].at[3].add(0.5)
        )
        v.params = p
        feats = jax.random.normal(jax.random.PRNGKey(1), (1, 128, 8))
        w0 = v.decode(feats, bandwidth_id=jnp.array([0]))
        w1 = v.decode(feats, bandwidth_id=jnp.array([3]))
        assert not np.allclose(w0, w1)


class TestCodecWithCFM:
    def test_mel_raw_audio_train_and_sample(self, rng):
        # BASELINE config 2: raw audio -> mel encode -> CFM train -> sample -> decode
        from voicebox_tpu import ConditionalFlowMatcherWrapper, VoiceBox

        codec = MelVoco(vocos=Vocos(input_channels=100, dim=64,
                                    intermediate_dim=128, num_layers=2))
        vb = VoiceBox(
            audio_enc_dec=codec, dim=64, depth=2, dim_head=16, heads=4,
            num_register_tokens=2, condition_on_text=False,
        )
        cfm = ConditionalFlowMatcherWrapper(vb)
        cfm.init_params(rng, seq_len=31, batch=2)

        audio = jax.random.normal(rng, (2, 4800)) * 0.1  # raw (b, n)
        loss = cfm(audio)
        assert jnp.isfinite(loss)

        cond = codec.encode(audio)
        wav = cfm.sample(cond=cond, steps=2)  # decode_to_audio=True by default
        assert wav.ndim == 2 and wav.shape[0] == 2


class TestFusedSampleDecode:
    """cfm.sample(decode_to_audio=True) fuses the vocoder into the sampler
    program (one dispatch); output must equal the two-step path exactly."""

    def test_fused_equals_two_step(self, encodec_voco):
        from voicebox_tpu import ConditionalFlowMatcherWrapper, VoiceBox

        vb = VoiceBox(dim_in=None, dim=64, depth=2, dim_head=16, heads=4,
                      num_register_tokens=2, condition_on_text=False,
                      audio_enc_dec=encodec_voco)
        cfm = ConditionalFlowMatcherWrapper(vb)
        cfm.init_params(jax.random.PRNGKey(0), seq_len=20, batch=1)
        cond = jax.random.normal(jax.random.PRNGKey(1), (1, 20, 128))
        rng = jax.random.PRNGKey(2)

        audio_fused = cfm.sample(cond=cond, steps=2, rng=rng)
        latents = cfm.sample(cond=cond, steps=2, rng=rng, decode_to_audio=False)
        audio_two_step = encodec_voco.decode(latents)

        assert audio_fused.shape == audio_two_step.shape
        np.testing.assert_allclose(np.asarray(audio_fused),
                                   np.asarray(audio_two_step), atol=1e-5)

    def test_mel_decode_fn_matches_decode(self, mel_voco):
        fn, params = mel_voco.decode_fn()
        mel = jax.random.normal(jax.random.PRNGKey(0), (2, 12, 100)) * 10.0
        np.testing.assert_allclose(
            np.asarray(jax.jit(fn)(params, mel)),
            np.asarray(mel_voco.decode(mel)), atol=1e-5,
        )


class TestISTFTHeadClip:
    def test_huge_logmag_stays_finite(self, rng):
        """Upstream Vocos clips the MAGNITUDE at 1e2 (clip(exp(x), max=100));
        clipping the exponent instead capped at e^100 = inf -> NaN audio."""
        from voicebox_tpu.models.vocos import ISTFTHead

        head = ISTFTHead(dim=16, n_fft=64, hop_length=16)
        x = jax.random.normal(rng, (1, 4, 16))
        params = head.init(rng, x)
        wav = head.apply(params, x * 1e4)  # drives log-mag far past 88
        assert jnp.isfinite(wav).all()
        # magnitude cap of 100 bounds the per-sample amplitude too
        assert float(jnp.abs(wav).max()) < 100.0 * 64


class TestSecondsPerFrame:
    """`seconds_per_frame` + `frames_for_seconds` on AudioEncoderDecoder —
    implements the reference README's open todo (README.md:157: "calculate
    how many seconds corresponds to each frame and add as property")."""

    def test_mel_voco(self, mel_voco):
        # default analysis hop = vocoder hop (256) at 24 kHz
        assert mel_voco.seconds_per_frame == pytest.approx(256 / 24000)
        assert mel_voco.frames_for_seconds(1.0) == round(24000 / 256)

    def test_encodec_voco(self, encodec_voco):
        # Encodec: 320 samples/frame at 24 kHz = 75 frames/s
        assert encodec_voco.seconds_per_frame == pytest.approx(320 / 24000)
        assert encodec_voco.frames_for_seconds(10.0) == 750

    def test_minimum_one_frame_and_positive(self, encodec_voco):
        assert encodec_voco.frames_for_seconds(1e-6) == 1
        with pytest.raises(AssertionError):
            encodec_voco.frames_for_seconds(0.0)
