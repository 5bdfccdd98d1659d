"""L2 audio codec boundary: `AudioEncoderDecoder` + `MelVoco` + `EncodecVoco`.

Mirrors the reference codec layer (voicebox_pytorch.py:483-592) with the
torchaudio/encodec/vocos native kernels replaced by XLA ops
(`voicebox_tpu.ops.stft`) and flax models (`encodec.py`, `vocos.py`):

* `MelVoco.encode`: Spectrogram(1024/640/160, hann, power 2) -> MelScale
  (100 mels, 24 kHz, f_max 8 kHz, HTK) -> AmplitudeToDB -> (b, n, 100).
  Unlike the reference — which rebuilds the torchaudio transform objects on
  every call (voicebox_pytorch.py:519-534, documented quirk) — the whole chain
  here is one jitted XLA graph, compiled once per shape.
* `MelVoco.decode`: DB_to_amplitude(ref=1, power=0.5) -> Vocos decode.
* `EncodecVoco.encode`: Encodec encoder -> (b, n/320, 128) continuous latents.
* `EncodecVoco.decode`: RVQ quantize -> vocos codes_to_features -> decode with
  bandwidth_id — batched, replacing the reference's per-batch-item Python loop
  (voicebox_pytorch.py:586-592, documented quirk).

Reference bugs fixed, not replicated:
* `MelVoco.latent_dim` returned `self.num_mels` (AttributeError — the attr is
  `n_mels`, voicebox_pytorch.py:516);
* `MelVoco.downsample_factor` raised NotImplementedError
  (voicebox_pytorch.py:511-512) — here it returns hop_length.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.stft import amplitude_to_db, db_to_amplitude, mel_spectrogram
from .encodec import EncodecModel
from .vocos import Vocos

__all__ = ["AudioEncoderDecoder", "MelVoco", "EncodecVoco"]


class AudioEncoderDecoder:
    """Marker base class (reference voicebox_pytorch.py:483-484)."""

    sampling_rate: int
    latent_dim: int
    downsample_factor: int
    # frames(n_samples) = n_samples // downsample_factor + frame_offset;
    # consumed by register-aligned bucketing (training/trainer.py)
    frame_offset: int = 0

    @property
    def seconds_per_frame(self) -> float:
        """Audio seconds covered by one latent frame (reference README.md:157
        lists this as an open todo: "calculate how many seconds corresponds to
        each frame and add as property on AudioEncoderDecoder"). MelVoco:
        hop/sr; EncodecVoco: 320/24000 = 1/75 s."""
        return self.downsample_factor / self.sampling_rate

    def frames_for_seconds(self, seconds: float) -> int:
        """Latent frames spanning `seconds` of audio (>=1). The seconds-based
        half of the same reference todo: `sample(duration_seconds=...)` uses
        this to size the latent horizon."""
        assert seconds > 0, "duration must be positive"
        return max(1, round(seconds / self.seconds_per_frame))

    def encode(self, audio: jax.Array) -> jax.Array:
        raise NotImplementedError

    def decode(self, latents: jax.Array) -> jax.Array:
        raise NotImplementedError


class MelVoco(AudioEncoderDecoder):
    def __init__(
        self,
        *,
        log: bool = True,
        n_mels: int = 100,
        sampling_rate: int = 24000,
        f_max: float = 8000,
        n_fft: int = 1024,
        win_length: int = 640,
        hop_length: Optional[int] = None,  # None = match the vocoder's hop
        pretrained_vocos_path: str = "charactr/vocos-mel-24khz",
        vocos: Optional[Vocos] = None,
    ):
        self.log = log
        self.n_mels = n_mels
        self.n_fft = n_fft
        self.f_max = f_max
        self.win_length = win_length
        self.sampling_rate = sampling_rate
        self.vocos = vocos if vocos is not None else Vocos.from_pretrained(
            pretrained_vocos_path
        )
        assert self.vocos.input_channels == n_mels, (
            f"n_mels={n_mels} but the vocoder consumes "
            f"{self.vocos.input_channels}-bin mels — decode would fail at "
            "apply time; pass a matching Vocos(input_channels=n_mels)"
        )
        # Reference quirk FIXED (its README todo acknowledges "MelVoco length
        # settings"): the reference encodes at hop 160 but vocos-mel-24khz
        # synthesises hop_length samples per frame (256), so 10 s of input
        # decoded to 16 s of audio. Defaulting the analysis hop to the
        # vocoder's hop keeps encode/decode durations exactly consistent;
        # passing an explicit mismatched hop is allowed but warned about.
        self.hop_length = hop_length if hop_length is not None else self.vocos.hop_length
        if self.hop_length != self.vocos.hop_length:
            import warnings

            warnings.warn(
                f"MelVoco hop_length {self.hop_length} != vocoder hop "
                f"{self.vocos.hop_length}: decoded audio duration will be "
                f"scaled by {self.vocos.hop_length / self.hop_length:.3f}x",
                stacklevel=2,
            )
        self._encode = jax.jit(self._encode_impl)

    @property
    def downsample_factor(self) -> int:
        return self.hop_length

    @property
    def frame_offset(self) -> int:
        # center=True STFT framing yields n // hop + 1 frames
        return 1

    @property
    def latent_dim(self) -> int:
        return self.n_mels

    def _encode_impl(self, audio: jax.Array) -> jax.Array:
        if audio.ndim == 3 and audio.shape[1] == 1:
            audio = audio[:, 0, :]
        mel = mel_spectrogram(
            audio,
            n_mels=self.n_mels,
            sample_rate=self.sampling_rate,
            f_max=self.f_max,
            n_fft=self.n_fft,
            win_length=self.win_length,
            hop_length=self.hop_length,
        )  # (b, n_mels, frames)
        if self.log:
            mel = amplitude_to_db(mel)
        return mel.transpose(0, 2, 1)  # (b, frames, n_mels)

    def encode(self, audio: jax.Array) -> jax.Array:
        return self._encode(jnp.asarray(audio))

    def decode(self, mel: jax.Array) -> jax.Array:
        # one jitted program (dB->amp + vocos + iSTFT): eager ops here would
        # dispatch op-by-op over the tunnel (CLAUDE.md)
        fn, params = self.decode_fn()
        jitted = getattr(self, "_decode_jit", None)
        if jitted is None:
            jitted = self._decode_jit = jax.jit(fn)
        return jitted(params, jnp.asarray(mel))

    def decode_fn(self):
        """(pure_fn, params): pure_fn(params, latents) -> audio. Lets callers
        fuse the vocoder into their own jitted program (e.g. the CFM sampler
        compiles ODE solve + vocoder as ONE program -> one dispatch per
        request). The closure is cached per codec so repeat callers share one
        function identity; params are re-read each call (current weights)."""
        fn = getattr(self, "_decode_fn_cached", None)
        if fn is None:
            vocos = self.vocos
            log = self.log

            def fn(params, mel):
                mel = mel.transpose(0, 2, 1)
                if log:
                    mel = db_to_amplitude(mel, ref=1.0, power=0.5)
                return vocos._decode_impl(params, mel, jnp.zeros((1,), jnp.int32))

            self._decode_fn_cached = fn
        return fn, self.vocos.params


class EncodecVoco(AudioEncoderDecoder):
    def __init__(
        self,
        *,
        sampling_rate: int = 24000,
        pretrained_vocos_path: str = "charactr/vocos-encodec-24khz",
        bandwidth_id: int = 2,
        encodec: Optional[EncodecModel] = None,
        vocos: Optional[Vocos] = None,
    ):
        self.sampling_rate = sampling_rate
        self.encodec = encodec if encodec is not None else EncodecModel()
        self.vocos = vocos if vocos is not None else Vocos.from_pretrained(
            pretrained_vocos_path
        )
        self.bandwidth_id = bandwidth_id

    @property
    def downsample_factor(self) -> int:
        return self.encodec.downsample_factor

    @property
    def latent_dim(self) -> int:
        return self.encodec.codebook_dim

    def encode(self, audio: jax.Array) -> jax.Array:
        encoded_audio, _, _ = self.encodec(jnp.asarray(audio), return_encoded=True)
        return encoded_audio

    def decode_to_codes(self, latents: jax.Array) -> jax.Array:
        _, codes, _ = self.encodec.rq(latents)
        return codes.transpose(0, 2, 1)  # (b, q, n)

    def decode(self, latents: jax.Array) -> jax.Array:
        """Batched (the reference loops per item, voicebox_pytorch.py:586-592)
        and ONE jitted program: RVQ -> codes -> Vocos -> iSTFT, returning
        (b, 1, n) as the reference stacks to."""
        fn, params = self.decode_fn()
        jitted = getattr(self, "_decode_jit", None)
        if jitted is None:
            jitted = self._decode_jit = jax.jit(fn)
        return jitted(params, jnp.asarray(latents))

    def decode_fn(self):
        """(pure_fn, params): pure_fn(params, latents) -> audio (b, 1, n*320).
        See MelVoco.decode_fn — enables the one-dispatch fused sample+decode."""
        fn = getattr(self, "_decode_fn_cached", None)
        if fn is None:
            quantizer = self.encodec.quantizer
            vocos = self.vocos
            bw = self.bandwidth_id

            def fn(params, latents):
                _, codes, _ = quantizer.apply({"params": params["quantizer"]}, latents)
                codes = codes.transpose(0, 2, 1)  # (b, q, n)
                feats = vocos._codes_to_features_impl(params["vocos"], codes)
                audio = vocos._decode_impl(params["vocos"], feats, jnp.asarray([bw]))
                return audio[:, None, :]

            self._decode_fn_cached = fn
        return fn, {"quantizer": self.encodec.params["quantizer"],
                    "vocos": self.vocos.params}
