"""Evaluation metrics.

`mel_spectral_distance` is the parity metric named by BASELINE.json's north
star ("mel-spectral-distance parity with the PyTorch reference"): L2 distance
between log-mel spectrograms of two waveforms, computed with the same mel
chain the codec uses (`voicebox_tpu.ops.stft.mel_spectrogram`, torchaudio
semantics)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.stft import amplitude_to_db, mel_spectrogram

__all__ = ["mel_spectral_distance", "log_mel"]


def log_mel(
    wav: jax.Array,
    sample_rate: int = 24000,
    n_mels: int = 100,
    n_fft: int = 1024,
    win_length: int = 640,
    hop_length: int = 160,
    f_max: float = 8000.0,
) -> jax.Array:
    """(b, n) wave -> (b, n_mels, frames) log-mel (dB)."""
    if wav.ndim == 1:
        wav = wav[None]
    mel = mel_spectrogram(
        wav, n_mels=n_mels, sample_rate=sample_rate, f_max=f_max,
        n_fft=n_fft, win_length=win_length, hop_length=hop_length,
    )
    return amplitude_to_db(mel)


def mel_spectral_distance(wav_a: jax.Array, wav_b: jax.Array, **mel_kwargs) -> jax.Array:
    """Mean L2 distance between per-frame log-mel vectors of two waveforms.

    Waves are truncated to the common length. Returns a scalar (dB units)."""
    wav_a = jnp.atleast_2d(jnp.asarray(wav_a))
    wav_b = jnp.atleast_2d(jnp.asarray(wav_b))
    n = min(wav_a.shape[-1], wav_b.shape[-1])
    ma = log_mel(wav_a[..., :n], **mel_kwargs)
    mb = log_mel(wav_b[..., :n], **mel_kwargs)
    return jnp.mean(jnp.sqrt(jnp.sum(jnp.square(ma - mb), axis=1)))
