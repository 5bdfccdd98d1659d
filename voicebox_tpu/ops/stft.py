"""Audio DSP as XLA ops: STFT / mel / dB conversion, inverse STFT
(overlap-add), and polyphase sinc resampling.

TPU-native replacement for the torchaudio C++ kernels the reference leans on
(voicebox_pytorch.py:33-34,519-547,1366-1387 — `T.Spectrogram`, `T.MelScale`,
`T.AmplitudeToDB`, `DB_to_amplitude`, `functional.resample`). Framing is
expressed as `conv_general_dilated_patches` (strided gather) so XLA lays it
out as a tiled memory op; the (i)DFT is two real matmuls against precomputed
cos/sin matrices (NOT `jnp.fft.*`, which has no lowering on this backend —
see the last paragraph); resampling is a strided conv over a precomputed
windowed-sinc filter bank (the exact torchaudio algorithm, so resampled
waveforms match the reference numerically).

Numerical contracts match torchaudio defaults as exercised by the reference:
Spectrogram(power=2, center=True, reflect pad, periodic hann), MelScale (HTK
mel scale, no norm), AmplitudeToDB (stype='power', ref=1, amin=1e-10,
top_db=None), DB_to_amplitude(ref=1, power=0.5).

The (i)DFT itself is expressed as two real matmuls against precomputed
cos/sin matrices rather than an FFT op: for n_fft ~ 1024 a
(frames x n_fft) @ (n_fft x n_freq) matmul runs on the MXU at full tilt,
whereas TPU FFT lowering is either slow or (on this backend) unimplemented.
Reflect padding is built from slice+reverse+concat for the same reason.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "hann_window",
    "frame_signal",
    "stft",
    "spectrogram",
    "melscale_fbanks",
    "mel_spectrogram",
    "amplitude_to_db",
    "db_to_amplitude",
    "istft",
    "resample",
    "resample_np",
]


def hann_window(win_length: int, dtype=jnp.float32) -> jax.Array:
    # periodic hann (torch.hann_window default)
    n = jnp.arange(win_length, dtype=dtype)
    return 0.5 - 0.5 * jnp.cos(2 * jnp.pi * n / win_length)


@functools.lru_cache(maxsize=8)
def _rdft_matrices(n_fft: int):
    """Real-DFT basis as numpy: frames @ C -> real part, frames @ S -> imag.
    rfft[k] = sum_n x_n e^{-2pi i k n / N}."""
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_fft // 2 + 1)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    return np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32)


@functools.lru_cache(maxsize=8)
def _irdft_matrices(n_fft: int):
    """Inverse real-DFT basis: x = re @ Cr + im @ Ci, shape (n_freq, n_fft)."""
    n_freq = n_fft // 2 + 1
    k = np.arange(n_freq)[:, None]
    n = np.arange(n_fft)[None, :]
    ang = 2.0 * np.pi * k * n / n_fft
    w = np.full((n_freq, 1), 2.0)
    w[0] = 1.0
    if n_fft % 2 == 0:
        w[-1] = 1.0
    cr = (w * np.cos(ang) / n_fft).astype(np.float32)
    ci = (-w * np.sin(ang) / n_fft).astype(np.float32)
    return cr, ci


def rdft(frames: jax.Array, n_fft: int):
    """(..., n_fft) real frames -> (real, imag) each (..., n_fft//2+1),
    via MXU matmuls."""
    c, s = _rdft_matrices(n_fft)
    f32 = frames.astype(jnp.float32)
    return f32 @ jnp.asarray(c), f32 @ jnp.asarray(s)


def irdft(re: jax.Array, im: jax.Array, n_fft: int) -> jax.Array:
    """(..., n_fft//2+1) spectrum -> (..., n_fft) real frames."""
    cr, ci = _irdft_matrices(n_fft)
    return re.astype(jnp.float32) @ jnp.asarray(cr) + im.astype(jnp.float32) @ jnp.asarray(ci)


def _reflect_pad_1d(x: jax.Array, pad: int) -> jax.Array:
    """Reflect-pad the last axis (no edge duplication, = np.pad 'reflect').
    Built from slice+reverse+concat — jnp.pad(mode='reflect') has no lowering
    on this TPU backend."""
    left = jnp.flip(x[..., 1 : pad + 1], axis=-1)
    right = jnp.flip(x[..., -pad - 1 : -1], axis=-1)
    return jnp.concatenate([left, x, right], axis=-1)


def frame_signal(audio: jax.Array, frame_length: int, hop_length: int) -> jax.Array:
    """(b, n) -> (b, frames, frame_length) via strided patch extraction."""
    b, n = audio.shape
    patches = jax.lax.conv_general_dilated_patches(
        audio[:, None, :],  # (b, 1, n) NCW
        filter_shape=(frame_length,),
        window_strides=(hop_length,),
        padding="VALID",
    )  # (b, frame_length, frames)
    return patches.transpose(0, 2, 1)


def stft(
    audio: jax.Array,
    n_fft: int = 1024,
    win_length: Optional[int] = None,
    hop_length: Optional[int] = None,
    center: bool = True,
    pad_mode: str = "reflect",
    window: Optional[jax.Array] = None,
) -> jax.Array:
    """Complex STFT (b, n_fft//2 + 1, frames), torch.stft-compatible."""
    win_length = win_length or n_fft
    hop_length = hop_length or n_fft // 4

    if window is None:
        window = hann_window(win_length, dtype=audio.dtype)
    # torch pads the window symmetrically to n_fft
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))

    if center:
        if pad_mode == "reflect":
            audio = _reflect_pad_1d(audio, n_fft // 2)
        else:
            audio = jnp.pad(audio, ((0, 0), (n_fft // 2, n_fft // 2)))

    frames = frame_signal(audio, n_fft, hop_length)  # (b, T, n_fft)
    frames = frames * window[None, None, :]
    re, im = rdft(frames, n_fft)  # (b, T, n_fft//2+1) each
    spec = jax.lax.complex(re, im)
    return spec.transpose(0, 2, 1)


def spectrogram(
    audio: jax.Array,
    n_fft: int = 1024,
    win_length: Optional[int] = None,
    hop_length: Optional[int] = None,
    power: float = 2.0,
    center: bool = True,
) -> jax.Array:
    """torchaudio T.Spectrogram semantics: |STFT|^power, (b, freq, frames).

    Stays entirely in real arithmetic (re^2 + im^2) — no complex ops."""
    win_length = win_length or n_fft
    hop_length = hop_length or n_fft // 4
    window = hann_window(win_length, dtype=jnp.float32)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))
    if center:
        audio = _reflect_pad_1d(audio, n_fft // 2)
    frames = frame_signal(audio, n_fft, hop_length) * window[None, None, :]
    re, im = rdft(frames, n_fft)
    power_spec = re * re + im * im  # (b, T, freq)
    if power == 2.0:
        out = power_spec
    elif power == 1.0:
        out = jnp.sqrt(power_spec)
    else:
        out = power_spec ** (power / 2.0)
    return out.transpose(0, 2, 1)


def _hz_to_mel_htk(f):
    return 2595.0 * np.log10(1.0 + f / 700.0)


def _mel_to_hz_htk(m):
    return 700.0 * (10.0 ** (m / 2595.0) - 1.0)


@functools.lru_cache(maxsize=16)
def melscale_fbanks(
    n_freqs: int,
    f_min: float,
    f_max: float,
    n_mels: int,
    sample_rate: int,
) -> np.ndarray:
    """Triangular mel filterbank (n_freqs, n_mels), HTK scale, no norm —
    torchaudio MelScale defaults. Returns numpy (lru_cached — caching a
    traced jnp array would leak tracers across jit scopes)."""
    all_freqs = np.linspace(0, sample_rate // 2, n_freqs)
    m_pts = np.linspace(_hz_to_mel_htk(f_min), _hz_to_mel_htk(f_max), n_mels + 2)
    f_pts = _mel_to_hz_htk(m_pts)

    f_diff = f_pts[1:] - f_pts[:-1]  # (n_mels + 1,)
    slopes = f_pts[None, :] - all_freqs[:, None]  # (n_freqs, n_mels + 2)
    down_slopes = -slopes[:, :-2] / f_diff[:-1]
    up_slopes = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down_slopes, up_slopes))
    return fb.astype(np.float32)


def mel_spectrogram(
    audio: jax.Array,
    *,
    n_mels: int = 100,
    sample_rate: int = 24000,
    f_min: float = 0.0,
    f_max: Optional[float] = 8000.0,
    n_fft: int = 1024,
    win_length: int = 640,
    hop_length: int = 160,
    power: float = 2.0,
) -> jax.Array:
    """(b, n) audio -> (b, n_mels, frames) mel power spectrogram — the
    MelVoco.encode chain (voicebox_pytorch.py:518-535) in one fused graph."""
    spec = spectrogram(audio, n_fft, win_length, hop_length, power=power)
    fb = melscale_fbanks(
        n_fft // 2 + 1, f_min, f_max if f_max is not None else sample_rate / 2,
        n_mels, sample_rate,
    )
    # (b, freq, T) x (freq, mel) -> (b, mel, T)
    return jnp.einsum("bft,fm->bmt", spec, jnp.asarray(fb, dtype=spec.dtype))


def amplitude_to_db(
    x: jax.Array,
    stype: str = "power",
    ref: float = 1.0,
    amin: float = 1e-10,
    top_db: Optional[float] = None,
) -> jax.Array:
    """torchaudio AmplitudeToDB: 10 (or 20) * log10(clamp(x, amin)) - mult*log10(max(amin, ref))."""
    multiplier = 10.0 if stype == "power" else 20.0
    db_multiplier = math.log10(max(amin, ref))
    x_db = multiplier * jnp.log10(jnp.clip(x, amin, None))
    x_db = x_db - multiplier * db_multiplier
    if top_db is not None:
        x_db = jnp.maximum(x_db, x_db.max() - top_db)
    return x_db


def db_to_amplitude(x: jax.Array, ref: float = 1.0, power: float = 0.5) -> jax.Array:
    """torchaudio DB_to_amplitude (voicebox_pytorch.py:547 uses ref=1, power=0.5)."""
    return ref * jnp.power(jnp.power(10.0, 0.1 * x), power)


def _overlap_add_divisible(frames: jax.Array, hop: int) -> jax.Array:
    """Overlap-add of (b, T, n) windowed frames at hop `hop`, n % hop == 0,
    as r = n/hop shifted dense adds (no scatter). Output (b, (T+r-1)*hop) =
    n + hop*(T-1) samples, exactly the scatter-add result."""
    b, T, n = frames.shape
    r = n // hop
    fr = frames.reshape(b, T, r, hop)
    acc = None
    for j in range(r):
        part = jnp.pad(fr[:, :, j, :], ((0, 0), (j, r - 1 - j), (0, 0)))
        acc = part if acc is None else acc + part
    return acc.reshape(b, (T + r - 1) * hop)


def istft(
    spec: jax.Array,  # (b, n_fft//2+1, frames) complex
    n_fft: int = 1024,
    win_length: Optional[int] = None,
    hop_length: Optional[int] = None,
    center: bool = True,
    length: Optional[int] = None,
    window: Optional[jax.Array] = None,
    padding: str = "center",
) -> jax.Array:
    """Inverse STFT via windowed overlap-add with window-square normalisation.

    padding='center': torch.istft semantics (trim n_fft//2 both sides).
    padding='same': Vocos ISTFT-head semantics — output length is exactly
    frames * hop_length (trim (n_fft - hop)/2 both sides)."""
    win_length = win_length or n_fft
    hop_length = hop_length or n_fft // 4

    if window is None:
        window = hann_window(win_length)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))

    b, _, n_frames = spec.shape
    sp = spec.transpose(0, 2, 1)
    frames = irdft(jnp.real(sp), jnp.imag(sp), n_fft)  # (b, T, n_fft)
    frames = frames * window[None, None, :]

    out_len = n_fft + hop_length * (n_frames - 1)
    if n_fft % hop_length == 0:
        # dense overlap-add: frame = r hop-sized chunks, chunk j of frame t
        # lands at output block t+j -> r shifted pad+adds, no scatter. TPU
        # scatters serialize: this path cut the whole vocoder decode from
        # ~19 ms to ~1.6 ms on-chip (v5e, n_fft 1280 / hop 320, 750 frames)
        y = _overlap_add_divisible(frames, hop_length)
        win_sq = _overlap_add_divisible(
            jnp.broadcast_to((window**2)[None, None, :], (1, n_frames, n_fft)),
            hop_length,
        )[0]
    else:
        # general hop: scatter-add over frame offsets
        idx = (
            jnp.arange(n_frames)[:, None] * hop_length + jnp.arange(n_fft)[None, :]
        ).reshape(-1)
        y = jnp.zeros((b, out_len), dtype=frames.dtype)
        y = y.at[:, idx].add(frames.reshape(b, -1))
        win_sq = jnp.zeros((out_len,), dtype=frames.dtype)
        win_sq = win_sq.at[idx].add(
            jnp.broadcast_to(window**2, (n_frames, n_fft)).reshape(-1)
        )
    y = y / jnp.clip(win_sq, 1e-11, None)[None, :]

    if padding == "same":
        pad = (n_fft - hop_length) // 2
        y = y[:, pad : pad + n_frames * hop_length]
        if length is not None:
            y = y[:, :length]
        return y
    if center:
        y = y[:, n_fft // 2 :]
        if length is not None:
            y = y[:, :length]
        else:
            y = y[:, : out_len - n_fft]
    elif length is not None:
        y = y[:, :length]
    return y


# ---------------------------------------------------------------------------
# resampling (torchaudio functional.resample algorithm: windowed-sinc
# polyphase filter bank applied as a strided conv)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=32)
def _sinc_resample_kernel(
    orig_freq: int, new_freq: int, lowpass_filter_width: int = 6, rolloff: float = 0.99
):
    gcd = math.gcd(orig_freq, new_freq)
    orig, new = orig_freq // gcd, new_freq // gcd

    base_freq = min(orig, new) * rolloff
    width = math.ceil(lowpass_filter_width * orig / base_freq)

    idx = np.arange(-width, width + orig, dtype=np.float64)[None, :] / orig
    t = idx - np.arange(new, dtype=np.float64)[:, None] / new
    t *= base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)

    window = np.cos(t * np.pi / lowpass_filter_width / 2) ** 2
    t *= np.pi
    scale = base_freq / orig
    kernels = np.where(t == 0, 1.0, np.sin(t) / np.where(t == 0, 1.0, t))
    kernels = kernels * window * scale  # (new, 2*width + orig)

    return kernels.astype(np.float32), orig, new, width


def resample(
    audio: jax.Array,
    orig_freq: int,
    new_freq: int,
    lowpass_filter_width: int = 6,
    rolloff: float = 0.99,
) -> jax.Array:
    """Polyphase sinc resampling, (b, n) or (n,) -> resampled."""
    if orig_freq == new_freq:
        return audio
    # torchaudio semantics: resample along the LAST axis, any leading dims —
    # (n,), (b, n), and the wrapper's (b, 1, n) raw-audio shape
    # (voicebox_pytorch.py:1119-1120) all work
    lead_shape = audio.shape[:-1]
    audio = audio.reshape((-1, audio.shape[-1]))

    kernels, orig, new, width = _sinc_resample_kernel(
        orig_freq, new_freq, lowpass_filter_width, rolloff
    )
    b, n = audio.shape
    target_length = math.ceil(new * n / orig)

    x = jnp.pad(audio, ((0, 0), (width, width + orig)))
    out = jax.lax.conv_general_dilated(
        x[:, None, :].astype(jnp.float32),  # (b, 1, t) NCW
        jnp.asarray(kernels)[:, None, :],  # (new, 1, k) OIW
        window_strides=(orig,),
        padding="VALID",
    )  # (b, new, frames)
    out = out.transpose(0, 2, 1).reshape(b, -1)[:, :target_length]
    out = out.astype(audio.dtype)
    return out.reshape(lead_shape + (target_length,))


def resample_np(audio: np.ndarray, orig_freq: int, new_freq: int) -> np.ndarray:
    """Host-side wrapper for the data pipeline."""
    return np.asarray(resample(jnp.asarray(audio), orig_freq, new_freq))
