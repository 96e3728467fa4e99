"""STFT and log-mel spectrogram extraction, jit-compatible and TPU-resident.

Reproduces the reference feature definition (reference data/dataset.py:162-178):
torchaudio ``MelSpectrogram`` with ``power=2.0``, ``normalized=False``, hann
window, centered frames with reflect padding, HTK mel scale with no filterbank
normalization (torchaudio defaults ``mel_scale='htk'``, ``norm=None``), followed
by ``log(mel + 1e-9)`` (reference data/dataset.py:697).

TPU-native design: framing is a strided gather, the DFT is ``jnp.fft.rfft``
(XLA lowers this to an efficient TPU FFT), and the mel projection is a single
``(n_freqs, n_mels)`` matmul on the MXU.  The whole pipeline fuses under jit;
there is no torchaudio/scipy dependency at runtime.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int, dtype=jnp.float32) -> jnp.ndarray:
    """Periodic Hann window (matches ``torch.hann_window(periodic=True)``)."""
    n = jnp.arange(win_length, dtype=dtype)
    return 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * n / win_length)


def _hz_to_mel_htk(freq: np.ndarray | float) -> np.ndarray:
    return 2595.0 * np.log10(1.0 + np.asarray(freq, dtype=np.float64) / 700.0)


def _mel_to_hz_htk(mel: np.ndarray | float) -> np.ndarray:
    return 700.0 * (10.0 ** (np.asarray(mel, dtype=np.float64) / 2595.0) - 1.0)


@functools.lru_cache(maxsize=8)
def mel_filterbank(
    n_freqs: int,
    n_mels: int,
    sample_rate: int,
    f_min: float,
    f_max: float,
) -> np.ndarray:
    """Triangular HTK mel filterbank, shape ``(n_freqs, n_mels)``.

    Matches torchaudio ``melscale_fbanks(..., mel_scale='htk', norm=None)``:
    filters are triangles in mel space evaluated on the linear FFT-bin
    frequency grid.
    """
    all_freqs = np.linspace(0.0, sample_rate / 2.0, n_freqs)
    mel_pts = np.linspace(_hz_to_mel_htk(f_min), _hz_to_mel_htk(f_max), n_mels + 2)
    f_pts = _mel_to_hz_htk(mel_pts)                       # (n_mels + 2,)
    f_diff = np.diff(f_pts)                               # (n_mels + 1,)
    slopes = f_pts[None, :] - all_freqs[:, None]          # (n_freqs, n_mels + 2)
    down = -slopes[:, :-2] / f_diff[None, :-1]            # rising edge
    up = slopes[:, 2:] / f_diff[None, 1:]                 # falling edge
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(np.float32)


def frame_signal(
    waveform: jnp.ndarray,
    frame_length: int,
    hop_length: int,
    center: bool = True,
    pad_mode: str = "reflect",
) -> jnp.ndarray:
    """Slice a ``(..., samples)`` signal into overlapping frames.

    Returns ``(..., n_frames, frame_length)``.  With ``center=True`` the signal
    is padded by ``frame_length // 2`` on both sides (torch.stft convention),
    giving ``n_frames = samples // hop + 1``.
    """
    if center:
        pad = frame_length // 2
        pad_widths = [(0, 0)] * (waveform.ndim - 1) + [(pad, pad)]
        waveform = jnp.pad(waveform, pad_widths, mode=pad_mode)
    n_samples = waveform.shape[-1]
    n_frames = 1 + (n_samples - frame_length) // hop_length
    starts = jnp.arange(n_frames) * hop_length
    idx = starts[:, None] + jnp.arange(frame_length)[None, :]
    return jnp.take(waveform, idx, axis=-1)


def stft_power(
    waveform: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int,
    center: bool = True,
) -> jnp.ndarray:
    """Power spectrogram ``|STFT|^2`` of shape ``(..., n_frames, n_fft//2 + 1)``.

    Matches ``torch.stft(center=True, pad_mode='reflect', onesided=True)`` with
    a periodic hann window zero-padded to ``n_fft`` (torchaudio behavior when
    ``win_length < n_fft``).
    """
    frames = frame_signal(waveform, n_fft, hop_length, center=center)
    window = hann_window(win_length, dtype=frames.dtype)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))
    spec = jnp.fft.rfft(frames * window, n=n_fft, axis=-1)
    return jnp.abs(spec) ** 2


def log_mel_spectrogram(
    waveform: jnp.ndarray,
    sample_rate: int = 22050,
    n_fft: int = 1024,
    hop_length: int = 256,
    win_length: int = 1024,
    n_mels: int = 80,
    f_min: float = 0.0,
    f_max: Optional[float] = 8000.0,
    eps: float = 1e-9,
) -> jnp.ndarray:
    """Log-mel spectrogram ``(..., n_frames, n_mels)``.

    Definition parity with the reference pipeline:
    ``log(MelSpectrogram(power=2)(x) + 1e-9)`` (reference data/dataset.py:694-697).
    """
    if f_max is None:
        f_max = sample_rate / 2.0
    power = stft_power(waveform, n_fft, hop_length, win_length)
    fb = jnp.asarray(mel_filterbank(n_fft // 2 + 1, n_mels, sample_rate, f_min, f_max))
    mel = power @ fb
    return jnp.log(mel + eps)


def griffin_lim(
    mel_or_spec: jnp.ndarray,
    n_fft: int = 1024,
    hop_length: int = 256,
    win_length: int = 1024,
    n_iter: int = 60,
    from_log_mel: bool = True,
    sample_rate: int = 22050,
    n_mels: int = 80,
    f_min: float = 0.0,
    f_max: Optional[float] = 8000.0,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Griffin-Lim waveform reconstruction (vocoder fallback).

    Mirrors the reference fallback path (reference inference/vocoder_manager.py:208-351):
    ``exp`` to invert the log, pseudo-inverse mel -> linear magnitude, then
    ``n_iter`` Griffin-Lim phase-recovery iterations.  Runs entirely under jit
    with a ``lax.fori_loop``.

    Args:
        mel_or_spec: ``(n_frames, n_mels)`` log-mel (``from_log_mel=True``) or a
            linear magnitude spectrogram ``(n_frames, n_freqs)``.
    """
    if f_max is None:
        f_max = sample_rate / 2.0
    if from_log_mel:
        mel_power = jnp.exp(mel_or_spec)  # invert log(mel + eps); eps negligible
        fb = jnp.asarray(
            mel_filterbank(n_fft // 2 + 1, n_mels, sample_rate, f_min, f_max)
        )
        # Least-squares inversion of the mel projection (InverseMelScale analog).
        linear_power = jnp.clip(mel_power @ jnp.linalg.pinv(fb), 0.0, None)
        magnitude = jnp.sqrt(linear_power)  # power=2 -> magnitude
    else:
        magnitude = mel_or_spec

    n_frames, n_freqs = magnitude.shape
    window = hann_window(win_length, dtype=magnitude.dtype)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))

    # TPU has no complex elementwise ops (exp/div on complex64 are
    # UNIMPLEMENTED), so the phase iteration carries (re, im) float pairs and
    # forms complex values only at the FFT boundary via lax.complex.
    def _istft(re: jnp.ndarray, im: jnp.ndarray) -> jnp.ndarray:
        spec = jax.lax.complex(re, im)
        frames = jnp.fft.irfft(spec, n=n_fft, axis=-1) * window[None, :]
        out_len = n_fft + hop_length * (n_frames - 1)
        starts = jnp.arange(n_frames) * hop_length
        wav = jnp.zeros(out_len, dtype=frames.dtype)
        norm = jnp.zeros(out_len, dtype=frames.dtype)
        idx = starts[:, None] + jnp.arange(n_fft)[None, :]
        wav = wav.at[idx.reshape(-1)].add(frames.reshape(-1))
        norm = norm.at[idx.reshape(-1)].add(
            jnp.broadcast_to(window[None, :] ** 2, frames.shape).reshape(-1)
        )
        wav = wav / jnp.maximum(norm, 1e-8)
        pad = n_fft // 2
        return wav[pad : out_len - pad]

    def _stft_re_im(wav: jnp.ndarray):
        frames = frame_signal(wav, n_fft, hop_length)[:n_frames]
        spec = jnp.fft.rfft(frames * window, n=n_fft, axis=-1)
        return jnp.real(spec), jnp.imag(spec)

    if key is None:
        key = jax.random.PRNGKey(0)
    angles = jax.random.uniform(key, (n_frames, n_freqs), minval=-math.pi, maxval=math.pi)
    re = magnitude * jnp.cos(angles)
    im = magnitude * jnp.sin(angles)

    def body(_, carry):
        re, im = carry
        wav = _istft(re, im)
        r_re, r_im = _stft_re_im(wav)
        mag = jnp.maximum(jnp.sqrt(r_re**2 + r_im**2), 1e-8)
        return magnitude * r_re / mag, magnitude * r_im / mag

    re, im = jax.lax.fori_loop(0, n_iter, body, (re, im))
    return _istft(re, im)
